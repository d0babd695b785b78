package graft.sinks

import java.net.URI
import java.net.HttpURLConnection
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** K8: Elasticsearch sink via the HTTP `_bulk` API over plain `java.net` —
  * the executor-push shape of the reference's ES sink
  * (`flink-base/.../sink/MyEsSink.scala:24-29` +
  * `MyElasticsearchSinkFunction.scala:15-27`, which indexes one JSON map
  * per record through a transport client). No ES client library: the bulk
  * NDJSON protocol is a stable public HTTP contract and the only part the
  * operator needs.
  *
  * Scale posture: rows are serialized to JSON with codegen'd `to_json` on
  * the executors (the driver never sees data), posted per partition in
  * `batchSize` chunks — the standard bulk-sizing knob. A non-2xx response
  * or a `"errors":true` bulk result throws, failing the task so Spark
  * retries; indexing with `_id` (pass `idCol`) makes retries idempotent
  * (index = upsert by id).
  */
object ElasticBulk {

  def bulkIndex(df: DataFrame, baseUrl: String, index: String,
                idCol: Option[String] = None, batchSize: Int = 500): Unit = {
    val doc = to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("__doc")
    val id = idCol.map(c => col(c).cast("string"))
      .getOrElse(lit(null).cast("string")).as("__id")
    df.select(doc, id).foreachPartition { rows: Iterator[Row] =>
      rows.grouped(batchSize).foreach { chunk =>
        val body = chunk.map { r =>
          // ids/index names are data — escape them or a quote/backslash in
          // one id corrupts the whole NDJSON bulk request
          val action =
            if (r.isNullAt(1)) s"""{"index":{"_index":${jstr(index)}}}"""
            else s"""{"index":{"_index":${jstr(index)},"_id":${jstr(r.getString(1))}}}"""
          action + "\n" + r.getString(0)
        }.mkString("", "\n", "\n")
        post(s"$baseUrl/_bulk", body)
      }
    }
  }

  /** JSON string literal: quotes, backslashes, and control chars escaped. */
  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Streaming form: per-trigger bulk upsert from `foreachBatch`. */
  def streamWriter(df: DataFrame, baseUrl: String, index: String,
                   checkpoint: String, idCol: Option[String] = None)
  : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        bulkIndex(batch, baseUrl, index, idCol)
      }

  private def post(url: String, body: String): Unit = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      // a hung endpoint must fail the task (Spark retries), not block it
      // forever — HttpURLConnection's default timeouts are infinite
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(60000)
      conn.setRequestProperty("Content-Type", "application/x-ndjson")
      val out = conn.getOutputStream
      out.write(body.getBytes(UTF_8)); out.close()
      val code = conn.getResponseCode
      val stream =
        if (code >= 400) conn.getErrorStream else conn.getInputStream
      val resp =
        if (stream == null) "" else new String(stream.readAllBytes(), UTF_8)
      if (stream != null) stream.close()
      if (code >= 400)
        throw new java.io.IOException(s"ES bulk HTTP $code: ${resp.take(500)}")
      if (resp.contains("\"errors\":true"))
        throw new java.io.IOException(s"ES bulk item errors: ${resp.take(500)}")
    } finally conn.disconnect()
  }
}
