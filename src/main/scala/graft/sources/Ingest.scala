package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Sentinels

/** Source operators (SURVEY §2.1) re-expressed Spark-first.
  *
  * The reference builds scan lists with driver-side path loops + existence
  * probes (`OfflineJob.java:117-145`); here multi-path reads go through one
  * `spark.read` call so the file source can list/prune in parallel — at
  * 100 TB the layout is `day=/hour=` partitioned parquet and pruning is a
  * partition-filter, not a driver loop.
  */
object Ingest {

  /** S1: line-oriented text scan. */
  def textLines(s: SparkSession, paths: String*): DataFrame =
    s.read.textFile(paths: _*).toDF("line")

  /** S2: recursive directory scan
    * (`flink-process/.../source/ReadMultiDirectory.java:13-16`). */
  def textLinesRecursive(s: SparkSession, dir: String): DataFrame =
    s.read.option("recursiveFileLookup", "true").textFile(dir).toDF("line")

  /** S3 edge: raw (unframed) snappy-compressed text — the reference's
    * custom unsplittable format (`flink-process/.../readsnappy/
    * HdfsSnappyFileInputFormat.java:17-29`: `testForUnsplittable = true`,
    * stream wrapped in a snappy inflater; framed/codec-extension variants
    * already flow through the standard text reader's codec autodetect).
    *
    * Raw snappy has no sync markers, so a file IS the split — exactly what
    * `binaryFile` provides (one row per file, never split). Each file's
    * bytes are inflated on the executor and burst into lines; parallelism
    * comes from the number of files, as with every unsplittable codec. At
    * 100 TB that means "many medium files" is the usable layout and a
    * single giant raw-snappy file is inherently serial — same contract as
    * the reference, where this format existed to re-read job outputs.
    */
  def textLinesRawSnappy(s: SparkSession, path: String): DataFrame = {
    import s.implicits._
    s.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .mapPartitions(_.flatMap(bytes =>
        new String(org.xerial.snappy.Snappy.uncompress(bytes),
          java.nio.charset.StandardCharsets.UTF_8).linesIterator))
      .toDF("line")
  }

  /** S4: multi-partition scan with existence probe — the reference's
    * day/hour template loop; kept for layouts without partition columns. */
  def existingPaths(s: SparkSession, candidates: Seq[String]): Seq[String] = {
    val conf = s.sparkContext.hadoopConfiguration
    candidates.filter { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(conf).exists(path)
    }
  }

  /** S9: declared-schema CSV with custom delimiter
    * (`OfflineDataSetUtils.java:214-228`, `/`-delimited). */
  def csv(s: SparkSession, path: String, schema: StructType,
          sep: String = "/"): DataFrame =
    s.read.schema(schema).option("sep", sep).csv(path)

  /** S8: JDBC source (`flink-process/.../source/SourceFromMysql.java:38-68`)
    * — the reference embeds `where id <= 1000`; expressed as a pushed-down
    * query option. Untestable without a database; thin by design. */
  def jdbc(s: SparkSession, url: String, query: String): DataFrame =
    s.read.format("jdbc").option("url", url).option("query", query).load()

  /** S5: Kafka stream (`FlinkSourceUtils.java:11-18`; group-offset start →
    * Spark checkpoint-tracked offsets, T14). */
  def kafkaStream(s: SparkSession, servers: String, topic: String,
                  startingOffsets: String = "latest"): DataFrame =
    s.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .selectExpr("CAST(value AS STRING) AS line",
        "timestamp AS kafka_ts")

  /** S6: socket text stream (`StreamWorldCount.scala:13`). */
  def socketStream(s: SparkSession, host: String, port: Int): DataFrame =
    s.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** S10: continuous file monitor (`ReadFileContinue.java:12`). */
  def fileStream(s: SparkSession, dir: String): DataFrame =
    s.readStream.text(dir).toDF("line")

  /** S7: generator source analog of `SensorSource.scala:21-36` — `rate`
    * rows mapped to deterministic pseudo-sensor readings (Gaussian replaced
    * by a hash-based jitter: no RNG state, restart-safe). */
  def sensorStream(s: SparkSession, rowsPerSecond: Int = 10): DataFrame =
    s.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
      .select(
        concat(lit("sensor_"), pmod(col("value"), lit(10))).as("id"),
        (unix_millis(col("timestamp"))).as("timestamp"),
        (lit(60.0) + (pmod(xxhash64(col("value")), lit(2000)).cast("double")
          - 1000.0) / 100.0).as("temperature"))

  /** A8 fixture parse: the Redis-loader "countStat" line format
    * `<itemId>_<id2>:<score>,<id3>:<score>,...` (written at
    * `ItemIdCfVersion5.java:283`, parsed back at
    * `flink-process/.../sink/hdfs2redis/Hdfs2RedisVersion5.java:77-93`),
    * with the publishing contract applied: lists shorter than `minLen`
    * dropped, lists capped at `cap` (reference 20/400, W5).
    */
  def parseCountStat(lines: DataFrame, minLen: Int = 20, cap: Int = 400,
                     lineCol: String = "line"): DataFrame = {
    val l = col(lineCol)
    lines
      .select(substring_index(l, "_", 1).as("key"),
        split(expr(s"substring($lineCol, instr($lineCol, '_') + 1)"), ",")
          .as("values"))
      .filter(size(col("values")) >= minLen)
      .withColumn("values", slice(col("values"), 1, cap))
  }

  /** P2 parse spec: sentinel-tolerant JSON field extraction — the
    * reference's universal flatMap parser (`OfflineDataSetUtils.java:66-113`):
    * structurally-bad rows are DROPPED (bad JSON / failed requirement),
    * missing optional fields become the `RECOMDASHBOARDINVALID` sentinel.
    */
  def parseActionLog(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    val schema = StructType(Seq(
      StructField("sceneId", StringType), StructField("userId", StringType),
      StructField("itemId", StringType), StructField("action", StringType),
      StructField("contextExist", StringType),
      StructField("actionTime", StringType)))
    val j = from_json(col(lineCol), schema)
    def sentinel(c: Column): Column = coalesce(c, lit(Sentinels.Invalid))
    lines
      .withColumn("__j", j)
      // drop: unparseable JSON, missing userId, contextExist != "1"
      .filter(col("__j").isNotNull && col("__j.userId").isNotNull &&
        col("__j.contextExist") === "1")
      .select(
        sentinel(col("__j.sceneId")).as("sceneId"),
        col("__j.userId").as("userId"),
        sentinel(col("__j.itemId")).as("itemId"),
        sentinel(col("__j.action")).as("action"),
        col("__j.contextExist").as("contextExist"),
        // actionTime may arrive as a double string (`ItemIdCfVersion5.java:134`)
        coalesce(col("__j.actionTime").cast("double").cast("long"), lit(0L))
          .as("actionTime"))
  }
}
