package graft

import java.io.{BufferedInputStream, InputStream}
import java.net.{InetSocketAddress, ServerSocket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{CopyOnWriteArrayList, CountDownLatch}

import com.sun.net.httpserver.HttpServer

import graft.sinks.{ElasticBulk, RespKv, Sinks}

/** Protocol-level tests for the external sinks, against in-process mock
  * servers (no Redis/ES exists in the sandbox): the RESP client must emit
  * the reference's exact DEL→RPUSH→EXPIRE command sequence, and the ES
  * sink must post well-formed NDJSON bulk bodies and fail loud on errors.
  */
class ExternalSinksSpec extends SparkSpecBase {
  import spark.implicits._

  /** Tiny RESP server: accepts one connection, parses array-of-bulk-string
    * commands, records them, replies ":1". */
  private class MockResp {
    val commands = new CopyOnWriteArrayList[Seq[String]]()
    private val server = new ServerSocket(0)
    val port: Int = server.getLocalPort
    private val started = new CountDownLatch(1)
    private val thread = new Thread(() => {
      started.countDown()
      val s = server.accept()
      val in = new BufferedInputStream(s.getInputStream)
      val out = s.getOutputStream
      try {
        var cmd = readCommand(in)
        while (cmd != null) {
          commands.add(cmd)
          out.write(":1\r\n".getBytes(UTF_8)); out.flush()
          cmd = readCommand(in)
        }
      } catch { case _: Exception => () }
    })
    thread.setDaemon(true); thread.start(); started.await()

    private def line(in: InputStream): String = {
      val sb = new StringBuilder
      var c = in.read()
      if (c == -1) return null
      while (c != '\r' && c != -1) { sb.append(c.toChar); c = in.read() }
      in.read(); sb.toString
    }
    private def readCommand(in: InputStream): Seq[String] = {
      val head = line(in)
      if (head == null || head.isEmpty || head.charAt(0) != '*') return null
      (0 until head.drop(1).toInt).map { _ =>
        val n = line(in).drop(1).toInt
        val b = in.readNBytes(n); in.read(); in.read()
        new String(b, UTF_8)
      }
    }
    def close(): Unit = server.close()
  }

  test("K4 RESP client emits DEL -> RPUSH -> EXPIRE and HSET verbatim") {
    val mock = new MockResp
    try {
      val kv = new RespKv("127.0.0.1", mock.port)
      kv.putList("rank:s1", Seq("i9", "i3", "i7"), ttlSeconds = 604800L)
      kv.putHash("sensor", "s4", "21.5")
      kv.close()
      val got = mock.commands.toArray.toSeq
      assert(got == Seq(
        Seq("DEL", "rank:s1"),
        Seq("RPUSH", "rank:s1", "i9", "i3", "i7"),
        Seq("EXPIRE", "rank:s1", "604800"),
        Seq("HSET", "sensor", "s4", "21.5")), s"got $got")
    } finally mock.close()
  }

  test("K4 RESP client sends only the DEL for an empty list — a bare " +
    "RPUSH with no elements is a protocol error after the delete") {
    val mock = new MockResp
    try {
      val kv = new RespKv("127.0.0.1", mock.port)
      kv.putList("rank:empty", Seq.empty, ttlSeconds = 60L)
      kv.putHash("sensor", "s1", "1") // proves the pipeline still works
      kv.close()
      val got = mock.commands.toArray.toSeq
      assert(got == Seq(
        Seq("DEL", "rank:empty"),
        Seq("HSET", "sensor", "s1", "1")), s"got $got")
    } finally mock.close()
  }

  test("K4 end-to-end: publishLists drives RespKv from executor closures") {
    val mock = new MockResp
    try {
      val df = Seq(("rank:s9", Seq("a", "b"))).toDF("key", "values")
      Sinks.publishLists(df, new RespKv("127.0.0.1", mock.port),
        ttlSeconds = 60L)
      val got = mock.commands.toArray.toSeq
      assert(got == Seq(
        Seq("DEL", "rank:s9"),
        Seq("RPUSH", "rank:s9", "a", "b"),
        Seq("EXPIRE", "rank:s9", "60")), s"got $got")
    } finally mock.close()
  }

  test("K4 RESP client surfaces server errors as task failures") {
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      val s = server.accept()
      // one read of whatever arrived (readNBytes would block for a full
      // buffer while the client waits for the reply — deadlock)
      s.getInputStream.read(new Array[Byte](256))
      s.getOutputStream.write("-ERR wrongtype\r\n".getBytes(UTF_8))
      s.getOutputStream.flush()
    })
    t.setDaemon(true); t.start()
    try {
      val kv = new RespKv("127.0.0.1", server.getLocalPort)
      intercept[java.io.IOException] { kv.putHash("k", "f", "v") }
      kv.close()
    } finally server.close()
  }

  test("K8 ES bulk sink posts NDJSON actions+docs and honors _id") {
    val bodies = new CopyOnWriteArrayList[(String, String)]()
    val http = HttpServer.create(new InetSocketAddress(0), 0)
    http.createContext("/_bulk", { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      bodies.add((ex.getRequestHeaders.getFirst("Content-Type"), body))
      val resp = """{"took":1,"errors":false}""".getBytes(UTF_8)
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp); ex.close()
    })
    http.start()
    try {
      val df = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      ElasticBulk.bulkIndex(df.coalesce(1),
        s"http://127.0.0.1:${http.getAddress.getPort}", "docs",
        idCol = Some("doc_id"))
      val (ctype, body) = bodies.get(0)
      assert(ctype == "application/x-ndjson")
      val lines = body.trim.split("\n")
      assert(lines.length == 4, s"2 docs -> 4 NDJSON lines:\n$body")
      assert(lines(0) == """{"index":{"_index":"docs","_id":"1"}}""")
      assert(lines(1).contains(""""text":"alpha""""))
      assert(body.endsWith("\n"), "bulk body must end with newline")

      // an id with a quote and backslash must be escaped, not corrupt the
      // action line
      bodies.clear()
      val tricky = Seq(("""a"b\c""", "x")).toDF("doc_id", "text")
      ElasticBulk.bulkIndex(tricky.coalesce(1),
        s"http://127.0.0.1:${http.getAddress.getPort}", "docs",
        idCol = Some("doc_id"))
      val action = bodies.get(0)._2.split("\n")(0)
      assert(action == """{"index":{"_index":"docs","_id":"a\"b\\c"}}""",
        s"got $action")
    } finally http.stop(0)
  }

  test("K8 ES bulk sink fails loud on HTTP and item errors") {
    val http = HttpServer.create(new InetSocketAddress(0), 0)
    http.createContext("/_bulk", { ex =>
      val resp = """{"took":1,"errors":true,"items":[]}""".getBytes(UTF_8)
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp); ex.close()
    })
    http.start()
    try {
      val df = Seq((1L, "x")).toDF("doc_id", "text")
      val e = intercept[org.apache.spark.SparkException] {
        ElasticBulk.bulkIndex(df.coalesce(1),
          s"http://127.0.0.1:${http.getAddress.getPort}", "docs")
      }
      assert(e.getMessage.contains("item errors") ||
        Option(e.getCause).exists(_.getMessage.contains("item errors")))
    } finally http.stop(0)
  }

  test("kvFromEnv picks the protocol client iff GRAFT_REDIS is set") {
    assert(Sinks.kvFromEnv(Map.empty).isInstanceOf[Sinks.InMemoryKv])
    assert(Sinks.kvFromEnv(Map("GRAFT_REDIS" -> "h:6379"))
      .isInstanceOf[RespKv])
  }
}
