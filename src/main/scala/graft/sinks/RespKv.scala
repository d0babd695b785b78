package graft.sinks

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, InputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal RESP (REdis Serialization Protocol) client implementing the
  * [[Sinks.KeyValueSink]] contract over a plain JDK socket — no client
  * library (none is available offline, and the contract needs only four
  * commands). Mirrors the reference's Redis writer semantics
  * (`flink-process/.../sink/MyJedisCluster.java:47-58`: DEL → RPUSH →
  * EXPIRE per key; `flink-base/.../sink/MyRedisMapper.scala:12-20`: HSET).
  *
  * Executor model: the class is serialized into foreachPartition closures;
  * the socket is `@transient` and opened lazily per executor JVM, so no
  * connection state crosses the wire. Commands for one logical put are
  * pipelined (single flush) and all replies drained; a `-ERR` reply throws,
  * failing the task so Spark retries — at-least-once, idempotent because
  * every put is a full-key overwrite.
  *
  * Use [[Sinks.kvFromEnv]] to select this against a real server via
  * `GRAFT_REDIS=host:port`; tests run against an in-process mock server.
  */
class RespKv(host: String, port: Int) extends Sinks.KeyValueSink {
  @transient private var sock: Socket = _
  @transient private var in: InputStream = _
  @transient private var out: java.io.OutputStream = _

  private def ensureOpen(): Unit = {
    if (sock == null || sock.isClosed) {
      sock = new Socket(host, port)
      in = new BufferedInputStream(sock.getInputStream)
      out = new BufferedOutputStream(sock.getOutputStream)
      // executor-side instances are deserialized copies the driver can
      // never close() — release the one socket per JVM at shutdown
      val s = sock
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try s.close() catch { case _: Throwable => () }))
    }
  }

  /** RESP array-of-bulk-strings encoding; lengths are BYTE lengths. */
  private def encode(cmd: Seq[String]): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    buf.write(s"*${cmd.length}\r\n".getBytes(UTF_8))
    cmd.foreach { c =>
      val b = c.getBytes(UTF_8)
      buf.write(s"$$${b.length}\r\n".getBytes(UTF_8))
      buf.write(b)
      buf.write("\r\n".getBytes(UTF_8))
    }
    buf.toByteArray
  }

  private def readLine(): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != '\r' && c != -1) { sb.append(c.toChar); c = in.read() }
    in.read() // the \n
    sb.toString
  }

  /** Drain one reply; throws on -ERR. Array/bulk payloads are read fully
    * (writers only need acknowledgement, not content). */
  private def readReply(): Unit = {
    val line = readLine()
    if (line.isEmpty) return
    line.charAt(0) match {
      case '+' | ':' => ()
      case '-' => throw new java.io.IOException(s"RESP error: $line")
      case '$' =>
        val n = line.drop(1).toInt
        if (n >= 0) { in.readNBytes(n); in.read(); in.read() }
      case '*' =>
        val n = line.drop(1).toInt
        (0 until math.max(n, 0)).foreach(_ => readReply())
      case _ => ()
    }
  }

  private def pipeline(cmds: Seq[Seq[String]]): Unit = synchronized {
    ensureOpen()
    cmds.foreach(c => out.write(encode(c)))
    out.flush()
    cmds.foreach(_ => readReply())
  }

  /** DEL → RPUSH(all values) → EXPIRE, the reference's list contract.
    * An empty `values` is just the DEL: `RPUSH key` with no elements is a
    * RESP protocol error, and it would fire AFTER the DEL — every task
    * retry would re-delete and re-fail. */
  override def putList(key: String, values: Seq[String],
                       ttlSeconds: Long): Unit =
    if (values.isEmpty) pipeline(Seq(Seq("DEL", key)))
    else pipeline(Seq(
      Seq("DEL", key),
      Seq("RPUSH", key) ++ values,
      Seq("EXPIRE", key, ttlSeconds.toString)))

  override def putHash(key: String, field: String, value: String): Unit =
    pipeline(Seq(Seq("HSET", key, field, value)))

  def close(): Unit = synchronized { if (sock != null) sock.close() }
}
