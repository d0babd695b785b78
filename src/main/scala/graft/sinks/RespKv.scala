package graft.sinks

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, InputStream, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal RESP (REdis Serialization Protocol) client implementing the
  * [[Sinks.KeyValueSink]] contract over a plain JDK socket — no client
  * library (none is available offline, and the contract needs only four
  * commands). Mirrors the reference's Redis writer semantics
  * (`flink-process/.../sink/MyJedisCluster.java:47-58`: DEL → RPUSH →
  * EXPIRE per key; `flink-base/.../sink/MyRedisMapper.scala:12-20`: HSET).
  *
  * Executor model: instances are serialized into foreachPartition closures
  * (one deserialized copy per task), so the CONNECTION cannot live on the
  * instance — it is a JVM-wide registry entry keyed by (host, port) in the
  * companion, shared by every task in the executor, guarded by a
  * per-connection lock, and closed by one JVM shutdown hook. Commands for
  * one logical put are pipelined (single flush) and all replies drained; a
  * `-ERR` reply throws, failing the task so Spark retries — at-least-once,
  * idempotent because every put is a full-key overwrite.
  *
  * Use [[Sinks.kvFromEnv]] to select this against a real server via
  * `GRAFT_REDIS=host:port`; tests run against an in-process mock server.
  */
class RespKv(host: String, port: Int) extends Sinks.KeyValueSink {

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

  private def pipeline(cmds: Seq[Seq[String]]): Unit = {
    val conn = RespKv.connect(host, port)
    conn.synchronized {
      try {
        cmds.foreach(c => conn.out.write(encode(c)))
        conn.out.flush()
        cmds.foreach(_ => RespKv.readReply(conn.in))
      } catch {
        // any failure (IO, EOF, parse of a desynced stream) leaves replies
        // unconsumed, so the connection is poisoned either way — drop it so
        // the next attempt redials instead of reusing it
        case scala.util.control.NonFatal(e) =>
          RespKv.invalidate(host, port, conn)
          throw e
      }
    }
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

  def close(): Unit = RespKv.release(host, port)
}

object RespKv {
  private final class Conn(val sock: Socket) {
    val in: InputStream = new BufferedInputStream(sock.getInputStream)
    val out: OutputStream = new BufferedOutputStream(sock.getOutputStream)
  }

  // one live connection per endpoint per JVM — NOT per task instance: a
  // per-instance socket + shutdown hook would accumulate one of each per
  // task in a long-lived executor (fd exhaustion, unbounded hook threads)
  private val conns =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Conn]()
  private val hooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def connect(host: String, port: Int): Conn =
    conns.compute((host, port), (_, old) => {
      if (old != null && !old.sock.isClosed) old
      else {
        if (old != null) closeQuietly(old)
        if (hooked.compareAndSet(false, true)) {
          // best effort: if the JVM is already shutting down the sockets
          // die with it anyway
          try Runtime.getRuntime.addShutdownHook(new Thread(() => closeAll()))
          catch { case _: IllegalStateException => () }
        }
        new Conn(new Socket(host, port))
      }
    })

  private def release(host: String, port: Int): Unit =
    Option(conns.remove((host, port))).foreach(closeQuietly)

  /** Drop `conn` from the registry (only if still current) and close it. */
  private def invalidate(host: String, port: Int, conn: Conn): Unit = {
    conns.remove((host, port), conn)
    closeQuietly(conn)
  }

  private def closeAll(): Unit = {
    conns.values.forEach(c => closeQuietly(c))
    conns.clear()
  }

  private def closeQuietly(c: Conn): Unit =
    try c.sock.close() catch { case _: Throwable => () }

  private def readLine(in: InputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    // EOF here means the peer closed the connection: that is a FAILED
    // reply, not an empty one — treating it as success would acknowledge
    // writes the server never processed
    if (c == -1) throw new java.io.EOFException("RESP peer closed connection")
    while (c != '\r' && c != -1) { sb.append(c.toChar); c = in.read() }
    in.read() // the \n
    sb.toString
  }

  /** Drain one reply; throws on -ERR. Array/bulk payloads are read fully
    * (writers only need acknowledgement, not content). */
  private def readReply(in: InputStream): Unit = {
    val line = readLine(in)
    if (line.isEmpty) return
    line.charAt(0) match {
      case '+' | ':' => ()
      case '-' => throw new java.io.IOException(s"RESP error: $line")
      case '$' =>
        val n = line.drop(1).toInt
        if (n >= 0) { in.readNBytes(n); in.read(); in.read() }
      case '*' =>
        val n = line.drop(1).toInt
        (0 until math.max(n, 0)).foreach(_ => readReply(in))
      case _ => ()
    }
  }
}
