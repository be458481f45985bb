package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, IOException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

/** Minimal RESP (REdis Serialization Protocol) client — the real transport
  * behind the [[KVSink]] seam (SURVEY §2.1 K1/K2/K6).
  *
  * The reference talks to a live Redis for every surface: `SET
  * b_similar:{id}` from the batch job (simility_books.py:93-94), `SET
  * b_like:{uid}` / `SET u_similar:{uid}` with a sleep-and-reconnect retry
  * from the services (guessLike_u_like.py:211-226). This client speaks the
  * public RESP wire format (inline `*N`/`$len` frames) over a plain TCP
  * socket, so it works against any Redis-compatible server — and against
  * the in-process test server in ConnectorSpec, keeping CI hermetic.
  *
  * Executor-side discipline: connections are pooled one-per-JVM per
  * (host, port) in [[RespClient.pooled]]; tasks on the same executor share
  * the connection (commands are synchronized — RESP is strictly
  * request/response so this is safe), and a broken socket is dropped from
  * the pool so the next operation reconnects. Bounded retry policy stays
  * where it was: compose with [[RetryingKV]] (K2), mirroring the
  * reference's reconnect loop.
  */
object Resp {
  sealed trait Value
  final case class Simple(s: String) extends Value
  final case class Err(msg: String) extends Value
  final case class IntVal(v: Long) extends Value
  final case class Bulk(v: Option[String]) extends Value
  final case class Arr(items: Seq[Value]) extends Value

  /** Encode a command as a RESP array of bulk strings; `$` lengths are
    * BYTE lengths (UTF-8), not char counts. */
  private[graft] def encode(args: Seq[String]): Array[Byte] = {
    val head = new java.io.ByteArrayOutputStream()
    head.write(s"*${args.length}\r\n".getBytes(UTF_8))
    args.foreach { a =>
      val b = a.getBytes(UTF_8)
      head.write(s"$$${b.length}\r\n".getBytes(UTF_8))
      head.write(b)
      head.write("\r\n".getBytes(UTF_8))
    }
    head.toByteArray
  }

  private[graft] def readValue(in: BufferedInputStream): Value = {
    val line = readLine(in)
    line.charAt(0) match {
      case '+' => Simple(line.substring(1))
      case '-' => Err(line.substring(1))
      case ':' => IntVal(line.substring(1).toLong)
      case '$' =>
        val n = line.substring(1).toInt
        if (n < 0) Bulk(None)
        else {
          val buf = new Array[Byte](n)
          var off = 0
          while (off < n) {
            val r = in.read(buf, off, n - off)
            if (r < 0) throw new IOException("RESP stream closed mid-bulk")
            off += r
          }
          expectCrlf(in)
          Bulk(Some(new String(buf, UTF_8)))
        }
      case '*' =>
        val n = line.substring(1).toInt
        if (n < 0) Arr(Nil)
        else Arr(Seq.fill(n)(readValue(in)))
      case c => throw new IOException(s"unexpected RESP type byte '$c'")
    }
  }

  private def readLine(in: BufferedInputStream): String = {
    val sb = new StringBuilder
    var b = in.read()
    while (b != '\r') {
      if (b < 0) throw new IOException("RESP stream closed mid-line")
      sb.append(b.toChar)
      b = in.read()
    }
    if (in.read() != '\n') throw new IOException("RESP line missing LF")
    sb.toString
  }

  private def expectCrlf(in: BufferedInputStream): Unit =
    if (in.read() != '\r' || in.read() != '\n')
      throw new IOException("RESP bulk missing CRLF terminator")
}

/** One live RESP connection. Commands are synchronized (strict
  * request/response), so a connection can be shared by the tasks of one
  * executor. Not serializable by design — ship [[RespKV]] instead. */
class RespClient(host: String, port: Int, connectTimeoutMs: Int = 5000,
                 readTimeoutMs: Int = 10000) extends java.io.Closeable {
  private val sock = new Socket()
  sock.connect(new InetSocketAddress(host, port), connectTimeoutMs)
  sock.setSoTimeout(readTimeoutMs)
  sock.setTcpNoDelay(true)
  private val in = new BufferedInputStream(sock.getInputStream)
  private val out = new BufferedOutputStream(sock.getOutputStream)

  def command(args: String*): Resp.Value = synchronized {
    out.write(Resp.encode(args))
    out.flush()
    Resp.readValue(in)
  }

  override def close(): Unit = sock.close()
}

object RespClient {
  private val pool = new ConcurrentHashMap[(String, Int), RespClient]()

  /** JVM-wide connection pool: one connection per (host, port) per
    * executor. `invalidate` drops a broken connection so the next call
    * reconnects. */
  def pooled(host: String, port: Int): RespClient =
    pool.computeIfAbsent((host, port), { hp: (String, Int) =>
      new RespClient(hp._1, hp._2)
    })

  def invalidate(host: String, port: Int): Unit = {
    val c = pool.remove((host, port))
    if (c != null) { try c.close() catch { case _: IOException => () } }
  }
}

/** [[KVSink]] over a live RESP/Redis-compatible server: `put` = SET,
  * `get` = GET. Serializable carrier of (host, port) only — each executor
  * JVM lazily opens (and pools) its own connection. IO failures invalidate
  * the pooled connection and rethrow, so a [[RetryingKV]] wrapper retries
  * on a FRESH connection — the engine form of the reference's
  * sleep-30s-and-reconnect loop (guessLike_u_like.py:214-226). */
class RespKV(host: String, port: Int) extends KVSink {
  private def run[T](f: RespClient => T): T =
    try f(RespClient.pooled(host, port))
    catch {
      case e: IOException =>
        RespClient.invalidate(host, port)
        throw e
    }

  def put(key: String, value: String): Unit = run { c =>
    c.command("SET", key, value) match {
      case Resp.Err(m) => throw new IOException(s"SET $key failed: $m")
      case _ => ()
    }
  }

  def get(key: String): Option[String] = run { c =>
    c.command("GET", key) match {
      case Resp.Bulk(v) => v
      case Resp.Err(m) => throw new IOException(s"GET $key failed: $m")
      case other => throw new IOException(s"GET $key: unexpected reply $other")
    }
  }
}
