package graft

import java.io.{BufferedInputStream, BufferedOutputStream, IOException}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.concurrent.{ConcurrentHashMap, CopyOnWriteArrayList}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.io._
import graft.jobs.{RecommenderModel, ServeJob}

/** Hermetic RESP server speaking enough of the Redis wire protocol for the
  * connector tests: PING / SET / GET / DEL against an in-memory map, plus
  * SUBSCRIBE / PUBLISH pub/sub. One thread per connection;
  * `dropConnections` force-closes live sockets so tests can exercise the
  * client's reconnect path. */
class RespTestServer {
  val store = new ConcurrentHashMap[String, String]()
  // channel -> output streams of subscribed connections (writes are
  // synchronized per-stream: the publisher thread races the serve loop)
  private val subscribers =
    new ConcurrentHashMap[String, CopyOnWriteArrayList[java.io.OutputStream]]()
  private val server = new ServerSocket(0)
  private val conns = new CopyOnWriteArrayList[Socket]()
  @volatile private var running = true
  def port: Int = server.getLocalPort
  def subscriberCount(channel: String): Int =
    Option(subscribers.get(channel)).map(_.size).getOrElse(0)

  private def bulk(s: String): String = {
    val b = s.getBytes(UTF_8); s"$$${b.length}\r\n$s\r\n"
  }

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        conns.add(s)
        new Thread(() => serve(s)).start()
      } catch { case _: IOException => () } // server closed
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  private def serve(s: Socket): Unit = {
    try {
      val in = new BufferedInputStream(s.getInputStream)
      val out = new BufferedOutputStream(s.getOutputStream)
      while (!s.isClosed) {
        Resp.readValue(in) match {
          case Resp.Arr(items) =>
            val args = items.collect { case Resp.Bulk(Some(v)) => v }
            val reply = args.map(_.toUpperCase).headOption match {
              case Some("PING") => "+PONG\r\n"
              case Some("SET") if args.length == 3 =>
                store.put(args(1), args(2)); "+OK\r\n"
              case Some("GET") if args.length == 2 =>
                Option(store.get(args(1))) match {
                  case Some(v) =>
                    val b = v.getBytes(UTF_8); s"$$${b.length}\r\n$v\r\n"
                  case None => "$-1\r\n"
                }
              case Some("DEL") if args.length == 2 =>
                val had = store.remove(args(1)) != null
                s":${if (had) 1 else 0}\r\n"
              case Some("SUBSCRIBE") if args.length == 2 =>
                subscribers
                  .computeIfAbsent(args(1), _ => new CopyOnWriteArrayList())
                  .add(out)
                s"*3\r\n${bulk("subscribe")}${bulk(args(1))}:1\r\n"
              case Some("PUBLISH") if args.length == 3 =>
                val subs = Option(subscribers.get(args(1)))
                  .map(_.asScala.toSeq).getOrElse(Nil)
                val frame =
                  s"*3\r\n${bulk("message")}${bulk(args(1))}${bulk(args(2))}"
                subs.foreach { o =>
                  o.synchronized { o.write(frame.getBytes(UTF_8)); o.flush() }
                }
                s":${subs.size}\r\n"
              case Some("SCAN") if args.length >= 2 =>
                // paged like the real thing (page cap 7 regardless of
                // COUNT) so clients' cursor loops actually iterate
                val cursor = args(1).toInt
                val pat = args.sliding(2, 1).collectFirst {
                  case Seq(m, p) if m.equalsIgnoreCase("MATCH") => p
                }.getOrElse("*")
                val re = pat.split("\\*", -1)
                  .map(java.util.regex.Pattern.quote).mkString(".*")
                val all = store.keySet().asScala.toSeq.sorted
                  .filter(_.matches(re))
                val page = all.slice(cursor, cursor + 7)
                val next = if (cursor + 7 >= all.length) 0 else cursor + 7
                s"*2\r\n${bulk(next.toString)}*${page.length}\r\n" +
                  page.map(bulk).mkString
              case _ => "-ERR unknown command\r\n"
            }
            out.synchronized {
              out.write(reply.getBytes(UTF_8))
              out.flush()
            }
          case _ =>
            out.write("-ERR expected array\r\n".getBytes(UTF_8)); out.flush()
        }
      }
    } catch { case _: IOException => () } // client gone
    finally { try s.close() catch { case _: IOException => () } }
  }

  /** Force-close every live connection (server stays up) — simulates the
    * broken-pipe the reference's reconnect loop handles. */
  def dropConnections(): Unit = {
    conns.asScala.foreach(s => try s.close() catch { case _: IOException => () })
    conns.clear()
  }

  def stop(): Unit = {
    running = false
    dropConnections()
    try server.close() catch { case _: IOException => () }
  }
}

/** Tiny newline-delimited publisher for Spark's built-in `socket` source:
  * writes the given lines to every client that connects, then holds the
  * connection open (the socket source treats EOF as source failure). */
class LinePublisher(lines: Seq[String]) {
  private val server = new ServerSocket(0)
  @volatile private var running = true
  def port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val out = s.getOutputStream
        out.write(lines.map(_ + "\n").mkString.getBytes(UTF_8))
        out.flush()
        // keep the socket open until stop(): no EOF mid-query
      } catch { case _: IOException => () }
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = {
    running = false
    try server.close() catch { case _: IOException => () }
  }
}

/** Live-transport integration: the RESP client behind the KVSink seam and
  * ServeJob end-to-end over a real TCP stream source with a checkpoint —
  * the deployment story of the reference's always-on services
  * (guessLike_u_like.py:179-184,211-226) with test-local servers. */
class ConnectorSpec extends SparkSuite {

  test("K1/K6: RespKV round-trips through a live RESP server; executors write") {
    val server = new RespTestServer()
    try {
      val kv = new RespKV("127.0.0.1", server.port)
      kv.put("k1", "v1")
      assert(kv.get("k1").contains("v1"))
      assert(kv.get("absent").isEmpty)
      // UTF-8 values survive byte-length bulk encoding
      kv.put("cjk", "三体,活着")
      assert(kv.get("cjk").contains("三体,活着"))
      // executor-side writes through the generic KVWriter path
      import spark.implicits._
      val df = (1 to 20).map(i => (s"key:$i", s"val:$i")).toDF("key", "value")
      KVWriter.write(df, kv)
      assert(server.store.size >= 22)
      assert(server.store.get("key:17") == "val:17")
    } finally server.stop()
  }

  test("K7: batch key-scan table reads the store set-oriented, paged SCAN") {
    val server = new RespTestServer()
    try {
      val kv = new RespKV("127.0.0.1", server.port)
      (0 until 20).foreach(i => kv.put(f"b_like:$i%03d", s"v$i"))
      (0 until 5).foreach(i => kv.put(s"other:$i", "x"))
      val df = spark.read.format("graft.io.RespKeyScanProvider")
        .option("host", "127.0.0.1").option("port", server.port.toString)
        .option("pattern", "b_like:*").option("numPartitions", "3")
        .load()
      // 20 matching keys through 3 paged SCANs (server page cap 7)
      import spark.implicits._
      val got = df.as[(String, String)].collect().toMap
      assert(got.size == 20)
      assert(got(f"b_like:${7}%03d") == "v7")
      assert(!got.keySet.exists(_.startsWith("other:")))
      assert(df.rdd.getNumPartitions == 3)
      // keys deleted between planning and read surface as null values —
      // driven at the reader level (plan timing is lazy, so a planned-
      // then-deleted key can't be staged deterministically from outside)
      val reader = RespKeyScanReaderFactory("127.0.0.1", server.port)
        .createReader(KeysPartition(Array("b_like:001", "ghost")))
      assert(reader.next() && !reader.get().isNullAt(1))
      assert(reader.next() && reader.get().isNullAt(1),
        "a vanished key must surface with a null value, not throw")
      assert(!reader.next())
    } finally server.stop()
  }

  test("K2/K6: dropped connection is invalidated; RetryingKV reconnects") {
    val server = new RespTestServer()
    try {
      val plain = new RespKV("127.0.0.1", server.port)
      plain.put("before", "1")
      server.dropConnections()
      // the pooled connection is now broken: plain client surfaces the IO
      // failure (and invalidates the pool entry)...
      intercept[IOException](plain.put("during", "2"))
      // ...so a RetryingKV-wrapped client transparently reconnects — the
      // reference's sleep-and-reconnect loop (guessLike_u_like.py:214-226)
      val retrying = new RetryingKV(plain, maxRetries = 2, backoffMs = 1L)
      retrying.put("after", "3")
      assert(retrying.get("after").contains("3"))
    } finally server.stop()
  }

  test("K3/ST1: RESP pub/sub source — subscribe, publish, micro-batch rows") {
    val server = new RespTestServer()
    try {
      val frames = spark.readStream
        .format("graft.io.RespSubscribeProvider")
        .option("host", "127.0.0.1")
        .option("port", server.port.toString)
        .option("channel", "chatu")
        .load()
      val q = frames.writeStream
        .format("memory")
        .queryName("pubsub_rows")
        .outputMode("append")
        .start()
      // wait for the driver-side subscription to land, then publish
      val deadline = System.currentTimeMillis() + 30000
      while (server.subscriberCount("chatu") == 0 &&
             System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(server.subscriberCount("chatu") == 1)
      val pub = new RespClient("127.0.0.1", server.port)
      assert(pub.command("PUBLISH", "chatu", """{"userId": 101}""") == Resp.IntVal(1))
      assert(pub.command("PUBLISH", "chatu", """{"userId": 106}""") == Resp.IntVal(1))
      pub.close()
      while (spark.table("pubsub_rows").count() < 2 &&
             System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(20)
      }
      q.stop()
      import spark.implicits._
      val got = spark.table("pubsub_rows").as[String].collect().toSet
      assert(got == Set("""{"userId": 101}""", """{"userId": 106}"""))
    } finally server.stop()
  }

  test("K3/ST3: the reference loop live — pub/sub event in, recs SET in KV") {
    val server = new RespTestServer()
    try {
      val fitted = RecommenderModel.fit(
        Fixtures.books(spark), Fixtures.tags(spark), Fixtures.bookTags(spark),
        Fixtures.collects(spark),
        minCollected = 2, minDf = 1.0, stopWords = Nil, k = 2, hotN = 3)
      val frames = spark.readStream
        .format("graft.io.RespSubscribeProvider")
        .option("host", "127.0.0.1")
        .option("port", server.port.toString)
        .option("channel", "chatu")
        .load()
      val kv = new RetryingKV(new RespKV("127.0.0.1", server.port),
        maxRetries = 2, backoffMs = 10L)
      val q = ServeJob.start(frames, fitted, Fixtures.collects(spark), kv,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      val deadline = System.currentTimeMillis() + 60000
      while (server.subscriberCount("chatu") == 0 &&
             System.currentTimeMillis() < deadline) Thread.sleep(20)
      val pub = new RespClient("127.0.0.1", server.port)
      pub.command("PUBLISH", "chatu", """{"userId": 101}""")
      pub.close()
      while (!server.store.containsKey("b_like:101") &&
             System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(20)
      }
      q.stop()
      assert(server.store.containsKey("b_like:101"),
        s"KV store after timeout: ${server.store}")
      val recs101 = server.store.get("b_like:101")
        .split(",").map(_.toLong).toSet
      assert(recs101.intersect(Set(1L, 3L, 5L, 7L)).isEmpty)
    } finally server.stop()
  }

  test("ST1/ST7: ServeJob end-to-end over a live socket stream into RESP KV") {
    val events = Seq(
      """{"userId": 101}""",
      """{"userId": 106, "bookIds": [3, 4]}""",
      "subscribe-ack")  // non-JSON ack frame: must be dropped by decode
    val publisher = new LinePublisher(events)
    val respServer = new RespTestServer()
    val checkpoint = Files.createTempDirectory("serve-ckpt").toString
    try {
      val fitted = RecommenderModel.fit(
        Fixtures.books(spark), Fixtures.tags(spark), Fixtures.bookTags(spark),
        Fixtures.collects(spark),
        minCollected = 2, minDf = 1.0, stopWords = Nil, k = 2, hotN = 3)
      val frames = spark.readStream
        .format("socket")
        .option("host", "127.0.0.1")
        .option("port", publisher.port)
        .load()
      val kv = new RetryingKV(new RespKV("127.0.0.1", respServer.port),
        maxRetries = 2, backoffMs = 10L)
      val q = ServeJob.start(frames, fitted, Fixtures.collects(spark), kv,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
        checkpointLocation = Some(checkpoint))
      // wait until both decoded users have answers in the KV store
      val deadline = System.currentTimeMillis() + 60000
      def done = respServer.store.containsKey("b_like:101") &&
        respServer.store.containsKey("b_like:106")
      while (!done && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(50)
      }
      q.stop()
      assert(done, s"KV store after timeout: ${respServer.store}")
      // u_like semantics survived the transport: 101's recs exclude the
      // books 101 already collected (1,3,5,7 in the fixture)
      val recs101 = respServer.store.get("b_like:101")
        .split(",").map(_.toLong).toSet
      assert(recs101.intersect(Set(1L, 3L, 5L, 7L)).isEmpty)
      assert(respServer.store.containsKey("u_similar:101"))
      // the checkpoint directory was actually used by the stream
      assert(Files.list(java.nio.file.Paths.get(checkpoint)).count() > 0)
    } finally {
      publisher.stop()
      respServer.stop()
    }
  }
}
