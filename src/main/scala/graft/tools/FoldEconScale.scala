package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Maintenance-economics harness for the base ≫ batch regime (r12 verdict
  * 1): both index-maintenance ops — the dedup ingest fold
  * ([[graft.jobs.DedupIngestJob]]) and the IVF compaction
  * ([[graft.operators.Ann.compactIvfIndex]]) — historically rewrote the
  * ENTIRE base generation per fire, so per-fire cost is O(corpus) and
  * lifetime maintenance write volume is quadratic in corpus over an
  * ingest's life. That is invisible at gate scale (base ≈ batches) and
  * exactly the regime a year of 100 TB ingest produces.
  *
  * The harness measures the per-fire cost CURVE directly: for each base
  * multiplier m, seed/build an index of m × batchSize documents/vectors,
  * ingest two batch-sized increments, fire the maintenance op, and record
  * wall seconds + on-disk base bytes. A linear-in-base curve confirms the
  * rewrite economics; a flat curve (with tiering enabled) confirms the
  * minor-fold fix.
  *
  * Usage: FoldEconScale <srcDir> <dedup|ivf> [multipliers=2,5,10,20]
  *        [batchDocs=5000] [tiered=0|1]
  * Prints one `FOLDECON` line per fire. */
object FoldEconScale {

  private def dirBytes(dir: String): Long = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) return 0L
    val walk = java.nio.file.Files.walk(p)
    try walk.filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    finally walk.close()
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val which = args(1)
    val mults = (if (args.length > 2) args(2) else "2,5,10,20")
      .split(",").map(_.trim.toInt).toSeq
    val batchN = if (args.length > 3) args(3).toInt else 5000
    val tiered = args.length > 4 && args(4) == "1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    which match {
      case "dedup" => dedup(spark, srcDir, mults, batchN, tiered)
      case "ivf" => ivf(spark, srcDir, mults, batchN, tiered)
      case other => sys.error(s"unknown mode $other (dedup|ivf)")
    }
    spark.stop()
  }

  /** Dedup-fold curve: seed m×batchN docs, stream 2 batches of batchN
    * with foldAfterBatches=1 (every batch fires a fold), record each
    * fire's wall + the pre-fire index bytes. */
  private def dedup(spark: SparkSession, srcDir: String, mults: Seq[Int],
                    batchN: Int, tiered: Boolean): Unit = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    mults.foreach { m =>
      val dir = java.nio.file.Files.createTempDirectory(s"foldecon$m").toString
      val seed = docs.orderBy("doc_id").limit(m * batchN)
      graft.jobs.DedupIngestJob.seed(seed, "doc_id", "text", dir)
      val batchRows = docs.orderBy(org.apache.spark.sql.functions.desc("doc_id"))
        .limit(2 * batchN).as[(Long, String)].collect().toSeq
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(Long, String)]
      @volatile var foldMark = 0L
      val foldWalls = scala.collection.mutable.ArrayBuffer.empty[Double]
      val q = graft.jobs.DedupIngestJob.start(
        stream.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
        trigger = Trigger.ProcessingTime(0L),
        onBatch = (_, _) => { foldMark = System.nanoTime() },
        foldAfterBatches = 1,
        foldBaseRatio = if (tiered) 0.3 else 0.0,
        onFold = _ => foldWalls.synchronized {
          foldWalls += (System.nanoTime() - foldMark) / 1e9; () })
      try {
        batchRows.grouped(batchN).zipWithIndex.foreach { case (rows, i) =>
          val preBytes = dirBytes(s"$dir/index")
          stream.addData(rows: _*)
          q.processAllAvailable()
          val walls = foldWalls.synchronized {
            val w = foldWalls.toSeq; foldWalls.clear(); w }
          // live generation count after the fire: 1 = the fire was a
          // major collapse, >1 = it was a minor sibling fold
          val gens = scala.util.Try(java.nio.file.Files.readString(
              java.nio.file.Paths.get(s"$dir/index/FOLDED")).trim
              .split("\\s+")(1).split(",").length).getOrElse(0)
          walls.foreach { w =>
            println(f"FOLDECON dedup mult=$m fire=${i + 1} " +
              f"base_docs=${m * batchN} batch_docs=$batchN " +
              f"pre_bytes=$preBytes wall=$w%.2f tiered=$tiered gens=$gens")
          }
        }
      } finally q.stop()
      deleteRec(dir)
    }
  }

  /** IVF-compact curve: build an index of m×batchN vectors, append 2
    * shards of batchN, compact, record the wall + pre-compact bytes. */
  private def ivf(spark: SparkSession, srcDir: String, mults: Seq[Int],
                  batchN: Int, tiered: Boolean): Unit = {
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    mults.foreach { m =>
      val dir = java.nio.file.Files.createTempDirectory(s"compecon$m").toString
      val base = emb.orderBy("vec_id").limit(m * batchN)
      val nCents = math.max(4, math.sqrt((m * batchN).toDouble).toInt)
      graft.operators.Ann.buildIvfIndex(base, "vec_id", "embedding", dir,
        nCentroids = nCents, distributedFit = true)
      // tiered mode: the first fire on a single-generation index is the
      // (untimed) major split — the TIMED fire below is then the steady
      // per-append minor, the cost the tiering exists to flatten
      if (tiered)
        graft.operators.Ann.compactIvfIndexTiered(spark, dir,
          baseRatio = 0.3)
      val appends = emb.orderBy(org.apache.spark.sql.functions.desc("vec_id"))
        .limit(2 * batchN)
      val half = appends.count() / 2
      graft.operators.Ann.appendIvfShard(appends.limit(half.toInt),
        "vec_id", "embedding", dir)
      graft.operators.Ann.appendIvfShard(
        appends.orderBy("vec_id").limit(half.toInt),
        "vec_id", "embedding", dir)
      val preBytes = dirBytes(dir)
      val t0 = System.nanoTime()
      if (tiered)
        graft.operators.Ann.compactIvfIndexTiered(spark, dir,
          baseRatio = 0.3)
      else
        graft.operators.Ann.compactIvfIndex(spark, dir)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"FOLDECON ivf mult=$m base_vecs=${m * batchN} " +
        f"shard_vecs=$batchN pre_bytes=$preBytes wall=$wall%.2f " +
        f"tiered=$tiered")
      deleteRec(dir)
    }
  }

  private def deleteRec(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close()
    }
  }
}
