package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Layout-controlled parquet sinks. At 100 TB the WRITE layout decides the
  * read performance of every downstream job: partition-directory pruning
  * only prunes what partitionBy laid out, row-group skipping only skips
  * what was sorted, and a million 2 MB files turn the next scan's task
  * scheduling into the bottleneck. These helpers make the three knobs —
  * directory partitioning, within-file ordering, file sizing — explicit,
  * plus the compaction pass that repairs layouts after incremental appends.
  */
object Sink {

  /** Write `df` as parquet partitioned by `partitionCols` with a controlled
    * file layout:
    *
    *   - exactly up to `filesPerPartition` files per partition-directory:
    *     rows shuffle on (partitionCols, salt) where salt =
    *     xxhash64(sortCols) mod filesPerPartition — deterministic (no
    *     rand()), and a HOT partition value still writes in parallel
    *     instead of through one task;
    *   - rows within each file sorted by `sortCols`
    *     (sortWithinPartitions — a local sort, no extra shuffle), so
    *     parquet min/max row-group stats actually skip on those columns
    *     and RLE/dictionary encodings compress runs;
    *   - `maxRecordsPerFile` as the overflow bound (0 = unlimited).
    *
    * The salt column never reaches the files — it is dropped after the
    * repartition (a projection, which preserves the shuffle's partitioning).
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String], sortCols: Seq[String],
                       filesPerPartition: Int = 1,
                       maxRecordsPerFile: Long = 0L,
                       format: String = "parquet"): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    require(sortCols.nonEmpty, "sortCols must be non-empty")
    require(filesPerPartition >= 1,
      s"filesPerPartition must be >= 1 (got $filesPerPartition)")
    // both columnar formats Spark bundles keep per-stripe/row-group
    // min/max stats, so the sorted layout prunes under either
    require(format == "parquet" || format == "orc",
      s"format must be 'parquet' or 'orc' (got '$format')")
    val salt = pmod(xxhash64(sortCols.map(col): _*),
      lit(filesPerPartition.toLong))
    df.withColumn("__salt", salt)
      .repartition((partitionCols :+ "__salt").map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .drop("__salt")
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .format(format)
      .save(path)
  }

  /** 2-D z-order (Morton) value for layout control: sort/partition by this
    * to keep consecutive rows close in BOTH dimensions, so parquet
    * row-group min/max stats prune on either column's predicate (a
    * single-column sort only prunes its leading column). Inputs must be
    * non-negative bucket ranks in [0, 2^31) — map raw domains to ranks
    * first; only the low 31 bits participate. Codegen'd kernel
    * ([[graft.expressions.ZOrder2]]; SQL: `zorder2`). Typical use:
    * `writePartitioned(df.withColumn("z", Sink.zorder($"dayRank", $"userBucket")),
    * ..., sortCols = Seq("z"))`. */
  def zorder(a: org.apache.spark.sql.Column,
             b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.expressions.ZOrder2(expression(a), expression(b)))
  }

  /** Write parquet with BLOOM FILTERS on `bloomCols` — row-group skipping
    * for point predicates on HIGH-CARDINALITY columns, where min/max stats
    * prune nothing (an id scattered uniformly spans every row group's
    * min/max range) and sorting/z-ordering by the column is not worth a
    * layout slot. The parquet writer sizes each filter from `expectedNdv`
    * (expected distinct values per row group → bits per filter), and the
    * reader consults it for `col = literal` predicates: row groups whose
    * filter definitely lacks the value are skipped at the footer, never
    * read. This is the "needle lookup in a 100 TB fact table" path —
    * complementary to [[zorder]] (range locality) and
    * [[writeBucketedTable]] (join locality). BloomSinkSpec proves the
    * skip with scan-metric deltas on identical data written with and
    * without filters. */
  def writeWithBloom(df: DataFrame, path: String, bloomCols: Seq[String],
                     expectedNdv: Long = 100000L,
                     maxRecordsPerFile: Long = 0L): Unit = {
    require(bloomCols.nonEmpty, "bloomCols must be non-empty")
    val w = df.write
    bloomCols.foreach { c =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
      w.option(s"parquet.bloom.filter.expected.ndv#$c", expectedNdv.toString)
    }
    w.option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }

  /** Write `df` as a BUCKETED (optionally bucket-sorted) parquet table:
    * rows are hash-distributed into `buckets` files per partition by
    * `bucketCols`. Bucketing is the PRE-SHUFFLE a 100 TB pipeline pays once
    * at write time: every later equi-join or aggregation on the bucket key
    * between tables bucketed the same way runs with NO Exchange — the scan
    * itself reports the hash partitioning Catalyst needs (asserted by
    * BucketedJoinSpec). Use for fact tables joined repeatedly on the same
    * key (user id, doc id): one write-side shuffle replaces a read-side
    * shuffle per downstream job.
    *
    * Spark requires bucketed data to be table-backed (`saveAsTable`) so the
    * bucket spec lives in the catalog — a plain path write has nowhere to
    * record it, which is why this takes a table name, unlike
    * [[writePartitioned]]. */
  def writeBucketedTable(df: DataFrame, table: String, buckets: Int,
                         bucketCols: Seq[String],
                         sortCols: Seq[String] = Nil): Unit = {
    require(buckets >= 1, s"buckets must be >= 1 (got $buckets)")
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    val w = df.write.format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val ws =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.mode("overwrite").saveAsTable(table)
  }

  final case class CompactionReport(filesBefore: Long, filesAfter: Long,
                                    bytes: Long)

  /** Compact the parquet dataset at `path` toward `targetBytes` per file:
    * list the current data files, size the output at
    * ceil(totalBytes / targetBytes) files (per partition-directory when the
    * dataset is partitioned — partition columns are re-derived from the
    * directory layout and re-written), rewrite to a temp sibling, then
    * atomically swap directories. The repair pass for the small-file
    * buildup that incremental/streaming appends leave behind; idempotent —
    * re-running on a compacted dataset rewrites it to the same shape.
    *
    * The swap is rename-based (tmp → live with the old live renamed aside
    * first and deleted last), so a crash mid-swap leaves either the old or
    * the new complete dataset on disk, never a partial mix. A concurrent
    * reader CAN glimpse a missing dir for the two metadata ops between the
    * renames — unavoidable for a path-addressed dataset, where readers
    * `spark.read.parquet(path)` directly and no indirection can be added
    * without breaking them. When readers must never blip, address the data
    * through a pointer-resolved layout instead (the shape
    * [[graft.operators.Ann.buildIvfIndex]] uses: generation dirs behind an
    * atomically-flipped CURRENT file) and compact into a new generation. */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 512L << 20): CompactionReport = {
    require(targetBytes >= 1L, s"targetBytes must be >= 1 (got $targetBytes)")
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    val dataFiles = listDataFiles(fs, p)
    require(dataFiles.nonEmpty, s"no parquet data files under $path")
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt

    val df = spark.read.parquet(path)
    // partition dirs (col=value) become ordinary columns on read; re-write
    // them as partition dirs so the layout (and pruning) survives compaction
    val partCols = partitionColsFromLayout(dataFiles.head.getPath, p)
    val tmp = new Path(p.getParent, p.getName + "__compact_tmp")
    fs.delete(tmp, true)
    val writer =
      if (partCols.isEmpty) df.repartition(nOut).write
      else {
        // size per partition DIRECTORY: nOut total files spread over the
        // dirs, at least one per dir. The salt hashes the DATA columns —
        // deterministic (xxhash64 of row content, so a task retry re-derives
        // the same assignment — rand() here could lose/duplicate rows under
        // partial stage recompute), and row-dependent (a salt of the
        // partition columns would be constant per dir and collapse every
        // dir to one file regardless of its size).
        val nDirs = dataFiles
          .map(_.getPath.getParent.toString).distinct.length
        val filesPerDir = math.max(1L, math.round(nOut.toDouble / nDirs))
        val dataCols = df.columns.filterNot(partCols.contains).toSeq
        df.withColumn("__salt",
            pmod(xxhash64(dataCols.map(col): _*), lit(filesPerDir)))
          .repartition((partCols :+ "__salt").map(col): _*)
          .drop("__salt")
          .write.partitionBy(partCols: _*)
      }
    writer.mode("overwrite").parquet(tmp.toString)

    val old = new Path(p.getParent, p.getName + "__compact_old")
    fs.delete(old, true)
    require(fs.rename(p, old), s"compaction swap failed: cannot move $p aside")
    require(fs.rename(tmp, p), s"compaction swap failed: cannot move $tmp in")
    fs.delete(old, true)
    CompactionReport(dataFiles.length.toLong, listDataFiles(fs, p).length.toLong,
      totalBytes)
  }

  private def listDataFiles(fs: FileSystem, root: Path) = {
    val it = fs.listFiles(root, true)
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.hadoop.fs.LocatedFileStatus]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) buf += f
    }
    buf.toSeq
  }

  /** Recover hive-style partition column names (`col=value` path segments)
    * from one data file's path relative to the dataset root. */
  private def partitionColsFromLayout(file: Path, root: Path): Seq[String] = {
    val rel = file.toString.stripPrefix(root.toString).stripPrefix("/")
    rel.split('/').dropRight(1).toSeq
      .filter(_.contains('=')).map(_.takeWhile(_ != '='))
  }
}
