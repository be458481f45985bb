package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state measurement (JMH-style): each query runs once untimed —
    // absorbing codegen compilation and classloading, which dominate cold
    // runs 3x — then the MEDIAN of three timed runs is reported. Cluster
    // jobs are never cold-JVM per query, so steady-state is the
    // representative number; the median damps the ±40% box-load variance
    // a single timed run is exposed to.
    // Sorted name order: Map iteration order reshuffles whenever a query
    // is added, and cross-query JVM state (cache occupancy, GC pressure)
    // is the main run-to-run variance source — fixed order keeps
    // round-over-round numbers comparable.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // EVERY run (warm and timed) starts from a cold session cache:
      // cache-owning operators (Dedup/Ann) follow the caller-owned-result
      // contract — each invocation is a complete eager computation — so
      // letting a timed run read the previous run's still-cached frames
      // would UNDER-measure it (a cache scan, not the query), while
      // letting generations of persists accumulate over a 4-run
      // measurement makes later runs fight them for unified memory (the
      // r2 d5 driver-bench blowup). Cold-cache + warm-JVM is both the
      // honest and the reproducible point.
      // a failed run reports -1, never its elapsed-until-throw time — a
      // few-ms failure must not masquerade as a fast success. The FIRST
      // failure's class+message is kept per query (BENCH_r04's ten failures
      // shared one root cause but the artifact recorded nothing).
      var firstErr: Option[String] = None
      def runOnce(): Double = {
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          if (firstErr.isEmpty) {
            val msg = s"${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").replaceAll("\\s+", " ").take(200)
            firstErr = Some(msg)
            System.err.println(s"[bench] $name FAILED $msg")
          }
          -1.0
        }
      }
      runOnce()   // warm-up: codegen compilation + classloading
      val times = (1 to 3).map(_ => runOnce())
      val secs =
        if (times.exists(_ < 0)) -1.0 else times.sorted.apply(1)   // median
      (name, secs, firstErr)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""

    // The round artifact keeps only the LAST ~2000 chars of stdout, and the
    // full per-query map (~3 KB at 114 queries) cannot fit — BENCH_r03 lost
    // the a*/ann*/d*/e2e families to head-truncation. Loss-proofing, in
    // print order:
    //   1. the complete full-precision line (parsers reading full stdout
    //      still get everything),
    //   2. target/bench_local.json with the same content (survives any
    //      stdout capture),
    //   3. LAST: a compact contract-shaped line — total, per-family
    //      subtotals, the 10 slowest queries, failure names — sized well
    //      under the tail budget so the artifact of record always retains
    //      the headline numbers.
    println(fullLine)
    val outPath = java.nio.file.Paths.get("target/bench_local.json")
    java.nio.file.Files.createDirectories(outPath.getParent)
    java.nio.file.Files.write(outPath,
      (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def r3(v: Double): String = f"$v%.3f"
    val ok = results.filter(_._2 >= 0)
    val families = ok
      .groupBy { case (name, _, _) => name.takeWhile(_ != '_').takeWhile(!_.isDigit) }
      .toSeq.sortBy(_._1)
      .map { case (fam, rs) => s"\"$fam\":${r3(rs.map(_._2).sum)}" }
      .mkString("{", ",", "}")
    val slowest = ok.sortBy(-_._2).take(10)
      .map { case (k, v, _) => s"\"$k\":${r3(v)}" }.mkString("{", ",", "}")
    // "failed" stays a JSON ARRAY of names — the shape every BENCH_r0x
    // artifact before r05 used (r05 briefly made it an object and broke
    // the cross-round contract); the per-query first failure
    // (class + message) rides separately in "errors", so a regressed
    // query is still diagnosable from the artifact alone.
    val failedRows = results.filter(_._2 < 0)
    val failed = failedRows.map { case (k, _, _) => jstr(k) }
      .mkString("[", ",", "]")
    val errors = failedRows
      .map { case (k, _, err) => s"${jstr(k)}:${jstr(err.getOrElse("unknown"))}" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","nqueries":${results.size},"failed":$failed,"errors":$errors,"families":$families,"slowest":$slowest,"file":"target/bench_local.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
