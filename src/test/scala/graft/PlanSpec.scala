package graft

/** Plan-shape regression tests: the scale properties SCALING.md claims are
  * asserted against the actual physical plans, so a refactor that silently
  * loses pushdown, broadcast, or group-limit rewrites fails CI — not a
  * 100 TB run. */
class PlanSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  test("S1: filter + projection pushed into the parquet scan") {
    val p = plan("s1_scan_project")
    assert(p.contains("PushedFilters: [IsNotNull(p_size), GreaterThan(p_size,25)"))
    assert(!p.contains("p_brand"), "reads a column it doesn't output")
  }

  test("J1: fact-dim join broadcasts the dimension side") {
    assert(plan("j1_broadcast_join_agg").contains("BroadcastHashJoin"))
  }

  test("W1: per-key top-k plans WindowGroupLimit (bounded per-key heap)") {
    assert(plan("w1_topk_per_key").contains("WindowGroupLimit"))
  }

  test("W2/A7: global top-k plans TakeOrderedAndProject (no global sort)") {
    assert(plan("w2_global_topk").contains("TakeOrderedAndProject"))
    assert(plan("a7_hot_topn").contains("TakeOrderedAndProject"))
  }

  test("J5/J6: anti/semi joins stay join-shaped (no cross products)") {
    assert(plan("j5_anti_join").contains("LeftAnti"))
    assert(plan("j6_semi_join").contains("LeftSemi"))
  }

  test("q1: aggregation is partial+final (map-side combine)") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"))
    assert("HashAggregate".r.findAllIn(p).size >= 2, "no partial aggregation")
  }

  test("d8: chunk dedup stays shuffle-shaped — no cross product anywhere") {
    val p = plan("d8_chunk_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
    assert(p.contains("WindowGroupLimit") || p.contains("Window"))
  }

  test("s15: key profile aggregates partial+final on both levels") {
    val p = plan("s15_key_histogram")
    assert("HashAggregate".r.findAllIn(p).size >= 3,
      "expected partial+final at the key level and again at the bucket level")
  }

  test("s16: token budget is one window shuffle, no join, no cross product") {
    val p = plan("s16_token_budget")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"))
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      "prefix cut should shuffle on the stratum key (plus the final agg)")
  }

  test("ann4: coarse pass broadcasts the quantized query side") {
    val p = plan("ann4_quantized_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "quantized scoring should broadcast queries, never shuffle the corpus")
  }

  test("a16/a17: ROLLUP and CUBE plan ONE Expand + partial/final aggregate") {
    for (q <- Seq("a16_rollup", "a17_cube")) {
      val p = plan(q)
      assert("Expand".r.findAllIn(p).size >= 1, s"$q lost the Expand lattice")
      assert(!p.contains("Union"),
        s"$q must be one Expand+aggregate, not one job per grouping set:\n$p")
      assert("HashAggregate".r.findAllIn(p).size >= 2, s"$q lost partial agg")
    }
  }

  test("a18: pivot is pure aggregation — no join, no distinct-values job") {
    val p = plan("a18_pivot")
    assert(!p.contains("Join"))
    // Spark plans pivot as two stacked aggregates: (key, pivotCol) partials
    // then PivotFirst on key — two hash exchanges, both combine map-side.
    // More than that would mean the explicit value list stopped working
    // and a distinct-values subquery crept in.
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("w8: partitioned ntile is one window shuffle, no global sort") {
    val p = plan("w8_ntile")
    assert(p.contains("Window"))
    // rangepartitioning appears once for the output ORDER BY only — the
    // window itself must run on hashpartitioning (per-key, parallel)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("d9: fuzzy join broadcasts the query side; corpus side never shuffles") {
    val p = plan("d9_edit_distance")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Exchange hashpartitioning"),
      s"corpus side of the fuzzy join must not shuffle:\n$p")
  }

  test("q3/q5: star joins broadcast dims, never cross-product; filters reach scans") {
    val p3 = plan("q3_shipping_priority")
    assert(p3.contains("BroadcastHashJoin"), p3)
    assert(!p3.contains("CartesianProduct"))
    assert(p3.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"),
      "segment filter must reach the customer scan")
    val p5 = plan("q5_local_supplier")
    assert("BroadcastHashJoin".r.findAllIn(p5).size >= 2, p5)
    assert(!p5.contains("CartesianProduct"))
  }

  test("q6/q10: every probe predicate reaches the scan; top-k is TakeOrdered") {
    // formatted mode prints the full PushedFilters list (toString truncates)
    val p6 = SparkEntry.queries("q6_forecast_revenue")(spark,
        "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    for (f <- Seq("GreaterThanOrEqual(l_shipdate,", "LessThan(l_shipdate,",
        "GreaterThanOrEqual(l_discount,0.05)", "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)"))
      assert(p6.contains(f), s"expected pushed filter $f:\n$p6")
    assert(!p6.contains("Exchange hashpartitioning"),
      s"q6 must not shuffle (scan + global agg only):\n$p6")
    val p10 = plan("q10_returned_items")
    assert(p10.contains("TakeOrderedAndProject"), p10)
    assert(p10.contains("EqualTo(l_returnflag,R)"),
      "return-flag filter must reach the lineitem scan")
    assert(!p10.contains("CartesianProduct"))
  }

  test("q12/q18: projection pruning reaches the scans; q18 caps with TakeOrdered") {
    val p12 = plan("q12_late_shipments")
    assert(!p12.contains("CartesianProduct"))
    // only the three lineitem columns the query touches may be read
    assert(!p12.contains("l_extendedprice"),
      s"q12 must prune unused lineitem columns:\n$p12")
    val p18 = plan("q18_large_orders")
    assert(p18.contains("TakeOrderedAndProject"), p18)
    assert(!p18.contains("CartesianProduct"))
  }

  test("q4/q7: EXISTS plans as one semi hash join; q7 broadcasts every dim") {
    val p4 = plan("q4_order_priority")
    assert(p4.contains("LeftSemi"), s"q4 must plan EXISTS as a semi join:\n$p4")
    assert(!p4.contains("CartesianProduct"))
    // the semi join emits each order at most once — no distinct/dedup agg
    // may appear between the join and the priority aggregate
    assert(!p4.contains("l_extendedprice"),
      s"q4 must prune unused lineitem columns:\n$p4")
    val p7 = plan("q7_volume_shipping")
    assert(!p7.contains("CartesianProduct"))
    // supplier/customer/nation×2 all ride broadcasts; the only shuffled
    // join is lineitem⋈orders on the order key
    assert("BroadcastHashJoin".r.findAllIn(p7).size >= 4,
      s"q7 must broadcast all four dimension joins:\n$p7")
  }

  test("j15: SCD2 lookup plans a bucketed equi-join — no nested loop on BETWEEN") {
    val p = plan("j15_scd2_lookup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the day-bucketed range join must keep BETWEEN out of the join condition:\n$p")
    assert(p.contains("Join"), "the lookup must still be join-shaped")
  }

  test("ml5: quantile binning broadcasts the per-stratum breakpoints") {
    val p = plan("ml5_quantile_binning")
    assert(p.contains("BroadcastHashJoin"),
      s"breakpoints (|strata| rows) must broadcast, never shuffle lineitem:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a sort-merge join here would shuffle the fact table on the stratum key:\n$p")
  }

  test("d16: boilerplate removal is positions-only — no exchange carries line text") {
    // node-level inspection needs the non-adaptive plan
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val qe = SparkEntry.queries("d16_boilerplate_lines")(
        spark, "/root/testdata/sf0.001").queryExecution
      val exchanges = qe.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty, "expected the df/regroup shuffles to exist")
      for (e <- exchanges)
        assert(!e.output.exists(_.name == "line"),
          s"exploded line string must not ride a shuffle; exchange output = " +
            e.output.map(a => s"${a.name}:${a.dataType.simpleString}").mkString(", "))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("runtime bloom filter: selective dim filter injects a bloom probe into the fact scan") {
    // The 100 TB fact-fact story when the filtered side is too big to
    // broadcast: Spark's runtime row-level filter builds a bloom filter
    // from the creation side's join keys and probes it BEFORE the fact
    // side's shuffle, cutting shuffle volume by the filter's selectivity.
    // The engine leans on this (SCALING.md relational core), so pin that
    // the injection actually fires on our scan+join shape. Session-local
    // confs on a newSession: thresholds opened so the sf0.001 fixture
    // qualifies (at real scale the defaults — 10 GB application side /
    // 10 MB creation side — gate it to where it pays).
    import org.apache.spark.sql.functions.col
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val d = "/root/testdata/sf0.001"
    val li = s2.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = s2.read.parquet(s"$d/orders.parquet")
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").count()
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"),
      s"bloom probe missing on the fact (application) side:\n$p")
    assert(p.contains("bloom_filter_agg"),
      s"bloom build missing on the filtered (creation) side:\n$p")
    assert(j.collect().head.getLong(1) > 0, "query must still return rows")
  }

  test("dynamic partition pruning: a filtered dim join prunes fact partitions at runtime") {
    // THE partitioned-fact optimization at 100 TB: when the fact table is
    // partitioned on the join key and the dim side carries a selective
    // filter, Spark injects a dynamicpruning subquery so the fact scan
    // reads only the partitions the dim rows can match — partition
    // elimination decided at RUNTIME, not plan time. Pin that our
    // partitioned-sink layout actually triggers it.
    import org.apache.spark.sql.functions.col
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    // force the non-broadcast-reuse path decision to still prune:
    s2.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    s2.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10.0")
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    val li = s2.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .withColumn("bucket", org.apache.spark.sql.functions.pmod(col("l_orderkey"), org.apache.spark.sql.functions.lit(16L)))
    li.write.mode("overwrite").partitionBy("bucket").parquet(dir)
    val fact = s2.read.parquet(dir)
    val dim = s2.range(0, 16).toDF("bucket")
      .where(col("bucket") < 3)   // selective dim filter
    val j = fact.join(dim, Seq("bucket")).groupBy("bucket").count()
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning") || p.contains("DynamicPruning"),
      s"expected a dynamic partition pruning subquery on the fact scan:\n$p")
    assert(j.collect().map(_.getLong(1)).sum > 0)
  }

  test("J7: maxDfFraction adds the df-prune semi-ish join before pair generation") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenize(col("text")).as("toks"))
    def joins(df: org.apache.spark.sql.DataFrame): Int =
      "Join".r.findAllIn(df.queryExecution.executedPlan.toString).size
    val unpruned = graft.operators.SimilarityJoin
      .exactCosineTopK(docs, "doc_id", "toks", k = 10)
    val pruned = graft.operators.SimilarityJoin
      .exactCosineTopK(docs, "doc_id", "toks", k = 10, maxDfFraction = 0.5)
    // the pruned plan carries the extra df-filter join (postings ⋈ kept
    // terms) on BOTH join sides plus the broadcast of the single-row
    // total — strictly more join nodes than the exact plan
    assert(joins(pruned) > joins(unpruned),
      s"pruned=${joins(pruned)} unpruned=${joins(unpruned)}")
  }
}
