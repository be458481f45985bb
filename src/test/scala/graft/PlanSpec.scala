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
}
