package graft

/** r11 verdict 1 — the committed serving artifact must be SELF-QUALIFYING:
  * every artifact carries its own phase evidence (per-family task-time
  * inflation across identical batches, the documented signature of the
  * box's degraded phase: task 10-30× with GC flat), and the writer
  * refuses an unstamped payload, so a degraded capture can never
  * masquerade as the product number again. */
class BenchServeSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.tools.BenchServe

  test("uniform task times across identical batches stamp clean") {
    val s = BenchServe.phaseStamp(Seq(
      Seq(10.0, 11.2, 10.5, 9.8, 10.9, 11.0, 10.1, 10.4, 10.2, 10.7,
        10.3, 10.6),
      Seq(101.0, 98.0, 104.0, 99.5),
      Seq(1.1, 0.9, 1.0, 1.05, 0.95, 1.0, 1.02, 0.98)))
    assert(s.phase == "clean", s.toString)
    assert(s.taskInflation < 1.5, s.toString)
  }

  test("one batch in the documented 10-30x inflation signature stamps degraded") {
    val s = BenchServe.phaseStamp(Seq(
      Seq(10.0, 10.5, 10.2, 9.8, 10.9, 143.0, 10.1, 10.4, 10.2, 10.7,
        10.3, 10.6)))
    assert(s.phase == "degraded", s.toString)
    assert(s.taskInflation > 10.0, s.toString)
  }

  test("inflation is judged per identical-work family, not across families") {
    // burst batches legitimately cost ~10x a steady batch — mixed into
    // one population that would false-positive every run
    val s = BenchServe.phaseStamp(Seq(
      Seq(10.0, 10.5, 10.2, 10.4),
      Seq(100.0, 105.0, 98.0, 102.0)))
    assert(s.phase == "clean", s.toString)
  }

  test("a 2-sample family CAN vote degraded (lower-middle median, r12 advice)") {
    // with the upper-middle median a 2-sample family's median IS its max,
    // so max/median was structurally 1.0 — a 30x-inflated batch hid
    assert(BenchServe.phaseStamp(Seq(Seq(10.0, 300.0))).phase == "degraded")
    // honest 2-sample jitter still stamps clean (ratio = max/min there)
    assert(BenchServe.phaseStamp(Seq(Seq(10.0, 12.5))).phase == "clean")
  }

  test("degenerate families (singleton, empty, zero-median) do not crash or false-positive") {
    assert(BenchServe.phaseStamp(Seq(Seq(5.0), Seq.empty)).phase == "clean")
    assert(BenchServe.phaseStamp(Seq(Seq(0.0, 0.0, 0.0))).phase == "clean")
    assert(BenchServe.phaseStamp(Seq.empty).phase == "clean")
  }

  test("writeArtifact refuses an unstamped payload") {
    val e = intercept[IllegalArgumentException] {
      BenchServe.writeArtifact("bench_serve_spec_scratch.json",
        """{"metric":"serve","events_per_s":140}""")
    }
    assert(e.getMessage.contains("UNSTAMPED"), e.getMessage)
    // and accepts a stamped one (cleanup after)
    BenchServe.writeArtifact("bench_serve_spec_scratch.json",
      """{"metric":"serve","events_per_s":140,"phase":"clean",""" +
        """"task_inflation":1.12,"attempts":1}""")
    val p = java.nio.file.Paths.get("target/bench_serve_spec_scratch.json")
    assert(java.nio.file.Files.readString(p).contains("\"phase\":\"clean\""))
    java.nio.file.Files.delete(p)
  }
}
