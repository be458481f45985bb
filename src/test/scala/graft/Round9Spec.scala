package graft

import org.apache.spark.sql.functions._

/** Round-9 behavior pins: the production HMAC pseudonymization lane
  * (r8 advice: keyed FNV is invertible from one known pair, so it stays an
  * oracle fixture only) and the incremental IVF shard append (the 100 TB
  * operational shape — corpus grows daily, the index must grow by O(delta),
  * not rebuild at O(corpus)). */
class Round9Spec extends SparkSuite {
  import spark.implicits._

  // ---- PseudonymizeEmailsHmac (production PRF lane) ------------------------

  test("pseudonymizeEmailsSecure: consistency, key separation, known-answer vectors") {
    import graft.functions.TextFunctions.pseudonymizeEmailsSecure
    val df = Seq(
      (1L, "mail alice@example.com now"),
      (2L, "again alice@example.com and bob@example.org"),
      (3L, "no pii here, not even half@way")).toDF("id", "t")
    def run(key: String): Array[String] =
      df.select(col("id"), pseudonymizeEmailsSecure(col("t"), key).as("p"))
        .orderBy("id").collect().map(_.getString(1))
    val out = run("k9secret")
    // known-answer vectors: HMAC-SHA256(key, email) first 8 bytes
    // big-endian, unsigned — computed with an independent implementation
    // (python hmac/hashlib), so the endianness/truncation choice is pinned,
    // not just self-consistent
    val alice = "user_1788665985653061204@redacted.example"
    val bob = "user_9963992537529091310@redacted.example"
    assert(out(0) == s"mail $alice now", s"KAT mismatch: ${out(0)}")
    assert(out(1) == s"again $alice and $bob",
      "same address must map to the same surrogate corpus-wide")
    assert(out(2) == "no pii here, not even half@way",
      "non-address text (no TLD) must pass through verbatim")
    // key separation: a different key yields a disjoint surrogate (the
    // whole point of the PRF — surrogates are not derivable without it)
    val other = run("otherkey")
    assert(other(0) == "mail user_4764210519980964892@redacted.example now",
      s"KAT mismatch under second key: ${other(0)}")
  }

  test("pseudonymizeEmailsSecure: empty key is refused; FNV fixture lane still allows it") {
    import graft.functions.TextFunctions.{pseudonymizeEmails, pseudonymizeEmailsSecure}
    val df = Seq((1L, "x alice@example.com")).toDF("id", "t")
    val e = intercept[IllegalArgumentException] {
      df.select(pseudonymizeEmailsSecure(col("t"), "")).collect()
    }
    assert(e.getMessage.contains("non-empty key"),
      s"refusal must explain itself: ${e.getMessage}")
    // the oracle-fixture lane keeps its default for DuckDB replay
    assert(df.select(pseudonymizeEmails(col("t")).as("p"))
      .head().getString(0).contains("@redacted.example"))
  }

  // ---- Incremental IVF shard append ----------------------------------------

  test("appendIvfShard: full-probe after append equals brute force over the grown corpus") {
    val dir = java.nio.file.Files.createTempDirectory("ivfappend").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = emb.where(col("vec_id") < 300)
    val delta = emb.where(col("vec_id") >= 300 && col("vec_id") < 450)
    val delta2 = emb.where(col("vec_id") >= 450)
    graft.operators.Ann.buildIvfIndex(base, "vec_id", "embedding", dir,
      nCentroids = 8, seed = 42L)
    val s1 = graft.operators.Ann.appendIvfShard(delta, "vec_id", "embedding", dir)
    val s2 = graft.operators.Ann.appendIvfShard(delta2, "vec_id", "embedding", dir)
    assert(s1 == 1 && s2 == 2, s"shard ids must be sequential: $s1, $s2")
    val queries = emb.where(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("c"), col("rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
    // full probe is exact regardless of which generation's centroids
    // assigned each shard — centroids only gate RECALL at partial probe
    val viaAppended = rows(graft.operators.Ann.queryIvfIndex(
      queries, "vec_id", "embedding", dir, k = 5, nProbe = 8))
    val brute = rows(graft.operators.Ann.bruteForceTopK(
      queries, emb, "vec_id", "embedding", k = 5))
    assert(viaAppended == brute,
      "full probe over appended shards must equal brute force on the full corpus")
    // and ≡ a from-scratch rebuild on the grown corpus at full probe
    val dir2 = java.nio.file.Files.createTempDirectory("ivfrebuild").toString
    graft.operators.Ann.buildIvfIndex(emb, "vec_id", "embedding", dir2,
      nCentroids = 8, seed = 42L)
    assert(rows(graft.operators.Ann.queryIvfIndex(
      queries, "vec_id", "embedding", dir2, k = 5, nProbe = 8)) == viaAppended,
      "append must be result-identical to a full rebuild at full probe")
  }

  test("appendIvfShard: uncommitted shard files are invisible to queries and cleaned on retry") {
    val dir = java.nio.file.Files.createTempDirectory("ivftorn").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = emb.where(col("vec_id") < 400)
    graft.operators.Ann.buildIvfIndex(base, "vec_id", "embedding", dir,
      nCentroids = 4, seed = 42L)
    val queries = emb.where(col("vec_id") < 5)
    def run() = graft.operators.Ann.queryIvfIndex(
        queries, "vec_id", "embedding", dir, k = 3, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = run()
    // simulate a torn append: shard=1 posting files exist on disk but the
    // manifest was never rewritten (crash between write and commit)
    val gdir = graft.operators.Ann.resolveIvfDir(spark, dir)
    val cellDir = new java.io.File(s"$gdir/postings.parquet")
      .listFiles().filter(_.getName.startsWith("cell=")).head
    val torn = new java.io.File(cellDir, "shard=1")
    torn.mkdirs()
    val orphan = new java.io.File(torn, "part-orphan.parquet")
    // copy a real shard-0 parquet file so the orphan is readable if scanned
    val donor = new java.io.File(cellDir, "shard=0")
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(donor.toPath, orphan.toPath)
    assert(run() == before,
      "uncommitted shard files must be partition-pruned out of every query")
    // a retry of the append at the same shard id must clean the orphan
    // first (same-shard retry safety), then commit
    val delta = emb.where(col("vec_id") >= 400 && col("vec_id") < 420)
    val sid = graft.operators.Ann.appendIvfShard(delta, "vec_id", "embedding", dir)
    assert(sid == 1, s"retry must reuse the next uncommitted shard id: $sid")
    assert(!orphan.exists(), "orphan files from the torn attempt must be deleted")
    // committed shard rows are now scanned: exactly the 20 delta rows sit
    // in shard=1, and the index answer equals brute force over the grown
    // corpus (self-matches excluded by both lanes)
    assert(spark.read.parquet(s"$gdir/postings.parquet")
      .where(col("shard") === 1).count() == 20L,
      "exactly the committed delta rows must live in shard=1")
    val grown = base.unionByName(delta)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("c"), col("rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
    val after = rows(graft.operators.Ann.queryIvfIndex(
      queries, "vec_id", "embedding", dir, k = 3, nProbe = 4))
    assert(after == rows(graft.operators.Ann.bruteForceTopK(
      queries, grown, "vec_id", "embedding", k = 3)),
      "post-append full probe must equal brute force over the grown corpus")
  }

  test("appendIvfShard: a live claim fences the shard id; commits are markers, not manifest rewrites") {
    val dir = java.nio.file.Files.createTempDirectory("ivfclaim").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = emb.where(col("vec_id") < 400)
    // negative seed: the manifest number parser must round-trip it
    graft.operators.Ann.buildIvfIndex(base, "vec_id", "embedding", dir,
      nCentroids = 4, seed = -7L)
    val gdir = graft.operators.Ann.resolveIvfDir(spark, dir)
    val mtext0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$gdir/manifest.json")), "UTF-8")
    val buildId = """"buildId":"([^"]+)"""".r.findFirstMatchIn(mtext0)
      .get.group(1)
    // a concurrent appender claimed shard 1 and is still writing: this
    // append must land on shard 2, never interleave files into shard=1
    java.nio.file.Files.write(
      java.nio.file.Paths.get(
        s"$gdir/postings.parquet/_SHARD_CLAIM_${buildId}_1"),
      Array.empty[Byte])
    // stray near-protocol names must be ignored, not crash the parse
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$gdir/postings.parquet/_SHARD_COMMIT_9.bak"),
      Array.empty[Byte])
    val delta = emb.where(col("vec_id") >= 400 && col("vec_id") < 420)
    val sid = graft.operators.Ann.appendIvfShard(delta, "vec_id", "embedding", dir)
    assert(sid == 2, s"claimed shard id must be fenced past: got $sid")
    // the commit is a marker file; the manifest is NEVER rewritten after
    // the build (a truncate-in-place crash there would brick every
    // previously committed shard)
    val mtext = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$gdir/manifest.json")), "UTF-8")
    assert(mtext.contains("\"shards\":[0]"),
      s"append must not rewrite the manifest: $mtext")
    assert(mtext.contains("\"seed\":-7"), s"negative seed must persist: $mtext")
    assert(new java.io.File(
        s"$gdir/postings.parquet/_SHARD_COMMIT_${buildId}_2").exists(),
      "commit marker for the appended shard must exist")
    assert(!new java.io.File(s"$gdir/.append-shard-2").exists(),
      "private staging dir must be cleaned up after the append")
    // marker-committed shards are served; the claimed-uncommitted one is not
    val queries = emb.where(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows(graft.operators.Ann.queryIvfIndex(
      queries, "vec_id", "embedding", dir, k = 3, nProbe = 4))
    assert(got == rows(graft.operators.Ann.bruteForceTopK(
      queries, base.unionByName(delta), "vec_id", "embedding", k = 3)),
      "full probe must serve base + marker-committed shard, exactly")
  }

  test("IVF generation markers: a mixed-generation component fails loudly even with equal centroid counts") {
    val dir = java.nio.file.Files.createTempDirectory("ivfgen").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    graft.operators.Ann.buildIvfIndex(emb, "vec_id", "embedding", dir,
      nCentroids = 4, seed = 42L)
    // tamper: another build's marker lands in postings (interleaved
    // concurrent rebuilds with the SAME nCentroids — the r8 count check
    // could not see this)
    val gdir = graft.operators.Ann.resolveIvfDir(spark, dir)
    val marker = new java.io.File(s"$gdir/postings.parquet/_BUILD_ID")
    java.nio.file.Files.write(marker.toPath,
      "00000000-dead-beef-0000-000000000000".getBytes("UTF-8"))
    // the local ChecksumFileSystem would otherwise flag the raw tamper
    // before our generation check runs; the crc sidecar is a test artifact
    new java.io.File(s"$gdir/postings.parquet/._BUILD_ID.crc").delete()
    val e = intercept[IllegalArgumentException] {
      graft.operators.Ann.queryIvfIndex(
        emb.where(col("vec_id") < 3), "vec_id", "embedding", dir,
        k = 3, nProbe = 4).collect()
    }
    assert(e.getMessage.contains("mixed-generation"),
      s"tampered marker must be named as a generation mismatch: ${e.getMessage}")
  }
}
