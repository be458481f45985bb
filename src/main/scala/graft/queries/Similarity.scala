package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.{SimilarityJoin, Dedup, Ann, FuzzyJoin}

/** Similarity-join, deduplication, and ANN queries (SURVEY §2.3 J7/J8 plus
  * the training-data dedup/similarity-search surface) over `documents` and
  * `embeddings`.
  *
  * Exact paths carry DuckDB oracles (integer tf / double-exact math makes
  * them bit-reproducible); the hash-based scale paths (MinHash-LSH, SimHash,
  * LSH/IVF ANN) are declared rows-only — their candidate sets depend on
  * engine hashing, but their *outputs* are verified in ScalaTest against the
  * exact operators' results. */
object Similarity {

  val queries: Seq[Q] = Seq(

    // J7/J8: exact bag-of-words cosine similarity join, query-side
    // restricted (the reference's query-vs-cluster shape,
    // guessLike_u_like.py:113-117), top-10 per query. tf values are
    // integers so dot products and norms are exact in double — the ranking
    // is engine-independent.
    Q("j7_cosine_similarity_topk",
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |            FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok GROUP BY 1, 2),
        |nrm AS (SELECT doc_id, sqrt(sum(tf * tf)) AS nrm FROM tf GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS a, b.doc_id AS b, sum(a.tf * b.tf) AS dot
        |          FROM tf a JOIN tf b USING (term)
        |          WHERE a.doc_id < 50 AND a.doc_id != b.doc_id GROUP BY 1, 2),
        |sims AS (SELECT a, b, dot / (x.nrm * y.nrm) AS sim FROM pairs
        |         JOIN nrm x ON pairs.a = x.doc_id JOIN nrm y ON pairs.b = y.doc_id),
        |ranked AS (SELECT a, b, round(sim, 6) AS sim,
        |             CAST(row_number() OVER (PARTITION BY a
        |               ORDER BY round(sim, 6) DESC, b) AS BIGINT) AS rank
        |           FROM sims)
        |SELECT a, b, sim, rank FROM ranked WHERE rank <= 10
        |ORDER BY a, rank""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), tokenize(col("text")).as("toks"))
      SimilarityJoin.exactCosineTopK(docs, "doc_id", "toks", k = 10,
          queryPred = Some(col("id") < 50))
        .select(col("a"), col("b"), round(col("sim"), 6).as("sim"),
          col("rank").cast("long"))
        .orderBy("a", "rank")
    },

    // Exact dedup: the corpus unioned with an id-shifted copy of itself;
    // dedup must keep exactly the original ids (min id per content hash).
    Q("d1_exact_dedup",
      """SELECT doc_id FROM (
        |  SELECT min(doc_id) AS doc_id FROM (
        |    SELECT doc_id, text FROM documents
        |    UNION ALL SELECT doc_id + 1000000, text FROM documents)
        |  GROUP BY regexp_replace(trim(text), '\s+', ' ', 'g'))
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val shifted = docs.select((col("doc_id") + 1000000).as("doc_id"), col("text"))
      Dedup.exactDedup(docs.union(shifted), "doc_id", "text")
        .select("doc_id").orderBy("doc_id")
    },

    // n-gram Jaccard near-dup mining, query-vs-corpus (char 3-grams,
    // threshold 0.6): string shingles keep it oracle-comparable.
    Q("d2_ngram_jaccard",
      """WITH s AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(length(t) - 2, 1) + 1),
        |      i -> t[i:i+2])) AS sh
        |  FROM (SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS t
        |        FROM documents)),
        |p AS (SELECT a.doc_id AS a, b.doc_id AS b,
        |        CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |      FROM s a, s b WHERE a.doc_id < 25 AND a.doc_id < b.doc_id)
        |SELECT a, b, round(jaccard, 6) AS jaccard FROM p WHERE jaccard >= 0.6
        |ORDER BY a, b""".stripMargin) { (s, d) =>
      Dedup.ngramJaccardForQueries(Tables.documents(s, d), "doc_id", "text",
          n = 3, queryPred = col("id") < 25, minJaccard = 0.6)
        .where(col("a") < col("b"))   // oracle canonicalizes pair orientation
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a", "b")
    },

    // The hash-shingle fast path of d2: same query-vs-corpus Jaccard, but
    // the broadcast side carries 64-bit shingle hashes instead of raw
    // 3-gram strings. Checked against the SAME string-shingle SQL oracle —
    // distinct-set Jaccard is hash-collision-exact to ~2^-64 per pair, so
    // values must agree.
    Q("d2b_ngram_jaccard_hashed",
      """WITH s AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(length(t) - 2, 1) + 1),
        |      i -> t[i:i+2])) AS sh
        |  FROM (SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS t
        |        FROM documents)),
        |p AS (SELECT a.doc_id AS a, b.doc_id AS b,
        |        CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |      FROM s a, s b WHERE a.doc_id < 25 AND a.doc_id < b.doc_id)
        |SELECT a, b, round(jaccard, 6) AS jaccard FROM p WHERE jaccard >= 0.6
        |ORDER BY a, b""".stripMargin) { (s, d) =>
      Dedup.ngramJaccardForQueriesHashed(Tables.documents(s, d), "doc_id", "text",
          n = 3, queryPred = col("id") < 25, minJaccard = 0.6)
        .where(col("a") < col("b"))   // oracle canonicalizes pair orientation
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a", "b")
    },

    // EXACT all-pairs Jaccard via prefix filtering (PPJoin-family): the
    // deterministic-guarantee counterpart of MinHash-LSH — only each
    // document's rarest `|x| - ceil(t|x|) + 1` shingles are posted to the
    // candidate join, with completeness proven by pigeonhole on the global
    // df order. Hashed shingles; values equal the string-shingle oracle to
    // ~2^-64 (d2b argument). PrefixJoinSpec asserts result-set equality
    // with the plain all-pairs operator.
    Q("d11_jaccard_prefix",
      """WITH s AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(length(t) - 2, 1) + 1),
        |      i -> t[i:i+2])) AS sh
        |  FROM (SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS t
        |        FROM documents WHERE doc_id < 300)),
        |p AS (SELECT a.doc_id AS a, b.doc_id AS b,
        |        CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |      FROM s a, s b WHERE a.doc_id < b.doc_id)
        |SELECT a, b, round(jaccard, 6) AS jaccard FROM p WHERE jaccard >= 0.6
        |ORDER BY a, b""".stripMargin) { (s, d) =>
      Dedup.ngramJaccardPairsPrefix(
          Tables.documents(s, d).where(col("doc_id") < 300),
          "doc_id", "text", n = 3, minJaccard = 0.6)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a", "b")
    },

    // MinHash-LSH near-dup candidates (12 bands x 8 rows ⇒ s-curve
    // threshold ~0.73, verify >= 0.6 true Jaccard). Candidate generation
    // depends on xxhash64 so no SQL oracle; the ScalaTest suite checks it
    // against ngramJaccardPairs.
    Q.rowsOnly("d3_minhash_lsh") { (s, d) =>
      Dedup.minHashLsh(Tables.documents(s, d), "doc_id", "text",
          shingleN = 3, bands = 12, rows = 8, minJaccard = 0.6)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a", "b")
    },

    // d3's hash-matched sibling (same argument as d5b): with high-recall
    // banding (24 x 4, P(miss) ≈ 3e-6 per true pair at J >= 0.8, seeded
    // hashes) on a bounded sub-corpus, the LSH candidate set EQUALS the
    // exact >= 0.8 pair set — so the verified pairs hash-match an
    // all-pairs DuckDB oracle, turning the probabilistic operator's gate
    // from rows-only into value-checked.
    Q("d3b_minhash_lsh_exact",
      """WITH s AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(length(t) - 2, 1) + 1),
        |      i -> t[i:i+2])) AS sh
        |  FROM (SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS t
        |        FROM documents WHERE doc_id < 400)),
        |p AS (SELECT a.doc_id AS a, b.doc_id AS b,
        |        CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |      FROM s a, s b WHERE a.doc_id < b.doc_id)
        |SELECT a, b, round(jaccard, 6) AS jaccard FROM p WHERE jaccard >= 0.8
        |ORDER BY a, b""".stripMargin) { (s, d) =>
      Dedup.minHashLsh(Tables.documents(s, d).where(col("doc_id") < 400),
          "doc_id", "text", shingleN = 3, bands = 24, rows = 4,
          minJaccard = 0.8)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a", "b")
    },

    // End-to-end corpus dedup: LSH candidates → min-label cluster
    // resolution → keep the smallest id per duplicate cluster.
    Q.rowsOnly("d5_dedup_corpus") { (s, d) =>
      Dedup.dedupCorpus(Tables.documents(s, d), "doc_id", "text",
          minJaccard = 0.8)
        .select(col("doc_id")).orderBy("doc_id")
    },

    // d5's hash-matched little sibling: end-to-end corpus dedup on a
    // bounded sub-corpus, checked against DuckDB computing the SAME
    // survivor set from first principles — exact all-pairs jaccard >= 0.8,
    // connected components via recursive CTE, min-id survivor per
    // component. High-recall banding (24 x 4: P(miss) ≈ 3e-6 per true pair,
    // and deterministic given the fixed hash seeds) makes the LSH pair set
    // equal the exact pair set here, so the survivor sets hash-match.
    Q("d5b_dedup_corpus_exact",
      """WITH RECURSIVE
        |s AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(length(t) - 2, 1) + 1),
        |      i -> t[i:i+2])) AS sh
        |  FROM (SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS t
        |        FROM documents WHERE doc_id < 400)),
        |e AS (SELECT a.doc_id AS a, b.doc_id AS b
        |      FROM s a, s b WHERE a.doc_id < b.doc_id
        |        AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
        |edges AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
        |cc AS (
        |  SELECT a AS id, a AS reach FROM edges
        |  UNION
        |  SELECT cc.id, edges.b AS reach FROM cc JOIN edges ON cc.reach = edges.a),
        |losers AS (SELECT id FROM cc GROUP BY id HAVING min(reach) <> id)
        |SELECT doc_id FROM documents
        |WHERE doc_id < 400 AND doc_id NOT IN (SELECT id FROM losers)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Dedup.dedupCorpus(Tables.documents(s, d).where(col("doc_id") < 400),
          "doc_id", "text", bands = 24, rows = 4, minJaccard = 0.8)
        .select(col("doc_id")).orderBy("doc_id")
    },

    // Keep-BEST corpus dedup: same clusters as d5b, but the survivor per
    // duplicate cluster is the argmax of a quality score (here n_chars —
    // keep the longest duplicate; ties to the smallest id) instead of the
    // smallest id. The oracle recomputes clusters from first principles
    // (recursive-CTE components) and applies the same argmax rule.
    Q("d13_dedup_keep_best",
      """WITH RECURSIVE
        |s AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(length(t) - 2, 1) + 1),
        |      i -> t[i:i+2])) AS sh
        |  FROM (SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS t
        |        FROM documents WHERE doc_id < 400)),
        |e AS (SELECT a.doc_id AS a, b.doc_id AS b
        |      FROM s a, s b WHERE a.doc_id < b.doc_id
        |        AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
        |edges AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
        |cc AS (
        |  SELECT a AS id, a AS reach FROM edges
        |  UNION
        |  SELECT cc.id, edges.b AS reach FROM cc JOIN edges ON cc.reach = edges.a),
        |lab AS (SELECT id, min(reach) AS cluster FROM cc GROUP BY id),
        |rk AS (SELECT l.id,
        |         row_number() OVER (PARTITION BY l.cluster
        |                            ORDER BY d.n_chars DESC, l.id) AS rn
        |       FROM lab l JOIN documents d ON d.doc_id = l.id),
        |losers AS (SELECT id FROM rk WHERE rn > 1)
        |SELECT doc_id FROM documents
        |WHERE doc_id < 400 AND doc_id NOT IN (SELECT id FROM losers)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Dedup.dedupCorpusKeepBest(Tables.documents(s, d).where(col("doc_id") < 400),
          "doc_id", "text", rankCol = "n_chars", bands = 24, rows = 4,
          minJaccard = 0.8)
        .select(col("doc_id")).orderBy("doc_id")
    },

    // Incremental dedup: the [450,500) band plays the NEW shard, the rest
    // of the corpus is the precomputed LSH index — the shard's survivors
    // (docs that are not near-dups of the accumulated corpus) may append.
    // High-recall banding (24 x 4) makes the LSH candidates equal the
    // exact >=0.8 set here, so the survivor list hash-matches the all-pairs
    // oracle (same argument as d5b).
    Q("d7_dedup_increment",
      """WITH s AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(length(t) - 2, 1) + 1),
        |      i -> t[i:i+2])) AS sh
        |  FROM (SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS t
        |        FROM documents)),
        |dup AS (SELECT DISTINCT n.doc_id FROM s n, s c
        |        WHERE n.doc_id >= 450 AND n.doc_id < 500
        |          AND (c.doc_id < 450 OR c.doc_id >= 500)
        |          AND CAST(len(list_intersect(n.sh, c.sh)) AS DOUBLE)
        |            / (len(n.sh) + len(c.sh) - len(list_intersect(n.sh, c.sh))) >= 0.8)
        |SELECT doc_id FROM documents
        |WHERE doc_id >= 450 AND doc_id < 500
        |  AND doc_id NOT IN (SELECT doc_id FROM dup)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val index = Dedup.lshIndex(
        docs.where(col("doc_id") < 450 || col("doc_id") >= 500),
        "doc_id", "text", shingleN = 3, bands = 24, rows = 4)
      Dedup.dedupIncrement(
          docs.where(col("doc_id") >= 450 && col("doc_id") < 500), index,
          "doc_id", "text", shingleN = 3, bands = 24, rows = 4,
          minJaccard = 0.8)
        .select(col("doc_id")).orderBy("doc_id")
    },

    // Chunk-level exact dedup (the "remove repeated PASSAGES" step, not
    // whole-document dedup): 10-token chunks, global first occurrence
    // survives, survivors reassemble in order. Fully deterministic — the
    // window tie-break is (doc_id, position) — so the reassembled text
    // hash-matches the oracle recomputing the same rule.
    Q("d8_chunk_dedup",
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |c AS (SELECT doc_id,
        |    unnest(list_transform(
        |      range(1, greatest(CAST(ceil(len(toks) / 10.0) AS BIGINT), 1) + 1),
        |      i -> struct_pack(pos := i,
        |        chunk := array_to_string(toks[(i-1)*10+1:(i-1)*10+10], ' ')))) AS pc
        |  FROM t),
        |r AS (SELECT doc_id, pc.pos AS pos, pc.chunk AS chunk FROM c),
        |k AS (SELECT doc_id, pos, chunk,
        |        row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
        |      FROM r)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
        |  coalesce(string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE rn = 1), '')
        |    AS kept_text
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      Dedup.chunkDedup(Tables.documents(s, d), "doc_id", "text",
          chunkTokens = 10)
        .select(col("id").as("doc_id"), col("n_chunks"), col("n_kept"),
          col("kept_text"))
        .orderBy("doc_id")
    },

    // Cross-document BOILERPLATE removal (CCNet/RefinedWeb frequent-line
    // rule): every occurrence of any line appearing in >= 2 distinct
    // documents is dropped — different semantics from d8 (keep-first):
    // boilerplate is noise in ALL its hosts, including the first. Lines
    // here are 5-token groups (the testdata ships single-line texts; the
    // operator takes any per-doc line array — split on '\n' in real use).
    Q("d16_boilerplate_lines",
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |c AS (SELECT doc_id,
        |    unnest(list_transform(
        |      range(1, greatest(CAST(ceil(len(toks) / 5.0) AS BIGINT), 1) + 1),
        |      i -> struct_pack(pos := i,
        |        line := array_to_string(toks[(i-1)*5+1:(i-1)*5+5], ' ')))) AS pc
        |  FROM t),
        |r AS (SELECT doc_id, pc.pos AS pos, pc.line AS line FROM c),
        |f AS (SELECT line FROM (
        |        SELECT line, count(DISTINCT doc_id) AS df FROM r GROUP BY line)
        |      WHERE df >= 2),
        |k AS (SELECT r.doc_id, r.pos, r.line,
        |        r.line IN (SELECT line FROM f) AS boiler FROM r)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(count(*) FILTER (WHERE NOT boiler) AS BIGINT) AS n_kept,
        |  coalesce(string_agg(line, ' ' ORDER BY pos) FILTER (WHERE NOT boiler),
        |           '') AS kept_text
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = graft.functions.TextFunctions.tokenize(col("text"))
      val nLines = greatest(
        ceil(size(toks).cast("double") / 5).cast("int"), lit(1))
      val lines = transform(sequence(lit(1), nLines),
        i => array_join(slice(toks, (i - 1) * 5 + 1, lit(5)), " "))
      Dedup.boilerplateRemove(Tables.documents(s, d), "doc_id", lines,
          minDf = 2L)
        .orderBy("doc_id")
    },

    // WITHIN-document line dedup (first in-doc occurrence survives —
    // repeated "read more" rows, copy-paste stutter): deliberately a
    // ZERO-shuffle projection (array_distinct is order-preserving), not
    // the explode+window+regroup shape — each doc's lines already sit in
    // one row. Lines are 3-token groups here (single-line testdata; real
    // use passes split on '\n'). Oracle replays the rule as the window
    // form, certifying the projection against the declarative spec.
    Q("d17_intradoc_line_dedup",
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |c AS (SELECT doc_id,
        |    unnest(list_transform(
        |      range(1, greatest(CAST(ceil(len(toks) / 3.0) AS BIGINT), 1) + 1),
        |      i -> struct_pack(pos := i,
        |        line := array_to_string(toks[(i-1)*3+1:(i-1)*3+3], ' ')))) AS pc
        |  FROM t),
        |r AS (SELECT doc_id, pc.pos AS pos, pc.line AS line FROM c),
        |k AS (SELECT doc_id, pos, line,
        |        row_number() OVER (PARTITION BY doc_id, line ORDER BY pos)
        |          AS rn FROM r)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
        |  coalesce(string_agg(line, ' ' ORDER BY pos) FILTER (WHERE rn = 1),
        |           '') AS kept_text
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = graft.functions.TextFunctions.tokenize(col("text"))
      val nLines = greatest(
        ceil(size(toks).cast("double") / 3).cast("int"), lit(1))
      val lines = transform(sequence(lit(1), nLines),
        i => array_join(slice(toks, (i - 1) * 3 + 1, lit(3)), " "))
      Dedup.intraDocLineDedup(Tables.documents(s, d), "doc_id", lines)
        .orderBy("doc_id")
    },

    // OVERLAPPING 8-token-gram substring dedup (the sliding-window
    // complement of d8's disjoint chunks — Lee et al.'s "any k-token span
    // shared verbatim" rule at doc granularity). A doc sharing any 8-gram
    // with a smaller-id doc is dropped; string grams here so the oracle
    // recomputes the rule verbatim.
    Q("d12_substring_dedup",
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
        |g AS (SELECT doc_id,
        |        unnest(list_transform(range(1, len(toks) - 6),
        |          i -> array_to_string(toks[i:i+7], ' '))) AS gram
        |      FROM t WHERE len(toks) >= 8),
        |f AS (SELECT gram, min(doc_id) AS first_id FROM g GROUP BY gram),
        |dup AS (SELECT DISTINCT g.doc_id FROM g JOIN f USING (gram)
        |        WHERE g.doc_id > f.first_id)
        |SELECT d.doc_id, d.n_chars FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM dup)
        |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      Dedup.substringGramSurvivors(Tables.documents(s, d), "doc_id", "text",
          k = 8)
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id")
    },

    // d12's production form: 8-byte hashed grams ride the shuffle instead
    // of gram strings (the d2b argument — a 64-bit in-group collision is
    // negligible and can only drop one extra doc, never the canonical
    // copy). Same string oracle: identical output certifies the hashed
    // path end-to-end.
    Q("d12b_substring_dedup_hashed",
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
        |g AS (SELECT doc_id,
        |        unnest(list_transform(range(1, len(toks) - 6),
        |          i -> array_to_string(toks[i:i+7], ' '))) AS gram
        |      FROM t WHERE len(toks) >= 8),
        |f AS (SELECT gram, min(doc_id) AS first_id FROM g GROUP BY gram),
        |dup AS (SELECT DISTINCT g.doc_id FROM g JOIN f USING (gram)
        |        WHERE g.doc_id > f.first_id)
        |SELECT d.doc_id, d.n_chars FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM dup)
        |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      Dedup.substringGramSurvivors(Tables.documents(s, d), "doc_id", "text",
          k = 8, hashed = true)
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id")
    },

    // Benchmark decontamination (training-data guard against test-set
    // leakage): docs >= 450 stand in for the held-out eval set, docs < 450
    // are the corpus; a corpus doc sharing >= 3 distinct 20-char n-grams
    // with ANY benchmark doc is contaminated. Spark side is the broadcast-
    // set scan kernel (no explode/join/shuffle on the corpus side); oracle
    // recomputes with string n-grams — hash-collision-exact to ~2^-64.
    Q("dc1_decontaminate",
      """WITH norm AS (SELECT doc_id,
        |    lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |s AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(length(t) - 19, 1) + 1),
        |      i -> t[i:i+19])) AS sh FROM norm),
        |b AS (SELECT DISTINCT unnest(sh) AS g FROM s
        |     WHERE doc_id >= 450 AND doc_id < 500),
        |c2 AS (SELECT doc_id, unnest(sh) AS g FROM s
        |      WHERE doc_id < 450 OR doc_id >= 500),
        |h AS (SELECT doc_id, count(*) AS hits FROM c2 JOIN b USING (g)
        |      GROUP BY doc_id)
        |SELECT doc_id FROM documents
        |WHERE (doc_id < 450 OR doc_id >= 500)
        |  AND doc_id NOT IN (SELECT doc_id FROM h WHERE hits >= 3)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.operators.Decontaminate.decontaminate(
          docs.where(col("doc_id") < 450 || col("doc_id") >= 500),
          docs.where(col("doc_id") >= 450 && col("doc_id") < 500),
          "text", n = 20, minHits = 3)
        .select(col("doc_id")).orderBy("doc_id")
    },

    // The audit form: per-document overlap hit counts for contaminated
    // docs (inspect the overlap distribution before choosing the cut).
    Q("dc2_overlap_hits",
      """WITH norm AS (SELECT doc_id,
        |    lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |s AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(length(t) - 19, 1) + 1),
        |      i -> t[i:i+19])) AS sh FROM norm),
        |b AS (SELECT DISTINCT unnest(sh) AS g FROM s
        |     WHERE doc_id >= 450 AND doc_id < 500),
        |c2 AS (SELECT doc_id, unnest(sh) AS g FROM s
        |      WHERE doc_id < 450 OR doc_id >= 500),
        |h AS (SELECT doc_id, count(*) AS hits FROM c2 JOIN b USING (g)
        |      GROUP BY doc_id)
        |SELECT doc_id, CAST(hits AS BIGINT) AS hits FROM h WHERE hits >= 3
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.operators.Decontaminate.withHits(
          docs.where(col("doc_id") < 450 || col("doc_id") >= 500),
          docs.where(col("doc_id") >= 450 && col("doc_id") < 500),
          "text", n = 20)
        .where(col("overlap_hits") >= 3)
        .select(col("doc_id"), col("overlap_hits").cast("long").as("hits"))
        .orderBy("doc_id")
    },

    // SimHash near-dup pairs (64-bit, chunk blocking, hamming <= 12).
    Q.rowsOnly("d4_simhash") { (s, d) =>
      Dedup.simHashPairs(Tables.documents(s, d), "doc_id", "text", maxHamming = 12)
        .select(col("a"), col("b"), col("hamming").cast("long"))
        .orderBy("a", "b")
    },

    // d4's hash-matched sibling (the d3b/d5b playbook applied to SimHash):
    // the FNV-1a-64 token-hash variant is simple enough for DuckDB to
    // recompute the full signature pipeline in SQL — per-token FNV via
    // list_reduce with HUGEINT mod-2^64 arithmetic, 64 bit-vote sums, sign
    // rebuild of the signature, brute-force bit_count(xor) <= h over the
    // bounded sub-corpus. Chunk blocking is pigeonhole-COMPLETE (13 chunks
    // at h=12 ⇒ one exact-matching chunk) and with < 200 docs the
    // maxBucket guard never prunes, so the operator's pair set EQUALS the
    // exact Hamming join and the rows hash-match. CAST(... AS BIGINT) on
    // the summed signature is load-bearing: DuckDB SUM(BIGINT) widens to
    // HUGEINT and a 128-bit xor adds 64 phantom bits on mixed-sign pairs.
    Q("d4b_simhash_exact",
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        |  FROM documents WHERE doc_id < 60),
        |th AS (SELECT doc_id,
        |    list_reduce(
        |      list_prepend(CAST(-3750763034362895579 AS BIGINT),
        |        list_transform(regexp_split_to_array(tok, ''), c -> CAST(unicode(c) AS BIGINT))),
        |      (acc, cp) -> CAST(
        |        CASE WHEN ((CAST(xor(acc, cp) AS HUGEINT) + 18446744073709551616::HUGEINT)
        |                   % 18446744073709551616::HUGEINT * 1099511628211)
        |                  % 18446744073709551616::HUGEINT >= 9223372036854775808::HUGEINT
        |             THEN ((CAST(xor(acc, cp) AS HUGEINT) + 18446744073709551616::HUGEINT)
        |                   % 18446744073709551616::HUGEINT * 1099511628211)
        |                  % 18446744073709551616::HUGEINT - 18446744073709551616::HUGEINT
        |             ELSE ((CAST(xor(acc, cp) AS HUGEINT) + 18446744073709551616::HUGEINT)
        |                   % 18446744073709551616::HUGEINT * 1099511628211)
        |                  % 18446744073709551616::HUGEINT END AS BIGINT)) AS h
        |  FROM toks),
        |bits AS (
        |  SELECT doc_id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS votes
        |  FROM th CROSS JOIN generate_series(0, 63) AS g(j)
        |  GROUP BY doc_id, j),
        |sigs AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN votes > 0 THEN
        |      CASE WHEN j = 63 THEN CAST(-9223372036854775808 AS BIGINT)
        |           ELSE CAST(1 AS BIGINT) << j END ELSE 0 END) AS BIGINT) AS sig
        |  FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
        |FROM sigs a, sigs b
        |WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sig, b.sig)) <= 12
        |ORDER BY a, b""".stripMargin) { (s, d) =>
      Dedup.simHashPairs(Tables.documents(s, d).where(col("doc_id") < 60),
          "doc_id", "text", maxHamming = 12, fnv = true)
        .select(col("a"), col("b"), col("hamming").cast("long").as("hamming"))
        .orderBy("a", "b")
    },

    // Hybrid retrieval: reciprocal-rank fusion of a lexical BM25 leg and
    // a dense embedding-cosine leg (the standard two-tower search shape).
    // Each leg is a bounded top-50; fusion is union + one aggregation —
    // no score calibration, no outer joins. Both legs are deterministic
    // (integer tf / exact doubles, doc_id tie-breaks) so the fused
    // ranking hash-matches the oracle.
    Q("r1_rrf_fusion",
      """WITH base AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |    avg(CAST(len(toks) AS DOUBLE)) AS avgdl FROM base),
        |toks AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
        |    unnest(toks) AS term FROM base),
        |tf AS (SELECT doc_id, term, any_value(dl) AS dl,
        |    CAST(count(*) AS DOUBLE) AS tf
        |  FROM toks WHERE term IN ('data', 'table', 'fast')
        |  GROUP BY doc_id, term),
        |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
        |s AS (SELECT doc_id,
        |    ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * 2.2
        |      / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS s
        |  FROM tf JOIN df USING (term) CROSS JOIN stats),
        |bm AS (SELECT doc_id, sum(s) AS score FROM s GROUP BY doc_id),
        |lex AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
        |        FROM bm QUALIFY r <= 50),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |cos AS (SELECT vec_id AS doc_id,
        |    list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[]))
        |      / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
        |         * sqrt(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])))) AS c
        |  FROM embeddings CROSS JOIN q),
        |dense AS (SELECT doc_id, row_number() OVER (ORDER BY c DESC, doc_id) AS r
        |          FROM cos QUALIFY r <= 50),
        |u AS (SELECT doc_id, 1.0 / (60 + r) AS contrib FROM lex
        |      UNION ALL SELECT doc_id, 1.0 / (60 + r) FROM dense)
        |SELECT doc_id, round(sum(contrib), 6) AS rrf
        |FROM u GROUP BY doc_id
        |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), tokenize(col("text")).as("toks"))
      val lex = graft.operators.TfIdf.bm25(docs, "doc_id", "toks",
          Seq("data", "table", "fast"))
        .orderBy(col("score").desc, col("id")).limit(50)
        .select(col("id").as("doc_id"),
          row_number().over(
            Window.orderBy(col("score").desc, col("id"))).as("r"))
      val emb = Tables.embeddings(s, d)
      val q = emb.where(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      val dense = emb.crossJoin(broadcast(q))
        .select(col("vec_id").as("doc_id"),
          graft.functions.VectorFunctions.cosine(col("embedding"), col("qv"))
            .as("c"))
        .orderBy(col("c").desc, col("doc_id")).limit(50)
        .select(col("doc_id"),
          row_number().over(
            Window.orderBy(col("c").desc, col("doc_id"))).as("r"))
      graft.rank.Fusion.rrf(Seq(lex, dense), "doc_id", "r")
        .select(col("doc_id"), round(col("rrf"), 6).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(20)
    },

    // Suffix-array-style duplicated-region detection (equality prefix
    // doubling, 8 bytes/position/round): maximal regions every 64-char
    // window of which occurs >= 2 times in the corpus — the substring
    // dedup pass at character granularity. The oracle recomputes regions
    // from first principles with materialized 64-grams (exact at this
    // scale; the operator's point is NOT materializing them at 100 TB).
    Q("d14_suffix_regions",
      """WITH p AS (SELECT doc_id,
        |    unnest(list_transform(range(1, greatest(length(text) - 64 + 2, 1)),
        |      i -> {'off': i, 'g': substr(text, i, 64)})) AS u
        |  FROM documents WHERE doc_id < 2000),
        |q AS (SELECT doc_id, u.off AS off, u.g AS g FROM p),
        |c AS (SELECT g FROM q GROUP BY g HAVING count(*) >= 2),
        |m AS (SELECT doc_id, off FROM q JOIN c USING (g)),
        |isl AS (SELECT doc_id, off,
        |    off - row_number() OVER (PARTITION BY doc_id ORDER BY off) AS grp
        |  FROM m),
        |runs AS (SELECT doc_id, min(off) - 1 AS start,
        |    max(off) - min(off) + 64 AS region_len
        |  FROM isl GROUP BY doc_id, grp)
        |SELECT doc_id, CAST(start AS BIGINT) AS start,
        |  CAST(region_len AS BIGINT) AS region_len
        |FROM runs WHERE region_len >= 64
        |ORDER BY doc_id, start""".stripMargin) { (s, d) =>
      graft.operators.SuffixDedup.duplicatedRegions(
          Tables.documents(s, d).where(col("doc_id") < 2000),
          "doc_id", "text", minLength = 64)
        .orderBy("doc_id", "start")
    },

    // The REMOVAL step of the suffix-array pass: splice d14's duplicated
    // regions out of the text, content-verified by md5 of each cleaned
    // document (fully-covered docs come back empty, not unchanged). The
    // oracle recomputes regions AND the splice relationally (complement
    // segments + ordered string_agg).
    Q("d14b_region_removal",
      """WITH p AS (SELECT doc_id,
        |    unnest(list_transform(range(1, greatest(length(text) - 64 + 2, 1)),
        |      i -> {'off': i, 'g': substr(text, i, 64)})) AS u
        |  FROM documents WHERE doc_id < 1000),
        |q AS (SELECT doc_id, u.off AS off, u.g AS g FROM p),
        |c AS (SELECT g FROM q GROUP BY g HAVING count(*) >= 2),
        |m AS (SELECT doc_id, off FROM q JOIN c USING (g)),
        |isl AS (SELECT doc_id, off,
        |    off - row_number() OVER (PARTITION BY doc_id ORDER BY off) AS grp
        |  FROM m),
        |r2 AS (SELECT doc_id, min(off) - 1 AS start,
        |    max(off) - min(off) + 64 AS region_len
        |  FROM isl GROUP BY doc_id, grp),
        |segm AS (SELECT doc_id,
        |    coalesce(lag(start + region_len) OVER w, 0) AS a,
        |    start - coalesce(lag(start + region_len) OVER w, 0) AS n
        |  FROM r2 WINDOW w AS (PARTITION BY doc_id ORDER BY start)),
        |tl AS (SELECT doc_id, max(start + region_len) AS a,
        |    CAST(NULL AS BIGINT) AS n FROM r2 GROUP BY doc_id),
        |ss AS (SELECT * FROM segm UNION ALL SELECT * FROM tl),
        |parts AS (SELECT d.doc_id, ss.a,
        |    substr(d.text, CAST(ss.a + 1 AS INT),
        |      CAST(coalesce(ss.n, length(d.text)) AS INT)) AS part
        |  FROM documents d JOIN ss ON d.doc_id = ss.doc_id
        |  WHERE d.doc_id < 1000),
        |cl AS (SELECT doc_id, string_agg(part, '' ORDER BY a) AS cleaned
        |       FROM parts GROUP BY doc_id)
        |SELECT doc_id, md5(cleaned) AS content_md5,
        |  CAST(length(cleaned) AS BIGINT) AS cleaned_len
        |FROM cl ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).where(col("doc_id") < 1000)
      val regions = graft.operators.SuffixDedup.duplicatedRegions(
        docs, "doc_id", "text", minLength = 64)
      graft.operators.SuffixDedup.removeRegions(docs, regions, "doc_id", "text")
        .join(regions.select("doc_id").distinct(), "doc_id")
        .select(col("doc_id"),
          md5(col("text").cast("binary")).as("content_md5"),
          length(col("text")).cast("long").as("cleaned_len"))
        .orderBy("doc_id")
    },

    // Content-defined chunking (FastCDC-family gear rolling hash): chunk
    // boundaries are a pure function of a bounded trailing text window, so
    // edits shift only their own chunk — the property that makes
    // chunk-level dedup stable under insertions (d8 uses fixed token
    // windows; this is the scale-robust form). The oracle replays the
    // mod-2^64 gear recurrence bit-for-bit in a recursive CTE (HUGEINT
    // arithmetic, same playbook as the FNV gates) and reassembles chunks
    // with window lead() — full value check of boundaries, lengths, and
    // chunk md5 content identities.
    Q("d15_cdc_chunks", {
      // The recurrence is written ONCE in Scala and spliced three times
      // (WHEN / THEN / ELSE) — hand-duplicating the HUGEINT arithmetic is
      // how unbalanced parens happen. M = 2^64, T = 2^63; hiMask = the 5
      // mask bits below the sign bit (FastCDC high-bit convention,
      // matching CdcBoundaries).
      val M = "18446744073709551616::HUGEINT"
      val uh = s"((CAST(roll.h AS HUGEINT) + $M) % $M)"
      val gear = "(((CAST(xor(CAST(-3750763034362895579 AS BIGINT), " +
        "CAST(unicode(substr(d.text, roll.i + 1, 1)) AS BIGINT)) AS HUGEINT) " +
        s"+ $M) % $M * 1099511628211) % $M)"
      val hu = s"(($uh * 2 + $gear) % $M)"
      val step = s"CAST(CASE WHEN $hu >= 9223372036854775808::HUGEINT " +
        s"THEN $hu - $M ELSE $hu END AS BIGINT)"
      val hiMask = ((1L << 5) - 1L) << 58
      s"""WITH RECURSIVE
        |d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |roll AS (
        |  SELECT doc_id, 0 AS i, CAST(0 AS BIGINT) AS h FROM d
        |  UNION ALL
        |  SELECT roll.doc_id, roll.i + 1, $step
        |  FROM roll JOIN d USING (doc_id) WHERE roll.i < d.n),
        |b AS (SELECT doc_id, i FROM roll JOIN d USING (doc_id)
        |      WHERE i >= 1 AND (h & $hiMask) = 0 AND i < n),
        |s AS (SELECT doc_id, 0 AS st FROM d
        |      UNION ALL SELECT doc_id, i FROM b),
        |c AS (SELECT doc_id, st,
        |        lead(st) OVER (PARTITION BY doc_id ORDER BY st) AS nxt,
        |        row_number() OVER (PARTITION BY doc_id ORDER BY st) - 1 AS idx
        |      FROM s)
        |SELECT c.doc_id AS doc_id, CAST(idx AS BIGINT) AS chunk_idx,
        |  CAST(st AS BIGINT) AS start,
        |  CAST(coalesce(nxt, n) - st AS BIGINT) AS chunk_len,
        |  md5(substr(text, st + 1, coalesce(nxt, n) - st)) AS chunk_md5
        |FROM c JOIN d USING (doc_id)
        |ORDER BY doc_id, chunk_idx""".stripMargin
    }) { (s, d) =>
      graft.operators.Dedup.cdcChunks(Tables.documents(s, d),
          "doc_id", "text", maskBits = 5)
        .orderBy("doc_id", "chunk_idx")
    },

    // Hard-negative mining (contrastive-training data prep): per query,
    // the top-5 most-similar DIFFERENT-label vectors, each with its margin
    // to the query's hardest positive (hardest_pos − cosine; the triplet-
    // loss quantity). One scored pair frame, one shuffle keyed on
    // query_id for both windows (unordered positive max + ordered
    // negative rank). Double accumulation in index order → bit-identical.
    Q("r2_hard_negatives",
      """WITH pairs AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    a.label = b.label AS is_pos,
        |    list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        |      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
        |         * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS cosine
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id < 20 AND a.vec_id != b.vec_id),
        |hp AS (SELECT query_id, max(cosine) FILTER (is_pos) AS hp
        |       FROM pairs GROUP BY query_id),
        |negs AS (SELECT query_id, neighbor_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY round(cosine, 6) DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM pairs WHERE NOT is_pos)
        |SELECT negs.query_id AS query_id, neighbor_id,
        |  round(cosine, 6) AS cosine, rank,
        |  round(hp - cosine, 6) AS margin
        |FROM negs JOIN hp ON negs.query_id = hp.query_id
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      graft.rank.HardNegatives.mine(emb.where(col("vec_id") < 20), emb,
          "vec_id", "embedding", "label", k = 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank").cast("long"),
          round(col("margin"), 6).as("margin"))
        .orderBy("query_id", "rank")
    },

    // SemDeDup: embedding-space dedup with CLUSTER-bounded comparisons —
    // the all-corpus scale path (d6's threshold join needs a broadcastable
    // side). Seeded k-means partitions the space; cosine pruning runs only
    // within clusters. Rows-only (k-means assignment is engine state);
    // exactness on co-clustered duplicates + min-id survivorship in
    // DedupSpec.
    Q.rowsOnly("sd1_semantic_dedup") { (s, d) =>
      Dedup.semanticDedup(Tables.embeddings(s, d), "vec_id", "embedding",
          k = 16, tau = 0.40)
        .groupBy("label").agg(count(lit(1)).as("n_survivors"))
        .orderBy("label")
    },

    // sd1's hash-matched sibling (the d3b/d4b/d5b playbook): the k-means
    // assignment is engine state, but the PRUNE is not — swap the learned
    // cluster for an FNV-1a-64 pseudo-cluster (a pure function of the id,
    // replayed bit-for-bit in DuckDB, the s20 snippet) and the
    // within-cluster cosine >= tau survivor set becomes value-checkable:
    // this gate certifies the dedup rule itself (pairing, threshold,
    // min-id survivorship) rather than rows-only.
    Q("sd1b_semantic_dedup_fnv",
      """WITH h AS (SELECT vec_id, embedding,
        |    list_reduce(
        |      list_prepend(CAST(-3750763034362895579 AS BIGINT),
        |        list_transform(regexp_split_to_array(CAST(vec_id AS VARCHAR), ''),
        |          c -> CAST(unicode(c) AS BIGINT))),
        |      (acc, cp) -> CAST(
        |        CASE WHEN ((CAST(xor(acc, cp) AS HUGEINT) + 18446744073709551616::HUGEINT)
        |                   % 18446744073709551616::HUGEINT * 1099511628211)
        |                  % 18446744073709551616::HUGEINT >= 9223372036854775808::HUGEINT
        |             THEN ((CAST(xor(acc, cp) AS HUGEINT) + 18446744073709551616::HUGEINT)
        |                   % 18446744073709551616::HUGEINT * 1099511628211)
        |                  % 18446744073709551616::HUGEINT - 18446744073709551616::HUGEINT
        |             ELSE ((CAST(xor(acc, cp) AS HUGEINT) + 18446744073709551616::HUGEINT)
        |                   % 18446744073709551616::HUGEINT * 1099511628211)
        |                  % 18446744073709551616::HUGEINT END AS BIGINT)) AS h
        |  FROM embeddings),
        |b AS (SELECT vec_id, embedding, ((h % 16) + 16) % 16 AS cluster FROM h),
        |drops AS (SELECT DISTINCT b2.vec_id
        |  FROM b b1 JOIN b b2 ON b1.cluster = b2.cluster
        |    AND b1.vec_id < b2.vec_id
        |  WHERE list_dot_product(CAST(b1.embedding AS DOUBLE[]),
        |          CAST(b2.embedding AS DOUBLE[]))
        |      / (sqrt(list_dot_product(CAST(b1.embedding AS DOUBLE[]),
        |               CAST(b1.embedding AS DOUBLE[])))
        |         * sqrt(list_dot_product(CAST(b2.embedding AS DOUBLE[]),
        |                 CAST(b2.embedding AS DOUBLE[])))) >= 0.40)
        |SELECT vec_id FROM embeddings
        |WHERE vec_id NOT IN (SELECT vec_id FROM drops)
        |ORDER BY vec_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
      val bucket = pmod(
        column(graft.expressions.Fnv1a64(
          expression(col("vec_id").cast("string")))), lit(16L))
      Dedup.semanticDedupBy(Tables.embeddings(s, d), "vec_id", "embedding",
          bucket, tau = 0.40)
        .select(col("vec_id")).orderBy("vec_id")
    },

    // Embedding-cosine near-dup mining: threshold join rather than top-k —
    // the dedup flavor of the ANN surface (pairs above a similarity
    // floor). Double index-order accumulation keeps it oracle-exact.
    Q("d6_embedding_near_dup",
      """WITH p AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b,
        |    list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        |      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
        |         * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS cosine
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id < 50 AND a.vec_id < b.vec_id)
        |SELECT a, b, round(cosine, 6) AS cosine FROM p WHERE cosine >= 0.35
        |ORDER BY a, b""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val q = emb.where(col("vec_id") < 50)
        .select(col("vec_id").as("a"), col("embedding").as("va"))
      val c = emb.select(col("vec_id").as("b"), col("embedding").as("vb"))
      c.join(broadcast(q), col("a") < col("b"))
        .withColumn("cosine",
          graft.functions.VectorFunctions.cosine(col("va"), col("vb")))
        .where(col("cosine") >= 0.35)
        .select(col("a"), col("b"), round(col("cosine"), 6).as("cosine"))
        .orderBy("a", "b")
    },

    // Jaro-Winkler fuzzy JOIN (d9's shape with a similarity threshold):
    // typo'd query names recover their originals — broadcast query side,
    // corpus scans once, completeness-preserving length-ratio prune from
    // the prefix-boosted Jaro upper bound. Exact kernel parity with
    // DuckDB makes the matched pairs AND scores hash-checkable.
    Q("d18_jw_fuzzy_join",
      """WITH c AS (SELECT c_custkey AS id, c_name AS t FROM customer
        |           WHERE c_custkey < 300),
        |q AS (SELECT c_custkey + 10000 AS id,
        |        replace(c_name, 'Customer', 'Custoner') AS t
        |      FROM customer WHERE c_custkey % 30 = 0 AND c_custkey < 300)
        |SELECT q.id AS a, c.id AS b,
        |  round(jaro_winkler_similarity(q.t, c.t), 6) AS jw
        |FROM q, c
        |WHERE jaro_winkler_similarity(q.t, c.t) >= 0.95
        |ORDER BY a, b""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d).where(col("c_custkey") < 300)
      val corpus = cust.select(col("c_custkey").as("id"), col("c_name").as("t"))
      val queries = cust.where(pmod(col("c_custkey"), lit(30)) === 0)
        .select((col("c_custkey") + 10000).as("id"),
          regexp_replace(col("c_name"), "Customer", "Custoner").as("t"))
      FuzzyJoin.jaroWinklerForQueries(corpus.unionByName(queries), "id", "t",
          queryPred = col("id") >= 10000, minSim = 0.95)
        .where(col("b") < 10000)    // query-vs-corpus pairs only
        .select(col("a"), col("b"), round(col("jw"), 6).as("jw"))
        .orderBy("a", "b")
    },

    // SEMANTIC decontamination (embedding-space eval-leakage screen, the
    // complement of dc1's verbatim n-gram pass): drop every corpus
    // vector within cosine 0.3 of ANY benchmark vector (vec_id < 20
    // plays the eval suite). Broadcast benchmark, native cosine kernel,
    // zero corpus shuffle; exact-double parity with DuckDB (the
    // ann1/d6 argument) makes the survivors list hash-checkable.
    Q("dc3_semantic_decontam",
      """WITH hits AS (SELECT DISTINCT a.vec_id
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id >= 20 AND b.vec_id < 20
        |    AND list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        |      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
        |         * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))
        |      >= 0.3)
        |SELECT vec_id FROM embeddings
        |WHERE vec_id >= 20 AND vec_id NOT IN (SELECT vec_id FROM hits)
        |ORDER BY vec_id""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      graft.operators.Decontaminate.semantic(
          emb.where(col("vec_id") >= 20), "vec_id", "embedding",
          emb.where(col("vec_id") < 20), "embedding", minCosine = 0.3)
        .select(col("vec_id"))
        .orderBy("vec_id")
    },

    // dc3's scale route, gated exactly (r11): benchmark sets too big to
    // broadcast go through the IVF coarse-quantizer route
    // (Ann.ivfThresholdHits — benchmark in home cells, corpus probes
    // nProbe cells, exact cosine verifies inside). At FULL probe
    // (nProbe = nCentroids) every (corpus, bench) pair is verified, so
    // the route is exact and shares dc3's brute-force oracle — the gate
    // pins the route itself (maxBroadcastRows = 0 forces it), including
    // the r11 in-plan assignment sizing it runs through.
    Q("dc4_semantic_decontam_ivf",
      """WITH hits AS (SELECT DISTINCT a.vec_id
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id >= 20 AND b.vec_id < 20
        |    AND list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        |      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
        |         * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))
        |      >= 0.3)
        |SELECT vec_id FROM embeddings
        |WHERE vec_id >= 20 AND vec_id NOT IN (SELECT vec_id FROM hits)
        |ORDER BY vec_id""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      graft.operators.Decontaminate.semantic(
          emb.where(col("vec_id") >= 20), "vec_id", "embedding",
          emb.where(col("vec_id") < 20), "embedding", minCosine = 0.3,
          maxBroadcastRows = 0L, nCentroids = 4, nProbe = 4)
        .select(col("vec_id"))
        .orderBy("vec_id")
    },

    // Brute-force cosine ANN over embeddings: queries vec_id < 20, k = 5.
    // Double accumulation in index order on both sides → bit-identical.
    Q("ann1_brute_cosine_topk",
      """WITH pairs AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        |      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
        |         * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS cosine
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id < 20 AND a.vec_id != b.vec_id),
        |ranked AS (SELECT query_id, neighbor_id, round(cosine, 6) AS cosine,
        |             CAST(row_number() OVER (PARTITION BY query_id
        |               ORDER BY round(cosine, 6) DESC, neighbor_id) AS BIGINT) AS rank
        |           FROM pairs)
        |SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Ann.bruteForceTopK(emb.where(col("vec_id") < 20), emb,
          "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // E2E3: the RAG index-build composition in ONE DAG — sliding chunker
    // (s21) → deterministic stub embedding (the documented fakeEmbed; a
    // real model forward pass slots into the same projection) → IVF ANN
    // (ann3's plan) over the CHUNKS: top-3 related passages per chunk,
    // doc attribution via the chunk id. Engine hashing → rows-only;
    // Round6Spec asserts the invariants (self excluded, k bound,
    // determinism across partitionings).
    Q.rowsOnly("e2e3_rag_chunk_index") { (s, d) =>
      val docs = Tables.documents(s, d).where(col("doc_id") < 50)
      val chunks = graft.operators.Chunker.slidingTokenChunks(
          docs, "doc_id", "text", windowTokens = 32, strideTokens = 16)
        .select(
          concat(col("doc_id"), lit("#"), col("chunk_idx")).as("chunk_id"),
          col("chunk_text"))
      val embedded = chunks.select(col("chunk_id"),
        graft.operators.Multimodal.fakeEmbed(
          col("chunk_text").cast("binary"), dim = 16).as("v"))
      Ann.ivfTopK(embedded, "chunk_id", "v", k = 3)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "neighbor_id")
    },

    // E2E3's VALUE-CHECKED sibling (r7 verdict item 4 — the ann3b
    // playbook applied to the whole composition): the SAME chunk → embed
    // → IVF DAG with (a) an FNV-derived deterministic embedding the
    // oracle can rebuild per dimension (the d4b/s11b fold) and (b) FULL
    // probe (nProbe = nCentroids), which makes IVF exactly brute force
    // by construction — so the oracle replays the chunker (s21's
    // unnest/list_transform), the 16-dim FNV embedding, and all-pairs
    // cosine top-3, and every output row hash-matches end to end. What
    // stays rows-only in e2e3 is only the xxhash64 stub embed.
    Q("e2e3b_rag_full_probe",
      s"""WITH t AS (SELECT doc_id,
         |    string_split_regex(trim(text), '\\s+') AS toks
         |  FROM documents WHERE doc_id < 30),
         |c AS (SELECT doc_id, unnest(list_transform(
         |    range(1, greatest(
         |      CAST(ceil((len(toks) - 32) / 16.0) AS BIGINT) + 1, 1) + 1),
         |    i -> struct_pack(ci := i - 1,
         |      ch := toks[(i-1)*16+1:(i-1)*16+32]))) AS pc
         |  FROM t),
         |ch AS (SELECT doc_id || '#' || CAST(pc.ci AS VARCHAR) AS chunk_id,
         |    array_to_string(pc.ch, ' ') AS chunk_text FROM c),
         |dims AS (SELECT CAST(i AS BIGINT) AS i FROM range(16) t(i)),
         |hv AS (SELECT chunk_id, i,
         |    ${Q.fnvSql("CAST(i AS VARCHAR) || '|' || chunk_text")} AS hv
         |  FROM ch CROSS JOIN dims),
         |vec AS (SELECT chunk_id,
         |    list(((hv % 100000) + 100000) % 100000 / 50000.0 - 1.0
         |      ORDER BY i) AS v
         |  FROM hv GROUP BY chunk_id),
         |pairs AS (SELECT a.chunk_id AS query_id, b.chunk_id AS neighbor_id,
         |    list_dot_product(a.v, b.v)
         |      / (sqrt(list_dot_product(a.v, a.v))
         |         * sqrt(list_dot_product(b.v, b.v))) AS cosine
         |  FROM vec a, vec b WHERE a.chunk_id != b.chunk_id),
         |ranked AS (SELECT query_id, neighbor_id, round(cosine, 6) AS cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY round(cosine, 6) DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM pairs)
         |SELECT query_id, neighbor_id, cosine, rank FROM ranked
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
      val docs = Tables.documents(s, d).where(col("doc_id") < 30)
      val chunks = graft.operators.Chunker.slidingTokenChunks(
          docs, "doc_id", "text", windowTokens = 32, strideTokens = 16)
        .select(
          concat(col("doc_id"), lit("#"), col("chunk_idx")).as("chunk_id"),
          col("chunk_text"))
      val dims = (0 until 16).map { i =>
        val h = column(graft.expressions.Fnv1a64(expression(
          concat(lit(s"$i|"), col("chunk_text")))))
        pmod(h, lit(100000L)) / lit(50000.0) - lit(1.0)
      }
      val embedded = chunks.select(col("chunk_id"), array(dims: _*).as("v"))
      Ann.ivfTopK(embedded, "chunk_id", "v", k = 3,
          nCentroids = 8, nProbe = 8)   // full probe ⇒ exactly brute force
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // Random-hyperplane LSH ANN (seeded): the 100 TB path — bucket join
    // instead of cross join. Rows-only; recall vs brute force is asserted
    // in ScalaTest.
    Q.rowsOnly("ann2_lsh_topk") { (s, d) =>
      Ann.lshTopK(Tables.embeddings(s, d), "vec_id", "embedding",
          k = 5, dim = 64, tables = 12, bits = 0, seed = 42L)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // ann2's value-checked complement: the SAME LSH pipeline (signature
    // → bucket self-join → exact cosine re-rank) with SIGN planes from
    // the FNV fold over "seed:t:j:i" — a standard LSH family whose
    // derivation the oracle can rebuild. Every surviving (query,
    // neighbor, cosine, rank) row hash-matches; what stays spec-gated in
    // ann2 is only the gaussian plane generator. Approximate BY DESIGN:
    // both engines drop the same non-colliding pairs.
    Q("ann2b_lsh_sign_planes",
      s"""WITH dims AS (SELECT CAST(i AS BIGINT) AS i FROM range(64) t(i)),
         |bits AS (SELECT CAST(j AS BIGINT) AS j FROM range(6) t(j)),
         |tabs AS (SELECT CAST(t AS BIGINT) AS t FROM range(4) t(t)),
         |pl AS (SELECT t, j, i,
         |         CASE ((hv % 2) + 2) % 2 WHEN 0 THEN 1.0 ELSE -1.0 END AS s
         |       FROM (SELECT tabs.t, bits.j, dims.i,
         |               ${Q.fnvSql("'42:' || t || ':' || j || ':' || i")} AS hv
         |             FROM tabs CROSS JOIN bits CROSS JOIN dims)),
         |terms AS (SELECT e.vec_id, p.t, p.j, p.i,
         |            CAST(e.embedding[p.i + 1] AS DOUBLE) * p.s AS term
         |          FROM embeddings e CROSS JOIN pl p),
         |dots AS (SELECT vec_id, t, j,
         |           list_reduce(list_prepend(0.0, list(term ORDER BY i)),
         |             (a, b) -> a + b) AS d
         |         FROM terms GROUP BY vec_id, t, j),
         |sigs AS (SELECT vec_id, t,
         |           CAST(sum((CASE WHEN d >= 0 THEN 1 ELSE 0 END)
         |             * (CAST(1 AS BIGINT) << j)) AS BIGINT) AS sig
         |         FROM dots GROUP BY vec_id, t),
         |cand AS (SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
         |         FROM sigs a JOIN sigs b
         |           ON a.t = b.t AND a.sig = b.sig AND a.vec_id != b.vec_id),
         |scored AS (
         |  SELECT c.query_id, c.neighbor_id,
         |    list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[]))
         |      / (sqrt(list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(ea.embedding AS DOUBLE[])))
         |         * sqrt(list_dot_product(CAST(eb.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])))) AS cosine
         |  FROM cand c JOIN embeddings ea ON ea.vec_id = c.query_id
         |  JOIN embeddings eb ON eb.vec_id = c.neighbor_id)
         |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine,
         |  CAST(rank AS BIGINT) AS rank FROM (
         |  SELECT query_id, neighbor_id, cosine,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY round(cosine, 6) DESC, neighbor_id) AS rank
         |  FROM scored) WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      Ann.lshTopKSignPlanes(Tables.embeddings(s, d), "vec_id", "embedding",
          k = 5, dim = 64, tables = 4, bits = 6, seed = 42L)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // IVF-style coarse-quantized ANN (seeded centroids, nProbe cells).
    Q.rowsOnly("ann3_ivf_topk") { (s, d) =>
      Ann.ivfTopK(Tables.embeddings(s, d), "vec_id", "embedding",
          k = 5, nCentroids = 16, nProbe = 4, seed = 42L)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // ann3's value-checked complement: the SAME ivfTopK machinery
    // (centroid training, home-cell assignment, probe-cell candidate
    // join, exact re-rank) run with nProbe == nCentroids — every query
    // probes every cell, so the candidate set is all pairs and the
    // result must EXACTLY equal brute force, whatever centroids the
    // seeded fit produced. This puts the whole IVF code path behind a
    // DuckDB oracle; ann3 (partial probe) stays the recall-gated form.
    Q("ann3b_ivf_full_probe",
      """WITH pairs AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        |      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
        |         * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS cosine
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id != b.vec_id),
        |ranked AS (SELECT query_id, neighbor_id, round(cosine, 6) AS cosine,
        |             CAST(row_number() OVER (PARTITION BY query_id
        |               ORDER BY round(cosine, 6) DESC, neighbor_id) AS BIGINT) AS rank
        |           FROM pairs)
        |SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      Ann.ivfTopK(Tables.embeddings(s, d), "vec_id", "embedding",
          k = 5, nCentroids = 8, nProbe = 8, seed = 42L)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // Sparse random projection (Achlioptas/JL): embedding dimension
    // reduction as a pure scan-speed projection — the step that makes
    // every downstream ANN distance 8× cheaper at 100 TB. The sign
    // matrix is seeded FNV over "seed:i:j", never materialized; the
    // oracle REBUILDS it from the same fold and replays the index-order
    // term sum with list_reduce — the whole kernel is value-checked,
    // not just row-counted.
    Q("rp1_random_projection",
      s"""WITH dims AS (SELECT CAST(i AS BIGINT) AS i FROM range(64) t(i)),
         |outs AS (SELECT CAST(j AS BIGINT) AS j FROM range(8) t(j)),
         |h AS (SELECT i, j,
         |        ${Q.fnvSql("'42:' || i || ':' || j")} AS hv
         |      FROM dims CROSS JOIN outs),
         |signs AS (SELECT i, j,
         |            CASE ((hv % 6) + 6) % 6 WHEN 0 THEN 1.0
         |                 WHEN 1 THEN -1.0 ELSE 0.0 END AS s
         |          FROM h),
         |terms AS (SELECT e.vec_id, sg.j, sg.i,
         |            CAST(e.embedding[sg.i + 1] AS DOUBLE) * sg.s AS term
         |          FROM embeddings e CROSS JOIN signs sg
         |          WHERE e.vec_id < 50),
         |proj AS (SELECT vec_id, j,
         |           list_reduce(list_prepend(0.0, list(term ORDER BY i)),
         |             (a, b) -> a + b) * sqrt(3.0 / 8) AS v
         |         FROM terms GROUP BY vec_id, j)
         |SELECT vec_id, j, round(v, 6) AS v FROM proj
         |ORDER BY vec_id, j""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d).where(col("vec_id") < 50)
      graft.operators.Projection.sparseRandomProject(
          emb, "vec_id", "embedding", outDim = 8, seed = 42L)
        .select(col("vec_id"), posexplode(col("projected")).as(Seq("j", "v")))
        .select(col("vec_id"), col("j").cast("long").as("j"),
          round(col("v"), 6).as("v"))
        .orderBy("vec_id", "j")
    },

    // Int8-quantized brute force + exact shortlist re-rank: the memory-
    // bandwidth path (coarse pass reads 1/4 the bytes). Fully
    // value-checked: the oracle replays symmetric quantization — Java's
    // Math.round IS floor(x + 0.5), spelled exactly that way in SQL
    // (DuckDB round() is half-away-from-zero and diverges on negative
    // .5 boundaries) — the integer int8 cosine (dots ≤ 64·127² are exact
    // in doubles), the k·4 shortlist window, and the float re-rank.
    // Recall + cosine-error bounds vs ann1 stay in QuantAnnSpec.
    Q("ann4_quantized_topk",
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |m AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS ma FROM v),
        |q AS (SELECT vec_id,
        |        list_transform(e, x -> floor(x * (127.0 / ma) + 0.5)) AS qv
        |      FROM m),
        |qsum AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS nn FROM q),
        |coarse AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    CASE WHEN a.nn = 0 OR b.nn = 0 THEN 0.0
        |         ELSE list_dot_product(a.qv, b.qv) / (sqrt(a.nn) * sqrt(b.nn)) END AS qcos
        |  FROM qsum a JOIN qsum b ON a.vec_id != b.vec_id
        |  WHERE a.vec_id < 20),
        |short AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY round(qcos, 6) DESC, neighbor_id) AS crank
        |  FROM coarse) WHERE crank <= 20),
        |rescored AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    list_dot_product(va.e, vb.e)
        |      / (sqrt(list_dot_product(va.e, va.e))
        |         * sqrt(list_dot_product(vb.e, vb.e))) AS cosine
        |  FROM short s JOIN v va ON va.vec_id = s.query_id
        |  JOIN v vb ON vb.vec_id = s.neighbor_id)
        |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine,
        |  CAST(rank AS BIGINT) AS rank FROM (
        |  SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY round(cosine, 6) DESC, neighbor_id) AS rank
        |  FROM rescored) WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Ann.quantizedTopK(emb.where(col("vec_id") < 20), emb,
          "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // Product-quantization ANN (m bytes per corpus vector, asymmetric-
    // distance coarse scan, exact shortlist re-rank) — the deepest
    // compression tier of the ANN family (brute → int8 → PQ). Codebook
    // training is seeded; recall vs brute force bounded in PqAnnSpec.
    Q.rowsOnly("ann5_pq_topk") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Ann.pqTopK(emb.where(col("vec_id") < 20), emb,
          "vec_id", "embedding", k = 5, m = 8, nCodes = 32,
          shortlistFactor = 8)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // ann5's value-checked complement (the ann3b playbook applied to PQ):
    // a SATURATED shortlist (k · 400 ≥ any gate/bench corpus) forces the
    // exact re-rank to cover every candidate, so the output must equal
    // brute force whatever the codebooks quantized — gating the PQ
    // encode/score/shortlist/re-rank machinery end to end. What stays
    // spec-bounded in ann5 is only the codebook quality (recall at a
    // REAL shortlist, PqAnnSpec).
    Q("ann5b_pq_saturated",
      """WITH pairs AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        |      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
        |         * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS cosine
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id < 20 AND a.vec_id != b.vec_id),
        |ranked AS (SELECT query_id, neighbor_id, round(cosine, 6) AS cosine,
        |             CAST(row_number() OVER (PARTITION BY query_id
        |               ORDER BY round(cosine, 6) DESC, neighbor_id) AS BIGINT) AS rank
        |           FROM pairs)
        |SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Ann.pqTopK(emb.where(col("vec_id") < 20), emb,
          "vec_id", "embedding", k = 5, m = 8, nCodes = 32,
          shortlistFactor = 400)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // Edit-distance fuzzy join (typo-tolerant matching): the string-level
    // near-dup metric shingle operators miss — a 1-char edit disturbs up to
    // n shingles but is distance 1 here. Query-vs-corpus broadcast with the
    // length prune in the join condition and the thresholded levenshtein
    // kernel; oracle recomputes the full unpruned distance.
    Q("d9_edit_distance",
      """SELECT a.p_partkey AS a, b.p_partkey AS b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM part a, part b
        |WHERE a.p_partkey % 211 = 3 AND a.p_partkey <> b.p_partkey
        |  AND levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY a, b""".stripMargin) { (s, d) =>
      FuzzyJoin.editDistanceForQueries(Tables.part(s, d), "p_partkey",
          "p_name", queryPred = col("id") % 211 === 3, maxDist = 2)
        .select(col("a"), col("b"), col("dist").cast("long"))
        .orderBy("a", "b")
    },

    // n-gram CONTAINMENT (asymmetric): |S(q) ∩ S(c)| / |S(q)| — catches a
    // query document embedded inside a longer one, which symmetric Jaccard
    // under-scores exactly when |S(c)| >> |S(q)|. Same broadcast
    // query-vs-corpus shape as d2, on the HASHED fast path (the production
    // form): distinct-set containment over 64-bit shingle hashes equals the
    // string-shingle value to ~2^-64 per pair, so the string-based oracle
    // still hash-matches (same argument as d2b; ContainmentSpec asserts the
    // two paths agree).
    Q("d10_containment",
      """WITH s AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(length(t) - 2, 1) + 1),
        |      i -> t[i:i+2])) AS sh
        |  FROM (SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS t
        |        FROM documents))
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh), 6)
        |    AS containment
        |FROM s a, s b
        |WHERE a.doc_id < 25 AND a.doc_id <> b.doc_id
        |  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) >= 0.9
        |ORDER BY a, b""".stripMargin) { (s, d) =>
      Dedup.ngramContainmentForQueries(Tables.documents(s, d), "doc_id",
          "text", n = 3, queryPred = col("id") < 25, minContainment = 0.9,
          hashed = true)
        .select(col("a"), col("b"),
          round(col("containment"), 6).as("containment"))
        .orderBy("a", "b")
    },
  )
}
