package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Statistical language-model corpus operators — the quality/audit passes
  * a pretraining pipeline runs that need corpus-level token STATISTICS
  * rather than per-row string functions: n-gram LM scoring (the CCNet
  * playbook: score every document under an LM and filter the tail) and
  * distribution-drift audits between corpus slices.
  *
  * Every query here is two-phase in one DAG: a corpus-level aggregate
  * (bigram/unigram counts — shuffles on the GRAM key, so volume is
  * |distinct grams|, not |rows|) joined back against the per-doc explode.
  * At 100 TB both phases stay distributed: no driver-side model state,
  * the "trained model" IS a DataFrame joined by key (AQE broadcasts it
  * when small).
  */
object Lm {

  val queries: Seq[Q] = Seq(

    // Bigram-LM negative log-likelihood per document (add-one smoothing,
    // LM trained on the corpus itself): the canonical "perplexity filter"
    // quality signal. nll = mean over doc bigrams of
    // -ln((c(w1 w2) + 1) / (c(w1 ·) + V)); high nll = improbable text
    // (boilerplate, mojibake, wrong-language spans).
    Q("t17_perplexity",
      """WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
        |           FROM documents),
        |d AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
        |g AS (SELECT doc_id,
        |        unnest(list_transform(range(1, len(toks)),
        |          i -> {'w1': toks[i], 'w2': toks[i+1]})) AS bg
        |      FROM d),
        |gg AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM g),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM gg GROUP BY w1, w2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM gg GROUP BY w1),
        |v AS (SELECT count(DISTINCT w) AS v
        |      FROM (SELECT unnest(toks) AS w FROM d))
        |SELECT gg.doc_id,
        |  round(avg(-ln(CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + v.v))), 6) AS nll,
        |  CAST(count(*) AS BIGINT) AS n_bigrams
        |FROM gg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
        |GROUP BY gg.doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
      val toks = tokenize(lower(col("text")))
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), toks.as("toks"))
        .where(size(col("toks")) >= 2)
      // only (doc_id, w1, w2) rides the explode — never the text; native
      // AdjacentPairs (r14) replaces the interpreted transform+element_at
      // lambda (this subtree is instantiated three times in the plan:
      // c2, c1 and the final join)
      val g = docs.select(col("doc_id"),
          explode(column(graft.expressions.AdjacentPairs(
            expression(col("toks")), padded = false))).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val c2 = g.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      val c1 = g.groupBy("w1").agg(count(lit(1)).as("c1"))
      val v = docs.select(explode(col("toks")).as("w"))
        .agg(countDistinct(col("w")).as("v"))
      g.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
        .crossJoin(broadcast(v))
        .groupBy("doc_id")
        .agg(
          round(avg(-log((col("c2") + 1).cast("double") / (col("c1") + col("v")))), 6)
            .as("nll"),
          count(lit(1)).cast("long").as("n_bigrams"))
        .orderBy("doc_id")
    },

    // Token-distribution drift per corpus slice: KL(P_source || P_corpus)
    // over unigram distributions — the audit that catches a source whose
    // token mix diverged (scraper drift, encoding regression) before it
    // poisons a training mix. One explode; the per-word corpus counts
    // re-aggregate from the per-(source, word) counts, so the corpus-wide
    // shuffle is |distinct words|, not |tokens|.
    Q("t19_kl_drift",
      """WITH w AS (SELECT source, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        |           FROM documents),
        |sw AS (SELECT source, w, count(*) AS c_sw FROM w GROUP BY source, w),
        |cw AS (SELECT w, CAST(sum(c_sw) AS BIGINT) AS c_w FROM sw GROUP BY w),
        |ns AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_s FROM sw GROUP BY source),
        |nt AS (SELECT CAST(sum(c_w) AS BIGINT) AS n FROM cw)
        |SELECT sw.source,
        |  round(sum((CAST(c_sw AS DOUBLE) / n_s) *
        |            ln((CAST(c_sw AS DOUBLE) / n_s) / (CAST(c_w AS DOUBLE) / n))), 6) AS kl,
        |  CAST(max(n_s) AS BIGINT) AS n_tokens
        |FROM sw JOIN cw USING (w) JOIN ns USING (source) CROSS JOIN nt
        |GROUP BY sw.source ORDER BY source""".stripMargin) { (s, d) =>
      val sw = Tables.documents(s, d)
        .select(col("source"), explode(tokenize(lower(col("text")))).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c_sw"))
      val cw = sw.groupBy("w").agg(sum(col("c_sw")).as("c_w"))
      val ns = sw.groupBy("source").agg(sum(col("c_sw")).as("n_s"))
      val nt = cw.agg(sum(col("c_w")).as("n"))
      val ps = col("c_sw").cast("double") / col("n_s")
      val pc = col("c_w").cast("double") / col("n")
      sw.join(cw, Seq("w")).join(ns, Seq("source"))
        .crossJoin(broadcast(nt))
        .groupBy("source")
        .agg(round(sum(ps * log(ps / pc)), 6).as("kl"),
          max(col("n_s")).cast("long").as("n_tokens"))
        .orderBy("source")
    },

    // DSIR importance weights (Xie et al. 2023): hashed unigram+bigram
    // bucket features (FNV-1a-64 mod 1024 so the oracle replays the
    // bucketing), add-one-smoothed target-vs-raw bucket LMs (target =
    // English slice), per-doc log-likelihood-ratio weight — the "select
    // raw data that looks like the target corpus" scorer. The oracle
    // recomputes the entire pipeline from first principles: tokenize →
    // gram → FNV hash → bucket counts → smoothed log-ratio → per-doc sum.
    Q("s19_dsir_weights",
      """WITH t AS (SELECT doc_id, lang = 'en' AS tt,
        |    string_split_regex(trim(lower(text)), '\s+') AS toks
        |  FROM documents),
        |g0 AS (SELECT doc_id, tt,
        |    unnest(list_concat(toks,
        |      list_transform(range(1, len(toks)),
        |        i -> toks[i] || ' ' || toks[i+1]))) AS g
        |  FROM t),
        |h AS (SELECT doc_id, tt,
        |    list_reduce(
        |      list_prepend(CAST(-3750763034362895579 AS BIGINT),
        |        list_transform(regexp_split_to_array(g, ''),
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
        |  FROM g0),
        |db AS (SELECT doc_id, tt, ((h % 1024) + 1024) % 1024 AS b,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM h GROUP BY 1, 2, 3),
        |bc AS (SELECT b, CAST(sum(c) AS BIGINT) AS cr,
        |    CAST(sum(CASE WHEN tt THEN c ELSE 0 END) AS BIGINT) AS ct
        |  FROM db GROUP BY b),
        |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
        |    CAST(sum(ct) AS BIGINT) AS nt FROM bc),
        |lr AS (SELECT b,
        |    ln(CAST(ct + 1 AS DOUBLE) / (nt + 1024))
        |      - ln(CAST(cr + 1 AS DOUBLE) / (nr + 1024)) AS lr
        |  FROM bc CROSS JOIN tot)
        |SELECT db.doc_id, round(sum(c * lr), 6) AS logw,
        |  CAST(sum(c) AS BIGINT) AS n_grams
        |FROM db JOIN lr USING (b)
        |GROUP BY db.doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .withColumn("toks", tokenize(lower(col("text"))))
      // one native gram-hash pass (TokenGramHashes fnv) — identical FNV
      // buckets to the unigramBigram + Fnv1a64 chain, no interpreted
      // transform and no gram strings in the plan (r14, DsirSpec-pinned)
      graft.operators.Dsir.importanceWeightsTokens(docs, "doc_id",
          col("toks"), col("lang") === "en", buckets = 1024, fnv = true)
        .select(col("doc_id"), round(col("logw"), 6).as("logw"),
          col("n_grams"))
        .orderBy("doc_id")
    },

    // BPE tokenizer TRAINING on the corpus (t13 applies a merge table;
    // this learns one): 24 merges, each an iterative count-weighted
    // argmax over the vocab-sized word table. Rows-only — the iterative
    // argmax is not SQL-expressible — but fully deterministic (integral
    // counts, lexicographic tie-break); BpeTrainSpec hand-traces the
    // classic low/lower/newest/widest corpus and round-trips the learned
    // table through the t13 apply expression.
    // Value-checked via a 24-stage UNROLLED replay of the Sennrich loop:
    // stage i re-applies the i−1 already-picked merges to the vocabulary
    // (the same recursive-CTE BPE apply as the t13 oracle, with the merge
    // list carried as a column — DuckDB lambdas cannot hold subqueries),
    // explodes adjacent pairs, and takes the count-weighted argmax with
    // the lexicographic tie-break. Each stage's single-row pick feeds the
    // next stage's merge list as scalar subqueries; ml/d/p CTEs are
    // MATERIALIZED or the shared-prefix recomputation is exponential in
    // the stage count (measured: >5 min inlined, 0.6 s materialized).
    // The oracle presumes all 24 merges are learnable on the gate corpus
    // (they are; the early-stop path is pinned in BpeTrainSpec).
    Q("t20_bpe_train", {
      val n = 24
      def stage(i: Int): String = {
        val ml =
          if (i == 1) "CAST([] AS VARCHAR[])"
          else (1 until i).map(j => s"(SELECT pr FROM p$j)")
            .mkString("[", ",", "]")
        val rks =
          s"""[coalesce(nullif(list_position(ml, parts[k + 1] || ' ' || parts[k + 2]), 0), 999999)
             |         for k in range(len(parts) - 1)]""".stripMargin
        s"""ml$i AS MATERIALIZED (SELECT $ml AS ml),
           |b$i AS (
           |  SELECT word, regexp_split_to_array(word, '') AS parts, ml
           |  FROM v0 CROSS JOIN ml$i
           |  UNION ALL
           |  SELECT word,
           |    list_concat(list_concat(parts[1:bi - 1],
           |      [parts[bi] || parts[bi + 1]]), parts[bi + 2:len(parts)]),
           |    ml
           |  FROM (
           |    SELECT word, parts, ml,
           |      list_position(rks, list_min(rks)) AS bi, list_min(rks) AS br
           |    FROM (SELECT word, parts, ml, $rks AS rks
           |          FROM b$i WHERE len(parts) >= 2))
           |  WHERE br != 999999),
           |d$i AS MATERIALIZED (
           |  SELECT word, parts FROM (
           |    SELECT word, parts,
           |      CASE WHEN len(parts) < 2 THEN true ELSE
           |        list_min($rks) = 999999 END AS fin
           |    FROM b$i) WHERE fin),
           |p$i AS MATERIALIZED (
           |  SELECT w1, w2, w1 || ' ' || w2 AS pr FROM (
           |    SELECT u.pair[1] AS w1, u.pair[2] AS w2, sum(v0.cnt) AS n
           |    FROM d$i JOIN v0 USING (word),
           |      LATERAL (SELECT unnest([[parts[k + 1], parts[k + 2]]
           |        for k in range(len(parts) - 1)]) AS pair) u
           |    GROUP BY 1, 2)
           |  WHERE n >= 2 ORDER BY n DESC, w1, w2 LIMIT 1)""".stripMargin
      }
      val stages = (1 to n).map(stage).mkString(",\n")
      val finals = (1 to n).map(i =>
        s"SELECT CAST(${i - 1} AS BIGINT) AS rank, w1, w2 FROM p$i")
        .mkString("\nUNION ALL\n")
      s"""WITH RECURSIVE
         |v0 AS MATERIALIZED (
         |  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
         |    FROM documents)
         |  WHERE word != '' GROUP BY word),
         |$stages
         |$finals
         |ORDER BY rank""".stripMargin
    }) { (s, d) =>
      val merges = graft.model.BpeTrain.learn(
        Tables.documents(s, d), "text", numMerges = 24)
      import s.implicits._
      merges.zipWithIndex
        .map { case ((w1, w2), i) => (i.toLong, w1, w2) }
        .toDF("rank", "w1", "w2")
        .orderBy("rank")
    })
}
