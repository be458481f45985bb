package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Second relational batch: scalar-function surface (F4/F14/F15), term
  * document frequency (A10), stop-word filtering (S8/A11), event-time
  * tumbling windows (ST5), intersect (SO), and JSON/array functions. */
object Relational2 {

  val queries: Seq[Q] = Seq(

    // F4: string repetition by computed weight — the reference's TF
    // weighting by duplication (`(tag+' ')*w`, simility_books.py:40).
    Q("f4_repeat_by_weight",
      """SELECT p_partkey, repeat(lower(p_brand), p_size % 4 + 1) AS rep
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          expr("repeat(lower(p_brand), p_size % 4 + 1)").as("rep"))
        .orderBy("p_partkey")
    },

    // A10: corpus document frequency with min-df pruning — the relational
    // core of CountVectorizer(min_df=10) (guessLike_u_like.py:74-75).
    Q("a10_term_document_frequency",
      """SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |      FROM documents)
        |GROUP BY term HAVING count(DISTINCT doc_id) >= 10
        |ORDER BY term""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(graft.functions.TextFunctions.tokenize(col("text"))).as("term"))
        .groupBy("term")
        .agg(countDistinct(col("doc_id")).as("df"))
        .where(col("df") >= 10)
        .orderBy("term")
    },

    // S8/A11: stop-word removal (the reference's 1,893-entry list,
    // guessLike_u_like.py:72-73) as a token filter.
    Q("s8_stopword_filter",
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |    x -> x NOT IN ('the','a','an','of','to','in','and','is','on','for','with'))) AS BIGINT)
        |    AS n_content_tokens
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val stops = Seq("the", "a", "an", "of", "to", "in", "and", "is", "on", "for", "with")
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(filter(graft.functions.TextFunctions.tokenize(col("text")),
            t => !t.isin(stops: _*))).cast("long").as("n_content_tokens"))
        .orderBy("doc_id")
    },

    // F14: date-part extraction and truncation (log path arithmetic,
    // log_analyze.py:42-45).
    Q("f14_date_parts",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
        |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .where(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"))
        .orderBy("o_orderkey")
    },

    // ST5: event-time tumbling window aggregation — the batch form of the
    // streaming `window($"ts", "1 hour")` plan (the daily-batch plane is
    // the reference's 1-day tumbling window, SURVEY §2.8 ST5).
    Q("st5_tumbling_window_agg",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
        |  event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin) { (s, d) =>
      // ts arrives as long nanoseconds (see Verify nanosAsLong); convert to
      // a real timestamp and window it.
      val ev = Tables.events(s, d)
        .withColumn("t", timestamp_micros(expr("ts DIV 1000")))
      ev.groupBy(window(col("t"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("hour", "event_type")
    },

    // ST8 (engine ext): gap-based sessionization — the batch/window form
    // of Structured Streaming's session_window, over the event log (30-min
    // gap). One Window operator, one shuffle on user_id; ts handled as
    // integer microseconds end-to-end (ns DIV 1000 — never float math on
    // epoch values, and raw ts is never emitted).
    Q("st8_sessionize",
      """WITH e AS (SELECT user_id, event_id,
        |    CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
        |m AS (SELECT user_id, event_id, us,
        |        CASE WHEN lag(us) OVER w IS NULL
        |             OR us - lag(us) OVER w > 1800000000
        |             THEN 1 ELSE 0 END AS ns
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT user_id, us,
        |        sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id) AS sid
        |      FROM m),
        |per AS (SELECT user_id, sid, count(*) AS n_ev,
        |          (max(us) - min(us)) // 1000000 AS dur
        |        FROM s GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(n_ev) AS BIGINT) AS n_events,
        |  CAST(max(dur) AS BIGINT) AS max_dur_s
        |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("us"))
      graft.operators.Sessionize.sessionStats(ev, "user_id", "us",
          gap = 1800000000L, tieBreak = col("event_id"), durUnit = 1000000L)
        .select(col("user_id"), col("n_sessions"), col("n_events"),
          col("max_dur").as("max_dur_s"))
        .orderBy("user_id")
    },

    // Last-touch attribution: each purchase attributed to the user's most
    // recent view/click within a 30-minute window (the as-of join with a
    // tolerance filter — AsOfJoin's one-shuffle union+window plan, no
    // range nested-loop). Purchases with no qualifying touch bucket as
    // 'none' — the unattributed count a pure inner join silently drops.
    Q("st11_attribution",
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
        |t AS (SELECT user_id, us, event_type AS touch_type FROM e
        |      WHERE event_type IN ('view', 'click')),
        |p AS (SELECT user_id, us, event_id FROM e
        |      WHERE event_type = 'purchase')
        |SELECT coalesce(CASE WHEN p.us - t.us <= 1800000000
        |                     THEN t.touch_type END, 'none') AS touch_type,
        |  CAST(count(*) AS BIGINT) AS n_purchases
        |FROM p ASOF LEFT JOIN t
        |  ON p.user_id = t.user_id AND t.us <= p.us
        |GROUP BY 1 ORDER BY touch_type""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts DIV 1000").as("us"))
      val touches = e.where(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("us"),
          col("us").as("touch_us"), col("event_type").as("touch_type"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("us"), col("event_id"))
      graft.operators.AsOfJoin.asOf(purchases, touches,
          keyCols = Seq("user_id"), tsCol = "us",
          payloadCols = Seq("touch_us", "touch_type"))
        .select(coalesce(
          when(col("us") - col("touch_us") <= 1800000000L,
            col("touch_type")), lit("none")).as("touch_type"))
        .groupBy("touch_type").agg(count(lit(1)).as("n_purchases"))
        .orderBy("touch_type")
    },

    // Group-wise OLS regression (trend per event type): slope/intercept/r²
    // of value over time in ONE partial+final aggregate pass (regr_* are
    // algebraic aggregates — per-group sums of x, y, xy, x², y² — so the
    // shuffle carries five doubles per group, scale-free). Time is
    // re-based to days since the epoch floor so both engines regress
    // against small, identical abscissae (raw epoch micros would put 1e15
    // magnitudes through the covariance formula).
    Q("a24_group_regression",
      """WITH e AS (SELECT event_type, value,
        |    CAST(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01') AS DOUBLE)
        |      / 86400000000.0 AS x
        |  FROM events)
        |SELECT event_type,
        |  round(regr_slope(value, x), 6) AS slope,
        |  round(regr_intercept(value, x), 6) AS intercept,
        |  round(regr_r2(value, x), 6) AS r2,
        |  CAST(regr_count(value, x) AS BIGINT) AS n
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"), col("value"),
          ((expr("ts DIV 1000") -
            lit(java.time.Instant.parse("2024-01-01T00:00:00Z")
              .toEpochMilli * 1000L)).cast("double") / 86400000000.0)
            .as("x"))
        .groupBy("event_type")
        .agg(round(expr("regr_slope(value, x)"), 6).as("slope"),
          round(expr("regr_intercept(value, x)"), 6).as("intercept"),
          round(expr("regr_r2(value, x)"), 6).as("r2"),
          expr("regr_count(value, x)").cast("long").as("n"))
        .orderBy("event_type")
    },

    // Entity resolution over part names with deterministic in-query typos
    // (ids ≡0 mod 7 get a trailing 'x'): prefix blocking + length prune +
    // Levenshtein verify on the DISTINCT name dictionary, components, and
    // a record-level map back to the canonical name. The oracle replays
    // blocking, edit distance, and reachability from first principles.
    Q("er1_entity_resolution",
      """WITH RECURSIVE
        |r AS (SELECT p_partkey AS id,
        |    CASE WHEN p_partkey % 7 = 0 THEN p_name || 'x' ELSE p_name END AS name
        |  FROM part),
        |x AS (SELECT id, lower(regexp_replace(trim(name), '\s+', ' ', 'g')) AS nm
        |      FROM r),
        |n AS (SELECT DISTINCT nm FROM x),
        |e AS (SELECT a.nm AS a, b.nm AS b FROM n a, n b
        |      WHERE a.nm < b.nm AND substr(a.nm, 1, 3) = substr(b.nm, 1, 3)
        |        AND abs(length(a.nm) - length(b.nm)) <= 2
        |        AND levenshtein(a.nm, b.nm) <= 2),
        |edges AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
        |cc AS (
        |  SELECT a AS id, a AS reach FROM edges
        |  UNION
        |  SELECT cc.id, edges.b AS reach FROM cc JOIN edges ON cc.reach = edges.a),
        |comp AS (SELECT id AS nm, min(reach) AS canon FROM cc GROUP BY id)
        |SELECT x.id AS id, coalesce(comp.canon, x.nm) AS entity
        |FROM x LEFT JOIN comp ON x.nm = comp.nm
        |ORDER BY id""".stripMargin) { (s, d) =>
      val records = Tables.part(s, d)
        .select(col("p_partkey").as("id"),
          when(pmod(col("p_partkey"), lit(7)) === 0,
            concat(col("p_name"), lit("x"))).otherwise(col("p_name"))
            .as("name"))
      graft.operators.EntityResolution.resolve(records, "id", "name",
          maxDistance = 2, blockPrefixLen = 3)
        .select(col("id"), col("entity"))
        .orderBy("id")
    },

    // Snapshot diff (corpus-versioning audit): classify every doc id as
    // added/removed/changed/unchanged between two corpus versions — v2 is
    // derived deterministically in-query (drop ids ≡3 mod 10, edit ids ≡5,
    // add 20 new ids) so both engines diff identical snapshots. One full
    // outer join on the id; direct column compare, no hash collisions.
    Q("so7_snapshot_diff",
      """WITH v1 AS (SELECT doc_id, text FROM documents),
        |v2 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 5 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 10 != 3
        |  UNION ALL
        |  SELECT doc_id + 1000000, 'new doc' FROM documents WHERE doc_id < 20)
        |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN v1.doc_id IS NULL THEN 'added'
        |       WHEN v2.doc_id IS NULL THEN 'removed'
        |       WHEN v1.text = v2.text THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val v1 = docs.select(col("doc_id"), col("text"))
      val v2 = docs.where(pmod(col("doc_id"), lit(10)) =!= 3)
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(10)) === 5,
            concat(col("text"), lit(" v2"))).otherwise(col("text")).as("text"))
        .union(docs.where(col("doc_id") < 20)
          .select((col("doc_id") + 1000000).as("doc_id"),
            lit("new doc").as("text")))
      graft.operators.SnapshotDiff.diff(v1, v2, "doc_id", Seq("text"))
        .orderBy("doc_id")
    },

    // MERGE/upsert apply (so7's inverse — produce the NEXT snapshot from
    // a change feed): updates where the key exists, inserts where it
    // doesn't, deletes where flagged, pass-through otherwise — one full
    // outer join, the relational form of the lakehouse MERGE write path.
    // An explicit NULL update value WINS over the base value (overwrite
    // semantics, not coalesce).
    Q("so10_merge_apply",
      """WITH base AS (SELECT c_custkey AS k, round(c_acctbal, 2) AS v
        |              FROM customer),
        |chg AS (SELECT c_custkey AS k, round(c_acctbal + 100, 2) AS v,
        |          (c_custkey % 7 = 0) AS del
        |        FROM customer WHERE c_custkey % 3 = 0
        |        UNION ALL
        |        SELECT c_custkey + 1000000, 1.0, false
        |        FROM customer WHERE c_custkey < 50)
        |SELECT k, v FROM (
        |  SELECT coalesce(c.k, b.k) AS k,
        |    CASE WHEN c.k IS NOT NULL THEN c.v ELSE b.v END AS v,
        |    coalesce(c.del, false) AS del
        |  FROM base b FULL OUTER JOIN chg c ON b.k = c.k)
        |WHERE NOT del ORDER BY k""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d)
      val base = cust.select(col("c_custkey").as("k"),
        round(col("c_acctbal"), 2).as("v"))
      val chg = cust.where(pmod(col("c_custkey"), lit(3)) === 0)
        .select(col("c_custkey").as("k"),
          round(col("c_acctbal") + 100, 2).as("v"),
          (pmod(col("c_custkey"), lit(7)) === 0).as("del"))
        .union(cust.where(col("c_custkey") < 50)
          .select((col("c_custkey") + 1000000).as("k"),
            lit(1.0).as("v"), lit(false).as("del")))
      graft.operators.SnapshotDiff.applyChanges(base, chg, "k",
          valueCols = Seq("v"), deleteCol = "del")
        .orderBy("k")
    },

    // Streaming-shaped trending: top-3 event types per tumbling hour —
    // st5's windowed counts + W1's WindowGroupLimit rank in one plan (the
    // batch form of a readStream trending dashboard; per-window state is
    // the k-row heap, never the full count set).
    Q("st10_trending",
      """WITH w AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
        |    event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT hour, event_type, n,
        |    CAST(row_number() OVER (PARTITION BY hour
        |      ORDER BY n DESC, event_type) AS BIGINT) AS rank
        |  FROM w)
        |SELECT hour, event_type, n, rank FROM r WHERE rank <= 3
        |ORDER BY hour, rank""".stripMargin) { (s, d) =>
      val counts = Tables.events(s, d)
        .withColumn("t", timestamp_micros(expr("ts DIV 1000")))
        .groupBy(window(col("t"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
          col("event_type"), col("n"))
      graft.operators.TopK.topKPerKey(counts, Seq("hour"),
          Seq(col("n").desc, col("event_type").asc), k = 3)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("hour", "rank")
    },

    // Ordered-funnel conversion (view → click → purchase): stage i counts
    // users with a stage-i event STRICTLY AFTER their earliest qualifying
    // stage-(i−1) event — min-time forward chaining, each user converts
    // once per stage. Stage frames shrink monotonically, so successive
    // user-keyed joins get cheaper; integer-microsecond ts end-to-end.
    Q("st9_funnel",
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
        |s0 AS (SELECT user_id, min(us) AS t FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s1 AS (SELECT e.user_id AS user_id, min(us) AS t
        |       FROM e JOIN s0 ON e.user_id = s0.user_id
        |       WHERE event_type = 'click' AND us > s0.t GROUP BY e.user_id),
        |s2 AS (SELECT e.user_id AS user_id, min(us) AS t
        |       FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE event_type = 'purchase' AND us > s1.t GROUP BY e.user_id)
        |SELECT stage_idx, stage, n_users FROM (
        |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'view' AS stage,
        |    (SELECT CAST(count(*) AS BIGINT) FROM s0) AS n_users
        |  UNION ALL SELECT 1, 'click',
        |    (SELECT CAST(count(*) AS BIGINT) FROM s1)
        |  UNION ALL SELECT 2, 'purchase',
        |    (SELECT CAST(count(*) AS BIGINT) FROM s2))
        |ORDER BY stage_idx""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          expr("ts DIV 1000").as("us"))
      graft.operators.Funnel.funnelCounts(ev, "user_id", "event_type", "us",
        Seq("view", "click", "purchase"))
    },

    // Cohort retention: users cohorted by the week of their first event;
    // each (cohort, offset) cell counts cohort users active that many
    // weeks later. Two user-keyed aggregates + one join; Monday-truncated
    // weeks in both engines, offsets as exact 7-day bucket differences.
    Q("a23_cohort_retention",
      """WITH c AS (SELECT user_id,
        |    CAST(date_trunc('week', min(ts)) AS DATE) AS cw
        |  FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS p FROM events)
        |SELECT strftime(cw, '%Y-%m-%d') AS cohort,
        |  CAST(date_diff('day', cw, p) / 7 AS BIGINT) AS period_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM a JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort, period_offset""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .withColumn("t", timestamp_micros(expr("ts DIV 1000")))
      graft.operators.Funnel.cohortRetention(ev, "user_id", "t", "week")
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
          col("period_offset"), col("n_users"))
        .orderBy("cohort", "period_offset")
    },

    // Rolling 7-day distinct users per active day (trailing WAU): the
    // contribution-explode shape — count(DISTINCT) is not
    // window-mergeable, so each distinct (day, user) fans out to the 7
    // report days it supports, then one exact distinct agg per day.
    // Shuffle bounded by |day×user| × 7, never raw events; HLL merge
    // (a20) is the documented swap at scale.
    Q("a26_rolling_uniques",
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |            FROM events),
        |d AS (SELECT DISTINCT day FROM du)
        |SELECT strftime(d.day, '%Y-%m-%d') AS day,
        |  CAST(count(DISTINCT du.user_id) AS BIGINT) AS uniques
        |FROM d JOIN du ON du.day BETWEEN d.day - 6 AND d.day
        |GROUP BY d.day ORDER BY day""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .withColumn("t", timestamp_micros(expr("ts DIV 1000")))
      graft.operators.Funnel.rollingUniques(ev, "user_id", "t",
          windowDays = 7)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("uniques"))
        .orderBy("day")
    },

    // Key-distribution profiling (the pre-join skew audit): per-key count
    // histogram on log2 buckets over the event log's user key. Two-level
    // agg — one shuffle on the key with map-side partials, then <= 64
    // bucket rows.
    Q("s15_key_histogram",
      """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id)
        |SELECT CAST(floor(log2(cnt)) AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(cnt) AS BIGINT) AS n_rows,
        |  CAST(min(cnt) AS BIGINT) AS min_cnt,
        |  CAST(max(cnt) AS BIGINT) AS max_cnt
        |FROM c GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
      graft.operators.Profile.keyHistogram(Tables.events(s, d), col("user_id"))
    },

    // The one-row decision summary: hottest-key share + max/mean skew
    // ratio — the numbers that decide salted vs plain shuffle.
    Q("s15b_skew_stats",
      """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(cnt) AS BIGINT) AS n_rows,
        |  CAST(max(cnt) AS BIGINT) AS max_cnt,
        |  round(quantile_cont(cnt, 0.5), 4) AS p50_cnt,
        |  round(quantile_cont(cnt, 0.99), 4) AS p99_cnt,
        |  round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS top1_share,
        |  round(CAST(max(cnt) AS DOUBLE) * count(*) / sum(cnt), 4) AS skew_ratio
        |FROM c""".stripMargin) { (s, d) =>
      graft.operators.Profile.skewStats(Tables.events(s, d), col("user_id"))
    },

    // J12 (engine ext): AS-OF join — each purchase matched to the user's
    // latest view at-or-before it (attribution). Union + ordered-window
    // plan: ONE shuffle on the key, no inequality-join nested loop.
    // Views pre-aggregated per (user, us) so the match is deterministic;
    // DuckDB's native ASOF JOIN is the oracle.
    Q("j12_asof_join",
      """WITH p AS (SELECT user_id, event_id,
        |    CAST(epoch_us(ts) AS BIGINT) AS us
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us,
        |        max(value) AS view_value
        |      FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT p.user_id, p.event_id,
        |  CAST((p.us - v.us) // 1000000 AS BIGINT) AS lag_s,
        |  round(v.view_value, 2) AS view_value
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND p.us >= v.us
        |ORDER BY p.user_id, p.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts DIV 1000").as("us"), col("value"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select("user_id", "event_id", "us")
      val views = ev.where(col("event_type") === "view")
        .groupBy("user_id", "us").agg(max(col("value")).as("view_value"))
        .withColumn("view_us", col("us"))
      graft.operators.AsOfJoin.asOf(purchases, views,
          keyCols = Seq("user_id"), tsCol = "us",
          payloadCols = Seq("view_value", "view_us"))
        .select(col("user_id"), col("event_id"),
          floor((col("us") - col("view_us")) / 1000000L).cast("long").as("lag_s"),
          round(col("view_value"), 2).as("view_value"))
        .orderBy("user_id", "event_id")
    },

    // J12c: FORWARD as-of — each purchase matched to the user's EARLIEST
    // view at-or-after it ("what did they look at next"). DuckDB ASOF
    // only does backward, so the oracle is the explicit min-ts inequality
    // join + unique (user, us) payload attach.
    Q("j12c_asof_forward",
      """WITH p AS (SELECT user_id, event_id,
        |    CAST(epoch_us(ts) AS BIGINT) AS us
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us,
        |        max(value) AS view_value
        |      FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |m AS (SELECT p.user_id, p.event_id, p.us, min(v.us) AS vus
        |      FROM p LEFT JOIN v ON p.user_id = v.user_id AND v.us >= p.us
        |      GROUP BY 1, 2, 3)
        |SELECT m.user_id, m.event_id,
        |  CAST((m.vus - m.us) // 1000000 AS BIGINT) AS lead_s,
        |  round(v.view_value, 2) AS view_value
        |FROM m LEFT JOIN v ON m.user_id = v.user_id AND m.vus = v.us
        |ORDER BY m.user_id, m.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts DIV 1000").as("us"), col("value"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select("user_id", "event_id", "us")
      val views = ev.where(col("event_type") === "view")
        .groupBy("user_id", "us").agg(max(col("value")).as("view_value"))
        .withColumn("view_us", col("us"))
      graft.operators.AsOfJoin.asOfForward(purchases, views,
          keyCols = Seq("user_id"), tsCol = "us",
          payloadCols = Seq("view_value", "view_us"))
        .select(col("user_id"), col("event_id"),
          floor((col("view_us") - col("us")) / 1000000L).cast("long").as("lead_s"),
          round(col("view_value"), 2).as("view_value"))
        .orderBy("user_id", "event_id")
    },

    // J12b: AS-OF with genuinely-NULL right payloads — a matched view row
    // whose value is nulled out must surface NULL (the match), not an older
    // view's value. Distinguishes true ASOF semantics from per-column
    // last(ignoreNulls) fallthrough; view_us stays non-null on every match
    // as the witness that the row matched.
    Q("j12b_asof_null_payload",
      """WITH p AS (SELECT user_id, event_id,
        |    CAST(epoch_us(ts) AS BIGINT) AS us
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us,
        |        CASE WHEN max(value) < 30 THEN NULL ELSE max(value) END
        |          AS view_value
        |      FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT p.user_id, p.event_id,
        |  CAST((p.us - v.us) // 1000000 AS BIGINT) AS lag_s,
        |  round(v.view_value, 2) AS view_value
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND p.us >= v.us
        |ORDER BY p.user_id, p.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts DIV 1000").as("us"), col("value"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select("user_id", "event_id", "us")
      val views = ev.where(col("event_type") === "view")
        .groupBy("user_id", "us").agg(max(col("value")).as("mv"))
        .select(col("user_id"), col("us"),
          when(col("mv") < 30, lit(null).cast("double"))
            .otherwise(col("mv")).as("view_value"),
          col("us").as("view_us"))
      graft.operators.AsOfJoin.asOf(purchases, views,
          keyCols = Seq("user_id"), tsCol = "us",
          payloadCols = Seq("view_value", "view_us"))
        .select(col("user_id"), col("event_id"),
          floor((col("us") - col("view_us")) / 1000000L).cast("long").as("lag_s"),
          round(col("view_value"), 2).as("view_value"))
        .orderBy("user_id", "event_id")
    },

    // J16: null-safe equi-join (<=> / IS NOT DISTINCT FROM) — NULL keys
    // match each other instead of silently dropping, the semantics a
    // dimension with "unknown" keys needs. Still a hash-partitionable
    // equi-join (Spark plans <=> as a shuffled/broadcast hash join, not a
    // nested loop); nullable keys synthesized via nullif since the
    // testdata ships none.
    Q("j16_nullsafe_join",
      """WITH l AS (SELECT nullif(o_orderstatus, 'O') AS k,
        |             CAST(count(*) AS BIGINT) AS n_left
        |           FROM orders GROUP BY 1),
        |r AS (SELECT nullif(o_orderstatus, 'F') AS k,
        |        CAST(count(*) AS BIGINT) AS n_right
        |      FROM orders GROUP BY 1)
        |SELECT coalesce(l.k, r.k, 'NULLKEY') AS k, n_left, n_right
        |FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
        |ORDER BY k""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val l = o.groupBy(nullif(col("o_orderstatus"), lit("O")).as("k"))
        .agg(count(lit(1)).as("n_left"))
      val r = o.groupBy(nullif(col("o_orderstatus"), lit("F")).as("k"))
        .agg(count(lit(1)).as("n_right"))
      l.join(r, l("k") <=> r("k"))
        .select(coalesce(l("k"), r("k"), lit("NULLKEY")).as("k"),
          col("n_left"), col("n_right"))
        .orderBy("k")
    },

    // J13 (engine ext): range join (point-in-interval) via bucketed
    // equi-join — Catalyst would plan the bare BETWEEN as a broadcast
    // nested loop; bucketing restores a shuffled equi-join with an exact
    // post-filter. Oracle is the plain inequality join.
    Q("j13_range_join",
      """SELECT s_suppkey, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT s_suppkey, s_acctbal AS lo, s_acctbal + 500 AS hi
        |      FROM supplier WHERE s_suppkey <= 100)
        |JOIN (SELECT c_acctbal FROM customer WHERE c_custkey <= 500)
        |  ON c_acctbal BETWEEN lo AND hi
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val intervals = Tables.supplier(s, d).where(col("s_suppkey") <= 100)
        .select(col("s_suppkey"), col("s_acctbal").as("lo"),
          (col("s_acctbal") + 500).as("hi"))
      val points = Tables.customer(s, d).where(col("c_custkey") <= 500)
        .select(col("c_acctbal"))
      graft.operators.RangeJoin.pointInInterval(points, intervals,
          pointCol = "c_acctbal", loCol = "lo", hiCol = "hi",
          bucketWidth = 500.0)
        .groupBy("s_suppkey").agg(count(lit(1)).as("n"))
        .orderBy("s_suppkey")
    },

    // SO: intersect (inherited from Spark; absent in the reference,
    // SURVEY §2.6).
    Q("so4_intersect",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      o.where(col("o_orderstatus") === "F").select("o_custkey")
        .intersect(o.where(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    },

    // Schema-evolution union: merge shards whose schemas drifted (one has
    // p_size, the other p_retailprice) by COLUMN NAME with missing columns
    // null-filled — `unionByName(allowMissingColumns)`, the data-lake
    // shard-merge op a positional UNION would silently corrupt. Sentinels
    // keep every output cell scalar non-null for the gate.
    Q("so6_union_by_name",
      """SELECT p_partkey, p_name,
        |  CAST(coalesce(p_size, -1) AS BIGINT) AS size_or_neg1,
        |  coalesce(p_retailprice, -1.0) AS price_or_neg1, src
        |FROM (
        |  SELECT p_partkey, p_name, p_size, NULL AS p_retailprice, 'a' AS src
        |  FROM part
        |  UNION ALL
        |  SELECT p_partkey, p_name, NULL, p_retailprice, 'b'
        |  FROM part WHERE p_size > 30)
        |ORDER BY src, p_partkey""".stripMargin) { (s, d) =>
      val p = Tables.part(s, d)
      val a = p.select(col("p_partkey"), col("p_name"), col("p_size"),
        lit("a").as("src"))
      val b = p.where(col("p_size") > 30)
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"),
          lit("b").as("src"))
      a.unionByName(b, allowMissingColumns = true)
        .select(col("p_partkey"), col("p_name"),
          coalesce(col("p_size"), lit(-1)).cast("long").as("size_or_neg1"),
          coalesce(col("p_retailprice"), lit(-1.0)).as("price_or_neg1"),
          col("src"))
        .orderBy("src", "p_partkey")
    },

    // A13c: MERGEABLE distinct-count sketches (DataSketches HLL) — the
    // incremental form a13b's scalar approx_count_distinct can't give:
    // per-shard sketches precompute once, re-union forever (daily distinct
    // users over a sharded 100 TB log without re-reading history). Output:
    // per-type estimates + the union-merged global row. Estimates are
    // engine arithmetic → rows-only; merge-consistency and error bounds
    // are asserted in ApproxSpec.
    Q.rowsOnly("a20_hll_mergeable") { (s, d) =>
      val perType = Tables.events(s, d)
        .groupBy("event_type")
        .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      perType
        .select(col("event_type"),
          expr("hll_sketch_estimate(sk)").cast("long").as("est"))
        .union(perType
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
          .select(lit("__all__").as("event_type"), col("est").cast("long")))
        .orderBy("event_type")
    },

    // F16 modern form: VARIANT semi-structured extraction — parse the JSON
    // payload ONCE into Spark's columnar variant binary, then typed path
    // reads (`variant_get`). At 100 TB this replaces per-access string
    // re-parsing (`get_json_object` scans the text per call, s6's form);
    // parse_json + N extractions scans it once. Values must equal the
    // string-path form, which is what the oracle recomputes.
    Q("f19_variant_extract",
      """SELECT event_id, event_type,
        |  TRY_CAST(props->>'k' AS BIGINT) AS k_num,
        |  CAST(props->>'k' IS NOT NULL AS BIGINT) AS has_k
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          expr("try_variant_get(parse_json(props), '$.k', 'bigint')")
            .as("k_num"),
          expr("variant_get(parse_json(props), '$.k', 'string') is not null")
            .cast("long").as("has_k"))
        .orderBy("event_id")
    },

    // F15/F6: KV key formatting + ordered id-list values — the reference's
    // Redis record shape (`'b_similar:%s' % id`, comma-joined ids,
    // simility_books.py:93-94).
    Q("f15_kv_record_format",
      """SELECT 'b_like:' || CAST(o_custkey AS VARCHAR) AS key,
        |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS value
        |FROM orders WHERE o_custkey <= 100
        |GROUP BY o_custkey ORDER BY key""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .where(col("o_custkey") <= 100)
        .groupBy(col("o_custkey"))
        .agg(array_join(sort_array(collect_list(col("o_orderkey"))), ",").as("value"))
        .select(concat(lit("b_like:"), col("o_custkey").cast("string")).as("key"),
          col("value"))
        .orderBy("key")
    },

    // A6/J3: per-user document assembly — explode the user's item set,
    // lookup-join the item dimension, regroup into one ordered
    // space-joined document (the reference's user-doc build,
    // guessLike_u_like.py:31-37,67).
    Q("a6_user_doc_assembly",
      """SELECT o_custkey,
        |  string_agg(DISTINCT p_name, ' ' ORDER BY p_name) AS doc
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN part ON l_partkey = p_partkey
        |WHERE o_custkey <= 150
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).where(col("o_custkey") <= 150)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("o_custkey")
        .agg(array_join(array_sort(collect_set(col("p_name"))), " ").as("doc"))
        .orderBy("o_custkey")
    },

    // J3/A6 through the ACTUAL pipeline operator: Collections.userDocs
    // (explode → lookup join → ordered regroup → whitespace squeeze) over
    // an orders/part-derived user-item universe — the standalone gate for
    // the user-doc assembly stage the model pipeline runs
    // (guessLike_u_like.py:31-37,67); a6 covers the inline SQL shape, this
    // covers the operator itself.
    Q("j3_user_docs_operator",
      """SELECT o_custkey AS userId,
        |  regexp_replace(trim(string_agg(p_name, ' ' ORDER BY p_partkey)),
        |    '\s+', ' ', 'g') AS userDoc
        |FROM (SELECT DISTINCT o_custkey, l_partkey
        |      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |      WHERE o_custkey <= 150)
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY o_custkey ORDER BY userId""".stripMargin) { (s, d) =>
      val userBooks = Tables.orders(s, d).where(col("o_custkey") <= 150)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").as("userId"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("books"))
      val bookDocs = Tables.part(s, d)
        .select(col("p_partkey").as("bookId"), col("p_name").as("doc"))
      graft.prep.Collections.userDocs(userBooks, bookDocs)
        .orderBy("userId")
    },

    // Skew-salted two-phase aggregation: l_returnflag has 3 hot values
    // spanning the whole fact table — the aggregation-skew shape AQE does
    // NOT split (it only handles skewed join partitions). Salting must be
    // value-exact: the oracle is the plain GROUP BY.
    Q("a15_salted_agg",
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      graft.operators.Skew.saltedSum(
          Tables.lineitem(s, d).select("l_returnflag", "l_quantity"),
          Seq("l_returnflag"), "l_quantity", out = "sum_qty", salts = 16)
        .select(col("l_returnflag"), round(col("sum_qty"), 2).as("sum_qty"))
        .orderBy("l_returnflag")
    },

    // Skew-salted join: fact side salted, right side replicated 16x, join
    // on (key, salt) — the manual fix when the hot key sits on the fact
    // side and the right side is too big to broadcast. Value-exact vs the
    // plain join oracle.
    Q("j11_salted_join",
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
      // keep a payload column on the fact side: the content-hash salt
      // needs within-key row diversity to spread a hot key
      graft.operators.Skew.saltedJoin(
          Tables.lineitem(s, d)
            .select(col("l_partkey").as("p_partkey"), col("l_orderkey")),
          Tables.part(s, d).select("p_partkey", "p_brand"),
          key = "p_partkey", salts = 16)
        .groupBy("p_brand").agg(count(lit(1)).as("n"))
        .orderBy("p_brand")
    },

    // F17: chained replace sanitization (the scraper's &nbsp;/brand-word
    // stripping, NB cell-4).
    // Native Jaro-Winkler vs DuckDB's implementation, value-checked on
    // real pairs: each customer name against its successor (high-sim,
    // shared prefix → Winkler boost active) and against its own reversal
    // (low-sim → boost gated off by the 0.7 threshold). Both regimes in
    // one gate certifies the full formula, not just the easy branch.
    Q("f20_jaro_winkler",
      """SELECT a.c_custkey AS c_custkey,
        |  round(jaro_winkler_similarity(a.c_name, b.c_name), 6) AS jw_next,
        |  round(jaro_winkler_similarity(a.c_name, reverse(a.c_name)), 6)
        |    AS jw_rev
        |FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
        |WHERE a.c_custkey < 100 ORDER BY c_custkey""".stripMargin) { (s, d) =>
      import graft.functions.TextFunctions.jaroWinkler
      val c = Tables.customer(s, d).select("c_custkey", "c_name")
      val a = c.where(col("c_custkey") < 100)
        .select(col("c_custkey"), col("c_name").as("na"))
      val b = c.select((col("c_custkey") - 1).as("c_custkey"),
        col("c_name").as("nb"))
      a.join(b, "c_custkey")
        .select(col("c_custkey"),
          round(jaroWinkler(col("na"), col("nb")), 6).as("jw_next"),
          round(jaroWinkler(col("na"), reverse(col("na"))), 6).as("jw_rev"))
        .orderBy("c_custkey")
    },

    Q("f17_chained_replace",
      """SELECT p_partkey,
        |  replace(replace(replace(lower(p_type), 'anodized', 'an.'),
        |    'burnished', 'bu.'), ' ', '_') AS clean_type
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          regexp_replace(regexp_replace(regexp_replace(lower(col("p_type")),
            "anodized", "an."), "burnished", "bu."), " ", "_").as("clean_type"))
        .orderBy("p_partkey")
    },

    // F18: parse a serialized id list back into a typed array — the
    // engine's replacement for the reference's eval() round-trip
    // (guessLike_u_like.py:47,185).
    Q("f18_parse_id_list",
      """SELECT o_custkey,
        |  CAST(len(string_split(ids_csv, ',')) AS BIGINT) AS n_ids,
        |  CAST(string_split(ids_csv, ',')[1] AS BIGINT) AS first_id
        |FROM (SELECT o_custkey,
        |        string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS ids_csv
        |      FROM orders GROUP BY o_custkey)
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(array_join(sort_array(collect_list(col("o_orderkey"))), ",").as("ids_csv"))
        .select(col("o_custkey"),
          size(split(col("ids_csv"), ",")).cast("long").as("n_ids"),
          element_at(split(col("ids_csv"), ","), 1).cast("long").as("first_id"))
        .orderBy("o_custkey")
    },

    // J9: positional zip of two per-group aligned arrays (zip joins
    // disappear relationally — the oracle is the plain aligned-row sum).
    Q("j9_positional_zip",
      """SELECT l_orderkey, round(sum(l_quantity * l_extendedprice), 2) AS dot
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (s, d) =>
      // one collected struct array keeps rows aligned ((orderkey,
      // linenumber) is NOT unique in this data), then zip the projected
      // arrays positionally
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(collect_list(struct(col("l_quantity"), col("l_extendedprice"))).as("qp"))
        .select(col("l_orderkey"),
          round(aggregate(
            zip_with(
              transform(col("qp"), x => x.getField("l_quantity")),
              transform(col("qp"), x => x.getField("l_extendedprice")),
              (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x), 2).as("dot"))
        .orderBy("l_orderkey")
    },

    // W7: seeded pseudo-random backfill pick (the reference's `random 5 hot
    // books`, guessLike_u_like.py:126, made deterministic). xxhash64
    // ordering has no SQL oracle — rows-only; Blend determinism is asserted
    // in DailyLogJobSpec. Output is the comma-joined id list (the KV value
    // shape, F6) so the driver's row checker can sort scalar cells.
    Q.rowsOnly("w7_seeded_backfill") { (s, d) =>
      val hot = Tables.lineitem(s, d)
        .groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("l_partkey").asc).limit(30)
      val hotIds = hot.select("l_partkey").collect().map(_.getLong(0)).sorted
      val hotArr = array(hotIds.map(lit(_)): _*)
      Tables.customer(s, d).where(col("c_custkey") <= 200)
        .select(col("c_custkey"),
          array_join(
            transform(
              graft.rank.Blend.seededHotPick(hotArr, col("c_custkey"), 5, 42L),
              i => i.cast("string")),
            ",").as("backfill"))
        .orderBy("c_custkey")
    },

    // w7's value-checked sibling (the s11b FNV playbook applied to the
    // seeded backfill pick): the per-(candidate, user) sort key becomes
    // FNV-1a-64 over "partkey:custkey", which the oracle replays — the
    // hot-list derivation, each user's full pick ORDER, and the joined
    // output string are all value-checked. xxhash64 (w7) stays the
    // production default.
    Q("w7b_seeded_backfill_fnv",
      s"""WITH hot AS (SELECT l_partkey FROM lineitem GROUP BY l_partkey
         |             ORDER BY count(*) DESC, l_partkey LIMIT 30),
         |cust AS (SELECT c_custkey FROM customer WHERE c_custkey <= 200),
         |pairs AS (SELECT c_custkey, l_partkey,
         |    ${Q.fnvSql("CAST(l_partkey AS VARCHAR) || ':' || CAST(c_custkey AS VARCHAR)")} AS h
         |  FROM cust CROSS JOIN hot),
         |r AS (SELECT c_custkey, l_partkey,
         |    row_number() OVER (PARTITION BY c_custkey ORDER BY h, l_partkey) AS rn
         |  FROM pairs)
         |SELECT c_custkey, string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY rn) AS backfill
         |FROM r WHERE rn <= 5 GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
      val hot = Tables.lineitem(s, d)
        .groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("l_partkey").asc).limit(30)
      val hotIds = hot.select("l_partkey").collect().map(_.getLong(0)).sorted
      val hotArr = array(hotIds.map(lit(_)): _*)
      Tables.customer(s, d).where(col("c_custkey") <= 200)
        .select(col("c_custkey"),
          array_join(
            transform(
              graft.rank.Blend.seededHotPickBy(hotArr, col("c_custkey"), 5,
                (b, u) => column(graft.expressions.Fnv1a64(
                  expression(concat_ws(":", b, u))))),
              i => i.cast("string")),
            ",").as("backfill"))
        .orderBy("c_custkey")
    },

    // A13 scale path: HyperLogLog approximate distinct — the engine's
    // 100 TB counterpart of exact countDistinct (SURVEY §2.4 A13). No SQL
    // oracle (sketch-dependent); ScalaTest asserts <5% error vs exact.
    Q.rowsOnly("a13b_approx_count_distinct") { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .orderBy("event_type")
    },

    // Data-quality constraint audit (Deequ-style): completeness, key
    // uniqueness, domain membership, pattern conformance, and a bound
    // check over `orders`, ALL in one aggregation pass — one scan, one
    // partial+final agg, a constant-size result unpivoted to one row per
    // check. The engine form of the reference's scattered dropna/astype
    // guards (log_analyze.py:21-37).
    Q("dq1_constraint_audit",
      """WITH m AS (SELECT
        |    round(avg(CASE WHEN o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END), 6) AS completeness_custkey,
        |    round(avg(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1.0 ELSE 0.0 END), 6) AS domain_status,
        |    round(CAST(min(o_totalprice) AS DOUBLE), 6) AS min_totalprice,
        |    round(avg(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-') THEN 1.0 ELSE 0.0 END), 6) AS pattern_priority,
        |    round(CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(o_orderkey), 6) AS uniqueness_orderkey
        |  FROM orders),
        |u AS (
        |  SELECT 'completeness_custkey' AS check_name, completeness_custkey AS metric,
        |    CAST(0.99 AS DOUBLE) AS threshold FROM m
        |  UNION ALL SELECT 'domain_status', domain_status, CAST(1.0 AS DOUBLE) FROM m
        |  UNION ALL SELECT 'min_totalprice', min_totalprice, CAST(0.01 AS DOUBLE) FROM m
        |  UNION ALL SELECT 'pattern_priority', pattern_priority, CAST(1.0 AS DOUBLE) FROM m
        |  UNION ALL SELECT 'uniqueness_orderkey', uniqueness_orderkey, CAST(0.999 AS DOUBLE) FROM m)
        |SELECT check_name, metric, threshold,
        |  CAST(metric >= threshold AS BIGINT) AS passed
        |FROM u ORDER BY check_name""".stripMargin) { (s, d) =>
      import graft.operators.Constraints._
      audit(Tables.orders(s, d), Seq(
        Check("completeness_custkey", completeness(col("o_custkey")), 0.99),
        Check("domain_status",
          conformance(col("o_orderstatus").isin("O", "F", "P")), 1.0),
        Check("min_totalprice", minimum(col("o_totalprice")), 0.01),
        Check("pattern_priority",
          conformance(col("o_orderpriority").rlike("^[1-5]-")), 1.0),
        Check("uniqueness_orderkey", uniqueness(col("o_orderkey")), 0.999)))
        .orderBy("check_name")
    },

    // Exact-count stratified sample: exactly min(k, |stratum|) docs per
    // language, membership a pure function of the id — the balanced
    // "n examples per class" cut. WindowGroupLimit plan (bounded per-key
    // heap map-side, <= k rows per stratum through the shuffle). The
    // DuckDB oracle replays the FNV-1a-64 rank hash bit-for-bit, so this
    // gate checks MEMBERSHIP, not just per-stratum counts (same playbook
    // as s14b); production callers use the codegen'd xxhash64 form.
    Q("s20_stratified_fixed_k",
      """WITH h AS (SELECT doc_id, lang,
        |    list_reduce(
        |      list_prepend(CAST(-3750763034362895579 AS BIGINT),
        |        list_transform(regexp_split_to_array(CAST(doc_id AS VARCHAR), ''),
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
        |  FROM documents),
        |k AS (SELECT doc_id, lang,
        |    ((h % 4503599627370496) + 4503599627370496) % 4503599627370496 AS rk
        |  FROM h),
        |r AS (SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY rk, doc_id) AS rn
        |  FROM k)
        |SELECT lang, doc_id FROM r WHERE rn <= 20
        |ORDER BY lang, doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
      val rk = pmod(
        column(graft.expressions.Fnv1a64(
          expression(col("doc_id").cast("string")))), lit(1L << 52))
      graft.operators.Sampling.stratifiedFixedKBy(
          Tables.documents(s, d).select("doc_id", "lang"),
          rk, Seq("lang"), "doc_id", k = 20)
        .select(col("lang"), col("doc_id"))
        .orderBy("lang", "doc_id")
    },

    // J15: SCD2 temporal-dimension lookup — each fact row joined to the
    // dimension version whose effective range covers the fact date (the
    // read side of w15's SCD2 history build). Composition of
    // RangeJoin.pointInInterval with the dimension key as an extra join
    // key: the bucketed equi-join runs on (key, day-bucket), so Catalyst
    // never sees a bare BETWEEN (which would plan a nested loop). The
    // dimension's three versions are derived deterministically in-query;
    // day arithmetic is integer epoch-days in both engines.
    Q("j15_scd2_lookup",
      """WITH dim AS (
        |  SELECT c_custkey, 'v1' AS segment,
        |    date_diff('day', TIMESTAMP '1970-01-01', TIMESTAMP '1992-01-01') AS lo,
        |    date_diff('day', TIMESTAMP '1970-01-01', TIMESTAMP '1995-06-30')
        |      + c_custkey % 90 AS hi
        |  FROM customer WHERE c_custkey <= 1000
        |  UNION ALL
        |  SELECT c_custkey, 'v2',
        |    date_diff('day', TIMESTAMP '1970-01-01', TIMESTAMP '1995-06-30')
        |      + c_custkey % 90 + 1,
        |    date_diff('day', TIMESTAMP '1970-01-01', TIMESTAMP '1997-06-30')
        |      + c_custkey % 120
        |  FROM customer WHERE c_custkey <= 1000
        |  UNION ALL
        |  SELECT c_custkey, 'v3',
        |    date_diff('day', TIMESTAMP '1970-01-01', TIMESTAMP '1997-06-30')
        |      + c_custkey % 120 + 1,
        |    date_diff('day', TIMESTAMP '1970-01-01', TIMESTAMP '1999-12-31')
        |  FROM customer WHERE c_custkey <= 1000),
        |f AS (SELECT o_custkey AS c_custkey,
        |    date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS day,
        |    o_totalprice
        |  FROM orders WHERE o_custkey <= 1000)
        |SELECT segment, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM f JOIN dim ON f.c_custkey = dim.c_custkey
        |  AND f.day BETWEEN dim.lo AND dim.hi
        |GROUP BY segment ORDER BY segment""".stripMargin) { (s, d) =>
      def day(dt: String) =
        datediff(lit(dt).cast("date"), lit("1970-01-01").cast("date"))
      val cust = Tables.customer(s, d).where(col("c_custkey") <= 1000)
        .select(col("c_custkey"),
          (day("1995-06-30") + pmod(col("c_custkey"), lit(90))).as("b1"),
          (day("1997-06-30") + pmod(col("c_custkey"), lit(120))).as("b2"))
      val dim = cust.select(col("c_custkey"), explode(array(
          struct(lit("v1").as("segment"),
            day("1992-01-01").cast("long").as("lo"), col("b1").cast("long").as("hi")),
          struct(lit("v2").as("segment"),
            (col("b1") + 1).cast("long").as("lo"), col("b2").cast("long").as("hi")),
          struct(lit("v3").as("segment"),
            (col("b2") + 1).cast("long").as("lo"),
            day("1999-12-31").cast("long").as("hi")))).as("v"))
        .select(col("c_custkey"), col("v.segment").as("segment"),
          col("v.lo").as("lo"), col("v.hi").as("hi"))
      val facts = Tables.orders(s, d).where(col("o_custkey") <= 1000)
        .select(col("o_custkey").as("c_custkey"),
          datediff(col("o_orderdate"),
            lit("1970-01-01").cast("date")).cast("long").as("day"),
          col("o_totalprice"))
      graft.operators.RangeJoin.pointInInterval(facts, dim,
          pointCol = "day", loCol = "lo", hiCol = "hi",
          bucketWidth = 365.0, keyCols = Seq("c_custkey"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("revenue_cents"))
        .orderBy("segment")
    },

    // J14 (engine ext): interval-overlap join via the bucketed equi-join
    // (j13's shape, both sides exploded; each pair emitted only from the
    // bucket holding its overlap start, so no dedup shuffle). Oracle is
    // the plain overlap-predicate join.
    Q("j14_interval_overlap",
      """SELECT s_suppkey, c_custkey,
        |  round(least(s_acctbal + 300, c_acctbal + 300)
        |        - greatest(s_acctbal, c_acctbal), 2) AS overlap
        |FROM (SELECT s_suppkey, s_acctbal FROM supplier WHERE s_suppkey <= 150)
        |JOIN (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey <= 300)
        |  ON s_acctbal <= c_acctbal + 300 AND c_acctbal <= s_acctbal + 300
        |ORDER BY s_suppkey, c_custkey""".stripMargin) { (s, d) =>
      val sup = Tables.supplier(s, d).where(col("s_suppkey") <= 150)
        .select(col("s_suppkey"), col("s_acctbal").as("lo_a"),
          (col("s_acctbal") + 300).as("hi_a"))
      val cust = Tables.customer(s, d).where(col("c_custkey") <= 300)
        .select(col("c_custkey"), col("c_acctbal").as("lo_b"),
          (col("c_acctbal") + 300).as("hi_b"))
      graft.operators.RangeJoin.intervalOverlap(sup, cust,
          "lo_a", "hi_a", "lo_b", "hi_b", bucketWidth = 300.0)
        .select(col("s_suppkey"), col("c_custkey"),
          round(least(col("hi_a"), col("hi_b"))
            - greatest(col("lo_a"), col("lo_b")), 2).as("overlap"))
        .orderBy("s_suppkey", "c_custkey")
    },
  )
}
