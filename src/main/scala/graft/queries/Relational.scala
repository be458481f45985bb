package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.{TopK, Weighting, RankDiscount}

/** Relational operator inventory queries (SURVEY §2.1-2.6) over the driver's
  * synthetic tables. Each query name carries the SURVEY §2 operator id(s) it
  * exercises. All are pure `functions._` plans — predicate/projection
  * pushdown, broadcast-join selection, partial aggregation, and
  * WindowGroupLimit come from Catalyst.
  */
object Relational {

  val queries: Seq[Q] = Seq(

    // S1/P1: projection + filter pushed down to the parquet scan
    // (reference: `select id,title,author,rating from tbl_book`,
    // simility_books.py:45).
    Q("s1_scan_project",
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |WHERE p_size > 25 ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .where(col("p_size") > 25)
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")
    },

    // S2/J1: dimension-chain equi-join; Catalyst broadcasts the small dims
    // (reference pushed the tag join into MySQL, simility_books.py:37).
    Q("s2_join_scan",
      """SELECT s_suppkey, s_name, n_name, r_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name", "r_name")
        .orderBy("s_suppkey")
    },

    // S3/A4/P6: grouped collect + HAVING, arrays kept native instead of the
    // reference's GROUP_CONCAT→eval round-trip (guessLike_u_like.py:46-47).
    Q("s3_group_collect_having",
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
        |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS orderkeys
        |FROM orders GROUP BY o_custkey HAVING count(*) > 12
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"),
          array_join(sort_array(collect_list(col("o_orderkey"))), ",").as("orderkeys"))
        .where(col("n") > 12)
        .orderBy("o_custkey")
    },

    // S4/W5/J10 (batch form): latest-k per key — the reference's
    // "latest 3 collected books" point query (guessLike_u_like.py:189,203).
    Q("s4_latest_k_per_key",
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey) AS BIGINT) AS rank
        |  FROM orders) WHERE rank <= 3
        |ORDER BY o_custkey, rank""".stripMargin) { (s, d) =>
      TopK.topKPerKey(Tables.orders(s, d), Seq("o_custkey"),
          Seq(col("o_orderdate").desc, col("o_orderkey").asc), 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rank").cast("long"))
        .orderBy("o_custkey", "rank")
    },

    // S5/F14: dated scan — date arithmetic selects the trailing window, the
    // relational analogue of the reference's yesterday-path resolution
    // (log_analyze.py:42-47).
    Q("s5_dated_scan",
      """SELECT o_orderkey, strftime(o_orderdate, '%Y/%m/%d') AS day
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >=
        |  (SELECT CAST(max(o_orderdate) AS DATE) - 7 FROM orders)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val mx = o.agg(max(col("o_orderdate")).cast("date").as("mx"))
      o.crossJoin(broadcast(mx))
        .where(col("o_orderdate").cast("date") >= date_sub(col("mx"), 7))
        .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy/MM/dd").as("day"))
        .orderBy("o_orderkey")
    },

    // S6/F13/F16/K4/P3: tolerant JSON decode — cast failures drop rows,
    // mirroring the reference's skip-bad-lines parser (log_analyze.py:21-37)
    // and eval'd pub/sub payloads (guessLike_u_like.py:185-188).
    Q("s6_json_decode_cast",
      """SELECT event_id, TRY_CAST(props->>'k' AS BIGINT) AS k
        |FROM events
        |WHERE TRY_CAST(props->>'k' AS BIGINT) IS NOT NULL
        |  AND TRY_CAST(props->>'k' AS BIGINT) > 0
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      // try_cast on BOTH sides: plain cast under ANSI mode (Spark 4
      // default) would abort on a malformed value — the exact
      // skip-bad-rows case this operator exists for
      Tables.events(s, d)
        .select(col("event_id"),
          expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("k"))
        .where(col("k").isNotNull && col("k") > 0)
        .orderBy("event_id")
    },

    // P2: null-drop after a null-producing projection (the reference's
    // post-join dropna, simility_books.py:47,52).
    Q("p2_null_drop",
      """SELECT o_orderkey, nullif(o_orderstatus, 'O') AS st
        |FROM orders WHERE nullif(o_orderstatus, 'O') IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), nullif(col("o_orderstatus"), lit("O")).as("st"))
        .na.drop(Seq("st"))
        .orderBy("o_orderkey")
    },

    // J1/A-agg: broadcast fact-dim join + grouped aggregation with map-side
    // partial aggregation; the engine's bread-and-butter shuffle shape.
    Q("j1_broadcast_join_agg",
      """SELECT p_brand,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("p_brand")
    },

    // J2/F5: document assembly by join + weighted concat (the reference
    // doubles the author field: tags+' '+author+' '+author,
    // simility_books.py:50-52).
    Q("j2_doc_assembly",
      """SELECT p_partkey,
        |  lower(p_type) || ' ' || lower(p_brand) || ' ' || lower(p_brand) AS doc
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          concat_ws(" ", lower(col("p_type")), lower(col("p_brand")),
            lower(col("p_brand"))).as("doc"))
        .orderBy("p_partkey")
    },

    // J5/P7: anti-join — "drop already-collected books"
    // (guessLike_u_like.py:210,126).
    Q("j5_anti_join",
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
        |                  AND l_quantity >= 49)
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .join(Tables.lineitem(s, d).where(col("l_quantity") >= 49),
          col("p_partkey") === col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    },

    // J6/P4: semi-join membership filter (guessLike_u_like.py:108-109).
    Q("j6_semi_join",
      """SELECT p_partkey FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
        |              AND l_quantity >= 49)
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .join(Tables.lineitem(s, d).where(col("l_quantity") >= 49),
          col("p_partkey") === col("l_partkey"), "left_semi")
        .select("p_partkey")
        .orderBy("p_partkey")
    },

    // A1/A3: grouped collect with explicit ordering (the reference's
    // collect order came from `ORDER BY bookId` input order — we make it
    // deterministic, SURVEY §4.2).
    Q("a1_group_collect_sorted",
      """SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n,
        |  string_agg(CAST(l_linenumber AS VARCHAR), ' ' ORDER BY l_linenumber) AS lines
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"),
          array_join(sort_array(collect_list(col("l_linenumber"))), " ").as("lines"))
        .orderBy("l_orderkey")
    },

    // A2/F10: per-group min-max bucket weighting — the reference's core tag
    // strength normalization `ceil((n+0.1-min)*4/(max+0.1-min))`
    // (simility_books.py:38), incl. the min==max ⇒ bucket 4 edge.
    Q("a2_minmax_bucket",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(ceil((l_quantity + 0.1 - mn) * 4 / (mx + 0.1 - mn)) AS BIGINT) AS bucket
        |FROM (SELECT l_orderkey, l_linenumber, l_quantity,
        |        min(l_quantity) OVER (PARTITION BY l_orderkey) AS mn,
        |        max(l_quantity) OVER (PARTITION BY l_orderkey) AS mx
        |      FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Weighting.minMaxBucket(Tables.lineitem(s, d), "l_orderkey", "l_quantity")
        .select("l_orderkey", "l_linenumber", "bucket")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // A5/A13/SO3: per-key distinct set, sorted + capped (log_analyze.py:51,57
    // set(bookId) capped at 20).
    Q("a5_collect_set_capped",
      """SELECT user_id, CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
        |  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(countDistinct(col("event_type")).as("n_types"),
          array_join(array_sort(collect_set(col("event_type"))), ",").as("types"))
        .orderBy("user_id")
    },

    // A7/W2: global frequency top-N — "hot books"
    // (guessLike_u_like.py:95-104); plans as partial-agg + TakeOrdered.
    Q("a7_hot_topn",
      """SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY l_partkey
        |ORDER BY cnt DESC, l_partkey LIMIT 30""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("l_partkey").asc)
        .limit(30)
    },

    // A9/F11: rank-discounted vote aggregation — the reference's
    // order-sensitive `score/ln(k+1)` neighbor voting
    // (guessLike_u_like.py:119-124), as window row_number + plain sum.
    Q("a9_rank_discounted_votes",
      """SELECT user_id, event_type, round(sum(value / ln(occ + 1)), 4) AS vote_score
        |FROM (SELECT user_id, event_type, value,
        |        row_number() OVER (PARTITION BY user_id, event_type
        |          ORDER BY ts, event_id) AS occ
        |      FROM events)
        |GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      RankDiscount.discountedVotes(Tables.events(s, d),
          Seq("user_id"), "event_type", "value",
          Seq(col("ts").asc, col("event_id").asc))
        .select(col("user_id"), col("event_type"),
          round(col("vote_score"), 4).as("vote_score"))
        .orderBy("user_id", "event_type")
    },

    // A13: exact + grouped distinct counting.
    Q("a13_count_distinct",
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS users,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // W1: top-k per key over a non-key order — gensim num_best=100 analogue
    // (simility_books.py:62-63); Spark plans WindowGroupLimit.
    Q("w1_topk_per_key",
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_extendedprice DESC, l_linenumber) AS BIGINT) AS rank
        |  FROM lineitem) WHERE rank <= 2
        |ORDER BY l_orderkey, rank""".stripMargin) { (s, d) =>
      TopK.topKPerKey(Tables.lineitem(s, d), Seq("l_orderkey"),
          Seq(col("l_extendedprice").desc, col("l_linenumber").asc), 2)
        .select(col("l_orderkey"), col("l_linenumber"), col("rank").cast("long"))
        .orderBy("l_orderkey", "rank")
    },

    // W2: global sort + limit → TakeOrderedAndProject (no full sort).
    Q("w2_global_topk",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin) { (s, d) =>
      TopK.globalTopK(Tables.orders(s, d),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), 25)
        .select("o_orderkey", "o_totalprice")
    },

    // W3: top-fraction per key with the reference's int() floor semantics
    // (guessLike_u_like.py:114-115).
    Q("w3_top_fraction_per_key",
      """SELECT o_custkey, o_orderkey, CAST(rank AS BIGINT) AS rank FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rank,
        |    count(*) OVER (PARTITION BY o_custkey) AS cnt
        |  FROM orders) WHERE rank <= floor(cnt * 0.1)
        |ORDER BY o_custkey, rank""".stripMargin) { (s, d) =>
      TopK.topFractionPerKey(Tables.orders(s, d), Seq("o_custkey"),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), 0.1)
        .select(col("o_custkey"), col("o_orderkey"), col("rank").cast("long"))
        .orderBy("o_custkey", "rank")
    },

    // SO1: except/difference (guessLike_u_like.py:126,210).
    Q("so1_except",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      o.where(col("o_orderstatus") === "F").select("o_custkey")
        .except(o.where(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    },

    // SO1's BAG-semantics sibling: EXCEPT ALL preserves multiplicity
    // (n occurrences minus m occurrences survive as n−m rows) — the
    // correct difference when rows are events, not sets.
    Q("so8_except_all",
      """SELECT o_custkey FROM
        |  (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |   EXCEPT ALL
        |   SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      o.where(col("o_orderstatus") === "F").select("o_custkey")
        .exceptAll(o.where(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    },

    // SO2: union-distinct (guessLike_u_like.py:126 concat of rec + hot).
    Q("so2_union",
      """SELECT x FROM (
        |  SELECT o_custkey AS x FROM orders WHERE o_totalprice > 400000
        |  UNION SELECT c_custkey AS x FROM customer WHERE c_acctbal > 9900)
        |ORDER BY x""".stripMargin) { (s, d) =>
      Tables.orders(s, d).where(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("x"))
        .union(Tables.customer(s, d).where(col("c_acctbal") > 9900)
          .select(col("c_custkey").as("x")))
        .distinct()
        .orderBy("x")
    },

    // SO3: distinct / dropDuplicates (log_analyze.py:51).
    Q("so3_distinct",
      """SELECT DISTINCT p_brand, p_type FROM part
        |ORDER BY p_brand, p_type""".stripMargin) { (s, d) =>
      Tables.part(s, d).select("p_brand", "p_type").distinct()
        .orderBy("p_brand", "p_type")
    },

    // Bloom-pruned anti-join (100 TB id exclusion): customers with no
    // orders, but the big side probes a broadcast Bloom filter first so
    // definite non-members never enter the shuffle — only possible members
    // (true ∪ ~fpp) take the exact anti-join. Result is EXACTLY the plain
    // anti-join (false negatives impossible), which the oracle states.
    Q("so5_bloom_anti_join",
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 350000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      graft.operators.BloomPrune.antiJoin(
          Tables.customer(s, d).select("c_custkey"),
          Tables.orders(s, d).where(col("o_totalprice") > 350000)
            .select(col("o_custkey").as("c_custkey")),
          "c_custkey", expectedItems = 1L << 16)
        .orderBy("c_custkey")
    },

    // Flagship-style grouped pricing summary (A-family smoke: multi-agg,
    // avg, partial aggregation).
    Q("q1_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Q3-shape shipping-priority: a 3-table selective star join + grouped
    // revenue top-10. Revenue sums in integer CENTS — both engines round
    // the SAME IEEE double per item, then sum exactly — so the result is
    // bit-stable where a floating sum would differ by summation order at
    // 1e-9 relative (right at the checker's tolerance). Catalyst plans
    // broadcast dims + partial aggregation; AQE reorders at runtime.
    Q("q3_shipping_priority",
      """SELECT l_orderkey,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  strftime(o_orderdate, '%Y-%m-%d') AS odate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d)
          .where(col("o_orderdate") < lit("1995-03-15").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d)
          .where(col("l_shipdate") > lit("1995-03-15").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100).cast("long")).as("revenue_cents"))
        .select(col("l_orderkey"), col("revenue_cents"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10)
    },

    // Q5-shape local-supplier revenue: a 6-table snowflake join with the
    // customer-supplier co-nation constraint, grouped by nation. Same
    // integer-cents discipline; region/nation broadcast, the fact join
    // shuffles once on the order key.
    Q("q5_local_supplier",
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue_cents DESC, n_name""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100).cast("long")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("n_name"))
    },

    // Q6-shape forecasting-revenue-change: the pure scan+filter+agg probe —
    // every predicate (date band, discount band, quantity cap) must reach
    // the parquet scan as a pushed filter; no join, no shuffle beyond the
    // single-row final agg. Integer-cents discipline as q1/q3/q5.
    Q("q6_forecast_revenue",
      """SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(round(col("l_extendedprice") * col("l_discount") * 100)
            .cast("long")).as("revenue_cents"),
          count(lit(1)).as("n_lines"))
    },

    // Q10-shape returned-item revenue: top-20 customers by revenue lost to
    // returns in a quarter — fact-fact join shuffles once on the order
    // key, nation broadcast, TakeOrderedAndProject caps the result.
    Q("q10_returned_items",
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1995-10-01'
        |  AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d)
          .where(col("o_orderdate") >= lit("1995-10-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d).where(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100).cast("long")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("c_custkey"))
        .limit(20)
    },

    // Q14-shape promo revenue share: conditional-aggregate ratio over one
    // month — part is a broadcast dim, the date band reaches the lineitem
    // scan, and both sums stay integer cents until one final double
    // division (bit-stable numerator AND denominator).
    Q("q14_promo_revenue",
      """SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |    ELSE 0 END) AS DOUBLE)
        |  / CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |    AS BIGINT)) AS DOUBLE), 6) AS promo_pct,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin) { (s, d) =>
      val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100).cast("long")
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", cents).otherwise(0L))
              .cast("double") /
            sum(cents).cast("double"), 6).as("promo_pct"),
          count(lit(1)).as("n_lines"))
    },

    // Q15-shape top supplier: quarterly revenue per supplier, then the
    // supplier(s) hitting the GLOBAL max — the scalar-subquery
    // decorrelation probe. Spark-first: the revenue aggregate is computed
    // once, its 1-row max is broadcast back as an equi-filter (no second
    // scan of the fact table, no nested-loop subquery). Integer cents
    // keep the max comparison bit-stable.
    Q("q15_top_supplier",
      """WITH rev AS (SELECT l_suppkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |      AS BIGINT)) AS BIGINT) AS total_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1995-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_cents
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_cents = (SELECT max(total_cents) FROM rev)
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100).cast("long")
      val rev = Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(cents).as("total_cents"))
      val mx = rev.agg(max(col("total_cents")).as("mx"))
      rev.join(broadcast(mx), col("total_cents") === col("mx"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_cents"))
        .orderBy("s_suppkey")
    },

    // Q17-shape small-quantity revenue: lines whose quantity is under 20%
    // of their part's average — the correlated-aggregate decorrelation
    // probe, written as the plan Spark SHOULD produce (per-part average
    // aggregated once, joined back; never a per-row subquery). Quantities
    // are integral, so the average is an exact-long sum over a count and
    // the 0.2·avg comparison is bit-stable in both engines.
    Q("q17_small_quantity_revenue",
      """WITH pq AS (SELECT l_partkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) AS avg_q
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS total_cents,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN pq ON pq.l_partkey = lineitem.l_partkey
        |WHERE p_brand IN ('Brand#12', 'Brand#23', 'Brand#34')
        |  AND l_quantity < 0.2 * avg_q""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val pq = li.groupBy(col("l_partkey"))
        .agg((sum(col("l_quantity").cast("long")).cast("double") /
          count(lit(1)).cast("double")).as("avg_q"))
      li.join(broadcast(Tables.part(s, d)
          .where(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))),
          col("l_partkey") === col("p_partkey"))
        .join(pq.withColumnRenamed("l_partkey", "pq_partkey"),
          col("l_partkey") === col("pq_partkey"))
        .where(col("l_quantity") < lit(0.2) * col("avg_q"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("total_cents"),
          count(lit(1)).as("n_lines"))
    },

    // Q19-shape disjunctive revenue: an OR of three conjunctive
    // brand/size/quantity clauses — the predicate shape that breaks
    // naive pushdown (only the per-side residues of the OR tree can
    // reach each scan; the cross-table conjuncts must evaluate
    // post-join). One broadcast dim join, integer-cents total.
    Q("q19_disjunctive_revenue",
      """SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS total_cents,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity >= 1 AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity >= 10 AND l_quantity <= 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin) { (s, d) =>
      def clause(brand: String, sizeHi: Int, qLo: Int, qHi: Int) =
        col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
          col("l_quantity") >= qLo && col("l_quantity") <= qHi
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .where(clause("Brand#12", 5, 1, 11) ||
          clause("Brand#23", 10, 10, 20) ||
          clause("Brand#34", 15, 20, 30))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 100).cast("long")).as("total_cents"),
          count(lit(1)).as("n_lines"))
    },

    // Q12-shape priority audit: among late shipments (shipped >= 60 days
    // after the order date), count high- vs low-priority lines per line
    // status — the two-way conditional aggregate. One fact-fact shuffle on
    // the order key, the date predicate evaluated post-join (it spans both
    // tables), output bounded by |statuses|.
    Q("q12_late_shipments",
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (s, d) =>
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.orders(s, d).select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(Tables.lineitem(s, d)
            .select("l_orderkey", "l_shipdate", "l_linestatus"),
          col("o_orderkey") === col("l_orderkey"))
        .where(col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_count"),
          sum(when(!hi, 1L).otherwise(0L)).as("low_count"))
        .orderBy("l_linestatus")
    },

    // Q18-shape large-volume orders: orders whose total quantity clears a
    // threshold, attached to their customer. The HAVING aggregate runs
    // FIRST (one shuffle on the order key, big shrinks to the qualifying
    // set), then two equi-joins; TakeOrderedAndProject caps the output.
    Q("q18_large_orders",
      """WITH big AS (SELECT l_orderkey, sum(l_quantity) AS qty
        |             FROM lineitem GROUP BY l_orderkey
        |             HAVING sum(l_quantity) > 100)
        |SELECT c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  round(qty, 2) AS qty
        |FROM big JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY qty DESC, o_orderkey LIMIT 50""".stripMargin) { (s, d) =>
      val big = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("qty"))
        .where(col("qty") > 100)
      big.join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          round(col("qty"), 2).as("qty"))
        .orderBy(col("qty").desc, col("o_orderkey"))
        .limit(50)
    },

    // Q4-shape order-priority check: orders with at least one late line
    // (shipped > 90 days after the order date), counted by priority. The
    // EXISTS plans as a LEFT SEMI hash join on the order key with the
    // date comparison as the join filter — each order emitted at most
    // once, no pre-aggregation or distinct needed, both scans
    // column-pruned to the three columns the probe touches. (The
    // testdata carries no commit/receipt dates; the late-line predicate
    // keeps the q4 plan shape on the columns it ships.)
    Q("q4_order_priority",
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
      (s, d) =>
      Tables.orders(s, d).select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(Tables.lineitem(s, d).select("l_orderkey", "l_shipdate"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // Q7-shape volume shipping between two nations: revenue by
    // (supplier nation, customer nation, ship year) for one nation pair
    // in both directions. Fact-to-fact join on the order key carries the
    // shuffle; both nation dims broadcast; the pair filter applies the
    // moment both names are in scope (before the year/volume
    // projection), so non-qualifying rows never reach the aggregate.
    Q("q7_volume_shipping",
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON n1.n_nationkey = s_nationkey
        |JOIN nation n2 ON n2.n_nationkey = c_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, d) =>
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
          "l_discount")
        .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.supplier(s, d)
          .select("s_suppkey", "s_nationkey")),
          col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(Tables.customer(s, d)
          .select("c_custkey", "c_nationkey")),
          col("c_custkey") === col("o_custkey"))
        .join(broadcast(n1), col("s_nk") === col("s_nationkey"))
        .join(broadcast(n2), col("c_nk") === col("c_nationkey"))
        .where((col("supp_nation") === "NATION_1" &&
            col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          2).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
  )
}
