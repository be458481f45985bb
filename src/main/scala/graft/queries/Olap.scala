package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** OLAP reporting surface: subtotal lattices (ROLLUP/CUBE), pivot
  * cross-tabs, and quantile binning — the aggregation shapes a reporting
  * layer over the reference's analytics tables (SURVEY §2.4) needs beyond
  * plain GROUP BY. All are single-pass declarative plans: ROLLUP/CUBE run as
  * ONE Expand + partial/final aggregate (not one job per grouping set),
  * pivot is a grouped conditional aggregate, ntile is a per-key window — all
  * partial-agg friendly and AQE-replannable, nothing driver-side.
  */
object Olap {

  val queries: Seq[Q] = Seq(

    // ROLLUP subtotals: (rf, ls), (rf), () in one aggregate. grouping() in
    // the output disambiguates a subtotal row from a genuine group — the
    // standard cell-type discriminator — and grouped-out keys are
    // sentinel'd so every output cell is non-null scalar.
    Q("a16_rollup",
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, rf, ls""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg((grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
            .cast("long").as("gid"),
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("gid"), col("sum_qty"), col("n"))
        .orderBy("gid", "rf", "ls")
    },

    // CUBE: the full 2^k grouping-set lattice, with a DISTINCT aggregate
    // under it (distinct customer count per cell — exact integers, so the
    // oracle comparison is bit-stable).
    Q("a17_cube",
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
        |  coalesce(o_orderpriority, 'ALL') AS pri,
        |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, st, pri""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg((grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
            .cast("long").as("gid"),
          count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("n_cust"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          col("gid"), col("n"), col("n_cust"))
        .orderBy("gid", "st", "pri")
    },

    // Arbitrary GROUPING SETS — the mixed subtotal shape neither ROLLUP
    // (a chain) nor CUBE (the full lattice) expresses: both one-dimension
    // margins plus the full cross, no grand total. Same single
    // Expand + aggregate plan as a16/a17; the set list only changes the
    // Expand projections.
    Q("a25_grouping_sets",
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
        |  coalesce(o_orderpriority, 'ALL') AS pri,
        |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY GROUPING SETS (
        |  (o_orderstatus, o_orderpriority), (o_orderstatus), (o_orderpriority))
        |ORDER BY gid, st, pri""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg((grouping(col("o_orderstatus")) * 2 +
            grouping(col("o_orderpriority"))).cast("long").as("gid"),
          count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          col("gid"), col("n"), col("revenue"))
        .orderBy("gid", "st", "pri")
    },

    // Unpivot / melt — wide metrics to (name, value) rows, the reshape
    // feeding generic per-metric aggregation and the Observe/Constraints
    // unpivoted-report shape. Spark's native unpivot (an Expand, no
    // shuffle at all); values cast to one type up front.
    Q("so9_unpivot",
      """SELECT l_orderkey, l_linenumber, name, value FROM (
        |  UNPIVOT (SELECT l_orderkey, l_linenumber,
        |             CAST(l_quantity AS DOUBLE) AS l_quantity,
        |             CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
        |             CAST(l_discount AS DOUBLE) AS l_discount
        |           FROM lineitem WHERE l_orderkey < 400)
        |  ON l_quantity, l_extendedprice, l_discount
        |  INTO NAME name VALUE value)
        |ORDER BY l_orderkey, l_linenumber, name""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_orderkey") < 400)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("l_quantity"),
          col("l_extendedprice").cast("double").as("l_extendedprice"),
          col("l_discount").cast("double").as("l_discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "name", "value")
        .orderBy("l_orderkey", "l_linenumber", "name")
    },

    // Pivot cross-tab: order-status counts spread into columns per
    // priority. Explicit value list (the Spark form that skips the extra
    // distinct-values job — at scale the value list is knowledge the
    // caller has); absent cells are 0, not null.
    Q("a18_pivot",
      """SELECT o_orderpriority,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS "F",
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS "O",
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS "P"
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .orderBy("o_orderpriority")
    },

    // Quantile binning: ntile quartiles per size class. PARTITIONED window
    // (one shuffle on the key, no global sort) — the form that scales; a
    // global ntile would serialize the corpus through one partition. The
    // (price, partkey) order key is total, so bucket assignment is
    // deterministic.
    // Top-k per key WITH TIES — rank() semantics, the complement of w1's
    // row_number cut: all rows tying the k-th value survive, so the
    // result is order-deterministic without a tiebreaker column. Plans
    // WindowGroupLimit exactly like w1 (rank is supported).
    Q("w17_topk_with_ties",
      """SELECT l_returnflag, l_quantity,
        |  CAST(rnk AS BIGINT) AS rnk, CAST(n AS BIGINT) AS n
        |FROM (SELECT l_returnflag, l_quantity,
        |        rank() OVER (PARTITION BY l_returnflag
        |                     ORDER BY l_quantity DESC) AS rnk,
        |        count(*) AS n
        |      FROM lineitem GROUP BY l_returnflag, l_quantity)
        |WHERE rnk <= 3 ORDER BY l_returnflag, rnk""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val grouped = Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("n"))
      grouped
        .withColumn("rnk", rank().over(
          Window.partitionBy("l_returnflag").orderBy(col("l_quantity").desc)))
        .where(col("rnk") <= 3)
        .select(col("l_returnflag"), col("l_quantity"),
          col("rnk").cast("long").as("rnk"), col("n").cast("long").as("n"))
        .orderBy("l_returnflag", "rnk")
    },

    // Equi-WIDTH histogram (the profiling complement of ml5's equi-depth
    // bins): fixed-width buckets over a global min/max — one stats pass,
    // broadcast back, one aggregate. Bucket ids are exact integer math on
    // rounded bounds so both engines bin identically.
    Q("a27_histogram",
      """WITH s AS (SELECT round(min(c_acctbal), 2) AS lo,
        |             round(max(c_acctbal), 2) AS hi FROM customer)
        |SELECT CAST(least(floor((c_acctbal - lo) / ((hi - lo) / 16)), 15)
        |         AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(min(c_acctbal), 2) AS b_min,
        |  round(max(c_acctbal), 2) AS b_max
        |FROM customer, s
        |GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d).select("c_acctbal")
      val stats = cust.agg(round(min(col("c_acctbal")), 2).as("lo"),
        round(max(col("c_acctbal")), 2).as("hi"))
      cust.crossJoin(broadcast(stats))
        .select(least(floor((col("c_acctbal") - col("lo")) /
            ((col("hi") - col("lo")) / 16)), lit(15)).cast("long")
            .as("bucket"),
          col("c_acctbal"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          round(min(col("c_acctbal")), 2).as("b_min"),
          round(max(col("c_acctbal")), 2).as("b_max"))
        .orderBy("bucket")
    },

    Q("w8_ntile",
      """SELECT p_size, p_partkey,
        |  CAST(ntile(4) OVER (PARTITION BY p_size
        |    ORDER BY p_retailprice, p_partkey) AS BIGINT) AS quartile
        |FROM part ORDER BY p_size, p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .select(col("p_size"), col("p_partkey"),
          ntile(4).over(Window.partitionBy("p_size")
              .orderBy(col("p_retailprice"), col("p_partkey")))
            .cast("long").as("quartile"))
        .orderBy("p_size", "p_partkey")
    },

    // ROWS-frame running aggregate: trailing-3-shipment quantity per
    // supplier. The frame accumulates sequentially inside each per-key
    // sorted partition — one shuffle on the key, no whole-table sort — and
    // the (shipdate, orderkey, linenumber) order key is total, so frame
    // contents (hence sums) are engine-independent.
    Q("w9_moving_sum",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(sum(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mv_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity")).over(
              Window.partitionBy("l_suppkey")
                .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
                .rowsBetween(-2, Window.currentRow))
            .cast("long").as("mv_qty"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },

    // lag/lead across a per-key ordered sequence: days since the
    // customer's previous order, and the next order's key — the
    // event-sequence feature shape (inter-arrival times, next-action
    // labels) a training pipeline derives constantly. Partition edges
    // surface as -1 sentinels so every cell stays scalar non-null.
    Q("w10_lag_lead",
      """SELECT o_custkey, o_orderkey,
        |  CAST(coalesce(date_diff('day',
        |    CAST(lag(o_orderdate) OVER w AS DATE),
        |    CAST(o_orderdate AS DATE)), -1) AS BIGINT) AS days_since_prev,
        |  CAST(coalesce(lead(o_orderkey) OVER w, -1) AS BIGINT) AS next_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          coalesce(
            datediff(col("o_orderdate").cast("date"),
              lag(col("o_orderdate"), 1).over(w).cast("date")).cast("long"),
            lit(-1L)).as("days_since_prev"),
          coalesce(lead(col("o_orderkey"), 1).over(w), lit(-1L))
            .cast("long").as("next_order"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Time-series gap-fill: densify each customer's sparse daily order
    // counts to one row per day of their active range, carrying the last
    // count forward (Resample operator — per-key scaffold, no global time
    // axis). Bounded to 20 customers so the gate output stays small; the
    // day is emitted as a formatted string (never a raw timestamp).
    Q("w11_gap_fill",
      """WITH b AS (SELECT o_custkey AS k, CAST(o_orderdate AS DATE) AS d,
        |    count(*) AS n FROM orders WHERE o_custkey < 20 GROUP BY 1, 2),
        |r AS (SELECT k, min(d) AS lo, max(d) AS hi FROM b GROUP BY 1),
        |scaffold AS (SELECT k,
        |    CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM r),
        |j AS (SELECT s.k, s.d, b.n FROM scaffold s LEFT JOIN b USING (k, d))
        |SELECT k, strftime(d, '%Y-%m-%d') AS day,
        |  CAST(last_value(n IGNORE NULLS) OVER (PARTITION BY k ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_filled,
        |  CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS BIGINT) AS was_gap
        |FROM j ORDER BY k, day""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .where(col("o_custkey") < 20)
        .groupBy(col("o_custkey").as("k"),
          col("o_orderdate").cast("date").as("d"))
        .agg(count(lit(1)).as("n"))
      graft.operators.Resample.gapFillDaily(daily, "k", "d", "n")
        .select(col("k"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n_filled"), col("was_gap"))
        .orderBy("k", "day")
    },

    // Time-RANGE window frame (w9's time-based sibling): trailing 7-DAY
    // quantity per supplier — the frame is bounded by the ORDER-BY value
    // (day number), not a row count, so same-day peers are all included
    // and the result is deterministic without a total tie-break order.
    Q("w12_trailing_time_window",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(sum(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS qty_7d
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .withColumn("day_num",
          datediff(col("l_shipdate").cast("date"), lit("1970-01-01")))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity")).over(
              Window.partitionBy("l_suppkey").orderBy("day_num")
                .rangeBetween(-6, Window.currentRow))
            .cast("long").as("qty_7d"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },

    // Group-wise winsorization: clip a heavy-tailed metric to its group's
    // [p05, p95] — outlier control before feature scaling. EXACT
    // interpolated percentiles per group (one partial+final agg over ≤
    // |groups| rows) broadcast back onto the fact rows; identical
    // interpolation rule to the oracle's quantile_cont (t7 precedent).
    Q("a19_winsorize",
      """WITH q AS (SELECT l_returnflag AS rf,
        |    quantile_cont(l_extendedprice, 0.05) AS lo,
        |    quantile_cont(l_extendedprice, 0.95) AS hi
        |  FROM lineitem GROUP BY 1)
        |SELECT l_orderkey, l_linenumber,
        |  round(least(greatest(l_extendedprice, lo), hi), 4) AS clipped
        |FROM lineitem JOIN q ON l_returnflag = rf
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val q = li.groupBy(col("l_returnflag").as("rf"))
        .agg(expr("percentile(l_extendedprice, 0.05)").as("lo"),
          expr("percentile(l_extendedprice, 0.95)").as("hi"))
      li.join(broadcast(q), col("l_returnflag") === col("rf"))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(least(greatest(col("l_extendedprice"), col("lo")), col("hi")), 4)
            .as("clipped"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Bivariate statistics per group: correlation, sample covariance,
    // sample stddev — the feature-audit aggregates (collinearity checks,
    // scale estimation) computed as ONE partial+final pass. Both engines
    // use numerically-stable merge formulas; rounding absorbs the ~1e-12
    // relative noise parallel summation order introduces.
    Q("a21_correlation",
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        |  round(covar_samp(l_quantity, l_discount), 8) AS qty_disc_cov,
        |  round(stddev_samp(l_extendedprice), 2) AS price_sd
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6)
            .as("qty_price_corr"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 8)
            .as("qty_disc_cov"),
          round(stddev_samp(col("l_extendedprice")), 2).as("price_sd"))
        .orderBy("l_returnflag")
    },

    // Truncated EWMA sequence feature (8-term, α = 0.5): the trailing
    // exponentially-weighted smoother every feature pipeline derives from
    // event sequences. α is DYADIC so every weight (0.5, 0.25, …) is an
    // exact double and the left-associated weighted sum is bit-identical
    // in both engines — no pow() ulp drift. Missing lags contribute 0
    // (truncated form); one window shuffle per key.
    Q("w13_ewma",
      """WITH t AS (SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |    date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS d
        |  FROM lineitem)
        |SELECT l_suppkey, l_orderkey, l_linenumber,
        |  round(0.5 * l_quantity
        |    + 0.25 * coalesce(lag(l_quantity, 1) OVER w, 0)
        |    + 0.125 * coalesce(lag(l_quantity, 2) OVER w, 0)
        |    + 0.0625 * coalesce(lag(l_quantity, 3) OVER w, 0)
        |    + 0.03125 * coalesce(lag(l_quantity, 4) OVER w, 0)
        |    + 0.015625 * coalesce(lag(l_quantity, 5) OVER w, 0)
        |    + 0.0078125 * coalesce(lag(l_quantity, 6) OVER w, 0)
        |    + 0.00390625 * coalesce(lag(l_quantity, 7) OVER w, 0), 6) AS ewma
        |FROM t
        |WINDOW w AS (PARTITION BY l_suppkey
        |             ORDER BY d, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("l_suppkey")
        .orderBy("day_num", "l_orderkey", "l_linenumber")
      val terms = (0 until 8).map { j =>
        val wt = math.pow(0.5, j + 1)   // dyadic: exact in both engines
        coalesce(lag(col("l_quantity"), j).over(w), lit(0.0)) * lit(wt)
      }
      Tables.lineitem(s, d)
        .withColumn("day_num",
          datediff(col("l_shipdate").cast("date"), lit("1970-01-01")))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          round(terms.reduceLeft(_ + _), 6).as("ewma"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },

    // Robust outlier flagging via MAD (Iglewicz-Hoaglin modified z-score):
    // med and MAD are exact interpolated percentiles per group (two
    // partial+final passes over <= |groups| rows each, broadcast back),
    // flag |0.6745·(x-med)/MAD| > 3.5. The robust scaler a pipeline runs
    // where winsorize (a19) is too blunt.
    Q("w14_mad_outliers",
      """WITH m AS (SELECT l_returnflag AS rf,
        |    quantile_cont(l_extendedprice, 0.5) AS med
        |  FROM lineitem GROUP BY 1),
        |md AS (SELECT rf, med,
        |    (SELECT quantile_cont(abs(l.l_extendedprice - m2.med), 0.5)
        |     FROM lineitem l JOIN m m2 ON l.l_returnflag = m2.rf
        |     WHERE m2.rf = m.rf) AS mad
        |  FROM m)
        |SELECT l_orderkey, l_linenumber,
        |  round(0.6745 * (l_extendedprice - med) / mad, 6) AS z,
        |  CAST(CASE WHEN abs(0.6745 * (l_extendedprice - med) / mad) > 1.2
        |       THEN 1 ELSE 0 END AS BIGINT) AS flagged
        |FROM lineitem JOIN md ON l_returnflag = rf
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val med = li.groupBy(col("l_returnflag").as("rf"))
        .agg(expr("percentile(l_extendedprice, 0.5)").as("med"))
      val mad = li.join(broadcast(med), col("l_returnflag") === col("rf"))
        .groupBy("rf", "med")
        .agg(expr("percentile(abs(l_extendedprice - med), 0.5)").as("mad"))
      val z = lit(0.6745) * (col("l_extendedprice") - col("med")) / col("mad")
      // flag threshold 1.2 (not the textbook 3.5): the synthetic prices
      // are near-uniform, whose |z| maxes at ~1.35 — 3.5 would make the
      // flag column constant and gate nothing
      li.join(broadcast(mad), col("l_returnflag") === col("rf"))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(z, 6).as("z"),
          when(abs(z) > 1.2, 1L).otherwise(0L).as("flagged"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // SCD Type-2 history compression: collapse each customer's order
    // stream to validity intervals of o_orderpriority — a row opens an
    // interval iff the priority differs from its predecessor in
    // (o_orderdate, o_orderkey) order; valid_to = the next interval's
    // valid_from (null = current). Two windows over one (key, order)
    // partitioning → one shuffle + one sort.
    Q("w15_scd2_history",
      """WITH w AS (SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
        |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |o AS (SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority
        |      FROM w WHERE prev IS NULL OR prev <> o_orderpriority),
        |v AS (SELECT o_custkey, o_orderkey, o_orderpriority,
        |        o_orderdate AS valid_from,
        |        lead(o_orderdate) OVER (PARTITION BY o_custkey
        |            ORDER BY o_orderdate, o_orderkey) AS valid_to
        |      FROM o)
        |SELECT o_custkey, o_orderkey, o_orderpriority, valid_from, valid_to
        |FROM v ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      graft.operators.Scd.scd2(Tables.orders(s, d), "o_custkey",
          orderCols = Seq(col("o_orderdate"), col("o_orderkey")),
          versionCol = "o_orderdate",
          attrCols = Seq("o_orderpriority"),
          carryCols = Seq("o_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority"),
          col("valid_from"), col("valid_to"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Fixed-iteration PageRank over the customer→supplier fulfillment
    // graph (id spaces disambiguated as 2k / 2k+1) — the link-graph
    // quality signal of web-corpus curation, 3 iterations, d = 0.85.
    // The oracle unrolls the exact iteration formula as CTEs; parallel
    // float-summation reorder noise is ~1e-15, far inside the checker's
    // 1e-9 tolerance.
    Q("g1_pagerank",
      """WITH e AS (SELECT DISTINCT o_custkey * 2 AS src,
        |    l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |outd AS (SELECT src, CAST(count(*) AS DOUBLE) AS outd
        |         FROM e GROUP BY src),
        |p0 AS (SELECT v, 1.0 / n AS pr FROM nodes CROSS JOIN nn),
        |c1 AS (SELECT e.dst AS v, sum(p0.pr / outd.outd) AS c
        |       FROM e JOIN p0 ON e.src = p0.v JOIN outd ON e.src = outd.src
        |       GROUP BY e.dst),
        |p1 AS (SELECT nodes.v, 0.15 / n + 0.85 * coalesce(c1.c, 0) AS pr
        |       FROM nodes CROSS JOIN nn LEFT JOIN c1 ON nodes.v = c1.v),
        |c2 AS (SELECT e.dst AS v, sum(p1.pr / outd.outd) AS c
        |       FROM e JOIN p1 ON e.src = p1.v JOIN outd ON e.src = outd.src
        |       GROUP BY e.dst),
        |p2 AS (SELECT nodes.v, 0.15 / n + 0.85 * coalesce(c2.c, 0) AS pr
        |       FROM nodes CROSS JOIN nn LEFT JOIN c2 ON nodes.v = c2.v),
        |c3 AS (SELECT e.dst AS v, sum(p2.pr / outd.outd) AS c
        |       FROM e JOIN p2 ON e.src = p2.v JOIN outd ON e.src = outd.src
        |       GROUP BY e.dst),
        |p3 AS (SELECT nodes.v, 0.15 / n + 0.85 * coalesce(c3.c, 0) AS pr
        |       FROM nodes CROSS JOIN nn LEFT JOIN c3 ON nodes.v = c3.v)
        |SELECT v, round(pr, 9) AS pr FROM p3 ORDER BY v""".stripMargin) { (s, d) =>
      val edges = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      graft.operators.PageRank.pageRank(edges, "src", "dst",
          iterations = 3, damping = 0.85)
        .select(col("v"), round(col("pr"), 9).as("pr"))
        .orderBy("v")
    },

    // Per-vertex triangle counts on the part co-occurrence graph, via
    // degree-oriented wedge closing (out-degree bounded by O(√|E|) per
    // vertex, join fanout O(|E|^1.5) even on hub-skewed graphs). The
    // oracle replays degrees, orientation, and both joins verbatim.
    Q("g3_triangle_counts",
      """WITH e0 AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |       FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |       WHERE a.l_orderkey < 300 AND a.l_partkey < b.l_partkey),
        |deg AS (SELECT v, count(*) AS d FROM
        |         (SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0) GROUP BY v),
        |o AS (SELECT
        |    CASE WHEN da.d < db.d OR (da.d = db.d AND e0.a < e0.b)
        |         THEN e0.a ELSE e0.b END AS f,
        |    CASE WHEN da.d < db.d OR (da.d = db.d AND e0.a < e0.b)
        |         THEN e0.b ELSE e0.a END AS t
        |  FROM e0 JOIN deg da ON e0.a = da.v JOIN deg db ON e0.b = db.v),
        |tri AS (SELECT o1.f AS x, o1.t AS y, o2.t AS z
        |        FROM o o1 JOIN o o2 ON o1.t = o2.f
        |        JOIN o o3 ON o3.f = o1.f AND o3.t = o2.t)
        |SELECT v, CAST(count(*) AS BIGINT) AS n_triangles FROM
        |  (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri
        |   UNION ALL SELECT z FROM tri)
        |GROUP BY v ORDER BY v""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d).where(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
      graft.operators.Graph.triangleCounts(edges, "src", "dst")
        .orderBy("v")
    },

    // Per-stratum rank calibration: percent_rank + cume_dist of document
    // length within each language (quantile-transform features without a
    // global sort — the window partitions on the stratum, so parallelism
    // is per-language; cross-stratum global transforms use the t24
    // percentile-join shape instead).
    Q("w16_rank_calibration",
      """SELECT doc_id, lang,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM documents
        |WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy("doc_id")
    },

    // Connected components over a part co-occurrence graph (parts bought
    // together in one order): full (id, component) membership with the
    // smallest reachable id as the canonical component label — the
    // standalone form of the cluster resolution dedupCorpus embeds. The
    // oracle recomputes components from first principles via a
    // reachability recursive CTE (min reachable id = component).
    Q("g2_connected_components",
      """WITH RECURSIVE
        |e0 AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |       FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |       WHERE a.l_orderkey < 300 AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
        |cc AS (
        |  SELECT a AS id, a AS reach FROM edges
        |  UNION
        |  SELECT cc.id, edges.b AS reach FROM cc JOIN edges ON cc.reach = edges.a)
        |SELECT id, CAST(min(reach) AS BIGINT) AS component
        |FROM cc GROUP BY id ORDER BY id""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d).where(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
      graft.operators.Graph.connectedComponents(edges, "src", "dst")
        .orderBy("id")
    },

    // Typed Aggregator surface (SURVEY §2.9 bucket 4): per-nation top-3
    // customers by balance via [[graft.functions.Aggregators.TopKByScore]]
    // — a k-BOUNDED single-pass object aggregation (partial buffers carry
    // at most k items per key into the shuffle; the Dataset-native
    // counterpart of WindowGroupLimit). The ordering (score desc, id asc)
    // is total, so merge order cannot change the result and the window-
    // form SQL oracle hash-matches exactly.
    Q("a28_typed_topk",
      """WITH ranked AS (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey) AS rnk
        |  FROM customer)
        |SELECT CAST(c_nationkey AS BIGINT) AS nation, CAST(rnk AS BIGINT) AS rnk,
        |  c_custkey, round(c_acctbal, 2) AS acctbal
        |FROM ranked WHERE rnk <= 3 ORDER BY nation, rnk""".stripMargin) { (s, d) =>
      import s.implicits._
      import graft.functions.Aggregators.{Scored, TopKByScore}
      Tables.customer(s, d)
        .select(col("c_nationkey").cast("long").as("_1"),
          col("c_custkey").as("_2"), col("c_acctbal").as("_3"))
        .as[(Long, Long, Double)]
        .groupByKey(_._1)
        .mapValues(t => Scored(t._2, t._3))
        .agg(new TopKByScore(3).toColumn.name("top"))
        .flatMap { case (nation, tops) =>
          tops.zipWithIndex.map { case (sc, i) =>
            (nation, (i + 1).toLong, sc.id, sc.score) } }
        .toDF("nation", "rnk", "c_custkey", "acctbal")
        .select(col("nation"), col("rnk"), col("c_custkey"),
          round(col("acctbal"), 2).as("acctbal"))
        .orderBy("nation", "rnk")
    },

    // Multi-source BFS hop distances on the same co-occurrence graph
    // (sources = vertices with id < 100, 3 hops) — "how far is every
    // part from the seed set", the reachability primitive behind
    // link-graph crawl frontiers and contamination blast-radius audits.
    // Level-synchronous frontier expansion: per-hop shuffle volume is the
    // frontier's adjacency, never the graph; the oracle recomputes min
    // hop distance from first principles via a recursive CTE.
    Q("g4_bfs_distances",
      """WITH RECURSIVE
        |e0 AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |       FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |       WHERE a.l_orderkey < 300 AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT a AS src, b AS dst FROM e0
        |          UNION ALL SELECT b AS src, a AS dst FROM e0),
        |s AS (SELECT DISTINCT src AS id FROM edges WHERE src < 100),
        |bfs AS (
        |  SELECT id, 0 AS d FROM s
        |  UNION
        |  SELECT edges.dst AS id, bfs.d + 1 AS d
        |  FROM bfs JOIN edges ON bfs.id = edges.src WHERE bfs.d < 3)
        |SELECT id, CAST(min(d) AS BIGINT) AS dist
        |FROM bfs GROUP BY id ORDER BY id""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d).where(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_partkey"))
      val e0 = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
      val edges = e0.unionAll(
        e0.select(col("dst").as("src"), col("src").as("dst")))
      val sources = edges.select(col("src")).where(col("src") < 100)
      graft.operators.Graph.bfsDistances(edges, "src", "dst",
          sources, "src", maxHops = 3)
        .orderBy("id")
    }
  )
}
