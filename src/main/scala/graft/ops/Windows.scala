package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY §2.5).
  *
  * Parity rules applied throughout:
  *  - every window ORDER BY that feeds row_number/ntile/first/last is
  *    TOTAL (ends in a unique key) — otherwise both engines are free to
  *    order ties differently and the hash-compare is a coin flip;
  *  - rank/dense_rank may use a coarser (tied) ordering — equal rows get
  *    equal ranks in both engines, so that stays deterministic;
  *  - frames are pinned explicitly wherever the engines' defaults could
  *    differ (last_value with the default RANGE frame is the classic trap);
  *  - running/moving sums round the INPUT level first (Q.r2) so the
  *    sequential frame accumulation downstream operates on identical
  *    doubles in both engines.
  *
  * Scale: a window = one shuffle on partitionBy keys + a per-partition
  * sort. Partition keys here (customer, user, brand, segment) have high
  * cardinality — no single-reducer hotspot at 100 TB. None of these use
  * an empty partitionBy (a global window would serialize on one task;
  * the only global ordering in the file is q_win_moving's day-level
  * frame, which operates on ~2.5k aggregated rows, not raw data).
  */
object Windows {

  def defs: Seq[QueryDef] = Seq(

    // row_number (total order) + rank/dense_rank (coarse order with real
    // ties: order-year only).
    Q("q_win_rank",
      """SELECT o_custkey, o_orderkey,
        |       row_number() OVER (PARTITION BY o_custkey ORDER BY year(o_orderdate) DESC, o_orderkey) AS rn,
        |       rank()       OVER (PARTITION BY o_custkey ORDER BY year(o_orderdate) DESC) AS rnk,
        |       dense_rank() OVER (PARTITION BY o_custkey ORDER BY year(o_orderdate) DESC) AS drnk
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val byYearTotal = Window.partitionBy("o_custkey")
        .orderBy(col("yr").desc, col("o_orderkey"))
      val byYear = Window.partitionBy("o_custkey").orderBy(col("yr").desc)
      Tables.load(s, d, "orders")
        .withColumn("yr", year(col("o_orderdate")))
        .select(
          col("o_custkey"), col("o_orderkey"),
          row_number().over(byYearTotal).cast("long").as("rn"),
          rank().over(byYear).cast("long").as("rnk"),
          dense_rank().over(byYear).cast("long").as("drnk"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Top-3 parts by revenue per brand. Revenue is rounded BEFORE ranking
    // so rank ties resolve identically in both engines (then p_partkey
    // breaks exact ties).
    Q("q_win_topk_group",
      """WITH pr AS (
        |  SELECT p_brand, p_partkey,
        |         floor((sum(l_extendedprice * (1 - l_discount)))*100+0.5)/100 AS revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, p_partkey)
        |SELECT p_brand, p_partkey, revenue, rnk
        |FROM (SELECT *, row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rnk
        |      FROM pr)
        |WHERE rnk <= 3
        |ORDER BY p_brand, rnk""".stripMargin) { (s, d) =>
      val pr = Tables.load(s, d, "lineitem")
        .join(Tables.load(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(Q.r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
      val w = Window.partitionBy("p_brand").orderBy(col("revenue").desc, col("p_partkey"))
      pr.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select("p_brand", "p_partkey", "revenue", "rnk")
        .orderBy("p_brand", "rnk")
    },

    // Running revenue per customer. Per-order totalprice comes from
    // parquet (identical bits both sides); the prefix sum accumulates in
    // the same total frame order in both engines, so rounding only the
    // final output is safe.
    Q("q_win_running",
      """SELECT o_custkey, o_orderkey,
        |       floor((sum(o_totalprice) OVER (PARTITION BY o_custkey
        |              ORDER BY o_orderdate, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))*100+0.5)/100 AS running_total
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, d, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          Q.r2(sum(col("o_totalprice")).over(w)).as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // lag/lead of event time per user + gap seconds (whole-second epoch —
    // the only safe cross-engine timestamp representation, SURVEY §7).
    Q("q_win_lag",
      """WITH e AS (SELECT event_id, user_id,
        |                  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
        |           FROM events)
        |SELECT event_id, user_id, es,
        |       lag(es)  OVER (PARTITION BY user_id ORDER BY es, event_id) AS prev_es,
        |       lead(es) OVER (PARTITION BY user_id ORDER BY es, event_id) AS next_es,
        |       es - lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id) AS gap_sec
        |FROM e
        |ORDER BY user_id, es, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("es", "event_id")
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), Q.epochSec(col("ts")).as("es"))
        .select(
          col("event_id"), col("user_id"), col("es"),
          lag(col("es"), 1).over(w).as("prev_es"),
          lead(col("es"), 1).over(w).as("next_es"),
          (col("es") - lag(col("es"), 1).over(w)).as("gap_sec"))
        .orderBy("user_id", "es", "event_id")
    },

    // 7-row moving average of daily revenue. Daily revenue is rounded
    // (r2) so the two engines feed identical doubles into the frame; the
    // moving sum then accumulates identically, and the final avg is r4.
    Q("q_win_moving",
      """WITH daily AS (
        |  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
        |         floor((sum(l_extendedprice * (1 - l_discount)))*100+0.5)/100 AS rev
        |  FROM lineitem GROUP BY 1)
        |SELECT day, rev,
        |       floor((avg(rev) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))*10000+0.5)/10000 AS ma7
        |FROM daily
        |ORDER BY day""".stripMargin) { (s, d) =>
      // group on the (codegen'd) day-truncated timestamp; format the
      // 2.5k aggregated rows, not the 600k input rows
      val daily = Tables.load(s, d, "lineitem")
        .groupBy(date_trunc("day", col("l_shipdate")).as("day_ts"))
        .agg(Q.r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev"))
        .select(date_format(col("day_ts"), "yyyy-MM-dd").as("day"), col("rev"))
      val w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
      daily
        .select(col("day"), col("rev"), Q.r4(avg(col("rev")).over(w)).as("ma7"))
        .orderBy("day")
    },

    // Relative-position window functions. The ORDER BY is total
    // (acctbal, custkey), so percent_rank/cume_dist see no ties and both
    // engines agree exactly; the outputs are small rationals computed as
    // one double division — identical bits — with r6 as belt-and-braces.
    Q("q_win_pctrank",
      """SELECT c_custkey, c_mktsegment,
        |       floor((percent_rank() OVER w)*1000000+0.5)/1000000 AS pct_rank,
        |       floor((cume_dist() OVER w)*1000000+0.5)/1000000 AS cume,
        |       nth_value(c_custkey, 2) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
        |                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_richest
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val order = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
      val full = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.load(s, d, "customer")
        .select(
          col("c_custkey"), col("c_mktsegment"),
          Q.r6(percent_rank().over(order)).as("pct_rank"),
          Q.r6(cume_dist().over(order)).as("cume"),
          nth_value(col("c_custkey"), 2).over(full).as("second_richest"))
        .orderBy("c_custkey")
    },

    // ntile + first_value/last_value with the frame pinned to the whole
    // partition (the default RANGE..CURRENT ROW frame would make
    // last_value == current row — a classic silent-difference trap).
    Q("q_win_ntile_firstlast",
      """SELECT c_custkey, c_mktsegment,
        |       ntile(4) OVER w AS quartile,
        |       first_value(c_custkey) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
        |                                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest,
        |       last_value(c_custkey)  OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
        |                                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val order = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
      val full = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.load(s, d, "customer")
        .select(
          col("c_custkey"), col("c_mktsegment"),
          ntile(4).over(order).cast("long").as("quartile"),
          first(col("c_custkey")).over(full).as("richest"),
          last(col("c_custkey")).over(full).as("poorest"))
        .orderBy("c_custkey")
    },

    // RANGE-framed window: per-user running 10-minute sum — the frame is
    // defined by VALUE distance on epoch seconds, not row offsets, so
    // ties at the same second all see the same frame in both engines
    // (rows-framed prefix sums over non-unique orderings would not
    // agree). Same single user_id shuffle as every window here; the
    // range frame streams over the sorted run without materializing
    // groups.
    Q("q_win_range",
      """SELECT event_id, user_id, es,
        |       floor((sum(value) OVER (PARTITION BY user_id ORDER BY es
        |                               RANGE BETWEEN 600 PRECEDING AND CURRENT ROW))*100+0.5)/100 AS v10m
        |FROM (SELECT event_id, user_id,
        |             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es,
        |             value
        |      FROM events)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("es").rangeBetween(-600, 0)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), Q.epochSec(col("ts")).as("es"), col("value"))
        .withColumn("v10m", Q.r2(sum(col("value")).over(w)))
        .select("event_id", "user_id", "es", "v10m")
        .orderBy("event_id")
    },

    // CDC-style compaction: keep only the LATEST event per
    // (user_id, event_type), ordered by timestamp with event_id as the
    // total tie-break — the "dedup to current version" pass every
    // change-capture pipeline runs. One shuffle on the dedup key; at
    // 100 TB the window never materializes a group (rank streams over
    // the sorted run), and on a date-partitioned layout the same plan
    // compacts each partition independently.
    Q("q_dedup_latest",
      """SELECT user_id, event_type, event_id, es, value FROM (
        |  SELECT user_id, event_type, event_id,
        |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es,
        |         value,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY epoch(date_trunc('second', ts)) DESC, event_id DESC) AS rk
        |  FROM events)
        |WHERE rk = 1
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("es").desc, col("event_id").desc)
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          Q.epochSec(col("ts")).as("es"), col("value"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select("user_id", "event_type", "event_id", "es", "value")
        .orderBy("user_id", "event_type")
    },

    // Running COUNT(DISTINCT) per user — a window Spark has no native
    // form for (DISTINCT aggregates are not allowed OVER); the standard
    // rewrite is size(collect_set() OVER frame). The set is bounded by
    // the event-type domain here; for high-cardinality columns the
    // scale path is an approx sketch (HLL) merged over the frame, or a
    // self-join formulation. Explicit ROWS frame + unique event_id
    // tie-break pin identical frames in both engines; the DuckDB twin
    // mirrors the same list-then-distinct rewrite so the frames stay
    // comparable.
    Q("q_win_distinct",
      """SELECT event_id, user_id,
        |       len(list_distinct(list(event_type) OVER (
        |         PARTITION BY user_id
        |         ORDER BY epoch(date_trunc('second', ts)), event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) AS n_types_seen
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("es"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), Q.epochSec(col("ts")).as("es"),
          col("event_type"))
        .withColumn("n_types_seen", size(collect_set(col("event_type")).over(w)).cast("long"))
        .select("event_id", "user_id", "n_types_seen")
        .orderBy("event_id")
    },

    // The high-cardinality twin of q_win_distinct: the collect_set
    // rewrite above materializes the running SET per row — fine over a
    // bounded domain (event types), quadratic memory over a
    // high-cardinality column. approx_count_distinct's HLL++ buffer is
    // CONSTANT-size per frame whatever the cardinality — the documented
    // 100 TB substitute. The sketch value can't be oracled
    // (engine-specific), so the driver-checked form is the ERROR-BAND
    // audit (r11): both windows run over the SAME frame, the output
    // carries the exact running distinct plus a per-row band verdict
    // the oracle pins as TRUE (band: 1 absolute or 5% relative —
    // HLL++ runs exact sparse mode at this domain size, so the bound
    // has slack even after a regen widens the type domain).
    Q("q_win_distinct_hll",
      """SELECT event_id, user_id,
        |       len(list_distinct(list(event_type) OVER (
        |         PARTITION BY user_id
        |         ORDER BY epoch(date_trunc('second', ts)), event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) AS n_types_seen,
        |       TRUE AS hll_ok
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("es"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), Q.epochSec(col("ts")).as("es"),
          col("event_type"))
        .withColumn("n_types_seen", size(collect_set(col("event_type")).over(w)).cast("long"))
        .withColumn("n_hll", approx_count_distinct(col("event_type"), 0.01).over(w))
        .select(col("event_id"), col("user_id"), col("n_types_seen"),
          (abs(col("n_hll") - col("n_types_seen")) <=
            greatest(lit(1.0), lit(0.05) * col("n_types_seen"))).as("hll_ok"))
        .orderBy("event_id")
    }
  )
}
