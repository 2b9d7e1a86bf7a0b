package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Product/behavioral analytics over `events` and `lineitem` (round-5
  * SURVEY §2 extensions): conversion funnel, cohort retention, numeric
  * histogram, z-score anomaly flagging.
  *
  * Scale shapes (the design rule for every op here):
  *  - funnel + retention shuffle ONCE on `user_id` and keep that
  *    partitioning through every later stage (stacked windows / agg /
  *    self-join all reuse it);
  *  - histogram is a map-side bucket projection into a fixed number of
  *    groups — shuffle volume is |buckets|, independent of corpus;
  *  - anomaly joins the corpus against a BOUNDED per-type stats table
  *    (broadcast) — the fact side is never shuffled.
  */
object Analytics {

  /** Histogram layout over l_extendedprice: fixed [Lo, Lo + NBuckets·W)
    * grid, final bucket also absorbs the overflow tail via least().
    * Arithmetic bucketing instead of width_bucket keeps the exact same
    * expression runnable on both engines. */
  private val HistLo = 900.0
  private val HistWidth = 5205.0
  private val HistBuckets = 20

  /** Exact-percentile fold over a (event_type, c, k) cents-domain
    * count grid — ONE home for batch q_tail_exact and the streaming
    * s_tail read-time view (streaming.Streams.tailCounts maintains the
    * grid incrementally; percentiles aren't mergeable state, counts
    * are — the s_cat_entropy split). Each percentile is the first
    * integer ECDF crossing cum ≥ ⌈q·n⌉; the grid is bounded by the
    * VALUE DOMAIN, never the corpus/stream length. */
  private[graft] def tailFold(grid: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val we = Window.partitionBy("event_type")
    val w = grid
      .withColumn("cum", sum("k").over(we.orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum("k").over(we))
    def firstCross(q: Double) =
      min(when(col("cum") >= ceil(lit(q) * col("n")).cast("long"), col("c")))
    w.groupBy("event_type")
      .agg(max("n").as("n"), firstCross(0.50).as("p50c"),
        firstCross(0.95).as("p95c"), firstCross(0.99).as("p99c"))
      .select(col("event_type"), col("n"),
        Q.r2(col("p50c") / 100.0).as("p50_usd"),
        Q.r2(col("p95c") / 100.0).as("p95_usd"),
        Q.r2(col("p99c") / 100.0).as("p99_usd"))
      .orderBy("event_type")
  }

  /** The WoE/IV fold over a (p_brand, n_good, n_bad) risk grid — ONE
    * home shared by batch q_woe_iv and the s_woe_iv streaming
    * read-time view (the grid is the mergeable state: per-brand
    * good/bad counters; shares, WoE and IV re-price globally as
    * totals move, so they divide out at read time over the
    * \|brands\|-row frame). */
  private[graft] def woeOf(g: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val t = g
      .withColumn("gt", sum("n_good").over(Window.partitionBy()))
      .withColumn("bt", sum("n_bad").over(Window.partitionBy()))
      .withColumn("k", count(lit(1)).over(Window.partitionBy()))
    val gs = (col("n_good") + 0.5) / (col("gt") + lit(0.5) * col("k"))
    val bs = (col("n_bad") + 0.5) / (col("bt") + lit(0.5) * col("k"))
    val woe = log(gs / bs)
    t.withColumn("woe", woe)
      .withColumn("iv9", floor((gs - bs) * woe * 1e9 + 0.5).cast("long"))
      .withColumn("ivt9", sum("iv9").over(Window.partitionBy()))
      .select(col("p_brand"), col("n_good"), col("n_bad"),
        Q.r6(col("woe")).as("woe"),
        Q.r6(col("iv9") / lit(1e9)).as("iv_term"),
        Q.r6(col("ivt9") / lit(1e9)).as("iv"))
      .orderBy("p_brand")
  }

  /** q_markov_attribution's per-removal-chain transition list (chain,
    * cur, nxt, p12 on the 1e-12 lattice): pre-purchase journeys →
    * transition counts → row-normalized probabilities → one removal
    * variant per channel, absorbing states appended. ONE home so the
    * in-row markov_conv_reach fold and TwinAndPropertySpec's
    * old-formulation (12 join rounds) equivalence test share the exact
    * same input frame. */
  private[graft] def markovTransitions(s: SparkSession, d: String): DataFrame = {
    val wu = Window.partitionBy("user_id")
      .orderBy(col("es") * Q.PackBase + col("event_id"))
    val k = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        Q.epochSec(col("ts")).as("es"))
      .withColumn("pb", coalesce(
        sum(when(col("event_type") === "purchase", 1).otherwise(0))
          .over(wu.rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
    val j = k.filter(col("pb") === 0)
      .withColumn("st", when(col("event_type") === "purchase", "conv")
        .otherwise(col("event_type")))
      .withColumn("rn", row_number().over(wu))
      .withColumn("nxt", lead("st", 1).over(wu))
    val tr = j.filter(col("rn") === 1)
      .select(lit("start").as("cur"), col("st").as("nxt"))
      .unionAll(j.filter(col("nxt").isNotNull)
        .select(col("st").as("cur"), col("nxt")))
      .unionAll(j.filter(col("nxt").isNull && col("st") =!= "conv")
        .select(col("st").as("cur"), lit("null").as("nxt")))
    val c = tr.groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
    val m = c.select(col("cur"), col("nxt"),
      (col("n").cast("double") /
        sum("n").over(Window.partitionBy("cur")).cast("long")).as("prob"))
      .transform(Q.snapshot)
    val sess = Tables.events(s, d).sparkSession
    val ch = sess.createDataFrame(Seq((0, ""), (1, "click"), (2, "error"),
      (3, "signup"), (4, "view"))).toDF("chain", "removed")
    val absorb = sess.createDataFrame(Seq(("conv"), ("null")).map(Tuple1(_)))
      .toDF("st")
    broadcast(ch).join(m, col("cur") =!= col("removed"))
      .groupBy(col("chain"),
        col("cur"),
        when(col("nxt") === col("removed"), "null").otherwise(col("nxt")).as("nx"))
      .agg(sum(floor(col("prob") * lit(1e12) + 0.5).cast("long")).as("p12"))
      .select(col("chain"), col("cur"), col("nx").as("nxt"), col("p12"))
      .unionAll(broadcast(ch).crossJoin(broadcast(absorb))
        .select(col("chain"), col("st").as("cur"), col("st").as("nxt"),
          lit(1000000000000L).as("p12")))
  }

  def defs: Seq[QueryDef] = Seq(

    // Conversion funnel view → click → purchase: per user the earliest
    // view, the earliest click AFTER that view, the earliest purchase
    // AFTER that click; stage counts = users reaching each stage.
    // Three stacked windows + the per-user rollup all partition by
    // user_id — ONE shuffle total, the same plan at any corpus size
    // (each user's event list is bounded by per-user activity, not by
    // corpus growth).
    Q("q_funnel",
      s"""WITH e AS (SELECT user_id, event_type, ${Q.sqlEpochSec("ts")} AS es FROM events),
         |w1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN es END)
         |                   OVER (PARTITION BY user_id) AS t1 FROM e),
         |w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND es > t1 THEN es END)
         |                   OVER (PARTITION BY user_id) AS t2 FROM w1),
         |w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND es > t2 THEN es END)
         |                   OVER (PARTITION BY user_id) AS t3 FROM w2),
         |u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
         |      FROM w3 GROUP BY 1),
         |c AS (SELECT count(t1) AS n1, count(t2) AS n2, count(t3) AS n3 FROM u)
         |SELECT '1_view' AS stage, n1 AS n_users FROM c
         |UNION ALL SELECT '2_click', n2 FROM c
         |UNION ALL SELECT '3_purchase', n3 FROM c
         |ORDER BY stage""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), Q.epochSec(col("ts")).as("es"))
        .withColumn("t1",
          min(when(col("event_type") === "view", col("es"))).over(w))
        .withColumn("t2",
          min(when(col("event_type") === "click" && col("es") > col("t1"), col("es"))).over(w))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" && col("es") > col("t2"), col("es"))).over(w))
        .groupBy("user_id")
        .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
        .agg(count("t1").as("n1"), count("t2").as("n2"), count("t3").as("n3"))
        .selectExpr("stack(3, '1_view', n1, '2_click', n2, '3_purchase', n3) AS (stage, n_users)")
        .orderBy("stage")
    },

    // Funnel step latency (round 10): how LONG do conversions take?
    // Same per-user earliest-qualifying-event chain as q_funnel, but
    // reporting the step-to-step delay distribution — count, min,
    // exact median, exact p90, max seconds — per transition. Delays
    // are int64 epoch-second differences, so min/max are exact integer
    // comparisons and the interpolated percentiles run on identical
    // integer inputs in both engines (the q_rolling_median/q_winsorize
    // `percentile` ↔ `quantile_cont` pairing, r6). Shapes: the window
    // chain rides q_funnel's single user_id exchange; the latency
    // frame is ≤2 rows per converting user and the final agg has 2
    // keys.
    Q("q_funnel_time",
      s"""WITH e AS (SELECT user_id, event_type, ${Q.sqlEpochSec("ts")} AS es FROM events),
         |w1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN es END)
         |                   OVER (PARTITION BY user_id) AS t1 FROM e),
         |w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND es > t1 THEN es END)
         |                   OVER (PARTITION BY user_id) AS t2 FROM w1),
         |w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND es > t2 THEN es END)
         |                   OVER (PARTITION BY user_id) AS t3 FROM w2),
         |u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
         |      FROM w3 GROUP BY 1),
         |d AS (SELECT '1_view_to_click' AS step, t2 - t1 AS dt FROM u WHERE t2 IS NOT NULL
         |      UNION ALL
         |      SELECT '2_click_to_purchase', t3 - t2 FROM u WHERE t3 IS NOT NULL)
         |SELECT step, count(*) AS n_users,
         |       min(dt) AS min_sec,
         |       ${Q.sqlR6("quantile_cont(dt, 0.5)")} AS med_sec,
         |       ${Q.sqlR6("quantile_cont(dt, 0.9)")} AS p90_sec,
         |       max(dt) AS max_sec
         |FROM d GROUP BY step
         |ORDER BY step""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), Q.epochSec(col("ts")).as("es"))
        .withColumn("t1",
          min(when(col("event_type") === "view", col("es"))).over(w))
        .withColumn("t2",
          min(when(col("event_type") === "click" && col("es") > col("t1"), col("es"))).over(w))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" && col("es") > col("t2"), col("es"))).over(w))
        .groupBy("user_id")
        .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
        .selectExpr(
          "stack(2, '1_view_to_click', t2 - t1, '2_click_to_purchase', t3 - t2) AS (step, dt)")
        .filter(col("dt").isNotNull)
        .groupBy("step")
        .agg(count(lit(1)).as("n_users"),
          min("dt").as("min_sec"),
          Q.r6(percentile(col("dt"), lit(0.5))).as("med_sec"),
          Q.r6(percentile(col("dt"), lit(0.9))).as("p90_sec"),
          max("dt").as("max_sec"))
        .orderBy("step")
    },

    // Cohort lifetime value (round 10): q_retention's calendar, followed
    // through revenue — per (first-active-day cohort, day offset), the
    // cohort's cumulative purchase revenue and LTV per cohort user: the
    // payback-curve primitive growth teams steer by. Revenue stays in
    // int64 CENTS through the cumulative window (exact, order-free);
    // the only doubles are the two final per-row divisions. Shapes:
    // per-user cohort min and the activity join ride ONE user_id
    // partitioning (retention's shape); the (cohort, offset) agg and
    // its running-sum window are span²-bounded, corpus-independent.
    Q("q_cohort_ltv",
      s"""WITH e AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
         |                  CASE WHEN event_type = 'purchase'
         |                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
         |                       ELSE 0 END AS cents
         |           FROM events),
         |c AS (SELECT user_id, min(d) AS cohort FROM e GROUP BY 1),
         |sz AS (SELECT cohort, count(*) AS n_users FROM c GROUP BY 1),
         |r AS (SELECT c.cohort, CAST(date_diff('day', c.cohort, e.d) AS BIGINT) AS day_offset,
         |             CAST(sum(e.cents) AS BIGINT) AS rev
         |      FROM e JOIN c ON e.user_id = c.user_id
         |      GROUP BY 1, 2),
         |cum AS (SELECT cohort, day_offset,
         |               CAST(sum(rev) OVER (PARTITION BY cohort ORDER BY day_offset
         |                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
         |        FROM r)
         |SELECT strftime(cum.cohort, '%Y-%m-%d') AS cohort, day_offset, n_users,
         |       cum_cents,
         |       ${Q.sqlR4("CAST(cum_cents AS DOUBLE) / 100 / n_users")} AS ltv_per_user
         |FROM cum JOIN sz ON cum.cohort = sz.cohort
         |ORDER BY cohort, day_offset""".stripMargin) { (s, d) =>
      // Single-scan shape (the oracle keeps the join formulation): the
      // cohort is a per-user window min, the cohort size rides the
      // (cohort, offset) agg as the offset-0 distinct-user count
      // (every user is active on their own cohort day by definition)
      // fanned across the cohort by a window max — one corpus scan,
      // and the user_id window is the only corpus-sized exchange.
      val e = Tables.events(s, d)
        .select(col("user_id"), col("ts").cast(DateType).as("d"),
          when(col("event_type") === "purchase",
            floor(col("value") * 100 + 0.5).cast("long")).otherwise(0L).as("cents"))
        .withColumn("cohort", min("d").over(Window.partitionBy("user_id")))
      val r = e
        .groupBy(col("cohort"), datediff(col("d"), col("cohort")).cast("long").as("day_offset"))
        .agg(sum("cents").as("rev"), countDistinct("user_id").as("nd"))
      r.withColumn("cum_cents",
          sum("rev").over(Window.partitionBy("cohort").orderBy("day_offset")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n_users",
          max(when(col("day_offset") === 0, col("nd"))).over(Window.partitionBy("cohort")))
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
          col("day_offset"), col("n_users"), col("cum_cents"),
          Q.r4(col("cum_cents").cast("double") / 100 / col("n_users")).as("ltv_per_user"))
        .orderBy("cohort", "day_offset")
    },

    // Cohort retention: cohort = a user's first active day; one row per
    // (cohort, day_offset) counting users active that many days later.
    // Distinct (user, day) activity and the per-user cohort min both
    // hash-partition on user_id, and the join that reunites them reuses
    // that partitioning — one logical shuffle key end-to-end, then a
    // final agg on (cohort, offset) whose cardinality is bounded by
    // span², not corpus size.
    Q("q_retention",
      """WITH e AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events),
        |c AS (SELECT user_id, min(d) AS cohort FROM e GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, d FROM e)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
        |       CAST(date_diff('day', cohort, d) AS BIGINT) AS day_offset,
        |       count(*) AS n_users
        |FROM a JOIN c USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY cohort, day_offset""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("user_id"), col("ts").cast(DateType).as("d"))
      val cohorts = e.groupBy("user_id").agg(min("d").as("cohort"))
      e.distinct()
        .join(cohorts, "user_id")
        .groupBy(
          date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
          datediff(col("d"), col("cohort")).cast("long").as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort", "day_offset")
    },

    // Numeric histogram: arithmetic bucketing of l_extendedprice into a
    // fixed grid — a pure map-side projection followed by a |buckets|-
    // cardinality aggregation. THE profiling primitive at 100 TB: the
    // shuffle carries (#partitions × #buckets) partial rows, full stop.
    Q("q_hist",
      s"""SELECT least(CAST(floor((l_extendedprice - $HistLo) / $HistWidth) AS BIGINT),
         |             ${HistBuckets - 1}) AS bucket,
         |       count(*) AS n,
         |       ${Q.sqlR2("sum(l_extendedprice)")} AS total
         |FROM lineitem
         |GROUP BY 1
         |ORDER BY bucket""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .groupBy(
          least(floor((col("l_extendedprice") - HistLo) / HistWidth),
            lit(HistBuckets - 1).cast("long")).as("bucket"))
        .agg(count(lit(1)).as("n"), Q.r2(sum("l_extendedprice")).as("total"))
        .orderBy("bucket")
    },

    // Path analysis: top-10 3-step event-type sequences (consecutive
    // per user by time). lead() windows share the funnel's single
    // user_id partitioning; the sequence-count agg keys on path strings
    // whose cardinality is bounded by |event_types|³ — tiny and fixed —
    // so the final count/rank stage never grows with the corpus.
    Q("q_event_path",
      s"""WITH e AS (SELECT user_id, event_type, event_id,
         |                  ${Q.sqlEpochSec("ts")} AS es FROM events),
         |p AS (SELECT event_type || '>' ||
         |             lead(event_type, 1) OVER w || '>' ||
         |             lead(event_type, 2) OVER w AS path
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
         |c AS (SELECT path, count(*) AS n FROM p WHERE path IS NOT NULL GROUP BY 1)
         |SELECT path, n, rk FROM
         |  (SELECT path, n, row_number() OVER (ORDER BY n DESC, path) AS rk FROM c)
         |WHERE rk <= 10
         |ORDER BY rk""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("es", "event_id")
      val wr = Window.orderBy(col("n").desc, col("path"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          Q.epochSec(col("ts")).as("es"))
        .select(concat_ws(">", col("event_type"),
          lead("event_type", 1).over(w), lead("event_type", 2).over(w)).as("path"),
          lead("event_type", 2).over(w).as("ok"))
        .filter(col("ok").isNotNull)
        .groupBy("path").agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(wr).cast("long"))
        .filter(col("rk") <= 10)
        .orderBy("rk")
    },

    // Z-score anomaly flags: events whose value sits >3σ from their
    // type's mean. The stats table is one row per event_type (bounded
    // domain ⇒ broadcast-eligible per the Joins.scala policy), so the
    // fact side stays map-side — no corpus shuffle. Stats are r6-rounded
    // BEFORE the threshold/z so double accumulation-order noise between
    // engines cannot flip a boundary row.
    Q("q_anomaly",
      s"""WITH st AS (SELECT event_type,
         |                  ${Q.sqlR6("avg(value)")} AS mu,
         |                  ${Q.sqlR6("stddev_samp(value)")} AS sd
         |           FROM events GROUP BY 1)
         |SELECT event_id, e.event_type,
         |       ${Q.sqlR4("(value - mu) / sd")} AS z
         |FROM events e JOIN st ON e.event_type = st.event_type
         |WHERE abs(value - mu) > 3 * sd
         |ORDER BY event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select("event_id", "event_type", "value")
      val st = e.groupBy("event_type")
        .agg(Q.r6(avg("value")).as("mu"), Q.r6(stddev_samp("value")).as("sd"))
      e.join(broadcast(st), "event_type")
        .filter(abs(col("value") - col("mu")) > lit(3) * col("sd"))
        .select(col("event_id"), col("event_type"), Q.r4((col("value") - col("mu")) / col("sd")).as("z"))
        .orderBy("event_id")
    },

    // RFM segmentation: per user recency (days from last activity to
    // the anchor), frequency (events) and monetary (purchase value sum),
    // bucketed on FIXED thresholds into 1-3 scores and a named segment.
    // Fixed-edge bucketing (like q_hist) is deliberate: quantile-based
    // edges would need a global sort/percentile pass and make every
    // user's label depend on every other user — fixed edges keep the
    // whole thing ONE map-side-partial groupBy(user_id), and segments
    // stay comparable across runs/partitions/corpus sizes. Purchase
    // monetary r2-rounded before thresholding so accumulation-order
    // ulps cannot flip a bucket edge.
    Q("q_rfm",
      s"""WITH u AS (SELECT user_id,
         |                 date_diff('day', max(CAST(date_trunc('day', ts) AS DATE)),
         |                           DATE '2024-02-01') AS rec_days,
         |                 count(*) AS freq,
         |                 ${Q.sqlR2("sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)")} AS monetary
         |          FROM events GROUP BY 1),
         |sc AS (SELECT user_id, CAST(rec_days AS BIGINT) AS rec_days, freq, monetary,
         |              CASE WHEN rec_days <= 2 THEN 3 WHEN rec_days <= 7 THEN 2 ELSE 1 END AS r_score,
         |              CASE WHEN freq >= 80 THEN 3 WHEN freq >= 60 THEN 2 ELSE 1 END AS f_score,
         |              CASE WHEN monetary >= 900 THEN 3 WHEN monetary >= 500 THEN 2 ELSE 1 END AS m_score
         |       FROM u)
         |SELECT user_id, rec_days, freq, monetary, r_score, f_score, m_score,
         |       CASE WHEN r_score = 3 AND f_score + m_score >= 5 THEN 'champion'
         |            WHEN r_score >= 2 AND f_score + m_score >= 4 THEN 'loyal'
         |            WHEN r_score = 1 AND f_score + m_score >= 4 THEN 'at_risk'
         |            WHEN r_score >= 2 THEN 'developing'
         |            ELSE 'hibernating' END AS segment
         |FROM sc
         |ORDER BY user_id""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          datediff(to_date(lit("2024-02-01")), max(col("ts").cast(DateType)))
            .cast("long").as("rec_days"),
          count(lit(1)).as("freq"),
          Q.r2(sum(when(col("event_type") === "purchase", col("value"))
            .otherwise(0))).as("monetary"))
      val rs = when(col("rec_days") <= 2, 3).when(col("rec_days") <= 7, 2).otherwise(1)
      val fs = when(col("freq") >= 80, 3).when(col("freq") >= 60, 2).otherwise(1)
      val ms = when(col("monetary") >= 900, 3).when(col("monetary") >= 500, 2).otherwise(1)
      u.withColumn("r_score", rs)
        .withColumn("f_score", fs)
        .withColumn("m_score", ms)
        .withColumn("segment",
          when(col("r_score") === 3 && col("f_score") + col("m_score") >= 5, "champion")
            .when(col("r_score") >= 2 && col("f_score") + col("m_score") >= 4, "loyal")
            .when(col("r_score") === 1 && col("f_score") + col("m_score") >= 4, "at_risk")
            .when(col("r_score") >= 2, "developing")
            .otherwise("hibernating"))
        .orderBy("user_id")
    },

    // Tukey boxplot outliers per event_type: exact p25/p50/p75, IQR
    // whiskers at 1.5×IQR, and the count/rate of rows outside them —
    // the ROBUST complement to q_anomaly's z-scores (quartiles don't
    // move when the outliers themselves get bigger; mean/σ do). Same
    // broadcast shape as q_anomaly: the 5-row quantile table fans back
    // over the fact side map-side, the corpus is never shuffled.
    // Quartiles r6-rounded BEFORE the fences so a boundary row can't
    // flip between engines. (Exact percentile costs a per-group sort —
    // the q_agg_approx_pct sketch is the 100 TB path; the fence logic
    // is identical either way.)
    Q("q_boxplot",
      s"""WITH st AS (SELECT event_type,
         |                  ${Q.sqlR6("quantile_cont(value, 0.25)")} AS p25,
         |                  ${Q.sqlR6("quantile_cont(value, 0.5)")} AS p50,
         |                  ${Q.sqlR6("quantile_cont(value, 0.75)")} AS p75
         |           FROM events GROUP BY 1)
         |SELECT e.event_type, p25, p50, p75,
         |       count(*) AS n,
         |       CAST(count(CASE WHEN value < p25 - 1.5 * (p75 - p25)
         |                         OR value > p75 + 1.5 * (p75 - p25)
         |                       THEN 1 END) AS BIGINT) AS n_outliers
         |FROM events e JOIN st ON e.event_type = st.event_type
         |GROUP BY 1, 2, 3, 4
         |ORDER BY e.event_type""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select("event_type", "value")
      val st = e.groupBy("event_type")
        .agg(
          Q.r6(percentile(col("value"), lit(0.25))).as("p25"),
          Q.r6(percentile(col("value"), lit(0.5))).as("p50"),
          Q.r6(percentile(col("value"), lit(0.75))).as("p75"))
      val iqr = col("p75") - col("p25")
      e.join(broadcast(st), "event_type")
        .groupBy("event_type", "p25", "p50", "p75")
        .agg(
          count(lit(1)).as("n"),
          count(when(col("value") < col("p25") - lit(1.5) * iqr ||
            col("value") > col("p75") + lit(1.5) * iqr, 1)).as("n_outliers"))
        .orderBy("event_type")
    },

    // Column-profile table (the Deequ/data-quality primitive): one pass
    // over lineitem emitting per-column null count, exact distinct
    // count, min/max/mean in LONG (col_name, ...) format. Spark plans
    // the multi-column count(DISTINCT) as ONE Expand-based
    // multi-distinct aggregate — a single corpus scan whatever the
    // column count — and stack() reshapes the 1-row wide result
    // in-row. Mins/maxes are exact; means r4-rounded.
    Q("q_profile",
      s"""WITH a AS (SELECT count(*) AS n,
         |                  count(DISTINCT l_quantity) AS d1,
         |                  count(DISTINCT l_extendedprice) AS d2,
         |                  count(DISTINCT l_discount) AS d3,
         |                  count(DISTINCT l_tax) AS d4,
         |                  count(*) - count(l_quantity) AS nn1,
         |                  count(*) - count(l_extendedprice) AS nn2,
         |                  count(*) - count(l_discount) AS nn3,
         |                  count(*) - count(l_tax) AS nn4,
         |                  min(l_quantity) AS mn1, max(l_quantity) AS mx1,
         |                  ${Q.sqlR4("avg(l_quantity)")} AS av1,
         |                  min(l_extendedprice) AS mn2, max(l_extendedprice) AS mx2,
         |                  ${Q.sqlR4("avg(l_extendedprice)")} AS av2,
         |                  min(l_discount) AS mn3, max(l_discount) AS mx3,
         |                  ${Q.sqlR4("avg(l_discount)")} AS av3,
         |                  min(l_tax) AS mn4, max(l_tax) AS mx4,
         |                  ${Q.sqlR4("avg(l_tax)")} AS av4
         |           FROM lineitem)
         |SELECT 'l_quantity' AS col_name, n, nn1 AS n_null, d1 AS n_distinct, mn1 AS vmin, mx1 AS vmax, av1 AS vavg FROM a
         |UNION ALL SELECT 'l_extendedprice', n, nn2, d2, mn2, mx2, av2 FROM a
         |UNION ALL SELECT 'l_discount', n, nn3, d3, mn3, mx3, av3 FROM a
         |UNION ALL SELECT 'l_tax', n, nn4, d4, mn4, mx4, av4 FROM a
         |ORDER BY col_name""".stripMargin) { (s, d) =>
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val aggs = Seq(count(lit(1)).as("n")) ++ cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(countDistinct(col(c)).as(s"d${i + 1}"),
          (count(lit(1)) - count(col(c))).as(s"nn${i + 1}"),
          min(col(c)).as(s"mn${i + 1}"), max(col(c)).as(s"mx${i + 1}"),
          Q.r4(avg(col(c))).as(s"av${i + 1}"))
      }
      val stackArgs = cols.zipWithIndex
        .map { case (c, i) => s"'$c', nn${i + 1}, d${i + 1}, mn${i + 1}, mx${i + 1}, av${i + 1}" }
        .mkString(", ")
      Tables.load(s, d, "lineitem")
        .agg(aggs.head, aggs.tail: _*)
        .selectExpr("n",
          s"stack(${cols.length}, $stackArgs) AS (col_name, n_null, n_distinct, vmin, vmax, vavg)")
        .select(col("col_name"), col("n"), col("n_null"), col("n_distinct"),
          col("vmin"), col("vmax"), col("vavg"))
        .orderBy("col_name")
    },

    // The 100 TB default for q_profile: swap the exact multi-distinct —
    // whose Expand replicates the scan once per profiled column — for
    // approx_count_distinct, collapsing the profile to ONE ordinary
    // aggregate pass with constant-size HLL++ buffers per column. The
    // sketch value can't be oracled (engine-specific), so the
    // driver-checked form is the ERROR-BAND audit (r11): the sketch and
    // the exact multi-distinct run side by side, n_distinct carries the
    // exact count and hll_ok the per-column band verdict the oracle
    // pins as TRUE. rsd=0.023 ⇒ 3σ ≈ 7%; band 8% + 2 absolute.
    Q("q_profile_approx",
      s"""WITH a AS (SELECT count(*) AS n,
         |                  count(DISTINCT l_quantity) AS d1,
         |                  count(DISTINCT l_extendedprice) AS d2,
         |                  count(DISTINCT l_discount) AS d3,
         |                  count(DISTINCT l_tax) AS d4,
         |                  count(*) - count(l_quantity) AS nn1,
         |                  count(*) - count(l_extendedprice) AS nn2,
         |                  count(*) - count(l_discount) AS nn3,
         |                  count(*) - count(l_tax) AS nn4,
         |                  min(l_quantity) AS mn1, max(l_quantity) AS mx1,
         |                  ${Q.sqlR4("avg(l_quantity)")} AS av1,
         |                  min(l_extendedprice) AS mn2, max(l_extendedprice) AS mx2,
         |                  ${Q.sqlR4("avg(l_extendedprice)")} AS av2,
         |                  min(l_discount) AS mn3, max(l_discount) AS mx3,
         |                  ${Q.sqlR4("avg(l_discount)")} AS av3,
         |                  min(l_tax) AS mn4, max(l_tax) AS mx4,
         |                  ${Q.sqlR4("avg(l_tax)")} AS av4
         |           FROM lineitem)
         |SELECT 'l_quantity' AS col_name, n, nn1 AS n_null, d1 AS n_distinct, mn1 AS vmin, mx1 AS vmax, av1 AS vavg, TRUE AS hll_ok FROM a
         |UNION ALL SELECT 'l_extendedprice', n, nn2, d2, mn2, mx2, av2, TRUE FROM a
         |UNION ALL SELECT 'l_discount', n, nn3, d3, mn3, mx3, av3, TRUE FROM a
         |UNION ALL SELECT 'l_tax', n, nn4, d4, mn4, mx4, av4, TRUE FROM a
         |ORDER BY col_name""".stripMargin) { (s, d) =>
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      // TWO separate aggregate passes, broadcast-joined on their
      // single-row outputs: mixing the four countDistinct with the four
      // approx_count_distinct in ONE aggregate forces the multi-distinct
      // Expand rewrite to drag the HLL++ buffers through every expanded
      // replica — measured 32 s vs ~2 s for the split at sf0.1. The
      // sketch pass keeps its one-ordinary-pass shape (the 100 TB
      // claim); the exact pass is the same Expand plan q_profile runs.
      val exactAggs = Seq(count(lit(1)).as("n")) ++ cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(countDistinct(col(c)).as(s"d${i + 1}"),
          (count(lit(1)) - count(col(c))).as(s"nn${i + 1}"),
          min(col(c)).as(s"mn${i + 1}"), max(col(c)).as(s"mx${i + 1}"),
          Q.r4(avg(col(c))).as(s"av${i + 1}"))
      }
      val approxAggs = cols.zipWithIndex.map { case (c, i) =>
        approx_count_distinct(col(c), 0.023).as(s"ad${i + 1}")
      }
      val li = Tables.load(s, d, "lineitem")
      val stackArgs = cols.zipWithIndex
        .map { case (c, i) =>
          s"'$c', nn${i + 1}, d${i + 1}, mn${i + 1}, mx${i + 1}, av${i + 1}, " +
            s"abs(ad${i + 1} - d${i + 1}) <= 2 + 0.08 * d${i + 1}"
        }
        .mkString(", ")
      li.agg(exactAggs.head, exactAggs.tail: _*)
        .crossJoin(broadcast(li.agg(approxAggs.head, approxAggs.tail: _*)))
        .selectExpr("n",
          s"stack(${cols.length}, $stackArgs) AS (col_name, n_null, n_distinct, vmin, vmax, vavg, hll_ok)")
        .select(col("col_name"), col("n"), col("n_null"), col("n_distinct"),
          col("vmin"), col("vmax"), col("vavg"), col("hll_ok"))
        .orderBy("col_name")
    },

    // Winsorized robust statistics per event_type (round 10): clamp
    // values to the exact [p05, p95] band and report raw vs winsorized
    // mean plus the clamp count — the outlier-robust mean every metrics
    // pipeline wants next to q_boxplot's fence counts. Same broadcast
    // shape as q_anomaly/q_boxplot: the 5-row quantile table fans back
    // map-side, the fact stream is never shuffled (one bounded-key agg
    // at the end). Quantiles are r6-rounded BEFORE clamping so both
    // engines clamp against identical doubles.
    // MAD outliers per event_type: the modified z-score 0.6745·(x −
    // median)/MAD with the standard 3.5 fence — the most
    // breakdown-resistant of the family (q_anomaly's mean/σ move with
    // the outliers; quartile fences move at 25% contamination; the
    // median/MAD pair survives 50%). MAD inherently needs a second
    // pass (the deviation median depends on the value median), so the
    // shape is two chained broadcast-stats joins over the fact stream —
    // the corpus is never shuffled, and both medians are r6-rounded
    // before the fence so a boundary row cannot flip engines. The
    // sketch substitutes (approx percentile) slot into the same shape
    // at 100 TB.
    Q("q_mad_outliers",
      s"""WITH m AS (SELECT event_type,
         |                  ${Q.sqlR6("quantile_cont(value, 0.5)")} AS med
         |           FROM events GROUP BY 1),
         |md AS (SELECT e.event_type,
         |              ${Q.sqlR6("quantile_cont(abs(value - med), 0.5)")} AS mad
         |       FROM events e JOIN m ON e.event_type = m.event_type
         |       GROUP BY 1)
         |SELECT e.event_type, med, mad,
         |       count(*) AS n,
         |       CAST(count(CASE WHEN abs(0.6745 * (value - med) / mad) > 3.5
         |                       THEN 1 END) AS BIGINT) AS n_outliers
         |FROM events e
         |JOIN m ON e.event_type = m.event_type
         |JOIN md ON e.event_type = md.event_type
         |GROUP BY 1, 2, 3
         |ORDER BY e.event_type""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select("event_type", "value")
      val m = e.groupBy("event_type")
        .agg(Q.r6(percentile(col("value"), lit(0.5))).as("med"))
      val md = e.join(broadcast(m), "event_type")
        .groupBy("event_type", "med")
        .agg(Q.r6(percentile(abs(col("value") - col("med")), lit(0.5))).as("mad"))
      e.join(broadcast(md), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(count(lit(1)).as("n"),
          count(when(abs(lit(0.6745) * (col("value") - col("med")) / col("mad")) > 3.5, 1))
            .as("n_outliers"))
        .orderBy("event_type")
    },

    Q("q_winsorize",
      s"""WITH st AS (SELECT event_type,
         |                   ${Q.sqlR6("quantile_cont(value, 0.05)")} AS p05,
         |                   ${Q.sqlR6("quantile_cont(value, 0.95)")} AS p95
         |            FROM events GROUP BY 1)
         |SELECT e.event_type, count(*) AS n,
         |       ${Q.sqlR4("avg(value)")} AS mean_raw,
         |       ${Q.sqlR4("avg(least(greatest(value, p05), p95))")} AS mean_winsor,
         |       CAST(count(CASE WHEN value < p05 OR value > p95 THEN 1 END) AS BIGINT) AS n_clamped
         |FROM events e JOIN st ON e.event_type = st.event_type
         |GROUP BY 1
         |ORDER BY e.event_type""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select("event_type", "value")
      val st = e.groupBy("event_type")
        .agg(
          Q.r6(percentile(col("value"), lit(0.05))).as("p05"),
          Q.r6(percentile(col("value"), lit(0.95))).as("p95"))
      e.join(broadcast(st), "event_type")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          Q.r4(avg("value")).as("mean_raw"),
          Q.r4(avg(least(greatest(col("value"), col("p05")), col("p95")))).as("mean_winsor"),
          count(when(col("value") < col("p05") || col("value") > col("p95"), 1))
            .as("n_clamped"))
        .orderBy("event_type")
    },

    // Huber M-estimator of location per event type (round 17): the
    // IRLS completion of the robust family — q_mad_outliers flags,
    // q_winsorize clamps, q_sigma_clip drops; Huber DOWNWEIGHTS
    // (w = min(1, k/|v−μ|), k = 1.345·1.4826·MAD — 95% efficient at
    // the normal, bounded influence under contamination) and re-fits
    // μ for 3 fixed rounds from the exact cents median. Determinism:
    // median and MAD are exact integer first-crossings on the
    // (type, cents) grid; each round's weight is ONE mirrored tree
    // (the |v−μ| ≤ k branch avoids any 0/0 even at MAD = 0) floored
    // to the 1e6 lattice per CELL before the order-free int64 sums,
    // so both engines fold identical integers; μ is one division per
    // round. Everything below the corpus agg is grid-bounded; the
    // ≤|types|-row parameter frame broadcasts each round.
    Q("q_huber", {
      val w = (mu: String) =>
        s"""CASE WHEN CAST(abs(g.v - $mu) AS DOUBLE) <= p.k THEN 1.0
           |     ELSE p.k / abs(g.v - $mu) END""".stripMargin
      val round = (i: Int) => {
        val p = if (i == 1) "k0" else s"p${i - 1}"
        s"""r$i AS (SELECT g.g, p.n, p.med, p.mad, p.k, p.sv,
           |             CAST(sum(g.c * CAST(floor((${w("p.mu")}) * 1e6 + 0.5) AS BIGINT)
           |                      * g.v) AS BIGINT) AS swv,
           |             CAST(sum(g.c * CAST(floor((${w("p.mu")}) * 1e6 + 0.5) AS BIGINT))
           |                  AS BIGINT) AS sw
           |      FROM g JOIN $p p USING (g) GROUP BY 1, 2, 3, 4, 5, 6),
           |p$i AS (SELECT g, n, med, mad, k, sv,
           |               CASE WHEN sw > 0 THEN CAST(swv AS DOUBLE) / sw
           |                    ELSE CAST(med AS DOUBLE) END AS mu
           |        FROM r$i)""".stripMargin
      }
      s"""WITH g AS (SELECT event_type AS g,
         |                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
         |                  CAST(count(*) AS BIGINT) AS c
         |           FROM events GROUP BY 1, 2),
         |cw AS (SELECT g, v, c,
         |              CAST(sum(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum,
         |              CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n,
         |              CAST(sum(c * v) OVER (PARTITION BY g) AS BIGINT) AS sv
         |       FROM g),
         |m0 AS (SELECT g, CAST(max(n) AS BIGINT) AS n, CAST(max(sv) AS BIGINT) AS sv,
         |              CAST(min(CASE WHEN cum * 2 >= n THEN v END) AS BIGINT) AS med
         |       FROM cw GROUP BY 1),
         |ad AS (SELECT g.g, abs(g.v - m0.med) AS d, CAST(sum(g.c) AS BIGINT) AS c
         |       FROM g JOIN m0 USING (g) GROUP BY 1, 2),
         |adw AS (SELECT g, d, c,
         |               CAST(sum(c) OVER (PARTITION BY g ORDER BY d) AS BIGINT) AS cum,
         |               CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
         |        FROM ad),
         |md AS (SELECT g, CAST(min(CASE WHEN cum * 2 >= n THEN d END) AS BIGINT) AS mad
         |       FROM adw GROUP BY 1),
         |k0 AS (SELECT m0.g, m0.n, m0.med, md.mad, m0.sv,
         |              1.345 * 1.4826 * md.mad AS k, CAST(m0.med AS DOUBLE) AS mu
         |       FROM m0 JOIN md USING (g)),
         |${(1 to 3).map(round).mkString(",\n")}
         |SELECT g AS event_type, n, med AS median_cents, mad AS mad_cents,
         |       ${Q.sqlR4("CAST(sv AS DOUBLE) / n")} AS mean_cents,
         |       ${Q.sqlR4("mu")} AS huber_cents
         |FROM p3
         |ORDER BY event_type""".stripMargin
    }) { (s, d) =>
      huberOf(Tables.events(s, d)
        .select(col("event_type").as("g"),
          floor(col("value") * 100 + 0.5).cast("long").as("v"))
        .groupBy("g", "v").agg(count(lit(1)).as("c")))
    },

    // ABC (Pareto) classification of parts by revenue (round 10): rank
    // parts by total lineitem revenue, class A = the head covering 80%
    // of cumulative revenue, B = the next 15%, C = the tail — the
    // classic inventory-analytics 80/15/5 cut (q_lorenz gives the
    // curve; this labels the items). Determinism: revenue is exact
    // int64 CENTS, the running sum is an int64 fold under the
    // (rev DESC, partkey) total order, and the class thresholds are
    // INTEGER comparisons (cum·100 vs total·80 / total·95) — no double
    // exists anywhere a boundary could flip. Shape (round 15 — the
    // q_lift_curve two-pass band-offset form): the corpus collapses to
    // the per-part agg FIRST (map-side partials onto catalog-bounded
    // keys); each part then gets a magnitude BAND — bit-length and
    // top-7-bits of cents packed into one int64, a MONOTONE function
    // of cents with ≤64·128 possible values — so the ≤8192-row band
    // grid carries the global prefix sums (revenue mass + part count
    // in strictly-higher bands, broadcast back), and the rank/cumsum
    // windows partition BY BAND. No window's input scales with the
    // part catalog: (band DESC, cents DESC, partkey) IS the global
    // (cents DESC, partkey) order, recovered as offset + in-band
    // row_number / running sum, all exact int64.
    Q("q_abc_class",
      s"""WITH p AS (SELECT l_partkey,
         |                  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
         |           FROM lineitem GROUP BY 1),
         |w AS (SELECT l_partkey, cents,
         |             CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey
         |                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |             CAST(sum(cents) OVER () AS BIGINT) AS total,
         |             CAST(row_number() OVER (ORDER BY cents DESC, l_partkey) AS BIGINT) AS rk
         |      FROM p)
         |SELECT l_partkey, rk, ${Q.sqlR2("cents / 100.0")} AS revenue,
         |       ${Q.sqlR6("CAST(cum AS DOUBLE) / total")} AS cum_share,
         |       CASE WHEN cum * 100 <= total * 80 THEN 'A'
         |            WHEN cum * 100 <= total * 95 THEN 'B'
         |            ELSE 'C' END AS abc
         |FROM w
         |ORDER BY rk""".stripMargin) { (s, d) =>
      val p = Tables.load(s, d, "lineitem")
        .groupBy("l_partkey")
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long")).cast("long").as("cents"))
        // bin() is the exact integer bit-length path (no double log2
        // near a power-of-2 boundary); band = lb·200 + top-7-bits is
        // monotone: within one lb the shift is constant, and lb+1's
        // floor 200(lb+1)+min(sub) clears lb's ceiling for every lb
        .withColumn("lb", length(bin(col("cents"))).cast("long"))
        .withColumn("band",
          col("lb") * 200 + expr("shiftright(cents, CAST(greatest(lb - 7, 0L) AS INT))"))
        .transform(Q.snapshot)
      val wg = Window.orderBy(col("band").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val grid = p.groupBy("band")
        .agg(sum("cents").as("bsum"), count(lit(1)).as("bcnt"))
        .select(col("band"),
          coalesce(sum("bsum").over(wg), lit(0L)).as("cum_off"),
          coalesce(sum("bcnt").over(wg), lit(0L)).as("rk_off"),
          sum("bsum").over(Window.partitionBy()).cast("long").as("total"))
      val wb = Window.partitionBy("band").orderBy(col("cents").desc, col("l_partkey"))
      val w = p.join(broadcast(grid), "band")
        .withColumn("cum", (col("cum_off") + sum("cents").over(
          wb.rowsBetween(Window.unboundedPreceding, Window.currentRow))).cast("long"))
        .withColumn("rk", (col("rk_off") + row_number().over(wb)).cast("long"))
      w.select(col("l_partkey"), col("rk"),
          Q.r2(col("cents") / lit(100.0)).as("revenue"),
          Q.r6(col("cum").cast("double") / col("total")).as("cum_share"),
          when(col("cum") * 100 <= col("total") * 80, "A")
            .when(col("cum") * 100 <= col("total") * 95, "B")
            .otherwise("C").as("abc"))
        .orderBy("rk")
    },

    // Multi-touch marketing attribution (round 10): every purchase
    // credits the non-purchase events of the SAME user in the 24 h
    // before it — last-touch (the nearest touch takes the whole
    // conversion) and linear (each of the k touches takes 1/k) — the
    // two standard credit models, summed per touch type. Purchases
    // with no in-window touch earn no credit (documented, both twins
    // drop them identically). Determinism: each touch's 1/k share is
    // integer-scaled to 1e-6 BEFORE the per-type sum (the q_mutual_info
    // fold — order-free int64 reduction); last-touch picks the max
    // packed (es, event_id) int64 key, so a same-second tie cannot
    // flip between engines. Shape: ONE corpus scan — each purchase
    // row's touch history arrives via a RANGE-framed window
    // collect_list on the single user_id exchange (per-user-day
    // bounded, corpus-independent), and the credited explode lands on
    // a ≤|event_types| agg. The oracle keeps the equivalent
    // purchases⋈touches interval self-join — a genuinely different
    // evaluation of the same credit assignment.
    Q("q_attribution",
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |                  ${Q.sqlEpochSec("ts")} AS es FROM events),
         |p AS (SELECT user_id, event_id, es FROM e WHERE event_type = 'purchase'),
         |t AS (SELECT x.event_type AS touch_type,
         |             count(*) OVER (PARTITION BY p.event_id) AS k,
         |             row_number() OVER (PARTITION BY p.event_id
         |                                ORDER BY x.es * 100000000 + x.event_id DESC) AS rk
         |      FROM p JOIN e x ON x.user_id = p.user_id
         |                     AND x.es >= p.es - 86400 AND x.es < p.es
         |                     AND x.event_type <> 'purchase')
         |SELECT touch_type,
         |       CAST(count(*) AS BIGINT) AS n_touches,
         |       CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS last_touch,
         |       ${Q.sqlR4("sum(CAST(floor(1000000.0 / k + 0.5) AS BIGINT)) / 1e6")} AS linear_credit
         |FROM t
         |GROUP BY 1
         |ORDER BY touch_type""".stripMargin) { (s, d) =>
      val wr = Window.partitionBy("user_id").orderBy("es")
        .rangeBetween(-86400L, -1L)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          Q.epochSec(col("ts")).as("es"))
        .withColumn("hist", collect_list(
          when(col("event_type") =!= "purchase",
            struct(Q.packedOrd(col("es"), col("event_id")).as("ord"),
              col("event_type").as("touch_type")))).over(wr))
        .filter(col("event_type") === "purchase" && size(col("hist")) > 0)
        .select(explode(expr(
          // credit6 = round(1e6 / k); the last touch is the max packed
          // order key — computed IN-ROW from the bounded history array
          """transform(hist, t -> struct(
            |  t.touch_type AS touch_type,
            |  CAST(floor(1000000.0 / size(hist) + 0.5) AS BIGINT) AS credit6,
            |  CAST(t.ord = array_max(transform(hist, h -> h.ord)) AS INT) AS is_last))""".stripMargin))
          .as("c"))
        .groupBy(col("c.touch_type").as("touch_type"))
        .agg(count(lit(1)).as("n_touches"),
          sum(col("c.is_last")).cast("long").as("last_touch"),
          Q.r4(sum(col("c.credit6")) / lit(1e6)).as("linear_credit"))
        .orderBy("touch_type")
    },

    // Product stickiness (round 11): per day, DAU / trailing-7-day AU —
    // the engagement ratio growth teams track (1.0 = every weekly user
    // comes back daily). Exact trailing-window DISTINCT users cannot
    // ride a window function (count distinct isn't frameable), so each
    // (day, user) activity fact FANS OUT in-row to the ≤7 future days
    // whose trailing window it belongs to (a 7-element sequence
    // explode — no extra scan, no day×day self-join) and one
    // count(DISTINCT) per target day collapses multi-day users. Days
    // are indexed as exact integers from the events anchor. Scale:
    // the corpus collapses to |days|×|users| distinct facts first
    // (map-side partial), the fan-out is a bounded ×7, and the one
    // distinct agg shuffles (day, user) pairs — linear, never
    // corpus²; the 100 TB sketch substitute is per-day HLL unions
    // (q_agg_approx_distinct's path). Partial leading windows (the
    // first 6 days) report over the days available, as marked.
    Q("q_stickiness",
      s"""WITH du AS (SELECT DISTINCT
         |              CAST(date_diff('day', DATE '2024-01-01',
         |                             CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         |              user_id
         |            FROM events),
         |days AS (SELECT DISTINCT x FROM du),
         |fan AS (SELECT du.user_id, du.x AS active_x, t.x AS target_x
         |        FROM du JOIN days t ON t.x >= du.x AND t.x <= du.x + 6),
         |wau AS (SELECT target_x AS x, count(DISTINCT user_id) AS wau
         |        FROM fan GROUP BY 1),
         |dau AS (SELECT x, count(*) AS dau FROM du GROUP BY 1)
         |SELECT strftime(DATE '2024-01-01' + CAST(dau.x AS INT), '%Y-%m-%d') AS day,
         |       CAST(dau.dau AS BIGINT) AS dau, CAST(wau.wau AS BIGINT) AS wau,
         |       CAST(dau.x >= 6 AS BOOLEAN) AS full_window,
         |       ${Q.sqlR4("CAST(dau.dau AS DOUBLE) / wau.wau")} AS stickiness
         |FROM dau JOIN wau ON dau.x = wau.x
         |ORDER BY day""".stripMargin) { (s, d) =>
      // materialized once: the (day, user) fact frame feeds THREE
      // branches (day list, fan-out, DAU) — unmaterialized, each would
      // re-scan events (Spark plans trees, not DAGs)
      val du = Tables.events(s, d)
        .select(datediff(col("ts").cast(DateType), to_date(lit("2024-01-01")))
            .cast("long").as("x"),
          col("user_id"))
        .distinct()
        .transform(Q.snapshot)
      // fan each activity fact to the ≤7 trailing windows it serves,
      // then keep only target days that exist in the data (the join
      // with the day list mirrors the oracle's days CTE)
      val days = du.select(col("x").as("target_x")).distinct()
      val fan = du
        .select(col("user_id"), col("x"),
          explode(sequence(col("x"), col("x") + 6)).as("tx"))
        .join(days, col("tx") === col("target_x"))
      val wau = fan.groupBy(col("target_x").as("x"))
        .agg(countDistinct("user_id").as("wau"))
      val dau = du.groupBy("x").agg(count(lit(1)).as("dau"))
      dau.join(wau, "x")
        .select(
          date_format(date_add(to_date(lit("2024-01-01")), col("x").cast("int")),
            "yyyy-MM-dd").as("day"),
          col("dau"), col("wau"),
          (col("x") >= 6).as("full_window"),
          Q.r4(col("dau").cast("double") / col("wau")).as("stickiness"))
        .orderBy("day")
    },

    // Inter-purchase interval (round 11): per nation, the median and
    // mean days between a customer's CONSECUTIVE orders — the
    // repeat-behavior cadence behind q_retention's cohort grid and
    // q_rfm's recency score. Gaps are exact integer days from one lag
    // window over the per-customer order sequence; the nation median
    // then selects EXPLICIT middle ranks (⌊(n+1)/2⌋, ⌊(n+2)/2⌋
    // averaged — the q_theil_sen pattern: rank arithmetic, not either
    // engine's median() interpolation). Scale: one o_custkey window
    // (per-customer bounded), one nation-keyed agg; the per-nation
    // rank window is the honest cost of an exact median — the 100 TB
    // substitute is q_agg_approx_pct's quantile sketch.
    Q("q_interpurchase",
      s"""WITH o AS (SELECT o_custkey,
         |                  CAST(date_diff('day', DATE '1995-01-01',
         |                                 CAST(date_trunc('day', o_orderdate) AS DATE)) AS BIGINT) AS x
         |           FROM orders),
         |g AS (SELECT o_custkey,
         |             x - lag(x) OVER (PARTITION BY o_custkey ORDER BY x) AS gap
         |      FROM o),
         |cn AS (SELECT g.o_custkey, c.c_nationkey, n.n_name, g.gap
         |       FROM g
         |       JOIN customer c ON g.o_custkey = c.c_custkey
         |       JOIN nation n ON c.c_nationkey = n.n_nationkey
         |       WHERE g.gap IS NOT NULL),
         |rk AS (SELECT n_name, gap,
         |              row_number() OVER (PARTITION BY n_name ORDER BY gap) AS rn,
         |              count(*) OVER (PARTITION BY n_name) AS ng
         |       FROM cn),
         |med AS (SELECT n_name, ng, sum(gap) / count(*) AS med0
         |        FROM rk
         |        WHERE rn = CAST(floor((ng + 1) / 2.0) AS BIGINT)
         |           OR rn = CAST(floor((ng + 2) / 2.0) AS BIGINT)
         |        GROUP BY 1, 2),
         |mean AS (SELECT n_name, CAST(sum(gap) AS BIGINT) AS sg, count(*) AS ng2
         |         FROM cn GROUP BY 1)
         |SELECT med.n_name AS nation, med.ng AS n_gaps,
         |       ${Q.sqlR2("med.med0")} AS median_gap_days,
         |       ${Q.sqlR2("CAST(mean.sg AS DOUBLE) / mean.ng2")} AS mean_gap_days
         |FROM med JOIN mean ON med.n_name = mean.n_name
         |ORDER BY nation""".stripMargin) { (s, d) =>
      val wc = Window.partitionBy("o_custkey").orderBy("x")
      val g = Tables.load(s, d, "orders")
        .select(col("o_custkey"),
          datediff(col("o_orderdate").cast(DateType), to_date(lit("1995-01-01")))
            .cast("long").as("x"))
        .withColumn("gap", col("x") - lag("x", 1).over(wc))
        .filter(col("gap").isNotNull)
      val cn = g
        .join(Tables.load(s, d, "customer")
          .select(col("c_custkey").as("o_custkey"), col("c_nationkey")), "o_custkey")
        .join(broadcast(Tables.load(s, d, "nation")
          .select(col("n_nationkey").as("c_nationkey"), col("n_name"))), "c_nationkey")
        .select(col("n_name"), col("gap"))
        // one materialized gap frame under both the median-rank and
        // mean branches — otherwise each re-runs the window + joins
        .transform(Q.snapshot)
      val wn = Window.partitionBy("n_name")
      val rk = cn
        .withColumn("rn", row_number().over(wn.orderBy("gap")))
        .withColumn("ng", count(lit(1)).over(wn))
      val med = rk.filter(col("rn") === floor((col("ng") + 1) / 2.0).cast("long") ||
          col("rn") === floor((col("ng") + 2) / 2.0).cast("long"))
        .groupBy("n_name", "ng")
        .agg((sum("gap") / count(lit(1))).as("med0"))
      val mean = cn.groupBy("n_name")
        .agg(sum("gap").as("sg"), count(lit(1)).as("ng2"))
      med.join(mean, "n_name")
        .select(col("n_name").as("nation"), col("ng").as("n_gaps"),
          Q.r2(col("med0")).as("median_gap_days"),
          Q.r2(col("sg").cast("double") / col("ng2")).as("mean_gap_days"))
        .orderBy("nation")
    },

    // Exact tail percentiles per event type (round 11): p50/p95/p99 of
    // the value distribution WITHOUT interpolation or sketches — the
    // SLO-style readout (q_agg_approx_pct is the sketch path; this is
    // the certifiable exact one). The 100 TB trick is the q_ks_test /
    // q_mann_whitney domain collapse: values are 2-decimal, so the
    // corpus folds into a ≤|cents-domain| distinct-value frame FIRST
    // (map-side partials), the running ECDF is a window over that
    // bounded frame, and each percentile is the FIRST INTEGER CROSSING
    // cum ≥ ⌈q·n⌉ — an integer comparison, no float percentile
    // semantics to disagree on. The corpus is never sorted; only the
    // domain frame is.
    Q("q_tail_exact",
      s"""WITH v AS (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
         |                  count(*) AS k
         |           FROM events GROUP BY 1, 2),
         |w AS (SELECT event_type, c, k,
         |             sum(k) OVER (PARTITION BY event_type ORDER BY c
         |                          ROWS UNBOUNDED PRECEDING) AS cum,
         |             sum(k) OVER (PARTITION BY event_type) AS n
         |      FROM v),
         |p AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         |             min(CASE WHEN cum >= CAST(ceil(0.50 * n) AS BIGINT) THEN c END) AS p50c,
         |             min(CASE WHEN cum >= CAST(ceil(0.95 * n) AS BIGINT) THEN c END) AS p95c,
         |             min(CASE WHEN cum >= CAST(ceil(0.99 * n) AS BIGINT) THEN c END) AS p99c
         |      FROM w GROUP BY 1)
         |SELECT event_type, n,
         |       ${Q.sqlR2("p50c / 100.0")} AS p50_usd,
         |       ${Q.sqlR2("p95c / 100.0")} AS p95_usd,
         |       ${Q.sqlR2("p99c / 100.0")} AS p99_usd
         |FROM p
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val v = Tables.events(s, d)
        .groupBy(col("event_type"), floor(col("value") * 100 + 0.5).cast("long").as("c"))
        .agg(count(lit(1)).as("k"))
      tailFold(v)
    },

    // Diurnal traffic profile (round 11): per (event_type, hour-of-day)
    // counts and within-type shares — q_seasonality's weekly grid at
    // the intraday grain, the capacity-planning / anomaly-baseline
    // companion. One map-side-partial agg onto a |types|×24 grid; the
    // share normalizer is a window over that fixed frame. Integer
    // counts, one IEEE division, r6.
    Q("q_diurnal",
      s"""WITH c AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hh, count(*) AS n
         |           FROM events GROUP BY 1, 2),
         |w AS (SELECT event_type, hh, n,
         |             sum(n) OVER (PARTITION BY event_type) AS tot
         |      FROM c)
         |SELECT event_type, hh, n,
         |       ${Q.sqlR6("CAST(n AS DOUBLE) / tot")} AS share
         |FROM w
         |ORDER BY event_type, hh""".stripMargin) { (s, d) =>
      // routed through the shared (type, day, hour) grid since round
      // 15 — the SAME mergeable frame streaming.Streams.hourlyGrid
      // maintains, so s_diurnal's read-time projection can never
      // drift from this batch op (the day dimension rolls up inside
      // diurnalOf; the extra key costs |days|× more grid cells, all
      // domain-bounded)
      diurnalOf(Tables.events(s, d)
        .groupBy(col("event_type"), Inference.dayIndexCol.as("x"),
          hour(col("ts")).cast("long").as("hh"))
        .agg(count(lit(1)).as("c")))
    },

    // Day-over-day user churn (round 11): per day, how many of
    // yesterday's active users came back — retention_rate =
    // returning/prev_active, churn = its complement — the daily pulse
    // under q_retention's cohort grid and q_stickiness's 7-day ratio.
    // ONE (day, user) fact frame materializes once (the q_stickiness
    // checkpoint move) and feeds all three branches: the daily active
    // counts, and both sides of the adjacent-day self-join that counts
    // returning users. Rates are single IEEE divisions of exact int64
    // counts. Scale: the corpus collapses to the distinct fact frame
    // map-side; the self-join keys on (user, day) — linear, and the
    // per-day rollup is |days|-bounded.
    Q("q_churn",
      s"""WITH du AS (SELECT DISTINCT
         |              CAST(date_diff('day', DATE '2024-01-01',
         |                             CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         |              user_id
         |            FROM events),
         |act AS (SELECT x, count(*) AS active FROM du GROUP BY 1),
         |ret AS (SELECT a.x, count(*) AS returning_users
         |        FROM du a JOIN du b ON a.user_id = b.user_id AND b.x = a.x - 1
         |        GROUP BY 1),
         |j AS (SELECT act.x, act.active, p.active AS prev_active,
         |             COALESCE(ret.returning_users, 0) AS returning_users
         |      FROM act
         |      JOIN act p ON p.x = act.x - 1
         |      LEFT JOIN ret ON ret.x = act.x)
         |SELECT strftime(DATE '2024-01-01' + CAST(x AS INT), '%Y-%m-%d') AS day,
         |       active, prev_active, returning_users,
         |       ${Q.sqlR4("CAST(returning_users AS DOUBLE) / prev_active")} AS retention_rate,
         |       ${Q.sqlR4("CAST(prev_active - returning_users AS DOUBLE) / prev_active")} AS churn_rate
         |FROM j
         |ORDER BY day""".stripMargin) { (s, d) =>
      val du = Tables.events(s, d)
        .select(datediff(col("ts").cast(DateType), to_date(lit("2024-01-01")))
            .cast("long").as("x"),
          col("user_id"))
        .distinct()
        .transform(Q.snapshot)
      val act = du.groupBy("x").agg(count(lit(1)).as("active"))
      val ret = du.as("a")
        .join(du.as("b"),
          col("a.user_id") === col("b.user_id") && col("b.x") === col("a.x") - 1)
        .groupBy(col("a.x").as("x")).agg(count(lit(1)).as("returning_users"))
      act
        .join(act.select((col("x") + 1).as("x"), col("active").as("prev_active")), "x")
        .join(ret, Seq("x"), "left")
        .select(
          date_format(date_add(to_date(lit("2024-01-01")), col("x").cast("int")),
            "yyyy-MM-dd").as("day"),
          col("active"), col("prev_active"),
          coalesce(col("returning_users"), lit(0L)).as("returning_users"),
          Q.r4(coalesce(col("returning_users"), lit(0L)).cast("double") / col("prev_active"))
            .as("retention_rate"),
          Q.r4((col("prev_active") - coalesce(col("returning_users"), lit(0L))).cast("double") /
            col("prev_active")).as("churn_rate"))
        .orderBy("day")
    },

    // 2×2 odds ratio with the Woolf CI (round 13): does clicking
    // associate with high-value purchasing at the USER grain —
    // exposure = any click, outcome = any purchase ≥ $150 (q_abtest's
    // conversion bar), OR = ad/bc with the log-scale CI exp(ln OR ±
    // 1.96·√(1/a+1/b+1/c+1/d)). The case-control companion to
    // q_abtest's two-proportion z (same cells, the OR frame is what a
    // risk analyst quotes). ONE user-grain agg (map-side partial) to
    // four exact int64 cells, then a single-row shared tree; any zero
    // cell NULLs the estimate (the Woolf variance is undefined there).
    Q("q_odds_ratio",
      """WITH u AS (SELECT user_id,
        |                  max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ex,
        |                  max(CASE WHEN event_type = 'purchase' AND value >= 150
        |                           THEN 1 ELSE 0 END) AS conv
        |           FROM events GROUP BY 1),
        |c AS (SELECT CAST(sum(ex * conv) AS BIGINT) AS a,
        |             CAST(sum(ex * (1 - conv)) AS BIGINT) AS b,
        |             CAST(sum((1 - ex) * conv) AS BIGINT) AS c,
        |             CAST(sum((1 - ex) * (1 - conv)) AS BIGINT) AS d
        |      FROM u)
        |SELECT a, b, c, d,
        |       CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
        |         floor(((CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c))*1000000+0.5)/1000000
        |       END AS odds_ratio,
        |       CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
        |         floor((exp(ln((CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c)) -
        |                    1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)))*1000000+0.5)/1000000
        |       END AS ci_lo,
        |       CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
        |         floor((exp(ln((CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c)) +
        |                    1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)))*1000000+0.5)/1000000
        |       END AS ci_hi
        |FROM c""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "click", 1).otherwise(0)).as("ex"),
          max(when(col("event_type") === "purchase" && col("value") >= 150, 1)
            .otherwise(0)).as("conv"))
      val cells = u.agg(
        sum(col("ex") * col("conv")).as("a"),
        sum(col("ex") * (lit(1) - col("conv"))).as("b"),
        sum((lit(1) - col("ex")) * col("conv")).as("c"),
        sum((lit(1) - col("ex")) * (lit(1) - col("conv"))).as("d"))
      val pos = col("a") > 0 && col("b") > 0 && col("c") > 0 && col("d") > 0
      val or = (col("a").cast("double") * col("d")) / (col("b").cast("double") * col("c"))
      val se = sqrt(lit(1.0) / col("a") + lit(1.0) / col("b") +
        lit(1.0) / col("c") + lit(1.0) / col("d"))
      cells.select(col("a"), col("b"), col("c"), col("d"),
        when(pos, Q.r6(or)).as("odds_ratio"),
        when(pos, Q.r6(exp(log(or) - lit(1.96) * se))).as("ci_lo"),
        when(pos, Q.r6(exp(log(or) + lit(1.96) * se))).as("ci_hi"))
    },

    // Decile lift/gains curve (round 13): rank users by total event
    // volume into activity deciles, read each decile's high-value
    // conversion rate against the base rate — "how concentrated is
    // conversion in the most active users", the targeting-value
    // readout behind every outreach-sizing decision (cum_gain at
    // decile k = share of all converters reachable by targeting the
    // top k/10). The oracle states it as ntile(10) ORDER BY (vol
    // DESC, user_id); the Spark side computes the IDENTICAL rank
    // scalably — a global ntile would single-partition every user, so
    // instead the bounded vol count-grid carries cumulative offsets
    // (broadcast), each user's global rank is offset + row_number
    // WITHIN its vol cohort (partitioned, never global), and the
    // standard ntile bucket formula (first N mod 10 buckets one
    // larger) maps ranks to deciles in exact int64.
    Q("q_lift_curve",
      """WITH u AS (SELECT user_id, count(*) AS vol,
        |                  max(CASE WHEN event_type = 'purchase' AND value >= 150
        |                           THEN 1 ELSE 0 END) AS conv
        |           FROM events GROUP BY 1),
        |t AS (SELECT conv, ntile(10) OVER (ORDER BY vol DESC, user_id) AS decile FROM u),
        |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
        |             CAST(sum(conv) AS BIGINT) AS n_conv
        |      FROM t GROUP BY 1),
        |w AS (SELECT decile, n_users, n_conv,
        |             CAST(sum(n_conv) OVER (ORDER BY decile) AS BIGINT) AS cum_conv,
        |             CAST(sum(n_conv) OVER () AS BIGINT) AS tot_conv,
        |             CAST(sum(n_users) OVER () AS BIGINT) AS tot_users
        |      FROM g)
        |SELECT CAST(decile AS BIGINT) AS decile, n_users, n_conv,
        |       floor((CAST(n_conv AS DOUBLE) / n_users)*1000000+0.5)/1000000 AS conv_rate,
        |       CASE WHEN tot_conv > 0 THEN
        |         floor(((CAST(n_conv AS DOUBLE) / n_users) /
        |                (CAST(tot_conv AS DOUBLE) / tot_users))*1000000+0.5)/1000000
        |       END AS lift,
        |       CASE WHEN tot_conv > 0 THEN
        |         floor((CAST(cum_conv AS DOUBLE) / tot_conv)*1000000+0.5)/1000000
        |       END AS cum_gain
        |FROM w
        |ORDER BY decile""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("vol"),
          max(when(col("event_type") === "purchase" && col("value") >= 150, 1)
            .otherwise(0)).as("conv"))
        .transform(Q.snapshot)
      val g = withVolDecile(u)
        .groupBy("decile")
        .agg(count(lit(1)).as("n_users"), sum("conv").as("n_conv"))
      val w = g
        .withColumn("cum_conv", sum("n_conv").over(
          Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot_conv", sum("n_conv").over(Window.partitionBy()))
        .withColumn("tot_users", sum("n_users").over(Window.partitionBy()))
      w.select(col("decile"), col("n_users"), col("n_conv"),
          Q.r6(col("n_conv").cast("double") / col("n_users")).as("conv_rate"),
          when(col("tot_conv") > 0,
            Q.r6((col("n_conv").cast("double") / col("n_users")) /
              (col("tot_conv").cast("double") / col("tot_users")))).as("lift"),
          when(col("tot_conv") > 0,
            Q.r6(col("cum_conv").cast("double") / col("tot_conv"))).as("cum_gain"))
        .orderBy("decile")
    },

    // Qini uplift curve by volume decile (round 15): q_lift_curve's
    // response curve, split by a deterministic treatment assignment
    // (user_id parity — the reproducible A/B hash every user carries)
    // into the INCREMENTAL-conversions readout: qini(d) = cumConv_T −
    // cumConv_C·cumN_T/cumN_C, the absolute-number Qini curve, plus
    // the per-decile cumulative uplift rate. Bucketing goes through
    // the SAME withVolDecile band-offset ntile as q_lift_curve (one
    // home — the two curves cannot disagree), so every window rides a
    // bounded frame; cum sums are exact int64 over the 10-row decile
    // frame and the two divisions happen last, NULL-guarded when a
    // cumulative control arm is empty.
    Q("q_qini",
      s"""WITH u AS (SELECT user_id, count(*) AS vol,
         |                  max(CASE WHEN event_type = 'purchase' AND value >= 150
         |                           THEN 1 ELSE 0 END) AS conv,
         |                  user_id % 2 AS trt
         |           FROM events GROUP BY 1),
         |t AS (SELECT conv, trt, ntile(10) OVER (ORDER BY vol DESC, user_id) AS decile FROM u),
         |g AS (SELECT decile, CAST(sum(trt) AS BIGINT) AS n_t,
         |             CAST(sum(1 - trt) AS BIGINT) AS n_c,
         |             CAST(sum(trt * conv) AS BIGINT) AS conv_t,
         |             CAST(sum((1 - trt) * conv) AS BIGINT) AS conv_c
         |      FROM t GROUP BY 1),
         |w AS (SELECT decile, n_t, n_c, conv_t, conv_c,
         |             CAST(sum(n_t) OVER (ORDER BY decile) AS BIGINT) AS cn_t,
         |             CAST(sum(n_c) OVER (ORDER BY decile) AS BIGINT) AS cn_c,
         |             CAST(sum(conv_t) OVER (ORDER BY decile) AS BIGINT) AS cc_t,
         |             CAST(sum(conv_c) OVER (ORDER BY decile) AS BIGINT) AS cc_c
         |      FROM g)
         |SELECT CAST(decile AS BIGINT) AS decile, n_t, n_c, conv_t, conv_c,
         |       CASE WHEN cn_c > 0 THEN ${Q.sqlR6("cc_t - CAST(cc_c AS DOUBLE) * cn_t / cn_c")} END AS qini,
         |       CASE WHEN cn_t > 0 AND cn_c > 0 THEN ${Q.sqlR6("CAST(cc_t AS DOUBLE) / cn_t - CAST(cc_c AS DOUBLE) / cn_c")} END AS uplift
         |FROM w
         |ORDER BY decile""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("vol"),
          max(when(col("event_type") === "purchase" && col("value") >= 150, 1)
            .otherwise(0)).as("conv"))
        .withColumn("trt", col("user_id") % 2)
        .transform(Q.snapshot)
      val g = withVolDecile(u)
        .groupBy("decile")
        .agg(sum("trt").as("n_t"), sum(lit(1) - col("trt")).as("n_c"),
          sum(col("trt") * col("conv")).as("conv_t"),
          sum((lit(1) - col("trt")) * col("conv")).as("conv_c"))
      val wo = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.withColumn("cn_t", sum("n_t").over(wo))
        .withColumn("cn_c", sum("n_c").over(wo))
        .withColumn("cc_t", sum("conv_t").over(wo))
        .withColumn("cc_c", sum("conv_c").over(wo))
        .select(col("decile").cast("long").as("decile"),
          col("n_t"), col("n_c"), col("conv_t"), col("conv_c"),
          when(col("cn_c") > 0,
            Q.r6(col("cc_t") - col("cc_c").cast("double") * col("cn_t") / col("cn_c")))
            .as("qini"),
          when(col("cn_t") > 0 && col("cn_c") > 0,
            Q.r6(col("cc_t").cast("double") / col("cn_t") -
              col("cc_c").cast("double") / col("cn_c"))).as("uplift"))
        .orderBy("decile")
    },

    // 10%-trimmed mean of event value per type (round 14): the robust
    // location readout beside q_winsorize (which CLIPS the tails — the
    // trim DROPS them) and q_mad_outliers. Exactness: the corpus
    // collapses onto the bounded (type, v100) cents grid; each cell's
    // kept multiplicity is the integer overlap of its rank interval
    // (cum−c, cum] with the kept band (k, n−k], so the trimmed sum is
    // an exact int64 fold and the one division happens on it. Scale:
    // per-type cumulative windows run over the DOMAIN-bounded grid,
    // never raw events.
    Q("q_trimmed_mean",
      s"""WITH v AS (SELECT event_type,
         |                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v100 FROM events),
         |c AS (SELECT event_type, v100, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2),
         |r AS (SELECT event_type, v100, c,
         |             CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v100
         |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |             CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
         |      FROM c),
         |k AS (SELECT *, CAST(floor(n / 10.0) AS BIGINT) AS k FROM r),
         |s AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n, CAST(max(k) AS BIGINT) AS k,
         |             CAST(sum(v100 * GREATEST(0, LEAST(cum, n - k) -
         |               GREATEST(cum - c, k))) AS BIGINT) AS ts100
         |      FROM k GROUP BY 1)
         |SELECT event_type, n,
         |       ${Q.sqlR6("CAST(ts100 AS DOUBLE) / (100.0 * (n - 2 * k))")} AS trimmed_mean
         |FROM s ORDER BY event_type""".stripMargin) { (s, d) =>
      trimmedMeanOf(typeCents(s, d))
    },

    // Inter-event gap histogram (round 15): the distribution every
    // sessionization threshold is read off — per user, the seconds
    // between consecutive events (any type), bucketed onto log2 bands
    // via the exact integer BIT-LENGTH path (no double log anywhere,
    // the q_abc_class move), with each band's share and the cumulative
    // share (the knee locates the session gap; q_sessionize's 1800 s
    // sits in band 10/11). Gaps are exact int64 epoch-second
    // differences under the (es, event_id) total order; the histogram
    // is LATTICE-bounded (≤ ~32 bands). One user_id exchange, then
    // windows over the bounded band grid only.
    Q("q_gap_hist",
      s"""WITH e AS (SELECT user_id, event_id, ${Q.sqlEpochSec("ts")} AS es FROM events),
         |g AS (SELECT user_id,
         |             es - lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id) AS gap
         |      FROM e),
         |b AS (SELECT CAST(length(bin(gap + 1)) - 1 AS BIGINT) AS bucket
         |      FROM g WHERE gap IS NOT NULL),
         |c AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_gaps FROM b GROUP BY 1),
         |w AS (SELECT bucket, n_gaps,
         |             CAST(sum(n_gaps) OVER () AS BIGINT) AS tot,
         |             CAST(sum(n_gaps) OVER (ORDER BY bucket
         |                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |      FROM c)
         |SELECT bucket, n_gaps,
         |       ${Q.sqlR6("CAST(n_gaps AS DOUBLE) / tot")} AS share,
         |       ${Q.sqlR6("CAST(cum AS DOUBLE) / tot")} AS cum_share
         |FROM w
         |ORDER BY bucket""".stripMargin) { (s, d) =>
      val wu = Window.partitionBy("user_id").orderBy("es", "event_id")
      gapHistOf(Tables.events(s, d)
        .select(col("user_id"), col("event_id"), Q.epochSec(col("ts")).as("es"))
        .withColumn("gap", col("es") - lag("es", 1).over(wu))
        .filter(col("gap").isNotNull)
        .select((length(bin(col("gap") + 1)) - 1).cast("long").as("bucket")))
    },

    // Weight-of-evidence / information value of brand vs return risk
    // (round 15): the credit-scoring companion of q_target_encode —
    // per brand, WoE = ln(gs/bs) over the half-adjusted class shares
    // gs = (good+0.5)/(G+0.5k), bs = (bad+0.5)/(B+0.5k) (the standard
    // zero-cell adjustment, k = |brands|), with each brand's IV
    // contribution (gs−bs)·WoE and the global IV. Label: bad = a
    // returned line (l_returnflag = 'R'). Exactness: counts are pure
    // int64 off one fact-scan agg; the shares/WoE/IV are mirrored
    // double trees on the |brands|-row frame, per-brand IV terms
    // floor onto the 1e-9 lattice before the bounded-frame window
    // sum. Scale: one part-keyed catalog join, |brands|-key agg,
    // windows only over that bounded frame.
    Q("q_woe_iv",
      s"""WITH j AS (SELECT p.p_brand,
         |                  CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS bad
         |           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
         |g AS (SELECT p_brand, CAST(sum(1 - bad) AS BIGINT) AS n_good,
         |             CAST(sum(bad) AS BIGINT) AS n_bad
         |      FROM j GROUP BY 1),
         |t AS (SELECT *, CAST(sum(n_good) OVER () AS BIGINT) AS gt,
         |             CAST(sum(n_bad) OVER () AS BIGINT) AS bt,
         |             CAST(count(*) OVER () AS BIGINT) AS k
         |      FROM g),
         |w AS (SELECT *,
         |             ln(((n_good + 0.5) / (gt + 0.5 * k)) / ((n_bad + 0.5) / (bt + 0.5 * k))) AS woe,
         |             CAST(floor((((n_good + 0.5) / (gt + 0.5 * k)) - ((n_bad + 0.5) / (bt + 0.5 * k))) * ln(((n_good + 0.5) / (gt + 0.5 * k)) / ((n_bad + 0.5) / (bt + 0.5 * k))) * 1e9 + 0.5) AS BIGINT) AS iv9
         |      FROM t),
         |f AS (SELECT *, CAST(sum(iv9) OVER () AS BIGINT) AS ivt9 FROM w)
         |SELECT p_brand, n_good, n_bad,
         |       ${Q.sqlR6("woe")} AS woe,
         |       ${Q.sqlR6("iv9 / 1e9")} AS iv_term,
         |       ${Q.sqlR6("ivt9 / 1e9")} AS iv
         |FROM f
         |ORDER BY p_brand""".stripMargin) { (s, d) =>
      woeOf(Tables.load(s, d, "lineitem")
        .join(Tables.load(s, d, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("bad"))
        .groupBy("p_brand")
        .agg(sum(lit(1) - col("bad")).as("n_good"), sum("bad").as("n_bad")))
    },

    // Smoothed target encoding of brand → line revenue (round 14): the
    // ML-feature-prep staple — encode a categorical by the target mean,
    // shrunk toward the global prior by a pseudo-count so rare brands
    // don't memorize noise: enc = (Σy + m·prior)/(n + m), m = 20.
    // Beside it the LEAVE-ONE-OUT stability readout: the variance of
    // the per-row LOO estimates (S−yᵢ)/(n−1) collapses onto
    // Var(y)/(n−1)² — a pure moment identity, so the leakage-audit
    // number costs NOTHING beyond the (n, Σy, Σy²) the encoding
    // already aggregates (no per-row second pass). Exactness: y =
    // ⌊l_extendedprice⌋ keeps every Σ and square exact int64 (the
    // q_anova integerization; ss ≤ 1e10·|lineitem| ⇒ ceiling sf ≈ 77);
    // divisions at the end through mirrored trees. Scale: one
    // catalog join + a |brands|-key agg; the global prior is a window
    // over the bounded brand frame.
    Q("q_target_encode",
      s"""WITH j AS (SELECT p.p_brand, CAST(floor(l.l_extendedprice) AS BIGINT) AS y
         |           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
         |g AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS ss
         |      FROM j GROUP BY 1),
         |t AS (SELECT *, CAST(sum(n) OVER () AS BIGINT) AS nt,
         |             CAST(sum(s) OVER () AS BIGINT) AS st FROM g)
         |SELECT p_brand, n,
         |       ${Q.sqlR6(s"(CAST(s AS DOUBLE) + $TePrior * (CAST(st AS DOUBLE) / nt)) / (n + $TePrior)")} AS enc,
         |       CASE WHEN n >= 2 THEN
         |         ${Q.sqlR6("sqrt(((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n) / " +
                   "(CAST(n - 1 AS DOUBLE) * (n - 1)))")}
         |       END AS loo_sd
         |FROM t ORDER BY p_brand""".stripMargin) { (s, d) =>
      targetEncodeOf(
        Tables.load(s, d, "lineitem")
          .select(col("l_partkey"), floor(col("l_extendedprice")).cast("long").as("y"))
          .join(Tables.load(s, d, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"), sum("y").as("s"), sum(col("y") * col("y")).as("ss")))
    },

    // Bowley (quartile) skewness of event value per type (round 14):
    // the robust complement of q_jarque_bera's moment-based skew — a
    // single far outlier moves moments, not quartiles. Lower-quantile
    // convention (first value whose cumulative count reaches ⌈p·n⌉)
    // keeps every quartile an INTEGER rank probe on the cents grid;
    // the skew is one division of exact int64 cents. | NULL when the
    // quartile range is degenerate (q3 = q1).
    Q("q_quantile_skew",
      s"""WITH v AS (SELECT event_type,
         |                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v100 FROM events),
         |c AS (SELECT event_type, v100, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2),
         |r AS (SELECT event_type, v100,
         |             CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v100
         |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |             CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
         |      FROM c),
         |q AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         |             CAST(min(CASE WHEN cum >= CAST(floor((n + 3) / 4.0) AS BIGINT)
         |               THEN v100 END) AS BIGINT) AS q1,
         |             CAST(min(CASE WHEN cum >= CAST(floor((n + 1) / 2.0) AS BIGINT)
         |               THEN v100 END) AS BIGINT) AS q2,
         |             CAST(min(CASE WHEN cum >= CAST(floor((3 * n + 3) / 4.0) AS BIGINT)
         |               THEN v100 END) AS BIGINT) AS q3
         |      FROM r GROUP BY 1)
         |SELECT event_type, n,
         |       CAST(q1 AS DOUBLE) / 100 AS q1_val,
         |       CAST(q2 AS DOUBLE) / 100 AS median_val,
         |       CAST(q3 AS DOUBLE) / 100 AS q3_val,
         |       CASE WHEN q3 > q1 THEN
         |         ${Q.sqlR6("CAST(q3 + q1 - 2 * q2 AS DOUBLE) / (q3 - q1)")}
         |       END AS bowley
         |FROM q ORDER BY event_type""".stripMargin) { (s, d) =>
      bowleyOf(typeCents(s, d))
    },

    // Order-free Shapley channel attribution (round 16): the
    // game-theoretic split of conversion credit across the four
    // non-purchase channels — each user contributes their TOUCHED-SET
    // bitmask, the coalition worth v(S) = conversions by users whose
    // whole touch set fits inside S, and φ(i) sums the marginal
    // v(S∪i) − v(S) under the exact Shapley weights. With n = 4
    // channels the weights |S|!(3−|S|)!/4! are the rationals
    // {6,2,2,6}/24, so φ·24 is PURE int64 — the entire computation
    // after the one user-keyed agg is integer arithmetic over a
    // 16-mask × 4-channel literal grid. Efficiency (Σφ = v(full) −
    // v(∅)) holds as an integer identity.
    Q("q_shapley_attribution",
      s"""WITH u AS (SELECT user_id,
         |                  max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) +
         |                  2 * max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) +
         |                  4 * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) +
         |                  8 * max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS mask,
         |                  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
         |           FROM events GROUP BY 1),
         |mc AS (SELECT mask, CAST(count(*) AS BIGINT) AS n_users,
         |              CAST(sum(conv) AS BIGINT) AS n_conv
         |       FROM u GROUP BY 1),
         |sg AS (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS st),
         |v AS (SELECT sg.st, CAST(coalesce(sum(mc.n_conv), 0) AS BIGINT) AS v
         |      FROM sg LEFT JOIN mc ON (mc.mask & sg.st) = mc.mask
         |      GROUP BY 1),
         |ch AS (SELECT * FROM (VALUES ('click', CAST(1 AS BIGINT)),
         |                             ('error', CAST(2 AS BIGINT)),
         |                             ('signup', CAST(4 AS BIGINT)),
         |                             ('view', CAST(8 AS BIGINT))) AS t(channel, bit)),
         |ph AS (SELECT ch.channel, ch.bit,
         |              CAST(sum((CASE bit_count(sg.st)
         |                          WHEN 0 THEN 6 WHEN 1 THEN 2
         |                          WHEN 2 THEN 2 ELSE 6 END) *
         |                       (vw.v - vo.v)) AS BIGINT) AS phi24
         |       FROM ch JOIN sg ON (sg.st & ch.bit) = 0
         |       JOIN v vo ON vo.st = sg.st
         |       JOIN v vw ON vw.st = sg.st + ch.bit
         |       GROUP BY 1, 2),
         |tc AS (SELECT ch.channel,
         |              CAST(coalesce(sum(mc.n_users), 0) AS BIGINT) AS n_touched,
         |              CAST(coalesce(sum(mc.n_conv), 0) AS BIGINT) AS n_conv_touched
         |       FROM ch LEFT JOIN mc ON (mc.mask & ch.bit) <> 0
         |       GROUP BY 1),
         |tot AS (SELECT CAST(sum(phi24) AS BIGINT) AS t FROM ph)
         |SELECT ph.channel, tc.n_touched, tc.n_conv_touched,
         |       ${Q.sqlR4("CAST(ph.phi24 AS DOUBLE) / 24")} AS shapley_conversions,
         |       CASE WHEN tot.t > 0 THEN
         |         ${Q.sqlR6("CAST(ph.phi24 AS DOUBLE) / tot.t")}
         |       END AS share
         |FROM ph JOIN tc ON ph.channel = tc.channel
         |CROSS JOIN tot
         |ORDER BY ph.channel""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg((max(when(col("event_type") === "click", 1).otherwise(0)) +
          lit(2) * max(when(col("event_type") === "error", 1).otherwise(0)) +
          lit(4) * max(when(col("event_type") === "signup", 1).otherwise(0)) +
          lit(8) * max(when(col("event_type") === "view", 1).otherwise(0)))
          .cast("long").as("mask"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
      val mc = Q.snapshot(u.groupBy("mask")
        .agg(count(lit(1)).as("n_users"), sum("conv").as("n_conv")))
      val sg = Tables.events(s, d).sparkSession.range(0, 16)
        .select(col("id").as("st"))
      val v = Q.snapshot(sg.join(mc, mc("mask").bitwiseAND(col("st")) === mc("mask"), "left")
        .groupBy("st").agg(coalesce(sum("n_conv"), lit(0L)).as("v")))
      val ch = Tables.events(s, d).sparkSession
        .createDataFrame(Seq(("click", 1L), ("error", 2L), ("signup", 4L), ("view", 8L)))
        .toDF("channel", "bit")
      val w24 = expr("CASE bit_count(st) WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END")
      val vo = v.select(col("st").as("so"), col("v").as("vo"))
      val vw = v.select(col("st").as("sw"), col("v").as("vw"))
      val ph = ch.join(broadcast(sg), col("st").bitwiseAND(col("bit")) === 0)
        .join(broadcast(vo), col("so") === col("st"))
        .join(broadcast(vw), col("sw") === col("st") + col("bit"))
        .groupBy("channel", "bit")
        .agg(sum(w24 * (col("vw") - col("vo"))).as("phi24"))
      val tc = ch.join(broadcast(mc), mc("mask").bitwiseAND(ch("bit")) =!= 0, "left")
        .groupBy("channel")
        .agg(coalesce(sum("n_users"), lit(0L)).as("n_touched"),
          coalesce(sum("n_conv"), lit(0L)).as("n_conv_touched"))
      val tot = ph.agg(sum("phi24").as("t"))
      ph.join(tc, "channel").crossJoin(broadcast(tot))
        .select(col("channel"), col("n_touched"), col("n_conv_touched"),
          Q.r4(col("phi24").cast("double") / 24).as("shapley_conversions"),
          when(col("t") > 0, Q.r6(col("phi24").cast("double") / col("t"))).as("share"))
        .orderBy("channel")
    },

    // Markov removal-effect attribution (round 16): the
    // first-order-chain credit split — build the journey chain
    // (start → channels → conv/null, truncated at the FIRST purchase,
    // non-converters terminate in null), then for each channel ask
    // "how much conversion reach dies if this state is removed"
    // (transitions into it redirect to null, un-renormalized — the
    // standard removal semantics). Reach is a 12-step truncated-
    // horizon mass propagation with conv/null self-absorbing; all 5
    // chains (full + 4 removals) propagate in ONE chain-tagged frame,
    // and every step's mass·prob products floor onto the 1e12 lattice
    // BEFORE the per-state sums (the q_markov_stationary fold) — both
    // engines carry bit-identical vectors between steps. Removal
    // effects lattice to 1e9 before the share division, so the
    // 4-row attribution readout is integer-decided.
    Q("q_markov_attribution",
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |                  ${Q.sqlEpochSec("ts")} AS es FROM events),
         |k AS (SELECT user_id, event_id, event_type, es,
         |             coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |               OVER (PARTITION BY user_id ORDER BY es * 100000000 + event_id
         |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pb
         |      FROM e),
         |j AS (SELECT user_id,
         |             CASE WHEN event_type = 'purchase' THEN 'conv' ELSE event_type END AS st,
         |             row_number() OVER (PARTITION BY user_id
         |                                ORDER BY es * 100000000 + event_id) AS rn,
         |             lead(CASE WHEN event_type = 'purchase' THEN 'conv'
         |                       ELSE event_type END) OVER (PARTITION BY user_id
         |                                ORDER BY es * 100000000 + event_id) AS nxt
         |      FROM k WHERE pb = 0),
         |tr AS (SELECT 'start' AS cur, st AS nxt FROM j WHERE rn = 1
         |       UNION ALL
         |       SELECT st, nxt FROM j WHERE nxt IS NOT NULL
         |       UNION ALL
         |       SELECT st, 'null' FROM j WHERE nxt IS NULL AND st <> 'conv'),
         |c AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n FROM tr GROUP BY 1, 2),
         |m AS (SELECT cur, nxt,
         |             CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY cur) AS BIGINT) AS prob
         |      FROM c),
         |ch AS (SELECT * FROM (VALUES (0, ''), (1, 'click'), (2, 'error'),
         |                             (3, 'signup'), (4, 'view')) AS t(chain, removed)),
         |ma AS (SELECT ch.chain, m.cur,
         |              CASE WHEN m.nxt = ch.removed THEN 'null' ELSE m.nxt END AS nxt,
         |              CAST(sum(CAST(floor(m.prob * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS p12
         |       FROM ch JOIN m ON m.cur <> ch.removed
         |       GROUP BY 1, 2, 3
         |       UNION ALL
         |       SELECT chain, s.st, s.st, CAST(1000000000000 AS BIGINT)
         |       FROM ch CROSS JOIN (SELECT 'conv' AS st UNION ALL SELECT 'null') s),
         |mm AS (SELECT chain, cur, nxt, CAST(p12 AS DOUBLE) / 1e12 AS prob FROM ma),
         |q0 AS (SELECT chain, 'start' AS st, 1.0 AS p FROM ch),
         |${(1 to 12).map { st =>
        val prev = if (st == 1) "q0" else s"q${st - 1}"
        s"""p$st AS (SELECT mm.chain, mm.nxt AS st,
           |             CAST(sum(CAST(floor($prev.p * mm.prob * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS s12
           |      FROM mm JOIN $prev ON $prev.chain = mm.chain AND $prev.st = mm.cur
           |      GROUP BY 1, 2),
           |q$st AS (SELECT chain, st, CAST(s12 AS DOUBLE) / 1e12 AS p FROM p$st)""".stripMargin
      }.mkString(",\n")},
         |rf AS (SELECT p AS reach FROM q12 WHERE chain = 0 AND st = 'conv'),
         |rr AS (SELECT ch.removed AS channel,
         |              coalesce(q.p, 0.0) AS reach_removed
         |       FROM ch LEFT JOIN (SELECT chain, p FROM q12 WHERE st = 'conv') q
         |         ON q.chain = ch.chain
         |       WHERE ch.chain > 0),
         |re AS (SELECT channel, reach_removed,
         |              CASE WHEN rf.reach > 0 THEN
         |                CAST(floor((rf.reach - reach_removed) / rf.reach * 1e9 + 0.5) AS BIGINT)
         |              ELSE 0 END AS rem9,
         |              rf.reach AS reach_full
         |       FROM rr CROSS JOIN rf),
         |tt AS (SELECT CAST(sum(rem9) AS BIGINT) AS t FROM re)
         |SELECT re.channel, ${Q.sqlR6("re.reach_full")} AS reach_full,
         |       ${Q.sqlR6("re.reach_removed")} AS reach_removed,
         |       ${Q.sqlR6("CAST(re.rem9 AS DOUBLE) / 1e9")} AS removal_effect,
         |       CASE WHEN tt.t > 0 THEN ${Q.sqlR6("CAST(re.rem9 AS DOUBLE) / tt.t")} END AS attribution
         |FROM re CROSS JOIN tt
         |ORDER BY re.channel""".stripMargin) { (s, d) =>
      val ma = markovTransitions(s, d)
      val ch = Tables.events(s, d).sparkSession
        .createDataFrame(Seq((0, ""), (1, "click"), (2, "error"),
          (3, "signup"), (4, "view"))).toDF("chain", "removed")
      // The 12 matrix-power rounds run IN-ROW over one (chain, edges)
      // row per removal chain (r18): the r17 loop was 12 joins + 12
      // aggregations over ≤180-row frames — ~24 scheduler-bound tiny
      // stages (~1.3 s of the query at sf0.1) for a state space that is
      // |event_type domain| + start/conv/null ≈ 7. markov_conv_reach
      // (functions/MarkovReach.scala) applies the IDENTICAL per-term
      // lattice arithmetic (floor(p·prob·1e12 + 0.5), summed as exact
      // int64 per nxt, ÷1e12; an entry exists exactly where the join
      // produced a row) in one compiled loop — value-identical, pinned
      // by the unchanged oracle's unrolled 12-CTE chain. At 100 TB the
      // transition matrix is still domain-bounded, so the in-row fold
      // scales.
      val q12 = Q.snapshot(ma.groupBy("chain")
        .agg(collect_list(struct(col("cur"), col("nxt"), col("p12"))).as("edges"))
        .select(col("chain"),
          graft.functions.MarkovConvReach.markov_conv_reach(col("edges")).as("p"))
        .filter(col("p").isNotNull))
      val rf = q12.filter(col("chain") === 0).select(col("p").as("reach_full"))
      val rr = ch.filter(col("chain") > 0)
        .join(q12.select(col("chain"), col("p").as("reach_removed")), Seq("chain"), "left")
        .select(col("removed").as("channel"),
          coalesce(col("reach_removed"), lit(0.0)).as("reach_removed"))
      val re = rr.crossJoin(broadcast(rf))
        .withColumn("rem9",
          when(col("reach_full") > 0,
            floor((col("reach_full") - col("reach_removed")) / col("reach_full") *
              lit(1e9) + 0.5).cast("long"))
            .otherwise(0L))
      val tt = re.agg(sum("rem9").as("t"))
      re.crossJoin(broadcast(tt))
        .select(col("channel"), Q.r6(col("reach_full")).as("reach_full"),
          Q.r6(col("reach_removed")).as("reach_removed"),
          Q.r6(col("rem9").cast("double") / lit(1e9)).as("removal_effect"),
          when(col("t") > 0, Q.r6(col("rem9").cast("double") / col("t"))).as("attribution"))
        .orderBy("channel")
    },

    // U-shaped (position-based) attribution (round 16): 40% of each
    // conversion's credit to the first touch, 40% to the last, 20%
    // split across the middle — the industry-default compromise
    // between first- and last-touch, completing the attribution
    // family (last/linear = q_attribution, game-theoretic =
    // q_shapley_attribution, path-based = q_markov_attribution).
    // Paths = each converting user's channel touches before their
    // FIRST purchase; each touch's credit is a 1e6-latticed integer
    // (1-touch paths 1e6, 2-touch 5e5/5e5, else 4e5/⌊2e5/(len−2)⌉/4e5)
    // so per-channel credit is an order-free int64 fold.
    Q("q_position_attribution",
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |                  ${Q.sqlEpochSec("ts")} AS es FROM events),
         |fp AS (SELECT user_id, min(es * 100000000 + event_id) AS ford
         |       FROM e WHERE event_type = 'purchase' GROUP BY 1),
         |tc AS (SELECT e.user_id, e.event_type,
         |              row_number() OVER (PARTITION BY e.user_id
         |                                 ORDER BY e.es * 100000000 + e.event_id) AS rn,
         |              count(*) OVER (PARTITION BY e.user_id) AS len
         |       FROM e JOIN fp ON e.user_id = fp.user_id
         |       WHERE e.event_type <> 'purchase'
         |         AND e.es * 100000000 + e.event_id < fp.ford),
         |cr AS (SELECT event_type AS channel,
         |              CASE WHEN len = 1 THEN 1000000
         |                   WHEN len = 2 THEN 500000
         |                   WHEN rn = 1 OR rn = len THEN 400000
         |                   ELSE CAST(floor(200000.0 / (len - 2) + 0.5) AS BIGINT)
         |              END AS c6
         |       FROM tc),
         |g AS (SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
         |             CAST(sum(c6) AS BIGINT) AS credit6
         |      FROM cr GROUP BY 1),
         |tt AS (SELECT CAST(sum(credit6) AS BIGINT) AS t FROM g)
         |SELECT g.channel, g.n_touches,
         |       ${Q.sqlR4("CAST(g.credit6 AS DOUBLE) / 1e6")} AS credit_conversions,
         |       ${Q.sqlR6("CAST(g.credit6 AS DOUBLE) / tt.t")} AS share
         |FROM g CROSS JOIN tt
         |ORDER BY g.channel""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          Q.epochSec(col("ts")).as("es"))
        .withColumn("ord", col("es") * Q.PackBase + col("event_id"))
      val fp = e.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min("ord").as("ford"))
      val wu = Window.partitionBy("user_id").orderBy("ord")
      val tc = e.join(fp, "user_id")
        .filter(col("event_type") =!= "purchase" && col("ord") < col("ford"))
        .withColumn("rn", row_number().over(wu))
        .withColumn("len", count(lit(1)).over(Window.partitionBy("user_id")))
      val g = tc.select(col("event_type").as("channel"),
          when(col("len") === 1, 1000000L)
            .when(col("len") === 2, 500000L)
            .when(col("rn") === 1 || col("rn") === col("len"), 400000L)
            .otherwise(floor(lit(200000.0) / (col("len") - 2) + 0.5).cast("long")).as("c6"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_touches"), sum("c6").as("credit6"))
        .transform(Q.snapshot)
      val tt = g.agg(sum("credit6").as("t"))
      g.crossJoin(broadcast(tt))
        .select(col("channel"), col("n_touches"),
          Q.r4(col("credit6").cast("double") / lit(1e6)).as("credit_conversions"),
          Q.r6(col("credit6").cast("double") / col("t")).as("share"))
        .orderBy("channel")
    },

    // Value-segment migration matrix (round 16): each user's purchase
    // spend classes them (none / low / mid / high at fixed cents
    // thresholds — per-user volume is SF-invariant by construction,
    // the q_rfm convention) in the window's FIRST and SECOND half;
    // the 16-cell transition matrix with row-conditional rates is the
    // churn-and-upsell readout a CRM runs between periods. All spend
    // sums exact int64 cents off ONE user-keyed agg (both halves in
    // the same pass — no second corpus scan); rates divide the
    // bounded 16-cell frame at readout.
    Q("q_rfm_migration",
      s"""WITH u AS (SELECT user_id,
         |                  CAST(sum(CASE WHEN event_type = 'purchase' AND
         |                                     ts < TIMESTAMP '2024-01-16'
         |                                THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
         |                                ELSE 0 END) AS BIGINT) AS s1,
         |                  CAST(sum(CASE WHEN event_type = 'purchase' AND
         |                                     ts >= TIMESTAMP '2024-01-16'
         |                                THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
         |                                ELSE 0 END) AS BIGINT) AS s2
         |           FROM events GROUP BY 1),
         |cl AS (SELECT CASE WHEN s1 = 0 THEN 'none' WHEN s1 < 25000 THEN 'low'
         |                   WHEN s1 < 45000 THEN 'mid' ELSE 'high' END AS class_h1,
         |              CASE WHEN s2 = 0 THEN 'none' WHEN s2 < 25000 THEN 'low'
         |                   WHEN s2 < 45000 THEN 'mid' ELSE 'high' END AS class_h2
         |       FROM u),
         |g AS (SELECT class_h1, class_h2, CAST(count(*) AS BIGINT) AS n_users
         |      FROM cl GROUP BY 1, 2),
         |rt AS (SELECT class_h1, CAST(sum(n_users) AS BIGINT) AS row_n FROM g GROUP BY 1)
         |SELECT g.class_h1, g.class_h2, g.n_users,
         |       ${Q.sqlR6("CAST(g.n_users AS DOUBLE) / rt.row_n")} AS row_rate
         |FROM g JOIN rt ON g.class_h1 = rt.class_h1
         |ORDER BY g.class_h1, g.class_h2""".stripMargin) { (s, d) =>
      val mid = lit("2024-01-16").cast("timestamp")
      val cents = floor(col("value") * 100 + 0.5).cast("long")
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(sum(when(col("event_type") === "purchase" && col("ts") < mid, cents)
          .otherwise(0L)).as("s1"),
          sum(when(col("event_type") === "purchase" && col("ts") >= mid, cents)
            .otherwise(0L)).as("s2"))
      def cls(c: org.apache.spark.sql.Column) =
        when(c === 0, "none").when(c < 25000, "low")
          .when(c < 45000, "mid").otherwise("high")
      val g = Q.snapshot(u
        .select(cls(col("s1")).as("class_h1"), cls(col("s2")).as("class_h2"))
        .groupBy("class_h1", "class_h2")
        .agg(count(lit(1)).as("n_users")))
      val rt = g.groupBy("class_h1").agg(sum("n_users").as("row_n"))
      g.join(broadcast(rt), "class_h1")
        .select(col("class_h1"), col("class_h2"), col("n_users"),
          Q.r6(col("n_users").cast("double") / col("row_n")).as("row_rate"))
        .orderBy("class_h1", "class_h2")
    }
  )

  /** Smoothing pseudo-count for q_target_encode. */
  private val TePrior = 20

  /** The per-type value cents grid behind the robust location/shape
    * screens — ONE home for the projection + groupBy batch
    * q_trimmed_mean / q_quantile_skew and the streaming
    * Streams.typeCents state share. */
  /** Exact vol-decile assignment for a per-user (user_id, vol, …)
    * frame — the q_lift_curve two-pass band-offset ntile (bounded vol
    * grid → broadcast rank offsets → in-band row_number → the exact
    * ntile bucket formula in int64), factored to ONE home in round 15
    * so q_lift_curve and q_qini can never disagree on bucketing.
    * Extra columns ride along untouched. */
  private def withVolDecile(u: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // bounded vol grid → cumulative rank offsets (higher vol first)
    val grid = u.groupBy("vol").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum("cnt").over(
        Window.orderBy(col("vol").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val nRow = u.agg(count(lit(1)).as("nu"))
    // Column./ is double division — exact integer division via the
    // exact-multiple form (a − a%b is divisible, and the quotient
    // stays far below 2^53)
    def idiv(a: Column, b: Column): Column = ((a - a % b) / b).cast("long")
    val r = col("off") + col("rw") // the global (vol desc, user_id) rank
    val q10 = idiv(col("nu"), lit(10L))
    val rem = col("nu") % 10
    val decile =
      when(r <= rem * (q10 + 1), idiv(r - 1, q10 + 1) + 1)
        .otherwise(rem + idiv(r - 1 - rem * (q10 + 1), q10) + 1)
    u.join(broadcast(grid.select("vol", "off")), "vol")
      .withColumn("rw", row_number().over(
        Window.partitionBy("vol").orderBy("user_id")))
      .crossJoin(broadcast(nRow))
      .withColumn("decile", decile)
  }

  /** The gap-histogram fold over a per-gap band frame — ONE home
    * shared by batch q_gap_hist and the s_gap_hist streaming
    * emissions (the band stream is the mergeable part; shares and the
    * cumulative knee divide out at read time over the ≤ ~32-band
    * lattice grid). */
  private[graft] def gapHistOf(bands: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val c = bands.groupBy("bucket").agg(count(lit(1)).as("n_gaps"))
    c.withColumn("tot", sum("n_gaps").over(Window.partitionBy()))
      .withColumn("cum", sum("n_gaps").over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("bucket"), col("n_gaps"),
        Q.r6(col("n_gaps").cast("double") / col("tot")).as("share"),
        Q.r6(col("cum").cast("double") / col("tot")).as("cum_share"))
      .orderBy("bucket")
  }

  private[graft] def typeCents(s: SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), floor(col("value") * 100 + 0.5).cast("long").as("v100"))
      .groupBy("event_type", "v100").agg(count(lit(1)).as("c"))

  /** The target-encoding fold over a (p_brand, n, s, ss) stats grid —
    * ONE home shared by batch q_target_encode and the s_target_encode
    * streaming read-time view (the grid is mergeable moments; the
    * encoding is not — the global prior shifts with every row). */
  private[graft] def targetEncodeOf(gridIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val g = gridIn
      .withColumn("nt", sum("n").over(Window.partitionBy()))
      .withColumn("st", sum("s").over(Window.partitionBy()))
    g.select(col("p_brand"), col("n"),
        Q.r6((col("s").cast("double") + lit(TePrior) *
          (col("st").cast("double") / col("nt"))) / (col("n") + TePrior)).as("enc"),
        when(col("n") >= 2,
          Q.r6(sqrt(((col("ss").cast("double") - col("s").cast("double") * col("s") / col("n")) /
            col("n")) / ((col("n") - 1).cast("double") * (col("n") - 1))))).as("loo_sd"))
      .orderBy("p_brand")
  }

  /** The trimmed-mean fold over a (event_type, v100, c) cents grid —
    * ONE home shared by batch q_trimmed_mean and the s_trimmed_mean
    * streaming read-time view. The mean is not mergeable (a new cell
    * shifts the trim band); the grid is. */
  private[graft] def trimmedMeanOf(gridIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val wv = Window.partitionBy("event_type").orderBy("v100")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = gridIn
      .withColumn("cum", sum("c").over(wv))
      .withColumn("n", sum("c").over(Window.partitionBy("event_type")))
      .withColumn("k", floor(col("n") / 10.0).cast("long"))
    val kept = greatest(lit(0L),
      least(col("cum"), col("n") - col("k")) - greatest(col("cum") - col("c"), col("k")))
    e.groupBy("event_type")
      .agg(max("n").as("n"), max("k").as("k"),
        sum(col("v100") * kept).as("ts100"))
      .select(col("event_type"), col("n"),
        Q.r6(col("ts100").cast("double") /
          (lit(100.0) * (col("n") - lit(2) * col("k")))).as("trimmed_mean"))
      .orderBy("event_type")
  }

  /** The Bowley-skew fold over a (event_type, v100, c) cents grid —
    * ONE home shared by batch q_quantile_skew and the s_quantile_skew
    * streaming read-time view. Quartiles are integer rank probes
    * (lower-quantile convention, first cum ≥ ⌈p·n⌉). */
  private[graft] def bowleyOf(gridIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val wv = Window.partitionBy("event_type").orderBy("v100")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = gridIn
      .withColumn("cum", sum("c").over(wv))
      .withColumn("n", sum("c").over(Window.partitionBy("event_type")))
    def probe(t: Column): Column = min(when(col("cum") >= t, col("v100")))
    val q = e.groupBy("event_type")
      .agg(max("n").as("n"),
        probe(floor((col("n") + 3) / lit(4.0)).cast("long")).as("q1"),
        probe(floor((col("n") + 1) / lit(2.0)).cast("long")).as("q2"),
        probe(floor((lit(3) * col("n") + 3) / lit(4.0)).cast("long")).as("q3"))
    q.select(col("event_type"), col("n"),
        (col("q1").cast("double") / 100).as("q1_val"),
        (col("q2").cast("double") / 100).as("median_val"),
        (col("q3").cast("double") / 100).as("q3_val"),
        when(col("q3") > col("q1"),
          Q.r6((col("q3") + col("q1") - lit(2) * col("q2")).cast("double") /
            (col("q3") - col("q1")))).as("bowley"))
      .orderBy("event_type")
  }

  /** The diurnal-profile fold over a (event_type, x, hh, c) hourly
    * grid — ONE home shared by batch q_diurnal and the s_diurnal
    * streaming read-time view (the shares re-normalize as any hour's
    * count grows; the hourly grid — the SAME state s_gumbel_maxima
    * reads — is mergeable). The day dimension rolls up first, then
    * one |types|-partitioned total window over the ≤|types|×24 frame. */
  private[graft] def diurnalOf(gridIn: DataFrame): DataFrame = {
    gridIn.groupBy("event_type", "hh").agg(sum("c").as("n"))
      .withColumn("tot", sum("n").over(Window.partitionBy("event_type")))
      .select(col("event_type"), col("hh"), col("n"),
        Q.r6(col("n").cast("double") / col("tot")).as("share"))
      .orderBy("event_type", "hh")
  }

  /** The 3-round Huber IRLS fold over a (g, v, c) cents grid — ONE
    * home shared by batch q_huber and the s_huber streaming read-time
    * view (the cents grid is the mergeable state; a new event shifts
    * median, MAD and every weight). Median/MAD are exact integer
    * first-crossings; each round's weight floors onto the 1e6 lattice
    * per cell before order-free int64 sums. */
  private[graft] def huberOf(gridIn: DataFrame): DataFrame = {
    val g = Q.snapshot(gridIn)
    val wg = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy("g")
    val cw = g.withColumn("cum", sum("c").over(wg))
      .withColumn("n", sum("c").over(wt))
      .withColumn("sv", sum(col("c") * col("v")).over(wt))
    // m0 feeds TWO consumers (the MAD build's broadcast and the k0
    // join): snapshot the ≤|types|-row frame so the two window passes
    // over the grid run once, not twice (r19, guide §2.4)
    val m0 = Q.snapshot(cw.groupBy("g").agg(max("n").as("n"), max("sv").as("sv"),
      min(when(col("cum") * 2 >= col("n"), col("v"))).as("med")))
    val wd = Window.partitionBy("g").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val md = g.join(broadcast(m0.select("g", "med")), "g")
      .groupBy(col("g"), abs(col("v") - col("med")).as("d"))
      .agg(sum("c").as("c"))
      .withColumn("cum", sum("c").over(wd))
      .withColumn("nn", sum("c").over(wt))
      .groupBy("g")
      .agg(min(when(col("cum") * 2 >= col("nn"), col("d"))).as("mad"))
    val k0 = m0.join(md, "g")
      .select(col("g"), col("n"), col("med"), col("mad"), col("sv"),
        (lit(1.345) * lit(1.4826) * col("mad")).as("k"),
        col("med").cast("double").as("mu"))

    def round(p: DataFrame): DataFrame = {
      val w6 = floor(
        when(abs(col("v") - col("mu")).cast("double") <= col("k"), lit(1.0))
          .otherwise(col("k") / abs(col("v") - col("mu"))) * lit(1e6) + 0.5)
        .cast("long")
      g.join(broadcast(p), "g")
        .groupBy("g")
        .agg(max("n").as("n"), max("med").as("med"), max("mad").as("mad"),
          max("k").as("k"), max("sv").as("sv"),
          sum(col("c") * w6 * col("v")).as("swv"),
          sum(col("c") * w6).as("sw"))
        .select(col("g"), col("n"), col("med"), col("mad"), col("k"), col("sv"),
          when(col("sw") > 0, col("swv").cast("double") / col("sw"))
            .otherwise(col("med").cast("double")).as("mu"))
    }

    // the IRLS rounds chain LAZILY (r19 — the PQ Lloyd-rounds move,
    // guide §5): fixed 3-round count bounds the plan, each round's
    // ≤|types|-row output feeds exactly one broadcast build, so nothing
    // recomputes and the three eager materialization jobs disappear
    val p3 = round(round(round(k0)))
    p3.select(col("g").as("event_type"), col("n"),
      col("med").as("median_cents"), col("mad").as("mad_cents"),
      Q.r4(col("sv").cast("double") / col("n")).as("mean_cents"),
      Q.r4(col("mu")).as("huber_cents"))
      .orderBy("event_type")
  }
}
