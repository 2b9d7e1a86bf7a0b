package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Time-series & sequence analytics over the `events` stream table
  * (round-9 SURVEY §2 extensions): Markov transition matrix, OHLC bars,
  * time-weighted averages over irregular samples, and activity-island
  * (gap-based coverage) summaries.
  *
  * Scale shapes:
  *  - transition/ohlc aggregate onto FIXED-cardinality keys (|types|²,
  *    |days|) — shuffle volume is key-bounded, not corpus-bounded, and
  *    partial aggregation collapses everything map-side first;
  *  - time-weighted + islands partition by user_id ONCE and ride that
  *    single exchange through every stacked window and the rollups
  *    (HashPartitioning(user_id) satisfies the ClusteredDistribution of
  *    every later (user_id, …) window/agg — plan-audited);
  *  - all island arithmetic is pure int64 (epoch seconds) — no float
  *    accumulation order to disagree with the oracle about.
  */
object Timeseries {

  /** Activity-island gap threshold: a >1h silence starts a new island. */
  private val GapSec = 3600L

  /** Day-index anchor for the daily-series ops — events span Jan 2024
    * (same anchor as Statistics.q_trend_fit so day indices line up). */
  private val TrendAnchor = "2024-01-01"

  /** Deterministic event-order key: epoch-second ts with event_id as the
    * tiebreak, packed into one int64 (es < 2^31, event_id < 10^8 at any
    * tested SF ⇒ no overflow this side of 2^57). The same expression
    * runs verbatim in DuckDB, which is what makes min_by/max_by bars
    * hash-comparable. */
  private val OrdSql = s"(${Q.sqlEpochSec("ts")} * 100000000 + event_id)"

  /** The Kaplan–Meier fold over a per-user (user_id, fs, ls) lifetime
    * frame — ONE home shared by batch q_kaplan_meier and the
    * s_kaplan_meier streaming read-time view
    * (streaming.Streams.userLifeGrid maintains the frame — min/max ARE
    * mergeable; the curve is not: the censor horizon te is the global
    * max, so every arrival can re-censor everyone). */
  /** The CUSUM fold over a daily (event_type, x, y) count frame — ONE
    * home shared by batch q_cusum and the s_cusum streaming read-time
    * view (the dailyGrid family): the max deviation is not mergeable —
    * a new day re-prices every prefix against the final total — the
    * daily grid is. Per-type totals ride the SAME window partitioning
    * as the prefix sums; dev = |n·pre − t·s| is exact int64. */
  private[graft] def cusumOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val wt = Window.partitionBy("event_type")
    val wx = wt.orderBy("x")
    val dev = dailyIn
      .withColumn("n", count(lit(1)).over(wt))
      .withColumn("s", sum("y").over(wt))
      .withColumn("pre", sum("y").over(wx.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("t", row_number().over(wx).cast("long"))
      .withColumn("dev", abs(col("n") * col("pre") - col("t") * col("s")))
    dev
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy(col("dev").desc, col("x"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("n").as("n_days"),
        date_format(date_add(to_date(lit(TrendAnchor)), col("x").cast("int")), "yyyy-MM-dd")
          .as("change_day"),
        Q.r6(col("dev").cast("double") / col("n")).as("cusum_max"))
      .orderBy("event_type")
  }

  /** The EWMA fold over the same daily frame — ONE home shared by
    * batch q_ewma and the s_ewma streaming read-time view. Each day's
    * full history arrives as a window collect_list over the
    * calendar-bounded per-type frame and the unrolled terms fold
    * IN-ROW on the 1e6 lattice — same int64 term set as the oracle's
    * triangular join. */
  private[graft] def ewmaOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val wx = Window.partitionBy("event_type").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dailyIn
      .withColumn("hist", collect_list(struct(col("x"), col("y"))).over(wx))
      // seed on the type's FIRST OBSERVED day (hist is x-ordered, so
      // element 1 is it) — an absolute x=0 seed would silently
      // under-weight every type whose series starts after the anchor
      .withColumn("lp6", expr(
        """aggregate(hist, CAST(0 AS BIGINT),
          |  (acc, e) -> acc + CAST(floor((CASE WHEN e.x = element_at(hist, 1).x
          |                                     THEN pow(0.7, x - element_at(hist, 1).x) * e.y
          |                                     ELSE 0.3 * pow(0.7, x - e.x) * e.y END) * 1e6 + 0.5) AS BIGINT))""".stripMargin))
      .select(col("event_type"), col("x").as("day_idx"), col("y"),
        Q.r4(col("lp6") / lit(1e6)).as("ewma"))
      .orderBy("event_type", "day_idx")
  }

  /** The ACF fold over the same daily frame — ONE home shared by batch
    * q_acf and the s_acf streaming read-time view. Seven row-leads
    * bucketed by DAY difference cover every day-lag ≤ 7 even with
    * missing days; all sufficient statistics exact int64. */
  private[graft] def acfOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val wt = Window.partitionBy("event_type")
    val wx = wt.orderBy("x")
    val withLeads = (1 to 7).foldLeft(
      dailyIn
        .withColumn("n", count(lit(1)).over(wt))
        .withColumn("s", sum("y").over(wt))
        .withColumn("ss", sum(col("y") * col("y")).over(wt))) { (df, j) =>
      df.withColumn(s"x$j", lead("x", j).over(wx))
        .withColumn(s"y$j", lead("y", j).over(wx))
    }
    withLeads
      .selectExpr("event_type", "n", "s", "ss", "y",
        "stack(7, x1 - x, y1, x2 - x, y2, x3 - x, y3, x4 - x, y4, x5 - x, y5, x6 - x, y6, x7 - x, y7) AS (k, yk)")
      .filter(col("yk").isNotNull && col("k").between(1, 7))
      .groupBy("event_type", "k")
      .agg(sum(col("y") * col("yk")).as("pk"),
        sum("y").as("ak"), sum("yk").as("bk"),
        max("n").as("n"), max("s").as("s"), max("ss").as("ss"))
      .select(col("event_type"), col("k"),
        Q.r6((col("n") * col("n") * col("pk") - col("n") * col("s") * (col("ak") + col("bk")) +
          (col("n") - col("k")) * col("s") * col("s")).cast("double") /
          (col("n") * col("n") * col("ss") - col("n") * col("s") * col("s"))).as("acf"))
      .orderBy("event_type", "k")
  }

  private[graft] def kmOf(uIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // no snapshot: one window chain reads the frame, and the plan
    // audit must see the user_id aggregate under the single-partition
    // exchange; streaming call sites snapshot their memory table first
    val u = uIn
    val f = u
      .withColumn("te", max("ls").over(Window.partitionBy()))
      .select(floor((col("ls") - col("fs")) / 3600.0).cast("long").as("t_hour"),
        when(col("te") - col("ls") > 43200, 1L).otherwise(0L).as("churn"))
      .groupBy("t_hour")
      .agg(count(lit(1)).as("m"), sum("churn").as("dd"))
    val wcum = Window.orderBy("t_hour").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wbefore = Window.orderBy("t_hour").rowsBetween(Window.unboundedPreceding, -1)
    f.withColumn("n_risk",
        sum("m").over(Window.partitionBy()) -
          coalesce(sum("m").over(wbefore), lit(0L)))
      .filter(col("dd") > 0)
      .withColumn("hit0",
        max(when(col("dd") === col("n_risk"), 1).otherwise(0)).over(wcum))
      .withColumn("lnsum9",
        sum(when(col("dd") === col("n_risk"), 0L)
          .otherwise(floor(log(lit(1.0) - col("dd").cast("double") / col("n_risk")) *
            lit(1e9) + 0.5).cast("long"))).over(wcum))
      .select(col("t_hour"), col("n_risk"), col("dd").as("d_events"),
        when(col("hit0") === 1, lit(0.0))
          .otherwise(Q.r6(exp(col("lnsum9") / lit(1e9)))).as("survival"))
      .orderBy("t_hour")
  }

  /** The Nelson–Aalen fold over the same per-user lifetime frame — ONE
    * home shared by batch q_nelson_aalen and the s_nelson_aalen
    * streaming read-time view. */
  private[graft] def naOf(uIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // single chain — same no-snapshot rationale as [[kmOf]]
    val u = uIn
    val f = u
      .withColumn("te", max("ls").over(Window.partitionBy()))
      .select(floor((col("ls") - col("fs")) / 3600.0).cast("long").as("t_hour"),
        when(col("te") - col("ls") > 43200, 1L).otherwise(0L).as("churn"))
      .groupBy("t_hour")
      .agg(count(lit(1)).as("m"), sum("churn").as("dd"))
    val wcum = Window.orderBy("t_hour").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wbefore = Window.orderBy("t_hour").rowsBetween(Window.unboundedPreceding, -1)
    f.withColumn("n_risk",
        sum("m").over(Window.partitionBy()) -
          coalesce(sum("m").over(wbefore), lit(0L)))
      .filter(col("dd") > 0)
      .withColumn("h9",
        sum(floor(col("dd").cast("double") / col("n_risk") * lit(1e9) + 0.5)
          .cast("long")).over(wcum))
      .withColumn("v9",
        sum(floor(col("dd").cast("double") / col("n_risk") / col("n_risk") * lit(1e9) + 0.5)
          .cast("long")).over(wcum))
      .select(col("t_hour"), col("n_risk"), col("dd").as("d_events"),
        Q.r6(col("h9") / lit(1e9)).as("cum_hazard"),
        Q.r6(col("v9") / lit(1e9)).as("hazard_var"),
        Q.r6(exp(-(col("h9") / lit(1e9)))).as("survival_fh"))
      .orderBy("t_hour")
  }

  /** The log-rank fold over the same per-user lifetime frame — ONE
    * home shared by batch q_log_rank and the s_log_rank streaming
    * read-time view. */
  private[graft] def logRankOf(uIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // no outer snapshot (single consumer up to the projection; the
    // audit must see the user_id aggregate under the te window); the
    // INNER snapshot stays — w genuinely feeds two consumers (the
    // death-hour grid and the group-size agg)
    val w = uIn
      .withColumn("te", max("ls").over(Window.partitionBy()))
      .select((col("user_id") % 2).as("grp"), (col("ls") - col("fs")).as("life"),
        col("te"), col("ls"))
      .transform(Q.snapshot)
    val f = w
      .select(floor(col("life") / 3600.0).cast("long").as("t_hour"),
        when(col("grp") === 1, 1L).otherwise(0L).as("g1"),
        when(col("te") - col("ls") > 43200, 1L).otherwise(0L).as("churn"))
      .groupBy("t_hour")
      .agg(count(lit(1)).as("m"), sum("g1").as("m1"), sum("churn").as("dd"),
        sum(col("g1") * col("churn")).as("d1"))
    val wbefore = Window.orderBy("t_hour").rowsBetween(Window.unboundedPreceding, -1)
    val r = f
      .withColumn("n",
        sum("m").over(Window.partitionBy()) - coalesce(sum("m").over(wbefore), lit(0L)))
      .withColumn("n1",
        sum("m1").over(Window.partitionBy()) - coalesce(sum("m1").over(wbefore), lit(0L)))
      .filter(col("dd") > 0)
    val p1 = col("n1").cast("double") / col("n")
    val t = r.agg(sum("dd").as("d_total"), sum("d1").as("o1"),
      sum(floor(col("n1").cast("double") * col("dd") / col("n") * lit(1e9) + 0.5)
        .cast("long")).as("e9"),
      sum(when(col("n") > 1,
        floor(p1 * (lit(1.0) - p1) * col("dd") * (col("n") - col("dd")) /
          (col("n") - 1) * lit(1e9) + 0.5).cast("long")).otherwise(0L)).as("v9"))
    val g = w.agg(count(lit(1)).as("nu"),
      sum(when(col("grp") === 1, 1L).otherwise(0L)).as("n1u"))
    t.crossJoin(broadcast(g))
      .select((col("nu") - col("n1u")).as("n_users_a"), col("n1u").as("n_users_b"),
        col("d_total").as("d_events"), col("o1").as("observed_b"),
        Q.r6(col("e9") / lit(1e9)).as("expected_b"),
        Q.r6(col("v9") / lit(1e9)).as("variance"),
        when(col("v9") > 0,
          Q.r6((col("o1") - col("e9") / lit(1e9)) * (col("o1") - col("e9") / lit(1e9)) /
            (col("v9") / lit(1e9)))).as("chi2"))
  }

  /** The Gumbel block-maxima fold over a (event_type, x, hh, c) hourly
    * count grid — ONE home shared by batch q_gumbel_maxima and the
    * s_gumbel_maxima streaming read-time view
    * (streaming.Streams.hourlyGrid maintains the grid incrementally;
    * the fit is not mergeable — the hourly cells are). Block maxima and
    * moments stay exact int64; only the final method-of-moments fit is
    * floating point, with π and Euler–Mascheroni γ as IEEE literals. */
  private[graft] def gumbelOf(hourly: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val t = hourly
      .groupBy("event_type", "x")
      .agg(max("c").as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("y").as("s"), sum(col("y") * col("y")).as("ss"))
    val m = col("s").cast("double") / col("n")
    val v = (col("n") * col("ss").cast("double") - col("s").cast("double") * col("s")) /
      (col("n").cast("double") * (col("n") - 1))
    val beta = sqrt(v * lit(6.0)) / lit(3.141592653589793)
    val mu = m - lit(0.5772156649015329) * beta
    val ok = col("n") >= 2 && v > 0
    t.select(col("event_type"), col("n").as("n_days"), Q.r6(m).as("max_mean"),
        when(ok, Q.r6(beta)).as("beta"),
        when(ok, Q.r6(mu)).as("mu"),
        when(ok, Q.r6(lit(1) - exp(-exp(-(lit(2) * m - mu) / beta)))).as("p_exceed_2x"))
      .orderBy("event_type")
  }

  def defs: Seq[QueryDef] = Seq(

    // Markov transition matrix over event types: per (cur, next) pair,
    // the transition count and row-normalized probability. The lead()
    // window shares the standard single user_id partitioning (per-user
    // event lists are bounded by activity, not corpus growth); the
    // count then lands on a |types|² ≤ 25-key aggregate, and the
    // normalizing window runs over THAT — never over raw events.
    Q("q_event_transitions",
      s"""WITH e AS (SELECT user_id, event_type, event_id,
         |                  ${Q.sqlEpochSec("ts")} AS es FROM events),
         |p AS (SELECT event_type AS cur,
         |             lead(event_type) OVER (PARTITION BY user_id
         |                                    ORDER BY es, event_id) AS nxt
         |      FROM e),
         |c AS (SELECT cur, nxt, count(*) AS n FROM p
         |      WHERE nxt IS NOT NULL GROUP BY 1, 2)
         |SELECT cur, nxt, n,
         |       ${Q.sqlR6("CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY cur)")} AS p
         |FROM c
         |ORDER BY cur, nxt""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("es", "event_id")
      val wc = Window.partitionBy("cur")
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          Q.epochSec(col("ts")).as("es"))
        .select(col("event_type").as("cur"), lead("event_type", 1).over(w).as("nxt"))
        .filter(col("nxt").isNotNull)
        .groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
        .withColumn("p", Q.r6(col("n").cast("double") / sum("n").over(wc)))
        .orderBy("cur", "nxt")
    },

    // Daily OHLC bars over event values: open/close are the values at
    // the day's first/last event (min_by/max_by on the packed order
    // key — no window, no per-day sort), high/low/volume are plain
    // min/max/sum. One |days|-cardinality aggregation with map-side
    // partials: at 100 TB the shuffle still carries #days × #partitions
    // rows. The candlestick primitive for metric downsampling.
    Q("q_ohlc",
      s"""SELECT strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day,
         |       count(*) AS n,
         |       ${Q.sqlR2(s"min_by(value, $OrdSql)")} AS open,
         |       ${Q.sqlR2("max(value)")} AS high,
         |       ${Q.sqlR2("min(value)")} AS low,
         |       ${Q.sqlR2(s"max_by(value, $OrdSql)")} AS close,
         |       ${Q.sqlR2("sum(value)")} AS volume
         |FROM events
         |GROUP BY 1
         |ORDER BY day""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("ts"), col("value"),
          (Q.epochSec(col("ts")) * 100000000L + col("event_id")).as("k"))
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(
          count(lit(1)).as("n"),
          Q.r2(min_by(col("value"), col("k"))).as("open"),
          Q.r2(max(col("value"))).as("high"),
          Q.r2(min(col("value"))).as("low"),
          Q.r2(max_by(col("value"), col("k"))).as("close"),
          Q.r2(sum(col("value"))).as("volume"))
        .orderBy("day")
    },

    // Time-weighted average value per user over an IRREGULARLY sampled
    // series: each observation holds until the next one, so its weight
    // is the gap to the successor (last observation carries no weight).
    // The plain avg() is wrong on irregular series — a burst of readings
    // during a spike dominates it; the time-weighted form is the
    // standard fix. lead() + rollup both ride ONE user_id exchange.
    Q("q_time_weighted",
      s"""WITH e AS (SELECT user_id, value, event_id,
         |                  ${Q.sqlEpochSec("ts")} AS es FROM events),
         |p AS (SELECT user_id, value, es,
         |             lead(es) OVER (PARTITION BY user_id
         |                            ORDER BY es, event_id) AS nes
         |      FROM e)
         |SELECT user_id,
         |       count(*) AS n_gaps,
         |       CAST(sum(nes - es) AS BIGINT) AS covered_sec,
         |       ${Q.sqlR4("sum(value * (nes - es)) / sum(nes - es)")} AS tw_avg,
         |       ${Q.sqlR4("avg(value)")} AS naive_avg
         |FROM p WHERE nes IS NOT NULL
         |GROUP BY 1
         |ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("es", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("value"), col("event_id"),
          Q.epochSec(col("ts")).as("es"))
        .withColumn("nes", lead("es", 1).over(w))
        .filter(col("nes").isNotNull)
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_gaps"),
          sum(col("nes") - col("es")).cast("long").as("covered_sec"),
          Q.r4(sum(col("value") * (col("nes") - col("es"))) /
            sum(col("nes") - col("es"))).as("tw_avg"),
          Q.r4(avg("value")).as("naive_avg"))
        .orderBy("user_id")
    },

    // Day-over-day deltas: daily event count + value volume with the
    // previous day's volume and percent change — the metrics-dashboard
    // primitive. The corpus collapses to a |days|-key aggregate FIRST
    // (map-side partials, calendar-bounded shuffle); the lag() window
    // then runs over that bounded table — a single-partition window
    // over #days rows is legal for the same reason q_hybrid_rrf's
    // re-rank is: the input is bounded BY CONSTRUCTION, not by corpus
    // size. Volume r2-rounded before the delta so both engines diff
    // identical doubles.
    Q("q_day_over_day",
      s"""WITH d AS (SELECT strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day,
         |                  count(*) AS n,
         |                  ${Q.sqlR2("sum(value)")} AS volume
         |           FROM events GROUP BY 1),
         |w AS (SELECT day, n, volume,
         |             lag(volume) OVER (ORDER BY day) AS prev_volume
         |      FROM d)
         |SELECT day, n, volume, prev_volume,
         |       ${Q.sqlR4("(volume - prev_volume) / prev_volume * 100")} AS pct_change
         |FROM w
         |ORDER BY day""".stripMargin) { (s, d) =>
      val w = Window.orderBy("day")
      Tables.events(s, d)
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"), Q.r2(sum("value")).as("volume"))
        .withColumn("prev_volume", lag("volume", 1).over(w))
        .withColumn("pct_change",
          Q.r4((col("volume") - col("prev_volume")) / col("prev_volume") * 100))
        .orderBy("day")
    },

    // Distribution drift between time periods: per event_type, the
    // total-variation distance between the value distribution before
    // and after a split date, over a FIXED 20-bucket grid — the
    // log-free face of the PSI/KS drift monitors production ML
    // pipelines gate on (TVD = 0.5·Σ|p−q| uses only divisions of
    // exact counts and an ≤20-term sum; PSI's ln and exact KS's
    // global sort are both dropped deliberately — the first for libm
    // parity, the second because sorting the corpus for a sup-CDF is
    // the classic scale-killer; on a fixed grid the whole statistic
    // is one map-side bucket count). Shuffle carries ≤ |types|×2×20
    // partial rows whatever the corpus size.
    Q("q_drift_tvd",
      s"""WITH e AS (SELECT event_type,
         |                  CASE WHEN CAST(date_trunc('day', ts) AS DATE) < DATE '2024-01-15'
         |                       THEN 1 ELSE 2 END AS period,
         |                  least(CAST(floor(value / 25) AS BIGINT), 19) AS bucket
         |           FROM events),
         |c AS (SELECT event_type, bucket,
         |             count(CASE WHEN period = 1 THEN 1 END) AS n1,
         |             count(CASE WHEN period = 2 THEN 1 END) AS n2
         |      FROM e GROUP BY 1, 2),
         |t AS (SELECT event_type, CAST(sum(n1) AS BIGINT) AS t1,
         |             CAST(sum(n2) AS BIGINT) AS t2
         |      FROM c GROUP BY 1)
         |SELECT c.event_type, t1, t2,
         |       ${Q.sqlR6("0.5 * sum(abs(CAST(n1 AS DOUBLE) / t1 - CAST(n2 AS DOUBLE) / t2))")} AS tvd
         |FROM c JOIN t ON c.event_type = t.event_type
         |GROUP BY 1, 2, 3
         |ORDER BY c.event_type""".stripMargin) { (s, d) =>
      val c = Tables.events(s, d)
        .select(col("event_type"),
          when(col("ts").cast(org.apache.spark.sql.types.DateType)
            < to_date(lit("2024-01-15")), 1).otherwise(2).as("period"),
          least(floor(col("value") / 25).cast("long"), lit(19L)).as("bucket"))
        .groupBy("event_type", "bucket")
        .agg(
          count(when(col("period") === 1, 1)).as("n1"),
          count(when(col("period") === 2, 1)).as("n2"))
      val t = c.groupBy("event_type")
        .agg(sum("n1").cast("long").as("t1"), sum("n2").cast("long").as("t2"))
      c.join(broadcast(t), "event_type")
        .groupBy("event_type", "t1", "t2")
        .agg(Q.r6(lit(0.5) * sum(abs(col("n1").cast("double") / col("t1") -
          col("n2").cast("double") / col("t2")))).as("tvd"))
        .orderBy("event_type")
    },

    // Per-event sessionization (round 10): assign every event its
    // user-scoped session index and within-session sequence number —
    // the ETL primitive whose per-session ROLLUP is q_activity_islands
    // (same >1h gap rule, same break-flag/running-sum construction, but
    // emitting the labeled EVENTS for downstream joins instead of the
    // summary). Pure int64 epoch-second arithmetic under the house
    // (es, event_id) total order — bit-exact cross-engine, no rounding.
    // Shape: both windows and the sequence number cluster by user_id,
    // so the whole labeling rides ONE corpus exchange.
    Q("q_sessionize",
      s"""WITH e AS (SELECT user_id, event_id,
         |                  ${Q.sqlEpochSec("ts")} AS es FROM events),
         |f AS (SELECT user_id, event_id, es,
         |             CASE WHEN lag(es) OVER w IS NULL THEN 1
         |                  WHEN es - lag(es) OVER w > $GapSec THEN 1
         |                  ELSE 0 END AS brk
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
         |i AS (SELECT user_id, event_id, es,
         |             CAST(sum(brk) OVER (PARTITION BY user_id
         |                                 ORDER BY es, event_id
         |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
         |      FROM f)
         |SELECT user_id, event_id, session_idx,
         |       CAST(row_number() OVER (PARTITION BY user_id, session_idx
         |                               ORDER BY es, event_id) AS BIGINT) AS seq_in_session
         |FROM i
         |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val wo = Window.partitionBy("user_id").orderBy("es", "event_id")
      val wr = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val labeled = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), Q.epochSec(col("ts")).as("es"))
        .withColumn("brk",
          when(lag("es", 1).over(wo).isNull, 1)
            .when(col("es") - lag("es", 1).over(wo) > GapSec, 1)
            .otherwise(0))
        .withColumn("session_idx", sum("brk").over(wr).cast("long"))
      labeled
        .withColumn("seq_in_session", row_number()
          .over(Window.partitionBy("user_id", "session_idx").orderBy("es", "event_id"))
          .cast("long"))
        .select("user_id", "event_id", "session_idx", "seq_in_session")
        .orderBy("user_id", "event_id")
    },

    // Activity islands: contiguous per-user activity runs, split where
    // the inter-event gap exceeds GapSec. lag() marks island starts, a
    // running sum numbers them, and two stacked rollups (per-island
    // extent, then per-user summary) produce island count / coverage /
    // longest run. Every stage clusters by user_id (or a superset), so
    // the whole pipeline rides the FIRST window's single exchange —
    // plan-audited. All arithmetic is int64 epoch-seconds: bit-exact
    // against the oracle with no rounding shims at all.
    Q("q_activity_islands",
      s"""WITH e AS (SELECT user_id, event_id,
         |                  ${Q.sqlEpochSec("ts")} AS es FROM events),
         |f AS (SELECT user_id, event_id, es,
         |             CASE WHEN es - lag(es) OVER (PARTITION BY user_id
         |                                          ORDER BY es, event_id)
         |                       > $GapSec THEN 1
         |                  WHEN lag(es) OVER (PARTITION BY user_id
         |                                     ORDER BY es, event_id) IS NULL THEN 1
         |                  ELSE 0 END AS brk
         |      FROM e),
         |i AS (SELECT user_id, es,
         |             sum(brk) OVER (PARTITION BY user_id
         |                            ORDER BY es, event_id
         |                            ROWS UNBOUNDED PRECEDING) AS island
         |      FROM f),
         |g AS (SELECT user_id, island,
         |             count(*) AS n_events,
         |             max(es) - min(es) AS span_sec
         |      FROM i GROUP BY 1, 2)
         |SELECT user_id,
         |       count(*) AS n_islands,
         |       CAST(sum(n_events) AS BIGINT) AS n_events,
         |       CAST(sum(span_sec) AS BIGINT) AS covered_sec,
         |       CAST(max(span_sec) AS BIGINT) AS longest_sec
         |FROM g
         |GROUP BY 1
         |ORDER BY user_id""".stripMargin) { (s, d) =>
      val wo = Window.partitionBy("user_id").orderBy("es", "event_id")
      val wr = Window.partitionBy("user_id").orderBy("es", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), Q.epochSec(col("ts")).as("es"))
        .withColumn("brk",
          when(col("es") - lag("es", 1).over(wo) > GapSec, 1)
            .when(lag("es", 1).over(wo).isNull, 1)
            .otherwise(0))
        .withColumn("island", sum("brk").over(wr))
        .groupBy("user_id", "island")
        .agg(count(lit(1)).as("n_events"),
          (max("es") - min("es")).as("span_sec"))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_islands"),
          sum("n_events").cast("long").as("n_events"),
          sum("span_sec").cast("long").as("covered_sec"),
          max("span_sec").cast("long").as("longest_sec"))
        .orderBy("user_id")
    },

    // Rolling exact median of value over each user's last 5 events —
    // the robust smoother q_win_moving's mean cannot be (one spike
    // drags a mean for 5 rows; a median shrugs). Exact percentile as a
    // WINDOW aggregate over a ROWS frame: both engines sort ≤5 doubles
    // per frame and linearly interpolate at 0.5, so r6 only has to
    // absorb interpolation arithmetic, not accumulation order. Rides
    // the standard single user_id exchange; the per-frame sort is O(5)
    // per row at any corpus size.
    // Exponentially time-decayed engagement score per user: Σ value ·
    // 0.5^(age_days/7) against a fixed anchor — a 7-day half-life, the
    // recency-weighted score behind "active user" rankings (q_rfm's
    // fixed recency buckets, made continuous). Each row's decayed term
    // is integer-scaled to 1e-6 BEFORE the per-user sum, so the
    // reduction is an order-free int64 fold and a 1-ulp pow()
    // disagreement moves a user's score by 1e-6 — invisible at the r4
    // report. Map-side partials on user_id; one bounded-key agg.
    Q("q_decay_score",
      s"""WITH e AS (SELECT user_id, value,
         |                  (1706745600 - ${Q.sqlEpochSec("ts")}) / 86400.0 AS age_days
         |           FROM events),
         |t AS (SELECT user_id,
         |             CAST(floor(value * pow(0.5, age_days / 7.0) * 1e6 + 0.5) AS BIGINT) AS term
         |      FROM e)
         |SELECT user_id, count(*) AS n_events,
         |       ${Q.sqlR4("sum(term) / 1e6")} AS decayed_score
         |FROM t
         |GROUP BY user_id
         |ORDER BY user_id""".stripMargin) { (s, d) =>
      // anchor 1706745600 = 2024-02-01 00:00:00 UTC (the q_rfm anchor)
      Tables.events(s, d)
        .select(col("user_id"),
          floor(col("value") *
            pow(lit(0.5), (lit(1706745600L) - Q.epochSec(col("ts"))) / lit(86400.0) / lit(7.0)) *
            lit(1e6) + 0.5).cast("long").as("term"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          Q.r4(sum("term") / lit(1e6)).as("decayed_score"))
        .orderBy("user_id")
    },

    Q("q_rolling_median",
      s"""WITH e AS (SELECT user_id, event_id, value,
         |                  ${Q.sqlEpochSec("ts")} AS es FROM events)
         |SELECT user_id, event_id,
         |       ${Q.sqlR6("quantile_cont(value, 0.5) OVER (PARTITION BY user_id ORDER BY es, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)")} AS med5
         |FROM e
         |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("es", "event_id")
        .rowsBetween(-4, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"),
          Q.epochSec(col("ts")).as("es"))
        .select(col("user_id"), col("event_id"),
          Q.r6(percentile(col("value"), lit(0.5)).over(w)).as("med5"))
        .orderBy("user_id", "event_id")
    },

    // Sample autocorrelation of the per-type daily volume at lags 1..7
    // (round 10) — the periodicity detector behind seasonality checks:
    // a weekly cycle shows up as a lag-7 peak. The ACF at lag k is
    // Σ(y_t−m)(y_{t+k}−m) / Σ(y_t−m)² with the full-series mean m = S/n;
    // multiplying through by n² clears every fraction, so BOTH the
    // numerator (n²·P_k − n·S·(A_k+B_k) + (n−k)·S²) and denominator
    // (n²·SS − n·S²) are exact int64 in both engines — the one double
    // op is the final division, bit-identical before r6. Shapes: the
    // daily rollup is a (|types|×|days|)-key agg; the lag pairing is a
    // self-join of that bounded frame against a broadcast 7-row lag
    // table — work |types|·|days|·7, corpus-independent. At petabyte
    // daily counts (y ~ 1e9) the n²·SS term would need HUGEINT /
    // centered doubles; at any real day-count the int64 headroom holds.
    Q("q_acf",
      s"""WITH daily AS (SELECT event_type,
         |                      CAST(date_diff('day', DATE '$TrendAnchor',
         |                                     CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         |                      count(*) AS y
         |               FROM events GROUP BY 1, 2),
         |tot AS (SELECT event_type, count(*) AS n, CAST(sum(y) AS BIGINT) AS s,
         |               CAST(sum(y * y) AS BIGINT) AS ss
         |        FROM daily GROUP BY 1),
         |p AS (SELECT a.event_type, l.k,
         |             CAST(sum(a.y * b.y) AS BIGINT) AS pk,
         |             CAST(sum(a.y) AS BIGINT) AS ak,
         |             CAST(sum(b.y) AS BIGINT) AS bk
         |      FROM daily a
         |      CROSS JOIN range(1, 8) l(k)
         |      JOIN daily b ON b.event_type = a.event_type AND b.x = a.x + l.k
         |      GROUP BY 1, 2)
         |SELECT p.event_type, CAST(p.k AS BIGINT) AS k,
         |       ${Q.sqlR6("CAST(n * n * pk - n * s * (ak + bk) + (n - p.k) * s * s AS DOUBLE) / (n * n * ss - n * s * s)")} AS acf
         |FROM p JOIN tot ON p.event_type = tot.event_type
         |ORDER BY p.event_type, k""".stripMargin) { (s, d) =>
      // Single-scan shape (the oracle keeps the self-join formulation):
      // per-type totals ride the SAME window partitioning as seven
      // lead() columns, and each lead contributes to the lag bucket of
      // its DAY difference (not its row offset) — for any day-pair ≤7
      // days apart the row distance is ≤ the day distance, so seven
      // row-leads always cover every day-lag ≤7 even if days go
      // missing. One corpus scan, one exchange, no self-join. (Fold
      // factored for the s_acf streaming face.)
      acfOf(Inference.dailyCounts(s, d))
    },

    // Seasonal-naive forecast accuracy (round 14) — MASE of the lag-7
    // (weekly) seasonal-naive forecast against the lag-1 naive baseline
    // per event type: mase < 1 means "same weekday last week" predicts
    // the daily series better than "yesterday" — the one-number readout
    // that decides whether a weekly cycle is worth modeling (the
    // decision twin of q_acf's lag-7 peak and q_seasonal_strength's
    // variance split). Exactness: daily counts are ints, |y−lag| sums
    // are exact int64 (linear in Σy), and the two MAE divisions + their
    // ratio run the same double ops on identical integers in both
    // engines. Shape: the (|types|×|days|)-key daily agg is the one
    // corpus shuffle; both lag columns ride a single per-type window
    // over that calendar-bounded frame; |types|-row output.
    Q("q_mase",
      s"""WITH daily AS (SELECT event_type,
         |                      CAST(date_diff('day', DATE '$TrendAnchor',
         |                                     CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         |                      count(*) AS y
         |               FROM events GROUP BY 1, 2),
         |l AS (SELECT event_type, y,
         |             lag(y, 1) OVER (PARTITION BY event_type ORDER BY x) AS y1,
         |             lag(y, 7) OVER (PARTITION BY event_type ORDER BY x) AS y7
         |      FROM daily),
         |t AS (SELECT event_type,
         |             CAST(count(*) AS BIGINT) AS n_days,
         |             CAST(sum(CASE WHEN y1 IS NOT NULL THEN abs(y - y1) ELSE 0 END) AS BIGINT) AS s1,
         |             CAST(sum(CASE WHEN y1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         |             CAST(sum(CASE WHEN y7 IS NOT NULL THEN abs(y - y7) ELSE 0 END) AS BIGINT) AS s7,
         |             CAST(sum(CASE WHEN y7 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS c7
         |      FROM l GROUP BY 1)
         |SELECT event_type, n_days,
         |       ${Q.sqlR6("CAST(s1 AS DOUBLE) / c1")} AS mae_naive,
         |       ${Q.sqlR6("CAST(s7 AS DOUBLE) / c7")} AS mae_seasonal,
         |       ${Q.sqlR6("(CAST(s7 AS DOUBLE) / c7) / (CAST(s1 AS DOUBLE) / c1)")} AS mase
         |FROM t
         |WHERE c1 > 0 AND c7 > 0
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(col("ts").cast(DateType), to_date(lit(TrendAnchor)))
            .cast("long").as("x"))
        .agg(count(lit(1)).as("y"))
      val wx = Window.partitionBy("event_type").orderBy("x")
      val t = daily
        .withColumn("y1", lag("y", 1).over(wx))
        .withColumn("y7", lag("y", 7).over(wx))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("y1").isNotNull, abs(col("y") - col("y1"))).otherwise(0L)).as("s1"),
          sum(when(col("y1").isNotNull, 1L).otherwise(0L)).as("c1"),
          sum(when(col("y7").isNotNull, abs(col("y") - col("y7"))).otherwise(0L)).as("s7"),
          sum(when(col("y7").isNotNull, 1L).otherwise(0L)).as("c7"))
      t.filter(col("c1") > 0 && col("c7") > 0)
        .select(col("event_type"), col("n_days"),
          Q.r6(col("s1").cast("double") / col("c1")).as("mae_naive"),
          Q.r6(col("s7").cast("double") / col("c7")).as("mae_seasonal"),
          Q.r6((col("s7").cast("double") / col("c7")) /
            (col("s1").cast("double") / col("c1"))).as("mase"))
        .orderBy("event_type")
    },

    // CUSUM changepoint scan per event_type (round 10) — where did the
    // daily volume's level shift? The classic statistic is the maximum
    // absolute deviation of the cumulative sum from its fitted line:
    // max_t |prefix_t − t·S/n|. Multiplying by n makes every candidate
    // an exact int64 (n·prefix_t − t·S), so the argmax is an INTEGER
    // comparison — no float ulp can move the changepoint — and the
    // reported magnitude is one final division. Shapes: daily rollup
    // (bounded keys), prefix + row_number windows over the tiny
    // per-type day frame, broadcast totals join, integer argmax with
    // the earliest-day tie-break. Corpus touches one agg; everything
    // after is |types|×|days| rows.
    Q("q_cusum",
      s"""WITH daily AS (SELECT event_type,
         |                      CAST(date_diff('day', DATE '$TrendAnchor',
         |                                     CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         |                      count(*) AS y
         |               FROM events GROUP BY 1, 2),
         |tot AS (SELECT event_type, count(*) AS n, CAST(sum(y) AS BIGINT) AS s
         |        FROM daily GROUP BY 1),
         |c AS (SELECT event_type, x,
         |             CAST(sum(y) OVER (PARTITION BY event_type ORDER BY x
         |                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pre,
         |             CAST(row_number() OVER (PARTITION BY event_type ORDER BY x) AS BIGINT) AS t
         |      FROM daily),
         |dev AS (SELECT c.event_type, x, n, s, abs(n * pre - t * s) AS dev
         |        FROM c JOIN tot ON c.event_type = tot.event_type),
         |r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev DESC, x) AS rn
         |      FROM dev)
         |SELECT event_type, n AS n_days,
         |       strftime(DATE '$TrendAnchor' + CAST(x AS INTEGER), '%Y-%m-%d') AS change_day,
         |       ${Q.sqlR6("CAST(dev AS DOUBLE) / n")} AS cusum_max
         |FROM r WHERE rn = 1
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      // Single-scan shape: the per-type totals are window aggregates on
      // the SAME partitioning as the prefix sums — no re-aggregated
      // totals join, no second corpus scan. (Fold factored for the
      // s_cusum streaming face — Inference.dailyCounts is the same
      // frame this body built inline before round 14.)
      cusumOf(Inference.dailyCounts(s, d))
    },

    // Exponentially weighted moving average of the per-type daily
    // volume (round 10, α=0.3) — the smoother dashboards draw over
    // noisy dailies. The recursion EWMA_t = α·y_t + (1−α)·EWMA_{t−1}
    // (seeded EWMA_1 = y_1) is unrolled to its closed form and each
    // weighted term is integer-scaled to 1e-6 BEFORE the per-day sum,
    // so the reduction is an order-free int64 fold and pow()'s 1-ulp
    // noise moves a smoothed value by ~1e-6 — invisible at r4. Shape:
    // the corpus collapses to the (|types|×|days|) daily frame FIRST;
    // the triangular self-join that materializes the unrolled terms is
    // |days|²-bounded per type — calendar-bounded by construction,
    // corpus-independent (the q_hybrid_rrf bounded-window argument).
    Q("q_ewma",
      s"""WITH daily AS (SELECT event_type,
         |                      CAST(date_diff('day', DATE '$TrendAnchor',
         |                                     CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         |                      count(*) AS y
         |               FROM events GROUP BY 1, 2),
         |m AS (SELECT event_type, min(x) AS x0 FROM daily GROUP BY 1),
         |terms AS (SELECT b.event_type, b.x, b.y,
         |                 CAST(floor(CASE WHEN a.x = m.x0 THEN pow(0.7, b.x - m.x0) * a.y
         |                                 ELSE 0.3 * pow(0.7, b.x - a.x) * a.y END * 1e6 + 0.5) AS BIGINT) AS t6
         |          FROM daily a JOIN daily b
         |            ON a.event_type = b.event_type AND a.x <= b.x
         |          JOIN m ON m.event_type = a.event_type)
         |SELECT event_type, x AS day_idx, CAST(max(y) AS BIGINT) AS y,
         |       ${Q.sqlR4("sum(t6) / 1e6")} AS ewma
         |FROM terms
         |GROUP BY event_type, x
         |ORDER BY event_type, day_idx""".stripMargin) { (s, d) =>
      // Single-scan shape (the oracle keeps the triangular-join
      // formulation) — see [[ewmaOf]], factored for the s_ewma
      // streaming face.
      ewmaOf(Inference.dailyCounts(s, d))
    },

    // Local-peak detection in the per-type daily series (round 10):
    // days strictly above BOTH neighbors, with prominence = height
    // above the taller neighbor — the alerting primitive behind
    // "traffic spiked on the 17th". Interior days only (endpoints
    // have one neighbor and are excluded by the non-null guards).
    // Pure int64 comparisons on exact daily counts — nothing to
    // round. Shape: corpus → (|types|×|days|) daily frame, lag/lead
    // over that bounded frame on its per-type partitioning.
    Q("q_peak_detection",
      s"""WITH daily AS (SELECT event_type,
         |                      CAST(date_diff('day', DATE '$TrendAnchor',
         |                                     CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         |                      count(*) AS y
         |               FROM events GROUP BY 1, 2),
         |w AS (SELECT event_type, x, y,
         |             lag(y) OVER (PARTITION BY event_type ORDER BY x) AS yp,
         |             lead(y) OVER (PARTITION BY event_type ORDER BY x) AS yn
         |      FROM daily)
         |SELECT event_type,
         |       strftime(DATE '$TrendAnchor' + CAST(x AS INTEGER), '%Y-%m-%d') AS day,
         |       CAST(y AS BIGINT) AS y,
         |       CAST(y - greatest(yp, yn) AS BIGINT) AS prominence
         |FROM w
         |WHERE yp IS NOT NULL AND yn IS NOT NULL AND y > yp AND y > yn
         |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(col("ts").cast(DateType), to_date(lit(TrendAnchor)))
            .cast("long").as("x"))
        .agg(count(lit(1)).as("y"))
      val wx = Window.partitionBy("event_type").orderBy("x")
      daily
        .withColumn("yp", lag("y", 1).over(wx))
        .withColumn("yn", lead("y", 1).over(wx))
        .filter(col("yp").isNotNull && col("yn").isNotNull &&
          col("y") > col("yp") && col("y") > col("yn"))
        .select(col("event_type"),
          date_format(date_add(to_date(lit(TrendAnchor)), col("x").cast("int")), "yyyy-MM-dd")
            .as("day"),
          col("y"), (col("y") - greatest(col("yp"), col("yn"))).as("prominence"))
        .orderBy("event_type", "day")
    },

    // Day-of-week seasonality profile per event_type (round 10) — the
    // weekly-cycle fingerprint: count, share-of-type, and the
    // seasonal index (7·share — 1.0 means "an average day"). Every
    // ratio is a single IEEE division of two exact int64 counts
    // (order-free in both engines, no rounding defense needed beyond
    // the r6 report). dow numbering: Spark weekday()+1 == DuckDB
    // isodow (Mon=1), the one portable pairing. Shape: ONE
    // (|types|×7)-key agg with map-side partials, then a broadcast
    // totals join over the 35-row frame — corpus scanned once.
    Q("q_seasonality",
      s"""WITH e AS (SELECT event_type,
         |                  CAST(isodow(CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS dow
         |           FROM events),
         |d AS (SELECT event_type, dow, count(*) AS cnt FROM e GROUP BY 1, 2),
         |t AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS tot FROM d GROUP BY 1)
         |SELECT d.event_type, dow, cnt,
         |       ${Q.sqlR6("CAST(cnt AS DOUBLE) / tot")} AS share,
         |       ${Q.sqlR6("7 * CAST(cnt AS DOUBLE) / tot")} AS season_idx
         |FROM d JOIN t ON d.event_type = t.event_type
         |ORDER BY d.event_type, dow""".stripMargin) { (s, d) =>
      // Single-scan shape: the per-type total is a window aggregate
      // over the 35-row frame — no re-aggregated totals join.
      Tables.events(s, d)
        .groupBy(col("event_type"),
          (weekday(col("ts").cast(DateType)) + 1).cast("long").as("dow"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("tot", sum("cnt").over(Window.partitionBy("event_type")))
        .select(col("event_type"), col("dow"), col("cnt"),
          Q.r6(col("cnt").cast("double") / col("tot")).as("share"),
          Q.r6(lit(7) * col("cnt").cast("double") / col("tot")).as("season_idx"))
        .orderBy("event_type", "dow")
    },

    // Kaplan–Meier survival curve of user lifetime (round 10) — the
    // censoring-aware retention estimator q_retention's fixed windows
    // cannot give: users whose last event is within 12 HOURS of the
    // dataset end are CENSORED (still alive), not churned, and K-M is
    // the standard way to use them without bias. (The synthetic users
    // are near-uniformly active, so the censor horizon is hours, not
    // the 14 days a production feed would use — the shape is
    // identical.) Lifetime = whole HOURS between a user's first and
    // last event; the at-risk count n_t and event count d_t live on
    // the ≤|hour-span| distinct-duration frame
    // (domain-bounded). Determinism: each factor's ln(1 − d/n) is
    // integer-scaled to 1e-9 BEFORE the cumulative product-as-sum
    // window (the q_mutual_info fold), so S(t) = exp(int64 sum / 1e9)
    // — order-free; a d = n step pins survival to EXACT 0 past it
    // (ln(0) never evaluated). Shape: one user_id-keyed agg (map-side
    // partials), then windows over the tiny duration frame.
    Q("q_kaplan_meier",
      s"""WITH u AS (SELECT user_id,
         |                  min(${Q.sqlEpochSec("ts")}) AS fs,
         |                  max(${Q.sqlEpochSec("ts")}) AS ls
         |           FROM events GROUP BY 1),
         |w AS (SELECT ls - fs AS life, CAST(max(ls) OVER () AS BIGINT) AS te, ls FROM u),
         |f AS (SELECT CAST(floor(life / 3600.0) AS BIGINT) AS t_hour,
         |             count(*) AS m,
         |             CAST(sum(CASE WHEN te - ls > 43200 THEN 1 ELSE 0 END) AS BIGINT) AS dd
         |      FROM w GROUP BY 1),
         |r AS (SELECT t_hour, dd,
         |             CAST(sum(m) OVER () AS BIGINT)
         |               - CAST(coalesce(sum(m) OVER (ORDER BY t_hour
         |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |               AS n_risk
         |      FROM f),
         |e AS (SELECT t_hour, dd, n_risk,
         |             max(CASE WHEN dd = n_risk THEN 1 ELSE 0 END)
         |               OVER (ORDER BY t_hour ROWS UNBOUNDED PRECEDING) AS hit0,
         |             CAST(sum(CASE WHEN dd = n_risk THEN 0
         |                           ELSE CAST(floor(ln(1.0 - CAST(dd AS DOUBLE) / n_risk) * 1e9 + 0.5) AS BIGINT)
         |                      END)
         |                  OVER (ORDER BY t_hour ROWS UNBOUNDED PRECEDING) AS BIGINT) AS lnsum9
         |      FROM r WHERE dd > 0)
         |SELECT t_hour, n_risk, dd AS d_events,
         |       CASE WHEN hit0 = 1 THEN 0.0 ELSE ${Q.sqlR6("exp(lnsum9 / 1e9)")} END AS survival
         |FROM e
         |ORDER BY t_hour""".stripMargin) { (s, d) =>
      kmOf(Tables.events(s, d)
        .groupBy("user_id")
        .agg(min(Q.epochSec(col("ts"))).as("fs"), max(Q.epochSec(col("ts"))).as("ls")))
    },

    // Nelson–Aalen cumulative hazard of user lifetime (round 14) — the
    // additive partner of q_kaplan_meier on the SAME duration frame
    // (lifetime hours, 12h censor horizon): H(t) = Σ_{s≤t} d_s/n_s,
    // the hazard mass accrued by hour t, plus its Klein variance
    // Σ d/n² and the Fleming–Harrington survival exp(−H) — a second,
    // independent estimator of the curve K-M builds multiplicatively
    // (FH ≥ KM always; the two converge as n grows, so their gap is a
    // small-sample honesty readout next to q_kaplan_meier). No ln
    // anywhere: each term is a plain ratio, integer-scaled to 1e-9
    // BEFORE the cumulative window so the running sums are order-free
    // int64 — and d = n needs no special case (the term is just 1).
    // Shape: one user_id-keyed agg (map-side partials), then windows
    // over the ≤|hour-span| duration frame (domain-bounded).
    Q("q_nelson_aalen",
      s"""WITH u AS (SELECT user_id,
         |                  min(${Q.sqlEpochSec("ts")}) AS fs,
         |                  max(${Q.sqlEpochSec("ts")}) AS ls
         |           FROM events GROUP BY 1),
         |w AS (SELECT ls - fs AS life, CAST(max(ls) OVER () AS BIGINT) AS te, ls FROM u),
         |f AS (SELECT CAST(floor(life / 3600.0) AS BIGINT) AS t_hour,
         |             count(*) AS m,
         |             CAST(sum(CASE WHEN te - ls > 43200 THEN 1 ELSE 0 END) AS BIGINT) AS dd
         |      FROM w GROUP BY 1),
         |r AS (SELECT t_hour, dd,
         |             CAST(sum(m) OVER () AS BIGINT)
         |               - CAST(coalesce(sum(m) OVER (ORDER BY t_hour
         |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |               AS n_risk
         |      FROM f),
         |e AS (SELECT t_hour, dd, n_risk,
         |             CAST(sum(CAST(floor(CAST(dd AS DOUBLE) / n_risk * 1e9 + 0.5) AS BIGINT))
         |                  OVER (ORDER BY t_hour ROWS UNBOUNDED PRECEDING) AS BIGINT) AS h9,
         |             CAST(sum(CAST(floor(CAST(dd AS DOUBLE) / n_risk / n_risk * 1e9 + 0.5) AS BIGINT))
         |                  OVER (ORDER BY t_hour ROWS UNBOUNDED PRECEDING) AS BIGINT) AS v9
         |      FROM r WHERE dd > 0)
         |SELECT t_hour, n_risk, dd AS d_events,
         |       ${Q.sqlR6("h9 / 1e9")} AS cum_hazard,
         |       ${Q.sqlR6("v9 / 1e9")} AS hazard_var,
         |       ${Q.sqlR6("exp(-(h9 / 1e9))")} AS survival_fh
         |FROM e
         |ORDER BY t_hour""".stripMargin) { (s, d) =>
      naOf(Tables.events(s, d)
        .groupBy("user_id")
        .agg(min(Q.epochSec(col("ts"))).as("fs"), max(Q.epochSec(col("ts"))).as("ls")))
    },

    // Log-rank (Mantel–Cox) two-group survival comparison (round 14) —
    // "do the two user populations churn at the same rate", the
    // hypothesis test the K-M/N-A curves only let you eyeball. Groups
    // are the deterministic user_id parity split (the house A/B key:
    // q_abtest, q_welch_t); at every death hour the observed group-B
    // deaths are compared against the hypergeometric expectation
    // n1·d/n given the pooled risk set, V = (n1/n)(1−n1/n)·d(n−d)/
    // (n−1), and chi2 = (O1−E1)²/V. Per-hour E and V terms are
    // integer-scaled to 1e-9 BEFORE the cross-hour sum (order-free
    // int64; per-term magnitude ≤ d ≤ n_users — OverflowHeadroomSpec
    // row); censored users (12h horizon) leave the risk sets without
    // ever entering d. Shape: one user_id-keyed agg, then windows +
    // one single-row agg over the ≤|hour-span| duration frame.
    Q("q_log_rank",
      s"""WITH u AS (SELECT user_id,
         |                  min(${Q.sqlEpochSec("ts")}) AS fs,
         |                  max(${Q.sqlEpochSec("ts")}) AS ls
         |           FROM events GROUP BY 1),
         |w AS (SELECT user_id % 2 AS grp, ls - fs AS life,
         |             CAST(max(ls) OVER () AS BIGINT) AS te, ls FROM u),
         |f AS (SELECT CAST(floor(life / 3600.0) AS BIGINT) AS t_hour,
         |             count(*) AS m,
         |             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
         |             CAST(sum(CASE WHEN te - ls > 43200 THEN 1 ELSE 0 END) AS BIGINT) AS dd,
         |             CAST(sum(CASE WHEN te - ls > 43200 AND grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1
         |      FROM w GROUP BY 1),
         |r AS (SELECT t_hour, dd, d1,
         |             CAST(sum(m) OVER () AS BIGINT)
         |               - CAST(coalesce(sum(m) OVER (ORDER BY t_hour
         |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |               AS n,
         |             CAST(sum(m1) OVER () AS BIGINT)
         |               - CAST(coalesce(sum(m1) OVER (ORDER BY t_hour
         |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |               AS n1
         |      FROM f),
         |t AS (SELECT CAST(sum(dd) AS BIGINT) AS d_total,
         |             CAST(sum(d1) AS BIGINT) AS o1,
         |             CAST(sum(CAST(floor(CAST(n1 AS DOUBLE) * dd / n * 1e9 + 0.5)
         |               AS BIGINT)) AS BIGINT) AS e9,
         |             CAST(sum(CASE WHEN n > 1 THEN
         |               CAST(floor(CAST(n1 AS DOUBLE) / n * (1.0 - CAST(n1 AS DOUBLE) / n)
         |                 * dd * (n - dd) / (n - 1) * 1e9 + 0.5) AS BIGINT)
         |               ELSE 0 END) AS BIGINT) AS v9
         |      FROM r WHERE dd > 0),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS nu,
         |             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1u
         |      FROM w)
         |SELECT g.nu - g.n1u AS n_users_a, g.n1u AS n_users_b,
         |       t.d_total AS d_events, t.o1 AS observed_b,
         |       ${Q.sqlR6("t.e9 / 1e9")} AS expected_b,
         |       ${Q.sqlR6("t.v9 / 1e9")} AS variance,
         |       CASE WHEN t.v9 > 0 THEN
         |         ${Q.sqlR6("(t.o1 - t.e9 / 1e9) * (t.o1 - t.e9 / 1e9) / (t.v9 / 1e9)")}
         |       END AS chi2
         |FROM t, g""".stripMargin) { (s, d) =>
      logRankOf(Tables.events(s, d)
        .groupBy("user_id")
        .agg(min(Q.epochSec(col("ts"))).as("fs"), max(Q.epochSec(col("ts"))).as("ls")))
    },

    // Goh–Barabási burstiness of inter-event times per event type
    // (round 10) — the temporal-clustering fingerprint: B = (σ−μ)/
    // (σ+μ) of the per-user gap distribution (B→−1 periodic, 0
    // Poisson, →1 bursty) plus the coefficient of variation. Gaps are
    // whole epoch seconds from a per-user lag (ordered es, event_id —
    // the house total order), so every per-type moment (n, Σg, Σg²)
    // is an exact int64 through sf0.1 (Σg² ≈ 4e18 ceiling; at sf ≥ 1
    // the squares need DECIMAL accumulators, noted here). σ uses the
    // population form n·Σg² − (Σg)² under one sqrt, formula text
    // mirrored per PARITY. Shape: one user_id-partitioned lag window,
    // then a |types|-key agg with map-side partials.
    Q("q_burstiness",
      s"""WITH e AS (SELECT user_id, event_type, event_id,
         |                  ${Q.sqlEpochSec("ts")} AS es
         |           FROM events),
         |g AS (SELECT event_type,
         |             es - lag(es) OVER (PARTITION BY user_id, event_type
         |                                ORDER BY es, event_id) AS gap
         |      FROM e),
         |t AS (SELECT event_type, count(*) AS n,
         |             CAST(sum(gap) AS BIGINT) AS sg,
         |             CAST(sum(gap * gap) AS BIGINT) AS sgg
         |      FROM g WHERE gap IS NOT NULL GROUP BY 1)
         |SELECT event_type, n,
         |       ${Q.sqlR6("CAST(sg AS DOUBLE) / n")} AS mean_gap,
         |       ${Q.sqlR6("sqrt(n * CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * sg) / sg")} AS cv,
         |       ${Q.sqlR6("(sqrt(n * CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * sg) - sg) / (sqrt(n * CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * sg) + sg)")} AS burstiness
         |FROM t
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val wl = Window.partitionBy("user_id", "event_type").orderBy("es", "event_id")
      val g = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          Q.epochSec(col("ts")).as("es"))
        .select(col("event_type"), (col("es") - lag("es", 1).over(wl)).as("gap"))
        .filter(col("gap").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("gap").as("sg"),
          sum(col("gap") * col("gap")).as("sgg"))
      // population σ under ONE sqrt: sqrt(n·Σg² − (Σg)²) / n, with the
      // /n cleared against μ = Σg/n in cv and B (exact cancellation)
      val root = sqrt(col("n") * col("sgg").cast("double") -
        col("sg").cast("double") * col("sg"))
      g.select(col("event_type"), col("n"),
          Q.r6(col("sg").cast("double") / col("n")).as("mean_gap"),
          Q.r6(root / col("sg")).as("cv"),
          Q.r6((root - col("sg")) / (root + col("sg"))).as("burstiness"))
        .orderBy("event_type")
    },

    // Gumbel fit of daily PEAK hourly load per event type (round 14) —
    // the extreme-value capacity-planning readout q_hill_tail's
    // Pareto-on-values can't give: block maxima (the busiest hour of
    // each day) follow a Gumbel law under broad conditions, and the
    // method-of-moments fit β = σ√6/π, μ = m − γβ prices the question
    // "how often will the peak hour exceed 2× its mean" as
    // P = 1 − exp(−exp(−(2m−μ)/β)). Constants are IEEE literals in
    // BOTH engines (π, Euler–Mascheroni γ — never an engine pi()); the
    // block maxima and their moments (n, Σy, Σy²) are exact int64 off
    // one (type, day, hour) agg, so only the final fit is floating
    // point, through one mirrored tree. Shape: two stacked bounded-key
    // aggs (≤|types|·|days|·24 then ≤|types|·|days| rows), map-side
    // partials throughout, no window at all.
    Q("q_gumbel_maxima",
      s"""WITH hourly AS (SELECT event_type,
         |                       CAST(date_diff('day', DATE '${Inference.Anchor}',
         |                                      CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         |                       CAST(hour(ts) AS BIGINT) AS hh, count(*) AS c
         |                FROM events GROUP BY 1, 2, 3),
         |dm AS (SELECT event_type, x, CAST(max(c) AS BIGINT) AS y
         |       FROM hourly GROUP BY 1, 2),
         |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS ss
         |      FROM dm GROUP BY 1),
         |e AS (SELECT event_type, n, s, ss,
         |             CAST(s AS DOUBLE) / n AS m,
         |             (n * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s) /
         |               (CAST(n AS DOUBLE) * (n - 1)) AS v
         |      FROM t),
         |g AS (SELECT event_type, n, m, v,
         |             sqrt(v * 6.0) / 3.141592653589793 AS beta
         |      FROM e)
         |SELECT event_type, n AS n_days, ${Q.sqlR6("m")} AS max_mean,
         |       CASE WHEN n >= 2 AND v > 0 THEN ${Q.sqlR6("beta")} END AS beta,
         |       CASE WHEN n >= 2 AND v > 0 THEN
         |         ${Q.sqlR6("m - 0.5772156649015329 * beta")} END AS mu,
         |       CASE WHEN n >= 2 AND v > 0 THEN
         |         ${Q.sqlR6("1 - exp(-exp(-(2 * m - (m - 0.5772156649015329 * beta)) / beta))")}
         |       END AS p_exceed_2x
         |FROM g
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      gumbelOf(Tables.events(s, d)
        .groupBy(col("event_type"), Inference.dayIndexCol.as("x"),
          hour(col("ts")).cast("long").as("hh"))
        .agg(count(lit(1)).as("c")))
    },

    // Stationary distribution of the event-type Markov chain (round
    // 10): where does a user's session settle in the long run? Three
    // unrolled power-iteration steps π_{k+1} = π_k·P from the uniform
    // start over q_event_transitions' row-normalized matrix (the
    // q_pagerank fixed-iteration move, applied to the |types|² frame).
    // The one cross-row reduction per step — the Σ_i π_i·P_ij matrix
    // product — is made order-free by integer-scaling every term to
    // 1e-12 BEFORE the sum (the q_mutual_info fold), so both engines
    // carry bit-identical vectors into the next round. Shape: after
    // the corpus-side lead() window (the standard single user_id
    // exchange), everything lives on the ≤25-row matrix frame.
    Q("q_markov_stationary",
      s"""WITH e AS (SELECT user_id, event_type, event_id,
         |                  ${Q.sqlEpochSec("ts")} AS es FROM events),
         |pr AS (SELECT event_type AS cur,
         |              lead(event_type) OVER (PARTITION BY user_id
         |                                     ORDER BY es, event_id) AS nxt
         |       FROM e),
         |c AS (SELECT cur, nxt, count(*) AS n FROM pr
         |      WHERE nxt IS NOT NULL GROUP BY 1, 2),
         |m AS (SELECT cur, nxt,
         |             CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY cur) AS BIGINT) AS prob
         |      FROM c),
         |t0 AS (SELECT count(DISTINCT cur) AS k FROM c),
         |q0 AS (SELECT DISTINCT cur AS t, 1.0 / (SELECT k FROM t0) AS p FROM c),
         |p1 AS (SELECT m.nxt AS t, CAST(sum(CAST(floor(q0.p * m.prob * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS s
         |       FROM m JOIN q0 ON q0.t = m.cur GROUP BY 1),
         |q1 AS (SELECT t, CAST(s AS DOUBLE) / 1e12 AS p FROM p1),
         |p2 AS (SELECT m.nxt AS t, CAST(sum(CAST(floor(q1.p * m.prob * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS s
         |       FROM m JOIN q1 ON q1.t = m.cur GROUP BY 1),
         |q2 AS (SELECT t, CAST(s AS DOUBLE) / 1e12 AS p FROM p2),
         |p3 AS (SELECT m.nxt AS t, CAST(sum(CAST(floor(q2.p * m.prob * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS s
         |       FROM m JOIN q2 ON q2.t = m.cur GROUP BY 1),
         |q3 AS (SELECT t, CAST(s AS DOUBLE) / 1e12 AS p FROM p3)
         |SELECT t AS event_type, ${Q.sqlR6("p")} AS stationary_p
         |FROM q3
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("es", "event_id")
      val wc = Window.partitionBy("cur")
      val c = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          Q.epochSec(col("ts")).as("es"))
        .select(col("event_type").as("cur"), lead("event_type", 1).over(w).as("nxt"))
        .filter(col("nxt").isNotNull)
        .groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
        .transform(Q.snapshot) // matrix + type set + k all read this frame
      val m = c.select(col("cur"), col("nxt"),
        (col("n").cast("double") / sum("n").over(wc).cast("long")).as("prob"))
      val k = c.agg(countDistinct("cur").as("k"))
      var p = c.select(col("cur").as("t")).distinct()
        .crossJoin(broadcast(k))
        .select(col("t"), (lit(1.0) / col("k")).as("p"))
      for (_ <- 1 to 3) {
        p = m.join(p.withColumnRenamed("t", "src"), col("src") === col("cur"))
          .groupBy("nxt")
          .agg(sum(floor(col("p") * col("prob") * lit(1e12) + 0.5).cast("long")).as("s"))
          .select(col("nxt").as("t"), (col("s").cast("double") / lit(1e12)).as("p"))
      }
      p.select(col("t").as("event_type"), Q.r6(col("p")).as("stationary_p"))
        .orderBy("event_type")
    },

    // Maximum drawdown of the per-type daily revenue series (round
    // 10): worst peak-to-trough fall of daily takings — the downside-
    // risk lens on the same series q_peak_detection reads for spikes.
    // Revenue is exact int64 CENTS per day, the running peak / the
    // drawdown / its argmax are all INTEGER comparisons (earliest-day
    // tie-break), so no float ulp can move the trough; doubles appear
    // only in the three final display divisions. Shape: corpus
    // collapses to the (|types|×|days|) daily frame first; every
    // window rides that frame's single event_type exchange.
    Q("q_drawdown",
      s"""WITH daily AS (SELECT event_type,
         |                      CAST(date_diff('day', DATE '$TrendAnchor',
         |                                     CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         |                      CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS lvl
         |               FROM events GROUP BY 1, 2),
         |w AS (SELECT event_type, x, lvl,
         |             CAST(max(lvl) OVER (PARTITION BY event_type ORDER BY x
         |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS runmax
         |      FROM daily),
         |r AS (SELECT event_type, x, lvl, runmax, runmax - lvl AS dd,
         |             row_number() OVER (PARTITION BY event_type ORDER BY runmax - lvl DESC, x) AS rn,
         |             count(*) OVER (PARTITION BY event_type) AS n_days
         |      FROM w)
         |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
         |       ${Q.sqlR2("CAST(runmax AS DOUBLE) / 100")} AS peak,
         |       ${Q.sqlR2("CAST(dd AS DOUBLE) / 100")} AS max_drawdown,
         |       strftime(DATE '$TrendAnchor' + CAST(x AS INTEGER), '%Y-%m-%d') AS trough_day,
         |       ${Q.sqlR6("CAST(dd AS DOUBLE) / runmax")} AS dd_frac
         |FROM r WHERE rn = 1
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(col("ts").cast(DateType), to_date(lit(TrendAnchor)))
            .cast("long").as("x"))
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("lvl"))
      val wx = Window.partitionBy("event_type").orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("runmax", max("lvl").over(wx))
        .withColumn("dd", col("runmax") - col("lvl"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy(col("dd").desc, col("x"))))
        .withColumn("n_days", count(lit(1)).over(Window.partitionBy("event_type")))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("n_days"),
          Q.r2(col("runmax").cast("double") / 100).as("peak"),
          Q.r2(col("dd").cast("double") / 100).as("max_drawdown"),
          date_format(date_add(to_date(lit(TrendAnchor)), col("x").cast("int")),
            "yyyy-MM-dd").as("trough_day"),
          Q.r6(col("dd").cast("double") / col("runmax")).as("dd_frac"))
        .orderBy("event_type")
    },

    // Bollinger bands on per-type daily volume (round 10): the 7-day
    // moving mean ± 2σ envelope per full-frame day, with each day's
    // band position (up-breakout / in-band / down-breakout) — the
    // volatility-adaptive cousin of q_peak_detection's fixed neighbor
    // test and q_anomaly's global z-score, in the table form dashboards
    // draw. The trailing-frame moving moments come from INTEGER window
    // sums (Σy, Σy² over a ROWS frame are exact int64), so both engines
    // derive band edges through one mirrored double tree and the
    // band-position comparison can't disagree. Shape: all windows ride
    // the daily frame's single event_type exchange.
    Q("q_bollinger",
      s"""WITH daily AS (SELECT event_type,
         |                      CAST(date_diff('day', DATE '$TrendAnchor',
         |                                     CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         |                      CAST(count(*) AS BIGINT) AS y
         |               FROM events GROUP BY 1, 2),
         |w AS (SELECT event_type, x, y,
         |             CAST(sum(y) OVER (PARTITION BY event_type ORDER BY x
         |                               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS s,
         |             CAST(sum(y * y) OVER (PARTITION BY event_type ORDER BY x
         |                                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS s2,
         |             CAST(count(*) OVER (PARTITION BY event_type ORDER BY x
         |                                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS nw,
         |             row_number() OVER (PARTITION BY event_type ORDER BY x) AS idx
         |      FROM daily),
         |b AS (SELECT event_type, x, y,
         |             CAST(s AS DOUBLE) / nw AS ma,
         |             sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) / nw * s) / (nw - 1)) AS sd
         |      FROM w WHERE idx >= 7)
         |SELECT event_type,
         |       strftime(DATE '$TrendAnchor' + CAST(x AS INTEGER), '%Y-%m-%d') AS day,
         |       y,
         |       ${Q.sqlR4("ma")} AS ma7,
         |       ${Q.sqlR4("sd")} AS sd7,
         |       ${Q.sqlR4("ma + 2 * sd")} AS upper_band,
         |       ${Q.sqlR4("ma - 2 * sd")} AS lower_band,
         |       CASE WHEN y > ma + 2 * sd THEN 'up'
         |            WHEN y < ma - 2 * sd THEN 'down'
         |            ELSE 'in' END AS band_pos
         |FROM b
         |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(col("ts").cast(DateType), to_date(lit(TrendAnchor)))
            .cast("long").as("x"))
        .agg(count(lit(1)).as("y"))
      val f = Window.partitionBy("event_type").orderBy("x").rowsBetween(-6, 0)
      val wx = Window.partitionBy("event_type").orderBy("x")
      daily
        .withColumn("s", sum("y").over(f))
        .withColumn("s2", sum(col("y") * col("y")).over(f))
        .withColumn("nw", count(lit(1)).over(f))
        .withColumn("idx", row_number().over(wx))
        .filter(col("idx") >= 7)
        .withColumn("ma", col("s").cast("double") / col("nw"))
        .withColumn("sd", sqrt((col("s2").cast("double") -
          col("s").cast("double") / col("nw") * col("s")) / (col("nw") - 1)))
        .select(col("event_type"),
          date_format(date_add(to_date(lit(TrendAnchor)), col("x").cast("int")),
            "yyyy-MM-dd").as("day"),
          col("y"),
          Q.r4(col("ma")).as("ma7"),
          Q.r4(col("sd")).as("sd7"),
          Q.r4(col("ma") + lit(2) * col("sd")).as("upper_band"),
          Q.r4(col("ma") - lit(2) * col("sd")).as("lower_band"),
          when(col("y") > col("ma") + lit(2) * col("sd"), "up")
            .when(col("y") < col("ma") - lit(2) * col("sd"), "down")
            .otherwise("in").as("band_pos"))
        .orderBy("event_type", "day")
    },

    // 14-day RSI of per-type daily revenue (round 10): 100·G/(G+L)
    // over the trailing 14 daily deltas (the simple-average RSI;
    // Wilder's recursive smoothing is q_ewma's unroll applied here) —
    // the overbought/oversold momentum gauge. Gains/losses are int64
    // cent deltas; the window sums G and L are exact integers, so RSI
    // is one mirrored double division (50 exactly when the window
    // never moved). Shape: daily frame first, then lag + trailing-sum
    // windows on its single event_type exchange.
    Q("q_rsi",
      s"""WITH daily AS (SELECT event_type,
         |                      CAST(date_diff('day', DATE '$TrendAnchor',
         |                                     CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         |                      CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS lvl
         |               FROM events GROUP BY 1, 2),
         |dl AS (SELECT event_type, x, lvl,
         |              lvl - lag(lvl) OVER (PARTITION BY event_type ORDER BY x) AS delta
         |       FROM daily),
         |g AS (SELECT event_type, x, lvl,
         |             greatest(delta, 0) AS gain, greatest(-delta, 0) AS loss
         |      FROM dl WHERE delta IS NOT NULL),
         |w AS (SELECT event_type, x, lvl,
         |             CAST(sum(gain) OVER (PARTITION BY event_type ORDER BY x
         |                                  ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS gg,
         |             CAST(sum(loss) OVER (PARTITION BY event_type ORDER BY x
         |                                  ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS ll,
         |             row_number() OVER (PARTITION BY event_type ORDER BY x) AS idx
         |      FROM g)
         |SELECT event_type,
         |       strftime(DATE '$TrendAnchor' + CAST(x AS INTEGER), '%Y-%m-%d') AS day,
         |       ${Q.sqlR2("CAST(lvl AS DOUBLE) / 100")} AS close_px,
         |       ${Q.sqlR4("CASE WHEN gg + ll = 0 THEN 50 ELSE 100 * CAST(gg AS DOUBLE) / (gg + ll) END")} AS rsi
         |FROM w WHERE idx >= 14
         |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(col("ts").cast(DateType), to_date(lit(TrendAnchor)))
            .cast("long").as("x"))
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("lvl"))
      val wx = Window.partitionBy("event_type").orderBy("x")
      val f = Window.partitionBy("event_type").orderBy("x").rowsBetween(-13, 0)
      daily
        .withColumn("delta", col("lvl") - lag("lvl", 1).over(wx))
        .filter(col("delta").isNotNull)
        .withColumn("gain", greatest(col("delta"), lit(0L)))
        .withColumn("loss", greatest(-col("delta"), lit(0L)))
        .withColumn("gg", sum("gain").over(f))
        .withColumn("ll", sum("loss").over(f))
        .withColumn("idx", row_number().over(wx))
        .filter(col("idx") >= 14)
        .select(col("event_type"),
          date_format(date_add(to_date(lit(TrendAnchor)), col("x").cast("int")),
            "yyyy-MM-dd").as("day"),
          Q.r2(col("lvl").cast("double") / 100).as("close_px"),
          Q.r4(when(col("gg") + col("ll") === 0, 50)
            .otherwise(lit(100) * col("gg").cast("double") / (col("gg") + col("ll"))))
            .as("rsi"))
        .orderBy("event_type", "day")
    },

    // Holt double exponential smoothing of the per-type daily volume
    // (round 10, α=β=0.5) — the trend-aware forecaster q_ewma's single
    // recursion cannot give: level l_t = α·y_t + (1−α)(l+b) and trend
    // b_t = β(l_t − l) + (1−β)b evolve together, and l+b is the
    // one-step-ahead forecast dashboards draw past the last day.
    // Seeding: l_1 = y_1, b_1 = 0. α=β=0.5 makes every coefficient
    // multiply exact in IEEE doubles, and the recursion is evaluated
    // in the SAME operation order on both sides — the Spark fold below
    // and the oracle's recursive CTE are the same multiply-add chain,
    // so the doubles agree bit-for-bit before the r6 report. Shape:
    // the corpus collapses to the (|types|×|days|) daily frame FIRST;
    // each day folds its own history in-row from a window collect_list
    // (the q_ewma unroll) — |days|²-bounded per type, calendar-bounded
    // by construction, corpus-independent; one scan, one exchange.
    Q("q_holt_linear",
      s"""WITH RECURSIVE daily AS (SELECT event_type,
         |                      CAST(date_diff('day', DATE '$TrendAnchor',
         |                                     CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         |                      count(*) AS y
         |               FROM events GROUP BY 1, 2),
         |seq AS (SELECT event_type, x, y,
         |               CAST(row_number() OVER (PARTITION BY event_type ORDER BY x) AS BIGINT) AS rn
         |        FROM daily),
         |rec AS (SELECT event_type, rn, x, y, CAST(y AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b
         |        FROM seq WHERE rn = 1
         |        UNION ALL
         |        SELECT s.event_type, s.rn, s.x, s.y,
         |               0.5 * s.y + 0.5 * (r.l + r.b),
         |               0.5 * (0.5 * s.y + 0.5 * (r.l + r.b) - r.l) + 0.5 * r.b
         |        FROM rec r JOIN seq s ON s.event_type = r.event_type AND s.rn = r.rn + 1)
         |SELECT event_type, x AS day_idx, y,
         |       ${Q.sqlR6("l")} AS level, ${Q.sqlR6("b")} AS trend,
         |       ${Q.sqlR6("l + b")} AS forecast
         |FROM rec
         |ORDER BY event_type, day_idx""".stripMargin) { (s, d) =>
      // Single-scan shape (the oracle keeps the recursive-CTE
      // formulation — a genuinely different evaluation strategy over
      // the same arithmetic): each day's full history arrives as a
      // window collect_list and the (level, trend) pair folds IN-ROW
      // left-to-right — exactly the recursion, one multiply-add chain.
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(col("ts").cast(DateType), to_date(lit(TrendAnchor)))
            .cast("long").as("x"))
        .agg(count(lit(1)).as("y"))
      val wx = Window.partitionBy("event_type").orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("hist", collect_list(col("y")).over(wx))
        .withColumn("st", expr(
          """aggregate(hist,
            |  named_struct('i', CAST(0 AS BIGINT), 'l', CAST(0 AS DOUBLE), 'b', CAST(0 AS DOUBLE)),
            |  (acc, y) -> CASE WHEN acc.i = 0
            |    THEN named_struct('i', CAST(1 AS BIGINT), 'l', CAST(y AS DOUBLE), 'b', CAST(0 AS DOUBLE))
            |    ELSE named_struct('i', acc.i + CAST(1 AS BIGINT),
            |                      'l', 0.5 * y + 0.5 * (acc.l + acc.b),
            |                      'b', 0.5 * (0.5 * y + 0.5 * (acc.l + acc.b) - acc.l) + 0.5 * acc.b)
            |    END)""".stripMargin))
        .select(col("event_type"), col("x").as("day_idx"), col("y"),
          Q.r6(col("st.l")).as("level"), Q.r6(col("st.b")).as("trend"),
          Q.r6(col("st.l") + col("st.b")).as("forecast"))
        .orderBy("event_type", "day_idx")
    },

    // Additive Holt-Winters smoothing of the per-type daily series
    // (round 15, α=β=γ=0.5, season length 7): q_holt_linear's
    // level+trend recursion extended with a 7-slot seasonal state —
    // l_t = α(y_t − s_{t−7}) + (1−α)(l+b), b_t = β(l_t − l) + (1−β)b,
    // s_t = γ(y_t − l_t) + (1−γ)s_{t−7} — seeded l₁ = y₁, b₁ = 0,
    // s = 0⃗ (the first week behaves like Holt while the seasonal
    // indices build; documented, both engines share the seed). The
    // seasonal slot is the CALENDAR phase x % 7 (gap-proof — a missing
    // day cannot shift later days' phases). Determinism: the oracle
    // runs the recursion as a recursive CTE carrying the LIST state;
    // Spark folds the same arithmetic left-to-right in-row over each
    // day's window collect_list — identical IEEE ops in identical
    // order, so levels agree to the bit. One-step forecast = l + b +
    // s[(x+1) mod 7]. Shape: one corpus scan onto the (|types|×|days|)
    // frame; the history window is calendar-bounded.
    Q("q_holt_winters",
      s"""WITH RECURSIVE daily AS (SELECT event_type,
         |                      CAST(date_diff('day', DATE '$TrendAnchor',
         |                                     CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         |                      count(*) AS y
         |               FROM events GROUP BY 1, 2),
         |seq AS (SELECT event_type, x, y,
         |               CAST(row_number() OVER (PARTITION BY event_type ORDER BY x) AS BIGINT) AS rn
         |        FROM daily),
         |rec AS (SELECT event_type, rn, x, y, CAST(y AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b,
         |               list_transform(range(0, 7), j -> CAST(0 AS DOUBLE)) AS s
         |        FROM seq WHERE rn = 1
         |        UNION ALL
         |        SELECT s2.event_type, s2.rn, s2.x, s2.y,
         |               0.5 * (s2.y - r.s[(s2.x % 7) + 1]) + 0.5 * (r.l + r.b),
         |               0.5 * ((0.5 * (s2.y - r.s[(s2.x % 7) + 1]) + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b,
         |               list_transform(range(0, 7), j -> CASE WHEN j = s2.x % 7
         |                 THEN 0.5 * (s2.y - (0.5 * (s2.y - r.s[(s2.x % 7) + 1]) + 0.5 * (r.l + r.b))) + 0.5 * r.s[(s2.x % 7) + 1]
         |                 ELSE r.s[j + 1] END)
         |        FROM rec r JOIN seq s2 ON s2.event_type = r.event_type AND s2.rn = r.rn + 1)
         |SELECT event_type, x AS day_idx, y,
         |       ${Q.sqlR6("l")} AS level, ${Q.sqlR6("b")} AS trend,
         |       ${Q.sqlR6("s[(x % 7) + 1]")} AS season,
         |       ${Q.sqlR6("l + b + s[((x + 1) % 7) + 1]")} AS forecast
         |FROM rec
         |ORDER BY event_type, day_idx""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(col("ts").cast(DateType), to_date(lit(TrendAnchor)))
            .cast("long").as("x"))
        .agg(count(lit(1)).as("y"))
      val wx = Window.partitionBy("event_type").orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("hist",
          collect_list(struct(col("y"), (col("x") % 7).as("ph"))).over(wx))
        .withColumn("st", expr(
          """aggregate(hist,
            |  named_struct('f', CAST(0 AS INT), 'l', CAST(0 AS DOUBLE), 'b', CAST(0 AS DOUBLE),
            |               's', transform(sequence(0, 6), j -> CAST(0 AS DOUBLE))),
            |  (acc, e) -> CASE WHEN acc.f = 0
            |    THEN named_struct('f', 1, 'l', CAST(e.y AS DOUBLE), 'b', CAST(0 AS DOUBLE), 's', acc.s)
            |    ELSE named_struct('f', 1,
            |      'l', 0.5 * (e.y - element_at(acc.s, CAST(e.ph AS INT) + 1)) + 0.5 * (acc.l + acc.b),
            |      'b', 0.5 * ((0.5 * (e.y - element_at(acc.s, CAST(e.ph AS INT) + 1)) + 0.5 * (acc.l + acc.b)) - acc.l) + 0.5 * acc.b,
            |      's', transform(sequence(0, 6), j -> CASE WHEN j = e.ph
            |        THEN 0.5 * (e.y - (0.5 * (e.y - element_at(acc.s, CAST(e.ph AS INT) + 1)) + 0.5 * (acc.l + acc.b))) + 0.5 * element_at(acc.s, CAST(e.ph AS INT) + 1)
            |        ELSE element_at(acc.s, CAST(j AS INT) + 1) END))
            |    END)""".stripMargin))
        .select(col("event_type"), col("x").as("day_idx"), col("y"),
          Q.r6(col("st.l")).as("level"), Q.r6(col("st.b")).as("trend"),
          Q.r6(element_at(col("st.s"), (col("x") % 7 + 1).cast("int"))).as("season"),
          Q.r6(col("st.l") + col("st.b") +
            element_at(col("st.s"), ((col("x") + 1) % 7 + 1).cast("int"))).as("forecast"))
        .orderBy("event_type", "day_idx")
    },

    // Classical additive decomposition of the per-type daily series
    // (round 10): y = trend + seasonal + residual, with trend = the
    // centered 7-OBSERVATION moving average (row semantics on both
    // sides — interior days only, so every window is exactly 7 rows)
    // and seasonal = the mean detrended value of the day's 7-phase
    // bucket ((x % 7) — the anchor is a Monday, so phase 0 = Monday,
    // but parity needs only that both engines bucket identically).
    // Determinism is the q_mutual_info integer-scaling move: the
    // detrended value is kept as the EXACT int64 7·y − Σ₇y (y − MA =
    // (7y − Σ₇y)/7), the per-bucket seasonal sum is an order-free
    // int64 fold, and every division happens once at report time —
    // no float accumulates across rows on either side. Shape: corpus
    // → (|types|×|days|) daily frame, windows on its per-type
    // partitioning, seasonal via a window over the bounded frame (the
    // oracle keeps the equivalent join formulation) — one corpus scan.
    Q("q_decompose",
      s"""WITH daily AS (SELECT event_type,
         |                      CAST(date_diff('day', DATE '$TrendAnchor',
         |                                     CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         |                      count(*) AS y
         |               FROM events GROUP BY 1, 2),
         |w AS (SELECT event_type, x, y,
         |             CAST(sum(y) OVER (PARTITION BY event_type ORDER BY x
         |                               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS t7,
         |             count(*) OVER (PARTITION BY event_type ORDER BY x
         |                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7
         |      FROM daily),
         |f AS (SELECT event_type, x, y, t7, 7 * y - t7 AS d7 FROM w WHERE n7 = 7),
         |sn AS (SELECT event_type, x % 7 AS ph, CAST(sum(d7) AS BIGINT) AS sd7, count(*) AS sc
         |       FROM f GROUP BY 1, 2)
         |SELECT f.event_type, f.x AS day_idx, f.y,
         |       ${Q.sqlR6("t7 / 7.0")} AS trend,
         |       ${Q.sqlR6("sd7 / (7.0 * sc)")} AS seasonal,
         |       ${Q.sqlR6("d7 / 7.0 - sd7 / (7.0 * sc)")} AS residual
         |FROM f JOIN sn ON f.event_type = sn.event_type AND f.x % 7 = sn.ph
         |ORDER BY f.event_type, day_idx""".stripMargin) { (s, d) =>
      decomposeOf(Inference.dailyCounts(s, d))
    },

    // Seasonally-adjusted anomaly days per type (round 14): the outlier
    // screen q_anomaly's raw z-score gets WRONG on cyclic series — a
    // normal Saturday peak z-flags every week — so this one flags days
    // whose DECOMPOSITION RESIDUAL exceeds the robust MAD fence
    // (|r| > 3·1.4826·median|r|, the q_mad_outliers rule applied after
    // the q_decompose frame removes trend + weekly cycle). Exactness:
    // the residual is the exact int64 ratio (d7·sc − sd7)/(7·sc) —
    // identical trees ⇒ identical doubles ⇒ engine-consistent ranking;
    // the median|r| is an explicit middle-rank probe on the
    // type-partitioned daily frame (the q_moods_median move). Scale:
    // everything after the one map-side daily agg runs on the
    // |types|×|days| frame.
    Q("q_seasonal_anomaly",
      s"""WITH daily AS (SELECT event_type,
         |                      CAST(date_diff('day', DATE '$TrendAnchor',
         |                                     CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         |                      count(*) AS y
         |               FROM events GROUP BY 1, 2),
         |w AS (SELECT event_type, x, y,
         |             CAST(sum(y) OVER (PARTITION BY event_type ORDER BY x
         |                               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS t7,
         |             count(*) OVER (PARTITION BY event_type ORDER BY x
         |                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7
         |      FROM daily),
         |f AS (SELECT event_type, x, y, t7, 7 * y - t7 AS d7 FROM w WHERE n7 = 7),
         |sn AS (SELECT event_type, x % 7 AS ph, CAST(sum(d7) AS BIGINT) AS sd7, count(*) AS sc
         |       FROM f GROUP BY 1, 2),
         |r AS (SELECT f.event_type, f.x,
         |             CAST(d7 * sc - sd7 AS DOUBLE) / (7 * sc) AS resid
         |      FROM f JOIN sn ON f.event_type = sn.event_type AND f.x % 7 = sn.ph),
         |rk AS (SELECT event_type, x, resid, abs(resid) AS ar,
         |              row_number() OVER (PARTITION BY event_type
         |                                 ORDER BY abs(resid), x) AS rn,
         |              count(*) OVER (PARTITION BY event_type) AS n
         |       FROM r),
         |md AS (SELECT event_type,
         |              CAST(min(CASE WHEN rn * 2 >= n + (n % 2) THEN ar END) AS DOUBLE) AS med
         |       FROM rk GROUP BY 1),
         |fl AS (SELECT rk.event_type, x, resid, ar, n,
         |              CASE WHEN ar > 4.4478 * med THEN 1 ELSE 0 END AS hit,
         |              row_number() OVER (PARTITION BY rk.event_type
         |                                 ORDER BY ar DESC, x) AS wr
         |       FROM rk JOIN md ON rk.event_type = md.event_type)
         |SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
         |       CAST(sum(hit) AS BIGINT) AS n_anomalies,
         |       strftime(DATE '$TrendAnchor' + CAST(max(CASE WHEN wr = 1 THEN x END)
         |         AS INTEGER), '%Y-%m-%d') AS worst_day,
         |       ${Q.sqlR6("max(CASE WHEN wr = 1 THEN resid END)")} AS worst_residual
         |FROM fl GROUP BY 1
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      seasonalAnomalyOf(Inference.dailyCounts(s, d))
    },

    // Seasonal / trend strength per event type (round 11) — Hyndman's
    // STL strength measures over the SAME classical decomposition as
    // q_decompose (shared frame, shared integer ingredients):
    // F_s = max(0, 1 − Var(resid)/Var(seasonal+resid)) and
    // F_t = max(0, 1 − Var(resid)/Var(trend+resid)) — "is the weekly
    // cycle / the trend real or noise?", the one-number gate before
    // any seasonal model is trusted. Determinism: every per-row
    // component is a ratio of EXACT int64s (d7, sd7, sc, y), scaled to
    // 1e-3 integers per row BEFORE the per-type variance sums, so both
    // engines run int64 sufficient statistics through one mirrored
    // variance-ratio tree. Headroom at 1e3: a per-row component of
    // magnitude C scales to v3 ≈ C·1e3 and the binding composite is
    // n·Σ(v3)² ≈ n²·C²·1e6, growing ∝ SF² (C ∝ daily count ∝ SF, row
    // count fixed at |types|×|days|). Measured 5.3e14 at sf0.1 →
    // audited ceiling SF ≈ 6 with 2× slack (OverflowHeadroomSpec);
    // past that the components need a coarser lattice or decimal
    // accumulators. Scale (data volume):
    // rides the decompose frame (|types|×|days| rows after one
    // map-side-partial agg).
    Q("q_seasonal_strength",
      s"""WITH daily AS (SELECT event_type,
         |                      CAST(date_diff('day', DATE '$TrendAnchor',
         |                                     CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         |                      count(*) AS y
         |               FROM events GROUP BY 1, 2),
         |w AS (SELECT event_type, x, y,
         |             CAST(sum(y) OVER (PARTITION BY event_type ORDER BY x
         |                               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS t7,
         |             count(*) OVER (PARTITION BY event_type ORDER BY x
         |                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7
         |      FROM daily),
         |f AS (SELECT event_type, x, y, t7, 7 * y - t7 AS d7 FROM w WHERE n7 = 7),
         |sn AS (SELECT event_type, x % 7 AS ph, CAST(sum(d7) AS BIGINT) AS sd7, count(*) AS sc
         |       FROM f GROUP BY 1, 2),
         |v AS (SELECT f.event_type,
         |             CAST(floor((d7 / 7.0 - sd7 / (7.0 * sc)) * 1e3 + 0.5) AS BIGINT) AS r3v,
         |             CAST(floor((d7 / 7.0) * 1e3 + 0.5) AS BIGINT) AS s3v,
         |             CAST(floor((y - sd7 / (7.0 * sc)) * 1e3 + 0.5) AS BIGINT) AS t3v
         |      FROM f JOIN sn ON f.event_type = sn.event_type AND f.x % 7 = sn.ph),
         |st AS (SELECT event_type, count(*) AS n,
         |              CAST(sum(r3v) AS BIGINT) AS sr, CAST(sum(r3v * r3v) AS BIGINT) AS srr,
         |              CAST(sum(s3v) AS BIGINT) AS ss, CAST(sum(s3v * s3v) AS BIGINT) AS sss,
         |              CAST(sum(t3v) AS BIGINT) AS stv, CAST(sum(t3v * t3v) AS BIGINT) AS stt
         |       FROM v GROUP BY 1)
         |SELECT event_type, n AS n_days,
         |       ${Q.sqlR6("CASE WHEN 1.0 - CAST(n * srr - sr * sr AS DOUBLE) / (n * sss - ss * ss) > 0 THEN 1.0 - CAST(n * srr - sr * sr AS DOUBLE) / (n * sss - ss * ss) ELSE 0.0 END")} AS seasonal_strength,
         |       ${Q.sqlR6("CASE WHEN 1.0 - CAST(n * srr - sr * sr AS DOUBLE) / (n * stt - stv * stv) > 0 THEN 1.0 - CAST(n * srr - sr * sr AS DOUBLE) / (n * stt - stv * stv) ELSE 0.0 END")} AS trend_strength
         |FROM st
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      seasonalStrengthOf(Inference.dailyCounts(s, d))
    },

    // Croston's method over per-part shipment demand (round 16): the
    // intermittent-demand forecaster a supply pipeline runs per SKU —
    // most parts ship on a handful of scattered days, exactly the
    // zero-inflated series where SES on the raw values collapses.
    // Per demand day: z ← α·q + (1−α)·z (demand size EWMA) and
    // p ← α·(x−x_prev) + (1−α)·p (inter-demand interval EWMA, seeded
    // at 1.0 — the no-history convention, documented); forecast =
    // z/p demand per day. α = 0.1. Shape: lineitem collapses to the
    // (part, day) demand grid in ONE keyed agg (map-side partials);
    // each part's fold is ONE left-to-right aggregate() over its
    // sorted demand days (the q_burst_detect shape — per-part state,
    // never a prefix window); the readout is the top-20 by forecast
    // via sort+limit. Quantities are exact int64 (TPC-H quantities
    // are whole); the EWMA recursion is term-for-term identical to
    // the oracle's recursive CTE; the ordering key f6 floors the
    // forecast to 1e-6 so the top-20 pick is an integer comparison.
    Q("q_croston",
      s"""WITH RECURSIVE dem AS (SELECT l_partkey AS pk,
         |             CAST(date_diff('day', DATE '1992-01-01', l_shipdate) AS BIGINT) AS x,
         |             CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS q
         |      FROM lineitem GROUP BY 1, 2),
         |seq AS (SELECT pk, x, q,
         |               CAST(row_number() OVER (PARTITION BY pk ORDER BY x) AS BIGINT) AS rn,
         |               CAST(count(*) OVER (PARTITION BY pk) AS BIGINT) AS nd
         |        FROM dem),
         |rec AS (SELECT pk, rn, nd, x, CAST(q AS DOUBLE) AS z, CAST(1.0 AS DOUBLE) AS p
         |        FROM seq WHERE rn = 1
         |        UNION ALL
         |        SELECT s.pk, s.rn, s.nd, s.x,
         |               0.1 * s.q + 0.9 * r.z,
         |               0.1 * (s.x - r.x) + 0.9 * r.p
         |        FROM rec r JOIN seq s ON s.pk = r.pk AND s.rn = r.rn + 1),
         |f AS (SELECT pk, nd, z, p, z / p AS fc,
         |             CAST(floor(z / p * 1e6 + 0.5) AS BIGINT) AS f6
         |      FROM rec WHERE rn = nd)
         |SELECT pk AS l_partkey, nd AS n_demand_days,
         |       ${Q.sqlR6("z")} AS z_size, ${Q.sqlR6("p")} AS p_interval,
         |       ${Q.sqlR6("fc")} AS forecast_per_day
         |FROM f
         |ORDER BY f6 DESC, pk
         |LIMIT 20""".stripMargin) { (s, d) =>
      val dem = Tables.load(s, d, "lineitem")
        .groupBy(col("l_partkey").as("pk"),
          datediff(col("l_shipdate"), to_date(lit("1992-01-01"))).cast("long").as("x"))
        .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("q"))
      dem.groupBy("pk")
        .agg(count(lit(1)).as("nd"),
          sort_array(collect_list(struct(col("x"), col("q")))).as("xs"))
        .withColumn("st", expr(
          """aggregate(xs,
            |  named_struct('f', CAST(0 AS INT), 'px', CAST(0 AS BIGINT),
            |    'z', CAST(0 AS DOUBLE), 'p', CAST(0 AS DOUBLE)),
            |  (acc, e) -> CASE WHEN acc.f = 0
            |    THEN named_struct('f', 1, 'px', e.x,
            |      'z', CAST(e.q AS DOUBLE), 'p', CAST(1.0 AS DOUBLE))
            |    ELSE named_struct('f', 1, 'px', e.x,
            |      'z', 0.1 * e.q + 0.9 * acc.z,
            |      'p', 0.1 * (e.x - acc.px) + 0.9 * acc.p)
            |    END)""".stripMargin))
        .select(col("pk"), col("nd"), col("st.z").as("z"), col("st.p").as("p"),
          (col("st.z") / col("st.p")).as("fc"),
          floor(col("st.z") / col("st.p") * 1e6 + 0.5).cast("long").as("f6"))
        .orderBy(col("f6").desc, col("pk"))
        .limit(20)
        .select(col("pk").as("l_partkey"), col("nd").as("n_demand_days"),
          Q.r6(col("z")).as("z_size"), Q.r6(col("p")).as("p_interval"),
          Q.r6(col("fc")).as("forecast_per_day"))
    },

    // Weibull fit of the interpurchase-gap distribution (round 16):
    // median-rank regression — the probability-plot method — on
    // ln(gap) vs ln(−ln(1−F)) with Bernard's approximation
    // F = (r−0.3)/(n+0.4) at each gap value's average rank; slope =
    // shape k (k<1 ⇒ bursty re-ordering, k≈1 ⇒ memoryless, k>1 ⇒
    // rhythmic), scale λ = exp(−intercept/k) in days. The survival
    // family's parametric summary beside q_kaplan_meier's
    // nonparametric curve. Scale shape: gaps collapse onto the
    // calendar-bounded distinct-gap grid FIRST (map-side partials);
    // ranks are prefix sums over that grid, never a corpus sort; the
    // five weighted regression sums are integer-latticed to 1e6 per
    // CELL so the reduction is an order-free int64 fold; same-day
    // repeat orders (gap 0) are excluded — ln needs gap ≥ 1.
    Q("q_weibull_fit",
      s"""WITH o AS (SELECT o_custkey,
         |                  CAST(date_diff('day', DATE '1992-01-01',
         |                                 CAST(date_trunc('day', o_orderdate) AS DATE)) AS BIGINT) AS x
         |           FROM orders),
         |g AS (SELECT o_custkey,
         |             x - lag(x) OVER (PARTITION BY o_custkey ORDER BY x) AS gap
         |      FROM o),
         |gc AS (SELECT gap, CAST(count(*) AS BIGINT) AS c
         |       FROM g WHERE gap >= 1 GROUP BY 1),
         |pr AS (SELECT gap, c,
         |              CAST(sum(c) OVER (ORDER BY gap) AS BIGINT) AS cum,
         |              CAST(sum(c) OVER () AS BIGINT) AS n,
         |              CAST(count(*) OVER () AS BIGINT) AS kc
         |       FROM gc),
         |xy AS (SELECT gap, c, n, kc,
         |              ln(CAST(gap AS DOUBLE)) AS xx,
         |              ln(-ln(1.0 - (cum - c + (c + 1) / 2.0 - 0.3) / (n + 0.4))) AS yy
         |       FROM pr),
         |sm AS (SELECT max(n) AS n, max(kc) AS kc,
         |              CAST(sum(c) AS BIGINT) AS sw,
         |              CAST(sum(CAST(floor(c * xx * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sx6,
         |              CAST(sum(CAST(floor(c * yy * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sy6,
         |              CAST(sum(CAST(floor(c * xx * xx * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sxx6,
         |              CAST(sum(CAST(floor(c * xx * yy * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sxy6
         |       FROM xy),
         |ft AS (SELECT n, kc, sw,
         |              (sw * (CAST(sxy6 AS DOUBLE) / 1e6) -
         |               (CAST(sx6 AS DOUBLE) / 1e6) * (CAST(sy6 AS DOUBLE) / 1e6)) /
         |              (sw * (CAST(sxx6 AS DOUBLE) / 1e6) -
         |               (CAST(sx6 AS DOUBLE) / 1e6) * (CAST(sx6 AS DOUBLE) / 1e6)) AS k,
         |              CAST(sx6 AS DOUBLE) / 1e6 AS sx, CAST(sy6 AS DOUBLE) / 1e6 AS sy
         |       FROM sm
         |       WHERE kc >= 2 AND
         |             sw * (CAST(sxx6 AS DOUBLE) / 1e6) -
         |             (CAST(sx6 AS DOUBLE) / 1e6) * (CAST(sx6 AS DOUBLE) / 1e6) > 0)
         |SELECT n AS n_gaps, kc AS k_cells, ${Q.sqlR4("k")} AS shape,
         |       CASE WHEN k > 0 THEN
         |         ${Q.sqlR2("exp(-((sy - k * sx) / sw) / k)")}
         |       END AS scale_days
         |FROM ft
         |ORDER BY n_gaps""".stripMargin) { (s, d) =>
      val wc = Window.partitionBy("o_custkey").orderBy("x")
      val g = Tables.load(s, d, "orders")
        .select(col("o_custkey"),
          datediff(col("o_orderdate").cast(DateType), to_date(lit("1992-01-01")))
            .cast("long").as("x"))
        .withColumn("gap", col("x") - lag("x", 1).over(wc))
        .filter(col("gap") >= 1)
      val gc = g.groupBy("gap").agg(count(lit(1)).as("c"))
      val wg = Window.orderBy("gap")
      val pr = gc
        .withColumn("cum", sum("c").over(wg))
        .withColumn("n", sum("c").over(Window.partitionBy()))
        .withColumn("kc", count(lit(1)).over(Window.partitionBy()))
      val xy = pr
        .withColumn("xx", log(col("gap").cast("double")))
        .withColumn("yy", log(-log(lit(1.0) -
          (col("cum") - col("c") + (col("c") + 1) / lit(2.0) - 0.3) / (col("n") + 0.4))))
      val sm = xy.agg(max("n").as("n"), max("kc").as("kc"),
        sum("c").as("sw"),
        sum(floor(col("c") * col("xx") * lit(1e6) + 0.5).cast("long")).as("sx6"),
        sum(floor(col("c") * col("yy") * lit(1e6) + 0.5).cast("long")).as("sy6"),
        sum(floor(col("c") * col("xx") * col("xx") * lit(1e6) + 0.5).cast("long")).as("sxx6"),
        sum(floor(col("c") * col("xx") * col("yy") * lit(1e6) + 0.5).cast("long")).as("sxy6"))
      val sx = col("sx6").cast("double") / lit(1e6)
      val sy = col("sy6").cast("double") / lit(1e6)
      val den = col("sw") * (col("sxx6").cast("double") / lit(1e6)) - sx * sx
      val kCol = (col("sw") * (col("sxy6").cast("double") / lit(1e6)) - sx * sy) / den
      sm.filter(col("kc") >= 2 && den > 0)
        .withColumn("k", kCol)
        .withColumn("sx", sx).withColumn("sy", sy)
        .select(col("n").as("n_gaps"), col("kc").as("k_cells"),
          Q.r4(col("k")).as("shape"),
          when(col("k") > 0,
            Q.r2(exp(-((col("sy") - col("k") * col("sx")) / col("sw")) / col("k"))))
            .as("scale_days"))
        .orderBy("n_gaps")
    },

    // XYZ demand-variability classification (round 16): the
    // coefficient-of-variation companion to q_abc_class — per part
    // SKU, the CV of QUARTERLY demand over the full quarter calendar
    // (missing quarters are real zeros; finer grains are all-Z on a
    // sporadic order stream — measured, not guessed) bands parts into
    // X (steady,
    // cv ≤ 0.5), Y (variable, cv ≤ 1) and Z (sporadic) — the
    // forecastability axis every inventory policy crosses with ABC.
    // The band decision is CROSS-MULTIPLIED int64 (cv² = W(WQ−S²)/
    // ((W−1)S²) vs ¼ and 1 — no float compares); only the three class
    // shares divide at readout. Shape: lineitem collapses to the
    // (part, week) demand grid with map-side partials, then ONE
    // part-keyed agg against the broadcast quarter count — no window
    // over the catalog, no dense part×quarter fill (zeros enter through
    // W, not rows).
    Q("q_xyz_class",
      s"""WITH dem AS (SELECT l_partkey AS pk,
         |                    CAST(date_diff('day', DATE '1992-01-01', l_shipdate) AS BIGINT) // 91 AS w,
         |                    CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS q
         |             FROM lineitem GROUP BY 1, 2),
         |wk AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS nw FROM dem),
         |st AS (SELECT pk, CAST(sum(q) AS BIGINT) AS s, CAST(sum(q * q) AS BIGINT) AS qq
         |       FROM dem GROUP BY 1),
         |cl AS (SELECT pk, s,
         |              CASE WHEN wk.nw < 2 OR
         |                        4 * wk.nw * (wk.nw * qq - s * s) <= (wk.nw - 1) * s * s
         |                     THEN 'X'
         |                   WHEN wk.nw * (wk.nw * qq - s * s) <= (wk.nw - 1) * s * s
         |                     THEN 'Y'
         |                   ELSE 'Z' END AS cls
         |       FROM st CROSS JOIN wk),
         |g AS (SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
         |             CAST(sum(s) AS BIGINT) AS total_demand
         |      FROM cl GROUP BY 1),
         |tt AS (SELECT CAST(sum(total_demand) AS BIGINT) AS t FROM g)
         |SELECT g.cls AS xyz_class, g.n_parts, g.total_demand,
         |       ${Q.sqlR6("CAST(g.total_demand AS DOUBLE) / tt.t")} AS demand_share
         |FROM g CROSS JOIN tt
         |ORDER BY xyz_class""".stripMargin) { (s, d) =>
      val dem = Tables.load(s, d, "lineitem")
        .groupBy(col("l_partkey").as("pk"),
          (datediff(col("l_shipdate").cast(DateType), to_date(lit("1992-01-01")))
            .cast("long") / 91).cast("long").as("w"))
        .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("q"))
        .transform(Q.snapshot)
      val wk = dem.agg(countDistinct("w").as("nw"))
      val st = dem.groupBy("pk").agg(sum("q").as("s"), sum(col("q") * col("q")).as("qq"))
      val cl = st.crossJoin(broadcast(wk))
        .select(col("pk"), col("s"),
          when(col("nw") < 2 ||
            lit(4) * col("nw") * (col("nw") * col("qq") - col("s") * col("s")) <=
              (col("nw") - 1) * col("s") * col("s"), "X")
            .when(col("nw") * (col("nw") * col("qq") - col("s") * col("s")) <=
              (col("nw") - 1) * col("s") * col("s"), "Y")
            .otherwise("Z").as("cls"))
      val g = Q.snapshot(cl.groupBy("cls")
        .agg(count(lit(1)).as("n_parts"), sum("s").as("total_demand")))
      val tt = g.agg(sum("total_demand").as("t"))
      g.crossJoin(broadcast(tt))
        .select(col("cls").as("xyz_class"), col("n_parts"), col("total_demand"),
          Q.r6(col("total_demand").cast("double") / col("t")).as("demand_share"))
        .orderBy("xyz_class")
    }
  )

  /** The MAD-fence anomaly fold over a daily grid — ONE home shared by
    * batch q_seasonal_anomaly and the s_seasonal_anomaly streaming
    * read-time view. */
  private[graft] def seasonalAnomalyOf(dailyIn: DataFrame): DataFrame = {
    val r = decomposedOf(dailyIn)
      .select(col("event_type"), col("x"),
        ((col("d7") * col("sc") - col("sd7")).cast("double") /
          (lit(7) * col("sc"))).as("resid"))
      .withColumn("ar", abs(col("resid")))
    val wt = Window.partitionBy("event_type")
    val rk = r
      .withColumn("rn", row_number().over(wt.orderBy(col("ar"), col("x"))))
      .withColumn("n", count(lit(1)).over(wt))
    // lower median |r|: first rank with 2·rn ≥ n + (n mod 2)
    val md = rk.groupBy("event_type")
      .agg(min(when(col("rn") * 2 >= col("n") + (col("n") % 2), col("ar")))
        .cast("double").as("med"))
    rk.join(md, "event_type")
      .withColumn("hit", when(col("ar") > lit(4.4478) * col("med"), 1L).otherwise(0L))
      .withColumn("wr", row_number().over(wt.orderBy(col("ar").desc, col("x"))))
      .groupBy("event_type")
      .agg(max("n").as("n_days"), sum("hit").as("n_anomalies"),
        date_format(date_add(to_date(lit(TrendAnchor)),
          max(when(col("wr") === 1, col("x"))).cast("int")), "yyyy-MM-dd").as("worst_day"),
        Q.r6(max(when(col("wr") === 1, col("resid")))).as("worst_residual"))
      .orderBy("event_type")
  }

  /** The decomposition readout fold over a daily grid — ONE home
    * shared by batch q_decompose and the s_decompose streaming
    * read-time view. */
  private[graft] def decomposeOf(dailyIn: DataFrame): DataFrame =
    decomposedOf(dailyIn)
      .select(col("event_type"), col("x").as("day_idx"), col("y"),
        Q.r6(col("t7") / 7.0).as("trend"),
        Q.r6(col("sd7") / (lit(7.0) * col("sc"))).as("seasonal"),
        Q.r6(col("d7") / 7.0 - col("sd7") / (lit(7.0) * col("sc"))).as("residual"))
      .orderBy("event_type", "day_idx")

  /** The STL-strength fold over a daily grid — ONE home shared by
    * batch q_seasonal_strength and the s_seasonal_strength streaming
    * read-time view. */
  private[graft] def seasonalStrengthOf(dailyIn: DataFrame): DataFrame = {
    val v = decomposedOf(dailyIn).select(col("event_type"),
      floor((col("d7") / 7.0 - col("sd7") / (lit(7.0) * col("sc"))) * lit(1e3) + 0.5)
        .cast("long").as("r3v"),
      floor((col("d7") / 7.0) * lit(1e3) + 0.5).cast("long").as("s3v"),
      floor((col("y") - col("sd7") / (lit(7.0) * col("sc"))) * lit(1e3) + 0.5)
        .cast("long").as("t3v"))
    val st = v.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("r3v").as("sr"), sum(col("r3v") * col("r3v")).as("srr"),
        sum("s3v").as("ss"), sum(col("s3v") * col("s3v")).as("sss"),
        sum("t3v").as("stv"), sum(col("t3v") * col("t3v")).as("stt"))
    val vr = col("n") * col("srr") - col("sr") * col("sr")
    def strength(den: Column): Column = {
      val f = lit(1.0) - vr.cast("double") / den
      when(f > 0, f).otherwise(lit(0.0))
    }
    st.select(col("event_type"), col("n").as("n_days"),
        Q.r6(strength(col("n") * col("sss") - col("ss") * col("ss")))
          .as("seasonal_strength"),
        Q.r6(strength(col("n") * col("stt") - col("stv") * col("stv")))
          .as("trend_strength"))
      .orderBy("event_type")
  }

  /** The classical 7-day decomposition frame — event_type, x, y, t7
    * (centered 7-day sum), d7 (7y − t7), sd7/sc (per-phase detrended
    * sums) — the shared integer ingredients under q_decompose's
    * per-day components, q_seasonal_strength's variance ratios and
    * q_seasonal_anomaly's MAD fence. The seasonal means come from a
    * window over the already-bounded frame (the oracle's sn join,
    * without re-aggregating). Split into [[decomposedOf]] (the fold a
    * streaming dailyGrid can feed) and this batch wrapper. */
  private def decomposedFrame(s: SparkSession, d: String): DataFrame =
    decomposedOf(Inference.dailyCounts(s, d))

  /** [[decomposedFrame]]'s fold over a daily (event_type, x, y) count
    * frame — the home the s_decompose / s_seasonal_strength /
    * s_seasonal_anomaly streaming read-time views share with the three
    * batch queries. */
  private[graft] def decomposedOf(dailyIn: DataFrame): DataFrame = {
    val w7 = Window.partitionBy("event_type").orderBy("x").rowsBetween(-3, 3)
    val wp = Window.partitionBy(col("event_type"), col("x") % 7)
    dailyIn
      .withColumn("t7", sum("y").over(w7))
      .withColumn("n7", count(lit(1)).over(w7))
      .filter(col("n7") === 7)
      .withColumn("d7", lit(7) * col("y") - col("t7"))
      .withColumn("sd7", sum("d7").over(wp))
      .withColumn("sc", count(lit(1)).over(wp))
  }
}
