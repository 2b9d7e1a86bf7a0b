package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Inference-grade statistics over the event/lineitem series (round 11
  * SURVEY §2 extensions): partial correlation, Theil–Sen robust slope,
  * Cohen's d effect size, categorical entropy, AR(1) autoregression,
  * lagged cross-correlation, and single-changepoint detection.
  *
  * Same determinism discipline as ops/Statistics.scala — every operator
  * reduces to exact int64 sufficient statistics (counts, cents, day
  * indices) and applies ONE shared double formula tree at the end, so
  * the driver's hash-compare sees bit-identical values from Spark and
  * DuckDB. The two log-using ops (q_cat_entropy) integer-scale each
  * cell's ln contribution to 1e-9 BEFORE the cross-cell sum (the
  * q_mutual_info pattern), keeping the reduction an order-free int64
  * sum. The two medians (q_theil_sen) select explicit middle ranks
  * instead of trusting either engine's median() semantics.
  *
  * Scale shapes: everything aggregates onto FIXED-cardinality keys
  * first (|types|×|days| daily cells, 2 variants, |days|×|types|
  * entropy cells) with map-side partials, then runs the statistical
  * formula on the collapsed frame — the per-series quadratics
  * (Theil–Sen pairs, changepoint candidates) are day-window bounded
  * (C(|days|,2) per series), never corpus bounded.
  */
object Inference {

  /** Day-index anchor shared with Statistics.TrendAnchor — events span
    * Jan 2024. */
  private[graft] val Anchor = "2024-01-01"

  /** Daily event counts per type keyed by exact day index — the shared
    * (|types|×|days|)-row frame under the four series operators. One
    * map-side-partial agg; x and y are both exact int64. */
  /** Exact day index of an event ts against [[Anchor]] — one home for
    * the batch daily frame and streaming.Streams.dailyGrid. */
  private[graft] def dayIndexCol: Column =
    datediff(col("ts").cast(DateType), to_date(lit(Anchor))).cast("long")

  /** The AR(1) fold over a daily (event_type, x, y) count frame — ONE
    * home shared by batch q_ar1 and the s_ar1 streaming read-time view
    * (a new day's lag pair shifts the whole fit; the grid is the
    * mergeable state). Sufficient statistics exact int64 over the lag
    * pairs; the fit divides at the end. */
  private[graft] def ar1Of(dailyIn: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("x")
    val lg = dailyIn
      .withColumn("yp", lag("y", 1).over(w))
      .filter(col("yp").isNotNull)
    val st = lg.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("yp").as("sx"), sum("y").as("sy"),
        sum(col("yp") * col("y")).as("sxy"),
        sum(col("yp") * col("yp")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val sxxN = col("n") * col("sxx") - col("sx") * col("sx")
    val sxyN = col("n") * col("sxy") - col("sx") * col("sy")
    st.select(col("event_type"), col("n"),
        Q.r6(sxyN.cast("double") / sxxN).as("phi"),
        Q.r6((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double") / sxxN)
          .as("intercept"),
        Q.r6((sxyN.cast("double") * sxyN) /
          (sxxN.cast("double") * (col("n") * col("syy") - col("sy") * col("sy")))).as("r2"))
      .orderBy("event_type")
  }

  /** The mean-split changepoint fold over the same daily frame — ONE
    * home shared by batch q_changepoint and the s_changepoint
    * streaming read-time view (every close re-prices every candidate
    * split against the new total; the grid is the state). */
  private[graft] def changepointOf(dailyIn: DataFrame): DataFrame = {
    val we = Window.partitionBy("event_type")
    val wo = we.orderBy("x")
    val w = dailyIn
      .withColumn("s1", sum("y").over(wo.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n1", row_number().over(wo).cast("long"))
      .withColumn("stot", sum("y").over(we))
      .withColumn("nt", count(lit(1)).over(we))
    val cand = w.filter(col("n1") < col("nt"))
      .select(col("event_type"), col("x"), col("n1"),
        (col("nt") - col("n1")).as("n2"), col("s1"),
        (col("stot") - col("s1")).as("s2"),
        (col("s1").cast("double") * col("s1") / col("n1") +
          (col("stot") - col("s1")).cast("double") * (col("stot") - col("s1")) /
            (col("nt") - col("n1")) -
          col("stot").cast("double") * col("stot") / col("nt")).as("bv"))
    cand
      .withColumn("rk", row_number().over(we.orderBy(col("bv").desc, col("x"))))
      .filter(col("rk") === 1)
      .select(col("event_type"),
        date_format(date_add(to_date(lit(Anchor)), col("x").cast("int")), "yyyy-MM-dd")
          .as("split_day"),
        col("n1").as("n_left"), col("n2").as("n_right"),
        Q.r4(col("s1").cast("double") / col("n1")).as("mean_left"),
        Q.r4(col("s2").cast("double") / col("n2")).as("mean_right"),
        Q.r4(col("bv")).as("between_var"))
      .orderBy("event_type")
  }

  /** O'Brien–Fleming boundaries 2.9626/√(k/5) for looks 1..5 —
    * shortest-round-trip IEEE literals embedded in BOTH engines
    * (computed once here; no sqrt is evaluated at query time — the
    * q_power_analysis move). */
  private[graft] val ObfBounds: Seq[Double] =
    (1 to 5).map(k => 2.9626 / math.sqrt(k / 5.0))

  private[graft] def obfBoundaryCol(k: Column): Column =
    element_at(array(ObfBounds.map(lit): _*), k.cast("int"))

  private[graft] val ObfSqlCases: String =
    ObfBounds.zipWithIndex.map { case (b, i) => s"WHEN ${i + 1} THEN $b" }.mkString(" ")

  private[graft] def dailyCounts(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"), dayIndexCol.as("x"))
      .agg(count(lit(1)).as("y"))

  /** DuckDB twin of [[dailyCounts]] (clones q_trend_fit's daily CTE). */
  private[ops] def dailySql: String =
    s"""SELECT event_type,
       |       CAST(date_diff('day', DATE '$Anchor',
       |                      CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
       |       count(*) AS y
       |FROM events GROUP BY 1, 2""".stripMargin

  /** The per-day entropy fold over a (day, event_type, c) count grid —
    * ONE home for the batch q_cat_entropy projection and the streaming
    * s_cat_entropy read-time view (streaming.Streams.catEntropyCounts
    * maintains the grid incrementally; entropy never lives in state
    * because it isn't mergeable — counts are). Each cell's
    * (c/n)·ln(n/c) is integer-scaled to 1e-9 BEFORE the cross-cell
    * sum, so the reduction is an order-free int64 fold. */
  private[graft] def entropyOfCells(cells: DataFrame): DataFrame = {
    val wd = Window.partitionBy("day")
    cells
      .withColumn("n", sum("c").over(wd))
      .withColumn("k", count(lit(1)).over(wd))
      .withColumn("contrib",
        floor((col("c").cast("double") / col("n")) *
          log(col("n").cast("double") / col("c")) * lit(1e9) + 0.5).cast("long"))
      .groupBy("day")
      .agg(max("n").as("n_events"), max("k").as("k_types"),
        Q.r6(sum("contrib") / lit(1e9)).as("entropy"),
        // A single-type day makes evenness 0/0 (ln k = 0) → NaN, and NaN
        // round-trips through floor()/hash-compare differently per engine;
        // emit NULL on both sides instead (ADVICE r11).
        when(max("k") > 1,
          Q.r6((sum("contrib") / lit(1e9)) /
            log(max("k").cast("double")))).as("evenness"))
      .select(col("day"), col("n_events"), col("k_types"),
        col("entropy"), col("evenness"))
      .orderBy("day")
  }

  /** The one Pearson formula tree over integer sufficient statistics,
    * as SQL text — the DuckDB twin of Statistics.corrCol (same operand
    * order as q_corr_matrix's oracle, PARITY §formula-sharing). */
  private def corrSql(n: String, sxy: String, sx: String, sy: String,
                      sxx: String, syy: String): String =
    s"($n * CAST($sxy AS DOUBLE) - CAST($sx AS DOUBLE) * $sy) / " +
      s"(sqrt($n * CAST($sxx AS DOUBLE) - CAST($sx AS DOUBLE) * $sx) * " +
      s"sqrt($n * CAST($syy AS DOUBLE) - CAST($sy AS DOUBLE) * $sy))"

  def defs: Seq[QueryDef] = Seq(

    // First-order partial correlations among the three integerized
    // lineitem rate measures: for each pair (x, y) of {quantity,
    // discount, tax}, the correlation REMAINING after the third
    // variable is controlled for — r_xy.z = (r_xy − r_xz·r_yz) /
    // √((1−r_xz²)(1−r_yz²)), the feature-screening step after
    // q_corr_matrix (a strong marginal corr that vanishes partially is
    // a confounder signature). ONE corpus scan (the shared
    // lineitemMomentStats 15-statistic pass — same frame q_corr_matrix
    // and q_pca_power read), then the three output rows expand IN-ROW
    // from the single stats row. Both engines derive every r from
    // IDENTICAL int64 sums through the textually-shared formula tree,
    // so the composed partials agree bit-for-bit before r6.
    Q("q_partial_corr",
      s"""WITH m AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS q,
         |                  CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,
         |                  CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS t
         |           FROM lineitem),
         |st AS (SELECT count(*) AS n,
         |              CAST(sum(q) AS BIGINT) AS sq, CAST(sum(d) AS BIGINT) AS sd,
         |              CAST(sum(t) AS BIGINT) AS st,
         |              CAST(sum(q * q) AS BIGINT) AS qq, CAST(sum(d * d) AS BIGINT) AS dd,
         |              CAST(sum(t * t) AS BIGINT) AS tt,
         |              CAST(sum(q * d) AS BIGINT) AS qd, CAST(sum(q * t) AS BIGINT) AS qt,
         |              CAST(sum(d * t) AS BIGINT) AS dt
         |       FROM m),
         |r AS (SELECT n,
         |             ${corrSql("n", "qd", "sq", "sd", "qq", "dd")} AS rqd,
         |             ${corrSql("n", "qt", "sq", "st", "qq", "tt")} AS rqt,
         |             ${corrSql("n", "dt", "sd", "st", "dd", "tt")} AS rdt
         |      FROM st),
         |pr AS (SELECT 'quantity' AS var1, 'discount' AS var2, 'tax' AS control,
         |              n, rqd AS rxy, rqt AS rxz, rdt AS ryz FROM r
         |       UNION ALL SELECT 'quantity', 'tax', 'discount', n, rqt, rqd, rdt FROM r
         |       UNION ALL SELECT 'discount', 'tax', 'quantity', n, rdt, rqd, rqt FROM r)
         |SELECT var1, var2, control, n,
         |       ${Q.sqlR6("rxy")} AS r_marginal,
         |       ${Q.sqlR6("(rxy - rxz * ryz) / (sqrt(1.0 - rxz * rxz) * sqrt(1.0 - ryz * ryz))")} AS r_partial
         |FROM pr
         |ORDER BY var1, var2""".stripMargin) { (s, d) =>
      val st = Statistics.lineitemMomentStats(s, d)
      val r = st.select(col("n"),
        Statistics.corrCol(col("n"), col("qd"), col("sq"), col("sd"),
          col("qq"), col("dd")).as("rqd"),
        Statistics.corrCol(col("n"), col("qt"), col("sq"), col("st"),
          col("qq"), col("tt")).as("rqt"),
        Statistics.corrCol(col("n"), col("dt"), col("sd"), col("st"),
          col("dd"), col("tt")).as("rdt"))
      def row(v1: String, v2: String, ctl: String,
              rxy: String, rxz: String, ryz: String) =
        struct(lit(v1).as("var1"), lit(v2).as("var2"), lit(ctl).as("control"),
          col(rxy).as("rxy"), col(rxz).as("rxz"), col(ryz).as("ryz"))
      r.select(col("n"), explode(array(
          row("quantity", "discount", "tax", "rqd", "rqt", "rdt"),
          row("quantity", "tax", "discount", "rqt", "rqd", "rdt"),
          row("discount", "tax", "quantity", "rdt", "rqd", "rqt"))).as("pr"))
        .select(col("pr.var1").as("var1"), col("pr.var2").as("var2"),
          col("pr.control").as("control"), col("n"),
          Q.r6(col("pr.rxy")).as("r_marginal"),
          Q.r6((col("pr.rxy") - col("pr.rxz") * col("pr.ryz")) /
            (sqrt(lit(1.0) - col("pr.rxz") * col("pr.rxz")) *
              sqrt(lit(1.0) - col("pr.ryz") * col("pr.ryz")))).as("r_partial"))
        .orderBy("var1", "var2")
    },

    // Theil–Sen robust trend per event type: the MEDIAN of all C(days,2)
    // pairwise slopes of the daily count series — the outlier-immune
    // counterpart to q_trend_fit's OLS (one wild day moves OLS, not the
    // median slope). Each slope is ONE IEEE division of two exact int64
    // differences, so both engines sort an identical double multiset;
    // the median is then an EXPLICIT middle-rank selection (ranks
    // ⌊(n+1)/2⌋ and ⌊(n+2)/2⌋ averaged) rather than either engine's
    // median() — engine median semantics differ on interpolation, rank
    // arithmetic doesn't. Scale: the pair expansion is C(|days|,2) PER
    // SERIES (~monitoring-window² on a |types|×|days| frame), never
    // corpus-sized; the corpus only feeds the one daily-count agg.
    Q("q_theil_sen",
      s"""WITH daily AS ($dailySql),
         |pr AS (SELECT a.event_type,
         |              CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS slope
         |       FROM daily a
         |       JOIN daily b ON a.event_type = b.event_type AND a.x < b.x),
         |rk AS (SELECT event_type, slope,
         |              row_number() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
         |              count(*) OVER (PARTITION BY event_type) AS np
         |       FROM pr),
         |med AS (SELECT event_type, np,
         |               sum(slope) / count(*) AS ts_slope0
         |        FROM rk
         |        WHERE rn = CAST(floor((np + 1) / 2.0) AS BIGINT)
         |           OR rn = CAST(floor((np + 2) / 2.0) AS BIGINT)
         |        GROUP BY 1, 2)
         |SELECT event_type, np AS n_pairs, ${Q.sqlR6("ts_slope0")} AS ts_slope
         |FROM med
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      // materialize the tiny daily frame once: the self-join's two
      // branches would otherwise each re-scan events (trees, not DAGs)
      val daily = dailyCounts(s, d).transform(Q.snapshot)
      val a = daily.select(col("event_type"), col("x").as("xa"), col("y").as("ya"))
      val b = daily.select(col("event_type"), col("x").as("xb"), col("y").as("yb"))
      val pr = a.join(b, Seq("event_type")).filter(col("xa") < col("xb"))
        .select(col("event_type"),
          ((col("yb") - col("ya")).cast("double") / (col("xb") - col("xa"))).as("slope"))
      val w = Window.partitionBy("event_type")
      val rk = pr
        .withColumn("rn", row_number().over(w.orderBy("slope")))
        .withColumn("np", count(lit(1)).over(w))
      rk.filter(col("rn") === floor((col("np") + 1) / 2.0).cast("long") ||
          col("rn") === floor((col("np") + 2) / 2.0).cast("long"))
        .groupBy("event_type", "np")
        .agg((sum("slope") / count(lit(1))).as("ts_slope0"))
        .select(col("event_type"), col("np").as("n_pairs"),
          Q.r6(col("ts_slope0")).as("ts_slope"))
        .orderBy("event_type")
    },

    // Cohen's d effect size between the two hash-split variants'
    // purchase values (q_abtest's experiment frame, continuous-outcome
    // face): d = (m₀ − m₁) / s_pooled with the Hedges' g small-sample
    // correction alongside. Values are integerized to cents, so n, Σx,
    // Σx² per variant are exact int64 and both engines run the one
    // shared double tree (sample variances → pooled SD → d). Cents
    // cancel in d (scale-invariant); the reported means divide back to
    // dollars. Scale: a 2-key map-side-partial agg — one scan, shuffle
    // carries 2 rows.
    Q("q_cohens_d",
      s"""WITH x AS (SELECT user_id % 2 AS variant,
         |                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
         |           FROM events WHERE event_type = 'purchase'),
         |v AS (SELECT variant, count(*) AS n,
         |             CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS ss
         |      FROM x GROUP BY 1),
         |w AS (SELECT sum(CASE WHEN variant = 0 THEN n END) AS na,
         |             sum(CASE WHEN variant = 0 THEN s END) AS sa,
         |             sum(CASE WHEN variant = 0 THEN ss END) AS ssa,
         |             sum(CASE WHEN variant = 1 THEN n END) AS nb,
         |             sum(CASE WHEN variant = 1 THEN s END) AS sb,
         |             sum(CASE WHEN variant = 1 THEN ss END) AS ssb
         |      FROM v),
         |f AS (SELECT na, nb,
         |             CAST(sa AS DOUBLE) / na AS ma, CAST(sb AS DOUBLE) / nb AS mb,
         |             (na * CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * sa) / (CAST(na AS DOUBLE) * (na - 1)) AS va,
         |             (nb * CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * sb) / (CAST(nb AS DOUBLE) * (nb - 1)) AS vb
         |      FROM w),
         |g AS (SELECT na, nb, ma, mb,
         |             (ma - mb) / sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)) AS d0
         |      FROM f)
         |SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
         |       ${Q.sqlR4("ma / 100")} AS mean_a,
         |       ${Q.sqlR4("mb / 100")} AS mean_b,
         |       ${Q.sqlR6("d0")} AS cohens_d,
         |       ${Q.sqlR6("d0 * (1.0 - 3.0 / (4.0 * (na + nb) - 9))")} AS hedges_g
         |FROM g""".stripMargin) { (s, d) =>
      val v = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select((col("user_id") % 2).as("variant"),
          floor(col("value") * 100 + 0.5).cast("long").as("c"))
        .groupBy("variant")
        .agg(count(lit(1)).as("n"), sum("c").as("s"), sum(col("c") * col("c")).as("ss"))
      val w = v.agg(
        sum(when(col("variant") === 0, col("n"))).as("na"),
        sum(when(col("variant") === 0, col("s"))).as("sa"),
        sum(when(col("variant") === 0, col("ss"))).as("ssa"),
        sum(when(col("variant") === 1, col("n"))).as("nb"),
        sum(when(col("variant") === 1, col("s"))).as("sb"),
        sum(when(col("variant") === 1, col("ss"))).as("ssb"))
      val f = w.select(col("na"), col("nb"),
        (col("sa").cast("double") / col("na")).as("ma"),
        (col("sb").cast("double") / col("nb")).as("mb"),
        ((col("na") * col("ssa").cast("double") - col("sa").cast("double") * col("sa")) /
          (col("na").cast("double") * (col("na") - 1))).as("va"),
        ((col("nb") * col("ssb").cast("double") - col("sb").cast("double") * col("sb")) /
          (col("nb").cast("double") * (col("nb") - 1))).as("vb"))
      val g = f.select(col("na"), col("nb"), col("ma"), col("mb"),
        ((col("ma") - col("mb")) /
          sqrt(((col("na") - 1) * col("va") + (col("nb") - 1) * col("vb")) /
            (col("na") + col("nb") - 2))).as("d0"))
      g.select(col("na"), col("nb"),
        Q.r4(col("ma") / 100).as("mean_a"),
        Q.r4(col("mb") / 100).as("mean_b"),
        Q.r6(col("d0")).as("cohens_d"),
        Q.r6(col("d0") * (lit(1.0) - lit(3.0) / (lit(4.0) * (col("na") + col("nb")) - 9)))
          .as("hedges_g"))
    },

    // Daily Shannon entropy of the event-type mix — the drift monitor
    // for CATEGORICAL distributions (q_psi/q_drift_tvd cover numeric
    // ones): H = Σ (c/n)·ln(n/c) in nats, plus the ln(k)-normalized
    // evenness in [0,1]. The q_mutual_info determinism pattern: each
    // cell's contribution is integer-scaled to 1e-9 BEFORE the
    // cross-cell sum, so the reduction both engines perform is an
    // int64 sum (order-free) — ln is applied per cell, never to an
    // accumulated double. Scale: cells are |days|×|types| — a map-side
    // partial agg collapses the corpus; everything after is
    // fixed-cardinality window/agg work.
    Q("q_cat_entropy",
      s"""WITH c AS (SELECT strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day,
         |                  event_type, count(*) AS c
         |           FROM events GROUP BY 1, 2),
         |w AS (SELECT day, c,
         |             sum(c) OVER (PARTITION BY day) AS n,
         |             count(*) OVER (PARTITION BY day) AS k
         |      FROM c),
         |t AS (SELECT day, n, k,
         |             CAST(floor((CAST(c AS DOUBLE) / n) *
         |                        ln(CAST(n AS DOUBLE) / c) * 1e9 + 0.5) AS BIGINT) AS contrib
         |      FROM w)
         |SELECT day, CAST(max(n) AS BIGINT) AS n_events, CAST(max(k) AS BIGINT) AS k_types,
         |       ${Q.sqlR6("sum(contrib) / 1e9")} AS entropy,
         |       CASE WHEN max(k) > 1 THEN ${Q.sqlR6("(sum(contrib) / 1e9) / ln(CAST(max(k) AS DOUBLE))")} ELSE NULL END AS evenness
         |FROM t
         |GROUP BY day
         |ORDER BY day""".stripMargin) { (s, d) =>
      val cells = Tables.events(s, d)
        .groupBy(date_format(col("ts").cast(DateType), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("c"))
      entropyOfCells(cells)
    },

    // AR(1) autoregression per event type: OLS of today's count on
    // yesterday's over the daily series — φ near 0 says the series is
    // shock-driven, near 1 persistent; the model behind q_ewma's
    // smoothing constant choice. The lag pairing is one window lag on
    // the (|types|×|days|)-row daily frame; all five sufficient sums
    // are exact int64 (counts), and slope/intercept/r² reuse
    // q_trend_fit's exact-integer OLS tree — both engines divide the
    // same integers. Scale: corpus collapses to daily cells first;
    // the window and fit touch only |types|×|days| rows.
    Q("q_ar1",
      s"""WITH daily AS ($dailySql),
         |lg AS (SELECT event_type, x, y,
         |              lag(y) OVER (PARTITION BY event_type ORDER BY x) AS yp
         |       FROM daily),
         |st AS (SELECT event_type, count(*) AS n,
         |              CAST(sum(yp) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |              CAST(sum(yp * y) AS BIGINT) AS sxy,
         |              CAST(sum(yp * yp) AS BIGINT) AS sxx,
         |              CAST(sum(y * y) AS BIGINT) AS syy
         |       FROM lg WHERE yp IS NOT NULL GROUP BY 1)
         |SELECT event_type, n,
         |       ${Q.sqlR6("CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)")} AS phi,
         |       ${Q.sqlR6("CAST(sy * sxx - sx * sxy AS DOUBLE) / (n * sxx - sx * sx)")} AS intercept,
         |       ${Q.sqlR6("(CAST(n * sxy - sx * sy AS DOUBLE) * (n * sxy - sx * sy)) / (CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy))")} AS r2
         |FROM st
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      ar1Of(dailyCounts(s, d))
    },

    // Lagged cross-correlation between the view and purchase daily
    // series: Pearson r of purchase(t) against view(t − lag) for lags
    // 0–3 — "does browsing lead buying, and by how many days?" (the
    // lead–lag screen before any funnel attribution). The lag
    // alignment is a 4-way IN-ROW expansion of the view series (lags
    // is a 4-element literal array — no extra scan), joined to the
    // purchase series on the shifted day index; per lag the five
    // sufficient sums are exact int64 through the shared OLS/Pearson
    // tree. Scale: both series are |days|-row frames after the one
    // daily agg; the join and fit are day-window bounded.
    Q("q_xcorr",
      s"""WITH daily AS ($dailySql),
         |v AS (SELECT x, y FROM daily WHERE event_type = 'view'),
         |p AS (SELECT x, y FROM daily WHERE event_type = 'purchase'),
         |al AS (SELECT l.lag_days, v.y AS yv, p.y AS yp
         |       FROM (SELECT unnest([0, 1, 2, 3]) AS lag_days) l
         |       JOIN v ON TRUE
         |       JOIN p ON p.x = v.x + l.lag_days),
         |st AS (SELECT lag_days, count(*) AS n,
         |              CAST(sum(yv) AS BIGINT) AS sx, CAST(sum(yp) AS BIGINT) AS sy,
         |              CAST(sum(yv * yp) AS BIGINT) AS sxy,
         |              CAST(sum(yv * yv) AS BIGINT) AS sxx,
         |              CAST(sum(yp * yp) AS BIGINT) AS syy
         |       FROM al GROUP BY 1)
         |SELECT CAST(lag_days AS BIGINT) AS lag_days, n,
         |       ${Q.sqlR6(corrSql("n", "sxy", "sx", "sy", "sxx", "syy"))} AS r
         |FROM st
         |ORDER BY lag_days""".stripMargin) { (s, d) =>
      // one materialized daily frame feeds both series branches
      val daily = dailyCounts(s, d).transform(Q.snapshot)
      val v = daily.filter(col("event_type") === "view")
        .select(col("x"), col("y").as("yv"))
      val p = daily.filter(col("event_type") === "purchase")
        .select(col("x").as("xp"), col("y").as("yp"))
      val al = v.select(col("x"), col("yv"),
          explode(array(lit(0L), lit(1L), lit(2L), lit(3L))).as("lag_days"))
        .join(p, col("xp") === col("x") + col("lag_days"))
      val st = al.groupBy("lag_days")
        .agg(count(lit(1)).as("n"),
          sum("yv").as("sx"), sum("yp").as("sy"),
          sum(col("yv") * col("yp")).as("sxy"),
          sum(col("yv") * col("yv")).as("sxx"),
          sum(col("yp") * col("yp")).as("syy"))
      st.select(col("lag_days"), col("n"),
          Q.r6(Statistics.corrCol(col("n"), col("sxy"), col("sx"), col("sy"),
            col("sxx"), col("syy"))).as("r"))
        .orderBy("lag_days")
    },

    // Single changepoint per event type's daily series: the split that
    // maximizes the between-segment variance BV = S₁²/n₁ + S₂²/n₂ −
    // S²/n (the k=2 step of binary segmentation / CUSUM's offline
    // counterpart; q_cusum is the online face). Prefix sums over the
    // day-ordered series give every candidate's (n₁, S₁) in one window
    // pass; BV is three divisions of exact int64s, so both engines
    // compute identical doubles and the argmax (BV DESC, earlier day
    // wins ties) picks the same split. Scale: candidates are |days|−1
    // per series on the collapsed daily frame — the corpus feeds ONE
    // map-side-partial agg and is never sorted.
    Q("q_changepoint",
      s"""WITH daily AS ($dailySql),
         |w AS (SELECT event_type, x, y,
         |             sum(y) OVER (PARTITION BY event_type ORDER BY x
         |                          ROWS UNBOUNDED PRECEDING) AS s1,
         |             row_number() OVER (PARTITION BY event_type ORDER BY x) AS n1,
         |             sum(y) OVER (PARTITION BY event_type) AS stot,
         |             count(*) OVER (PARTITION BY event_type) AS nt
         |      FROM daily),
         |cand AS (SELECT event_type, x, n1, nt - n1 AS n2, s1, stot - s1 AS s2, stot, nt,
         |                CAST(s1 AS DOUBLE) * s1 / n1 + CAST(stot - s1 AS DOUBLE) * (stot - s1) / (nt - n1)
         |                  - CAST(stot AS DOUBLE) * stot / nt AS bv
         |         FROM w WHERE n1 < nt),
         |top AS (SELECT event_type, x, n1, n2, s1, s2, bv,
         |               row_number() OVER (PARTITION BY event_type
         |                                  ORDER BY bv DESC, x) AS rk
         |        FROM cand)
         |SELECT event_type,
         |       strftime(DATE '$Anchor' + CAST(x AS INT), '%Y-%m-%d') AS split_day,
         |       n1 AS n_left, n2 AS n_right,
         |       ${Q.sqlR4("CAST(s1 AS DOUBLE) / n1")} AS mean_left,
         |       ${Q.sqlR4("CAST(s2 AS DOUBLE) / n2")} AS mean_right,
         |       ${Q.sqlR4("bv")} AS between_var
         |FROM top WHERE rk = 1
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      changepointOf(dailyCounts(s, d))
    },

    // Poisson-bootstrap confidence interval for mean purchase value
    // (round 11) — the bootstrap AS IT RUNS AT 100 TB: resampling a
    // distributed corpus with replacement is impossible, but weighting
    // each row by an independent Poisson(1) count per replica is
    // one-pass, shuffle-light, and converges to the same estimator
    // (Kleiner et al.'s scalable-bootstrap family, Poisson variant).
    // Zero RNG state: each (row, replica) weight derives from a 31-bit
    // xorshift-multiply mix of the integer (event_id·B + rep + 1) —
    // three multiplicative congruential steps SEPARATED BY XOR-SHIFTS,
    // fed through the exact Poisson(1) inverse-CDF thresholds.
    // Identical integer arithmetic in both engines, so the oracle
    // checks the RESAMPLING itself, not just moments. The xor steps
    // are load-bearing: a pure LCG over consecutive seeds is LINEAR,
    // so the 20 replica uniforms per row would form an arithmetic
    // progression mod 1 with a shared step — every replica a phase
    // shift of every other, and the cross-replica variance would
    // measure that lattice, not resampling variability. The xor
    // between multiplies breaks the linearity (review catch, r11).
    // Determinism of the reduction: per-replica Σw and Σw·v
    // are exact int64; each replica mean is integer-scaled to millicents
    // BEFORE the cross-replica moment sums (order-free int64 — and m3²
    // stays ~6e14, far inside int64 where a 1e-6 scaling would
    // overflow). Scale: the B=20 fan-out is in-row (bounded ×20), the
    // replica agg is a 20-key map-side-partial pass, and the final CI
    // assembles on a single row.
    Q("q_bootstrap_ci",
      """WITH p AS (SELECT event_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        |           FROM events WHERE event_type = 'purchase'),
        |r AS (SELECT p.event_id, p.v, reps.rep
        |      FROM p, (SELECT unnest(range(0, 20)) AS rep) reps),
        |k1 AS (SELECT v, rep,
        |              (48271 * ((event_id * 20 + rep + 1) % 2147483647)) % 2147483647 AS h1
        |       FROM r),
        |k2 AS (SELECT v, rep,
        |              (69621 * xor(h1, CAST(floor(h1 / 65536.0) AS BIGINT))) % 2147483647 AS h3
        |       FROM k1),
        |k3 AS (SELECT v, rep,
        |              (16807 * xor(h3, CAST(floor(h3 / 1024.0) AS BIGINT))) % 2147483647 AS h5
        |       FROM k2),
        |u AS (SELECT v, rep, CAST(h5 AS DOUBLE) / 2147483647 AS u FROM k3),
        |w AS (SELECT v, rep,
        |             CASE WHEN u < 0.36787944117144233 THEN 0
        |                  WHEN u < 0.7357588823428846 THEN 1
        |                  WHEN u < 0.9196986029286058 THEN 2
        |                  WHEN u < 0.9810118431238462 THEN 3
        |                  WHEN u < 0.9963401531726563 THEN 4
        |                  WHEN u < 0.9994058151824183 THEN 5
        |                  ELSE 6 END AS w
        |      FROM u),
        |rm AS (SELECT rep, count(*) AS nr, CAST(sum(w) AS BIGINT) AS sw,
        |              CAST(sum(w * v) AS BIGINT) AS sv
        |       FROM w GROUP BY 1),
        |m AS (SELECT rep, nr,
        |             CAST(floor(CAST(sv AS DOUBLE) / sw * 1000 + 0.5) AS BIGINT) AS m3
        |      FROM rm),
        |st AS (SELECT count(*) AS b, CAST(max(nr) AS BIGINT) AS n_rows,
        |              CAST(sum(m3) AS BIGINT) AS sm,
        |              CAST(sum(m3 * m3) AS BIGINT) AS smm
        |       FROM m),
        |f AS (SELECT b, n_rows, CAST(sm AS DOUBLE) / (b * 1000) AS center_c,
        |             sqrt((b * CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * sm) /
        |                  (CAST(b AS DOUBLE) * (b - 1))) / 1000 AS se_c
        |      FROM st)
        |SELECT n_rows, b AS n_replicas,
        |       floor((center_c / 100)*10000+0.5)/10000 AS mean_usd,
        |       floor((se_c / 100)*1000000+0.5)/1000000 AS se_usd,
        |       floor(((center_c - 1.96 * se_c) / 100)*10000+0.5)/10000 AS ci_lo,
        |       floor(((center_c + 1.96 * se_c) / 100)*10000+0.5)/10000 AS ci_hi
        |FROM f""".stripMargin) { (s, d) =>
      // n_rows rides the replica aggregate (every replica sees every
      // row, so any replica's row count IS the corpus count) — the
      // plan reads events exactly ONCE; a separate count branch would
      // scan it twice because Spark plans trees, not DAGs
      val p = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), floor(col("value") * 100 + 0.5).cast("long").as("v"))
      val M = lit(2147483647L)
      val r = p.select(col("v"),
        explode(sequence(lit(0L), lit(19L))).as("rep"),
        col("event_id"))
      val h1 = (lit(48271L) * ((col("event_id") * 20 + col("rep") + 1) % M)) % M
      val h3 = (lit(69621L) * h1.bitwiseXOR(floor(h1 / 65536.0).cast("long"))) % M
      val h5 = (lit(16807L) * h3.bitwiseXOR(floor(h3 / 1024.0).cast("long"))) % M
      val u = h5.cast("double") / M
      val w = r.select(col("v"), col("rep"),
        when(u < 0.36787944117144233, 0L)
          .when(u < 0.7357588823428846, 1L)
          .when(u < 0.9196986029286058, 2L)
          .when(u < 0.9810118431238462, 3L)
          .when(u < 0.9963401531726563, 4L)
          .when(u < 0.9994058151824183, 5L)
          .otherwise(6L).as("w"))
      val rm = w.groupBy("rep")
        .agg(count(lit(1)).as("nr"), sum("w").as("sw"),
          sum(col("w") * col("v")).as("sv"))
      val m = rm.select(col("rep"), col("nr"),
        floor(col("sv").cast("double") / col("sw") * 1000 + 0.5).cast("long").as("m3"))
      val st = m.agg(count(lit(1)).as("b"), max("nr").as("n_rows"),
        sum("m3").as("sm"), sum(col("m3") * col("m3")).as("smm"))
      val f = st.select(col("b"), col("n_rows"),
        (col("sm").cast("double") / (col("b") * 1000)).as("center_c"),
        (sqrt((col("b") * col("smm").cast("double") - col("sm").cast("double") * col("sm")) /
          (col("b").cast("double") * (col("b") - 1))) / 1000).as("se_c"))
      f.select(col("n_rows"), col("b").as("n_replicas"),
          Q.r4(col("center_c") / 100).as("mean_usd"),
          Q.r6(col("se_c") / 100).as("se_usd"),
          Q.r4((col("center_c") - lit(1.96) * col("se_c")) / 100).as("ci_lo"),
          Q.r4((col("center_c") + lit(1.96) * col("se_c")) / 100).as("ci_hi"))
    },

    // Price elasticity of demand per return flag (round 11): the
    // log-log OLS every pricing team fits — elasticity = d ln(avg qty)
    // / d ln(price multiplier) across the 11 discount levels (the
    // natural experiment TPC-H data carries). Determinism: the corpus
    // collapses to (flag, discount-level) cells with exact int64
    // Σqty/count; BOTH logs are integer-scaled to 1e-6 per cell before
    // any cross-cell sum (ln is per-cell, the established q_mutual_info
    // discipline), so the five OLS sufficient sums are exact int64
    // (bounds: x6 ≤ 1.2e5, y6 ≈ 3.2e6 ⇒ Σy6² ≈ 1e13·cells, far inside
    // int64) and the slope is one shared double tree. Scale: one
    // map-side-partial agg onto ≤ 3×11 cells; the fit reads 11 rows
    // per flag.
    Q("q_elasticity",
      s"""WITH c AS (SELECT l_returnflag AS flag,
         |                  CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,
         |                  count(*) AS n, CAST(sum(floor(l_quantity)) AS BIGINT) AS sq
         |           FROM lineitem GROUP BY 1, 2),
         |xy AS (SELECT flag,
         |              CAST(floor(ln(1.0 - d / 100.0) * 1e6 + 0.5) AS BIGINT) AS x6,
         |              CAST(floor(ln(CAST(sq AS DOUBLE) / n) * 1e6 + 0.5) AS BIGINT) AS y6
         |       FROM c),
         |st AS (SELECT flag, count(*) AS k,
         |              CAST(sum(x6) AS BIGINT) AS sx, CAST(sum(y6) AS BIGINT) AS sy,
         |              CAST(sum(x6 * y6) AS BIGINT) AS sxy,
         |              CAST(sum(x6 * x6) AS BIGINT) AS sxx,
         |              CAST(sum(y6 * y6) AS BIGINT) AS syy
         |       FROM xy GROUP BY 1)
         |SELECT flag, k AS n_levels,
         |       ${Q.sqlR4("CAST(k * sxy - sx * sy AS DOUBLE) / (k * sxx - sx * sx)")} AS elasticity,
         |       ${Q.sqlR6("CAST(k * sxy - sx * sy AS DOUBLE) * (k * sxy - sx * sy) / (CAST(k * sxx - sx * sx AS DOUBLE) * (k * syy - sy * sy))")} AS r2
         |FROM st
         |ORDER BY flag""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "lineitem")
        .groupBy(col("l_returnflag").as("flag"),
          floor(col("l_discount") * 100 + 0.5).cast("long").as("d"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("l_quantity")).cast("long")).as("sq"))
      val xy = c.select(col("flag"),
        floor(log(lit(1.0) - col("d") / lit(100.0)) * lit(1e6) + 0.5).cast("long").as("x6"),
        floor(log(col("sq").cast("double") / col("n")) * lit(1e6) + 0.5).cast("long").as("y6"))
      val st = xy.groupBy("flag")
        .agg(count(lit(1)).as("k"),
          sum("x6").as("sx"), sum("y6").as("sy"),
          sum(col("x6") * col("y6")).as("sxy"),
          sum(col("x6") * col("x6")).as("sxx"),
          sum(col("y6") * col("y6")).as("syy"))
      val sxxN = col("k") * col("sxx") - col("sx") * col("sx")
      val sxyN = col("k") * col("sxy") - col("sx") * col("sy")
      st.select(col("flag"), col("k").as("n_levels"),
          Q.r4(sxyN.cast("double") / sxxN).as("elasticity"),
          Q.r6(sxyN.cast("double") * sxyN /
            (sxxN.cast("double") * (col("k") * col("syy") - col("sy") * col("sy"))))
            .as("r2"))
        .orderBy("flag")
    },

    // Experiment health check (round 11): the two gates run BEFORE
    // reading any A/B result — sample-ratio mismatch (SRM: a 50/50
    // split whose arms differ beyond chi² 6.635 ⇒ the assignment is
    // broken and every downstream number is garbage) and the minimum
    // detectable effect at 80% power / 5% alpha (MDE: the smallest
    // conversion lift this sample could even see) — q_abtest's
    // experiment frame, instrumented. Everything derives from FOUR
    // integer counts (users and conversions per hash variant, the
    // q_abtest per-user collapse) through one mirrored double tree;
    // the SRM verdict is an integer-vs-constant comparison. Scale:
    // one (user)-key map-side-partial agg → 2-row rollup → single row.
    Q("q_exp_health",
      s"""WITH u AS (SELECT user_id, user_id % 2 AS variant,
         |                  max(CASE WHEN event_type = 'purchase' AND value >= 150
         |                           THEN 1 ELSE 0 END) AS conv
         |           FROM events GROUP BY 1, 2),
         |v AS (SELECT variant, count(*) AS n, CAST(sum(conv) AS BIGINT) AS c
         |      FROM u GROUP BY 1),
         |w AS (SELECT CAST(sum(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS na,
         |             CAST(sum(CASE WHEN variant = 0 THEN c END) AS BIGINT) AS ca,
         |             CAST(sum(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS nb,
         |             CAST(sum(CASE WHEN variant = 1 THEN c END) AS BIGINT) AS cb
         |      FROM v),
         |f AS (SELECT na, nb, ca, cb,
         |             CAST((na - nb) * (na - nb) AS DOUBLE) / (na + nb) AS chi2,
         |             CAST(ca + cb AS DOUBLE) / (na + nb) AS p
         |      FROM w),
         |g AS (SELECT na, nb, ca, cb, chi2, p,
         |             2.8016 * sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb)) AS mde
         |      FROM f)
         |SELECT na, nb, ca, cb,
         |       ${Q.sqlR6("chi2")} AS srm_chi2,
         |       chi2 > 6.635 AS srm_flag,
         |       ${Q.sqlR6("p")} AS pooled_p,
         |       ${Q.sqlR6("mde")} AS mde_abs,
         |       ${Q.sqlR6("mde / p")} AS mde_rel
         |FROM g""".stripMargin) { (s, d) =>
      val v = Tables.events(s, d)
        .groupBy(col("user_id"), (col("user_id") % 2).as("variant"))
        .agg(max(when(col("event_type") === "purchase" && col("value") >= 150, 1)
          .otherwise(0)).as("conv"))
        .groupBy("variant")
        .agg(count(lit(1)).as("n"), sum("conv").cast("long").as("c"))
      val w = v.agg(
        sum(when(col("variant") === 0, col("n"))).cast("long").as("na"),
        sum(when(col("variant") === 0, col("c"))).cast("long").as("ca"),
        sum(when(col("variant") === 1, col("n"))).cast("long").as("nb"),
        sum(when(col("variant") === 1, col("c"))).cast("long").as("cb"))
      val chi2 = ((col("na") - col("nb")) * (col("na") - col("nb"))).cast("double") /
        (col("na") + col("nb"))
      val p = (col("ca") + col("cb")).cast("double") / (col("na") + col("nb"))
      val f = w.select(col("na"), col("nb"), col("ca"), col("cb"),
        chi2.as("chi2"), p.as("p"))
      val mde = lit(2.8016) * sqrt(col("p") * (lit(1.0) - col("p")) *
        (lit(1.0) / col("na") + lit(1.0) / col("nb")))
      f.select(col("na"), col("nb"), col("ca"), col("cb"),
        Q.r6(col("chi2")).as("srm_chi2"),
        (col("chi2") > 6.635).as("srm_flag"),
        Q.r6(col("p")).as("pooled_p"),
        Q.r6(mde).as("mde_abs"),
        Q.r6(mde / col("p")).as("mde_rel"))
    },

    // McNemar's paired test (round 14) — did the POPULATION of
    // converters change across the cuped split, user by user? Unlike
    // q_abtest/q_welch_t (independent samples), this is the PAIRED
    // design: each user is their own control, the 2×2 table counts
    // (purchased pre?, purchased post?) per user, and only the
    // DISCORDANT cells (n01: gained, n10: lost) carry signal —
    // χ² = (n10−n01)²/(n10+n01), plus the continuity-corrected form.
    // All five cells are exact int64 from one user-key agg; the two
    // statistics are single divisions of exact integers (NULL when no
    // user switched — both engines agree on the empty-signal case).
    // Scale: one map-side-partial user collapse, 1-row output.
    Q("q_mcnemar",
      s"""WITH u AS (SELECT user_id,
         |                  max(CASE WHEN event_type = 'purchase'
         |                            AND CAST(date_trunc('day', ts) AS DATE) < DATE '2024-01-16'
         |                           THEN 1 ELSE 0 END) AS p1,
         |                  max(CASE WHEN event_type = 'purchase'
         |                            AND CAST(date_trunc('day', ts) AS DATE) >= DATE '2024-01-16'
         |                           THEN 1 ELSE 0 END) AS p2
         |           FROM events GROUP BY 1),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
         |             CAST(sum(CASE WHEN p1 = 0 AND p2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
         |             CAST(sum(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         |             CAST(sum(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         |             CAST(sum(CASE WHEN p1 = 1 AND p2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11
         |      FROM u)
         |SELECT n_users, n00, n01, n10, n11,
         |       CASE WHEN n01 + n10 > 0
         |            THEN ${Q.sqlR6("CAST((n10 - n01) * (n10 - n01) AS DOUBLE) / (n10 + n01)")}
         |       END AS mcnemar,
         |       CASE WHEN n01 + n10 > 0
         |            THEN ${Q.sqlR6("CAST((abs(n10 - n01) - 1) * (abs(n10 - n01) - 1) AS DOUBLE) / (n10 + n01)")}
         |       END AS mcnemar_cc
         |FROM t""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DateType
      val day = col("ts").cast(DateType)
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          max(when(col("event_type") === "purchase" &&
            day < to_date(lit("2024-01-16")), 1).otherwise(0)).as("p1"),
          max(when(col("event_type") === "purchase" &&
            day >= to_date(lit("2024-01-16")), 1).otherwise(0)).as("p2"))
      val t = u.agg(count(lit(1)).as("n_users"),
        sum(when(col("p1") === 0 && col("p2") === 0, 1L).otherwise(0L)).as("n00"),
        sum(when(col("p1") === 0 && col("p2") === 1, 1L).otherwise(0L)).as("n01"),
        sum(when(col("p1") === 1 && col("p2") === 0, 1L).otherwise(0L)).as("n10"),
        sum(when(col("p1") === 1 && col("p2") === 1, 1L).otherwise(0L)).as("n11"))
      val disc = col("n10") + col("n01")
      t.select(col("n_users"), col("n00"), col("n01"), col("n10"), col("n11"),
        when(disc > 0, Q.r6(((col("n10") - col("n01")) * (col("n10") - col("n01")))
          .cast("double") / disc)).as("mcnemar"),
        when(disc > 0, Q.r6(((abs(col("n10") - col("n01")) - 1) *
          (abs(col("n10") - col("n01")) - 1)).cast("double") / disc)).as("mcnemar_cc"))
    },

    // Cochran's Q (round 14) — q_mcnemar generalized to k treatments:
    // over the users × event-types binary participation matrix (did
    // user i ever do type j?), does participation DIFFER across types
    // beyond what per-user activity levels explain?
    // Q = (k−1)·(k·ΣG² − (ΣG)²) / (k·ΣL − ΣL²) with G the per-type
    // column sums and L the per-user row sums — every sufficient sum
    // an exact int64, one mirrored division (NULL when all users hit
    // all types: zero within-block variance). Scale: one (user, type)
    // distinct collapse (map-side partials), then user-keyed and
    // type-keyed rollups of that |users|·k frame; single-row output.
    Q("q_cochran_q",
      s"""WITH x AS (SELECT user_id, event_type FROM events GROUP BY 1, 2),
         |kk AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k FROM events),
         |li AS (SELECT user_id, CAST(count(*) AS BIGINT) AS l FROM x GROUP BY 1),
         |gj AS (SELECT event_type, CAST(count(*) AS BIGINT) AS g FROM x GROUP BY 1),
         |su AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
         |              CAST(sum(l) AS BIGINT) AS sl, CAST(sum(l * l) AS BIGINT) AS sll
         |       FROM li),
         |st AS (SELECT CAST(sum(g) AS BIGINT) AS sg, CAST(sum(g * g) AS BIGINT) AS sgg
         |       FROM gj)
         |SELECT kk.k, su.n_users,
         |       CASE WHEN kk.k * su.sl - su.sll > 0
         |            THEN ${Q.sqlR6("(kk.k - 1) * (kk.k * CAST(st.sgg AS DOUBLE) - CAST(st.sg AS DOUBLE) * st.sg) / (kk.k * su.sl - su.sll)")}
         |       END AS q
         |FROM kk CROSS JOIN su CROSS JOIN st""".stripMargin) { (s, d) =>
      val x = Tables.events(s, d)
        .select("user_id", "event_type").distinct()
        .transform(Q.snapshot) // feeds the user rollup, type rollup and k
      val su = x.groupBy("user_id").agg(count(lit(1)).as("l"))
        .agg(count(lit(1)).as("n_users"), sum("l").as("sl"),
          sum(col("l") * col("l")).as("sll"))
      val st = x.groupBy("event_type").agg(count(lit(1)).as("g"))
        .agg(sum("g").as("sg"), sum(col("g") * col("g")).as("sgg"),
          count(lit(1)).as("k"))
      val den = col("k") * col("sl") - col("sll")
      su.crossJoin(broadcast(st))
        .select(col("k"), col("n_users"),
          when(den > 0,
            Q.r6((col("k") - 1) * (col("k") * col("sgg").cast("double") -
              col("sg").cast("double") * col("sg")) / den)).as("q"))
    },

    // CUPED variance reduction (round 11): the industry-standard
    // pre-experiment covariate adjustment — each user's post-period
    // purchase spend is debiased by θ·(pre − mean_pre) with θ =
    // cov(pre, post)/var(pre), shrinking metric variance by corr²
    // without touching the expected lift (Deng et al.'s CUPED, the
    // reason mature platforms detect effects 2-5× faster). Reports the
    // raw and CUPED-adjusted variant lifts plus the realized variance
    // reduction. Determinism: the per-user (variant, pre, post) frame
    // is exact int64 CENTS; every cross-user statistic (θ's covariance
    // sums, per-variant sums, both variance terms) is an int64
    // sufficient sum from ONE conditional aggregate over that frame,
    // composed through one mirrored double tree. Scale: one user-key
    // map-side-partial agg (corpus → |users| rows) and a single-row
    // rollup; nothing after the collapse grows with the corpus.
    Q("q_cuped",
      s"""WITH u AS (SELECT user_id, user_id % 2 AS variant,
         |                  CAST(sum(CASE WHEN event_type = 'purchase'
         |                                 AND CAST(date_trunc('day', ts) AS DATE) < DATE '2024-01-16'
         |                                THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
         |                                ELSE 0 END) AS BIGINT) AS pre,
         |                  CAST(sum(CASE WHEN event_type = 'purchase'
         |                                 AND CAST(date_trunc('day', ts) AS DATE) >= DATE '2024-01-16'
         |                                THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
         |                                ELSE 0 END) AS BIGINT) AS post
         |           FROM events GROUP BY 1, 2),
         |st AS (SELECT count(*) AS n,
         |              CAST(sum(pre) AS BIGINT) AS sx, CAST(sum(post) AS BIGINT) AS sy,
         |              CAST(sum(pre * post) AS BIGINT) AS sxy,
         |              CAST(sum(pre * pre) AS BIGINT) AS sxx,
         |              CAST(sum(post * post) AS BIGINT) AS syy,
         |              CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         |              CAST(sum(CASE WHEN variant = 0 THEN pre END) AS BIGINT) AS pa,
         |              CAST(sum(CASE WHEN variant = 0 THEN post END) AS BIGINT) AS qa,
         |              CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         |              CAST(sum(CASE WHEN variant = 1 THEN pre END) AS BIGINT) AS pb,
         |              CAST(sum(CASE WHEN variant = 1 THEN post END) AS BIGINT) AS qb
         |       FROM u),
         |f AS (SELECT n, na, nb,
         |             CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - CAST(sx AS DOUBLE) * sx) AS theta,
         |             CAST(n * sxy - sx * sy AS DOUBLE) * (n * sxy - sx * sy) /
         |               ((n * sxx - CAST(sx AS DOUBLE) * sx) * (n * syy - CAST(sy AS DOUBLE) * sy)) AS corr_sq,
         |             CAST(sx AS DOUBLE) / n AS mx,
         |             CAST(qa AS DOUBLE) / na AS mya, CAST(qb AS DOUBLE) / nb AS myb,
         |             CAST(pa AS DOUBLE) / na AS mxa, CAST(pb AS DOUBLE) / nb AS mxb
         |      FROM st)
         |SELECT n AS n_users, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
         |       ${Q.sqlR6("theta")} AS theta,
         |       ${Q.sqlR6("corr_sq")} AS corr_sq,
         |       ${Q.sqlR4("(mya - myb) / 100")} AS lift_raw_usd,
         |       ${Q.sqlR4("((mya - theta * (mxa - mx)) - (myb - theta * (mxb - mx))) / 100")} AS lift_cuped_usd,
         |       ${Q.sqlR4("corr_sq * 100")} AS var_reduction_pct
         |FROM f""".stripMargin) { (s, d) =>
      val cents = floor(col("value") * 100 + 0.5).cast("long")
      val isPurchase = col("event_type") === "purchase"
      val preFlag = col("ts").cast(DateType) < to_date(lit("2024-01-16"))
      val u = Tables.events(s, d)
        .groupBy(col("user_id"), (col("user_id") % 2).as("variant"))
        .agg(
          sum(when(isPurchase && preFlag, cents).otherwise(0L)).cast("long").as("pre"),
          sum(when(isPurchase && !preFlag, cents).otherwise(0L)).cast("long").as("post"))
      val st = u.agg(count(lit(1)).as("n"),
        sum("pre").as("sx"), sum("post").as("sy"),
        sum(col("pre") * col("post")).as("sxy"),
        sum(col("pre") * col("pre")).as("sxx"),
        sum(col("post") * col("post")).as("syy"),
        sum(when(col("variant") === 0, 1).otherwise(0)).cast("long").as("na"),
        sum(when(col("variant") === 0, col("pre"))).as("pa"),
        sum(when(col("variant") === 0, col("post"))).as("qa"),
        sum(when(col("variant") === 1, 1).otherwise(0)).cast("long").as("nb"),
        sum(when(col("variant") === 1, col("pre"))).as("pb"),
        sum(when(col("variant") === 1, col("post"))).as("qb"))
      val covN = col("n") * col("sxy") - col("sx") * col("sy")
      val f = st.select(col("n"), col("na"), col("nb"),
        (covN.cast("double") / (col("n") * col("sxx") - col("sx").cast("double") * col("sx")))
          .as("theta"),
        (covN.cast("double") * covN /
          ((col("n") * col("sxx") - col("sx").cast("double") * col("sx")) *
            (col("n") * col("syy") - col("sy").cast("double") * col("sy")))).as("corr_sq"),
        (col("sx").cast("double") / col("n")).as("mx"),
        (col("qa").cast("double") / col("na")).as("mya"),
        (col("qb").cast("double") / col("nb")).as("myb"),
        (col("pa").cast("double") / col("na")).as("mxa"),
        (col("pb").cast("double") / col("nb")).as("mxb"))
      f.select(col("n").as("n_users"), col("na"), col("nb"),
        Q.r6(col("theta")).as("theta"),
        Q.r6(col("corr_sq")).as("corr_sq"),
        Q.r4((col("mya") - col("myb")) / 100).as("lift_raw_usd"),
        Q.r4(((col("mya") - col("theta") * (col("mxa") - col("mx"))) -
          (col("myb") - col("theta") * (col("mxb") - col("mx")))) / 100)
          .as("lift_cuped_usd"),
        Q.r4(col("corr_sq") * 100).as("var_reduction_pct"))
    },

    // Wilson lower-bound conversion ranking per day (round 11): the
    // score-interval lower bound (z = 1.96) on each day's
    // purchasing-user share — the industry answer to "rank by rate
    // without rewarding tiny denominators" (a 2/3 day must rank below
    // a 40/100 day). Both counts are exact integers from ONE pass
    // (per-(day,user) max-flag collapse, then the per-day rollup — the
    // q_abtest shape), and the Wilson tree is one mirrored double
    // formula over (c, n). Ranking is on the ROUNDED bound with a day
    // tie-break. Scale: two chained map-side-partial aggs, shuffle
    // carries (day,user) then day keys only.
    Q("q_wilson_lb",
      s"""WITH du AS (SELECT strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day,
         |                   user_id,
         |                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
         |            FROM events GROUP BY 1, 2),
         |c AS (SELECT day, count(*) AS n, CAST(sum(conv) AS BIGINT) AS c FROM du GROUP BY 1),
         |f AS (SELECT day, n, c, CAST(c AS DOUBLE) / n AS p FROM c),
         |w AS (SELECT day, n, c, p,
         |             (p + 3.8416 / (2 * n) -
         |              1.96 * sqrt((p * (1.0 - p) + 3.8416 / (4.0 * n)) / n)) /
         |             (1.0 + 3.8416 / n) AS lb
         |      FROM f)
         |SELECT day, n AS n_users, c AS n_converted,
         |       ${Q.sqlR6("p")} AS p_hat,
         |       ${Q.sqlR6("lb")} AS wilson_lb
         |FROM w
         |ORDER BY ${Q.sqlR6("lb")} DESC, day""".stripMargin) { (s, d) =>
      val du = Tables.events(s, d)
        .groupBy(date_format(col("ts").cast(DateType), "yyyy-MM-dd").as("day"),
          col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
      val c = du.groupBy("day")
        .agg(count(lit(1)).as("n"), sum("conv").cast("long").as("c"))
      val p = col("c").cast("double") / col("n")
      val lb = (p + lit(3.8416) / (lit(2) * col("n")) -
        lit(1.96) * sqrt((p * (lit(1.0) - p) + lit(3.8416) / (lit(4.0) * col("n"))) / col("n"))) /
        (lit(1.0) + lit(3.8416) / col("n"))
      c.select(col("day"), col("n").as("n_users"), col("c").as("n_converted"),
          Q.r6(p).as("p_hat"), Q.r6(lb).as("wilson_lb"))
        .orderBy(Q.r6(lb).desc, col("day"))
    },

    // Wald SPRT over the daily purchase-vs-click conversion rate
    // (round 14): the SEQUENTIAL complement of q_power_analysis's
    // fixed-n sizing — monitor the cumulative log-likelihood ratio of
    // H1: p = 0.55 against H0: p = 0.45 day by day, decide the first
    // day the Wald boundaries ±ln 19 (α = β = 0.05) are crossed, and
    // report 'continue' (NULL day) if the trajectory never leaves the
    // corridor. Determinism: the per-day term k·L1 + (n−k)·L0 uses L
    // constants computed ONCE in Scala and embedded as the same IEEE
    // literals in both engines (the q_gumbel_maxima move); the running
    // sum accumulates in window order — identical sequences ⇒ identical
    // doubles ⇒ identical crossing days. A perfectly balanced day adds
    // EXACTLY zero (L1 = −L0 for symmetric hypotheses), so a 50/50
    // stream reads 'continue' with llr ≡ 0.0, not a residue. Scale:
    // everything runs on the |days|-row conversion frame.
    Q("q_sprt", {
      val L1 = math.log(SprtP1 / SprtP0)
      val L0 = math.log((1 - SprtP1) / (1 - SprtP0))
      val bound = math.log(19.0)
      s"""WITH daily AS ($dailySql),
         |d AS (SELECT x,
         |             CAST(sum(CASE WHEN event_type = 'purchase' THEN y ELSE 0 END) AS BIGINT) AS k,
         |             CAST(sum(y) AS BIGINT) AS n
         |      FROM daily WHERE event_type IN ('purchase', 'click') GROUP BY 1),
         |c AS (SELECT x,
         |             sum(k * $L1 + (n - k) * $L0) OVER (ORDER BY x
         |               ROWS UNBOUNDED PRECEDING) AS llr
         |      FROM d),
         |h AS (SELECT x, llr,
         |             CASE WHEN llr >= $bound THEN 1
         |                  WHEN llr <= ${-bound} THEN -1 ELSE 0 END AS hit
         |      FROM c),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
         |             CAST(min(CASE WHEN hit = 1 THEN x END) AS BIGINT) AS up_x,
         |             CAST(min(CASE WHEN hit = -1 THEN x END) AS BIGINT) AS dn_x,
         |             max_by(llr, x) AS final_llr
         |      FROM h)
         |SELECT n_days,
         |       CASE WHEN up_x IS NOT NULL AND (dn_x IS NULL OR up_x < dn_x) THEN 'accept_h1'
         |            WHEN dn_x IS NOT NULL THEN 'accept_h0'
         |            ELSE 'continue' END AS decision,
         |       strftime(DATE '$Anchor' + CAST(CASE
         |         WHEN up_x IS NOT NULL AND (dn_x IS NULL OR up_x < dn_x) THEN up_x
         |         ELSE dn_x END AS INT), '%Y-%m-%d') AS decision_day,
         |       ${Q.sqlR6("final_llr")} AS final_llr
         |FROM t""".stripMargin
    }) { (s, d) =>
      sprtOf(dailyCounts(s, d))
    },

    // TOST equivalence test (round 16): the NON-inferiority readout a
    // platform needs before shipping a "no change" — two one-sided
    // Welch t's against the ±δ margin (δ = 5% of the pooled purchase
    // mean, documented), declared equivalent when BOTH reject at the
    // z-approximated 5% level (|t| > 1.6449, an IEEE literal in both
    // engines — no t-CDF is evaluated, the q_power_analysis move).
    // Arms are the §2.11 variant split over per-event purchase cents;
    // exact int64 moments (n, Σv, Σv²) per arm, floats only in the
    // final means/variances — the q_welch_t machinery pointed at the
    // equivalence question.
    Q("q_tost_equivalence",
      s"""WITH v AS (SELECT user_id % 2 AS variant,
         |                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v2
         |           FROM events WHERE event_type = 'purchase'),
         |s AS (SELECT CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         |             CAST(sum(CASE WHEN variant = 1 THEN v2 ELSE 0 END) AS BIGINT) AS s1a,
         |             CAST(sum(CASE WHEN variant = 1 THEN v2 * v2 ELSE 0 END) AS BIGINT) AS s2a,
         |             CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         |             CAST(sum(CASE WHEN variant = 0 THEN v2 ELSE 0 END) AS BIGINT) AS s1b,
         |             CAST(sum(CASE WHEN variant = 0 THEN v2 * v2 ELSE 0 END) AS BIGINT) AS s2b
         |      FROM v),
         |m AS (SELECT na, nb,
         |             CAST(s1a AS DOUBLE) / na AS ma, CAST(s1b AS DOUBLE) / nb AS mb,
         |             (CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) / na * s1a) / (na - 1) AS va,
         |             (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) / nb * s1b) / (nb - 1) AS vb,
         |             0.05 * (CAST(s1a AS BIGINT) + s1b) / (na + nb) AS delta
         |      FROM s WHERE na >= 2 AND nb >= 2),
         |f AS (SELECT na, nb, ma, mb, delta,
         |             sqrt(va / na + vb / nb) AS se,
         |             (va / na + vb / nb) * (va / na + vb / nb) /
         |               ((va / na) * (va / na) / (na - 1) + (vb / nb) * (vb / nb) / (nb - 1)) AS df
         |      FROM m)
         |SELECT na AS n_treat, nb AS n_ctrl,
         |       ${Q.sqlR4("(ma - mb) / 100")} AS diff_usd,
         |       ${Q.sqlR4("delta / 100")} AS margin_usd,
         |       CASE WHEN se > 0 THEN ${Q.sqlR6("(ma - mb + delta) / se")} END AS t_lower,
         |       CASE WHEN se > 0 THEN ${Q.sqlR6("(ma - mb - delta) / se")} END AS t_upper,
         |       CASE WHEN se > 0 THEN ${Q.sqlR2("df")} END AS df,
         |       CAST(CASE WHEN se > 0 AND (ma - mb + delta) / se > 1.6448536269514722
         |                  AND (ma - mb - delta) / se < -1.6448536269514722
         |            THEN 1 ELSE 0 END AS BIGINT) AS equivalent
         |FROM f""".stripMargin) { (s, d) =>
      val v = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select((col("user_id") % 2).as("variant"),
          floor(col("value") * 100 + 0.5).cast("long").as("v2"))
      val st = v.agg(
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("na"),
        sum(when(col("variant") === 1, col("v2")).otherwise(0L)).as("s1a"),
        sum(when(col("variant") === 1, col("v2") * col("v2")).otherwise(0L)).as("s2a"),
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("nb"),
        sum(when(col("variant") === 0, col("v2")).otherwise(0L)).as("s1b"),
        sum(when(col("variant") === 0, col("v2") * col("v2")).otherwise(0L)).as("s2b"))
      val m = st.filter(col("na") >= 2 && col("nb") >= 2)
        .select(col("na"), col("nb"),
          (col("s1a").cast("double") / col("na")).as("ma"),
          (col("s1b").cast("double") / col("nb")).as("mb"),
          ((col("s2a").cast("double") - col("s1a").cast("double") / col("na") * col("s1a"))
            / (col("na") - 1)).as("va"),
          ((col("s2b").cast("double") - col("s1b").cast("double") / col("nb") * col("s1b"))
            / (col("nb") - 1)).as("vb"),
          (lit(0.05) * (col("s1a") + col("s1b")) / (col("na") + col("nb"))).as("delta"))
      val f = m.select(col("na"), col("nb"), col("ma"), col("mb"), col("delta"),
        sqrt(col("va") / col("na") + col("vb") / col("nb")).as("se"),
        ((col("va") / col("na") + col("vb") / col("nb")) *
          (col("va") / col("na") + col("vb") / col("nb")) /
          ((col("va") / col("na")) * (col("va") / col("na")) / (col("na") - 1) +
           (col("vb") / col("nb")) * (col("vb") / col("nb")) / (col("nb") - 1))).as("df"))
      val zc = lit(1.6448536269514722)
      f.select(col("na").as("n_treat"), col("nb").as("n_ctrl"),
        Q.r4((col("ma") - col("mb")) / 100).as("diff_usd"),
        Q.r4(col("delta") / 100).as("margin_usd"),
        when(col("se") > 0, Q.r6((col("ma") - col("mb") + col("delta")) / col("se"))).as("t_lower"),
        when(col("se") > 0, Q.r6((col("ma") - col("mb") - col("delta")) / col("se"))).as("t_upper"),
        when(col("se") > 0, Q.r2(col("df"))).as("df"),
        when(col("se") > 0 &&
          (col("ma") - col("mb") + col("delta")) / col("se") > zc &&
          (col("ma") - col("mb") - col("delta")) / col("se") < -zc, 1L)
          .otherwise(0L).as("equivalent"))
    },

    // Group-sequential monitoring with O'Brien–Fleming boundaries
    // (round 16): five interim looks at calendar quintiles of the
    // experiment window — at each look the cumulative Welch z of the
    // variant purchase contrast against the OBF boundary
    // 2.9626/√(k/5), the spending discipline that lets a platform
    // peek early without inflating α. Boundaries are FIVE IEEE
    // literals in both engines; look cutoffs are pure integer
    // arithmetic on the observed day span. Shape: the corpus
    // collapses to the calendar-bounded (variant, day) moment grid
    // ONCE; each look is a filter+agg over that tiny grid.
    Q("q_group_sequential",
      s"""WITH g AS (SELECT user_id % 2 AS variant,
         |                  CAST(date_diff('day', DATE '$Anchor',
         |                                 CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         |                  CAST(count(*) AS BIGINT) AS n,
         |                  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sv,
         |                  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT) *
         |                           CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qv
         |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         |sp AS (SELECT min(x) AS xmin, max(x) AS xmax FROM g),
         |lk AS (SELECT k,
         |              sp.xmin - 1 + CAST(floor(k * (sp.xmax - sp.xmin + 1) / 5.0) AS BIGINT) AS cutoff
         |       FROM (SELECT unnest([1, 2, 3, 4, 5]) AS k), sp),
         |c AS (SELECT lk.k, lk.cutoff, g.variant,
         |             CAST(sum(g.n) AS BIGINT) AS n,
         |             CAST(sum(g.sv) AS BIGINT) AS s1,
         |             CAST(sum(g.qv) AS BIGINT) AS s2
         |      FROM lk JOIN g ON g.x <= lk.cutoff
         |      GROUP BY 1, 2, 3),
         |w AS (SELECT k, cutoff,
         |             max(CASE WHEN variant = 1 THEN n END) AS na,
         |             max(CASE WHEN variant = 1 THEN s1 END) AS s1a,
         |             max(CASE WHEN variant = 1 THEN s2 END) AS s2a,
         |             max(CASE WHEN variant = 0 THEN n END) AS nb,
         |             max(CASE WHEN variant = 0 THEN s1 END) AS s1b,
         |             max(CASE WHEN variant = 0 THEN s2 END) AS s2b
         |      FROM c GROUP BY 1, 2),
         |f AS (SELECT k, cutoff, na, nb,
         |             CASE WHEN na >= 2 AND nb >= 2 THEN
         |               (CAST(s1a AS DOUBLE) / na - CAST(s1b AS DOUBLE) / nb) /
         |               sqrt((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) / na * s1a) / (na - 1) / na +
         |                    (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) / nb * s1b) / (nb - 1) / nb)
         |             END AS z,
         |             CASE k $ObfSqlCases END AS obf
         |      FROM w)
         |SELECT CAST(k AS BIGINT) AS look, cutoff AS day_cutoff,
         |       CAST(coalesce(na, 0) AS BIGINT) AS n_treat,
         |       CAST(coalesce(nb, 0) AS BIGINT) AS n_ctrl,
         |       CASE WHEN z IS NOT NULL THEN ${Q.sqlR6("z")} END AS z,
         |       obf AS obf_boundary,
         |       CAST(CASE WHEN z IS NOT NULL AND abs(z) > obf THEN 1 ELSE 0 END AS BIGINT) AS crossed
         |FROM f
         |ORDER BY look""".stripMargin) { (s, d) =>
      val cents = floor(col("value") * 100 + 0.5).cast("long")
      val g = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy((col("user_id") % 2).as("variant"), dayIndexCol.as("x"))
        .agg(count(lit(1)).as("n"), sum(cents).as("sv"),
          sum(cents * cents).as("qv"))
        .transform(Q.snapshot) // feeds the span agg and every look
      val sp = g.agg(min("x").as("xmin"), max("x").as("xmax"))
      val lk = sp.select(explode(sequence(lit(1), lit(5))).as("k"),
          col("xmin"), col("xmax"))
        .select(col("k"),
          (col("xmin") - 1 + floor(col("k") * (col("xmax") - col("xmin") + 1) / lit(5.0))
            .cast("long")).as("cutoff"))
      val c = broadcast(lk).join(g, g("x") <= lk("cutoff"))
        .groupBy("k", "cutoff", "variant")
        .agg(sum("n").as("n"), sum("sv").as("s1"), sum("qv").as("s2"))
      val w = c.groupBy("k", "cutoff").agg(
        max(when(col("variant") === 1, col("n"))).as("na"),
        max(when(col("variant") === 1, col("s1"))).as("s1a"),
        max(when(col("variant") === 1, col("s2"))).as("s2a"),
        max(when(col("variant") === 0, col("n"))).as("nb"),
        max(when(col("variant") === 0, col("s1"))).as("s1b"),
        max(when(col("variant") === 0, col("s2"))).as("s2b"))
      val z = when(col("na") >= 2 && col("nb") >= 2,
        (col("s1a").cast("double") / col("na") - col("s1b").cast("double") / col("nb")) /
          sqrt((col("s2a").cast("double") - col("s1a").cast("double") / col("na") * col("s1a"))
              / (col("na") - 1) / col("na") +
            (col("s2b").cast("double") - col("s1b").cast("double") / col("nb") * col("s1b"))
              / (col("nb") - 1) / col("nb")))
      w.withColumn("z", z)
        .withColumn("obf", obfBoundaryCol(col("k")))
        .select(col("k").cast("long").as("look"), col("cutoff").as("day_cutoff"),
          coalesce(col("na"), lit(0L)).as("n_treat"),
          coalesce(col("nb"), lit(0L)).as("n_ctrl"),
          when(col("z").isNotNull, Q.r6(col("z"))).as("z"),
          col("obf").as("obf_boundary"),
          when(col("z").isNotNull && abs(col("z")) > col("obf"), 1L)
            .otherwise(0L).as("crossed"))
        .orderBy("look")
    },

    // Kleinberg-style burst detection over the per-type daily series
    // (round 15, forward-filtered 2-state automaton): each day is
    // labeled quiet (rate λ₀ = the type's mean daily count) or
    // BURSTING (λ₁ = 2λ₀) by the cheaper cumulative cost path, with
    // Poisson-shaped emission costs λ_s − y·ln λ_s (the y! term
    // cancels between states) and a symmetric switching penalty
    // γ = 1. Forward FILTERING, not Viterbi smoothing — the label at
    // day t uses days ≤ t only (the streamable convention,
    // documented). Determinism: both engines run the identical
    // left-to-right float recursion — the oracle as a recursive CTE,
    // Spark as ONE linear aggregate() fold per type over the sorted
    // day array (round 16; was a running collect_list window + a
    // re-fold per output row, O(|days|²) per type) — so costs agree
    // to the bit; the tie c1 = c0 reads quiet in both. Shape: one
    // corpus scan onto the daily frame, one groupBy(event_type).
    Q("q_burst_detect",
      s"""WITH RECURSIVE daily AS ($dailySql),
         |lam AS (SELECT event_type, CAST(sum(y) AS DOUBLE) / count(*) AS l0
         |        FROM daily GROUP BY 1),
         |lx AS (SELECT event_type, l0, ln(l0) AS ll0, 2 * l0 AS l1, ln(2 * l0) AS ll1
         |       FROM lam),
         |seq AS (SELECT d.event_type, d.x, d.y, lx.l0, lx.ll0, lx.l1, lx.ll1,
         |               CAST(row_number() OVER (PARTITION BY d.event_type ORDER BY d.x) AS BIGINT) AS rn
         |        FROM daily d JOIN lx ON d.event_type = lx.event_type),
         |rec AS (SELECT event_type, rn, x, y, l0, ll0, l1, ll1,
         |               l0 - y * ll0 AS c0, 1.0 + l1 - y * ll1 AS c1
         |        FROM seq WHERE rn = 1
         |        UNION ALL
         |        SELECT s.event_type, s.rn, s.x, s.y, s.l0, s.ll0, s.l1, s.ll1,
         |               LEAST(r.c0, r.c1 + 1.0) + (s.l0 - s.y * s.ll0),
         |               LEAST(r.c1, r.c0 + 1.0) + (s.l1 - s.y * s.ll1)
         |        FROM rec r JOIN seq s ON s.event_type = r.event_type AND s.rn = r.rn + 1),
         |lab AS (SELECT event_type, x, y,
         |               CASE WHEN c1 < c0 THEN 1 ELSE 0 END AS burst
         |        FROM rec)
         |SELECT event_type, x AS day_idx, y, CAST(burst AS BIGINT) AS burst,
         |       CAST(sum(burst) OVER (PARTITION BY event_type) AS BIGINT) AS n_burst_days
         |FROM lab
         |ORDER BY event_type, day_idx""".stripMargin) { (s, d) =>
      burstDetectOf(dailyCounts(s, d))
    },

    // Matrix profile over the per-type daily count series (round 15,
    // m = 3, exact Euclidean): for every 3-consecutive-day window the
    // distance to its nearest non-trivial neighbor (|i−j| ≥ m — the
    // standard exclusion), collapsed to the MOTIF (the closest pair —
    // the series' most repeated weekly shape) and the DISCORD (the
    // window farthest from everything — the strongest 3-day anomaly).
    // Distances are exact int64 sums of squared count gaps, so both
    // argmins are pure integer picks under the (d2, i, j) struct
    // order — no float ever crosses a row. Shape: the pair frame is
    // CALENDAR-bounded (|days|² per type, the q_periodogram class),
    // never corpus-bounded; the lead windows partition by type.
    Q("q_matrix_profile",
      s"""WITH daily AS ($dailySql),
         |sub AS (SELECT event_type, x AS i, y AS a0,
         |               lead(x, 1) OVER (PARTITION BY event_type ORDER BY x) AS x1,
         |               lead(x, 2) OVER (PARTITION BY event_type ORDER BY x) AS x2,
         |               lead(y, 1) OVER (PARTITION BY event_type ORDER BY x) AS a1,
         |               lead(y, 2) OVER (PARTITION BY event_type ORDER BY x) AS a2
         |        FROM daily),
         |ss AS (SELECT event_type, i, a0, a1, a2 FROM sub
         |       WHERE x1 = i + 1 AND x2 = i + 2),
         |pr AS (SELECT a.event_type, a.i, b.i AS j,
         |              (a.a0-b.a0)*(a.a0-b.a0) + (a.a1-b.a1)*(a.a1-b.a1)
         |                + (a.a2-b.a2)*(a.a2-b.a2) AS d2
         |       FROM ss a JOIN ss b ON a.event_type = b.event_type
         |                          AND abs(a.i - b.i) >= 3),
         |pf AS (SELECT event_type, i, d2, j,
         |              row_number() OVER (PARTITION BY event_type, i ORDER BY d2, j) AS rn
         |       FROM pr),
         |p1 AS (SELECT event_type, i, d2, j FROM pf WHERE rn = 1),
         |mo AS (SELECT event_type, i, j, d2,
         |              row_number() OVER (PARTITION BY event_type ORDER BY d2, i, j) AS rn
         |       FROM p1),
         |di AS (SELECT event_type, i, d2,
         |              row_number() OVER (PARTITION BY event_type ORDER BY d2 DESC, i) AS rn
         |       FROM p1),
         |np AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_profiled FROM p1 GROUP BY 1)
         |SELECT np.event_type, np.n_profiled,
         |       CAST(mo.i AS BIGINT) AS motif_i, CAST(mo.j AS BIGINT) AS motif_j,
         |       CAST(mo.d2 AS BIGINT) AS motif_d2,
         |       CAST(di.i AS BIGINT) AS discord_i, CAST(di.d2 AS BIGINT) AS discord_d2
         |FROM np
         |JOIN mo ON np.event_type = mo.event_type AND mo.rn = 1
         |JOIN di ON np.event_type = di.event_type AND di.rn = 1
         |ORDER BY np.event_type""".stripMargin) { (s, d) =>
      matrixProfileOf(dailyCounts(s, d))
    },

    // Exact two-factor OLS (round 16): daily purchases regressed on
    // daily clicks AND views — the first MULTIPLE regression on the
    // surface (q_grouped_regression/q_trend_fit are simple), closed
    // form via Cramer's rule over the centered moment matrix, plus R²
    // and the collinearity VIF = 1/(1 − r₁₂²) that says whether the
    // two regressors are distinguishable at all. The corpus collapses
    // to the calendar-bounded day pivot ONCE; every S-moment is exact
    // int64 (the SF² headroom class — n·Σx² of daily counts), cast to
    // double only inside the one mirrored Cramer tree. Degenerate
    // determinant (collinear regressors) → NULL coefficients in both
    // engines.
    Q("q_ols2",
      s"""WITH daily AS ($dailySql),
         |pv AS (SELECT x,
         |              CAST(coalesce(max(CASE WHEN event_type = 'purchase' THEN y END), 0) AS BIGINT) AS yy,
         |              CAST(coalesce(max(CASE WHEN event_type = 'click' THEN y END), 0) AS BIGINT) AS x1,
         |              CAST(coalesce(max(CASE WHEN event_type = 'view' THEN y END), 0) AS BIGINT) AS x2
         |       FROM daily GROUP BY 1),
         |mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |              CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         |              CAST(sum(yy) AS BIGINT) AS sy,
         |              CAST(sum(x1 * x1) AS BIGINT) AS s11, CAST(sum(x2 * x2) AS BIGINT) AS s22,
         |              CAST(sum(x1 * x2) AS BIGINT) AS s12,
         |              CAST(sum(x1 * yy) AS BIGINT) AS s1y, CAST(sum(x2 * yy) AS BIGINT) AS s2y,
         |              CAST(sum(yy * yy) AS BIGINT) AS syy
         |       FROM pv),
         |ce AS (SELECT n,
         |              CAST(n * s11 - s1 * s1 AS DOUBLE) AS c11,
         |              CAST(n * s22 - s2 * s2 AS DOUBLE) AS c22,
         |              CAST(n * s12 - s1 * s2 AS DOUBLE) AS c12,
         |              CAST(n * s1y - s1 * sy AS DOUBLE) AS c1y,
         |              CAST(n * s2y - s2 * sy AS DOUBLE) AS c2y,
         |              CAST(n * syy - sy * sy AS DOUBLE) AS cyy,
         |              s1, s2, sy
         |       FROM mo),
         |ft AS (SELECT n, c11, c22, c12, cyy,
         |              CASE WHEN c11 * c22 - c12 * c12 > 0 THEN
         |                (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) END AS b1,
         |              CASE WHEN c11 * c22 - c12 * c12 > 0 THEN
         |                (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) END AS b2,
         |              c1y, c2y, s1, s2, sy
         |       FROM ce)
         |SELECT n AS n_days, ${Q.sqlR6("b1")} AS beta_clicks, ${Q.sqlR6("b2")} AS beta_views,
         |       ${Q.sqlR4("(sy - b1 * s1 - b2 * s2) / n")} AS intercept,
         |       CASE WHEN cyy > 0 THEN ${Q.sqlR6("(b1 * c1y + b2 * c2y) / cyy")} END AS r2,
         |       CASE WHEN c11 > 0 AND c22 > 0 AND c11 * c22 - c12 * c12 > 0 THEN
         |         ${Q.sqlR4("1.0 / (1.0 - c12 * c12 / (c11 * c22))")}
         |       END AS vif
         |FROM ft""".stripMargin) { (s, d) =>
      val pv = dailyCounts(s, d)
        .groupBy("x")
        .agg(coalesce(max(when(col("event_type") === "purchase", col("y"))), lit(0L)).as("yy"),
          coalesce(max(when(col("event_type") === "click", col("y"))), lit(0L)).as("x1"),
          coalesce(max(when(col("event_type") === "view", col("y"))), lit(0L)).as("x2"))
      val mo = pv.agg(count(lit(1)).as("n"),
        sum("x1").as("s1"), sum("x2").as("s2"), sum("yy").as("sy"),
        sum(col("x1") * col("x1")).as("s11"), sum(col("x2") * col("x2")).as("s22"),
        sum(col("x1") * col("x2")).as("s12"),
        sum(col("x1") * col("yy")).as("s1y"), sum(col("x2") * col("yy")).as("s2y"),
        sum(col("yy") * col("yy")).as("syy"))
      val ce = mo.select(col("n"),
        (col("n") * col("s11") - col("s1") * col("s1")).cast("double").as("c11"),
        (col("n") * col("s22") - col("s2") * col("s2")).cast("double").as("c22"),
        (col("n") * col("s12") - col("s1") * col("s2")).cast("double").as("c12"),
        (col("n") * col("s1y") - col("s1") * col("sy")).cast("double").as("c1y"),
        (col("n") * col("s2y") - col("s2") * col("sy")).cast("double").as("c2y"),
        (col("n") * col("syy") - col("sy") * col("sy")).cast("double").as("cyy"),
        col("s1"), col("s2"), col("sy"))
      val det = col("c11") * col("c22") - col("c12") * col("c12")
      val ft = ce
        .withColumn("b1", when(det > 0,
          (col("c1y") * col("c22") - col("c2y") * col("c12")) / det))
        .withColumn("b2", when(det > 0,
          (col("c2y") * col("c11") - col("c1y") * col("c12")) / det))
      ft.select(col("n").as("n_days"),
        Q.r6(col("b1")).as("beta_clicks"), Q.r6(col("b2")).as("beta_views"),
        Q.r4((col("sy") - col("b1") * col("s1") - col("b2") * col("s2")) / col("n"))
          .as("intercept"),
        when(col("cyy") > 0,
          Q.r6((col("b1") * col("c1y") + col("b2") * col("c2y")) / col("cyy"))).as("r2"),
        when(col("c11") > 0 && col("c22") > 0 && det > 0,
          Q.r4(lit(1.0) / (lit(1.0) - col("c12") * col("c12") / (col("c11") * col("c22")))))
          .as("vif"))
    },

    // Baron–Kenny mediation decomposition (round 16): does VIEW
    // exposure drive purchases directly, or THROUGH click engagement?
    // Total effect c (y~x), the a-path (m~x), and the two-factor
    // direct/b paths (y ~ x + m via the q_ols2 Cramer tree); indirect
    // = a·b, proportion mediated = a·b/c. Everything derives from ONE
    // exact int64 moment matrix over the calendar-bounded day pivot
    // (x = views, m = clicks, y = purchases) — one corpus collapse,
    // one mirrored double tree, NULL-guarded degenerate denominators
    // identical in both engines.
    Q("q_mediation",
      s"""WITH daily AS ($dailySql),
         |pv AS (SELECT x,
         |              CAST(coalesce(max(CASE WHEN event_type = 'view' THEN y END), 0) AS BIGINT) AS xv,
         |              CAST(coalesce(max(CASE WHEN event_type = 'click' THEN y END), 0) AS BIGINT) AS mv,
         |              CAST(coalesce(max(CASE WHEN event_type = 'purchase' THEN y END), 0) AS BIGINT) AS yv
         |       FROM daily GROUP BY 1),
         |mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |              CAST(sum(xv) AS BIGINT) AS sx, CAST(sum(mv) AS BIGINT) AS sm,
         |              CAST(sum(yv) AS BIGINT) AS sy,
         |              CAST(sum(xv * xv) AS BIGINT) AS sxx, CAST(sum(mv * mv) AS BIGINT) AS smm,
         |              CAST(sum(xv * mv) AS BIGINT) AS sxm,
         |              CAST(sum(xv * yv) AS BIGINT) AS sxy, CAST(sum(mv * yv) AS BIGINT) AS smy
         |       FROM pv),
         |ce AS (SELECT n,
         |              CAST(n * sxx - sx * sx AS DOUBLE) AS cxx,
         |              CAST(n * smm - sm * sm AS DOUBLE) AS cmm,
         |              CAST(n * sxm - sx * sm AS DOUBLE) AS cxm,
         |              CAST(n * sxy - sx * sy AS DOUBLE) AS cxy,
         |              CAST(n * smy - sm * sy AS DOUBLE) AS cmy
         |       FROM mo),
         |ft AS (SELECT n,
         |              CASE WHEN cxx > 0 THEN cxy / cxx END AS c_total,
         |              CASE WHEN cxx > 0 THEN cxm / cxx END AS a_path,
         |              CASE WHEN cxx * cmm - cxm * cxm > 0 THEN
         |                (cxy * cmm - cmy * cxm) / (cxx * cmm - cxm * cxm) END AS c_direct,
         |              CASE WHEN cxx * cmm - cxm * cxm > 0 THEN
         |                (cmy * cxx - cxy * cxm) / (cxx * cmm - cxm * cxm) END AS b_path
         |       FROM ce)
         |SELECT n AS n_days, ${Q.sqlR6("c_total")} AS total_effect,
         |       ${Q.sqlR6("c_direct")} AS direct_effect,
         |       ${Q.sqlR6("a_path")} AS a_path, ${Q.sqlR6("b_path")} AS b_path,
         |       ${Q.sqlR6("a_path * b_path")} AS indirect_effect,
         |       CASE WHEN c_total <> 0 THEN
         |         ${Q.sqlR6("a_path * b_path / c_total")}
         |       END AS prop_mediated
         |FROM ft""".stripMargin) { (s, d) =>
      val pv = dailyCounts(s, d)
        .groupBy("x")
        .agg(coalesce(max(when(col("event_type") === "view", col("y"))), lit(0L)).as("xv"),
          coalesce(max(when(col("event_type") === "click", col("y"))), lit(0L)).as("mv"),
          coalesce(max(when(col("event_type") === "purchase", col("y"))), lit(0L)).as("yv"))
      val mo = pv.agg(count(lit(1)).as("n"),
        sum("xv").as("sx"), sum("mv").as("sm"), sum("yv").as("sy"),
        sum(col("xv") * col("xv")).as("sxx"), sum(col("mv") * col("mv")).as("smm"),
        sum(col("xv") * col("mv")).as("sxm"),
        sum(col("xv") * col("yv")).as("sxy"), sum(col("mv") * col("yv")).as("smy"))
      val ce = mo.select(col("n"),
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double").as("cxx"),
        (col("n") * col("smm") - col("sm") * col("sm")).cast("double").as("cmm"),
        (col("n") * col("sxm") - col("sx") * col("sm")).cast("double").as("cxm"),
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double").as("cxy"),
        (col("n") * col("smy") - col("sm") * col("sy")).cast("double").as("cmy"))
      val det = col("cxx") * col("cmm") - col("cxm") * col("cxm")
      val ft = ce.select(col("n"),
        when(col("cxx") > 0, col("cxy") / col("cxx")).as("c_total"),
        when(col("cxx") > 0, col("cxm") / col("cxx")).as("a_path"),
        when(det > 0, (col("cxy") * col("cmm") - col("cmy") * col("cxm")) / det)
          .as("c_direct"),
        when(det > 0, (col("cmy") * col("cxx") - col("cxy") * col("cxm")) / det)
          .as("b_path"))
      ft.select(col("n").as("n_days"),
        Q.r6(col("c_total")).as("total_effect"),
        Q.r6(col("c_direct")).as("direct_effect"),
        Q.r6(col("a_path")).as("a_path"), Q.r6(col("b_path")).as("b_path"),
        Q.r6(col("a_path") * col("b_path")).as("indirect_effect"),
        when(col("c_total") =!= 0,
          Q.r6(col("a_path") * col("b_path") / col("c_total"))).as("prop_mediated"))
    }
  )

  /** The burst-filter fold over a daily (event_type, x, y) count
    * frame — ONE home shared by batch q_burst_detect and the
    * s_burst_detect streaming read-time view (a late-closing day
    * re-prices λ and the whole cost recursion; the daily grid is the
    * mergeable state). */
  private[graft] def burstDetectOf(dailyIn: DataFrame): DataFrame = {
    // ONE linear fold per type (round 16): the prior form materialized
    // every prefix of the per-type daily series (collect_list over a
    // running window) and re-ran the whole two-state cost recursion per
    // output row — O(|days|²) work and memory per type where O(|days|)
    // fits, and the s_burst_detect face re-paid it at every trigger.
    // Now one sort_array(collect_list(struct(x, y))) per type carries
    // the series, a single aggregate() fold emits the per-day burst
    // label alongside the running (c0, c1) costs, and explode restores
    // rows. The float recursion is textually identical term-for-term
    // (l0 - y*ll0, LEAST(c0, c1+1.0) + …), so costs still agree with
    // the recursive-CTE oracle to the bit; the burst label re-derives
    // each day's NEW costs inside the struct (named_struct fields
    // can't reference siblings) — same expressions, same values.
    dailyIn.groupBy("event_type")
      .agg((sum("y").cast("double") / count(lit(1))).as("l0"),
        sort_array(collect_list(struct(col("x"), col("y")))).as("xs"))
      .select(col("event_type"), col("xs"),
        col("l0"), log(col("l0")).as("ll0"),
        (lit(2) * col("l0")).as("l1"), log(lit(2) * col("l0")).as("ll1"))
      .withColumn("lab", expr(
        """aggregate(xs,
          |  named_struct('f', CAST(0 AS INT), 'c0', CAST(0 AS DOUBLE), 'c1', CAST(0 AS DOUBLE),
          |    'out', CAST(array() AS ARRAY<STRUCT<x: BIGINT, y: BIGINT, burst: BIGINT>>)),
          |  (acc, e) -> CASE WHEN acc.f = 0
          |    THEN named_struct('f', 1,
          |      'c0', l0 - e.y * ll0,
          |      'c1', 1.0 + l1 - e.y * ll1,
          |      'out', array(named_struct('x', e.x, 'y', e.y,
          |        'burst', CAST(CASE WHEN (1.0 + l1 - e.y * ll1) < (l0 - e.y * ll0)
          |                      THEN 1 ELSE 0 END AS BIGINT))))
          |    ELSE named_struct('f', 1,
          |      'c0', LEAST(acc.c0, acc.c1 + 1.0) + (l0 - e.y * ll0),
          |      'c1', LEAST(acc.c1, acc.c0 + 1.0) + (l1 - e.y * ll1),
          |      'out', array_append(acc.out, named_struct('x', e.x, 'y', e.y,
          |        'burst', CAST(CASE WHEN LEAST(acc.c1, acc.c0 + 1.0) + (l1 - e.y * ll1)
          |                             < LEAST(acc.c0, acc.c1 + 1.0) + (l0 - e.y * ll0)
          |                      THEN 1 ELSE 0 END AS BIGINT))))
          |    END,
          |  acc -> acc.out)""".stripMargin))
      .select(col("event_type"),
        expr("aggregate(lab, CAST(0 AS BIGINT), (a, e) -> a + e.burst)")
          .as("n_burst_days"),
        explode(col("lab")).as("e"))
      .select(col("event_type"), col("e.x").as("day_idx"),
        col("e.y").as("y"), col("e.burst").as("burst"),
        col("n_burst_days"))
      .orderBy("event_type", "day_idx")
  }

  /** The matrix-profile fold (m = 3) over a daily (event_type, x, y)
    * count frame — ONE home shared by batch q_matrix_profile and the
    * s_matrix_profile streaming read-time view (a new day shifts every
    * window's nearest neighbor; the daily grid is the mergeable
    * state). Per-window minima, the motif pair and the discord are
    * integer argmins under (d2, i, j) struct order. */
  private[graft] def matrixProfileOf(dailyIn: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("x")
    val sub = dailyIn
      .withColumn("x1", lead("x", 1).over(w))
      .withColumn("x2", lead("x", 2).over(w))
      .withColumn("a1", lead("y", 1).over(w))
      .withColumn("a2", lead("y", 2).over(w))
      .filter(col("x1") === col("x") + 1 && col("x2") === col("x") + 2)
      .select(col("event_type"), col("x").as("i"),
        col("y").as("a0"), col("a1"), col("a2"))
    val bb = sub.select(col("event_type"), col("i").as("j"),
      col("a0").as("b0"), col("a1").as("b1"), col("a2").as("b2"))
    val pairs = sub.join(bb, Seq("event_type"))
      .filter(abs(col("i") - col("j")) >= 3)
      .withColumn("d2",
        (col("a0") - col("b0")) * (col("a0") - col("b0")) +
          (col("a1") - col("b1")) * (col("a1") - col("b1")) +
          (col("a2") - col("b2")) * (col("a2") - col("b2")))
    val prof = pairs.groupBy(col("event_type"), col("i"))
      .agg(min(struct(col("d2"), col("j"))).as("p"))
      .select(col("event_type"), col("i"),
        col("p").getField("d2").as("pd2"), col("p").getField("j").as("pj"))
    prof.groupBy("event_type")
      .agg(count(lit(1)).as("n_profiled"),
        min(struct(col("pd2").as("d2"), col("i"), col("pj").as("j"))).as("mo"),
        min(struct((-col("pd2")).as("nd"), col("i"))).as("di"))
      .select(col("event_type"), col("n_profiled"),
        col("mo").getField("i").as("motif_i"),
        col("mo").getField("j").as("motif_j"),
        col("mo").getField("d2").as("motif_d2"),
        col("di").getField("i").as("discord_i"),
        (-col("di").getField("nd")).as("discord_d2"))
      .orderBy("event_type")
  }

  /** SPRT hypotheses — symmetric around 0.5 so a balanced day adds
    * exactly zero log-likelihood. */
  private val SprtP0 = 0.45
  private val SprtP1 = 0.55

  /** The SPRT fold over a daily (event_type, x, y) count frame — ONE
    * home shared by batch q_sprt and the s_sprt streaming read-time
    * view (the trajectory re-prices from the first day at every close;
    * the daily grid is the mergeable state). */
  private[graft] def sprtOf(dailyIn: DataFrame): DataFrame = {
    val l1 = math.log(SprtP1 / SprtP0)
    val l0 = math.log((1 - SprtP1) / (1 - SprtP0))
    val bound = math.log(19.0)
    val d = dailyIn.filter(col("event_type").isin("purchase", "click"))
      .groupBy("x")
      .agg(sum(when(col("event_type") === "purchase", col("y")).otherwise(0L)).as("k"),
        sum("y").as("n"))
    val c = d.withColumn("llr",
        sum(col("k") * lit(l1) + (col("n") - col("k")) * lit(l0))
          .over(Window.orderBy("x").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("hit", when(col("llr") >= bound, 1L)
        .when(col("llr") <= -bound, -1L).otherwise(0L))
    val t = c.agg(count(lit(1)).as("n_days"),
      min(when(col("hit") === 1, col("x"))).as("up_x"),
      min(when(col("hit") === -1, col("x"))).as("dn_x"),
      max_by(col("llr"), col("x")).as("final_llr"))
    val h1First = col("up_x").isNotNull && (col("dn_x").isNull || col("up_x") < col("dn_x"))
    t.select(col("n_days"),
      when(h1First, "accept_h1").when(col("dn_x").isNotNull, "accept_h0")
        .otherwise("continue").as("decision"),
      date_format(date_add(to_date(lit(Anchor)),
        when(h1First, col("up_x")).otherwise(col("dn_x")).cast("int")), "yyyy-MM-dd")
        .as("decision_day"),
      Q.r6(col("final_llr")).as("final_llr"))
  }
}
