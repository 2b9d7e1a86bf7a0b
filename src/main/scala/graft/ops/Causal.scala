package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Causal & quasi-experimental analytics (round 16, SURVEY §2.18): the
  * estimators an experimentation/training-data platform runs when the
  * clean A/B readout (q_abtest/q_cuped) isn't available — panel
  * difference-in-differences, the Wald/LATE instrumental-variable
  * ratio, stratified (propensity-bucket) treatment effects, and a
  * local-linear regression discontinuity. All ride the SAME
  * deterministic conventions as the §2.11 experiment ops: treatment =
  * user_id % 2, the pre/post split at DATE '2024-01-16', outcomes as
  * exact purchase cents (floor(value·100+0.5)).
  *
  * Determinism: every estimator is closed-form over per-group int64
  * moment sums (n, Σy, Σy², Σxy …) — the corpus collapses to the
  * per-user panel in ONE keyed agg (map-side partials on user_id),
  * then to a ≤20-cell group frame; no float crosses a row boundary
  * until the final means/ratios, which are identical IEEE trees in
  * both engines. Scale: user-keyed shuffle once; everything downstream
  * is constant-size (4 DiD cells, 2 IV arms, ≤17 n⁴-digit strata,
  * 2 RD sides).
  */
object Causal {

  /** Per-user experiment panel — ONE home for the family: variant
    * (user_id % 2), pre/post purchase cents, click/view counts. */
  private def panel(s: SparkSession, d: String): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val isPurchase = col("event_type") === "purchase"
    val preFlag = col("ts").cast(DateType) < to_date(lit("2024-01-16"))
    Tables.events(s, d)
      .groupBy(col("user_id"), (col("user_id") % 2).as("variant"))
      .agg(
        sum(when(isPurchase && preFlag, cents).otherwise(0L)).as("pre"),
        sum(when(isPurchase && !preFlag, cents).otherwise(0L)).as("post"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicks"),
        count(lit(1)).as("n_events"))
  }

  private val panelSql: String =
    """SELECT user_id, user_id % 2 AS variant,
      |       CAST(sum(CASE WHEN event_type = 'purchase'
      |                      AND CAST(date_trunc('day', ts) AS DATE) < DATE '2024-01-16'
      |                     THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
      |            AS BIGINT) AS pre,
      |       CAST(sum(CASE WHEN event_type = 'purchase'
      |                      AND CAST(date_trunc('day', ts) AS DATE) >= DATE '2024-01-16'
      |                     THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
      |            AS BIGINT) AS post,
      |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
      |       CAST(count(*) AS BIGINT) AS n_events
      |FROM events GROUP BY 1, 2""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // Panel difference-in-differences (round 16): the workhorse
    // quasi-experimental readout — does the treated cohort's pre→post
    // CHANGE exceed the control cohort's? Estimated on per-user first
    // differences d = post − pre (algebraically identical to the
    // four-cell DiD, and it hands the exact Welch-style SE for free:
    // se = sqrt(var_t/n_t + var_c/n_c) over the d's). Exact int64
    // moments (n, Σd, Σd²) per variant; means/variances/t only at the
    // end. d² ≤ (per-user cents)² and Σ is user-linear — the SF¹
    // headroom class.
    Q("q_did",
      s"""WITH u AS ($panelSql),
         |g AS (SELECT variant, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(post - pre) AS BIGINT) AS sd,
         |             CAST(sum((post - pre) * (post - pre)) AS BIGINT) AS qd,
         |             CAST(sum(pre) AS BIGINT) AS sp, CAST(sum(post) AS BIGINT) AS sq
         |      FROM u GROUP BY 1),
         |w AS (SELECT
         |        max(CASE WHEN variant = 1 THEN n END) AS nt,
         |        max(CASE WHEN variant = 0 THEN n END) AS nc,
         |        max(CASE WHEN variant = 1 THEN sd END) AS sdt,
         |        max(CASE WHEN variant = 0 THEN sd END) AS sdc,
         |        max(CASE WHEN variant = 1 THEN qd END) AS qdt,
         |        max(CASE WHEN variant = 0 THEN qd END) AS qdc,
         |        max(CASE WHEN variant = 1 THEN sp END) AS spt,
         |        max(CASE WHEN variant = 0 THEN sp END) AS spc,
         |        max(CASE WHEN variant = 1 THEN sq END) AS sqt,
         |        max(CASE WHEN variant = 0 THEN sq END) AS sqc
         |      FROM g),
         |f AS (SELECT nt, nc,
         |             CAST(sdt AS DOUBLE) / nt - CAST(sdc AS DOUBLE) / nc AS did,
         |             (CAST(qdt AS DOUBLE) - CAST(sdt AS DOUBLE) * sdt / nt) / (nt - 1.0) AS vt,
         |             (CAST(qdc AS DOUBLE) - CAST(sdc AS DOUBLE) * sdc / nc) / (nc - 1.0) AS vc,
         |             CAST(spt AS DOUBLE) / nt AS pre_t, CAST(sqt AS DOUBLE) / nt AS post_t,
         |             CAST(spc AS DOUBLE) / nc AS pre_c, CAST(sqc AS DOUBLE) / nc AS post_c
         |      FROM w)
         |SELECT CAST(nt AS BIGINT) AS n_treat, CAST(nc AS BIGINT) AS n_ctrl,
         |       ${Q.sqlR4("pre_t / 100")} AS pre_treat_usd,
         |       ${Q.sqlR4("post_t / 100")} AS post_treat_usd,
         |       ${Q.sqlR4("pre_c / 100")} AS pre_ctrl_usd,
         |       ${Q.sqlR4("post_c / 100")} AS post_ctrl_usd,
         |       ${Q.sqlR4("did / 100")} AS did_usd,
         |       CASE WHEN nt >= 2 AND nc >= 2
         |         THEN ${Q.sqlR4("sqrt(vt / nt + vc / nc) / 100")} END AS se_usd,
         |       CASE WHEN nt >= 2 AND nc >= 2 AND vt / nt + vc / nc > 0
         |         THEN ${Q.sqlR6("did / sqrt(vt / nt + vc / nc)")} END AS t_stat
         |FROM f""".stripMargin) { (s, d) =>
      val g = panel(s, d)
        .withColumn("d", col("post") - col("pre"))
        .groupBy("variant")
        .agg(count(lit(1)).as("n"), sum("d").as("sd"),
          sum(col("d") * col("d")).as("qd"),
          sum("pre").as("sp"), sum("post").as("sq"))
      val w = g.agg(
        max(when(col("variant") === 1, col("n"))).as("nt"),
        max(when(col("variant") === 0, col("n"))).as("nc"),
        max(when(col("variant") === 1, col("sd"))).as("sdt"),
        max(when(col("variant") === 0, col("sd"))).as("sdc"),
        max(when(col("variant") === 1, col("qd"))).as("qdt"),
        max(when(col("variant") === 0, col("qd"))).as("qdc"),
        max(when(col("variant") === 1, col("sp"))).as("spt"),
        max(when(col("variant") === 0, col("sp"))).as("spc"),
        max(when(col("variant") === 1, col("sq"))).as("sqt"),
        max(when(col("variant") === 0, col("sq"))).as("sqc"))
      val did = col("sdt").cast("double") / col("nt") -
        col("sdc").cast("double") / col("nc")
      val vt = (col("qdt").cast("double") -
        col("sdt").cast("double") * col("sdt") / col("nt")) / (col("nt") - lit(1.0))
      val vc = (col("qdc").cast("double") -
        col("sdc").cast("double") * col("sdc") / col("nc")) / (col("nc") - lit(1.0))
      w.select(col("nt").as("n_treat"), col("nc").as("n_ctrl"),
          Q.r4(col("spt").cast("double") / col("nt") / 100).as("pre_treat_usd"),
          Q.r4(col("sqt").cast("double") / col("nt") / 100).as("post_treat_usd"),
          Q.r4(col("spc").cast("double") / col("nc") / 100).as("pre_ctrl_usd"),
          Q.r4(col("sqc").cast("double") / col("nc") / 100).as("post_ctrl_usd"),
          Q.r4(did / 100).as("did_usd"),
          when(col("nt") >= 2 && col("nc") >= 2,
            Q.r4(sqrt(vt / col("nt") + vc / col("nc")) / 100)).as("se_usd"),
          when(col("nt") >= 2 && col("nc") >= 2 && vt / col("nt") + vc / col("nc") > 0,
            Q.r6(did / sqrt(vt / col("nt") + vc / col("nc")))).as("t_stat"))
    },

    // Instrumental-variable Wald/LATE estimator (round 16): when
    // exposure is self-selected (clicking), a random instrument
    // (the variant split) identifies the local average treatment
    // effect as the ratio of two intent-to-treat contrasts: LATE =
    // (ȳ₁−ȳ₀)/(x̄₁−x̄₀) — outcome contrast over first-stage contrast.
    // On this corpus the instrument is pure mechanics (user_id parity
    // does not move clicks), so the first stage is ~0 and the LATE is
    // reported ONLY when the first stage is non-zero — exactly the
    // weak-instrument discipline the estimator demands in production
    // (documented; the readout's value is the ITT + first-stage
    // decomposition, which is always defined). Exact int64 arm sums.
    Q("q_iv_wald",
      s"""WITH u AS ($panelSql),
         |g AS (SELECT variant, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(clicks) AS BIGINT) AS sx,
         |             CAST(sum(pre + post) AS BIGINT) AS sy
         |      FROM u GROUP BY 1),
         |w AS (SELECT
         |        max(CASE WHEN variant = 1 THEN n END) AS n1,
         |        max(CASE WHEN variant = 0 THEN n END) AS n0,
         |        max(CASE WHEN variant = 1 THEN sx END) AS sx1,
         |        max(CASE WHEN variant = 0 THEN sx END) AS sx0,
         |        max(CASE WHEN variant = 1 THEN sy END) AS sy1,
         |        max(CASE WHEN variant = 0 THEN sy END) AS sy0
         |      FROM g),
         |f AS (SELECT n1, n0,
         |             CAST(sx1 AS DOUBLE) / n1 - CAST(sx0 AS DOUBLE) / n0 AS first_stage,
         |             CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0 AS itt
         |      FROM w)
         |SELECT CAST(n1 AS BIGINT) AS n_encouraged, CAST(n0 AS BIGINT) AS n_baseline,
         |       ${Q.sqlR6("first_stage")} AS first_stage_clicks,
         |       ${Q.sqlR4("itt / 100")} AS itt_usd,
         |       CASE WHEN first_stage <> 0
         |         THEN ${Q.sqlR4("itt / first_stage / 100")} END AS late_usd_per_click
         |FROM f""".stripMargin) { (s, d) =>
      val g = panel(s, d).groupBy("variant")
        .agg(count(lit(1)).as("n"), sum("clicks").as("sx"),
          sum(col("pre") + col("post")).as("sy"))
      val w = g.agg(
        max(when(col("variant") === 1, col("n"))).as("n1"),
        max(when(col("variant") === 0, col("n"))).as("n0"),
        max(when(col("variant") === 1, col("sx"))).as("sx1"),
        max(when(col("variant") === 0, col("sx"))).as("sx0"),
        max(when(col("variant") === 1, col("sy"))).as("sy1"),
        max(when(col("variant") === 0, col("sy"))).as("sy0"))
      val fs = col("sx1").cast("double") / col("n1") -
        col("sx0").cast("double") / col("n0")
      val itt = col("sy1").cast("double") / col("n1") -
        col("sy0").cast("double") / col("n0")
      w.select(col("n1").as("n_encouraged"), col("n0").as("n_baseline"),
        Q.r6(fs).as("first_stage_clicks"),
        Q.r4(itt / 100).as("itt_usd"),
        when(fs =!= 0, Q.r4(itt / fs / 100)).as("late_usd_per_click"))
    },

    // Stratified (propensity-bucket) treatment effect (round 16): the
    // observational fallback — bucket users by activity magnitude
    // (the confounder proxy), compare treated vs control WITHIN each
    // stratum, and weight the per-stratum gaps by the treated counts
    // (the ATT convention). Stratum = decimal digit count of the
    // user's event total RAISED TO THE 4TH power — a pure INTEGER
    // banding (string length of an int64, identical in both engines;
    // the q_abc_class lesson: never float-log a band boundary) whose
    // boundaries fall every 10^(1/4) ≈ 1.78× of activity, so the
    // activity spectrum yields several strata instead of one; n⁴ of a
    // per-user event count stays far inside int64 (n ≤ 10⁴ → 10¹⁶).
    // ≤17 strata by construction. Per-stratum rows +
    // the ATT as a window over the ≤7-row frame; strata missing an
    // arm contribute rows but not weight (documented).
    Q("q_propensity_strata",
      s"""WITH u AS ($panelSql),
         |b AS (SELECT variant,
         |             length(CAST(n_events * n_events * n_events * n_events AS VARCHAR)) AS stratum,
         |             pre + post AS y FROM u),
         |g AS (SELECT stratum,
         |             CAST(coalesce(sum(CASE WHEN variant = 1 THEN 1 END), 0) AS BIGINT) AS nt,
         |             CAST(coalesce(sum(CASE WHEN variant = 0 THEN 1 END), 0) AS BIGINT) AS nc,
         |             CAST(coalesce(sum(CASE WHEN variant = 1 THEN y END), 0) AS BIGINT) AS st,
         |             CAST(coalesce(sum(CASE WHEN variant = 0 THEN y END), 0) AS BIGINT) AS sc
         |      FROM b GROUP BY 1),
         |e AS (SELECT stratum, nt, nc,
         |             CASE WHEN nt > 0 AND nc > 0
         |               THEN CAST(st AS DOUBLE) / nt - CAST(sc AS DOUBLE) / nc END AS gap
         |      FROM g),
         |f AS (SELECT *,
         |             sum(CASE WHEN gap IS NOT NULL THEN CAST(nt AS DOUBLE) * gap END) OVER ()
         |               / sum(CASE WHEN gap IS NOT NULL THEN nt END) OVER () AS att
         |      FROM e)
         |SELECT CAST(stratum AS BIGINT) AS stratum, nt AS n_treat, nc AS n_ctrl,
         |       CASE WHEN gap IS NOT NULL THEN ${Q.sqlR4("gap / 100")} END AS gap_usd,
         |       ${Q.sqlR4("att / 100")} AS att_usd
         |FROM f
         |ORDER BY stratum""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val g = panel(s, d)
        .select(col("variant"),
          length((col("n_events") * col("n_events") * col("n_events") * col("n_events"))
            .cast("string")).as("stratum"),
          (col("pre") + col("post")).as("y"))
        .groupBy("stratum")
        .agg(
          coalesce(sum(when(col("variant") === 1, 1L)), lit(0L)).as("nt"),
          coalesce(sum(when(col("variant") === 0, 1L)), lit(0L)).as("nc"),
          coalesce(sum(when(col("variant") === 1, col("y"))), lit(0L)).as("st"),
          coalesce(sum(when(col("variant") === 0, col("y"))), lit(0L)).as("sc"))
      val gap = when(col("nt") > 0 && col("nc") > 0,
        col("st").cast("double") / col("nt") - col("sc").cast("double") / col("nc"))
      val wAll = Window.partitionBy()
      g.withColumn("gap", gap)
        .withColumn("att",
          sum(when(col("gap").isNotNull, col("nt").cast("double") * col("gap"))).over(wAll) /
            sum(when(col("gap").isNotNull, col("nt"))).over(wAll))
        .select(col("stratum").cast("long").as("stratum"),
          col("nt").as("n_treat"), col("nc").as("n_ctrl"),
          when(col("gap").isNotNull, Q.r4(col("gap") / 100)).as("gap_usd"),
          Q.r4(col("att") / 100).as("att_usd"))
        .orderBy("stratum")
    },

    // Local-linear regression discontinuity (round 16): running
    // variable r = user_id % 1000, cutoff 500, bandwidth 100 — fit an
    // exact least-squares line on each side of the cutoff inside the
    // bandwidth and report the jump between the two intercepts AT the
    // cutoff. On this corpus the assignment is synthetic mechanics
    // (the jump is ~0 by construction — the null calibration a real
    // deployment validates against). Closed-form over int64 moment
    // sums (n, Σr, Σy, Σr², Σry) per side; r ≤ 1000 bounds every
    // cross term (Σry ≤ 1000·Σy — the SF¹ class). Degenerate sides
    // (n < 2 or zero r-variance) NULL the estimate in both engines.
    Q("q_rdd",
      s"""WITH u AS ($panelSql),
         |v AS (SELECT user_id % 1000 AS r, pre + post AS y,
         |             CASE WHEN user_id % 1000 >= 500 THEN 1 ELSE 0 END AS side
         |      FROM u
         |      WHERE user_id % 1000 >= 400 AND user_id % 1000 <= 600),
         |g AS (SELECT side, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(r) AS BIGINT) AS sr, CAST(sum(y) AS BIGINT) AS sy,
         |             CAST(sum(r * r) AS BIGINT) AS srr, CAST(sum(r * y) AS BIGINT) AS sry
         |      FROM v GROUP BY 1),
         |w AS (SELECT
         |        max(CASE WHEN side = 0 THEN n END) AS nl,
         |        max(CASE WHEN side = 1 THEN n END) AS nr,
         |        max(CASE WHEN side = 0 THEN sr END) AS srl,
         |        max(CASE WHEN side = 1 THEN sr END) AS srr_,
         |        max(CASE WHEN side = 0 THEN sy END) AS syl,
         |        max(CASE WHEN side = 1 THEN sy END) AS syr,
         |        max(CASE WHEN side = 0 THEN srr END) AS sqr_l,
         |        max(CASE WHEN side = 1 THEN srr END) AS sqr_r,
         |        max(CASE WHEN side = 0 THEN sry END) AS sxy_l,
         |        max(CASE WHEN side = 1 THEN sry END) AS sxy_r
         |      FROM g),
         |f AS (SELECT nl, nr,
         |             CASE WHEN nl >= 2 AND nl * sqr_l - srl * srl > 0
         |               THEN CAST(nl * sxy_l - srl * syl AS DOUBLE) / (nl * sqr_l - CAST(srl AS DOUBLE) * srl)
         |             END AS bl,
         |             CASE WHEN nr >= 2 AND nr * sqr_r - srr_ * srr_ > 0
         |               THEN CAST(nr * sxy_r - srr_ * syr AS DOUBLE) / (nr * sqr_r - CAST(srr_ AS DOUBLE) * srr_)
         |             END AS br,
         |             CAST(syl AS DOUBLE) / nl AS myl, CAST(srl AS DOUBLE) / nl AS mrl,
         |             CAST(syr AS DOUBLE) / nr AS myr, CAST(srr_ AS DOUBLE) / nr AS mrr
         |      FROM w)
         |SELECT CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
         |       CASE WHEN bl IS NOT NULL THEN ${Q.sqlR6("bl / 100")} END AS slope_left,
         |       CASE WHEN br IS NOT NULL THEN ${Q.sqlR6("br / 100")} END AS slope_right,
         |       CASE WHEN bl IS NOT NULL THEN ${Q.sqlR4("(myl + bl * (500 - mrl)) / 100")} END AS y_left_at_cutoff_usd,
         |       CASE WHEN br IS NOT NULL THEN ${Q.sqlR4("(myr + br * (500 - mrr)) / 100")} END AS y_right_at_cutoff_usd,
         |       CASE WHEN bl IS NOT NULL AND br IS NOT NULL
         |         THEN ${Q.sqlR4("((myr + br * (500 - mrr)) - (myl + bl * (500 - mrl))) / 100")} END AS rd_jump_usd
         |FROM f""".stripMargin) { (s, d) =>
      val v = panel(s, d)
        .select((col("user_id") % 1000).as("r"), (col("pre") + col("post")).as("y"))
        .filter(col("r") >= 400 && col("r") <= 600)
        .withColumn("side", when(col("r") >= 500, 1).otherwise(0))
      val g = v.groupBy("side")
        .agg(count(lit(1)).as("n"), sum("r").as("sr"), sum("y").as("sy"),
          sum(col("r") * col("r")).as("srr"), sum(col("r") * col("y")).as("sry"))
      val w = g.agg(
        max(when(col("side") === 0, col("n"))).as("nl"),
        max(when(col("side") === 1, col("n"))).as("nr"),
        max(when(col("side") === 0, col("sr"))).as("srl"),
        max(when(col("side") === 1, col("sr"))).as("srr_"),
        max(when(col("side") === 0, col("sy"))).as("syl"),
        max(when(col("side") === 1, col("sy"))).as("syr"),
        max(when(col("side") === 0, col("srr"))).as("sqr_l"),
        max(when(col("side") === 1, col("srr"))).as("sqr_r"),
        max(when(col("side") === 0, col("sry"))).as("sxy_l"),
        max(when(col("side") === 1, col("sry"))).as("sxy_r"))
      val bl = when(col("nl") >= 2 && col("nl") * col("sqr_l") - col("srl") * col("srl") > 0,
        (col("nl") * col("sxy_l") - col("srl") * col("syl")).cast("double") /
          (col("nl") * col("sqr_l") - col("srl").cast("double") * col("srl")))
      val br = when(col("nr") >= 2 && col("nr") * col("sqr_r") - col("srr_") * col("srr_") > 0,
        (col("nr") * col("sxy_r") - col("srr_") * col("syr")).cast("double") /
          (col("nr") * col("sqr_r") - col("srr_").cast("double") * col("srr_")))
      val myl = col("syl").cast("double") / col("nl")
      val mrl = col("srl").cast("double") / col("nl")
      val myr = col("syr").cast("double") / col("nr")
      val mrr = col("srr_").cast("double") / col("nr")
      w.withColumn("bl", bl).withColumn("br", br)
        .select(col("nl").as("n_left"), col("nr").as("n_right"),
          when(col("bl").isNotNull, Q.r6(col("bl") / 100)).as("slope_left"),
          when(col("br").isNotNull, Q.r6(col("br") / 100)).as("slope_right"),
          when(col("bl").isNotNull,
            Q.r4((myl + col("bl") * (lit(500) - mrl)) / 100)).as("y_left_at_cutoff_usd"),
          when(col("br").isNotNull,
            Q.r4((myr + col("br") * (lit(500) - mrr)) / 100)).as("y_right_at_cutoff_usd"),
          when(col("bl").isNotNull && col("br").isNotNull,
            Q.r4(((myr + col("br") * (lit(500) - mrr)) -
              (myl + col("bl") * (lit(500) - mrl))) / 100)).as("rd_jump_usd"))
    })
}
