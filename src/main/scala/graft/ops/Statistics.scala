package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Statistical-inference analytics (round-10 SURVEY §2 extensions):
  * least-squares trend fitting, hash-split A/B testing with a
  * chi-square statistic, per-group Gini concentration, and daily
  * mutual information between categorical columns.
  *
  * Determinism is the design center — each op is built so the numbers
  * the driver hashes cannot depend on double accumulation order:
  *  - q_trend_fit reduces to INTEGER sufficient statistics (Σx, Σy,
  *    Σxy, Σx², Σy² of day-index vs count are all exact in int64) and
  *    only divides at the end;
  *  - q_abtest derives everything from four integer cell counts;
  *  - q_mutual_info integer-scales each cell's contribution BEFORE the
  *    cross-cell sum, so the reduction is an int64 sum (order-free) —
  *    the one float op (ln) is per-cell, never accumulated;
  *  - q_gini's rank-weighted sum is the only true double reduction and
  *    lands under r6 with ~1e-11 worst-case order noise.
  *
  * Scale shapes: everything here aggregates onto FIXED-cardinality
  * keys (|event_types|×|days|, 2 variants, 5 priorities, |days|×20
  * cells) with map-side partials — shuffle volume is key-bounded, not
  * corpus-bounded. The one per-group sort (q_gini's rank window) is
  * the honest cost of exact Gini; the sketch path at 100 TB is a
  * quantile-histogram approximation (see q_agg_approx_pct).
  */
object Statistics {

  /** Day-index anchor for trend x values — events span Jan 2024. */
  private val TrendAnchor = "2024-01-01"

  /** The integerized 4-measure lineitem projection + its 15 sufficient
    * statistics (n, 4 sums, 4 squares, 6 cross-products) — ONE home for
    * the pass q_corr_matrix reshapes into pairs and q_pca_power feeds
    * into the power iteration. The bit-equality argument both operators
    * make (identical int64 inputs ⇒ identical doubles) depends on this
    * aggregate staying textually single-sourced. */
  private[ops] def lineitemMomentStats(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "lineitem").select(
        floor(col("l_quantity")).cast("long").as("q"),
        floor(col("l_extendedprice")).cast("long").as("p"),
        floor(col("l_discount") * 100 + 0.5).cast("long").as("d"),
        floor(col("l_tax") * 100 + 0.5).cast("long").as("t"))
      .agg(count(lit(1)).as("n"),
        sum("q").as("sq"), sum("p").as("sp"), sum("d").as("sd"), sum("t").as("st"),
        sum(col("q") * col("q")).as("qq"), sum(col("p") * col("p")).as("pp"),
        sum(col("d") * col("d")).as("dd"), sum(col("t") * col("t")).as("tt"),
        sum(col("q") * col("p")).as("qp"), sum(col("q") * col("d")).as("qd"),
        sum(col("q") * col("t")).as("qt"), sum(col("p") * col("d")).as("pd"),
        sum(col("p") * col("t")).as("pt"), sum(col("d") * col("t")).as("dt"))

  /** Pearson correlation from integer sufficient statistics — the ONE
    * double formula tree (same operand order as the oracle text) shared
    * by q_corr_matrix and q_pca_power. */
  private[ops] def corrCol(n: Column, sxy: Column, sx: Column, sy: Column,
                      sxx: Column, syy: Column): Column =
    (n * sxy.cast("double") - sx.cast("double") * sy) /
      (sqrt(n * sxx.cast("double") - sx.cast("double") * sx) *
        sqrt(n * syy.cast("double") - sy.cast("double") * sy))

  /** The three pooled-rank screens as folds over a (g, v100, c) value
    * grid — ONE home each, shared by the batch queries below and the
    * s_rank_grid streaming read-time views (streaming.Streams.rankGrid
    * maintains the grid incrementally; none of the statistics live in
    * state because ranks aren't mergeable — the int64 cell counts
    * are). All three keep the repo's exactness machinery: doubled
    * average ranks off the cumulative-below window, int64 rank sums
    * and tie terms, mirrored double trees at the end. */
  private[graft] def kruskalWallisOf(c: DataFrame): DataFrame = {
    val tv = c.groupBy("v100").agg(sum("c").as("t"))
    val wb = Window.orderBy("v100")
      .rowsBetween(Window.unboundedPreceding, -1)
    val tr = tv.select(col("v100"), col("t"),
      coalesce(sum("t").over(wb), lit(0L)).as("cb"))
    val gr = c.join(tr, "v100")
      .groupBy("g")
      .agg(sum("c").as("n_g"),
        sum(col("c") * (lit(2) * col("cb") + col("t") + 1)).as("r2"))
    val st = gr.agg(count(lit(1)).as("k"), sum("n_g").as("n"),
      sum(floor(col("r2").cast("double") * col("r2") / (lit(4.0) * col("n_g")) + 0.5)
        .cast("long")).as("b0"))
    val tc = tv.agg(sum(col("t") * col("t") * col("t") - col("t")).as("ties"))
    val h = lit(12.0) / (col("n") * (col("n") + lit(1.0))) * col("b0") -
      lit(3.0) * (col("n") + 1)
    st.crossJoin(broadcast(tc))
      .select(col("k"), col("n"),
        Q.r6(h).as("h"),
        // all mass in ONE cell ⇒ ties = n³−n exactly and the
        // correction denominator is 0 — NULL in both engines (the
        // dunnOf/friedmanOf guard, mirrored in the SQL twin)
        when(col("ties").cast("double") <
            col("n").cast("double") * col("n") * col("n") - col("n"),
          Q.r6(h / (lit(1.0) - col("ties").cast("double") /
            (col("n").cast("double") * col("n") * col("n") - col("n"))))).as("h_tie_adj"),
        Q.r6((h - col("k") + 1) / (col("n") - col("k"))).as("epsilon_sq"))
  }

  private[graft] def dunnOf(c: DataFrame): DataFrame = {
    val tv = c.groupBy("v100").agg(sum("c").as("t")).transform(Q.snapshot)
    val wb = Window.orderBy("v100")
      .rowsBetween(Window.unboundedPreceding, -1)
    val tr = tv.select(col("v100"), col("t"),
      coalesce(sum("t").over(wb), lit(0L)).as("cb"))
    val gr = c.join(tr, "v100")
      .groupBy("g")
      .agg(sum("c").as("n_g"),
        sum(col("c") * (lit(2) * col("cb") + col("t") + 1)).as("r2"))
      .transform(Q.snapshot)
    val st = gr.agg(sum("n_g").as("n"))
    val tc = tv.agg(sum(col("t") * col("t") * col("t") - col("t")).as("ties"))
    val a = gr.select(col("g").as("type_a"), col("n_g").as("n_a"), col("r2").as("r2a"))
    val b = gr.select(col("g").as("type_b"), col("n_g").as("n_b"), col("r2").as("r2b"))
    val vt = col("n") * (col("n") + 1) / lit(12.0) -
      col("ties") / (lit(12.0) * (col("n") - 1))
    val ra = col("r2a") / (lit(2.0) * col("n_a"))
    val rb = col("r2b") / (lit(2.0) * col("n_b"))
    a.join(broadcast(b), col("type_a") < col("type_b"))
      .crossJoin(broadcast(st)).crossJoin(broadcast(tc))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        Q.r6(ra).as("mean_rank_a"), Q.r6(rb).as("mean_rank_b"),
        when(col("n") > 1 && vt > 0,
          Q.r6((ra - rb) / sqrt(vt * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))))
          .as("z"))
      .orderBy("type_a", "type_b")
  }

  private[graft] def jonckheereOf(cIn: DataFrame): DataFrame = {
    val c = cIn.transform(Q.snapshot)
    val gr = c.select("g").distinct()
      .withColumn("j", row_number().over(Window.orderBy("g")).cast("long"))
    val dv = c.select("v100").distinct()
    val dense = gr.crossJoin(broadcast(dv))
      .join(c, Seq("g", "v100"), "left")
      .select(col("g"), col("j"), col("v100"), coalesce(col("c"), lit(0L)).as("c"))
    val wb = Window.partitionBy("g").orderBy("v100")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cb = dense.withColumn("below", coalesce(sum("c").over(wb), lit(0L)))
      .transform(Q.snapshot)
    val a = cb.select(col("j").as("ja"), col("v100"), col("c").as("ca"),
      col("below").as("belowa"))
    val b = cb.select(col("j").as("jb"), col("v100"), col("c").as("cbv"))
    val u = a.join(b, Seq("v100")).filter(col("ja") < col("jb"))
      .agg(sum(lit(2) * col("cbv") * col("belowa") + col("cbv") * col("ca"))
        .as("j2"))
    val n = c.groupBy("g").agg(sum("c").as("ng"))
      .agg(count(lit(1)).as("k"), sum("ng").as("nn"),
        sum(col("ng") * col("ng")).as("sn2"),
        sum(col("ng") * col("ng") * (lit(2) * col("ng") + 3)).as("sn23"))
    val varj = col("nn").cast("double") * col("nn") * (lit(2) * col("nn") + 3) -
      col("sn23")
    val jStat = col("j2") / lit(2.0)
    val mu = (col("nn") * col("nn") - col("sn2")) / lit(4.0)
    u.crossJoin(broadcast(n))
      .select(col("k").as("n_types"), col("nn").as("n"),
        Q.r6(jStat).as("j_stat"),
        when(col("k") >= 2 && varj > 0,
          Q.r6((jStat - mu) / sqrt(varj / lit(72.0)))).as("z"))
  }

  /** The Kolmogorov–Smirnov fold over a (v100, c1, c2) cents-grid
    * count frame — ONE home shared by batch q_ks_test and the
    * s_ks_test streaming read-time view (streaming.Streams.ksCells
    * maintains the grid incrementally; the max-gap statistic is not
    * mergeable — the cell counts are). Sample sizes are whole-frame
    * window aggregates over the bounded distinct-cents frame. */
  private[graft] def ksOf(cellsIn: DataFrame): DataFrame = {
    // no snapshot here: the grid feeds ONE window chain, and batch
    // q_ks_test's plan audit must see the v100 aggregate under the
    // single-partition exchange (a lineage cut would hide it); the
    // streaming call site snapshots its memory table before the fold
    val c = cellsIn
    val wv = Window.orderBy("v100").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c.withColumn("r1", sum("c1").over(wv))
      .withColumn("r2", sum("c2").over(wv))
      .withColumn("n1", sum("c1").over(Window.partitionBy()))
      .withColumn("n2", sum("c2").over(Window.partitionBy()))
      .withColumn("dev", abs(col("r1") * col("n2") - col("r2") * col("n1")))
      .withColumn("rn", row_number().over(Window.orderBy(col("dev").desc, col("v100"))))
      .filter(col("rn") === 1)
      .select(col("n1"), col("n2"),
        Q.r6(col("dev").cast("double") / (col("n1") * col("n2"))).as("ks_d"),
        (col("v100").cast("double") / 100).as("at_value"))
  }

  /** The Cramér–von Mises fold over the same (v100, c1, c2) grid —
    * ONE home shared by batch q_cramer_von_mises and the
    * s_cramer_von_mises streaming read-time view. Each pooled
    * observation's squared ECDF gap is integer-scaled to 1e-9 BEFORE
    * the cross-cell sum (order-free int64; per-term ≤ cell count —
    * OverflowHeadroomSpec row). */
  private[graft] def cvmOf(cellsIn: DataFrame): DataFrame = {
    // single window chain — same no-snapshot rationale as [[ksOf]]
    val c = cellsIn
    val wv = Window.orderBy("v100").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = c.withColumn("r1", sum("c1").over(wv))
      .withColumn("r2", sum("c2").over(wv))
      .withColumn("n1", sum("c1").over(Window.partitionBy()))
      .withColumn("n2", sum("c2").over(Window.partitionBy()))
    val gap = (col("r1") * col("n2") - col("r2") * col("n1")).cast("double") /
      (col("n1").cast("double") * col("n2"))
    val t = e.agg(max("n1").as("n1"), max("n2").as("n2"),
      sum(floor((col("c1") + col("c2")) * gap * gap * lit(1e9) + 0.5)
        .cast("long")).as("t9"))
    t.select(col("n1"), col("n2"),
      when(col("n1") > 0 && col("n2") > 0,
        Q.r6(col("n1").cast("double") * col("n2") /
          ((col("n1") + col("n2")).cast("double") * (col("n1") + col("n2"))) *
          (col("t9") / lit(1e9)))).as("t_stat"))
  }

  /** The OLS trend fold over a daily (event_type, x, y) count frame —
    * ONE home shared by batch q_trend_fit and the s_trend_fit
    * streaming read-time view: all five sufficient statistics are
    * exact int64 over the grid; the fit divides at the end. */
  private[graft] def trendFitOf(dailyIn: DataFrame): DataFrame = {
    val st = dailyIn.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val sxxN = col("n") * col("sxx") - col("sx") * col("sx")
    val sxyN = col("n") * col("sxy") - col("sx") * col("sy")
    st.select(col("event_type"), col("n"),
        Q.r6(sxyN.cast("double") / sxxN).as("slope"),
        Q.r6((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double") / sxxN)
          .as("intercept"),
        Q.r6((sxyN * sxyN).cast("double") /
          (sxxN * (col("n") * col("syy") - col("sy") * col("sy")))).as("r2"))
      .orderBy("event_type")
  }

  /** The purchase-vs-click cents grid behind the five two-sample
    * distribution screens (KS / CvM / W1 / AD / Cliff's δ) — ONE home
    * for the projection + groupBy all five batch queries and the
    * streaming ksCells state share: the corpus collapses to the
    * ≤|cents-domain| distinct-value frame in one map-side-partial agg
    * before any window touches it. */
  /** DuckDB twin of [[centsGrid]] — the shared `v`/`c` CTE prefix
    * every cents-grid oracle opens with (13 users at r15). ONE home:
    * a change to the cents rounding or the purchase/click filter
    * lands everywhere or nowhere (the TextPipeline.LshPairCtes
    * discipline). */
  private[ops] val CentsGridSql: String =
    """v AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v100,
      |                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1,
      |                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g2
      |           FROM events WHERE event_type IN ('purchase', 'click')),
      |c AS (SELECT v100, CAST(sum(g1) AS BIGINT) AS c1, CAST(sum(g2) AS BIGINT) AS c2
      |      FROM v GROUP BY 1)""".stripMargin

  private[graft] def centsGrid(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "click"))
      .select(floor(col("value") * 100 + 0.5).cast("long").as("v100"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("g1"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("g2"))
      .groupBy("v100").agg(sum("g1").as("c1"), sum("g2").as("c2"))

  /** The 1-D Wasserstein (earth-mover) fold over the same (v100, c1,
    * c2) grid — ONE home shared by batch q_wasserstein_1d and the
    * s_wasserstein streaming read-time view. W1 = ∫|F1−F2| collapses
    * onto Σ|r1·n2 − r2·n1|·(next_v − v), an EXACT int64 reduction
    * (each term ≤ n1·n2·cell-width; OverflowHeadroomSpec row) — the
    * one division happens on the final sum. */
  private[graft] def w1Of(cellsIn: DataFrame): DataFrame = {
    // single window chain — same no-snapshot rationale as [[ksOf]]
    val c = cellsIn
    val wv = Window.orderBy("v100").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = c.withColumn("r1", sum("c1").over(wv))
      .withColumn("r2", sum("c2").over(wv))
      .withColumn("n1", sum("c1").over(Window.partitionBy()))
      .withColumn("n2", sum("c2").over(Window.partitionBy()))
      .withColumn("nxt", lead("v100", 1).over(Window.orderBy("v100")))
    val t = e.agg(max("n1").as("n1"), max("n2").as("n2"),
      coalesce(sum(when(col("nxt").isNotNull,
        abs(col("r1") * col("n2") - col("r2") * col("n1")) *
          (col("nxt") - col("v100")))), lit(0L)).as("tw"))
    t.select(col("n1"), col("n2"),
      when(col("n1") > 0 && col("n2") > 0,
        Q.r6(col("tw").cast("double") /
          (col("n1").cast("double") * col("n2") * 100))).as("w1"))
  }

  /** The two-sample Anderson–Darling fold over the same (v100, c1, c2)
    * grid — ONE home shared by batch q_anderson_darling and the
    * s_anderson_darling streaming read-time view. The k=2
    * Scholz–Stephens cell term collapses onto ONE cross-product:
    * N·r_a − n_a·B shares |D| = |n2·r1 − n1·r2| for both samples, so
    * A² = Σ m·D²/(n1·n2·B·(N−B)) over cells below the last (B < N).
    * D is exact int64 and exact again as a double while |D| < 2^53
    * (n1·n2 ≤ 9e15 ⇒ sf ≲ 470 — far above the claimed ceiling); each
    * cell's contribution floors onto the 1e-9 lattice BEFORE the
    * cross-cell sum (order-free int64; OverflowHeadroomSpec row). */
  private[graft] def adOf(cellsIn: DataFrame): DataFrame = {
    // single window chain — same no-snapshot rationale as [[ksOf]]
    val c = cellsIn
    val wv = Window.orderBy("v100").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = c.withColumn("r1", sum("c1").over(wv))
      .withColumn("r2", sum("c2").over(wv))
      .withColumn("n1", sum("c1").over(Window.partitionBy()))
      .withColumn("n2", sum("c2").over(Window.partitionBy()))
    val bb = col("r1") + col("r2")
    val nn = col("n1") + col("n2")
    val dd = (col("n2") * col("r1") - col("n1") * col("r2")).cast("double")
    val contrib = (col("c1") + col("c2")).cast("double") * dd * dd /
      (col("n1").cast("double") * col("n2") *
        (bb * (nn - bb)).cast("double"))
    val t = e.agg(max("n1").as("n1"), max("n2").as("n2"),
      coalesce(sum(when(bb < nn,
        floor(contrib * lit(1e9) + 0.5).cast("long"))), lit(0L)).as("t9"))
    t.select(col("n1"), col("n2"),
      when(col("n1") > 0 && col("n2") > 0,
        Q.r6(col("t9") / lit(1e9))).as("a2"))
  }

  /** The Hellinger fold over the same (v100, c1, c2) grid — ONE home
    * shared by batch q_hellinger and the s_hellinger streaming
    * read-time view. The PMF member of the two-sample family: the
    * Bhattacharyya coefficient BC = Σ√(p·q) sums per-CELL mass overlap
    * (CDF members integrate gaps), H² = 1 − BC. Each cell's
    * √(c1·c2)/(√n1·√n2) term floors onto the 1e-9 lattice BEFORE the
    * order-free int64 sum; BC ≤ 1 so the accumulator is const-bounded. */
  private[graft] def hellingerOf(cellsIn: DataFrame): DataFrame = {
    // single window chain — same no-snapshot rationale as [[ksOf]]
    val c = cellsIn
    val e = c.withColumn("n1", sum("c1").over(Window.partitionBy()))
      .withColumn("n2", sum("c2").over(Window.partitionBy()))
    val term = sqrt(col("c1").cast("double") * col("c2")) /
      (sqrt(col("n1").cast("double")) * sqrt(col("n2").cast("double")))
    val t = e.agg(max("n1").as("n1"), max("n2").as("n2"),
      coalesce(sum(floor(term * lit(1e9) + 0.5).cast("long")), lit(0L)).as("bc9"))
    t.select(col("n1"), col("n2"),
      when(col("n1") > 0 && col("n2") > 0,
        Q.r6(col("bc9") / lit(1e9))).as("bhattacharyya"),
      when(col("n1") > 0 && col("n2") > 0,
        Q.r6(lit(1) - col("bc9") / lit(1e9))).as("hellinger_sq"))
  }

  /** The energy-distance fold over the same (v100, c1, c2) grid — ONE
    * home shared by batch q_energy_dist and the s_energy_dist
    * streaming read-time view. In 1-D every pairwise expectation
    * collapses onto a CDF integral — E|X−Y| = ∫ F1(1−F2) + F2(1−F1) —
    * so D = 2·E|XY| − E|XX| − E|YY| needs THREE exact int64 segment
    * sums over the grid (terms ≤ n1·n2·cell-width, the q_wasserstein_1d
    * bound), never an O(cells²) pair expansion. The three divisions
    * happen on the final sums. */
  private[graft] def energyOf(cellsIn: DataFrame): DataFrame = {
    // single window chain — same no-snapshot rationale as [[ksOf]]
    val c = cellsIn
    val wv = Window.orderBy("v100").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = c.withColumn("r1", sum("c1").over(wv))
      .withColumn("r2", sum("c2").over(wv))
      .withColumn("n1", sum("c1").over(Window.partitionBy()))
      .withColumn("n2", sum("c2").over(Window.partitionBy()))
      .withColumn("w", lead("v100", 1).over(Window.orderBy("v100")) - col("v100"))
    // the w-is-null last cell contributes nothing but stays in the agg
    // so a single-cell grid still reports its n1/n2
    val t = e.agg(max("n1").as("n1"), max("n2").as("n2"),
      coalesce(sum(when(col("w").isNotNull,
        col("w") * (col("r1") * (col("n2") - col("r2")) +
          col("r2") * (col("n1") - col("r1"))))), lit(0L)).as("axy"),
      coalesce(sum(when(col("w").isNotNull,
        col("w") * lit(2) * col("r1") * (col("n1") - col("r1")))), lit(0L)).as("bxx"),
      coalesce(sum(when(col("w").isNotNull,
        col("w") * lit(2) * col("r2") * (col("n2") - col("r2")))), lit(0L)).as("cyy"))
    t.select(col("n1"), col("n2"),
      when(col("n1") > 0 && col("n2") > 0,
        Q.r6((lit(2) * col("axy").cast("double") /
            (col("n1").cast("double") * col("n2")) -
          col("bxx").cast("double") / (col("n1").cast("double") * col("n1")) -
          col("cyy").cast("double") / (col("n2").cast("double") * col("n2"))) /
          lit(100.0))).as("energy_d"))
  }

  /** Doubled-midrank sufficient statistics over a (v100, c1, c2)
    * grid — (n1, n2, r1x2 = 2·R1, ties = Σ(t³−t)), all exact int64.
    * The ONE home of the rank-sum machinery both mwOf and aucOf
    * consume (AUC IS U/(n1·n2), so the two must share the fold). */
  private def rankSumStats(c: DataFrame): DataFrame = {
    // single window chain — same no-snapshot rationale as [[ksOf]]
    val wb = Window.orderBy("v100")
      .rowsBetween(Window.unboundedPreceding, -1)
    c.select(col("c1"), col("c2"), (col("c1") + col("c2")).as("t"),
        coalesce(sum(col("c1") + col("c2")).over(wb), lit(0L)).as("cb"))
      .agg(sum("c1").as("n1"), sum("c2").as("n2"),
        sum(col("c1") * (lit(2) * col("cb") + col("t") + 1)).as("r1x2"),
        sum(col("t") * col("t") * col("t") - col("t")).as("ties"))
  }

  /** The Mann–Whitney fold over the same (v100, c1, c2) grid — ONE
    * home shared by batch q_mann_whitney and the s_mann_whitney
    * streaming read-time view. Doubled average ranks (2·cb + t + 1 per
    * tie run) keep every rank sum exact int64; U, z and the
    * rank-biserial divide out at the end. */
  private[graft] def mwOf(cellsIn: DataFrame): DataFrame = {
    val t = rankSumStats(cellsIn)
    val twoU = col("r1x2") - col("n1") * (col("n1") + 1) -
      col("n1").cast("double") * col("n2")
    // one all-tied run ⇒ the tie-corrected variance is exactly 0 and
    // z is 0/0 (NaN in Spark, NULL in DuckDB) — guard like dunnOf/
    // wilcoxonOf, same formula tree factored once
    val varU = col("n1").cast("double") * col("n2") / lit(12.0) *
      ((col("n1") + col("n2") + 1) - col("ties").cast("double") /
        ((col("n1") + col("n2")).cast("double") * (col("n1") + col("n2") - 1)))
    t.select(col("n1"), col("n2"),
      Q.r6((col("r1x2") - col("n1") * (col("n1") + 1)) / lit(2.0)).as("u1"),
      when(varU > 0, Q.r6(twoU / (lit(2.0) * sqrt(varU)))).as("z"),
      Q.r6(twoU / (col("n1").cast("double") * col("n2"))).as("rank_biserial"))
  }

  /** The Ansari–Bradley fold over the same (v100, c1, c2) grid — ONE
    * home shared by batch q_ansari_bradley and the s_ansari_bradley
    * streaming read-time view: the two-sample SCALE test next to
    * mwOf's location test (same grid, same running-count window). The
    * AB score of position i is min(i, N+1−i) — small at both tails —
    * so a dispersed group collects a SMALL score sum. Tie runs take
    * the exact average score via the closed-form prefix
    * f(x) = Σ_{i≤x} min(i, N+1−i) (pure integer-valued arithmetic,
    * identical CASE tree in both engines); each run's group-1 share
    * c1·(f(cb+t)−f(cb))/t floors onto a 1e-3 lattice before the
    * order-free int64 fold (granularity 1e-3 absolute on a statistic
    * of magnitude N²/8; ab3 ∝ SF²·1e3 — headroom row claims sf ≤ 200).
    * z uses the classical no-tie moments (documented approximation
    * under ties — identical in both engines, the q_page_trend move). */
  private[graft] def abOf(cellsIn: DataFrame): DataFrame = {
    val c = cellsIn
    val wb = Window.orderBy("v100").rowsBetween(Window.unboundedPreceding, -1)
    val e = c.select(col("c1"), (col("c1") + col("c2")).as("t"),
        coalesce(sum(col("c1") + col("c2")).over(wb), lit(0L)).as("cb"))
      .withColumn("nn", sum("t").over(Window.partitionBy()))
    // f(x) = Σ_{i=1..x} min(i, N+1−i): x(x+1)/2 up to the peak h =
    // ⌊(N+1)/2⌋, then the mirrored descending tail — integer-valued
    // doubles throughout (exact in IEEE far past any claimed SF)
    def f(x: Column, n: Column): Column = {
      val h = floor((n + 1) / lit(2.0))
      when(x <= h, x * (x + 1) / lit(2.0))
        .otherwise(h * (h + 1) / lit(2.0) +
          ((n - h) * (n - h + 1) - (n - x) * (n - x + 1)) / lit(2.0))
    }
    val sRun = f(col("cb") + col("t"), col("nn")) - f(col("cb"), col("nn"))
    val t = e
      .withColumn("ab3",
        floor(col("c1") * sRun / col("t") * lit(1e3) + 0.5).cast("long"))
      .agg(sum("c1").as("n1"), (max("nn") - sum("c1")).as("n2"),
        coalesce(sum("ab3"), lit(0L)).as("ab3"))
    val n1 = col("n1").cast("double")
    val n2 = col("n2").cast("double")
    val nn = col("n1") + col("n2")
    val even = nn % 2 === 0
    val mu = when(even, n1 * (nn + 2) / lit(4.0))
      .otherwise(n1 * (nn + 1) * (nn + 1) / (lit(4.0) * nn))
    val varAb = when(even,
      n1 * n2 * (nn + 2) * (nn - 2) / (lit(48.0) * (nn - 1)))
      .otherwise(n1 * n2 * (nn + 1) * (lit(3.0) + nn.cast("double") * nn) /
        (lit(48.0) * nn * nn))
    t.select(col("n1"), col("n2"),
      Q.r6(col("ab3") / lit(1e3)).as("ab"),
      when(col("n1") > 0 && col("n2") > 0 && varAb > 0,
        Q.r6((col("ab3") / lit(1e3) - mu) / sqrt(varAb))).as("z"))
  }

  /** The Brunner–Munzel fold over the same (v100, c1, c2) grid — ONE
    * home shared by batch q_brunner_munzel and the s_brunner_munzel
    * streaming read-time view: the heteroscedastic replacement for
    * mwOf when the two groups differ in spread (the classical MW z
    * assumes exchangeable variances; BM studentizes with per-group
    * rank variances and a Welch-type df). Every rank quantity rides
    * doubled midranks (overall r2 = 2cb+t+1; within-group r2wᵢ =
    * 2cbᵢ+cᵢ+1) so the deviation d = (r2−r2w)/2 + (nᵢ+1)/2 − R̄ᵢ is
    * ONE IEEE tree over exact int64; each cell's c·d² floors onto the
    * 1e3 lattice (r16, matching the sibling ab3 fold — the unit
    * lattice committed up to 0.5 per grid cell, invisibly to the
    * oracle since both engines shared it) before an order-free
    * DECIMAL(38,0) fold (r17: u ≤ N³·1e3, the q_spearman growth class,
    * was the repo's tightest int64 ceiling at sf ≤ 0.4 — the decimal
    * width lifts the cliff ~19 decades while staying exact, since
    * double→decimal conversion and decimal addition never round). */
  /** The (cells → doubled-midrank deviation) frame under [[bmOf]] —
    * per grid row: both running counts, overall/within doubled
    * midranks, the window totals, and the per-group deviations d1/d2.
    * Exposed so OverflowHeadroomSpec's q_brunner_munzel probe audits
    * the SAME arithmetic the fold accumulates (a probe that
    * re-implemented the pipeline would keep auditing stale math). */
  private[graft] def bmDevFrame(cellsIn: DataFrame): DataFrame = {
    val wb = Window.orderBy("v100").rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
    cellsIn.select(col("c1"), col("c2"), (col("c1") + col("c2")).as("t"),
        coalesce(sum(col("c1") + col("c2")).over(wb), lit(0L)).as("cb"),
        coalesce(sum("c1").over(wb), lit(0L)).as("cb1"),
        coalesce(sum("c2").over(wb), lit(0L)).as("cb2"))
      .withColumn("r2c", lit(2) * col("cb") + col("t") + 1)
      .withColumn("n1", sum("c1").over(wAll))
      .withColumn("n2", sum("c2").over(wAll))
      .withColumn("rx2", sum(col("c1") * col("r2c")).over(wAll))
      .withColumn("ry2", sum(col("c2") * col("r2c")).over(wAll))
      // n > 0 guards (r16, ADVICE): on a corpus with zero purchase (or
      // click) events rx2/(2·n1) is 0/0 = NaN — Spark's floor+cast
      // yields NULL while DuckDB raises on CAST(floor(NaN) AS BIGINT),
      // so the engines would diverge on a degenerate input instead of
      // both emitting NULL-backed rows. The guard is mirrored as CASE
      // WHEN in the oracle twin.
      .withColumn("d1", when(col("n1") > 0,
        (col("r2c") - (lit(2) * col("cb1") + col("c1") + 1)) / lit(2.0) +
          (col("n1") + 1) / lit(2.0) - col("rx2") / (lit(2.0) * col("n1"))))
      .withColumn("d2", when(col("n2") > 0,
        (col("r2c") - (lit(2) * col("cb2") + col("c2") + 1)) / lit(2.0) +
          (col("n2") + 1) / lit(2.0) - col("ry2") / (lit(2.0) * col("n2"))))
  }

  private[graft] def bmOf(cellsIn: DataFrame): DataFrame = {
    val e = bmDevFrame(cellsIn)
    val d1 = col("d1")
    val d2 = col("d2")
    // u1/u2 ride DECIMAL(38,0), not int64 (r17): the c·d² tie-run sums
    // grow ∝ N³·1e3 — the repo's tightest int64 ceiling (sf ≤ 0.4).
    // The decimal fold is still order-free and engine-exact (each cell
    // floors the SAME IEEE double; double→decimal is exact; decimal
    // sums don't round) and lifts the overflow cliff to the 1e38
    // width. Past 2^53 the per-cell lattice GRANULARITY coarsens to
    // ULP size — identically in both engines (the header note in
    // OverflowHeadroomSpec), so parity survives any realistic SF.
    val t = e.agg(max("n1").as("n1"), max("n2").as("n2"),
      max("rx2").as("rx2"), max("ry2").as("ry2"),
      coalesce(sum(floor(col("c1") * d1 * d1 * lit(1e3) + 0.5).cast("decimal(38,0)")),
        lit(0L)).as("u1"),
      coalesce(sum(floor(col("c2") * d2 * d2 * lit(1e3) + 0.5).cast("decimal(38,0)")),
        lit(0L)).as("u2"))
    val nn = col("n1") + col("n2")
    val rbar1 = col("rx2") / (lit(2.0) * col("n1"))
    val rbar2 = col("ry2") / (lit(2.0) * col("n2"))
    val s1 = col("u1") / lit(1e3) / (col("n1") - lit(1.0))
    val s2 = col("u2") / lit(1e3) / (col("n2") - lit(1.0))
    val v = col("n1") * s1 + col("n2") * s2
    val dfDen = (col("n1") * s1) * (col("n1") * s1) / (col("n1") - lit(1.0)) +
      (col("n2") * s2) * (col("n2") * s2) / (col("n2") - lit(1.0))
    t.select(col("n1"), col("n2"),
      when(col("n1") > 0 && col("n2") > 0,
        Q.r6((rbar2 - (col("n2") + 1) / lit(2.0)) / col("n1"))).as("p_hat"),
      when(col("n1") >= 2 && col("n2") >= 2 && v > 0,
        Q.r6(col("n1") * col("n2") * (rbar2 - rbar1) / nn / sqrt(v))).as("w"),
      when(col("n1") >= 2 && col("n2") >= 2 && dfDen > 0,
        Q.r2(v * v / dfDen)).as("df"))
  }

  /** The power-analysis fold over the same (v100, c1, c2) grid — ONE
    * home shared by batch q_power_analysis and the s_power_analysis
    * streaming read-time view: per-group moments derive EXACTLY from
    * the cell counts (Σ c·v100 and Σ c·v100² equal the raw-row sums),
    * so the planning readout rides the same mergeable state as the
    * eight distribution screens. */
  private[graft] def powerOf(cellsIn: DataFrame): DataFrame = {
    val p = cellsIn.agg(
      sum("c1").as("n1"), sum(col("c1") * col("v100")).as("s1"),
      sum(col("c1") * col("v100") * col("v100")).as("ss1"),
      sum("c2").as("n2"), sum(col("c2") * col("v100")).as("s2"),
      sum(col("c2") * col("v100") * col("v100")).as("ss2"))
    val delta = col("s1").cast("double") / col("n1") - col("s2").cast("double") / col("n2")
    val var2 = ((col("ss1").cast("double") - col("s1").cast("double") * col("s1") / col("n1")) /
        (col("n1") - 1) +
      (col("ss2").cast("double") - col("s2").cast("double") * col("s2") / col("n2")) /
        (col("n2") - 1)) / 2
    // n>=2 per arm or the (n-1) variance divisor is 0/negative-free
    // garbage: Spark would emit Infinity/NaN where DuckDB's 0-division
    // yields NULL — the guard makes both engines answer NULL, the
    // pairedTOf/gumbelOf convention
    val ok = col("n1") >= 2 && col("n2") >= 2
    p.select(col("n1"), col("n2"),
      when(col("n1") >= 1 && col("n2") >= 1, Q.r6(delta / 100)).as("observed_delta"),
      when(ok, Q.r6(sqrt(var2) / 100)).as("pooled_sd"),
      when(ok && delta =!= 0,
        ceil(lit(2) * var2 * ((lit(1.959964) + 0.841621) * (lit(1.959964) + 0.841621)) /
          (delta * delta)).cast("long")).as("n_required_per_arm"))
  }

  /** Exact ROC-AUC over the same (v100, c1, c2) grid — ONE home shared
    * by batch q_auc_roc and the s_auc_roc streaming read-time view.
    * AUC = P(s⁺ > s⁻) + ½·P(tie) IS the Mann–Whitney U normalized by
    * n1·n2, so it rides [[rankSumStats]]' doubled-midrank machinery
    * verbatim: AUC = (r1x2 − n1·(n1+1)) / (2·n1·n2) — integer to the
    * last bit before the ONE division. Gini (accuracy ratio) =
    * 2·AUC − 1. Positives = purchases, negatives = clicks, score =
    * the cents value. */
  private[graft] def aucOf(cellsIn: DataFrame): DataFrame = {
    val t = rankSumStats(cellsIn)
    val auc = (col("r1x2") - col("n1") * (col("n1") + 1)) /
      (lit(2.0) * (col("n1").cast("double") * col("n2")))
    val okA = col("n1") > 0 && col("n2") > 0
    t.select(col("n1"), col("n2"),
      when(okA, Q.r6(auc)).as("auc"),
      when(okA, Q.r6(lit(2.0) * auc - 1)).as("gini"))
  }

  /** Average precision (PR-AUC) over the same grid — ONE home shared
    * by batch q_pr_auc and the s_pr_auc streaming read-time view.
    * Tied-score blocks arrive TOGETHER in descending cents order and
    * precision is measured at block END — the deterministic tie
    * convention (a micro-ordering inside a tie run would be
    * arbitrary): AP = Σ_blocks c1·(cum1/cumt) / n1. Each block's
    * c1·precision floors onto the 1e-6 lattice BEFORE the order-free
    * int64 sum (Σ ≤ 1e6·n1 — linear headroom, OverflowHeadroomSpec
    * row); prevalence n1/N rides along as the AP baseline. */
  private[graft] def prAucOf(cellsIn: DataFrame): DataFrame = {
    val wd = Window.orderBy(col("v100").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = cellsIn.select(col("c1"), col("c2"),
      sum("c1").over(wd).as("cum1"),
      sum(col("c1") + col("c2")).over(wd).as("cumt"))
    val t = r.agg(sum("c1").as("n1"), sum("c2").as("n2"),
      sum(floor(col("c1").cast("double") * col("cum1") / col("cumt") * 1e6 + 0.5)
        .cast("long")).as("ap6"))
    t.select(col("n1"), col("n2"),
      when(col("n1") > 0,
        Q.r6(col("ap6").cast("double") / (col("n1") * lit(1e6)))).as("pr_auc"),
      when(col("n1") + col("n2") > 0,
        Q.r6(col("n1").cast("double") / (col("n1") + col("n2")))).as("prevalence"))
  }

  /** Confusion matrix + threshold metrics over the same grid — ONE
    * home shared by batch q_confusion_matrix and the s_confusion
    * streaming read-time view. Predicted-positive is the INTEGER
    * comparison v100·2 ≥ mx (score ≥ half the range — no float ever
    * touches the decision boundary), so TP/FP/FN/TN are pure int64
    * conditional sums; precision/recall/F1/accuracy/MCC divide out at
    * the end, NULL-guarded on their zero margins. */
  private[graft] def confusionOf(cellsIn: DataFrame): DataFrame = {
    val cw = cellsIn.withColumn("mx", max("v100").over(Window.partitionBy()))
    val pos = col("v100") * 2 >= col("mx")
    val t = cw.agg(
      sum(when(pos, col("c1")).otherwise(0L)).as("tp"),
      sum(when(!pos, col("c1")).otherwise(0L)).as("fn"),
      sum(when(pos, col("c2")).otherwise(0L)).as("fp"),
      sum(when(!pos, col("c2")).otherwise(0L)).as("tn"))
    val n = col("tp") + col("fp") + col("fn") + col("tn")
    val mccDen = sqrt((col("tp") + col("fp")).cast("double") * (col("tp") + col("fn")) *
      (col("tn") + col("fp")) * (col("tn") + col("fn")))
    t.select(col("tp"), col("fp"), col("fn"), col("tn"),
      when(col("tp") + col("fp") > 0,
        Q.r6(col("tp").cast("double") / (col("tp") + col("fp")))).as("precision"),
      when(col("tp") + col("fn") > 0,
        Q.r6(col("tp").cast("double") / (col("tp") + col("fn")))).as("recall"),
      when(lit(2) * col("tp") + col("fp") + col("fn") > 0,
        Q.r6(lit(2.0) * col("tp") / (lit(2) * col("tp") + col("fp") + col("fn")))).as("f1"),
      when(n > 0, Q.r6((col("tp") + col("tn")).cast("double") / n)).as("accuracy"),
      when((col("tp") + col("fp")) > 0 && (col("tp") + col("fn")) > 0 &&
          (col("tn") + col("fp")) > 0 && (col("tn") + col("fn")) > 0,
        Q.r6((col("tp").cast("double") * col("tn") -
          col("fp").cast("double") * col("fn")) / mccDen)).as("mcc"))
  }

  /** Fixed-width calibration bins over the same grid — the shared
    * frame under q_brier and q_calibration (and their streaming
    * faces). Scores normalize to s = v100/mx (mx = the grid's max
    * cents — a broadcast-scalar window over the bounded cell frame);
    * bin = ⌊s·10⌋ capped at 9 — RANGE deciles, not quantiles, so the
    * binning needs no rank machinery and is engine-exact (v100·10/mx
    * hits an integer boundary only when mx divides v100·10, where
    * IEEE division is exact in both engines). Per bin: n, positives,
    * Σ(c·v100) (for the mean predicted score) and the pre-binned
    * Brier cell sum Σ⌊(c1·(s−1)² + c2·s²)·1e6⌉ — every cross-row
    * reduction int64. */
  private def calibCells(cellsIn: DataFrame, withBrier: Boolean): DataFrame = {
    val cw = cellsIn.withColumn("mx", max("v100").over(Window.partitionBy()))
    val s = col("v100").cast("double") / col("mx")
    val base = Seq(col("c1"), col("c2"), col("v100"), col("mx"),
      least(floor(col("v100") * 10 / col("mx")), lit(9.0)).cast("long").as("bin"))
    // the Brier cell term is opt-in: q_calibration/s_calibration never
    // read it, so they skip the per-cell floor + multiplies entirely
    val cols = if (withBrier)
      base :+ floor((col("c1") * (s - 1) * (s - 1) + col("c2") * s * s) * 1e6 + 0.5)
        .cast("long").as("bs6")
    else base
    val aggs = Seq(max("mx").as("mx"),
      sum(col("c1") + col("c2")).as("nb"), sum("c1").as("pb"),
      sum((col("c1") + col("c2")) * col("v100")).as("svb")) ++
      (if (withBrier) Seq(sum("bs6").as("bs6")) else Nil)
    cw.select(cols: _*).groupBy("bin").agg(aggs.head, aggs.tail: _*)
  }

  /** Brier score + its binned decomposition over the same grid — ONE
    * home shared by batch q_brier and the s_brier streaming read-time
    * view. BS = Σ cells [c1·(s−1)² + c2·s²]/N on the 1e-6 lattice;
    * reliability/resolution are the Murphy decomposition over the 10
    * fixed-width [[calibCells]] bins (Σ nb·(s̄b−ȳb)² / N and
    * Σ nb·(ȳb−ȳ)² / N, per-bin terms latticed before the ≤10-row
    * sum), uncertainty = ȳ(1−ȳ). The binned rel−res+unc reconstructs
    * BS only up to within-bin variance — documented, both engines
    * compute the same four numbers. */
  private[graft] def brierOf(cellsIn: DataFrame): DataFrame = {
    val b = calibCells(cellsIn, withBrier = true)
      .withColumn("n", sum("nb").over(Window.partitionBy()))
      .withColumn("n1", sum("pb").over(Window.partitionBy()))
    val sb = col("svb").cast("double") / (col("nb") * col("mx"))
    val yb = col("pb").cast("double") / col("nb")
    val y = col("n1").cast("double") / col("n")
    val t = b.select(col("n"), col("n1"), col("bs6"),
        floor(col("nb") * (sb - yb) * (sb - yb) * 1e6 + 0.5).cast("long").as("rel6"),
        floor(col("nb") * (yb - y) * (yb - y) * 1e6 + 0.5).cast("long").as("res6"))
      .groupBy("n", "n1")
      .agg(sum("bs6").as("bs6"), sum("rel6").as("rel6"), sum("res6").as("res6"))
    val y2 = col("n1").cast("double") / col("n")
    t.select(col("n"), col("n1"),
      when(col("n") > 0, Q.r6(col("bs6").cast("double") / (col("n") * lit(1e6)))).as("brier"),
      when(col("n") > 0, Q.r6(col("rel6").cast("double") / (col("n") * lit(1e6)))).as("reliability"),
      when(col("n") > 0, Q.r6(col("res6").cast("double") / (col("n") * lit(1e6)))).as("resolution"),
      when(col("n") > 0, Q.r6(y2 * (lit(1) - y2))).as("uncertainty"))
  }

  /** Reliability table + ECE over the same grid — ONE home shared by
    * batch q_calibration and the s_calibration streaming read-time
    * view: per fixed-width score bin the mean predicted score and the
    * observed positive rate, plus the expected calibration error
    * ECE = Σ nb·|s̄b−ȳb| / N (per-bin terms latticed, the global sum
    * a window over the ≤10-bin frame). */
  private[graft] def calibrationOf(cellsIn: DataFrame): DataFrame = {
    val b = calibCells(cellsIn, withBrier = false)
      .withColumn("n", sum("nb").over(Window.partitionBy()))
    val sb = col("svb").cast("double") / (col("nb") * col("mx"))
    val yb = col("pb").cast("double") / col("nb")
    b.withColumn("e6",
        floor(col("nb") * abs(sb - yb) * 1e6 + 0.5).cast("long"))
      .withColumn("ece6", sum("e6").over(Window.partitionBy()))
      .select(col("bin"), col("nb").as("n"), col("pb").as("n_pos"),
        Q.r6(sb).as("mean_pred"), Q.r6(yb).as("frac_pos"),
        Q.r6(col("ece6").cast("double") / (col("n") * lit(1e6))).as("ece"))
      .orderBy("bin")
  }

  /** The Cliff's-delta fold over the same (v100, c1, c2) grid — ONE
    * home shared by batch q_cliffs_delta and the s_cliffs_delta
    * streaming read-time view. δ = P(X>Y) − P(X<Y) collapses onto
    * Σ c1·((clicks strictly below) − (clicks strictly above)) — an
    * EXACT int64 fold (|Σ| ≤ n1·n2), ties contributing zero; the one
    * division happens on the final sum. */
  private[graft] def cliffsOf(cellsIn: DataFrame): DataFrame = {
    // single window chain — same no-snapshot rationale as [[ksOf]]
    val c = cellsIn
    val wv = Window.orderBy("v100").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = c.withColumn("r2", sum("c2").over(wv))
      .withColumn("n1", sum("c1").over(Window.partitionBy()))
      .withColumn("n2", sum("c2").over(Window.partitionBy()))
    val t = e.agg(max("n1").as("n1"), max("n2").as("n2"),
      coalesce(sum(col("c1") * ((col("r2") - col("c2")) - (col("n2") - col("r2")))),
        lit(0L)).as("s"))
    t.select(col("n1"), col("n2"),
      when(col("n1") > 0 && col("n2") > 0,
        Q.r6(col("s").cast("double") /
          (col("n1").cast("double") * col("n2")))).as("delta"))
  }

  def defs: Seq[QueryDef] = Seq(

    // Per-type linear trend of daily event volume: ordinary least
    // squares of count-per-day against day index. The daily rollup is
    // a (|types|×|days|)-key agg; the per-type fit then consumes ~30
    // rows per type. Every sufficient statistic (n, Σx, Σy, Σxy, Σx²,
    // Σy²) is an exact int64 — both engines divide the SAME integers,
    // so slope/intercept/r² agree to the last bit before r6.
    Q("q_trend_fit",
      s"""WITH daily AS (SELECT event_type,
         |                      CAST(date_diff('day', DATE '$TrendAnchor',
         |                                     CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         |                      count(*) AS y
         |               FROM events GROUP BY 1, 2),
         |st AS (SELECT event_type, count(*) AS n,
         |              sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         |              sum(x * x) AS sxx, sum(y * y) AS syy
         |       FROM daily GROUP BY 1)
         |SELECT event_type, n,
         |       ${Q.sqlR6("CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)")} AS slope,
         |       ${Q.sqlR6("CAST(sy * sxx - sx * sxy AS DOUBLE) / (n * sxx - sx * sx)")} AS intercept,
         |       ${Q.sqlR6("CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) AS DOUBLE) / ((n * sxx - sx * sx) * (n * syy - sy * sy))")} AS r2
         |FROM st
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      // fold factored for the s_trend_fit streaming face —
      // Inference.dailyCounts is the same frame this body built inline
      trendFitOf(Inference.dailyCounts(s, d))
    },

    // Per-group OLS regression (round 10): slope / intercept / r² of
    // DAILY ORDER REVENUE against day index, per customer nation —
    // q_trend_fit's fit generalized to a real measure over a real
    // dimension join. Revenue is exact int64 CENTS per day; the daily
    // y is then whole DOLLARS (cents div 100, exact integer division
    // both engines). Only the five BASE sums (Σx, Σy, Σxy, Σx², Σy²)
    // live in int64 — the binding one, Σy², has ~6 decimal orders of
    // headroom at sf0.1 and its growth is linear in y², loud under
    // ANSI if ever crossed. Every COMPOSITE statistic (n·Σxy − ΣxΣy,
    // the intercept numerator ΣyΣx² − ΣxΣxy, and both r² factors) is
    // computed in IEEE doubles from those exact integers: the same
    // casts and the same multiply/subtract tree on both sides, so the
    // doubles agree bit-for-bit and no int64 product cliff exists
    // (naively, Σy·Σx² alone would overflow within ~10× data growth).
    // Shape: orders joins the BROADCAST customer→nation dim chain
    // (fact side never shuffles for the join), collapses to the
    // (25×|days|)-key daily agg with map-side partials, then a 25-row
    // fit — shuffle volume is key-bounded, not corpus-bounded.
    Q("q_grouped_regression",
      s"""WITH o AS (SELECT n_name,
         |                  CAST(date_diff('day', DATE '1995-01-01',
         |                                 CAST(date_trunc('day', o_orderdate) AS DATE)) AS BIGINT) AS x,
         |                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
         |           FROM orders
         |           JOIN customer ON o_custkey = c_custkey
         |           JOIN nation ON c_nationkey = n_nationkey),
         |daily AS (SELECT n_name, x, CAST(sum(cents) // 100 AS BIGINT) AS y
         |          FROM o GROUP BY 1, 2),
         |st AS (SELECT n_name, count(*) AS n,
         |              CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         |              CAST(sum(x * y) AS DOUBLE) AS sxy,
         |              CAST(sum(x * x) AS DOUBLE) AS sxx,
         |              CAST(sum(y * y) AS DOUBLE) AS syy
         |       FROM daily GROUP BY 1)
         |SELECT n_name, n,
         |       ${Q.sqlR6("(n * sxy - sx * sy) / (n * sxx - sx * sx)")} AS slope,
         |       ${Q.sqlR6("(sy * sxx - sx * sxy) / (n * sxx - sx * sx)")} AS intercept,
         |       ${Q.sqlR6("((n * sxy - sx * sy) * (n * sxy - sx * sy)) / ((n * sxx - sx * sx) * (n * syy - sy * sy))")} AS r2
         |FROM st
         |ORDER BY n_name""".stripMargin) { (s, d) =>
      val dim = Tables.load(s, d, "customer")
        .join(Tables.load(s, d, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name"))
      // No hint on the customer→nation chain: customer GROWS with SF
      // (a forced broadcast breaks at 100 TB), so the planner/AQE
      // size-decides — broadcast at bench scale, shuffle join beyond
      // the threshold (r18, the broadcast-bound walk's one catch).
      val daily = Tables.load(s, d, "orders")
        .join(dim, col("o_custkey") === col("c_custkey"))
        .groupBy(col("n_name"),
          datediff(col("o_orderdate").cast(DateType), to_date(lit("1995-01-01")))
            .cast("long").as("x"))
        .agg(expr(
          "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) div 100 AS BIGINT)")
          .as("y"))
      val st = daily.groupBy("n_name")
        .agg(count(lit(1)).as("n"),
          sum("x").cast("double").as("sx"), sum("y").cast("double").as("sy"),
          sum(col("x") * col("y")).cast("double").as("sxy"),
          sum(col("x") * col("x")).cast("double").as("sxx"),
          sum(col("y") * col("y")).cast("double").as("syy"))
      val sxxN = col("n") * col("sxx") - col("sx") * col("sx")
      val sxyN = col("n") * col("sxy") - col("sx") * col("sy")
      val syyN = col("n") * col("syy") - col("sy") * col("sy")
      st.select(col("n_name"), col("n"),
          Q.r6(sxyN / sxxN).as("slope"),
          Q.r6((col("sy") * col("sxx") - col("sx") * col("sxy")) / sxxN).as("intercept"),
          Q.r6((sxyN * sxyN) / (sxxN * syyN)).as("r2"))
        .orderBy("n_name")
    },

    // Sample-ratio-mismatch gate (round 15): the sanity check that
    // MUST pass before q_abtest/q_cuped/q_qini are readable — is the
    // user_id-parity assignment actually delivering the designed
    // 50/50 split? For two equal-expectation cells the chi-square
    // collapses to (n_t − n_c)²/N; the flag compares it against the
    // df=1 α=0.05 critical value 3.841459 as an IEEE literal in both
    // engines (transcendental-free). Counts are distinct users —
    // pure int64 off one user-keyed agg; single-row readout.
    Q("q_srm",
      s"""WITH u AS (SELECT DISTINCT user_id, user_id % 2 AS trt FROM events),
         |c AS (SELECT CAST(sum(trt) AS BIGINT) AS n_t,
         |             CAST(sum(1 - trt) AS BIGINT) AS n_c FROM u)
         |SELECT n_t, n_c,
         |       CASE WHEN n_t + n_c > 0 THEN ${Q.sqlR6("CAST((n_t - n_c) * (n_t - n_c) AS DOUBLE) / (n_t + n_c)")} END AS chi2,
         |       CASE WHEN n_t + n_c > 0 THEN
         |         CAST(CASE WHEN CAST((n_t - n_c) * (n_t - n_c) AS DOUBLE) / (n_t + n_c) > 3.841459 THEN 1 ELSE 0 END AS BIGINT)
         |       END AS srm_flag
         |FROM c""".stripMargin) { (s, d) =>
      val c = Tables.events(s, d)
        .select(col("user_id"), (col("user_id") % 2).as("trt")).distinct()
        .agg(sum("trt").as("n_t"), sum(lit(1) - col("trt")).as("n_c"))
      val chi2 = ((col("n_t") - col("n_c")) * (col("n_t") - col("n_c")))
        .cast("double") / (col("n_t") + col("n_c"))
      c.select(col("n_t"), col("n_c"),
        when(col("n_t") + col("n_c") > 0, Q.r6(chi2)).as("chi2"),
        when(col("n_t") + col("n_c") > 0,
          when(chi2 > 3.841459, 1L).otherwise(0L)).as("srm_flag"))
    },

    // Hash-split A/B test: users split into two variants by user_id
    // parity (any deterministic hash works — parity keeps the twin
    // trivially identical), conversion = reached a high-value purchase
    // (value ≥ 150 — plain 'purchase' saturates: every user has one,
    // which zeroes a contingency margin and turns the chi-square into
    // 0/0). One per-user agg (map-side partials on user_id), a 2-row
    // variant rollup, then a single-row contingency projection:
    // conversion rates, absolute lift, and the 2×2 chi-square
    // statistic — every input to the arithmetic is one of four
    // integer cell counts.
    Q("q_abtest",
      s"""WITH u AS (SELECT user_id, user_id % 2 AS variant,
         |                  max(CASE WHEN event_type = 'purchase' AND value >= 150
         |                           THEN 1 ELSE 0 END) AS conv
         |           FROM events GROUP BY 1, 2),
         |v AS (SELECT variant, count(*) AS n, sum(conv) AS c FROM u GROUP BY 1),
         |w AS (SELECT sum(CASE WHEN variant = 0 THEN n END) AS na,
         |             sum(CASE WHEN variant = 0 THEN c END) AS ca,
         |             sum(CASE WHEN variant = 1 THEN n END) AS nb,
         |             sum(CASE WHEN variant = 1 THEN c END) AS cb
         |      FROM v)
         |SELECT CAST(na AS BIGINT) AS na, CAST(ca AS BIGINT) AS ca,
         |       CAST(nb AS BIGINT) AS nb, CAST(cb AS BIGINT) AS cb,
         |       ${Q.sqlR6("CAST(ca AS DOUBLE) / na")} AS rate_a,
         |       ${Q.sqlR6("CAST(cb AS DOUBLE) / nb")} AS rate_b,
         |       ${Q.sqlR6("CAST(cb AS DOUBLE) / nb - CAST(ca AS DOUBLE) / na")} AS lift,
         |       ${Q.sqlR6("CAST(na + nb AS DOUBLE) * (ca * (nb - cb) - cb * (na - ca)) * (ca * (nb - cb) - cb * (na - ca)) / (CAST(na AS DOUBLE) * nb * (ca + cb) * (na + nb - ca - cb))")} AS chisq
         |FROM w""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"), (col("user_id") % 2).as("variant"))
        .agg(max(when(col("event_type") === "purchase" && col("value") >= 150, 1)
          .otherwise(0)).as("conv"))
      val v = u.groupBy("variant").agg(count(lit(1)).as("n"), sum("conv").as("c"))
      val w = v.agg(
        sum(when(col("variant") === 0, col("n"))).as("na"),
        sum(when(col("variant") === 0, col("c"))).as("ca"),
        sum(when(col("variant") === 1, col("n"))).as("nb"),
        sum(when(col("variant") === 1, col("c"))).as("cb"))
      val odd = col("ca") * (col("nb") - col("cb")) - col("cb") * (col("na") - col("ca"))
      w.select(col("na"), col("ca"), col("nb"), col("cb"),
        Q.r6(col("ca").cast("double") / col("na")).as("rate_a"),
        Q.r6(col("cb").cast("double") / col("nb")).as("rate_b"),
        Q.r6(col("cb").cast("double") / col("nb") -
          col("ca").cast("double") / col("na")).as("lift"),
        Q.r6((col("na") + col("nb")).cast("double") * odd * odd /
          (col("na").cast("double") * col("nb") * (col("ca") + col("cb")) *
            (col("na") + col("nb") - col("ca") - col("cb")))).as("chisq"))
    },

    // Gini concentration of order value per priority class: the exact
    // rank-weighted formulation G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over
    // ascending xᵢ. The rank window sorts WITHIN each priority (the
    // per-group sort is exact Gini's honest cost); o_orderkey breaks
    // double ties so both engines rank identically. r6 absorbs the
    // rank-weighted double sum's accumulation-order noise (~1e-11).
    Q("q_gini",
      s"""WITH r AS (SELECT o_orderpriority, o_totalprice,
         |                  row_number() OVER (PARTITION BY o_orderpriority
         |                                     ORDER BY o_totalprice, o_orderkey) AS i
         |           FROM orders),
         |g AS (SELECT o_orderpriority, count(*) AS n,
         |             sum(o_totalprice) AS s, sum(i * o_totalprice) AS t
         |      FROM r GROUP BY 1)
         |SELECT o_orderpriority, n,
         |       ${Q.sqlR2("s")} AS total,
         |       ${Q.sqlR6("2.0 * t / (n * s) - CAST(n + 1 AS DOUBLE) / n")} AS gini
         |FROM g
         |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
      Tables.load(s, d, "orders")
        .select(col("o_orderpriority"), col("o_totalprice"),
          row_number().over(w).as("i"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum("o_totalprice").as("s"),
          sum(col("i") * col("o_totalprice")).as("t"))
        .select(col("o_orderpriority"), col("n"),
          Q.r2(col("s")).as("total"),
          Q.r6(lit(2.0) * col("t") / (col("n") * col("s")) -
            (col("n") + 1).cast("double") / col("n")).as("gini"))
        .orderBy("o_orderpriority")
    },

    // Association-rule mining (market-basket): the top-20 part pairs
    // co-purchased in the same order, with support, confidence(p1→p2)
    // and lift. Pair candidates expand IN-ROW per order from the
    // sorted distinct item array (orders hold ~4 items — C(n,2) per
    // basket, never a cross-part join; the q_graph_butterflies shape),
    // land on a (p1, p2)-key agg with map-side partials, and only the
    // 20 winning rows — picked by INTEGER counts with (p1, p2)
    // tie-breaks, so the boundary is engine-exact — join back to the
    // per-part counts. Every metric is a division of integer counts,
    // r6-rounded.
    Q("q_assoc_rules",
      s"""WITH i AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk FROM lineitem),
         |n AS (SELECT count(DISTINCT okey) AS n_orders FROM i),
         |na AS (SELECT pk, count(*) AS np FROM i GROUP BY 1),
         |pr AS (SELECT a.pk AS p1, b.pk AS p2
         |       FROM i a JOIN i b ON a.okey = b.okey AND a.pk < b.pk),
         |c AS (SELECT p1, p2, count(*) AS n_ab FROM pr GROUP BY 1, 2),
         |top AS (SELECT p1, p2, n_ab FROM c
         |        ORDER BY n_ab DESC, p1, p2 LIMIT 20)
         |SELECT t.p1, t.p2, t.n_ab,
         |       a1.np AS n_p1, a2.np AS n_p2,
         |       ${Q.sqlR6("CAST(t.n_ab AS DOUBLE) / (SELECT n_orders FROM n)")} AS support,
         |       ${Q.sqlR6("CAST(t.n_ab AS DOUBLE) / a1.np")} AS confidence,
         |       ${Q.sqlR6("CAST(t.n_ab AS DOUBLE) * (SELECT n_orders FROM n) / (CAST(a1.np AS DOUBLE) * a2.np)")} AS lift
         |FROM top t JOIN na a1 ON t.p1 = a1.pk JOIN na a2 ON t.p2 = a2.pk
         |ORDER BY t.n_ab DESC, t.p1, t.p2""".stripMargin) { (s, d) =>
      val items = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey").as("okey"), col("l_partkey").as("pk"))
        .distinct()
      val nDf = items.agg(countDistinct("okey").as("n_orders"))
      val na = items.groupBy("pk").agg(count(lit(1)).as("np"))
      val top = items
        .groupBy("okey").agg(sort_array(collect_list(col("pk"))).as("pks"))
        // streamed two-generator pair expansion (posexplode + explode
        // over slice), same rewrite as the graph ops: the nested
        // transform/flatten lambda is CodegenFallback and materializes
        // each basket's full C(items,2) struct array before exploding
        .select(col("pks"), posexplode(col("pks")).as(Seq("i", "p1")))
        .select(col("p1"),
          explode(slice(col("pks"), col("i") + lit(2),
            size(col("pks")) - col("i") - lit(1))).as("p2"))
        .groupBy("p1", "p2").agg(count(lit(1)).as("n_ab"))
        .orderBy(col("n_ab").desc, col("p1"), col("p2"))
        .limit(20)
      top
        .join(na.withColumnRenamed("pk", "p1").withColumnRenamed("np", "n_p1"), "p1")
        .join(na.withColumnRenamed("pk", "p2").withColumnRenamed("np", "n_p2"), "p2")
        .crossJoin(broadcast(nDf))
        .select(col("p1"), col("p2"), col("n_ab"), col("n_p1"), col("n_p2"),
          Q.r6(col("n_ab").cast("double") / col("n_orders")).as("support"),
          Q.r6(col("n_ab").cast("double") / col("n_p1")).as("confidence"),
          Q.r6(col("n_ab").cast("double") * col("n_orders") /
            (col("n_p1").cast("double") * col("n_p2"))).as("lift"))
        .orderBy(col("n_ab").desc, col("p1"), col("p2"))
    },

    // Daily mutual information between event type and time-of-day
    // quadrant — the dependence monitor behind drift alarms (MI drops
    // when a type stops being time-locked). Cells aggregate onto a
    // (|days|·|types|·4)-key frame; the day totals are window sums over
    // that TINY frame. Each cell's (nij/n)·ln(nij·n/(ni·nj)) term is
    // integer-scaled to 1e-9 BEFORE the per-day reduction, so the sum
    // is an order-free int64 fold — a 1-ulp ln() disagreement moves the
    // day's MI by 1e-9, far inside the r6 report.
    Q("q_mutual_info",
      s"""WITH c AS (SELECT strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day,
         |                  event_type,
         |                  CAST(floor(hour(ts) / 6) AS BIGINT) AS pod,
         |                  count(*) AS nij
         |           FROM events GROUP BY 1, 2, 3),
         |w AS (SELECT day, event_type, pod, nij,
         |             sum(nij) OVER (PARTITION BY day) AS n,
         |             sum(nij) OVER (PARTITION BY day, event_type) AS ni,
         |             sum(nij) OVER (PARTITION BY day, pod) AS nj
         |      FROM c),
         |t AS (SELECT day, nij,
         |             CAST(floor((CAST(nij AS DOUBLE) / n) *
         |                        ln(CAST(nij AS DOUBLE) * n / (CAST(ni AS DOUBLE) * nj)) * 1e9 + 0.5)
         |                  AS BIGINT) AS contrib
         |      FROM w)
         |SELECT day, CAST(sum(nij) AS BIGINT) AS n_events,
         |       ${Q.sqlR6("sum(contrib) / 1e9")} AS mi
         |FROM t
         |GROUP BY day
         |ORDER BY day""".stripMargin) { (s, d) =>
      val cells = Tables.events(s, d)
        .groupBy(
          date_format(col("ts").cast(DateType), "yyyy-MM-dd").as("day"),
          col("event_type"),
          floor(hour(col("ts")) / 6).cast("long").as("pod"))
        .agg(count(lit(1)).as("nij"))
      val wd = Window.partitionBy("day")
      val wi = Window.partitionBy("day", "event_type")
      val wj = Window.partitionBy("day", "pod")
      cells
        .withColumn("n", sum("nij").over(wd))
        .withColumn("ni", sum("nij").over(wi))
        .withColumn("nj", sum("nij").over(wj))
        .withColumn("contrib",
          floor((col("nij").cast("double") / col("n")) *
            log(col("nij").cast("double") * col("n") /
              (col("ni").cast("double") * col("nj"))) * lit(1e9) + 0.5)
            .cast("long"))
        .groupBy("day")
        .agg(sum("nij").as("n_events"), Q.r6(sum("contrib") / lit(1e9)).as("mi"))
        .orderBy("day")
    },

    // Pairwise Pearson correlation matrix over the lineitem measures
    // (round 10) — the feature-screening primitive: which columns move
    // together? ONE corpus scan computes every sufficient statistic
    // (4 sums, 4 sums of squares, 6 cross sums, n — 15 aggregates in a
    // single map-side-partial pass), then the 6 pairs are expanded
    // IN-ROW from the one stats row. Measures are integerized first
    // (quantity is integral, price floored to whole dollars, discount/
    // tax scaled ×100 — Pearson is scale-invariant, the dollar floor is
    // part of the op's definition) so every Σ is an exact int64 and
    // both engines feed IDENTICAL integers into the one shared formula
    // tree — n·Σxy products exceed int64 range, so the formula runs in
    // doubles over exactly-converted int sums (all < 2^53 at sf0.1;
    // at sf ≥ 10 the sums need DECIMAL accumulators, noted here).
    // corr = (n·Σxy − ΣxΣy) / (sqrt(n·Σx²−(Σx)²)·sqrt(n·Σy²−(Σy)²)),
    // the sqrt(a)·sqrt(b) form mirrored textually per PARITY.
    Q("q_corr_matrix",
      s"""WITH m AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS q,
         |                  CAST(floor(l_extendedprice) AS BIGINT) AS p,
         |                  CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,
         |                  CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS t
         |           FROM lineitem),
         |st AS (SELECT count(*) AS n,
         |              CAST(sum(q) AS BIGINT) AS sq, CAST(sum(p) AS BIGINT) AS sp,
         |              CAST(sum(d) AS BIGINT) AS sd, CAST(sum(t) AS BIGINT) AS st,
         |              CAST(sum(q * q) AS BIGINT) AS qq, CAST(sum(p * p) AS BIGINT) AS pp,
         |              CAST(sum(d * d) AS BIGINT) AS dd, CAST(sum(t * t) AS BIGINT) AS tt,
         |              CAST(sum(q * p) AS BIGINT) AS qp, CAST(sum(q * d) AS BIGINT) AS qd,
         |              CAST(sum(q * t) AS BIGINT) AS qt, CAST(sum(p * d) AS BIGINT) AS pd,
         |              CAST(sum(p * t) AS BIGINT) AS pt, CAST(sum(d * t) AS BIGINT) AS dt
         |       FROM m),
         |pr AS (SELECT 'quantity' AS var1, 'price_usd' AS var2, n, sq AS sx, sp AS sy, qp AS sxy, qq AS sxx, pp AS syy FROM st
         |       UNION ALL SELECT 'quantity', 'discount', n, sq, sd, qd, qq, dd FROM st
         |       UNION ALL SELECT 'quantity', 'tax', n, sq, st, qt, qq, tt FROM st
         |       UNION ALL SELECT 'price_usd', 'discount', n, sp, sd, pd, pp, dd FROM st
         |       UNION ALL SELECT 'price_usd', 'tax', n, sp, st, pt, pp, tt FROM st
         |       UNION ALL SELECT 'discount', 'tax', n, sd, st, dt, dd, tt FROM st)
         |SELECT var1, var2, n,
         |       ${Q.sqlR6("(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy))")} AS corr
         |FROM pr
         |ORDER BY var1, var2""".stripMargin) { (s, d) =>
      def pair(v1: String, v2: String, sx: String, sy: String,
               sxy: String, sxx: String, syy: String) =
        struct(lit(v1).as("var1"), lit(v2).as("var2"),
          col(sx).as("sx"), col(sy).as("sy"), col(sxy).as("sxy"),
          col(sxx).as("sxx"), col(syy).as("syy"))
      lineitemMomentStats(s, d).select(col("n"), explode(array(
          pair("quantity", "price_usd", "sq", "sp", "qp", "qq", "pp"),
          pair("quantity", "discount", "sq", "sd", "qd", "qq", "dd"),
          pair("quantity", "tax", "sq", "st", "qt", "qq", "tt"),
          pair("price_usd", "discount", "sp", "sd", "pd", "pp", "dd"),
          pair("price_usd", "tax", "sp", "st", "pt", "pp", "tt"),
          pair("discount", "tax", "sd", "st", "dt", "dd", "tt"))).as("pr"))
        .select(col("pr.var1").as("var1"), col("pr.var2").as("var2"), col("n"),
          Q.r6(corrCol(col("n"), col("pr.sxy"), col("pr.sx"), col("pr.sy"),
            col("pr.sxx"), col("pr.syy"))).as("corr"))
        .orderBy("var1", "var2")
    },

    // Two-sample Kolmogorov–Smirnov test between the purchase and
    // click value distributions (round 10) — the classic drift /
    // same-distribution check q_drift_tvd's fixed grid approximates.
    // Exactness trick: D = max|F1−F2| evaluated per DISTINCT value
    // (2-decimal values → cents), and |R1·n2 − R2·n1| is an exact
    // int64 — the sup and its argmax are INTEGER comparisons, the one
    // double op is the final division. Shapes: corpus collapses to
    // the ≤|value-domain| distinct-cents frame first (bounded by the
    // 2-decimal domain, NOT corpus size), the running ECDFs are
    // windows over that bounded frame, and the winner row is an
    // integer argmax with a smallest-value tie-break.
    Q("q_ks_test",
      s"""WITH $CentsGridSql,
         |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM c),
         |r AS (SELECT v100,
         |             CAST(sum(c1) OVER (ORDER BY v100 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS r1,
         |             CAST(sum(c2) OVER (ORDER BY v100 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS r2
         |      FROM c),
         |dev AS (SELECT v100, abs(r1 * n2 - r2 * n1) AS dev, n1, n2 FROM r CROSS JOIN n),
         |w AS (SELECT *, row_number() OVER (ORDER BY dev DESC, v100) AS rn FROM dev)
         |SELECT n1, n2,
         |       ${Q.sqlR6("CAST(dev AS DOUBLE) / (n1 * n2)")} AS ks_d,
         |       CAST(v100 AS DOUBLE) / 100 AS at_value
         |FROM w WHERE rn = 1""".stripMargin) { (s, d) =>
      // single scan: sample sizes are whole-frame window aggregates over
      // the bounded distinct-cents frame — no re-aggregated totals join
      ksOf(centsGrid(s, d))
    },

    // Cramér–von Mises two-sample statistic on q_ks_test's exact cents
    // grid (round 14) — the INTEGRATED complement of KS's max gap:
    // T = n1·n2/N² · Σ over pooled observations of (F1−F2)², sensitive
    // to distribution-wide drift a single extreme cell can't dominate
    // (and that KS's supremum rewards). Each pooled observation's
    // squared ECDF gap floors onto the 1e-9 lattice BEFORE the
    // cross-cell sum, so the reduction is order-free int64; the gap
    // itself is the exact int64 cross-product (r1·n2 − r2·n1) under
    // ONE division. Shape identical to q_ks_test: one scan, a bounded
    // distinct-cents frame, whole-frame window totals.
    Q("q_cramer_von_mises",
      s"""WITH $CentsGridSql,
         |r AS (SELECT v100, c1, c2,
         |             CAST(sum(c1) OVER (ORDER BY v100 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS r1,
         |             CAST(sum(c2) OVER (ORDER BY v100 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS r2,
         |             CAST(sum(c1) OVER () AS BIGINT) AS n1,
         |             CAST(sum(c2) OVER () AS BIGINT) AS n2
         |      FROM c),
         |g AS (SELECT c1, c2, n1, n2,
         |             CAST(r1 * n2 - r2 * n1 AS DOUBLE) /
         |               (CAST(n1 AS DOUBLE) * n2) AS gap
         |      FROM r),
         |t AS (SELECT CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
         |             CAST(sum(CAST(floor((c1 + c2) * gap * gap * 1e9 + 0.5)
         |               AS BIGINT)) AS BIGINT) AS t9
         |      FROM g)
         |SELECT n1, n2,
         |       CASE WHEN n1 > 0 AND n2 > 0 THEN
         |         ${Q.sqlR6("CAST(n1 AS DOUBLE) * n2 / " +
                   "(CAST(n1 + n2 AS DOUBLE) * (n1 + n2)) * (t9 / 1e9)")}
         |       END AS t_stat
         |FROM t""".stripMargin) { (s, d) =>
      cvmOf(centsGrid(s, d))
    },

    // 1-D Wasserstein (earth-mover) distance between the purchase and
    // click value distributions (round 14) — the METRIC member of the
    // two-sample family: where KS reads the worst single gap and CvM
    // the average squared gap, W1 = ∫|F1−F2| dv prices the total mass
    // × distance that would have to MOVE to equalize the
    // distributions, in value units. Collapses onto
    // Σ|r1·n2 − r2·n1|·Δv over consecutive grid cells — an EXACT
    // int64 fold (no lattice anywhere); the one division happens on
    // the final sum. Same shape as q_ks_test: one scan, the bounded
    // distinct-cents frame, whole-frame window totals.
    Q("q_wasserstein_1d",
      s"""WITH $CentsGridSql,
         |r AS (SELECT v100,
         |             CAST(sum(c1) OVER (ORDER BY v100 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS r1,
         |             CAST(sum(c2) OVER (ORDER BY v100 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS r2,
         |             CAST(sum(c1) OVER () AS BIGINT) AS n1,
         |             CAST(sum(c2) OVER () AS BIGINT) AS n2,
         |             lead(v100) OVER (ORDER BY v100) AS nxt
         |      FROM c),
         |t AS (SELECT CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
         |             CAST(coalesce(sum(CASE WHEN nxt IS NOT NULL
         |               THEN abs(r1 * n2 - r2 * n1) * (nxt - v100) END), 0) AS BIGINT) AS tw
         |      FROM r)
         |SELECT n1, n2,
         |       CASE WHEN n1 > 0 AND n2 > 0 THEN
         |         ${Q.sqlR6("CAST(tw AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2 * 100)")}
         |       END AS w1
         |FROM t""".stripMargin) { (s, d) =>
      w1Of(centsGrid(s, d))
    },

    // Two-sample Anderson–Darling A² between the purchase and click
    // value distributions (round 14) — the TAIL-WEIGHTED member of the
    // family: each cell's squared ECDF gap is divided by B·(N−B), so
    // discrepancies in the distribution tails (where the pooled ECDF
    // is near 0 or 1) count for more than the same gap mid-body —
    // exactly what KS's supremum and CvM's flat average underweight.
    // The k=2 Scholz–Stephens cell term collapses onto ONE exact
    // cross-product |D| = |n2·r1 − n1·r2| shared by both samples:
    // A² = Σ m·D²/(n1·n2·B·(N−B)) over cells with B < N, each cell's
    // contribution floored onto the 1e-9 lattice BEFORE the order-free
    // int64 sum. Same one-scan bounded-grid shape as q_ks_test.
    Q("q_anderson_darling",
      s"""WITH $CentsGridSql,
         |r AS (SELECT v100, c1, c2,
         |             CAST(sum(c1) OVER (ORDER BY v100 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS r1,
         |             CAST(sum(c2) OVER (ORDER BY v100 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS r2,
         |             CAST(sum(c1) OVER () AS BIGINT) AS n1,
         |             CAST(sum(c2) OVER () AS BIGINT) AS n2
         |      FROM c),
         |t AS (SELECT CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
         |             CAST(coalesce(sum(CASE WHEN r1 + r2 < n1 + n2 THEN
         |               CAST(floor(CAST(c1 + c2 AS DOUBLE) *
         |                 CAST(n2 * r1 - n1 * r2 AS DOUBLE) *
         |                 CAST(n2 * r1 - n1 * r2 AS DOUBLE) /
         |                 (CAST(n1 AS DOUBLE) * n2 *
         |                  CAST((r1 + r2) * (n1 + n2 - r1 - r2) AS DOUBLE)) * 1e9 + 0.5)
         |               AS BIGINT) END), 0) AS BIGINT) AS t9
         |      FROM r)
         |SELECT n1, n2,
         |       CASE WHEN n1 > 0 AND n2 > 0 THEN
         |         ${Q.sqlR6("t9 / 1e9")}
         |       END AS a2
         |FROM t""".stripMargin) { (s, d) =>
      adOf(centsGrid(s, d))
    },

    // Cliff's delta between the purchase and click value distributions
    // (round 14) — the EFFECT-SIZE member of the family: while
    // KS/CvM/AD/W1 ask "do the distributions differ", δ = P(X>Y) −
    // P(X<Y) asks "by how much, in rank terms, and in which
    // direction" — the ordinal effect size behind q_mann_whitney's
    // significance test (δ = 2U/(n1·n2) − 1). Collapses onto
    // Σ c1·(clicks-below − clicks-above) over the grid — an EXACT
    // int64 fold, ties contributing zero, no lattice anywhere.
    Q("q_cliffs_delta",
      s"""WITH $CentsGridSql,
         |r AS (SELECT c1, c2,
         |             CAST(sum(c2) OVER (ORDER BY v100 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS r2,
         |             CAST(sum(c1) OVER () AS BIGINT) AS n1,
         |             CAST(sum(c2) OVER () AS BIGINT) AS n2
         |      FROM c),
         |t AS (SELECT CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
         |             CAST(coalesce(sum(c1 * ((r2 - c2) - (n2 - r2))), 0) AS BIGINT) AS s
         |      FROM r)
         |SELECT n1, n2,
         |       CASE WHEN n1 > 0 AND n2 > 0 THEN
         |         ${Q.sqlR6("CAST(s AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)")}
         |       END AS delta
         |FROM t""".stripMargin) { (s, d) =>
      cliffsOf(centsGrid(s, d))
    },

    // Two-sample power analysis for the purchase-vs-click mean gap
    // (round 14): the experiment-PLANNING readout beside q_welch_t's
    // testing one — "how many observations per arm would a NEW
    // experiment need to detect the currently-observed effect at
    // α = 0.05 two-sided with power 0.8": n = ⌈2·σ̄²·(z_{α/2}+z_β)²/δ²⌉
    // with z constants as IEEE literals in both engines
    // (transcendental-free — no Φ anywhere). Moments exact int64 on
    // the cents lattice; NULL when the observed δ is exactly zero (a
    // zero effect cannot be sized). ONE corpus scan, two-key agg.
    Q("q_power_analysis",
      s"""WITH v AS (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v100
         |           FROM events WHERE event_type IN ('purchase', 'click')),
         |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(v100) AS BIGINT) AS s,
         |             CAST(sum(v100 * v100) AS BIGINT) AS ss
         |      FROM v GROUP BY 1),
         |p AS (SELECT max(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
         |             max(CASE WHEN event_type = 'purchase' THEN s END) AS s1,
         |             max(CASE WHEN event_type = 'purchase' THEN ss END) AS ss1,
         |             max(CASE WHEN event_type = 'click' THEN n END) AS n2,
         |             max(CASE WHEN event_type = 'click' THEN s END) AS s2,
         |             max(CASE WHEN event_type = 'click' THEN ss END) AS ss2
         |      FROM g),
         |m AS (SELECT n1, n2,
         |             CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS delta,
         |             ((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1)
         |              + (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1)) / 2 AS var2
         |      FROM p)
         |SELECT n1, n2,
         |       CASE WHEN n1 >= 1 AND n2 >= 1 THEN ${Q.sqlR6("delta / 100")} END AS observed_delta,
         |       CASE WHEN n1 >= 2 AND n2 >= 2 THEN ${Q.sqlR6("sqrt(var2) / 100")} END AS pooled_sd,
         |       CASE WHEN n1 >= 2 AND n2 >= 2 AND delta <> 0 THEN
         |         CAST(ceil(2 * var2 * ((1.959964 + 0.841621) * (1.959964 + 0.841621))
         |           / (delta * delta)) AS BIGINT)
         |       END AS n_required_per_arm
         |FROM m""".stripMargin) { (s, d) =>
      // routed through the shared cents grid — per-group moments derive
      // exactly from the cell counts (Σ c·v100, Σ c·v100²)
      powerOf(centsGrid(s, d))
    },

    // Exact ROC-AUC of "value predicts purchase-vs-click" (round 15) —
    // the model-evaluation face of the rank machinery: AUC IS the
    // Mann-Whitney U normalized by n1·n2, so it rides q_mann_whitney's
    // doubled-midrank fold on the SAME bounded distinct-cents grid —
    // (r1x2 − n1(n1+1))/(2·n1·n2), integer to the last bit before the
    // one division; Gini/accuracy-ratio = 2·AUC − 1. Shape: corpus →
    // domain-bounded grid, one running window, single-row output.
    Q("q_auc_roc",
      s"""WITH $CentsGridSql,
         |r AS (SELECT c1, c2, c1 + c2 AS t,
         |             CAST(coalesce(sum(c1 + c2) OVER (ORDER BY v100
         |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |                  AS BIGINT) AS cb
         |      FROM c),
         |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
         |             CAST(sum(c1 * (2 * cb + t + 1)) AS BIGINT) AS r1x2
         |      FROM r)
         |SELECT n1, n2,
         |       CASE WHEN n1 > 0 AND n2 > 0 THEN ${Q.sqlR6("(r1x2 - n1 * (n1 + 1)) / (2.0 * (CAST(n1 AS DOUBLE) * n2))")} END AS auc,
         |       CASE WHEN n1 > 0 AND n2 > 0 THEN ${Q.sqlR6("2.0 * ((r1x2 - n1 * (n1 + 1)) / (2.0 * (CAST(n1 AS DOUBLE) * n2))) - 1")} END AS gini
         |FROM t""".stripMargin) { (s, d) =>
      aucOf(centsGrid(s, d))
    },

    // Average precision / PR-AUC of the same scoring task (round 15) —
    // the imbalanced-class companion of q_auc_roc (AUC rewards
    // ranking; AP weights by precision where positives actually
    // land). Deterministic tie convention: tied-score blocks arrive
    // together in descending cents order, precision measured at block
    // END; AP = Σ c1·(cum1/cumt)/n1 with each block's term on the
    // 1e-6 lattice before the order-free int64 sum. Prevalence rides
    // along as the AP baseline. Same grid, one descending window.
    Q("q_pr_auc",
      s"""WITH $CentsGridSql,
         |r AS (SELECT c1, c2,
         |             CAST(sum(c1) OVER (ORDER BY v100 DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1,
         |             CAST(sum(c1 + c2) OVER (ORDER BY v100 DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumt
         |      FROM c),
         |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
         |             CAST(sum(CAST(floor(CAST(c1 AS DOUBLE) * cum1 / cumt * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS ap6
         |      FROM r)
         |SELECT n1, n2,
         |       CASE WHEN n1 > 0 THEN ${Q.sqlR6("CAST(ap6 AS DOUBLE) / (n1 * 1e6)")} END AS pr_auc,
         |       CASE WHEN n1 + n2 > 0 THEN ${Q.sqlR6("CAST(n1 AS DOUBLE) / (n1 + n2)")} END AS prevalence
         |FROM t""".stripMargin) { (s, d) =>
      prAucOf(centsGrid(s, d))
    },

    // Confusion matrix at the half-range threshold (round 15): the
    // hard-decision face of the q_auc_roc scoring task — predicted
    // positive ⟺ v100·2 ≥ mx, an INTEGER comparison (no float touches
    // the boundary), so TP/FP/FN/TN are exact int64 conditional sums
    // over the shared grid; precision/recall/F1/accuracy/MCC divide
    // out at the end, NULL on their zero margins. Single-row readout.
    Q("q_confusion_matrix",
      s"""WITH $CentsGridSql,
         |m AS (SELECT c1, c2, v100, CAST(max(v100) OVER () AS BIGINT) AS mx FROM c),
         |t AS (SELECT CAST(sum(CASE WHEN v100 * 2 >= mx THEN c1 ELSE 0 END) AS BIGINT) AS tp,
         |             CAST(sum(CASE WHEN NOT (v100 * 2 >= mx) THEN c1 ELSE 0 END) AS BIGINT) AS fn,
         |             CAST(sum(CASE WHEN v100 * 2 >= mx THEN c2 ELSE 0 END) AS BIGINT) AS fp,
         |             CAST(sum(CASE WHEN NOT (v100 * 2 >= mx) THEN c2 ELSE 0 END) AS BIGINT) AS tn
         |      FROM m)
         |SELECT tp, fp, fn, tn,
         |       CASE WHEN tp + fp > 0 THEN ${Q.sqlR6("CAST(tp AS DOUBLE) / (tp + fp)")} END AS precision,
         |       CASE WHEN tp + fn > 0 THEN ${Q.sqlR6("CAST(tp AS DOUBLE) / (tp + fn)")} END AS recall,
         |       CASE WHEN 2 * tp + fp + fn > 0 THEN ${Q.sqlR6("2.0 * tp / (2 * tp + fp + fn)")} END AS f1,
         |       CASE WHEN tp + fp + fn + tn > 0 THEN ${Q.sqlR6("CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn)")} END AS accuracy,
         |       CASE WHEN tp + fp > 0 AND tp + fn > 0 AND tn + fp > 0 AND tn + fn > 0
         |         THEN ${Q.sqlR6("(CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn) / sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn) * (tn + fp) * (tn + fn))")}
         |       END AS mcc
         |FROM t""".stripMargin) { (s, d) =>
      confusionOf(centsGrid(s, d))
    },

    // Brier score + Murphy decomposition of the same scoring task
    // (round 15): treat the range-normalized cents value s = v100/mx
    // as a purchase "probability" and ask how well calibrated it is —
    // BS = Σ[c1·(s−1)² + c2·s²]/N on the 1e-6 lattice, reliability =
    // Σ nb·(s̄b−ȳb)²/N and resolution = Σ nb·(ȳb−ȳ)²/N over the 10
    // fixed-width q_calibration bins (per-bin terms latticed before
    // the ≤10-row sum), uncertainty = ȳ(1−ȳ). The binned rel−res+unc
    // reconstructs BS only up to within-bin variance (documented —
    // both engines compute the same four numbers). RANGE deciles, not
    // quantiles: the binning needs no rank machinery and v100·10/mx
    // hits an integer boundary only when mx divides v100·10, where
    // IEEE division is exact in both engines.
    Q("q_brier",
      s"""WITH $CentsGridSql,
         |m AS (SELECT c1, c2, v100, CAST(max(v100) OVER () AS BIGINT) AS mx FROM c),
         |p AS (SELECT c1, c2, v100, mx,
         |             CAST(LEAST(floor(v100 * 10 / mx), 9) AS BIGINT) AS bin,
         |             CAST(floor((c1 * (CAST(v100 AS DOUBLE) / mx - 1) * (CAST(v100 AS DOUBLE) / mx - 1) + c2 * (CAST(v100 AS DOUBLE) / mx) * (CAST(v100 AS DOUBLE) / mx)) * 1e6 + 0.5) AS BIGINT) AS bs6
         |      FROM m),
         |b AS (SELECT bin, CAST(max(mx) AS BIGINT) AS mx, CAST(sum(c1 + c2) AS BIGINT) AS nb,
         |             CAST(sum(c1) AS BIGINT) AS pb,
         |             CAST(sum((c1 + c2) * v100) AS BIGINT) AS svb,
         |             CAST(sum(bs6) AS BIGINT) AS bs6
         |      FROM p GROUP BY 1),
         |w AS (SELECT *, CAST(sum(nb) OVER () AS BIGINT) AS n,
         |             CAST(sum(pb) OVER () AS BIGINT) AS n1 FROM b),
         |t AS (SELECT n, n1, CAST(sum(bs6) AS BIGINT) AS bs6,
         |             CAST(sum(CAST(floor(nb * (CAST(svb AS DOUBLE) / (nb * mx) - CAST(pb AS DOUBLE) / nb) * (CAST(svb AS DOUBLE) / (nb * mx) - CAST(pb AS DOUBLE) / nb) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS rel6,
         |             CAST(sum(CAST(floor(nb * (CAST(pb AS DOUBLE) / nb - CAST(n1 AS DOUBLE) / n) * (CAST(pb AS DOUBLE) / nb - CAST(n1 AS DOUBLE) / n) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS res6
         |      FROM w GROUP BY 1, 2)
         |SELECT n, n1,
         |       CASE WHEN n > 0 THEN ${Q.sqlR6("CAST(bs6 AS DOUBLE) / (n * 1e6)")} END AS brier,
         |       CASE WHEN n > 0 THEN ${Q.sqlR6("CAST(rel6 AS DOUBLE) / (n * 1e6)")} END AS reliability,
         |       CASE WHEN n > 0 THEN ${Q.sqlR6("CAST(res6 AS DOUBLE) / (n * 1e6)")} END AS resolution,
         |       CASE WHEN n > 0 THEN ${Q.sqlR6("(CAST(n1 AS DOUBLE) / n) * (1 - CAST(n1 AS DOUBLE) / n)")} END AS uncertainty
         |FROM t""".stripMargin) { (s, d) =>
      brierOf(centsGrid(s, d))
    },

    // Reliability table + expected calibration error (round 15) — the
    // per-bin readout under q_brier's single-row decomposition: for
    // each fixed-width score decile the mean predicted score and the
    // observed purchase rate, plus ECE = Σ nb·|s̄b−ȳb|/N (per-bin
    // terms on the 1e-6 lattice, the global sum a window over the
    // ≤10-bin frame). ≤10 output rows.
    Q("q_calibration",
      s"""WITH $CentsGridSql,
         |m AS (SELECT c1, c2, v100, CAST(max(v100) OVER () AS BIGINT) AS mx FROM c),
         |p AS (SELECT c1, c2, v100, mx,
         |             CAST(LEAST(floor(v100 * 10 / mx), 9) AS BIGINT) AS bin
         |      FROM m),
         |b AS (SELECT bin, CAST(max(mx) AS BIGINT) AS mx, CAST(sum(c1 + c2) AS BIGINT) AS nb,
         |             CAST(sum(c1) AS BIGINT) AS pb,
         |             CAST(sum((c1 + c2) * v100) AS BIGINT) AS svb
         |      FROM p GROUP BY 1),
         |w AS (SELECT *, CAST(sum(nb) OVER () AS BIGINT) AS n FROM b),
         |e AS (SELECT *, CAST(floor(nb * abs(CAST(svb AS DOUBLE) / (nb * mx) - CAST(pb AS DOUBLE) / nb) * 1e6 + 0.5) AS BIGINT) AS e6 FROM w),
         |f AS (SELECT *, CAST(sum(e6) OVER () AS BIGINT) AS ece6 FROM e)
         |SELECT bin, nb AS n, pb AS n_pos,
         |       ${Q.sqlR6("CAST(svb AS DOUBLE) / (nb * mx)")} AS mean_pred,
         |       ${Q.sqlR6("CAST(pb AS DOUBLE) / nb")} AS frac_pos,
         |       ${Q.sqlR6("CAST(ece6 AS DOUBLE) / (n * 1e6)")} AS ece
         |FROM f
         |ORDER BY bin""".stripMargin) { (s, d) =>
      calibrationOf(centsGrid(s, d))
    },

    // Hellinger distance between the purchase and click value
    // distributions (round 14) — the PMF member of the two-sample
    // family: the Bhattacharyya coefficient BC = Σ√(p·q) rewards
    // per-cell mass OVERLAP where the CDF members (KS/CvM/AD/W1)
    // integrate cumulative gaps, so a distribution that re-shuffles
    // mass among nearby cells moves Hellinger long before it moves W1.
    // Each cell's √(c1·c2)/(√n1·√n2) floors onto the 1e-9 lattice
    // BEFORE the order-free int64 sum (BC ≤ 1 ⇒ const-bounded).
    Q("q_hellinger",
      s"""WITH $CentsGridSql,
         |r AS (SELECT c1, c2,
         |             CAST(sum(c1) OVER () AS BIGINT) AS n1,
         |             CAST(sum(c2) OVER () AS BIGINT) AS n2
         |      FROM c),
         |t AS (SELECT CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
         |             CAST(coalesce(sum(CAST(floor(sqrt(CAST(c1 AS DOUBLE) * c2) /
         |               (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) * 1e9 + 0.5)
         |               AS BIGINT)), 0) AS BIGINT) AS bc9
         |      FROM r)
         |SELECT n1, n2,
         |       CASE WHEN n1 > 0 AND n2 > 0 THEN ${Q.sqlR6("bc9 / 1e9")} END AS bhattacharyya,
         |       CASE WHEN n1 > 0 AND n2 > 0 THEN ${Q.sqlR6("1 - bc9 / 1e9")} END AS hellinger_sq
         |FROM t""".stripMargin) { (s, d) =>
      hellingerOf(centsGrid(s, d))
    },

    // Energy distance between the purchase and click value
    // distributions (round 14) — the PAIRWISE-EXPECTATION member of
    // the family: D = 2·E|X−Y| − E|X−X'| − E|Y−Y'|, the statistic
    // behind the energy two-sample test, zero iff the distributions
    // coincide. In 1-D every expectation collapses onto a CDF
    // integral (E|X−Y| = ∫ F1(1−F2) + F2(1−F1) dv), so THREE exact
    // int64 segment sums over the grid replace the O(cells²) pair
    // expansion; the three divisions happen on the final sums.
    Q("q_energy_dist",
      s"""WITH $CentsGridSql,
         |r AS (SELECT v100,
         |             CAST(sum(c1) OVER (ORDER BY v100 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS r1,
         |             CAST(sum(c2) OVER (ORDER BY v100 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS r2,
         |             CAST(sum(c1) OVER () AS BIGINT) AS n1,
         |             CAST(sum(c2) OVER () AS BIGINT) AS n2,
         |             lead(v100) OVER (ORDER BY v100) - v100 AS w
         |      FROM c),
         |t AS (SELECT CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
         |             CAST(coalesce(sum(CASE WHEN w IS NOT NULL THEN
         |               w * (r1 * (n2 - r2) + r2 * (n1 - r1)) END), 0) AS BIGINT) AS axy,
         |             CAST(coalesce(sum(CASE WHEN w IS NOT NULL THEN
         |               w * 2 * r1 * (n1 - r1) END), 0) AS BIGINT) AS bxx,
         |             CAST(coalesce(sum(CASE WHEN w IS NOT NULL THEN
         |               w * 2 * r2 * (n2 - r2) END), 0) AS BIGINT) AS cyy
         |      FROM r)
         |SELECT n1, n2,
         |       CASE WHEN n1 > 0 AND n2 > 0 THEN
         |         ${Q.sqlR6("(2 * CAST(axy AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2) - " +
                   "CAST(bxx AS DOUBLE) / (CAST(n1 AS DOUBLE) * n1) - " +
                   "CAST(cyy AS DOUBLE) / (CAST(n2 AS DOUBLE) * n2)) / 100.0")}
         |       END AS energy_d
         |FROM t""".stripMargin) { (s, d) =>
      energyOf(centsGrid(s, d))
    },

    // One-way ANOVA of event value across event types (round 10) — does
    // the value distribution differ by type at all? The F statistic and
    // effect size η² from INTEGER sufficient statistics: values floored
    // to whole units keep every per-group Σv and Σv² (and their squares)
    // comfortably inside int64 AND inside double's 2^53 exact range, so
    // both engines compute F from identical numbers. The one cross-group
    // reduction (Σ s_g²/n_g) is integer-scaled to 1e-6 per group BEFORE
    // the 5-term sum — order-free. Shape: one map-side |types|-key agg,
    // then a single-row projection; corpus scanned once.
    Q("q_anova",
      s"""WITH m AS (SELECT event_type, CAST(floor(value) AS BIGINT) AS v FROM events),
         |g AS (SELECT event_type, count(*) AS n, CAST(sum(v) AS BIGINT) AS s,
         |             CAST(sum(v * v) AS BIGINT) AS ss
         |      FROM m GROUP BY 1),
         |t AS (SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS nn,
         |             CAST(sum(s) AS BIGINT) AS stot, CAST(sum(ss) AS BIGINT) AS sstot,
         |             CAST(sum(CAST(floor(CAST(s * s AS DOUBLE) / n * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS b6
         |      FROM g)
         |SELECT k, nn AS n,
         |       ${Q.sqlR6("((b6 / 1e6 - CAST(stot AS DOUBLE) * stot / nn) / (k - 1)) / ((sstot - b6 / 1e6) / (nn - k))")} AS f_stat,
         |       ${Q.sqlR6("(b6 / 1e6 - CAST(stot AS DOUBLE) * stot / nn) / (sstot - CAST(stot AS DOUBLE) * stot / nn)")} AS eta_sq
         |FROM t""".stripMargin) { (s, d) =>
      val g = Tables.events(s, d)
        .select(col("event_type"), floor(col("value")).cast("long").as("v"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("v").as("s"),
          sum(col("v") * col("v")).as("ss"))
      g.agg(count(lit(1)).as("k"), sum("n").as("nn"),
          sum("s").as("stot"), sum("ss").as("sstot"),
          sum(floor((col("s") * col("s")).cast("double") / col("n") * lit(1e6) + 0.5)
            .cast("long")).as("b6"))
        .select(col("k"), col("nn").as("n"),
          Q.r6(((col("b6") / lit(1e6) - col("stot").cast("double") * col("stot") / col("nn")) /
              (col("k") - 1)) /
            ((col("sstot") - col("b6") / lit(1e6)) / (col("nn") - col("k")))).as("f_stat"),
          Q.r6((col("b6") / lit(1e6) - col("stot").cast("double") * col("stot") / col("nn")) /
            (col("sstot") - col("stot").cast("double") * col("stot") / col("nn"))).as("eta_sq"))
    },

    // Cramér's V between event type and ISO day-of-week (round 10) —
    // the normalized contingency association: is traffic MIX a
    // function of weekday? Generalizes q_abtest's 2×2 chi-square to
    // the full 5×7 table. Every observed/margin count is an exact
    // int64; each cell's (o−e)²/e term is integer-scaled to 1e-9
    // BEFORE the 35-cell reduction (the q_mutual_info fold), so the
    // cross-cell sum is order-free. Shape: one (|types|×7)-key
    // map-side agg, margin windows over the 35-row frame, single-row
    // output.
    Q("q_cramers_v",
      s"""WITH e AS (SELECT event_type,
         |                  CAST(isodow(CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS dow
         |           FROM events),
         |c AS (SELECT event_type, dow, count(*) AS o FROM e GROUP BY 1, 2),
         |m AS (SELECT event_type, dow, o,
         |             CAST(sum(o) OVER (PARTITION BY event_type) AS BIGINT) AS r,
         |             CAST(sum(o) OVER (PARTITION BY dow) AS BIGINT) AS cc,
         |             CAST(sum(o) OVER () AS BIGINT) AS n
         |      FROM c),
         |t AS (SELECT max(n) AS n,
         |             CAST(sum(CAST(floor((o - CAST(r AS DOUBLE) * cc / n) * (o - CAST(r AS DOUBLE) * cc / n) / (CAST(r AS DOUBLE) * cc / n) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS chi9
         |      FROM m)
         |SELECT n, CAST(24 AS BIGINT) AS dof,
         |       ${Q.sqlR6("chi9 / 1e9")} AS chi2,
         |       ${Q.sqlR6("sqrt(chi9 / 1e9 / (n * 4))")} AS cramers_v
         |FROM t""".stripMargin) { (s, d) =>
      val c = Tables.events(s, d)
        .groupBy(col("event_type"),
          (weekday(col("ts").cast(DateType)) + 1).cast("long").as("dow"))
        .agg(count(lit(1)).as("o"))
      val ex = col("r").cast("double") * col("cc") / col("n")
      c.withColumn("r", sum("o").over(Window.partitionBy("event_type")))
        .withColumn("cc", sum("o").over(Window.partitionBy("dow")))
        .withColumn("n", sum("o").over(Window.partitionBy()))
        .agg(max("n").as("n"),
          sum(floor((col("o") - ex) * (col("o") - ex) / ex * lit(1e9) + 0.5)
            .cast("long")).as("chi9"))
        .select(col("n"), lit(24L).as("dof"),
          Q.r6(col("chi9") / lit(1e9)).as("chi2"),
          Q.r6(sqrt(col("chi9") / lit(1e9) / (col("n") * 4))).as("cramers_v"))
    },

    // Quantity-weighted median of line price per return flag (round
    // 10) — "the price at which half the UNITS ship", which a plain
    // median over lines cannot see (a 50-unit line counts once). Uses
    // the LOWER weighted median (first price whose running weight
    // reaches half the total): with integer cents and integer unit
    // weights the threshold test 2·cw ≥ tw is exact int64 — no
    // interpolation, no float anywhere until the display division.
    // Shapes: lines collapse to the distinct (flag, price) frame
    // first (map-side partials), the running-weight window and the
    // first-crossing pick run per flag over that collapsed frame. At
    // 100 TB the exact form still works (the frame is bounded by the
    // price DOMAIN, and the window parallelizes per flag); the
    // sketch substitute is a weighted t-digest (see q_agg_approx_pct).
    Q("q_weighted_median",
      s"""WITH m AS (SELECT l_returnflag AS flag,
         |                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS p,
         |                  CAST(floor(l_quantity) AS BIGINT) AS w
         |           FROM lineitem),
         |g AS (SELECT flag, p, CAST(sum(w) AS BIGINT) AS w FROM m GROUP BY 1, 2),
         |r AS (SELECT flag, p,
         |             CAST(sum(w) OVER (PARTITION BY flag ORDER BY p
         |                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
         |             CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS tw
         |      FROM g),
         |s AS (SELECT flag, p, tw, row_number() OVER (PARTITION BY flag ORDER BY p) AS rn
         |      FROM r WHERE 2 * cw >= tw)
         |SELECT flag, tw AS total_units, CAST(p AS DOUBLE) / 100 AS wmedian_price
         |FROM s WHERE rn = 1
         |ORDER BY flag""".stripMargin) { (s, d) =>
      val g = Tables.load(s, d, "lineitem")
        .select(col("l_returnflag").as("flag"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("p"),
          floor(col("l_quantity")).cast("long").as("w"))
        .groupBy("flag", "p").agg(sum("w").as("w"))
      val wf = Window.partitionBy("flag").orderBy("p")
      g.withColumn("cw", sum("w").over(wf.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tw", sum("w").over(Window.partitionBy("flag")))
        .filter(lit(2) * col("cw") >= col("tw"))
        .withColumn("rn", row_number().over(wf))
        .filter(col("rn") === 1)
        .select(col("flag"), col("tw").as("total_units"),
          (col("p").cast("double") / 100).as("wmedian_price"))
        .orderBy("flag")
    },

    // Benford first-digit profile of l_extendedprice (round 10) — the
    // fraud / synthetic-data smell test: natural multiplicative data
    // follows P(d) = log10(1+1/d). Portability trick: the first
    // significant digit comes from the CENTS int64 rendered as a
    // string (BIGINT→string is identical in both engines) — never from
    // log10-of-double, whose ulp at exact powers of ten could flip a
    // bucket. Per-digit expected share is per-row libm on nine
    // constant digits (never accumulated); every observed share is one
    // IEEE division of exact counts. Shape: map-side 9-key agg.
    Q("q_benford",
      s"""WITH c AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
         |           FROM lineitem),
         |g AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         |             count(*) AS cnt
         |      FROM c GROUP BY 1),
         |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM g)
         |SELECT digit, cnt,
         |       ${Q.sqlR6("CAST(cnt AS DOUBLE) / tot")} AS share,
         |       ${Q.sqlR6("ln(1.0 + 1.0 / digit) / ln(10.0)")} AS benford,
         |       ${Q.sqlR6("abs(CAST(cnt AS DOUBLE) / tot - ln(1.0 + 1.0 / digit) / ln(10.0))")} AS abs_dev
         |FROM g CROSS JOIN t
         |ORDER BY digit""".stripMargin) { (s, d) =>
      // single scan: the total is a window aggregate over the 9-row frame
      Tables.load(s, d, "lineitem")
        .select(floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
        .select(substring(col("cents").cast("string"), 1, 1).cast("long").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("cnt"))
        .withColumn("tot", sum("cnt").over(Window.partitionBy()))
        .select(col("digit"), col("cnt"),
          Q.r6(col("cnt").cast("double") / col("tot")).as("share"),
          Q.r6(log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0))).as("benford"),
          Q.r6(abs(col("cnt").cast("double") / col("tot") -
            log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)))).as("abs_dev"))
        .orderBy("digit")
    },

    // Mann–Whitney U rank-sum test between the purchase and click
    // value distributions (round 10) — the nonparametric companion to
    // q_ks_test over the SAME bounded distinct-cents frame: does one
    // distribution stochastically dominate the other? Exactness trick:
    // with tied values the average rank of a tie run [a..b] is
    // (a+b)/2, so TWICE the average rank (2·cum_before + t + 1) is an
    // exact int64 — 2·R1 = Σ c1·avg2 and 2·U1 = 2·R1 − n1·(n1+1) are
    // integer to the last bit, as is the tie-correction Σ(t³−t). The
    // only doubles are the final z / effect-size divisions over those
    // exact integers (sqrt formula text mirrored per PARITY). Shape:
    // corpus → distinct-cents frame (domain-bounded, not
    // corpus-bounded), running windows over that frame, one-row output.
    Q("q_mann_whitney",
      s"""WITH $CentsGridSql,
         |r AS (SELECT c1, c2, c1 + c2 AS t,
         |             CAST(coalesce(sum(c1 + c2) OVER (ORDER BY v100
         |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |                  AS BIGINT) AS cb
         |      FROM c),
         |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
         |             CAST(sum(c1 * (2 * cb + t + 1)) AS BIGINT) AS r1x2,
         |             CAST(sum(t * t * t - t) AS BIGINT) AS ties
         |      FROM r)
         |SELECT n1, n2,
         |       ${Q.sqlR6("(r1x2 - n1 * (n1 + 1)) / 2.0")} AS u1,
         |       CASE WHEN CAST(n1 AS DOUBLE) * n2 / 12.0 * ((n1 + n2 + 1) - CAST(ties AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))) > 0 THEN ${Q.sqlR6("(r1x2 - n1 * (n1 + 1) - CAST(n1 AS DOUBLE) * n2) / (2.0 * sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0 * ((n1 + n2 + 1) - CAST(ties AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1)))))")} END AS z,
         |       ${Q.sqlR6("(r1x2 - n1 * (n1 + 1) - CAST(n1 AS DOUBLE) * n2) / (CAST(n1 AS DOUBLE) * n2)")} AS rank_biserial
         |FROM t""".stripMargin) { (s, d) =>
      // routed through the shared cents grid since round 14 — the
      // NINTH statistic the one (v100, c1, c2) exchange serves
      mwOf(centsGrid(s, d))
    },

    // Ansari–Bradley two-sample scale test (round 15): do purchase and
    // click values differ in DISPERSION — the rank test q_mann_whitney
    // cannot see (AB scores min(i, N+1−i) peak at the median, so a
    // group pushed into the tails collects a SMALL score sum;
    // z < 0 ⇒ group 1 more dispersed). Same shared cents grid, same
    // single running-count window; tie runs take their exact average
    // score via the closed-form prefix f(x) = Σ min(i, N+1−i), each
    // run's share latticed to 1e-3 before the order-free int64 fold;
    // the z moments are the classical no-tie forms (documented
    // approximation under ties, identical in both engines).
    Q("q_ansari_bradley",
      s"""WITH $CentsGridSql,
         |r AS (SELECT c1, c1 + c2 AS t,
         |             CAST(coalesce(sum(c1 + c2) OVER (ORDER BY v100
         |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |                  AS BIGINT) AS cb
         |      FROM c),
         |r2 AS (SELECT c1, t, cb, CAST(sum(t) OVER () AS BIGINT) AS nn FROM r),
         |s AS (SELECT c1, t,
         |             (CASE WHEN cb + t <= floor((nn + 1) / 2.0)
         |                THEN (cb + t) * (cb + t + 1) / 2.0
         |                ELSE floor((nn + 1) / 2.0) * (floor((nn + 1) / 2.0) + 1) / 2.0 +
         |                  ((nn - floor((nn + 1) / 2.0)) * (nn - floor((nn + 1) / 2.0) + 1) -
         |                   (nn - cb - t) * (nn - cb - t + 1)) / 2.0 END
         |              -
         |              CASE WHEN cb <= floor((nn + 1) / 2.0)
         |                THEN cb * (cb + 1) / 2.0
         |                ELSE floor((nn + 1) / 2.0) * (floor((nn + 1) / 2.0) + 1) / 2.0 +
         |                  ((nn - floor((nn + 1) / 2.0)) * (nn - floor((nn + 1) / 2.0) + 1) -
         |                   (nn - cb) * (nn - cb + 1)) / 2.0 END) AS srun,
         |             nn
         |      FROM r2),
         |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
         |             CAST(max(nn) - sum(c1) AS BIGINT) AS n2,
         |             CAST(coalesce(sum(CAST(floor(c1 * srun / t * 1e3 + 0.5) AS BIGINT)), 0) AS BIGINT) AS ab3
         |      FROM s)
         |SELECT n1, n2, ${Q.sqlR6("ab3 / 1e3")} AS ab,
         |       CASE WHEN n1 > 0 AND n2 > 0 AND
         |         (CASE WHEN (n1 + n2) % 2 = 0
         |            THEN CAST(n1 AS DOUBLE) * n2 * (n1 + n2 + 2) * (n1 + n2 - 2) / (48.0 * (n1 + n2 - 1))
         |            ELSE CAST(n1 AS DOUBLE) * n2 * (n1 + n2 + 1) * (3.0 + CAST(n1 + n2 AS DOUBLE) * (n1 + n2)) / (48.0 * (n1 + n2) * (n1 + n2)) END) > 0
         |       THEN ${Q.sqlR6(
                 "(ab3 / 1e3 - CASE WHEN (n1 + n2) % 2 = 0 " +
                 "THEN CAST(n1 AS DOUBLE) * (n1 + n2 + 2) / 4.0 " +
                 "ELSE CAST(n1 AS DOUBLE) * (n1 + n2 + 1) * (n1 + n2 + 1) / (4.0 * (n1 + n2)) END) / " +
                 "sqrt(CASE WHEN (n1 + n2) % 2 = 0 " +
                 "THEN CAST(n1 AS DOUBLE) * n2 * (n1 + n2 + 2) * (n1 + n2 - 2) / (48.0 * (n1 + n2 - 1)) " +
                 "ELSE CAST(n1 AS DOUBLE) * n2 * (n1 + n2 + 1) * (3.0 + CAST(n1 + n2 AS DOUBLE) * (n1 + n2)) / (48.0 * (n1 + n2) * (n1 + n2)) END)")}
         |       END AS z
         |FROM t""".stripMargin) { (s, d) =>
      abOf(centsGrid(s, d))
    },

    // Brunner–Munzel test between purchase and click values (round
    // 15): the heteroscedastic replacement for q_mann_whitney — BM
    // studentizes the rank mean gap with PER-GROUP rank variances and
    // a Welch-type df, so unequal spreads (exactly what
    // q_ansari_bradley detects) no longer invalidate the location
    // test; p_hat is the common-language effect P(X1 < X2) + ½ties.
    // Same shared cents grid; overall AND within-group doubled
    // midranks off one window chain; each cell's c·d² floors onto the
    // 1e3 lattice (r16 — the ab3 precision) before an order-free
    // DECIMAL(38,0) fold (r17 — the N³·1e3 growth was the repo's
    // tightest int64 ceiling at sf ≤ 0.4; decimal lifts the cliff to
    // the 1e38 width with bit-identical outputs).
    // Degenerate-group guard (r16): zero purchases or zero clicks
    // NULL the deviations in BOTH engines (when()/CASE WHEN), so the
    // engines degrade identically instead of NULL-vs-error.
    Q("q_brunner_munzel",
      s"""WITH $CentsGridSql,
         |r AS (SELECT c1, c2, c1 + c2 AS t,
         |             CAST(coalesce(sum(c1 + c2) OVER (ORDER BY v100
         |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |                  AS BIGINT) AS cb,
         |             CAST(coalesce(sum(c1) OVER (ORDER BY v100
         |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |                  AS BIGINT) AS cb1,
         |             CAST(coalesce(sum(c2) OVER (ORDER BY v100
         |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |                  AS BIGINT) AS cb2
         |      FROM c),
         |r2 AS (SELECT *, CAST(2 * cb + t + 1 AS BIGINT) AS r2c,
         |              CAST(sum(c1) OVER () AS BIGINT) AS n1,
         |              CAST(sum(c2) OVER () AS BIGINT) AS n2,
         |              CAST(sum(c1 * (2 * cb + t + 1)) OVER () AS BIGINT) AS rx2,
         |              CAST(sum(c2 * (2 * cb + t + 1)) OVER () AS BIGINT) AS ry2
         |       FROM r),
         |t AS (SELECT CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
         |             CAST(max(rx2) AS BIGINT) AS rx2, CAST(max(ry2) AS BIGINT) AS ry2,
         |             CAST(coalesce(sum(CASE WHEN n1 > 0 THEN CAST(floor(c1 *
         |               ((r2c - (2 * cb1 + c1 + 1)) / 2.0 + (n1 + 1) / 2.0 - rx2 / (2.0 * n1)) *
         |               ((r2c - (2 * cb1 + c1 + 1)) / 2.0 + (n1 + 1) / 2.0 - rx2 / (2.0 * n1))
         |               * 1e3 + 0.5) AS DECIMAL(38,0)) END), 0) AS DECIMAL(38,0)) AS u1,
         |             CAST(coalesce(sum(CASE WHEN n2 > 0 THEN CAST(floor(c2 *
         |               ((r2c - (2 * cb2 + c2 + 1)) / 2.0 + (n2 + 1) / 2.0 - ry2 / (2.0 * n2)) *
         |               ((r2c - (2 * cb2 + c2 + 1)) / 2.0 + (n2 + 1) / 2.0 - ry2 / (2.0 * n2))
         |               * 1e3 + 0.5) AS DECIMAL(38,0)) END), 0) AS DECIMAL(38,0)) AS u2
         |      FROM r2)
         |SELECT n1, n2,
         |       CASE WHEN n1 > 0 AND n2 > 0 THEN
         |         ${Q.sqlR6("(ry2 / (2.0 * n2) - (n2 + 1) / 2.0) / n1")} END AS p_hat,
         |       CASE WHEN n1 >= 2 AND n2 >= 2 AND
         |         n1 * ((u1 / 1e3) / (n1 - 1.0)) + n2 * ((u2 / 1e3) / (n2 - 1.0)) > 0 THEN
         |         ${Q.sqlR6("n1 * n2 * (ry2 / (2.0 * n2) - rx2 / (2.0 * n1)) / (n1 + n2) / " +
                   "sqrt(n1 * ((u1 / 1e3) / (n1 - 1.0)) + n2 * ((u2 / 1e3) / (n2 - 1.0)))")}
         |       END AS w,
         |       CASE WHEN n1 >= 2 AND n2 >= 2 AND
         |         (n1 * ((u1 / 1e3) / (n1 - 1.0))) * (n1 * ((u1 / 1e3) / (n1 - 1.0))) / (n1 - 1.0) +
         |         (n2 * ((u2 / 1e3) / (n2 - 1.0))) * (n2 * ((u2 / 1e3) / (n2 - 1.0))) / (n2 - 1.0) > 0 THEN
         |         ${Q.sqlR2("(n1 * ((u1 / 1e3) / (n1 - 1.0)) + n2 * ((u2 / 1e3) / (n2 - 1.0))) * " +
                   "(n1 * ((u1 / 1e3) / (n1 - 1.0)) + n2 * ((u2 / 1e3) / (n2 - 1.0))) / " +
                   "((n1 * ((u1 / 1e3) / (n1 - 1.0))) * (n1 * ((u1 / 1e3) / (n1 - 1.0))) / (n1 - 1.0) + " +
                   "(n2 * ((u2 / 1e3) / (n2 - 1.0))) * (n2 * ((u2 / 1e3) / (n2 - 1.0))) / (n2 - 1.0))")}
         |       END AS df
         |FROM t""".stripMargin) { (s, d) =>
      bmOf(centsGrid(s, d))
    },

    // Kruskal–Wallis H across ALL event types (round 14) — the
    // k-sample generalization of q_mann_whitney's two-sample rank test:
    // does ANY type's value distribution stochastically differ? Same
    // exactness machinery: on the bounded distinct-cents grid, DOUBLED
    // average ranks (2·cb + t + 1 per tie run) make every per-group
    // rank sum r2_g = 2·R_g an exact int64, as is the tie term
    // Σ(t³−t). The one cross-group reduction of non-integers —
    // Σ_g R_g²/n_g — uses the q_anova order-free move: each group's
    // r2_g²/(4·n_g) is floored to the UNIT lattice before the k-row
    // sum, so summation order cannot shift a bit (identical integers
    // in both engines; the ≤k/2 absolute floor error is ~1e-9 relative
    // at any real N and, being identical on both sides, can never
    // split the r6 rounding). Headroom: Σ R²/n ≤ N³ — 1e15 at sf0.1,
    // inside int64 with 9000× room (OverflowHeadroomSpec row). Shape:
    // corpus → (type, cents) grid agg, one running window over the
    // distinct-cents frame, k-row group frame, single-row output.
    Q("q_kruskal_wallis",
      s"""WITH v AS (SELECT event_type AS g,
         |                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v100
         |           FROM events),
         |c AS (SELECT g, v100, count(*) AS c FROM v GROUP BY 1, 2),
         |tv AS (SELECT v100, CAST(sum(c) AS BIGINT) AS t FROM c GROUP BY 1),
         |tr AS (SELECT v100, t,
         |              CAST(coalesce(sum(t) OVER (ORDER BY v100
         |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |                   AS BIGINT) AS cb
         |       FROM tv),
         |gr AS (SELECT c.g, CAST(sum(c.c) AS BIGINT) AS n_g,
         |              CAST(sum(c.c * (2 * tr.cb + tr.t + 1)) AS BIGINT) AS r2
         |       FROM c JOIN tr ON c.v100 = tr.v100 GROUP BY 1),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n_g) AS BIGINT) AS n,
         |              CAST(sum(CAST(floor(CAST(r2 AS DOUBLE) * r2 / (4.0 * n_g) + 0.5) AS BIGINT)) AS BIGINT) AS b0
         |       FROM gr),
         |tc AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS ties FROM tv)
         |SELECT st.k, st.n,
         |       ${Q.sqlR6("12.0 / (st.n * (st.n + 1.0)) * st.b0 - 3.0 * (st.n + 1)")} AS h,
         |       CASE WHEN CAST(tc.ties AS DOUBLE) < CAST(st.n AS DOUBLE) * st.n * st.n - st.n THEN ${Q.sqlR6("(12.0 / (st.n * (st.n + 1.0)) * st.b0 - 3.0 * (st.n + 1)) / (1.0 - CAST(tc.ties AS DOUBLE) / (CAST(st.n AS DOUBLE) * st.n * st.n - st.n))")} END AS h_tie_adj,
         |       ${Q.sqlR6("(12.0 / (st.n * (st.n + 1.0)) * st.b0 - 3.0 * (st.n + 1) - st.k + 1) / (st.n - st.k)")} AS epsilon_sq
         |FROM st CROSS JOIN tc""".stripMargin) { (s, d) =>
      kruskalWallisOf(Tables.events(s, d)
        .select(col("event_type").as("g"),
          floor(col("value") * 100 + 0.5).cast("long").as("v100"))
        .groupBy("g", "v100").agg(count(lit(1)).as("c")))
    },

    // Dunn's post-hoc pairwise rank test across event types — WHICH
    // pair differs after q_kruskal_wallis' single H says "some pair
    // does" (the rank-world twin of q_tukey_hsd's role after q_anova).
    // z_ij = (R̄_i − R̄_j)/√(V·(1/n_i + 1/n_j)) with the tie-adjusted
    // pooled-rank variance V = N(N+1)/12 − Σ(t³−t)/(12(N−1)). Rides
    // KW's exact machinery verbatim: doubled average ranks on the
    // bounded distinct-cents grid make every group rank sum r2 = 2·R
    // an exact int64, as are N and the tie term; each pair's z is then
    // one mirrored double tree over those integers, and the pair
    // fan-out is a |types|² broadcast nested loop over the collapsed
    // |types|-row stats frame — never the corpus.
    Q("q_dunn",
      s"""WITH v AS (SELECT event_type AS g,
         |                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v100
         |           FROM events),
         |c AS (SELECT g, v100, count(*) AS c FROM v GROUP BY 1, 2),
         |tv AS (SELECT v100, CAST(sum(c) AS BIGINT) AS t FROM c GROUP BY 1),
         |tr AS (SELECT v100, t,
         |              CAST(coalesce(sum(t) OVER (ORDER BY v100
         |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |                   AS BIGINT) AS cb
         |       FROM tv),
         |gr AS (SELECT c.g, CAST(sum(c.c) AS BIGINT) AS n_g,
         |              CAST(sum(c.c * (2 * tr.cb + tr.t + 1)) AS BIGINT) AS r2
         |       FROM c JOIN tr ON c.v100 = tr.v100 GROUP BY 1),
         |st AS (SELECT CAST(sum(n_g) AS BIGINT) AS n FROM gr),
         |tc AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS ties FROM tv)
         |SELECT a.g AS type_a, b.g AS type_b, a.n_g AS n_a, b.n_g AS n_b,
         |       ${Q.sqlR6("a.r2 / (2.0 * a.n_g)")} AS mean_rank_a,
         |       ${Q.sqlR6("b.r2 / (2.0 * b.n_g)")} AS mean_rank_b,
         |       CASE WHEN st.n > 1
         |                 AND st.n * (st.n + 1) / 12.0 - tc.ties / (12.0 * (st.n - 1)) > 0 THEN
         |         ${Q.sqlR6("(a.r2 / (2.0 * a.n_g) - b.r2 / (2.0 * b.n_g)) / sqrt((st.n * (st.n + 1) / 12.0 - tc.ties / (12.0 * (st.n - 1))) * (1.0 / a.n_g + 1.0 / b.n_g))")}
         |       END AS z
         |FROM gr a JOIN gr b ON a.g < b.g CROSS JOIN st CROSS JOIN tc
         |ORDER BY type_a, type_b""".stripMargin) { (s, d) =>
      dunnOf(Tables.events(s, d)
        .select(col("event_type").as("g"),
          floor(col("value") * 100 + 0.5).cast("long").as("v100"))
        .groupBy("g", "v100").agg(count(lit(1)).as("c")))
    },

    // Jonckheere–Terpstra ordered-alternative test across event types
    // (lexicographic order as the hypothesized ordering — the same
    // convention as q_page_trend, which plays this role in the BLOCK
    // design while JT plays it in q_kruskal_wallis' pooled design):
    // J = Σ_{i<j} U_ij accumulates every ordered pair's Mann–Whitney
    // count, so a monotone drift of the value distributions along the
    // type order reads as z where KW's H only says "they differ".
    // Exactness: on the DENSE (type × distinct-cents) grid (the
    // q_friedman zero-fill move — cumulative-below must be defined at
    // every grid value, not just the group's own), 2U_ij = Σ_v
    // (2·c_j·cb_i + c_j·c_i) is exact int64, as are N and Σn_g²(2n_g+3);
    // the classical no-tie moments (documented approximation under
    // ties) walk one mirrored tree, with N²(2N+3) squared in DOUBLE
    // (identical in both engines — int64 would overflow at ~12× this
    // volume). Shape: cents-grid agg → |types|·|grid| dense frame →
    // pair join on the grid value (j_a < j_b) → single row.
    Q("q_jonckheere",
      s"""WITH v AS (SELECT event_type AS g,
         |                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v100
         |           FROM events),
         |c AS (SELECT g, v100, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2),
         |gr AS (SELECT g, CAST(row_number() OVER (ORDER BY g) AS BIGINT) AS j
         |       FROM (SELECT DISTINCT g FROM c)),
         |dv AS (SELECT DISTINCT v100 FROM c),
         |dense AS (SELECT gr.g, gr.j, dv.v100, COALESCE(c.c, 0) AS c
         |          FROM gr CROSS JOIN dv
         |          LEFT JOIN c ON c.g = gr.g AND c.v100 = dv.v100),
         |cb AS (SELECT g, j, v100, c,
         |              CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY v100
         |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |                   AS BIGINT) AS below
         |       FROM dense),
         |u AS (SELECT CAST(sum(2 * b.c * a.below + b.c * a.c) AS BIGINT) AS j2
         |      FROM cb a JOIN cb b ON a.v100 = b.v100 AND a.j < b.j),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS nn,
         |             CAST(sum(ng * ng) AS BIGINT) AS sn2,
         |             CAST(sum(ng * ng * (2 * ng + 3)) AS BIGINT) AS sn23
         |      FROM (SELECT g, CAST(sum(c) AS BIGINT) AS ng FROM c GROUP BY 1))
         |SELECT n.k AS n_types, n.nn AS n, ${Q.sqlR6("u.j2 / 2.0")} AS j_stat,
         |       CASE WHEN n.k >= 2
         |                 AND CAST(n.nn AS DOUBLE) * n.nn * (2 * n.nn + 3) - n.sn23 > 0 THEN
         |         ${Q.sqlR6("(u.j2 / 2.0 - (n.nn * n.nn - n.sn2) / 4.0) / " +
                   "sqrt((CAST(n.nn AS DOUBLE) * n.nn * (2 * n.nn + 3) - n.sn23) / 72.0)")}
         |       END AS z
         |FROM u CROSS JOIN n""".stripMargin) { (s, d) =>
      jonckheereOf(Tables.events(s, d)
        .select(col("event_type").as("g"),
          floor(col("value") * 100 + 0.5).cast("long").as("v100"))
        .groupBy("g", "v100").agg(count(lit(1)).as("c")))
    },

    // Bartlett's test of variance homogeneity across event types
    // (round 14) — the gate in front of q_anova: its F statistic
    // assumes equal group variances, and Bartlett is the classical
    // (normality-sensitive) check beside q_brown_forsythe's robust
    // median variant. Exactness: groups collapse to exact int64
    // (n, Σv, Σv²); the three cross-group reductions of non-integers —
    // within-group SS, (n−1)·ln S², 1/(n−1) — are integer-scaled PER
    // GROUP before their k-row sums (1e6/1e6/1e12 lattices — the
    // q_anova b6 move), so summation order cannot move a bit; the
    // statistic is then one mirrored double tree over identical
    // integers. Degenerate groups (n < 2 or zero variance — an exact
    // INTEGER n·Σv² − (Σv)² ≤ 0 check, no ln(0) hazard) are excluded
    // in both engines. Shape: one |types|-key map-side-partial agg,
    // k-row frame, single-row output.
    Q("q_bartlett",
      s"""WITH m AS (SELECT event_type, CAST(floor(value) AS BIGINT) AS v FROM events),
         |g0 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |              CAST(sum(v) AS BIGINT) AS s, CAST(sum(v * v) AS BIGINT) AS ss
         |       FROM m GROUP BY 1),
         |g AS (SELECT n,
         |             CAST(floor((ss - CAST(s AS DOUBLE) * s / n) * 1e6 + 0.5) AS BIGINT) AS w6,
         |             CAST(floor((n - 1) * ln((ss - CAST(s AS DOUBLE) * s / n) / (n - 1)) * 1e6 + 0.5) AS BIGINT) AS lt6,
         |             CAST(floor(1e12 / (n - 1) + 0.5) AS BIGINT) AS inv12
         |      FROM g0 WHERE n >= 2 AND n * ss - s * s > 0),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
         |             CAST(sum(w6) AS BIGINT) AS sw6, CAST(sum(lt6) AS BIGINT) AS slt6,
         |             CAST(sum(inv12) AS BIGINT) AS sinv12
         |      FROM g)
         |SELECT k, nn AS n,
         |       ${Q.sqlR6("((nn - k) * ln(sw6 / 1e6 / (nn - k)) - slt6 / 1e6) / (1.0 + (sinv12 / 1e12 - 1.0 / (nn - k)) / (3.0 * (k - 1)))")} AS bartlett_t
         |FROM t WHERE k >= 2""".stripMargin) { (s, d) =>
      val g0 = Tables.events(s, d)
        .select(col("event_type"), floor(col("value")).cast("long").as("v"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("v").as("s"), sum(col("v") * col("v")).as("ss"))
      val ssw = col("ss") - col("s").cast("double") * col("s") / col("n")
      val g = g0
        .filter(col("n") >= 2 && col("n") * col("ss") - col("s") * col("s") > 0)
        .select(col("n"),
          floor(ssw * lit(1e6) + 0.5).cast("long").as("w6"),
          floor((col("n") - 1) * log(ssw / (col("n") - 1)) * lit(1e6) + 0.5)
            .cast("long").as("lt6"),
          floor(lit(1e12) / (col("n") - 1) + 0.5).cast("long").as("inv12"))
      val t = g.agg(count(lit(1)).as("k"), sum("n").as("nn"),
        sum("w6").as("sw6"), sum("lt6").as("slt6"), sum("inv12").as("sinv12"))
      t.filter(col("k") >= 2)
        .select(col("k"), col("nn").as("n"),
          Q.r6(((col("nn") - col("k")) *
            log(col("sw6") / lit(1e6) / (col("nn") - col("k"))) -
            col("slt6") / lit(1e6)) /
            (lit(1.0) + (col("sinv12") / lit(1e12) -
              lit(1.0) / (col("nn") - col("k"))) /
              (lit(3.0) * (col("k") - 1)))).as("bartlett_t"))
    },

    // Cochran–Armitage trend test (round 14) — is the purchase SHARE
    // monotone across the ordered weekday axis? q_cramers_v sees
    // association; this sees DIRECTION, with weekday index 1..7 as the
    // score vector. Every sufficient statistic is an exact int64 from
    // one 7-key agg (N, R, Σw·n, Σw²·n, Σw·r); the numerator
    // N·Σwr − R·Σwn is exact int64 arithmetic, and z is ONE mirrored
    // division over those integers — no lattice needed anywhere.
    // Spark `weekday()+1` ↔ DuckDB `isodow` (the q_cramers_v pairing).
    Q("q_chisq_trend",
      s"""WITH e AS (SELECT CAST(isodow(CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS w,
         |                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS r
         |           FROM events),
         |c AS (SELECT w, CAST(count(*) AS BIGINT) AS n, CAST(sum(r) AS BIGINT) AS r
         |      FROM e GROUP BY 1),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(r) AS BIGINT) AS rr,
         |             CAST(sum(w * n) AS BIGINT) AS swn,
         |             CAST(sum(w * w * n) AS BIGINT) AS swwn,
         |             CAST(sum(w * r) AS BIGINT) AS swr
         |      FROM c)
         |SELECT nn AS n, rr AS n_purchase,
         |       ${Q.sqlR6("(CAST(nn AS DOUBLE) * swr - CAST(rr AS DOUBLE) * swn) / sqrt(CAST(rr AS DOUBLE) * (nn - rr) / nn * (CAST(nn AS DOUBLE) * swwn - CAST(swn AS DOUBLE) * swn))")} AS z,
         |       ${Q.sqlR6("(CAST(nn AS DOUBLE) * swr - CAST(rr AS DOUBLE) * swn) * (CAST(nn AS DOUBLE) * swr - CAST(rr AS DOUBLE) * swn) / (CAST(rr AS DOUBLE) * (nn - rr) / nn * (CAST(nn AS DOUBLE) * swwn - CAST(swn AS DOUBLE) * swn))")} AS chi2
         |FROM t""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DateType
      val t = Tables.events(s, d)
        .select((weekday(col("ts").cast(DateType)) + 1).cast("long").as("w"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("r"))
        .groupBy("w").agg(count(lit(1)).as("n"), sum("r").as("r"))
        .agg(sum("n").as("nn"), sum("r").as("rr"),
          sum(col("w") * col("n")).as("swn"),
          sum(col("w") * col("w") * col("n")).as("swwn"),
          sum(col("w") * col("r")).as("swr"))
      val num = col("nn").cast("double") * col("swr") - col("rr").cast("double") * col("swn")
      val den = col("rr").cast("double") * (col("nn") - col("rr")) / col("nn") *
        (col("nn").cast("double") * col("swwn") - col("swn").cast("double") * col("swn"))
      t.select(col("nn").as("n"), col("rr").as("n_purchase"),
        Q.r6(num / sqrt(den)).as("z"),
        Q.r6(num * num / den).as("chi2"))
    },

    // Spearman rank correlation over the three SMALL-domain lineitem
    // measures (round 10) — the monotone-dependence screen Pearson
    // (q_corr_matrix) cannot see. Heavy ties are the interesting case:
    // quantity/discount/tax have 50/11/9 distinct values, so average
    // ranks are mandatory, and DOUBLED average ranks keep everything
    // integer (2·avg = 2·cum_incl − t + 1 from a RANGE-framed running
    // sum that includes ties in both engines). The corpus collapses to
    // ONE (q,d,t)-key joint frame (≤ 50·11·9 cells — domain-bounded);
    // marginal rank columns are window sums over that frame (no second
    // corpus scan, no joins); the three pairs' sufficient statistics
    // land in one agg and expand in-row (the q_corr_matrix move). Σ
    // c·rx·ry ≤ 4n³ stays inside int64 through sf0.1 (~2e17); at sf ≥ 1
    // the cross sums need DECIMAL accumulators, noted here.
    Q("q_spearman",
      s"""WITH m AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS q,
         |                  CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,
         |                  CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS t
         |           FROM lineitem),
         |j AS (SELECT q, d, t, count(*) AS c FROM m GROUP BY 1, 2, 3),
         |r AS (SELECT c,
         |             2 * CAST(sum(c) OVER (ORDER BY q) AS BIGINT)
         |               - CAST(sum(c) OVER (PARTITION BY q) AS BIGINT) + 1 AS rq,
         |             2 * CAST(sum(c) OVER (ORDER BY d) AS BIGINT)
         |               - CAST(sum(c) OVER (PARTITION BY d) AS BIGINT) + 1 AS rd,
         |             2 * CAST(sum(c) OVER (ORDER BY t) AS BIGINT)
         |               - CAST(sum(c) OVER (PARTITION BY t) AS BIGINT) + 1 AS rt
         |      FROM j),
         |st AS (SELECT CAST(sum(c) AS BIGINT) AS n,
         |              CAST(sum(c * rq) AS BIGINT) AS sq, CAST(sum(c * rd) AS BIGINT) AS sd,
         |              CAST(sum(c * rt) AS BIGINT) AS st,
         |              CAST(sum(c * rq * rq) AS BIGINT) AS qq, CAST(sum(c * rd * rd) AS BIGINT) AS dd,
         |              CAST(sum(c * rt * rt) AS BIGINT) AS tt,
         |              CAST(sum(c * rq * rd) AS BIGINT) AS qd, CAST(sum(c * rq * rt) AS BIGINT) AS qt,
         |              CAST(sum(c * rd * rt) AS BIGINT) AS dt
         |       FROM r),
         |pr AS (SELECT 'quantity' AS var1, 'discount' AS var2, n, sq AS sx, sd AS sy, qd AS sxy, qq AS sxx, dd AS syy FROM st
         |       UNION ALL SELECT 'quantity', 'tax', n, sq, st, qt, qq, tt FROM st
         |       UNION ALL SELECT 'discount', 'tax', n, sd, st, dt, dd, tt FROM st)
         |SELECT var1, var2, n,
         |       ${Q.sqlR6("(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy))")} AS rho
         |FROM pr
         |ORDER BY var1, var2""".stripMargin) { (s, d) =>
      val j = Tables.load(s, d, "lineitem")
        .select(floor(col("l_quantity")).cast("long").as("q"),
          floor(col("l_discount") * 100 + 0.5).cast("long").as("d"),
          floor(col("l_tax") * 100 + 0.5).cast("long").as("t"))
        .groupBy("q", "d", "t").agg(count(lit(1)).as("c"))
      // RANGE-framed running sums (default frame under orderBy) include
      // tie rows in both engines: 2·avg_rank = 2·cum_incl − t_cnt + 1
      def avg2(k: String) =
        (lit(2) * sum("c").over(Window.orderBy(k)) -
          sum("c").over(Window.partitionBy(k)) + 1).as("r" + k)
      val st = j.select(col("c"), avg2("q"), avg2("d"), avg2("t"))
        .agg(sum("c").as("n"),
          sum(col("c") * col("rq")).as("sq"), sum(col("c") * col("rd")).as("sd"),
          sum(col("c") * col("rt")).as("st"),
          sum(col("c") * col("rq") * col("rq")).as("qq"),
          sum(col("c") * col("rd") * col("rd")).as("dd"),
          sum(col("c") * col("rt") * col("rt")).as("tt"),
          sum(col("c") * col("rq") * col("rd")).as("qd"),
          sum(col("c") * col("rq") * col("rt")).as("qt"),
          sum(col("c") * col("rd") * col("rt")).as("dt"))
      def pair(v1: String, v2: String, sx: String, sy: String,
               sxy: String, sxx: String, syy: String) =
        struct(lit(v1).as("var1"), lit(v2).as("var2"),
          col(sx).as("sx"), col(sy).as("sy"), col(sxy).as("sxy"),
          col(sxx).as("sxx"), col(syy).as("syy"))
      st.select(col("n"), explode(array(
          pair("quantity", "discount", "sq", "sd", "qd", "qq", "dd"),
          pair("quantity", "tax", "sq", "st", "qt", "qq", "tt"),
          pair("discount", "tax", "sd", "st", "dt", "dd", "tt"))).as("pr"))
        .select(col("pr.var1").as("var1"), col("pr.var2").as("var2"), col("n"),
          Q.r6((col("n") * col("pr.sxy").cast("double") -
              col("pr.sx").cast("double") * col("pr.sy")) /
            (sqrt(col("n") * col("pr.sxx").cast("double") -
              col("pr.sx").cast("double") * col("pr.sx")) *
             sqrt(col("n") * col("pr.syy").cast("double") -
              col("pr.sy").cast("double") * col("pr.sy")))).as("rho"))
        .orderBy("var1", "var2")
    },

    // Herfindahl–Hirschman market-concentration index of supplier
    // revenue within each nation (round 10) — the antitrust-style
    // concentration monitor: HHI = Σ shareᵢ² scaled ×10000, plus the
    // top-supplier share (CR1). Revenue floors to whole dollars per
    // line so every per-supplier sum is an exact int64 and Σ sᵢ² stays
    // well inside int64 at any catalog size (squares are per-SUPPLIER
    // totals — catalog-sized, not corpus-sized). Shape: ONE fact-table
    // agg keyed by suppkey (map-side partials), a broadcast join to
    // the catalog-sized supplier→nation map, then a |nations|-key agg;
    // the fact table never shuffles on anything but suppkey.
    Q("q_hhi",
      s"""WITH sr AS (SELECT l_suppkey,
         |                   CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS rev
         |            FROM lineitem GROUP BY 1),
         |sn AS (SELECT sr.l_suppkey, n.n_name, sr.rev
         |       FROM sr JOIN supplier s ON sr.l_suppkey = s.s_suppkey
         |               JOIN nation n ON s.s_nationkey = n.n_nationkey),
         |g AS (SELECT n_name, count(*) AS n_suppliers,
         |             CAST(sum(rev) AS BIGINT) AS total_rev,
         |             CAST(sum(rev * rev) AS BIGINT) AS sum_sq,
         |             CAST(max(rev) AS BIGINT) AS max_rev
         |      FROM sn GROUP BY 1)
         |SELECT n_name, n_suppliers, total_rev,
         |       ${Q.sqlR6("CAST(sum_sq AS DOUBLE) / (CAST(total_rev AS DOUBLE) * total_rev) * 10000")} AS hhi,
         |       ${Q.sqlR6("CAST(max_rev AS DOUBLE) / total_rev")} AS cr1
         |FROM g
         |ORDER BY n_name""".stripMargin) { (s, d) =>
      val sr = Tables.load(s, d, "lineitem")
        .groupBy("l_suppkey")
        .agg(sum(floor(col("l_extendedprice")).cast("long")).as("rev"))
      val supp = Tables.load(s, d, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val nat = Tables.load(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"))
      // supplier grows with SF — no broadcast hint; the planner/AQE
      // size-decides (r18 broadcast-bound walk).
      sr.join(supp, sr("l_suppkey") === supp("s_suppkey"))
        .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_suppliers"),
          sum("rev").as("total_rev"),
          sum(col("rev") * col("rev")).as("sum_sq"),
          max("rev").as("max_rev"))
        .select(col("n_name"), col("n_suppliers"), col("total_rev"),
          Q.r6(col("sum_sq").cast("double") /
            (col("total_rev").cast("double") * col("total_rev")) * 10000).as("hhi"),
          Q.r6(col("max_rev").cast("double") / col("total_rev")).as("cr1"))
        .orderBy("n_name")
    },

    // Kendall τ-b over the three small-domain lineitem measures (round
    // 10) — the correlation family's third member (Pearson
    // q_corr_matrix, Spearman q_spearman): concordant-vs-discordant
    // pairs with the tie-corrected denominator. The trick that makes
    // EXACT Kendall scale-safe here: pair counting runs over the
    // (q,d,t) JOINT CELL frame (≤ 50·11·9 cells), never over row
    // pairs — cell-pair weight cₐ·c_b replaces the O(n²) row scan
    // with a DOMAIN²-bounded one (≤ 25M cell pairs at ANY corpus
    // size). Both directed orders count each unordered pair twice, so
    // P2 = 2P, Q2 = 2Q and the doubled tie terms cancel exactly:
    // τ = (P2−Q2)/(√(n0x2−n1x2)·√(n0x2−n2x2)) with n0x2 = n(n−1) and
    // n1x2 = Σ c·(t_x−1) — EVERY term an exact int64 (P2 ≤ n² ≈
    // 3.6e11 at sf0.1); the joint frame is localCheckpoint'd so the
    // tie-total and pair branches reuse one lineitem scan.
    Q("q_kendall_tau",
      s"""WITH m AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS vq,
         |                  CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS vd,
         |                  CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS vt
         |           FROM lineitem),
         |j AS (SELECT vq, vd, vt, count(*) AS c FROM m GROUP BY 1, 2, 3),
         |w AS (SELECT c,
         |             CAST(sum(c) OVER (PARTITION BY vq) AS BIGINT) AS tieq,
         |             CAST(sum(c) OVER (PARTITION BY vd) AS BIGINT) AS tied,
         |             CAST(sum(c) OVER (PARTITION BY vt) AS BIGINT) AS tiet
         |      FROM j),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
         |               CAST(sum(c * (tieq - 1)) AS BIGINT) AS n1q,
         |               CAST(sum(c * (tied - 1)) AS BIGINT) AS n1d,
         |               CAST(sum(c * (tiet - 1)) AS BIGINT) AS n1t
         |        FROM w),
         |pq AS (SELECT
         |         CAST(sum(CASE WHEN (a.vq - b.vq) * (a.vd - b.vd) > 0 THEN a.c * b.c ELSE 0 END) AS BIGINT) AS pqd,
         |         CAST(sum(CASE WHEN (a.vq - b.vq) * (a.vd - b.vd) < 0 THEN a.c * b.c ELSE 0 END) AS BIGINT) AS qqd,
         |         CAST(sum(CASE WHEN (a.vq - b.vq) * (a.vt - b.vt) > 0 THEN a.c * b.c ELSE 0 END) AS BIGINT) AS pqt,
         |         CAST(sum(CASE WHEN (a.vq - b.vq) * (a.vt - b.vt) < 0 THEN a.c * b.c ELSE 0 END) AS BIGINT) AS qqt,
         |         CAST(sum(CASE WHEN (a.vd - b.vd) * (a.vt - b.vt) > 0 THEN a.c * b.c ELSE 0 END) AS BIGINT) AS pdt,
         |         CAST(sum(CASE WHEN (a.vd - b.vd) * (a.vt - b.vt) < 0 THEN a.c * b.c ELSE 0 END) AS BIGINT) AS qdt
         |       FROM j a CROSS JOIN j b),
         |pr AS (SELECT 'quantity' AS var1, 'discount' AS var2, n,
         |              pqd AS p2, qqd AS q2, n1q AS n1, n1d AS n2 FROM tot CROSS JOIN pq
         |       UNION ALL SELECT 'quantity', 'tax', n, pqt, qqt, n1q, n1t FROM tot CROSS JOIN pq
         |       UNION ALL SELECT 'discount', 'tax', n, pdt, qdt, n1d, n1t FROM tot CROSS JOIN pq)
         |SELECT var1, var2, n,
         |       ${Q.sqlR6("CAST(p2 - q2 AS DOUBLE) / (sqrt(CAST(n AS DOUBLE) * (n - 1) - n1) * sqrt(CAST(n AS DOUBLE) * (n - 1) - n2))")} AS tau
         |FROM pr
         |ORDER BY var1, var2""".stripMargin) { (s, d) =>
      val j = Tables.load(s, d, "lineitem")
        .select(floor(col("l_quantity")).cast("long").as("vq"),
          floor(col("l_discount") * 100 + 0.5).cast("long").as("vd"),
          floor(col("l_tax") * 100 + 0.5).cast("long").as("vt"))
        .groupBy("vq", "vd", "vt").agg(count(lit(1)).as("c"))
        .transform(Q.snapshot)
      val tot = j
        .withColumn("tieq", sum("c").over(Window.partitionBy("vq")))
        .withColumn("tied", sum("c").over(Window.partitionBy("vd")))
        .withColumn("tiet", sum("c").over(Window.partitionBy("vt")))
        .agg(sum("c").as("n"),
          sum(col("c") * (col("tieq") - 1)).as("n1q"),
          sum(col("c") * (col("tied") - 1)).as("n1d"),
          sum(col("c") * (col("tiet") - 1)).as("n1t"))
      val a = j.select(col("vq").as("qa"), col("vd").as("da"),
        col("vt").as("ta"), col("c").as("ca"))
      val b = j.select(col("vq").as("qb"), col("vd").as("db"),
        col("vt").as("tb"), col("c").as("cb"))
      def conc(x1: Column, x2: Column, y1: Column, y2: Column, gt: Boolean) = {
        val prod = (x1 - x2) * (y1 - y2)
        sum(when(if (gt) prod > 0 else prod < 0,
          col("ca") * col("cb")).otherwise(0L))
      }
      val pq = a.crossJoin(broadcast(b)).agg(
        conc(col("qa"), col("qb"), col("da"), col("db"), gt = true).as("pqd"),
        conc(col("qa"), col("qb"), col("da"), col("db"), gt = false).as("qqd"),
        conc(col("qa"), col("qb"), col("ta"), col("tb"), gt = true).as("pqt"),
        conc(col("qa"), col("qb"), col("ta"), col("tb"), gt = false).as("qqt"),
        conc(col("da"), col("db"), col("ta"), col("tb"), gt = true).as("pdt"),
        conc(col("da"), col("db"), col("ta"), col("tb"), gt = false).as("qdt"))
      def pairRow(v1: String, v2: String, p2: String, q2: String,
                  n1: String, n2: String) =
        struct(lit(v1).as("var1"), lit(v2).as("var2"),
          col(p2).as("p2"), col(q2).as("q2"), col(n1).as("n1"), col(n2).as("n2"))
      tot.crossJoin(pq)
        .select(col("n"), explode(array(
          pairRow("quantity", "discount", "pqd", "qqd", "n1q", "n1d"),
          pairRow("quantity", "tax", "pqt", "qqt", "n1q", "n1t"),
          pairRow("discount", "tax", "pdt", "qdt", "n1d", "n1t"))).as("pr"))
        .select(col("pr.var1").as("var1"), col("pr.var2").as("var2"), col("n"),
          Q.r6((col("pr.p2") - col("pr.q2")).cast("double") /
            (sqrt(col("n").cast("double") * (col("n") - 1) - col("pr.n1")) *
             sqrt(col("n").cast("double") * (col("n") - 1) - col("pr.n2")))).as("tau"))
        .orderBy("var1", "var2")
    },

    // Theil T inequality index of supplier revenue, decomposed between
    // and within nations (round 10) — the additively-decomposable
    // complement to q_gini/q_hhi: total T = Σ_g share_g·T_g +
    // T_between, which answers "is revenue inequality driven by
    // between-country differences or within-country concentration?".
    // Per-supplier terms (x/X_g)·ln(x·n_g/X_g) are integer-scaled to
    // 1e-9 BEFORE the per-nation reduction (the q_mutual_info fold),
    // so each nation's within-T is an order-free int64 sum; the
    // between term is per-NATION libm on the final 25-row frame,
    // never accumulated. Shape: the q_hhi pipeline — one
    // suppkey-keyed fact agg, broadcast catalog joins, windows over
    // the catalog-sized supplier frame, |nations|-key output.
    Q("q_theil",
      s"""WITH sr AS (SELECT l_suppkey,
         |                   CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS rev
         |            FROM lineitem GROUP BY 1),
         |sn AS (SELECT n.n_name, sr.rev
         |       FROM sr JOIN supplier s ON sr.l_suppkey = s.s_suppkey
         |               JOIN nation n ON s.s_nationkey = n.n_nationkey),
         |w AS (SELECT n_name, rev,
         |             CAST(sum(rev) OVER (PARTITION BY n_name) AS BIGINT) AS xg,
         |             CAST(count(*) OVER (PARTITION BY n_name) AS BIGINT) AS ng,
         |             CAST(sum(rev) OVER () AS BIGINT) AS x,
         |             CAST(count(*) OVER () AS BIGINT) AS nn
         |      FROM sn),
         |g AS (SELECT n_name, max(ng) AS n_suppliers, max(xg) AS xg,
         |             max(x) AS x, max(nn) AS nn,
         |             CAST(sum(CAST(floor((CAST(rev AS DOUBLE) / xg) * ln(CAST(rev AS DOUBLE) * ng / xg) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS tw9
         |      FROM w GROUP BY 1)
         |SELECT n_name, n_suppliers,
         |       ${Q.sqlR6("CAST(xg AS DOUBLE) / x")} AS share,
         |       ${Q.sqlR6("tw9 / 1e9")} AS theil_within,
         |       ${Q.sqlR6("(CAST(xg AS DOUBLE) / x) * ln((CAST(xg AS DOUBLE) / x) * (CAST(nn AS DOUBLE) / n_suppliers))")} AS between_term
         |FROM g
         |ORDER BY n_name""".stripMargin) { (s, d) =>
      val sr = Tables.load(s, d, "lineitem")
        .groupBy("l_suppkey")
        .agg(sum(floor(col("l_extendedprice")).cast("long")).as("rev"))
      val supp = Tables.load(s, d, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val nat = Tables.load(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val wn = Window.partitionBy("n_name")
      val wall = Window.partitionBy()
      // supplier grows with SF — no broadcast hint; the planner/AQE
      // size-decides (r18 broadcast-bound walk).
      sr.join(supp, sr("l_suppkey") === supp("s_suppkey"))
        .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
        .withColumn("xg", sum("rev").over(wn))
        .withColumn("ng", count(lit(1)).over(wn))
        .withColumn("x", sum("rev").over(wall))
        .withColumn("nn", count(lit(1)).over(wall))
        .groupBy("n_name")
        .agg(max("ng").as("n_suppliers"), max("xg").as("xg"),
          max("x").as("x"), max("nn").as("nn"),
          sum(floor((col("rev").cast("double") / col("xg")) *
            log(col("rev").cast("double") * col("ng") / col("xg")) * lit(1e9) + 0.5)
            .cast("long")).as("tw9"))
        .select(col("n_name"), col("n_suppliers"),
          Q.r6(col("xg").cast("double") / col("x")).as("share"),
          Q.r6(col("tw9") / lit(1e9)).as("theil_within"),
          Q.r6((col("xg").cast("double") / col("x")) *
            log((col("xg").cast("double") / col("x")) *
              (col("nn").cast("double") / col("n_suppliers")))).as("between_term"))
        .orderBy("n_name")
    },

    // Lorenz curve by revenue decile per order priority (round 10) —
    // the curve under q_gini's scalar: decile d's cumulative share of
    // order value, the "bottom 80% of orders carry X% of revenue"
    // readout. ntile(10) runs under a TOTAL order (o_totalprice,
    // o_orderkey) so both engines cut identical deciles (PARITY
    // total-order rule); every sum is int64 CENTS and each cum_share
    // is one IEEE division of exact integers. Shape: the per-priority
    // rank window is exact-quantile's honest per-group sort (the
    // q_gini precedent); everything after lives on the 5×10 frame.
    Q("q_lorenz",
      s"""WITH r AS (SELECT o_orderpriority,
         |                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         |                  ntile(10) OVER (PARTITION BY o_orderpriority
         |                                  ORDER BY o_totalprice, o_orderkey) AS dcl
         |           FROM orders),
         |g AS (SELECT o_orderpriority, CAST(dcl AS BIGINT) AS decile,
         |             count(*) AS n, CAST(sum(cents) AS BIGINT) AS rev_cents
         |      FROM r GROUP BY 1, 2),
         |c AS (SELECT o_orderpriority, decile, n, rev_cents,
         |             CAST(sum(rev_cents) OVER (PARTITION BY o_orderpriority
         |                                       ORDER BY decile) AS BIGINT) AS cum,
         |             CAST(sum(rev_cents) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS tot
         |      FROM g)
         |SELECT o_orderpriority, decile, n, rev_cents,
         |       ${Q.sqlR6("CAST(cum AS DOUBLE) / tot")} AS cum_share
         |FROM c
         |ORDER BY o_orderpriority, decile""".stripMargin) { (s, d) =>
      val wr = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
      val g = Tables.load(s, d, "orders")
        .select(col("o_orderpriority"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
          ntile(10).over(wr).as("dcl"))
        .groupBy(col("o_orderpriority"), col("dcl").cast("long").as("decile"))
        .agg(count(lit(1)).as("n"), sum("cents").as("rev_cents"))
      val wc = Window.partitionBy("o_orderpriority").orderBy("decile")
      g.withColumn("cum", sum("rev_cents").over(wc))
        .withColumn("tot", sum("rev_cents").over(Window.partitionBy("o_orderpriority")))
        .select(col("o_orderpriority"), col("decile"), col("n"), col("rev_cents"),
          Q.r6(col("cum").cast("double") / col("tot")).as("cum_share"))
        .orderBy("o_orderpriority", "decile")
    },

    // 2-D skyline / Pareto front of orders (round 10): the orders no
    // other order beats on BOTH "more valuable" (totalprice) and
    // "earlier" (orderdate) — a whole operator class (preference
    // queries) the rest of the surface doesn't cover. The naive
    // formulation is a corpus-sized single-partition window; the scale
    // shape here is the classic two-phase prune: (1) collapse to
    // distinct (cents, day) cells, (2) a ~56-row PRICE-BUCKET frame
    // computes m(b) = min day over strictly-higher buckets — any cell
    // with day ≥ m(b) is provably dominated by the higher-bucket
    // minimum (sound: bucket(c')>bucket(c) ⇒ c'>c) — so the exact
    // dominance window runs over the surviving candidates only
    // (O(skyline)-ish, corpus-independent), not the corpus. All
    // comparisons are int64 (cents, epoch days); the oracle states the
    // direct one-window definition — the twins agree because the prune
    // is exact, the q_graph_triangles two-formulations move.
    Q("q_skyline",
      s"""WITH p AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         |                  CAST(date_diff('day', DATE '1990-01-01',
         |                                 CAST(date_trunc('day', o_orderdate) AS DATE)) AS BIGINT) AS day,
         |                  count(*) AS n_orders
         |           FROM orders GROUP BY 1, 2),
         |w AS (SELECT cents, day, n_orders,
         |             min(day) OVER (ORDER BY cents DESC, day ASC
         |                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mprev
         |      FROM p)
         |SELECT CAST(cents AS DOUBLE) / 100 AS price,
         |       strftime(DATE '1990-01-01' + CAST(day AS INTEGER), '%Y-%m-%d') AS order_date,
         |       n_orders
         |FROM w WHERE mprev IS NULL OR day < mprev
         |ORDER BY price DESC""".stripMargin) { (s, d) =>
      val pairs = Tables.load(s, d, "orders")
        .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
          datediff(col("o_orderdate").cast(DateType), to_date(lit("1990-01-01")))
            .cast("long").as("day"))
        .groupBy("cents", "day").agg(count(lit(1)).as("n_orders"))
        .transform(Q.snapshot)
      // phase 1: the bounded bucket frame ($10k buckets ⇒ ~56 rows) and
      // its strictly-higher-bucket running day minimum
      val buckets = pairs
        .groupBy((col("cents") / 1000000L).cast("long").as("b"))
        .agg(min("day").as("dmin"))
        .withColumn("m", min("dmin").over(
          Window.orderBy(col("b").desc).rowsBetween(Window.unboundedPreceding, -1)))
        .select(col("b"), col("m"))
      // phase 2: candidates survive the bucket prune, then the EXACT
      // dominance window runs over that corpus-independent remnant
      val cand = pairs
        .join(broadcast(buckets), (col("cents") / 1000000L).cast("long") === col("b"))
        .filter(col("m").isNull || col("day") < col("m"))
        .select(col("cents"), col("day"), col("n_orders"))
      val wd = Window.orderBy(col("cents").desc, col("day").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      cand
        .withColumn("mprev", min("day").over(wd))
        .filter(col("mprev").isNull || col("day") < col("mprev"))
        .select((col("cents").cast("double") / 100).as("price"),
          date_format(date_add(to_date(lit("1990-01-01")), col("day").cast("int")),
            "yyyy-MM-dd").as("order_date"),
          col("n_orders"))
        .orderBy(col("price").desc)
    },

    // Leading principal component of the four lineitem measures
    // (round 10): distributed PCA the way it actually runs at 100 TB —
    // ONE corpus pass collects q_corr_matrix's 15 integer sufficient
    // statistics, the 4×4 CORRELATION matrix (unit diagonal, so trace
    // = 4 and the variance share is λ/4) assembles from them IN-ROW,
    // and three power-iteration steps with explicit normalization run
    // as nested single-row expressions — no driver loop, no second
    // scan, no cross-row reduction after the stats agg. Every double
    // derives from exact int64 sums through textually mirrored
    // formula trees (sums written term-by-term in fixed order — never
    // an aggregate over doubles), so both engines produce bit-equal
    // loadings before r6. Sign is pinned by the all-positive start
    // vector. λ is the final iterate's norm (the standard power-
    // iteration estimate), reported as the λ/4 variance share.
    Q("q_pca_power",
      s"""WITH m AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS q,
         |                  CAST(floor(l_extendedprice) AS BIGINT) AS p,
         |                  CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,
         |                  CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS t
         |           FROM lineitem),
         |st AS (SELECT count(*) AS n,
         |              CAST(sum(q) AS BIGINT) AS sq, CAST(sum(p) AS BIGINT) AS sp,
         |              CAST(sum(d) AS BIGINT) AS sd, CAST(sum(t) AS BIGINT) AS st,
         |              CAST(sum(q * q) AS BIGINT) AS qq, CAST(sum(p * p) AS BIGINT) AS pp,
         |              CAST(sum(d * d) AS BIGINT) AS dd, CAST(sum(t * t) AS BIGINT) AS tt,
         |              CAST(sum(q * p) AS BIGINT) AS qp, CAST(sum(q * d) AS BIGINT) AS qd,
         |              CAST(sum(q * t) AS BIGINT) AS qt, CAST(sum(p * d) AS BIGINT) AS pd,
         |              CAST(sum(p * t) AS BIGINT) AS pt, CAST(sum(d * t) AS BIGINT) AS dt
         |       FROM m),
         |co AS (SELECT
         |  (n * CAST(qp AS DOUBLE) - CAST(sq AS DOUBLE) * sp) / (sqrt(n * CAST(qq AS DOUBLE) - CAST(sq AS DOUBLE) * sq) * sqrt(n * CAST(pp AS DOUBLE) - CAST(sp AS DOUBLE) * sp)) AS rqp,
         |  (n * CAST(qd AS DOUBLE) - CAST(sq AS DOUBLE) * sd) / (sqrt(n * CAST(qq AS DOUBLE) - CAST(sq AS DOUBLE) * sq) * sqrt(n * CAST(dd AS DOUBLE) - CAST(sd AS DOUBLE) * sd)) AS rqd,
         |  (n * CAST(qt AS DOUBLE) - CAST(sq AS DOUBLE) * st) / (sqrt(n * CAST(qq AS DOUBLE) - CAST(sq AS DOUBLE) * sq) * sqrt(n * CAST(tt AS DOUBLE) - CAST(st AS DOUBLE) * st)) AS rqt,
         |  (n * CAST(pd AS DOUBLE) - CAST(sp AS DOUBLE) * sd) / (sqrt(n * CAST(pp AS DOUBLE) - CAST(sp AS DOUBLE) * sp) * sqrt(n * CAST(dd AS DOUBLE) - CAST(sd AS DOUBLE) * sd)) AS rpd,
         |  (n * CAST(pt AS DOUBLE) - CAST(sp AS DOUBLE) * st) / (sqrt(n * CAST(pp AS DOUBLE) - CAST(sp AS DOUBLE) * sp) * sqrt(n * CAST(tt AS DOUBLE) - CAST(st AS DOUBLE) * st)) AS rpt,
         |  (n * CAST(dt AS DOUBLE) - CAST(sd AS DOUBLE) * st) / (sqrt(n * CAST(dd AS DOUBLE) - CAST(sd AS DOUBLE) * sd) * sqrt(n * CAST(tt AS DOUBLE) - CAST(st AS DOUBLE) * st)) AS rdt
         |       FROM st),
         |i1 AS (SELECT *,
         |  0.5 + 0.5 * rqp + 0.5 * rqd + 0.5 * rqt AS w11,
         |  0.5 * rqp + 0.5 + 0.5 * rpd + 0.5 * rpt AS w12,
         |  0.5 * rqd + 0.5 * rpd + 0.5 + 0.5 * rdt AS w13,
         |  0.5 * rqt + 0.5 * rpt + 0.5 * rdt + 0.5 AS w14
         |       FROM co),
         |v1 AS (SELECT *, w11 / sqrt(w11 * w11 + w12 * w12 + w13 * w13 + w14 * w14) AS v11,
         |                 w12 / sqrt(w11 * w11 + w12 * w12 + w13 * w13 + w14 * w14) AS v12,
         |                 w13 / sqrt(w11 * w11 + w12 * w12 + w13 * w13 + w14 * w14) AS v13,
         |                 w14 / sqrt(w11 * w11 + w12 * w12 + w13 * w13 + w14 * w14) AS v14
         |       FROM i1),
         |i2 AS (SELECT *,
         |  v11 + v12 * rqp + v13 * rqd + v14 * rqt AS w21,
         |  v11 * rqp + v12 + v13 * rpd + v14 * rpt AS w22,
         |  v11 * rqd + v12 * rpd + v13 + v14 * rdt AS w23,
         |  v11 * rqt + v12 * rpt + v13 * rdt + v14 AS w24
         |       FROM v1),
         |v2 AS (SELECT *, w21 / sqrt(w21 * w21 + w22 * w22 + w23 * w23 + w24 * w24) AS v21,
         |                 w22 / sqrt(w21 * w21 + w22 * w22 + w23 * w23 + w24 * w24) AS v22,
         |                 w23 / sqrt(w21 * w21 + w22 * w22 + w23 * w23 + w24 * w24) AS v23,
         |                 w24 / sqrt(w21 * w21 + w22 * w22 + w23 * w23 + w24 * w24) AS v24
         |       FROM i2),
         |i3 AS (SELECT *,
         |  v21 + v22 * rqp + v23 * rqd + v24 * rqt AS w31,
         |  v21 * rqp + v22 + v23 * rpd + v24 * rpt AS w32,
         |  v21 * rqd + v22 * rpd + v23 + v24 * rdt AS w33,
         |  v21 * rqt + v22 * rpt + v23 * rdt + v24 AS w34
         |       FROM v2),
         |f AS (SELECT sqrt(w31 * w31 + w32 * w32 + w33 * w33 + w34 * w34) AS lam,
         |             w31 / sqrt(w31 * w31 + w32 * w32 + w33 * w33 + w34 * w34) AS v31,
         |             w32 / sqrt(w31 * w31 + w32 * w32 + w33 * w33 + w34 * w34) AS v32,
         |             w33 / sqrt(w31 * w31 + w32 * w32 + w33 * w33 + w34 * w34) AS v33,
         |             w34 / sqrt(w31 * w31 + w32 * w32 + w33 * w33 + w34 * w34) AS v34
         |      FROM i3)
         |SELECT 'discount' AS dim, ${Q.sqlR6("v33")} AS loading, ${Q.sqlR6("lam / 4")} AS var_share FROM f
         |UNION ALL SELECT 'price_usd', ${Q.sqlR6("v32")}, ${Q.sqlR6("lam / 4")} FROM f
         |UNION ALL SELECT 'quantity', ${Q.sqlR6("v31")}, ${Q.sqlR6("lam / 4")} FROM f
         |UNION ALL SELECT 'tax', ${Q.sqlR6("v34")}, ${Q.sqlR6("lam / 4")} FROM f
         |ORDER BY dim""".stripMargin) { (s, d) =>
      // correlation entry: the SAME corrCol tree q_corr_matrix reports
      def r(sxy: String, sx: String, sy: String, sxx: String, syy: String) =
        corrCol(col("n"), col(sxy), col(sx), col(sy), col(sxx), col(syy))
      val co = lineitemMomentStats(s, d).select(
        r("qp", "sq", "sp", "qq", "pp").as("rqp"),
        r("qd", "sq", "sd", "qq", "dd").as("rqd"),
        r("qt", "sq", "st", "qq", "tt").as("rqt"),
        r("pd", "sp", "sd", "pp", "dd").as("rpd"),
        r("pt", "sp", "st", "pp", "tt").as("rpt"),
        r("dt", "sd", "st", "dd", "tt").as("rdt"))
      // one matrix–vector multiply: R has unit diagonal, off-diagonals
      // from the six correlations; terms written in fixed order so the
      // double tree mirrors the oracle text exactly
      def mul(v1: Column, v2: Column, v3: Column, v4: Column)
          : (Column, Column, Column, Column) = (
        v1 + v2 * col("rqp") + v3 * col("rqd") + v4 * col("rqt"),
        v1 * col("rqp") + v2 + v3 * col("rpd") + v4 * col("rpt"),
        v1 * col("rqd") + v2 * col("rpd") + v3 + v4 * col("rdt"),
        v1 * col("rqt") + v2 * col("rpt") + v3 * col("rdt") + v4)
      def norm(w: (Column, Column, Column, Column)): Column =
        sqrt(w._1 * w._1 + w._2 * w._2 + w._3 * w._3 + w._4 * w._4)
      def step(df: org.apache.spark.sql.DataFrame, i: Int,
               v: (Column, Column, Column, Column)) = {
        val w = mul(v._1, v._2, v._3, v._4)
        df.withColumn(s"w${i}1", w._1).withColumn(s"w${i}2", w._2)
          .withColumn(s"w${i}3", w._3).withColumn(s"w${i}4", w._4)
      }
      def unit(df: org.apache.spark.sql.DataFrame, i: Int) = {
        val w = (col(s"w${i}1"), col(s"w${i}2"), col(s"w${i}3"), col(s"w${i}4"))
        df.withColumn(s"v${i}1", w._1 / norm(w)).withColumn(s"v${i}2", w._2 / norm(w))
          .withColumn(s"v${i}3", w._3 / norm(w)).withColumn(s"v${i}4", w._4 / norm(w))
      }
      val half = lit(0.5)
      val i1 = co
        .withColumn("w11", half + half * col("rqp") + half * col("rqd") + half * col("rqt"))
        .withColumn("w12", half * col("rqp") + half + half * col("rpd") + half * col("rpt"))
        .withColumn("w13", half * col("rqd") + half * col("rpd") + half + half * col("rdt"))
        .withColumn("w14", half * col("rqt") + half * col("rpt") + half * col("rdt") + half)
      val v1 = unit(i1, 1)
      val v2 = unit(step(v1, 2, (col("v11"), col("v12"), col("v13"), col("v14"))), 2)
      val i3 = step(v2, 3, (col("v21"), col("v22"), col("v23"), col("v24")))
      val w3 = (col("w31"), col("w32"), col("w33"), col("w34"))
      val f = i3.select(norm(w3).as("lam"),
        (col("w31") / norm(w3)).as("v31"), (col("w32") / norm(w3)).as("v32"),
        (col("w33") / norm(w3)).as("v33"), (col("w34") / norm(w3)).as("v34"))
      f.select(explode(array(
          struct(lit("discount").as("dim"), col("v33").as("v")),
          struct(lit("price_usd").as("dim"), col("v32").as("v")),
          struct(lit("quantity").as("dim"), col("v31").as("v")),
          struct(lit("tax").as("dim"), col("v34").as("v")))).as("e"),
          col("lam"))
        .select(col("e.dim").as("dim"), Q.r6(col("e.v")).as("loading"),
          Q.r6(col("lam") / 4).as("var_share"))
        .orderBy("dim")
    },

    // Welch's two-sample t-test (round 10): does mean spend differ
    // between purchase and click events? Unequal-variance t statistic,
    // Welch–Satterthwaite degrees of freedom, and Cohen's d effect
    // size. Values are integerized to cents FIRST (floor(v·100+0.5)),
    // so all six sufficient statistics (n, Σv, Σv² per arm) are exact
    // int64 — both engines then run the SAME double formula tree over
    // the SAME integers, bit-exact before rounding (the q_trend_fit
    // argument). Σv² tops out ≈6e13 at sf0.1; int64 holds to ~sf100.
    // Shape: ONE filtered corpus scan, ONE 6-column conditional agg
    // (map-side partials onto a single row) — no join, no shuffle
    // beyond the scalar-row reduce.
    Q("q_welch_t",
      s"""WITH v AS (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v2
         |           FROM events WHERE event_type IN ('purchase', 'click')),
         |s AS (SELECT CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS na,
         |             CAST(sum(CASE WHEN event_type = 'purchase' THEN v2 ELSE 0 END) AS BIGINT) AS s1a,
         |             CAST(sum(CASE WHEN event_type = 'purchase' THEN v2 * v2 ELSE 0 END) AS BIGINT) AS s2a,
         |             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         |             CAST(sum(CASE WHEN event_type = 'click' THEN v2 ELSE 0 END) AS BIGINT) AS s1b,
         |             CAST(sum(CASE WHEN event_type = 'click' THEN v2 * v2 ELSE 0 END) AS BIGINT) AS s2b
         |      FROM v),
         |m AS (SELECT na, nb,
         |             CAST(s1a AS DOUBLE) / na AS ma,
         |             CAST(s1b AS DOUBLE) / nb AS mb,
         |             (CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) / na * s1a) / (na - 1) AS va,
         |             (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) / nb * s1b) / (nb - 1) AS vb
         |      FROM s)
         |SELECT na, nb,
         |       ${Q.sqlR2("ma / 100")} AS mean_a,
         |       ${Q.sqlR2("mb / 100")} AS mean_b,
         |       ${Q.sqlR6("(ma - mb) / sqrt(va / na + vb / nb)")} AS t_stat,
         |       ${Q.sqlR2("(va / na + vb / nb) * (va / na + vb / nb) / ((va / na) * (va / na) / (na - 1) + (vb / nb) * (vb / nb) / (nb - 1))")} AS df,
         |       ${Q.sqlR6("(ma - mb) / sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))")} AS cohen_d
         |FROM m""".stripMargin) { (s, d) =>
      val v = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("event_type"), floor(col("value") * 100 + 0.5).cast("long").as("v2"))
      val st = v.agg(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("na"),
        sum(when(col("event_type") === "purchase", col("v2")).otherwise(0L)).as("s1a"),
        sum(when(col("event_type") === "purchase", col("v2") * col("v2")).otherwise(0L)).as("s2a"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("nb"),
        sum(when(col("event_type") === "click", col("v2")).otherwise(0L)).as("s1b"),
        sum(when(col("event_type") === "click", col("v2") * col("v2")).otherwise(0L)).as("s2b"))
      val m = st.select(col("na"), col("nb"),
        (col("s1a").cast("double") / col("na")).as("ma"),
        (col("s1b").cast("double") / col("nb")).as("mb"),
        ((col("s2a").cast("double") - col("s1a").cast("double") / col("na") * col("s1a"))
          / (col("na") - 1)).as("va"),
        ((col("s2b").cast("double") - col("s1b").cast("double") / col("nb") * col("s1b"))
          / (col("nb") - 1)).as("vb"))
      m.select(col("na"), col("nb"),
        Q.r2(col("ma") / 100).as("mean_a"),
        Q.r2(col("mb") / 100).as("mean_b"),
        Q.r6((col("ma") - col("mb")) /
          sqrt(col("va") / col("na") + col("vb") / col("nb"))).as("t_stat"),
        Q.r2((col("va") / col("na") + col("vb") / col("nb")) *
          (col("va") / col("na") + col("vb") / col("nb")) /
          ((col("va") / col("na")) * (col("va") / col("na")) / (col("na") - 1) +
            (col("vb") / col("nb")) * (col("vb") / col("nb")) / (col("nb") - 1))).as("df"),
        Q.r6((col("ma") - col("mb")) /
          sqrt(((col("na") - 1) * col("va") + (col("nb") - 1) * col("vb")) /
            (col("na") + col("nb") - 2))).as("cohen_d"))
    },

    // Jarque–Bera normality test per event type (round 10): skewness,
    // excess kurtosis, and the JB statistic n/6·(S² + K²/4) — the
    // cheap "is this column even Gaussian?" gate run before any test
    // that assumes normality. Values integerize to whole units
    // (floor(v+0.5) ≤ 561) so the four raw power sums Σv..Σv⁴ are
    // exact int64 (Σv⁴ ≈ 2e15 at sf0.1 — holds to ~sf1000); central
    // moments then derive from those integers through one mirrored
    // double formula tree. Shape: ONE corpus scan, ONE 5-column agg
    // onto |types| keys with map-side partials — shuffle is
    // type-bounded, not corpus-bounded.
    Q("q_jarque_bera",
      s"""WITH v AS (SELECT event_type, CAST(floor(value + 0.5) AS BIGINT) AS v0 FROM events),
         |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(v0) AS BIGINT) AS s1,
         |             CAST(sum(v0 * v0) AS BIGINT) AS s2,
         |             CAST(sum(v0 * v0 * v0) AS BIGINT) AS s3,
         |             CAST(sum(v0 * v0 * v0 * v0) AS BIGINT) AS s4
         |      FROM v GROUP BY 1),
         |m AS (SELECT event_type, n,
         |             CAST(s1 AS DOUBLE) / n AS m1,
         |             CAST(s2 AS DOUBLE) / n AS p2,
         |             CAST(s3 AS DOUBLE) / n AS p3,
         |             CAST(s4 AS DOUBLE) / n AS p4
         |      FROM s),
         |c AS (SELECT event_type, n,
         |             p2 - m1 * m1 AS m2,
         |             p3 - 3 * m1 * p2 + 2 * m1 * m1 * m1 AS m3,
         |             p4 - 4 * m1 * p3 + 6 * m1 * m1 * p2 - 3 * m1 * m1 * m1 * m1 AS m4
         |      FROM m),
         |k AS (SELECT event_type, n,
         |             m3 / (m2 * sqrt(m2)) AS sk,
         |             m4 / (m2 * m2) - 3 AS ek
         |      FROM c)
         |SELECT event_type, n,
         |       ${Q.sqlR6("sk")} AS skewness,
         |       ${Q.sqlR6("ek")} AS ex_kurtosis,
         |       ${Q.sqlR6("CAST(n AS DOUBLE) / 6 * (sk * sk + ek * ek / 4)")} AS jb
         |FROM k
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val st = Tables.events(s, d)
        .select(col("event_type"), floor(col("value") + 0.5).cast("long").as("v0"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("v0").as("s1"),
          sum(col("v0") * col("v0")).as("s2"),
          sum(col("v0") * col("v0") * col("v0")).as("s3"),
          sum(col("v0") * col("v0") * col("v0") * col("v0")).as("s4"))
      val m = st.select(col("event_type"), col("n"),
        (col("s1").cast("double") / col("n")).as("m1"),
        (col("s2").cast("double") / col("n")).as("p2"),
        (col("s3").cast("double") / col("n")).as("p3"),
        (col("s4").cast("double") / col("n")).as("p4"))
      val c = m.select(col("event_type"), col("n"),
        (col("p2") - col("m1") * col("m1")).as("m2"),
        (col("p3") - lit(3) * col("m1") * col("p2") +
          lit(2) * col("m1") * col("m1") * col("m1")).as("m3"),
        (col("p4") - lit(4) * col("m1") * col("p3") +
          lit(6) * col("m1") * col("m1") * col("p2") -
          lit(3) * col("m1") * col("m1") * col("m1") * col("m1")).as("m4"))
      val k = c.select(col("event_type"), col("n"),
        (col("m3") / (col("m2") * sqrt(col("m2")))).as("sk"),
        (col("m4") / (col("m2") * col("m2")) - 3).as("ek"))
      k.select(col("event_type"), col("n"),
        Q.r6(col("sk")).as("skewness"),
        Q.r6(col("ek")).as("ex_kurtosis"),
        Q.r6(col("n").cast("double") / 6 *
          (col("sk") * col("sk") + col("ek") * col("ek") / 4)).as("jb"))
        .orderBy("event_type")
    },

    // Population stability index per event type (round 10): the
    // industry drift gate (PSI < 0.1 stable / > 0.25 shifted) between
    // the value distributions before/after 2024-01-15 on q_drift_tvd's
    // fixed 20-bucket grid, Laplace-smoothed (+1 per cell) so empty
    // cells stay finite. The ln PSI needs is handled with the
    // q_mutual_info fold: each cell's (p−q)·ln(p/q) is integer-scaled
    // to 1e-9 BEFORE the cross-cell sum, so the reduction is an
    // order-free int64 sum and libm's 1-ulp ln noise moves a cell by
    // ≤1e-9 — invisible at r6. Buckets ABSENT from both periods are
    // never materialized: each contributes the same closed-form
    // constant ((1/(t1+20) − 1/(t2+20))·ln((t2+20)/(t1+20))), added
    // once per missing bucket — the densifying grid join other PSI
    // implementations do is replaced by algebra, keeping the op ONE
    // corpus scan onto a ≤|types|×40-cell frame.
    Q("q_psi",
      s"""WITH e AS (SELECT event_type,
         |                  CASE WHEN CAST(date_trunc('day', ts) AS DATE) < DATE '2024-01-15'
         |                       THEN 1 ELSE 2 END AS period,
         |                  least(CAST(floor(value / 25) AS BIGINT), 19) AS bucket
         |           FROM events),
         |c AS (SELECT event_type, bucket,
         |             CAST(count(CASE WHEN period = 1 THEN 1 END) AS BIGINT) AS n1,
         |             CAST(count(CASE WHEN period = 2 THEN 1 END) AS BIGINT) AS n2
         |      FROM e GROUP BY 1, 2),
         |w AS (SELECT event_type, n1, n2,
         |             CAST(sum(n1) OVER (PARTITION BY event_type) AS BIGINT) AS t1,
         |             CAST(sum(n2) OVER (PARTITION BY event_type) AS BIGINT) AS t2,
         |             CAST(20 - count(*) OVER (PARTITION BY event_type) AS BIGINT) AS miss
         |      FROM c),
         |t AS (SELECT event_type, t1, t2, miss,
         |             CAST(floor((CAST(n1 + 1 AS DOUBLE) / (t1 + 20) - CAST(n2 + 1 AS DOUBLE) / (t2 + 20)) *
         |                        ln(CAST(n1 + 1 AS DOUBLE) * (t2 + 20) / (CAST(n2 + 1 AS DOUBLE) * (t1 + 20))) * 1e9 + 0.5)
         |                  AS BIGINT) AS contrib,
         |             CAST(floor((1.0 / (t1 + 20) - 1.0 / (t2 + 20)) *
         |                        ln((t2 + 20) / CAST(t1 + 20 AS DOUBLE)) * 1e9 + 0.5)
         |                  AS BIGINT) AS mcontrib
         |      FROM w)
         |SELECT event_type,
         |       CAST(max(t1) AS BIGINT) AS n_before,
         |       CAST(max(t2) AS BIGINT) AS n_after,
         |       ${Q.sqlR6("(sum(contrib) + max(miss) * max(mcontrib)) / 1e9")} AS psi
         |FROM t
         |GROUP BY 1
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val c = Tables.events(s, d)
        .select(col("event_type"),
          when(col("ts").cast(DateType) < to_date(lit("2024-01-15")), 1)
            .otherwise(2).as("period"),
          least(floor(col("value") / 25).cast("long"), lit(19L)).as("bucket"))
        .groupBy("event_type", "bucket")
        .agg(count(when(col("period") === 1, 1)).as("n1"),
          count(when(col("period") === 2, 1)).as("n2"))
      val wt = Window.partitionBy("event_type")
      c.withColumn("t1", sum("n1").over(wt).cast("long"))
        .withColumn("t2", sum("n2").over(wt).cast("long"))
        .withColumn("miss", (lit(20) - count(lit(1)).over(wt)).cast("long"))
        .withColumn("contrib",
          floor(((col("n1") + 1).cast("double") / (col("t1") + 20) -
            (col("n2") + 1).cast("double") / (col("t2") + 20)) *
            log((col("n1") + 1).cast("double") * (col("t2") + 20) /
              ((col("n2") + 1).cast("double") * (col("t1") + 20))) * lit(1e9) + 0.5)
            .cast("long"))
        .withColumn("mcontrib",
          floor((lit(1.0) / (col("t1") + 20) - lit(1.0) / (col("t2") + 20)) *
            log((col("t2") + 20) / (col("t1") + 20).cast("double")) * lit(1e9) + 0.5)
            .cast("long"))
        .groupBy("event_type")
        .agg(max("t1").as("n_before"), max("t2").as("n_after"),
          Q.r6((sum("contrib") + max("miss") * max("mcontrib")) / lit(1e9)).as("psi"))
        .orderBy("event_type")
    },

    // Standardized Pearson residuals of the nation × market-segment
    // contingency (round 16): WHICH cells drive the chi² — the
    // diagnostic q_cramers_v's single-number association hides. Per
    // cell r = (o − e)/√e with e = rowΣ·colΣ/n; the 20 largest |r|
    // with the over/under direction. All counts exact int64 off one
    // corpus agg onto the ≤125-cell bounded frame (marginals are
    // windows over that frame, keyed by a 25-value / 5-value enum);
    // e and r derive through one mirrored double tree and the
    // ranking is on the ROUNDED |r| with (nation, segment)
    // tie-breaks — ulp-proof.
    Q("q_pearson_residuals",
      s"""WITH c0 AS (SELECT c_nationkey, c_mktsegment,
         |                   CAST(count(*) AS BIGINT) AS o
         |            FROM customer GROUP BY 1, 2),
         |mg AS (SELECT c_nationkey, c_mktsegment, o,
         |              CAST(sum(o) OVER (PARTITION BY c_nationkey) AS BIGINT) AS rt,
         |              CAST(sum(o) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS ct,
         |              CAST(sum(o) OVER () AS BIGINT) AS n
         |       FROM c0),
         |rr AS (SELECT c_nationkey, c_mktsegment, o,
         |              CAST(rt AS DOUBLE) * ct / n AS e,
         |              (o - CAST(rt AS DOUBLE) * ct / n) /
         |                sqrt(CAST(rt AS DOUBLE) * ct / n) AS r
         |       FROM mg WHERE rt > 0 AND ct > 0)
         |SELECT c_nationkey AS nation_key, c_mktsegment AS segment,
         |       o AS observed, ${Q.sqlR4("e")} AS expected, ${Q.sqlR6("r")} AS residual,
         |       CASE WHEN r > 0 THEN 1 ELSE -1 END AS direction
         |FROM rr
         |ORDER BY abs(${Q.sqlR6("r")}) DESC, nation_key, segment
         |LIMIT 20""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val c0 = Tables.load(s, d, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("o"))
      val mg = c0
        .withColumn("rt", sum("o").over(Window.partitionBy("c_nationkey")))
        .withColumn("ct", sum("o").over(Window.partitionBy("c_mktsegment")))
        .withColumn("n", sum("o").over(Window.partitionBy()))
      val e = col("rt").cast("double") * col("ct") / col("n")
      val r = (col("o") - e) / sqrt(e)
      mg.filter(col("rt") > 0 && col("ct") > 0)
        .select(col("c_nationkey").as("nation_key"),
          col("c_mktsegment").as("segment"), col("o").as("observed"),
          Q.r4(e).as("expected"), Q.r6(r).as("residual"),
          when(r > 0, 1).otherwise(-1).as("direction"))
        .orderBy(abs(col("residual")).desc, col("nation_key"), col("segment"))
        .limit(20)
    }
  )
}
