package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 1-D clustering & mixture models over the purchase-value cents grid
  * (round 16, SURVEY §2.11): exact k-means and a 2-component Gaussian
  * EM — the unsupervised segmentations a pricing/behavior pipeline
  * fits to a value distribution before it trusts "average basket".
  *
  * The whole determinism story rides ONE move: the corpus collapses to
  * the ≤|cents-domain| distinct-value grid FIRST (map-side partials,
  * the q_tail_exact shape), and every iteration is arithmetic over
  * that bounded grid — k-means' sufficient statistics (N, Σc·v,
  * Σc·v²) stay EXACT int64 per cluster (centers/inertia are one
  * division each), and EM's fractional responsibilities are
  * integer-latticed per CELL before the cross-cell sums, so both
  * engines fold the same int64 regardless of order. Fixed 3 rounds,
  * deterministic integer initialization (exact first-crossing
  * percentiles), ties to the lower cluster id in both engines.
  */
object Mixture {

  /** Purchase-value cents grid (v, c) — the bounded domain frame. */
  private def grid(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(floor(col("value") * 100 + 0.5).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))

  private val GridSql: String =
    """SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
      |       CAST(count(*) AS BIGINT) AS c
      |FROM events WHERE event_type = 'purchase' GROUP BY 1""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // Exact 1-D k-means (round 16): K = 4, 3 Lloyd rounds, centers
    // seeded at the exact 1/8, 3/8, 5/8, 7/8 first-crossing
    // percentiles (integer cents — the q_tail_exact crossing, no
    // float percentile semantics). Assignment is nearest-center with
    // ties to the LOWER cluster id (a CASE ladder over |v − ck|,
    // identical doubles in both engines); the M-step and the inertia
    // derive from EXACT int64 (N, Σc·v, Σc·v²) per cluster — inertia
    // = Σc·v² − (Σc·v)²/N, one division, no float accumulates.
    Q("q_kmeans_1d",
      s"""WITH g AS ($GridSql),
         |cum AS (SELECT v, c, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum,
         |               CAST(sum(c) OVER () AS BIGINT) AS n
         |        FROM g),
         |c0 AS (SELECT CAST(min(CASE WHEN cum * 8 >= n THEN v END) AS DOUBLE) AS k1,
         |              CAST(min(CASE WHEN cum * 8 >= 3 * n THEN v END) AS DOUBLE) AS k2,
         |              CAST(min(CASE WHEN cum * 8 >= 5 * n THEN v END) AS DOUBLE) AS k3,
         |              CAST(min(CASE WHEN cum * 8 >= 7 * n THEN v END) AS DOUBLE) AS k4
         |       FROM cum),
         |a1 AS (SELECT g.v, g.c,
         |              CASE WHEN abs(g.v - c0.k1) <= abs(g.v - c0.k2) AND
         |                        abs(g.v - c0.k1) <= abs(g.v - c0.k3) AND
         |                        abs(g.v - c0.k1) <= abs(g.v - c0.k4) THEN 1
         |                   WHEN abs(g.v - c0.k2) <= abs(g.v - c0.k3) AND
         |                        abs(g.v - c0.k2) <= abs(g.v - c0.k4) THEN 2
         |                   WHEN abs(g.v - c0.k3) <= abs(g.v - c0.k4) THEN 3
         |                   ELSE 4 END AS k
         |       FROM g CROSS JOIN c0),
         |c1 AS (SELECT max(CASE WHEN k = 1 THEN m END) AS k1,
         |              max(CASE WHEN k = 2 THEN m END) AS k2,
         |              max(CASE WHEN k = 3 THEN m END) AS k3,
         |              max(CASE WHEN k = 4 THEN m END) AS k4
         |       FROM (SELECT k, CAST(sum(c * v) AS DOUBLE) / sum(c) AS m
         |             FROM a1 GROUP BY 1)),
         |a2 AS (SELECT g.v, g.c,
         |              CASE WHEN abs(g.v - c1.k1) <= abs(g.v - c1.k2) AND
         |                        abs(g.v - c1.k1) <= abs(g.v - c1.k3) AND
         |                        abs(g.v - c1.k1) <= abs(g.v - c1.k4) THEN 1
         |                   WHEN abs(g.v - c1.k2) <= abs(g.v - c1.k3) AND
         |                        abs(g.v - c1.k2) <= abs(g.v - c1.k4) THEN 2
         |                   WHEN abs(g.v - c1.k3) <= abs(g.v - c1.k4) THEN 3
         |                   ELSE 4 END AS k
         |       FROM g CROSS JOIN c1),
         |c2 AS (SELECT max(CASE WHEN k = 1 THEN m END) AS k1,
         |              max(CASE WHEN k = 2 THEN m END) AS k2,
         |              max(CASE WHEN k = 3 THEN m END) AS k3,
         |              max(CASE WHEN k = 4 THEN m END) AS k4
         |       FROM (SELECT k, CAST(sum(c * v) AS DOUBLE) / sum(c) AS m
         |             FROM a2 GROUP BY 1)),
         |a3 AS (SELECT g.v, g.c,
         |              CASE WHEN abs(g.v - c2.k1) <= abs(g.v - c2.k2) AND
         |                        abs(g.v - c2.k1) <= abs(g.v - c2.k3) AND
         |                        abs(g.v - c2.k1) <= abs(g.v - c2.k4) THEN 1
         |                   WHEN abs(g.v - c2.k2) <= abs(g.v - c2.k3) AND
         |                        abs(g.v - c2.k2) <= abs(g.v - c2.k4) THEN 2
         |                   WHEN abs(g.v - c2.k3) <= abs(g.v - c2.k4) THEN 3
         |                   ELSE 4 END AS k
         |       FROM g CROSS JOIN c2)
         |SELECT k AS cluster, CAST(sum(c) AS BIGINT) AS n,
         |       ${Q.sqlR4("CAST(sum(c * v) AS DOUBLE) / sum(c)")} AS center_cents,
         |       ${Q.sqlR2("CAST(sum(c * v * v) AS DOUBLE) - " +
                 "CAST(sum(c * v) AS DOUBLE) / sum(c) * sum(c * v)")} AS inertia
         |FROM a3
         |GROUP BY 1
         |ORDER BY cluster""".stripMargin) { (s, d) =>
      kmeansOf(grid(s, d))
    },

    // 2-component Gaussian mixture via EM (round 16): 3 fixed rounds
    // on the same cents grid, seeded at the exact p25/p75 crossings
    // with the pooled variance and π = ½ — "is the purchase-value
    // distribution one population or two". Responsibilities use the
    // normalized-φ tree exp(−(v−μ)²/2σ²)/σ (the √2π cancels in the
    // ratio); each cell's fractional (r, r·v, r·v²) moments floor onto
    // 1e9 / 1e3 / 1e0 lattices BEFORE the cross-cell sums, so the
    // M-step folds exact int64 in both engines; collapsed-variance
    // guard greatest(σ², 1) keeps the next E-step finite identically.
    Q("q_gmm_em",
      s"""WITH g AS ($GridSql),
         |cum AS (SELECT v, c, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum,
         |               CAST(sum(c) OVER () AS BIGINT) AS n,
         |               CAST(sum(c * v) OVER () AS BIGINT) AS sv,
         |               CAST(sum(c * v * v) OVER () AS BIGINT) AS qv
         |        FROM g),
         |p0 AS (SELECT CAST(min(CASE WHEN cum * 4 >= n THEN v END) AS DOUBLE) AS m1,
         |              CAST(min(CASE WHEN cum * 4 >= 3 * n THEN v END) AS DOUBLE) AS m2,
         |              greatest(CAST(max(qv) AS DOUBLE) / max(n) -
         |                       CAST(max(sv) AS DOUBLE) / max(n) *
         |                       (CAST(max(sv) AS DOUBLE) / max(n)), 1.0) AS s1,
         |              greatest(CAST(max(qv) AS DOUBLE) / max(n) -
         |                       CAST(max(sv) AS DOUBLE) / max(n) *
         |                       (CAST(max(sv) AS DOUBLE) / max(n)), 1.0) AS s2,
         |              0.5 AS p1
         |       FROM cum),
         |${(1 to 3).map { r =>
        val p = if (r == 1) "p0" else s"p${r - 1}"
        s"""e$r AS (SELECT g.v, g.c, $p.m1 AS pm1, $p.m2 AS pm2,
           |              $p.s1 AS ps1, $p.s2 AS ps2, $p.p1 AS pp1,
           |              CASE WHEN $p.p1 * (exp(-(g.v - $p.m1) * (g.v - $p.m1) / (2 * $p.s1)) / sqrt($p.s1)) +
           |                        (1 - $p.p1) * (exp(-(g.v - $p.m2) * (g.v - $p.m2) / (2 * $p.s2)) / sqrt($p.s2)) > 0
           |                   THEN $p.p1 * (exp(-(g.v - $p.m1) * (g.v - $p.m1) / (2 * $p.s1)) / sqrt($p.s1)) /
           |                        ($p.p1 * (exp(-(g.v - $p.m1) * (g.v - $p.m1) / (2 * $p.s1)) / sqrt($p.s1)) +
           |                         (1 - $p.p1) * (exp(-(g.v - $p.m2) * (g.v - $p.m2) / (2 * $p.s2)) / sqrt($p.s2)))
           |                   ELSE 0.5 END AS r1
           |       FROM g CROSS JOIN $p),
           |s$r AS (SELECT max(pm1) AS pm1, max(pm2) AS pm2, max(ps1) AS ps1,
           |               max(ps2) AS ps2, max(pp1) AS pp1,
           |               CAST(sum(c) AS BIGINT) AS n,
           |               CAST(sum(c * v) AS BIGINT) AS sv,
           |               CAST(sum(c * v * v) AS BIGINT) AS qv,
           |               CAST(sum(CAST(floor(c * r1 * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS w9,
           |               CAST(sum(CAST(floor(c * r1 * v * 1e3 + 0.5) AS BIGINT)) AS BIGINT) AS wv3,
           |               CAST(sum(CAST(floor(c * r1 * v * v + 0.5) AS BIGINT)) AS BIGINT) AS wvv
           |        FROM e$r),
           |p$r AS (SELECT CASE WHEN w9 > 0 AND w9 // 1000000000 < n THEN
           |                 (CAST(wv3 AS DOUBLE) / 1e3) / (CAST(w9 AS DOUBLE) / 1e9)
           |               ELSE pm1 END AS m1,
           |               CASE WHEN w9 > 0 AND w9 // 1000000000 < n THEN
           |                 (CAST(sv - wv3 / 1000 AS DOUBLE)) / (n - CAST(w9 AS DOUBLE) / 1e9)
           |               ELSE pm2 END AS m2,
           |               CASE WHEN w9 > 0 AND w9 // 1000000000 < n THEN
           |                 greatest(CAST(wvv AS DOUBLE) / (CAST(w9 AS DOUBLE) / 1e9) -
           |                   ((CAST(wv3 AS DOUBLE) / 1e3) / (CAST(w9 AS DOUBLE) / 1e9)) *
           |                   ((CAST(wv3 AS DOUBLE) / 1e3) / (CAST(w9 AS DOUBLE) / 1e9)), 1.0)
           |               ELSE ps1 END AS s1,
           |               CASE WHEN w9 > 0 AND w9 // 1000000000 < n THEN
           |                 greatest((CAST(qv AS DOUBLE) - wvv) / (n - CAST(w9 AS DOUBLE) / 1e9) -
           |                   ((CAST(sv - wv3 / 1000 AS DOUBLE)) / (n - CAST(w9 AS DOUBLE) / 1e9)) *
           |                   ((CAST(sv - wv3 / 1000 AS DOUBLE)) / (n - CAST(w9 AS DOUBLE) / 1e9)), 1.0)
           |               ELSE ps2 END AS s2,
           |               CASE WHEN w9 > 0 AND w9 // 1000000000 < n THEN
           |                 (CAST(w9 AS DOUBLE) / 1e9) / n
           |               ELSE pp1 END AS p1
           |        FROM s$r)""".stripMargin
      }.mkString(",\n")}
         |SELECT ${Q.sqlR6("p1")} AS pi_1,
         |       ${Q.sqlR2("m1")} AS mu1_cents, ${Q.sqlR2("m2")} AS mu2_cents,
         |       ${Q.sqlR2("sqrt(s1)")} AS sigma1_cents, ${Q.sqlR2("sqrt(s2)")} AS sigma2_cents
         |FROM p3""".stripMargin) { (s, d) =>
      gmmOf(grid(s, d))
    },

    // 1-D logistic regression of purchase propensity on event value
    // (round 16): P(purchase | value) = σ(a + b·x), x = value/$100 —
    // the PARAMETRIC companion to q_isotonic's shape-free fit, fitted
    // with 3 Newton–Raphson (IRLS) steps from (0,0). Each step's
    // gradient/Hessian cells floor onto the 1e6 lattice BEFORE the
    // cross-cell sums (order-free int64), the 2×2 solve is one
    // mirrored Cramer tree, and a degenerate Hessian keeps the
    // previous iterate in both engines. Deviance reported from the
    // final fit through the same per-cell lattice. The corpus
    // collapses once onto the bounded (value-cents, type) grid.
    Q("q_logistic_1d", {
      val stepSql = (r: Int) => {
        val p = if (r == 1) "w0" else s"w${r - 1}"
        s"""g$r AS (SELECT cl.n, cl.s, cl.x,
           |              1.0 / (1.0 + exp(-($p.a + $p.b * cl.x))) AS pr, $p.a AS a, $p.b AS b
           |       FROM cl CROSS JOIN $p),
           |h$r AS (SELECT max(a) AS a, max(b) AS b,
           |              CAST(sum(CAST(floor((s - n * pr) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS u6,
           |              CAST(sum(CAST(floor(x * (s - n * pr) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS ux6,
           |              CAST(sum(CAST(floor(n * pr * (1 - pr) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w6,
           |              CAST(sum(CAST(floor(x * n * pr * (1 - pr) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS wx6,
           |              CAST(sum(CAST(floor(x * x * n * pr * (1 - pr) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS wxx6
           |       FROM g$r),
           |w$r AS (SELECT CASE WHEN (CAST(w6 AS DOUBLE) / 1e6) * (CAST(wxx6 AS DOUBLE) / 1e6) -
           |                        (CAST(wx6 AS DOUBLE) / 1e6) * (CAST(wx6 AS DOUBLE) / 1e6) > 0
           |                    THEN a + ((CAST(u6 AS DOUBLE) / 1e6) * (CAST(wxx6 AS DOUBLE) / 1e6) -
           |                              (CAST(ux6 AS DOUBLE) / 1e6) * (CAST(wx6 AS DOUBLE) / 1e6)) /
           |                             ((CAST(w6 AS DOUBLE) / 1e6) * (CAST(wxx6 AS DOUBLE) / 1e6) -
           |                              (CAST(wx6 AS DOUBLE) / 1e6) * (CAST(wx6 AS DOUBLE) / 1e6))
           |                    ELSE a END AS a,
           |               CASE WHEN (CAST(w6 AS DOUBLE) / 1e6) * (CAST(wxx6 AS DOUBLE) / 1e6) -
           |                         (CAST(wx6 AS DOUBLE) / 1e6) * (CAST(wx6 AS DOUBLE) / 1e6) > 0
           |                    THEN b + ((CAST(ux6 AS DOUBLE) / 1e6) * (CAST(w6 AS DOUBLE) / 1e6) -
           |                              (CAST(u6 AS DOUBLE) / 1e6) * (CAST(wx6 AS DOUBLE) / 1e6)) /
           |                             ((CAST(w6 AS DOUBLE) / 1e6) * (CAST(wxx6 AS DOUBLE) / 1e6) -
           |                              (CAST(wx6 AS DOUBLE) / 1e6) * (CAST(wx6 AS DOUBLE) / 1e6))
           |                    ELSE b END AS b
           |        FROM h$r)""".stripMargin
      }
      s"""WITH rg AS (SELECT event_type AS g, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v100,
         |                   CAST(count(*) AS BIGINT) AS c
         |            FROM events GROUP BY 1, 2),
         |cl AS (SELECT v100, CAST(sum(c) AS BIGINT) AS n,
         |              CAST(sum(CASE WHEN g = 'purchase' THEN c ELSE 0 END) AS BIGINT) AS s,
         |              v100 / 10000.0 AS x
         |       FROM rg GROUP BY 1),
         |w0 AS (SELECT 0.0 AS a, 0.0 AS b),
         |${(1 to 3).map(stepSql).mkString(",\n")},
         |dvp AS (SELECT cl.n, cl.s, w3.a, w3.b,
         |               least(greatest(1.0 / (1.0 + exp(-(w3.a + w3.b * cl.x))), 1e-12),
         |                     1.0 - 1e-12) AS pr
         |        FROM cl CROSS JOIN w3),
         |dv AS (SELECT CAST(sum(n) AS BIGINT) AS n_events,
         |              max(a) AS a, max(b) AS b,
         |              CAST(sum(CAST(floor((s * ln(pr) + (n - s) * ln(1.0 - pr)) * 1e6
         |                + 0.5) AS BIGINT)) AS BIGINT) AS ll6
         |       FROM dvp)
         |SELECT n_events, ${Q.sqlR6("a")} AS intercept, ${Q.sqlR6("b")} AS slope_per_100usd,
         |       ${Q.sqlR2("-2.0 * (CAST(ll6 AS DOUBLE) / 1e6)")} AS deviance
         |FROM dv""".stripMargin
    }) { (s, d) =>
      logisticOf(Tables.events(s, d)
        .select(col("event_type").as("g"),
          floor(col("value") * 100 + 0.5).cast("long").as("v100"))
        .groupBy("g", "v100")
        .agg(count(lit(1)).as("c")))
    }
  )

  /** The 3-step IRLS logistic fit over a (g, v100, c) value grid —
    * ONE home shared by batch q_logistic_1d and the s_logistic_1d
    * streaming read-time view (the grid is streaming.Streams.rankGrid's
    * mergeable state). */
  private[graft] def logisticOf(rg: DataFrame): DataFrame = {
    val cl = Q.snapshot(rg.groupBy("v100")
      .agg(sum("c").as("n"),
        sum(when(col("g") === "purchase", col("c")).otherwise(0L)).as("s"))
      .withColumn("x", col("v100") / lit(10000.0)))

    def step(p: DataFrame): DataFrame = {
      val pr = lit(1.0) / (lit(1.0) + exp(-(col("a") + col("b") * col("x"))))
      val h = cl.crossJoin(broadcast(p))
        .withColumn("pr", pr)
        .agg(max("a").as("a"), max("b").as("b"),
          sum(floor((col("s") - col("n") * col("pr")) * lit(1e6) + 0.5).cast("long")).as("u6"),
          sum(floor(col("x") * (col("s") - col("n") * col("pr")) * lit(1e6) + 0.5)
            .cast("long")).as("ux6"),
          sum(floor(col("n") * col("pr") * (lit(1) - col("pr")) * lit(1e6) + 0.5)
            .cast("long")).as("w6"),
          sum(floor(col("x") * col("n") * col("pr") * (lit(1) - col("pr")) * lit(1e6) + 0.5)
            .cast("long")).as("wx6"),
          sum(floor(col("x") * col("x") * col("n") * col("pr") * (lit(1) - col("pr")) *
            lit(1e6) + 0.5).cast("long")).as("wxx6"))
      val w6 = col("w6").cast("double") / lit(1e6)
      val wx6 = col("wx6").cast("double") / lit(1e6)
      val wxx6 = col("wxx6").cast("double") / lit(1e6)
      val u6 = col("u6").cast("double") / lit(1e6)
      val ux6 = col("ux6").cast("double") / lit(1e6)
      val det = w6 * wxx6 - wx6 * wx6
      h.select(
        when(det > 0, col("a") + (u6 * wxx6 - ux6 * wx6) / det).otherwise(col("a")).as("a"),
        when(det > 0, col("b") + (ux6 * w6 - u6 * wx6) / det).otherwise(col("b")).as("b"))
    }

    val w0 = cl.sparkSession.range(1).select(lit(0.0).as("a"), lit(0.0).as("b"))
    val w3 = Q.snapshot(step(Q.snapshot(step(Q.snapshot(step(w0))))))
    // Saturation clamp (r17, ADVICE): a saturated pr = 0/1 would send
    // ln(pr)/ln(1−pr) to −inf whose lattice cast diverges between
    // engines (DuckDB cast error vs Spark Long.MinValue); the clamp is
    // mirrored in the oracle's dvp CTE and is a no-op at any |a+bx|
    // reachable in 3 IRLS steps on cents-bounded x.
    val prF = least(greatest(
      lit(1.0) / (lit(1.0) + exp(-(col("a") + col("b") * col("x")))),
      lit(1e-12)), lit(1.0) - lit(1e-12))
    cl.crossJoin(broadcast(w3))
      .withColumn("pr", prF)
      .agg(sum("n").as("n_events"), max("a").as("a"), max("b").as("b"),
        sum(floor((col("s") * log(col("pr")) +
          (col("n") - col("s")) * log(lit(1.0) - col("pr"))) * lit(1e6) + 0.5)
          .cast("long")).as("ll6"))
      .select(col("n_events"), Q.r6(col("a")).as("intercept"),
        Q.r6(col("b")).as("slope_per_100usd"),
        Q.r2(lit(-2.0) * (col("ll6").cast("double") / lit(1e6))).as("deviance"))
  }

  /** The k-means Lloyd rounds over a (v, c) cents grid — ONE home
    * shared by batch q_kmeans_1d and the s_kmeans_1d streaming
    * read-time view (a new purchase shifts its cell count and every
    * center re-prices; the cents grid is the mergeable state). */
  private[graft] def kmeansOf(gridIn: DataFrame): DataFrame = {
    val g = Q.snapshot(gridIn)
    val wv = Window.orderBy("v")
    val cum = g.withColumn("cum", sum("c").over(wv))
      .withColumn("n", sum("c").over(Window.partitionBy()))
    val c0 = cum.agg(
      min(when(col("cum") * 8 >= col("n"), col("v"))).cast("double").as("k1"),
      min(when(col("cum") * 8 >= lit(3) * col("n"), col("v"))).cast("double").as("k2"),
      min(when(col("cum") * 8 >= lit(5) * col("n"), col("v"))).cast("double").as("k3"),
      min(when(col("cum") * 8 >= lit(7) * col("n"), col("v"))).cast("double").as("k4"))

    def assign(centers: DataFrame): DataFrame = {
      def dk(i: Int) = abs(col("v") - col(s"k$i"))
      g.crossJoin(broadcast(centers))
        .withColumn("k",
          when(dk(1) <= dk(2) && dk(1) <= dk(3) && dk(1) <= dk(4), 1)
            .when(dk(2) <= dk(3) && dk(2) <= dk(4), 2)
            .when(dk(3) <= dk(4), 3)
            .otherwise(4))
    }
    def update(a: DataFrame): DataFrame =
      a.groupBy("k").agg((sum(col("c") * col("v")).cast("double") / sum("c")).as("m"))
        .agg(max(when(col("k") === 1, col("m"))).as("k1"),
          max(when(col("k") === 2, col("m"))).as("k2"),
          max(when(col("k") === 3, col("m"))).as("k3"),
          max(when(col("k") === 4, col("m"))).as("k4"))

    val a3 = assign(Q.snapshot(update(assign(
      Q.snapshot(update(assign(Q.snapshot(c0))))))))
    a3.groupBy(col("k").as("cluster"))
      .agg(sum("c").as("n"), sum(col("c") * col("v")).as("sv"),
        sum(col("c") * col("v") * col("v")).as("qv"))
      .select(col("cluster"), col("n"),
        Q.r4(col("sv").cast("double") / col("n")).as("center_cents"),
        Q.r2(col("qv").cast("double") -
          col("sv").cast("double") / col("n") * col("sv")).as("inertia"))
      .orderBy("cluster")
  }

  /** The 3-round EM over a (v, c) cents grid — ONE home shared by
    * batch q_gmm_em and the s_gmm_em streaming read-time view (the
    * cents grid is the mergeable state; every round re-prices the
    * responsibilities globally). */
  private[graft] def gmmOf(gridIn: DataFrame): DataFrame = {
    val g = Q.snapshot(gridIn)
    val wv = Window.orderBy("v")
    val cum = g.withColumn("cum", sum("c").over(wv))
      .withColumn("n", sum("c").over(Window.partitionBy()))
      .withColumn("sv", sum(col("c") * col("v")).over(Window.partitionBy()))
      .withColumn("qv", sum(col("c") * col("v") * col("v")).over(Window.partitionBy()))
    val mean = col("svx").cast("double") / col("nx")
    val p0 = cum.agg(
      min(when(col("cum") * 4 >= col("n"), col("v"))).cast("double").as("m1"),
      min(when(col("cum") * 4 >= lit(3) * col("n"), col("v"))).cast("double").as("m2"),
      max("n").as("nx"), max("sv").as("svx"), max("qv").as("qvx"))
      .select(col("m1"), col("m2"),
        greatest(col("qvx").cast("double") / col("nx") - mean * mean, lit(1.0)).as("s1"),
        greatest(col("qvx").cast("double") / col("nx") - mean * mean, lit(1.0)).as("s2"),
        lit(0.5).as("p1"))

    def phi(m: Column, sg: Column): Column =
      exp(-(col("v") - m) * (col("v") - m) / (lit(2) * sg)) / sqrt(sg)

    def round(p: DataFrame): DataFrame = {
      val den = col("p1") * phi(col("m1"), col("s1")) +
        (lit(1) - col("p1")) * phi(col("m2"), col("s2"))
      val e = g.crossJoin(broadcast(p))
        .withColumn("r1", when(den > 0,
          col("p1") * phi(col("m1"), col("s1")) / den).otherwise(0.5))
      val st = e.agg(max("m1").as("pm1"), max("m2").as("pm2"),
        max("s1").as("ps1"), max("s2").as("ps2"), max("p1").as("pp1"),
        sum("c").as("n"),
        sum(col("c") * col("v")).as("sv"),
        sum(col("c") * col("v") * col("v")).as("qv"),
        sum(floor(col("c") * col("r1") * lit(1e9) + 0.5).cast("long")).as("w9"),
        sum(floor(col("c") * col("r1") * col("v") * lit(1e3) + 0.5).cast("long")).as("wv3"),
        sum(floor(col("c") * col("r1") * col("v") * col("v") + 0.5).cast("long")).as("wvv"))
      val w = col("w9").cast("double") / lit(1e9)
      val m1n = (col("wv3").cast("double") / lit(1e3)) / w
      val m2n = (col("sv") - col("wv3") / lit(1000L)).cast("double") / (col("n") - w)
      // Responsibility-collapse guard (r17, ADVICE): if ALL weight
      // lands on one component (w9 = 0 or w9 = n·1e9) the M-step
      // divides 0/0 — keep the previous iterate instead, identically
      // in both engines (the logistic det>0 convention). The bound is
      // floor-division (w9 div 1e9 < n ⟺ w9 < n·1e9 for positive
      // ints) so no int64 product can overflow past n ≈ 9.2e9 rows —
      // Spark would wrap silently while DuckDB raises (r18 ADVICE).
      val ok = col("w9") > 0 && expr("w9 div 1000000000") < col("n")
      st.select(when(ok, m1n).otherwise(col("pm1")).as("m1"),
        when(ok, m2n).otherwise(col("pm2")).as("m2"),
        when(ok, greatest(col("wvv").cast("double") / w - m1n * m1n, lit(1.0)))
          .otherwise(col("ps1")).as("s1"),
        when(ok, greatest((col("qv").cast("double") - col("wvv")) / (col("n") - w) -
          m2n * m2n, lit(1.0))).otherwise(col("ps2")).as("s2"),
        when(ok, w / col("n")).otherwise(col("pp1")).as("p1"))
    }

    val p3 = round(Q.snapshot(round(Q.snapshot(round(Q.snapshot(p0))))))
    p3.select(Q.r6(col("p1")).as("pi_1"),
      Q.r2(col("m1")).as("mu1_cents"), Q.r2(col("m2")).as("mu2_cents"),
      Q.r2(sqrt(col("s1"))).as("sigma1_cents"), Q.r2(sqrt(col("s2"))).as("sigma2_cents"))
  }
}
