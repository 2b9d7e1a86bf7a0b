package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multiple-testing and evidence-pooling screens (round 16, SURVEY
  * §2.15) — what a platform runs when it tests MANY hypotheses at
  * once: the Benjamini–Hochberg step-up over a per-nation test family
  * (with Bonferroni beside it), fixed-effect inverse-variance
  * meta-analysis with Cochran's Q / I² heterogeneity, and the
  * Simpson's-paradox flip screen that guards every aggregate
  * association readout.
  *
  * Determinism discipline: every test statistic derives from exact
  * int64 cents moments through ONE mirrored IEEE tree (the
  * q_group_sequential Welch form); the normal tail probability is the
  * Abramowitz–Stegun 26.2.17 polynomial — pure literals + one exp()
  * per row, identical in both engines — and is integer-latticed to
  * 1e9 BEFORE any ranking or threshold comparison, so the BH step-up
  * and every rejection flag are decided on cross-multiplied int64,
  * never on a float inequality. Family frames are nation-bounded
  * (≤25 rows); the corpus collapses once per query.
  */
object Meta {

  /** Abramowitz–Stegun 26.2.17 two-sided normal p-value 2(1−Φ(|z|)),
    * |abs error| < 7.5e-8 — pure IEEE literals + one exp(). */
  private def pTwoSided(z: Column): Column = {
    val az = abs(z)
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) + t *
      (lit(1.781477937) + t * (lit(-1.821255978) + t * lit(1.330274429)))))
    lit(2.0) * lit(0.3989422804014327) * exp(-az * az / 2) * poly
  }

  /** DuckDB twin of [[pTwoSided]] over a column expression. */
  private def sqlPTwoSided(z: String): String =
    s"""2.0 * 0.3989422804014327 * exp(-abs($z) * abs($z) / 2) *
       |    (1.0 / (1.0 + 0.2316419 * abs($z))) * (0.319381530 +
       |     (1.0 / (1.0 + 0.2316419 * abs($z))) * (-0.356563782 +
       |      (1.0 / (1.0 + 0.2316419 * abs($z))) * (1.781477937 +
       |       (1.0 / (1.0 + 0.2316419 * abs($z))) * (-1.821255978 +
       |        (1.0 / (1.0 + 0.2316419 * abs($z))) * 1.330274429))))""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // Benjamini–Hochberg FDR step-up over the per-nation family
    // (round 16): each nation's customer balances against the rest of
    // the world — 25 simultaneous Welch z tests, the exact situation
    // BH was built for. p-values go onto the 1e9 integer lattice
    // BEFORE ranking; the step-up condition p(k) ≤ (k/m)·0.05 and the
    // Bonferroni bound are cross-multiplied int64 comparisons
    // (p9·m·20 ≤ k·1e9), so no float inequality ever decides a
    // rejection. The family frame is 25 rows — every window here is
    // nation-bounded, and the corpus collapses once into per-nation
    // cents moments with map-side partials.
    Q("q_fdr_bh",
      s"""WITH cv AS (SELECT c_nationkey,
         |                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v
         |            FROM customer),
         |g AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(v) AS BIGINT) AS s,
         |             CAST(sum(v * v) AS BIGINT) AS q
         |      FROM cv GROUP BY 1),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS s,
         |               CAST(sum(q) AS BIGINT) AS q FROM g),
         |z AS (SELECT nn.n_name, g.n,
         |             CASE WHEN g.n >= 2 AND tot.n - g.n >= 2 AND
         |               (CAST(g.q AS DOUBLE) - CAST(g.s AS DOUBLE) / g.n * g.s) /
         |                      (g.n - 1) / g.n +
         |                    (CAST(tot.q - g.q AS DOUBLE) -
         |                     CAST(tot.s - g.s AS DOUBLE) / (tot.n - g.n) * (tot.s - g.s)) /
         |                      (tot.n - g.n - 1) / (tot.n - g.n) > 0 THEN
         |               (CAST(g.s AS DOUBLE) / g.n -
         |                CAST(tot.s - g.s AS DOUBLE) / (tot.n - g.n)) /
         |               sqrt((CAST(g.q AS DOUBLE) - CAST(g.s AS DOUBLE) / g.n * g.s) /
         |                      (g.n - 1) / g.n +
         |                    (CAST(tot.q - g.q AS DOUBLE) -
         |                     CAST(tot.s - g.s AS DOUBLE) / (tot.n - g.n) * (tot.s - g.s)) /
         |                      (tot.n - g.n - 1) / (tot.n - g.n))
         |             END AS z
         |      FROM g JOIN nation nn ON nn.n_nationkey = g.c_nationkey
         |      CROSS JOIN tot),
         |p AS (SELECT n_name, n, z,
         |             CASE WHEN z IS NOT NULL THEN
         |               CAST(floor((${sqlPTwoSided("z")}) * 1e9 + 0.5) AS BIGINT)
         |             END AS p9
         |      FROM z),
         |r AS (SELECT n_name, n, z, p9,
         |             CASE WHEN p9 IS NOT NULL THEN
         |               CAST(row_number() OVER (PARTITION BY (p9 IS NULL)
         |                                       ORDER BY p9, n_name) AS BIGINT)
         |             END AS rn,
         |             CAST(count(p9) OVER () AS BIGINT) AS m
         |      FROM p),
         |k AS (SELECT max(CASE WHEN p9 * m * 20 <= rn * 1000000000 THEN rn END) AS kmax
         |      FROM r)
         |SELECT r.n_name, r.n, ${Q.sqlR4("r.z")} AS z,
         |       ${Q.sqlR6("CAST(r.p9 AS DOUBLE) / 1e9")} AS p_value,
         |       CASE WHEN r.rn IS NULL THEN NULL
         |            WHEN k.kmax IS NOT NULL AND r.rn <= k.kmax THEN 1 ELSE 0
         |       END AS bh_reject,
         |       CASE WHEN r.p9 IS NULL THEN NULL
         |            WHEN r.p9 * r.m <= 50000000 THEN 1 ELSE 0 END AS bonf_reject
         |FROM r CROSS JOIN k
         |ORDER BY r.n_name""".stripMargin) { (s, d) =>
      val cv = Tables.load(s, d, "customer").select(col("c_nationkey"),
        floor(col("c_acctbal") * 100 + 0.5).cast("long").as("v"))
      val g = cv.groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"), sum("v").as("s"), sum(col("v") * col("v")).as("q"))
      val tot = g.agg(sum("n").as("tn"), sum("s").as("ts"), sum("q").as("tq"))
      // Welch variance > 0 guard (r17, ADVICE): a constant-balance
      // group AND complement give 0/0 = NaN whose floor+CAST is NULL
      // in Spark but an error in DuckDB — both engines must emit NULL.
      val welchVar =
        (col("q").cast("double") - col("s").cast("double") / col("n") * col("s")) /
          (col("n") - 1) / col("n") +
          ((col("tq") - col("q")).cast("double") -
            (col("ts") - col("s")).cast("double") / (col("tn") - col("n")) *
              (col("ts") - col("s"))) /
            (col("tn") - col("n") - 1) / (col("tn") - col("n"))
      val withZ = g
        .join(Tables.load(s, d, "nation").select(col("n_nationkey"), col("n_name")),
          col("n_nationkey") === col("c_nationkey"))
        .crossJoin(broadcast(tot))
        .withColumn("z",
          when(col("n") >= 2 && col("tn") - col("n") >= 2 && welchVar > 0,
            (col("s").cast("double") / col("n") -
              (col("ts") - col("s")).cast("double") / (col("tn") - col("n"))) /
              sqrt(welchVar)))
        .withColumn("p9",
          when(col("z").isNotNull, floor(pTwoSided(col("z")) * lit(1e9) + 0.5).cast("long")))
      val ranked = withZ
        .withColumn("rn",
          when(col("p9").isNotNull,
            row_number().over(Window.partitionBy(col("p9").isNull)
              .orderBy(col("p9"), col("n_name"))).cast("long")))
        .withColumn("m", count(col("p9")).over(Window.partitionBy()).cast("long"))
        .withColumn("kmax",
          max(when(col("p9") * col("m") * 20 <= col("rn") * lit(1000000000L), col("rn")))
            .over(Window.partitionBy()))
      ranked.select(col("n_name"), col("n"), Q.r4(col("z")).as("z"),
        Q.r6(col("p9").cast("double") / lit(1e9)).as("p_value"),
        when(col("rn").isNull, lit(null).cast("int"))
          .when(col("kmax").isNotNull && col("rn") <= col("kmax"), 1)
          .otherwise(0).as("bh_reject"),
        when(col("p9").isNull, lit(null).cast("int"))
          .when(col("p9") * col("m") <= lit(50000000L), 1)
          .otherwise(0).as("bonf_reject"))
        .orderBy("n_name")
    },

    // Fixed-effect inverse-variance meta-analysis (round 16): each
    // nation is a "study" comparing BUILDING-segment customer balances
    // against the nation's other segments; the pooled effect, its
    // standard error, Cochran's Q and I² quantify whether 25 local
    // contrasts tell one global story. Study effects and variances
    // derive from exact int64 cents moments; the cross-study sums
    // (Σw, Σw·δ, Σw·(δ−pooled)²) are integer-latticed per STUDY
    // (1e15 / 1e12 / 1e6 — each term a deterministic double, floored
    // identically in both engines) so the ≤25-row reductions are
    // order-free int64 folds. Two passes over the 25-row study frame
    // (pooled first, then Q against it) — the corpus collapses once.
    Q("q_meta_fixed",
      s"""WITH cv AS (SELECT c_nationkey,
         |                   CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS grp,
         |                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v
         |            FROM customer),
         |g AS (SELECT c_nationkey, grp, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(v) AS BIGINT) AS s, CAST(sum(v * v) AS BIGINT) AS q
         |      FROM cv GROUP BY 1, 2),
         |st AS (SELECT c_nationkey,
         |              max(CASE WHEN grp = 1 THEN n END) AS n1,
         |              max(CASE WHEN grp = 1 THEN s END) AS s1,
         |              max(CASE WHEN grp = 1 THEN q END) AS q1,
         |              max(CASE WHEN grp = 0 THEN n END) AS n2,
         |              max(CASE WHEN grp = 0 THEN s END) AS s2,
         |              max(CASE WHEN grp = 0 THEN q END) AS q2
         |       FROM g GROUP BY 1),
         |eff AS (SELECT c_nationkey,
         |               CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS d,
         |               (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) / n1 * s1) / (n1 - 1) / n1 +
         |               (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) / n2 * s2) / (n2 - 1) / n2 AS v
         |        FROM st
         |        WHERE n1 >= 2 AND n2 >= 2),
         |ok AS (SELECT c_nationkey, d, v FROM eff WHERE v > 0),
         |s1p AS (SELECT CAST(count(*) AS BIGINT) AS k,
         |               CAST(sum(CAST(floor(1.0 / v * 1e15 + 0.5) AS BIGINT)) AS BIGINT) AS w15,
         |               CAST(sum(CAST(floor(d / v * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS wd12
         |        FROM ok),
         |pl AS (SELECT k, w15, wd12,
         |              (CAST(wd12 AS DOUBLE) / 1e12) / (CAST(w15 AS DOUBLE) / 1e15) AS pooled
         |       FROM s1p WHERE k >= 2 AND w15 > 0),
         |qq AS (SELECT pl.k, pl.w15, pl.pooled,
         |              CAST(sum(CAST(floor((ok.d - pl.pooled) * (ok.d - pl.pooled) / ok.v * 1e6
         |                                  + 0.5) AS BIGINT)) AS BIGINT) AS q6
         |       FROM ok CROSS JOIN pl
         |       GROUP BY 1, 2, 3)
         |SELECT k AS k_studies, ${Q.sqlR4("pooled")} AS pooled_cents,
         |       ${Q.sqlR6("sqrt(1.0 / (CAST(w15 AS DOUBLE) / 1e15))")} AS se,
         |       ${Q.sqlR4("CAST(q6 AS DOUBLE) / 1e6")} AS cochran_q,
         |       ${Q.sqlR4("CASE WHEN q6 > 0 AND CAST(q6 AS DOUBLE) / 1e6 > k - 1 " +
                 "THEN (CAST(q6 AS DOUBLE) / 1e6 - (k - 1)) / (CAST(q6 AS DOUBLE) / 1e6) " +
                 "ELSE 0.0 END")} AS i2
         |FROM qq
         |ORDER BY k_studies""".stripMargin) { (s, d) =>
      val cv = Tables.load(s, d, "customer").select(col("c_nationkey"),
        when(col("c_mktsegment") === "BUILDING", 1).otherwise(0).as("grp"),
        floor(col("c_acctbal") * 100 + 0.5).cast("long").as("v"))
      val g = cv.groupBy("c_nationkey", "grp")
        .agg(count(lit(1)).as("n"), sum("v").as("s"), sum(col("v") * col("v")).as("q"))
      val st = g.groupBy("c_nationkey")
        .agg(max(when(col("grp") === 1, col("n"))).as("n1"),
          max(when(col("grp") === 1, col("s"))).as("s1"),
          max(when(col("grp") === 1, col("q"))).as("q1"),
          max(when(col("grp") === 0, col("n"))).as("n2"),
          max(when(col("grp") === 0, col("s"))).as("s2"),
          max(when(col("grp") === 0, col("q"))).as("q2"))
      val ok = st.filter(col("n1") >= 2 && col("n2") >= 2)
        .select(col("c_nationkey"),
          (col("s1").cast("double") / col("n1") -
            col("s2").cast("double") / col("n2")).as("d"),
          ((col("q1").cast("double") - col("s1").cast("double") / col("n1") * col("s1")) /
            (col("n1") - 1) / col("n1") +
            (col("q2").cast("double") - col("s2").cast("double") / col("n2") * col("s2")) /
              (col("n2") - 1) / col("n2")).as("v"))
        .filter(col("v") > 0)
        .transform(Q.snapshot)
      val s1p = ok.agg(count(lit(1)).as("k"),
        sum(floor(lit(1.0) / col("v") * lit(1e15) + 0.5).cast("long")).as("w15"),
        sum(floor(col("d") / col("v") * lit(1e12) + 0.5).cast("long")).as("wd12"))
      val pl = s1p.filter(col("k") >= 2 && col("w15") > 0)
        .withColumn("pooled",
          (col("wd12").cast("double") / lit(1e12)) / (col("w15").cast("double") / lit(1e15)))
      val qq = ok.crossJoin(broadcast(pl))
        .groupBy("k", "w15", "pooled")
        .agg(sum(floor((col("d") - col("pooled")) * (col("d") - col("pooled")) / col("v") *
          lit(1e6) + 0.5).cast("long")).as("q6"))
      qq.select(col("k").as("k_studies"),
        Q.r4(col("pooled")).as("pooled_cents"),
        Q.r6(sqrt(lit(1.0) / (col("w15").cast("double") / lit(1e15)))).as("se"),
        Q.r4(col("q6").cast("double") / lit(1e6)).as("cochran_q"),
        Q.r4(when(col("q6") > 0 && col("q6").cast("double") / lit(1e6) > col("k") - 1,
          (col("q6").cast("double") / lit(1e6) - (col("k") - 1)) /
            (col("q6").cast("double") / lit(1e6)))
          .otherwise(lit(0.0))).as("i2"))
        .orderBy("k_studies")
    },

    // Simpson's-paradox flip screen (round 16): does the aggregate
    // association between deep discounting (l_discount ≥ 0.05) and
    // returns (l_returnflag = 'R') keep its sign inside every
    // l_linestatus stratum? The 2×2 odds-direction per stratum is the
    // exact integer sign of a·d − b·c — no division, no float — and
    // the ALL row's flip flag is 1 exactly when every stratum sign is
    // the OPPOSITE of the aggregate sign (the textbook paradox), so
    // the whole readout is integer comparisons on a ≤3-row frame. One
    // corpus scan into (stratum, x, y) counts with map-side partials.
    Q("q_simpson_flip",
      s"""WITH cells AS (SELECT l_linestatus AS stratum,
         |                      CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS x,
         |                      CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         |                      CAST(count(*) AS BIGINT) AS c
         |               FROM lineitem GROUP BY 1, 2, 3),
         |g AS (SELECT stratum,
         |             CAST(sum(CASE WHEN x = 1 AND y = 1 THEN c ELSE 0 END) AS BIGINT) AS a,
         |             CAST(sum(CASE WHEN x = 1 AND y = 0 THEN c ELSE 0 END) AS BIGINT) AS b,
         |             CAST(sum(CASE WHEN x = 0 AND y = 1 THEN c ELSE 0 END) AS BIGINT) AS cc,
         |             CAST(sum(CASE WHEN x = 0 AND y = 0 THEN c ELSE 0 END) AS BIGINT) AS dd
         |      FROM cells GROUP BY 1),
         |al AS (SELECT 'ALL' AS stratum, CAST(sum(a) AS BIGINT) AS a,
         |              CAST(sum(b) AS BIGINT) AS b, CAST(sum(cc) AS BIGINT) AS cc,
         |              CAST(sum(dd) AS BIGINT) AS dd
         |       FROM g),
         |u AS (SELECT stratum, a, b, cc, dd,
         |             CASE WHEN a * dd > b * cc THEN 1
         |                  WHEN a * dd < b * cc THEN -1 ELSE 0 END AS sgn
         |      FROM (SELECT * FROM g UNION ALL SELECT * FROM al)),
         |fl AS (SELECT CASE WHEN (SELECT sgn FROM u WHERE stratum = 'ALL') <> 0
         |                    AND NOT EXISTS (SELECT 1 FROM u WHERE stratum <> 'ALL' AND
         |                      sgn <> -1 * (SELECT sgn FROM u WHERE stratum = 'ALL'))
         |              THEN 1 ELSE 0 END AS flip)
         |SELECT u.stratum, u.a AS n_disc_ret, u.b AS n_disc_kept,
         |       u.cc AS n_full_ret, u.dd AS n_full_kept, u.sgn AS assoc_sign,
         |       CASE WHEN u.a > 0 AND u.b > 0 AND u.cc > 0 AND u.dd > 0 THEN
         |         ${Q.sqlR6("CAST(u.a AS DOUBLE) * u.dd / (CAST(u.b AS DOUBLE) * u.cc)")}
         |       END AS odds_ratio,
         |       fl.flip
         |FROM u CROSS JOIN fl
         |ORDER BY u.stratum""".stripMargin) { (s, d) =>
      val cells = Tables.load(s, d, "lineitem")
        .groupBy(col("l_linestatus").as("stratum"),
          when(col("l_discount") >= 0.05, 1).otherwise(0).as("x"),
          when(col("l_returnflag") === "R", 1).otherwise(0).as("y"))
        .agg(count(lit(1)).as("c"))
      val g = cells.groupBy("stratum")
        .agg(sum(when(col("x") === 1 && col("y") === 1, col("c")).otherwise(0L)).as("a"),
          sum(when(col("x") === 1 && col("y") === 0, col("c")).otherwise(0L)).as("b"),
          sum(when(col("x") === 0 && col("y") === 1, col("c")).otherwise(0L)).as("cc"),
          sum(when(col("x") === 0 && col("y") === 0, col("c")).otherwise(0L)).as("dd"))
        .transform(Q.snapshot)
      val al = g.agg(sum("a").as("a"), sum("b").as("b"),
        sum("cc").as("cc"), sum("dd").as("dd"))
        .select(lit("ALL").as("stratum"), col("a"), col("b"), col("cc"), col("dd"))
      val u = g.select(col("stratum"), col("a"), col("b"), col("cc"), col("dd"))
        .unionByName(al)
        .withColumn("sgn",
          when(col("a") * col("dd") > col("b") * col("cc"), 1)
            .when(col("a") * col("dd") < col("b") * col("cc"), -1)
            .otherwise(0))
        .transform(Q.snapshot)
      val allSgn = u.filter(col("stratum") === "ALL")
        .select(col("sgn").as("all_sgn"))
      val nOppose = u.filter(col("stratum") =!= "ALL")
        .crossJoin(broadcast(allSgn))
        .agg(count(lit(1)).as("n_strata"),
          sum(when(col("sgn") === lit(-1) * col("all_sgn"), 1L).otherwise(0L)).as("n_opp"),
          max("all_sgn").as("all_sgn"))
      val fl = nOppose.select(
        when(col("all_sgn") =!= 0 && col("n_opp") === col("n_strata"), 1)
          .otherwise(0).as("flip"))
      u.crossJoin(broadcast(fl))
        .select(col("stratum"), col("a").as("n_disc_ret"), col("b").as("n_disc_kept"),
          col("cc").as("n_full_ret"), col("dd").as("n_full_kept"),
          col("sgn").as("assoc_sign"),
          when(col("a") > 0 && col("b") > 0 && col("cc") > 0 && col("dd") > 0,
            Q.r6(col("a").cast("double") * col("dd") /
              (col("b").cast("double") * col("cc")))).as("odds_ratio"),
          col("flip"))
        .orderBy("stratum")
    }
  )
}
