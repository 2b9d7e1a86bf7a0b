package graft.ops

import graft.{Q, QueryDef}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical randomness / overdispersion / drift tests over the daily
  * event series (round 13, SURVEY §2.15) — the screening battery that
  * runs BEFORE the modeling families (q_ar1, q_holt_linear,
  * q_changepoint) are trusted: Wald–Wolfowitz runs, turning points,
  * the Poisson dispersion index, Grubbs' outlier statistic, and the
  * Page–Hinkley drift statistic.
  *
  * Same determinism discipline as ops/Inference.scala: every operator
  * reduces the corpus ONCE onto the shared (|types|×|days|)-row
  * dailyCounts frame (exact int64 day indices and counts, map-side
  * partials), then derives its statistic from integer sufficient
  * statistics through one mirrored IEEE formula tree — the only
  * sequential state (Page–Hinkley's cumulative deviation) is
  * integer-lattice scaled per row BEFORE the running sum, so the
  * cross-row accumulation is exact int64 in both engines. Windows and
  * rollups all run over the collapsed daily frame, never raw events.
  */
object SeriesTests {

  def defs: Seq[QueryDef] = Seq(

    // Wald–Wolfowitz runs test on the SIGNS of day-over-day volume
    // changes per type: too few runs = trending/sticky, too many =
    // oscillating — the independence screen q_acf's linear correlation
    // can miss (sign runs catch nonlinear stickiness). Zero-change
    // days drop (the standard treatment); z is the normal
    // approximation (R − μ)/σ with μ = 2·n₊·n₋/n + 1. All counts are
    // exact int64; NULL z when a side is empty (σ = 0).
    Q("q_runs_test",
      s"""WITH daily AS (${Inference.dailySql}),
         |sg AS (SELECT event_type, x,
         |              CASE WHEN y > py THEN 1 ELSE -1 END AS sg
         |       FROM (SELECT event_type, x, y,
         |                    lag(y) OVER (PARTITION BY event_type ORDER BY x) AS py
         |             FROM daily)
         |       WHERE py IS NOT NULL AND y <> py),
         |rn AS (SELECT event_type, sg,
         |              CASE WHEN ps IS NULL OR ps <> sg THEN 1 ELSE 0 END AS is_new
         |       FROM (SELECT event_type, sg,
         |                    lag(sg) OVER (PARTITION BY event_type ORDER BY x) AS ps
         |             FROM sg)),
         |t AS (SELECT event_type,
         |             CAST(sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
         |             CAST(sum(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
         |             CAST(sum(is_new) AS BIGINT) AS n_runs
         |      FROM rn GROUP BY 1)
         |SELECT event_type, n_up, n_down, n_runs,
         |       CASE WHEN n_up > 0 AND n_down > 0 THEN
         |         ${Q.sqlR6("(n_runs - (2.0 * n_up * n_down / (n_up + n_down) + 1)) / " +
                   "sqrt(2.0 * n_up * n_down * (2.0 * n_up * n_down - (n_up + n_down)) / " +
                   "(CAST(n_up + n_down AS DOUBLE) * (n_up + n_down) * (n_up + n_down - 1)))")}
         |       END AS z
         |FROM t
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val wx = Window.partitionBy("event_type").orderBy("x")
      val sg = Inference.dailyCounts(s, d)
        .withColumn("py", lag("y", 1).over(wx))
        .filter(col("py").isNotNull && col("y") =!= col("py"))
        .withColumn("sg", when(col("y") > col("py"), 1).otherwise(-1))
      val t = sg
        .withColumn("ps", lag("sg", 1).over(wx))
        .groupBy("event_type")
        .agg(
          sum(when(col("sg") === 1, 1L).otherwise(0L)).as("n_up"),
          sum(when(col("sg") === -1, 1L).otherwise(0L)).as("n_down"),
          sum(when(col("ps").isNull || col("ps") =!= col("sg"), 1L).otherwise(0L)).as("n_runs"))
      val nu = col("n_up"); val nd = col("n_down"); val n = nu + nd
      t.select(col("event_type"), nu, nd, col("n_runs"),
          when(nu > 0 && nd > 0,
            Q.r6((col("n_runs") - (lit(2.0) * nu * nd / n + 1)) /
              sqrt(lit(2.0) * nu * nd * (lit(2.0) * nu * nd - n) /
                (n.cast("double") * n * (n - 1))))).as("z"))
        .orderBy("event_type")
    },

    // Turning-point test per type: interior days that are a strict
    // local max or min of the daily volume, against the i.i.d.
    // expectation E[T] = 2(n−2)/3, Var[T] = (16n−29)/90 — the
    // oscillation-rate complement of the runs test (runs sees signs,
    // turning points see the shape). Neighbors are the ADJACENT
    // OBSERVED days (lag/lead on the day-ordered frame); ties break
    // toward "not a turning point" (strict inequalities), identically
    // in both engines on exact ints.
    Q("q_turning_points",
      s"""WITH daily AS (${Inference.dailySql}),
         |w AS (SELECT event_type, y,
         |             lag(y)  OVER (PARTITION BY event_type ORDER BY x) AS py,
         |             lead(y) OVER (PARTITION BY event_type ORDER BY x) AS ny
         |      FROM daily),
         |t AS (SELECT event_type,
         |             CAST(count(*) AS BIGINT) AS n_days,
         |             CAST(sum(CASE WHEN py IS NOT NULL AND ny IS NOT NULL AND
         |                               ((y > py AND y > ny) OR (y < py AND y < ny))
         |                          THEN 1 ELSE 0 END) AS BIGINT) AS n_turning
         |      FROM w GROUP BY 1)
         |SELECT event_type, n_days, n_turning,
         |       ${Q.sqlR6("2.0 * (n_days - 2) / 3")} AS expected,
         |       CASE WHEN n_days >= 3 THEN
         |         ${Q.sqlR6("(n_turning - 2.0 * (n_days - 2) / 3) / " +
                   "sqrt((16.0 * n_days - 29) / 90)")}
         |       END AS z
         |FROM t
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val wx = Window.partitionBy("event_type").orderBy("x")
      val t = Inference.dailyCounts(s, d)
        .withColumn("py", lag("y", 1).over(wx))
        .withColumn("ny", lead("y", 1).over(wx))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("py").isNotNull && col("ny").isNotNull &&
            ((col("y") > col("py") && col("y") > col("ny")) ||
              (col("y") < col("py") && col("y") < col("ny"))), 1L)
            .otherwise(0L)).as("n_turning"))
      t.select(col("event_type"), col("n_days"), col("n_turning"),
          Q.r6(lit(2.0) * (col("n_days") - 2) / 3).as("expected"),
          when(col("n_days") >= 3,
            Q.r6((col("n_turning") - lit(2.0) * (col("n_days") - 2) / 3) /
              sqrt((lit(16.0) * col("n_days") - 29) / 90))).as("z"))
        .orderBy("event_type")
    },

    // Poisson dispersion index per type: D = sample-variance / mean of
    // the daily counts — D ≈ 1 is Poisson arrivals, D ≫ 1 is bursty
    // overdispersion (the number that says whether q_burstiness's
    // inter-arrival view and a Poisson SLA model are even applicable).
    // (n−1)·D is the classical chi-square dispersion statistic.
    // Everything from (n, Σy, Σy²) exact int64 through one shared
    // tree; NULL when the mean is 0 or n < 2.
    Q("q_poisson_dispersion",
      s"""WITH daily AS (${Inference.dailySql}),
         |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS ss
         |      FROM daily GROUP BY 1)
         |SELECT event_type, n AS n_days,
         |       ${Q.sqlR6("CAST(s AS DOUBLE) / n")} AS mean,
         |       CASE WHEN s > 0 AND n >= 2 THEN
         |         ${Q.sqlR6("(n * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s) / " +
                   "(CAST(s AS DOUBLE) * (n - 1))")}
         |       END AS dispersion,
         |       CASE WHEN s > 0 AND n >= 2 THEN
         |         ${Q.sqlR6("(n * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s) / CAST(s AS DOUBLE)")}
         |       END AS chi2
         |FROM t
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val t = Inference.dailyCounts(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("y").as("s"),
          sum(col("y") * col("y")).as("ss"))
      val disp = (col("n") * col("ss").cast("double") - col("s").cast("double") * col("s")) /
        (col("s").cast("double") * (col("n") - 1))
      t.select(col("event_type"), col("n").as("n_days"),
          Q.r6(col("s").cast("double") / col("n")).as("mean"),
          when(col("s") > 0 && col("n") >= 2, Q.r6(disp)).as("dispersion"),
          when(col("s") > 0 && col("n") >= 2,
            Q.r6((col("n") * col("ss").cast("double") - col("s").cast("double") * col("s")) /
              col("s").cast("double"))).as("chi2"))
        .orderBy("event_type")
    },

    // Grubbs' outlier statistic per type: G = max|y − ȳ| / s over the
    // daily counts, with the offending day reported — the single-most-
    // anomalous-day screen that runs before q_anomaly's rolling z
    // machinery (Grubbs asks "is even the WORST day explicable?").
    // max|y − ȳ| is located on exact integers (|n·y − Σy| — no float
    // can move the argmax; ties → earliest day) and G is one division
    // at the end; NULL when the series is constant.
    Q("q_grubbs",
      s"""WITH daily AS (${Inference.dailySql}),
         |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS ss
         |      FROM daily GROUP BY 1),
         |dev AS (SELECT d.event_type, d.x, d.y, abs(t.n * d.y - t.s) AS a,
         |               row_number() OVER (PARTITION BY d.event_type
         |                                  ORDER BY abs(t.n * d.y - t.s) DESC, d.x) AS rk
         |        FROM daily d JOIN t ON d.event_type = t.event_type)
         |SELECT dev.event_type, t.n AS n_days, dev.x AS outlier_day,
         |       dev.y AS outlier_count,
         |       CASE WHEN t.n >= 2 AND t.n * t.ss > t.s * t.s THEN
         |         ${Q.sqlR6("CAST(a AS DOUBLE) / (n * sqrt((n * CAST(ss AS DOUBLE) - " +
                   "CAST(s AS DOUBLE) * s) / (CAST(n AS DOUBLE) * (n - 1))))")}
         |       END AS g
         |FROM dev JOIN t ON dev.event_type = t.event_type
         |WHERE dev.rk = 1
         |ORDER BY dev.event_type""".stripMargin) { (s, d) =>
      val daily = Inference.dailyCounts(s, d)
      val t = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("y").as("s"), sum(col("y") * col("y")).as("ss"))
      val dev = daily.join(t, "event_type")
        .withColumn("a", abs(col("n") * col("y") - col("s")))
        .withColumn("rk", row_number().over(
          Window.partitionBy("event_type").orderBy(col("a").desc, col("x"))))
        .filter(col("rk") === 1)
      dev.select(col("event_type"), col("n").as("n_days"),
          col("x").as("outlier_day"), col("y").as("outlier_count"),
          when(col("n") >= 2 && col("n") * col("ss") > col("s") * col("s"),
            Q.r6(col("a").cast("double") / (col("n") *
              sqrt((col("n") * col("ss").cast("double") - col("s").cast("double") * col("s")) /
                (col("n").cast("double") * (col("n") - 1)))))).as("g"))
        .orderBy("event_type")
    },

    // Page–Hinkley drift statistic per type: the classical sequential
    // change detector over the daily volume — m_t = Σ_{i≤t} (y_i − ȳ_i)
    // with ȳ_i the RUNNING mean, PH = max_t (m_t − min_{s≤t} m_s), the
    // day achieving it reported (ties → earliest). The streaming-drift
    // sibling of q_changepoint's retrospective scan (PH is what a
    // monitor evaluates incrementally; the batch twin replays it
    // exactly). Each per-day deviation is integer-scaled to 1e-6
    // BEFORE the cumulative sum, so the sequential accumulation —
    // the one order-DEPENDENT reduction in this file — is exact int64
    // in both engines (OverflowHeadroomSpec carries the site).
    Q("q_page_hinkley",
      s"""WITH daily AS (${Inference.dailySql}),
         |c AS (SELECT event_type, x, y,
         |             CAST(count(*) OVER w AS BIGINT) AS cn,
         |             CAST(sum(y) OVER w AS BIGINT) AS cs
         |      FROM daily
         |      WINDOW w AS (PARTITION BY event_type ORDER BY x
         |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |t AS (SELECT event_type, x,
         |             CAST(floor((y - CAST(cs AS DOUBLE) / cn) * 1e6 + 0.5) AS BIGINT) AS t6
         |      FROM c),
         |m AS (SELECT event_type, x,
         |             CAST(sum(t6) OVER w AS BIGINT) AS m6
         |      FROM t
         |      WINDOW w AS (PARTITION BY event_type ORDER BY x
         |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |p0 AS (SELECT event_type, x,
         |              m6 - CAST(min(m6) OVER w AS BIGINT) AS ph6
         |       FROM m
         |       WINDOW w AS (PARTITION BY event_type ORDER BY x
         |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |p AS (SELECT event_type, x, ph6,
         |             row_number() OVER (PARTITION BY event_type
         |                                ORDER BY ph6 DESC, x) AS rk,
         |             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days
         |      FROM p0)
         |SELECT event_type, n_days, x AS drift_day,
         |       ${Q.sqlR6("ph6 / 1e6")} AS ph
         |FROM p WHERE rk = 1
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val wx = Window.partitionBy("event_type").orderBy("x")
      val run = wx.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val m = Inference.dailyCounts(s, d)
        .withColumn("cn", count(lit(1)).over(run))
        .withColumn("cs", sum("y").over(run))
        .withColumn("t6",
          floor((col("y") - col("cs").cast("double") / col("cn")) * lit(1e6) + 0.5)
            .cast("long"))
        .withColumn("m6", sum("t6").over(run))
      m.withColumn("ph6", col("m6") - min("m6").over(run))
        .withColumn("rk", row_number().over(wx.orderBy(col("ph6").desc, col("x"))))
        .withColumn("n_days", count(lit(1)).over(Window.partitionBy("event_type")))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("n_days"), col("x").as("drift_day"),
          Q.r6(col("ph6") / lit(1e6)).as("ph"))
        .orderBy("event_type")
    },

    // Augmented Dickey–Fuller unit-root screen (lag 0, intercept) per
    // type: Δy_t regressed on y_{t−1} — γ near 0 with an insignificant
    // t means the series is a random walk and every level-based
    // statistic downstream (means, trends, drawdowns) is spurious; a
    // strongly negative t certifies mean reversion. The stationarity
    // gate in the same battery as the runs/turning-point independence
    // screens. With A = n·Σxz − Σx·Σz, B = n·Σx² − (Σx)², C = n·Σz² −
    // (Σz)² over exact int64 sufficient statistics (x = y_{t−1},
    // z = Δy_t), γ = A/B and t = A·√(n−2)/√(B·C − A²) — the entire
    // regression collapses to one shared scalar tree; B·C and A² move
    // to DOUBLE only for the final products (the q_ar1 r² precedent).
    Q("q_adf",
      s"""WITH daily AS (${Inference.dailySql}),
         |lg AS (SELECT event_type, y - yp AS z, yp AS x
         |       FROM (SELECT event_type, y,
         |                    lag(y) OVER (PARTITION BY event_type ORDER BY x) AS yp
         |             FROM daily)
         |       WHERE yp IS NOT NULL),
         |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(z) AS BIGINT) AS sz,
         |             CAST(sum(x * x) AS BIGINT) AS sxx,
         |             CAST(sum(z * z) AS BIGINT) AS szz,
         |             CAST(sum(x * z) AS BIGINT) AS sxz
         |      FROM lg GROUP BY 1),
         |ab AS (SELECT event_type, n,
         |              n * sxz - sx * sz AS a, n * sxx - sx * sx AS b,
         |              n * szz - sz * sz AS c
         |       FROM t)
         |SELECT event_type, n,
         |       CASE WHEN b > 0 THEN ${Q.sqlR6("CAST(a AS DOUBLE) / b")} END AS gamma,
         |       CASE WHEN n >= 3 AND b > 0
         |             AND CAST(b AS DOUBLE) * c - CAST(a AS DOUBLE) * a > 0 THEN
         |         ${Q.sqlR6("CAST(a AS DOUBLE) * sqrt(CAST(n - 2 AS DOUBLE)) / " +
                   "sqrt(CAST(b AS DOUBLE) * c - CAST(a AS DOUBLE) * a)")}
         |       END AS t_stat
         |FROM ab
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val lg = Inference.dailyCounts(s, d)
        .withColumn("yp", lag("y", 1).over(
          Window.partitionBy("event_type").orderBy("x")))
        .filter(col("yp").isNotNull)
        .select(col("event_type"), (col("y") - col("yp")).as("z"), col("yp").as("x"))
      val t = lg.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("z").as("sz"),
          sum(col("x") * col("x")).as("sxx"), sum(col("z") * col("z")).as("szz"),
          sum(col("x") * col("z")).as("sxz"))
        .select(col("event_type"), col("n"),
          (col("n") * col("sxz") - col("sx") * col("sz")).as("a"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("b"),
          (col("n") * col("szz") - col("sz") * col("sz")).as("c"))
      val disc = col("b").cast("double") * col("c") - col("a").cast("double") * col("a")
      t.select(col("event_type"), col("n"),
          when(col("b") > 0, Q.r6(col("a").cast("double") / col("b"))).as("gamma"),
          when(col("n") >= 3 && col("b") > 0 && disc > 0,
            Q.r6(col("a").cast("double") * sqrt((col("n") - 2).cast("double")) /
              sqrt(disc))).as("t_stat"))
        .orderBy("event_type")
    },

    // Lo–MacKinlay variance ratio VR(2) per type: the variance of
    // 2-day changes against twice the variance of 1-day changes over
    // the SAME daily series — a random walk reads 1, mean reversion
    // <1, momentum >1; the scale-consistency complement to q_adf's
    // regression form (ADF asks "does the level pull back", VR asks
    // "does variance accumulate linearly"). Overlapping 2-day diffs
    // (the standard estimator) keep both legs on one lag window pair;
    // all sufficient statistics are exact int64, and z uses the
    // homoskedastic asymptotic σ² = 1/n for q = 2.
    Q("q_variance_ratio",
      s"""WITH daily AS (${Inference.dailySql}),
         |lg AS (SELECT event_type,
         |              y - lag(y, 1) OVER (PARTITION BY event_type ORDER BY x) AS d1,
         |              y - lag(y, 2) OVER (PARTITION BY event_type ORDER BY x) AS d2
         |       FROM daily),
         |t AS (SELECT event_type,
         |             CAST(count(d1) AS BIGINT) AS n1,
         |             CAST(sum(d1) AS BIGINT) AS s1,
         |             CAST(sum(d1 * d1) AS BIGINT) AS ss1,
         |             CAST(count(d2) AS BIGINT) AS n2,
         |             CAST(sum(d2) AS BIGINT) AS s2,
         |             CAST(sum(d2 * d2) AS BIGINT) AS ss2
         |      FROM lg GROUP BY 1)
         |SELECT event_type, n1 AS n_diffs,
         |       CASE WHEN n2 >= 2 AND n1 * ss1 - s1 * s1 > 0 THEN
         |         ${Q.sqlR6("(CAST(n2 * ss2 - s2 * s2 AS DOUBLE) / (n2 * (n2 - 1))) / " +
                   "(2 * CAST(n1 * ss1 - s1 * s1 AS DOUBLE) / (n1 * (n1 - 1)))")}
         |       END AS vr,
         |       CASE WHEN n2 >= 2 AND n1 * ss1 - s1 * s1 > 0 THEN
         |         ${Q.sqlR6("((CAST(n2 * ss2 - s2 * s2 AS DOUBLE) / (n2 * (n2 - 1))) / " +
                   "(2 * CAST(n1 * ss1 - s1 * s1 AS DOUBLE) / (n1 * (n1 - 1))) - 1) * " +
                   "sqrt(CAST(n1 AS DOUBLE))")}
         |       END AS z
         |FROM t
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val wx = Window.partitionBy("event_type").orderBy("x")
      val lg = Inference.dailyCounts(s, d)
        .withColumn("d1", col("y") - lag("y", 1).over(wx))
        .withColumn("d2", col("y") - lag("y", 2).over(wx))
      val t = lg.groupBy("event_type")
        .agg(count(col("d1")).as("n1"), sum("d1").as("s1"),
          sum(col("d1") * col("d1")).as("ss1"),
          count(col("d2")).as("n2"), sum("d2").as("s2"),
          sum(col("d2") * col("d2")).as("ss2"))
      val var1 = (col("n1") * col("ss1") - col("s1") * col("s1")).cast("double") /
        (col("n1") * (col("n1") - 1))
      val var2 = (col("n2") * col("ss2") - col("s2") * col("s2")).cast("double") /
        (col("n2") * (col("n2") - 1))
      val vr = var2 / (lit(2) * var1)
      val ok = col("n2") >= 2 && col("n1") * col("ss1") - col("s1") * col("s1") > 0
      t.select(col("event_type"), col("n1").as("n_diffs"),
          when(ok, Q.r6(vr)).as("vr"),
          when(ok, Q.r6((vr - 1) * sqrt(col("n1").cast("double")))).as("z"))
        .orderBy("event_type")
    },

    // Rolling 7-day Pearson correlation per type PAIR over the shared
    // daily frame: the decoupling detector — two volumes that track
    // each other all quarter except one week is a signal the
    // full-series correlation (q_corr_matrix's day-grid cousin)
    // averages away. Reports, per unordered pair, the full-series
    // correlation plus the weakest 7-day window and its day. The pair
    // join runs on the COLLAPSED daily frame (|types|²·days rows —
    // types is a small enum), windows are 7-row int64 sums, and the
    // weakest window is located on the 1e6-lattice correlation with
    // the day tie-break, so the argmin is ulp-proof.
    Q("q_rolling_corr",
      s"""WITH daily AS (${Inference.dailySql}),
         |j AS (SELECT a.event_type AS ta, b.event_type AS tb, a.x,
         |             a.y AS ya, b.y AS yb
         |      FROM daily a JOIN daily b ON a.x = b.x AND a.event_type < b.event_type),
         |w AS (SELECT ta, tb, x, ya, yb,
         |             CAST(count(*) OVER r7 AS BIGINT) AS n7,
         |             CAST(sum(ya) OVER r7 AS BIGINT) AS sx,
         |             CAST(sum(yb) OVER r7 AS BIGINT) AS sy,
         |             CAST(sum(ya * ya) OVER r7 AS BIGINT) AS sxx,
         |             CAST(sum(yb * yb) OVER r7 AS BIGINT) AS syy,
         |             CAST(sum(ya * yb) OVER r7 AS BIGINT) AS sxy
         |      FROM j
         |      WINDOW r7 AS (PARTITION BY ta, tb ORDER BY x
         |                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
         |c AS (SELECT ta, tb, x,
         |             CAST(floor((CAST(n7 * sxy - sx * sy AS DOUBLE) /
         |                    (sqrt(CAST(n7 * sxx - sx * sx AS DOUBLE)) *
         |                     sqrt(CAST(n7 * syy - sy * sy AS DOUBLE)))) * 1e6 + 0.5)
         |               AS BIGINT) AS c6
         |      FROM w
         |      WHERE n7 = 7 AND n7 * sxx - sx * sx > 0 AND n7 * syy - sy * sy > 0),
         |mn AS (SELECT ta, tb, x, c6,
         |              row_number() OVER (PARTITION BY ta, tb ORDER BY c6, x) AS rk
         |       FROM c),
         |f AS (SELECT ta, tb, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(ya) AS BIGINT) AS sx, CAST(sum(yb) AS BIGINT) AS sy,
         |             CAST(sum(ya * ya) AS BIGINT) AS sxx,
         |             CAST(sum(yb * yb) AS BIGINT) AS syy,
         |             CAST(sum(ya * yb) AS BIGINT) AS sxy
         |      FROM j GROUP BY 1, 2)
         |SELECT f.ta AS type_a, f.tb AS type_b, f.n AS n_days,
         |       CASE WHEN f.n * f.sxx - f.sx * f.sx > 0
         |             AND f.n * f.syy - f.sy * f.sy > 0 THEN
         |         ${Q.sqlR6("CAST(f.n * f.sxy - f.sx * f.sy AS DOUBLE) / " +
                   "(sqrt(CAST(f.n * f.sxx - f.sx * f.sx AS DOUBLE)) * " +
                   "sqrt(CAST(f.n * f.syy - f.sy * f.sy AS DOUBLE)))")}
         |       END AS corr_full,
         |       mn.c6 / 1e6 AS min_corr7, mn.x AS min_corr_day
         |FROM f LEFT JOIN mn ON f.ta = mn.ta AND f.tb = mn.tb AND mn.rk = 1
         |ORDER BY type_a, type_b""".stripMargin) { (s, d) =>
      val daily = Inference.dailyCounts(s, d)
      val a = daily.select(col("event_type").as("ta"), col("x"), col("y").as("ya"))
      val b = daily.select(col("event_type").as("tb"), col("x"), col("y").as("yb"))
      val j = a.join(b, Seq("x")).filter(col("ta") < col("tb")).transform(Q.snapshot)
      val r7 = Window.partitionBy("ta", "tb").orderBy("x").rowsBetween(-6, 0)
      val w = j
        .withColumn("n7", count(lit(1)).over(r7))
        .withColumn("sx", sum("ya").over(r7)).withColumn("sy", sum("yb").over(r7))
        .withColumn("sxx", sum(col("ya") * col("ya")).over(r7))
        .withColumn("syy", sum(col("yb") * col("yb")).over(r7))
        .withColumn("sxy", sum(col("ya") * col("yb")).over(r7))
      val vxx = col("n7") * col("sxx") - col("sx") * col("sx")
      val vyy = col("n7") * col("syy") - col("sy") * col("sy")
      val mn = w.filter(col("n7") === 7 && vxx > 0 && vyy > 0)
        .withColumn("c6",
          floor((col("n7") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt(vxx.cast("double")) * sqrt(vyy.cast("double"))) * lit(1e6) + 0.5)
            .cast("long"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("ta", "tb").orderBy(col("c6"), col("x"))))
        .filter(col("rk") === 1)
        .select(col("ta"), col("tb"), col("c6"), col("x").as("min_corr_day"))
      val f = j.groupBy("ta", "tb")
        .agg(count(lit(1)).as("n"), sum("ya").as("sx"), sum("yb").as("sy"),
          sum(col("ya") * col("ya")).as("sxx"), sum(col("yb") * col("yb")).as("syy"),
          sum(col("ya") * col("yb")).as("sxy"))
      val fxx = col("n") * col("sxx") - col("sx") * col("sx")
      val fyy = col("n") * col("syy") - col("sy") * col("sy")
      f.join(mn, Seq("ta", "tb"), "left")
        .select(col("ta").as("type_a"), col("tb").as("type_b"), col("n").as("n_days"),
          when(fxx > 0 && fyy > 0,
            Q.r6((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt(fxx.cast("double")) * sqrt(fyy.cast("double"))))).as("corr_full"),
          (col("c6") / lit(1e6)).as("min_corr7"), col("min_corr_day"))
        .orderBy("type_a", "type_b")
    },

    // Cook's distance influence screen on the daily trend fit per
    // type: which single day most moves the fitted OLS line —
    // D_i = e_i²·h_i / (p·s²·(1−h_i)²) with leverage h_i = 1/n +
    // (x_i − x̄)²/Sxx, p = 2 — the "is the trend one weird day"
    // companion to q_grubbs' level outlier and q_trend_fit's slope.
    // Every per-day quantity derives from the SAME exact int64
    // sufficient statistics through one mirrored tree, so the doubles
    // are bit-identical cross-engine and the argmax ranks on (D desc,
    // day) without a lattice — D is unbounded (h → 1 explodes it), so
    // flooring it onto an int lattice is exactly what must NOT happen
    // here; determinism comes from the shared tree instead.
    Q("q_cooks_distance",
      s"""WITH daily AS (${Inference.dailySql}),
         |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |             CAST(sum(x * x) AS BIGINT) AS sxx,
         |             CAST(sum(x * y) AS BIGINT) AS sxy,
         |             CAST(sum(y * y) AS BIGINT) AS syy
         |      FROM daily GROUP BY 1),
         |z AS (SELECT d.event_type, d.x, d.y, t.n,
         |             CAST(t.n * t.sxx - t.sx * t.sx AS DOUBLE) AS bxx,
         |             CAST(t.n * t.sxy - t.sx * t.sy AS DOUBLE) AS bxy,
         |             CAST(t.n * t.syy - t.sy * t.sy AS DOUBLE) AS byy,
         |             CAST(t.n * d.x - t.sx AS DOUBLE) AS dx,
         |             CAST(t.n * d.y - t.sy AS DOUBLE) AS dy
         |      FROM daily d JOIN t ON d.event_type = t.event_type),
         |e AS (SELECT event_type, x, y, n,
         |             (dy - (bxy / bxx) * dx) / n AS res,
         |             1.0 / n + (dx / n) * (dx / n) / (bxx / n) AS h,
         |             (byy - (bxy / bxx) * bxy) / (n * (n - 2)) AS s2
         |      FROM z WHERE n >= 4 AND bxx > 0),
         |dd AS (SELECT event_type, x, y, res, h,
         |              CASE WHEN s2 > 0 AND h < 1 THEN
         |                res * res * h / (2 * s2 * (1 - h) * (1 - h))
         |              END AS d,
         |              row_number() OVER (PARTITION BY event_type ORDER BY
         |                CASE WHEN s2 > 0 AND h < 1 THEN
         |                  res * res * h / (2 * s2 * (1 - h) * (1 - h))
         |                END DESC NULLS LAST, x) AS rk
         |       FROM e)
         |SELECT event_type, x AS influential_day, y AS day_count,
         |       ${Q.sqlR6("d")} AS cooks_d, ${Q.sqlR6("h")} AS leverage,
         |       ${Q.sqlR6("res")} AS residual
         |FROM dd WHERE rk = 1
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val daily = Inference.dailyCounts(s, d).transform(Q.snapshot)
      val t = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"))
      val z = daily.join(t, "event_type")
        .select(col("event_type"), col("x"), col("y"), col("n"),
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double").as("bxx"),
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double").as("bxy"),
          (col("n") * col("syy") - col("sy") * col("sy")).cast("double").as("byy"),
          (col("n") * col("x") - col("sx")).cast("double").as("dx"),
          (col("n") * col("y") - col("sy")).cast("double").as("dy"))
      val e = z.filter(col("n") >= 4 && col("bxx") > 0)
        .select(col("event_type"), col("x"), col("y"), col("n"),
          ((col("dy") - (col("bxy") / col("bxx")) * col("dx")) / col("n")).as("res"),
          (lit(1.0) / col("n") +
            (col("dx") / col("n")) * (col("dx") / col("n")) / (col("bxx") / col("n")))
            .as("h"),
          ((col("byy") - (col("bxy") / col("bxx")) * col("bxy")) /
            (col("n") * (col("n") - 2))).as("s2"))
      val dExpr = when(col("s2") > 0 && col("h") < 1,
        col("res") * col("res") * col("h") /
          (lit(2) * col("s2") * (lit(1) - col("h")) * (lit(1) - col("h"))))
      e.withColumn("d", dExpr)
        .withColumn("rk", row_number().over(
          Window.partitionBy("event_type").orderBy(col("d").desc_nulls_last, col("x"))))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("x").as("influential_day"),
          col("y").as("day_count"), Q.r6(col("d")).as("cooks_d"),
          Q.r6(col("h")).as("leverage"), Q.r6(col("res")).as("residual"))
        .orderBy("event_type")
    }
  )
}
