package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.Column
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

  /** The Tukey HSD pair fold over a per-type (event_type, n, s, ss)
    * stats frame — ONE home shared by batch q_tukey_hsd and the
    * s_tukey_hsd streaming read-time view (streaming.Streams.tukeyStats
    * maintains the stats grid incrementally; the studentized-range
    * statistic never lives in state because it isn't mergeable —
    * (n, Σv, Σv²) are). Each group's s²/n hits the 1e6 lattice BEFORE
    * the cross-group sum (the q_anova b6 move), so MSW's reduction is
    * order-free int64; the pair fan-out is a |types|² broadcast nested
    * loop over the collapsed frame. */
  private[graft] def tukeyOf(stats: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val g = Q.snapshot(stats)
    val t = g.agg(count(lit(1)).as("k"), sum("n").as("nn"), sum("ss").as("sstot"),
      sum(floor((col("s") * col("s")).cast("double") / col("n") * lit(1e6) + 0.5)
        .cast("long")).as("b6"))
    val a = g.select(col("event_type").as("type_a"), col("n").as("na"), col("s").as("sa"))
    val b = g.select(col("event_type").as("type_b"), col("n").as("nb"), col("s").as("sb"))
    val meanA = col("sa").cast("double") / col("na")
    val meanB = col("sb").cast("double") / col("nb")
    val ssw = col("sstot") - col("b6") / lit(1e6)
    a.join(broadcast(b), col("type_a") < col("type_b"))
      .crossJoin(broadcast(t))
      .select(col("type_a"), col("type_b"),
        Q.r6(meanA).as("mean_a"), Q.r6(meanB).as("mean_b"),
        when(col("nn") > col("k") && ssw > 0,
          Q.r6(abs(meanA - meanB) /
            sqrt(ssw / (col("nn") - col("k")) / lit(2) *
              (lit(1.0) / col("na") + lit(1.0) / col("nb"))))).as("q_stat"))
      .orderBy("type_a", "type_b")
  }

  /** The Mood's-median fold over a daily (event_type, x, y) count
    * frame — ONE home shared by batch q_moods_median and the
    * s_moods_median streaming read-time view
    * (streaming.Streams.dailyGrid maintains the frame incrementally;
    * the grand median is NOT mergeable — the daily cells are). The
    * grand median picks explicit middle elements of one sorted-array
    * aggregate over the domain-bounded frame; each type's a²/n_g hits
    * the 1e6 lattice before the cross-type sum (q_anova b6 move). */
  private[graft] def moodsMedianOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val daily = Q.snapshot(dailyIn)
    val ys = array_sort(collect_list("y"))
    val md = daily.agg(ys.as("ys"))
      .select(((element_at(col("ys"), floor((size(col("ys")) + 1) / 2.0).cast("int")) +
        element_at(col("ys"), floor((size(col("ys")) + 2) / 2.0).cast("int")))
        .cast("double") / 2).as("m"))
    val g = daily.crossJoin(broadcast(md))
      .groupBy("event_type")
      .agg(count(lit(1)).as("ng"), first("m").as("m"),
        sum(when(col("y") > col("m"), 1L).otherwise(0L)).as("a"))
    val t = g.agg(count(lit(1)).as("k"), sum("ng").as("n"), sum("a").as("aa"),
      sum(floor((col("a") * col("a")).cast("double") / col("ng") * lit(1e6) + 0.5)
        .cast("long")).as("b6"), first("m").as("grand_median"))
    t.select(col("k").as("n_types"), col("n").as("n_days"), col("grand_median"),
      when(col("aa") > 0 && col("aa") < col("n"),
        Q.r6((col("n").cast("double") * col("n") / (col("aa") * (col("n") - col("aa")))) *
          (col("b6") / lit(1e6) - col("aa").cast("double") * col("aa") / col("n"))))
        .as("chi2"))
  }

  /** The Friedman fold over a daily (event_type, x, y) count frame —
    * ONE home shared by batch q_friedman and the s_friedman streaming
    * read-time view. Within-day ranks are NOT mergeable (a new cell
    * shifts its whole day's ranking) — the daily frame is — so the
    * dense (type × day) grid, the 2·avgrank ints, and the tie cubes
    * are all rebuilt here at read time from the frame. */
  /** The dense (type × day) block grid under the Friedman family —
    * zero-fill cells for days a type logged nothing (what makes the
    * block design complete), shared by [[friedmanOf]] and
    * [[nemenyiOf]]. Returns the snapshotted grid and the distinct-day
    * frame. */
  private def denseGrid(dailyIn: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val daily = Q.snapshot(dailyIn)
    val ty = daily.select("event_type").distinct()
    val dy = daily.select("x").distinct().transform(Q.snapshot)
    val grid = ty.crossJoin(broadcast(dy))
      .join(daily, Seq("event_type", "x"), "left")
      .select(col("event_type"), col("x"), coalesce(col("y"), lit(0L)).as("y"))
      .transform(Q.snapshot)
    (grid, dy)
  }

  /** The within-day 2·avgrank expression over a [[denseGrid]] —
    * 2·rank() + tiecount − 1 keeps every rank sum exact int64. */
  private def r2Col: Column =
    (lit(2) * rank().over(Window.partitionBy("x").orderBy("y")) +
      count(lit(1)).over(Window.partitionBy("x", "y")) - 1).cast("long")

  /** Block-design doubled-rank sufficient statistics over a daily
    * (event_type, x, y) frame — (n, k, sr2 = Σ(2R_j)², tie = Σ(t³−t))
    * crossed into ONE single-row frame; the shared home under
    * [[friedmanOf]] and [[kendallWOf]] so the omnibus test and its
    * effect size can never disagree on the rank machinery. */
  private def blockRankStats(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, dy) = denseGrid(dailyIn)
    val km = grid.withColumn("r2", r2Col)
      .groupBy("event_type").agg(sum("r2").as("r2j"))
      .agg(count(lit(1)).as("k"), sum(col("r2j") * col("r2j")).as("sr2"))
    val tt = grid.groupBy("x", "y").agg(count(lit(1)).as("t"))
      .agg(sum(col("t") * col("t") * col("t") - col("t")).as("tie"))
    val nn = dy.agg(count(lit(1)).as("n"))
    nn.crossJoin(broadcast(km)).crossJoin(broadcast(tt))
  }

  private[graft] def friedmanOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val qRaw = lit(3.0) * col("sr2") / (col("n") * col("k") * (col("k") + 1)) -
      lit(3.0) * col("n") * (col("k") + 1)
    val corr = lit(1) - col("tie").cast("double") /
      (col("n") * col("k") * (col("k") * col("k") - 1))
    blockRankStats(dailyIn)
      .select(col("n").as("n_days"), col("k").as("n_types"),
        when(col("k") >= 2, Q.r6(qRaw)).as("q"),
        when(col("k") >= 2 &&
          col("n") * col("k") * (col("k") * col("k") - 1) > col("tie"),
          Q.r6(qRaw / corr)).as("q_tie_corrected"))
  }

  /** The Kendall's-W fold over a daily (event_type, x, y) count frame
    * — ONE home shared by batch q_kendall_w and the s_kendall_w
    * streaming read-time view (the dailyGrid is the mergeable state;
    * every new day re-ranks its own block only, but W re-prices
    * globally). Same denseGrid/r2Col machinery as [[friedmanOf]]. */
  private[graft] def kendallWOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val den = col("n").cast("double") * col("n") * col("k") *
      (col("k") * col("k") - 1) - col("n").cast("double") * col("tie")
    val num = lit(3.0) * col("sr2") -
      lit(3.0) * col("n") * col("n") * col("k") * (col("k") + 1) * (col("k") + 1)
    blockRankStats(dailyIn)
      .select(col("n").as("n_days"), col("k").as("n_types"),
        when(col("k") >= 2 && den > 0, Q.r6(num / den)).as("w"))
  }

  /** The Nemenyi post-hoc fold over a daily (event_type, x, y) count
    * frame — ONE home shared by batch q_nemenyi and the s_nemenyi
    * streaming read-time view (the third face of
    * streaming.Streams.dailyGrid). Mean ranks come from the SAME
    * dense-grid 2·avgrank machinery as [[friedmanOf]]; the pair
    * fan-out is the |types|² broadcast nested loop over the collapsed
    * rank-sum frame. */
  private[graft] def nemenyiOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, dy) = denseGrid(dailyIn)
    val rs = grid.withColumn("r2", r2Col)
      .groupBy("event_type").agg(sum("r2").as("r2j"))
      .transform(Q.snapshot)
    val kf = rs.agg(count(lit(1)).as("k"))
    val nn = dy.agg(count(lit(1)).as("n"))
    val a = rs.select(col("event_type").as("type_a"), col("r2j").as("r2a"))
    val b = rs.select(col("event_type").as("type_b"), col("r2j").as("r2b"))
    val meanA = col("r2a").cast("double") / (lit(2) * col("n"))
    val meanB = col("r2b").cast("double") / (lit(2) * col("n"))
    a.join(broadcast(b), col("type_a") < col("type_b"))
      .crossJoin(broadcast(nn)).crossJoin(broadcast(kf))
      .select(col("type_a"), col("type_b"),
        Q.r6(meanA).as("mean_rank_a"), Q.r6(meanB).as("mean_rank_b"),
        when(col("n") > 0 && col("k") >= 2,
          Q.r6(abs(meanA - meanB) /
            sqrt(col("k").cast("double") * (col("k") + lit(1)) /
              (lit(6.0) * col("n"))))).as("q_stat"))
      .orderBy("type_a", "type_b")
  }

  /** The Wilcoxon signed-rank fold over a daily (event_type, x, y)
    * count frame — ONE home shared by batch q_wilcoxon_signed and the
    * s_wilcoxon streaming read-time view (the fourth face of
    * streaming.Streams.dailyGrid). Pairs every type pair BY DAY over
    * the zero-filled dense grid (the Friedman block move — a day one
    * type skipped is a 0, not a dropped pair), drops zero differences
    * (standard treatment), ranks |d| with exact 2·avgrank ints, and
    * applies the tie-corrected normal approximation. */
  private[graft] def wilcoxonOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, _) = denseGrid(dailyIn)
    val a = grid.select(col("event_type").as("type_a"), col("x"), col("y").as("ya"))
    val b = grid.select(col("event_type").as("type_b"), col("x"), col("y").as("yb"))
    val nz = a.join(b, Seq("x")).filter(col("type_a") < col("type_b"))
      .withColumn("d", col("ya") - col("yb"))
      .filter(col("d") =!= 0)
      .withColumn("ad", abs(col("d")))
      .transform(Q.snapshot)
    val wp = Window.partitionBy("type_a", "type_b")
    val r2 = (lit(2) * rank().over(wp.orderBy("ad")) +
      count(lit(1)).over(Window.partitionBy("type_a", "type_b", "ad")) - 1).cast("long")
    val t = nz.withColumn("r2", r2)
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n"),
        sum(when(col("d") > 0, col("r2")).otherwise(0L)).as("w2"))
    val ties = nz.groupBy("type_a", "type_b", "ad").agg(count(lit(1)).as("t"))
      .groupBy("type_a", "type_b")
      .agg(sum(col("t") * col("t") * col("t") - col("t")).as("tie"))
    val n = col("n")
    val varW = n.cast("double") * (n + 1) * (lit(2) * n + 1) / 24.0 -
      col("tie").cast("double") / 48.0
    t.join(ties, Seq("type_a", "type_b"))
      .select(col("type_a"), col("type_b"), n.as("n_nonzero"),
        (col("w2").cast("double") / 2).as("w_plus"),
        when(n >= 1 && varW > 0,
          Q.r6((col("w2").cast("double") / 2 - n.cast("double") * (n + 1) / 4) /
            sqrt(varW))).as("z"))
      .orderBy("type_a", "type_b")
  }

  /** The paired-t fold over a daily (event_type, x, y) count frame —
    * ONE home shared by batch q_paired_t and the s_paired_t streaming
    * read-time view: the PARAMETRIC twin of [[wilcoxonOf]] on the
    * identical day-paired dense grid (zero diffs KEPT here — the t
    * test has no zero-drop convention). Σd and Σd² are exact int64;
    * the one formula tree divides at the end; NULL t on a zero-variance
    * pair (an exact constant offset), not 0/0. */
  private[graft] def pairedTOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, _) = denseGrid(dailyIn)
    val a = grid.select(col("event_type").as("type_a"), col("x"), col("y").as("ya"))
    val b = grid.select(col("event_type").as("type_b"), col("x"), col("y").as("yb"))
    val d = col("ya") - col("yb")
    val t = a.join(b, Seq("x")).filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n"), sum(d).as("sd"), sum(d * d).as("sdd"))
    val varNum = col("sdd").cast("double") - col("sd").cast("double") * col("sd") / col("n")
    t.select(col("type_a"), col("type_b"), col("n").as("n_days"),
        Q.r6(col("sd").cast("double") / col("n")).as("mean_diff"),
        when(col("n") >= 2 && varNum > 0,
          Q.r6((col("sd").cast("double") / col("n")) /
            sqrt(varNum / ((col("n") - 1) * col("n"))))).as("t_stat"))
      .orderBy("type_a", "type_b")
  }

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
    },

    // Mann–Kendall trend test per type: S = Σ_{i<j} sign(y_j − y_i)
    // over the daily counts with the tie-corrected normal z — the
    // nonparametric "is there ANY monotone trend" screen that holds
    // where q_trend_fit's OLS slope is distorted by outliers and
    // q_runs_test only sees sign flips. The pair frame is the
    // day-window-bounded C(|days|,2) per type (the q_theil_sen join,
    // never corpus-sized); S, the tie term Σt(t−1)(2t+5) and
    // Var·18 = n(n−1)(2n+5) − ties are all exact int64 (≤366 days ⇒
    // far inside headroom), and z applies the standard ±1 continuity
    // correction through one mirrored tree. NULL z on zero variance
    // (constant series).
    Q("q_mann_kendall",
      s"""WITH daily AS (${Inference.dailySql}),
         |p AS (SELECT a.event_type,
         |             CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sg
         |      FROM daily a JOIN daily b
         |        ON a.event_type = b.event_type AND a.x < b.x),
         |s AS (SELECT event_type, CAST(sum(sg) AS BIGINT) AS s FROM p GROUP BY 1),
         |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY 1),
         |tg AS (SELECT event_type,
         |              CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie
         |       FROM (SELECT event_type, y, CAST(count(*) AS BIGINT) AS t
         |             FROM daily GROUP BY 1, 2) GROUP BY 1)
         |SELECT n.event_type, n.n AS n_days, s.s AS s,
         |       CASE WHEN n.n * (n.n - 1) * (2 * n.n + 5) - tg.tie > 0 THEN
         |         ${Q.sqlR6("(s.s - CASE WHEN s.s > 0 THEN 1 WHEN s.s < 0 THEN -1 ELSE 0 END) / " +
                   "sqrt((n.n * (n.n - 1) * (2 * n.n + 5) - tg.tie) / 18.0)")}
         |       END AS z
         |FROM n JOIN s ON n.event_type = s.event_type
         |       JOIN tg ON n.event_type = tg.event_type
         |ORDER BY n.event_type""".stripMargin) { (s, d) =>
      val daily = Inference.dailyCounts(s, d).transform(Q.snapshot)
      val a = daily.select(col("event_type"), col("x").as("xa"), col("y").as("ya"))
      val b = daily.select(col("event_type"), col("x").as("xb"), col("y").as("yb"))
      val sdf = a.join(b, Seq("event_type")).filter(col("xa") < col("xb"))
        .groupBy("event_type")
        .agg(sum(when(col("yb") > col("ya"), 1L)
          .when(col("yb") < col("ya"), -1L).otherwise(0L)).as("s"))
      val ndf = daily.groupBy("event_type").agg(count(lit(1)).as("n"))
      val tg = daily.groupBy("event_type", "y").agg(count(lit(1)).as("t"))
        .groupBy("event_type")
        .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)).as("tie"))
      val vn = col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) - col("tie")
      val sign = when(col("s") > 0, 1L).when(col("s") < 0, -1L).otherwise(0L)
      ndf.join(sdf, "event_type").join(tg, "event_type")
        .select(col("event_type"), col("n").as("n_days"), col("s"),
          when(vn > 0, Q.r6((col("s") - sign) / sqrt(vn / lit(18.0)))).as("z"))
        .orderBy("event_type")
    },

    // Mood's median test across types: does any type's daily-volume
    // DISTRIBUTION sit above or below the others' — counts above the
    // pooled grand median per type, one 2×k chi-square. The location
    // complement of q_kruskal_wallis' rank test (median test ignores
    // everything but the above/below bit, so one heavy-tailed type
    // can't dominate). The grand median picks the explicit middle
    // elements of ONE sorted-array aggregate over the domain-bounded
    // daily frame (≤ |types|·366 int64 cells — bounded state, the
    // bounded-buffer-agg family; never either engine's median(), and
    // no global sort exec at all). Each type's a²/n_g contribution
    // hits the 1e6 lattice BEFORE the cross-type sum (the q_anova b6
    // move; OverflowHeadroomSpec row) so the reduction is order-free
    // int64. NULL chi2 when every count is on one side of the median.
    Q("q_moods_median",
      s"""WITH daily AS (${Inference.dailySql}),
         |md AS (SELECT CAST(ys[CAST(floor((len(ys) + 1) / 2.0) AS BIGINT)] +
         |              ys[CAST(floor((len(ys) + 2) / 2.0) AS BIGINT)] AS DOUBLE) / 2 AS m
         |       FROM (SELECT list_sort(list(y)) AS ys FROM daily)),
         |g AS (SELECT d.event_type, CAST(count(*) AS BIGINT) AS ng,
         |             CAST(sum(CASE WHEN d.y > md.m THEN 1 ELSE 0 END) AS BIGINT) AS a
         |      FROM daily d, md GROUP BY 1),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
         |             CAST(sum(a) AS BIGINT) AS aa,
         |             CAST(sum(CAST(floor(CAST(a * a AS DOUBLE) / ng * 1e6 + 0.5)
         |               AS BIGINT)) AS BIGINT) AS b6
         |      FROM g)
         |SELECT t.k AS n_types, t.n AS n_days, md.m AS grand_median,
         |       CASE WHEN t.aa > 0 AND t.aa < t.n THEN
         |         ${Q.sqlR6("(CAST(t.n AS DOUBLE) * t.n / (t.aa * (t.n - t.aa))) * " +
                   "(t.b6 / 1e6 - CAST(t.aa AS DOUBLE) * t.aa / t.n)")}
         |       END AS chi2
         |FROM t, md""".stripMargin) { (s, d) =>
      moodsMedianOf(Inference.dailyCounts(s, d))
    },

    // Friedman rank test over the DENSE (day × type) block design:
    // within each day, rank the types by volume (average ranks under
    // ties, carried as exact 2×rank ints), then test whether any
    // type's mean rank departs from (k+1)/2 — "is the daily volume
    // ORDERING of the types stable", the within-day complement of
    // q_kruskal_wallis' pooled ranks. Days a type logged nothing are
    // ZERO-fill cells (the dense grid — types × observed days, both
    // domain-bounded enums, broadcast cross join), which is what makes
    // the block design complete. 2·avgrank = 2·rank() + tiecount − 1
    // keeps every rank sum exact int64; the tie correction
    // C = 1 − Σ(t³−t)/(nk(k²−1)) folds exact int64 tie cubes.
    Q("q_friedman",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |r AS (SELECT event_type,
         |             CAST(2 * rank() OVER (PARTITION BY x ORDER BY y)
         |               + count(*) OVER (PARTITION BY x, y) - 1 AS BIGINT) AS r2
         |      FROM grid),
         |rs AS (SELECT event_type, CAST(sum(r2) AS BIGINT) AS r2j FROM r GROUP BY 1),
         |km AS (SELECT CAST(count(*) AS BIGINT) AS k,
         |              CAST(sum(r2j * r2j) AS BIGINT) AS sr2 FROM rs),
         |tt AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie
         |       FROM (SELECT x, y, CAST(count(*) AS BIGINT) AS t
         |             FROM grid GROUP BY 1, 2)),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dy)
         |SELECT nn.n AS n_days, km.k AS n_types,
         |       CASE WHEN km.k >= 2 THEN
         |         ${Q.sqlR6("3.0 * km.sr2 / (nn.n * km.k * (km.k + 1)) - " +
                   "3.0 * nn.n * (km.k + 1)")}
         |       END AS q,
         |       CASE WHEN km.k >= 2 AND nn.n * km.k * (km.k * km.k - 1) > tt.tie THEN
         |         ${Q.sqlR6("(3.0 * km.sr2 / (nn.n * km.k * (km.k + 1)) - " +
                   "3.0 * nn.n * (km.k + 1)) / " +
                   "(1 - CAST(tt.tie AS DOUBLE) / (nn.n * km.k * (km.k * km.k - 1)))")}
         |       END AS q_tie_corrected
         |FROM nn, km, tt""".stripMargin) { (s, d) =>
      friedmanOf(Inference.dailyCounts(s, d))
    },

    // Kendall's coefficient of concordance W (round 15): the
    // EFFECT-SIZE face of q_friedman's significance test — how much
    // the daily blocks AGREE on the ordering of the event types
    // (W = 1: every day ranks the types identically; W = 0: no
    // agreement), tie-corrected: W = (12·ΣR_j² − 3n²k(k+1)²) /
    // (n²k(k²−1) − n·Σ(t³−t)). Rides the SAME dense-grid doubled-rank
    // machinery (shared denseGrid/r2Col — 12·ΣR² = 3·Σr2² exactly),
    // so all inputs to the ONE mirrored double tree are exact int64.
    Q("q_kendall_w",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |r AS (SELECT event_type,
         |             CAST(2 * rank() OVER (PARTITION BY x ORDER BY y)
         |               + count(*) OVER (PARTITION BY x, y) - 1 AS BIGINT) AS r2
         |      FROM grid),
         |rs AS (SELECT event_type, CAST(sum(r2) AS BIGINT) AS r2j FROM r GROUP BY 1),
         |km AS (SELECT CAST(count(*) AS BIGINT) AS k,
         |              CAST(sum(r2j * r2j) AS BIGINT) AS sr2 FROM rs),
         |tt AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie
         |       FROM (SELECT x, y, CAST(count(*) AS BIGINT) AS t
         |             FROM grid GROUP BY 1, 2)),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dy)
         |SELECT nn.n AS n_days, km.k AS n_types,
         |       CASE WHEN km.k >= 2 AND CAST(nn.n AS DOUBLE) * nn.n * km.k * (km.k * km.k - 1) - CAST(nn.n AS DOUBLE) * tt.tie > 0 THEN
         |         ${Q.sqlR6("(3.0 * km.sr2 - 3.0 * nn.n * nn.n * km.k * (km.k + 1) * (km.k + 1)) / (CAST(nn.n AS DOUBLE) * nn.n * km.k * (km.k * km.k - 1) - CAST(nn.n AS DOUBLE) * tt.tie)")}
         |       END AS w
         |FROM nn, km, tt""".stripMargin) { (s, d) =>
      kendallWOf(Inference.dailyCounts(s, d))
    },

    // Nemenyi post-hoc screen after Friedman: the rank-world Tukey for
    // the BLOCK design — pairwise q = |R̄_a − R̄_b| / √(k(k+1)/(6n))
    // over the mean within-day ranks, answering "WHICH types trade
    // daily-volume ordering" the single Friedman Q deliberately
    // doesn't (the exact q_dunn ↔ q_kruskal_wallis relationship, one
    // design over). Rides the SAME dense-grid 2·avgrank machinery as
    // q_friedman (shared denseGrid/r2Col — mean ranks cannot drift
    // from the omnibus test); the pair fan-out is the |types|²
    // broadcast nested loop over the collapsed rank-sum frame.
    Q("q_nemenyi",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |r AS (SELECT event_type,
         |             CAST(2 * rank() OVER (PARTITION BY x ORDER BY y)
         |               + count(*) OVER (PARTITION BY x, y) - 1 AS BIGINT) AS r2
         |      FROM grid),
         |rs AS (SELECT event_type, CAST(sum(r2) AS BIGINT) AS r2j FROM r GROUP BY 1),
         |km AS (SELECT CAST(count(*) AS BIGINT) AS k FROM rs),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dy)
         |SELECT a.event_type AS type_a, b.event_type AS type_b,
         |       ${Q.sqlR6("CAST(a.r2j AS DOUBLE) / (2 * nn.n)")} AS mean_rank_a,
         |       ${Q.sqlR6("CAST(b.r2j AS DOUBLE) / (2 * nn.n)")} AS mean_rank_b,
         |       CASE WHEN nn.n > 0 AND km.k >= 2 THEN
         |         ${Q.sqlR6("abs(CAST(a.r2j AS DOUBLE) / (2 * nn.n) - " +
                   "CAST(b.r2j AS DOUBLE) / (2 * nn.n)) / " +
                   "sqrt(CAST(km.k AS DOUBLE) * (km.k + 1) / (6.0 * nn.n))")}
         |       END AS q_stat
         |FROM rs a, rs b, km, nn
         |WHERE a.event_type < b.event_type
         |ORDER BY type_a, type_b""".stripMargin) { (s, d) =>
      nemenyiOf(Inference.dailyCounts(s, d))
    },

    // Wilcoxon signed-rank per type pair, paired BY DAY (round 14) —
    // the paired complement of q_mann_whitney's independent-samples
    // rank test: "on the same days, does type A systematically out-log
    // type B", robust to the shared daily level both ride. Pairs come
    // from the zero-filled dense grid (the Friedman block move — a day
    // one type skipped is a 0, not a dropped pair); zero differences
    // drop (standard); |d| ranks are exact 2·avgrank ints; the normal
    // approximation carries the Σ(t³−t)/48 tie correction. Shape: the
    // grid self-join on the day key, then bounded (|types|²·|days|)
    // frames with pair-partitioned windows only.
    Q("q_wilcoxon_signed",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
         |             CAST(a.y - b.y AS BIGINT) AS d
         |      FROM grid a JOIN grid b
         |        ON a.x = b.x AND a.event_type < b.event_type),
         |nz AS (SELECT type_a, type_b, d, abs(d) AS ad FROM p WHERE d <> 0),
         |r AS (SELECT type_a, type_b, d,
         |             CAST(2 * rank() OVER (PARTITION BY type_a, type_b ORDER BY ad)
         |               + count(*) OVER (PARTITION BY type_a, type_b, ad) - 1
         |               AS BIGINT) AS r2
         |      FROM nz),
         |t AS (SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(CASE WHEN d > 0 THEN r2 ELSE 0 END) AS BIGINT) AS w2
         |      FROM r GROUP BY 1, 2),
         |tt AS (SELECT type_a, type_b, CAST(sum(t * t * t - t) AS BIGINT) AS tie
         |       FROM (SELECT type_a, type_b, ad, CAST(count(*) AS BIGINT) AS t
         |             FROM nz GROUP BY 1, 2, 3) GROUP BY 1, 2)
         |SELECT t.type_a, t.type_b, t.n AS n_nonzero,
         |       CAST(t.w2 AS DOUBLE) / 2 AS w_plus,
         |       CASE WHEN t.n >= 1 AND
         |                 CAST(t.n AS DOUBLE) * (t.n + 1) * (2 * t.n + 1) / 24.0
         |                   - CAST(tt.tie AS DOUBLE) / 48.0 > 0 THEN
         |         ${Q.sqlR6("(CAST(t.w2 AS DOUBLE) / 2 - CAST(t.n AS DOUBLE) * (t.n + 1) / 4) / " +
                   "sqrt(CAST(t.n AS DOUBLE) * (t.n + 1) * (2 * t.n + 1) / 24.0 " +
                   "- CAST(tt.tie AS DOUBLE) / 48.0)")}
         |       END AS z
         |FROM t JOIN tt ON t.type_a = tt.type_a AND t.type_b = tt.type_b
         |ORDER BY t.type_a, t.type_b""".stripMargin) { (s, d) =>
      wilcoxonOf(Inference.dailyCounts(s, d))
    },

    // Paired t test on day-paired volumes per type pair (round 14):
    // the PARAMETRIC twin of q_wilcoxon_signed on the identical
    // zero-filled dense grid — Wilcoxon ranks the |diffs| (outlier-
    // immune), the t test weighs them (power under normality); run
    // side by side, disagreement flags heavy-tailed diffs. Zero diffs
    // are KEPT (no zero-drop convention in the t world). Σd and Σd²
    // exact int64; NULL t on an exact constant offset (variance 0).
    Q("q_paired_t",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
         |             CAST(a.y - b.y AS BIGINT) AS d
         |      FROM grid a JOIN grid b
         |        ON a.x = b.x AND a.event_type < b.event_type),
         |t AS (SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(d) AS BIGINT) AS sd,
         |             CAST(sum(d * d) AS BIGINT) AS sdd
         |      FROM p GROUP BY 1, 2)
         |SELECT type_a, type_b, n AS n_days,
         |       ${Q.sqlR6("CAST(sd AS DOUBLE) / n")} AS mean_diff,
         |       CASE WHEN n >= 2 AND
         |                 CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * sd / n > 0 THEN
         |         ${Q.sqlR6("(CAST(sd AS DOUBLE) / n) / " +
                   "sqrt((CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * sd / n) / " +
                   "((n - 1) * n))")}
         |       END AS t_stat
         |FROM t
         |ORDER BY type_a, type_b""".stripMargin) { (s, d) =>
      pairedTOf(Inference.dailyCounts(s, d))
    },

    // Tukey HSD post-hoc screen: the studentized-range statistic
    // q = |ȳ_a − ȳ_b| / √(MSW/2 · (1/n_a + 1/n_b)) for every type
    // pair, sharing q_anova's within-group variance — the "WHICH pair
    // differs" follow-up q_anova's single F deliberately doesn't
    // answer. Reuses q_anova's exact machinery verbatim: per-type
    // (n, Σv, Σv²) int64 stats, each group's s²/n on the 1e6 lattice
    // before the cross-group sum (the shared OverflowHeadroomSpec
    // bound), MSW through one mirrored tree; the pair fan-out is the
    // |types|² broadcast nested loop over the collapsed stats frame.
    Q("q_tukey_hsd",
      s"""WITH m AS (SELECT event_type, CAST(floor(value) AS BIGINT) AS v FROM events),
         |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(v) AS BIGINT) AS s, CAST(sum(v * v) AS BIGINT) AS ss
         |      FROM m GROUP BY 1),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
         |             CAST(sum(ss) AS BIGINT) AS sstot,
         |             CAST(sum(CAST(floor(CAST(s * s AS DOUBLE) / n * 1e6 + 0.5)
         |               AS BIGINT)) AS BIGINT) AS b6
         |      FROM g)
         |SELECT a.event_type AS type_a, b.event_type AS type_b,
         |       ${Q.sqlR6("CAST(a.s AS DOUBLE) / a.n")} AS mean_a,
         |       ${Q.sqlR6("CAST(b.s AS DOUBLE) / b.n")} AS mean_b,
         |       CASE WHEN t.nn > t.k AND t.sstot - t.b6 / 1e6 > 0 THEN
         |         ${Q.sqlR6("abs(CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n) / " +
                   "sqrt((t.sstot - t.b6 / 1e6) / (t.nn - t.k) / 2 * (1.0 / a.n + 1.0 / b.n))")}
         |       END AS q_stat
         |FROM g a, g b, t
         |WHERE a.event_type < b.event_type
         |ORDER BY type_a, type_b""".stripMargin) { (s, d) =>
      tukeyOf(Tables.events(s, d)
        .select(col("event_type"), floor(col("value")).cast("long").as("v"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("v").as("s"),
          sum(col("v") * col("v")).as("ss")))
    },

    // Hodges–Lehmann pseudo-median per type: the median of the Walsh
    // averages (y_i + y_j)/2 over all day pairs i ≤ j — the robust
    // location estimate consistent with the Wilcoxon machinery
    // (q_mann_whitney), sitting between the mean (outlier-fragile)
    // and the raw median (throws away magnitude). Walsh pairs are the
    // day-window-bounded C(|days|+1, 2) per type; each 2×average is
    // an exact int sum, the median picks explicit middle ranks (the
    // q_theil_sen idiom), and /4 at the end is a dyadic-exact double
    // in both engines — no rounding lattice needed anywhere.
    Q("q_hodges_lehmann",
      s"""WITH daily AS (${Inference.dailySql}),
         |wp AS (SELECT a.event_type, a.y + b.y AS w2
         |       FROM daily a JOIN daily b
         |         ON a.event_type = b.event_type AND a.x <= b.x),
         |rk AS (SELECT event_type, w2,
         |              row_number() OVER (PARTITION BY event_type ORDER BY w2) AS rn,
         |              CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS np
         |       FROM wp),
         |hl AS (SELECT event_type, np,
         |              CAST(sum(w2) AS DOUBLE) / count(*) / 2 AS hl
         |       FROM rk
         |       WHERE rn = CAST(floor((np + 1) / 2.0) AS BIGINT)
         |          OR rn = CAST(floor((np + 2) / 2.0) AS BIGINT)
         |       GROUP BY 1, 2),
         |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY 1)
         |SELECT hl.event_type, n.n AS n_days, hl.np AS n_pairs, hl.hl
         |FROM hl JOIN n ON hl.event_type = n.event_type
         |ORDER BY hl.event_type""".stripMargin) { (s, d) =>
      val daily = Inference.dailyCounts(s, d).transform(Q.snapshot)
      val a = daily.select(col("event_type"), col("x").as("xa"), col("y").as("ya"))
      val b = daily.select(col("event_type"), col("x").as("xb"), col("y").as("yb"))
      val w = Window.partitionBy("event_type")
      val rk = a.join(b, Seq("event_type")).filter(col("xa") <= col("xb"))
        .select(col("event_type"), (col("ya") + col("yb")).as("w2"))
        .withColumn("rn", row_number().over(w.orderBy("w2")))
        .withColumn("np", count(lit(1)).over(w))
      val hl = rk.filter(col("rn") === floor((col("np") + 1) / 2.0).cast("long") ||
          col("rn") === floor((col("np") + 2) / 2.0).cast("long"))
        .groupBy("event_type", "np")
        .agg((sum("w2").cast("double") / count(lit(1)) / lit(2)).as("hl"))
      val n = daily.groupBy("event_type").agg(count(lit(1)).as("n"))
      hl.join(n, "event_type")
        .select(col("event_type"), col("n").as("n_days"),
          col("np").as("n_pairs"), col("hl"))
        .orderBy("event_type")
    },

    // Lag-1 Granger causality F per DIRECTED type pair: does
    // yesterday's cause-volume improve today's effect-volume forecast
    // beyond the effect's own yesterday — F from RSS_restricted
    // (w on u) vs RSS_unrestricted (w on u, v) over the day-aligned
    // pair frame; the predictive-direction complement of q_xcorr's
    // symmetric lag correlation. The 2×2 normal equations collapse to
    // exact int64 moment stats M_pq = n·Σpq − Σp·Σq on the
    // (|types|²×days)-bounded aligned frame (q_adf's headroom family —
    // daily counts ≤366 days); M·M products move to DOUBLE for the
    // determinant and residuals only (the q_ar1/q_adf precedent), and
    // F = (RSS_r − RSS_u)·(n−3)/RSS_u rides one mirrored tree (the
    // common /n of both RSS forms cancels). NULL on degenerate
    // variance (constant series), a singular normal matrix, or an
    // exact fit (RSS_u = 0 — infinite F).
    Q("q_granger",
      s"""WITH daily AS (${Inference.dailySql}),
         |j AS (SELECT a.event_type AS cause, b.event_type AS effect, a.x,
         |             a.y AS ya, b.y AS yb
         |      FROM daily a JOIN daily b
         |        ON a.x = b.x AND a.event_type <> b.event_type),
         |l AS (SELECT cause, effect, yb AS w,
         |             lag(yb) OVER (PARTITION BY cause, effect ORDER BY x) AS u,
         |             lag(ya) OVER (PARTITION BY cause, effect ORDER BY x) AS v
         |      FROM j),
         |t AS (SELECT cause, effect, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(u) AS BIGINT) AS su, CAST(sum(v) AS BIGINT) AS sv,
         |             CAST(sum(w) AS BIGINT) AS sw,
         |             CAST(sum(u * u) AS BIGINT) AS suu,
         |             CAST(sum(v * v) AS BIGINT) AS svv,
         |             CAST(sum(w * w) AS BIGINT) AS sww,
         |             CAST(sum(u * v) AS BIGINT) AS suv,
         |             CAST(sum(u * w) AS BIGINT) AS suw,
         |             CAST(sum(v * w) AS BIGINT) AS svw
         |      FROM l WHERE u IS NOT NULL AND v IS NOT NULL GROUP BY 1, 2),
         |mm AS (SELECT cause, effect, n,
         |              n * suu - su * su AS muu, n * svv - sv * sv AS mvv,
         |              n * sww - sw * sw AS mww, n * suv - su * sv AS muv,
         |              n * suw - su * sw AS muw, n * svw - sv * sw AS mvw
         |       FROM t),
         |f0 AS (SELECT cause, effect, n, muu, muw, mww, mvw,
         |              CAST(muu AS DOUBLE) * mvv - CAST(muv AS DOUBLE) * muv AS dd,
         |              CAST(muw AS DOUBLE) * mvv - CAST(mvw AS DOUBLE) * muv AS bn,
         |              CAST(mvw AS DOUBLE) * muu - CAST(muw AS DOUBLE) * muv AS cn
         |       FROM mm),
         |f1 AS (SELECT cause, effect, n, muu, muw, mww, dd,
         |              CASE WHEN dd > 0 THEN
         |                mww - (bn / dd) * muw - (cn / dd) * mvw
         |              END AS ru
         |       FROM f0)
         |SELECT cause, effect, n AS n_days,
         |       CASE WHEN n >= 4 AND muu > 0 AND dd > 0 AND ru > 0 THEN
         |         ${Q.sqlR6("((mww - CAST(muw AS DOUBLE) * muw / muu) - ru) * (n - 3) / ru")}
         |       END AS f_stat
         |FROM f1
         |ORDER BY cause, effect""".stripMargin) { (s, d) =>
      val daily = Inference.dailyCounts(s, d).transform(Q.snapshot)
      val a = daily.select(col("event_type").as("cause"), col("x"), col("y").as("ya"))
      val b = daily.select(col("event_type").as("effect"), col("x"), col("y").as("yb"))
      val wp = Window.partitionBy("cause", "effect").orderBy("x")
      val l = a.join(b, Seq("x")).filter(col("cause") =!= col("effect"))
        .withColumn("u", lag("yb", 1).over(wp))
        .withColumn("v", lag("ya", 1).over(wp))
        .filter(col("u").isNotNull && col("v").isNotNull)
        .select(col("cause"), col("effect"), col("yb").as("w"), col("u"), col("v"))
      val t = l.groupBy("cause", "effect")
        .agg(count(lit(1)).as("n"), sum("u").as("su"), sum("v").as("sv"),
          sum("w").as("sw"), sum(col("u") * col("u")).as("suu"),
          sum(col("v") * col("v")).as("svv"), sum(col("w") * col("w")).as("sww"),
          sum(col("u") * col("v")).as("suv"), sum(col("u") * col("w")).as("suw"),
          sum(col("v") * col("w")).as("svw"))
      val mm = t.select(col("cause"), col("effect"), col("n"),
        (col("n") * col("suu") - col("su") * col("su")).as("muu"),
        (col("n") * col("svv") - col("sv") * col("sv")).as("mvv"),
        (col("n") * col("sww") - col("sw") * col("sw")).as("mww"),
        (col("n") * col("suv") - col("su") * col("sv")).as("muv"),
        (col("n") * col("suw") - col("su") * col("sw")).as("muw"),
        (col("n") * col("svw") - col("sv") * col("sw")).as("mvw"))
      val f0 = mm.select(col("cause"), col("effect"), col("n"),
        col("muu"), col("muw"), col("mww"), col("mvw"),
        (col("muu").cast("double") * col("mvv") -
          col("muv").cast("double") * col("muv")).as("dd"),
        (col("muw").cast("double") * col("mvv") -
          col("mvw").cast("double") * col("muv")).as("bn"),
        (col("mvw").cast("double") * col("muu") -
          col("muw").cast("double") * col("muv")).as("cn"))
      // the CASE guard doubles as the ANSI-mode division shield: a
      // singular normal matrix (dd = 0 — any constant series) would
      // otherwise throw DIVIDE_BY_ZERO before the outer guard runs
      val f1 = f0.withColumn("ru",
        when(col("dd") > 0,
          col("mww") - (col("bn") / col("dd")) * col("muw") -
            (col("cn") / col("dd")) * col("mvw")))
      f1.select(col("cause"), col("effect"), col("n").as("n_days"),
          when(col("n") >= 4 && col("muu") > 0 && col("dd") > 0 && col("ru") > 0,
            Q.r6((col("mww") - col("muw").cast("double") * col("muw") / col("muu") -
              col("ru")) * (col("n") - 3) / col("ru"))).as("f_stat"))
        .orderBy("cause", "effect")
    },

    // Seasonal Mann–Kendall per type: the MK sign statistic computed
    // WITHIN each day-of-week stratum and summed — the trend screen
    // that is immune to weekly seasonality (a strong Mon/Sun cycle
    // reads as trend to plain q_mann_kendall's cross-day pairs but
    // cancels here, because pairs never cross strata). S = Σ_k S_k,
    // 18·Var = Σ_k [n_k(n_k−1)(2n_k+5) − ties_k], z continuity-
    // corrected through the exact q_mann_kendall tree. The stratum key
    // is x mod 7 (the anchor is a Monday, so the residue IS the
    // weekday — and the same integer arithmetic in both engines).
    Q("q_seasonal_mk",
      s"""WITH daily AS (${Inference.dailySql}),
         |dw AS (SELECT event_type, x % 7 AS dow, x, y FROM daily),
         |p AS (SELECT a.event_type,
         |             CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sg
         |      FROM dw a JOIN dw b
         |        ON a.event_type = b.event_type AND a.dow = b.dow AND a.x < b.x),
         |s AS (SELECT event_type, CAST(sum(sg) AS BIGINT) AS s FROM p GROUP BY 1),
         |v AS (SELECT dw.event_type,
         |             CAST(sum(nn * (nn - 1) * (2 * nn + 5)) AS BIGINT) AS vraw
         |      FROM (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS nn
         |            FROM dw GROUP BY 1, 2) dw GROUP BY 1),
         |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM dw GROUP BY 1),
         |tg AS (SELECT event_type,
         |              CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie
         |       FROM (SELECT event_type, dow, y, CAST(count(*) AS BIGINT) AS t
         |             FROM dw GROUP BY 1, 2, 3) GROUP BY 1)
         |SELECT n.event_type, n.n AS n_days, s.s AS s,
         |       CASE WHEN v.vraw - tg.tie > 0 THEN
         |         ${Q.sqlR6("(s.s - CASE WHEN s.s > 0 THEN 1 WHEN s.s < 0 THEN -1 ELSE 0 END) / " +
                   "sqrt((v.vraw - tg.tie) / 18.0)")}
         |       END AS z
         |FROM n JOIN s ON n.event_type = s.event_type
         |       JOIN v ON n.event_type = v.event_type
         |       JOIN tg ON n.event_type = tg.event_type
         |ORDER BY n.event_type""".stripMargin) { (s, d) =>
      val dw = Inference.dailyCounts(s, d)
        .withColumn("dow", col("x") % 7).transform(Q.snapshot)
      val a = dw.select(col("event_type"), col("dow"),
        col("x").as("xa"), col("y").as("ya"))
      val b = dw.select(col("event_type"), col("dow"),
        col("x").as("xb"), col("y").as("yb"))
      val sdf = a.join(b, Seq("event_type", "dow")).filter(col("xa") < col("xb"))
        .groupBy("event_type")
        .agg(sum(when(col("yb") > col("ya"), 1L)
          .when(col("yb") < col("ya"), -1L).otherwise(0L)).as("s"))
      val ndf = dw.groupBy("event_type").agg(count(lit(1)).as("n"))
      val v = dw.groupBy("event_type", "dow").agg(count(lit(1)).as("nn"))
        .groupBy("event_type")
        .agg(sum(col("nn") * (col("nn") - 1) * (lit(2) * col("nn") + 5)).as("vraw"))
      val tg = dw.groupBy("event_type", "dow", "y").agg(count(lit(1)).as("t"))
        .groupBy("event_type")
        .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)).as("tie"))
      val vn = col("vraw") - col("tie")
      val sign = when(col("s") > 0, 1L).when(col("s") < 0, -1L).otherwise(0L)
      ndf.join(sdf, "event_type").join(v, "event_type").join(tg, "event_type")
        .select(col("event_type"), col("n").as("n_days"), col("s"),
          when(vn > 0, Q.r6((col("s") - sign) / sqrt(vn / lit(18.0)))).as("z"))
        .orderBy("event_type")
    },

    // Pettitt changepoint test per type: U_t = 2·Σ_{i≤t} r_i − t(n+1)
    // over the average ranks of the daily counts, K = max|U_t| with
    // the day achieving it — the rank-based (outlier-immune) shift
    // locator beside q_changepoint's mean-split and q_cusum's
    // deviation path; p_exponent = 6K²/(n³+n²) is the −ln of the
    // classical approximate p, emitted as pure arithmetic so no
    // transcendental has to agree across engines. Ranks ride the
    // exact 2·avgrank ints (the q_friedman move), the running sum and
    // t(n+1) subtraction stay int64, and the argmax ranks on
    // (|U| desc, day) — all windows partitioned by type over the
    // collapsed daily frame.
    Q("q_pettitt",
      s"""WITH daily AS (${Inference.dailySql}),
         |r AS (SELECT event_type, x,
         |             CAST(2 * rank() OVER (PARTITION BY event_type ORDER BY y)
         |               + count(*) OVER (PARTITION BY event_type, y) - 1 AS BIGINT) AS r2
         |      FROM daily),
         |u AS (SELECT event_type, x,
         |             CAST(sum(r2) OVER w AS BIGINT)
         |               - CAST(row_number() OVER w2 AS BIGINT) *
         |                 (CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) + 1) AS ut,
         |             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
         |      FROM r
         |      WINDOW w AS (PARTITION BY event_type ORDER BY x
         |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |             w2 AS (PARTITION BY event_type ORDER BY x)),
         |k AS (SELECT event_type, x, ut, n,
         |             row_number() OVER (PARTITION BY event_type
         |                                ORDER BY abs(ut) DESC, x) AS rk
         |      FROM u)
         |SELECT event_type, n AS n_days, abs(ut) AS k_stat, x AS change_day,
         |       CASE WHEN n >= 2 THEN
         |         ${Q.sqlR6("6.0 * abs(ut) * abs(ut) / " +
                   "(CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n)")}
         |       END AS p_exponent
         |FROM k WHERE rk = 1
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val wt = Window.partitionBy("event_type")
      val run = wt.orderBy("x").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val r = Inference.dailyCounts(s, d)
        .withColumn("r2",
          (lit(2) * rank().over(wt.orderBy("y")) +
            count(lit(1)).over(Window.partitionBy("event_type", "y")) - 1).cast("long"))
      val u = r
        .withColumn("n", count(lit(1)).over(wt))
        .withColumn("ut",
          sum("r2").over(run) - row_number().over(wt.orderBy("x")).cast("long") *
            (col("n") + 1))
      u.withColumn("rk", row_number().over(wt.orderBy(abs(col("ut")).desc, col("x"))))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("n").as("n_days"),
          abs(col("ut")).as("k_stat"), col("x").as("change_day"),
          when(col("n") >= 2,
            Q.r6(lit(6.0) * abs(col("ut")) * abs(col("ut")) /
              (col("n").cast("double") * col("n") * col("n") +
                col("n").cast("double") * col("n")))).as("p_exponent"))
        .orderBy("event_type")
    },

    // Durbin–Watson residual-autocorrelation screen on the daily trend
    // fit per type: DW = Σ(e_t − e_{t−1})²/Σe_t² over the OLS
    // residuals of y~x — the "is the trend line hiding serial
    // structure" gate in front of q_trend_fit's slope (DW ≈ 2 clean,
    // → 0 positive autocorrelation, → 4 alternation). No residual is
    // ever materialized: with b = bxy/bxx, e_t − e_{t−1} = Δy − b·Δx
    // and Σe² = (byy − b·bxy)/n, so the whole statistic collapses to
    // DW = n·(Suu − 2b·Suv + b²·Svv)/(byy − b·bxy) where Suu/Suv/Svv
    // are exact int64 sums of consecutive-day differences (one lag
    // window over the collapsed daily frame) and the rest is the
    // q_cooks_distance moment tree — identical doubles from identical
    // integers in both engines. rho1 ≈ 1 − DW/2 rides the same tree.
    Q("q_durbin_watson",
      s"""WITH daily AS (${Inference.dailySql}),
         |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |             CAST(sum(x * x) AS BIGINT) AS sxx,
         |             CAST(sum(x * y) AS BIGINT) AS sxy,
         |             CAST(sum(y * y) AS BIGINT) AS syy
         |      FROM daily GROUP BY 1),
         |df AS (SELECT event_type, y - lag(y) OVER w AS u, x - lag(x) OVER w AS v
         |       FROM daily
         |       WINDOW w AS (PARTITION BY event_type ORDER BY x)),
         |s AS (SELECT event_type, CAST(sum(u * u) AS BIGINT) AS suu,
         |             CAST(sum(u * v) AS BIGINT) AS suv,
         |             CAST(sum(v * v) AS BIGINT) AS svv
         |      FROM df WHERE u IS NOT NULL GROUP BY 1),
         |m AS (SELECT t.event_type, t.n, s.suu, s.suv, s.svv,
         |             CAST(t.n * t.sxx - t.sx * t.sx AS DOUBLE) AS bxx,
         |             CAST(t.n * t.sxy - t.sx * t.sy AS DOUBLE) AS bxy,
         |             CAST(t.n * t.syy - t.sy * t.sy AS DOUBLE) AS byy
         |      FROM t JOIN s ON t.event_type = s.event_type)
         |SELECT event_type, n AS n_days,
         |       CASE WHEN n >= 3 AND bxx > 0 THEN ${Q.sqlR6("bxy / bxx")} END AS slope,
         |       CASE WHEN n >= 3 AND bxx > 0 AND byy - (bxy / bxx) * bxy > 0 THEN
         |         ${Q.sqlR6("n * (suu - 2 * (bxy / bxx) * suv + (bxy / bxx) * (bxy / bxx) * svv) / (byy - (bxy / bxx) * bxy)")}
         |       END AS dw,
         |       CASE WHEN n >= 3 AND bxx > 0 AND byy - (bxy / bxx) * bxy > 0 THEN
         |         ${Q.sqlR6("1 - n * (suu - 2 * (bxy / bxx) * suv + (bxy / bxx) * (bxy / bxx) * svv) / (byy - (bxy / bxx) * bxy) / 2")}
         |       END AS rho1
         |FROM m
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val daily = Inference.dailyCounts(s, d).transform(Q.snapshot)
      val t = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"))
      val w = Window.partitionBy("event_type").orderBy("x")
      val sd = daily
        .select(col("event_type"), (col("y") - lag("y", 1).over(w)).as("u"),
          (col("x") - lag("x", 1).over(w)).as("v"))
        .filter(col("u").isNotNull)
        .groupBy("event_type")
        .agg(sum(col("u") * col("u")).as("suu"), sum(col("u") * col("v")).as("suv"),
          sum(col("v") * col("v")).as("svv"))
      val m = t.join(sd, "event_type")
        .select(col("event_type"), col("n"), col("suu"), col("suv"), col("svv"),
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double").as("bxx"),
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double").as("bxy"),
          (col("n") * col("syy") - col("sy") * col("sy")).cast("double").as("byy"))
      val b = col("bxy") / col("bxx")
      val sse = col("byy") - b * col("bxy")
      val dw = col("n") * (col("suu") - lit(2) * b * col("suv") + b * b * col("svv")) / sse
      val ok = col("n") >= 3 && col("bxx") > 0
      m.select(col("event_type"), col("n").as("n_days"),
          when(ok, Q.r6(b)).as("slope"),
          when(ok && sse > 0, Q.r6(dw)).as("dw"),
          when(ok && sse > 0, Q.r6(lit(1) - dw / lit(2))).as("rho1"))
        .orderBy("event_type")
    },

    // Chow structural-break F per type at the mid-series split: does
    // ONE trend line explain the daily counts, or do the first and
    // second halves want different lines — the parametric complement
    // of q_pettitt's rank shift locator and q_changepoint's mean
    // split (Chow moves on SLOPE changes those two can't see). The
    // split is rn·2 ≤ n (pure integer — no engine's float division
    // involved); each segment collapses to exact int64 moments, its
    // SSE = (byy − (bxy/bxx)·bxy)/n comes off the q_cooks_distance
    // tree, the pooled moments are the segment sums, and
    // F = ((SSEp − SSE1 − SSE2)/2)/((SSE1 + SSE2)/(n − 4)) is one
    // mirrored tree over those three doubles (explicit two-operand
    // additions — fixed order, no reduction). Segment slopes emit
    // beside F so the readout says HOW the line broke.
    Q("q_chow",
      s"""WITH daily AS (${Inference.dailySql}),
         |rn AS (SELECT event_type, x, y,
         |              row_number() OVER (PARTITION BY event_type ORDER BY x) AS rn,
         |              CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
         |       FROM daily),
         |g AS (SELECT event_type, CASE WHEN rn * 2 <= n THEN 1 ELSE 2 END AS seg,
         |             CAST(count(*) AS BIGINT) AS ng,
         |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |             CAST(sum(x * x) AS BIGINT) AS sxx,
         |             CAST(sum(x * y) AS BIGINT) AS sxy,
         |             CAST(sum(y * y) AS BIGINT) AS syy,
         |             CAST(max(x) AS BIGINT) AS mx
         |      FROM rn GROUP BY 1, 2),
         |e AS (SELECT event_type, seg, ng, mx,
         |             CAST(ng * sxx - sx * sx AS DOUBLE) AS bxx,
         |             CAST(ng * sxy - sx * sy AS DOUBLE) AS bxy,
         |             CAST(ng * syy - sy * sy AS DOUBLE) AS byy
         |      FROM g),
         |p AS (SELECT event_type, CAST(sum(ng) AS BIGINT) AS n,
         |             CAST(sum(ng) * sum(sxx) - sum(sx) * sum(sx) AS DOUBLE) AS bxx,
         |             CAST(sum(ng) * sum(sxy) - sum(sx) * sum(sy) AS DOUBLE) AS bxy,
         |             CAST(sum(ng) * sum(syy) - sum(sy) * sum(sy) AS DOUBLE) AS byy
         |      FROM g GROUP BY 1),
         |j AS (SELECT p.event_type, p.n, a.ng AS n1, b.ng AS n2, a.mx AS split_day,
         |             a.bxx AS xx1, a.bxy AS xy1, a.byy AS yy1,
         |             b.bxx AS xx2, b.bxy AS xy2, b.byy AS yy2,
         |             p.bxx AS xxp, p.bxy AS xyp, p.byy AS yyp
         |      FROM p JOIN e a ON p.event_type = a.event_type AND a.seg = 1
         |             JOIN e b ON p.event_type = b.event_type AND b.seg = 2)
         |SELECT event_type, n AS n_days, n1, n2, split_day,
         |       CASE WHEN xx1 > 0 THEN ${Q.sqlR6("xy1 / xx1")} END AS slope1,
         |       CASE WHEN xx2 > 0 THEN ${Q.sqlR6("xy2 / xx2")} END AS slope2,
         |       CASE WHEN n1 >= 3 AND n2 >= 3 AND xx1 > 0 AND xx2 > 0 AND xxp > 0
         |                 AND (yy1 - (xy1 / xx1) * xy1) / n1 + (yy2 - (xy2 / xx2) * xy2) / n2 > 0 THEN
         |         ${Q.sqlR6("(((yyp - (xyp / xxp) * xyp) / n - ((yy1 - (xy1 / xx1) * xy1) / n1 + (yy2 - (xy2 / xx2) * xy2) / n2)) / 2) / (((yy1 - (xy1 / xx1) * xy1) / n1 + (yy2 - (xy2 / xx2) * xy2) / n2) / (n - 4))")}
         |       END AS f_stat
         |FROM j
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val daily = Inference.dailyCounts(s, d).transform(Q.snapshot)
      val wt = Window.partitionBy("event_type")
      val g = daily
        .withColumn("rn", row_number().over(wt.orderBy("x")))
        .withColumn("n", count(lit(1)).over(wt))
        .withColumn("seg", when(col("rn") * 2 <= col("n"), 1).otherwise(2))
        .groupBy("event_type", "seg")
        .agg(count(lit(1)).as("ng"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"), max("x").as("mx"))
        .transform(Q.snapshot)
      def bcols(pre: String) = Seq(
        (col("ng") * col("sxx") - col("sx") * col("sx")).cast("double").as(s"xx$pre"),
        (col("ng") * col("sxy") - col("sx") * col("sy")).cast("double").as(s"xy$pre"),
        (col("ng") * col("syy") - col("sy") * col("sy")).cast("double").as(s"yy$pre"))
      val e1 = g.filter(col("seg") === 1)
        .select(Seq(col("event_type"), col("ng").as("n1"), col("mx").as("split_day")) ++
          bcols("1"): _*)
      val e2 = g.filter(col("seg") === 2)
        .select(Seq(col("event_type"), col("ng").as("n2")) ++ bcols("2"): _*)
      val p = g.groupBy("event_type")
        .agg(sum("ng").as("ng"), sum("sx").as("sx"), sum("sy").as("sy"),
          sum("sxx").as("sxx"), sum("sxy").as("sxy"), sum("syy").as("syy"))
        .select(Seq(col("event_type"), col("ng").as("n")) ++ bcols("p"): _*)
      def sse(xx: String, xy: String, yy: String, n: org.apache.spark.sql.Column) =
        (col(yy) - (col(xy) / col(xx)) * col(xy)) / n
      val s1 = sse("xx1", "xy1", "yy1", col("n1"))
      val s2 = sse("xx2", "xy2", "yy2", col("n2"))
      val sp = sse("xxp", "xyp", "yyp", col("n"))
      val sw = s1 + s2
      p.join(e1, "event_type").join(e2, "event_type")
        .select(col("event_type"), col("n").as("n_days"), col("n1"), col("n2"),
          col("split_day"),
          when(col("xx1") > 0, Q.r6(col("xy1") / col("xx1"))).as("slope1"),
          when(col("xx2") > 0, Q.r6(col("xy2") / col("xx2"))).as("slope2"),
          when(col("n1") >= 3 && col("n2") >= 3 && col("xx1") > 0 &&
              col("xx2") > 0 && col("xxp") > 0 && sw > 0,
            Q.r6(((sp - sw) / lit(2)) / (sw / (col("n") - 4)))).as("f_stat"))
        .orderBy("event_type")
    },

    // KPSS stationarity screen (level form, lag-0 long-run variance)
    // per type — the NULL-reversed partner of q_adf: ADF's null is a
    // unit root (failing to reject says nothing), KPSS's null is
    // stationarity, so the PAIR is the classic joint verdict (both
    // reject → neither model fits; ADF rejects + KPSS doesn't →
    // stationary; the reverse → unit root). η = ΣS_t²/(n²σ̂²) over the
    // partial sums S_t of the demeaned daily counts. Exactness:
    // n·S_t = n·cum_t − t·Σy is exact int64 off one running window;
    // each row's (nS_t)² would overflow int64, so it squares in DOUBLE
    // (identically in both engines) and floors onto a DATA-SCALED unit
    // lattice BEFORE the cross-row sum (the q_kruskal_wallis b0 move):
    // the divisor D = max(1, ⌊byy0/1e6⌋) is a deterministic integer
    // from the same stats pass, so the lattice is RELATIVE — exact at
    // toy scale (D = 1), ~1e-7-relative error at any volume (the ≤n/2
    // unit floor error over η's n²·byy0/D-unit magnitude), and the
    // summed B = Σ⌊(nS)²/D⌉ ≤ η·n²·1e6 stays ≥50× inside int64 even
    // at 30 years of sf0.1 volume. η divides out of B·D/(n²·byy0) in
    // one mirrored tree; S_n = 0 by construction — the window's own
    // checksum.
    Q("q_kpss",
      s"""WITH daily AS (${Inference.dailySql}),
         |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(y) AS BIGINT) AS sy,
         |             CAST(sum(y * y) AS BIGINT) AS syy,
         |             greatest(1, CAST(floor((CAST(count(*) AS BIGINT) * sum(y * y)
         |               - CAST(sum(y) AS BIGINT) * sum(y)) / 1e6) AS BIGINT)) AS dd
         |      FROM daily GROUP BY 1),
         |c AS (SELECT d.event_type, t.n, t.sy, t.syy, t.dd,
         |             t.n * CAST(sum(d.y) OVER w AS BIGINT)
         |               - CAST(row_number() OVER w2 AS BIGINT) * t.sy AS ns
         |      FROM daily d JOIN t ON d.event_type = t.event_type
         |      WINDOW w AS (PARTITION BY d.event_type ORDER BY d.x
         |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |             w2 AS (PARTITION BY d.event_type ORDER BY d.x)),
         |b AS (SELECT event_type, n, sy, syy, dd,
         |             CAST(sum(CAST(floor(CAST(ns AS DOUBLE) * ns / dd + 0.5)
         |               AS BIGINT)) AS BIGINT) AS bsum
         |      FROM c GROUP BY 1, 2, 3, 4, 5)
         |SELECT event_type, n AS n_days,
         |       CASE WHEN n >= 2 AND n * syy - sy * sy > 0 THEN
         |         ${Q.sqlR6("CAST(bsum AS DOUBLE) * dd / (CAST(n AS DOUBLE) * n * (n * syy - sy * sy))")}
         |       END AS eta
         |FROM b
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val wt = Window.partitionBy("event_type")
      val run = wt.orderBy("x").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val daily = Inference.dailyCounts(s, d)
      val t = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("y").as("sy"), sum(col("y") * col("y")).as("syy"))
        .withColumn("dd", greatest(lit(1L),
          floor((col("n") * col("syy") - col("sy") * col("sy")) / lit(1e6))
            .cast("long")))
      val b = daily.join(t, "event_type")
        .withColumn("ns",
          col("n") * sum("y").over(run) -
            row_number().over(wt.orderBy("x")).cast("long") * col("sy"))
        .groupBy("event_type", "n", "sy", "syy", "dd")
        .agg(sum(floor(col("ns").cast("double") * col("ns") / col("dd") + 0.5)
          .cast("long")).as("bsum"))
      val byy0 = col("n") * col("syy") - col("sy") * col("sy")
      b.select(col("event_type"), col("n").as("n_days"),
          when(col("n") >= 2 && byy0 > 0,
            Q.r6(col("bsum").cast("double") * col("dd") /
              (col("n").cast("double") * col("n") * byy0))).as("eta"))
        .orderBy("event_type")
    },

    // Page's L trend test over the q_friedman block design: with the
    // event types in their LEXICOGRAPHIC order as the hypothesized
    // ordering, L = Σ_j j·R_j weights each type's within-day rank sum
    // by its position — a monotone drift of the daily volume ORDERING
    // toward (or away from) the alphabet reads as |z| where Friedman's
    // omnibus Q only says "some ordering difference exists". Reuses
    // the dense zero-filled (day × type) grid and exact 2·avgrank ints
    // verbatim; 2L = Σ j·r2j stays int64, μ_L = nk(k+1)²/4 and
    // σ²_L = nk²(k+1)(k²−1)/144 are the classical no-tie moments
    // (documented approximation under ties — identical in both
    // engines), and z = (L−μ)/σ is one mirrored tree.
    Q("q_page_trend",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT event_type,
         |              CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) AS j
         |       FROM (SELECT DISTINCT event_type FROM daily)),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, ty.j, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |r AS (SELECT event_type, j,
         |             CAST(2 * rank() OVER (PARTITION BY x ORDER BY y)
         |               + count(*) OVER (PARTITION BY x, y) - 1 AS BIGINT) AS r2
         |      FROM grid),
         |rs AS (SELECT event_type, j, CAST(sum(r2) AS BIGINT) AS r2j
         |       FROM r GROUP BY 1, 2),
         |km AS (SELECT CAST(count(*) AS BIGINT) AS k,
         |              CAST(sum(j * r2j) AS BIGINT) AS l2 FROM rs),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dy)
         |SELECT nn.n AS n_days, km.k AS n_types,
         |       ${Q.sqlR6("km.l2 / 2.0")} AS l_stat,
         |       CASE WHEN km.k >= 3 AND nn.n >= 1 THEN
         |         ${Q.sqlR6("(km.l2 / 2.0 - nn.n * km.k * (km.k + 1) * (km.k + 1) / 4.0) / " +
                   "sqrt(nn.n * CAST(km.k AS DOUBLE) * km.k * (km.k + 1) * (km.k * km.k - 1) / 144.0)")}
         |       END AS z
         |FROM nn, km""".stripMargin) { (s, d) =>
      val daily = Inference.dailyCounts(s, d).transform(Q.snapshot)
      val ty = daily.select("event_type").distinct()
        .withColumn("j", row_number().over(Window.orderBy("event_type")).cast("long"))
      val dy = daily.select("x").distinct().transform(Q.snapshot)
      val grid = ty.crossJoin(broadcast(dy))
        .join(daily, Seq("event_type", "x"), "left")
        .select(col("event_type"), col("j"), col("x"), coalesce(col("y"), lit(0L)).as("y"))
        .transform(Q.snapshot)
      val r2 = (lit(2) * rank().over(Window.partitionBy("x").orderBy("y")) +
        count(lit(1)).over(Window.partitionBy("x", "y")) - 1).cast("long")
      val km = grid.withColumn("r2", r2)
        .groupBy("event_type", "j").agg(sum("r2").as("r2j"))
        .agg(count(lit(1)).as("k"), sum(col("j") * col("r2j")).as("l2"))
      val nn = dy.agg(count(lit(1)).as("n"))
      val lStat = col("l2") / lit(2.0)
      val mu = col("n") * col("k") * (col("k") + 1) * (col("k") + 1) / lit(4.0)
      val sg = sqrt(col("n") * col("k").cast("double") * col("k") * (col("k") + 1) *
        (col("k") * col("k") - 1) / lit(144.0))
      nn.crossJoin(broadcast(km))
        .select(col("n").as("n_days"), col("k").as("n_types"),
          Q.r6(lStat).as("l_stat"),
          when(col("k") >= 3 && col("n") >= 1, Q.r6((lStat - mu) / sg)).as("z"))
    },

    // Per-type periodogram over the daily count series (round 14): the
    // SPECTRAL complement of q_seasonality/q_acf — scan candidate
    // periods p = 2..14 days and report the one carrying the most
    // variance, plus the fraction it carries (1.0 = a pure sinusoid at
    // that period, ~0 = white noise). Exactness: the dense grid's
    // scaled residuals r = D·y − T are exact int64; cos/sin weights
    // floor onto the 1e-6 lattice per (p, residue) angle — 104 fixed
    // rational angles, none within 1e-3 of a rounding boundary
    // (CurationSeriesSpec guards this), so both engines lattice
    // identically — and A = Σ sr·c6, B = Σ sr·s6 are order-free int64
    // folds. The residue trick makes the scan O(grid·13), never
    // O(days²): cos(2πd/p) depends only on d mod p, so residue-class
    // sums collapse the series before any trig touches it.
    Q("q_periodogram",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS dd,
         |              CAST(sum(y) AS BIGINT) AS tt FROM grid GROUP BY 1),
         |r AS (SELECT g.event_type, g.x, CAST(st.dd * g.y - st.tt AS BIGINT) AS r, st.dd
         |      FROM grid g JOIN st USING (event_type)),
         |ss AS (SELECT event_type, CAST(sum(r * r) AS BIGINT) AS ssr FROM r GROUP BY 1),
         |rs AS (SELECT event_type, dd, p, x % p AS res, CAST(sum(r) AS BIGINT) AS sr
         |       FROM r CROSS JOIN (SELECT CAST(range AS BIGINT) AS p FROM range(2, 15))
         |       GROUP BY 1, 2, 3, 4),
         |w AS (SELECT event_type, dd, p, sr,
         |             CAST(floor(cos(2 * pi() * res / p) * 1e6 + 0.5) AS BIGINT) AS c6,
         |             CAST(floor(sin(2 * pi() * res / p) * 1e6 + 0.5) AS BIGINT) AS s6
         |      FROM rs),
         |ab AS (SELECT event_type, p, CAST(max(dd) AS BIGINT) AS dd,
         |              CAST(sum(sr * c6) AS BIGINT) AS a6,
         |              CAST(sum(sr * s6) AS BIGINT) AS b6
         |       FROM w GROUP BY 1, 2),
         |fr AS (SELECT ab.event_type, p, dd, ssr,
         |              CASE WHEN ssr > 0 THEN
         |                (CAST(a6 AS DOUBLE) * a6 + CAST(b6 AS DOUBLE) * b6) * 2 /
         |                  (1e12 * dd * ssr) END AS frac
         |       FROM ab JOIN ss USING (event_type)),
         |top AS (SELECT *, row_number() OVER (PARTITION BY event_type
         |                    ORDER BY frac DESC NULLS LAST, p) AS rn FROM fr)
         |SELECT event_type,
         |       CASE WHEN ssr > 0 THEN p END AS best_period,
         |       dd AS n_days,
         |       CASE WHEN ssr > 0 THEN ${Q.sqlR6("frac")} END AS spectral_frac
         |FROM top WHERE rn = 1
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      periodogramOf(Inference.dailyCounts(s, d))
    },

    // Quade test over the q_friedman block design (round 15): the
    // weighted within-block rank test — each day's within-day ranks
    // are weighted by the RANK OF THE DAY'S RANGE across days, so
    // high-signal days (big spread between types) dominate where
    // Friedman counts every day equally; the more powerful k-sample
    // test when effects scale with block level. Exactness: within-day
    // ranks ride the shared 2·avgrank ints (r2 = 2R), day weights the
    // same doubled-midrank trick over the |days|-row range frame
    // (q2 = 2Q), so S2 = q2·(r2−(k+1)) = 4·Q·(R−(k+1)/2) is exact
    // int64 and F = (n−1)·ΣT_j² / (n·ΣS2² − ΣT_j²) is one mirrored
    // IEEE tree over three exact int64 sums (all calendar-bounded:
    // S2 ≤ 4nk). The range-rank window consumes the |days|-row
    // aggregate frame — never the corpus.
    Q("q_quade",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |r AS (SELECT event_type, x,
         |             CAST(2 * rank() OVER (PARTITION BY x ORDER BY y)
         |               + count(*) OVER (PARTITION BY x, y) - 1 AS BIGINT) AS r2
         |      FROM grid),
         |rg AS (SELECT x, CAST(max(y) - min(y) AS BIGINT) AS rng FROM grid GROUP BY 1),
         |qw AS (SELECT x, CAST(2 * rank() OVER (ORDER BY rng)
         |               + count(*) OVER (PARTITION BY rng) - 1 AS BIGINT) AS q2
         |       FROM rg),
         |km AS (SELECT CAST(count(*) AS BIGINT) AS k FROM ty),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dy),
         |sx AS (SELECT r.event_type, CAST(qw.q2 * (r.r2 - (km.k + 1)) AS BIGINT) AS s2
         |       FROM r JOIN qw USING (x), km),
         |tj AS (SELECT event_type, CAST(sum(s2) AS BIGINT) AS tj,
         |              CAST(sum(s2 * s2) AS BIGINT) AS a2
         |       FROM sx GROUP BY 1),
         |ag AS (SELECT CAST(sum(tj * tj) AS BIGINT) AS b16,
         |              CAST(sum(a2) AS BIGINT) AS a16 FROM tj)
         |SELECT nn.n AS n_days, km.k AS n_types,
         |       CASE WHEN nn.n * ag.a16 - ag.b16 > 0 THEN
         |         ${Q.sqlR6("(nn.n - 1) * CAST(ag.b16 AS DOUBLE) / (nn.n * ag.a16 - ag.b16)")}
         |       END AS quade_f
         |FROM nn, km, ag""".stripMargin) { (s, d) =>
      quadeOf(Inference.dailyCounts(s, d))
    },

    // Cronbach's alpha over the day×type block design (round 15):
    // treating the event types as ITEMS and the days as CASES, α =
    // k/(k−1)·(1 − Σᵢσᵢ²/σ_total²) asks whether the types move
    // TOGETHER day to day — the internal-consistency number behind
    // q_kendall_w's rank concordance (α reads covariance structure
    // the rank test flattens; α < 0 = types anti-move). Exactness:
    // every variance clears its fraction as n·Σy² − (Σy)² — exact
    // int64 on the dense grid (vt ≈ n²·Σsd², int64 to sf ≈ 500) —
    // and α is ONE mirrored IEEE tree over two exact integers. Scale:
    // two grid aggs (type-keyed, day-keyed), single-row output.
    Q("q_cronbach_alpha",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |iv AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(vi) AS BIGINT) AS sv
         |       FROM (SELECT event_type,
         |                    CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS BIGINT) AS vi
         |             FROM grid GROUP BY 1)),
         |tv AS (SELECT CAST(count(*) * sum(sd * sd) - sum(sd) * sum(sd) AS BIGINT) AS vt
         |       FROM (SELECT x, CAST(sum(y) AS BIGINT) AS sd FROM grid GROUP BY 1)),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dy)
         |SELECT nn.n AS n_days, iv.k AS n_types,
         |       CASE WHEN iv.k >= 2 AND tv.vt > 0 THEN
         |         ${Q.sqlR6("iv.k / (iv.k - 1.0) * (1 - CAST(iv.sv AS DOUBLE) / tv.vt)")}
         |       END AS alpha
         |FROM nn, iv, tv""".stripMargin) { (s, d) =>
      cronbachOf(Inference.dailyCounts(s, d))
    },

    // One-way intraclass correlation ICC(1,1) over the day×type block
    // design (round 15): targets = days, measurements = types — how
    // much of the hourly-volume variance is BETWEEN days versus noise
    // within a day; the absolute-agreement companion of
    // q_cronbach_alpha's consistency (α is blind to a constant offset
    // between types; ICC is not). Exactness: both mean squares clear
    // their fractions — MSB rides A = Σ(n·s_d − S)², MSW rides
    // B = Σ(k·y − s_d)², both exact int64 on the dense grid — and
    // ICC = (MSB−MSW)/(MSB+(k−1)·MSW) is one mirrored IEEE tree.
    // ICC ∈ [−1/(k−1), 1]. Two grid aggs, single-row output.
    Q("q_icc",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |ds AS (SELECT x, CAST(sum(y) AS BIGINT) AS sd FROM grid GROUP BY 1),
         |km AS (SELECT CAST(count(*) AS BIGINT) AS k FROM ty),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dy),
         |tot AS (SELECT CAST(sum(sd) AS BIGINT) AS s FROM ds),
         |aa AS (SELECT CAST(sum((nn.n * sd - tot.s) * (nn.n * sd - tot.s)) AS BIGINT) AS a
         |       FROM ds, nn, tot),
         |bb AS (SELECT CAST(sum((km.k * g.y - ds.sd) * (km.k * g.y - ds.sd)) AS BIGINT) AS b
         |       FROM grid g JOIN ds ON g.x = ds.x, km)
         |SELECT nn.n AS n_days, km.k AS n_types,
         |       CASE WHEN nn.n >= 2 AND km.k >= 2 THEN
         |         ${Q.sqlR6("CAST(aa.a AS DOUBLE) / (km.k * nn.n * nn.n * (nn.n - 1))")} END AS msb,
         |       CASE WHEN nn.n >= 2 AND km.k >= 2 THEN
         |         ${Q.sqlR6("CAST(bb.b AS DOUBLE) / (km.k * km.k * nn.n * (km.k - 1))")} END AS msw,
         |       CASE WHEN nn.n >= 2 AND km.k >= 2 AND
         |         CAST(aa.a AS DOUBLE) / (km.k * nn.n * nn.n * (nn.n - 1)) +
         |         (km.k - 1) * (CAST(bb.b AS DOUBLE) / (km.k * km.k * nn.n * (km.k - 1))) > 0 THEN
         |         ${Q.sqlR6(
                   "(CAST(aa.a AS DOUBLE) / (km.k * nn.n * nn.n * (nn.n - 1)) - " +
                   "CAST(bb.b AS DOUBLE) / (km.k * km.k * nn.n * (km.k - 1))) / " +
                   "(CAST(aa.a AS DOUBLE) / (km.k * nn.n * nn.n * (nn.n - 1)) + " +
                   "(km.k - 1) * (CAST(bb.b AS DOUBLE) / (km.k * km.k * nn.n * (km.k - 1))))")}
         |       END AS icc
         |FROM nn, km, aa, bb""".stripMargin) { (s, d) =>
      iccOf(Inference.dailyCounts(s, d))
    },

    // Yule–Walker AR(2) fit of per-type daily volume (round 15): the
    // second-order extension of q_ar1 — φ₁ = r₁(1−r₂)/(1−r₁²),
    // φ₂ = (r₂−r₁²)/(1−r₁²) from the lag-1/lag-2 autocorrelations,
    // which separates momentum from oscillation (φ₂ < 0: overshoot-
    // and-correct dynamics q_ar1's single pole cannot express).
    // Exactness: on the DENSE zero-filled grid the scaled residual
    // r_d = n·y_d − s is exact int64, every lag cross-sum is exact
    // int64 (c_k expanded as n²·p_k − n·s·(a_k+b_k) + (n−k)·s² — the
    // q_acf clearing), and both φ reduce to integer-ratio trees:
    // φ₁ = c₁(c₀−c₂)/(c₀²−c₁²), φ₂ = (c₂c₀−c₁²)/(c₀²−c₁²), with the
    // quadratic products taken in doubles OVER EXACT INT64 (identical
    // IEEE both engines; c₀ ≈ n²·Σy² holds int64 to sf ≈ 800 — n is
    // the CALENDAR, only cell counts grow). One grid pass, two
    // type-partitioned leads, |types|-row output.
    Q("q_yule_walker",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |ld AS (SELECT event_type, y,
         |              lead(y, 1) OVER (PARTITION BY event_type ORDER BY x) AS y1,
         |              lead(y, 2) OVER (PARTITION BY event_type ORDER BY x) AS y2
         |       FROM grid),
         |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |              CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS ss,
         |              CAST(sum(CASE WHEN y1 IS NOT NULL THEN y * y1 END) AS BIGINT) AS p1,
         |              CAST(sum(CASE WHEN y1 IS NOT NULL THEN y END) AS BIGINT) AS a1,
         |              CAST(sum(y1) AS BIGINT) AS b1,
         |              CAST(sum(CASE WHEN y2 IS NOT NULL THEN y * y2 END) AS BIGINT) AS p2,
         |              CAST(sum(CASE WHEN y2 IS NOT NULL THEN y END) AS BIGINT) AS a2,
         |              CAST(sum(y2) AS BIGINT) AS b2
         |       FROM ld GROUP BY 1),
         |c AS (SELECT event_type, n,
         |             CAST(n * n * ss - n * s * s AS BIGINT) AS c0,
         |             CAST(n * n * p1 - n * s * (a1 + b1) + (n - 1) * s * s AS BIGINT) AS c1,
         |             CAST(n * n * p2 - n * s * (a2 + b2) + (n - 2) * s * s AS BIGINT) AS c2
         |      FROM st)
         |SELECT event_type, n AS n_days,
         |       CASE WHEN c0 > 0 THEN ${Q.sqlR6("CAST(c1 AS DOUBLE) / c0")} END AS r1,
         |       CASE WHEN c0 > 0 THEN ${Q.sqlR6("CAST(c2 AS DOUBLE) / c0")} END AS r2,
         |       CASE WHEN CAST(c0 AS DOUBLE) * c0 - CAST(c1 AS DOUBLE) * c1 > 0 THEN
         |         ${Q.sqlR6("CAST(c1 AS DOUBLE) * (c0 - c2) / (CAST(c0 AS DOUBLE) * c0 - CAST(c1 AS DOUBLE) * c1)")}
         |       END AS phi1,
         |       CASE WHEN CAST(c0 AS DOUBLE) * c0 - CAST(c1 AS DOUBLE) * c1 > 0 THEN
         |         ${Q.sqlR6("(CAST(c2 AS DOUBLE) * c0 - CAST(c1 AS DOUBLE) * c1) / (CAST(c0 AS DOUBLE) * c0 - CAST(c1 AS DOUBLE) * c1)")}
         |       END AS phi2
         |FROM c
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      yuleWalkerOf(Inference.dailyCounts(s, d))
    },

    // Permutation entropy of per-type daily volume (round 15,
    // Bandt–Pompe, order m = 3): classify every 3-consecutive-day
    // window by its ORDINAL pattern (which of the 6 orderings the
    // triple realizes, ties to the earlier day — the stable
    // convention) and report the normalized Shannon entropy of the
    // pattern distribution — the complexity screen that is invariant
    // to any monotone transform of the level (q_spectral_entropy sees
    // amplitude; this sees only shape): H → 0 = one repeated shape
    // (trend/cycle), H → 1 = patternless. Exactness: the pattern
    // index is ONE mirrored 5-arm CASE over integer comparisons
    // (disjoint by trichotomy — arm order can't matter), counts are
    // int64 off a (type, pattern ≤ 6) agg, each cell's (c/m)·ln(m/c)
    // integer-scales to 1e-9 before the ≤6-term fold, and ln 6 is an
    // IEEE literal. Two type-partitioned leads, 6-row frames after.
    Q("q_perm_entropy",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |ld AS (SELECT event_type, y,
         |              lead(y, 1) OVER (PARTITION BY event_type ORDER BY x) AS y1,
         |              lead(y, 2) OVER (PARTITION BY event_type ORDER BY x) AS y2
         |       FROM grid),
         |pt AS (SELECT event_type,
         |              CASE WHEN y <= y1 AND y1 <= y2 THEN 0
         |                   WHEN y <= y2 AND y2 < y1 THEN 1
         |                   WHEN y1 < y AND y <= y2 THEN 2
         |                   WHEN y1 <= y2 AND y2 < y THEN 3
         |                   WHEN y2 < y AND y <= y1 THEN 4
         |                   ELSE 5 END AS pat
         |       FROM ld WHERE y2 IS NOT NULL),
         |c AS (SELECT event_type, pat, CAST(count(*) AS BIGINT) AS c FROM pt GROUP BY 1, 2),
         |t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS m,
         |             CAST(max(c) AS BIGINT) AS mx FROM c GROUP BY 1),
         |e AS (SELECT c.event_type,
         |             CAST(sum(CAST(floor(CAST(c.c AS DOUBLE) / t.m *
         |               ln(CAST(t.m AS DOUBLE) / c.c) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS h9
         |      FROM c JOIN t USING (event_type) GROUP BY 1),
         |tp AS (SELECT event_type, CAST(min(pat) AS BIGINT) AS top_pattern
         |       FROM c JOIN t USING (event_type) WHERE c.c = t.mx GROUP BY 1)
         |SELECT t.event_type, t.m AS n_triples,
         |       ${Q.sqlR6("h9 / 1e9 / 1.791759469228055")} AS perm_entropy,
         |       tp.top_pattern
         |FROM t JOIN e USING (event_type) JOIN tp USING (event_type)
         |ORDER BY t.event_type""".stripMargin) { (s, d) =>
      permEntropyOf(Inference.dailyCounts(s, d))
    },

    // Normalized spectral entropy of per-type daily volume (round 15):
    // the PREDICTABILITY screen over q_periodogram's spectrum — H =
    // −Σ p_k ln p_k / ln(13) over the 13 candidate-period powers
    // (p = 2..14), plus the peak share. H → 0: one period carries all
    // the variance (a pure cycle — forecastable); H → 1: flat spectrum
    // (white noise — don't bother fitting q_holt_winters). Exactness:
    // each period's variance share rides the SAME one-IEEE-tree `frac`
    // as q_periodogram, floors onto a 1e-6 lattice per (type, period)
    // row, so the normalizer tot6 is an order-free int64 sum; each
    // entropy term then floors onto the 1e-9 lattice before the
    // 13-term fold (the q_cat_entropy move), and the ln(13) normalizer
    // is an IEEE literal in both engines. Scale: everything below the
    // daily grid is a 13-row-per-type frame.
    Q("q_spectral_entropy",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS dd,
         |              CAST(sum(y) AS BIGINT) AS tt FROM grid GROUP BY 1),
         |r AS (SELECT g.event_type, g.x, CAST(st.dd * g.y - st.tt AS BIGINT) AS r, st.dd
         |      FROM grid g JOIN st USING (event_type)),
         |ss AS (SELECT event_type, CAST(sum(r * r) AS BIGINT) AS ssr FROM r GROUP BY 1),
         |rs AS (SELECT event_type, dd, p, x % p AS res, CAST(sum(r) AS BIGINT) AS sr
         |       FROM r CROSS JOIN (SELECT CAST(range AS BIGINT) AS p FROM range(2, 15))
         |       GROUP BY 1, 2, 3, 4),
         |w AS (SELECT event_type, dd, p, sr,
         |             CAST(floor(cos(2 * pi() * res / p) * 1e6 + 0.5) AS BIGINT) AS c6,
         |             CAST(floor(sin(2 * pi() * res / p) * 1e6 + 0.5) AS BIGINT) AS s6
         |      FROM rs),
         |ab AS (SELECT event_type, p, CAST(max(dd) AS BIGINT) AS dd,
         |              CAST(sum(sr * c6) AS BIGINT) AS a6,
         |              CAST(sum(sr * s6) AS BIGINT) AS b6
         |       FROM w GROUP BY 1, 2),
         |fr AS (SELECT ab.event_type, p, dd, ssr,
         |              CASE WHEN ssr > 0 THEN
         |                (CAST(a6 AS DOUBLE) * a6 + CAST(b6 AS DOUBLE) * b6) * 2 /
         |                  (1e12 * dd * ssr) END AS frac
         |       FROM ab JOIN ss USING (event_type)),
         |f AS (SELECT event_type, dd,
         |             CASE WHEN ssr > 0 THEN CAST(floor(frac * 1e6 + 0.5) AS BIGINT)
         |                  ELSE 0 END AS f6
         |      FROM fr),
         |t AS (SELECT event_type, CAST(max(dd) AS BIGINT) AS dd,
         |             CAST(sum(f6) AS BIGINT) AS tot6, CAST(max(f6) AS BIGINT) AS mx6
         |      FROM f GROUP BY 1),
         |e AS (SELECT f.event_type,
         |             CASE WHEN f.f6 > 0 AND t.tot6 > 0 THEN
         |               CAST(floor(CAST(f.f6 AS DOUBLE) / t.tot6 *
         |                 ln(CAST(t.tot6 AS DOUBLE) / f.f6) * 1e9 + 0.5) AS BIGINT)
         |             ELSE 0 END AS e9
         |      FROM f JOIN t USING (event_type)),
         |h AS (SELECT event_type, CAST(sum(e9) AS BIGINT) AS h9 FROM e GROUP BY 1)
         |SELECT t.event_type, t.dd AS n_days,
         |       CASE WHEN t.tot6 > 0 THEN
         |         ${Q.sqlR6("h9 / 1e9 / 2.5649493574615367")} END AS spectral_entropy,
         |       CASE WHEN t.tot6 > 0 THEN
         |         ${Q.sqlR6("CAST(mx6 AS DOUBLE) / tot6")} END AS peak_share
         |FROM t JOIN h USING (event_type)
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      spectralEntropyOf(Inference.dailyCounts(s, d))
    },

    // Sample entropy (m = 2, r = 0.2σ) of per-type daily volume
    // (round 16): the regularity screen — B counts length-2 template
    // pairs within Chebyshev tolerance r, A the length-3 survivors;
    // SampEn = ln(B/A). Low = the series repeats itself (forecast
    // it); high = irregular. Templates ride the DENSE grid (missing
    // days are real zeros — the q_perm_entropy convention); the pair
    // frame is |days|² per type, the accepted calendar-bounded
    // q_matrix_profile class, never corpus-scaled. Exactness: A and B
    // are pure INTEGER counts; the only float is the tolerance r =
    // 0.2·sqrt((n·Σy²−S²))/n — ONE identical IEEE tree in both
    // engines, so every |Δ| ≤ r comparison lands the same side.
    Q("q_sampen",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |              CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS q
         |       FROM grid GROUP BY 1),
         |rr AS (SELECT event_type, n,
         |              0.2 * sqrt(CAST(n * q - s * s AS DOUBLE)) / n AS r
         |       FROM st),
         |sub AS (SELECT g.event_type, g.x AS i, g.y AS a0,
         |               lead(g.y, 1) OVER (PARTITION BY g.event_type ORDER BY g.x) AS a1,
         |               lead(g.y, 2) OVER (PARTITION BY g.event_type ORDER BY g.x) AS a2
         |        FROM grid g),
         |b2 AS (SELECT a.event_type, CAST(count(*) AS BIGINT) AS b
         |       FROM sub a JOIN sub b ON a.event_type = b.event_type AND a.i < b.i
         |       JOIN rr ON rr.event_type = a.event_type
         |       WHERE a.a1 IS NOT NULL AND b.a1 IS NOT NULL
         |         AND abs(a.a0 - b.a0) <= rr.r AND abs(a.a1 - b.a1) <= rr.r
         |       GROUP BY 1),
         |a3 AS (SELECT a.event_type, CAST(count(*) AS BIGINT) AS a
         |       FROM sub a JOIN sub b ON a.event_type = b.event_type AND a.i < b.i
         |       JOIN rr ON rr.event_type = a.event_type
         |       WHERE a.a2 IS NOT NULL AND b.a2 IS NOT NULL
         |         AND abs(a.a0 - b.a0) <= rr.r AND abs(a.a1 - b.a1) <= rr.r
         |                                      AND abs(a.a2 - b.a2) <= rr.r
         |       GROUP BY 1)
         |SELECT rr.event_type, rr.n AS n_days, ${Q.sqlR6("rr.r")} AS r,
         |       CAST(coalesce(b2.b, 0) AS BIGINT) AS b_pairs,
         |       CAST(coalesce(a3.a, 0) AS BIGINT) AS a_pairs,
         |       CASE WHEN coalesce(a3.a, 0) > 0 AND coalesce(b2.b, 0) > 0
         |         THEN ${Q.sqlR6("ln(CAST(b2.b AS DOUBLE) / a3.a)")} END AS sampen
         |FROM rr
         |LEFT JOIN b2 ON rr.event_type = b2.event_type
         |LEFT JOIN a3 ON rr.event_type = a3.event_type
         |ORDER BY rr.event_type""".stripMargin) { (s, d) =>
      sampenOf(Inference.dailyCounts(s, d))
    },

    // Theta-method one-step forecast of per-type daily volume (round
    // 16): the M3-winning baseline — decompose into the exact linear
    // trend (closed-form from int64 moment sums) and the theta = 2
    // line ℓ_t = 2y_t − (a + b·x_t), smooth ℓ with SES (α = 0.2,
    // seeded at the first value — ONE left-to-right float fold per
    // type, the q_burst_detect shape), and combine: ŷ(next) =
    // (ses + a + b·x_next)/2. The dense grid supplies real zeros for
    // missing days; the trend and the collect_list arrive in the SAME
    // per-type agg, so there is exactly one fold pass. Oracle runs the
    // identical recursion as a recursive CTE — costs agree to the bit.
    Q("q_theta_forecast",
      s"""WITH RECURSIVE daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |              CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx,
         |              CAST(max(x) AS BIGINT) AS xmax
         |       FROM grid GROUP BY 1),
         |ab AS (SELECT event_type, n, xmax,
         |              CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - CAST(sx AS DOUBLE) * sx) AS b,
         |              (sy - CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - CAST(sx AS DOUBLE) * sx) * sx) / n AS a
         |       FROM st WHERE n >= 2 AND n * sxx - sx * sx > 0),
         |seq AS (SELECT g.event_type, g.x, g.y, ab.a, ab.b, ab.n, ab.xmax,
         |               CAST(row_number() OVER (PARTITION BY g.event_type ORDER BY g.x) AS BIGINT) AS rn
         |        FROM grid g JOIN ab ON g.event_type = ab.event_type),
         |rec AS (SELECT event_type, rn, a, b, n, xmax,
         |               2 * y - (a + b * x) AS ses
         |        FROM seq WHERE rn = 1
         |        UNION ALL
         |        SELECT s.event_type, s.rn, s.a, s.b, s.n, s.xmax,
         |               0.2 * (2 * s.y - (s.a + s.b * s.x)) + 0.8 * r.ses
         |        FROM rec r JOIN seq s ON s.event_type = r.event_type AND s.rn = r.rn + 1)
         |SELECT event_type, n AS n_days,
         |       ${Q.sqlR6("a")} AS trend_a, ${Q.sqlR6("b")} AS trend_b,
         |       ${Q.sqlR6("ses")} AS ses_theta,
         |       ${Q.sqlR6("(ses + a + b * (xmax + 1)) / 2")} AS forecast_next
         |FROM rec
         |WHERE rn = n
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      thetaForecastOf(Inference.dailyCounts(s, d))
    },

    // Rolling-origin one-step forecast backtest (round 16): the
    // evaluation harness every forecasting family above feeds into —
    // for each day past the first week, score three baseline
    // forecasters (naive = lag-1, seasonal-naive = lag-7, ma7 = the
    // trailing 7-day mean) against the realized count, per event type.
    // All error sums are EXACT int64 (the ma7 residual is scaled by 7
    // so the rational mean never materializes as a float before the
    // readout); the winner ladder compares cross-multiplied integer
    // sums, so "best" never depends on float division. Ties resolve
    // naive > snaive > ma7 (the cheaper model wins a tie).
    Q("q_backtest_naive",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |w AS (SELECT event_type, x, y,
         |             CAST(row_number() OVER (PARTITION BY event_type ORDER BY x) AS BIGINT) AS rn,
         |             lag(y, 1) OVER (PARTITION BY event_type ORDER BY x) AS fn,
         |             lag(y, 7) OVER (PARTITION BY event_type ORDER BY x) AS fs,
         |             sum(y) OVER (PARTITION BY event_type ORDER BY x
         |                          ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS m7
         |      FROM grid),
         |e AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(abs(y - fn)) AS BIGINT) AS sn,
         |             CAST(sum(abs(y - fs)) AS BIGINT) AS ss,
         |             CAST(sum(abs(7 * y - m7)) AS BIGINT) AS sm
         |      FROM w WHERE rn >= 8 GROUP BY 1)
         |SELECT ty.event_type, CAST(COALESCE(e.n, 0) AS BIGINT) AS n_evals,
         |       ${Q.sqlR4("CAST(e.sn AS DOUBLE) / e.n")} AS mae_naive,
         |       ${Q.sqlR4("CAST(e.ss AS DOUBLE) / e.n")} AS mae_snaive,
         |       ${Q.sqlR4("CAST(e.sm AS DOUBLE) / (7.0 * e.n)")} AS mae_ma7,
         |       CASE WHEN e.n IS NULL THEN NULL
         |            WHEN 7 * e.sn <= e.sm AND e.sn <= e.ss THEN 'naive'
         |            WHEN 7 * e.ss <= e.sm THEN 'snaive'
         |            ELSE 'ma7' END AS best
         |FROM ty LEFT JOIN e ON ty.event_type = e.event_type
         |ORDER BY ty.event_type""".stripMargin) { (s, d) =>
      backtestNaiveOf(Inference.dailyCounts(s, d))
    },

    // MACD trend indicator on per-type daily volume (round 16): the
    // EMA(12) − EMA(26) convergence-divergence line with its EMA(9)
    // signal and histogram, plus the signal-crossover count — the
    // classic momentum readout in TWO left-to-right folds per type
    // (the q_theta_forecast shape): pass 1 carries the twin EMAs and
    // emits the per-day MACD array; pass 2 folds (signal, prev hist
    // sign, crossings) over that array. Both EMAs seed at the first
    // day's count, so the first MACD is exactly 0.0 and seeds the
    // signal; the oracle replays the identical recursion (EMA step,
    // then signal step on the subtracted MACD) as a recursive CTE —
    // every float agrees to the bit because the operation ORDER is
    // mirrored, not just the formulas. Crossings count strict sign
    // flips of the histogram (zero days carry the previous sign).
    Q("q_macd",
      s"""WITH RECURSIVE daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |seq AS (SELECT event_type, x, CAST(y AS DOUBLE) AS y,
         |               CAST(row_number() OVER (PARTITION BY event_type ORDER BY x) AS BIGINT) AS rn,
         |               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
         |        FROM grid),
         |rec AS (SELECT event_type, rn, n, y AS e12, y AS e26,
         |               CAST(0 AS DOUBLE) AS sig, CAST(0 AS BIGINT) AS ps,
         |               CAST(0 AS BIGINT) AS cr
         |        FROM seq WHERE rn = 1
         |        UNION ALL
         |        SELECT event_type, rn, n, e12, e26, sig,
         |               CASE WHEN hist > 0 THEN 1 WHEN hist < 0 THEN -1 ELSE ps END,
         |               cr + CASE WHEN ps <> 0 AND hist <> 0 AND
         |                 (CASE WHEN hist > 0 THEN 1 ELSE -1 END) <> ps THEN 1 ELSE 0 END
         |        FROM (SELECT event_type, rn, n, e12, e26, sig, ps, cr,
         |                     e12 - e26 - sig AS hist
         |              FROM (SELECT event_type, rn, n, e12, e26,
         |                           sig + 2.0 / 10 * (e12 - e26 - sig) AS sig, ps, cr
         |                    FROM (SELECT s.event_type, s.rn, s.n,
         |                                 r.e12 + 2.0 / 13 * (s.y - r.e12) AS e12,
         |                                 r.e26 + 2.0 / 27 * (s.y - r.e26) AS e26,
         |                                 r.sig AS sig, r.ps AS ps, r.cr AS cr
         |                          FROM rec r JOIN seq s
         |                            ON s.event_type = r.event_type AND s.rn = r.rn + 1) i1) i2) i3)
         |SELECT event_type, n AS n_days,
         |       ${Q.sqlR6("e12")} AS ema12, ${Q.sqlR6("e26")} AS ema26,
         |       ${Q.sqlR6("e12 - e26")} AS macd, ${Q.sqlR6("sig")} AS signal,
         |       ${Q.sqlR6("e12 - e26 - sig")} AS hist, cr AS n_cross
         |FROM rec WHERE rn = n
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      macdOf(Inference.dailyCounts(s, d))
    },

    // Iterative 3-sigma clipping of per-type daily volume (round 16):
    // the robust-mean workhorse every telemetry pipeline runs before
    // trusting an average — three rounds of recomputing (mean, sd)
    // over survivors and dropping days with |y − mean| > 3·sd. The
    // survivor predicate is cross-multiplied so the integer side
    // stays exact: |n·y − s| ≤ 3·n·sd with sd from the int64
    // (n, Σy, Σy²) moments — one identical IEEE tree per round in
    // both engines; zero-variance and n < 2 rounds keep everything.
    // Three bounded rounds over the calendar-bounded grid — each a
    // broadcast join of a 5-row stats frame, never a shuffle of the
    // corpus.
    Q("q_sigma_clip",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |r0 AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |       FROM ty CROSS JOIN dy
         |       LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |t1 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |              CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS q
         |       FROM r0 GROUP BY 1),
         |r1 AS (SELECT r0.* FROM r0 JOIN t1 ON r0.event_type = t1.event_type
         |       WHERE t1.n < 2 OR t1.n * t1.q - t1.s * t1.s <= 0 OR
         |             abs(t1.n * r0.y - t1.s) <= 3.0 * t1.n *
         |               sqrt(CAST(t1.n * t1.q - t1.s * t1.s AS DOUBLE) /
         |                    (CAST(t1.n AS DOUBLE) * (t1.n - 1)))),
         |t2 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |              CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS q
         |       FROM r1 GROUP BY 1),
         |r2 AS (SELECT r1.* FROM r1 JOIN t2 ON r1.event_type = t2.event_type
         |       WHERE t2.n < 2 OR t2.n * t2.q - t2.s * t2.s <= 0 OR
         |             abs(t2.n * r1.y - t2.s) <= 3.0 * t2.n *
         |               sqrt(CAST(t2.n * t2.q - t2.s * t2.s AS DOUBLE) /
         |                    (CAST(t2.n AS DOUBLE) * (t2.n - 1)))),
         |t3 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |              CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS q
         |       FROM r2 GROUP BY 1),
         |r3 AS (SELECT r2.* FROM r2 JOIN t3 ON r2.event_type = t3.event_type
         |       WHERE t3.n < 2 OR t3.n * t3.q - t3.s * t3.s <= 0 OR
         |             abs(t3.n * r2.y - t3.s) <= 3.0 * t3.n *
         |               sqrt(CAST(t3.n * t3.q - t3.s * t3.s AS DOUBLE) /
         |                    (CAST(t3.n AS DOUBLE) * (t3.n - 1)))),
         |f AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS q
         |      FROM r3 GROUP BY 1)
         |SELECT t1.event_type, t1.n AS n_days,
         |       t2.n AS kept_r1, t3.n AS kept_r2, f.n AS kept_r3,
         |       t1.n - f.n AS n_clipped,
         |       ${Q.sqlR4("CAST(f.s AS DOUBLE) / f.n")} AS clipped_mean,
         |       CASE WHEN f.n >= 2 AND f.n * f.q - f.s * f.s > 0 THEN
         |         ${Q.sqlR6("sqrt(CAST(f.n * f.q - f.s * f.s AS DOUBLE) / " +
                   "(CAST(f.n AS DOUBLE) * (f.n - 1)))")}
         |       END AS clipped_sd
         |FROM t1 JOIN t2 ON t1.event_type = t2.event_type
         |JOIN t3 ON t1.event_type = t3.event_type
         |JOIN f ON t1.event_type = f.event_type
         |ORDER BY t1.event_type""".stripMargin) { (s, d) =>
      sigmaClipOf(Inference.dailyCounts(s, d))
    },

    // Empirical prediction interval for the naive forecast (round 16):
    // the uncertainty companion to q_backtest_naive — per type, the
    // exact p10/p90 of the historical one-step naive residuals
    // (y_t − y_{t−1}) give the 80% interval around the next-day naive
    // forecast y_last. PURE int64 end to end: residuals are integer
    // count diffs collapsed onto a (type, resid, count) grid, the
    // percentiles are first integer crossings (cum·10 ≥ n / ≥ 9n — no
    // float percentile semantics), and the interval is integer
    // addition. The residual grid is bounded by distinct diffs ≤
    // calendar days per type.
    Q("q_forecast_interval",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |ls AS (SELECT event_type, CAST(arg_max(y, x) AS BIGINT) AS y_last FROM grid GROUP BY 1),
         |rs AS (SELECT event_type,
         |              y - lag(y) OVER (PARTITION BY event_type ORDER BY x) AS e
         |       FROM grid),
         |rg AS (SELECT event_type, e, CAST(count(*) AS BIGINT) AS c
         |       FROM rs WHERE e IS NOT NULL GROUP BY 1, 2),
         |cu AS (SELECT event_type, e, c,
         |              CAST(sum(c) OVER (PARTITION BY event_type ORDER BY e) AS BIGINT) AS cum,
         |              CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
         |       FROM rg),
         |pq AS (SELECT event_type, max(n) AS n_resid,
         |              CAST(min(CASE WHEN cum * 10 >= n THEN e END) AS BIGINT) AS p10,
         |              CAST(min(CASE WHEN cum * 10 >= 9 * n THEN e END) AS BIGINT) AS p90
         |       FROM cu GROUP BY 1)
         |SELECT pq.event_type, pq.n_resid, pq.p10 AS p10_resid, pq.p90 AS p90_resid,
         |       ls.y_last AS forecast_naive,
         |       ls.y_last + pq.p10 AS pi_lo, ls.y_last + pq.p90 AS pi_hi
         |FROM pq JOIN ls ON pq.event_type = ls.event_type
         |ORDER BY pq.event_type""".stripMargin) { (s, d) =>
      forecastIntervalOf(Inference.dailyCounts(s, d))
    },

    // Banded dynamic-time-warping distance between event-type pairs
    // (round 16): DTW with a Sakoe–Chiba band of halfwidth 7 over the
    // dense daily count series — which activity curves are the same
    // shape, time-shift tolerated up to a week. The DP is PURE int64
    // (|Δcount| costs, min/+ only, INF = 1e15 sentinel capped per
    // cell), so the two engines' different evaluation strategies
    // (Spark: one prev-row fold per pair, O(n·w²) with O(w) state;
    // oracle: a linear band-index recursive CTE) must agree to the
    // last bit. Alignment gain = L1 − DTW ≥ 0 quantifies what warping
    // buys (the diagonal path IS the L1). The band is the scale
    // story: O(n·w) cells per pair on the calendar-bounded grid,
    // never the full n² DP, and the pair frame is |types|² — both
    // domain-bounded.
    Q("q_dtw",
      s"""WITH RECURSIVE daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |ta AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |              list(y ORDER BY x) AS ys
         |       FROM grid GROUP BY 1),
         |pr AS (SELECT a.event_type AS t1, b.event_type AS t2, a.n,
         |              a.ys AS av, b.ys AS bv
         |       FROM ta a JOIN ta b ON a.event_type < b.event_type),
         |rec AS (SELECT t1, t2, n, av, bv, CAST(0 AS BIGINT) AS k,
         |               [CASE WHEN 0 - 7 < 0 THEN CAST(1000000000000000 AS BIGINT)
         |                     ELSE abs(av[1] - bv[1]) END] AS dp
         |        FROM pr
         |        UNION ALL
         |        SELECT t1, t2, n, av, bv, k + 1,
         |               list_append(dp, least(CAST(1000000000000000 AS BIGINT),
         |                 CASE WHEN (k + 1) // 15 - 7 + (k + 1) % 15 < 0
         |                        OR (k + 1) // 15 - 7 + (k + 1) % 15 >= n
         |                      THEN CAST(1000000000000000 AS BIGINT)
         |                      ELSE abs(av[(k + 1) // 15 + 1] -
         |                               bv[(k + 1) // 15 - 7 + (k + 1) % 15 + 1]) +
         |                        CASE WHEN (k + 1) // 15 = 0
         |                              AND (k + 1) // 15 - 7 + (k + 1) % 15 = 0 THEN 0
         |                        ELSE least(
         |                          CASE WHEN k + 1 >= 15 THEN dp[k - 13]
         |                               ELSE CAST(1000000000000000 AS BIGINT) END,
         |                          CASE WHEN (k + 1) % 15 < 14 AND k + 1 >= 14 THEN dp[k - 12]
         |                               ELSE CAST(1000000000000000 AS BIGINT) END,
         |                          CASE WHEN (k + 1) % 15 > 0 THEN dp[k + 1]
         |                               ELSE CAST(1000000000000000 AS BIGINT) END)
         |                        END
         |                 END))
         |        FROM rec WHERE k + 1 < n * 15),
         |fin AS (SELECT t1, t2, n, av, bv, dp FROM rec WHERE k = n * 15 - 1),
         |l1 AS (SELECT t1, t2, n,
         |              CAST(list_sum(list_transform(range(1, n + 1),
         |                   i -> abs(av[i] - bv[i]))) AS BIGINT) AS l1,
         |              CAST(dp[(n - 1) * 15 + 7 + 1] AS BIGINT) AS dtw
         |       FROM fin)
         |SELECT t1 AS type_a, t2 AS type_b, n AS n_days, dtw, l1,
         |       l1 - dtw AS align_gain, ${Q.sqlR4("CAST(dtw AS DOUBLE) / n")} AS dtw_per_day
         |FROM l1
         |ORDER BY type_a, type_b""".stripMargin) { (s, d) =>
      dtwOf(Inference.dailyCounts(s, d))
    },

    // Haar-structured energy by scale (round 16): unnormalized Haar
    // detail coefficients of per-type daily volume at the first five
    // dyadic scales — d(block) = Σ(left half) − Σ(right half) over
    // 2^k-day blocks — and each scale's share of the total detail
    // energy. Where the variance LIVES in time-scale: day-to-day
    // noise loads scale 1, the weekly cycle loads scales 2–3, drift
    // loads 4–5. Coefficients and energies are PURE int64 (integer
    // block sums, integer differences, integer squares); the only
    // float is the share division at readout. One grouping per scale
    // over the calendar-bounded grid — five cheap aggs, no window, no
    // recursion.
    Q("q_haar_energy",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |x0 AS (SELECT min(x) AS x0 FROM dy),
         |grid AS (SELECT ty.event_type, dy.x - x0.x0 AS i, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy CROSS JOIN x0
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |lv AS (SELECT unnest(range(1, 6)) AS level),
         |det AS (SELECT g.event_type, lv.level, g.i // (1 << lv.level) AS blk,
         |               CAST(sum(CASE WHEN (g.i // (1 << (lv.level - 1))) % 2 = 0
         |                             THEN g.y ELSE -g.y END) AS BIGINT) AS d
         |        FROM grid g CROSS JOIN lv
         |        GROUP BY 1, 2, 3),
         |en AS (SELECT event_type, level, CAST(count(*) AS BIGINT) AS n_blocks,
         |              CAST(sum(d * d) AS BIGINT) AS energy
         |       FROM det GROUP BY 1, 2),
         |tt AS (SELECT event_type, CAST(sum(energy) AS BIGINT) AS tot FROM en GROUP BY 1)
         |SELECT en.event_type, en.level, en.n_blocks, en.energy,
         |       CASE WHEN tt.tot > 0 THEN ${Q.sqlR6("CAST(en.energy AS DOUBLE) / tt.tot")}
         |            END AS energy_share
         |FROM en JOIN tt ON en.event_type = tt.event_type
         |ORDER BY en.event_type, en.level""".stripMargin) { (s, d) =>
      haarEnergyOf(Inference.dailyCounts(s, d))
    },

    // LOESS local-linear smoothing of per-type daily volume (round
    // 16): at each day, a tricube-weighted least-squares line over the
    // ±7-day neighborhood — the robust trend readout dashboards
    // overlay on the raw series. Each fit's five weighted sums are
    // integer-latticed to 1e6 per NEIGHBOR (the weight tree
    // (1−(|Δ|/8)³)³ is pure IEEE from integer offsets, identical in
    // both engines) so the ≤15-term reductions are order-free int64
    // folds; the fitted value is one mirrored double tree over those
    // five sums. Shape: a range self-join of the calendar grid onto
    // its ±7 neighborhood — |days|·15 rows per type, calendar-bounded,
    // one corpus scan.
    Q("q_loess_trend",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |nb AS (SELECT t.event_type, t.x, t.y, s.x - t.x AS u, s.y AS sy,
         |              (1 - (CAST(abs(s.x - t.x) AS DOUBLE) / 8) *
         |                   (CAST(abs(s.x - t.x) AS DOUBLE) / 8) *
         |                   (CAST(abs(s.x - t.x) AS DOUBLE) / 8)) *
         |              (1 - (CAST(abs(s.x - t.x) AS DOUBLE) / 8) *
         |                   (CAST(abs(s.x - t.x) AS DOUBLE) / 8) *
         |                   (CAST(abs(s.x - t.x) AS DOUBLE) / 8)) *
         |              (1 - (CAST(abs(s.x - t.x) AS DOUBLE) / 8) *
         |                   (CAST(abs(s.x - t.x) AS DOUBLE) / 8) *
         |                   (CAST(abs(s.x - t.x) AS DOUBLE) / 8)) AS w
         |       FROM grid t JOIN grid s
         |         ON t.event_type = s.event_type AND abs(s.x - t.x) <= 7),
         |sm AS (SELECT event_type, x, max(y) AS y,
         |              CAST(sum(CAST(floor(w * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sw,
         |              CAST(sum(CAST(floor(w * u * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS swu,
         |              CAST(sum(CAST(floor(w * u * u * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS swuu,
         |              CAST(sum(CAST(floor(w * sy * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS swy,
         |              CAST(sum(CAST(floor(w * u * sy * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS swuy
         |       FROM nb GROUP BY 1, 2)
         |SELECT event_type, x AS day_idx, CAST(y AS BIGINT) AS y,
         |       CASE WHEN CAST(sw AS DOUBLE) * swuu - CAST(swu AS DOUBLE) * swu > 0 THEN
         |         ${Q.sqlR4("(CAST(swy AS DOUBLE) * swuu - CAST(swu AS DOUBLE) * swuy) / " +
                   "(CAST(sw AS DOUBLE) * swuu - CAST(swu AS DOUBLE) * swu)")}
         |       END AS loess
         |FROM sm
         |ORDER BY event_type, day_idx""".stripMargin) { (s, d) =>
      loessTrendOf(Inference.dailyCounts(s, d))
    },

    // Cox–Stuart trend test per event type (round 17): the SIGN-test
    // complement of q_mann_kendall — pair day i with day i + ⌈n/2⌉ on
    // the dense grid (odd middle dropped, the textbook convention),
    // count later-half wins, and read the binomial z = (2S⁺ − m)/√m.
    // Monotone-invariant like MK but ONE comparison per pair instead
    // of n²/2: the cheap screen a monitoring tier runs per tick.
    // Everything is exact int64 (positions via row_number on the
    // shared day frame, the pair offset an integer division); ties
    // drop from m in both engines; z is one mirrored tree.
    Q("q_cox_stuart",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dy),
         |p AS (SELECT event_type,
         |             CAST(row_number() OVER (PARTITION BY event_type ORDER BY x)
         |                  AS BIGINT) AS i, y
         |      FROM grid),
         |pr AS (SELECT a.event_type,
         |              CASE WHEN b.y > a.y THEN 1 ELSE 0 END AS plus,
         |              CASE WHEN b.y <> a.y THEN 1 ELSE 0 END AS nontied
         |       FROM p a CROSS JOIN n
         |       JOIN p b ON b.event_type = a.event_type
         |              AND b.i = a.i + (n.n + 1) // 2
         |       WHERE a.i * 2 <= n.n),
         |g AS (SELECT event_type, CAST(sum(plus) AS BIGINT) AS n_plus,
         |             CAST(sum(nontied) AS BIGINT) AS m
         |      FROM pr GROUP BY 1)
         |SELECT g.event_type, n.n AS n_days, g.m AS n_pairs, g.n_plus,
         |       CASE WHEN g.m > 0 THEN
         |         ${Q.sqlR6("(2.0 * g.n_plus - g.m) / sqrt(CAST(g.m AS DOUBLE))")}
         |       END AS z
         |FROM g CROSS JOIN n
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      coxStuartOf(Inference.dailyCounts(s, d))
    },

    // Bartels rank test per event type (round 17): the rank von
    // Neumann ratio RVN = Σ(r_i − r_{i+1})² / Σ(r_i − r̄)² — the
    // RANDOMNESS screen q_runs_test approximates with signs, here with
    // full rank information (catches slow drifts runs miss). Doubled
    // midranks (2·cb + t + 1 per tie run) keep every rank exact int64
    // and make the mean doubled rank EXACTLY n + 1, so numerator and
    // denominator are both order-free integer folds; RVN is one
    // division and z studentizes with the asymptotic Var = 4(n−2)/
    // (n²−1). RVN → 2 is random; ≪2 trending; ≫2 oscillating.
    Q("q_bartels_rank",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dy),
         |tv AS (SELECT event_type, y, CAST(count(*) AS BIGINT) AS t
         |       FROM grid GROUP BY 1, 2),
         |tr AS (SELECT event_type, y, t,
         |              CAST(coalesce(sum(t) OVER (PARTITION BY event_type ORDER BY y
         |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |                   AS BIGINT) AS cb
         |       FROM tv),
         |r AS (SELECT g.event_type, g.x, CAST(2 * tr.cb + tr.t + 1 AS BIGINT) AS r2
         |      FROM grid g JOIN tr ON g.event_type = tr.event_type AND g.y = tr.y),
         |ld AS (SELECT event_type, r2,
         |              lead(r2) OVER (PARTITION BY event_type ORDER BY x) AS r2n
         |       FROM r),
         |nm AS (SELECT event_type, CAST(sum((r2 - r2n) * (r2 - r2n)) AS BIGINT) AS nm2
         |       FROM ld WHERE r2n IS NOT NULL GROUP BY 1),
         |dd AS (SELECT r.event_type,
         |              CAST(sum((r.r2 - n.n - 1) * (r.r2 - n.n - 1)) AS BIGINT) AS d2
         |       FROM r CROSS JOIN n GROUP BY 1)
         |SELECT dd.event_type, n.n AS n_days,
         |       CASE WHEN dd.d2 > 0 THEN
         |         ${Q.sqlR6("CAST(nm.nm2 AS DOUBLE) / dd.d2")} END AS rvn,
         |       CASE WHEN dd.d2 > 0 AND n.n > 2 THEN
         |         ${Q.sqlR6("(CAST(nm.nm2 AS DOUBLE) / dd.d2 - 2.0) / " +
                   "sqrt(4.0 * (n.n - 2) / (CAST(n.n AS DOUBLE) * n.n - 1))")}
         |       END AS z
         |FROM dd JOIN nm USING (event_type) CROSS JOIN n
         |ORDER BY dd.event_type""".stripMargin) { (s, d) =>
      bartelsOf(Inference.dailyCounts(s, d))
    },

    // Pinball (quantile) loss of the one-day-ahead naive forecast
    // (round 17): scores ŷ_x = y_{x−1} as a q10/q50/q90 QUANTILE
    // forecaster — the metric that grades q_forecast_interval's bands
    // the way q_backtest_naive's MAE grades the point forecast
    // (pinball at q50 IS MAE/2). Exact to the last bit: with τ = k/10,
    // 10·Σloss = k·Σd⁺ + (10−k)·Σd⁻ over integer residuals d — two
    // int64 folds serve all three quantiles, one division each.
    Q("q_pinball",
      s"""WITH daily AS (${Inference.dailySql}),
         |ty AS (SELECT DISTINCT event_type FROM daily),
         |dy AS (SELECT DISTINCT x FROM daily),
         |grid AS (SELECT ty.event_type, dy.x, COALESCE(d.y, 0) AS y
         |         FROM ty CROSS JOIN dy
         |         LEFT JOIN daily d ON d.event_type = ty.event_type AND d.x = dy.x),
         |ld AS (SELECT event_type, y,
         |              lag(y) OVER (PARTITION BY event_type ORDER BY x) AS yp
         |       FROM grid),
         |dd AS (SELECT event_type, CAST(y - yp AS BIGINT) AS d
         |       FROM ld WHERE yp IS NOT NULL),
         |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS m,
         |             CAST(sum(CASE WHEN d > 0 THEN d ELSE 0 END) AS BIGINT) AS dp,
         |             CAST(sum(CASE WHEN d < 0 THEN -d ELSE 0 END) AS BIGINT) AS dn
         |      FROM dd GROUP BY 1)
         |SELECT event_type, m AS n_forecasts,
         |       ${Q.sqlR6("(1.0 * dp + 9.0 * dn) / (10.0 * m)")} AS pinball_q10,
         |       ${Q.sqlR6("(5.0 * dp + 5.0 * dn) / (10.0 * m)")} AS pinball_q50,
         |       ${Q.sqlR6("(9.0 * dp + 1.0 * dn) / (10.0 * m)")} AS pinball_q90
         |FROM g
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      pinballOf(Inference.dailyCounts(s, d))
    }
  )

  /** The naive-forecast interval fold over a daily (event_type, x, y)
    * count frame — ONE home shared by batch q_forecast_interval and
    * the s_forecast_interval streaming read-time view (a closing day
    * appends one residual and can shift both crossings; the daily grid
    * is the mergeable state). */
  private[graft] def forecastIntervalOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, _) = denseGrid(dailyIn)
    val ls = grid.groupBy("event_type").agg(max_by(col("y"), col("x")).as("y_last"))
    val wo = Window.partitionBy("event_type").orderBy("x")
    val rg = grid
      .withColumn("e", col("y") - lag("y", 1).over(wo))
      .filter(col("e").isNotNull)
      .groupBy("event_type", "e").agg(count(lit(1)).as("c"))
    val we = Window.partitionBy("event_type").orderBy("e")
    val cu = rg
      .withColumn("cum", sum("c").over(we))
      .withColumn("n", sum("c").over(Window.partitionBy("event_type")))
    val pq = cu.groupBy("event_type")
      .agg(max("n").as("n_resid"),
        min(when(col("cum") * 10 >= col("n"), col("e"))).as("p10"),
        min(when(col("cum") * 10 >= lit(9) * col("n"), col("e"))).as("p90"))
    pq.join(ls, "event_type")
      .select(col("event_type"), col("n_resid"),
        col("p10").as("p10_resid"), col("p90").as("p90_resid"),
        col("y_last").as("forecast_naive"),
        (col("y_last") + col("p10")).as("pi_lo"),
        (col("y_last") + col("p90")).as("pi_hi"))
      .orderBy("event_type")
  }

  /** The banded-DTW fold over a daily (event_type, x, y) count frame —
    * ONE home shared by batch q_dtw and the s_dtw streaming read-time
    * view (a new day extends both series; the daily grid is the
    * mergeable state). Sakoe–Chiba halfwidth 7 (band width 15); state
    * is ONE previous band row per pair (O(w) memory, O(n·w²) work);
    * all-integer min/+ DP, so it equals the oracle's linear-index
    * recursion bit-for-bit. */
  private[graft] def dtwOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, _) = denseGrid(dailyIn)
    val ta = grid.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        expr("transform(sort_array(collect_list(struct(x, y))), e -> e.y)").as("ys"))
    val a = ta.select(col("event_type").as("t1"), col("n"), col("ys").as("av"))
    val b = ta.select(col("event_type").as("t2"), col("n").as("nb"), col("ys").as("bv"))
    val pr = a.join(broadcast(b), col("t1") < col("t2"))
    // prev-row fold: for each row i the inner fold builds the 15-cell
    // band row from the previous row (acc) and its own growing prefix
    // (racc); INF = 1e15, capped per cell so sums never leave int64.
    val dpExpr =
      """aggregate(sequence(0, cast(n - 1 as int)),
        |  CAST(array() AS ARRAY<BIGINT>),
        |  (prev, i) -> aggregate(sequence(0, 14),
        |    CAST(array() AS ARRAY<BIGINT>),
        |    (row, off) -> array_append(row,
        |      least(1000000000000000L,
        |        CASE WHEN i - 7 + off < 0 OR i - 7 + off >= n
        |             THEN 1000000000000000L
        |             ELSE abs(av[i] - bv[i - 7 + off]) +
        |               CASE WHEN i = 0 AND i - 7 + off = 0 THEN 0L
        |               ELSE least(
        |                 CASE WHEN size(prev) > 0 THEN prev[off]
        |                      ELSE 1000000000000000L END,
        |                 CASE WHEN size(prev) > 0 AND off < 14 THEN prev[off + 1]
        |                      ELSE 1000000000000000L END,
        |                 CASE WHEN off > 0 THEN row[off - 1]
        |                      ELSE 1000000000000000L END)
        |               END
        |        END)),
        |    row -> row),
        |  prev -> prev[7])""".stripMargin
    pr.withColumn("dtw", expr(dpExpr))
      .withColumn("l1", expr(
        "aggregate(zip_with(av, bv, (p, q) -> abs(p - q)), 0L, (acc, e) -> acc + e)"))
      .select(col("t1").as("type_a"), col("t2").as("type_b"), col("n").as("n_days"),
        col("dtw"), col("l1"), (col("l1") - col("dtw")).as("align_gain"),
        Q.r4(col("dtw").cast("double") / col("n")).as("dtw_per_day"))
      .orderBy("type_a", "type_b")
  }

  /** The Haar-energy rollup over a daily (event_type, x, y) count
    * frame — ONE home shared by batch q_haar_energy and the
    * s_haar_energy streaming read-time view (a new day shifts its
    * block's coefficient at every scale; the daily grid is the
    * mergeable state). */
  private[graft] def haarEnergyOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, dy) = denseGrid(dailyIn)
    val x0 = dy.agg(min("x").as("x0"))
    val lv = (1 to 5).map(i => lit(i.toLong))
    val det = grid.crossJoin(broadcast(x0))
      .withColumn("i", col("x") - col("x0"))
      .withColumn("level", explode(array(lv: _*)))
      .withColumn("blk", (col("i") / expr("shiftleft(1L, cast(level as int))")).cast("long"))
      .withColumn("half",
        ((col("i") / expr("shiftleft(1L, cast(level as int) - 1)")).cast("long") % 2))
      .groupBy("event_type", "level", "blk")
      .agg(sum(when(col("half") === 0, col("y")).otherwise(-col("y"))).as("d"))
    val en = det.groupBy("event_type", "level")
      .agg(count(lit(1)).as("n_blocks"), sum(col("d") * col("d")).as("energy"))
      .transform(Q.snapshot)
    val tt = en.groupBy("event_type").agg(sum("energy").as("tot"))
    en.join(tt, "event_type")
      .select(col("event_type"), col("level"), col("n_blocks"), col("energy"),
        when(col("tot") > 0, Q.r6(col("energy").cast("double") / col("tot")))
          .as("energy_share"))
      .orderBy("event_type", "level")
  }

  /** The LOESS neighborhood fit over a daily (event_type, x, y) count
    * frame — ONE home shared by batch q_loess_trend and the
    * s_loess_trend streaming read-time view (a new day re-fits its
    * ±7-day neighborhood; the daily grid is the mergeable state). */
  private[graft] def loessTrendOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, _) = denseGrid(dailyIn)
    val t = grid.select(col("event_type"), col("x"), col("y"))
    val sN = grid.select(col("event_type").as("se"), col("x").as("sx"), col("y").as("sy"))
    val u = (col("sx") - col("x")).cast("long")
    val au = abs(u).cast("double") / 8
    val w3 = lit(1.0) - au * au * au
    val w = w3 * w3 * w3
    val nb = t.join(sN, col("event_type") === col("se") && abs(col("sx") - col("x")) <= 7)
      .select(col("event_type"), col("x"), col("y"), u.as("u"), col("sy"), w.as("w"))
    val sm = nb.groupBy("event_type", "x")
      .agg(max("y").as("y"),
        sum(floor(col("w") * lit(1e6) + 0.5).cast("long")).as("sw"),
        sum(floor(col("w") * col("u") * lit(1e6) + 0.5).cast("long")).as("swu"),
        sum(floor(col("w") * col("u") * col("u") * lit(1e6) + 0.5).cast("long")).as("swuu"),
        sum(floor(col("w") * col("sy") * lit(1e6) + 0.5).cast("long")).as("swy"),
        sum(floor(col("w") * col("u") * col("sy") * lit(1e6) + 0.5).cast("long")).as("swuy"))
    val den = col("sw").cast("double") * col("swuu") - col("swu").cast("double") * col("swu")
    sm.select(col("event_type"), col("x").as("day_idx"), col("y"),
        when(den > 0,
          Q.r4((col("swy").cast("double") * col("swuu") -
            col("swu").cast("double") * col("swuy")) / den)).as("loess"))
      .orderBy("event_type", "day_idx")
  }

  /** The rolling-origin backtest fold over a daily (event_type, x, y)
    * count frame — ONE home shared by batch q_backtest_naive and a
    * future streaming read-time face (the daily grid is the mergeable
    * state; a new day appends one eval row per type). */
  private[graft] def backtestNaiveOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, _) = denseGrid(dailyIn)
    val ty = grid.select("event_type").distinct()
    val wo = Window.partitionBy("event_type").orderBy("x")
    val w = grid
      .withColumn("rn", row_number().over(wo).cast("long"))
      .withColumn("fn", lag("y", 1).over(wo))
      .withColumn("fs", lag("y", 7).over(wo))
      .withColumn("m7", sum("y").over(wo.rowsBetween(-7, -1)))
    val e = w.filter(col("rn") >= 8)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(abs(col("y") - col("fn"))).as("sn"),
        sum(abs(col("y") - col("fs"))).as("ss"),
        sum(abs(lit(7) * col("y") - col("m7"))).as("sm"))
    ty.join(e, Seq("event_type"), "left")
      .select(col("event_type"),
        coalesce(col("n"), lit(0L)).as("n_evals"),
        Q.r4(col("sn").cast("double") / col("n")).as("mae_naive"),
        Q.r4(col("ss").cast("double") / col("n")).as("mae_snaive"),
        Q.r4(col("sm").cast("double") / (lit(7.0) * col("n"))).as("mae_ma7"),
        when(col("n").isNull, lit(null).cast("string"))
          .when(lit(7) * col("sn") <= col("sm") && col("sn") <= col("ss"), "naive")
          .when(lit(7) * col("ss") <= col("sm"), "snaive")
          .otherwise("ma7").as("best"))
      .orderBy("event_type")
  }

  /** The MACD two-pass fold over a daily (event_type, x, y) count
    * frame — ONE home shared by batch q_macd and the s_macd streaming
    * read-time view (a new day extends the recursion; the daily grid
    * is the mergeable state). Pass 1 carries the twin EMAs and emits
    * the per-day MACD array; pass 2 folds (signal, prev hist sign,
    * crossings) over it — operation order term-for-term identical to
    * the oracle's recursive CTE. */
  private[graft] def macdOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, _) = denseGrid(dailyIn)
    grid.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(struct(col("x"), col("y").cast("double").as("y")))).as("xs"))
      // pass 1: twin EMAs seeded at the first count; emit macd_t = e12_t − e26_t
      .withColumn("ems", expr(
        """aggregate(xs,
          |  named_struct('f', CAST(0 AS INT), 'e12', CAST(0 AS DOUBLE),
          |               'e26', CAST(0 AS DOUBLE), 'ms', CAST(array() AS ARRAY<DOUBLE>)),
          |  (acc, e) -> CASE WHEN acc.f = 0
          |    THEN named_struct('f', 1, 'e12', e.y, 'e26', e.y,
          |                      'ms', array(CAST(0 AS DOUBLE)))
          |    ELSE named_struct('f', 1,
          |      'e12', acc.e12 + 2.0D / 13 * (e.y - acc.e12),
          |      'e26', acc.e26 + 2.0D / 27 * (e.y - acc.e26),
          |      'ms', array_append(acc.ms,
          |        (acc.e12 + 2.0D / 13 * (e.y - acc.e12)) - (acc.e26 + 2.0D / 27 * (e.y - acc.e26))))
          |    END,
          |  acc -> acc)""".stripMargin))
      // pass 2: signal EMA over the macd array (seeds at macd_1 = 0.0),
      // histogram sign carry + strict-flip crossing count
      .withColumn("st", expr(
        """aggregate(ems.ms,
          |  named_struct('f', CAST(0 AS INT), 'sig', CAST(0 AS DOUBLE),
          |               'ps', CAST(0 AS BIGINT), 'cr', CAST(0 AS BIGINT)),
          |  (acc, m) -> CASE WHEN acc.f = 0
          |    THEN named_struct('f', 1, 'sig', m, 'ps', CAST(0 AS BIGINT), 'cr', CAST(0 AS BIGINT))
          |    ELSE named_struct('f', 1,
          |      'sig', acc.sig + 2.0D / 10 * (m - acc.sig),
          |      'ps', CASE WHEN m - (acc.sig + 2.0D / 10 * (m - acc.sig)) > 0 THEN CAST(1 AS BIGINT)
          |                 WHEN m - (acc.sig + 2.0D / 10 * (m - acc.sig)) < 0 THEN CAST(-1 AS BIGINT)
          |                 ELSE acc.ps END,
          |      'cr', acc.cr + CASE WHEN acc.ps <> 0 AND
          |          m - (acc.sig + 2.0D / 10 * (m - acc.sig)) <> 0 AND
          |          (CASE WHEN m - (acc.sig + 2.0D / 10 * (m - acc.sig)) > 0 THEN 1 ELSE -1 END) <> acc.ps
          |        THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)
          |    END,
          |  acc -> acc)""".stripMargin))
      .select(col("event_type"), col("n").as("n_days"),
        Q.r6(col("ems.e12")).as("ema12"), Q.r6(col("ems.e26")).as("ema26"),
        Q.r6(col("ems.e12") - col("ems.e26")).as("macd"),
        Q.r6(col("st.sig")).as("signal"),
        Q.r6(col("ems.e12") - col("ems.e26") - col("st.sig")).as("hist"),
        col("st.cr").as("n_cross"))
      .orderBy("event_type")
  }

  /** The 3-round sigma-clip over a daily (event_type, x, y) count
    * frame — ONE home shared by batch q_sigma_clip and the
    * s_sigma_clip streaming read-time view (the daily grid is the
    * mergeable state; each round's stats frame is 5 rows, broadcast).
    * Returns (per-round kept counts, clipped mean/sd). */
  private[graft] def sigmaClipOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, _) = denseGrid(dailyIn)

    def stats(r: org.apache.spark.sql.DataFrame) =
      r.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("y").as("s"), sum(col("y") * col("y")).as("q"))

    def clip(r: org.apache.spark.sql.DataFrame, t: org.apache.spark.sql.DataFrame) =
      r.join(broadcast(t), "event_type")
        .filter(col("n") < 2 || col("n") * col("q") - col("s") * col("s") <= 0 ||
          abs(col("n") * col("y") - col("s")) <= lit(3.0) * col("n") *
            sqrt((col("n") * col("q") - col("s") * col("s")).cast("double") /
              (col("n").cast("double") * (col("n") - 1))))
        .select(col("event_type"), col("x"), col("y"))

    val t1 = Q.snapshot(stats(grid))
    val r1 = clip(grid, t1)
    val t2 = Q.snapshot(stats(r1))
    val r2 = clip(r1, t2)
    val t3 = Q.snapshot(stats(r2))
    val r3 = clip(r2, t3)
    val f = stats(r3)

    t1.select(col("event_type"), col("n").as("n_days"))
      .join(t2.select(col("event_type"), col("n").as("kept_r1")), "event_type")
      .join(t3.select(col("event_type"), col("n").as("kept_r2")), "event_type")
      .join(f.select(col("event_type"), col("n").as("kept_r3"),
        col("s").as("fs"), col("q").as("fq")), "event_type")
      .select(col("event_type"), col("n_days"), col("kept_r1"), col("kept_r2"),
        col("kept_r3"), (col("n_days") - col("kept_r3")).as("n_clipped"),
        Q.r4(col("fs").cast("double") / col("kept_r3")).as("clipped_mean"),
        when(col("kept_r3") >= 2 && col("kept_r3") * col("fq") - col("fs") * col("fs") > 0,
          Q.r6(sqrt((col("kept_r3") * col("fq") - col("fs") * col("fs")).cast("double") /
            (col("kept_r3").cast("double") * (col("kept_r3") - 1))))).as("clipped_sd"))
      .orderBy("event_type")
  }

  /** The periodogram fold over a daily (event_type, x, y) count frame —
    * ONE home shared by batch q_periodogram and the s_periodogram
    * streaming read-time view (the FIFTH face of Streams.dailyGrid).
    * The spectrum is not mergeable state — a new day shifts every
    * residue-class sum — the daily grid is. */
  private[graft] def periodogramOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val fr = periodogramFrame(dailyIn)
    fr.withColumn("rn", row_number().over(Window.partitionBy("event_type")
        .orderBy(col("frac").desc_nulls_last, col("p"))))
      .filter(col("rn") === 1)
      .select(col("event_type"),
        when(col("ssr") > 0, col("p")).as("best_period"),
        col("dd").as("n_days"),
        when(col("ssr") > 0, Q.r6(col("frac"))).as("spectral_frac"))
      .orderBy("event_type")
  }

  /** The (event_type, p, dd, ssr, frac) variance-share frame under the
    * spectral pair — 13 candidate periods per type, `frac` the one
    * mirrored IEEE tree over exact int64 A/B sums. Shared by
    * [[periodogramOf]] (argmax readout) and [[spectralEntropyOf]]
    * (distribution readout) so the two spectra can never drift. */
  private def periodogramFrame(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, _) = denseGrid(dailyIn)
    val g = grid
      .withColumn("dd", count(lit(1)).over(Window.partitionBy("event_type")))
      .withColumn("tt", sum("y").over(Window.partitionBy("event_type")))
      .withColumn("r", col("dd") * col("y") - col("tt"))
      .transform(Q.snapshot) // two consumers: the residue sums and ssr
    val ss = g.groupBy("event_type").agg(sum(col("r") * col("r")).as("ssr"))
    val rs = g
      .select(col("event_type"), col("dd"), col("x"), col("r"),
        explode(sequence(lit(2L), lit(14L))).as("p"))
      .withColumn("res", col("x") % col("p"))
      .groupBy("event_type", "dd", "p", "res")
      .agg(sum("r").as("sr"))
    val ang = lit(2) * lit(math.Pi) * col("res") / col("p")
    val w = rs.select(col("event_type"), col("dd"), col("p"), col("sr"),
      floor(cos(ang) * lit(1e6) + 0.5).cast("long").as("c6"),
      floor(sin(ang) * lit(1e6) + 0.5).cast("long").as("s6"))
    val ab = w.groupBy("event_type", "p")
      .agg(max("dd").as("dd"),
        sum(col("sr") * col("c6")).as("a6"),
        sum(col("sr") * col("s6")).as("b6"))
    ab.join(ss, "event_type")
      .withColumn("frac",
        when(col("ssr") > 0,
          (col("a6").cast("double") * col("a6") +
            col("b6").cast("double") * col("b6")) * 2 /
            (lit(1e12) * col("dd") * col("ssr"))))
  }

  /** ln(13) as a shortest-round-trip IEEE literal — the q_ndcg
    * discount-table move: the normalizer is embedded, never evaluated,
    * so libm can't disagree across engines. */
  private val Ln13 = 2.5649493574615367

  /** The spectral-entropy fold over a daily (event_type, x, y) frame —
    * ONE home shared by batch q_spectral_entropy and the
    * s_spectral_entropy streaming read-time view (the spectrum is not
    * mergeable; the daily grid is). Each period's variance share
    * floors onto a 1e-6 lattice (order-free int64 normalizer), each
    * entropy term onto 1e-9 before the 13-term fold. */
  private[graft] def spectralEntropyOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val f = periodogramFrame(dailyIn)
      .select(col("event_type"), col("dd"),
        when(col("ssr") > 0, floor(col("frac") * lit(1e6) + 0.5).cast("long"))
          .otherwise(0L).as("f6"))
    val t = f.groupBy("event_type")
      .agg(max("dd").as("dd"), sum("f6").as("tot6"), max("f6").as("mx6"))
    val e = f.join(t.select(col("event_type"), col("tot6")), "event_type")
      .select(col("event_type"),
        when(col("f6") > 0 && col("tot6") > 0,
          floor(col("f6").cast("double") / col("tot6") *
            log(col("tot6").cast("double") / col("f6")) * lit(1e9) + 0.5).cast("long"))
          .otherwise(0L).as("e9"))
      .groupBy("event_type").agg(sum("e9").as("h9"))
    t.join(e, "event_type")
      .select(col("event_type"), col("dd").as("n_days"),
        when(col("tot6") > 0,
          Q.r6(col("h9") / lit(1e9) / lit(Ln13))).as("spectral_entropy"),
        when(col("tot6") > 0,
          Q.r6(col("mx6").cast("double") / col("tot6"))).as("peak_share"))
      .orderBy("event_type")
  }

  /** The Yule–Walker AR(2) fold over a daily (event_type, x, y) frame —
    * ONE home shared by batch q_yule_walker and the s_yule_walker
    * streaming read-time view (a new day shifts every lag cross-sum;
    * the daily grid is the mergeable state). All three autocovariance
    * numerators are exact int64 via the q_acf fraction clearing; the
    * φ trees run in doubles over exact integers only. */
  private[graft] def yuleWalkerOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, _) = denseGrid(dailyIn)
    val wx = Window.partitionBy("event_type").orderBy("x")
    val st = grid
      .withColumn("y1", lead("y", 1).over(wx))
      .withColumn("y2", lead("y", 2).over(wx))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("y").as("s"), sum(col("y") * col("y")).as("ss"),
        sum(when(col("y1").isNotNull, col("y") * col("y1"))).as("p1"),
        sum(when(col("y1").isNotNull, col("y"))).as("a1"),
        sum(col("y1")).as("b1"),
        sum(when(col("y2").isNotNull, col("y") * col("y2"))).as("p2"),
        sum(when(col("y2").isNotNull, col("y"))).as("a2"),
        sum(col("y2")).as("b2"))
    val c = st.select(col("event_type"), col("n"),
      (col("n") * col("n") * col("ss") - col("n") * col("s") * col("s")).as("c0"),
      (col("n") * col("n") * col("p1") - col("n") * col("s") * (col("a1") + col("b1")) +
        (col("n") - 1) * col("s") * col("s")).as("c1"),
      (col("n") * col("n") * col("p2") - col("n") * col("s") * (col("a2") + col("b2")) +
        (col("n") - 2) * col("s") * col("s")).as("c2"))
    val den = col("c0").cast("double") * col("c0") - col("c1").cast("double") * col("c1")
    c.select(col("event_type"), col("n").as("n_days"),
      when(col("c0") > 0, Q.r6(col("c1").cast("double") / col("c0"))).as("r1"),
      when(col("c0") > 0, Q.r6(col("c2").cast("double") / col("c0"))).as("r2"),
      when(den > 0,
        Q.r6(col("c1").cast("double") * (col("c0") - col("c2")) / den)).as("phi1"),
      when(den > 0,
        Q.r6((col("c2").cast("double") * col("c0") -
          col("c1").cast("double") * col("c1")) / den)).as("phi2"))
      .orderBy("event_type")
  }

  /** The permutation-entropy fold over a daily (event_type, x, y)
    * frame — ONE home shared by batch q_perm_entropy and the
    * s_perm_entropy streaming read-time view (a new day creates new
    * triples and re-normalizes every pattern share; the daily grid is
    * the mergeable state). */
  private[graft] def permEntropyOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, _) = denseGrid(dailyIn)
    val wx = Window.partitionBy("event_type").orderBy("x")
    val pt = grid
      .withColumn("y1", lead("y", 1).over(wx))
      .withColumn("y2", lead("y", 2).over(wx))
      .filter(col("y2").isNotNull)
      .select(col("event_type"),
        when(col("y") <= col("y1") && col("y1") <= col("y2"), 0)
          .when(col("y") <= col("y2") && col("y2") < col("y1"), 1)
          .when(col("y1") < col("y") && col("y") <= col("y2"), 2)
          .when(col("y1") <= col("y2") && col("y2") < col("y"), 3)
          .when(col("y2") < col("y") && col("y") <= col("y1"), 4)
          .otherwise(5).cast("long").as("pat"))
    val c = pt.groupBy("event_type", "pat").agg(count(lit(1)).as("c"))
      .transform(Q.snapshot) // feeds the totals, the fold and the argmax
    val t = c.groupBy("event_type").agg(sum("c").as("m"), max("c").as("mx"))
    val e = c.join(t.select("event_type", "m"), "event_type")
      .groupBy("event_type")
      .agg(sum(floor(col("c").cast("double") / col("m") *
        log(col("m").cast("double") / col("c")) * lit(1e9) + 0.5)
        .cast("long")).as("h9"))
    val tp = c.join(t.select("event_type", "mx"), "event_type")
      .filter(col("c") === col("mx"))
      .groupBy("event_type").agg(min("pat").as("top_pattern"))
    t.join(e, "event_type").join(tp, "event_type")
      // no m > 0 guard: every emitted row aggregates >= 1 triple (a
      // type with fewer than 3 grid days yields no row at all)
      .select(col("event_type"), col("m").as("n_triples"),
        Q.r6(col("h9") / lit(1e9) / lit(1.791759469228055)).as("perm_entropy"),
        col("top_pattern"))
      .orderBy("event_type")
  }

  /** The Cox–Stuart fold over a daily (event_type, x, y) frame — ONE
    * home shared by batch q_cox_stuart and the s_cox_stuart streaming
    * read-time view (a closing day re-pairs the whole series — the
    * offset ⌈n/2⌉ moves — so the test re-prices at read time; the
    * daily grid is the mergeable state). */
  private[graft] def coxStuartOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, dy) = denseGrid(dailyIn)
    val n = dy.agg(count(lit(1)).as("n"))
    val p = grid.withColumn("i",
      row_number().over(Window.partitionBy("event_type").orderBy("x")).cast("long"))
    val a = p.select(col("event_type"), col("i"), col("y").as("ya"))
      .crossJoin(broadcast(n))
      .filter(col("i") * 2 <= col("n"))
      .withColumn("j", expr("i + (n + 1) div 2"))
    val b = p.select(col("event_type").as("bt"), col("i").as("bj"), col("y").as("yb"))
    a.join(b, col("event_type") === col("bt") && col("j") === col("bj"))
      .groupBy("event_type")
      .agg(max("n").as("n"),
        sum(when(col("yb") > col("ya"), 1L).otherwise(0L)).as("n_plus"),
        sum(when(col("yb") =!= col("ya"), 1L).otherwise(0L)).as("m"))
      .select(col("event_type"), col("n").as("n_days"),
        col("m").as("n_pairs"), col("n_plus"),
        when(col("m") > 0, Q.r6((lit(2.0) * col("n_plus") - col("m")) /
          sqrt(col("m").cast("double")))).as("z"))
      .orderBy("event_type")
  }

  /** The Bartels rank-von-Neumann fold over a daily (event_type, x, y)
    * frame — ONE home shared by batch q_bartels_rank and the
    * s_bartels_rank streaming read-time view (a new day re-ranks the
    * series; the daily grid is the mergeable state). Doubled midranks
    * make the mean doubled rank exactly n + 1, so both quadratic sums
    * are exact int64. */
  private[graft] def bartelsOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, dy) = denseGrid(dailyIn)
    val n = dy.agg(count(lit(1)).as("n"))
    val wy = Window.partitionBy("event_type").orderBy("y")
      .rowsBetween(Window.unboundedPreceding, -1)
    val tr = grid.groupBy("event_type", "y").agg(count(lit(1)).as("t"))
      .withColumn("cb", coalesce(sum("t").over(wy), lit(0L)))
    val r = grid.join(tr, Seq("event_type", "y"))
      .select(col("event_type"), col("x"),
        (lit(2) * col("cb") + col("t") + 1).as("r2"))
    val wx = Window.partitionBy("event_type").orderBy("x")
    val nm = r.withColumn("r2n", lead("r2", 1).over(wx))
      .filter(col("r2n").isNotNull)
      .groupBy("event_type")
      .agg(sum((col("r2") - col("r2n")) * (col("r2") - col("r2n"))).as("nm2"))
    val dd = r.crossJoin(broadcast(n))
      .groupBy("event_type")
      .agg(max("n").as("n"),
        sum((col("r2") - col("n") - 1) * (col("r2") - col("n") - 1)).as("d2"))
    dd.join(nm, "event_type")
      .select(col("event_type"), col("n").as("n_days"),
        when(col("d2") > 0, Q.r6(col("nm2").cast("double") / col("d2"))).as("rvn"),
        when(col("d2") > 0 && col("n") > 2,
          Q.r6((col("nm2").cast("double") / col("d2") - 2.0) /
            sqrt(lit(4.0) * (col("n") - 2) /
              (col("n").cast("double") * col("n") - 1)))).as("z"))
      .orderBy("event_type")
  }

  /** The pinball-loss fold over a daily (event_type, x, y) frame —
    * ONE home shared by batch q_pinball and the s_pinball streaming
    * read-time view (a closing day adds one residual; the daily grid
    * is the mergeable state). Two int64 residual folds (Σd⁺, Σd⁻)
    * serve all three quantile losses exactly. */
  private[graft] def pinballOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, _) = denseGrid(dailyIn)
    val wx = Window.partitionBy("event_type").orderBy("x")
    val g = grid.withColumn("yp", lag("y", 1).over(wx))
      .filter(col("yp").isNotNull)
      .withColumn("d", (col("y") - col("yp")).cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("m"),
        sum(when(col("d") > 0, col("d")).otherwise(0L)).as("dp"),
        sum(when(col("d") < 0, -col("d")).otherwise(0L)).as("dn"))
    g.select(col("event_type"), col("m").as("n_forecasts"),
      Q.r6((lit(1.0) * col("dp") + lit(9.0) * col("dn")) / (lit(10.0) * col("m")))
        .as("pinball_q10"),
      Q.r6((lit(5.0) * col("dp") + lit(5.0) * col("dn")) / (lit(10.0) * col("m")))
        .as("pinball_q50"),
      Q.r6((lit(9.0) * col("dp") + lit(1.0) * col("dn")) / (lit(10.0) * col("m")))
        .as("pinball_q90"))
      .orderBy("event_type")
  }

  /** The Cronbach-alpha fold over a daily (event_type, x, y) frame —
    * ONE home shared by batch q_cronbach_alpha and the
    * s_cronbach_alpha streaming read-time view (a new day shifts every
    * item variance AND the day-total variance; the daily grid is the
    * mergeable state). Fractions cleared as n·Σy² − (Σy)² — exact
    * int64 both levels; α is one mirrored IEEE tree. */
  private[graft] def cronbachOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, dy) = denseGrid(dailyIn)
    val iv = grid.groupBy("event_type")
      .agg((count(lit(1)) * sum(col("y") * col("y")) -
        sum("y") * sum("y")).as("vi"))
      .agg(count(lit(1)).as("k"), sum("vi").as("sv"))
    val tv = grid.groupBy("x").agg(sum("y").as("sd"))
      .agg((count(lit(1)) * sum(col("sd") * col("sd")) -
        sum("sd") * sum("sd")).as("vt"))
    dy.agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(iv)).crossJoin(broadcast(tv))
      .select(col("n").as("n_days"), col("k").as("n_types"),
        when(col("k") >= 2 && col("vt") > 0,
          Q.r6(col("k") / (col("k") - lit(1.0)) *
            (lit(1) - col("sv").cast("double") / col("vt")))).as("alpha"))
  }

  /** The ICC(1,1) fold over a daily (event_type, x, y) frame — ONE
    * home shared by batch q_icc and the s_icc streaming read-time
    * view (a new day shifts both mean squares; the daily grid is the
    * mergeable state). A and B clear every fraction — exact int64. */
  private[graft] def iccOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, dy) = denseGrid(dailyIn)
    val ds = grid.groupBy("x").agg(sum("y").as("sd")).transform(Q.snapshot)
    val km = grid.select("event_type").distinct().agg(count(lit(1)).as("k"))
    val nn = dy.agg(count(lit(1)).as("n"))
    val tot = ds.agg(sum("sd").as("s"))
    val aa = ds.crossJoin(broadcast(nn)).crossJoin(broadcast(tot))
      .agg(sum((col("n") * col("sd") - col("s")) *
        (col("n") * col("sd") - col("s"))).as("a"))
    val bb = grid.join(ds, "x").crossJoin(broadcast(km))
      .agg(sum((col("k") * col("y") - col("sd")) *
        (col("k") * col("y") - col("sd"))).as("b"))
    val msb = col("a").cast("double") /
      (col("k") * col("n") * col("n") * (col("n") - 1))
    val msw = col("b").cast("double") /
      (col("k") * col("k") * col("n") * (col("k") - 1))
    nn.crossJoin(broadcast(km)).crossJoin(broadcast(aa)).crossJoin(broadcast(bb))
      .select(col("n").as("n_days"), col("k").as("n_types"),
        when(col("n") >= 2 && col("k") >= 2, Q.r6(msb)).as("msb"),
        when(col("n") >= 2 && col("k") >= 2, Q.r6(msw)).as("msw"),
        when(col("n") >= 2 && col("k") >= 2 &&
          msb + (col("k") - 1) * msw > 0,
          Q.r6((msb - msw) / (msb + (col("k") - 1) * msw))).as("icc"))
  }

  /** The Quade fold over a daily (event_type, x, y) frame — ONE home
    * shared by batch q_quade and the s_quade streaming read-time view
    * (a new day re-weights every block; the daily grid is the
    * mergeable state). Doubled ranks keep S2 = q2·(r2−(k+1)) exact
    * int64; the day-weight window consumes the |days|-row range
    * aggregate, never the corpus. */
  private[graft] def quadeOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, dy) = denseGrid(dailyIn)
    val r = grid.withColumn("r2", r2Col).select("event_type", "x", "r2")
    val rg = grid.groupBy("x").agg((max("y") - min("y")).as("rng"))
    val qw = rg.select(col("x"),
      (lit(2) * rank().over(Window.orderBy("rng")) +
        count(lit(1)).over(Window.partitionBy("rng")) - 1).cast("long").as("q2"))
    val km = grid.select("event_type").distinct().agg(count(lit(1)).as("k"))
    val ag = r.join(qw, "x").crossJoin(broadcast(km))
      .select(col("event_type"), (col("q2") * (col("r2") - (col("k") + 1))).as("s2"))
      .groupBy("event_type")
      .agg(sum("s2").as("tj"), sum(col("s2") * col("s2")).as("a2"))
      .agg(sum(col("tj") * col("tj")).as("b16"), sum("a2").as("a16"))
    dy.agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(km)).crossJoin(broadcast(ag))
      .select(col("n").as("n_days"), col("k").as("n_types"),
        when(col("n") * col("a16") - col("b16") > 0,
          Q.r6((col("n") - 1) * col("b16").cast("double") /
            (col("n") * col("a16") - col("b16")))).as("quade_f"))
  }

  /** The sample-entropy fold (m = 2, r = 0.2σ) over a daily
    * (event_type, x, y) count frame — ONE home shared by batch
    * q_sampen and the s_sampen streaming read-time view (a new day
    * shifts σ and every template comparison; the daily grid is the
    * mergeable state). A and B are exact integer pair counts over the
    * dense grid's lead-window templates; ONE pair pass counts both
    * template lengths with conditional sums (the oracle runs two
    * joins — same counts). The only float is r, one identical IEEE
    * tree in both engines. */
  private[graft] def sampenOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, _) = denseGrid(dailyIn)
    val rr = grid.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("y").as("s"),
        sum(col("y") * col("y")).as("q"))
      .select(col("event_type"), col("n"),
        (lit(0.2) * sqrt((col("n") * col("q") - col("s") * col("s")).cast("double"))
          / col("n")).as("r"))
    val wx = Window.partitionBy("event_type").orderBy("x")
    val sub = grid
      .withColumn("a1", lead("y", 1).over(wx))
      .withColumn("a2", lead("y", 2).over(wx))
      .select(col("event_type"), col("x").as("i"), col("y").as("a0"),
        col("a1"), col("a2"))
      .transform(Q.snapshot) // feeds both sides of the pair self-join
    val a = sub.as("a")
    val b = sub.as("b")
    val m2 = col("a.a1").isNotNull && col("b.a1").isNotNull &&
      abs(col("a.a0") - col("b.a0")) <= col("r") &&
      abs(col("a.a1") - col("b.a1")) <= col("r")
    val m3 = col("a.a2").isNotNull && col("b.a2").isNotNull &&
      abs(col("a.a0") - col("b.a0")) <= col("r") &&
      abs(col("a.a1") - col("b.a1")) <= col("r") &&
      abs(col("a.a2") - col("b.a2")) <= col("r")
    val pairs = a
      .join(b, col("a.event_type") === col("b.event_type") && col("a.i") < col("b.i"))
      .join(broadcast(rr.select(col("event_type").as("re"), col("r"))),
        col("a.event_type") === col("re"))
      .groupBy(col("a.event_type").as("event_type"))
      .agg(sum(when(m2, 1L).otherwise(0L)).as("b_raw"),
        sum(when(m3, 1L).otherwise(0L)).as("a_raw"))
    rr.join(pairs, Seq("event_type"), "left")
      .select(col("event_type"), col("n").as("n_days"), Q.r6(col("r")).as("r"),
        coalesce(col("b_raw"), lit(0L)).as("b_pairs"),
        coalesce(col("a_raw"), lit(0L)).as("a_pairs"),
        when(coalesce(col("a_raw"), lit(0L)) > 0 && coalesce(col("b_raw"), lit(0L)) > 0,
          Q.r6(log(col("b_raw").cast("double") / col("a_raw")))).as("sampen"))
      .orderBy("event_type")
  }

  /** The theta-method fold over a daily (event_type, x, y) count
    * frame — ONE home shared by batch q_theta_forecast and the
    * s_theta_forecast streaming read-time view (a new day re-fits the
    * trend and re-runs the SES recursion; the daily grid is the
    * mergeable state). Trend from exact int64 moment sums; the SES
    * over the theta line is ONE left-to-right aggregate() fold per
    * type, term-for-term identical to the oracle's recursive CTE. */
  private[graft] def thetaForecastOf(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (grid, _) = denseGrid(dailyIn)
    val per = grid.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
        max("x").as("xmax"),
        sort_array(collect_list(struct(col("x"), col("y")))).as("xs"))
      .filter(col("n") >= 2 && col("n") * col("sxx") - col("sx") * col("sx") > 0)
    val bCol = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
      (col("n") * col("sxx") - col("sx").cast("double") * col("sx"))
    per
      .withColumn("b", bCol)
      .withColumn("a", (col("sy") - col("b") * col("sx")) / col("n"))
      .withColumn("ses", expr(
        """aggregate(xs,
          |  named_struct('f', CAST(0 AS INT), 's', CAST(0 AS DOUBLE)),
          |  (acc, e) -> CASE WHEN acc.f = 0
          |    THEN named_struct('f', 1, 's', 2 * e.y - (a + b * e.x))
          |    ELSE named_struct('f', 1, 's', 0.2 * (2 * e.y - (a + b * e.x)) + 0.8 * acc.s)
          |    END,
          |  acc -> acc.s)""".stripMargin))
      .select(col("event_type"), col("n").as("n_days"),
        Q.r6(col("a")).as("trend_a"), Q.r6(col("b")).as("trend_b"),
        Q.r6(col("ses")).as("ses_theta"),
        Q.r6((col("ses") + col("a") + col("b") * (col("xmax") + 1)) / 2)
          .as("forecast_next"))
      .orderBy("event_type")
  }
}
