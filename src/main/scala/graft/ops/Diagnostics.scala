package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Round-12 distribution / series / corpus diagnostics — the audit
  * statistics a data platform runs NEXT to its pipelines: "is this
  * series white noise or structured" (Ljung–Box, PACF), "do the groups
  * differ in SPREAD, not just level" (Brown–Forsythe), "how
  * concentrated is this source's vocabulary" (Simpson), "how far has
  * this source drifted from the corpus" (Jensen–Shannon). All follow
  * the repo's determinism contract: exact int64 sufficient statistics
  * (integer-lattice scaling for any cross-row double reduction), one
  * mirrored IEEE formula tree per statistic, r6-rounded reports
  * (PARITY.md). Every integer-scaling site added here carries a row in
  * OverflowHeadroomSpec — the audit's source scan enforces it.
  */
object Diagnostics {

  /** Shared with Inference/Statistics/Timeseries: the day-index anchor
    * and the q_trend_fit daily frame — delegated to ONE home
    * (ops.Inference) so the Spark/oracle twins cannot drift across the
    * four files that use them (r12 review).
    */
  private val TrendAnchor = Inference.Anchor
  private def dailyCounts(s: SparkSession, d: String): DataFrame =
    Inference.dailyCounts(s, d)

  /** The Cohen's-kappa fold over a (true_lang, pred_lang, n) cell grid
    * — ONE home shared by batch q_cohens_kappa and the s_cohens_kappa
    * streaming read-time view (streaming.Streams.kappaCells maintains
    * the cell grid incrementally; κ never lives in state because it
    * isn't mergeable — the int64 cell counts are). Pure rational int64
    * until the final divisions. */
  private[graft] def kappaOf(c: DataFrame): DataFrame = {
    val rt = c.groupBy(col("true_lang").as("l")).agg(sum("n").as("r"))
    val ct = c.groupBy(col("pred_lang").as("l")).agg(sum("n").as("m"))
    val t = c.agg(sum("n").as("nn"),
      sum(when(col("true_lang") === col("pred_lang"), col("n")).otherwise(0L))
        .as("agree"))
    val pe = rt.join(ct, "l")
      .agg(coalesce(sum(col("r") * col("m")), lit(0L)).as("penum"))
    t.crossJoin(broadcast(pe))
      .select(col("nn").as("n_docs"), col("agree").as("n_agree"),
        Q.r6(col("agree").cast("double") / col("nn")).as("po"),
        Q.r6(col("penum").cast("double") /
          (col("nn").cast("double") * col("nn"))).as("pe"),
        when(col("nn") * col("nn") > col("penum"),
          Q.r6((col("nn") * col("agree") - col("penum")).cast("double") /
            (col("nn") * col("nn") - col("penum")))).as("kappa"))
  }
  private val dailySql: String = Inference.dailySql

  /** The q_acf estimator for lag k as a SQL expression over the exact
    * integer sums (n, s, ss, pk, ak, bk) — shared verbatim by the
    * Ljung–Box and PACF oracles so the three can never drift. */
  private def acfSql(k: String): String =
    s"CAST(n * n * pk - n * s * (ak + bk) + (n - $k) * s * s AS DOUBLE) / " +
      "(n * n * ss - n * s * s)"

  /** Spark twin of [[acfSql]]. */
  private def acfCol: org.apache.spark.sql.Column =
    (col("n") * col("n") * col("pk") - col("n") * col("s") * (col("ak") + col("bk")) +
      (col("n") - col("k")) * col("s") * col("s")).cast("double") /
      (col("n") * col("n") * col("ss") - col("n") * col("s") * col("s"))

  /** Lagged-product integer sums per (type, k ≤ maxLag) — q_acf's
    * single-scan shape (totals and 7 leads ride one window partition;
    * lag bucketing is by DAY difference, so missing days stay exact). */
  private def lagSums(s: SparkSession, d: String, maxLag: Int): DataFrame = {
    val daily = dailyCounts(s, d)
    val wt = Window.partitionBy("event_type")
    val wx = wt.orderBy("x")
    val withLeads = (1 to maxLag).foldLeft(
      daily
        .withColumn("n", count(lit(1)).over(wt))
        .withColumn("s", sum("y").over(wt))
        .withColumn("ss", sum(col("y") * col("y")).over(wt))) { (df, j) =>
      df.withColumn(s"x$j", lead("x", j).over(wx))
        .withColumn(s"y$j", lead("y", j).over(wx))
    }
    val stackArgs = (1 to maxLag).map(j => s"x$j - x, y$j").mkString(", ")
    withLeads
      .selectExpr("event_type", "n", "s", "ss", "y",
        s"stack($maxLag, $stackArgs) AS (k, yk)")
      .filter(col("yk").isNotNull && col("k").between(1, maxLag))
      .groupBy("event_type", "k")
      .agg(sum(col("y") * col("yk")).as("pk"),
        sum("y").as("ak"), sum(col("yk")).as("bk"),
        max("n").as("n"), max("s").as("s"), max("ss").as("ss"))
  }

  /** DuckDB twin of [[lagSums]] (the q_acf oracle's self-join form). */
  private def lagSumsSql(maxLag: Int): String =
    s"""daily AS ($dailySql),
       |tot AS (SELECT event_type, count(*) AS n, CAST(sum(y) AS BIGINT) AS s,
       |               CAST(sum(y * y) AS BIGINT) AS ss
       |        FROM daily GROUP BY 1),
       |p AS (SELECT a.event_type, l.k,
       |             CAST(sum(a.y * b.y) AS BIGINT) AS pk,
       |             CAST(sum(a.y) AS BIGINT) AS ak,
       |             CAST(sum(b.y) AS BIGINT) AS bk
       |      FROM daily a
       |      CROSS JOIN range(1, ${maxLag + 1}) l(k)
       |      JOIN daily b ON b.event_type = a.event_type AND b.x = a.x + l.k
       |      GROUP BY 1, 2),
       |lag_sums AS (SELECT p.event_type, p.k, pk, ak, bk, n, s, ss
       |             FROM p JOIN tot ON p.event_type = tot.event_type)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // Simpson diversity of each source's token distribution — the
    // repeat-draw collision probability, complementing q_token_diversity
    // (type/token ratio) and q_zipf_fit (rank-frequency slope) with the
    // concentration number a sampling-weights pass actually wants
    // ("draws from src3 repeat the same tokens 4x as often as src9").
    // D = 1 − Σc(c−1)/(n(n−1)) from EXACT int64 token counts — the
    // unbiased finite-sample estimator, no lattice needed because the
    // only division is the final one-per-source IEEE op, identical in
    // both engines. Shape: (source, tok) map-side agg (vocab-bounded),
    // then a |sources|-key rollup. Σc(c−1) < n² stays in int64 to
    // ~sf3000 at today's 5e5·sf tokens/source.
    Q("q_simpson_diversity",
      """WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT source, tok, count(*) AS c FROM w GROUP BY 1, 2),
        |g AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
        |             CAST(count(*) AS BIGINT) AS k,
        |             CAST(sum(c * (c - 1)) AS BIGINT) AS rep
        |      FROM c GROUP BY 1)
        |SELECT source, n AS n_tokens, k AS n_types,
        |       floor((1.0 - CAST(rep AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))*1000000+0.5)/1000000 AS simpson
        |FROM g
        |WHERE n > 1
        |ORDER BY source""".stripMargin) { (s, d) =>
      Tables.load(s, d, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum("c").as("n"), count(lit(1)).as("k"),
          sum(col("c") * (col("c") - 1)).as("rep"))
        .filter(col("n") > 1)
        .select(col("source"), col("n").as("n_tokens"), col("k").as("n_types"),
          Q.r6(lit(1.0) - col("rep").cast("double") /
            (col("n").cast("double") * (col("n") - 1))).as("simpson"))
        .orderBy("source")
    },

    // Ljung–Box portmanteau test per event type: Q = n(n+2)·Σ_{k≤7}
    // r_k²/(n−k) over the SAME acf estimator q_acf reports — "is the
    // daily series white noise at all lags jointly", the gate before
    // any AR/seasonal model (q_ar1, q_holt_linear) is fit. Each lag's
    // r_k²/(n−k) is integer-scaled to 1e-12 BEFORE the 7-term
    // cross-lag reduction, so the sum is order-free int64 (≤ 7e12 —
    // SF-invariant, r_k ≤ 1; OverflowHeadroomSpec row) and both
    // engines assemble Q from identical integers. Shape: rides
    // lagSums' one-scan window frame; the report is |types| rows.
    Q("q_ljung_box",
      s"""WITH ${lagSumsSql(7)},
         |t AS (SELECT event_type, max(n) AS n,
         |             CAST(sum(CAST(floor((${acfSql("k")}) * (${acfSql("k")}) / (n - k) * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS lb12
         |      FROM lag_sums GROUP BY 1)
         |SELECT event_type, n AS n_days,
         |       ${Q.sqlR6("n * (n + 2) * (lb12 / 1e12)")} AS q_stat
         |FROM t
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      lagSums(s, d, 7)
        .groupBy("event_type")
        .agg(max("n").as("n"),
          sum(floor(acfCol * acfCol / (col("n") - col("k")) * lit(1e12) + 0.5)
            .cast("long")).as("lb12"))
        .select(col("event_type"), col("n").as("n_days"),
          Q.r6(col("n") * (col("n") + 2) * (col("lb12") / lit(1e12))).as("q_stat"))
        .orderBy("event_type")
    },

    // Partial autocorrelation (lags 1–3) per event type by the
    // Durbin–Levinson recursion in closed form over the q_acf
    // estimator: φ11 = r1; φ22 = (r2 − r1²)/(1 − r1²);
    // φ33 = (r3 − φ21·r2 − φ22·r1)/(1 − φ21·r1 − φ22·r2) with
    // φ21 = φ11 − φ22·φ11 — the AR-order fingerprint ("is the
    // persistence one-day-deep or does day-before-yesterday still
    // speak"). The three r_k land on one row per type via conditional
    // max (single value per (type, k) — no cross-row double SUM, so no
    // lattice is needed); the recursion is then one mirrored IEEE tree.
    Q("q_pacf",
      s"""WITH ${lagSumsSql(3)},
         |r AS (SELECT event_type, max(n) AS n,
         |             max(CASE WHEN k = 1 THEN ${acfSql("k")} END) AS r1,
         |             max(CASE WHEN k = 2 THEN ${acfSql("k")} END) AS r2,
         |             max(CASE WHEN k = 3 THEN ${acfSql("k")} END) AS r3
         |      FROM lag_sums GROUP BY 1),
         |f AS (SELECT event_type, n, r1, r2, r3,
         |             (r2 - r1 * r1) / (1 - r1 * r1) AS f22
         |      FROM r),
         |g AS (SELECT event_type, n, r1, r2, r3, f22,
         |             r1 - f22 * r1 AS f21
         |      FROM f)
         |SELECT event_type, n AS n_days,
         |       ${Q.sqlR6("r1")} AS phi1,
         |       ${Q.sqlR6("f22")} AS phi2,
         |       ${Q.sqlR6("(r3 - f21 * r2 - f22 * r1) / (1 - f21 * r1 - f22 * r2)")} AS phi3
         |FROM g
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val r = lagSums(s, d, 3)
        .groupBy("event_type")
        .agg(max("n").as("n"),
          max(when(col("k") === 1, acfCol)).as("r1"),
          max(when(col("k") === 2, acfCol)).as("r2"),
          max(when(col("k") === 3, acfCol)).as("r3"))
      val f22 = (col("r2") - col("r1") * col("r1")) / (lit(1) - col("r1") * col("r1"))
      val withF = r.withColumn("f22", f22)
        .withColumn("f21", col("r1") - col("f22") * col("r1"))
      withF.select(col("event_type"), col("n").as("n_days"),
          Q.r6(col("r1")).as("phi1"),
          Q.r6(col("f22")).as("phi2"),
          Q.r6((col("r3") - col("f21") * col("r2") - col("f22") * col("r1")) /
            (lit(1) - col("f21") * col("r1") - col("f22") * col("r2"))).as("phi3"))
        .orderBy("event_type")
    },

    // Brown–Forsythe test (median-based Levene): do event types differ
    // in value SPREAD, not just mean — q_anova's blind spot (ANOVA's F
    // answers location; equal means with 3x the variance pass it).
    // The deviation base is the interpolated median DOUBLED — 2·median
    // of ints is a + b, an EXACT int64 for even and odd counts alike —
    // so z2 = |2v − m2| is an exact integer and the one-way ANOVA on
    // z2 (F is scale-invariant, so F(z2) = F(z)) runs on exact int64
    // sufficient statistics through q_anova's b6 lattice. Shape: one
    // corpus scan for the per-type median (a percentile over ≤5
    // single-type partitions), one for the z2 ANOVA; |types|-key aggs.
    Q("q_brown_forsythe",
      s"""WITH m AS (SELECT event_type, CAST(floor(value) AS BIGINT) AS v FROM events),
         |med AS (SELECT event_type, CAST(2 * median(v) AS BIGINT) AS m2 FROM m GROUP BY 1),
         |z AS (SELECT m.event_type, abs(2 * v - m2) AS z2
         |      FROM m JOIN med ON m.event_type = med.event_type),
         |g AS (SELECT event_type, count(*) AS n, CAST(sum(z2) AS BIGINT) AS s,
         |             CAST(sum(z2 * z2) AS BIGINT) AS ss
         |      FROM z GROUP BY 1),
         |t AS (SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS nn,
         |             CAST(sum(s) AS BIGINT) AS stot, CAST(sum(ss) AS BIGINT) AS sstot,
         |             CAST(sum(CAST(floor(CAST(s AS DOUBLE) * s / n * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS b6
         |      FROM g)
         |SELECT k, nn AS n,
         |       ${Q.sqlR6("((b6 / 1e6 - CAST(stot AS DOUBLE) * stot / nn) / (k - 1)) / ((sstot - b6 / 1e6) / (nn - k))")} AS f_stat
         |FROM t""".stripMargin) { (s, d) =>
      val m = Tables.events(s, d)
        .select(col("event_type"), floor(col("value")).cast("long").as("v"))
      val med = m.groupBy("event_type")
        .agg((expr("percentile(v, 0.5)") * 2).cast("long").as("m2"))
      val g = m.join(broadcast(med), "event_type")
        .select(col("event_type"), abs(lit(2) * col("v") - col("m2")).as("z2"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("z2").as("s"),
          sum(col("z2") * col("z2")).as("ss"))
      g.agg(count(lit(1)).as("k"), sum("n").as("nn"),
          sum("s").as("stot"), sum("ss").as("sstot"),
          sum(floor(col("s").cast("double") * col("s") / col("n") * lit(1e6) + 0.5)
            .cast("long")).as("b6"))
        .select(col("k"), col("nn").as("n"),
          Q.r6(((col("b6") / lit(1e6) - col("stot").cast("double") * col("stot") / col("nn")) /
              (col("k") - 1)) /
            ((col("sstot") - col("b6") / lit(1e6)) / (col("nn") - col("k")))).as("f_stat"))
    },

    // Jensen–Shannon divergence of each source's token distribution
    // from the corpus distribution — the drift number a mixture-weights
    // pass (q_mix_weights) wants per feed: symmetric, bounded by ln 2,
    // zero iff identical. Support is the top-200 corpus tokens plus one
    // OTHER bucket (201 cells per source — the domain-bounded shuffle
    // key contract: the full-vocab version would key a shuffle on
    // content). The (source × bucket) grid is completed with explicit
    // zeros so absent buckets still contribute their corpus half; each
    // cell's 0.5·p·ln(p/m) + 0.5·q·ln(q/m) is integer-scaled to 1e-9
    // BEFORE the 201-cell reduction (order-free int64, Σ ≤ ln2·1e9 —
    // OverflowHeadroomSpec row). Exact counts everywhere else.
    Q("q_js_divergence",
      """WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT tok, count(*) AS cnt FROM w GROUP BY 1),
        |top AS (SELECT tok FROM c ORDER BY cnt DESC, tok LIMIT 200),
        |sb AS (SELECT source, CASE WHEN tok IN (SELECT tok FROM top) THEN tok ELSE '~other~' END AS bucket,
        |              count(*) AS c
        |       FROM w GROUP BY 1, 2),
        |buckets AS (SELECT tok AS bucket FROM top UNION ALL SELECT '~other~'),
        |srcs AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM sb GROUP BY 1),
        |cb AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS cc FROM sb GROUP BY 1),
        |nc AS (SELECT CAST(sum(c) AS BIGINT) AS nc FROM sb),
        |grid AS (SELECT s.source, s.ns, b.bucket,
        |                COALESCE(sb.c, 0) AS cs, COALESCE(cb.cc, 0) AS cc, nc.nc
        |         FROM srcs s CROSS JOIN buckets b
        |         LEFT JOIN sb ON sb.source = s.source AND sb.bucket = b.bucket
        |         LEFT JOIN cb ON cb.bucket = b.bucket
        |         CROSS JOIN nc),
        |cells AS (SELECT source, ns,
        |                 CAST(cs AS DOUBLE) / ns AS p,
        |                 CAST(cc AS DOUBLE) / nc AS q
        |          FROM grid),
        |contrib AS (SELECT source, ns,
        |                   CAST(floor((CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0 END +
        |                               CASE WHEN q > 0 THEN 0.5 * q * ln(q / ((p + q) / 2)) ELSE 0 END) * 1e9 + 0.5) AS BIGINT) AS c9
        |            FROM cells)
        |SELECT source, max(ns) AS n_tokens,
        |       floor((sum(c9) / 1e9)*1000000+0.5)/1000000 AS js
        |FROM contrib
        |GROUP BY source
        |ORDER BY source""".stripMargin) { (s, d) =>
      val w = Tables.load(s, d, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      val top = w.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(200)
        .select(col("tok").as("ttok"))
      val sb = w.join(broadcast(top), col("tok") === col("ttok"), "left")
        .select(col("source"),
          coalesce(col("ttok"), lit("~other~")).as("bucket"))
        .groupBy("source", "bucket").agg(count(lit(1)).as("c"))
      val buckets = top.select(col("ttok").as("bucket"))
        .unionAll(s.range(1).select(lit("~other~").as("bucket")))
      val srcs = sb.groupBy("source").agg(sum("c").as("ns"))
      val cb = sb.groupBy("bucket").agg(sum("c").as("cc"))
      val ncDf = sb.agg(sum("c").as("nc"))
      val grid = srcs.crossJoin(broadcast(buckets))
        .join(sb, Seq("source", "bucket"), "left")
        .join(broadcast(cb), Seq("bucket"), "left")
        .crossJoin(broadcast(ncDf))
        .select(col("source"), col("ns"),
          (coalesce(col("c"), lit(0L)).cast("double") / col("ns")).as("p"),
          (coalesce(col("cc"), lit(0L)).cast("double") / col("nc")).as("q"))
      val mm = (col("p") + col("q")) / 2
      val c9 = floor((when(col("p") > 0, lit(0.5) * col("p") * log(col("p") / mm)).otherwise(lit(0.0)) +
        when(col("q") > 0, lit(0.5) * col("q") * log(col("q") / mm)).otherwise(lit(0.0))) *
        lit(1e9) + 0.5).cast("long")
      grid.select(col("source"), col("ns"), c9.as("c9"))
        .groupBy("source")
        .agg(max("ns").as("n_tokens"), Q.r6(sum("c9") / lit(1e9)).as("js"))
        .orderBy("source")
    },

    // Heaps-law vocabulary growth fit: V(n) ≈ K·n^β over six geometric
    // corpus prefixes — "how fast does new data stop bringing new
    // words", the diminishing-returns readout a data-acquisition plan
    // reads next to q_corpus_yield. Prefixes are doc_id < N/2^j (N and
    // the thresholds are exact integers in both engines); V_j counts
    // tokens whose FIRST appearance (min doc_id — one vocab-keyed agg)
    // falls inside the prefix, n_j sums per-doc token counts inside it
    // — so all 12 coordinates are exact int64 from TWO bounded aggs
    // and the log-log OLS runs IN-ROW over six fixed-order doubles
    // (no cross-row double reduction ⇒ no lattice needed).
    Q("q_heaps_fit", {
      val xs = (0 to 5).map(j => s"ln(CAST(n${j} AS DOUBLE))").mkString(", ")
      val ys = (0 to 5).map(j => s"ln(CAST(v${j} AS DOUBLE))").mkString(", ")
      // thresholds clamp to ≥1 doc: below 32 docs a raw nd//32 = 0
      // prefix would put ln(0) in the fit — which Spark's log turns
      // into NULL while DuckDB returns -inf, an engine divergence the
      // shipped corpora (≥500 docs) never reach but a regenerated tiny
      // corpus would
      val vCols = (0 to 5).map(j =>
        s"CAST(sum(CASE WHEN fa < greatest(nd // ${1 << (5 - j)}, 1) THEN 1 ELSE 0 END) AS BIGINT) AS v$j").mkString(", ")
      val nCols = (0 to 5).map(j =>
        s"CAST(sum(CASE WHEN doc_id < greatest(nd // ${1 << (5 - j)}, 1) THEN ntok ELSE 0 END) AS BIGINT) AS n$j").mkString(", ")
      s"""WITH nd AS (SELECT count(*) AS nd FROM documents),
         |w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |fa AS (SELECT tok, min(doc_id) AS fa FROM w GROUP BY 1),
         |vv AS (SELECT $vCols FROM fa CROSS JOIN nd),
         |dt AS (SELECT doc_id, len(string_split(text, ' ')) AS ntok FROM documents),
         |nn AS (SELECT $nCols FROM dt CROSS JOIN nd),
         |pts AS (SELECT [$xs] AS x, [$ys] AS y FROM vv CROSS JOIN nn),
         |st AS (SELECT x[1]+x[2]+x[3]+x[4]+x[5]+x[6] AS sx, y[1]+y[2]+y[3]+y[4]+y[5]+y[6] AS sy,
         |              x[1]*y[1]+x[2]*y[2]+x[3]*y[3]+x[4]*y[4]+x[5]*y[5]+x[6]*y[6] AS sxy,
         |              x[1]*x[1]+x[2]*x[2]+x[3]*x[3]+x[4]*x[4]+x[5]*x[5]+x[6]*x[6] AS sxx
         |       FROM pts)
         |SELECT (SELECT nd FROM nd) AS n_docs,
         |       (SELECT v5 FROM vv) AS vocab,
         |       (SELECT n5 FROM nn) AS n_tokens,
         |       ${Q.sqlR6("(6 * sxy - sx * sy) / (6 * sxx - sx * sx)")} AS beta,
         |       ${Q.sqlR6("(sy - (6 * sxy - sx * sy) / (6 * sxx - sx * sx) * sx) / 6")} AS ln_k
         |FROM st""".stripMargin
    }) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      val ndDf = docs.agg(count(lit(1)).as("nd"))
      val fa = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(min("doc_id").as("fa"))
      val vAggs = (0 to 5).map(j =>
        sum(when(col("fa") < expr(s"greatest(nd div ${1 << (5 - j)}, 1)"), 1L).otherwise(0L)).as(s"v$j"))
      val vv = fa.crossJoin(broadcast(ndDf)).agg(vAggs.head, vAggs.tail: _*)
      val nAggs = (0 to 5).map(j =>
        sum(when(col("doc_id") < expr(s"greatest(nd div ${1 << (5 - j)}, 1)"), col("ntok")).otherwise(0L)).as(s"n$j"))
      val nn = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("ntok"))
        .crossJoin(broadcast(ndDf)).agg(nAggs.head, nAggs.tail: _*)
      val pts = vv.crossJoin(nn).crossJoin(broadcast(ndDf))
      // in-row fixed-order sums over the six (ln n_j, ln V_j) points —
      // textual order mirrors the oracle's bracket arithmetic exactly
      def x(j: Int) = log(col(s"n$j").cast("double"))
      def y(j: Int) = log(col(s"v$j").cast("double"))
      val sx = (1 to 5).foldLeft(x(0))((a, j) => a + x(j))
      val sy = (1 to 5).foldLeft(y(0))((a, j) => a + y(j))
      val sxy = (1 to 5).foldLeft(x(0) * y(0))((a, j) => a + x(j) * y(j))
      val sxx = (1 to 5).foldLeft(x(0) * x(0))((a, j) => a + x(j) * x(j))
      val beta = (lit(6) * sxy - sx * sy) / (lit(6) * sxx - sx * sx)
      pts.select(col("nd").as("n_docs"), col("v5").as("vocab"), col("n5").as("n_tokens"),
        Q.r6(beta).as("beta"),
        Q.r6((sy - beta * sx) / 6).as("ln_k"))
    },

    // SAX symbolic motif census per event type: per-type daily volume
    // z-scored onto 3 equiprobable gaussian symbols (breakpoint
    // ±0.4307), then 3-day motifs counted over CONSECUTIVE days — the
    // shape alphabet behind symbolic anomaly screens ("how often does
    // low-low-high happen"). Determinism: the z comparison is cleared
    // of fractions — n·y − s (exact int64) against ±0.4307·n·σ where σ
    // comes from the one mirrored moment tree — so both engines bucket
    // identically even at boundaries (same doubles, same comparison);
    // motif counts are pure int64. Shape: everything after the daily
    // rollup lives on the (|types|×|days|) frame and its single
    // event_type exchange.
    Q("q_sax_motifs",
      s"""WITH daily AS ($dailySql),
         |st AS (SELECT event_type, count(*) AS n, CAST(sum(y) AS BIGINT) AS s,
         |               CAST(sum(y * y) AS BIGINT) AS ss
         |        FROM daily GROUP BY 1),
         |z AS (SELECT d.event_type, d.x,
         |             CASE WHEN n * y - s < -0.4307 * sqrt(CAST(n AS DOUBLE) * ss - CAST(s AS DOUBLE) * s) THEN 'a'
         |                  WHEN n * y - s <= 0.4307 * sqrt(CAST(n AS DOUBLE) * ss - CAST(s AS DOUBLE) * s) THEN 'b'
         |                  ELSE 'c' END AS sym
         |      FROM daily d JOIN st ON d.event_type = st.event_type),
         |m AS (SELECT event_type, x, sym,
         |             lead(x, 1) OVER (PARTITION BY event_type ORDER BY x) AS x1,
         |             lead(sym, 1) OVER (PARTITION BY event_type ORDER BY x) AS s1,
         |             lead(x, 2) OVER (PARTITION BY event_type ORDER BY x) AS x2,
         |             lead(sym, 2) OVER (PARTITION BY event_type ORDER BY x) AS s2
         |      FROM z)
         |SELECT event_type, sym || s1 || s2 AS motif, count(*) AS n
         |FROM m
         |WHERE x1 = x + 1 AND x2 = x + 2
         |GROUP BY 1, 2
         |ORDER BY event_type, motif""".stripMargin) { (s, d) =>
      val daily = dailyCounts(s, d)
      val wt = Window.partitionBy("event_type")
      val wx = wt.orderBy("x")
      val nsd = daily
        .withColumn("n", count(lit(1)).over(wt))
        .withColumn("s", sum("y").over(wt))
        .withColumn("ss", sum(col("y") * col("y")).over(wt))
      val spread = sqrt(col("n").cast("double") * col("ss") - col("s").cast("double") * col("s"))
      val dev = col("n") * col("y") - col("s")
      val z = nsd.select(col("event_type"), col("x"),
        when(dev < lit(-0.4307) * spread, "a")
          .when(dev <= lit(0.4307) * spread, "b")
          .otherwise("c").as("sym"))
      z.withColumn("x1", lead("x", 1).over(wx))
        .withColumn("s1", lead("sym", 1).over(wx))
        .withColumn("x2", lead("x", 2).over(wx))
        .withColumn("s2", lead("sym", 2).over(wx))
        .filter(col("x1") === col("x") + 1 && col("x2") === col("x") + 2)
        .select(col("event_type"), concat(col("sym"), col("s1"), col("s2")).as("motif"))
        .groupBy("event_type", "motif").agg(count(lit(1)).as("n"))
        .orderBy("event_type", "motif")
    },

    // Cross-document 5-gram duplication per source: what share of each
    // document's distinct 5-grams also appear in ANOTHER document —
    // the contamination/boilerplate lens BETWEEN near-dup detection
    // (whole-doc) and exact dedup (identical docs): high dup share
    // with low near-dup rate means shared boilerplate fragments. One
    // in-row distinct 5-gram expansion (the shingles shape, width 5),
    // then gram df via a partition-only WINDOW over (lang, gram) — the
    // shinglePairStats trick: the df ride shares the one content-keyed
    // exchange instead of spending an agg + join-back second shuffle
    // (measured 1.87 s → the window form saves the re-shuffle of the
    // gram payload). Exact int64 everywhere, |sources|-key rollup.
    Q("q_cross_doc_ngram",
      """WITH w AS (SELECT doc_id, lang, source, string_split(text, ' ') AS words FROM documents),
        |g AS (SELECT DISTINCT doc_id, lang, source,
        |             unnest(list_transform(range(1, len(words) - 3),
        |                    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' || words[i+3] || ' ' || words[i+4])) AS gram
        |      FROM w WHERE len(words) >= 5),
        |df AS (SELECT lang, gram, count(*) AS df FROM g GROUP BY 1, 2),
        |per_doc AS (SELECT g.doc_id, g.source, count(*) AS n_grams,
        |                   CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams
        |            FROM g JOIN df ON g.lang = df.lang AND g.gram = df.gram
        |            GROUP BY 1, 2)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_grams) AS BIGINT) AS grams_total,
        |       CAST(sum(dup_grams) AS BIGINT) AS grams_shared,
        |       floor((CAST(sum(dup_grams) AS DOUBLE) / sum(n_grams))*1000000+0.5)/1000000 AS dup_share
        |FROM per_doc
        |GROUP BY source
        |ORDER BY source""".stripMargin) { (s, d) =>
      val g = Tables.load(s, d, "documents")
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 5)
        .select(col("doc_id"), col("lang"), col("source"),
          explode(array_distinct(expr(
            """transform(sequence(0, size(words) - 5),
              |          i -> concat_ws(' ', words[i], words[i+1], words[i+2], words[i+3], words[i+4]))""".stripMargin)))
            .as("gram"))
      g.withColumn("df", count(lit(1)).over(Window.partitionBy("lang", "gram")))
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") >= 2, 1L).otherwise(0L)).as("dup_grams"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_grams").as("grams_total"),
          sum("dup_grams").as("grams_shared"),
          Q.r6(sum("dup_grams").cast("double") / sum("n_grams")).as("dup_share"))
        .orderBy("source")
    },

    // Entropy rate of the event-type Markov chain: H = Σ_i π_i Σ_j
    // p_ij ln(1/p_ij) with π from q_markov_stationary's 3 unrolled
    // power iterations — "how predictable is the NEXT event given the
    // current one", the sequence-compressibility number next to
    // q_cat_entropy's marginal entropy (H_rate ≤ H_marginal; the gap
    // is what session structure buys a predictor). π is carried on the
    // same 1e-12 lattice as q_markov_stationary (bit-identical vectors
    // both engines), each cell's π·p·ln(1/p) integer-scaled to 1e-9
    // before the ≤25-cell fold. One corpus-side lead() window, then
    // everything lives on the |types|²-row matrix frame.
    Q("q_entropy_rate",
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
         |q3 AS (SELECT t, CAST(s AS DOUBLE) / 1e12 AS p FROM p3),
         |h AS (SELECT CAST(sum(CAST(floor(q3.p * m.prob * ln(1.0 / m.prob) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS h9
         |      FROM m JOIN q3 ON q3.t = m.cur)
         |SELECT (SELECT CAST(k AS BIGINT) FROM t0) AS k_states,
         |       ${Q.sqlR6("(SELECT h9 FROM h) / 1e9")} AS entropy_rate,
         |       ${Q.sqlR6("ln(CAST((SELECT k FROM t0) AS DOUBLE))")} AS uniform_bound,
         |       CASE WHEN (SELECT k FROM t0) > 1 THEN ${Q.sqlR6("((SELECT h9 FROM h) / 1e9) / ln(CAST((SELECT k FROM t0) AS DOUBLE))")} END AS efficiency""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("es", "event_id")
      val wc = Window.partitionBy("cur")
      val c = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          Q.epochSec(col("ts")).as("es"))
        .select(col("event_type").as("cur"), lead("event_type", 1).over(w).as("nxt"))
        .filter(col("nxt").isNotNull)
        .groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
        .transform(Q.snapshot) // matrix + k + iteration all read this frame
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
      m.join(p.withColumnRenamed("t", "src"), col("src") === col("cur"))
        .agg(sum(floor(col("p") * col("prob") * log(lit(1.0) / col("prob")) *
          lit(1e9) + 0.5).cast("long")).as("h9"))
        .crossJoin(broadcast(k))
        .select(col("k").cast("long").as("k_states"),
          Q.r6(col("h9") / lit(1e9)).as("entropy_rate"),
          Q.r6(log(col("k").cast("double"))).as("uniform_bound"),
          // a single-state chain makes efficiency 0/0 (ln k = 0) →
          // NULL on both sides, never NaN (the q_cat_entropy lesson)
          when(col("k") > 1,
            Q.r6((col("h9") / lit(1e9)) / log(col("k").cast("double")))).as("efficiency"))
    },

    // Hurst exponent by rescaled-range analysis of per-type daily
    // volume: R/S over full blocks of 7/14/28 days, then the log-log
    // slope — long-memory vs mean-reversion (H>0.5 trending, <0.5
    // reverting), the persistence diagnostic above q_ar1's one-lag
    // view. Determinism: within a block the partial-sum deviations are
    // cleared of fractions — w·cum_j − j·S_w is EXACT int64 — so R·w
    // is an integer range and R/S = (R·w)/sqrt(w·SS − S_w²) is one
    // mirrored IEEE tree per block; per-(type, w) block means ride a
    // 1e-6 lattice (order-free — OverflowHeadroomSpec row), and the
    // 3-point slope is in-row fixed-order arithmetic. Degenerate
    // blocks (constant series ⇒ S = 0) are excluded identically on
    // both sides. Shape: all windows live on the daily frame's one
    // event_type exchange; blocks are calendar-bounded.
    Q("q_hurst",
      s"""WITH daily AS ($dailySql),
         |blk AS (SELECT event_type, w.w, x // w.w AS b, x, y
         |        FROM daily CROSS JOIN (SELECT unnest([7, 14, 28]) AS w) w),
         |full_blk AS (SELECT event_type, w, b
         |             FROM blk GROUP BY 1, 2, 3 HAVING count(*) = w),
         |o AS (SELECT blk.event_type, blk.w, blk.b, blk.x, blk.y,
         |             CAST(sum(blk.y) OVER (PARTITION BY blk.event_type, blk.w, blk.b
         |                                   ORDER BY blk.x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |             row_number() OVER (PARTITION BY blk.event_type, blk.w, blk.b ORDER BY blk.x) AS j,
         |             CAST(sum(blk.y) OVER (PARTITION BY blk.event_type, blk.w, blk.b) AS BIGINT) AS sw,
         |             CAST(sum(blk.y * blk.y) OVER (PARTITION BY blk.event_type, blk.w, blk.b) AS BIGINT) AS ssw
         |      FROM blk JOIN full_blk USING (event_type, w, b)),
         |dev AS (SELECT event_type, w, b, sw, ssw, w * cum - j * sw AS dw FROM o),
         |rs AS (SELECT event_type, w, b,
         |              CAST(floor((max(dw) - min(dw)) / sqrt(CAST(w AS DOUBLE) * max(ssw) - CAST(max(sw) AS DOUBLE) * max(sw)) * 1e6 + 0.5) AS BIGINT) AS rs6
         |       FROM dev
         |       WHERE w * ssw > sw * sw
         |       GROUP BY 1, 2, 3, sw, ssw
         |       HAVING CAST(w AS DOUBLE) * max(ssw) > CAST(max(sw) AS DOUBLE) * max(sw)),
         |a AS (SELECT event_type,
         |             sum(CASE WHEN w = 7 THEN rs6 END) / (1e6 * sum(CASE WHEN w = 7 THEN 1 END)) AS rs7,
         |             sum(CASE WHEN w = 14 THEN rs6 END) / (1e6 * sum(CASE WHEN w = 14 THEN 1 END)) AS rs14,
         |             sum(CASE WHEN w = 28 THEN rs6 END) / (1e6 * sum(CASE WHEN w = 28 THEN 1 END)) AS rs28
         |      FROM rs GROUP BY 1),
         |f AS (SELECT event_type, rs7, rs14, rs28,
         |             ln(7.0) + ln(14.0) + ln(28.0) AS sx,
         |             ln(rs7) + ln(rs14) + ln(rs28) AS sy,
         |             ln(7.0)*ln(rs7) + ln(14.0)*ln(rs14) + ln(28.0)*ln(rs28) AS sxy,
         |             ln(7.0)*ln(7.0) + ln(14.0)*ln(14.0) + ln(28.0)*ln(28.0) AS sxx
         |      FROM a WHERE rs7 > 0 AND rs14 > 0 AND rs28 > 0)
         |SELECT event_type,
         |       ${Q.sqlR6("rs7")} AS rs7, ${Q.sqlR6("rs14")} AS rs14, ${Q.sqlR6("rs28")} AS rs28,
         |       ${Q.sqlR6("(3 * sxy - sx * sy) / (3 * sxx - sx * sx)")} AS hurst
         |FROM f
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val daily = dailyCounts(s, d)
      val ws = s.range(1).select(explode(array(lit(7L), lit(14L), lit(28L))).as("w"))
      val blk = daily.crossJoin(broadcast(ws))
        // FLOOR division to mirror DuckDB's `//`: Spark's `div`
        // truncates toward zero, which diverges on negative day
        // indices (events before the anchor) — (x − pmod(x, w)) / w is
        // exact integer floor division for any sign (r12 review)
        .withColumn("b", ((col("x") - pmod(col("x"), col("w"))) / col("w")).cast("long"))
      val wb = Window.partitionBy("event_type", "w", "b")
      val wbx = wb.orderBy("x")
      val o = blk
        .withColumn("cnt", count(lit(1)).over(wb))
        .filter(col("cnt") === col("w"))
        .withColumn("cum", sum("y").over(wbx.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("j", row_number().over(wbx))
        .withColumn("sw", sum("y").over(wb))
        .withColumn("ssw", sum(col("y") * col("y")).over(wb))
        .withColumn("dw", col("w") * col("cum") - col("j") * col("sw"))
      val rs = o
        .filter(col("w") * col("ssw") > col("sw") * col("sw"))
        .groupBy("event_type", "w", "b")
        .agg(floor((max("dw") - min("dw")) /
          sqrt(first("w").cast("double") * max("ssw") - max("sw").cast("double") * max("sw")) *
          lit(1e6) + 0.5).cast("long").as("rs6"))
      val a = rs.groupBy("event_type")
        .agg(
          (sum(when(col("w") === 7, col("rs6"))) /
            (lit(1e6) * sum(when(col("w") === 7, 1)))).as("rs7"),
          (sum(when(col("w") === 14, col("rs6"))) /
            (lit(1e6) * sum(when(col("w") === 14, 1)))).as("rs14"),
          (sum(when(col("w") === 28, col("rs6"))) /
            (lit(1e6) * sum(when(col("w") === 28, 1)))).as("rs28"))
        .filter(col("rs7") > 0 && col("rs14") > 0 && col("rs28") > 0)
      val sx = log(lit(7.0)) + log(lit(14.0)) + log(lit(28.0))
      val sy = log(col("rs7")) + log(col("rs14")) + log(col("rs28"))
      val sxy = log(lit(7.0)) * log(col("rs7")) + log(lit(14.0)) * log(col("rs14")) +
        log(lit(28.0)) * log(col("rs28"))
      val sxx = log(lit(7.0)) * log(lit(7.0)) + log(lit(14.0)) * log(lit(14.0)) +
        log(lit(28.0)) * log(lit(28.0))
      a.select(col("event_type"),
          Q.r6(col("rs7")).as("rs7"), Q.r6(col("rs14")).as("rs14"),
          Q.r6(col("rs28")).as("rs28"),
          Q.r6((lit(3) * sxy - sx * sy) / (lit(3) * sxx - sx * sx)).as("hurst"))
        .orderBy("event_type")
    },

    // Exact document-length percentiles per source — q_tail_exact's
    // domain-collapse trick applied to the corpus catalog: lengths
    // fold to the ≤|distinct n_chars| frame per source, percentiles
    // are the FIRST INTEGER CROSSING of the running count (ceil
    // targets via integer division — no float percentile semantics, no
    // corpus sort). The length-filter tuning readout ("where does a
    // 512-char floor cut src7") next to q_quality_score.
    Q("q_length_profile",
      """WITH m AS (SELECT source, n_chars, count(*) AS c FROM documents GROUP BY 1, 2),
        |w AS (SELECT source, n_chars, c,
        |             CAST(sum(c) OVER (PARTITION BY source ORDER BY n_chars) AS BIGINT) AS cum,
        |             CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n
        |      FROM m)
        |SELECT source, max(n) AS n_docs,
        |       min(CASE WHEN cum >= (n + 1) // 2 THEN n_chars END) AS p50_chars,
        |       min(CASE WHEN cum >= (9 * n + 9) // 10 THEN n_chars END) AS p90_chars,
        |       max(n_chars) AS max_chars
        |FROM w
        |GROUP BY source
        |ORDER BY source""".stripMargin) { (s, d) =>
      val w = Tables.load(s, d, "documents")
        .groupBy("source", "n_chars").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(
          Window.partitionBy("source").orderBy("n_chars")))
        .withColumn("n", sum("c").over(Window.partitionBy("source")))
      w.groupBy("source")
        .agg(max("n").as("n_docs"),
          min(when(col("cum") >= expr("(n + 1) div 2"), col("n_chars"))).as("p50_chars"),
          min(when(col("cum") >= expr("(9 * n + 9) div 10"), col("n_chars"))).as("p90_chars"),
          max("n_chars").as("max_chars"))
        .orderBy("source")
    },

    // Stopword mass per language: the combined share of each lang's
    // ten most frequent tokens (ties broken by token) plus the top
    // token itself — the "how much of this feed is glue words" number
    // that calibrates q_quality_score's stopword-ratio feature and
    // sizes a stopword list per lang. One (lang, tok) agg
    // (vocab-bounded), rank window over that frame only, |langs| rows.
    Q("q_stopword_profile",
      """WITH c AS (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |g AS (SELECT lang, tok, count(*) AS cnt FROM c GROUP BY 1, 2),
        |r AS (SELECT lang, tok, cnt,
        |             row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS rk,
        |             CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS nl
        |      FROM g)
        |SELECT lang, max(nl) AS n_tokens,
        |       max(CASE WHEN rk = 1 THEN tok END) AS top_token,
        |       floor((CAST(sum(CASE WHEN rk <= 10 THEN cnt ELSE 0 END) AS DOUBLE) / max(nl))*1000000+0.5)/1000000 AS top10_share
        |FROM r
        |GROUP BY lang
        |ORDER BY lang""".stripMargin) { (s, d) =>
      val g = Tables.load(s, d, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
      val r = g
        .withColumn("rk", row_number().over(
          Window.partitionBy("lang").orderBy(col("cnt").desc, col("tok"))))
        .withColumn("nl", sum("cnt").over(Window.partitionBy("lang")))
      r.groupBy("lang")
        .agg(max("nl").as("n_tokens"),
          max(when(col("rk") === 1, col("tok"))).as("top_token"),
          Q.r6(sum(when(col("rk") <= 10, col("cnt")).otherwise(0L)).cast("double") /
            max("nl")).as("top10_share"))
        .orderBy("lang")
    },

    // Audience overlap between event types: per type pair, the Jaccard
    // of their distinct user sets — "do purchasers also click, or are
    // the segments disjoint", the co-engagement matrix behind any
    // cross-sell or funnel hypothesis. The corpus collapses to the
    // (user, type) distinct frame ONCE; pair expansion is IN-ROW over
    // each user's sorted type set (≤|types| per user — the assoc_rules
    // shape, never a user-level self-join), and the rollup lands on
    // ≤C(|types|,2) keys. Counts exact int64.
    Q("q_audience_overlap",
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |nu AS (SELECT event_type, CAST(count(*) AS BIGINT) AS u FROM ut GROUP BY 1),
        |p AS (SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS shared
        |      FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT p.t1, p.t2, n1.u AS users_1, n2.u AS users_2,
        |       CAST(p.shared AS BIGINT) AS shared,
        |       floor((CAST(p.shared AS DOUBLE) / (n1.u + n2.u - p.shared))*10000+0.5)/10000 AS jaccard
        |FROM p JOIN nu n1 ON p.t1 = n1.event_type
        |       JOIN nu n2 ON p.t2 = n2.event_type
        |ORDER BY t1, t2""".stripMargin) { (s, d) =>
      val ut = Tables.events(s, d).select("user_id", "event_type").distinct()
      val nu = ut.groupBy("event_type").agg(count(lit(1)).as("u"))
      val pairs = ut.groupBy("user_id")
        .agg(sort_array(collect_set(col("event_type"))).as("ts"))
        .select(explode(expr(
          """flatten(transform(ts, (x, i) ->
            |  transform(slice(ts, i + 2, size(ts)), y -> struct(x AS t1, y AS t2))))""".stripMargin))
          .as("p"))
        .groupBy(col("p.t1").as("t1"), col("p.t2").as("t2"))
        .agg(count(lit(1)).as("shared"))
      pairs
        .join(broadcast(nu.select(col("event_type").as("t1"), col("u").as("users_1"))), "t1")
        .join(broadcast(nu.select(col("event_type").as("t2"), col("u").as("users_2"))), "t2")
        .select(col("t1"), col("t2"), col("users_1"), col("users_2"), col("shared"),
          Q.r4(col("shared").cast("double") /
            (col("users_1") + col("users_2") - col("shared"))).as("jaccard"))
        .orderBy("t1", "t2")
    },

    // Token length histogram per language: how long this lang's tokens
    // run — the subword-tokenizer design input (fertility estimates,
    // byte-budget planning) next to q_token_count's whole-doc counts.
    // One (lang, length) agg with map-side partials onto a ≤|langs|×
    // |length-domain| grid; shares are one IEEE division per cell.
    Q("q_token_len_hist",
      """WITH c AS (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |g AS (SELECT lang, CAST(len(tok) AS BIGINT) AS tok_len, count(*) AS n FROM c GROUP BY 1, 2),
        |w AS (SELECT lang, tok_len, n, CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS nl FROM g)
        |SELECT lang, tok_len, CAST(n AS BIGINT) AS n_tokens,
        |       floor((CAST(n AS DOUBLE) / nl)*1000000+0.5)/1000000 AS share
        |FROM w
        |ORDER BY lang, tok_len""".stripMargin) { (s, d) =>
      Tables.load(s, d, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("lang"), length(col("tok")).cast("long").as("tok_len"))
        .agg(count(lit(1)).as("n"))
        .withColumn("nl", sum("n").over(Window.partitionBy("lang")))
        .select(col("lang"), col("tok_len"), col("n").as("n_tokens"),
          Q.r6(col("n").cast("double") / col("nl")).as("share"))
        .orderBy("lang", "tok_len")
    },

    // New vs returning actives per day — the growth-accounting split
    // under every DAU chart: how much of today's activity is
    // acquisition vs retention (the daily pulse q_retention's cohort
    // grid and q_churn's adjacent-day rate both aggregate away). The
    // corpus collapses to the distinct (user, day) frame once; "new"
    // is a min(day)-per-user agg joined back on the day key. Exact
    // int64 counts; one IEEE share division per day.
    Q("q_new_returning",
      """WITH ud AS (SELECT DISTINCT user_id,
        |                   strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day
        |            FROM events),
        |fs AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY 1),
        |nw AS (SELECT first_day AS day, CAST(count(*) AS BIGINT) AS new_users FROM fs GROUP BY 1),
        |ac AS (SELECT day, CAST(count(*) AS BIGINT) AS active_users FROM ud GROUP BY 1)
        |SELECT ac.day, ac.active_users,
        |       COALESCE(nw.new_users, 0) AS new_users,
        |       ac.active_users - COALESCE(nw.new_users, 0) AS returning_users,
        |       floor((CAST(COALESCE(nw.new_users, 0) AS DOUBLE) / ac.active_users)*10000+0.5)/10000 AS new_share
        |FROM ac LEFT JOIN nw ON ac.day = nw.day
        |ORDER BY ac.day""".stripMargin) { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"),
          date_format(col("ts").cast(DateType), "yyyy-MM-dd").as("day"))
        .distinct()
      val nw = ud.groupBy("user_id").agg(min("day").as("day"))
        .groupBy("day").agg(count(lit(1)).as("new_users"))
      ud.groupBy("day").agg(count(lit(1)).as("active_users"))
        .join(nw, Seq("day"), "left")
        .select(col("day"), col("active_users"),
          coalesce(col("new_users"), lit(0L)).as("new_users"),
          (col("active_users") - coalesce(col("new_users"), lit(0L))).as("returning_users"),
          Q.r4(coalesce(col("new_users"), lit(0L)).cast("double") / col("active_users"))
            .as("new_share"))
        .orderBy("day")
    },

    // Dormancy histogram: how many users were last seen k days before
    // the dataset's end — the staleness distribution that sizes a
    // reactivation campaign (the forward-looking complement to
    // q_kaplan_meier's survival curve). One user-key agg for the last
    // active day, the global horizon from the SAME frame's max (no
    // second corpus scan), |staleness-domain| output rows, exact int64.
    Q("q_dormancy",
      """WITH u AS (SELECT user_id,
        |                  CAST(max(date_diff('day', DATE '2024-01-01',
        |                                     CAST(date_trunc('day', ts) AS DATE))) AS BIGINT) AS last_x
        |           FROM events GROUP BY 1),
        |h AS (SELECT user_id, last_x, CAST(max(last_x) OVER () AS BIGINT) AS horizon FROM u)
        |SELECT horizon - last_x AS staleness_days,
        |       CAST(count(*) AS BIGINT) AS n_users
        |FROM h
        |GROUP BY 1
        |ORDER BY staleness_days""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(max(datediff(col("ts").cast(DateType), to_date(lit(TrendAnchor))))
          .cast("long").as("last_x"))
        .withColumn("horizon", max("last_x").over(Window.partitionBy()))
        .groupBy((col("horizon") - col("last_x")).as("staleness_days"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("staleness_days")
    },

    // Hill tail index of event value per type: α̂ = k / Σ_{i≤k}
    // ln(x_(i)/x_(k+1)) over the top-k order statistics — "how heavy is
    // the spend tail" (α < 2: infinite variance, percentile SLOs are
    // meaningless; the rigor upgrade over q_benford's digit screen).
    // The top-(k+1) values per type come from the bounded-buffer
    // TopKAgg typed Aggregator — partial aggregation keeps ≤k+1 rows
    // per partition, so the corpus NEVER sorts per type (q_topk_agg's
    // contract, (cents DESC, event_id ASC) ordering on exact ints) —
    // and the 100 ln-ratio terms ride a 1e-9 lattice before the
    // per-type fold (order-free; OverflowHeadroomSpec row). Ratios are
    // exact-int cent quotients, one mirrored tree per term.
    Q("q_hill_tail",
      """WITH v AS (SELECT event_type, event_id,
        |                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v2
        |           FROM events WHERE floor(value * 100 + 0.5) > 0),
        |r AS (SELECT event_type, v2,
        |             row_number() OVER (PARTITION BY event_type ORDER BY v2 DESC, event_id) AS rk
        |      FROM v),
        |xm AS (SELECT event_type, CAST(max(CASE WHEN rk = 101 THEN v2 END) AS BIGINT) AS xmin
        |       FROM r GROUP BY 1),
        |t AS (SELECT r.event_type, xm.xmin,
        |             CAST(sum(CAST(floor(ln(CAST(r.v2 AS DOUBLE) / xm.xmin) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s9
        |      FROM r JOIN xm ON r.event_type = xm.event_type
        |      WHERE r.rk <= 100 AND xm.xmin IS NOT NULL
        |      GROUP BY 1, 2)
        |SELECT event_type, CAST(100 AS BIGINT) AS k, xmin AS xmin_cents,
        |       CASE WHEN s9 > 0 THEN floor((100.0 / (s9 / 1e9))*10000+0.5)/10000 END AS alpha_hat
        |FROM t
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      val topk = udaf(new graft.functions.TopKAgg(101),
        org.apache.spark.sql.Encoders.product[graft.functions.Scored])
      // filter on the INTEGERIZED value: sub-half-cent positives round
      // to v2 = 0 and a rank-101 zero would put ln(v/0) in the fold —
      // inf-saturating garbage in Spark, a cast error in DuckDB (r12
      // review); excluding them at the cents level kills the cliff on
      // both sides identically
      val top = Tables.events(s, d)
        .filter(floor(col("value") * 100 + 0.5) > 0)
        .select(col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("v2"), col("event_id"))
        .groupBy("event_type")
        .agg(topk(col("v2").cast("double"), col("event_id")).as("top"))
        .filter(size(col("top")) === 101)
      top.select(col("event_type"),
          element_at(col("top"), 101).getField("score").cast("long").as("xmin"),
          expr("slice(top, 1, 100)").as("head"))
        .select(col("event_type"), col("xmin"),
          expr(
            """aggregate(head, CAST(0 AS BIGINT),
              |  (acc, t) -> acc + CAST(floor(ln(t.score / xmin) * 1e9 + 0.5) AS BIGINT))""".stripMargin)
            .as("s9"))
        .select(col("event_type"), lit(100L).as("k"), col("xmin").as("xmin_cents"),
          when(col("s9") > 0, Q.r4(lit(100.0) / (col("s9") / lit(1e9)))).as("alpha_hat"))
        .orderBy("event_type")
    },

    // Embedding L2-norm profile per label — the first QA gate on any
    // vector corpus: a label whose norms collapse toward 0 or spread
    // wildly signals an encoder fault or mixed populations BEFORE any
    // cosine machinery runs on it (cosine silently hides magnitude).
    // Each row's norm is the in-row zip_with/aggregate fold that the
    // whole similarity family shares (↔ DuckDB list_inner_product —
    // the established cross-engine dot-product pattern), quantized to
    // a 1e-3 lattice BEFORE the per-label moment sums (order-free
    // int64, Σv3² ≈ rows·4e8 — linear, good to ~sf10^7) and the exact
    // p50 is the first integer crossing over the ≤|norm3-domain| frame
    // (the q_length_profile move). |labels| output rows.
    Q("q_embed_norms",
      """WITH e AS (SELECT label,
        |                  CAST(floor(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
        |                                                     CAST(embedding AS DOUBLE[]))) * 1e3 + 0.5) AS BIGINT) AS n3
        |           FROM embeddings),
        |g AS (SELECT label, n3, count(*) AS c FROM e GROUP BY 1, 2),
        |w AS (SELECT label, n3, c,
        |             CAST(sum(c) OVER (PARTITION BY label ORDER BY n3) AS BIGINT) AS cum,
        |             CAST(sum(c) OVER (PARTITION BY label) AS BIGINT) AS n,
        |             CAST(sum(c * n3) OVER (PARTITION BY label) AS BIGINT) AS s,
        |             CAST(sum(c * n3 * n3) OVER (PARTITION BY label) AS BIGINT) AS ss
        |      FROM g)
        |SELECT CAST(label AS BIGINT) AS label, max(n) AS n_vecs,
        |       floor((CAST(max(s) AS DOUBLE) / max(n) / 1e3)*1000000+0.5)/1000000 AS mean_norm,
        |       floor((sqrt((CAST(max(n) AS DOUBLE) * max(ss) - CAST(max(s) AS DOUBLE) * max(s))) / max(n) / 1e3)*1000000+0.5)/1000000 AS std_norm,
        |       floor((CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN n3 END) AS DOUBLE) / 1e3)*1000000+0.5)/1000000 AS p50_norm
        |FROM w
        |GROUP BY label
        |ORDER BY label""".stripMargin) { (s, d) =>
      // native dot_product (r19): identical float→double widening and
      // left-to-right accumulation as the HOF fold it replaces
      val n3 = floor(sqrt(graft.functions.DotProduct.dot_product(
        col("embedding"), col("embedding"))) * 1e3 + 0.5)
        .cast("long")
      val g = Tables.load(s, d, "embeddings")
        .select(col("label").cast("long").as("label"), n3.as("n3"))
        .groupBy("label", "n3").agg(count(lit(1)).as("c"))
      val wl = Window.partitionBy("label")
      val w = g
        .withColumn("cum", sum("c").over(wl.orderBy("n3")))
        .withColumn("n", sum("c").over(wl))
        .withColumn("s", sum(col("c") * col("n3")).over(wl))
        .withColumn("ss", sum(col("c") * col("n3") * col("n3")).over(wl))
      w.groupBy("label")
        .agg(max("n").as("n_vecs"),
          Q.r6(max("s").cast("double") / max("n") / 1e3).as("mean_norm"),
          Q.r6(sqrt(max("n").cast("double") * max("ss") -
            max("s").cast("double") * max("s")) / max("n") / 1e3).as("std_norm"),
          Q.r6(min(when(col("cum") >= expr("(n + 1) div 2"), col("n3")))
            .cast("double") / 1e3).as("p50_norm"))
        .orderBy("label")
    },

    // Basket size distribution: how many orders carry exactly k lines
    // — the fan-out profile that sizes every per-order expansion in
    // the co-purchase family (assoc_rules / triangles expand C(k, 2)
    // per basket, so this histogram IS their cost model). One
    // order-keyed count (map-side partials), then a ≤|line-domain|
    // histogram; shares one IEEE division per row.
    Q("q_basket_size_dist",
      """WITH o AS (SELECT l_orderkey, count(*) AS k FROM lineitem GROUP BY 1),
        |h AS (SELECT k AS n_lines, CAST(count(*) AS BIGINT) AS n_orders FROM o GROUP BY 1),
        |t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS total FROM h)
        |SELECT n_lines, n_orders,
        |       floor((CAST(n_orders AS DOUBLE) / total)*1000000+0.5)/1000000 AS share
        |FROM h CROSS JOIN t
        |ORDER BY n_lines""".stripMargin) { (s, d) =>
      val h = Tables.load(s, d, "lineitem")
        .groupBy("l_orderkey").agg(count(lit(1)).as("n_lines"))
        .groupBy("n_lines").agg(count(lit(1)).as("n_orders"))
      h.crossJoin(broadcast(h.agg(sum("n_orders").as("total"))))
        .select(col("n_lines"), col("n_orders"),
          Q.r6(col("n_orders").cast("double") / col("total")).as("share"))
        .orderBy("n_lines")
    },

    // Language-ID confusion matrix: the per-doc q_lang_id heuristic
    // aggregated into (true, predicted, n, recall-share) cells — the
    // classifier-quality readout that decides whether lang-scoped
    // dedup blocking (every shingle op keys on lang) can trust the
    // PREDICTED label on unlabeled feeds. Same marker scores and
    // tie-break chain as q_lang_id (shared text by construction),
    // collapsed map-side onto ≤|langs|² cells.
    Q("q_lang_confusion",
      s"""WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
        |p AS (SELECT lang AS true_lang,
        |             ${TextPipeline.predLangSql} AS pred_lang
        |      FROM w),
        |c AS (SELECT true_lang, pred_lang, count(*) AS n FROM p GROUP BY 1, 2)
        |SELECT true_lang, pred_lang, CAST(n AS BIGINT) AS n,
        |       floor((CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY true_lang))*10000+0.5)/10000 AS share_of_true
        |FROM c
        |ORDER BY true_lang, pred_lang""".stripMargin) { (s, d) =>
      Tables.load(s, d, "documents")
        .withColumn("words", split(col("text"), " "))
        .select(col("lang").as("true_lang"),
          TextPipeline.predLangCol.as("pred_lang"))
        .groupBy("true_lang", "pred_lang").agg(count(lit(1)).as("n"))
        .withColumn("share_of_true",
          Q.r4(col("n").cast("double") /
            sum("n").over(Window.partitionBy("true_lang"))))
        .orderBy("true_lang", "pred_lang")
    },

    // Cohen's kappa between the declared document language and the
    // marker-word classifier's prediction — the chance-corrected
    // agreement SCALAR on top of q_lang_confusion's matrix: raw
    // agreement p_o flatters a skewed corpus (predicting the majority
    // label scores high by luck), so the curation gate wants
    // κ = (p_o − p_e)/(1 − p_e) with p_e the marginal-product chance
    // rate. Both raters and the cell/marginal counts are exact int64,
    // so κ = (N·agree − Σ_l row_l·col_l)/(N² − Σ_l row_l·col_l) is
    // PURE RATIONAL arithmetic — no transcendental, no lattice; the
    // one double division happens once per scalar at the end. The
    // prediction expression is TextPipeline.predLangCol — the same
    // single home as q_lang_id/q_lang_confusion, so the three readouts
    // cannot drift. Shape: one corpus scan onto the ≤|langs|² cell
    // grid, marginals from the cells, single-row output.
    Q("q_cohens_kappa",
      s"""WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
        |p AS (SELECT lang AS true_lang,
        |             ${TextPipeline.predLangSql} AS pred_lang
        |      FROM w),
        |c AS (SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
        |      FROM p GROUP BY 1, 2),
        |rt AS (SELECT true_lang AS l, CAST(sum(n) AS BIGINT) AS r FROM c GROUP BY 1),
        |ct AS (SELECT pred_lang AS l, CAST(sum(n) AS BIGINT) AS m FROM c GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |             CAST(sum(CASE WHEN true_lang = pred_lang THEN n ELSE 0 END) AS BIGINT) AS agree
        |      FROM c),
        |pe AS (SELECT CAST(coalesce(sum(rt.r * ct.m), 0) AS BIGINT) AS penum
        |       FROM rt JOIN ct ON rt.l = ct.l)
        |SELECT t.nn AS n_docs, t.agree AS n_agree,
        |       ${Q.sqlR6("CAST(t.agree AS DOUBLE) / t.nn")} AS po,
        |       ${Q.sqlR6("CAST(pe.penum AS DOUBLE) / (CAST(t.nn AS DOUBLE) * t.nn)")} AS pe,
        |       CASE WHEN t.nn * t.nn > pe.penum THEN
        |         ${Q.sqlR6("CAST(t.nn * t.agree - pe.penum AS DOUBLE) / (t.nn * t.nn - pe.penum)")}
        |       END AS kappa
        |FROM t CROSS JOIN pe""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "documents")
        .withColumn("words", split(col("text"), " "))
        .select(col("lang").as("true_lang"),
          TextPipeline.predLangCol.as("pred_lang"))
        .groupBy("true_lang", "pred_lang").agg(count(lit(1)).as("n"))
        .transform(Q.snapshot)
      kappaOf(c)
    },

    // Shingle document-frequency profile: how many blocking shingles
    // have df = k, and the candidate-pair work k·C(df,2) each stratum
    // would feed the near-dup self-join — the OBSERVABILITY readout
    // behind the dfCap=128 contract (SkewSpec pins max df under the
    // cap; this query shows the whole curve and exactly how much
    // quadratic work the cap would cut). One (lang, shingle)-keyed df
    // agg (the same exchange the dedup family shuffles on), then a
    // ≤|df-domain| histogram. Pure int64.
    Q("q_shingle_df_profile",
      """WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
        |sh AS (SELECT DISTINCT doc_id, lang,
        |              unnest(list_transform(range(1, len(words) - 1),
        |                     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingle
        |       FROM w WHERE len(words) >= 3),
        |df AS (SELECT lang, shingle, count(*) AS df FROM sh GROUP BY 1, 2)
        |SELECT df, CAST(count(*) AS BIGINT) AS n_shingles,
        |       CAST(count(*) * df * (df - 1) / 2 AS BIGINT) AS pair_work
        |FROM df
        |GROUP BY df
        |ORDER BY df""".stripMargin) { (s, d) =>
      TextPipeline.shingles(s, d)
        .groupBy("lang", "shingle").agg(count(lit(1)).as("df"))
        .groupBy("df").agg(count(lit(1)).as("n_shingles"))
        .select(col("df"), col("n_shingles"),
          (col("n_shingles") * col("df") * (col("df") - 1) / 2).cast("long")
            .as("pair_work"))
        .orderBy("df")
    },

    // Order-to-ship lag profile per order priority: exact p50/p95/max
    // days between order placement and line shipment — does URGENT
    // actually ship faster, the fulfillment-SLA readout. The lag
    // domain is calendar-bounded (≤ ~a year of days), so the exact
    // percentiles ride the q_tail_exact first-crossing trick over a
    // (priority, lag)-count frame — the corpus is never sorted. The
    // lineitem→orders join hashes on the order key (AQE-eligible);
    // counts exact int64.
    Q("q_ship_lag",
      """WITH j AS (SELECT o_orderpriority AS priority,
        |                  date_diff('day', CAST(date_trunc('day', o_orderdate) AS DATE),
        |                            CAST(date_trunc('day', l_shipdate) AS DATE)) AS lag_days
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |m AS (SELECT priority, lag_days, count(*) AS c FROM j GROUP BY 1, 2),
        |w AS (SELECT priority, lag_days, c,
        |             CAST(sum(c) OVER (PARTITION BY priority ORDER BY lag_days) AS BIGINT) AS cum,
        |             CAST(sum(c) OVER (PARTITION BY priority) AS BIGINT) AS n
        |      FROM m)
        |SELECT priority, max(n) AS n_lines,
        |       CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN lag_days END) AS BIGINT) AS p50_days,
        |       CAST(min(CASE WHEN cum >= (19 * n + 19) // 20 THEN lag_days END) AS BIGINT) AS p95_days,
        |       CAST(max(lag_days) AS BIGINT) AS max_days
        |FROM w
        |GROUP BY priority
        |ORDER BY priority""".stripMargin) { (s, d) =>
      val j = Tables.load(s, d, "lineitem")
        .join(Tables.load(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("priority"),
          datediff(col("l_shipdate").cast(DateType),
            col("o_orderdate").cast(DateType)).cast("long").as("lag_days"))
      val w = j.groupBy("priority", "lag_days").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(
          Window.partitionBy("priority").orderBy("lag_days")))
        .withColumn("n", sum("c").over(Window.partitionBy("priority")))
      w.groupBy("priority")
        .agg(max("n").as("n_lines"),
          min(when(col("cum") >= expr("(n + 1) div 2"), col("lag_days"))).as("p50_days"),
          min(when(col("cum") >= expr("(19 * n + 19) div 20"), col("lag_days"))).as("p95_days"),
          max("lag_days").as("max_days"))
        .orderBy("priority")
    },

    // Windowed funnel (the ClickHouse windowFunnel semantics): per
    // user, the deepest view→click→purchase chain where EACH step
    // lands within 24h of the previous — the time-bounded complement
    // to q_funnel's unbounded ordered funnel (a purchase a month after
    // the click counts there, not here). Depth-k membership is an
    // EXISTS chain: per-user self-joins keyed on user_id with the
    // window predicate as a join filter, so the shuffle hashes on the
    // user key and the quadratic term is per-user-bounded (≈67 events
    // per user at every SF — users scale with the corpus). The
    // histogram rolls up on ≤4 depth keys; both engines run the
    // identical join chain.
    Q("q_window_funnel",
      s"""WITH e AS (SELECT user_id, event_type, ${Q.sqlEpochSec("ts")} AS es FROM events),
         |au AS (SELECT DISTINCT user_id FROM e),
         |v AS (SELECT user_id, es FROM e WHERE event_type = 'view'),
         |c AS (SELECT user_id, es FROM e WHERE event_type = 'click'),
         |p AS (SELECT user_id, es FROM e WHERE event_type = 'purchase'),
         |u1 AS (SELECT DISTINCT user_id FROM v),
         |u2 AS (SELECT DISTINCT v.user_id
         |       FROM v JOIN c ON c.user_id = v.user_id
         |                    AND c.es > v.es AND c.es <= v.es + 86400),
         |u3 AS (SELECT DISTINCT v.user_id
         |       FROM v JOIN c ON c.user_id = v.user_id
         |                    AND c.es > v.es AND c.es <= v.es + 86400
         |              JOIN p ON p.user_id = v.user_id
         |                    AND p.es > c.es AND p.es <= c.es + 86400),
         |du AS (SELECT au.user_id,
         |              CASE WHEN u3.user_id IS NOT NULL THEN 3
         |                   WHEN u2.user_id IS NOT NULL THEN 2
         |                   WHEN u1.user_id IS NOT NULL THEN 1
         |                   ELSE 0 END AS depth
         |       FROM au LEFT JOIN u1 ON au.user_id = u1.user_id
         |               LEFT JOIN u2 ON au.user_id = u2.user_id
         |               LEFT JOIN u3 ON au.user_id = u3.user_id)
         |SELECT CAST(depth AS BIGINT) AS depth, CAST(count(*) AS BIGINT) AS n_users
         |FROM du
         |GROUP BY depth
         |ORDER BY depth""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), Q.epochSec(col("ts")).as("es"))
        .transform(Q.snapshot) // four type slices + the user catalog read this frame
      def slice(t: String, k: String) = e.filter(col("event_type") === t)
        .select(col("user_id"), col("es").as(k))
      val au = e.select("user_id").distinct()
      val v = slice("view", "ev")
      val c = slice("click", "ec")
      val p = slice("purchase", "ep")
      val u1 = v.select("user_id").distinct().withColumn("d1", lit(1))
      val vc = v.join(c, Seq("user_id"))
        .filter(col("ec") > col("ev") && col("ec") <= col("ev") + 86400)
      val u2 = vc.select("user_id").distinct().withColumn("d2", lit(1))
      val u3 = vc.join(p, Seq("user_id"))
        .filter(col("ep") > col("ec") && col("ep") <= col("ec") + 86400)
        .select("user_id").distinct().withColumn("d3", lit(1))
      au.join(u1, Seq("user_id"), "left")
        .join(u2, Seq("user_id"), "left")
        .join(u3, Seq("user_id"), "left")
        .select(when(col("d3").isNotNull, 3L)
          .when(col("d2").isNotNull, 2L)
          .when(col("d1").isNotNull, 1L)
          .otherwise(0L).as("depth"))
        .groupBy("depth").agg(count(lit(1)).as("n_users"))
        .orderBy("depth")
    },

    // Cross-source duplication provenance: the ≥0.8-Jaccard near-dup
    // pairs of q_dedup_near rolled up by SOURCE pair — "which feeds
    // copy each other" (within-source pairs included as the diagonal),
    // the question that turns a dedup pass into a data-sourcing
    // decision (drop the mirroring feed, don't pay to dedup it
    // forever). Rides nearDupPairs' df-capped candidate machinery
    // unchanged (ONE shinglePairStats pass, the cap-invariance
    // precondition documented at q_dedup_roi); the catalog joins are
    // left UNHINTED — the near-dup pair set is the small side, so AQE
    // broadcasts IT against the corpus-sized (doc_id, source) catalog
    // (hinting the catalog would be exactly backwards at 100 TB); the
    // rollup lands on ≤|sources|² keys.
    Q("q_source_dup_matrix",
      """WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
        |sh AS (SELECT DISTINCT doc_id, lang,
        |              unnest(list_transform(range(1, len(words) - 1),
        |                     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingle
        |       FROM w WHERE len(words) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        |          FROM sh a JOIN sh b ON a.lang = b.lang AND a.shingle = b.shingle
        |                             AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |nd AS (SELECT p.d1, p.d2
        |       FROM pairs p
        |       JOIN cnt c1 ON p.d1 = c1.doc_id
        |       JOIN cnt c2 ON p.d2 = c2.doc_id
        |       WHERE CAST(p.inter AS DOUBLE) / (c1.n + c2.n - p.inter) >= 0.8),
        |m AS (SELECT least(da.source, db.source) AS source_1,
        |             greatest(da.source, db.source) AS source_2
        |      FROM nd JOIN documents da ON nd.d1 = da.doc_id
        |              JOIN documents db ON nd.d2 = db.doc_id)
        |SELECT source_1, source_2, count(*) AS n_pairs
        |FROM m
        |GROUP BY 1, 2
        |ORDER BY source_1, source_2""".stripMargin) { (s, d) =>
      val cat = Tables.load(s, d, "documents").select(col("doc_id"), col("source"))
      TextPipeline.nearDupPairs(s, d, dfCap = Some(128L))
        .join(cat.select(col("doc_id").as("d1"), col("source").as("sa")), "d1")
        .join(cat.select(col("doc_id").as("d2"), col("source").as("sb")), "d2")
        .select(least(col("sa"), col("sb")).as("source_1"),
          greatest(col("sa"), col("sb")).as("source_2"))
        .groupBy("source_1", "source_2").agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_1", "source_2")
    },

    // Distinct-n diversity per source (round 15): distinct-1 =
    // |unique unigrams|/tokens and distinct-2 = |unique bigrams|/
    // bigrams — the Li et al. generation-diversity metric applied to
    // feed QA: a templated or mode-collapsed source reads LOW
    // distinct-2 even when q_token_diversity's per-doc TTR and
    // q_cross_doc_ngram's dup share (which needs ≥2 DOCS to fire)
    // both look healthy, because repetition INSIDE one source's
    // documents collapses the bigram set. Exact int64 counts off two
    // vocab-keyed aggs (in-row bigram expansion — the shingles shape,
    // width 2), two IEEE divisions per |sources|-row readout.
    Q("q_distinct_ngrams",
      s"""WITH w AS (SELECT source, string_split(text, ' ') AS words FROM documents),
         |u AS (SELECT source, unnest(words) AS g FROM w),
         |a1 AS (SELECT source, CAST(sum(c) AS BIGINT) AS t1, CAST(count(*) AS BIGINT) AS u1
         |       FROM (SELECT source, g, count(*) AS c FROM u GROUP BY 1, 2) GROUP BY 1),
         |b AS (SELECT source, unnest(list_transform(range(1, len(words)),
         |             i -> words[i] || ' ' || words[i+1])) AS g
         |      FROM w WHERE len(words) >= 2),
         |a2 AS (SELECT source, CAST(sum(c) AS BIGINT) AS t2, CAST(count(*) AS BIGINT) AS u2
         |       FROM (SELECT source, g, count(*) AS c FROM b GROUP BY 1, 2) GROUP BY 1)
         |SELECT a1.source, a1.t1 AS n_tokens, a1.u1 AS uniq_1,
         |       COALESCE(a2.t2, 0) AS n_bigrams, COALESCE(a2.u2, 0) AS uniq_2,
         |       ${Q.sqlR6("CAST(a1.u1 AS DOUBLE) / a1.t1")} AS distinct_1,
         |       CASE WHEN a2.t2 > 0 THEN ${Q.sqlR6("CAST(a2.u2 AS DOUBLE) / a2.t2")} END AS distinct_2
         |FROM a1 LEFT JOIN a2 ON a1.source = a2.source
         |ORDER BY a1.source""".stripMargin) { (s, d) =>
      val w = Tables.load(s, d, "documents")
        .select(col("source"), split(col("text"), " ").as("words"))
      val a1 = w.select(col("source"), explode(col("words")).as("g"))
        .groupBy("source", "g").agg(count(lit(1)).as("c"))
        .groupBy("source").agg(sum("c").as("t1"), count(lit(1)).as("u1"))
      val a2 = w.filter(size(col("words")) >= 2)
        .select(col("source"), explode(expr(
          "transform(sequence(0, size(words) - 2), i -> concat_ws(' ', words[i], words[i+1]))"))
          .as("g"))
        .groupBy("source", "g").agg(count(lit(1)).as("c"))
        .groupBy("source").agg(sum("c").as("t2"), count(lit(1)).as("u2"))
      a1.join(a2, Seq("source"), "left")
        .select(col("source"), col("t1").as("n_tokens"), col("u1").as("uniq_1"),
          coalesce(col("t2"), lit(0L)).as("n_bigrams"),
          coalesce(col("u2"), lit(0L)).as("uniq_2"),
          Q.r6(col("u1").cast("double") / col("t1")).as("distinct_1"),
          when(col("t2") > 0,
            Q.r6(col("u2").cast("double") / col("t2"))).as("distinct_2"))
        .orderBy("source")
    }
  )
}
