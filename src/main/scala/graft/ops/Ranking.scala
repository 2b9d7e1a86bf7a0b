package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Top-k retrieval-quality metrics (round 15, SURVEY §2.16): NDCG@10,
  * MRR@10 and P@10/R@10 over one deterministic ranking task — per
  * nation, rank suppliers by TRAIN-period revenue (shipdate ≤ 1997)
  * and score the ranking against TEST-period revenue (≥ 1998) as the
  * relevance signal. The task is the "does past revenue retrieve
  * future revenue" backtest every recommender/curation pipeline runs;
  * queries = nations (a constant-cardinality dimension), documents =
  * suppliers (catalog-scaled).
  *
  * Determinism: revenue is exact int64 cents per period; the
  * predicted order is (train DESC, suppkey ASC) — a total order on
  * integers; the log2 discount weights are IEEE literals embedded in
  * BOTH engines (the q_power_analysis move — no transcendental is
  * ever evaluated), and every DCG term floors onto the 1e-6 lattice
  * before the ≤10-term per-nation sum. Scale: the corpus collapses to
  * the (nation, supplier) frame first (keyed shuffle, map-side
  * partials); top-10 selection is the bounded-buffer TopKAgg (partial
  * aggregation ships ≤10 rows per partition — never a per-nation
  * window sort over the supplier catalog); everything downstream
  * rides ≤ 25·10-row frames, and the macro averages are windows over
  * the ≤25-row nation frame.
  */
object Ranking {

  /** 1/log2(i+1) for ranks 1..10 — shortest-round-trip IEEE literals,
    * identical text in the SQL twins. */
  private val W: Seq[Double] = Seq(
    1.0, 0.6309297535714575, 0.5, 0.43067655807339306, 0.38685280723454163,
    0.3562071871080222, 0.3333333333333333, 0.31546487678572877,
    0.3010299956639812, 0.2890648263178879)

  /** element_at is 1-based, so rank indexes the literal array directly. */
  private def wOf(rk: Column): Column =
    element_at(array(W.map(lit): _*), rk.cast("int"))

  private val wSql: String =
    "CASE rk " + W.zipWithIndex.map { case (w, i) =>
      s"WHEN ${i + 1} THEN $w" }.mkString(" ") + " END"

  /** Per (nation, supplier): exact train/test revenue cents. ONE fact
    * scan, supplier join keyed on suppkey (the dim scales with the
    * catalog — never broadcast), the 25-row nation dim broadcast. */
  private def base(s: SparkSession, d: String): DataFrame = {
    val cents = floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
      .cast("long")
    Tables.load(s, d, "lineitem")
      .join(Tables.load(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.load(s, d, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("l_suppkey"))
      .agg(
        sum(when(year(col("l_shipdate")) <= 1997, cents).otherwise(0L)).as("train"),
        sum(when(year(col("l_shipdate")) >= 1998, cents).otherwise(0L)).as("test"))
  }

  private val baseSql: String =
    """SELECT n.n_name, l.l_suppkey,
      |       CAST(sum(CASE WHEN year(l.l_shipdate) <= 1997
      |                     THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
      |                     ELSE 0 END) AS BIGINT) AS train,
      |       CAST(sum(CASE WHEN year(l.l_shipdate) >= 1998
      |                     THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
      |                     ELSE 0 END) AS BIGINT) AS test
      |FROM lineitem l
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |GROUP BY 1, 2""".stripMargin

  /** Bounded-buffer top-10 per nation under (score DESC, suppkey ASC),
    * exploded to (n_name, rk, l_suppkey) — the TopKAgg shape, so the
    * shuffle carries ≤10 rows per (nation × partition) instead of a
    * per-nation window sort over the supplier catalog. */
  private def top10(b: DataFrame, scoreCol: String): DataFrame = {
    val topk = udaf(new graft.functions.TopKAgg(10),
      org.apache.spark.sql.Encoders.product[graft.functions.Scored])
    b.groupBy("n_name")
      .agg(topk(col(scoreCol).cast("double"), col("l_suppkey")).as("top"))
      .select(col("n_name"), posexplode(col("top")))
      .select(col("n_name"), (col("pos") + 1).cast("long").as("rk"),
        col("col").getField("id").cast("long").as("l_suppkey"),
        col("col").getField("score").cast("long").as("sc"))
  }

  /** Tail sums T(m) = Σ_{d=m..10} 0.9^(d−1)/d of the RBO weight
    * series — 10 shortest-round-trip IEEE literals, identical text in
    * the SQL twin (the W-table move: no pow() is ever evaluated). A
    * common supplier at ranks (ra, rb) joins every overlap set X_d for
    * d ≥ max(ra, rb), so its total RBO contribution is exactly
    * T(max(ra, rb)) — the Σ_d X_d·p^(d−1)/d double sum collapses to
    * one bounded join with a literal lookup. */
  private val RboT: Seq[Double] = {
    val terms = (1 to 10).map(d => math.pow(0.9, d - 1) / d)
    (1 to 10).map(m => terms.drop(m - 1).sum)
  }

  private def rboTOf(m: Column): Column =
    element_at(array(RboT.map(lit): _*), m.cast("int"))

  private val rboTSql: String =
    "CASE m " + RboT.zipWithIndex.map { case (t, i) =>
      s"WHEN ${i + 1} THEN $t" }.mkString(" ") + " END"

  def defs: Seq[QueryDef] = Seq(

    // MAP@10 of the train→test supplier ranking (round 16): per nation
    // the average precision over the predicted top-10 — Σ P@i at each
    // HIT position i, divided by min(n_rel, 10) (the standard truncated
    // denominator, so a nation with ≥10 relevant suppliers can still
    // reach 1.0); plus the macro MAP over nations with any relevant
    // supplier. P@i = cumhits/i is a running window over the ≤10-row
    // per-nation frame (the bounded downstream the §2.16 header
    // documents — never a catalog-sized sort); each P@i floors onto
    // the 1e-6 lattice before the ≤10-term per-nation sum, and the
    // macro mean rides exact int64 ap6 values over the ≤25-row nation
    // frame. NULL where a nation has no relevant supplier (AP has no
    // denominator). Rides the SAME base/top10 machinery as q_ndcg.
    Q("q_map",
      s"""WITH b AS ($baseSql),
         |p AS (SELECT n_name, l_suppkey, test,
         |             CAST(row_number() OVER (PARTITION BY n_name
         |                    ORDER BY train DESC, l_suppkey) AS BIGINT) AS rk
         |      FROM b),
         |t AS (SELECT n_name, rk, test,
         |             CAST(sum(CASE WHEN test > 0 THEN 1 ELSE 0 END) OVER (
         |                    PARTITION BY n_name ORDER BY rk
         |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |                  AS BIGINT) AS cumhits
         |      FROM p WHERE rk <= 10),
         |a AS (SELECT n_name,
         |             CAST(coalesce(sum(CASE WHEN test > 0
         |               THEN CAST(floor(CAST(cumhits AS DOUBLE) / rk * 1e6 + 0.5) AS BIGINT)
         |               END), 0) AS BIGINT) AS psum6
         |      FROM t GROUP BY 1),
         |nr AS (SELECT n_name,
         |              CAST(sum(CASE WHEN test > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel
         |       FROM b GROUP BY 1),
         |j AS (SELECT a.n_name, a.psum6, nr.n_rel,
         |             CASE WHEN nr.n_rel > 0
         |               THEN CAST(floor(CAST(a.psum6 AS DOUBLE) /
         |                      (CASE WHEN nr.n_rel < 10 THEN nr.n_rel ELSE 10 END) + 0.5)
         |                    AS BIGINT)
         |             END AS ap6
         |      FROM a JOIN nr ON a.n_name = nr.n_name),
         |g AS (SELECT *, CAST(sum(ap6) OVER () AS BIGINT) AS s6,
         |             CAST(count(ap6) OVER () AS BIGINT) AS nn FROM j)
         |SELECT n_name, n_rel,
         |       CASE WHEN n_rel > 0 THEN ${Q.sqlR6("CAST(ap6 AS DOUBLE) / 1e6")} END AS ap_10,
         |       ${Q.sqlR6("CAST(s6 AS DOUBLE) / (nn * 1e6)")} AS map_10
         |FROM g
         |ORDER BY n_name""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val b = Q.snapshot(base(s, d))
      val wn = Window.partitionBy("n_name").orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val a = top10(b, "train")
        .join(b.select(col("n_name"), col("l_suppkey"), col("test")),
          Seq("n_name", "l_suppkey"), "left")
        .withColumn("cumhits",
          sum(when(col("test") > 0, 1L).otherwise(0L)).over(wn))
        .groupBy("n_name")
        .agg(coalesce(sum(when(col("test") > 0,
          floor(col("cumhits").cast("double") / col("rk") * 1e6 + 0.5).cast("long"))),
          lit(0L)).as("psum6"))
      val nr = b.groupBy("n_name")
        .agg(sum(when(col("test") > 0, 1L).otherwise(0L)).as("n_rel"))
      a.join(nr, "n_name")
        .withColumn("ap6", when(col("n_rel") > 0,
          floor(col("psum6").cast("double") /
            when(col("n_rel") < 10, col("n_rel")).otherwise(lit(10)) + 0.5).cast("long")))
        .withColumn("s6", sum("ap6").over(Window.partitionBy()))
        .withColumn("nn", count("ap6").over(Window.partitionBy()))
        .select(col("n_name"), col("n_rel"),
          when(col("n_rel") > 0, Q.r6(col("ap6").cast("double") / 1e6)).as("ap_10"),
          Q.r6(col("s6").cast("double") / (col("nn") * lit(1e6))).as("map_10"))
        .orderBy("n_name")
    },

    // RBO@10 (round 16): rank-biased overlap (p = 0.9, truncated at
    // depth 10) between the TRAIN-revenue and TEST-revenue supplier
    // rankings per nation — "how much does the retrieval order itself
    // drift between periods", the list-similarity companion to
    // q_ndcg's gain view. The Σ_d p^(d−1)·|A_d∩B_d|/d double sum
    // collapses: a supplier in both top-10s at ranks (ra, rb) enters
    // every depth d ≥ max(ra, rb), contributing the literal tail sum
    // T(max(ra, rb)) — so the whole metric is one ≤10-row-per-side
    // equi-join plus a 10-entry literal lookup, latticed to 1e-6
    // before the per-nation sum and scaled by (1−p) at the end.
    Q("q_rbo",
      s"""WITH b AS ($baseSql),
         |pa AS (SELECT n_name, l_suppkey,
         |              CAST(row_number() OVER (PARTITION BY n_name
         |                     ORDER BY train DESC, l_suppkey) AS BIGINT) AS ra
         |       FROM b),
         |pb AS (SELECT n_name, l_suppkey,
         |              CAST(row_number() OVER (PARTITION BY n_name
         |                     ORDER BY test DESC, l_suppkey) AS BIGINT) AS rb
         |       FROM b),
         |c AS (SELECT pa.n_name,
         |             CAST(CASE WHEN pa.ra > pb.rb THEN pa.ra ELSE pb.rb END AS BIGINT) AS m
         |      FROM pa JOIN pb ON pa.n_name = pb.n_name AND pa.l_suppkey = pb.l_suppkey
         |      WHERE pa.ra <= 10 AND pb.rb <= 10),
         |t AS (SELECT n_name,
         |             CAST(sum(CAST(floor(($rboTSql) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s6,
         |             CAST(count(*) AS BIGINT) AS n_common
         |      FROM c GROUP BY 1),
         |nn AS (SELECT DISTINCT n_name FROM b)
         |SELECT nn.n_name,
         |       CAST(coalesce(t.n_common, 0) AS BIGINT) AS n_common,
         |       ${Q.sqlR6("0.1 * coalesce(t.s6, 0) / 1e6")} AS rbo_10
         |FROM nn LEFT JOIN t ON nn.n_name = t.n_name
         |ORDER BY nn.n_name""".stripMargin) { (s, d) =>
      val b = Q.snapshot(base(s, d))
      val ta = top10(b, "train").select(col("n_name"), col("l_suppkey"), col("rk").as("ra"))
      val tb = top10(b, "test").select(col("n_name"), col("l_suppkey"), col("rk").as("rb"))
      val t = ta.join(tb, Seq("n_name", "l_suppkey"))
        .select(col("n_name"), greatest(col("ra"), col("rb")).as("m"))
        .groupBy("n_name")
        .agg(sum(floor(rboTOf(col("m")) * 1e6 + 0.5).cast("long")).as("s6"),
          count(lit(1)).as("n_common"))
      b.select(col("n_name")).distinct()
        .join(t, Seq("n_name"), "left")
        .select(col("n_name"),
          coalesce(col("n_common"), lit(0L)).as("n_common"),
          Q.r6(lit(0.1) * coalesce(col("s6"), lit(0L)) / lit(1e6)).as("rbo_10"))
        .orderBy("n_name")
    },

    // NDCG@10 of the train→test supplier ranking (round 15): DCG with
    // linear gain (test cents — the graded-relevance convention that
    // stays exact where 2^rel−1 would overflow any lattice) discounted
    // by the literal 1/log2(i+1) table; ideal ranking = the same
    // bounded top-10 under (test DESC, suppkey). Per-term 1e-6 lattice
    // → exact int64 per-nation sums → ONE division; the macro mean
    // rides the ≤25-row nation frame. Nations whose test window is
    // empty read NULL (an all-zero ideal cannot normalize).
    Q("q_ndcg",
      s"""WITH b AS ($baseSql),
         |p AS (SELECT n_name, l_suppkey, test,
         |             CAST(row_number() OVER (PARTITION BY n_name
         |                    ORDER BY train DESC, l_suppkey) AS BIGINT) AS rk
         |      FROM b),
         |w AS (SELECT n_name, test, $wSql AS wt FROM p WHERE rk <= 10),
         |d AS (SELECT n_name,
         |             CAST(sum(CAST(floor(test * wt * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS dcg6
         |      FROM w GROUP BY 1),
         |pi AS (SELECT n_name, l_suppkey, test,
         |              CAST(row_number() OVER (PARTITION BY n_name
         |                     ORDER BY test DESC, l_suppkey) AS BIGINT) AS rk
         |       FROM b),
         |wi AS (SELECT n_name, test, $wSql AS wt FROM pi WHERE rk <= 10),
         |di AS (SELECT n_name,
         |              CAST(sum(CAST(floor(test * wt * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS idcg6
         |       FROM wi GROUP BY 1),
         |j AS (SELECT d.n_name, d.dcg6, di.idcg6,
         |             CASE WHEN di.idcg6 > 0
         |               THEN CAST(floor(CAST(d.dcg6 AS DOUBLE) / di.idcg6 * 1e6 + 0.5) AS BIGINT)
         |             END AS n6
         |      FROM d JOIN di ON d.n_name = di.n_name),
         |g AS (SELECT *, CAST(sum(n6) OVER () AS BIGINT) AS s6,
         |             CAST(count(n6) OVER () AS BIGINT) AS nn FROM j)
         |SELECT n_name,
         |       CASE WHEN idcg6 > 0 THEN ${Q.sqlR6("CAST(dcg6 AS DOUBLE) / idcg6")} END AS ndcg_10,
         |       ${Q.sqlR6("CAST(s6 AS DOUBLE) / (nn * 1e6)")} AS mean_ndcg
         |FROM g
         |ORDER BY n_name""".stripMargin) { (s, d) =>
      val b = Q.snapshot(base(s, d))
      def dcgOf(top: DataFrame, out: String): DataFrame = top
        .join(b.select(col("n_name"), col("l_suppkey"), col("test")),
          Seq("n_name", "l_suppkey"), "left")
        .groupBy("n_name")
        .agg(sum(floor(col("test") * wOf(col("rk")) * 1e6 + 0.5).cast("long")).as(out))
      val d6 = dcgOf(top10(b, "train"), "dcg6")
      val i6 = dcgOf(top10(b, "test"), "idcg6")
      import org.apache.spark.sql.expressions.Window
      val j = d6.join(i6, "n_name")
        .withColumn("n6", when(col("idcg6") > 0,
          floor(col("dcg6").cast("double") / col("idcg6") * 1e6 + 0.5).cast("long")))
      j.withColumn("s6", sum("n6").over(Window.partitionBy()))
        .withColumn("nn", count("n6").over(Window.partitionBy()))
        .select(col("n_name"),
          when(col("idcg6") > 0,
            Q.r6(col("dcg6").cast("double") / col("idcg6"))).as("ndcg_10"),
          Q.r6(col("s6").cast("double") / (col("nn") * lit(1e6))).as("mean_ndcg"))
        .orderBy("n_name")
    },

    // MRR@10 of the same ranking (round 15): per nation the reciprocal
    // rank of the FIRST predicted supplier with any test revenue
    // (0 when none of the top-10 has any — the standard @10 cutoff),
    // and the global MRR over all nations. 1/rk terms floor onto the
    // 1e-6 lattice before the ≤25-row cross-nation sum.
    Q("q_mrr",
      s"""WITH b AS ($baseSql),
         |p AS (SELECT n_name, l_suppkey, test,
         |             CAST(row_number() OVER (PARTITION BY n_name
         |                    ORDER BY train DESC, l_suppkey) AS BIGINT) AS rk
         |      FROM b),
         |f AS (SELECT n_name, CAST(min(CASE WHEN test > 0 THEN rk END) AS BIGINT) AS frk
         |      FROM p WHERE rk <= 10 GROUP BY 1),
         |r AS (SELECT n_name, frk,
         |             CASE WHEN frk IS NOT NULL
         |               THEN CAST(floor(1.0 / frk * 1e6 + 0.5) AS BIGINT)
         |               ELSE 0 END AS rr6
         |      FROM f),
         |g AS (SELECT *, CAST(sum(rr6) OVER () AS BIGINT) AS s6,
         |             CAST(count(*) OVER () AS BIGINT) AS nn FROM r)
         |SELECT n_name, frk AS first_rel_rank,
         |       CASE WHEN frk IS NOT NULL THEN ${Q.sqlR6("1.0 / frk")} ELSE 0 END AS rr,
         |       ${Q.sqlR6("CAST(s6 AS DOUBLE) / (nn * 1e6)")} AS mrr
         |FROM g
         |ORDER BY n_name""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val b = Q.snapshot(base(s, d))
      top10(b, "train")
        .join(b.select(col("n_name"), col("l_suppkey"), col("test")),
          Seq("n_name", "l_suppkey"), "left")
        .groupBy("n_name")
        .agg(min(when(col("test") > 0, col("rk"))).as("frk"))
        .withColumn("rr6", when(col("frk").isNotNull,
          floor(lit(1.0) / col("frk") * 1e6 + 0.5).cast("long")).otherwise(0L))
        .withColumn("s6", sum("rr6").over(Window.partitionBy()))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
        .select(col("n_name"), col("frk").as("first_rel_rank"),
          when(col("frk").isNotNull, Q.r6(lit(1.0) / col("frk"))).otherwise(lit(0.0)).as("rr"),
          Q.r6(col("s6").cast("double") / (col("nn") * lit(1e6))).as("mrr"))
        .orderBy("n_name")
    },

    // P@10 / R@10 of the same ranking (round 15): hits = predicted
    // top-10 suppliers with any test revenue; precision uses the fixed
    // k = 10 denominator (a nation fielding fewer than 10 suppliers is
    // penalized — the standard convention, documented), recall divides
    // by the nation's total relevant count; the macro-averaged P@10
    // rides exact hit counts (Σ hits / (10·nations)), never a sum of
    // rounded doubles. NULL recall where a nation has no relevant
    // suppliers at all.
    Q("q_precision_at_k",
      s"""WITH b AS ($baseSql),
         |p AS (SELECT n_name, l_suppkey, test,
         |             CAST(row_number() OVER (PARTITION BY n_name
         |                    ORDER BY train DESC, l_suppkey) AS BIGINT) AS rk
         |      FROM b),
         |h AS (SELECT n_name,
         |             CAST(sum(CASE WHEN test > 0 THEN 1 ELSE 0 END) AS BIGINT) AS hits
         |      FROM p WHERE rk <= 10 GROUP BY 1),
         |nr AS (SELECT n_name,
         |              CAST(sum(CASE WHEN test > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel
         |       FROM b GROUP BY 1),
         |j AS (SELECT h.n_name, h.hits, nr.n_rel
         |      FROM h JOIN nr ON h.n_name = nr.n_name),
         |g AS (SELECT *, CAST(sum(hits) OVER () AS BIGINT) AS sh,
         |             CAST(count(*) OVER () AS BIGINT) AS nn FROM j)
         |SELECT n_name, hits AS hits_at_10, n_rel,
         |       ${Q.sqlR6("CAST(hits AS DOUBLE) / 10")} AS p_at_10,
         |       CASE WHEN n_rel > 0 THEN ${Q.sqlR6("CAST(hits AS DOUBLE) / n_rel")} END AS r_at_10,
         |       ${Q.sqlR6("CAST(sh AS DOUBLE) / (nn * 10)")} AS macro_p10
         |FROM g
         |ORDER BY n_name""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val b = Q.snapshot(base(s, d))
      val h = top10(b, "train")
        .join(b.select(col("n_name"), col("l_suppkey"), col("test")),
          Seq("n_name", "l_suppkey"), "left")
        .groupBy("n_name")
        .agg(sum(when(col("test") > 0, 1L).otherwise(0L)).as("hits"))
      val nr = b.groupBy("n_name")
        .agg(sum(when(col("test") > 0, 1L).otherwise(0L)).as("n_rel"))
      h.join(nr, "n_name")
        .withColumn("sh", sum("hits").over(Window.partitionBy()))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
        .select(col("n_name"), col("hits").as("hits_at_10"), col("n_rel"),
          Q.r6(col("hits").cast("double") / lit(10)).as("p_at_10"),
          when(col("n_rel") > 0,
            Q.r6(col("hits").cast("double") / col("n_rel"))).as("r_at_10"),
          Q.r6(col("sh").cast("double") / (col("nn") * lit(10))).as("macro_p10"))
        .orderBy("n_name")
    },

    // Isotonic (PAV) calibration of event value → purchase probability
    // (round 16): the best MONOTONE estimate of P(purchase | value
    // band) — what a score calibrator ships when the reliability
    // readout (q_calibration) shows raw rates zig-zagging. Values band
    // onto the monotone integer key digits·100 + first-two-digits (the
    // q_abc_class magnitude-band move — bounded ≤ ~2000 keys, never a
    // rank over the corpus); the isotonic fit is the exact minimax
    // formula iso(i) = max_{j≤i} min_{k≥i} rate(j..k) over the banded
    // prefix sums — pure integer prefix counts, each interval rate ONE
    // division, and min/max over identical doubles cannot disagree
    // across engines. The grid³ interval expansion runs on the bounded
    // band frame only; the corpus collapses once with map-side
    // partials.
    Q("q_isotonic",
      s"""WITH sc AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
         |                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |            FROM events),
         |bd AS (SELECT length(CAST(v AS VARCHAR)) * 100 +
         |              CAST(substring(CAST(v AS VARCHAR), 1, 2) AS BIGINT) AS band,
         |              CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s
         |       FROM sc WHERE v >= 0 GROUP BY 1),
         |ix AS (SELECT band, n, s,
         |              CAST(row_number() OVER (ORDER BY band) AS BIGINT) AS i,
         |              CAST(sum(n) OVER (ORDER BY band) AS BIGINT) AS cn,
         |              CAST(sum(s) OVER (ORDER BY band) AS BIGINT) AS cs
         |       FROM bd),
         |iv AS (SELECT j.i AS j, k.i AS k,
         |              CAST(k.cs - j.cs + j.s AS DOUBLE) /
         |              (k.cn - j.cn + j.n) AS r
         |       FROM ix j JOIN ix k ON j.i <= k.i),
         |mn AS (SELECT iv.j, t.i, min(iv.r) AS m
         |       FROM iv JOIN ix t ON iv.j <= t.i AND iv.k >= t.i
         |       GROUP BY 1, 2),
         |iso AS (SELECT i, max(m) AS iso FROM mn GROUP BY 1)
         |SELECT ix.band, ix.n, ix.s AS n_pos,
         |       ${Q.sqlR6("CAST(ix.s AS DOUBLE) / ix.n")} AS raw_rate,
         |       ${Q.sqlR6("iso.iso")} AS iso_rate
         |FROM ix JOIN iso ON ix.i = iso.i
         |ORDER BY ix.band""".stripMargin) { (s, d) =>
      isotonicOf(Tables.events(s, d)
        .select(col("event_type").as("g"),
          floor(col("value") * 100 + 0.5).cast("long").as("v100"))
        .groupBy("g", "v100")
        .agg(count(lit(1)).as("c")))
    })

  /** The PAV minimax fit over a (g, v100, c) value grid — ONE home
    * shared by batch q_isotonic and the s_isotonic streaming read-time
    * view (the grid is streaming.Streams.rankGrid's mergeable state; a
    * new event shifts its band's rate and every interval rate through
    * it, so the fit re-prices at read time). */
  private[graft] def isotonicOf(rg: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Non-negative value contract (r17, ADVICE): the digits·100 +
    // first-two-digits band key is monotone in v only for v ≥ 0 — a
    // negative cents value would silently break the isotonic-ordering
    // premise, so it is excluded here and in the oracle's bd CTE.
    val bd = rg
      .filter(col("v100") >= 0)
      .groupBy((length(col("v100").cast("string")) * 100 +
        substring(col("v100").cast("string"), 1, 2).cast("long")).as("band"))
      .agg(sum("c").as("n"),
        sum(when(col("g") === "purchase", col("c")).otherwise(0L)).as("s"))
    val wb = Window.orderBy("band")
    val ix = Q.snapshot(bd
      .withColumn("i", row_number().over(wb).cast("long"))
      .withColumn("cn", sum("n").over(wb))
      .withColumn("cs", sum("s").over(wb)))
    val j = ix.select(col("i").as("j"), col("n").as("jn"), col("s").as("js"),
      col("cn").as("jcn"), col("cs").as("jcs"))
    val k = ix.select(col("i").as("k"), col("cn").as("kcn"), col("cs").as("kcs"))
    val iv = j.join(broadcast(k), col("j") <= col("k"))
      .select(col("j"), col("k"),
        ((col("kcs") - col("jcs") + col("js")).cast("double") /
          (col("kcn") - col("jcn") + col("jn"))).as("r"))
    val mn = iv.join(broadcast(ix.select(col("i"))),
        col("j") <= col("i") && col("k") >= col("i"))
      .groupBy("j", "i").agg(min("r").as("m"))
    val iso = mn.groupBy("i").agg(max("m").as("iso"))
    ix.join(iso, "i")
      .select(col("band"), col("n"), col("s").as("n_pos"),
        Q.r6(col("s").cast("double") / col("n")).as("raw_rate"),
        Q.r6(col("iso")).as("iso_rate"))
      .orderBy("band")
  }
}
