package graft.ops

import graft.{Q, QueryDef, Tables}
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
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(col("ts").cast(DateType), to_date(lit(TrendAnchor)))
            .cast("long").as("x"))
        .agg(count(lit(1)).as("y"))
      val st = daily.groupBy("event_type")
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
        .select(explode(expr(
          """flatten(transform(pks,
            |  (x, i) -> transform(slice(pks, i + 2, size(pks)),
            |            y -> struct(x AS p1, y AS p2))))""".stripMargin)).as("pr"))
        .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
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
    }
  )
}
