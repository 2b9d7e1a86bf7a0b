package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Price/volume decomposition operators (round 13, SURVEY §2.15): the
  * two classical index-number readouts a revenue team runs over a
  * transaction fact — the year-over-year price-volume-mix bridge and
  * the Laspeyres/Paasche/Fisher price index series.
  *
  * Determinism discipline: every monetary quantity is integer CENTS
  * from the first touch (`floor(x*100+0.5)` per lineitem row), every
  * per-part cross product (an old price times a new quantity) is
  * rounded back to the integer-cent lattice BEFORE the cross-part sum,
  * so the only cross-row reductions are exact int64 in both engines;
  * unit prices exist transiently inside a per-part scalar tree only.
  * Scale: one lineitem scan per operator onto a part-year frame
  * (catalog-sized — orders of magnitude below the fact table), all
  * joins part-keyed, output |brands| or |years| rows.
  */
object Pricing {

  /** Part-year rollup: exact int64 (quantity, cents) per (partkey, yr).
    * The shared first stage under both operators — one fact-table scan,
    * map-side partial agg, catalog-sized output. */
  private def partYear(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "lineitem")
      .select(col("l_partkey"),
        year(col("l_shipdate")).cast("long").as("yr"),
        floor(col("l_quantity") + 0.5).cast("long").as("q"),
        floor(col("l_extendedprice") * 1e2 + 0.5).cast("long").as("c"))
      .groupBy("l_partkey", "yr")
      .agg(sum("q").as("q"), sum("c").as("c"))

  private val partYearSql: String =
    """SELECT l_partkey,
      |       CAST(year(l_shipdate) AS BIGINT) AS yr,
      |       CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS q,
      |       CAST(sum(CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT)) AS BIGINT) AS c
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // Year-over-year revenue bridge per brand (1997 → 1998): the
    // price-volume-mix decomposition Δrev = Σ p₀·Δq (volume) +
    // Σ Δp·q₁ (price) + new-part revenue − lost-part revenue, the
    // one-table answer to "did we sell more units or just reprice
    // them". For parts traded both years the volume+price terms
    // reconstruct c₁−c₀ exactly before lattice rounding (the algebra
    // telescopes), so the bridge ties out to the delta within one
    // cent per part. Spark: the part-year frame pivots to per-part
    // (q₀,c₀,q₁,c₁) in one conditional agg, terms round to integer
    // cents, and the brand rollup joins the catalog part-keyed.
    Q("q_revenue_bridge",
      s"""WITH py AS ($partYearSql),
         |pp AS (SELECT l_partkey,
         |              max(CASE WHEN yr = 1997 THEN q END) AS q0,
         |              max(CASE WHEN yr = 1997 THEN c END) AS c0,
         |              max(CASE WHEN yr = 1998 THEN q END) AS q1,
         |              max(CASE WHEN yr = 1998 THEN c END) AS c1
         |       FROM py WHERE yr IN (1997, 1998) GROUP BY 1),
         |terms AS (SELECT p.p_brand AS brand,
         |                 COALESCE(pp.c0, 0) AS c0, COALESCE(pp.c1, 0) AS c1,
         |                 CASE WHEN pp.c0 IS NOT NULL AND pp.c1 IS NOT NULL THEN
         |                   CAST(floor((CAST(pp.c0 AS DOUBLE) / pp.q0) * (pp.q1 - pp.q0) + 0.5) AS BIGINT)
         |                 ELSE 0 END AS vol_c,
         |                 CASE WHEN pp.c0 IS NOT NULL AND pp.c1 IS NOT NULL THEN
         |                   CAST(floor((CAST(pp.c1 AS DOUBLE) / pp.q1 - CAST(pp.c0 AS DOUBLE) / pp.q0) * pp.q1 + 0.5) AS BIGINT)
         |                 ELSE 0 END AS price_c,
         |                 CASE WHEN pp.c0 IS NULL THEN pp.c1 ELSE 0 END AS new_c,
         |                 CASE WHEN pp.c1 IS NULL THEN -pp.c0 ELSE 0 END AS lost_c
         |          FROM pp JOIN part p ON pp.l_partkey = p.p_partkey)
         |SELECT brand,
         |       ${Q.sqlR6("sum(c0) / 100.0")} AS rev_prev,
         |       ${Q.sqlR6("sum(c1) / 100.0")} AS rev_curr,
         |       ${Q.sqlR6("(sum(c1) - sum(c0)) / 100.0")} AS delta,
         |       ${Q.sqlR6("sum(vol_c) / 100.0")} AS volume_effect,
         |       ${Q.sqlR6("sum(price_c) / 100.0")} AS price_effect,
         |       ${Q.sqlR6("sum(new_c) / 100.0")} AS new_effect,
         |       ${Q.sqlR6("sum(lost_c) / 100.0")} AS lost_effect
         |FROM terms
         |GROUP BY 1
         |ORDER BY 1""".stripMargin) { (s, d) =>
      val pp = partYear(s, d)
        .filter(col("yr").isin(1997L, 1998L))
        .groupBy("l_partkey")
        .agg(max(when(col("yr") === 1997, col("q"))).as("q0"),
          max(when(col("yr") === 1997, col("c"))).as("c0"),
          max(when(col("yr") === 1998, col("q"))).as("q1"),
          max(when(col("yr") === 1998, col("c"))).as("c1"))
      val both = col("c0").isNotNull && col("c1").isNotNull
      val brand = Tables.load(s, d, "part").select(col("p_partkey"), col("p_brand"))
      pp.join(brand, pp("l_partkey") === brand("p_partkey"))
        .select(col("p_brand").as("brand"),
          coalesce(col("c0"), lit(0L)).as("c0"),
          coalesce(col("c1"), lit(0L)).as("c1"),
          when(both, floor((col("c0").cast("double") / col("q0")) *
            (col("q1") - col("q0")) + 0.5).cast("long")).otherwise(0L).as("vol_c"),
          when(both, floor((col("c1").cast("double") / col("q1") -
            col("c0").cast("double") / col("q0")) * col("q1") + 0.5).cast("long"))
            .otherwise(0L).as("price_c"),
          when(col("c0").isNull, col("c1")).otherwise(0L).as("new_c"),
          when(col("c1").isNull, -col("c0")).otherwise(0L).as("lost_c"))
        .groupBy("brand")
        .agg(Q.r6(sum("c0") / 100.0).as("rev_prev"),
          Q.r6(sum("c1") / 100.0).as("rev_curr"),
          Q.r6((sum("c1") - sum("c0")) / 100.0).as("delta"),
          Q.r6(sum("vol_c") / 100.0).as("volume_effect"),
          Q.r6(sum("price_c") / 100.0).as("price_effect"),
          Q.r6(sum("new_c") / 100.0).as("new_effect"),
          Q.r6(sum("lost_c") / 100.0).as("lost_effect"))
        .orderBy("brand")
    },

    // Laspeyres / Paasche / Fisher price index per ship year against
    // the 1995 base, over the parts traded in BOTH the base and the
    // measured year (the matched-sample convention): L = Σp_t·q₀ /
    // Σp₀·q₀ holds the basket at base quantities, P = Σp_t·q_t /
    // Σp₀·q_t at current ones, F = √(L·P) splits the substitution
    // bias. p·q products that are real transactions (p₀·q₀ = c₀,
    // p_t·q_t = c_t) stay exact cents; only the two counterfactual
    // cross products round to the cent lattice per part. The base
    // year's own row reads exactly 1.0 — the built-in sanity anchor.
    Q("q_price_index",
      s"""WITH py AS ($partYearSql),
         |base AS (SELECT l_partkey, q AS q0, c AS c0 FROM py WHERE yr = 1995),
         |j AS (SELECT py.yr, py.l_partkey, base.q0, base.c0, py.q AS qt, py.c AS ct,
         |             CAST(floor((CAST(py.c AS DOUBLE) / py.q) * base.q0 + 0.5) AS BIGINT) AS pt_q0,
         |             CAST(floor((CAST(base.c0 AS DOUBLE) / base.q0) * py.q + 0.5) AS BIGINT) AS p0_qt
         |      FROM py JOIN base ON py.l_partkey = base.l_partkey)
         |SELECT yr AS year, CAST(count(*) AS BIGINT) AS n_parts,
         |       ${Q.sqlR6("CAST(sum(pt_q0) AS DOUBLE) / sum(c0)")} AS laspeyres,
         |       ${Q.sqlR6("CAST(sum(ct) AS DOUBLE) / sum(p0_qt)")} AS paasche,
         |       ${Q.sqlR6("sqrt((CAST(sum(pt_q0) AS DOUBLE) / sum(c0)) * " +
                   "(CAST(sum(ct) AS DOUBLE) / sum(p0_qt)))")} AS fisher
         |FROM j
         |GROUP BY 1
         |ORDER BY 1""".stripMargin) { (s, d) =>
      // the part-year frame feeds both join sides — snapshot it so the
      // fact table is scanned once, not once per side
      val py = partYear(s, d).transform(Q.snapshot)
      val base = py.filter(col("yr") === 1995L)
        .select(col("l_partkey"), col("q").as("q0"), col("c").as("c0"))
      val j = py.join(base, "l_partkey")
        .select(col("yr"), col("q0"), col("c0"), col("q").as("qt"), col("c").as("ct"))
        .withColumn("pt_q0",
          floor((col("ct").cast("double") / col("qt")) * col("q0") + 0.5).cast("long"))
        .withColumn("p0_qt",
          floor((col("c0").cast("double") / col("q0")) * col("qt") + 0.5).cast("long"))
      val l = sum("pt_q0").cast("double") / sum("c0")
      val p = sum("ct").cast("double") / sum("p0_qt")
      j.groupBy(col("yr").as("year"))
        .agg(count(lit(1)).as("n_parts"), Q.r6(l).as("laspeyres"),
          Q.r6(p).as("paasche"), Q.r6(sqrt(l * p)).as("fisher"))
        .orderBy("year")
    }
  )
}
