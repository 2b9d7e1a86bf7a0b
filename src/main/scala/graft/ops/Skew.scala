package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY §4 / builder brief: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join splitting handles moderate skew transparently; these
  * helpers cover the cases AQE cannot re-plan:
  *  - a broadcast-ineligible join where one key holds a double-digit
  *    percentage of all rows (AQE splits partitions, but a single
  *    monster KEY still lands in one task per split boundary);
  *  - a high-skew aggregation whose map-side combine is defeated by
  *    high-cardinality secondary grouping.
  *
  * Both are pure plan rewrites — no state, deterministic results,
  * equivalence-tested in SkewSpec.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Equi-join `skewed ⋈ other` on skewed(key) == other(otherKey),
    * spreading each hot key over `salts` reducers: the skewed side gets
    * a uniform salt, the other side is replicated `salts` ways. Shuffle
    * volume: |skewed| + salts × |other| — use when `other` is small-ish
    * but above the broadcast threshold.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame,
                 key: String, otherKey: String, salts: Int): DataFrame = {
    require(salts > 0)
    // DETERMINISTIC salt: hash of the full row content. A
    // monotonically_increasing_id salt depends on partition layout —
    // nondeterministic-tagged, so a fetch failure forces whole-stage
    // recompute and upstream repartitioning changes results. Content
    // hashing is stable under retries and repartitioning; fully
    // duplicate rows co-salt (slightly less spreading), which only
    // costs balance, never correctness.
    val salted = skewed.withColumn(SaltCol,
      pmod(hash(skewed.columns.map(col): _*).cast("long"), lit(salts.toLong)))
    val replicated = other.withColumn(SaltCol,
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    salted.join(replicated,
        salted(key) === replicated(otherKey) &&
          salted(SaltCol) === replicated(SaltCol))
      .drop(SaltCol)
  }

  /** Two-phase aggregation for skewed group keys: phase 1 aggregates
    * (key, salt) partials, phase 2 merges partials per key. `aggs` maps
    * output column name -> (phase1 agg of the input column, phase2 merge
    * of the partial). Example:
    * {{{
    * Skew.twoPhaseAgg(df, "k", 16,
    *   "n"   -> (count(lit(1)), sum _),
    *   "tot" -> (sum(col("v")), sum _))
    * }}}
    */
  def twoPhaseAgg(df: DataFrame, key: String, salts: Int,
                  aggs: (String, (Column, String => Column))*): DataFrame = {
    require(salts > 0 && aggs.nonEmpty)
    val partials = aggs.map { case (name, (p1, _)) => p1.as(s"__p_$name") }
    val merges = aggs.map { case (name, (_, p2)) => p2(s"__p_$name").as(name) }
    // same deterministic content-hash salt as saltedJoin
    df.withColumn(SaltCol, pmod(hash(df.columns.map(col): _*).cast("long"), lit(salts.toLong)))
      .groupBy(col(key), col(SaltCol))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(merges.head, merges.tail: _*)
  }
}
