package graft.ops

import graft.{Q, QueryDef, Tables}
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

  /** Oracled query entries: the events table IS the skew case the
    * helpers exist for — user_id has a fixed 15-value domain, so at
    * 100 TB each key holds ~7% of all rows and a plain hash shuffle
    * puts each on one reducer. The oracles are the UNSALTED SQL: the
    * rewrites must be result-identical (that is the whole point), which
    * makes skew mitigation itself hash-checked by the driver, not just
    * equivalence-tested in SkewSpec.
    */
  def defs: Seq[QueryDef] = Seq(

    // Two-phase salted aggregation: phase 1 combines (user_id, salt)
    // partials — 16 reducers share each hot key — phase 2 merges 16
    // partial rows per key. Shuffle volume after phase 1 is |keys|×16
    // rows, independent of corpus size.
    Q("q_skew_agg",
      """SELECT user_id,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       floor((sum(value))*100+0.5)/100 AS total_value
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      // salt on event_id (unique): identical hot-key (user_id, value)
      // rows spread uniformly instead of co-salting onto one reducer
      val e = Tables.events(s, d).select("event_id", "user_id", "value")
      twoPhaseAgg(e, "user_id", 16, Seq("event_id"),
          "n_events" -> (count(lit(1)), (c: String) => sum(col(c))),
          "total_value" -> (sum(col("value")), (c: String) => sum(col(c))))
        .select(col("user_id"), col("n_events"), Q.r2(col("total_value")).as("total_value"))
        .orderBy("user_id")
    },

    // Salted fact⋈dim join: nation is above toy broadcast thresholds in
    // spirit (stand-in for a dim too big to broadcast); each hot user_id
    // is spread over 8 reducers, the dim replicated 8×. Replication cost
    // is 8·|dim| rows — constant — vs the unsalted plan's single-reducer
    // hot key.
    Q("q_skew_join",
      """SELECT n_name,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       floor((sum(value))*100+0.5)/100 AS total_value
        |FROM events JOIN nation ON user_id = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select("event_id", "user_id", "value")
      val n = Tables.load(s, d, "nation")
      saltedJoin(e, n, "user_id", "n_nationkey", 8, saltOn = Seq("event_id"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_events"), Q.r2(sum(col("value"))).as("total_value"))
        .orderBy("n_name")
    }
  )

  /** Equi-join `skewed ⋈ other` on skewed(key) == other(otherKey),
    * spreading each hot key over `salts` reducers: the skewed side gets
    * a uniform salt, the other side is replicated `salts` ways. Shuffle
    * volume: |skewed| + salts × |other| — use when `other` is small-ish
    * but above the broadcast threshold.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame,
                 key: String, otherKey: String, salts: Int,
                 saltOn: Seq[String] = Nil): DataFrame = {
    require(salts > 0)
    // DETERMINISTIC salt: hash of row content. A
    // monotonically_increasing_id salt depends on partition layout —
    // nondeterministic-tagged, so a fetch failure forces whole-stage
    // recompute and upstream repartitioning changes results. Content
    // hashing is stable under retries and repartitioning. Caveat: with
    // the default (hash ALL columns), byte-identical hot-key rows
    // co-salt, collapsing the spread back to one reducer — real skew
    // workloads often have exactly that shape. Pass a unique id column
    // via `saltOn` when the table has one (q_skew_join salts on
    // event_id) to guarantee uniform spread.
    val saltCols = (if (saltOn.nonEmpty) saltOn else skewed.columns.toIndexedSeq).map(col)
    val salted = skewed.withColumn(SaltCol,
      pmod(hash(saltCols: _*).cast("long"), lit(salts.toLong)))
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
    * Skew.twoPhaseAgg(df, "k", 16, Seq("id"),
    *   "n"   -> (count(lit(1)), sum _),
    *   "tot" -> (sum(col("v")), sum _))
    * }}}
    */
  def twoPhaseAgg(df: DataFrame, key: String, salts: Int,
                  saltOn: Seq[String],
                  aggs: (String, (Column, String => Column))*): DataFrame = {
    require(salts > 0 && aggs.nonEmpty)
    val partials = aggs.map { case (name, (p1, _)) => p1.as(s"__p_$name") }
    val merges = aggs.map { case (name, (_, p2)) => p2(s"__p_$name").as(name) }
    // same deterministic content-hash salt as saltedJoin — and the same
    // co-salting caveat: with the default (hash ALL columns),
    // byte-identical hot-key rows land on one reducer. Pass a unique id
    // column via `saltOn` to guarantee uniform spread.
    val saltCols = (if (saltOn.nonEmpty) saltOn else df.columns.toIndexedSeq).map(col)
    df.withColumn(SaltCol, pmod(hash(saltCols: _*).cast("long"), lit(salts.toLong)))
      .groupBy(col(key), col(SaltCol))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(merges.head, merges.tail: _*)
  }
}
