package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Salting rewrites must be result-equivalent to the direct plans. */
class SkewSpec extends SparkSpec {

  test("saltedJoin equals the plain equi-join") {
    val li = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_orderpriority")
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    val salted = Skew.saltedJoin(li, ord, "l_orderkey", "o_orderkey", salts = 8)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("df-capped near-dup candidates with exact verification match the uncapped pairs") {
    // the cap prunes candidate GENERATION only; verification recomputes
    // the exact jaccard — so a cap above the max document frequency is
    // result-identical, and any cap yields a subset (never false pairs)
    val uncapped = ops.TextPipeline.nearDupPairs(spark, sfDir, None)
    val wideCap = ops.TextPipeline.nearDupPairs(spark, sfDir, Some(Long.MaxValue))
    assert(wideCap.except(uncapped).isEmpty && uncapped.except(wideCap).isEmpty)
    val tight = ops.TextPipeline.nearDupPairs(spark, sfDir, Some(3L))
    assert(tight.except(uncapped).isEmpty, "capped pairs must be a subset")
  }

  test("near-dup cap sweep: every cap yields a subset with exact jaccard values") {
    // the hot-shingle correction (df > cap shingles excluded from
    // candidate discovery but re-counted into the jaccard via the
    // hot-set left joins) must hold at EVERY cap, including caps far
    // below the max document frequency where the correction carries
    // most of the intersection. Rows include the jaccard, so the
    // subset check also proves discovered pairs report the exact
    // (uncapped) value — a wrong correction shows as a non-matching row.
    val uncapped = ops.TextPipeline.nearDupPairs(spark, sfDir, None).cache()
    try
      Seq(1L, 2L, 3L, 5L, 8L).foreach { cap =>
        val capped = ops.TextPipeline.nearDupPairs(spark, sfDir, Some(cap))
        assert(capped.except(uncapped).isEmpty,
          s"cap=$cap discovered a pair absent from (or mis-scored vs) the uncapped set")
      }
    finally uncapped.unpersist()
  }

  test("corpus guard: max shingle df stays under the declared 128 cap") {
    // q_dedup_containment's DuckDB oracle runs the exact uncapped
    // shingle self-join while the Spark twin blocks candidates at
    // dfCap=128 — pairs overlapping ONLY via hotter shingles would be
    // present in the oracle but missing from the twin. The divergence
    // is data-dependent, so this guard turns a future testdata
    // regeneration that crosses the boundary into a loud failure here
    // instead of a silent driver hash mismatch.
    val maxDf = ops.TextPipeline.shingles(spark, sfDir)
      .groupBy("lang", "shingle").agg(count(lit(1)).as("df"))
      .agg(max("df")).head.getLong(0)
    assert(maxDf <= 128L,
      s"max shingle df $maxDf crossed the 128 candidate cap: the capped " +
        "dedup queries no longer discover the same pairs as their oracles")
  }

  test("df-capped containment pairs match the uncapped set (shared stats machinery)") {
    // containment derives from the SAME shinglePairStats as near-dup;
    // this pins the invariance for its lower 0.5 threshold too — a
    // hot-only-overlap pair the cap hid would show as a missing row
    val uncapped = ops.TextPipeline.containmentPairs(spark, sfDir, None)
    val wideCap = ops.TextPipeline.containmentPairs(spark, sfDir, Some(Long.MaxValue))
    assert(wideCap.except(uncapped).isEmpty && uncapped.except(wideCap).isEmpty)
    val tight = ops.TextPipeline.containmentPairs(spark, sfDir, Some(3L))
    assert(tight.except(uncapped).isEmpty,
      "capped containment pairs must be an exact-scored subset")
  }

  test("twoPhaseAgg equals the direct aggregation") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val direct = li.groupBy(col("l_returnflag").as("k"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("tot"))
    val renamed = li.withColumnRenamed("l_returnflag", "k")
    val aggs = Seq(
      "n" -> (count(lit(1)), (c: String) => sum(col(c))),
      "tot" -> (sum(col("l_quantity")), (c: String) => sum(col(c))))
    // both salt choices must be result-identical to the direct agg:
    // all-columns content hash AND an explicit unique-id saltOn
    val salted = Skew.twoPhaseAgg(renamed, "k", 16, Nil, aggs: _*)
    assert(salted.except(direct).isEmpty && direct.except(salted).isEmpty)
    val saltedOn = Skew.twoPhaseAgg(renamed, "k", 16, Seq("l_orderkey", "l_linenumber"), aggs: _*)
    assert(saltedOn.except(direct).isEmpty && direct.except(saltedOn).isEmpty)
  }
}
