package graft

import org.apache.spark.sql.functions._

/** A fourth scale decade for the bench heavies (r17 verdict #7):
  * TESTDATA stops at sf0.1, so this spec DERIVES a seeded 3× corpus
  * (sf0.3-equivalent) from the shipped sf0.1 tables and extends the
  * near-linear wall-clock assertions one decade up for the most
  * expensive queries in the r16 plan-audit table (q_ppl_bucket,
  * q_lsh_tuning, q_label_propagation, q_graph_components, q_graph_bfs,
  * q_graph_closeness, q_pagerank, q_knn_ivf).
  *
  * Derivation is deterministic — pure column arithmetic on the replica
  * index k ∈ 0..2, no RNG, so every run builds the identical corpus:
  *  - lineitem replicates with per-replica key offsets → THREE DISJOINT
  *    graph copies (nodes/edges exactly 3×, no cross-replica edge);
  *  - documents suffix every token with the replica id → replicas share
  *    no shingles/trigrams, so the near-dup/candidate structure grows
  *    linearly (pure replication would grow dup-cluster pairs
  *    quadratically and unfairly fail a correct plan);
  *  - embeddings shift component 0 by k/4 → vectors stay distinct while
  *    the IVF cell geometry is preserved per replica.
  *
  * Bound convention follows CorpusScaleSpec: for 3× data the wall-clock
  * may grow at most 9× max(t1, 0.4) — linear growth with 3× headroom
  * for fixed overheads and box noise; a quadratic term reads ~9× the
  * linear cost and fails.
  */
class ScaleDecadeSpec extends SparkSpec {

  private val base = "/root/testdata/sf0.1"

  /** The derived n× directory, built once per scale per suite. */
  private def derive(nRep: Int, name: String): String = {
    val dir = tempDir(name)
    val k = spark.range(nRep).toDF("k")

    val li = spark.read.parquet(s"$base/lineitem.parquet")
    val mx = li.agg(max("l_partkey").as("p"), max("l_suppkey").as("s"),
      max("l_orderkey").as("o")).head()
    li.crossJoin(k)
      .withColumn("l_partkey", col("l_partkey") + col("k") * (mx.getAs[Long]("p") + 1))
      .withColumn("l_suppkey", col("l_suppkey") + col("k") * (mx.getAs[Long]("s") + 1))
      .withColumn("l_orderkey", col("l_orderkey") + col("k") * (mx.getAs[Long]("o") + 1))
      .drop("k")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val docs = spark.read.parquet(s"$base/documents.parquet")
    val md = docs.agg(max("doc_id")).head().getLong(0) + 1
    docs.crossJoin(k)
      .withColumn("doc_id", col("doc_id") + col("k") * md)
      .withColumn("text",
        expr("array_join(transform(split(text, ' '), w -> concat(w, 'r', k)), ' ')"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("k")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val mv = emb.agg(max("vec_id")).head().getLong(0) + 1
    emb.crossJoin(k)
      .withColumn("vec_id", col("vec_id") + col("k") * mv)
      .withColumn("embedding", expr(
        "transform(embedding, (x, i) -> " +
          "CAST(CASE WHEN i = 0 THEN x + k / 4.0 ELSE x END AS FLOAT))"))
      .drop("k")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private lazy val dir3: String = derive(3, "sf03_derived")
  /** The FULL order of magnitude (r18 — the r17 verdict's #3): ten
    * disjoint sf0.1 replicas ≈ a derived sf1.0. */
  private lazy val dir10: String = derive(10, "sf1_derived")

  // min-of-3 at the base scale (r18 ADVICE): on a loaded/shared box a
  // single noise spike could breach the bound; three runs make the min
  // robust to one burst while still catching a real quadratic. The
  // big-scale side takes `reps` runs — multi-second 10x runs are
  // noise-resistant in proportion, so one run suffices there while the
  // 3x tier keeps three.
  private def minTime(reps: Int)(f: () => Long): (Double, Long) = {
    var rows = 0L
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      rows = f()
      (System.nanoTime() - t0) / 1e9
    }
    (times.min, rows)
  }

  private def assertNearLinear(names: Seq[String], dir: String, factor: Int,
                               bigReps: Int): Unit =
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, base).count() // warm codegen/plans
      val (t1, r1) = minTime(3)(() => fn(spark, base).count())
      val (tn, rn) = minTime(bigReps)(() => fn(spark, dir).count())
      assert(r1 > 0 && rn > 0, s"$name produced no rows at one of the scales")
      // linear growth with 3x headroom for fixed overheads and box
      // noise; a quadratic term reads ~factor× the linear cost
      val bound = 3.0 * factor * math.max(t1, 0.4)
      assert(tn <= bound,
        f"$name took $tn%.2f s at ${factor}x vs $t1%.2f s at sf0.1 — growth " +
          f"${tn / math.max(t1, 0.4)}%.1fx exceeds the near-linear bound")
      info(f"$name: sf0.1 $t1%.2f s, ${factor}x $tn%.2f s (${tn / math.max(t1, 0.4)}%.1fx)")
    }

  test("the derived 3x corpus has exactly 3x rows and disjoint graph copies") {
    val li1 = spark.read.parquet(s"$base/lineitem.parquet")
    val li3 = spark.read.parquet(s"$dir3/lineitem.parquet")
    assert(li3.count() === 3 * li1.count())
    // disjointness: each replica's part keys occupy a distinct band
    assert(li3.select("l_partkey").distinct().count() ===
      3 * li1.select("l_partkey").distinct().count())
    val d1 = spark.read.parquet(s"$base/documents.parquet")
    val d3 = spark.read.parquet(s"$dir3/documents.parquet")
    assert(d3.count() === 3 * d1.count())
    assert(d3.select("doc_id").distinct().count() === d3.count())
    val e3 = spark.read.parquet(s"$dir3/embeddings.parquet")
    assert(e3.count() === 3 * spark.read.parquet(s"$base/embeddings.parquet").count())
  }

  test("graph heavies stay near-linear one decade up (3 disjoint sf0.1 copies)") {
    // disjoint copies: iterative propagation/BFS rounds are bounded by
    // the per-copy diameter, so only per-round work may grow — any
    // superlinear reading means a round stopped being keyed join + agg
    assertNearLinear(Seq("q_graph_components", "q_graph_bfs",
      "q_graph_closeness", "q_pagerank", "q_label_propagation"), dir3, 3, 3)
  }

  test("corpus heavies stay near-linear one decade up (token-disjoint replicas)") {
    // the trigram LM stays charset³-bounded and the LSH bandings stay
    // collision-bounded: replicas share no tokens, so candidates and
    // model cells grow ~3x, never 9x
    assertNearLinear(Seq("q_ppl_bucket", "q_lsh_tuning"), dir3, 3, 3)
  }

  test("ANN heavy stays near-linear one decade up (cell geometry preserved)") {
    // the IVF quantizer is k-bounded and the probe set is fixed by
    // vec_id < 10 (replica 0 only): 3x corpus grows the cell join's
    // build side linearly
    assertNearLinear(Seq("q_knn_ivf"), dir3, 3, 3)
  }

  test("the top-8 heavies hold near-linear across a FULL order of magnitude (10x)") {
    // ten disjoint sf0.1 replicas = a derived sf1.0-equivalent corpus
    // (6M lineitem rows, 50k docs, 20k vectors) built on the fly and
    // never persisted; a plan with a hidden quadratic term reads ~10x
    // the linear cost here and fails the 30x bound even on a noisy box
    val li10 = spark.read.parquet(s"$dir10/lineitem.parquet").count()
    val li1 = spark.read.parquet(s"$base/lineitem.parquet").count()
    assert(li10 === 10 * li1, "the derived decade must hold exactly 10x rows")
    assertNearLinear(Seq("q_ppl_bucket", "q_lsh_tuning", "q_label_propagation",
      "q_graph_components", "q_graph_bfs", "q_graph_closeness", "q_pagerank",
      "q_knn_ivf"), dir10, 10, 1)
  }
}
