package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search + embedding dedup over `embeddings` (SURVEY §2.10).
  *
  * Cosine is computed with codegen'd higher-order functions
  * (zip_with + aggregate) in double precision, with the EXACT same
  * formula text mirrored in the DuckDB oracle
  * (list_inner_product / sqrt·sqrt), so accumulation order and the
  * final division agree; scores are rounded (r4) before ranking so
  * rank ties resolve identically in both engines.
  *
  * Scale shapes:
  *  - q_sim_brute is probe-bounded: |probes| × |corpus|, with the probe
  *    side broadcast — the corpus is never shuffled, so it scales to any
  *    corpus size as long as the probe set is small;
  *  - q_dedup_embed blocks candidate pairs by an 8-bit sign-sketch
  *    (SimHash over identity projections) before computing exact cosine:
  *    the self-join runs on the bucket key, never all-pairs;
  *  - q_knn_lsh is the fully-approximate path (random-projection LSH
  *    from spark.ml) for when even bucketed exact cosine is too wide.
  */
object Similarity {

  /** Sign-sketch layout for q_dedup_embed, shared by the Spark impl and
    * the generated DuckDB oracle so the two sides cannot drift: B bands
    * of W sign bits each (band g covers dims g·W … g·W+W−1); candidates
    * are pairs agreeing exactly on ≥1 band, verified with exact cosine.
    *
    * Bucket-occupancy math (why these are parameters): each band table
    * has 2^W buckets, so per-band in-bucket join work is ~(N/2^W)²/2 per
    * bucket — pick W ≈ log2(N) − c to hold expected bucket size at ~2^c
    * regardless of corpus size (W=16 → 65,536 buckets covers ~10⁶-10⁷
    * vectors; widen W at 100 TB). OR-ing B bands multiplies recall the
    * way minhash banding does: a near-dup pair at angle θ survives a
    * W-bit band with p=(1−θ/π)^W, and ≥1 of B bands with 1−(1−p)^B.
    * The previous single 8-bit sketch (256 FIXED buckets) made bucket
    * size ∝ corpus → quadratic at 100×.
    */
  private[ops] val EmbedBands = 4
  private[ops] val EmbedBandBits = 16 // 4 × 16 covers all 64 dims

  /** Spark-side band value g: bit i set iff embedding[g·W+i] > 0. */
  private[ops] def embedBandVal(g: Int): Column =
    (0 until EmbedBandBits).map { i =>
      when(element_at(col("embedding"), g * EmbedBandBits + i + 1) > 0, 1 << i).otherwise(0)
    }.reduce(_ + _)

  /** DuckDB twin of [[embedBandVal]] (1-indexed lists). */
  private[ops] def embedBandSql(g: Int): String =
    (0 until EmbedBandBits)
      .map(i => s"CASE WHEN embedding[${g * EmbedBandBits + i + 1}] > 0 THEN ${1 << i} ELSE 0 END")
      .mkString("(", " + ", ")")

  /** embedding (float[]) widened to double[] once. */
  private def widened(df: DataFrame): DataFrame =
    df.withColumn("de", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))

  /** L2-normalized ml-vector view of `embeddings` for the IVF coarse
    * quantizer. Normalize BEFORE quantizing: k-means cells are
    * Euclidean, the search metric is cosine — on the unit sphere they
    * coincide (‖x−y‖² = 2−2·cos), so cells align with cosine
    * neighborhoods; quantizing raw vectors groups by magnitude and
    * costs recall. */
  private[graft] def ivfFeatures(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    // the norm is hoisted out of the per-element lambda (r18): the HOF
    // form re-evaluated the whole aggregate(zip_with(...)) fold once PER
    // ELEMENT of the outer transform — 64× the arithmetic; computing the
    // codegen'd dot once per row is bit-identical (same left-to-right
    // double fold, float widening) and drops the normalization from the
    // KMeans fit AND the corpus-wide assignment pass
    Tables.load(s, d, "embeddings")
      .withColumn("nrm",
        sqrt(graft.functions.DotProduct.dot_product(col("embedding"), col("embedding"))))
      .withColumn("features", array_to_vector(
        expr("transform(embedding, x -> x / nrm)")))
      .drop("nrm")
  }

  /** Deterministic quantizer-fit sample: a 16-bit md5 threshold on
    * vec_id keeps ~target rows whatever the corpus size (the same
    * reshuffle-proof construction as q_sample_split). The quantizer
    * needs a REPRESENTATIVE sample, not the corpus: fitting k-means on
    * all N vectors makes maxIter+init full passes over — and caches —
    * a corpus-sized input, which is the one part of the IVF build that
    * would have stayed corpus-linear at 100 TB. The threshold filter is
    * applied even when it keeps every row (small corpora), so the
    * fit-input plan shape is scale-independent. */
  private[graft] def ivfFitSample(e: DataFrame, n: Long, target: Long): DataFrame = {
    val threshold =
      if (n <= target) 65536L
      else math.max(1L, (target.toDouble / n * 65536).ceil.toLong)
    e.filter(conv(substring(md5(col("vec_id").cast("string")), 1, 4), 16, 10)
      .cast("long") < threshold)
  }

  /** q_knn_ivf body. `fitTarget` floors the quantizer sample size
    * (actual sample ≈ max(fitTarget, 50·k) vectors — 50 points per
    * centroid is plenty for a COARSE quantizer). */
  private[graft] def ivfKnn(s: SparkSession, d: String, fitTarget: Long = 10000L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import graft.functions.CosineSim.cosine_sim
    val e = ivfFeatures(s, d)
    // one count to size k — a parquet row-group stat read, not a scan
    val n = Tables.load(s, d, "embeddings").count()
    // k ≈ √N keeps both cell size and centroid-scan cost ~√N (a fixed k
    // would leave per-probe work linear in the corpus). nprobe trades
    // recall for scan fraction (nprobe/k of the corpus per probe): this
    // synthetic corpus is near-uniform on the sphere (max pairwise
    // cos ≈ 0.5 — neighbors barely closer than random, IVF's worst
    // case), so recall ≥ 0.6 needs nprobe ≈ 0.4k; clustered real-world
    // embedding corpora reach the same recall at 5-10% of k, which is
    // where the sub-linear win lives.
    val k = math.max(4, math.sqrt(n.toDouble).toInt)
    val nprobe = math.max(3, k * 2 / 5)
    // the fit makes maxIter+init passes over its input, so ONLY the
    // sample is cached — quantizer training cost and cache footprint
    // are sample-sized, never corpus-sized. few iterations + random
    // init: a coarse quantizer needs stable cells, not converged
    // centroids (k-means|| init alone costs more passes than the 5
    // Lloyd iterations); recall is floor-asserted in
    // TwinAndPropertySpec either way.
    // the sample is tiny BY DESIGN (~50 vectors per centroid), so pack
    // it into a few partitions before caching: every k-means iteration
    // is a job over the sample, and at 32+ partitions of near-empty
    // tasks the fit is pure scheduler overhead (measured 2.5× the whole
    // query at sf0.1). ~64k vectors per partition keeps task counts
    // O(sample/64k) at any corpus size.
    val target = math.max(fitTarget, 50L * k)
    val sample = ivfFitSample(e, n, target)
      .coalesce(math.max(1, (target / 65536L).toInt))
      .cache()
    val km = new KMeans().setK(k).setSeed(42).setMaxIter(5).setInitMode("random")
      .setFeaturesCol("features").setPredictionCol("cell")
    val model = km.fit(sample)
    sample.unpersist(false)
    // cell assignment is ONE streaming pass over the corpus (nearest
    // centroid per row against the broadcast k-centroid model)
    val assigned = model.transform(e)
      .select(col("vec_id"), col("embedding"), col("cell"))
    // probes come from a pushed-down point scan (vec_id < 10 reaches
    // the parquet reader), not from the assignment pass
    val probes = Tables.load(s, d, "embeddings").filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    // centroid table is k rows — driver-built, broadcast everywhere
    val centroids = s.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (i, c.toArray.map(_.toFloat))
      }.toIndexedSeq).toDF("cell", "center")
    // nprobe nearest cells per probe: |probes| × k tiny cross product
    val wc = Window.partitionBy("probe_id").orderBy(col("cscore").desc, col("cell"))
    val probeCells = probes.crossJoin(broadcast(centroids))
      .withColumn("cscore", cosine_sim(col("pe"), col("center")))
      .withColumn("crnk", row_number().over(wc))
      .filter(col("crnk") <= nprobe)
      .select(col("probe_id"), col("pe"), col("cell"))
    val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("cand_id"))
    assigned.join(broadcast(probeCells), "cell")
      .filter(col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("vec_id").as("cand_id"),
        Q.r4(cosine_sim(col("pe"), col("embedding"))).as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .orderBy("probe_id", "rnk")
  }

  // codegen'd dot product (r18): bit-identical to the interpreted
  // aggregate∘zip_with fold it replaces (same left-to-right double
  // accumulation — see functions.DotProduct), ~10× cheaper per pair
  private val dot: (String, String) => Column = (x, y) =>
    graft.functions.DotProduct.dot_product(col(x), col(y))

  // ---- Product quantization (ONE home: q_pq_recall + q_knn_ivfpq) ---------

  /** Sub-vector explode: each 64-dim double vector → 4 subspace rows
    * (j ∈ 0..3, sv = dims j·16+1 .. j·16+16). */
  private[graft] def pqSub(e: DataFrame): DataFrame = e
    .select(col("vec_id"), col("de"), explode(expr("sequence(0, 3)")).as("j"))
    .select(col("vec_id"), col("j"), expr("slice(de, j*16 + 1, 16)").as("sv"))

  /** Nearest code per (vector, subspace): argmin ‖x−c‖² as argmax
    * x·c − c·c/2, folds left-to-right like the oracle's
    * list_inner_product, floored to the 1e-6 lattice BEFORE the
    * comparison so the argmax is an integer decision in both engines;
    * ties break to the lowest code id. `carry` names the payload column
    * the winning row keeps through the struct-max — "sv" for the Lloyd
    * update (which re-reads the member sub-vectors), "cv" for the
    * corpus encode (which needs the winning CODEBOOK vector — carrying
    * it here removes the join-back to the codebook that the r17 encode
    * paid, measured ~2 s of the q_knn_ivfpq wall at sf0.1). The carry
    * column sits BELOW (sc6, −code) in the comparison order and (sc6,
    * −code) is unique per group, so the argmax row is identical either
    * way. ‖c‖²/2 is precomputed per CODEBOOK row (cvv — 256 rows,
    * evaluated once in the broadcast build) instead of once per
    * (vector, code) pair: same double, half the per-pair dot work. */
  private[graft] def pqAssign(src: DataFrame, cbk: DataFrame,
                       carry: String = "sv"): DataFrame =
    src.join(broadcast(cbk.withColumn("cvv", dot("cv", "cv") / lit(2.0))), "j")
      .withColumn("sc6",
        floor((dot("sv", "cv") - col("cvv")) * 1e6 + 0.5)
          .cast("long"))
      .groupBy("vec_id", "j")
      // the argmax rides a struct-max AGGREGATE, not a window: the
      // map-side partial combine reduces each group's K candidate rows
      // before the exchange, where a window would shuffle-sort all K×N
      // (measured ~2.5 s slower at K = 64 on the sf0.1 corpus)
      .agg(max(struct(col("sc6"), (-col("code")).as("nc"),
        col("code"), col(carry))).as("m"))
      .select(col("vec_id"), col("j"), col(s"m.$carry").as(carry), col("m.code").as("code"))

  /** Lloyd update: per (subspace, code, dim) the member components
    * fold as exact int64 1e-6-lattice sums (order-free), the mean
    * re-floors once — both engines build the identical centroid. */
  private def pqUpdate(b: DataFrame): DataFrame = b
    .select(col("j"), col("code"), posexplode(col("sv")).as(Seq("p", "x")))
    .groupBy("j", "code", "p")
    .agg(sum(floor(col("x") * 1e6 + 0.5).cast("long")).as("s6"),
      count(lit(1)).as("n"))
    .select(col("j"), col("code"), col("p"),
      (floor(col("s6").cast("double") / col("n") + 0.5).cast("double") / 1e6)
        .as("c"))
    .groupBy("j", "code")
    .agg(expr("transform(array_sort(collect_list(struct(p, c))), z -> z.c)")
      .as("cv"))

  /** The trained (j, code, cv) codebook: two exact Lloyd rounds over a
    * FIXED-size deterministic sample (the classic ~64·K-vector PQ
    * recipe, init = the sub-vectors of vec_id 0..15) — the rounds
    * never scan the corpus, and the tiny training frame packs into one
    * partition so each round is real work, not 32 near-empty tasks. */
  private[graft] def pqCodebook(sub: DataFrame, codes: Int): DataFrame = {
    // 4 partitions, not 1: at 64-entry codebooks the per-row work is
    // 4x the 16-entry case and a single-task Lloyd round was measured
    // at ~2 s/round on the training frame — 4 tasks keep each round
    // parallel while still avoiding 32 near-empty tasks
    val train = sub.filter(col("vec_id") < 1024).coalesce(4)
    val c0 = sub.filter(col("vec_id") < codes)
      .select(col("j"), col("vec_id").as("code"), col("sv").as("cv"))
    // the rounds chain LAZILY (r18): with a FIXED 2-round count the plan
    // depth is bounded (the q_pagerank argument), each round's output is
    // consumed exactly once — as the next round's broadcast build — so
    // nothing is recomputed, and the two eager localCheckpoint jobs the
    // r17 shape paid (~0.5 s each at sf0.1, for 4·codes-row frames)
    // disappear into the single enclosing job's broadcast cascade
    val c1 = pqUpdate(pqAssign(train, c0))
    pqUpdate(pqAssign(train, c1))
  }

  /** The trained codebook COLLECTED to the driver (≤ 4·codes rows — a
    * fitted model exactly like KMeans' clusterCenters, never corpus
    * data): per subspace j, the surviving cv rows in ascending code
    * order plus their precomputed ‖cv‖²/2, folded LEFT-TO-RIGHT like
    * the pqAssign broadcast build's `cvv` column for bit parity. */
  private def pqCodebookLocal(sub: DataFrame, codes: Int)
      : (Seq[Seq[Seq[Double]]], Seq[Seq[Double]]) = {
    // ONE bounded collect, then the two Lloyd rounds run on the DRIVER
    // (r19): the training sample is ≤ 1024 vectors BY CONSTRUCTION
    // (the fixed vec_id cap — corpus-size-independent, ~600 KB), so
    // this is O(1) model fitting on the driver — the KMeans
    // clusterCenters precedent, NOT a corpus collect. The DataFrame
    // round chain it replaces spent ~2 s at sf0.1 in ~10 single-task
    // broadcast-build jobs (the scan is one parquet row group, so the
    // rounds never parallelized anyway — pure scheduling latency).
    // Arithmetic replicated exactly from pqAssign/pqUpdate (same
    // left-to-right dot folds, same 1e-6 lattice floors, same int64
    // member sums, same (sc6, −code) winner); [[pqCodebook]] remains
    // the DataFrame reference implementation and TwinAndPropertySpec
    // pins driver-trained ≡ DataFrame-trained end-to-end on the real
    // corpus for both 16- and 64-entry books.
    val train = sub.filter(col("vec_id") < 1024)
      .select("vec_id", "j", "sv").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def dotLR(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    // c0: the sub-vectors of vec_id < codes, keyed (j, code = vec_id)
    var cb: Seq[((Int, Long), Array[Double])] = train
      .filter(_._1 < codes)
      .map { case (vid, j, sv) => ((j, vid), sv) }
      .sortBy(_._1).toSeq
    for (_ <- 1 to 2) {
      val byJ = cb.groupBy(_._1._1).map { case (j, rows) =>
        j -> rows.map { case ((_, code), cv) => (code, cv, dotLR(cv, cv) / 2.0) }
      }
      // per (j, code): int64 lattice sums of member components + count
      val s6 = scala.collection.mutable.Map.empty[(Int, Long), (Array[Long], Long)]
      train.foreach { case (_, j, sv) =>
        byJ.get(j).foreach { rows =>
          var best = -1L
          var bestSc = Long.MinValue
          rows.foreach { case (code, cv, cvv) =>
            val sc6 = math.floor((dotLR(sv, cv) - cvv) * 1e6 + 0.5).toLong
            if (sc6 > bestSc) { bestSc = sc6; best = code } // ties keep lowest code
          }
          val (sums, n) = s6.getOrElseUpdate((j, best), (new Array[Long](sv.length), 0L))
          var p = 0
          while (p < sv.length) {
            sums(p) += math.floor(sv(p) * 1e6 + 0.5).toLong; p += 1
          }
          s6((j, best)) = (sums, n + 1)
        }
      }
      cb = s6.toSeq.sortBy(_._1).map { case (key, (sums, n)) =>
        key -> sums.map(s => math.floor(s.toDouble / n + 0.5) / 1e6)
      }
    }
    val cvs = (0 to 3).map(j =>
      cb.filter(_._1._1 == j).map(_._2.toIndexedSeq).toIndexedSeq)
    val cvvs = cvs.map(_.map { cv =>
      var acc = 0.0
      var i = 0
      while (i < cv.length) { acc += cv(i) * cv(i); i += 1 }
      acc / 2.0
    })
    (cvs, cvvs)
  }

  /** Corpus-wide PQ reconstruction: `e` plus an in-row `qe` column.
    * r19 (guide §1.2 step 1 / §2.4): the r18 shape still ran the encode
    * as pqSub explode (×4 rows per vector) → broadcast-codebook join →
    * struct-max argmax → groupBy(vec_id) collect — one corpus-sized
    * exchange plus a per-vector collect_list, measured ~1.7-2.2 s of
    * q_knn_ivfpq at sf0.1. The codebook is a trained MODEL of ≤ 4·codes
    * rows, so it collects to the driver (the KMeans clusterCenters
    * precedent) and the whole argmax runs as ONE codegen'd expression
    * per row (functions.PqEncode — arithmetic replicated exactly,
    * TwinAndPropertySpec pins old ≡ new on the real corpus). The
    * codebook TRAINING still reads only the fixed vec_id < 1024 sample;
    * the corpus-sized exchange and the 4× generate disappear. */
  private[graft] def withPqReconstruction(e: DataFrame, codes: Int = 16): DataFrame = {
    val (cvs, cvvs) = pqCodebookLocal(pqSub(e.select("vec_id", "de")), codes)
    e.withColumn("qe",
      graft.functions.PqEncode.pq_encode(col("de"), cvs, cvvs))
  }

  /** (vec_id, qe) view of [[withPqReconstruction]] — the r18 output
    * contract, kept for the equivalence test. */
  private[graft] def pqReconstructed(e: DataFrame, codes: Int = 16): DataFrame =
    withPqReconstruction(e, codes).select("vec_id", "qe")

  /** q_knn_ivfpq's approximate path — the layout a production 100 TB
    * vector store actually deploys: IVF coarse cells bound WHICH
    * candidates are scanned (nprobe cells per probe), PQ codes bound
    * WHAT is scanned per candidate (asymmetric exact-probe ×
    * reconstructed-candidate scores), and a top-64 ADC shortlist is
    * exact-rescored down to the final top-5. Shapes: the quantizer
    * fits on a hash-sample, codebooks/centroids/probe-cells all
    * broadcast, the one corpus-sized exchange is the vec_id join of
    * cell assignment to PQ codes at index build. */
  private[graft] def ivfpqKnn(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import graft.functions.CosineSim.cosine_sim
    val ef = ivfFeatures(s, d)
    val n = Tables.load(s, d, "embeddings").count()
    val k = math.max(4, math.sqrt(n.toDouble).toInt)
    val nprobe = math.max(3, k * 2 / 5)
    val target = math.max(10000L, 50L * k)
    val sample = ivfFitSample(ef, n, target)
      .coalesce(math.max(1, (target / 65536L).toInt))
      .cache()
    val km = new KMeans().setK(k).setSeed(42).setMaxIter(5).setInitMode("random")
      .setFeaturesCol("features").setPredictionCol("cell")
    val model = km.fit(sample)
    sample.unpersist(false)
    val e = widened(Tables.load(s, d, "embeddings")).select("vec_id", "embedding", "de")
    // 64-entry codebooks here (vs q_pq_recall's oracled 16): the
    // search path buys 4 more bits per subspace for ADC rank fidelity
    // on this worst-case near-uniform corpus
    val (cvs, cvvs) = pqCodebookLocal(pqSub(e.select("vec_id", "de")), codes = 64)
    // the PQ encode is now an IN-ROW expression over the raw embedding
    // column model.transform already carries (r19 — see
    // withPqReconstruction): the r18 shape built a separate (vec_id,
    // qe) frame and joined it back here, the one corpus-sized exchange
    // of the index build. That exchange is gone; float input widens
    // per element exactly as the de view did.
    val assigned = model.transform(ef)
      .select(col("vec_id"), col("embedding"), col("cell"))
      .withColumn("qe",
        graft.functions.PqEncode.pq_encode(col("embedding"), cvs, cvvs))
      .withColumn("qnrm", sqrt(dot("qe", "qe")))
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("de").as("pde"))
      .withColumn("pnrm", sqrt(dot("pde", "pde")))
    val centroids = s.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (i, c.toArray.map(_.toFloat))
      }.toIndexedSeq).toDF("cell", "center")
    val wc = Window.partitionBy("probe_id").orderBy(col("cscore").desc, col("cell"))
    val probeCells = probes.crossJoin(broadcast(centroids))
      .withColumn("cscore", cosine_sim(col("pe"), col("center")))
      .withColumn("crnk", row_number().over(wc))
      .filter(col("crnk") <= nprobe)
      .select(col("probe_id"), col("pe"), col("pde"), col("pnrm"), col("cell"))
    // stage 1: ADC shortlist — PQ score only, top-64 per probe
    val wq = Window.partitionBy("probe_id").orderBy(col("pqscore").desc, col("cand_id"))
    val shortlist = assigned.join(broadcast(probeCells), "cell")
      .filter(col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("pe"), col("vec_id").as("cand_id"),
        col("embedding"),
        Q.r4(dot("pde", "qe") / (col("pnrm") * col("qnrm"))).as("pqscore"))
      .withColumn("qrnk", row_number().over(wq))
      .filter(col("qrnk") <= 64)
    // stage 2: exact re-rank of the 20-candidate shortlist → top-5
    val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("cand_id"))
    shortlist
      .select(col("probe_id"), col("cand_id"),
        Q.r4(cosine_sim(col("pe"), col("embedding"))).as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .orderBy("probe_id", "rnk")
  }

  /** Exact cosine top-5 per probe (vec_id < 10) — the ground truth the
    * approximate paths are audited against; same probe set, rounding
    * and (score DESC, cand_id) ranking contract as q_sim_brute. */
  private[graft] def bruteTop5(s: SparkSession, d: String): DataFrame = {
    import graft.functions.CosineSim.cosine_sim
    val e = Tables.load(s, d, "embeddings")
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val cands = e.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
    val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("cand_id"))
    cands.crossJoin(broadcast(probes))
      .filter(col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        Q.r4(cosine_sim(col("pe"), col("ce"))).as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
  }

  /** Aggregate recall@5 audit of an approximate kNN result against
    * [[bruteTop5]]: one row per probe (the probe set is what the
    * DuckDB oracle pins) carrying the corpus-level recall ≥ `floor`
    * verdict — the q_agg_approx_distinct error-band pattern applied to
    * ANN, since neighbor lists themselves are engine-specific. */
  private[graft] def recallAudit(s: SparkSession, d: String,
                                 approx: DataFrame, floor: Double): DataFrame = {
    // the brute-force exact top-5 (|probes| × |corpus| cosine + the
    // per-probe ranking) is the expensive pass and its ~50-row result
    // feeds THREE branches (hits join, denominator, probe list):
    // materialize it once — without this, each branch re-evaluates the
    // ranking above the shuffle (only the exchange itself is reusable)
    val truth = bruteTop5(s, d).select("probe_id", "cand_id")
      .transform(Q.snapshot)
    val hits = truth
      .join(approx.select("probe_id", "cand_id"), Seq("probe_id", "cand_id"))
      .agg(count(lit(1)).as("hits"))
    val ok = hits.crossJoin(broadcast(truth.agg(count(lit(1)).as("n_truth"))))
      .select((col("hits") >= col("n_truth") * floor).as("recall_ok"))
    truth.select("probe_id").distinct()
      .crossJoin(broadcast(ok))
      .orderBy("probe_id")
  }

  /** Shared oracle for the two ANN audits: the probe set + TRUE. */
  private val RecallOracle =
    """SELECT vec_id AS probe_id, TRUE AS recall_ok
      |FROM embeddings
      |WHERE vec_id < 10
      |ORDER BY probe_id""".stripMargin

  /** q_knn_lsh's approximate path: seeded random-projection LSH
    * (spark.ml), Euclidean approxSimilarityJoin, top-5 per probe. */
  private[graft] def lshKnn(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    import org.apache.spark.ml.functions.array_to_vector
    val e = Tables.load(s, d, "embeddings")
      .select(col("vec_id"), array_to_vector(col("embedding")).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(2.0).setNumHashTables(3).setSeed(42)
    val model = lsh.fit(e)
    val probes = e.filter(col("vec_id") < 10)
    val w = Window.partitionBy("probe_id").orderBy(col("dist"), col("cand_id"))
    model.approxSimilarityJoin(probes, e, 10.0, "dist")
      .select(
        col("datasetA.vec_id").as("probe_id"),
        col("datasetB.vec_id").as("cand_id"),
        Q.r6(col("dist")).as("dist"))
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .orderBy("probe_id", "rnk")
  }

  def defs: Seq[QueryDef] = Seq(

    // Brute-force cosine top-5 for 10 probe vectors. The probe side is
    // broadcast; corpus scans stay partition-local.
    Q("q_sim_brute",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings),
        |n AS (SELECT vec_id, de, sqrt(list_inner_product(de, de)) AS nrm FROM e),
        |s AS (SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |             floor((list_inner_product(p.de, c.de) / (p.nrm * c.nrm))*10000+0.5)/10000 AS score
        |      FROM n p JOIN n c ON p.vec_id < 10 AND p.vec_id <> c.vec_id)
        |SELECT probe_id, cand_id, score, rnk
        |FROM (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, cand_id) AS rnk
        |      FROM s)
        |WHERE rnk <= 5
        |ORDER BY probe_id, rnk""".stripMargin) { (s, d) =>
      val e = widened(Tables.load(s, d, "embeddings"))
        .withColumn("nrm", sqrt(dot("de", "de")))
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("de").as("pde"), col("nrm").as("pnrm"))
      val cands = e.select(col("vec_id").as("cand_id"), col("de").as("cde"), col("nrm").as("cnrm"))
      val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("cand_id"))
      cands.crossJoin(broadcast(probes))
        .filter(col("probe_id") =!= col("cand_id"))
        .select(col("probe_id"), col("cand_id"),
          Q.r4(dot("pde", "cde") / (col("pnrm") * col("cnrm"))).as("score"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .orderBy("probe_id", "rnk")
    },

    // Nearest-neighbor margin audit (round 15): per probe, the gap
    // between its top-1 and top-2 cosine scores — Lowe's ratio test
    // ((1−s1)/(1−s2), LOW = confident) plus the absolute margin and
    // whether the top-1 neighbor's LABEL agrees with the probe's —
    // the calibration readout that decides where q_dedup_embed's
    // threshold and q_knn_lsh's shortlists can be trusted (a match
    // with ratio ≈ 1 is a coin flip regardless of its score). Scores
    // round to the r4 lattice BEFORE ranking (round-before-top-k), so
    // margins and ratios are lattice-exact in both engines. Shape:
    // the q_sim_brute probe-bounded audit (50 broadcast probes
    // against the catalog — brute by design; the scale path stays
    // LSH/IVF, this op CALIBRATES them on a bounded sample).
    Q("q_knn_margin",
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS de FROM embeddings),
        |n AS (SELECT vec_id, label, de, sqrt(list_inner_product(de, de)) AS nrm FROM e),
        |s AS (SELECT p.vec_id AS probe_id, p.label AS plabel,
        |             c.vec_id AS cand_id, c.label AS clabel,
        |             floor((list_inner_product(p.de, c.de) / (p.nrm * c.nrm))*10000+0.5)/10000 AS score
        |      FROM n p JOIN n c ON p.vec_id < 50 AND p.vec_id <> c.vec_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, cand_id) AS rnk
        |      FROM s),
        |p2 AS (SELECT probe_id,
        |              max(CASE WHEN rnk = 1 THEN cand_id END) AS top1_id,
        |              max(CASE WHEN rnk = 1 THEN score END) AS s1,
        |              max(CASE WHEN rnk = 2 THEN score END) AS s2,
        |              max(CASE WHEN rnk = 1 AND clabel = plabel THEN 1 ELSE 0 END) AS label_match
        |       FROM r WHERE rnk <= 2 GROUP BY 1)
        |SELECT probe_id, top1_id, s1, s2,
        |       floor((s1 - s2)*1000000+0.5)/1000000 AS margin,
        |       CASE WHEN s2 < 1 THEN floor(((1 - s1) / (1 - s2))*1000000+0.5)/1000000 END AS lowe_ratio,
        |       CAST(label_match AS BIGINT) AS label_match
        |FROM p2
        |ORDER BY probe_id""".stripMargin) { (s, d) =>
      val e = widened(Tables.load(s, d, "embeddings"))
        .withColumn("nrm", sqrt(dot("de", "de")))
      val probes = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("probe_id"), col("label").as("plabel"),
          col("de").as("pde"), col("nrm").as("pnrm"))
      val cands = e.select(col("vec_id").as("cand_id"), col("label").as("clabel"),
        col("de").as("cde"), col("nrm").as("cnrm"))
      val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("cand_id"))
      cands.crossJoin(broadcast(probes))
        .filter(col("probe_id") =!= col("cand_id"))
        .select(col("probe_id"), col("plabel"), col("cand_id"), col("clabel"),
          Q.r4(dot("pde", "cde") / (col("pnrm") * col("cnrm"))).as("score"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 2)
        .groupBy("probe_id")
        .agg(max(when(col("rnk") === 1, col("cand_id"))).as("top1_id"),
          max(when(col("rnk") === 1, col("score"))).as("s1"),
          max(when(col("rnk") === 2, col("score"))).as("s2"),
          max(when(col("rnk") === 1 && col("clabel") === col("plabel"), 1L)
            .otherwise(0L)).as("label_match"))
        .select(col("probe_id"), col("top1_id"), col("s1"), col("s2"),
          Q.r6(col("s1") - col("s2")).as("margin"),
          when(col("s2") < 1,
            Q.r6((lit(1) - col("s1")) / (lit(1) - col("s2")))).as("lowe_ratio"),
          col("label_match"))
        .orderBy("probe_id")
    },

    // Same query as q_sim_brute, computed by the native codegen'd
    // CosineSim expression (one fused loop, no intermediate arrays)
    // instead of higher-order functions. Value-identical per-element
    // arithmetic → shares the oracle formulation.
    Q("q_sim_expr",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings),
        |n AS (SELECT vec_id, de, sqrt(list_inner_product(de, de)) AS nrm FROM e),
        |s AS (SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |             floor((list_inner_product(p.de, c.de) / (p.nrm * c.nrm))*10000+0.5)/10000 AS score
        |      FROM n p JOIN n c ON p.vec_id < 10 AND p.vec_id <> c.vec_id)
        |SELECT probe_id, cand_id, score, rnk
        |FROM (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, cand_id) AS rnk
        |      FROM s)
        |WHERE rnk <= 5
        |ORDER BY probe_id, rnk""".stripMargin) { (s, d) =>
      import graft.functions.CosineSim.cosine_sim
      val e = Tables.load(s, d, "embeddings")
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      val cands = e.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
      val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("cand_id"))
      cands.crossJoin(broadcast(probes))
        .filter(col("probe_id") =!= col("cand_id"))
        .select(col("probe_id"), col("cand_id"),
          Q.r4(cosine_sim(col("pe"), col("ce"))).as("score"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .orderBy("probe_id", "rnk")
    },

    // Embedding near-dup: candidates blocked by a banded sign sketch
    // (EmbedBands × EmbedBandBits, OR-ed minhash-style — see layout doc
    // above), then verified with exact cosine. Every join runs on a
    // band-bucket key — ~|bucket|² per bucket, never |corpus|² — and
    // both the Spark columns and the oracle SQL are generated from the
    // same (bands, width) layout.
    Q("q_dedup_embed",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de,
        |${(0 until EmbedBands).map(g => s"                  ${embedBandSql(g)} AS b$g").mkString(",\n")}
        |           FROM embeddings),
        |n AS (SELECT vec_id, de, ${(0 until EmbedBands).map("b" + _).mkString(", ")},
        |             sqrt(list_inner_product(de, de)) AS nrm FROM e),
        |bands AS (SELECT vec_id, t.band,
        |                 ${(0 until EmbedBands).map {
             case g if g < EmbedBands - 1 => s"WHEN $g THEN b$g"
             case g => s"ELSE b$g"
           }.mkString("CASE t.band ", " ", " END")} AS bv
        |          FROM n, (SELECT unnest(range(0, $EmbedBands)) AS band) t),
        |cand AS (SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.bv = b.bv AND a.vec_id < b.vec_id)
        |SELECT c.v1, c.v2,
        |       floor((list_inner_product(x.de, y.de) / (x.nrm * y.nrm))*10000+0.5)/10000 AS score
        |FROM cand c JOIN n x ON x.vec_id = c.v1 JOIN n y ON y.vec_id = c.v2
        |WHERE list_inner_product(x.de, y.de) / (x.nrm * y.nrm) >= 0.35
        |ORDER BY v1, v2""".stripMargin) { (s, d) =>
      import graft.functions.CosineSim.cosine_sim
      val e = Tables.load(s, d, "embeddings")
      val bandStructs = (0 until EmbedBands).map { g =>
        struct(lit(g).as("band"), embedBandVal(g).as("bv"))
      }
      val bands = e.select(col("vec_id"), explode(array(bandStructs: _*)).as("bs"))
        .select(col("vec_id"), col("bs.band").as("band"), col("bs.bv").as("bv"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
        .distinct()
      // native fused-loop expression; value-identical to the HOF + norm
      // formulation (same per-element widening and accumulation order)
      val cos = cosine_sim(col("d1"), col("d2"))
      cand
        .join(e.select(col("vec_id").as("v1"), col("embedding").as("d1")), "v1")
        .join(e.select(col("vec_id").as("v2"), col("embedding").as("d2")), "v2")
        .filter(cos >= 0.35)
        .select(col("v1"), col("v2"), Q.r4(cos).as("score"))
        .orderBy("v1", "v2")
    },

    // kNN-graph reciprocity (round 14) — the embedding-quality
    // diagnostic that needs the GRAPH, not just neighbor lists: over
    // the banded sign-sketch candidate pairs (the q_dedup_embed
    // blocking — never all-pairs), each vector's top-5 candidates by
    // rounded cosine form a directed kNN graph; the fraction of edges
    // that are MUTUAL (u ∈ knn(v) ∧ v ∈ knn(u)) separates genuine
    // neighborhood structure from hubness (a hub is many vectors'
    // neighbor but reciprocates almost none), and the same-label edge
    // share reads out cluster coherence per label. Determinism: scores
    // hit the 1e-6 lattice BEFORE ranking (identical doubles both
    // engines; ties break on cand id), so the edge SET is
    // oracle-exact. Shape: bucket-keyed candidate join, per-node top-5
    // via the bounded-buffer TopKAgg (map-side partials, ≤5 rows per
    // node per partition — no per-node window sort), the edge frame
    // snapshot once for its three consumers (mutual self-join two
    // sides + the label rollup), id-keyed label joins, |labels|-row
    // output.
    Q("q_knn_reciprocity",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de,
        |${(0 until EmbedBands).map(g => s"                  ${embedBandSql(g)} AS b$g").mkString(",\n")}
        |           FROM embeddings),
        |n AS (SELECT vec_id, de, ${(0 until EmbedBands).map("b" + _).mkString(", ")},
        |             sqrt(list_inner_product(de, de)) AS nrm FROM e),
        |bands AS (SELECT vec_id, t.band,
        |                 ${(0 until EmbedBands).map {
             case g if g < EmbedBands - 1 => s"WHEN $g THEN b$g"
             case g => s"ELSE b$g"
           }.mkString("CASE t.band ", " ", " END")} AS bv
        |          FROM n, (SELECT unnest(range(0, $EmbedBands)) AS band) t),
        |cand AS (SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.bv = b.bv AND a.vec_id < b.vec_id),
        |sc AS (SELECT c.v1, c.v2,
        |              floor((list_inner_product(x.de, y.de) / (x.nrm * y.nrm))*1000000+0.5)/1000000 AS score
        |       FROM cand c JOIN n x ON x.vec_id = c.v1 JOIN n y ON y.vec_id = c.v2),
        |dir AS (SELECT v1 AS src, v2 AS dst, score FROM sc
        |        UNION ALL
        |        SELECT v2, v1, score FROM sc),
        |ed AS (SELECT src, dst FROM (
        |         SELECT src, dst,
        |                row_number() OVER (PARTITION BY src ORDER BY score DESC, dst) AS rk
        |         FROM dir) WHERE rk <= 5),
        |mu AS (SELECT a.src, a.dst FROM ed a JOIN ed b ON a.src = b.dst AND a.dst = b.src)
        |SELECT ls.label AS label,
        |       CAST(count(DISTINCT ed.src) AS BIGINT) AS n_nodes,
        |       CAST(count(*) AS BIGINT) AS n_edges,
        |       CAST(count(mu.src) AS BIGINT) AS n_mutual,
        |       ${Q.sqlR6("CAST(count(mu.src) AS DOUBLE) / count(*)")} AS reciprocity,
        |       ${Q.sqlR6("CAST(sum(CASE WHEN ls.label = ld.label THEN 1 ELSE 0 END) AS DOUBLE) / count(*)")} AS intra_label
        |FROM ed
        |JOIN embeddings ls ON ed.src = ls.vec_id
        |JOIN embeddings ld ON ed.dst = ld.vec_id
        |LEFT JOIN mu ON ed.src = mu.src AND ed.dst = mu.dst
        |GROUP BY 1
        |ORDER BY 1""".stripMargin) { (s, d) =>
      import graft.functions.CosineSim.cosine_sim
      val e = Tables.load(s, d, "embeddings")
      val bandStructs = (0 until EmbedBands).map { g =>
        struct(lit(g).as("band"), embedBandVal(g).as("bv"))
      }
      val bands = e.select(col("vec_id"), explode(array(bandStructs: _*)).as("bs"))
        .select(col("vec_id"), col("bs.band").as("band"), col("bs.bv").as("bv"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
        .distinct()
      val sc = cand
        .join(e.select(col("vec_id").as("v1"), col("embedding").as("e1")), "v1")
        .join(e.select(col("vec_id").as("v2"), col("embedding").as("e2")), "v2")
        .select(col("v1"), col("v2"),
          Q.r6(cosine_sim(col("e1"), col("e2"))).as("score"))
      val dir = sc.select(col("v1").as("src"), col("v2").as("dst"), col("score"))
        .unionAll(sc.select(col("v2").as("src"), col("v1").as("dst"), col("score")))
      val topk = udaf(new graft.functions.TopKAgg(5),
        Encoders.product[graft.functions.Scored])
      val edges = dir.groupBy("src")
        .agg(topk(col("score"), col("dst")).as("top"))
        .select(col("src"), explode(col("top")).as("t"))
        .select(col("src"), col("t.id").as("dst"))
        .transform(Q.snapshot) // three consumers: mutual ×2 + the rollup
      val mu = edges.as("m1").join(edges.as("m2"),
          col("m1.src") === col("m2.dst") && col("m1.dst") === col("m2.src"))
        .select(col("m1.src").as("src"), col("m1.dst").as("dst"), lit(1L).as("mut"))
      val lab = e.select(col("vec_id"), col("label"))
      edges
        .join(lab.select(col("vec_id").as("src"), col("label").as("ls")), "src")
        .join(lab.select(col("vec_id").as("dst"), col("label").as("ld")), "dst")
        .join(mu, Seq("src", "dst"), "left")
        .groupBy(col("ls").as("label"))
        .agg(countDistinct("src").as("n_nodes"), count(lit(1)).as("n_edges"),
          sum(coalesce(col("mut"), lit(0L))).as("n_mutual"),
          Q.r6(sum(coalesce(col("mut"), lit(0L))).cast("double") / count(lit(1)))
            .as("reciprocity"),
          Q.r6(sum(when(col("ls") === col("ld"), 1L).otherwise(0L)).cast("double") /
            count(lit(1))).as("intra_label"))
        .orderBy("label")
    },

    // Candidate-recall curve (round 14) — the tuning readout for the
    // sign-sketch blocking itself: recall@k (k ∈ {1, 5, 10}) of the
    // banded candidates against exact brute-force truth over the 10
    // probe vectors. Unlike q_knn_lsh/q_knn_ivf (engine-specific hash
    // families ⇒ recall-BAND oracles), every piece here is
    // deterministic in both engines — md5-free sign bands, cosine on
    // the 1e-6 lattice before ranking, id tie-breaks — so the curve
    // itself is hash-compared, not just floored. This is the number
    // that decides band width W and band count B before anyone runs
    // the full dedup (the q_lsh_tuning question asked of the EMBEDDING
    // blocking). Shape: truth is probe-bounded (|probes|×|corpus|,
    // probes broadcast — the q_sim_brute contract); the approximate
    // side ranks only the probes' bucket-bounded candidates; both
    // windows partition by probe (10 keys, bounded rows); the k grid
    // is an in-row 3-literal explode.
    Q("q_knn_recall_curve",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de,
        |${(0 until EmbedBands).map(g => s"                  ${embedBandSql(g)} AS b$g").mkString(",\n")}
        |           FROM embeddings),
        |n AS (SELECT vec_id, de, ${(0 until EmbedBands).map("b" + _).mkString(", ")},
        |             sqrt(list_inner_product(de, de)) AS nrm FROM e),
        |bands AS (SELECT vec_id, t.band,
        |                 ${(0 until EmbedBands).map {
             case g if g < EmbedBands - 1 => s"WHEN $g THEN b$g"
             case g => s"ELSE b$g"
           }.mkString("CASE t.band ", " ", " END")} AS bv
        |          FROM n, (SELECT unnest(range(0, $EmbedBands)) AS band) t),
        |sc0 AS (SELECT p.vec_id AS p, c.vec_id AS c,
        |               floor((list_inner_product(p.de, c.de) / (p.nrm * c.nrm))*1000000+0.5)/1000000 AS score
        |        FROM n p JOIN n c ON p.vec_id < 10 AND p.vec_id <> c.vec_id),
        |truth AS (SELECT p, c, rk FROM (
        |            SELECT p, c, row_number() OVER (PARTITION BY p ORDER BY score DESC, c) AS rk
        |            FROM sc0) WHERE rk <= 10),
        |cand AS (SELECT DISTINCT a.vec_id AS p, b.vec_id AS c
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.bv = b.bv
        |          AND a.vec_id < 10 AND a.vec_id <> b.vec_id),
        |appr AS (SELECT p, c, rk FROM (
        |            SELECT s.p, s.c,
        |                   row_number() OVER (PARTITION BY s.p ORDER BY s.score DESC, s.c) AS rk
        |            FROM sc0 s JOIN cand ON s.p = cand.p AND s.c = cand.c) WHERE rk <= 10),
        |ks AS (SELECT unnest([1, 5, 10]) AS k),
        |j AS (SELECT ks.k AS k,
        |             CAST(count(*) AS BIGINT) AS n_truth,
        |             CAST(sum(CASE WHEN ap.rk IS NOT NULL AND ap.rk <= ks.k
        |                           THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
        |      FROM ks JOIN truth t ON t.rk <= ks.k
        |      LEFT JOIN appr ap ON ap.p = t.p AND ap.c = t.c
        |      GROUP BY 1)
        |SELECT CAST(k AS BIGINT) AS k, n_truth, n_hit,
        |       ${Q.sqlR6("CAST(n_hit AS DOUBLE) / n_truth")} AS recall
        |FROM j
        |ORDER BY k""".stripMargin) { (s, d) =>
      import graft.functions.CosineSim.cosine_sim
      val e = Tables.load(s, d, "embeddings")
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("p"), col("embedding").as("pe"))
      val cands = e.select(col("vec_id").as("c"), col("embedding").as("ce"))
      val w = Window.partitionBy("p").orderBy(col("score").desc, col("c"))
      val truth = cands.crossJoin(broadcast(probes))
        .filter(col("p") =!= col("c"))
        .select(col("p"), col("c"), Q.r6(cosine_sim(col("pe"), col("ce"))).as("score"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select("p", "c", "rk")
      val bandStructs = (0 until EmbedBands).map { g =>
        struct(lit(g).as("band"), embedBandVal(g).as("bv"))
      }
      val bands = e.select(col("vec_id"), explode(array(bandStructs: _*)).as("bs"))
        .select(col("vec_id"), col("bs.band").as("band"), col("bs.bv").as("bv"))
      val candPairs = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.vec_id") < 10 && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("p"), col("b.vec_id").as("c"))
        .distinct()
      val appr = candPairs
        .join(broadcast(probes), "p")
        .join(cands, "c")
        .select(col("p"), col("c"), Q.r6(cosine_sim(col("pe"), col("ce"))).as("score"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("p"), col("c"), col("rk").as("ark"))
      truth
        .select(col("p"), col("c"), col("rk"),
          explode(array(lit(1), lit(5), lit(10))).as("k"))
        .filter(col("rk") <= col("k"))
        .join(appr, Seq("p", "c"), "left")
        .groupBy("k")
        .agg(count(lit(1)).as("n_truth"),
          sum(when(col("ark").isNotNull && col("ark") <= col("k"), 1L).otherwise(0L))
            .as("n_hit"))
        .select(col("k").cast("long").as("k"), col("n_truth"), col("n_hit"),
          Q.r6(col("n_hit").cast("double") / col("n_truth")).as("recall"))
        .orderBy("k")
    },

    // Approximate kNN via random-projection LSH (spark.ml) — the scale
    // path when bucketed exact cosine is still too wide. The hash
    // family is engine-specific, so neighbor lists can't hash-match a
    // DuckDB oracle; the driver-checked form (r11) is the RECALL-BAND
    // audit: the LSH top-5 and the exact brute-force top-5 run in one
    // plan, and the output carries the probe set plus the corpus-level
    // recall@5 ≥ 0.6 verdict the oracle pins as TRUE (the floor
    // TwinAndPropertySpec has asserted since the op landed). Raw
    // neighbor lists stay available via lshKnn for tests/tuning.
    Q("q_knn_lsh", RecallOracle) { (s, d) =>
      recallAudit(s, d, lshKnn(s, d), floor = 0.6)
    },

    // IVF (inverted-file) approximate kNN — the second scale path next
    // to random-projection LSH: a seeded k-means coarse quantizer
    // assigns every vector to a cell; each probe searches only its
    // nprobe nearest cells with exact cosine. Per-probe work is
    // nprobe·|corpus|/k instead of |corpus|; k grows ~√N (with a floor)
    // so per-cell size AND cell count both scale sub-linearly — a fixed
    // k would leave per-probe work linear in the corpus. The quantizer
    // fits on a deterministic hash-SAMPLE (see ivfKnn/ivfFitSample), so
    // no step of the build caches or re-scans the full corpus. k-means
    // cells are engine-specific, so (r11) the driver-checked form is
    // the same recall-band audit as q_knn_lsh: IVF top-5 vs exact
    // brute-force top-5 in one plan, recall@5 ≥ 0.6 pinned TRUE by the
    // oracle. Raw neighbor lists stay available via ivfKnn.
    Q("q_knn_ivf", RecallOracle) { (s, d) =>
      recallAudit(s, d, ivfKnn(s, d), floor = 0.6)
    },

    // IVF + PQ combined search (round 18): the layout a production
    // 100 TB vector store actually deploys — IVF cells bound WHICH
    // candidates are scanned, PQ codes bound the BYTES per candidate
    // (3 bytes/vector at 4x64 codes), an ADC top-64 shortlist is
    // exact-rescored to the final top-5. Audited in the recall-band
    // form against the brute-force exact top-5 (floor 0.5 on this
    // worst-case near-uniform sphere corpus; clustered real-world
    // embeddings sit far above it) — oracle pins the probe set + TRUE.
    Q("q_knn_ivfpq", RecallOracle) { (s, d) =>
      recallAudit(s, d, ivfpqKnn(s, d), floor = 0.5)
    },

    // Multimodal record: text metadata ⋈ embedding into a nested struct
    // (doc + emb), then scalar projections for the oracle (struct literal
    // parity across engines is fragile; the array IS carried through the
    // join and reduced to a norm).
    Q("q_multimodal",
      """SELECT d.doc_id, d.lang, d.n_chars, e.label,
        |       floor((sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))))*10000+0.5)/10000 AS emb_norm,
        |       substring(d.text, 1, 20) AS head20
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |WHERE d.lang IN ('en', 'de') AND e.label < 5
        |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      val emb = widened(Tables.load(s, d, "embeddings"))
      val rec = docs.join(emb, col("doc_id") === col("vec_id"))
        .select(struct(
          struct(col("doc_id"), col("text"), col("lang"), col("n_chars")).as("doc"),
          struct(col("vec_id"), col("de"), col("label")).as("emb")).as("r"))
      rec
        .filter(col("r.doc.lang").isin("en", "de") && col("r.emb.label") < 5)
        .select(
          col("r.doc.doc_id").as("doc_id"),
          col("r.doc.lang").as("lang"),
          col("r.doc.n_chars").as("n_chars"),
          col("r.emb.label").as("label"),
          // native dot_product expression (r19): same bit-identical
          // left-to-right double fold as the HOF form it replaces
          // (ExpressionSpec pins parity), but codegen'd
          Q.r4(sqrt(graft.functions.DotProduct.dot_product(
            col("r.emb.de"), col("r.emb.de"))))
            .as("emb_norm"),
          substring(col("r.doc.text"), 1, 20).as("head20"))
        .orderBy("doc_id")
    },

    // Per-label embedding centroids in long format (label, dim, mean) —
    // the building block for IVF coarse quantizers, class prototypes and
    // drift monitoring. posexplode fans each vector into 64 (dim, value)
    // rows IN-ROW (codegen'd generator, no join); the only shuffle is
    // the (label, dim) agg, whose key count is #labels × dim — tiny and
    // FIXED, so the map-side partial average (sum+count per key per
    // partition) reduces the shuffle to #keys rows per partition no
    // matter the corpus size. Long format sidesteps engine-specific
    // array re-assembly ordering; r6 absorbs float summation-order ulps.
    Q("q_centroid",
      """WITH x AS (SELECT label,
        |                  unnest(list_transform(range(1, len(embedding) + 1),
        |                         i -> {'dim': i - 1, 'v': CAST(embedding[i] AS DOUBLE)})) AS s
        |           FROM embeddings)
        |SELECT label, CAST(s.dim AS BIGINT) AS dim,
        |       floor((avg(s.v))*1000000+0.5)/1000000 AS c,
        |       count(*) AS n
        |FROM x GROUP BY 1, 2
        |ORDER BY label, dim""".stripMargin) { (s, d) =>
      widened(Tables.load(s, d, "embeddings"))
        .select(col("label"), posexplode(col("de")).as(Seq("dim", "v")))
        .groupBy("label", "dim")
        .agg(Q.r6(avg(col("v"))).as("c"), count(lit(1)).as("n"))
        .select(col("label"), col("dim").cast("long").as("dim"), col("c"), col("n"))
        .orderBy("label", "dim")
    },

    // Int8 symmetric quantization (max-abs per vector): scale =
    // 127/max|x|, q_i = round(x·scale) ∈ [−127, 127] — 4× storage/IO
    // compression for the 100 TB ANN index build (int8 dot products are
    // the production similarity path; the scale column inverts them
    // back). Pure in-row HOF arithmetic — zero shuffle, embarrassingly
    // parallel. The identical double expressions run on both engines
    // (qsum is an exact integer; scale/max_err are r6-rounded), so the
    // quantized values themselves are oracle-checked, not just counts.
    Q("q_quantize_embed",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings),
        |m AS (SELECT vec_id, de, list_max(list_transform(de, x -> abs(x))) AS mx FROM e),
        |q AS (SELECT vec_id, de, 127.0 / mx AS scale,
        |             list_transform(de, x -> floor(x * (127.0 / mx) + 0.5)) AS qv
        |      FROM m WHERE mx > 0)
        |SELECT vec_id,
        |       floor(scale*1000000+0.5)/1000000 AS scale,
        |       CAST(list_sum(qv) AS BIGINT) AS qsum,
        |       floor((list_max(list_transform(range(1, len(de) + 1),
        |                       i -> abs(de[i] - qv[i] / scale))))*1000000+0.5)/1000000 AS max_err
        |FROM q
        |ORDER BY vec_id""".stripMargin) { (s, d) =>
      widened(Tables.load(s, d, "embeddings"))
        .withColumn("mx", array_max(expr("transform(de, x -> abs(x))")))
        .filter(col("mx") > 0)
        .withColumn("scale", lit(127.0) / col("mx"))
        .withColumn("qv", expr("transform(de, x -> floor(x * scale + 0.5))"))
        .select(
          col("vec_id"),
          Q.r6(col("scale")).as("scale"),
          expr("aggregate(qv, CAST(0 AS BIGINT), (acc, v) -> acc + v)").as("qsum"),
          Q.r6(expr("array_max(zip_with(de, qv, (x, v) -> abs(x - v / scale)))")).as("max_err"))
        .orderBy("vec_id")
    },

    // Embedding drift between corpus halves (round 11): per label, the
    // cosine and L2 distance between the centroid of the even-vec_id
    // half and the odd half — the production check that a re-embedded
    // or re-sampled corpus still occupies the same region per class
    // (the numeric-feature PSI/TVD monitors can't see vector space).
    // Parity: each per-(label, half, dim) centroid component is
    // r6-ROUNDED first — both engines then multiply identical doubles,
    // and the cross-dim sums run over ≤|dims| identical terms (order
    // noise ≤ dims·ulp, invisible at the final r6 — the q_centroid
    // precedent). Scale: ONE corpus scan onto a (|labels|·2·|dims|)-key
    // map-side-partial agg; everything after lives on the
    // catalog-sized centroid frame.
    Q("q_centroid_shift",
      """WITH x AS (SELECT label, vec_id % 2 AS h,
        |                  unnest(list_transform(range(1, len(embedding) + 1),
        |                         i -> {'dim': i - 1, 'v': CAST(embedding[i] AS DOUBLE)})) AS s
        |           FROM embeddings),
        |c AS (SELECT label, h, s.dim AS dim,
        |             floor((avg(s.v))*1000000+0.5)/1000000 AS c,
        |             count(*) AS cn
        |      FROM x GROUP BY 1, 2, 3),
        |ce AS (SELECT label, dim, c FROM c WHERE h = 0),
        |co AS (SELECT label, dim, c FROM c WHERE h = 1),
        |j AS (SELECT ce.label,
        |             sum(ce.c * co.c) AS dot, sum(ce.c * ce.c) AS ne,
        |             sum(co.c * co.c) AS no,
        |             sum((ce.c - co.c) * (ce.c - co.c)) AS dd
        |      FROM ce JOIN co ON ce.label = co.label AND ce.dim = co.dim
        |      GROUP BY 1),
        |n AS (SELECT label,
        |             CAST(sum(CASE WHEN h = 0 THEN cn ELSE 0 END) AS BIGINT) AS n_even,
        |             CAST(sum(CASE WHEN h = 1 THEN cn ELSE 0 END) AS BIGINT) AS n_odd
        |      FROM c WHERE dim = 0 GROUP BY 1)
        |SELECT j.label AS label, n.n_even, n.n_odd,
        |       floor((dot / (sqrt(ne) * sqrt(no)))*1000000+0.5)/1000000 AS cosine_shift,
        |       floor((sqrt(dd))*1000000+0.5)/1000000 AS l2_shift
        |FROM j JOIN n ON j.label = n.label
        |ORDER BY 1""".stripMargin) { (s, d) =>
      val e = Tables.load(s, d, "embeddings")
      // the catalog-sized centroid frame materializes ONCE and carries
      // its half counts (cn is dim-invariant — read off dim 0): the
      // even/odd/count branches all read the checkpointed frame, so the
      // operator is a single embeddings scan at any corpus size (the
      // eager-materialization job costs ~0.3 s fixed at toy scale and
      // replaces per-branch corpus re-scans — the q_source_overlap
      // trade)
      val c = widened(e)
        .select(col("label"), (col("vec_id") % 2).as("h"),
          posexplode(col("de")).as(Seq("dim", "v")))
        .groupBy("label", "h", "dim")
        .agg(Q.r6(avg(col("v"))).as("c"), count(lit(1)).as("cn"))
        .transform(Q.snapshot)
      val ce = c.filter(col("h") === 0).select(col("label"), col("dim"), col("c").as("c0"))
      val co = c.filter(col("h") === 1).select(col("label"), col("dim"), col("c").as("c1"))
      val j = ce.join(co, Seq("label", "dim"))
        .groupBy("label")
        .agg(sum(col("c0") * col("c1")).as("dot"),
          sum(col("c0") * col("c0")).as("ne"),
          sum(col("c1") * col("c1")).as("no"),
          sum((col("c0") - col("c1")) * (col("c0") - col("c1"))).as("dd"))
      val n = c.filter(col("dim") === 0).groupBy("label")
        .agg(sum(when(col("h") === 0, col("cn")).otherwise(0L)).cast("long").as("n_even"),
          sum(when(col("h") === 1, col("cn")).otherwise(0L)).cast("long").as("n_odd"))
      j.join(n, "label")
        .select(col("label"), col("n_even"), col("n_odd"),
          Q.r6(col("dot") / (sqrt(col("ne")) * sqrt(col("no")))).as("cosine_shift"),
          Q.r6(sqrt(col("dd"))).as("l2_shift"))
        .orderBy("label")
    },

    // Embedding outlier screen (round 13): the 10 vectors LEAST
    // cosine-aligned with their own label's centroid — mislabeled or
    // encoder-corrupted rows, the per-row complement of q_embed_norms'
    // aggregate QA and q_centroid_shift's drift check. The centroid
    // values are r6-ROUNDED before the comparison pass (the
    // q_centroid_shift precedent: rounding the shared operand is what
    // makes the cross-engine dot products agree), the (label, dim)
    // centroid frame is tiny and broadcasts against the corpus-sized
    // exploded vectors, the per-vector agg collapses 64 rows that
    // never leave their input partition, and the global bottom-10 is a
    // TakeOrdered — the corpus is scanned once and never sorted.
    // Selection uses the ROUNDED cosine with the vec_id tie-break, so
    // the top-10 boundary is ulp-proof.
    Q("q_embed_outliers",
      """WITH x AS (SELECT vec_id, label,
        |                  unnest(list_transform(range(1, len(embedding) + 1),
        |                         i -> {'dim': i - 1, 'v': CAST(embedding[i] AS DOUBLE)})) AS s
        |           FROM embeddings),
        |c AS (SELECT label, s.dim AS dim,
        |             floor((avg(s.v))*1000000+0.5)/1000000 AS c
        |      FROM x GROUP BY 1, 2),
        |j AS (SELECT x.vec_id, x.label,
        |             sum(x.s.v * c.c) AS dot, sum(x.s.v * x.s.v) AS nv,
        |             sum(c.c * c.c) AS nc
        |      FROM x JOIN c ON x.label = c.label AND x.s.dim = c.dim
        |      GROUP BY 1, 2)
        |SELECT vec_id, label,
        |       floor((dot / (sqrt(nv) * sqrt(nc)))*1000000+0.5)/1000000 AS cos_centroid
        |FROM j
        |ORDER BY cos_centroid, vec_id
        |LIMIT 10""".stripMargin) { (s, d) =>
      val x = widened(Tables.load(s, d, "embeddings"))
        .select(col("vec_id"), col("label"), posexplode(col("de")).as(Seq("dim", "v")))
      val c = x.groupBy("label", "dim").agg(Q.r6(avg(col("v"))).as("c"))
      x.join(c, Seq("label", "dim"))
        .groupBy("vec_id", "label")
        .agg(sum(col("v") * col("c")).as("dot"),
          sum(col("v") * col("v")).as("nv"),
          sum(col("c") * col("c")).as("nc"))
        .select(col("vec_id"), col("label"),
          Q.r6(col("dot") / (sqrt(col("nv")) * sqrt(col("nc")))).as("cos_centroid"))
        .orderBy(col("cos_centroid"), col("vec_id"))
        .limit(10)
    },

    // Effective dimensionality of the embedding corpus (round 15):
    // the participation ratio PR = (Σλ)²/Σλ² of the covariance
    // spectrum — "how many directions actually carry variance" (64 =
    // isotropic, ~1 = collapsed), the encoder-health readout beside
    // q_embed_norms/q_pca_power. NO eigendecomposition: Σλ = tr(C)
    // and Σλ² = ‖C‖²_F come straight from covariance entries, and
    // every cross-row reduction is EXACT — coordinates quantize to
    // the 1e-3 lattice (the q_embed_norms move), so the (j,k) product
    // sums and marginals are int64 to the bit; M_jk = n·Σxⱼxₖ −
    // Σxⱼ·Σxₖ = n²·cov stays integer, the trace is a 64-term int64
    // sum, and the 2080 Frobenius terms floor onto the unit lattice
    // before their bounded-frame sum. Shape: per-row in-row expansion
    // of the 2080 upper-triangle products (n·d² work — linear in n,
    // map-side partials onto the 2080-key grid), one 64-row broadcast
    // join; PR is scale-invariant so the lattice factor divides out.
    Q("q_embed_dim",
      s"""WITH e AS (SELECT vec_id,
         |                  list_transform(embedding, v -> CAST(floor(v * 1000 + 0.5) AS BIGINT)) AS x3
         |           FROM embeddings),
         |p AS (SELECT unnest(flatten(list_transform(range(0, 64), j ->
         |             list_transform(range(j, 64), k ->
         |               {'j': j, 'k': k, 'p': x3[j + 1] * x3[k + 1]})))) AS t
         |      FROM e),
         |sp AS (SELECT t.j AS j, t.k AS k, CAST(sum(t.p) AS BIGINT) AS sp FROM p GROUP BY 1, 2),
         |m1 AS (SELECT unnest(list_transform(range(0, 64), j -> {'j': j, 'v': x3[j + 1]})) AS u
         |       FROM e),
         |s1 AS (SELECT u.j AS j, CAST(sum(u.v) AS BIGINT) AS s1 FROM m1 GROUP BY 1),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
         |mm AS (SELECT sp.j, sp.k, nn.n AS n,
         |              nn.n * sp.sp - a.s1 * b.s1 AS m
         |       FROM sp JOIN s1 a ON sp.j = a.j JOIN s1 b ON sp.k = b.j CROSS JOIN nn),
         |ag AS (SELECT CAST(max(n) AS BIGINT) AS n,
         |              CAST(sum(CASE WHEN j = k THEN m ELSE 0 END) AS BIGINT) AS tr,
         |              CAST(sum(CAST(floor((CASE WHEN j = k THEN 1 ELSE 2 END) * (CAST(m AS DOUBLE) / (CAST(n AS DOUBLE) * n)) * (CAST(m AS DOUBLE) / (CAST(n AS DOUBLE) * n)) + 0.5) AS BIGINT)) AS BIGINT) AS f2
         |       FROM mm)
         |SELECT n, CAST(64 AS BIGINT) AS dim,
         |       ${Q.sqlR6("CAST(tr AS DOUBLE) / (CAST(n AS DOUBLE) * n) / 1e6")} AS trace_var,
         |       CASE WHEN f2 > 0 THEN ${Q.sqlR4("(CAST(tr AS DOUBLE) / (CAST(n AS DOUBLE) * n)) * (CAST(tr AS DOUBLE) / (CAST(n AS DOUBLE) * n)) / f2")} END AS effective_dim
         |FROM ag""".stripMargin) { (s, d) =>
      // ONE compiled Gram pass (r18): the r17 shape exploded 2,080
      // interpreted (j, k, product) structs per row into a (j, k)
      // groupBy, plus two more passes (per-dim sums, count) over a
      // snapshot of the corpus. GramSumAgg folds all three sufficient
      // statistics in a single map-side-collapsed aggregate (exact
      // int64, order-free — identical sums), and the 2,080-cell
      // (j, k) frame is reconstituted from the ONE result row. The
      // n = 0 guard empties the explode so a degenerate corpus yields
      // the same all-null readout the grouped form produced.
      val gram = udaf(new graft.functions.GramSumAgg(64),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
      val mm = Tables.load(s, d, "embeddings")
        .select(expr("transform(embedding, v -> CAST(floor(v * 1000 + 0.5) AS BIGINT))")
          .as("x3"))
        .agg(gram(col("x3")).as("g"))
        .select(explode(expr(
          """CASE WHEN element_at(g, 2145) = 0 THEN
            |  CAST(array() AS ARRAY<STRUCT<j: INT, k: INT, n: BIGINT, sp: BIGINT,
            |                               s1a: BIGINT, s1b: BIGINT>>)
            |ELSE
            |  flatten(transform(sequence(0, 63), j ->
            |    transform(sequence(j, 63), k ->
            |      named_struct('j', j, 'k', k,
            |        'n', element_at(g, 2145),
            |        'sp', element_at(g, CAST(64 * j - (j * (j - 1)) div 2 + (k - j) + 1 AS INT)),
            |        's1a', element_at(g, 2081 + j),
            |        's1b', element_at(g, 2081 + k)))))
            |END""".stripMargin)).as("t"))
        .select(col("t.j").as("j"), col("t.k").as("k"), col("t.n").as("n"),
          (col("t.n") * col("t.sp") - col("t.s1a") * col("t.s1b")).as("m"))
      val covd = col("m").cast("double") / (col("n").cast("double") * col("n"))
      val w = when(col("j") === col("k"), lit(1)).otherwise(lit(2))
      val ag = mm.agg(max("n").as("n"),
        sum(when(col("j") === col("k"), col("m")).otherwise(0L)).as("tr"),
        sum(floor(w * covd * covd + 0.5).cast("long")).as("f2"))
      val trc = col("tr").cast("double") / (col("n").cast("double") * col("n"))
      ag.select(col("n"), lit(64L).as("dim"),
        Q.r6(trc / lit(1e6)).as("trace_var"),
        when(col("f2") > 0, Q.r4(trc * trc / col("f2"))).as("effective_dim"))
    },

    // Simplified silhouette per label (round 13): s_i = (cos_own −
    // cos_nearest_other) / max(1−cos_own, 1−cos_nearest_other) in
    // cosine distance against the r6-rounded label centroids — the
    // one-number answer to "are the labels actually separated in
    // embedding space", aggregated to (mean silhouette, misfit count)
    // per label. The centroid-based simplification is what runs at
    // corpus scale: per-vector work is |labels| dot products, never a
    // pairwise pass. Spark: ONE posexploded corpus scan joins the
    // broadcast (label×dim) centroid frame on dim alone — the
    // |labels|-fold fan-out flows through one (vec, centroid) agg
    // keyed by ids (labels is a small enum, so the fan-out is a
    // constant factor, not a growth term); per-vector scores are
    // 1e6-lattice ints before the label rollup, so the cross-vector
    // mean is exact int64 in both engines.
    Q("q_silhouette",
      """WITH x AS (SELECT vec_id, label,
        |                  unnest(list_transform(range(1, len(embedding) + 1),
        |                         i -> {'dim': i - 1, 'v': CAST(embedding[i] AS DOUBLE)})) AS s
        |           FROM embeddings),
        |c AS (SELECT label AS cl, s.dim AS dim,
        |             floor((avg(s.v))*1000000+0.5)/1000000 AS c
        |      FROM x GROUP BY 1, 2),
        |p AS (SELECT x.vec_id, x.label, c.cl,
        |             sum(x.s.v * c.c) AS dot, sum(x.s.v * x.s.v) AS nv,
        |             sum(c.c * c.c) AS nc
        |      FROM x JOIN c ON x.s.dim = c.dim
        |      GROUP BY 1, 2, 3),
        |cz AS (SELECT vec_id, label, cl,
        |              floor((dot / (sqrt(nv) * sqrt(nc)))*1000000+0.5)/1000000 AS cos
        |       FROM p),
        |v AS (SELECT vec_id, label,
        |             max(CASE WHEN cl = label THEN cos END) AS cos_own,
        |             max(CASE WHEN cl <> label THEN cos END) AS cos_other
        |      FROM cz GROUP BY 1, 2),
        |sv AS (SELECT vec_id, label,
        |              CASE WHEN cos_other IS NULL THEN NULL
        |                   WHEN greatest(1 - cos_own, 1 - cos_other) <= 0 THEN CAST(0 AS BIGINT)
        |                   ELSE CAST(floor((cos_own - cos_other) /
        |                          greatest(1 - cos_own, 1 - cos_other) * 1e6 + 0.5) AS BIGINT)
        |              END AS s6
        |       FROM v)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |       CAST(count(s6) AS BIGINT) AS n_scored,
        |       floor((CAST(sum(s6) AS DOUBLE) / (count(s6) * 1e6))*1000000+0.5)/1000000 AS mean_silhouette,
        |       CAST(sum(CASE WHEN s6 < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_misfit
        |FROM sv
        |GROUP BY 1
        |ORDER BY 1""".stripMargin) { (s, d) =>
      val x = widened(Tables.load(s, d, "embeddings"))
        .select(col("vec_id"), col("label"), posexplode(col("de")).as(Seq("dim", "v")))
      val c = x.groupBy(col("label").as("cl"), col("dim"))
        .agg(Q.r6(avg(col("v"))).as("c"))
      val p = x.join(c, Seq("dim"))
        .groupBy("vec_id", "label", "cl")
        .agg(sum(col("v") * col("c")).as("dot"),
          sum(col("v") * col("v")).as("nv"), sum(col("c") * col("c")).as("nc"))
        .withColumn("cos", Q.r6(col("dot") / (sqrt(col("nv")) * sqrt(col("nc")))))
      val v = p.groupBy("vec_id", "label")
        .agg(max(when(col("cl") === col("label"), col("cos"))).as("cos_own"),
          max(when(col("cl") =!= col("label"), col("cos"))).as("cos_other"))
      val den = greatest(lit(1) - col("cos_own"), lit(1) - col("cos_other"))
      v.withColumn("s6",
          when(col("cos_other").isNull, lit(null))
            .when(den <= 0, lit(0L))
            .otherwise(floor((col("cos_own") - col("cos_other")) / den * 1e6 + 0.5)
              .cast("long")))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"), count(col("s6")).as("n_scored"),
          Q.r6(sum("s6").cast("double") / (count(col("s6")) * lit(1e6)))
            .as("mean_silhouette"),
          sum(when(col("s6") < 0, 1L).otherwise(0L)).as("n_misfit"))
        .orderBy("label")
    },

    // Hybrid retrieval fusion — reciprocal rank fusion (RRF, k=60) of a
    // dense ranking (cosine vs the vec_id-0 probe embedding) and a
    // sparse ranking (global-idf BM25 vs a fixed query term set), the
    // standard first stage of retrieval-based data curation / RAG
    // selection. Scale shape: each leg is a global top-20 via the
    // bounded-buffer TopKAgg (map-side partials, shuffle ≤ 20·partitions
    // rows — the scale-safe global top-k), the fusion is a full outer
    // join of two ≤20-row lists, and the final re-rank window runs over
    // ≤40 rows BY CONSTRUCTION (2k candidates) whatever the corpus size
    // — bounded input is what makes that window legal here. Absent legs
    // contribute 0 to the fused score, the truncated-list RRF standard.
    Q("q_hybrid_rrf",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings),
        |n AS (SELECT vec_id, de, sqrt(list_inner_product(de, de)) AS nrm FROM e),
        |p AS (SELECT de AS pde, nrm AS pnrm FROM n WHERE vec_id = 0),
        |ds AS (SELECT c.vec_id AS doc_id,
        |              floor((list_inner_product(p.pde, c.de) / (p.pnrm * c.nrm))*10000+0.5)/10000 AS dscore
        |       FROM n c, p WHERE c.vec_id <> 0),
        |d20 AS (SELECT doc_id, r_dense
        |        FROM (SELECT doc_id, row_number() OVER (ORDER BY dscore DESC, doc_id) AS r_dense FROM ds)
        |        WHERE r_dense <= 20),
        |w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |f AS (SELECT doc_id, len(words) AS dl,
        |             CAST(len(list_filter(words, x -> x = 'data')) AS DOUBLE) AS tf1,
        |             CAST(len(list_filter(words, x -> x = 'query')) AS DOUBLE) AS tf2,
        |             CAST(len(list_filter(words, x -> x = 'scan')) AS DOUBLE) AS tf3
        |      FROM w),
        |st AS (SELECT count(*) AS nd, sum(dl) AS sdl,
        |              count(*) FILTER (WHERE tf1 > 0) AS df1,
        |              count(*) FILTER (WHERE tf2 > 0) AS df2,
        |              count(*) FILTER (WHERE tf3 > 0) AS df3
        |       FROM f),
        |sc AS (SELECT f.doc_id,
        |              floor((
        |                ln((st.nd - st.df1 + 0.5) / (st.df1 + 0.5) + 1) * (f.tf1 * 2.2) / (f.tf1 + 1.2 * (0.25 + 0.75 * f.dl / (CAST(st.sdl AS DOUBLE) / st.nd)))
        |              + ln((st.nd - st.df2 + 0.5) / (st.df2 + 0.5) + 1) * (f.tf2 * 2.2) / (f.tf2 + 1.2 * (0.25 + 0.75 * f.dl / (CAST(st.sdl AS DOUBLE) / st.nd)))
        |              + ln((st.nd - st.df3 + 0.5) / (st.df3 + 0.5) + 1) * (f.tf3 * 2.2) / (f.tf3 + 1.2 * (0.25 + 0.75 * f.dl / (CAST(st.sdl AS DOUBLE) / st.nd)))
        |              )*10000+0.5)/10000 AS score
        |       FROM f, st),
        |s20 AS (SELECT doc_id, r_sparse
        |        FROM (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r_sparse
        |              FROM sc WHERE score > 0)
        |        WHERE r_sparse <= 20),
        |fused AS (SELECT coalesce(d.doc_id, s.doc_id) AS doc_id,
        |                 CAST(d.r_dense AS BIGINT) AS r_dense,
        |                 CAST(s.r_sparse AS BIGINT) AS r_sparse,
        |                 floor((coalesce(1.0 / (60 + d.r_dense), 0) + coalesce(1.0 / (60 + s.r_sparse), 0))*1000000+0.5)/1000000 AS rrf
        |          FROM d20 d FULL JOIN s20 s ON d.doc_id = s.doc_id)
        |SELECT doc_id, r_dense, r_sparse, rrf, CAST(rk AS BIGINT) AS rk
        |FROM (SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rk FROM fused)
        |WHERE rk <= 10
        |ORDER BY rk""".stripMargin) { (s, d) =>
      val top20 = udaf(new graft.functions.TopKAgg(20),
        org.apache.spark.sql.Encoders.product[graft.functions.Scored])
      // dense leg: cosine vs the broadcast single-row probe
      val e = widened(Tables.load(s, d, "embeddings"))
        .withColumn("nrm", sqrt(dot("de", "de")))
      val probe = e.filter(col("vec_id") === 0)
        .select(col("de").as("pde"), col("nrm").as("pnrm"))
      val d20 = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id"), Q.r4(dot("pde", "de") / (col("pnrm") * col("nrm"))).as("dscore"))
        .agg(top20(col("dscore"), col("vec_id")).as("top"))
        .select(posexplode(col("top")))
        .select(col("col.id").as("doc_id"), (col("pos") + 1).cast("long").as("r_dense"))
      // sparse leg: global-idf BM25 (the q_bm25 construction, unscoped)
      def tf(t: String) = size(expr(s"filter(words, x -> x = '$t')")).cast("double")
      val base = Tables.load(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .select(col("doc_id"), size(col("words")).as("dl"),
          tf("data").as("tf1"), tf("query").as("tf2"), tf("scan").as("tf3"))
      val statAggs = Seq(count(lit(1)).as("nd"), sum("dl").as("sdl")) ++
        (1 to 3).map(i => count(when(col(s"tf$i") > 0, 1)).as(s"df$i"))
      val stats = base.agg(statAggs.head, statAggs.tail: _*)
      val avgdl = col("sdl").cast("double") / col("nd")
      def part(i: Int) = {
        val dfc = col(s"df$i"); val tfc = col(s"tf$i")
        val idf = log((col("nd") - dfc + 0.5) / (dfc + 0.5) + 1)
        idf * (tfc * 2.2) / (tfc + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
      }
      val s20 = base.crossJoin(broadcast(stats))
        .select(col("doc_id"), Q.r4(part(1) + part(2) + part(3)).as("score"))
        .filter(col("score") > 0)
        .agg(top20(col("score"), col("doc_id")).as("top"))
        .select(posexplode(col("top")))
        .select(col("col.id").as("doc_id"), (col("pos") + 1).cast("long").as("r_sparse"))
      val rrf = Q.r6(
        coalesce(lit(1.0) / (lit(60) + col("r_dense")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(60) + col("r_sparse")), lit(0.0)))
      d20.join(s20, Seq("doc_id"), "full")
        .select(col("doc_id"), col("r_dense"), col("r_sparse"), rrf.as("rrf"))
        // ≤ 2k = 40 rows by construction — the global window is bounded
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rrf").desc, col("doc_id"))).cast("long"))
        .filter(col("rk") <= 10)
        .orderBy("rk")
    },

    // Label-affinity matrix: cosine similarity between per-label
    // centroids — the class-confusability / semantic-drift monitor over
    // an embedded corpus. The corpus collapses to a #labels × dim
    // centroid table FIRST (map-side partial averages, the q_centroid
    // shuffle shape); per-label vectors then fold into ONE row and the
    // C(#labels, 2) pairs expand IN-ROW (the q_source_overlap pair
    // trick over the label-sorted array), with cosine as zip_with/
    // aggregate HOFs per pair. One corpus scan total — the dim-keyed
    // self-join formulation read the embeddings TWICE because Spark
    // plans trees, not DAGs (plan-audited at one scan now). Every
    // post-collapse stage is #labels-bounded whatever the corpus size.
    // Centroids are r6-rounded BEFORE the dot products so both engines
    // feed identical doubles into the pair sums.
    Q("q_label_affinity",
      """WITH x AS (SELECT label,
        |                  unnest(list_transform(range(1, len(embedding) + 1),
        |                         i -> {'dim': i - 1, 'v': CAST(embedding[i] AS DOUBLE)})) AS s
        |           FROM embeddings),
        |c AS (SELECT label, s.dim AS dim,
        |             floor((avg(s.v))*1000000+0.5)/1000000 AS c
        |      FROM x GROUP BY 1, 2),
        |p AS (SELECT a.label AS la, b.label AS lb,
        |             sum(a.c * b.c) AS dot,
        |             sum(a.c * a.c) AS na,
        |             sum(b.c * b.c) AS nb
        |      FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
        |      GROUP BY 1, 2)
        |SELECT la, lb, floor((dot / (sqrt(na) * sqrt(nb)))*10000+0.5)/10000 AS cos
        |FROM p
        |ORDER BY la, lb""".stripMargin) { (s, d) =>
      val cent = widened(Tables.load(s, d, "embeddings"))
        .select(col("label"), posexplode(col("de")).as(Seq("dim", "v")))
        .groupBy("label", "dim")
        .agg(Q.r6(avg(col("v"))).as("c"))
      // per-label centroid vector in dim order (sort_array on the
      // (dim, c) struct sorts by dim), then ONE row holding the
      // label-sorted list of (label, vector)
      cent.groupBy("label")
        .agg(expr("transform(sort_array(collect_list(struct(dim, c))), s -> s.c)").as("cv"))
        .agg(sort_array(collect_list(struct(col("label"), col("cv")))).as("ls"))
        .select(explode(expr(
          """flatten(transform(ls, (x, i) ->
            |  transform(slice(ls, i + 2, size(ls)),
            |            y -> struct(x.label AS la, y.label AS lb,
            |                        x.cv AS ca, y.cv AS cb))))""".stripMargin)).as("p"))
        .select(col("p.la").as("la"), col("p.lb").as("lb"),
          // native dot_product (r19): bit-identical to the HOF fold
          // (same left-to-right double accumulation), codegen'd
          Q.r4(graft.functions.DotProduct.dot_product(col("p.ca"), col("p.cb")) /
            (sqrt(graft.functions.DotProduct.dot_product(col("p.ca"), col("p.ca"))) *
             sqrt(graft.functions.DotProduct.dot_product(col("p.cb"), col("p.cb")))))
            .as("cos"))
        .orderBy("la", "lb")
    },

    // Int8 scalar-quantization audit (round 17): quantize every
    // embedding dimension onto the 0..255 grid spanned by the corpus
    // per-dim min/max, then re-score the q_sim_brute probe set on the
    // DEQUANTIZED vectors — does 4× compression (the first move any
    // 100 TB vector store makes) keep the top-1 neighbor, and how far
    // do the cosines move? Per probe: exact vs quantized top-1 (both
    // ranked on the r4 round-before-top-k lattice), agreement flag,
    // and the mean |Δcosine| over all candidates folded as exact
    // int64 lattice units. Shape: ONE 64-row per-dim stats agg
    // (map-side partials), two 64-element arrays broadcast for the
    // in-row quantization pass, then the probe-bounded brute audit —
    // never corpus × corpus; the production read path stays IVF/LSH,
    // this CALIBRATES the compression they'd run on.
    Q("q_sq8_recall",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings),
        |dim AS (SELECT CAST(range AS BIGINT) AS i FROM range(1, 65)),
        |mm AS (SELECT i, min(de[i]) AS mn, max(de[i]) AS mx
        |       FROM e CROSS JOIN dim GROUP BY 1),
        |ar AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM mm),
        |q AS (SELECT vec_id, de,
        |             list_transform(list_zip(de, ar.mns, ar.mxs), z ->
        |               CASE WHEN z[3] > z[2] THEN
        |                 z[2] + floor((z[1] - z[2]) / (z[3] - z[2])
        |                   * 255 + 0.5) * (z[3] - z[2]) / 255
        |               ELSE z[1] END) AS qe
        |      FROM e CROSS JOIN ar),
        |n AS (SELECT vec_id, de, qe,
        |             sqrt(list_inner_product(de, de)) AS nrm,
        |             sqrt(list_inner_product(qe, qe)) AS qnrm
        |      FROM q),
        |s AS (SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |             CAST(floor(list_inner_product(p.de, c.de) / (p.nrm * c.nrm)
        |                  * 1e4 + 0.5) AS BIGINT) AS s4,
        |             CAST(floor(list_inner_product(p.qe, c.qe) / (p.qnrm * c.qnrm)
        |                  * 1e4 + 0.5) AS BIGINT) AS t4
        |      FROM n p JOIN n c ON p.vec_id < 10 AND p.vec_id <> c.vec_id),
        |r AS (SELECT *,
        |             row_number() OVER (PARTITION BY probe_id ORDER BY s4 DESC, cand_id) AS re,
        |             row_number() OVER (PARTITION BY probe_id ORDER BY t4 DESC, cand_id) AS rq
        |      FROM s),
        |g AS (SELECT probe_id,
        |             max(CASE WHEN re = 1 THEN cand_id END) AS top1_exact,
        |             max(CASE WHEN re = 1 THEN s4 END) AS s1e4,
        |             max(CASE WHEN rq = 1 THEN cand_id END) AS top1_sq8,
        |             max(CASE WHEN rq = 1 THEN t4 END) AS s1q4,
        |             CAST(sum(abs(s4 - t4)) AS BIGINT) AS ae4,
        |             CAST(count(*) AS BIGINT) AS m
        |      FROM r GROUP BY 1)
        |SELECT probe_id, top1_exact, CAST(s1e4 AS DOUBLE) / 1e4 AS exact_score,
        |       top1_sq8, CAST(s1q4 AS DOUBLE) / 1e4 AS sq8_score,
        |       CASE WHEN top1_exact = top1_sq8 THEN 1 ELSE 0 END AS agree,
        |       floor((CAST(ae4 AS DOUBLE) / (m * 1e4))*1000000+0.5)/1000000 AS mean_abs_err
        |FROM g
        |ORDER BY probe_id""".stripMargin) { (s, d) =>
      val e = widened(Tables.load(s, d, "embeddings")).select("vec_id", "de")
      val ar = e.select(posexplode(col("de")))
        .groupBy("pos").agg(min("col").as("mn"), max("col").as("mx"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, mn))), z -> z.mn)")
          .as("mns"),
          expr("transform(array_sort(collect_list(struct(pos, mx))), z -> z.mx)")
            .as("mxs"))
      // quantize IN-ROW against the broadcast 64-element min/max arrays
      // — the IEEE tree mirrors the oracle's list_zip lambda term for
      // term (mn + floor((x−mn)/(mx−mn)·255 + 0.5)·(mx−mn)/255), with
      // a degenerate-dim guard (mx = mn keeps the raw value) identical
      // in both engines.
      val n = e.crossJoin(broadcast(ar))
        .withColumn("qe", expr(
          """transform(de, (x, i) ->
            |  CASE WHEN element_at(mxs, i + 1) > element_at(mns, i + 1) THEN
            |    element_at(mns, i + 1) +
            |    floor((x - element_at(mns, i + 1)) /
            |          (element_at(mxs, i + 1) - element_at(mns, i + 1)) * 255 + 0.5) *
            |    (element_at(mxs, i + 1) - element_at(mns, i + 1)) / 255
            |  ELSE x END)""".stripMargin))
        .withColumn("nrm", sqrt(dot("de", "de")))
        .withColumn("qnrm", sqrt(dot("qe", "qe")))
        .select("vec_id", "de", "qe", "nrm", "qnrm")
      val probes = n.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("de").as("pde"), col("qe").as("pqe"),
          col("nrm").as("pnrm"), col("qnrm").as("pqnrm"))
      val pairs = n.crossJoin(broadcast(probes))
        .filter(col("probe_id") =!= col("vec_id"))
        .select(col("probe_id"), col("vec_id").as("cand_id"),
          floor(dot("pde", "de") / (col("pnrm") * col("nrm")) * 1e4 + 0.5)
            .cast("long").as("s4"),
          floor(dot("pqe", "qe") / (col("pqnrm") * col("qnrm")) * 1e4 + 0.5)
            .cast("long").as("t4"))
      val we = Window.partitionBy("probe_id").orderBy(col("s4").desc, col("cand_id"))
      val wq = Window.partitionBy("probe_id").orderBy(col("t4").desc, col("cand_id"))
      pairs
        .withColumn("re", row_number().over(we))
        .withColumn("rq", row_number().over(wq))
        .groupBy("probe_id")
        .agg(max(when(col("re") === 1, col("cand_id"))).as("top1_exact"),
          max(when(col("re") === 1, col("s4"))).as("s1e4"),
          max(when(col("rq") === 1, col("cand_id"))).as("top1_sq8"),
          max(when(col("rq") === 1, col("t4"))).as("s1q4"),
          sum(abs(col("s4") - col("t4"))).as("ae4"),
          count(lit(1)).as("m"))
        .select(col("probe_id"), col("top1_exact"),
          (col("s1e4").cast("double") / 1e4).as("exact_score"),
          col("top1_sq8"), (col("s1q4").cast("double") / 1e4).as("sq8_score"),
          when(col("top1_exact") === col("top1_sq8"), 1).otherwise(0).as("agree"),
          Q.r6(col("ae4").cast("double") / (col("m") * lit(1e4))).as("mean_abs_err"))
        .orderBy("probe_id")
    },

    // Product-quantization audit (round 18 — the r17 verdict's #2,
    // completing the compression family beside q_sq8_recall): split
    // each 64-dim embedding into m=4 subspaces of 16 dims, learn a
    // 16-entry codebook per subspace with two exact Lloyd rounds
    // (init = the sub-vectors of vec_id 0..15; both engines fold the
    // SAME int64 1e-6-lattice sufficient statistics, so the centroid
    // update is order-free and bit-identical), assign each vector its
    // nearest code per subspace (scores on the 1e-6 lattice, ties to
    // the lowest code), reconstruct, and re-score the q_sim_brute
    // probe set ASYMMETRICALLY (exact probe × reconstructed
    // candidate — the ADC form a real PQ store serves): per probe
    // exact vs PQ top-1, agreement, mean |Δcos|. Shape: codebooks are
    // (m·K·dims)-bounded aggs broadcast for in-row assignment; the
    // Lloyd exchanges key on (vec, subspace) / (subspace, code, dim)
    // — the corpus never self-joins; re-score is probe-bounded. At
    // 100 TB this is THE deployed layout (16 bytes/vector + 4 tiny
    // codebooks); the audit calibrates its recall cost.
    Q("q_pq_recall",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings),
        |js AS (SELECT unnest([0, 1, 2, 3]) AS j),
        |ds AS (SELECT CAST(unnest(range(1, 17)) AS BIGINT) AS i),
        |sub AS (SELECT vec_id, j, list_slice(de, j*16 + 1, j*16 + 16) AS sv
        |        FROM e CROSS JOIN js),
        |tr AS (SELECT * FROM sub WHERE vec_id < 1024),
        |c0 AS (SELECT j, CAST(vec_id AS BIGINT) AS code, sv AS cv
        |       FROM sub WHERE vec_id < 16),
        |a1 AS (SELECT s.vec_id, s.j, s.sv, c.code,
        |              CAST(floor((list_inner_product(s.sv, c.cv)
        |                   - list_inner_product(c.cv, c.cv) / 2) * 1e6 + 0.5) AS BIGINT) AS sc6
        |       FROM tr s JOIN c0 c ON s.j = c.j),
        |b1 AS (SELECT vec_id, j, sv, code FROM (
        |         SELECT *, row_number() OVER (PARTITION BY vec_id, j
        |                     ORDER BY sc6 DESC, code) AS rn FROM a1) WHERE rn = 1),
        |u1 AS (SELECT b.j, b.code, d.i AS dim,
        |              CAST(sum(CAST(floor(b.sv[d.i] * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s6,
        |              CAST(count(*) AS BIGINT) AS n
        |       FROM b1 b CROSS JOIN ds d GROUP BY 1, 2, 3),
        |c1 AS (SELECT j, code,
        |              list(CAST(floor(CAST(s6 AS DOUBLE) / n + 0.5) AS DOUBLE) / 1e6
        |                   ORDER BY dim) AS cv
        |       FROM u1 GROUP BY 1, 2),
        |a2 AS (SELECT s.vec_id, s.j, s.sv, c.code,
        |              CAST(floor((list_inner_product(s.sv, c.cv)
        |                   - list_inner_product(c.cv, c.cv) / 2) * 1e6 + 0.5) AS BIGINT) AS sc6
        |       FROM tr s JOIN c1 c ON s.j = c.j),
        |b2 AS (SELECT vec_id, j, sv, code FROM (
        |         SELECT *, row_number() OVER (PARTITION BY vec_id, j
        |                     ORDER BY sc6 DESC, code) AS rn FROM a2) WHERE rn = 1),
        |u2 AS (SELECT b.j, b.code, d.i AS dim,
        |              CAST(sum(CAST(floor(b.sv[d.i] * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s6,
        |              CAST(count(*) AS BIGINT) AS n
        |       FROM b2 b CROSS JOIN ds d GROUP BY 1, 2, 3),
        |c2 AS (SELECT j, code,
        |              list(CAST(floor(CAST(s6 AS DOUBLE) / n + 0.5) AS DOUBLE) / 1e6
        |                   ORDER BY dim) AS cv
        |       FROM u2 GROUP BY 1, 2),
        |a3 AS (SELECT s.vec_id, s.j, c.code,
        |              CAST(floor((list_inner_product(s.sv, c.cv)
        |                   - list_inner_product(c.cv, c.cv) / 2) * 1e6 + 0.5) AS BIGINT) AS sc6
        |       FROM sub s JOIN c2 c ON s.j = c.j),
        |b3 AS (SELECT vec_id, j, code FROM (
        |         SELECT *, row_number() OVER (PARTITION BY vec_id, j
        |                     ORDER BY sc6 DESC, code) AS rn FROM a3) WHERE rn = 1),
        |rec AS (SELECT b.vec_id, b.j, c.cv
        |        FROM b3 b JOIN c2 c ON b.j = c.j AND b.code = c.code),
        |q AS (SELECT vec_id, flatten(list(cv ORDER BY j)) AS qe FROM rec GROUP BY 1),
        |n0 AS (SELECT e.vec_id, e.de, q.qe,
        |              sqrt(list_inner_product(e.de, e.de)) AS nrm,
        |              sqrt(list_inner_product(q.qe, q.qe)) AS qnrm
        |       FROM e JOIN q USING (vec_id)),
        |s AS (SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |             CAST(floor(list_inner_product(p.de, c.de) / (p.nrm * c.nrm)
        |                  * 1e4 + 0.5) AS BIGINT) AS s4,
        |             CAST(floor(list_inner_product(p.de, c.qe) / (p.nrm * c.qnrm)
        |                  * 1e4 + 0.5) AS BIGINT) AS t4
        |      FROM n0 p JOIN n0 c ON p.vec_id < 10 AND p.vec_id <> c.vec_id),
        |r AS (SELECT *,
        |             row_number() OVER (PARTITION BY probe_id ORDER BY s4 DESC, cand_id) AS re,
        |             row_number() OVER (PARTITION BY probe_id ORDER BY t4 DESC, cand_id) AS rq
        |      FROM s),
        |g AS (SELECT probe_id,
        |             max(CASE WHEN re = 1 THEN cand_id END) AS top1_exact,
        |             max(CASE WHEN re = 1 THEN s4 END) AS s1e4,
        |             max(CASE WHEN rq = 1 THEN cand_id END) AS top1_pq,
        |             max(CASE WHEN rq = 1 THEN t4 END) AS s1q4,
        |             CAST(sum(abs(s4 - t4)) AS BIGINT) AS ae4,
        |             CAST(count(*) AS BIGINT) AS m
        |      FROM r GROUP BY 1)
        |SELECT probe_id, top1_exact, CAST(s1e4 AS DOUBLE) / 1e4 AS exact_score,
        |       top1_pq, CAST(s1q4 AS DOUBLE) / 1e4 AS pq_score,
        |       CASE WHEN top1_exact = top1_pq THEN 1 ELSE 0 END AS agree,
        |       floor((CAST(ae4 AS DOUBLE) / (m * 1e4))*1000000+0.5)/1000000 AS mean_abs_err
        |FROM g
        |ORDER BY probe_id""".stripMargin) { (s, d) =>
      val e = widened(Tables.load(s, d, "embeddings")).select("vec_id", "de")
      // qe is an in-row column now (r19, withPqReconstruction) — the
      // r18 corpus self-join on vec_id is gone
      val n0 = withPqReconstruction(e)
        .withColumn("nrm", sqrt(dot("de", "de")))
        .withColumn("qnrm", sqrt(dot("qe", "qe")))
      val probes = n0.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("de").as("pde"), col("nrm").as("pnrm"))
      val pairs = n0.crossJoin(broadcast(probes))
        .filter(col("probe_id") =!= col("vec_id"))
        .select(col("probe_id"), col("vec_id").as("cand_id"),
          floor(dot("pde", "de") / (col("pnrm") * col("nrm")) * 1e4 + 0.5)
            .cast("long").as("s4"),
          floor(dot("pde", "qe") / (col("pnrm") * col("qnrm")) * 1e4 + 0.5)
            .cast("long").as("t4"))
      val we = Window.partitionBy("probe_id").orderBy(col("s4").desc, col("cand_id"))
      val wq = Window.partitionBy("probe_id").orderBy(col("t4").desc, col("cand_id"))
      pairs
        .withColumn("re", row_number().over(we))
        .withColumn("rq", row_number().over(wq))
        .groupBy("probe_id")
        .agg(max(when(col("re") === 1, col("cand_id"))).as("top1_exact"),
          max(when(col("re") === 1, col("s4"))).as("s1e4"),
          max(when(col("rq") === 1, col("cand_id"))).as("top1_pq"),
          max(when(col("rq") === 1, col("t4"))).as("s1q4"),
          sum(abs(col("s4") - col("t4"))).as("ae4"),
          count(lit(1)).as("m"))
        .select(col("probe_id"), col("top1_exact"),
          (col("s1e4").cast("double") / 1e4).as("exact_score"),
          col("top1_pq"), (col("s1q4").cast("double") / 1e4).as("pq_score"),
          when(col("top1_exact") === col("top1_pq"), 1).otherwise(0).as("agree"),
          Q.r6(col("ae4").cast("double") / (col("m") * lit(1e4))).as("mean_abs_err"))
        .orderBy("probe_id")
    }
  )
}
