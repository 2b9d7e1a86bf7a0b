package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ground-truth semantics for the round-12 diagnostics: each operator
  * runs against a SYNTHETIC corpus constructed so the right answer is
  * known in closed form — evidence independent of the DuckDB oracle
  * (which shares the formula tree by design; these tests share
  * nothing). The synthetic dirs carry the standard table schemas so
  * the UNCHANGED SparkEntry.queries entries run against them.
  */
class DiagnosticsSpec extends SparkSpec {

  /** Synthetic events dir whose per-type daily counts follow `f`:
    * day d of `days` gets f(type, d) events (deterministic ids/users). */
  private def eventsDir(types: Seq[String], days: Int,
                        f: (String, Int) => Int,
                        value: (String, Long) => Double = (_, i) => (i % 100).toDouble)
      : String = {
    val dir = tempDir("diag_events")
    val rows = for {
      t <- types
      d <- 0 until days
      i <- 0 until f(t, d)
    } yield (t, d, i)
    import spark.implicits._
    rows.toDF("event_type", "d", "i")
      .withColumn("event_id", monotonically_increasing_id())
      .select(
        col("event_id"),
        // 2024-01-01 + d days, hour spread by i
        (to_timestamp(lit("2024-01-01 00:00:00")) +
          make_dt_interval(col("d"), col("i") % 24, lit(0), lit(0))).as("ts"),
        (col("i") % 7).cast("long").as("user_id"),
        col("event_type"),
        col("event_id"))
      .withColumn("value", udfValue(value)(col("event_type"), col("event_id")))
      .withColumn("props", lit("""{"k": 1}"""))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def udfValue(f: (String, Long) => Double) =
    udf((t: String, i: Long) => f(t, i))

  /** Synthetic documents dir from explicit (doc_id, text, source). */
  private def docsDir(docs: Seq[(Long, String, String)]): String = {
    val dir = tempDir("diag_docs")
    import spark.implicits._
    docs.toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Minimal events dir from explicit (event_id, event_type, value) —
    * the fixture under the cents-grid two-sample tests. */
  private def valuedEventsDir(name: String, rows: Seq[(Long, String, Double)]): String = {
    import spark.implicits._
    val dir = tempDir(name)
    rows.toDF("event_id", "event_type", "value")
      .withColumn("ts", to_timestamp(lit("2024-01-02 08:00:00")))
      .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def run(name: String, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  // deterministic integer noise in [0, m) — no RNG, replay-safe
  private def mix(a: Long, b: Long, m: Int): Int = {
    var h = a * 0x9E3779B97F4A7C15L + b * 0xC2B2AE3D27D4EB4FL
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
    ((h & Long.MaxValue) % m).toInt
  }

  test("q_huber: a planted outlier is downweighted; zero MAD keeps the median") {
    def lat4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    // 1,2,3,4 + a 100.00 outlier (cents 100..400, 10000): med = 300,
    // MAD = 100 — replicate the 3-round IRLS with the same 1e6 weight
    // lattice and compare the r4 location
    val dir = valuedEventsDir("diag_huber",
      Seq((1L, "purchase", 1.0), (2L, "purchase", 2.0), (3L, "purchase", 3.0),
        (4L, "purchase", 4.0), (5L, "purchase", 100.0)))
    val r = run("q_huber", dir).head()
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Long]("median_cents") === 300L)
    assert(r.getAs[Long]("mad_cents") === 100L)
    assert(r.getAs[Double]("mean_cents") === 2200.0)
    val cells = Seq(100L, 200L, 300L, 400L, 10000L)
    val k = 1.345 * 1.4826 * 100
    var mu = 300.0
    for (_ <- 1 to 3) {
      val w6 = cells.map(v => math.floor(
        (if (math.abs(v - mu) <= k) 1.0 else k / math.abs(v - mu)) * 1e6 + 0.5).toLong)
      mu = cells.zip(w6).map { case (v, w) => w * v }.sum.toDouble / w6.sum
    }
    assert(r.getAs[Double]("huber_cents") === lat4(mu))
    assert(r.getAs[Double]("huber_cents") < r.getAs[Double]("mean_cents"),
      "the outlier must be downweighted below the raw mean")
    // MAD = 0 (majority at one value): k = 0 zeroes every off-median
    // weight and the location must stay AT the median — no 0/0 path
    val d0 = valuedEventsDir("diag_huber0",
      Seq((1L, "purchase", 1.0), (2L, "purchase", 1.0), (3L, "purchase", 1.0),
        (4L, "purchase", 1.0), (5L, "purchase", 100.0)))
    val r0 = run("q_huber", d0).head()
    assert(r0.getAs[Long]("mad_cents") === 0L)
    assert(r0.getAs[Double]("huber_cents") === 100.0)
  }

  test("q_audio_features: the WAV round trip reproduces an independent sample recomputation") {
    // one purchase clip (event_id 0 → 220 Hz, value 0.05 → a = 6) and
    // one click clip (event_id 1 → 330 Hz, value 1.00 → a = 5): the
    // query must reach, THROUGH real RIFF/WAVE bytes, exactly the
    // features this test recomputes from the closed-form samples
    def s3(f: Long, t: Int) =
      math.floor(math.sin(2 * math.Pi * f * t / 8000) * 1e3 + 0.5).toLong
    def feats(f: Long, a: Long): (Long, Long, Long) = {
      val s = (0 until 64).map(t => a * s3(f, t))
      val flips = (1 until 64).count(t => (s(t) < 0) != (s(t - 1) < 0)).toLong
      (flips, s.map(x => x * x).sum, s.map(math.abs).max)
    }
    val dir = valuedEventsDir("diag_audio",
      Seq((0L, "purchase", 0.05), (1L, "click", 1.00)))
    val out = run("q_audio_features", dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    def lat(x: Double, s: Double) = math.floor(x * s + 0.5) / s
    for ((ty, f, a) <- Seq(("purchase", 220L, 6L), ("click", 330L, 5L))) {
      val (flips, energy, peak) = feats(f, a)
      val r = out(ty)
      assert(r.getAs[Long]("n_clips") === 1L)
      assert(r.getAs[Long]("sample_rate") === 8000L, "rate must come from the parsed header")
      assert(r.getAs[Double]("mean_zcr") === lat(flips / 63.0, 1e6))
      assert(r.getAs[Double]("mean_energy") === lat(energy / 64.0, 1e2))
      assert(r.getAs[Long]("max_peak") === peak)
    }
    // the silence screen rides the same decoded clips: recompute the
    // longest sub-10%-of-peak run from the closed-form samples
    val sil = run("q_audio_silence", dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    for ((ty, f, a) <- Seq(("purchase", 220L, 6L), ("click", 330L, 5L))) {
      val s = (0 until 64).map(t => a * s3(f, t))
      val peak = s.map(math.abs).max
      var quiet = 0; var runLen = 0
      for (x <- s) {
        if (10 * math.abs(x) < peak) { runLen += 1; quiet = math.max(quiet, runLen) }
        else runLen = 0
      }
      val r = sil(ty)
      assert(r.getAs[Long]("max_quiet_run") === quiet.toLong)
      assert(r.getAs[Double]("mean_quiet_share") === lat(quiet / 64.0, 1e6))
      assert(r.getAs[Long]("n_gapped") === (if (quiet >= 8) 1L else 0L))
    }
  }

  test("q_word_len_hist: a planted token mix reads exact bands, shares and mean") {
    def lat(x: Double, s: Double) = math.floor(x * s + 0.5) / s
    // tokens: a(1) bb(2) ccc(3) dddd(4) a(1) + one 20-char token → band 15
    val dir = docsDir(Seq(
      (1L, "a bb ccc", "s1"),
      (2L, "dddd a " + "x" * 20, "s1")))
    val rows = run("q_word_len_hist", dir).collect()
      .map(r => r.getAs[Long]("wlen") -> r).toMap
    assert(rows.keySet === Set(1L, 2L, 3L, 4L, 15L))
    assert(rows(1L).getAs[Long]("n_words") === 2L)
    assert(rows(15L).getAs[Long]("n_words") === 1L)
    assert(rows(1L).getAs[Double]("share") === lat(2.0 / 6, 1e6))
    // mean length uses TRUE lengths (the 20-char token counts as 20)
    assert(rows(1L).getAs[Double]("mean_len") === lat(31.0 / 6, 1e4))
  }

  test("q_punct_profile: a hand-built char mix reads exact class shares") {
    def lat6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // "Ab1 c." = 6 chars: digit 1, upper 1, space 1, other (the dot) 1
    val dir = docsDir(Seq((1L, "Ab1 c.", "s1")))
    val r = run("q_punct_profile", dir).head()
    assert(r.getAs[Long]("n_docs") === 1L && r.getAs[Long]("n_chars") === 6L)
    assert(r.getAs[Double]("digit_share") === lat6(1.0 / 6))
    assert(r.getAs[Double]("upper_share") === lat6(1.0 / 6))
    assert(r.getAs[Double]("space_share") === lat6(1.0 / 6))
    assert(r.getAs[Double]("other_share") === lat6(1.0 / 6))
    assert(r.getAs[Double]("mean_doc_chars") === 6.0)
  }

  test("q_cox_stuart: a monotone ramp reads the exact binomial z; a flat series is NULL") {
    // "a" counts 1..8 over 8 days: offset ⌈8/2⌉ = 4, all four pairs
    // increase ⇒ S⁺ = m = 4, z = (8 − 4)/√4 = 2; "b" constant ⇒ every
    // pair ties out of m ⇒ z NULL
    val dir = eventsDir(Seq("a", "b"), 8, (t, d) => if (t == "a") d + 1 else 5)
    val out = run("q_cox_stuart", dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_days") === 8L && a.getAs[Long]("n_pairs") === 4L)
    assert(a.getAs[Long]("n_plus") === 4L)
    assert(a.getAs[Double]("z") === 2.0)
    val b = out("b")
    assert(b.getAs[Long]("n_pairs") === 0L)
    assert(b.isNullAt(b.fieldIndex("z")), "an all-tied pairing must read NULL z")
  }

  test("q_bartels_rank: a ramp reads RVN 1/6, an alternation reads RVN 3.5") {
    def lat6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // ramp 1..8: doubled ranks 2i, NM2 = 4·7 = 28, D2 = Σ(2i−9)² = 168
    val ramp = eventsDir(Seq("a"), 8, (_, d) => d + 1)
    val r = run("q_bartels_rank", ramp).head()
    assert(r.getAs[Long]("n_days") === 8L)
    assert(r.getAs[Double]("rvn") === lat6(28.0 / 168))
    assert(r.getAs[Double]("z") ===
      lat6((28.0 / 168 - 2.0) / math.sqrt(4.0 * 6 / 63)))
    // alternation 10,20,10,20,...: tied midranks r2 ∈ {5, 13},
    // NM2 = 64·7 = 448, D2 = 8·16 = 128 ⇒ RVN = 3.5 (oscillating > 2)
    val alt = eventsDir(Seq("a"), 8, (_, d) => if (d % 2 == 0) 10 else 20)
    val ra = run("q_bartels_rank", alt).head()
    assert(ra.getAs[Double]("rvn") === 3.5)
    assert(ra.getAs[Double]("z") === lat6(1.5 / math.sqrt(4.0 * 6 / 63)))
  }

  test("q_pinball: hand-built residuals read the exact three quantile losses") {
    // counts 10, 13, 13, 9 ⇒ residuals +3, 0, −4 ⇒ Σd⁺ = 3, Σd⁻ = 4:
    // q10 = (3 + 36)/30, q50 = 35/30 (= MAE/2), q90 = (27 + 4)/30
    def lat6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val counts = Seq(10, 13, 13, 9)
    val dir = eventsDir(Seq("a"), 4, (_, d) => counts(d))
    val r = run("q_pinball", dir).head()
    assert(r.getAs[Long]("n_forecasts") === 3L)
    assert(r.getAs[Double]("pinball_q10") === lat6(39.0 / 30))
    assert(r.getAs[Double]("pinball_q50") === lat6(35.0 / 30))
    assert(r.getAs[Double]("pinball_q90") === lat6(31.0 / 30))
  }

  test("q_ljung_box separates white noise from a strong weekly cycle") {
    val noisy = eventsDir(Seq("a"), 60, (_, d) => 50 + mix(1, d, 11))
    val weekly = eventsDir(Seq("a"), 60, (_, d) => if (d % 7 < 2) 200 else 20)
    val qN = run("q_ljung_box", noisy).head().getAs[Double]("q_stat")
    val qW = run("q_ljung_box", weekly).head().getAs[Double]("q_stat")
    // chi2(7 dof) 99th percentile is 18.5: noise must sit well under a
    // loose multiple of it, the planted cycle far above
    assert(qN < 30, s"white-noise Q $qN should be unremarkable")
    assert(qW > 100, s"weekly-cycle Q $qW should reject whiteness loudly")
    assert(qW > 5 * qN, s"cycle Q $qW should dominate noise Q $qN")
  }

  test("q_pacf recovers AR(1): phi1 near the coefficient, phi2/phi3 near zero") {
    // y_t = 100 + 0.7·(y_{t-1} − 100) + small deterministic noise
    val ys = Iterator.iterate((80.0, 0)) { case (y, d) =>
      (100 + 0.7 * (y - 100) + (mix(2, d, 9) - 4), d + 1)
    }.map(_._1).take(120).toSeq
    val dir = eventsDir(Seq("a"), 120, (_, d) => math.max(1, math.round(ys(d)).toInt))
    val r = run("q_pacf", dir).head()
    val (p1, p2, p3) = (r.getAs[Double]("phi1"), r.getAs[Double]("phi2"), r.getAs[Double]("phi3"))
    assert(p1 > 0.45 && p1 < 0.9, s"phi1 $p1 should sit near 0.7")
    assert(math.abs(p2) < 0.3 && math.abs(p3) < 0.3,
      s"AR(1) has no deeper structure: phi2 $p2, phi3 $p3")
  }

  test("q_hurst reads persistence: trending series high, alternating series low") {
    // persistent: slow 3-phase ramp; anti-persistent: hard alternation
    val trend = eventsDir(Seq("a"), 112, (_, d) => 20 + (d % 56) * 3)
    val flip = eventsDir(Seq("a"), 112, (_, d) => if (d % 2 == 0) 10 else 90)
    val hT = run("q_hurst", trend).head().getAs[Double]("hurst")
    val hF = run("q_hurst", flip).head().getAs[Double]("hurst")
    assert(hT > 0.75, s"ramp series should read strongly persistent, got $hT")
    assert(hF < 0.35, s"alternating series should read anti-persistent, got $hF")
  }

  test("q_sax_motifs: constant series collapses to the single middle motif") {
    val dir = eventsDir(Seq("a", "b"), 30, (_, _) => 25)
    val rows = run("q_sax_motifs", dir).collect()
    // constant series: spread 0 ⇒ n·y − s = 0 ≤ 0 ⇒ symbol 'b' everywhere;
    // 30 days → 28 consecutive 3-day motifs per type
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getAs[String]("motif") === "bbb")
      assert(r.getAs[Long]("n") === 28L)
    }
  }

  test("q_entropy_rate: a deterministic cycle compresses to zero, noise does not") {
    // one user walks a..b..c deterministically: every transition
    // probability is 1 ⇒ H_rate = 0 regardless of the marginal entropy
    val dir = tempDir("diag_cycle")
    import spark.implicits._
    val cyc = (0 until 300).map(i => (i.toLong, 0L, Seq("a", "b", "c")(i % 3)))
    cyc.toDF("event_id", "user_id", "event_type")
      .select(col("event_id"),
        (to_timestamp(lit("2024-01-01 00:00:00")) +
          make_dt_interval(lit(0), lit(0), col("event_id"), lit(0))).as("ts"),
        col("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = run("q_entropy_rate", dir).head()
    assert(r.getAs[Double]("entropy_rate") === 0.0)
    assert(r.getAs[Long]("k_states") === 3L)
    // and the rate is bounded by the uniform bound on real data
    val real = run("q_entropy_rate", sfDir).head()
    assert(real.getAs[Double]("entropy_rate") > 0)
    assert(real.getAs[Double]("entropy_rate") <= real.getAs[Double]("uniform_bound"))
  }

  test("q_brown_forsythe: equal spreads read unremarkable, a 10x spread group rejects") {
    val same = eventsDir(Seq("a", "b", "c"), 30, (_, _) => 40,
      value = (_, i) => 100 + (i % 21).toDouble - 10)
    val spread = eventsDir(Seq("a", "b", "c"), 30, (_, _) => 40,
      value = (t, i) => if (t == "c") 100 + ((i % 21).toDouble - 10) * 10
                        else 100 + (i % 21).toDouble - 10)
    val fSame = run("q_brown_forsythe", same).head().getAs[Double]("f_stat")
    val fSpread = run("q_brown_forsythe", spread).head().getAs[Double]("f_stat")
    assert(fSame < 5, s"equal spreads should not reject, F = $fSame")
    assert(fSpread > 100, s"10x spread should reject loudly, F = $fSpread")
  }

  test("q_simpson_diversity: all-unique tokens read 1, a single repeated token reads 0") {
    val dir = docsDir(Seq(
      (0L, (0 until 50).map(i => s"u$i").mkString(" "), "unique"),
      (1L, (0 until 50).map(_ => "same").mkString(" "), "mono")))
    val m = run("q_simpson_diversity", dir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("simpson")).toMap
    assert(m("unique") === 1.0)
    assert(m("mono") === 0.0)
  }

  test("q_js_divergence: a source matching the corpus distribution scores zero") {
    // two sources with IDENTICAL token streams: each source's
    // distribution equals the corpus distribution ⇒ JS = 0 for both
    val text = (0 until 60).map(i => s"w${i % 10}").mkString(" ")
    val dir = docsDir(Seq((0L, text, "s1"), (1L, text, "s2")))
    run("q_js_divergence", dir).collect().foreach { r =>
      assert(r.getAs[Double]("js") === 0.0, s"${r.getAs[String]("source")} drifted")
    }
    // and a disjoint-vocabulary source scores strictly positive on real data
    val real = run("q_js_divergence", sfDir)
    assert(real.filter(col("js") < 0).isEmpty, "JS is non-negative")
  }

  test("q_heaps_fit: an all-unique-token corpus fits beta = 1 exactly") {
    // every token globally unique ⇒ V(n) = n ⇒ log-log slope 1, ln K 0
    val docs = (0L until 64L).map(i =>
      (i, (0 until 10).map(j => s"t${i}_$j").mkString(" "), "s"))
    val r = run("q_heaps_fit", docsDir(docs)).head()
    assert(r.getAs[Double]("beta") === 1.0)
    assert(math.abs(r.getAs[Double]("ln_k")) < 1e-6)
    // real corpora grow sub-linearly (the sf0.001 generator's vocab
    // saturates within the smallest prefix, so beta can be exactly 0)
    val real = run("q_heaps_fit", sfDir).head()
    assert(real.getAs[Double]("beta") >= 0 && real.getAs[Double]("beta") < 1)
  }

  test("q_distinct_ngrams: templated, diverse and single-token sources read their exact ratios") {
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val dir = docsDir(Seq(
      (0L, "a a a a", "mono"),   // 4 tokens / 1 type; 3 bigrams all "a a"
      (1L, "w x y z", "uniq"),   // all distinct both levels
      (2L, "solo", "single")))   // no bigram exists
    val m = run("q_distinct_ngrams", dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(m("mono").getAs[Long]("n_tokens") === 4L)
    assert(m("mono").getAs[Long]("uniq_1") === 1L)
    assert(m("mono").getAs[Long]("n_bigrams") === 3L)
    assert(m("mono").getAs[Long]("uniq_2") === 1L)
    assert(m("mono").getAs[Double]("distinct_1") === 0.25)
    assert(m("mono").getAs[Double]("distinct_2") === r6(1.0 / 3))
    assert(m("uniq").getAs[Double]("distinct_1") === 1.0)
    assert(m("uniq").getAs[Double]("distinct_2") === 1.0)
    assert(m("single").getAs[Long]("n_bigrams") === 0L)
    assert(m("single").isNullAt(m("single").fieldIndex("distinct_2")))
  }

  test("q_ansari_bradley: tails vs middle reads the closed-form score and z") {
    import spark.implicits._
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // purchases in the tails {1, 4}, clicks in the middle {2, 3}:
    // scores 1,2,2,1 ⇒ AB = 2; μ = 2·6/4 = 3, σ² = 1/3 ⇒ z = −√3
    val r = run("q_ansari_bradley", valuedEventsDir("diag_ab",
      Seq((1L, "purchase", 1.0), (2L, "click", 2.0),
        (3L, "click", 3.0), (4L, "purchase", 4.0)))).head()
    assert(r.getAs[Long]("n1") === 2L && r.getAs[Long]("n2") === 2L)
    assert(r.getAs[Double]("ab") === 2.0)
    assert(r.getAs[Double]("z") === r6(-math.sqrt(3.0)))
    // one all-tied run: every observation takes the average score
    // 6/4 ⇒ AB = 3 = μ exactly ⇒ z = 0
    val rt = run("q_ansari_bradley", valuedEventsDir("diag_ab_tied",
      Seq((1L, "purchase", 1.0), (2L, "click", 1.0),
        (3L, "click", 1.0), (4L, "purchase", 1.0)))).head()
    assert(rt.getAs[Double]("ab") === 3.0)
    assert(rt.getAs[Double]("z") === 0.0)
  }

  test("q_brunner_munzel: tails-vs-middle and separated fixtures read the closed forms") {
    import spark.implicits._
    // purchases {1, 4} (tails), clicks {2, 3}: R̄1 = R̄2 = 2.5 ⇒ W = 0;
    // S1² = 2, S2² = 0 ⇒ df = V²/((n1·S1²)²/(n1−1)) = 16/16 = 1;
    // p_hat = (2.5 − 1.5)/2 = 0.5
    val r = run("q_brunner_munzel", valuedEventsDir("diag_bm",
      Seq((1L, "purchase", 1.0), (2L, "click", 2.0),
        (3L, "click", 3.0), (4L, "purchase", 4.0)))).head()
    assert(r.getAs[Long]("n1") === 2L && r.getAs[Long]("n2") === 2L)
    assert(r.getAs[Double]("p_hat") === 0.5)
    assert(r.getAs[Double]("w") === 0.0)
    assert(r.getAs[Double]("df") === 1.0)
    // complete separation {1,2} vs {3,4}: both rank variances vanish ⇒
    // W and df are NULL (degenerate), p_hat reads 1 exactly
    val rs = run("q_brunner_munzel", valuedEventsDir("diag_bm_sep",
      Seq((1L, "purchase", 1.0), (2L, "purchase", 2.0),
        (3L, "click", 3.0), (4L, "click", 4.0)))).head()
    assert(rs.getAs[Double]("p_hat") === 1.0)
    assert(rs.isNullAt(rs.fieldIndex("w")))
    assert(rs.isNullAt(rs.fieldIndex("df")))
  }

  test("q_key_candidates: planted duplicates and nulls read their exact uniqueness") {
    import spark.implicits._
    val dir = tempDir("diag_keycand")
    Seq(
      (1L, 10L, "O", 100.0, "1995-01-01 00:00:00", Some("1-URGENT")),
      (2L, 10L, "O", 100.0, "1996-01-01 00:00:00", None),
      (3L, 20L, "F", 200.0, "1995-01-01 00:00:00", Some("1-URGENT")))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "ds", "o_orderpriority")
      .withColumn("o_orderdate", to_timestamp(col("ds"))).drop("ds")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val m = run("q_key_candidates", dir).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    def chk(c: String, nNull: Long, nDist: Long, uniq: Double, isKey: Long) = {
      assert(m(c).getAs[Long]("n_rows") === 3L, s"$c rows")
      assert(m(c).getAs[Long]("n_null") === nNull, s"$c nulls")
      assert(m(c).getAs[Long]("n_distinct") === nDist, s"$c distinct")
      assert(m(c).getAs[Double]("uniqueness") === uniq, s"$c uniqueness")
      assert(m(c).getAs[Long]("is_key") === isKey, s"$c is_key")
    }
    chk("o_orderkey", 0L, 3L, 1.0, 1L)
    chk("o_custkey", 0L, 2L, r6(2.0 / 3), 0L)
    chk("o_orderstatus", 0L, 2L, r6(2.0 / 3), 0L)
    chk("o_totalprice", 0L, 2L, r6(2.0 / 3), 0L)
    chk("o_orderdate", 0L, 2L, r6(2.0 / 3), 0L)
    chk("o_orderpriority", 1L, 1L, 0.5, 0L)
    assert(m.size === 6)
  }

  test("q_chao1: the hapax/dis-legomena ratio reads the closed-form estimate") {
    // "a a b c" + "a d": tf a=3, b=c=d=1 ⇒ N=6, V=4, f1=3, f2=0
    // ⇒ chao1 = 4 + 3·2/(2·1) = 7.0, coverage = 1 − 3/6 = 0.5
    val dir = docsDir(Seq((0L, "a a b c", "s"), (1L, "a d", "s")))
    val r = run("q_chao1", dir).head()
    assert(r.getAs[Long]("n_tokens") === 6L)
    assert(r.getAs[Long]("n_types") === 4L)
    assert(r.getAs[Long]("f1") === 3L)
    assert(r.getAs[Long]("f2") === 0L)
    assert(r.getAs[Double]("chao1") === 7.0)
    assert(r.getAs[Double]("coverage") === 0.5)
    // a fully saturated vocabulary (no hapaxes) estimates chao1 = V,
    // coverage = 1 — nothing left unseen
    val sat = docsDir(Seq((0L, "x x y y", "s")))
    val r2 = run("q_chao1", sat).head()
    assert(r2.getAs[Double]("chao1") === 2.0)
    assert(r2.getAs[Double]("coverage") === 1.0)
  }

  test("q_word_entropy: a deterministic chain reads exactly 0; branching replays the lattice") {
    // "x y x y": every first word has ONE continuation ⇒ H(W2|W1) = 0
    val det = run("q_word_entropy", docsDir(Seq((0L, "x y x y", "s")))).head()
    assert(det.getAs[Long]("n_bigrams") === 3L)
    assert(det.getAs[Double]("h_cond") === 0.0)
    // "a b a b a c": c12 = {(a,b):2, (b,a):2, (a,c):1}, c1 = {a:3, b:2}
    // — replicate the per-cell 1e-9 lattice fold independently
    val r = run("q_word_entropy", docsDir(Seq((0L, "a b a b a c", "s")))).head()
    val cells = Seq((2L, 3L), (2L, 2L), (1L, 3L)) // (c12, c1)
    val n = 5.0
    val h9 = cells.map { case (c, c1) =>
      math.floor(c / n * math.log(c1.toDouble / c) * 1e9 + 0.5).toLong
    }.sum
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getAs[Long]("n_bigrams") === 5L)
    assert(r.getAs[Long]("n_first_words") === 2L)
    assert(r.getAs[Double]("h_cond") === r6(h9 / 1e9))
    assert(r.getAs[Double]("evenness") === r6(h9 / 1e9 / math.log(2.0)))
  }

  test("q_yule_k: a known tf spectrum reads the closed-form constant") {
    // "a a b c": tf a=2, b=c=1 ⇒ N=4, m2=6 ⇒ K = 1e4·(6−4)/16 = 1250
    val r = run("q_yule_k", docsDir(Seq((0L, "a a b c", "s")))).head()
    assert(r.getAs[Long]("n_tokens") === 4L)
    assert(r.getAs[Long]("n_types") === 3L)
    assert(r.getAs[Long]("m2") === 6L)
    assert(r.getAs[Double]("yule_k") === 1250.0)
    // all-unique tokens repeat nothing: m2 = N ⇒ K = 0 exactly
    val uniq = docsDir(Seq((0L, (0 until 20).map(i => s"u$i").mkString(" "), "s")))
    assert(run("q_yule_k", uniq).head().getAs[Double]("yule_k") === 0.0)
  }

  test("q_cross_doc_ngram: identical docs share everything, unique docs nothing") {
    val shared = (0 until 12).map(j => s"c$j").mkString(" ")
    val dir = docsDir(
      (0L until 4L).map(i => (i, shared, "dup")) ++
        (4L until 8L).map(i => (i, (0 until 12).map(j => s"u${i}_$j").mkString(" "), "uniq")))
    val m = run("q_cross_doc_ngram", dir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("dup_share")).toMap
    assert(m("dup") === 1.0)
    assert(m("uniq") === 0.0)
  }

  test("q_minhash_est_err: identical documents land in the exact-agreement corner cell") {
    // two identical docs: every min-hash matches (est 8) and Jaccard is
    // 1.0 (decile clamped to 9) — the calibration grid's perfect corner
    val text = (0 until 20).map(j => s"w$j").mkString(" ")
    val dir = docsDir(Seq((0L, text, "s"), (1L, text, "s")))
    val rows = run("q_minhash_est_err", dir).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("est_matches") === 8L)
    assert(rows.head.getAs[Long]("jac_decile") === 9L)
    assert(rows.head.getAs[Long]("n_pairs") === 1L)
    // on real data the grid is diagonal-heavy: mean est octile must
    // rise with the jaccard decile across populated deciles
    val real = run("q_minhash_est_err", sfDir).collect()
    val byDecile = real.groupBy(_.getAs[Long]("jac_decile")).map { case (dq, rs) =>
      dq -> rs.map(r => r.getAs[Long]("est_matches").toDouble * r.getAs[Long]("n_pairs")).sum /
        rs.map(_.getAs[Long]("n_pairs")).sum
    }
    if (byDecile.size >= 2) {
      val lo = byDecile.minBy(_._1); val hi = byDecile.maxBy(_._1)
      assert(hi._2 >= lo._2, s"estimator not monotone in truth: $byDecile")
    }
  }

  test("q_dup_cluster_sizes conserves the corpus and matches q_dup_clusters") {
    // Σ cluster_size·n_clusters = |documents| exactly, and the non-
    // singleton rows must re-aggregate q_dup_clusters' per-doc view
    val hist = run("q_dup_cluster_sizes", sfDir).collect()
    val total = hist.map(r => r.getAs[Long]("n_docs")).sum
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    assert(total === nDocs, s"histogram covers $total of $nDocs docs")
    val fromClusters = run("q_dup_clusters", sfDir)
      .groupBy("cluster_size").agg(countDistinct("cluster_id").as("n"))
      .collect().map(r => r.getAs[Long]("cluster_size") -> r.getAs[Long]("n")).toMap
    hist.filter(_.getAs[Long]("cluster_size") > 1).foreach { r =>
      assert(fromClusters(r.getAs[Long]("cluster_size")) === r.getAs[Long]("n_clusters"))
    }
  }

  test("q_length_profile percentiles are ordered crossings of the real distribution") {
    val rows = run("q_length_profile", sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, mx) = (r.getAs[Long]("p50_chars"), r.getAs[Long]("p90_chars"),
        r.getAs[Long]("max_chars"))
      assert(p50 <= p90 && p90 <= mx, s"${r.getAs[String]("source")}: $p50/$p90/$mx")
      // p50 really is the first crossing: at least half the source's
      // docs sit at or under it, and strictly fewer than half under it
      val src = r.getAs[String]("source")
      val docs = Tables.load(spark, sfDir, "documents").filter(col("source") === src)
      val n = docs.count()
      assert(docs.filter(col("n_chars") <= p50).count() * 2 >= n)
      assert(docs.filter(col("n_chars") < p50).count() * 2 < n)
    }
  }

  test("q_audience_overlap bounds: shared <= min users, jaccard in (0, 1]") {
    val rows = run("q_audience_overlap", sfDir).collect()
    // 5 event types co-engaged by 15 users at sf0.001 → all 10 pairs
    assert(rows.length === 10)
    rows.foreach { r =>
      val (u1, u2, sh) = (r.getAs[Long]("users_1"), r.getAs[Long]("users_2"),
        r.getAs[Long]("shared"))
      assert(sh <= math.min(u1, u2))
      val j = r.getAs[Double]("jaccard")
      assert(j > 0 && j <= 1.0)
      assert(math.abs(j - sh.toDouble / (u1 + u2 - sh)) < 1e-4)
    }
  }

  test("edge guards: single-state entropy efficiency is NULL, tiny-corpus heaps stays finite") {
    // one user, one event type: ln(k) = 0 — efficiency must be NULL,
    // never NaN (the q_cat_entropy lesson, applied on arrival)
    val dir = tempDir("diag_single_state")
    import spark.implicits._
    (0 until 50).map(i => (i.toLong, 0L, "view"))
      .toDF("event_id", "user_id", "event_type")
      .select(col("event_id"),
        (to_timestamp(lit("2024-01-01 00:00:00")) +
          make_dt_interval(lit(0), lit(0), col("event_id"), lit(0))).as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = run("q_entropy_rate", dir).head()
    assert(r.getAs[Long]("k_states") === 1L)
    assert(r.isNullAt(r.fieldIndex("efficiency")), "ln(1)=0 division must yield NULL")
    // a 4-doc corpus: every prefix threshold clamps to >= 1 doc, so no
    // ln(0) enters the Heaps fit (Spark NULL vs DuckDB -inf divergence)
    val tiny = docsDir((0L until 4L).map(i =>
      (i, (0 until 6).map(j => s"t${i}_$j").mkString(" "), "s")))
    val h = run("q_heaps_fit", tiny).head()
    assert(!h.isNullAt(h.fieldIndex("beta")) &&
      !h.getAs[Double]("beta").isNaN && !h.getAs[Double]("beta").isInfinite)
  }

  test("q_new_returning: day one is all-new, totals conserve the user base") {
    val rows = run("q_new_returning", sfDir).collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(_.getAs[String]("day"))
    assert(first.getAs[Long]("new_users") === first.getAs[Long]("active_users"),
      "every first-day active is by definition new")
    assert(first.getAs[Long]("returning_users") === 0L)
    // Σ new over all days = |distinct users| exactly
    val totalNew = rows.map(_.getAs[Long]("new_users")).sum
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(totalNew === users)
    rows.foreach { r =>
      assert(r.getAs[Long]("active_users") ===
        r.getAs[Long]("new_users") + r.getAs[Long]("returning_users"))
    }
  }

  test("q_dormancy covers every user once with a zero-staleness bucket") {
    val rows = run("q_dormancy", sfDir).collect()
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum === users)
    // someone was active on the horizon day by definition of max
    assert(rows.exists(r => r.getAs[Long]("staleness_days") === 0L &&
      r.getAs[Long]("n_users") > 0))
    assert(rows.forall(_.getAs[Long]("staleness_days") >= 0))
  }

  test("q_hill_tail recovers a known Pareto exponent from synthetic tails") {
    // x = round(100 / u^(1/2)) draws follow a Pareto with alpha = 2;
    // the Hill estimator over the top-100 should land near it
    val dir = tempDir("diag_pareto")
    import spark.implicits._
    val n = 20000
    val xs = (0 until n).map { i =>
      val u = (mix(7, i, 1000000) + 1) / 1000001.0
      (i.toLong, 100.0 / math.pow(u, 0.5))
    }
    xs.toDF("event_id", "value")
      .select(col("event_id"),
        (to_timestamp(lit("2024-01-01 00:00:00")) +
          make_dt_interval(lit(0), lit(0), col("event_id") % 10000, lit(0))).as("ts"),
        (col("event_id") % 7).as("user_id"), lit("purchase").as("event_type"),
        col("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = run("q_hill_tail", dir).head()
    val alpha = r.getAs[Double]("alpha_hat")
    assert(alpha > 1.5 && alpha < 2.6, s"Hill estimate $alpha should sit near alpha = 2")
    // and the light-tailed real data reads heavier alpha than the Pareto
    val real = run("q_hill_tail", sfDir).collect()
    real.foreach(r => assert(r.getAs[Double]("alpha_hat") > 0))
  }

  test("q_lang_confusion re-aggregates q_lang_id's per-doc predictions exactly") {
    val cm = run("q_lang_confusion", sfDir).collect()
      .map(r => (r.getAs[String]("true_lang"), r.getAs[String]("pred_lang")) ->
        r.getAs[Long]("n")).toMap
    val perDoc = run("q_lang_id", sfDir).collect()
      .groupBy(r => (r.getAs[String]("true_lang"), r.getAs[String]("pred_lang")))
      .map { case (k, rs) => k -> rs.length.toLong }
    assert(cm === perDoc, "confusion cells must equal the per-doc prediction rollup")
    // shares are per-true-lang recall fractions
    run("q_lang_confusion", sfDir).collect()
      .groupBy(_.getAs[String]("true_lang")).foreach { case (l, rs) =>
        val s = rs.map(_.getAs[Double]("share_of_true")).sum
        assert(math.abs(s - 1.0) < 1e-3, s"$l recall shares sum to $s")
      }
  }

  test("q_shingle_df_profile conserves the shingle catalog and respects the corpus guard") {
    val rows = run("q_shingle_df_profile", sfDir).collect()
    val totalShingles = rows.map(_.getAs[Long]("n_shingles")).sum
    val distinctShingles = ops.TextPipeline.shingles(spark, sfDir)
      .select("lang", "shingle").distinct().count()
    assert(totalShingles === distinctShingles)
    // the observability curve must agree with SkewSpec's cap guard:
    // max df strictly under the 128 candidate cap on shipped corpora
    assert(rows.map(_.getAs[Long]("df")).max < 128L)
    rows.foreach { r =>
      val (df, n, w) = (r.getAs[Long]("df"), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("pair_work"))
      assert(w === n * df * (df - 1) / 2)
    }
  }

  test("q_ship_lag percentiles are ordered first-crossings; q_window_funnel nests under q_funnel") {
    run("q_ship_lag", sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("p50_days") <= r.getAs[Long]("p95_days") &&
        r.getAs[Long]("p95_days") <= r.getAs[Long]("max_days"))
    }
    // windowed depth-k users can never exceed the unbounded funnel's
    // stage-k users (the 24h constraint only removes chains)
    val wf = run("q_window_funnel", sfDir).collect()
      .map(r => r.getAs[Long]("depth") -> r.getAs[Long]("n_users")).toMap
    val unbounded = run("q_funnel", sfDir).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    def atLeast(d: Long) = wf.filter(_._1 >= d).values.sum
    assert(atLeast(1) <= unbounded("1_view"))
    assert(atLeast(2) <= unbounded("2_click"))
    assert(atLeast(3) <= unbounded("3_purchase"))
    // and every user is accounted for exactly once
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(wf.values.sum === users)
  }

  test("q_token_len_hist shares sum to one per lang; q_stopword_profile mass is sane") {
    val hist = run("q_token_len_hist", sfDir).collect()
      .groupBy(_.getAs[String]("lang"))
    hist.foreach { case (lang, rs) =>
      val s = rs.map(_.getAs[Double]("share")).sum
      assert(math.abs(s - 1.0) < 1e-3, s"$lang shares sum to $s")
    }
    run("q_stopword_profile", sfDir).collect().foreach { r =>
      val s = r.getAs[Double]("top10_share")
      assert(s > 0 && s <= 1.0)
      assert(r.getAs[String]("top_token").nonEmpty)
    }
  }

  test("audit trio: planted orphans, FD breaks and nulls read their exact counts") {
    import spark.implicits._
    val dir = tempDir("diag_audit")
    // lineitem: order 3 and part 7 are orphans; order 1 uses two
    // suppliers (the one FD break); supplier keys {5, 6} all resolve
    Seq((1L, 1L, 5L), (1L, 2L, 6L), (2L, 7L, 5L), (3L, 1L, 5L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .withColumn("l_quantity", lit(1.0)).withColumn("l_returnflag", lit("N"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 10L), (2L, 99L)).toDF("o_orderkey", "o_custkey")
      .withColumn("o_orderstatus", lit("O")).withColumn("o_totalprice", lit(1.0))
      .withColumn("o_orderdate", to_timestamp(lit("1997-01-01 00:00:00")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(Tuple1(10L)).toDF("c_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // part 3 is DUPLICATED — the dirty-parent case the RI probe must
    // not fan out on (counts below stay keyed, not row-multiplied)
    Seq((1L, "A", "T1"), (2L, "A", "T2"), (3L, "B", "T3"), (3L, "B", "T3"))
      .toDF("p_partkey", "p_brand", "p_type")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq(Tuple1(5L), Tuple1(6L)).toDF("s_suppkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    // events: user 1 sees two types (FD break); one NULL props row
    Seq((1L, 1L, "click", Some("{}")), (2L, 1L, "view", None),
      (3L, 2L, "click", Some("{}")))
      .toDF("event_id", "user_id", "event_type", "props")
      .withColumn("ts", to_timestamp(lit("2024-01-02 08:00:00")))
      .withColumn("value", lit(1.0))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    // documents: one whitespace-only text (a blank, not a null)
    Seq((1L, "real words here", "en", "src0"), (2L, "  ", "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

    val ri = run("q_ri_audit", dir).collect()
      .map(r => r.getAs[String]("relation") -> r).toMap
    def riRow(rel: String) = {
      val r = ri(rel)
      (r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"),
        r.getAs[Long]("orphan_rows"), r.getAs[Long]("orphan_keys"))
    }
    assert(riRow("lineitem.l_orderkey->orders") === ((4L, 3L, 1L, 1L)))
    assert(riRow("lineitem.l_partkey->part") === ((4L, 3L, 1L, 1L)))
    assert(riRow("lineitem.l_suppkey->supplier") === ((4L, 2L, 0L, 0L)))
    assert(riRow("orders.o_custkey->customer") === ((2L, 2L, 1L, 1L)))
    assert(ri("orders.o_custkey->customer").getAs[Double]("orphan_rate") === 0.5)

    val fd = run("q_fd_violations", dir).collect()
      .map(r => r.getAs[String]("fd") -> r).toMap
    def fdRow(k: String) = {
      val r = fd(k)
      (r.getAs[Long]("n_lhs"), r.getAs[Long]("n_lhs_violating"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("n_violating_rows"))
    }
    assert(fdRow("part.p_partkey->p_brand") === ((3L, 0L, 4L, 0L)))
    assert(fd("part.p_partkey->p_brand").getAs[Double]("fd_strength") === 1.0)
    assert(fdRow("part.p_brand->p_type") === ((2L, 1L, 4L, 1L)))
    assert(fd("part.p_brand->p_type").getAs[Double]("fd_strength") === 0.75)
    assert(fdRow("lineitem.l_orderkey->l_suppkey") === ((3L, 1L, 4L, 1L)))
    assert(fdRow("events.user_id->event_type") === ((2L, 1L, 3L, 1L)))

    val co = run("q_completeness", dir).collect()
      .map(r => (r.getAs[String]("tbl"), r.getAs[String]("col_name")) -> r).toMap
    val props = co(("events", "props"))
    assert(props.getAs[Long]("n_null") === 1L)
    assert(props.getAs[Double]("completeness") === r6(2.0 / 3))
    val text = co(("documents", "text"))
    assert(text.getAs[Long]("n_null") === 0L)
    assert(text.getAs[Long]("n_blank") === 1L)
    assert(co(("lineitem", "l_quantity")).getAs[Long]("n_null") === 0L)
    assert(co.size === 14)
  }

  test("q_matrix_profile: planted repeat + spike read the closed-form motif and discord") {
    // counts [1,2,3,5, 1,2,3,5, 5,5,50,5, 5,5]: windows 0 and 4 are the
    // identical (1,2,3) — motif d2 = 0 under the (d2, i, j) tie order;
    // window 9 = (5,50,5) is the discord, its nearest admissible
    // neighbor being window 6 = (3,5,5) at 4 + 45^2 + 0 = 2029.
    val c = Array(1, 2, 3, 5, 1, 2, 3, 5, 5, 5, 50, 5, 5, 5)
    val dir = eventsDir(Seq("wave"), c.length, (_, d) => c(d))
    val r = run("q_matrix_profile", dir).head()
    assert(r.getAs[Long]("n_profiled") === 12L)
    assert(r.getAs[Long]("motif_i") === 0L)
    assert(r.getAs[Long]("motif_j") === 4L)
    assert(r.getAs[Long]("motif_d2") === 0L)
    assert(r.getAs[Long]("discord_i") === 9L)
    assert(r.getAs[Long]("discord_d2") === 2029L)
  }

  test("q_holt_winters: the gapped fixture replays the exact recursion by hand") {
    // counts 10, 20, 30 on days 0-2, a 5-day gap, then 12 on day 8
    // (calendar phase 1 — must reuse day 1's seasonal slot 2.5, not a
    // sequential index): every level/trend/season below is the hand
    // recursion at alpha=beta=gamma=0.5, all exact binary fractions.
    val c = Array(10, 20, 30, 0, 0, 0, 0, 0, 12)
    val dir = eventsDir(Seq("hw"), c.length, (_, d) => c(d))
    val rows = run("q_holt_winters", dir).collect()
      .map(r => r.getAs[Long]("day_idx") -> r).toMap
    assert(rows.keySet === Set(0L, 1L, 2L, 8L))
    def chk(d: Long, l: Double, b: Double, s: Double, f: Double): Unit = {
      assert(rows(d).getAs[Double]("level") === l, s"level d$d")
      assert(rows(d).getAs[Double]("trend") === b, s"trend d$d")
      assert(rows(d).getAs[Double]("season") === s, s"season d$d")
      assert(rows(d).getAs[Double]("forecast") === f, s"forecast d$d")
    }
    chk(0L, 10.0, 0.0, 0.0, 10.0)
    chk(1L, 15.0, 2.5, 2.5, 17.5)
    chk(2L, 23.75, 5.625, 3.125, 29.375)
    chk(8L, 19.4375, 0.65625, -2.46875, 23.21875)
  }

  test("q_kendall_w: perfect and reversed daily orderings read W = 1 and W = 0") {
    // perfect: A outranks B on all 3 days (no ties) -> W = 1;
    // reversed: A > B on day 0, B > A on day 1 -> rank sums equal, W = 0
    val d1 = eventsDir(Seq("A", "B"), 3, (t, d) => if (t == "A") d + 2 else 1)
    val r1 = run("q_kendall_w", d1).head()
    assert(r1.getAs[Long]("n_days") === 3L)
    assert(r1.getAs[Long]("n_types") === 2L)
    assert(r1.getAs[Double]("w") === 1.0)
    val d2 = eventsDir(Seq("A", "B"), 2,
      (t, d) => if ((t == "A") == (d == 0)) 5 else 1)
    val r2 = run("q_kendall_w", d2).head()
    assert(r2.getAs[Double]("w") === 0.0)
  }

  test("q_burst_detect: a planted spike replays the two-state filter by hand") {
    // flat [5x7] never bursts; spike [5,5,5,50,50,5,5] bursts exactly
    // on the two 50-days per the independent plain-Scala replay of
    // the forward recursion.
    def replay(ys: Seq[Int]): Seq[Long] = {
      val l0 = ys.sum.toDouble / ys.length
      val ll0 = math.log(l0); val ll1 = math.log(2 * l0); val l1 = 2 * l0
      var c0 = 0.0; var c1 = 0.0; var first = true
      ys.map { y =>
        if (first) { c0 = l0 - y * ll0; c1 = 1.0 + l1 - y * ll1; first = false }
        else {
          val n0 = math.min(c0, c1 + 1.0) + (l0 - y * ll0)
          val n1 = math.min(c1, c0 + 1.0) + (l1 - y * ll1)
          c0 = n0; c1 = n1
        }
        if (c1 < c0) 1L else 0L
      }
    }
    val flat = Array(5, 5, 5, 5, 5, 5, 5)
    val spike = Array(5, 5, 5, 50, 50, 5, 5)
    val dir = eventsDir(Seq("flat", "spike"), 7,
      (t, d) => if (t == "flat") flat(d) else spike(d))
    val rows = run("q_burst_detect", dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day_idx")) -> r).toMap
    val fExp = replay(flat.toIndexedSeq); val sExp = replay(spike.toIndexedSeq)
    (0 until 7).foreach { d =>
      assert(rows(("flat", d.toLong)).getAs[Long]("burst") === fExp(d), s"flat d$d")
      assert(rows(("spike", d.toLong)).getAs[Long]("burst") === sExp(d), s"spike d$d")
    }
    assert(sExp === Seq(0L, 0L, 0L, 1L, 1L, 0L, 0L), "the spike days and only they burst")
    assert(rows(("spike", 0L)).getAs[Long]("n_burst_days") === 2L)
    assert(rows(("flat", 0L)).getAs[Long]("n_burst_days") === 0L)
  }

  test("q_gap_hist: planted gaps land in their exact bit-length bands") {
    import spark.implicits._
    // one user at epoch offsets 0, 1, 4, 1000 → gaps 1, 3, 996 →
    // bands len(bin(g+1))-1 = 1, 2, 9; shares 1/3 each
    val dir = tempDir("diag_gaps")
    Seq(0L, 1L, 4L, 1000L).zipWithIndex.map { case (off, i) => (i.toLong, off) }
      .toDF("event_id", "off")
      .select(col("event_id"),
        (to_timestamp(lit("2024-01-01 00:00:00")) +
          make_dt_interval(lit(0), lit(0), lit(0), col("off"))).as("ts"),
        lit(1L).as("user_id"), lit("click").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val rows = run("q_gap_hist", dir).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n_gaps"), r.getAs[Double]("cum_share"))).toMap
    assert(rows.keySet === Set(1L, 2L, 9L))
    assert(rows(1L) === ((1L, r6(1.0 / 3))))
    assert(rows(2L) === ((1L, r6(2.0 / 3))))
    assert(rows(9L) === ((1L, 1.0)))
  }
}
