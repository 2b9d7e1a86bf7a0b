package graft

import org.apache.spark.sql.functions._

/** Ground-truth semantics for the round-13 curation + series-screening
  * operators: each runs against a SYNTHETIC corpus whose right answer
  * is known in closed form — evidence independent of the DuckDB oracle
  * (which shares the formula tree by design; these tests share
  * nothing).
  */
class CurationSeriesSpec extends SparkSpec {

  /** Synthetic events dir whose per-type daily counts follow `f`. */
  private def eventsDir(types: Seq[String], days: Int,
                        f: (String, Int) => Int): String = {
    val dir = tempDir("cs_events")
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
        (to_timestamp(lit("2024-01-01 00:00:00")) +
          make_dt_interval(col("d"), col("i") % 24, lit(0), lit(0))).as("ts"),
        (col("i") % 7).cast("long").as("user_id"),
        col("event_type"),
        (col("i") % 100).cast("double").as("value"),
        lit("""{"k": 1}""").as("props"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Synthetic documents dir from explicit (doc_id, text, source). */
  private def docsDir(docs: Seq[(Long, String, String)]): String = {
    val dir = tempDir("cs_docs")
    import spark.implicits._
    docs.toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def q(name: String, dir: String) = SparkEntry.queries(name)(spark, dir)

  // ---- series screening ---------------------------------------------------

  // alternating: 9 days of 10,20,10,... — every delta flips sign;
  // trending: strictly increasing — one long up-run, no turning points
  private def altTrendDir(): String = eventsDir(Seq("alt", "trend"), 9, {
    case ("alt", d) => if (d % 2 == 0) 10 else 20
    case (_, d) => d + 1
  })

  test("q_runs_test: alternating signs maximize runs, a monotone trend collapses to one") {
    val rows = q("q_runs_test", altTrendDir()).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val alt = rows("alt")
    assert(alt.getAs[Long]("n_up") === 4L && alt.getAs[Long]("n_down") === 4L)
    assert(alt.getAs[Long]("n_runs") === 8L)
    // z = (8 − (2·4·4/8 + 1)) / sqrt(2·16·(32−8) / (8²·7)) = 3/sqrt(12/7)
    assert(math.abs(alt.getAs[Double]("z") - 3.0 / math.sqrt(12.0 / 7.0)) < 1e-5)
    val tr = rows("trend")
    assert(tr.getAs[Long]("n_up") === 8L && tr.getAs[Long]("n_down") === 0L)
    assert(tr.getAs[Long]("n_runs") === 1L)
    assert(tr.isNullAt(tr.fieldIndex("z")), "one-sided series has sigma=0: z must be NULL")
  }

  test("q_turning_points: alternation turns every interior day, a trend turns none") {
    val rows = q("q_turning_points", altTrendDir()).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rows("alt").getAs[Long]("n_turning") === 7L) // all 7 interior days
    assert(rows("trend").getAs[Long]("n_turning") === 0L)
    // E[T] = 2(9−2)/3; z = (7 − E)/sqrt((16·9−29)/90)
    val e = 2.0 * 7 / 3
    assert(math.abs(rows("alt").getAs[Double]("expected") - e) < 1e-5)
    assert(math.abs(rows("alt").getAs[Double]("z") -
      (7 - e) / math.sqrt(115.0 / 90)) < 1e-5)
  }

  test("q_poisson_dispersion: constant series has zero dispersion; 1,2,3 gives D=1/2") {
    val dir = eventsDir(Seq("const", "steps"), 3, {
      case ("const", _) => 7
      case (_, d) => d + 1 // 1, 2, 3
    })
    val rows = q("q_poisson_dispersion", dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rows("const").getAs[Double]("mean") === 7.0)
    assert(rows("const").getAs[Double]("dispersion") === 0.0)
    // mean 2, sample var 1 → D = 0.5, chi2 = (n−1)·D = 1
    assert(rows("steps").getAs[Double]("mean") === 2.0)
    assert(rows("steps").getAs[Double]("dispersion") === 0.5)
    assert(rows("steps").getAs[Double]("chi2") === 1.0)
  }

  test("q_grubbs: locates the planted spike day; constant series yields NULL") {
    val dir = eventsDir(Seq("spike", "flat"), 5, {
      case ("spike", 3) => 50
      case ("spike", _) => 5
      case _ => 9
    })
    val rows = q("q_grubbs", dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val sp = rows("spike")
    assert(sp.getAs[Long]("outlier_day") === 3L)
    assert(sp.getAs[Long]("outlier_count") === 50L)
    // n=5, S=70, SS=2600: G = (50−14)/sqrt((5·2600−70²)/(5·4)) = 36/sqrt(405)
    assert(math.abs(sp.getAs[Double]("g") - 36.0 / math.sqrt(405.0)) < 1e-5)
    val fl = rows("flat")
    assert(fl.isNullAt(fl.fieldIndex("g")), "constant series: G must be NULL")
  }

  test("q_page_hinkley: a level shift accumulates drift; a constant series reads zero") {
    val dir = eventsDir(Seq("shift", "flat"), 10, {
      case ("shift", d) => if (d < 5) 10 else 30
      case _ => 4
    })
    val rows = q("q_page_hinkley", dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rows("flat").getAs[Double]("ph") === 0.0)
    // independent replication of the exact integer-lattice recurrence
    val ys = Seq.fill(5)(10L) ++ Seq.fill(5)(30L)
    var cn = 0L; var cs = 0L; var m6 = 0L; var mn = 0L; var ph6 = 0L
    ys.foreach { y =>
      cn += 1; cs += y
      m6 += math.floor((y - cs.toDouble / cn) * 1e6 + 0.5).toLong
      mn = math.min(mn, m6)
      ph6 = math.max(ph6, m6 - mn)
    }
    assert(math.abs(rows("shift").getAs[Double]("ph") - ph6 / 1e6) < 1e-5)
    assert(rows("shift").getAs[Double]("ph") > 10.0,
      "a 10→30 level shift must accumulate a large PH statistic")
    assert(rows("shift").getAs[Long]("drift_day") === 9L,
      "monotone post-shift deviations peak at the last day")
  }

  // ---- curation decisions -------------------------------------------------

  test("q_dedup_keepers: longest doc wins its cluster, doc_id breaks exact ties") {
    // docs 0/1: IDENTICAL text → same signature, guaranteed candidate;
    // equal n_chars → keeper = min id = 0. docs 20/21: same DISTINCT
    // shingle set (cyclic "a b" text — extending it adds no new
    // distinct shingle) but 21 is LONGER → keeper = 21.
    val t1 = "x y x y x y x y"
    val dir = docsDir(Seq(
      (0L, t1, "s"), (1L, t1, "s"),
      (20L, "a b a b a b a b", "s"),
      (21L, "a b a b a b a b a b", "s"),
      (90L, "totally unrelated words here of course", "s")))
    val rows = q("q_dedup_keepers", dir).collect()
    assert(rows.length === 2, s"expected exactly 2 clusters, got ${rows.toSeq}")
    val byCluster = rows.map(r => r.getAs[Long]("cluster_id") -> r).toMap
    assert(byCluster(0L).getAs[Long]("keeper_doc") === 0L)
    assert(byCluster(0L).getAs[Long]("cluster_size") === 2L)
    assert(byCluster(0L).getAs[Long]("n_dropped") === 1L)
    assert(byCluster(20L).getAs[Long]("keeper_doc") === 21L,
      "the longer doc must be elected keeper")
    assert(byCluster(20L).getAs[Long]("keeper_chars") === 19L)
  }

  test("q_prefix_dup: shared 4-word openings are charged to every source carrying them") {
    val dir = docsDir(Seq(
      (0L, "h1 h2 h3 h4 tail one", "A"),
      (1L, "h1 h2 h3 h4 tail two", "A"),
      (2L, "h1 h2 h3 h4 tail three", "A"),
      (3L, "u1 u2 u3 u4 unique", "A"),
      (4L, "h1 h2 h3 h4 cross source", "B"),
      (5L, "v1 v2 v3 v4 unique too", "B"),
      (6L, "too short", "B"))) // <4 words: excluded entirely
    val rows = q("q_prefix_dup", dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("A").getAs[Long]("n_docs") === 4L)
    assert(rows("A").getAs[Long]("n_shared_prefix") === 3L)
    assert(rows("A").getAs[Double]("share") === 0.75)
    assert(rows("B").getAs[Long]("n_docs") === 2L,
      "sub-4-word docs must not enter the denominator")
    assert(rows("B").getAs[Long]("n_shared_prefix") === 1L,
      "cross-source prefix sharing must count (the corpus-wide test)")
    assert(rows("B").getAs[Double]("share") === 0.5)
  }

  test("q_vocab_coverage: the curve follows the exact token mass of the rank prefix") {
    // "a" × 100 occurrences + 50 distinct singles: top-10 = a + 9
    // singles = 109 of 150; top-100 & top-1000 cover everything
    val hot = Seq.fill(20)("a").mkString(" ")
    val singles = (0 until 50).map(i => f"s$i%02d")
    val dir = docsDir(Seq(
      (0L, (Seq.fill(5)(hot) ++ singles.take(25)).mkString(" "), "s"),
      (1L, singles.drop(25).mkString(" "), "s")))
    val rows = q("q_vocab_coverage", dir).collect()
      .map(r => r.getAs[Long]("k") -> r).toMap
    assert(rows(10L).getAs[Long]("total_tokens") === 150L)
    assert(rows(10L).getAs[Long]("n_types") === 51L)
    assert(rows(10L).getAs[Long]("covered") === 109L)
    assert(rows(10L).getAs[Double]("coverage") === math.floor(109.0 / 150 * 1e6 + 0.5) / 1e6)
    assert(rows(100L).getAs[Long]("covered") === 150L)
    assert(rows(1000L).getAs[Double]("coverage") === 1.0)
  }

  // ---- stationarity screens -----------------------------------------------

  test("q_adf: perfect mean reversion reads gamma -2 with NULL t; a noisy series matches OLS") {
    // rev: y_t = 30 - y_{t-1} exactly → slope -2, zero residual → the
    // BC - A² = 0 guard must yield NULL t (perfect fit has no s.e.)
    val dir = eventsDir(Seq("rev", "noisy"), 4, {
      case ("rev", d) => if (d % 2 == 0) 10 else 20
      case (_, d) => Seq(10, 11, 10, 12)(d)
    })
    val rows = q("q_adf", dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rows("rev").getAs[Double]("gamma") === -2.0)
    assert(rows("rev").isNullAt(rows("rev").fieldIndex("t_stat")),
      "a perfect fit (zero residual) must yield NULL t")
    // noisy: pairs (x=10,z=+1),(11,-1),(10,+2): A=-5, B=2, C=14 →
    // gamma = -2.5, t = -5·√1/√(2·14-25) = -5/√3
    assert(rows("noisy").getAs[Double]("gamma") === -2.5)
    assert(math.abs(rows("noisy").getAs[Double]("t_stat") - (-5.0 / math.sqrt(3.0))) < 1e-5)
  }

  test("q_variance_ratio: alternation reads VR 0, constant diffs NULL, growth matches closed form") {
    val dir = eventsDir(Seq("alt", "trend", "grow"), 5, {
      case ("alt", d) => if (d % 2 == 0) 10 else 20
      case ("trend", d) => 10 * (d + 1) // constant +10 diffs: var1 = 0
      case (_, d) => 1 << d // 1,2,4,8,16
    })
    val rows = q("q_variance_ratio", dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    // alt: 2-day diffs are all zero → VR = 0, z = (0-1)·√4 = -2
    assert(rows("alt").getAs[Double]("vr") === 0.0)
    assert(rows("alt").getAs[Double]("z") === -2.0)
    assert(rows("trend").isNullAt(rows("trend").fieldIndex("vr")),
      "zero 1-day variance must guard to NULL")
    // grow: var1 = 115/12, var2 = 21 → VR = 252/230
    assert(math.abs(rows("grow").getAs[Double]("vr") - 252.0 / 230) < 1e-5)
    assert(math.abs(rows("grow").getAs[Double]("z") - (252.0 / 230 - 1) * 2) < 1e-5)
  }

  /** Synthetic events dir from explicit (event_id, day, user, type, value). */
  private def rawEventsDir(rows: Seq[(Long, Int, Long, String, Double)]): String = {
    val dir = tempDir("cs_raw")
    import spark.implicits._
    rows.toDF("event_id", "d", "user_id", "event_type", "value")
      .select(col("event_id"),
        (to_timestamp(lit("2024-01-01 00:00:00")) +
          make_dt_interval(col("d"), lit(1), lit(0), lit(0))).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q_rolling_corr: aligned trends read +1, mirrored trends -1, ties resolve to the first window") {
    // up: 1..8, up2: 2..16 (collinear), dn: 8..1 (anti) over 8 days —
    // every complete 7-day window ties, so the argmin tie-break must
    // land on the FIRST complete window (day 6)
    val dir = eventsDir(Seq("up", "up2", "dn"), 8, {
      case ("up", d) => d + 1
      case ("up2", d) => 2 * (d + 1)
      case (_, d) => 8 - d
    })
    val rows = q("q_rolling_corr", dir).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) -> r).toMap
    assert(rows.keySet === Set(("dn", "up"), ("dn", "up2"), ("up", "up2")))
    val pos = rows(("up", "up2"))
    assert(pos.getAs[Long]("n_days") === 8L)
    assert(pos.getAs[Double]("corr_full") === 1.0)
    assert(pos.getAs[Double]("min_corr7") === 1.0)
    assert(pos.getAs[Long]("min_corr_day") === 6L,
      "all windows tie at +1: the day tie-break must pick the first complete window")
    assert(rows(("dn", "up")).getAs[Double]("corr_full") === -1.0)
    assert(rows(("dn", "up")).getAs[Double]("min_corr7") === -1.0)
  }

  test("q_cooks_distance: a mid-series spike dominates influence; the closed form matches") {
    // flat 10 with a +14 spike at day 3 of 7: b = 0, ybar = 12,
    // SSE = 168, h3 = 1/7 → D3 = 144·(1/7)/(2·33.6·(6/7)²) = 5/12
    val dir = eventsDir(Seq("spiky"), 7, {
      case (_, 3) => 24
      case _ => 10
    })
    val row = q("q_cooks_distance", dir).head()
    assert(row.getAs[Long]("influential_day") === 3L)
    assert(row.getAs[Long]("day_count") === 24L)
    assert(math.abs(row.getAs[Double]("cooks_d") - 5.0 / 12) < 1e-5)
    assert(math.abs(row.getAs[Double]("leverage") - 1.0 / 7) < 1e-5)
    assert(math.abs(row.getAs[Double]("residual") - 12.0) < 1e-5)
  }

  test("q_odds_ratio: one user per cell gives OR 1 with the Woolf interval") {
    val dir = rawEventsDir(Seq(
      (1L, 0, 1L, "click", 1.0), (2L, 0, 1L, "purchase", 200.0), // a: exposed+conv
      (3L, 0, 2L, "click", 1.0), // b: exposed only
      (4L, 0, 3L, "purchase", 200.0), // c: conv only
      (5L, 0, 4L, "view", 1.0))) // d: neither
    val row = q("q_odds_ratio", dir).head()
    assert((row.getAs[Long]("a"), row.getAs[Long]("b"),
      row.getAs[Long]("c"), row.getAs[Long]("d")) === ((1L, 1L, 1L, 1L)))
    assert(row.getAs[Double]("odds_ratio") === 1.0)
    assert(math.abs(row.getAs[Double]("ci_lo") - math.exp(-1.96 * 2)) < 1e-5)
    assert(math.abs(row.getAs[Double]("ci_hi") - math.exp(1.96 * 2)) < 1e-5)
  }

  test("q_lift_curve: converters concentrate lift in their deciles and the gains curve is exact") {
    // 20 users, vol = 21-u (distinct) → deciles of exactly 2 users in
    // user order; converters are users 1 (decile 1) and 11 (decile 6)
    val rows20 = (1 to 20).flatMap { u =>
      val evs = (0 until (21 - u)).map(i =>
        (u * 100L + i, i % 5, u.toLong, "view", 1.0))
      if (u == 1 || u == 11) evs :+ (u * 100L + 99, 0, u.toLong, "purchase", 200.0)
      else evs
    }
    val rows = q("q_lift_curve", rawEventsDir(rows20)).collect()
      .map(r => r.getAs[Long]("decile") -> r).toMap
    assert(rows.size === 10)
    assert(rows.values.map(_.getAs[Long]("n_users")).toSet === Set(2L))
    // base rate 2/20 = 0.1; converting deciles read rate 0.5 → lift 5
    for (d <- Seq(1L, 6L)) {
      assert(rows(d).getAs[Long]("n_conv") === 1L)
      assert(rows(d).getAs[Double]("conv_rate") === 0.5)
      assert(rows(d).getAs[Double]("lift") === 5.0)
    }
    assert(rows(2L).getAs[Double]("lift") === 0.0)
    assert(rows(1L).getAs[Double]("cum_gain") === 0.5)
    assert(rows(5L).getAs[Double]("cum_gain") === 0.5)
    assert(rows(6L).getAs[Double]("cum_gain") === 1.0)
    assert(rows(10L).getAs[Double]("cum_gain") === 1.0)
  }

  test("q_doc_novelty: duplicated shingles zero a source's novelty; unique content reads 1") {
    val dir = docsDir(Seq(
      (0L, "a b c d", "s1"), (1L, "a b c d", "s1"), // all shingles df=2
      (2L, "x y z w", "s2"))) // all shingles unique
    val rows = q("q_doc_novelty", dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("s1").getAs[Long]("n_docs") === 2L)
    assert(rows("s1").getAs[Long]("unique_shingles") === 0L)
    assert(rows("s1").getAs[Long]("total_shingles") === 4L)
    assert(rows("s1").getAs[Double]("novelty") === 0.0)
    assert(rows("s1").getAs[Double]("mean_doc_novelty") === 0.0)
    assert(rows("s2").getAs[Double]("novelty") === 1.0)
    assert(rows("s2").getAs[Double]("mean_doc_novelty") === 1.0)
  }

  // ---- pricing ------------------------------------------------------------

  /** Synthetic lineitem+part dir from (partkey, qty, extprice, year, brand). */
  private def salesDir(rows: Seq[(Long, Double, Double, Int, String)]): String = {
    val dir = tempDir("cs_sales")
    import spark.implicits._
    rows.map { case (pk, qty, ext, yr, _) => (pk, qty, ext, s"$yr-06-15 00:00:00") }
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "ship")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        to_timestamp(col("ship")).as("l_shipdate"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    rows.map { case (pk, _, _, _, b) => (pk, b) }.distinct
      .toDF("p_partkey", "p_brand")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    dir
  }

  test("q_revenue_bridge: volume/price legs telescope to the delta; new and lost parts split out") {
    val dir = salesDir(Seq(
      (1L, 10.0, 100.0, 1997, "X"), (1L, 20.0, 300.0, 1998, "X"),
      (2L, 5.0, 50.0, 1998, "X"), // new in 1998
      (3L, 2.0, 80.0, 1997, "Y"))) // lost after 1997
    val rows = q("q_revenue_bridge", dir).collect()
      .map(r => r.getAs[String]("brand") -> r).toMap
    val x = rows("X")
    // part 1: p0 = $10/u, p1 = $15/u → volume 10·10 = $100, price 5·20 = $100
    assert(x.getAs[Double]("rev_prev") === 100.0)
    assert(x.getAs[Double]("rev_curr") === 350.0)
    assert(x.getAs[Double]("delta") === 250.0)
    assert(x.getAs[Double]("volume_effect") === 100.0)
    assert(x.getAs[Double]("price_effect") === 100.0)
    assert(x.getAs[Double]("new_effect") === 50.0)
    assert(x.getAs[Double]("lost_effect") === 0.0)
    assert(x.getAs[Double]("volume_effect") + x.getAs[Double]("price_effect") +
      x.getAs[Double]("new_effect") + x.getAs[Double]("lost_effect") ===
      x.getAs[Double]("delta"), "the bridge must tie out")
    val y = rows("Y")
    assert(y.getAs[Double]("lost_effect") === -80.0)
    assert(y.getAs[Double]("delta") === -80.0)
  }

  test("q_price_index: the base year anchors at 1.0 and the matched-basket math is exact") {
    val dir = salesDir(Seq(
      (1L, 10.0, 100.0, 1995, "X"), (1L, 5.0, 75.0, 1996, "X"), // $10 → $15/u
      (2L, 10.0, 100.0, 1995, "X"), (2L, 20.0, 100.0, 1996, "X"))) // $10 → $5/u
    val rows = q("q_price_index", dir).collect()
      .map(r => r.getAs[Long]("year") -> r).toMap
    assert(rows(1995L).getAs[Double]("laspeyres") === 1.0)
    assert(rows(1995L).getAs[Double]("paasche") === 1.0)
    assert(rows(1995L).getAs[Double]("fisher") === 1.0)
    // 1996: L = (1500·10 + 500·10)/20000 = 1.0 (the base basket nets
    // out), P = 17500/(1000·5 + 1000·20) = 0.7 (substitution bias)
    assert(rows(1996L).getAs[Long]("n_parts") === 2L)
    assert(rows(1996L).getAs[Double]("laspeyres") === 1.0)
    assert(rows(1996L).getAs[Double]("paasche") === 0.7)
    assert(rows(1996L).getAs[Double]("fisher") ===
      math.floor(math.sqrt(0.7) * 1e6 + 0.5) / 1e6)
  }

  // ---- graph & embeddings -------------------------------------------------

  test("q_graph_modularity: two single-brand components score Q = 1/2") {
    val dir = tempDir("cs_graph")
    import spark.implicits._
    // co-purchase edges (support ≥2): (1,2) ×2 orders, (3,4) ×2 orders
    Seq(
      (100L, 1L), (100L, 2L), (101L, 1L), (101L, 2L),
      (200L, 3L), (200L, 4L), (201L, 3L), (201L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "B1"), (2L, "B1"), (3L, "B2"), (4L, "B2"))
      .toDF("p_partkey", "p_brand")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    val row = q("q_graph_modularity", dir).head()
    assert(row.getAs[Long]("n_edges") === 2L)
    assert(row.getAs[Long]("n_brands") === 2L)
    // m=2; per brand: e_bb=1, d_b=2 → Q = 2·(1/2 − (2/4)²) = 1/2
    assert(row.getAs[Double]("modularity") === 0.5)
  }

  test("q_knn_margin: planted geometry reads the closed-form margins, ratios and label hits") {
    import spark.implicits._
    // 0:[1,0] L0, 1:[1,0] L0, 2:[0.6,0.8] L1, 3:[0,1] L1 — all probes
    val dir = tempDir("cs_knnm")
    Seq((0L, Array(1f, 0f), 0), (1L, Array(1f, 0f), 0),
      (2L, Array(0.6f, 0.8f), 1), (3L, Array(0f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val m = q("q_knn_margin", dir).collect()
      .map(r => r.getAs[Long]("probe_id") -> r).toMap
    def chk(p: Long, top1: Long, margin: Double, lowe: Double, lm: Long) = {
      assert(m(p).getAs[Long]("top1_id") === top1, s"probe $p top1")
      assert(m(p).getAs[Double]("margin") === margin, s"probe $p margin")
      assert(m(p).getAs[Double]("lowe_ratio") === lowe, s"probe $p ratio")
      assert(m(p).getAs[Long]("label_match") === lm, s"probe $p label")
    }
    // probes 0/1: exact twin at cos 1, runner-up 0.6 ⇒ ratio 0 (confident)
    chk(0L, 1L, 0.4, 0.0, 1L)
    chk(1L, 0L, 0.4, 0.0, 1L)
    // probe 2: top-1 [0,1] at 0.8, runner-up 0.6 ⇒ ratio 0.5
    chk(2L, 3L, 0.2, 0.5, 1L)
    // probe 3: top-1 [0.6,0.8] at 0.8, runner-up 0 ⇒ ratio 0.2
    chk(3L, 2L, 0.8, 0.2, 1L)
    assert(m.size === 4)
  }

  test("q_silhouette: separated labels score 1.0; a mislabeled vector lands at -1 and counts as misfit") {
    import spark.implicits._
    val e1 = Array(1f, 0f, 0f, 0f)
    val e2 = Array(0f, 1f, 0f, 0f)
    val clean = tempDir("cs_sil")
    ((0 until 3).map(i => (i.toLong, e1, 0)) ++ Seq((10L, e2, 1), (11L, e2, 1)))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$clean/embeddings.parquet")
    val cr = q("q_silhouette", clean).collect()
      .map(r => r.getAs[Int]("label") -> r).toMap
    // orthogonal centroids: cos_own = 1, cos_other = 0 → s = 1 for all
    assert(cr(0).getAs[Double]("mean_silhouette") === 1.0)
    assert(cr(1).getAs[Double]("mean_silhouette") === 1.0)
    assert(cr(0).getAs[Long]("n_misfit") === 0L)

    val dirty = tempDir("cs_sil2")
    ((0 until 3).map(i => (i.toLong, e1, 0)) ++
      Seq((10L, e2, 1), (11L, e2, 1), (12L, e1, 1))) // 12 is mislabeled
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dirty/embeddings.parquet")
    val dr = q("q_silhouette", dirty).collect()
      .map(r => r.getAs[Int]("label") -> r).toMap
    assert(dr(1).getAs[Long]("n_misfit") === 1L,
      "the mislabeled vector must count as a misfit (s < 0)")
    assert(dr(0).getAs[Long]("n_misfit") === 0L)
    // independent replication of the exact rounded-centroid recurrence
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def cos(v: Array[Double], c: Array[Double]) = r6(
      v.zip(c).map { case (a, b) => a * b }.sum /
        (math.sqrt(v.map(x => x * x).sum) * math.sqrt(c.map(x => x * x).sum)))
    def s6(own: Double, other: Double): Long = {
      val den = math.max(1 - own, 1 - other)
      if (den <= 0) 0L else math.floor((own - other) / den * 1e6 + 0.5).toLong
    }
    val c0 = Array(1.0, 0.0, 0.0, 0.0)
    val c1 = Array(r6(1.0 / 3), r6(2.0 / 3), 0.0, 0.0)
    val v1 = Array(0.0, 1.0, 0.0, 0.0) // the two correct label-1 vectors
    val vm = Array(1.0, 0.0, 0.0, 0.0) // the mislabeled one
    val expect = r6((2 * s6(cos(v1, c1), cos(v1, c0)) +
      s6(cos(vm, c1), cos(vm, c0))).toDouble / (3 * 1e6))
    assert(dr(1).getAs[Double]("mean_silhouette") === expect)
  }

  test("q_embed_outliers: the anti-aligned vector ranks first with cosine −1") {
    val dir = tempDir("cs_embed")
    import spark.implicits._
    val v = Array(1f, 0f, 0f, 0f)
    val u = Array(-1f, 0f, 0f, 0f)
    (Seq((7L, u, 0)) ++ (0 until 5).map(i => (i.toLong, v, 0)))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = q("q_embed_outliers", dir).collect()
    assert(rows.length === 6)
    assert(rows.head.getAs[Long]("vec_id") === 7L,
      "the anti-aligned vector must rank as the worst outlier")
    assert(rows.head.getAs[Double]("cos_centroid") === -1.0)
    assert(rows.last.getAs[Double]("cos_centroid") === 1.0)
  }

  // ---- round-14 additions -------------------------------------------------

  test("q_mase: an exact weekly cycle scores zero; a linear trend scores exactly 7") {
    // weekly: counts repeat with period 7 ⇒ every lag-7 error is 0 ⇒
    // mae_seasonal = 0, mase = 0. trend: y_d = d+1 ⇒ |y−lag1| = 1 and
    // |y−lag7| = 7 everywhere ⇒ mase = 7 exactly.
    val pattern = Array(5, 10, 3, 8, 2, 7, 4)
    val dir = eventsDir(Seq("weekly", "trend"), 21, {
      case ("weekly", d) => pattern(d % 7)
      case (_, d) => d + 1
    })
    val rows = q("q_mase", dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val wk = rows("weekly")
    assert(wk.getAs[Long]("n_days") === 21L)
    assert(wk.getAs[Double]("mae_seasonal") === 0.0)
    assert(wk.getAs[Double]("mase") === 0.0)
    assert(wk.getAs[Double]("mae_naive") > 0.0)
    val tr = rows("trend")
    assert(tr.getAs[Double]("mae_naive") === 1.0)
    assert(tr.getAs[Double]("mae_seasonal") === 7.0)
    assert(tr.getAs[Double]("mase") === 7.0)
  }

  test("q_mcnemar counts the planted discordant users exactly") {
    // 40 users: 10 purchase pre-only (n10), 5 post-only (n01), 10 both
    // (n11), 15 click-only (n00). χ² = (10−5)²/15, cc = (|5|−1)²/15.
    val dir = tempDir("cs_mcnemar")
    import spark.implicits._
    val pre = "2024-01-10 12:00:00"; val post = "2024-01-20 12:00:00"
    val rows = (0 until 40).flatMap { u =>
      val (p1, p2) =
        if (u < 10) (true, false)
        else if (u < 15) (false, true)
        else if (u < 25) (true, true)
        else (false, false)
      Seq(
        if (p1) (u.toLong * 2, pre, u.toLong, "purchase", 10.0)
        else (u.toLong * 2, pre, u.toLong, "click", 1.0),
        if (p2) (u.toLong * 2 + 1, post, u.toLong, "purchase", 10.0)
        else (u.toLong * 2 + 1, post, u.toLong, "click", 1.0))
    }
    rows.toDF("event_id", "tss", "user_id", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"), col("user_id"),
        col("event_type"), col("value"), lit("""{"k": 1}""").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = q("q_mcnemar", dir).head()
    assert(r.getAs[Long]("n_users") === 40L)
    assert(r.getAs[Long]("n00") === 15L && r.getAs[Long]("n01") === 5L &&
      r.getAs[Long]("n10") === 10L && r.getAs[Long]("n11") === 10L)
    assert(r.getAs[Double]("mcnemar") === math.floor(25.0 / 15 * 1e6 + 0.5) / 1e6)
    assert(r.getAs[Double]("mcnemar_cc") === math.floor(16.0 / 15 * 1e6 + 0.5) / 1e6)
  }

  test("q_mcnemar is NULL when no user switches") {
    val dir = tempDir("cs_mcnemar_null")
    import spark.implicits._
    (0 until 6).map(u => (u.toLong, "2024-01-10 12:00:00", u.toLong, "click", 1.0))
      .toDF("event_id", "tss", "user_id", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"), col("user_id"),
        col("event_type"), col("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = q("q_mcnemar", dir).head()
    assert(r.getAs[Long]("n00") === 6L)
    assert(r.isNullAt(r.fieldIndex("mcnemar")) && r.isNullAt(r.fieldIndex("mcnemar_cc")),
      "zero discordant users must read NULL, not a division blow-up")
  }

  test("q_dedup_incremental classifies planted exact / near / new incoming docs") {
    // 15 docs ⇒ threshold = 12: incoming {12, 13, 14}. 12 is a byte
    // copy of 2 (exact, match 2); 13 is 3 with one appended word
    // (9 shared shingles of 10 ⇒ jaccard 0.9 ≥ 0.8 — near, match 3);
    // 14 shares nothing (new, NULL match).
    val texts = (0 until 12).map { i =>
      (0 until 12).map(w => s"t${i}w$w").mkString(" ") // 12 distinct words each
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, s"src${i % 3}") } ++
      Seq(
        (12L, texts(2), "ingest"),
        (13L, texts(3) + " tailword", "ingest"),
        (14L, (0 until 12).map(w => s"freshw$w").mkString(" "), "ingest"))
    val dir = docsDir(docs)
    val rows = q("q_dedup_incremental", dir).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq === Seq(12L, 13L, 14L),
      "exactly the top-20% ids are the incoming batch")
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(12L).getAs[String]("status") === "exact")
    assert(byId(12L).getAs[Long]("match_doc") === 2L)
    assert(byId(13L).getAs[String]("status") === "near")
    assert(byId(13L).getAs[Long]("match_doc") === 3L)
    assert(byId(14L).getAs[String]("status") === "new")
    assert(byId(14L).isNullAt(byId(14L).fieldIndex("match_doc")))
  }

  // ---- round-14 k-sample / trend screening battery ------------------------

  test("q_mann_kendall: a strict trend scores S = C(n,2); alternation cancels to 0") {
    val rows = q("q_mann_kendall", altTrendDir()).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val tr = rows("trend") // counts 1..9 strictly increasing
    assert(tr.getAs[Long]("n_days") === 9L)
    assert(tr.getAs[Long]("s") === 36L, "all 36 day pairs ascend")
    // no ties: Var = 9·8·23/18 = 92; z = (36 − 1)/√92
    assert(math.abs(tr.getAs[Double]("z") - 35.0 / math.sqrt(92.0)) < 1e-5)
    val alt = rows("alt") // 10,20,10,… — ascending and descending pairs cancel
    assert(alt.getAs[Long]("s") === 0L)
    assert(alt.getAs[Double]("z") === 0.0, "S = 0 keeps the continuity correction at 0")
  }

  test("q_friedman: a fixed within-day ordering reaches the maximum Q = n(k−1)") {
    val dir = eventsDir(Seq("lo", "mid", "hi"), 4, {
      case ("lo", _) => 1
      case ("mid", _) => 2
      case (_, _) => 3
    })
    val r = q("q_friedman", dir).collect().head
    assert(r.getAs[Long]("n_days") === 4L && r.getAs[Long]("n_types") === 3L)
    // per-day ranks always (1,2,3): ΣR² = 4²+8²+12² = 224;
    // Q = 12·224/(4·3·4) − 3·4·4 = 56 − 48 = 8 = n(k−1)
    assert(r.getAs[Double]("q") === 8.0)
    assert(r.getAs[Double]("q_tie_corrected") === 8.0, "no ties: correction is identity")
  }

  test("q_moods_median: two separated types produce the closed-form 2×k chi-square") {
    val dir = eventsDir(Seq("a", "b"), 9, { case ("a", _) => 1; case (_, _) => 3 })
    val r = q("q_moods_median", dir).collect().head
    assert(r.getAs[Long]("n_types") === 2L && r.getAs[Long]("n_days") === 18L)
    // pooled middle ranks 9,10 of nine 1s then nine 3s → (1+3)/2
    assert(r.getAs[Double]("grand_median") === 2.0)
    // a=(0 of 9 above), b=(9 of 9): χ² = (18²/(9·9))·(9 − 81/18) = 18
    assert(r.getAs[Double]("chi2") === 18.0)
  }

  test("q_tukey_hsd: identical groups score q = 0; separated groups match the closed form") {
    val same = eventsDir(Seq("p", "r"), 9, (_, _) => 4) // both values {0,1,2,3}×9
    val r0 = q("q_tukey_hsd", same).collect().head
    assert(r0.getAs[Double]("mean_a") === 1.5 && r0.getAs[Double]("mean_b") === 1.5)
    assert(r0.getAs[Double]("q_stat") === 0.0)
    val sep = eventsDir(Seq("hi", "lo"), 9, { case ("lo", _) => 2; case (_, _) => 4 })
    val r1 = q("q_tukey_hsd", sep).collect().head // type_a=hi (1.5), type_b=lo (0.5)
    assert(r1.getAs[Double]("mean_a") === 1.5 && r1.getAs[Double]("mean_b") === 0.5)
    // SSW = 135 − (81e6 + 4.5e6)/1e6 = 49.5 over nn−k = 52 dof
    val expect = 1.0 / math.sqrt(49.5 / 52 / 2 * (1.0 / 36 + 1.0 / 18))
    assert(math.abs(r1.getAs[Double]("q_stat") - expect) < 1e-5)
  }

  test("q_hodges_lehmann: a symmetric series' pseudo-median is its center") {
    val dir = eventsDir(Seq("sym"), 9, (_, d) => d + 1) // counts 1..9
    val r = q("q_hodges_lehmann", dir).collect().head
    assert(r.getAs[Long]("n_days") === 9L && r.getAs[Long]("n_pairs") === 45L)
    // Walsh averages of a symmetric set are symmetric about the center
    assert(r.getAs[Double]("hl") === 5.0)
  }

  test("q_granger: a planted lag-1 dependence is directional; constant series are NULL") {
    // e(d) = c(d−1) + (d%2): today's e IS yesterday's c plus parity
    // noise, while c never reads e; k is constant (zero variance).
    val c = (0 until 12).map(d => 5 + (d * 3) % 7)
    val e = 1 +: (1 until 12).map(d => c(d - 1) + (d % 2))
    val dir = eventsDir(Seq("c", "e", "k"), 12, {
      case ("c", d) => c(d)
      case ("e", d) => e(d)
      case (_, _) => 3
    })
    val rows = q("q_granger", dir).collect()
      .map(r => (r.getAs[String]("cause"), r.getAs[String]("effect")) -> r).toMap
    assert(rows.size === 6, "every directed pair of 3 types")
    val fwd = rows(("c", "e")).getAs[Double]("f_stat")
    val rev = rows(("e", "c")).getAs[Double]("f_stat")
    assert(math.abs(fwd - 228.514093) < 1e-3, s"forward F, got $fwd")
    assert(rev < 1.0, s"reverse F must be noise-sized, got $rev")
    // a zero-variance regressor makes the normal matrix singular
    val kc = rows(("k", "e"))
    assert(kc.isNullAt(kc.fieldIndex("f_stat")), "constant cause → NULL, not a blow-up")
  }

  test("q_seasonal_mk: a pure weekly cycle cancels; a trend survives deseasonalization") {
    val dir = eventsDir(Seq("cycle", "trend"), 14, {
      case ("cycle", d) => (d % 7) * 2 + 2 // counts depend on weekday only
      case (_, d) => d + 1                 // strictly increasing
    })
    val rows = q("q_seasonal_mk", dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val cy = rows("cycle") // within every stratum the two days tie: S=0, Var=0
    assert(cy.getAs[Long]("s") === 0L)
    assert(cy.isNullAt(cy.fieldIndex("z")), "an exact cycle has zero within-stratum variance")
    val tr = rows("trend") // one ascending pair per stratum: S=7, 18·Var=7·18
    assert(tr.getAs[Long]("s") === 7L)
    assert(math.abs(tr.getAs[Double]("z") - 6.0 / math.sqrt(7.0)) < 1e-5)
  }

  /** Independent OLS replication: slope, intercept, SSE via explicit
    * residuals — a different formula path from the ops' moment
    * identities, so agreement is real evidence. */
  private def ols(pts: Seq[(Int, Int)]): (Double, Double, Double) = {
    val n = pts.size.toDouble
    val sx = pts.map(_._1.toDouble).sum; val sy = pts.map(_._2.toDouble).sum
    val sxx = pts.map(p => p._1.toDouble * p._1).sum
    val sxy = pts.map(p => p._1.toDouble * p._2).sum
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val a = (sy - b * sx) / n
    val sse = pts.map { case (x, y) => val e = y - a - b * x; e * e }.sum
    (b, a, sse)
  }

  test("q_durbin_watson matches an explicit-residual replication; exact fits read NULL") {
    val saw = Seq(9, 11, 9, 11, 9, 11, 9, 11) // alternation → DW ≈ 4
    val dir = eventsDir(Seq("saw", "flat", "line"), 8, {
      case ("saw", d) => saw(d)
      case ("flat", _) => 5
      case (_, d) => 3 + 2 * d // exact line: zero residuals
    })
    val rows = q("q_durbin_watson", dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val (b, a, _) = ols(saw.indices.map(d => d -> saw(d)))
    val e = saw.indices.map(d => saw(d) - a - b * d)
    val dw = e.sliding(2).map { case Seq(p, n) => (n - p) * (n - p) }.sum /
      e.map(v => v * v).sum
    val sw = rows("saw")
    assert(math.abs(sw.getAs[Double]("slope") - b) < 1e-5)
    assert(math.abs(sw.getAs[Double]("dw") - dw) < 1e-5, s"op vs replication $dw")
    assert(dw > 3.0, "alternating residuals push DW toward 4")
    assert(math.abs(sw.getAs[Double]("rho1") - (1 - dw / 2)) < 1e-5)
    val fl = rows("flat") // zero variance: slope 0, DW undefined
    assert(fl.getAs[Double]("slope") === 0.0 && fl.isNullAt(fl.fieldIndex("dw")))
    val ln = rows("line") // exact fit: zero SSE, DW undefined, slope exact
    assert(ln.getAs[Double]("slope") === 2.0 && ln.isNullAt(ln.fieldIndex("dw")))
  }

  test("q_chow matches a two-segment replication; exact twin lines read NULL F") {
    val kink = Seq(10, 12, 11, 13, 12, 20, 25, 31, 35, 41) // noisy slope break at d=5
    val dir = eventsDir(Seq("kink", "twoline"), 10, {
      case ("kink", d) => kink(d)
      case (_, d) => if (d < 5) 10 else 15 + 5 * (d - 5) // both halves EXACT lines
    })
    val rows = q("q_chow", dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val pts = kink.indices.map(d => d -> kink(d))
    val (p1, p2) = pts.splitAt(5) // rn·2 ≤ n puts days 0..4 in segment 1
    val (b1, _, s1) = ols(p1); val (b2, _, s2) = ols(p2); val (_, _, sp) = ols(pts)
    val f = ((sp - s1 - s2) / 2) / ((s1 + s2) / (pts.size - 4))
    val kk = rows("kink")
    assert(kk.getAs[Long]("n1") === 5L && kk.getAs[Long]("n2") === 5L)
    assert(kk.getAs[Long]("split_day") === 4L, "segment 1 ends at day 4")
    assert(math.abs(kk.getAs[Double]("slope1") - b1) < 1e-5)
    assert(math.abs(kk.getAs[Double]("slope2") - b2) < 1e-5)
    assert(math.abs(kk.getAs[Double]("f_stat") - f) < 1e-4, s"op vs replication $f")
    assert(f > 10.0, "a real slope break must read large")
    val tl = rows("twoline") // exact fits: SSEs all zero → F undefined
    assert(tl.getAs[Double]("slope1") === 0.0 && tl.getAs[Double]("slope2") === 5.0)
    assert(tl.isNullAt(tl.fieldIndex("f_stat")))
  }

  test("q_dunn: separated value blocks give closed-form mean ranks and z") {
    val dir = tempDir("dunn_events")
    import spark.implicits._
    // three types, four events each, values 1.0 / 2.0 / 3.0: type a
    // holds pooled ranks 1-4 (mean 2.5), b 5-8 (6.5), c 9-12 (10.5);
    // ties Σ(t³−t) = 3·60 = 180, V = 13 − 180/132 = 128/11, and
    // z_ab = −4/√(64/11) = −√11/2, z_ac = −√11 exactly.
    val rows = for (t <- Seq("a", "b", "c"); i <- 0 until 4)
      yield (t.hashCode.toLong * 10 + i, t, Map("a" -> 1.0, "b" -> 2.0, "c" -> 3.0)(t))
    rows.toDF("event_id", "event_type", "value")
      .selectExpr("event_id", "timestamp '2024-01-01 00:00:00' AS ts",
        "CAST(1 AS BIGINT) AS user_id", "event_type", "value", "'{}' AS props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = q("q_dunn", dir).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) -> r).toMap
    assert(out.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    val ab = out(("a", "b"))
    assert(ab.getAs[Double]("mean_rank_a") === 2.5 &&
      ab.getAs[Double]("mean_rank_b") === 6.5)
    assert(math.abs(ab.getAs[Double]("z") + math.sqrt(11.0) / 2) < 1e-5)
    val ac = out(("a", "c"))
    assert(ac.getAs[Double]("mean_rank_b") === 10.5)
    assert(math.abs(ac.getAs[Double]("z") + math.sqrt(11.0)) < 1e-5)
    val bc = out(("b", "c"))
    assert(math.abs(bc.getAs[Double]("z") + math.sqrt(11.0) / 2) < 1e-5)
  }

  test("q_cohens_kappa: a planted confusion matrix gives the exact rational kappa") {
    val dir = tempDir("kappa_docs")
    import spark.implicits._
    // true langs (en,en,de,fr); predictions (en,en,en,fr) → N=4,
    // agree=3, rows en2/de1/fr1, cols en3/fr1, pe_num = 2·3+1·1 = 7:
    // po = 3/4, pe = 7/16, κ = (12−7)/(16−7) = 5/9.
    val docs = Seq(
      (1L, "column sort key", "en"), (2L, "column sort key", "en"),
      (3L, "column sort", "de"), (4L, "order query", "fr"))
    docs.toDF("doc_id", "text", "lang")
      .selectExpr("doc_id", "text", "lang", "'web' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = q("q_cohens_kappa", dir).head()
    assert(r.getAs[Long]("n_docs") === 4L && r.getAs[Long]("n_agree") === 3L)
    assert(r.getAs[Double]("po") === 0.75)
    assert(r.getAs[Double]("pe") === 0.4375)
    assert(math.abs(r.getAs[Double]("kappa") - 5.0 / 9.0) < 1e-6)
  }

  test("q_kpss: a hand-computed partial-sum case is exact; a trend dwarfs noise") {
    val dir = eventsDir(Seq("pair", "trend", "noise"), 2, {
      case ("pair", d) => if (d == 0) 1 else 3
      case _ => 1 // placeholder; trend/noise use the 12-day dir below
    })
    // pair: y = [1,3] → nS = [2·1−1·4, 0] = [−2, 0]; byy0 = 2·10−16 = 4;
    // η = Σ(nS)²/(n²·byy0) = 4/(4·4) = 0.25 exactly
    val r2 = q("q_kpss", dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(r2("pair").getAs[Double]("eta") === 0.25)
    val dir2 = eventsDir(Seq("trend", "noise"), 12, {
      case ("trend", d) => 2 + 3 * d                 // drifting level
      case (_, d) => 10 + (if (d % 2 == 0) 1 else -1) // mean-reverting wiggle
    })
    val rows = q("q_kpss", dir2).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("eta")).toMap
    assert(rows("trend") > 5 * rows("noise"),
      s"a drifting level must read far less stationary: $rows")
    assert(rows("noise") < 0.2, "an alternating series hugs its mean")
  }

  test("q_page_trend: alphabet-aligned daily orderings give the closed-form L") {
    // three types, four days, volumes always a < b < c: within every
    // day ranks are 1,2,3 (r2 = 2,4,6), so R = (4,8,12)·2/2 and
    // 2L = 1·8 + 2·16 + 3·24 = 112 → L = 56 = max; μ = 4·3·16/4 = 48,
    // σ² = 4·9·4·8/144 = 8 → z = (56−48)/√8 = 2√2
    val dir = eventsDir(Seq("a", "b", "c"), 4, {
      case ("a", d) => 1 + d
      case ("b", d) => 5 + d
      case (_, d) => 9 + d
    })
    val r = q("q_page_trend", dir).head()
    assert(r.getAs[Long]("n_days") === 4L && r.getAs[Long]("n_types") === 3L)
    assert(r.getAs[Double]("l_stat") === 56.0)
    assert(math.abs(r.getAs[Double]("z") - 2 * math.sqrt(2.0)) < 1e-5)
  }

  test("q_token_budget_trim: planted quality buckets give the exact binding bar") {
    val dir = tempDir("trim_docs")
    import spark.implicits._
    // en: two q4=8080 docs (8 tokens) + two q4=1330 docs; budget = 8
    // → the top bucket fits EXACTLY (no partial, q_star NULL).
    // de: 6-token q4=8120 + 2-token q4=8040 + 2-token q4=2540; budget
    // = 5 → the first bucket already overflows: zero full, partial
    // q_star = 0.812 with 5 tokens left for write-time admission.
    val docs = Seq(
      (1L, "x1 x2 x3 x4", "en"), (2L, "y1 y2 y3 y4", "en"),
      (3L, "the the the the", "en"), (4L, "a a a a", "en"),
      (5L, "x1 x2 x3 x4 x5 x6", "de"), (6L, "b1 b2", "de"),
      (7L, "the the", "de"))
    docs.toDF("doc_id", "text", "lang")
      .selectExpr("doc_id", "text", "lang", "'web' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = q("q_token_budget_trim", dir).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    val en = rows("en")
    assert(en.getAs[Long]("total_tokens") === 16L && en.getAs[Long]("budget") === 8L)
    assert(en.getAs[Long]("docs_full") === 2L && en.getAs[Long]("tokens_full") === 8L)
    assert(en.isNullAt(en.fieldIndex("q_star")), "an exact fit has no partial bucket")
    val de = rows("de")
    assert(de.getAs[Long]("total_tokens") === 10L && de.getAs[Long]("budget") === 5L)
    assert(de.getAs[Long]("docs_full") === 0L && de.getAs[Long]("tokens_full") === 0L)
    assert(math.abs(de.getAs[Double]("q_star") - 0.812) < 1e-9)
    assert(de.getAs[Long]("partial_left") === 5L)
  }

  test("q_jonckheere: fully ordered value blocks give the maximal J and closed-form z") {
    val dir = tempDir("jt_events")
    import spark.implicits._
    // the q_dunn fixture: a<b<c with values 1/2/3, four events each —
    // every ordered pair is concordant: J = 3·16 = 48 = max;
    // μ = (144−48)/4 = 24, σ² = (144·27 − 3·16·11)/72 = 3360/72
    val rows = for (t <- Seq("a", "b", "c"); i <- 0 until 4)
      yield (t.hashCode.toLong * 10 + i, t, Map("a" -> 1.0, "b" -> 2.0, "c" -> 3.0)(t))
    rows.toDF("event_id", "event_type", "value")
      .selectExpr("event_id", "timestamp '2024-01-01 00:00:00' AS ts",
        "CAST(1 AS BIGINT) AS user_id", "event_type", "value", "'{}' AS props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = q("q_jonckheere", dir).head()
    assert(r.getAs[Long]("n_types") === 3L && r.getAs[Long]("n") === 12L)
    assert(r.getAs[Double]("j_stat") === 48.0)
    assert(math.abs(r.getAs[Double]("z") - 24.0 / math.sqrt(3360.0 / 72)) < 1e-5)
  }

  test("q_pettitt: a level shift peaks |U| at the break; a constant series reads zero") {
    val dir = eventsDir(Seq("shift", "flat"), 8, {
      case ("shift", d) => if (d < 4) 10 else 30
      case (_, _) => 5
    })
    val rows = q("q_pettitt", dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val sh = rows("shift")
    // ranks: four 10s (avg 2.5), four 30s (avg 6.5); U_4 = 2·10 − 4·9 = −16
    assert(sh.getAs[Long]("k_stat") === 16L && sh.getAs[Long]("change_day") === 3L)
    // 6·16²/(8³+8²) = 1536/576
    assert(math.abs(sh.getAs[Double]("p_exponent") - 1536.0 / 576.0) < 1e-5)
    val fl = rows("flat") // all tied: U_t ≡ 0, earliest day wins the argmax tie
    assert(fl.getAs[Long]("k_stat") === 0L && fl.getAs[Long]("change_day") === 0L)
    assert(fl.getAs[Double]("p_exponent") === 0.0)
  }

  /** Events dir with explicit user lifetimes: each (user_id, lifeHours)
    * pair gets two events at base+offsetH and base+offsetH+lifeHours,
    * so fs/ls reconstruct the lifetime exactly; the latest ls holds
    * the censor horizon (te − ls = 0 → censored), and any user ending
    * > 12h before it is churned. */
  private def survivalDir(prefix: String, users: Seq[(Long, Long, Long)]): String = {
    val dir = tempDir(prefix)
    import spark.implicits._
    users.zipWithIndex.flatMap { case ((uid, off, life), i) =>
      Seq((i.toLong * 2, off, uid, "visit", 1.0),
        (i.toLong * 2 + 1, off + life, uid, "visit", 1.0))
    }.toDF("event_id", "h", "user_id", "event_type", "value")
      .select(col("event_id"),
        (to_timestamp(lit("2024-01-01 00:00:00")) +
          make_dt_interval(lit(0), col("h"), lit(0), lit(0))).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q_dataset_card: planted sources read exact volume, quality, dup share, and median") {
    // d1/d3 duplicate within A and d4 repeats the text in B — the dup
    // flag counts CROSS-source occurrences, so all three are dups
    val dir = docsDir(Seq(
      (1L, "x y z", "A"), (2L, "d e", "A"), (3L, "x y z", "A"),
      (4L, "x y z", "B"), (5L, "f g h i", "B")))
    val rows = q("q_dataset_card", dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    def q4(ws: Int) = // no stopwords, all-distinct words in every planted doc
      math.floor((0.5 * 1.0 + 0.3 * 1.0 + 0.2 * math.min(ws / 100.0, 1.0)) * 10000 + 0.5)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val a = rows("A")
    assert(a.getAs[Long]("n_docs") === 3L && a.getAs[Long]("n_langs") === 1L)
    assert(a.getAs[Long]("total_tokens") === 8L)
    assert(a.getAs[Double]("mean_quality") === r6((q4(3) + q4(2) + q4(3)) / 3 / 10000.0))
    assert(a.getAs[Double]("exact_dup_share") === r6(2.0 / 3))
    assert(a.getAs[Double]("p50_tokens") === 3.0, "middle of {2,3,3}")
    val b = rows("B")
    assert(b.getAs[Long]("n_docs") === 2L && b.getAs[Long]("total_tokens") === 7L)
    assert(b.getAs[Double]("exact_dup_share") === 0.5, "d4's text lives in A too")
    assert(b.getAs[Double]("p50_tokens") === 3.5, "even count averages the middle pair")
  }

  test("q_nemenyi: a fixed within-day ordering gives the closed-form pairwise q") {
    val dir = eventsDir(Seq("lo", "mid", "hi"), 4, {
      case ("lo", _) => 1
      case ("mid", _) => 2
      case (_, _) => 3
    })
    val rows = q("q_nemenyi", dir).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) -> r).toMap
    // per-day ranks always (hi=3, lo=1, mid=2): mean ranks 3, 1, 2;
    // q = |Δmean| / sqrt(k(k+1)/(6n)) = |Δ| / sqrt(12/24) = |Δ|·√2
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val unit = math.sqrt(3.0 * 4 / (6.0 * 4))
    val hiLo = rows(("hi", "lo"))
    assert(hiLo.getAs[Double]("mean_rank_a") === 3.0 &&
      hiLo.getAs[Double]("mean_rank_b") === 1.0)
    assert(hiLo.getAs[Double]("q_stat") === r6(2.0 / unit))
    assert(rows(("hi", "mid")).getAs[Double]("q_stat") === r6(1.0 / unit))
    assert(rows(("lo", "mid")).getAs[Double]("q_stat") === r6(1.0 / unit))
  }

  test("q_gumbel_maxima: planted peak hours give the exact moment fit; constant is NULL") {
    val dir = eventsDir(Seq("flat", "peaky"), 2, {
      case ("flat", _) => 1   // one event/day → daily hourly-max ≡ 1
      case ("peaky", 0) => 1  // max 1
      case ("peaky", _) => 49 // 24·2+1 → hour 0 holds 3, others 2 → max 3
    })
    val rows = q("q_gumbel_maxima", dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val fl = rows("flat") // zero variance: the fit is undefined, not 0/0
    assert(fl.getAs[Long]("n_days") === 2L && fl.getAs[Double]("max_mean") === 1.0)
    assert(fl.isNullAt(fl.fieldIndex("beta")) && fl.isNullAt(fl.fieldIndex("mu")) &&
      fl.isNullAt(fl.fieldIndex("p_exceed_2x")))
    val pk = rows("peaky") // maxima {1, 3}: m = 2, sample var = 2
    val m = 2.0; val v = (2 * 10.0 - 4.0 * 4) / (2.0 * 1)
    assert(v === 2.0)
    val beta = math.sqrt(v * 6.0) / 3.141592653589793
    val mu = m - 0.5772156649015329 * beta
    assert(pk.getAs[Double]("max_mean") === 2.0)
    assert(pk.getAs[Double]("beta") === r6(beta))
    assert(pk.getAs[Double]("mu") === r6(mu))
    assert(pk.getAs[Double]("p_exceed_2x") ===
      r6(1 - math.exp(-math.exp(-(2 * m - mu) / beta))))
  }

  test("two-sample family (CvM/W1/AD/Cliffs): separated samples read their closed forms; identical samples read 0") {
    import spark.implicits._
    def mk(prefix: String, vals: Seq[(String, Double)]): String = {
      val dir = tempDir(prefix)
      vals.zipWithIndex.map { case ((t, v), i) =>
        (i.toLong, "2024-01-10 12:00:00", i.toLong, t, v)
      }.toDF("event_id", "tss", "user_id", "event_type", "value")
        .select(col("event_id"), to_timestamp(col("tss")).as("ts"), col("user_id"),
          col("event_type"), col("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    // all purchase mass below all click mass: the one interior pooled
    // cell carries gap = 1 for its 2 observations → t9 = 2e9,
    // T = (2·2/4²)·2 = 1/2
    val sep = mk("cs_cvm_sep", Seq(("purchase", 1.0), ("purchase", 1.0),
      ("click", 2.0), ("click", 2.0)))
    val r = q("q_cramer_von_mises", sep).head()
    assert(r.getAs[Long]("n1") === 2L && r.getAs[Long]("n2") === 2L)
    assert(r.getAs[Double]("t_stat") === 0.5)
    // identical distributions: every cumulative gap is exactly zero
    val same = mk("cs_cvm_same", Seq(("purchase", 1.0), ("purchase", 2.0),
      ("click", 1.0), ("click", 2.0)))
    assert(q("q_cramer_von_mises", same).head().getAs[Double]("t_stat") === 0.0)

    // the other three faces of the same grid, on the same fixtures.
    // Separated (all purchase mass at 1.0, all click mass at 2.0):
    //  W1 = the 1.0 value-unit the mass must travel — exactly 1.0
    //    (one interior cell: dev = 2·2, width = 100 cents → tw = 400,
    //     400/(2·2·100) = 1);
    //  AD: the one interior cell has m=2, D=4, B=2, N=4 →
    //    2·16/(2·2·2·2) = 2.0;
    //  Cliff's δ: every purchase sits BELOW every click → δ = −1.
    val rw = q("q_wasserstein_1d", sep).head()
    assert(rw.getAs[Long]("n1") === 2L && rw.getAs[Double]("w1") === 1.0)
    assert(q("q_anderson_darling", sep).head().getAs[Double]("a2") === 2.0)
    assert(q("q_cliffs_delta", sep).head().getAs[Double]("delta") === -1.0)
    // identical distributions: all three read exactly zero
    assert(q("q_wasserstein_1d", same).head().getAs[Double]("w1") === 0.0)
    assert(q("q_anderson_darling", same).head().getAs[Double]("a2") === 0.0)
    assert(q("q_cliffs_delta", same).head().getAs[Double]("delta") === 0.0)

    // the PMF and pairwise-expectation members on the same fixtures.
    // Separated: zero per-cell mass overlap → BC = 0, H² = 1; energy
    // D = 2·E|X−Y| − 0 − 0 = 2·(the 1.0 value-unit distance) = 2.
    val rh = q("q_hellinger", sep).head()
    assert(rh.getAs[Double]("bhattacharyya") === 0.0)
    assert(rh.getAs[Double]("hellinger_sq") === 1.0)
    assert(q("q_energy_dist", sep).head().getAs[Double]("energy_d") === 2.0)
    // identical: full overlap (BC = 1, H² = 0) and zero energy
    val rh2 = q("q_hellinger", same).head()
    assert(rh2.getAs[Double]("bhattacharyya") === 1.0)
    assert(rh2.getAs[Double]("hellinger_sq") === 0.0)
    assert(q("q_energy_dist", same).head().getAs[Double]("energy_d") === 0.0)
  }

  test("q_periodogram: a planted weekly comb reads best_period 7 with the exact latticed fraction; constant series read NULL") {
    // type "comb": 10 events on d ≡ 0 (mod 7), 3 otherwise, 28 days —
    // a 7-periodic signal. Analytically frac(p=7) = 1/3 for the
    // 1-in-7 comb (A_true = 4c, B = 0, Σr̃² = 24c²/7, c = 7); every
    // non-multiple period carries ~0 and p=14 exactly 0 (a 7-periodic
    // series has no energy at frequency 1/14 over 2 full 14-cycles).
    // "flat" is constant → ssr = 0 → NULL best_period and frac.
    val dir = eventsDir(Seq("comb", "flat"), 28, {
      case ("comb", d) => if (d % 7 == 0) 10 else 3
      case _           => 5
    })
    val rows = q("q_periodogram", dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val comb = rows("comb")
    assert(comb.getAs[Long]("best_period") === 7L)
    assert(comb.getAs[Long]("n_days") === 28L)
    // replicate the exact lattice arithmetic: D=28, T=4·10+24·3=112,
    // r_d = 28·y − 112 ∈ {168, −28}; residue sums over p=7 then the
    // 1e-6 cos/sin lattice
    val d28 = (0 until 28).map(d => if (d % 7 == 0) 28L * 10 - 112 else 28L * 3 - 112)
    val ssr = d28.map(r => r * r).sum
    def l6(v: Double) = math.floor(v * 1e6 + 0.5).toLong
    val sr = (0 until 7).map(res => (0 until 28).filter(_ % 7 == res).map(d28).sum)
    val a6 = (0 until 7).map(res => sr(res) * l6(math.cos(2 * math.Pi * res / 7))).sum
    val b6 = (0 until 7).map(res => sr(res) * l6(math.sin(2 * math.Pi * res / 7))).sum
    val frac = (a6.toDouble * a6 + b6.toDouble * b6) * 2 / (1e12 * 28 * ssr)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(comb.getAs[Double]("spectral_frac") === r6(frac))
    assert(math.abs(frac - 1.0 / 3) < 1e-4, s"analytic check: $frac vs 1/3")
    assert(rows("flat").isNullAt(rows("flat").fieldIndex("best_period")))
    assert(rows("flat").isNullAt(rows("flat").fieldIndex("spectral_frac")))
    // lattice-boundary guard: none of the 104 fixed angles' cos/sin
    // lands within 1e-3 of a .5 rounding boundary, so a last-ulp libm
    // disagreement between engines cannot flip a lattice cell
    val worst = (for {
      p <- 2 to 14; res <- 0 until p
      v <- Seq(math.cos(2 * math.Pi * res / p), math.sin(2 * math.Pi * res / p))
    } yield math.abs(v * 1e6 + 0.5 - math.round(v * 1e6 + 0.5))).min
    assert(worst > 1e-3, s"a trig lattice cell sits $worst from its boundary")
  }

  test("q_quade: range-weighted perfect consistency reads the closed-form F") {
    // k=2, n=3 days: lo = d+1, hi = 3(d+1) — ranges 2, 4, 6 rank the
    // days 1, 2, 3 (q2 = 2, 4, 6); within-day ranks always (lo, hi) =
    // (1, 2) so r2−(k+1) = ∓1 and S2 = ∓q2: T_lo = −12, T_hi = 12,
    // ΣT² = 288, ΣS2² = 112 ⇒ F = 2·288/(3·112 − 288) = 12
    val dir = eventsDir(Seq("lo", "hi"), 3, {
      case ("lo", d) => d + 1
      case (_, d)    => 3 * (d + 1)
    })
    val r = q("q_quade", dir).collect().head
    assert(r.getAs[Long]("n_days") === 3L && r.getAs[Long]("n_types") === 2L)
    assert(r.getAs[Double]("quade_f") === 12.0)
    // fully tied design: every S2 = 0 ⇒ the F denominator vanishes ⇒ NULL
    val tied = eventsDir(Seq("a", "b"), 3, (_, _) => 5)
    val rt = q("q_quade", tied).collect().head
    assert(rt.isNullAt(rt.fieldIndex("quade_f")))
  }

  test("q_yule_walker: an alternating series reads the closed-form AR(2) poles") {
    // osc: 10,20,10,20 over 4 days — centered ±5 ⇒ c0=1600, c1=−1200,
    // c2=800 (scaled residuals 4y−60 = ∓20): r1=−0.75, r2=0.5,
    // φ1 = c1(c0−c2)/(c0²−c1²) = −6/7, φ2 = (c2c0−c1²)/(c0²−c1²) = −1/7
    val dir = eventsDir(Seq("osc", "flat"), 4, {
      case ("osc", d) => if (d % 2 == 0) 10 else 20
      case _          => 5
    })
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val rows = q("q_yule_walker", dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val o = rows("osc")
    assert(o.getAs[Long]("n_days") === 4L)
    assert(o.getAs[Double]("r1") === -0.75)
    assert(o.getAs[Double]("r2") === 0.5)
    assert(o.getAs[Double]("phi1") === r6(-6.0 / 7))
    assert(o.getAs[Double]("phi2") === r6(-1.0 / 7))
    // constant series: c0 = 0 ⇒ every readout NULL
    val f = rows("flat")
    for (c <- Seq("r1", "r2", "phi1", "phi2"))
      assert(f.isNullAt(f.fieldIndex(c)), s"flat $c")
  }

  test("q_cronbach_alpha: co-moving items read 1, anti-moving items the closed-form negative") {
    // B = A + 1 day over day: item variances 6 + 6, day-total variance
    // 24 ⇒ α = 2·(1 − 12/24) = 1 (perfect internal consistency)
    val dir = eventsDir(Seq("A", "B"), 3, {
      case ("A", d) => d
      case (_, d)   => d + 1
    })
    val r = q("q_cronbach_alpha", dir).collect().head
    assert(r.getAs[Long]("n_days") === 3L && r.getAs[Long]("n_types") === 2L)
    assert(r.getAs[Double]("alpha") === 1.0)
    // A = (0,1,2), B = (2,0,1): item variances 6 + 6, day totals
    // (2,1,3) ⇒ vt = 6 ⇒ α = 2·(1 − 12/6) = −2 (items anti-move)
    val anti = eventsDir(Seq("A", "B"), 3, {
      case ("A", d) => d
      case (_, d)   => (d + 2) % 3
    })
    assert(q("q_cronbach_alpha", anti).collect().head.getAs[Double]("alpha") === -2.0)
  }

  test("q_perm_entropy: a monotone ramp reads 0, a strict alternation the two-pattern entropy") {
    // trend: strictly increasing ⇒ every triple realizes pattern 012 ⇒
    // H = 0, top_pattern 0; alt: 10,20,10,20 ⇒ triples alternate
    // patterns 1 (acb: peak middle) and 2 (bac: valley middle) equally
    // ⇒ H = ln 2 / ln 6 = log₆2, top_pattern 1 (count tie → min pat)
    val dir = eventsDir(Seq("trend", "alt"), 4, {
      case ("trend", d) => d + 1
      case (_, d)       => if (d % 2 == 0) 10 else 20
    })
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val m = q("q_perm_entropy", dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(m("trend").getAs[Long]("n_triples") === 2L)
    assert(m("trend").getAs[Double]("perm_entropy") === 0.0)
    assert(m("trend").getAs[Long]("top_pattern") === 0L)
    val e9 = 2 * math.floor(0.5 * math.log(2.0) * 1e9 + 0.5).toLong
    assert(m("alt").getAs[Double]("perm_entropy") ===
      r6(e9 / 1e9 / 1.791759469228055))
    assert(m("alt").getAs[Long]("top_pattern") === 1L)
  }

  test("q_icc: perfect day agreement reads 1, a pure type offset reads the k=2 floor") {
    // A = B = d+1: every within-day pair agrees exactly ⇒ MSW = 0,
    // MSB = 72/(2·9·2) = 2 ⇒ ICC = 1
    val agree = eventsDir(Seq("A", "B"), 3, { case (_, d) => d + 1 })
    val r = q("q_icc", agree).collect().head
    assert(r.getAs[Long]("n_days") === 3L && r.getAs[Long]("n_types") === 2L)
    assert(r.getAs[Double]("msb") === 2.0)
    assert(r.getAs[Double]("msw") === 0.0)
    assert(r.getAs[Double]("icc") === 1.0)
    // A = d+1, B = 3−d: day sums constant ⇒ MSB = 0, MSW = 4/3 ⇒
    // ICC = −1, the exact −1/(k−1) floor at k = 2
    val anti = eventsDir(Seq("A", "B"), 3, {
      case ("A", d) => d + 1
      case (_, d)   => 3 - d
    })
    assert(q("q_icc", anti).collect().head.getAs[Double]("icc") === -1.0)
  }

  test("q_spectral_entropy: the weekly comb replays the exact lattice pipeline; flat reads NULL") {
    // independent plain-Scala replica of the latticed spectrum →
    // shares → entropy fold, on the q_periodogram comb fixture
    val dir = eventsDir(Seq("comb", "flat"), 28, {
      case ("comb", d) => if (d % 7 == 0) 10 else 3
      case _           => 5
    })
    val d28 = (0 until 28).map(d => if (d % 7 == 0) 28L * 10 - 112 else 28L * 3 - 112)
    val ssr = d28.map(r => r * r).sum
    def l6(v: Double) = math.floor(v * 1e6 + 0.5).toLong
    val f6 = (2 to 14).map { p =>
      val sr = (0 until p).map(res => (0 until 28).filter(_ % p == res).map(d28).sum)
      val a6 = (0 until p).map(res => sr(res) * l6(math.cos(2 * math.Pi * res / p))).sum
      val b6 = (0 until p).map(res => sr(res) * l6(math.sin(2 * math.Pi * res / p))).sum
      val frac = (a6.toDouble * a6 + b6.toDouble * b6) * 2 / (1e12 * 28 * ssr)
      math.floor(frac * 1e6 + 0.5).toLong
    }
    val tot6 = f6.sum
    val e9 = f6.filter(_ > 0).map(v =>
      math.floor(v.toDouble / tot6 * math.log(tot6.toDouble / v) * 1e9 + 0.5).toLong)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expectH = r6(e9.sum / 1e9 / 2.5649493574615367)
    val expectPeak = r6(f6.max.toDouble / tot6)
    val rows = q("q_spectral_entropy", dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rows("comb").getAs[Double]("spectral_entropy") === expectH)
    assert(rows("comb").getAs[Double]("peak_share") === expectPeak)
    assert(rows("comb").getAs[Long]("n_days") === 28L)
    val f = rows("flat")
    assert(f.isNullAt(f.fieldIndex("spectral_entropy")))
    assert(f.isNullAt(f.fieldIndex("peak_share")))
  }

  test("q_filter_cascade: five planted docs land in their five cells with the right cascade stages") {
    // survivor text A; dup pair shares text B (doc 5 keeps, doc 6
    // drops at stage 4); doc 2 has no en markers (predictor ties to
    // 'de', lang = en → stage 1); doc 3 is short (stage 2); doc 4 is
    // marker-led 'the'-spam (lang ok, long, quality 0.17 → stage 3)
    def filler(pfx: String, n: Int) = (1 to n).map(i => f"$pfx$i%02d").mkString(" ")
    val textA = "column sort key " + filler("wa", 50)
    val textB = "column sort key " + filler("wb", 50)
    val docs = Seq(
      (1L, textA, "s1"),
      (2L, filler("xn", 53), "s1"),
      (3L, "column sort key za1 za2 za3", "s1"),
      (4L, "column sort key " + Seq.fill(60)("the").mkString(" "), "s1"),
      (5L, textB, "s1"),
      (6L, textB, "s1"))
    assert(textA.length >= 200 && docs(1)._2.length >= 200 && docs(3)._2.length >= 200)
    val rows = q("q_filter_cascade", docsDir(docs)).collect().map { r =>
      (r.getAs[Long]("lang_ok"), r.getAs[Long]("len_ok"),
        r.getAs[Long]("quality_ok"), r.getAs[Long]("dup_ok")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("removed_at_stage"))
    }.toMap
    assert(rows((1L, 1L, 1L, 1L)) === ((2L, 0L)), "survivors: doc 1 + keeper 5")
    assert(rows((0L, 1L, 1L, 1L)) === ((1L, 1L)), "doc 2 drops at lang")
    assert(rows((1L, 0L, 1L, 1L)) === ((1L, 2L)), "doc 3 drops at length")
    assert(rows((1L, 1L, 0L, 1L)) === ((1L, 3L)), "doc 4 drops at quality")
    assert(rows((1L, 1L, 1L, 0L)) === ((1L, 4L)), "doc 6 drops at dup")
    assert(rows.size === 5)
  }

  test("q_capture_recapture: a SimHash-only permuted pair gives the asymmetric Chapman closed form") {
    // docs 1,2 identical → caught by BOTH detectors (same shingles,
    // same word bag). docs 3,4 are word-for-word REVERSALS: SimHash is
    // order-free (identical bag → identical signature → caught) while
    // the 3-shingle MinHash sees disjoint shingle sets (missed).
    // doc 5 is unrelated filler. nA = 1, nB = 2, nAB = 1 →
    // Chapman = (2·3/2) − 1 = 2, recall_lsh = 1/2, recall_simhash = 1.
    val fwd = "alpha bravo charlie delta echo foxtrot golf hotel"
    val rev = fwd.split(" ").reverse.mkString(" ")
    val both = "column sort key merge scan filter"
    val docs = Seq((1L, both, "s1"), (2L, both, "s1"),
      (3L, fwd, "s1"), (4L, rev, "s1"),
      (5L, "zulu yankee xray whiskey victor uniform", "s1"))
    val r = q("q_capture_recapture", docsDir(docs)).head()
    assert(r.getAs[Long]("n_lsh") === 1L)
    assert(r.getAs[Long]("n_simhash") === 2L)
    assert(r.getAs[Long]("n_both") === 1L)
    assert(r.getAs[Double]("chapman_est") === 2.0)
    assert(r.getAs[Double]("est_recall_lsh") === 0.5)
    assert(r.getAs[Double]("est_recall_simhash") === 1.0)
  }

  test("q_compaction_plan: three 20000-byte shards cut into next-fit bins at the 32 KiB target") {
    // doc_ids 0,1,2 land in shards 0,1,2; start offsets 0, 20000,
    // 40000 → bins 0, 0, 1: bin 0 holds 2 inputs / 40000 bytes
    // (overfull, fill ≈ 1.22), bin 1 holds the remainder
    val body = "x" * 20000
    val docs = Seq((0L, body, "s1"), (1L, body, "s1"), (2L, body, "s1"))
    val rows = q("q_compaction_plan", docsDir(docs)).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_inputs"), r.getAs[Long]("bytes"), r.getAs[Double]("fill"))).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(rows(0L) === ((2L, 40000L, r6(40000.0 / 32768))))
    assert(rows(1L) === ((1L, 20000L, r6(20000.0 / 32768))))
    assert(rows.size === 2)
  }

  test("robust value screens: a planted outlier leaves the trimmed mean; Bowley reads +1 on max right skew") {
    import spark.implicits._
    def mk(prefix: String, vals: Seq[(String, Double)]): String = {
      val dir = tempDir(prefix)
      vals.zipWithIndex.map { case ((t, v), i) =>
        (i.toLong, "2024-01-10 12:00:00", i.toLong, t, v)
      }.toDF("event_id", "tss", "user_id", "event_type", "value")
        .select(col("event_id"), to_timestamp(col("tss")).as("ts"), col("user_id"),
          col("event_type"), col("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    // n = 10, k = 1: the 1000.0 outlier and the 1.0 minimum both drop,
    // trimmed mean = mean(2..9) = 5.5 (the raw mean is 103.9)
    val trim = mk("cs_trim", (1 to 9).map(i => ("buy", i.toDouble)) :+ ("buy", 1000.0))
    val rt = q("q_trimmed_mean", trim).head()
    assert(rt.getAs[Long]("n") === 10L)
    assert(rt.getAs[Double]("trimmed_mean") === 5.5)
    // [1,1,1,2,10]: q1 = rank-2 probe = 1, median = rank-3 = 1,
    // q3 = rank-4 = 2 → Bowley = (2 + 1 − 2)/(2 − 1) = +1 (max right
    // skew); a symmetric [1,2,3] reads exactly 0
    val skew = mk("cs_bowley", Seq(("a", 1.0), ("a", 1.0), ("a", 1.0),
      ("a", 2.0), ("a", 10.0), ("b", 1.0), ("b", 2.0), ("b", 3.0)))
    val rows = q("q_quantile_skew", skew).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rows("a").getAs[Double]("bowley") === 1.0)
    assert(rows("a").getAs[Double]("median_val") === 1.0)
    assert(rows("b").getAs[Double]("bowley") === 0.0)
    // a constant series has q3 = q1 → NULL skew, not 0/0
    val const = mk("cs_bowley_const", Seq(("c", 5.0), ("c", 5.0)))
    assert(q("q_quantile_skew", const).head()
      .isNullAt(q("q_quantile_skew", const).head().fieldIndex("bowley")))
  }

  test("q_sprt: an all-purchase stream accepts H1 on the computable day; a balanced one continues at llr exactly 0") {
    // 5 purchases/day, no clicks: each day adds 5·ln(11/9) ≈ 1.0034 to
    // the LLR, crossing ln 19 ≈ 2.944 on day index 2 → 2024-01-03
    val up = eventsDir(Seq("purchase"), 5, (_, _) => 5)
    val r = q("q_sprt", up).head()
    assert(r.getAs[String]("decision") === "accept_h1")
    assert(r.getAs[String]("decision_day") === "2024-01-03")
    // perfectly balanced days add EXACTLY zero (L1 = −L0 for the
    // symmetric hypotheses) — llr is 0.0, not a float residue
    val bal = eventsDir(Seq("purchase", "click"), 6, (_, _) => 4)
    val rb = q("q_sprt", bal).head()
    assert(rb.getAs[String]("decision") === "continue")
    assert(rb.isNullAt(rb.fieldIndex("decision_day")))
    assert(rb.getAs[Double]("final_llr") === 0.0)
    // all-click: H0 accepted symmetrically on the same day index
    val dn = eventsDir(Seq("click"), 5, (_, _) => 5)
    assert(q("q_sprt", dn).head().getAs[String]("decision") === "accept_h0")
  }

  test("q_power_analysis: the closed-form fixture sizes 16 per arm; a zero effect reads NULL") {
    import spark.implicits._
    def mk(prefix: String, vals: Seq[(String, Double)]): String = {
      val dir = tempDir(prefix)
      vals.zipWithIndex.map { case ((t, v), i) =>
        (i.toLong, "2024-01-10 12:00:00", i.toLong, t, v)
      }.toDF("event_id", "tss", "user_id", "event_type", "value")
        .select(col("event_id"), to_timestamp(col("tss")).as("ts"), col("user_id"),
          col("event_type"), col("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    // purchase {1, 3} (mean 2, s² = 2·10⁴ cents²), click {1, 1}
    // (mean 1, s² = 0): δ = 100 cents, σ̄² = 10⁴ →
    // n = ⌈2·10⁴·(1.959964 + 0.841621)²/10⁴⌉ = ⌈15.698⌉ = 16
    val d = mk("cs_power", Seq(("purchase", 1.0), ("purchase", 3.0),
      ("click", 1.0), ("click", 1.0)))
    val r = q("q_power_analysis", d).head()
    assert(r.getAs[Double]("observed_delta") === 1.0)
    assert(r.getAs[Double]("pooled_sd") === 1.0)
    assert(r.getAs[Long]("n_required_per_arm") === 16L)
    // identical means: a zero effect cannot be sized
    val z = mk("cs_power_zero", Seq(("purchase", 2.0), ("purchase", 4.0),
      ("click", 3.0), ("click", 3.0)))
    val rz = q("q_power_analysis", z).head()
    assert(rz.isNullAt(rz.fieldIndex("n_required_per_arm")))
  }

  test("evaluation metrics: the 4-event fixture reads closed-form AUC/AP/ECE/Brier") {
    import spark.implicits._
    // purchases {3.00, 2.00}, clicks {1.00, 2.00} (cents 300/200 vs
    // 100/200): AUC = (1 + 1 + 1 + ½)/4 = 0.875, Gini = 0.75;
    // AP blocks desc: prec 1 at 300, 2/3 at 200 → (1e6 + 666667)/2e6
    // → 0.833334 on the lattice; prevalence 0.5. mx = 300 → bins
    // 3/6/9; ECE = (⌊1e6/3⌉·2)/4e6 → 0.166667; Brier = 0.166667 with
    // reliability 0.041667, resolution 0.125, uncertainty 0.25 (s is
    // constant within every bin, so rel − res + unc ties out exactly).
    val dir = tempDir("cs_evalm")
    Seq(("purchase", 3.0), ("purchase", 2.0), ("click", 1.0), ("click", 2.0))
      .zipWithIndex.map { case ((t, v), i) =>
        (i.toLong, "2024-01-10 12:00:00", i.toLong, t, v)
      }.toDF("event_id", "tss", "user_id", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"), col("user_id"),
        col("event_type"), col("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val auc = q("q_auc_roc", dir).head()
    assert(auc.getAs[Double]("auc") === 0.875)
    assert(auc.getAs[Double]("gini") === 0.75)
    val ap = q("q_pr_auc", dir).head()
    assert(ap.getAs[Double]("pr_auc") === 0.833334)
    assert(ap.getAs[Double]("prevalence") === 0.5)
    val cal = q("q_calibration", dir).collect()
      .map(r => r.getAs[Long]("bin") -> r).toMap
    assert(cal.keySet === Set(3L, 6L, 9L))
    assert(cal(3L).getAs[Double]("mean_pred") === 0.333333)
    assert(cal(3L).getAs[Double]("frac_pos") === 0.0)
    assert(cal(6L).getAs[Double]("mean_pred") === 0.666667)
    assert(cal(6L).getAs[Double]("frac_pos") === 0.5)
    assert(cal(9L).getAs[Double]("frac_pos") === 1.0)
    assert(cal(3L).getAs[Double]("ece") === 0.166667)
    val br = q("q_brier", dir).head()
    assert(br.getAs[Double]("brier") === 0.166667)
    assert(br.getAs[Double]("reliability") === 0.041667)
    assert(br.getAs[Double]("resolution") === 0.125)
    assert(br.getAs[Double]("uncertainty") === 0.25)
    // half-range threshold: mx=300 → positive at cents 300/200, not
    // 100: TP=2, FN=0, FP=1, TN=1 → P=2/3, R=1, F1=0.8, ACC=0.75,
    // MCC = 2/√12
    val cm = q("q_confusion_matrix", dir).head()
    assert((cm.getAs[Long]("tp"), cm.getAs[Long]("fp"),
      cm.getAs[Long]("fn"), cm.getAs[Long]("tn")) === ((2L, 1L, 0L, 1L)))
    assert(cm.getAs[Double]("precision") === 0.666667)
    assert(cm.getAs[Double]("recall") === 1.0)
    assert(cm.getAs[Double]("f1") === 0.8)
    assert(cm.getAs[Double]("accuracy") === 0.75)
    assert(cm.getAs[Double]("mcc") ===
      math.floor(2.0 / math.sqrt(12.0) * 1e6 + 0.5) / 1e6)
  }

  test("ranking metrics: the 3-supplier fixture reads closed-form NDCG/MRR/P@10") {
    import spark.implicits._
    // one nation, suppliers 1/2/3 with (train, test) cents
    // (300, 0), (200, 100), (100, 400): predicted order 1,2,3 →
    // DCG6 = ⌊100·w2·1e6⌉ + ⌊400·w3·1e6⌉ = 63092975 + 200000000;
    // ideal order 3,2,1 → IDCG6 = 400000000 + 63092975.
    // First relevant predicted rank = 2 → RR = 0.5; hits = 2 of
    // n_rel = 2 → P@10 = 0.2, R@10 = 1.0.
    val dir = tempDir("cs_rank")
    Seq(
      (1L, "1997-03-01 00:00:00", 3.0),
      (2L, "1997-03-01 00:00:00", 2.0),
      (3L, "1997-03-01 00:00:00", 1.0),
      (2L, "1998-03-01 00:00:00", 1.0),
      (3L, "1998-03-01 00:00:00", 4.0))
      .toDF("l_suppkey", "sd", "l_extendedprice")
      .select(col("l_suppkey"), to_timestamp(col("sd")).as("l_shipdate"),
        col("l_extendedprice"), lit(0.0).as("l_discount"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 0), (2L, 0), (3L, 0)).toDF("s_suppkey", "s_nationkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((0, "ALPHA")).toDF("n_nationkey", "n_name")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/nation.parquet")
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val nd = q("q_ndcg", dir).head()
    val expNdcg = r6(263092975.0 / 463092975.0)
    assert(nd.getAs[Double]("ndcg_10") === expNdcg)
    assert(nd.getAs[Double]("mean_ndcg") ===
      r6(math.floor(263092975.0 / 463092975.0 * 1e6 + 0.5) / 1e6))
    val mr = q("q_mrr", dir).head()
    assert(mr.getAs[Long]("first_rel_rank") === 2L)
    assert(mr.getAs[Double]("rr") === 0.5)
    assert(mr.getAs[Double]("mrr") === 0.5)
    val pk = q("q_precision_at_k", dir).head()
    assert(pk.getAs[Long]("hits_at_10") === 2L)
    assert(pk.getAs[Long]("n_rel") === 2L)
    assert(pk.getAs[Double]("p_at_10") === 0.2)
    assert(pk.getAs[Double]("r_at_10") === 1.0)
    assert(pk.getAs[Double]("macro_p10") === 0.2)
  }

  test("q_qini: the 4-user fixture reads the closed-form incremental-conversion curve") {
    import spark.implicits._
    // users by volume: u3 (4 ev, T, conv), u1 (3 ev, T), u2 (2 ev, C,
    // conv), u0 (1 ev, C) → deciles 1..4. Control arm is empty through
    // decile 2 (qini NULL); d3: qini = 1 − 1·2/1 = −1, uplift = −0.5;
    // d4: qini = 0, uplift = 0.
    val dir = tempDir("cs_qini")
    val evs =
      Seq((3L, "purchase", 200.0)) ++ Seq.fill(3)((3L, "click", 1.0)) ++
        Seq.fill(3)((1L, "click", 1.0)) ++
        Seq((2L, "purchase", 200.0), (2L, "click", 1.0)) ++
        Seq((0L, "click", 1.0))
    evs.zipWithIndex.map { case ((u, t, v), i) => (i.toLong, u, t, v) }
      .toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(lit("2024-01-10 12:00:00")))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = q("q_qini", dir).collect().map(r => r.getAs[Long]("decile") -> r).toMap
    assert(rows.keySet === Set(1L, 2L, 3L, 4L))
    assert(rows(1L).isNullAt(rows(1L).fieldIndex("qini")))
    assert(rows(2L).isNullAt(rows(2L).fieldIndex("qini")))
    assert(rows(3L).getAs[Double]("qini") === -1.0)
    assert(rows(3L).getAs[Double]("uplift") === -0.5)
    assert(rows(4L).getAs[Double]("qini") === 0.0)
    assert(rows(4L).getAs[Double]("uplift") === 0.0)
    assert(rows(1L).getAs[Long]("n_t") === 1L)
    assert(rows(3L).getAs[Long]("conv_c") === 1L)
  }

  test("q_blocking_quality: an identical pair among strangers reads PC=1, RR=1-1/6") {
    import spark.implicits._
    // docs 1 and 2 are byte-identical (Jaccard 1 — in truth AND in the
    // banding, since identical shingle sets give identical signatures);
    // docs 3/4 share no shingle with anything. n = 4 → 6 possible
    // pairs, 1 candidate, 1 true, 1 hit.
    val dir = tempDir("cs_blockq")
    Seq(
      (1L, "alpha beta gamma delta", "en", "s0"),
      (2L, "alpha beta gamma delta", "en", "s0"),
      (3L, "one two three four five", "en", "s0"),
      (4L, "cinq six sept huit neuf", "fr", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val r = q("q_blocking_quality", dir).head()
    assert(r.getAs[Long]("n_candidates") === 1L)
    assert(r.getAs[Long]("n_true_pairs") === 1L)
    assert(r.getAs[Long]("n_hit") === 1L)
    assert(r.getAs[Double]("pairs_completeness") === 1.0)
    assert(r.getAs[Double]("candidate_precision") === 1.0)
    assert(r.getAs[Double]("reduction_ratio") === r6(1 - 1.0 / 6))
  }

  test("q_lm_dirichlet: the 3-doc fixture reads its closed-form query likelihoods") {
    import spark.implicits._
    // en corpus: d1 "data data query x", d2 "data y z w", d3 "a b c d"
    // → toks 12, cf(data)=3, cf(query)=1, cf(scan)=0 (OOV → zero
    // contribution). Scores replicate the exact formula tree.
    val dir = tempDir("cs_lmd")
    Seq((1L, "data data query x"), (2L, "data y z w"), (3L, "a b c d"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    def sc(tf1: Double, tf2: Double, dl: Double) =
      r4(math.log((tf1 + 2000.0 * 3 / 12) / (dl + 2000.0)) +
        math.log((tf2 + 2000.0 * 1 / 12) / (dl + 2000.0)))
    val rows = q("q_lm_dirichlet", dir).collect()
      .map(r => r.getAs[Long]("rk") -> (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
      .toMap
    assert(rows(1L) === ((1L, sc(2, 1, 4))))
    assert(rows(2L) === ((2L, sc(1, 0, 4))))
    assert(rows(3L) === ((3L, sc(0, 0, 4))))
    assert(rows.size === 3)
  }

  test("q_ppl_bucket: the three-tier fixture terciles into head/middle/tail exactly") {
    import spark.implicits._
    // six en docs, 4 trigrams each: two all-"aaa" (the most probable
    // trigram, c=10 of T=24), two mixed, two all-rare (c=2 each). The
    // self-trained model puts the repeats at the top: buckets must be
    // exactly {head: the aaaaaa pair, middle: aaabbb, tail: abcdef}.
    val dir = tempDir("cs_pplb")
    Seq((1L, "aaaaaa"), (2L, "aaaaaa"), (3L, "aaabbb"), (4L, "aaabbb"),
      (5L, "abcdef"), (6L, "abcdef"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def t9(c: Long) = math.floor(math.log(c.toDouble / 24) * 1e9 + 0.5)
    def m4(lp9: Double, n: Long) = math.floor(lp9 / (n * 1e9) * 1e4 + 0.5)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val m4Head = m4(4 * t9(10), 4)                    // aaaaaa: 4x "aaa"
    val m4Mid = m4(t9(10) + 3 * t9(2), 4)             // aaa + aab/abb/bbb
    val m4Tail = m4(4 * t9(2), 4)                     // four rare trigrams
    val rows = q("q_ppl_bucket", dir).collect()
      .map(r => r.getAs[String]("bucket") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("mean_lp"))).toMap
    assert(rows.keySet === Set("head", "middle", "tail"))
    assert(rows("head") === ((2L, r6(2 * m4Head / (2 * 1e4)))))
    assert(rows("middle") === ((2L, r6(2 * m4Mid / (2 * 1e4)))))
    assert(rows("tail") === ((2L, r6(2 * m4Tail / (2 * 1e4)))))
  }

  test("q_woe_iv: the two-brand fixture reads its closed-form WoE and IV") {
    import spark.implicits._
    // brand A: 2 good + 1 bad; brand B: 2 good + 0 bad → G=4, B=1,
    // k=2: gsA = 2.5/5, bsA = 1.5/2, woeA = ln(2/3);
    // gsB = 2.5/5, bsB = 0.5/2, woeB = ln 2.
    val dir = tempDir("cs_woe")
    Seq((1L, "N"), (1L, "N"), (1L, "R"), (2L, "N"), (2L, "A"))
      .toDF("l_partkey", "l_returnflag")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "A"), (2L, "B")).toDF("p_partkey", "p_brand")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def iv9(gs: Double, bs: Double) =
      math.floor((gs - bs) * math.log(gs / bs) * 1e9 + 0.5)
    val ivA = iv9(0.5, 0.75); val ivB = iv9(0.5, 0.25)
    val rows = q("q_woe_iv", dir).collect()
      .map(r => r.getAs[String]("p_brand") -> r).toMap
    assert(rows("A").getAs[Long]("n_good") === 2L)
    assert(rows("A").getAs[Long]("n_bad") === 1L)
    assert(rows("A").getAs[Double]("woe") === r6(math.log(0.5 / 0.75)))
    assert(rows("B").getAs[Double]("woe") === r6(math.log(0.5 / 0.25)))
    assert(rows("A").getAs[Double]("iv_term") === r6(ivA / 1e9))
    assert(rows("B").getAs[Double]("iv_term") === r6(ivB / 1e9))
    assert(rows("A").getAs[Double]("iv") === r6((ivA + ivB) / 1e9))
  }

  test("q_textrank: the 4-word path replays three PageRank rounds by hand") {
    import spark.implicits._
    // "a b c d" under window 2 → edges ab, bc, cd, ac, bd; degrees
    // 2,3,3,2. An independent plain-Scala replication of the three
    // damped rounds must match the distributed run (symmetry pairs
    // b=c and a=d tie on the 1e-6 lattice, so word order decides).
    val dir = tempDir("cs_trank")
    Seq((1L, "a b c d")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val adj = Map("a" -> Seq("b", "c"), "b" -> Seq("a", "c", "d"),
      "c" -> Seq("a", "b", "d"), "d" -> Seq("b", "c"))
    var pr = adj.keys.map(_ -> 0.25).toMap
    for (_ <- 1 to 3)
      pr = adj.map { case (w, ns) =>
        w -> (0.15 / 4 + 0.85 * ns.map(u => pr(u) / adj(u).size).sum)
      }
    val rows = q("q_textrank", dir).collect()
      .map(r => r.getAs[Long]("rk") ->
        (r.getAs[String]("word"), r.getAs[Double]("textrank"))).toMap
    assert(rows.size === 4)
    assert(rows(1L)._1 === "b"); assert(rows(2L)._1 === "c")
    assert(rows(3L)._1 === "a"); assert(rows(4L)._1 === "d")
    rows.values.foreach { case (w, v) =>
      assert(math.abs(v - pr(w)) < 2e-6, s"$w: $v vs ${pr(w)}")
    }
  }

  test("q_srm: a balanced split reads chi2 1/3, an all-treatment split flags") {
    import spark.implicits._
    def mk(prefix: String, users: Seq[Long]): String = {
      val dir = tempDir(prefix)
      users.zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("event_id", "user_id")
        .withColumn("ts", to_timestamp(lit("2024-01-10 12:00:00")))
        .withColumn("event_type", lit("click")).withColumn("value", lit(1.0))
        .withColumn("props", lit("{}"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    val r1 = q("q_srm", mk("cs_srm1", Seq(0L, 1L, 2L))).head()
    assert((r1.getAs[Long]("n_t"), r1.getAs[Long]("n_c")) === ((1L, 2L)))
    assert(r1.getAs[Double]("chi2") === math.floor(1.0 / 3 * 1e6 + 0.5) / 1e6)
    assert(r1.getAs[Long]("srm_flag") === 0L)
    val r2 = q("q_srm", mk("cs_srm2", (0 until 10).map(i => 2L * i + 1))).head()
    assert((r2.getAs[Long]("n_t"), r2.getAs[Long]("n_c")) === ((10L, 0L)))
    assert(r2.getAs[Double]("chi2") === 10.0)
    assert(r2.getAs[Long]("srm_flag") === 1L)
  }

  test("q_token_novelty: the 10-doc fixture reads its exact freshness curve") {
    import spark.implicits._
    // ids 0..9 → one doc per slice (mx = 9). Slice 0 introduces {a, b},
    // slice 1 half-repeats ("a c"), slice 2 repeats fully; the tail is
    // all "a" → novelty 1.0, 0.5, 0.0, then zeros; cum types 2, 3, 3…
    val dir = tempDir("cs_tnov")
    val texts = Seq("a b", "a c", "a b") ++ Seq.fill(7)("a")
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = q("q_token_novelty", dir).collect()
      .map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(rows.size === 10)
    assert(rows(0L).getAs[Double]("novelty_share") === 1.0)
    assert(rows(0L).getAs[Long]("new_types") === 2L)
    assert(rows(1L).getAs[Double]("novelty_share") === 0.5)
    assert(rows(2L).getAs[Double]("novelty_share") === 0.0)
    assert(rows(9L).getAs[Double]("novelty_share") === 0.0)
    assert(rows(2L).getAs[Long]("cum_types") === 3L)
    assert(rows(9L).getAs[Long]("cum_types") === 3L)
  }

  test("q_keyphrase: the filler-corpus fixture reads its closed-form RAKE scores") {
    import spark.implicits._
    // ten filler tokens dominate frequency (the data-driven stop set);
    // doc 6 then holds one 2-word phrase "alpha beta" and the isolated
    // "gamma": degree/freq = 2/1, 2/1, 1/1 → ranks alpha, beta, gamma.
    val dir = tempDir("cs_rake")
    val filler = (0 until 10).map(i => s"f$i").mkString(" ")
    val docs = (1L to 5L).map(i => (i, filler)) :+ (6L, "f0 alpha beta f1 gamma")
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = q("q_keyphrase", dir).collect()
      .map(r => r.getAs[Long]("rk") ->
        (r.getAs[String]("keyword"), r.getAs[Long]("freq"),
          r.getAs[Long]("degree"), r.getAs[Double]("score"))).toMap
    assert(rows.size === 3)
    assert(rows(1L) === (("alpha", 1L, 2L, 2.0)))
    assert(rows(2L) === (("beta", 1L, 2L, 2.0)))
    assert(rows(3L) === (("gamma", 1L, 1L, 1.0)))
  }

  test("q_embed_dim: planted rank-1 and rank-2 spectra read effective_dim 1 and 2") {
    import spark.implicits._
    def write(dir: String, rows: Seq[(Long, Array[Float])]): Unit =
      rows.toDF("vec_id", "embedding").withColumn("label", lit(0))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def vec(vals: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0.0f); vals.foreach { case (i, v) => a(i) = v }; a
    }
    // all variance in dim 0 → PR = 1; unit variance → trace_var = 1
    val d1 = tempDir("cs_edim1")
    write(d1, Seq(1L -> vec(0 -> 1f), 2L -> vec(0 -> -1f),
      3L -> vec(0 -> 1f), 4L -> vec(0 -> -1f)))
    val r1 = q("q_embed_dim", d1).head()
    assert(r1.getAs[Double]("effective_dim") === 1.0)
    assert(r1.getAs[Double]("trace_var") === 1.0)
    // two independent equal-variance dims → PR = 2
    val d2 = tempDir("cs_edim2")
    write(d2, Seq(
      1L -> vec(0 -> 1f, 1 -> 1f), 2L -> vec(0 -> 1f, 1 -> -1f),
      3L -> vec(0 -> -1f, 1 -> 1f), 4L -> vec(0 -> -1f, 1 -> -1f)))
    val r2 = q("q_embed_dim", d2).head()
    assert(r2.getAs[Double]("effective_dim") === 2.0)
    assert(r2.getAs[Double]("trace_var") === 2.0)
  }

  test("q_target_encode: the two-brand fixture reads its exact shrunk means and LOO sd") {
    import spark.implicits._
    val dir = tempDir("cs_tenc")
    // brand A: revenues 10, 20; brand B: 30 → N = 3, prior = 20;
    // encA = (30 + 20·20)/22 = 430/22, looA sd = √(var(10,20)/1) = 5;
    // encB = 430/21, looB NULL (n = 1)
    Seq((1L, 10.0), (1L, 20.0), (2L, 30.0)).toDF("l_partkey", "l_extendedprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "A"), (2L, "B")).toDF("p_partkey", "p_brand")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    val rows = q("q_target_encode", dir).collect()
      .map(r => r.getAs[String]("p_brand") -> r).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(rows("A").getAs[Double]("enc") === r6(430.0 / 22))
    assert(rows("A").getAs[Double]("loo_sd") === 5.0)
    assert(rows("B").getAs[Double]("enc") === r6(430.0 / 21))
    assert(rows("B").isNullAt(rows("B").fieldIndex("loo_sd")))
  }

  test("q_seasonal_anomaly: a planted spike is the worst day and the flat type reads zero anomalies") {
    // type "spiky": constant 10/day except day 14 at 100 over 28 days;
    // type "flat": constant 10/day (every residual exactly 0 → median
    // 0 → fence 0 → nothing exceeds it strictly). Expected counts are
    // derived from the ALREADY-VERIFIED q_decompose residuals with the
    // same lower-median MAD fence replicated in Scala.
    val dir = eventsDir(Seq("spiky", "flat"), 28, {
      case ("spiky", 14) => 100
      case _             => 10
    })
    val rows = q("q_seasonal_anomaly", dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val flat = rows("flat")
    assert(flat.getAs[Long]("n_anomalies") === 0L)
    val spiky = rows("spiky")
    assert(spiky.getAs[String]("worst_day") === "2024-01-15") // day idx 14
    // replicate the fence on q_decompose's residuals
    val resid = q("q_decompose", dir).collect()
      .filter(_.getAs[String]("event_type") == "spiky")
      .map(r => math.abs(r.getAs[Double]("residual")))
      .sorted
    val med = resid((resid.length + (resid.length % 2)) / 2 - 1)
    val expect = resid.count(_ > 4.4478 * med)
    assert(spiky.getAs[Long]("n_anomalies") === expect.toLong)
    assert(expect >= 1, s"the spike must trip the fence (median $med)")
  }

  test("q_paired_t: a growing gap reads t = sqrt(15); a constant offset reads NULL, not 0/0") {
    // hi = 2(d+1), lo = d+1 over 4 days: d_i = 1,2,3,4 → n = 4,
    // Σd = 10, Σd² = 30, mean = 2.5, var = 5/3, t = 2.5/√(5/12) = √15
    val dom = eventsDir(Seq("hi", "lo"), 4, {
      case ("hi", d) => 2 * (d + 1)
      case (_, d)    => d + 1
    })
    val r = q("q_paired_t", dom).head()
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getAs[Long]("n_days") === 4L)
    assert(r.getAs[Double]("mean_diff") === 2.5)
    assert(r.getAs[Double]("t_stat") === r6(math.sqrt(15)))
    // constant offset: every diff is exactly 3 → variance 0 → NULL
    val const = eventsDir(Seq("hi", "lo"), 4, {
      case ("hi", _) => 5
      case _         => 2
    })
    val rc = q("q_paired_t", const).head()
    assert(rc.getAs[Double]("mean_diff") === 3.0)
    assert(rc.isNullAt(rc.fieldIndex("t_stat")))
  }

  test("q_wilcoxon_signed: dominant pairs hit the max W+; symmetric alternation reads z = 0") {
    val dom = eventsDir(Seq("hi", "lo"), 4, {
      case ("hi", d) => 2 * (d + 1) // 2,4,6,8
      case (_, d) => d + 1          // 1,2,3,4 → d = 1,2,3,4 all positive
    })
    val r = q("q_wilcoxon_signed", dom).head()
    assert(r.getAs[String]("type_a") === "hi" && r.getAs[String]("type_b") === "lo")
    assert(r.getAs[Long]("n_nonzero") === 4L)
    assert(r.getAs[Double]("w_plus") === 10.0, "all four ranks positive: W+ = n(n+1)/2")
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("z") === r6(5.0 / math.sqrt(7.5)))
    val sym = eventsDir(Seq("alt", "flat"), 4, {
      case ("alt", d) => if (d % 2 == 0) 2 else 1
      case (_, d) => if (d % 2 == 0) 1 else 2 // d = +1,−1,+1,−1
    })
    val rs = q("q_wilcoxon_signed", sym).head()
    assert(rs.getAs[Long]("n_nonzero") === 4L)
    assert(rs.getAs[Double]("w_plus") === 5.0, "two of four tied ranks (avg 2.5) positive")
    assert(rs.getAs[Double]("z") === 0.0,
      "W+ at its expectation must read exactly zero through the tie-corrected variance")
  }

  test("q_nelson_aalen: planted lifetimes give exact hazard terms and FH survival") {
    // lives 1h,2h (group irrelevant here),10h,11h churned + a censored
    // sentinel (life 20h, holds the horizon): risk sets 5,4,3,2
    val dir = survivalDir("cs_na", Seq(
      (0L, 0L, 1L), (2L, 0L, 2L), (1L, 0L, 10L), (3L, 0L, 11L), (4L, 80L, 20L)))
    val rows = q("q_nelson_aalen", dir).collect()
    assert(rows.map(r => (r.getAs[Long]("t_hour"), r.getAs[Long]("n_risk"),
      r.getAs[Long]("d_events"))).toSeq ===
      Seq((1L, 5L, 1L), (2L, 4L, 1L), (10L, 3L, 1L), (11L, 2L, 1L)))
    def t9(x: Double) = math.floor(x * 1e9 + 0.5).toLong
    val h9 = Seq(1.0 / 5, 1.0 / 4, 1.0 / 3, 1.0 / 2).map(t9).scanLeft(0L)(_ + _).tail
    val v9 = Seq(1.0 / 25, 1.0 / 16, 1.0 / 9, 1.0 / 4).map(t9).scanLeft(0L)(_ + _).tail
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("cum_hazard") === r6(h9(i) / 1e9), s"H at row $i")
      assert(r.getAs[Double]("hazard_var") === r6(v9(i) / 1e9), s"V at row $i")
      assert(r.getAs[Double]("survival_fh") === r6(math.exp(-(h9(i) / 1e9))), s"S at row $i")
    }
    // FH dominates the product-limit curve everywhere (exp(−x) ≥ 1−x)
    val km = q("q_kaplan_meier", dir).collect().map(r => r.getAs[Double]("survival"))
    rows.map(_.getAs[Double]("survival_fh")).zip(km).foreach { case (fh, s) =>
      assert(fh >= s, "Fleming–Harrington must dominate Kaplan–Meier")
    }
  }

  test("q_log_rank: separated groups match the hand hypergeometric; symmetric reads 0") {
    // group A (even ids) dies at 1h,2h; group B (odd) at 10h,11h; one
    // censored A sentinel at 20h → risk sets n=5,4,3,2 / n1=2,2,2,1
    val sep = survivalDir("cs_lr_sep", Seq(
      (0L, 0L, 1L), (2L, 0L, 2L), (1L, 0L, 10L), (3L, 0L, 11L), (4L, 80L, 20L)))
    val r = q("q_log_rank", sep).head()
    assert(r.getAs[Long]("n_users_a") === 3L && r.getAs[Long]("n_users_b") === 2L)
    assert(r.getAs[Long]("d_events") === 4L && r.getAs[Long]("observed_b") === 2L)
    def t9(x: Double) = math.floor(x * 1e9 + 0.5).toLong
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val e9 = Seq(2.0 * 1 / 5, 2.0 * 1 / 4, 2.0 * 1 / 3, 1.0 * 1 / 2).map(t9).sum
    val v9 = Seq((2.0 / 5) * (3.0 / 5) * 1 * 4 / 4, (2.0 / 4) * (2.0 / 4) * 1 * 3 / 3,
      (2.0 / 3) * (1.0 / 3) * 1 * 2 / 2, (1.0 / 2) * (1.0 / 2) * 1 * 1 / 1).map(t9).sum
    assert(r.getAs[Double]("expected_b") === r6(e9 / 1e9))
    assert(r.getAs[Double]("variance") === r6(v9 / 1e9))
    assert(r.getAs[Double]("chi2") ===
      r6((2.0 - e9 / 1e9) * (2.0 - e9 / 1e9) / (v9 / 1e9)))
    // identical lifetime distributions + one sentinel per group: the
    // hypergeometric expectation matches O exactly → chi2 = 0
    val sym = survivalDir("cs_lr_sym", Seq(
      (0L, 0L, 1L), (1L, 0L, 1L), (2L, 0L, 2L), (3L, 0L, 2L),
      (4L, 80L, 20L), (5L, 80L, 20L)))
    val rs = q("q_log_rank", sym).head()
    assert(rs.getAs[Long]("observed_b") === 2L)
    assert(rs.getAs[Double]("expected_b") === 2.0)
    assert(rs.getAs[Double]("variance") > 0)
    assert(rs.getAs[Double]("chi2") === 0.0,
      "symmetric groups must read exactly zero, not a lattice residue")
  }
}
