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
}
