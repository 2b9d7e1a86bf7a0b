package graft

import org.apache.spark.sql.functions._

/** 10×-scale net for the r15 calendar-quadratic series operators
  * (VERDICT r15 item 6): q_matrix_profile's pair frame must be
  * |days|²-bounded PER TYPE and never corpus-scaled, and q_burst_detect
  * (post-r16 rewrite) must run ONE linear fold per type with no
  * running-prefix window. Both ride synthetic events dirs so the
  * calendar and the corpus size vary independently — exactly the two
  * axes the bounds separate. */
class SeriesScaleSpec extends SparkSpec {

  /** Synthetic events dir: `types` event types × `days` days, with a
    * day-VARYING count scale × (2 + day % 5) per (type, day) —
    * non-constant daily series so squared-distance profiles are
    * non-degenerate, and a uniform `scale` multiplier so a denser
    * corpus preserves the series SHAPE exactly (every d² scales by
    * scale², so motif/discord argmins are invariant). Timestamps
    * anchor at the Inference Anchor (2024-01-01) → dense day indices
    * from 0. */
  private def eventsDir(types: Int, days: Int, scale: Int): String = {
    val dir = tempDir(s"series_scale_${types}_${days}_$scale")
    import spark.implicits._
    val rows = for {
      t <- 0 until types; d <- 0 until days
      i <- 0 until scale * (2 + d % 5)
    } yield (s"t$t", d, i)
    rows.toDF("event_type", "d", "i")
      .withColumn("event_id", monotonically_increasing_id())
      .select(
        col("event_id"),
        (to_timestamp(lit("2024-01-01 00:00:00")) +
          make_dt_interval(col("d"), col("i") % 24, lit(0), lit(0))).as("ts"),
        (col("i") % 97).cast("long").as("user_id"),
        col("event_type"),
        (col("i") % 100).cast("double").as("value"),
        lit("""{"k": 1}""").as("props"))
      .coalesce(4)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def minTime(run: () => Long): Double = {
    val times = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      run()
      (System.nanoTime() - t0) / 1e9
    }
    times.min
  }

  test("q_matrix_profile: the pair frame is calendar-bounded — 10x corpus on a fixed calendar is output-identical and near-flat") {
    // Same 3 types × 40 days; the corpus grows 10× WITHIN each day.
    // The |days|² pair frame (and therefore every profile value that
    // depends only on the daily count SHAPE) must not notice: counts
    // scale uniformly by 10, so d² scales by 100 exactly — assert the
    // structural outputs (n_profiled, motif/discord indices) are
    // IDENTICAL, and wall-clock grows by the daily-agg scan only.
    val d1 = eventsDir(types = 3, days = 40, scale = 1)
    val d10 = eventsDir(types = 3, days = 40, scale = 10)
    val fn = SparkEntry.queries("q_matrix_profile")
    val r1 = fn(spark, d1).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("n_profiled"), r.getAs[Long]("motif_i"),
        r.getAs[Long]("motif_j"), r.getAs[Long]("discord_i"))).sortBy(_._1)
    val r10 = fn(spark, d10).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("n_profiled"), r.getAs[Long]("motif_i"),
        r.getAs[Long]("motif_j"), r.getAs[Long]("discord_i"))).sortBy(_._1)
    assert(r1.length === 3 && r1.forall(_._2 === 38L),
      s"expected n_profiled = days - 2 per type: ${r1.toSeq}")
    assert(r10 === r1,
      "a 10x-denser corpus on the same calendar changed the profile's " +
        s"structure — the pair frame is corpus-scaled:\n${r1.toSeq}\n${r10.toSeq}")
    fn(spark, d1).count() // warm plans before timing
    fn(spark, d10).count()
    val t1 = minTime(() => fn(spark, d1).count())
    val t10 = minTime(() => fn(spark, d10).count())
    // only the daily-count scan grows with the corpus; the profile work
    // is fixed at |days|² per type. Generous 4x bound = scan growth +
    // toy-scale jitter; a corpus-scaled pair frame would read ~100x.
    assert(t10 < math.max(4 * t1, t1 + 2.0),
      f"10x corpus on a fixed calendar re-priced the profile: $t1%.2fs -> $t10%.2fs")
  }

  test("q_matrix_profile: pairs grow with the calendar as |days|^2, rows as |days|") {
    // 3x the calendar at fixed per-day density: n_profiled must read
    // exactly days - 2 per type (linear), while the internal pair
    // frame grows 9x — still calendar-bounded, never corpus-bounded.
    val d3 = eventsDir(types = 3, days = 120, scale = 1)
    val rows = SparkEntry.queries("q_matrix_profile")(spark, d3).collect()
    assert(rows.length === 3 && rows.forall(_.getAs[Long]("n_profiled") === 118L))
  }

  test("q_burst_detect runs one linear fold per type — no window, and 10x days stays near-linear") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, Aggregate}
    val d1 = eventsDir(types = 3, days = 150, scale = 1)
    val fn = SparkEntry.queries("q_burst_detect")
    val df = fn(spark, d1)
    // the r15 shape labeled each day by re-folding a running
    // collect_list prefix window — O(|days|²) work and memory per
    // type. The r16 fold has NO logical Window anywhere in the plan
    // and exactly two Aggregates: daily counts, then the per-type fold.
    val lp = df.queryExecution.optimizedPlan
    assert(lp.collect { case w: LWindow => w }.isEmpty,
      s"q_burst_detect regressed to a window shape:\n$lp")
    val aggs = lp.collect { case a: Aggregate => a }
    assert(aggs.length === 2,
      s"expected daily-count + per-type fold aggregates only, got ${aggs.length}:\n$lp")
    // 10x the calendar: the quadratic shape would re-price ~100x; the
    // linear fold rides the same two aggregates. Warm first, then
    // generous 6x bound (row count does grow 10x through the scan).
    val d10 = eventsDir(types = 3, days = 1500, scale = 1)
    fn(spark, d1).count(); fn(spark, d10).count()
    val t1 = minTime(() => fn(spark, d1).count())
    val t10 = minTime(() => fn(spark, d10).count())
    assert(t10 < math.max(6 * t1, t1 + 2.0),
      f"10x days re-priced the burst fold superlinearly: $t1%.2fs -> $t10%.2fs")
    // and the labels still read the closed form on a planted burst:
    // all-quiet at y = lambda (cost identity: c0 accumulates 0-ish
    // advantage) is covered by the oracle; here assert row count only
    assert(fn(spark, d10).count() === 3L * 1500L)
  }
}
