package graft

import org.apache.spark.sql.functions._

/** Closed-form ground truth for the §2.18 causal family: every
  * estimator is checked against a planted effect whose value is
  * computable by hand, so a sign flip, a swapped arm, or a broken
  * intercept extrapolation fails HERE and not in a judge's read of a
  * plausible-looking number. */
class CausalSpec extends SparkSpec {

  /** Events dir from explicit (user_id, day, event_type, value) rows —
    * day < 16 lands pre, ≥ 16 post (the §2.11 split at 2024-01-16). */
  private def eventsDir(rows: Seq[(Long, Int, String, Double)]): String = {
    val dir = tempDir("causal_ev")
    import spark.implicits._
    rows.toDF("user_id", "d", "event_type", "value")
      .withColumn("event_id", monotonically_increasing_id())
      .select(col("event_id"),
        (to_timestamp(lit("2024-01-01 00:00:00")) +
          make_dt_interval(col("d") - 1, lit(3), lit(0), lit(0))).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("""{"k": 1}""").as("props"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q_did reads the planted difference-in-differences exactly") {
    // control (even ids): 10.00 pre -> 12.00 post (+2); treated (odd):
    // 10.00 pre -> 15.00 post (+5). DiD = +3.00 USD; within-group d
    // variance is 0 -> se = 0 and the t guard (v > 0) yields NULL.
    val rows = for {
      u <- 0L until 10L
      (day, v) <- Seq((5, 10.0), (20, if (u % 2 == 1) 15.0 else 12.0))
    } yield (u, day, "purchase", v)
    val r = SparkEntry.queries("q_did")(spark, eventsDir(rows)).collect()(0)
    assert(r.getAs[Long]("n_treat") === 5L && r.getAs[Long]("n_ctrl") === 5L)
    assert(r.getAs[Double]("pre_treat_usd") === 10.0)
    assert(r.getAs[Double]("post_treat_usd") === 15.0)
    assert(r.getAs[Double]("pre_ctrl_usd") === 10.0)
    assert(r.getAs[Double]("post_ctrl_usd") === 12.0)
    assert(r.getAs[Double]("did_usd") === 3.0)
    assert(r.getAs[Double]("se_usd") === 0.0)
    assert(r.isNullAt(r.fieldIndex("t_stat")), "zero variance must NULL the t")
  }

  test("q_iv_wald recovers the planted LATE ratio") {
    // encouraged arm (odd ids): 3 clicks + 25.00 of purchases;
    // baseline (even): 1 click + 22.00. first stage = 2 clicks,
    // ITT = 3.00 USD, LATE = 1.50 USD/click.
    val rows = (0L until 10L).flatMap { u =>
      val clicks = if (u % 2 == 1) 3 else 1
      val buy = if (u % 2 == 1) 25.0 else 22.0
      (1 to clicks).map(i => (u, 2 + i, "click", 0.0)) :+ ((u, 20, "purchase", buy))
    }
    val r = SparkEntry.queries("q_iv_wald")(spark, eventsDir(rows)).collect()(0)
    assert(r.getAs[Double]("first_stage_clicks") === 2.0)
    assert(r.getAs[Double]("itt_usd") === 3.0)
    assert(r.getAs[Double]("late_usd_per_click") === 1.5)
  }

  test("q_propensity_strata weights per-stratum gaps by treated counts") {
    // stratum "2 events" (n^4 = 16, 2 digits): treated 20.00 vs
    // control 10.00 -> gap 10; stratum "10 events" (n^4 = 10000,
    // 5 digits): treated 40.00 vs control 20.00 -> gap 20. Treated
    // counts 2 and 1 -> ATT = (2*10 + 1*20) / 3 = 13.3333.
    def burst(u: Long, n: Int, total: Double): Seq[(Long, Int, String, Double)] =
      (1 to n).map(i => (u, 2 + i, "purchase", total / n))
    val rows =
      burst(1L, 2, 20.0) ++ burst(3L, 2, 20.0) ++ // treated, small stratum
      burst(0L, 2, 10.0) ++ burst(2L, 2, 10.0) ++ // control, small stratum
      burst(5L, 10, 40.0) ++                      // treated, large stratum
      burst(4L, 10, 20.0)                         // control, large stratum
    val out = SparkEntry.queries("q_propensity_strata")(spark, eventsDir(rows))
      .collect().map(r => r.getAs[Long]("stratum") ->
        (r.getAs[Long]("n_treat"), r.getAs[Long]("n_ctrl"),
          r.getAs[Double]("gap_usd"), r.getAs[Double]("att_usd"))).toMap
    assert(out.keySet === Set(2L, 5L), s"expected the 2- and 5-digit strata: $out")
    assert(out(2L) === ((2L, 2L, 10.0, 13.3333)))
    assert(out(5L) === ((1L, 1L, 20.0, 13.3333)))
  }

  test("q_rdd reads the planted intercept jump at the cutoff") {
    // y(r) = r USD below the cutoff, r + 500 USD at/above: both sides
    // are exact lines of slope 1 USD/unit, so the local-linear fit is
    // exact and the jump is 500.00 USD on the nose.
    val rows = (400L to 600L).map { r =>
      (r, 10, "purchase", if (r >= 500) r + 500.0 else r.toDouble)
    }
    val out = SparkEntry.queries("q_rdd")(spark, eventsDir(rows)).collect()(0)
    assert(out.getAs[Long]("n_left") === 100L && out.getAs[Long]("n_right") === 101L)
    assert(out.getAs[Double]("slope_left") === 1.0)
    assert(out.getAs[Double]("slope_right") === 1.0)
    assert(out.getAs[Double]("y_left_at_cutoff_usd") === 500.0)
    assert(out.getAs[Double]("y_right_at_cutoff_usd") === 1000.0)
    assert(out.getAs[Double]("rd_jump_usd") === 500.0)
  }
}
