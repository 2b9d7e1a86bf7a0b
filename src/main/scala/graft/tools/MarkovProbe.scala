package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool (temporary, r18): q_markov_attribution phase split —
  * event-window front vs the 12-round chain tail. */
object MarkovProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config(graft.Tables.NanosAsLongKey, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(200000).selectExpr("id % 10 AS k", "id * 1.0 AS v")
      .groupBy("k").sum("v").count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"PHASE $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); a
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val wu = Window.partitionBy("user_id")
        .orderBy(col("es") * graft.Q.PackBase + col("event_id"))
      val k = graft.Tables.events(spark, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          graft.Q.epochSec(col("ts")).as("es"))
        .withColumn("pb", coalesce(
          sum(when(col("event_type") === "purchase", 1).otherwise(0))
            .over(wu.rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
      val j = k.filter(col("pb") === 0)
        .withColumn("st", when(col("event_type") === "purchase", "conv")
          .otherwise(col("event_type")))
        .withColumn("rn", row_number().over(wu))
        .withColumn("nxt", lead("st", 1).over(wu))
      val tr = j.filter(col("rn") === 1)
        .select(lit("start").as("cur"), col("st").as("nxt"))
        .unionAll(j.filter(col("nxt").isNotNull)
          .select(col("st").as("cur"), col("nxt")))
        .unionAll(j.filter(col("nxt").isNull && col("st") =!= "conv")
          .select(col("st").as("cur"), lit("null").as("nxt")))
      val c = tr.groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
      val m = c.select(col("cur"), col("nxt"),
        (col("n").cast("double") /
          sum("n").over(Window.partitionBy("cur")).cast("long")).as("prob"))
      t("m-build+snap") { graft.Q.snapshot(m) }
      t("fullquery") {
        graft.SparkEntry.queries("q_markov_attribution")(spark, d).count()
      }
    }
    spark.stop()
  }
}
