package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (temporary, r19): phase attribution for q_graph_components
  * — front (coPairs), CC internals (edges snapshot, seed, rounds),
  * readout. */
object R19CcProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config(graft.Tables.NanosAsLongKey, "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(200000).selectExpr("id % 10 AS k", "id * 1.0 AS v")
      .groupBy("k").sum("v").count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"PHASE $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); a
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (it <- 1 to 3) {
      println(s"--- iteration $it")
      t("full-query-count") {
        graft.SparkEntry.queries("q_graph_components")(spark, d).count()
      }
    }
    for (it <- 1 to 2) {
      println(s"--- phases iteration $it")
      val pairs = t("coPairs-build+noop") {
        val p = graft.ops.Graph.coPairs(spark, d)
          .select(col("a").as("d1"), col("b").as("d2"))
        noop(p); p
      }
      val (labels, rounds) = t("cc-total") {
        graft.ops.TextPipeline.connectedComponentsWithRounds(pairs)
      }
      println(s"  rounds=$rounds")
      t("readout") {
        labels.groupBy("lbl").agg(count(lit(1)).as("n_nodes")).count()
      }
    }
    spark.stop()
  }
}
