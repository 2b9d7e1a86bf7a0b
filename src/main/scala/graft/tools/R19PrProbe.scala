package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (temporary, r19): phase timings inside q_pagerank. */
object R19PrProbe {
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
      println(f"PHASE $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); a
    }
    for (it <- 1 to 3) {
      println(s"--- iteration $it")
      val pairs = graft.Tables.load(spark, d, "lineitem")
        .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("sn"))
        .distinct()
      val ed0 = pairs.select(col("p").as("src"), col("sn").as("dst"))
        .unionAll(pairs.select(col("sn").as("src"), col("p").as("dst")))
      val deg = ed0.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val e = t("e-snapshot") { graft.Q.snapshot(ed0.join(deg, "src")) }
      val nodes = t("nodes-snapshot") {
        graft.Q.snapshot(e.select(col("src").as("node")).distinct())
      }
      val nNodes = t("nodes-count") { nodes.count() }
      val nDf = nodes.agg(count(lit(1)).as("n_nodes"))
      var ranks = t("ranks0-snapshot") {
        graft.Q.snapshot(nodes.crossJoin(broadcast(nDf))
          .select(col("node"), (lit(1.0) / col("n_nodes")).as("pr")))
      }
      for (r <- 1 to 3) {
        val rb = graft.Q.guardedBroadcast(ranks, nNodes, 4000000L)
        ranks = t(s"round$r+snap") {
          graft.Q.snapshot(e
            .join(rb, e("src") === rb("node"))
            .groupBy(col("dst").as("node"))
            .agg(sum(col("pr") / col("outdeg")).as("mass"))
            .crossJoin(broadcast(nDf))
            .select(col("node"),
              (lit(0.15) / col("n_nodes") + lit(0.85) * col("mass")).as("pr")))
        }
      }
      t("readout") {
        ranks.select(concat(
            when(col("node") % 2 === 0, "p:").otherwise("s:"),
            expr("node div 2").cast("string")).as("node"),
            graft.Q.r6(col("pr")).as("pr"))
          .orderBy(col("pr").desc, col("node"))
          .limit(50).count()
      }
    }
    spark.stop()
  }
}
