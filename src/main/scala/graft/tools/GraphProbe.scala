package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (temporary, r18 optimization): phase timings inside the
  * iterative graph ops — snapshot cost vs per-round join/agg cost. */
object GraphProbe {
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
      val pairs = graft.Tables.load(spark, d, "lineitem")
        .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("sn"))
        .distinct()
      t("pairs-count") { pairs.count() }
      val edRaw = pairs.select(col("p").as("src"), col("sn").as("dst"))
        .unionAll(pairs.select(col("sn").as("src"), col("p").as("dst")))
      val ed = t("ed-snapshot") { graft.Q.snapshot(edRaw) }
      val labRaw = ed.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("lbl"))
      var lab = t("lab0-snapshot") { graft.Q.snapshot(labRaw) }
      for (r <- 1 to 3) {
        val nxt = ed.join(lab, ed("src") === lab("id"))
          .groupBy(ed("dst").as("nid"), col("lbl"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("nid").as("id"))
          .agg(min_by(col("lbl"), struct((-col("c")).as("nc"), col("lbl").as("l"))).as("lbl"))
        lab = t(s"round$r+snap") { graft.Q.snapshot(nxt) }
      }
      t("final-agg") {
        lab.groupBy(col("lbl").as("community"))
          .agg(count(lit(1)).as("n_nodes"))
          .orderBy(col("n_nodes").desc, col("community"))
          .limit(20).count()
      }
      // variant: no per-round snapshots, single lazy chain
      var lab2 = graft.Q.snapshot(labRaw)
      val t0 = System.nanoTime()
      for (_ <- 1 to 3) {
        lab2 = ed.join(lab2, ed("src") === lab2("id"))
          .groupBy(ed("dst").as("nid"), col("lbl"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("nid").as("id"))
          .agg(min_by(col("lbl"), struct((-col("c")).as("nc"), col("lbl").as("l"))).as("lbl"))
      }
      val n2 = lab2.groupBy(col("lbl").as("community"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("n_nodes").desc, col("community"))
        .limit(20).count()
      println(f"PHASE nosnap-3rounds    ${(System.nanoTime() - t0) / 1e9}%7.3f s (n=$n2)")
      // variant: keep ONLY the ed snapshot; lab0 and rounds fully lazy
      val t1 = System.nanoTime()
      var lab3 = labRaw
      for (_ <- 1 to 3) {
        lab3 = ed.join(lab3, ed("src") === lab3("id"))
          .groupBy(ed("dst").as("nid"), col("lbl"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("nid").as("id"))
          .agg(min_by(col("lbl"), struct((-col("c")).as("nc"), col("lbl").as("l"))).as("lbl"))
      }
      val n3 = lab3.groupBy(col("lbl").as("community"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("n_nodes").desc, col("community"))
        .limit(20).count()
      println(f"PHASE edonly-3rounds    ${(System.nanoTime() - t1) / 1e9}%7.3f s (n=$n3)")
      // variant: fully lazy, no snapshots anywhere (exchange reuse test)
      val t2 = System.nanoTime()
      var lab4 = edRaw.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("lbl"))
      for (_ <- 1 to 3) {
        lab4 = edRaw.join(lab4, edRaw("src") === lab4("id"))
          .groupBy(edRaw("dst").as("nid"), col("lbl"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("nid").as("id"))
          .agg(min_by(col("lbl"), struct((-col("c")).as("nc"), col("lbl").as("l"))).as("lbl"))
      }
      val n4 = lab4.groupBy(col("lbl").as("community"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("n_nodes").desc, col("community"))
        .limit(20).count()
      println(f"PHASE fullylazy-3round  ${(System.nanoTime() - t2) / 1e9}%7.3f s (n=$n4)")
    }
    spark.stop()
  }
}
