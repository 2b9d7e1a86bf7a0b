package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (temporary, r19): attribute the lineitem distinct-pair
  * front cost — scan vs exchange vs dedup vs snapshot write. */
object R19ScanProbe {
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
      val li = graft.Tables.load(spark, d, "lineitem")
      t("scan-count") { li.count() }
      t("scan-2cols-noop") { noop(li.select("l_partkey", "l_suppkey")) }
      val pairs = li
        .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("sn"))
        .distinct()
      t("distinct-noop") { noop(pairs) }
      val ed0 = pairs.select(col("p").as("src"), col("sn").as("dst"))
        .unionAll(pairs.select(col("sn").as("src"), col("p").as("dst")))
      t("ed0-noop") { noop(ed0) }
      val deg = ed0.groupBy("src").agg(count(lit(1)).as("outdeg"))
      t("e-join-noop") { noop(ed0.join(deg, "src")) }
      t("e-join-snap") { graft.Q.snapshot(ed0.join(deg, "src")) }
      // variant: move the dedup exchange BEFORE the hash agg so the
      // single-row-group scan task only projects + writes
      val pairs2 = li
        .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("sn"))
        .repartition(col("p"), col("sn"))
        .distinct()
      t("rep-distinct-noop") { noop(pairs2) }
      val ed2 = pairs2.select(col("p").as("src"), col("sn").as("dst"))
        .unionAll(pairs2.select(col("sn").as("src"), col("p").as("dst")))
      val deg2 = ed2.groupBy("src").agg(count(lit(1)).as("outdeg"))
      t("rep-e-join-snap") { graft.Q.snapshot(ed2.join(deg2, "src")) }
      println("PARTS scan=" + li.rdd.getNumPartitions)
    }
    spark.stop()
  }
}
