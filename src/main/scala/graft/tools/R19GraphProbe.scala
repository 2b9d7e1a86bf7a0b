package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (temporary, r19 optimization): label-propagation round-shape
  * variants — current SMJ rounds vs broadcast-state rounds vs
  * single-exchange aggregation — timed warm under the bench config. */
object R19GraphProbe {
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
    val pairs = graft.Tables.load(spark, d, "lineitem")
      .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("sn"))
      .distinct()
    val ed = graft.Q.snapshot(
      pairs.select(col("p").as("src"), col("sn").as("dst"))
        .unionAll(pairs.select(col("sn").as("src"), col("p").as("dst"))))
    val lab0 = graft.Q.snapshot(
      ed.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("lbl")))
    println(s"ROWS ed=${ed.count()} lab=${lab0.count()} edParts=${ed.rdd.getNumPartitions} labParts=${lab0.rdd.getNumPartitions}")

    def roundCur(lab: DataFrame): DataFrame =
      ed.join(lab, ed("src") === lab("id"))
        .groupBy(ed("dst").as("nid"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("nid").as("id"))
        .agg(min_by(col("lbl"), struct((-col("c")).as("nc"), col("lbl").as("l"))).as("lbl"))

    def roundBc(lab: DataFrame): DataFrame =
      ed.join(broadcast(lab), ed("src") === lab("id"))
        .groupBy(ed("dst").as("nid"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("nid").as("id"))
        .agg(min_by(col("lbl"), struct((-col("c")).as("nc"), col("lbl").as("l"))).as("lbl"))

    def roundBc1x(lab: DataFrame): DataFrame =
      ed.join(broadcast(lab), ed("src") === lab("id"))
        .select(ed("dst").as("nid"), col("lbl"))
        .repartition(col("nid"))
        .groupBy(col("nid"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("nid").as("id"))
        .agg(min_by(col("lbl"), struct((-col("c")).as("nc"), col("lbl").as("l"))).as("lbl"))

    def readout(lab: DataFrame): Long =
      lab.groupBy(col("lbl").as("community"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("n_nodes").desc, col("community"))
        .limit(20).count()

    for (it <- 1 to 3) {
      println(s"--- iteration $it")
      t("cur-3r+snap") {
        var lab = lab0
        for (_ <- 1 to 3) lab = graft.Q.snapshot(roundCur(lab))
        readout(lab)
      }
      t("bc-3r+snap") {
        var lab = lab0
        for (_ <- 1 to 3) lab = graft.Q.snapshot(roundBc(lab))
        readout(lab)
      }
      t("bc1x-3r+snap") {
        var lab = lab0
        for (_ <- 1 to 3) lab = graft.Q.snapshot(roundBc1x(lab))
        readout(lab)
      }
      t("bc1x-3r-lazy") {
        var lab: DataFrame = lab0
        for (_ <- 1 to 3) lab = roundBc1x(lab)
        readout(lab)
      }
      t("bc-3r-lazy") {
        var lab: DataFrame = lab0
        for (_ <- 1 to 3) lab = roundBc(lab)
        readout(lab)
      }
    }
    spark.stop()
  }
}
