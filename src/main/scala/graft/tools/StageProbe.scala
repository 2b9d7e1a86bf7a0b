package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: repeated timing of one query on a bench-shaped session. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_bloom_decontam")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
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
    spark.read.parquet(s"$sfDir/region.parquet").count()
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"run$i ${(System.nanoTime() - t0) / 1e9}%7.3f s rows=$n")
    }
    spark.stop()
  }
}
