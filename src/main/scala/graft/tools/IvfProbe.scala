package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (temporary): stage-level timing of the IVF kNN build. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      println(f"$label%-12s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); a
    }
    import org.apache.spark.ml.clustering.KMeans
    for (_ <- 1 to 2) {
      val e = graft.ops.Similarity.ivfFeatures(spark, sfDir)
      val n = t("count") { graft.Tables.load(spark, sfDir, "embeddings").count() }
      val k = math.max(4, math.sqrt(n.toDouble).toInt)
      val sample = graft.ops.Similarity.ivfFitSample(e, n, math.max(10000L, 50L * k)).cache()
      t("materialize") { sample.count() }
      val km = new KMeans().setK(k).setSeed(42).setMaxIter(5).setInitMode("random")
        .setFeaturesCol("features").setPredictionCol("cell")
      val model = t("fit") { km.fit(sample) }
      sample.unpersist(false)
      val assigned = model.transform(e).select(col("vec_id"), col("embedding"), col("cell"))
      t("assign") { assigned.count() }
      t("full query") { graft.ops.Similarity.ivfKnn(spark, sfDir).count() }
    }
    spark.stop()
  }
}
