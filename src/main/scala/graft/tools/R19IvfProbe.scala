package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool (temporary, r19): phase + job-count attribution for
  * q_knn_ivfpq — where do the ~4-7 s go (KMeans fit jobs, PQ codebook
  * cascade, encode, shortlist)? */
object R19IvfProbe {
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
    @volatile var jobs = 0
    @volatile var stages = List.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = for { s <- si.submissionTime; c <- si.completionTime }
          yield (c - s) / 1000.0
        stages = f"  stage ${si.stageId}%4d tasks=${si.numTasks}%3d wall=${wall.getOrElse(-1.0)}%6.3f ${si.name.take(60)}" :: stages
      }
    })
    def t[A](label: String)(f: => A): A = {
      val j0 = jobs
      val t0 = System.nanoTime(); val a = f
      println(f"PHASE $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  jobs=${jobs - j0}")
      a
    }
    for (it <- 1 to 3) {
      println(s"--- iteration $it")
      t("full-query-count") {
        graft.SparkEntry.queries("q_knn_ivfpq")(spark, d).count()
      }
    }
    // phase split mirrors ivfpqKnn's structure
    import org.apache.spark.sql.functions._
    import org.apache.spark.ml.clustering.KMeans
    for (it <- 1 to 2) {
      println(s"--- phases iteration $it")
      val ef = t("ivfFeatures-build") { graft.ops.Similarity.ivfFeatures(spark, d) }
      val n = t("corpus-count") { graft.Tables.load(spark, d, "embeddings").count() }
      val k = math.max(4, math.sqrt(n.toDouble).toInt)
      val target = math.max(10000L, 50L * k)
      val sample = graft.ops.Similarity.ivfFitSample(ef, n, target)
        .coalesce(math.max(1, (target / 65536L).toInt))
        .cache()
      val km = new KMeans().setK(k).setSeed(42).setMaxIter(5).setInitMode("random")
        .setFeaturesCol("features").setPredictionCol("cell")
      val model = t("kmeans-fit") { km.fit(sample) }
      sample.unpersist(false)
      val e = graft.Tables.load(spark, d, "embeddings")
        .withColumn("de", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .select("vec_id", "embedding", "de")
      stages = Nil
      val qe = t("codebook-train-collect") {
        graft.ops.Similarity.pqReconstructed(e.select("vec_id", "de"), codes = 64)
      }
      stages.reverse.foreach(println)
      t("pqReconstructed-noop") {
        qe.write.format("noop").mode("overwrite").save()
      }
      val assigned = model.transform(ef).select(col("vec_id"), col("cell"))
      t("assign-noop") {
        assigned.write.format("noop").mode("overwrite").save()
      }
      t("full-minus-phases (shortlist)") {
        graft.SparkEntry.queries("q_knn_ivfpq")(spark, d).count()
      }
    }
    spark.stop()
  }
}
