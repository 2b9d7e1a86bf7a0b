package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (temporary, r19): per-stage wall/task attribution for the
  * lineitem distinct front. */
object R19StageProbe {
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
    @volatile var log = List.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield (c - s) / 1000.0
        log = f"stage ${si.stageId}%3d tasks=${si.numTasks}%3d wall=${wall.getOrElse(-1.0)}%6.3f exec=${si.taskMetrics.executorRunTime / 1000.0}%6.3f deser=${si.taskMetrics.executorDeserializeTime / 1000.0}%6.3f gc=${si.taskMetrics.jvmGCTime / 1000.0}%6.3f ${si.name.take(40)}" :: log
      }
    })
    val li = graft.Tables.load(spark, d, "lineitem")
    val pairs = li
      .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("sn"))
      .distinct()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (it <- 1 to 3) {
      log = Nil
      val t0 = System.nanoTime()
      noop(pairs)
      val el = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"--- distinct-noop iteration $it total=$el%.3f s")
      log.reverse.foreach(println)
    }
    spark.stop()
  }
}
