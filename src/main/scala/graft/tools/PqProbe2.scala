package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (temporary, r18 optimization): phase-level timing inside
  * the ivfpq build — where do the ~6 s of pq-build actually go at
  * sf0.1 (jobs vs compute)? */
object PqProbe2 {
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
    // job-level wall-clock listener: prints every job's duration so the
    // slow phases can be attributed to scheduling vs a specific job
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = Option(starts.get(je.jobId)).getOrElse(0L)
        println(f"  job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for (a <- si.submissionTime; b <- si.completionTime) yield b - a).getOrElse(-1L)
        val m = si.taskMetrics
        if (dur > 300)
          println(f"    stage ${si.stageId}%3d ${dur / 1e3}%7.3f s tasks=${si.numTasks} " +
            f"run=${m.executorRunTime / 1e3}%6.3f deser=${m.executorDeserializeTime / 1e3}%6.3f " +
            f"gc=${m.jvmGCTime / 1e3}%6.3f cpu=${m.executorCpuTime / 1e9}%6.3f " +
            si.name.take(40))
      }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val ti = te.taskInfo
        if (ti != null && ti.duration > 500)
          println(f"      task ${ti.taskId}%4d ${ti.duration / 1e3}%7.3f s " +
            f"launch-delay included; stage=${te.stageId}")
      }
    })
    spark.range(200000).selectExpr("id % 10 AS k", "id * 1.0 AS v")
      .groupBy("k").sum("v").count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"PHASE $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); a
    }
    // after an action: walk the final physical plan and print nodes whose
    // time-ish metrics are large
    def dumpMetrics(df: org.apache.spark.sql.DataFrame, label: String): Unit = {
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        val interesting = p.metrics.filter { case (k, m) =>
          (k.contains("time") || k.contains("Time")) && m.value > 300 }
        if (interesting.nonEmpty)
          println(s"  [$label] ${p.getClass.getSimpleName} " +
            interesting.map { case (k, m) => s"$k=${m.value}" }.mkString(" "))
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => ()
          case _ => p.children.foreach(walk)
        }
      }
      walk(df.queryExecution.executedPlan)
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val e = graft.Tables.load(spark, d, "embeddings")
        .withColumn("de", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .select("vec_id", "de")
      t("corpus-count") { e.count() }
      // replicate pqSub / pqCodebook internals step by step
      val sub = e
        .select(col("vec_id"), col("de"), explode(expr("sequence(0, 3)")).as("j"))
        .select(col("vec_id"), col("j"), expr("slice(de, j*16 + 1, 16)").as("sv"))
      t("pqSub-count") { sub.count() }
      val dot: (String, String) => org.apache.spark.sql.Column = (x, y) =>
        expr(s"aggregate(zip_with($x, $y, (p, q) -> p * q), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
      def assign(src: org.apache.spark.sql.DataFrame, cbk: org.apache.spark.sql.DataFrame) =
        src.join(broadcast(cbk), "j")
          .withColumn("sc6",
            floor((dot("sv", "cv") - dot("cv", "cv") / lit(2.0)) * 1e6 + 0.5).cast("long"))
          .groupBy("vec_id", "j")
          .agg(max(struct(col("sc6"), (-col("code")).as("nc"), col("code"), col("sv"))).as("m"))
          .select(col("vec_id"), col("j"), col("m.sv").as("sv"), col("m.code").as("code"))
      def update(b: org.apache.spark.sql.DataFrame) = b
        .select(col("j"), col("code"), posexplode(col("sv")).as(Seq("p", "x")))
        .groupBy("j", "code", "p")
        .agg(sum(floor(col("x") * 1e6 + 0.5).cast("long")).as("s6"), count(lit(1)).as("n"))
        .select(col("j"), col("code"), col("p"),
          (floor(col("s6").cast("double") / col("n") + 0.5).cast("double") / 1e6).as("c"))
        .groupBy("j", "code")
        .agg(expr("transform(array_sort(collect_list(struct(p, c))), z -> z.c)").as("cv"))
      val codes = 64
      val train = sub.filter(col("vec_id") < 1024).coalesce(4)
      val c0 = sub.filter(col("vec_id") < codes)
        .select(col("j"), col("vec_id").as("code"), col("sv").as("cv"))
      t("l1-assign-only") { assign(train, c0).count() }
      t("l1-update-count") { update(assign(train, c0)).count() }
      val c1 = t("lloyd1+snap") { graft.Q.snapshot(update(assign(train, c0))) }
      t("l2-update-count") { update(assign(train, c1)).count() }
      val c2 = t("lloyd2+snap") { graft.Q.snapshot(update(assign(train, c1))) }
      val asg = assign(sub, c2).select("vec_id", "j", "code")
      t("corpus-assign") { asg.count() }
      t("corpus-assign2") { asg.count() }
      val qeJoin = asg.join(broadcast(c2), Seq("j", "code"))
      t("qe-join-only") { qeJoin.queryExecution.executedPlan.executeCollect().length }
      dumpMetrics(qeJoin, "qe-join")
      val lu = update(assign(train, c0))
      t("l1-update-again") { lu.queryExecution.executedPlan.executeCollect().length }
      dumpMetrics(lu, "l1-update")
      val qeAggPlain = qeJoin.groupBy("vec_id").agg(count(lit(1)).as("c"))
      t("qe-agg-count") { qeAggPlain.count() }
      val qeAggCl = qeJoin.groupBy("vec_id")
        .agg(collect_list(struct(col("j"), col("cv"))).as("l"))
      t("qe-agg-clist") { qeAggCl.count() }
      val qe = asg.join(broadcast(c2), Seq("j", "code"))
        .groupBy("vec_id")
        .agg(expr("flatten(transform(array_sort(collect_list(struct(j, cv))), z -> z.cv))").as("qe"))
      t("qe-full") { qe.count() }
      t("qe-full2") { qe.count() }
      // carry cv through the argmax struct instead of re-joining c2
      val qeNoJoin = sub.join(broadcast(c2), "j")
        .withColumn("sc6",
          floor((dot("sv", "cv") - dot("cv", "cv") / lit(2.0)) * 1e6 + 0.5).cast("long"))
        .groupBy("vec_id", "j")
        .agg(max(struct(col("sc6"), (-col("code")).as("nc"), col("code"), col("cv"))).as("m"))
        .groupBy("vec_id")
        .agg(expr("flatten(transform(array_sort(collect_list(struct(j, m.cv AS cv))), z -> z.cv))").as("qe"))
      t("qe-nojoin") { qeNoJoin.count() }
      t("qe-nojoin2") { qeNoJoin.count() }
    }
    spark.stop()
  }
}
