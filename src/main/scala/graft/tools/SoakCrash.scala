package graft.tools

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{OffsetLedger, Streams}

/** Hard-kill soak: prove the ledger's replay-overwrite recovery against
  * a REAL process death, not a polite stop().
  *
  * Orchestrator mode (no args beyond optional root): spawns THIS class
  * in a child JVM in `crash` mode, which runs the rate → dedup →
  * enrich → ledgered-sink pipeline and `Runtime.halt(137)`s itself in
  * the worst possible window — after epoch [[CrashEpoch]]'s data
  * parquet landed, before its ledger marker committed (halt skips
  * shutdown hooks and finally blocks: SIGKILL semantics from inside).
  * The orchestrator then verifies the wreckage looks like the designed
  * crash state (data dir for the epoch present, marker absent), RESUMES
  * the same pipeline in-process from the same checkpoint — Structured
  * Streaming replays the uncommitted epoch through the identical
  * foreachBatch, whose overwrite-then-mark ordering makes the replay
  * invisible — and audits the full Soak invariant set plus the
  * crash-specific ones: the crashed epoch is now ledgered, carries
  * exactly its batch's rows (no duplication from the half-written
  * attempt), and event_id coverage is contiguous straight through the
  * crash point.
  *
  * Usage: sbt "runMain graft.tools.SoakCrash"  → one JSON verdict line.
  */
object SoakCrash {

  private val CrashEpoch = 3L
  private val RowsPerBatch = 500

  private def pipeline(spark: SparkSession, root: String,
                       halt: Option[Long]): org.apache.spark.sql.streaming.StreamingQuery = {
    val dim = spark.range(16)
      .select(col("id").as("user_id"),
        concat(lit("seg_"), (col("id") % 4).cast("string")).as("segment"))
    Streams.enrich(
        Streams.dedupWithinWatermark(Streams.rateSource(spark, RowsPerBatch)),
        dim, "user_id")
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch(OffsetLedger.sinkImpl(s"$root/out", s"$root/ledger", halt) _)
      .start()
  }

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("crash") => crashChild(args(1))
    case rootArg => orchestrate(rootArg.getOrElse(
      Files.createTempDirectory("graft_soak_crash").toString))
  }

  /** Child mode: run until the halt hook fires (or time out loudly). */
  private def crashChild(root: String): Unit = {
    val spark = session()
    val q = pipeline(spark, root, Some(CrashEpoch))
    // the halt fires from inside foreachBatch; if it somehow doesn't,
    // exit 0 so the orchestrator flags the missing crash
    q.awaitTermination(120000)
    spark.stop()
  }

  private def orchestrate(root: String): Unit = {
    // ---- phase 1: child JVM, killed mid-epoch -------------------------
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx4g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.tools.SoakCrash", "crash", root)).asJava
    val child = new ProcessBuilder(cmd).redirectErrorStream(true)
      .redirectOutput(new java.io.File(s"$root/child.log")).start()
    val exited = child.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
    if (!exited) { child.destroyForcibly(); fail("child JVM never crashed (timeout)") }
    if (child.exitValue() == 0)
      fail(s"child exited cleanly — the halt hook never fired (see $root/child.log)")

    // ---- phase 2: the wreckage must be the designed crash state -------
    val marker = Paths.get(root, "ledger", f"epoch_$CrashEpoch%09d.json")
    val dataDir = Paths.get(root, "out", s"epoch=$CrashEpoch")
    if (Files.exists(marker)) fail("crash epoch has a ledger marker — halt fired too late")
    if (!Files.isDirectory(dataDir)) fail("crash epoch has no data dir — halt fired too early")
    val committedBefore = OffsetLedger.lastCommittedEpoch(s"$root/ledger")
    if (!committedBefore.contains(CrashEpoch - 1))
      fail(s"expected epochs 0..${CrashEpoch - 1} committed, got $committedBefore")

    // ---- phase 3: resume from the same checkpoint, then audit ---------
    val spark = session()
    val q = pipeline(spark, root, None)
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (q.isActive && System.nanoTime() < deadline) Thread.sleep(500)
    q.stop(); q.awaitTermination()

    val ledger = OffsetLedger.read(spark, s"$root/ledger")
      .orderBy("epoch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def audit(): Option[String] = {
      val epochs = ledger.map(_._1)
      if (!epochs.contains(CrashEpoch)) return Some("crashed epoch never recommitted")
      if (!epochs.sameElements(epochs.indices.map(_.toLong))) return Some(s"epoch gap: ${epochs.mkString(",")}")
      ledger.find(_._2 != RowsPerBatch.toLong).foreach { case (e, n, _, _) =>
        return Some(s"epoch $e carried $n rows, expected $RowsPerBatch")
      }
      ledger.sliding(2).foreach {
        case Array((_, _, max1, _), (e2, _, _, min2)) =>
          if (min2 != max1 + 1) return Some(s"event_id gap before epoch $e2: $max1 -> $min2")
        case _ =>
      }
      // the replayed epoch's PARQUET must hold exactly its ledger rows —
      // the overwrite must have erased the pre-crash partial attempt
      val sunk = spark.read.parquet(s"$root/out")
        .groupBy(col("epoch").cast("long").as("epoch")).count()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      ledger.foreach { case (e, n, _, _) =>
        if (sunk.getOrElse(e, 0L) != n)
          return Some(s"epoch $e: sink has ${sunk.getOrElse(e, 0L)} rows, ledger claims $n")
      }
      None
    }
    val verdict = audit()
    spark.stop()
    verdict match {
      case Some(v) => fail(v)
      case None =>
        println(s"""{"soak_crash":"PASS","crash_epoch":$CrashEpoch,""" +
          s""""epochs_committed":${ledger.length},"rows":${ledger.map(_._2).sum},""" +
          s""""child_exit":${child.exitValue()}}""")
    }
  }

  private def fail(reason: String): Nothing = {
    println(s"""{"soak_crash":"FAIL","reason":"$reason"}""")
    sys.exit(1)
  }
}
