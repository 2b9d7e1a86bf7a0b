package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.OffsetLedger

/** Hard-kill soak for the graft-kv exactly-once recipe — the sibling of
  * [[SoakCrash]] (which covers the parquet ledger sink) aimed at the
  * one window that sink cannot exhibit: the crash AFTER the kv table's
  * two-phase commit fully landed (sub-table files moved, `_SUCCESS`
  * manifest published) but BEFORE the ledger marker wrote. Plain
  * append would replay that epoch into duplicates; `OffsetLedger
  * .kvSink`'s clear-and-rewrite claims to make the replay invisible —
  * this tool proves it against a real process death.
  *
  * Orchestrator mode spawns THIS class in a child JVM in `crash` mode:
  * a rate-source stream of deterministic `(key, value)` records into
  * `kvSinkImpl`, halting (`Runtime.halt(137)` — no shutdown hooks, no
  * finally) right inside the commit→marker window of epoch
  * [[CrashEpoch]]. The orchestrator verifies the wreckage is exactly
  * that window (epoch dir present WITH a committed `_SUCCESS`, marker
  * absent — the opposite-corner state from SoakCrash's data-no-manifest
  * check), resumes from the same checkpoint in-process, and audits:
  * ledger epochs contiguous, per-epoch kv row counts == ledger counts,
  * global key coverage contiguous with zero duplicates through the
  * crash point, every manifest listing exactly the files on disk (no
  * orphans from the pre-crash attempt), and the crashed epoch's values
  * byte-equal to the deterministic value function — i.e. the replayed
  * sub-table is content-identical to a clean commit.
  *
  * Usage: sbt "runMain graft.tools.SoakCrashKv"  → one JSON verdict line.
  */
object SoakCrashKv {

  private val CrashEpoch = 3L
  private val RowsPerBatch = 500

  /** Deterministic payload: replay must reproduce these bytes exactly. */
  private def valueExpr = concat(lit("v"), col("key").cast("string"),
    lit(":"), (col("key") % 97).cast("string"))

  private def pipeline(spark: SparkSession, root: String,
                       halt: Option[Long]): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", RowsPerBatch)
      .option("startTimestamp", 600L * 1000 * 1000)
      .load()
      .select(col("value").as("key"))
      .select(col("key"), valueExpr.as("value"))
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch(OffsetLedger.kvSinkImpl(s"$root/out", s"$root/ledger", halt) _)
      .start()

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
      Files.createTempDirectory("graft_soak_crash_kv").toString))
  }

  private def crashChild(root: String): Unit = {
    val spark = session()
    val q = pipeline(spark, root, Some(CrashEpoch))
    q.awaitTermination(120000)
    spark.stop()
  }

  private def orchestrate(root: String): Unit = {
    // ---- phase 1: child JVM, killed in the commit→marker window -------
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
      "graft.tools.SoakCrashKv", "crash", root)).asJava
    val child = new ProcessBuilder(cmd).redirectErrorStream(true)
      .redirectOutput(new java.io.File(s"$root/child.log")).start()
    val exited = child.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
    if (!exited) { child.destroyForcibly(); fail("child JVM never crashed (timeout)") }
    if (child.exitValue() == 0)
      fail(s"child exited cleanly — the halt hook never fired (see $root/child.log)")

    // ---- phase 2: the wreckage must be THIS window's state ------------
    val marker = Paths.get(root, "ledger", f"epoch_$CrashEpoch%09d.json")
    val dataDir = Paths.get(root, "out", s"epoch=$CrashEpoch")
    if (Files.exists(marker)) fail("crash epoch has a ledger marker — halt fired too late")
    if (!Files.isDirectory(dataDir)) fail("crash epoch has no kv sub-table — halt fired too early")
    if (!Files.exists(dataDir.resolve("_SUCCESS")))
      fail("crash epoch's kv 2PC did not complete — wrong crash window (want committed _SUCCESS)")
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
      if (!epochs.sameElements(epochs.indices.map(_.toLong)))
        return Some(s"epoch gap: ${epochs.mkString(",")}")
      ledger.find(_._2 != RowsPerBatch.toLong).foreach { case (e, n, _, _) =>
        return Some(s"epoch $e carried $n rows, expected $RowsPerBatch")
      }
      for ((e, n, _, _) <- ledger) {
        val dir = Paths.get(root, "out", s"epoch=$e")
        // manifest ↔ disk agreement: every listed file present with no
        // orphan part files beside it (a leftover from the pre-crash
        // attempt would be an orphan — the clear must have removed it)
        val manifest = new String(Files.readAllBytes(dir.resolve("_SUCCESS")),
          StandardCharsets.UTF_8).trim.split("\n").filter(_.nonEmpty)
        val listed = manifest.map(_.split(":")(0)).toSet
        val onDisk = Files.list(dir).iterator().asScala
          .map(_.getFileName.toString).filter(_.startsWith("part-")).toSet
        if (listed != onDisk)
          return Some(s"epoch $e manifest/disk drift: listed=${listed.size} disk=${onDisk.size}")
        if (manifest.map(_.split(":")(1).toLong).sum != n)
          return Some(s"epoch $e manifest counts != ledger $n")
        // content: exactly n rows, keys match the ledger's [min,max]
        // span, values byte-equal to the deterministic generator
        val rows = spark.read.schema("key LONG, value STRING")
          .option("escape", "\"").option("multiLine", "true")
          .csv(onDisk.map(f => dir.resolve(f).toString).toSeq: _*)
        if (rows.count() != n) return Some(s"epoch $e kv rows != ledger $n")
        if (rows.filter(col("value") =!= valueExpr).count() != 0)
          return Some(s"epoch $e replayed values diverge from the deterministic payload")
      }
      // global: key coverage contiguous, zero duplicates through the crash
      val all = spark.read.schema("key LONG, value STRING")
        .option("escape", "\"").option("multiLine", "true")
        .csv(ledger.map { case (e, _, _, _) => s"$root/out/epoch=$e/part-*" }: _*)
      val total = ledger.map(_._2).sum
      val agg = all.agg(count(lit(1)), countDistinct(col("key")),
        min("key"), max("key")).head()
      if (agg.getLong(0) != total) return Some(s"kv total ${agg.getLong(0)} != ledger $total")
      if (agg.getLong(1) != total) return Some("duplicate keys across epochs")
      if (agg.getLong(2) != 0L || agg.getLong(3) != total - 1)
        return Some(s"key span [${agg.getLong(2)}, ${agg.getLong(3)}] not contiguous from 0")
      None
    }
    val verdict = audit()
    spark.stop()
    verdict match {
      case Some(v) => fail(v)
      case None =>
        println(s"""{"soak_crash_kv":"PASS","crash_epoch":$CrashEpoch,""" +
          s""""epochs_committed":${ledger.length},"rows":${ledger.map(_._2).sum},""" +
          s""""child_exit":${child.exitValue()}}""")
    }
  }

  private def fail(reason: String): Nothing = {
    println(s"""{"soak_crash_kv":"FAIL","reason":"$reason"}""")
    sys.exit(1)
  }
}
