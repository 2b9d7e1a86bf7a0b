package graft

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet (SURVEY §2.1): CSV and
  * JSON-lines roundtrips with explicit schemas (inference is never
  * relied on), and a JSON read of the offset ledger's format. */
class SourcesSpec extends SparkSpec {

  test("csv roundtrip with explicit schema preserves lineitem") {
    val dir = tempDir("graft_csv")
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    li.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .schema("l_orderkey LONG, l_linenumber INT, l_quantity DOUBLE, l_returnflag STRING")
      .option("header", "true").csv(dir)
    assert(back.count() === li.count())
    assert(back.except(li).isEmpty && li.except(back).isEmpty)
  }

  test("json-lines roundtrip with explicit schema preserves events payload columns") {
    val dir = tempDir("graft_json")
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("props"),
        Q.epochSec(col("ts")).as("es"))
    ev.write.mode("overwrite").json(dir)
    val back = spark.read
      .schema("event_id LONG, user_id LONG, event_type STRING, props STRING, es LONG")
      .json(dir)
    assert(back.except(ev).isEmpty && ev.except(back).isEmpty)
    // nested JSON string survives the roundtrip and still parses
    val k = back.select(get_json_object(col("props"), "$.k").cast("long").as("k"))
    assert(k.filter(col("k").isNull).isEmpty)
  }

  test("binaryFile source ingests media blobs as binary + metadata") {
    // the multimodal ingestion path: opaque payload bytes + typed
    // metadata columns, straight from a directory of media files
    // (Multimodal.scala consumes exactly this shape). Pushdown on
    // pathGlobFilter/length keeps a 100 TB media lake scannable.
    val dir = tempDir("graft_bin")
    val payloads = (0 until 5).map { i =>
      val p = java.nio.file.Paths.get(dir, f"blob_$i%02d.bin")
      val bytes = Array.tabulate[Byte](10 + i)(j => (i * 31 + j).toByte)
      java.nio.file.Files.write(p, bytes)
      (p.getFileName.toString, bytes)
    }
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(dir)
    assert(df.count() === 5)
    // key on the file name: URI renderings (file:/ vs file:///) differ
    // between java.nio and Hadoop paths
    val got = df.select("path", "length", "content").collect()
      .map(r => r.getString(0).split('/').last ->
        (r.getLong(1), r.getAs[Array[Byte]]("content")))
      .toMap
    payloads.foreach { case (name, bytes) =>
      val (len, content) = got(name)
      assert(len === bytes.length && content.toSeq === bytes.toSeq)
    }
  }

  // ---- graft-docs: the custom DataSource V2 connector ---------------------


  test("graft-kv sink commits atomically: staged files publish with a trailing manifest") {
    import spark.implicits._
    val dir = tempDir("graft_kv")
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("key", "value")
      .repartition(2)
      .write.format("graft-kv").option("path", dir).mode("append").save()
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.count(_.startsWith("part-")) === 2, files.mkString(","))
    assert(files.contains("_SUCCESS"))
    assert(!files.contains("_staging"), "staging dir must be cleaned after commit")
    // manifest lists every published file with its row count, and the
    // data adds back up to the input
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_SUCCESS"))).trim.split("\n")
    assert(manifest.length === 2)
    assert(manifest.map(_.split(":")(1).toLong).sum === 4L)
    val back = spark.read
      .schema("key LONG, value STRING").option("header", "false")
      .csv(new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
        .map(_.getPath): _*)
    assert(back.as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("graft-kv appends never collide across jobs and the manifest merges") {
    import spark.implicits._
    val dir = tempDir("graft_kv_append")
    Seq((1L, "a"), (2L, "b")).toDF("key", "value").coalesce(1)
      .write.format("graft-kv").option("path", dir).mode("append").save()
    Seq((3L, "c")).toDF("key", "value").coalesce(1)
      .write.format("graft-kv").option("path", dir).mode("append").save()
    val files = new java.io.File(dir).listFiles().map(_.getName)
    val parts = files.filter(_.startsWith("part-"))
    // each job's queryId lands in the published name — no overwrite
    assert(parts.length === 2 && parts.distinct.length === 2, parts.mkString(","))
    // the second append EXTENDS the manifest, not replaces it
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_SUCCESS"))).trim.split("\n")
    assert(manifest.length === 2)
    assert(manifest.map(_.split(":")(1).toLong).sum === 3L)
    assert(manifest.map(_.split(":")(0)).sorted.toSeq === parts.sorted.toSeq)
    val back = spark.read.schema("key LONG, value STRING")
      .csv(new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
        .map(_.getPath): _*)
    assert(back.as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("q_merge_upsert commits through graft-kv atomically") {
    val merged = SparkEntry.queries("q_merge_upsert")(spark, sfDir)
      .select(col("event_id").as("key"),
        concat_ws("|", col("user_id"), col("event_type"), col("es"), col("value"))
          .as("value"))
      .cache()
    val dir = tempDir("graft_kv_merge")
    merged.coalesce(2)
      .write.format("graft-kv").option("path", dir).mode("append").save()
    // manifest counts add up to the merged state, and the keys roundtrip
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_SUCCESS"))).trim.split("\n")
    assert(manifest.map(_.split(":")(1).toLong).sum === merged.count())
    val back = spark.read.schema("key LONG, value STRING")
      .csv(new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
        .map(_.getPath): _*)
    assert(back.select("key").except(merged.select("key")).isEmpty)
    assert(merged.select("key").except(back.select("key")).isEmpty)
    merged.unpersist()
  }

  test("graft-kv sink aborts atomically: a failed job leaves the target untouched") {
    import spark.implicits._
    val dir = tempDir("graft_kv_abort")
    // seed a prior successful write — the state the abort must preserve
    Seq((10L, "x")).toDF("key", "value").coalesce(1)
      .write.format("graft-kv").option("path", dir).mode("append").save()
    val before = new java.io.File(dir).listFiles().map(_.getName).toSet
    intercept[Exception] {
      Seq((1L, "a"), (2L, "b")).toDF("key", "value").repartition(2)
        .write.format("graft-kv").option("path", dir)
        .option("failPartition", "1").mode("append").save()
    }
    val after = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(after === before,
      s"failed write must leave the target byte-identical: $before vs $after")
  }

  test("graft-kv rolls back published files when the manifest publication fails") {
    import spark.implicits._
    val dir = tempDir("graft_kv_manifest_fail")
    // seed a prior successful write — the committed state that must
    // survive a later failed commit byte-for-byte
    Seq((10L, "x")).toDF("key", "value").coalesce(1)
      .write.format("graft-kv").option("path", dir).mode("append").save()
    val before = new java.io.File(dir).listFiles().map(_.getName).toSet
    val manifestBefore = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_SUCCESS")))
    intercept[Exception] {
      Seq((1L, "a"), (2L, "b")).toDF("key", "value").repartition(2)
        .write.format("graft-kv").option("path", dir)
        .option("failManifest", "true").mode("append").save()
    }
    // every data file the failed commit had already moved into the
    // target must be unpublished again (moved back to staging, then
    // cleaned by abort) — zero unmanifested files, manifest untouched
    val after = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(after === before,
      s"failed manifest publication must leave the target byte-identical: $before vs $after")
    val manifestAfter = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_SUCCESS")))
    assert(manifestAfter === manifestBefore)
  }

  test("graft-kv quotes delimiter/quote/newline values so legal strings round-trip") {
    import spark.implicits._
    val dir = tempDir("graft_kv_escape")
    val vals = Seq((1L, "a,b"), (2L, "say \"hi\""), (3L, "multi\nline"), (4L, "plain"))
    vals.toDF("key", "value").coalesce(1)
      .write.format("graft-kv").option("path", dir).mode("append").save()
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getPath)
    // multiLine handles the quoted embedded newline; escape='"' selects
    // RFC4180 doubled-quote semantics (Spark's default escape is
    // backslash — see the KvWriter.csvEscape scaladoc)
    val back = spark.read.schema("key LONG, value STRING")
      .option("multiLine", "true").option("escape", "\"").csv(parts: _*)
      .as[(Long, String)].collect().toSet
    assert(back === vals.toSet,
      s"RFC4180 quoting must round-trip every legal (key, value): $back")
    // the manifest counts LOGICAL rows, not physical lines
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_SUCCESS"))).trim.split("\n")
    assert(manifest.map(_.split(":")(1).toLong).sum === 4L)
  }

  test("graft-docs Trigger.AvailableNow drains the whole bounded stream in spite of rowsPerBatch") {
    // the admission-control fix (r12 review): the engine's
    // ReadAllAvailable/composite limit must win over the source's own
    // rowsPerBatch default, or a run-once drain silently stops early
    val out = tempDir("graft_docs_once_out")
    val q = spark.readStream.format("graft-docs")
      .option("rows", 300).option("rowsPerBatch", 100)
      .load()
      .writeStream.format("parquet")
      .option("checkpointLocation", tempDir("graft_docs_once_ckpt"))
      .option("path", out)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(60000) finally q.stop()
    assert(spark.read.parquet(out).count() === 300,
      "an available-now drain must admit every remaining row")
  }

  test("graft-docs batch read: deterministic rows across the requested partitions") {
    val df = spark.read.format("graft-docs")
      .option("rows", 1000).option("partitions", 8).load()
    assert(df.count() === 1000)
    assert(df.rdd.getNumPartitions === 8)
    // re-planning regenerates identical content (task-retry safety)
    val again = spark.read.format("graft-docs")
      .option("rows", 1000).option("partitions", 3).load()
    assert(df.except(again).isEmpty && again.except(df).isEmpty)
    // ids are exactly 0..999 once each; n_chars matches the payload
    assert(df.agg(countDistinct("doc_id")).head().getLong(0) === 1000)
    assert(df.filter(length(col("text")) =!= col("n_chars")).isEmpty)
  }

  test("graft-docs honors column pruning down to the scan") {
    val pruned = spark.read.format("graft-docs")
      .option("rows", 100).load().select("doc_id")
    val scanLine = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).get
    assert(scanLine.contains("doc_id") && !scanLine.contains("text"),
      s"text payload must not be materialized for a doc_id projection:\n$scanLine")
  }

  test("graft-docs micro-batch stream advances by offset and replays exactly") {
    val ckpt = tempDir("graft_docs_ckpt")
    val out = tempDir("graft_docs_out")
    def run(): Unit = {
      val q = spark.readStream.format("graft-docs")
        .option("rows", 300).option("rowsPerBatch", 100).option("partitions", 2)
        .load()
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", out)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val first = spark.read.parquet(out)
    // bounded stream drains fully: 3 batches of 100
    assert(first.count() === 300)
    assert(first.agg(countDistinct("doc_id")).head().getLong(0) === 300)
    // restart from the same checkpoint: offsets are exhausted, nothing
    // is re-emitted (exactly-once against the WAL position)
    run()
    assert(spark.read.parquet(out).count() === 300)
    // streamed content equals the batch read of the same range
    val batch = spark.read.format("graft-docs").option("rows", 300).load()
    assert(spark.read.parquet(out).except(batch).isEmpty)
  }

  test("ledger-positioned restart resumes gap-free through MicroBatchExecution") {
    // The reference's core semantic, end-to-end through the REAL
    // engine: run → stop → read the external ledger → clamp the stored
    // position against the source's live range → restart a FRESH query
    // positioned by the ledger JSON — and prove the resumed stream's
    // first admitted range starts exactly at the clamped value with
    // contiguous overall coverage. (The checkpoint-WAL resume half is
    // covered by the test above; this one is the external-store half
    // the WAL does not give you.)
    import graft.streaming.{KafkaSource, OffsetLedger}
    val out1 = tempDir("graft_resume_out1"); val led1 = tempDir("graft_resume_led1")
    val out2 = tempDir("graft_resume_out2"); val led2 = tempDir("graft_resume_led2")

    def run(rows: Int, startingOffsets: Option[String], out: String, led: String,
            ckpt: String): Unit = {
      val rd = spark.readStream.format("graft-docs")
        .option("rows", rows).option("rowsPerBatch", 100).option("partitions", 2)
      val q = startingOffsets.fold(rd)(j => rd.option("startingOffset", j)).load()
        // the ledger sink keys its stats on event_id — docs' row id is it
        .select(col("doc_id").as("event_id"), col("lang"))
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(OffsetLedger.sink(out, led) _)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    // phase 1: bounded at 300 — drains 3 epochs, then "the job stops"
    run(300, None, out1, led1, tempDir("graft_resume_ckpt1"))
    val led1Df = OffsetLedger.read(spark, led1)
    val storedPos = led1Df.agg(max("max_event_id")).head().getLong(0) + 1L
    assert(storedPos === 300L)

    // phase 2: reconstruct the resume position the reference way —
    // ledger → startingOffsets JSON → clamp against the live range
    val (clamped, adjustments) = KafkaSource.clampToRange(
      stored = Map(0 -> storedPos), earliest = Map(0 -> 0L), latest = Map(0 -> 600L))
    assert(clamped === Map(0 -> 300L) && adjustments.isEmpty)
    val resumeJson = KafkaSource.startingOffsetsJson("docs", clamped)

    // phase 3: FRESH checkpoint, FRESH query, positioned by the JSON
    val ckpt2 = tempDir("graft_resume_ckpt2")
    run(600, Some(resumeJson), out2, led2, ckpt2)

    // first admitted range starts at the clamped ledger value:
    //  - data-level: nothing below 300 was re-emitted
    val run2 = spark.read.parquet(s"$out2/epoch=*")
    assert(run2.agg(min("event_id")).head().getLong(0) === 300L)
    //  - WAL-level: batch 0's committed END offset is start + rowsPerBatch,
    //    which MicroBatchExecution can only have produced from a start
    //    of 300 (latestOffset advances rowsPerBatch past the given start)
    val walBatch0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(ckpt2, "offsets", "0")))
    assert(walBatch0.linesIterator.toSeq.last.trim === "400",
      s"batch 0 must admit (300, 400]; WAL said:\n$walBatch0")

    // contiguous coverage across the two runs: 0..599 exactly once
    val all = spark.read.parquet(s"$out1/epoch=*").select("event_id")
      .union(run2.select("event_id"))
    assert(all.count() === 600L)
    assert(all.agg(countDistinct("event_id")).head().getLong(0) === 600L)
    assert(all.agg(min("event_id"), max("event_id")).head() ===
      org.apache.spark.sql.Row(0L, 599L))

    // and the ledgers agree epoch-by-epoch with what was admitted
    val led2Df = OffsetLedger.read(spark, led2)
    assert(led2Df.agg(sum("n_rows")).head().getLong(0) === 300L)
    assert(led2Df.agg(min("min_event_id")).head().getLong(0) === 300L)
  }

  test("a stored offset past the live range clamps to latest and admits nothing") {
    import graft.streaming.KafkaSource
    // retention/truncation edge: ledger says 700, source now ends at 600
    val (clamped, adj) = KafkaSource.clampToRange(
      stored = Map(0 -> 700L), earliest = Map(0 -> 0L), latest = Map(0 -> 600L))
    assert(clamped === Map(0 -> 600L) && adj.exists(_.contains("resetting to latest")))
    val q = spark.readStream.format("graft-docs")
      .option("rows", 600).option("rowsPerBatch", 100)
      .option("startingOffset", KafkaSource.startingOffsetsJson("docs", clamped))
      .load()
      .writeStream.format("memory").queryName("graft_clamp_latest")
      .option("checkpointLocation", tempDir("graft_clamp_ckpt"))
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("graft_clamp_latest").isEmpty,
      "a stream positioned at latest over a drained range must admit zero rows")
  }

  test("per-partition clamp resumes a multi-partition stream gap-free through MicroBatchExecution") {
    // The reference's ACTUAL artifact — a Map[TopicPartition, Long] —
    // driven through the real engine with partitions in DIFFERENT
    // states: partition 0's stored offset is in-range and resumes
    // exactly there; partition 1's is corrupted past the live range,
    // clamps to latest, and admits nothing — loudly. The r12 engine
    // path was single-partition-only; this closes that gap.
    import graft.streaming.{KafkaSource, OffsetLedger}
    val out1 = tempDir("graft_mp_out1"); val led1 = tempDir("graft_mp_led1")
    val out2 = tempDir("graft_mp_out2"); val led2 = tempDir("graft_mp_led2")

    def run(rows: Int, startingOffsets: Option[String], out: String, led: String,
            ckpt: String): Unit = {
      val rd = spark.readStream.format("graft-docs")
        .option("rows", rows).option("rowsPerBatch", 40)
        .option("topicPartitions", 2)
      val q = startingOffsets.fold(rd)(j => rd.option("startingOffset", j)).load()
        .select(col("doc_id").as("event_id"), col("lang"))
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(OffsetLedger.sink(out, led) _)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    // phase 1: both partitions drain a 100-row corpus (50 offsets each;
    // p0 owns even ids, p1 odd — residue classes mod 2)
    val ckpt1 = tempDir("graft_mp_ckpt1")
    run(100, None, out1, led1, ckpt1)
    val run1 = spark.read.parquet(s"$out1/epoch=*")
    assert(run1.count() === 100L)
    assert(run1.agg(countDistinct("event_id")).head().getLong(0) === 100L)
    // WAL batch 0 committed the PER-PARTITION map end: the 40-row
    // budget ceil-shares 20/20 over the two live partitions
    val wal1Batch0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(ckpt1, "offsets", "0")))
    assert(wal1Batch0.linesIterator.toSeq.last.trim === """{"0":20,"1":20}""",
      s"batch 0 must admit 20 offsets per partition; WAL said:\n$wal1Batch0")

    // phase 2: reconstruct per-partition stored offsets the reference
    // way — p0's from the sink data (max even id 98 → offset 50, the
    // honest ledger read), p1's HAND-CORRUPTED to 500 (a ledger from a
    // topic since truncated/recreated — the out-of-range case)
    val p0Stored = run1.filter(col("event_id") % 2 === 0)
      .agg(max("event_id")).head().getLong(0) / 2 + 1
    assert(p0Stored === 50L)
    val (clamped, adjustments) = KafkaSource.clampToRange(
      stored = Map(0 -> p0Stored, 1 -> 500L),
      earliest = Map(0 -> 0L, 1 -> 0L),
      latest = Map(0 -> 150L, 1 -> 150L)) // the grown 300-row corpus: 150 offsets each
    assert(clamped === Map(0 -> 50L, 1 -> 150L))
    assert(adjustments.size === 1 && adjustments.head.contains("resetting to latest"),
      s"the p1 truncation must be reported, not silent: $adjustments")

    // phase 3: FRESH checkpoint, positioned by the per-partition JSON,
    // over the grown corpus
    val ckpt2 = tempDir("graft_mp_ckpt2")
    run(300, Some(KafkaSource.startingOffsetsJson("docs", clamped)), out2, led2, ckpt2)
    val run2 = spark.read.parquet(s"$out2/epoch=*")
    // p0 resumed at offset 50: even ids 100..298 exactly, no replay of
    // 0..98; p1 clamped to latest: NOT ONE odd id admitted
    assert(run2.filter(col("event_id") % 2 === 1).isEmpty,
      "partition 1 clamped to latest must admit nothing")
    assert(run2.count() === 100L)
    assert(run2.agg(min("event_id"), max("event_id")).head() ===
      org.apache.spark.sql.Row(100L, 298L))
    // WAL-level proof the engine planned FROM the clamped map: batch
    // 0's end advances only the live partition 0 (40-offset budget,
    // partition 1 pinned at its clamped 150)
    val wal2Batch0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(ckpt2, "offsets", "0")))
    assert(wal2Batch0.linesIterator.toSeq.last.trim === """{"0":90,"1":150}""",
      s"batch 0 must admit (50, 90] on p0 only; WAL said:\n$wal2Batch0")

    // partition 0's coverage across both runs is gap-free: every even
    // id 0..298 exactly once
    val p0All = run1.select("event_id").union(run2.select("event_id"))
      .filter(col("event_id") % 2 === 0)
    assert(p0All.count() === 150L)
    assert(p0All.agg(countDistinct("event_id")).head().getLong(0) === 150L)
    assert(p0All.agg(min("event_id"), max("event_id")).head() ===
      org.apache.spark.sql.Row(0L, 298L))
    // and the streamed multi-partition content equals the batch read of
    // the same id set (residue classes change the PLANNING, not the data)
    val batchTwin = spark.read.format("graft-docs").option("rows", 300).load()
      .select(col("doc_id").as("event_id"), col("lang"))
      .filter(col("event_id") % 2 === 0 && col("event_id") >= 100)
    assert(run2.select("event_id", "lang").except(batchTwin).isEmpty &&
      batchTwin.except(run2.select("event_id", "lang")).isEmpty)
  }

  test("ReadAllAvailable water-fills SKEWED partitions — one batch drains every row") {
    // The r13 ascending-index greedy under-drained exactly this shape:
    // remaining = [100, 1] with a ReadAllAvailable budget of 101 gave
    // p0 ceil(101/2) = 51, p1 its 1, and the leftover 49 never flowed
    // back — under a single-batch trigger those rows were simply never
    // admitted (ADVICE r13, high). Trigger.Once (deprecated but still
    // the one trigger that runs EXACTLY one ReadAllAvailable batch
    // through MicroBatchExecution) makes the drain-or-lose semantics
    // directly observable: the fixed water-filling (ascending-remaining
    // visit order) must admit all 101 rows in that one batch.
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = tempDir("graft_wf_ckpt")
    val q = spark.readStream.format("graft-docs")
      .option("rows", 300).option("rowsPerBatch", 10)
      .option("topicPartitions", 2)
      // p0 at offset 50 of 150 (100 left), p1 at 149 of 150 (1 left)
      .option("startingOffset", """{"docs":{"0":50,"1":149}}""")
      .load()
      .writeStream.format("memory").queryName("graft_waterfill")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.Once())
      .start()
    try q.awaitTermination() finally q.stop()
    val got = spark.table("graft_waterfill")
    // p0 offsets 50..149 → even ids 100..298; p1 offset 149 → id 299
    assert(got.count() === 101L,
      s"single ReadAllAvailable batch must drain all 101 remaining rows, got ${got.count()}")
    assert(got.agg(countDistinct("doc_id")).head().getLong(0) === 101L)
    assert(got.agg(min("doc_id"), max("doc_id")).head() ===
      org.apache.spark.sql.Row(100L, 299L))
    // WAL: the one committed batch's end is FULL drain on both partitions
    val wal = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(ckpt, "offsets", "0")))
    assert(wal.linesIterator.toSeq.last.trim === """{"0":150,"1":150}""",
      s"batch 0 must end at full drain; WAL said:\n$wal")
  }

  test("changing topicPartitions across restarts of one checkpoint fails loudly at recovery") {
    // ADVICE r13 (medium): positionsOf used to backfill missing
    // partitions at 0 and drop extra WAL keys — an upgrade 2→3 would
    // replay already-consumed rows as ids re-shard across residue
    // classes, and 2→1 would silently reinterpret the id space. Kafka
    // fails this config mismatch loudly at restart; deserializeOffset
    // now does too, before any batch is planned.
    def run(ckpt: String, parts: Int): Unit = {
      val q = spark.readStream.format("graft-docs")
        .option("rows", 100).option("rowsPerBatch", 40)
        .option("topicPartitions", parts)
        .load()
        .writeStream
        // foreachBatch, not memory: the memory sink refuses checkpoint
        // RECOVERY outright, which would mask the source-side validation
        // this test exists to reach
        .foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => ())
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val ckpt = tempDir("graft_mismatch_ckpt")
    run(ckpt, 2) // commits {"0":50,"1":50}-shaped offsets to the WAL
    // growth 2 → 3: multi-key offset with the wrong key count
    val grow = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(ckpt, 3)
    }
    assert(grow.getMessage.contains("topicPartitions") ||
      Option(grow.getCause).exists(_.getMessage.contains("topicPartitions")),
      s"growth restart must name the changed option: ${grow.getMessage}")
    // shrink 2 → 1: stored keys {0,1} are not the expected {0}
    val shrink = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(ckpt, 1)
    }
    assert(shrink.getMessage.contains("topicPartitions") ||
      Option(shrink.getCause).exists(_.getMessage.contains("topicPartitions")),
      s"shrink restart must reject the key-set mismatch: ${shrink.getMessage}")
    // and the unchanged config still recovers cleanly from that WAL
    run(ckpt, 2)
    // the r14-review hole: a SINGLE-partition WAL (bare-long offsets —
    // the only shape that could ever masquerade as a legitimate
    // "upgrade") restarted at topicPartitions=3 is the one case a
    // {0}-carve-out would wave through, replaying every id ≢ 0 (mod 3)
    // as duplicates — it must be rejected like any other change
    val ckpt1p = tempDir("graft_mismatch_ckpt1p")
    run(ckpt1p, 1) // bare-long WAL entries
    val grow1toN = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(ckpt1p, 3)
    }
    assert(grow1toN.getMessage.contains("topicPartitions") ||
      Option(grow1toN.getCause).exists(_.getMessage.contains("topicPartitions")),
      s"the 1 -> N restart must fail loudly: ${grow1toN.getMessage}")
    // and the single-partition config itself still recovers
    run(ckpt1p, 1)
  }

  test("topic growth 1 -> 2 resumes through the LEDGER path: p0 at its stored offset, p1 at earliest") {
    // Kafka topic growth, the last REF-S offset semantic not driven
    // through the engine: partition count changes are NEVER a WAL
    // mutation (the test above makes that loud) — they go through a
    // FRESH checkpoint positioned from the external ledger, where
    // clampToRange's new-partitions-adopt-earliest rule makes the
    // growth explicit and REPORTED. This drives that rule through a
    // real MicroBatchExecution: the grown source resumes partition 0
    // exactly at its stored offset and starts partition 1 at earliest,
    // covering both partitions' offset ranges gap-free. (Offsets are
    // per-partition ROW positions: graft-docs re-shards ids across
    // residue classes on growth, which is exactly why the implicit WAL
    // path is rejected and this explicit, adjustment-reporting path is
    // the supported one.)
    import graft.streaming.{KafkaSource, OffsetLedger}
    val out1 = tempDir("graft_grow_out1"); val led1 = tempDir("graft_grow_led1")
    val out2 = tempDir("graft_grow_out2"); val led2 = tempDir("graft_grow_led2")

    def run(rows: Int, parts: Int, startingOffsets: Option[String], out: String,
            led: String, ckpt: String): Unit = {
      val rd = spark.readStream.format("graft-docs")
        .option("rows", rows).option("rowsPerBatch", 40)
        .option("topicPartitions", parts)
      val q = startingOffsets.fold(rd)(j => rd.option("startingOffset", j)).load()
        .select(col("doc_id").as("event_id"), col("lang"))
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(OffsetLedger.sink(out, led) _)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    // phase 1: single-partition topic, 100-row corpus fully drained;
    // the ledger's stored position is offset 100 on partition 0
    run(100, 1, None, out1, led1, tempDir("graft_grow_ckpt1"))
    val storedPos = spark.read.parquet(s"$out1/epoch=*")
      .agg(max("event_id")).head().getLong(0) + 1L
    assert(storedPos === 100L)

    // phase 2: the topic GREW to 2 partitions (and to 300 rows); the
    // ledger still knows only partition 0 — clampToRange must resume it
    // unchanged and adopt earliest for the new partition, reporting it
    val (clamped, adjustments) = KafkaSource.clampToRange(
      stored = Map(0 -> storedPos),
      earliest = Map(0 -> 0L, 1 -> 0L),
      latest = Map(0 -> 150L, 1 -> 150L))
    assert(clamped === Map(0 -> 100L, 1 -> 0L))
    assert(adjustments.size === 1 &&
      adjustments.head.contains("no stored offset, starting at earliest"),
      s"the adopted partition must be reported, not silent: $adjustments")

    // phase 3: FRESH checkpoint over the grown source, positioned by
    // the clamped per-partition JSON
    val ckpt2 = tempDir("graft_grow_ckpt2")
    run(300, 2, Some(KafkaSource.startingOffsetsJson("docs", clamped)), out2, led2, ckpt2)
    val run2 = spark.read.parquet(s"$out2/epoch=*")
    // p0 resumed at offset 100: even ids 200..298 (50 rows), nothing
    // below; p1 adopted earliest: ALL odd ids 1..299 (150 rows)
    assert(run2.count() === 200L)
    val p0 = run2.filter(col("event_id") % 2 === 0)
    assert(p0.count() === 50L)
    assert(p0.agg(min("event_id"), max("event_id")).head() ===
      org.apache.spark.sql.Row(200L, 298L))
    val p1 = run2.filter(col("event_id") % 2 === 1)
    assert(p1.count() === 150L)
    assert(p1.agg(countDistinct("event_id")).head().getLong(0) === 150L)
    assert(p1.agg(min("event_id"), max("event_id")).head() ===
      org.apache.spark.sql.Row(1L, 299L))
    // WAL-level proof the engine planned FROM the grown map: batch 0's
    // 40-row budget water-fills remaining [50, 150] smallest-first —
    // p0 takes ceil(40/2)=20, p1 the rest
    val wal2Batch0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(ckpt2, "offsets", "0")))
    assert(wal2Batch0.linesIterator.toSeq.last.trim === """{"0":120,"1":20}""",
      s"batch 0 must admit 20 offsets per partition from the clamped map; WAL said:\n$wal2Batch0")
    // gap-free per-partition OFFSET coverage across the growth: p0's
    // [0,100) came from run 1, [100,150) from run 2; p1's [0,150) is
    // all run 2 — together the full grown corpus with no offset gap
    assert(run2.agg(countDistinct("event_id")).head().getLong(0) === 200L)
    val led2Df = OffsetLedger.read(spark, led2)
    assert(led2Df.agg(sum("n_rows")).head().getLong(0) === 200L)
  }
}
