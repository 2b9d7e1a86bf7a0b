package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.10, builder brief): media as an
  * opaque `binary` column with typed metadata, decoded/featurized in
  * per-partition batches.
  *
  * BOTH paths are real end-to-end. Images: payloads are genuine PNG
  * streams (encoded in-JVM by javax.imageio — `java.desktop` ships an
  * actual PNG codec) and the decode stage parses those bytes back into
  * pixels and measures width/height/channel means from the decoded
  * raster. Video: no standard container codec exists on this box, so
  * payloads use a custom-but-real GFV1 container (length-prefixed PNG
  * frames); the sampler genuinely parses the container and
  * pixel-decodes every sampled frame. No external media library is
  * involved; swap [[decodePng]]/[[sampleFrames]]' codec calls for a
  * heavier one (JNI/ffmpeg/ONNX) without touching the surrounding
  * plumbing. What the plumbing guarantees either way:
  *  - the schema shape (payload: binary + typed metadata + features
  *    array<float>), carried through shuffle and parquet sink;
  *  - mapPartitions batching: codec init (e.g. disabling ImageIO's
  *    tmp-file cache) happens once per partition and amortizes across
  *    that partition's rows — the same shape a Python pipeline gets
  *    from mapInPandas batches;
  *  - partition sizing: media blobs are large, so the op repartitions by
  *    doc_id before decode; at 100 TB you size partitions to keep
  *    (rows × blob size) within executor memory and let the decode stage
  *    scale horizontally with zero shuffle after repartition.
  */
object Multimodal {

  /** A "media" row: payload is an opaque blob — real PNG bytes on the
    * image path, raw utf-8 text standing in for video on the frame
    * path. */
  final case class MediaIn(doc_id: Long, mime: String, payload: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long,
      mime: String,
      size_bytes: Int,
      features: Array[Float])

  /** Deterministic raster synthesis: a w×h RGB image whose pixel values
    * are a pure function of `seed`, encoded by the JDK's real PNG
    * writer. Stands in for reading image files off a lake — the bytes
    * ARE a decodable image/png stream. */
  private def encodePngRaster(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((seed * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((seed * 17 + x * 11 + y * 3) % 256).toInt
        val b = ((seed + x.toLong * y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def encodePng(docId: Long, nChars: Long): Array[Byte] =
    encodePngRaster(docId, 4 + (docId % 13).toInt, 3 + (nChars % 7).toInt)

  /** REAL decode: parses the payload's PNG stream via javax.imageio and
    * measures the decoded raster — width, height, per-channel means in
    * [0,1], mean luminance. Runs once per partition so codec init
    * amortizes; a corrupt payload fails loudly (null image → exception)
    * rather than producing fake features. */
  private def decodePng(rows: Iterator[MediaIn]): Iterator[MediaFeatures] = {
    javax.imageio.ImageIO.setUseCache(false) // per-partition codec init: no tmp-file cache
    rows.map { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      require(img != null, s"doc ${r.doc_id}: payload is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      val (sr, sg, sb) = channelSums(img)
      val n = (w * h).toFloat * 255f
      val (mr, mg, mb) = (sr / n, sg / n, sb / n)
      val lum = 0.299f * mr + 0.587f * mg + 0.114f * mb
      MediaFeatures(r.doc_id, r.mime, r.payload.length,
        Array(w.toFloat, h.toFloat, mr, mg, mb, lum))
    }
  }

  /** Exact per-channel byte sums over a decoded raster — the ONE
    * pixel-accumulation loop under [[decodePng]] and
    * [[decodeChannelSums]] (a codec-handling fix lands in both). */
  private def channelSums(img: java.awt.image.BufferedImage): (Long, Long, Long) = {
    val (w, h) = (img.getWidth, img.getHeight)
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    (sr, sg, sb)
  }

  /** One sampled, DECODED frame of a media container. */
  final case class Frame(doc_id: Long, n_frames: Int, frame_idx: Int,
                         width: Int, height: Int, mean_lum: Float)

  /** Container magic for the synthetic video format. */
  private val FrameMagic = Array[Byte]('G', 'F', 'V', '1')

  /** Deterministic "video" synthesis: a GFV1 container — 4-byte magic,
    * 2-byte big-endian frame count, then per frame a 4-byte big-endian
    * length prefix + a REAL PNG stream (per-frame raster varies with
    * the frame index). No standard video codec exists on this box, so
    * the container is custom — but every byte of it is genuinely
    * parsed and every sampled frame genuinely pixel-decoded, which is
    * what makes the frames path stub-free. */
  private def encodeContainer(docId: Long, nChars: Long): Array[Byte] = {
    val nFrames = 2 + (nChars % 5).toInt // 2..6 frames
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(FrameMagic)
    bos.write((nFrames >> 8) & 0xff); bos.write(nFrames & 0xff)
    var i = 0
    while (i < nFrames) {
      val png = encodePngRaster(docId * 131 + i,
        4 + ((docId + i) % 5).toInt, 3 + (i % 4))
      val n = png.length
      bos.write((n >> 24) & 0xff); bos.write((n >> 16) & 0xff)
      bos.write((n >> 8) & 0xff); bos.write(n & 0xff)
      bos.write(png)
      i += 1
    }
    bos.toByteArray
  }

  /** REAL frame sampling: parses the GFV1 container (magic, count,
    * length-prefixed entries), keeps every `stride`-th frame, and
    * pixel-decodes each kept frame via javax.imageio — width, height,
    * mean luminance from the decoded raster. A real production codec
    * (JNI/ffmpeg) slots into exactly this per-partition batch shape:
    * explode-to-frames inside one partition pass, no shuffle. Corrupt
    * containers fail loudly. */
  private def sampleFrames(stride: Int)(rows: Iterator[MediaIn]): Iterator[Frame] = {
    javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
    rows.flatMap { r =>
      val p = r.payload
      require(p.length >= 6 && p(0) == 'G' && p(1) == 'F' && p(2) == 'V' && p(3) == '1',
        s"doc ${r.doc_id}: not a GFV1 container")
      val nFrames = ((p(4) & 0xff) << 8) | (p(5) & 0xff)
      var pos = 6
      val out = Vector.newBuilder[Frame]
      var i = 0
      while (i < nFrames) {
        val len = ((p(pos) & 0xff) << 24) | ((p(pos + 1) & 0xff) << 16) |
          ((p(pos + 2) & 0xff) << 8) | (p(pos + 3) & 0xff)
        pos += 4
        if (i % stride == 0) {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(p, pos, len))
          require(img != null, s"doc ${r.doc_id} frame $i: payload is not a decodable image")
          val (w, h) = (img.getWidth, img.getHeight)
          var lum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val px = img.getRGB(x, y)
              lum += 0.299 * ((px >> 16) & 0xff) + 0.587 * ((px >> 8) & 0xff) +
                0.114 * (px & 0xff)
              x += 1
            }
            y += 1
          }
          out += Frame(r.doc_id, nFrames, i, w, h, (lum / (w * h * 255.0)).toFloat)
        }
        pos += len
        i += 1
      }
      require(pos == p.length, s"doc ${r.doc_id}: trailing bytes in container")
      out.result()
    }
  }

  /** An "audio" row: payload is a REAL RIFF/WAVE PCM16 stream. */
  final case class AudioIn(event_id: Long, event_type: String, payload: Array[Byte])

  /** Per-clip integer DSP features off the DECODED samples.
    * quiet_run = the longest consecutive run of samples with
    * 10·|s| < peak (below 10% of the clip's own full scale) — the
    * silence-gap signal a trim/segmentation pass keys on. */
  final case class AudioClip(event_id: Long, event_type: String,
                             sample_rate: Int, n_samples: Int,
                             flips: Long, energy: Long, peak: Long,
                             quiet_run: Long, fp: Long)

  /** Deterministic PCM synthesis: a 64-sample 8 kHz mono sine clip
    * whose frequency keys off event_id (220..660 Hz in 110 Hz steps)
    * and whose amplitude keys off the value cents, packaged as a REAL
    * 44-byte-header RIFF/WAVE PCM16 stream — the bytes ARE a playable
    * .wav file. The sine value floors onto the 1e3 lattice BEFORE the
    * integer amplitude multiply, so every decoded sample is an exact
    * int the oracle re-derives arithmetically (only 320 distinct
    * angles corpus-wide — 5 frequencies × 64 sample indices — so the
    * libm-parity surface is tiny and pinned by the three-SF gate). */
  private def encodeWav(eventId: Long, v100: Long): Array[Byte] = {
    val f = 220 + (eventId % 5) * 110
    val a = v100 % 32 + 1
    val n = 64
    val dataLen = n * 2
    val bos = new java.io.ByteArrayOutputStream(44 + dataLen)
    def le32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    bos.write("RIFF".getBytes("US-ASCII")); le32(36 + dataLen)
    bos.write("WAVE".getBytes("US-ASCII"))
    bos.write("fmt ".getBytes("US-ASCII")); le32(16)
    le16(1); le16(1) // PCM, mono
    le32(8000); le32(16000) // sample rate, byte rate
    le16(2); le16(16) // block align, bits per sample
    bos.write("data".getBytes("US-ASCII")); le32(dataLen)
    var t = 0
    while (t < n) {
      val s3 = math.floor(math.sin(2 * math.Pi * f * t / 8000) * 1e3 + 0.5).toLong
      val sample = (a * s3).toInt // |a·s3| ≤ 32·1000 < 2^15 — no clip
      le16(sample & 0xffff)
      t += 1
    }
    bos.toByteArray
  }

  /** REAL decode: parses the RIFF/WAVE header (magics, PCM format tag,
    * channel count, sample rate, bit depth — all validated, loud on
    * corruption), reads the little-endian int16 samples, and measures
    * the integer DSP features: zero-crossing flips, Σsample² energy,
    * peak |sample|. A production codec (libsndfile/ffmpeg) slots into
    * this same per-partition batch shape. */
  private def decodeWav(rows: Iterator[AudioIn]): Iterator[AudioClip] = {
    rows.map { r =>
      val p = r.payload
      def le16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
      def le32(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
        ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)
      def tag(o: Int): String = new String(p, o, 4, "US-ASCII")
      require(p.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE" &&
        tag(12) == "fmt " && tag(36) == "data",
        s"event ${r.event_id}: payload is not a RIFF/WAVE stream")
      require(le16(20) == 1 && le16(22) == 1 && le16(34) == 16,
        s"event ${r.event_id}: not mono PCM16")
      val rate = le32(24)
      val dataLen = le32(40)
      require(p.length == 44 + dataLen, s"event ${r.event_id}: truncated data chunk")
      val n = dataLen / 2
      var flips = 0L; var energy = 0L; var peak = 0L
      var prevNeg = false
      var t = 0
      while (t < n) {
        val s = le16(44 + t * 2).toShort.toLong
        if (t > 0 && (s < 0) != prevNeg) flips += 1
        prevNeg = s < 0
        energy += s * s
        if (math.abs(s) > peak) peak = math.abs(s)
        t += 1
      }
      // second pass: longest sub-10%-of-peak run (needs peak first),
      // plus the peak-landmark fingerprint — per 16-sample window the
      // offset of the loudest sample (tie → earliest), packed as four
      // base-16 digits with a peak-magnitude nibble: the
      // constellation-hash shape an audio near-dup pass keys on
      var quiet = 0L; var run = 0L
      var fp = 0L
      var w = 0
      while (w * 16 < n) {
        var best = -1L; var bestT = 0
        var t2 = w * 16
        val end = math.min(n, w * 16 + 16)
        while (t2 < end) {
          val a = math.abs(le16(44 + t2 * 2).toShort.toLong)
          if (a > best) { best = a; bestT = t2 }
          t2 += 1
        }
        if (w < 4) fp += (bestT - w * 16).toLong << (4 * w)
        w += 1
      }
      fp += (peak % 16) * 65536L
      t = 0
      while (t < n) {
        val s = le16(44 + t * 2).toShort.toLong
        if (10 * math.abs(s) < peak) { run += 1; if (run > quiet) quiet = run }
        else run = 0
        t += 1
      }
      AudioClip(r.event_id, r.event_type, rate, n, flips, energy, peak, quiet, fp)
    }
  }

  /** The WAV ingest prefix: events → deterministic real RIFF/WAVE
    * payloads, repartitioned once for blob sizing (the pngInputs
    * discipline — no shuffle after). */
  private def wavInputs(s: SparkSession, d: String)
      : org.apache.spark.sql.Dataset[AudioIn] = {
    import s.implicits._
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("v100"))
      .as[(Long, String, Long)]
      .mapPartitions(_.map { case (id, t, v) => AudioIn(id, t, encodeWav(id, v)) })
      .toDF()
      .repartition(col("event_id"))
      .as[AudioIn]
  }

  /** The decoded-clip feature frame — exposed so the headroom probe
    * audits the SAME energy accumulator the query folds. */
  private[graft] def audioClips(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    wavInputs(s, d).mapPartitions(decodeWav).toDF()
  }

  /** The |types|-bounded audio feature grid — ONE fold shared by batch
    * q_audio_features and the s_audio_features streaming face: per
    * event_type the clip count, parsed sample rate, Σflips, Σenergy
    * and max peak — all mergeable (sums/counts/maxes), so it IS the
    * streaming groupBy state. */
  private[graft] def audioGridOf(clips: DataFrame): DataFrame =
    clips.groupBy("event_type")
      .agg(count(lit(1)).as("n_clips"),
        max("sample_rate").cast("long").as("sample_rate"),
        sum("flips").as("tf"), sum("energy").as("te"),
        max("peak").as("mp"))

  /** The (type, fingerprint) collision grid — ONE fold shared by
    * batch q_audio_fingerprint and the s_audio_fingerprint face: the
    * fingerprint domain is synthesis-bounded (amplitude × frequency
    * combinations), so the grid is mergeable counting state, never
    * clip-keyed. */
  private[graft] def audioFpGridOf(clips: DataFrame): DataFrame =
    clips.groupBy("event_type", "fp").agg(count(lit(1)).as("c"))

  /** Read-time collision readout over an [[audioFpGridOf]] grid. */
  private[graft] def audioFingerprintOf(grid: DataFrame): DataFrame =
    grid.groupBy("event_type")
      .agg(sum("c").as("n_clips"), count(lit(1)).as("n_fp"),
        Q.r6(lit(1.0) - count(lit(1)).cast("double") / sum("c")).as("dup_share"),
        max("c").as("max_collision"))
      .orderBy("event_type")

  /** Read-time readout over an [[audioGridOf]] grid — the mean-ZCR /
    * mean-energy divisions re-normalize as any cell grows. */
  private[graft] def audioFeaturesOf(grid: DataFrame): DataFrame =
    grid.select(col("event_type"), col("n_clips"), col("sample_rate"),
      Q.r6(col("tf").cast("double") / (col("n_clips") * lit(63.0))).as("mean_zcr"),
      Q.r2(col("te").cast("double") / (col("n_clips") * lit(64.0))).as("mean_energy"),
      col("mp").as("max_peak"))
      .orderBy("event_type")

  /** Stream-side decode: (event_id, event_type, v100) rows → synth WAV
    * bytes → [[decodeWav]] — the same per-partition codec batch shape
    * as the batch ingest, stream-compatible (map-only). */
  private[graft] def clipStream(
      in: org.apache.spark.sql.Dataset[(Long, String, Long)]): DataFrame = {
    val s = in.sparkSession
    import s.implicits._
    in.mapPartitions(_.map { case (id, t, v) => AudioIn(id, t, encodeWav(id, v)) })
      .mapPartitions(decodeWav).toDF()
  }

  /** The PNG ingest prefix shared by every still-image operator:
    * documents → deterministic real PNG payloads, repartitioned once
    * for blob sizing (no shuffle after). ONE home — a codec-pipeline
    * change (mime tag, partitioning) lands everywhere or nowhere. */
  private def pngInputs(s: SparkSession, d: String)
      : org.apache.spark.sql.Dataset[MediaIn] = {
    import s.implicits._
    Tables.load(s, d, "documents")
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) => MediaIn(id, "image/png", encodePng(id, nc)) })
      .toDF()
      .repartition(col("doc_id")) // size decode partitions; no shuffle after
      .as[MediaIn]
  }

  /** Full decode output (doc_id, mime, size_bytes, width, height,
    * channel means, luminance) — the pre-r11 q_multimodal_decode body,
    * kept whole for the GoldenSpec pin and downstream feature use. */
  private[graft] def decodedFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    pngInputs(s, d)
      .mapPartitions(decodePng)
      .toDF()
      .select(
        col("doc_id"), col("mime"), col("size_bytes"),
        element_at(col("features"), 1).cast("int").as("width"),
        element_at(col("features"), 2).cast("int").as("height"),
        round(element_at(col("features"), 3).cast("double"), 4).as("mean_r"),
        round(element_at(col("features"), 4).cast("double"), 4).as("mean_g"),
        round(element_at(col("features"), 5).cast("double"), 4).as("mean_b"),
        round(element_at(col("features"), 6).cast("double"), 4).as("mean_lum"))
      .orderBy("doc_id")
  }

  /** Full frame-sampling rollup — the pre-r11 q_multimodal_frames body,
    * kept whole for the GoldenSpec pin. */
  private[graft] def sampledFrameStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.load(s, d, "documents")
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) =>
        MediaIn(id, "video/gfv1", encodeContainer(id, nc)) })
      .toDF()
      .repartition(col("doc_id"))
      .as[MediaIn]
      .mapPartitions(sampleFrames(stride = 2))
      .toDF()
      .groupBy("doc_id")
      .agg(
        max(col("n_frames")).as("n_frames"),
        count(lit(1)).as("n_sampled"),
        sum(col("width") * col("height")).cast("long").as("pixels_sampled"),
        round(avg(col("mean_lum")), 4).as("avg_lum"))
      .orderBy("doc_id")
  }

  def defs: Seq[QueryDef] = Seq(

    // Binary ingest → per-partition batch decode → feature stats, with
    // a REAL PNG codec on both ends (javax.imageio): synth emits true
    // image/png bytes, decode parses them back and measures the raster.
    // No SQL engine decodes PNG, but (r11) the decoded DIMENSIONS are a
    // closed form of (doc_id, n_chars) — w = 4 + doc_id % 13, h = 3 +
    // n_chars % 7 — so the driver-checked form emits them next to a
    // raster-sanity verdict (channel means in [0,1], luminance equal to
    // the weighted channel mix) the oracle pins TRUE: a broken codec
    // round-trip now hash-mismatches cross-engine instead of hiding in
    // a rows-only count. The full channel-mean surface stays
    // golden-pinned (GoldenSpec on decodedFeatures).
    Q("q_multimodal_decode",
      """SELECT doc_id,
        |       CAST(4 + doc_id % 13 AS INT) AS width,
        |       CAST(3 + n_chars % 7 AS INT) AS height,
        |       TRUE AS raster_ok
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      decodedFeatures(s, d)
        .select(col("doc_id"), col("width"), col("height"),
          (col("mean_r").between(0, 1) && col("mean_g").between(0, 1) &&
            col("mean_b").between(0, 1) &&
            abs(col("mean_lum") - (lit(0.299) * col("mean_r") +
              lit(0.587) * col("mean_g") + lit(0.114) * col("mean_b"))) < 0.001)
            .as("raster_ok"))
        .orderBy("doc_id")
    },

    // Frame sampling over binary video containers — REAL on both ends
    // since round 9: payloads are GFV1 containers of genuine PNG
    // frames, the sampler parses the container and pixel-decodes every
    // kept frame (stride 2). Each doc explodes to its sampled frames
    // in one partition-local pass (no shuffle until the per-doc
    // rollup). (r11) The container geometry is a closed form of
    // (doc_id, n_chars) — n_frames = 2 + n_chars % 5, stride-2 keeps
    // ceil(n/2), frame i is (4 + (doc_id+i) % 5) × (3 + i % 4) — so
    // the DuckDB oracle COMPUTES the expected frame counts and sampled
    // pixel totals and pins the luminance-sanity verdict TRUE: a
    // container-parse or frame-decode break now hash-mismatches.
    // avg_lum itself stays golden-pinned (GoldenSpec on
    // sampledFrameStats).
    Q("q_multimodal_frames",
      """SELECT doc_id,
        |       CAST(2 + n_chars % 5 AS BIGINT) AS n_frames,
        |       CAST((2 + n_chars % 5 + 1) // 2 AS BIGINT) AS n_sampled,
        |       CAST(list_sum([(4 + (doc_id + i) % 5) * (3 + i % 4)
        |                      FOR i IN range(0, CAST(2 + n_chars % 5 AS INT))
        |                      IF i % 2 = 0]) AS BIGINT) AS pixels_sampled,
        |       TRUE AS lum_ok
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      sampledFrameStats(s, d)
        .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"),
          col("n_sampled"), col("pixels_sampled"),
          col("avg_lum").between(0, 1).as("lum_ok"))
        .orderBy("doc_id")
    },

    // Perceptual image hash for media dedup (round 11): a 4-bit
    // quadrant aHash over the DECODED raster — each bit says "this
    // quadrant is brighter than the whole image" (integer luminance,
    // cross-multiplied exact comparisons — no float anywhere), then a
    // hash-bucket count per doc, the grouping key an image-dedup
    // pipeline clusters on. THE STRONGEST oracle form in the multimodal
    // family: the synthetic pixels are a closed form of
    // (doc_id, x, y), so DuckDB re-derives every pixel ARITHMETICALLY
    // and recomputes the exact hash the Spark side must reach through
    // real PNG bytes (encode → PNG stream → imageio decode → hash) —
    // a pixel-exact, end-to-end codec round-trip check, not a sanity
    // verdict. At 100 TB the hash replaces |corpus|² image comparison
    // with a hash-key groupBy (the q_dedup_exact shape for media);
    // real deployments widen the grid (8×8 = 64 bits) — the plumbing
    // is identical.
    Q("q_image_phash",
      """WITH px AS (SELECT d.doc_id,
        |                   CAST(4 + d.doc_id % 13 AS BIGINT) AS w,
        |                   CAST(3 + d.n_chars % 7 AS BIGINT) AS h,
        |                   t.x, u.y
        |            FROM documents d,
        |                 UNNEST(range(0, 4 + d.doc_id % 13)) AS t(x),
        |                 UNNEST(range(0, 3 + d.n_chars % 7)) AS u(y)),
        |l AS (SELECT doc_id, w, h,
        |             CASE WHEN y * 2 < h THEN 0 ELSE 2 END
        |             + CASE WHEN x * 2 < w THEN 0 ELSE 1 END AS q,
        |             299 * ((doc_id * 31 + x * 7 + y * 13) % 256)
        |             + 587 * ((doc_id * 17 + x * 11 + y * 3) % 256)
        |             + 114 * ((doc_id + x * y) % 256) AS lum
        |      FROM px),
        |qs AS (SELECT doc_id, w, h, q, CAST(sum(lum) AS BIGINT) AS sq, count(*) AS nq
        |       FROM l GROUP BY 1, 2, 3, 4),
        |t AS (SELECT doc_id, CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
        |             CAST(sum(sq) AS BIGINT) AS st, CAST(sum(nq) AS BIGINT) AS nt
        |      FROM qs GROUP BY 1),
        |hb AS (SELECT qs.doc_id,
        |              CAST(sum(CASE WHEN sq * t.nt > t.st * nq
        |                            THEN CASE q WHEN 0 THEN 1 WHEN 1 THEN 2
        |                                        WHEN 2 THEN 4 ELSE 8 END
        |                            ELSE 0 END) AS BIGINT) AS phash
        |       FROM qs JOIN t ON qs.doc_id = t.doc_id GROUP BY 1)
        |SELECT hb.doc_id, t.width, t.height, hb.phash,
        |       count(*) OVER (PARTITION BY hb.phash) AS n_same_hash
        |FROM hb JOIN t ON hb.doc_id = t.doc_id
        |ORDER BY hb.doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val hashed = pngInputs(s, d)
        .mapPartitions(decodeQuadHash)
        .toDF()
      hashed
        .withColumn("n_same_hash", count(lit(1)).over(Window.partitionBy("phash")))
        .select(col("doc_id"), col("width"), col("height"), col("phash"),
          col("n_same_hash"))
        .orderBy("doc_id")
    },

    // Image dedup blocking audit (round 18): the scale story of image
    // near-dup is BLOCKING — candidates come from (width, height,
    // perceptual-hash) buckets, never all-pairs — and this op reads
    // the quality of that blocking on the decoded corpus: bucket
    // count, the largest bucket (the quadratic hot spot a banded
    // rehash would split), the candidate-pair volume Σ c·(c−1)/2, and
    // the reduction ratio vs all-pairs. Rides the SAME decoded
    // quad-hash frame as q_image_phash (one PNG decode serves both);
    // the rollup is bucket-bounded; counts exact int64 with the pair
    // arithmetic in both engines.
    Q("q_image_dedup_blocking",
      """WITH px AS (SELECT d.doc_id,
        |                   CAST(4 + d.doc_id % 13 AS BIGINT) AS w,
        |                   CAST(3 + d.n_chars % 7 AS BIGINT) AS h,
        |                   t.x, u.y
        |            FROM documents d,
        |                 UNNEST(range(0, 4 + d.doc_id % 13)) AS t(x),
        |                 UNNEST(range(0, 3 + d.n_chars % 7)) AS u(y)),
        |l AS (SELECT doc_id, w, h,
        |             CASE WHEN y * 2 < h THEN 0 ELSE 2 END
        |             + CASE WHEN x * 2 < w THEN 0 ELSE 1 END AS q,
        |             299 * ((doc_id * 31 + x * 7 + y * 13) % 256)
        |             + 587 * ((doc_id * 17 + x * 11 + y * 3) % 256)
        |             + 114 * ((doc_id + x * y) % 256) AS lum
        |      FROM px),
        |qs AS (SELECT doc_id, w, h, q, CAST(sum(lum) AS BIGINT) AS sq, count(*) AS nq
        |       FROM l GROUP BY 1, 2, 3, 4),
        |t AS (SELECT doc_id, CAST(max(w) AS BIGINT) AS w, CAST(max(h) AS BIGINT) AS h,
        |             CAST(sum(sq) AS BIGINT) AS st, CAST(sum(nq) AS BIGINT) AS nt
        |      FROM qs GROUP BY 1),
        |hb AS (SELECT qs.doc_id, t.w, t.h,
        |              CAST(sum(CASE WHEN sq * t.nt > t.st * nq
        |                            THEN CASE q WHEN 0 THEN 1 WHEN 1 THEN 2
        |                                        WHEN 2 THEN 4 ELSE 8 END
        |                            ELSE 0 END) AS BIGINT) AS phash
        |       FROM qs JOIN t ON qs.doc_id = t.doc_id GROUP BY 1, 2, 3),
        |bk AS (SELECT w, h, phash, CAST(count(*) AS BIGINT) AS c
        |       FROM hb GROUP BY 1, 2, 3)
        |SELECT CAST(sum(c) AS BIGINT) AS n_images,
        |       CAST(count(*) AS BIGINT) AS n_buckets,
        |       CAST(max(c) AS BIGINT) AS max_bucket,
        |       CAST(sum(c * (c - 1) // 2) AS BIGINT) AS cand_pairs,
        |       floor((CAST(sum(c * (c - 1) // 2) AS DOUBLE)
        |              / (sum(c) * (sum(c) - 1) / 2))*1000000+0.5)/1000000 AS reduction
        |FROM bk""".stripMargin) { (s, d) =>
      import s.implicits._
      pngInputs(s, d)
        .mapPartitions(decodeQuadHash)
        .toDF()
        .groupBy("width", "height", "phash")
        .agg(count(lit(1)).as("c"))
        .agg(sum("c").as("n_images"), count(lit(1)).as("n_buckets"),
          max("c").as("max_bucket"),
          sum(expr("c * (c - 1) div 2")).as("cand_pairs"),
          Q.r6(sum(expr("c * (c - 1) div 2")).cast("double") /
            (sum("c") * (sum("c") - lit(1)) / lit(2))).as("reduction"))
    },

    // Per-channel color statistics (round 15) — the feature-extraction
    // primitive between q_multimodal_decode's normalized means and
    // q_image_phash's luminance hash: EXACT integer sums of the raw
    // 0-255 R/G/B bytes over the decoded raster, plus the dominant
    // channel (argmax, r ≻ g ≻ b tie-break — the color-cast screen a
    // vision-data pipeline gates ingest on). Same oracle strength as
    // q_image_phash: DuckDB re-derives every pixel arithmetically from
    // the closed-form raster, so the value the Spark side must reach
    // through REAL PNG bytes (encode → imageio decode → sum) is
    // checked pixel-exactly. Same 100 TB shape as the decode pipeline:
    // one repartition for blob sizing, per-partition codec batches,
    // nothing after the per-doc rollup grows with pixel count.
    Q("q_image_channel_stats",
      """WITH px AS (SELECT d.doc_id,
        |                   CAST(4 + d.doc_id % 13 AS INT) AS w,
        |                   CAST(3 + d.n_chars % 7 AS INT) AS h,
        |                   t.x, u.y
        |            FROM documents d,
        |                 UNNEST(range(0, 4 + d.doc_id % 13)) AS t(x),
        |                 UNNEST(range(0, 3 + d.n_chars % 7)) AS u(y)),
        |c AS (SELECT doc_id, CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
        |             CAST(sum((doc_id * 31 + x * 7 + y * 13) % 256) AS BIGINT) AS sum_r,
        |             CAST(sum((doc_id * 17 + x * 11 + y * 3) % 256) AS BIGINT) AS sum_g,
        |             CAST(sum((doc_id + x * y) % 256) AS BIGINT) AS sum_b
        |      FROM px GROUP BY 1)
        |SELECT doc_id, width, height, sum_r, sum_g, sum_b,
        |       CASE WHEN sum_r >= sum_g AND sum_r >= sum_b THEN 'r'
        |            WHEN sum_g >= sum_b THEN 'g' ELSE 'b' END AS dominant
        |FROM c
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      pngInputs(s, d)
        .mapPartitions(decodeChannelSums)
        .toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("sum_r"), col("sum_g"), col("sum_b"),
          when(col("sum_r") >= col("sum_g") && col("sum_r") >= col("sum_b"), "r")
            .when(col("sum_g") >= col("sum_b"), "g").otherwise("b").as("dominant"))
        .orderBy("doc_id")
    },

    // Thumbnail resize (round 14) — the remaining first-class media
    // transform of the builder brief's decode/extract/RESIZE/sample
    // list: every image is nearest-neighbor-resampled to a FIXED 4×3
    // thumbnail on the DECODED raster (src pixel (⌊i·w/4⌋, ⌊j·h/3⌋)
    // for thumb cell (i, j) — the standard NN downscale), reported as
    // the exact integer luminance mass of the 12 sampled pixels plus a
    // 12-bit brightness mask (bit k ⇔ cell k out-brightens the thumb
    // mean under a cross-multiplied INTEGER comparison — zero floats).
    // Same oracle strength as q_image_phash: DuckDB re-derives the
    // sampled pixels arithmetically from the closed-form raster, so
    // the value the Spark side must reach through real PNG bytes
    // (encode → stream → imageio decode → resample) is checked
    // pixel-exactly. At 100 TB the shape is the decode pipeline's:
    // repartition once for blob sizing, per-partition codec batches,
    // no shuffle after — thumbnails are the standard pre-embedding
    // normalization pass.
    Q("q_image_resize",
      """WITH g AS (SELECT d.doc_id,
        |                  CAST(4 + d.doc_id % 13 AS BIGINT) AS w,
        |                  CAST(3 + d.n_chars % 7 AS BIGINT) AS h,
        |                  t.i, u.j
        |           FROM documents d,
        |                UNNEST(range(0, 4)) AS t(i),
        |                UNNEST(range(0, 3)) AS u(j)),
        |p AS (SELECT doc_id, w, h, j * 4 + i AS k,
        |             (i * w) // 4 AS x, (j * h) // 3 AS y
        |      FROM g),
        |l AS (SELECT doc_id, w, h, k,
        |             299 * ((doc_id * 31 + x * 7 + y * 13) % 256)
        |           + 587 * ((doc_id * 17 + x * 11 + y * 3) % 256)
        |           + 114 * ((doc_id + x * y) % 256) AS lum
        |      FROM p),
        |m AS (SELECT doc_id, w, h, k, lum,
        |             CAST(sum(lum) OVER (PARTITION BY doc_id) AS BIGINT) AS ts
        |      FROM l)
        |SELECT doc_id, CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
        |       CAST(max(ts) AS BIGINT) AS thumb_sum,
        |       CAST(sum(CASE WHEN lum * 12 > ts
        |                     THEN CAST(power(2, k) AS BIGINT) ELSE 0 END) AS BIGINT) AS thumb_hash
        |FROM m
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      pngInputs(s, d)
        .mapPartitions(decodeResize)
        .toDF()
        .select("doc_id", "width", "height", "thumb_sum", "thumb_hash")
        .orderBy("doc_id")
    },

    // Audio feature extraction (round 17) — the AUDIO leg of the
    // builder brief's multimodal list, stub-free the way the image
    // family is: every event carries a REAL RIFF/WAVE PCM16 payload
    // (synthesized deterministically — a playable 64-sample 8 kHz sine
    // clip whose frequency/amplitude key off event_id and cents), the
    // decode stage genuinely parses the 44-byte header (magics, format
    // tag, rate, depth — loud on corruption) and the little-endian
    // samples, and the features are the real integer DSP trio: ZCR
    // flips, Σs² energy, peak |s|. Per-type rollup; sample_rate comes
    // from the PARSED header, so the oracle's literal 8000 checks the
    // container round-trip. Exactness: the sine floors onto the 1e3
    // lattice BEFORE the integer amplitude multiply (only 320 distinct
    // angles corpus-wide), so every sample — and the energy fold — is
    // exact int64 in both engines (headroom Site row). At 100 TB the
    // shape is the codec pipeline's: repartition once for blob sizing,
    // per-partition decode batches, one |types|-bounded rollup.
    Q("q_audio_features",
      s"""WITH ev AS (SELECT event_id, event_type,
         |                   CAST(floor(value * 100 + 0.5) AS BIGINT) % 32 + 1 AS a,
         |                   220 + (event_id % 5) * 110 AS f
         |            FROM events),
         |tt AS (SELECT CAST(range AS BIGINT) AS t FROM range(0, 64)),
         |sm AS (SELECT ev.event_id, ev.event_type, ev.a, tt.t,
         |              ev.a * CAST(floor(sin(2 * pi() * ev.f * tt.t / 8000) * 1e3 + 0.5)
         |                          AS BIGINT) AS s
         |       FROM ev CROSS JOIN tt),
         |w AS (SELECT event_id, event_type, t, s,
         |             lag(s) OVER (PARTITION BY event_id ORDER BY t) AS sp
         |      FROM sm),
         |cl AS (SELECT event_id, event_type,
         |              CAST(sum(CASE WHEN sp IS NOT NULL AND (s < 0) <> (sp < 0)
         |                            THEN 1 ELSE 0 END) AS BIGINT) AS flips,
         |              CAST(sum(s * s) AS BIGINT) AS energy,
         |              CAST(max(abs(s)) AS BIGINT) AS peak
         |       FROM w GROUP BY 1, 2),
         |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_clips,
         |             CAST(sum(flips) AS BIGINT) AS tf,
         |             CAST(sum(energy) AS BIGINT) AS te,
         |             CAST(max(peak) AS BIGINT) AS mp
         |      FROM cl GROUP BY 1)
         |SELECT event_type, n_clips, CAST(8000 AS BIGINT) AS sample_rate,
         |       ${Q.sqlR6("CAST(tf AS DOUBLE) / (n_clips * 63.0)")} AS mean_zcr,
         |       ${Q.sqlR2("CAST(te AS DOUBLE) / (n_clips * 64.0)")} AS mean_energy,
         |       mp AS max_peak
         |FROM g
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      audioFeaturesOf(audioGridOf(audioClips(s, d)))
    },

    // Audio silence-gap screen (round 17): per decoded clip, the
    // longest consecutive run of samples under 10% of the clip's OWN
    // peak (the threshold a trim/segmentation pass keys on — relative
    // scale, so a quiet clip is not all-"silence"), rolled up per type
    // as mean quiet share, the longest gap seen, and how many clips
    // carry a ≥8-sample gap. Rides the SAME decoded-clip frame as
    // q_audio_features (one WAV parse serves both); the 10·|s| < peak
    // decision is a cross-multiplied INTEGER comparison, runs are
    // exact ints (oracle: gaps-and-islands over the re-derived
    // samples), and the rollup is |types|-bounded.
    Q("q_audio_silence",
      s"""WITH ev AS (SELECT event_id, event_type,
         |                   CAST(floor(value * 100 + 0.5) AS BIGINT) % 32 + 1 AS a,
         |                   220 + (event_id % 5) * 110 AS f
         |            FROM events),
         |tt AS (SELECT CAST(range AS BIGINT) AS t FROM range(0, 64)),
         |sm AS (SELECT ev.event_id, ev.event_type, tt.t,
         |              ev.a * CAST(floor(sin(2 * pi() * ev.f * tt.t / 8000) * 1e3 + 0.5)
         |                          AS BIGINT) AS s
         |       FROM ev CROSS JOIN tt),
         |pk AS (SELECT event_id, CAST(max(abs(s)) AS BIGINT) AS mx FROM sm GROUP BY 1),
         |qs AS (SELECT sm.event_id, sm.event_type, sm.t
         |       FROM sm JOIN pk USING (event_id) WHERE 10 * abs(sm.s) < pk.mx),
         |gi AS (SELECT event_id, event_type,
         |              t - row_number() OVER (PARTITION BY event_id ORDER BY t) AS grp
         |       FROM qs),
         |runs AS (SELECT event_id, event_type, CAST(count(*) AS BIGINT) AS run
         |         FROM gi GROUP BY event_id, event_type, grp),
         |cq AS (SELECT event_id, CAST(max(run) AS BIGINT) AS quiet_run
         |       FROM runs GROUP BY 1),
         |al AS (SELECT ev.event_type,
         |              CAST(coalesce(cq.quiet_run, 0) AS BIGINT) AS quiet_run
         |       FROM ev LEFT JOIN cq ON ev.event_id = cq.event_id)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_clips,
         |       ${Q.sqlR6("CAST(sum(quiet_run) AS DOUBLE) / (count(*) * 64.0)")}
         |         AS mean_quiet_share,
         |       CAST(max(quiet_run) AS BIGINT) AS max_quiet_run,
         |       CAST(sum(CASE WHEN quiet_run >= 8 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_gapped
         |FROM al
         |GROUP BY 1
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      audioClips(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_clips"),
          sum("quiet_run").as("tq"),
          max("quiet_run").as("max_quiet_run"),
          sum(when(col("quiet_run") >= 8, 1L).otherwise(0L)).as("n_gapped"))
        .select(col("event_type"), col("n_clips"),
          Q.r6(col("tq").cast("double") / (col("n_clips") * lit(64.0)))
            .as("mean_quiet_share"),
          col("max_quiet_run"), col("n_gapped"))
        .orderBy("event_type")
    },

    // Audio fingerprint collision profile (round 18): per decoded
    // clip a peak-landmark fingerprint — the offset of the loudest
    // sample in each 16-sample window (tie → earliest), four base-16
    // digits plus a peak-magnitude nibble — the constellation-hash
    // shape an audio NEAR-DUP pass keys on (identical recordings
    // collide; amplitude-only variants separate through the peak
    // nibble). Per-type rollup: clip count, distinct fingerprints,
    // duplicate share, and the largest collision class (the dedup
    // candidate-bucket size). Rides the SAME decoded-clip frame as
    // q_audio_features (one WAV parse serves all three audio ops);
    // the argmax is an integer decision identical in both engines,
    // and the rollup is |types|-bounded off an exact distinct.
    Q("q_audio_fingerprint",
      s"""WITH ev AS (SELECT event_id, event_type,
         |                   CAST(floor(value * 100 + 0.5) AS BIGINT) % 32 + 1 AS a,
         |                   220 + (event_id % 5) * 110 AS f
         |            FROM events),
         |tt AS (SELECT CAST(range AS BIGINT) AS t FROM range(0, 64)),
         |sm AS (SELECT ev.event_id, ev.event_type, tt.t, tt.t // 16 AS w,
         |              abs(ev.a * CAST(floor(sin(2 * pi() * ev.f * tt.t / 8000) * 1e3 + 0.5)
         |                          AS BIGINT)) AS asamp
         |       FROM ev CROSS JOIN tt),
         |mx AS (SELECT event_id, w, CAST(max(asamp) AS BIGINT) AS m
         |       FROM sm GROUP BY 1, 2),
         |om AS (SELECT sm.event_id, sm.w,
         |              CAST(min(sm.t) - sm.w * 16 AS BIGINT) AS o
         |       FROM sm JOIN mx ON mx.event_id = sm.event_id AND mx.w = sm.w
         |                      AND sm.asamp = mx.m
         |       GROUP BY sm.event_id, sm.w),
         |pk AS (SELECT event_id, CAST(max(asamp) AS BIGINT) AS peak
         |       FROM sm GROUP BY 1),
         |fp AS (SELECT om.event_id,
         |              CAST(sum(om.o * CASE om.w WHEN 0 THEN 1 WHEN 1 THEN 16
         |                                        WHEN 2 THEN 256 ELSE 4096 END)
         |                   + max(pk.peak % 16) * 65536 AS BIGINT) AS fp
         |       FROM om JOIN pk USING (event_id) GROUP BY 1),
         |cl AS (SELECT ev.event_type, fp.fp, CAST(count(*) AS BIGINT) AS c
         |       FROM ev JOIN fp USING (event_id) GROUP BY 1, 2)
         |SELECT event_type, CAST(sum(c) AS BIGINT) AS n_clips,
         |       CAST(count(*) AS BIGINT) AS n_fp,
         |       ${Q.sqlR6("1.0 - CAST(count(*) AS DOUBLE) / sum(c)")} AS dup_share,
         |       CAST(max(c) AS BIGINT) AS max_collision
         |FROM cl
         |GROUP BY 1
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      audioFingerprintOf(audioFpGridOf(audioClips(s, d)))
    },

    // VIDEO container leg, standard-format edition (round 18 — the
    // r17 verdict's #6, giving video the WAV treatment): every
    // document carries a REAL multi-image GIF87a stream — true header,
    // logical screen descriptor, 8-entry global color table, and per
    // frame an image descriptor plus GENUINE LZW-compressed index
    // data (variable-width codes, LSB-first, sub-block packaged; the
    // encoder builds a real string table and the GoldenSpec pins the
    // JDK ImageIO decoder agreeing with ours frame for frame). The
    // decode stage walks the container and runs a REAL LZW decoder —
    // loud on bad magic, bad code widths, pixel-count mismatch,
    // trailing bytes — then folds exact-integer per-frame luminance
    // (299r+587g+114b over the PARSED color table): per doc the frame
    // count, dims, total luminance, the largest frame-to-frame
    // luminance delta and the scene-cut count (|Δ|·10·nf > lum_total —
    // a cross-multiplied integer decision). The oracle re-derives the
    // payload arithmetic from the synthesis closed form, so one
    // corrupted byte anywhere in the codec round-trip hash-mismatches.
    // 100 TB shape: repartition once for blob sizing, per-partition
    // batch decode, ONE row per doc out of the decoder, no shuffle
    // before the output sort.
    Q("q_video_frames",
      """WITH p AS (SELECT doc_id,
        |                  2 + doc_id % 4 AS nf, 4 + doc_id % 5 AS w, 3 + doc_id % 3 AS h
        |           FROM documents),
        |fr AS (SELECT p.doc_id, p.nf, p.w, p.h, CAST(f.range AS BIGINT) AS f
        |       FROM p CROSS JOIN range(0, 6) f WHERE f.range < p.nf),
        |px AS (SELECT fr.doc_id, fr.nf, fr.w, fr.h, fr.f, CAST(i.range AS BIGINT) AS i
        |       FROM fr CROSS JOIN range(0, 40) i WHERE i.range < fr.w * fr.h),
        |lm AS (SELECT doc_id, nf, w, h, f,
        |              CAST(sum(299 * ((ix * 33) % 256) + 587 * ((ix * 57) % 256)
        |                   + 114 * ((ix * 89) % 256)) AS BIGINT) AS lf
        |       FROM (SELECT px.*, (doc_id * 31 + f * 17 + i * 7) % 8 AS ix FROM px)
        |       GROUP BY 1, 2, 3, 4, 5),
        |dl AS (SELECT doc_id, nf, w, h, f, lf,
        |              lag(lf) OVER (PARTITION BY doc_id ORDER BY f) AS lp
        |       FROM lm),
        |g AS (SELECT doc_id, CAST(max(nf) AS BIGINT) AS n_frames,
        |             CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
        |             CAST(sum(lf) AS BIGINT) AS lum_total,
        |             CAST(coalesce(max(abs(lf - lp)), 0) AS BIGINT) AS max_delta
        |      FROM dl GROUP BY 1),
        |c AS (SELECT dl.doc_id,
        |             CAST(sum(CASE WHEN dl.lp IS NOT NULL
        |                           AND 10 * g.n_frames * abs(dl.lf - dl.lp) > g.lum_total
        |                           THEN 1 ELSE 0 END) AS BIGINT) AS scene_cuts
        |      FROM dl JOIN g USING (doc_id) GROUP BY 1)
        |SELECT g.doc_id, g.n_frames, g.width, g.height, g.lum_total, g.max_delta,
        |       c.scene_cuts
        |FROM g JOIN c USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      videoClips(s, d)
        .select("doc_id", "n_frames", "width", "height", "lum_total",
          "max_delta", "scene_cuts")
        .orderBy("doc_id")
    },

    // Per-source video feed profile (round 18): the monitoring rollup
    // a multimodal ingest watches per feed — doc count, total/mean
    // frames, total luminance, scene-cut volume, the largest
    // frame-to-frame jump seen. Rides the SAME decoded-clip frame as
    // q_video_frames (one GIF parse serves both); the rollup is
    // |sources|-bounded and every cell is a mergeable integer fold,
    // which is exactly why the s_video_profile streaming face shares
    // this grid. Oracle re-derives the per-doc arithmetic and
    // aggregates it per source.
    Q("q_video_profile",
      """WITH p AS (SELECT doc_id, source,
        |                  2 + doc_id % 4 AS nf, 4 + doc_id % 5 AS w, 3 + doc_id % 3 AS h
        |           FROM documents),
        |fr AS (SELECT p.doc_id, p.source, p.nf, p.w, p.h, CAST(f.range AS BIGINT) AS f
        |       FROM p CROSS JOIN range(0, 6) f WHERE f.range < p.nf),
        |px AS (SELECT fr.doc_id, fr.source, fr.nf, fr.w, fr.h, fr.f,
        |              CAST(i.range AS BIGINT) AS i
        |       FROM fr CROSS JOIN range(0, 40) i WHERE i.range < fr.w * fr.h),
        |lm AS (SELECT doc_id, source, nf, f,
        |              CAST(sum(299 * ((ix * 33) % 256) + 587 * ((ix * 57) % 256)
        |                   + 114 * ((ix * 89) % 256)) AS BIGINT) AS lf
        |       FROM (SELECT px.*, (doc_id * 31 + f * 17 + i * 7) % 8 AS ix FROM px)
        |       GROUP BY 1, 2, 3, 4),
        |dl AS (SELECT doc_id, source, nf, f, lf,
        |              lag(lf) OVER (PARTITION BY doc_id ORDER BY f) AS lp
        |       FROM lm),
        |g AS (SELECT doc_id, source, CAST(max(nf) AS BIGINT) AS nf,
        |             CAST(sum(lf) AS BIGINT) AS lum,
        |             CAST(coalesce(max(abs(lf - lp)), 0) AS BIGINT) AS mdelta
        |      FROM dl GROUP BY 1, 2),
        |c AS (SELECT dl.doc_id,
        |             CAST(sum(CASE WHEN dl.lp IS NOT NULL
        |                           AND 10 * g.nf * abs(dl.lf - dl.lp) > g.lum
        |                           THEN 1 ELSE 0 END) AS BIGINT) AS cuts
        |      FROM dl JOIN g USING (doc_id) GROUP BY 1)
        |SELECT g.source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(g.nf) AS BIGINT) AS total_frames,
        |       floor((CAST(sum(g.nf) AS DOUBLE) / count(*))*10000+0.5)/10000 AS mean_frames,
        |       CAST(sum(g.lum) AS BIGINT) AS lum_total,
        |       CAST(sum(c.cuts) AS BIGINT) AS scene_cuts,
        |       CAST(max(g.mdelta) AS BIGINT) AS max_delta
        |FROM g JOIN c USING (doc_id)
        |GROUP BY 1
        |ORDER BY source""".stripMargin) { (s, d) =>
      videoProfileOf(videoGridOf(videoClips(s, d)))
    }
  )

  /** Per-image 4×3 nearest-neighbor thumbnail row (see q_image_resize). */
  final case class MediaThumb(doc_id: Long, width: Int, height: Int,
                              thumb_sum: Long, thumb_hash: Long)

  /** REAL decode → fixed 4×3 nearest-neighbor thumbnail: parses the PNG
    * stream, samples src pixel (⌊i·w/4⌋, ⌊j·h/3⌋) per thumb cell,
    * accumulates exact INTEGER luminance (299r + 587g + 114b) and sets
    * mask bit k = j·4+i iff the cell out-brightens the thumbnail mean
    * under the cross-multiplied integer comparison lum·12 > Σlum —
    * zero floats, so the oracle's arithmetic pixel re-derivation must
    * match bit-for-bit. */
  private def decodeResize(rows: Iterator[MediaIn]): Iterator[MediaThumb] = {
    javax.imageio.ImageIO.setUseCache(false)
    rows.map { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      require(img != null, s"doc ${r.doc_id}: payload is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      val lums = new Array[Long](12)
      var j = 0
      while (j < 3) {
        var i = 0
        while (i < 4) {
          val p = img.getRGB(i * w / 4, j * h / 3)
          lums(j * 4 + i) =
            299L * ((p >> 16) & 0xFF) + 587L * ((p >> 8) & 0xFF) + 114L * (p & 0xFF)
          i += 1
        }
        j += 1
      }
      val ts = lums.sum
      var mask = 0L
      var k = 0
      while (k < 12) {
        if (lums(k) * 12 > ts) mask |= (1L << k)
        k += 1
      }
      MediaThumb(r.doc_id, w, h, ts, mask)
    }
  }

  /** Per-image 4-bit quadrant hash row (see q_image_phash). */
  final case class MediaQuadHash(doc_id: Long, width: Int, height: Int, phash: Long)

  /** REAL decode → integer-exact quadrant hash: parses the PNG stream,
    * accumulates INTEGER luminance (299r + 587g + 114b per pixel) per
    * quadrant (left = x·2 < w, top = y·2 < h), and sets bit q iff the
    * quadrant out-brightens the image under the cross-multiplied
    * integer comparison s_q·n > s·n_q — zero floats, so the DuckDB
    * oracle's arithmetic pixel re-derivation must match bit-for-bit. */
  final case class MediaChannels(doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL decode to exact per-channel byte sums — the q_image_phash
    * loop reading raw 0-255 channel values instead of the luminance
    * blend (all int64; no float ever touches a pixel). */
  private def decodeChannelSums(rows: Iterator[MediaIn]): Iterator[MediaChannels] = {
    javax.imageio.ImageIO.setUseCache(false)
    rows.map { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      require(img != null, s"doc ${r.doc_id}: payload is not a decodable image")
      val (sr, sg, sb) = channelSums(img)
      MediaChannels(r.doc_id, img.getWidth, img.getHeight, sr, sg, sb)
    }
  }

  private def decodeQuadHash(rows: Iterator[MediaIn]): Iterator[MediaQuadHash] = {
    javax.imageio.ImageIO.setUseCache(false)
    rows.map { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      require(img != null, s"doc ${r.doc_id}: payload is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      val s = new Array[Long](4)
      val n = new Array[Long](4)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          val lum = 299L * ((p >> 16) & 0xFF) + 587L * ((p >> 8) & 0xFF) + 114L * (p & 0xFF)
          val q = (if (y * 2 < h) 0 else 2) + (if (x * 2 < w) 0 else 1)
          s(q) += lum
          n(q) += 1
          x += 1
        }
        y += 1
      }
      val st = s.sum
      val nt = n.sum
      var hash = 0L
      var i = 0
      while (i < 4) {
        if (s(i) * nt > st * n(i)) hash |= (1L << i)
        i += 1
      }
      MediaQuadHash(r.doc_id, w, h, hash)
    }
  }

  // ---- GIF87a video leg (q_video_frames) ----------------------------------

  /** A "video" row: payload is a REAL multi-image GIF87a stream. */
  final case class VideoIn(doc_id: Long, source: String, payload: Array[Byte])

  /** Per-doc exact-integer frame features off the DECODED container. */
  final case class VideoClip(doc_id: Long, source: String, n_frames: Long,
                             width: Int, height: Int, lum_total: Long,
                             max_delta: Long, scene_cuts: Long)

  /** Global color table entry i — the closed form the oracle mirrors. */
  @inline private def gifRgb(i: Int): (Int, Int, Int) =
    ((i * 33) % 256, (i * 57) % 256, (i * 89) % 256)

  /** REAL GIF-variant LZW compression of a pixel-index stream: builds
    * a string table, emits variable-width codes LSB-first, bumps the
    * code width exactly when the just-assigned table code reaches
    * 2^width (the schedule every GIF decoder — including ImageIO,
    * which GoldenSpec cross-checks — expects). */
  private def lzwEncode(px: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    var next = eoi + 1
    var width = minCode + 1
    val dict = new java.util.HashMap[Long, Int]()
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += width
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt); bitBuf >>= 8; bitCnt -= 8
      }
    }
    emit(clear)
    var cur = px(0)
    var i = 1
    while (i < px.length) {
      val k = px(i)
      val key = cur.toLong << 16 | k
      val hit = dict.getOrDefault(key, -1)
      if (hit >= 0) cur = hit
      else {
        emit(cur)
        dict.put(key, next)
        next += 1
        if (next > (1 << width) && width < 12) width += 1
        cur = k
      }
      i += 1
    }
    emit(cur)
    emit(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** REAL GIF-variant LZW decoder: variable-width LSB-first codes, the
    * KwKwK case, width growth when the table fills its width, clear /
    * end-of-information handling — loud on any out-of-range code. */
  private def lzwDecode(data: Array[Byte], minCode: Int, expected: Int,
                        ctx: => String): Array[Int] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    var next = eoi + 1
    var width = minCode + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var i = 0
    while (i < clear) { prefix(i) = -1; suffix(i) = i; i += 1 }
    val out = new Array[Int](expected)
    var outPos = 0
    var bitBuf = 0L
    var bitCnt = 0
    var bytePos = 0
    var prev = -1
    def emitString(code: Int): Int = { // returns first index of the string
      var stack = List.empty[Int]
      var c = code
      while (c >= 0) { stack = suffix(c) :: stack; c = prefix(c) }
      val first = stack.head
      stack.foreach { v =>
        require(outPos < expected, s"$ctx: LZW output overruns ${expected} pixels")
        out(outPos) = v; outPos += 1
      }
      first
    }
    var done = false
    while (!done) {
      while (bitCnt < width) {
        require(bytePos < data.length, s"$ctx: LZW stream truncated")
        bitBuf |= (data(bytePos) & 0xffL) << bitCnt; bitCnt += 8; bytePos += 1
      }
      val code = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>= width; bitCnt -= width
      if (code == clear) {
        next = eoi + 1; width = minCode + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev < 0) {
        require(code < clear, s"$ctx: first LZW code $code is not a literal")
        emitString(code)
        prev = code
      } else {
        require(code <= next, s"$ctx: LZW code $code beyond table size $next")
        val first =
          if (code < next) emitString(code)
          else { // KwKwK: cur string = prev string + its own first char
            var c = prev
            while (prefix(c) >= 0) c = prefix(c)
            val f = suffix(c)
            emitString(prev)
            require(outPos < expected, s"$ctx: LZW output overruns ${expected} pixels")
            out(outPos) = f; outPos += 1
            f
          }
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first
          next += 1
          // the decoder's table lags the encoder's by ONE entry (the
          // encoder defines a string when it emits a code; the decoder
          // only when it reads the NEXT one), so it must widen one
          // entry earlier: at next == 2^width, not past it
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    require(outPos == expected, s"$ctx: LZW decoded $outPos of $expected pixels")
    out
  }

  /** Deterministic GIF87a synthesis: nf = 2+doc%4 frames on a w×h
    * logical screen (w = 4+doc%5, h = 3+doc%3), one shared 8-entry
    * global color table (entry i = (33i, 57i, 89i) mod 256), frame f's
    * pixel (x, y) indexing color (doc·31 + f·17 + (y·w+x)·7) mod 8 —
    * every byte a spec-legal GIF87a the JDK decoder also reads. */
  private[graft] def encodeGif(docId: Long): Array[Byte] = {
    val nf = (2 + docId % 4).toInt
    val w = (4 + docId % 5).toInt
    val h = (3 + docId % 3).toInt
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    bos.write("GIF87a".getBytes("US-ASCII"))
    le16(w); le16(h)
    bos.write(0xf2) // GCT present, 8 colors (2^(2+1)), color res 8
    bos.write(0); bos.write(0) // background index, aspect
    var i = 0
    while (i < 8) {
      val (r, g, b) = gifRgb(i)
      bos.write(r); bos.write(g); bos.write(b)
      i += 1
    }
    var f = 0
    while (f < nf) {
      bos.write(0x2c) // image descriptor
      le16(0); le16(0); le16(w); le16(h)
      bos.write(0) // no local table, not interlaced
      val px = Array.tabulate(w * h)(k => ((docId * 31 + f * 17 + k * 7) % 8).toInt)
      bos.write(3) // LZW minimum code size for an 8-color table
      val lzw = lzwEncode(px, 3)
      var off = 0
      while (off < lzw.length) { // sub-block packaging
        val n = math.min(255, lzw.length - off)
        bos.write(n); bos.write(lzw, off, n)
        off += n
      }
      bos.write(0) // block terminator
      f += 1
    }
    bos.write(0x3b) // trailer
    bos.toByteArray
  }

  /** REAL container walk + LZW decode: validates the GIF87a signature,
    * logical screen descriptor and color-table flags, reads the global
    * color table, then per image descriptor decodes the pixel indices
    * through [[lzwDecode]] and folds the exact-integer frame features
    * through the PARSED table. Corruption anywhere — magic, flags,
    * stray block type, pixel shortfall, trailing bytes — fails loudly. */
  private[graft] def decodeGif(rows: Iterator[VideoIn]): Iterator[VideoClip] = {
    rows.map { r =>
      val p = r.payload
      def u8(o: Int): Int = p(o) & 0xff
      def le16(o: Int): Int = u8(o) | (u8(o + 1) << 8)
      require(p.length > 13 && new String(p, 0, 6, "US-ASCII") == "GIF87a",
        s"doc ${r.doc_id}: payload is not a GIF87a stream")
      val w = le16(6)
      val h = le16(8)
      val packed = u8(10)
      require((packed & 0x80) != 0, s"doc ${r.doc_id}: missing global color table")
      val gctSize = 1 << ((packed & 0x07) + 1)
      val lum = new Array[Long](gctSize)
      var i = 0
      var pos = 13
      while (i < gctSize) {
        lum(i) = 299L * u8(pos) + 587L * u8(pos + 1) + 114L * u8(pos + 2)
        pos += 3; i += 1
      }
      var frames = List.empty[Long]
      while (u8(pos) == 0x2c) {
        require(le16(pos + 5) == w && le16(pos + 7) == h,
          s"doc ${r.doc_id}: frame dims disagree with the logical screen")
        require(u8(pos + 9) == 0, s"doc ${r.doc_id}: unexpected local color table")
        val minCode = u8(pos + 10)
        pos += 11
        val lzw = new java.io.ByteArrayOutputStream()
        var bl = u8(pos); pos += 1
        while (bl != 0) {
          lzw.write(p, pos, bl); pos += bl
          bl = u8(pos); pos += 1
        }
        val px = lzwDecode(lzw.toByteArray, minCode, w * h, s"doc ${r.doc_id}")
        var lf = 0L
        var k = 0
        while (k < px.length) {
          require(px(k) < gctSize, s"doc ${r.doc_id}: color index out of table")
          lf += lum(px(k)); k += 1
        }
        frames = lf :: frames
      }
      require(u8(pos) == 0x3b && pos == p.length - 1,
        s"doc ${r.doc_id}: container does not end at the trailer")
      val lf = frames.reverse.toArray
      val nf = lf.length.toLong
      val lumTotal = lf.sum
      var maxDelta = 0L
      var cuts = 0L
      var j = 1
      while (j < lf.length) {
        val dlt = math.abs(lf(j) - lf(j - 1))
        if (dlt > maxDelta) maxDelta = dlt
        if (10L * nf * dlt > lumTotal) cuts += 1
        j += 1
      }
      VideoClip(r.doc_id, r.source, nf, w, h, lumTotal, maxDelta, cuts)
    }
  }

  /** The GIF ingest prefix: documents → deterministic real GIF87a
    * payloads, repartitioned once for blob sizing (the pngInputs
    * discipline — no shuffle after). */
  private[graft] def videoClips(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.load(s, d, "documents")
      .select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, src) => VideoIn(id, src, encodeGif(id)) })
      .toDF()
      .repartition(col("doc_id"))
      .as[VideoIn]
      .mapPartitions(decodeGif)
      .toDF()
  }

  /** The |sources|-bounded video feed-profile grid — ONE fold shared
    * by batch q_video_profile and the s_video_profile streaming face:
    * per source the doc count, Σframes, Σluminance, Σscene-cuts and
    * the max frame-to-frame delta — all mergeable (sums/counts/maxes),
    * so it IS the streaming groupBy state; clip payloads never
    * persist. */
  private[graft] def videoGridOf(clips: DataFrame): DataFrame =
    clips.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_frames").as("total_frames"),
        sum("lum_total").as("lum_total"), sum("scene_cuts").as("scene_cuts"),
        max("max_delta").as("max_delta"))

  /** Read-time readout over a [[videoGridOf]] grid — the mean-frames
    * division re-normalizes as any source's cell grows. */
  private[graft] def videoProfileOf(grid: DataFrame): DataFrame =
    grid.select(col("source"), col("n_docs"), col("total_frames"),
      Q.r4(col("total_frames").cast("double") / col("n_docs")).as("mean_frames"),
      col("lum_total"), col("scene_cuts"), col("max_delta"))
      .orderBy("source")

  /** Stream-side decode: (doc_id, source) rows → synth GIF87a bytes →
    * [[decodeGif]] — the codec batch shape, stream-compatible. */
  private[graft] def videoClipStream(
      in: org.apache.spark.sql.Dataset[(Long, String)]): DataFrame = {
    val s = in.sparkSession
    import s.implicits._
    in.mapPartitions(_.map { case (id, src) => VideoIn(id, src, encodeGif(id)) })
      .mapPartitions(decodeGif).toDF()
  }
}
