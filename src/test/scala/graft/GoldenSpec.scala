package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Golden-file pins for the stub-backed multimodal operators.
  *
  * q_multimodal_decode / q_multimodal_frames are rows-only in the driver
  * gate (their feature values are stub-defined, so no SQL oracle
  * exists). These tests pin the DETERMINISTIC stub outputs at sf0.001 to
  * committed CSVs so any change — an accidental edit to the stub
  * arithmetic, or the intended future swap to a real codec — is loudly
  * visible instead of sliding through the rows-only check.
  *
  * Regenerate after an INTENDED stub change with:
  *   sbt -batch 'set Test/javaOptions += "-Dgraft.golden.regen=true"' "testOnly graft.GoldenSpec"
  */
class GoldenSpec extends SparkSpec {

  private val goldenDir = Paths.get("src/test/resources/golden")

  private def csvLines(df: DataFrame): Seq[String] = {
    val cols = df.columns.toSeq
    val rows = df.collect().map { r =>
      cols.indices.map(i => String.valueOf(r.get(i))).mkString(",")
    }
    cols.mkString(",") +: rows.toSeq
  }

  // r11: the q_multimodal_* QUERIES flipped to driver-oracled audit
  // projections; the goldens keep pinning the FULL feature surface via
  // the underlying helpers (channel means / per-doc luminance included)
  private val fullSurface: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] = Map(
    "q_multimodal_decode" -> (ops.Multimodal.decodedFeatures _),
    "q_multimodal_frames" -> (ops.Multimodal.sampledFrameStats _))

  private def checkGolden(name: String): Unit = {
    val lines = csvLines(
      fullSurface.getOrElse(name, SparkEntry.queries(name))(spark, sfDir))
    val path = goldenDir.resolve(s"$name.csv")
    if (sys.props.get("graft.golden.regen").contains("true")) {
      Files.createDirectories(path.getParent)
      Files.write(path, lines.mkString("\n").getBytes("UTF-8"))
    } else {
      assert(Files.exists(path), s"missing golden file $path — run with -Dgraft.golden.regen=true")
      val expected = new String(Files.readAllBytes(path), "UTF-8").split("\n", -1).toSeq
      assert(lines.length === expected.length,
        s"$name row count drifted: ${lines.length} vs golden ${expected.length}")
      lines.zip(expected).zipWithIndex.foreach { case ((got, want), i) =>
        assert(got === want, s"$name line $i drifted")
      }
    }
  }

  test("q_multimodal_decode output matches its committed golden file") {
    checkGolden("q_multimodal_decode")
  }

  test("q_multimodal_frames output matches its committed golden file") {
    checkGolden("q_multimodal_frames")
  }

  test("q_video_frames output matches its committed golden file") {
    checkGolden("q_video_frames")
  }

  test("the GIF87a synthesis round-trips through the JDK's own decoder") {
    // independent codec check: ImageIO (a decoder we did not write)
    // must read every synthesized container and agree with the closed
    // form pixel for pixel — the LZW encoder cannot be subtly wrong in
    // a way our own decoder compensates for.
    for (docId <- Seq(0L, 1L, 2L, 3L, 7L, 19L, 123L)) {
      val bytes = ops.Multimodal.encodeGif(docId)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      assert(readers.hasNext, s"doc $docId: JDK found no GIF reader")
      val reader = readers.next()
      reader.setInput(iis)
      val nf = (2 + docId % 4).toInt
      val w = (4 + docId % 5).toInt
      val h = (3 + docId % 3).toInt
      assert(reader.getNumImages(true) === nf, s"doc $docId: frame count")
      for (f <- 0 until nf) {
        val img = reader.read(f)
        assert(img.getWidth === w && img.getHeight === h, s"doc $docId frame $f dims")
        for (y <- 0 until h; x <- 0 until w) {
          val idx = ((docId * 31 + f * 17 + (y * w + x) * 7) % 8).toInt
          val want = ((idx * 33) % 256 << 16) | ((idx * 57) % 256 << 8) | ((idx * 89) % 256)
          assert((img.getRGB(x, y) & 0xffffff) === want,
            s"doc $docId frame $f pixel ($x,$y)")
        }
      }
      reader.dispose()
    }
  }

  test("a corrupted GIF container fails loudly, never silently") {
    val good = ops.Multimodal.encodeGif(5L)
    def decodeOne(b: Array[Byte]): Unit =
      ops.Multimodal.decodeGif(Iterator(ops.Multimodal.VideoIn(5L, "src5", b))).toList
    decodeOne(good) // sanity: the pristine container decodes
    val badMagic = good.clone(); badMagic(3) = '9'.toByte
    assertThrows[IllegalArgumentException](decodeOne(badMagic))
    val truncated = good.dropRight(3)
    assertThrows[Exception](decodeOne(truncated))
    // a VALUE bit-flip inside LZW data can decode to legal-but-wrong
    // pixels (LZW carries no checksum — the oracle hash gate catches
    // that class); STRUCTURAL corruption must throw: a lost trailer
    val noTrailer = good.clone(); noTrailer(good.length - 1) = 0x00
    assertThrows[Exception](decodeOne(noTrailer))
  }
}
