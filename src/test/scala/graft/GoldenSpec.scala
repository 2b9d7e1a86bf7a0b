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
}
