package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Pure selection half of renderTop: which (name, time) entries the
    * driver-parsed line reports at budget k for this roundIdx.
    * The most expensive queries always; then a rotating window of the
    * remaining pool, keyed off roundIdx (= committed BENCH file count,
    * +1 per round). Failed queries are NOT kept here — they ride the
    * line's errors{} section, which driver-side key extraction reads
    * the same way (the r14 renegotiation at the 308-query surface:
    * rendering a failure BOTH as a null queries entry and as an errors
    * entry double-spent ~17 line chars AND a kept slot each, and five
    * persistent failures starved the rotation below its 4-round
    * horizon). The top-slot count is CAPPED at (4k − N + fails − 35)/3
    * — never more than k/2 — which sizes the rotating window to at
    * least ⌈pool/4⌉ + 8 slack, so the G-quarter grid below covers the
    * pool in at most FOUR consecutive rounds even as realized width
    * fluctuates ±8. Scope of the guarantee: per-round timing churn can
    * hop boundary queries between `top` and the pool, shifting pool
    * indices, so a query CAN evade the window longer on a noisy box —
    * BenchRotationSpec's property proves the stable-membership bound,
    * and its BENCH-history test is the retrospective backstop that
    * catches any real starvation one round later. The bound degrades
    * once N − fails > 4·(k − 8) (≈368 queries at today's k=100) — at
    * which point the spec fails loudly and the render budget itself
    * needs rethinking, not just the split. */
  private[graft] def keptNames(runs: Seq[(String, Either[String, Double])], k: Int,
                               roundIdx: Int): Seq[(String, Either[String, Double])] = {
    val fails = runs.filter(_._2.isLeft)
    // a 0/1-slot top tier is worse than none: as the realized k
    // oscillates ±2 with kept-name lengths, a tiny tier flips the pool
    // SIZE round-to-round, shifting every quarter boundary (the r14 #4
    // aliasing at 318 queries) — below 8 slots the tier is dropped
    val topCapRaw = math.max(0,
      math.min(k / 2, (4 * k - runs.length + fails.length - 35) / 3))
    val topCap = if (topCapRaw < 8) 0 else topCapRaw
    val top = runs.filter(_._2.isRight).sortBy(-_._2.getOrElse(0.0)).take(topCap)
    val topNames = (fails ++ top).map(_._1).toSet
    val pool = runs.filter(r => !topNames.contains(r._1)).sortBy(_._1)
    val want = math.max(0, k - top.length)
    val rotating =
      if (pool.isEmpty || want == 0) Seq.empty
      else {
        // Grid rotation (r14): the window start advances on a FIXED
        // 4-quarter grid whenever the budget affords it — G derived
        // from the REALIZED width flips 4↔5 as k oscillates with
        // kept-name lengths (the r14 #4 trap at 318 queries: g floats,
        // one pool band falls in NO round's window at any horizon), so
        // G is PINNED at 4 while want ≥ ⌈P/4⌉ and each round covers
        // its quarter fully. When the surface outgrows the budget
        // (want < ⌈P/4⌉) the degraded stride below keeps reporting,
        // and BenchRotationSpec fails loudly — its purpose.
        val quarter = (pool.length + 3) / 4
        if (want >= quarter) {
          val start = (roundIdx % 4) * quarter % pool.length
          (pool.drop(start) ++ pool.take(start)).take(want)
        } else {
          val g = math.max(1, math.ceil(pool.length.toDouble / want).toInt)
          val q2 = (pool.length + g - 1) / g
          val start = (roundIdx % g) * q2 % pool.length
          (pool.drop(start) ++ pool.take(start)).take(want)
        }
      }
    top ++ rotating
  }

  private[graft] def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private[graft] def fmt(d: Double, scale: Int): String =
    BigDecimal(d).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.stripTrailingZeros.toPlainString

  /** The ONE driver-parsed line for a round, extracted pure so
    * BenchRotationSpec can SIMULATE consecutive rounds against the real
    * surface: tries the full map at decreasing precision, then
    * renderTop at decreasing k (2-step, so a line that would fit 98
    * entries is not cut to 90), first fit under the ~1950-char driver
    * parse budget wins. The realized k is what the 3-round rotation
    * guarantee actually runs on — which is why the spec simulates this
    * function instead of assuming k = 100. */
  private[graft] def driverLine(runs: Seq[(String, Either[String, Double])],
                                roundIdx: Int, sfName: String): String = {
    val total = fmt(runs.map(_._2.getOrElse(0.0)).sum, 3)
    val partial = if (runs.exists(_._2.isLeft)) """"partial":true,""" else ""
    // error text is capped HARD in the driver line (the full message
    // goes to stderr at the failure site): every error char comes out
    // of the same ~1950-char budget the rotating tail needs, and a
    // couple of verbose exceptions would otherwise evict dozens of
    // per-query timings from driver-side attribution. The leading
    // package path is stripped before the 32-char cap (renegotiation
    // #4 at the 318-query surface: "java.lang." spent a third of the
    // cap saying nothing — the SIMPLE class name + message head is
    // strictly more informative per char, and the ~10 chars × 5 fails
    // bought back the ~3 kept slots the 4-round grid needed). Earlier
    // renegotiations: 60→32 cap at 295 queries; errors-only reporting
    // at 308.
    val errList = runs.collect { case (k, Left(e)) =>
      jstr(k) + ":" + jstr(e.replaceFirst("^([a-z0-9_]+\\.)+(?=[A-Z])", "").take(32))
    }
    val errs = if (errList.isEmpty) "" else errList.mkString(""","errors":{""", ",", "}")
    def render(scale: Int, stripPrefix: Boolean): String = {
      val qs = runs.map { case (k, v) =>
        jstr(if (stripPrefix) k.stripPrefix("q_") else k) + ":" + v.fold(_ => "null", fmt(_, scale))
      }.mkString("{", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec",$partial"queries":$qs$errs,"sf":"$sfName"}"""
    }
    def renderTop(k: Int): String = {
      val kept = keptNames(runs, k, roundIdx)
      // failures live in errs, not qs — they are reported, not omitted
      val omitted = runs.length - kept.length - errList.length
      val qs = kept.map { case (n, v) =>
        jstr(n.stripPrefix("q_")) + ":" + v.fold(_ => "null", fmt(_, 1))
      }.mkString("{", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec",$partial"queries":$qs,"q_omitted":$omitted$errs,"sf":"$sfName"}"""
    }
    (Seq(render(2, false), render(2, true), render(1, true)) ++
      (100 to 10 by -2).map(renderTop))
      .find(_.length <= 1950).getOrElse(renderTop(10))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(Tables.NanosAsLongKey, "true") // events.parquet is TIMESTAMP(NANOS)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen + parquet-reader warmup so the first timed query does
    // not absorb one-time session costs (shuffle machinery, codegen
    // compiler, vectorized reader init).
    spark.range(200000).selectExpr("id % 10 AS k", "id * 1.0 AS v")
      .groupBy("k").sum("v").count()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Each query runs twice and reports the min: a single run on a
    // contended box can read 2× its clean cost (BENCH_r02 vs the quiet
    // re-run) — best-of-2 measures the code, not the neighbors. A
    // failure is LOUD: the query lands in "errors" with its exception
    // and the process exits nonzero, never as a fast-looking -1 line.
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Either[String, Double] = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        // full text to stderr; the driver line carries a capped head
        System.err.println(s"[bench] FAILED: ${e.getClass.getName}: " +
          String.valueOf(e.getMessage).take(500))
        Left(s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    // A best-of-2 that is STILL slow is usually two back-to-back hits
    // from the same contention burst (BENCH_r04: q_decontam read 7.7 s
    // on the driver box vs 0.8 s clean), so queries whose min exceeds
    // this get one more attempt before the number is recorded.
    val RetrySec = 2.0
    // Below that absolute bar, contention still inflates short queries
    // invisibly: BENCH_r08's alphabetically-early agg_* cluster read
    // 3-4x its clean cost (~+5 s total) with every query under 2 s.
    // BenchFloors pins each query's clean-run cost at the committed
    // HEAD; a best-of-2 above 2.5x its floor joins the second pass too.
    // The +150 ms slack keeps sub-100 ms queries from retrying on
    // proportionally-large but absolutely-tiny jitter. Queries with no
    // committed floor (added since the last harvest) fall back to the
    // absolute rule alone.
    def inflated(name: String, t: Double): Boolean =
      t > RetrySec || BenchFloors.floor.get(name).exists(f => t > 2.5 * f + 0.15)
    val firstPass = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val r = (once(fn), once(fn)) match {
        case (Right(a), Right(b)) => Right(math.min(a, b))
        case (Right(a), Left(_)) => Right(a) // flaky second run: keep the good time
        case (Left(_), Right(b)) => Right(b)
        case (Left(err), Left(_)) => Left(err)
      }
      name -> r
    }
    // Retries run as a SECOND pass after every other query has finished
    // — minutes later, not milliseconds — so a burst that straddled both
    // first-pass runs has had time to clear (BENCH_r07's inflations
    // survived an immediate third attempt; a clean re-run later read
    // 31 s vs the recorded 40.5 s).
    val runs = firstPass.map {
      case (name, Right(t)) if inflated(name, t) =>
        name -> (once(SparkEntry.queries(name)) match {
          case Right(c) => Right(math.min(t, c))
          case Left(_) => Right(t)
        })
      case other => other
    }
    // The driver keeps only a bounded TAIL (~2000 chars) of stdout and
    // parses the LAST line — the whole line must fit that window. The
    // precision/key-prefix/top-K fallback ladder lives in driverLine
    // (pure, spec-simulated); the rotation index is the count of
    // committed BENCH_r*.json files — the driver adds exactly one per
    // round, so consecutive rounds report consecutive windows.
    // Resolve the repo root by walking up to build.sbt rather than
    // trusting the cwd: launched from a wrapper directory, "." holds no
    // BENCH files and the rotation would silently freeze at window 0 —
    // the exact permanently-invisible-tail problem it exists to fix.
    val roundIdx: Int = Iterator
      .iterate(new java.io.File(".").getAbsoluteFile)(_.getParentFile)
      .takeWhile(_ != null)
      .find(dir => new java.io.File(dir, "build.sbt").exists)
      .flatMap(dir => Option(dir.listFiles))
      .map(_.count(f => f.getName.matches("BENCH_r\\d+\\.json")))
      .getOrElse(0)
    val sfName = sfDir.split('/').last
    // Full per-query map for the FLOOR harvest (tools/gen_floors.py) —
    // printed BEFORE the driver-parsed line so the driver's bounded
    // stdout tail still ends with the budgeted metric line. Without
    // this, a renderTop() fallback would leave the cheapest queries
    // floor-less: exactly the ones whose contention inflation the
    // absolute threshold cannot see.
    val floorQs = runs.map { case (k, v) =>
      jstr(k) + ":" + v.fold(_ => "null", fmt(_, 3))
    }.mkString("{", ",", "}")
    println(s"""{"metric":"floors_all","queries":$floorQs,"sf":"$sfName"}""")
    println(driverLine(runs, roundIdx, sfName))
    spark.stop()
    if (runs.exists(_._2.isLeft)) sys.exit(1)
  }
}
