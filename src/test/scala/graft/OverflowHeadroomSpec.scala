package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** The integer-scaling headroom audit (r11 VERDICT item 3).
  *
  * ~18 operators integerize a double quantity onto a 1e3/1e6/1e9/1e12
  * lattice and accumulate it in int64 so the cross-row reduction is
  * order-free and engine-exact. Each such trick has a cliff: the SF at
  * which the binding accumulator leaves int64 (Spark wraps silently
  * off-ANSI; DuckDB raises — the engines then diverge in failure MODE,
  * which is worse than both being wrong the same way). Round 11's
  * q_seasonal_strength overflow at sf0.1 was caught late by the ANSI
  * gate; this spec makes every cliff explicit and guarded:
  *
  *  1. one table row per scaling site: the binding accumulator, its
  *     growth law in SF, and a CLAIMED max SF — asserted to keep the
  *     modeled magnitude under Long.MaxValue/2 (2× headroom);
  *  2. a data-driven probe per site measuring the REAL accumulator
  *     magnitude on the shipped sf0.001 corpus — asserted under the
  *     model at that SF, so the model is anchored to reality and a
  *     REGENERATED corpus with hotter values trips a spec, not a
  *     silent wrap at the next scale-up;
  *  3. a source scan: any ops/ code that floors onto a 1eN lattice
  *     into a BIGINT/long near an aggregation must appear in this
  *     table — a new scaling site cannot ship un-audited.
  *
  * Growth-law anchors were measured on sf0.001 AND sf0.1 (2026-08-14,
  * DuckDB over the shipped corpora) — ratios confirmed const/log sites
  * at ~1× and the three super-linear cliffs: q_anova (max group-sum
  * squared, ∝SF², 9.9e11 at sf0.1), q_seasonal_strength (n·Σv3²,
  * ∝SF², 5.3e14 at sf0.1), q_spearman (Σc·rx·ry, ∝SF³, 6.0e16 at
  * sf0.1 — the ONLY site whose honest ceiling sits below sf1, matching
  * its code comment "at sf ≥ 1 the cross sums need DECIMAL").
  *
  * Double-lattice note: a few per-term doubles exceed 2^53 before the
  * claimed ceilings (e.g. q_cramers_v chi2·1e9 at sf≫2). That degrades
  * the 1e-9 lattice's absolute granularity, NOT engine parity — both
  * engines floor the SAME IEEE double — so only int64 width is audited
  * here.
  */
class OverflowHeadroomSpec extends SparkSpec {

  private val MaxAbs = Long.MaxValue / 2.0 // 2x headroom demanded of every claim

  private def ln(x: Double) = math.log(x)
  private def evN(sf: Double) = 1e6 * sf // events rows
  private def liN(sf: Double) = 6e6 * sf // lineitem rows
  private def docN(sf: Double) = 5e5 * sf // documents rows

  private def events(s: SparkSession, d: String) =
    Tables.events(s, d).withColumn("day", col("ts").cast(DateType))

  private def dmax(df: DataFrame): Double =
    Option(df.head().get(0)).map(_.toString.toDouble).getOrElse(0.0)

  final case class Site(
      op: String,
      scale: String,
      accumulator: String,
      growth: String,
      claimedMaxSf: Double,
      model: Double => Double,
      probe: Option[(SparkSession, String) => Double],
      // accumulator capacity: int64 by default; a site whose fold rides
      // DECIMAL(38,0) (r17: q_brunner_munzel) audits against the
      // decimal width instead — same 2x headroom discipline
      maxAbs: Double = MaxAbs)

  private val sites: Seq[Site] = Seq(

    Site("q_cat_entropy", "1e9", "per-day Σ|p·ln(n/c)|·1e9 (shared entropyOfCells)",
      "const (entropy ≤ ln k_types)", 1e9, _ => 2e9,
      Some((s, d) => dmax {
        val c = events(s, d).groupBy("day", "event_type").agg(count(lit(1)).as("c"))
          .withColumn("n", sum("c").over(Window.partitionBy("day")))
        c.groupBy("day")
          .agg(sum(abs(col("c").cast("double") / col("n") *
            log(col("n").cast("double") / col("c")) * 1e9)).as("m"))
          .agg(max("m"))
      })),

    Site("q_mutual_info", "1e9", "per-day Σ|p·ln(lift)|·1e9 over ≤20 cells",
      "const (MI ≤ ln 4; sparse small-n days dominate)", 1e9, _ => 1e10,
      Some((s, d) => dmax {
        val c = events(s, d)
          .groupBy(col("day"), col("event_type"),
            floor(hour(col("ts")) / 6).as("pod"))
          .agg(count(lit(1)).as("nij"))
          .withColumn("n", sum("nij").over(Window.partitionBy("day")))
          .withColumn("ni", sum("nij").over(Window.partitionBy("day", "event_type")))
          .withColumn("nj", sum("nij").over(Window.partitionBy("day", "pod")))
        c.groupBy("day")
          .agg(sum(abs(col("nij").cast("double") / col("n") *
            log(col("nij").cast("double") * col("n") /
              (col("ni").cast("double") * col("nj"))) * 1e9)).as("m"))
          .agg(max("m"))
      })),

    Site("q_cramers_v", "1e9", "chi9 = Σ(o−e)²/e · 1e9 over 35 cells",
      "linear (chi2 ≤ (min(r,c)−1)·n = 4n)", 1000.0,
      sf => 4 * evN(sf) * 1e9 + 1e5,
      Some((s, d) => dmax {
        val c = events(s, d)
          .groupBy(col("event_type"), dayofweek(col("day")).as("dow"))
          .agg(count(lit(1)).as("o"))
          .withColumn("r", sum("o").over(Window.partitionBy("event_type")))
          .withColumn("cc", sum("o").over(Window.partitionBy("dow")))
          .withColumn("n", sum("o").over(Window.partitionBy()))
        val ex = col("r").cast("double") * col("cc") / col("n")
        c.agg(sum(abs((col("o") - ex) * (col("o") - ex) / ex * 1e9)))
      })),

    Site("q_theil", "1e9", "per-nation tw9 = Σ|share·ln(share·ng)|·1e9",
      "log (within-Theil ≤ ln n_suppliers_per_nation)", 1e6,
      sf => 1e9 * (ln(4000 * sf + math.E) + 2),
      Some((s, d) => dmax {
        val sr = Tables.load(s, d, "lineitem").groupBy("l_suppkey")
          .agg(sum(floor(col("l_extendedprice")).cast("long")).as("rev"))
        val j = sr.join(broadcast(Tables.load(s, d, "supplier")),
          sr("l_suppkey") === col("s_suppkey"))
          .withColumn("xg", sum("rev").over(Window.partitionBy("s_nationkey")))
          .withColumn("ng", count(lit(1)).over(Window.partitionBy("s_nationkey")))
        j.groupBy("s_nationkey")
          .agg(sum(abs(col("rev").cast("double") / col("xg") *
            log(col("rev").cast("double") * col("ng") / col("xg")) * 1e9)).as("m"))
          .agg(max("m"))
      })),

    Site("q_psi", "1e9", "per-type Σ|Δp·ln lift|·1e9 over ≤20 buckets + miss term",
      "log (smoothed ratios bounded by ln(n+20))", 1e6,
      sf => 4e10 * (ln(evN(sf) + 20) + 1),
      Some((s, d) => dmax {
        val c = events(s, d)
          .select(col("event_type"),
            when(col("day") < to_date(lit("2024-01-15")), 1).otherwise(2).as("period"),
            least(floor(col("value") / 25), lit(19)).as("bucket"))
          .groupBy("event_type", "bucket")
          .agg(count(when(col("period") === 1, 1)).as("n1"),
            count(when(col("period") === 2, 1)).as("n2"))
          .withColumn("t1", sum("n1").over(Window.partitionBy("event_type")))
          .withColumn("t2", sum("n2").over(Window.partitionBy("event_type")))
        val contrib = abs(((col("n1") + 1).cast("double") / (col("t1") + 20) -
          (col("n2") + 1).cast("double") / (col("t2") + 20)) *
          log((col("n1") + 1).cast("double") * (col("t2") + 20) /
            ((col("n2") + 1).cast("double") * (col("t1") + 20))) * 1e9)
        val mcontrib = abs((lit(1.0) / (col("t1") + 20) - lit(1.0) / (col("t2") + 20)) *
          log((col("t2") + 20) / (col("t1") + 20).cast("double")) * 1e9)
        c.groupBy("event_type")
          .agg((sum(contrib) + lit(20) * max(mcontrib)).as("m"))
          .agg(max("m"))
      })),

    Site("q_bigram_logprob", "1e9", "per-doc lp9 = Σ tf·ln(p)·1e9",
      "log (|ln p| ≤ ln 4(n+v); tokens/doc data-bounded ≤ 128)", 1e6,
      sf => 128 * 1e9 * (ln(4 * (25 * docN(sf) + 1e6)) + 2),
      Some((s, d) => dmax {
        // the data-dependent factor is tokens/doc: probe its max and
        // price it at the model's own |ln p| bound for this SF
        Tables.load(s, d, "documents")
          .agg(max(size(split(col("text"), " "))).cast("double") *
            lit(1e9 * (ln(4 * (25 * docN(0.001) + 1e6)) + 2)))
      })),

    Site("q_decay_score", "1e6", "per-user Σ value·2^(−age/7)·1e6",
      "const (users scale with SF: ~67 events/user; value ≤ 5e3)", 1e9,
      _ => 1e6 * 5000 * 67 * 8,
      Some((s, d) => dmax {
        events(s, d)
          .groupBy("user_id")
          .agg(sum(col("value") *
            pow(lit(0.5), (lit(1706745600L) - Q.epochSec(col("ts"))) / 86400.0 / 7.0) *
            1e6).as("m"))
          .agg(max("m"))
      })),

    Site("q_ewma", "1e6", "per-(type,day) t6 = Σ 0.3·0.7^k·y·1e6 ≤ 3.34·y_max·1e6",
      "linear (y_max = peak daily count per type)", 1e6,
      sf => 3.34e6 * (evN(sf) / 150) * 6,
      Some((s, d) => dmax {
        events(s, d).groupBy("event_type", "day").agg(count(lit(1)).as("c"))
          .agg(max(col("c") * 3.34e6))
      })),

    Site("q_cramer_von_mises", "1e9", "t9 = Σ(c1+c2)·gap²·1e9 (gap ≤ 1)",
      "linear (Σ terms ≤ pooled N = 2·evN/5)", 1000.0,
      sf => 1e9 * evN(sf) + 1e5,
      Some((s, d) => dmax {
        val v = events(s, d)
          .filter(col("event_type").isin("purchase", "click"))
          .select(floor(col("value") * 100 + 0.5).cast("long").as("v100"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("g1"),
            when(col("event_type") === "click", 1L).otherwise(0L).as("g2"))
          .groupBy("v100").agg(sum("g1").as("c1"), sum("g2").as("c2"))
        val wv = Window.orderBy("v100")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val e = v.withColumn("r1", sum("c1").over(wv))
          .withColumn("r2", sum("c2").over(wv))
          .withColumn("n1", sum("c1").over(Window.partitionBy()))
          .withColumn("n2", sum("c2").over(Window.partitionBy()))
        val gap = (col("r1") * col("n2") - col("r2") * col("n1")).cast("double") /
          (col("n1").cast("double") * col("n2"))
        e.agg(sum(abs((col("c1") + col("c2")) * gap * gap * 1e9)))
      })),

    Site("q_pr_auc", "1e6", "ap6 = Σ⌊c1·(cum1/cumt)·1e6⌉ (precision ≤ 1)",
      "linear (Σ terms ≤ 1e6·n1; n1 ≈ 0.2·evN)", 1000.0,
      sf => 1e6 * evN(sf) + 1e5,
      Some((s, d) => dmax {
        val c = events(s, d)
          .filter(col("event_type").isin("purchase", "click"))
          .select(floor(col("value") * 100 + 0.5).cast("long").as("v100"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("g1"),
            when(col("event_type") === "click", 1L).otherwise(0L).as("g2"))
          .groupBy("v100").agg(sum("g1").as("c1"), sum("g2").as("c2"))
        val wd = Window.orderBy(col("v100").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        c.select(col("c1"),
            sum("c1").over(wd).as("cum1"),
            sum(col("c1") + col("c2")).over(wd).as("cumt"))
          .agg(sum(abs(col("c1").cast("double") * col("cum1") / col("cumt") * 1e6)))
      })),

    Site("q_brier", "1e6", "bs6/rel6/res6 = Σ⌊term·1e6⌉ (each term ≤ its cell/bin count)",
      "linear (every accumulator ≤ 1e6·N; N = pooled 2·evN/5)", 1000.0,
      sf => 1e6 * evN(sf) + 1e5,
      Some((s, d) => dmax {
        // the raw-cell BS sum is the largest of the three accumulators'
        // bounds (rel/res ride the SAME nb weights over ≤10 bins)
        val c = events(s, d)
          .filter(col("event_type").isin("purchase", "click"))
          .select(floor(col("value") * 100 + 0.5).cast("long").as("v100"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("g1"),
            when(col("event_type") === "click", 1L).otherwise(0L).as("g2"))
          .groupBy("v100").agg(sum("g1").as("c1"), sum("g2").as("c2"))
          .withColumn("mx", max("v100").over(Window.partitionBy()))
        val sc = col("v100").cast("double") / col("mx")
        c.agg(sum(abs((col("c1") * (sc - 1) * (sc - 1) + col("c2") * sc * sc) * 1e6)))
      })),

    Site("q_calibration", "1e6", "ece6 = Σ⌊nb·|s̄b−ȳb|·1e6⌉ over ≤10 bins (|δ| ≤ 1)",
      "linear (Σ ≤ 1e6·N; N = pooled 2·evN/5)", 1000.0,
      sf => 1e6 * evN(sf) + 1e5,
      Some((s, d) => dmax {
        val c = events(s, d)
          .filter(col("event_type").isin("purchase", "click"))
          .select(floor(col("value") * 100 + 0.5).cast("long").as("v100"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("g1"),
            when(col("event_type") === "click", 1L).otherwise(0L).as("g2"))
          .groupBy("v100").agg(sum("g1").as("c1"), sum("g2").as("c2"))
        // worst-case proxy ≥ the binned fold: Σ over cells of count·1e6
        c.agg(sum(abs((col("c1") + col("c2")) * lit(1e6))))
      })),

    Site("q_woe_iv", "1e9", "iv9 = Σ⌊(gs−bs)·WoE·1e9⌉ over |brands| cells",
      "const (each |term| ≤ |WoE|max ≈ ln(2(G+B)) — shares ≤ 1; ≤25 brands)",
      1e6, sf => 25e9 * (ln(2 * liN(sf) + math.E) + 1), None),

    Site("q_embed_dim", "1e3/unit", "M_jk = n·Σx3ⱼx3ₖ − Σx3ⱼ·Σx3ₖ (= n²·cov); f2 = Σ⌊w·cov²⌉ over 2080 cells",
      "quadratic in vectors (|M| ≤ 2n²·1e6; n ≈ 5e4·sf); f2 const-bounded (cov ≤ 2e6)", 25.0,
      sf => {
        val n = 5e4 * sf
        2 * n * n * 1e6 + 9e15
      },
      Some((s, d) => dmax {
        val e = Tables.load(s, d, "embeddings")
          .select(expr("transform(embedding, v -> CAST(floor(v * 1000 + 0.5) AS BIGINT))").as("x3"))
        val sp = e.select(explode(expr(
            """flatten(transform(sequence(0, 63), j ->
              |  transform(sequence(j, 63), k ->
              |    named_struct('j', j, 'k', k,
              |                 'p', element_at(x3, j + 1) * element_at(x3, k + 1)))))""".stripMargin))
            .as("t"))
          .select(col("t.j").as("j"), col("t.k").as("k"), col("t.p").as("p"))
          .groupBy("j", "k").agg(sum("p").as("sp"))
        val s1 = e.select(posexplode(col("x3")).as(Seq("j0", "v")))
          .groupBy("j0").agg(sum("v").as("s1"))
        val nDf = e.agg(count(lit(1)).as("n"))
        sp.join(s1.select(col("j0").as("j"), col("s1").as("s1a")), Seq("j"))
          .join(s1.select(col("j0").as("k"), col("s1").as("s1b")), Seq("k"))
          .crossJoin(nDf)
          .agg(max(abs(col("n") * col("sp") - col("s1a") * col("s1b"))))
      })),

    Site("q_ndcg", "1e6", "dcg6/idcg6 = Σ⌊test·w·1e6⌉ over ≤10 terms (w ≤ 1)",
      "const-ish (≤ 10·1e6·max supplier-period revenue; TPC-H lineitems "
        + "per supplier are SF-invariant, so per-supplier cents plateau)", 1e6,
      _ => 8e16,
      Some((s, d) => dmax {
        Tables.load(s, d, "lineitem")
          .filter(year(col("l_shipdate")) >= 1998)
          .groupBy("l_suppkey")
          .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
            .cast("long")).as("c"))
          .agg(max(col("c") * 1e7)) // 10 terms × 1e6 lattice
      })),

    Site("q_mrr", "1e6", "rr6 = ⌊(1/rk)·1e6⌉ summed over nations",
      "const (Σ ≤ 1e6·|nations| = 2.5e7)", 1e9, _ => 1e9, None),

    Site("q_map", "1e6", "psum6 = Σ⌊(cumhits/rk)·1e6⌉ over ≤10 terms (P@i ≤ 1); "
      + "ap6 ≤ 1e6; macro s6 ≤ 1e6·|nations|",
      "const (Σ ≤ 2.5e7)", 1e9, _ => 1e9, None),

    Site("q_rbo", "1e6", "s6 = Σ⌊T(m)·1e6⌉ over ≤10 common suppliers (T(1) < 2.4)",
      "const (Σ ≤ 2.4e7 per nation)", 1e9, _ => 1e9, None),

    Site("q_ppl_bucket", "1e9/1e4", "per-doc lp9 = Σ tf·⌊ln(c/T)·1e9⌉; bucket Σm4",
      "lp9 ≤ n_tri·ln(T)·1e9 (doc length bounded, T log-grows); "
        + "Σm4 ≤ docs·|mean lp|·1e4 — linear", 1e6,
      sf => 4e13 + 2e10 * sf,
      Some((s, d) => dmax {
        // upper bound of any |lp9|: (longest doc's trigram count) ×
        // (the rarest trigram's |ln p|·1e9 = ln(T)·1e9)
        val docs = Tables.load(s, d, "documents").filter(length(col("text")) >= 3)
        val t = docs.select(col("lang"), (length(col("text")) - 2).as("nt"))
          .groupBy("lang").agg(sum("nt").as("tt"), max("nt").as("mx"))
        t.agg(max(col("mx") * log(col("tt").cast("double")) * 1e9))
      })),

    Site("q_perm_entropy", "1e9",
      "per-type h9 = Σ (c/m)·ln(m/c)·1e9 ≤ ln(6)·1e9 over ≤6 pattern cells",
      "const (entropy ≤ ln 6)", 1e9, _ => 2e9,
      Some((s, d) => dmax {
        // h9 reconstructed from the r6-rounded readout (~1e3 absolute
        // error — noise against the const ln(6)·1e9 bound this site
        // audits; an exact recompute would re-derive the whole fold)
        graft.ops.SeriesTests.permEntropyOf(
          graft.ops.Inference.dailyCounts(s, d))
          .agg(max(col("perm_entropy") * 1.791759469228055 * 1e9))
      })),

    Site("q_icc", "exact int64",
      "A = Σ(n·s_d − S)² over days (no lattice; B = Σ(k·y − s_d)² is orders below)",
      "SF² (day sums ∝ SF; n, k are the calendar/type enums)",
      200, sf => 31 * math.pow(31 * 33000 * sf, 2),
      Some((s, d) => dmax {
        // the REAL A and B, inverted from the fold's own mean squares:
        // A = msb·k·n²·(n−1), B = msw·k²·n·(k−1) (r6 rounding is
        // negligible at magnitude-audit precision)
        graft.ops.SeriesTests.iccOf(graft.ops.Inference.dailyCounts(s, d))
          .agg(max(greatest(
            col("msb") * col("n_types") * col("n_days") * col("n_days") *
              (col("n_days") - 1),
            col("msw") * col("n_types") * col("n_types") * col("n_days") *
              (col("n_types") - 1))))
      })),

    Site("q_word_entropy", "1e9",
      "per-lang h9 = Σ (c12/N)·ln(c1/c12)·1e9 ≤ ln(N)·1e9 (conditional entropy "
        + "bounded by the log of the bigram mass)",
      "log (H ≤ ln N)", 1e9, sf => math.log(30 * docN(sf)) * 1e9,
      Some((s, d) => dmax {
        // the REAL h9, recovered from the reported nats: h9 = H·1e9
        SparkEntry.queries("q_word_entropy")(s, d)
          .agg(max(col("h_cond") * 1e9))
      })),

    Site("q_brunner_munzel", "1e3",
      "u1/u2 = Σ floor(c·d²·1e3) ≤ N³·1e3 over the cents grid (d ≤ N rank "
        + "deviations), folded in DECIMAL(38,0) since r17 — the N³ growth "
        + "was the repo's tightest int64 ceiling (sf ≤ 0.4)",
      "SF³·1e3 (N ∝ SF) against the 1e38 decimal width — past 2^53 the "
        + "per-cell lattice coarsens to ULP size identically in both "
        + "engines (header note); the overflow cliff itself is gone",
      40, sf => math.pow(0.4 * evN(sf), 3) * 1e3,
      Some((s, d) => dmax {
        // the REAL binding u on the shipped corpus through the SAME
        // deviation frame the fold accumulates (Statistics.bmDevFrame —
        // an inline re-implementation would keep auditing stale math)
        val e = graft.ops.Statistics.bmDevFrame(
          graft.ops.Statistics.centsGrid(s, d))
        e.agg(greatest(
          coalesce(sum(floor(col("c1") * col("d1") * col("d1") * lit(1e3) + 0.5)
            .cast("decimal(38,0)")), lit(0L)),
          coalesce(sum(floor(col("c2") * col("d2") * col("d2") * lit(1e3) + 0.5)
            .cast("decimal(38,0)")), lit(0L))).cast("double"))
      }),
      maxAbs = 1e38 / 2.0),

    Site("q_rfm_migration", "unit",
      "segment-transition counts ≤ users (no lattice of its own — the "
        + "source scan attributes Analytics' trailing huberOf 1e6 weight "
        + "lattice to the file's last Q block; that fold is audited under "
        + "the q_huber row)",
      "linear (counts ≤ users)", 1e6, sf => evN(sf), None),

    Site("q_huber", "1e6",
      "per-type swv = Σ c·w6·v with w6 ≤ 1e6, v ≤ max cents — the IRLS "
        + "weighted-sum fold (median/MAD crossings are plain counts)",
      "linear (≤ 1e6·maxcents·N; maxcents ≈ 1e5)", 10,
      sf => 1e6 * 1e5 * evN(sf),
      Some((s, d) => dmax {
        Tables.events(s, d)
          .select(floor(col("value") * 100 + 0.5).cast("long").as("v"))
          .agg((sum("v") * 1e6).as("m")).select(max("m"))
      })),

    Site("q_pinball", "unit",
      "dp/dn = Σd⁺/Σd⁻ over integer daily-count residuals — ≤ total event "
        + "rows; no lattice of its own (the source scan attributes "
        + "SeriesTests' trailing shared-fold lattices to the file's last "
        + "Q block; those folds are audited under their own ops' rows)",
      "linear (Σ|d| ≤ N)", 1e6, sf => 2 * evN(sf), None),

    Site("q_sq8_recall", "1e4",
      "ae4 = Σcands |s4 − t4| with both scores on the ±1e4 cosine lattice "
        + "— ≤ 2e4 per candidate pair",
      "linear (candidates = embeddings rows; ~5e4·sf vectors)", 1e6,
      sf => 2e4 * 5e4 * math.max(sf, 1e-3), None),

    Site("q_pq_recall", "1e6/1e4",
      "three lattices: codebook sufficient statistics s6 = Σmembers "
        + "⌊x·1e6⌉ over the FIXED ≤1024-subvector training sample (≤ "
        + "~2e9, SF-INVARIANT by construction); assignment scores sc6 "
        + "= ⌊(x·c − c·c/2)·1e6⌉ ≤ ~3.3e7 per row (16-dim ~unit "
        + "sub-vectors, const); and the sq8-form ae4 = Σcands |s4 − t4| "
        + "on the ±1e4 cosine lattice — the one SF-growing fold",
      "linear (candidates = embeddings rows; ~5e4·sf vectors) + const "
        + "training terms", 1e6,
      sf => 2e4 * 5e4 * math.max(sf, 1e-3) + 2.1e9, None),

    Site("q_audio_fingerprint", "1e3",
      "the 1e3 lattice is the shared sample synthesis audited under "
        + "q_audio_features; this op's own folds are the fingerprint "
        + "(≤ 4 offsets < 16 packed base-16 + a nibble ≤ 2^20) and "
        + "|types|-bounded collision counts ≤ clips",
      "linear (counts ≤ clips ∝ events)", 1e6, sf => evN(sf) + 1e6, None),

    Site("q_audio_silence", "1e3",
      "Σ quiet_run ≤ 64 per clip (the 1e3 lattice is the shared sample "
        + "synthesis audited under q_audio_features; this screen's own "
        + "folds are run lengths and conditional counts)",
      "linear (≤ 64·clips)", 1e6, sf => 64 * evN(sf), None),

    Site("q_audio_features", "1e3",
      "per-type te = Σclips Σt (a·s3)² with a ≤ 32, |s3| ≤ 1e3, 64 samples "
        + "— ≤ 6.554e10 per clip (the sine floors onto the 1e3 lattice "
        + "BEFORE the integer amplitude multiply, so samples are exact int)",
      "SF (clips ∝ events)", 50, sf => 64.0 * 32 * 1000 * 32 * 1000 * evN(sf),
      Some((s, d) => dmax {
        graft.ops.Multimodal.audioClips(s, d)
          .groupBy("event_type").agg(sum("energy").as("te"))
          .agg(max("te").cast("double"))
      })),

    Site("q_ansari_bradley", "1e3",
      "ab3 = Σ floor(c1·S_run/t·1e3) ≤ (N²/2)·1e3 over the cents grid (N = "
        + "purchase+click rows)",
      "SF² (N ∝ SF)", 200, sf => math.pow(0.4 * evN(sf), 2) / 2 * 1e3,
      Some((s, d) => dmax {
        // the REAL ab3 on the shipped corpus, recovered from the
        // reported statistic: ab3 = ab·1e3
        graft.ops.Statistics.abOf(graft.ops.Statistics.centsGrid(s, d))
          .agg(max(col("ab") * 1e3))
      })),

    Site("q_spectral_entropy", "1e6/1e9",
      "tot6 = Σ 13 variance shares ≤ 1.3e7; h9 = Σ p·ln(1/p)·1e9 ≤ ln(13)·1e9 "
        + "(shared periodogramFrame lattice rides q_periodogram's audited trig site)",
      "const (entropy ≤ ln 13, shares ≤ 1 each)", 1e9, _ => 3e9,
      Some((s, d) => dmax {
        // the REAL h9 on the shipped corpus, recovered from the
        // reported normalized entropy: h9 = H·ln(13)·1e9
        graft.ops.SeriesTests.spectralEntropyOf(
          graft.ops.Inference.dailyCounts(s, d))
          .agg(max(col("spectral_entropy") * 2.5649493574615367 * 1e9))
      })),

    Site("q_theta_forecast", "(none own)",
      "q_theta_forecast accumulates NO lattice of its own (int64 trend moments, "
        + "one float SES fold, Q.r6 output rounding only)",
      "const (no lattice)", 1e9, _ => 3e9, None),

    Site("q_sigma_clip", "(none own)",
      "q_sigma_clip accumulates NO lattice of its own (exact int64 (n, Σy, Σy²) "
        + "moments per round — Σy² is the binding term, the q_poisson_dispersion "
        + "accumulator, ∝SF² via per-day-type counts; the survivor predicate is "
        + "cross-multiplied |n·y − s| vs a float bound, no floor)",
      "const (no lattice)", 1e9, _ => 3e9, None),

    Site("q_loess_trend", "1e6",
      "per-fit weighted sums Σ⌊w·u·y·1e6⌉ over ≤15 neighbors (w ≤ 1, |u| ≤ 7, "
        + "y = per-day-type count ∝ SF) — swuy ≈ 15·7·y·1e6 binds; as "
        + "SeriesTests' LAST Q block it also inherits the file-trailing shared "
        + "folds in the scanner — permEntropyOf/spectralEntropyOf 1e9 entropy "
        + "lattices, audited under their own rows",
      "linear in SF (y ≈ 6.7e3·SF per cell)", 1e5, sf => 15 * 7 * 6.7e3 * sf * 1e6 * 3,
      Some((s, d) => dmax {
        graft.ops.Inference.dailyCounts(s, d)
          .agg(max(col("y")) * 15 * 7 * 1e6)
      })),

    Site("q_croston", "1e6",
      "ordering key f6 = ⌊(z/p)·1e6⌉ per part (z ≤ max daily part demand, "
        + "p ≥ 1 — intervals are ≥ 1 days and the seed is 1.0)",
      "const-ish (per-part daily demand is SF-invariant: parts and lineitem "
        + "both scale with SF)", 1e6, _ => 1e11, None),

    Site("q_fdr_bh", "cents", "whole-corpus Σv² of cent-integerized customer "
        + "balances (tot CTE; v ≤ 1e6 cents so v² ≤ 1e12/row)",
      "linear — anchored 4.62e15 @ sf0.1; at sf > ~30 the balance Σv² needs "
        + "DECIMAL (the q_spearman class); the p9 lattice itself is ≤ 1e9 const",
      30.0, sf => 4.62e15 * (sf / 0.1) * 3,
      Some((s, d) => dmax {
        Tables.load(s, d, "customer")
          .select(floor(col("c_acctbal") * 100 + 0.5).as("v"))
          .agg(sum(col("v").cast("double") * col("v")))
      })),

    Site("q_meta_fixed", "1e15/1e12/1e6", "cross-study Σ⌊w·1e15⌉ (binding "
        + "lattice sum; w = 1/v grows ∝ n per study — anchored 2.33e7 @ sf0.1, "
        + "so ~2.3e13 even at sf 1e5); the per-cell Σv² cents moments share "
        + "q_fdr_bh's sf ≤ ~30 DECIMAL ceiling and bind first",
      "linear in SF (w ∝ study n)", 30.0, sf => 2.33e7 * (sf / 0.1) * 10,
      Some((s, d) => dmax {
        val cv = Tables.load(s, d, "customer").select(col("c_nationkey"),
          when(col("c_mktsegment") === "BUILDING", 1).otherwise(0).as("grp"),
          floor(col("c_acctbal") * 100 + 0.5).cast("long").as("v"))
        val g = cv.groupBy("c_nationkey", "grp")
          .agg(count(lit(1)).as("n"), sum("v").as("s"), sum(col("v") * col("v")).as("q"))
        g.groupBy("c_nationkey")
          .agg(max(when(col("grp") === 1, col("n"))).as("n1"),
            max(when(col("grp") === 1, col("s"))).as("s1"),
            max(when(col("grp") === 1, col("q"))).as("q1"),
            max(when(col("grp") === 0, col("n"))).as("n2"),
            max(when(col("grp") === 0, col("s"))).as("s2"),
            max(when(col("grp") === 0, col("q"))).as("q2"))
          .filter(col("n1") >= 2 && col("n2") >= 2)
          .select(((col("q1").cast("double") - col("s1").cast("double") / col("n1") * col("s1")) /
            (col("n1") - 1) / col("n1") +
            (col("q2").cast("double") - col("s2").cast("double") / col("n2") * col("s2")) /
              (col("n2") - 1) / col("n2")).as("v"))
          .filter(col("v") > 0)
          .agg(sum(floor(lit(1.0) / col("v") * lit(1e15) + 0.5)))
      })),

    Site("q_kn_logprob", "1e9", "per-source Σ⌊tf·ln(p)·1e9⌋ — the q_source_xent "
        + "accumulator with the KN probability in place of add-one (|ln p| ≤ "
        + "ln(cu/0.25) + continuation floor — same log-linear-in-tokens class)",
      "linear×log (the q_source_xent model; KN p is bounded BELOW by the "
        + "continuation term D·nf/cu·nw/T ≥ 0.75/cu·1/T so |ln p| grows as "
        + "ln(cu·T) ≈ 2·ln(tokens))", 3.0,
      sf => 1.2e18 * sf + 1e9,
      Some((s, d) => dmax {
        val tf = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("word"))
          .groupBy("doc_id", "lang", "word").agg(count(lit(1)).as("tf"))
        val trl = tf.groupBy("lang")
          .agg(sum("tf").as("n"), countDistinct("word").as("v"))
        // conservative super-bound: 2× the unigram-model magnitude
        // (|ln p_KN| ≤ ln(cu·T) ≤ 2·ln(n+v) per bigram token)
        tf.join(broadcast(trl), "lang")
          .select(abs(col("tf") * log((col("n") + col("v")).cast("double")) * 2e9).as("m"))
          .agg(sum("m"))
      })),

    Site("q_weibull_fit", "1e6", "regression sums Σ⌊c·x·y·1e6⌉ over the "
        + "distinct-gap grid (|x| = ln(gap) ≤ ln(calendar) ≈ 7.8, |y| = "
        + "ln(−ln(1−F)) ≤ ~ln(ln(n)) + 8 at the tails; c ∝ SF per cell)",
      "linear×log (Σ ≈ n_gaps·|x·y|·1e6 ≤ n_gaps·63e6; orders n = 1.5e6·SF)",
      500.0, sf => 1.5e6 * sf * 63e6 * 3 + 1e6,
      Some((s, d) => dmax {
        // conservative super-bound: every gap at the max |x·y| envelope
        Tables.load(s, d, "orders").agg(count(lit(1)).cast("double") * 63e6)
      })),

    Site("q_xyz_class", "(none own)",
      "q_xyz_class accumulates NO lattice of its own (exact int64 (S, Σq²) "
        + "per part with CROSS-MULTIPLIED band compares; per-part weekly demand "
        + "is SF-invariant, the q_croston argument); as Timeseries' LAST Q "
        + "block it inherits the file-trailing shared survival folds in the "
        + "scanner — kmOf/naOf/logRankOf 1e9 lattices, audited under their own "
        + "q_kaplan_meier/q_nelson_aalen/q_log_rank rows",
      "const (see the owning rows)", 1e9, _ => 3e9, None),

    Site("q_markov_attribution", "1e12/1e9", "per-step Σ⌊mass·prob·1e12⌉ per "
        + "(chain, state) — mass ≤ 1 and ≤ 7 source states contribute, so each "
        + "cell ≤ 7e12 regardless of SF (the q_markov_stationary bound); the "
        + "rem9 share lattice is ≤ 1e9 const",
      "const (probability mass, not counts)", 1e9, _ => 1e13, None),

    Site("q_logistic_1d", "1e6", "per-step IRLS gradient/Hessian cells — binding "
        + "is Σ⌊x²·n·p(1−p)·1e6⌉ ≤ N·x²·2.5e5 (x ≤ ~5 — value/$100; events "
        + "N = 1e6·SF); the deviance lattice shares the bound ×|ln p| ≤ ~7",
      "linear in SF (Σ ≈ 6.3e12·SF at the x² envelope)", 100.0,
      sf => 6.3e12 * sf * 3 + 1e6,
      Some((s, d) => dmax {
        Tables.events(s, d).agg(count(lit(1)).cast("double") * 25 * 2.5e5)
      })),

    Site("q_gmm_em", "1e9/1e3/1e0", "per-round responsibility moments — binding "
        + "is Σ⌊c·r·v²⌉ ≤ Σc·v² (r ≤ 1; v ≤ ~49e3 cents ⇒ v² ≤ 2.4e9; purchase "
        + "rows ∝ SF)",
      "linear in SF (Σc·v² ≈ 2e5·SF·avg(v²))", 1000.0,
      sf => 4.8e14 * sf * 3 + 1e9,
      Some((s, d) => dmax {
        Tables.events(s, d).filter(col("event_type") === "purchase")
          .select(floor(col("value") * 100 + 0.5).as("v"))
          .agg(sum(col("v") * col("v")).cast("double"))
      })),

    Site("q_impute_quality", "1e3", "per-imputer Σ⌊|v−imp|·1e3⌉ over the masked "
        + "10% (|err| ≤ 1e6 cents ⇒ ≤ 1e9 per row; masked rows = 1.5e4·SF)",
      "linear in SF", 100.0, sf => 1.5e13 * sf * 3 + 1e6,
      Some((s, d) => dmax {
        Tables.load(s, d, "customer").filter(col("c_custkey") % 10 === 0)
          .agg(count(lit(1)).cast("double") * 1e9)
      })),

    Site("q_adamic_adar", "1e6",
      "per-pair aa6 = Σ floor(1e6/ln(deg(w))) over common neighbors (deg ≥ 2 ⇒ "
        + "credit ≤ 1e6/ln 2 ≈ 1.443e6 — the q_graph_ra bound × 2.89)",
      "const-ish (aa6 ≤ n_common·1.443e6 ≤ deg_max·1.443e6; same SF-invariant "
        + "co-purchase degree argument as q_graph_ra)", 1e6, _ => 3e12, None),

    Site("q_graph_ra", "1e6", "per-pair ra6 = Σ floor(1e6/deg(w)) over common neighbors",
      "const-ish (ra6 ≤ n_common·5e5 ≤ deg_max·5e5 — a pair's common neighbors are "
        + "bounded by its endpoint degrees, and TPC-H co-purchase degrees are "
        + "SF-invariant: orders and parts both scale with lineitem)", 1e6, _ => 1e12,
      Some((s, d) => dmax {
        // bound probe: deg_max of the support graph × the max per-w
        // credit (deg(w) ≥ 2 ⇒ credit ≤ 5e5)
        val e = Tables.load(s, d, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("pk")).distinct()
          .groupBy("o").agg(collect_set("pk").as("pks"))
          .select(explode(col("pks")).as("a"), col("pks"))
          .select(col("a"), explode(col("pks")).as("b"))
          .filter(col("a") < col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("cooc"))
          .filter(col("cooc") >= 2)
        val adj = e.select(col("a").as("n"), col("b").as("x"))
          .unionAll(e.select(col("b").as("n"), col("a").as("x")))
        adj.groupBy("n").agg(count(lit(1)).as("degw"))
          .agg(max(lit(5e5) * col("degw")))
      })),

    Site("q_hits", "exact int64", "h² = ΣΣΣ indeg over 2 power rounds (no lattice)",
      "const-ish (≤ maxdeg_p²·maxdeg_s² — TPC-H degrees are SF-invariant: "
        + "suppliers and parts scale WITH lineitem)", 1e6, _ => 1e9,
      Some((s, d) => dmax {
        val pairs = Tables.load(s, d, "lineitem")
          .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk")).distinct()
        val a1 = pairs.groupBy("sk").agg(count(lit(1)).as("v"))
        val h1 = pairs.join(a1, "sk").groupBy("pk").agg(sum("v").as("v"))
        val a2 = pairs.join(h1, "pk").groupBy("sk").agg(sum("v").as("v"))
        pairs.join(a2, "sk").groupBy("pk").agg(sum("v").as("v")).agg(max("v"))
      })),

    Site("q_periodogram", "1e6", "A = Σ sr·c6 over ≤14 residues (sr = residue-class Σ of r = D·y − T)",
      "linear (|A| ≤ 1e6·Σ|r| ≤ 2e6·D·T; D = |days| ≈ 31, T = per-type events)", 1000.0,
      sf => 2e6 * 31 * evN(sf) + 1e6,
      Some((s, d) => dmax {
        val daily = events(s, d).groupBy(col("event_type"),
          datediff(col("day"), lit("2024-01-01").cast(DateType)).cast("long").as("x"))
          .agg(count(lit(1)).as("y"))
          .withColumn("dd", count(lit(1)).over(Window.partitionBy("event_type")))
          .withColumn("tt", sum("y").over(Window.partitionBy("event_type")))
          .withColumn("r", col("dd") * col("y") - col("tt"))
        // probe the worst |A| proxy: 1e6 · Σ|r| per type (≥ any residue fold)
        daily.groupBy("event_type").agg(sum(abs(col("r")) * 1e6).as("m")).agg(max("m"))
      })),

    Site("q_wasserstein_1d", "exact int64", "tw = Σ|r1·n2−r2·n1|·Δv100 (no lattice)",
      "quadratic (≤ n1·n2·cents-range; n1,n2 ≈ 0.2·evN, range ≤ 1e5)", 20.0,
      sf => 1e4 * evN(sf) * evN(sf) + 1e5,
      Some((s, d) => dmax {
        val c = events(s, d)
          .filter(col("event_type").isin("purchase", "click"))
          .select(floor(col("value") * 100 + 0.5).cast("long").as("v100"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("g1"),
            when(col("event_type") === "click", 1L).otherwise(0L).as("g2"))
          .groupBy("v100").agg(sum("g1").as("c1"), sum("g2").as("c2"))
        val wv = Window.orderBy("v100")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val e = c.withColumn("r1", sum("c1").over(wv))
          .withColumn("r2", sum("c2").over(wv))
          .withColumn("n1", sum("c1").over(Window.partitionBy()))
          .withColumn("n2", sum("c2").over(Window.partitionBy()))
          .withColumn("nxt", lead("v100", 1).over(Window.orderBy("v100")))
        e.agg(sum(when(col("nxt").isNotNull,
          abs(col("r1") * col("n2") - col("r2") * col("n1")) *
            (col("nxt") - col("v100")))))
      })),

    Site("q_anderson_darling", "1e9", "t9 = Σ m·D²/(n1·n2·B·(N−B))·1e9 (D exact as double to sf≈470)",
      "n·ln n (tail weights sum harmonically: A² ≤ ~4·n1·n2·ln N/N)", 100.0,
      sf => 1e9 * evN(sf) * (ln(evN(sf) + math.E) + 2),
      Some((s, d) => dmax {
        val c = events(s, d)
          .filter(col("event_type").isin("purchase", "click"))
          .select(floor(col("value") * 100 + 0.5).cast("long").as("v100"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("g1"),
            when(col("event_type") === "click", 1L).otherwise(0L).as("g2"))
          .groupBy("v100").agg(sum("g1").as("c1"), sum("g2").as("c2"))
        val wv = Window.orderBy("v100")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val e = c.withColumn("r1", sum("c1").over(wv))
          .withColumn("r2", sum("c2").over(wv))
          .withColumn("n1", sum("c1").over(Window.partitionBy()))
          .withColumn("n2", sum("c2").over(Window.partitionBy()))
        val bb = col("r1") + col("r2")
        val nn = col("n1") + col("n2")
        val dd = (col("n2") * col("r1") - col("n1") * col("r2")).cast("double")
        e.agg(sum(when(bb < nn,
          abs((col("c1") + col("c2")).cast("double") * dd * dd /
            (col("n1").cast("double") * col("n2") *
              (bb * (nn - bb)).cast("double")) * 1e9))))
      })),

    Site("q_hellinger", "1e9", "bc9 = Σ√(p·q)·1e9 (BC ≤ 1 by Cauchy–Schwarz)",
      "const", 1e9, _ => 2e9, None),

    Site("q_energy_dist", "exact int64",
      "axy/bxx/cyy = Σ w·(cross-rank products) (no lattice)",
      "quadratic (each ≤ 2·n1·n2·cents-range — double the q_wasserstein_1d bound, so the ceiling sits at sf 14, not 20)", 14.0,
      sf => 2e4 * evN(sf) * evN(sf) + 1e5,
      Some((s, d) => dmax {
        val c = events(s, d)
          .filter(col("event_type").isin("purchase", "click"))
          .select(floor(col("value") * 100 + 0.5).cast("long").as("v100"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("g1"),
            when(col("event_type") === "click", 1L).otherwise(0L).as("g2"))
          .groupBy("v100").agg(sum("g1").as("c1"), sum("g2").as("c2"))
        val wv = Window.orderBy("v100")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val e = c.withColumn("r1", sum("c1").over(wv))
          .withColumn("r2", sum("c2").over(wv))
          .withColumn("n1", sum("c1").over(Window.partitionBy()))
          .withColumn("n2", sum("c2").over(Window.partitionBy()))
          .withColumn("w", lead("v100", 1).over(Window.orderBy("v100")) - col("v100"))
        e.agg(sum(when(col("w").isNotNull,
          abs(col("w") * (col("r1") * (col("n2") - col("r2")) +
            col("r2") * (col("n1") - col("r1")))))))
      })),

    Site("q_nelson_aalen", "1e9", "running h9 = Σ d/n·1e9 (v9 = Σ d/n² is smaller)",
      "log (each term ≤ 1; ≤ |hours| ≈ 2400 death-hour terms)", 1e6,
      _ => 1e9 * 2400 + 1e5,
      Some((s, d) => dmax {
        val u = events(s, d).groupBy("user_id")
          .agg(min(Q.epochSec(col("ts"))).as("fs"), max(Q.epochSec(col("ts"))).as("ls"))
        val f = u.withColumn("te", max("ls").over(Window.partitionBy()))
          .select(floor((col("ls") - col("fs")) / 3600.0).as("t_hour"),
            when(col("te") - col("ls") > 43200, 1L).otherwise(0L).as("churn"))
          .groupBy("t_hour").agg(count(lit(1)).as("m"), sum("churn").as("dd"))
          .withColumn("n_risk", sum("m").over(Window.partitionBy()) -
            coalesce(sum("m").over(Window.orderBy("t_hour")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .filter(col("dd") > 0)
        f.agg(sum(abs(col("dd").cast("double") / col("n_risk") * 1e9)))
      })),

    Site("q_log_rank", "1e9", "e9 = Σ n1·d/n·1e9 (per-term ≤ d; Σd ≤ n_users)",
      "linear (Σ terms ≤ n_users = 1.5e6·sf)", 1000.0,
      sf => 1e9 * (1.5e4 * sf * 100) + 1e5,
      Some((s, d) => dmax {
        val u = events(s, d).groupBy("user_id")
          .agg(min(Q.epochSec(col("ts"))).as("fs"), max(Q.epochSec(col("ts"))).as("ls"))
        val f = u.withColumn("te", max("ls").over(Window.partitionBy()))
          .select(floor((col("ls") - col("fs")) / 3600.0).as("t_hour"),
            when(col("user_id") % 2 === 1, 1L).otherwise(0L).as("g1"),
            when(col("te") - col("ls") > 43200, 1L).otherwise(0L).as("churn"))
          .groupBy("t_hour").agg(count(lit(1)).as("m"), sum("g1").as("m1"),
            sum("churn").as("dd"))
          .withColumn("n", sum("m").over(Window.partitionBy()) -
            coalesce(sum("m").over(Window.orderBy("t_hour")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("n1", sum("m1").over(Window.partitionBy()) -
            coalesce(sum("m1").over(Window.orderBy("t_hour")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .filter(col("dd") > 0)
        f.agg(sum(abs(col("n1").cast("double") * col("dd") / col("n") * 1e9)))
      })),

    Site("q_kaplan_meier", "1e9", "running lnsum9 = Σ ln(1−dd/n_risk)·1e9",
      "log (≤ |hours| · ln n_users terms)", 1e6,
      sf => 1e9 * 2400 * (ln(1.5e4 * sf * 100 + math.E) + 4),
      Some((s, d) => dmax {
        val u = events(s, d).groupBy("user_id")
          .agg(min(Q.epochSec(col("ts"))).as("fs"), max(Q.epochSec(col("ts"))).as("ls"))
        val f = u.withColumn("te", max("ls").over(Window.partitionBy()))
          .select(floor((col("ls") - col("fs")) / 3600.0).as("t_hour"),
            when(col("te") - col("ls") > 43200, 1L).otherwise(0L).as("churn"))
          .groupBy("t_hour").agg(count(lit(1)).as("m"), sum("churn").as("dd"))
          .withColumn("n_risk", sum("m").over(Window.partitionBy()) -
            coalesce(sum("m").over(Window.orderBy("t_hour")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .filter(col("dd") > 0 && col("dd") < col("n_risk"))
        f.agg(sum(abs(log(lit(1.0) - col("dd").cast("double") / col("n_risk")) * 1e9)))
      })),

    Site("q_markov_stationary", "1e12", "per-state s = Σ floor(p·prob·1e12)",
      "const (Σ p·prob ≤ 1 by stochasticity)", 1e9, _ => 1.2e12,
      Some((s, d) => dmax {
        // the only data knob is the state count (rounding adds k/2)
        events(s, d).agg(lit(1e12) + countDistinct("event_type").cast("double"))
      })),

    Site("q_seasonal_strength", "1e3", "n·Σv3² + (Σ|v3|)² over the decompose frame",
      "SF² (v3 ∝ daily count; row count fixed) — anchored 5.26e14 @ sf0.1", 6.0,
      sf => 5.26e14 * math.pow(sf / 0.1, 2) * 2,
      Some((s, d) => dmax {
        val daily = events(s, d).groupBy(col("event_type"),
            datediff(col("day"), to_date(lit("2024-01-01"))).as("x"))
          .agg(count(lit(1)).as("y"))
        val w7 = Window.partitionBy("event_type").orderBy("x").rowsBetween(-3, 3)
        val f = daily.withColumn("t7", sum("y").over(w7))
          .withColumn("n7", count(lit(1)).over(w7))
          .filter(col("n7") === 7)
          .withColumn("d7", lit(7) * col("y") - col("t7"))
        val sn = f.groupBy(col("event_type").as("et2"), (col("x") % 7).as("ph"))
          .agg(sum("d7").as("sd7"), count(lit(1)).as("sc"))
        val v = f.join(sn, col("event_type") === col("et2") && col("x") % 7 === col("ph"))
          .select(col("event_type").as("et"),
            floor((col("d7") / 7.0 - col("sd7") / (lit(7.0) * col("sc"))) * 1e3 + 0.5).as("r3v"),
            floor((col("d7") / 7.0) * 1e3 + 0.5).as("s3v"),
            floor((col("y") - col("sd7") / (lit(7.0) * col("sc"))) * 1e3 + 0.5).as("t3v"))
        v.groupBy("et").agg((count(lit(1)) * greatest(
            sum(col("r3v") * col("r3v")), sum(col("s3v") * col("s3v")),
            sum(col("t3v") * col("t3v"))) +
          greatest(sum(abs(col("r3v"))), sum(abs(col("s3v"))),
            sum(abs(col("t3v")))) * greatest(sum(abs(col("r3v"))),
            sum(abs(col("s3v"))), sum(abs(col("t3v"))))).cast("double").as("g"))
          .agg(max("g"))
      })),

    Site("q_elasticity", "1e6", "OLS sums over ≤11 buckets of ln-ratio·1e6",
      "const (x=ln(1−d/100), y=ln(avg qty) ≤ ln 50 — both bucket-bounded)", 1e9,
      _ => 121 * math.pow(ln(50) * 1e6, 2) * 2,
      Some((s, d) => dmax {
        val b = Tables.load(s, d, "lineitem")
          .groupBy(floor(col("l_discount") * 100 + 0.5).as("dd"))
          .agg(sum(floor(col("l_quantity")).cast("long")).as("sq"),
            count(lit(1)).as("n"))
          .filter(col("dd") > 0)
        b.agg((count(lit(1)) * sum(pow(log(col("sq").cast("double") / col("n")) * 1e6, 2)))
          .cast("double"))
      })),

    Site("q_zipf_fit", "1e6", "syy = Σ (ln cnt · 1e6)² over top-1000 ranks",
      "log² (cnt ≤ total corpus tokens)", 1e6,
      sf => 1000 * math.pow(ln(25 * docN(sf) + math.E) * 1e6, 2),
      Some((s, d) => dmax {
        val c = Tables.load(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc).limit(1000)
        c.agg(sum(pow(log(col("cnt").cast("double")) * 1e6, 2)))
      })),

    Site("q_anova", "1e6", "raw s·s (max group sum squared, int64 multiply)",
      "SF² — anchored 9.87e11 @ sf0.1", 100.0,
      sf => 9.87e11 * math.pow(sf / 0.1, 2) * 4,
      Some((s, d) => dmax {
        events(s, d).groupBy("event_type")
          .agg(sum(floor(col("value")).cast("long")).as("s"))
          .agg(max(col("s").cast("double") * col("s")))
      })),

    Site("q_tukey_hsd", "1e6", "raw s·s before the 1e6-lattice s²/n partial (q_anova's exact machinery, same m frame)",
      "SF² — anchored 9.87e11 @ sf0.1", 100.0,
      sf => 9.87e11 * math.pow(sf / 0.1, 2) * 4,
      None), // same bound, corpus anchor and probe frame as q_anova above

    Site("q_moods_median", "1e6", "b6 = Σ⌊a²/n_g·1e6+½⌋ over ≤|types| groups (a ≤ n_g ≤ 366 days)",
      "const (days ≤ 366 fixed, types enum-bounded — SF-invariant)", 300.0,
      _ => 20 * 366 * 1e6 * 2,
      Some((s, d) => dmax {
        // a²/n_g ≤ n_g: bound the lattice mass by Σ n_g·1e6 directly
        ops.Inference.dailyCounts(s, d)
          .groupBy("event_type").agg((count(lit(1)) * 1e6).as("m"))
          .agg(sum("m"))
      })),

    Site("q_source_xent", "1e9", "per-source Σ⌊tf·ln(p)·1e9⌋ (|ln p| ≤ ln(n+v) — log-linear in tokens)",
      "linear×log (measured 2.44e14 @ sf0.001 over ALL sources — the probe is the conservative whole-corpus sum)", 7.0,
      sf => 6e17 * sf + 1e9,
      Some((s, d) => dmax {
        val tf = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("word"))
          .groupBy("doc_id", "lang", "word").agg(count(lit(1)).as("tf"))
        val trl = tf.groupBy("lang")
          .agg(sum("tf").as("n"), countDistinct("word").as("v"))
        tf.join(broadcast(trl), "lang")
          .select(abs(col("tf") * log((col("n") + col("v")).cast("double")) * 1e9).as("m"))
          .agg(sum("m"))
      })),

    Site("q_bartlett", "1e6/1e12", "sw6 = Σ_g ⌊SSW_g·1e6⌋ (binding); lt6/inv12 strictly smaller",
      "linear (SSW ≤ Σv² ≈ v̄²·N)", 100.0,
      sf => 2.5e15 * sf * 4 + 1e9,
      Some((s, d) => dmax {
        val g = Tables.events(s, d)
          .select(col("event_type"), floor(col("value")).cast("long").as("v"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("v").as("s"),
            sum(col("v") * col("v")).as("ss"))
        g.filter(col("n") >= 2)
          .agg(sum(abs((col("ss") - col("s").cast("double") * col("s") / col("n")) * 1e6)))
      })),

    Site("q_kruskal_wallis", "unit floor", "b0 = Σ_g ⌊R_g²/n_g + ½⌋ ≤ N³ (cross-group rank-power sum)",
      "SF³ (R_g ≤ n_g·N ⇒ Σ R²/n ≤ N³); DECIMAL needed past the ceiling", 1.0,
      sf => math.pow(evN(sf), 3) + 1e6,
      Some((s, d) => dmax {
        // the actual b0 at sf0.001: per-type doubled rank sums over the
        // cents grid, squared into the unit-floored cross-group sum
        val c = Tables.events(s, d)
          .select(col("event_type").as("g"),
            floor(col("value") * 100 + 0.5).cast("long").as("v100"))
          .groupBy("g", "v100").agg(count(lit(1)).as("c"))
        val tv = c.groupBy("v100").agg(sum("c").as("t"))
        val wb = Window.orderBy("v100").rowsBetween(Window.unboundedPreceding, -1)
        val tr = tv.select(col("v100"), col("t"),
          coalesce(sum("t").over(wb), lit(0L)).as("cb"))
        c.join(tr, "v100").groupBy("g")
          .agg(sum("c").as("n_g"),
            sum(col("c") * (lit(2) * col("cb") + col("t") + 1)).as("r2"))
          .agg(sum(col("r2").cast("double") * col("r2") / (lit(4.0) * col("n_g"))))
      })),

    Site("q_spearman", "ranks", "Σ c·rx·ry ≤ 4n³ (cross rank-product sum)",
      "SF³ — anchored 6.03e16 @ sf0.1; DECIMAL needed past the ceiling", 0.3,
      sf => 6.03e16 * math.pow(sf / 0.1, 3) * 2,
      Some((s, d) => dmax {
        val m = Tables.load(s, d, "lineitem")
          .select(floor(col("l_quantity")).as("q"),
            floor(col("l_discount") * 100 + 0.5).as("dd"),
            floor(col("l_tax") * 100 + 0.5).as("t"))
          .groupBy("q", "dd", "t").agg(count(lit(1)).as("c"))
        val rq = sum("c").over(Window.orderBy("q")) * 2
        val rd = sum("c").over(Window.orderBy("dd")) * 2
        m.select(col("c"), rq.as("rq2"), rd.as("rd2"))
          .agg(sum(col("c").cast("double") * col("rq2") * col("rd2")) / 4)
      })),

    Site("q_jarque_bera", "unit floor", "Σv⁴ raw power sum",
      "~linear with value-tail growth (slack 20×) — anchored 1.45e13 @ sf0.1", 1000.0,
      sf => 1.45e13 * (sf / 0.1) * 20,
      Some((s, d) => dmax {
        events(s, d).select(floor(col("value") + 0.5).as("v"))
          .agg(sum(pow(col("v").cast("double"), 4)))
      })),

    Site("q_welch_t", "cents", "Σv² of cent-integerized values (two arms)",
      "linear — anchored 1.98e12 @ sf0.1", 100.0,
      sf => 1.98e12 * (sf / 0.1) * 10,
      Some((s, d) => dmax {
        events(s, d).filter(col("event_type").isin("purchase", "click"))
          .select(floor(col("value") * 100 + 0.5).as("v"))
          .agg(sum(col("v").cast("double") * col("v")))
      })),

    Site("q_bootstrap_ci", "1e3", "cross-replica Σm3² (B=20 millicent means)",
      "const (means, not sums — anchored 5.3e14)", 1e9, _ => 2.2e15,
      Some((s, d) => dmax {
        events(s, d).filter(col("event_type") === "purchase")
          .agg(lit(20.0) * pow(avg(col("value")) * 1e5, 2))
      })),

    Site("q_ljung_box", "1e12", "lb12 = Σ_{k≤7} floor(r_k²/(n−k)·1e12)",
      "const (|r_k| ≤ ~1 ⇒ 7 terms of ≤1e12)", 1e9, _ => 2e13,
      Some((s, d) => dmax {
        // recover lb12 from the shipped query's own report: q = n(n+2)·lb12/1e12
        SparkEntry.queries("q_ljung_box")(s, d)
          .agg(max(col("q_stat") / (col("n_days") * (col("n_days") + 2)) * 1e12))
      })),

    Site("q_brown_forsythe", "1e6", "b6 = Σ_g floor(s_g²/n_g·1e6) over z2 deviations",
      "linear (s_g ∝ group size; s_g²/n_g ∝ SF) — anchored ~6.5e14 @ sf0.1", 100.0,
      sf => 6.5e14 * (sf / 0.1) * 2,
      Some((s, d) => dmax {
        val m = events(s, d)
          .select(col("event_type"), floor(col("value")).cast("long").as("v"))
        val med = m.groupBy("event_type")
          .agg((expr("percentile(v, 0.5)") * 2).cast("long").as("m2"))
        m.join(broadcast(med), "event_type")
          .select(col("event_type"), abs(lit(2) * col("v") - col("m2")).as("z2"))
          .groupBy("event_type")
          .agg((sum("z2").cast("double") * sum("z2") / count(lit(1)) * 1e6).as("b"))
          .agg(sum("b"))
      })),

    Site("q_embed_norms", "1e3", "per-label Σ(c·n3²) over 1e-3-quantized L2 norms",
      "linear (rows per label; 64-dim unit-ish norms ≤ ~15)", 1e5,
      sf => (2e4 * math.max(sf, 1e-3)) * math.pow(15 * 1e3, 2) * 2,
      Some((s, d) => dmax {
        import org.apache.spark.sql.functions.{expr => e2}
        Tables.load(s, d, "embeddings")
          .select(floor(sqrt(e2(
            """aggregate(zip_with(embedding, embedding, (p, q) -> CAST(p AS DOUBLE) * q),
              |          CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)) * 1e3 + 0.5)
            .as("n3"), col("label"))
          .groupBy("label").agg(sum(col("n3") * col("n3")).as("m"))
          .agg(max("m"))
      })),

    Site("q_hill_tail", "1e9", "per-type s9 = Σ_{i≤100} ln(x_i/x_101)·1e9",
      "log-const (100 terms, each ≤ ln(max/min cents) ≈ 20 nats)", 1e9,
      _ => 100 * 25 * 1e9,
      Some((s, d) => dmax {
        // recover s9 from the shipped report: alpha = 100/(s9/1e9)
        SparkEntry.queries("q_hill_tail")(s, d)
          .agg(max(lit(100.0) / col("alpha_hat") * 1e9))
      })),

    Site("q_entropy_rate", "1e12/1e9", "π iteration s ≤ 1e12 (markov lattice); h9 = Σ π·p·ln(1/p)·1e9 ≤ ln(k)·1e9",
      "const (both stochastically bounded)", 1e9, _ => 1.2e12,
      Some((s, d) => dmax {
        // the shipped query reports the bounded quantities directly
        SparkEntry.queries("q_entropy_rate")(s, d)
          .agg(max(greatest(col("entropy_rate") * 1e9, lit(1e12) + col("k_states"))))
      })),

    Site("q_hurst", "1e6", "per-(type,w) Σ floor(R/S·1e6) over calendar-bounded blocks",
      "const (R/S ≤ w ≤ 28; blocks ≤ |days|/7 per type)", 1e9,
      _ => 28.0 * 1e6 * 400 * 2,
      Some((s, d) => dmax {
        // blocks are calendar-bounded: the shipped query's per-window
        // means bound the lattice sum by max(rs)·1e6·(|days|/7)
        SparkEntry.queries("q_hurst")(s, d)
          .agg(max(greatest(col("rs7"), col("rs14"), col("rs28")) * 1e6 * lit(5)))
      })),

    Site("q_js_divergence", "1e9", "per-source Σ|cell JS contribution|·1e9 over 201 buckets",
      "const (Σ|cells| ≤ ~1 nat by the mixture bound)", 1e9, _ => 2e9,
      Some((s, d) => dmax {
        // |0.5p·ln(p/m)| + |0.5q·ln(q/m)| summed over the completed grid;
        // compact abs-sum twin of the op body
        val w = Tables.load(s, d, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        val top = w.groupBy("tok").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok")).limit(200)
          .select(col("tok").as("ttok"))
        val sb = w.join(broadcast(top), col("tok") === col("ttok"), "left")
          .select(col("source"), coalesce(col("ttok"), lit("~other~")).as("bucket"))
          .groupBy("source", "bucket").agg(count(lit(1)).as("c"))
        val srcs = sb.groupBy("source").agg(sum("c").as("ns"))
        val buckets = top.select(col("ttok").as("bucket"))
          .unionAll(s.range(1).select(lit("~other~").as("bucket")))
        val cb = sb.groupBy("bucket").agg(sum("c").as("cc"))
        val ncDf = sb.agg(sum("c").as("nc"))
        val grid = srcs.crossJoin(broadcast(buckets))
          .join(sb, Seq("source", "bucket"), "left")
          .join(broadcast(cb), Seq("bucket"), "left")
          .crossJoin(broadcast(ncDf))
          .select(col("source"),
            (coalesce(col("c"), lit(0L)).cast("double") / col("ns")).as("p"),
            (coalesce(col("cc"), lit(0L)).cast("double") / col("nc")).as("q"))
        val mm = (col("p") + col("q")) / 2
        grid.select(col("source"),
            (abs(when(col("p") > 0, lit(0.5) * col("p") * log(col("p") / mm)).otherwise(lit(0.0))) +
              abs(when(col("q") > 0, lit(0.5) * col("q") * log(col("q") / mm)).otherwise(lit(0.0))))
              .as("a"))
          .groupBy("source").agg((sum("a") * 1e9).as("m"))
          .agg(max("m"))
      })),

    Site("q_graph_modularity", "1e12", "Σ_b floor((e_bb/m − (d_b/2m)²)·1e12) over ≤|brands| rows",
      "const (each term bounded by 1 in magnitude; ≤25 brands)", 1e9,
      _ => 25 * 1e12 * 2,
      Some((s, d) => dmax {
        // |sum| ≤ Σ|t12|; mirror the op's term with abs
        val e = ops.Graph.coPairs(s, d)
        val brand = Tables.load(s, d, "part").select(col("p_partkey"), col("p_brand"))
        val m = e.count().toDouble
        val deg = e.select(explode(array(col("a"), col("b"))).as("node"))
          .groupBy("node").agg(count(lit(1)).as("dg"))
        val nb = deg.join(brand, deg("node") === brand("p_partkey"))
          .groupBy(col("p_brand").as("brand")).agg(sum("dg").as("db"))
        val ib = e
          .join(brand.select(col("p_partkey").as("a"), col("p_brand").as("ba")), "a")
          .join(brand.select(col("p_partkey").as("b"), col("p_brand").as("bb")), "b")
          .filter(col("ba") === col("bb"))
          .groupBy(col("ba").as("brand")).agg(count(lit(1)).as("ebb"))
        nb.join(ib, Seq("brand"), "left")
          .select((abs(coalesce(col("ebb"), lit(0L)).cast("double") / m -
            (col("db").cast("double") / (2 * m)) * (col("db").cast("double") / (2 * m)))
            * 1e12).as("a"))
          .agg(sum("a"))
      })),

    Site("q_page_hinkley", "1e6", "running Σ floor((y − ȳ_t)·1e6) per type (the ONE sequential int64 accumulation)",
      "linear (|y − ȳ| ≤ max daily count ∝ SF; ≤366 days)", 1000.0,
      sf => 366.0 * evN(sf) * 1e6 * 2,
      Some((s, d) => dmax {
        // |m6| ≤ Σ|t6|; mirror the op's per-day deviation with abs
        val wx = Window.partitionBy("event_type").orderBy("x")
        val run = wx.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .groupBy(col("event_type"),
            datediff(col("ts").cast(DateType), to_date(lit("2024-01-01")))
              .cast("long").as("x"))
          .agg(count(lit(1)).as("y"))
          .withColumn("cn", count(lit(1)).over(run))
          .withColumn("cs", sum("y").over(run))
          .select(col("event_type"),
            abs(floor((col("y") - col("cs").cast("double") / col("cn")) * 1e6 + 0.5))
              .as("a"))
          .groupBy("event_type").agg(sum("a").as("m"))
          .agg(max("m"))
      })),

    Site("q_revenue_bridge", "1e2", "per-brand Σ integer-cent terms (shared Pricing.partYear lattice; price_index rides the same cents)",
      "linear (total lineitem revenue in cents ∝ SF)", 1e4,
      sf => liN(sf) * 4e6 * 2, // ≤ ~$40k/row in cents
      Some((s, d) => dmax {
        // every bridge/index accumulator is bounded by the total cents
        Tables.load(s, d, "lineitem")
          .select(floor(col("l_extendedprice") * 1e2 + 0.5).cast("long").as("c"))
          .agg(sum("c"))
      })),

    Site("q_price_index", "1e2", "per-year Σ cent-lattice cross products (p_t·q₀, p₀·q_t ≈ transaction cents)",
      "linear (matched-part revenue ≤ total revenue in cents ∝ SF)", 1e4,
      sf => liN(sf) * 4e6 * 2,
      None), // same bound and corpus anchor as q_revenue_bridge above

    Site("q_adf", "int64 sums", "B = n·Σy²_{t−1} − (Σy)² per type (variance_ratio's n·Σd² legs are strictly smaller)",
      "quadratic in SF (daily counts ∝ SF; ≤366 days fixed)", 300.0,
      sf => 400.0 * 400.0 * math.pow(evN(sf) / 100, 2) * 2,
      Some((s, d) => dmax {
        val lg = ops.Inference.dailyCounts(s, d)
          .withColumn("yp", lag("y", 1).over(
            Window.partitionBy("event_type").orderBy("x")))
          .filter(col("yp").isNotNull)
        lg.groupBy("event_type")
          .agg((count(lit(1)) * sum(col("yp") * col("yp"))).as("m"))
          .agg(max("m"))
      })),

    Site("q_rolling_corr", "1e6", "per-window c6 = floor(corr·1e6+½) (never summed; the full-series n·Σxy legs share q_adf's quadratic model)",
      "const (|corr| ≤ 1 by construction)", 300.0, _ => 2e6, None),

    Site("q_doc_novelty", "1e6", "per-source Σf6 over 1e6-lattice per-doc unique-shingle fractions (f ≤ 1)",
      "linear (documents rows per source)", 1e5,
      sf => docN(sf) * 1e6 * 2,
      Some((s, d) => dmax {
        Tables.load(s, d, "documents")
          .groupBy("source").agg((count(lit(1)) * 1e6).as("m"))
          .agg(max("m"))
      })),

    Site("q_silhouette", "1e6", "per-label Σ|s6| over 1e6-lattice silhouette scores (|s| ≤ 1)",
      "linear (embeddings rows per label; label skew floors the small-SF anchor)", 1e5,
      sf => (2e4 * math.max(sf, 5e-3)) * 1e6 * 2,
      Some((s, d) => dmax {
        Tables.load(s, d, "embeddings")
          .groupBy("label").agg((count(lit(1)) * 1e6).as("m"))
          .agg(max("m"))
      }))
  )

  test("every claimed SF ceiling keeps its binding accumulator inside int64 with 2x headroom") {
    val failures = sites.flatMap { st =>
      val m = st.model(st.claimedMaxSf)
      if (m <= st.maxAbs) None
      else Some(f"${st.op}: model(${st.claimedMaxSf}) = $m%.3e > ${st.maxAbs}%.3e")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    // and none is vacuous: the model must be a real magnitude
    sites.foreach(st => assert(st.model(st.claimedMaxSf) > 0))
  }

  test("the shipped corpus stays inside every accumulator model (regeneration tripwire)") {
    val sf = 0.001
    val failures = sites.flatMap { st =>
      st.probe.flatMap { p =>
        val measured = p(spark, sfDir)
        val bound = st.model(sf)
        if (measured <= bound) None
        else Some(f"${st.op}: measured $measured%.3e > model($sf) = $bound%.3e — " +
          "the regenerated corpus broke this site's headroom model; re-derive " +
          "the claimed max SF before trusting the oracle at scale")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every 1eN scaling site in ops/ is enumerated in this audit") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val flag = """\*\s*(?:lit\()?1e\d+\)?\s*\+\s*0\.5""".r
    val intish = """AS BIGINT|cast\("long"\)""".r
    val opsDir = Paths.get("src/main/scala/graft/ops")
    val audited = sites.map(_.op).toSet
    // shared helpers whose scaling sites are audited under their op
    val helperHomes = Map("Inference.scala" -> "q_cat_entropy",
      "Pricing.scala" -> "q_revenue_bridge",
      // Analytics' head helpers carry woeOf's shared 1e9 IV lattice,
      // audited under the q_woe_iv Site row (one fold, batch +
      // streaming faces)
      "Analytics.scala" -> "q_woe_iv",
      // SeriesTests.tukeyOf carries the shared s²/n lattice (batch
      // q_tukey_hsd + the s_tukey_hsd read-time view) above the Q blocks
      "SeriesTests.scala" -> "q_tukey_hsd",
      // Timeseries.kmOf/naOf/logRankOf share the survival-grid 1e9
      // lattices audited under the q_kaplan_meier / q_nelson_aalen /
      // q_log_rank Site rows (same fold, batch + streaming faces)
      "Timeseries.scala" -> "q_kaplan_meier",
      // Statistics.cvmOf/adOf carry the 1e-9 ECDF-gap lattices audited
      // under the q_cramer_von_mises / q_anderson_darling Site rows
      // (same folds, batch + streaming faces; w1Of/cliffsOf are exact
      // int64 with their own Site coverage)
      "Statistics.scala" -> "q_cramer_von_mises",
      // Similarity's PQ helpers (pqAssign/pqUpdate 1e-6 lattices) are
      // ONE fold shared by q_pq_recall and q_knn_ivfpq, audited under
      // the q_pq_recall Site row (fixed training sample — SF-invariant)
      "Similarity.scala" -> "q_pq_recall")
    val flagged = Files.list(opsDir).iterator().asScala
      .filter(_.toString.endsWith(".scala")).flatMap { p =>
        val src = new String(Files.readAllBytes(p))
        val blocks = src.split("""Q\("""").toSeq match {
          case head +: rest =>
            (helperHomes.getOrElse(p.getFileName.toString, "(helpers)"), head) +:
              rest.map(b => b.takeWhile(_ != '"') -> b)
          case other => other.map(b => b.takeWhile(_ != '"') -> b)
        }
        blocks.collect { case (name, body)
          if flag.findFirstMatchIn(body).exists { m =>
            val lo = math.max(0, m.start - 80)
            intish.findFirstIn(body.slice(lo, math.min(body.length, m.end + 80))).isDefined
          } =>
          p.getFileName.toString -> name
        }
      }.toSeq
    val unaudited = flagged.collect {
      case (file, name) if !audited.contains(name) => s"$file:$name"
    }
    assert(unaudited.isEmpty,
      s"integer-scaling sites with no headroom audit row: ${unaudited.mkString(", ")} — " +
        "add a Site entry with a growth model and claimed max SF")
    // Canaries: the scanner must positively FIND known sites in every
    // family file that carries them — a regex drift that stopped
    // matching (say, a reformatted lattice expression) would otherwise
    // silently void the whole audit while this test stays green. One
    // anchor per file, including the post-audit Diagnostics additions
    // (r12 verdict item).
    val found = flagged.toSet
    for (canary <- Seq(
        "Diagnostics.scala" -> "q_ljung_box", "Diagnostics.scala" -> "q_hurst",
        "Diagnostics.scala" -> "q_js_divergence", "Statistics.scala" -> "q_anova",
        "Timeseries.scala" -> "q_markov_stationary", "Lexicon.scala" -> "q_zipf_fit",
        "TextPipeline.scala" -> "q_bigram_logprob", "Inference.scala" -> "q_cat_entropy",
        // round-14 family anchors: the CvM/AD 1e-9 ECDF lattices and
        // the periodogram's 1e6 trig lattice
        "Statistics.scala" -> "q_cramer_von_mises",
        "Statistics.scala" -> "q_anderson_darling",
        "SeriesTests.scala" -> "q_periodogram"))
      assert(found.contains(canary),
        s"scanner no longer detects the known lattice site $canary — the flag regex " +
          "has drifted from the house scaling idiom; fix the scan, not the canary")
  }
}
