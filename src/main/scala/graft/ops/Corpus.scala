package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for LLM training-data pipelines
  * (SURVEY §2.10 extensions, round 3): deterministic train/val/test
  * splitting, document chunking, PII scrubbing, n-gram frequency
  * tables.
  *
  * Same design rules as [[TextPipeline]]: md5 for every hash that must
  * be engine-portable (so every op here is fully oracled), higher-order
  * functions instead of UDFs, and per-row generators (explode over an
  * in-row sequence) instead of joins, so each op is a single
  * narrow-dependency pass over the corpus — embarrassingly parallel at
  * 100 TB, no shuffle except the declared aggregations.
  */
object Corpus {

  /** Chunking layout: fixed character windows with overlap — the
    * standard context-window prep for LLM pretraining. stride < size
    * gives (size - stride) chars of overlap between adjacent chunks. */
  private val ChunkSize = 200
  private val ChunkStride = 150

  /** Bloom layout for q_bloom_decontam: M bits packed into M/W words of
    * W=32 bits (32 keeps every shift/OR in positive int range on both
    * engines — no sign-bit parity traps), k=2 probes per shingle from
    * disjoint 5-hex-digit (20-bit) slices of md5(shingle). With n
    * holdout shingles the false-positive rate is (1−e^(−2n/M))²; M is
    * the scale knob — the broadcast is always exactly M bits no matter
    * how big the holdout set gets, which is the whole point vs
    * q_decontam's broadcast of the raw shingle strings. */
  private val BloomBits = 1 << 18 // 262144
  private val BloomWordBits = 32
  private val BloomWords = BloomBits / BloomWordBits // 8192

  /** DuckDB twin of the Spark-side `conv(substring(h,1,10),16,10)`:
    * 10-nibble (40-bit) hex parse via instr arithmetic (the
    * q_sample_stratified pairing, widened). One parse serves both bloom
    * probes — the high 20 bits make p1, the low 20 make p2. */
  private def sqlHex10(h: String): String =
    (0 until 10).map { i =>
      s"(instr('0123456789abcdef', substring($h, ${i + 1}, 1)) - 1) * ${1L << (4 * (9 - i))}"
    }.mkString("(", " + ", ")")

  /** ONE home for the deterministic train/val/test assignment — the
    * Spark rule and its SQL twin — shared by q_sample_split and
    * q_split_leakage so a threshold retune can never desynchronize the
    * split an eval set was CUT on from the split leakage is MEASURED
    * on (the LshPairCtes/cmsDepthStructs one-home pattern; r14
    * review). Bucket = first md5 byte of the doc key compared as hex
    * text: 'cd' = 205/256 ≈ 80% train, 'e6' = 230/256 ≈ +10% val,
    * rest test. */
  private[graft] val SplitCaseSql: String =
    "CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train' " +
      "WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val' " +
      "ELSE 'test' END"
  private[graft] def splitCol: Column = {
    val h = substring(md5(col("doc_id").cast("string")), 1, 2)
    when(h < "cd", "train").when(h < "e6", "val").otherwise("test")
  }

  /** ONE home for the content-hash shard assignment (q_shard_skew and
    * its streaming face — the grids cannot drift). */
  private[graft] def shardCol: Column = expr(
    "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT) % 64")

  /** The budget-trim fold over a (lang, q4, docs, toks) quality grid —
    * ONE home shared by batch q_token_budget_trim and the
    * s_token_budget_trim streaming read-time view
    * (streaming.Streams.trimGrid maintains the grid incrementally; the
    * binding bucket isn't mergeable — the cell counts are). The walk,
    * the binding bucket q*, and the kept/partial masses all run over
    * the bounded grid. */
  private[graft] def trimOf(gIn: DataFrame): DataFrame = {
    val g = Q.snapshot(gIn)
    val t = g.groupBy("lang")
      .agg(sum("toks").as("total"),
        floor(sum("toks") / lit(2)).cast("long").as("budget"))
    val cu = sum("toks").over(Window.partitionBy("lang").orderBy(col("q4").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val c = g.join(t, "lang").withColumn("cu", cu)
    val isPartial = col("cu") - col("toks") < col("budget") && col("cu") > col("budget")
    c.groupBy("lang", "total", "budget")
      .agg(
        sum(when(col("cu") <= col("budget"), col("docs")).otherwise(0L)).as("docs_full"),
        sum(when(col("cu") <= col("budget"), col("toks")).otherwise(0L)).as("tokens_full"),
        max(when(isPartial, col("q4"))).as("qstar4"),
        max(when(isPartial, col("budget") - (col("cu") - col("toks"))))
          .as("partial_left"))
      .select(col("lang"), col("total").as("total_tokens"), col("budget"),
        col("docs_full"), col("tokens_full"),
        (col("qstar4") / lit(10000.0)).as("q_star"), col("partial_left"))
      .orderBy("lang")
  }

  def defs: Seq[QueryDef] = Seq(

    // Deterministic train/val/test split (rule: SplitCaseSql/splitCol
    // above — md5 hex is identical in Spark and DuckDB, and
    // lexicographic order on [0-9a-f] IS numeric order). Content-hash
    // splitting is reshuffle-proof and join-free: the same doc lands in
    // the same split on any cluster layout, at any scale — unlike
    // rand()-based sampling, which is nondeterministic under retries.
    // Pure map-side; no shuffle at all.
    Q("q_sample_split",
      s"""SELECT doc_id, $SplitCaseSql AS split
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.load(s, d, "documents")
        .select(col("doc_id"), splitCol.as("split"))
        .orderBy("doc_id")
    },

    // Overlapping character chunks: starts = 0, stride, 2·stride … < n_chars
    // generated IN-ROW (sequence + explode — a codegen'd Generator, no
    // join, no shuffle). Chunk count per doc is ⌈n_chars/stride⌉, so
    // output size is a fixed ~size/stride multiple of the corpus:
    // linear at 100 TB. substring is 1-indexed in both engines.
    Q("q_doc_chunk",
      s"""SELECT doc_id,
         |       CAST(s // $ChunkStride AS INT) AS chunk_id,
         |       substring(text, CAST(s + 1 AS INT), $ChunkSize) AS chunk,
         |       length(substring(text, CAST(s + 1 AS INT), $ChunkSize)) AS n_chunk_chars
         |FROM (SELECT doc_id, text,
         |             unnest(range(0, greatest(n_chars, 1), $ChunkStride)) AS s
         |      FROM documents)
         |ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
      Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0L), greatest(col("n_chars") - 1, lit(0L)), lit(ChunkStride.toLong)))
            .as("s"))
        .select(
          col("doc_id"),
          expr(s"CAST(s div $ChunkStride AS INT)").as("chunk_id"),
          substring(col("text"), lit(1) + col("s").cast("int"), lit(ChunkSize)).as("chunk"))
        .withColumn("n_chunk_chars", length(col("chunk")).cast("long"))
        .orderBy("doc_id", "chunk_id")
    },

    // PII scrubbing: regex redaction of emails and phone numbers. The
    // test corpus carries no PII, so a deterministic contact line is
    // synthesized per doc (same expression both engines) and then
    // scrubbed. Patterns stay in the Java∩RE2 common subset (character
    // classes + bounded repeats, no lookaround); DuckDB needs the 'g'
    // flag to match Spark's replace-all. Pure map-side pass.
    Q("q_text_pii",
      """SELECT doc_id,
        |       regexp_replace(
        |         regexp_replace(
        |           'u' || CAST(doc_id AS VARCHAR) || '@example.com +1-555-' ||
        |             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' || substring(text, 1, 40),
        |           '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
        |         '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS clean
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val raw = concat(
        lit("u"), col("doc_id").cast("string"), lit("@example.com +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" "),
        substring(col("text"), 1, 40))
      Tables.load(s, d, "documents")
        .select(col("doc_id"),
          regexp_replace(
            regexp_replace(raw, lit("[a-z0-9._]+@[a-z0-9.]+"), lit("<EMAIL>")),
            lit("\\+1-555-[0-9]{4}"), lit("<PHONE>")).as("clean"))
        .orderBy("doc_id")
    },

    // Per-language bigram frequency table, top 10 per lang — the n-gram
    // LM / contamination-check building block. Bigrams are generated
    // in-row (transform over an index sequence), so the only wide shape
    // is the (lang, bigram) count aggregation. The per-lang top-10 is
    // the bounded-buffer TopKStrAgg Aggregator, NOT a row_number
    // window: lang has ~5 values, so a window would sort each
    // language's ENTIRE distinct-bigram count set inside 5 reducers — a
    // bounded-parallelism sort growing with content diversity. The
    // Aggregator partial-aggregates, so the lang shuffle carries ≤
    // 10·langs·partitions rows at any corpus size (ordering contract
    // n DESC, bigram ASC matches the oracle's window exactly). Spark
    // arrays are 0-indexed, DuckDB lists 1-indexed; both sides emit
    // exactly size(words)-1 bigrams.
    Q("q_ngram_freq",
      """WITH w AS (SELECT lang, string_split(text, ' ') AS ws FROM documents
        |           WHERE len(string_split(text, ' ')) >= 2),
        |b AS (SELECT lang,
        |             unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bigram
        |      FROM w),
        |c AS (SELECT lang, bigram, count(*) AS n FROM b GROUP BY 1, 2),
        |r AS (SELECT lang, bigram, n,
        |             row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rk
        |      FROM c)
        |SELECT lang, bigram, CAST(n AS BIGINT) AS n, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 10
        |ORDER BY lang, rk""".stripMargin) { (s, d) =>
      val top10 = udaf(new graft.functions.TopKStrAgg(10),
        org.apache.spark.sql.Encoders.product[graft.functions.ScoredStr])
      val words = split(col("text"), " ")
      val bigrams = Tables.load(s, d, "documents")
        .select(col("lang"), words.as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("lang"),
          explode(expr("transform(sequence(0, size(ws) - 2), i -> concat_ws(' ', ws[i], ws[i+1]))"))
            .as("bigram"))
      bigrams.groupBy("lang", "bigram").agg(count(lit(1)).as("n"))
        // counts are exact in the Aggregator's double score until 2^53
        .groupBy("lang").agg(top10(col("n").cast("double"), col("bigram")).as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("lang"), col("col.id").as("bigram"),
          col("col.score").cast("long").as("n"),
          (col("pos") + 1).cast("long").as("rk"))
        .orderBy("lang", "rk")
    },

    // Benchmark decontamination: flag training docs that share ≥1
    // 3-word shingle with the held-out (test-split) set — the standard
    // pre-training hygiene pass that removes eval-set leakage. The
    // holdout membership rule is the same join-free md5 bucket as
    // q_sample_split, so both sides derive it in-row. The holdout
    // shingle set is broadcast: at production scale benchmark suites
    // are tiny relative to the corpus (millions of n-grams vs
    // trillions), so contamination checking is a broadcast semi-join —
    // one narrow pass over the training shingles, NO shuffle of the
    // corpus. n_hits counts distinct leaked shingles per doc (shingles
    // are already distinct per doc, so a plain count suffices).
    Q("q_decontam",
      """WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
        |sh AS (SELECT DISTINCT doc_id, lang,
        |              unnest(list_transform(range(1, len(words) - 1),
        |                     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingle
        |       FROM w WHERE len(words) >= 3),
        |lbl AS (SELECT doc_id, substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= 'e6' AS holdout
        |        FROM documents),
        |tr AS (SELECT sh.* FROM sh JOIN lbl USING (doc_id) WHERE NOT holdout),
        |ho AS (SELECT DISTINCT lang, shingle FROM sh JOIN lbl USING (doc_id) WHERE holdout)
        |SELECT tr.doc_id, count(*) AS n_hits
        |FROM tr JOIN ho ON tr.lang = ho.lang AND tr.shingle = ho.shingle
        |GROUP BY 1
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val isHoldout = substring(md5(col("doc_id").cast("string")), 1, 2) >= "e6"
      val sh = TextPipeline.shingles(s, d).withColumn("holdout", isHoldout)
      val ho = sh.filter(col("holdout")).select("lang", "shingle").distinct()
      sh.filter(!col("holdout"))
        .join(broadcast(ho), Seq("lang", "shingle"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
        .orderBy("doc_id")
    },

    // Bloom-filter decontamination — the 100 TB evolution of q_decontam:
    // instead of broadcasting the holdout shingle STRINGS (which grows
    // with the benchmark suite), pack them into a fixed-size Bloom
    // bitmap (2^18 bits = 32 KiB as 8192 int words) and probe each
    // training shingle map-side with two O(1) word lookups. The filter
    // build aggregates bit-OR partials per word index (shuffle volume ≤
    // 8192 rows regardless of holdout size); the probe side is a
    // crossJoin against the broadcast single-row bitmap — the corpus is
    // never shuffled. False positives exist BY DESIGN (rate (1−e^(−2n/M))²,
    // ~3% here) but are deterministic: the oracle builds the identical
    // bitmap from the identical md5 slices, so both engines flag the
    // same candidate set (n_candidates ≥ q_decontam's exact per-lang
    // n_hits — asserted in TwinAndPropertySpec). A production pass would
    // re-verify candidates exactly; candidates-per-doc is what this op
    // reports.
    Q("q_bloom_decontam",
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |              unnest(list_transform(range(1, len(words) - 1),
         |                     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingle
         |       FROM w WHERE len(words) >= 3),
         |hx AS (SELECT doc_id, ${sqlHex10("md5(shingle)")} AS v FROM sh),
         |p AS (SELECT doc_id,
         |             substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= 'e6' AS holdout,
         |             (v // 1048576) % $BloomBits AS p1,
         |             v % $BloomBits AS p2
         |      FROM hx),
         |hp AS (SELECT unnest([p1, p2]) AS p FROM p WHERE holdout),
         |wd AS (SELECT p // $BloomWordBits AS w,
         |              bit_or(CAST(1 AS BIGINT) << CAST(p % $BloomWordBits AS INT)) AS word
         |       FROM hp GROUP BY 1),
         |dense AS (SELECT r.w, coalesce(wd.word, 0) AS word
         |          FROM (SELECT unnest(range(0, $BloomWords)) AS w) r
         |          LEFT JOIN wd USING (w)),
         |bm AS (SELECT list(word ORDER BY w) AS bm FROM dense)
         |SELECT doc_id, count(*) AS n_candidates
         |FROM p, bm
         |WHERE NOT holdout
         |  AND ((bm[CAST(p1 // $BloomWordBits AS INT) + 1] >> CAST(p1 % $BloomWordBits AS INT)) & 1) = 1
         |  AND ((bm[CAST(p2 // $BloomWordBits AS INT) + 1] >> CAST(p2 % $BloomWordBits AS INT)) & 1) = 1
         |GROUP BY 1
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val isHoldout = substring(md5(col("doc_id").cast("string")), 1, 2) >= "e6"
      val probed = TextPipeline.shingles(s, d)
        .withColumn("v", expr("CAST(conv(substring(md5(shingle), 1, 10), 16, 10) AS BIGINT)"))
        .withColumn("p1", expr(s"(v div 1048576) % $BloomBits"))
        .withColumn("p2", expr(s"v % $BloomBits"))
        .withColumn("holdout", isHoldout)
      // ONE narrow agg pass builds the dense bitmap: BloomAgg ORs
      // positions into a fixed 8192-word array with map-side partials
      // (shuffle = #partitions × 32 KiB, independent of holdout size)
      val bloomAgg = udaf(new graft.functions.BloomAgg(BloomWords, BloomWordBits))
      val bitmap = probed.filter(col("holdout"))
        .select(explode(array(col("p1"), col("p2"))).as("p"))
        .agg(bloomAgg(col("p")).as("bm"))
      probed.filter(!col("holdout"))
        .crossJoin(broadcast(bitmap))
        .filter(expr(s"""(shiftright(element_at(bm, CAST(p1 div $BloomWordBits AS INT) + 1),
                        |            CAST(p1 % $BloomWordBits AS INT)) & 1) = 1
                        |AND (shiftright(element_at(bm, CAST(p2 div $BloomWordBits AS INT) + 1),
                        |            CAST(p2 % $BloomWordBits AS INT)) & 1) = 1""".stripMargin))
        .groupBy("doc_id").agg(count(lit(1)).as("n_candidates"))
        .orderBy("doc_id")
    },

    // Corpus-yield report: the attrition funnel every pretraining run
    // documents — how many docs survive each successive filter (lang
    // allowlist → length band → exact-dedup keeper). Stage predicates
    // are evaluated IN-ROW as nested conjunctions over one scan; the
    // only shuffle is the md5 keeper resolution (the q_dedup_exact
    // shape) joined back on the hash key, then a 4-row global rollup.
    // Counts are cumulative (each stage applies on top of the prior),
    // so the report reads as a funnel, matching how filter pipelines
    // are tuned in practice.
    Q("q_corpus_yield",
      """WITH k AS (SELECT md5(text) AS h, min(doc_id) AS keeper
        |           FROM documents GROUP BY 1),
        |f AS (SELECT d.doc_id,
        |             d.lang IN ('en', 'de', 'fr') AS ok_lang,
        |             d.n_chars BETWEEN 50 AND 400 AS ok_len,
        |             d.doc_id = k.keeper AS ok_dedup
        |      FROM documents d JOIN k ON md5(d.text) = k.h),
        |c AS (SELECT count(*) AS n0,
        |             count(*) FILTER (WHERE ok_lang) AS n1,
        |             count(*) FILTER (WHERE ok_lang AND ok_len) AS n2,
        |             count(*) FILTER (WHERE ok_lang AND ok_len AND ok_dedup) AS n3
        |      FROM f)
        |SELECT '0_total' AS stage, n0 AS n_docs FROM c
        |UNION ALL SELECT '1_lang', n1 FROM c
        |UNION ALL SELECT '2_len', n2 FROM c
        |UNION ALL SELECT '3_dedup', n3 FROM c
        |ORDER BY stage""".stripMargin) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      val keepers = docs.groupBy(md5(col("text")).as("h"))
        .agg(min("doc_id").as("keeper"))
      docs.select(col("doc_id"), col("lang"), col("n_chars"), md5(col("text")).as("h"))
        .join(keepers, "h")
        .select(
          col("lang").isin("en", "de", "fr").as("ok_lang"),
          col("n_chars").between(50, 400).as("ok_len"),
          (col("doc_id") === col("keeper")).as("ok_dedup"))
        .agg(
          count(lit(1)).as("n0"),
          count(when(col("ok_lang"), 1)).as("n1"),
          count(when(col("ok_lang") && col("ok_len"), 1)).as("n2"),
          count(when(col("ok_lang") && col("ok_len") && col("ok_dedup"), 1)).as("n3"))
        .selectExpr("stack(4, '0_total', n0, '1_lang', n1, '2_len', n2, '3_dedup', n3) AS (stage, n_docs)")
        .orderBy("stage")
    },

    // Stratified rebalancing sample: downsample every language to
    // (approximately) the rarest language's doc count — the standard
    // language-mix rebalance before pretraining. Two passes: a per-lang
    // count agg (5 rows, broadcast back), then a map-side filter
    // keeping docs whose 16-bit md5 bucket falls under the per-lang
    // acceptance fraction. NO per-group window/sort — a rank-based cap
    // would sort within bounded-cardinality lang partitions, which is
    // exactly the quadratic-at-scale shape this engine avoids; the
    // hash-threshold sampler is one narrow pass at any corpus size and
    // reshuffle-proof (same doc kept on any cluster layout). The 16-bit
    // bucket is parsed nibble-by-nibble with instr arithmetic — the
    // same integer construction on both engines (no hex-cast builtin
    // needed), uniform because md5 is.
    Q("q_sample_stratified",
      """WITH u AS (SELECT doc_id, lang,
        |                  ((instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |                 + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |                 + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |                 + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) AS u16
        |           FROM documents),
        |n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |f AS (SELECT lang, CAST((SELECT min(n) FROM n) AS DOUBLE) / n AS frac FROM n)
        |SELECT u.doc_id, u.lang
        |FROM u JOIN f ON u.lang = f.lang
        |WHERE u.u16 < f.frac * 65536
        |ORDER BY u.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      // Spark parses the 4 hex chars with conv(); the oracle's instr
      // arithmetic computes the identical uint16 (same trick as
      // q_dedup_simhash, where the pairing is already proven)
      val u16 = expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT)")
      val n = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      val frac = n.crossJoin(broadcast(n.agg(min("n").as("mn"))))
        .select(col("lang"), (col("mn").cast("double") / col("n")).as("frac"))
      docs.select(col("doc_id"), col("lang"), u16.as("u16"))
        .join(broadcast(frac), "lang")
        .filter(col("u16") < col("frac") * 65536)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // Train→eval split leakage (round 14) — the generalization-validity
    // check that runs the moment q_sample_split assigns splits: for
    // each held-out split (val, test), what share of its documents'
    // distinct shingles ALREADY APPEARS in train, and how many docs are
    // outright leaky (≥50% of their shingles in train)? High leakage
    // means eval scores measure memorization of near-duplicated
    // content, not generalization — the within-corpus complement of
    // q_decontam's external-benchmark check. Split assignment is the
    // exact q_sample_split md5 rule computed IN-ROW on the shingle
    // frame (no doc join); the one content-keyed shuffle is the
    // (lang, shingle) train-probe join — same-lang scoping as the
    // dedup family. Rollups land on 2 rows.
    Q("q_split_leakage",
      s"""WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
        |sh AS (SELECT DISTINCT doc_id, lang,
        |              $SplitCaseSql AS split,
        |              unnest(list_transform(range(1, len(words) - 1),
        |                     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingle
        |       FROM w WHERE len(words) >= 3),
        |tr AS (SELECT DISTINCT lang, shingle FROM sh WHERE split = 'train'),
        |ev AS (SELECT s.split, s.doc_id, count(*) AS n_sh,
        |              sum(CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
        |       FROM sh s LEFT JOIN tr t ON s.lang = t.lang AND s.shingle = t.shingle
        |       WHERE s.split <> 'train'
        |       GROUP BY 1, 2)
        |SELECT split,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_sh) AS BIGINT) AS n_shingles,
        |       CAST(sum(n_hit) AS BIGINT) AS in_train,
        |       floor((CAST(sum(n_hit) AS DOUBLE) / sum(n_sh))*1000000+0.5)/1000000 AS shingle_leak_share,
        |       CAST(sum(CASE WHEN 2 * n_hit >= n_sh THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky_docs,
        |       floor((CAST(sum(CASE WHEN 2 * n_hit >= n_sh THEN 1 ELSE 0 END) AS DOUBLE) / count(*))*1000000+0.5)/1000000 AS leaky_doc_share
        |FROM ev
        |GROUP BY 1
        |ORDER BY 1""".stripMargin) { (s, d) =>
      // the exact q_sample_split hash rule (shared splitCol — one
      // home), applied in-row on the shingle frame's doc_id
      val sh = TextPipeline.shingles(s, d).withColumn("split", splitCol)
      val tr = sh.filter(col("split") === "train")
        .select("lang", "shingle").distinct()
        .withColumn("hit", lit(1L))
      val ev = sh.filter(col("split") =!= "train")
        .join(tr, Seq("lang", "shingle"), "left")
        .groupBy("split", "doc_id")
        .agg(count(lit(1)).as("n_sh"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      ev.groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("n_sh").as("n_shingles"),
          sum("n_hit").as("in_train"),
          Q.r6(sum("n_hit").cast("double") / sum("n_sh")).as("shingle_leak_share"),
          sum(when(lit(2) * col("n_hit") >= col("n_sh"), 1L).otherwise(0L))
            .as("n_leaky_docs"),
          Q.r6(sum(when(lit(2) * col("n_hit") >= col("n_sh"), 1L).otherwise(0L))
            .cast("double") / count(lit(1))).as("leaky_doc_share"))
        .orderBy("split")
    },

    // Output-shard skew audit (round 14) — before a 100 TB job writes,
    // the question is whether its hash layout balances: assign every
    // doc its content-hash shard (md5(doc_id) mod 64 — the same
    // reshuffle-proof bucketing q_sample_split keys on) and read out
    // per-shard docs, bytes, byte share, and skew = bytes/mean. A
    // shard at skew 2 means one writer task runs 2× the others — the
    // straggler the layout planner fixes BEFORE the write, not after.
    // Shape: one map-side-partial agg onto the fixed 64-key grid; the
    // total rides a broadcast single-row join; 64-row output at any
    // corpus size. Hash arithmetic is the proven conv()/instr pairing,
    // exact in both engines.
    Q("q_shard_skew",
      """WITH s AS (SELECT ((instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |                 + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |                 + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |                 + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 64 AS shard,
        |                 n_chars
        |          FROM documents),
        |g AS (SELECT CAST(shard AS BIGINT) AS shard, CAST(count(*) AS BIGINT) AS n_docs,
        |             CAST(sum(n_chars) AS BIGINT) AS bytes
        |      FROM s GROUP BY 1),
        |t AS (SELECT CAST(sum(bytes) AS BIGINT) AS total FROM g)
        |SELECT g.shard, g.n_docs, g.bytes,
        |       floor((CAST(g.bytes AS DOUBLE) / t.total)*1000000+0.5)/1000000 AS share,
        |       floor((CAST(g.bytes AS DOUBLE) * 64 / t.total)*1000000+0.5)/1000000 AS skew
        |FROM g CROSS JOIN t
        |ORDER BY shard""".stripMargin) { (s, d) =>
      // single scan: the total is a window aggregate over the 64-row
      // grid (the q_benford move), not a second corpus pass
      Tables.load(s, d, "documents")
        .select(shardCol.as("shard"), col("n_chars"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("bytes"))
        .withColumn("total",
          sum("bytes").over(org.apache.spark.sql.expressions.Window.partitionBy()))
        .select(col("shard"), col("n_docs"), col("bytes"),
          Q.r6(col("bytes").cast("double") / col("total")).as("share"),
          Q.r6(col("bytes").cast("double") * 64 / col("total")).as("skew"))
        .orderBy("shard")
    },

    // Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    // per language, the 5 docs with the largest ln(u)/w key, u a
    // deterministic md5-derived uniform and w = n_chars — longer docs
    // proportionally likelier, the length-weighted pick a token-budget
    // mixture planner makes. ln(u)/w orders identically to the
    // textbook u^(1/w) (ln is monotone; w > 0) with one libm call and
    // better r6 spread near the top. Content-hash u makes the sample
    // reshuffle/retry-proof like q_sample_split (rand() is neither);
    // r6-rounding the key BEFORE selection plus the doc_id tie-break
    // keeps the top-k boundary identical across engines. Plan shape =
    // q_group_sample's: a bounded-buffer TopKAgg partial-aggregates,
    // so each map partition ships ≤ 5·|langs| rows — the row_number()
    // window would shuffle-sort the whole corpus into |langs| reducers.
    Q("q_sample_weighted",
      s"""WITH r AS (
         |  SELECT lang, doc_id,
         |         ${Q.sqlR6(s"ln((${sqlHex10("md5(CAST(doc_id AS VARCHAR))")} + 0.5) / 1099511627776.0) / greatest(n_chars, 1)")} AS wkey
         |  FROM documents),
         |k AS (SELECT lang, doc_id, wkey,
         |             row_number() OVER (PARTITION BY lang
         |                                ORDER BY wkey DESC, doc_id) AS rk
         |      FROM r)
         |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, wkey
         |FROM k WHERE rk <= 5
         |ORDER BY lang, rk""".stripMargin) { (s, d) =>
      val topk = udaf(new graft.functions.TopKAgg(5),
        org.apache.spark.sql.Encoders.product[graft.functions.Scored])
      // 10-nibble md5 parse = uniform u40 in [0, 2^40); +0.5 keeps u
      // strictly positive so ln() is finite (same parse as the bloom
      // probes / stratified sampler — conv() here, instr() in the twin)
      val u40 = expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 10), 16, 10) AS BIGINT)")
      Tables.load(s, d, "documents")
        .select(col("lang"), col("doc_id"),
          Q.r6(log((u40 + 0.5) / lit(1099511627776.0)) /
            greatest(col("n_chars"), lit(1L))).as("wkey"))
        .groupBy("lang")
        .agg(topk(col("wkey"), col("doc_id")).as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("lang"), (col("pos") + 1).cast("long").as("rk"),
          col("col.id").as("doc_id"), col("col.score").as("wkey"))
        .orderBy("lang", "rk")
    },

    // Pairwise source-overlap matrix: distinct shared 3-word shingles
    // and shingle-set jaccard per source pair — the "which feeds are
    // re-crawls of each other" diagnostic that decides dedup order and
    // mixing weights. The corpus-side shape is ALL codegen'd long
    // arithmetic: each source gets one bit of a SHARDED membership mask
    // (an array of 64-bit words — word idx/64, bit idx%64 — so the
    // catalog width is unbounded; see [[sourceOverlap]]), a per-shingle
    // `bit_or` per word folds source membership into a few longs (no
    // object collect_set, duplicates idempotent so no distinct pass),
    // and identical masks collapse via a count BEFORE the pair
    // explosion, so unary/pair emission runs over |distinct masks|
    // rows, not |shingles|. The corpus text is scanned ONCE; the
    // catalog derivation reads only the column-pruned `source` column —
    // in production the feed catalog is a static dim and that pass
    // disappears entirely. Output ≤ C(|sources|, 2) rows at any corpus
    // size. The oracle is the naive distinct-shingle self-join — an
    // independent formulation with no shift arithmetic at all, so the
    // parity check exercises the mask path against first principles.
    Q("q_source_overlap",
      """WITH w AS (SELECT source, string_split(text, ' ') AS words FROM documents),
        |sh0 AS (SELECT source,
        |               unnest(list_transform(range(1, len(words) - 1),
        |                      i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingle
        |        FROM w WHERE len(words) >= 3),
        |sh AS (SELECT DISTINCT source, shingle FROM sh0),
        |n AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.source AS s1, b.source AS s2, count(*) AS shared
        |      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT p.s1, p.s2, CAST(p.shared AS BIGINT) AS shared,
        |       floor((CAST(p.shared AS DOUBLE) / (n1.n + n2.n - p.shared))*10000+0.5)/10000 AS jaccard
        |FROM p JOIN n n1 ON p.s1 = n1.source
        |       JOIN n n2 ON p.s2 = n2.source
        |ORDER BY s1, s2""".stripMargin) { (s, d) =>
      sourceOverlap(Tables.load(s, d, "documents"))
    },

    // Content-defined chunking — the dedup-friendly alternative to
    // q_doc_chunk's fixed windows: a chunk boundary falls after every
    // word whose md5 starts with hex '0' (p = 1/16 → mean chunk ≈ 16
    // words), so an insertion early in a document shifts only the ONE
    // chunk it lands in, not every window after it — identical content
    // re-chunks identically anywhere it appears, which is what makes
    // chunk-level dedup work. Plan shape: words posexplode in-row, the
    // running boundary count is a window partitioned by doc_id — the
    // partition is ONE DOCUMENT (bounded by doc length, not corpus
    // size), the legitimate window shape — and chunks reassemble via a
    // sorted in-row collect per (doc, chunk).
    Q("q_chunk_cdc",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |x AS (SELECT doc_id,
        |             unnest(list_transform(range(1, len(words) + 1),
        |                    i -> {'pos': i, 'w': words[i]})) AS s
        |      FROM t),
        |f AS (SELECT doc_id, s.pos AS pos, s.w AS w,
        |             CASE WHEN substring(md5(s.w), 1, 1) = '0' THEN 1 ELSE 0 END AS b
        |      FROM x),
        |c AS (SELECT doc_id, pos, w,
        |             coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
        |                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
        |      FROM f)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |       string_agg(w, ' ' ORDER BY pos) AS chunk,
        |       count(*) AS n_words
        |FROM c GROUP BY doc_id, chunk_id
        |ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val byDoc = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
      val boundary = when(substring(md5(col("w").cast("binary")), 1, 1) === "0", 1L).otherwise(0L)
      Tables.load(s, d, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        .withColumn("chunk_id", coalesce(sum(boundary).over(byDoc), lit(0L)))
        .groupBy("doc_id", "chunk_id")
        .agg(
          // array_sort on struct(pos, w) orders by pos — a deterministic
          // in-row reassembly (collect_list order is NOT guaranteed)
          expr("array_join(transform(array_sort(collect_list(struct(pos, w))), x -> x.w), ' ')")
            .as("chunk"),
          count(lit(1)).as("n_words"))
        .orderBy("doc_id", "chunk_id")
    },

    // Language-mixture planning: given target mixture shares, compute
    // the largest total token budget T* the corpus can serve WITHOUT
    // upsampling (T* = min over langs of tokens/share — the binding
    // language caps the mix), then each language's sampling fraction
    // and sampled token count. The report every pretraining data-mix
    // negotiation starts from. One 5-row token agg + a broadcast scalar
    // min — nothing scales with the corpus but the token-count scan.
    Q("q_mix_weights",
      """WITH tok AS (SELECT lang, sum(len(string_split(text, ' '))) AS tokens
        |             FROM documents GROUP BY 1),
        |w AS (SELECT lang, tokens,
        |             CASE lang WHEN 'en' THEN 0.4 WHEN 'de' THEN 0.2 WHEN 'fr' THEN 0.2
        |                       WHEN 'es' THEN 0.1 ELSE 0.1 END AS share
        |      FROM tok),
        |m AS (SELECT min(tokens / share) AS tstar FROM w)
        |SELECT lang, CAST(tokens AS BIGINT) AS tokens, share,
        |       floor((m.tstar * share / tokens)*1000000+0.5)/1000000 AS fraction,
        |       CAST(floor(m.tstar * share + 0.5) AS BIGINT) AS sampled_tokens
        |FROM w, m
        |ORDER BY lang""".stripMargin) { (s, d) =>
      val share =
        when(col("lang") === "en", 0.4).when(col("lang") === "de", 0.2)
          .when(col("lang") === "fr", 0.2).when(col("lang") === "es", 0.1)
          .otherwise(0.1)
      val tok = Tables.load(s, d, "documents")
        .groupBy("lang").agg(sum(size(split(col("text"), " "))).as("tokens"))
        .withColumn("share", share)
      val tstar = tok.agg(min(col("tokens") / col("share")).as("tstar"))
      tok.crossJoin(broadcast(tstar))
        .select(col("lang"), col("tokens"), col("share"),
          Q.r6(col("tstar") * col("share") / col("tokens")).as("fraction"),
          floor(col("tstar") * col("share") + 0.5).cast("long").as("sampled_tokens"))
        .orderBy("lang")
    },

    // Token-budget quality trim per language: fill HALF of each
    // language's token mass with its highest-quality documents and
    // report where the budget binds — the planning readout behind "we
    // can only afford X tokens of this source; what quality bar does
    // that buy". The 100 TB shape is the point: ranking every document
    // through a per-lang sort would put a corpus-sized frame through
    // one reducer per language, so the quality score (the exact
    // q_quality_score heuristic, one home: TextPipeline.qualityOnWords)
    // is floored onto its ×10⁴ lattice and the corpus collapses to a
    // ≤|langs|×10⁴-cell (lang, q4) grid by ONE map-side-partial agg;
    // the cumulative walk, the binding bucket q*, and the kept/partial
    // masses all run over that bounded grid. Per-doc admission inside
    // the q* bucket is a write-time concern (doc_id order); the
    // planning summary deliberately never materializes it.
    Q("q_token_budget_trim",
      s"""WITH w AS (SELECT lang, string_split(text, ' ') AS words FROM documents),
         |q AS (SELECT lang,
         |             CAST(floor(${TextPipeline.qualityOnWordsSql} * 10000 + 0.5)
         |               AS BIGINT) AS q4,
         |             CAST(len(words) AS BIGINT) AS tok
         |      FROM w WHERE len(words) > 0),
         |g AS (SELECT lang, q4, CAST(count(*) AS BIGINT) AS docs,
         |             CAST(sum(tok) AS BIGINT) AS toks
         |      FROM q GROUP BY 1, 2),
         |t AS (SELECT lang, CAST(sum(toks) AS BIGINT) AS total,
         |             CAST(floor(sum(toks) / 2) AS BIGINT) AS budget
         |      FROM g GROUP BY 1),
         |c AS (SELECT g.lang, g.q4, g.docs, g.toks, t.total, t.budget,
         |             CAST(sum(g.toks) OVER (PARTITION BY g.lang ORDER BY g.q4 DESC
         |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |                  AS BIGINT) AS cu
         |      FROM g JOIN t ON g.lang = t.lang),
         |f AS (SELECT lang, total, budget,
         |             CAST(sum(CASE WHEN cu <= budget THEN docs ELSE 0 END) AS BIGINT) AS docs_full,
         |             CAST(sum(CASE WHEN cu <= budget THEN toks ELSE 0 END) AS BIGINT) AS tokens_full,
         |             max(CASE WHEN cu - toks < budget AND cu > budget THEN q4 END) AS qstar4,
         |             max(CASE WHEN cu - toks < budget AND cu > budget
         |                      THEN budget - (cu - toks) END) AS partial_left
         |      FROM c GROUP BY 1, 2, 3)
         |SELECT lang, total AS total_tokens, budget, docs_full, tokens_full,
         |       qstar4 / 10000.0 AS q_star, partial_left
         |FROM f
         |ORDER BY lang""".stripMargin) { (s, d) =>
      trimOf(Tables.load(s, d, "documents")
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) > 0)
        .select(col("lang"),
          floor(TextPipeline.qualityOnWordsCol * 10000 + 0.5).cast("long").as("q4"),
          size(col("words")).cast("long").as("tok"))
        .groupBy("lang", "q4")
        .agg(count(lit(1)).as("docs"), sum("tok").as("toks")))
    },

    // BM25 retrieval scoring (k1=1.2, b=0.75) of every document against
    // a fixed query term set, idf scoped per language — the ranking
    // primitive for retrieval-based data curation (e.g. pulling docs
    // relevant to a benchmark topic). The 100 TB shape: term frequencies
    // are computed IN-ROW (array filter over the fixed query terms — no
    // (doc, term) explode, no shuffle), the per-lang stats (N, Σdl, df
    // per term) are ONE tiny agg broadcast back, and the per-lang top-10
    // rides the bounded-buffer TopKAgg (map-side partials) — so the only
    // wide ops are a ~5-row broadcast and a ≤ k·langs·partitions
    // shuffle; the corpus itself is scanned once and never shuffled.
    // avgdl is computed as CAST(Σdl AS DOUBLE)/N (exact integer sum, one
    // division) rather than avg() so both engines divide identical
    // values; ranking uses the r4-ROUNDED score with doc_id as a total
    // tie-break, the q_tfidf determinism recipe.
    Q("q_bm25",
      """WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
        |f AS (SELECT doc_id, lang, len(words) AS dl,
        |             CAST(len(list_filter(words, x -> x = 'data')) AS DOUBLE) AS tf1,
        |             CAST(len(list_filter(words, x -> x = 'query')) AS DOUBLE) AS tf2,
        |             CAST(len(list_filter(words, x -> x = 'scan')) AS DOUBLE) AS tf3
        |      FROM w),
        |st AS (SELECT lang, count(*) AS nd, sum(dl) AS sdl,
        |              count(*) FILTER (WHERE tf1 > 0) AS df1,
        |              count(*) FILTER (WHERE tf2 > 0) AS df2,
        |              count(*) FILTER (WHERE tf3 > 0) AS df3
        |       FROM f GROUP BY 1),
        |sc AS (SELECT f.doc_id, f.lang,
        |              floor((
        |                ln((st.nd - st.df1 + 0.5) / (st.df1 + 0.5) + 1) * (f.tf1 * 2.2) / (f.tf1 + 1.2 * (0.25 + 0.75 * f.dl / (CAST(st.sdl AS DOUBLE) / st.nd)))
        |              + ln((st.nd - st.df2 + 0.5) / (st.df2 + 0.5) + 1) * (f.tf2 * 2.2) / (f.tf2 + 1.2 * (0.25 + 0.75 * f.dl / (CAST(st.sdl AS DOUBLE) / st.nd)))
        |              + ln((st.nd - st.df3 + 0.5) / (st.df3 + 0.5) + 1) * (f.tf3 * 2.2) / (f.tf3 + 1.2 * (0.25 + 0.75 * f.dl / (CAST(st.sdl AS DOUBLE) / st.nd)))
        |              )*10000+0.5)/10000 AS score
        |       FROM f JOIN st ON f.lang = st.lang),
        |r AS (SELECT lang, doc_id, score,
        |             row_number() OVER (PARTITION BY lang ORDER BY score DESC, doc_id) AS rk
        |      FROM sc WHERE score > 0)
        |SELECT lang, doc_id, score, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 10
        |ORDER BY lang, rk""".stripMargin) { (s, d) =>
      val terms = Seq("data", "query", "scan")
      def tf(t: String) = size(expr(s"filter(words, x -> x = '$t')")).cast("double")
      val base = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("words"))
        .select(col("doc_id"), col("lang"), size(col("words")).as("dl"),
          tf(terms(0)).as("tf1"), tf(terms(1)).as("tf2"), tf(terms(2)).as("tf3"))
      val dfAggs = terms.indices.map(i => count(when(col(s"tf${i + 1}") > 0, 1)).as(s"df${i + 1}"))
      val statAggs = Seq(count(lit(1)).as("nd"), sum("dl").as("sdl")) ++ dfAggs
      val stats = base.groupBy("lang").agg(statAggs.head, statAggs.tail: _*)
      val avgdl = col("sdl").cast("double") / col("nd")
      def part(i: Int) = {
        val dfc = col(s"df$i"); val tfc = col(s"tf$i")
        val idf = log((col("nd") - dfc + 0.5) / (dfc + 0.5) + 1)
        idf * (tfc * 2.2) / (tfc + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
      }
      val top10 = udaf(new graft.functions.TopKAgg(10),
        org.apache.spark.sql.Encoders.product[graft.functions.Scored])
      base.join(broadcast(stats), "lang")
        .select(col("lang"), col("doc_id"), Q.r4(part(1) + part(2) + part(3)).as("score"))
        .filter(col("score") > 0)
        .groupBy("lang").agg(top10(col("score"), col("doc_id")).as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("lang"), col("col.id").as("doc_id"), col("col.score").as("score"),
          (col("pos") + 1).cast("long").as("rk"))
        .orderBy("lang", "rk")
    },

    // Dirichlet-smoothed query-likelihood retrieval (round 15, μ=2000)
    // — the language-modeling ranker beside q_bm25's probabilistic
    // one: score(d) = Σ_q ln((tf + μ·cf_q/|C|)/(dl + μ)) with the
    // collection model scoped per language, out-of-collection query
    // terms contributing zero (the standard OOV drop, mirrored as
    // CASE). Same 100 TB shape as q_bm25: in-row term frequencies
    // (no (doc, term) explode), ONE tiny per-lang stats agg broadcast
    // back (cf per term + total tokens), per-lang top-10 through the
    // bounded-buffer TopKAgg; the corpus is scanned once and never
    // shuffled. Scores are negative log-likelihoods — ranking is
    // (r4 score DESC, doc_id), the q_tfidf determinism recipe.
    Q("q_lm_dirichlet",
      """WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
        |f AS (SELECT doc_id, lang, len(words) AS dl,
        |             CAST(len(list_filter(words, x -> x = 'data')) AS DOUBLE) AS tf1,
        |             CAST(len(list_filter(words, x -> x = 'query')) AS DOUBLE) AS tf2,
        |             CAST(len(list_filter(words, x -> x = 'scan')) AS DOUBLE) AS tf3
        |      FROM w),
        |st AS (SELECT lang, CAST(sum(dl) AS BIGINT) AS toks,
        |              CAST(sum(tf1) AS BIGINT) AS cf1,
        |              CAST(sum(tf2) AS BIGINT) AS cf2,
        |              CAST(sum(tf3) AS BIGINT) AS cf3
        |       FROM f GROUP BY 1),
        |sc AS (SELECT f.doc_id, f.lang,
        |              floor((
        |                CASE WHEN st.cf1 > 0 THEN ln((f.tf1 + 2000.0 * st.cf1 / st.toks) / (f.dl + 2000.0)) ELSE 0 END
        |              + CASE WHEN st.cf2 > 0 THEN ln((f.tf2 + 2000.0 * st.cf2 / st.toks) / (f.dl + 2000.0)) ELSE 0 END
        |              + CASE WHEN st.cf3 > 0 THEN ln((f.tf3 + 2000.0 * st.cf3 / st.toks) / (f.dl + 2000.0)) ELSE 0 END
        |              )*10000+0.5)/10000 AS score
        |       FROM f JOIN st ON f.lang = st.lang),
        |r AS (SELECT lang, doc_id, score,
        |             row_number() OVER (PARTITION BY lang ORDER BY score DESC, doc_id) AS rk
        |      FROM sc)
        |SELECT lang, doc_id, score, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 10
        |ORDER BY lang, rk""".stripMargin) { (s, d) =>
      val terms = Seq("data", "query", "scan")
      def tf(t: String) = size(expr(s"filter(words, x -> x = '$t')")).cast("double")
      val base = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("words"))
        .select(col("doc_id"), col("lang"), size(col("words")).as("dl"),
          tf(terms(0)).as("tf1"), tf(terms(1)).as("tf2"), tf(terms(2)).as("tf3"))
      val cfAggs = terms.indices.map(i => sum(col(s"tf${i + 1}")).cast("long").as(s"cf${i + 1}"))
      val statAggs = Seq(sum("dl").cast("long").as("toks")) ++ cfAggs
      val stats = base.groupBy("lang").agg(statAggs.head, statAggs.tail: _*)
      def part(i: Int) = {
        val cfc = col(s"cf$i"); val tfc = col(s"tf$i")
        when(cfc > 0,
          log((tfc + lit(2000.0) * cfc / col("toks")) / (col("dl") + lit(2000.0))))
          .otherwise(lit(0))
      }
      val top10 = udaf(new graft.functions.TopKAgg(10),
        org.apache.spark.sql.Encoders.product[graft.functions.Scored])
      base.join(broadcast(stats), "lang")
        .select(col("lang"), col("doc_id"), Q.r4(part(1) + part(2) + part(3)).as("score"))
        .groupBy("lang").agg(top10(col("score"), col("doc_id")).as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("lang"), col("col.id").as("doc_id"), col("col.score").as("score"),
          (col("pos") + 1).cast("long").as("rk"))
        .orderBy("lang", "rk")
    },

    // Sequence packing — GPT-style concatenate-and-cut: documents are
    // laid out end-to-end in a deterministic order and the token stream
    // is cut every SeqBudget tokens, so every training sequence is full
    // (zero padding waste) and docs may straddle cuts. The layout is
    // per SHARD (`shardNibbles` md5 hex chars of doc_id → 16^n shards):
    // shard count is the scale knob — in production one shard ≈ one
    // output file (~10^9 tokens), so you widen the nibble count WITH the
    // corpus and the within-shard running-sum window stays a bounded
    // work unit (the declared query keeps nibbles=1 for oracle
    // stability; [[packDocs]] is the parameterized entry point and
    // TwinAndPropertySpec proves a shard's layout is independent of
    // every other shard at width 2). The within-shard sort is not an
    // accident to optimize away: packing IS the contract that every
    // worker reproduces the same byte layout, and (md5 shard, doc_id)
    // is that total order, reshuffle-proof on any cluster. Output: each
    // doc's token offset interval and the bins it spans.
    Q("q_pack_sequences",
      """WITH t AS (SELECT doc_id,
        |                  substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
        |                  len(string_split(text, ' ')) AS tok
        |           FROM documents),
        |o AS (SELECT doc_id, shard, tok,
        |             coalesce(sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
        |                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
        |      FROM t)
        |SELECT doc_id, shard, CAST(tok AS BIGINT) AS tok,
        |       CAST(start_off AS BIGINT) AS start_off,
        |       CAST(start_off // 256 AS BIGINT) AS first_bin,
        |       CAST((start_off + tok - 1) // 256 AS BIGINT) AS last_bin,
        |       CAST((start_off + tok - 1) // 256 - start_off // 256 + 1 AS BIGINT) AS n_bins
        |FROM o
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      packDocs(Tables.load(s, d, "documents"), shardNibbles = 1)
    },

    // End-to-end corpus-prep funnel — the flagship composition: exact
    // dedup → quality gate → benchmark decontamination, reported as a
    // per-language funnel (docs in, after each stage, kept, tokens
    // kept). Each stage is the ALREADY-ORACLED operator's exact
    // formulation (q_dedup_exact's md5 keeper, q_quality_score's
    // 0.6-threshold score, q_decontam's holdout-shingle hit test), so
    // this query proves the stages COMPOSE — one declarative plan, no
    // materialization between stages. Holdout docs (the q_sample_split
    // 'test' bucket) are excluded up front: they are the benchmark, not
    // training candidates. Plan shape: doc-level stages are one
    // content-keyed window + in-row scoring; the contamination test
    // joins keeper shingles against the BROADCAST distinct holdout
    // shingle set (q_decontam's shape — the corpus is never shuffled
    // for it); the funnel lands on a |langs|-key agg. In production the
    // keeper set would be cached/persisted between stages; at test SFs
    // Spark's 3 scans of the small docs table are cheaper than a cache.
    Q("q_corpus_pipeline",
      """WITH lbl AS (SELECT doc_id,
        |                    substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= 'e6' AS holdout
        |             FROM documents),
        |pop AS (SELECT d.doc_id, d.lang, d.text, d.n_chars
        |        FROM documents d JOIN lbl USING (doc_id) WHERE NOT holdout),
        |k AS (SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |      FROM pop),
        |keep AS (SELECT doc_id, lang, text, n_chars FROM k WHERE rn = 1),
        |q AS (SELECT doc_id,
        |             CASE WHEN len(words) > 0 AND
        |                       0.5 * (CAST(len(list_distinct(words)) AS DOUBLE) / len(words))
        |                     + 0.3 * (1 - CAST(len(list_filter(words, x -> x IN ('the', 'a'))) AS DOUBLE) / len(words))
        |                     + 0.2 * least(CAST(len(words) AS DOUBLE) / 100, 1.0) >= 0.6
        |                  THEN 1 ELSE 0 END AS q_ok
        |      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM keep)),
        |ksh AS (SELECT DISTINCT doc_id, lang, shingle FROM (
        |          SELECT doc_id, lang,
        |                 unnest(list_transform(range(1, len(words) - 1),
        |                        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingle
        |          FROM (SELECT doc_id, lang, string_split(text, ' ') AS words FROM keep)
        |          WHERE len(words) >= 3)),
        |hsh AS (SELECT DISTINCT lang, shingle FROM (
        |          SELECT d.lang,
        |                 unnest(list_transform(range(1, len(words) - 1),
        |                        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingle
        |          FROM (SELECT d2.lang, string_split(d2.text, ' ') AS words
        |                FROM documents d2 JOIN lbl USING (doc_id) WHERE holdout) d
        |          WHERE len(words) >= 3)),
        |cont AS (SELECT DISTINCT ksh.doc_id FROM ksh JOIN hsh USING (lang, shingle)),
        |f AS (SELECT keep.lang, keep.n_chars, q.q_ok,
        |             CASE WHEN cont.doc_id IS NOT NULL THEN 1 ELSE 0 END AS bad
        |      FROM keep JOIN q USING (doc_id) LEFT JOIN cont USING (doc_id)),
        |p AS (SELECT lang, count(*) AS n_in FROM pop GROUP BY 1),
        |s AS (SELECT lang, count(*) AS n_dedup,
        |             CAST(sum(q_ok) AS BIGINT) AS n_quality,
        |             CAST(sum(CASE WHEN q_ok = 1 AND bad = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |             CAST(sum(CASE WHEN q_ok = 1 AND bad = 0
        |                           THEN CAST(ceil(CAST(n_chars AS DOUBLE) / 4) AS BIGINT)
        |                           ELSE 0 END) AS BIGINT) AS tokens_kept
        |      FROM f GROUP BY 1)
        |SELECT lang, n_in, n_dedup, n_quality, n_kept, tokens_kept
        |FROM p JOIN s USING (lang)
        |ORDER BY lang""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val isHoldout = substring(md5(col("doc_id").cast("string")), 1, 2) >= "e6"
      val docs = Tables.load(s, d, "documents")
      val pop = docs.filter(!isHoldout).select("doc_id", "lang", "text", "n_chars")
      val keep = pop
        .withColumn("rn", row_number().over(
          Window.partitionBy(md5(col("text").cast("binary"))).orderBy("doc_id")))
        .filter(col("rn") === 1).drop("rn")
      val words = split(col("text"), " ")
      val qok = keep
        .withColumn("words", words)
        .withColumn("q_ok",
          when(size(col("words")) > 0 &&
            lit(0.5) * (size(array_distinct(col("words"))).cast("double") / size(col("words"))) +
            lit(0.3) * (lit(1) - size(expr("filter(words, x -> x IN ('the', 'a'))")).cast("double") / size(col("words"))) +
            lit(0.2) * least(size(col("words")).cast("double") / 100, lit(1.0)) >= 0.6, 1)
            .otherwise(0))
        .select("doc_id", "q_ok")
      def shingleSet(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("words", words)
        .filter(size(col("words")) >= 3)
        .select(col("doc_id"), col("lang"),
          explode(array_distinct(expr(
            """transform(sequence(0, size(words) - 3),
              |          i -> concat_ws(' ', words[i], words[i+1], words[i+2]))""".stripMargin)))
            .as("shingle"))
      val hsh = shingleSet(docs.filter(isHoldout)).select("lang", "shingle").distinct()
      val cont = shingleSet(keep)
        .join(broadcast(hsh), Seq("lang", "shingle"))
        .select("doc_id").distinct()
      val f = keep
        .join(qok, "doc_id")
        .join(cont.withColumn("bad", lit(1)), Seq("doc_id"), "left")
        .withColumn("bad", coalesce(col("bad"), lit(0)))
      val p = pop.groupBy("lang").agg(count(lit(1)).as("n_in"))
      val st = f.groupBy("lang").agg(
        count(lit(1)).as("n_dedup"),
        sum("q_ok").as("n_quality"),
        sum(when(col("q_ok") === 1 && col("bad") === 0, 1).otherwise(0)).as("n_kept"),
        sum(when(col("q_ok") === 1 && col("bad") === 0,
          ceil(col("n_chars").cast("double") / 4).cast("long")).otherwise(0L)).as("tokens_kept"))
      p.join(st, "lang")
        .select("lang", "n_in", "n_dedup", "n_quality", "n_kept", "tokens_kept")
        .orderBy("lang")
    },

    // Context-window fit profile (round 11): for each training context
    // length (128 / 512 / 2048 / 8192 tokens), the share of documents
    // fitting whole and the share of the corpus's token mass a
    // truncate-at-window policy captures — the sizing query behind
    // every "which context length / packing strategy" decision
    // (q_pack_sequences packs; this says what packing at each window
    // COSTS). Token counts use the same BPE-ish regex tokenizer as
    // q_token_count; the 4-window replica expansion is an in-row
    // literal explode over the per-doc count frame (never 4 corpus
    // passes). All sums exact int64, shares single IEEE divisions.
    // Scale: one scan → |docs|-row count frame → 4-key agg.
    Q("q_context_fit",
      """WITH t AS (SELECT CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS tk
        |           FROM documents),
        |x AS (SELECT w.win, t.tk
        |      FROM t, (SELECT unnest(CAST([128, 512, 2048, 8192] AS BIGINT[])) AS win) w)
        |SELECT win, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN tk <= win THEN 1 ELSE 0 END) AS BIGINT) AS docs_fit,
        |       floor((CAST(sum(CASE WHEN tk <= win THEN 1 ELSE 0 END) AS DOUBLE) / count(*))*10000+0.5)/10000 AS fit_pct,
        |       CAST(sum(tk) AS BIGINT) AS tokens_total,
        |       CAST(sum(CASE WHEN tk <= win THEN tk ELSE win END) AS BIGINT) AS tokens_captured,
        |       floor((CAST(sum(CASE WHEN tk <= win THEN tk ELSE win END) AS DOUBLE) / sum(tk))*10000+0.5)/10000 AS capture_pct
        |FROM x
        |GROUP BY win
        |ORDER BY win""".stripMargin) { (s, d) =>
      val t = Tables.load(s, d, "documents")
        .select(size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("long").as("tk"))
      val x = t.select(col("tk"),
        explode(array(lit(128L), lit(512L), lit(2048L), lit(8192L))).as("win"))
      x.groupBy("win")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("tk") <= col("win"), 1).otherwise(0)).cast("long").as("docs_fit"),
          sum(col("tk")).as("tokens_total"),
          sum(when(col("tk") <= col("win"), col("tk")).otherwise(col("win")))
            .as("tokens_captured"))
        .select(col("win"), col("n_docs"), col("docs_fit"),
          Q.r4(col("docs_fit").cast("double") / col("n_docs")).as("fit_pct"),
          col("tokens_total"), col("tokens_captured"),
          Q.r4(col("tokens_captured").cast("double") / col("tokens_total"))
            .as("capture_pct"))
        .select("win", "n_docs", "docs_fit", "fit_pct", "tokens_total",
          "tokens_captured", "capture_pct")
        .orderBy("win")
    },

    // Dedup ROI by source (round 11): per source, how many documents
    // the ≥0.8-Jaccard near-dup pass would drop (keep-smaller-id) and
    // what token mass that saves — the "is dedup worth running on this
    // feed" readout that decides pipeline ordering (dedup-then-quality
    // vs quality-then-dedup). Reuses nearDupPairs' df-capped candidate
    // machinery (ONE shinglePairStats pass); the flagged set joins
    // back to the catalog-thin (doc_id, source, token) frame and the
    // rollup is |sources|-keyed. Counts and token sums exact int64.
    // CAP-INVARIANCE PRECONDITION (same contract as q_dedup_near): the
    // Spark side discovers candidates through the df≤128 capped pass
    // while the oracle enumerates the uncapped shingle self-join —
    // equivalence holds only while max shingle df stays under the cap
    // (14 at sf0.1; asserted against every shipped corpus by
    // SkewSpec "corpus guard: max shingle df stays under the declared
    // 128 cap", so a regenerated corpus trips a spec, not the oracle).
    Q("q_dedup_roi",
      """WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
        |sh AS (SELECT DISTINCT doc_id, lang,
        |              unnest(list_transform(range(1, len(words) - 1),
        |                     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingle
        |       FROM w WHERE len(words) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        |          FROM sh a JOIN sh b ON a.lang = b.lang AND a.shingle = b.shingle
        |                             AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |fl AS (SELECT DISTINCT p.d2 AS doc_id
        |       FROM pairs p
        |       JOIN cnt c1 ON p.d1 = c1.doc_id
        |       JOIN cnt c2 ON p.d2 = c2.doc_id
        |       WHERE CAST(p.inter AS DOUBLE) / (c1.n + c2.n - p.inter) >= 0.8),
        |dt AS (SELECT d.doc_id, d.source,
        |              CAST(len(regexp_extract_all(d.text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS tk,
        |              CASE WHEN fl.doc_id IS NULL THEN 0 ELSE 1 END AS dup
        |       FROM documents d LEFT JOIN fl ON d.doc_id = fl.doc_id)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(dup) AS BIGINT) AS dup_docs,
        |       floor((CAST(sum(dup) AS DOUBLE) / count(*))*10000+0.5)/10000 AS dup_rate,
        |       CAST(sum(tk) AS BIGINT) AS tokens_total,
        |       CAST(sum(dup * tk) AS BIGINT) AS tokens_saved,
        |       floor((CAST(sum(dup * tk) AS DOUBLE) / sum(tk))*10000+0.5)/10000 AS save_pct
        |FROM dt
        |GROUP BY source
        |ORDER BY source""".stripMargin) { (s, d) =>
      val flagged = TextPipeline.nearDupPairs(s, d, dfCap = Some(128L))
        .select(col("d2").as("doc_id")).distinct()
      Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"),
          size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
            .cast("long").as("tk"))
        .join(flagged.withColumn("dup", lit(1)), Seq("doc_id"), "left")
        .withColumn("dup", coalesce(col("dup"), lit(0)))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("dup").cast("long").as("dup_docs"),
          Q.r4(sum("dup").cast("double") / count(lit(1))).as("dup_rate"),
          sum("tk").as("tokens_total"),
          sum(col("dup") * col("tk")).cast("long").as("tokens_saved"),
          Q.r4(sum(col("dup") * col("tk")).cast("double") / sum("tk")).as("save_pct"))
        .select("source", "n_docs", "dup_docs", "dup_rate", "tokens_total",
          "tokens_saved", "save_pct")
        .orderBy("source")
    },

    // Per-source dataset card (round 14) — the one-row-per-source
    // summary a data curator reads before mixing: doc/lang/token
    // volume, mean quality on the shared ×10⁴ lattice
    // (TextPipeline.qualityOnWords — one home with trim/quality), the
    // exact-duplicate share (md5 content hash — a doc counts as dup
    // when its text appears anywhere in the corpus more than once,
    // ACROSS sources, which is what makes the card an overlap readout
    // too), and the EXACT median tokens per doc. The median never
    // sorts documents: docs collapse onto a (source, token-count)
    // grid — token count is a bounded integer domain like cents — and
    // the explicit middle ranks come from cumulative sums over that
    // grid (source-partitioned windows). Shape: ONE corpus scan, one
    // md5-keyed shuffle for the dup counts (the established dedup
    // exchange — bucketed, never one reducer), bounded frames after.
    Q("q_dataset_card",
      s"""WITH w AS (SELECT source, lang, text, md5(text) AS h,
         |                  string_split(text, ' ') AS words FROM documents),
         |b AS (SELECT source, lang, h, CAST(len(words) AS BIGINT) AS tok,
         |             CASE WHEN len(words) > 0 THEN
         |               CAST(floor(${TextPipeline.qualityOnWordsSql} * 10000 + 0.5)
         |                 AS BIGINT) END AS q4
         |      FROM w),
         |dh AS (SELECT h, CAST(count(*) AS BIGINT) AS hc FROM b GROUP BY 1),
         |j AS (SELECT b.source, b.lang, b.tok, b.q4, dh.hc
         |      FROM b JOIN dh ON b.h = dh.h),
         |t AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |             CAST(sum(tok) AS BIGINT) AS total_tokens,
         |             CAST(sum(q4) AS BIGINT) AS q4sum,
         |             CAST(count(q4) AS BIGINT) AS qn,
         |             CAST(sum(CASE WHEN hc > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
         |      FROM j GROUP BY 1),
         |g AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt FROM j GROUP BY 1, 2),
         |c AS (SELECT source, tok,
         |             CAST(sum(cnt) OVER (PARTITION BY source ORDER BY tok
         |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |                  AS BIGINT) AS cum,
         |             CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS n
         |      FROM g),
         |m AS (SELECT source,
         |             min(CASE WHEN cum >= floor((n + 1) / 2.0) THEN tok END) AS m1,
         |             min(CASE WHEN cum >= floor((n + 2) / 2.0) THEN tok END) AS m2
         |      FROM c GROUP BY 1)
         |SELECT t.source, t.n_docs, t.n_langs, t.total_tokens,
         |       ${Q.sqlR6("CAST(t.q4sum AS DOUBLE) / t.qn / 10000.0")} AS mean_quality,
         |       ${Q.sqlR6("CAST(t.n_dup AS DOUBLE) / t.n_docs")} AS exact_dup_share,
         |       CAST(m.m1 + m.m2 AS DOUBLE) / 2 AS p50_tokens
         |FROM t JOIN m ON t.source = m.source
         |ORDER BY t.source""".stripMargin) { (s, d) =>
      val b = Tables.load(s, d, "documents")
        .select(col("source"), col("lang"), md5(col("text")).as("h"),
          split(col("text"), " ").as("words"))
        .select(col("source"), col("lang"), col("h"),
          size(col("words")).cast("long").as("tok"),
          when(size(col("words")) > 0,
            floor(TextPipeline.qualityOnWordsCol * 10000 + 0.5).cast("long")).as("q4"))
        .transform(Q.snapshot)
      val dh = b.groupBy("h").agg(count(lit(1)).as("hc"))
      val j = b.join(dh, "h").select("source", "lang", "tok", "q4", "hc")
        .transform(Q.snapshot)
      val t = j.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        countDistinct("lang").as("n_langs"),
        sum("tok").as("total_tokens"),
        sum("q4").as("q4sum"), count(col("q4")).as("qn"),
        sum(when(col("hc") > 1, 1L).otherwise(0L)).as("n_dup"))
      val wcum = Window.partitionBy("source").orderBy("tok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val m = j.groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum("cnt").over(wcum))
        .withColumn("n", sum("cnt").over(Window.partitionBy("source")))
        .groupBy("source")
        .agg(min(when(col("cum") >= floor((col("n") + 1) / 2.0), col("tok"))).as("m1"),
          min(when(col("cum") >= floor((col("n") + 2) / 2.0), col("tok"))).as("m2"))
      t.join(m, "source")
        .select(col("source"), col("n_docs"), col("n_langs"), col("total_tokens"),
          Q.r6(col("q4sum").cast("double") / col("qn") / lit(10000.0)).as("mean_quality"),
          Q.r6(col("n_dup").cast("double") / col("n_docs")).as("exact_dup_share"),
          ((col("m1") + col("m2")).cast("double") / 2).as("p50_tokens"))
        .orderBy("source")
    },

    // Interpolated Kneser–Ney bigram cross-entropy per source feed
    // (round 16): the smoothing that actually wins LM benchmarks —
    // absolute discount D = 0.75 off every bigram count, redistributed
    // through the CONTINUATION unigram P_cont(w) = N1+(·w)/T (how many
    // distinct contexts precede w — "Francisco" is frequent but
    // follows only "San", so KN correctly refuses to predict it cold).
    // The upgrade over q_bigram_logprob's Jelinek–Mercer mixture: the
    // discount is count-aware and the backoff mass λ(u) =
    // D·N1+(u·)/c(u) is exactly what the discount freed. Self-scored
    // corpus ⇒ every doc bigram has c ≥ 1 ⇒ c − D > 0, no max() edge.
    // Shapes: all model tables key on (lang, bigram)/(lang, word) —
    // vocab²-bounded, shuffle-joined; per-TYPE log terms integer-scale
    // to 1e-9 once, multiply by integer tf, and the per-source
    // reduction is an order-free int64 fold (the q_source_xent
    // discipline).
    Q("q_kn_logprob",
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
        |bo AS (SELECT doc_id, lang,
        |              unnest(list_transform(range(1, len(words)),
        |                     i -> words[i] || ' ' || words[i+1])) AS bigram
        |       FROM t WHERE len(words) >= 2),
        |tf AS (SELECT doc_id, lang, bigram, CAST(count(*) AS BIGINT) AS tf
        |       FROM bo GROUP BY 1, 2, 3),
        |cb AS (SELECT lang, bigram, CAST(sum(tf) AS BIGINT) AS cb,
        |              string_split(bigram, ' ')[1] AS u,
        |              string_split(bigram, ' ')[2] AS w
        |       FROM tf GROUP BY 1, 2),
        |cu AS (SELECT lang, u, CAST(sum(cb) AS BIGINT) AS cu,
        |              CAST(count(*) AS BIGINT) AS nf
        |       FROM cb GROUP BY 1, 2),
        |nw AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS nw FROM cb GROUP BY 1, 2),
        |tt AS (SELECT lang, CAST(count(*) AS BIGINT) AS t FROM cb GROUP BY 1),
        |pm AS (SELECT cb.lang, cb.bigram,
        |              (cb.cb - 0.75) / cu.cu +
        |              0.75 * (CAST(cu.nf AS DOUBLE) / cu.cu) *
        |              (CAST(nw.nw AS DOUBLE) / tt.t) AS p
        |       FROM cb
        |       JOIN cu ON cb.lang = cu.lang AND cb.u = cu.u
        |       JOIN nw ON cb.lang = nw.lang AND cb.w = nw.w
        |       JOIN tt ON cb.lang = tt.lang),
        |sc AS (SELECT tf.doc_id,
        |              CAST(sum(tf.tf) AS BIGINT) AS nb,
        |              CAST(sum(CAST(floor(tf.tf * ln(pm.p) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS lp9
        |       FROM tf JOIN pm ON tf.lang = pm.lang AND tf.bigram = pm.bigram
        |       GROUP BY 1),
        |ds AS (SELECT doc_id, source FROM documents)
        |SELECT ds.source, CAST(sum(sc.nb) AS BIGINT) AS n_bigrams,
        |       floor((-(sum(sc.lp9) / 1e9) / sum(sc.nb))*1000000+0.5)/1000000 AS kn_xent
        |FROM sc JOIN ds ON sc.doc_id = ds.doc_id
        |GROUP BY 1
        |ORDER BY ds.source""".stripMargin) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      val wd = docs.select(col("doc_id"), col("lang"), split(col("text"), " ").as("words"))
        .filter(size(col("words")) >= 2)
      val tf = wd.select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(0, size(words) - 2), i -> concat(words[i], ' ', words[i+1]))"))
        .as("bigram"))
        .groupBy("doc_id", "lang", "bigram").agg(count(lit(1)).as("tf"))
        .transform(Q.snapshot)
      val cb = tf.groupBy("lang", "bigram").agg(sum("tf").as("cb"))
        .withColumn("u", split(col("bigram"), " ").getItem(0))
        .withColumn("w", split(col("bigram"), " ").getItem(1))
        .transform(Q.snapshot)
      val cu = cb.groupBy("lang", "u").agg(sum("cb").as("cu"), count(lit(1)).as("nf"))
      val nw = cb.groupBy("lang", "w").agg(count(lit(1)).as("nw"))
      val tt = cb.groupBy("lang").agg(count(lit(1)).as("t"))
      val pm = cb
        .join(cu, Seq("lang", "u"))
        .join(nw, Seq("lang", "w"))
        .join(broadcast(tt), "lang")
        .select(col("lang"), col("bigram"),
          ((col("cb") - 0.75) / col("cu") +
            lit(0.75) * (col("nf").cast("double") / col("cu")) *
              (col("nw").cast("double") / col("t"))).as("p"))
      val sc = tf.join(pm, Seq("lang", "bigram"))
        .groupBy("doc_id")
        .agg(sum("tf").as("nb"),
          sum(floor(col("tf") * log(col("p")) * lit(1e9) + 0.5).cast("long")).as("lp9"))
      sc.join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy("source")
        .agg(sum("nb").cast("long").as("n_bigrams"),
          Q.r6(-(sum("lp9").cast("double") / lit(1e9)) / sum("nb")).as("kn_xent"))
        .orderBy("source")
    }
  )

  /** Concatenate-and-cut packing layout over any `documents`-shaped
    * frame, parameterized by shard width: shards = 16^shardNibbles.
    * A document's (shard, start_off) depends ONLY on the docs sharing
    * its shard — widening the nibble count re-shards but never changes
    * a shard's internal layout relative to packing that shard alone. */
  /** Core of q_source_overlap, factored out so the wide-catalog path is
    * unit-testable on synthetic >64-source corpora (TwinAndPropertySpec).
    *
    * Source membership is a SHARDED bitmask: an `array<bigint>` of
    * ceil(|catalog| / 64) words, where source idx occupies word
    * `idx / 64`, bit `idx % 64`. A single long would silently corrupt
    * wider catalogs — the JVM masks shift distances mod 64, so source
    * #65 would alias bit 0 of source #1. Every shift distance here is
    * `idx % 64` < 64 by construction, so no wrap is reachable at any
    * catalog width.
    *
    * The one driver-side action (`cat.count()`) is a scalar over the
    * DISTINCT feed catalog — a bounded static dimension (tens to
    * hundreds of rows), never the corpus; in production the catalog is
    * a known dim table and the count is metadata.
    */
  def sourceOverlap(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // feed catalog → bit index; idx order = name order, so i1 < i2
    // reproduces the s1 < s2 pair orientation. The tiny window is a
    // deliberate single-partition sort over the DISTINCT sources only.
    val cat = docs.select("source").distinct()
      .select(col("source"),
        (row_number().over(Window.orderBy("source")) - 1).cast("int").as("idx"))
    val nSrc = cat.count().toInt
    require(nSrc > 0, "q_source_overlap: empty source catalog")
    val nWords = (nSrc + 63) / 64
    val wordAggs = (0 until nWords).map { w =>
      expr(s"""bit_or(IF(idx DIV 64 = $w,
              |          shiftleft(CAST(1 AS BIGINT), idx % 64),
              |          CAST(0 AS BIGINT)))""".stripMargin).as(s"m$w")
    }
    val masks = docs
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .select(col("source"), explode(expr(
        """transform(sequence(0, size(words) - 3),
          |          i -> concat_ws(' ', words[i], words[i+1], words[i+2]))""".stripMargin))
        .as("shingle"))
      .join(broadcast(cat), "source")
      .groupBy("shingle").agg(wordAggs.head, wordAggs.tail: _*)
      .select(array((0 until nWords).map(w => col(s"m$w")): _*).as("mask"))
      .groupBy("mask").agg(count(lit(1)).as("cnt"))
      .withColumn("idxs", expr(
        s"""filter(sequence(0, ${nSrc - 1}),
           |       i -> (shiftright(element_at(mask, CAST(i DIV 64 AS INT) + 1),
           |                        CAST(i % 64 AS INT)) & 1) = 1)""".stripMargin))
    // per mask (ascending idxs): one (x, -1) unary per member bit +
    // one (x, y) row per ordered pair, each weighted by the mask count
    val edges = masks
      .select(col("cnt"), explode(expr(
        """flatten(transform(idxs, (x, i) ->
          |  concat(array(struct(x AS i1, -1 AS i2)),
          |         transform(slice(idxs, i + 2, size(idxs)),
          |                   y -> struct(x AS i1, y AS i2)))))""".stripMargin)).as("e"))
      .select(col("e.i1").as("i1"), col("e.i2").as("i2"), col("cnt"))
      .groupBy("i1", "i2").agg(sum("cnt").as("c"))
    val n = edges.filter(col("i2") === -1)
      .join(broadcast(cat), col("i1") === col("idx"))
      .select(col("source").as("src"), col("c").as("n"))
    val pairs = edges.filter(col("i2") =!= -1)
      .join(broadcast(cat.select(col("idx").as("i1"), col("source").as("s1"))), "i1")
      .join(broadcast(cat.select(col("idx").as("i2"), col("source").as("s2"))), "i2")
      .select(col("s1"), col("s2"), col("c").as("shared"))
    val jac = col("shared").cast("double") / (col("n1") + col("n2") - col("shared"))
    pairs
      .join(broadcast(n.select(col("src").as("s1"), col("n").as("n1"))), "s1")
      .join(broadcast(n.select(col("src").as("s2"), col("n").as("n2"))), "s2")
      .select(col("s1"), col("s2"), col("shared"), Q.r4(jac).as("jaccard"))
      .orderBy("s1", "s2")
  }

  def packDocs(docs: org.apache.spark.sql.DataFrame, shardNibbles: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shardNibbles >= 1 && shardNibbles <= 8, s"bad shard width $shardNibbles")
    val byShard = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"),
        substring(md5(col("doc_id").cast("string")), 1, shardNibbles).as("shard"),
        size(split(col("text"), " ")).cast("long").as("tok"))
      .withColumn("start_off", coalesce(sum("tok").over(byShard), lit(0L)))
      .select(col("doc_id"), col("shard"), col("tok"), col("start_off"),
        expr("start_off div 256").as("first_bin"),
        expr("(start_off + tok - 1) div 256").as("last_bin"),
        expr("(start_off + tok - 1) div 256 - start_off div 256 + 1").as("n_bins"))
      .orderBy("doc_id")
  }
}
