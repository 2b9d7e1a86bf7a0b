package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation DECISION operators (round 13, SURVEY §2.15): the ops
  * that turn the dedup/profiling families' measurements into the
  * actionable artifacts a pipeline actually ships — the per-cluster
  * keeper list, the boilerplate-prefix exposure per feed, and the
  * vocabulary coverage curve that sizes a tokenizer.
  *
  * Scale notes: everything here RIDES already-bounded frames — the LSH
  * candidate graph (never all-pairs), prefix-keyed and vocab-keyed
  * aggregations (Zipf-bounded, orders of magnitude below the corpus),
  * and catalog joins where AQE broadcasts the SMALL derived side
  * against the corpus-sized catalog (the q_source_dup_matrix
  * precedent, asserted in CorpusScaleSpec). No new shuffle shape is
  * introduced by this file.
  */
object Curation {

  def defs: Seq[QueryDef] = Seq(

    // Keeper-per-cluster dedup decision: for every near-dup cluster
    // (connected components over the LSH candidate graph — exactly
    // q_dup_clusters' partition), elect the doc to KEEP (longest
    // n_chars, tie → smallest doc_id) and report how many the decision
    // drops. This is the artifact the "keeper-per-cluster vs pairwise"
    // strategy question (q_dup_cluster_sizes) resolves into. Spark
    // side: the CC label frame is LSH-bounded and joins the
    // corpus-sized catalog UNHINTED so AQE broadcasts the small side;
    // the keeper window runs over the tiny labeled frame only.
    Q("q_dedup_keepers",
      "WITH RECURSIVE " + TextPipeline.LshPairCtes + """,
        |edges AS (SELECT d1 AS src, d2 AS dst FROM cands
        |          UNION ALL
        |          SELECT d2, d1 FROM cands),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach AS (SELECT id, id AS lbl FROM nodes
        |          UNION
        |          SELECT e.dst AS id, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY 1),
        |k AS (SELECT c.lbl AS cluster_id, c.id AS doc, d.n_chars,
        |             row_number() OVER (PARTITION BY c.lbl
        |                                ORDER BY d.n_chars DESC, c.id) AS rk,
        |             count(*) OVER (PARTITION BY c.lbl) AS sz
        |      FROM comp c JOIN documents d ON c.id = d.doc_id)
        |SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
        |       CAST(doc AS BIGINT) AS keeper_doc,
        |       CAST(n_chars AS BIGINT) AS keeper_chars,
        |       CAST(sz AS BIGINT) AS cluster_size,
        |       CAST(sz - 1 AS BIGINT) AS n_dropped
        |FROM k WHERE rk = 1
        |ORDER BY cluster_id""".stripMargin) { (s, d) =>
      val comp = TextPipeline.connectedComponents(TextPipeline.lshCandidatePairs(s, d))
        .withColumnRenamed("id", "doc_id")
      val cat = Tables.load(s, d, "documents").select(col("doc_id"), col("n_chars"))
      val byCluster = Window.partitionBy("lbl")
      comp.join(cat, "doc_id")
        .withColumn("rk", row_number().over(
          byCluster.orderBy(col("n_chars").desc, col("doc_id"))))
        .withColumn("sz", count(lit(1)).over(byCluster))
        .filter(col("rk") === 1)
        .select(col("lbl").as("cluster_id"), col("doc_id").as("keeper_doc"),
          col("n_chars").as("keeper_chars"), col("sz").as("cluster_size"),
          (col("sz") - 1).as("n_dropped"))
        .orderBy("cluster_id")
    },

    // Boilerplate-prefix exposure per source: the share of each feed's
    // documents whose normalized 4-word opening is shared with at
    // least one other document ANYWHERE in the corpus — the cheap
    // header/template detector that runs before anyone pays for
    // shingle dedup (a feed with 60% shared prefixes is wrapping its
    // payloads in boilerplate; strip it, don't dedup it). Two
    // prefix-keyed aggs — the prefix domain is Zipf-bounded like a
    // vocabulary — joined on the prefix key; the rollup lands on
    // |sources| rows.
    Q("q_prefix_dup",
      """WITH w AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
        |p AS (SELECT source, array_to_string(ws[1:4], ' ') AS prefix
        |      FROM w WHERE len(ws) >= 4),
        |g AS (SELECT prefix, count(*) AS n FROM p GROUP BY 1),
        |sp AS (SELECT source, prefix, count(*) AS n FROM p GROUP BY 1, 2)
        |SELECT sp.source AS source,
        |       CAST(sum(sp.n) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN g.n >= 2 THEN sp.n ELSE 0 END) AS BIGINT) AS n_shared_prefix,
        |       floor((CAST(sum(CASE WHEN g.n >= 2 THEN sp.n ELSE 0 END) AS DOUBLE) / sum(sp.n))*1000000+0.5)/1000000 AS share
        |FROM sp JOIN g ON sp.prefix = g.prefix
        |GROUP BY 1
        |ORDER BY 1""".stripMargin) { (s, d) =>
      val p = Tables.load(s, d, "documents")
        .select(col("source"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 4)
        .select(col("source"), concat_ws(" ", slice(col("ws"), 1, 4)).as("prefix"))
      val g = p.groupBy("prefix").agg(count(lit(1)).as("gn"))
      val sp = p.groupBy("source", "prefix").agg(count(lit(1)).as("n"))
      val sharedN = sum(when(col("gn") >= 2, col("n")).otherwise(0L))
      sp.join(g, "prefix")
        .groupBy("source")
        .agg(sum("n").as("n_docs"), sharedN.as("n_shared_prefix"),
          Q.r6(sharedN.cast("double") / sum("n")).as("share"))
        .orderBy("source")
    },

    // Vocabulary coverage curve: the fraction of all token OCCURRENCES
    // covered by the k most frequent types, k ∈ {10, 100, 1000} — the
    // diminishing-returns readout that sizes a tokenizer vocabulary
    // (and the integral twin of q_zipf_fit's slope: a steep Zipf makes
    // tiny vocabularies cover most of the mass). Shape (r14 rewrite):
    // coverage needs ranks ≤ 1000 ONLY, and the vocabulary is NOT a
    // bounded frame — Heaps' law (q_heaps_fit: V(n) ≈ K·n^β) grows it
    // as a power of corpus size, 10⁸–10⁹ types at 100 TB — so the r13
    // whole-vocab rank window (empty partition spec ⇒ one reducer
    // sorting every type) is exactly the shape r8 purged from
    // q_ngram_freq. Instead ONE global aggregate over the vocab count
    // frame computes all three sufficient pieces in a single pass:
    // total token mass (sum), type count, and the top-1000 (count,
    // token) pairs via the bounded-buffer TopKStrAgg — map-side
    // partials ship ≤1000 rows per partition, the (c DESC, token ASC)
    // buffer order IS the oracle's rank order, and the rank/conditional
    // rollup then runs over the ≤1000-row exploded frame only.
    // Exactness: counts are integers (exact in double far past any
    // corpus), and the covered sums are tie-break-INVARIANT at the
    // k-boundaries (tied types have equal counts by definition), so the
    // engine and the oracle agree to the bit.
    Q("q_vocab_coverage",
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |c AS (SELECT w, count(*) AS c FROM t GROUP BY 1),
        |r AS (SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rk FROM c),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v FROM c),
        |ks AS (SELECT unnest([10, 100, 1000]) AS k),
        |j AS (SELECT ks.k AS k,
        |             CAST(sum(CASE WHEN r.rk <= ks.k THEN r.c ELSE 0 END) AS BIGINT) AS covered
        |      FROM r CROSS JOIN ks GROUP BY 1)
        |SELECT CAST(j.k AS BIGINT) AS k, j.covered, tot.n AS total_tokens,
        |       tot.v AS n_types,
        |       floor((CAST(j.covered AS DOUBLE) / tot.n)*1000000+0.5)/1000000 AS coverage
        |FROM j CROSS JOIN tot
        |ORDER BY k""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      // one pass over the vocab frame: totals + the bounded top-1000.
      // TopKStrAgg's (score DESC, token UTF-8 ASC) buffer order is the
      // oracle's row_number(ORDER BY c DESC, w) order, so pos+1 IS rk.
      val top1000 = udaf(new graft.functions.TopKStrAgg(1000),
        Encoders.product[graft.functions.ScoredStr])
      val st = c.agg(sum("c").as("n"), count(lit(1)).as("v"),
        top1000(col("c").cast("double"), col("w")).as("top"))
      st.select(col("n"), col("v"), posexplode(col("top")))
        .select(col("n"), col("v"), (col("pos") + 1).as("rk"),
          col("col.score").cast("long").as("c"))
        .select(col("n"), col("v"), col("rk"), col("c"),
          explode(array(lit(10L), lit(100L), lit(1000L))).as("k"))
        .groupBy("k")
        .agg(sum(when(col("rk") <= col("k"), col("c")).otherwise(0L)).as("covered"),
          max("n").as("total_tokens"), max("v").as("n_types"))
        .select(col("k"), col("covered"), col("total_tokens"), col("n_types"),
          Q.r6(col("covered").cast("double") / col("total_tokens")).as("coverage"))
        .orderBy("k")
    },

    // Per-source content novelty (round 13): the share of each feed's
    // distinct 3-shingles that appear NOWHERE else in the corpus —
    // "how much unique content does this source actually contribute",
    // the acquisition-value complement of q_prefix_dup's boilerplate
    // exposure and q_source_overlap's pairwise containment (a feed can
    // be boilerplate-free yet still 95% re-statable from the others).
    // Rides the SAME (lang, shingle)-keyed df exchange the dedup
    // family shuffles on — df == 1 is exact under any df cap since
    // capping only drops HIGH-df shingles from candidate generation;
    // per-doc fractions hit the 1e6 lattice before the source mean.
    // (Spark side: df comes from a count window ON the (lang, shingle)
    // exchange — the q_cross_doc_ngram one-shuffle form — never an
    // agg + corpus-sized join-back.)
    Q("q_doc_novelty",
      """WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
        |sh AS (SELECT DISTINCT doc_id, lang,
        |              unnest(list_transform(range(1, len(words) - 1),
        |                     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingle
        |       FROM w WHERE len(words) >= 3),
        |df AS (SELECT lang, shingle, count(*) AS df FROM sh GROUP BY 1, 2),
        |pd AS (SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_sh,
        |              CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS uniq
        |       FROM sh JOIN df ON sh.lang = df.lang AND sh.shingle = df.shingle
        |       GROUP BY 1),
        |sd AS (SELECT d.source, pd.n_sh, pd.uniq,
        |              CAST(floor((CAST(pd.uniq AS DOUBLE) / pd.n_sh) * 1e6 + 0.5) AS BIGINT) AS f6
        |       FROM pd JOIN documents d ON pd.doc_id = d.doc_id)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(uniq) AS BIGINT) AS unique_shingles,
        |       CAST(sum(n_sh) AS BIGINT) AS total_shingles,
        |       floor((CAST(sum(uniq) AS DOUBLE) / sum(n_sh))*1000000+0.5)/1000000 AS novelty,
        |       floor((CAST(sum(f6) AS DOUBLE) / (count(*) * 1e6))*1000000+0.5)/1000000 AS mean_doc_novelty
        |FROM sd
        |GROUP BY 1
        |ORDER BY 1""".stripMargin) { (s, d) =>
      val pd = TextPipeline.shingles(s, d)
        .withColumn("df", count(lit(1)).over(Window.partitionBy("lang", "shingle")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sh"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("uniq"))
      val cat = Tables.load(s, d, "documents").select(col("doc_id"), col("source"))
      pd.join(cat, "doc_id")
        .withColumn("f6",
          floor((col("uniq").cast("double") / col("n_sh")) * lit(1e6) + 0.5).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("uniq").as("unique_shingles"),
          sum("n_sh").as("total_shingles"),
          Q.r6(sum("uniq").cast("double") / sum("n_sh")).as("novelty"),
          Q.r6(sum("f6").cast("double") / (count(lit(1)) * lit(1e6)))
            .as("mean_doc_novelty"))
        .orderBy("source")
    },

    // Incremental ingest dedup (round 14) — the operation a DAILY
    // pipeline actually runs: the corpus is already deduped; a NEW
    // batch arrives; classify each incoming doc against the EXISTING
    // corpus only. Split: the top 20% of doc ids are "incoming" (the
    // newest ingest), the rest "existing" — a deterministic id
    // threshold both engines derive from the same count. Per incoming
    // doc: 'exact' (byte-identical text exists, smallest matching
    // existing id reported), else 'near' (a df-capped shingle-Jaccard
    // ≥ 0.8 match to an existing doc — the exact q_dedup_near
    // machinery, filtered to cross-split pairs), else 'new'.
    // Intra-batch duplicates are deliberately out of scope (that is
    // q_dedup_exact/near over the batch alone); this op answers "what
    // does the NEW data add". Scale: the exact pass is one md5-keyed
    // hash join; the near pass rides shinglePairStats' capped
    // candidate generation (cross-split filter is a pushdown on the
    // pair frame, and at 100 TB the production form indexes the
    // existing side's signatures once — the shape s_dedup_keepers'
    // doc notes spell out). Oracle runs the UNCAPPED pair SQL; the
    // declared Spark entry runs the cap-128 path, result-identical
    // per SkewSpec's cap-invariance bound.
    Q("q_dedup_incremental",
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
        |nd AS (SELECT p.d1, p.d2
        |       FROM pairs p
        |       JOIN cnt c1 ON p.d1 = c1.doc_id
        |       JOIN cnt c2 ON p.d2 = c2.doc_id
        |       WHERE CAST(p.inter AS DOUBLE) / (c1.n + c2.n - p.inter) >= 0.8),
        |t AS (SELECT CAST(floor(count(*) * 0.8) AS BIGINT) AS t FROM documents),
        |inc AS (SELECT doc_id FROM documents, t WHERE doc_id >= t.t),
        |ex AS (SELECT i.doc_id, CAST(min(e.doc_id) AS BIGINT) AS m
        |       FROM documents i JOIN documents e ON md5(i.text) = md5(e.text), t
        |       WHERE i.doc_id >= t.t AND e.doc_id < t.t
        |       GROUP BY 1),
        |nr AS (SELECT nd.d2 AS doc_id, CAST(min(nd.d1) AS BIGINT) AS m
        |       FROM nd, t WHERE nd.d1 < t.t AND nd.d2 >= t.t
        |       GROUP BY 1)
        |SELECT inc.doc_id,
        |       CASE WHEN ex.m IS NOT NULL THEN 'exact'
        |            WHEN nr.m IS NOT NULL THEN 'near'
        |            ELSE 'new' END AS status,
        |       coalesce(ex.m, nr.m) AS match_doc
        |FROM inc
        |LEFT JOIN ex ON inc.doc_id = ex.doc_id
        |LEFT JOIN nr ON inc.doc_id = nr.doc_id
        |ORDER BY inc.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      // parquet metadata count — the same deterministic threshold the
      // oracle's scalar subquery computes
      val t = docs.count() * 8L / 10L
      val incoming = docs.filter(col("doc_id") >= t)
      val existing = docs.filter(col("doc_id") < t)
      val ex = incoming
        .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
        .join(existing.select(md5(col("text").cast("binary")).as("h"),
          col("doc_id").as("m")), "h")
        .groupBy("doc_id").agg(min("m").as("ex_m"))
      val nr = TextPipeline.nearDupPairs(s, d, dfCap = Some(128L))
        .filter(col("d1") < t && col("d2") >= t)
        .groupBy(col("d2").as("doc_id")).agg(min("d1").as("nr_m"))
      incoming.select("doc_id")
        .join(ex, Seq("doc_id"), "left")
        .join(nr, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("ex_m").isNotNull, "exact")
            .when(col("nr_m").isNotNull, "near")
            .otherwise("new").as("status"),
          coalesce(col("ex_m"), col("nr_m")).as("match_doc"))
        .orderBy("doc_id")
    },

    // Filter-cascade attribution (round 14): the upset-plot readout
    // behind every curation pipeline review — which FILTER COMBINATION
    // holds each slice of the corpus, and at which stage of the fixed
    // cascade (lang → length → quality → exact-dup) each slice would
    // drop. Four flags per doc: the in-row marker-word language
    // predictor agreeing with the recorded lang (shared
    // TextPipeline.predLang — one home with q_lang_id/q_cohens_kappa),
    // n_chars ≥ 200, the shared quality heuristic on its ×10⁴ lattice
    // ≥ 0.62 (integer compare — engine-exact), and being the
    // min-doc_id keeper of the md5 content group (the established
    // dedup exchange). ONE content-hash shuffle + a 16-key grid agg;
    // the cascade stage is derived IN-ROW from the flags, so the grid
    // carries both readouts. The body routes through the SAME
    // cascadeCells/cascadeOf pair the s_filter_cascade streaming face
    // uses: the dup split needs only COUNTS per content group (one
    // keeper + n−1 dups), so the (md5, flags) grid is the mergeable
    // state and the keeper window disappears entirely — map-side
    // partial aggregation instead of a content-hash window sort.
    Q("q_filter_cascade",
      s"""WITH w AS (SELECT doc_id, lang, n_chars, text,
         |                  string_split(text, ' ') AS words FROM documents),
         |f AS (SELECT doc_id,
         |             CASE WHEN (${TextPipeline.predLangSql}) = lang
         |               THEN 1 ELSE 0 END AS lang_ok,
         |             CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS len_ok,
         |             CASE WHEN len(words) > 0 AND
         |               CAST(floor(${TextPipeline.qualityOnWordsSql} * 10000 + 0.5) AS BIGINT)
         |                 >= 6200 THEN 1 ELSE 0 END AS quality_ok,
         |             CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(text))
         |               THEN 1 ELSE 0 END AS dup_ok
         |      FROM w),
         |g AS (SELECT lang_ok, len_ok, quality_ok, dup_ok,
         |             CAST(count(*) AS BIGINT) AS n_docs
         |      FROM f GROUP BY 1, 2, 3, 4),
         |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tot FROM g)
         |SELECT lang_ok, len_ok, quality_ok, dup_ok, n_docs,
         |       ${Q.sqlR6("CAST(n_docs AS DOUBLE) / tot")} AS share,
         |       CASE WHEN lang_ok = 0 THEN 1 WHEN len_ok = 0 THEN 2
         |            WHEN quality_ok = 0 THEN 3 WHEN dup_ok = 0 THEN 4
         |            ELSE 0 END AS removed_at_stage
         |FROM g CROSS JOIN t
         |ORDER BY lang_ok, len_ok, quality_ok, dup_ok""".stripMargin) { (s, d) =>
      cascadeOf(cascadeCells(Tables.load(s, d, "documents")))
    },

    // Capture–recapture dedup-recall estimation (round 14): the "how
    // many near-dup pairs did we MISS" question no single detector can
    // answer about itself. The MinHash-LSH candidate list and the
    // SimHash candidate list are two independent captures of the same
    // underlying duplicate-pair population; the Chapman estimator
    // N̂ = (nA+1)(nB+1)/(nAB+1) − 1 sizes that population from their
    // overlap, and nAB/nB (resp. nAB/nA) estimates each detector's
    // recall. Both pair lists are the EXISTING bounded machinery
    // (banded self-joins, never all-pairs — one home each with
    // q_minhash_lsh / q_dedup_simhash); the overlap is one join on the
    // (d1, d2) pair key; the readout is a single row.
    Q("q_capture_recapture",
      "WITH " + TextPipeline.LshPairCtes + ",\n" + TextPipeline.SimhashPairCtes + s""",
        |na AS (SELECT CAST(count(*) AS BIGINT) AS na FROM cands),
        |nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM spairs),
        |nab AS (SELECT CAST(count(*) AS BIGINT) AS nab
        |        FROM cands c JOIN spairs s ON c.d1 = s.d1 AND c.d2 = s.d2)
        |SELECT na AS n_lsh, nb AS n_simhash, nab AS n_both,
        |       ${Q.sqlR6("(CAST(na + 1 AS DOUBLE) * (nb + 1) / (nab + 1)) - 1")} AS chapman_est,
        |       CASE WHEN nb > 0 THEN ${Q.sqlR6("CAST(nab AS DOUBLE) / nb")} END AS est_recall_lsh,
        |       CASE WHEN na > 0 THEN ${Q.sqlR6("CAST(nab AS DOUBLE) / na")} END AS est_recall_simhash
        |FROM na, nb, nab""".stripMargin) { (s, d) =>
      // NOT snapshotted (r19, measured): both consumers (count +
      // overlap join) live in ONE plan, where runtime exchange reuse
      // already dedupes the shared subtrees — eager snapshots of the
      // two lists were tried and measured ~0.7 s SLOWER at sf0.1
      val a = TextPipeline.lshCandidatePairs(s, d).select("d1", "d2")
      val b = TextPipeline.simhashCandidatePairs(s, d).select("d1", "d2")
      val na = a.agg(count(lit(1)).as("na"))
      val nb = b.agg(count(lit(1)).as("nb"))
      val nab = a.join(b, Seq("d1", "d2")).agg(count(lit(1)).as("nab"))
      na.crossJoin(broadcast(nb)).crossJoin(broadcast(nab))
        .select(col("na").as("n_lsh"), col("nb").as("n_simhash"), col("nab").as("n_both"),
          Q.r6((col("na") + 1).cast("double") * (col("nb") + 1) / (col("nab") + 1) - 1)
            .as("chapman_est"),
          when(col("nb") > 0,
            Q.r6(col("nab").cast("double") / col("nb"))).as("est_recall_lsh"),
          when(col("na") > 0,
            Q.r6(col("nab").cast("double") / col("na"))).as("est_recall_simhash"))
    },

    // Blocking-quality audit of the MinHash-LSH candidate generation
    // (round 15): the entity-resolution evaluation pair — PAIRS
    // COMPLETENESS (what share of the true Jaccard-≥0.8 pairs the
    // banding discovers), candidate precision (what share of
    // candidates are true), and the REDUCTION RATIO (how far below
    // the n(n−1)/2 all-pairs cross the candidate count sits). The
    // truth side is the exact near-dup machinery (df-capped candidate
    // discovery + exact intersection recompute — result-identical to
    // uncapped per SkewSpec); this is the OFFLINE harness a dedup
    // team runs at sample scale to certify a banding config before
    // trusting it at 100 TB, priced accordingly. All counts int64;
    // three divisions on the final scalars.
    Q("q_blocking_quality",
      "WITH " + TextPipeline.LshPairCtes + s""",
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        |          FROM sh a JOIN sh b ON a.lang = b.lang AND a.shingle = b.shingle
        |                             AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |truth AS (SELECT p.d1, p.d2
        |          FROM pairs p
        |          JOIN cnt c1 ON p.d1 = c1.doc_id
        |          JOIN cnt c2 ON p.d2 = c2.doc_id
        |          WHERE CAST(p.inter AS DOUBLE) / (c1.n + c2.n - p.inter) >= 0.8),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM cands),
        |ntp AS (SELECT CAST(count(*) AS BIGINT) AS n_true_pairs FROM truth),
        |nh AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
        |       FROM cands c JOIN truth t ON c.d1 = t.d1 AND c.d2 = t.d2),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
        |SELECT n_candidates, n_true_pairs, n_hit,
        |       CASE WHEN n_true_pairs > 0 THEN ${Q.sqlR6("CAST(n_hit AS DOUBLE) / n_true_pairs")} END AS pairs_completeness,
        |       CASE WHEN n_candidates > 0 THEN ${Q.sqlR6("CAST(n_hit AS DOUBLE) / n_candidates")} END AS candidate_precision,
        |       CASE WHEN n > 1 THEN ${Q.sqlR6("1 - n_candidates / (CAST(n AS DOUBLE) * (n - 1) / 2)")} END AS reduction_ratio
        |FROM nc, ntp, nh, nd""".stripMargin) { (s, d) =>
      // NOT snapshotted (r19, measured): both consumers of each list
      // live in ONE plan — runtime exchange reuse dedupes the shared
      // subtrees, and eager snapshots measured ~0.6 s slower at sf0.1
      val cand = TextPipeline.lshCandidatePairs(s, d).select("d1", "d2")
      val truth = TextPipeline.nearDupPairs(s, d, dfCap = Some(128L)).select("d1", "d2")
      val nc = cand.agg(count(lit(1)).as("n_candidates"))
      val ntp = truth.agg(count(lit(1)).as("n_true_pairs"))
      val nh = cand.join(truth, Seq("d1", "d2")).agg(count(lit(1)).as("n_hit"))
      val nd = Tables.load(s, d, "documents").agg(count(lit(1)).as("n"))
      nc.crossJoin(broadcast(ntp)).crossJoin(broadcast(nh)).crossJoin(broadcast(nd))
        .select(col("n_candidates"), col("n_true_pairs"), col("n_hit"),
          when(col("n_true_pairs") > 0,
            Q.r6(col("n_hit").cast("double") / col("n_true_pairs")))
            .as("pairs_completeness"),
          when(col("n_candidates") > 0,
            Q.r6(col("n_hit").cast("double") / col("n_candidates")))
            .as("candidate_precision"),
          when(col("n") > 1,
            Q.r6(lit(1) - col("n_candidates") /
              (col("n").cast("double") * (col("n") - 1) / 2))).as("reduction_ratio"))
    },

    // Token-novelty curve over ingest order (round 15): slice the
    // corpus into ten doc-id deciles (the ingest axis) and ask, per
    // slice, what share of its token OCCURRENCES are tokens the
    // corpus has never seen before — the freshness curve that tells a
    // data team whether a new drop still adds vocabulary or just
    // repeats the old one (slice 0 reads 1.0 by definition; a flat
    // tail near 0 means the source went stale). Also per slice: new
    // TYPES and the cumulative vocabulary (the Heaps curve resampled
    // on the ingest axis). Determinism: the decile is exact integer
    // division of doc_id·10 by max_id+1 (the idiv exact-multiple
    // form); token first-slice is a min over the (slice, token) count
    // frame. Shape: token-keyed aggs (vocab-bounded, Zipf), one
    // token-keyed join, windows only over the 10-row slice frame.
    Q("q_token_novelty",
      s"""WITH mx AS (SELECT max(doc_id) AS m FROM documents),
         |t AS (SELECT (d.doc_id * 10) // (mx.m + 1) AS bucket,
         |             unnest(string_split(d.text, ' ')) AS w
         |      FROM documents d, mx),
         |c AS (SELECT bucket, w, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1, 2),
         |f AS (SELECT w, CAST(min(bucket) AS BIGINT) AS fb FROM c GROUP BY 1),
         |j AS (SELECT c.bucket, CAST(sum(c.c) AS BIGINT) AS n_tokens,
         |             CAST(sum(CASE WHEN f.fb = c.bucket THEN c.c ELSE 0 END) AS BIGINT) AS novel_tokens
         |      FROM c JOIN f ON c.w = f.w GROUP BY 1),
         |nt AS (SELECT fb AS bucket, CAST(count(*) AS BIGINT) AS new_types FROM f GROUP BY 1),
         |g AS (SELECT j.bucket, j.n_tokens, j.novel_tokens,
         |             CAST(coalesce(nt.new_types, 0) AS BIGINT) AS new_types
         |      FROM j LEFT JOIN nt ON j.bucket = nt.bucket),
         |wc AS (SELECT *, CAST(sum(new_types) OVER (ORDER BY bucket
         |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types FROM g)
         |SELECT CAST(bucket AS BIGINT) AS bucket, n_tokens, novel_tokens,
         |       ${Q.sqlR6("CAST(novel_tokens AS DOUBLE) / n_tokens")} AS novelty_share,
         |       new_types, cum_types
         |FROM wc
         |ORDER BY bucket""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.Column
      def idiv(a: Column, b: Column): Column = ((a - a % b) / b).cast("long")
      val mx = Tables.load(s, d, "documents").agg(max("doc_id").as("m"))
      val t = Tables.load(s, d, "documents").crossJoin(broadcast(mx))
        .select(idiv(col("doc_id") * 10, col("m") + 1).as("bucket"),
          explode(split(col("text"), " ")).as("w"))
      val c = t.groupBy("bucket", "w").agg(count(lit(1)).as("c"))
        .transform(Q.snapshot)
      val f = c.groupBy("w").agg(min("bucket").as("fb"))
      val j = c.join(f, "w")
        .groupBy("bucket")
        .agg(sum("c").as("n_tokens"),
          sum(when(col("fb") === col("bucket"), col("c")).otherwise(0L))
            .as("novel_tokens"))
      val nt = f.groupBy(col("fb").as("bucket"))
        .agg(count(lit(1)).as("new_types"))
      j.join(nt, Seq("bucket"), "left")
        .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
        .withColumn("cum_types", sum("new_types").over(
          Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("bucket"), col("n_tokens"), col("novel_tokens"),
          Q.r6(col("novel_tokens").cast("double") / col("n_tokens")).as("novelty_share"),
          col("new_types"), col("cum_types"))
        .orderBy("bucket")
    },

    // Perplexity-band bucketing (round 15) — the CCNet curation move:
    // train a char-trigram LM per language ON THE CORPUS ITSELF, score
    // every document's mean per-trigram log-likelihood, and cut each
    // language into head/middle/tail TERCILES of that score (low
    // perplexity = head — the fluent third; high = tail — the third a
    // pipeline routes to review or drops). Self-training means no
    // unseen trigram exists, so no smoothing constant enters the
    // formula. Determinism: each distinct trigram's ln(c/T) floors
    // onto the 1e-9 lattice ONCE, per-doc sums are tf-weighted int64
    // folds, the per-doc mean quantizes to the 1e-4 lattice (m4), and
    // the tercile cuts are exact first-crossings over the (lang, m4)
    // grid — LATTICE-bounded (≤ the m4 value range), never
    // doc-bounded, the q_token_budget_trim shape. Scale: trigram
    // counting collapses map-side onto the charset³-bounded key; the
    // scoring join broadcasts that domain-bounded model.
    Q("q_ppl_bucket",
      s"""WITH tri AS (SELECT doc_id, lang,
         |                    unnest(list_transform(range(1, len(text) - 1),
         |                           i -> substr(text, i, 3))) AS tri
         |             FROM documents WHERE len(text) >= 3),
         |g AS (SELECT doc_id, lang, tri, CAST(count(*) AS BIGINT) AS tf
         |      FROM tri GROUP BY 1, 2, 3),
         |lm AS (SELECT lang, tri, CAST(sum(tf) AS BIGINT) AS c FROM g GROUP BY 1, 2),
         |tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t FROM lm GROUP BY 1),
         |term AS (SELECT lm.lang, lm.tri,
         |                CAST(floor(ln(CAST(lm.c AS DOUBLE) / tot.t) * 1e9 + 0.5) AS BIGINT) AS t9
         |         FROM lm JOIN tot ON lm.lang = tot.lang),
         |ds AS (SELECT g.doc_id, g.lang,
         |              CAST(sum(g.tf * term.t9) AS BIGINT) AS lp9,
         |              CAST(sum(g.tf) AS BIGINT) AS n
         |       FROM g JOIN term ON g.lang = term.lang AND g.tri = term.tri
         |       GROUP BY 1, 2),
         |dm AS (SELECT doc_id, lang,
         |              CAST(floor(CAST(lp9 AS DOUBLE) / (n * 1e9) * 1e4 + 0.5) AS BIGINT) AS m4
         |       FROM ds),
         |gr AS (SELECT lang, m4, CAST(count(*) AS BIGINT) AS cnt FROM dm GROUP BY 1, 2),
         |cw AS (SELECT lang, m4, cnt,
         |              CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY m4
         |                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |              CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS nl
         |       FROM gr),
         |cuts AS (SELECT lang,
         |                CAST(min(CASE WHEN cum * 3 >= nl THEN m4 END) AS BIGINT) AS t1,
         |                CAST(min(CASE WHEN cum * 3 >= 2 * nl THEN m4 END) AS BIGINT) AS t2
         |         FROM cw GROUP BY 1),
         |bk AS (SELECT dm.lang,
         |              CASE WHEN dm.m4 <= cuts.t1 THEN 'tail'
         |                   WHEN dm.m4 <= cuts.t2 THEN 'middle'
         |                   ELSE 'head' END AS bucket,
         |              dm.m4
         |       FROM dm JOIN cuts ON dm.lang = cuts.lang)
         |SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
         |       ${Q.sqlR6("CAST(sum(m4) AS DOUBLE) / (count(*) * 1e4)")} AS mean_lp
         |FROM bk
         |GROUP BY 1, 2
         |ORDER BY lang, bucket""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // Per-doc distinct (tri, tf) pairs built IN-ROW (r17 shape, r18
      // engine): the explode emits only each doc's DISTINCT trigrams,
      // so the first exchange shrinks by the in-doc repetition factor
      // and the (doc, lang, tri) groupBy exchange disappears entirely.
      // The fold itself is the native char_trigram_tfs expression — the
      // r17 HOF chain re-scanned the string from byte 0 on every
      // interpreted substring(text, i, 3) call (UTF8String has no
      // code-point index), quadratic per document and measured ~3.4 s
      // of this query's 5.4 s at sf0.1; the expression computes the
      // code-point offsets once and emits the identical sorted (tri,
      // tf) structs (equivalence pinned in TwinAndPropertySpec).
      val g = Tables.load(s, d, "documents")
        .filter(length(col("text")) >= 3)
        .select(col("doc_id"), col("lang"),
          explode(graft.functions.CharTrigramTfs.char_trigram_tfs(col("text"))).as("p"))
        .select(col("doc_id"), col("lang"), col("p.tri").as("tri"), col("p.tf").as("tf"))
        .transform(Q.snapshot)
      val lm = g.groupBy("lang", "tri").agg(sum("tf").as("c"))
      val tot = lm.groupBy("lang").agg(sum("c").as("t"))
      val term = lm.join(broadcast(tot), "lang")
        .select(col("lang"), col("tri"),
          floor(log(col("c").cast("double") / col("t")) * 1e9 + 0.5)
            .cast("long").as("t9"))
      // The LM is charset³-bounded for THIS corpus but corpus-derived
      // — on a real multilingual (CJK) 100 TB corpus the (lang, tri)
      // domain outgrows any broadcast. Row-guarded hint: the model is
      // snapshot + counted, broadcast only under 4M rows, shuffle join
      // on (lang, tri) above (r18 — the r17 verdict's #1 task; plain
      // AQE was measured 1.6x slower here because g's map-side shuffle
      // write happens before AQE can convert the join).
      val dm = g.join(Q.sizedBroadcast(term, 4000000L), Seq("lang", "tri"))
        .groupBy("doc_id", "lang")
        .agg(sum(col("tf") * col("t9")).as("lp9"), sum("tf").as("n"))
        .select(col("doc_id"), col("lang"),
          floor(col("lp9").cast("double") / (col("n") * lit(1e9)) * 1e4 + 0.5)
            .cast("long").as("m4"))
        .transform(Q.snapshot)
      val cw = dm.groupBy("lang", "m4").agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum("cnt").over(
          Window.partitionBy("lang").orderBy("m4")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("nl", sum("cnt").over(Window.partitionBy("lang")))
      val cuts = cw.groupBy("lang")
        .agg(min(when(col("cum") * 3 >= col("nl"), col("m4"))).as("t1"),
          min(when(col("cum") * 3 >= lit(2) * col("nl"), col("m4"))).as("t2"))
      dm.join(broadcast(cuts), "lang")
        .select(col("lang"),
          when(col("m4") <= col("t1"), "tail")
            .when(col("m4") <= col("t2"), "middle")
            .otherwise("head").as("bucket"),
          col("m4"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"),
          Q.r6(sum("m4").cast("double") / (count(lit(1)) * lit(1e4))).as("mean_lp"))
        .orderBy("lang", "bucket")
    },

    // Compaction plan over the per-source shard layout (round 14): the
    // lakehouse-maintenance readout behind OPTIMIZE/rewrite jobs —
    // given the 64-shard layout q_shard_skew monitors, group each
    // source's shards (in shard order) into next-fit output files cut
    // at a 32 KiB target, and report every planned file's input count,
    // bytes, and fill ratio. The next-fit cut is ONE cumulative window
    // per source (bin = start-offset ÷ target, exact int64) — the
    // sequential-looking bin assignment never leaves SQL. Scale: the
    // shard frame is ≤ |sources|×64 rows regardless of corpus size;
    // the corpus collapses onto it in one map-side agg.
    Q("q_compaction_plan",
      s"""WITH f AS (SELECT source, doc_id % 64 AS shard,
         |                  CAST(sum(n_chars) AS BIGINT) AS bytes
         |           FROM documents GROUP BY 1, 2),
         |c AS (SELECT source, shard, bytes,
         |             CAST(sum(bytes) OVER (PARTITION BY source ORDER BY shard
         |               ROWS UNBOUNDED PRECEDING) - bytes AS BIGINT) AS start_off
         |      FROM f),
         |b AS (SELECT source, CAST(start_off // 32768 AS BIGINT) AS bin,
         |             shard, bytes FROM c)
         |SELECT source, bin, CAST(count(*) AS BIGINT) AS n_inputs,
         |       CAST(sum(bytes) AS BIGINT) AS bytes,
         |       ${Q.sqlR6("CAST(sum(bytes) AS DOUBLE) / 32768")} AS fill
         |FROM b GROUP BY 1, 2
         |ORDER BY source, bin""".stripMargin) { (s, d) =>
      compactionOf(shardBytes(Tables.load(s, d, "documents")))
    },

    // LSH-candidate VERIFICATION by full-text edit distance (round
    // 16): the step a production dedup pipeline runs between pair
    // discovery (q_minhash_lsh) and the keep/drop decision — banding
    // admits false positives by construction, so every candidate pair
    // is re-scored with the exact levenshtein distance over the full
    // text, normalized to edit similarity 1 − d/max(len). The verified
    // flag is the cross-multiplied integer comparison 5·d ≤ max(len)
    // (sim ≥ 0.8) — no float decides it. Distance itself is an exact
    // integer in both engines (same Wagner–Fischer semantics). Per-pair
    // cost is len² on the BOUNDED candidate set — the expensive exact
    // check runs on ~|corpus|·avg_band_collisions pairs, never
    // all-pairs; that asymmetry is the whole point of LSH.
    Q("q_dedup_verify",
      "WITH " + graft.ops.TextPipeline.LshPairCtes + s""",
        |t AS (SELECT doc_id, text, CAST(n_chars AS BIGINT) AS n_chars FROM documents),
        |v AS (SELECT c.d1, c.d2,
        |             CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS dist,
        |             greatest(ta.n_chars, tb.n_chars) AS mx
        |      FROM cands c
        |      JOIN t ta ON ta.doc_id = c.d1
        |      JOIN t tb ON tb.doc_id = c.d2)
        |SELECT d1, d2, dist,
        |       CASE WHEN mx > 0 THEN ${Q.sqlR4("1.0 - CAST(dist AS DOUBLE) / mx")}
        |       END AS edit_sim,
        |       CASE WHEN 5 * dist <= mx THEN 1 ELSE 0 END AS verified
        |FROM v
        |ORDER BY d1, d2""".stripMargin) { (s, d) =>
      val t = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"), col("n_chars").cast("long").as("n_chars"))
      val ta = t.select(col("doc_id").as("d1"), col("text").as("t1"),
        col("n_chars").as("len1"))
      val tb = t.select(col("doc_id").as("d2"), col("text").as("t2"),
        col("n_chars").as("len2"))
      graft.ops.TextPipeline.lshCandidatePairs(s, d)
        .join(ta, "d1").join(tb, "d2")
        .withColumn("dist", levenshtein(col("t1"), col("t2")).cast("long"))
        .withColumn("mx", greatest(col("len1"), col("len2")))
        .select(col("d1"), col("d2"), col("dist"),
          // mx > 0 guard (r17, ADVICE): a pair of two empty documents
          // would divide 0/0 — NULL identically in both engines.
          when(col("mx") > 0,
            Q.r4(lit(1.0) - col("dist").cast("double") / col("mx"))).as("edit_sim"),
          when(lit(5) * col("dist") <= col("mx"), 1).otherwise(0).as("verified"))
        .orderBy("d1", "d2")
    },

    // BLEU-2 similarity of LSH candidate pairs (round 16): the
    // MT-style n-gram precision readout over the SAME bounded
    // candidate set — clipped unigram/bigram precision of the
    // higher-id doc against the lower-id one, brevity penalty, and
    // BLEU-2 = BP·√(p1·p2). Complements q_dedup_verify's edit view:
    // BLEU sees bag-of-ngram overlap (reordering-tolerant), edit
    // distance sees alignment. Clip sums are exact int64 Σmin(c_cand,
    // c_ref); the only floats are the two precisions, one exp() and
    // one sqrt — a single mirrored tree. Per-pair cost is the gram
    // join on the bounded candidate set.
    Q("q_bleu_pairs",
      "WITH " + graft.ops.TextPipeline.LshPairCtes + s""",
        |wd AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |u AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
        |      FROM (SELECT doc_id, unnest(words) AS w FROM wd) GROUP BY 1, 2),
        |ul AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM u GROUP BY 1),
        |b2 AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
        |       FROM (SELECT doc_id,
        |                    unnest(list_transform(range(1, len(words)),
        |                           i -> words[i] || ' ' || words[i+1])) AS g
        |             FROM wd WHERE len(words) >= 2) GROUP BY 1, 2),
        |bl AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM b2 GROUP BY 1),
        |m1 AS (SELECT c.d1, c.d2, CAST(sum(least(a.c, b.c)) AS BIGINT) AS m
        |       FROM cands c
        |       JOIN u a ON a.doc_id = c.d2
        |       JOIN u b ON b.doc_id = c.d1 AND b.w = a.w
        |       GROUP BY 1, 2),
        |m2 AS (SELECT c.d1, c.d2, CAST(sum(least(a.c, b.c)) AS BIGINT) AS m
        |       FROM cands c
        |       JOIN b2 a ON a.doc_id = c.d2
        |       JOIN b2 b ON b.doc_id = c.d1 AND b.g = a.g
        |       GROUP BY 1, 2),
        |f AS (SELECT c.d1, c.d2,
        |             COALESCE(m1.m, 0) AS m1, COALESCE(m2.m, 0) AS m2,
        |             ulr.n AS lr, ulc.n AS lc, blc.n AS bc
        |      FROM cands c
        |      JOIN ul ulr ON ulr.doc_id = c.d1
        |      JOIN ul ulc ON ulc.doc_id = c.d2
        |      JOIN bl blc ON blc.doc_id = c.d2
        |      LEFT JOIN m1 ON m1.d1 = c.d1 AND m1.d2 = c.d2
        |      LEFT JOIN m2 ON m2.d1 = c.d1 AND m2.d2 = c.d2)
        |SELECT d1, d2,
        |       ${Q.sqlR6("CAST(m1 AS DOUBLE) / lc")} AS p1_uni,
        |       ${Q.sqlR6("CAST(m2 AS DOUBLE) / bc")} AS p2_bi,
        |       ${Q.sqlR6("CASE WHEN lc > lr THEN 1.0 " +
                "ELSE exp(1.0 - CAST(lr AS DOUBLE) / lc) END")} AS brevity,
        |       CASE WHEN m1 > 0 AND m2 > 0 THEN
        |         ${Q.sqlR6("(CASE WHEN lc > lr THEN 1.0 " +
                  "ELSE exp(1.0 - CAST(lr AS DOUBLE) / lc) END) * " +
                  "sqrt(CAST(m1 AS DOUBLE) / lc * (CAST(m2 AS DOUBLE) / bc))")}
        |       ELSE 0.0 END AS bleu2
        |FROM f
        |ORDER BY d1, d2""".stripMargin) { (s, d) =>
      val wd = Tables.load(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("words"))
      val u = wd.select(col("doc_id"), explode(col("words")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      val ul = u.groupBy("doc_id").agg(sum("c").as("n"))
      val b2 = wd.filter(size(col("words")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(words) - 2), i -> concat(words[i], ' ', words[i+1]))"))
          .as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      val bl = b2.groupBy("doc_id").agg(sum("c").as("n"))
      val cands = Q.snapshot(graft.ops.TextPipeline.lshCandidatePairs(s, d))
      def clip(cnt: org.apache.spark.sql.DataFrame, key: String) = {
        val a = cnt.select(col("doc_id").as("cd2"), col(key).as("ka"), col("c").as("ca"))
        val b = cnt.select(col("doc_id").as("cd1"), col(key).as("kb"), col("c").as("cb"))
        cands.join(a, col("cd2") === col("d2"))
          .join(b, col("cd1") === col("d1") && col("kb") === col("ka"))
          .groupBy("d1", "d2").agg(sum(least(col("ca"), col("cb"))).as("m"))
      }
      val m1 = clip(u, "w").withColumnRenamed("m", "m1")
      val m2 = clip(b2, "g").withColumnRenamed("m", "m2")
      val f = cands
        .join(ul.select(col("doc_id").as("r1"), col("n").as("lr")), col("r1") === col("d1"))
        .join(ul.select(col("doc_id").as("r2"), col("n").as("lc")), col("r2") === col("d2"))
        .join(bl.select(col("doc_id").as("r3"), col("n").as("bc")), col("r3") === col("d2"))
        .join(m1, Seq("d1", "d2"), "left")
        .join(m2, Seq("d1", "d2"), "left")
        .select(col("d1"), col("d2"),
          coalesce(col("m1"), lit(0L)).as("m1"), coalesce(col("m2"), lit(0L)).as("m2"),
          col("lr"), col("lc"), col("bc"))
      val bp = when(col("lc") > col("lr"), lit(1.0))
        .otherwise(exp(lit(1.0) - col("lr").cast("double") / col("lc")))
      f.select(col("d1"), col("d2"),
          Q.r6(col("m1").cast("double") / col("lc")).as("p1_uni"),
          Q.r6(col("m2").cast("double") / col("bc")).as("p2_bi"),
          Q.r6(bp).as("brevity"),
          when(col("m1") > 0 && col("m2") > 0,
            Q.r6(bp * sqrt(col("m1").cast("double") / col("lc") *
              (col("m2").cast("double") / col("bc")))))
            .otherwise(lit(0.0)).as("bleu2"))
        .orderBy("d1", "d2")
    },

    // ROUGE-1/2 on the LSH candidate pairs (round 18): the RECALL
    // side of the pair-similarity family — q_bleu_pairs reads how much
    // of the CANDIDATE is supported by the reference (precision +
    // brevity), this reads how much of the REFERENCE the candidate
    // covers (the summarization/coverage direction a dedup adjudicator
    // or distillation-eval pass reads), plus the harmonic F1 that a
    // reranker keys on. Same clipped-count machinery over the SAME
    // LshPairCtes candidate frame (no new pair generation — the
    // blocked-pairs discipline), one extra reference-side bigram
    // total; exact int64 counts, four r6 readouts.
    Q("q_rouge_pairs",
      "WITH " + graft.ops.TextPipeline.LshPairCtes + s""",
        |wd AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |u AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
        |      FROM (SELECT doc_id, unnest(words) AS w FROM wd) GROUP BY 1, 2),
        |ul AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM u GROUP BY 1),
        |b2 AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
        |       FROM (SELECT doc_id,
        |                    unnest(list_transform(range(1, len(words)),
        |                           i -> words[i] || ' ' || words[i+1])) AS g
        |             FROM wd WHERE len(words) >= 2) GROUP BY 1, 2),
        |bl AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM b2 GROUP BY 1),
        |m1 AS (SELECT c.d1, c.d2, CAST(sum(least(a.c, b.c)) AS BIGINT) AS m
        |       FROM cands c
        |       JOIN u a ON a.doc_id = c.d2
        |       JOIN u b ON b.doc_id = c.d1 AND b.w = a.w
        |       GROUP BY 1, 2),
        |m2 AS (SELECT c.d1, c.d2, CAST(sum(least(a.c, b.c)) AS BIGINT) AS m
        |       FROM cands c
        |       JOIN b2 a ON a.doc_id = c.d2
        |       JOIN b2 b ON b.doc_id = c.d1 AND b.g = a.g
        |       GROUP BY 1, 2),
        |f AS (SELECT c.d1, c.d2,
        |             COALESCE(m1.m, 0) AS m1, COALESCE(m2.m, 0) AS m2,
        |             ulr.n AS lr, ulc.n AS lc, blr.n AS br, blc.n AS bc
        |      FROM cands c
        |      JOIN ul ulr ON ulr.doc_id = c.d1
        |      JOIN ul ulc ON ulc.doc_id = c.d2
        |      JOIN bl blr ON blr.doc_id = c.d1
        |      JOIN bl blc ON blc.doc_id = c.d2
        |      LEFT JOIN m1 ON m1.d1 = c.d1 AND m1.d2 = c.d2
        |      LEFT JOIN m2 ON m2.d1 = c.d1 AND m2.d2 = c.d2)
        |SELECT d1, d2,
        |       ${Q.sqlR6("CAST(m1 AS DOUBLE) / lr")} AS r1_recall,
        |       ${Q.sqlR6("CAST(m2 AS DOUBLE) / br")} AS r2_recall,
        |       ${Q.sqlR6("2.0 * m1 / (lr + lc)")} AS r1_f,
        |       ${Q.sqlR6("2.0 * m2 / (br + bc)")} AS r2_f
        |FROM f
        |ORDER BY d1, d2""".stripMargin) { (s, d) =>
      val wd = Tables.load(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("words"))
      val u = wd.select(col("doc_id"), explode(col("words")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      val ul = u.groupBy("doc_id").agg(sum("c").as("n"))
      val b2 = wd.filter(size(col("words")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(words) - 2), i -> concat(words[i], ' ', words[i+1]))"))
          .as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      val bl = b2.groupBy("doc_id").agg(sum("c").as("n"))
      val cands = Q.snapshot(graft.ops.TextPipeline.lshCandidatePairs(s, d))
      def clip(cnt: org.apache.spark.sql.DataFrame, key: String) = {
        val a = cnt.select(col("doc_id").as("cd2"), col(key).as("ka"), col("c").as("ca"))
        val b = cnt.select(col("doc_id").as("cd1"), col(key).as("kb"), col("c").as("cb"))
        cands.join(a, col("cd2") === col("d2"))
          .join(b, col("cd1") === col("d1") && col("kb") === col("ka"))
          .groupBy("d1", "d2").agg(sum(least(col("ca"), col("cb"))).as("m"))
      }
      val m1 = clip(u, "w").withColumnRenamed("m", "m1")
      val m2 = clip(b2, "g").withColumnRenamed("m", "m2")
      cands
        .join(ul.select(col("doc_id").as("r1"), col("n").as("lr")), col("r1") === col("d1"))
        .join(ul.select(col("doc_id").as("r2"), col("n").as("lc")), col("r2") === col("d2"))
        .join(bl.select(col("doc_id").as("r3"), col("n").as("br")), col("r3") === col("d1"))
        .join(bl.select(col("doc_id").as("r4"), col("n").as("bc")), col("r4") === col("d2"))
        .join(m1, Seq("d1", "d2"), "left")
        .join(m2, Seq("d1", "d2"), "left")
        .select(col("d1"), col("d2"),
          coalesce(col("m1"), lit(0L)).as("m1"), coalesce(col("m2"), lit(0L)).as("m2"),
          col("lr"), col("lc"), col("br"), col("bc"))
        .select(col("d1"), col("d2"),
          Q.r6(col("m1").cast("double") / col("lr")).as("r1_recall"),
          Q.r6(col("m2").cast("double") / col("br")).as("r2_recall"),
          Q.r6(lit(2.0) * col("m1") / (col("lr") + col("lc"))).as("r1_f"),
          Q.r6(lit(2.0) * col("m2") / (col("br") + col("bc"))).as("r2_f"))
        .orderBy("d1", "d2")
    },

    // Fellegi–Sunter record-linkage weights (round 16): the
    // probabilistic-linkage model behind every entity-resolution
    // pipeline, fitted on the LSH candidate pairs — match proxy =
    // identical text digest (the planted exact duplicates), field
    // comparisons = source feed, length band (n_chars/50), 12-char
    // prefix. m = P(agree|match) and u = P(agree|non-match) with
    // +1/+2 Laplace smoothing (keeps every ratio finite and inside
    // (0,1)), agreement weight ln(m/u), disagreement weight
    // ln((1−m)/(1−u)) — the per-field evidence a scored linker sums.
    // Everything reduces to SIX integer counts per field over the
    // bounded candidate set; the weights are one mirrored ln tree on
    // a 3-row readout.
    Q("q_fellegi_sunter",
      "WITH " + graft.ops.TextPipeline.LshPairCtes + s""",
        |at AS (SELECT doc_id, source, n_chars // 50 AS lb,
        |              substring(text, 1, 12) AS pre, md5(text) AS h
        |       FROM documents),
        |pr AS (SELECT c.d1, c.d2,
        |              CASE WHEN a1.source = a2.source THEN 1 ELSE 0 END AS f_source,
        |              CASE WHEN a1.lb = a2.lb THEN 1 ELSE 0 END AS f_len,
        |              CASE WHEN a1.pre = a2.pre THEN 1 ELSE 0 END AS f_pre,
        |              CASE WHEN a1.h = a2.h THEN 1 ELSE 0 END AS im
        |       FROM cands c
        |       JOIN at a1 ON a1.doc_id = c.d1
        |       JOIN at a2 ON a2.doc_id = c.d2),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(im) AS BIGINT) AS nm,
        |             CAST(sum(CASE WHEN im = 1 THEN f_source ELSE 0 END) AS BIGINT) AS am_source,
        |             CAST(sum(CASE WHEN im = 0 THEN f_source ELSE 0 END) AS BIGINT) AS au_source,
        |             CAST(sum(CASE WHEN im = 1 THEN f_len ELSE 0 END) AS BIGINT) AS am_len,
        |             CAST(sum(CASE WHEN im = 0 THEN f_len ELSE 0 END) AS BIGINT) AS au_len,
        |             CAST(sum(CASE WHEN im = 1 THEN f_pre ELSE 0 END) AS BIGINT) AS am_pre,
        |             CAST(sum(CASE WHEN im = 0 THEN f_pre ELSE 0 END) AS BIGINT) AS au_pre
        |      FROM pr),
        |fx AS (SELECT 'len_band' AS field, n, nm, am_len AS am, au_len AS au FROM g
        |       UNION ALL
        |       SELECT 'prefix12', n, nm, am_pre, au_pre FROM g
        |       UNION ALL
        |       SELECT 'source', n, nm, am_source, au_source FROM g),
        |wt AS (SELECT field, n, nm, am, au,
        |              CAST(am + 1 AS DOUBLE) / (nm + 2) AS m,
        |              CAST(au + 1 AS DOUBLE) / (n - nm + 2) AS u
        |       FROM fx)
        |SELECT field, n AS n_pairs, nm AS n_match,
        |       am AS n_agree_match, au AS n_agree_nonmatch,
        |       ${Q.sqlR6("m")} AS m_prob, ${Q.sqlR6("u")} AS u_prob,
        |       ${Q.sqlR6("ln(m / u)")} AS w_agree,
        |       ${Q.sqlR6("ln((1.0 - m) / (1.0 - u))")} AS w_disagree
        |FROM wt
        |ORDER BY field""".stripMargin) { (s, d) =>
      val at = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"),
          (col("n_chars") / 50).cast("long").as("lb"),
          substring(col("text"), 1, 12).as("pre"),
          md5(col("text").cast("binary")).as("h"))
      val a1 = at.select(col("doc_id").as("d1"), col("source").as("s1"),
        col("lb").as("lb1"), col("pre").as("p1"), col("h").as("h1"))
      val a2 = at.select(col("doc_id").as("d2"), col("source").as("s2"),
        col("lb").as("lb2"), col("pre").as("p2"), col("h").as("h2"))
      val pr = graft.ops.TextPipeline.lshCandidatePairs(s, d)
        .join(a1, "d1").join(a2, "d2")
        .select(
          when(col("s1") === col("s2"), 1L).otherwise(0L).as("f_source"),
          when(col("lb1") === col("lb2"), 1L).otherwise(0L).as("f_len"),
          when(col("p1") === col("p2"), 1L).otherwise(0L).as("f_pre"),
          when(col("h1") === col("h2"), 1L).otherwise(0L).as("im"))
      val g = pr.agg(count(lit(1)).as("n"), sum("im").as("nm"),
        sum(when(col("im") === 1, col("f_source")).otherwise(0L)).as("am_source"),
        sum(when(col("im") === 0, col("f_source")).otherwise(0L)).as("au_source"),
        sum(when(col("im") === 1, col("f_len")).otherwise(0L)).as("am_len"),
        sum(when(col("im") === 0, col("f_len")).otherwise(0L)).as("au_len"),
        sum(when(col("im") === 1, col("f_pre")).otherwise(0L)).as("am_pre"),
        sum(when(col("im") === 0, col("f_pre")).otherwise(0L)).as("au_pre"))
      val fx = g.select(explode(array(
        struct(lit("len_band").as("field"), col("n"), col("nm"),
          col("am_len").as("am"), col("au_len").as("au")),
        struct(lit("prefix12").as("field"), col("n"), col("nm"),
          col("am_pre").as("am"), col("au_pre").as("au")),
        struct(lit("source").as("field"), col("n"), col("nm"),
          col("am_source").as("am"), col("au_source").as("au")))).as("r"))
        .select(col("r.field").as("field"), col("r.n").as("n"), col("r.nm").as("nm"),
          col("r.am").as("am"), col("r.au").as("au"))
      val w = fx
        .withColumn("m", (col("am") + 1).cast("double") / (col("nm") + 2))
        .withColumn("u", (col("au") + 1).cast("double") / (col("n") - col("nm") + 2))
      w.select(col("field"), col("n").as("n_pairs"), col("nm").as("n_match"),
          col("am").as("n_agree_match"), col("au").as("n_agree_nonmatch"),
          Q.r6(col("m")).as("m_prob"), Q.r6(col("u")).as("u_prob"),
          Q.r6(log(col("m") / col("u"))).as("w_agree"),
          Q.r6(log((lit(1.0) - col("m")) / (lit(1.0) - col("u")))).as("w_disagree"))
        .orderBy("field")
    }
  )

  /** The per-source shard byte grid — ONE home for batch
    * q_compaction_plan and the streaming s_compaction_plan state:
    * ≤|sources|×64 rows, a plain mergeable sum. */
  private[graft] def shardBytes(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.groupBy(col("source"), (col("doc_id") % 64).as("shard"))
      .agg(sum("n_chars").as("bytes"))

  /** The next-fit compaction fold over a [[shardBytes]] grid — ONE
    * home shared by batch q_compaction_plan and the s_compaction_plan
    * streaming read-time view (bin boundaries re-price as bytes grow,
    * so the PLAN is not mergeable — the byte grid is). */
  private[graft] def compactionOf(gridIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("source").orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gridIn.withColumn("start_off", sum("bytes").over(w) - col("bytes"))
      .withColumn("bin", floor(col("start_off") / 32768.0).cast("long"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_inputs"), sum("bytes").as("bytes"))
      .select(col("source"), col("bin"), col("n_inputs"), col("bytes"),
        Q.r6(col("bytes").cast("double") / 32768).as("fill"))
      .orderBy("source", "bin")
  }

  /** The cascade cell grid — ONE home for the projection + groupBy
    * batch q_filter_cascade and the streaming s_filter_cascade state
    * share: three in-row flags plus the content hash, collapsed to a
    * (h, flags) → (n, min_doc) grid by one map-side-partial agg. The
    * min_doc is carried because identical TEXT does not imply an
    * identical RECORDED lang — a content group can span flag combos,
    * and the one keeper (the group-wide min doc_id) must land in the
    * right cell. Works on a batch table and a streaming DataFrame
    * alike (a plain mergeable aggregate). */
  private[graft] def cascadeCells(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs
      .withColumn("words", split(col("text"), " "))
      .select(col("doc_id"), md5(col("text")).as("h"),
        when(TextPipeline.predLangCol === col("lang"), 1L).otherwise(0L).as("lang_ok"),
        when(col("n_chars") >= 200, 1L).otherwise(0L).as("len_ok"),
        when(size(col("words")) > 0 &&
          floor(TextPipeline.qualityOnWordsCol * 10000 + 0.5).cast("long") >= 6200,
          1L).otherwise(0L).as("quality_ok"))
      .groupBy("h", "lang_ok", "len_ok", "quality_ok")
      .agg(count(lit(1)).as("n"), min("doc_id").as("min_doc"))

  /** The cascade fold over a [[cascadeCells]] grid — ONE home shared
    * by batch q_filter_cascade and the s_filter_cascade streaming
    * read-time view. Per content hash, the subgroup holding the
    * group-wide min doc_id contributes one keeper (dup_ok = 1) and
    * n−1 dups; every other subgroup is all-dups — counts + subgroup
    * mins reproduce the batch md5-keeper window exactly, which is why
    * the grid, not any keeper table, is the mergeable state. The one
    * window here partitions by the hash over the ALREADY-COLLAPSED
    * grid (≤16 rows per hash), not the corpus. */
  private[graft] def cascadeOf(cellsIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val r = cellsIn.withColumn("rn",
      row_number().over(Window.partitionBy("h").orderBy("min_doc")))
    val g = r.groupBy("lang_ok", "len_ok", "quality_ok")
      .agg(sum(when(col("rn") === 1, 1L).otherwise(0L)).as("grps"), sum("n").as("docs"))
    // both cells of a flag combo expand IN-ROW (no union, no second
    // consumer): (dup_ok = 1, keepers) and (dup_ok = 0, dups)
    g.select(col("lang_ok"), col("len_ok"), col("quality_ok"),
        explode(array(
          struct(lit(1L).as("dup_ok"), col("grps").as("n_docs")),
          struct(lit(0L).as("dup_ok"), (col("docs") - col("grps")).as("n_docs"))))
          .as("cell"))
      .select(col("lang_ok"), col("len_ok"), col("quality_ok"),
        col("cell.dup_ok").as("dup_ok"), col("cell.n_docs").as("n_docs"))
      .filter(col("n_docs") > 0)
      .withColumn("tot", sum("n_docs").over(Window.partitionBy()))
      .select(col("lang_ok"), col("len_ok"), col("quality_ok"), col("dup_ok"),
        col("n_docs"),
        Q.r6(col("n_docs").cast("double") / col("tot")).as("share"),
        when(col("lang_ok") === 0, 1L).when(col("len_ok") === 0, 2L)
          .when(col("quality_ok") === 0, 3L).when(col("dup_ok") === 0, 4L)
          .otherwise(0L).as("removed_at_stage"))
      .orderBy("lang_ok", "len_ok", "quality_ok", "dup_ok")
  }
}
