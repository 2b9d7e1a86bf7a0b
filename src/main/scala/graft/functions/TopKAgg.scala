package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Aggregation-pushed top-k: a bounded "heap" (k-element sorted list)
  * as the aggregation buffer, so PARTIAL aggregation already discards
  * everything below each partition's k-th element and the shuffle
  * carries ≤ k rows per (group × partition) — the operator shape the
  * window formulation (`row_number() OVER (...) <= k`) cannot reach,
  * since a window must first shuffle and sort EVERY row of every group.
  * At 100 TB with hot groups that difference is the job: shuffle volume
  * k·groups·partitions vs the full input.
  *
  * Ordering: (score DESC, id ASC) — the same total tie-break the window
  * twin and the SQL oracle use, so all three agree exactly
  * (equivalence asserted in TwinAndPropertySpec, hash-checked by the
  * driver via q_topk_agg).
  *
  * The buffer is a plain sorted Vector, not a binary heap: k is small
  * (single digits), insertion is O(k), and a flat product type keeps
  * the Encoder columnar-friendly — no kryo blobs.
  */
final case class Scored(score: Double, id: Long)

/** Shared bounded-buffer insertion over any element type: the ordering
  * predicate is the only thing the long- and string-keyed variants
  * differ in, so the buffer mechanics live here once. */
private[functions] object TopKBuffer {
  def reduce[T](k: Int, better: (T, T) => Boolean)(buf: Seq[T], in: T): Seq[T] = {
    // below the current k-th element: drop without touching the buffer
    if (buf.length >= k && !better(in, buf.last)) buf
    else {
      val i = buf.indexWhere(e => better(in, e)) match {
        case -1 => buf.length
        case n => n
      }
      val grown = (buf.take(i) :+ in) ++ buf.drop(i)
      if (grown.length > k) grown.take(k) else grown
    }
  }
}

class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0)

  // Double.compare, not `>`: under IEEE `>` a NaN score is never
  // "better" than anything AND nothing beats it once buffered, so a
  // NaN-last buffer silently rejects real high scores; Double.compare's
  // total order (NaN greatest) matches Spark's ORDER BY score DESC
  // semantics in the window twin (r12 review).
  private def better(a: Scored, b: Scored): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] =
    TopKBuffer.reduce(k, better)(buf, in)

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Seq[Scored]): Seq[Scored] = buf

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

/** String-keyed sibling of [[TopKAgg]] for text surfaces (top bigrams /
  * top words per language): score DESC, id ASC with the tie-break on
  * the STRING key — the exact (n DESC, bigram) / (c DESC, w) ordering
  * the former `row_number() OVER (PARTITION BY lang …)` formulations
  * used, so the SQL oracles are unchanged. The win is the plan shape:
  * the window had to shuffle-and-sort EVERY (lang, term) count row into
  * #languages partitions — a bounded-parallelism sort over a
  * content-growing input — while this Aggregator partial-aggregates, so
  * the lang-keyed shuffle carries ≤ k·langs·partitions rows no matter
  * how diverse the corpus gets. */
final case class ScoredStr(score: Double, id: String)

class TopKStrAgg(k: Int) extends Aggregator[ScoredStr, Seq[ScoredStr], Seq[ScoredStr]] {
  require(k > 0)

  // same Double.compare total order as TopKAgg; the string tie-break
  // compares UTF-8 BYTES (unsigned) — Java String `<` is UTF-16
  // code-unit order, which disagrees with Spark/DuckDB binary string
  // order for supplementary characters (r12 review).
  // allocation-free code-point walk (UTF-8 byte order ≡ code-point
  // order): the first byte-array formulation allocated two arrays per
  // comparison inside the O(k) insertion scan and read 1.8x on
  // q_ngram_freq's vocab-sized insert stream
  private def utf8Less(a: String, b: String): Boolean = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    (a.length - i) < (b.length - j)
  }

  private def better(a: ScoredStr, b: ScoredStr): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && utf8Less(a.id, b.id))
  }

  override def zero: Seq[ScoredStr] = Vector.empty

  override def reduce(buf: Seq[ScoredStr], in: ScoredStr): Seq[ScoredStr] =
    TopKBuffer.reduce(k, better)(buf, in)

  override def merge(a: Seq[ScoredStr], b: Seq[ScoredStr]): Seq[ScoredStr] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Seq[ScoredStr]): Seq[ScoredStr] = buf

  override def bufferEncoder: Encoder[Seq[ScoredStr]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredStr]]()
  override def outputEncoder: Encoder[Seq[ScoredStr]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredStr]]()
}
