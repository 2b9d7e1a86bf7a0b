package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bloom-bitmap build as a typed Aggregator: ORs bit positions into a
  * dense `words`-long array of `wordBits`-bit words in ONE narrow
  * aggregation pass — map-side partials are a fixed `words × 8` bytes
  * per partition and merge is an elementwise OR, so the shuffle carries
  * (#partitions × bitmap size) no matter how many positions stream in.
  * This replaces the groupBy(word)+densify-join+sort_array chain
  * (3 shuffles) q_bloom_decontam first shipped with.
  *
  * OR is commutative/associative and the buffer is fixed-size, so
  * partial aggregation, AQE and retries are all safe; duplicate
  * positions are absorbed for free (no distinct pass needed).
  */
class BloomAgg(words: Int, wordBits: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  override def zero: Array[Long] = new Array[Long](words)
  override def reduce(b: Array[Long], p: Long): Array[Long] = {
    // range-check the position: a negative p would silently set an
    // ARBITRARY bit via Java's shift masking (1L << -5 == 1L << 59) —
    // bloom false positives with no signal — and an oversized p a
    // mid-job AIOOBE with a cryptic stack (r12 review)
    require(p >= 0 && p < words.toLong * wordBits,
      s"bloom bit position $p outside [0, ${words.toLong * wordBits})")
    b((p / wordBits).toInt) |= 1L << (p % wordBits).toInt
    b
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }
  override def finish(b: Array[Long]): Array[Long] = b
  // ExpressionEncoder keeps the buffer an array<bigint> column (the
  // probe side element_at()s straight into it) — no opaque binary blob
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
