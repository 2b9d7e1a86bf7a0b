package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-document SimHash bit votes in one compiled loop (r18): input is
  * the two 32-bit halves of md5(word) (as int64), output the 64 signed
  * vote sums. Replaces 64 separate `sum(((h div w) % 2) * 2 - 1)`
  * aggregate columns — the same exact int64 votes (bit b of nibble
  * b/4, ±1), one buffer instead of 64, one pass over the word stream.
  * Bit layout mirrors ops.TextPipeline.SimhashPairCtes so the oracle
  * CTE chain cannot drift (the spec pins batch equality).
  */
final case class SimhashWord(h1: Long, h2: Long)

class SimhashVotesAgg extends Aggregator[SimhashWord, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](64)

  override def reduce(b: Array[Long], in: SimhashWord): Array[Long] = {
    // bit index b: nibble k = b/4 (1-based k+1 in the expression form),
    // bit j = b%4; nibble value = (word >> 4·(8−kk−1... identical to
    // (word div ((1 << 4·(8−kk)) · (1 << j))) % 2 for the positive
    // 32-bit halves conv() produces.
    var bit = 0
    while (bit < 64) {
      val k = bit / 4 + 1
      val j = bit % 4
      val (word, kk) = if (k <= 8) (in.h1, k) else (in.h2, k - 8)
      val weight = (1L << (4 * (8 - kk))) * (1L << j)
      b(bit) += ((word / weight) % 2) * 2 - 1
      bit += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
