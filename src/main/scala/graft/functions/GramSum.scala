package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass Gram-matrix sufficient statistics for q_embed_dim (r18):
  * per input vector x3 (the 1e-3-lattice int64 embedding), accumulate
  *  - buf[0 .. T-1]   : upper-triangle product sums Σ x3[j]·x3[k] (j ≤ k,
  *                      j-major flat order, T = d·(d+1)/2),
  *  - buf[T .. T+d-1] : per-dimension sums Σ x3[j],
  *  - buf[T+d]        : the row count n.
  *
  * This replaces a 2,080-struct interpreted lambda explode per row
  * (corpus × d²/2 rows shuffled into a (j, k) groupBy) plus two more
  * corpus passes (per-dim sums, count) over a snapshot — ONE compiled
  * multiply-add loop per row, ONE global aggregation, no snapshot. All
  * arithmetic is the same order-free exact int64 the grouped sums
  * performed, so the downstream covariance/trace math is value-identical.
  *
  * Scale shape: the buffer is d²/2+d+1 longs (~17 KB at d = 64) per
  * partial — constant in the corpus, merged pairwise; at 100 TB this is
  * the textbook map-side-collapsed Gram pass.
  */
class GramSumAgg(d: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  private val tri = d * (d + 1) / 2

  override def zero: Array[Long] = new Array[Long](tri + d + 1)

  override def reduce(b: Array[Long], x: Array[Long]): Array[Long] = {
    var idx = 0
    var j = 0
    while (j < d) {
      val xj = x(j)
      var k = j
      while (k < d) {
        b(idx) += xj * x(k)
        idx += 1
        k += 1
      }
      b(tri + j) += xj
      j += 1
    }
    b(tri + d) += 1L
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
