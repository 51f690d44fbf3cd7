package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise array aggregators (SURVEY.md §4.3's one sanctioned
  * custom-stateful piece): fold `array<bigint>` rows into one array.
  *
  * Used by MinHash (element-wise MIN over permutation-hash arrays) and
  * SimHash (element-wise SUM over signed bit-weight arrays). As
  * `Aggregator`s they get Spark's partial aggregation for free — each
  * partition folds locally and only `n`-element arrays cross the
  * shuffle, unlike an explode-per-element plan that shuffles
  * `rows × n` — the property that matters at 100 TB.
  *
  * The mutable-buffer update is safe: Spark gives the aggregator
  * exclusive ownership of the buffer between `reduce`/`merge` calls.
  */
sealed abstract class ElementwiseLongAgg(n: Int, neutral: Long)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  protected def op(a: Long, b: Long): Long

  final override def zero: Array[Long] = Array.fill(n)(neutral)

  final override def reduce(buf: Array[Long], row: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n && i < row.length) { buf(i) = op(buf(i), row(i)); i += 1 }
    buf
  }

  final override def merge(x: Array[Long], y: Array[Long]): Array[Long] = reduce(x, y)

  final override def finish(r: Array[Long]): Array[Long] = r

  final override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  final override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** SimHash/centroid bit-weight fold: element-wise sum. */
final class ElementwiseSum(n: Int) extends ElementwiseLongAgg(n, 0L) {
  override protected def op(a: Long, b: Long): Long = a + b
}

/** MinHash signature from raw shingle hashes: the `n` permutation
  * functions run INSIDE the aggregator's tight JVM loop instead of a
  * per-row Catalyst lambda building an n-element array — one long per
  * row crosses into the agg, and per-partition partials mean only
  * n-long signatures cross the shuffle. Permutation i:
  * `(2i+1)·h31 + i·40503 mod p` over the 31-bit-folded input hash
  * (every intermediate far from long overflow).
  */
final class MinHashAgg(n: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  private val P = 2147483647L

  override def zero: Array[Long] = Array.fill(n)(Long.MaxValue)

  override def reduce(buf: Array[Long], rawHash: Long): Array[Long] = {
    val h31 = ((rawHash % P) + P) % P
    var i = 0
    while (i < n) {
      val v = ((2L * i + 1) * h31 + i.toLong * 40503L) % P
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** SimHash bit-weight accumulation from (tokenHash, weight) rows: the
  * 64-bit test-and-accumulate loop runs in the aggregator, so no
  * per-row 64-element array is materialized by the plan. */
final class SimHashAgg extends Aggregator[(Long, Long), Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](64)

  override def reduce(buf: Array[Long], row: (Long, Long)): Array[Long] = {
    val (h, w) = row
    var j = 0
    while (j < 64) {
      buf(j) += (if (((h >>> j) & 1L) == 1L) w else -w)
      j += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { x(j) += y(j); j += 1 }
    x
  }

  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
