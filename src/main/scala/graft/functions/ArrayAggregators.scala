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

/** MinHash signature fold: element-wise minimum. */
final class ElementwiseMin(n: Int) extends ElementwiseLongAgg(n, Long.MaxValue) {
  override protected def op(a: Long, b: Long): Long = math.min(a, b)
}

/** SimHash bit-weight fold: element-wise sum. */
final class ElementwiseSum(n: Int) extends ElementwiseLongAgg(n, 0L) {
  override protected def op(a: Long, b: Long): Long = a + b
}
