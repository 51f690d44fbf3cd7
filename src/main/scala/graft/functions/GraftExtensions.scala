package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Registers the engine's native Catalyst functions on every session
  * built through [[graft.sources.GraftSession.configure]] (public
  * `spark.sql.extensions` mechanism — no internal SessionState access).
  *
  * Call sites use `functions.call_function("cosine_sim", a, b)` or SQL
  * `cosine_sim(a, b)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(
        classOf[CosineSimilarity].getName,
        null,
        "cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two numeric arrays",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_sim takes exactly 2 arguments")
        // float→double element widening is exact; casting here (instead
        // of ImplicitCastInputTypes, whose types are private[sql]) keeps
        // the expression itself on a single input type.
        val cast = children.map(c => Cast(c, ArrayType(DoubleType)))
        CosineSimilarity(cast.head, cast(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(
        classOf[SortedIntersectCount].getName,
        null,
        "sorted_intersect_count",
        "sorted_intersect_count(a, b) - set-intersection size of two SORTED string arrays",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, "sorted_intersect_count takes exactly 2 arguments")
        SortedIntersectCount(children.head, children(1))
      }))
  }
}
