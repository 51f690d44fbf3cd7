package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `sorted_intersect_count(array<string>, array<string>) -> bigint`:
  * the size of the set intersection of two SORTED string arrays, as a
  * native codegen'd Catalyst expression.
  *
  * Motivation: the near-dup verification step scores every candidate
  * pair with `size(array_intersect(ss_a, ss_b))`, and the built-in
  * `array_intersect` builds a hash set and materializes the intersection
  * ARRAY per row — allocation and hashing in the hottest dedup loop.
  * The per-doc shingle sets are produced once (and persisted) anyway, so
  * sorting them at build turns every verification into a two-pointer
  * merge: no allocation, no hashing, each array read once, early exit at
  * either end, and the loop stays inside WholeStageCodegen.
  *
  * Semantics: equal to `size(array_intersect(a, b))` over the NON-NULL
  * elements whenever both inputs are sorted ascending (duplicates
  * tolerated — equal runs count once, matching array_intersect's set
  * semantics; null elements are skipped, where array_intersect would
  * count a null present on both sides). PRECONDITION the producer must
  * uphold: elements sorted in `array_sort`'s UTF8String binary order.
  * The function IS registered session-wide (GraftExtensions), so the
  * docs are the contract: unsorted input silently undercounts — sort
  * with `array_sort` first.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires array<string> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val xv = x.getUTF8String(i)
        val cmp = xv.compareTo(y.getUTF8String(j))
        if (cmp < 0) i += 1
        else if (cmp > 0) j += 1
        else {
          c += 1
          // skip equal runs on both sides: set semantics under duplicates
          do i += 1 while (i < nx && !x.isNullAt(i) && x.getUTF8String(i).equals(xv))
          do j += 1 while (j < ny && !y.isNullAt(j) && y.getUTF8String(j).equals(xv))
        }
      }
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val cmp = ctx.freshName("cmp")
      s"""
         |final int $nx = $x.numElements();
         |final int $ny = $y.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  if ($x.isNullAt($i)) { $i++; }
         |  else if ($y.isNullAt($j)) { $j++; }
         |  else {
         |    final org.apache.spark.unsafe.types.UTF8String $xv = $x.getUTF8String($i);
         |    final int $cmp = $xv.compareTo($y.getUTF8String($j));
         |    if ($cmp < 0) { $i++; }
         |    else if ($cmp > 0) { $j++; }
         |    else {
         |      $c++;
         |      do { $i++; } while ($i < $nx && !$x.isNullAt($i) && $x.getUTF8String($i).equals($xv));
         |      do { $j++; } while ($j < $ny && !$y.isNullAt($j) && $y.getUTF8String($j).equals($xv));
         |    }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
