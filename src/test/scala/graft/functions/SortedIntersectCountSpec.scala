package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedIntersectCountSpec extends SparkSpec {

  test("matches size(array_intersect) on sorted inputs, incl. edge shapes") {
    import spark.implicits._
    val df = Seq(
      (Array("a", "b", "c"), Array("b", "c", "d")),     // overlap 2
      (Array("a", "b"), Array("c", "d")),               // disjoint
      (Array[String](), Array("a")),                    // empty left
      (Array("a"), Array[String]()),                    // empty right
      (Array("a", "a", "b", "b"), Array("a", "b", "b")),// duplicate runs
      (Array("x"), Array("x"))                          // single equal
    ).toDF("a", "b")
    val got = df.selectExpr("sorted_intersect_count(a, b) AS c")
      .as[Long].collect().toSeq
    val expected = df
      .selectExpr("CAST(size(array_intersect(a, b)) AS BIGINT) AS c")
      .as[Long].collect().toSeq
    assert(got == expected && got == Seq(2L, 0L, 0L, 0L, 2L, 1L))
  }

  test("null elements are skipped, not NPE'd (divergence from array_intersect pinned)") {
    import spark.implicits._
    val df = Seq(
      (Array("a", null), Array("a")),       // null on one side
      (Array[String](null), Array[String](null)), // null-only arrays
      (Array("a", null), Array(null, "a"))  // null present on both sides
    ).toDF("a", "b")
    val got = df.selectExpr("sorted_intersect_count(a, b) AS c")
      .as[Long].collect().toSeq
    // array_intersect would count the shared null in rows 2 and 3; this
    // function counts non-null matches only (documented contract).
    assert(got == Seq(1L, 0L, 1L))
  }

  test("property: equals array_intersect on random sorted shingle-like sets") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val wordGen = Gen.oneOf("aa", "ab", "b", "ba", "cc c", "d", "é", "")
    val arrGen = Gen.listOfN(30, wordGen).map(_.distinct.sorted.toArray)
    val rows = (1 to 60).map { i =>
      (arrGen.pureApply(Gen.Parameters.default, Seed(i.toLong)),
        arrGen.pureApply(Gen.Parameters.default, Seed(1000L + i)))
    }
    val df = rows.toDF("a", "b")
    val both = df.selectExpr("sorted_intersect_count(a, b) AS got",
        "CAST(size(array_intersect(a, b)) AS BIGINT) AS want")
      .as[(Long, Long)].collect()
    both.foreach { case (g, w) => assert(g == w, s"merge $g != builtin $w") }
  }

  test("doGenCode compiles and computes (no silent interpreted fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    def arr(xs: String*) =
      ArrayData.toArrayData(xs.map(UTF8String.fromString).toArray)
    val a = BoundReference(0, ArrayType(StringType), nullable = true)
    val b = BoundReference(1, ArrayType(StringType), nullable = true)
    // generate() compiles the Java emitted by doGenCode — a codegen bug
    // fails HERE instead of silently falling back to interpreted eval.
    val proj = GenerateUnsafeProjection.generate(Seq(SortedIntersectCount(a, b)))
    assert(proj(InternalRow(arr("a", "b", "c"), arr("b", "c", "d"))).getLong(0) == 2L)
    assert(proj(InternalRow(arr(), arr("a"))).getLong(0) == 0L)
    assert(proj(InternalRow(arr("a", "a", "b"), arr("a", "b", "b"))).getLong(0) == 2L)
  }
}
