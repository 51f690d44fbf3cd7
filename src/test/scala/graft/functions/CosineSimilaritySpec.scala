package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {

  test("cosine_sim matches a hand-computed value (SQL + call_function)") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0)), // orthogonal -> 0
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)), // identical -> 1
      (Array(1.0, 0.0, 0.0), Array(-1.0, 0.0, 0.0)), // opposite -> -1
      (Array(0.0, 0.0, 0.0), Array(1.0, 2.0, 3.0))  // zero norm -> 0
    ).toDF("a", "b")
    val got = df.select(call_function("cosine_sim", col("a"), col("b")))
      .as[Double].collect().toSeq
    assert(got.map(math.round(_).toDouble) == Seq(0.0, 1.0, -1.0, 0.0))
    val viaSql = df.selectExpr("cosine_sim(a, b) AS s").as[Double].collect()
    assert(viaSql.toSeq == got)
  }

  test("doGenCode compiles and computes (no silent interpreted fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val a = BoundReference(0, ArrayType(DoubleType), nullable = true)
    val b = BoundReference(1, ArrayType(DoubleType), nullable = true)
    // generate() compiles the Java emitted by doGenCode — a codegen bug
    // fails HERE instead of silently falling back to interpreted eval.
    val proj = GenerateUnsafeProjection.generate(Seq(CosineSimilarity(a, b)))
    val row = InternalRow(
      ArrayData.toArrayData(Array(3.0, 4.0)),
      ArrayData.toArrayData(Array(3.0, 4.0)))
    assert(math.abs(proj(row).getDouble(0) - 1.0) < 1e-15)
    val orth = InternalRow(
      ArrayData.toArrayData(Array(1.0, 0.0)),
      ArrayData.toArrayData(Array(0.0, 1.0)))
    assert(proj(orth).getDouble(0) == 0.0)
  }

  test("cosine_sim widens array<float> inputs and agrees with the HOF formula") {
    import spark.implicits._
    val emb = graft.sources.Tables.embeddings(spark, sf0001).limit(50)
    val pairs = emb.select($"vec_id".as("l_id"), $"embedding".as("l_emb"))
      .crossJoin(emb.select($"vec_id".as("r_id"), $"embedding".as("r_emb")))
      .filter($"l_id" < $"r_id")
    val both = pairs.selectExpr(
      "cosine_sim(l_emb, r_emb) AS fused",
      """aggregate(zip_with(cast(l_emb AS array<double>), cast(r_emb AS array<double>), (x, y) -> x * y), 0D, (s, v) -> s + v)
         / (sqrt(aggregate(transform(cast(l_emb AS array<double>), x -> x * x), 0D, (s, v) -> s + v))
            * sqrt(aggregate(transform(cast(r_emb AS array<double>), x -> x * x), 0D, (s, v) -> s + v))) AS hof""")
    val rows = both.as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (fused, hof) =>
      assert(math.abs(fused - hof) < 1e-12, s"fused=$fused hof=$hof")
    }
  }
}
