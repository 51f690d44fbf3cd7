package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction,
  ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog's V2 FUNCTION surface (r18) — one function, `bucket`,
  * and it exists for STORAGE-PARTITIONED JOINS over bucket-transform
  * layouts: when a scan reports `KeyGroupedPartitioning(bucket(n,
  * col))`, Spark resolves the named function THROUGH THE RELATION'S
  * CATALOG to (a) type-check the transform against the scan output,
  * (b) prove two sides' partitionings compatible (same canonical
  * name, same bucket count), and (c) evaluate the hash when it must
  * shuffle a non-bucketed side to match
  * (`spark.sql.sources.v2.bucketing.shuffle.enabled`). The
  * implementation is EXACTLY [[graft.operators.PartTransform
  * .bucketOf]] over the canonical string rendering — the one JVM
  * function the writer, the scan's pruning, and now the planner all
  * share, so a co-located plan can never disagree with the bytes on
  * disk. The canonical name embeds the VALUE type: bucketing a BIGINT
  * and bucketing its STRING rendering hash identically here, but two
  * differently-typed layouts must still never claim compatibility.
  */
object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(n, col): murmur3(canonical string of col, seed 42) mod n — " +
      "the graft-table bucket-transform hash (storage-partitioned joins)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
        inputType.fields(0).dataType == IntegerType,
      s"bucket: expected (INT numBuckets, value), got $inputType")
    val valueType = inputType.fields(1).dataType
    require(Set[DataType](LongType, IntegerType, StringType)(valueType),
      s"bucket: value must be BIGINT/INT/STRING, got ${valueType.sql}")
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] =
        Array(IntegerType, valueType)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String =
        s"graft.bucket(${valueType.catalogString})"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer = {
        val n = input.getInt(0)
        val canonical = valueType match {
          case LongType => String.valueOf(input.getLong(1))
          case IntegerType => String.valueOf(input.getInt(1).toLong)
          case _ => input.getUTF8String(1).toString
        }
        Integer.valueOf(graft.operators.PartTransform.bucketOf(canonical, n))
      }
    }
  }
}
