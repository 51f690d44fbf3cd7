package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join equals the plain join (result-set identity)") {
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_linenumber", "l_partkey")
    val part = Tables.part(spark, sf0001).select("p_partkey", "p_brand")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = li.join(part, "l_partkey")
    val salted = SkewJoin.saltedInnerJoin(li, part, "l_partkey", salts = 7)
    val key = Seq("l_partkey", "l_orderkey", "l_linenumber", "p_brand")
    assert(salted.count() == plain.count())
    assert(salted.select(key.map(col): _*).orderBy(key.map(col): _*).collect().toSeq ==
      plain.select(key.map(col): _*).orderBy(key.map(col): _*).collect().toSeq)
  }

  test("salting actually spreads a hot key over multiple partitions") {
    import spark.implicits._
    // one pathological key: 10k rows of key=1 + a tiny dim
    val big = (1 to 10000).map(i => (1L, i.toLong)).toDF("k", "payload")
    val small = Seq((1L, "hot")).toDF("k", "tag")
    val salted = SkewJoin.saltedInnerJoin(big, small, "k", salts = 8)
    assert(salted.count() == 10000L)
    // routing column must take several distinct values for the hot key
    val nSalts = big.withColumn("__salt",
        pmod(hash($"k", $"payload"), lit(8)))
      .select("__salt").distinct().count()
    assert(nSalts >= 6, s"hash routing collapsed to $nSalts salts")
  }
}
