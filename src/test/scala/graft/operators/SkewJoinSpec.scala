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

  test("property: salted join ≡ plain join on generated skewed data") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val bigGen = Gen.listOf(Gen.zip(Gen.oneOf(1L, 1L, 1L, 2L, 3L), Gen.choose(0, 999)))
    val smallGen = Gen.listOf(Gen.zip(Gen.choose(1L, 4L), Gen.alphaStr.map(_.take(3))))
    (1 to 5).foreach { i =>
      val big = bigGen.pureApply(Gen.Parameters.default, Seed(7L + i)).toDF("k", "v")
      val small = smallGen.pureApply(Gen.Parameters.default, Seed(77L + i))
        .distinct.toDF("k", "tag")
      val salts = 1 + i
      val plain = big.join(small, "k").collect().toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      val salted = SkewJoin.saltedInnerJoin(big, small, "k", salts).collect().toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(salted == plain, s"mismatch at salts=$salts")
    }
  }

  test("rel_salted_join (query form) equals the plain unsalted rollup") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("rel_salted_join")(spark, sf0001)
    val plain = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001), $"o_custkey" === $"c_custkey")
      .join(Tables.nation(spark, sf0001), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy("n_name")
    assert(got.collect().toSeq == plain.collect().toSeq)
  }

  test("AQE runtime skew split fires and is semantics-preserving (rel_skew_aqe_join)") {
    import spark.implicits._
    // aqeSkewJoinDemo HARD-asserts isSkewJoin=true appears in the
    // executed plan, so the query returning at all witnesses that the
    // runtime split actually fired; the compare below then proves the
    // rewrite changed nothing — the same two-sided check the driver
    // oracle runs at sf0.01.
    val got = graft.SparkEntry.queries("rel_skew_aqe_join")(spark, sf0001)
    val plain = Tables.lineitem(spark, sf0001)
      .select(
        when($"l_orderkey" % 3 === 0, lit(1L)).otherwise($"l_suppkey").as("skey"),
        $"l_extendedprice".cast("decimal(18,2)").as("price"))
      .join(Tables.supplier(spark, sf0001)
        .join(Tables.nation(spark, sf0001), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey".as("skey"), $"n_name"), "skey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_items"), sum($"price").cast("double").as("revenue"))
      .orderBy("n_name")
    assert(got.collect().toSeq == plain.collect().toSeq)
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
