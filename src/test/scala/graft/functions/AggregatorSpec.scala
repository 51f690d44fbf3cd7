package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class AggregatorSpec extends SparkSpec {

  private val P = 2147483647L
  /** The naive per-hash permutation model MinHashAgg must reproduce. */
  private def perms(raw: Long, n: Int): Seq[Long] = {
    val h31 = ((raw % P) + P) % P
    (0 until n).map(i => ((2L * i + 1) * h31 + i.toLong * 40503L) % P)
  }

  test("property: MinHashAgg signature equals the collections-model minimum") {
    import spark.implicits._
    val agg = udaf(new MinHashAgg(16))
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 3L), Gen.choose(Long.MinValue, Long.MaxValue)))
    (1 to 6).foreach { i =>
      val rows = gen.pureApply(Gen.Parameters.default, Seed(13L + i))
      val got = rows.toDF("doc", "h").groupBy($"doc").agg(agg($"h").as("sig"))
        .as[(Long, Seq[Long])].collect().toMap
      val expect = rows.groupBy(_._1).view.mapValues { hs =>
        hs.map(r => perms(r._2, 16)).transpose.map(_.min).toSeq
      }.toMap
      assert(got == expect)
    }
  }

  test("property: TopKOrderedAgg equals global sorted-take-k under any partitioning") {
    // The partial-aggregation soundness claim: merging capped partial
    // buffers (in any split, any order) must equal top-k of the whole
    // group — bounded top-k is a selection semilattice, but an
    // off-by-one in the cap or a non-total tie order would break it
    // exactly here, so exercise duplicate sort keys and tied ids.
    val k = 5
    val agg = new TopKOrderedAgg(k)
    val gen = Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("a", "b", "c", "d"), Gen.choose(0L, 20L)))
    (1 to 8).foreach { i =>
      val rows = gen.pureApply(Gen.Parameters.default, Seed(41L + i))
      val expect = rows.sorted.take(k).map(_._2)
      // split into random-size chunks, reduce each, then fold merges
      val rnd = new scala.util.Random(i)
      val chunks = rows.grouped(1 + rnd.nextInt(4)).toSeq
      val partials = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(partials).foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == expect,
        s"merge order changed the sample: ${agg.finish(merged)} vs $expect")
    }
  }

  test("TopKOrderedAgg rejects k = 0 at construction") {
    // k = 0 used to defer the failure to the first reduce call's
    // buf.last on an empty buffer — mid-task, inside an executor.
    val e = intercept[IllegalArgumentException] { new TopKOrderedAgg(0) }
    assert(e.getMessage.contains("k > 0"))
  }

  test("property: SimHashAgg sums equal the collections-model bit weights") {
    import spark.implicits._
    val agg = udaf(new SimHashAgg)
    val gen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(0L, 2L), Gen.choose(Long.MinValue, Long.MaxValue), Gen.choose(1L, 9L)))
    (1 to 6).foreach { i =>
      val rows = gen.pureApply(Gen.Parameters.default, Seed(29L + i))
      val got = rows.toDF("doc", "h", "w").groupBy($"doc").agg(agg($"h", $"w").as("sums"))
        .as[(Long, Seq[Long])].collect().toMap
      val expect = rows.groupBy(_._1).view.mapValues { hs =>
        (0 until 64).map(j =>
          hs.map { case (_, h, w) => if (((h >>> j) & 1L) == 1L) w else -w }.sum).toSeq
      }.toMap
      assert(got == expect)
    }
  }
}
