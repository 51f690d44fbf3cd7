package graft.queries

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  test("minhash+LSH candidates (verified) are a subset of the exact jaccard pairs") {
    val exact = graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, sf001)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = graft.SparkEntry.queries("dedup_minhash_lsh")(spark, sf001)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH emitted non-near-dup pairs: ${lsh -- exact}")
    assert(lsh.nonEmpty, "LSH found no candidates at all")
    // The fixture's planted near-dups are strong (J ≈ 0.98), so 16×4
    // banding should catch essentially all of them.
    assert(lsh.size >= exact.size * 9 / 10,
      s"LSH recall too low: ${lsh.size}/${exact.size}")
  }

  test("simhash: near-dup docs have close signatures, and n_near is symmetric") {
    val rows = graft.SparkEntry.queries("dedup_simhash")(spark, sf001).collect()
    assert(rows.length == 500)
    val near = rows.map(r => r.getLong(2)).sum
    assert(near % 2 == 0, "pair endpoints must come in twos")
  }

  test("exact jaccard pairs all meet the 0.5 threshold in ppm") {
    val rows = graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sa, sb, c, ppm) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(2 * c >= sa + sb - c)
      assert(ppm == c * 1000000L / (sa + sb - c))
    }
  }
}
