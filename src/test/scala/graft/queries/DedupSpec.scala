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

  test("sampled audit (SPARK_GRAFT_AUDIT_SAMPLE) keeps results identical and gates passing") {
    // The exhaustive in-path gates (minhash recall, kmeans
    // re-derivation, exact profile) get a production scale switch:
    // under a fractional audit the QUERY OUTPUT must be byte-identical
    // (only the audit evidence shrinks) and every gate must still
    // execute and pass on its deterministic slice.
    def run(name: String): Seq[String] = {
      spark.catalog.clearCache()
      graft.SparkEntry.queries(name)(spark, sf001)
        .collect().map(_.toString).sorted.toSeq
    }
    val names = Seq("dedup_minhash_lsh", "emb_kmeans", "pipe_profile_approx")
    val full = names.map(n => n -> run(n)).toMap
    assert(QueryModule.auditSample == 1.0,
      "specs must start at the exhaustive default")
    System.setProperty("spark.graft.audit.sample", "0.3")
    try {
      assert(QueryModule.auditSample == 0.3)
      names.foreach { n =>
        assert(run(n) == full(n),
          s"$n output changed under a sampled audit — the switch must " +
            "scale the audit, never the result")
      }
    } finally System.clearProperty("spark.graft.audit.sample")
    // An out-of-range fraction refuses loudly.
    System.setProperty("spark.graft.audit.sample", "0")
    try intercept[IllegalArgumentException] { QueryModule.auditSample }
    finally System.clearProperty("spark.graft.audit.sample")
  }

  test("simhash: near-dup docs have close signatures, and n_near is symmetric") {
    val rows = graft.SparkEntry.queries("dedup_simhash")(spark, sf001).collect()
    assert(rows.length == 500)
    val near = rows.map(r => r.getLong(2)).sum
    assert(near % 2 == 0, "pair endpoints must come in twos")
  }

  test("PPJoin prefix+positional filtering stays exact vs brute force on a hostile corpus") {
    import spark.implicits._
    // Tiny vocabulary → every shingle is hot (high document frequency),
    // the worst case for prefix filtering and the case where an unsound
    // positional filter would silently drop true pairs. Brute force is
    // the ground truth.
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val rnd = new scala.util.Random(7L)
    def doc(len: Int): String =
      Vector.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0 until 40).map(i => (i.toLong, doc(8 + rnd.nextInt(30))))
    // planted near-dups: one-word mutations of existing docs
    val mutated = base.take(15).map { case (id, text) =>
      val words = text.split(" ").toVector
      val w2 = words.updated(rnd.nextInt(words.size), vocab(rnd.nextInt(vocab.size)))
      (id + 1000L, w2.mkString(" "))
    }
    // short docs that must be excluded by the size(t) >= 3 guard
    val tiny = Seq((2000L, "alpha beta"), (2001L, ""))
    val docs = base ++ mutated ++ tiny
    val dir = java.nio.file.Files.createTempDirectory("ppjoin").toString
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")

    def shingleSet(text: String): Set[String] = {
      val t = text.split(" ").filter(_.nonEmpty)
      if (t.length < 3) Set.empty
      else (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
    }
    val sets = docs.map { case (id, tx) => id -> shingleSet(tx) }.filter(_._2.nonEmpty)
    val expected = (for {
      (d1, s1) <- sets
      (d2, s2) <- sets
      if d1 < d2
      c = (s1 & s2).size
      if 2 * c >= s1.size + s2.size - c
    } yield (d1, d2)).toSet

    val got = graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, dir)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "degenerate corpus: no near-dup pairs to check")
    assert(got == expected,
      s"missed: ${expected -- got}; spurious: ${got -- expected}")

    // Same corpus, cluster resolution: label propagation must agree
    // with a collections-level union-find over the expected pair graph.
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    expected.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expectedClusters = parent.keys.toSeq.map(n => find(n) -> n)
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val gotClusters = graft.SparkEntry.queries("dedup_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotClusters == expectedClusters,
      s"cluster mismatch: got $gotClusters expected $expectedClusters")
  }

  test("frontier connected-components equals union-find on random and adversarial graphs") {
    import spark.implicits._
    // The r10 frontier rewrite's independent correctness witness beyond
    // the fixture corpus: random graphs plus the shapes that stress its
    // two delta paths — a long PATH (deep diameter: converges only if
    // the pointer-hop keeps doubling reach, ~log n rounds), disjoint
    // CLIQUES (init round IS the fixpoint), self-loops/duplicate edges
    // (must be harmless), and an empty edge set (loop skipped).
    val rnd = new scala.util.Random(42)
    def randomGraph(n: Int, m: Int): Seq[(Long, Long)] =
      Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    val path = (0L until 32L).sliding(2).map(s => (s(0), s(1))).toSeq
    val cliques = (for {
      base <- Seq(0L, 100L, 200L)
      a <- 0L until 5L; b <- 0L until 5L if a < b
    } yield (base + a, base + b))
    val graphs: Seq[Seq[(Long, Long)]] = Seq(
      path,
      cliques,
      Seq((7L, 7L), (3L, 9L), (3L, 9L), (9L, 3L)), // loops + dup edges
      Seq.empty,
      randomGraph(40, 30),
      randomGraph(60, 90),
      randomGraph(50, 25))
    graphs.zipWithIndex.foreach { case (es, gi) =>
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.toSeq.map(n => n -> find(n)).toMap
      val edges = es.toDF("d1", "d2")
      val got = DedupQueries.connectedComponents(spark, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.catalog.clearCache()
      assert(got == expected,
        s"graph $gi: got $got expected $expected")
    }
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

  test("pii scrub finds exactly the injected matches of every class") {
    // The fixture text is PII-free word salad, so the deterministic
    // injection is the only source of matches: exactly one email /
    // card / ssn / ip / access key per doc. Phones are 1 + the
    // card-internal leaks the pattern is BLIND to semantically but
    // must count deterministically: a card segment ending in 555
    // is followed by '-dddd', which IS phone-shaped ('555-' + 4
    // digits) — the test recomputes that expectation per doc, so a
    // divergence in either direction (missed plant or phantom match)
    // fails. n_cc_luhn must agree with a local Luhn check of the
    // planted digits.
    val rows = graft.SparkEntry.queries("pipe_pii_scrub")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 1, s"doc $id: n_emails=${r.getInt(1)}")
      val expPhones = 1 +
        (if (id % 10000 % 1000 == 555) 1 else 0) +
        (if ((id * 7) % 10000 % 1000 == 555) 1 else 0)
      assert(r.getInt(2) == expPhones,
        s"doc $id: n_phones=${r.getInt(2)}, expected $expPhones")
      assert(r.getInt(3) == 1, s"doc $id: n_cc=${r.getInt(3)}")
      val digits = "4111" + f"${id % 10000}%04d" +
        f"${(id * 7) % 10000}%04d" + f"${(id * 13) % 10000}%04d"
      val luhn = digits.reverse.zipWithIndex.map { case (ch, i) =>
        val d = ch - '0'
        if (i % 2 == 0) d else { val t = d * 2; if (t > 9) t - 9 else t }
      }.sum
      val expLuhn = if (luhn % 10 == 0) 1 else 0
      assert(r.getInt(4) == expLuhn,
        s"doc $id: n_cc_luhn=${r.getInt(4)}, expected $expLuhn for $digits")
      assert(r.getInt(5) == 1, s"doc $id: n_ssn=${r.getInt(5)}")
      assert(r.getInt(6) == 1, s"doc $id: n_ip=${r.getInt(6)}")
      assert(r.getInt(7) == 1, s"doc $id: n_keys=${r.getInt(7)}")
    }
  }

  test("embedding dedup: every dup has a smaller-id canon in the same cell") {
    val byId = graft.SparkEntry.queries("dedup_embedding")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(byId.nonEmpty)
    byId.foreach { case (dup, canon, n) =>
      assert(canon < dup, s"canon_id $canon !< dup_id $dup")
      assert(n >= 1)
    }
  }

  /** Single-threaded reference for dedup_spans: all-but-first 8-gram
    * occurrences in (doc_id, pos) corpus order, merged into islands
    * while consecutive duplicated starts are ≤ 8 apart. */
  private def bruteSpans(docs: Seq[(Long, String)]): Set[(Long, Long, Long, Long)] = {
    val occ = for {
      (id, tx) <- docs.sortBy(_._1)
      t = tx.split(" ").filter(_.nonEmpty)
      if t.length >= 8
      i <- 0 to t.length - 8
    } yield (id, (i + 1).toLong, t.slice(i, i + 8).mkString(" "))
    val seen = scala.collection.mutable.HashSet[String]()
    val dups = occ.filter { case (_, _, g) => !seen.add(g) }
    dups.groupBy(_._1).flatMap { case (id, ps) =>
      val islands = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      for (p <- ps.map(_._2).sorted) {
        if (islands.nonEmpty && p - islands.last._2 <= 8)
          islands(islands.size - 1) = (islands.last._1, p)
        else islands += ((p, p))
      }
      islands.map { case (a, b) => (id, a, b + 7, b + 7 - a + 1) }
    }.toSet
  }

  test("dedup_spans matches brute force on the fixture corpus") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val expected = bruteSpans(docs)
    val got = graft.SparkEntry.queries("dedup_spans")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(expected.nonEmpty, "fixture has no duplicated spans to check")
    assert(got == expected,
      s"missed: ${expected -- got}; spurious: ${got -- expected}")
  }

  test("dedup_spans island semantics: near spans merge, far spans stay split") {
    import spark.implicits._
    // w0..w59: globally unique tokens, so only PLANTED repeats dup.
    val w = (0 until 60).map(i => s"w$i")
    val a = w.take(30).mkString(" ")                    // source doc
    // b: copy of a's tokens 1-10 (dup starts 1,2,3 → ONE island
    // [1,10]), then 9 unique tokens (gap > 8), then copy of a's
    // tokens 21-28 (dup start 20 → its own island [20,27]).
    val b = (w.take(10) ++ w.slice(40, 49) ++ w.slice(20, 28)).mkString(" ")
    // c: exact duplicate of a → island spanning the whole doc.
    val docs = Seq((1L, a), (2L, b), (3L, a), (4L, w.slice(49, 60).mkString(" ")))
    val dir = java.nio.file.Files.createTempDirectory("spans").toString
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("dedup_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val expected = bruteSpans(docs)
    assert(got == expected,
      s"missed: ${expected -- got}; spurious: ${got -- expected}")
    // pin the shape the corpus was built to produce
    assert(got.contains((2L, 1L, 10L, 10L)), s"merged island missing: $got")
    assert(got.contains((2L, 20L, 27L, 8L)), s"split island missing: $got")
    assert(got.contains((3L, 1L, 30L, 30L)), s"whole-doc island missing: $got")
  }

  test("property: dedup_spans equals brute force on random small-vocab corpora") {
    import spark.implicits._
    // A 6-word vocabulary makes duplicated 8-grams dense and island
    // boundaries adversarial (overlap chains, exact ties, whole-doc
    // repeats) — the regime where an off-by-one in the ≤8 merge rule
    // or a first-occurrence tie-break slip would show.
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(100L + seed)
      val docs = (0 until 25).map { i =>
        val len = 6 + rnd.nextInt(25)
        (i.toLong, Vector.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val dir = java.nio.file.Files.createTempDirectory(s"spanprop$seed").toString
      docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
      val got = graft.SparkEntry.queries("dedup_spans")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val expected = bruteSpans(docs)
      assert(got == expected,
        s"seed $seed: missed ${expected -- got}; spurious ${got -- expected}")
    }
  }

  test("snapshot diff classifies every doc exactly once, classes add up") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = graft.SparkEntry.queries("pipe_snapshot_diff")(spark, sf001)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // recompute the expected class of every doc from the derivation rules
    val expected = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    docs.foreach { case (id, lang) =>
      val cls = if (id % 23 == 0) "removed"
        else if (id % 17 == 0) "modified"
        else "unchanged"
      expected((lang, cls)) += 1
      if (id % 29 == 0) expected((lang, "added")) += 1
    }
    assert(got == expected.toMap,
      s"missed: ${expected.toMap.toSet -- got.toSet}; spurious: ${got.toSet -- expected.toMap.toSet}")
    // partition property: removed+modified+unchanged covers v1 exactly
    assert(got.collect { case ((_, c), n) if c != "added" => n }.sum == docs.size)
  }

  test("stratified sample: exact k per stratum in deterministic md5 order") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = docs.groupBy(_._1).flatMap { case (lang, ds) =>
      ds.map { case (_, id) => (md5hex(id.toString), id) }.sorted.take(20)
        .zipWithIndex.map { case ((_, id), i) => (lang, (i + 1).toLong, id) }
    }.toSet
    val got = graft.SparkEntry.queries("pipe_stratified_sample")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, s"missed: ${expected -- got}; spurious: ${got -- expected}")
    assert(got.size == 100)
  }
}
