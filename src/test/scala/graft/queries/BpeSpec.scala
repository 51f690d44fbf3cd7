package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins the equivalence txt_bpe_apply's oracle RELIES on: applying a
  * merge list via [[BpeCore.applyMerges]] (the symbol-array loop) must
  * equal applying it as chained literal `replace` calls over the
  * |-separated string form — the exact rewrite both Spark SQL and
  * DuckDB execute. If these ever diverge (e.g. an overlap-handling
  * change in either representation), the oracle's hash match would
  * silently ride on luck; this test fails loudly instead.
  */
class BpeSpec extends AnyFunSuite {

  /** Raw ScalaCheck sampling with fixed seeds (the MapReduceKernelSpec
    * pattern — the scalatestplus bridge is not among resolvable deps). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(1042L + i)))

  /** The string-form rewrite: one literal replace per merge, exactly
    * what the generated SQL does (Java's String.replace is
    * left-to-right non-overlapping, like SQL replace in both engines).
    * Every symbol carries its OWN delimiters ("|c||a|", not "|c|a|"):
    * with a shared middle pipe, two back-to-back occurrences of the
    * same pair share a boundary character, the second match dies with
    * the first's consumed region, and the rewrite under-merges
    * (caught by this very test on 'cacabca' + (c,a)). */
  private def viaStringReplace(word: String, merges: Seq[(String, String)]): Array[String] = {
    var s = word.map(c => s"|$c|").mkString
    merges.foreach { case (a, b) =>
      s = s.replace(s"|$a||$b|", s"|$a$b|")
    }
    s.split("\\|").filter(_.nonEmpty)
  }

  private val wordGen = Gen.chooseNum(1, 12).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  test("applyMerges equals the chained-replace string form on random words") {
    // Merges include both pairs that occur and pairs that never match,
    // over a 3-letter alphabet dense enough to force overlap cases
    // ("aaa", "ababab", merges of merged symbols).
    val caseGen = Gen.zip(wordGen, Gen.listOfN(6, Gen.zip(
      Gen.oneOf("a", "b", "c", "ab", "bc", "aa", "cc"),
      Gen.oneOf("a", "b", "c", "ab", "bc", "aa", "cc"))))
    samples(caseGen, 500).foreach { case (w, ms) =>
      assert(BpeCore.applyMerges(w, ms).toSeq == viaStringReplace(w, ms).toSeq,
        s"divergence on word '$w' with merges $ms")
    }
  }

  test("trainLocal picks the max-count pair with the total-order tie-break") {
    // Hand-checkable vocab: "abab" x3 + "ab" x2 => pairs under no
    // merges: (a,b)=8 [2 per abab x3 + 1 per ab x2], (b,a)=3.
    val wf = Array(("abab", 3L), ("ab", 2L))
    val picks = BpeCore.trainLocal(wf, 2)
    assert(picks.head == ((1, "a", "b", 8L)), s"round 1: ${picks.head}")
    // After merging (a,b): abab -> [ab, ab] so (ab, ab) = 3.
    assert(picks(1) == ((2, "ab", "ab", 3L)), s"round 2: ${picks(1)}")
  }

  test("tie-break on equal counts picks the lexicographically least pair") {
    // "ab" and "ba" each once: (a,b)=1 and (b,a)=1 -> (a,b) wins.
    val wf = Array(("ab", 1L), ("ba", 1L))
    val picks = BpeCore.trainLocal(wf, 1)
    assert(picks.head == ((1, "a", "b", 1L)))
  }
}
