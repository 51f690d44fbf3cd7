package graft.queries

import graft.SparkSpec
import scala.util.Random

/** Property test for the degree-ordered triangle counter (the
  * union-find-vs-connectedComponents pattern applied to
  * `AdvancedQueries.triangleStats`): random graphs plus adversarial
  * shapes, cross-checked against an O(n³) local brute force. The
  * orientation trick has two classic failure modes the fixture alone
  * cannot pin — a tie-broken rank that double-counts (a triangle of
  * equal-degree nodes seen from two wedges) and a hub graph where a
  * miscarried rank key silently drops wedges — both shapes are staged
  * here explicitly.
  */
class TriangleSpec extends SparkSpec {

  private def bruteTriangles(edges: Set[(Long, Long)]): Long = {
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val nodes = adj.keys.toSeq.sorted
    var n = 0L
    for {
      a <- nodes
      b <- adj(a).toSeq.sorted if b > a
      c <- adj(b).toSeq.sorted if c > b && adj(a).contains(c)
    } n += 1
    n
  }

  private def sparkTriangles(edges: Set[(Long, Long)]): (Long, Long, Long) = {
    import spark.implicits._
    val df = edges.toSeq.sortBy(identity).toDF("u", "v")
    val r = AdvancedQueries.triangleStats(spark, df).head()
    spark.catalog.clearCache()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  private def normalize(raw: Seq[(Long, Long)]): Set[(Long, Long)] =
    raw.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .toSet

  test("random graphs match the local brute force") {
    val rnd = new Random(42)
    (1 to 5).foreach { _ =>
      val n = 12 + rnd.nextInt(10)
      val edges = normalize(Seq.fill(3 * n)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)))
      val (nodes, m, t) = sparkTriangles(edges)
      assert(m == edges.size)
      assert(nodes == edges.flatMap(e => Seq(e._1, e._2)).size)
      assert(t == bruteTriangles(edges),
        s"random graph n=$n m=$m: spark=$t brute=${bruteTriangles(edges)}")
    }
  }

  test("clique: all degrees equal — tie-break order must not double-count") {
    val k = 7L
    val edges = (for {
      a <- 0L until k; b <- (a + 1) until k
    } yield (a, b)).toSet
    val (_, _, t) = sparkTriangles(edges)
    assert(t == k * (k - 1) * (k - 2) / 6, s"K$k triangles: got $t")
  }

  test("star: a hub with no closing edges has zero triangles") {
    val edges = (1L to 20L).map(i => (0L, i)).toSet
    val (nodes, m, t) = sparkTriangles(edges)
    assert(nodes == 21 && m == 20 && t == 0)
  }

  test("hub plus one closing edge: exactly the triangles through it") {
    // 0 connects to 1..20; edge (1,2) closes exactly one triangle.
    val edges = (1L to 20L).map(i => (0L, i)).toSet + ((1L, 2L))
    val (_, _, t) = sparkTriangles(edges)
    assert(t == 1)
  }

  test("triangle-free bipartite graph counts zero") {
    val edges = (for { a <- 0L until 5L; b <- 5L until 10L } yield (a, b)).toSet
    val (_, _, t) = sparkTriangles(edges)
    assert(t == 0)
  }
}
