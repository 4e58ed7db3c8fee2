package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Triangle counting / degree distribution — randomized differentials
  * against naive enumeration, plus the orientation invariants the
  * distributed formulation's correctness rests on.
  */
class GraphStatsSpec extends SparkSpec {
  import spark.implicits._

  private def randomEdges(seed: Long, n: Int, m: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (1 to m).map { _ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
    }
  }

  private def naive(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(p => p._1 != p._2).toSet
    val adj = e.toSeq.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keySet
    val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    // NB: keep every generator a Seq — `c <- adj(a)` (a Set) would dedup
    // the yielded 1Ls across iterations and silently undercount
    val tris = (for {
      (a, b) <- e.toSeq
      c <- adj(a).toSeq if c > b && adj(b).contains(c)
    } yield 1L).sum
    (nodes.size.toLong, e.size.toLong, wedges, tris)
  }

  test("triangleStats equals naive enumeration (random multigraphs with self-loops)") {
    for (seed <- 50L to 54L) {
      val edges = randomEdges(seed, n = 25, m = 120) // dense enough for triangles
      val (nn, ne, nw, nt) = naive(edges)
      val r = Graph.triangleStats(edges.toDF("src", "dst")).head()
      assert(r.getLong(0) === nn, s"nodes seed=$seed")
      assert(r.getLong(1) === ne, s"edges seed=$seed")
      assert(r.getLong(2) === nw, s"wedges seed=$seed")
      assert(r.getLong(3) === nt, s"triangles seed=$seed")
      val cc = r.getDouble(4)
      assert(math.abs(cc - 3.0 * nt / nw) < 1e-6, s"cc seed=$seed")
    }
  }

  test("triangleStats is invariant to edge direction and duplication") {
    val edges = randomEdges(60L, n = 15, m = 60)
    val base = Graph.triangleStats(edges.toDF("src", "dst")).head()
    // reversed + duplicated input must not change any count
    val messy = (edges ++ edges.map(_.swap) ++ edges).toDF("src", "dst")
    val got = Graph.triangleStats(messy).head()
    assert(got === base)
  }

  test("triangleStats on a known clique: K5 has C(5,3)=10 triangles, cc=1") {
    val k5 = for (a <- 0L to 4L; b <- 0L to 4L if a < b) yield (a, b)
    val r = Graph.triangleStats(k5.toDF("src", "dst")).head()
    assert(r.getLong(1) === 10L)
    assert(r.getLong(3) === 10L)
    assert(r.getDouble(4) === 1.0)
  }

  test("degreeHistogram equals naive degree counting") {
    for (seed <- 70L to 72L) {
      val edges = randomEdges(seed, n = 30, m = 80)
      val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter(p => p._1 != p._2).toSet
      val deg = e.toSeq.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
        .map { case (_, vs) => vs.size.toLong }
      val expected = deg.groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
      val got = Graph.degreeHistogram(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"seed=$seed")
    }
  }

  test("coPurchaseEdges blocks on (part, ship-month) cells, canonical and distinct") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val orders = Seq((100L, 1L), (200L, 2L), (300L, 3L))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq(
      (100L, 7L, t("2024-01-05 00:00:00")), // cust 1, part 7, Jan
      (200L, 7L, t("2024-01-20 00:00:00")), // cust 2, part 7, Jan  -> edge (1,2)
      (300L, 7L, t("2024-02-01 00:00:00")), // cust 3, part 7, Feb  -> no edge
      (200L, 7L, t("2024-01-21 00:00:00"))  // duplicate cell -> no extra edge
    ).toDF("l_orderkey", "l_partkey", "l_shipdate")
    val got = Graph.coPurchaseEdges(orders, li)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }
}
