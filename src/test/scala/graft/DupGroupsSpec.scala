package graft

import graft.ops.DupGroups

class DupGroupsSpec extends SparkSpec {
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] =
    DupGroups.connectedComponents(edges.toDF("a", "b"), "a", "b", maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference union-find, for cross-checking the distributed algorithm. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // roots are already minimal because union always parents max under min
    nodes.map(n => n -> find(n)).toMap
  }

  test("cliques, chains, and a bridge collapse to min-id components") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), // clique {1,2,3}
      (10L, 11L),                   // pair {10,11}
      (20L, 21L), (21L, 22L), (22L, 23L), // chain {20..23}
      (3L, 10L)                     // bridge merges {1,2,3} with {10,11}
    )
    val got = components(edges)
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("a 200-node path (worst case for naive propagation) converges") {
    val edges = (0L until 199L).map(i => (i + 1, i)) // descending path
    val got = components(edges)
    assert(got.size == 200 && got.values.forall(_ == 0L))
  }

  test("matches union-find on a pseudo-random multigraph with self-loops and dup edges") {
    // deterministic LCG so the spec is reproducible
    var s = 42L
    def next(bound: Long): Long = { s = s * 6364136223846793005L + 1442695040888963407L; math.floorMod(s >>> 33, bound) }
    val edges = (1 to 400).map(_ => (next(150), next(150))) ++ Seq((7L, 7L), (3L, 5L), (5L, 3L))
    val clean = edges.filter(e => e._1 != e._2)
    assert(components(edges) == unionFind(clean))
  }

  test("scale probe: 100k-node path + 200k-edge random graph converge correctly") {
    // the path is the adversarial case (diameter = n; naive label
    // propagation needs n rounds, star contraction needs O(log n))
    val pathEdges = spark.range(1, 100000)
      .selectExpr("id as a", "id - 1 as b")
    val pathComp = DupGroups.connectedComponents(pathEdges, "a", "b")
    val stats = pathComp.agg(
      org.apache.spark.sql.functions.countDistinct("component"),
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))).head()
    assert(stats.getLong(0) == 1L && stats.getLong(1) == 100000L)

    // random graph over 50k nodes: supercritical, one giant component plus
    // isolated small ones; cross-check sampled nodes against union-find
    val rnd = spark.range(200000).selectExpr(
      "cast(abs(hash(id, 1)) % 50000 as bigint) as a",
      "cast(abs(hash(id, 2)) % 50000 as bigint) as b")
    val edges = rnd.collect().map(r => (r.getLong(0), r.getLong(1))).filter(e => e._1 != e._2)
    val got = DupGroups.connectedComponents(rnd, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = unionFind(edges.toSeq)
    assert(got == want)
  }

  test("dupGroups reports size and members per component") {
    val comp = DupGroups.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("a", "b"), "a", "b")
    val groups = DupGroups.dupGroups(comp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2).sorted)).toMap
    assert(groups == Map(1L -> ((3L, Seq(1L, 2L, 3L))), 8L -> ((2L, Seq(8L, 9L)))))
  }
}
