package graft

import graft.ops.Bfs

class BfsSpec extends SparkSpec {

  private def run(edges: Seq[(String, String)], seeds: Seq[String],
      maxHops: Int): Map[String, Long] = {
    import spark.implicits._
    Bfs.hops(edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("s"), "s", maxHops)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("chain distances are exact and bounded by maxHops") {
    val chain = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    assert(run(chain, Seq("a"), 10) ==
      Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L, "e" -> 4L))
    assert(run(chain, Seq("a"), 2) == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }

  test("multi-source takes the minimum hop over all seeds") {
    val chain = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    assert(run(chain, Seq("a", "d"), 10) ==
      Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 0L, "e" -> 1L))
  }

  test("edges are directed; unreachable nodes are absent") {
    assert(run(Seq(("a", "b"), ("c", "b")), Seq("a"), 5) ==
      Map("a" -> 0L, "b" -> 1L))
  }

  test("cycles terminate early with first-visit distances") {
    assert(run(Seq(("a", "b"), ("b", "c"), ("c", "a")), Seq("a"), 100) ==
      Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }

  test("diamond: both branches converge at the same hop") {
    val g = Seq(("s", "l"), ("s", "r"), ("l", "t"), ("r", "t"))
    assert(run(g, Seq("s"), 5) == Map("s" -> 0L, "l" -> 1L, "r" -> 1L, "t" -> 2L))
  }

  test("seeds outside the graph appear at hop 0; maxHops 0 returns seeds only") {
    assert(run(Seq(("a", "b")), Seq("z"), 5) == Map("z" -> 0L))
    assert(run(Seq(("a", "b")), Seq("a"), 0) == Map("a" -> 0L))
  }

  test("empty seed set yields empty result") {
    assert(run(Seq(("a", "b")), Nil, 5) == Map.empty[String, Long])
  }

  test("scale probe: 50k-edge random graph matches a sequential BFS reference") {
    val rnd = new scala.util.Random(11)
    val nNodes = 8000
    val edges = Seq.fill(50000)((s"n${rnd.nextInt(nNodes)}", s"n${rnd.nextInt(nNodes)}"))
    val seeds = Seq("n0", "n1", "n2")
    val maxHops = 5
    // plain-Scala reference BFS
    val adj = edges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds.toSet
    for (h <- 1 to maxHops if frontier.nonEmpty) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(dist.contains)
      dist ++= next.map(_ -> h.toLong)
      frontier = next
    }
    assert(run(edges, seeds, maxHops) == dist)
  }
}
