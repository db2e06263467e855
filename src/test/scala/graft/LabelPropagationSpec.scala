package graft

import graft.ops.LabelPropagation

class LabelPropagationSpec extends SparkSpec {

  /** Reference simulator: the same rule (sync rounds, most frequent
    * neighbor label, min-label tiebreak) in plain Scala. */
  private def simulate(edges: Seq[(String, String)], iterations: Int): Map[String, String] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => if (e._1 < e._2) e else e.swap).distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    var labels: Map[String, String] = adj.keys.map(n => n -> n).toMap
    for (_ <- 0 until iterations) {
      labels = adj.map { case (n, neigh) =>
        val counts = neigh.map(labels).groupBy(identity).map { case (l, xs) => (l, xs.size) }
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  private def run(edges: Seq[(String, String)], iterations: Int): Map[String, String] = {
    import spark.implicits._
    LabelPropagation.run(edges.toDF("src", "dst"), "src", "dst", iterations)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("two cliques with a bridge converge to two communities") {
    val g = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("x", "y"), ("y", "z"), ("z", "x"), ("c", "x"))
    for (k <- 0 to 4) assert(run(g, k) == simulate(g, k), s"iteration $k")
    // after enough rounds both cliques are internally uniform
    val fin = run(g, 4)
    assert(Set("a", "b", "c").map(fin).size == 1)
    assert(Set("x", "y", "z").map(fin).size == 1)
  }

  test("star, path, and duplicate/self-loop noise match the simulator") {
    val star = Seq(("h", "l1"), ("h", "l2"), ("h", "l3"), ("h", "l4"))
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d"))
    val noisy = Seq(("a", "b"), ("b", "a"), ("a", "a"), ("b", "c"), ("b", "c"))
    for (g <- Seq(star, path, noisy); k <- 0 to 3)
      assert(run(g, k) == simulate(g, k), s"graph $g iteration $k")
  }

  test("deterministic on a pseudo-random graph across iterations") {
    val g = (0 until 60).flatMap { i =>
      Seq((s"n$i", s"n${(i * 7 + 3) % 60}"), (s"n$i", s"n${(i * 13 + 5) % 60}"))
    }
    for (k <- Seq(1, 3)) assert(run(g, k) == simulate(g, k), s"iteration $k")
  }

  test("negative iterations rejected; zero iterations = self labels") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      LabelPropagation.run(Seq(("a", "b")).toDF("src", "dst"), "src", "dst", -1)
    }
    assert(run(Seq(("a", "b")), 0) == Map("a" -> "a", "b" -> "b"))
  }
}
