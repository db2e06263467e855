package graft

import graft.ops.KCore

class KCoreSpec extends SparkSpec {

  private def run(edges: Seq[(String, String)], k: Int, rounds: Int): (Map[String, Long], Boolean) = {
    import spark.implicits._
    val (df, conv) = KCore.peel(edges.toDF("src", "dst"), "src", "dst", k, rounds)
    (df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap, conv)
  }

  private val k4 = for {
    x <- Seq("a", "b", "c", "d"); y <- Seq("a", "b", "c", "d") if x < y
  } yield (x, y)

  test("K4 is its own 3-core; a pendant chain peels off") {
    val g = k4 ++ Seq(("d", "e"), ("e", "f")) // chain f-e-d hanging off K4
    val (core, conv) = run(g, 3, 5)
    assert(conv)
    assert(core == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
  }

  test("peeling cascades one hop per round; bounded rounds report non-convergence") {
    val g = k4 ++ Seq(("d", "e"), ("e", "f"))
    // round 1 removes f (deg 1); e then has deg 1 but only falls in round 2
    val (after1, conv1) = run(g, 2, 1)
    assert(!conv1 && after1.contains("e") && !after1.contains("f"))
    val (after2, conv2) = run(g, 2, 2)
    assert(!after2.contains("e"))
    // the fixpoint needs a further no-change round to be DETECTED
    assert(!conv2)
    assert(run(g, 2, 3)._2)
  }

  test("a cycle is a 2-core but has no 3-core") {
    val cyc = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
    val (core2, _) = run(cyc, 2, 3)
    assert(core2.values.toSet == Set(2L) && core2.size == 4)
    val (core3, conv3) = run(cyc, 3, 3)
    assert(core3.isEmpty && conv3)
  }

  test("duplicates, reversed edges, and self-loops do not inflate degrees") {
    val noisy = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("a", "a"),
      ("b", "c"), ("c", "a"))
    val (core, _) = run(noisy, 2, 3)
    assert(core == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
  }

  test("star graph fully peels at k=2") {
    val (core, conv) = run(Seq(("h", "a"), ("h", "b"), ("h", "c")), 2, 4)
    assert(core.isEmpty && conv)
  }
}
