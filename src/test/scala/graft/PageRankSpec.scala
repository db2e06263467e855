package graft

import org.apache.spark.sql.functions._

import graft.ops.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  private def ranksOf(edges: Seq[(String, String)], iters: Int) = {
    val (df, release) =
      PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
    val out = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    release()
    out
  }

  test("2-cycle is a fixed point: ranks stay at the uniform prior") {
    for (iters <- Seq(0, 1, 4)) {
      val r = ranksOf(Seq("a" -> "b", "b" -> "a"), iters)
      assert(r == Map("a" -> (1L, Scale / 2), "b" -> (1L, Scale / 2)),
        s"iters=$iters")
    }
  }

  test("dangling mass is redistributed: hand-computed one-step values") {
    // a -> b, b dangling. base = 5e11; ds = base/2; contrib(b) = base.
    // a' = (15*base + 85*(ds))        / 100 = 287_500_000_000
    // b' = (15*base + 85*(base + ds)) / 100 = 712_500_000_000
    val r = ranksOf(Seq("a" -> "b"), 1)
    assert(r("a") == (1L, 287500000000L))
    assert(r("b") == (0L, 712500000000L))
    assert(r("a")._2 + r("b")._2 == Scale, "exact conservation here")
  }

  test("authority flows to the shared target of a star graph") {
    // hub <- {s1, s2, s3}; hub dangling. After 2 iterations the hub must
    // strictly dominate, and the sources stay symmetric (exact equality —
    // the arithmetic is deterministic integer math).
    val r = ranksOf(Seq("s1" -> "hub", "s2" -> "hub", "s3" -> "hub"), 2)
    assert(r("s1") == r("s2") && r("s2") == r("s3"))
    assert(r("hub")._2 > 2 * r("s1")._2)
  }

  test("parallel links collapse: duplicate edges change nothing") {
    val once = ranksOf(Seq("a" -> "b", "b" -> "c", "c" -> "a"), 3)
    val dup = ranksOf(Seq("a" -> "b", "a" -> "b", "a" -> "b",
      "b" -> "c", "c" -> "a"), 3)
    assert(once == dup)
  }

  test("mass is conserved up to documented floor loss on a mixed graph") {
    // 12 nodes, mixed out-degrees, two dangling sinks.
    val edges = (0 until 10).flatMap { i =>
      Seq(s"n$i" -> s"n${(i * 3 + 1) % 12}", s"n$i" -> s"n${(i * 5 + 2) % 12}")
    }.distinct.filter { case (s, d) => s != d }
    val iters = 4
    val total = ranksOf(edges, iters).values.map(_._2).sum
    val n = 12L
    // losses: init < n; per iteration < |E| (contrib floors) + n (dangling
    // share floor) + n*den (damping floor)
    val bound = n + iters * (edges.size + n + n * 100)
    assert(total <= Scale && total > Scale - bound,
      s"total=$total bound=$bound")
  }

  test("null endpoints are dropped, not nodes") {
    val edges = Seq(("a", "b"), ("b", "a"), ("a", null), (null, "b"))
      .toDF("src", "dst")
    val (df, release) = PageRank.pageRank(edges, "src", "dst", 1)
    val r = df.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    release()
    assert(r.keySet == Set("a", "b") && r.values.toSet == Set(Scale / 2))
  }

  test("iteration plan is equi-join + aggregate, never a nested loop") {
    val e = Seq("a" -> "b", "b" -> "c", "c" -> "a").toDF("src", "dst")
    val ranks = Seq(("a", 1L, true, Scale / 3, Scale / 3),
      ("b", 1L, true, Scale / 3, Scale / 3),
      ("c", 1L, true, Scale / 3, Scale / 3))
      .toDF("node", "outdeg", "is_seed", "base", "rank_scaled")
    val plan = PageRank.step(e, ranks, danglingShare = 0L, 85L, 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  private def trustRanks(edges: Seq[(String, String)], seeds: Seq[String],
      iters: Int) = {
    val (df, release) = PageRank.personalizedPageRank(edges.toDF("src", "dst"),
      "src", "dst", seeds.toDF("node"), "node", iters)
    val out = df.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    release()
    out
  }

  test("personalized: authority flows only out from the seeds") {
    // a -> b -> c, seed {a}: two hand-computed iterations.
    val r = trustRanks(Seq("a" -> "b", "b" -> "c"), Seq("a"), 2)
    assert(r == Map("a" -> 150000000000L, "b" -> 127500000000L,
      "c" -> 722500000000L))
  }

  test("personalized: dangling mass returns to the seeds only") {
    // a -> b, b dangling, seed {a}. Exact conservation after 2 steps.
    val r = trustRanks(Seq("a" -> "b"), Seq("a"), 2)
    assert(r == Map("a" -> 872500000000L, "b" -> 127500000000L))
    assert(r.values.sum == Scale)
  }

  test("personalized: all-nodes seed set degenerates to uniform PageRank") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c")
    val uniform = ranksOf(edges, 3).view.mapValues(_._2).toMap
    val personalized = trustRanks(edges, Seq("a", "b", "c"), 3)
    assert(uniform == personalized)
  }

  test("scale probe: 100k-node random host graph, mass conserved, skew absorbed") {
    // supercritical deterministic random graph: ~300k edges over 100k
    // nodes, with a hub (node 0) receiving ~1/16 of all edges — the
    // realistic in-degree skew of a web host graph. Asserts the exact
    // floor-loss conservation bound holds at five orders of magnitude
    // above the closed-form cases, on the same code path a cluster runs.
    val n = 100000L
    val edges = spark.range(300000).selectExpr(
      s"cast(abs(hash(id, 7)) % $n as bigint) as src",
      s"case when id % 16 = 0 then 0L else cast(abs(hash(id, 11)) % $n as bigint) end as dst")
    val iters = 3
    val (df, release) = PageRank.pageRank(edges, "src", "dst", iters)
    val row = df.agg(sum("rank_scaled"), count(lit(1)),
      max(when(col("node") === 0L, col("rank_scaled")))).head()
    val (total, nodes, hubRank) = (row.getLong(0), row.getLong(1), row.getLong(2))
    release()
    // distinct edge count <= 300k; conservation bound as in the mixed test
    val bound = nodes + iters * (300000L + nodes + nodes * 100L)
    assert(total <= Scale && total > Scale - bound, s"total=$total bound=$bound")
    assert(hubRank > 100L * (Scale / nodes), "the hub must dominate the prior")
  }

  test("personalized: seeds outside the graph are rejected") {
    val ex = intercept[IllegalArgumentException] {
      trustRanks(Seq("a" -> "b"), Seq("zz"), 1)
    }
    assert(ex.getMessage.contains("no seed"))
  }
}
