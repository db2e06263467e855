package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** PageRank-style link authority over an edge list — the graph-derived
  * quality prior web-corpus pipelines attach to every page (harvested
  * link graphs rank hosts; the rank then feeds the quality/mixing
  * stages alongside classifier scores).
  *
  * The iteration is the textbook damped power method, but in EXACT
  * INTEGER arithmetic so the result is bit-reproducible across engines,
  * retries, and partitionings: ranks are scaled longs (`scale` = mass
  * 1.0), every division is a floor division of non-negative longs
  * (identical in Java long math and ANSI/DuckDB `//`), and every
  * aggregation is a long sum (associative-commutative — no float
  * summation-order drift). One iteration:
  *
  *   contrib(v) = Σ_{(u,v) ∈ E} rank(u) div outdeg(u)
  *   rank'(v)   = ((den−num)·base + num·(contrib(v) + dangling div N)) div den
  *
  * where `base = scale div N` is the uniform prior, `num/den` is the
  * damping factor (default 85/100), and `dangling` — the mass parked on
  * nodes with no out-edges — is redistributed uniformly (the standard
  * dangling-node correction; without it the total mass leaks each
  * iteration). Floor divisions shed at most den·N scale-units of mass
  * per iteration — negligible at scale=1e12 and spec-asserted bounded.
  *
  * Scale shape: nodes+outdegrees are computed ONCE and carried inside
  * the ranks frame (no per-iteration degree join). Each iteration is
  * exactly one equi-join (edges ⋈ ranks on src — a shuffle hash join;
  * nothing is broadcast because a web-scale rank vector doesn't fit) +
  * one hash aggregate on dst + one left join back to the node set, plus
  * a 1-row dangling aggregate (a driver scalar per iteration, bounded
  * by iteration count, never data size). Each iteration's ranks are
  * persisted and the previous generation released, so lineage stays one
  * generation deep — at hundreds of iterations on a real cluster you
  * would additionally checkpoint every ~10 rounds to truncate the plan;
  * with the bounded iteration counts here persist+unpersist suffices.
  *
  * Edges are DISTINCT (src, dst) pairs — parallel links don't multiply
  * authority (the convention of host-graph rank); self-loops are kept
  * (a self-link is an out-edge like any other).
  */
object PageRank {

  /** Runs `iterations` rounds and returns `(node, outdeg, rank_scaled)`.
    * `edges` needs columns `srcCol`, `dstCol` (any equatable type);
    * nulls on either side are dropped (a half-specified link is not an
    * edge). Overflow posture: intermediate products are bounded by
    * `num · scale` (≈ 8.5e13 at the defaults) — far inside long range as
    * long as `scale ≤ ~9e16 / den`, which the require enforces.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      scale: Long = 1000000000000L,
      dampNum: Long = 85,
      dampDen: Long = 100): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      s"damping must satisfy 0 <= num <= den, got $dampNum/$dampDen")
    require(scale > 0 && scale <= Long.MaxValue / (dampDen * 2),
      s"scale too large for overflow-free integer damping: $scale")

    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Node set = src ∪ dst, with out-degree carried in-frame so the
    // iteration never re-joins a degree table.
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    val nd = nodes.join(outdeg, Seq("node"), "left")
      .select(col("node"), coalesce(col("outdeg"), lit(0L)).as("outdeg"))

    val n = nd.count()
    if (n == 0) { e.unpersist(blocking = false); return nd.withColumn("rank_scaled", lit(0L)) }
    val base = scale / n

    var ranks = nd.withColumn("rank_scaled", lit(base))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ranks.count() // materialize so the unpersist chain below is safe

    var it = 0
    while (it < iterations) {
      val next = step(e, ranks, n, base, dampNum, dampDen)
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      ranks.unpersist(blocking = false)
      ranks = next
      it += 1
    }
    e.unpersist(blocking = false)
    ranks
  }

  /** One power iteration (unpersisted — [[pageRank]] owns caching).
    * Package-visible so the spec can assert the iteration PLAN (one
    * equi-join + one hash aggregate + one left join, never a nested
    * loop) rather than the opaque cached result.
    */
  private[graft] def step(
      e: DataFrame,
      ranks: DataFrame,
      n: Long,
      base: Long,
      dampNum: Long,
      dampDen: Long): DataFrame = {
    val dangling = ranks.filter(col("outdeg") === 0L)
      .agg(coalesce(sum(col("rank_scaled")), lit(0L))).head().getLong(0)
    val danglingShare = dangling / n

    val contribs = e
      .join(ranks.filter(col("outdeg") > 0L), e("src") === col("node"))
      // `div`, not `/`: Spark's `/` on longs is DOUBLE division, and a
      // double quotient can round before the cast truncates — `div` is
      // exact long division, matching the oracle's `//` on every value.
      .select(col("dst").as("node"),
        expr("rank_scaled div outdeg").as("c"))
      .groupBy("node")
      .agg(sum(col("c")).as("contrib"))

    ranks.select(col("node"), col("outdeg"))
      .join(contribs, Seq("node"), "left")
      .withColumn("__mass",
        lit(dampDen - dampNum) * lit(base) +
          lit(dampNum) * (coalesce(col("contrib"), lit(0L)) + lit(danglingShare)))
      .select(col("node"), col("outdeg"),
        expr(s"__mass div ${dampDen}L").as("rank_scaled"))
  }
}
