package graft

import org.apache.spark.sql.functions._

import graft.ops.{IvfIndex, SemDedup}

/** SemDeDup semantic dedup: IVF-cell blocking + within-cell cosine
  * near-dup + keep-best. Unit vectors at known angles make cosines and
  * cell assignments exact by construction.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def unit(deg: Double): Seq[Double] = {
    val r = math.toRadians(deg)
    Seq(math.cos(r), math.sin(r))
  }

  // centroids (iterations = 0) = the two lowest-id vectors: 0° and 30°.
  // Cell boundary sits at 15°. Threshold 0.9996 ~ cos(1.62°): only the
  // 1°-apart (2,3), the 0.5°-apart (1,6), and the 0.2°-apart (4,5)
  // qualify — and (4,5) straddles the boundary.
  private def corpus() = Seq(
    (0L, unit(0), 1.0),     // centroid of cell 0
    (1L, unit(30), 1.0),    // centroid of cell 1
    (2L, unit(5), 0.5),     // cell 0
    (3L, unit(6), 2.0),     // cell 0; cos(1°) to id 2 -> near-dup pair
    (4L, unit(14.9), 1.0),  // cell 0, just inside the boundary
    (5L, unit(15.1), 1.0),  // cell 1 — cos(0.2°) to id 4 but NEVER compared
    (6L, unit(29.5), 1.0)   // cell 1; cos(0.5°) to id 1 -> near-dup pair
  ).toDF("id", "vec", "quality")

  private val Thr = 0.9996

  private def model() = IvfIndex.train(corpus(), "id", "vec", nLists = 2, iterations = 0)

  test("withinCellPairs: same-cell near-dups found once; cross-cell pairs never scored") {
    val pairs = SemDedup.withinCellPairs(model(), corpus(), "id", "vec", Thr)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    // only the two same-cell near-dup pairs qualify at Thr
    assert(pairs.contains((2L, 3L)) && pairs.contains((1L, 6L)))
    // the boundary-straddling near-identical pair (4, 5) is the documented
    // recall trade: cells block it, so it must NOT appear
    assert(!pairs.contains((4L, 5L)))
    // each pair exactly once, idA < idB
    val all = SemDedup.withinCellPairs(model(), corpus(), "id", "vec", Thr)
      .select("idA", "idB").as[(Long, Long)].collect().toSeq
    assert(all.size == all.toSet.size && all.forall(p => p._1 < p._2))
  }

  test("semanticDedup min-id default drops the higher id of each pair") {
    val kept = SemDedup.semanticDedup(model(), corpus(), "id", "vec", Thr)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L, 2L, 4L, 5L)) // 3 loses to 2, 6 loses to 1
  }

  test("semanticDedup keep-best: quality score overrides the min-id rule") {
    val kept = SemDedup.semanticDedup(model(), corpus(), "id", "vec", Thr,
        score = col("quality"))
      .select("id").as[Long].collect().toSet
    // pair (2,3): 3 has higher quality -> 2 dropped despite lower id;
    // pair (1,6): equal quality -> min id 1 kept
    assert(kept == Set(0L, 1L, 3L, 4L, 5L))
  }

  test("maxCellSize drops oversized cells as a logged coverage bound") {
    // cell 0 holds ids {0,2,3,4} (4 rows), cell 1 holds {1,5,6} (3 rows)
    val pairs = SemDedup.withinCellPairs(model(), corpus(), "id", "vec", Thr,
      maxCellSize = 3L)
    val got = pairs.select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 6L))) // cell 0 dropped entirely; cell 1 intact
  }

  test("plan: cell equi-join, no nested loop, no cross-cell comparison path") {
    val pairs = SemDedup.withinCellPairs(model(), corpus(), "id", "vec", Thr)
    pairs.collect()
    val p = pairs.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"within-cell pairing must never plan a nested loop:\n${p.take(1500)}")
    assert(p.contains("cell"), "join must key on the cell id")
  }

  test("q_semantic_dedup plan is cell-blocked too (driver-query shape)") {
    val out = SparkEntry.queries("q_semantic_dedup")(spark, sf)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"q_semantic_dedup must never compare across cells:\n${p.take(1500)}")
  }
}
