package graft

import graft.ops.Mmr

/** Closed-form specs for MMR diversified re-ranking. */
class MmrSpec extends SparkSpec {

  import spark.implicits._

  // Shortlist for one query at [1,0]: A is a perfect hit, B is a
  // near-duplicate of A, C is diverse but less relevant.
  private def shortlist = Seq(
    (1L, 10L, 1.0, Seq(1.0, 0.0)),            // A
    (1L, 20L, 0.9999995, Seq(1.0, 0.001)),    // B ~ A
    (1L, 30L, 0.6, Seq(3.0, 4.0)))            // C diverse
    .toDF("qid", "id", "rel", "v")

  test("low lambda demotes the near-duplicate in favor of the diverse pick") {
    val got = Mmr.diversify(shortlist, "qid", "id", "rel", "v", k = 3, lambda = 0.3)
      .as[(Long, Long, Long)].collect().sortBy(_._2).toSeq
    // step1: A (pure relevance). step2: B scores 0.3·~1 − 0.7·~1 ≈ −0.4,
    // C scores 0.3·0.6 − 0.7·0.6 = −0.24 → C. step3: B (last remaining).
    assert(got == Seq((1L, 1L, 10L), (1L, 2L, 30L), (1L, 3L, 20L)))
  }

  test("lambda = 1 reduces to pure relevance order") {
    val got = Mmr.diversify(shortlist, "qid", "id", "rel", "v", k = 3, lambda = 1.0)
      .as[(Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(got == Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L)))
  }

  test("queries are independent; k caps picks; ties break by id") {
    val two = shortlist.union(Seq(
      (2L, 7L, 0.5, Seq(0.0, 1.0)),
      (2L, 5L, 0.5, Seq(0.0, 1.0))) // exact tie with 7 → lower id first
      .toDF("qid", "id", "rel", "v"))
    val got = Mmr.diversify(two, "qid", "id", "rel", "v", k = 2, lambda = 0.5)
      .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq((1L, 1L, 10L), (1L, 2L, 30L), (2L, 1L, 5L), (2L, 2L, 7L)))
  }
}
