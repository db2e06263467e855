package graft

import graft.ops.Rrf

/** Closed-form specs for reciprocal-rank fusion. */
class RrfSpec extends SparkSpec {

  import spark.implicits._

  test("fuses two runs with integer contributions; n_runs counts sources") {
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("qid", "id", "rank")
    val b = Seq((1L, 20L, 1L), (1L, 30L, 2L)).toDF("qid", "id", "rank")
    val got = Rrf.fuse(Seq(a, b), "qid", "id", rrfK = 0, topK = 10)
      .select("qid", "rank", "id", "scaled_rrf", "n_runs")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    // id 20: 1e9/2 + 1e9/1 = 1.5e9; id 10: 1e9; id 30: 5e8.
    assert(got == Seq(
      (1L, 1L, 20L, 1500000000L, 2L),
      (1L, 2L, 10L, 1000000000L, 1L),
      (1L, 3L, 30L, 500000000L, 1L)))
  }

  test("ties break by id; topK truncates; default rrfK=60 divides as longs") {
    val a = Seq((1L, 5L, 1L), (1L, 3L, 1L), (2L, 9L, 4L)).toDF("qid", "id", "rank")
    // Duplicate rank-1 rows in one run (e.g. a merged run) tie exactly.
    val got = Rrf.fuse(Seq(a), "qid", "id", topK = 1)
      .select("qid", "rank", "id", "scaled_rrf")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // 1e9 div 61 = 16393442 (floor), 1e9 div 64 = 15625000.
    assert(got == Seq((1L, 1L, 3L, 16393442L), (2L, 1L, 9L, 15625000L)))
  }
}
