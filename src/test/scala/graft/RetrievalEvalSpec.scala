package graft

import org.apache.spark.sql.DataFrame
import graft.ops.RetrievalEval

class RetrievalEvalSpec extends SparkSpec {

  private val W = Seq(1000000L, 630930L, 500000L, 430677L, 386853L,
    356207L, 333333L, 315465L, 301030L, 289065L)
  private def gain(rel: Long): Long = (1L << rel) - 1L

  private def run(rows: Seq[(Long, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("qid", "doc_id", "rank")
  }
  private def rels(rows: Seq[(Long, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("qid", "doc_id", "rel")
  }

  private def eval(r: DataFrame, g: DataFrame, k: Int = 10): Map[Long, (Long, Long, Long, Option[Long])] =
    RetrievalEval.ndcgAtK(r, "qid", "doc_id", "rank", g, "qid", "doc_id", "rel", k)
      .collect().map(row => row.getLong(0) ->
        ((row.getLong(1), row.getLong(2), row.getLong(3),
          if (row.isNullAt(4)) None else Some(row.getLong(4))))).toMap

  test("perfect ranking scores ndcg_ppm = 1000000") {
    val g = rels(Seq((1L, "a", 3L), (1L, "b", 2L), (1L, "c", 1L)))
    val r = run(Seq((1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L)))
    val want = gain(3) * W(0) + gain(2) * W(1) + gain(1) * W(2)
    assert(eval(r, g) == Map(1L -> ((3L, want, want, Some(1000000L)))))
  }

  test("reversed ranking: exact integer dcg and ppm division") {
    val g = rels(Seq((1L, "a", 3L), (1L, "b", 2L), (1L, "c", 1L)))
    val r = run(Seq((1L, "c", 1L), (1L, "b", 2L), (1L, "a", 3L)))
    val dcg = gain(1) * W(0) + gain(2) * W(1) + gain(3) * W(2)
    val idcg = gain(3) * W(0) + gain(2) * W(1) + gain(1) * W(2)
    assert(eval(r, g) == Map(1L -> ((3L, dcg, idcg, Some(dcg * 1000000L / idcg)))))
  }

  test("unjudged retrieved docs contribute zero gain") {
    val g = rels(Seq((1L, "a", 2L)))
    val r = run(Seq((1L, "x", 1L), (1L, "a", 2L)))
    val dcg = gain(2) * W(1)
    val idcg = gain(2) * W(0)
    assert(eval(r, g)(1L) == ((1L, dcg, idcg, Some(dcg * 1000000L / idcg))))
  }

  test("corpus-wide ideal counts docs the run never retrieved") {
    // 12 grade-1 docs exist; run retrieves 2 of them at ranks 1-2, k=10:
    // ideal fills all 10 positions with grade 1
    val g = rels((1 to 12).map(i => (1L, s"d$i", 1L)))
    val r = run(Seq((1L, "d1", 1L), (1L, "d2", 2L)))
    val dcg = gain(1) * (W(0) + W(1))
    val idcg = W.take(10).map(gain(1) * _).sum
    assert(eval(r, g)(1L) == ((12L, dcg, idcg, Some(dcg * 1000000L / idcg))))
  }

  test("mixed-grade ideal: higher grades fill earlier ranks by count") {
    // grades: two 3s, one 2, many 1s — ideal is 3,3,2,1,1,...
    val g = rels(Seq((1L, "a", 3L), (1L, "b", 3L), (1L, "c", 2L)) ++
      (1 to 7).map(i => (1L, s"e$i", 1L)))
    val r = run(Seq((1L, "a", 1L)))
    val idcg = gain(3) * (W(0) + W(1)) + gain(2) * W(2) +
      (3 to 9).map(i => gain(1) * W(i)).sum
    assert(eval(r, g)(1L)._3 == idcg)
  }

  test("query with no relevant docs anywhere: null ndcg_ppm") {
    val g = rels(Seq((2L, "a", 1L))) // other query only
    val r = run(Seq((1L, "x", 1L)))
    assert(eval(r, g)(1L) == ((0L, 0L, 0L, None)))
  }

  test("ranks beyond k are ignored and queries are independent") {
    val g = rels(Seq((1L, "a", 1L), (2L, "b", 2L)))
    val r = run(Seq((1L, "a", 1L), (1L, "z", 3L), (2L, "b", 1L)))
    val m = eval(r, g, k = 2)
    assert(m(1L)._4.contains(1000000L) && m(2L)._4.contains(1000000L))
  }

  private def evalR(r: DataFrame, g: DataFrame, k: Int): Map[Long, (Long, Long, Option[Long], Long)] =
    RetrievalEval.recallAtK(r, "qid", "doc_id", "rank", g, "qid", "doc_id", k)
      .collect().map(row => row.getLong(0) ->
        ((row.getLong(1), row.getLong(2),
          if (row.isNullAt(3)) None else Some(row.getLong(3)), row.getLong(4)))).toMap

  test("recall@k: k-capped denominator, hits, and reciprocal rank") {
    // 3 relevant docs, run finds 2 of them at ranks 2 and 5 within k=5
    val g = rels(Seq((1L, "a", 1L), (1L, "b", 1L), (1L, "c", 1L)))
    val r = run(Seq((1L, "x", 1L), (1L, "a", 2L), (1L, "y", 3L), (1L, "z", 4L), (1L, "b", 5L)))
    assert(evalR(r, g, 5) == Map(1L ->
      ((3L, 2L, Some(2L * 1000000L / 3L), 1000000L / 2L))))
    // k=2: only the rank-2 hit counts; denominator caps at k=2
    assert(evalR(r, g, 2) == Map(1L -> ((3L, 1L, Some(500000L), 500000L))))
  }

  test("recall@k: perfect run reaches 1e6 even when n_rel exceeds k") {
    val g = rels((1 to 8).map(i => (1L, s"d$i", 1L)))
    val r = run((1 to 3).map(i => (1L, s"d$i", i.toLong)))
    assert(evalR(r, g, 3)(1L) == ((8L, 3L, Some(1000000L), 1000000L)))
  }

  test("recall@k: no hits and no relevant docs") {
    val g = rels(Seq((1L, "a", 1L)))
    // query 1: relevant exists but run misses it; query 2: nothing relevant
    val r = run(Seq((1L, "x", 1L), (2L, "y", 1L)))
    val m = evalR(r, g, 10)
    assert(m(1L) == ((1L, 0L, Some(0L), 0L)))
    assert(m(2L) == ((0L, 0L, None, 0L)))
  }

  test("k outside the literal weight table is rejected") {
    intercept[IllegalArgumentException] {
      RetrievalEval.ndcgAtK(run(Nil), "qid", "doc_id", "rank",
        rels(Nil), "qid", "doc_id", "rel", 11)
    }
  }
}
