package graft

import graft.ops.Bm25

/** Closed-form BM25 checks: scores recomputed by hand with the same
  * integer-rational construction (k1=6/5, b=3/4, Lucene idf), distinct
  * query terms, deterministic tiebreak, and top-k cutoff.
  */
class Bm25Spec extends SparkSpec {

  import spark.implicits._

  private def s(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6 + 0.5).toLong
  /** The operator's per-(doc, term) contribution, recomputed directly. */
  private def contrib(nDocs: Long, totS: Long, tf: Long, dl: Long, df: Long): Long = {
    val idf = s(2 * nDocs + 2) - s(2 * df + 1)
    val num = 22L * totS * tf
    val den = 10L * totS * tf + 3L * totS + 9L * nDocs * dl
    math.floor(idf.toDouble * num.toDouble / den.toDouble + 0.5).toLong
  }

  private val corpus = Seq(
    (1L, "apple banana apple"), (2L, "apple cherry"),
    (3L, "durian durian durian durian")).toDF("doc_id", "text")

  test("scores and ranking match the hand formula; tf and dl weight correctly") {
    // N=3, S=9; apple: df=2 (tf 2 in d1, 1 in d2)
    val queries = Seq((1L, "apple")).toDF("qid", "qtext")
    val (out, release) = Bm25.bm25TopK(corpus, "doc_id", "text",
      queries, "qid", "qtext", k = 10)
    val got = out.select("qid", "rank", "doc_id", "scaled_score")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    release()
    assert(got == Seq(
      (1L, 1L, 1L, contrib(3, 9, 2, 3, 2)),
      (1L, 2L, 2L, contrib(3, 9, 1, 2, 2))))
  }

  test("multi-term queries sum per doc; repeated query terms count once") {
    val queries = Seq((1L, "apple banana"), (2L, "apple apple")).toDF("qid", "qtext")
    val (out, release) = Bm25.bm25TopK(corpus, "doc_id", "text",
      queries, "qid", "qtext", k = 10)
    val got = out.select("qid", "rank", "doc_id", "scaled_score")
      .as[(Long, Long, Long, Long)].collect().toSet
    release()
    // q1: d1 gets apple+banana, d2 apple only; q2 ("apple apple") == "apple"
    assert(got == Set(
      (1L, 1L, 1L, contrib(3, 9, 2, 3, 2) + contrib(3, 9, 1, 3, 1)),
      (1L, 2L, 2L, contrib(3, 9, 1, 2, 2)),
      (2L, 1L, 1L, contrib(3, 9, 2, 3, 2)),
      (2L, 2L, 2L, contrib(3, 9, 1, 2, 2))))
  }

  test("equal scores tiebreak by ascending doc id; k cuts the tail") {
    val c2 = Seq((4L, "kiwi mango"), (5L, "kiwi mango"), (6L, "pear"))
      .toDF("doc_id", "text")
    val queries = Seq((1L, "kiwi")).toDF("qid", "qtext")
    val (top1, release1) = Bm25.bm25TopK(c2, "doc_id", "text",
      queries, "qid", "qtext", k = 1)
    assert(top1.select("doc_id").as[Long].collect().toSeq == Seq(4L))
    release1()
    val (top9, release9) = Bm25.bm25TopK(c2, "doc_id", "text",
      queries, "qid", "qtext", k = 9)
    assert(top9.select("doc_id").as[Long].collect().sorted.toSeq == Seq(4L, 5L))
    release9()
  }

  test("scale probe: 20k docs x 500 queries stays top-k-bounded") {
    // a query workload (not one ad-hoc query) against a real corpus
    // slice: output must be exactly <= k rows per query, ranks dense
    // from 1, and the whole thing one postings pass + one broadcast join
    val corpus = (0L until 20000L).map { i =>
      (i, (0 until 10).map(j => s"t${(i + j * 131) % 997}").mkString(" "))
    }.toDF("doc_id", "text").repartition(32)
    val queries = (0L until 500L).map { q =>
      (q, s"t${q % 997} t${(q * 7 + 13) % 997}")
    }.toDF("qid", "qtext")
    val (out, release) = Bm25.bm25TopK(corpus, "doc_id", "text",
      queries, "qid", "qtext", k = 10)
    val perQuery = out.groupBy("qid")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.max("rank").as("maxr"),
        org.apache.spark.sql.functions.min("rank").as("minr"))
      .as[(Long, Long, Long, Long)].collect()
    release()
    assert(perQuery.length == 500)
    assert(perQuery.forall { case (_, n, maxr, minr) =>
      n <= 10 && minr == 1 && maxr == n })
  }

  test("unknown query terms score nothing; no-match queries emit no rows") {
    val queries = Seq((1L, "nonexistent"), (2L, "apple nonexistent"))
      .toDF("qid", "qtext")
    val (out, release) = Bm25.bm25TopK(corpus, "doc_id", "text",
      queries, "qid", "qtext", k = 10)
    val got = out.select("qid", "doc_id", "scaled_score")
      .as[(Long, Long, Long)].collect().toSet
    release()
    assert(got == Set(
      (2L, 1L, contrib(3, 9, 2, 3, 2)), (2L, 2L, contrib(3, 9, 1, 2, 2))))
  }

  test("bm25TopKFromTf over a prebuilt index equals the one-shot path") {
    val queries = Seq((1L, "apple banana"), (2L, "cherry")).toDF("qid", "qtext")
    val (oneShot, release) = Bm25.bm25TopK(corpus, "doc_id", "text",
      queries, "qid", "qtext", k = 10)
    val expected = oneShot.collect().map(_.toSeq).toSet
    release()
    // build once, query twice — second batch sees the same index
    val tf = Bm25.tfPostings(corpus, "doc_id", "text")
    val fromTf = Bm25.bm25TopKFromTf(tf, "doc_id", queries, "qid", "qtext", 10)
    assert(fromTf.collect().map(_.toSeq).toSet == expected)
    val again = Bm25.bm25TopKFromTf(tf, "doc_id", queries, "qid", "qtext", 10)
    assert(again.collect().map(_.toSeq).toSet == expected)
  }
}
