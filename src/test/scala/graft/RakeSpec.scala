package graft

import graft.ops.Rake

/** Closed-form specs for RAKE keyword extraction. */
class RakeSpec extends SparkSpec {

  import spark.implicits._

  test("phrases split at stopwords and punctuation; degree/freq scores") {
    val docs = Seq(
      (1L, "Red apples grow. The red apples fall!"))
      .toDF("doc_id", "text")
    val got = Rake.keywords(docs, "doc_id", "text", topK = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    // Tokens: red apples grow . the red apples fall !
    // Phrases: [red apples grow], [red apples fall] (stop: the, . !).
    // freq/deg: red 2/6, apples 2/6, grow 1/3, fall 1/3 → each word
    // scores 3e6; both phrases score 9e6; tie breaks alphabetically.
    assert(got == Seq(
      ("red apples fall", 3L, 1L, 9000000L),
      ("red apples grow", 3L, 1L, 9000000L)))
  }

  test("repeated phrase aggregates occurrences; single words still score") {
    val docs = Seq(
      (1L, "data pipeline. data pipeline."),
      (2L, "pipeline"))
      .toDF("doc_id", "text")
    val got = Rake.keywords(docs, "doc_id", "text", topK = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    // data: freq 2, deg 4 → 2e6. pipeline: freq 3, deg 5 → 5e6/3 = 1666666.
    // "data pipeline" = 3666666 (2 occurrences), "pipeline" = 1666666.
    assert(got == Seq(
      ("data pipeline", 2L, 2L, 3666666L),
      ("pipeline", 1L, 1L, 1666666L)))
  }

  test("topK truncates with deterministic (score desc, phrase) order") {
    val docs = Seq((1L, "alpha. beta. gamma.")).toDF("doc_id", "text")
    val got = Rake.keywords(docs, "doc_id", "text", topK = 2)
      .as[(String, Long, Long, Long)].collect().toSeq
    // Three singleton phrases, all score 1e6; alphabetical, capped at 2.
    assert(got == Seq(("alpha", 1L, 1L, 1000000L), ("beta", 1L, 1L, 1000000L)))
  }
}
