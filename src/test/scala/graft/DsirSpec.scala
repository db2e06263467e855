package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dsir, NgramLm}

/** Specs for DSIR importance resampling: closed-form scaled weights with
  * OOV pricing, deterministic top-k, threshold-based fraction selection,
  * and reproducible Gumbel resampling keys.
  */
class DsirSpec extends SparkSpec {

  import spark.implicits._

  // s(x) = floor(ln(x)*1e6 + 0.5): s(1)=0, s(2)=693147, s(3)=1098612
  test("importance weights match the closed form incl. OOV pricing") {
    val target = Seq((1L, "a a b")).toDF("doc_id", "text") // a:2 b:1, total 3
    val raw = Seq((2L, "a c")).toDF("doc_id", "text") // a:1 c:1, total 2
    val cand = Seq((10L, "a b c d"), (11L, "")).toDF("doc_id", "text")
    val (w, release) = Dsir.importanceWeights(cand, "doc_id", "text",
      NgramLm.tokenVocabulary(target, "text"),
      NgramLm.tokenVocabulary(raw, "text"))
    val got = w
      .select("doc_id", "n_tokens", "n_oov_target", "n_oov_raw", "scaled_weight")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    release()
    // doc 10: Σdelta = s(2)−s(1) [a] + s(1)−0 [b, raw-OOV] + 0−s(1) [c,
    // target-OOV] + 0 [d, both-OOV] = 693147; n·(s(3)−s(2)) = 4·405465;
    // weight = 693147 − 1621860. Zero-token doc 11 is excluded.
    assert(got == Seq((10L, 4L, 2L, 2L, -928713L)))
  }

  test("selectTopK breaks weight ties by id; selectFraction is downward-closed") {
    val w = (1L to 100L).map(i => (i, (i % 10) * 1000L))
      .toDF("doc_id", "scaled_weight").repartition(7)
    val top = Dsir.selectTopK(w, "doc_id", 12)
      .select("doc_id").as[Long].collect().toSeq
    // weight 9000 ids: 9,19,...,99 (ten of them), then the two smallest
    // ids of the 8000 tier: 8, 18.
    assert(top == Seq(9L, 19L, 29L, 39L, 49L, 59L, 69L, 79L, 89L, 99L, 8L, 18L))
    val kept = Dsir.selectFraction(w, 0.3)
      .select("scaled_weight").as[Long].collect().toSeq
    val minKept = kept.min
    val dropped = w.filter(col("scaled_weight") < minKept).count()
    // Every dropped row is strictly below every kept row, and the split
    // covers all 100 rows (threshold semantics, not a sampling).
    assert(kept.size + dropped == 100)
    assert(kept.size >= 20 && kept.size <= 40) // ~30 modulo sketch ties
  }

  test("gumbel keys are reproducible per (id, seed) and vary with the seed") {
    val w = (1L to 500L).map(i => (i, 0L)).toDF("doc_id", "scaled_weight")
    def keys(seed: Long, parts: Int): Map[Long, Long] =
      Dsir.withGumbelKey(w.repartition(parts), "doc_id", seed)
        .select("doc_id", "gumbel_key").as[(Long, Long)].collect().toMap
    val a = keys(42L, 3)
    val b = keys(42L, 17) // different physical layout, same draw
    assert(a == b)
    val c = keys(43L, 3)
    assert((1L to 500L).count(i => a(i) != c(i)) > 450)
    // With equal base weights the selection is a pure pseudo-random draw:
    // a fresh seed reshuffles which ids win.
    val selA = Dsir.selectTopK(
      Dsir.withGumbelKey(w, "doc_id", 42L)
        .withColumn("scaled_weight", col("gumbel_key")), "doc_id", 50)
      .select("doc_id").as[Long].collect().toSet
    val selC = Dsir.selectTopK(
      Dsir.withGumbelKey(w, "doc_id", 43L)
        .withColumn("scaled_weight", col("gumbel_key")), "doc_id", 50)
      .select("doc_id").as[Long].collect().toSet
    assert(selA != selC)
  }
}
