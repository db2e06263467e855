package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.ops.Lineage.CutSyntax

/** BPE merge-candidate statistics — iteration 0 of byte-pair-encoding
  * tokenizer training at corpus scale: adjacent character-pair counts
  * weighted by word frequency, whose argmax is the first BPE merge. Real
  * BPE training loops this count-merge cycle; the per-iteration count is
  * the corpus-scale step (the merge itself mutates a vocab-sized table and
  * is driver-side in every published trainer).
  *
  * Scale shape: the corpus collapses to its VOCABULARY first — one explode
  * of word tokens into a (word, cnt) hash aggregate whose map-side
  * partials absorb hot words — and the character-pair explode runs over
  * vocab entries only (explode factor = avg word length, on a
  * vocabulary-bounded frame, not the corpus). The per-element `substr`
  * lambda is interpreted, which is why keeping it off the corpus matters.
  * Counts are exact integers; no floats anywhere.
  */
object Bpe {

  /** Top-`k` adjacent character pairs by weighted occurrence count.
    * Output: (pair, n_types, n_occurrences) — `n_types` = distinct words
    * containing the pair, `n_occurrences` = corpus occurrences (word
    * frequency × positions in word) — ordered by (n_occurrences desc,
    * pair), a total order because `pair` is unique per row, so top-k is
    * exact with no candidate cap.
    */
  def pairCounts(df: DataFrame, textCol: String, k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val vocab = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    vocab
      .filter(length(col("w")) >= 2)
      .select(col("w"), col("cnt"),
        explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair")
      .agg(countDistinct(col("w")).as("n_types"),
        sum(col("cnt")).as("n_occurrences"))
      .orderBy(desc("n_occurrences"), col("pair"))
      .limit(k)
  }

  /** The full BPE training loop: `rounds` count-merge cycles over the
    * vocabulary frame. Each round counts adjacent symbol pairs weighted by
    * word frequency (one hash aggregate over the vocab — NEVER the
    * corpus), picks the most frequent pair (deterministic tiebreak on the
    * pair itself), and rewrites every word's symbol sequence with the
    * merge applied.
    *
    * Two deliberate, documented exactness choices:
    *   - only pairs with `a != b` are merge candidates, so occurrences can
    *     never overlap and "replace every occurrence simultaneously" is
    *     well-defined — the left-fold application below IS greedy
    *     left-to-right replacement, bit-identical to the SQL oracle's
    *     lag-based simultaneous rewrite (standard BPE admits `aa` merges
    *     and resolves overlap by scan order, an order a declarative
    *     cross-engine oracle cannot pin);
    *   - the merged symbol is strictly longer than either side, so a
    *     round's output can never re-trigger its own merge.
    *
    * Scale shape: the corpus collapses to (word, cnt) once; every round is
    * a vocab-bounded aggregate + a 1-row `collect()` (the chosen pair — the
    * same bounded-model pattern as [[IvfIndex]] centroids) + a map over
    * vocab rows. [[Lineage.cut]] per round truncates the iterative
    * lineage exactly like [[PageRank]].
    *
    * @return one row per executed round: (round INT, tok_a, tok_b, n LONG)
    *         — the merge table, i.e. the trained tokenizer.
    */
  def trainMerges(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    trainWithVocab(df, textCol, rounds)._1.toDF("round", "tok_a", "tok_b", "n")
  }

  /** [[trainMerges]] plus the corpus-level compression readout: symbol
    * counts before/after applying the learned merges, weighted by word
    * frequency — "how much did k merges shrink the token stream". One
    * row; every figure an exact integer (chars-before = word length,
    * symbols-after = final vocab frame).
    */
  def trainAndApplyStats(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val (_, vocab) = trainWithVocab(df, textCol, rounds)
    vocab
      .agg(count(lit(1)).as("n_types"), sum("cnt").as("n_tokens"),
        sum(col("cnt") * length(col("w"))).as("syms_before"),
        sum(col("cnt") * size(col("syms"))).as("syms_after"))
      .withColumn("saved_ppm",
        expr("(1000000 * (syms_before - syms_after)) div syms_before"))
  }

  /** The shared training loop: returns the merge table AND the final
    * vocabulary frame (w, cnt, syms — syms rewritten by every executed
    * merge). */
  private def trainWithVocab(
      df: DataFrame,
      textCol: String,
      rounds: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    require(rounds >= 1 && rounds <= 64, s"rounds must be in [1,64], got $rounds")
    var vocab = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"), split(col("w"), "").as("syms"))
      .cutLineage()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = vocab
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"),
          explode(transform(sequence(lit(1), size(col("syms")) - 1), i =>
            struct(element_at(col("syms"), i).as("a"),
              element_at(col("syms"), i + 1).as("b")))).as("p"))
        .filter(col("p.a") =!= col("p.b")) // overlap-free candidates only
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, a, b, n))
        val next = vocab.withColumn("syms",
          aggregate(col("syms"), array().cast("array<string>"), (acc, x) =>
            // get() is 0-based and NULL on empty acc (never an ANSI
            // out-of-bounds error), and null === a is null -> otherwise
            when(get(acc, size(acc) - 1) === lit(a) && x === lit(b),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
              .otherwise(concat(acc, array(x)))))
          .cutLineage()
        vocab = next
        r += 1
      }
    }
    (merges.toSeq, vocab)
  }
}
