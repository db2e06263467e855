package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

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
}
