package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{HashedShingles, ScaledLn, TextFunctions, TokenizeWords}
import graft.ops.Lineage.CutSyntax

/** PMI collocation mining — the classical corpus-statistics readout
  * ("strongly associated adjacent word pairs") used to surface multi-word
  * expressions, template boilerplate, and tokenizer merge candidates:
  * `PMI(a,b) = ln(c_ab · N / (c_a· · c_·b))` over adjacent-pair events,
  * where `c_a·`/`c_·b` are the pair-position marginals and N the total
  * pair count — self-consistent probabilities that need no smoothing
  * because every scored pair occurs by construction.
  *
  * Cross-engine determinism: every ln is of an integer count, scaled once
  * to a long by the repo formula ([[ScaledLn]]), so `scaled_pmi` is exact
  * integer arithmetic ([[NgramLm]] discipline).
  *
  * Scale shape: counting runs entirely on 8-byte token hashes — ONE
  * persisted explode of adjacent hash pairs (one-pass [[HashedShingles]],
  * no token strings on the shuffle) feeds the pair count and both
  * marginals; the three count frames join on hashes. Token STRINGS enter
  * only at the end, for the top candidates: the candidate frame (≤
  * `candidateCap` rows) is broadcast against a distinct (hash, token)
  * vocabulary map, so the string shuffle is vocabulary-bounded and the
  * readout is human-readable. 64-bit hash collisions would merge two
  * tokens' counts — at ~4e9 distinct tokens expect one collision
  * (birthday bound), far below any count threshold's noise.
  *
  * The result is EXACT top-k by (scaled_pmi desc, w1, w2) whenever the
  * number of pairs passing `minCount` is ≤ `candidateCap`; above the cap,
  * candidates at the boundary PMI value are admitted in hash order before
  * the string tiebreak applies. Size the cap to k plus expected boundary
  * ties (top-k quality readouts want k ≪ cap anyway).
  */
object Collocations {

  /** Top-`k` adjacent-pair collocations of `textCol` by scaled PMI.
    * Output: (w1, w2, cnt, scaled_pmi), ordered by (scaled_pmi desc,
    * w1, w2). Pairs below `minCount` occurrences are dropped (rare pairs
    * have unreliable, inflated PMI).
    */
  def topPmi(
      df: DataFrame,
      textCol: String,
      minCount: Long = 5,
      k: Int = 20,
      candidateCap: Int = 1000): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1 && candidateCap >= k,
      s"need 1 <= k <= candidateCap, got k=$k cap=$candidateCap")
    val uni = HashedShingles(col(textCol), 1)
    val pairs = df
      .filter(size(TokenizeWords(col(textCol))) >= 2)
      .select(explode(zip_with(
        slice(uni, lit(1), size(uni) - 1),
        slice(uni, lit(2), size(uni) - 1),
        (a, b) => struct(a.as("u"), b.as("v")))).as("__p"))
      .select(col("__p.u").as("u"), col("__p.v").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n2 = pairs.count() // also materializes the persist
    val sN2 = if (n2 > 0) ScaledLn.long(n2) else 0L
    val pairCounts = pairs.groupBy("u", "v").agg(count(lit(1)).as("cnt"))
    val prefixCounts = pairs.groupBy("u").agg(count(lit(1)).as("cu"))
    val suffixCounts = pairs.groupBy("v").agg(count(lit(1)).as("cv"))
    val candidates = pairCounts
      .filter(col("cnt") >= minCount)
      .join(prefixCounts, Seq("u"))
      .join(suffixCounts, Seq("v"))
      .select(col("u"), col("v"), col("cnt"),
        (ScaledLn.column(col("cnt")) + lit(sN2) -
          ScaledLn.column(col("cu")) - ScaledLn.column(col("cv")))
          .as("scaled_pmi"))
      .orderBy(desc("scaled_pmi"), col("u"), col("v"))
      .limit(candidateCap)
    // strings only for the survivors: broadcast the tiny candidate frame
    // against the vocabulary map (map-side-partial distinct over tokens)
    val vocabMap = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .distinct()
      .select(xxhash64(col("w")).as("th"), col("w"))
    val withW1 = vocabMap.join(broadcast(candidates), col("th") === col("u"))
      .select(col("w").as("w1"), col("v"), col("cnt"), col("scaled_pmi"))
    val out = vocabMap.withColumnRenamed("w", "w2")
      .join(broadcast(withW1), col("th") === col("v"))
      .select(col("w1"), col("w2"), col("cnt"), col("scaled_pmi"))
      .orderBy(desc("scaled_pmi"), col("w1"), col("w2"))
      .limit(k)
    val collected = out.cutLineage()
    pairs.unpersist(blocking = false)
    collected
  }
}
