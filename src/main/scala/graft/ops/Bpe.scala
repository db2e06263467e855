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

  /** Ceiling on the batched trainer's admission-horizon collect (see
    * [[trainMergesBatched]]'s in-line doc): ~1M (a, b, n) rows ≈ tens of
    * MB on the driver — 2048x the largest batch, 6x above the largest
    * horizon a measured production train needed. */
  private val MaxHorizon = 1 << 20

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

  /** BATCHED training: up to `mergesPerRound` pairwise NON-INTERACTING
    * merges applied per driver round, so a `merges`-sized tokenizer costs
    * ceil(merges / mergesPerRound) sequential Spark jobs instead of
    * `merges` — the amortization that makes a 32k-merge production
    * train feasible: the caps allow it (merges <= 32768, K <= 512), with
    * ceil(merges/K) rounds the LOWER bound. In practice the admission
    * guard, not K, sizes each batch (early rounds can admit at most
    * |alphabet|/2 disjoint pairs, ramping as merges mint new symbols) —
    * dev/BPE_BATCH.md measures a 4096-merge K=512 train completing in 77
    * driver rounds (53x fewer than sequential) at ~2.1 s/round.
    *
    * Batch admission (the non-interaction guard): candidates are scanned
    * in (n DESC, a, b) order — the sequential trainer's exact order — and
    * a pair is ADMITTED iff its symbols AND its concatenation are disjoint
    * from every earlier admit's symbols and concatenations. Symbol
    * disjointness makes the admitted merges commute (no occurrence of one
    * pair overlaps another, so one vocabulary rewrite pass applies them
    * all with the same result as any sequential order); the concatenation
    * guard additionally keeps a batch from containing both (a,b) and
    * (ab,x) — whose single-pass result would depend on creation order.
    *
    * Divergence contract vs [[trainMerges]] (the standard distributed-BPE
    * approximation, documented not hidden): within a batch, counts are
    * frozen at round start. The sequential trainer re-counts after every
    * merge, so it can interleave a NEWLY-CREATED pair (one involving a
    * just-merged token — count always <= its creator's) ahead of a lower
    * batch admit, or re-pick a SKIPPED overlapping pair immediately. When
    * every admitted count strictly exceeds the best newly-creatable and
    * skipped count, batch == sequential exactly (BpeBatchSpec pins this
    * on designed fixtures, and K=1 == [[trainMerges]] unconditionally).
    *
    * Output schema matches [[trainMerges]]: (round, tok_a, tok_b, n) with
    * `round` the GLOBAL 1-based merge index in admission order and `n`
    * the pair count at its batch's round start.
    */
  def trainMergesBatched(
      df: DataFrame,
      textCol: String,
      merges: Int,
      mergesPerRound: Int): DataFrame = {
    require(merges >= 1 && merges <= 32768, s"merges must be in [1,32768], got $merges")
    require(mergesPerRound >= 1 && mergesPerRound <= 512,
      s"mergesPerRound must be in [1,512], got $mergesPerRound")
    val spark = df.sparkSession
    import spark.implicits._
    val chain = Lineage.chain() // each round's vocab supersedes the last
    var vocab = initialVocab(df, textCol, chain)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    while (out.size < merges && !exhausted) {
      val want = math.min(mergesPerRound, merges - out.size)
      // Candidate horizon with a COMPLETENESS loop: admission must see
      // the full (n desc, a, b) order — one admitted pair can conflict
      // with unboundedly many later candidates (a hot shared symbol), so
      // a fixed horizon can silently shrink the batch and diverge from
      // the documented full-order admission. Start at 8x the batch and
      // re-collect 4x wider until either the batch fills or the fetch
      // came back short of the horizon (= ALL candidates were scanned).
      // The widening is CAPPED at MaxHorizon so the driver collect stays
      // bounded even on adversarial vocabularies (millions of distinct
      // pairs, nearly all sharing one hot symbol): past the cap the
      // batch is allowed to shrink — logged loudly, still CORRECT (the
      // next round re-counts; smaller batches cost extra rounds, never
      // wrong merges). Measured production trains (dev/BPE_BATCH.md)
      // topped out at ~170k-candidate horizons, 6x under the cap.
      def admit(cands: Array[org.apache.spark.sql.Row])
          : scala.collection.mutable.ArrayBuffer[(String, String, Long)] = {
        val guard = scala.collection.mutable.Set.empty[String]
        val picked = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var i = 0
        while (i < cands.length && picked.size < want) {
          val (a, b, n) = (cands(i).getString(0), cands(i).getString(1),
            cands(i).getLong(2))
          if (!guard(a) && !guard(b) && !guard(a + b)) {
            picked += ((a, b, n))
            guard ++= Seq(a, b, a + b)
          }
          i += 1
        }
        picked
      }
      val ordered = pairCountFrame(vocab).orderBy(col("n").desc, col("a"), col("b"))
      var horizon = math.max(8 * want, 64)
      var cands = ordered.limit(horizon).collect()
      var picked = admit(cands)
      while (picked.size < want && cands.length == horizon && horizon < MaxHorizon) {
        horizon = math.min(horizon * 4, MaxHorizon)
        cands = ordered.limit(horizon).collect()
        picked = admit(cands)
      }
      if (picked.size < want && cands.length == horizon)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"[graft.bpe] admission horizon capped at $MaxHorizon candidates " +
            s"with the batch unfilled (${picked.size}/$want): accepting the " +
            "smaller batch — next round re-counts (correctness unaffected, " +
            "round count grows)")
      if (cands.isEmpty) exhausted = true
      else {
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"[graft.bpe] batch round: admitted ${picked.size}/$want " +
            s"(total ${out.size + picked.size}/$merges, horizon $horizon, " +
            s"candidates ${cands.length})")
        picked.foreach { case (a, b, n) => out += ((out.size + 1, a, b, n)) }
        // one rewrite pass for the whole batch: rule table rides as a map
        // literal keyed "a b" (the separator cannot appear inside a
        // symbol — symbols come from split on "", never containing NUL)
        val rules = map(picked.toSeq.flatMap { case (a, b, _) =>
          Seq(lit(a + " " + b), lit(a + b))
        }: _*)
        vocab = chain.cut(vocab.withColumn("syms",
          aggregate(col("syms"), array().cast("array<string>"), (acc, x) => {
            val last = get(acc, size(acc) - 1)
            // concat(NULL, ...) is NULL and element_at(m, NULL) is NULL,
            // so the empty-acc head lands in otherwise — same null
            // convention as the sequential fold
            val rep = element_at(rules, concat(last, lit(" "), x))
            when(rep.isNotNull,
              concat(slice(acc, lit(1), size(acc) - 1), array(rep)))
              .otherwise(concat(acc, array(x)))
          })))
      }
    }
    out.toSeq.toDF("round", "tok_a", "tok_b", "n")
  }

  /** The corpus collapsed to its vocabulary: (w, cnt, syms) with syms the
    * character split — the frame every training round aggregates over. */
  private def initialVocab(
      df: DataFrame, textCol: String, chain: Lineage.Chain): DataFrame =
    chain.cut(df.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"), split(col("w"), "").as("syms")))

  /** Adjacent-symbol pair counts over the vocab frame: (a, b, n), a != b
    * (the overlap-free candidate set — see [[trainMerges]]). */
  private def pairCountFrame(vocab: DataFrame): DataFrame =
    vocab
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"),
        explode(transform(sequence(lit(1), size(col("syms")) - 1), i =>
          struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b")))).as("p"))
      .filter(col("p.a") =!= col("p.b"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("cnt").as("n"))

  /** The shared training loop: returns the merge table AND the final
    * vocabulary frame (w, cnt, syms — syms rewritten by every executed
    * merge). */
  private def trainWithVocab(
      df: DataFrame,
      textCol: String,
      rounds: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    require(rounds >= 1 && rounds <= 64, s"rounds must be in [1,64], got $rounds")
    val chain = Lineage.chain() // each round's vocab supersedes the last
    var vocab = initialVocab(df, textCol, chain)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = pairCountFrame(vocab)
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, a, b, n))
        val next = chain.cut(vocab.withColumn("syms",
          aggregate(col("syms"), array().cast("array<string>"), (acc, x) =>
            // get() is 0-based and NULL on empty acc (never an ANSI
            // out-of-bounds error), and null === a is null -> otherwise
            when(get(acc, size(acc) - 1) === lit(a) && x === lit(b),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
              .otherwise(concat(acc, array(x))))))
        vocab = next
        r += 1
      }
    }
    (merges.toSeq, vocab)
  }
}
