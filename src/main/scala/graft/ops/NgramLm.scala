package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{HashedShingles, TextFunctions}

/** In-corpus unigram language-model scoring — the CCNet-style perplexity
  * filter shape without an external model: each document is scored by its
  * tokens' log-likelihood under the corpus's OWN unigram distribution,
  * `logprob = Σ ln cnt(tᵢ) − n·ln(total)`, and the low-likelihood tail
  * (gibberish, encoding junk, off-distribution boilerplate) is flagged.
  * Plug in an external LM by substituting the vocab frame.
  *
  * Cross-engine determinism: floating sums across distributed rows are
  * partition-order dependent, so nothing here ever sums raw doubles. Each
  * DISTINCT token count is scaled once (`floor(ln(cnt)·1e6 + 0.5)` — the
  * repo's engine-agnostic rounding formula) to a long, per-doc scores are
  * exact long sums of those, and `ln(total)` enters as one scaled constant.
  * A 1-ulp libm divergence between engines only matters if some `ln(cnt)`
  * lands within 2⁻⁵² of a rounding boundary at 1e6 scale — odds per
  * distinct count value ≈ 3e-9.
  *
  * Scale shape: ONE explode pass of per-token 64-bit hashes (one-pass
  * [[HashedShingles]] with n=1 — tokenize once per doc, no token strings
  * on the wire), persisted and reused for the vocabulary aggregate and the
  * score join. The vocab join is NOT pinned broadcast: a bounded corpus
  * vocabulary auto-broadcasts (AQE size estimate), a web-scale one falls
  * back to a hash join on the 8-byte key. Hot tokens are by definition the
  * skewed keys — partial aggregation absorbs them map-side in the vocab
  * count, and AQE skew-split covers the join.
  */
object NgramLm {

  /** Per-token 64-bit hashes (empty array for zero-token docs) — the
    * explode input of every unigram path and the vocabulary builder.
    */
  private def tokenHashArray(textCol: Column): Column =
    TextFunctions.tokenHashes(textCol)

  /** (th, cnt) unigram vocabulary of `df` — the frame
    * [[unigramScoresWithVocab]] consumes. Build it ONCE on the reference
    * corpus (or persist it as parquet) and reuse it across scoring jobs.
    */
  def tokenVocabulary(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokenHashArray(col(textCol))).as("th"))
      .groupBy("th").agg(count(lit(1)).as("cnt"))

  /** Score against a CALLER-SUPPLIED vocabulary — the real CCNet shape:
    * the LM is estimated on a fixed reference corpus (train on A) and the
    * target corpus is scored against it (score B), instead of against its
    * own distribution like [[unigramScores]]. `vocab` needs (th, cnt)
    * columns as produced by [[tokenVocabulary]]; counts must be >= 1.
    *
    * Out-of-vocabulary tokens contribute a scaled token score of
    * 0 = ln(1), i.e. they are priced as count-1 tokens (probability
    * 1/total) — a deterministic, engine-portable floor; `n_oov` reports
    * how many, so callers can additionally threshold on OOV rate.
    * Per-doc output: (idCol, carryCols…, n_tokens, n_oov,
    * scaled_logprob), for docs with >= 1 token.
    *
    * Same integer discipline as [[unigramScores]]. The target-side token
    * explode is consumed exactly once, but `vocab` is consumed TWICE
    * (the total-count job and the scoring join) — it is persisted here
    * for the duration so a lazy [[tokenVocabulary]] lineage does not
    * re-scan the reference corpus; the returned release handle follows
    * the family contract (call after the terminal action). The vocab
    * join is unpinned — AQE broadcasts a bounded reference vocabulary, a
    * web-scale one hash-joins on the 8-byte key.
    */
  def unigramScoresWithVocab(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vocab: DataFrame,
      carryCols: Seq[String] = Nil): (DataFrame, () => Unit) = {
    val v = vocab.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = v.agg(coalesce(sum("cnt"), lit(0L))).head.getLong(0)
    val lnTotalScaled =
      if (total > 0) graft.functions.ScaledLn.long(total) else 0L
    val out = df.select(col(idCol) +: carryCols.map(col) :+
        explode(tokenHashArray(col(textCol))).as("th"): _*)
      .join(v.select(col("th"),
        graft.functions.ScaledLn.column(col("cnt")).as("__tok_score")), Seq("th"), "left")
      .groupBy(idCol, carryCols: _*)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__tok_score").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(coalesce(col("__tok_score"), lit(0L))).as("__sum_tok"))
      .withColumn("scaled_logprob",
        col("__sum_tok") - col("n_tokens") * lit(lnTotalScaled))
      .drop("__sum_tok")
    (out, () => { v.unpersist(blocking = false); () })
  }

  /** Per-doc token Shannon entropy in EXACT integer arithmetic — the
    * Gopher-family "gibberish / template spam" quality signal one step up
    * from the repetition ratio: `H = ln(n) − (1/n) Σ_t c_t ln(c_t)` over
    * the doc's token counts (0 for a single repeated token, ln(n) for
    * all-distinct tokens). Emitted as `scaled_entropy_num` =
    * `n·s(n) − Σ c·s(c)` with `s(x) = floor(ln(x)·1e6 + 0.5)` — i.e.
    * `n · 1e6 · H` up to per-term rounding — so values cross engines
    * exactly; recover `H = scaled_entropy_num / (n · 1e6)`.
    *
    * Plan: one explode of per-token 64-bit hashes, one (doc, token-hash)
    * count aggregate (map-side partials absorb repeated tokens), one
    * per-doc aggregate. Output: (idCol, carryCols…, n_tokens,
    * scaled_entropy_num), docs with >= 1 token.
    */
  def tokenEntropy(
      df: DataFrame,
      idCol: String,
      textCol: String,
      carryCols: Seq[String] = Nil): DataFrame = {
    def s(c: Column): Column = graft.functions.ScaledLn.column(c)
    df.select(col(idCol) +: carryCols.map(col) :+
        explode(tokenHashArray(col(textCol))).as("th"): _*)
      .groupBy(col(idCol) +: carryCols.map(col) :+ col("th"): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(idCol, carryCols: _*)
      .agg(sum("__c").as("n_tokens"),
        sum(col("__c") * s(col("__c"))).as("__sum_clnc"))
      .withColumn("scaled_entropy_num",
        col("n_tokens") * s(col("n_tokens")) - col("__sum_clnc"))
      .drop("__sum_clnc")
  }

  /** Per-doc (idCol, carryCols…, n_tokens, scaled_logprob) for docs with
    * >= 1 token; `scaled_logprob` is the 1e6-scaled integer log-likelihood
    * described above. Returns a release handle for the persisted token
    * pairs — call it after the terminal action.
    */
  def unigramScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      carryCols: Seq[String] = Nil): (DataFrame, () => Unit) = {
    val pairs = df
      .select(col(idCol) +: carryCols.map(col) :+
        explode(tokenHashArray(col(textCol))).as("th"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = pairs.groupBy("th").agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(coalesce(sum("cnt"), lit(0L))).head.getLong(0)
    val lnTotalScaled =
      if (total > 0) graft.functions.ScaledLn.long(total) else 0L
    val out = pairs
      .join(
        vocab.select(col("th"),
          graft.functions.ScaledLn.column(col("cnt")).as("__tok_score")),
        Seq("th"))
      .groupBy(idCol, carryCols: _*)
      .agg(count(lit(1)).as("n_tokens"), sum("__tok_score").as("__sum_tok"))
      .withColumn("scaled_logprob",
        col("__sum_tok") - col("n_tokens") * lit(lnTotalScaled))
      .drop("__sum_tok")
    (out, () => { pairs.unpersist(blocking = false); () })
  }

  /** CCNet-style perplexity bucketing: split each language's documents into
    * `buckets` quality tiers (bucket 1 = lowest perplexity = "head",
    * last = "tail") by per-token log-likelihood — the published CCNet
    * pipeline step that follows LM scoring (the head third trains, the
    * tail third is dropped or down-weighted).
    *
    * The sort key is `scaled_logprob / n_tokens` computed as ONE double
    * division of a long by a long — a single IEEE-754 op, bit-identical
    * across engines — with `idCol` as the total-order tiebreak, so exact
    * mode reproduces in any SQL engine.
    *
    * `exact = true`: `ntile(buckets)` over a per-partition window — one
    * global sort per language, the same cost class as any ranked readout;
    * this is the oracle-checkable mode. `exact = false` (the 100 TB
    * default): per-language bucket thresholds come from ONE
    * `percentile_approx` aggregate (bounded sketch state, no global
    * sort), broadcast back and assigned by comparison — CCNet itself
    * estimates thresholds on a sample, not a total order. Approx
    * assignments can differ from exact near bucket boundaries (sketch
    * error) and split ties by key value only; bucket POPULATIONS are
    * approximate, the ordering invariant (higher key ⇒ never a later
    * bucket) still holds.
    *
    * Input is a scores frame from [[unigramScores]] /
    * [[unigramScoresWithVocab]] / [[bigramScores]] (any frame with
    * `scoreCol`, `nTokensCol`, `idCol`, and the partition columns).
    * Output: input columns + `ppl_bucket` (1-based).
    */
  def pplBuckets(
      scores: DataFrame,
      partitionCols: Seq[String],
      idCol: String,
      buckets: Int = 3,
      nTokensCol: String = "n_tokens",
      scoreCol: String = "scaled_logprob",
      exact: Boolean = false): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val key = col(scoreCol).cast("double") / col(nTokensCol)
    if (exact) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(partitionCols.map(col): _*)
        .orderBy(key.desc, col(idCol))
      scores.withColumn("ppl_bucket", ntile(buckets).over(w))
    } else {
      val ps = (1 until buckets).map(_.toDouble / buckets)
      val thresholds = scores
        .groupBy(partitionCols.map(col): _*)
        .agg(percentile_approx(key * -1d, // ascending-perplexity quantiles
          array(ps.map(lit): _*), lit(10000)).as("__ts"))
      val joined = scores.join(broadcast(thresholds), partitionCols)
      // bucket = 1 + #thresholds strictly below this doc's quality
      val negKey = key * -1d
      val rank = (0 until buckets - 1)
        .map(i => when(negKey > element_at(col("__ts"), i + 1), 1).otherwise(0))
        .reduce(_ + _)
      joined.withColumn("ppl_bucket", rank + 1).drop("__ts")
    }
  }

  /** Conditional bigram log-likelihood — one order up the KenLM ladder from
    * [[unigramScores]]: `Σᵢ ln P(tᵢ|tᵢ₋₁) = Σ ln cnt₂(tᵢ₋₁tᵢ) − Σ
    * ln cnt₁(tᵢ₋₁)` with MLE counts from the corpus itself (prefix counts
    * are counted over bigram HISTORIES, so per-history probabilities sum
    * to 1 — self-consistent without smoothing, because every numerator
    * bigram exists in the corpus by construction). Docs need >= 2 tokens.
    *
    * Same integer discipline and plan shape as unigram: one persisted
    * explode of (prefix-hash, bigram-hash) structs — both hash arrays come
    * from one-pass [[HashedShingles]] evaluated as zip_with ARGUMENTS (not
    * inside the lambda, where they would re-run per element) — then two
    * unpinned count joins on 8-byte keys.
    */
  def bigramScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      carryCols: Seq[String] = Nil): (DataFrame, () => Unit) = {
    val uni = HashedShingles(col(textCol), 1)
    val bi = HashedShingles(col(textCol), 2)
    val pairs = df
      .filter(size(graft.functions.TokenizeWords(col(textCol))) >= 2)
      .select(col(idCol) +: carryCols.map(col) :+
        explode(zip_with(slice(uni, lit(1), size(uni) - 1), bi,
          (u, b) => struct(u.as("u"), b.as("b")))).as("__p"): _*)
      .select(col("*"), col("__p.u").as("__u"), col("__p.b").as("__b"))
      .drop("__p")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val prefixCounts = pairs.groupBy("__u").agg(count(lit(1)).as("cu"))
    val bigramCounts = pairs.groupBy("__b").agg(count(lit(1)).as("cb"))
    val out = pairs
      .join(prefixCounts.select(col("__u"),
        graft.functions.ScaledLn.column(col("cu")).as("__su")), Seq("__u"))
      .join(bigramCounts.select(col("__b"),
        graft.functions.ScaledLn.column(col("cb")).as("__sb")), Seq("__b"))
      .groupBy(idCol, carryCols: _*)
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__sb") - col("__su")).as("scaled_logprob"))
    (out, () => { pairs.unpersist(blocking = false); () })
  }
}
