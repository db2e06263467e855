package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{HashedShingles, TextFunctions}

/** Corpus-level boilerplate detection: word n-grams whose DOCUMENT
  * frequency exceeds a fraction of the corpus are "common" (headers,
  * footers, license blurbs, navigation text), and a document's boilerplate
  * share is the fraction of its distinct n-grams that are common — the
  * cross-document complement of the intra-document repetition signal
  * (CCNet/Gopher-style corpus scrubbing).
  *
  * Plan shape, scale-first:
  *   - n-grams are built per row in ONE tokenize pass ([[ngramHashes]] /
  *     the [[HashedShingles]] expression) and deduped per doc BEFORE the
  *     explode (`array_distinct`), so the shuffle carries distinct
  *     (doc, gram) 8-byte pairs, not every occurrence and never a string;
  *   - document frequency is one hash aggregate on the gram (partial
  *     aggregation absorbs the hot grams map-side — the common grams are by
  *     definition the skewed keys);
  *   - the common-gram set (df >= threshold) is small by construction, so
  *     the per-doc share join broadcasts it (`broadcast()` pinned) — no
  *     second full shuffle of the corpus.
  */
object Boilerplate {

  /** Distinct word `n`-grams of `textCol` as readable strings — for
    * inspection/reporting of WHICH grams are boilerplate. NOT the scale
    * path: the builtin lambda re-tokenizes per gram (see [[ngramHashes]],
    * which counts identically and is what the pipeline queries use).
    * A doc with fewer than `n` tokens has zero n-grams.
    */
  def ngrams(textCol: Column, n: Int): Column = {
    require(n > 0, s"n must be positive, got $n")
    val toks = TextFunctions.tokens(textCol)
    val count = size(toks) - (n - 1)
    array_distinct(
      when(count > 0,
        transform(sequence(lit(0), count - 1), i => array_join(slice(toks, i + 1, lit(n)), " ")))
        .otherwise(array()))
  }

  /** Distinct 64-bit gram keys via the one-pass [[HashedShingles]] codegen
    * expression — tokenize ONCE per document and never materialize a gram
    * string (a `transform`/`slice` builtin composition re-runs the
    * tokenize pipeline per gram: measured 13-20x slower on the documents
    * corpus). 8-byte keys on the shuffle; collision odds for a 1e9-gram
    * vocabulary: ~1e-2 spurious merges TOTAL, invisible to df thresholds.
    * The `tokenCount >= n` guard preserves the zero-grams rule for short
    * docs (HashedShingles alone would emit the whole text as one window).
    */
  def ngramHashes(textCol: Column, n: Int): Column = {
    require(n > 0, s"n must be positive, got $n")
    when(TextFunctions.tokenCount(textCol) >= n,
      array_distinct(HashedShingles(textCol, n)))
      .otherwise(array().cast("array<long>"))
  }

  /** Scale path for per-doc boilerplate shares: ONE explode pass over
    * hashed grams (persisted and reused by both the document-frequency
    * aggregate and the share join) instead of building the n-gram set
    * twice. Returns per-doc (idCol, carryCols…, n_grams, n_common) for
    * docs with >= 1 n-gram, plus a release handle for the persisted
    * pairs — call it after the terminal action.
    */
  def hashedBoilerplateShares(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDocFraction: Double,
      carryCols: Seq[String] = Nil,
      maxBroadcastGrams: Long = 4L << 20): (DataFrame, () => Unit) = {
    require(minDocFraction > 0 && minDocFraction <= 1,
      s"minDocFraction must be in (0,1], got $minDocFraction")
    val total = df.count()
    // floor 2: a gram in one document is never "common" (and df >= 1 would
    // trivially match every gram); matches the oracle's greatest(2, ...)
    val minDocs = math.max(2L, math.ceil(minDocFraction * total).toLong)
    val pairs = df
      .select(col(idCol) +: carryCols.map(col) :+
        explode(ngramHashes(col(textCol), n)).as("gh"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val common = pairs.groupBy("gh").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
    // "Small by construction" holds for sane minDocFraction (>= ~1%), but
    // the broadcast contract is self-enforcing now: the common set is
    // counted first (one aggregate over the already-persisted pairs) and
    // pinned broadcast only when it actually fits; a pathological
    // threshold (1e-6 on a web corpus) falls back to an unpinned join
    // that AQE plans by real size — same decision as the NgramLm vocab
    // join. ~8 bytes/gram: the default 4M-gram cap is a ~32 MB broadcast.
    val commonKeys = common.select(col("gh"), lit(1L).as("__is_common"))
    val nCommon = common.count()
    val joinSide =
      if (nCommon <= maxBroadcastGrams) broadcast(commonKeys)
      else {
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"hashedBoilerplateShares: $nCommon common grams exceed " +
            s"maxBroadcastGrams=$maxBroadcastGrams — using an unpinned join")
        commonKeys
      }
    val out = pairs
      .join(joinSide, Seq("gh"), "left")
      .groupBy(idCol, carryCols: _*)
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("__is_common"), lit(0L))).as("n_common"))
    (out, () => { pairs.unpersist(blocking = false); () })
  }

  /** (ngram, df) rows for n-grams appearing in at least `minDocFraction`
    * of documents.
    */
  def commonNgrams(
      df: DataFrame,
      textCol: String,
      n: Int,
      minDocFraction: Double): DataFrame = {
    require(minDocFraction > 0 && minDocFraction <= 1,
      s"minDocFraction must be in (0,1], got $minDocFraction")
    val total = df.count() // one count job; the threshold is corpus-relative
    // floor 2: a gram in one document is never "common" (and df >= 1 would
    // trivially match every gram); matches the oracle's greatest(2, ...)
    val minDocs = math.max(2L, math.ceil(minDocFraction * total).toLong)
    df.select(explode(ngrams(col(textCol), n)).as("ngram"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
  }

  /** Appends `n_grams`, `n_common`, `boilerplate_share` per document (share
    * is 0.0 for docs with no n-grams). `common` must be the (small)
    * `commonNgrams` output — it is broadcast.
    */
  def withBoilerplateShare(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      common: DataFrame): DataFrame = {
    val grams = df.select(col(idCol), explode(ngrams(col(textCol), n)).as("ngram"))
    val perDoc = grams
      .join(broadcast(common.select(col("ngram"), lit(1L).as("__is_common"))),
        Seq("ngram"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("__is_common"), lit(0L))).as("n_common"))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("n_grams", coalesce(col("n_grams"), lit(0L)))
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .withColumn(
        "boilerplate_share",
        when(col("n_grams") > 0, col("n_common").cast("double") / col("n_grams"))
          .otherwise(lit(0.0)))
  }
}
