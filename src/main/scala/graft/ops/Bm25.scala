package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions

/** BM25 ranked retrieval over the corpus — the inverted-index scoring
  * step up from [[TfIdf]]: a batch of queries, each scored against every
  * document sharing a term, top-k per query. Okapi BM25 with the
  * Lucene/Robertson positive idf.
  *
  * Cross-engine determinism (the repo discipline — no raw doubles summed
  * across rows): with k1 = 6/5 and b = 3/4 the term factor
  * `tf·(k1+1) / (tf + k1(1−b) + k1·b·dl/avgdl)` multiplied through by
  * `10·S` (S = total corpus tokens, avgdl = S/N) is the INTEGER ratio
  * `22·S·tf / (10·S·tf + 3·S + 9·dl·N)`, and the idf
  * `ln((N+1)/(df+0.5))` is `ln(2N+2) − ln(2df+1)` — logs of integers,
  * scaled once to longs by `s(x) = floor(ln(x)·1e6 + 0.5)`. Each
  * (query, doc, term) contribution is `floor(idf_scaled · num/den + 0.5)`
  * — one IEEE multiply+divide on exactly-representable inputs, identical
  * in any engine — and per-doc scores are exact long sums of those.
  * The long products stay exact while `22·S·tf` < 2^53 (cf. the same
  * documented bound in [[RangeJoin]]); beyond that the double rounding
  * is still deterministic per IEEE, just no longer exactly the rational.
  *
  * Scale shape: ONE corpus explode → per-(doc, term-hash) tf hash
  * aggregate (persisted — document length, document frequency, and the
  * postings all derive from it); df and dl are second-level aggregates of
  * tf, never a re-scan. The query side is bounded by the query workload,
  * so it broadcasts (the [[Decontaminate]] eval-set precedent) and prunes
  * tf BEFORE the dl/df joins: the full inverted index is aggregated
  * (map-side combine) but only query-matched postings ever pass through a
  * join shuffle, and the query-vocabulary df table broadcasts. Top-k per
  * query compiles to a rank-filter the optimizer pushes as
  * WindowGroupLimit — pre-shuffle top-k, the q_domain_cap shape. Only N
  * and S (two scalars) ever reach the driver.
  */
object Bm25 {

  private def sLong(x: Long): Long = graft.functions.ScaledLn.long(x)

  private def tokenHashArray(textCol: Column): Column =
    TextFunctions.tokenHashes(textCol)

  /** Top-k documents per query: (qidCol, rank, idCol, scaled_score),
    * rank 1..k by (score desc, idCol asc) — the deterministic tiebreak.
    * Query terms are DISTINCT per query (bag-of-words query, no query-side
    * tf weighting); query terms absent from the corpus contribute nothing,
    * and a query matching no document emits no rows. Returns the frame
    * and a release handle for the persisted tf aggregate.
    */
  def bm25TopK(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      qidCol: String,
      qTextCol: String,
      k: Int): (DataFrame, () => Unit) = {
    val (out, _, release) =
      bm25TopKWithTf(corpus, idCol, textCol, queries, qidCol, qTextCol, k)
    (out, release)
  }

  /** [[bm25TopK]] that ALSO exposes the persisted per-(doc, token-hash)
    * tf aggregate — the widest intermediate — for downstream reuse: the
    * retrieval-eval queries ([[RetrievalEval]]) need per-doc term sets
    * for relevance grading, and reusing tf means the corpus is tokenized
    * ONCE for both the run and its evaluation. Hold the release handle
    * until every reader of BOTH frames has executed.
    */
  def bm25TopKWithTf(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      qidCol: String,
      qTextCol: String,
      k: Int): (DataFrame, DataFrame, () => Unit) = {
    val tf = tfPostings(corpus, idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val out = bm25TopKFromTf(tf, idCol, queries, qidCol, qTextCol, k)
    (out, tf, () => { tf.unpersist(blocking = false); () })
  }

  /** The inverted-index core: the per-(doc, token-hash) tf aggregate every
    * other BM25 statistic (dl, df, avgdl) derives from. Build ONCE per
    * corpus, persist, and serve any number of query batches through
    * [[bm25TopKFromTf]] — the index-persistence shape of a real retrieval
    * engine (tokenizing 100 TB per query batch is the bug; the index is
    * ~tokens-count narrow rows of three longs, the cheapest durable form
    * of the corpus).
    */
  def tfPostings(corpus: DataFrame, idCol: String, textCol: String): DataFrame =
    corpus
      .select(col(idCol), explode(tokenHashArray(col(textCol))).as("th"))
      .groupBy(idCol, "th")
      .agg(count(lit(1)).as("tf"))

  /** [[bm25TopK]] over a PREBUILT tf postings frame (from [[tfPostings]],
    * ideally persisted/stored by the caller): scores a query batch without
    * touching the corpus text at all. Caller owns the tf lifecycle.
    */
  def bm25TopKFromTf(
      tf: DataFrame,
      idCol: String,
      queries: DataFrame,
      qidCol: String,
      qTextCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // doc lengths materialized ONCE (localCheckpoint): the `stats` action
    // below forces a full pass over this aggregate anyway, and the scoring
    // join re-reads it — unmaterialized, the corpus-sized groupBy ran
    // twice per query batch (once for stats, once inside the final join)
    val dl = tf.groupBy(idCol).agg(sum("tf").as("dl")).localCheckpoint(true)
    val stats = dl.agg(count(lit(1)), coalesce(sum("dl"), lit(0L))).head
    val (nDocs, totTokens) = (stats.getLong(0), stats.getLong(1))
    val sIdfNum = if (nDocs > 0) sLong(2 * nDocs + 2) else 0L

    val qterms = queries
      .select(col(qidCol), explode(tokenHashArray(col(qTextCol))).as("th"))
      .distinct()
    // Query-term pruning FIRST: the bounded query side broadcasts against
    // the persisted tf, so the dl/df joins below run over query-matched
    // postings only — the full inverted index is aggregated (map-side
    // combine) but never re-shuffled through a join. df still counts over
    // the FULL corpus (a term's rarity is corpus-global), restricted to
    // query terms before the aggregate; the resulting df table is bounded
    // by the query vocabulary, so it broadcasts too.
    val qvocab = qterms.select("th").distinct()
    val dfq = tf.join(broadcast(qvocab), Seq("th"))
      .groupBy("th").agg(count(lit(1)).as("df"))
    val tfq = tf.join(broadcast(qterms), Seq("th"))
    val win = Window.partitionBy(qidCol)
      .orderBy(col("scaled_score").desc, col(idCol).asc)
    val out = tfq
      .join(dl, idCol)
      .join(broadcast(dfq), Seq("th"))
      .withColumn("__idf", lit(sIdfNum) -
        graft.functions.ScaledLn.column(col("df") * 2 + 1))
      .withColumn("__num", lit(22L * totTokens) * col("tf"))
      .withColumn("__den", lit(10L * totTokens) * col("tf") +
        lit(3L * totTokens) + lit(9L * nDocs) * col("dl"))
      .withColumn("__contrib",
        floor(col("__idf").cast("double") * col("__num").cast("double") /
          col("__den").cast("double") + 0.5).cast("long"))
      .groupBy(qidCol, idCol)
      .agg(sum("__contrib").as("scaled_score"))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col(qidCol), col("rank").cast("long").as("rank"),
        col(idCol), col("scaled_score"))
    out
  }
}
