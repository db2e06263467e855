package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** TF-IDF term weighting over a document corpus, as a declarative plan:
  * explode tokens → term frequencies (one shuffle on (doc, term)) →
  * document frequencies (one shuffle on term) → weight join.
  *
  * `idf` here is the LINEAR variant `N / df` rather than `ln(N / df)`:
  * rankings are identical (ln is monotone) and the arithmetic is exact in
  * both Spark and DuckDB — `ln` differs in final ulps across libm
  * implementations, which would break the oracle's hash-match. Callers
  * wanting the classical weight can `log()` the returned idf.
  *
  * Scale: df for frequent terms is a classic skew point — the groupBy
  * benefits from partial aggregation, and the final join broadcasts the
  * term->df side when the vocabulary is small (synthetic corpora; for web
  * vocabularies Catalyst falls back to a shuffle join automatically).
  */
object TfIdf {

  /** Returns (idCol, term, tf, df, tfidf) rows. */
  def weights(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // shared stats-based spread: no df.rdd plan conversion (see spreadDf)
    val spread = Dedup.spreadDf(df)
    val nDocs = spread.count()
    val terms = spread.select(col(idCol).as("__id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = terms.groupBy("__id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "term")
      .select(col("__id").as(idCol), col("term"), col("tf"),
        col("df"),
        (col("tf") * lit(nDocs.toDouble) / col("df")).as("tfidf"))
  }

  /** Top-k most characteristic terms per group (e.g. language): terms
    * ranked by group-summed tf-idf. Because idf is constant per term, the
    * group score collapses to `n_occurrences * N / df` — integer products
    * and ONE IEEE divide, so the ranking is bit-identical across engines
    * (no order-dependent double summation anywhere).
    */
  def topTermsPerGroup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      k: Int): DataFrame = {
    val spread = Dedup.spreadDf(df)
    val nDocs = spread.count()

    val terms = spread.select(col(idCol).as("__id"), col(groupCol),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val dfreq = terms.select("__id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val grouped = terms.groupBy(groupCol, "term")
      .agg(count(lit(1)).as("n_occurrences"))
    val win = Window.partitionBy(groupCol).orderBy(
      (col("n_occurrences") * lit(nDocs.toDouble) / col("df")).desc, col("term").asc)
    grouped.join(dfreq, "term")
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col(groupCol), col("rank").cast("long").as("rank"),
        col("term"), col("n_occurrences"))
  }
}
