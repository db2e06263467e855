package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RAKE keyword extraction (Rose et al., 2010): candidate phrases are
  * maximal runs of content words between stopwords / sentence
  * punctuation; each word scores `degree/frequency` (degree = summed
  * length of the phrases it appears in), and a phrase scores the sum of
  * its word scores. The cheap unsupervised keyword miner a curation
  * pipeline runs for corpus topic profiling.
  *
  * Integer discipline: word scores are held as `1e6·deg div freq`
  * micro-units (one truncating integer division per word — the
  * deterministic spec both engines implement identically); phrase
  * scores are exact long sums of those.
  *
  * Scale shape: one tokenize+explode pass; the phrase-segmentation
  * window is per-document (stopword-count running sum — the classic
  * gaps-and-islands grouping); word stats are one hash aggregate over
  * the vocabulary; the phrase read-back joins on token (shuffle by
  * vocabulary key, never all-pairs). Top-k is a single TakeOrdered.
  *
  * Execution contract (ADVICE r16): [[keywords]] EAGERLY runs a Spark job
  * at call time — the per-phrase token arrays are materialized once via
  * `localCheckpoint` so the two downstream aggregates don't re-run the
  * tokenize pass — and therefore requires a BATCH DataFrame (a streaming
  * input throws; wrap per micro-batch via foreachBatch instead). Local
  * checkpoints are non-replicated: on a real cluster an executor loss
  * after materialization fails the calling job, which then reruns — the
  * deliberate trade for not paying the tokenize pass 3×; deployments that
  * need durability set `spark.graft.checkpoint=reliable` semantics by
  * materializing upstream themselves.
  */
object Rake {

  /** A small fixed function-word list — part of the operator's spec
    * (changing it changes scores), shared with the oracle SQL.
    */
  val DefaultStopwords: Seq[String] = Seq(
    "the", "and", "of", "to", "a", "in", "is", "it", "for", "on", "with",
    "as", "at", "by", "an", "be", "this", "that", "are", "was", "or",
    "from", "but", "not", "have", "has", "had")

  /** Top-k phrases over the corpus. Output: (phrase, n_words,
    * n_occurrences, score_u) by (score desc, phrase asc).
    */
  def keywords(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      stopwords: Seq[String] = DefaultStopwords,
      topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    // token stream in order: word runs or phrase-breaking punctuation
    val toks = docs
      .select(col(idCol).as("__doc"),
        posexplode(expr(s"regexp_extract_all(lower(`$textCol`), '[a-z]+|[.,;:!?]', 0)")))
      .toDF("__doc", "__pos", "__tok")
    val marked = toks.withColumn("__stop",
      col("__tok").isin(stopwords: _*) || col("__tok").rlike("^[.,;:!?]$"))
    val w = Window.partitionBy("__doc").orderBy("__pos")
    // gaps-and-islands: the running stopword count is constant exactly
    // within a maximal content-word run
    val words = marked
      .withColumn("__grp", sum(when(col("__stop"), 1L).otherwise(0L)).over(w))
      .filter(!col("__stop"))
      .select("__doc", "__grp", "__pos", "__tok")
    // collapse the token stream to per-phrase token ARRAYS once and
    // materialize: `words` used to feed three consumers (phrase lengths,
    // word stats, phrase scores), each re-running the tokenize + window
    // subtree over the whole corpus — 3 passes for 1 pass's information.
    // `runs` is phrase-level (orders of magnitude fewer rows than tokens)
    // and both remaining aggregates derive from a cheap explode of it.
    val runs = words.groupBy("__doc", "__grp")
      .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__tok")))),
        x => x.getField("__tok")).as("__toks"))
      .localCheckpoint(true)
    val occ = runs.select(col("__doc"), col("__grp"),
      size(col("__toks")).cast("long").as("__plen"),
      explode(col("__toks")).as("__tok"))
    val wordScores = occ
      .groupBy("__tok")
      .agg(count(lit(1)).as("__freq"), sum("__plen").as("__deg"))
      .withColumn("__wscore_u", expr("(1000000 * __deg) div __freq"))
      .select("__tok", "__wscore_u")
    val pscore = occ.join(wordScores, "__tok")
      .groupBy("__doc", "__grp")
      .agg(sum("__wscore_u").as("score_u"))
    val phrases = runs.join(pscore, Seq("__doc", "__grp"))
      .select(concat_ws(" ", col("__toks")).as("phrase"),
        size(col("__toks")).cast("long").as("n_words"),
        col("score_u"))
    phrases.groupBy("phrase")
      .agg(max("n_words").as("n_words"), count(lit(1)).as("n_occurrences"),
        max("score_u").as("score_u"))
      .orderBy(col("score_u").desc, col("phrase").asc)
      .limit(topK)
  }
}
