package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions

/** fastText-style linear quality classifier — the train-a-classifier-on-
  * labeled-slices shape real corpus pipelines run (GPT-3/LLaMA-style
  * "looks like Wikipedia?" filters): a multinomial Naive Bayes over
  * unigram token counts, which IS a linear model over the bag-of-tokens
  * (per-token log-odds weights + a class prior), trained and applied as
  * two scan-shaped Spark jobs.
  *
  * Weights with add-one smoothing over the joint vocabulary V:
  * `w(t) = ln((cpos(t)+1)/(Npos+V)) − ln((cneg(t)+1)/(Nneg+V))`, doc
  * score `= prior + Σ_tokens w(t)` with `prior = ln(dpos+1) − ln(dneg+1)`;
  * positive score ⇒ positive class.
  *
  * Cross-engine determinism: every ln is of an INTEGER, so each factor is
  * scaled ONCE to a long with the repo formula `s(x) = floor(ln(x)·1e6 +
  * 0.5)` and everything downstream is exact integer arithmetic — no
  * doubles summed across rows, the same discipline as [[NgramLm]]. An
  * out-of-vocabulary token scores the constant `s(Nneg+V) − s(Npos+V)`
  * (both class counts 0 — the smoothing floor), applied via coalesce.
  *
  * Scale shape: training is ONE explode of per-token 64-bit hashes (no
  * token strings on the wire) into one (th, per-class counts) hash
  * aggregate with map-side partials; scoring is one explode + one
  * UNPINNED join on the 8-byte hash (AQE broadcasts a bounded vocabulary,
  * a web-scale one hash-joins) + one per-doc aggregate. The only
  * driver-side values are four scalar counts and the model's scalar
  * terms; the weight table itself never leaves the cluster.
  */
object QualityClassifier {

  /** Trained model: `weights` is (th: long, w: long) — the 1e6-scaled
    * log-odds per token hash; `priorScaled`/`oovScaled` are the scalar
    * terms above. `release()` unpersists the weight table — call it after
    * the terminal action of every scoring job that uses the model.
    */
  final case class Model(
      weights: DataFrame,
      priorScaled: Long,
      oovScaled: Long,
      release: () => Unit)

  private def s(c: Column): Column = graft.functions.ScaledLn.column(c)
  private def sLong(x: Long): Long = graft.functions.ScaledLn.long(x)

  private def tokenHashArray(textCol: Column): Column =
    TextFunctions.tokenHashes(textCol)

  /** Train on `labeled`, where `labelCol` is 1 (positive class) or 0.
    * Docs with zero tokens contribute nothing to token counts but do
    * count toward the doc prior.
    */
  def train(labeled: DataFrame, textCol: String, labelCol: String): Model = {
    val lbl = col(labelCol).cast("int")
    val docCounts = labeled.agg(
      coalesce(sum(when(lbl === 1, 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(lbl === 0, 1L).otherwise(0L)), lit(0L))).head
    val (dpos, dneg) = (docCounts.getLong(0), docCounts.getLong(1))

    val perToken = labeled
      .select(lbl.as("__l"), explode(tokenHashArray(col(textCol))).as("th"))
      .groupBy("th")
      .agg(sum(when(col("__l") === 1, 1L).otherwise(0L)).as("__cpos"),
        sum(when(col("__l") === 0, 1L).otherwise(0L)).as("__cneg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tot = perToken.agg(
      coalesce(sum("__cpos"), lit(0L)), coalesce(sum("__cneg"), lit(0L)),
      count(lit(1))).head
    val (nPos, nNeg, vocabV) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))

    // s(Npos+V) / s(Nneg+V) — the smoothed denominators; V >= 1 whenever
    // any training doc has a token, and the +V keeps the argument >= 1
    // even for an empty class.
    val sPosDen = sLong(nPos + math.max(vocabV, 1L))
    val sNegDen = sLong(nNeg + math.max(vocabV, 1L))
    val weights = perToken.select(col("th"),
      (s(col("__cpos") + 1) - lit(sPosDen) -
        (s(col("__cneg") + 1) - lit(sNegDen))).as("w"))
    Model(weights,
      priorScaled = sLong(dpos + 1) - sLong(dneg + 1),
      oovScaled = sNegDen - sPosDen,
      release = () => { perToken.unpersist(blocking = false); () })
  }

  /** Score `df` under `model`. Output: (idCol, carryCols…, n_tokens,
    * n_oov, scaled_score) for docs with >= 1 token; `scaled_score` is the
    * 1e6-scaled integer score (positive ⇒ positive class).
    */
  def score(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: Model,
      carryCols: Seq[String] = Nil): DataFrame =
    df.select(col(idCol) +: carryCols.map(col) :+
        explode(tokenHashArray(col(textCol))).as("th"): _*)
      .join(model.weights, Seq("th"), "left")
      .groupBy(idCol, carryCols: _*)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("w").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(coalesce(col("w"), lit(model.oovScaled))).as("__sum_w"))
      .withColumn("scaled_score", col("__sum_w") + lit(model.priorScaled))
      .drop("__sum_w")

  /** Threshold calibration sweep — the step that picks the filter's
    * operating point: confusion counts (tp/fp/fn/tn) of `scoreCol > t`
    * against the true `labelCol` for every candidate threshold, in ONE
    * pass over the scored frame. Precision/recall/F1 are driver-side
    * ratios of the four counts; emitting the integers keeps the result
    * engine-exact.
    *
    * Predicted positive is STRICT `score > threshold` — the same rule
    * [[score]] callers apply at `t = 0`, so the `t = 0` row of the sweep
    * reproduces the production filter's counts.
    *
    * Scale shape: the explode multiplies rows by `thresholds.size`
    * (bounded, caller-chosen) before a hash aggregate whose map-side
    * partials collapse each partition to `thresholds.size` rows — no
    * sort, no per-threshold rescan of the corpus. Output: (threshold,
    * tp, fp, fn, tn), one row per threshold.
    */
  def calibrationSweep(
      scored: DataFrame,
      labelCol: String,
      thresholds: Seq[Long],
      scoreCol: String = "scaled_score"): DataFrame = {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    val y = col(labelCol).cast("int")
    scored
      .select(y.as("__y"), col(scoreCol).as("__s"),
        explode(array(thresholds.map(lit): _*)).as("threshold"))
      .groupBy("threshold")
      .agg(
        sum(when(col("__y") === 1 && col("__s") > col("threshold"), 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("__y") === 0 && col("__s") > col("threshold"), 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("__y") === 1 && col("__s") <= col("threshold"), 1L)
          .otherwise(0L)).as("fn"),
        sum(when(col("__y") === 0 && col("__s") <= col("threshold"), 1L)
          .otherwise(0L)).as("tn"))
  }
}
