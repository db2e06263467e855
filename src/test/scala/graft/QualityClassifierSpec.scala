package graft

import org.apache.spark.sql.functions._

import graft.ops.QualityClassifier

/** Closed-form checks for the Naive Bayes log-odds quality classifier:
  * weights, prior, OOV floor, and doc scores recomputed by hand with the
  * same scaled-integer formula.
  */
class QualityClassifierSpec extends SparkSpec {

  import spark.implicits._

  private def s(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6 + 0.5).toLong

  test("weights, prior, and scores match the hand-computed closed form") {
    // pos docs: "good good text", "good text"; neg doc: "bad text"
    // cpos: good=3, text=2; cneg: bad=1, text=1
    // Npos=5, Nneg=2, V=3 (good, text, bad)
    val labeled = Seq(
      (0L, "good good text", 1), (1L, "good text", 1), (2L, "bad text", 0))
      .toDF("id", "text", "label")
    val model = QualityClassifier.train(labeled, "text", "label")

    val sPosDen = s(5 + 3)
    val sNegDen = s(2 + 3)
    def w(cpos: Long, cneg: Long): Long =
      s(cpos + 1) - sPosDen - (s(cneg + 1) - sNegDen)
    assert(model.priorScaled == s(2 + 1) - s(1 + 1))
    assert(model.oovScaled == sNegDen - sPosDen)

    // score "good unknown": one in-vocab token (good: cpos=3, cneg=0),
    // one OOV token
    val scored = QualityClassifier.score(
      Seq((7L, "good unknown")).toDF("id", "text"), "id", "text", model)
      .as[(Long, Long, Long, Long)].collect()
    model.release()
    assert(scored.toSeq == Seq(
      (7L, 2L, 1L, w(3, 0) + model.oovScaled + model.priorScaled)))
  }

  test("empty negative class and zero-token docs are handled") {
    val labeled = Seq((0L, "alpha beta", 1), (1L, "", 1)).toDF("id", "text", "label")
    val model = QualityClassifier.train(labeled, "text", "label")
    // Npos=2, Nneg=0, V=2; prior = s(3) - s(1); every token's weight uses
    // the empty-class denominator s(0+2)
    assert(model.priorScaled == s(3) - s(1))
    assert(model.oovScaled == s(0 + 2) - s(2 + 2))
    val scored = QualityClassifier.score(
      Seq((1L, "alpha"), (2L, "")).toDF("id", "text"), "id", "text", model)
      .as[(Long, Long, Long, Long)].collect()
    model.release()
    // zero-token doc 2 emits no row; doc 1 scores w(alpha: 1, 0) + prior
    val wAlpha = s(1 + 1) - s(2 + 2) - (s(0 + 1) - s(0 + 2))
    assert(scored.toSeq == Seq((1L, 1L, 0L, wAlpha + model.priorScaled)))
  }

  test("calibrationSweep: confusion counts per threshold, strict > rule") {
    // scores: y=1 at 5, 15; y=0 at -5, 10
    val scored = Seq((1L, 1, 5L), (2L, 1, 15L), (3L, 0, -5L), (4L, 0, 10L))
      .toDF("id", "y", "scaled_score")
    val got = QualityClassifier.calibrationSweep(scored, "y", Seq(0L, 5L, 20L))
      .select("threshold", "tp", "fp", "fn", "tn")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 2L, 1L, 0L, 1L),   // > 0: scores 5, 15 (tp), 10 (fp)
      (5L, 1L, 1L, 1L, 1L),   // > 5 STRICT: 5 now fn
      (20L, 0L, 0L, 2L, 2L))) // nothing predicted positive
    // monotone: tp and fp never increase as the threshold rises
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3)
    }
  }

  test("training explode feeds one hash aggregate; scoring join is unpinned") {
    val labeled = (0L until 100L)
      .map(i => (i, s"tok${i % 7} tok${i % 3} filler", (i % 2).toInt))
      .toDF("id", "text", "label")
    val model = QualityClassifier.train(labeled, "text", "label")
    val scored = QualityClassifier.score(labeled, "id", "text", model)
    // the vocab join must not be a nested loop / cartesian product
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    assert(scored.count() == 100)
    model.release()
  }
}
