package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{HashedShingles, TextFunctions}

/** Gopher-style within-document repetition signals (Rae et al. 2021, the
  * public quality-rule set): the share of a document covered by its most
  * frequent n-gram (n = 2..4 in the paper) and by n-grams that repeat
  * within the document (n = 5..10) — the "template spam / lyrics /
  * boilerplate page" discriminators that complement the cross-document
  * dedup family. Token-granular here (the corpus token space every other
  * operator uses) rather than character-granular; thresholds transfer.
  *
  * All outputs are exact integer token counts — numerators of the
  * fractions — so the oracle reproduces them without any float
  * discipline: `topN_tokens` = occurrences-of-most-frequent-n-gram × n
  * (capped at n_tokens: overlapping occurrences can over-cover),
  * `dupN_tokens` = tokens covered by the POSITION-UNION of all n-grams
  * occurring >= 2 times in the doc (the [[SubstringDedup.mergeSpans]]
  * sweep, so overlaps count once — the coverage semantics the paper
  * intends).
  *
  * Scale shape: ONE posexplode pass of (n, pos, hash) structs — every
  * requested n's windows tagged and concatenated in a single codegen
  * expression, so the text is tokenized/hashed once per n but exploded
  * once; per-(doc, n, gram) counts are a hash aggregate with map-side
  * partials; within-doc repeat detection is a per-doc window count (state
  * bounded by the longest document). Nothing leaves the cluster.
  */
object GopherRepetition {

  /** Per-document repetition signals: (idCol, carryCols…, n_tokens,
    * top{n}_tokens for each n in `topNs`, dup{dupN}_tokens), one row per
    * document with >= 1 token. Returns the frame and a release handle
    * for the persisted window pass.
    */
  def repetitionSignals(
      df: DataFrame,
      idCol: String,
      textCol: String,
      topNs: Seq[Int] = Seq(2, 3, 4),
      dupN: Int = 5,
      carryCols: Seq[String] = Nil): (DataFrame, () => Unit) = {
    require(topNs.nonEmpty && (topNs :+ dupN).forall(_ >= 1),
      s"n-gram orders must be >= 1, got topNs=$topNs dupN=$dupN")
    val allNs = (topNs :+ dupN).distinct
    val tagged = allNs.map { n =>
      transform(HashedShingles(col(textCol), n),
        (h, i) => struct(lit(n).as("n"), i.as("pos"), h.as("wh")))
    }
    val exploded = df
      .filter(TextFunctions.tokenCount(col(textCol)) >= 1)
      .select(col(idCol) +: carryCols.map(col) :+
        TextFunctions.tokenCount(col(textCol)).as("n_tokens") :+
        explode(concat(tagged: _*)).as("__w"): _*)
      .select(col("*"), col("__w.n").as("__n"), col("__w.pos").as("pos"),
        col("__w.wh").as("wh"))
      .drop("__w")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // share of the single most frequent n-gram, as a token numerator:
    // gram token length is min(n, n_tokens) (whole-text window for short
    // docs), occurrences can overlap → cap at n_tokens
    val counts = exploded
      .filter(col("__n").isin(topNs: _*))
      .groupBy(col(idCol) +: carryCols.map(col) :+ col("n_tokens") :+
        col("__n") :+ col("wh"): _*)
      .agg(count(lit(1)).as("__c"))
    val topCols = topNs.map { n =>
      coalesce(max(when(col("__n") === n,
        least(col("__c") * least(lit(n), col("n_tokens")), col("n_tokens")))),
        lit(0L)).as(s"top${n}_tokens")
    }
    val tops = counts
      .groupBy(idCol, carryCols :+ "n_tokens": _*)
      .agg(topCols.head, topCols.tail: _*)

    // tokens covered by the union of duplicated dupN-gram positions
    val byGram = Window.partitionBy(col(idCol), col("wh"))
    val dupMarks = exploded
      .filter(col("__n") === dupN)
      .withColumn("__c", count(lit(1)).over(byGram))
      .filter(col("__c") > 1)
      .drop("__n", "wh", "__c")
    val dupCov = SubstringDedup.mergeSpans(dupMarks, idCol, dupN, carryCols)
      .groupBy(idCol)
      .agg(sum(col("span_end") - col("span_start")).as(s"dup${dupN}_tokens"))

    val out = tops
      .join(dupCov, Seq(idCol), "left")
      .withColumn(s"dup${dupN}_tokens",
        coalesce(col(s"dup${dupN}_tokens"), lit(0L)))
    (out, () => { exploded.unpersist(blocking = false); () })
  }
}
