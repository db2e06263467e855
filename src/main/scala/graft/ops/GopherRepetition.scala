package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.HashedShingles

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
  * Scale shape: the token count is computed ONCE per document (codegen
  * [[graft.functions.TokenizeWords]] — the interpreted
  * `TextFunctions.tokenCount` costs a full regex pass, and evaluating it
  * per order per row dominated the first cut of this operator: 34 s →
  * 8 s at sf0.1) into a persisted narrow base, then each order runs one
  * codegen posexplode of window hashes over that cached base, unioned.
  * (A single explode of `transform`-tagged (n, pos, hash) structs loses
  * too: higher-order lambdas are interpreted per element — the measured
  * ChunkText trap.) Per-(doc, n, gram) counts are a hash aggregate with
  * map-side partials; within-doc repeat detection is a sort-free hash
  * aggregate + semi-join on (doc, gram). Nothing leaves the cluster.
  */
object GopherRepetition {

  /** Per-document repetition signals: (idCol, carryCols…, n_tokens,
    * top{n}_tokens for each n in `topNs`, dup{dupN}_tokens), one row per
    * document with >= 1 token. Returns the frame and a release handle
    * for the persisted token base.
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
    // one tokenize for the count ([[TokenizeWords]] shares
    // HashedShingles.tokenize, so count and windows can never disagree)
    val base = df
      .select(col(idCol) +: carryCols.map(col) :+ col(textCol).as("__text") :+
        size(graft.functions.TokenizeWords(col(textCol))).as("n_tokens"): _*)
      .filter(col("n_tokens") >= 1)
      .persist(StorageLevel.MEMORY_AND_DISK)
    def explodeOrder(n: Int) =
      base.select(col(idCol) +: carryCols.map(col) :+ col("n_tokens") :+
        lit(n).as("__n") :+
        posexplode(HashedShingles(col("__text"), n)).as(Seq("pos", "wh")): _*)

    // share of the single most frequent n-gram, as a token numerator:
    // gram token length is min(n, n_tokens) (whole-text window for short
    // docs), occurrences can overlap → cap at n_tokens. Each order's
    // explode has exactly ONE consumer, so nothing but the narrow base is
    // ever cached.
    val counts = topNs.map(explodeOrder).reduce(_ unionByName _)
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

    // tokens covered by the union of duplicated dupN-gram positions.
    // Repeat detection is a sort-free hash aggregate + semi-join (the
    // dropOversizedBuckets shape) — a window count would SORT every
    // exploded row by (doc, gram); the explode re-runs for the second
    // consumer, but it reads the cached base and codegen-hashes only.
    val w5 = explodeOrder(dupN)
    val dupKeys = w5.groupBy(idCol, "wh")
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
      .select(col(idCol), col("wh"))
    val dupMarks = w5.join(dupKeys, Seq(idCol, "wh"), "left_semi")
      .drop("__n", "wh")
    val dupCov = SubstringDedup.mergeSpans(dupMarks, idCol, dupN, carryCols)
      .groupBy(idCol)
      .agg(sum(col("span_end") - col("span_start")).as(s"dup${dupN}_tokens"))

    val out = tops
      .join(dupCov, Seq(idCol), "left")
      .withColumn(s"dup${dupN}_tokens",
        coalesce(col(s"dup${dupN}_tokens"), lit(0L)))
    (out, () => { base.unpersist(blocking = false); () })
  }
}
