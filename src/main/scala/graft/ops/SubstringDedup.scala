package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{HashedShingles, TextFunctions}

/** Exact duplicated-substring detection and removal — the "Deduplicating
  * Training Data Makes Language Models Better" (Lee et al., 2022) shape,
  * re-expressed for a distributed engine: instead of one global suffix
  * array (inherently single-machine), every k-token rolling window is
  * hashed, windows occurring more than once in the corpus mark their
  * positions as duplicated, and per-document overlapping marks merge into
  * maximal spans. Any duplicated substring of >= k tokens contains only
  * duplicated k-windows, so the merged spans cover exactly the regions a
  * suffix array would find at threshold k (boundaries rounded to window
  * granularity).
  *
  * `keepFirst = true` gives removal semantics rather than detection: for
  * each duplicated window the globally first occurrence — min (id, pos),
  * a total order, so the choice is deterministic and retry-stable — is
  * the OWNER and keeps its text; only non-owner occurrences are marked.
  * One copy of every duplicated substring survives, like the reference
  * algorithm.
  *
  * Scale shape: ONE posexplode pass of per-window 64-bit hashes (no
  * window strings on the wire), persisted and reused by the ownership
  * aggregate and the mark join; ownership is a hash aggregate with
  * map-side partials; the mark join is an UNPINNED equi-join on the
  * 8-byte hash. Span merging is a per-document window function — the
  * partition key is the document id, so state is bounded by the longest
  * document, never by the corpus. Nothing is collected to the driver.
  */
object SubstringDedup {

  /** Maximal duplicated spans, one row per span:
    * (idCol, carryCols…, n_tokens, span_start, span_end) with token
    * coordinates [span_start, span_end). Documents shorter than k tokens
    * hash as ONE whole-text window ([[HashedShingles]] semantics), so two
    * identical short documents flag each other whole. Returns the frame
    * and a release handle for the persisted window pass — call it after
    * the terminal action.
    */
  def duplicatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      keepFirst: Boolean = false,
      carryCols: Seq[String] = Nil): (DataFrame, () => Unit) = {
    require(k >= 1, s"window size must be >= 1, got $k")
    // token count via ONE codegen tokenize ([[graft.functions
    // .TokenizeWords]] shares HashedShingles.tokenize, so the count and
    // the windows can never disagree); the interpreted
    // TextFunctions.tokenCount costs a full regex pass per evaluation
    val wins = df
      .select(col(idCol) +: carryCols.map(col) :+ col(textCol).as("__text") :+
        size(graft.functions.TokenizeWords(col(textCol))).as("n_tokens"): _*)
      .filter(col("n_tokens") >= 1)
      .select(col(idCol) +: carryCols.map(col) :+ col("n_tokens") :+
        posexplode(HashedShingles(col("__text"), k)).as(Seq("pos", "wh")): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val owners = wins
      .groupBy("wh")
      .agg(min(struct(col(idCol), col("pos"))).as("__own"),
        count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
      .select("wh", "__own")
    val marked0 = wins.join(owners, Seq("wh"))
    val marked =
      if (keepFirst)
        marked0.filter(!(col(idCol) === col("__own")(idCol) &&
          col("pos") === col("__own")("pos")))
      else marked0
    (mergeSpans(marked.drop("wh", "__own"), idCol, k, carryCols),
      () => { wins.unpersist(blocking = false); () })
  }

  /** Merge overlapping/adjacent-overlapping marks [pos, min(pos+k,
    * n_tokens)) into maximal spans: classic running-max sweep — a mark
    * opens a new span iff it starts past everything seen so far. Shared
    * with [[GopherRepetition]]'s within-doc duplicated-n-gram coverage.
    */
  private[ops] def mergeSpans(
      marked: DataFrame, idCol: String, k: Int, carryCols: Seq[String]): DataFrame = {
    val byDoc = Window.partitionBy(idCol).orderBy("pos")
    val endCol = least(col("pos") + k, col("n_tokens"))
    val prevMaxEnd = max(endCol)
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    marked
      .withColumn("__new",
        when(prevMaxEnd.isNull || col("pos") > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("__grp",
        sum("__new").over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol) +: carryCols.map(col) :+ col("n_tokens") :+ col("__grp"): _*)
      .agg(min("pos").as("span_start"), max(endCol).as("span_end"))
      .drop("__grp")
  }

  /** Per-document rollup of [[duplicatedSpans]]: (idCol, carryCols…,
    * n_tokens, n_dup_spans, dup_tokens) for documents with >= 1 span.
    */
  def dedupStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      keepFirst: Boolean = false,
      carryCols: Seq[String] = Nil): (DataFrame, () => Unit) = {
    val (spans, release) =
      duplicatedSpans(df, idCol, textCol, k, keepFirst, carryCols)
    val out = spans
      .groupBy(idCol, carryCols :+ "n_tokens": _*)
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("span_end") - col("span_start")).as("dup_tokens"))
    (out, release)
  }

  /** Apply removal: every document of `df` with its duplicated spans cut
    * out, in NORMALIZED token space (the tokenization the windows were
    * hashed in — lowercased, punctuation stripped): (idCol, carryCols…,
    * n_tokens, kept_tokens, cleaned_text). Documents without spans pass
    * through whole. The span list is per-document (bounded by document
    * length), carried as an array column into one zip_with-style filter —
    * never a driver collect.
    */
  def removeDuplicates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      carryCols: Seq[String] = Nil): (DataFrame, () => Unit) = {
    val (spans, release) =
      duplicatedSpans(df, idCol, textCol, k, keepFirst = true, carryCols)
    val spanLists = spans
      .groupBy(idCol)
      .agg(collect_list(struct(col("span_start").as("s"), col("span_end").as("e")))
        .as("__spans"))
    val toks = TextFunctions.tokens(col(textCol))
    val out = df
      .join(spanLists, Seq(idCol), "left")
      .withColumn("__spans", coalesce(col("__spans"),
        array().cast("array<struct<s:int,e:int>>")))
      .select(col(idCol) +: carryCols.map(col) :+
        size(toks).cast("long").as("n_tokens") :+
        filter(toks, (_, i) =>
          !exists(col("__spans"), sp => i >= sp("s") && i < sp("e"))).as("__kept"): _*)
      .withColumn("kept_tokens", size(col("__kept")).cast("long"))
      .withColumn("cleaned_text", array_join(col("__kept"), " "))
      .drop("__kept")
    (out, release)
  }
}
