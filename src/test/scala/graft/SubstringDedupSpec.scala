package graft

import org.apache.spark.sql.functions._

import graft.ops.SubstringDedup

/** Closed-form checks for exact duplicated-substring detection/removal:
  * span boundaries, keep-first ownership, within-doc repeats, short-doc
  * whole-window semantics, and the removal output.
  */
class SubstringDedupSpec extends SparkSpec {

  import spark.implicits._

  test("cross-doc shared substring: spans merge to the maximal region") {
    // "a b c d" (4 tokens) shared; k=3 → windows (a b c), (b c d) dup'd
    val df = Seq((1L, "a b c d e f"), (2L, "x y a b c d z"))
      .toDF("id", "text")
    val (spans, release) = SubstringDedup.duplicatedSpans(df, "id", "text", 3)
    val got = spans.select("id", "span_start", "span_end")
      .as[(Long, Int, Int)].collect().toSet
    release()
    assert(got == Set((1L, 0, 4), (2L, 2, 6)))
  }

  test("keepFirst marks only non-owner occurrences (min (id, pos) owns)") {
    val df = Seq((1L, "a b c d e f"), (2L, "x y a b c d z"))
      .toDF("id", "text")
    val (spans, release) =
      SubstringDedup.duplicatedSpans(df, "id", "text", 3, keepFirst = true)
    val got = spans.select("id", "span_start", "span_end")
      .as[(Long, Int, Int)].collect().toSet
    release()
    assert(got == Set((2L, 2, 6)))
  }

  test("within-doc repetition: owner keeps the first copy, abutting marks merge") {
    val df = Seq((1L, "p q r s p q r s")).toDF("id", "text")
    val (det, relDet) = SubstringDedup.duplicatedSpans(df, "id", "text", 4)
    // detection mode marks BOTH copies; marks [0,4) and [4,8) abut → one span
    assert(det.select("span_start", "span_end").as[(Int, Int)].collect().toSeq
      == Seq((0, 8)))
    relDet()
    val (kf, relKf) =
      SubstringDedup.duplicatedSpans(df, "id", "text", 4, keepFirst = true)
    assert(kf.select("span_start", "span_end").as[(Int, Int)].collect().toSeq
      == Seq((4, 8)))
    relKf()
  }

  test("short identical docs flag whole-text windows; removal empties the loser") {
    val df = Seq((1L, "tiny doc"), (2L, "tiny doc"), (3L, "other text"))
      .toDF("id", "text")
    val (out, release) = SubstringDedup.removeDuplicates(df, "id", "text", 8)
    val got = out.select("id", "kept_tokens", "cleaned_text")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    release()
    assert(got == Seq((1L, 2L, "tiny doc"), (2L, 0L, ""), (3L, 2L, "other text")))
  }

  test("dedupStats rolls spans up per doc; untouched docs emit no row") {
    val df = Seq(
      (1L, "a b c d e f"), (2L, "x y a b c d z"), (3L, "nothing shared here"))
      .toDF("id", "text")
    val (stats, release) =
      SubstringDedup.dedupStats(df, "id", "text", 3, keepFirst = true)
    val got = stats.select("id", "n_dup_spans", "dup_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    release()
    assert(got == Seq((2L, 1L, 4L)))
  }

  test("scale probe: 20k docs, 50% exact re-crawls, removal keeps one copy each") {
    // 10k distinct docs + an exact re-crawl of each (the Lee-et-al
    // motivating case). Keep-first removal must leave the originals
    // intact and empty every re-crawl — and complete in one pass
    // (bounded by the window explode, never all-pairs).
    val docs = (0L until 10000L).map { i =>
      // tokens unique per (doc, position): no natural cross-doc windows,
      // so the only duplicated substrings are the planted re-crawls
      val text = (0 until 12).map(j => s"w${i}x$j").mkString(" ")
      (i, text)
    }
    val corpus = (docs ++ docs.map { case (i, t) => (i + 100000L, t) })
      .toDF("id", "text").repartition(32)
    val (stats, release) = SubstringDedup.dedupStats(
      corpus, "id", "text", 8, keepFirst = true)
    val flagged = stats.select("id", "dup_tokens")
      .as[(Long, Long)].collect()
    release()
    // every re-crawl (id >= 100000) is fully covered; no original is
    // flagged unless it collides with a distinct doc's window (the hash
    // construction above makes full 8-windows unique per i)
    val (copies, originals) = flagged.partition(_._1 >= 100000L)
    assert(copies.length == 10000 && copies.forall(_._2 == 12L))
    assert(originals.isEmpty)
  }

  test("mark join is an equi-join, never a nested loop or cartesian") {
    val df = (0L until 200L)
      .map(i => (i, s"w${i % 11} w${i % 7} w${i % 5} w${i % 3} w${i % 2} end$i"))
      .toDF("id", "text")
    val (spans, release) =
      SubstringDedup.duplicatedSpans(df, "id", "text", 3, keepFirst = true)
    val plan = spans.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    spans.count()
    release()
  }
}
