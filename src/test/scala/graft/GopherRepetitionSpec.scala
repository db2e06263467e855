package graft

import graft.ops.GopherRepetition

/** Closed-form checks for the Gopher-style repetition signals: top-n-gram
  * coverage (with the overlap cap and short-doc whole-window rule) and
  * duplicated-n-gram position-union coverage.
  */
class GopherRepetitionSpec extends SparkSpec {

  import spark.implicits._

  private def signals(rows: (Long, String)*): Map[Long, (Int, Long, Long, Long)] = {
    val (out, release) = GopherRepetition.repetitionSignals(
      rows.toDF("id", "text"), "id", "text", topNs = Seq(2, 3), dupN = 5)
    val got = out.select("id", "n_tokens", "top2_tokens", "top3_tokens", "dup5_tokens")
      .as[(Long, Int, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    release()
    got
  }

  test("top-n-gram coverage: overlapping occurrences cap at n_tokens") {
    // "p p p p q": top 2-gram (p p) x3 -> 6, capped at 5; no 5-gram repeats
    val got = signals((1L, "p p p p q"))
    assert(got(1L) == ((5, 5L, 5L, 0L)))
  }

  test("periodic text: dup-5-gram union covers the whole doc") {
    // a b c a b c a b c a: top2 = 3*2 = 6; top3 (abc x3) = 9;
    // every 5-gram at pos i repeats at i+-3 -> union [0, 10)
    val got = signals((1L, "a b c a b c a b c a"))
    assert(got(1L) == ((10, 6L, 9L, 10L)))
  }

  test("short docs use the whole-text window (full coverage at count 1)") {
    // 2-token doc: the n=3 'window' is the whole text -> top3 = 2
    val got = signals((1L, "x y"), (2L, "a b c d"))
    assert(got(1L) == ((2, 2L, 2L, 0L)))
    assert(got(2L) == ((4, 2L, 3L, 0L)))
  }

  test("signals are per-doc: identical texts in different docs do not interact") {
    val got = signals((1L, "q r s t u v w x"), (2L, "q r s t u v w x"))
    // no WITHIN-doc repeats in either: dup5 = 0 for both
    assert(got(1L) == ((8, 2L, 3L, 0L)))
    assert(got(2L) == ((8, 2L, 3L, 0L)))
  }
}
