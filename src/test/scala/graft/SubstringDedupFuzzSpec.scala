package graft

import org.scalacheck.{Gen, Prop}

import graft.functions.HashedShingles
import graft.ops.SubstringDedup

/** Differential fuzz for [[SubstringDedup.duplicatedSpans]]: oracle =
  * brute-force window enumeration + interval sweep over the same
  * tokenization ([[HashedShingles.tokenize]]; the space-joined shingle is
  * injective in the token sequence, so token-seq equality IS hash-key
  * equality up to xxhash collisions). The hand-written SubstringDedupSpec
  * cases cover the ownership rule (min (id, pos)), the short-doc
  * whole-text window, merge-on-abutting, and end-of-doc clamping once
  * each; this pins their INTERACTIONS on random corpora — e.g. a short
  * doc owning a window that a long doc's clamped tail span abuts.
  */
class SubstringDedupFuzzSpec extends SparkSpec {

  private val vocab = Seq("a", "b", "c", "aa")
  private val genDoc: Gen[String] = Gen.chooseNum(0, 10)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
  private val genCase: Gen[(List[String], Int, Boolean)] = for {
    nDocs <- Gen.chooseNum(2, 6)
    docs <- Gen.listOfN(nDocs, genDoc)
    k <- Gen.chooseNum(1, 4)
    keep <- Gen.oneOf(true, false)
  } yield (docs, k, keep)

  /** (doc_id, n_tokens, span_start, span_end) by brute force. */
  private def oracle(docs: Seq[(Long, String)], k: Int, keepFirst: Boolean)
      : Set[(Long, Int, Int, Int)] = {
    val toks = docs.map { case (id, t) => id -> HashedShingles.tokenize(t).toSeq }
    val wins = toks.flatMap { case (id, ts) =>
      if (ts.isEmpty) Nil
      else if (ts.size <= k) Seq((id, 0, ts))
      else (0 to ts.size - k).map(p => (id, p, ts.slice(p, p + k)))
    }
    val dup = wins.groupBy(_._3).filter(_._2.size > 1)
    val marked = dup.values.flatten.filter { case (id, pos, key) =>
      !keepFirst || ((id, pos) != dup(key).map(w => (w._1, w._2)).min)
    }.toSeq
    val nTok = toks.toMap.view.mapValues(_.size).toMap
    marked.groupBy(_._1).flatMap { case (id, ms) =>
      val n = nTok(id)
      val spans = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
      for (pos <- ms.map(_._2).sorted) {
        val end = math.min(pos + k, n)
        spans.lastOption match {
          // mergeSpans opens a new span only when pos > running max end:
          // abutting (pos == end) merges
          case Some((s, e)) if pos <= e =>
            spans(spans.size - 1) = (s, math.max(e, end))
          case _ => spans += ((pos, end))
        }
      }
      spans.map { case (s, e) => (id, n, s, e) }
    }.toSet
  }

  test("duplicatedSpans matches the brute-force oracle on random corpora (forAll)") {
    val session = spark
    import session.implicits._
    val prop = Prop.forAllNoShrink(genCase) { case (texts, k, keepFirst) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val (spans, release) = SubstringDedup.duplicatedSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", k, keepFirst)
      val got = spans.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
      release()
      val want = oracle(docs, k, keepFirst)
      if (got != want) {
        println(s"MISMATCH k=$k keepFirst=$keepFirst docs=$docs\n" +
          s"  got  ${got.toSeq.sorted}\n  want ${want.toSeq.sorted}")
      }
      got == want
    }
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(40)
      .withInitialSeed(org.scalacheck.rng.Seed(20260815L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
