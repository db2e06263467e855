package graft

import org.scalacheck.{Gen, Prop}

import graft.ops.Mmr

/** Differential fuzz for [[Mmr.diversify]]: a literal Scala
  * reimplementation of the greedy loop (same sequential cosine, same
  * `λ·rel − (1−λ)·maxSim` double arithmetic, same id tie-break) over
  * random shortlists. Pins the selected-set join + max aggregate + argmax
  * window against the textbook definition — including zero vectors (the
  * 0-norm guard), exhausted shortlists (k > candidates), and exact
  * floating-point tie-breaks.
  */
class MmrFuzzSpec extends SparkSpec {

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private case class Cand(q: Long, id: Long, rel: Double, v: Array[Double])

  private val genCands: Gen[List[Cand]] = for {
    nq <- Gen.chooseNum(1, 2)
    perQ <- Gen.listOfN(nq, for {
      n <- Gen.chooseNum(3, 7)
      ids <- Gen.pick(n, (1L to 9L).toList)
      rels <- Gen.listOfN(n, Gen.oneOf(0.0, 0.25, 0.5, 1.0))
      vecs <- Gen.listOfN(n, Gen.listOfN(3, Gen.chooseNum(-2, 2).map(_.toDouble)))
    } yield ids.toList.lazyZip(rels).lazyZip(vecs)
      .map((id, r, v) => (id, r, v.toArray)))
  } yield perQ.zipWithIndex.flatMap { case (cs, qi) =>
    cs.map { case (id, r, v) => Cand(qi.toLong, id, r, v) }
  }

  private def oracle(cands: List[Cand], k: Int, lambda: Double)
      : Set[(Long, Long, Long)] = // (q, step, id)
    cands.groupBy(_.q).flatMap { case (q, cs) =>
      var remaining = cs
      var selected = List.empty[Cand]
      val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
      for (step <- 1 to k if remaining.nonEmpty) {
        val scored = remaining.map { c =>
          val score =
            if (selected.isEmpty) lambda * c.rel
            else lambda * c.rel -
              (1 - lambda) * selected.map(s => cosine(c.v, s.v)).max
          (score, c)
        }
        // argmax: score desc, id asc — the exact window order
        val pick = scored.minBy { case (s, c) => (-s, c.id) }._2
        out += ((q, step.toLong, pick.id))
        selected ::= pick
        remaining = remaining.filterNot(_.id == pick.id)
      }
      out
    }.toSet

  test("diversify matches the greedy oracle on random shortlists (forAll)") {
    val session = spark
    import session.implicits._
    val genCase = for {
      cands <- genCands
      k <- Gen.chooseNum(1, 5)
      lambda <- Gen.oneOf(0.0, 0.3, 0.5, 0.7, 1.0)
    } yield (cands, k, lambda)
    val prop = Prop.forAllNoShrink(genCase) { case (cands, k, lambda) =>
      val df = cands.map(c => (c.q, c.id, c.rel, c.v)).toDF("q", "id", "rel", "v")
      val got = Mmr.diversify(df, "q", "id", "rel", "v", k, lambda)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = oracle(cands, k, lambda)
      if (got != want)
        println(s"MISMATCH k=$k lambda=$lambda cands=${cands.map(c =>
          (c.q, c.id, c.rel, c.v.toList))}\n  got  $got\n  want $want")
      got == want
    }
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(25)
      .withInitialSeed(org.scalacheck.rng.Seed(20260815L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
