package graft

import org.scalacheck.{Gen, Prop}

import graft.ops.Packing

/** Differential fuzz for [[Packing]]'s distributed exclusive prefix sum
  * and bin assignment: oracle = the sequential definition (sort by the
  * order key, running sum). The two-pass scheme's risk surface is all
  * boundary arithmetic — empty range partitions contributing 0, nulls
  * coerced to 0, offsets landing exactly on a budget boundary, rows
  * fewer than partitions — which random inputs hit constantly and the
  * hand cases in PipelineOpsSpec hit once each.
  */
class PackingFuzzSpec extends SparkSpec {

  // unique (total-order) keys incl. negatives; values incl. null and 0
  private val genRows: Gen[List[(Long, Option[Long])]] = for {
    n <- Gen.chooseNum(0, 30)
    keys <- Gen.pick(n, (-50L to 200L).toList)
    vals <- Gen.listOfN(n, Gen.frequency(
      1 -> Gen.const(None),
      2 -> Gen.const(Some(0L)),
      7 -> Gen.chooseNum(1L, 9L).map(Some(_))))
  } yield keys.toList.zip(vals)

  test("prefix sum + total + packBins match the sequential oracle (forAll)") {
    val session = spark
    import session.implicits._
    val budget = 8L
    val prop = Prop.forAllNoShrink(genRows) { rows =>
      val df = rows.toDF("id", "tokens")
      val (summed, total, release) =
        Packing.withExclusivePrefixSumAndTotal(df, "id", "tokens")
      val gotSum = summed.collect()
        .map(r => (r.getLong(0), r.getLong(2))).toMap
      release()
      val (binned, release2) = Packing.packBins(df, "id", "tokens", budget)
      val gotBins = binned.collect()
        .map(r => (r.getLong(0), (r.getLong(3), r.getLong(4)))).toMap
      release2()

      // sequential oracle
      val sorted = rows.sortBy(_._1).map { case (k, v) => (k, v.getOrElse(0L)) }
      var acc = 0L
      val wantSum = sorted.map { case (k, v) =>
        val o = (k, acc); acc += v; o
      }.toMap
      val wantTotal = sorted.map(_._2).sum
      val wantBins = sorted.map { case (k, v) =>
        val start = wantSum(k)
        val bin = Math.floorDiv(start, budget)
        val crosses =
          if (v > 0 && Math.floorDiv(start + v - 1, budget) != bin) 1L else 0L
        k -> ((bin, crosses))
      }.toMap

      val ok = gotSum == wantSum && total == wantTotal && gotBins == wantBins
      if (!ok) println(s"MISMATCH rows=$rows\n  sum  got=$gotSum want=$wantSum" +
        s"\n  total got=$total want=$wantTotal\n  bins got=$gotBins want=$wantBins")
      ok
    }
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(30)
      .withInitialSeed(org.scalacheck.rng.Seed(20260815L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
