package graft

import org.scalacheck.{Gen, Prop}

import graft.ops.CdcApply

/** Differential fuzz for [[CdcApply.compact]]: random bases + random
  * OUT-OF-ORDER logs (several ops per key, arbitrary arrival order,
  * globally unique sequence numbers) vs the obvious oracle — latest op
  * per key by sequence decides. Pins the max_by totality, the
  * delete-then-reinsert-by-order case, null payloads riding through
  * the when/otherwise projection, and untouched-base passthrough.
  */
class CdcApplyFuzzSpec extends SparkSpec {

  private val keySpace = (1L to 6L).toList
  private val payloads = List(None, Some("x"), Some("y"))

  private case class LogRow(id: Long, seq: Long, op: String, v: Option[String])

  private val genCase: Gen[(Map[Long, Option[String]], List[LogRow])] = for {
    nBase <- Gen.chooseNum(0, 6)
    baseKeys <- Gen.pick(nBase, keySpace)
    baseVals <- Gen.listOfN(nBase, Gen.oneOf(payloads))
    nLog <- Gen.chooseNum(0, 10)
    logKeys <- Gen.listOfN(nLog, Gen.oneOf(keySpace))
    ops <- Gen.listOfN(nLog, Gen.frequency(3 -> Gen.const("U"), 1 -> Gen.const("D")))
    logVals <- Gen.listOfN(nLog, Gen.oneOf(payloads))
    seqs <- Gen.pick(nLog, (1L to 50L).toList) // globally unique = total order per key
  } yield (
    baseKeys.toList.zip(baseVals).toMap,
    logKeys.lazyZip(seqs.toList).lazyZip(ops).lazyZip(logVals)
      .map(LogRow.apply).toList)

  private def oracle(base: Map[Long, Option[String]], log: List[LogRow])
      : Set[(Long, Option[String])] = {
    val latest = log.groupBy(_.id).map { case (k, rs) => k -> rs.maxBy(_.seq) }
    val fromBase = base.collect {
      case (k, v) if !latest.contains(k) => (k, v)
    }
    val fromLog = latest.collect {
      case (k, r) if r.op != "D" => (k, r.v)
    }
    (fromBase ++ fromLog).toSet
  }

  test("compact matches the latest-op-per-key oracle on random logs (forAll)") {
    val session = spark
    import session.implicits._
    val prop = Prop.forAllNoShrink(genCase) { case (base, log) =>
      val baseDf = base.toSeq.map { case (k, v) => (k, v.orNull) }.toDF("id", "v")
      val logDf = log.map(r => (r.id, r.seq, r.op, r.v.orNull))
        .toDF("id", "seq", "op", "v")
      val got = CdcApply.compact(baseDf, logDf,
          keyCols = Seq("id"), ordCols = Seq("seq"),
          opCol = "op", deleteOp = "D", payloadCols = Seq("v"))
        .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      val want = oracle(base, log)
      if (got != want) println(s"MISMATCH base=$base log=$log\n  got  $got\n  want $want")
      got == want
    }
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(30)
      .withInitialSeed(org.scalacheck.rng.Seed(20260815L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
