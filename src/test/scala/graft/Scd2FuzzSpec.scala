package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

import graft.ops.Scd2

/** Differential fuzz for [[Scd2.merge]]: random snapshot SEQUENCES folded
  * through the merge vs a sequential per-key oracle. The hand cases in
  * Scd2Spec cover each transition once; sequences pin their interactions —
  * a key that changes every snapshot (stacked closed versions), delete →
  * reappear → delete again, change to null and back (null-safe compare),
  * and pass-through rows riding across many merges untouched.
  */
class Scd2FuzzSpec extends SparkSpec {

  private val keySpace = (1L to 5L).toList
  private val attrVals = List(None, Some("a"), Some("b"))

  // a snapshot: distinct keys, each with a (nullable) attribute value
  private val genSnap: Gen[Map[Long, Option[String]]] = for {
    n <- Gen.chooseNum(0, 5)
    keys <- Gen.pick(n, keySpace)
    vals <- Gen.listOfN(n, Gen.oneOf(attrVals))
  } yield keys.toList.zip(vals).toMap

  private val genSeq: Gen[List[Map[Long, Option[String]]]] = for {
    n <- Gen.chooseNum(2, 5)
    snaps <- Gen.listOfN(n, genSnap)
  } yield snaps

  private def dateOf(i: Int): String = f"2024-01-${i + 1}%02d"

  /** (key, attr, valid_from, valid_to, is_current) by sequential replay. */
  private def oracle(snaps: List[Map[Long, Option[String]]])
      : Set[(Long, Option[String], String, Option[String], Boolean)] = {
    var closed = List.empty[(Long, Option[String], String, String)]
    var open = snaps.head.map { case (k, v) => k -> (v, dateOf(0)) }
    snaps.zipWithIndex.tail.foreach { case (snap, i) =>
      val d = dateOf(i)
      val stillOpen = scala.collection.mutable.Map.empty[Long, (Option[String], String)]
      open.foreach { case (k, (a, from)) =>
        snap.get(k) match {
          case Some(v) if v == a => stillOpen(k) = (a, from) // unchanged
          case Some(v) => // changed: close + reopen
            closed ::= ((k, a, from, d)); stillOpen(k) = (v, d)
          case None => closed ::= ((k, a, from, d)) // deleted
        }
      }
      snap.foreach { case (k, v) =>
        if (!open.contains(k)) stillOpen(k) = (v, d) // new key
      }
      open = stillOpen.toMap
    }
    closed.map { case (k, a, f, t) => (k, a, f, Some(t), false) }.toSet ++
      open.map { case (k, (a, f)) => (k, a, f, None, true) }
  }

  test("folding merge over random snapshot sequences matches the replay oracle (forAll)") {
    val session = spark
    import session.implicits._
    def snapDf(s: Map[Long, Option[String]]) =
      s.toSeq.map { case (k, v) => (k, v.orNull) }.toDF("id", "attr")
    val prop = Prop.forAllNoShrink(genSeq) { snaps =>
      var hist = Scd2.snapshotAsHistory(
        snapDf(snaps.head), "id", Seq("attr"), to_date(lit(dateOf(0))))
      snaps.zipWithIndex.tail.foreach { case (s, i) =>
        hist = Scd2.merge(hist, snapDf(s), "id", Seq("attr"),
          to_date(lit(dateOf(i))))
      }
      val got = hist.collect().map { r =>
        (r.getLong(0), Option(r.getString(1)),
          r.getDate(2).toString, Option(r.getDate(3)).map(_.toString),
          r.getBoolean(4))
      }.toSet
      val want = oracle(snaps)
      if (got != want)
        println(s"MISMATCH snaps=$snaps\n  got  ${got.toSeq.sortBy(_.toString)}" +
          s"\n  want ${want.toSeq.sortBy(_.toString)}")
      got == want
    }
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(25)
      .withInitialSeed(org.scalacheck.rng.Seed(20260815L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
