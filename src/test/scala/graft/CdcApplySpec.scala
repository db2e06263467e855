package graft

import graft.ops.CdcApply

class CdcApplySpec extends SparkSpec {

  // base: (k, v); log: (k, seq, op, v)
  private def apply(base: Seq[(String, Long)], log: Seq[(String, Long, String, Long)]): Map[String, Long] = {
    import spark.implicits._
    CdcApply.compact(
      base.toDF("k", "v"), log.toDF("k", "seq", "op", "v"),
      Seq("k"), Seq("seq"), "op", "D", Seq("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("upsert inserts new keys and replaces existing ones") {
    assert(apply(Seq(("a", 1L)), Seq(("a", 1L, "U", 10L), ("b", 1L, "U", 20L)))
      == Map("a" -> 10L, "b" -> 20L))
  }

  test("untouched base keys survive") {
    assert(apply(Seq(("a", 1L), ("b", 2L)), Seq(("b", 1L, "U", 9L)))
      == Map("a" -> 1L, "b" -> 9L))
  }

  test("delete removes base keys and log-inserted keys") {
    assert(apply(Seq(("a", 1L)),
      Seq(("a", 1L, "D", 0L), ("b", 1L, "U", 5L), ("b", 2L, "D", 0L)))
      == Map.empty[String, Long])
  }

  test("only the latest op by the total order decides — arrival order is irrelevant") {
    // shuffled sequence: U(seq 3) arrives before D(seq 2) and U(seq 1)
    assert(apply(Nil, Seq(("a", 3L, "U", 30L), ("a", 1L, "U", 10L), ("a", 2L, "D", 0L)))
      == Map("a" -> 30L))
    // latest is the tombstone
    assert(apply(Nil, Seq(("a", 3L, "D", 0L), ("a", 1L, "U", 10L)))
      == Map.empty[String, Long])
  }

  test("delete of a nonexistent key is a no-op; empty log returns the base") {
    assert(apply(Seq(("a", 7L)), Seq(("z", 1L, "D", 0L))) == Map("a" -> 7L))
    assert(apply(Seq(("a", 7L)), Nil) == Map("a" -> 7L))
  }

  test("reserved column name is rejected") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      CdcApply.compact(
        Seq(("a", 1L)).toDF("k", "__last"),
        Seq(("a", 1L, "U", 1L)).toDF("k", "seq", "op", "__last"),
        Seq("k"), Seq("seq"), "op", "D", Seq("__last"))
    }
  }
}
