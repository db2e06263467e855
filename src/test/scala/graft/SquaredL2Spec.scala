package graft

import org.apache.spark.sql.functions._

import graft.functions.SquaredL2

/** Closed-form + agreement specs for the codegen squared-L2 kernel. */
class SquaredL2Spec extends SparkSpec {

  import spark.implicits._

  test("known values are exact; codegen path equals the zip_with composition") {
    val df = Seq(
      (Seq(0L, 0L, 0L), Seq(1L, 2L, 2L)),        // 1+4+4 = 9
      (Seq(-3L, 1000L), Seq(3L, -1000L)),        // 36 + 4e6
      (Seq(7L), Seq(7L)))                        // 0
      .toDF("a", "b")
      .withColumn("fast", SquaredL2(col("a"), col("b")))
      .withColumn("slow",
        aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, x) => acc + x))
    val rows = df.select("fast", "slow").as[(Long, Long)].collect().toSeq
    assert(rows.map(_._1) == Seq(9L, 4000036L, 0L))
    assert(rows.forall(r => r._1 == r._2), s"codegen != interpreted: $rows")
  }

  test("dimension mismatch ranks malformed-last (Long.MaxValue), null propagates") {
    val df = Seq(
      (Some(Seq(1L, 2L)), Some(Seq(1L))),
      (None: Option[Seq[Long]], Some(Seq(1L))))
      .toDF("a", "b")
      .withColumn("d2", SquaredL2(col("a"), col("b")))
    val got = df.select("d2").collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq == Seq(Some(Long.MaxValue), None))
  }
}
