package graft

import org.apache.spark.sql.functions._

import graft.ops.PairMatrix

class PairMatrixSpec extends SparkSpec {
  import spark.implicits._

  test("ordered pairs of distinct keys, duplicates collapsed") {
    val df = Seq("b", "a", "c", "a", "b").toDF("k")
    val got = PairMatrix.orderedPairs(df, "k").as[(String, String)]
      .collect().sorted.toSeq
    assert(got == Seq(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("custom output column names") {
    val df = Seq(1, 2, 3).toDF("id")
    val got = PairMatrix.orderedPairs(df, "id", "lo", "hi")
    assert(got.columns.toSeq == Seq("lo", "hi"))
    assert(got.count() == 3)
  }

  test("maxPairs guard rejects an unbounded key set at plan time") {
    val df = spark.range(1000).select(col("id").as("k"))
    val e = intercept[IllegalArgumentException] {
      PairMatrix.orderedPairs(df, "k", maxPairs = 100)
    }
    assert(e.getMessage.contains("499500"))
    assert(e.getMessage.contains("maxPairs=100"))
    // exactly at the cap is allowed
    assert(PairMatrix.orderedPairs(df.limit(15), "k", maxPairs = 105).count() == 105)
  }

  test("pair frame right side is broadcast (no shuffle on the matrix)") {
    val df = Seq("x", "y", "z").toDF("k")
    val plan = PairMatrix.orderedPairs(df, "k").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
