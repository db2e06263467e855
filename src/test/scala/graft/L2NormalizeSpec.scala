package graft

import org.apache.spark.sql.functions._

import graft.functions.L2Normalize

/** L2 normalization: closed forms, the zero-vector convention, the
  * matryoshka chain, and SQL/Column agreement.
  */
class L2NormalizeSpec extends SparkSpec {

  import spark.implicits._

  private def normalize(v: Seq[Double]): Seq[Double] =
    Seq(Tuple1(v)).toDF("v").select(L2Normalize(col("v")))
      .as[Seq[Double]].collect().head

  test("known vectors normalize exactly; zero vector stays zero") {
    assert(normalize(Seq(3.0, 4.0)) == Seq(0.6, 0.8))
    assert(normalize(Seq(0.0, 0.0, 0.0)) == Seq(0.0, 0.0, 0.0))
    assert(normalize(Seq(-2.0, 0.0)) == Seq(-1.0, 0.0))
  }

  test("output is unit norm; normalization is (near-)idempotent") {
    val v = Seq(0.3, -1.7, 2.4, 0.001, -9.2)
    val u = normalize(v)
    assert(math.abs(u.map(x => x * x).sum - 1.0) < 1e-12)
    val uu = normalize(u)
    u.zip(uu).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("matryoshka chain: normalize -> slice -> renormalize is unit in 32 dims") {
    val v = (1 to 64).map(_.toDouble)
    val m = Seq(Tuple1(v)).toDF("v")
      .select(L2Normalize(slice(L2Normalize(col("v")), 1, 32)).as("m"))
      .as[Seq[Double]].collect().head
    assert(m.length == 32)
    assert(math.abs(m.map(x => x * x).sum - 1.0) < 1e-12)
  }

  test("l2_normalize in SQL agrees with the Column API") {
    val viaSql = spark.sql("SELECT l2_normalize(array(3.0d, 4.0d)) AS u")
      .as[Seq[Double]].collect().head
    assert(viaSql == Seq(0.6, 0.8))
  }
}
