package graft

import org.apache.spark.sql.DataFrame
import graft.ops.Whitening

class WhiteningSpec extends SparkSpec {

  /** Deterministic correlated data: x = A z + b with z from a seeded RNG,
    * so the population covariance is ~A Aᵀ — far from identity. */
  private def correlated(n: Int, d: Int, seed: Long): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val a = Array.tabulate(d, d)((i, j) =>
      if (j <= i) (rnd.nextDouble() - 0.5) * (if (i == j) 2.0 else 0.8) else 0.0)
    val b = Array.fill(d)(rnd.nextDouble() * 3)
    val rows = Seq.fill(n) {
      val z = Array.fill(d)(rnd.nextGaussian())
      Array.tabulate(d)(i => b(i) + (0 until d).map(j => a(i)(j) * z(j)).sum)
    }
    rows.map(_.toSeq).toDF("v")
  }

  private def momentsOf(df: DataFrame, colName: String): (Array[Double], Array[Array[Double]]) = {
    val rows = df.select(colName).collect().map(_.getSeq[Double](0).toArray)
    val n = rows.length
    val d = rows.head.length
    val mean = Array.tabulate(d)(i => rows.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n)
    (mean, cov)
  }

  test("whitened output has zero mean and identity covariance") {
    val df = correlated(n = 600, d = 8, seed = 7L)
    val model = Whitening.train(df, "v")
    val out = Whitening.whiten(df, "v", "w", model)
    val (mean, cov) = momentsOf(out, "w")
    mean.foreach(m => assert(math.abs(m) < 1e-9, s"mean $m"))
    for (i <- 0 until 8; j <- 0 until 8) {
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(cov(i)(j) - want) < 1e-6, s"cov($i)($j)=${cov(i)(j)}")
    }
  }

  test("jacobi recovers a known spectrum") {
    // diag(5, 2, 1) conjugated by a rotation in the (0,1) plane
    val c = math.cos(0.6); val s = math.sin(0.6)
    val r = Array(Array(c, -s, 0.0), Array(s, c, 0.0), Array(0.0, 0.0, 1.0))
    val dm = Array(Array(5.0, 0.0, 0.0), Array(0.0, 2.0, 0.0), Array(0.0, 0.0, 1.0))
    def mul(x: Array[Array[Double]], y: Array[Array[Double]]) =
      Array.tabulate(3, 3)((i, j) => (0 until 3).map(k => x(i)(k) * y(k)(j)).sum)
    val m = mul(mul(r, dm), r.map(_.clone()).transpose)
    val (evals, _) = Whitening.jacobiEigen(m)
    assert(evals.sorted.zip(Array(1.0, 2.0, 5.0))
      .forall { case (a, b) => math.abs(a - b) < 1e-10 })
  }

  test("near-singular directions are bounded by eps, not blown up") {
    import spark.implicits._
    // all mass on the first coordinate; coordinate 2 is constant
    val df = Seq.tabulate(100)(i => Seq(i.toDouble, 4.0)).toDF("v")
    val model = Whitening.train(df, "v", eps = 1e-6)
    val out = Whitening.whiten(df, "v", "w", model)
    val (_, cov) = momentsOf(out, "w")
    assert(math.abs(cov(0)(0) - 1.0) < 1e-6) // populated direction whitened
    assert(cov(1)(1) < 1e-3)                 // dead direction stays near zero
  }

  test("null and wrong-length vectors pass through as null") {
    import spark.implicits._
    val df = Seq(Some(Seq(1.0, 2.0)), Some(Seq(2.0, 1.0)), Some(Seq(3.0)), None)
      .toDF("v")
    val model = Whitening.train(df.filter("size(v) = 2"), "v")
    val out = Whitening.whiten(df, "v", "w", model).collect()
    assert(out.count(_.isNullAt(1)) == 2)
  }

  test("training is deterministic across partitionings") {
    val df = correlated(n = 300, d = 6, seed = 3L)
    val m1 = Whitening.train(df.repartition(1), "v")
    val m4 = Whitening.train(df.repartition(4), "v")
    // same subspace: the models whiten the same data to the same covariance;
    // compare via the whitening of a probe matrix instead of raw signs
    val out1 = Whitening.whiten(df, "v", "w", m1)
    val out4 = Whitening.whiten(df, "v", "w", m4)
    val (_, c1) = momentsOf(out1, "w")
    val (_, c4) = momentsOf(out4, "w")
    for (i <- 0 until 6; j <- 0 until 6)
      assert(math.abs(c1(i)(j) - c4(i)(j)) < 1e-6)
  }
}
