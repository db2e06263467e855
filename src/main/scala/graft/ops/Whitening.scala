package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** PCA whitening of an embedding column — the retrieval-pipeline
  * post-processing step (dominant-direction removal / isotropization)
  * that typically buys several points of recall on raw encoder output:
  * after whitening, the corpus covariance is the identity, so cosine and
  * Euclidean rankings stop being dominated by a few high-variance
  * directions.
  *
  * Scale decomposition:
  *   - TRAIN is two distributed reductions: the d-vector mean and the
  *     d x d scatter matrix `Σ x xᵀ`, accumulated PER PARTITION into
  *     primitive arrays and combined associatively (the RowMatrix
  *     covariance shape — this is the genuine `mapPartitions` case: an
  *     element-pair explode would blow each row up d² = 4096x). Only
  *     (d, d²) doubles ever cross the wire per partition; nothing is
  *     data-sized on the driver.
  *   - The eigendecomposition runs DRIVER-SIDE on the d x d covariance
  *     (cyclic Jacobi — symmetric, tiny, O(d³) with d = 64 is
  *     microseconds); the resulting whitening matrix
  *     `W = Λ^(-1/2) Vᵀ` is a d x d broadcast model, the
  *     [[IvfIndex]]/[[Pq]] centroid-broadcast pattern.
  *   - APPLY is one broadcast map over the data: `y = W (x - μ)`, a
  *     per-row d² fused multiply-add kernel.
  *
  * `eps` regularizes near-null directions (`1/sqrt(λ+eps)`), bounding
  * the blow-up of components the corpus barely populates.
  */
object Whitening {

  /** Whitening model: `whiten(x) = basis * (x - mean)`, basis rows are
    * eigendirections scaled by inverse root eigenvalue (largest
    * eigenvalue first). */
  final case class Model(mean: Array[Double], basis: Array[Array[Double]]) {
    def dim: Int = mean.length
  }

  /** Train on `vecCol` (array<float|double>). One pass for moments:
    * per-partition (n, Σx, Σxxᵀ) accumulators, associative combine,
    * driver-side Jacobi. The model dimension is the MODAL vector length
    * (one cheap count aggregate, deterministic tie-break) — a stray
    * corrupt short/long vector can never flip which rows count,
    * regardless of partition/file layout; rows of any other length are
    * skipped. */
  def train(df: DataFrame, vecCol: String, eps: Double = 1e-9): Model = {
    val vecs = df.select(col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
    val d = vecs.filter(size(col("v")) > 0)
      .groupBy(size(col("v")).as("d")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("d").desc)
      .head(1).headOption.map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException("no non-empty vectors"))
    // per-partition primitive accumulation; combine is element-wise add
    val (n, sx, sxx) = vecs.rdd.mapPartitions { it =>
      var n = 0L
      val sx = new Array[Double](d)
      val sxx = new Array[Double](d * d)
      it.foreach { r =>
        val v = r.getSeq[Double](0)
        if (v.length == d) {
          n += 1
          val a = v.toArray
          var i = 0
          while (i < d) {
            sx(i) += a(i)
            var j = 0
            val base = i * d
            while (j < d) { sxx(base + j) += a(i) * a(j); j += 1 }
            i += 1
          }
        }
      }
      Iterator.single((n, sx, sxx))
    }.treeReduce { (x, y) =>
      val (n1, a1, m1) = x; val (n2, a2, m2) = y
      var i = 0
      while (i < a1.length) { a1(i) += a2(i); i += 1 }
      i = 0
      while (i < m1.length) { m1(i) += m2(i); i += 1 }
      (n1 + n2, a1, m1)
    }
    require(n > 1, s"need at least 2 vectors of length $d, got $n")
    val mean = sx.map(_ / n)
    // cov = Σxxᵀ/n − μμᵀ (population covariance; the n vs n−1 choice
    // only rescales eigenvalues, which whitening inverts up to eps)
    val cov = Array.tabulate(d, d)((i, j) => sxx(i * d + j) / n - mean(i) * mean(j))
    val (evals, evecs) = jacobiEigen(cov)
    // order by descending eigenvalue; basis row i = v_i / sqrt(λ_i + eps)
    val order = evals.zipWithIndex.sortBy(-_._1).map(_._2)
    val basis = order.map { k =>
      val s = 1.0 / math.sqrt(math.max(evals(k), 0.0) + eps)
      Array.tabulate(d)(r => evecs(r)(k) * s)
    }
    Model(mean, basis)
  }

  /** Apply: adds `outCol` = `basis * (x - mean)` as array<double>.
    * The model is a broadcast d x d kernel; rows whose vector is null or
    * of a different length get a null `outCol`. */
  def whiten(df: DataFrame, vecCol: String, outCol: String, model: Model): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val f = udf { v: Seq[Double] =>
      val m = bc.value
      val d = m.dim
      if (v == null || v.length != d) null
      else {
        val x = new Array[Double](d)
        var i = 0
        while (i < d) { x(i) = v(i) - m.mean(i); i += 1 }
        val out = new Array[Double](d)
        i = 0
        while (i < d) {
          val row = m.basis(i)
          var s = 0.0
          var j = 0
          while (j < d) { s += row(j) * x(j); j += 1 }
          out(i) = s
          i += 1
        }
        out
      }
    }
    df.withColumn(outCol, f(col(vecCol).cast("array<double>")))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvectors-as-columns). Deterministic sweep order;
    * converges quadratically — 64x64 finishes in a handful of sweeps. */
  private[graft] def jacobiEigen(
      m: Array[Array[Double]],
      maxSweeps: Int = 50,
      tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val scale = math.max(1.0, a.indices.map(i => math.abs(a(i)(i))).max)
    while (sweep < maxSweeps && off > tol * scale * scale) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            // symmetric Schur rotation zeroing a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(1.0 + theta * theta))
              else 1.0 / (theta - math.sqrt(1.0 + theta * theta))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) {
        if (i != j) s += a(i)(j) * a(i)(j)
        j += 1
      }
      i += 1
    }
    s
  }
}
