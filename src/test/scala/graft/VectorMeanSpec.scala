package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorMean

class VectorMeanSpec extends SparkSpec {
  import spark.implicits._

  test("grouped vector mean equals the posexplode reference on real embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(pmod($"vec_id", lit(4)).as("grp"),
        $"embedding".cast("array<double>").as("v"))
    val got = emb.groupBy("grp")
      .agg(VectorMean($"v").as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).map(x => math.rint(x * 1e6)))
      .toMap
    val ref = emb.select($"grp", posexplode($"v").as(Seq("pos", "x")))
      .groupBy("grp", "pos").agg(avg("x").as("m"))
      .groupBy("grp")
      .agg(array_sort(collect_list(struct($"pos", $"m"))).as("pairs"))
      .select($"grp", transform($"pairs", p => p.getField("m")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).map(x => math.rint(x * 1e6)))
      .toMap
    assert(got.keySet == ref.keySet)
    for (k <- got.keySet) assert(got(k) == ref(k), s"group $k centroid mismatch")
  }

  test("partial buffers merge across partitions (shuffle serialization path)") {
    val vecs = (1 to 1000).map(i => (i % 3, Array(i.toDouble, 2.0 * i, -i.toDouble)))
      .toDF("g", "v")
    val one = vecs.coalesce(1).groupBy("g").agg(VectorMean($"v").as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val many = vecs.repartition(16).groupBy("g").agg(VectorMean($"v").as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    for (k <- one.keySet)
      assert(one(k).zip(many(k)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("all-null input yields null; dimension mismatch fails loudly") {
    val nulls = Seq(Tuple1(null.asInstanceOf[Array[Double]])).toDF("v")
    assert(nulls.agg(VectorMean($"v")).collect().head.isNullAt(0))
    val mixed = Seq(Array(1.0, 2.0), Array(1.0, 2.0, 3.0)).toDF("v")
    val e = intercept[Exception] { mixed.agg(VectorMean($"v")).collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("dimension mismatch")))
  }
}
