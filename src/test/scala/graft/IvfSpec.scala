package graft

import org.apache.spark.sql.functions._

import graft.ops.{IvfIndex, Similarity}

class IvfSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 5)

  test("IVF train produces nLists centroids of the right dimension") {
    val model = IvfIndex.train(emb, "vec_id", "embedding", nLists = 8, iterations = 3)
    assert(model.centroids.length == 8)
    assert(model.centroids.forall(_._2.length == 64))
    assert(model.centroids.map(_._1).toSeq == (0 until 8))
  }

  test("IVF search recall@5 >= 0.5 vs brute force with nProbe=4 of 8 cells") {
    val model = IvfIndex.train(emb, "vec_id", "embedding", nLists = 8, iterations = 3)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = IvfIndex.search(model, emb, queries, "vec_id", "embedding", 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("IVF model save/load round-trips bit-exact and searches identically") {
    val model = IvfIndex.train(emb, "vec_id", "embedding", nLists = 8, iterations = 2)
    val path = java.nio.file.Files.createTempDirectory("ivf_model").toString + "/m"
    IvfIndex.save(model, spark, path)
    val loaded = IvfIndex.load(spark, path)
    assert(loaded.centroids.map(_._1).toSeq == model.centroids.map(_._1).toSeq)
    assert(loaded.centroids.map(_._2).toSeq == model.centroids.map(_._2).toSeq)
    val a = IvfIndex.search(model, emb, queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = IvfIndex.search(loaded, emb, queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b)
  }

  // (build-once / query-many split, round 13 — see also Pq.save/load)
  test("searchFromCells over persisted cell assignments equals per-call search") {
    val model = IvfIndex.train(emb, "vec_id", "embedding", nLists = 8, iterations = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivf_cells").toString
    IvfIndex.withCell(emb, "embedding", model).write.mode("overwrite").parquet(dir)
    val fromCells = IvfIndex.searchFromCells(model, spark.read.parquet(dir),
        queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val perCall = IvfIndex.search(model, emb, queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(fromCells == perCall && fromCells.nonEmpty)
  }

  test("NearestCentroids matches a reference argmin-k with (dist, index) ties") {
    import org.apache.spark.sql.Row
    val cents = Array(Array(0.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 0.0))
    val df = spark.createDataFrame(
      java.util.List.of(Row(Seq(0.9, 0.1)), Row(Seq(0.0, 0.0))),
      org.apache.spark.sql.types.StructType.fromDDL("v array<double>"))
    val out = df.select(graft.functions.NearestCentroids(col("v"), cents, 3).as("p"))
      .collect().map(_.getSeq[Int](0).toSeq)
    // (0.9,0.1): d = [0.82, 0.02, 1.62, 0.02] -> tie between cells 1 and 3 broken by index
    assert(out(0) == Seq(1, 3, 0))
    // (0,0): d = [0, 1, 1, 1] -> 0 first, then index-ordered ties
    assert(out(1) == Seq(0, 1, 2))
  }

  test("IVF at nLists=256: no literal blowup in the plan, recall holds") {
    val model = IvfIndex.train(emb, "vec_id", "embedding", nLists = 256, iterations = 2)
    assert(model.centroids.length == 256)
    val out = IvfIndex.search(model, emb, queries, "vec_id", "embedding", 5, nProbe = 64)
    // the centroid matrix must ride as a reference object, not 256 literals
    val lits = out.queryExecution.analyzed.collect { case p => p }
      .flatMap(_.expressions)
      .map(_.collect { case l: org.apache.spark.sql.catalyst.expressions.Literal => l }.size)
      .sum
    assert(lits < 64, s"plan carries $lits literals — centroid literal blowup")
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = out.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("scale probe: 100k vectors, nLists=256, IVF recall@10 >= 0.9 at nProbe=16") {
    // evidence the reference-object centroid plan holds beyond sf tables:
    // 100k clustered vectors, a full 256-cell quantizer, 50 queries scored
    // against exact top-10. Blob members sit in the same (or an adjacent)
    // cell, so probing 16 of 256 cells must recover nearly all neighbors.
    val corpus = SyntheticVectors.clustered(spark, 100000, 16, 256, 0.05)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val model = IvfIndex.train(corpus, "vec_id", "embedding", nLists = 256, iterations = 3)
      assert(model.centroids.length == 256)
      val qs = corpus.filter(col("vec_id") < 50)
      val exact = Similarity.bruteForceTopK(corpus, qs, "vec_id", "embedding", 10)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val approx = IvfIndex.search(model, corpus, qs, "vec_id", "embedding", 10, nProbe = 16)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val recall = exact.count(approx.contains).toDouble / exact.size
      assert(recall >= 0.9, s"recall=$recall over ${exact.size} true pairs")
    } finally { corpus.unpersist(blocking = false); () }
  }

  test("assignmentStats: closed-form per-cell counts and scaled distances") {
    import spark.implicits._
    // hand-built 2-cell model on 2-dim vectors
    val model = IvfIndex.Model(Array(
      (0, Seq(0.0, 0.0)), (1, Seq(10.0, 0.0))))
    val batch = Seq(
      (1L, Seq(1.0, 0.0)),   // cell 0, sqdist 1
      (2L, Seq(0.0, 2.0)),   // cell 0, sqdist 4
      (3L, Seq(10.0, 3.0))   // cell 1, sqdist 9
    ).toDF("id", "vec")
    val got = IvfIndex.assignmentStats(model, batch, "vec")
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    // scaled = floor(sqdist * 1e12 + 0.5); exact for these integers
    assert(got == Seq((0, 2L, 5000000000000L), (1, 1L, 9000000000000L)))
  }

  test("assignmentStats: empty cells emit no row; batch never lands cross-cell") {
    import spark.implicits._
    val model = IvfIndex.Model(Array(
      (0, Seq(0.0, 0.0)), (1, Seq(10.0, 0.0)), (2, Seq(100.0, 0.0))))
    val batch = Seq((1L, Seq(0.5, 0.0)), (2L, Seq(0.25, 0.0))).toDF("id", "vec")
    val got = IvfIndex.assignmentStats(model, batch, "vec")
      .as[(Int, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(0)) // cells 1 and 2 saw nothing
    assert(got.head._2 == 2L)
  }

  test("IVF search accepts models with non-contiguous cell ids") {
    // a caller may drop empty cells from a trained model; positions map
    // back to the surviving cell ids
    val m8 = IvfIndex.train(emb, "vec_id", "embedding", nLists = 8, iterations = 2)
    val sparse = IvfIndex.Model(m8.centroids.zipWithIndex.collect {
      case ((_, c), i) if i % 2 == 0 => (i * 3 + 1, c) // ids 1,7,13,19
    })
    val out = IvfIndex.search(sparse, emb, queries, "vec_id", "embedding", 3, nProbe = 4)
      .collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getLong(0))
    byQ.values.foreach(rs => assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length)))
  }

  test("IVF search output shape: k ranked rows per query, no self-matches") {
    val model = IvfIndex.train(emb, "vec_id", "embedding", nLists = 4, iterations = 2)
    val out = IvfIndex.search(model, emb, queries, "vec_id", "embedding", 3, nProbe = 4)
      .collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size == 5)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to 3))
      assert(rs.forall(r => r.getLong(2) != r.getLong(0)))
    }
  }
}
