package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

class SimilaritySpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 5)

  test("brute-force topk: k rows per query, ranked by descending cosine") {
    val out = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
    val rows = out.collect()
    assert(rows.length == 5 * 5)
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to 5))
      val cosines = sorted.map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
      assert(cosines.forall(c => c >= -1.0001 && c <= 1.0001))
    }
  }

  test("self-similarity sanity: nearest neighbor of a duplicated vector is its twin") {
    import spark.implicits._
    val twin = emb.filter($"vec_id" === 0)
      .withColumn("vec_id", lit(99999L))
    val corpus = emb.unionByName(twin)
    val out = Similarity.bruteForceTopK(corpus, emb.filter($"vec_id" === 0), "vec_id", "embedding", 1)
      .collect().head
    assert(out.getLong(2) == 99999L && math.abs(out.getDouble(3) - 1.0) < 1e-9)
  }

  test("LSH topk recall@5 >= 0.5 vs brute force on sf0.001") {
    // random 64-dim embeddings: even true top-5 neighbors are near-orthogonal
    // (cos ~0.3 => per-bit collision ~0.6), so use short signatures + more
    // OR-tables: expected recall ~ 1-(1-0.6^4)^8 ~ 0.7
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5,
      dim = 64, nPlanes = 4, tables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("LSH is deterministic across runs (seeded hyperplanes)") {
    def run() = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 3,
      dim = 64, nPlanes = 6, tables = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(run() == run())
  }

  test("LshBuckets one-pass expression equals the per-table lshBucket composition") {
    import graft.functions.VectorFunctions.{hyperplanes, lshBucket, toDoubleArray}
    val tables = 4
    val planes = (0 until tables).map(t => hyperplanes(7L + t, 6, 64)).toArray
    val v = emb.select(toDoubleArray(col("embedding")).as("v"))
    val fused = v.select(graft.functions.LshBuckets(col("v"), planes).as("b"))
      .collect().map(_.getSeq[Int](0))
    val composed = v.select(array(planes.map(p => lshBucket(col("v"), p)).toSeq: _*).as("b"))
      .collect().map(_.getSeq[Int](0))
    assert(fused.toSeq == composed.toSeq)
  }

  test("scale probe: 100k-vector clustered corpus, LSH recall@10 >= 0.9") {
    // evidence the single-scan LSH plan holds beyond the 500-vector sf
    // tables: 100k vectors in 256 blobs, 50 queries, exact top-10 ground
    // truth. Near-parallel blob members share hyperplane signs, so modest
    // (nPlanes, tables) must recover almost all true neighbors.
    val corpus = SyntheticVectors.clustered(spark, 100000, 16, 256, 0.05)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val qs = corpus.filter(col("vec_id") < 50)
      val exact = Similarity.bruteForceTopK(corpus, qs, "vec_id", "embedding", 10)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(exact.size == 50 * 10)
      val approx = Similarity.lshTopK(corpus, qs, "vec_id", "embedding", 10,
        dim = 16, nPlanes = 12, tables = 4)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val recall = exact.count(approx.contains).toDouble / exact.size
      assert(recall >= 0.9, s"recall=$recall over ${exact.size} true pairs")
    } finally { corpus.unpersist(blocking = false); () }
  }

  test("lshTopK tolerates a malformed corpus row (dropped, not fatal); wrong dim still fails") {
    import spark.implicits._
    // a truncated vector FIRST in the corpus must not fail the dim guard —
    // it rides the bucket=-1 drop path like any other malformed row
    val malformed = Seq((99998L, Array(0.1f, 0.2f))).toDF("vec_id", "embedding")
    val corpus = malformed.unionByName(emb.select("vec_id", "embedding"))
    val out = Similarity.lshTopK(corpus, queries, "vec_id", "embedding", 3,
      dim = emb.head().getSeq[Float](1).length, nPlanes = 6, tables = 2)
    assert(out.count() > 0)
    assert(!out.collect().exists(_.getLong(2) == 99998L)) // malformed row never a candidate
    // a dim that matches NO sampled vector still fails loudly
    val e = intercept[Exception](
      Similarity.lshTopK(emb, queries, "vec_id", "embedding", 3,
        dim = 7, nPlanes = 6, tables = 2))
    assert(e.getMessage.contains("dim=7"))
  }

  test("lshTopK scans the corpus ONCE regardless of table count") {
    // the round-2 formulation unioned one corpus scan per hash table (16
    // scans at tables=16); single-pass bucketing must leave exactly two
    // parquet scans in the whole physical plan: corpus + queries
    val out = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5,
      dim = 64, nPlanes = 4, tables = 16)
    out.collect() // finalize AQE
    // count scans in the FINAL adaptive plan only (the string also repeats
    // the initial plan after "== Initial Plan ==")
    val finalPlan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val nScans = "FileScan parquet".r.findAllIn(finalPlan).length
    assert(nScans == 2, s"expected 2 parquet scans (corpus+queries), got $nScans in:\n$finalPlan")
  }

  test("rerankExact: exact cosine reorders candidates, never reaches outside them") {
    import spark.implicits._
    val corpus = Seq(
      (10L, Array(1f, 0f, 0f, 0f)),  // cosine 1.0 to the query — NOT a candidate
      (11L, Array(1f, 1f, 0f, 0f)),  // ~0.707
      (12L, Array(1f, 3f, 0f, 0f)),  // ~0.316
      (13L, Array(0f, 1f, 0f, 0f)))  // 0.0
      .toDF("vec_id", "embedding")
    val q = Seq((1L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    // ANN stage (simulated) surfaced 12 before 11 and missed 10 entirely
    val cands = Seq((1L, 12L), (1L, 11L), (1L, 13L)).toDF("query_id", "neighbor_id")
    val got = Similarity.rerankExact(cands, corpus, q, "vec_id", "embedding", k = 2)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._2)
    // exact cosine fixes the candidate ORDER (11 over 12); 10 can't appear
    // (two-stage contract: precision fixes ranking, recall was stage 1's job)
    assert(got == Seq((1L, 1L, 11L), (1L, 2L, 12L)))
  }

  test("rerankExact plan: bounded candidate/query sides broadcast, corpus never does") {
    val cands = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 20,
      dim = 64, nPlanes = 4, tables = 8).select("query_id", "neighbor_id")
    val out = Similarity.rerankExact(cands, emb, queries, "vec_id", "embedding", 5)
    out.collect()
    val finalPlan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(finalPlan.contains("BroadcastHashJoin"), finalPlan)
    assert(!finalPlan.contains("CartesianProduct") &&
      !finalPlan.contains("BroadcastNestedLoopJoin"), finalPlan)
  }

  test("hard negatives: cross-label only, near-duplicates excluded, ranked") {
    import spark.implicits._
    // anchor a1 (label 0); candidates: same-label twin (never a negative),
    // a cross-label near-duplicate (cosine 1.0, excluded by maxCosine),
    // and two genuine cross-label negatives at distinct similarities.
    val rows = Seq(
      (1L, Array(1f, 0f, 0f, 0f), 0), // anchor
      (2L, Array(1f, 0f, 0f, 0f), 0), // same label: excluded by label rule
      (3L, Array(2f, 0f, 0f, 0f), 1), // cross-label dup: cosine 1 >= 0.99
      (4L, Array(1f, 1f, 0f, 0f), 1), // cosine ~0.707
      (5L, Array(1f, 3f, 0f, 0f), 2), // cosine ~0.316
      (6L, Array(0f, 1f, 0f, 0f), 1)) // cosine 0
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(rows,
        rows.filter($"vec_id" === 1), "vec_id", "embedding", "label", k = 2)
      .select("anchor_id", "rank", "negative_id", "neg_label")
      .as[(Long, Long, Long, Int)].collect().toSeq.sortBy(_._2)
    assert(got == Seq((1L, 1L, 4L, 1), (1L, 2L, 5L, 2)))
  }
}
