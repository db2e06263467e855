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
