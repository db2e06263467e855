package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** IVF (inverted-file) approximate nearest neighbor: a coarse k-means
  * quantizer partitions the corpus into `nLists` cells; a query probes only
  * its `nProbe` nearest cells and scores candidates exactly.
  *
  * This is the second scale path for similarity search next to sign-LSH
  * ([[Similarity.lshTopK]]): IVF adapts to the data distribution (cells
  * follow density) where LSH is data-oblivious.
  *
  * Scale design: each Lloyd iteration is one corpus scan + one shuffle of
  * (cell, position, value) triples; the centroid model (nLists x dim
  * doubles) is the ONLY driver-side state — standard practice for a model
  * that must broadcast to every task. Assignment and search are
  * broadcast-joins against that small model, so the corpus never shuffles.
  *
  * Centroids initialize from the `nLists` lowest-id vectors and Lloyd
  * iterations are fixed-count (no RNG anywhere; the only nondeterminism
  * left is floating-point summation order inside avg()).
  */
object IvfIndex {

  final case class Model(centroids: Array[(Int, Seq[Double])])

  /** Train the coarse quantizer. */
  def train(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nLists: Int,
      iterations: Int = 5): Model = {
    // Lloyd iterations re-scan the vectors `iterations` times — persist so
    // the parquet read + double-cast runs once (unpersisted before return).
    val vecs = corpus.select(col(idCol).as("__id"), toDoubleArray(col(vecCol)).as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var centroids: Array[(Int, Seq[Double])] = vecs
      .orderBy("__id").limit(nLists).collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }

    for (_ <- 0 until iterations) {
      val assigned = assign(vecs, "__v", centroids)
      // one vector_mean buffer per (task, cell) in the partial phase — the
      // shuffle carries nLists buffers per task, not nLists x dim scalar
      // rows like the earlier posexplode/groupBy(cell, pos) formulation
      val next = assigned
        .groupBy("__cell")
        .agg(graft.functions.VectorMean(col("__v")).as("__c"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
      // empty cells keep their previous centroid
      val byCell = next.toMap
      centroids = centroids.map { case (cell, c) => (cell, byCell.getOrElse(cell, c)) }
    }
    vecs.unpersist(blocking = false)
    Model(centroids)
  }

  /** Nearest-centroid cell id(s) for each row's vector (broadcast model,
    * no shuffle). `nProbe` > 1 explodes each row into its n nearest cells.
    *
    * The centroid matrix is carried as ONE codegen reference object inside
    * [[graft.functions.NearestCentroids]] — a literal-per-centroid
    * expression tree would blow up analysis/codegen at realistic `nLists`
    * (>= 1024); this plan stays one node at any list count.
    */
  private def assign(
      df: DataFrame, vecCol: String, centroids: Array[(Int, Seq[Double])], nProbe: Int = 1): DataFrame = {
    // sorted by cell id, so matrix-position tie-break == (distance, cell)
    // like the previous array_sort formulation; positions translate back to
    // cell ids through ONE literal id array (cells need not be contiguous)
    val sorted = centroids.sortBy(_._1)
    val matrix = sorted.map(_._2.toArray)
    val ids = typedlit(sorted.map(_._1).toSeq)
    val probes = graft.functions.NearestCentroids(col(vecCol), matrix, nProbe)
    if (nProbe == 1) df.withColumn("__cell", element_at(ids, element_at(probes, 1) + 1))
    else df.withColumn("__cell", explode(transform(probes, p => element_at(ids, p + 1))))
  }

  /** Append `cell` — each row's nearest-centroid cell id (broadcast
    * model, no shuffle; accepts float or double vectors). The public
    * coarse-assignment surface that cell-local operators ([[SemDedup]])
    * and precomputed-assignment workflows build on. An existing `cell`
    * column is REPLACED (withColumn semantics — re-assigning after
    * retraining is the expected workflow), never duplicated.
    */
  def withCell(df: DataFrame, vecCol: String, model: Model): DataFrame =
    assign(df.drop("cell").withColumn("__wc", toDoubleArray(col(vecCol))),
        "__wc", model.centroids)
      .withColumnRenamed("__cell", "cell")
      .drop("__wc")

  /** Search: probe `nProbe` cells per query, score candidates exactly,
    * return (query_id, rank, neighbor_id, cosine) like the other top-k ops.
    * Assigns the corpus per call — for the build-once / query-many shape,
    * persist `withCell(corpus, …)` and use [[searchFromCells]] (a cell
    * written by a previous job stays valid as long as the model does —
    * the [[assignmentStats]] retrain-trigger lifecycle).
    */
  def search(
      model: Model,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 4): DataFrame =
    searchFromCells(model, withCell(corpus, vecCol, model), queries, idCol, vecCol, k, nProbe)

  /** [[search]] over a corpus that already carries its `cell` column
    * ([[withCell]]-shaped, usually persisted) — skips the per-call coarse
    * assignment. */
  def searchFromCells(
      model: Model,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      toDoubleArray(col(vecCol)).as("__cv"), col("cell").as("__cell"))
    val q = assign(
      queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("__qv")),
      "__qv", model.centroids, nProbe)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.join(broadcast(q), Seq("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineSimilarity(col("__cv"), col("__qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Per-cell ingest statistics for a batch of vectors under an EXISTING
    * quantizer — the retrain trigger of the index lifecycle (train →
    * [[save]]/[[load]] → [[withCell]] new batches → monitor → retrain):
    * assignments stay valid while per-cell quantization error is stable,
    * and a growing mean distance-to-centroid (distribution drift) or a
    * ballooning cell count (density shift) says retrain. Output:
    * (cell, n, scaled_sum_sqdist) for non-empty cells, where each row's
    * squared L2 distance to its assigned centroid is scaled ONCE to a
    * 1e12 long before the cross-row sum (the int8/PQ float discipline —
    * raw double sums are partition-order dependent; the per-row fold is
    * sequential, matching DuckDB's list_sum for the oracle).
    *
    * One scan + the broadcast-model assignment + one broadcast join back
    * to the (nLists-row) centroid table + one hash aggregate — the batch
    * never shuffles by anything but the final nLists-key aggregate.
    */
  def assignmentStats(model: Model, batch: DataFrame, vecCol: String): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val cents = model.centroids.toSeq.toDF("cell", "__cent")
    val sq = aggregate(
      zip_with(col("__v"), col("__cent"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (a, e) => a + e)
    withCell(batch, vecCol, model)
      .select(col("cell"), toDoubleArray(col(vecCol)).as("__v"))
      .join(broadcast(cents), Seq("cell"))
      .withColumn("__scaled", floor(sq * lit(1e12) + 0.5).cast("long"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n"), sum("__scaled").as("scaled_sum_sqdist"))
  }

  /** Persist the trained quantizer as plain (cell, centroid) parquet so an
    * index trained once is reused across jobs. Retraining per run would
    * both waste `iterations` corpus scans and re-derive cell ids (they are
    * init-order dependent) — invalidating any cell assignments already
    * written by a previous job.
    */
  def save(model: Model, spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    model.centroids.toSeq.toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
    val p = new org.apache.hadoop.fs.Path(path)
    ArtifactFormat.writeSidecar(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), path,
      ArtifactFormat.KindIvfModel)
  }

  /** Load a quantizer written by [[save]]; centroids come back bit-exact
    * (doubles round-trip parquet losslessly), so assignments and searches
    * are reproducible across jobs. Rejects unstamped dirs, other artifact
    * kinds, and unknown format versions loudly ([[ArtifactFormat]]).
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val p = new org.apache.hadoop.fs.Path(path)
    ArtifactFormat.checkSidecar(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), path,
      ArtifactFormat.KindIvfModel)
    Model(spark.read.parquet(path).select("cell", "centroid").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1))
  }
}
