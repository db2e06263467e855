package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Product quantization (PQ) — the storage half of a billion-scale ANN
  * index (IVF-PQ): each vector splits into `blocks` contiguous
  * subvectors, each subvector is replaced by the id of its nearest
  * codebook centroid, and the whole vector compresses to `blocks` small
  * integers (e.g. 64 floats -> 4 bytes at blocks=4, codebookSize<=256:
  * 64x smaller). Search-side, distances are then computed against the
  * reconstructed centroids (ADC) — here we provide train / encode /
  * reconstruction-error; the coarse routing half is [[IvfIndex]].
  *
  * Each block's codebook is trained with [[IvfIndex.train]] on the
  * sliced subvectors — same broadcast-model scale shape: per block, the
  * corpus is scanned (not shuffled) per Lloyd iteration and the only
  * driver-side state is `blocks x codebookSize x subDim` doubles.
  * Encoding is pure per-row codegen ([[graft.functions
  * .NearestCentroids]] per block, the matrix as ONE reference object) —
  * no shuffle, no UDF, embarrassingly parallel at scan parallelism.
  */
object Pq {

  /** Per-block codebooks; `dim = blocks * subDim`. Cell ids from
    * [[IvfIndex.train]] are 0..codebookSize-1 in init order, so a cell
    * id IS the code.
    */
  final case class Model(blocks: Int, subDim: Int, codebooks: Array[IvfIndex.Model]) {
    require(blocks == codebooks.length)
  }

  /** Persist a trained PQ model as one (block, cell, centroid) parquet —
    * the model half of the build-once / query-many split ([[encodeCorpus]]
    * persists the code table; this persists what decodes it). Centroids
    * round-trip parquet bit-exact, so codes written by a previous job stay
    * valid: retraining would re-derive init-order-dependent cell ids and
    * silently invalidate every persisted code.
    */
  def save(model: Model, spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    model.codebooks.zipWithIndex.flatMap { case (book, b) =>
      book.centroids.map { case (cell, c) => (b, cell, c) }
    }.toSeq.toDF("block", "cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
    val p = new org.apache.hadoop.fs.Path(path)
    ArtifactFormat.writeSidecar(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), path,
      ArtifactFormat.KindPqModel)
  }

  /** Load a model written by [[save]], bit-exact; rejects unstamped dirs,
    * other artifact kinds, and unknown format versions loudly
    * ([[ArtifactFormat]]). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val p = new org.apache.hadoop.fs.Path(path)
    ArtifactFormat.checkSidecar(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), path,
      ArtifactFormat.KindPqModel)
    val rows = spark.read.parquet(path).select("block", "cell", "centroid").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    require(rows.nonEmpty, s"[Pq] empty model at $path")
    val byBlock = rows.groupBy(_._1).toSeq.sortBy(_._1)
    // a partially-written/pruned model must fail LOUDLY: a missing block
    // would silently shift every later block's codebook and decode wrong
    // neighbors (review finding)
    require(byBlock.map(_._1) == (0 until byBlock.size),
      s"[Pq] non-contiguous block ids ${byBlock.map(_._1).mkString(",")} at $path")
    val cellCounts = byBlock.map(_._2.size).distinct
    require(cellCounts.size == 1,
      s"[Pq] blocks carry differing cell counts $cellCounts at $path")
    val books = byBlock.map { case (_, cells) =>
      IvfIndex.Model(cells.map(c => (c._2, c._3)).sortBy(_._1).toArray)
    }.toArray
    val subDim = books.head.centroids.head._2.length
    require(books.forall(_.centroids.forall(_._2.length == subDim)),
      s"[Pq] inconsistent centroid dims at $path")
    Model(books.length, subDim, books)
  }

  /** Train one codebook per block. `dim` must divide evenly by `blocks`;
    * `iterations = 0` keeps centroids bit-exact copies of the
    * `codebookSize` lowest-id subvectors (the oracle-reproducible
    * setting — see [[IvfIndex.train]]); production uses a few Lloyd
    * iterations.
    */
  def train(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      blocks: Int,
      codebookSize: Int,
      iterations: Int = 0): Model = {
    require(blocks > 0, s"blocks must be positive, got $blocks")
    val v = toDoubleArray(col(vecCol))
    val probe = corpus.select(size(v)).head(1)
    require(probe.nonEmpty, "Pq.train: corpus is empty")
    val dim = probe(0).getInt(0)
    require(dim % blocks == 0, s"dim $dim must divide by blocks $blocks")
    val subDim = dim / blocks
    val books: Array[IvfIndex.Model] =
      if (iterations == 0) {
        // no Lloyd refinement: all block codebooks are slices of the SAME
        // codebookSize lowest-id vectors — ONE ordered collect instead of
        // `blocks` separate train jobs (each with its own persist+collect)
        val base = corpus.select(col(idCol).as("__id"), v.as("__v"))
          .orderBy("__id").limit(codebookSize).collect()
          .map(_.getSeq[Double](1))
        (0 until blocks).map { b =>
          IvfIndex.Model(base.zipWithIndex.map { case (vec, i) =>
            (i, vec.slice(b * subDim, (b + 1) * subDim))
          }.toArray)
        }.toArray
      } else {
        (0 until blocks).map { b =>
          IvfIndex.train(
            corpus.select(col(idCol), slice(v, b * subDim + 1, subDim).as("__sv")),
            idCol, "__sv", codebookSize, iterations)
        }.toArray
      }
    Model(blocks, subDim, books)
  }

  /** `array<int>` of `blocks` codes for `vecCol` — one codegen
    * nearest-centroid argmin per block, matrices as reference objects.
    */
  def encode(vecCol: Column, model: Model): Column = {
    val v = toDoubleArray(vecCol)
    array(model.codebooks.zipWithIndex.map { case (book, b) =>
      val sorted = book.centroids.sortBy(_._1)
      val matrix = sorted.map(_._2.toArray)
      // cells are 0..k-1 by construction, so position-1 == cell id == code
      element_at(graft.functions.NearestCentroids(
        slice(v, b * model.subDim + 1, model.subDim), matrix, 1), 1)
    }: _*)
  }

  /** ADC (asymmetric distance computation) top-k — the search half of
    * IVF-PQ: each query precomputes a `blocks x codebookSize` table of
    * squared distances from ITS subvectors to every codebook centroid
    * (driver-side — |queries| x blocks x codebookSize doubles, bounded
    * by the query set like [[Similarity.bruteForceTopK]]'s broadcast),
    * and a compressed corpus vector's distance is then just `blocks`
    * table lookups summed — the corpus is scanned once with NO float
    * math per dimension, which is the whole point of PQ at billions of
    * vectors.
    *
    * Distances are summed as 1e12-scaled LONGS (per-block floor-round,
    * then exact integer adds), so ranking is deterministic and
    * cross-engine reproducible — an oracle can re-derive the exact
    * result set instead of grading recall. Returns (query_id, rank,
    * neighbor_id, scaled_adc), rank by (scaled_adc asc, neighbor_id
    * asc), self-matches excluded.
    */
  def adcSearch(
      model: Model,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qRows = queries
      .select(col(idCol).cast("long").as("query_id"), toDoubleArray(col(vecCol)).as("__qv"))
      .collect()
    val books = sortedBooks(model)
    val tables: Seq[(Long, Seq[Seq[Long]])] = qRows.toSeq.map { r =>
      (r.getLong(0), scaledDistanceTable(r.getSeq[Double](1), books, model))
    }
    val qTables = tables.toDF("query_id", "__tbl")
    val encoded = Dedup.spreadDf(corpus)
      .select(col(idCol).cast("long").as("neighbor_id"),
        encode(col(vecCol), model).as("__code"))
    encoded.join(broadcast(qTables), col("query_id") =!= col("neighbor_id"))
      .withColumn("scaled_adc", adcLookupSum(model))
      .transform(topK(k))
  }

  /** The cross-engine determinism contract shared by [[adcSearch]] and
    * [[ivfPqSearch]]: per-block squared distances from a query's
    * subvectors to every codebook centroid, accumulated SEQUENTIALLY in
    * index order and floor-rounded to 1e12-scaled longs.
    */
  private def scaledDistanceTable(
      qv: Seq[Double], books: Array[Array[Array[Double]]], model: Model): Seq[Seq[Long]] =
    (0 until model.blocks).map { b =>
      books(b).toSeq.map { c =>
        var d = 0.0
        var i = 0
        while (i < model.subDim) {
          val x = qv(b * model.subDim + i) - c(i)
          d += x * x
          i += 1
        }
        math.floor(d * 1e12 + 0.5).toLong
      }
    }

  private def sortedBooks(model: Model): Array[Array[Array[Double]]] =
    model.codebooks.map(_.centroids.sortBy(_._1).map(_._2.toArray))

  /** ADC = the sum of each block's table entry at the neighbor's code —
    * exact long adds over `__tbl`/`__code` columns.
    */
  private def adcLookupSum(model: Model): Column =
    (0 until model.blocks).map { b =>
      element_at(element_at(col("__tbl"), b + 1), element_at(col("__code"), b + 1) + 1)
    }.reduce(_ + _)

  private def topK(k: Int)(scored: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("scaled_adc").asc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "scaled_adc")
  }

  /** FULL IVF-PQ search — the composition billion-scale ANN actually
    * deploys: the coarse quantizer routes each query to its `nProbe`
    * nearest cells (candidate set ~ nProbe/nLists of the corpus — the
    * scan shrinks BEFORE any scoring), and PQ-ADC scores only those
    * candidates with integer table lookups. One corpus pass computes
    * both the coarse cell and the PQ codes (both codegen argmins); the
    * query side broadcasts as TWO slim relations — (query, cell) probe
    * pairs for routing and one distance-table row per query — so the
    * candidate join is a broadcast EQUI-join on the cell id and the
    * broadcast stays |queries| tables, never |queries| x nProbe.
    *
    * Probe selection reuses [[graft.functions.NearestCentroids.compute]]
    * driver-side, so query routing is bit-identical to the corpus-side
    * assignment; distances follow [[adcSearch]]'s scaled-long contract —
    * ranking is deterministic and an oracle re-derives the exact result.
    */
  def ivfPqSearch(
      coarse: IvfIndex.Model,
      pq: Model,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 4): DataFrame =
    ivfPqSearchFromCodes(coarse, pq,
      encodeCorpus(coarse, pq, corpus, idCol, vecCol), queries, idCol, vecCol, k, nProbe)

  /** The BUILD half of the build-once / query-many split (the
    * [[graft.ops.Bm25.tfPostings]] discipline): one corpus pass computing
    * each vector's coarse cell and PQ code — `(neighbor_id, cell,
    * __code)`. At 100 TB this IS the index: persist it (a few bytes per
    * vector instead of the raw embeddings) and serve query batches with
    * [[ivfPqSearchFromCodes]]; the per-call encode inside [[ivfPqSearch]]
    * is convenience for small corpora. ScaleCurve measures the query half
    * flat (`ann_ivfpq_q`) where the re-encoding variant grows with the
    * corpus (`ann_ivfpq`, tail 0.32 — dev/SCALE_CURVE.md round-13).
    */
  def encodeCorpus(
      coarse: IvfIndex.Model,
      pq: Model,
      corpus: DataFrame,
      idCol: String,
      vecCol: String): DataFrame =
    Dedup.spreadDf(IvfIndex.withCell(
        corpus.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("__cv")),
        "__cv", coarse))
      .select(col("neighbor_id"), col("cell"), encode(col("__cv"), pq).as("__code"))

  /** Query half of [[ivfPqSearch]] over a pre-encoded
    * ([[encodeCorpus]]-shaped, usually persisted) index table. */
  def ivfPqSearchFromCodes(
      coarse: IvfIndex.Model,
      pq: Model,
      codes: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 4): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val sortedCoarse = coarse.centroids.sortBy(_._1)
    val coarseIds = sortedCoarse.map(_._1)
    val coarseMatrix = sortedCoarse.map(_._2.toArray)
    val books = sortedBooks(pq)
    val qRows = queries
      .select(col(idCol).cast("long").as("query_id"), toDoubleArray(col(vecCol)).as("__qv"))
      .collect()
    // two SLIM broadcast relations instead of one with the table repeated
    // per probed cell: (query, cell) probe pairs for routing, plus ONE
    // table row per query — the broadcast stays |queries| tables, not
    // |queries| x nProbe
    val probePairs = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    val tables = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Seq[Long]])]
    qRows.foreach { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Double](1)
      val probes = graft.functions.NearestCentroids.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(qv.toArray),
        coarseMatrix, nProbe)
      (0 until probes.numElements()).foreach(p =>
        probePairs += ((qid, coarseIds(probes.getInt(p)))))
      tables += ((qid, scaledDistanceTable(qv, books, pq)))
    }
    val probeDf = probePairs.toSeq.toDF("query_id", "cell")
    val tableDf = tables.toSeq.toDF("query_id", "__tbl")
    // probe cells are distinct and a vector has one cell, so each
    // (query, neighbor) pair joins at most once — no dedup pass
    codes.join(broadcast(probeDf), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(broadcast(tableDf), Seq("query_id"))
      .withColumn("scaled_adc", adcLookupSum(pq))
      .transform(topK(k))
  }

  /** Per-block 1e12-scaled squared reconstruction error as
    * `array<long>` — LONGS, not doubles, so downstream sums are exact
    * and partition-order independent (the [[graft.functions
    * .VectorFunctions.int8SqError]] discipline). Centroid tables ride as
    * `typedlit` literals: fine at codebook scale (k x subDim doubles),
    * NOT the corpus path that needs reference objects.
    */
  def scaledSqError(vecCol: Column, codes: Column, model: Model): Column = {
    val v = toDoubleArray(vecCol)
    array(model.codebooks.zipWithIndex.map { case (book, b) =>
      val table = typedlit(book.centroids.sortBy(_._1).map(_._2).toSeq)
      val cent = element_at(table, element_at(codes, b + 1) + 1)
      val sub = slice(v, b * model.subDim + 1, model.subDim)
      val err = aggregate(zip_with(sub, cent, (x, c) => (x - c) * (x - c)),
        lit(0.0), (acc, e) => acc + e)
      floor(err * 1e12 + 0.5).cast("long")
    }: _*)
  }
}
