package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graded-relevance retrieval evaluation (NDCG@k) — the feedback loop that
  * closes the retrieval stack ([[Bm25]], [[Rrf]], [[Similarity]]): given a
  * ranked run and a graded relevance set, score each query's ranking
  * against the corpus-wide ideal.
  *
  * All arithmetic is integer, so the readout is bit-exact cross-engine:
  * per-rank discount weights are the FIXED literals
  * `w(r) = floor(1e6 / log2(r+1) + 0.5)` (materialized as constants — a
  * runtime `ln` could differ in the last ulp between libm
  * implementations and flip a rounding), gains are `2^rel - 1`, DCG and
  * ideal DCG are plain integer sums of `gain * w(rank)`, and NDCG is
  * reported in parts-per-million by integer division.
  *
  * The IDEAL ranking is computed corpus-wide without sorting the corpus:
  * relevance grades collapse to per-(query, grade) COUNTS (one hash
  * aggregate — at most `maxGrade` rows per query), and the grade at ideal
  * rank r is `max{g : #docs with grade >= g  >=  r}` — a join of the
  * bounded count table against the k rank positions. Nothing about the
  * corpus beyond those counts ever reaches the ideal side, so the shape
  * is identical at 100 TB.
  */
object RetrievalEval {

  /** `floor(1e6 / log2(r+1) + 0.5)` for r = 1..10 — the standard DCG
    * log-discount, scaled to integer micro-units. Literal by design, see
    * scaladoc. */
  private val DcgWeightsMicro: Seq[Long] = Seq(
    1000000L, 630930L, 500000L, 430677L, 386853L,
    356207L, 333333L, 315465L, 301030L, 289065L)

  /** NDCG@k per query.
    *
    * @param run  ranked retrieval output: one row per (qid, docId) with a
    *             1-based `rankCol`; ranks beyond k are ignored
    * @param rels graded relevance: (qid, docId, relCol) with integer
    *             grades 1..3 (docs absent from `rels` are grade 0)
    * @param k    cutoff, 1..10 (the literal weight table's range)
    * @return one row per qid present in `run`:
    *         `(qid, n_rel, dcg_u, idcg_u, ndcg_ppm)` — `n_rel` the number
    *         of grade>=1 docs corpus-wide, `dcg_u`/`idcg_u` integer
    *         micro-DCGs, `ndcg_ppm = dcg_u * 1e6 div idcg_u` (null when
    *         the query has no relevant docs anywhere)
    */
  def ndcgAtK(
      run: DataFrame,
      qidCol: String,
      docCol: String,
      rankCol: String,
      rels: DataFrame,
      relQidCol: String,
      relDocCol: String,
      relCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= DcgWeightsMicro.size,
      s"k must be in 1..${DcgWeightsMicro.size}, got $k")
    val spark = run.sparkSession
    import spark.implicits._

    val wDf = DcgWeightsMicro.take(k).zipWithIndex
      .map { case (w, i) => (i + 1L, w) }.toDF("r", "w")
    def gain(rel: org.apache.spark.sql.Column) =
      pow(lit(2.0), rel.cast("int")).cast("long") - 1L

    // observed DCG: run rows keep their grade (0 when unjudged); the rank
    // weight table is k rows — broadcast by construction
    val dcg = run
      .filter(col(rankCol) <= k)
      .join(rels.select(col(relQidCol).as(qidCol), col(relDocCol).as(docCol),
          col(relCol).as("__rel")),
        Seq(qidCol, docCol), "left")
      .join(broadcast(wDf), col(rankCol) === col("r"))
      .groupBy(qidCol)
      .agg(sum(gain(coalesce(col("__rel"), lit(0L))) * col("w")).as("dcg_u"))

    // ideal DCG from per-grade counts: cum(g) = #docs with grade >= g
    // (window over at most maxGrade rows per query), ideal grade at rank
    // r is the max g with cum(g) >= r
    val relCnt = rels
      .filter(col(relCol) >= 1)
      .groupBy(col(relQidCol).as(qidCol), col(relCol).as("__g"))
      .agg(count(lit(1)).as("__cnt"))
    val cumW = Window.partitionBy(qidCol).orderBy(col("__g").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = relCnt.withColumn("__cum", sum("__cnt").over(cumW))
    val nRel = cum.groupBy(qidCol).agg(max("__cum").as("n_rel"))
    val idcg = cum
      .join(broadcast(wDf), col("__cum") >= col("r"))
      .groupBy(col(qidCol), col("r"), col("w"))
      .agg(max("__g").as("__ig"))
      .groupBy(qidCol)
      .agg(sum(gain(col("__ig")) * col("w")).as("idcg_u"))

    dcg
      .join(nRel, Seq(qidCol), "left")
      .join(idcg, Seq(qidCol), "left")
      .select(col(qidCol), coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("dcg_u"), coalesce(col("idcg_u"), lit(0L)).as("idcg_u"),
        when(col("idcg_u") > 0, expr("dcg_u * 1000000 div idcg_u"))
          .as("ndcg_ppm"))
  }

  /** Binary-relevance recall@k and reciprocal rank, ppm-exact.
    *
    * Same scale shape as [[ndcgAtK]]: hits are one run⋈rels equi-join,
    * the corpus-wide relevant count is one hash aggregate, and the
    * readouts are integer divisions —
    * `recall_ppm = hits * 1e6 div min(n_rel, k)` (the k-capped
    * denominator, so a perfect ranker can reach 1e6 even when n_rel > k)
    * and `rr_ppm = 1e6 div first_hit_rank` (0 when the top-k has no hit;
    * averaging rr_ppm over queries is MRR). Grades in `rels` are not
    * interpreted beyond presence — filter grade thresholds upstream.
    *
    * @return one row per qid in `run`:
    *         `(qid, n_rel, n_hits, recall_ppm, rr_ppm)`; `recall_ppm` is
    *         null when the query has no relevant docs anywhere
    */
  def recallAtK(
      run: DataFrame,
      qidCol: String,
      docCol: String,
      rankCol: String,
      rels: DataFrame,
      relQidCol: String,
      relDocCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val relKeys = rels
      .select(col(relQidCol).as(qidCol), col(relDocCol).as(docCol)).distinct()
    val nRel = relKeys.groupBy(qidCol).agg(count(lit(1)).as("n_rel"))
    val hits = run
      .filter(col(rankCol) <= k)
      .join(relKeys.withColumn("__hit", lit(1L)), Seq(qidCol, docCol), "left")
      .groupBy(qidCol)
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_hits"),
        min(when(col("__hit").isNotNull, col(rankCol))).as("__first"))
    hits
      .join(nRel, Seq(qidCol), "left")
      .select(col(qidCol), coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("n_hits"),
        when(coalesce(col("n_rel"), lit(0L)) > 0,
          expr(s"n_hits * 1000000 div least(n_rel, ${k}L)")).as("recall_ppm"),
        coalesce(expr("1000000 div __first"), lit(0L)).as("rr_ppm"))
  }
}
