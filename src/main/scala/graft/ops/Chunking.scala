package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Overlapping token-window document chunking (RAG indexing / long-doc
  * training prep): split each document's token stream into windows of
  * `chunkSize` tokens advancing by `stride` (`stride <= chunkSize` gives an
  * overlap of `chunkSize - stride`).
  *
  * Built entirely from codegen'd collection builtins — `sequence` →
  * `transform`/`slice` → `posexplode` — so it is a pure per-row flatMap the
  * optimizer pipelines into the scan: no UDF, no shuffle, no state. At
  * 100 TB this runs embarrassingly parallel at whatever parallelism the
  * scan has; output size is input size × (1 + overlap fraction).
  *
  * Chunk count per doc follows the standard covering rule: 1 window when
  * `n <= chunkSize`, else `ceil((n - chunkSize) / stride) + 1` — the last
  * window may be shorter than `chunkSize` (it is truncated, not padded;
  * padding is a model-side concern).
  */
object Chunking {

  /** Explodes `df` into (original columns…, chunk_idx, chunk_tokens,
    * chunk_text) rows. Documents with zero tokens produce zero chunks.
    */
  def chunkTokens(
      df: DataFrame,
      textCol: String,
      chunkSize: Int,
      stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val toks: Column = TextFunctions.tokens(col(textCol))
    val n: Column = size(toks)
    val nChunks: Column =
      when(n <= 0, lit(0))
        .when(n <= chunkSize, lit(1))
        .otherwise(floor((n - chunkSize + stride - 1) / lit(stride)).cast("int") + 1)
    val chunks: Column = transform(
      sequence(lit(0), nChunks - 1),
      i => slice(toks, i * stride + 1, lit(chunkSize)))
    df.withColumn("__chunks", when(nChunks > 0, chunks).otherwise(array()))
      .select(col("*"), posexplode(col("__chunks")).as(Seq("chunk_idx", "chunk_tokens")))
      .drop("__chunks")
      .withColumn("chunk_text", array_join(col("chunk_tokens"), " "))
  }
}
