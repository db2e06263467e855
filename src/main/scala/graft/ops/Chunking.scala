package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ChunkText

/** Overlapping token-window document chunking (RAG indexing / long-doc
  * training prep): split each document's token stream into windows of
  * `chunkSize` tokens advancing by `stride` (`stride <= chunkSize` gives an
  * overlap of `chunkSize - stride`).
  *
  * The window construction is the one-pass codegen expression
  * [[graft.functions.ChunkText]] (tokenize ONCE per document — see its
  * scaladoc for why the `transform`/`slice` builtin composition is a
  * per-chunk re-tokenize trap), followed by a `posexplode`: a pure per-row
  * flatMap the optimizer pipelines into the scan — no UDF, no shuffle, no
  * state. At 100 TB this runs embarrassingly parallel at whatever
  * parallelism the scan has; output size is input size × (1 + overlap
  * fraction). `chunk_tokens` is derived by splitting `chunk_text` (chunks
  * are short; Catalyst prunes it when unused).
  *
  * Chunk count per doc follows the standard covering rule: 1 window when
  * `n <= chunkSize`, else `ceil((n - chunkSize) / stride) + 1` — the last
  * window may be shorter than `chunkSize` (it is truncated, not padded;
  * padding is a model-side concern).
  */
object Chunking {

  /** Explodes `df` into (original columns…, chunk_idx, chunk_text,
    * chunk_tokens) rows. Documents with zero tokens produce zero chunks.
    */
  def chunkTokens(
      df: DataFrame,
      textCol: String,
      chunkSize: Int,
      stride: Int): DataFrame =
    df.select(col("*"),
        posexplode(ChunkText(col(textCol), chunkSize, stride))
          .as(Seq("chunk_idx", "chunk_text")))
      .withColumn("chunk_tokens", split(col("chunk_text"), " "))
}
