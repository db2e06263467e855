package graft

import org.apache.spark.sql.functions._

import graft.functions.{RollingHashFingerprint, SimHash64, TokenizeWords}

/** The SQL surface registered by [[GraftExtensions]] (the test session is
  * built `withExtensions`), checked against the Column-API expressions so
  * the two entry points can't drift.
  */
class ExtensionsSpec extends SparkSpec {

  test("parse_log_line in SQL extracts all capture groups in one pass") {
    val g = spark.sql(raw"""SELECT parse_log_line('7 INFO boot', '(\\d+) (\\w+) (.+)') AS g""")
      .collect().head.getSeq[String](0)
    assert(g == Seq("7", "INFO", "boot"))
  }

  test("simhash64 / rolling_fingerprint in SQL agree with the Column API") {
    val row = spark.sql(
      """SELECT simhash64(array('alpha','beta','alpha')) AS sh,
        |       rolling_fingerprint('hello world rolling', 4) AS rf""".stripMargin)
      .collect().head
    val viaColumn = spark.range(1)
      .select(
        SimHash64(TokenizeWords(lit("alpha beta alpha"))).as("sh"),
        RollingHashFingerprint(lit("hello world rolling"), 4).as("rf"))
      .collect().head
    assert(row.getLong(0) == viaColumn.getLong(0))
    assert(row.getLong(1) == viaColumn.getLong(1))
  }

  test("simhash128 in SQL agrees with the Column API; word 0 extends simhash64") {
    val row = spark.sql(
      """SELECT simhash128(array('alpha','beta','alpha')) AS sh128,
        |       simhash64(array('alpha','beta','alpha')) AS sh64""".stripMargin)
      .collect().head
    val viaColumn = spark.range(1)
      .select(graft.functions.SimHash128(TokenizeWords(lit("alpha beta alpha"))).as("sh"))
      .collect().head.getSeq[Long](0)
    assert(row.getSeq[Long](0) == viaColumn)
    assert(row.getSeq[Long](0).length == 2)
    assert(row.getSeq[Long](0).head == row.getLong(1)) // extension property
  }

  test("chunk_text in SQL agrees with the Column API") {
    val viaSql = spark.sql(
      "SELECT chunk_text('a b c d e f g', 3, 2) AS c")
      .collect().head.getSeq[String](0)
    val viaColumn = spark.range(1)
      .select(graft.functions.ChunkText(lit("a b c d e f g"), 3, 2).as("c"))
      .collect().head.getSeq[String](0)
    assert(viaSql == viaColumn)
    assert(viaSql == Seq("a b c", "c d e", "e f g"))
  }

  test("hashed_shingles + minhash_signature compose in SQL") {
    val sig = spark.sql(
      "SELECT minhash_signature(hashed_shingles('a b c d e', 3), 8) AS s")
      .collect().head.getSeq[Long](0)
    assert(sig.length == 8)
    // identical text -> identical signature (determinism through the SQL path)
    val sig2 = spark.sql(
      "SELECT minhash_signature(hashed_shingles('a b c d e', 3), 8) AS s")
      .collect().head.getSeq[Long](0)
    assert(sig == sig2)
  }

  test("vector_mean in SQL: grouped element-wise mean with partial aggregation") {
    spark.range(100).selectExpr("id % 2 AS g", "array(cast(id as double), 1.0d) AS v")
      .repartition(8).createOrReplaceTempView("t_vm")
    val rows = spark.sql("SELECT g, vector_mean(v) AS c FROM t_vm GROUP BY g ORDER BY g")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    assert(rows(0)._2 == Seq(49.0, 1.0)) // mean of 0,2,...,98
    assert(rows(1)._2 == Seq(50.0, 1.0)) // mean of 1,3,...,99
  }

  test("cosine_similarity in SQL: exact on aligned vectors, 0.0 on zero norm") {
    val r = spark.sql(
      """SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS same,
        |       cosine_similarity(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS orth,
        |       cosine_similarity(array(0.0d, 0.0d), array(1.0d, 0.0d)) AS zero""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
  }
}
