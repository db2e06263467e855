package graft

import org.apache.spark.sql.types._

/** Canary for driver-testdata encoding drift — the round-8 failure class.
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * changed a column's physical encoding once (`events.ts`: int64
  * nanoseconds → timestamp[us], which turned 30 green queries into one
  * cryptic analysis error each). `SparkEntry.events` now branches on the
  * loaded schema (guarded by `EventsEncodingSpec`); THIS spec makes any
  * OTHER table's drift fail loudly with an actionable message instead of
  * surfacing as a wall of downstream query failures.
  *
  * If this test fails after a testdata regeneration: the encoding drifted
  * on purpose. Follow the `events()` precedent — branch the loader on the
  * loaded type, keep the DuckDB oracle reading the same file natively,
  * and update the expectation here.
  */
class TestdataSchemaSpec extends SparkSpec {

  private val expected: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType)
    // events intentionally absent: its ts encoding is ALLOWED to drift —
    // SparkEntry.events branches on it and EventsEncodingSpec pins all
    // accepted encodings
  )

  for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"testdata schema canary: $table") {
      val got = spark.read.parquet(s"$sf/$table.parquet").schema
        .map(f => f.name -> f.dataType).toMap
      val drift = (cols.keySet ++ got.keySet).toSeq.sorted.flatMap { c =>
        (cols.get(c), got.get(c)) match {
          case (Some(e), Some(g)) if e != g => Some(s"$c: expected $e, got $g")
          case (Some(e), None) => Some(s"$c: expected $e, column MISSING")
          case (None, Some(g)) => Some(s"$c: NEW column of type $g")
          case _ => None
        }
      }
      assert(drift.isEmpty,
        s"\ntestdata encoding drifted for '$table' — the driver regenerated " +
          s"the parquet with a different physical schema. Branch the loader " +
          s"on the loaded type (see SparkEntry.events for the precedent), " +
          s"re-verify the DuckDB oracles, then update this canary:\n  " +
          drift.mkString("\n  "))
    }
  }
}
