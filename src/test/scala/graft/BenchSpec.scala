package graft

/** Guards for the bench harness's streaming floor/work breakdown: the
  * streaming-query roster must track the real query map (a renamed query
  * silently dropping out of the breakdown is the failure mode), and the
  * floor probe must produce a sane positive measurement.
  */
class BenchSpec extends SparkSpec {

  test("StreamingQueries roster is a subset of the declared query map") {
    val unknown = Bench.StreamingQueries -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"not in SparkEntry.queries: $unknown")
  }

  test("every q_streaming_* query is on the roster") {
    val missing = SparkEntry.queries.keySet
      .filter(_.startsWith("q_streaming_")) -- Bench.StreamingQueries
    assert(missing.isEmpty, s"streaming queries missing from roster: $missing")
  }

  test("stateless floor probe measures a positive drain time") {
    val f = Bench.measureFloor(spark, stateful = false, runs = 1)
    assert(f > 0.0 && f < 120.0, s"floor=$f")
  }
}
