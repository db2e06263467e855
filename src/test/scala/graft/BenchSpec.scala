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

  test("contamination verdict: case studies flag, quiet runs don't") {
    import Bench.contaminationReasons
    // quiet-box r15 builder runs (loadavg ~0.5, floors 0.27/1.4): clean
    assert(contaminationReasons(0.47, 32, 0.27, 1.41).isEmpty)
    // the r15 driver run (loadavg 7.94 at 32 cpus — under cpus/4, but the
    // floors 0.56/5.38 betray it): flagged with both floor reasons
    val r15 = contaminationReasons(7.94, 32, 0.56, 5.38)
    assert(r15.size == 2 && r15.forall(_.contains("floor")), r15.toString)
    // the same shape on a small box trips the loadavg rule too
    assert(contaminationReasons(7.94, 8, 0.56, 5.38).size == 3)
    // the r15 run-1 end-of-run anomaly (garbage rocksdb floor 20.97)
    assert(contaminationReasons(0.5, 32, 0.30, 20.97)
      .exists(_.contains("floor_rocksdb")))
    // non-Linux "-1" loadavg never trips the loadavg rule
    assert(contaminationReasons(-1.0, 32, 0.30, 1.40).isEmpty)
    // boundary: exactly at threshold is NOT contaminated (strictly above)
    assert(contaminationReasons(8.0, 32, 0.5, 2.5).isEmpty)
  }
}
