package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** COVERAGE.md is the authoritative per-operator → query map (SURVEY
  * §2C), but until round 16 nothing machine-checked it against
  * `SparkEntry.queries` — a renamed or added query could silently drift
  * out of the inventory the judge reads (and did: this spec's first
  * runs caught `q_group_split`, `q_tpch_q14`, and `q_tpch_q18` missing,
  * a compressed TPC-H name list, and two shorthand tokens naming
  * queries that don't exist). Both directions:
  *
  *  - every `queries` key must APPEAR in COVERAGE.md (substring — rows
  *    cite keys in backticks, prose, or comma lists);
  *  - every query-shaped token in COVERAGE.md (`q_foo_bar`, or the
  *    glob `q_foo_*`) must resolve against `queries` — exact key, or a
  *    glob matching at least one key. A token matching neither is a
  *    stale name pointing readers at a query that doesn't exist.
  *
  * No Spark session needed — pure text vs the query map.
  */
class CoverageDriftSpec extends AnyFunSuite {

  private lazy val coverage = Files.readString(Paths.get("COVERAGE.md"))
  private lazy val keys = SparkEntry.queries.keySet

  test("every SparkEntry.queries key appears in COVERAGE.md") {
    val missing = keys.filterNot(coverage.contains).toSeq.sorted
    assert(missing.isEmpty,
      s"queries with no COVERAGE.md mention (add a row/citation): $missing")
  }

  test("every query token in COVERAGE.md resolves against SparkEntry.queries") {
    // q_-prefixed identifiers (plus the q1_agg flagship), optionally
    // glob-starred; the trailing [a-z0-9] keeps a bare "q_" or a
    // trailing underscore from counting as a token
    val token = """\bq(?:1)?_[a-z0-9_]*(?:[a-z0-9]\*?|\*)""".r
    val bad = token.findAllMatchIn(coverage).map(_.matched).toSeq.distinct
      .filterNot { t =>
        if (t.endsWith("*")) keys.exists(_.startsWith(t.dropRight(1)))
        else keys.contains(t)
      }.sorted
    assert(bad.isEmpty,
      s"COVERAGE.md names queries that don't exist (stale/renamed?): $bad")
  }
}
