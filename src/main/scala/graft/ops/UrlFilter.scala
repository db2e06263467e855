package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-blocklist URL filtering — the UT1/adult-list shape every web
  * corpus pipeline runs before anything else: a URL is blocked when its
  * host, or any parent domain of its host, appears in the blocklist
  * (entry `example.org` blocks `a.b.example.org`), so list entries are
  * registrable domains and the match is by HOST SUFFIX on label
  * boundaries, never substring (`notexample.org` must not match).
  *
  * Scale shape: each URL explodes into its host's label suffixes —
  * bounded by `maxLabels` (hosts have ~3-5 labels; the cap kills
  * adversarial 100-label hosts) — and one semi-join against the blocklist
  * marks blocked ids. The join is UNPINNED: AQE broadcasts a bounded list
  * (UT1 is a few million short strings), a bigger one hash-joins on the
  * suffix. Suffixes stay strings (short, and a hash collision would
  * false-block a good domain); the explode factor is the only row
  * multiplier and it is ≤ maxLabels.
  *
  * Single-label hosts (`localhost`) produce no ≥2-label suffix and are
  * never blocked; single-label blocklist entries (bare TLDs) likewise
  * never match — both below the registrable-domain floor.
  */
object UrlFilter {

  /** Label suffixes of `host` with 2..maxLabels labels, shortest first:
    * `a.b.example.org` → [`example.org`, `b.example.org`,
    * `a.b.example.org`]. NULL-safe (NULL host → empty array).
    */
  def hostSuffixes(host: Column, maxLabels: Int = 10): Column = {
    val labels = split(host, "\\.")
    val nl = size(labels)
    coalesce(
      when(nl >= 2, transform(
        sequence(lit(2), least(nl, lit(maxLabels))),
        k => array_join(slice(labels, nl - k + 1, k), "."))),
      array().cast("array<string>"))
  }

  /** Flag each row of `df` whose `urlCol`'s host is covered by
    * `blocklist` (one `domain` column of lowercase registrable domains).
    * Output: `df` + `blocked` boolean. Hosts are lowercased and
    * trailing-dot-stripped before matching.
    */
  def flagBlocked(
      df: DataFrame,
      idCol: String,
      urlCol: String,
      blocklist: DataFrame,
      maxLabels: Int = 10): DataFrame = {
    val host = regexp_replace(
      lower(parse_url(col(urlCol), lit("HOST"))), "\\.$", "")
    val hits = df
      .select(col(idCol),
        explode(hostSuffixes(host, maxLabels)).as("__sfx"))
      .join(blocklist.select(col("domain").as("__sfx")), Seq("__sfx"),
        "left_semi")
      .select(col(idCol)).distinct()
      .withColumn("__blocked", lit(true))
    df.join(hits, Seq(idCol), "left")
      .withColumn("blocked", coalesce(col("__blocked"), lit(false)))
      .drop("__blocked")
  }
}
