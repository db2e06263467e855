package graft

import org.apache.spark.sql.functions._

import graft.functions.CanonicalizeUrl

/** Closed-form checks for URL canonicalization: each documented rule,
  * the pass-through contract, and SQL/Column API agreement.
  */
class CanonicalizeUrlSpec extends SparkSpec {

  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(CanonicalizeUrl(col("u")).as("c"))
      .as[String].collect().head

  test("scheme/host lowercase, default port, fragment, tracking params, sort") {
    assert(canon("HTTPS://Site-3.Example.ORG:443/EN/doc-7?utm_source=x&b=2&a=1#frag")
      == "https://site-3.example.org/EN/doc-7?a=1&b=2")
    // path case is preserved (case-sensitive per RFC 3986)
    assert(canon("http://H.example.com:80/CaseSensitive")
      == "http://h.example.com/CaseSensitive")
  }

  test("non-default ports survive; empty path becomes /") {
    assert(canon("http://h.example.com:8080/x") == "http://h.example.com:8080/x")
    assert(canon("https://h.example.com") == "https://h.example.com/")
    assert(canon("https://h.example.com?x=1") == "https://h.example.com/?x=1")
  }

  test("tracking-only query drops the ?; duplicate keys sort stably") {
    assert(canon("https://h/p?utm_a=1&ref=x&fbclid=z") == "https://h/p")
    assert(canon("https://h/p?b=2&a=10&a=2") == "https://h/p?a=10&a=2&b=2")
    // fragment cut happens before query parsing
    assert(canon("https://h/p#f?x=1") == "https://h/p")
  }

  test("non-URLs pass through unchanged; null stays null") {
    assert(canon("not a url") == "not a url")
    assert(canon("  spaced  ") == "spaced")
    // "://" inside free text does not make it a URL: the pseudo-scheme
    // "see how http" fails RFC 3986 validation → byte-identical output
    assert(canon("see how http:// works for details")
      == "see how http:// works for details")
    assert(canon("weird ://host/p?x=1") == "weird ://host/p?x=1")
    // a real exotic-but-valid scheme still canonicalizes
    assert(canon("ssh+git://Host.Example/Repo#frag") == "ssh+git://host.example/Repo")
    val n = Seq[Option[String]](None).toDF("u")
      .select(CanonicalizeUrl(col("u"))).collect().head
    assert(n.isNullAt(0))
  }

  test("canonicalize_url in SQL agrees with the Column API") {
    val viaSql = spark.sql(
      "SELECT canonicalize_url('HTTP://A.B:80/p?utm_x=1&z=1&y=2#f') AS c")
      .collect().head.getString(0)
    assert(viaSql == canon("HTTP://A.B:80/p?utm_x=1&z=1&y=2#f"))
    assert(viaSql == "http://a.b/p?y=2&z=1")
  }

  test("hostSuffixes: label suffixes 2..maxLabels, null-safe") {
    import graft.ops.UrlFilter
    def sfx(h: String, maxLabels: Int = 10): Seq[String] =
      Seq(Tuple1(h)).toDF("h")
        .select(UrlFilter.hostSuffixes(col("h"), maxLabels).as("s"))
        .as[Seq[String]].collect().head
    assert(sfx("a.b.example.org")
      == Seq("example.org", "b.example.org", "a.b.example.org"))
    assert(sfx("a.b.example.org", maxLabels = 2) == Seq("example.org"))
    assert(sfx("localhost") == Seq.empty) // below the registrable floor
    assert(Seq(Tuple1(null: String)).toDF("h")
      .select(UrlFilter.hostSuffixes(col("h")).as("s"))
      .as[Seq[String]].collect().head == Seq.empty)
  }

  test("flagBlocked: suffix on label boundaries, never substring") {
    import graft.ops.UrlFilter
    val rows = Seq(
      (1L, "https://site-3.example.org/x"),       // exact host in list
      (2L, "https://cdn.site-3.example.org/x"),   // subdomain of entry
      (3L, "https://notexample.org/x"),           // substring must NOT match
      (4L, "https://Site-3.Example.ORG./x"),      // case + trailing dot
      (5L, "https://example.org/x"),              // parent of entry: kept
      (6L, "https://localhost/x"))                // single label: kept
      .toDF("id", "url")
    val bl = Seq(Tuple1("site-3.example.org")).toDF("domain")
    val got = UrlFilter.flagBlocked(rows, "id", "url", bl)
      .select("id", "blocked").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> false, 4L -> true,
      5L -> false, 6L -> false))
  }
}
