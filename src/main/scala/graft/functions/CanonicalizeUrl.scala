package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization for URL-keyed dedup — the first dedup pass of a
  * web-crawl pipeline (cheaper than any content hash: two crawls of the
  * same page usually differ only in URL noise). Deterministic,
  * documented rules:
  *
  *  - scheme and host lowercase (they are case-insensitive by RFC 3986);
  *    path/query case is preserved (case-SENSITIVE by RFC)
  *  - fragment dropped (never sent to the server)
  *  - default ports dropped (`:80` for http, `:443` for https); other
  *    ports kept
  *  - tracking parameters dropped: any `utm_*`, plus `fbclid`, `gclid`,
  *    `mc_cid`, `mc_eid`, `ref` — the standard analytics noise set
  *  - remaining query parameters SORTED lexicographically (param order is
  *    almost never semantic; sorting merges permutations), empty params
  *    dropped, `?` dropped if nothing survives
  *  - empty path becomes `/`
  *
  * NOT done (ambiguous without fetching): percent-decoding, dot-segment
  * resolution, www-stripping, trailing-slash merging. A string that does
  * not look like `scheme://…` is returned unchanged — canonicalization
  * must never lose rows, only merge them.
  *
  * Native Catalyst expression with codegen (one JVM call per row inside
  * whole-stage codegen) — the [[UnicodeNormalize]] pattern.
  */
case class CanonicalizeUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "canonicalize_url"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"canonicalize_url requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    CanonicalizeUrl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CanonicalizeUrl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CanonicalizeUrl =
    copy(child = newChild)
}

object CanonicalizeUrl {

  private val TrackingExact =
    Set("fbclid", "gclid", "mc_cid", "mc_eid", "ref")

  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    val name = if (eq >= 0) param.substring(0, eq) else param
    name.startsWith("utm_") || TrackingExact.contains(name)
  }

  /** RFC 3986 scheme: ALPHA *( ALPHA / DIGIT / "+" / "-" / "." ). */
  private def isValidScheme(s: String): Boolean = {
    if (s.isEmpty) return false
    val c0 = s.charAt(0)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return false
    var i = 1
    while (i < s.length) {
      val c = s.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'
      if (!ok) return false
      i += 1
    }
    true
  }

  def compute(s: UTF8String): UTF8String = {
    val raw = s.toString.trim
    val schemeEnd = raw.indexOf("://")
    // no "://", or what precedes it is not an RFC 3986 scheme (free text
    // like "see how http:// works") → not a URL; pass through unchanged
    if (schemeEnd <= 0 || !isValidScheme(raw.substring(0, schemeEnd)))
      return UTF8String.fromString(raw)
    val scheme = raw.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)
    var rest = raw.substring(schemeEnd + 3)

    // fragment first: everything after '#' goes, wherever it sits
    val hash = rest.indexOf('#')
    if (hash >= 0) rest = rest.substring(0, hash)

    val q = rest.indexOf('?')
    val (hostPath, query) =
      if (q >= 0) (rest.substring(0, q), rest.substring(q + 1)) else (rest, "")
    val slash = hostPath.indexOf('/')
    val hostPort =
      (if (slash >= 0) hostPath.substring(0, slash) else hostPath)
        .toLowerCase(java.util.Locale.ROOT)
    val path = if (slash >= 0) hostPath.substring(slash) else "/"

    val host = {
      val colon = hostPort.lastIndexOf(':')
      if (colon < 0) hostPort
      else {
        val port = hostPort.substring(colon + 1)
        if ((scheme == "http" && port == "80") ||
          (scheme == "https" && port == "443")) hostPort.substring(0, colon)
        else hostPort
      }
    }

    val keptParams = query.split("&")
      .filter(p => p.nonEmpty && !isTracking(p))
      .sorted
    val sb = new java.lang.StringBuilder(raw.length)
    sb.append(scheme).append("://").append(host).append(path)
    if (keptParams.nonEmpty) sb.append('?').append(keptParams.mkString("&"))
    UTF8String.fromString(sb.toString)
  }

  def apply(c: Column): Column = GraftSql.column(CanonicalizeUrl(GraftSql.expression(c)))
}
