package graft.log

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Direct SQL over a log path — `SELECT * FROM log.`/var/log/app.log``
  * — the reference deployment's PRIMARY usage mode (Drill queries files
  * ad hoc: `SELECT * FROM dfs.logs.`file.log``, README.md of
  * cgivre/drill-logfile-plugin). Spark's own `ResolveSQLOnFile` grants
  * this syntax only to v1 `FileFormat` sources
  * ([UNSUPPORTED_DATASOURCE_FOR_DIRECT_QUERY] for any DSV2 provider), so
  * `GraftExtensions` adds it two ways:
  *
  *  - [[LogPathParser]], a delegating parser that rewrites the
  *    `UnresolvedRelation` right after parsing — catalog-implementation
  *    agnostic (the Hive session builder drops custom HINT-batch rules,
  *    and the main resolution batch is too late: `ResolveSQLOnFile`
  *    throws before extension resolution rules run);
  *  - [[ResolveLogPathTable]] in the hint-resolution batch, covering
  *    plans that arrive as unresolved relations without passing through
  *    the SQL parser (e.g. `spark.table("log.`/path`")`).
  *
  * Options resolve in three tiers (round-12): reader defaults, overridden
  * by SESSION-CONF defaults (`SET spark.graft.log.<option> = ...` — e.g.
  * `spark.graft.log.pattern`/`spark.graft.log.schema` make a typed ad-hoc
  * query a pure-SQL three-liner), overridden by any per-relation options.
  * With nothing set, pattern `(.*)` → one `line` column (plus
  * `unmatched_lines`), which still composes in pure SQL —
  * `SELECT parse_log_line(line, '...') FROM log.`/path``. For a durable
  * typed surface, declare a table (`CREATE TABLE ... USING log
  * OPTIONS (...)`).
  *
  * Guards (mirroring `ResolveSQLOnFile`'s): only a 2-part identifier
  * whose head is `log`, whose "table" part contains a `/` (a real
  * catalog's `log` database can never collide — object names with
  * slashes are not plain identifiers), only under
  * `spark.sql.runSQLOnFiles` (the same flag gating Spark's own
  * direct-file queries), and never for streaming relations.
  */
object LogPathRelation {
  /** Session-conf namespace for ad-hoc path-query option defaults. */
  val ConfPrefix = "spark.graft.log."

  def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUpWithSubqueries {
    case u: UnresolvedRelation
        if !u.isStreaming && SQLConf.get.runSQLonFile &&
          u.multipartIdentifier.size == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("log") &&
          u.multipartIdentifier(1).contains("/") =>
      val path = u.multipartIdentifier(1)
      val withPath = new java.util.HashMap[String, String]
      // session-conf defaults first; explicit relation options override.
      // Keys are WHITELISTED (a typo'd spark.graft.log.* conf fails loudly
      // instead of being silently ignored), and regexMaxSteps arrives as
      // the non-engaging default variant: a session-wide budget must not
      // flip every benign ad-hoc pattern onto the ~10% counting wrapper
      // the auto-detector would have spared it.
      SQLConf.get.getAllConfs.foreach { case (k, v) =>
        if (k.startsWith(LogPathRelation.ConfPrefix) && v != null && v.nonEmpty) {
          val key = k.stripPrefix(LogPathRelation.ConfPrefix)
            .toLowerCase(java.util.Locale.ROOT)
          if (!LogOptions.KnownOptionKeys.contains(key))
            throw new IllegalArgumentException(
              s"[log] unknown session conf '$k' (no log option named '$key'); " +
                s"known options: ${LogOptions.KnownOptionKeys.toSeq.sorted.mkString(", ")}")
          withPath.put(if (key == "regexmaxsteps") "regexmaxstepsdefault" else key, v)
        }
      }
      withPath.putAll(u.options)
      withPath.put("path", path)
      val options = new CaseInsensitiveStringMap(withPath)
      val opts = LogOptions.fromMap(options)
      DataSourceV2Relation.create(
        new LogTable(opts.schema, opts, Seq(path)), None, None, options)
  }
}

/** Analyzer-side path (hint batch — see [[LogPathRelation]] scaladoc). */
class ResolveLogPathTable(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = LogPathRelation.rewrite(plan)
}

/** Parser-side path: rewrites `log.`/path`` relations immediately after
  * parsing, before any analyzer batch can reject them. Everything else
  * delegates verbatim.
  */
class LogPathParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    LogPathRelation.rewrite(delegate.parsePlan(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    LogPathRelation.rewrite(delegate.parseQuery(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
