package graft.log

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, DataFrame, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass regex extraction: match the pattern ONCE per line and return all
  * capture groups as an array (`null` array when the line doesn't match;
  * `null` element for an unparticipating optional group).
  *
  * This is the codegen'd answer to SURVEY.md §4.3: the naive
  * `regexp_extract(value, pat, i)` for i=1..N re-evaluates the regex N times
  * per line, while the reference matches once (`LogRecordReader.java:224`)
  * and reads N groups. Semantics preserved: unanchored `find()`
  * (`LogRecordReader.java:225`).
  */
case class ParseLogLine(child: Expression, pattern: String) extends UnaryExpression {
  @transient private lazy val compiled = Pattern.compile(pattern)
  private val groupCount = Pattern.compile(pattern).matcher("").groupCount()
  // fast-reject literal (LineParser.literalPrefix, same soundness
  // contract): skip the regex machinery when the line can't contain the
  // pattern's required leading literal
  private val litPrefix: Option[(String, Boolean)] = LineParser.literalPrefix(pattern)
  // the SQL surface faces the same catastrophic-backtracking hazard as
  // the scan: a structurally risky pattern runs under the regexMaxSteps
  // budget (LineParser.riskyPattern gating — benign patterns keep the
  // plain zero-overhead path below). The budget comes from the session
  // conf `spark.graft.log.regexMaxSteps` (captured at analysis time;
  // 0 disables) — the expression has no per-call options surface.
  private val maxSteps: Long = ParseLogLine.sessionMaxSteps
  private val risky: Boolean = maxSteps > 0L && LineParser.riskyPattern(pattern)

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "parse_log_line"

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    val mightMatch = litPrefix.forall { case (lit, anchored) =>
      if (anchored) s.startsWith(lit) else s.contains(lit)
    }
    if (!mightMatch) return null
    val m = if (risky) ParseLogLine.findRisky(compiled, s, pattern, maxSteps)
      else { val m0 = compiled.matcher(s); if (m0.find()) m0 else null }
    if (m == null) null
    else {
      val arr = new Array[Any](groupCount)
      var i = 0
      while (i < groupCount) {
        val g = m.group(i + 1)
        arr(i) = if (g == null) null else UTF8String.fromString(g)
        i += 1
      }
      new GenericArrayData(arr)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patternRef = ctx.addReferenceObj("pattern", compiled, classOf[Pattern].getName)
    val n = groupCount
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.freshName("m")
      val arr = ctx.freshName("arr")
      val i = ctx.freshName("i")
      val g = ctx.freshName("g")
      val s = ctx.freshName("s")
      val litCheck = litPrefix.map { case (lit, anchored) =>
        val litRef = ctx.addReferenceObj("lit", lit, "java.lang.String")
        if (anchored) s"$s.startsWith($litRef)" else s"$s.contains($litRef)"
      }.getOrElse("true")
      // generation-time branch: risky patterns route through the budgeted
      // helper; everything else keeps the inline plain matcher
      val matchStmt =
        if (risky) {
          val pstrRef = ctx.addReferenceObj("pstr", pattern, "java.lang.String")
          s"""
             |java.util.regex.Matcher $m = null;
             |if ($litCheck) {
             |  $m = graft.log.ParseLogLine.findRisky($patternRef, $s, $pstrRef, ${maxSteps}L);
             |}
           """.stripMargin
        } else {
          s"""
             |java.util.regex.Matcher $m = null;
             |if ($litCheck) {
             |  java.util.regex.Matcher ${m}0 = $patternRef.matcher($s);
             |  if (${m}0.find()) $m = ${m}0;
             |}
           """.stripMargin
        }
      s"""
         |String $s = $c.toString();
         |$matchStmt
         |if ($m != null) {
         |  Object[] $arr = new Object[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    String $g = $m.group($i + 1);
         |    $arr[$i] = $g == null ? null : UTF8String.fromString($g);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ParseLogLine =
    copy(child = newChild)
}

object ParseLogLine {
  /** The expression's step budget: session conf
    * `spark.graft.log.regexMaxSteps` (0 disables), defaulting to the
    * scan's default. Read at expression construction — analysis time,
    * driver side — so `SET spark.graft.log.regexMaxSteps = 0` is the
    * documented escape hatch for a legitimately-slow pattern.
    */
  def sessionMaxSteps: Long = {
    val raw =
      try org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.log.regexMaxSteps",
          LogOptions.DefaultRegexMaxSteps.toString)
      catch { case _: Exception => LogOptions.DefaultRegexMaxSteps.toString }
    try math.max(0L, raw.trim.toLong)
    catch { case _: NumberFormatException => LogOptions.DefaultRegexMaxSteps }
  }

  /** Budgeted `find()` for structurally risky patterns, shared by the
    * interpreted and generated eval paths: returns the matched Matcher or
    * null, throwing the FAILFAST-style budget SparkException on a
    * backtracking stall. Scratch objects are per CALL — risky patterns
    * are the rare case and already regex-dominated, so the two small
    * allocations are noise; the common (benign) path never gets here.
    */
  def findRisky(
      p: Pattern, s: String, patternStr: String, maxSteps: Long): java.util.regex.Matcher = {
    val buf = new LineParser.BudgetedChars
    val m = p.matcher("")
    val found = LineParser.findBudgeted(m, buf, s, maxSteps,
      s"'$patternStr' (parse_log_line; override via SET spark.graft.log.regexMaxSteps)")
    if (found) m else null
  }
}

/** Expression-only alternative to the DSV2 source (SURVEY.md §3.3): parse a
  * DataFrame/stream of raw lines (column `value`, as produced by
  * `spark.read.text` / `spark.readStream.text`) into the same typed schema
  * the `log` source yields. PERMISSIVE semantics only — the whole point of
  * this path is staying inside whole-stage codegen.
  *
  * TIME/TIMESTAMP parity with the DSV2 source requires
  * `spark.sql.session.timeZone=UTC` (the engine-wide default here):
  * `try_to_timestamp` parses in the session zone while `LineParser` pins
  * UTC, so a non-UTC session shifts these two paths apart.
  */
object LogFrame {

  def parseLogLine(line: Column, pattern: String): Column =
    GraftSql.column(ParseLogLine(GraftSql.expression(line), pattern))

  /** `lines` must have a StringType column `value`; returns the typed log
    * schema (declared fields + `unmatched_lines`), blank lines dropped.
    */
  def parse(lines: DataFrame, opts: LogOptions): DataFrame = {
    // reject what this path cannot honor instead of silently diverging
    // from format("log"): record framing needs the reader (lines here are
    // pre-split), and error modes other than PERMISSIVE are its contract
    require(opts.recordStartPattern.isEmpty,
      "[log] recordStartPattern requires record framing in the reader — " +
        "use spark.read/readStream.format(\"log\") for multi-line records")
    require(!opts.failFast && !opts.dropMalformed,
      "[log] the expression path is PERMISSIVE by contract (unmatched " +
        "lines route to unmatched_lines) — use format(\"log\") for " +
        "FAILFAST/DROPMALFORMED")
    val nonBlank = lines.filter(length(trim(col("value"))) > 0) // LRR:216-219
    val parsed = nonBlank.withColumn("__groups", parseLogLine(col("value"), opts.pattern))
    val fields = opts.fieldNames.zipWithIndex.map { case (name, i) =>
      typed(element_at(col("__groups"), i + 1), opts.dataTypes(i), opts).as(name)
    }
    val unmatched = when(col("__groups").isNull, col("value"))
      .otherwise(lit(null).cast(StringType)).as(LogOptions.UnmatchedCol)
    parsed.select(fields :+ unmatched: _*)
  }

  /** String group → typed column, tolerant (NULL on parse failure) —
    * same mapping as LineParser.convert (SURVEY.md §1.3) but in pure
    * Catalyst expressions.
    */
  private def typed(c: Column, dt: String, opts: LogOptions): Column = dt match {
    // try_* variants throughout: ANSI mode (Spark 4 default) makes plain
    // cast/to_date on malformed input a task failure, but this path is
    // PERMISSIVE by contract (NULL on conversion failure).
    case "INT" | "INTEGER"   => c.try_cast(IntegerType)
    case "DOUBLE" | "FLOAT8" => c.try_cast(DoubleType)
    case "FLOAT" | "FLOAT4"  => c.try_cast(FloatType)
    case "DATE"              => call_function("try_to_date", c, lit(opts.dateFormat))
    case "TIMESTAMP"         => try_to_timestamp(c, lit(opts.dateFormat))
    case "TIME" => // millis-of-day via a 1970-01-01-anchored timestamp parse
      (unix_micros(try_to_timestamp(concat(lit("1970-01-01 "), c),
        lit("yyyy-MM-dd " + opts.timeFormat))) / 1000L).cast(IntegerType)
    case _ => c
  }

  /** Structured-Streaming log tail: `readStream` over a directory of log
    * files with the same parse semantics (SURVEY.md §2B streaming row).
    */
  def stream(spark: org.apache.spark.sql.SparkSession, path: String, options: Map[String, String]): DataFrame = {
    val opts = LogOptions.fromMap(options)
    // reject what this path cannot honor (same contract as parse()): the
    // text source here reads UTF-8 with default framing — non-default
    // encoding/lineSep need the DSV2 reader, which owns the byte level
    require(java.nio.charset.Charset.forName(opts.encoding) ==
      java.nio.charset.StandardCharsets.UTF_8 && opts.lineSep.isEmpty,
      "[log] the expression path reads lines via spark.readStream.text " +
        "(UTF-8, default framing) — use format(\"log\") for encoding/lineSep")
    parse(spark.readStream.text(path), opts)
  }
}
