package graft.log

import java.time.LocalDate
import java.time.format.DateTimeParseException

import org.apache.spark.SparkException
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hive-style partition columns for the `log` source: values carried in
  * `name=value` path segments (`/logs/dt=2024-03-01/host=web1/a.log`),
  * declared EXPLICITLY via the `partitionSchema` option — never inferred.
  *
  * Why explicit-only, when Spark's own file sources infer: inference needs
  * a full directory walk BEFORE the schema exists, i.e. a second listing
  * pass over what may be millions of directories at 100 TB; the log
  * source's single listing is shared between statistics and planning
  * (LogDataSource.listedFiles) and adding an inference walk ahead of it
  * would double the driver's metadata cost for a schema the user of a
  * curated log tree already knows. Declaring is also the only honest
  * option for TYPES (inference guesses; a `dt=2024-03-01` segment is a
  * DATE only if the user says so).
  *
  * This is the Spark-shaped rebuild of Drill's implicit `dir0`/`dirN`
  * columns (engine-level in the reference deployment: any format plugin's
  * directory levels are queryable and prunable) — hive `k=v` naming
  * instead of positional indexes, because that is what Spark tooling
  * writes (`DataFrameWriter.partitionBy`) and what carries NAMES and
  * TYPES.
  *
  * Scale posture: a claimed partition filter prunes whole FILES at plan
  * time — the dominant scan lever on a date-partitioned 100 TB log tree
  * (a one-day query over a year of logs lists, opens and parses ~1/365th
  * of the corpus). Pruned bytes flow into `estimateStatistics` for free,
  * so a pruned scan also competes correctly for broadcast. Reading a
  * partition value costs NOTHING per row: it is a per-chunk constant the
  * reader stamps onto assembled rows.
  *
  * Null semantics follow Hive/Spark: a `__HIVE_DEFAULT_PARTITION__`
  * segment value is NULL. Filter evaluation is three-valued exactly like
  * Catalyst (a file is pruned IN only when the predicate is definitely
  * TRUE for its partition values — claiming a filter means Catalyst
  * removes its own copy, so anything else would resurrect rows Catalyst
  * would have dropped).
  */
object PartitionValues {
  val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Partition column types: the subset of the source's type table that
    * path segments can carry losslessly. DATE is ISO `yyyy-MM-dd` (the
    * hive layout convention — NOT the `dateFormat` option, which belongs
    * to the log LINES).
    */
  val KnownTypes: Set[String] = Set("VARCHAR", "STRING", "INT", "INTEGER", "LONG", "BIGINT", "DATE")

  def partType(t: String): DataType = t match {
    case "VARCHAR" | "STRING" => StringType
    case "INT" | "INTEGER"    => IntegerType
    case "LONG" | "BIGINT"    => LongType
    case "DATE"               => DateType
    case other => throw new IllegalArgumentException(
      s"[log] unsupported partitionSchema type '$other' " +
        s"(supported: ${KnownTypes.toSeq.sorted.mkString(", ")})")
  }

  /** Hive %-escaping of special characters in partition values
    * (`=`, `/`, `%`, control chars — written by Spark's own
    * `ExternalCatalogUtils.escapePathName`): decode `%hh` pairs.
    */
  def unescapePathName(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val decoded: Int =
        if (c == '%' && i + 2 < s.length) {
          try Integer.parseInt(s.substring(i + 1, i + 3), 16)
          catch { case _: NumberFormatException => -1 }
        } else -1
      if (decoded >= 0) {
        sb.append(decoded.toChar)
        i += 3
      } else {
        sb.append(c) // lone/malformed '%': literal, like Spark's unescape
        i += 1
      }
    }
    sb.toString
  }

  /** Path segments of `path` BELOW `root`, directories only (the file
    * name is dropped) — the value source for positional dir columns.
    * Scheme-insensitive prefix match (`file:/x` vs `/x`); a path not
    * under the root (an explicitly-listed file) yields zero segments, so
    * every dir column reads NULL — Drill's dirN-at-the-workspace-root
    * semantics.
    */
  private def uriPath(s: String): String =
    new org.apache.hadoop.fs.Path(s).toUri.getPath.stripSuffix("/")

  def dirSegments(path: String, root: String): Array[String] = {
    val p = uriPath(path)
    val r = uriPath(root)
    if (!p.startsWith(r + "/")) return Array.empty
    val rel = p.substring(r.length + 1).split('/')
    rel.dropRight(1) // the file name itself is not a directory level
  }

  /** Drill's implicit per-file columns, opt-in via the `implicitColumns`
    * option: `fqn` (fully-qualified path), `filepath` (parent dir),
    * `filename` (base name), `suffix` (after the last dot, empty when
    * none — Drill's semantics).
    */
  val ImplicitColumns: Seq[String] = Seq("fqn", "filepath", "filename", "suffix")

  private def implicitValue(name: String, path: String): String = {
    val hp = new org.apache.hadoop.fs.Path(path)
    name match {
      case "fqn"      => path
      case "filepath" => Option(hp.getParent).map(_.toString).getOrElse("")
      case "filename" => hp.getName
      case "suffix" =>
        val n = hp.getName
        val dot = n.lastIndexOf('.')
        if (dot < 0) "" else n.substring(dot + 1)
      case other => throw new IllegalArgumentException(s"[log] unknown implicit column $other")
    }
  }

  /** Raw string value per declared PATH field (`opts.pathFields` order:
    * hive partition columns, then positional dir columns, then implicit
    * file columns); `null` marks the hive default (null) partition or a
    * dir level the file sits above. Validates at call time — planning,
    * not mid-task — that every hive column has exactly one unambiguous
    * segment and typed values parse.
    */
  def rawValues(path: String, opts: LogOptions, root: String = ""): Array[String] = {
    val hive = hiveValues(path, opts, root)
    val dirs: Seq[String] =
      if (opts.dirColumns.isEmpty) Nil
      else {
        val segs = if (root.isEmpty) Array.empty[String] else dirSegments(path, root)
        opts.dirColumns.indices.map(i => if (i < segs.length) segs(i) else null)
      }
    hive ++ dirs ++ opts.implicitColumns.map(implicitValue(_, path))
  }

  private def hiveValues(path: String, opts: LogOptions, root: String): Array[String] = {
    val declared = opts.partitionSchema
    if (declared.isEmpty) return Array.empty
    // k=v matching over DIRECTORY segments only, strictly below the matched
    // load root — Hive/Spark semantics (levels under the base path). The
    // file NAME never participates (a file legitimately named
    // 'dt=2024-03-02.log' is data, not a partition), and neither do
    // ancestors of the load root (a tree rooted at /exp=5/logs/ must not
    // conflict with its own dt= directories). For an explicitly-listed
    // file no directory root was matched for (root empty), all ancestor
    // directories participate — the only levels available. Key match is
    // case-insensitive (Spark's resolution default).
    //
    // FALLBACK: the root's own trailing k=v run fills a declared key with
    // no segment below the root — so `.load("/data/dt=2024-03-01")` with
    // shared table options reads the single partition it names (Spark
    // basePath-style). Below-root matches always win, keeping the
    // scoping semantics above intact.
    def kv(seg: String): Option[(String, String)] = {
      val eq = seg.indexOf('=')
      if (eq <= 0) None
      else Some(seg.substring(0, eq).toLowerCase(java.util.Locale.ROOT) ->
        unescapePathName(seg.substring(eq + 1)))
    }
    val dirSegs: Seq[String] =
      if (root.nonEmpty) dirSegments(path, root).toSeq
      else new org.apache.hadoop.fs.Path(path).toUri.getPath.split('/').toSeq.dropRight(1)
    val segs: Seq[(String, String)] = dirSegs.flatMap(kv(_))
    val rootSegs: Seq[(String, String)] =
      if (root.isEmpty) Nil
      else uriPath(root).split('/').reverse.takeWhile(s => kv(s).isDefined).flatMap(kv(_)).toSeq
    declared.map { case (name, tpe) =>
      val key = name.toLowerCase(java.util.Locale.ROOT)
      val below = segs.collect { case (k, v) if k == key => v }.distinct
      val hits =
        if (below.nonEmpty) below
        else rootSegs.collect { case (k, v) if k == key => v }.distinct
      if (hits.isEmpty) {
        throw new SparkException(
          s"[log] partition column '$name' declared in partitionSchema has no " +
            s"'$name=' segment in path $path")
      }
      if (hits.size > 1) {
        throw new SparkException(
          s"[log] partition column '$name' appears with conflicting values " +
            s"${hits.mkString("'", "', '", "'")} in path $path")
      }
      val raw = if (hits.head == HiveDefaultPartition) null else hits.head
      toInternal(raw, tpe, name, path) // typed validation at plan time
      raw
    }.toArray
  }

  /** Internal-row representation of a raw segment value: UTF8String /
    * Int / Long / epoch-day Int, null passthrough.
    */
  def toInternal(raw: String, tpe: String, name: String, path: String): Any = {
    if (raw == null) return null
    def fail(what: String): Nothing = throw new SparkException(
      s"[log] partition column '$name' ($what) cannot parse value '$raw' in path $path")
    tpe match {
      case "VARCHAR" | "STRING" => UTF8String.fromString(raw)
      case "INT" | "INTEGER" =>
        try java.lang.Integer.valueOf(raw.trim) catch { case _: NumberFormatException => fail("INT") }
      case "LONG" | "BIGINT" =>
        try java.lang.Long.valueOf(raw.trim) catch { case _: NumberFormatException => fail("LONG") }
      case "DATE" =>
        try Integer.valueOf(LocalDate.parse(raw.trim).toEpochDay.toInt)
        catch { case _: DateTimeParseException => fail("DATE, ISO yyyy-MM-dd") }
      case other => throw new IllegalArgumentException(
        s"[log] unsupported partitionSchema type '$other'")
    }
  }

  // ------------------------------------------------------------- filters

  /** Can this pushed filter be claimed as a partition filter? Every
    * referenced column must be a declared partition column and every leaf
    * a shape [[eval]] implements with a value of the column's exact
    * type. Unlike data filters (LineParser.supportedFilter), And/Or/Not
    * compositions ARE supported — evaluation is per FILE against a
    * handful of constants, so there is no per-row cost to bound.
    */
  def supportedFilter(f: Filter, opts: LogOptions): Boolean = {
    if (opts.pathFields.isEmpty) return false
    val types: Map[String, String] = opts.pathFields.map { case (n, t) =>
      n.toLowerCase(java.util.Locale.ROOT) -> t
    }.toMap
    def typeOf(name: String): Option[String] = types.get(name.toLowerCase(java.util.Locale.ROOT))
    def valOk(name: String, v: Any): Boolean = v != null && typeOf(name).exists {
      case "VARCHAR" | "STRING" => v.isInstanceOf[String]
      case "INT" | "INTEGER"    => v.isInstanceOf[java.lang.Integer]
      case "LONG" | "BIGINT"    => v.isInstanceOf[java.lang.Long]
      case "DATE" => v.isInstanceOf[java.sql.Date] || v.isInstanceOf[LocalDate]
      case _      => false
    }
    def strOk(name: String, v: String): Boolean =
      v != null && typeOf(name).exists(t => t == "VARCHAR" || t == "STRING")
    def ok(f: Filter): Boolean = f match {
      case EqualTo(a, v)            => valOk(a, v)
      case EqualNullSafe(a, v)      => v == null && typeOf(a).isDefined || valOk(a, v)
      case GreaterThan(a, v)        => valOk(a, v)
      case GreaterThanOrEqual(a, v) => valOk(a, v)
      case LessThan(a, v)           => valOk(a, v)
      case LessThanOrEqual(a, v)    => valOk(a, v)
      case In(a, vs)                => vs != null && vs.nonEmpty && vs.forall(v => v == null || valOk(a, v))
      case IsNull(a)                => typeOf(a).isDefined
      case IsNotNull(a)             => typeOf(a).isDefined
      case StringStartsWith(a, p)   => strOk(a, p)
      case StringEndsWith(a, p)     => strOk(a, p)
      case StringContains(a, p)     => strOk(a, p)
      case And(l, r)                => ok(l) && ok(r)
      case Or(l, r)                 => ok(l) && ok(r)
      case Not(c)                   => ok(c)
      case _                        => false
    }
    ok(f)
  }

  /** Three-valued evaluation of a claimed partition filter against one
    * file's partition values (`name(lowercase) -> internal value`).
    * `None` = UNKNOWN (null involved). A file survives pruning only on
    * `Some(true)` — Catalyst's `Filter` keeps a row only when the
    * predicate is TRUE, and claiming removed that Filter.
    */
  def eval(f: Filter, values: Map[String, Any]): Option[Boolean] = {
    def valueOf(name: String): Any = values(name.toLowerCase(java.util.Locale.ROOT))
    // both sides non-null by the time compare is called
    def cmp(part: Any, fv: Any): Int = (part, fv) match {
      case (p: UTF8String, v: String)       => p.compareTo(UTF8String.fromString(v))
      case (p: java.lang.Integer, v: java.lang.Integer) => p.compareTo(v)
      case (p: java.lang.Long, v: java.lang.Long)       => p.compareTo(v)
      case (p: java.lang.Integer, v: java.sql.Date) =>
        p.compareTo(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(v))
      case (p: java.lang.Integer, v: LocalDate) =>
        java.lang.Long.compare(p.longValue(), v.toEpochDay)
      case other => throw new IllegalStateException(
        s"[log] unclaimable partition comparison slipped through: $other")
    }
    def tri(a: String, fv: Any)(pred: Int => Boolean): Option[Boolean] = {
      val p = valueOf(a)
      if (p == null || fv == null) None else Some(pred(cmp(p, fv)))
    }
    def str(a: String, s: String)(pred: String => Boolean): Option[Boolean] = {
      val p = valueOf(a)
      if (p == null || s == null) None else Some(pred(p.asInstanceOf[UTF8String].toString))
    }
    f match {
      case EqualTo(a, v)            => tri(a, v)(_ == 0)
      case EqualNullSafe(a, v) =>
        val p = valueOf(a)
        if (p == null || v == null) Some(p == null && v == null) else Some(cmp(p, v) == 0)
      case GreaterThan(a, v)        => tri(a, v)(_ > 0)
      case GreaterThanOrEqual(a, v) => tri(a, v)(_ >= 0)
      case LessThan(a, v)           => tri(a, v)(_ < 0)
      case LessThanOrEqual(a, v)    => tri(a, v)(_ <= 0)
      case In(a, vs) =>
        val p = valueOf(a)
        if (p == null) None
        else if (vs.exists(v => v != null && cmp(p, v) == 0)) Some(true)
        else if (vs.contains(null)) None
        else Some(false)
      case IsNull(a)                => Some(valueOf(a) == null)
      case IsNotNull(a)             => Some(valueOf(a) != null)
      case StringStartsWith(a, p)   => str(a, p)(_.startsWith(p))
      case StringEndsWith(a, p)     => str(a, p)(_.endsWith(p))
      case StringContains(a, p)     => str(a, p)(_.contains(p))
      case And(l, r) => (eval(l, values), eval(r, values)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true))            => Some(true)
        case _                                   => None
      }
      case Or(l, r) => (eval(l, values), eval(r, values)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false))        => Some(false)
        case _                                 => None
      }
      case Not(c) => eval(c, values).map(!_)
      case other => throw new IllegalStateException(
        s"[log] unclaimable partition filter slipped through: $other")
    }
  }

  /** Does this file survive every claimed partition filter? `root` is the
    * matched load directory the file was listed under (needed only when
    * dir columns are declared). */
  def prunesIn(
      filters: Seq[Filter],
      path: String,
      opts: LogOptions,
      root: String = ""): Boolean = {
    if (filters.isEmpty) return true
    val raws = rawValues(path, opts, root)
    val values: Map[String, Any] = opts.pathFields.zip(raws).map {
      case ((n, t), raw) =>
        n.toLowerCase(java.util.Locale.ROOT) -> toInternal(raw, t, n, path)
    }.toMap
    filters.forall(f => eval(f, values).contains(true))
  }
}
