package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A compact Humio/LogScale-style pipe-query compiler — the query surface
  * the reference connector feeds (cses2humio README.md:5-8 delegates all
  * search to Humio's language). Queries compile to DataFrame plans, so
  * Catalyst owns optimization (filters compiled here push down to the
  * scan like hand-written ones).
  *
  * Grammar (pragmatic subset):
  * {{{
  *   query     := stage ('|' stage)*
  *   stage     := filter | regex | search | extract | groupBy | sort | head | select | timechart
  *   filter    := field op value (op ∈ =, !=, >, >=, <, <=; '*' wildcard in =/!= values)
  *   regex     := field = /pattern/          — RLIKE partial match
  *   search    := search(text)               — substring over every string column
  *   extract   := extract(jsonField, key)    — promote $.key to a column named key
  *   groupBy   := groupBy(field[, function=count()|sum(f)|avg(f)|min(f)|max(f)])
  *   sort      := sort(field[, order=asc|desc])
  *   head      := head(n)
  *   select    := select(f1, f2, …)
  *   timechart := timechart(span=<n><s|m|h|d>[, function=…])   — buckets _bucket_ms
  * }}}
  *
  * Example:
  * `event_type = click | groupBy(user_id, function=count()) | sort(_count, order=desc) | head(5)`
  */
object HumioQuery {

  def run(df: DataFrame, query: String): DataFrame =
    splitPipes(query).map(_.trim).filter(_.nonEmpty)
      .foldLeft(df)((acc, stage) => applyStage(acc, stage))

  /** split on '|' not inside parentheses and not inside a /regex/
    * literal (alternation in a regex must survive: `f = /click|view/`).
    * A '/' only opens a regex when it directly follows '=', so plain
    * slashes in values don't start one.
    */
  private def splitPipes(q: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inRegex = false
    q.foreach {
      case '/' if inRegex => inRegex = false; cur += '/'
      case '/' if cur.toString.trim.endsWith("=") => inRegex = true; cur += '/'
      case '(' if !inRegex => depth += 1; cur += '('
      case ')' if !inRegex => depth -= 1; cur += ')'
      case '|' if depth == 0 && !inRegex => out += cur.result(); cur.clear()
      case c => cur += c
    }
    out += cur.result()
    out.result()
  }

  private val FnCall   = """(\w+)\s*\((.*)\)\s*""".r
  private val Compare  = """([\w.]+)\s*(!=|>=|<=|=|>|<)\s*(.+)""".r

  private def applyStage(df: DataFrame, stage: String): DataFrame = stage match {
    case FnCall(name, args) => applyFn(df, name, parseArgs(args))
    case Compare(field, op, raw) => df.where(predicate(field, op, raw.trim))
    case other => throw new IllegalArgumentException(s"cannot parse stage: '$other'")
  }

  /** split "a, b, function=count()" into positional + named args */
  private def parseArgs(s: String): (Seq[String], Map[String, String]) = {
    val parts = {  // comma-split at paren depth 0
      val out = Seq.newBuilder[String]; val cur = new StringBuilder; var d = 0
      s.foreach {
        case '(' => d += 1; cur += '('
        case ')' => d -= 1; cur += ')'
        case ',' if d == 0 => out += cur.result(); cur.clear()
        case c => cur += c
      }
      out += cur.result(); out.result().map(_.trim).filter(_.nonEmpty)
    }
    val (named, positional) = parts.partition(_.matches("""\w+\s*=[^=].*"""))
    (positional,
      named.map { kv => val Array(k, v) = kv.split("=", 2); k.trim -> v.trim }.toMap)
  }

  private def literal(raw: String): Column = {
    val unq = raw.stripPrefix("\"").stripSuffix("\"")
    if (raw.startsWith("\"")) lit(unq)
    else if (raw.matches("""-?\d+""")) lit(raw.toLong)
    else if (raw.matches("""-?\d*\.\d+""")) lit(raw.toDouble)
    else lit(unq)
  }

  private def predicate(field: String, op: String, raw: String): Column = {
    val c = col(field)
    if (op == "=" && raw.length > 1 && raw.startsWith("/") && raw.endsWith("/"))
      return c.rlike(raw.substring(1, raw.length - 1))
    val wildcard = (op == "=" || op == "!=") && raw.contains("*") && !raw.startsWith("\"")
    (op, wildcard) match {
      case ("=", true)  => c.like(raw.replace("*", "%"))
      case ("!=", true) => !c.like(raw.replace("*", "%"))
      case ("=", _)  => c === literal(raw)
      case ("!=", _) => c =!= literal(raw)
      case (">", _)  => c > literal(raw)
      case (">=", _) => c >= literal(raw)
      case ("<", _)  => c < literal(raw)
      case ("<=", _) => c <= literal(raw)
      case _ => throw new IllegalArgumentException(s"bad operator $op")
    }
  }

  /** function=count() etc. → (aggregate column, its output name) */
  private def aggregate(spec: String): (Column, String) = spec match {
    case FnCall("count", "") => (count(lit(1)), "_count")
    case FnCall("sum", f)    => (sum(col(f.trim)), s"_sum")
    case FnCall("avg", f)    => (avg(col(f.trim)), s"_avg")
    case FnCall("min", f)    => (min(col(f.trim)), s"_min")
    case FnCall("max", f)    => (max(col(f.trim)), s"_max")
    case other => throw new IllegalArgumentException(s"unknown function: $other")
  }

  private val Span = """(\d+)([smhd])""".r

  private def applyFn(df: DataFrame, name: String,
                      args: (Seq[String], Map[String, String])): DataFrame = {
    val (pos, named) = args
    name match {
      case "groupBy" =>
        val (aggCol, aggName) = aggregate(named.getOrElse("function", "count()"))
        df.groupBy(pos.map(col): _*).agg(aggCol.as(aggName))
      case "sort" =>
        val desc = named.get("order").contains("desc")
        df.orderBy(pos.map(f => if (desc) col(f).desc else col(f).asc): _*)
      case "head" => df.limit(pos.headOption.map(_.toInt).getOrElse(10))
      case "select" => df.select(pos.map(col): _*)
      case "search" =>
        // free-text: substring match over every string-typed column
        val needle = pos.head.stripPrefix("\"").stripSuffix("\"")
        val stringCols = df.schema.fields
          .filter(_.dataType == org.apache.spark.sql.types.StringType)
          .map(f => col(f.name).contains(needle))
        if (stringCols.isEmpty) df.where(lit(false))
        else df.where(stringCols.reduce(_ || _))
      case "extract" =>
        // promote $.key of a JSON string field to a real column named key
        val Seq(jsonField, key) = pos.take(2)
        df.withColumn(key, get_json_object(col(jsonField), s"$$.$key"))
      case "timechart" =>
        val spanMs = named.getOrElse("span", "1h") match {
          case Span(n, "s") => n.toLong * 1000
          case Span(n, "m") => n.toLong * 60000
          case Span(n, "h") => n.toLong * 3600000
          case Span(n, "d") => n.toLong * 86400000
          case other => throw new IllegalArgumentException(s"bad span: $other")
        }
        val (aggCol, aggName) = aggregate(named.getOrElse("function", "count()"))
        // floor, not cast-truncation: pre-1970 timestamps must bucket
        // downward like the oracle's // floor division
        val bucket = floor(unix_millis(col("ts")) / spanMs).cast("long") * spanMs
        val keys = col("_bucket_ms") +: pos.map(col)
        df.withColumn("_bucket_ms", bucket)
          .groupBy(keys: _*).agg(aggCol.as(aggName))
      case other => throw new IllegalArgumentException(s"unknown stage: $other")
    }
  }
}
