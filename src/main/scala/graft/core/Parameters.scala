package graft.core

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Typed job parameters (reference: lib/bricolage/parameters.rb).
  *
  * Each parameter type knows how to parse a job-file (YAML) value and a CLI
  * `--option` string, materialize against resolved variables, and publish
  * itself as a SQL variable (reference: parameters.rb:290-293 `publish?`;
  * declaration → union → materialize flow at :177-213). Undeclared values
  * in a job file are an error; missing non-optional parameters are an error.
  */
sealed abstract class Param {
  def name: String
  def optional: Boolean
  /** Whether the materialized value is published as a SQL variable. */
  def publish: Boolean = false

  /** Parse a raw job-file value (post-YAML). */
  def parseValue(v: Any, vars: Variables): Any

  /** Parse a CLI option string. */
  def parseOption(s: String, vars: Variables): Any = parseValue(s, vars)

  def defaultValue: Option[Any] = None

  /** Variables this parameter publishes when bound to `value`; hyphens
    * become underscores so `vacuum-sort` publishes `$vacuum_sort`
    * (reference: parameters.rb:290-293 — variable_name = name.gsub('-','_')).
    */
  def toVariables(value: Any): Map[String, String] =
    if (publish) Map(name.replace('-', '_') -> String.valueOf(value)) else Map.empty

  protected def str(v: Any, vars: Variables): String = vars.expand(String.valueOf(v))
}

/** (reference: parameters.rb:333-349) */
final case class StringParam(name: String, optional: Boolean = false,
    override val publish: Boolean = false) extends Param {
  def parseValue(v: Any, vars: Variables): Any = str(v, vars)
}

/** Strict bool; only true/false (reference: parameters.rb:351-367). */
final case class BoolParam(name: String, optional: Boolean = true) extends Param {
  def parseValue(v: Any, vars: Variables): Any = v match {
    case b: Boolean => b
    case "true"     => true
    case "false"    => false
    case other      => throw new ParameterError(s"$name: not a boolean: '$other'")
  }
  override def defaultValue: Option[Any] = Some(false)
}

/** Bool that may be absent (absent ≠ false for some job classes)
  * (reference: parameters.rb:369-386).
  */
final case class OptionalBoolParam(name: String, default: Boolean = false,
    override val publish: Boolean = false) extends Param {
  val optional = true
  def parseValue(v: Any, vars: Variables): Any = v match {
    case b: Boolean => b
    case "true"     => true
    case "false"    => false
    case other      => throw new ParameterError(s"$name: not a boolean: '$other'")
  }
  override def defaultValue: Option[Any] = Some(default)
}

/** Positive integer (batch sizes, TTLs). The reference passes these as
  * strings and lets the consumer `Integer()` them; parsing at declaration
  * time reports a bad or non-positive value as a ParameterError naming the
  * option instead of a bare NumberFormatException mid-load.
  */
final case class IntParam(name: String, optional: Boolean = true,
    override val publish: Boolean = false) extends Param {
  def parseValue(v: Any, vars: Variables): Any = {
    val s = str(v, vars)
    val n =
      try s.toLong
      catch {
        case _: NumberFormatException =>
          throw new ParameterError(s"$name: not an integer: '$s'")
      }
    if (n <= 0) throw new ParameterError(s"$name: must be positive: $n")
    n
  }
}

/** YYYY-MM-DD (reference: parameters.rb:388-416). */
final case class DateParam(name: String, optional: Boolean = false,
    override val publish: Boolean = false) extends Param {
  def parseValue(v: Any, vars: Variables): Any = {
    val s = str(v, vars)
    try LocalDate.parse(s, DateTimeFormatter.ISO_LOCAL_DATE)
    catch { case _: Exception => throw new ParameterError(s"$name: bad date: '$s'") }
  }
}

/** One of a fixed value set (reference: parameters.rb:418-444). */
final case class EnumParam(name: String, values: Seq[String],
    default: Option[String] = None,
    override val publish: Boolean = false) extends Param {
  val optional: Boolean = default.isDefined
  def parseValue(v: Any, vars: Variables): Any = {
    val s = str(v, vars)
    if (!values.contains(s))
      throw new ParameterError(s"$name: '$s' not in ${values.mkString("/")}")
    s
  }
  override def defaultValue: Option[Any] = default
}

/** Named datasource reference; resolution to a live DataSource happens at
  * script build (reference: parameters.rb:446-468).
  */
final case class DataSourceParam(kind: String, name: String = "data-source",
    optional: Boolean = true) extends Param {
  def parseValue(v: Any, vars: Variables): Any = str(v, vars)
}

/** Path of a .sql file — or the inline SQL body of a .sql.job. The value
  * is NOT variable-expanded at parse time: SQL text binds later against the
  * job's full variable set (reference: parameters.rb:470-494; binding at
  * sqlstatement.rb:46-53).
  */
final case class SqlFileParam(name: String = "sql-file", optional: Boolean = false)
    extends Param {
  def parseValue(v: Any, vars: Variables): Any = String.valueOf(v)
}

/** Destination table; publishes as `$dest_table`
  * (reference: parameters.rb:496-520).
  */
final case class DestTableParam(name: String = "dest-table",
    optional: Boolean = false) extends Param {
  override def publish: Boolean = true
  def parseValue(v: Any, vars: Variables): Any = TableSpec.parse(str(v, vars))
  override def toVariables(value: Any): Map[String, String] =
    Map("dest_table" -> value.toString)
}

/** Map of variable name → source TableSpec; publishes every entry
  * (reference: parameters.rb:522-566).
  */
final case class SrcTableParam(name: String = "src-tables",
    optional: Boolean = true) extends Param {
  override def publish: Boolean = true
  def parseValue(v: Any, vars: Variables): Any = v match {
    case m: Map[_, _] =>
      m.map { case (k, value) => String.valueOf(k) -> TableSpec.parse(str(value, vars)) }
    case s: String => Map(name -> TableSpec.parse(str(s, vars)))
    case other => throw new ParameterError(s"$name: bad src-tables: $other")
  }
  override def parseOption(s: String, vars: Variables): Any =
    // reference CLI form is `--src-table=VAR:TABLE` (parameters.rb:531-536);
    // `VAR=TABLE` is accepted too
    s.split("[:=]", 2) match {
      case Array(k, v) => Map(k -> TableSpec.parse(vars.expand(v)))
      case _ => throw new ParameterError(s"$name: bad option (want var:table): '$s'")
    }
  override def toVariables(value: Any): Map[String, String] = value match {
    case m: Map[_, _] => m.map { case (k, v) => String.valueOf(k) -> String.valueOf(v) }.toMap
    case _            => Map.empty
  }
}

/** (reference: parameters.rb:568-604) */
final case class DestFileParam(name: String = "dest-file",
    optional: Boolean = false) extends Param {
  def parseValue(v: Any, vars: Variables): Any = str(v, vars)
}

final case class SrcFileParam(name: String = "src-file",
    optional: Boolean = false) extends Param {
  def parseValue(v: Any, vars: Variables): Any = str(v, vars)
}

/** List of strings; job file gives a YAML list, CLI a comma-separated value
  * (reference: parameters.rb:606-636).
  */
final case class StringListParam(name: String, optional: Boolean = false,
    override val publish: Boolean = false) extends Param {
  def parseValue(v: Any, vars: Variables): Any = v match {
    case xs: Seq[_] => xs.map(x => str(x, vars))
    // a plain string is ONE element unless comma-separated (reference
    // allow_string wraps the string whole, parameters.rb:617-622 — the
    // exec fixture's shell pipeline must not be split on spaces)
    case s: String  => s.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(vars.expand)
    case other      => throw new ParameterError(s"$name: bad list: $other")
  }
  /** Publishes as the space-joined command line (parameters.rb:630-634). */
  override def toVariables(value: Any): Map[String, String] =
    if (publish) Map(name.replace('-', '_') ->
      value.asInstanceOf[Seq[_]].mkString(" "))
    else Map.empty
}

/** Free-form key→value map (reference: parameters.rb:638-690). */
final case class KeyValuePairsParam(name: String, optional: Boolean = true,
    defaultPairs: Map[String, Any] = Map.empty) extends Param {
  def parseValue(v: Any, vars: Variables): Any = v match {
    case m: Map[_, _] =>
      defaultPairs ++ m.map { case (k, value) =>
        String.valueOf(k) -> (value match {
          case s: String => vars.expand(s)
          case other     => other
        })
      }
    case s: String =>
      // legacy comma-string: "gzip, maxerror 10" (reference: psqldatasource.rb:478-521).
      // Values expand variables, same as the map branch — "partitions
      // $queue_objects" must resolve before the consumer parses it.
      defaultPairs ++ s.split(",").map(_.trim).filter(_.nonEmpty).map { item =>
        item.split("\\s+", 2) match {
          case Array(k)    => k -> (true: Any)
          case Array(k, v) => k -> (vars.expand(v): Any)
        }
      }.toMap
    case null  => defaultPairs
    case other => throw new ParameterError(s"$name: bad key-value pairs: $other")
  }
  override def defaultValue: Option[Any] = Some(defaultPairs)
}

/** Declared parameter list for a job class + the 3-source merge:
  * job-file values ∪ CLI options ∪ defaults (reference: parameters.rb:177-213;
  * precedence: CLI > job file > default).
  */
final class ParamDecls(val decls: Seq[Param]) {

  private val byName: Map[String, Param] = decls.map(p => p.name -> p).toMap

  def materialize(jobFileValues: Map[String, Any],
      cliValues: Map[String, String],
      vars: Variables): ParamValues = {
    jobFileValues.keys.find(k => !byName.contains(k) && k != "class").foreach { k =>
      throw new ParameterError(s"undeclared parameter in job file: $k")
    }
    cliValues.keys.find(k => !byName.contains(k)).foreach { k =>
      throw new ParameterError(s"unknown option: --$k")
    }
    val values: Map[String, Any] = decls.flatMap { p =>
      val fromCli = cliValues.get(p.name).map(s => p.parseOption(s, vars))
      val fromJob = jobFileValues.get(p.name)
        .filter(_ != null).map(v => p.parseValue(v, vars))
      fromCli.orElse(fromJob).orElse(p.defaultValue) match {
        case Some(v) => Some(p.name -> v)
        case None if p.optional => None
        case None =>
          throw new ParameterError(s"required parameter missing: ${p.name}")
      }
    }.toMap
    new ParamValues(this, values)
  }
}

/** Materialized parameter values + the variables they publish. */
final class ParamValues(decls: ParamDecls, val values: Map[String, Any]) {
  def get(name: String): Option[Any] = values.get(name)
  def apply(name: String): Any = values.getOrElse(name,
    throw new ParameterError(s"no such parameter: $name"))
  def string(name: String): String = String.valueOf(apply(name))
  def stringOpt(name: String): Option[String] = get(name).map(String.valueOf)
  def longOpt(name: String): Option[Long] = get(name).map {
    case n: Long => n
    case n: Int  => n.toLong
    case other   => String.valueOf(other).toLong
  }
  def bool(name: String): Boolean = get(name).exists {
    case b: Boolean => b
    case s: String  => s == "true"
    case _          => false
  }
  def table(name: String): TableSpec = apply(name) match {
    case ts: TableSpec => ts
    case other         => TableSpec.parse(String.valueOf(other))
  }
  def pairs(name: String): Map[String, Any] = get(name) match {
    case Some(m: Map[_, _]) => m.map { case (k, v) => String.valueOf(k) -> (v: Any) }
    case _                  => Map.empty
  }

  /** Variables published by all bound parameters
    * (reference: parameters.rb:290-293, job.rb:96-106).
    */
  def publishedVariables: Variables =
    Variables.fromMap(decls.decls.flatMap { p =>
      values.get(p.name).map(v => p.toVariables(v)).getOrElse(Map.empty)
    }.toMap)
}
