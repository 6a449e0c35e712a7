package graft.core

import scala.collection.immutable.ListMap
import scala.util.matching.Regex

/** Immutable variable map with `$name` / `${name}` expansion, recursive
  * resolution with cycle detection, and layered precedence unions
  * (reference: lib/bricolage/variables.rb:5-111, 180-189; precedence union
  * in lib/bricolage/job.rb:99-120 — later layers win).
  */
final class Variables private (val underlying: ListMap[String, String]) {

  def get(name: String): Option[String] = underlying.get(name)

  def apply(name: String): String =
    underlying.getOrElse(name, throw new ParameterError(s"undefined variable: $$$name"))

  def contains(name: String): Boolean = underlying.contains(name)
  def names: Seq[String] = underlying.keys.toSeq
  def isEmpty: Boolean = underlying.isEmpty

  def add(name: String, value: String): Variables =
    new Variables(underlying + (name -> value))

  /** Union: `other` wins on conflict (reference: variables.rb union of
    * layers — the later/higher-precedence layer overrides).
    */
  def union(other: Variables): Variables =
    new Variables(underlying ++ other.underlying)

  /** Expand every `$var` in `str` against this map, recursively resolving
    * values that themselves contain variables. Cycles raise ParameterError
    * (reference: variables.rb:65-96 ResolveChecker).
    */
  def expand(str: String): String = expand(str, Nil)

  private def expand(str: String, stack: List[String]): String =
    Variables.expandWith(str) { name =>
      if (stack.contains(name))
        throw new ParameterError(
          s"circular variable reference: ${(name :: stack).reverse.mkString(" -> ")}")
      underlying.get(name) match {
        case Some(v) => expand(v, name :: stack)
        case None    => throw new ParameterError(s"undefined variable: $$$name")
      }
    }

  /** Resolve all values (expanding nested variables) to a flat map. */
  def resolve(): Variables =
    new Variables(underlying.map { case (k, v) => k -> expand(v, List(k)) })

  /** Resolve all values, leaving references to variables NOT in this map
    * untouched (still `$name`). Used for the parameter-materialization
    * overlay: a job-file rest variable may legitimately reference a
    * parameter-published variable ($dest_table) that only exists in the
    * FINAL overlay — it must not fail here, only if something actually
    * consumed during materialization references it.
    */
  def resolveLenient(): Variables = {
    def expandL(str: String, stack: List[String]): String =
      Variables.expandWith(str) { name =>
        if (stack.contains(name))
          throw new ParameterError(
            s"circular variable reference: ${(name :: stack).reverse.mkString(" -> ")}")
        underlying.get(name) match {
          case Some(v) => expandL(v, name :: stack)
          case None    => "${" + name + "}" // keep for the final overlay
        }
      }
    new Variables(underlying.map { case (k, v) => k -> expandL(v, List(k)) })
  }

  override def toString: String =
    underlying.map { case (k, v) => s"$k=$v" }.mkString("Variables(", ", ", ")")
}

object Variables {
  /** `$name` or `${name}` (reference: variables.rb:180-184). */
  private val VarRef: Regex = """\$(\w+)|\$\{(\w+)\}""".r

  val empty: Variables = new Variables(ListMap.empty)

  def apply(pairs: (String, String)*): Variables =
    new Variables(ListMap(pairs: _*))

  def fromMap(m: Map[String, String]): Variables =
    new Variables(ListMap(m.toSeq: _*))

  /** Replace each `$var` reference using `f` (reference: variables.rb:182-184). */
  def expandWith(str: String)(f: String => String): String =
    VarRef.replaceAllIn(str, m => Regex.quoteReplacement(
      f(Option(m.group(1)).getOrElse(m.group(2)))))

  /** All variable names referenced in `str` (reference: variables.rb:186-188). */
  def listVariables(str: String): Seq[String] =
    VarRef.findAllMatchIn(str).map(m => Option(m.group(1)).getOrElse(m.group(2))).toSeq
}
