package graft.core

/** `[schema.]table` name pair (reference: lib/bricolage/sqlstatement.rb:302-349). */
final case class TableSpec(schema: Option[String], name: String) {
  override def toString: String = schema.map(s => s"$s.$name").getOrElse(name)
}

object TableSpec {
  def parse(spec: String): TableSpec = {
    if (spec == null || spec.isEmpty)
      throw new ParameterError("empty table spec")
    spec.split("\\.", -1) match {
      case Array(t)    => TableSpec(None, t)
      case Array(s, t) if s.nonEmpty && t.nonEmpty => TableSpec(Some(s), t)
      case _ => throw new ParameterError(s"bad table spec: '$spec'")
    }
  }
}
