package graft.ds

import graft.core.JobError

/** Translate the reference's `.ct` create-table files (Redshift DDL) to
  * Spark SQL DDL (reference: user-authored files like
  * test/home/subsys/users.ct:1-13 — types int/smallint/bigint/varchar(n)/
  * date/timestamp plus physical attributes `encode`, `distkey`, `sortkey`).
  *
  * Mapping (SURVEY §1.2): encode → dropped (Parquet self-encodes);
  * distkey(k) → `CLUSTERED BY (k) INTO n BUCKETS` (co-located storage, so
  * equi-joins/aggregations on k skip the exchange — Redshift's DISTKEY
  * semantics); sortkey(k…) → `SORTED BY` within each bucket.
  */
object CtTranslator {

  /** Buckets per table when distkey is present; at cluster scale size this
    * to data volume (buckets ≈ executors × a small factor).
    */
  val DefaultBuckets: Int = 8

  final case class Translated(createSql: String, distKey: Option[String],
      sortKeys: Seq[String])

  private val TypeMap = Seq(
    ("""(?i)\bsmallint\b""", "SMALLINT"),
    ("""(?i)\binteger\b""", "INT"),
    ("""(?i)\bint\b""", "INT"),
    ("""(?i)\bbigint\b""", "BIGINT"),
    ("""(?i)\bvarchar\s*\(\s*(\d+)\s*\)""", "STRING"),
    ("""(?i)\bvarchar\b""", "STRING"),
    ("""(?i)\bdate\b""", "DATE"),
    ("""(?i)\btimestamp\b""", "TIMESTAMP"),
  )

  def translate(ct: String, tableNameOverride: Option[String] = None,
      buckets: Int = DefaultBuckets): Translated = {
    // drop the `--key: value` metadata header + leading comment lines
    // (reference .ct files open with `--dest-table: x`, e.g. users.ct:1)
    var s = ct.linesIterator.dropWhile(l =>
      l.trim.isEmpty || l.trim.startsWith("--")).mkString("\n")
    // drop per-column `encode xxx`
    s = s.replaceAll("""(?i)\s+encode\s+\w+""", "")
    // extract and drop table attributes
    val distKey = """(?i)distkey\s*\(\s*(\w+)\s*\)""".r.findFirstMatchIn(s).map(_.group(1))
    val sortKeys = """(?i)sortkey\s*\(\s*([\w\s,]+)\)""".r.findFirstMatchIn(s)
      .map(_.group(1).split(",").map(_.trim).toSeq).getOrElse(Nil)
    s = s.replaceAll("""(?i)\s*distkey\s*\(\s*\w+\s*\)""", "")
    s = s.replaceAll("""(?i)\s*sortkey\s*\(\s*[\w\s,]+\)""", "")
    // normalize types
    TypeMap.foreach { case (re, to) => s = s.replaceAll(re, to) }
    // Redshift `not null` etc. are accepted by Spark DDL; `;` terminator dropped
    s = s.trim.stripSuffix(";").trim
    if (!s.toLowerCase.startsWith("create table"))
      throw new JobError(".ct file must start with CREATE TABLE")
    tableNameOverride.foreach { t =>
      s = s.replaceFirst("""(?is)create\s+table\s+[\$\w\.]+""",
        java.util.regex.Matcher.quoteReplacement(s"CREATE TABLE $t"))
    }
    val bucketSpec = distKey.map { k =>
      val sorted = if (sortKeys.nonEmpty) s" SORTED BY (${sortKeys.mkString(", ")})" else ""
      s" CLUSTERED BY ($k)$sorted INTO $buckets BUCKETS"
    }.getOrElse("")
    Translated(s + " USING parquet" + bucketSpec, distKey, sortKeys)
  }
}
