package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** CSV corpus source/sink — the interchange format for tabular metadata
  * drops (quality scores, label manifests, per-document audit exports).
  *
  * The design decision that matters at 100 TB is LINE-SPLITTABILITY.
  * RFC-4180 CSV quotes embedded newlines, which makes record boundaries
  * ambiguous at an arbitrary byte offset; Spark's answer is
  * `multiLine=true`, which parses each FILE as one unsplittable unit —
  * one task per file, read parallelism capped at the file count, and a
  * single fat export file becomes a single-task scan. This sink refuses
  * that trade: control characters are escaped INTO the value
  * (`\` → `\\`, newline → `\n`, CR → `\r`) before the CSV layer ever
  * sees them, so one record is always one physical line, byte-range
  * splits stay valid, and the reader runs at full parallelism with
  * `multiLine` left off. The read path reverses the escape exactly; the
  * round trip is lossless for arbitrary text (adversarial spec).
  *
  * Null discipline: CSV cannot natively distinguish `NULL` from the
  * empty string. The sink writes nulls as the MySQL-style `\N` sentinel
  * — which cannot collide with DATA, because a literal backslash-N in a
  * value is escape-doubled to `\\N` before the CSV layer applies the
  * sentinel. Reads with an explicit schema for the same reason as the
  * JSONL source: inference is an extra full pass with union-typing
  * drift.
  */
object CsvSources {

  private val NullToken = "\\N"

  /** Spark's default CSV timestampFormat carries millisecond precision,
    * so a microsecond timestamp would silently truncate on a round trip.
    * Writer and reader both pin the full-microsecond form (and its NTZ
    * twin) so timestamp columns survive losslessly alongside strings and
    * numerics.
    */
  private val TsFormat    = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
  private val TsNtzFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

  /** Escape one string column into its line-free form: backslash doubles
    * first, then newline/CR fold to `\n`/`\r`. Pure codegen'd builtins —
    * no UDF in the write path.
    */
  def escapeCol(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, "\\\\", "\\\\\\\\"), // \  -> \\
        "\n", "\\\\n"),                        // LF -> \n
      "\r", "\\\\r")                           // CR -> \r

  /** Reverse [[escapeCol]]. A naive chained replace is WRONG — in
    * `\\n` (an escaped backslash followed by a real `n`) the `\n` pair
    * must NOT unescape to a newline. Splitting on the literal `\\` pair
    * first makes every remaining `\n`/`\r` inside a segment a true
    * escape; re-joining the unescaped segments with `\` restores the
    * doubled backslashes. All builtins (`split`/`transform`/
    * `array_join`), so the read path is codegen'd too.
    */
  def unescapeCol(c: Column): Column =
    array_join(
      transform(
        split(c, "\\\\\\\\", -1), // split on literal "\\", keep trailing empties
        seg =>
          regexp_replace(
            regexp_replace(seg, "\\\\n", "\n"),
            "\\\\r", "\r")),
      "\\")

  private def mapStrings(df: DataFrame, f: Column => Column): DataFrame =
    df.select(df.schema.fields.map { fld =>
      if (fld.dataType == StringType) f(col(fld.name)).as(fld.name)
      else col(fld.name)
    }.toIndexedSeq: _*)

  /** Write `df` as line-splittable CSV under `path`: every string column
    * escaped via [[escapeCol]], nulls as the `\N` sentinel, header row,
    * gzip by default (same caveat as the JSONL sink: gzip is not
    * splittable, so the writer's file count is the drop's read
    * parallelism — re-shard before writing if the partitioning is
    * coarse; pass `codec = "none"` for splittable raw files).
    */
  def writeCsv(df: DataFrame, path: String, codec: String = "gzip"): Unit =
    mapStrings(df, escapeCol).write
      .mode("overwrite")
      .option("header", "true")
      .option("nullValue", NullToken)
      .option("timestampFormat", TsFormat)
      .option("timestampNTZFormat", TsNtzFormat)
      .option("compression", codec)
      .csv(path)

  /** Read a [[writeCsv]] drop with an explicit schema, reversing the
    * escape on every string column.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    mapStrings(
      spark.read
        .schema(schema)
        .option("header", "true")
        .option("nullValue", NullToken)
        .option("timestampFormat", TsFormat)
        .option("timestampNTZFormat", TsNtzFormat)
        .csv(path),
      unescapeCol)
}
