package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) source/sink — the lingua franca of LLM
  * corpus interchange (one document object per line: Dolma, RedPajama,
  * FineWeb, OpenWebText all ship this shape). The engine must both ingest
  * vendor JSONL drops and emit them for downstream tokenizers.
  *
  * Scale notes:
  *  - The READ always takes an explicit schema. Schema inference is a
  *    full extra pass over 100 TB before the real scan, and worse, it
  *    types by union over observed values — a column that is integer in
  *    the sampled files and string in one stray shard flips the whole
  *    table's type run-to-run. An explicit schema is one metadata object
  *    and makes malformed rows surface as nulls (Spark's PERMISSIVE
  *    default) instead of type drift.
  *  - JSONL is line-splittable: JSON string escaping guarantees one
  *    document per physical line (embedded newlines are written as \n),
  *    so Spark assigns file splits by byte range exactly as with any text
  *    format — full read parallelism without a container format.
  *  - Compression default: the writer emits gzip unless told otherwise —
  *    corpus text compresses 3-5x and JSONL's framing overhead makes the
  *    worst format to store raw. Gzip is NOT splittable (one file = one
  *    task), so the writer's file count — one per input partition — is
  *    the read parallelism of the drop; re-shard before writing if the
  *    partitioning is coarse.
  */
object JsonSources {

  /** Write `df` as JSONL under `path`, one object per line, one file per
    * partition, gzip-compressed by default.
    */
  def writeJsonl(df: DataFrame, path: String, codec: String = "gzip"): Unit =
    df.write.mode("overwrite").option("compression", codec).json(path)

  /** Read a JSONL directory with an explicit schema (see object doc for
    * why inference is banned at scale).
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
