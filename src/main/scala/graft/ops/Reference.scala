package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.Tokenize

/** Reference-app parity queries (SURVEY.md §2.2, A1-A8), re-expressed as
  * relational plans over the driver's `documents`/`events` tables per the
  * fixture mapping in FIXTURES.md §3.
  *
  * Design notes for scale (SURVEY.md §7):
  *  - tokenize → count is scan → generate → partial agg → shuffle → final
  *    agg; Catalyst's partial aggregation is the combiner the reference
  *    lacks (`internal/worker/worker.go:221-240` shuffles raw pairs).
  *  - every grouped string/array agg sorts in-group (`sort_array`) before
  *    joining — the reference's determinism idiom
  *    (`example/mrapps/nocrash/nocrash.go:43-46`).
  */
object Reference {
  type Q = (SparkSession, String) => DataFrame

  /** A1+A2: word count (`example/mrapps/wc/wc.go:24-55`). */
  def wc(s: SparkSession, dir: String): DataFrame =
    Tokenize
      .tokens(Tables.documents(s, dir))
      .select(col("token").as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** A3+A4: inverted index (`example/mrapps/indexer/indexer.go:22-41`) —
    * per word: distinct-doc count + sorted comma-joined doc list.
    */
  def invertedIndex(s: SparkSession, dir: String): DataFrame =
    Tokenize
      .tokens(Tables.documents(s, dir))
      .groupBy(col("token").as("word"))
      .agg(
        count_distinct(col("doc_id")).as("n_docs"),
        array_join(sort_array(collect_set(col("doc_id"))).cast("array<string>"), ",")
          .as("doc_list"))

  /** A3 in isolation: per-document distinct word count. */
  def docDistinct(s: SparkSession, dir: String): DataFrame =
    Tokenize
      .tokens(Tables.documents(s, dir))
      .groupBy("doc_id")
      .agg(count_distinct(col("token")).as("n_distinct_words"))

  /** A7: metadata extraction (`example/mrapps/nocrash/nocrash.go:29-38`):
    * per file — name, name length, content length, constant tag.
    */
  def metadata(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("text_len"),
        col("n_chars"),
        lit("xyzzy").as("tag"))

  /** A5: count per key (`example/mrapps/early_exit/early_exit.go:32-40`). */
  def countPerKey(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).groupBy("source").agg(count(lit(1)).as("cnt"))

  /** A6: sort values within group + string-join
    * (`example/mrapps/nocrash/nocrash.go:40-50`).
    */
  def groupSortJoin(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .groupBy("lang")
      .agg(array_join(sort_array(collect_list(col("source"))), " ").as("sources"))

  /** A8: constant-key fan-in (`example/mrapps/jobcount/jobcount.go:25-35`) —
    * the all-rows-to-one-key skew pattern. Catalyst plans this as partial
    * agg per partition + single-row final agg, so the "skew" never
    * materializes as a fat shuffle partition.
    */
  def skewAgg(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .groupBy(lit("all").as("k"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,6)")).cast("double").as("total"))

  val queries: Map[String, Q] = Map(
    "wc"              -> (wc _),
    "inverted_index"  -> (invertedIndex _),
    "doc_distinct"    -> (docDistinct _),
    "metadata"        -> (metadata _),
    "count_per_key"   -> (countPerKey _),
    "group_sort_join" -> (groupSortJoin _),
    "skew_agg"        -> (skewAgg _)
  )

  private val tok =
    "SELECT doc_id, t AS token FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '[^\\p{L}]+')) AS t FROM documents) WHERE t <> ''"

  val oracle: Map[String, String] = Map(
    "wc" ->
      s"SELECT token AS word, count(*) AS cnt FROM ($tok) GROUP BY 1",
    "inverted_index" ->
      s"SELECT token AS word, count(DISTINCT doc_id) AS n_docs, array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS doc_list FROM ($tok) GROUP BY 1",
    "doc_distinct" ->
      s"SELECT doc_id, count(DISTINCT token) AS n_distinct_words FROM ($tok) GROUP BY 1",
    "metadata" ->
      "SELECT doc_id, length(text) AS text_len, n_chars, 'xyzzy' AS tag FROM documents",
    "count_per_key" ->
      "SELECT source, count(*) AS cnt FROM documents GROUP BY 1",
    "group_sort_join" ->
      "SELECT lang, array_to_string(list_sort(list(source)), ' ') AS sources FROM documents GROUP BY 1",
    "skew_agg" ->
      "SELECT 'all' AS k, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total FROM events GROUP BY 1"
  )
}
