package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The north-star composition: a complete training-data cleaning pipeline
  * as one declarative plan —
  *
  *   quality filter → exact-dup removal (keep first) →
  *   near-dup removal (MinHash+LSH verified pairs, keep lower id) →
  *   per-language clean-corpus stats
  *
  * Every stage is an operator that is independently oracle-verified
  * (text_quality, dedup_exact, dedup_minhash); this query proves they
  * compose — the form in which the engine would actually run over a
  * 100 TB corpus: one DAG, shuffles shared, no materialization between
  * stages.
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  val MinTokens = 20
  val MinTtr    = 0.3

  def cleanCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val quality = TextAnalysis
      .qualityShared(s, dir)
      .filter(col("n_tokens") >= MinTokens && col("type_token_ratio") >= MinTtr)
      .select("doc_id")
    val exactKeep = Dedup.exact(s, dir).filter(!col("is_dup")).select("doc_id")
    val nearLosers = Dedup
      .minhashShared(s, dir)
      .select(col("db").as("doc_id"))
      .distinct()
    docs
      .join(quality, "doc_id")
      .join(exactKeep, "doc_id")
      .join(nearLosers, Seq("doc_id"), "left_anti")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
  }

  val queries: Map[String, Q] = Map("pipeline_clean_corpus" -> (cleanCorpus _))

  val oracle: Map[String, String] = Map(
    "pipeline_clean_corpus" ->
      s"""WITH tokq AS (${TextAnalysis.oracle("text_quality")}),
         quality AS (SELECT doc_id FROM tokq WHERE n_tokens >= $MinTokens AND type_token_ratio >= $MinTtr),
         exact_keep AS (SELECT doc_id FROM (${Dedup.oracle("dedup_exact")}) WHERE NOT is_dup),
         near_losers AS (SELECT DISTINCT db AS doc_id FROM (${Dedup.oracle("dedup_minhash")}))
         SELECT d.lang, count(*) AS n_docs, CAST(sum(d.n_chars) AS BIGINT) AS total_chars
         FROM documents d
         JOIN quality USING (doc_id)
         JOIN exact_keep USING (doc_id)
         WHERE d.doc_id NOT IN (SELECT doc_id FROM near_losers)
         GROUP BY 1"""
  )
}
