package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenization matching the reference's word splitter: the reference's map
  * functions split file contents on non-letter runes and drop empty tokens
  * (`example/mrapps/wc/wc.go:26-29` — `strings.FieldsFunc(contents,
  * func(r rune) bool { return !unicode.IsLetter(r) })`).
  *
  * `\p{L}` is the Java-regex equivalent of Go's `unicode.IsLetter`; the
  * split leaves empty strings at boundaries which we filter out, matching
  * `FieldsFunc` (which never yields empty fields).
  *
  * Everything stays inside whole-stage codegen: `split`/`explode`/`filter`
  * are all native Catalyst expressions — no UDFs in this hot path.
  */
object Tokenize {
  val WordPattern = "[^\\p{L}]+"

  def tokenCol(text: Column): Column = split(text, WordPattern)

  /** (doc_id, token) rows, empty tokens dropped. */
  def tokens(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), explode(tokenCol(col(textCol))).as("token"))
      .filter(col("token") =!= "")
}
