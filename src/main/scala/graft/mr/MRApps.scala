package graft.mr

/** The reference's example apps re-expressed against the unified trait,
  * plus the registry that replaces Go plugin loading
  * (`internal/worker/worker.go:31-59` → a Map).
  */
object MRApps {

  /** Tokenize on non-letter runes, dropping empties — Go
    * `strings.FieldsFunc(contents, !unicode.IsLetter)`
    * (`example/mrapps/wc/wc.go:26-29`).
    */
  private[graft] def tokenize(contents: String): Seq[String] =
    contents.split("[^\\p{L}]+").toIndexedSeq.filter(_.nonEmpty)

  /** Word count (`example/mrapps/wc/wc.go:24-55`): emit (word, "1"),
    * reduce counts occurrences. Streaming reduce counts incrementally —
    * constant memory however hot the key.
    */
  object WordCount extends MRApp {
    val name = "wc"
    def map(filename: String, contents: String): Seq[KV] =
      tokenize(contents).map(w => KV(w, "1"))
    def reduce(key: String, values: Seq[String]): Seq[String] =
      Seq(values.size.toString)
    override def reduceStream(key: String, values: Iterator[String]): Iterator[String] = {
      var n = 0L
      while (values.hasNext) { values.next(); n += 1 }
      Iterator.single(n.toString)
    }
  }

  /** Inverted index (`example/mrapps/indexer/indexer.go:22-41`): per-doc
    * distinct words → per word "<count> <doc1,doc2,...>" with docs sorted.
    */
  object Indexer extends MRApp {
    val name = "indexer"
    def map(filename: String, contents: String): Seq[KV] =
      tokenize(contents).distinct.map(w => KV(w, filename))
    def reduce(key: String, values: Seq[String]): Seq[String] = {
      val docs = values.distinct.sorted
      Seq(s"${docs.size} ${docs.mkString(",")}")
    }

    /** Values arrive ascending on the secondary-sort path, so distinct is
      * adjacent dedup — one pass, no group materialization even for a
      * stopword's doc list (only the deduped output string is buffered,
      * which the output format requires).
      */
    override def reduceStream(key: String, values: Iterator[String]): Iterator[String] = {
      val docs           = new StringBuilder
      var n              = 0
      var prev: String   = null
      while (values.hasNext) {
        val v = values.next()
        if (v != prev) {
          n += 1
          if (n > 1) docs.append(',')
          docs.append(v)
          prev = v
        }
      }
      Iterator.single(s"$n ${docs.toString}")
    }
  }

  /** Metadata extraction (`example/mrapps/nocrash/nocrash.go:29-38`): per
    * file — name length, content length, constant tag; reduce sorts and
    * joins the group's values (`nocrash.go:40-50`).
    */
  object Metadata extends MRApp {
    val name = "metadata"
    def map(filename: String, contents: String): Seq[KV] =
      // codePointCount, not .length: the oracle's length() counts code
      // points, while String.length counts UTF-16 units (differs for
      // supplementary-plane characters)
      Seq(
        KV(filename, filename.codePointCount(0, filename.length).toString),
        KV(filename, contents.codePointCount(0, contents.length).toString),
        KV(filename, "xyzzy"))
    def reduce(key: String, values: Seq[String]): Seq[String] =
      Seq(values.sorted.mkString(" "))
  }

  /** Count per file key (`example/mrapps/early_exit/early_exit.go:32-40`). */
  object FileCount extends MRApp {
    val name = "filecount"
    def map(filename: String, contents: String): Seq[KV] =
      Seq(KV(filename, "1"))
    def reduce(key: String, values: Seq[String]): Seq[String] =
      Seq(values.size.toString)
  }

  /** Constant-key fan-in (`example/mrapps/jobcount/jobcount.go:25-35`,
    * `rtiming.go:65-79`): the deliberate skew pattern.
    */
  object ConstKey extends MRApp {
    val name = "constkey"
    def map(filename: String, contents: String): Seq[KV] =
      Seq(KV("all", filename))
    def reduce(key: String, values: Seq[String]): Seq[String] =
      Seq(values.size.toString)
  }

  /** The plugin registry (F12 analogue). */
  val all: Map[String, MRApp] =
    Seq(WordCount, Indexer, Metadata, FileCount, ConstKey)
      .map(a => a.name -> a)
      .toMap
}
