package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical sf1-scale probe for the dedup family and the round-5 heavy
  * operators (SCALING.md's candidate-volume law): builds a 10× corpus
  * from sf0.1 (≈ sf1 — 50k documents / 20k vectors) under
  * `target/scale10x`, then times each query at both scales and reports
  * wall time and result-row volume.
  *
  * The synthetic 10× corpus is NOT naive replication — see
  * [[ScaleData.buildDocs]]/[[ScaleData.buildEmbeddings]] (the shared
  * splice/perturb builders this probe and the full-catalog
  * [[ScaleSweep]] both use).
  *
  * Usage: `sbt "runMain graft.DedupScaleProbe [query ...]"` — no args
  * runs the dedup family; explicit args (e.g. `text_bm25 graph_pagerank
  * source_overlap`) probe those queries instead. Prints one result line
  * per (query, scale); results are pasted into SCALING.md.
  */
object DedupScaleProbe {
  val Src = "/root/testdata/sf0.1"
  val Out = "target/scale10x"
  val Reps = 10

  /** Recall@k of the three-tier ANN (`sim_ivfpq_rerank`) against the
    * exact brute-force top-k, at a given scale. The point of running it
    * at 10× is that the index geometry is NOT fixture-pinned: planesFor
    * / centroidsFor re-derive from the actual table count
    * (`Similarity.scala`), so this measures whether the
    * occupancy-constant re-derivation preserves recall as the vector
    * table grows — the property a fixed geometry silently loses.
    */
  private def annRecall(s: SparkSession, dir: String): (Long, Double) = {
    val truth = ops.Similarity.topkBrute(s, dir).select(col("va"), col("vb"))
    val got = ops.Similarity.ivfPqRerank(s, dir)
      .select(col("q_vec").as("va"), col("vec_id").as("vb"), lit(1).as("hit"))
    val r = truth.join(got, Seq("va", "vb"), "left")
      .agg(count(lit(1)).as("n"), count(col("hit")).as("h")).collect()(0)
    (r.getLong(0), r.getLong(1).toDouble / r.getLong(0))
  }

  /** Adversarial-family-mass probe (round-13): the 10× corpus augmented
    * with ONE planted boilerplate family of `fam` near-identical docs —
    * the million-member-template regime in miniature. Reports, on the
    * SAME corpus, the capped path's candidate count and full verify wall
    * time vs the exact twin's candidate count (counted, NOT verified:
    * its Levenshtein bill is candidates × the same per-pair cost, i.e.
    * ~fam/2 × the capped bill by construction). The capped candidates
    * grow by ≤ bands × fam (linear); the exact twin's by fam²/2.
    */
  private def giantFamily(s: SparkSession, fam: Int): Unit = {
    val base = Tables.documents(s, Out).select("doc_id", "text")
    val n = base.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1L
    val words = (0 until 40)
      .map(i => s"boiler${('a' + i % 26).toChar}${('a' + i / 26).toChar}").mkString(" ")
    val planted = s.range(0, fam)
      .select((col("id") + n).as("doc_id"), lit(words).as("text"))
    val docs = base.unionByName(planted).transform(Ckpt.apply)
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scale] giant_family($fam) $what%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val cc = timed("capped_cands(count)") { ops.Dedup.fuzzyCappedCandCount(docs) }
    val cv = timed("capped_verify(full)") { ops.Dedup.fuzzyCappedOf(docs).count() }
    val ec = timed("exact_cands(count)") { ops.Dedup.minhashCandCount(docs) }
    println(f"[scale] giant_family($fam) capped_cands=$cc%-10d capped_verified=$cv%-8d " +
      f"exact_cands=$ec%-12d exact/capped=${ec.toDouble / cc}%.1fx")
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    if (!new java.io.File(s"$Out/documents.parquet").exists())
      ScaleData.buildDocs(spark, Src, Out, Reps)
    if (!new java.io.File(s"$Out/embeddings.parquet").exists())
      ScaleData.buildEmbeddings(spark, Src, Out, Reps)
    println(s"[scale] docs 1x=${Tables.documents(spark, Src).count()} " +
      s"10x=${Tables.documents(spark, Out).count()}")
    val queries =
      if (args.nonEmpty) args.toSeq
      else Seq("dedup_exact", "dedup_ngram", "dedup_minhash", "dedup_simhash", "dedup_fuzzy",
        "dedup_embedding")
    if (queries.contains("giant_family"))
      giantFamily(spark, args.find(_.startsWith("fam=")).map(_.drop(4).toInt).getOrElse(5000))
    if (queries.contains("ann_recall"))
      for ((tag, dir) <- Seq("1x" -> Src, "10x" -> Out)) {
        val (n, rec) = annRecall(spark, dir)
        println(f"[scale] ann_recall       $tag%-3s truth_pairs=$n%-8d recall=$rec%.4f")
      }
    for (q <- queries.filterNot(q => q == "ann_recall" || q == "giant_family" || q.startsWith("fam="));
         (tag, dir) <- Seq("1x" -> Src, "10x" -> Out)) {
      // warm run (codegen/plan), then the timed run. Verdict-style
      // queries (is_dup column) count FLAGGED rows: a bare count() on
      // their row-preserving left join lets Catalyst eliminate the whole
      // match pipeline (the match side is unique-keyed), which would
      // time a filtered scan instead of the dedup.
      def run(): Long = {
        val out = SparkEntry.queries(q)(spark, dir)
        (if (out.columns.contains("is_dup")) out.filter(col("is_dup")) else out).count()
      }
      run()
      val t0 = System.nanoTime()
      val rows = run()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $q%-16s $tag%-3s pairs=$rows%-8d time=$sec%.2f s")
    }
    spark.stop()
  }
}
