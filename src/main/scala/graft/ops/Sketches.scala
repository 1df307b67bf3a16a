package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3
import graft.Tables

/** Mergeable frequency sketches for heavy-hitter mining at corpus scale —
  * the third sketch family next to `Relational.approxStats`'s HLL++
  * (distinct counts) and KLL (quantiles). Like those, this stays OUT of
  * the oracle catalog by design: sketch internals have no cross-engine
  * twin, so the correctness contract lives in `SketchSpec` as error
  * bounds against the exact `wc`/`count_per_key` answers.
  *
  * Why it matters at 100 TB: the exact top-k ("what are the most common
  * tokens / URLs / shingles in the corpus?") shuffles the FULL token
  * stream onto its keys — the vocabulary is unbounded, so the shuffle is
  * corpus-sized. The sketched plan moves only fixed-size state: each
  * partition folds its slice into a depth×width count-min array
  * (Cormode–Muthukrishnan 2005) and nominates ≤ M space-saving
  * candidates (Metwally et al. 2005); the arrays merge element-wise (a
  * commutative monoid — partitioning-independent by construction) and
  * only P·M candidate rows ever shuffle. Guarantees: CMS never
  * under-counts, over-counts by ≤ e/width·N with probability
  * 1 − e^-depth per query; space-saving retains every key whose
  * partition frequency exceeds n_p/M.
  */
object Sketches {

  /** Count-min sketch as a typed [[Aggregator]]: buffer = flat
    * depth×width long array, reduce = increment one cell per row (seeded
    * MurmurHash3 per row of the sketch), merge = element-wise sum.
    * Width must be a power of two (mask indexing).
    */
  class CountMinSketch(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require((width & (width - 1)) == 0, "width must be a power of two")
    def zero: Array[Long] = new Array[Long](depth * width)
    private def cell(d: Int, a: String): Int =
      d * width + (MurmurHash3.stringHash(a, d) & (width - 1))
    def reduce(b: Array[Long], a: String): Array[Long] = {
      var d = 0
      while (d < depth) { b(cell(d, a)) += 1L; d += 1 }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()

    /** Point estimate from a finished sketch: min over the depth rows. */
    def estimate(sk: Array[Long], a: String): Long = {
      var best = Long.MaxValue
      var d = 0
      while (d < depth) { val v = sk(cell(d, a)); if (v < best) best = v; d += 1 }
      best
    }
  }

  val HhDepth = 4
  val HhWidth = 1 << 14
  val HhCandidatesPerPartition = 256

  /** Space-saving candidate pass: every partition keeps at most `m`
    * counters (evicting the minimum, inheriting its count), so any key
    * with partition frequency > n_p/m survives. Emits the partition's
    * surviving keys — the bounded candidate set the sketch then scores.
    */
  private[ops] def spaceSavingCandidates(tokens: Dataset[String], m: Int): Dataset[String] = {
    import tokens.sparkSession.implicits._
    tokens.mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        counts.get(t) match {
          case Some(c) => counts(t) = c + 1
          case None =>
            if (counts.size < m) counts(t) = 1L
            else {
              // evict the minimum counter; the newcomer inherits its count
              val (mk, mc) = counts.minBy(_._2)
              counts.remove(mk)
              counts(t) = mc + 1
            }
        }
      }
      counts.keysIterator
    }
  }

  /** Sketched heavy hitters over a token stream: CMS aggregate (one
    * pass, fixed-size partial state) + space-saving candidates (≤ P·M
    * rows shuffle — never the token stream), scored by the broadcast
    * sketch, top-k by (estimate desc, token asc). The estimate is an
    * upper bound on the true count; `SketchSpec` pins the error band
    * and that the fixture's exact top-k survives.
    */
  def heavyHitters(tokens: Dataset[String], k: Int,
      depth: Int = HhDepth, width: Int = HhWidth,
      m: Int = HhCandidatesPerPartition): DataFrame = {
    import tokens.sparkSession.implicits._
    val cms = new CountMinSketch(depth, width)
    val sk  = tokens.select(cms.toColumn.name("sk")).as[Array[Long]].head()
    val bsk = tokens.sparkSession.sparkContext.broadcast(sk)
    spaceSavingCandidates(tokens, m)
      .distinct()
      .map(t => (t, cms.estimate(bsk.value, t)))
      .toDF("token", "est_count")
      .orderBy(desc("est_count"), asc("token"))
      .limit(k)
  }

  /** Fixture entry point: heavy hitters of the documents token stream
    * (same tokenization as `wc` — the exact comparison target).
    */
  def docTokenHeavyHitters(s: SparkSession, dir: String, k: Int): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select(explode(graft.text.Tokenize.tokenCol(col("text"))).as("t"))
      .filter(col("t") =!= "")
      .as[String]
    heavyHitters(toks, k)
  }

  /** Catalog depth for [[heavyHittersExact]]. */
  val HhK = 20

  /** Sketch-then-verify heavy hitters — the oracle-checkable member of
    * this family: space-saving nominates ≤ P·M candidate tokens (the
    * corpus-sized token stream never shuffles on its unbounded
    * vocabulary), then ONE candidate-bounded rescore pass computes their
    * EXACT counts (broadcast semi-join + map-side-combined count, so the
    * shuffle is P·|candidates| partial rows) and the global top-k runs
    * through TakeOrderedAndProject. Output equals the exact top-k
    * whenever the candidate set covers it — the space-saving guarantee
    * for any key above n_p/M in some partition, pinned empirically by
    * `SketchSpec` and the DuckDB gate; the estimate-only variant
    * ([[heavyHitters]]) stays out of the catalog because CMS
    * over-estimates have no cross-engine twin. Candidate sets vary with
    * partition layout, but the exact-rescored top-k is
    * partitioning-independent as long as coverage holds.
    */
  def heavyHittersExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select(explode(graft.text.Tokenize.tokenCol(col("text"))).as("t"))
      .filter(col("t") =!= "")
    val cands = spaceSavingCandidates(toks.as[String], HhCandidatesPerPartition)
      .distinct()
      .toDF("t")
    toks
      .join(broadcast(cands), "t")
      .groupBy("t")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("t"))
      .limit(HhK)
      .select(col("t").as("token"), col("cnt"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_heavy_hitters" -> (heavyHittersExact _)
  )

  private val tok =
    "SELECT t AS token FROM (SELECT unnest(regexp_split_to_array(text, '[^\\p{L}]+')) AS t FROM documents) WHERE t <> ''"

  val oracle: Map[String, String] = Map(
    "sketch_heavy_hitters" ->
      s"""SELECT token, cnt FROM (
            SELECT token, count(*) AS cnt FROM ($tok) GROUP BY 1)
          ORDER BY cnt DESC, token LIMIT $HhK"""
  )
}
