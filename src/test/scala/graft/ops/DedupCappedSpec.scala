package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The adversarial-family-mass property of the capped dedup verifiers
  * (round-12 verdict item 1): on a planted giant near-dup family the
  * capped paths do work LINEAR in family size m (member↔canonical pairs
  * only) while the exact twins are quadratic (all pairs within the
  * family), and the truncation-audit column accounts exactly for the
  * pairings the cap skipped. Everything here is deterministic — the
  * blocking keys are md5-derived — so the counts are asserted exactly.
  */
class DedupCappedSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // letters only — the tokenizer splits on non-letter runs, so digit
  // suffixes would collapse every word to its seed (the spanDedup trick)
  private def words(seed: String, n: Int) =
    (0 until n).map(i => s"$seed${('a' + i % 26).toChar}${('a' + i / 26).toChar}").mkString(" ")

  /** `family` exact copies of one 40-token doc (ids 0..family-1: one
    * boilerplate family, the million-member-template regime in
    * miniature) plus 5 unrelated docs (ids 10000+).
    */
  private def corpus(family: Int) = {
    val fam  = (0 until family).map(i => (i.toLong, words("boiler", 40)))
    val uniq = (0 until 5).map(i => (10000L + i, words(s"uniq${('a' + i).toChar}", 40)))
    (fam ++ uniq).toDF("doc_id", "text")
  }

  test("planted 1,000-member family: capped fuzzy verify is linear, the exact twin is quadratic") {
    // capped: exactly m-1 verified pairs (every member against THE
    // canonical), so 2x the family is 2x the work — never 4x
    val m1 = Dedup.fuzzyCappedOf(corpus(500)).collect()
    val m2 = Dedup.fuzzyCappedOf(corpus(1000)).collect()
    assert(m1.length == 499, s"expected 499 capped pairs, got ${m1.length}")
    assert(m2.length == 999, s"expected 999 capped pairs, got ${m2.length}")
    // every member verifies against the bucket canonical (min doc_id)
    assert(m2.forall(_.getLong(0) == 0L))
    // exact copies: dist 0, rel 0
    assert(m2.forall(r => r.getLong(2) == 0L && r.getDouble(3) == 0.0))
    // audit: all 12 bands bucket the whole family together, so each
    // member skipped (m-2) bucket mates per band = 12*(m-2) pairing slots
    assert(m2.forall(_.getLong(4) == 12L * 998),
      s"skipped audit off: ${m2.map(_.getLong(4)).distinct.mkString(",")}")
    // the exact twin verifies all m(m-1)/2 family pairs: quadratic
    val f1 = Dedup.fuzzyOf(corpus(100)).count()
    val f2 = Dedup.fuzzyOf(corpus(200)).count()
    assert(f1 == 100L * 99 / 2, s"exact twin at m=100: $f1")
    assert(f2 == 200L * 199 / 2, s"exact twin at m=200: $f2")
  }

  test("capped containment: member-canonical pairs only, exact scores, audited skips") {
    // family of 100 < DfCap=128, so every family shingle still blocks
    // (the regime where the exact twin's pair mass is quadratic)
    val out = Dedup.containmentCappedOf(corpus(100)).collect()
    assert(out.length == 99, s"expected 99 capped pairs, got ${out.length}")
    assert(out.forall(_.getLong(0) == 0L))
    // the recount runs over ALL shingles, so scores stay exact (copies
    // contain each other fully)
    assert(out.forall(r => r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0))
    // 40 tokens = 38 trigram shingles, each shared by the whole family:
    // every member skips (m-2) mates per shingle = 38*(m-2) slots
    assert(out.forall(_.getLong(4) == 38L * 98),
      s"skipped audit off: ${out.map(_.getLong(4)).distinct.mkString(",")}")
    assert(Dedup.containmentOf(corpus(100)).count() == 100L * 99 / 2)
  }

  test("capped containment hot remainder: i = i_rare + i_hot equals the full recount") {
    // 130 filler docs carry phrase H (df = 130 > DfCap = 128, so H's
    // shingles are HOT and never block), and docs 0/1 share H plus a
    // rare near-identical body — the recount must still count the hot
    // shared shingles exactly (r16: the recount was restructured onto
    // the rare/hot split, i = |A∩B∩rare| + |A∩B∩hot|)
    val hotPhrase = words("boiler", 20)
    val bodyA     = words("almost", 30)
    val bodyB     = bodyA.split(" ").dropRight(1).mkString(" ") // 29/30 prefix
    val filler = (0 until 130).map(i =>
      (100L + i, s"${words(s"f${('a' + i % 26).toChar}", 10)} $hotPhrase"))
    val docs = (Seq((0L, s"$bodyA $hotPhrase"), (1L, s"$bodyB $hotPhrase")) ++ filler)
      .toDF("doc_id", "text")
    val out = Dedup.containmentCappedOf(docs)
      .collect().filter(r => r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(out.length == 1, s"expected the (0,1) pair, got ${out.length} rows")
    // independent exact recount: trigram shingle sets of the two docs
    def shingleSet(text: String): Set[String] = {
      val t = text.split(" ").toSeq
      t.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }
    val sa = shingleSet(s"$bodyA $hotPhrase")
    val sb = shingleSet(s"$bodyB $hotPhrase")
    val i  = (sa intersect sb).size.toDouble
    assert(out.head.getDouble(2) == i / sa.size, s"contain_a: ${out.head.getDouble(2)} vs ${i / sa.size}")
    assert(out.head.getDouble(3) == i / sb.size, s"contain_b: ${out.head.getDouble(3)} vs ${i / sb.size}")
  }

  test("non-exact members verify against the canonical with their true edit distance") {
    val base    = words("boiler", 40)
    val variant = base.split(" ").dropRight(1).mkString(" ") + " zzzz"
    val docs    = Seq((0L, base), (1L, base), (2L, variant)).toDF("doc_id", "text")
    val rows    = Dedup.fuzzyCappedOf(docs).collect().sortBy(_.getLong(1))
    assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    assert(rows.forall(_.getLong(0) == 0L))
    val v = rows.find(_.getLong(1) == 2L).get
    assert(v.getLong(2) > 0L && v.getDouble(3) <= Dedup.FuzzyMaxRel,
      s"variant dist/rel: ${v.getLong(2)}/${v.getDouble(3)}")
  }
}
