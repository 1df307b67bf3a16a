package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Whole-pool MMR greedy selection as ONE expression (r16, guide §2.4 /
  * verdict item 6): [[graft.ops.Similarity.mmrRerank]] used to unroll the
  * greedy rounds as five join+window+union passes over |Q|·pool-bounded
  * tables with per-round localCheckpoints — ~25 scheduler round-trips and
  * three eager materializations per invocation for tables of a few
  * hundred rows. The selection is per-query independent, so the whole
  * loop runs here over one query's collected pool (≤ MmrPool structs).
  *
  * Bit-parity with the unrolled formulation, term by term:
  *  - pairwise cosine = strict left-to-right float dot accumulation in
  *    double ([[FloatDotProduct.nullSafeEval]] verbatim) divided by the
  *    precomputed norm product — the identical `cosine(...)` expression;
  *  - round score = `λ·rel − μ·maxsim` in that IEEE evaluation order;
  *  - maxsim / argmax comparisons use `java.lang.Double.compare` — the
  *    same total order (NaN greatest, -0.0 < 0.0) Spark's `max` aggregate
  *    and `row_number` sort applied;
  *  - ties break on ascending vb, the unrolled window's second key;
  *  - round 1 emits score = rel, exactly as the unrolled seed row did.
  *
  * Null pool slots or null struct fields raise loudly: the pool is built
  * from non-null embeddings, so a null here is an upstream bug, and
  * reading through it (toFloatArray yields 0.0 for null slots) would
  * produce a finite, silently wrong cosine.
  *
  * Input:  array<struct<vb: bigint, rel: double, eb: array<float>, nb: double>>
  * Output: array<struct<vb: bigint, pick: bigint, rel: double, score: double>>
  * (min(k, |pool|) picks, in selection order).
  */
case class MmrSelect(child: Expression, k: Int, lambda: Double, mu: Double)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_mmr_select"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("vb", LongType, nullable = false),
      StructField("pick", LongType, nullable = false),
      StructField("rel", DoubleType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
        if st.length == 4 && st(0).dataType == LongType &&
          st(1).dataType == DoubleType &&
          st(2).dataType.isInstanceOf[ArrayType] &&
          st(2).dataType.asInstanceOf[ArrayType].elementType == FloatType &&
          st(3).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<struct<bigint, double, array<float>, double>>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n   = arr.numElements()
    val vb  = new Array[Long](n)
    val rel = new Array[Double](n)
    val eb  = new Array[Array[Float]](n)
    val nb  = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(s"$prettyName: null pool entry")
      val row = arr.getStruct(i, 4)
      if (row.isNullAt(0) || row.isNullAt(1) || row.isNullAt(2) || row.isNullAt(3))
        throw new IllegalArgumentException(s"$prettyName: null pool field")
      vb(i) = row.getLong(0)
      rel(i) = row.getDouble(1)
      val e = row.getArray(2)
      val d = e.numElements()
      val v = new Array[Float](d)
      var j = 0
      while (j < d) {
        if (e.isNullAt(j))
          throw new IllegalArgumentException(s"$prettyName: null embedding element")
        v(j) = e.getFloat(j)
        j += 1
      }
      eb(i) = v
      nb(i) = row.getDouble(3)
      i += 1
    }

    // cosine(d, s): the FloatDotProduct strict fold over the precomputed
    // norms — identical bits to the unrolled cc grid
    def cos(a: Int, b: Int): Double = {
      val x = eb(a); val y = eb(b)
      if (x.length != y.length)
        throw new IllegalArgumentException(
          s"$prettyName: embedding lengths differ (${x.length} vs ${y.length})")
      var acc = 0.0
      var j   = 0
      while (j < x.length) {
        acc += x(j).toDouble * y(j).toDouble
        j += 1
      }
      acc / (nb(a) * nb(b))
    }
    // candidate (s1, v1) beats (s2, v2) under desc(score), asc(vb) —
    // Double.compare is Spark's double sort order
    def beats(s1: Double, v1: Long, s2: Double, v2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && v1 < v2)
    }

    val picks    = math.min(k, n)
    val isSel    = new Array[Boolean](n)
    val selected = new Array[Int](picks)
    val out      = new Array[AnyRef](picks)
    var r = 0
    while (r < picks) {
      var best      = -1
      var bestScore = 0.0
      i = 0
      while (i < n) {
        if (!isSel(i)) {
          val score =
            if (r == 0) rel(i)
            else {
              var maxsim = cos(i, selected(0))
              var s = 1
              while (s <= r - 1) {
                val c = cos(i, selected(s))
                if (java.lang.Double.compare(c, maxsim) > 0) maxsim = c
                s += 1
              }
              lambda * rel(i) - mu * maxsim
            }
          if (best == -1 || beats(score, vb(i), bestScore, vb(best))) {
            best = i
            bestScore = score
          }
        }
        i += 1
      }
      selected(r) = best
      isSel(best) = true
      out(r) = new GenericInternalRow(
        Array[Any](vb(best), (r + 1).toLong, rel(best), bestScore))
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
