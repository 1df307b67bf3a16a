package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the float-vector dot product — the hot
  * inner loop of every cosine-similarity operator (dedup_embedding,
  * sim_topk, sim_ann_lsh).
  *
  * Why an Expression and not `zip_with` + `aggregate`: the higher-order
  * functions allocate a lambda frame per element and box the accumulator;
  * this expression compiles (doGenCode) to a tight primitive loop inside
  * whole-stage codegen. Semantics are identical — a strict left-to-right
  * accumulation in double — so results are bit-equal to the fold and the
  * DuckDB oracle stays exact. Mismatched array lengths raise (as DuckDB's
  * list_inner_product does) rather than silently truncating.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_f"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, array<float>), got ($l, $r)")
    }
  }

  /** A null ELEMENT yields a null result (DuckDB's list_inner_product
    * semantics) — getFloat on a null slot would silently read 0.0f and
    * produce a finite, wrong dot product.
    */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: array lengths differ (${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
    var acc = 0.0
    var i   = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_dot_f: array lengths differ (" + $x.numElements() + " vs " + $y.numElements() + ")");
         |}
         |int $n = $x.numElements();
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value}_acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {
  /** Idempotent per-session registration; returns a Column-level handle. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot_f",
      exprs => {
        require(exprs.length == 2,
          s"graft_dot_f requires exactly 2 arguments, got ${exprs.length}")
        FloatDotProduct(exprs.head, exprs(1))
      },
      "scala_udf")

  def dotF(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_dot_f", a, b)
  }
}
