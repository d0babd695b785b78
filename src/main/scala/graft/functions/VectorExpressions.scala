package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the ANN hot loop: Σ aᵢ·bᵢ over two
  * `array<float>` columns with double accumulation in array order.
  *
  * Chosen over `aggregate(zip_with(...))` (which materializes a zipped
  * array and runs two higher-order-function interpreters per row) per the
  * custom-operator preference order: compose built-ins → custom
  * `Expression` with `doGenCode` → full plan nodes. The generated code is a
  * tight primitive loop that stays inside whole-stage codegen; identical
  * float→double summation order keeps results bit-equal to the
  * higher-order-function form (oracle parity preserved).
  */
case class FloatVecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float>, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column API for [[FloatVecDot]]. */
  def vec_dot(a: Column, b: Column): Column =
    GraftExpressionBridge.column(FloatVecDot(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))

  /** Register `vec_dot` / `vec_cosine` for SQL use
    * (`SELECT vec_dot(embedding, other) FROM …`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "vec_dot", exprs => FloatVecDot(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction(
      "vec_cosine", exprs => {
        def dot(a: org.apache.spark.sql.catalyst.expressions.Expression,
                b: org.apache.spark.sql.catalyst.expressions.Expression) =
          FloatVecDot(a, b)
        import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
        Divide(dot(exprs(0), exprs(1)),
          Multiply(Sqrt(dot(exprs(0), exprs(0))), Sqrt(dot(exprs(1), exprs(1)))))
      }, "scala_udf")
  }

  def vec_norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vec_dot(a, a))

  def vec_cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_norm(a) * vec_norm(b))
}
