package graft.engine.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused dot product of two array<double> columns with EXACTLY the HOF
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, +)` semantics:
  * mismatched lengths → null (zip_with pads the shorter side with null),
  * null element → null, null input → null. One compiled loop instead of
  * per-element lambda dispatch.
  *
  * Exists (with [[ArrayNormSq]]) so [[graft.engine.rules.RewriteHofCosine]]
  * can swap fused kernels into the HOF cosine tree while leaving the
  * DIVISION to Spark's own `Divide` — preserving ANSI error / legacy null
  * zero-divisor behavior bit-for-bit, which a single fused cosine (NaN on
  * zero norms) cannot. */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires (array<double>, array<double>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var dot = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dot", this, classOf[ArrayDot].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = $ref.nullSafeEvalPublic($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $boxed).doubleValue(); }
       """.stripMargin
    })
  }

  /** Codegen entry point (nullSafeEval is protected). */
  def nullSafeEvalPublic(a: Any, b: Any): Any = nullSafeEval(a, b)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Fused sum-of-squares with EXACTLY the HOF
  * `aggregate(transform(a, x -> x * x), 0.0, +)` semantics (null element →
  * null, null input → null). See [[ArrayDot]] for why this exists. */
case class ArrayNormSq(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_norm_sq requires array<double>, got $t")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm_sq"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getDouble(i)
      s += v * v
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nsq", this, classOf[ArrayNormSq].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = $ref.nullSafeEvalPublic($a);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $boxed).doubleValue(); }
       """.stripMargin
    })
  }

  def nullSafeEvalPublic(a: Any): Any = nullSafeEval(a)

  override protected def withNewChildInternal(newChild: Expression): ArrayNormSq =
    copy(child = newChild)
}
