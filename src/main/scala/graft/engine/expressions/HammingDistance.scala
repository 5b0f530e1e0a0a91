package graft.engine.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Hamming distance between two bit-packed array<long> signatures
  * (popcount of XOR, summed over words; shorter input zero-extends).
  *
  * This is the LSH candidate-join's post-match filter — it runs once per
  * bucket collision (millions of times), so it must stay inside whole-stage
  * codegen as a few xor+popcount instructions, not an interpreted
  * `aggregate(zip_with(...))` lambda chain.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_hamming requires (array<long>, array<long>), got ($l, $r)")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_hamming"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.max(nx, ny)
    var d = 0
    var i = 0
    while (i < n) {
      val xi = if (i < nx && !x.isNullAt(i)) x.getLong(i) else 0L
      val yi = if (i < ny && !y.isNullAt(i)) y.getLong(i) else 0L
      d += java.lang.Long.bitCount(xi ^ yi)
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $n = $nx > $ny ? $nx : $ny;
         |int $d = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xi = ($i < $nx && !$a.isNullAt($i)) ? $a.getLong($i) : 0L;
         |  long $yi = ($i < $ny && !$b.isNullAt($i)) ? $b.getLong($i) : 0L;
         |  $d += java.lang.Long.bitCount($xi ^ $yi);
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}
