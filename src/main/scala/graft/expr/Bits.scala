package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** IEEE-754 order-preserving double→long mapping (the Lucene
  * `NumericUtils.doubleToSortableLong` trick): raw sign-magnitude bits
  * with the magnitude bits flipped for negatives, so SIGNED long order
  * equals `java.lang.Double.compare` order (-0.0 < +0.0, NaN last).
  *
  * Why a native expression: it turns ORDER-statistic problems on doubles
  * into the same problems on longs — [[graft.operators.Quantiles]] runs
  * its exact histogram-refinement selection on the mapped column and maps
  * the answer back, giving exact double quantiles in ≤6 narrow scans with
  * NO global sort. Spark has no builtin exposing the raw bits, and the
  * map must run per-row inside the scan, so it follows the VectorOps
  * pattern: codegen'd primitive arithmetic, no UDF boxing.
  */
case class DoubleSortableBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "double_sortable_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a float/double input, got ${other.simpleString}")
  }

  private def toDouble(v: Any): Double = child.dataType match {
    case FloatType => v.asInstanceOf[Float].toDouble
    case _         => v.asInstanceOf[Double]
  }

  override def nullSafeEval(input: Any): Any =
    DoubleSortableBits.forward(toDouble(input))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val b = ctx.freshName("b")
      s"""
         |long $b = java.lang.Double.doubleToLongBits((double) $x);
         |${ev.value} = $b ^ (($b >> 63) & 0x7fffffffffffffffL);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DoubleSortableBits {
  /** Monotone map: signed-long order of the result = Double.compare order. */
  def forward(x: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(x)
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  /** Inverse of [[forward]] (the flip is an involution: the sign bit is
    * untouched, so the same mask reconstructs the raw bits). */
  def inverse(s: Long): Double =
    java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & 0x7fffffffffffffffL))

  def column(c: Column): Column =
    GraftBridge.column(DoubleSortableBits(GraftBridge.expression(c)))
}
