package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** O(log n) membership probe of a Long in a SORTED Array[Long] column.
  *
  * Why a native expression: `array_contains` is a LINEAR scan — fine for
  * tiny literal lists, quadratic blowup when the array is a model that
  * grows with the corpus. The boilerplate-removal stream filters
  * ([[graft.operators.Dedup.applyLineDedup]] / `applyParagraphDedup`)
  * probe every line/paragraph of every document against the broadcast
  * hot set: at the 100× sweep the hot set grew 53× and the scan turned a
  * linear operator into lines×|hot| work (x51 673 s at sf10). Binary
  * search bounds the probe at log₂|hot| long-compares per element — the
  * shape that survives any hot-set growth.
  *
  * The ARRAY MUST BE SORTED ASCENDING (callers build it with
  * `sort_array(collect_list(...))`); null array elements are not
  * supported (hash inputs are non-null by construction). Returns NULL if
  * either input is NULL, like `array_contains` on a null array.
  */
case class SortedArrayContains(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "sorted_array_contains"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, false), LongType) => TypeCheckResult.TypeCheckSuccess
    case (ArrayType(LongType, true), LongType) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a non-null-element array (got containsNull=true)")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, bigint), got (${l.simpleString}, ${r.simpleString})")
  }

  override def nullSafeEval(arr: Any, x: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val v = x.asInstanceOf[Long]
    var lo = 0
    var hi = a.numElements() - 1
    var found = false
    while (lo <= hi && !found) {
      val mid = (lo + hi) >>> 1
      val m = a.getLong(mid)
      if (m == v) found = true
      else if (m < v) lo = mid + 1
      else hi = mid - 1
    }
    found
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, x) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val m = ctx.freshName("m")
      s"""
         |int $lo = 0;
         |int $hi = $arr.numElements() - 1;
         |${ev.value} = false;
         |while ($lo <= $hi && !${ev.value}) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  long $m = $arr.getLong($mid);
         |  if ($m == $x) { ${ev.value} = true; }
         |  else if ($m < $x) { $lo = $mid + 1; }
         |  else { $hi = $mid - 1; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SortedArrayContains {
  def apply(arr: Column, x: Column): Column =
    GraftBridge.column(SortedArrayContains(
      GraftBridge.expression(arr), GraftBridge.expression(x)))
}
