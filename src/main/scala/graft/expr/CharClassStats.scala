package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass character-class counts for text-quality scoring:
  * `char_stats(s)` → array<int> [length, digits, alphas, whitespace].
  *
  * Replaces three `regexp_replace(s, class, "")` passes (each a full regex
  * scan + string rebuild) with a single fused loop — the text-stats hot
  * path at corpus scale. Class definitions match the regexes the DuckDB
  * oracle uses: digits `[0-9]`, alphas `[A-Za-z]`, whitespace Java `\s`
  * (space, \t, \n, \x0B, \f, \r).
  */
case class CharClassStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "char_stats"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_stats requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var d = 0; var a = 0; var w = 0; var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') d += 1
      else if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) a += 1
      else if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r') w += 1
      i += 1
    }
    new GenericArrayData(Array(n, d, a, w))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val a = ctx.freshName("a"); val w = ctx.freshName("w")
      val n = ctx.freshName("n")
      s"""
         |java.lang.String $s = $in.toString();
         |int $n = $s.length(); int $d = 0; int $a = 0; int $w = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  char $c = $s.charAt($i);
         |  if ($c >= '0' && $c <= '9') $d++;
         |  else if (($c >= 'A' && $c <= 'Z') || ($c >= 'a' && $c <= 'z')) $a++;
         |  else if ($c == ' ' || $c == '\\t' || $c == '\\n' || $c == '\\u000B' || $c == '\\f' || $c == '\\r') $w++;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new int[]{$n, $d, $a, $w});
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object CharClassStats {
  def apply(c: Column): Column = GraftBridge.column(CharClassStats(GraftBridge.expression(c)))
}
