package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for int8 scalar quantization (SQ8) —
  * the embedding STORAGE compression tier (SURVEY §7.2 M4): 4× smaller
  * than float32 (8× vs double) at near-lossless cosine recall, what a
  * serving layer keeps resident while PQ codes drive the pruned scan.
  *
  * Same rationale as [[VectorOps]]: the HOF formulation
  * (`transform`/`aggregate`/`zip_with`) is CodegenFallback with boxed
  * per-element lambdas; these emit primitive loops via `doGenCode`, so
  * quantize / integer-dot stay inside whole-stage codegen.
  *
  * Semantics are EXACTLY [[graft.operators.Similarity.quantizeInt8]]'s
  * long-standing contract (x45/x54 oracles): `qscale = 127 / max|v_i|`
  * (0 for zero vectors), `q_i = clamp(floor(v_i·qscale + 0.5), ±127)` —
  * floor(x+0.5) rather than round() because floor has identical
  * half-handling in every engine (DuckDB round() ties away from zero,
  * Java Math.round ties toward +∞; floor sidesteps both). Integer
  * accumulation is exact (long), so oracles match bit-for-bit.
  */
abstract class Int8VectorExpression extends BinaryExpression {
  protected def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected def readElem(e: Expression, arr: String, i: String): String =
    if (elemIsFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
  protected def readElemEval(e: Expression, arr: ArrayData, i: Int): Double =
    if (elemIsFloat(e)) arr.getFloat(i).toDouble else arr.getDouble(i)
}

/** 127 / max|v_i| — the inverse quantization scale; 0.0 for empty or
  * all-zero vectors. */
case class Int8Scale(child: Expression) extends UnaryExpression {
  override def prettyName: String = "int8_scale"
  override def dataType: DataType = DoubleType

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_scale requires array<float>/array<double>, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var mx = 0.0; var i = 0; val n = a.numElements()
    while (i < n) {
      val x = math.abs(if (isFloat) a.getFloat(i).toDouble else a.getDouble(i))
      if (x > mx) mx = x; i += 1
    }
    if (mx > 0.0) 127.0 / mx else 0.0
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val mx = ctx.freshName("mx"); val x = ctx.freshName("x")
      val read = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = java.lang.Math.abs($read);
         |  if ($x > $mx) $mx = $x;
         |}
         |${ev.value} = ($mx > 0.0) ? 127.0 / $mx : 0.0;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** clamp(floor(v_i·qscale + 0.5), ±127) as array<byte>; a non-positive
  * qscale yields all-zero codes (the zero-vector case). */
case class Int8Encode(left: Expression, right: Expression) extends Int8VectorExpression {
  override def prettyName: String = "int8_encode"
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_encode requires (array<float|double>, double), got " +
            s"${l.simpleString} and ${r.simpleString}")
    }

  override def nullSafeEval(v: Any, s: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val qscale = s.asInstanceOf[Double]
    val n = a.numElements()
    val out = new Array[Byte](n)
    if (qscale > 0.0) {
      var i = 0
      while (i < n) {
        val r = math.floor(readElemEval(left, a, i) * qscale + 0.5)
        out(i) = math.max(-127.0, math.min(127.0, r)).toByte
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out"); val r = ctx.freshName("r")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |if ($s > 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $r = java.lang.Math.floor(${readElem(left, a, i)} * $s + 0.5d);
         |    $out[$i] = (byte) java.lang.Math.max(-127.0d, java.lang.Math.min(127.0d, $r));
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** codes_i / qscale as array<double> — the dequantized vector (element
  * error ≤ 0.5/qscale); non-positive qscale dequantizes to zeros. */
case class Int8Decode(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "int8_decode"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_decode requires (array<byte>, double), got ${l.simpleString} and ${r.simpleString}")
    }

  override def nullSafeEval(v: Any, s: Any): Any = {
    val a = v.asInstanceOf[ArrayData]; val qscale = s.asInstanceOf[Double]
    val n = a.numElements(); val out = new Array[Double](n)
    if (qscale > 0.0) {
      var i = 0
      while (i < n) { out(i) = a.getByte(i) / qscale; i += 1 }
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |if ($s > 0.0) {
         |  for (int $i = 0; $i < $n; $i++) { $out[$i] = $a.getByte($i) / $s; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ a_i·b_i over the common prefix of two int8 code arrays — exact long
  * accumulation (max |term| is 127² = 16129; overflow would need ~5.7e14
  * dims). The serve-path hot loop: cosine over codes needs NO scales
  * (they cancel in dot/(‖a‖‖b‖)), so scoring is pure integer work. */
case class Int8Dot(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "int8_dot"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_dot requires two array<byte> inputs, got ${l.simpleString} and ${r.simpleString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L; var i = 0
    while (i < n) { acc += a.getByte(i).toLong * b.getByte(i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) $a.getByte($i) * $b.getByte($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object Int8Ops {
  def scale(v: Column): Column =
    GraftBridge.column(Int8Scale(GraftBridge.expression(v)))
  def encode(v: Column, qscale: Column): Column =
    GraftBridge.column(Int8Encode(GraftBridge.expression(v), GraftBridge.expression(qscale)))
  def decode(codes: Column, qscale: Column): Column =
    GraftBridge.column(Int8Decode(GraftBridge.expression(codes), GraftBridge.expression(qscale)))
  def dotCodes(a: Column, b: Column): Column =
    GraftBridge.column(Int8Dot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Cosine from codes alone: the per-vector scales cancel in
    * dot/(‖a‖‖b‖), so int8 cosine is one exact integer dot + two integer
    * norms — no dequantize on the serve path; 0.0 for zero codes. */
  def cosineFromCodes(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    val d = dotCodes(a, b).cast("double")
    val den = sqrt(dotCodes(a, a).cast("double")) * sqrt(dotCodes(b, b).cast("double"))
    when(den === 0.0, 0.0).otherwise(d / den)
  }

  /** Register the SQL names (`int8_scale(v)`, `int8_encode(v, s)`,
    * `int8_decode(c, s)`, `int8_dot(a, b)`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("int8_scale",
      es => { require(es.length == 1, "int8_scale(v)"); Int8Scale(es(0)) }, "built-in")
    reg.createOrReplaceTempFunction("int8_encode",
      es => { require(es.length == 2, "int8_encode(v, scale)"); Int8Encode(es(0), es(1)) }, "built-in")
    reg.createOrReplaceTempFunction("int8_decode",
      es => { require(es.length == 2, "int8_decode(codes, scale)"); Int8Decode(es(0), es(1)) }, "built-in")
    reg.createOrReplaceTempFunction("int8_dot",
      es => { require(es.length == 2, "int8_dot(a, b)"); Int8Dot(es(0), es(1)) }, "built-in")
  }
}
