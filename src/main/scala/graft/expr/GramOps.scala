package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for character k-gram hashing with
  * optional winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03) — the hot
  * kernel of the exact-substring dedup family.
  *
  * Why native (the Int8Ops rationale, but worse): the SQL formulation
  * `transform(sequence(1, len-k+1), p -> xxhash64(substring(t, p, k)))`
  * is interpreted (HOFs never codegen), allocates a boxed substring per
  * gram, and — measured via executor stacks at sf10 — CollapseProject
  * inlines the `lower(trim(text))` normalization INTO the lambda, so
  * every gram re-normalizes the whole document: O(len²) per doc. These
  * expressions evaluate their child exactly once per row and run an
  * allocation-light single pass: char→byte offset table, XXH64 per gram
  * over the raw bytes (seed 42 on the UTF-8 bytes — bit-identical to
  * `xxhash64(substring(t, p, k))`), and an O(L) monotonic-deque sliding
  * min for winnowing (the SQL form sliced two O(w) arrays per window).
  *
  * Winnowing selection contract (shared with the SQL spec the unit
  * tests pin): for every window of `w` consecutive gram hashes, the
  * LEFTMOST minimum is selected; windows shorter than `w` (doc with
  * fewer than `w` grams) collapse to one whole-array window. `w <= 1`
  * selects every gram. Selection depends only on content, so two copies
  * of a span select the same grams — the basis of the
  * spans >= k + w - 1 recall guarantee. */
object GramOps {

  /** Doc-DISTINCT (winnowed) gram hashes: array<long>, sorted. */
  def gramHashSet(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(GramHashSet(GraftBridge.expression(text), k, w))

  /** Winnowed grams WITH positions: array<struct<p:int, gh:long>>,
    * `p` 1-based (the substring convention), ascending. */
  def gramWinnow(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(GramWinnow(GraftBridge.expression(text), k, w))

  /** (gram hashes, selected flags or null for select-all). Shared core:
    * null `text` never reaches here (nullSafeEval). */
  private def hashesAndSelection(s: UTF8String, k: Int,
                                 w: Int): (Array[Long], Array[Boolean]) = {
    val nChars = s.numChars()
    val L = nChars - k + 1
    if (L <= 0) return (Array.emptyLongArray, null)
    val b = s.getBytes
    // char index -> byte offset (UTF-8 aware; ASCII fast path implicit)
    val offs = new Array[Int](nChars + 1)
    var i = 0; var ci = 0
    while (i < b.length && ci < nChars) {
      offs(ci) = i; ci += 1
      i += UTF8String.numBytesForFirstByte(b(i))
    }
    offs(nChars) = b.length
    val hashes = new Array[Long](L)
    var p = 0
    while (p < L) {
      hashes(p) = XXH64.hashUnsafeBytes(b,
        Platform.BYTE_ARRAY_OFFSET + offs(p), offs(p + k) - offs(p), 42L)
      p += 1
    }
    if (w <= 1) return (hashes, null)
    // monotonic deque sliding min, strict '>' pops so ties keep the
    // EARLIEST index — leftmost-min per window, the SQL array_position
    // contract
    val wEff = math.min(w, L)
    val sel = new Array[Boolean](L)
    val dq = new Array[Int](L)
    var head = 0; var tail = 0; var idx = 0
    while (idx < L) {
      while (tail > head && hashes(dq(tail - 1)) > hashes(idx)) tail -= 1
      dq(tail) = idx; tail += 1
      if (dq(head) <= idx - wEff) head += 1
      if (idx >= wEff - 1) sel(dq(head)) = true
      idx += 1
    }
    (hashes, sel)
  }

  // public: codegen calls this via the static forwarder, which Scala
  // only emits for PUBLIC object methods (Janino cannot see GramOps$)
  def computeSet(s: UTF8String, k: Int, w: Int): ArrayData = {
    val (hashes, sel) = hashesAndSelection(s, k, w)
    if (hashes.isEmpty) return UnsafeArrayData.fromPrimitiveArray(hashes)
    val cand =
      if (sel == null) java.util.Arrays.copyOf(hashes, hashes.length)
      else {
        var n = 0; var i = 0
        while (i < sel.length) { if (sel(i)) n += 1; i += 1 }
        val out = new Array[Long](n)
        var o = 0; i = 0
        while (i < sel.length) { if (sel(i)) { out(o) = hashes(i); o += 1 }; i += 1 }
        out
      }
    java.util.Arrays.sort(cand)
    var m = 0; var i = 1
    while (i < cand.length) {
      if (cand(i) != cand(m)) { m += 1; cand(m) = cand(i) }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(cand, m + 1))
  }

  def computeWinnow(s: UTF8String, k: Int, w: Int): ArrayData = {
    val (hashes, sel) = hashesAndSelection(s, k, w)
    if (hashes.isEmpty) return new GenericArrayData(Array.empty[Any])
    val rows = new scala.collection.mutable.ArrayBuffer[Any](
      if (sel == null) hashes.length else 16)
    var i = 0
    while (i < hashes.length) {
      if (sel == null || sel(i)) rows += InternalRow(i + 1, hashes(i))
      i += 1
    }
    new GenericArrayData(rows.toArray)
  }
}

abstract class GramExpression extends UnaryExpression {
  def k: Int
  def w: Int
  // parameter checks live HERE, not in the constructor body: Java
  // task-side deserialization instantiates before fields are populated,
  // and a body-level require reads k = 0 and throws InvalidClassException
  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1) TypeCheckResult.TypeCheckFailure(s"k must be >= 1, got $k")
    else if (w < 1) TypeCheckResult.TypeCheckFailure(s"winnow window must be >= 1, got $w")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got ${other.simpleString}")
    }
}

/** array<long> of the doc-distinct (winnowed) k-gram hashes. */
case class GramHashSet(child: Expression, k: Int, w: Int) extends GramExpression {
  override def prettyName: String = "gram_hash_set"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GramOps.computeSet(v.asInstanceOf[UTF8String], k, w)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.GramOps.computeSet($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): GramHashSet =
    copy(child = newChild)
}

/** array<struct<p:int, gh:long>> of winnow-selected grams, p 1-based
  * ascending — the position-carrying form the removal pipeline explodes. */
case class GramWinnow(child: Expression, k: Int, w: Int) extends GramExpression {
  override def prettyName: String = "gram_winnow"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("p", IntegerType, nullable = false),
    StructField("gh", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GramOps.computeWinnow(v.asInstanceOf[UTF8String], k, w)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.GramOps.computeWinnow($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): GramWinnow =
    copy(child = newChild)
}
