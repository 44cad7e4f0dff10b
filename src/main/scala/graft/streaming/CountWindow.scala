package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming count windows (SURVEY W2 — `[size N [every S]]`, reference
  * fsql/Ast.scala:136, Flink `countWindow` semantics): per key, window j
  * covers the rows with 0-based arrival index in
  * [(j+1)·slide − size, (j+1)·slide − 1] — tumbling when slide = size
  * (the default), overlapping when slide < size (each row lands in up to
  * ⌈size/slide⌉ windows), gap when slide > size (rows between windows get
  * none).
  *
  * Spark has no built-in count window; batch mode uses row_number
  * chunking (Translator.applyWindow), which is illegal on streams. This is
  * the streaming equivalent: `groupByKey(partition key).
  * flatMapGroupsWithState` holding a per-key row counter. Rows are
  * assigned `w_id`(s) in arrival order per key and emitted immediately
  * (append mode); the tiny per-key state (one long) is the scale story —
  * state size is O(distinct keys), not O(rows).
  *
  * Determinism note (documented deviation): arrival order on an
  * unordered stream is not a total order; batch chunking orders by the
  * `on` field instead. Same windows when the stream arrives in `on`-field
  * order (the MemoryStream tests feed it so).
  */
object CountWindow {

  /** Window ids for the row with 0-based per-key index `r`:
    * j ∈ [⌊r/slide⌋, ⌊(r+size)/slide⌋ − 1] (empty when slide > size and
    * the row falls in a gap). With slide = size this is exactly ⌊r/size⌋. */
  private[graft] def windowIds(r: Long, size: Long, slide: Long): Seq[Long] =
    (r / slide) to ((r + size) / slide - 1)

  /** Assign per-key count-window ids to a streaming DataFrame.
    * Output = input columns + `w_id` (long); a row appears ONCE PER
    * window it belongs to (exactly once when slide = size). `keyCols`
    * empty → one global window sequence (single-key state: inherently
    * serial, same caveat as the batch global sort — document, don't
    * hide). */
  def assign(df: DataFrame, size: Int, keyCols: Seq[String],
             slide: Int = 0): DataFrame = {
    val s = if (slide <= 0) size else slide
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField("w_id", LongType, nullable = false))
    implicit val rowEnc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    implicit val stateEnc = ExpressionEncoder[Long]()
    implicit val keyEnc = ExpressionEncoder[String]()

    val keyIdx = keyCols.map(inSchema.fieldIndex)
    // Unambiguous composite key: null maps to a marker that no non-null
    // value can produce after escaping; values escape backslash and the
    // separator, so ("a b","c") vs ("a","b c"), null vs "null", and
    // separator-containing values can never collide.
    def enc(v: Any): String =
      if (v == null) "\u0000"
      else v.toString.replace("\\", "\\\\")
        .replace("\u0001", "\\s").replace("\u0000", "\\z")
    val keyed = df.groupByKey { r: Row =>
      keyIdx.map(i => enc(r.get(i))).mkString("\u0001")
    }
    keyed.flatMapGroupsWithState[Long, Row](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: String, rows: Iterator[Row], state: GroupState[Long]) =>
        var seen = state.getOption.getOrElse(0L)
        val out = rows.flatMap { r =>
          val ids = windowIds(seen, size, s)
          seen += 1
          ids.map(wid => Row.fromSeq(r.toSeq :+ wid))
        }.toVector // materialize before updating state
        state.update(seen)
        out.iterator
    }
  }
}
