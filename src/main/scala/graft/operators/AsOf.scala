package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** AS-OF join — for each left row, the most recent right row with
  * right.time <= left.time on the same keys (LEFT semantics: unmatched
  * left rows keep NULL payload). The staple of time-series feature
  * pipelines (trades ⨝ latest quote, events ⨝ latest model version).
  *
  * Spark has no ASOF operator; a naive range join explodes to
  * O(|L|·|R|/keys) comparisons. This is the scalable composition instead
  * (preference (a) of the custom-operator ladder — no custom SparkPlan
  * needed): UNION the tagged sides, ONE hash shuffle on the keys, one
  * per-key sort, and a running `last(payload, ignoreNulls)` window —
  * O((|L|+|R|) log) per key, no pair blowup, AQE-skew-splittable. At
  * equal timestamps the right row sorts first (tag 0 < 1), so a
  * same-instant right row matches — identical to DuckDB's inclusive
  * `ASOF JOIN ... ON l.t >= r.t`, which the gate uses as the oracle. */
object AsOf {

  /** `left` keeps all its columns; `right`'s non-key non-time columns are
    * appended (names must not clash with left's). */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           timeCol: String): DataFrame = {
    val payload = right.columns.filterNot(c =>
      keys.contains(c) || c == timeCol)
    val clash = payload.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"asof payload columns clash with left columns: ${clash.mkString(", ")}")
    val leftOnly = left.columns.filterNot(c => keys.contains(c) || c == timeCol)

    def typed(df: DataFrame, name: String): StructField =
      df.schema(df.columns.indexOf(name))

    // SQL join predicates are null-rejecting: right rows with a NULL key or
    // NULL time can never match — drop them up front (a NULL-keyed left row
    // then forms a right-free partition and keeps NULL payload).
    val rightClean = (keys :+ timeCol).foldLeft(right)((df, c) =>
      df.where(col(c).isNotNull))

    // The whole right payload travels as ONE struct, so the window picks the
    // complete latest right ROW — per-column fills would resurrect older
    // values for columns that are NULL on the latest row and stitch together
    // a row that never existed.
    val payloadType = StructType(payload.map(c => typed(right, c)))
    val lSide = left.select(
      (keys :+ timeCol).map(col) ++
        leftOnly.map(col) :+
        lit(null).cast(payloadType).as("__pay") :+
        lit(1).as("__tag"): _*)
    val rSide = rightClean.select(
      (keys :+ timeCol).map(col) ++
        leftOnly.map(c => lit(null).cast(typed(left, c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("__pay") :+
        lit(0).as("__tag"): _*)

    // Deterministic tiebreak when multiple right rows share (key, time):
    // order by the payload struct itself (field-wise comparison) so the
    // greatest payload wins reproducibly — without it, last() picks
    // whichever duplicate the shuffle happened to sort last and the join
    // can flake across runs. Structs containing maps are not orderable in
    // Spark; fall back to a stable 64-bit hash of the payload there.
    def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: StructType => s.fields.exists(f => containsMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => containsMap(a.elementType)
      case _ => false
    }
    val tie =
      if (containsMap(payloadType)) xxhash64(col("__pay")).asc_nulls_last
      else col("__pay").asc_nulls_last
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col("__tag"), tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lSide.unionByName(rSide)
      .withColumn("__pay", last(col("__pay"), ignoreNulls = true).over(w))
    filled.where(col("__tag") === 1)
      .select(left.columns.map(col) ++
        payload.map(c => col("__pay").getField(c).as(c)): _*)
  }
}
