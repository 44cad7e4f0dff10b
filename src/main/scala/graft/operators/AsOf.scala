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
    val tieKey =
      if (containsMap(payloadType)) xxhash64(col("__pay"))
      else col("__pay")
    val union = lSide.unionByName(rSide)

    // --- parallelism: partition by (key, TIME BUCKET), not key alone ---
    // A window partitioned only by the user keys serializes each key into
    // one task; with low-cardinality keys (5 event types over a 100 TB
    // stream) the whole sort runs ~|keys|-way parallel (x25 measured 56×
    // for 100× rows). So the running-last is computed per (key, bucket),
    // then stitched with a per-bucket CARRY — the classic parallel-prefix
    // split: bucket-final values (each bucket's last right payload; the
    // final running value of the in-bucket window, so the heavy frame is
    // aggregated once, no re-scan) get their own tiny running-last over
    // bucket ids, and rows whose in-bucket window saw no right row take
    // the carry from earlier buckets. One driver-held min/max probe sizes
    // the buckets (2 scalars, same pattern as the quantile probes); time
    // types that don't map to a numeric axis fall back to the single
    // window.
    val timeAxis: Option[org.apache.spark.sql.Column] = {
      import org.apache.spark.sql.types._
      typed(left, timeCol).dataType match {
        case TimestampType    => Some(unix_micros(col(timeCol)))
        case TimestampNTZType => Some(unix_micros(col(timeCol).cast("timestamp")))
        case DateType         => Some(unix_micros(col(timeCol).cast("timestamp")))
        case _: NumericType   => Some(col(timeCol).cast("double"))
        case _                => None
      }
    }
    val targetBuckets =
      union.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt * 8
    // the carry machinery costs two extra stages + a 2-scalar probe —
    // pure overhead when the whole input sorts in seconds anyway. Gate on
    // the optimizer's size estimate (free, no job); `graft.asof.
    // forceBucketed=true` pins the bucketed path (tests, estimate misses)
    val smallInput =
      union.queryExecution.optimizedPlan.stats.sizeInBytes < (64L << 20) &&
        !union.sparkSession.conf.get("graft.asof.forceBucketed", "false").toBoolean
    val bucketExpr: Option[org.apache.spark.sql.Column] =
      (if (smallInput) None else timeAxis).flatMap { ax =>
      val b = union.agg(min(ax).cast("double"), max(ax).cast("double")).head()
      if (b.isNullAt(0) || b.isNullAt(1) || b.getDouble(1) <= b.getDouble(0)) None
      else {
        val mn = b.getDouble(0)
        val width = math.max((b.getDouble(1) - mn) / targetBuckets, 1e-9)
        // null time = "earliest" bucket: it can never see a right row
        // (rightClean drops null times) and no carry precedes it, so a
        // null-time left row keeps NULL payload — same as the nulls-first
        // position in the unbucketed window and as SQL `l.t >= r.t`
        Some(when(col(timeCol).isNull, lit(Long.MinValue))
          .otherwise(floor((ax.cast("double") - lit(mn)) / lit(width)).cast("long")))
      }
    }

    val filled = bucketExpr match {
      case None =>
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(col(timeCol), col("__tag"), tieKey.asc_nulls_last)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        union.withColumn("__payf", last(col("__pay"), ignoreNulls = true).over(w))
      case Some(bk) =>
        val step = union.withColumn("__ab", bk)
        val w1 = Window.partitionBy((keys :+ "__ab").map(col): _*)
          .orderBy(col(timeCol), col("__tag"), tieKey.asc_nulls_last)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val filled1 = step.withColumn("__pay1",
          last(col("__pay"), ignoreNulls = true).over(w1))
        // the row sorting LAST in the window order holds the bucket-final
        // running value; max_by over the same (time, tag, tie) key reads
        // it without another sort — ties only arise between right rows at
        // one instant, where window order and struct order agree
        val bucketLast = filled1
          .groupBy((keys :+ "__ab").map(col): _*)
          .agg(max_by(col("__pay1"),
            struct(col(timeCol), col("__tag"), tieKey)).as("__blast"))
        val wB = Window.partitionBy(keys.map(col): _*).orderBy(col("__ab"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val carry = bucketLast
          .withColumn("__carry", last(col("__blast"), ignoreNulls = true).over(wB))
          .select(keys.map(k => col(k).as(s"__ck_$k")) :+
            col("__ab").as("__cab") :+ col("__carry"): _*)
        // null-safe equi-join: NULL user keys form right-free partitions
        // and must survive the stitch (carry rows cover every (key,
        // bucket) of filled1 — it was derived from it)
        val cond = keys.map(k => filled1(k) <=> carry(s"__ck_$k"))
          .reduce(_ && _) && (filled1("__ab") === carry("__cab"))
        filled1.join(carry, cond, "inner")
          .withColumn("__payf", coalesce(col("__pay1"), col("__carry")))
    }
    filled.where(col("__tag") === 1)
      .select(left.columns.map(col) ++
        payload.map(c => col("__payf").getField(c).as(c)): _*)
  }
}
