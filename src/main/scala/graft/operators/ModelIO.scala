package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence for the single-column "hot set" model artifacts — the
  * broadcast-sized tables the streaming appliers probe (hot span gram
  * hashes, hot paragraph keys, benchmark shingle hashes). One parquet
  * directory per artifact, exactly one column with a pinned name and
  * type, so `CREATE MODEL` can validate the layout eagerly (the 'linear'
  * kind's discipline) and the registration content-hash covers the whole
  * set.
  *
  * These artifacts are MODEL-sized by contract (doc-freq-thresholded hot
  * sets / a benchmark's shingles — the appliers broadcast them), so a
  * save is one small parquet write, never a corpus landing.
  */
object ModelIO {

  /** Write `df`'s single value column to `path` as parquet under
    * `name` with `dataType`. Fails eagerly on a multi-column frame. */
  def saveColumnSet(df: DataFrame, path: String, name: String,
                    dataType: String): Unit = {
    require(df.columns.length == 1,
      s"expected a single-column set, got (${df.columns.mkString(", ")})")
    df.select(col(df.columns.head).cast(dataType).as(name))
      .write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveColumnSet]] artifact, validating the (name, type)
    * layout — a wrong-kind artifact fails here, at registration/first
    * use, with a message naming what was found. */
  def loadColumnSet(spark: SparkSession, path: String, name: String,
                    dataType: String): DataFrame = {
    val df = spark.read.parquet(path)
    require(df.columns.length == 1 &&
        df.columns.head.equalsIgnoreCase(name),
      s"expected a single '$name' column, found (${df.columns.mkString(", ")})")
    val t = df.schema.head.dataType.typeName
    require(t == dataType,
      s"expected column '$name' of type $dataType, found $t")
    df.select(col(df.columns.head).as(name))
  }
}
