package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.{col, to_json}
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Multi-format file sinks (SURVEY.md §2.7 Q48).
  *
  * The reference dispatches on file extension — json, csv, tsv, parquet
  * (+ pickle/xlsx, single-node niceties out of scope for a distributed
  * engine) — with per-entity naming: facts `{name}-{start}-{stop}.{ext}`,
  * dims `dict-{name}.{ext}` (`ET-ETL-DWH-PY312/ETL/Load.py:186-224`).
  * The reference's extension-dispatch bugs (csv→to_excel etc.,
  * Load.py:214-220) are intent-corrected here, per SURVEY.md §7.4.
  *
  * All writers are directory-atomic (Spark commit protocol: _SUCCESS
  * marker), replacing the reference's per-connection transaction
  * commit/rollback (utils.py:222-239).
  */
object Sinks {

  def factFileName(name: String, start: String, stop: String): String =
    s"$name-$start-$stop"
  def dimFileName(name: String): String = s"dict-$name"

  /** Text sinks can't hold nested values — JSON-encode struct/array/map
    * columns (the reference's pandas `to_csv` stringified nested dicts
    * the same way, just less parseably).
    */
  def flattenForText(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType => to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Bucketed catalog table: co-locates rows by join key so repeated
    * large-to-large joins/aggregations on `bucketCols` run shuffle-free
    * (both sides pre-hashed into the same bucket count). This is the
    * persistent-layout answer to the reference's repeated
    * sessions⨝children joins — at 100 TB, bucketing the fact tables by
    * session id removes the dominant exchange from every child join.
    * Sorted within buckets so sort-merge joins skip the sort too.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    nBuckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }

  def write(df: DataFrame, path: String, format: String,
            mode: SaveMode = SaveMode.Overwrite): Unit = format match {
    case "parquet" => df.write.mode(mode).parquet(path)
    case "json" => df.write.mode(mode).json(path)
    case "csv" =>
      flattenForText(df).write.mode(mode).option("header", "true").csv(path)
    case "tsv" =>
      flattenForText(df).write.mode(mode).option("header", "true").option("sep", "\t").csv(path)
    case other =>
      throw new IllegalArgumentException(
        s"Unsupported sink format: $other (reference's pickle/xlsx/looker are out of scope)")
  }
}
