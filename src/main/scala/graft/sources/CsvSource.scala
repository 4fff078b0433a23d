package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/**
 * Schema-enforced CSV ingestion with a quarantine split
 * (reference: pipelines/raw_to_staging.py:60-86 — CSV read with enforced
 * schema; malformed rows must not kill a 100 TB backfill, they must land
 * in a quarantine table for inspection).
 *
 * Implemented as `text` scan + `from_csv` rather than the csv datasource:
 * the csv source refuses plans whose required schema is only the
 * internal corrupt-record column (so `quarantine.count()` would throw,
 * and the documented workaround is `.cache()` — a non-starter at 100 TB).
 * With `from_csv` the corrupt marker is an ordinary struct field: both
 * outputs derive from one text scan, no cache, full pushdown.
 */
object CsvSource {

  val CorruptCol = "_corrupt_record"

  /**
   * Read CSV at `path` against `schema`, returning (good, quarantine).
   * `good` has exactly the declared schema; `quarantine` carries the raw
   * line for replay/inspection.
   */
  def readWithQuarantine(spark: SparkSession, path: String,
                         schema: StructType,
                         header: Boolean = true): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(schema.fields :+ StructField(CorruptCol, StringType))
    val options = Map("mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> CorruptCol)
    val raw = spark.read.text(path)
    val headerLine = schema.fieldNames.mkString(",")
    val body = if (header) raw.filter(col("value") =!= headerLine) else raw
    val parsed = body.withColumn("_p", from_csv(col("value"), withCorrupt, options))
    val good = parsed
      .filter(col(s"_p.$CorruptCol").isNull)
      .select(schema.fieldNames.toSeq.map(f => col(s"_p.$f").as(f)): _*)
    val quarantine = parsed
      .filter(col(s"_p.$CorruptCol").isNotNull)
      .select(col("value").as("raw_line"))
    (good, quarantine)
  }
}
