package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Dimension building + lookup joins
 * (reference: transformations/dims/dim_country.py, dim_nav_status.py,
 * dim_vessel_type.py; utils/common_functions_raw.py:163 join_lookup).
 */
object Dims {

  /**
   * Union several code→name lookup frames into one dimension, tagging each
   * with its source, trimming names, and dropping duplicate keys
   * (reference: dim_country.py:18 build_dim_country — MID ∪ call-sign).
   * Each input is (frame, sourceTag); frames must share column names.
   */
  def buildUnionDim(parts: Seq[(DataFrame, String)], dedupKeys: Seq[String],
                    trimCols: Seq[String] = Nil): DataFrame = {
    val tagged = parts.map { case (df, tag) => df.withColumn("source", lit(tag)) }
    val unioned = tagged.reduce(_.unionByName(_))
    val trimmed = trimCols.foldLeft(unioned)((d, c) => d.withColumn(c, trim(col(c))))
    trimmed.dropDuplicates(dedupKeys)
  }

  /**
   * Map a code column to a descriptive value via a small lookup table
   * (reference: common_functions_raw.py:163 join_lookup). The lookup side
   * is explicitly broadcast: at 100 TB the fact side never shuffles.
   */
  def lookupJoin(df: DataFrame, lookup: DataFrame, joinCol: String,
                 lookupKey: String, lookupValue: String, outCol: String): DataFrame =
    df.join(
      broadcast(lookup.select(col(lookupKey).as(joinCol), col(lookupValue).as(outCol))),
      Seq(joinCol), "left")
}
