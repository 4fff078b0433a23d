package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Speed-based movement classification
 * (reference: utils/common_functions_raw.py:152 derive_movement_flag,
 * utils/common_functions_curated.py:237 add_movement_state).
 */
object Movement {

  /** Binary 0/1 flag: 1 when speed > threshold. */
  def flag(df: DataFrame, speedCol: String, threshold: Double = 0.0,
           outCol: String = "movement_flag"): DataFrame =
    df.withColumn(outCol, when(col(speedCol) > threshold, 1).otherwise(0))

  /** Label: speed < threshold => "anchored", else "moving". Null speed is
   * defined as 0 (anchored) — made explicit with coalesce so the batch
   * operator, the trajectory sampler's bucket rule, and the SQL oracles
   * all agree on null semantics. */
  def state(df: DataFrame, speedCol: String, threshold: Double = 0.5,
            outCol: String = "movement_state"): DataFrame =
    df.withColumn(outCol,
      when(coalesce(col(speedCol), lit(0.0)) < threshold, lit("anchored"))
        .otherwise(lit("moving")))
}
