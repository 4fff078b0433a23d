package graft.streaming

import graft.operators.StateOps
import graft.sources.StateStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * STREAMING INCREMENTAL VIEW MAINTENANCE — a live reporting table over
 * a keyed UPSERT stream, composing the store/CDF/IVM pieces into the
 * operational loop a real feed runs: per micro-batch
 *
 *   1. last-write-wins collapse within the batch (`orderCol` decides
 *      between two upserts of the same key in one trigger), then
 *      replace-merge into the DETAIL store as version `b<batchId>`;
 *   2. the batch's row-level change feed — exactly
 *      [[StateStore.changesBetween]] over the `b<id>`→`b<id+1>` span,
 *      so updates carry their pre-images;
 *   3. the feed's net per-group deltas ([[StateOps.ivmDelta]]: ±1 rows,
 *      ±value sums, ±1 non-null counts) ADDITIVELY merge into the AGG
 *      store as the same version — `n_rows`, `sum_c`, `nv_c` are plain
 *      additive numbers, so the aggregate store is a pure semigroup
 *      fold of delivered feeds, never a rescan of the detail store.
 *
 * Exactly-once rides the store's version idempotence (the StateSink
 * contract): a checkpoint-replayed batch re-merges version `b<id>` from
 * the pre-batch state (bit-identical no-op), recomputes the SAME feed
 * span, and the agg store's committed `b<id>` short-circuits — nothing
 * double-counts. At 100 TB the per-trigger cost is batch-sized on the
 * detail side (touched buckets only) and feed-sized on the agg side.
 *
 * [[readAggTable]] restores direct-aggregate semantics from the running
 * numbers: groups whose net `n_rows` reached 0 drop, sums whose `nv_c`
 * reached 0 read as NULL. Group columns must be non-null (a null group
 * key would not match itself across merge joins).
 */
object IvmStream {

  def start(rows: DataFrame, detailRoot: String, aggRoot: String,
            checkpointDir: String, keys: Seq[String], orderCol: String,
            groupCols: Seq[String], sumCols: Seq[String],
            nBuckets: Int = StateStore.DefaultBuckets): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, detailRoot, aggRoot, keys, orderCol,
          groupCols, sumCols, nBuckets)
      }
      .start()

  /** One micro-batch — factored public so replay recovery is directly
   * testable (same batchId → committed versions → verbatim no-op). */
  def processBatch(batch: DataFrame, batchId: Long, detailRoot: String,
                   aggRoot: String, keys: Seq[String], orderCol: String,
                   groupCols: Seq[String], sumCols: Seq[String],
                   nBuckets: Int = StateStore.DefaultBuckets): Unit = {
    if (batch.isEmpty) return // empty trigger: nothing to version
    val v = f"b$batchId%012d"
    val dataCols = batch.columns.filterNot(keys.contains).toSeq
    val upserts = StateOps.latestPerKey(batch, keys, Seq(orderCol))
    StateStore.merge(batch.sparkSession, detailRoot, v, upserts, keys,
      sumCols = Nil, replaceCols = dataCols, nBuckets = nBuckets)
    val feed = StateStore.changesBetween(batch.sparkSession, detailRoot,
      keys, Some(v), Some(f"b${batchId + 1}%012d"))
    StateStore.merge(batch.sparkSession, aggRoot, v,
      StateOps.ivmDelta(feed, groupCols, sumCols), groupCols,
      sumCols = "n_rows" +: sumCols.flatMap(c => Seq(s"sum_$c", s"nv_$c")),
      nBuckets = nBuckets)
  }

  /** The maintained aggregate with direct-aggregate semantics restored
   * (see class doc). Column set ≡ [[StateOps.aggTable]]'s. */
  def readAggTable(spark: SparkSession, aggRoot: String,
                   groupCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    val raw = StateStore.read(spark, aggRoot)
      .getOrElse(throw new IllegalStateException(s"no agg store at $aggRoot"))
    raw.filter(col("n_rows") > 0)
      .select(groupCols.map(col) ++ Seq(col("n_rows")) ++
        sumCols.flatMap(c => Seq(
          when(col(s"nv_$c") === 0, lit(null)).otherwise(col(s"sum_$c"))
            .as(s"sum_$c"),
          col(s"nv_$c"))): _*)
  }
}
