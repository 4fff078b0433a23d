package graft.streaming

import graft.sources.LakeWriter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming → lake sink: lands each micro-batch into the y/m/d-
 * partitioned lake via dynamic partition overwrite
 * (`foreachBatch` + [[graft.sources.LakeWriter.writePartitioned]]).
 *
 * Dynamic overwrite per batch makes replay IDEMPOTENT: re-processing a
 * batch (checkpoint recovery, backfill) rewrites exactly the partitions
 * it touches instead of appending duplicates — the streaming version of
 * the reference's incremental-window overwrite
 * (reference: pipelines/raw_to_staging.py:124-133).
 *
 * Caveat inherited from that semantics: a batch must carry a partition's
 * COMPLETE new content; use watermark-closed aggregations (e.g.
 * [[SessionStream]] output) or day-aligned triggers upstream.
 */
object LakeSink {

  def start(df: DataFrame, path: String, checkpointDir: String,
            partitionCols: Seq[String] = LakeWriter.DefaultPartitionCols,
            keyCol: Option[String] = None): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        LakeWriter.writePartitioned(batch, path, partitionCols, keyCol)
      }
      .start()

  /**
   * APPEND-mode streaming → lake sink — the Delta-shaped "append now,
   * optimize later" feed: each micro-batch's rows append as new files
   * in their partition dirs (no per-batch partition rewrite, so a batch
   * need NOT carry a partition's complete content — raw point feeds
   * qualify, where [[start]]'s dynamic-overwrite contract wants
   * watermark-closed aggregates). The cost is layout decay: every
   * batch adds small, unclustered files, and the operational loop pairs
   * this sink with [[graft.sources.LakeWriter.refreshStatsIndex]] +
   * [[graft.sources.LakeWriter.maintainClusteringPartitioned]] so depth
   * triggers a partition-scoped rewrite of exactly the appended days
   * (MaintenanceLoopSpec proves the loop end to end).
   */
  def startAppend(df: DataFrame, path: String, checkpointDir: String,
                  partitionCols: Seq[String] = LakeWriter.DefaultPartitionCols)
      : StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append")
          .partitionBy(partitionCols: _*)
          .parquet(path)
        graft.SharedStage.invalidate(path)
      }
      .start()
}
