package graft.pipelines

import graft.operators.{Cleanse, Dedup, Movement}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DataType

/**
 * Raw → staging pipeline: the composed operator chain of the reference's
 * pipelines/raw_to_staging.py, re-expressed as one lazy plan per output.
 *
 * Order mirrors the reference: column normalization → schema enforcement
 * → empty→null → timestamp parse + y/m/d derivation → coordinate
 * validity split (invalid rows quarantined, not dropped) → value clamps
 * → content-hash dedup → movement flag. Everything stays one declarative
 * plan — Catalyst fuses the projections and pushes the validity filter
 * into the scan.
 */
object RawToStaging {

  /** Pipeline configuration (reference defaults map to the AIS schema). */
  case class Config(
      columnMapping: Map[String, String],
      schema: Seq[(String, DataType)],
      tsCol: String,
      validCondition: DataFrame => Column,
      clampCaps: Map[String, Double],
      dedupCols: Seq[String],
      speedCol: String,
      speedThreshold: Double)

  /** (staged, quarantine): quarantine carries rows failing the validity
   * predicate; staged is deduped, clamped, flagged, y/m/d-partitionable. */
  def run(raw: DataFrame, cfg: Config): (DataFrame, DataFrame) = {
    val normalized = Cleanse.emptyToNull(
      Cleanse.enforceSchema(
        Cleanse.normalizeColumns(raw, cfg.columnMapping), cfg.schema))
    val parsed = Cleanse.parseTimestamps(normalized, cfg.tsCol)
    val (valid, quarantine) = Cleanse.validSplit(parsed, cfg.validCondition(parsed))
    val staged = Movement.flag(
      Dedup.exact(
        Cleanse.clampUpper(valid, cfg.clampCaps), cfg.dedupCols),
      cfg.speedCol, cfg.speedThreshold)
    (staged, quarantine)
  }
}
