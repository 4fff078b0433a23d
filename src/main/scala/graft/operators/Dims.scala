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
   * SCD Type-2 dimension build from a keyed change log: one validity
   * interval per OBSERVED ATTRIBUTE VERSION — [eff_start, eff_end),
   * open (null eff_end) for each key's current version, `is_current`
   * flagged — the standard lakehouse history table the reference's dim
   * loader rebuilds from snapshots. Consecutive change rows with
   * UNCHANGED attributes collapse into one interval (a heartbeat
   * re-stating the same attributes is not a new version).
   *
   * Plan: one (key, ts)-ordered window — lag to detect attribute
   * changes, a prefix-sum version id (the sessionize recipe), then a
   * partial-agg rollup taking each version's first ts and the NEXT
   * version's start via lead over the rolled-up (tiny) frame.
   */
  def scd2(changes: DataFrame, keyCols: Seq[String], tsCol: String,
           attrCols: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    require(attrCols.nonEmpty, "scd2 needs at least one attribute column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol).asc +: tieBreak.map(col(_).asc)): _*)
    val attrs = struct(attrCols.map(col): _*)
    // null-safe change detection: the first row's lag is a NULL struct
    // and a live attrs struct is never null, so !(attrs <=> lag) opens
    // the first version too; <=> handles null ATTRIBUTES inside
    val changed = when(!(attrs <=> lag(attrs, 1).over(w)), 1L).otherwise(0L)
    val versioned = changes
      .withColumn("_chg", changed)
      .withColumn("_ver", sum(col("_chg")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy((keyCols.map(col) :+ col("_ver")): _*)
      .agg(min(col(tsCol)).as("eff_start"),
        attrCols.map(c => first(col(c)).as(c)): _*)
    // order the succession by the VERSION id, not eff_start: two
    // adjacent versions can share a start second (a change at the same
    // timestamp, tie-broken upstream), and an eff_start-only order
    // would pair eff_ends nondeterministically
    val wv = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col("_ver").asc)
    versioned
      .withColumn("eff_end", lead(col("eff_start"), 1).over(wv))
      .withColumn("is_current", col("eff_end").isNull)
      .select((keyCols.map(col) ++ attrCols.map(col) :+
        col("eff_start") :+ col("eff_end") :+ col("is_current")): _*)
  }

  /**
   * Queryable-CURRENT view of an SCD2 change log: one row per key with
   * the OPEN version's attributes and its `eff_start` — what
   * [[scd2]].filter(is_current) returns, computed WITHOUT building the
   * history. `asOf` turns it into a point-in-time lookup (the version
   * active at that instant): rows after the cutoff are dropped before
   * version detection, so a change that happened later never bleeds
   * backwards.
   *
   * Plan: the same single (key, ts)-ordered window marks version
   * starts, then the heartbeats are DISCARDED and one partial-agg'd
   * `max_by` per key picks the latest version start — no prefix-sum,
   * no second window, no history rollup. The groupBy key equals the
   * window partition key, so the aggregation reuses the window's
   * exchange: one shuffle total.
   */
  def scd2Current(changes: DataFrame, keyCols: Seq[String], tsCol: String,
                  attrCols: Seq[String], tieBreak: Seq[String] = Nil,
                  asOf: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(attrCols.nonEmpty, "scd2Current needs at least one attribute column")
    val scoped = asOf.map(t => changes.filter(col(tsCol) <= t)).getOrElse(changes)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol).asc +: tieBreak.map(col(_).asc)): _*)
    val attrs = struct(attrCols.map(col): _*)
    // same null-safe change rule as scd2: the first row opens a version
    val changed = !(attrs <=> lag(attrs, 1).over(w))
    val ord = struct((col(tsCol) +: tieBreak.map(col)): _*)
    scoped
      .withColumn("_chg", changed)
      .filter(col("_chg"))
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(
        struct((attrCols.map(col) :+ col(tsCol).as("eff_start")): _*), ord).as("_cur"))
      .select((keyCols.map(col) ++ attrCols.map(c => col("_cur").getField(c).as(c)) :+
        col("_cur").getField("eff_start").as("eff_start")): _*)
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
