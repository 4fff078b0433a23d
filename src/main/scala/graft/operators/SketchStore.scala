package graft.operators

import graft.sources.StateStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

/**
 * PERSISTED sketch-rollup algebra — the operational half of
 * [[Quality.sketchRollup]]/[[Quality.quantileRollup]]/
 * [[Quality.kmvSketch]]: per-(day, dims) HLL + KLL + KMV sketch rows
 * land in a [[StateStore]] table (keyed replace — a recomputed day
 * REPLACES its row), and month/quarter/ad-hoc rollups re-aggregate the
 * persisted blobs across SESSIONS without ever rescanning raw events.
 * This is the "raw events read once ever" reporting pattern: a 100 TB
 * fact table pays one scan per ingest day, and every later rollup is a
 * merge over a few KB of sketch per day-row. Retention/vacuum and
 * crash-safe versioning come from the store for free.
 *
 * Reference anchor: the reference's daily-rebuild analytics
 * (athena_analysis_curated.sql) recompute aggregates from curated rows
 * every run; the sketch store is the Spark-native incremental form.
 */
object SketchStore {

  /** 2^60 as a double — [[Quality]]'s 15-hex-char md5-prefix hash space. */
  private val HashSpace60 = 1152921504606846976.0d

  val SketchCols: Seq[String] = Seq("hll", "kll", "kmv", "n_rows")

  /**
   * One sketch row per (day, dims...): HLL of `distinctCol` (distinct
   * counts), KLL of `valueCol` (quantiles), KMV of `distinctCol`
   * (cross-corpus overlap / mergeable distinct), plus the exact row
   * count. ONE scan, one partial-agg'd groupBy.
   */
  def dailySketches(df: DataFrame, tsCol: String, distinctCol: String,
                    valueCol: String, dims: Seq[String] = Nil,
                    lgK: Int = 12, kllK: Int = 200,
                    kmvK: Int = 512): DataFrame = {
    import graft.expressions.{KllSketchAgg, KmvSketchAgg}
    val kll = GraftBridge.column(KllSketchAgg(
      GraftBridge.expression(col(valueCol).cast("double")), kllK)
      .toAggregateExpression())
    val kmv = GraftBridge.column(KmvSketchAgg(
      GraftBridge.expression(md5(col(distinctCol).cast("string"))), kmvK)
      .toAggregateExpression())
    df.withColumn("day", to_date(col(tsCol)))
      .groupBy((col("day") +: dims.map(col)): _*)
      .agg(hll_sketch_agg(col(distinctCol), lit(lgK)).as("hll"),
        kll.as("kll"), kmv.as("kmv"), count(lit(1)).as("n_rows"))
  }

  /**
   * Land daily sketch rows into the store as snapshot `version`
   * (keyed replace on (day, dims) — [[StateStore.merge]] touches only
   * the buckets the landed days hash to). Re-landing a committed
   * version is the store's explicit-maintenance action.
   */
  def land(spark: SparkSession, root: String, version: String,
           daily: DataFrame, dims: Seq[String] = Nil,
           overwriteCommitted: Boolean = false): Unit =
    StateStore.merge(spark, root, version, daily,
      keys = "day" +: dims, sumCols = Nil,
      replaceCols = SketchCols, overwriteCommitted = overwriteCommitted)

  /**
   * Land ONE micro-batch's sketch rows with UNION semantics — the
   * streaming path, where a day's rows arrive split across batches and
   * a replace-landing would clobber the day's earlier partials: HLL
   * blobs hll_union, KLL blobs pairwise-merge, KMV arrays take the
   * bottom-k of the union, row counts add. The batch id becomes the
   * store version, which makes the landing EXACTLY-ONCE under replay:
   * foreachBatch re-delivers a batch after a crash with the SAME id,
   * and [[StateStore.merge]] returns without touching a version that
   * already committed — the sketch algebra never double-counts.
   */
  def landBatch(spark: SparkSession, root: String, batchId: Long,
                batch: DataFrame, tsCol: String, distinctCol: String,
                valueCol: String, dims: Seq[String] = Nil,
                lgK: Int = 12, kllK: Int = 200, kmvK: Int = 512): Unit = {
    import graft.expressions.KllUnionPair
    val daily = dailySketches(batch, tsCol, distinctCol, valueCol, dims,
      lgK, kllK, kmvK)
    val kllPair = (s: org.apache.spark.sql.Column,
                   d: org.apache.spark.sql.Column) =>
      GraftBridge.column(KllUnionPair(GraftBridge.expression(s),
        GraftBridge.expression(d), kllK))
    StateStore.merge(spark, root, f"b$batchId%012d", daily,
      keys = "day" +: dims, sumCols = Seq("n_rows"),
      unionCols = Seq(
        "hll" -> ((s, d) => hll_union(s, d)),
        "kll" -> kllPair,
        "kmv" -> ((s, d) => slice(array_sort(array_union(s, d)), 1, kmvK))))
  }

  /**
   * Streaming sketch sink: every micro-batch lands through
   * [[landBatch]]. The store IS the checkpointable state — a restarted
   * query replays uncommitted batches and no-ops committed ones, so
   * [[rollup]] over the store equals the batch computation over
   * everything the stream has delivered (MaintenanceLoopSpec's sibling
   * gate in Round10Spec proves it, replay included).
   */
  def sink(df: DataFrame, root: String, checkpointDir: String,
           tsCol: String, distinctCol: String, valueCol: String,
           dims: Seq[String] = Nil, lgK: Int = 12, kllK: Int = 200,
           kmvK: Int = 512): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        landBatch(batch.sparkSession, root, id, batch, tsCol, distinctCol,
          valueCol, dims, lgK, kllK, kmvK)
      }
      .start()

  /**
   * Rollup STRICTLY from persisted sketches: no raw-event input at all.
   * `grain` is any date_trunc unit (month, quarter, year). Emits the
   * HLL distinct estimate, KLL quantile estimates, the KMV distinct
   * estimate, and the exact row count — one row per (grain, dims).
   */
  def rollup(spark: SparkSession, root: String,
             dims: Seq[String] = Nil, grain: String = "month",
             qs: Seq[Double] = Seq(0.5, 0.95), kllK: Int = 200,
             kmvK: Int = 512,
             before: Option[String] = None): DataFrame = {
    import graft.expressions.{KllMergeAgg, KllQuantile, KmvMergeAgg}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val st = StateStore.read(spark, root, before)
      .getOrElse(throw new IllegalStateException(s"empty sketch store at $root"))
    val kllMerge = GraftBridge.column(KllMergeAgg(
      GraftBridge.expression(col("kll")), kllK).toAggregateExpression())
    val kmvMerge = GraftBridge.column(KmvMergeAgg(
      GraftBridge.expression(col("kmv")), kmvK).toAggregateExpression())
    val g = st.withColumn("grain", date_trunc(grain, col("day")).cast("date"))
      .groupBy((col("grain") +: dims.map(col)): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll"), lit(false)))
          .as("distinct_est"),
        kllMerge.as("_kll"), kmvMerge.as("_kmv"),
        sum(col("n_rows")).as("n_rows"))
    val quants = qs.map { q =>
      GraftBridge.column(KllQuantile(GraftBridge.expression(col("_kll")),
        Literal(q))).as(s"p${math.round(q * 100)}_est")
    }
    // KMV estimator (Beyer et al. '07): (k-1)/U_(k) off the kth hash;
    // a sketch still below k IS the exact distinct set
    val nSk = size(col("_kmv"))
    val kth = element_at(col("_kmv"), -1)
    val frac = conv(substring(kth, 1, 15), 16, 10).cast("long") /
      lit(HashSpace60)
    val kmvEst = when(nSk === 0, lit(0L))
      .when(nSk < kmvK, nSk.cast("long"))
      .otherwise(floor((nSk - 1).cast("double") / frac + 0.5).cast("long"))
    g.select((col("grain") +: dims.map(col)) ++ Seq(
      col("distinct_est"), col("n_rows"), kmvEst.as("kmv_distinct_est")) ++
      quants: _*)
  }

  /**
   * Accuracy gate over the persisted path: [[rollup]] vs DIRECT
   * computation from raw events — the [[Quality.sketchRollup]] contract
   * (exact values + in-tolerance bits), proving the landed store serves
   * the same answers as a raw rescan. Spec harness, not a production
   * query: the production path reads ONLY the store.
   */
  def rollupGate(spark: SparkSession, root: String, raw: DataFrame,
                 tsCol: String, distinctCol: String, valueCol: String,
                 dims: Seq[String] = Nil,
                 qs: Seq[Double] = Seq(0.5, 0.95),
                 distinctTol: Double = 0.05, rankEps: Double = 0.05,
                 kmvK: Int = 512): DataFrame = {
    // The KMV gate must be sized to the SKETCH, not to a wish: the
    // bottom-k estimator's relative standard error is ~1/sqrt(k-2)
    // (4.4% at k=512), so a flat 5% band is a 1.13-sigma gate that
    // flaps on ~a quarter of healthy cells — the sf2 (20x) drive
    // caught exactly that (3 of 5 cells out). A 3-sigma k-derived
    // band still catches what the gate exists for (broken merge
    // logic is order-of-magnitude wrong), and never flaps.
    val kmvTol = math.max(distinctTol, 3.0 / math.sqrt(kmvK - 2.0))
    val rolled = rollup(spark, root, dims, qs = qs)
    val exactAggs =
      Seq(countDistinct(col(distinctCol)).as("n_exact"),
        count(lit(1)).as("n_rows_exact")) ++
      qs.flatMap { q =>
        val lo = math.max(q - rankEps, 0.0); val hi = math.min(q + rankEps, 1.0)
        val p = math.round(q * 100)
        Seq(expr(s"percentile($valueCol, $lo)").as(s"_p${p}_lo"),
          expr(s"percentile($valueCol, $hi)").as(s"_p${p}_hi"))
      }
    val direct = raw
      .withColumn("grain", date_trunc("month", col(tsCol)).cast("date"))
      .groupBy((col("grain") +: dims.map(col)): _*)
      .agg(exactAggs.head, exactAggs.tail: _*)
    val cond = ("grain" +: dims)
      .map(c => col(s"r.$c") <=> col(s"d.$c")).reduce(_ && _)
    rolled.alias("r").join(direct.alias("d"), cond)
      .select(("grain" +: dims).map(c => col(s"r.$c")) ++ Seq(
        col("n_exact"),
        (col("n_rows") === col("n_rows_exact")).as("rows_ok"),
        (abs(col("distinct_est") - col("n_exact")) <=
          greatest(col("n_exact").cast("double") * distinctTol, lit(1.0)))
          .as("hll_ok"),
        (abs(col("kmv_distinct_est") - col("n_exact")) <=
          greatest(col("n_exact").cast("double") * kmvTol, lit(1.0)))
          .as("kmv_ok")) ++
        qs.map { q =>
          val p = math.round(q * 100)
          (col(s"p${p}_est") >= col(s"_p${p}_lo") &&
            col(s"p${p}_est") <= col(s"_p${p}_hi")).as(s"p${p}_ok")
        }: _*)
  }
}
