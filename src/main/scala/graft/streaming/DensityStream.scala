package graft.streaming

import graft.operators.{Dedup, Similarity}
import graft.sources.StateStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * STREAMING DBSCAN* — the operational twin of
 * [[graft.operators.Similarity.dbscanStar]] (the density family's
 * missing service half, the [[NearDupStream]] contract verbatim): an
 * embedding feed clusters incrementally, and after every committed
 * micro-batch the cluster snapshot EQUALS batch DBSCAN* over all input
 * delivered so far. That exactness is possible online because DBSCAN*'s
 * state is monotone: a point is core iff ≥ k others sit within eps, and
 * neighbor counts only GROW as points arrive — so arrivals can promote
 * archive points to core and merge archive clusters, never the reverse,
 * and the maintained within-eps pair set is the whole truth.
 *
 * Per micro-batch (foreachBatch — radius joins and one CC, batch
 * constructs):
 *  1. assign each new vector to its nearest FROZEN coarse cell (the
 *     [[AnnStream]] frozen-codebook rule: centroids are the md5-lowest
 *     vectors of the first committed batch, so cell geometry never
 *     shifts under replay) and bound the radius search with the
 *     triangle inequality: point q can have a within-eps neighbor in
 *     cell c only if dist(q, cent_c) ≤ eps + radius_c, where radius_c
 *     (stored per cell, monotone max) covers every member — the IVF
 *     cells bound the search LOSSLESSLY, so the exact d² ≤ eps² filter
 *     only ever prunes;
 *  2. new within-eps pairs (batch×archive + batch×batch) append; the
 *     snapshot re-resolves with the same flat-cut rule as the batch
 *     operator — core = within-eps degree ≥ k, clusters = one
 *     [[Dedup.clusterPairs]] pass over {pairs with both endpoints
 *     core}, labels = component-min core id, non-core = NOISE;
 *  3. points/pairs/cells land as `b=<batchId>/...` with a commit marker
 *     LAST — one atomic visibility point; a committed batchId replays
 *     as a verbatim no-op, an uncommitted dir is a crashed attempt the
 *     retry deletes.
 *
 * Scale: state is the point set (id, vec, cell), the within-eps pair
 * graph (cluster-sized by definition — eps is chosen to separate), and
 * nCells cell rows; each batch pays batch-sized assignment + the
 * pruned radius join + one CC over the pair graph — never a full
 * archive re-pairing. The snapshot is a pure function of the delivered
 * batches.
 */
object DensityStream {

  def start(vecs: DataFrame, root: String, checkpointDir: String,
            idCol: String, vecCol: String,
            k: Int, eps2: Double, nCells: Int = 16,
            maxIter: Int = 20): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, root, idCol, vecCol,
          k, eps2, nCells, maxIter)
      }
      .start()

  /** The latest committed cluster snapshot: (id, cluster, is_core) with
   * [[graft.operators.Similarity.dbscanStar]]'s exact semantics over
   * every delivered point. */
  def clusterSnapshot(spark: SparkSession, root: String): DataFrame = {
    val dirs = committedDirs(spark, root)
    require(dirs.nonEmpty, s"no committed batches at $root")
    spark.read.parquet(s"${dirs.last}/clusters")
  }

  /** One micro-batch — factored out so replay/recovery is directly
   * testable (committed batchId → verbatim no-op). */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
                   idCol: String, vecCol: String,
                   k: Int, eps2: Double, nCells: Int,
                   maxIter: Int = 20): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val rootP = new org.apache.hadoop.fs.Path(root)
    val f = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bdir = new org.apache.hadoop.fs.Path(rootP, f"b=$batchId%012d")
    val marker = new org.apache.hadoop.fs.Path(bdir, StateStore.CommitMarker)
    if (f.exists(marker)) return // replayed batch: already committed
    if (f.exists(bdir)) f.delete(bdir, true) // crashed attempt
    if (batch.isEmpty) return

    val eps = math.sqrt(eps2)
    val pts = graft.CacheScope.persist(batch
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("sq", Similarity.dot(col("v"), col("v"))))
    val dirs = committedDirs(spark, root)

    // frozen centroids + monotone radii: (cell, cv, rad)
    val cellsPrev: Seq[(Int, Seq[Double], Double)] =
      if (dirs.isEmpty)
        pts.withColumn("h", md5(col("id").cast("string")))
          .orderBy("h", "id").limit(nCells)
          .select("v").as[Seq[Double]].collect().toSeq
          .zipWithIndex.map { case (v, i) => (i, v, 0.0) }
      else spark.read.parquet(s"${dirs.last}/cells")
        .as[(Int, Seq[Double], Double)].collect().toSeq
    val centDf = broadcast(cellsPrev
      .map { case (c, v, _) => (c, v) }.toDF("cell", "cv")
      .withColumn("c2", Similarity.dot(col("cv"), col("cv"))))

    // nearest-centroid assignment (argmin d², ties to the smallest cell
    // — the kmeansCentroids rule) + the point's own centroid distance
    val assigned = graft.CacheScope.persist(pts.crossJoin(centDf)
      .withColumn("cd2", col("sq") + col("c2") -
        lit(2.0) * Similarity.dot(col("v"), col("cv")))
      .groupBy("id")
      .agg(min_by(struct(col("cell"), col("cd2")),
        struct(col("cd2"), col("cell"))).as("a"),
        first(col("v")).as("v"), first(col("sq")).as("sq"))
      .select(col("id"), col("v"), col("sq"), col("a.cell").as("cell"),
        sqrt(greatest(col("a.cd2"), lit(0.0))).as("cdist")))

    // radii first extend over THIS batch (so batch×batch pruning is
    // covered too), then prune: q reaches cell c only within
    // cdist(q → cent_c) ≤ eps + rad_c
    val radNew = assigned.groupBy("cell").agg(max("cdist").as("r"))
      .as[(Int, Double)].collect().toMap
    val cellsNext = cellsPrev.map { case (c, v, r) =>
      (c, v, math.max(r, radNew.getOrElse(c, 0.0))) }
    val radDf = broadcast(cellsNext.map { case (c, _, r) => (c, r) }
      .toDF("cell_t", "rad"))
    val probes = assigned.select(col("id").as("id_q"), col("v").as("v_q"),
        col("sq").as("sq_q"))
      .crossJoin(centDf.select(col("cell").as("cell_t"), col("cv"), col("c2")))
      .join(radDf, "cell_t")
      .filter(sqrt(greatest(col("sq_q") + col("c2") -
        lit(2.0) * Similarity.dot(col("v_q"), col("cv")), lit(0.0)))
        <= lit(eps) + col("rad"))
      .select("id_q", "v_q", "sq_q", "cell_t")

    val archive =
      if (dirs.isEmpty) assigned.limit(0).select("id", "v", "sq", "cell")
      else spark.read.parquet(dirs.map(d => s"$d/points"): _*)
    val allPts = archive.select("id", "v", "sq", "cell")
      .unionByName(assigned.select("id", "v", "sq", "cell"))
    // exact d² filter on the pruned candidates; (lo, hi) dedup removes
    // the batch×batch double orientation
    val newPairs = allPts
      .join(probes.hint("shuffle_hash").withColumnRenamed("cell_t", "cell"),
        Seq("cell"))
      .filter(col("id") =!= col("id_q"))
      .withColumn("d2", col("sq") + col("sq_q") -
        lit(2.0) * Similarity.dot(col("v"), col("v_q")))
      .filter(col("d2") <= lit(eps2))
      .select(least(col("id"), col("id_q")).as("id_a"),
        greatest(col("id"), col("id_q")).as("id_b"))
      .distinct()

    val pdir = new org.apache.hadoop.fs.Path(bdir, "points")
    val prdir = new org.apache.hadoop.fs.Path(bdir, "pairs")
    assigned.select("id", "v", "sq", "cell").write.parquet(pdir.toString)
    newPairs.write.parquet(prdir.toString)
    cellsNext.toDF("cell", "cv", "rad")
      .coalesce(1).write.parquet(new org.apache.hadoop.fs.Path(bdir, "cells").toString)

    // snapshot: the flat-cut rule over ALL within-eps pairs so far
    val pairDirs = dirs.map(d => s"$d/pairs") :+ prdir.toString
    val allPairs = graft.CacheScope.persist(
      spark.read.parquet(pairDirs: _*).filter(col("id_a").isNotNull))
    val degrees = allPairs.select(col("id_a").as("id"))
      .union(allPairs.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("_deg"))
    val core = degrees.filter(col("_deg") >= k).select("id")
    val kept = allPairs
      .join(core.withColumnRenamed("id", "id_a"), Seq("id_a"), "left_semi")
      .join(core.withColumnRenamed("id", "id_b"), Seq("id_b"), "left_semi")
    val cc = Dedup.clusterPairs(kept, "id_a", "id_b", maxIter)
    val snapshot = allPts.select("id")
      .join(core.withColumn("_core", lit(true)), Seq("id"), "left")
      .join(cc.select(col("id"), col("cluster_id")), Seq("id"), "left")
      .select(col("id"),
        when(coalesce(col("_core"), lit(false)),
          coalesce(col("cluster_id"), col("id"))).as("cluster"),
        coalesce(col("_core"), lit(false)).as("is_core"))
    snapshot.write.parquet(new org.apache.hadoop.fs.Path(bdir, "clusters").toString)
    f.create(marker).close() // marker LAST: the batch's atomic commit
    allPairs.unpersist(false)
    assigned.unpersist(false)
    pts.unpersist(false)
  }

  private def committedDirs(spark: SparkSession, root: String): Seq[String] = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val f = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(rootP)) return Seq.empty
    f.listStatus(rootP).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith("b="))
      .filter(p => f.exists(new org.apache.hadoop.fs.Path(p, StateStore.CommitMarker)))
      .map(_.toString).sorted.toSeq
  }
}
