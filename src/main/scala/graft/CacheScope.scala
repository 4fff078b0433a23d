package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import scala.util.DynamicVariable

/**
 * Scoped persistence for operators whose plans fan out (one intermediate
 * frame feeding several joins — e.g. the shingle sets in
 * [[operators.Dedup.minhashLsh]]).
 *
 * A lazy `DataFrame` API cannot unpersist inside the operator (the cache
 * is still needed when the caller finally runs an action), so graft
 * operators register their persists against the *dynamically enclosing*
 * scope instead: drivers wrap each query's action in
 * `CacheScope.scoped { ... }` and every intermediate cached inside is
 * released when the action completes. With no enclosing scope the frame
 * is persisted unmanaged (old `.cache()` behavior).
 *
 * MEMORY_AND_DISK (not MEMORY_ONLY): at 100 TB an intermediate that
 * outgrows executor memory must spill, not silently recompute.
 */
object CacheScope {

  private val current: DynamicVariable[Option[scala.collection.mutable.ArrayBuffer[DataFrame]]] =
    new DynamicVariable(None)

  /** Persist `df`, registering it for release at the end of the enclosing
   * [[scoped]] block (if any). A frame that is ALREADY persisted (e.g. a
   * [[SharedStage]] materialization passed into an operator that defends
   * its own fan-out) is returned untouched: re-registering it here would
   * hand its lifecycle to this scope and unpersist the owner's cache at
   * scope exit. */
  def persist(df: DataFrame): DataFrame = {
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      current.value.foreach(_ += df)
    }
    df
  }

  /**
   * Eager lineage cut for iterative loops (plans otherwise grow
   * k^rounds — see pagerank's journal comment). With `dir` set the cut
   * is a RELIABLE `checkpoint` into it: blocks survive executor loss,
   * which on a real cluster is what keeps a lost executor at round 9
   * from killing a 10-round job. With None it falls back to
   * `localCheckpoint` — blocks die with their executor, acceptable in
   * local mode and for cheap-to-rerun loops. `setCheckpointDir` appends
   * a per-context UUID subdir, so only set it when the requested root
   * isn't already the active one.
   */
  def lineageCut(df: DataFrame, dir: Option[String] = None): DataFrame = dir match {
    case Some(d) =>
      val sc = df.sparkSession.sparkContext
      if (!sc.getCheckpointDir.exists(_.contains(d))) sc.setCheckpointDir(d)
      df.checkpoint(true)
    case None => df.localCheckpoint(true)
  }

  /** Run `body` (typically: build a query plan and run its action), then
   * unpersist every frame persisted inside it. */
  def scoped[T](body: => T): T = {
    val frames = scala.collection.mutable.ArrayBuffer[DataFrame]()
    try current.withValue(Some(frames))(body)
    finally frames.foreach(_.unpersist(false))
  }
}

/**
 * Session-lifetime memoization for expensive intermediates SHARED BETWEEN
 * QUERIES — the counterpart to [[CacheScope]], whose caches die with each
 * query's action. The canonical user: the near-dup pair join
 * ([[operators.Dedup.ngramJaccard]]) feeds four downstream queries
 * (cluster / canonical survivor / profile / leak-free split); at 100 TB a
 * pipeline materializes pairs and cluster labels ONCE and every consumer
 * reads the materialization. This models that stage boundary in-session:
 * the first consumer computes and persists, the rest reuse.
 *
 * Keys embed the input dir and every parameter, so distinct corpora or
 * thresholds can never alias. Frames persist OUTSIDE any enclosing
 * [[CacheScope.scoped]] block by design — release is explicit via
 * [[clear]] (drivers call it between workload phases).
 */
object SharedStage {
  private val frames =
    scala.collection.concurrent.TrieMap[(String, String), DataFrame]()

  /** Memoized compute-and-persist of `key` for input `dir`. */
  def get(dir: String, key: String)(compute: => DataFrame): DataFrame =
    frames.getOrElseUpdate((dir, key), {
      val df = compute
      df.persist(StorageLevel.MEMORY_AND_DISK)
      df
    })

  /** Unpersist and forget every shared frame. */
  def clear(): Unit = {
    frames.values.foreach(_.unpersist(false))
    frames.clear()
  }
}
