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
   * [[scoped]] block (if any). */
  def persist(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    current.value.foreach(_ += df)
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
