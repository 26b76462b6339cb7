package graft.ext

import scala.collection.concurrent.TrieMap
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-aware DataFrame memoization for the persisted signature /
  * index tables.
  *
  * Two failure modes of a bare `TrieMap.getOrElseUpdate` keyed only by
  * (dir, params):
  *  - entries survive a SparkSession stop/restart and hand out
  *    DataFrames bound to a dead session (queries then fail);
  *  - two threads racing on the same key both evaluate the builder,
  *    and the loser's persisted DataFrame leaks (never unpersisted,
  *    never reachable).
  *
  * [[cached]] validates the entry against the CURRENT session
  * (`df.sparkSession eq spark` — rebuild on mismatch) and settles the
  * race with `putIfAbsent`, unpersisting the losing copy.
  */
private[graft] object Memo {

  def cached[K](cache: TrieMap[K, DataFrame], key: K, spark: SparkSession)(
      build: => DataFrame): DataFrame = {
    def alive(df: DataFrame): Boolean = df.sparkSession eq spark
    cache.get(key) match {
      case Some(df) if alive(df) =>
        // re-arm the materialization barrier if something external
        // (spark.catalog.clearCache(), the BenchSf1 per-sample
        // discipline) unpersisted the entry — serving a memoized
        // frame WITHOUT its persist silently re-runs the build once
        // per downstream consumer, the exact re-expansion the memo
        // exists to stop. Every builder here persists MEMORY_AND_DISK.
        if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
          try {
            df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            // re-arm can race a concurrent clearCaches(): it may have
            // unpersisted THIS df and removed the key between our get
            // and the persist above, leaving a persisted frame tracked
            // by no map. Re-check membership and roll back if evicted.
            if (!cache.get(key).exists(_ eq df))
              df.unpersist(blocking = false)
          } catch { case NonFatal(_) => () }
        }
        df
      case stale =>
        stale.foreach { old =>
          cache.remove(key)
          // the old entry may belong to a stopped session; unpersist is
          // best-effort hygiene, not correctness
          try old.unpersist(blocking = false) catch { case NonFatal(_) => () }
        }
        val built = build
        cache.putIfAbsent(key, built) match {
          case Some(winner) if alive(winner) =>
            try built.unpersist(blocking = false) catch { case NonFatal(_) => () }
            winner
          case Some(_) => // raced with a now-stale entry: replace it
            cache.update(key, built); built
          case None => built
        }
    }
  }
}
