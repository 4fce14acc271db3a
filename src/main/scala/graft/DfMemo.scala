package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-aware memoization for the query packs' shared
  * intermediates. Plain `getOrElseUpdate` keyed on the scale dir
  * returns a plan bound to a STOPPED SparkContext if the session was
  * recreated without an interleaved releaseCaches() — every action on
  * it then throws "SparkContext has been shut down". The memo
  * validates the cached value's session identity and silently
  * rebuilds on mismatch (a stale entry's persisted blocks died with
  * its context, so there is nothing to unpersist). */
object DfMemo {

  /** Generic form: `sessionOf` extracts the session the cached value
    * is bound to (a Frame's df, a tuple's DataFrame member, …). */
  def getOrBuildVia[K, V](cache: scala.collection.mutable.Map[K, V],
                          key: K, session: SparkSession)
                         (sessionOf: V => SparkSession)
                         (build: => V): V =
    cache.synchronized {
      cache.get(key) match {
        case Some(v) if sessionOf(v) eq session => v
        case stale =>
          stale.foreach(_ => cache.remove(key))
          val v = build
          cache.update(key, v)
          v
      }
    }

  def getOrBuild[K](cache: scala.collection.mutable.Map[K, DataFrame],
                    key: K, session: SparkSession)
                   (build: => DataFrame): DataFrame =
    getOrBuildVia(cache, key, session)(_.sparkSession)(build)
}
