package graft.ops

import org.apache.spark.sql.DataFrame

/**
 * Small LRU for build-once index artifacts (IVF indexes, MinHash
 * signatures). Bounded and access-ordered: evicted entries drop their
 * references so Spark's ContextCleaner can free the localCheckpoint
 * blocks, instead of leaking them for the session lifetime. Keys embed the
 * FULL canonicalized analyzed plan of the source DataFrame (not its 32-bit
 * semanticHash), so two different corpora can never silently share an
 * index via a hash collision.
 */
private[ops] final class IndexCache[V](maxEntries: Int = 16) {
  private val m = new java.util.LinkedHashMap[String, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, V]): Boolean =
      size() > maxEntries
  }
  def get(key: String, build: => V): V = synchronized {
    val cur = m.get(key)
    if (cur != null) cur
    else { val v = build; m.put(key, v); v }
  }
}

private[ops] object IndexCache {
  /** Collision-proof cache key: session identity + canonicalized plan +
    * caller params. */
  def key(df: DataFrame, params: Any*): String =
    System.identityHashCode(df.sparkSession).toString + "|" +
      df.queryExecution.analyzed.canonicalized.toString + "|" +
      params.mkString("|")
}
