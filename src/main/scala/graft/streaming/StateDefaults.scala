package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming state-store policy: default to RocksDB.
  *
  * Spark's out-of-the-box provider (HDFSBackedStateStoreProvider) keeps
  * every state row on the executor HEAP and snapshots whole maps; at the
  * target scale (stream-stream joins buffer four stores per partition,
  * dedup keeps a key per in-flight event) state routinely exceeds heap long
  * before it exceeds disk. RocksDBStateStoreProvider keeps state off-heap
  * with incremental checkpoints — the backend every large deployment runs —
  * so the engine's streaming entry points default to it and treat the
  * HDFS-backed provider as the opt-out (parity between the two is
  * spec-tested in `StreamingSpec`).
  */
object StateDefaults {

  val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Set RocksDB as the session's state-store provider unless the user
    * EXPLICITLY pinned one (sessionState.conf.contains sees only explicit
    * settings, never the built-in default — `conf.getOption` would report
    * the HDFS default as if the user had chosen it).
    */
  def ensureRocksDB(spark: SparkSession): Unit =
    if (!spark.sessionState.conf.contains(ProviderKey))
      spark.conf.set(ProviderKey, RocksDB)

  /** Run `body` with RocksDB PINNED, restoring any user-pinned provider
    * after. For operators that structurally require RocksDB —
    * `transformWithState` needs state-store column families, which the
    * heap-backed provider does not implement — where honoring an HDFS
    * opt-out would mean failing the query.
    */
  def withRocksDB[T](spark: SparkSession)(body: => T): T = {
    val pinned =
      if (spark.sessionState.conf.contains(ProviderKey))
        Some(spark.conf.get(ProviderKey))
      else None
    spark.conf.set(ProviderKey, RocksDB)
    try body
    finally pinned match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }
}
