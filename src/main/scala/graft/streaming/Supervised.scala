package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Restart supervision for checkpointed ingest streams: a foreachBatch
  * exception TERMINATES a StreamingQuery, and with nobody watching, one
  * transient flush error halts ingestion forever while the network edge
  * keeps accepting data. The checkpoint makes restart safe — the failed
  * batch replays (at-least-once). */
object Supervised {

  /** Run `startQuery` under a daemon supervisor that restarts it after a
    * termination-with-exception. Returns a handle whose close() stops
    * both the query and the supervisor. */
  def apply(name: String, startQuery: () => StreamingQuery,
      retryDelayMs: Long = 5000): AutoCloseable = {
    @volatile var closed = false
    @volatile var query = startQuery()
    val t = new Thread(() => {
      while (!closed) {
        try query.awaitTermination()
        catch { case e: Throwable =>
          System.err.println(s"[$name] terminated: ${e.getMessage}")
        }
        if (!closed) {
          Thread.sleep(retryDelayMs)
          if (!closed) {
            try query = startQuery()
            catch { case e: Throwable =>
              System.err.println(s"[$name] restart failed: ${e.getMessage}")
            }
          }
        }
      }
    }, s"graft-$name-supervisor")
    t.setDaemon(true)
    t.start()
    () => {
      closed = true
      try query.stop() catch { case _: Throwable => }
    }
  }
}
