package graft.core

import org.apache.spark.SparkContext

/** Deterministic Spark listener-bus drain for listener-based
  * measurements and assertions (ADVICE r11: fixed `Thread.sleep`
  * drains under-count on a loaded host). The bus exposes
  * `waitUntilEmpty()` as `private[spark]`, so it is reached via
  * reflection; any failure degrades to the old bounded sleep — a
  * measurement helper must never throw.
  */
object BusDrain {
  def drain(sc: SparkContext): Unit =
    try {
      val m = sc.getClass.getMethod("listenerBus")
      m.setAccessible(true)
      val bus = m.invoke(sc)
      val w = bus.getClass.getMethod("waitUntilEmpty")
      w.setAccessible(true)
      w.invoke(bus)
      ()
    } catch { case _: Exception => Thread.sleep(1000) }
}
