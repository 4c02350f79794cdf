package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming windowed aggregation with watermarks (SURVEY §2.7 extension):
  * the same window() operator the batch q21 declares, run as a real
  * Structured Streaming query with event-time state and late-data
  * discipline. */
class StreamingWindowSpec extends GraftSuite {

  test("tumbling-window streaming agg with watermark drops late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Timestamp, Double)]
    val windowed = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("v")), 2).as("sv"))
      .select(col("window.start").as("ws"), col("cnt"), col("sv"))

    val q = windowed.writeStream
      .format("memory").queryName("win_agg").outputMode("append").start()
    try {
      def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      // Hour 10: three rows; hour 11: two rows.
      input.addData((ts(10, 0), 1.0), (ts(10, 20), 2.0), (ts(10, 40), 3.0))
      input.addData((ts(11, 5), 10.0), (ts(11, 10), 20.0))
      q.processAllAvailable()
      // Advance watermark far past hour 11 → both windows close and emit.
      input.addData((ts(14, 0), 0.5))
      q.processAllAvailable()
      // This event is 3+ hours late — behind the watermark — and must be
      // dropped, not reopen hour 10's window.
      input.addData((ts(10, 50), 99.0))
      q.processAllAvailable()
      input.addData((ts(15, 0), 0.5))
      q.processAllAvailable()

      val rows = spark.table("win_agg").orderBy("ws").collect()
      val byHour = rows.map(r => r.getTimestamp(0).toString -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(byHour("2024-01-01 10:00:00.0") == ((3L, 6.0)),
        s"hour 10 must close with 3 rows and no late 99.0: $byHour")
      assert(byHour("2024-01-01 11:00:00.0") == ((2L, 30.0)))
    } finally q.stop()
  }
}
