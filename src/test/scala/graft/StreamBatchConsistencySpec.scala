package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** The strongest streaming guarantee: the streaming sessionizer over
  * the real events table produces EXACTLY the batch sessionizer's
  * sessions once the watermark flushes everything. */
class StreamBatchConsistencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming windowed top-k == batch GroupTopK on sf0.001 events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = graft.sources.Tables.events(spark, TestSpark.sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().sortBy(_.ts.getTime)

    val input = MemoryStream[Event]
    val q = EventStream.streamingTopK(spark, input.toDS(), windowMinutes = 60, k = 3)
      .writeStream.format("memory").queryName("consistency_topk")
      .outputMode("append").start()
    try {
      val (first, second) = events.splitAt(events.length / 2)
      input.addData(first.toSeq); q.processAllAvailable()
      input.addData(second.toSeq); q.processAllAvailable()
      val far = events.last.ts.getTime + 10L * 24 * 3600 * 1000
      input.addData(Event(-1L, new Timestamp(far), -1L, "sentinel", 0.0))
      q.processAllAvailable()
      input.addData(Event(-2L, new Timestamp(far + 60000), -1L, "sentinel", 0.0))
      q.processAllAvailable()

      val streamed = spark.sql(
        "select window_start, dim, n, rk from consistency_topk where dim != 'sentinel'")
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getInt(3)))
        .toSet

      val win = 3600000L
      val counts = graft.sources.Tables.events(spark, TestSpark.sf)
        .withColumn("wstart", ((unix_micros($"ts") / 1000).cast("long") / win).cast("long") * win)
        .groupBy($"wstart", $"event_type")
        .agg(count(lit(1)).as("n"))
      val batch = graft.plans.GroupTopK.topK(counts, Seq("wstart"),
        Seq(graft.plans.GroupTopK.Sort("n", desc = true), graft.plans.GroupTopK.Sort("event_type")),
        k = 3)
        .collect()
        .map(r => (r.getAs[Long]("wstart"), r.getAs[String]("event_type"),
          r.getAs[Long]("n"), r.getAs[Int]("rk")))
        .toSet

      assert(streamed == batch,
        s"streaming top-k diverges: only-streamed=${(streamed -- batch).take(5)} " +
          s"only-batch=${(batch -- streamed).take(5)}")
    } finally q.stop()
  }

  test("streaming heavy hitters: MG guarantee holds per window vs batch counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = graft.sources.Tables.events(spark, TestSpark.sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().sortBy(_.ts.getTime)

    val k = 2 // tighter than the event_type cardinality → decrements happen
    val input = MemoryStream[Event]
    val q = EventStream.streamingHeavyHitters(spark, input.toDS(), windowMinutes = 60, k = k)
      .writeStream.format("memory").queryName("consistency_hh")
      .outputMode("append").start()
    try {
      input.addData(events.toSeq); q.processAllAvailable()
      val far = events.last.ts.getTime + 10L * 24 * 3600 * 1000
      input.addData(Event(-1L, new Timestamp(far), -1L, "sentinel", 0.0))
      q.processAllAvailable()
      input.addData(Event(-2L, new Timestamp(far + 60000), -1L, "sentinel", 0.0))
      q.processAllAvailable()

      val streamed = spark.sql(
        "select window_start, dim, lower_bound from consistency_hh where dim != 'sentinel'")
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1)) -> r.getLong(2)).toMap

      val win = 3600000L
      val exact = graft.sources.Tables.events(spark, TestSpark.sf)
        .withColumn("wstart", ((unix_micros($"ts") / 1000).cast("long") / win).cast("long") * win)
        .groupBy($"wstart", $"event_type").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val winTotals = exact.groupBy(_._1._1).view.mapValues(_.values.sum).toMap

      // recall: every dim above n_window/k must be in the streamed output
      val missed = exact.filter { case ((w, _), c) => c * k > winTotals(w) }
        .keySet.filterNot(streamed.contains)
      assert(missed.isEmpty, s"MG guarantee violated, missing: ${missed.take(5)}")
      // lower bounds never exceed exact counts
      val over = streamed.filter { case (key, lb) => lb > exact.getOrElse(key, 0L) }
      assert(over.isEmpty, s"lower bound exceeds exact count: ${over.take(5)}")
    } finally q.stop()
  }

  test("streaming sessionize == batch sessionize on sf0.001 events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = graft.sources.Tables.events(spark, TestSpark.sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().sortBy(_.ts.getTime)

    val input = MemoryStream[Event]
    val q = EventStream.sessionize(spark, input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("consistency_sess")
      .outputMode("append").start()
    try {
      val (first, second) = events.splitAt(events.length / 2)
      input.addData(first.toSeq); q.processAllAvailable()
      input.addData(second.toSeq); q.processAllAvailable()
      // two sentinel batches: advance the watermark, then fire timeouts
      val far = events.last.ts.getTime + 10L * 24 * 3600 * 1000
      input.addData(Event(-1L, new Timestamp(far), -1L, "x", 0.0))
      q.processAllAvailable()
      input.addData(Event(-2L, new Timestamp(far + 60000), -1L, "x", 0.0))
      q.processAllAvailable()

      val streamed = spark.sql(
        "select user_id, session_start, session_end, n_events from consistency_sess where user_id >= 0")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime, r.getInt(3).toLong))
        .toSet

      // batch expectation with the same ms-granularity gap rule
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val batch = graft.sources.Tables.events(spark, TestSpark.sf)
        .withColumn("tms", (unix_micros($"ts") / 1000).cast("long"))
        .withColumn("prev", lag($"tms", 1).over(w))
        .withColumn("new_s", when($"prev".isNull || $"tms" - $"prev" > 30 * 60000L, 1).otherwise(0))
        .withColumn("sid", sum($"new_s").over(wRun))
        .groupBy($"user_id", $"sid")
        .agg(min($"tms").as("s"), max($"tms").as("e"), count(lit(1)).as("n"))
        .select($"user_id", $"s", $"e", $"n")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

      assert(streamed == batch,
        s"stream-only=${(streamed -- batch).take(3)} batch-only=${(batch -- streamed).take(3)}")
    } finally q.stop()
  }
}
