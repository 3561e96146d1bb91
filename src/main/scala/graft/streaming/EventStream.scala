package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2-G): the batch operators'
  * streaming siblings. At scale these run exactly like the batch plans
  * — the watermark bounds state, `flatMapGroupsWithState` state lives
  * in the state store (RocksDB on a real cluster), and the shuffle is
  * on the group key only.
  */
object EventStream {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionAcc(start: Long, last: Long, n: Int)

  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Int)

  /** Sliding event-time window counts with a watermark: the streaming
    * form of q_hourly_stats. */
  def windowedCounts(events: DataFrame,
                     windowLen: String = "1 hour",
                     slide: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Streaming exact dedup: keep the first occurrence of each text
    * hash; duplicates arriving within the watermark horizon are
    * dropped, and per-hash state is evicted once the watermark passes
    * — bounded memory on an unbounded stream (duplicates farther
    * apart than the horizon can reappear; that's the documented
    * tradeoff). The streaming sibling of Dedup.exactSurvivors. */
  def streamingDedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_hash", xxhash64(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("text_hash")

  /** Streaming CTR — the reference pipeline (ClickThru.java) as a
    * stream-stream join. Impressions and clicks arrive as separate
    * streams; a click joins its impression within `joinWindow` (the
    * watermarks bound the join state, so it runs forever at constant
    * memory). Output: per-window (referrer, adId) CTR, complete once
    * the watermark closes the window.
    *
    * @param impressions streaming DF: (impressionId, referrer, adId, ts)
    * @param clicks      streaming DF: (impressionId, click_ts)
    */
  def streamingCtr(impressions: DataFrame, clicks: DataFrame,
                   joinWindow: String = "30 minutes",
                   aggWindow: String = "1 hour"): DataFrame = {
    val imp = impressions.withWatermark("ts", joinWindow)
    // Reference semantics collapse repeated clicks on one impression to
    // a single 0/1 flag (ClickThru.java:137-147) — dedup clicks within
    // the watermark horizon so the join emits at most one row per
    // impression-click match.
    val clk = clicks
      .withColumnRenamed("impressionId", "c_impressionId")
      .withWatermark("click_ts", joinWindow)
      .dropDuplicatesWithinWatermark("c_impressionId")
    val joined = imp.join(clk,
      expr(s"""
        c_impressionId = impressionId AND
        click_ts >= ts AND
        click_ts <= ts + INTERVAL $joinWindow"""),
      "leftOuter")
    joined
      .groupBy(window(col("ts"), aggWindow), col("referrer"), col("adId"))
      .agg(
        count(lit(1)).as("impressions"),
        count(col("c_impressionId")).as("clicks"),
        (count(col("c_impressionId")).cast("double") / count(lit(1))).as("ctr"))
  }

  /** Gap-based sessionization: the streaming form of q_sessionize.
    * Sessions close either when a later event exceeds the gap (emitted
    * immediately) or when the event-time watermark passes last+gap
    * (emitted via timeout) — so output is complete AND state is
    * bounded by #active-users. */
  def sessionize(spark: SparkSession, events: Dataset[Event],
                 gapMinutes: Int): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(gapMs) _)
  }

  private def toOut(userId: Long, a: SessionAcc): SessionOut =
    SessionOut(userId, new Timestamp(a.start), new Timestamp(a.last), a.n)

  private def update(gapMs: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessionAcc]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(toOut(userId, _)).iterator
      state.remove()
      out
    } else {
      // Batches are unordered — sort by event time within the group.
      val evs = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val closed = Seq.newBuilder[SessionOut]
      var acc = state.getOption
      for (e <- evs) {
        val t = e.ts.getTime
        acc = acc match {
          case Some(a) if t - a.last <= gapMs =>
            // a late (within-watermark) event may extend the session
            // backwards as well as forwards
            Some(a.copy(start = math.min(a.start, t),
              last = math.max(a.last, t), n = a.n + 1))
          case Some(a) =>
            closed += toOut(userId, a)
            Some(SessionAcc(t, t, 1))
          case None =>
            Some(SessionAcc(t, t, 1))
        }
      }
      acc.foreach { a =>
        state.update(a)
        state.setTimeoutTimestamp(a.last + gapMs)
      }
      closed.result().iterator
    }
  }
}
