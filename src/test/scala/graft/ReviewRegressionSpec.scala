package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.{AsOf, BloomJoin, Dedup}
import graft.plans.GroupTopK
import graft.streaming.EventStream

/** Regressions for the round-1 code-review findings. */
class ReviewRegressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bloom join works on string keys") {
    import spark.implicits._
    val big = (1 to 10000).map(i => (s"key_$i", i)).toDF("k", "v")
    val small = Seq(("key_5", "a"), ("key_17", "b")).toDF("k", "name")
    val got = BloomJoin.prunedJoin(big, small, "k")
    assert(got.count() == 2)
    assert(got.select($"k").as[String].collect().sorted.sameElements(Array("key_17", "key_5")))
  }

  test("streaming CTR does not double-count multi-click impressions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val T0 = 86400000L
    val impIn = MemoryStream[(String, String, String, Timestamp)]
    val clkIn = MemoryStream[(String, Timestamp)]
    def t(min: Long) = new Timestamp(T0 + min * 60000L)
    val q = EventStream.streamingCtr(
      impIn.toDF().toDF("impressionId", "referrer", "adId", "ts"),
      clkIn.toDF().toDF("impressionId", "click_ts"))
      .writeStream.format("memory").queryName("rr_ctr").outputMode("append").start()
    try {
      impIn.addData(("i1", "r1", "a1", t(0)))
      clkIn.addData(("i1", t(1)), ("i1", t(2)), ("i1", t(3))) // 3 clicks, 1 impression
      q.processAllAvailable()
      impIn.addData(("i8", "r8", "a8", t(500))); clkIn.addData(("i8", t(501)))
      q.processAllAvailable()
      impIn.addData(("i9", "r8", "a8", t(900))); clkIn.addData(("i9", t(901)))
      q.processAllAvailable()
      val r1 = spark.sql("select impressions, clicks, ctr from rr_ctr where referrer='r1'").collect()
      assert(r1.length == 1)
      assert(r1(0).getLong(0) == 1 && r1(0).getLong(1) == 1 && r1(0).getDouble(2) == 1.0,
        r1(0).toString)
    } finally q.stop()
  }

  test("streaming sessionize merges sessions bridged by a late event") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val T0 = 86400000L
    def ev(id: Long, min: Long) =
      EventStream.Event(id, new Timestamp(T0 + min * 60000L), 1L, "view", 1.0)
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(spark, input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("rr_bridge").outputMode("append").start()
    try {
      input.addData(ev(1, 0), ev(2, 50)) // 50min gap → looks like 2 sessions
      q.processAllAvailable()
      input.addData(ev(3, 25)) // late (wm=20) but bridges both into one
      q.processAllAvailable()
      input.addData(ev(4, 500)) // flush
      q.processAllAvailable()
      val s = spark.sql("select n_events from rr_bridge").collect()
      assert(s.length == 1 && s(0).getInt(0) == 3,
        s"bridged events must form ONE session: ${s.mkString(";")}")
    } finally q.stop()
  }

  test("streaming sessionize extends session start for late events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val T0 = 86400000L
    def ev(id: Long, min: Long) =
      EventStream.Event(id, new Timestamp(T0 + min * 60000L), 1L, "view", 1.0)
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(spark, input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("rr_sess").outputMode("append").start()
    try {
      input.addData(ev(1, 20))
      q.processAllAvailable()
      input.addData(ev(2, 10)) // late but within watermark → same session, earlier start
      q.processAllAvailable()
      input.addData(ev(3, 500)) // close it
      q.processAllAvailable()
      val s = spark.sql("select session_start, n_events from rr_sess").collect()
      assert(s.length == 1)
      assert(s(0).getTimestamp(0).getTime == T0 + 10 * 60000L, s(0).toString)
      assert(s(0).getInt(1) == 2)
    } finally q.stop()
  }

  test("invalid parameters fail fast") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      GroupTopK.topK(df, Seq("g"), Seq(GroupTopK.Sort("v")), k = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.minhashIndex(Seq((1L, "a b c")).toDF("doc_id", "text"), numPerms = 8, bands = 16)
    }
    intercept[IllegalArgumentException] {
      graft.plans.Sessionize.withSessionIds(
        Seq((1L, 2L)).toDF("user_id", "ts"), "user_id", "ts", 30) // ts not a timestamp
    }
    intercept[IllegalArgumentException] { // empty group cols
      GroupTopK.topK(df, Seq.empty, Seq(GroupTopK.Sort("v")), k = 1)
    }
    intercept[IllegalArgumentException] { // buffer-backed (binary) session key
      graft.plans.Sessionize.withSessionIds(
        Seq((Array[Byte](1), new Timestamp(0L))).toDF("user_id", "ts"), "user_id", "ts", 30)
    }
  }

  test("saltedJoin spreads byte-identical hot-key rows over several salts") {
    import spark.implicits._
    // 1000 identical rows: row-content hashing alone would give them all
    // ONE salt (the ADVICE.md finding); the per-row id term must spread them.
    val left = Seq.fill(1000)(("hot", 1L)).toDF("k", "v").repartition(8)
    val right = Seq(("hot", 9L)).toDF("k", "w")
    val joined = graft.operators.Skew.saltedJoin(left, right, "k", salts = 8)
    assert(joined.count() == 1000)
    val salts = left.withColumn("_salt",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.struct($"k", $"v",
              org.apache.spark.sql.functions.monotonically_increasing_id()),
          ), org.apache.spark.sql.functions.lit(8L)))
      .select("_salt").distinct().count()
    assert(salts > 1, s"identical rows collapsed to $salts salt(s)")
  }

  test("sql minhash_sig honors the numPerms argument") {
    graft.functions.Fns.registerAll(spark)
    val n = spark.sql("SELECT size(minhash_sig('a b c d e', 64)) AS n").collect()(0).getInt(0)
    assert(n == 64)
  }

  test("as-of join: null keys never match") {
    import spark.implicits._
    def t(min: Long) = new Timestamp(min * 60000L)
    val clicks = Seq((Some(1L), 100L, t(10)), (None, 101L, t(10)))
      .toDF("user_id", "click_id", "ts")
    val views = Seq((Some(1L), 1L, t(5)), (None, 2L, t(5)))
      .toDF("user_id", "event_id", "ts")
    val got = AsOf.join(clicks, views, "user_id", "ts", "ts", "event_id", "m")
      .collect().map(r => r.getAs[Long]("click_id") -> Option(r.getAs[java.lang.Long]("m"))).toMap
    assert(got(100L).contains(1L))
    assert(got(101L).isEmpty, s"null-key click must not match: ${got(101L)}")
  }
}
