package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("saltedJoin equals the plain join on a skewed dataset") {
    import spark.implicits._
    // 90% of rows share one key — the classic hot-key shape
    val left = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "payload")
    val right = (1L to 10000L).map(k => (k, s"dim_$k")).toDF("k", "attr")
    val plain = left.join(right, "k")
    val salted = Skew.saltedJoin(left, right, "k", salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedAgg two-phase sum equals the direct aggregation") {
    import spark.implicits._
    val df = (1 to 10000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 50}", i.toLong))
      .toDF("k", "v")
    val direct = df.groupBy($"k").agg(sum($"v").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedAgg(df, "k", salts = 8,
      partial = Map("v" -> "sum"), merge = Map("sum(v)" -> "sum"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("salted join bounds max-task shuffle input under a planted hot key") {
    import spark.implicits._
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}
    val sc = spark.sparkContext

    /** Max per-task shuffle-read records over the stages of one tagged
      * job group — the task-level evidence that salting actually
      * spreads a hot key, not just that the result matches. */
    final class MaxTaskShuffleRead(tag: String) extends SparkListener {
      private val stages = scala.collection.mutable.Set[Int]()
      @volatile var maxRecords = 0L
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        synchronized {
          val g = Option(s.properties).map(_.getProperty("spark.jobGroup.id")).orNull
          if (g == tag) stages += s.stageInfo.stageId
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        if (stages.contains(t.stageId) && t.taskMetrics != null)
          maxRecords = math.max(maxRecords,
            t.taskMetrics.shuffleReadMetrics.recordsRead)
      }
    }
    def maxTask(tag: String)(body: => Unit): Long = {
      val l = new MaxTaskShuffleRead(tag)
      sc.addSparkListener(l)
      try {
        sc.setJobGroup(tag, tag)
        body
        org.apache.spark.graft.ListenerBusWait.drain(sc)
        l.maxRecords
      } finally { sc.clearJobGroup(); sc.removeSparkListener(l) }
    }

    // one hot key carries 50% of 200k rows (the "single referrer at 20%
    // of events" shape, exaggerated so the skew dominates the uniform
    // share even at 4 shuffle partitions)
    val left = (1 to 200000)
      .map(i => (if (i % 2 == 0) 7L else (i % 1000).toLong, i))
      .toDF("k", "payload")
    val right = (0L to 1000L).map(k => (k, s"dim_$k")).toDF("k", "attr")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE coalescing folds this MB-scale shuffle into one task either
    // way, hiding the key distribution the test measures
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val plainMax = maxTask("skew-plain") {
        left.join(right, "k").write.format("noop").mode("overwrite").save()
      }
      val saltedMax = maxTask("skew-salted") {
        Skew.saltedJoin(left, right, "k", salts = 8)
          .write.format("noop").mode("overwrite").save()
      }
      // plain: the hot key's 100k rows land whole in one join task
      assert(plainMax >= 100000L,
        s"expected the hot key concentrated in one task, got max=$plainMax")
      // salted: the hot key spreads over 8 salt groups — the max task
      // must drop well below the hot-key row count
      assert(saltedMax <= plainMax / 2,
        s"salting did not bound the max task: salted=$saltedMax plain=$plainMax")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
  }

  test("salted rows actually spread across salt values") {
    import spark.implicits._
    val left = (1 to 1000).map(i => (7L, i)).toDF("k", "payload")
    val right = Seq((7L, "x")).toDF("k", "attr")
    // count distinct salts used internally by re-deriving them
    val salts = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(8L)))
      .select(countDistinct($"_salt")).as[Long].head()
    assert(salts >= 6, s"expected near-uniform salt spread, got $salts")
    assert(Skew.saltedJoin(left, right, "k", 8).count() == 1000)
  }
}
