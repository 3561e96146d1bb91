package graft.tools
object AbProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local(4)
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    import org.apache.spark.sql.functions._
    val u = graft.sources.Tables.events(s, "/root/testdata/sf0.01").groupBy($"user_id")
      .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L)).as("conv"))
      .select(($"user_id" % 2).as("arm"), $"conv")
    val a = u.groupBy($"arm").agg(count(lit(1)).as("n"), sum($"conv").as("c"))
    a.show()
    val wide = a.agg(
      sum(when($"arm" === 0, $"n")).as("n0"), sum(when($"arm" === 0, $"c")).as("c0"),
      sum(when($"arm" === 1, $"n")).as("n1"), sum(when($"arm" === 1, $"c")).as("c1"))
    wide.show()
    s.stop()
  }
}
