package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.LongType
import org.apache.spark.unsafe.types.UTF8String

/** Gap-based sessionization as a first-class Catalyst operator
  * (SURVEY.md §2-G): logical node → strategy → physical exec.
  *
  * Why a custom plan when two window functions express it: the window
  * formulation materializes lag + running-sum window buffers and runs
  * two Window operator passes after the sort. This exec asks the
  * planner for (cluster by user, sort by user,ts) — ONE shuffle, ONE
  * sort, then a single streaming pass that carries three scalars of
  * state per partition. At 100 TB the shuffle dominates either way,
  * but the window buffers and extra operator passes are pure overhead
  * this removes; and the pattern generalizes to any ordered
  * per-key scan operator (as-of joins, pattern matching).
  */
case class SessionizePlan(
    child: LogicalPlan,
    user: Attribute,
    ts: Attribute,
    gapMicros: Long,
    sessionAttr: AttributeReference)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ sessionAttr
  override def producedAttributes: AttributeSet = AttributeSet(sessionAttr)
  override protected def withNewChildInternal(c: LogicalPlan): SessionizePlan = copy(child = c)
}

object SessionizeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case SessionizePlan(child, user, ts, gap, out) =>
      SessionizeExec(user, ts, gap, out, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class SessionizeExec(
    user: Attribute,
    ts: Attribute,
    gapMicros: Long,
    sessionAttr: AttributeReference,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ sessionAttr

  // The planner inserts exactly one hash shuffle on `user` plus a sort;
  // an existing satisfying partitioning (e.g. a bucketed source) is
  // reused for free.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(user)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(user, Ascending), SortOrder(ts, Ascending)))
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val gap = gapMicros
    val userExpr = BindReferences.bindReference(user: Expression, child.output)
    val tsExpr = BindReferences.bindReference(ts: Expression, child.output)
    val outAttrs = output
    child.execute().mapPartitions ({ it =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val sessRow = new SpecificInternalRow(Seq(LongType))
      var curUser: Any = null
      var hasUser = false
      var lastTs = 0L
      var sid = 0L
      it.map { row =>
        // copy key values that may be backed by reused row buffers
        val u = userExpr.eval(row) match {
          case s: UTF8String => if (!hasUser || s != curUser) s.copy() else curUser
          case x => x
        }
        val tv = tsExpr.eval(row)
        if (tv == null) throw new IllegalStateException(
          "sessionize: NULL timestamp — filter null ts rows before sessionizing")
        val t = tv.asInstanceOf[Long]
        if (!hasUser || u != curUser) {
          hasUser = true; curUser = u; sid = 1L
        } else if (t - lastTs > gap) {
          sid += 1L
        }
        lastTs = t
        sessRow.setLong(0, sid)
        proj(joined(row, sessRow))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): SessionizeExec = copy(child = c)
}

/** User-facing API. */
object Sessionize {

  private def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(SessionizeStrategy))
      exp.extraStrategies = exp.extraStrategies :+ SessionizeStrategy
  }

  /** Append a per-user `session_id` column (1-based, dense) splitting
    * on event gaps > gapMinutes. */
  def withSessionIds(df: DataFrame, userCol: String, tsCol: String,
                     gapMinutes: Int): DataFrame = {
    val spark = df.sparkSession
    ensureRegistered(spark)
    val lp = Bridge.analyzed(df)
    def attr(n: String): Attribute = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not in ${lp.output.map(_.name)}"))
    val ts = attr(tsCol)
    ts.dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => // micros-backed
      case other => throw new IllegalArgumentException(
        s"$tsCol must be a timestamp column, got $other")
    }
    val user = attr(userCol)
    user.dataType match {
      // value-comparable types: either copied in the exec (UTF8String) or
      // immutable primitives. Buffer-backed types (binary, struct, array,
      // map) compare by reference against a reused row buffer, which would
      // silently start a new session on every row — reject them up front.
      case org.apache.spark.sql.types.StringType | org.apache.spark.sql.types.BooleanType |
           org.apache.spark.sql.types.DateType | org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => // ok
      case t: org.apache.spark.sql.types.NumericType => val _ = t // ok
      case other => throw new IllegalArgumentException(
        s"$userCol must be a string/numeric/date key column, got $other " +
          "(buffer-backed types are not value-comparable across reused rows)")
    }
    val sessionAttr = AttributeReference("session_id", LongType, nullable = false)()
    Bridge.ofRows(spark,
      SessionizePlan(lp, user, ts, gapMinutes * 60L * 1000000L, sessionAttr))
  }
}
