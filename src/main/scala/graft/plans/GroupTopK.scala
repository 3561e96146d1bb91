package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.IntegerType

/** Top-k rows per group as a first-class operator (SURVEY.md §2-G).
  *
  * Spark's own top-k (TakeOrderedAndProject) is global-only; the
  * per-group formulation via row_number() needs a FULL sort of every
  * partition by (group, order) plus Window buffering. This exec keeps
  * a size-k bounded heap per group in a single unsorted pass:
  * O(n log k) instead of O(n log n), no sort, no window buffers, and
  * per-partition state is #groups × k rows. Requires only clustering
  * by group — the planner inserts one hash exchange and nothing else.
  */
case class GroupTopKPlan(
    child: LogicalPlan,
    groups: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(c: LogicalPlan): GroupTopKPlan = copy(child = c)
}

object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKPlan(child, groups, order, k, rankAttr) =>
      // two-phase, the partial-aggregation pattern: a map-side pass
      // bounds each partition's contribution to k rows per group
      // BEFORE the exchange (top-k of a union == top-k of the union
      // of per-partition top-ks), so the shuffle carries ≤ #groups·k
      // rows per map task instead of the full candidate stream — the
      // knn_graph cell join emits ~630 candidates per query at sf10
      // and the partial pass ships 3.
      val partial = GroupTopKExec(groups, order, k, rankAttr,
        planLater(child), partial = true)
      GroupTopKExec(groups, order, k, rankAttr, partial) :: Nil
    case _ => Nil
  }
}

case class GroupTopKExec(
    groups: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: SparkPlan,
    partial: Boolean = false)
  extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr
  override def producedAttributes: AttributeSet =
    if (partial) AttributeSet.empty else AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groups) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val kk = k
    val groupExprs = groups
    val orderExprs = order
    val childOutput = child.output
    val outAttrs = output
    val isPartial = partial
    child.execute().mapPartitions ({ it =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val ord = GenerateOrdering.generate(orderExprs, childOutput)
      // max-heap by sort order: head = current worst of the best-k
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      if (isPartial) {
        // Map-side phase: bound memory like partial hash aggregation.
        // A map task sees an arbitrary subset of groups, so the heap
        // map is capped; rows of groups beyond the cap STREAM THROUGH
        // unpruned (always safe — the final pass past the exchange
        // does the real top-k), instead of growing a heap per group
        // without bound on high-cardinality keys. No rank yet; the
        // final pass re-ranks the merged survivors.
        new Iterator[InternalRow] {
          private var pending: UnsafeRow = null
          private var drain: Iterator[UnsafeRow] = Iterator.empty
          private var inputDone = false
          private def advance(): Unit = {
            while (pending == null && !inputDone) {
              if (!it.hasNext) {
                inputDone = true
                drain = heaps.iterator.flatMap { case (_, h) => h.iterator }
              } else {
                val row = it.next().asInstanceOf[UnsafeRow]
                val key = keyProj(row)
                heaps.get(key) match {
                  case None =>
                    if (heaps.size < GroupTopKExec.MaxPartialGroups) {
                      val h = mutable.PriorityQueue.empty[UnsafeRow](
                        ord.asInstanceOf[Ordering[InternalRow]].asInstanceOf[Ordering[UnsafeRow]])
                      h.enqueue(row.copy())
                      heaps.put(key.copy(), h)
                    } else pending = row // overflow group: pass through
                  case Some(h) =>
                    if (h.size < kk) h.enqueue(row.copy())
                    else if (ord.compare(row, h.head) < 0) {
                      h.dequeue()
                      h.enqueue(row.copy())
                    }
                }
              }
            }
          }
          override def hasNext: Boolean = {
            if (pending == null) advance()
            pending != null || drain.hasNext
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            if (pending != null) { val r = pending; pending = null; r }
            else drain.next()
          }
        }
      } else {
        it.foreach { row =>
          val key = keyProj(row)
          heaps.get(key) match {
            case None =>
              val h = mutable.PriorityQueue.empty[UnsafeRow](ord.asInstanceOf[Ordering[InternalRow]]
                .asInstanceOf[Ordering[UnsafeRow]])
              h.enqueue(row.asInstanceOf[UnsafeRow].copy())
              heaps.put(key.copy(), h)
            case Some(h) =>
              if (h.size < kk) h.enqueue(row.asInstanceOf[UnsafeRow].copy())
              else if (ord.compare(row, h.head) < 0) {
                h.dequeue()
                h.enqueue(row.asInstanceOf[UnsafeRow].copy())
              }
          }
        }
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val rankRow = new SpecificInternalRow(Seq(IntegerType))
        heaps.iterator.flatMap { case (_, h) =>
          val best: Seq[UnsafeRow] = h.dequeueAll.reverse
          best.iterator.zipWithIndex.map { case (row, i) =>
            rankRow.setInt(0, i + 1)
            proj(joined(row, rankRow))
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): GroupTopKExec = copy(child = c)
}

object GroupTopKExec {
  /** Map-side heap-map cap: ~128k groups × k rows (tens of MB at
    * k=10) — beyond it the partial pass degrades gracefully to
    * pass-through, exactly like partial hash aggregation's fallback,
    * instead of holding a heap for every group a task happens to see.
    * Mutable only as a test seam (GroupTopKSpec forces the overflow
    * path with a cap of 1). */
  @volatile var MaxPartialGroups: Int = 1 << 17
}

object GroupTopK {
  private def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(GroupTopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ GroupTopKStrategy
  }

  /** Sort key for [[topK]]: column name + direction. */
  case class Sort(col: String, desc: Boolean = false)

  /** Top-k rows per group with a 1-based `rank` column. */
  def topK(df: DataFrame, groupCols: Seq[String],
           orderBy: Seq[Sort], k: Int,
           rankCol: String = "rk"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(groupCols.nonEmpty,
      "groupCols must be non-empty (for a global top-k use orderBy + limit, " +
        "which plans as TakeOrderedAndProject)")
    val spark = df.sparkSession
    ensureRegistered(spark)
    val lp = Bridge.analyzed(df)
    def attr(n: String): Attribute = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not in ${lp.output.map(_.name)}"))
    val order = orderBy.map(s =>
      SortOrder(attr(s.col), if (s.desc) Descending else Ascending))
    val rankAttr = AttributeReference(rankCol, IntegerType, nullable = false)()
    Bridge.ofRows(spark,
      GroupTopKPlan(lp, groupCols.map(attr), order, k, rankAttr))
  }
}
