package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension (SURVEY.md §7.3 tier (c): custom
  * LogicalPlan + SparkStrategy + SparkPlan, injected through
  * SparkSessionExtensions): exact per-key top-k without sorting.
  *
  * The built-in formulation — `row_number() OVER (PARTITION BY key ORDER
  * BY v) <= k` — shuffles EVERY row, sorts every partition, ranks every
  * row, then throws almost all of them away. This operator:
  *
  *  1. partial phase (before the exchange): each input partition keeps a
  *     bounded heap of k rows per key it sees — O(n log k) CPU, no sort,
  *     no per-row ranking state;
  *  2. the exchange then carries at most k·keys·partitions rows — at
  *     100 TB with k=10 that is the difference between shuffling the
  *     table and shuffling a rounding error;
  *  3. final phase (after the exchange, keys clustered): the same heap
  *     pass merges partial winners into the exact per-key top-k.
  *
  * Memory bound: keys-per-partition × k retained rows per phase — the
  * same working-set shape as a hash-aggregate buffer, BOUNDED at
  * `maxKeysPerPartition` distinct keys:
  *  - the PARTIAL phase flushes-and-clears its heap map at the cap
  *    (emit every currently-retained row downstream, start fresh) —
  *    graceful degradation: the exchange carries more partial winners,
  *    memory never exceeds the cap, and the final merge keeps the
  *    result exact because a key's flushed candidate sets are rejoined
  *    after clustering;
  *  - the FINAL phase needs all of a key's candidates resident to be
  *    exact, so past the cap it FAILS LOUDLY (raise
  *    spark.sql.shuffle.partitions so fewer keys land per partition)
  *    instead of OOM-killing the executor — the HashAggregateExec
  *    analogue of spilling, reduced to the guard this operator needs.
  *
  * Output contract: the top-k rows per key, row order unspecified —
  * callers add a presentation sort (exactly like the reference's
  * reporting queries ORDER BY on top of the DB's index-backed top-N).
  */
case class TopKPerKeyNode(keys: Seq[Attribute], order: SortOrder, k: Int,
                          child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Attribute], order: SortOrder, k: Int,
                          partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val isPartial = partial
    val cap = TopKPerKeyExec.maxKeysPerPartition
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(Seq(sortOrder), childOutput)
      // heap head = WORST retained row (comparator reversed), so the
      // replace test is one compare against the head
      val worstFirst = ord.reverse
      var heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      def insert(row: InternalRow): Unit = {
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (!isPartial) require(heaps.size() < cap,
            s"TopKPerKey final merge: more than $cap distinct keys in one " +
              "clustered partition — all of a key's candidates must be " +
              "resident for an exact merge. Raise spark.sql.shuffle.partitions " +
              "so fewer keys land per partition (the partial phase stays " +
              "bounded by flushing and needs no change).")
          heap = new java.util.PriorityQueue[UnsafeRow](limit, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) {
          heap.add(row.asInstanceOf[UnsafeRow].copy())
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.asInstanceOf[UnsafeRow].copy())
        }
      }
      import scala.jdk.CollectionConverters._
      def flush(): Iterator[InternalRow] = {
        val vs = new java.util.ArrayList(heaps.values())
        heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
        vs.iterator().asScala.flatMap(_.iterator().asScala)
      }
      // lazy drive: rows stream through insert(); the partial phase
      // emits a flush whenever the key map hits the cap, and both
      // phases emit the terminal flush once input is exhausted
      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        private def advance(): Unit = {
          while (!out.hasNext && it.hasNext) {
            insert(it.next())
            if (isPartial && heaps.size() >= cap && it.hasNext) out = flush()
          }
          if (!out.hasNext && !it.hasNext && !heaps.isEmpty) out = flush()
        }
        override def hasNext: Boolean = { advance(); out.hasNext }
        override def next(): InternalRow = { advance(); out.next() }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** Distinct-key cap per partition, per phase (see class doc). The
    * default bounds heap memory at cap × k rows — ~4M keys × small k
    * fits comfortably in an executor's task memory; specs shrink it to
    * force the flush / guard paths at toy scale. */
  private[graft] var maxKeysPerPartition: Int = 4_000_000
}

/** Plans the logical node as partial→final; EnsureRequirements inserts
  * the hash exchange between them (final requires clustering on the
  * keys), so the shuffle carries only partial winners. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Exact top-`k` rows per `keyCols` group, best-first by `orderCol`
    * (`ascending=false` ⇒ largest first). Ties are broken by nothing —
    * pass a composite (e.g. struct) column for deterministic tiebreaks. */
  def perKey(df: DataFrame, keyCols: Seq[String], orderCol: Column, k: Int,
             ascending: Boolean = false): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    val keyAttrs = keyCols.map(c =>
      analyzed.output.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"no column $c in ${analyzed.output}")))
    val orderExpr = org.apache.spark.sql.GraftPlanBridge.expr(df.sparkSession, orderCol) match {
      case a: Attribute =>
        analyzed.output.find(_.name == a.name).getOrElse(a)
      case e => e
    }
    val so = SortOrder(orderExpr, if (ascending) Ascending else Descending)
    org.apache.spark.sql.GraftPlanBridge.ofRows(df.sparkSession,
      TopKPerKeyNode(keyAttrs, so, k, analyzed))
  }
}
