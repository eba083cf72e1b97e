package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.unsafe.types.ByteArray
import org.apache.spark.util.collection.unsafe.sort.PrefixComparators

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
  * `spark.graft.topk.maxKeysPerPartition` distinct keys (session conf,
  * default 4M — cap × k rows fits comfortably in task memory; specs
  * shrink it to force the overflow paths at toy scale):
  *  - the PARTIAL phase flushes-and-clears its heap map at the cap
  *    (emit every currently-retained row downstream, start fresh) —
  *    graceful degradation: the exchange carries more partial winners,
  *    memory never exceeds the cap, and the final merge keeps the
  *    result exact because a key's flushed candidate sets are rejoined
  *    after clustering;
  *  - the FINAL phase needs all of a key's candidates resident to be
  *    exact, so past the cap it SPILLS to a sort-based merge — the
  *    HashAggregateExec answer: retained rows plus the remaining input
  *    go through Spark's disk-backed external row sorter ordered by
  *    key bytes, and one streaming pass over the key-clustered output
  *    re-runs the heap per key group with only a single group resident.
  *    Exactness is unchanged; the `spillMerges` SQL metric counts how
  *    often a partition took this path.
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

  override lazy val metrics: Map[String, SQLMetric] =
    if (partial) Map.empty
    else Map("spillMerges" ->
      SQLMetrics.createMetric(sparkContext, "final-phase sort-merge spills"))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val isPartial = partial
    val cap = conf.getConfString(TopKPerKeyExec.CapKey,
      TopKPerKeyExec.DefaultCap.toString).toInt
    val schema = DataTypeUtils.fromAttributes(childOutput)
    val pageSize = org.apache.spark.sql.GraftPlanBridge.pageSizeBytes
    val spillMetric = if (isPartial) None else Some(longMetric("spillMerges"))
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(Seq(sortOrder), childOutput)
      // heap head = WORST retained row (comparator reversed), so the
      // replace test is one compare against the head
      val worstFirst = ord.reverse
      import scala.jdk.CollectionConverters._
      def newHeap() = new java.util.PriorityQueue[UnsafeRow](limit, worstFirst)
      def heapInsert(heap: java.util.PriorityQueue[UnsafeRow], row: InternalRow): Unit =
        if (heap.size < limit) {
          heap.add(row.asInstanceOf[UnsafeRow].copy())
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.asInstanceOf[UnsafeRow].copy())
        }

      if (isPartial) {
        var heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
        def insert(row: InternalRow): Unit = {
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = newHeap()
            heaps.put(key.copy(), heap)
          }
          heapInsert(heap, row)
        }
        def flush(): Iterator[InternalRow] = {
          val vs = new java.util.ArrayList(heaps.values())
          heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
          vs.iterator().asScala.flatMap(_.iterator().asScala)
        }
        // lazy drive: rows stream through insert(); a flush is emitted
        // whenever the key map hits the cap, plus the terminal flush
        new Iterator[InternalRow] {
          private var out: Iterator[InternalRow] = Iterator.empty
          private def advance(): Unit = {
            while (!out.hasNext && it.hasNext) {
              insert(it.next())
              if (heaps.size() >= cap && it.hasNext) out = flush()
            }
            if (!out.hasNext && !it.hasNext && !heaps.isEmpty) out = flush()
          }
          override def hasNext: Boolean = { advance(); out.hasNext }
          override def next(): InternalRow = { advance(); out.next() }
        }
      } else {
        // FINAL phase: nothing can be emitted until the input is
        // exhausted (a key's candidates may arrive anywhere in the
        // clustered partition), so drive the hash path eagerly and
        // switch to the sort-based merge the moment the key map would
        // exceed the cap.

        /** Key-clustering order: unsigned byte-lexicographic compare of
          * the projected key rows (equal keys project to identical
          * bytes). Two projection instances because each reuses its
          * output buffer. The sorter's 8-byte binary prefix is
          * order-consistent with this comparison. */
        def sortMergeTopK(rows: Iterator[InternalRow]): Iterator[InternalRow] = {
          val projL = UnsafeProjection.create(keyExprs, childOutput)
          val projR = UnsafeProjection.create(keyExprs, childOutput)
          val keyOrd: Ordering[InternalRow] = new Ordering[InternalRow] {
            override def compare(a: InternalRow, b: InternalRow): Int =
              ByteArray.compareBinary(projL(a).getBytes, projR(b).getBytes)
          }
          val prefixProj = UnsafeProjection.create(keyExprs, childOutput)
          val holder = new UnsafeExternalRowSorter.PrefixComputer.Prefix
          val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
            override def computePrefix(row: InternalRow): UnsafeExternalRowSorter.PrefixComputer.Prefix = {
              holder.isNull = false
              holder.value =
                PrefixComparators.BinaryPrefixComparator.computePrefix(
                  prefixProj(row).getBytes)
              holder
            }
          }
          val sorter = UnsafeExternalRowSorter.create(
            schema, keyOrd, PrefixComparators.BINARY, prefixComputer,
            pageSize, false)
          val sorted = sorter.sort(rows.map(_.asInstanceOf[UnsafeRow]))
          // one group resident at a time over the key-clustered stream
          new Iterator[InternalRow] {
            private var out: Iterator[InternalRow] = Iterator.empty
            private var curKey: UnsafeRow = null
            private var heap = newHeap()
            private def drain(): Iterator[InternalRow] = {
              val h = heap; heap = newHeap()
              h.iterator().asScala
            }
            private def advance(): Unit = {
              while (!out.hasNext && sorted.hasNext) {
                val row = sorted.next()
                val key = projL(row)
                if (curKey == null) curKey = key.copy()
                else if (key != curKey) { out = drain(); curKey = key.copy() }
                heapInsert(heap, row)
              }
              if (!out.hasNext && !sorted.hasNext && !heap.isEmpty) out = drain()
            }
            override def hasNext: Boolean = { advance(); out.hasNext }
            override def next(): InternalRow = { advance(); out.next() }
          }
        }

        def finalMerge(): Iterator[InternalRow] = {
          val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
          while (it.hasNext) {
            val row = it.next()
            val key = keyProj(row)
            var heap = heaps.get(key)
            if (heap == null) {
              if (heaps.size() >= cap) {
                spillMetric.foreach(_.add(1))
                val pending = heaps.values().iterator().asScala
                  .flatMap(_.iterator().asScala)
                return sortMergeTopK(
                  pending ++ Iterator(row.asInstanceOf[UnsafeRow].copy()) ++ it)
              }
              heap = newHeap()
              heaps.put(key.copy(), heap)
            }
            heapInsert(heap, row)
          }
          heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
        }
        finalMerge()
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** Session conf key for the distinct-key cap per partition, per phase
    * (see class doc) — a session/query-tunable knob like every analogous
    * Spark memory setting, not a JVM global. */
  val CapKey = "spark.graft.topk.maxKeysPerPartition"
  val DefaultCap = 4000000
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
