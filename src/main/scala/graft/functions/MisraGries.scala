package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequency sketch: a mergeable heavy-hitters summary with
  * a HARD memory bound of `cap` counters per aggregation buffer,
  * regardless of stream length or cardinality (SURVEY.md §7.3 "sketches
  * beyond approx_count_distinct → custom Aggregator"; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Guarantee (the one the q121 gate leans on): after any sequence of
  * reduces and merges over a stream of N items, every item whose true
  * count exceeds N/(cap+1) is present in the summary. So the sketch
  * pass yields a candidate set ⊇ the ε-heavy hitters, and a second
  * exact recount restricted to those ≤cap candidates turns the
  * approximate summary into an EXACT `count > N/(cap+1)` answer — the
  * classic two-pass heavy-hitter plan that never shuffles the full
  * token-frequency domain (at 100 TB the first pass moves ≤cap counters
  * per partition across the exchange and the second pass shuffles only
  * rows matching ≤cap literals).
  *
  * Buffer = (counter map ≤ cap entries, total item count N), immutable
  * Map so the buffer round-trips Spark's encoder untouched. The
  * decrement-all case strikes at most once per cap inserts (amortized
  * O(1) per item); merge sums counters then subtracts the (cap+1)-th
  * largest value from all (the PODS-2012 rule), keeping positives only.
  */
class MisraGriesAgg(cap: Int)
    extends Aggregator[String, (Map[String, Long], Long), MgSummary] {
  require(cap > 0, s"Misra-Gries cap must be positive, got $cap")

  override def zero: (Map[String, Long], Long) = (Map.empty[String, Long], 0L)

  override def reduce(
      buf: (Map[String, Long], Long),
      item: String): (Map[String, Long], Long) = {
    val (m, n) = buf
    val next = m.get(item) match {
      case Some(c) => m.updated(item, c + 1)
      case None if m.size < cap => m.updated(item, 1L)
      case None => // decrement-all; drop counters that hit zero
        m.collect { case (k, c) if c > 1L => k -> (c - 1L) }
    }
    (next, n + 1)
  }

  override def merge(
      a: (Map[String, Long], Long),
      b: (Map[String, Long], Long)): (Map[String, Long], Long) = {
    val (ma, na) = a
    val (mb, nb) = b
    var m = ma
    mb.foreach { case (k, c) => m = m.updated(k, m.getOrElse(k, 0L) + c) }
    if (m.size > cap) {
      // subtract the (cap+1)-th largest counter value from every counter
      val vals = m.values.toArray
      java.util.Arrays.sort(vals)
      val kth = vals(vals.length - (cap + 1)) // (cap+1)-th largest
      m = m.collect { case (k, c) if c > kth => k -> (c - kth) }
    }
    (m, na + nb)
  }

  override def finish(buf: (Map[String, Long], Long)): MgSummary =
    MgSummary(buf._1.keys.toArray.sorted, buf._2)

  override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
    ExpressionEncoder[(Map[String, Long], Long)]()
  override def outputEncoder: Encoder[MgSummary] = ExpressionEncoder[MgSummary]()
}

/** Sketch-pass result: sorted candidate items (≤ cap) + exact stream
  * length N (candidates ⊇ every item with count > n/(cap+1)). */
final case class MgSummary(candidates: Array[String], n: Long)
