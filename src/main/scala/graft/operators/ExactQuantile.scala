package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT distributed rank selection by iterative histogram narrowing.
  *
  * Spark's built-in `percentile` aggregate is exact but buffers every
  * value of a group in one aggregation buffer — a global exact median
  * over a 100 TB column cannot go through it, and `approx_percentile`
  * trades the exactness away. This operator computes exact k-th-smallest
  * values over an INTEGER domain (e.g. prices in cents) with a handful
  * of full scans and **no sort, no window, no data-row shuffle**:
  *
  *   pass 0: one agg → (count, min, max)
  *   pass i: bucket every candidate row into ≤B equi-width buckets per
  *           unfinished rank, hash-aggregate (rank, bucket) counts —
  *           map-side combine collapses each partition to ≤ranks·B
  *           cells, so the exchange moves ≤ranks·B rows regardless of
  *           data size — then narrow each rank's interval to the bucket
  *           containing its (running) local rank.
  *
  * Each pass divides every interval width by B, so passes =
  * ceil(log_B(range)): a cents domain of 10^7 finishes in 2 histogram
  * passes at B=4096. When an interval's width reaches 1 the answer for
  * that rank is its lower bound — exact by construction, duplicates and
  * skew included (a bucket holding one repeated value narrows to width
  * 1 like any other). Driver state is ≤ranks·B bucket counts per pass —
  * bounded by construction, never data-sized.
  */
object ExactQuantile {

  /** Exact k-th smallest (1-indexed, ascending) of long column
    * `valueCol` for every rank in `ks`, as label → value. */
  def kthSmallest(
      df: DataFrame,
      valueCol: String,
      ks: Map[String, Long],
      buckets: Int = 4096): Map[String, Long] =
    kthSmallestWithPasses(df, valueCol, ks, buckets)._1

  /** As [[kthSmallest]], also returning the histogram-pass count — the
    * scale invariant ScaleBench pins: passes = ceil(log_B(range)) is a
    * function of the VALUE DOMAIN, not the row count, so 50× data runs
    * the same number of scans. */
  def kthSmallestWithPasses(
      df: DataFrame,
      valueCol: String,
      ks: Map[String, Long],
      buckets: Int = 4096): (Map[String, Long], Int) = {
    require(buckets >= 2, s"need ≥2 buckets, got $buckets")
    val stats = df.agg(
      count(col(valueCol)).as("n"),
      min(col(valueCol)).as("lo"),
      max(col(valueCol)).as("hi")).head()
    val n = stats.getLong(0)
    require(n > 0, "kthSmallest on an empty column")
    ks.foreach { case (lbl, k) =>
      require(k >= 1 && k <= n, s"rank $lbl=$k outside [1, $n]")
    }

    // per-rank search state: inclusive value interval + rank WITHIN it
    final case class St(lbl: String, lo: Long, hi: Long, localK: Long)
    var open = ks.toSeq.sortBy(_._1).map { case (lbl, k) =>
      St(lbl, stats.getLong(1), stats.getLong(2), k)
    }
    var done = Map.empty[String, Long]
    var passes = 0

    while (open.nonEmpty) {
      val (finished, active) = open.partition(s => s.lo == s.hi)
      done ++= finished.map(s => s.lbl -> s.lo)
      open = active
      if (open.nonEmpty) {
        passes += 1
        require(passes <= 64, s"quantile narrowing failed to converge: $open")
        // width per rank: ceil((hi-lo+1)/B), all literals folded into
        // the plan — the scan emits (rankIdx, bucket) per matching rank
        val specs = open.zipWithIndex.map { case (s, i) =>
          val w = (s.hi - s.lo + buckets.toLong) / buckets.toLong
          (i, s.lo, s.hi, w)
        }
        val counts = histogramPass(df, valueCol, specs)
          .collect() // bounded: ≤ open.size · buckets cells
          .map(row => (row.getInt(0), row.getLong(1)) -> row.getLong(2))
          .toMap
        open = specs.map { case (i, lo, hi, w) =>
          val st = open(i)
          var cum = 0L
          var b = 0L
          var found = -1L
          val nb = (hi - lo) / w + 1
          while (found < 0 && b < nb) {
            val c = counts.getOrElse((i, b), 0L)
            if (cum + c >= st.localK) found = b else { cum += c; b += 1 }
          }
          require(found >= 0,
            s"rank ${st.lbl}: local rank ${st.localK} beyond interval [$lo,$hi]")
          St(st.lbl, lo + found * w, math.min(hi, lo + (found + 1) * w - 1),
            st.localK - cum)
        }
      }
    }
    (done, passes)
  }

  /** One narrowing pass: (rankIdx, bucket) → count for every rank's
    * `(idx, lo, hi, width)` spec. Exposed so PlanSpec can pin the shape
    * this operator's scalability rests on: a map-side-combined hash agg
    * over ≤ranks·B cells — no sort, no window, no data-row shuffle. */
  private[graft] def histogramPass(
      df: DataFrame,
      valueCol: String,
      specs: Seq[(Int, Long, Long, Long)]): DataFrame = {
    val cells = array(specs.map { case (i, lo, hi, w) =>
      // exact long division: subtract the remainder first so the
      // double `/` divides an exact multiple (quotient ≤ B « 2^53)
      val off = col(valueCol) - lit(lo)
      when(col(valueCol).between(lo, hi),
        struct(lit(i).as("r"),
          ((off - pmod(off, lit(w))) / lit(w)).cast("long").as("b")))
        .otherwise(lit(null))
    }: _*)
    df.select(explode(filter(cells, x => x.isNotNull)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))
  }
}
