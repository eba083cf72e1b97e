package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Fixture-scale pin threshold: when the candidate projection's
    * optimizer size ESTIMATE is at most this many bytes (≈ the old
    * 8M-row threshold at ~64 B/row), the narrowing passes read a
    * REPARTITIONED, locally-checkpointed projection instead of
    * rescanning the source — the fixture tables arrive as ONE parquet
    * row group, so without the spread every histogram pass (the bucket
    * explode + map-side combine) runs on a single task. Above the
    * threshold the original shuffle-free rescan shape is kept
    * unchanged: at 100 TB you cannot (and need not) pin the column —
    * the scan is already thousands of splits wide and the only thing
    * crossing the exchange stays the ≤ranks·B bucket cells. The
    * decision reads the plan estimate, NOT a count, so deciding costs
    * zero scans — which lets the stats pass (count/min/max) run over
    * the pinned frame instead of paying its own full source scan. */
  private val SpreadPinMaxBytes: BigInt = BigInt(512L << 20)

  private def pinnedScan(df: DataFrame, cols: Seq[String]): DataFrame = {
    // an input the caller already persisted re-reads cheaply AND in
    // parallel — pinning it again would just pay a redundant shuffle +
    // checkpoint per invocation (q159 calls this three times on one
    // persisted frame). A frame that is ITSELF a localCheckpoint
    // (e.g. from [[pin]]) estimates at defaultSizeInBytes = Long.Max,
    // so it is never re-pinned either.
    val cached = df.storageLevel.useMemory || df.storageLevel.useDisk
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (!cached && est <= SpreadPinMaxBytes) {
      val w = df.sparkSession.sessionState.conf.numShufflePartitions
      df.select(cols.map(col): _*).repartition(w).localCheckpoint(true)
    } else df
  }

  /** Caller-side pin: materialize the narrow projection once (fixture
    * scale only — same estimate gate as the internal pin) so a caller
    * that needs its own actions (count for rank targets, extra
    * aggregates over the same column) shares ONE source scan with the
    * narrowing passes instead of each action re-reading the source.
    * The returned frame is recognized as already pinned by
    * [[kthSmallest]]/[[kthSmallestByGroup]] and never re-shuffled. */
  private[graft] def pin(df: DataFrame, cols: Seq[String]): DataFrame =
    pinnedScan(df, cols)

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
    // pin FIRST, stats from the pinned frame: one source scan instead
    // of two (the estimate-based pin decision costs no scan)
    val scan = pinnedScan(df, Seq(valueCol))
    val stats = scan.agg(
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
        // Specs dedupe by INTERVAL: on pass 1 every rank shares the full
        // [min, max] interval, so without the dedupe each row emitted one
        // identical (rank, bucket) cell PER RANK — R× the explode volume
        // of the dominant pass for counts that are all equal. Ranks
        // sharing an interval share one spec and read the same bucket
        // counts with their own local ranks. Width = ceil((hi-lo+1)/B),
        // all literals folded into the plan.
        val intervals = open.map(s => (s.lo, s.hi)).distinct
        val specIdx = intervals.zipWithIndex.toMap
        val specs = intervals.zipWithIndex.map { case ((lo, hi), j) =>
          val w = (hi - lo + buckets.toLong) / buckets.toLong
          (j, lo, hi, w)
        }
        val counts = histogramPass(scan, valueCol, specs)
          .collect() // bounded: ≤ intervals.size · buckets cells
          .map(row => (row.getInt(0), row.getLong(1)) -> row.getLong(2))
          .toMap
        open = open.map { st =>
          val j = specIdx((st.lo, st.hi))
          val (_, lo, hi, w) = specs(j)
          val (found, cum) = walkBuckets(j, lo, hi, w, st.localK, counts)
          require(found >= 0,
            s"rank ${st.lbl}: local rank ${st.localK} beyond interval [$lo,$hi]")
          St(st.lbl, lo + found * w, math.min(hi, lo + (found + 1) * w - 1),
            st.localK - cum)
        }
      }
    }
    (done, passes)
  }

  /** Exact per-group k-th smallest: `(group, label) → k` over a string
    * group column, same histogram narrowing with per-(group, rank)
    * intervals — every pass is still ONE scan + one hash agg over
    * ≤specs·B cells (the group predicate rides in each cell's `when`),
    * so G groups cost the same pass count as one, not G scans. Group
    * count is bounded (the spec literals live in the plan): loud
    * `require` at 1000. */
  def kthSmallestByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ks: Map[(String, String), Long],
      buckets: Int = 4096): Map[(String, String), Long] = {
    val groups = ks.keys.map(_._1).toSeq.distinct.sorted
    require(groups.nonEmpty, "no groups requested")
    // pin FIRST, group stats from the pinned frame: one source scan
    // instead of two (the estimate-based pin decision costs no scan)
    val scan = pinnedScan(df.filter(col(groupCol).isin(groups: _*)),
      Seq(groupCol, valueCol))
    narrowByGroup(scan, groupCol, valueCol, _ => ks, buckets)._2
  }

  /** As [[kthSmallestByGroup]] over ALL groups present in `df`, with the
    * rank targets derived from the operator's own stats pass: callers
    * that previously ran their own count-per-group aggregation just to
    * build `ks` save that full pass. Returns (group → n, results). */
  def kthSmallestAllGroups(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      mkKs: Map[String, Long] => Map[(String, String), Long],
      buckets: Int = 4096)
      : (Map[String, Long], Map[(String, String), Long]) = {
    val scan = pinnedScan(df, Seq(groupCol, valueCol))
    val (stats, done) = narrowByGroup(scan, groupCol, valueCol, mkKs, buckets)
    (stats.map { case (g, (n, _, _)) => g -> n }, done)
  }

  /** Shared grouped-narrowing loop: one stats pass over the prepared
    * scan, rank targets from `mkKs` (a constant function for the
    * explicit-ks entry point), then the histogram passes. */
  private def narrowByGroup(
      scan: DataFrame,
      groupCol: String,
      valueCol: String,
      mkKs: Map[String, Long] => Map[(String, String), Long],
      buckets: Int)
      : (Map[String, (Long, Long, Long)], Map[(String, String), Long]) = {
    require(buckets >= 2, s"need ≥2 buckets, got $buckets")
    val stats = scan
      .groupBy(col(groupCol).as("g"))
      .agg(count(col(valueCol)).as("n"), min(col(valueCol)).as("lo"),
        max(col(valueCol)).as("hi"))
      .collect() // bounded: one row per group
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    require(stats.size <= 1000,
      s"per-group narrowing is bounded at 1000 groups; got ${stats.size}")
    val ks = mkKs(stats.map { case (g, (n, _, _)) => g -> n })
    require(ks.nonEmpty, "no ranks requested")
    ks.foreach { case ((g, lbl), k) =>
      val (n, _, _) = stats.getOrElse(g,
        throw new IllegalArgumentException(s"group $g has no rows"))
      require(k >= 1 && k <= n, s"rank ($g, $lbl)=$k outside [1, $n]")
    }

    final case class St(g: String, lbl: String, lo: Long, hi: Long, localK: Long)
    var open = ks.toSeq.sortBy(_._1).map { case ((g, lbl), k) =>
      St(g, lbl, stats(g)._2, stats(g)._3, k)
    }
    var done = Map.empty[(String, String), Long]
    var passes = 0

    while (open.nonEmpty) {
      val (finished, active) = open.partition(s => s.lo == s.hi)
      done ++= finished.map(s => (s.g, s.lbl) -> s.lo)
      open = active
      if (open.nonEmpty) {
        passes += 1
        require(passes <= 64, s"grouped narrowing failed to converge: $open")
        // same interval dedupe as the global variant, keyed per group:
        // a group's ranks share its full interval on pass 1
        val keys = open.map(s => (s.g, s.lo, s.hi)).distinct
        val keyIdx = keys.zipWithIndex.toMap
        val specs = keys.zipWithIndex.map { case ((g, lo, hi), j) =>
          val w = (hi - lo + buckets.toLong) / buckets.toLong
          (j, col(groupCol) === g, lo, hi, w)
        }
        val counts = histogramPassCond(scan, valueCol, specs)
          .collect()
          .map(row => (row.getInt(0), row.getLong(1)) -> row.getLong(2))
          .toMap
        open = open.map { st =>
          val j = keyIdx((st.g, st.lo, st.hi))
          val (_, _, lo, hi, w) = specs(j)
          val (found, cum) = walkBuckets(j, lo, hi, w, st.localK, counts)
          require(found >= 0, s"rank (${st.g}, ${st.lbl}): local rank " +
            s"${st.localK} beyond interval [$lo,$hi]")
          St(st.g, st.lbl, lo + found * w,
            math.min(hi, lo + (found + 1) * w - 1), st.localK - cum)
        }
      }
    }
    (stats, done)
  }

  /** Cumulative walk to the bucket holding `localK`: (bucket, countBefore). */
  private def walkBuckets(i: Int, lo: Long, hi: Long, w: Long, localK: Long,
      counts: Map[(Int, Long), Long]): (Long, Long) = {
    var cum = 0L
    var b = 0L
    val nb = (hi - lo) / w + 1
    while (b < nb) {
      val c = counts.getOrElse((i, b), 0L)
      if (cum + c >= localK) return (b, cum)
      cum += c; b += 1
    }
    (-1L, cum)
  }

  /** One narrowing pass: (rankIdx, bucket) → count for every rank's
    * `(idx, lo, hi, width)` spec. Exposed so PlanSpec can pin the shape
    * this operator's scalability rests on: a map-side-combined hash agg
    * over ≤ranks·B cells — no sort, no window, no data-row shuffle. */
  private[graft] def histogramPass(
      df: DataFrame,
      valueCol: String,
      specs: Seq[(Int, Long, Long, Long)]): DataFrame =
    histogramPassCond(df, valueCol,
      specs.map { case (i, lo, hi, w) => (i, lit(true), lo, hi, w) })

  /** Generalized pass: each spec carries an extra predicate (the group
    * membership for [[kthSmallestByGroup]], `true` otherwise). */
  private def histogramPassCond(
      df: DataFrame,
      valueCol: String,
      specs: Seq[(Int, Column, Long, Long, Long)]): DataFrame = {
    val cells = array(specs.map { case (i, cond, lo, hi, w) =>
      // exact long division: subtract the remainder first so the
      // double `/` divides an exact multiple (quotient ≤ B « 2^53)
      val off = col(valueCol) - lit(lo)
      when(cond && col(valueCol).between(lo, hi),
        struct(lit(i).as("r"),
          ((off - pmod(off, lit(w))) / lit(w)).cast("long").as("b")))
        .otherwise(lit(null))
    }: _*)
    df.select(explode(filter(cells, x => x.isNotNull)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))
  }
}
