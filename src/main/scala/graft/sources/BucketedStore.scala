package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Write-side bucketing for shuffle-free repeated joins — the storage
  * layout that matters most at 100 TB.
  *
  * A join between two tables bucketed into the same number of buckets on
  * the join key needs NO exchange on either side: Spark's
  * `EnsureRequirements` sees `HashClusteredDistribution` already satisfied
  * by the bucketing and plans a SortMergeJoin straight over the scans.
  * For a fact table joined repeatedly on the same key (orders ⋈ lineitem,
  * doc_id-keyed postings ⋈ doc metadata), paying one bucketed write
  * amortizes the per-query shuffle away entirely — at 100 TB a shuffle
  * of the fact table is minutes of network + spill, so this is routinely
  * a 2-5× end-to-end win for join-heavy reporting workloads.
  *
  * Bucket-count guidance at scale: pick `buckets` so one bucket of the
  * LARGER table is 100-500 MB on disk (e.g. 100 TB / 256 MB ≈ 400k —
  * capped in practice by file-count pressure; thousands of buckets with
  * multi-GB buckets plus AQE skew handling is the workable middle).
  * Bucket pruning (`spark.sql.sources.bucketing.enabled`, on by default)
  * also turns point lookups on the bucket key into single-bucket scans.
  *
  * Parquet `bucketBy` requires the (session-scoped) table catalog — the
  * bucketing metadata lives in the catalog entry, not the files — so
  * this helper materializes via `saveAsTable` with an explicit `path`
  * (external-table layout: data survives catalog loss, re-registerable).
  */
object BucketedStore {

  /** Write `df` bucketed (and bucket-sorted) by `key` into `buckets`
    * buckets at `path`, registered as catalog table `table`. */
  def write(df: DataFrame, table: String, path: String, key: String,
            buckets: Int, sortColumns: Seq[String] = Nil): Unit = {
    val sorted = if (sortColumns.isEmpty) Seq(key) else sortColumns
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Read a previously written bucketed table (by catalog name). */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
