package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/classloading + first parquet touch,
    // so the first timed query doesn't carry ~5 s of one-time cost
    try SparkEntry.queries("q06_forecast_revenue")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    // noop sink, not count(): count() lets Catalyst prune every projection
    // and eliminate sorts, timing an empty plan; the noop writer
    // materializes all output columns like a real consumer.
    // SDS e2e queries (q5x_sds_*) are correctness fixtures with bounded
    // inputs — ingest THROUGHPUT is measured by graft.IngestBench, so
    // timing a fixed 100-block ingest here would only add noise.
    val results = SparkEntry.queries.toSeq.filterNot(_._1.contains("_sds_"))
      .sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // queries may cache intermediates; don't let caches accumulate
      // across the suite and skew later timings. clearCache drops
      // CacheManager entries; the GC nudge lets the ContextCleaner reap
      // localCheckpoint blocks (RDD-level, invisible to clearCache) from
      // the frames that just went unreachable. Both run OUTSIDE the
      // timed window.
      spark.catalog.clearCache()
      System.gc()
      name -> elapsed
    }
    // 3-decimal timings: the driver parses a bounded stdout TAIL, so the
    // JSON line must stay well under ~4 KB or the leading queries fall
    // off the capture window (BENCH_r03/r04 "parsed": null).
    def s3(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + s3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":${s3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // file copy survives any stdout truncation
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
