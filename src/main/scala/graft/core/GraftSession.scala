package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the engine.
  *
  * Local-mode defaults are tuned for the sandbox (local[32], 128 GiB) but
  * every setting is cluster-safe: AQE on (runtime re-plan, skew-join
  * handling), shuffle partitions sized to cores rather than the 200
  * default, UTC session time zone for oracle parity.
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      // events.parquet carries TIMESTAMP(NANOS) which vanilla Spark cannot
      // represent; read it as LongType (ns since epoch) and convert
      // explicitly (see Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
