package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Plan-audit utility (not part of the driver contract):
  * `runMain graft.ExplainDump <outDir> <suffix> <q1,q2,...> [sfDir]`
  * writes `<outDir>/<query>_<suffix>.txt` with the formatted plan of
  * each named contract query — the batch form of [[Explain]], used to
  * commit the before/after plan evidence for an optimization round.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) sys.error(
      "usage: ExplainDump <outDir> <suffix> <q1,q2,...> [sfDir]")
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(',').toSeq.map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val plan =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      System.err.println(s"[explain] wrote $name")
    }
    spark.stop()
  }
}
