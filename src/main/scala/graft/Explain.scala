package graft

/** Plan-audit utility (not part of the driver contract):
  * `runMain graft.Explain <queryName> [sfDir] [mode]` prints the
  * formatted plan of one contract query — the loop behind "explain the
  * plan and iterate until it's the plan you'd want".
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error(s"usage: Explain <query> [sfDir] [mode]; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val mode = args.lift(2).getOrElse("formatted")
    val spark = graft.core.GraftSession.get()
    SparkEntry.queries(name)(spark, sfDir).explain(mode)
    spark.stop()
  }
}
