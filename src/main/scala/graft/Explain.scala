package graft
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.get()
    val dir = "/root/testdata/sf0.1"
    for (name <- args) {
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
