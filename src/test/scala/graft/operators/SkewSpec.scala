package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salting helpers produce results identical to the unsalted forms. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    // one hot key carrying 90% of rows
    val hot = (1 to 9000).map(i => ("hot", i.toDouble))
    val cold = (1 to 1000).map(i => (s"k${i % 50}", i.toDouble))
    (hot ++ cold).toDF("k", "v").repartition(8)
  }

  test("saltedAgg equals plain groupBy aggregation") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"), max(col("v")).as("mx"))
    val salted = Skew.saltedAgg(skewed, Seq("k"), saltBuckets = 8, aggs = Map(
      "n" -> (count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c)),
      "total" -> (sum(col("v")), (c: org.apache.spark.sql.Column) => sum(c)),
      "mx" -> (max(col("v")), (c: org.apache.spark.sql.Column) => max(c))))
    // doubles: compare after rounding (sum order differs by design)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("n"), round(col("total"), 6).as("total"), col("mx"))
    assert(norm(plain).except(norm(salted)).isEmpty &&
      norm(salted).except(norm(plain)).isEmpty)
  }

  test("saltedJoin equals plain join") {
    val build = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "tag")
    val plain = skewed.join(build, "k").groupBy("k", "tag").count()
    val salted = Skew.saltedJoin(skewed, build, "k", saltBuckets = 8)
      .groupBy("k", "tag").count()
    assert(plain.except(salted).isEmpty && salted.except(plain).isEmpty)
  }
}
