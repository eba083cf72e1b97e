package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native pq_adc expression: value agreement with the HOF formulation
  * it replaces, null/domain edge cases, codegen path, SQL
  * registration. */
class PqAdcSpec extends SparkSpec {
  import spark.implicits._

  private val tables = Seq(
    Seq(10L, 20L, 30L), // m = 0
    Seq(1L, 2L, 3L), // m = 1
    Seq(100L, 200L, 300L)) // m = 2

  test("pq_adc matches a hand-computed lookup sum") {
    val df = Seq((Seq(2, 0, 1), tables)).toDF("codes", "dt")
    // tables[0][2] + tables[1][0] + tables[2][1] = 30 + 1 + 200
    assert(df.select(expr("pq_adc(codes, dt)")).head().getLong(0) === 231L)
  }

  test("agrees with the aggregate∘zip_with HOF it replaces, under codegen") {
    // deterministic pseudo-random codes/tables per row, through a real
    // scan so the codegen path runs
    val m = 8
    val ks = 16
    val rows = spark.range(500).select(
      transform(sequence(lit(0), lit(m - 1)),
        i => pmod(col("id") * 31 + i * 7, lit(ks)).cast("int")).as("codes"),
      transform(sequence(lit(0), lit(m - 1)), i =>
        transform(sequence(lit(0), lit(ks - 1)),
          k => pmod(col("id") * 13 + i * 5 + k * 3, lit(1000000)))).as("dt"))
    val both = rows.select(
      expr("pq_adc(codes, dt)").as("native"),
      aggregate(
        zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
          (c, mm) => element_at(element_at(col("dt"), mm + 1), c + 1)),
        lit(0L), (acc, x) => acc + x).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).isEmpty)
    assert(both.filter(col("native").isNull).isEmpty)
  }

  test("null input, null element, and out-of-range code → null") {
    assert(spark.sql(
      "SELECT pq_adc(CAST(NULL AS ARRAY<INT>), array(array(1L)))")
      .head().isNullAt(0))
    assert(spark.sql(
      "SELECT pq_adc(array(0, NULL), array(array(1L), array(2L)))")
      .head().isNullAt(0))
    assert(spark.sql( // code 5 outside a 1-entry subtable
      "SELECT pq_adc(array(5), array(array(1L)))").head().isNullAt(0))
    assert(spark.sql( // fewer tables than codes
      "SELECT pq_adc(array(0, 0), array(array(1L)))").head().isNullAt(0))
  }

  test("registered in SQL via extensions (interpreted path)") {
    assert(spark.sql("SELECT pq_adc(array(1), array(array(7L, 9L)))")
      .head().getLong(0) === 9L)
  }
}
