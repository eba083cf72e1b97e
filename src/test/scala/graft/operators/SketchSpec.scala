package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The sketch/approximation family beyond HLL (q41) and
  * approx_percentile (q51): Bloom filter membership, count-min frequency,
  * frequent-item detection, stratified sampling. All are bounded-error
  * streaming-mergeable structures — the 100 TB substitutes for exact
  * distinct/count/membership state. No DuckDB oracle (sketches don't
  * hash-match across engines); properties are asserted instead. */
class SketchSpec extends SparkSpec {

  private def orders = Tables.load(spark, sf001, "orders")
  private def docs = Tables.load(spark, sf001, "documents")

  test("bloom filter: zero false negatives, fpp within budget") {
    val bf = orders.stat.bloomFilter("o_orderkey", expectedNumItems = 20000, fpp = 0.01)
    import spark.implicits._
    val present = orders.select("o_orderkey").as[Long].collect()
    assert(present.forall(bf.mightContain), "bloom filters never false-negative")
    // absent keys: ids far outside the keyspace
    val absent = (10_000_000L until 10_100_000L)
    val fp = absent.count(bf.mightContain).toDouble / absent.size
    assert(fp < 0.03, s"false-positive rate $fp exceeds 3x the 1% budget")
  }

  test("count-min sketch: overestimates only, within eps*n") {
    val cms = docs.stat.countMinSketch("lang", eps = 0.01, confidence = 0.99, seed = 42)
    val truth = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    truth.foreach { case (lang, exact) =>
      val est = cms.estimateCount(lang)
      assert(est >= exact, s"count-min never underestimates ($lang)")
      assert(est <= exact + (0.01 * n).ceil.toLong + 1, s"$lang est $est vs $exact")
    }
  }

  test("freqItems surfaces the dominant language") {
    val items = docs.stat.freqItems(Array("lang"), 0.3)
      .collect()(0).getSeq[String](0)
    assert(items.contains("en"), s"en (majority) missing from $items")
  }

  test("sampleBy: per-stratum fractions honored approximately") {
    val fractions = Map("en" -> 0.2, "zh" -> 0.8)
    val sampled = docs.stat.sampleBy("lang", fractions, seed = 7L)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // only requested strata appear
    assert(sampled.keySet.subsetOf(fractions.keySet))
    val enRate = sampled.getOrElse("en", 0L).toDouble / totals("en")
    val zhRate = sampled.getOrElse("zh", 0L).toDouble / totals("zh")
    assert(math.abs(enRate - 0.2) < 0.15, s"en rate $enRate")
    assert(math.abs(zhRate - 0.8) < 0.15, s"zh rate $zhRate")
  }
}
