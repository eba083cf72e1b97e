package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MinHash sketch Aggregator: signature values, merge associativity
  * across partitions, and agreement with the per-seed min(md5) SQL
  * formulation. */
class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(x: String): String =
    MessageDigest.getInstance("MD5")
      .digest(x.getBytes(StandardCharsets.UTF_8)).map("%02x".format(_)).mkString

  test("signature equals per-seed min over md5('{i}:{shingle}')") {
    val shingles = Seq("alpha", "beta", "gamma", "delta")
    val df = shingles.toDF("s").withColumn("g", lit(1))
    val sig = df.groupBy("g").agg(MinHashAgg.minhash(4)(col("s")).as("sig"))
      .head().getSeq[String](1)
    val want = (0 until 4).map(i => shingles.map(sh => md5Hex(s"$i:$sh")).min)
    assert(sig === want)
  }

  test("partition count does not change the sketch (merge correctness)") {
    val data = (1 to 200).map(i => (i % 7, s"shingle_$i"))
    val one = data.toDF("g", "s").repartition(1)
      .groupBy("g").agg(MinHashAgg.minhash(8)(col("s")).as("sig"))
    val many = data.toDF("g", "s").repartition(16)
      .groupBy("g").agg(MinHashAgg.minhash(8)(col("s")).as("sig"))
    assert(one.except(many).isEmpty && many.except(one).isEmpty)
  }

  test("matches the old 8-way min(md5) aggregation on real shingles") {
    val docs = graft.core.Tables.load(spark, sf0001, "documents").limit(50)
    val w = split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")
    val sh = docs
      .withColumn("_w", w)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("_w")) - 2),
          i => array_join(slice(col("_w"), i, lit(3)), " ")))).as("s"))
    val viaAgg = sh.groupBy("doc_id")
      .agg(MinHashAgg.minhash(4)(col("s")).as("sig"))
      .select(col("doc_id") +: (0 until 4).map(i => col("sig").getItem(i).as(s"mh$i")): _*)
    val mhAggs = (0 until 4).map(i => min(md5(concat(lit(s"$i:"), col("s")))).as(s"mh$i"))
    val viaMin = sh.groupBy("doc_id").agg(mhAggs.head, mhAggs.tail: _*)
    assert(viaAgg.except(viaMin).isEmpty && viaMin.except(viaAgg).isEmpty)
  }
}
