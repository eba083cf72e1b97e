package graft.functions

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The Misra-Gries guarantee under adversarial reduce/merge orders:
  * every item with true count > N/(cap+1) must survive any partition
  * split + merge tree — that superset property is exactly what makes
  * q121's sketch-then-exact-recount composition exact. Cases are drawn
  * from fixed seeds (deterministic CI), matching Scd2PropertySpec. */
class MisraGriesSpec extends AnyFunSuite with SparkSpec {

  private def drive(cap: Int, stream: Seq[String], parts: Int, seed: Long): MgSummary = {
    val agg = new MisraGriesAgg(cap)
    val rnd = new Random(seed)
    // random partition assignment, then a random merge order
    val bufs = stream.groupBy(_ => rnd.nextInt(parts)).values.toArray.map { part =>
      part.foldLeft(agg.zero)(agg.reduce)
    }
    val shuffled = rnd.shuffle(bufs.toSeq)
    agg.finish(shuffled.foldLeft(agg.zero)(agg.merge))
  }

  test("guarantee: items above N/(cap+1) always survive split+merge") {
    for (seed <- 1L to 40L) {
      val rnd = new Random(seed * 0x9e3779b97f4a7c15L)
      val cap = 1 + rnd.nextInt(12)
      // skewed stream: a few heavy items + a long uniform tail
      val heavy = (0 until 1 + rnd.nextInt(4)).flatMap(i =>
        Seq.fill(50 + rnd.nextInt(100))(s"heavy$i"))
      val tail = (0 until 300).map(_ => s"t${rnd.nextInt(80)}")
      val stream = rnd.shuffle(heavy ++ tail)
      val n = stream.length.toLong
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap

      val out = drive(cap, stream, parts = 1 + rnd.nextInt(5), seed = seed ^ 0x9e3779b9L)
      assert(out.n === n)
      assert(out.candidates.length <= cap)
      val mustSurvive = exact.collect { case (k, c) if c * (cap + 1) > n => k }
      mustSurvive.foreach(k => assert(out.candidates.contains(k),
        s"cap=$cap n=$n lost heavy item $k (count=${exact(k)})"))
    }
  }

  test("reduce-only path matches merge path on a deterministic stream") {
    val agg = new MisraGriesAgg(4)
    val stream = Seq.fill(60)("a") ++ Seq.fill(30)("b") ++ (0 until 40).map(i => s"x$i")
    val direct = agg.finish(stream.foldLeft(agg.zero)(agg.reduce))
    assert(direct.n === 130L)
    assert(direct.candidates.contains("a") && direct.candidates.contains("b"))
  }

  test("end-to-end over a DataFrame: sketch + recount equals exact groupBy") {
    val s = spark
    import s.implicits._
    val cap = 8
    val data = (Seq.fill(500)("hot1") ++ Seq.fill(300)("hot2") ++
      (0 until 2000).map(i => s"cold${i % 400}"))
    val df = data.toDF("token").repartition(7)
    val mg = org.apache.spark.sql.functions.udaf(new MisraGriesAgg(cap))
    import org.apache.spark.sql.functions._
    val sk = df.agg(mg(col("token")).as("s"))
      .select(col("s.candidates"), col("s.n")).head()
    val cands = sk.getSeq[String](0)
    val n = sk.getLong(1)
    assert(n === data.length.toLong)
    val got = df.filter(col("token").isin(cands: _*))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (cap + 1) > n)
      .as[(String, Long)].collect().toMap
    val want = data.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (cap + 1) > n }.toMap
    assert(got === want)
  }
}
