package graft.sds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import Schemas.MaxBlockNum

/** ScalaCheck-generated property tests for the SCD2 invariants (SURVEY.md
  * §5.3): for ANY sequence of per-block upserts,
  *  - exactly one live row per entity that was ever written,
  *  - intervals within an entity never overlap and chain contiguously,
  *  - merging block-by-block equals merging the whole batch set-wise,
  *  - replaying any prefix is a no-op.
  * Cases are drawn from Gen with fixed seeds (deterministic CI).
  */
class Scd2PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val genOps: Gen[List[(Long, String, String)]] = for {
    n <- Gen.choose(1, 12)
    blocks <- Gen.pick(n, 1L to 40L)
    ops <- Gen.sequence[List[(Long, String, String)], (Long, String, String)](
      blocks.toList.sorted.map { b =>
        for {
          key <- Gen.oneOf("k1", "k2", "k3")
          value <- Gen.alphaLowerStr.map(_.take(4))
        } yield (b, key, value)
      })
  } yield ops

  private def agentsDf(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("start_block_num", "public_key", "name")
      .select(col("public_key"), lit(null).cast("string").as("organization_id"),
        col("name"), lit(0L).as("timestamp"), col("start_block_num"),
        lit(MaxBlockNum).as("end_block_num"))

  private def emptyAgents: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Schemas.tables("agents")._1)

  /** Collect + rebuild: truncates lineage so chained merges don't stack
    * an exponentially deep plan (the real store re-reads parquet between
    * batches, which does the same thing). */
  private def materialize(df: DataFrame): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(df.collect(): _*)),
      df.schema)

  test("SCD2 invariants hold for arbitrary upsert sequences") {
    samples(genOps, 12).filter(_.nonEmpty).foreach { ops =>
      val merged = Scd2.merge(emptyAgents, agentsDf(ops), Seq("public_key"))
      val rows = merged
        .select("public_key", "start_block_num", "end_block_num")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

      val byKey = rows.groupBy(_._1)
      // one live row per touched entity
      byKey.foreach { case (k, vs) =>
        assert(vs.count(_._3 == MaxBlockNum) === 1, s"live rows for $k: ${vs.toSeq}")
      }
      // contiguous, non-overlapping chains
      byKey.foreach { case (k, vs) =>
        val sorted = vs.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Array((_, _, e1), (_, s2, _)) =>
            assert(e1 === s2, s"gap/overlap in $k: ${sorted.toSeq}")
          case _ =>
        }
        assert(sorted.forall(v => v._2 < v._3))
      }
    }
  }

  test("block-at-a-time merging equals one set-wise batch merge") {
    samples(genOps, 6).filter(_.nonEmpty).foreach { ops =>
      val batch = Scd2.merge(emptyAgents, agentsDf(ops), Seq("public_key"))
      val incremental = ops.sortBy(_._1).foldLeft(emptyAgents) { (acc, op) =>
        materialize(Scd2.merge(acc, agentsDf(Seq(op)), Seq("public_key")))
      }
      assert(batch.except(incremental).isEmpty &&
        incremental.except(batch).isEmpty)
    }
  }

  test("replaying a prefix of already-applied blocks changes nothing") {
    samples(genOps, 6).filter(_.size >= 2).foreach { ops =>
      val applied = Scd2.merge(emptyAgents, agentsDf(ops), Seq("public_key"))
      val replay = agentsDf(ops.sortBy(_._1).take(ops.size / 2 + 1))
      val after = Scd2.merge(applied, replay, Seq("public_key"))
      assert(applied.except(after).isEmpty && after.except(applied).isEmpty)
    }
  }
}
