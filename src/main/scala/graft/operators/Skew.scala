package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling helpers (SURVEY.md §7.4 100 TB posture: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; salting
  * is the complementary technique for skewed AGGREGATIONS, where one hot
  * key funnels into a single reducer. `saltedAgg` runs the aggregation in
  * two phases: a salted partial pass fans the hot key across
  * `saltBuckets` reducers, then a cheap final pass over `saltBuckets`
  * rows per key combines the partials. Correct for any agg expressible
  * as partial+final (sum/count/min/max and their compositions).
  */
object Skew {

  /** Two-phase salted aggregation: `aggs` maps output column name →
    * (partial agg of input col, final agg of partial col). */
  def saltedAgg(df: DataFrame, key: Seq[String], saltBuckets: Int,
                aggs: Map[String, (Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("_salt",
      (rand(seed = 42) * saltBuckets).cast("int"))
    val partialExprs = aggs.map { case (name, (partial, _)) =>
      partial.as(s"_p_$name")
    }.toSeq
    val partial = salted.groupBy((key :+ "_salt").map(col): _*)
      .agg(partialExprs.head, partialExprs.tail: _*)
    val finalExprs = aggs.map { case (name, (_, fin)) =>
      fin(col(s"_p_$name")).as(name)
    }.toSeq
    partial.groupBy(key.map(col): _*)
      .agg(finalExprs.head, finalExprs.tail: _*)
  }

  /** Salted broadcast-replicated join for a skewed fact side against a
    * small build side: fact rows get a random salt, the build side is
    * exploded across all salt values, and the join key becomes
    * (key, salt) — hot keys spread over `saltBuckets` tasks. For build
    * sides small enough to broadcast this is belt-and-braces (broadcast
    * already avoids the skewed shuffle); the same rewrite applies
    * unchanged when the build side must shuffle. */
  def saltedJoin(fact: DataFrame, build: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      (rand(seed = 42) * saltBuckets).cast("int"))
    val replicatedBuild = build.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(replicatedBuild, Seq(key, "_salt")).drop("_salt")
  }
}
