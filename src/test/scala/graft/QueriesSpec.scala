package graft

import graft.core.Q

/** Smoke-level regression net over the whole driver contract: every
  * SparkEntry query runs at sf0.001, returns its declared deterministic
  * shape, and (where oracled) declares matching column names on both
  * sides — the cheap local proxy for the driver's DuckDB gate. */
class QueriesSpec extends SparkSpec {

  private val expectedNonEmpty = SparkEntry.allQueries.map(_.name).toSet --
    // legitimately empty at tiny scale: near-dup thresholds may not fire
    Set("q29_dedup_ngram_jaccard", "q30_dedup_minhash_lsh",
      "q32_dedup_embedding_cosine", "q43_range_join",
      "q07_customers_without_orders", "q59_dedup_groups_cc")

  SparkEntry.allQueries.foreach { q =>
    test(s"${q.name} runs and has a sane shape") {
      val df = q.spark(spark, sf0001)
      val rows = df.count()
      assert(df.columns.nonEmpty)
      assert(df.columns.distinct.length === df.columns.length,
        s"duplicate column names in ${df.columns.mkString(",")}")
      if (expectedNonEmpty(q.name)) assert(rows > 0, s"${q.name} returned 0 rows")
    }
  }

  test("oracle SQL column aliases appear in each oracled query's SQL text") {
    // weak but fast sanity: every Spark output column name occurs in the
    // oracle SQL (the driver compares sorted-by-name columns)
    SparkEntry.allQueries.foreach {
      case Q(name, fn, Some(sql)) =>
        val cols = fn(spark, sf0001).columns
        val lower = sql.toLowerCase
        cols.foreach { c =>
          assert(lower.contains(c.toLowerCase),
            s"$name: column '$c' not mentioned in oracle SQL")
        }
      case _ =>
    }
  }

  test("entry() returns rows (driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
