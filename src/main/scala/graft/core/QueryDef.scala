package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract: a named
  * DataFrame query plus (when SQL-expressible) an equivalent ANSI SQL
  * oracle that DuckDB can run on the same parquet tables.
  *
  * Determinism rules (so the oracle hash-compare is byte-stable):
  *   - every query ends in a total ORDER BY (unique key included);
  *   - floating-point aggregates are rounded (2-6 dp) identically on
  *     both sides;
  *   - output column names are aliased identically on both sides.
  */
final case class Q(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
