package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark implementation plus, when the
  * semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle statement
  * over the same parquet tables (driver contract, SparkEntry.oracleSql).
  *
  * Determinism rules applied to every oracle-checked query (the driver
  * hash-compares values):
  *   - results carry a total deterministic ORDER BY on both sides;
  *   - double aggregates go through exact per-value DECIMAL casts
  *     (order-independent sums), surfaced as DOUBLE on both sides;
  *   - TimestampType never appears raw in a result — always formatted to a
  *     string (Spark µs-instant vs DuckDB naive-ns would hash-differ);
  *   - aliases match exactly between the Spark plan and the oracle SQL.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Q {
  def apply(doc: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(fn, Some(oracle), doc)
  def noOracle(doc: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(fn, None, doc)
}
