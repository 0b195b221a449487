package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Curation, Dedup, DedupStore, Extras, Q, Relational, Release, Similarity, Tables, TextAnalysis, Training}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The full registry lives in `graft.queries.*`; each entry pairs a Spark
  * implementation with (where SQL-expressible) a DuckDB oracle statement.
  */
object SparkEntry {

  /** Every registered query. */
  val registry: Map[String, Q] =
    Relational.all ++ TextAnalysis.all ++ Dedup.all ++ DedupStore.all ++
      Similarity.all ++ Extras.all ++ Training.all ++ Curation.all ++
      Release.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Pricing-summary aggregation over lineitem (q05).
    */
  def entry(spark: SparkSession): DataFrame =
    registry("q05_agg_pricing").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (LSH/MinHash/SimHash internals) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, Q(_, Some(sql), _)) => name -> sql }
}
