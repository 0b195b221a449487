package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared ranking tail of every ANN/kNN variant: per-query top-k of a
  * (query_id, neighbor_id, sim) frame, deterministically tie-broken.
  * Plans as WindowGroupLimit — the rank filter is pushed into the sort, so
  * each partition keeps only k rows per query.
  */
object TopK {

  def perQuery(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }
}
