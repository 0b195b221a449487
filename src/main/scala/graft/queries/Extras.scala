package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.ops.DtCoercion

/** Multimodal plumbing + reference-parity coercion exercised over the driver
  * tables (the full NDJSON pipeline parity is covered by ScalaTest golden
  * tests over generated findings fixtures; these queries put the same
  * operators under the DuckDB oracle).
  */
object Extras {

  val all: Map[String, Q] = Map(
    "q39_multimodal_bytes" -> Q(
      "Opaque binary payload accounting per source (octet-exact both engines)",
      """SELECT source, CAST(SUM(OCTET_LENGTH(ENCODE(text))) AS BIGINT) AS total_bytes,
        |  COUNT(*) AS n_docs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("source"), encode(col("text"), "UTF-8").as("payload"))
        .groupBy("source")
        .agg(
          sum(length(col("payload")).cast("long")).as("total_bytes"),
          count(lit(1)).as("n_docs"))
        .orderBy("source")
    },

    "q40_dt_roundtrip" -> Q(
      "Reference `_dt` coercion semantics: ISO string at 3 nesting levels → timestamp, " +
        "verified by value roundtrip (oracle computes the identity)",
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS created,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS nested_created
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val iso = date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
      val nested = Tables(s, dir, "orders").select(
        col("o_orderkey"),
        iso.as("created_time_dt"),
        struct(struct(iso.as("deep_dt")).as("inner"),
          array(struct(iso.as("elem_dt"))).as("items")).as("meta"))
      val coerced = DtCoercion.coerceDtFields(nested)
      coerced.select(
        col("o_orderkey"),
        date_format(col("created_time_dt"), "yyyy-MM-dd HH:mm:ss").as("created"),
        date_format(col("meta.inner.deep_dt"), "yyyy-MM-dd HH:mm:ss").as("nested_created"))
        .orderBy("o_orderkey")
    })
}
