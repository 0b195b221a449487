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
    },

    "q43_term_df" -> Q(
      "Vocabulary building: per-term document frequency (explode + distinct-count)",
      """SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |GROUP BY term HAVING COUNT(DISTINCT doc_id) >= 10
        |ORDER BY term""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("term"))
        .groupBy("term")
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= 10)
        .orderBy("term")
    },

    // exact median (full per-group sort) for oracle parity; at 100 TB swap
    // to approx_percentile(col, 0.5, accuracy) — one pass, mergeable sketch
    "q44_profile" -> Q(
      "Column profiling: min/max/median/mean document length per source",
      """SELECT source,
        |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
        |  CAST(MAX(n_chars) AS BIGINT) AS max_chars,
        |  median(CAST(n_chars AS DOUBLE)) AS med_chars,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .groupBy("source")
        .agg(
          min(col("n_chars")).cast("long").as("min_chars"),
          max(col("n_chars")).cast("long").as("max_chars"),
          median(col("n_chars").cast("double")).as("med_chars"),
          (sum(col("n_chars")).cast("double") / count(lit(1))).as("mean_chars"))
        .orderBy("source")
    },

    "q45_media_meta" -> Q.noOracle(
      "Multimodal decode pipeline: binary payload → typed metadata, partition-local") {
      (s, dir) =>
        Multimodal.decodeMeta(Multimodal.withPayload(Tables(s, dir, "documents")))
          .toDF()
          .orderBy("doc_id")
    })
}
