// Re-derive the 10x corpus at /tmp/graft_sf1 (documents + events) — the
// round-11 convention, preserved as a tool so a cleared /tmp can be
// rebuilt bit-identically. Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     -I tools/derive_sf1.scala
// (embeddings: tools/derive_sf1_embeddings.scala, needs the graft jar)
//
// documents: replica r in 0..9; r=0 is the verbatim sf0.1 table; r>0
// re-orders each doc's words by a replica-keyed hash (sort words by
// xxhash64(word, r)) — word multiset, lengths, and quality stats are
// preserved while shingle sets are disjoint across replicas, so near-dup
// pair density scales LINEARLY (10 copies of the corpus's own structure,
// not a 10-member exact-dup family per doc). doc_id' = doc_id + r*1e6
// (the snapshot-clone stride). Media payloads are synthesized from
// doc_id downstream, so replicas get distinct payloads automatically.
// events: replicas offset event_id by r*1e7 and user_id by r*1e6 —
// 10x density over the same time span.
import org.apache.spark.sql.functions._

val docsSrc = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
val docReplicas = (0 until 10).map { r =>
  if (r == 0) docsSrc
  else docsSrc.select(
    (col("doc_id") + lit(r.toLong * 1000000L)).as("doc_id"),
    array_join(
      transform(
        array_sort(transform(split(col("text"), " "),
          w => struct(xxhash64(w, lit(r)).as("h"), w.as("w")))),
        s => s.getField("w")),
      " ").as("text"),
    col("lang"), col("source"), col("n_chars"))
}
docReplicas.reduce(_ unionByName _)
  .repartition(16)
  .write.mode("overwrite").parquet("/tmp/graft_sf1/documents.parquet")

val evSrc = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
val evReplicas = (0 until 10).map { r =>
  if (r == 0) evSrc
  else evSrc.select(
    (col("event_id") + lit(r.toLong * 10000000L)).as("event_id"),
    col("ts"),
    (col("user_id") + lit(r.toLong * 1000000L)).as("user_id"),
    col("event_type"), col("value"), col("props"))
}
evReplicas.reduce(_ unionByName _)
  .repartition(16)
  .write.mode("overwrite").parquet("/tmp/graft_sf1/events.parquet")

val d = spark.read.parquet("/tmp/graft_sf1/documents.parquet")
val e = spark.read.parquet("/tmp/graft_sf1/events.parquet")
println(s"DERIVE docs=${d.count()} nchars_drift=${d.filter(length(col("text")) =!= col("n_chars")).count()} events=${e.count()}")
sys.exit(0)
