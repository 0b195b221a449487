// Derive the sf1 embeddings corpus at /tmp/graft_sf1/embeddings.parquet —
// the vector-side extension of the round-11 derived 10x corpus
// (documents: replica-keyed word re-order; events: offset ids). Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/jsontoparquetspark_2.13-0.1.0.jar \
//     -I tools/derive_sf1_embeddings.scala
//
// Convention (deterministic, engine-replayable — the q132/q134 rule):
// replica r in 0..9, vec_id' = vec_id + r*1_000_000 (the snapshot-clone
// stride), label preserved; r=0 is the verbatim sf0.1 table, r>0 perturbs
// every component by a replica-keyed hash epsilon
//   x_i' = x_i + 0.05 * (xxhash64(vec_id, r, i) mod 2001 - 1000)/1000
// so cluster structure scales honestly (10x points per label, cluster
// spread widened by a bounded +-0.05 jitter), no exact-duplicate vectors,
// and the whole table re-derives bit-identically from sf0.1.
import org.apache.spark.sql.functions._
val src = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
val replicas = (0 until 10).map { r =>
  if (r == 0) src
  else src.select(
    (col("vec_id") + lit(r.toLong * 1000000L)).as("vec_id"),
    // keep element type FLOAT: Spark division yields double, and the
    // PQ/quantized paths read the column as array<float>
    transform(col("embedding"), (x, i) =>
      (x + lit(0.05f) *
        ((pmod(xxhash64(col("vec_id"), lit(r), i), lit(2001L)) - lit(1000L))
          .cast("float") / lit(1000.0f))).cast("float")).as("embedding"),
    col("label"))
}
replicas.reduce(_ unionByName _)
  .repartition(8)
  .write.mode("overwrite").parquet("/tmp/graft_sf1/embeddings.parquet")
val out = spark.read.parquet("/tmp/graft_sf1/embeddings.parquet")
println(s"DERIVE_EMB rows=${out.count()} dims=${out.selectExpr("size(embedding)").distinct().collect().map(_.getInt(0)).mkString(",")} labels=${out.select("label").distinct().count()}")
sys.exit(0)
