package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex
import graft.streaming.VectorIngestStream

/** Streaming vector ingest: each micro-batch must behave EXACTLY like one
  * daily batch absorb of the persisted ANN index — probe results equal to
  * the batch operator's, the index left twin-identical to sequential
  * batch absorbs, a full replay byte-stable on index and results, a
  * partial overlap absorbed remainder-only, and a tombstoned vector
  * refused (the forget guarantee as plumbing).
  */
class VectorIngestStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def vecRows(df: DataFrame): Seq[(Long, Seq[Float])] =
    df.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq

  private def idBuckets(path: String): Set[(Long, Int)] =
    spark.read.parquet(path).select("vec_id", "bucket")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  private def resultSet(df: DataFrame): Set[List[Any]] =
    df.select("query_id", "neighbor_id", "rank", "sim")
      .collect().map(_.toSeq.toList).toSet

  private lazy val emb = graft.queries.Tables(spark, dir, "embeddings")
  private lazy val seed = emb.filter(pmod(col("vec_id"), lit(5)).isin(1, 2))
  private lazy val b1 = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
  private lazy val b2 = emb.filter(pmod(col("vec_id"), lit(5)) === 4)
  private lazy val b3 = emb.filter(pmod(col("vec_id"), lit(5)) === 3)
  private lazy val model = IvfIndex.fit(seed.coalesce(1), k = 8, maxIter = 5)

  private def buildIndex(path: String): Unit =
    graft.ops.Bucketing.writePartitioned(
      IvfIndex.assign(model, seed), path, Seq("bucket"))

  test("micro-batches equal batch probes, twin-identical index, replay byte-stable") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_vec_stream").toString
    val live = s"$root/live"; val twin = s"$root/twin"; val results = s"$root/results"
    buildIndex(live); buildIndex(twin)

    // the batch twin: sequential daily absorbs through the BATCH operators
    val exp1 = resultSet(IvfIndex.searchIndexed(model, b1, spark.read.parquet(twin), k = 5))
    IvfIndex.appendToIndex(model, b1, twin)
    val exp2 = resultSet(IvfIndex.searchIndexed(model, b2, spark.read.parquet(twin), k = 5))
    IvfIndex.appendToIndex(model, b2, twin)
    assert(exp1.nonEmpty && exp2.nonEmpty, "fixture must exercise store hits")

    val input = MemoryStream[(Long, Seq[Float])]
    val q = VectorIngestStream.start(
      input.toDF().toDF("vec_id", "embedding"), model, live, results,
      queryName = "vector_ingest_t", checkpointDir = Some(s"$root/ckpt"))
    input.addData(vecRows(b1): _*)
    q.processAllAvailable()
    input.addData(vecRows(b2): _*)
    q.processAllAvailable()
    q.stop()

    assert(resultSet(spark.read.parquet(s"$results/batch=0")) == exp1,
      "micro-batch 1 must rank exactly the batch operator's neighbors")
    assert(resultSet(spark.read.parquet(s"$results/batch=1")) == exp2,
      "micro-batch 2 must rank against the index GROWN by batch 1")
    assert(idBuckets(live) == idBuckets(twin),
      "stream absorbs must leave the index twin-identical to batch absorbs")

    // FULL REPLAY (fresh checkpoint, same batches): both batches are
    // already absorbed — empty remainders, index and results untouched
    val before = idBuckets(live)
    val res0 = resultSet(spark.read.parquet(s"$results/batch=0"))
    val input2 = MemoryStream[(Long, Seq[Float])]
    val q2 = VectorIngestStream.start(
      input2.toDF().toDF("vec_id", "embedding"), model, live, results,
      queryName = "vector_ingest_replay", checkpointDir = Some(s"$root/ckpt2"))
    input2.addData(vecRows(b1): _*)
    q2.processAllAvailable()
    input2.addData(vecRows(b2): _*)
    q2.processAllAvailable()
    q2.stop()
    assert(idBuckets(live) == before, "replay must not grow the index")
    assert(resultSet(spark.read.parquet(s"$results/batch=0")) == res0,
      "replay must leave results byte-stable")
  }

  test("partial overlap absorbs only the remainder; tombstoned vectors are refused") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_vec_stream2").toString
    val live = s"$root/live"; val results = s"$root/results"
    buildIndex(live)
    IvfIndex.appendToIndex(model, b1, live) // b1 pre-absorbed

    // tombstone one b3 vector: it must never enter the index
    val tombstoned = b3.select(col("vec_id")).orderBy("vec_id").limit(1)
      .collect().head.getLong(0)
    spark.range(1).select(lit(tombstoned).as("doc_id"))
      .write.parquet(s"$root/tombstones")

    // expected: remainder = b3 minus the tombstoned id, probed against the
    // CURRENT store (seed + b1) through the batch operator
    val remainderExp = b3.filter(col("vec_id") =!= tombstoned)
    val expected = resultSet(
      IvfIndex.searchIndexed(model, remainderExp, spark.read.parquet(live), k = 5))
    val before = idBuckets(live)

    val input = MemoryStream[(Long, Seq[Float])]
    val q = VectorIngestStream.start(
      input.toDF().toDF("vec_id", "embedding"), model, live, results,
      queryName = "vector_ingest_partial", checkpointDir = Some(s"$root/ckpt"),
      tombstonePath = Some(s"$root/tombstones"))
    input.addData(vecRows(b1.unionByName(b3)): _*) // b1 = the overlap
    q.processAllAvailable()
    q.stop()

    assert(resultSet(spark.read.parquet(s"$results/batch=0")) == expected,
      "the overlap batch must probe exactly the not-yet-absorbed remainder")
    val after = idBuckets(live)
    val grown = after -- before
    assert(grown.map(_._1) ==
      remainderExp.select("vec_id").collect().map(_.getLong(0)).toSet,
      "only the remainder may be absorbed")
    assert(!after.map(_._1).contains(tombstoned),
      "a tombstoned vector must never enter the index")
  }

  test("derived int8 + PQ artifacts absorb in lockstep with the float index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_vec_stream3").toString
    val live = s"$root/live"; val q8 = s"$root/q8"; val pqDir = s"$root/pq"
    buildIndex(live)
    graft.ops.Bucketing.writePartitioned(
      IvfIndex.assignQuantized(model, seed), q8, Seq("bucket"))
    val pqModel = graft.operators.PqIndex.fit(seed.coalesce(1), m = 8, numCodes = 16)
    graft.ops.Bucketing.writePartitioned(
      graft.operators.PqIndex.assign(model, pqModel, seed), pqDir, Seq("bucket"))

    val input = MemoryStream[(Long, Seq[Float])]
    val q = VectorIngestStream.start(
      input.toDF().toDF("vec_id", "embedding"), model, live, s"$root/results",
      queryName = "vector_ingest_lockstep", checkpointDir = Some(s"$root/ckpt"),
      quantizedIndexPath = Some(q8), pqIndex = Some((pqModel, pqDir)))
    input.addData(vecRows(b1): _*)
    q.processAllAvailable()
    q.stop()

    def ids(path: String): Set[Long] =
      spark.read.parquet(path).select("vec_id").collect().map(_.getLong(0)).toSet
    val expected = ids(live)
    assert(expected == (seed.select("vec_id").collect().map(_.getLong(0)).toSet ++
      b1.select("vec_id").collect().map(_.getLong(0)).toSet))
    assert(ids(q8) == expected,
      "the int8 index must carry exactly the float index's vectors")
    assert(ids(pqDir) == expected,
      "the PQ code index must carry exactly the float index's vectors")
  }
}
