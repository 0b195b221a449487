package graft

import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, PqIndex}
import graft.queries.{Similarity, Tables}

/** IVFADC product quantization (q117) against the testdata embeddings. */
class PqIndexSpec extends SparkSpec {

  private lazy val corpus = Tables(spark, "/root/testdata/sf0.001", "embeddings")

  test("codes are m-wide and in [0, numCodes); refit is deterministic") {
    val pq = PqIndex.fit(corpus, m = 16, numCodes = 16)
    assert(pq.m == 16 && pq.numCodes == 16 && pq.dSub == 4)
    val codes = corpus.select(pq.encode(col("embedding")).as("codes"))
      .select(explode(col("codes")).as("c"))
      .agg(min("c"), max("c"), count(lit(1))).head
    assert(codes.getInt(0) >= 0 && codes.getInt(1) < 16,
      s"codes out of range: ${codes.getInt(0)}..${codes.getInt(1)}")
    assert(codes.getLong(2) % 16 == 0, "every vector must emit exactly m codes")
    // fit over unchanged data reproduces the identical codebooks (the
    // never-rand() rule: index rebuilds must be replayable)
    val again = PqIndex.fit(corpus, m = 16, numCodes = 16)
    def flat(cb: Array[Array[Array[Float]]]): Array[Float] =
      cb.flatMap(_.flatMap(_.toSeq))
    assert(flat(pq.codebooks).sameElements(flat(again.codebooks)),
      "refit must be bit-identical")
  }

  test("ADC score equals the dot product with the reconstructed unit vector") {
    val pq = PqIndex.fit(corpus, m = 16, numCodes = 16)
    val q: Seq[Seq[Double]] = corpus.filter(col("vec_id") === 0)
      .select(pq.adcTable(col("embedding")).as("tbl")).head
      .getAs[scala.collection.Seq[scala.collection.Seq[Double]]](0)
      .map(_.toList).toList
    val rows = corpus.filter(col("vec_id") < 50)
      .select(col("vec_id"), pq.encode(col("embedding")).as("codes"),
        graft.functions.Vectors.unit(col("embedding")).as("u"),
        pq.adcScore(typedlit(q), pq.encode(col("embedding"))).as("adc"))
      .collect()
    val qUnit = corpus.filter(col("vec_id") === 0)
      .select(graft.functions.Vectors.unit(col("embedding"))).head.getSeq[Float](0).toArray
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      // reconstruct: concatenate the chosen codewords
      val recon = codes.zipWithIndex.flatMap { case (c, j) => pq.codebooks(j)(c) }.toArray
      val want = qUnit.zip(recon).map { case (a, b) => a.toDouble * b.toDouble }.sum
      assert(math.abs(r.getDouble(3) - want) < 1e-6,
        s"vec ${r.getLong(0)}: adc ${r.getDouble(3)} != reconstructed dot $want")
    }
  }

  test("IVFADC with exact rerank recalls most of the brute-force top-5") {
    val ivf = IvfIndex.fit(corpus, k = 10)
    val pq = PqIndex.fit(corpus, m = 16, numCodes = 16)
    val queries = corpus.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, corpus, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = PqIndex.search(ivf, pq, queries, corpus, k = 5, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the IVF probe set bounds recall from above; PQ + the 8x rerank
    // shortlist must not lose more than a little on top of that bound —
    // assert RELATIVE to the float IVF path so the pin survives testdata
    // drift in the probe-set ceiling
    val floatIvf = IvfIndex.search(ivf, queries, corpus, k = 5, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    val ceiling = (exact & floatIvf).size.toDouble / exact.size
    assert(recall > 0.6, s"IVFADC recall@5 = $recall with 4/10 cells probed")
    assert(recall >= ceiling - 0.15,
      s"PQ shortlist loses too much vs float IVF: $recall vs ceiling $ceiling")
  }

  test("persisted code index: searchIndexed equals in-memory search and prunes the scan") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: QueryStageExec => scans(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case o => o.children.flatMap(scans)
    }
    val ivf = IvfIndex.fit(corpus, k = 10)
    val pq = PqIndex.fit(corpus, m = 16, numCodes = 16)
    val codePath = "/tmp/graft_pq_spec_index"
    val floatPath = "/tmp/graft_pq_spec_findex"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(codePath))
    rm(new java.io.File(floatPath))
    graft.ops.Bucketing.writePartitioned(
      PqIndex.assign(ivf, pq, corpus), codePath, Seq("bucket"))
    graft.ops.Bucketing.writePartitioned(
      IvfIndex.assign(ivf, corpus), floatPath, Seq("bucket"))
    val queries = corpus.filter(col("vec_id") < 10)
    val nProbe = 2 // fewer than the 10 cells, so pruning is exercised
    val indexed = PqIndex.searchIndexed(ivf, pq, queries,
      spark.read.parquet(codePath), spark.read.parquet(floatPath),
      k = 5, nProbe = nProbe)
    val rows = indexed.orderBy("query_id", "rank").collect()
    val inMem = PqIndex.search(ivf, pq, queries, corpus, k = 5, nProbe = nProbe)
      .orderBy("query_id", "rank").collect()
    assert(rows.map(_.toString).toSeq == inMem.map(_.toString).toSeq,
      "persisted-index search must equal the in-memory path")
    // the code-table scan touches only the probed bucket directories
    val probed = queries
      .select(explode(ivf.probeBuckets(col("embedding"), nProbe)).as("b"))
      .distinct().count()
    val bucketDirs = new java.io.File(codePath).listFiles
      .count(_.getName.startsWith("bucket="))
    assert(probed < bucketDirs, "test must actually exercise pruning")
    val codeScan = scans(indexed.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("graft_pq_spec_index")))
    assert(codeScan.nonEmpty, "expected a FileSourceScan over the code index")
    assert(codeScan.head.selectedPartitions.partitionCount == probed,
      s"expected $probed pruned buckets of $bucketDirs, " +
        s"got ${codeScan.head.selectedPartitions.partitionCount}")
  }

  test("PQ code-index lifecycle: append adds exactly the batch, retract restores content, compact is content-identical") {
    val ivf = IvfIndex.fit(corpus, k = 10)
    val pq = PqIndex.fit(corpus, m = 16, numCodes = 16)
    // MUTATED store → pid-scoped path (two concurrent JVMs must not race)
    val path = s"/tmp/graft_pq_lifecycle_pid${ProcessHandle.current().pid()}"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(path))
    val base = corpus.filter(col("vec_id") % 5 =!= 0)
    val batch = corpus.filter(col("vec_id") % 5 === 0)
    graft.ops.Bucketing.writePartitioned(
      PqIndex.assign(ivf, pq, base), path, Seq("bucket"))
    def store() = spark.read.parquet(path)
    def rows() = store().select("vec_id", "codes", "bucket")
      .collect().map(_.toSeq).toSet
    val baseRows = rows()

    // APPEND under the frozen models: exactly the batch's code rows land
    PqIndex.appendToIndex(ivf, pq, batch, path)
    val appended = rows()
    val expectBatch = PqIndex.assign(ivf, pq, batch)
      .select("vec_id", "codes", "bucket")
      .collect().map(_.toSeq).toSet
    assert(appended == baseRows ++ expectBatch,
      "append must add exactly the batch's frozen-model code rows")

    // RETRACT via the shared bucket surgery (schema-agnostic: survivor
    // rewrite carries the store's own columns, codes included)
    IvfIndex.retractFromIndex(spark, ivf, batch, path)
    assert(rows() == baseRows,
      "retract must restore the pre-append store content exactly")

    // COMPACT: content-identical fold of the re-appended small files
    PqIndex.appendToIndex(ivf, pq, batch, path)
    val full = rows()
    val dst = path + "_compact"
    rm(new java.io.File(dst))
    IvfIndex.compactIndex(spark, path, dst)
    assert(spark.read.parquet(dst).select("vec_id", "codes", "bucket")
        .collect().map(_.toSeq).toSet == full,
      "compaction must be content-identical on the code store")
    rm(new java.io.File(path)); rm(new java.io.File(dst))
  }

  test("rerank repairs ADC rank inversions: top-1 agrees with IVF float search") {
    val ivf = IvfIndex.fit(corpus, k = 10)
    val pq = PqIndex.fit(corpus, m = 16, numCodes = 16)
    val queries = corpus.filter(col("vec_id") < 20)
    val floatTop = IvfIndex.search(ivf, queries, corpus, k = 1, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // full-width shortlist: every ADC candidate is reranked exactly, so the
    // top-1 within the same probe set must match the float path exactly
    val pqTop = PqIndex.search(ivf, pq, queries, corpus, k = 1, nProbe = 4,
        rerankFactor = corpus.count().toInt)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pqTop == floatTop,
      s"full-width rerank must equal the float IVF top-1; diff = ${
        (pqTop.toSet diff floatTop.toSet).take(5)}")
  }
}
