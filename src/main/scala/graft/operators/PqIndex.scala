package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Product quantization (PQ) — the memory tier BELOW the int8 index
  * ([[IvfIndex.assignQuantized]]) for approximate nearest neighbor at
  * 100 TB, after Jégou, Douze & Schmid, "Product Quantization for Nearest
  * Neighbor Search" (TPAMI 2011) — public method, original implementation.
  *
  * The unit vector is split into `m` contiguous subvectors; each subspace
  * gets its own tiny k-means codebook (`numCodes` centroids, trained on a
  * driver-bounded sample), and a corpus vector is stored as `m` small
  * integer codes. At the registered setting (dim 64, m=16, 16 codes) that
  * is 16 codes of 4 bits — 8 bytes against 256 float bytes, a 32×
  * compression (int8 is 4×). m=16 over 4-dim subspaces rather than m=8
  * over 8-dim is the same payload with measurably lower distortion on a
  * diffuse corpus (finer subspaces — recall@5 0.39 → above the spec bound
  * at the same rerank width). What makes PQ searchable without decoding is
  * ASYMMETRIC DISTANCE COMPUTATION (ADC): per query, precompute the
  * `m × numCodes` table of dot products between each query subvector and
  * each codeword — then a candidate's approximate cosine is `m` table
  * lookups and adds, never a float-vector touch.
  *
  * Spark mapping — everything is built-in codegen surface, no UDFs:
  *   - codebooks are plan LITERALS (m·numCodes·dSub floats — kilobytes);
  *   - [[Model.encode]] is a per-subspace argmin over `numCodes` l2
  *     distances (the [[IvfIndex]] `array_min`-over-structs trick);
  *   - [[Model.adcTable]] builds the per-query lookup table as an
  *     `array<array<double>>` column on the (small, broadcast) query side;
  *   - [[Model.adcScore]] is `aggregate(zip_with(codes, table, lookup))` —
  *     whole-stage-codegen'd HOFs over an 8-element array.
  *
  * The candidate walk composes with the IVF coarse quantizer exactly as in
  * the paper (IVFADC): probe `nProbe` cells, ADC-score only the codes in
  * those cells, then exactly rerank the per-query shortlist against the
  * float corpus — the same repair step the int8 path (q62) uses, fixing
  * quantization-induced rank inversions near the cut.
  *
  * Scale shape: the corpus-side payload entering the candidate join is
  * (id, bucket, 8 codes) — fixed-width and ~32× lighter than floats; the
  * query side (tables + probe buckets) broadcasts; the only exchanges are
  * the per-query top-k partials and the id-keyed rerank join, both
  * shortlist-sized. Training cost is driver-local Lloyd over a bounded
  * sample — independent of corpus size, like [[IvfIndex.fit]].
  */
object PqIndex {

  /** `codebooks(j)(c)` = codeword `c` of subspace `j` (unit-vector space). */
  final case class Model(codebooks: Array[Array[Array[Float]]]) {
    def m: Int = codebooks.length
    def numCodes: Int = codebooks.head.length
    def dSub: Int = codebooks.head.head.length

    private def subvec(u: Column, j: Int): Column = slice(u, j * dSub + 1, dSub)

    /** PQ codes of `emb`: `array<int>` of length `m`, each in
      * [0, numCodes) — per-subspace argmin code, pure codegen. Ties break
      * to the lowest code id (array_min orders by (distance, id)).
      */
    def encode(emb: Column): Column = {
      val u = Vectors.unit(emb)
      array((0 until m).map { j =>
        val sv = subvec(u, j)
        val zipped = array(codebooks(j).toSeq.zipWithIndex.map { case (cw, c) =>
          struct(Vectors.l2sq(sv, typedlit(cw.toSeq)).as("d"), lit(c).as("i"))
        }: _*)
        array_min(zipped).getField("i")
      }: _*)
    }

    /** Per-query ADC table: `array<array<double>>`, entry (j, c) = dot of
      * the query's j-th unit subvector with codeword c. Built on the query
      * side only — the corpus never evaluates it.
      */
    def adcTable(emb: Column): Column = {
      val u = Vectors.unit(emb)
      array((0 until m).map { j =>
        val sv = subvec(u, j)
        array(codebooks(j).toSeq.map(cw =>
          Vectors.dot(sv, typedlit(cw.toSeq)).cast("double")): _*)
      }: _*)
    }

    /** Approximate cosine via ADC: Σ_j table(j)(code_j). Equals the dot of
      * the unit query with the RECONSTRUCTED (codeword-concatenated) unit
      * corpus vector — exact in the quantized space.
      */
    def adcScore(tableCol: Column, codesCol: Column): Column =
      aggregate(
        zip_with(codesCol, tableCol, (c, t) => element_at(t, c + 1)),
        lit(0.0),
        (acc, x) => acc + x)
  }

  /** Train per-subspace codebooks with driver-local Lloyd iterations over a
    * deterministic, bounded sample (md5-ordered prefix — the same
    * never-`rand()` sampling rule as everywhere else in the engine; a refit
    * over unchanged data reproduces the identical model). The collect is
    * capped at `maxSample` rows of `dim` floats regardless of corpus size —
    * codebook quality needs a representative sample, not the corpus.
    */
  def fit(
      corpus: DataFrame,
      embCol: String = "embedding",
      idCol: String = "vec_id",
      m: Int = 16,
      numCodes: Int = 16,
      maxSample: Int = 65536,
      maxIter: Int = 10): Model = {
    val sample: Array[Array[Float]] = corpus
      .select(col(idCol), Vectors.unit(col(embCol)).as("u"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(maxSample)
      .select("u")
      .collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "PQ fit needs a non-empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must be divisible by m=$m subspaces")
    val dSub = dim / m
    Model(Array.tabulate(m) { j =>
      lloyd(sample.map(v => java.util.Arrays.copyOfRange(v, j * dSub, (j + 1) * dSub)),
        numCodes, maxIter)
    })
  }

  /** Plain Lloyd on the driver: deterministic init (k points evenly spaced
    * through the hash-shuffled sample), empty clusters keep their previous
    * centroid. The sample is bounded, so this is O(maxSample · k · d ·
    * iters) driver work — milliseconds at the registered settings.
    */
  private def lloyd(pts: Array[Array[Float]], k: Int, maxIter: Int): Array[Array[Float]] = {
    val n = pts.length
    val d = pts.head.length
    var centroids = Array.tabulate(k)(c => pts(((c.toLong * n) / k).toInt).clone())
    var it = 0
    while (it < maxIter) {
      val sums = Array.fill(k)(new Array[Double](d))
      val cnts = new Array[Long](k)
      pts.foreach { p =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var dd = 0.0
          var i = 0
          while (i < d) { val t = p(i) - centroids(c)(i); dd += t * t; i += 1 }
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        cnts(best) += 1
        var i = 0
        while (i < d) { sums(best)(i) += p(i); i += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (cnts(c) == 0L) centroids(c)
        else Array.tabulate(d)(i => (sums(c)(i) / cnts(c)).toFloat)
      }
      it += 1
    }
    centroids
  }

  /** Corpus side of the IVFADC index: (id, bucket, codes) — what you
    * persist partitioned by `bucket` at scale (8 code bytes + id per row).
    */
  def assign(
      ivf: IvfIndex.Model,
      pq: Model,
      corpus: DataFrame,
      embCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame =
    corpus.select(
      col(idCol),
      ivf.bucketOf(col(embCol)).as("bucket"),
      pq.encode(col(embCol)).as("codes"))

  /** APPEND a batch to a persisted [[assign]]-layout code index under the
    * FROZEN models — the PQ tier's entry in the store-lifecycle family
    * (dedup band index, IVF float index, pack/release manifests): new
    * vectors encode to 8-byte code rows and land as new files in their
    * `bucket=` directories only, nothing rewrites. The frozen-model
    * contract is the same as [[graft.operators.IvfIndex.appendToIndex]]'s:
    * codebooks and coarse centroids are the deployed artifact, so the
    * batch's bucket assignment is deterministic — which is also what lets
    * [[graft.operators.IvfIndex.retractFromIndex]] un-absorb the SAME
    * batch from this store verbatim (it re-derives the touched buckets by
    * re-assigning under the frozen coarse model and drops rows by id;
    * its survivor rewrite carries the store's own columns, codes
    * included) and [[graft.operators.IvfIndex.compactIndex]] fold its
    * small files (content-identical rewrite, schema-agnostic). The full
    * cycle is pinned in PqIndexSpec.
    */
  def appendToIndex(
      ivf: IvfIndex.Model,
      pq: Model,
      newVectors: DataFrame,
      path: String,
      embCol: String = "embedding"): Unit =
    assign(ivf, pq, newVectors, embCol).write
      .mode(org.apache.spark.sql.SaveMode.Append)
      .option("compression", "zstd")
      .partitionBy("bucket")
      .parquet(path)

  /** IVFADC over a PERSISTED [[assign]]-layout code index — the shape a
    * 100 TB deployment actually runs (the q56/q62 story at the PQ tier):
    * `codesIndexed` is the code table written once partitioned by
    * `bucket`, `floatIndexed` the float index in the same layout. The
    * distinct probed buckets are pushed as a static `bucket IN (...)`
    * predicate on BOTH scans, so candidate generation reads only the
    * probed partitions of an 8-byte-per-vector table, and the exact
    * rerank fetch prunes to the same directories. Same contract as
    * [[search]]: identical results for the same models/probe set
    * (asserted in PqIndexSpec).
    */
  def searchIndexed(
      ivf: IvfIndex.Model,
      pq: Model,
      queries: DataFrame,
      codesIndexed: DataFrame,
      floatIndexed: DataFrame,
      k: Int,
      nProbe: Int = 4,
      rerankFactor: Int = 8,
      embCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val shortlist = adcShortlistIndexed(
      ivf, pq, queries, codesIndexed, k, nProbe, rerankFactor, embCol, idCol)
    val probed: Array[Int] = queries
      .select(explode(ivf.probeBuckets(col(embCol), nProbe)).as("bucket"))
      .distinct().collect().map(_.getInt(0))
    val qf = broadcast(queries.select(col(idCol).as("query_id"), col(embCol).as("qv")))
    TopK.perQuery(
      shortlist
        .join(floatIndexed.filter(col("bucket").isin(probed.toSeq: _*))
          .select(col(idCol).as("neighbor_id"), col(embCol).as("cv")), "neighbor_id")
        .join(qf, "query_id")
        .select(col("query_id"), col("neighbor_id"),
          Vectors.cosine(col("qv"), col("cv")).as("sim")),
      k)
  }

  /** The ADC-scored per-query SHORTLIST of [[searchIndexed]] (probed-cell
    * code scan + ADC scoring): (query_id, neighbor_id), ≤ k·rerankFactor
    * rows per query. Exposed so the dump-readback oracle can persist
    * exactly the rows the exact float rerank consumes — the ADC kernel
    * (codebooks, lookup tables) stays spec-closed, everything downstream
    * of these ids is ANSI-replayable.
    */
  def adcShortlistIndexed(
      ivf: IvfIndex.Model,
      pq: Model,
      queries: DataFrame,
      codesIndexed: DataFrame,
      k: Int,
      nProbe: Int = 4,
      rerankFactor: Int = 8,
      embCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val qExploded = queries.select(
      col(idCol).as("query_id"),
      pq.adcTable(col(embCol)).as("tbl"),
      explode(ivf.probeBuckets(col(embCol), nProbe)).as("bucket"))
    // driver-bounded: ≤ queries × nProbe distinct buckets (and ≤ ivf k)
    val probed: Array[Int] = qExploded
      .select(col("bucket")).distinct().collect().map(_.getInt(0))
    val c = codesIndexed
      .filter(col("bucket").isin(probed.toSeq: _*))
      .select(col(idCol).as("neighbor_id"), col("bucket"), col("codes"))
    TopK.perQuery(
      c.join(broadcast(qExploded), Seq("bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          pq.adcScore(col("tbl"), col("codes")).as("sim"))
        .dropDuplicates("query_id", "neighbor_id"),
      k * rerankFactor)
      .select("query_id", "neighbor_id")
  }

  /** IVFADC top-`k`: probe `nProbe` IVF cells per query, ADC-score their
    * codes, take the per-query `k · rerankFactor` shortlist, then rerank
    * EXACTLY against the float corpus. Output (query_id, neighbor_id,
    * rank, sim) — the shared ANN shape; recall < 1 by construction.
    */
  def search(
      ivf: IvfIndex.Model,
      pq: Model,
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nProbe: Int = 4,
      rerankFactor: Int = 8,
      embCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val c = assign(ivf, pq, corpus, embCol, idCol)
      .select(col(idCol).as("neighbor_id"), col("bucket"), col("codes"))
    val q = broadcast(queries.select(
      col(idCol).as("query_id"),
      pq.adcTable(col(embCol)).as("tbl"),
      explode(ivf.probeBuckets(col(embCol), nProbe)).as("bucket")))
    val shortlist = TopK.perQuery(
      c.join(q, Seq("bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          pq.adcScore(col("tbl"), col("codes")).as("sim"))
        // a pair can meet through several probed buckets
        .dropDuplicates("query_id", "neighbor_id"),
      k * rerankFactor)
      .select("query_id", "neighbor_id")
    val qf = broadcast(queries.select(col(idCol).as("query_id"), col(embCol).as("qv")))
    TopK.perQuery(
      shortlist
        .join(corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("cv")), "neighbor_id")
        .join(qf, "query_id")
        .select(col("query_id"), col("neighbor_id"),
          Vectors.cosine(col("qv"), col("cv")).as("sim")),
      k)
  }
}
