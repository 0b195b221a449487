package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond dedup/similarity: embedding
  * quantization, deterministic dataset splits, and TF-IDF term scoring.
  * All pure codegen expressions; every query here is DuckDB-oracled.
  */
object Training {

  /** Int8 quantization codec — see [[graft.functions.Vectors.quantizeInt8]]
    * (moved there so the IVF operators can share the exact codec q48
    * audits).
    */
  def quantizeInt8(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.Vectors.quantizeInt8(v)

  /** Deterministic 80/10/10 train/val/test assignment — a pure function of
    * the row id (never `rand()`: retried tasks must re-deal identical
    * splits). Shared by the split audit (q49) and the cross-split
    * contamination scan (q82/q83) so the two can never disagree on what
    * "train" means. Mersenne-prime mod before the Knuth multiply keeps the
    * product under 2^63 on every engine (Spark wraps on overflow, DuckDB
    * raises — see q57); identical assignments for doc_id < 2^31-1.
    */
  def splitOf(docId: Column): Column = {
    val bucket = pmod(pmod(docId, lit(2147483647L)) * lit(2654435761L), lit(100L))
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
  }

  /** Cross-split contamination audit: for every val/test document, how many
    * of its DISTINCT word-k-gram windows also occur in ANY train-split
    * document. This is the canonical "did near-dups leak across the split"
    * check (run it after q49-style splitting and BEFORE training; a nonzero
    * `contam_frac` on an eval doc means its loss is partly memorization).
    * Exact duplicates are invisible to an exact-hash audit when the leak is
    * a near-dup — the n-gram form catches partial copies too.
    *
    * Plan shape (PLANS.md "q82"): the split predicate is a deterministic
    * function of a grouping column, so Catalyst pushes it BELOW the
    * distinct — each branch scans, explodes, and shuffles only its own
    * split's share of the corpus (~80%/20%), never the whole corpus twice.
    * The train-window set joins as a plain equi-join on the window key with
    * no broadcast hint: its size estimate is corpus-proportional, so the
    * planner/AQE picks SMJ at scale and broadcast only when it measures
    * small. At 100 TB swap the string keys for the 8-byte hashed twin
    * [[hashedSplitContam]] (q83).
    */
  def splitContam(docs: DataFrame, k: Int = 5): DataFrame = {
    val g = docs
      .select(col("doc_id"), splitOf(col("doc_id")).as("split"),
        explode(graft.functions.Text.shinglesSpaceSplit(col("text"), k)).as("g"))
      .distinct()
    val trainWindows = g.filter(col("split") === "train").select("g").distinct()
    g.filter(col("split") =!= "train")
      .join(trainWindows.withColumn("hit", lit(1L)), Seq("g"), "left")
      .groupBy("doc_id", "split")
      .agg(
        count(lit(1)).as("n_win"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("doc_id"), col("split"), col("n_win"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_win")).as("contam_frac"))
      .orderBy("doc_id")
  }

  /** The static side of the streaming contamination guard
    * ([[graft.streaming.ContamGuardStream]]): the distinct hashed-window
    * set of the train split, persisted offline (bucket it on `g` at scale
    * so per-micro-batch probes co-locate). Same hashing kernel as
    * [[hashedSplitContam]], so batch audit and streaming guard can never
    * disagree on what counts as a hit.
    */
  def trainWindowHashes(docs: DataFrame, k: Int = 5): DataFrame =
    docs.filter(splitOf(col("doc_id")) === "train")
      .select(explode(graft.functions.HashExpressions
        .shingleHashSet(split(col("text"), " ", -1), k)).as("g"))
      .distinct()

  /** q82's 100 TB twin (the q75→q81 move): identical contamination stats
    * over 8-byte XXH64 window hashes. The per-doc DISTINCT happens inside
    * the codegen `shingleHashSet` kernel, so the string form's corpus-wide
    * distinct exchange disappears and every shuffled key is a fixed-width
    * long. SplitContamSpec pins this row-identical to the oracle-checked
    * q82 on both testdata corpora.
    */
  def hashedSplitContam(docs: DataFrame, k: Int = 5): DataFrame = {
    val g = docs.select(
      col("doc_id"), splitOf(col("doc_id")).as("split"),
      explode(graft.functions.HashExpressions
        .shingleHashSet(split(col("text"), " ", -1), k)).as("g"))
    val trainWindows = g.filter(col("split") === "train").select("g").distinct()
    g.filter(col("split") =!= "train")
      .join(trainWindows.withColumn("hit", lit(1L)), Seq("g"), "left")
      .groupBy("doc_id", "split")
      .agg(
        count(lit(1)).as("n_win"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("doc_id"), col("split"), col("n_win"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_win")).as("contam_frac"))
      .orderBy("doc_id")
  }

  /** q82's oracle, shared with its hashed twin q83: the twin's output is
    * row-identical (SplitContamSpec pins it), so the same ANSI statement
    * oracles both.
    */
  private val splitContamOracleSql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
      |    CASE WHEN ((doc_id % 2147483647) * 2654435761) % 100 < 80 THEN 'train'
      |         WHEN ((doc_id % 2147483647) * 2654435761) % 100 < 90 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents),
      |s AS (SELECT doc_id, split,
      |        CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
      |             ELSE list_transform(range(1, len(toks) - 3),
      |                                 i -> array_to_string(toks[i:i+4], ' ')) END AS sh
      |      FROM t),
      |g AS (SELECT DISTINCT doc_id, split, unnest(sh) AS g FROM s),
      |tr AS (SELECT DISTINCT g FROM g WHERE split = 'train')
      |SELECT g.doc_id, g.split, COUNT(*) AS n_win,
      |  CAST(SUM(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
      |  CAST(SUM(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS contam_frac
      |FROM g LEFT JOIN tr ON g.g = tr.g
      |WHERE g.split <> 'train'
      |GROUP BY g.doc_id, g.split ORDER BY doc_id""".stripMargin

  // Portable token count (q27's arithmetic): identical length/replace
  // evaluation on both engines — the q93 budget must count tokens exactly
  // the way the Spark side does.
  private val tokCountSql =
    "CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 ELSE LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1 END"

  val all: Map[String, Q] = Map(
    // Storage-shrink path for 100 TB embedding lakes: int8 quantization is
    // 4x smaller than float32 and dot products stay SIMD-able. The query
    // verifies the codec numerically: saturation count + worst-case
    // reconstruction error per vector (max is order-independent, so the
    // doubles hash identically on both engines).
    "q48_embed_quantize" -> Q(
      "Int8 embedding quantization audit: per-vector saturation count and max " +
        "reconstruction error",
      """SELECT vec_id,
        |  CAST(len(list_filter(q, x -> abs(x) >= 127)) AS BIGINT) AS n_sat,
        |  list_aggregate(list_transform(list_zip(embedding, q),
        |    p -> abs(CAST(p[1] AS DOUBLE) - p[2] / 127.0)), 'max') AS max_err
        |FROM (
        |  SELECT vec_id, embedding,
        |    list_transform(embedding,
        |      x -> greatest(-127.0, least(127.0, floor(CAST(x AS DOUBLE) * 127 + 0.5)))) AS q
        |  FROM embeddings)
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), quantizeInt8(col("embedding")).as("q"))
        .select(
          col("vec_id"),
          size(filter(col("q"), x => abs(x) >= 127)).cast("long").as("n_sat"),
          array_max(zip_with(col("embedding"), col("q"),
            (x, q) => abs(x.cast("double") - q / lit(127.0)))).as("max_err"))
        .orderBy("vec_id")
    },

    // Reproducible train/val/test assignment: a deterministic function of
    // the row id, NOT rand() — a retried task must re-deal identical
    // splits (same invariant as Salting's content-hash salts). The Knuth
    // multiplicative hash is portable arithmetic both engines compute
    // exactly in int64 (doc_id is small; at scale swap in xxhash64 on the
    // Spark side and keep the split fractions).
    "q49_train_split" -> Q(
      "Deterministic 80/10/10 train/val/test split audit per source",
      """SELECT source, split, COUNT(*) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM (
        |  SELECT source, n_chars,
        |    CASE WHEN ((doc_id % 2147483647) * 2654435761) % 100 < 80 THEN 'train'
        |         WHEN ((doc_id % 2147483647) * 2654435761) % 100 < 90 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |GROUP BY source, split ORDER BY source, split""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("split", splitOf(col("doc_id")))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).cast("long").as("sum_chars"))
        .orderBy("source", "split")
    },

    // TF-IDF with a RATIONAL idf (tf * N / df, no log): log() libm
    // implementations can differ in the last ulp across engines, while
    // integer ratio arithmetic hashes identically. Top-3 terms per doc,
    // ties broken by term — fully deterministic.
    "q50_tfidf_top_terms" -> Q(
      "Top-3 TF-IDF terms per document (rational idf; first 50 docs)",
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT doc_id, term, rnk FROM (
        |  SELECT tf.doc_id, tf.term,
        |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |      ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE) / df.df DESC, tf.term) AS rnk
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
        |  WHERE tf.doc_id < 50) t
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val toks = docs.select(col("doc_id"), explode(split(col("text"), " ", -1)).as("term"))
      val tf = toks.filter(col("doc_id") < 50)
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfTbl = toks.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy("doc_id")
        .orderBy(((col("tf") * col("n_docs")).cast("double") / col("df")).desc, col("term"))
      tf.join(broadcast(dfTbl), "term")
        .crossJoin(broadcast(nDocs))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("doc_id", "term", "rnk")
        .orderBy("doc_id", "rnk")
    },

    // Range join via bounded bucket expansion — Spark's native plan for a
    // time-interval join is a BroadcastNestedLoopJoin; this is the
    // equi-join reformulation (see operators/RangeJoin.scala). The oracle
    // is the naive BETWEEN join, so the hash check proves the bucketing
    // loses and invents nothing.
    "q52_range_join" -> Q(
      "Range join: count clicks in the hour before each error event " +
        "(bucketed equi-join, no nested-loop)",
      """SELECT e.event_id, COUNT(*) AS n_recent_clicks
        |FROM events e JOIN events c
        |  ON c.user_id = e.user_id AND c.event_type = 'click'
        | AND c.ts >= e.ts - INTERVAL 60 MINUTE AND c.ts < e.ts
        |WHERE e.event_type = 'error'
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click").select("user_id", "ts")
      graft.operators.RangeJoin
        .recentWithin(errors, clicks, "user_id", "ts", windowUs = 60L * 60 * 1000000)
        .groupBy("event_id").agg(count(lit(1)).as("n_recent_clicks"))
        .orderBy("event_id")
    },

    // Custom TypedImperativeAggregate under the value oracle: bottom-k
    // distinct md5 hashes per group (the KMV sketch core — deterministic
    // uniform group sample + mergeable distinct estimator; k-sized partial
    // buffers through the shuffle, never the values). md5 hex sorts
    // identically as bytes in both engines, and the sketch is
    // order/partitioning-independent, so the hash check pins the custom
    // update/merge/serialize path exactly.
    "q53_kmv_sketch" -> Q(
      "KMV sketch: 5 smallest distinct md5(text) per source via a custom " +
        "TypedImperativeAggregate",
      """SELECT source,
        |  array_to_string(list_sort(list(DISTINCT md5(text)))[1:5], ',') AS bottom5
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .groupBy("source")
        .agg(concat_ws(",",
          graft.functions.BottomKExpressions.bottomKDistinct(md5(col("text")), 5))
          .as("bottom5"))
        .orderBy("source")
    },

    // Heavy hitters for vocabulary building: q43/q50 count terms EXACTLY,
    // which shuffles every token occurrence — at 100 TB that's the corpus
    // re-keyed by token. SpaceSaving ships one capacity-bounded buffer per
    // partition through the shuffle instead (the BottomK/KMV partial-agg
    // shape, with the heavy-hitter eviction rule). On this corpus the
    // vocabulary (31 terms) is far under capacity, so the sketch is exact
    // by construction and the DuckDB count oracle pins the whole
    // update/merge/serialize path value-for-value; the eviction regime is
    // pinned by FunctionsSpec bound checks instead.
    "q63_top_tokens" -> Q(
      "Top-20 tokens corpus-wide via a SpaceSaving heavy-hitters " +
        "TypedImperativeAggregate (exact here: vocab << capacity)",
      """SELECT rnk, term, cnt FROM (
        |  SELECT term, COUNT(*) AS cnt,
        |    ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, term) AS rnk
        |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY term) t
        |WHERE rnk <= 20 ORDER BY rnk""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ", -1)).as("term"))
        .agg(graft.functions.SpaceSavingExpressions
          .topKFrequent(col("term"), k = 20, capacity = 4096).as("top"))
        .select(posexplode(col("top")).as(Seq("pos", "e")))
        .select(
          (col("pos") + 1).cast("long").as("rnk"),
          col("e.token").as("term"),
          col("e.cnt").as("cnt"))
        .orderBy("rnk")
    },

    // HLL++ approximate distinct: the 100 TB replacement for q08's exact
    // expand+two-phase count-distinct (constant memory, one pass, mergeable
    // sketch). Sketch internals are engine-specific, so no value oracle —
    // TrainingSpec pins the estimate within 5% of exact instead.
    // ORACLE CLOSURE: rows-only is FINAL — an HLL++ ESTIMATE has no
    // cross-engine-exact value by definition; the 5%-of-exact spec bound
    // is the operator's actual contract.
    "q51_approx_distinct" -> Q.noOracle(
      "approx_count_distinct (HLL++) distinct users per event_type; " +
        "5%-of-exact asserted in TrainingSpec") { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy("event_type")
        .agg(
          approx_count_distinct(col("user_id")).as("approx_users"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // Split-leakage audit. The corpus has ZERO exact duplicates (every
    // MD5(lower(trim(text))) group in q32 is a singleton), so an
    // exact-hash leakage check would return an empty — and useless —
    // result; the word-5-gram form catches the near-dup copies that DO
    // cross the q49 split (13 of 100 eval docs at sf0.01, several at
    // contam_frac = 1.0). Window semantics identical to q75's.
    "q82_split_contam" -> Q(
      "Cross-split contamination: per val/test doc, distinct word-5-grams " +
        "also present in train-split docs",
      splitContamOracleSql) { (s, dir) =>
      splitContam(Tables(s, dir, "documents"))
    },

    // DuckDB cannot recompute the chained XXH64 window hashes, but the
    // twin's output is row-identical to q82 (SplitContamSpec pins it), so
    // q82's oracle statement hash-checks this path's values too.
    "q83_split_contam_hashed" -> Q(
      "q82 over 8-byte hashed windows (per-doc distinct inside the codegen " +
        "kernel; fixed-width shuffle keys) — the 100 TB form",
      splitContamOracleSql) { (s, dir) =>
      hashedSplitContam(Tables(s, dir, "documents"))
    },

    // The REPAIR step q82 only measures: a val/test doc sharing ANY
    // word-5-gram window with the train split is a leaked near-dup — its
    // eval loss is part memorization. The standard fix is to move it INTO
    // train (deleting it wastes data; keeping it poisons the eval), which
    // is exactly what this manifest encodes. Reuses splitContam WHOLE, so
    // audit and repair cannot disagree on what "contaminated" means; the
    // repair join is doc-keyed (fixed-width ids). At 100 TB swap in
    // hashedSplitContam (q83 — row-identical, spec-pinned).
    "q103_split_decontam" -> Q(
      "Decontaminated split manifest: q82-contaminated eval docs " +
        "reassigned to train; moved flag per doc",
      s"""WITH contam AS ($splitContamOracleSql),
         |s AS (SELECT doc_id,
         |    CASE WHEN ((doc_id % 2147483647) * 2654435761) % 100 < 80 THEN 'train'
         |         WHEN ((doc_id % 2147483647) * 2654435761) % 100 < 90 THEN 'val'
         |         ELSE 'test' END AS split_orig
         |  FROM documents)
         |SELECT s.doc_id, s.split_orig,
         |  CASE WHEN COALESCE(c.n_hit, 0) > 0 THEN 'train'
         |       ELSE s.split_orig END AS split_final,
         |  CAST(COALESCE(c.n_hit, 0) > 0 AND s.split_orig <> 'train'
         |       AS INTEGER) AS moved
         |FROM s LEFT JOIN contam c USING (doc_id)
         |ORDER BY s.doc_id""".stripMargin) { (s, dir) =>
      decontaminatedSplit(Tables(s, dir, "documents"))
    },

    // Mixture construction needs "N tokens per source", not "N docs": doc
    // sampling over-weights verbose sources. q93 draws a deterministic
    // per-source prefix in md5(doc_id) order (a uniform shuffle both
    // engines replay bit-identically — never rand(): retried tasks must
    // re-deal the same sample) and keeps docs until the budget is crossed,
    // including the crossing doc (take-until semantics: budget is a floor
    // on sampled tokens, the overshoot is < 1 doc). Audit form: the
    // per-source running sum is ONE window pass; at 100 TB a per-source
    // cumulative window serializes each source through one reducer, so the
    // scale path replaces the exact prefix with a hash-fraction threshold
    // (keep iff hash-position <= budget/source_total from a first
    // aggregate pass) — same determinism, two linear passes, no window.
    "q93_stratified_sample" -> Q(
      "Deterministic per-source token-budget sample: md5-ordered prefix " +
        "until 600 tokens/source (kept = take-until-crossing flag)",
      s"""WITH t AS (
         |  SELECT doc_id, source, CAST($tokCountSql AS BIGINT) AS n_toks
         |  FROM documents),
         |c AS (
         |  SELECT *, CAST(SUM(n_toks) OVER (
         |      PARTITION BY source
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_toks
         |  FROM t)
         |SELECT source, doc_id, n_toks, cum_toks,
         |  CAST(cum_toks - n_toks < 600 AS INTEGER) AS kept
         |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      stratifiedTokenSample(Tables(s, dir, "documents"), budgetPerSource = 600L)
    },

    // PADDING-WASTE calibration sweep (see [[paddingSweep]]): the
    // batch-scheduler question — how many length buckets buy how much
    // padding back — answered from ONE corpus scan via the
    // q130/q135/q138 house pattern: the scan builds the exact
    // length histogram, the {1,2,4,8,16} grid sweeps THAT (bounded ×5
    // fan-out over bounded rows). All-integer bucket math (ceil by
    // integer div), one IEEE division for the bp rate.
    "q148_padding_sweep" -> Q(
      "Length-bucketed batching sweep: padded/wasted tokens at " +
        "{1,2,4,8,16} quantile buckets, from the exact length histogram",
      """WITH t AS (SELECT len(string_split(text, ' ')) AS l FROM documents),
        |h AS (SELECT l, COUNT(*) AS n FROM t GROUP BY l),
        |tot AS (SELECT SUM(n) AS total FROM h),
        |c AS (SELECT l, n, SUM(n) OVER (ORDER BY l) AS cum FROM h),
        |grid AS (SELECT unnest([1, 2, 4, 8, 16]) AS g),
        |gb AS (SELECT g, l, n,
        |         (g * cum + total - 1) // total AS bucket
        |       FROM c CROSS JOIN grid CROSS JOIN tot),
        |bk AS (SELECT g, bucket, MAX(l) AS bmax, SUM(n) AS nb,
        |         SUM(n * l) AS ctoks
        |       FROM gb GROUP BY g, bucket),
        |agg AS (SELECT g, SUM(nb * bmax) AS padded,
        |          SUM(nb * bmax) - SUM(ctoks) AS waste
        |        FROM bk GROUP BY g)
        |SELECT CAST(g AS INTEGER) AS n_buckets,
        |  CAST(padded AS BIGINT) AS padded_tokens,
        |  CAST(waste AS BIGINT) AS waste_tokens,
        |  CAST(FLOOR(10000.0 * waste / padded) AS BIGINT) AS waste_bp
        |FROM agg ORDER BY n_buckets""".stripMargin) { (s, dir) =>
      paddingSweep(Tables(s, dir, "documents"))
    },

    // GROUP-HOLDOUT splitting: q82 measures how near-dups leak across a
    // doc-keyed split; this PREVENTS the leak structurally. The split is
    // keyed by the near-dup CLUSTER id (q97's minhash components), so
    // every member of a component lands in the same split and no eval doc
    // can have a near-twin in train. `moved` flags docs whose group split
    // differs from the doc-keyed q49 assignment (the leakage exposure the
    // group key just closed). Oracle: the shared q97 component replay
    // (exact-jaccard ≡ banded graph on the testdata — MinHashRecallSpec
    // pins the precondition) + the q49 split CASE applied to cluster_id.
    // Scale shape: the assignment is q97's (banded equi-joins + CC id
    // shuffles); the split itself adds ZERO exchanges — a codegen hash of
    // cluster_id.
    "q116_leakage_split" -> Q(
      "Leakage-safe train/val/test split: assignment keyed by near-dup " +
        "cluster id (group holdout), moved flag vs the doc-keyed split",
      s"""WITH RECURSIVE
         |${Dedup.ComponentAssignmentCteSql}
         |SELECT doc_id, cluster_id,
         |  CASE WHEN ((cluster_id % 2147483647) * 2654435761) % 100 < 80 THEN 'train'
         |       WHEN ((cluster_id % 2147483647) * 2654435761) % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split,
         |  CAST((CASE WHEN ((cluster_id % 2147483647) * 2654435761) % 100 < 80 THEN 0
         |             WHEN ((cluster_id % 2147483647) * 2654435761) % 100 < 90 THEN 1
         |             ELSE 2 END) <>
         |       (CASE WHEN ((doc_id % 2147483647) * 2654435761) % 100 < 80 THEN 0
         |             WHEN ((doc_id % 2147483647) * 2654435761) % 100 < 90 THEN 1
         |             ELSE 2 END) AS INTEGER) AS moved
         |FROM comp ORDER BY doc_id""".stripMargin) { (s, dir) =>
      leakageSafeSplit(Tables(s, dir, "documents"))
    })

  /** q116: group-holdout split — the assignment is the production cluster
    * assignment ([[Dedup.componentAssignment]], q97's chain minus ranking);
    * the split/moved columns are pure codegen over (doc_id, cluster_id).
    */
  def leakageSafeSplit(docs: DataFrame): DataFrame =
    Dedup.componentAssignment(docs)
      .select(col("doc_id"), col("cluster_id"),
        splitOf(col("cluster_id")).as("split"),
        (splitOf(col("cluster_id")) =!= splitOf(col("doc_id")))
          .cast("int").as("moved"))
      .orderBy("doc_id")

  /** q103: split-repair manifest — see the registration comment. The
    * contamination side is [[splitContam]] UNCHANGED (shared body with
    * q82); this adds one doc-keyed left join and the reassignment CASE.
    */
  def decontaminatedSplit(docs: DataFrame): DataFrame = {
    val contam = splitContam(docs).select(col("doc_id"), col("n_hit"))
    docs.select(col("doc_id"), splitOf(col("doc_id")).as("split_orig"))
      .join(contam, Seq("doc_id"), "left")
      .select(col("doc_id"), col("split_orig"),
        when(coalesce(col("n_hit"), lit(0L)) > 0, "train")
          .otherwise(col("split_orig")).as("split_final"),
        when(coalesce(col("n_hit"), lit(0L)) > 0 && col("split_orig") =!= "train", 1)
          .otherwise(0).as("moved"))
      .orderBy("doc_id")
  }

  /** q148: padding-waste vs bucket-count curve for length-bucketed
    * batching — padded batches waste `bucket_max − len` tokens per
    * sequence, and bucketing by length quantiles is the standard
    * mitigation; this sweep tells the recipe owner what each granularity
    * buys BEFORE a training run pays for it. Quantile buckets by
    * cumulative count: `bucket(l) = ceil(g · cum(l) / total)` (integer
    * ceil-div, so equal lengths always share a bucket and both engines
    * agree exactly); per bucket the pad target is the bucket max.
    *
    * Scale shape (the q130/q135/q138 calibration-sweep pattern): ONE
    * corpus scan builds the exact length histogram — bounded by the
    * model's context length, not the corpus — and the grid sweeps the
    * histogram: a ×|grid| fan-out over bounded rows, one
    * single-partition cumsum window over the histogram (kilobytes), and
    * (g, bucket)-keyed rollups. The corpus is never re-scanned or
    * re-keyed however many granularities are swept.
    */
  def paddingSweep(
      docs: DataFrame, grid: Seq[Int] = Seq(1, 2, 4, 8, 16)): DataFrame = {
    val h = docs.select(size(split(col("text"), " ", -1)).cast("long").as("l"))
      .groupBy("l").agg(count(lit(1)).as("n"))
    val wc = Window.orderBy(col("l").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // total rides a full-frame window over the SAME single-partition
    // histogram sort as the cumsum — one corpus scan, not a second
    // aggregate branch re-deriving the histogram for one number
    val wAll = Window.orderBy(col("l").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val c = h.withColumn("cum", sum("n").over(wc))
      .withColumn("total", sum("n").over(wAll))
    val gb = c
      .select(col("l"), col("n"), col("cum"), col("total"),
        explode(array(grid.map(g => lit(g.toLong)): _*)).as("g"))
      .withColumn("bucket",
        expr("(g * cum + total - 1) div total"))
    val bk = gb.groupBy("g", "bucket").agg(
      max(col("l")).as("bmax"), sum(col("n")).as("nb"),
      sum(col("n") * col("l")).as("ctoks"))
    bk.groupBy("g").agg(
        sum(col("nb") * col("bmax")).as("padded"),
        (sum(col("nb") * col("bmax")) - sum(col("ctoks"))).as("waste"))
      .select(col("g").cast("int").as("n_buckets"),
        col("padded").cast("long").as("padded_tokens"),
        col("waste").cast("long").as("waste_tokens"),
        floor(lit(10000.0) * col("waste") / col("padded"))
          .cast("long").as("waste_bp"))
      .orderBy("n_buckets")
  }

  /** q93: deterministic stratified sample to a token budget per source.
    * See the registration comment for semantics and the 100 TB
    * hash-fraction variant of the prefix rule.
    */
  def stratifiedTokenSample(docs: DataFrame, budgetPerSource: Long): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"), col("source"),
        graft.functions.Text.tokenCountPortable(col("text")).as("n_toks"))
      .withColumn("cum_toks", sum(col("n_toks")).over(w))
      .select(col("source"), col("doc_id"), col("n_toks"), col("cum_toks"),
        when(col("cum_toks") - col("n_toks") < budgetPerSource, 1).otherwise(0).as("kept"))
      .orderBy("doc_id")
  }
}
