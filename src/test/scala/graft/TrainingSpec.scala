package graft

import org.apache.spark.sql.functions._

import graft.queries.{Tables, Training}

class TrainingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("int8 quantization bounds reconstruction error by half a step") {
    val out = SparkEntry.queries("q48_embed_quantize")(spark, sf).collect()
    assert(out.nonEmpty)
    // |x| <= 1 inputs: max_err <= 0.5/127 (half quantization step); saturated
    // elements may exceed that only when |x| > 1
    out.foreach { r =>
      val (nSat, maxErr) = (r.getLong(1), r.getDouble(2))
      if (nSat == 0)
        assert(maxErr <= 0.5 / 127 + 1e-12, s"vec ${r.getLong(0)}: err $maxErr")
    }
  }

  test("train/val/test split is deterministic and fractions are near 80/10/10") {
    val a = SparkEntry.queries("q49_train_split")(spark, sf).collect()
    val b = SparkEntry.queries("q49_train_split")(spark, sf).collect()
    assert(a.sameElements(b), "split assignment must be retry-deterministic")
    val byc = a.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val total = byc.values.sum.toDouble
    assert(math.abs(byc("train") / total - 0.8) < 0.1, s"train frac ${byc("train") / total}")
    assert(byc.keySet == Set("train", "val", "test"))
  }

  test("tfidf top terms are dense-ranked and deterministic") {
    val rows = SparkEntry.queries("q50_tfidf_top_terms")(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.nonEmpty)
    byDoc.values.foreach { rs =>
      assert(rs.map(_.getInt(2)).sorted.sameElements(1 to rs.length))
    }
  }

  test("bottom-k sketch is partitioning-independent and KMV estimate tracks exact") {
    import graft.functions.BottomKExpressions._
    // sf0.01: sf0.001 has only 15 distinct users — fewer than k, which
    // degenerates the sketch to the exact set
    val ev = Tables(spark, "/root/testdata/sf0.01", "events")
      .select(col("user_id").cast("string").as("u"))
    def sketch(df: org.apache.spark.sql.DataFrame) =
      df.agg(bottomKDistinct(md5(col("u")), 64).as("sk"))
    // same sketch regardless of physical partitioning (update/merge paths)
    val a = sketch(ev).head.getSeq[String](0)
    val b = sketch(ev.repartition(13)).head.getSeq[String](0)
    val c = sketch(ev.coalesce(1)).head.getSeq[String](0)
    assert(a == b && b == c, "sketch must not depend on partitioning")
    assert(a.length == 64 && a == a.sorted)

    val est = sketch(ev).select(kmvEstimate(col("sk"), 64).as("e")).head.getDouble(0)
    val exact = ev.distinct().count().toDouble
    assert(math.abs(est - exact) / exact < 0.3,
      s"KMV estimate $est vs exact $exact (k=64 → ~12.5% expected error)")
  }

  test("space-saving top-k: exact regime matches groupBy counts under any partitioning") {
    import spark.implicits._
    import graft.functions.SpaceSavingExpressions.topKFrequent
    // known composition, distinct values (7) < capacity => sketch is exact
    val stream = Seq.fill(50)("alpha") ++ Seq.fill(40)("beta") ++ Seq.fill(40)("gamma") ++
      Seq.fill(10)("delta") ++ Seq.fill(5)("eps") ++ Seq("zeta", "eta")
    val expected = Seq(("alpha", 50L, 0L), ("beta", 40L, 0L), ("gamma", 40L, 0L),
      ("delta", 10L, 0L)) // beta before gamma: count ties break token-asc
    for (parts <- Seq(1, 7)) {
      val got = stream.toDF("t").repartition(parts)
        .agg(topKFrequent(col("t"), 4, 16).as("top"))
        .select(explode(col("top")).as("e"))
        .select("e.token", "e.cnt", "e.err")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expected, s"parts=$parts: $got")
    }
  }

  test("space-saving top-k: eviction regime keeps the guarantee bounds and the heavy hitter") {
    import spark.implicits._
    import graft.functions.SpaceSavingExpressions.topKFrequent
    // 1 heavy value + 60 singletons through capacity 8: evictions guaranteed
    val rnd = new scala.util.Random(11)
    val stream = rnd.shuffle(Seq.fill(30)("heavy") ++ (0 until 60).map(i => s"one_$i"))
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = stream.toDF("t").repartition(3)
      .agg(topKFrequent(col("t"), 8, 8).as("top"))
      .select(explode(col("top")).as("e"))
      .select("e.token", "e.cnt", "e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // SpaceSaving guarantee: cnt - err <= f <= cnt, and any f > N/capacity
    // survives — "heavy" (30 > 90/8) must be reported first
    assert(got.head._1 == "heavy", s"heavy hitter must rank first: ${got.toSeq}")
    got.foreach { case (t, cnt, err) =>
      val f = truth(t)
      assert(cnt - err <= f && f <= cnt, s"$t: bounds violated (cnt=$cnt err=$err f=$f)")
    }
  }

  test("q63 sketch top-20 equals the exact term counts on the real corpus") {
    val got = SparkEntry.queries("q63_top_tokens")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val exact = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ", -1)).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(20).collect().zipWithIndex
      .map { case (r, i) => (i + 1L, r.getString(0), r.getLong(1)) }
    assert(got.sameElements(exact))
  }

  test("bottom_k_distinct is callable from SQL via GraftExtensions") {
    GraftExtensions.register(spark)
    Tables(spark, sf, "documents").createOrReplaceTempView("docs_bk")
    val viaSql = spark.sql(
      "SELECT source, bottom_k_distinct(md5(text), 5) AS s FROM docs_bk GROUP BY source")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val viaApi = Tables(spark, sf, "documents").groupBy("source")
      .agg(graft.functions.BottomKExpressions.bottomKDistinct(md5(col("text")), 5).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(viaSql == viaApi)
  }

  test("q116 leakage-safe split: no near-dup cluster straddles a split") {
    val rows = SparkEntry.queries("q116_leakage_split")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
    assert(rows.nonEmpty)
    // THE group-holdout property: every member of a cluster shares a split
    rows.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $cid straddles splits: ${members.map(_._3).distinct.mkString(",")}")
    }
    // the split is the q49 assignment OF THE CLUSTER ID, and moved flags
    // exactly the docs whose doc-keyed split would have differed
    val splitOfLocal: Long => String = { id =>
      val b = ((id % 2147483647L) * 2654435761L) % 100L
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    rows.foreach { case (doc, cid, split, moved) =>
      assert(split == splitOfLocal(cid), s"doc $doc: split $split != split(cluster $cid)")
      assert((moved == 1) == (splitOfLocal(doc) != splitOfLocal(cid)),
        s"doc $doc: moved flag inconsistent")
    }
    // the testdata corpus has real near-dup clusters, so the guard must
    // actually move someone — otherwise this test pins nothing
    assert(rows.exists(_._4 == 1), "expected at least one doc moved by group holdout")
  }

  test("approx_count_distinct lands within 5% of exact per event_type") {
    val approx = SparkEntry.queries("q51_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables(spark, sf, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (t, e) =>
      assert(math.abs(approx(t) - e).toDouble / e <= 0.05,
        s"$t: approx ${approx(t)} vs exact $e")
    }
  }

  test("padding sweep: exact planted waste, monotone in bucket count, zero at full granularity") {
    import spark.implicits._
    // one doc per length 1..8: g=1 pads all to 8 (waste 64-36=28);
    // g=2 buckets {1-4},{5-8} (waste (16-10)+(32-26)=12); g=8 gives one
    // length per bucket — zero waste
    val docs = (1 to 8)
      .map(n => Tuple1((1 to n).map(i => s"w$i").mkString(" ")))
      .toDF("text")
    val out = graft.queries.Training
      .paddingSweep(docs, grid = Seq(1, 2, 4, 8))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1) == (64L, 28L), s"g=1: ${out(1)}")
    // ceil(2·cum/8): lengths 1-4 → bucket 1 (pad to 4), 5-8 → bucket 2
    assert(out(2) == (48L, 12L), s"g=2: ${out(2)}")
    // ceil(l/2) pairs: pads to 2/4/6/8
    assert(out(4) == (40L, 4L), s"g=4: ${out(4)}")
    assert(out(8) == (36L, 0L), "one bucket per length must waste nothing")
    // waste can only shrink as granularity grows
    val ws = Seq(1, 2, 4, 8).map(g => out(g)._2)
    assert(ws == ws.sorted.reverse, s"waste must be monotone non-increasing: $ws")
  }
}
