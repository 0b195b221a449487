package graft

/** Driver-side reference implementations for the vocabulary diagnostics
  * (q79/q80): the DuckDB oracle pins cross-engine value identity; these pin
  * the SEMANTICS against a from-scratch computation, so a refactor that
  * changed both the Spark plan and the oracle SQL in the same wrong way
  * still fails.
  */
class VocabDiagnosticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def corpus = queries.Tables(spark, dir, "documents")
    .select("source", "doc_id", "text").collect()
    .map(r => (r.getString(0), r.getLong(1), r.getString(2)))

  test("q79 zipf slope matches a plain-double OLS reference within rounding") {
    val bySource = corpus.groupBy(_._1)
    val expected = bySource.map { case (src, rows) =>
      val counts = rows.flatMap(_._3.split(" ", -1)).groupBy(identity)
        .map { case (t, hits) => (t, hits.length) }
      // rank by (count desc, term asc) — the query's total order
      val ranked = counts.toSeq.sortBy { case (t, c) => (-c, t) }.zipWithIndex
      val pts = ranked.map { case ((_, c), i) => (math.log(i + 1.0), math.log(c.toDouble)) }
      val n = pts.length.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      src -> (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    val got = SparkEntry.queries("q79_zipf_slope")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (src, slope) =>
      // query rounds at 4 decimals over DECIMAL(18,6)-quantized lns; the
      // double reference agrees to well inside 1e-3
      assert(math.abs(slope - expected(src)) < 1e-3,
        s"$src: query $slope vs reference ${expected(src)}")
      assert(slope < 0, s"$src: rank-frequency slope must be negative, got $slope")
    }
  }

  test("q80 DF histogram matches an exact integer reference") {
    val df = corpus.flatMap { case (_, id, text) =>
      text.split(" ", -1).distinct.map(_ -> id)
    }.groupBy(_._1).map { case (_, hits) => hits.map(_._2).distinct.length }
    val expected = df.groupBy(d => 63 - java.lang.Long.numberOfLeadingZeros(d.toLong))
      .map { case (b, ds) => (b.toLong, ds.size.toLong, ds.map(_.toLong).sum) }
      .toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q80_df_histogram")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("q179 token coverage matches an exact integer reference; curve is monotone and saturates") {
    // from-scratch reference: full term-count table, (count desc, term asc)
    // total order, exact integer cumulative coverage at each grid point
    val counts = corpus.flatMap(_._3.split(" ", -1))
      .groupBy(identity).map { case (t, hits) => (t, hits.length.toLong) }
    val ranked = counts.toSeq.sortBy { case (t, c) => (-c, t) }
    val totalOcc = ranked.map(_._2).sum
    val grid = Seq(10, 100, 1000, 10000)
    val expected = grid.map { n =>
      val top = ranked.take(n)
      val cov = top.map(_._2).sum
      (n, top.length.toLong, cov, totalOcc, cov * 10000L / totalOcc)
    }
    val got = SparkEntry.queries("q179_token_coverage")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected, s"got=$got expected=$expected")
    // shape: coverage is monotone in N and saturates at 10000 bp once the
    // grid passes the full vocabulary
    val bps = got.map(_._5)
    assert(bps == bps.sorted, "coverage must be monotone in n_top")
    if (counts.size <= grid.max)
      assert(bps.last == 10000L, "full-vocab budget must cover everything")
  }
}
