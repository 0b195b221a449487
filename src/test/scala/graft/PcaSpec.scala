package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca
import graft.queries.{Similarity, Tables}

/** q94 moment matrix + q95 PCA projection.
  *
  * q94 is oracle-checked (decimal-exact means); the spec pins the linear-
  * algebra contract the oracle can't see: symmetry/completeness of the
  * upper triangle, and for q95 (no oracle — eigen internals aren't ANSI
  * SQL) the eigensolver's defining properties on the REAL corpus matrix:
  * orthonormal axes, bounded eigen residual, descending explained
  * variance, pinned signs, and bit-identical reruns.
  */
class PcaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val dim = 64

  private def momentMatrix(): Array[Array[Double]] = {
    val rows = Similarity.secondMoments(Tables(spark, dir, "embeddings"), dim).collect()
    val m = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      val (i, j, x) = (r.getLong(0).toInt - 1, r.getLong(1).toInt - 1, r.getDouble(2))
      m(i)(j) = x; m(j)(i) = x
    }
    m
  }

  test("q94: upper triangle is complete and matches a direct driver computation") {
    val e = Tables(spark, dir, "embeddings")
      .select("embedding").collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val rows = Similarity.secondMoments(Tables(spark, dir, "embeddings"), dim).collect()
    assert(rows.length == dim * (dim + 1) / 2)
    val byKey = rows.map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getDouble(2))).toMap
    // spot-check a band of entries against naive double sums (decimal vs
    // double accumulation differ only below 1e-9 at this corpus size)
    for (i <- 1 to dim by 13; j <- i to dim by 13) {
      val direct = e.map(v => v(i - 1) * v(j - 1)).sum / e.length
      assert(math.abs(byKey((i, j)) - direct) < 1e-9,
        s"moment ($i,$j): ${byKey((i, j))} vs direct $direct")
    }
  }

  test("q94 is mergeable: moments(corpus) == weighted merge of split moments") {
    // the property that makes the moment matrix an INCREMENTAL artifact at
    // 100 TB: a new batch's matrix merges into the stored one by weighted
    // sum — no rescan of old data. Decimal sums make the equality exact up
    // to the final double division.
    val e = Tables(spark, dir, "embeddings")
    val half1 = e.filter(col("vec_id") % 2 === 0)
    val half2 = e.filter(col("vec_id") % 2 === 1)
    val (n1, n2) = (half1.count(), half2.count())
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val full = toMap(Similarity.secondMoments(e, dim))
    val m1 = toMap(Similarity.secondMoments(half1, dim))
    val m2 = toMap(Similarity.secondMoments(half2, dim))
    full.foreach { case (k, v) =>
      val merged = (m1(k) * n1 + m2(k) * n2) / (n1 + n2)
      assert(math.abs(merged - v) < 1e-12, s"moment $k: merged $merged vs full $v")
    }
  }

  test("jacobiEigen: orthonormal axes, small residual, descending eigenvalues") {
    val m = momentMatrix()
    val eig = Pca.jacobiEigen(m)
    assert(eig.length == dim)
    // descending eigenvalues; a moment matrix is PSD so all >= -tol
    eig.sliding(2).foreach { case Seq((a, _), (b, _)) => assert(a >= b - 1e-12) }
    assert(eig.last._1 >= -1e-9)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    for (k <- 0 until 4; l <- k until 4) {
      val expected = if (k == l) 1.0 else 0.0
      assert(math.abs(dot(eig(k)._2, eig(l)._2) - expected) < 1e-9,
        s"axes $k,$l not orthonormal")
    }
    // eigen residual ||Mv - lambda v|| for the top axes
    for ((lambda, v) <- eig.take(4)) {
      val mv = m.map(row => dot(row, v))
      val res = math.sqrt(mv.zip(v).map { case (x, y) => val d = x - lambda * y; d * d }.sum)
      assert(res < 1e-9, s"residual $res for eigenvalue $lambda")
    }
    // pinned sign: the largest-|component| coordinate is positive
    eig.take(4).foreach { case (_, v) =>
      val best = v.indices.maxBy(i => (math.abs(v(i)), -i))
      assert(v(best) > 0, "sign convention violated")
    }
  }

  test("q95: projection is deterministic across runs and explains variance in axis order") {
    val out1 = SparkEntry.queries("q95_pca_project")(spark, dir).collect()
    val out2 = SparkEntry.queries("q95_pca_project")(spark, dir).collect()
    assert(out1.map(_.toString).sameElements(out2.map(_.toString)), "rerun differed")
    val n = Tables(spark, dir, "embeddings").count()
    assert(out1.length == n)
    def variance(xs: Array[Double]) = {
      val mean = xs.sum / xs.length
      xs.map(x => (x - mean) * (x - mean)).sum / xs.length
    }
    val pc1 = out1.map(_.getDouble(1))
    val pc2 = out1.map(_.getDouble(2))
    // top axis captures at least as much CENTERED variance modulo the mean
    // offset (axes diagonalize the uncentered moment matrix, so compare
    // uncentered second moments, which is the quantity they order)
    def moment2(xs: Array[Double]) = xs.map(x => x * x).sum / xs.length
    assert(moment2(pc1) >= moment2(pc2) - 1e-12,
      s"axis order: m2(pc1)=${moment2(pc1)} < m2(pc2)=${moment2(pc2)}")
    assert(variance(pc1) > 0 && variance(pc2) > 0)
  }
}
