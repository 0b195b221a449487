package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.ops.ZOrder
import graft.queries.Training

/** Property coverage for the bit-level kernels: Morton interleaving must be
  * a bijection on (a, b) pairs, and int8 quantization must bound its
  * reconstruction error by half a quantization step on in-range inputs.
  * Seeded generators (reproducible, same stance as DtCoercionPropertySpec).
  */
class ZOrderPropertySpec extends SparkSpec {
  import spark.implicits._

  test("interleave is injective: distinct (a,b) pairs map to distinct z-values") {
    val rnd = new Random(42)
    val pairs = Seq.fill(2000)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
      .distinct
    val zs = pairs.toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b"), bits = 16).as("z"))
      .collect().map(_.getLong(0))
    assert(zs.distinct.length == pairs.length, "collision would corrupt clustering order")
    // range check: 16+16 bits → z fits in 32 bits
    assert(zs.forall(z => z >= 0 && z < (1L << 32)))
  }

  test("interleave reference model: matches a bit-by-bit scala implementation") {
    def model(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
      }
    val rnd = new Random(7)
    val pairs = Seq.fill(500)((rnd.nextInt(1 << 12).toLong, rnd.nextInt(1 << 12).toLong))
    val got = pairs.toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b"), bits = 12).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == pairs.map { case (a, b) => model(a, b, 12) })
  }

  test("interleaveN(3) is injective and matches a bit-by-bit model; 2-col form unchanged") {
    def model(vs: Seq[Long], bits: Int): Long = {
      val k = vs.size
      vs.zipWithIndex.foldLeft(0L) { case (acc, (v, j)) =>
        (0 until bits).foldLeft(acc)((a, i) => a | ((v >> i) & 1L) << (i * k + j))
      }
    }
    val rnd = new Random(99)
    val triples = Seq.fill(2000)(
      (rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
      .distinct
    val zs = triples.toDF("a", "b", "c")
      .select(ZOrder.interleaveN(Seq(col("a"), col("b"), col("c")), bits = 16).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(zs.distinct.length == triples.length, "collision would corrupt clustering order")
    assert(zs.forall(z => z >= 0 && z < (1L << 48)), "16x3 bits must fit 48")
    assert(zs == triples.map { case (a, b, c) => model(Seq(a, b, c), 16) })
    // the delegating 2-column form must keep the documented bit placement
    val two = Seq((5L, 2L)).toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b"), bits = 4)).head.getLong(0)
    assert(two == 25L)
  }

  test("interleaveN rejects overflowing widths") {
    intercept[IllegalArgumentException] {
      ZOrder.interleaveN(Seq(col("a"), col("b"), col("c"), col("d")), bits = 16)
    }
    intercept[IllegalArgumentException] { ZOrder.interleaveN(Seq(col("a")), bits = 8) }
  }

  test("quantizeInt8: |x| <= 1 inputs reconstruct within half a step, clamp beyond") {
    val rnd = new Random(13)
    val vecs = Seq.fill(200)(Array.fill(8)((rnd.nextFloat() * 2.4f) - 1.2f).toSeq)
    val rows = vecs.toDF("v")
      .select(col("v"), Training.quantizeInt8(col("v")).as("q"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val q = r.getSeq[Double](1)
      v.zip(q).foreach { case (x, qq) =>
        assert(qq >= -127 && qq <= 127, "quantized value out of int8 range")
        if (math.abs(x) <= 1.0f)
          assert(math.abs(x - qq / 127.0) <= 0.5 / 127 + 1e-12,
            s"x=$x q=$qq err=${math.abs(x - qq / 127.0)}")
        else
          assert(math.abs(qq) == 127, s"out-of-range x=$x must saturate, got $qq")
      }
    }
  }
}
