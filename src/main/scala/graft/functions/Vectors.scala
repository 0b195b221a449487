package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector ops over `array<float>` embedding columns as pure Catalyst
  * expressions (`zip_with`/`aggregate`) — codegen-friendly, no UDFs, no ML
  * pipeline dependency. Floats are widened to double BEFORE any arithmetic
  * (lossless) and accumulated left-to-right, so results are deterministic.
  */
object Vectors {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  def euclidean(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v))

  /** Sign-bit LSH bucket code from the first `bits` components: a cheap,
    * deterministic coarse partitioner for ANN (IVF-style candidate pruning).
    * At scale this is the partition key that keeps each similarity probe on
    * one executor instead of a full cross join.
    */
  def signBucket(a: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      when(element_at(a, i + 1) >= 0f, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
}
