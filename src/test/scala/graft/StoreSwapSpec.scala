package graft

import graft.ops.StoreSwap

/** The house rename-aside swap: publish must be atomic-by-inspection and a
  * failed publish must never strand the live store at `.old` (the r12
  * advice: a caller retry after a transient step-2 failure would find the
  * store missing and turn a blip into an outage).
  */
class StoreSwapSpec extends SparkSpec {
  import spark.implicits._

  private def write(rows: Seq[Long], path: String): Unit =
    rows.toDF("v").write.mode("overwrite").parquet(path)

  private def read(path: String): Set[Long] =
    spark.read.parquet(path).collect().map(_.getLong(0)).toSet

  test("swapInto publishes .next; a failed publish rolls the live store back") {
    val root = java.nio.file.Files.createTempDirectory("graft_swap").toString
    val p = s"$root/store"
    write(Seq(1L, 2L), p)
    write(Seq(3L, 4L), s"$p.next")
    StoreSwap.swapInto(spark, p)
    assert(read(p) == Set(3L, 4L), "swap must publish the staged version")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$p.old")) &&
      !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$p.next")),
      "swap must retire both transient dirs")

    // failure injection: no .next staged — step 2's rename fails AFTER the
    // live store was already set aside; the rollback must restore it
    val e = intercept[java.io.IOException](StoreSwap.swapInto(spark, p))
    assert(e.getMessage.contains("live store restored"), e.getMessage)
    assert(read(p) == Set(3L, 4L),
      "a failed publish must leave the live store readable at its path")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$p.old")),
      "the rollback must not leave a live copy stranded at .old")
  }

  test("first publication tolerates a missing live dir") {
    val root = java.nio.file.Files.createTempDirectory("graft_swap0").toString
    val p = s"$root/store"
    write(Seq(7L), s"$p.next")
    StoreSwap.swapInto(spark, p)
    assert(read(p) == Set(7L))
  }
}
