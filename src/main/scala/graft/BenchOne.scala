package graft

/** Developer micro-bench: time ONE registered query (args(0)) a few times
  * against `SPARK_GRAFT_SF_DIR` with the same session settings as [[Bench]].
  * Not part of the driver contract — a fast feedback loop for plan work.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: BenchOne <query> [reps]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.buildSession()
    val fn = SparkEntry.queries(name)
    // warm-up at the smallest SF (codegen + JIT), as Bench does
    try fn(spark, Bench.WarmupDir).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[benchone] warmup failed: $e") }
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[benchone] $name run $i: $s%.2f s")
      s
    }
    println(f"[benchone] $name best=${times.min}%.2f s runs=${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
