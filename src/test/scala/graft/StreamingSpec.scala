package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.gen.Findings
import graft.streaming.ConvertStream

class StreamingSpec extends SparkSpec {

  test("file stream converts each arriving ndjson.gz to its own sorted parquet") {
    val root = Files.createTempDirectory("graft-stream").toString
    val srcDir = s"$root/in"
    val outDir = s"$root/out"
    new java.io.File(srcDir).mkdirs()

    // two files "arriving" — distinct stems, the event-per-file model
    val (sorted, unsorted) = Findings.writeFixtures(srcDir, n = 200)
    val schema = spark.read.json(sorted).schema

    val q = ConvertStream.start(spark, srcDir, outDir, schema)
    q.awaitTermination(120000)

    val a = spark.read.parquet(s"$outDir/finding-sorted.zst.parquet")
    val b = spark.read.parquet(s"$outDir/finding-unsorted.zst.parquet")
    assert(a.count() == 200 && b.count() == 200)
    assert(a.schema("time_dt").dataType == TimestampType)
    val times = b.select("time").collect().map(_.getLong(0))
    assert(times.sliding(2).forall(p => p(0) <= p(1)), "per-file output globally sorted")
  }
}
