// Derive the sf1 RELATIONAL star schema at /tmp/graft_sf1 — the round-15
// extension of the derived 10x corpus (documents/events: derive_sf1.scala;
// embeddings: derive_sf1_embeddings.scala), so the WHOLE registry can
// rehearse at sf1, not just the document/vector families. Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     -I tools/derive_sf1_relational.scala
//
// Convention: replica r in 0..9; r=0 is the verbatim sf0.1 table; r>0
// offsets EVERY key column by r*1_000_000 (a uniform stride far above
// every sf0.1 max key — o_orderkey tops out at 149,999) so foreign keys
// stay internally consistent within each replica: replica-r orders join
// replica-r customers, replica-r lineitems join replica-r orders/parts/
// suppliers. Non-key attributes are preserved verbatim, so per-replica
// value distributions (prices, dates, flags) are the sf0.1 ones and
// aggregates scale exactly 10x in group count or weight. region/nation
// are genuine dimensions and copy verbatim (a 10x corpus does not grow
// the world's nation list). Oracle checks stay valid on the derived dir:
// both engines read the same parquet, so internal consistency is all
// correctness needs.
import org.apache.spark.sql.functions._

val S = 1000000L
def rep(t: String, keys: Seq[String]): Unit = {
  val src = spark.read.parquet(s"/root/testdata/sf0.1/$t.parquet")
  val out = (0 until 10).map { r =>
    if (r == 0) src
    else src.select(src.columns.map { c =>
      if (keys.contains(c)) (col(c) + lit(r * S)).cast(src.schema(c).dataType).as(c)
      else col(c)
    }.toSeq: _*)
  }.reduce(_ unionByName _)
  out.repartition(16).write.mode("overwrite").parquet(s"/tmp/graft_sf1/$t.parquet")
  println(s"DERIVE $t rows=${spark.read.parquet(s"/tmp/graft_sf1/$t.parquet").count()}")
}

spark.read.parquet("/root/testdata/sf0.1/region.parquet")
  .write.mode("overwrite").parquet("/tmp/graft_sf1/region.parquet")
spark.read.parquet("/root/testdata/sf0.1/nation.parquet")
  .write.mode("overwrite").parquet("/tmp/graft_sf1/nation.parquet")
rep("customer", Seq("c_custkey"))
rep("supplier", Seq("s_suppkey"))
rep("part", Seq("p_partkey"))
rep("orders", Seq("o_orderkey", "o_custkey"))
rep("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
println("DERIVE_RELATIONAL done")
sys.exit(0)
