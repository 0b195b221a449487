package graft

import org.apache.spark.sql.functions._

import graft.operators.Salting

/** Salted skew operators must be result-identical to their unsalted forms. */
class SaltingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("saltedJoin == plain join on orders ⋈ customer") {
    val orders = graft.queries.Tables.raw(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = graft.queries.Tables.raw(spark, dir, "customer")
      .select("c_custkey", "c_mktsegment")

    val plain = orders.join(cust, orders("o_custkey") === cust("c_custkey"))
      .select("o_orderkey", "c_mktsegment")
    val salted = Salting.saltedJoin(
      orders.withColumnRenamed("o_custkey", "k"),
      cust.withColumnRenamed("c_custkey", "k"),
      key = "k", salts = 7)
      .select("o_orderkey", "c_mktsegment")

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin left join preserves unmatched fact rows") {
    import spark.implicits._
    val fact = Seq((1, "a"), (2, "b"), (99, "zz")).toDF("k", "v")
    val dim = Seq((1, "x"), (2, "y")).toDF("k", "d")
    val out = Salting.saltedJoin(fact, dim, "k", salts = 4, joinType = "left")
      .orderBy("k").collect()
    assert(out.length == 3)
    assert(out.last.getAs[String]("v") == "zz" && out.last.isNullAt(out.last.fieldIndex("d")))
  }

  test("saltedCountSum == plain groupBy on a skewed key distribution") {
    import spark.implicits._
    // 10k rows of hot key + sparse tail — the shape salting exists for
    val skewed = spark.range(0, 10000).select(lit(1L).as("k"), (col("id") % 10).cast("double").as("v"))
      .union(spark.range(0, 100).select((col("id") + 2).as("k"), lit(1.0).as("v")))
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("total"))
      .orderBy("k").collect()
    val salted = Salting.saltedCountSum(skewed, "k", "v", salts = 8)
      .orderBy("k").collect()
    assert(plain.length == salted.length)
    plain.zip(salted).foreach { case (p, s) =>
      assert(p.getLong(0) == s.getLong(0))
      assert(p.getLong(1) == s.getLong(1), s"count mismatch for key ${p.getLong(0)}")
      assert(math.abs(p.getDouble(2) - s.getDouble(2)) < 1e-9)
    }
  }
}
