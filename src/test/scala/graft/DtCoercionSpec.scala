package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.DtCoercion

class DtCoercionSpec extends SparkSpec {
  import spark.implicits._

  private val ISO = "2025-03-01T12:34:56.789Z"
  private val isoTs = java.sql.Timestamp.from(java.time.Instant.parse(ISO))

  test("top-level _dt string is coerced to timestamp; value is exact") {
    val df = Seq((ISO, "x")).toDF("time_dt", "other")
    val out = DtCoercion.coerceDtFields(df)
    assert(out.schema("time_dt").dataType == TimestampType)
    assert(out.schema("other").dataType == StringType)
    assert(out.select("time_dt").head.getTimestamp(0) == isoTs)
  }

  test("struct-nested and list-of-struct-nested _dt are coerced (3 levels)") {
    val df = spark.read.json(Seq(
      s"""{"meta":{"prod":{"my_dt":"$ISO"}},"items":[{"deep":[{"mod_dt":"$ISO","keep":1}]}]}"""
    ).toDS)
    val out = DtCoercion.coerceDtFields(df)
    assert(out.select($"meta.prod.my_dt").schema.head.dataType == TimestampType)
    val deep = out.select(explode($"items").as("i"))
      .select(explode($"i.deep").as("d")).select($"d.mod_dt", $"d.keep")
    assert(deep.schema("mod_dt").dataType == TimestampType)
    assert(deep.schema("keep").dataType == LongType)
    assert(deep.head.getTimestamp(0) == isoTs)
  }

  test("non-string _dt and array<string> _dt are NOT coerced (reference semantics)") {
    val schema = StructType(Seq(
      StructField("num_dt", LongType),
      StructField("list_dt", ArrayType(StringType))))
    val df = spark.createDataFrame(
      java.util.List.of(Row(5L, Seq(ISO))), schema)
    val out = DtCoercion.coerceDtFields(df)
    assert(out.schema("num_dt").dataType == LongType)
    assert(out.schema("list_dt").dataType == ArrayType(StringType))
  }

  test("null struct stays null (not a struct of nulls)") {
    val df = spark.read.json(Seq(
      s"""{"id":1,"meta":{"my_dt":"$ISO"}}""",
      """{"id":2}""").toDS)
    val out = DtCoercion.coerceDtFields(df)
    val rows = out.orderBy("id").select("meta").collect()
    assert(rows(0).get(0) != null)
    assert(rows(1).get(0) == null, "null struct must survive the rebuild")
  }

  test("null array elements survive the rebuild") {
    val df = spark.read.json(Seq(
      s"""{"xs":[{"a_dt":"$ISO"},null,{"a_dt":null}]}""").toDS)
    val out = DtCoercion.coerceDtFields(df)
    val xs = out.select("xs").head.getSeq[Row](0)
    assert(xs.size == 3)
    assert(xs(1) == null)
    assert(xs(2).get(0) == null)
  }

  test("lenient mode nulls unparseable values; strict mode throws") {
    val df = Seq(("garbage"), (ISO)).toDF("x_dt")
    val lenient = DtCoercion.coerceDtFields(df).collect()
    assert(lenient.count(_.isNullAt(0)) == 1)
    val strict = DtCoercion.coerceDtFields(df, strict = true)
    intercept[Exception] { strict.collect() }
  }

  test("strict/lenient semantics hold for malformed values in NESTED paths too") {
    // malformed timestamp buried in struct and in list<struct> (§1.4.2:
    // pyarrow ISO8601 raise vs pandas errors='coerce' null)
    val df = spark.read.json(Seq(
      s"""{"id":1,"m":{"my_dt":"not-a-time"},"xs":[{"c_dt":"$ISO"},{"c_dt":"02/31/2025 nope"}]}"""
    ).toDS)
    val lenient = DtCoercion.coerceDtFields(df)
    val row = lenient.select($"m.my_dt", $"xs").head
    assert(row.isNullAt(0), "nested malformed value must coerce to null in lenient mode")
    val elems = row.getSeq[Row](1)
    assert(elems(0).getTimestamp(0) == isoTs)
    assert(elems(1).isNullAt(0), "malformed list element must coerce to null in lenient mode")
    intercept[Exception] { DtCoercion.coerceDtFields(df, strict = true).collect() }
  }

  test("field order is preserved through struct rebuilds") {
    val df = spark.read.json(Seq(
      s"""{"m":{"z":1,"a_dt":"$ISO","b":"keep","a":2}}""").toDS)
    val out = DtCoercion.coerceDtFields(df)
    val names = out.schema("m").dataType.asInstanceOf[StructType].fieldNames.toSeq
    val orig = df.schema("m").dataType.asInstanceOf[StructType].fieldNames.toSeq
    assert(names == orig)
  }

  test("hitPaths reports exactly the coercible paths") {
    val df = spark.read.json(Seq(
      s"""{"time_dt":"$ISO","m":{"p":{"my_dt":"$ISO"}},"xs":[{"c_dt":"$ISO","n":1}],"plain":"x","num_dt":4}"""
    ).toDS)
    assert(DtCoercion.hitPaths(df.schema).toSet ==
      Set("time_dt", "m.p.my_dt", "xs[].c_dt"))
  }

  test("untouched columns are byte-identical (no rebuild of non-hit trees)") {
    val df = spark.read.json(Seq(
      s"""{"a_dt":"$ISO","keep":{"x":[1,2],"y":"s"}}""").toDS)
    val out = DtCoercion.coerceDtFields(df)
    assert(out.select("keep").collect() sameElements df.select("keep").collect())
  }
}
