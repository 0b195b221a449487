package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._
import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.DtCoercion

/** Property-based coverage of the `_dt` coercion (SURVEY §5.3): across
  * randomly generated nested schemas, coercion must hit EXACTLY the eligible
  * fields (string leaves named `*_dt`, at any struct/array-of-struct depth)
  * and perturb nothing else — types, values, field order, null placement.
  *
  * ScalaCheck generators are driven with a fixed seed (no scalatest bridge
  * in the offline cache), so runs are reproducible.
  */
class DtCoercionPropertySpec extends SparkSpec {

  // --- schema generator -----------------------------------------------------

  private def leaf: Gen[DataType] =
    Gen.oneOf(StringType, LongType, DoubleType, BooleanType)

  private def dtype(depth: Int): Gen[DataType] =
    if (depth <= 0) leaf
    else
      Gen.frequency(
        4 -> leaf,
        3 -> Gen.lzy(structOf(depth - 1)),
        2 -> Gen.lzy(dtype(depth - 1).map(ArrayType(_, containsNull = true))))

  private def structOf(depth: Int): Gen[StructType] =
    for {
      n <- Gen.choose(1, 4)
      suffixes <- Gen.listOfN(n, Gen.oneOf("", "_dt"))
      types <- Gen.listOfN(n, dtype(depth))
    } yield StructType(suffixes.zip(types).zipWithIndex.map {
      case ((sfx, dt), i) => StructField(s"f$i$sfx", dt, nullable = true)
    })

  private val schemas: Seq[StructType] = {
    val gen = structOf(3)
    (0 until 25).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(1234L + i)))
  }

  // --- independent expected-schema oracle ----------------------------------

  private def expectedType(name: String, dt: DataType): DataType = dt match {
    case StringType if name.endsWith("_dt") => TimestampType
    case st: StructType =>
      StructType(st.fields.map(f => f.copy(dataType = expectedType(f.name, f.dataType))))
    case ArrayType(et: StructType, n) =>
      ArrayType(expectedType("", et), n)
    case other => other // array<non-struct> named *_dt stays untouched
  }

  // --- row generator --------------------------------------------------------

  private val isoPool = Seq(
    "2024-01-15T10:30:00.123Z",
    "1999-12-31T23:59:59.999Z",
    "2030-06-01T00:00:00.000Z")

  private def valueFor(name: String, dt: DataType, rnd: Random): Any = dt match {
    case StringType if name.endsWith("_dt") =>
      rnd.nextInt(4) match {
        case 0 => null
        case 1 => "definitely not a timestamp"
        case _ => isoPool(rnd.nextInt(isoPool.length))
      }
    case StringType => s"str${rnd.nextInt(1000)}"
    case LongType => rnd.nextLong()
    case DoubleType => rnd.nextDouble()
    case BooleanType => rnd.nextBoolean()
    case st: StructType =>
      if (rnd.nextInt(8) == 0) null
      else Row(st.fields.toSeq.map(f => valueFor(f.name, f.dataType, rnd)): _*)
    case ArrayType(et, _) =>
      if (rnd.nextInt(8) == 0) null
      else Seq.fill(rnd.nextInt(3))(valueFor(name, et, rnd))
  }

  // --- recursive value oracle ----------------------------------------------

  private def expectedTs(v: Any): Any = v match {
    case null => null
    case s: String =>
      try Timestamp.from(java.time.Instant.parse(s))
      catch { case _: Exception => null } // try_to_timestamp coerces to null
  }

  private def checkValue(path: String, name: String, dt: DataType, orig: Any, got: Any): Unit =
    dt match {
      case StringType if name.endsWith("_dt") =>
        assert(got == expectedTs(orig), s"$path: parse mismatch for input $orig")
      case st: StructType =>
        if (orig == null) assert(got == null, s"$path: null struct must stay null")
        else {
          val o = orig.asInstanceOf[Row]
          val g = got.asInstanceOf[Row]
          st.fields.zipWithIndex.foreach { case (f, i) =>
            checkValue(s"$path.${f.name}", f.name, f.dataType, o.get(i), g.get(i))
          }
        }
      case ArrayType(et, _) =>
        if (orig == null) assert(got == null, s"$path: null array must stay null")
        else {
          val o = orig.asInstanceOf[scala.collection.Seq[Any]]
          val g = got.asInstanceOf[scala.collection.Seq[Any]]
          assert(o.length == g.length, s"$path: array length changed")
          // element NAME is the array field's name only for struct recursion;
          // scalar elements (even of *_dt arrays) pass through unchanged
          et match {
            case est: StructType =>
              o.zip(g).foreach { case (oe, ge) => checkValue(s"$path[]", "", est, oe, ge) }
            case _ => assert(o == g, s"$path: scalar array content changed")
          }
        }
      case _ =>
        assert(got == orig, s"$path: non-hit value changed ($orig -> $got)")
    }

  test("25 random nested schemas: coercion hits exactly the eligible fields") {
    val rnd = new Random(99)
    schemas.zipWithIndex.foreach { case (schema, si) =>
      val rows = (0 until 20).map(_ =>
        Row(schema.fields.toSeq.map(f => valueFor(f.name, f.dataType, rnd)): _*))
      val df = spark.createDataFrame(rows.asJava, schema)
      val out = DtCoercion.coerceDtFields(df)

      assert(out.schema == expectedType("", schema),
        s"schema #$si: type transform mismatch\nin:  $schema\nout: ${out.schema}")

      val origRows = df.collect()
      val gotRows = out.collect()
      origRows.zip(gotRows).foreach { case (o, g) =>
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          checkValue(s"#$si.${f.name}", f.name, f.dataType, o.get(i), g.get(i))
        }
      }
    }
  }

  test("hitPaths agrees with the schema transform on the random schemas") {
    schemas.foreach { schema =>
      val hits = DtCoercion.hitPaths(schema)
      val changed = expectedType("", schema) != schema
      assert(hits.nonEmpty == changed,
        s"hitPaths ${hits.size} vs schema-changed=$changed for $schema")
    }
  }
}
