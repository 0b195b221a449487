package graft.ops

import org.apache.spark.sql.types._

/** Compact `{name: type}` schema rendering for structured logs — parity with
  * `schema_to_json` (`/root/reference/pyarrow/main.py:282-297`): structs
  * nest as objects, arrays render as `[elementtype]`, scalars render as a
  * short type string.
  */
object SchemaJson {

  private def esc(s: String): String =
    s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    }

  def typeString(dt: DataType): String = dt match {
    case StringType     => "string"
    case LongType       => "int64"
    case IntegerType    => "int32"
    case DoubleType     => "double"
    case FloatType      => "float"
    case BooleanType    => "bool"
    case TimestampType  => "timestamp[us, tz=UTC]"
    case DateType       => "date32"
    case BinaryType     => "binary"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case other          => other.simpleString
  }

  def render(dt: DataType): String = dt match {
    case st: StructType =>
      st.fields
        .map(f => s""""${esc(f.name)}": ${render(f.dataType)}""")
        .mkString("{", ", ", "}")
    case ArrayType(et, _) => s"[${render(et)}]"
    case other            => s""""${typeString(other)}""""
  }

  def render(schema: StructType): String = render(schema: DataType)
}
