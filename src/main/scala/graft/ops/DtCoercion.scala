package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Recursive `_dt` → timestamp coercion over arbitrarily nested schemas.
  *
  * Semantics (pyarrow path of the reference, `/root/reference/pyarrow/main.py:172-279`):
  *   - a field is coerced iff its name ends in `_dt` AND its type is string
  *     (`pyarrow/main.py:179,232`);
  *   - structs are descended recursively (`pyarrow/main.py:184-188,227-255`);
  *   - arrays are descended only when the element type is a struct
  *     (`pyarrow/main.py:189-193,258-279`) — an `array<string>` named `x_dt`
  *     is left untouched, matching the reference;
  *   - field order is preserved (`pyarrow/main.py:198-201,252-255`);
  *   - untouched columns pass through without a rebuild.
  *
  * Parse failure: `strict = true` raises (pyarrow `format="ISO8601"`,
  * `pyarrow/main.py:181`); `strict = false` (default) coerces to null
  * (pandas `errors='coerce'`, `/root/reference/pandas/main.py:185`) via
  * `try_to_timestamp`.
  *
  * Implementation is a schema-driven Column builder: Catalyst sees plain
  * `struct`/`transform`/`to_timestamp` expressions, so the whole coercion
  * stays inside whole-stage codegen and costs one projection — no UDFs, no
  * shuffles, scale-independent.
  */
object DtCoercion {

  val Suffix = "_dt"

  /** Does this (name, type) subtree contain at least one coercible field? */
  def containsHit(name: String, dt: DataType): Boolean = dt match {
    case StringType => name.endsWith(Suffix)
    case st: StructType =>
      st.fields.exists(f => containsHit(f.name, f.dataType))
    case ArrayType(et: StructType, _) =>
      et.fields.exists(f => containsHit(f.name, f.dataType))
    case _ => false
  }

  /** All coercible field paths (dotted; arrays rendered as `[]`). */
  def hitPaths(schema: StructType): Seq[String] = {
    def walk(prefix: String, name: String, dt: DataType): Seq[String] = {
      val p = if (prefix.isEmpty) name else s"$prefix.$name"
      dt match {
        case StringType if name.endsWith(Suffix) => Seq(p)
        case st: StructType =>
          st.fields.toSeq.flatMap(f => walk(p, f.name, f.dataType))
        case ArrayType(et: StructType, _) =>
          et.fields.toSeq.flatMap(f => walk(p + "[]", f.name, f.dataType))
        case _ => Nil
      }
    }
    schema.fields.toSeq.flatMap(f => walk("", f.name, f.dataType))
  }

  private def parse(c: Column, strict: Boolean): Column =
    if (strict) to_timestamp(c) else try_to_timestamp(c)

  /** Rebuild one column, coercing every hit in its subtree. Wraps struct
    * rebuilds in `when(isNotNull, ...)` so a NULL struct stays NULL instead
    * of becoming a struct of NULLs.
    */
  private def rebuild(c: Column, name: String, dt: DataType, strict: Boolean): Column =
    dt match {
      case StringType if name.endsWith(Suffix) =>
        parse(c, strict)
      case st: StructType if st.fields.exists(f => containsHit(f.name, f.dataType)) =>
        when(c.isNotNull, struct(st.fields.toSeq.map { f =>
          rebuild(c.getField(f.name), f.name, f.dataType, strict).as(f.name)
        }: _*))
      case ArrayType(et: StructType, _)
          if et.fields.exists(f => containsHit(f.name, f.dataType)) =>
        transform(c, x =>
          when(x.isNotNull, struct(et.fields.toSeq.map { f =>
            rebuild(x.getField(f.name), f.name, f.dataType, strict).as(f.name)
          }: _*)))
      case _ => c
    }

  /** Coerce every eligible `_dt` field in `df`; all other columns (and
    * column order) are preserved byte-for-byte.
    */
  def coerceDtFields(df: DataFrame, strict: Boolean = false): DataFrame = {
    val cols = df.schema.fields.toSeq.map { f =>
      if (containsHit(f.name, f.dataType))
        rebuild(df.col(s"`${f.name}`"), f.name, f.dataType, strict).as(f.name)
      else df.col(s"`${f.name}`")
    }
    df.select(cols: _*)
  }
}
