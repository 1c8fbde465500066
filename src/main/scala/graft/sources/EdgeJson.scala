package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ONE jackson-tree → row converter shared by both EDGE read paths
  * (r15, VERDICT #5): the page body is parsed exactly once and each
  * `results[]` node converts straight to a row — previously the
  * function path re-serialized every item (`node.toString`) and
  * re-parsed it with `from_json`, and the DSv2 reader re-parsed the
  * same re-serialized strings with a second ObjectMapper: a genuine
  * 2× parse of every byte on the ingest hot path at any scale.
  *
  * Extraction is type-CHECKED, not Jackson-coerced (the r14 DSv2
  * contract, now the contract of BOTH paths): `asLong()` on a
  * non-numeric node fabricates 0, and `canConvertToLong` alone lets a
  * fractional 1430000000.7 truncate into a fabricated integer — a
  * wrong-typed field is NULL instead. A field absent from a record is
  * NULL (the reference's sparse in-situ records). Note the deliberate
  * divergence from raw `from_json`, which nulls the ENTIRE record
  * when one field fails to convert: field-level nulls keep the
  * readable fields of a partially-bad record, and the two engine read
  * paths now agree by construction (EdgeSourceSpec pins them equal on
  * an adversarial server).
  */
private[sources] object EdgeJson {

  /** Extract one field as an EXTERNAL (Row) value; null when absent,
    * JSON-null, or wrong-typed.
    */
  private def externalValue(node: JsonNode, f: StructField): Any = {
    val c = node.get(f.name)
    if (c == null || c.isNull) null
    else f.dataType match {
      case LongType if c.isIntegralNumber && c.canConvertToLong => c.asLong()
      case IntegerType if c.isIntegralNumber && c.canConvertToInt => c.asInt()
      case DoubleType if c.isNumber => c.asDouble()
      case FloatType if c.isNumber => c.asDouble().toFloat
      case BooleanType if c.isBoolean => c.asBoolean()
      case StringType => if (c.isTextual) c.asText() else c.toString
      case LongType | IntegerType | DoubleType | FloatType |
           BooleanType => null // wrong JSON type → NULL
      case t => throw new IllegalArgumentException(
        s"edge source: unsupported column type $t for ${f.name}")
    }
  }

  /** External Row for the function API (`EdgeSource.read`). */
  def externalRow(node: JsonNode, schema: StructType): Row =
    Row.fromSeq(schema.fields.map(f => externalValue(node, f)).toSeq)

  /** InternalRow for the DSv2 partition reader (UTF8String strings,
    * same extraction contract).
    */
  def catalystRow(node: JsonNode, schema: StructType): InternalRow = {
    val vals = schema.fields.map { f =>
      externalValue(node, f) match {
        case s: String => UTF8String.fromString(s)
        case v => v
      }
    }
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }
}
