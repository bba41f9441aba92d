package graft.expressions

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro BINARY codec over the core Avro library (the jar Spark itself
  * depends on — this distribution ships no spark-avro connector, so the
  * engine provides the wire seam the same way it provides the protobuf
  * one: row-local expressions over a BINARY column).
  *
  * The decode side performs real Avro SCHEMA RESOLUTION
  * (GenericDatumReader(writerSchema, readerSchema)): a reader schema may
  * drop fields, reorder them, or add new fields with defaults, and the
  * library resolves the wire bytes against it exactly per the Avro spec —
  * the schema-evolution contract event pipelines rely on when producers
  * upgrade before consumers.
  */
private[expressions] object AvroCodec {
  def parse(json: String): Schema = new Schema.Parser().parse(json)
}

/** Encode (id, name, value) as Avro binary with the given writer schema
  * (fields id: long, name: string, value: long). */
case class AvroMessageEncode(first: Expression, second: Expression, third: Expression,
    schemaJson: String)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  /** The encoder populates exactly (id: long, name: string, value: long);
    * any other writer schema would fail per-ROW deep inside the datum
    * writer (or silently miswrite if names coincide with different
    * types — ADVICE r10). Validate once at first use and fail fast. */
  @transient private lazy val schema = {
    val s = AvroCodec.parse(schemaJson)
    def fieldType(n: String): Option[Schema.Type] =
      Option(s.getField(n)).map(_.schema().getType)
    require(s.getType == Schema.Type.RECORD && s.getFields.size == 3
        && fieldType("id").contains(Schema.Type.LONG)
        && fieldType("name").contains(Schema.Type.STRING)
        && fieldType("value").contains(Schema.Type.LONG),
      "AvroMessageEncode: writer schema must be a record with exactly " +
        s"(id: long, name: string, value: long); got: $schemaJson")
    s
  }
  @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)

  override def nullSafeEval(id: Any, name: Any, value: Any): Any = {
    val rec = new GenericData.Record(schema)
    rec.put("id", id.asInstanceOf[Long])
    rec.put("name", name.asInstanceOf[UTF8String].toString)
    rec.put("value", value.asInstanceOf[Long])
    val out = new java.io.ByteArrayOutputStream(64)
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    writer.write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Decode Avro binary with writer→reader schema resolution and project
  * one field, returned as long or string per `fieldType`. */
case class AvroDecodeField(child: Expression, writerJson: String,
    readerJson: String, field: String, fieldType: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    if (fieldType == "long") LongType else StringType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  @transient private lazy val reader = new GenericDatumReader[GenericRecord](
    AvroCodec.parse(writerJson), AvroCodec.parse(readerJson))

  override def nullSafeEval(bin: Any): Any = {
    val dec = DecoderFactory.get()
      .binaryDecoder(bin.asInstanceOf[Array[Byte]], null)
    val rec = reader.read(null, dec)
    val v = rec.get(field)
    if (v == null) null
    else if (fieldType == "long") v.asInstanceOf[Long]
    else UTF8String.fromString(v.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
