package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Protocol-buffers WIRE FORMAT codec, implemented directly from the
  * published encoding spec (protobuf.dev/programming-guides/encoding):
  * varints (LEB128, 7 bits per byte, MSB continuation), tags
  * (field_number << 3 | wire_type), and length-delimited payloads. No
  * protobuf runtime or generated classes — the engine's codec seam treats
  * the wire format the way it treats Avro binary or XML text: bytes in a
  * BINARY column, decoded by a row-local expression.
  *
  * Wire types handled: 0 = varint, 1 = fixed64 (skipped), 2 =
  * length-delimited (string/bytes/sub-message), 5 = fixed32 (skipped).
  * Unknown fields are skipped exactly as the spec requires, so decoding
  * is forward-compatible: a reader asking for field 2 of a message that
  * grew new fields still finds it (q259 exercises exactly that).
  */
private[expressions] object ProtoWire {
  /** Append a varint. */
  def putVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Read a varint at `pos`; returns (value, nextPos). Validated against
    * truncation (the expressions decode ARBITRARY binary columns, not just
    * self-encoded bytes — ADVICE r10): a varint running past the buffer or
    * longer than the spec's 10-byte maximum raises a clean decode error
    * instead of ArrayIndexOutOfBoundsException / an unbounded shift. */
  def readVarint(b: Array[Byte], pos0: Int): (Long, Int) = {
    var pos = pos0
    var shift = 0
    var v = 0L
    while (shift <= 63) {
      if (pos >= b.length)
        throw new IllegalArgumentException(
          s"proto wire: truncated varint at offset $pos0")
      val x = b(pos)
      v |= (x & 0x7FL) << shift
      pos += 1
      if ((x & 0x80) == 0) return (v, pos)
      shift += 7
    }
    throw new IllegalArgumentException(
      s"proto wire: malformed varint (>10 bytes) at offset $pos0")
  }

  /** Scan the message for `fieldNo` with the expected wire type; returns
    * the varint value, or the (offset, len) of a length-delimited payload,
    * or absent. Skips unknown fields per spec. Per the proto3 spec's
    * message-merging rule, the LAST occurrence of a non-repeated scalar
    * field wins (concatenating two serialized messages overwrites fields),
    * so the whole message is scanned and the final match returned.
    * Length-delimited payloads are validated against the buffer bound, so
    * a malformed len can't read past the message (ADVICE r10). */
  def find(b: Array[Byte], fieldNo: Int, wantLenDelimited: Boolean): (Boolean, Long, Int, Int) = {
    var pos = 0
    var found = false
    var lastV = 0L
    var lastOff = 0
    var lastLen = 0
    while (pos < b.length) {
      val (tag, p1) = readVarint(b, pos)
      val fn = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      wt match {
        case 0 =>
          val (v, p2) = readVarint(b, p1)
          if (fn == fieldNo && !wantLenDelimited) { found = true; lastV = v }
          pos = p2
        case 1 => pos = p1 + 8
        case 2 =>
          val (len, p2) = readVarint(b, p1)
          if (len < 0 || p2 + len > b.length)
            throw new IllegalArgumentException(
              s"proto wire: truncated length-delimited field at offset $pos (len=$len)")
          if (fn == fieldNo && wantLenDelimited) {
            found = true; lastOff = p2; lastLen = len.toInt
          }
          pos = p2 + len.toInt
        case 5 => pos = p1 + 4
        case other =>
          throw new IllegalArgumentException(
            s"proto wire: unsupported wire type $other at offset $pos")
      }
    }
    if (pos > b.length)
      throw new IllegalArgumentException(
        s"proto wire: truncated fixed-width field (scan ran to $pos of ${b.length})")
    (found, lastV, lastOff, lastLen)
  }
}

/** Encode (id, name, value) as a proto3 message {int64 id = 1; string
  * name = 2; int64 value = 3} — the write side of the wire-format seam.
  * Proto3 default-value elision: zero ints and empty strings are omitted
  * from the wire, exactly as a real proto3 serializer does. */
case class ProtoMessageEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(id: Any, name: Any, value: Any): Any = {
    val out = new java.io.ByteArrayOutputStream(64)
    val idV = id.asInstanceOf[Long]
    if (idV != 0L) {
      ProtoWire.putVarint(out, (1L << 3) | 0); ProtoWire.putVarint(out, idV)
    }
    val nameB = name.asInstanceOf[UTF8String].getBytes
    if (nameB.nonEmpty) {
      ProtoWire.putVarint(out, (2L << 3) | 2)
      ProtoWire.putVarint(out, nameB.length.toLong)
      out.write(nameB, 0, nameB.length)
    }
    val vV = value.asInstanceOf[Long]
    if (vV != 0L) {
      ProtoWire.putVarint(out, (3L << 3) | 0); ProtoWire.putVarint(out, vV)
    }
    out.toByteArray
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Decode a varint (int32/int64/bool/enum) field from proto wire bytes;
  * NULL when the field is absent (proto3: absent == default). */
case class ProtoVarintField(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def nullSafeEval(bin: Any, fieldNo: Any): Any = {
    val (found, v, _, _) = ProtoWire.find(
      bin.asInstanceOf[Array[Byte]], fieldNo.asInstanceOf[Int], wantLenDelimited = false)
    if (found) v else null
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Decode a length-delimited string field from proto wire bytes; NULL
  * when absent. */
case class ProtoStringField(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def nullSafeEval(bin: Any, fieldNo: Any): Any = {
    val b = bin.asInstanceOf[Array[Byte]]
    val (found, _, off, len) = ProtoWire.find(
      b, fieldNo.asInstanceOf[Int], wantLenDelimited = true)
    if (found) UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, off, off + len))
    else null
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
