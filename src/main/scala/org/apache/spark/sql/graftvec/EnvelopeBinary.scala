package org.apache.spark.sql.graftvec

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Binary envelope codec — the second wire format behind the
  * reference's pluggable-marshaller seam (marshaller.go:24 flags a
  * non-JSON marshaller as intended surface; publisher.go:48-51
  * `WithMarshaller`). Same message model as the JSON codec
  * (uuid, payload bytes, string→string headers), different bytes:
  * a length-prefixed TLV layout instead of JSON+base64, ~25% smaller
  * on the wire (no base64 expansion, no field names) and parseable
  * without a JSON tokenizer.
  *
  * Layout (all ints 4-byte big-endian):
  * {{{
  *   0x57 0x01                      magic 'W', version 1
  *   len(uuid)    uuid UTF-8 bytes
  *   len(payload) payload bytes
  *   n_headers                      headers in ascending key order
  *     len(key) key  len(val) val   per header; len(val) = -1 ⇒ null
  * }}}
  * Headers serialize key-sorted for byte-determinism (same rule as
  * the JSON kernel — Go map iteration is unordered, so any fixed
  * order is wire-compatible). `parse` returns null on any malformed
  * input (bad magic, truncation, negative length) — the same
  * skip-and-continue contract the subscriber relies on
  * (subscriber.go:57-62).
  */
object EnvelopeBinaryImpl {

  /** message → binary envelope. */
  def marshal(uuid: UTF8String, payload: Array[Byte], headers: MapData): Array[Byte] = {
    val uuidB = uuid.getBytes
    val n = headers.numElements()
    val keyArr = headers.keyArray()
    val valArr = headers.valueArray()
    val keys = new Array[Array[Byte]](n)
    val vals = new Array[Array[Byte]](n)
    val order = new Array[Integer](n)
    var size = 2 + 4 + uuidB.length + 4 + payload.length + 4
    var i = 0
    while (i < n) {
      keys(i) = keyArr.getUTF8String(i).getBytes
      vals(i) = if (valArr.isNullAt(i)) null else valArr.getUTF8String(i).getBytes
      order(i) = i
      size += 8 + keys(i).length + (if (vals(i) == null) 0 else vals(i).length)
      i += 1
    }
    java.util.Arrays.sort(order, (a: Integer, b: Integer) =>
      UTF8String.fromBytes(keys(a)).compareTo(UTF8String.fromBytes(keys(b))))
    val buf = ByteBuffer.allocate(size).order(ByteOrder.BIG_ENDIAN)
    buf.put(0x57.toByte).put(0x01.toByte)
    buf.putInt(uuidB.length).put(uuidB)
    buf.putInt(payload.length).put(payload)
    buf.putInt(n)
    i = 0
    while (i < n) {
      val j = order(i)
      buf.putInt(keys(j).length).put(keys(j))
      if (vals(j) == null) buf.putInt(-1)
      else { buf.putInt(vals(j).length).put(vals(j)) }
      i += 1
    }
    buf.array()
  }

  /** binary envelope → (uuid, payload, headers); null on malformed. */
  def parse(bytes: Array[Byte]): InternalRow = {
    try {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      if (buf.remaining() < 2 || buf.get() != 0x57.toByte || buf.get() != 0x01.toByte)
        return null
      def slice(): Array[Byte] = {
        if (buf.remaining() < 4) return null
        val len = buf.getInt()
        if (len < 0 || len > buf.remaining()) return null
        val out = new Array[Byte](len)
        buf.get(out)
        out
      }
      val uuidB = slice(); if (uuidB == null) return null
      val payload = slice(); if (payload == null) return null
      if (buf.remaining() < 4) return null
      val n = buf.getInt()
      if (n < 0 || n > buf.remaining()) return null
      val hKeys = new Array[Any](n)
      val hVals = new Array[Any](n)
      var i = 0
      while (i < n) {
        val k = slice(); if (k == null) return null
        hKeys(i) = UTF8String.fromBytes(k)
        if (buf.remaining() < 4) return null
        val vLen = buf.getInt()
        if (vLen == -1) hVals(i) = null
        else {
          if (vLen < 0 || vLen > buf.remaining()) return null
          val v = new Array[Byte](vLen)
          buf.get(v)
          hVals(i) = UTF8String.fromBytes(v)
        }
        i += 1
      }
      if (buf.remaining() != 0) return null // trailing garbage ⇒ malformed
      new GenericInternalRow(Array[Any](
        UTF8String.fromBytes(uuidB), payload,
        new ArrayBasedMapData(new GenericArrayData(hKeys), new GenericArrayData(hVals))))
    } catch {
      case _: Exception => null
    }
  }
}

/** `envelope_marshal_bin(uuid, payload, headers_map)` → binary. */
case class EnvelopeMarshalBin(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, BinaryType, MapType(StringType, StringType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "envelope_marshal_bin"

  override def nullSafeEval(uuid: Any, payload: Any, headers: Any): Any =
    EnvelopeBinaryImpl.marshal(uuid.asInstanceOf[UTF8String],
      payload.asInstanceOf[Array[Byte]], headers.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (u, p, h) =>
      s"org.apache.spark.sql.graftvec.EnvelopeBinaryImpl.marshal($u, $p, $h)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** `envelope_parse_bin(binary)` → struct<uuid, payload, headers>. */
case class EnvelopeParseBin(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("uuid", StringType),
    StructField("payload", BinaryType),
    StructField("headers", MapType(StringType, StringType))))
  override def nullable: Boolean = true
  override def prettyName: String = "envelope_parse_bin"

  override def nullSafeEval(bytes: Any): Any =
    EnvelopeBinaryImpl.parse(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.sql.graftvec.EnvelopeBinaryImpl.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column bridges (ExpressionUtils is private[sql]). */
object EnvelopeBinaryColumns {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils
  def marshal(uuid: Column, payload: Column, headers: Column): Column =
    ExpressionUtils.column(EnvelopeMarshalBin(ExpressionUtils.expression(uuid),
      ExpressionUtils.expression(payload), ExpressionUtils.expression(headers)))
  def parse(bin: Column): Column =
    ExpressionUtils.column(EnvelopeParseBin(ExpressionUtils.expression(bin)))
}
