package org.apache.spark.sql.graftvec

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass bytes→curation-stats kernel for real media payloads
  * (mm12's hot path — the r10/r11 verdicts' declared fast path).
  *
  * The composed alternative — sixteen interpreted higher-order
  * `transform`/`aggregate` lambdas re-slicing the wire per element —
  * is correct but evaluates outside whole-stage codegen and re-reads
  * the payload O(k) times. This expression walks the container ONCE
  * per row inside codegen (the generated code is a single static call
  * into the same hardened byte-walker MediaDecode.parsePayload uses:
  * BMP pixel rows with their 4-byte stride padding, RIFF chunk walk
  * to the PCM s16-LE samples, all bounds arithmetic in the Long
  * domain) and emits every stat a curation filter gates on as one
  * struct. Parity with the HOF form is spec-enforced bit-for-bit
  * (FunctionsSpec): identical element order, identical
  * sum/sqrt(sq/n)/max-abs folds, so rounded outputs agree exactly.
  *
  * Adversarial payloads (overflowing u32 fields, truncated data)
  * return ok=false rows, never throw — the MediaDecode contract.
  */
object MediaStatsImpl {
  def stats(bytes: Array[Byte]): InternalRow = {
    val s = graft.operators.MediaDecode.parsePayload(bytes)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(s.container), s.nUnits, s.meanSignal, s.rms,
      s.peak, s.meanR, s.meanG, s.meanB, s.ok))
  }
}

case class MediaStatsExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("container", StringType),
    StructField("n_units", LongType),
    StructField("mean_signal", DoubleType),
    StructField("rms", DoubleType),
    StructField("peak", DoubleType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType),
    StructField("ok", BooleanType)))
  override def nullable: Boolean = true
  override def prettyName: String = "media_stats"

  override def nullSafeEval(bytes: Any): Any =
    MediaStatsImpl.stats(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.sql.graftvec.MediaStatsImpl.stats($c);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column bridge (ExpressionUtils is private[sql]). */
object MediaStatsColumns {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils
  def mediaStats(payload: Column): Column =
    ExpressionUtils.column(MediaStatsExpr(ExpressionUtils.expression(payload)))
}
