package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** Byte-level decode of the synthetic multimodal container
  * (see [[graft.operators.Multimodal]]: magic "GRFT" + big-endian
  * width/height/n_frames int32s, then the body bytes).
  *
  * Promoted from the original `mapPartitions` formulation to a native
  * codegen expression for the same reason `simhash16` was (BASELINE.md
  * re-baseline note): a typed map breaks the WholeStageCodegen span and
  * forces a full InternalRow↔Row round-trip per asset, while an
  * expression keeps the scan→decode→project pipeline in one compiled
  * stage with the payload bytes read in place. A production codec (JNI
  * pixel decode) drops into [[ContainerDecodeHelper.decode]] unchanged —
  * only the body math changes, the plan shape stays.
  */
object ContainerDecodeHelper {
  final val HeaderBytes = 16

  private def be32(p: Array[Byte], off: Int): Int =
    ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
      ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)

  /** Validates the magic, parses width/height out of the header BYTES,
    * and folds the rolling polynomial checksum over the body — one pass,
    * no allocation beyond the 4-field result row. Malformed containers
    * fail the task (same contract as the original `require`): corrupt
    * payload bytes are a data bug to surface, not skip.
    */
  def decode(p: Array[Byte]): InternalRow = {
    if (p.length < HeaderBytes ||
        p(0) != 'G' || p(1) != 'R' || p(2) != 'F' || p(3) != 'T')
      throw new IllegalArgumentException(
        s"bad asset container header (len=${p.length})")
    val width = be32(p, 4)
    val height = be32(p, 8)
    var sum = 0L
    var i = HeaderBytes
    while (i < p.length) {
      sum = (sum * 31 + (p(i) & 0xff)) % 1000000007L
      i += 1
    }
    new GenericInternalRow(
      Array[Any](width, height, p.length - HeaderBytes, sum))
  }
}

/** `container_decode(payload: binary)` →
  * `struct<width int, height int, payload_bytes int, checksum bigint>`.
  */
case class ContainerDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"container_decode requires binary, got ${other.sql}")
    }

  override def dataType: DataType = ContainerDecode.schema
  override def prettyName: String = "container_decode"

  override protected def nullSafeEval(v: Any): Any =
    ContainerDecodeHelper.decode(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // static call per row (the StaticInvoke pattern): the byte loop lives
    // in one JIT-friendly method and the operator stays inside
    // whole-stage codegen
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ContainerDecodeHelper.decode($a);")

  override protected def withNewChildInternal(newChild: Expression): ContainerDecode =
    copy(child = newChild)
}

object ContainerDecode {
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("payload_bytes", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))
}
