package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Unsigned byte values of a binary column as `array<long>`, one native
  * pass — semantically identical to the composable
  * `transform(sequence(0, length(b) - 1), i => conv(substr(hex(b), 2i+1, 2), 16, 10))`
  * idiom, which any SQL oracle keeps using.
  *
  * Why native: the composable form is the d26 trap in binary form —
  * `hex(content)` is an unnamed subtree inside the lambda, re-evaluated at
  * EVERY byte position (O(n²) characters per row; a projection alias does
  * not survive CollapseProject when the lambda references it only once).
  * This kernel reads the bytes directly — no hex string exists at all —
  * and stays inside whole-stage codegen, so frame/delta operators scan
  * binary payloads at parquet-read speed regardless of payload size.
  */
case class BytesToLongs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bytes_to_longs"

  override def nullSafeEval(input: Any): Any =
    BytesToLongs.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.BytesToLongs.compute($b);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BytesToLongs {

  /** Called from generated code — must stay public and static-shaped. */
  def compute(bytes: Array[Byte]): ArrayData = {
    val out = new Array[Long](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) & 0xffL; i += 1 }
    new GenericArrayData(out)
  }

  def apply(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(BytesToLongs(ColumnBridge.expression(bin)))
  }
}
