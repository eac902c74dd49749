package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level whitespace tokenizer with EXACTLY the semantics of the
  * composed Column form it replaces (`TextF.tokens`):
  *
  *   when(length(trim(text)) === 0, array())
  *     .otherwise(split(trim(text), "\\s+"))
  *
  * i.e. Spark `trim` strips 0x20 only from both ends; `split(_, "\\s+")`
  * is `Pattern.split(s, -1)`: a java-\s run at the start of the trimmed
  * string yields a LEADING empty token and a run at the end a TRAILING
  * one (both reachable via \t etc., which `trim` does not strip) —
  * quirks preserved, property-proven in `WsTokensSpec`.
  *
  * Why bytes: all six java-\s chars are single ASCII bytes, and UTF-8
  * multi-byte sequences never contain ASCII bytes, so the scan needs no
  * decode; each token is a zero-copy slice assembled with
  * `UTF8String.fromBytes(b, start, len)`. Replaces a per-row
  * java.util.regex split on every tokenizing query's scan (the sf10
  * table showed the regex queries losing to the comparator while the
  * codegen-expression queries win).
  */
object WsTokensHelper {
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C ||
      b == 0x0D

  def eval(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    var a = 0
    var b = bytes.length
    while (a < b && bytes(a) == 0x20) a += 1
    while (b > a && bytes(b - 1) == 0x20) b -= 1
    if (a == b) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[UTF8String]()
    var i = a
    if (isWs(bytes(a))) out.add(UTF8String.EMPTY_UTF8) // leading \s run
    while (i < b) {
      while (i < b && isWs(bytes(i))) i += 1
      if (i < b) {
        val start = i
        while (i < b && !isWs(bytes(i))) i += 1
        out.add(UTF8String.fromBytes(bytes, start, i - start))
      } else out.add(UTF8String.EMPTY_UTF8) // trailing \s run
    }
    new GenericArrayData(out.toArray)
  }
}

case class WsTokens(child: Expression) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    WsTokensHelper.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.WsTokensHelper.eval($c);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): WsTokens =
    copy(child = c)
  override def prettyName: String = "ws_tokens"
}
