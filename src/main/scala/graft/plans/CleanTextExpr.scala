package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen form of the fused corpus-clean transform
  * `collapseTrim(maskUrls(maskEmails(text)))` — see
  * [[graft.functions.TextMaskF]] for the exact regex-chain semantics it
  * replaces and the sf10 measurements motivating it. Participates in
  * whole-stage codegen via a static helper call on the scan's string,
  * so the cleaning pass stays inside the fused scan loop with zero
  * regex-engine overhead. */
case class CleanText(child: Expression) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.functions.TextMaskF.cleanText(
        input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = UTF8String.fromString(
         |  graft.functions.TextMaskF.cleanText($c.toString()));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): CleanText =
    copy(child = c)
  override def prettyName: String = "clean_text"
}
