package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen form of the extended PII-clean transform
  * `collapseTrim(maskIps(maskPhones(maskUrls(maskEmails(text)))))` —
  * see [[graft.functions.TextMaskF]] for the exact regex-chain
  * semantics (e-mail/URL plus the r16 phone and IPv4 patterns) each
  * scanner replaces. Same shape as [[CleanText]]: a static helper call
  * inside whole-stage codegen, zero regex-engine overhead on the scan. */
case class CleanTextPii(child: Expression) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.functions.TextMaskF.cleanTextPii(
        input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = UTF8String.fromString(
         |  graft.functions.TextMaskF.cleanTextPii($c.toString()));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): CleanTextPii =
    copy(child = c)
  override def prettyName: String = "clean_text_pii"
}
