package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen form of the card-extended PII-clean transform
  * `collapseTrim(maskIps(maskPhones(maskCards(maskUrls(maskEmails(
  * text))))))` — [[graft.functions.TextMaskF.maskCards]] adds Luhn-
  * checked credit-card masking (16 digits, bare or 4×4 grouped with a
  * consistent '-'/' ' separator) ahead of the phone/IP passes. The
  * Luhn arm has no regex equivalent, so the scanner is the operator
  * definition itself; same shape as [[CleanTextPii]] — one static
  * helper call inside whole-stage codegen, zero regex-engine overhead
  * on the scan. */
case class CleanTextPiiCard(child: Expression) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.functions.TextMaskF.cleanTextPiiCard(
        input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = UTF8String.fromString(
         |  graft.functions.TextMaskF.cleanTextPiiCard($c.toString()));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): CleanTextPiiCard =
    copy(child = c)
  override def prettyName: String = "clean_text_pii_card"
}
