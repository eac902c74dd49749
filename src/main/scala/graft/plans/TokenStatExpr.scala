package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `token_set_count(array<string>) → int` — how many elements of a token
  * array belong to a small constant word set (stopword counting, the
  * language-ID marker hits). Replaces `size(filter(lt, t.isin(words)))`,
  * which Catalyst evaluates INTERPRETED (higher-order functions have no
  * codegen): the text-stats scan runs five such walks per row — one
  * stopword set and four language marker sets — each re-evaluating an
  * `In` expression tree per element. This expression is one codegen
  * helper call per set doing UTF8String equality against a tiny array
  * (n ≤ 10; linear scan beats hashing at that size).
  *
  * Bit-compatibility with the composed form: NULL array → NULL; NULL
  * elements are skipped (`isin` yields NULL → `filter` drops the
  * element); the count is exact so every downstream ratio/argmax is
  * unchanged.
  *
  * Reference scope: backs the text-analysis extension ops (quality
  * scoring, language ID); the reference engine has no text surface.
  */
case class TokenSetCount(child: Expression, words: Seq[String])
    extends UnaryExpression with Serializable {

  @transient private lazy val set: Array[UTF8String] =
    words.map(UTF8String.fromString).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"token_set_count needs array<string>, got ${other.sql}")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "token_set_count"

  override def nullSafeEval(v: Any): Any =
    TokenSetCount.compute(v.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TokenSetCount.compute($c, $setRef)")
  }

  override protected def withNewChildInternal(c: Expression): TokenSetCount =
    copy(child = c)
}

object TokenSetCount {

  /** Static helper the generated code calls once per row. */
  def compute(arr: ArrayData, set: Array[UTF8String]): Int = {
    val n = arr.numElements()
    var count = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        var k = 0
        while (k < set.length) {
          if (set(k).equals(t)) { count += 1; k = set.length }
          else k += 1
        }
      }
      i += 1
    }
    count
  }
}

/** `rolling_token_hash(array<string>) → bigint` — the polynomial rolling
  * hash `fold(lt, 0, (acc, t) → (acc·B + md5prefix32(t)) mod P)` as one
  * native pass. The composed `aggregate` lambda re-evaluates an
  * `md5 → substring → conv → cast` expression tree INTERPRETED per
  * token, materializing a 32-char hex string only to parse its first 8
  * chars back into a long; this helper digests the token bytes directly
  * and reads the first 4 bytes as the same unsigned 32-bit value.
  *
  * Bit-compatibility (constants [[graft.functions.TextF.RollB]]/
  * [[TextF.RollP]] shared): identical fold order and modular arithmetic
  * (B < 2^20, P > 2^32 ⇒ acc·B + h < 2^52, no overflow either way);
  * NULL array → NULL; a NULL token nulls the whole fold (md5(NULL) is
  * NULL and the accumulator never recovers) → NULL; empty array → 0.
  */
case class RollingTokenHash(child: Expression, b: Long, p: Long)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"rolling_token_hash needs array<string>, got ${other.sql}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_token_hash"

  override def nullSafeEval(v: Any): Any =
    RollingTokenHash.compute(v.asInstanceOf[ArrayData], b, p)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("roll")
      s"""
         |java.lang.Long $r = graft.plans.RollingTokenHash.compute($c, ${b}L, ${p}L);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): RollingTokenHash =
    copy(child = c)
}

object RollingTokenHash {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Static helper the generated code calls once per row; null signals
    * the composed form's NULL-token edge. */
  def compute(arr: ArrayData, b: Long, p: Long): java.lang.Long = {
    val n = arr.numElements()
    val md = digests.get()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      // first 8 hex chars of md5 == first 4 digest bytes, unsigned
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      acc = (acc * b + h) % p
      i += 1
    }
    acc
  }
}
