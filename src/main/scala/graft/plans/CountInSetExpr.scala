package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A baked set of UTF-8 strings (the [[NbLangModel]] family reference-
  * object pattern) for in-row membership counting — e.g. the benchmark
  * shingle set of `x_decontaminate`, whose production analogue (an eval
  * suite) is genuinely small. */
final class Utf8Set(val keyBytes: Array[Array[Byte]]) extends Serializable {
  /** Rebuilt lazily after task deserialization. */
  @transient lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](keyBytes.length * 2)
    var i = 0
    while (i < keyBytes.length) {
      s.add(UTF8String.fromBytes(keyBytes(i)))
      i += 1
    }
    s
  }
}

/** `count_in_set(array<string>) → bigint` — how many of the array's
  * elements are members of the baked [[Utf8Set]].
  *
  * Optimization-round rationale (guide §2.3/§2.4): with the probe set
  * collected, the corpus side of a contamination check needs no explode,
  * no broadcast join and no per-doc hit aggregation — the count is
  * document-local (the caller passes the doc's DISTINCT shingles, so the
  * count equals the old `explode → join → groupBy(doc).count` law
  * exactly). NULL array → 0 (the old left-join miss). */
case class CountInSet(child: Expression, set: Utf8Set)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"count_in_set needs array<string>, got ${other.sql}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "count_in_set"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    CountInSet.compute(
      if (v == null) null else v.asInstanceOf[ArrayData], set)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("utf8Set", set, "graft.plans.Utf8Set")
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
         |${c.code}
         |long ${ev.value} = graft.plans.CountInSet.compute(
         |  ${c.isNull} ? null : ${c.value}, $m);
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): CountInSet =
    copy(child = c)
}

object CountInSet {
  /** Static helper the generated code calls once per row. */
  def compute(arr: ArrayData, s: Utf8Set): Long = {
    if (arr == null) return 0L
    var n = 0L
    var i = 0
    val k = arr.numElements()
    while (i < k) {
      if (!arr.isNullAt(i) && s.set.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }
}
