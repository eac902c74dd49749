package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-filter membership over a broadcast word array — the
  * semi-join-reduction primitive (mirrors what Spark's
  * `InjectRuntimeFilter` builds internally, but as an explicit,
  * deterministic operator the engine can apply to any fact scan).
  *
  * The filter is a plain `Array[Long]` of 2^logBits bits baked into the
  * plan as a reference object (built once from the dim side, a few KB —
  * see `ScaleQueries.bloomWords`), probed with K double-hashed positions
  * derived from one splitmix64 mix of the key. `eval` and `doGenCode`
  * are the same arithmetic, and whole-stage codegen keeps the probe
  * inside the scan stage — the fact table is pruned BEFORE the join
  * exchange, which at 100 TB is the difference between shuffling the
  * full fact table and shuffling the ~matching fraction.
  *
  * No false negatives (every inserted key probes true), so
  * `bloom-prune → exact join` is semantically identical to the plain
  * join — exactly what the DuckDB oracle checks.
  */
object BloomF {

  /** splitmix64 finalizer — one multiply-xor-shift cascade; public so
    * build (insert) and probe (this expression) share the mix. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The i-th probe position for a key: double hashing
    * h1 + i*h2 (h2 forced odd) masked to the 2^logBits table. */
  @inline def position(key: Long, i: Int, logBits: Int): Int = {
    val h = mix(key)
    val h1 = (h & 0x7fffffffL).toInt
    val h2 = ((h >>> 32) | 1L).toInt
    (h1 + i * h2) & ((1 << logBits) - 1)
  }

  /** Number of probe hashes. */
  val K = 4

  /** Build the word array from an iterator of keys (driver-side
    * assembly of the distributed per-word OR aggregate). */
  def emptyWords(logBits: Int): Array[Long] = new Array[Long](1 << (logBits - 6))

  def insert(words: Array[Long], key: Long, logBits: Int): Unit = {
    var i = 0
    while (i < K) {
      val p = position(key, i, logBits)
      words(p >>> 6) |= 1L << (p & 63)
      i += 1
    }
  }

  def mightContain(words: Array[Long], key: Long, logBits: Int): Boolean = {
    var i = 0
    while (i < K) {
      val p = position(key, i, logBits)
      if ((words(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

case class BloomMightContain(child: Expression, words: Array[Long],
                             logBits: Int)
    extends UnaryExpression with Serializable {

  require(words.length == 1 << (logBits - 6),
    s"word array must hold 2^$logBits bits")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_might_contain"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain needs a BIGINT key, got ${child.dataType}")
  }

  override def nullSafeEval(k: Any): Any =
    BloomF.mightContain(words, k.asInstanceOf[Long], logBits)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    val mask = (1 << logBits) - 1
    nullSafeCodeGen(ctx, ev, k => {
      val z = ctx.freshName("z")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val hit = ctx.freshName("hit")
      s"""
         |long $z = $k + 0x9e3779b97f4a7c15L;
         |$z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
         |$z = $z ^ ($z >>> 31);
         |int $h1 = (int) ($z & 0x7fffffffL);
         |int $h2 = (int) (($z >>> 32) | 1L);
         |boolean $hit = true;
         |for (int $i = 0; $i < ${BloomF.K}; $i++) {
         |  int $p = ($h1 + $i * $h2) & $mask;
         |  if (($w[$p >>> 6] & (1L << ($p & 63))) == 0L) {
         |    $hit = false; break;
         |  }
         |}
         |${ev.value} = $hit;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}
