package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve key: bit-interleaves two 16-bit quantized
  * dimensions into one clustering key, entirely in codegen'd integer
  * Column math (magic-number bit spreading — the same mask cascade
  * Delta/Iceberg OPTIMIZE ZORDER uses). Sorting a table by `morton2`
  * gives every parquet file a tight min/max envelope on BOTH source
  * columns at once, so the scan prunes row groups for predicates on
  * either dimension — the multi-column generalization of the
  * single-column value-clustered layout (`s_sorted_layout`). The math
  * is plain `& | <<`, so the DuckDB oracle reproduces the key
  * bit-for-bit.
  */
object ZOrderF {

  /** Spread the low 16 bits of `c` to even bit positions (0,2,4,…30). */
  def spread16(c: Column): Column = {
    val c0 = c.bitwiseAND(lit(0xFFFFL))
    val s1 = c0.bitwiseOR(shiftleft(c0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two 16-bit dimensions (a even bits, b odd). */
  def morton2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** The DuckDB mirror of [[morton2]] over SQL expressions `a`, `b` —
    * kept in lockstep with the Column form above. */
  def morton2Sql(a: String, b: String): String = {
    def spread(x: String): String = {
      val c0 = s"(($x) & 65535)"
      val s1 = s"(($c0 | ($c0 << 8)) & 16711935)"
      val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"
      val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"
      s"(($s3 | ($s3 << 1)) & 1431655765)"
    }
    s"(${spread(a)} | (${spread(b)} << 1))"
  }
}
