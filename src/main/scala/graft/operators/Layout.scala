package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Data-layout operators for scan locality at scale. A 100 TB table is
 * only as fast as the files a query can SKIP: sorting by a Z-order
 * (Morton) code clusters rows that are close in BOTH key dimensions
 * into the same files, so min/max file statistics prune
 * two-dimensional range predicates — the standard layout trick behind
 * Delta/Iceberg Z-ORDER clustering. Pure integer bit-interleaving, so
 * any engine replays the codes exactly.
 */
object Layout {

  /**
   * Morton (Z-order) code: interleaves the low `bits` bits of two
   * non-negative integer columns — a's bit i lands at position 2i, b's
   * at 2i+1. Codegen'd closed-form expression (a fold of shift/mask
   * terms, no UDF); result fits a BIGINT for bits ≤ 31. Null if either
   * input is null; callers mask/clamp negatives first (the code is a
   * layout key, not arithmetic).
   */
  def mortonCode(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { i =>
      val abit = call_function("shiftleft",
        call_function("shiftright", al, lit(i)).bitwiseAND(lit(1L)), lit(2 * i))
      val bbit = call_function("shiftleft",
        call_function("shiftright", bl, lit(i)).bitwiseAND(lit(1L)), lit(2 * i + 1))
      abit.bitwiseOR(bbit)
    }.reduce(_.bitwiseOR(_))
  }
}
