package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-dimensional clustering
  * key for physical layout. Sorting/range-partitioning a table by
  * `morton16(a, b)` makes file- and row-group-level min/max fences
  * selective on BOTH dimensions at once, where a single-column sort
  * only ever prunes its own column (ZOrderSpec proves the fence-count
  * win; q123 pins the bit ladder against the DuckDB formulation).
  *
  * The spread ladder is the standard shift-or-mask sequence; OR (not
  * addition) matters because the shifted copy overlaps the original
  * in bits 8-15 before the mask strips it — a multiplication would
  * carry into the kept bits. Everything stays in codegen'd built-in
  * expressions — no UDF.
  */
object ZOrder {

  /** Interleave the low 16 bits of `x` into even bit positions. */
  private def spread16(x: Column): Column = {
    val m = x.bitwiseAND(lit(65535L))
    val s1 = m.bitwiseOR(shiftleft(m, 8)).bitwiseAND(lit(16711935L))    // 0x00FF00FF
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(252645135L)) // 0x0F0F0F0F
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(858993459L)) // 0x33333333
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(1431655765L))         // 0x55555555
  }

  /** 32-bit Morton code of two dimensions' low 16 bits; `a` occupies
    * the even bits. Monotone locality: nearby (a, b) points share
    * code prefixes, so a range partition on the code is a 2-D tiling.
    */
  def morton16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))
}
