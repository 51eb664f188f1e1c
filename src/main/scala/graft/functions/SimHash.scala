package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting (16-bit variant).
  *
  * Per distinct token: take the first 4 hex chars of md5(token)
  * (16 bits). Per document and bit position b: the bit is set iff more
  * than half the tokens have bit b set. The per-token bit extraction
  * is pure integer arithmetic on hex nibbles (`instr` on a hex
  * alphabet), so the whole computation is portable, codegen'd, and
  * exactly reproducible in any ANSI-SQL engine — no platform hash.
  *
  * Shape at scale: explode to (doc, token) → one hash-aggregate keyed
  * by doc with 16 conditional sums; a single shuffle.
  */
object SimHash {
  val bits = 16

  /** Bit b (0 = LSB of the last nibble) of the 16-bit token hash. */
  def tokenBit(token: Column, b: Int): Column = {
    val hexPos = 4 - b / 4 // hex char position 1..4, MSB first
    val nib = conv(substring(md5(token), hexPos, 1), 16, 10).cast("int")
    floor(nib / (1 << (b % 4))) % 2
  }

  /** Aggregate expression: 16-bit simhash over grouped token rows. */
  def simhashAgg(token: Column): Column = {
    val tot = count(lit(1))
    (0 until bits)
      .map { b =>
        val cnt = sum(tokenBit(token, b))
        when(cnt * 2 > tot, lit(1L << b)).otherwise(lit(0L))
      }
      .reduce(_ + _)
      .cast("long")
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
