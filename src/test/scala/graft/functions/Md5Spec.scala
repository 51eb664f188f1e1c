package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Bit-equality of the allocation-free [[Md5.First8]] against
  * `java.security.MessageDigest` — every length class the padding
  * logic distinguishes (0, <56, 56..63, 64, >64, multi-block), random
  * bytes, and the call-site prefix extractions (28-bit MinHash base
  * hash, 48-bit winnowing fingerprint, 16-bit SimHash vote).
  */
class Md5Spec extends AnyFunSuite {

  private def ref8(bytes: Array[Byte]): Long = {
    val dg = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (dg(i) & 0xffL); i += 1 }
    h
  }

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(77L + i)))

  test("first8 == MessageDigest first 8 bytes on every padding class") {
    val h = new Md5.First8
    for (len <- Seq(0, 1, 7, 20, 54, 55, 56, 57, 63, 64, 65, 119, 120,
        127, 128, 200, 300)) {
      val rnd = new scala.util.Random(len)
      val bytes = Array.fill(len)(rnd.nextInt().toByte)
      assert(h.hash(bytes, len) === ref8(bytes), s"len=$len")
    }
  }

  test("first8 == MessageDigest on random byte arrays (property)") {
    val h = new Md5.First8
    val gen = Gen.choose(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
    for (bs <- samples(gen, 200)) {
      val arr = bs.toArray
      assert(h.hash(arr, arr.length) === ref8(arr))
    }
  }

  test("hash honors the logical length, not the buffer capacity") {
    val h = new Md5.First8
    val buf = new Array[Byte](128)
    val rnd = new scala.util.Random(5)
    rnd.nextBytes(buf)
    for (len <- Seq(0, 13, 56, 100))
      assert(h.hash(buf, len) === ref8(buf.take(len)), s"len=$len")
  }

  test("call-site prefix extractions match the hex-string forms") {
    val h = new Md5.First8
    val gen = Gen.alphaNumStr.map(s => s + " zürich 文字 " + s)
    for (s <- samples(gen, 50)) {
      val bytes = s.getBytes("UTF-8")
      val v = h.hash(bytes, bytes.length)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map(b => f"$b%02x").mkString
      // MinHash base hash: first 7 hex chars (28 bits)
      assert((v >>> 36) === java.lang.Long.parseLong(hex.take(7), 16))
      // winnowing fingerprint: first 12 hex chars (6 bytes)
      assert((v >>> 16) === java.lang.Long.parseLong(hex.take(12), 16))
      // SimHash vote: first 4 hex chars (16 bits)
      assert((v >>> 48) === java.lang.Long.parseLong(hex.take(4), 16))
    }
  }

  test("ByteBuf assembles the same bytes as string concatenation") {
    val bb = new Md5.ByteBuf(4)
    val toks = Seq("alpha", "zürich", "文字", "", "tail")
    bb.reset()
    toks.zipWithIndex.foreach { case (t, i) =>
      if (i > 0) bb.appendSpace()
      bb.append(t.getBytes("UTF-8"))
    }
    val expect = toks.mkString(" ").getBytes("UTF-8")
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOf(bb.buf, bb.len), expect))
  }
}
