package graft.functions

/** Allocation-light MD5 prefix hashing for the engine's per-shingle
  * kernels, which need only a PREFIX of the digest: MinHash base
  * hashes (top 28 bits), winnowing fingerprints (first 6 bytes),
  * SimHash token votes (first 2 bytes).
  *
  * Two costs the naive `md.digest(sb.toString.getBytes)` loop pays per
  * shingle are removed: the String + encoded-byte-array round-trip on
  * the input side (tokens are UTF-8-encoded ONCE per document and
  * shingle bytes assembled in a reusable [[ByteBuf]]) and the fresh
  * 16-byte result array on the output side (`digest(out, 0, 16)` into
  * a reusable buffer). The compression itself stays on
  * `java.security.MessageDigest`: JDK 16+ ships an MD5 HotSpot
  * intrinsic (JDK-8250902) that a pure-JVM reimplementation measurably
  * loses to (KernelBench r21: hand-rolled compress 0.87× vs 1.22× for
  * this hybrid, interleaved medians).
  *
  * Bit-equality with the plain MessageDigest form across
  * lengths/contents is pinned by Md5Spec (property test, 0–300 byte
  * inputs incl. multi-byte UTF-8).
  */
object Md5 {

  /** Single-shot prefix hasher; one instance per task (carries the
    * digest object and a reusable output buffer); not thread-safe.
    */
  final class First8 {
    private val md = java.security.MessageDigest.getInstance("MD5")
    private val out = new Array[Byte](16)

    /** First 8 bytes of MD5(buf[0, len)) packed BIG-ENDIAN:
      * bit 63..56 = digest byte 0 (the byte `md5hex.substring(0, 2)`
      * spells), ..., bit 7..0 = digest byte 7. So the engine's
      * hex-prefix values are right-shifts: top 28 bits = `>>> 36`,
      * first 6 bytes = `>>> 16`, first 2 bytes = `>>> 48`.
      */
    def hash(buf: Array[Byte], len: Int): Long = {
      md.reset()
      md.update(buf, 0, len)
      md.digest(out, 0, 16): Unit
      ((out(0) & 0xffL) << 56) | ((out(1) & 0xffL) << 48) |
        ((out(2) & 0xffL) << 40) | ((out(3) & 0xffL) << 32) |
        ((out(4) & 0xffL) << 24) | ((out(5) & 0xffL) << 16) |
        ((out(6) & 0xffL) << 8) | (out(7) & 0xffL)
    }
  }

  /** UTF-8 of the literal "null" — what `StringBuilder.append` spells
    * for a null String; kernel rewrites that pre-encode tokens use it
    * to keep the former byte stream exactly.
    */
  val NullBytes: Array[Byte] = "null".getBytes("UTF-8")

  /** Grow-on-demand byte buffer for assembling shingle bytes without
    * per-shingle String/StringBuilder round-trips. Append pre-encoded
    * token byte arrays + single-space separators; `len` tracks the
    * logical end. One instance per task; not thread-safe.
    */
  final class ByteBuf(initial: Int = 256) {
    var buf = new Array[Byte](initial)
    var len = 0
    def reset(): Unit = len = 0
    def append(bytes: Array[Byte]): Unit = {
      ensure(bytes.length)
      System.arraycopy(bytes, 0, buf, len, bytes.length)
      len += bytes.length
    }
    def appendSpace(): Unit = { ensure(1); buf(len) = ' '; len += 1 }
    private def ensure(n: Int): Unit =
      if (len + n > buf.length) {
        val nb = new Array[Byte](math.max(buf.length * 2, len + n))
        System.arraycopy(buf, 0, nb, 0, len)
        buf = nb
      }
  }
}
