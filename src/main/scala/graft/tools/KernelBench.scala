package graft.tools

/** Micro-benchmark for the r21 per-shingle hashing kernel rewrite:
  * MessageDigest + StringBuilder/String/getBytes per shingle (the
  * pre-r21 form) vs [[graft.functions.Md5.First8]] over pre-encoded
  * token bytes. Pure JVM — no Spark session — so it isolates the
  * per-task compute the signature map stage runs at any scale.
  *
  *   sbt "runMain graft.tools.KernelBench [docs] [tokensPerDoc]"
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(20000)
    val tokPerDoc = args.lift(1).map(_.toInt).getOrElse(60)
    val n = 3 // shingle width
    val k = 12
    val p = graft.functions.MinHashLsh.P
    val as = (0 until k).map(graft.functions.MinHashLsh.aConst).toArray
    val bs = (0 until k).map(graft.functions.MinHashLsh.bConst).toArray
    val rnd = new scala.util.Random(7)
    val vocab = Array.tabulate(5000)(i => s"tok${rnd.nextInt(99999)}x$i")
    val docs = Array.fill(nDocs)(Array.fill(tokPerDoc)(vocab(rnd.nextInt(vocab.length))))

    def oldForm(): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val sb = new java.lang.StringBuilder
      var acc = 0L
      var di = 0
      while (di < docs.length) {
        val t = docs(di)
        val mins = Array.fill(k)(Long.MaxValue)
        var i = 0
        while (i + n <= t.length) {
          sb.setLength(0)
          var o = 0
          while (o < n) {
            if (o > 0) sb.append(' ')
            sb.append(t(i + o))
            o += 1
          }
          md.reset()
          val dg = md.digest(sb.toString.getBytes("UTF-8"))
          val x = (((dg(0) & 0xffL) << 20) | ((dg(1) & 0xffL) << 12) |
            ((dg(2) & 0xffL) << 4) | ((dg(3) & 0xf0L) >> 4)) % p
          var j = 0
          while (j < k) {
            val c = (x * as(j) + bs(j)) % p
            if (c < mins(j)) mins(j) = c
            j += 1
          }
          i += 1
        }
        acc ^= mins(0)
        di += 1
      }
      acc
    }

    def newForm(): Long = {
      val md = new graft.functions.Md5.First8
      val bb = new graft.functions.Md5.ByteBuf
      var tokBytes = new Array[Array[Byte]](64)
      var acc = 0L
      var di = 0
      while (di < docs.length) {
        val t = docs(di)
        if (tokBytes.length < t.length)
          tokBytes = new Array[Array[Byte]](t.length)
        var e = 0
        while (e < t.length) { tokBytes(e) = t(e).getBytes("UTF-8"); e += 1 }
        val mins = Array.fill(k)(Long.MaxValue)
        var i = 0
        while (i + n <= t.length) {
          bb.reset()
          var o = 0
          while (o < n) {
            if (o > 0) bb.appendSpace()
            bb.append(tokBytes(i + o))
            o += 1
          }
          val x = (md.hash(bb.buf, bb.len) >>> 36) % p
          var j = 0
          while (j < k) {
            val c = (x * as(j) + bs(j)) % p
            if (c < mins(j)) mins(j) = c
            j += 1
          }
          i += 1
        }
        acc ^= mins(0)
        di += 1
      }
      acc
    }

    def hybridForm(): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new Array[Byte](16)
      val bb = new graft.functions.Md5.ByteBuf
      var tokBytes = new Array[Array[Byte]](64)
      var acc = 0L
      var di = 0
      while (di < docs.length) {
        val t = docs(di)
        if (tokBytes.length < t.length)
          tokBytes = new Array[Array[Byte]](t.length)
        var e = 0
        while (e < t.length) { tokBytes(e) = t(e).getBytes("UTF-8"); e += 1 }
        val mins = Array.fill(k)(Long.MaxValue)
        var i = 0
        while (i + n <= t.length) {
          bb.reset()
          var o = 0
          while (o < n) {
            if (o > 0) bb.appendSpace()
            bb.append(tokBytes(i + o))
            o += 1
          }
          md.reset()
          md.update(bb.buf, 0, bb.len)
          md.digest(out, 0, 16)
          val x = (((out(0) & 0xffL) << 20) | ((out(1) & 0xffL) << 12) |
            ((out(2) & 0xffL) << 4) | ((out(3) & 0xf0L) >> 4)) % p
          var j = 0
          while (j < k) {
            val c = (x * as(j) + bs(j)) % p
            if (c < mins(j)) mins(j) = c
            j += 1
          }
          i += 1
        }
        acc ^= mins(0)
        di += 1
      }
      acc
    }

    val shingles = nDocs.toLong * (tokPerDoc - n + 1)
    // interleaved, 4 rounds each, medians reported
    var oldAcc = 0L; var newAcc = 0L; var hyAcc = 0L
    val oldT = Array.fill(4)(0.0); val newT = Array.fill(4)(0.0)
    val hyT = Array.fill(4)(0.0)
    for (r <- 0 until 4) {
      var t0 = System.nanoTime(); oldAcc = oldForm()
      oldT(r) = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); newAcc = newForm()
      newT(r) = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); hyAcc = hybridForm()
      hyT(r) = (System.nanoTime() - t0) / 1e9
    }
    require(oldAcc == newAcc && oldAcc == hyAcc, "kernel outputs diverged")
    val om = oldT.sorted.apply(2); val nm = newT.sorted.apply(2)
    val hm = hyT.sorted.apply(2)
    println(f"shingles=$shingles old=${om}%.3f s (${om * 1e9 / shingles}%.0f ns/sh) " +
      f"new=${nm}%.3f s (${nm * 1e9 / shingles}%.0f ns/sh, ${om / nm}%.2fx) " +
      f"hybrid=${hm}%.3f s (${hm * 1e9 / shingles}%.0f ns/sh, ${om / hm}%.2fx)")
  }
}
