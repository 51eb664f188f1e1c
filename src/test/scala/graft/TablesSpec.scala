package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Tables scan-probe memo contracts (ADVICE r21). */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("parallelizedLike's memoized probe matches a fresh plan probe") {
    // The memo serves a partition COUNT for the named table's scan;
    // the contract is that it equals what fresh physical planning
    // would report (ADVICE r21 asked for exactly this debug-mode
    // assertion), so the under-split decision is the one a per-call
    // probe would make.
    for (name <- Seq("documents", "embeddings")) {
      val fresh = Tables.load(spark, dir, name).rdd.getNumPartitions
      val target = spark.sparkContext.defaultParallelism
      val out = Tables.parallelizedLike(spark, dir, name)(
        Tables.load(spark, dir, name))
      val expected = if (fresh >= math.max(2, target / 2)) fresh else target
      assert(out.rdd.getNumPartitions === expected,
        s"$name: fresh probe $fresh, target $target")
    }
  }

  test("pathFingerprint separates bytes and files (no byte-for-file aliasing)") {
    val base = java.nio.file.Files.createTempDirectory("graft_fp").toFile
    try {
      val t = System.currentTimeMillis() - 10000
      // layout A: one 3-byte file. Under the former bytes+files single
      // Long this aliased layout B (two 1-byte files): 3+1 == 2+2.
      val a = new java.io.File(base, "part-a");
      java.nio.file.Files.write(a.toPath, Array[Byte](1, 2, 3))
      assert(a.setLastModified(t))
      val fpA = Tables.pathFingerprint(spark, base.toString)
      assert(a.delete())
      val b1 = new java.io.File(base, "part-b1")
      val b2 = new java.io.File(base, "part-b2")
      java.nio.file.Files.write(b1.toPath, Array[Byte](1))
      java.nio.file.Files.write(b2.toPath, Array[Byte](2))
      assert(b1.setLastModified(t) && b2.setLastModified(t))
      val fpB = Tables.pathFingerprint(spark, base.toString)
      assert(fpA !== fpB, s"byte-for-file rewrite must change the key: $fpA")
      assert(fpA._2 === 3L && fpA._3 === 1L, "layout A: 3 bytes, 1 file")
      assert(fpB._2 === 2L && fpB._3 === 2L, "layout B: 2 bytes, 2 files")
    } finally {
      base.listFiles().foreach(_.delete())
      base.delete(): Unit
    }
  }
}
