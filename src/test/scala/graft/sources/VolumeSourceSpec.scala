package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Volume proof for the DSv2 line-file sources (VERDICT r11 #7): on a
  * genuinely multi-GB uncompressed file with DEFAULT split sizing
  * (spark.sql.files.maxPartitionBytes = 128 MiB), byte-range split
  * parallelism must actually engage — task count ≈ ceil(size/128 MiB)
  * per file, not 1 — and the split reads must reproduce the unsplit
  * row multiset exactly (each line/stanza owned by exactly one split).
  *
  * Opt-in via GRAFT_PERF (writes ~2.5 GiB of scratch to tmpfs and
  * parses it on local[32]; no place in the regular suite):
  *
  *   GRAFT_PERF=1 sbt "testOnly graft.sources.VolumeSourceSpec"
  *
  * Measured on the 128 GiB bench box (committed as the bench note the
  * verdict asked for): 1.5 GiB GFF3 → 12 splits, 0.7 GiB VCF → 6
  * splits, 0.3 GiB OBO → 3 splits; all row/stanza multisets equal the
  * single-split read.
  */
class VolumeSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def scratch(name: String): java.nio.file.Path = {
    val base = Seq("/dev/shm", sys.props("java.io.tmpdir"))
      .find(p => new java.io.File(p).canWrite).get
    Files.createTempDirectory(Paths.get(base), "graft_volume").resolve(name)
  }

  /** Stream-repeat a fixture body to ~`targetBytes` without holding it
    * in memory; returns (path, repetitions).
    */
  private def repeatFixture(fixture: String, name: String,
      targetBytes: Long): (String, Long) = {
    val body = Files.readAllBytes(Paths.get(graft.TestSpark.fixture(fixture)))
    val reps = math.max(1L, targetBytes / (body.length + 1))
    val out = scratch(name)
    val ch = Files.newOutputStream(out, StandardOpenOption.CREATE)
    try {
      var i = 0L
      while (i < reps) { ch.write(body); ch.write('\n'); i += 1 }
    } finally ch.close()
    (out.toString, reps)
  }

  private def defaultSplit: Long =
    spark.sessionState.conf.filesMaxPartitionBytes

  test("multi-GB GFF3: default-split fan-out with exact multiset parity") {
    assume(sys.env.contains("GRAFT_PERF"), "set GRAFT_PERF=1 to run")
    val (path, reps) = repeatFixture("genes_human.gff3", "big.gff3", 1500L << 20)
    val size = Files.size(Paths.get(path))
    val expectedParts = ((size + defaultSplit - 1) / defaultSplit).toInt

    val split = spark.read.format("gff3").load(path)
    val parts = split.rdd.getNumPartitions
    info(s"gff3: $size bytes planned $parts partitions " +
      s"(default split $defaultSplit)")
    assert(parts === expectedParts && parts > 1,
      s"expected $expectedParts default-size splits, planned $parts")

    val base = spark.read.format("gff3")
      .load(graft.TestSpark.fixture("genes_human.gff3")).count()
    assert(split.count() === base * reps,
      "split read lost or duplicated lines at split boundaries")
    // row multiset parity against a deliberately unsplit read
    val whole = spark.read.format("gff3")
      .option("maxSplitBytes", Long.MaxValue.toString).load(path)
    assert(whole.rdd.getNumPartitions === 1)
    val key = concat_ws("|", col("seqid"), col("start"), col("attributes"))
    val a = split.groupBy(key.as("k")).count()
    val b = whole.groupBy(key.as("k")).count()
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    Files.delete(Paths.get(path))
  }

  test("multi-hundred-MB VCF: default-split fan-out with exact multiset parity") {
    assume(sys.env.contains("GRAFT_PERF"), "set GRAFT_PERF=1 to run")
    val (path, reps) = repeatFixture("variants_human.vcf", "big.vcf", 700L << 20)
    val size = Files.size(Paths.get(path))
    val expectedParts = ((size + defaultSplit - 1) / defaultSplit).toInt
    val split = spark.read.format("vcf").load(path)
    val parts = split.rdd.getNumPartitions
    info(s"vcf: $size bytes planned $parts partitions")
    assert(parts === expectedParts && parts > 1)
    val base = spark.read.format("vcf")
      .load(graft.TestSpark.fixture("variants_human.vcf")).count()
    assert(split.count() === base * reps)
    val whole = spark.read.format("vcf")
      .option("maxSplitBytes", Long.MaxValue.toString).load(path)
    val key = concat_ws("|", col("chrom"), col("pos"), col("id"), col("alt"))
    val a = split.groupBy(key.as("k")).count()
    val b = whole.groupBy(key.as("k")).count()
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    Files.delete(Paths.get(path))
  }

  test("multi-split OBO at default sizing: stanza ownership holds on a real multi-split file") {
    assume(sys.env.contains("GRAFT_PERF"), "set GRAFT_PERF=1 to run")
    // ~300 MiB synthetic ontology, streamed to tmpfs: stanzas in the
    // OboSplitSpec shape (obsolete sprinkle, interleaved [Typedef]
    // stanzas that must stop processing without flushing)
    val out = scratch("big.obo")
    val w = Files.newBufferedWriter(out)
    var n = 0L
    try {
      w.write("format-version: 1.2\n\n")
      while (Files.size(out) < (300L << 20)) {
        // size check per 10k stanzas to avoid a syscall per stanza
        var i = 0
        while (i < 10000) {
          w.write(s"[Term]\nid: GO:${"%07d".format(n)}\nname: term $n\n")
          w.write(s"namespace: ${if (n % 3 == 0) "bp" else "mf"}\n")
          if (n % 7 == 0) w.write(s"is_a: GO:${"%07d".format(n / 2)} ! parent\n")
          if (n % 13 == 0) w.write("is_obsolete: true\n")
          w.write("\n")
          if (n % 17 == 0) w.write("[Typedef]\nid: part_of\nname: part of\n\n")
          n += 1; i += 1
        }
        w.flush()
      }
    } finally w.close()
    val size = Files.size(out)
    val expectedParts = ((size + defaultSplit - 1) / defaultSplit).toInt

    val split = Obo.read(spark, out.toString)
    val parts = split.rdd.getNumPartitions
    info(s"obo: $size bytes ($n stanzas) planned $parts partitions")
    assert(parts === expectedParts && parts > 1)
    val whole = Obo.read(spark, out.toString,
      maxSplitBytes = Some(Long.MaxValue))
    assert(whole.rdd.getNumPartitions === 1)
    // full-row multiset parity: every stanza owned by exactly one split
    assert(split.toDF().exceptAll(whole.toDF()).isEmpty
      && whole.toDF().exceptAll(split.toDF()).isEmpty)
    assert(split.count() === whole.count())
    Files.delete(out)
  }
}
