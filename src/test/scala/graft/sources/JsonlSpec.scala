package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.TestSpark

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

class JsonlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private val lines = Seq(
    """{"doc_id": 1, "text": "alpha beta"}""",
    """not json at all""",
    """{"doc_id": 2, "text": "gamma"}""",
    """{"doc_id": "oops-not-a-number", "text": "delta"}""",
    """{"doc_id": 3, "text": "epsilon"}""")

  private def writePlain(): String = {
    val dir = graft.TestSpark.scratchPath("jsonl")
    Files.write(dir.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    dir.toString
  }

  test("clean/quarantine split: no line lost, none dropped silently") {
    val ch = Jsonl.read(spark, writePlain(), schema)
    val clean = ch.clean.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(clean == Set((1L, "alpha beta"), (2L, "gamma"), (3L, "epsilon")))
    val quarantined = ch.quarantine.collect().map(_.getString(0)).toSet
    assert(quarantined == Set(lines(1), lines(3)))
    assert(ch.clean.columns.toSeq == Seq("doc_id", "text"))
  }

  test("gzip members read transparently (the .jsonl.gz shard layout)") {
    val dir = graft.TestSpark.scratchPath("jsonlgz")
    val out = new GZIPOutputStream(
      Files.newOutputStream(dir.resolve("part-0.jsonl.gz")))
    out.write(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    out.close()
    val ch = Jsonl.read(spark, dir.toString, schema)
    assert(ch.clean.count() == 3)
    assert(ch.quarantine.count() == 2)
  }

  test("strict mode aborts on the first corrupt line") {
    intercept[org.apache.spark.SparkException] {
      Jsonl.readStrict(spark, writePlain(), schema).collect()
    }
  }
}
