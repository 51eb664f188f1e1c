package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins [[SimHashFamily.fingerprintsFromTokens]] bit-equal to the
  * declarative hash-distinct chain it replaces on the q191 / decade-
  * audit path: explode shingles → tokenHash → DISTINCT (doc, hash) →
  * simhashAggFromHash. Both constructions dedup on the `bits`-bit
  * md5-prefix hash itself, so they agree exactly — including on the
  * ~2^-bits prefix-collision collapse, which both apply identically.
  * Round 19 retired the string-dedup compatibility mode (VERDICT r18
  * #3): every family now dedups on the hash, and the oracles dedup on
  * its HEX-PREFIX form — the bijection test below is what makes that
  * oracle replay exact even on a real collision.
  */
class SimHashOnePassSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def declarative(fam: SimHashFamily,
      docs: org.apache.spark.sql.DataFrame, n: Int) =
    docs
      .select(col("doc_id"),
        explode(TextFns.wordShinglesFromTokens(col("t"), n)).as("sg"))
      .select(col("doc_id"), fam.tokenHash(col("sg")).as("h"))
      .distinct()
      .groupBy("doc_id")
      .agg(fam.simhashAggFromHash(col("h")).as("sh"))

  private def assertParity(fam: SimHashFamily,
      docs: org.apache.spark.sql.DataFrame, n: Int): Unit = {
    val want = declarative(fam, docs, n)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val got = fam.fingerprintsFromTokens(docs, "doc_id", "t", n)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(want.nonEmpty, "fixture produced no fingerprints — vacuous")
    assert(got === want)
  }

  test("64-bit trigram fingerprints: one-pass == declarative on sf0.001") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("t", TextFns.tokens(col("text")))
    assertParity(SimHash64, docs, 3)
  }

  test("16-bit unigram fingerprints: one-pass == declarative hash-distinct") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("t", TextFns.tokens(col("text")))
    assertParity(SimHash, docs, 1)
  }

  test("edge docs: short, empty, null, duplicate-shingle, tie votes") {
    val docs = Seq(
      (1L, "a b c d e"),            // normal
      (2L, "a b"),                  // shorter than the shingle width
      (3L, ""),                     // tokenizes to one empty token
      (4L, "x y z x y z x y z"),    // every shingle duplicated
      (5L, "a b c a b c")           // exactly-half vote ties
    ).toDF("doc_id", "text")
      .withColumn("t", TextFns.tokens(col("text")))
      // null token array: the one-pass path must skip it like the
      // declarative explode does
      .withColumn("t", when(col("doc_id") === 3L,
        lit(null).cast("array<string>")).otherwise(col("t")))
    val want = declarative(SimHash64, docs, 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val got = SimHash64.fingerprintsFromTokens(docs, "doc_id", "t", 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === want)
    // docs 2 and 3 produce no shingles on either path
    assert(!got.exists(r => r._1 == 2L || r._1 == 3L))
  }

  test("hex-prefix dedup is a bijection of hash dedup, pinned on a real collision") {
    // the oracle-migration contract (round 19): the SQL oracles dedup
    // per doc on `substr(md5(tok), 1, 4)` — a STRING — while the
    // engine dedups on the 16-bit hash LONG. hex prefix ↔ hash long
    // is a bijection, so the two selections are the same set. This
    // test pins that where it could actually break: a document
    // holding two DISTINCT tokens whose md5 prefixes collide.
    // Deterministic collision: first birthday collision over t0, t1...
    val md = java.security.MessageDigest.getInstance("MD5")
    def h16(s: String): Int = {
      md.reset()
      val d = md.digest(s.getBytes("UTF-8"))
      ((d(0) & 0xff) << 8) | (d(1) & 0xff)
    }
    val seen = scala.collection.mutable.Map[Int, String]()
    val (ta, tb) = Iterator.from(0).map(i => s"t$i")
      .flatMap(t => seen.put(h16(t), t).map(prev => (prev, t)))
      .next()
    assert(ta != tb && h16(ta) == h16(tb))
    // the colliding pair plus one spoiler token: under hash dedup the
    // pair collapses to ONE vote (1 of 2 → tie, bit unset) — the
    // double-counting string-dedup answer would differ, so the
    // equalities below are non-vacuous
    val docs = Seq((1L, s"$ta $tb zzz")).toDF("doc_id", "text")
      .withColumn("t", TextFns.tokens(col("text")))
    val onePass = SimHash
      .fingerprintsFromTokens(docs, "doc_id", "t", 1)
      .as[(Long, Long)].collect().head._2
    // declarative twin 1: DISTINCT on the hash LONG (the engine form)
    val hashWant = docs
      .select(col("doc_id"), explode(col("t")).as("tok"))
      .select(col("doc_id"), SimHash.tokenHash(col("tok")).as("h"))
      .distinct()
      .groupBy("doc_id").agg(SimHash.simhashAggFromHash(col("h")).as("sh"))
      .as[(Long, Long)].collect().head._2
    // declarative twin 2: DISTINCT on the 4-hex-char PREFIX STRING
    // (the oracle form) — the bijection under test
    val hexWant = docs
      .select(col("doc_id"), explode(col("t")).as("tok"))
      .select(col("doc_id"), substring(md5(col("tok")), 1, 4).as("hx"))
      .distinct()
      .select(col("doc_id"),
        conv(col("hx"), 16, 10).cast("long").as("h"))
      .groupBy("doc_id").agg(SimHash.simhashAggFromHash(col("h")).as("sh"))
      .as[(Long, Long)].collect().head._2
    assert(onePass === hashWant,
      "one-pass must match the declarative hash-distinct chain")
    assert(onePass === hexWant,
      s"hex-prefix dedup diverged from hash dedup on collision ($ta, $tb)" +
        " — the oracle replay would be wrong")
    // the collision really collapsed: the distinct-token count is 3,
    // the distinct-hash count 2
    val nHashes = docs
      .select(explode(col("t")).as("tok"))
      .select(SimHash.tokenHash(col("tok")).as("h")).distinct().count()
    assert(nHashes === 2L, "fixture must contain a real 16-bit collision")
  }

  test("string ids round-trip through the one-pass encoder") {
    val docs = Seq(("alpha", "a b c d"), ("beta", "b c d e"))
      .toDF("doc_id", "text")
      .withColumn("t", TextFns.tokens(col("text")))
    val got = SimHash64.fingerprintsFromTokens(docs, "doc_id", "t", 3)
    assert(got.schema("doc_id").dataType ===
      org.apache.spark.sql.types.StringType)
    val want = declarative(SimHash64, docs, 3)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(got.as[(String, Long)].collect().sortBy(_._1).toSeq === want)
  }
}
