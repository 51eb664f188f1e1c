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
  * (The 16-bit family's committed oracles dedup on token STRINGS, a
  * different — collision-double-counting — construction; they keep
  * the declarative form, and this spec's 16-bit case deliberately
  * exercises the hash-distinct form only.)
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

  test("16-bit STRING-dedup mode == declarative distinct-(doc,tok) chain") {
    // the q29/q60/q160/q189 construction: DISTINCT on the raw token
    // string, then the vote — hash-colliding distinct tokens vote
    // twice, unlike the hash-dedup mode
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("t", TextFns.tokens(col("text")))
    val want = docs
      .select(col("doc_id"), explode(col("t")).as("tok"))
      .distinct()
      .groupBy("doc_id")
      .agg(SimHash.simhashAgg(col("tok")).as("sh"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val got = SimHash
      .fingerprintsFromTokens(docs, "doc_id", "t", 1, dedupOnHash = false)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(want.nonEmpty && got === want)
  }

  test("dedup modes differ exactly on a 16-bit hash collision") {
    // find two distinct tokens colliding in the 16-bit md5 prefix
    // (deterministic: first birthday collision over t0, t1, ...)
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
    // a doc holding the colliding pair plus one spoiler token: in
    // string mode the pair votes twice (2 of 3 → majority on the
    // shared hash's bits), in hash mode once (1 of 2 → tie, no bit)
    val docs = Seq((1L, s"$ta $tb zzz")).toDF("doc_id", "text")
      .withColumn("t", TextFns.tokens(col("text")))
    val strMode = SimHash
      .fingerprintsFromTokens(docs, "doc_id", "t", 1, dedupOnHash = false)
      .as[(Long, Long)].collect().head._2
    val hashMode = SimHash
      .fingerprintsFromTokens(docs, "doc_id", "t", 1)
      .as[(Long, Long)].collect().head._2
    assert(strMode != hashMode,
      s"modes must diverge on the collision pair ($ta, $tb)")
    // and each mode matches ITS declarative twin
    val strWant = docs
      .select(col("doc_id"), explode(col("t")).as("tok")).distinct()
      .groupBy("doc_id").agg(SimHash.simhashAgg(col("tok")).as("sh"))
      .as[(Long, Long)].collect().head._2
    val hashWant = docs
      .select(col("doc_id"), explode(col("t")).as("tok"))
      .select(col("doc_id"), SimHash.tokenHash(col("tok")).as("h"))
      .distinct()
      .groupBy("doc_id").agg(SimHash.simhashAggFromHash(col("h")).as("sh"))
      .as[(Long, Long)].collect().head._2
    assert(strMode === strWant && hashMode === hashWant)
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
