package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.multimodal.Multimodal

/** The header decode is real byte arithmetic: build→parse must be the
  * identity on dimensions for every format, and anything that is not
  * a recognized header must classify as unknown instead of throwing.
  */
class MultimodalSpec extends AnyFunSuite {

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(77L + i)))

  private val dims = for {
    w <- Gen.choose(1, 65535)
    h <- Gen.choose(1, 65535)
  } yield (w, h)

  test("png/gif/bmp headers round-trip dimensions exactly") {
    for ((w, h) <- samples(dims, 25)) {
      assert(Multimodal.parseHeader(Multimodal.pngHeader(w, h)) == ("png", w, h))
      assert(Multimodal.parseHeader(Multimodal.gifHeader(w, h)) == ("gif", w, h))
      assert(Multimodal.parseHeader(Multimodal.bmpHeader(w, h)) == ("bmp", w, h))
    }
  }

  test("body bytes after the header do not perturb the parse") {
    val p = Multimodal.syntheticPayload(42L, "some text body éü")
    // doc_id 42 % 3 == 0 → png; dims from the generator formulas
    assert(Multimodal.parseHeader(p) ==
      ("png", Multimodal.widthOf(42L), Multimodal.heightOf(42L)))
  }

  test("truncated and garbage payloads classify as unknown, never throw") {
    val png = Multimodal.pngHeader(10, 10)
    for (cut <- Seq(0, 1, 7, 12, 23)) {
      assert(Multimodal.parseHeader(png.take(cut))._1 == "unknown", s"cut=$cut")
    }
    assert(Multimodal.parseHeader(Array[Byte]()) == (("unknown", 0, 0)))
    assert(Multimodal.parseHeader("not an image".getBytes)._1 == "unknown")
    // valid PNG signature but wrong chunk type → unknown
    val badChunk = png.clone()
    badChunk(12) = 'X'
    assert(Multimodal.parseHeader(badChunk)._1 == "unknown")
  }

  test("GIF87a variant parses too") {
    val g = Multimodal.gifHeader(300, 200)
    g(4) = '7' // GIF89a → GIF87a
    assert(Multimodal.parseHeader(g) == ("gif", 300, 200))
  }
}
