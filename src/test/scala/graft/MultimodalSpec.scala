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

  test("png/gif/bmp/jpeg headers round-trip dimensions exactly") {
    for ((w, h) <- samples(dims, 25)) {
      assert(Multimodal.parseHeader(Multimodal.pngHeader(w, h)) == ("png", w, h))
      assert(Multimodal.parseHeader(Multimodal.gifHeader(w, h)) == ("gif", w, h))
      assert(Multimodal.parseHeader(Multimodal.bmpHeader(w, h)) == ("bmp", w, h))
      assert(Multimodal.parseHeader(Multimodal.jpegHeader(w, h)) == ("jpeg", w, h))
    }
  }

  test("body bytes after the header do not perturb the parse") {
    val p = Multimodal.syntheticPayload(40L, "some text body éü")
    // doc_id 40 % 5 == 0 → png; dims from the generator formulas
    assert(Multimodal.parseHeader(p) ==
      ("png", Multimodal.widthOf(40L), Multimodal.heightOf(40L)))
    // doc_id 43 % 5 == 3 → jpeg; the walk stops at SOF0, so body
    // bytes (whatever they contain) never influence the dims
    val j = Multimodal.syntheticPayload(43L, "jpeg body text")
    assert(Multimodal.parseHeader(j) ==
      ("jpeg", Multimodal.widthOf(43L), Multimodal.heightOf(43L)))
  }

  test("jpeg marker walk: extra APP segments, truncation, scan-before-SOF") {
    val (w, h) = (640, 480)
    val full = Multimodal.jpegHeader(w, h)
    // splice an APPn comment segment between APP0 and SOF0 — the walk
    // must skip it by declared length and still find SOF0
    // length field covers itself: 2 + 8 payload bytes = 10
    val app1 = Array[Byte](0xff.toByte, 0xe1.toByte, 0, 10) ++ "exif-ish".getBytes
    val spliced = full.take(20) ++ app1 ++ full.drop(20)
    assert(Multimodal.parseHeader(spliced) == ("jpeg", w, h))
    // truncated before the SOF dims → unknown, not a crash
    for (cut <- Seq(2, 3, 10, 21, 25))
      assert(Multimodal.parseHeader(full.take(cut))._1 == "unknown", s"cut=$cut")
    // SOS (start-of-scan) before any SOF → unknown
    val sosFirst = full.take(20) ++
      Array[Byte](0xff.toByte, 0xda.toByte, 0, 2) ++ full.drop(20)
    assert(Multimodal.parseHeader(sosFirst)._1 == "unknown")
  }

  test("wav header round-trips duration from the declared byte rate") {
    val body = Array.fill[Byte](64000)(1) // 2 s at 32000 B/s
    val p = Multimodal.wavHeader(body.length) ++ body
    assert(Multimodal.parseHeader(p) == ("wav", 0, 0))
    assert(Multimodal.durationMsOf(p) == 2000L)
    // images report zero duration
    assert(Multimodal.durationMsOf(Multimodal.pngHeader(4, 4)) == 0L)
    // truncated RIFF prefix is unknown, not a crash
    assert(Multimodal.parseHeader(p.take(20))._1 == "unknown")
    // synthetic rotation puts doc_id % 5 == 4 on the wav path
    val w = Multimodal.syntheticPayload(44L, "abcd")
    assert(Multimodal.parseHeader(w)._1 == "wav")
    assert(Multimodal.durationMsOf(w) == 4L * 1000L / Multimodal.WavByteRate)
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

  test("AVI build→walk round-trips geometry, frame count, and sizes") {
    for (id <- Seq(0L, 1L, 7L, 47L, 48L, 12345L)) {
      val info = Multimodal.parseAvi(Multimodal.aviPayload(id)).get
      assert(info.width == Multimodal.widthOf(id))
      assert(info.height == Multimodal.heightOf(id))
      assert(info.microsPerFrame == Multimodal.AviMicrosPerFrame)
      // avih total frames agrees with the walked '00dc' chain
      assert(info.totalFrames == Multimodal.frameCountOf(id))
      assert(info.frames.size == info.totalFrames)
      info.frames.zipWithIndex.foreach { case ((_, size), f) =>
        assert(size == Multimodal.frameSizeOf(id, f), s"id=$id frame=$f")
      }
      // offsets strictly increase and land inside the payload
      val offs = info.frames.map(_._1)
      assert(offs == offs.sorted && offs.distinct == offs)
    }
  }

  test("odd-length frames are word-aligned: walker must skip pad bytes") {
    // frameSizeOf covers both parities across frames of one doc
    val id = 3L
    val sizes = (0 until Multimodal.frameCountOf(id))
      .map(Multimodal.frameSizeOf(id, _))
    assert(sizes.exists(_ % 2 == 1) && sizes.exists(_ % 2 == 0))
    val info = Multimodal.parseAvi(Multimodal.aviPayload(id)).get
    assert(info.frames.map(_._2) == sizes)
  }

  test("binary payloads round-trip through a parquet binary column into the decode path") {
    // The q32/q156 shape but with payloads READ FROM PARQUET, not
    // synthesized in-plan: media bytes land in a real `binary` column
    // (its own column chunk — metadata columns prune without touching
    // it), survive the write/read round-trip bit-exactly, and the
    // standard decode path runs on the scanned bytes.
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = graft.TestSpark.scratchDir("graft_media")
    val ids = (0L until 20L) // covers png/gif/bmp/jpeg/wav rotation
    val rows = ids.map { id =>
      Multimodal.MediaRow(id, s"src${id % 3}",
        Multimodal.syntheticPayload(id, s"payload body of doc $id"))
    } ++ Seq(Multimodal.MediaRow(100L, "vid", Multimodal.aviPayload(100L)))
    rows.toDS().write.mode("overwrite").parquet(dir)

    val back = spark.read.parquet(dir)
    // schema: the payload really is a binary column
    assert(back.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    // bytes survive bit-exactly
    val byId = back.as[Multimodal.MediaRow].collect().map(r => r.doc_id -> r).toMap
    rows.foreach { r =>
      assert(java.util.Arrays.equals(byId(r.doc_id).payload, r.payload),
        s"payload bytes changed in round-trip for doc ${r.doc_id}")
    }
    // the standard decode path over the SCANNED column
    val decoded = Multimodal.decode(back.as[Multimodal.MediaRow])
      .collect().map(d => d.doc_id -> d).toMap
    for (id <- ids) {
      val d = decoded(id)
      val expectFmt = (id % 5) match {
        case 0 => "png"; case 1 => "gif"; case 2 => "bmp"
        case 3 => "jpeg"; case _ => "wav"
      }
      assert(d.format == expectFmt, s"doc $id")
      if (expectFmt != "wav") {
        assert(d.width == Multimodal.widthOf(id) &&
          d.height == Multimodal.heightOf(id), s"doc $id dims")
      } else {
        val bodyLen = s"payload body of doc $id".getBytes("UTF-8").length
        assert(d.duration_ms == bodyLen.toLong * 1000L / Multimodal.WavByteRate)
      }
      assert(d.n_bytes == byId(id).payload.length.toLong)
    }
    // the AVI walker consumes the scanned bytes too
    val avi = Multimodal.parseAvi(byId(100L).payload).get
    assert(avi.width == Multimodal.widthOf(100L) &&
      avi.totalFrames == Multimodal.frameCountOf(100L))
  }

  test("malformed AVI returns None, never throws") {
    assert(Multimodal.parseAvi(Array[Byte]()).isEmpty)
    assert(Multimodal.parseAvi("RIFFxxxxWAVE".getBytes).isEmpty)
    val good = Multimodal.aviPayload(5L)
    for (cut <- Seq(4, 11, 20, 60)) {
      assert(Multimodal.parseAvi(good.take(cut)).isEmpty, s"cut=$cut")
    }
    // corrupt a chunk size field to overflow the payload
    val bad = good.clone()
    bad(16) = 0x7f
    assert(Multimodal.parseAvi(bad).isEmpty)
  }
}
