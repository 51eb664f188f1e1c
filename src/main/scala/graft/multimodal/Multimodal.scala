package graft.multimodal

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, decoded batch-wise inside
  * `mapPartitions` (the Spark-idiomatic shape for feeding a native
  * decode library executor-side: one iterator per partition, no
  * per-row JNI setup, no driver collect).
  *
  * The header DECODE is real: [[parseHeader]] sniffs the magic bytes
  * and extracts pixel dimensions with each format's own layout —
  * PNG's big-endian IHDR, GIF's little-endian logical screen, BMP's
  * little-endian DIB — by pure byte arithmetic, no codec library.
  * Only the payloads are synthetic (no media files ship in the test
  * environment): [[syntheticPayload]] builds a byte-exact format
  * header followed by the document text as body, standing in for
  * bytes read off object storage. The oracle recomputes the same
  * dimensions and byte counts independently, so a wrong offset or
  * endianness in either build or parse fails the hash compare.
  */
object Multimodal {

  /** Opaque media payload + metadata (the 100 TB layout: payload in
    * its own parquet column chunk, metadata columns prunable without
    * touching the bytes).
    */
  case class MediaRow(doc_id: Long, source: String, payload: Array[Byte])

  /** Header-decoded features: sniffed container format, pixel
    * dimensions (images), audio duration (wav), and total payload
    * size.
    */
  case class Decoded(doc_id: Long, source: String, format: String,
      width: Int, height: Int, duration_ms: Long, n_bytes: Long)

  // ---- synthetic payload construction (ingest stand-in) ------------

  /** Deterministic media geometry per document. */
  def widthOf(docId: Long): Int = (1 + docId % 1920).toInt
  def heightOf(docId: Long): Int = (1 + (docId * 7) % 1080).toInt

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** 8-byte PNG signature + IHDR chunk (length, type, 13-byte data,
    * zeroed CRC) = 33 bytes; width/height big-endian at offsets 16/20.
    */
  def pngHeader(w: Int, h: Int): Array[Byte] =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n') ++
      be32(13) ++ "IHDR".getBytes(StandardCharsets.US_ASCII) ++
      be32(w) ++ be32(h) ++
      Array[Byte](8, 6, 0, 0, 0) ++ be32(0)

  /** GIF89a signature + logical-screen descriptor = 13 bytes;
    * width/height little-endian u16 at offsets 6/8.
    */
  def gifHeader(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes(StandardCharsets.US_ASCII) ++
      le16(w) ++ le16(h) ++ Array[Byte](0, 0, 0)

  /** BM file header + BITMAPINFOHEADER prefix = 26 bytes here
    * (enough through the dimension fields); width/height
    * little-endian i32 at offsets 18/22.
    */
  def bmpHeader(w: Int, h: Int): Array[Byte] =
    "BM".getBytes(StandardCharsets.US_ASCII) ++
      le32(0) ++ le32(0) ++ le32(54) ++ le32(40) ++ le32(w) ++ le32(h)

  /** SOI + APP0/JFIF (18 bytes) + SOF0 (19 bytes) = 39 bytes; height
    * THEN width, big-endian u16, inside the SOF0 segment — unlike the
    * other containers the dimensions sit at no fixed offset, so the
    * parser must walk the marker/length chain to find them.
    */
  def jpegHeader(w: Int, h: Int): Array[Byte] =
    Array[Byte](0xff.toByte, 0xd8.toByte) ++                       // SOI
      Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++         // APP0
      "JFIF".getBytes(StandardCharsets.US_ASCII) ++ Array[Byte](0) ++
      Array[Byte](1, 1, 0) ++ be16(1) ++ be16(1) ++ Array[Byte](0, 0) ++
      Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++         // SOF0
      Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array[Byte](3) ++
      Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)

  /** WAV audio parameters: 16 kHz mono 16-bit PCM → 32000 bytes/sec. */
  val WavSampleRate = 16000
  val WavByteRate: Int = WavSampleRate * 2

  /** Canonical 44-byte RIFF/WAVE PCM header: RIFF size, fmt chunk
    * (audio format 1, mono, 16-bit), data chunk length — all
    * little-endian.
    */
  def wavHeader(dataLen: Int): Array[Byte] =
    "RIFF".getBytes(StandardCharsets.US_ASCII) ++ le32(36 + dataLen) ++
      "WAVE".getBytes(StandardCharsets.US_ASCII) ++
      "fmt ".getBytes(StandardCharsets.US_ASCII) ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(WavSampleRate) ++ le32(WavByteRate) ++
      le16(2) ++ le16(16) ++
      "data".getBytes(StandardCharsets.US_ASCII) ++ le32(dataLen)

  /** Format rotates by doc_id; body is the text bytes (stand-in for
    * compressed pixel/sample data — the decoder must skip it by
    * header knowledge, not by trailing-byte inspection).
    */
  def syntheticPayload(docId: Long, text: String): Array[Byte] = {
    val body = text.getBytes(StandardCharsets.UTF_8)
    val w = widthOf(docId)
    val h = heightOf(docId)
    (docId % 5) match {
      case 0 => pngHeader(w, h) ++ body
      case 1 => gifHeader(w, h) ++ body
      case 2 => bmpHeader(w, h) ++ body
      case 3 => jpegHeader(w, h) ++ body
      case _ => wavHeader(body.length) ++ body
    }
  }

  // ---- video: RIFF/AVI container ------------------------------------

  /** Deterministic video geometry per document. */
  def frameCountOf(docId: Long): Int = (1 + docId % 48).toInt
  def frameSizeOf(docId: Long, frame: Int): Int =
    64 + ((docId + frame) % 32).toInt
  val AviMicrosPerFrame = 33333 // ~30 fps

  /** Minimal spec-shaped AVI: RIFF('AVI ') → LIST('hdrl') holding the
    * 56-byte 'avih' main header (µs/frame at +0, total frames at +16,
    * width/height at +32/+36, all little-endian per the published
    * layout) → LIST('movi') holding one '00dc' compressed-video chunk
    * per frame (word-aligned: odd-length chunks take a pad byte, which
    * a correct walker must skip). Frame bodies are a deterministic
    * byte pattern — the container arithmetic is the thing under test.
    */
  def aviPayload(docId: Long): Array[Byte] = {
    val w = widthOf(docId)
    val h = heightOf(docId)
    val n = frameCountOf(docId)
    val avih = le32(AviMicrosPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(n) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = "hdrl".getBytes(StandardCharsets.US_ASCII) ++
      "avih".getBytes(StandardCharsets.US_ASCII) ++ le32(avih.length) ++ avih
    val frames = (0 until n).toArray.flatMap { f =>
      val len = frameSizeOf(docId, f)
      val body = Array.tabulate[Byte](len)(i => ((docId + f + i) % 251).toByte)
      val pad = if (len % 2 == 1) Array[Byte](0) else Array.emptyByteArray
      "00dc".getBytes(StandardCharsets.US_ASCII) ++ le32(len) ++ body ++ pad
    }
    val movi = "movi".getBytes(StandardCharsets.US_ASCII) ++ frames
    val lists =
      "LIST".getBytes(StandardCharsets.US_ASCII) ++ le32(hdrl.length) ++ hdrl ++
        "LIST".getBytes(StandardCharsets.US_ASCII) ++ le32(movi.length) ++ movi
    "RIFF".getBytes(StandardCharsets.US_ASCII) ++ le32(4 + lists.length) ++
      "AVI ".getBytes(StandardCharsets.US_ASCII) ++ lists
  }

  /** Parsed AVI main-header fields + the walked frame index. */
  case class AviInfo(width: Int, height: Int, totalFrames: Int,
      microsPerFrame: Int, frames: Seq[(Int, Int)]) // (offset, size)

  /** Walk the RIFF chunk chain: read avih fields at their documented
    * offsets, then the '00dc' frame chunks inside LIST('movi') with
    * word alignment. Malformed containers return None — the corrupt-
    * object-must-not-kill-the-stage policy of every decoder here.
    */
  def parseAvi(p: Array[Byte]): Option[AviInfo] = {
    def fourcc(i: Int): String =
      new String(p.slice(i, i + 4), StandardCharsets.US_ASCII)
    if (p.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    var w, h, total, upf = -1
    val frames = Seq.newBuilder[(Int, Int)]
    var i = 12
    while (i + 8 <= p.length) {
      val id = fourcc(i)
      val size = leI32(p, i + 4)
      if (size < 0 || i + 8 + size > p.length) return None
      if (id == "LIST" && size >= 4) {
        val listType = fourcc(i + 8)
        if (listType == "hdrl") {
          // avih must lead the list: 'avih' + len + 56-byte struct
          val a = i + 12
          if (a + 8 + 56 > p.length || fourcc(a) != "avih") return None
          upf = leI32(p, a + 8)
          total = leI32(p, a + 8 + 16)
          w = leI32(p, a + 8 + 32)
          h = leI32(p, a + 8 + 36)
        } else if (listType == "movi") {
          var j = i + 12
          val end = i + 8 + size
          while (j + 8 <= end) {
            val cid = fourcc(j)
            val clen = leI32(p, j + 4)
            if (clen < 0 || j + 8 + clen > end) return None
            if (cid == "00dc") frames += ((j + 8, clen))
            j += 8 + clen + (clen % 2) // word alignment
          }
        }
      }
      i += 8 + size + (size % 2)
    }
    if (w < 0) None else Some(AviInfo(w, h, total, upf, frames.result()))
  }

  // ---- real header decode ------------------------------------------

  private def u8(p: Array[Byte], i: Int): Int = p(i) & 0xff
  private def beI32(p: Array[Byte], i: Int): Int =
    (u8(p, i) << 24) | (u8(p, i + 1) << 16) | (u8(p, i + 2) << 8) | u8(p, i + 3)
  private def leI32(p: Array[Byte], i: Int): Int =
    u8(p, i) | (u8(p, i + 1) << 8) | (u8(p, i + 2) << 16) | (u8(p, i + 3) << 24)
  private def leU16(p: Array[Byte], i: Int): Int =
    u8(p, i) | (u8(p, i + 1) << 8)
  private def beU16(p: Array[Byte], i: Int): Int =
    (u8(p, i) << 8) | u8(p, i + 1)

  private val PngMagic =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def startsWith(p: Array[Byte], magic: Array[Byte]): Boolean =
    p.length >= magic.length && {
      var i = 0
      while (i < magic.length && p(i) == magic(i)) i += 1
      i == magic.length
    }

  /** Sniff the container from its magic bytes and extract pixel
    * dimensions at the format's documented offsets/endianness.
    * Unknown or truncated payloads classify as ("unknown", 0, 0)
    * rather than throwing — at 100 TB a corrupt object must not kill
    * the stage.
    */
  def parseHeader(p: Array[Byte]): (String, Int, Int) =
    if (startsWith(p, PngMagic) && p.length >= 24 &&
        p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')
      ("png", beI32(p, 16), beI32(p, 20))
    else if (p.length >= 10 &&
        (startsWith(p, "GIF89a".getBytes(StandardCharsets.US_ASCII)) ||
         startsWith(p, "GIF87a".getBytes(StandardCharsets.US_ASCII))))
      ("gif", leU16(p, 6), leU16(p, 8))
    else if (p.length >= 26 && p(0) == 'B' && p(1) == 'M')
      ("bmp", leI32(p, 18), leI32(p, 22))
    else if (p.length >= 4 && u8(p, 0) == 0xff && u8(p, 1) == 0xd8 &&
        u8(p, 2) == 0xff)
      jpegDims(p)
    else if (isWav(p)) ("wav", 0, 0)
    else ("unknown", 0, 0)

  /** Walk the JPEG marker/length chain from SOI to the first SOF
    * frame header (C0/C1/C2: baseline, extended, progressive) and
    * read height then width (big-endian) from it. Truncated or
    * malformed chains fall back to ("unknown", 0, 0) — same corrupt-
    * object policy as every other branch.
    */
  private def jpegDims(p: Array[Byte]): (String, Int, Int) = {
    var i = 2
    while (i + 4 <= p.length && u8(p, i) == 0xff) {
      val marker = u8(p, i + 1)
      if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
        // segment: len(2) precision(1) height(2) width(2) ...
        return if (i + 9 <= p.length)
          ("jpeg", beU16(p, i + 7), beU16(p, i + 5))
        else ("unknown", 0, 0)
      } else if (marker == 0xd8 || marker == 0x01 ||
          (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2 // standalone marker, no length field
      } else if (marker == 0xda || marker == 0xd9) {
        return ("unknown", 0, 0) // scan data / EOI before any SOF
      } else {
        val segLen = beU16(p, i + 2)
        if (segLen < 2) return ("unknown", 0, 0)
        i += 2 + segLen
      }
    }
    ("unknown", 0, 0)
  }

  private def isWav(p: Array[Byte]): Boolean =
    p.length >= 44 &&
      startsWith(p, "RIFF".getBytes(StandardCharsets.US_ASCII)) &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** Audio duration from the RIFF header: data-chunk bytes over the
    * declared byte rate (ms, truncating). 0 for non-wav payloads.
    */
  def durationMsOf(p: Array[Byte]): Long =
    if (!isWav(p)) 0L
    else {
      val byteRate = leI32(p, 28)
      val dataLen = leI32(p, 40)
      if (byteRate <= 0) 0L else dataLen.toLong * 1000L / byteRate
    }

  /** Batch decode: iterator-in / iterator-out per partition — the
    * shape a native codec binding needs (shared per-partition setup,
    * streaming rows, no driver involvement).
    */
  def decodeBatch(rows: Iterator[MediaRow]): Iterator[Decoded] =
    rows.map { r =>
      val (fmt, w, h) = parseHeader(r.payload)
      Decoded(r.doc_id, r.source, fmt, w, h,
        durationMsOf(r.payload), r.payload.length.toLong)
    }

  def decode(ds: Dataset[MediaRow]): Dataset[Decoded] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(decodeBatch)
  }

  /** documents → synthetic media payloads → REAL header decode →
    * per-(source, format) stats. The oracle recomputes dimensions
    * from the generator formulas and payload size from text length +
    * per-format header size, so any byte-layout error in build or
    * parse breaks the hash match.
    */
  def decodeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .map { case (id, src, text) =>
        MediaRow(id, src, syntheticPayload(id, text))
      }
    decode(media)
      .groupBy("source", "format")
      .agg(
        count(lit(1)).as("n_media"),
        sum("width").cast("long").as("sum_width"),
        sum("height").cast("long").as("sum_height"),
        sum("duration_ms").cast("long").as("sum_duration_ms"),
        sum("n_bytes").cast("long").as("sum_bytes"))
      .orderBy("source", "format")
  }
}
