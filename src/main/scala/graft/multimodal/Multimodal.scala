package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, decoded batch-wise inside
  * `mapPartitions` (the Spark-idiomatic shape for feeding a native
  * decode library executor-side: one iterator per partition, no
  * per-row JNI setup, no driver collect).
  *
  * The decode itself is a STUB — image/audio codecs aren't in this
  * container — but it is a *deterministic* function of the bytes, so
  * the surrounding plumbing (schema, encoders, partition batching,
  * downstream aggregation) is real, tested, and oracle-checkable.
  */
object Multimodal {

  /** Opaque media payload + metadata (the 100 TB layout: payload in
    * its own parquet column chunk, metadata columns prunable without
    * touching the bytes).
    */
  case class MediaRow(doc_id: Long, source: String, payload: Array[Byte])

  /** Stub "decoded" features. A real decoder would return pixel dims,
    * channels, duration, …
    */
  case class Decoded(doc_id: Long, source: String, width: Int, height: Int)

  /** STUB decode: deterministic fake features from the byte length.
    * Replace the body with a real codec call; the iterator-in /
    * iterator-out shape is what a native decoder needs.
    */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[Decoded] =
    rows.map { r =>
      val len = r.payload.length
      Decoded(r.doc_id, r.source, len % 64, len / 64)
    }

  def decode(ds: Dataset[MediaRow]): Dataset[Decoded] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(decodeStub)
  }

  /** documents → binary payloads → stub decode → per-source stats. */
  def decodeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
    decode(media)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("width").cast("long").as("sum_width"),
        sum("height").cast("long").as("sum_height"))
      .orderBy("source")
  }
}
