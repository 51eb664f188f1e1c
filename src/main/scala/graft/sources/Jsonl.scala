package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL corpus reader with a corrupt-record quarantine channel — the
  * ingest format of web-scale text pipelines (one JSON document per
  * line, typically gzip-shared; Spark's line-based json reader splits
  * uncompressed files by byte range and assigns whole gzip members
  * per task, so the 100 TB layout is many ~100 MB–1 GB .jsonl.gz
  * shards).
  *
  * Bad lines are never dropped silently and never abort the scan:
  * PERMISSIVE mode routes them to `_corrupt_record`, and `read` splits
  * the scan into (clean rows, quarantined raw lines) so a pipeline can
  * land the quarantine channel next to the clean output for audit —
  * the same never-lose-input contract as the reference's warn-and-skip
  * loaders (e.g. syntenybrowserv2-etl's per-line validation warnings),
  * expressed as a second DataFrame instead of log lines.
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  final case class Channels(clean: DataFrame, quarantine: DataFrame,
      private val shared: DataFrame) {
    /** Release the shared scan cache once both channels are consumed. */
    def unpersist(): Unit = { shared.unpersist(); () }
  }

  /** Read `path` with `schema`, splitting clean rows from corrupt
    * lines.
    *
    * The frame is cached before the split: Spark refuses a query that
    * references ONLY the corrupt-record column of a json scan (the
    * parser would have nothing to fail on), and without a shared
    * materialization the two channels would re-parse the input twice.
    * Caller unpersists via the returned handle when both channels are
    * consumed.
    */
  def read(spark: SparkSession, path: String, schema: StructType): Channels = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val raw = spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .cache()
    val clean = raw.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val quarantine = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    Channels(clean, quarantine, raw)
  }

  /** Strict variant: abort the job on the first corrupt line (the
    * reference's abort-on-malformed posture, e.g. required-field
    * validation). FAILFAST is enforced by the json parser itself —
    * no second pass.
    */
  def readStrict(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .json(path)
}
