package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.{LshGuard, MinHashLsh, TextFns}

/** Streaming near-duplicate ingestion against a standing LSH index —
  * the production LLM-ingest shape, composing the two halves the
  * batch registry pins separately: q161's delta-vs-index band probe
  * and CorpusIngest's idempotent exactly-once landing.
  *
  * The STANDING INDEX is a parquet table of banded MinHash signatures
  * (band, key, s0..s{k-1}, id) — built once from the existing corpus
  * by [[writeIndex]], probed by every micro-batch, and APPENDED with
  * each batch's landed documents so later batches dedup against
  * earlier deltas, not just the original corpus. State is therefore
  * store-bounded, not state-store-bounded: the index IS the streaming
  * state, held in a table the way a 100 TB deployment would hold it
  * (Spark's per-key state stores cannot hold a corpus-wide signature
  * index, and a band probe is an equi-join, not a keyed lookup).
  *
  * Per micro-batch ([[ingestBatch]]):
  *  1. one zero-shuffle signature pass over the batch
  *     (`signaturesFromTokens` — the batch is the small side);
  *  2. band-key equi-join against the index, with the index side
  *     routed through [[LshGuard.capBuckets]]: a degenerate index
  *     bucket multiplies EVERY colliding probe row by its occupancy,
  *     so buckets beyond `maxBucket` keep bounded representatives
  *     (overflow metered on the `graft.lsh.indexRowsCapped`
  *     accumulator — the guard's cost visibility contract);
  *  3. docs whose best match reaches `threshold` are dropped; the
  *     rest land exactly-once via [[CorpusIngest.ingestBatch]]
  *     (partition-directory idempotence, so a checkpoint-replayed
  *     batch neither double-lands docs nor double-appends the index);
  *  4. landed docs' band keys append to the index table.
  *
  * SEMANTICS (duplicate-blind within one micro-batch): a batch's
  * documents probe the index as it stood BEFORE the batch; two
  * near-duplicate documents arriving in the same micro-batch both
  * land (and index), exactly as two docs racing into any
  * last-writer-wins store. Identical *ids* within a batch are still
  * collapsed by CorpusIngest's in-batch id dedup. This makes the
  * stream's result a pure function of (index₀, batch partition,
  * batch order) — the batch-replay parity the q188 oracle replays as
  * chained CTEs.
  */
object NearDupIngest {

  /** Batch id of the initial (pre-stream) corpus index partition. */
  val InitialIndexBatch = -1L

  /** Build the standing index table from a corpus frame with
    * (`idCol`, `tokensCol`) columns: banded signatures, written once.
    * Partitioned by `batch_id` (the initial corpus under
    * [[InitialIndexBatch]]) so per-batch appends are independently
    * idempotent and a replaying batch can exclude its own partial
    * partition from the probe.
    */
  def writeIndex(corpus: DataFrame, indexDir: String, idCol: String = "doc_id",
      tokensCol: String = "t", shingleWidth: Int = 3, k: Int = 12,
      bands: Int = 4): Unit =
    writeIndexFrom(MinHashLsh.signaturesFromTokens(
      corpus, idCol, tokensCol, shingleWidth, k), indexDir, idCol, k, bands)

  /** The one on-disk index layout, shared by the fixed-geometry and
    * calibrated builds so they can never diverge in shape.
    */
  private def writeIndexFrom(sigs: DataFrame, indexDir: String,
      idCol: String, k: Int, bands: Int): Unit =
    MinHashLsh.bandKeys(sigs, idCol, k, bands)
      .withColumn("batch_id", lit(InitialIndexBatch))
      .write.mode("overwrite").partitionBy("batch_id").parquet(indexDir)

  /** Sidecar recording the geometry an index was built with, so every
    * future probe uses the same (k, bands, shingleWidth) — a probe at
    * a different geometry than the index silently matches nothing.
    */
  val ConfigFile = "_graft_lsh_config.json"

  /** [[writeIndex]] with the band count CALIBRATED from the corpus
    * itself ([[MinHashLsh.calibrateBands]] — most bands within
    * `pairsPerDocBudget`, the q185/q186 rule) instead of assumed, and
    * the selected geometry persisted in the [[ConfigFile]] sidecar
    * for [[startCalibrated]] to probe with. One signature pass feeds
    * both the sweep and the index write.
    *
    * @return the selected band count
    */
  def writeIndexCalibrated(corpus: DataFrame, indexDir: String,
      idCol: String = "doc_id", tokensCol: String = "t",
      shingleWidth: Int = 3, k: Int = 12,
      bandGrid: Seq[Int] = Seq(2, 3, 4, 6),
      pairsPerDocBudget: Long = 20L): Int = {
    val sigs = MinHashLsh.signaturesFromTokens(
      corpus, idCol, tokensCol, shingleWidth, k).persist()
    try {
      val bands =
        MinHashLsh.calibrateBands(sigs, idCol, k, bandGrid, pairsPerDocBudget)
      writeIndexFrom(sigs, indexDir, idCol, k, bands)
      writeConfig(corpus.sparkSession, indexDir, k, bands, shingleWidth)
      bands
    } finally sigs.unpersist(blocking = false)
  }

  /** The geometry an index was built with, from its sidecar. */
  def indexConfig(spark: SparkSession, indexDir: String)
      : Option[(Int, Int, Int)] = {
    val p = new org.apache.hadoop.fs.Path(indexDir, ConfigFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      def field(name: String): Int =
        s""""$name"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(s)
          .map(_.group(1).toInt)
          .getOrElse(sys.error(s"$ConfigFile missing field '$name': $s"))
      Some((field("k"), field("bands"), field("shingleWidth")))
    }
  }

  private def writeConfig(spark: SparkSession, indexDir: String,
      k: Int, bands: Int, shingleWidth: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexDir, ConfigFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(
      s"""{"k": $k, "bands": $bands, "shingleWidth": $shingleWidth}"""
        .getBytes("UTF-8"))
    finally out.close()
  }

  /** [[start]] probing with the geometry recorded in the index's
    * [[ConfigFile]] sidecar (written by [[writeIndexCalibrated]]) —
    * the full calibrate-at-build, probe-consistently-forever loop.
    */
  def startCalibrated(docs: DataFrame, indexDir: String, storeDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.5,
      maxBucket: Int = LshGuard.DefaultMaxBucket,
      checkpointDir: Option[String] = None) = {
    val (k, bands, shingleWidth) = indexConfig(docs.sparkSession, indexDir)
      .getOrElse(sys.error(
        s"no $ConfigFile under $indexDir — build with writeIndexCalibrated," +
          " or call start() with explicit geometry"))
    start(docs, indexDir, storeDir, idCol, textCol, threshold,
      shingleWidth, k, bands, maxBucket, checkpointDir)
  }

  /** Start the ingest stream: every micro-batch of `docs` (must carry
    * `idCol` and `textCol`) is near-dup-probed against the standing
    * index at `indexDir`, survivors land under `storeDir` and their
    * band keys append to the index.
    */
  def start(docs: DataFrame, indexDir: String, storeDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.5, shingleWidth: Int = 3, k: Int = 12,
      bands: Int = 4, maxBucket: Int = LshGuard.DefaultMaxBucket,
      checkpointDir: Option[String] = None) = {
    val w = docs.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, indexDir, storeDir, idCol, textCol,
          threshold, shingleWidth, k, bands, maxBucket)
      }
    checkpointDir.foreach(c => w.option("checkpointLocation", c))
    w.start()
  }

  /** The q188 registry dataflow: delta docs (doc_id % 10 = 0) staged
    * as 3 mtime-ordered parquet files (batch b = (doc_id div 10) % 3)
    * → file stream at one file per trigger → [[start]] against an
    * index of the standing corpus (doc_id % 10 ≠ 0) → every delta doc
    * with its landed bit. A fresh temp workspace per invocation keeps
    * the run idempotent under the harness's construct-twice policy.
    */
  def demoRun(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.load(spark, dir, "documents")
    val delta = docs.filter(col("doc_id") % 10 === 0)
    val base = java.nio.file.Files
      .createTempDirectory("graft_ndi").toString
    val (inDir, idxDir, storeDir) = (s"$base/in", s"$base/idx", s"$base/store")
    writeIndex(
      docs.filter(col("doc_id") % 10 =!= 0)
        .withColumn("__t", TextFns.tokens(col("text"))),
      idxDir, tokensCol = "__t")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    val t0 = System.currentTimeMillis() - 600000L
    for (b <- 0 until 3) {
      val stage = s"$base/stage$b"
      delta.filter(expr(s"(doc_id div 10) % 3 = $b"))
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file staged under $stage"))
      val dst = java.nio.file.Paths.get(inDir, s"b$b.parquet")
      java.nio.file.Files.move(part.toPath, dst)
      // the file stream orders same-listing files by mtime — pin it
      dst.toFile.setLastModified(t0 + b * 10000L)
    }
    try {
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inDir)
      // batch-sized joins/aggregations inside foreachBatch: a 32-wide
      // shuffle is per-task overhead, not parallelism, on a micro-batch
      // (the EventStream.startSized policy — on a cluster this is the
      // same per-query shuffle.partitions knob sized to batch volume)
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        start(stream, idxDir, storeDir).awaitTermination()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      val landed = spark.read.parquet(storeDir)
        .select(col("doc_id")).withColumn("__l", lit(1L))
      val result = delta.select("doc_id")
        .join(landed, Seq("doc_id"), "left")
        .select(col("doc_id").as("delta_doc"),
          coalesce(col("__l"), lit(0L)).as("landed"))
        .orderBy("delta_doc")
      // materialize before deleting the workspace: the result is
      // delta-sized (one row per delta doc — an output, not a corpus),
      // and a lazily-read frame would dangle on the removed store
      import spark.implicits._
      val rows = result.as[(Long, Long)].collect().toSeq
      rows.toDF("delta_doc", "landed")
    } finally
      // failure or success, the per-invocation workspace never outlives
      // the run — the leak this cleanup exists to prevent
      deleteRecursively(new java.io.File(base))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** One idempotent micro-batch: probe → drop dups → land → index.
    * Also the unit the spec drives directly (batch semantics are
    * testable without a stream).
    */
  def ingestBatch(batch: DataFrame, batchId: Long, indexDir: String,
      storeDir: String, idCol: String, textCol: String, threshold: Double,
      shingleWidth: Int, k: Int, bands: Int, maxBucket: Int): Unit = {
    val spark = batch.sparkSession
    // per-destination idempotence: store landing and index append are
    // two non-atomic writes, so each is guarded by its OWN batch_id
    // partition — a crash between them leaves one destination behind,
    // and the replay completes exactly the missing one (the
    // store-without-index window would otherwise permanently break
    // the index ⊇ landed-docs invariant)
    val storeBatches = CorpusIngest.existingBatchIds(spark, storeDir)
    val storeHas = storeBatches.contains(batchId)
    val idxHas = CorpusIngest.existingBatchIds(spark, indexDir)
      .contains(batchId)
    if (storeHas && idxHas) return
    val toks = batch.withColumn("__t", TextFns.tokens(col(textCol)))
    // persisted: consumed by the probe join and (for survivors) the
    // index append; batch-sized, released at the end of the batch
    val sigs = MinHashLsh.signaturesFromTokens(
      toks, idCol, "__t", shingleWidth, k).persist()
    val probe = MinHashLsh.bandKeys(sigs, idCol, k, bands)
    // probe the index as it stood BEFORE this batch: the batch's own
    // partition exists only on replay after a partial failure and
    // must not make the batch's docs self-match
    val index = LshGuard.capBuckets(
      spark.read.parquet(indexDir).filter(col("batch_id") =!= batchId),
      idCol, maxBucket)
    val matches = (0 until k)
      .map(i => when(col(s"l.s$i") === col(s"r.s$i"), 1).otherwise(0))
      .reduce(_ + _)
    val dupIds = probe.as("l")
      .join(index.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key"))
      .filter(round(matches / lit(k.toDouble), 4) >= threshold)
      .select(col(s"l.$idCol")).distinct()
    // mirror CorpusIngest's in-batch + cross-batch id dedup BEFORE
    // the index append, so the index holds exactly what lands: a
    // re-delivered id with changed text is dropped by the store's
    // anti-join and must not index its phantom new content. Prior
    // batches only — on replay the store may already hold THIS
    // batch's rows, which still need indexing.
    val fresh = batch.join(dupIds, Seq(idCol), "left_anti")
      .dropDuplicates(idCol)
    val freshNew =
      if (storeBatches.forall(_ == batchId)) fresh
      else fresh.join(
        spark.read.parquet(storeDir)
          .filter(col("batch_id") =!= batchId).select(col(idCol)),
        Seq(idCol), "left_anti")
    if (!storeHas)
      CorpusIngest.ingestBatch(freshNew, batchId, storeDir, idCol)
    if (!idxHas)
      // dropDuplicates mirrors the store's in-batch id collapse (same
      // unordered-scan pick-one contract as D1/D3 upserts)
      MinHashLsh.bandKeys(
          sigs.dropDuplicates(idCol)
            .join(freshNew.select(idCol), Seq(idCol), "left_semi"),
          idCol, k, bands)
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").partitionBy("batch_id").parquet(indexDir)
    sigs.unpersist(blocking = false)
  }
}
