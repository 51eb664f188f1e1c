package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting (16-bit variant).
  *
  * Per distinct token: take the first 4 hex chars of md5(token)
  * (16 bits). Per document and bit position b: the bit is set iff more
  * than half the tokens have bit b set. The per-token bit extraction
  * is pure integer arithmetic on hex nibbles (`instr` on a hex
  * alphabet), so the whole computation is portable, codegen'd, and
  * exactly reproducible in any ANSI-SQL engine — no platform hash.
  *
  * Shape at scale: explode to (doc, token) → one hash-aggregate keyed
  * by doc with 16 conditional sums; a single shuffle.
  */
object SimHash {
  val bits = 16

  /** Bit b (0 = LSB of the last nibble) of the 16-bit token hash. */
  def tokenBit(token: Column, b: Int): Column = {
    val hexPos = 4 - b / 4 // hex char position 1..4, MSB first
    val nib = conv(substring(md5(token), hexPos, 1), 16, 10).cast("int")
    floor(nib / (1 << (b % 4))) % 2
  }

  /** Aggregate expression: 16-bit simhash over grouped token rows. */
  def simhashAgg(token: Column): Column = {
    val tot = count(lit(1))
    (0 until bits)
      .map { b =>
        val cnt = sum(tokenBit(token, b))
        when(cnt * 2 > tot, lit(1L << b)).otherwise(lit(0L))
      }
      .reduce(_ + _)
      .cast("long")
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Default bits-per-band grid for [[calibrateWidth]] (divisors of
    * [[bits]], narrowest first — fewer bits per band → more bands and
    * more collisions → higher recall, more candidate pairs).
    */
  val DefaultWidthGrid: Seq[Int] = Seq(2, 4, 8)

  /** Banded keys of a fingerprint frame at `w` bits per band: one row
    * per (input row, band) with `band` and `key` columns appended —
    * key = (sh >> band·w) & (2^w − 1), pure bit arithmetic.
    */
  def bandKeys(sigs: org.apache.spark.sql.DataFrame, shCol: String,
      w: Int): org.apache.spark.sql.DataFrame = {
    require(bits % w == 0, s"width $w must divide $bits")
    sigs
      .withColumn("band",
        explode(array((0 until bits / w).map(lit(_)): _*)))
      .withColumn("key", expr(s"shiftright($shCol, band * $w)")
        .bitwiseAND(lit((1L << w) - 1)))
  }

  /** One-pass bits-per-band calibration sweep (the q189 shape): for
    * every width in `widthGrid`, the exact banded-join candidate load
    * Σ m·(m−1)/2 and the signed-doc count, from one groupBy over the
    * fingerprint frame — the 16-bit keyspace has at most 2^w buckets
    * per band, so this is also how the family PRICES itself out of a
    * budget on large corpora (the sweep reports the quadratic load
    * without ever running the join).
    *
    * @return one row per width: (w, cand_pairs, n_docs)
    */
  /** Per-bucket occupancy of the WHOLE width grid in one aggregation:
    * (w, band, key, m). The 16-bit fingerprint bounds the result at
    * Σ_w (bits/w)·2^w rows — 608 for the default grid — AT ANY CORPUS
    * SIZE, which is what makes the SimHash family's calibrate-then-
    * execute loop a single corpus pass: the collected occupancy drives
    * both the width selection and the hot-bucket split
    * ([[calibratedPairs]]), where the unbounded-keyspace families
    * (MinHash, hyperplane) must pay a separate guard probe.
    */
  def occupancy(sigs: org.apache.spark.sql.DataFrame, shCol: String,
      widthGrid: Seq[Int] = DefaultWidthGrid): org.apache.spark.sql.DataFrame = {
    require(widthGrid.nonEmpty && widthGrid.forall(w => bits % w == 0),
      s"width grid $widthGrid must be non-empty divisors of $bits")
    widthGrid.map { w =>
      bandKeys(sigs.select(col(shCol)), shCol, w)
        .select(lit(w).as("w"), col("band"), col("key"))
    }.reduce(_ unionByName _)
      .groupBy("w", "band", "key")
      .agg(count(lit(1)).as("m"))
  }

  def widthSweep(sigs: org.apache.spark.sql.DataFrame, shCol: String,
      widthGrid: Seq[Int] = DefaultWidthGrid): org.apache.spark.sql.DataFrame =
    occupancy(sigs, shCol, widthGrid)
      .groupBy("w")
      .agg(sum(expr("(m * (m - 1)) div 2")).as("cand_pairs"),
        sum(col("m")).as("tot"))
      .withColumn("n_docs", expr(s"tot div ($bits div w)"))
      .select("w", "cand_pairs", "n_docs")

  /** The one selection comparator (ARCHITECTURE calibration table):
    * narrowest (highest-recall) width whose load fits the per-doc
    * budget; widest as fallback. `stats` rows are (w, candPairs, nDocs).
    */
  private def selectWidth(stats: Seq[(Int, Long, Long)], widthGrid: Seq[Int],
      pairsPerDocBudget: Long): Int = {
    val fitting = stats.collect {
      case (w, p, n) if p <= n * pairsPerDocBudget => w
    }
    if (fitting.nonEmpty) fitting.min else widthGrid.max
  }

  /** Per-width (load, docs) stats from COLLECTED occupancy rows — the
    * single stats definition both [[calibrateWidth]] and
    * [[calibratedPairs]] consume, so the two selection paths can
    * never desync ([[widthSweep]] keeps the SQL derivation for
    * consumers that want the stats as a frame; the sweep-vs-executed
    * cross-check in ScaleCalibrationSpec exercises it independently).
    */
  private def localStats(
      rows: Array[org.apache.spark.sql.Row]): Seq[(Int, Long, Long)] =
    rows.groupBy(_.getAs[Int]("w")).map { case (w, rs) =>
      val load = rs.map(r => { val m = r.getAs[Long]("m"); m * (m - 1) / 2 }).sum
      val docs = rs.map(_.getAs[Long]("m")).sum / (bits / w)
      (w, load, docs)
    }.toSeq

  /** Selection over the collected [[occupancy]] (keyspace-bounded —
    * never corpus-sized): the narrowest (highest-recall) width whose
    * candidate load fits `pairsPerDocBudget` per signed document;
    * widest as fallback when none fits (or the frame is empty).
    */
  def calibrateWidth(sigs: org.apache.spark.sql.DataFrame, shCol: String,
      widthGrid: Seq[Int] = DefaultWidthGrid,
      pairsPerDocBudget: Long = 20L): Int =
    selectWidth(localStats(occupancy(sigs, shCol, widthGrid).collect()),
      widthGrid, pairsPerDocBudget)

  /** Calibrate-then-execute in ONE pass over the corpus: collect the
    * grid [[occupancy]] (keyspace-bounded — never corpus-sized),
    * select the width driver-side with the same comparator as
    * [[calibrateWidth]], derive the selected width's over-cap buckets
    * from the SAME collected rows, and run the banded join with the
    * hot split already known ([[LshGuard.splitHotKnown]]) — the
    * separate guard probe job (and its pass over the banded frame)
    * that [[candidatePairs]] pays never runs.
    *
    * @return (selected width, pairs frame — the [[candidatePairs]]
    *         schema and semantics, bit-identical to the probe path)
    */
  def calibratedPairs(sigs: org.apache.spark.sql.DataFrame, idCol: String,
      shCol: String, widthGrid: Seq[Int] = DefaultWidthGrid,
      pairsPerDocBudget: Long = 20L,
      maxBucket: Int = LshGuard.DefaultMaxBucket)
      : (Int, org.apache.spark.sql.DataFrame) = {
    val (w, pairs, _) = calibratedPairsWithCleanup(
      sigs, idCol, shCol, widthGrid, pairsPerDocBudget, maxBucket)
    (w, pairs)
  }

  /** [[calibratedPairs]] plus the banded frame's unpersist handle —
    * the `EmbedNearDup.calibratedPairsWithCleanup` contract: callers
    * outside a clear-caches-between-queries loop (long-lived ingest
    * or test sessions issuing repeated calls) invoke the handle once
    * the returned frame is consumed, instead of accumulating
    * corpus×bands-sized cached blocks.
    */
  def calibratedPairsWithCleanup(sigs: org.apache.spark.sql.DataFrame,
      idCol: String, shCol: String, widthGrid: Seq[Int] = DefaultWidthGrid,
      pairsPerDocBudget: Long = 20L,
      maxBucket: Int = LshGuard.DefaultMaxBucket)
      : (Int, org.apache.spark.sql.DataFrame, () => Unit) = {
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    val occ = occupancy(sigs, shCol, widthGrid)
    val rows = occ.collect()
    val selected =
      selectWidth(localStats(rows), widthGrid, pairsPerDocBudget)
    val hotSchema = org.apache.spark.sql.types.StructType(
      occ.schema.filter(_.name != "w")
        .map(f => if (f.name == "m") f.copy(name = "__cnt") else f))
    val hotRows = rows.toSeq
      .filter(r => r.getAs[Int]("w") == selected && r.getAs[Long]("m") > maxBucket)
      .map(r => org.apache.spark.sql.Row(
        r.getAs[Int]("band"), r.getAs[Long]("key"), r.getAs[Long]("m")))
    // persist + shuffle-free materializing count before the self-join
    // (the candidatePairsKnown pattern): banding is cheap bit work,
    // but against an unmaterialized cache the join's two concurrent
    // map stages each re-scan the sigs input
    val banded = bandKeys(sigs.select(col(idCol), col(shCol)), shCol, selected)
      .persist()
    banded.count(): Unit
    (selected,
      pairsFromSplit(LshGuard.splitHotKnown(banded, hotRows, hotSchema),
        idCol, shCol),
      () => { banded.unpersist(blocking = false); () })
  }

  /** Banded candidate pairs at `w` bits per band with the
    * [[LshGuard]] hot-bucket cap — the SimHash counterpart of
    * `MinHashLsh.candidatePairs`, and the reason the fallback width is
    * safe to EXECUTE (not just price): a 16-bit fingerprint has at most
    * 2^w keys per band, so fingerprint-concentrated corpora put
    * hundreds of thousands of rows behind one key, and the raw band
    * self-join is O(m²) per bucket regardless of which width the sweep
    * selected. Buckets over `maxBucket` are chain-linked in
    * (fingerprint, id) order — identical fingerprints form contiguous
    * hamming-0 runs, so a degenerate cluster still connects (and still
    * passes a hamming threshold) while emitting m−1 pairs instead of
    * m(m−1)/2. Buckets at or under the cap take the exact all-pairs
    * join; with no hot bucket the plan IS the unguarded self-join.
    *
    * @return (a, b, sa, sb) with a < b; sa/sb are a's/b's fingerprints
    */
  def candidatePairs(sigs: org.apache.spark.sql.DataFrame, idCol: String,
      shCol: String, w: Int,
      maxBucket: Int = LshGuard.DefaultMaxBucket)
      : org.apache.spark.sql.DataFrame = {
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    // persist before the self-join: the occupancy probe materializes
    // the cache, the two join sides then read cached blocks
    val banded = bandKeys(sigs.select(col(idCol), col(shCol)), shCol, w)
      .persist()
    pairsFromSplit(LshGuard.splitHot(banded, maxBucket), idCol, shCol)
  }

  /** The banded-join body shared by the probe path ([[candidatePairs]])
    * and the known-occupancy path ([[calibratedPairs]]): exact
    * all-pairs on the cold side, chain-links in (fingerprint, id)
    * order on the hot side.
    */
  private def pairsFromSplit(
      split: (org.apache.spark.sql.DataFrame, Option[org.apache.spark.sql.DataFrame]),
      idCol: String, shCol: String): org.apache.spark.sql.DataFrame = {
    val (cold, hotOpt) = split
    val l = cold.select(col(idCol).as("a"), col(shCol).as("sa"),
      col("band"), col("key"))
    val rj = cold.select(col(idCol).as("b"), col(shCol).as("sb"),
      col("band"), col("key"))
    val coldPairs = l.join(rj, Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select("a", "b", "sa", "sb")
    val hotPairs = hotOpt.map { hot =>
      val ordered = org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("key"))
        .orderBy(col(shCol).asc, col(idCol).asc)
      LshGuard.instrument(hot
        .withColumn("__pid", lag(col(idCol), 1).over(ordered))
        .withColumn("__psh", lag(col(shCol), 1).over(ordered))
        .withColumn("__rn", row_number().over(ordered))
        .filter(col("__pid").isNotNull)
        .select(least(col("__pid"), col(idCol)).as("a"),
          greatest(col("__pid"), col(idCol)).as("b"),
          // fingerprints follow the id orientation (hamming is
          // symmetric, but distinct() needs a canonical row)
          when(col("__pid") < col(idCol), col("__psh"))
            .otherwise(col(shCol)).as("sa"),
          when(col("__pid") < col(idCol), col(shCol))
            .otherwise(col("__psh")).as("sb"),
          col("__cnt"), col("__rn")))
    }
    hotPairs.fold(coldPairs)(coldPairs.unionByName).distinct()
  }
}
