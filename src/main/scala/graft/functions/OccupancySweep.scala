package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EXACT banded-LSH occupancy statistics — per config, the candidate
  * load Σ m·(m−1)/2 and the row total Σ m — over a key stream whose
  * distinct-key count is far past what one aggregation can hold
  * (VERDICT r19 #1: the decade pricing sweeps).
  *
  * The plain sweep (`groupBy(cfg, band, key).count` then the per-cfg
  * sums) is exact but its memory/disk high-water mark is ~one row per
  * DISTINCT key: band keys are ~unique md5 values outside the
  * collision mass, so partial aggregation degenerates (no map-side
  * reduction), Spark's hash aggregate falls back to sort, and the
  * spill is ~the whole keyed stream — measured ~33 GB at the 50 M-doc
  * rung and ~10× that at 500 M, past this box (r19 post-mortem). A
  * sketch (heavy-hitter + second-moment tail) would bound the answer
  * but lose the committed EXACT anchors.
  *
  * This operator keeps exactness and bounds the peak instead — the
  * classic GRACE-style out-of-core aggregation, stratified on a hash
  * of the key:
  *
  *  1. MATERIALIZE the packed key stream once per OUTER pass (the
  *     generator pass is the expensive part — md5 over every
  *     shingle), written as plain-parquet longs partitioned by
  *     `stratum = xxhash64(packed) mod (outer·inner)`. One long per
  *     row: callers bijectively pack (config, band, key) into 64 bits
  *     ([[packTag]]), so grouping by `packed` IS grouping by
  *     (config, band, key).
  *  2. Per INNER stratum: read only that stratum's directory,
  *     hash-REPARTITION on `packed` (a pure shuffle — no sort, no
  *     aggregation buffering), and count each task's co-located keys
  *     in a bounded open-address long→count table
  *     ([[stratumStats]]), emitting |configs| partial sums per task.
  *     Peak per task = (stream / strata / partitions) entries; peak
  *     transient disk = ONE stratum's shuffle. Equal keys always
  *     land in the same stratum AND the same task, so per-key counts
  *     are exact — partial sums of m(m−1)/2 add across strata
  *     because each key's full multiplicity lives in exactly one.
  *  3. Drop the stratum's directory and reclaim its shuffle
  *     ([[graft.operators.ShuffleHygiene.reclaim]]) before the next
  *     one, so disk usage is a sawtooth bounded by
  *     materialized/outer + one stratum's shuffle — the knobs scale
  *     with N while per-stratum cost stays constant.
  *
  * OUTER passes trade generator time for peak disk: pass `o` filters
  * the generated stream to `stratum / inner == o` before writing, so
  * only 1/outer of the materialization ever exists at once. With
  * outer = 1 the generator runs once and the full stream is on disk
  * for the duration.
  *
  * On a real cluster the same shape holds per executor: the stratum
  * count bounds each node's share of the repartition shuffle, and the
  * scratch dir is any shared filesystem.
  */
object OccupancySweep {

  /** Bits available above a band key for the (config, band) tag. A
    * MinHash band key is 60 bits ([[MinHashLsh.BandKeyHexChars]]), so
    * 4 tag bits cover grids with up to 16 (config, band) pairs —
    * exactly the default pricing grid {2,3,4,6} (15 pairs). Wider
    * grids (or narrower keys, e.g. SimHash) pass their own shift.
    */
  val MinHashTagShift = 60

  /** Pack a (tagIndex, key) pair bijectively: requires
    * 0 ≤ key < 2^shift and 0 ≤ tag < 2^(64−shift) — checked by the
    * caller's grid construction, asserted here per row in the column
    * expression (an out-of-range key would silently alias two buckets
    * and corrupt the exact counts). The sign bit is a tag bit like
    * any other — a negative packed value is bijective and every
    * downstream step (xxhash64 stratification, hash repartition, the
    * open-address count) is sign-agnostic.
    */
  def packTag(tag: Int, key: org.apache.spark.sql.Column,
      shift: Int): org.apache.spark.sql.Column = {
    require(shift > 0 && shift < 63, s"bad shift $shift")
    require(tag >= 0 && (64 - shift >= 32 || tag.toLong < (1L << (64 - shift))),
      s"tag $tag does not fit above shift $shift")
    when(key >= 0 && key < (1L << shift),
      lit(tag.toLong << shift) + key)
      .otherwise(raise_error(concat(lit(s"band key out of 2^$shift range: "),
        key.cast("string"))))
  }

  /** Exact per-config (candPairs, totalRows) over an arbitrarily
    * large packed key stream.
    *
    * @param packedOf  builds the single-column (`packed` LONG) frame
    *                  for one outer pass — called `outer` times, so
    *                  an expensive generator upstream re-runs per
    *                  pass (the disk-vs-time knob)
    * @param cfgOf     config tag recovered from a packed value (the
    *                  inverse of the caller's packing); must be a
    *                  pure serializable function
    * @param outer     generator passes (≥1); each materializes
    *                  1/outer of the stream
    * @param inner     strata per pass (≥1); each bounds one
    *                  repartition+count round
    * @param scratchDir transient parquet root (created, then deleted)
    * @param aggPartitions repartition width of each stratum round
    */
  def exactStratified(spark: SparkSession, packedOf: () => DataFrame,
      cfgOf: Long => Int, outer: Int, inner: Int, scratchDir: String,
      aggPartitions: Int = 256): Map[Int, (Long, Long)] = {
    require(outer >= 1 && inner >= 1, s"bad strata ($outer, $inner)")
    import spark.implicits._
    val total = outer * inner
    val acc = scala.collection.mutable.Map.empty[Int, (Long, Long)]
    for (o <- 0 until outer) {
      val passDir = s"$scratchDir/pass=$o"
      val src = packedOf()
      require(src.columns.toSeq == Seq("packed"),
        s"packedOf must produce exactly one column `packed`, " +
          s"got ${src.columns.mkString(",")}")
      val strat = pmod(xxhash64(col("packed")), lit(total))
      src.withColumn("__s", strat)
        .filter(col("__s") >= o * inner && col("__s") < (o + 1) * inner)
        .write.mode("overwrite").partitionBy("__s").parquet(passDir)
      for (s <- o * inner until (o + 1) * inner) {
        val dir = s"$passDir/__s=$s"
        // a stratum can be legitimately empty on tiny inputs
        if (exists(spark, dir)) {
          val parts = spark.read.parquet(dir)
            .repartition(aggPartitions, col("packed"))
            .as[Long]
            .mapPartitions(it => stratumStats(it, cfgOf))
            .collect()
          parts.foreach { case (cfg, pairs, tot) =>
            val (p0, t0) = acc.getOrElse(cfg, (0L, 0L))
            acc(cfg) = (p0 + pairs, t0 + tot)
          }
          delete(spark, dir)
        }
        graft.operators.ShuffleHygiene.reclaim(spark, maxRounds = 3,
          pauseMs = 100L)
      }
      delete(spark, passDir)
    }
    acc.toMap
  }

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new org.apache.hadoop.fs.Path(dir))

  private def delete(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val f = fs(spark, dir)
    if (f.exists(p)) f.delete(p, true)
    ()
  }

  /** Streaming exact count of one task's co-located packed keys in an
    * open-address long→int table (grown by rehash; no boxing, no
    * sort), folded directly into per-config Σ m·(m−1)/2 and Σ m on
    * emit — the task's output is |configs| rows regardless of its
    * key count.
    */
  private def stratumStats(it: Iterator[Long],
      cfgOf: Long => Int): Iterator[(Int, Long, Long)] = {
    var cap = 1 << 16
    var mask = cap - 1
    var keys = new Array[Long](cap)
    var cnts = new Array[Int](cap)
    var used = 0

    def slotOf(k: Long, ks: Array[Long], cs: Array[Int], m: Int): Int = {
      // splitmix64 finalizer spreads the packed tag+md5 bits
      var h = k * -0x61c8864680b583ebL
      h ^= (h >>> 31)
      var i = (h & m).toInt
      while (cs(i) != 0 && ks(i) != k) i = (i + 1) & m
      i
    }
    def grow(): Unit = {
      val nk = new Array[Long](cap << 1)
      val nc = new Array[Int](cap << 1)
      val nm = (cap << 1) - 1
      var i = 0
      while (i < cap) {
        if (cnts(i) != 0) {
          val j = slotOf(keys(i), nk, nc, nm)
          nk(j) = keys(i); nc(j) = cnts(i)
        }
        i += 1
      }
      cap <<= 1; mask = nm; keys = nk; cnts = nc
    }
    while (it.hasNext) {
      val k = it.next()
      val i = slotOf(k, keys, cnts, mask)
      if (cnts(i) == 0) {
        keys(i) = k; cnts(i) = 1; used += 1
        if (used * 10L >= cap * 7L) grow()
      } else {
        // ADVICE r20: fail loudly instead of wrapping — a silent Int
        // overflow would corrupt the exact counts this operator exists
        // to guarantee (reachable within one decade of the 5e8-doc
        // pricing rungs).
        if (cnts(i) == Int.MaxValue) throw new IllegalStateException(
          s"stratumStats: per-key multiplicity overflow (> ${Int.MaxValue}) " +
            s"for packed key ${keys(i)} — exact occupancy would be corrupted")
        cnts(i) += 1
      }
    }
    val pairs = scala.collection.mutable.Map.empty[Int, (Long, Long)]
    var i = 0
    while (i < cap) {
      val c = cnts(i)
      if (c != 0) {
        val cfg = cfgOf(keys(i))
        val (p0, t0) = pairs.getOrElse(cfg, (0L, 0L))
        pairs(cfg) = (p0 + c.toLong * (c - 1) / 2, t0 + c)
      }
      i += 1
    }
    pairs.iterator.map { case (cfg, (p, t)) => (cfg, p, t) }
  }
}
