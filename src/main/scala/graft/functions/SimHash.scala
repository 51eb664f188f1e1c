package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting, parameterized by fingerprint
  * width ([[SimHash]] = the original 16-bit variant, [[SimHash64]] =
  * the scale variant — see the width note below).
  *
  * Per distinct token: take the first `bits/4` hex chars of
  * md5(token). Per document and bit position b: the bit is set iff
  * more than half the tokens have bit b set. The per-token hash is
  * assembled ONCE per row as a long (`tokenHash`) from `conv` over
  * the md5 hex — pure integer arithmetic, portable, codegen'd, and
  * exactly reproducible in any ANSI-SQL engine (no platform hash) —
  * and the per-bit terms are then cheap shift/mask extractions from
  * that long. Assembling the hash once matters at 64 bits twice
  * over: it keeps md5 from being recomputed per bit, and it keeps
  * the aggregate's generated update method far from the JVM JIT's
  * method-size ceiling (the q187 HugeMethodLimit lesson: 64 similar
  * heavy expressions over one input silently run interpreted; 64
  * shift-and terms over one long do not).
  *
  * Shape at scale: explode to (doc, token) → one hash-aggregate keyed
  * by doc with `bits` conditional sums; a single shuffle.
  *
  * WIDTH AND SCALE: a w-bit band over a `bits`-wide fingerprint has
  * at most 2^w keys, and the fingerprint keyspace itself is 2^bits.
  * At 16 bits the whole corpus lands on ≤65 k distinct fingerprints,
  * so from ~5 M docs up bucket occupancy grows linearly in N and
  * candidate pairs quadratically — the round-16 sf100 calibration
  * priced out EVERY 16-bit width and the guarded fallback became the
  * permanent path. [[SimHash64]] is the fix (Charikar's construction
  * at the width Manku–Jain–Sadikov use for web-scale dedup): 16 md5
  * nibbles, band widths 8–16 give 256–65 k keys per band with
  * keyspace headroom for decades of corpus growth. The 16-bit
  * variant stays for its committed oracles (q29/q60/q160/q176/q189)
  * and for corpora small enough that its narrower hamming radii are
  * the point.
  */
sealed abstract class SimHashFamily(val bits: Int) {
  require(bits == 16 || bits == 64, s"unsupported fingerprint width $bits")

  private val hexChars = bits / 4

  /** The `bits`-bit token hash as ONE long column: `conv` the leading
    * md5 nibbles in ≤8-char (32-bit) limbs — each limb fits a long
    * with headroom, so the assembly is shift/or bit work with no
    * ANSI-overflow surface (a single 16-char conv of a hash with the
    * top bit set would exceed Long.MaxValue as unsigned decimal and
    * fail the cast).
    */
  def tokenHash(token: Column): Column = {
    val hex = md5(token)
    if (bits <= 32)
      conv(substring(hex, 1, hexChars), 16, 10).cast("long")
    else {
      val hi = conv(substring(hex, 1, 8), 16, 10).cast("long")
      val lo = conv(substring(hex, 9, 8), 16, 10).cast("long")
      shiftleft(hi, 32).bitwiseOR(lo)
    }
  }

  /** Bit b (0 = LSB) of a token-hash long. */
  def bitOf(h: Column, b: Int): Column =
    shiftright(h, b).bitwiseAND(lit(1L))

  /** Bit b of the token's hash (kept for expression-level parity with
    * the per-nibble oracle construction — see [[tokenHash]]).
    */
  def tokenBit(token: Column, b: Int): Column = bitOf(tokenHash(token), b)

  /** Aggregate expression: `bits`-bit simhash over grouped token rows.
    * The `1L << b` term for the sign bit is Long.MinValue; the left
    * fold adds it last, after the ≤(2^63 − 1) sum of the lower bits,
    * so every partial sum stays in range under ANSI arithmetic (the
    * DuckDB oracles promote to HUGEINT and cast back — same values).
    */
  def simhashAgg(token: Column): Column =
    simhashAggFromHash(tokenHash(token))

  /** [[simhashAgg]] over a pre-computed token-hash column — the form
    * to use when the plan already carries the hash (one md5 per row
    * instead of relying on subexpression elimination).
    */
  def simhashAggFromHash(h: Column): Column = {
    val tot = count(lit(1))
    (0 until bits)
      .map { b =>
        val cnt = sum(bitOf(h, b))
        when(cnt * 2 > tot, lit(1L << b)).otherwise(lit(0L))
      }
      .reduce(_ + _)
      .cast("long")
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Per-document fingerprint over n-token shingles computed inside
    * ONE pass over the corpus — bit-equal to the declarative
    * explode → distinct-hash → [[simhashAggFromHash]] chain (the q191
    * construction), with the per-doc shingle dedup and the
    * majority-vote fold run locally in a typed `mapPartitions`: a
    * document's fingerprint depends only on its own shingles, so the
    * explode (one row copy per shingle), the corpus-wide DISTINCT
    * shuffle, and the (doc → 64 bit-sums) aggregation shuffle are all
    * unnecessary. The `MinHashLsh.signaturesFromTokens` move applied
    * to SimHash — and at the fourth decade it is the difference
    * between a map-only stage and ~1.45 B shingle rows through two
    * corpus-wide shuffles whose retained files exceeded a 252 GB
    * box's free disk (the round-17 sf1000 post-mortem). The hash is
    * the identical md5-prefix value ([[tokenHash]]'s first `bits`
    * digest bits, taken from the raw bytes rather than through a
    * hex-string round-trip), so fingerprints stay bit-equal to the
    * declarative form and to the SQL oracle.
    *
    * DEDUP SEMANTICS (one mode — round 19 retired the string-dedup
    * compatibility branch): per-doc shingles dedup on the `bits`-bit
    * HASH itself. The oracle twin is `SELECT DISTINCT doc_id,
    * substr(md5(shingle), 1, bits/4)` — hex prefix ↔ hash long is a
    * BIJECTION, so deduping on either side of it selects the same
    * set and the SQL replay stays exact (SimHashOnePassSpec pins the
    * bijection). Two distinct shingles colliding in the prefix
    * collapse to one vote on BOTH sides (probability 2^-bits per
    * pair; at 16 bits this is observable on real corpora, which is
    * why the oracles replay the same dedup rather than pretending
    * collisions away).
    *
    * @param docs      one row per document
    * @param tokensCol materialized array<string> token column
    * @param n         shingle width (tokens per shingle)
    * @return one row per id that has ≥ 1 shingle: idCol, sh
    */
  def fingerprintsFromTokens(docs: org.apache.spark.sql.DataFrame,
      idCol: String, tokensCol: String, n: Int)
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nBits = bits
    val nBytes = bits / 8
    // id rides through as a string and is cast back on the way out —
    // the signaturesFromTokens any-id-type contract
    val idType = docs.schema(idCol).dataType
    val rows = docs
      .select(col(idCol).cast("string"), col(tokensCol).cast("array<string>"))
      .as[(String, Array[String])]
      .mapPartitions { it =>
        // r21: allocation-free single-pass MD5 + byte-level shingle
        // assembly (the signaturesFromTokens rewrite) — identical
        // bytes, identical prefix value (Md5Spec)
        val md = new Md5.First8
        val bb = new Md5.ByteBuf
        var tokBytes = new Array[Array[Byte]](64)
        val seen = new java.util.HashSet[java.lang.Long]
        val cnt = new Array[Int](nBits)
        it.flatMap { case (id, t) =>
          if (t == null || t.length < n) Iterator.empty
          else {
            if (tokBytes.length < t.length)
              tokBytes = new Array[Array[Byte]](t.length)
            var e = 0
            while (e < t.length) {
              tokBytes(e) = if (t(e) == null) null else t(e).getBytes("UTF-8")
              e += 1
            }
            seen.clear()
            java.util.Arrays.fill(cnt, 0)
            var tot = 0
            var i = 0
            while (i + n <= t.length) {
              bb.reset()
              // null elements are SKIPPED, separator and all — the
              // declarative twin's concat_ws semantics (ADVICE r18:
              // StringBuilder.append(null) would render the literal
              // "null", a latent bit-parity divergence; unreachable
              // from split()-produced arrays, pinned here anyway)
              var o = 0
              while (o < n) {
                val tok = tokBytes(i + o)
                if (tok != null) {
                  if (bb.len > 0) bb.appendSpace()
                  bb.append(tok)
                }
                o += 1
              }
              // first bits/4 hex chars == first bits/8 digest bytes,
              // big-endian — the tokenHash limb assembly's value
              val h = md.hash(bb.buf, bb.len) >>> (64 - 8 * nBytes)
              if (seen.add(h)) {
                tot += 1
                var b = 0
                while (b < nBits) {
                  cnt(b) += ((h >>> b) & 1L).toInt
                  b += 1
                }
              }
              i += 1
            }
            if (tot == 0) Iterator.empty
            else {
              var sh = 0L
              var b = 0
              while (b < nBits) {
                if (2L * cnt(b) > tot) sh |= (1L << b)
                b += 1
              }
              Iterator.single((id, sh))
            }
          }
        }
      }
    rows.select(col("_1").cast(idType).as(idCol), col("_2").as("sh"))
  }

  /** Default bits-per-band grid for [[calibrateWidth]] (divisors of
    * [[bits]], narrowest first — fewer bits per band → more bands and
    * more collisions → higher recall, more candidate pairs). The
    * 64-bit grid starts at 4 (a 2-bit band of a 64-bit fingerprint is
    * 32 bands of 4 keys — pure noise) and tops out at 32: on a
    * near-uniform fingerprint population the per-doc load at width w
    * is ~(bits/w)·N/2^(w+1), so w=16 stops fitting a 20-pairs/doc
    * budget near N ≈ 650 k and the third decade needs the 2^32
    * keyspace (2 bands — structurally complete for hamming ≤ 1, the
    * honest recall trade the selection makes explicit; 4 bands of 16
    * keep the hamming ≤ 3 completeness wherever they fit).
    */
  val DefaultWidthGrid: Seq[Int] =
    if (bits <= 16) Seq(2, 4, 8) else Seq(4, 8, 16, 32)

  /** Banded keys of a fingerprint frame at `w` bits per band: one row
    * per (input row, band) with `band` and `key` columns appended —
    * key = (sh >> band·w) & (2^w − 1), pure bit arithmetic (the
    * arithmetic shift's sign extension is masked off identically in
    * Spark and the oracle's engine).
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

  /** Per-bucket occupancy of the WHOLE width grid in one aggregation:
    * (w, band, key, m) — a DISTRIBUTED intermediate, never collected:
    * narrow widths bound it by keyspace (Σ_w (bits/w)·2^w), but a
    * 32-bit band's keyspace exceeds any corpus, so the frame is
    * corpus-sized in general and everything driver-side derives from
    * its |grid|-row aggregation ([[widthSweep]]) or its over-cap
    * filtrate (the [[LshGuard]] probe), both provably small.
    */
  def occupancy(sigs: org.apache.spark.sql.DataFrame, shCol: String,
      widthGrid: Seq[Int] = DefaultWidthGrid): org.apache.spark.sql.DataFrame = {
    require(widthGrid.nonEmpty && widthGrid.forall(w => bits % w == 0),
      s"width grid $widthGrid must be non-empty divisors of $bits")
    // ONE explode emits every grid config's (w, band, key) rows in a
    // single pass over the fingerprints (r22 — the
    // MinHashLsh.gridOccupancy shape): the former per-width bandKeys +
    // unionByName scanned the fingerprint frame |widthGrid| times for
    // the identical rows (Σ_w bits/w keys per row either way, pure bit
    // arithmetic both ways).
    val keyCols = for { w <- widthGrid; band <- 0 until bits / w } yield
      struct(lit(w).as("w"), lit(band).as("band"),
        expr(s"shiftright($shCol, ${band * w})")
          .bitwiseAND(lit((1L << w) - 1)).as("key"))
    sigs.select(explode(array(keyCols: _*)).as("__gk"))
      .select(col("__gk.w").as("w"), col("__gk.band").as("band"),
        col("__gk.key").as("key"))
      .groupBy("w", "band", "key")
      .agg(count(lit(1)).as("m"))
  }

  def widthSweep(sigs: org.apache.spark.sql.DataFrame, shCol: String,
      widthGrid: Seq[Int] = DefaultWidthGrid): org.apache.spark.sql.DataFrame =
    widthSweepFromOcc(occupancy(sigs, shCol, widthGrid))

  /** [[widthSweep]] over a prebuilt (possibly persisted) [[occupancy]]
    * frame — the fused calibrate path shares one occupancy scan
    * between the sweep and the hot-bucket filtrate.
    */
  private def widthSweepFromOcc(occ: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    occ
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

  /** Per-width (load, docs) stats as collected [[widthSweep]] rows —
    * the single stats definition both [[calibrateWidth]] and
    * [[calibratedPairs]] consume, so the two selection paths can
    * never desync; the collect is |grid|-row by construction.
    */
  private def sweepStats(sigs: org.apache.spark.sql.DataFrame, shCol: String,
      widthGrid: Seq[Int]): Seq[(Int, Long, Long)] = {
    val sweep = widthSweep(sigs, shCol, widthGrid)
    graft.PlanProbe.record("simhash.widthSweep", sweep)
    sweep.collect().toSeq.map(r =>
      (r.getAs[Int]("w"), r.getAs[Long]("cand_pairs"),
        r.getAs[Long]("n_docs")))
  }

  /** Selection over the |grid|-row [[widthSweep]] aggregate: the
    * narrowest (highest-recall) width whose candidate load fits
    * `pairsPerDocBudget` per signed document; widest as fallback when
    * none fits (or the frame is empty).
    */
  def calibrateWidth(sigs: org.apache.spark.sql.DataFrame, shCol: String,
      widthGrid: Seq[Int] = DefaultWidthGrid,
      pairsPerDocBudget: Long = 20L): Int =
    selectWidth(sweepStats(sigs, shCol, widthGrid),
      widthGrid, pairsPerDocBudget)

  /** Calibrate-then-execute in ONE pass over the corpus: one
    * [[widthSweep]] aggregation prices the whole grid (a |grid|-row
    * collect), the width is selected driver-side with the same
    * comparator as [[calibrateWidth]], and the banded join executes
    * at the selected width with the [[LshGuard]] probe running over
    * the already-persisted banded frame — cheap bit re-derivation
    * against cached blocks, never a second corpus pass. (Round 17:
    * this replaced the full-occupancy collect, which was
    * keyspace-bounded only while every grid width was ≤16 bits —
    * a 32-bit band's occupancy is corpus-sized.)
    *
    * The banded frame stays persisted for the returned pairs frame's
    * benefit; the unpersist handle is registered with
    * [[PersistLeases]] so harnesses and long-lived sessions that
    * drain leases between queries release it without threading the
    * handle (callers that manage lifetime explicitly should prefer
    * [[calibratedPairsWithCleanup]]).
    *
    * @return (selected width, pairs frame — the [[candidatePairs]]
    *         schema and semantics, bit-identical to the probe path)
    */
  def calibratedPairs(sigs: org.apache.spark.sql.DataFrame, idCol: String,
      shCol: String, widthGrid: Seq[Int] = DefaultWidthGrid,
      pairsPerDocBudget: Long = 20L,
      maxBucket: Int = LshGuard.DefaultMaxBucket)
      : (Int, org.apache.spark.sql.DataFrame) = {
    val (w, pairs, release) = calibratedPairsWithCleanup(
      sigs, idCol, shCol, widthGrid, pairsPerDocBudget, maxBucket)
    PersistLeases.register(release)
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
    // Fused calibrate + hot discovery (r22 — the
    // MinHashLsh.calibrateBandsFused shape): the sweep's per-bucket
    // occupancy persists for the duration of the call, so the selected
    // width's over-cap buckets come from a cached-scan filter instead
    // of LshGuard.splitHot's second aggregation over the banded frame.
    val occ = occupancy(sigs, shCol, widthGrid).persist()
    val (selected, hotOpt) = try {
      val sweep = widthSweepFromOcc(occ)
      graft.PlanProbe.record("simhash.calibrated.widthSweep", sweep)
      val stats = sweep.collect().toSeq.map(r =>
        (r.getAs[Int]("w"), r.getAs[Long]("cand_pairs"),
          r.getAs[Long]("n_docs")))
      val sel = selectWidth(stats, widthGrid, pairsPerDocBudget)
      (sel, LshGuard.collectHotKnown(occ.filter(col("w") === sel), maxBucket))
    } finally { occ.unpersist(blocking = false); () }
    hotOpt match {
      case Some((rows, _)) if rows.isEmpty =>
        // No hot bucket (the common case): a pure self-join whose two
        // sides plan the IDENTICAL exchange — AQE's stage reuse
        // materializes it once; no persist, no probe, no count job.
        (selected,
          pairsFromSplit(
            (bandKeys(sigs.select(col(idCol), col(shCol)), shCol, selected),
              None), idCol, shCol),
          () => ())
      case Some((rows, schema)) =>
        // hot/cold split breaks the exchange identity — materialize the
        // banded cache with a shuffle-free count before the self-join.
        val banded = bandKeys(sigs.select(col(idCol), col(shCol)), shCol,
          selected).persist()
        banded.count(): Unit
        (selected,
          pairsFromSplit(LshGuard.splitHotKnown(banded, rows, schema),
            idCol, shCol),
          () => { banded.unpersist(blocking = false); () })
      case None =>
        // pathological hot set past HotKeyCollectCap: the probing path
        // and its distributed split (the probe materializes the cache)
        val banded = bandKeys(sigs.select(col(idCol), col(shCol)), shCol,
          selected).persist()
        (selected,
          pairsFromSplit(LshGuard.splitHot(banded, maxBucket), idCol, shCol),
          () => { banded.unpersist(blocking = false); () })
    }
  }

  /** Banded candidate pairs at `w` bits per band with the
    * [[LshGuard]] hot-bucket cap — the SimHash counterpart of
    * `MinHashLsh.candidatePairs`, and the reason the fallback width is
    * safe to EXECUTE (not just price): a narrow fingerprint has at most
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
    // the cache, the two join sides then read cached blocks; the
    // unpersist lease drains at the harness between-queries point
    val banded = bandKeys(sigs.select(col(idCol), col(shCol)), shCol, w)
      .persist()
    PersistLeases.register(() => { banded.unpersist(blocking = false); () })
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

/** The original 16-bit family — every committed SimHash oracle
  * (q29/q60/q160/q176/q189) replays this construction. Since round 19
  * the family dedups per-doc shingles on the 16-bit hash (the oracles
  * on its hex-prefix bijection) — the q191 semantics, uniform across
  * widths.
  */
object SimHash extends SimHashFamily(16)

/** The 64-bit scale family (round-17): the width at which the
  * calibration contract — pick a FITTING config — stays satisfiable
  * past 5 M documents, where the 16-bit keyspace saturates (see the
  * class note). Same aggregation shape, same guard, same oracle
  * replayability (16 md5 nibbles → 64 conditional sums).
  */
object SimHash64 extends SimHashFamily(64)
