package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Distributed per-group running sum — the scale form of
  * `sum(value) OVER (PARTITION BY group ORDER BY keys)`.
  *
  * A plain window with a low-cardinality `PARTITION BY` executes as
  * ONE task per group: at 100 TB with ~20 sources that is 20 tasks
  * sorting 5 TB each. This operator generalizes the
  * [[GlobalRank]] pattern instead:
  *
  *   1. `repartitionByRange(group, keys...)` — each partition holds a
  *      contiguous slice of the (group, key) order; a large group
  *      spans MANY partitions, so no task sees more than ~1/n of any
  *      group.
  *   2. A lightweight per-partition job computes per-(partition,
  *      group) sums. Because partitions are contiguous ranges, each
  *      group occupies a contiguous partition run and the collected
  *      result is O(numPartitions + numGroups) — driver-safe for any
  *      row count.
  *   3. The driver prefix-sums those partials into per-(partition,
  *      group) start offsets, broadcast back.
  *   4. One streaming pass per partition adds `offset + local running
  *      sum` — no global sort on one task, no per-group task.
  *
  * Both jobs consume the SAME shuffled RDD value, so Spark reuses the
  * range shuffle's map output for the second job (the exchange stage
  * is skipped) — no `persist()` needed, hence no cache-leak and no
  * memory pressure from materializing the full input.
  *
  * Determinism: `sortCols` must extend to a total order within each
  * group (include a unique tiebreaker); the range partitioner sends
  * equal keys to one partition, so ties never split across partitions.
  *
  * WHEN TO USE WHICH — the window-vs-grouped-scan decision rule:
  * this operator exists for LOW-cardinality groups that each span
  * many partitions (sources, shards, languages): a window would
  * funnel each giant group through one task. With HIGH-cardinality
  * groups (per-user, per-doc) every group is small enough for one
  * task and a plain `sum(...) OVER (PARTITION BY g ORDER BY k)`
  * window is the right plan — and this operator's collected offset
  * table, O(partitions + groups), would grow with the group count.
  * The `maxOffsetEntries` guard enforces that contract at runtime
  * instead of letting the driver OOM silently.
  */
object GroupedPrefixSum {

  /** Ceiling on collected (partition, group) offset entries — ~100 MB
    * of driver heap at worst. Exceeding it means the group column is
    * high-cardinality and a plain window is the right plan (see the
    * decision rule above).
    */
  val DefaultMaxOffsetEntries: Int = 1000000

  /** Append a per-group running sum of `valueCol` (must be LongType;
    * nulls count as 0) ordered by `sortCols` within `groupCol`.
    *
    * @param inclusive true → `ROWS UNBOUNDED PRECEDING..CURRENT ROW`;
    *                  false → `..1 PRECEDING` (exclusive prefix)
    * @param maxOffsetEntries fail-fast bound on the collected offset
    *                  table (see [[DefaultMaxOffsetEntries]])
    */
  def withRunningSum(df: DataFrame, groupCol: String, sortCols: Seq[Column],
      valueCol: String, outCol: String, inclusive: Boolean = true,
      numPartitions: Option[Int] = None, preRanged: Boolean = false,
      maxOffsetEntries: Int = DefaultMaxOffsetEntries): DataFrame =
    withRunningScan(df, groupCol, sortCols, valueCol, outCol, inclusive,
      numPartitions, zero = 0L, op = _ + _, preRanged = preRanged,
      maxOffsetEntries = maxOffsetEntries)

  /** Append a per-group running MAX of `valueCol` — the scale form of
    * `max(value) OVER (PARTITION BY group ORDER BY keys ROWS ...)`.
    * Same machinery as the running sum: any commutative-enough monoid
    * works because per-partition partials combine associatively in
    * partition order. Exclusive-mode rows with no predecessor get the
    * identity `Long.MinValue` (callers treat it as "no previous" —
    * e.g. interval merge starts a new island there).
    */
  def withRunningMax(df: DataFrame, groupCol: String, sortCols: Seq[Column],
      valueCol: String, outCol: String, inclusive: Boolean = true,
      numPartitions: Option[Int] = None, preRanged: Boolean = false,
      maxOffsetEntries: Int = DefaultMaxOffsetEntries): DataFrame =
    withRunningScan(df, groupCol, sortCols, valueCol, outCol, inclusive,
      numPartitions, zero = Long.MinValue, op = math.max, preRanged = preRanged,
      maxOffsetEntries = maxOffsetEntries)

  /** Shared scan core: range-partition on (group, keys), per-partition
    * partials combined with `op` (must be associative with identity
    * `zero`; nulls read as `zero`), driver prefix-combine in partition
    * order, broadcast carry offsets, one streaming output pass.
    *
    * `preRanged = true` declares the input ALREADY range-partitioned
    * and sorted by (group, sortCols) — e.g. the output of a previous
    * scan over the same keys, possibly extended by narrow projections
    * — and skips the shuffle + sort entirely. Scans compose at one
    * shuffle total: merge-intervals runs prefix-max then prefix-sum
    * over a single range exchange. The caller owns the invariant; a
    * wrong claim silently mis-scans.
    */
  private def withRunningScan(df: DataFrame, groupCol: String,
      sortCols: Seq[Column], valueCol: String, outCol: String,
      inclusive: Boolean, numPartitions: Option[Int],
      zero: Long, op: (Long, Long) => Long,
      preRanged: Boolean = false,
      maxOffsetEntries: Int = DefaultMaxOffsetEntries): DataFrame = {
    val spark = df.sparkSession
    require(df.schema(valueCol).dataType == LongType,
      s"$valueCol must be LongType (cast upstream), got ${df.schema(valueCol).dataType}")
    val n = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val keys = col(groupCol) +: sortCols
    val ranged =
      if (preRanged) df
      else df.repartitionByRange(n, keys: _*).sortWithinPartitions(keys: _*)
    // One RDD value shared by both jobs → the range shuffle is written
    // once and its stage skipped on the second job.
    val rangedRdd = ranged.rdd
    val gIdx = ranged.schema.fieldIndex(groupCol)
    val vIdx = ranged.schema.fieldIndex(valueCol)

    // Job 1: per-(partition, group) sums. Groups arrive contiguously
    // (partition is sorted by (group, keys)), so a single run-length
    // pass suffices.
    val partSums: Array[(Int, Array[(Any, Long)])] =
      rangedRdd.mapPartitionsWithIndex { case (p, it) =>
        val acc = mutable.ArrayBuffer.empty[(Any, Long)]
        var cur: Any = null
        var sum = zero
        var seen = false
        it.foreach { row =>
          val g = row.get(gIdx)
          if (!seen) { cur = g; seen = true }
          else if (g != cur) {
            acc += ((cur, sum)); cur = g; sum = zero
            // Executor-side fail-fast: a partition already holding more
            // runs than the whole table is allowed means the group
            // column is high-cardinality — abort before shipping the
            // partials anywhere near the driver.
            if (acc.length > maxOffsetEntries)
              throw new IllegalStateException(
                s"GroupedPrefixSum: partition $p alone exceeds " +
                  s"maxOffsetEntries=$maxOffsetEntries distinct '$groupCol' " +
                  "runs; the group column is high-cardinality — use a plain " +
                  s"window (sum OVER (PARTITION BY $groupCol ORDER BY ...)) " +
                  "instead, or raise maxOffsetEntries if driver heap allows")
          }
          sum = op(sum, if (row.isNullAt(vIdx)) zero else row.getLong(vIdx))
        }
        if (seen) acc += ((cur, sum))
        Iterator((p, acc.toArray))
      }.collect()
    // Driver-side total: partitions are individually bounded above but
    // their SUM is what lands in the offset map.
    val totalEntries = partSums.iterator.map(_._2.length.toLong).sum
    if (totalEntries > maxOffsetEntries)
      throw new IllegalStateException(
        s"GroupedPrefixSum: collected offset table has $totalEntries " +
          s"(partition, $groupCol) entries > maxOffsetEntries=$maxOffsetEntries; " +
          "the group column is high-cardinality — use a plain window " +
          s"(sum OVER (PARTITION BY $groupCol ORDER BY ...)) instead, or " +
          "raise maxOffsetEntries if driver heap allows")

    // Driver: prefix-combine partials in partition order → start
    // offset of each (partition, group).
    val cumByGroup = mutable.HashMap.empty[Any, Long]
    val offsets = mutable.HashMap.empty[(Int, Any), Long]
    partSums.sortBy(_._1).foreach { case (p, gs) =>
      gs.foreach { case (g, s) =>
        val before = cumByGroup.getOrElse(g, zero)
        offsets((p, g)) = before
        cumByGroup(g) = op(before, s)
      }
    }
    val bc = spark.sparkContext.broadcast(offsets.toMap)

    // Job 2: streaming pass, shuffle output reused.
    val outSchema: StructType = ranged.schema.add(outCol, LongType, nullable = false)
    val out = rangedRdd.mapPartitionsWithIndex { case (p, it) =>
      val off = bc.value
      var cur: Any = null
      var seen = false
      var acc = zero
      it.map { row =>
        val g = row.get(gIdx)
        if (!seen || g != cur) {
          cur = g; seen = true
          acc = off.getOrElse((p, g), zero)
        }
        val v = if (row.isNullAt(vIdx)) zero else row.getLong(vIdx)
        val res =
          if (inclusive) { acc = op(acc, v); acc }
          else { val b = acc; acc = op(acc, v); b }
        Row.fromSeq(row.toSeq :+ res)
      }
    }
    spark.createDataFrame(out, outSchema)
  }
}

/** Distributed per-group top-k with exact rank — the scale form of
  * `row_number() OVER (PARTITION BY group ORDER BY keys) <= k`.
  *
  * The window form fully sorts each group in ONE task to keep k rows.
  * This operator is the grouped analogue of Spark's own
  * `TakeOrderedAndProject` (the q67 pattern):
  *
  *   1. Narrow phase — each input partition keeps at most k rows per
  *      group via a bounded heap; no shuffle, output ≤ k × partitions
  *      per group. The global top-k rows of a group are necessarily
  *      within their own partition's top-k, so no candidate is lost.
  *   2. Merge phase — one hash aggregation per group:
  *      `array_sort(collect_list(struct(keys, row)))` truncated to k
  *      by `slice`, then `posexplode` assigns rank 1..k. The sort is
  *      an in-memory array sort over ≤ k × partitions candidates —
  *      never a partition-wide SortExec keyed on the group column.
  *
  * Sort-key columns must be of `Comparable` external types (string,
  * numeric, date/timestamp); ordering matches Spark's ascending
  * NULLS FIRST.
  *
  * Intended for SMALL k (samples, leaderboards): the merge phase
  * holds ≤ k × inputPartitions candidate rows per group in one
  * aggregation buffer. For per-group selections where k is a large
  * fraction of the group, use [[GroupedPrefixSum]] over a rank
  * instead — or a plain window if the group is high-cardinality.
  */
object GroupedTopK {

  def withRowNumber(df: DataFrame, groupCol: String, sortCols: Seq[Column],
      k: Int, rankCol: String = "rk"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    val dataCols = df.columns.toSeq
    val skNames = sortCols.indices.map(i => s"__sk$i")
    val prep = df.select(
      dataCols.map(col) ++ sortCols.zip(skNames).map { case (c, nm) => c.as(nm) }: _*)
    val gIdx = prep.schema.fieldIndex(groupCol)
    val skIdxs = skNames.map(prep.schema.fieldIndex).toArray

    // Ascending NULLS FIRST over the materialized sort-key columns.
    val ordAsc: Ordering[Row] = new Ordering[Row] with Serializable {
      def compare(x: Row, y: Row): Int = {
        var i = 0
        while (i < skIdxs.length) {
          val a = x.get(skIdxs(i))
          val b = y.get(skIdxs(i))
          val c =
            if (a == null && b == null) 0
            else if (a == null) -1
            else if (b == null) 1
            else a.asInstanceOf[Comparable[Any]].compareTo(b)
          if (c != 0) return c
          i += 1
        }
        0
      }
    }

    // Phase 1: bounded per-partition heaps — max-heap of size k keeps
    // the k smallest rows per group seen in this partition.
    val pruned = prep.rdd.mapPartitions { it =>
      val heaps = mutable.HashMap.empty[Any, mutable.PriorityQueue[Row]]
      it.foreach { row =>
        val h = heaps.getOrElseUpdate(row.get(gIdx),
          mutable.PriorityQueue.empty[Row](ordAsc))
        if (h.size < k) h.enqueue(row)
        else if (ordAsc.lt(row, h.head)) { h.dequeue(); h.enqueue(row) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
    val cand = spark.createDataFrame(pruned, prep.schema)

    // Phase 2: exact merge inside one hash aggregation. Struct field
    // order puts the sort keys first, so array_sort's struct ordering
    // IS the requested ordering (dataCols break any remaining ties
    // deterministically, but sortCols should already be total).
    val payload = struct((skNames ++ dataCols).map(col): _*)
    cand.groupBy(col(groupCol).as("__g"))
      .agg(slice(array_sort(collect_list(payload)), 1, k).as("__top"))
      .select(posexplode(col("__top")).as(Seq("__pos", "__row")))
      .select(dataCols.map(c => col(s"__row.$c").as(c)) :+
        (col("__pos") + 1).cast("long").as(rankCol): _*)
  }
}
