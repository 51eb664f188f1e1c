package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) overlap join — the browser query the reference's
  * index set is built for (SURVEY.md §1.4, §2.10: gene-in-block
  * containment, SNP-in-gene, band overlap; e.g. the
  * `gene(gene_taxonid, gene_chr, gene_start_pos/end_pos)` indexes at
  * `import_genes_exons.py:58-61`).
  *
  * Two physical strategies:
  *
  *  - `naive`: equi-join on the partition keys (taxon, chr, …) with the
  *    overlap predicate as a residual filter. Catalyst plans a shuffled
  *    hash join on the keys; fine when per-key cardinality is modest.
  *
  *  - `binned`: the scale path. Both sides explode their interval into
  *    fixed-width bins, the join becomes a pure equi-join on
  *    (keys, bin) — hash-partitionable, AQE-skew-splittable — and the
  *    exact overlap predicate filters bin collisions. A matched pair
  *    would appear once per shared bin, so we keep only the bin that
  *    contains the overlap start: dedup *by construction*, no
  *    `distinct()` shuffle. Per-row cost is O(interval_len / binWidth),
  *    so pick binWidth ≈ median interval length.
  */
object IntervalJoin {

  /** Equi-key + residual-range join. `leftDf`/`rightDf` must have
    * disjoint column names apart from `keys`.
    */
  def naive(
      leftDf: DataFrame,
      rightDf: DataFrame,
      keys: Seq[String],
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      extraCondition: Column = lit(true)): DataFrame = {
    val overlap = col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd)
    if (keys.isEmpty) leftDf.join(rightDf, overlap && extraCondition)
    else leftDf.join(rightDf, keys).filter(overlap && extraCondition)
  }

  /** Bin-exploded equi-join; result set identical to `naive`. */
  def binned(
      leftDf: DataFrame,
      rightDf: DataFrame,
      keys: Seq[String],
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      binWidth: Long,
      extraCondition: Column = lit(true)): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def explodeBins(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn(
        "__bin",
        explode(sequence(
          floor(col(s) / binWidth).cast("long"),
          floor(greatest(col(e), col(s)) / binWidth).cast("long"))))
    val lb = explodeBins(leftDf, lStart, lEnd)
    val rb = explodeBins(rightDf, rStart, rEnd).withColumnRenamed("__bin", "__rbin")
    val joinKeys = keys.foldLeft(col("__bin") === col("__rbin")) {
      case (acc, k) => acc && lb(k) === rb(k)
    }
    val overlap = col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd)
    val anchorBin = col("__bin") === floor(greatest(col(lStart), col(rStart)) / binWidth).cast("long")
    val rightCols = rightDf.columns.filterNot(keys.contains).map(rb(_))
    val leftCols = leftDf.columns.map(lb(_))
    lb.join(rb, joinKeys)
      .filter(overlap && anchorBin && extraCondition)
      .select((leftCols ++ rightCols).toSeq: _*)
  }

  /** `binned` with a per-row bin-count cap: the adversarial-scale
    * guard. `binned`'s per-row cost is O(interval_len / binWidth) — a
    * single interval spanning a whole chromosome explodes into
    * thousands of bin rows and its bin keys all collide with every
    * overlapping row's. Here rows wider than `maxBinsPerRow` bins
    * (outliers by construction: binWidth targets the MEDIAN length)
    * are pulled out of the bin explosion and joined by the residual
    * `naive` strategy instead, where the outlier side is small enough
    * to broadcast. The three branches partition the pair space —
    * (short×short) binned, (long×all) residual, (short×long)
    * residual — so the union equals `naive` exactly, each pair
    * produced once.
    */
  def binnedCapped(
      leftDf: DataFrame,
      rightDf: DataFrame,
      keys: Seq[String],
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      binWidth: Long,
      maxBinsPerRow: Long = 1024,
      extraCondition: Column = lit(true)): DataFrame = {
    require(maxBinsPerRow > 0, "maxBinsPerRow must be positive")
    def nBins(s: String, e: String): Column =
      floor(greatest(col(e), col(s)) / binWidth).cast("long") -
        floor(col(s) / binWidth).cast("long") + lit(1L)
    val lShort = leftDf.filter(nBins(lStart, lEnd) <= maxBinsPerRow)
    val lLong = leftDf.filter(nBins(lStart, lEnd) > maxBinsPerRow)
    val rShort = rightDf.filter(nBins(rStart, rEnd) <= maxBinsPerRow)
    val rLong = rightDf.filter(nBins(rStart, rEnd) > maxBinsPerRow)
    binned(lShort, rShort, keys, lStart, lEnd, rStart, rEnd, binWidth,
        extraCondition)
      .unionByName(naive(lLong, rightDf, keys, lStart, lEnd, rStart, rEnd,
        extraCondition))
      .unionByName(naive(lShort, rLong, keys, lStart, lEnd, rStart, rEnd,
        extraCondition))
  }
}
