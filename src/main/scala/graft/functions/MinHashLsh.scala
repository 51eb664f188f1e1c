package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection.
  *
  * Hash family: h_i(shingle) = md5(i || "|" || shingle), compared as a
  * *string* — MinHash only needs a total order on hash values, and the
  * lexicographic order on hex digests is one, portable across engines
  * with zero integer-conversion trickery. Signature component i is the
  * min digest over the document's distinct shingles.
  *
  * LSH: the k signature components are cut into `bands` groups of
  * k/bands rows; band key = md5 of the concatenated components.
  * Documents sharing any band key become candidate pairs. The band
  * join is a pure equi-join on (band index, band key) — at 100 TB this
  * is one shuffle on a short string key, with near-duplicate clusters
  * appearing as key-skew that AQE's skew-join splitting handles.
  */
object MinHashLsh {

  def minhashComponent(shingle: Column, i: Int): Column =
    md5(concat(lit(s"$i|"), shingle))

  /** Per-document MinHash signature.
    * @param shingles (idCol, shingleCol) rows, duplicates allowed
    * @return one row per id: idCol, s0..s{k-1}
    */
  def signatures(shingles: DataFrame, idCol: String, shingleCol: String, k: Int): DataFrame = {
    val aggs = (0 until k).map(i =>
      min(minhashComponent(col(shingleCol), i)).as(s"s$i"))
    shingles.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Candidate near-duplicate pairs from banded signatures.
    * @return (a, b, est) with a < b; `est` = fraction of equal
    *         signature components (MinHash Jaccard estimate).
    */
  def candidatePairs(sigs: DataFrame, idCol: String, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val r = k / bands
    val bandKeys = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat((b * r until (b + 1) * r).map(i => col(s"s$i")): _*)).as("key"))
    }
    val bandedCols = Seq(col(idCol), col("__bk.band").as("band"),
      col("__bk.key").as("key")) ++ (0 until k).map(i => col(s"s$i"))
    // Persist before the self-join: both join sides reference this
    // subplan, and without materialization the whole shingle→minhash
    // pipeline would execute twice (signatures are the expensive part
    // — k md5 aggregations over every shingle).
    val banded = sigs
      .withColumn("__bk", explode(array(bandKeys: _*)))
      .select(bandedCols: _*)
      .persist()
    val l = banded.as("l")
    val rj = banded.as("r")
    val matches = (0 until k)
      .map(i => when(col(s"l.s$i") === col(s"r.s$i"), 1).otherwise(0))
      .reduce(_ + _)
    l.join(rj,
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("a"), col(s"r.$idCol").as("b"),
        round(matches / lit(k.toDouble), 4).as("est"))
      .distinct()
  }
}
