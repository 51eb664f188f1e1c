package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.EtlOptions
import graft.operators.Dedup

/** Syntenic-block table from positional 10-column TSV (reference
  * `import_synteny_blocks.py:60-120`).
  *
  * Input columns: ref_chr ref_taxonid ref_start ref_end comp_chr
  * comp_taxonid comp_start comp_end orientation(+/−) ID=SynBlockNNN.
  *
  * Semantics:
  *  - V1/V2: any row with ≠10 fields or a block id not starting
  *    `ID=SynBlock` aborts the whole load (`:63-70`);
  *  - C3: same_orientation = (orientation == "+") (`:95`);
  *  - C4: symbol = block id minus the `ID=` prefix (`:101`);
  *  - U1: every row lands twice — forward, then ref↔comp swapped
  *    (`:100-115`);
  *  - D1: `INSERT OR REPLACE` on PK (ref_taxonid, comp_taxonid,
  *    ref_chr, ref_start_pos) — last write in file order wins, with
  *    the swapped copy ordered after its forward twin;
  *  - D4 (`strictSqliteCompat`): the reference's UNIQUE index on
  *    (ref_taxonid, comp_taxonid, ref_chr) additionally collapses to
  *    one block per chromosome pair (`:58-59`) — almost certainly a
  *    bug, reproduced only behind the flag.
  */
object SyntenyBlocksEtl {

  def load(spark: SparkSession, path: String,
      opts: EtlOptions = EtlOptions()): DataFrame = {
    val lines = spark.read.textFile(path)
      .withColumn("__ord", monotonically_increasing_id())
      .filter(length(trim(col("value"))) > 0) // F3 empty-row skip
      .withColumn("f", split(col("value"), "\t", -1))

    // V1/V2 validation — abort the load on any malformed row.
    val bad = lines
      .filter(size(col("f")) =!= 10 || !col("f")(9).startsWith("ID=SynBlock"))
      .limit(3).collect()
    require(bad.isEmpty,
      s"syntenic block validation failed (arity/id): ${bad.mkString("; ")}")

    def block(rT: Int, rC: Int, rS: Int, rE: Int, cT: Int, cC: Int, cS: Int,
        cE: Int, dir: Int) =
      lines.select(
        col("f")(rT).cast("int").as("ref_taxonid"),
        col("f")(rC).as("ref_chr"),
        col("f")(rS).cast("long").as("ref_start_pos"),
        col("f")(rE).cast("long").as("ref_end_pos"),
        col("f")(cT).cast("int").as("comp_taxonid"),
        col("f")(cC).as("comp_chr"),
        col("f")(cS).cast("long").as("comp_start_pos"),
        col("f")(cE).cast("long").as("comp_end_pos"),
        (col("f")(8) === "+").as("same_orientation"),
        substring(col("f")(9), 4, Int.MaxValue).as("symbol"),
        (col("__ord") * 2 + dir).as("__ord2"))

    val forward = block(1, 0, 2, 3, 5, 4, 6, 7, dir = 0)
    val reverse = block(5, 4, 6, 7, 1, 0, 2, 3, dir = 1)
    val both = forward.unionByName(reverse)

    // The last dedup of the chain drops __ord2 from both the packed
    // struct and the output (r22 keep projection) — it is only an
    // ordering input, never a consumed column.
    val dataCols = both.columns.filterNot(_ == "__ord2").toSeq
    if (opts.strictSqliteCompat)
      Dedup.lastWins(
        Dedup.lastWins(both,
          keys = Seq("ref_taxonid", "comp_taxonid", "ref_chr", "ref_start_pos"),
          ord = Seq(col("__ord2"))),
        keys = Seq("ref_taxonid", "comp_taxonid", "ref_chr"),
        ord = Seq(col("__ord2")), keep = dataCols)
    else
      Dedup.lastWins(both,
        keys = Seq("ref_taxonid", "comp_taxonid", "ref_chr", "ref_start_pos"),
        ord = Seq(col("__ord2")), keep = dataCols)
  }
}
