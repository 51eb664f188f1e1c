package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.EtlOptions

/** Pipeline orchestrator — the Spark replacement for the reference's
  * 13-process shell DAG (`create_database.sh:16-53`, SURVEY.md §3.1).
  *
  * One SparkSession, one driver program. The reference's
  * create-then-append per table family becomes a `union` of
  * per-species DataFrames written once; the only hard ordering kept is
  * the one that is semantically observable — GAF file order feeds the
  * cross-file last-wins upsert of `gene_ontology_map` (§7.6.5).
  * Families are independent pipelines (the SQLite file serialized them
  * in the reference; here they can run concurrently).
  *
  * Sink (S9): each table lands as Parquet. Positional tables partition
  * by taxon and sort within partitions on (chr, start) — the physical
  * replacement for the reference's 18 B-tree indexes (§1.4): partition
  * pruning serves the per-species lookups, parquet min/max row-group
  * stats serve the (chr, start) range scans.
  */
object Pipeline {

  final case class SpeciesFile(path: String, taxonId: Int)
  final case class Inputs(
      genes: Seq[SpeciesFile] = Nil,
      blocks: Seq[String] = Nil,
      cytobands: Seq[SpeciesFile] = Nil,
      features: Seq[SpeciesFile] = Nil,
      variants: Seq[SpeciesFile] = Nil,
      obo: Seq[String] = Nil,
      gaf: Seq[(String, Int)] = Nil,
      homologs: Seq[String] = Nil)

  /** Run every family; returns the ten tables by name. */
  def run(spark: SparkSession, in: Inputs,
      opts: EtlOptions = EtlOptions()): Map[String, DataFrame] = {
    val geneResults = in.genes.map(f => GenesExonsEtl.load(spark, f.path, f.taxonId))
    val genes = geneResults.map(_.genes).reduceOption(_ unionByName _)
    val exons = geneResults.map(_.exons).reduceOption(_ unionByName _)
    val blocks = in.blocks.map(SyntenyBlocksEtl.load(spark, _, opts))
      .reduceOption(_ unionByName _)
    val bands = in.cytobands.map(f => CytoBandEtl.load(spark, f.path, f.taxonId))
      .reduceOption(_ unionByName _)
    val features = in.features.map(f => FeaturesEtl.load(spark, f.path, f.taxonId, opts))
      .reduceOption(_ unionByName _)
    val variants = in.variants.map(f => VariantsEtl.load(spark, f.path, f.taxonId))
      .reduceOption(_ unionByName _)
    val ontology =
      if (in.obo.nonEmpty) Some(OntologyEtl.load(spark, in.obo, in.gaf)) else None
    val homologs = in.homologs.map(HomologsEtl.load(spark, _).homologs)
      .reduceOption(_ unionByName _)

    (genes.map("gene" -> _) ++
      exons.map("exon" -> _) ++
      blocks.map("syntenic_block" -> _) ++
      bands.map("cytogenetic_band" -> _) ++
      features.map("feature" -> _) ++
      variants.map("snp_variant" -> _) ++
      ontology.map("on_terms" -> _.terms) ++
      ontology.map("on_pairs" -> _.pairs) ++
      // no GAF inputs → no gene_ontology_map table (a zero-column
      // frame is unwritable by any sink)
      ontology.filter(_ => in.gaf.nonEmpty).map("gene_ontology_map" -> _.geneMap) ++
      homologs.map("homolog" -> _)).toMap
  }

  /** Scale-oriented physical layout per table: (partition column,
    * in-partition sort). Mirrors the reference's index set (§1.4).
    */
  private val layout: Map[String, (Option[String], Seq[String])] = Map(
    "gene" -> (Some("gene_taxonid"), Seq("gene_chr", "gene_start_pos")),
    // mirrors index exon(parent_gene, exon_start_pos)
    // (reference import_genes_exons.py:76): ordered exon-of-gene
    // retrieval skips row groups on the parent_gene min/max stats
    "exon" -> (Some("taxonid"), Seq("parent_gene", "exon_start_pos")),
    "feature" -> (Some("taxon_id"), Seq("type", "name")),
    "cytogenetic_band" -> (Some("taxon_id"), Seq("chr", "start")),
    "snp_variant" -> (Some("taxon_id"), Seq("chr", "pos")),
    "syntenic_block" -> (Some("ref_taxonid"), Seq("ref_chr", "ref_start_pos")),
    "homolog" -> (Some("ref_taxon_id"), Seq("ref_gene_id")),
    "on_terms" -> (None, Seq("id")),
    "on_pairs" -> (None, Seq("parent", "child")),
    "gene_ontology_map" -> (None, Seq("ontology_id", "gene_id")))

  /** @param dynamicPartitionOverwrite when true, an overwrite replaces
    *        only the taxon partitions present in the incoming frame
    *        (Spark's dynamic partitionOverwriteMode) — the per-species
    *        reload the reference does by re-running one loader, without
    *        rewriting every other species' data. Default (static)
    *        overwrites the whole table.
    */
  def write(tables: Map[String, DataFrame], outDir: String,
      dynamicPartitionOverwrite: Boolean = false): Unit =
    tables.foreach { case (name, df) =>
      writeOne(name, df, outDir, dynamicPartitionOverwrite)
    }

  private def writeOne(name: String, df: DataFrame, outDir: String,
      dynamicPartitionOverwrite: Boolean): Unit = {
    val (partCol, sortCols) = layout.getOrElse(name, (None, Nil))
    val writer = partCol match {
      case Some(p) =>
        df.repartition(col(p))
          .sortWithinPartitions(sortCols.map(col): _*)
          .write.partitionBy(p)
          .option("partitionOverwriteMode",
            if (dynamicPartitionOverwrite) "dynamic" else "static")
      case None =>
        df.sortWithinPartitions(sortCols.map(col): _*).write
    }
    writer.mode("overwrite").parquet(s"$outDir/$name")
  }

  /** `write` with in-flight record accounting (SURVEY A4): each
    * table's written-row count rides the write job itself through
    * `Dataset.observe` — the Spark-native form of the reference's
    * loader counters, with NO second pass over the data (a `count()`
    * after the fact would re-read every table; at 100 TB that doubles
    * the job). Returns rows written per table.
    */
  def writeObserved(tables: Map[String, DataFrame], outDir: String,
      dynamicPartitionOverwrite: Boolean = false): Map[String, Long] =
    tables.map { case (name, df) =>
      val obs = org.apache.spark.sql.Observation(s"graft_write_$name")
      writeOne(name, df.observe(obs, count(lit(1)).as("rows")),
        outDir, dynamicPartitionOverwrite)
      name -> obs.get("rows").asInstanceOf[Long]
    }

  /** S9 parity sink: every table through Spark's JDBC writer — the
    * drop-in replacement for the reference's single SQLite `.db`
    * deliverable (`create_database.sh:9`). Works with any JDBC driver
    * on the classpath (SQLite via sqlite-jdbc when present; Derby
    * embedded ships with Spark and is what CliSpec round-trips).
    *
    * Embedded single-file engines are single-writer, so each table is
    * coalesced to one partition by default — this sink is a
    * small-deliverable parity convenience; the scale path is the
    * partitioned/sorted parquet layout in `write`. Pass
    * `singleWriter = false` for a server-grade target (Postgres etc.)
    * to keep parallel partition writes.
    */
  def writeJdbc(tables: Map[String, DataFrame], url: String,
      singleWriter: Boolean = true,
      properties: java.util.Properties = new java.util.Properties()): Unit =
    tables.foreach { case (name, df) =>
      val out = if (singleWriter) df.coalesce(1) else df
      out.write.mode("overwrite").jdbc(url, name, properties)
    }
}
