package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Closure, Dedup}
import graft.sources.Obo

/** Ontology tables: OBO terms, GAF gene↔term mappings, and the
  * pre-materialized transitive closure (reference
  * `import_ontology.py:54-145,192-309,312-349`).
  *
  * Space-for-time design kept from the reference: the full
  * ancestor→descendant closure of the (union of all ontologies')
  * `is_a` DAG is computed once at load and persisted, so downstream
  * term-expansion is a single equi-join instead of a recursive query.
  * The closure itself runs as a distributed semi-naive fixpoint
  * (`graft.operators.Closure`) instead of the reference's in-heap
  * worklist — the one stage whose memory scales with |graph|².
  */
object OntologyEtl {

  final case class Result(terms: DataFrame, pairs: DataFrame, geneMap: DataFrame)

  /** @param oboPaths ontology files in load order (GO, MP, DO)
    * @param gafFiles (path, taxonId) in shell-script order — order
    *                 matters: gene_ontology_map's PK is NOT
    *                 taxon-qualified, so a later file's (gene, term)
    *                 overwrites an earlier species' row
    *                 (`import_ontology.py:181`, SURVEY.md §7.6.5)
    */
  def load(spark: SparkSession, oboPaths: Seq[String],
      gafFiles: Seq[(String, Int)]): Result = {
    // U4 — one term table + one is_a graph across all ontologies
    // (module-global dict in the reference, `import_ontology.py:54`).
    val events = oboPaths.map(Obo.read(spark, _)).reduce(_ union _).toDF().cache()

    val termsRaw = events.filter(col("kind") === "term")
      .select(col("id"), col("name"), col("namespace"),
        col("definition").as("def"))
    // Duplicate term id raises in the reference (`:222-224`) — D2.
    val terms = Dedup.assertNoDuplicateKeys(termsRaw, Seq("id"))

    // A1 — closure over general→specialized edges: `X is_a P` means
    // parent = P (general), child = X (specialized).
    val edges = events.filter(col("kind") === "isa")
      .select(col("parent"), col("id").as("child"))
    val closure = Closure.transitiveClosure(edges, "parent", "child")

    // A3 — deterministic emit order; relationship literal as stored.
    val pairs = closure
      .select(col("ancestor").as("parent"), col("descendant").as("child"),
        lit("is_a").as("relationship"))
      .orderBy("parent", "child")

    // A2 — distinct transitive descendant count; terms with no
    // descendants keep a NULL count (reference leaves them unset).
    val counts = Closure.descendantCounts(closure)
      .select(col("ancestor").as("id"), col("n_descendants").as("count"))
    val termsWithCount = terms.join(counts, Seq("id"), "left")

    // GAF mappings (S7/F2/F5/C8/D1).
    val geneMap =
      if (gafFiles.nonEmpty) loadGafs(spark, gafFiles)
      else spark.emptyDataFrame

    Result(termsWithCount, pairs, geneMap)
  }

  private val gafSchema = StructType(
    (0 until 17).map(i => StructField(s"c$i", StringType)))

  def loadGafs(spark: SparkSession, gafFiles: Seq[(String, Int)]): DataFrame = {
    val perFile = gafFiles.zipWithIndex.map { case ((path, taxon), fileIdx) =>
      spark.read
        .option("sep", "\t")
        .option("comment", "!")
        .schema(gafSchema)
        .csv(path)
        .withColumn("__ord", monotonically_increasing_id())
        .select(
          trim(col("c1")).as("gene_id"),
          trim(col("c4")).as("ontology_id"),
          // C8 — first taxon of `taxon:9606|taxon:1280`.
          element_at(
            split(regexp_replace(trim(col("c12")), "taxon:", ""), "\\|"), 1)
            .cast("int").as("taxonid"),
          (lit(fileIdx) * 1000000000000L + col("__ord")).as("__ord2"))
        .filter(col("taxonid") === taxon) // F5
    }
    val all = perFile.reduce(_ unionByName _)
    // D1 — INSERT OR REPLACE on (gene_id, ontology_id): last write in
    // cross-file shell order wins.
    Dedup.lastWins(all, Seq("gene_id", "ontology_id"), Seq(col("__ord2")),
      keep = all.columns.filterNot(_ == "__ord2").toSeq)
  }
}
