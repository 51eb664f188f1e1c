package graft.queries

/** Reference-format ETL queries (GFF3/OBO/VCF/TSV parsing pipelines
  * over committed fixtures). Populated alongside the `graft.etl`
  * package.
  */
object EtlQueries {
  val queries: Map[String, Q] = Map()
}
