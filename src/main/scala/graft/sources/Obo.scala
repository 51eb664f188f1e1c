package graft.sources

import scala.collection.mutable
import org.apache.spark.sql.{Dataset, SparkSession}

/** OBO ontology source (SURVEY.md §2.1 S6, §7.4): `[Term]`-delimited
  * multi-line stanzas. Stanzas span lines, so this is not a line-based
  * csv read; ontology files are small (≤ tens of MB), so we read the
  * text single-partition and run a pure, unit-testable stateful parser
  * in `mapPartitions`. Distribution happens downstream (closure,
  * joins), where the data actually fans out.
  *
  * Faithful to the reference parser (`import_ontology.py:192-268`):
  *  - a pending term is flushed when the next `[Term]` opens, and once
  *    more at EOF;
  *  - `is_obsolete: true` discards the collected term and skips lines
  *    until the next `[Term]` — but `is_a` edges seen *before* that
  *    line are already recorded (module-global dict in the reference);
  *  - non-`[Term]` stanzas (`[Typedef]`…) stop line processing without
  *    flushing, so the pending term survives until the next `[Term]`;
  *  - `namespace`/`def` optional → null.
  */
object Obo {

  /** One parser output: a completed term or one is_a edge. */
  final case class OboEvent(
      kind: String, // "term" | "isa"
      id: String,
      name: Option[String],
      namespace: Option[String],
      definition: Option[String],
      parent: Option[String]) // isa: the more general term

  /** Pure stanza parser over the file's lines, in order. */
  def parseLines(lines: Iterator[String]): Iterator[OboEvent] = {
    val out = mutable.ArrayBuffer.empty[OboEvent]
    var inTerm = false
    var cur = mutable.Map.empty[String, String]

    def flush(): Unit = {
      if (cur.nonEmpty) {
        out += OboEvent("term", cur("id"), cur.get("name"),
          cur.get("namespace"), cur.get("def"), None)
      }
      cur = mutable.Map.empty
    }

    for (raw <- lines; line = raw.trim if line.nonEmpty) {
      if (line.startsWith("[") && !line.startsWith("[Term]")) inTerm = false
      if (line.startsWith("[Term]")) { flush(); inTerm = true }
      if (inTerm) {
        if (line.startsWith("id: ")) cur("id") = line.stripPrefix("id: ")
        if (line.startsWith("name: ")) cur("name") = line.stripPrefix("name: ")
        if (line.startsWith("namespace: "))
          cur("namespace") = line.stripPrefix("namespace: ")
        if (line.startsWith("def: ")) cur("def") = line.stripPrefix("def: ")
        if (line.startsWith("is_a: "))
          out += OboEvent("isa", cur.getOrElse("id",
            sys.error(s"is_a before id in stanza: $line")),
            None, None, None, Some(line.split("\\s+")(1)))
        if (line.startsWith("is_obsolete: ") &&
            line.split("\\s+")(1).equalsIgnoreCase("true")) {
          cur = mutable.Map.empty // discard the collected term
          inTerm = false // skip until next [Term]
        }
      }
    }
    flush() // last stanza (reference `import_ontology.py:258-268`)
    out.iterator
  }

  def read(spark: SparkSession, path: String): Dataset[OboEvent] = {
    import spark.implicits._
    spark.read.textFile(path).coalesce(1).mapPartitions(parseLines)
  }
}
