package graft.sources

import java.util
import scala.collection.JavaConverters._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for GFF3: `spark.read.format("gff3")
  * .load(path)` — the Spark-native packaging of the reference's main
  * input format (SURVEY.md §2.1 S1/S2).
  *
  * Typed 9-column schema (positions Long, score Double), `#`-comment
  * and blank-line skip, `.`→NULL per the GFF3 spec, gzip-transparent
  * per file (reference `flex_open.py:10-20`, S8). Column pruning and
  * equality/IN filter pushdown on the string columns reach the parser
  * (pruned fields are never materialized; filtered rows never build an
  * InternalRow) — `.explain` shows the pruned ReadSchema and
  * PushedFilters like any native source.
  *
  * Partitioning: one input split per file. GFF3 ships as per-species
  * files of O(10-100 MB) — file-level parallelism matches the data;
  * byte-range splitting (Hadoop line-boundary alignment) is the
  * obvious extension if single multi-GB files ever appear.
  */
class Gff3DataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "gff3"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Gff3DataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new Gff3Table(properties.asScala.toMap)
}

object Gff3DataSource {
  val schema: StructType = StructType(Seq(
    StructField("seqid", StringType),
    StructField("source", StringType),
    StructField("type", StringType),
    StructField("start", LongType),
    StructField("end", LongType),
    StructField("score", DoubleType),
    StructField("strand", StringType),
    StructField("phase", IntegerType),
    StructField("attributes", StringType)))

  private[sources] def resolvePaths(options: Map[String, String]): Seq[String] = {
    val spark = SparkSession.active
    val raw = options.get("path").toSeq ++
      options.get("paths").toSeq.flatMap(_.split(","))
    raw.flatMap { p =>
      val hPath = new Path(p)
      val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val stats = fs.globStatus(hPath)
      if (stats == null || stats.isEmpty) Seq(p)
      else stats.toSeq.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq
          .filter(_.isFile).map(_.getPath.toString)
        else Seq(st.getPath.toString)
      }
    }
  }
}

private class Gff3Table(options: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"gff3(${options.getOrElse("path", "?")})"
  override def schema(): StructType = Gff3DataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new Gff3ScanBuilder(options)
}

private class Gff3ScanBuilder(options: Map[String, String])
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = Gff3DataSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept equality/IN on the directly-parsed string columns; Spark
    * re-evaluates everything we leave in the returned (unsupported)
    * array, so pushing is purely an optimization.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val stringCols = Set("seqid", "source", "type", "strand")
    val (sup, unsup) = filters.partition {
      case EqualTo(a, _: String) => stringCols(a)
      case In(a, vs) => stringCols(a) && vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    pushed = sup
    unsup
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new Gff3Scan(Gff3DataSource.resolvePaths(options), required, pushed)
}

private class Gff3Scan(paths: Seq[String], required: StructType,
    filters: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"gff3 PushedFilters: ${filters.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.catalogString}"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => Gff3InputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new Gff3ReaderFactory(required, filters)
}

private case class Gff3InputPartition(path: String) extends InputPartition

private class Gff3ReaderFactory(required: StructType, filters: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new Gff3PartitionReader(
      partition.asInstanceOf[Gff3InputPartition].path, required, filters)
}

private class Gff3PartitionReader(path: String, required: StructType,
    filters: Array[Filter]) extends PartitionReader[InternalRow] {

  private val stream = {
    val hPath = new Path(path)
    // Executor-side Hadoop conf: default FS resolution is enough here
    // (paths arrive fully qualified from the driver's glob expansion).
    val fs = hPath.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val raw = fs.open(hPath)
    // S8 gzip transparency, by suffix like the reference's flex_open
    if (path.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw) else raw
  }
  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(stream, "UTF-8"))

  private val colIndex: Map[String, Int] =
    Gff3DataSource.schema.fieldNames.zipWithIndex.toMap
  private val outIndexes: Array[Int] =
    required.fieldNames.map(colIndex)

  private def rowPasses(cols: Array[String]): Boolean =
    filters.forall {
      case EqualTo(a, v: String) => cols(colIndex(a)) == v
      case In(a, vs) => vs.exists(_ == cols(colIndex(a)))
      case _ => true
    }

  private var current: InternalRow = _

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null) {
      if (line.nonEmpty && line.charAt(0) != '#' && line.trim.nonEmpty) {
        val cols = line.split("\t", -1)
        if (cols.length >= 9 && rowPasses(cols)) {
          current = project(cols)
          return true
        }
      }
      line = reader.readLine()
    }
    false
  }

  private def project(cols: Array[String]): InternalRow = {
    val row = new GenericInternalRow(outIndexes.length)
    var i = 0
    while (i < outIndexes.length) {
      val src = outIndexes(i)
      val v = cols(src)
      if (v == "." || v.isEmpty) row.setNullAt(i)
      else src match {
        case 3 | 4 => row.setLong(i, v.toLong) // start, end
        case 5 => row.setDouble(i, v.toDouble) // score
        case 7 => row.setInt(i, v.toInt) // phase
        case _ => row.update(i, UTF8String.fromString(v))
      }
      i += 1
    }
    row
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
