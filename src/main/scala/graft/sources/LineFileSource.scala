package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared scan machinery for the tab-separated genomics formats
  * (GFF3, VCF): per-file input splits, comment/blank skip, `.`→NULL,
  * gzip transparency by suffix, schema-driven typed projection with
  * column pruning, and equality/IN row filters applied before any
  * InternalRow is allocated.
  */
private[sources] object LineFileSource {

  /** Filters acceptable for pre-projection evaluation: equality/IN on
    * string columns of the format schema.
    */
  def splitFilters(filters: Array[Filter], schema: StructType): (Array[Filter], Array[Filter]) = {
    val stringCols = schema.fields
      .filter(_.dataType == StringType).map(_.name).toSet
    filters.partition {
      case EqualTo(a, _: String) => stringCols(a)
      case In(a, vs) => stringCols(a) && vs.forall(_.isInstanceOf[String])
      case _ => false
    }
  }
}

private[sources] class LineFileScan(
    paths: Seq[String],
    fullSchema: StructType,
    required: StructType,
    filters: Array[Filter],
    commentPrefix: Char,
    formatName: String) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"$formatName PushedFilters: ${filters.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.catalogString}"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => LineFilePartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new LineFileReaderFactory(fullSchema, required, filters, commentPrefix)
}

private[sources] case class LineFilePartition(path: String) extends InputPartition

private[sources] class LineFileReaderFactory(
    fullSchema: StructType, required: StructType,
    filters: Array[Filter], commentPrefix: Char)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new LineFileReader(partition.asInstanceOf[LineFilePartition].path,
      fullSchema, required, filters, commentPrefix)
}

private[sources] class LineFileReader(
    path: String, fullSchema: StructType, required: StructType,
    filters: Array[Filter], commentPrefix: Char)
    extends PartitionReader[InternalRow] {

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
    fullSchema.fieldNames.zipWithIndex.toMap
  private val outIndexes: Array[Int] = required.fieldNames.map(colIndex)
  private val outTypes: Array[DataType] =
    required.fieldNames.map(n => fullSchema(n).dataType)

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
      if (line.nonEmpty && line.charAt(0) != commentPrefix && line.trim.nonEmpty) {
        val cols = line.split("\t", -1)
        if (cols.length >= fullSchema.size && rowPasses(cols)) {
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
      val v = cols(outIndexes(i))
      if (v == "." || v.isEmpty) row.setNullAt(i)
      else outTypes(i) match {
        case LongType => row.setLong(i, v.toLong)
        case DoubleType => row.setDouble(i, v.toDouble)
        case IntegerType => row.setInt(i, v.toInt)
        case _ => row.update(i, UTF8String.fromString(v))
      }
      i += 1
    }
    row
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
