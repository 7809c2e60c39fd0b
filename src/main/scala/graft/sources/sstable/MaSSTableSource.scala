package graft.sources.sstable

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for the minimal "ma" SSTable subset decoded by
  * [[MaFormat]] — `spark.read.format("graft.sources.sstable.MaSSTableSource")`.
  *
  * Options:
  *  - `path`: file or directory of `*-Data.db` files
  *  - `columns`: the regular-column schema, e.g. `"click:text,count:long"`
  *    (the reference reads this from table metadata, SSTableSchema.cpp)
  *  - `clustering`: clustering-key column TYPES in schema order, e.g.
  *    `"text,int32"` — values are parsed and skipped per row exactly as
  *    the reference does (SSTable.cpp:487 read_clustering_columns);
  *    required for any table with clustering keys
  *  - `staticColumns`: the static-row column schema (same shape as
  *    `columns`); required if the table has static columns
  *  - `minTimestamp`, `minTtl`: the Statistics.db delta-encoding bases
  *
  * Scale shape: each Data.db file is one InputPartition (SSTables are
  * independently streamable); a production source would additionally
  * split large files at Index.db partition boundaries and push the
  * token-range filter into the Summary seek — the resume-scan queries
  * model that pruning on the relational side. Column pruning IS pushed
  * down (SupportsPushDownRequiredColumns): a pruned-away value column
  * still has to be skipped byte-wise (the format is a stream), but
  * pruned rows never materialize into InternalRow fields.
  */
class MaSSTableSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MaSSTableSource.OutputSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MaTable(properties.asScala.toMap)
}

object MaSSTableSource {
  /** The cell-bag schema every Data.db decodes to — the engine's KV
    * operators (graft.kv.Kv) consume exactly this shape. */
  val OutputSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("col", StringType, nullable = true), // null for markers
    StructField("ts", LongType, nullable = false),
    StructField("value", BinaryType, nullable = true),
    StructField("deleted", BooleanType, nullable = false),
    StructField("expiring", BooleanType, nullable = false),
    StructField("ttl_s", LongType, nullable = true),
    StructField("deletion_ts", LongType, nullable = true),
    StructField("marker", BooleanType, nullable = false),
    StructField("counter", BooleanType, nullable = false)))

  /** SSTable format version from the file name (the reference's
    * getVersionFromFilename, SSTable.cpp): "la"-and-later versions
    * lead the name ("ma-1-big-Data.db"); older names carry the version
    * in the third hyphen token ("ks-tbl-ka-1-Data.db"). Versions
    * before "ma" use the legacy cell framing. */
  def versionOf(fileName: String): String = {
    if (fileName.length >= 3 && fileName(0) >= 'l' && fileName(0) <= 'z' &&
        fileName(1).isLetter && fileName(2) == '-')
      fileName.substring(0, 2)
    else {
      val parts = fileName.split("-")
      if (parts.length >= 3 && parts(2).length == 2 && parts(2).forall(_.isLetter))
        parts(2)
      else "ma"
    }
  }

  def listDataFiles(spark: org.apache.spark.SparkContext, path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    if (st.isDirectory)
      fs.listStatus(p).toSeq.filter(_.getPath.getName.endsWith("Data.db"))
        .map(_.getPath.toString).sorted
    else Seq(path)
  }
}

private[sstable] class MaTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"ma-sstable(${props.getOrElse("path", "?")})"
  override def schema(): StructType = MaSSTableSource.OutputSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MaScanBuilder(options.asScala.toMap ++ props)
}

private[sstable] class MaScanBuilder(options: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = MaSSTableSource.OutputSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new MaScan(options, required)
}

private[sstable] class MaScan(options: Map[String, String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val path = options.getOrElse("path",
      throw new IllegalArgumentException("path option required"))
    val spark = org.apache.spark.sql.SparkSession.active
    MaSSTableSource.listDataFiles(spark.sparkContext, path)
      .map(f => MaInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MaReaderFactory(
      options.getOrElse("columns",
        throw new IllegalArgumentException("columns option required")),
      options.getOrElse("clustering", ""),
      options.getOrElse("staticColumns", ""),
      options.getOrElse("minTimestamp", "0").toLong,
      options.getOrElse("minTtl", "0").toLong,
      required.fieldNames,
      // Ship the SESSION's hadoop conf to executors (a fresh
      // Configuration() would drop filesystem credentials/settings
      // for anything beyond local paths).
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
}

private[sstable] case class MaInputPartition(file: String) extends InputPartition

private[sstable] class MaReaderFactory(
    columnsSpec: String,
    clusteringSpec: String,
    staticSpec: String,
    minTimestamp: Long,
    minTtl: Long,
    requiredFields: Array[String],
    hadoopConf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {

  private def parseColumns(spec: String): Seq[(String, MaFormat.ColType)] =
    if (spec.trim.isEmpty) Nil
    else spec.split(",").toSeq.map { s =>
      val Array(n, t) = s.trim.split(":")
      (n, MaFormat.colType(t))
    }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[MaInputPartition].file
    val columns = parseColumns(columnsSpec)
    val clustering =
      if (clusteringSpec.trim.isEmpty) Nil
      else clusteringSpec.split(",").toSeq.map(t => MaFormat.colType(t.trim))
    val staticColumns = parseColumns(staticSpec)
    new PartitionReader[InternalRow] {
      private val path = new Path(file)
      private val fs = path.getFileSystem(hadoopConf.value)
      private val raw = fs.open(path)
      // A sibling CompressionInfo.db means the Data.db is
      // chunk-compressed (the Cassandra default) — layer the block
      // decoder under the format reader transparently.
      private val ciPath = new Path(
        file.stripSuffix("Data.db") + "CompressionInfo.db")
      private val version = MaSSTableSource.versionOf(path.getName)
      private val in: java.io.InputStream =
        if (fs.exists(ciPath)) {
          val ciIn = fs.open(ciPath)
          val info = try CompressedBlocks.readCompressionInfo(ciIn) finally ciIn.close()
          // Checksum regime per format version (SSTable.cpp:102-104):
          // Adler32 over compressed bytes for jb..la, CRC32 over
          // compressed bytes for ma+, CRC32 over UNCOMPRESSED bytes
          // before jb.
          new CompressedBlocks.ChunkedInputStream(
            raw, info, fs.getFileStatus(path).getLen,
            useCrc32 = version >= "ma" || version < "jb",
            checksumCompressed = version >= "jb")
        } else raw
      private val cells: Iterator[MaFormat.MaCell] =
        if (version >= "ma")
          new MaFormat.Reader(in, columns, minTimestamp, minTtl,
            clustering, staticColumns)
        else new MaFormat.KaReader(in)
      private var current: MaFormat.MaCell = _

      // Project only the pruned columns into the output row.
      private val fieldIdx = requiredFields.map(
        MaSSTableSource.OutputSchema.fieldNames.indexOf(_))

      override def next(): Boolean = {
        if (cells.hasNext) { current = cells.next(); true } else false
      }

      override def get(): InternalRow = {
        val c = current
        val full: Array[Any] = Array(
          UTF8String.fromBytes(c.key),
          if (c.col == null) null else UTF8String.fromString(c.col),
          c.ts,
          c.value,
          c.deleted,
          c.expiring,
          if (c.ttlSec < 0) null else c.ttlSec,
          if (c.deletionTs == MaFormat.NoDeletion) null else c.deletionTs,
          c.marker,
          c.counter)
        InternalRow.fromSeq(fieldIdx.map(full(_)).toIndexedSeq)
      }

      override def close(): Unit = in.close()
    }
  }
}
