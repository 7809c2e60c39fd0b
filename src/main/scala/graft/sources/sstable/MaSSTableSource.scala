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
  * A Data.db with a sibling Statistics.db is SELF-DESCRIBING: the
  * schema (columns / clustering / staticColumns), the per-file
  * minTimestamp / minTtl delta bases, and the partitioner are read
  * from its serialization header and validation metadata (the
  * reference's read_metadata, SSTable.cpp:275; SSTableSchema.cpp:121),
  * so none of those options are needed — exactly like the reference
  * CLI, which takes only paths. Explicit options override the
  * discovered values; note the delta bases are per file, so the
  * options only make sense for single-generation reads.
  *
  * Options:
  *  - `path`: file or directory of `*-Data.db` files
  *  - `columns`: the regular-column schema, e.g. `"click:text,count:long"`
  *    (read from Statistics.db when present, SSTableSchema.cpp);
  *    complex collections spell as `tags:set<text>`, `log:list<long>`,
  *    `attrs:map<text,text>` — their sub-cells surface as
  *    `column[path]` rows and complex deletions as column-scoped range
  *    markers (the spec splits on top-level commas only, so map types
  *    nest fine)
  *  - `clustering`: clustering-key column TYPES in schema order, e.g.
  *    `"text,int32"` — values are parsed and skipped per row exactly as
  *    the reference does (SSTable.cpp:487 read_clustering_columns);
  *    required for any table with clustering keys
  *  - `clusteringIdentity` (default false = reference parity): render
  *    each row's clustering values into its cells' column identity
  *    (`ck1␟ck2␟col`, [[MaFormat.ClusteringSep]]-terminated values) so
  *    rows of a CLUSTERED table that differ only in clustering key
  *    survive the KV LWW merge as distinct records instead of
  *    silently collapsing; row deletions and paired open/close
  *    clustering-bound markers become column-RANGE tombstones over
  *    exactly their rows' name range. Parity mode discards the values
  *    (the reference targets unclustered tables) and treats every
  *    marker/row deletion as whole-partition
  *  - `staticColumns`: the static-row column schema (same shape as
  *    `columns`); required if the table has static columns
  *  - `minTimestamp`, `minTtl`: the Statistics.db delta-encoding bases
  *  - `resumeKey`: resume the scan from this key (the reference's `-s`
  *    flag): with an Index.db the seek skips every earlier partition at
  *    plan time (partitions read in index/ring order); without one the
  *    reader filters per cell — same rows either way
  *  - `tokenMin`, `tokenMax`: inclusive TOKEN bounds on the partitioner
  *    ring — the shard predicate a distributed migration uses (worker i
  *    of N reads ring·i/N ≤ token ≤ ring·(i+1)/N), generalizing the
  *    reference's resume seek from "start at key" to "read my slice".
  *    Format follows the partitioner: a signed decimal long for
  *    `murmur3`, 32 lowercase hex chars (the |MD5| token) for `random`,
  *    raw key text for `byteOrdered`. With an Index.db BOTH bounds
  *    prune at plan time (the scan starts at the first in-range
  *    partition and STOPS at the first past-range one — partitions
  *    outside the slice are never read); the reader always applies the
  *    exact residual per cell
  *  - `partitioner`: the ring order the resume seek walks, matching
  *    the reference's assign_token + init_at_key (CassandraParser.cpp
  *    :198): `byteOrdered` (default, raw-key memcmp), `murmur3`
  *    ((sign-bug Murmur3 token, key) order), `random` ((abs-MD5
  *    token, key) order)
  *  - `splitBytes`: target UNCOMPRESSED bytes per input split (default
  *    128 MiB). A Data.db with a sibling Index.db splits into multiple
  *    InputPartitions at partition-start offsets taken from the index
  *    (the reference's Summary/Index seek, Cassandra2Aerospike.cpp
  *    `-s`/`-S`, reused as the split planner); compressed files seek
  *    chunk-granularly via the CompressionInfo offsets. A file with no
  *    Index.db stays one split — the format is a stream and has no
  *    other safe cut points.
  *
  * Scale shape: without splitting, a multi-hundred-GB SSTable is one
  * task; with Index.db present the parallelism ceiling is
  * uncompressed-bytes / splitBytes, a resume key prunes the ring
  * prefix at plan time under any of the three partitioner orders, and
  * a token slice prunes BOTH ends (each of N workers reads only its
  * 1/N of every SSTable). The planner STREAMS the index (one entry in
  * memory at a time, O(#splits) retained — a 100 GB Data.db's index
  * runs to millions of entries), and a sibling Summary.db seeds the
  * seek exactly as the reference's find_partition_in_summary
  * (SSTable.cpp:121): binary-search the in-memory sampled keys, then
  * read the index only from the floor entry on — the bytes before it
  * are never touched.
  * Column pruning IS pushed down
  * (SupportsPushDownRequiredColumns): a pruned-away value column still
  * has to be skipped byte-wise (the format is a stream), but pruned
  * rows never materialize into InternalRow fields.
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
    * getVersionFromFilename, SSTable.cpp:191): "la"-and-later versions
    * lead the name ("ma-1-big-Data.db"); older names carry the version
    * in the third hyphen token ("ks-tbl-ka-1-Data.db"); ancient
    * single-letter versions ("ks-tbl-c-1-...") normalize to
    * letter+"a" exactly as the reference maps them, so version-string
    * comparisons stay total. Versions before "ma" use the legacy cell
    * framing; before "ja", the old count-framed row layout. */
  /** "la"-and-later file names LEAD with the version
    * ("nb-1-big-Data.db"); shared by [[versionOf]] and
    * [[generationOf]] so the two can never disagree on a name's
    * shape. */
  private def isVersionLedName(fileName: String): Boolean =
    fileName.length >= 3 && fileName(0) >= 'l' && fileName(0) <= 'z' &&
      fileName(1).isLetter && fileName(2) == '-'

  def versionOf(fileName: String): String = {
    if (isVersionLedName(fileName))
      fileName.substring(0, 2)
    else {
      val parts = fileName.split("-")
      if (parts.length >= 3 && parts(2).length == 2 && parts(2).forall(_.isLetter))
        parts(2)
      else if (parts.length >= 3 && parts(2).length == 1 &&
               parts(2)(0) >= 'a' && parts(2)(0) <= 'g')
        // Every ancient single-letter version ("a".."g" — "h"+ went
        // two-letter) normalizes to letter+"a"; e/f/g sort < "ja" and
        // carry the 8-byte row size, so they take the preJa path
        // instead of silently defaulting to the modern "ma" framing.
        parts(2) + "a"
      else "ma"
    }
  }

  /** The effective reader options of a planned scan — how tests and
    * EXPLAIN readers observe pushed seeks/slices; None for scans of
    * other sources. */
  def scanOptions(scan: org.apache.spark.sql.connector.read.Scan)
      : Option[Map[String, String]] = scan match {
    case m: MaScan => Some(m.options)
    case _ => None
  }

  /** The Data.db files a planned scan will actually open (one entry
    * per input split) — how tests observe file-level ring pruning. */
  def scanPartitionFiles(scan: org.apache.spark.sql.connector.read.Scan)
      : Option[Seq[String]] = scan match {
    case m: MaScan =>
      Some(m.planInputPartitions().toSeq
        .map(_.asInstanceOf[MaInputPartition].file))
    case _ => None
  }

  /** Unsigned bytewise compare, shorter-is-smaller on a shared prefix —
    * the memcmp order Cassandra keys and UTF8String both use. */
  def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** Ring-order compare under the table's partitioner — the order the
    * reference's resume seek walks (CassandraParser.cpp:198-207
    * assign_token + init_at_key): (token, key) for the hashing
    * partitioners, raw key memcmp for ByteOrdered/OrderPreserving.
    * The Index.db is written in this same order, so the seek is a
    * linear find over its entries. */
  def ringCompare(partitioner: String)(a: Array[Byte], b: Array[Byte]): Int =
    partitioner match {
      case "byteOrdered" => compareBytes(a, b)
      case "murmur3" =>
        val d = java.lang.Long.compare(
          graft.functions.CassandraMurmur3.token(a),
          graft.functions.CassandraMurmur3.token(b))
        if (d != 0) d else compareBytes(a, b)
      case "random" =>
        val d = compareBytes(
          graft.functions.CassandraRandomMd5.tokenBytes(a),
          graft.functions.CassandraRandomMd5.tokenBytes(b))
        if (d != 0) d else compareBytes(a, b)
      case other => throw new IllegalArgumentException(
        s"unknown partitioner: $other (byteOrdered | murmur3 | random)")
    }

  /** Comparator of a key's TOKEN against a bound given in the
    * partitioner's own token notation (`tokenMin`/`tokenMax` option
    * values): signed decimal long for murmur3, 32-hex |MD5| for random,
    * raw key text for byteOrdered. Token-only — no key tie-break — so
    * a bound compares equal across every key sharing its token, which
    * is what an inclusive slice wants. */
  def tokenCompare(partitioner: String, bound: String): Array[Byte] => Int =
    partitioner match {
      case "byteOrdered" =>
        val b = bound.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        k => compareBytes(k, b)
      case "murmur3" =>
        val b = bound.trim.toLong
        k => java.lang.Long.compare(graft.functions.CassandraMurmur3.token(k), b)
      case "random" =>
        require(bound.length == 32 && bound.forall(c =>
          (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
          s"random-partitioner token bound must be 32 lowercase hex chars: $bound")
        val b = bound.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
        k => compareBytes(graft.functions.CassandraRandomMd5.tokenBytes(k), b)
      case other => throw new IllegalArgumentException(
        s"unknown partitioner: $other (byteOrdered | murmur3 | random)")
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

  /** SSTable generation number from the file name: modern names lead
    * with the version ("nb-42-big-Data.db" → 42), legacy names carry
    * it after the version token ("ks-tbl-ka-3-Data.db" → 3); -1 when
    * the name doesn't parse. */
  def generationOf(fileName: String): Long = {
    val parts = fileName.split("-")
    val tok =
      if (isVersionLedName(fileName)) parts.lift(1)
      else parts.lift(3) // ks-tbl-<version>-<generation>-...
    tok.filter(t => t.nonEmpty && t.forall(_.isDigit)).map(_.toLong).getOrElse(-1L)
  }

  private val DescribeSchema = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("version", StringType, nullable = false),
    StructField("generation", LongType, nullable = false),
    StructField("data_bytes", LongType, nullable = false),
    StructField("compressed", BooleanType, nullable = false),
    StructField("codec", StringType, nullable = true),
    StructField("chunk_len", IntegerType, nullable = true),
    StructField("uncompressed_bytes", LongType, nullable = true),
    StructField("partitioner", StringType, nullable = true),
    StructField("min_timestamp", LongType, nullable = true),
    StructField("min_ttl", LongType, nullable = true),
    StructField("clustering_cols", IntegerType, nullable = true),
    StructField("static_cols", IntegerType, nullable = true),
    StructField("regular_cols", IntegerType, nullable = true),
    StructField("index_partitions", LongType, nullable = true),
    StructField("summary_entries", IntegerType, nullable = true),
    // Summary.db trailing (first, last) partition keys — the file's
    // whole-ring footprint, known without opening Index/Data.
    StructField("first_key", StringType, nullable = true),
    StructField("last_key", StringType, nullable = true),
    // With a token slice: does this file's [first, last] ring range
    // overlap the slice? (null when bounds or partitioner unknown.)
    StructField("in_slice", BooleanType, nullable = true),
    StructField("meta_error", StringType, nullable = true),
    // Keyspace/table deduced from the on-disk layout — the reference's
    // -t/-n defaulting (Cassandra2Aerospike.cpp:87-95): the modern
    // .../<keyspace>/<table>-<32hexuuid>/ directory shape, or the
    // legacy <ks>-<table>-<version>-<gen>- filename prefix.
    StructField("keyspace", StringType, nullable = true),
    StructField("table", StringType, nullable = true)))

  private val TableDirPattern = "^(.+)-[0-9a-f]{32}$".r

  /** Deduce (keyspace, table) for a Data.db path from the directory
    * layout (modern) or the filename prefix (legacy ka-era names). */
  def deduceKeyspaceTable(dataFile: String): (Option[String], Option[String]) = {
    val p = new Path(dataFile)
    val parentName = Option(p.getParent).map(_.getName)
    val grandName = Option(p.getParent).flatMap(pp => Option(pp.getParent)).map(_.getName)
    parentName.collect { case TableDirPattern(tbl) => tbl } match {
      case Some(tbl) => (grandName.filter(_.nonEmpty), Some(tbl))
      case None =>
        // Legacy: ks-tbl-<version>-<gen>-... filename carries the names.
        val parts = p.getName.split("-")
        if (parts.length >= 5 && parts(2).length == 2 &&
            parts(2).forall(_.isLetter) && parts(3).forall(_.isDigit))
          (Some(parts(0)), Some(parts(1)))
        else (None, None)
    }
  }

  /** Directory-level metadata report — the operational "what's here" a
    * real migration plans from: versions present, ring/partitioner,
    * discovered schema widths, per-file and uncompressed sizes, and
    * Index.db partition counts (the numbers that size a `-T` shard
    * fan-out). One row per Data.db. Only sibling METADATA files are
    * opened (Statistics / CompressionInfo / Index / Summary — never
    * Data.db itself), and the per-file parse runs on the executors, so
    * a directory of thousands of SSTables describes in one small job.
    * Beyond the reference CLI, which reports nothing until it scans.
    *
    * `tokenRange`: a worker's prospective `-T` slice (either side empty
    * for an open end). When given, each row carries `in_slice` — does
    * the file's Summary-bound ring range overlap the slice? — so a
    * sharded fan-out sizes each worker from slice-local file and
    * partition counts BEFORE launching anything (the same overlap test
    * planSplits uses to skip whole files at plan time). */
  def describe(spark: org.apache.spark.sql.SparkSession, path: String,
      tokenRange: Option[(String, String)] = None)
      : org.apache.spark.sql.DataFrame = {
    val files = listDataFiles(spark.sparkContext, path)
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size,
        spark.sparkContext.defaultParallelism)))
      .map { f =>
        val dataPath = new Path(f)
        val fs = dataPath.getFileSystem(hconf.value)
        val name = dataPath.getName
        val version = versionOf(name)
        val stem = f.stripSuffix("Data.db")
        // An inventory must REPORT a corrupt sibling (nulls + the
        // error), not abort the whole job over one bad file — a
        // broken Statistics.db is exactly what a pre-migration triage
        // is looking for.
        val errors = Seq.newBuilder[String]
        def withSibling[A](component: String)(read: java.io.InputStream => A)
            : Option[A] = {
          val p = new Path(stem + component)
          if (!fs.exists(p)) None
          else scala.util.Try {
            val in = fs.open(p)
            try read(in) finally in.close()
          } match {
            case scala.util.Success(a) => Some(a)
            case scala.util.Failure(ex) =>
              errors += s"$component: ${ex.getMessage}"
              None
          }
        }
        val stats = withSibling("Statistics.db")(
          StatsFile.read(_, version))
        val ci = withSibling("CompressionInfo.db")(
          CompressedBlocks.readCompressionInfo)
        val indexPartitions = withSibling("Index.db") { in =>
          var n = 0L
          val it = MaFormat.indexEntries(in, version)
          while (it.hasNext) { it.next(); n += 1 }
          n
        }
        // One open + one parse per Summary.db for BOTH the entry count
        // and the bound keys (a directory of thousands of files on a
        // high-latency filesystem pays per open).
        val summaryAll = withSibling("Summary.db")(
          MaFormat.readSummaryWithBounds(_, version))
        val summaryEntries = summaryAll.map(_._1.length)
        val bounds = summaryAll.flatMap(_._2)
        def keyText(b: Array[Byte]): String =
          new String(b, java.nio.charset.StandardCharsets.UTF_8)
        // Slice overlap on the Summary bounds — the planSplits
        // whole-file test, surfaced as data: the file is OUT only when
        // even its ring-greatest key precedes the slice start or its
        // ring-least key is past the end.
        val inSlice: Option[Boolean] = for {
          (tMin, tMax) <- tokenRange
          (firstKey, lastKey) <- bounds
          part <- stats.flatMap(_.partitioner)
          cmpMin = Some(tMin).filter(_.nonEmpty).map(tokenCompare(part, _))
          cmpMax = Some(tMax).filter(_.nonEmpty).map(tokenCompare(part, _))
        } yield !(cmpMin.exists(_(lastKey) < 0) || cmpMax.exists(_(firstKey) > 0))
        val metaError = {
          val es = errors.result()
          if (es.isEmpty) null else es.mkString("; ")
        }
        val ksTbl = deduceKeyspaceTable(f)
        org.apache.spark.sql.Row(
          name, version, generationOf(name),
          fs.getFileStatus(dataPath).getLen,
          ci.isDefined,
          ci.map(_.codec.toString).orNull,
          ci.map(i => Integer.valueOf(i.chunkLen)).orNull,
          ci.map(i => java.lang.Long.valueOf(i.uncompressedLen)).orNull,
          stats.flatMap(_.partitioner).orNull,
          stats.map(s => java.lang.Long.valueOf(s.minTimestamp)).orNull,
          stats.map(s => java.lang.Long.valueOf(s.minTtl)).orNull,
          stats.map(s => Integer.valueOf(s.clustering.size)).orNull,
          stats.map(s => Integer.valueOf(s.staticColumns.size)).orNull,
          stats.flatMap(_.columns).map(c => Integer.valueOf(c.size)).orNull,
          indexPartitions.map(java.lang.Long.valueOf).orNull,
          summaryEntries.map(Integer.valueOf).orNull,
          bounds.map(b => keyText(b._1)).orNull,
          bounds.map(b => keyText(b._2)).orNull,
          inSlice.map(java.lang.Boolean.valueOf).orNull,
          metaError,
          ksTbl._1.orNull,
          ksTbl._2.orNull)
      }
    spark.createDataFrame(rows, DescribeSchema).orderBy("file")
  }

  /** Sibling Statistics.db metadata for a Data.db, if present — the
    * reference's read_metadata (SSTable.cpp:275) makes the table
    * self-describing; explicit options still win where given. */
  def statsFor(
      dataFile: String,
      fs: org.apache.hadoop.fs.FileSystem): Option[StatsFile.TableMeta] = {
    val sp = new Path(dataFile.stripSuffix("Data.db") + "Statistics.db")
    if (!fs.exists(sp)) None
    else {
      val in = fs.open(sp)
      try Some(StatsFile.read(in, versionOf(new Path(dataFile).getName)))
      finally in.close()
    }
  }
}

private[sstable] class MaTable(private[sstable] val props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"ma-sstable(${props.getOrElse("path", "?")})"
  // Standard DSv2 surface for the effective options — also how tests
  // (and EXPLAIN readers) observe a pushed ring slice.
  override def properties(): util.Map[String, String] = props.asJava
  override def schema(): StructType = MaSSTableSource.OutputSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MaScanBuilder(options.asScala.toMap ++ props)
}

private[sstable] class MaScanBuilder(options: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  private var required: StructType = MaSSTableSource.OutputSchema
  private var opts = options
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Standard DSv2 filter pushdown: a lower bound on `key` becomes the
    * source's `resumeKey` — the reference's `-s` Summary/Index seek —
    * when the ring order is EXPLICITLY byteOrdered (raw-key order; the
    * only ring where key order and seek order coincide — under
    * murmur3/random a key bound says nothing about ring position, and
    * an absent option defers to each file's own Statistics.db, which
    * the builder cannot see). The tightest bound wins; a strict `>`
    * seeks to the bound too (the residual filter drops the boundary
    * row). EVERY filter stays residual: the seek is purely plan-time
    * and reader-side pruning, so correctness never depends on it. */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    if (opts.get("partitioner").contains("byteOrdered") &&
        !opts.contains("resumeKey")) {
      import org.apache.spark.sql.sources.{EqualTo, GreaterThan, GreaterThanOrEqual}
      val contributing = filters.collect {
        case f @ GreaterThanOrEqual("key", v: String) => (f, v)
        case f @ GreaterThan("key", v: String) => (f, v)
        case f @ EqualTo("key", v: String) => (f, v)
      }
      if (contributing.nonEmpty) {
        // Tightest = ring-greatest, i.e. UTF-8 BYTE order (the memcmp
        // order the seek walks) — Scala String max would compare
        // UTF-16 code units, which diverges for supplementary-plane
        // keys.
        val tightest = contributing.map(_._2).reduce((a, b) =>
          if (MaSSTableSource.compareBytes(
              a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
              b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) >= 0) a
          else b)
        opts = opts + ("resumeKey" -> tightest)
        pushed = contributing.map(_._1)
      }
    }
    filters
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

  override def build(): Scan = new MaScan(opts, required)
}

private[sstable] class MaScan(
    private[sstable] val options: Map[String, String],
    private[sstable] val required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val path = options.getOrElse("path",
      throw new IllegalArgumentException("path option required"))
    val splitBytes = options.getOrElse("splitBytes", (128L * 1024 * 1024).toString).toLong
    val resumeKey = options.get("resumeKey")
      .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val spark = org.apache.spark.sql.SparkSession.active
    val conf = spark.sparkContext.hadoopConfiguration
    MaSSTableSource.listDataFiles(spark.sparkContext, path)
      .flatMap(planSplits(_, splitBytes, resumeKey, conf)).toArray
  }

  /** Split one Data.db at Index.db partition boundaries: pick the first
    * partition-start offset at or past each multiple of the target
    * split size (offsets are positions in the UNCOMPRESSED stream —
    * the only safe cut points the format has). With a resume key, all
    * partitions ordered strictly before it are skipped at PLAN time —
    * the reference's `-s` Summary/Index seek; the reader still filters
    * residually so indexless files return the same rows. The index is
    * tiny relative to its Data.db, so the driver-side read is the same
    * cost class as parquet footer planning. */
  private def planSplits(
      file: String, splitBytes: Long, resumeKey: Option[Array[Byte]],
      conf: org.apache.hadoop.conf.Configuration): Seq[InputPartition] = {
    val dataPath = new Path(file)
    val fs = dataPath.getFileSystem(conf)
    val version = MaSSTableSource.versionOf(dataPath.getName)
    val tokenMin = options.get("tokenMin").filter(_.nonEmpty)
    val tokenMax = options.get("tokenMax").filter(_.nonEmpty)
    // Ring order for the resume/slice seek: explicit option, else the
    // partitioner recorded in this file's own Statistics.db (the
    // reference's read_metadata VALIDATION component).
    val partitioner = options.getOrElse("partitioner",
      (if (resumeKey.isDefined || tokenMin.isDefined || tokenMax.isDefined)
         MaSSTableSource.statsFor(file, fs).flatMap(_.partitioner)
       else None).getOrElse("byteOrdered"))
    val ringGe = MaSSTableSource.ringCompare(partitioner) _
    val cmpMin = tokenMin.map(MaSSTableSource.tokenCompare(partitioner, _))
    val cmpMax = tokenMax.map(MaSSTableSource.tokenCompare(partitioner, _))
    def inStart(k: Array[Byte]): Boolean =
      resumeKey.forall(rk => ringGe(k, rk) >= 0) && cmpMin.forall(_(k) >= 0)
    val sumPath = new Path(file.stripSuffix("Data.db") + "Summary.db")
    // FILE-level ring pruning: the Summary's trailing (first, last)
    // keys bound the whole file's ring range (SSTables are written in
    // ring order), so a sharded worker (-T) or resumed scan skips a
    // non-overlapping SSTable without opening its Index.db at all —
    // at 1000 executors × 1/N slices this is the difference between
    // "every worker touches every file's index" and "each worker
    // plans only its own files". Runs BEFORE the index check, so even
    // an index-less file is skipped on its bounds. Purely an
    // optimization: the index seek below (and the caller's residual
    // filter) excludes the same partitions anyway, and files without
    // readable bounds take that path unchanged.
    if ((resumeKey.isDefined || cmpMin.isDefined || cmpMax.isDefined) &&
        fs.exists(sumPath)) {
      val bounds = {
        val sin = fs.open(sumPath)
        try MaFormat.readSummaryBounds(sin, version) finally sin.close()
      }
      val skipWholeFile = bounds.exists { case (firstKey, lastKey) =>
        !inStart(lastKey) ||          // even the ring-greatest key precedes the start
          cmpMax.exists(_(firstKey) > 0) // even the ring-least key is past the end
      }
      if (skipWholeFile) return Seq.empty
    }
    val idxPath = new Path(file.stripSuffix("Data.db") + "Index.db")
    val whole = Seq(MaInputPartition(file, 0L, Long.MaxValue))
    if (!fs.exists(idxPath)) return whole
    val ciPath = new Path(file.stripSuffix("Data.db") + "CompressionInfo.db")
    val totalUncompressed =
      if (fs.exists(ciPath)) {
        val in = fs.open(ciPath)
        try CompressedBlocks.readCompressionInfo(in).uncompressedLen finally in.close()
      } else fs.getFileStatus(dataPath).getLen
    // Seek: the index is written in the table's ring/key order, so the
    // first entry at-or-after the resume key / token-slice start is the
    // scan start and the first entry PAST the slice end caps it — every
    // partition outside [start, cap) is never read at all.
    // Summary.db floor (the reference's find_partition_in_summary,
    // SSTable.cpp:121-180): the last SAMPLED entry strictly before the
    // seek target is a safe place to start reading the index — every
    // skipped index byte belongs to partitions the slice excludes
    // anyway. Without it a seek scans the index from byte 0 (still
    // streamed, never materialized).
    val indexSeek: Long =
      if ((resumeKey.isDefined || tokenMin.isDefined) && fs.exists(sumPath)) {
        // The summary is PURELY an optimization (the index pass below
        // re-checks every entry), so a truncated/corrupt Summary.db
        // must degrade to the always-safe scan-from-0, never abort
        // the query a plain Index.db could have planned. Parsing alone
        // is not enough of a guard: a summary that PARSES but carries a
        // stale position would land the seek mid-entry and the index
        // stream would misparse silently — so the candidate position is
        // verified by actually reading the index entry there and
        // checking it is the very key the summary sampled.
        val floorPos = scala.util.Try {
          val sin = fs.open(sumPath)
          val summary =
            try MaFormat.readSummary(sin, version)
            finally sin.close()
          // inStart is monotone along the summary's ring order
          // (false* true*) — binary-search the last false.
          var lo = 0
          var hi = summary.length - 1
          var floor = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (!inStart(summary(mid)._1)) { floor = mid; lo = mid + 1 } else hi = mid - 1
          }
          if (floor < 0) 0L
          else {
            val pos = summary(floor)._2
            require(pos >= 0 && pos < fs.getFileStatus(idxPath).getLen,
              s"summary position $pos outside Index.db")
            val vin = fs.open(idxPath)
            val firstKey =
              try { vin.seek(pos); MaFormat.indexEntries(vin, version).next()._1 }
              finally vin.close()
            require(java.util.Arrays.equals(firstKey, summary(floor)._1),
              "summary position does not point at its sampled key")
            pos
          }
        }
        floorPos.getOrElse(0L)
      } else 0L
    // One streaming pass over the (remaining) index — O(#splits)
    // retained: scan start, split cuts at every splitBytes of
    // uncompressed payload, and the cap position.
    val fin = fs.open(idxPath)
    try {
      if (indexSeek > 0) fin.seek(indexSeek)
      val it = MaFormat.indexEntries(fin, version)
      if (it.isEmpty && indexSeek == 0) return whole // empty Index.db
      var seekStart = -1L
      var endCap = Long.MaxValue
      val bounds = Seq.newBuilder[Long]
      var nextTarget = 0L
      var done = false
      while (!done && it.hasNext) {
        val (k, p) = it.next()
        if (cmpMax.exists(_(k) > 0)) { endCap = p; done = true }
        else if (seekStart < 0) {
          if (inStart(k)) { seekStart = p; nextTarget = p + splitBytes }
        } else if (p >= nextTarget) { bounds += p; nextTarget = p + splitBytes }
      }
      if (seekStart < 0) return Nil // slice empty or wholly before/past the file
      val lastBound = math.min(endCap, totalUncompressed)
      if (lastBound - seekStart <= splitBytes)
        return Seq(MaInputPartition(file, seekStart, endCap))
      val cuts = seekStart +: bounds.result()
      cuts.zipAll(cuts.drop(1), 0L, endCap).map {
        case (start, end) => MaInputPartition(file, start, end)
      }
    } finally fin.close()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MaReaderFactory(
      options,
      required.fieldNames,
      // Ship the SESSION's hadoop conf to executors (a fresh
      // Configuration() would drop filesystem credentials/settings
      // for anything beyond local paths).
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
}

/** One planned read: the UNCOMPRESSED byte range [start, end) of a
  * Data.db, both bounds at partition-start offsets (end = Long.MaxValue
  * reads to EOF). */
private[sstable] case class MaInputPartition(
    file: String, start: Long = 0L, end: Long = Long.MaxValue) extends InputPartition

/** Counts consumed bytes so the row reader can stop at its split's end
  * offset; `count` starts at the split's absolute start position. */
private[sstable] final class CountingInputStream(
    in: java.io.InputStream, var count: Long) extends java.io.InputStream {
  override def read(): Int = {
    val b = in.read(); if (b >= 0) count += 1; b
  }
  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    val n = in.read(b, off, len); if (n > 0) count += n; n
  }
  override def close(): Unit = in.close()
}

private[sstable] class MaReaderFactory(
    options: Map[String, String],
    requiredFields: Array[String],
    hadoopConf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {

  /** Split a column spec on TOP-LEVEL commas only, so collection types
    * (`attrs:map<text,long>`) keep their inner comma. */
  private def splitTopLevel(spec: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var depth = 0
    spec.foreach {
      case '<' => depth += 1; sb += '<'
      case '>' => depth -= 1; sb += '>'
      case ',' if depth == 0 => out += sb.toString; sb.clear()
      case c => sb += c
    }
    if (sb.nonEmpty) out += sb.toString
    out.result()
  }

  private def parseColumns(spec: String): Seq[(String, MaFormat.ColType)] =
    if (spec.trim.isEmpty) Nil
    else splitTopLevel(spec).map { s =>
      val Array(n, t) = s.trim.split(":", 2)
      (n, MaFormat.colType(t))
    }

  private def opt(name: String): Option[String] =
    options.get(name).filter(_.trim.nonEmpty)

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val MaInputPartition(file, splitStart, splitEnd) =
      partition.asInstanceOf[MaInputPartition]
    val resumeKeySpec = options.getOrElse("resumeKey", "")
    val verifyChecksums = options.getOrElse("verifyChecksums", "true").toBoolean
    new PartitionReader[InternalRow] {
      private val path = new Path(file)
      private val fs = path.getFileSystem(hadoopConf.value)
      // Per-file metadata: explicit options win; a sibling
      // Statistics.db supplies the rest (reference read_metadata,
      // SSTable.cpp:275). The delta bases in particular are PER FILE —
      // generations of one table each carry their own — so the
      // stats-discovered values are the only correct ones for a
      // multi-generation directory read.
      private val stats: Option[StatsFile.TableMeta] =
        MaSSTableSource.statsFor(file, fs)
      private val version = MaSSTableSource.versionOf(path.getName)
      private val columns: Seq[(String, MaFormat.ColType)] =
        opt("columns").map(parseColumns)
          .orElse(stats.flatMap(_.columns))
          .getOrElse {
            // Legacy ja/ka framing is self-describing; only the "ma"
            // row format needs the column list to frame values.
            if (version >= "ma") throw new IllegalArgumentException(
              s"no `columns` option and no readable sibling Statistics.db for $file")
            Nil
          }
      private val clustering: Seq[MaFormat.ColType] =
        opt("clustering")
          .map(_.split(",").toSeq.map(t => MaFormat.colType(t.trim)))
          .orElse(stats.map(_.clustering)).getOrElse(Nil)
      private val staticColumns: Seq[(String, MaFormat.ColType)] =
        opt("staticColumns").map(parseColumns)
          .orElse(stats.map(_.staticColumns)).getOrElse(Nil)
      private val minTimestamp: Long =
        opt("minTimestamp").map(_.toLong)
          .orElse(stats.map(_.minTimestamp)).getOrElse(0L)
      private val minTtl: Long =
        opt("minTtl").map(_.toLong)
          .orElse(stats.map(_.minTtl)).getOrElse(0L)
      private val partitioner: String =
        opt("partitioner")
          .orElse(stats.flatMap(_.partitioner)).getOrElse("byteOrdered")
      private val raw = fs.open(path)
      // A sibling CompressionInfo.db means the Data.db is
      // chunk-compressed (the Cassandra default) — layer the block
      // decoder under the format reader transparently.
      private val ciPath = new Path(
        file.stripSuffix("Data.db") + "CompressionInfo.db")
      private val in: CountingInputStream = {
        val (base, basePos): (java.io.InputStream, Long) =
          if (fs.exists(ciPath)) {
            val ciIn = fs.open(ciPath)
            val info = try CompressedBlocks.readCompressionInfo(ciIn) finally ciIn.close()
            // Mid-file start: jump the RAW stream to the chunk holding
            // the split's start offset (the chunk-granular seek the
            // CompressionInfo offsets enable), then decompress forward.
            val startChunk = (splitStart / info.chunkLen).toInt
            if (startChunk > 0) raw.seek(info.offsets(startChunk))
            // Checksum regime per format version (SSTable.cpp:102-104):
            // Adler32 over compressed bytes for jb..la, CRC32 over
            // compressed bytes for ma+, CRC32 over UNCOMPRESSED bytes
            // before jb.
            (new CompressedBlocks.ChunkedInputStream(
              raw, info, fs.getFileStatus(path).getLen,
              useCrc32 = version >= "ma" || version < "jb",
              checksumCompressed = version >= "jb",
              startChunk = startChunk,
              verify = verifyChecksums),
              startChunk.toLong * info.chunkLen)
          } else {
            if (splitStart > 0) raw.seek(splitStart)
            (raw, splitStart)
          }
        val cis = new CountingInputStream(base, basePos)
        // Discard the in-chunk remainder between the chunk boundary and
        // the split's partition-start offset.
        val garbage = new Array[Byte](65536)
        while (cis.count < splitStart) {
          val n = cis.read(garbage, 0,
            math.min(splitStart - cis.count, garbage.length.toLong).toInt)
          require(n > 0, s"EOF before split start $splitStart in $file")
        }
        cis
      }
      // Stop at the first partition boundary at or past the split end.
      private val stop = () => in.count >= splitEnd
      private val clusteringIdentity =
        options.getOrElse("clusteringIdentity", "false").toBoolean
      private val cells: Iterator[MaFormat.MaCell] =
        if (version >= "ma")
          new MaFormat.Reader(in, columns, minTimestamp, minTtl,
            clustering, staticColumns, stop, clusteringIdentity)
        else new MaFormat.KaReader(in, stop, clusteringIdentity, version)
      private var current: MaFormat.MaCell = _

      // Project only the pruned columns into the output row.
      private val fieldIdx = requiredFields.map(
        MaSSTableSource.OutputSchema.fieldNames.indexOf(_))

      /** Keys surface as StringType (the KV operators compare and
        * resume on them as text); Cassandra keys are arbitrary bytes,
        * so REJECT non-UTF8 keys loudly — silently mangling them via
        * replacement chars could merge distinct keys. ASCII fast path;
        * non-ASCII keys pay one round-trip validation. */
      private def keyString(b: Array[Byte]): UTF8String = {
        var i = 0
        var ascii = true
        while (i < b.length && ascii) { if (b(i) < 0) ascii = false; i += 1 }
        if (!ascii &&
            !java.util.Arrays.equals(
              UTF8String.fromBytes(b).toString.getBytes("UTF-8"), b))
          throw new IllegalArgumentException(
            s"non-UTF8 partition key in $file (${b.length} bytes): this source " +
              "exposes keys as text; binary-keyed tables are not supported")
        UTF8String.fromBytes(b)
      }

      // Residual resume/slice filters: the Index.db seek skips whole
      // partitions at plan time, but an indexless file (or the boundary
      // partitions of an indexed one) still needs the exact key/token
      // bounds applied per cell.
      private val resumeKeyBytes: Array[Byte] =
        if (resumeKeySpec.isEmpty) null
        else resumeKeySpec.getBytes(java.nio.charset.StandardCharsets.UTF_8)

      private val ringGe = MaSSTableSource.ringCompare(partitioner) _
      private val tokenMinCmp: Array[Byte] => Int =
        options.get("tokenMin").filter(_.nonEmpty)
          .map(MaSSTableSource.tokenCompare(partitioner, _)).orNull
      private val tokenMaxCmp: Array[Byte] => Int =
        options.get("tokenMax").filter(_.nonEmpty)
          .map(MaSSTableSource.tokenCompare(partitioner, _)).orNull

      override def next(): Boolean = {
        while (cells.hasNext) {
          val c = cells.next()
          if ((resumeKeyBytes == null || ringGe(c.key, resumeKeyBytes) >= 0) &&
              (tokenMinCmp == null || tokenMinCmp(c.key) >= 0) &&
              (tokenMaxCmp == null || tokenMaxCmp(c.key) <= 0)) {
            current = c
            return true
          }
        }
        false
      }

      override def get(): InternalRow = {
        val c = current
        val full: Array[Any] = Array(
          keyString(c.key),
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
