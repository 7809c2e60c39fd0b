package graft.sources.sstable

import java.io.{DataInputStream, EOFException, InputStream}

/** Byte-level decoder for the Cassandra "ma"+ SSTable Data.db payload —
  * the reference's actual ingest entry point (SSTable.cpp, NewSStable:
  * read_row :505, read_normal_row :572, read_column :622,
  * read_column_data :688; vint decode Buffer.cpp read_unsigned_vint).
  *
  * Scope (the engine's owned subset, see SURVEY §3): "ma"+ Data.db
  * streams, plain or chunk-compressed ([[CompressedBlocks]] layers the
  * block decode + checksum verify underneath), plus the legacy
  * "ja"/"ka" cell framing ([[KaReader]]). Clustering columns and
  * static rows are handled as in the reference: clustering VALUES are
  * parsed and skipped (SSTable.cpp:489 — "not currently in use"),
  * clustering-bound range-tombstone markers are decoded, and static
  * rows read the static-column schema.
  *
  * Complex (collection) columns — `list<t>` / `set<t>` / `map<k,v>` —
  * decode BEYOND the reference (which has no complex arm at all and
  * would desync on any table using them): each sub-cell surfaces as
  * its own cell named `column[path]` (the path printable-or-hex), and
  * a complex deletion becomes a column-scoped range-tombstone marker
  * over exactly that `column[...]` name range, so the KV merge
  * machinery applies it with the same bounded semantics as legacy ka
  * range tombstones.
  *
  * Everything the KV semantics need is decoded: partition deletion,
  * row deletion, cell tombstones, counter cells, expiring cells with
  * row-shared or per-cell TTL, row-shared or per-cell timestamps,
  * min-timestamp/min-TTL delta encoding, and the column-subset
  * bitmask.
  */
object MaFormat {

  /** Column value formats (SSTableSchema.cpp get_column_size): text /
    * counter are vint-length-prefixed; the rest are fixed width. */
  sealed abstract class ColType(val fixedSize: Int) // -1 = vint-prefixed
  case object CText extends ColType(-1)
  case object CCounter extends ColType(-1)
  case object CInt32 extends ColType(4)
  case object CFloat extends ColType(4)
  case object CLong extends ColType(8)
  case object CTimestamp extends ColType(8)
  case object CBool extends ColType(1)
  case object CUuid extends ColType(16)
  /** A complex (multi-cell collection) column: every cell carries a
    * vint-length-prefixed CELL PATH before its value, values frame per
    * `valueType` (the collection's value type; sets write empty
    * values). `fixedSize` is never consulted — complex columns take a
    * dedicated decode arm. */
  final case class CComplex(valueType: ColType) extends ColType(-2)

  def colType(name: String): ColType = name.trim match {
    case "text" => CText
    case "counter" => CCounter
    case "int32" => CInt32
    case "float" => CFloat
    case "long" => CLong
    case "timestamp" => CTimestamp
    case "bool" => CBool
    case "uuid" => CUuid
    // Collections (flat element types only): the cell VALUE framing is
    // the element type for lists, the value type for maps, and empty
    // for sets (the element lives in the path) — SetType keeps its
    // element type as the (unused) value fallback.
    case s if s.startsWith("list<") && s.endsWith(">") =>
      CComplex(colType(s.substring(5, s.length - 1)))
    case s if s.startsWith("set<") && s.endsWith(">") =>
      CComplex(colType(s.substring(4, s.length - 1)))
    case s if s.startsWith("map<") && s.endsWith(">") =>
      val parts = s.substring(4, s.length - 1).split(",")
      require(parts.length == 2, s"map type needs <key,value>: $s")
      CComplex(colType(parts(1)))
    case other => throw new IllegalArgumentException(s"unknown column type: $other")
  }

  // Row flags (SSTable.hpp NewSStable::Flags)
  private val END_OF_PARTITION = 0x01
  private val IS_MARKER = 0x02
  private val HAS_TIMESTAMP = 0x04
  private val HAS_TTL = 0x08
  private val HAS_DELETION = 0x10
  private val HAS_ALL_COLUMNS = 0x20
  private val HAS_COMPLEX_DELETION = 0x40
  private val EXTENSION_FLAG = 0x80
  private val IS_STATIC = 0x01 // extended flags

  // Cell flags (SSTable.cpp NewSStable::read_column)
  private val IS_DELETED_MASK = 0x01
  private val IS_EXPIRING_MASK = 0x02
  private val HAS_EMPTY_VALUE_MASK = 0x04
  private val USE_ROW_TIMESTAMP_MASK = 0x08
  private val USE_ROW_TTL_MASK = 0x10

  /** The no-deletion sentinel (Cassandra DeletionTime.LIVE). */
  val NoDeletion: Long = Long.MinValue
  /** The no-TTL sentinel inside the decoder (reference uses u64 max). */
  private val NoTtl: Long = -1L

  /** Cassandra unsigned vint (Buffer.cpp:read_unsigned_vint): the count
    * of leading one bits in the first byte is the count of continuation
    * bytes; remaining first-byte bits are the high bits of the
    * big-endian value. Shared by the row decoder and the Index.db
    * reader. */
  private[sstable] def readUnsignedVintFrom(din: DataInputStream): Long = {
    val first = din.readUnsignedByte()
    if (first < 0x7f) return first.toLong
    var extraBytes = 0
    while (extraBytes < 8 && (first & (0x80 >> extraBytes)) != 0) extraBytes += 1
    var v: Long = (first & (0xff >> extraBytes)).toLong
    var i = 0
    while (i < extraBytes) { v = (v << 8) | din.readUnsignedByte(); i += 1 }
    v
  }

  /** Index.db entries (the seek source behind the reference's
    * `-s`/`-S` Summary/Index resume, Cassandra2Aerospike.cpp): a
    * sequence of (16-bit-length key, unsigned-vint data position,
    * unsigned-vint promoted-index length, promoted bytes) entries.
    * Each position is a partition-start offset in the UNCOMPRESSED
    * Data.db stream — exactly the valid sub-file split points — and
    * the key lets a resume seek skip whole partitions at plan time.
    *
    * STREAMING: the iterator holds one entry at a time, so a planner
    * walking a multi-hundred-MB index (one entry per partition — a
    * 100 GB Data.db of 10 KB partitions carries ~10M entries) retains
    * only what it keeps, not the whole file. Combine with
    * [[readSummary]] to skip the index prefix without reading it. */
  def indexEntries(in: InputStream): Iterator[(Array[Byte], Long)] = {
    val din = new DataInputStream(in)
    new Iterator[(Array[Byte], Long)] {
      private var nextEntry: (Array[Byte], Long) = _
      private var eof = false
      private def advance(): Unit = {
        try {
          val key = new Array[Byte](din.readUnsignedShort())
          din.readFully(key)
          val pos = readUnsignedVintFrom(din)
          val promoted = readUnsignedVintFrom(din)
          var skipped = 0L
          while (skipped < promoted) {
            val n = din.skipBytes(math.min(promoted - skipped, Int.MaxValue.toLong).toInt)
            if (n <= 0) { din.readUnsignedByte(); skipped += 1 } else skipped += n
          }
          nextEntry = (key, pos)
        } catch { case _: EOFException => eof = true; nextEntry = null }
      }
      override def hasNext: Boolean = {
        if (nextEntry == null && !eof) advance()
        nextEntry != null
      }
      override def next(): (Array[Byte], Long) = {
        if (!hasNext) throw new NoSuchElementException
        val e = nextEntry; nextEntry = null; e
      }
    }
  }

  def readIndexEntries(in: InputStream): Array[(Array[Byte], Long)] =
    indexEntries(in).toArray

  def readIndexPositions(in: InputStream): Array[Long] =
    readIndexEntries(in).map(_._2)

  /** Summary.db — the downsampled index the reference loads whole
    * ("Summary is designed to keep in memory", SSTable.cpp:121-180
    * find_partition_in_summary): header of BIG-endian minIndexInterval
    * (skipped), entry count, and toc byte size ("ka"+ adds 8 more
    * header bytes: samplingLevel + sizeAtFullSampling), then a toc
    * block whose offsets and index positions are NATIVE-endian
    * (little-endian on every machine Cassandra writes these on): the
    * first `size` int32s are entry offsets into the block; each entry
    * is the sampled key's bytes followed by its int64 Index.db
    * position. Every ~minIndexInterval-th partition is sampled, so the
    * summary is O(partitions/128) — the in-memory seek structure that
    * lets a planner jump into a huge Index.db instead of scanning it
    * from byte 0. */
  def readSummary(in: InputStream, version: String): Array[(Array[Byte], Long)] = {
    val din = new DataInputStream(in)
    // readFully, not skipBytes: DataInputStream.skipBytes stops at the
    // first short skip() without being at EOF on some stream impls,
    // which would silently misalign every header field after it.
    val scratch = new Array[Byte](8)
    din.readFully(scratch, 0, 4) // minIndexInterval
    val size = din.readInt()
    val memSize = din.readLong()
    if (version >= "ka") din.readFully(scratch, 0, 8)
    require(size >= 0 && memSize >= (4L * size) && memSize <= Int.MaxValue,
      s"implausible Summary.db header: size=$size memSize=$memSize")
    val toc = new Array[Byte](memSize.toInt)
    din.readFully(toc)
    def i32(off: Int): Int =
      (toc(off) & 0xff) | ((toc(off + 1) & 0xff) << 8) |
        ((toc(off + 2) & 0xff) << 16) | ((toc(off + 3) & 0xff) << 24)
    def i64(off: Int): Long = {
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (toc(off + i) & 0xff); i -= 1 }
      v
    }
    Array.tabulate(size) { i =>
      val off = i32(4 * i)
      val end = if (i + 1 < size) i32(4 * (i + 1)) else memSize.toInt
      require(off >= 4 * size && end - off >= 8 && end <= memSize,
        s"corrupt Summary.db toc entry $i: [$off,$end)")
      (java.util.Arrays.copyOfRange(toc, off, end - 8), i64(end - 8))
    }
  }

  /** One decoded unfiltered: a cell, or a range-tombstone marker.
    * "ma" markers carry col = null; "ka" range tombstones carry the
    * range START column name in col and the range END name bytes in
    * value (the legacy format encodes the bound pair inline,
    * SSTable.cpp:427-433). Counter cells (COUNTER_MASK, legacy path)
    * set counter = true — they merge by SUM, not LWW
    * (graft.kv.Kv.counterMerge). */
  final case class MaCell(
      key: Array[Byte],
      col: String,          // null for ma markers
      ts: Long,
      value: Array[Byte],   // null when absent/empty
      deleted: Boolean,
      expiring: Boolean,
      ttlSec: Long,         // -1 when none
      deletionTs: Long,     // effective row/partition deletion; NoDeletion when live
      marker: Boolean,
      counter: Boolean = false)

  /** Streaming reader state over a DataInputStream.
    *
    * `clustering` lists the clustering-key column TYPES in schema order
    * (names are never needed — values are skipped, SSTableSchema.cpp:131
    * parses only the formats); `staticColumns` is the static-row column
    * schema (SSTableSchema.cpp:134), read in place of the regular
    * columns when a row carries the IS_STATIC extended flag.
    *
    * `stopAfter` is consulted at every PARTITION boundary (before the
    * next partition header is read): when it returns true the reader
    * ends the stream — the hook sub-file input splits use to stop at
    * their planned end offset without reading into the next split's
    * partitions. */
  final class Reader(
      in: InputStream,
      columns: Seq[(String, ColType)],
      minTimestamp: Long,
      minTtl: Long,
      clustering: Seq[ColType] = Nil,
      staticColumns: Seq[(String, ColType)] = Nil,
      stopAfter: () => Boolean = () => false) extends Iterator[MaCell] {

    private val din = new DataInputStream(in)
    private var atEndOfPartition = true
    private var eof = false
    private var key: Array[Byte] = _
    private var partitionDeletion: Long = NoDeletion
    private var pending: List[MaCell] = Nil

    // --- primitive decode (Buffer.cpp) ---------------------------------

    private def readByte(): Int = din.readUnsignedByte()
    private def readShort(): Int = din.readUnsignedShort()
    private def readLongLong(): Long = din.readLong()
    private def skip(n: Int): Unit = { var i = 0; while (i < n) { din.readByte(); i += 1 } }
    private def readBytes(n: Int): Array[Byte] = {
      val b = new Array[Byte](n); din.readFully(b); b
    }

    /** Cassandra unsigned vint (Buffer.cpp:read_unsigned_vint): the
      * count of leading one bits in the first byte is the count of
      * continuation bytes; remaining first-byte bits are the high bits
      * of the big-endian value. */
    private def readUnsignedVint(): Long = {
      val first = readByte()
      if (first < 0x7f) return first.toLong
      var extraBytes = 0
      while (extraBytes < 8 && (first & (0x80 >> extraBytes)) != 0) extraBytes += 1
      var v: Long = (first & (0xff >> extraBytes)).toLong
      var i = 0
      while (i < extraBytes) { v = (v << 8) | readByte(); i += 1 }
      v
    }

    /** 16-bit-length-prefixed string bytes (Buffer.cpp:read_string). */
    private def readString(): Array[Byte] = readBytes(readShort())

    // --- unfiltered decode (SSTable.cpp) -------------------------------

    /** decode_column_subset (SSTable.cpp:459), small-column-count arm
      * plus the >= 64 encoded-list arm. */
    private def readColumnSubset(n: Int): Array[Boolean] = {
      val encoded = readUnsignedVint()
      if (encoded == 0) Array.fill(n)(true)
      else if (n >= 64) {
        val columnCount = n - encoded.toInt
        val isPositive = columnCount < n / 2
        val subset = Array.fill(n)(!isPositive)
        var i = 0
        while (i < columnCount) { subset(readUnsignedVint().toInt) = isPositive; i += 1 }
        subset
      } else {
        val subset = new Array[Boolean](n)
        var e = encoded
        var i = 0
        while (i < n) { subset(i) = (e & 1L) != 0; e >>= 1; i += 1 }
        subset
      }
    }

    /** read_clustering_columns (SSTable.cpp:487-503): one vint header
      * per block of up to 32 clustering values, two bits per value
      * (null / empty); a 00 bit-pair means value bytes follow — skip
      * them per the clustering column's size rule (vint-prefixed for
      * text-like types, fixed otherwise). `n` is the value count: the
      * full clustering size for rows, the bound's prefix length for
      * markers. Values are parsed and DISCARDED, as in the reference.
      * (Two deliberate deviations from the reference, both toward the
      * actual wire format: the reference masks with an int-typed
      * `3 << shift`, undefined past 16 columns per block — `3L` keeps
      * the intended 2-bit lanes for all 32; and its inner-loop limit is
      * the FULL schema clustering size even for a shorter marker bound,
      * which would mis-read bit-lanes the bound's header never encodes —
      * the writer emits header bits only for the bound's own `n`
      * values, so the limit here is `min(n, c + 32)`.) */
    private def readClusteringValues(n: Int): Unit = {
      require(n <= clustering.size,
        s"row carries $n clustering values but schema declares ${clustering.size} " +
          "(pass the clustering option)")
      var c = 0
      while (c < n) {
        val header = readUnsignedVint()
        val limit = math.min(n, c + 32)
        var shift = 0
        while (c < limit) {
          if ((header & (3L << shift)) == 0) {
            val size = clustering(c).fixedSize match {
              case -1 => readUnsignedVint().toInt
              case s => s
            }
            skip(size)
          }
          c += 1
          shift += 2
        }
      }
    }

    /** read_marker (SSTable.cpp:540): clustering-bound markers parse
      * (and discard) their bound prefix like any clustering block. */
    private def readMarker(isStatic: Boolean): MaCell = {
      val tpe = readByte()
      val size = readShort()
      if (!isStatic) readClusteringValues(size)
      readUnsignedVint() // row size
      readUnsignedVint() // previous unfiltered size
      val markedForDeletion = readLongLong()
      skip(4) // local deletion time
      // Boundary markers carry a second deletion time (unused).
      if (tpe == 2 || tpe == 5) skip(12)
      MaCell(key, null, markedForDeletion, null,
        deleted = true, expiring = false, ttlSec = NoTtl,
        deletionTs = markedForDeletion, marker = true)
    }

    /** read_normal_row + the full cell loop (SSTable.cpp:572-705).
      * Static rows (IS_STATIC extended flag) carry no clustering block
      * and read the static-column schema (SSTable.cpp:575-577,605). */
    private def readNormalRow(flags: Int, isStatic: Boolean): List[MaCell] = {
      if (!isStatic) readClusteringValues(clustering.size)
      val cols = if (isStatic) staticColumns else columns
      readUnsignedVint() // row size
      readUnsignedVint() // previous unfiltered size

      var rowTs = 0L
      var rowTtl = NoTtl
      if ((flags & HAS_TIMESTAMP) != 0) {
        rowTs = readUnsignedVint() + minTimestamp
        if ((flags & HAS_TTL) != 0) {
          rowTtl = readUnsignedVint() + minTtl
          readUnsignedVint() // local deletion time
        }
      }
      val rowDeletion =
        if ((flags & HAS_DELETION) != 0) {
          val d = readUnsignedVint() + minTimestamp
          readUnsignedVint() // local deletion time
          d
        } else partitionDeletion

      val present =
        if ((flags & HAS_ALL_COLUMNS) != 0) Array.fill(cols.size)(true)
        else readColumnSubset(cols.size)

      val out = List.newBuilder[MaCell]
      var i = 0
      while (i < cols.size) {
        if (present(i)) {
          cols(i) match {
            case (name, CComplex(valueTpe)) =>
              // Complex column (Cassandra UnfilteredSerializer
              // writeComplexColumn): optional complex deletion — a
              // column-scoped tombstone over every sub-cell of this
              // column, emitted as a range marker bounded to exactly
              // the `name[...]` rendered-name range so the merge
              // applies it with ka-range-tombstone semantics — then a
              // vint cell count, each cell carrying its path.
              if ((flags & HAS_COMPLEX_DELETION) != 0) {
                val d = readUnsignedVint() + minTimestamp
                readUnsignedVint() // local deletion time
                if (d != NoDeletion)
                  // Range [name + "[", name + "[\uffff"]: every rendered
                  // sub-cell name sorts inside it, every other column
                  // outside (string order diverges at the '[').
                  out += MaCell(key, name + "[", d,
                    (name + "[\uffff").getBytes("UTF-8"),
                    deleted = true, expiring = false, ttlSec = NoTtl,
                    deletionTs = d, marker = true)
              }
              val n = readUnsignedVint().toInt
              var j = 0
              while (j < n) {
                out += readCell(name, valueTpe, complexPath = true,
                  rowTs, rowTtl, rowDeletion)
                j += 1
              }
            case (name, tpe) =>
              out += readCell(name, tpe, complexPath = false,
                rowTs, rowTtl, rowDeletion)
          }
        }
        i += 1
      }
      out.result()
    }

    /** Cell-path rendering for complex sub-cell names: printable ASCII
      * paths read as text, anything else (or a `]` that would break
      * the `name[path]` shape) as 0x-hex — deterministic either way. */
    private def renderPath(p: Array[Byte]): String =
      if (p.nonEmpty && p.forall(b => b >= 0x20 && b <= 0x7e && b != ']'))
        new String(p, "UTF-8")
      else "0x" + p.map(b => f"$b%02x").mkString

    /** One cell (read_column/read_column_data, SSTable.cpp:622-705;
      * Cassandra Cell.Serializer order): flags, timestamp, deletion/TTL
      * block, then — for complex columns only — the vint-length cell
      * path, then the value framed per the (value) type. */
    private def readCell(
        name: String, tpe: ColType, complexPath: Boolean,
        rowTs: Long, rowTtl: Long, rowDeletion: Long): MaCell = {
      val cellFlags = readByte()
      val ts =
        if ((cellFlags & USE_ROW_TIMESTAMP_MASK) != 0) rowTs
        else readUnsignedVint() + minTimestamp
      val deleted = (cellFlags & IS_DELETED_MASK) != 0
      var expiring = (cellFlags & IS_EXPIRING_MASK) != 0
      var ttl = NoTtl
      if ((cellFlags & USE_ROW_TTL_MASK) != 0) {
        expiring = rowTtl != NoTtl
        ttl = rowTtl
      } else {
        if (expiring || deleted) readUnsignedVint() // local deletion time
        if (expiring) ttl = readUnsignedVint() + minTtl
      }
      val colName =
        if (complexPath) s"$name[${renderPath(readBytes(readUnsignedVint().toInt))}]"
        else name
      val value =
        if ((cellFlags & HAS_EMPTY_VALUE_MASK) == 0) {
          val size =
            if (tpe.fixedSize >= 0) tpe.fixedSize
            else readUnsignedVint().toInt
          readBytes(size)
        } else null
      // Counter columns keep their flag so Kv routes them to
      // SUM-merge instead of LWW (SSTableSchema.cpp counter type;
      // the legacy path derives the same flag from COUNTER_MASK).
      MaCell(key, colName, ts, value, deleted, expiring, ttl,
        rowDeletion, marker = false, counter = tpe == CCounter)
    }

    /** read_row (SSTable.cpp:505): partition header / flags dispatch. */
    private def advance(): Unit = {
      while (pending.isEmpty && !eof) {
        if (atEndOfPartition) {
          if (stopAfter()) { eof = true; return }
          // Partition header: key, local deletion (skipped), deletion ts.
          val k = try readString() catch { case _: EOFException => eof = true; return }
          key = k
          skip(4) // local_deletion
          partitionDeletion = readLongLong()
          atEndOfPartition = false
          // A partition-level deletion is itself an unfiltered fact —
          // emit it as a marker row so it survives even when the
          // partition carries no cells (it must still suppress older
          // generations' cells in the merge).
          if (partitionDeletion != NoDeletion) {
            pending = List(MaCell(key, null, partitionDeletion, null,
              deleted = true, expiring = false, ttlSec = NoTtl,
              deletionTs = partitionDeletion, marker = true))
            return
          }
        }
        val flags = try readByte() catch { case _: EOFException => eof = true; return }
        if ((flags & END_OF_PARTITION) != 0) {
          atEndOfPartition = true
        } else {
          val extended = if ((flags & EXTENSION_FLAG) != 0) readByte() else 0
          val isStatic = (extended & IS_STATIC) != 0
          if (isStatic) require(staticColumns.nonEmpty,
            "static row but no staticColumns schema (pass the staticColumns option)")
          pending =
            if ((flags & IS_MARKER) != 0) List(readMarker(isStatic))
            else readNormalRow(flags, isStatic)
        }
      }
    }

    override def hasNext: Boolean = {
      if (pending.isEmpty && !eof) advance()
      pending.nonEmpty
    }

    override def next(): MaCell = {
      if (!hasNext) throw new NoSuchElementException
      val c = pending.head
      pending = pending.tail
      c
    }
  }

  /** Legacy "ja"/"ka" format reader (OldSStable, SSTable.cpp:337-457):
    * partitions are key + deletion header followed by named cells until
    * an EMPTY column name; cell values are 4-byte-length-prefixed; cell
    * flags distinguish live / deleted / expiring (4-byte TTL +
    * expiration) / counter / range-tombstone cells; composite column
    * names carry length-prefixed path elements that unwrap to their
    * final element. Pre-"ja" column-count framing (ancient) is not
    * supported. Emits the same MaCell shape as the "ma" reader.
    * `stopAfter` — see [[Reader]]. */
  final class KaReader(
      in: InputStream,
      stopAfter: () => Boolean = () => false) extends Iterator[MaCell] {

    private val DELETION_MASK = 0x01
    private val EXPIRATION_MASK = 0x02
    private val COUNTER_MASK = 0x04
    private val RANGE_TOMBSTONE_MASK = 0x10

    private val din = new DataInputStream(in)
    private var eof = false
    private var inPartition = false
    private var key: Array[Byte] = _
    private var partitionDeletion: Long = NoDeletion
    private var nextCell: MaCell = _

    private def readString(): Array[Byte] = {
      val b = new Array[Byte](din.readUnsignedShort()); din.readFully(b); b
    }

    /** Composite-path unwrap (SSTable.cpp:401-422): take the final
      * length-prefixed element of a compound/clustering name. */
    private def unwrapName(name: Array[Byte]): Array[Byte] = {
      var advanced = 0
      var bufferLen = name.length
      while (bufferLen >= 2) {
        val len = ((name(advanced) & 0xff) << 8) | (name(advanced + 1) & 0xff)
        if (bufferLen > len + 3) {
          advanced += len + 3
          bufferLen -= len + 3
        } else {
          if (bufferLen == len + 3)
            return java.util.Arrays.copyOfRange(name, advanced + 2, advanced + 2 + len)
          return name
        }
      }
      name
    }

    private def advance(): Unit = {
      nextCell = null
      while (nextCell == null && !eof) {
        if (!inPartition) {
          if (stopAfter()) { eof = true; return }
          val k = try readString() catch { case _: EOFException => eof = true; return }
          key = k
          try {
            val skip = new Array[Byte](4); din.readFully(skip) // local_deletion
            partitionDeletion = din.readLong()
          } catch { case _: EOFException => eof = true; return }
          inPartition = true
          // Emit the partition deletion as a marker row (see Reader).
          if (partitionDeletion != NoDeletion) {
            nextCell = MaCell(key, null, partitionDeletion, null,
              deleted = true, expiring = false, ttlSec = NoTtl,
              deletionTs = partitionDeletion, marker = true)
            return
          }
        }
        val name = try readString() catch { case _: EOFException => eof = true; return }
        if (name.isEmpty) {
          inPartition = false // empty name terminates the row
        } else {
          val colName = new String(unwrapName(name), "UTF-8")
          val flags = din.readUnsignedByte()
          if ((flags & RANGE_TOMBSTONE_MASK) != 0) {
            val rangeEnd = readString()
            val skip = new Array[Byte](4); din.readFully(skip) // local_deletion
            val ts = din.readLong()
            nextCell = MaCell(key, colName, ts, rangeEnd,
              deleted = true, expiring = false, ttlSec = NoTtl,
              deletionTs = ts, marker = true)
          } else {
            var counter = false
            var expiring = false
            var ttl = NoTtl
            if ((flags & COUNTER_MASK) != 0) {
              din.readLong() // counter timestamp-of-last-delete (unused)
              counter = true
            } else if ((flags & EXPIRATION_MASK) != 0) {
              ttl = din.readInt().toLong
              din.readInt() // expiration time (derivable from ts + ttl)
              expiring = true
            }
            val ts = din.readLong()
            val value = new Array[Byte](din.readInt())
            din.readFully(value)
            nextCell = MaCell(key, colName, ts, value,
              deleted = (flags & DELETION_MASK) != 0, expiring = expiring,
              ttlSec = ttl, deletionTs = partitionDeletion, marker = false,
              counter = counter)
          }
        }
      }
    }

    override def hasNext: Boolean = {
      if (nextCell == null && !eof) advance()
      nextCell != null
    }

    override def next(): MaCell = {
      if (!hasNext) throw new NoSuchElementException
      val c = nextCell
      nextCell = null
      c
    }
  }
}
