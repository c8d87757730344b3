package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.vectorized.{ConstantColumnVector, OnHeapColumnVector}
import org.apache.spark.sql.sources.{And, EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

/** The parquet LEAF READER of the manifest connector, in its
  * VECTORIZED form (VERDICT r11 ask #1): the scan serves
  * [[ColumnarBatch]]es of typed [[OnHeapColumnVector]]s — one batch
  * per surviving row group, each column decoded in a monomorphic
  * primitive loop straight from the parquet column reader into the
  * vector, no per-value boxing and no per-row record assembly — so
  * Catalyst consumes columnar input exactly as it does from Spark's
  * native parquet source (the plan shows the scan under
  * `ColumnarToRow`). The plan-side structure is unchanged from the
  * row-serving reader it replaces:
  *
  *  - ONE footer open per split, reused for schema, row-group
  *    metadata, stats, blooms, and the data read itself;
  *  - the split serves its half-open ROW-GROUP range, skipping groups
  *    outside it without I/O (row-group-granular splits);
  *  - within the range, groups whose column-chunk [min,max]+nullcount
  *    statistics prove the pushed conjunction can match no row are
  *    skipped, as are groups whose FOOTER BLOOM FILTER proves a pushed
  *    equality value absent — zero data pages read either way;
  *  - count-only / provenance-only projections decode NOTHING: row
  *    counts come from the footer's row-group metadata, `_file` is a
  *    constant vector and `_pos` a sequence vector.
  *
  * Merge-on-read deletes compose with the columnar serve: POSITION
  * deletes (a BitSet of absolute ordinals) and EQUALITY deletes (typed
  * dead-key tuples, [[ManifestV2.readEqDeleteTyped]] — single- or
  * multi-column, BIGINT or STRING keys, NULL components never match)
  * mark dead rows in a keep mask, and a group with dead rows COMPACTS
  * into shorter vectors (survivors only, `_pos` still carrying the
  * ORIGINAL absolute ordinals so delete semantics stay observable).
  * Absolute ordinals are exact by construction: every group's first
  * ordinal is the running sum of the preceding groups' footer row
  * counts, whether those groups were read or skipped.
  *
  * The row-serving `createReader` path is kept (Spark's
  * PartitionReaderFactory contract requires it, and internal
  * consumers may ask for rows); both paths share [[ManifestSplitState]]
  * so pruning, delete handling, and schema resolution cannot drift.
  * Row-group skipping is a pure I/O optimization for correctness
  * purposes: every pushed filter is also returned as residual and
  * re-applied above the scan.
  */
class ManifestReaderFactory(full: StructType, required: StructType,
    pushed: Array[Filter] = Array.empty,
    aliases: Map[String, Seq[String]] = Map.empty,
    defaults: Map[String, String] = Map.empty)
    extends PartitionReaderFactory {

  /** Columnar whenever every served type has a vector representation —
    * for the manifest row format (long/int/double/boolean/string,
    * enforced at write time) that is always; the check keeps an
    * unsupported future type on the row path instead of failing the
    * scan. Partition-independent, so one scan never mixes modes
    * (Spark requires uniformity across a scan's partitions).
    */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    ManifestReaderFactory.vectorizable(required) &&
      ManifestReaderFactory.vectorizable(full)

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val st = ManifestSplitState(ManifestReaderFactory.filePartOf(p),
      full, required, pushed, aliases, defaults)
    try {
      if (st.nCols == 0) new ManifestCountOnlyRowReader(st)
      else new ManifestRowReader(st)
    } catch { case e: Throwable => st.close(); throw e }
  }

  override def createColumnarReader(
      p: InputPartition): PartitionReader[ColumnarBatch] = {
    val st = ManifestSplitState(ManifestReaderFactory.filePartOf(p),
      full, required, pushed, aliases, defaults)
    try new ManifestColumnarReader(st)
    catch { case e: Throwable => st.close(); throw e }
  }
}

object ManifestReaderFactory {
  private[sources] def filePartOf(p: InputPartition): ManifestFilePartition =
    p match {
      case f: ManifestFilePartition => f
      case b: ManifestBucketedPartition =>
        ManifestFilePartition(b.root, b.file, b.deletes, b.rgLo, b.rgHi)
      case o => throw new IllegalArgumentException(
        s"unexpected input partition ${o.getClass.getName}")
    }

  private[sources] def vectorizable(s: StructType): Boolean =
    s.fields.forall(f => f.dataType match {
      case LongType | IntegerType | DoubleType | BooleanType | StringType |
        TimestampType | TimestampNTZType | DateType => true
      case _ => false
    })
}

/** One EQUALITY-DELETE check against a decoded batch: the key columns'
  * positions in the decode set and the dead key tuples. A row dies iff
  * every component is NON-NULL and the tuple is in the set (SQL
  * equality: NULL never matches). Single-column checks — the common
  * case, and the only shape the streaming upsert sink emits — probe a
  * flat set without tuple allocation; COMPOSITE checks probe an
  * open-addressed table of component arrays through one REUSED buffer
  * (the check lives on one split's single-threaded reader), so a
  * multi-column `DELETE WHERE a=… AND b=…` costs zero allocation per
  * surviving row instead of a Seq wrap + tuple hash per row.
  */
private[sources] final class ManifestEqCheck(val srcs: Array[Int],
    keys: Set[Seq[Any]]) {
  private val single: Set[Any] =
    if (srcs.length == 1) keys.iterator.map(_.head).toSet else null

  private def hashOf(a: Array[Any]): Int = {
    var h = 1
    var i = 0
    while (i < a.length) { h = h * 31 + a(i).hashCode; i += 1 }
    h ^ (h >>> 16)
  }
  private def eqArr(a: Array[Any], b: Array[Any]): Boolean = {
    var i = 0
    while (i < a.length) { if (a(i) != b(i)) return false; i += 1 }
    true
  }
  // per-row component buffer + linear-probe table, built once
  private val comps: Array[Any] =
    if (single == null) new Array[Any](srcs.length) else null
  private val table: Array[Array[Any]] =
    if (single == null) {
      var cap = 8
      while (cap < keys.size * 2) cap <<= 1
      val t = new Array[Array[Any]](cap)
      keys.foreach { k =>
        val arr = k.toArray
        var i = hashOf(arr) & (cap - 1)
        while (t(i) != null && !eqArr(t(i), arr)) i = (i + 1) & (cap - 1)
        t(i) = arr
      }
      t
    } else null
  private val mask: Int = if (table != null) table.length - 1 else 0

  /** `get` returns the decoded value at the batch's current row for a
    * decode-set column index, or null.
    */
  def deadAt(get: Int => Any): Boolean =
    if (single != null) {
      val v = get(srcs(0)); v != null && single.contains(v)
    } else {
      var j = 0
      while (j < srcs.length) {
        val v = get(srcs(j))
        if (v == null) return false
        comps(j) = v
        j += 1
      }
      var i = hashOf(comps) & mask
      while (table(i) != null) {
        if (eqArr(table(i), comps)) return true
        i = (i + 1) & mask
      }
      false
    }
}

private[sources] object ManifestSplitState {
  /** Opens the split's footer and resolves the read plan; the footer
    * is closed on any construction failure (the constructor is the
    * only thing that touches it before the reader object owns it).
    */
  def apply(fp: ManifestFilePartition, full: StructType,
      required: StructType, pushed: Array[Filter],
      aliases: Map[String, Seq[String]] = Map.empty,
      defaults: Map[String, String] = Map.empty): ManifestSplitState = {
    val conf = ManifestV2.leafConf()
    val hPath = new org.apache.hadoop.fs.Path(
      Paths.get(fp.root).resolve(fp.file).toString)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hPath, conf))
    try new ManifestSplitState(fp, full, required, pushed, reader,
      aliases, defaults)
    catch {
      case e: Throwable =>
        try reader.close() catch { case _: Exception => () }
        throw e
    }
  }
}

/** Everything both leaf readers (row and columnar) need about one
  * split, computed once off a SINGLE footer open: delete sidecars
  * loaded and typed, the decode column set resolved by name against
  * the file's own footer schema (evolution-missing columns null-fill;
  * pushed-filter and equality-delete key columns are FORCED into the
  * decode set so residual evaluation and by-value subtraction see real
  * values), and the row-group skip decision (stats tri-state + bloom
  * probe) shared verbatim.
  */
private[sources] final class ManifestSplitState(
    val fp: ManifestFilePartition, full: StructType,
    val required: StructType, pushed: Array[Filter],
    val reader: org.apache.parquet.hadoop.ParquetFileReader,
    aliases: Map[String, Seq[String]] = Map.empty,
    defaults: Map[String, String] = Map.empty) {

  val fileName: UTF8String = UTF8String.fromString(fp.file)
  private val rootPath = Paths.get(fp.root)

  // RENAME COLUMN resolution: a footer written before the rename
  // carries the OLD physical name. `footerNameOf` finds the name a
  // CURRENT column actually has in THIS file (newest alias first);
  // `currentOf` translates stored old names (sidecar headers, chunk
  // paths) back to current ones. Both empty-cost when no rename ever
  // happened.
  private val currentOf: Map[String, String] =
    aliases.iterator.flatMap { case (cur, olds) =>
      olds.iterator.map(_ -> cur)
    }.toMap

  // merge-on-read: POSITION sidecars union into a BitSet of dead
  // absolute ordinals; EQUALITY sidecars parse typed (v1 bare-BIGINT
  // or v2 multi-column headers) for by-value subtraction
  private val (eqRefs, posRefs) = fp.deletes.partition(ManifestV2.isEqDelete)
  val deleted = new java.util.BitSet()
  posRefs.foreach { d =>
    Files.readAllLines(rootPath.resolve(d), StandardCharsets.UTF_8)
      .forEach { l =>
        if (l.nonEmpty) {
          val pos = l.toLong
          // positions index a BitSet: fail loudly past Int range (a
          // single data file that large predates compaction norms)
          require(pos >= 0 && pos <= Int.MaxValue,
            s"delete position $pos in $d exceeds the supported file size")
          deleted.set(pos.toInt)
        }
      }
  }
  val hasDeletes: Boolean = !deleted.isEmpty

  val footer = reader.getFooter
  // the file's OWN footer schema decides what exists: a file written
  // before an ADD COLUMN evolution simply lacks the column by name and
  // null-fills — by-name resolution, the Iceberg shape
  val fileSchema = footer.getFileMetaData.getSchema
  /** The physical name a CURRENT column carries in THIS footer: the
    * name itself, or its newest alias the footer knows. None =
    * evolution-missing (null-fill).
    */
  private def footerNameOf(c: String): Option[String] =
    if (fileSchema.containsField(c)) Some(c)
    else aliases.getOrElse(c, Nil).find(fileSchema.containsField)
  val createdBy: String = footer.getFileMetaData.getCreatedBy
  val blocks = footer.getBlocks
  val rgLo: Int = math.max(0, fp.rgLo)
  val rgHi: Int = math.min(blocks.size(), fp.rgHi)

  // equality deletes that can apply to THIS file: every key column
  // present (an evolution-era file missing one is all-null there, and
  // NULL never matches an equality — the sidecar is vacuous for it)
  private val eqApplicable: Seq[ManifestV2.EqDelete] =
    eqRefs.map(ManifestV2.readEqDeleteTyped(rootPath, _))
      // sidecars written before a RENAME name the old column
      .map(e => e.copy(cols = e.cols.map { case (c, t) =>
        (currentOf.getOrElse(c, c), t) }))
      .filter(_.cols.forall { case (c, _) => footerNameOf(c).isDefined })

  // data columns to DECODE = required ∩ file footer, in required
  // order; `_file`/`_pos` (metadata columns) are served from the
  // split and the read position, and evolution-missing columns are
  // NULL constants — none of them touches a data page
  private val dataFields0 = required.fields.filter(f =>
    f.name != ManifestTable.FileMetaCol &&
      f.name != ManifestTable.PosMetaCol &&
      footerNameOf(f.name).isDefined)
  // defensive: the footer-count fast path must not swallow a pushed
  // filter — if one references data columns this file has, decode them
  // so the residual above the scan sees real values
  private val dataFields1 =
    if (dataFields0.nonEmpty || pushed.isEmpty) dataFields0
    else full.fields.filter(f => pushed.flatMap(_.references)
      .contains(f.name) && footerNameOf(f.name).isDefined)
  // equality-delete key columns are FORCED into the decode set the
  // same way: subtracting by value needs the values
  val dataFields: Array[StructField] = dataFields1 ++
    full.fields.filter(f =>
      eqApplicable.exists(_.cols.exists(_._1 == f.name)) &&
        !dataFields1.exists(_.name == f.name))
  val dataPos: Map[String, Int] = dataFields.map(_.name).zipWithIndex.toMap
  val nCols: Int = dataFields.length
  /** required-field → source: decode-set index, or -1 `_file`,
    * -3 `_pos`, -2 evolution-missing (NULL, or the column's
    * EXISTENCE DEFAULT when one is recorded).
    */
  val srcOf: Array[Int] = required.fields.map { f =>
    if (f.name == ManifestTable.FileMetaCol) -1
    else if (f.name == ManifestTable.PosMetaCol) -3
    else dataPos.getOrElse(f.name, -2)
  }
  /** Per-required-column existence default in INTERNAL form (boxed
    * primitive / UTF8String), non-null ONLY for evolution-missing
    * columns (srcOf == -2) that carry one — a file that physically
    * has the column always serves its real values.
    */
  val defaultAt: Array[Any] = required.fields.zipWithIndex.map {
    case (f, i) =>
      if (srcOf(i) == -2)
        defaults.get(f.name)
          .map(ManifestV2.defaultValueOf(f.dataType, _)).orNull
      else null
  }
  /** Per-column decode tag (monomorphic inner loops):
    * 0=long 1=int 2=double 3=boolean 4=string, and 5=INT32 chunk
    * under a widened BIGINT-family logical type (ALTER COLUMN TYPE
    * INT -> BIGINT: the file predates the widening, so its pages
    * decode as ints and up-cast into the long vector — the type
    * analog of alias-chain name resolution). Temporal types are
    * physically their integer internal form (micros/days), so they
    * share the long/int loops — the vector is constructed with the
    * LOGICAL type, so Catalyst sees timestamps, not longs.
    */
  val tag: Array[Int] = dataFields.map { f =>
    val logical = f.dataType match {
      case LongType | TimestampType | TimestampNTZType => 0
      case IntegerType | DateType => 1
      case DoubleType => 2
      case BooleanType => 3
      case StringType => 4
      case o => throw new UnsupportedOperationException(
        s"ManifestV2 row format does not support $o")
    }
    if (logical == 0 &&
        footerTypeOf(footerNameOf(f.name).get).asPrimitiveType()
          .getPrimitiveTypeName ==
          org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT32)
      5
    else logical
  }
  /** The footer's own Type for a physical column name (GroupType
    * overload disambiguated by index).
    */
  private def footerTypeOf(name: String): org.apache.parquet.schema.Type =
    fileSchema.getType(fileSchema.getFieldIndex(name))
  // project at the parquet I/O layer: only the requested columns'
  // chunks are read from disk.
  // The projection takes each column's Type from the FILE'S OWN
  // footer: that keeps both the PHYSICAL NAME (an old file serves a
  // renamed column under its old name) and the PHYSICAL TYPE (a
  // pre-widening file's INT32 pages must decode as INT32 — requesting
  // INT64 against them would misread the page bytes). Positions align
  // with dataFields, so everything above stays on current names and
  // logical types.
  val requested: org.apache.parquet.schema.MessageType =
    if (nCols == 0) null
    else {
      val b = org.apache.parquet.schema.Types.buildMessage()
      dataFields.foreach(f =>
        b.addField(footerTypeOf(footerNameOf(f.name).get)))
      b.named("graft_row")
    }
  if (requested != null) reader.setRequestedSchema(requested)
  val colDescs = if (requested == null) null else requested.getColumns

  // bloom probes stay BIGINT-only (the writer only builds blooms
  // there); chunk-statistics skipping covers every box-eligible type
  // (BIGINT / INT / TIMESTAMP micros / DATE days — [[ManifestV2.statType]])
  private val longCols: Set[String] = full.fields
    .collect { case f if f.dataType == LongType => f.name }.toSet
  private val statWidth: Map[String, Int] = full.fields.iterator
    .map(f => f.name -> ManifestV2.statType(f.dataType))
    .filter(_._2 != 0).toMap
  private def conjuncts(f: Filter): Seq[Filter] = f match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case o => Seq(o)
  }
  /** Top-level conjuncts of the pushed conjunction (AND flattened;
    * anything under OR/NOT stays compound): each is individually
    * necessary, so any one proving "no match" in a row group skips it.
    */
  private val flatConj: Array[Filter] = pushed.flatMap(conjuncts)

  val eqChecks: Array[ManifestEqCheck] = eqApplicable.map { e =>
    new ManifestEqCheck(e.cols.map { case (c, _) => dataPos(c) }.toArray,
      e.keys)
  }.toArray

  /** Row-group-level skip decision off the footer: chunk statistics
    * feed the same null-sound tri-state as file-level boxes; surviving
    * equality conjuncts then probe the chunk's bloom filter. Sound
    * because every conjunct is individually necessary and deletes only
    * remove rows.
    */
  def pruned(b: org.apache.parquet.hadoop.metadata.BlockMetaData): Boolean = {
    if (flatConj.isEmpty) return false
    val stats = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val nulls = scala.collection.mutable.Map.empty[String, Long]
    val chunks = scala.collection.mutable.Map.empty[String,
      org.apache.parquet.hadoop.metadata.ColumnChunkMetaData]
    val it = b.getColumns.iterator()
    while (it.hasNext) {
      val cc = it.next()
      val raw = cc.getPath.toDotString
      // chunk paths are physical names; index by CURRENT name so the
      // pushed conjunction (current names) decides directly
      val name = currentOf.getOrElse(raw, raw)
      chunks(name) = cc
      if (statWidth.contains(name)) {
        val s = cc.getStatistics
        if (s != null && !s.isEmpty) {
          if (s.hasNonNullValue) s.genericGetMin match {
            case lo: java.lang.Long =>
              stats(name) = (lo.longValue(),
                s.genericGetMax.asInstanceOf[java.lang.Long].longValue())
            case lo: java.lang.Integer =>
              stats(name) = (lo.longValue(),
                s.genericGetMax.asInstanceOf[java.lang.Integer].longValue())
            case _ => ()
          }
          if (s.isNumNullsSet) nulls(name) = s.getNumNulls
        }
      }
    }
    val entry = ManifestV2.FileEntry(fp.file, b.getRowCount,
      stats.toMap, Nil, nulls.toMap)
    if (ManifestV2.decideBox(pushed, entry).contains(false)) {
      ManifestV2.rgStatsSkipCount.increment()
      return true
    }
    var bfr: org.apache.parquet.hadoop.BloomFilterReader = null
    var ci = 0
    while (ci < flatConj.length) {
      flatConj(ci) match {
        case EqualTo(c, v: java.lang.Number) if longCols.contains(c) &&
            chunks.contains(c) =>
          if (bfr == null) bfr = reader.getBloomFilterDataReader(b)
          val bf = bfr.readBloomFilter(chunks(c))
          if (bf != null && !bf.findHash(bf.hash(v.longValue()))) {
            ManifestV2.rgBloomSkipCount.increment()
            return true
          }
        // IN — the shape runtime (DPP) filters arrive in: the group is
        // skippable when the bloom disproves EVERY listed key. Bounded
        // so a huge realized key list doesn't turn the probe itself
        // into the cost.
        case org.apache.spark.sql.sources.In(c, vs)
            if vs.nonEmpty && vs.length <= 64 && longCols.contains(c) &&
              chunks.contains(c) &&
              vs.forall(_.isInstanceOf[java.lang.Number]) =>
          if (bfr == null) bfr = reader.getBloomFilterDataReader(b)
          val bf = bfr.readBloomFilter(chunks(c))
          if (bf != null && vs.forall(v =>
            !bf.findHash(bf.hash(v.asInstanceOf[java.lang.Number]
              .longValue())))) {
            ManifestV2.rgBloomSkipCount.increment()
            return true
          }
        case _ => ()
      }
      ci += 1
    }
    false
  }

  private var closed = false
  def close(): Unit = if (!closed) { closed = true; reader.close() }
}

/** Count-only / provenance-only / position-only projection, row form:
  * row counts come from the footer's row-group metadata and positions
  * from counting; ZERO data pages are read or decoded. The footer is
  * closed at construction — nothing else is needed from it.
  */
private[sources] final class ManifestCountOnlyRowReader(
    st: ManifestSplitState) extends PartitionReader[InternalRow] {
  private val (startPos, endPos) = {
    var s = 0L
    var i = 0
    while (i < st.rgLo) { s += st.blocks.get(i).getRowCount; i += 1 }
    var e = s
    while (i < st.rgHi) { e += st.blocks.get(i).getRowCount; i += 1 }
    st.close()
    (s, e)
  }
  private var pos = startPos - 1L
  private var row: InternalRow = _
  override def next(): Boolean = {
    pos += 1
    if (st.hasDeletes) // guard: BitSet indexing only when sidecars
      // exist AND the ordinal fits — delete positions are
      // require()-bounded to Int range at load, so any larger
      // ordinal is live by construction
      while (pos < endPos && pos <= Int.MaxValue &&
        st.deleted.get(pos.toInt)) pos += 1
    if (pos >= endPos) return false
    row = InternalRow.fromSeq(st.srcOf.toIndexedSeq.zipWithIndex.map {
      case (s, c) =>
        if (s == -1) st.fileName
        else if (s == -3) pos
        else st.defaultAt(c) // -2: existence default, or null
    })
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}

/** The row-serving leaf (kept for the PartitionReaderFactory contract
  * and direct internal consumers): decodes surviving groups
  * column-batched through the column reader API, then serves rows off
  * the arrays, subtracting position- and equality-deleted rows.
  */
private[sources] final class ManifestRowReader(st: ManifestSplitState)
    extends PartitionReader[InternalRow] {
  private var blockIdx = 0
  private var base = 0L // absolute ordinal of blocks(blockIdx)'s first row
  private var batch: Array[Array[Any]] = _
  private var batchRows = 0
  private var batchBase = 0L
  private var idx = 0
  private var row: InternalRow = _

  /** Decode ONE row group column-batched: for each projected column,
    * one pass through its column reader into a value array — no
    * per-row record assembly.
    */
  private def decode(
      pages: org.apache.parquet.column.page.PageReadStore): Unit = {
    val n64 = pages.getRowCount
    require(n64 <= Int.MaxValue, s"row group of $n64 rows in " +
      s"${st.fp.file} exceeds the supported group size")
    val n = n64.toInt
    val crs = new org.apache.parquet.column.impl.ColumnReadStoreImpl(
      pages,
      new org.apache.parquet.example.data.simple.convert
        .GroupRecordConverter(st.requested).getRootConverter,
      st.requested, st.createdBy)
    val cols = new Array[Array[Any]](st.nCols)
    var j = 0
    while (j < st.nCols) {
      val desc = st.colDescs.get(j)
      val cr = crs.getColumnReader(desc)
      val maxDef = desc.getMaxDefinitionLevel
      val t = st.tag(j)
      val a = new Array[Any](n)
      var k = 0
      while (k < n) {
        if (cr.getCurrentDefinitionLevel == maxDef) a(k) = t match {
          case 0 => java.lang.Long.valueOf(cr.getLong)
          case 1 => java.lang.Integer.valueOf(cr.getInteger)
          case 2 => java.lang.Double.valueOf(cr.getDouble)
          case 3 => java.lang.Boolean.valueOf(cr.getBoolean)
          case 5 => java.lang.Long.valueOf(cr.getInteger.toLong) // widened
          case _ => UTF8String.fromBytes(cr.getBinary.getBytes)
        }
        cr.consume()
        k += 1
      }
      cols(j) = a
      j += 1
    }
    batch = cols; batchRows = n; batchBase = base; idx = 0
  }

  /** Advance to the next decodable row group in range; false = split
    * exhausted. Skipped groups (out of range, stats- or bloom-pruned)
    * advance the reader's cursor WITHOUT I/O and the ordinal base by
    * their footer row count.
    */
  private def advance(): Boolean = {
    while (blockIdx < st.rgHi) {
      val b = st.blocks.get(blockIdx)
      if (blockIdx < st.rgLo || st.pruned(b)) {
        st.reader.skipNextRowGroup()
        base += b.getRowCount
        blockIdx += 1
      } else {
        val pages = st.reader.readNextRowGroup()
        blockIdx += 1
        decode(pages)
        base += b.getRowCount
        return true
      }
    }
    false
  }

  /** A row's equality-delete verdict off the decoded batch: dead iff
    * some sidecar's key tuple matches its (all-non-null) values.
    */
  private def eqDead(i: Int): Boolean = {
    var c = 0
    while (c < st.eqChecks.length) {
      if (st.eqChecks(c).deadAt(src => batch(src)(i))) return true
      c += 1
    }
    false
  }

  override def next(): Boolean = {
    while (true) {
      if (batch == null || idx >= batchRows) {
        if (!advance()) return false
      }
      val pos = batchBase + idx
      val i = idx
      idx += 1
      if (!(st.hasDeletes && pos <= Int.MaxValue &&
          st.deleted.get(pos.toInt)) &&
          !(st.eqChecks.nonEmpty && eqDead(i))) {
        val vals = new Array[Any](st.srcOf.length)
        var c = 0
        while (c < st.srcOf.length) {
          val s = st.srcOf(c)
          vals(c) =
            if (s >= 0) batch(s)(i)
            else if (s == -1) st.fileName
            else if (s == -3) pos
            else st.defaultAt(c) // -2: existence default, or null
          c += 1
        }
        row = new GenericInternalRow(vals)
        return true
      }
    }
    false
  }
  override def get(): InternalRow = row
  override def close(): Unit = st.close()
}

/** The COLUMNAR leaf: one [[ColumnarBatch]] per surviving row group,
  * decoded straight into typed [[OnHeapColumnVector]]s. Groups with
  * dead rows (position or equality deletes) compact into
  * survivors-only vectors; `_file` serves as a constant vector, `_pos`
  * as the original absolute ordinals, evolution-missing columns as
  * constant nulls. Count-only projections close the parquet reader at
  * construction and serve batches off footer row counts alone.
  */
private[sources] final class ManifestColumnarReader(st: ManifestSplitState)
    extends PartitionReader[ColumnarBatch] {
  private val countOnly = st.nCols == 0
  // footer row counts, captured so the count-only path can close the
  // reader before serving
  private val blockRows: Array[Long] =
    Array.tabulate(st.blocks.size())(i => st.blocks.get(i).getRowCount)
  if (countOnly) st.close()

  private var blockIdx = 0
  private var base = 0L
  private var batch: ColumnarBatch = _
  // vectors owned by the CURRENT batch plus decoded-but-unserved ones
  // (equality-key columns outside the projection, pre-compaction
  // originals) — released together before the next group decodes
  private var owned: Array[ColumnVector] = _

  private def release(): Unit = {
    if (owned != null) {
      var i = 0
      while (i < owned.length) {
        if (owned(i) != null) owned(i).close()
        i += 1
      }
      owned = null
    }
    batch = null
  }

  override def next(): Boolean = {
    release()
    while (blockIdx < st.rgHi) {
      val inRange = blockIdx >= st.rgLo
      if (!inRange ||
          (!countOnly && st.pruned(st.blocks.get(blockIdx)))) {
        if (!countOnly) st.reader.skipNextRowGroup()
        base += blockRows(blockIdx)
        blockIdx += 1
      } else {
        val b = buildBatch()
        base += blockRows(blockIdx)
        blockIdx += 1
        if (b != null) { batch = b; return true } // fully-deleted group
      }
    }
    false
  }

  /** Decode the row group at the reader's cursor into one batch, or
    * null when every row of it is deleted.
    */
  private def buildBatch(): ColumnarBatch = {
    val n64 = blockRows(blockIdx)
    require(n64 <= Int.MaxValue, s"row group of $n64 rows in " +
      s"${st.fp.file} exceeds the supported group size")
    val n = n64.toInt
    val dataVecs = new Array[OnHeapColumnVector](st.nCols)
    if (!countOnly) {
      val pages = st.reader.readNextRowGroup()
      val crs = new org.apache.parquet.column.impl.ColumnReadStoreImpl(
        pages,
        new org.apache.parquet.example.data.simple.convert
          .GroupRecordConverter(st.requested).getRootConverter,
        st.requested, st.createdBy)
      var j = 0
      while (j < st.nCols) {
        val desc = st.colDescs.get(j)
        val cr = crs.getColumnReader(desc)
        val maxDef = desc.getMaxDefinitionLevel
        val vec = new OnHeapColumnVector(n, st.dataFields(j).dataType)
        // monomorphic per-type loops: parquet column reader → typed
        // vector put, nothing boxes
        st.tag(j) match {
          case 0 =>
            var k = 0
            while (k < n) {
              if (cr.getCurrentDefinitionLevel == maxDef)
                vec.putLong(k, cr.getLong)
              else vec.putNull(k)
              cr.consume(); k += 1
            }
          case 1 =>
            var k = 0
            while (k < n) {
              if (cr.getCurrentDefinitionLevel == maxDef)
                vec.putInt(k, cr.getInteger)
              else vec.putNull(k)
              cr.consume(); k += 1
            }
          case 2 =>
            var k = 0
            while (k < n) {
              if (cr.getCurrentDefinitionLevel == maxDef)
                vec.putDouble(k, cr.getDouble)
              else vec.putNull(k)
              cr.consume(); k += 1
            }
          case 3 =>
            var k = 0
            while (k < n) {
              if (cr.getCurrentDefinitionLevel == maxDef)
                vec.putBoolean(k, cr.getBoolean)
              else vec.putNull(k)
              cr.consume(); k += 1
            }
          case 5 => // pre-widening INT32 pages into the LONG vector
            var k = 0
            while (k < n) {
              if (cr.getCurrentDefinitionLevel == maxDef)
                vec.putLong(k, cr.getInteger.toLong)
              else vec.putNull(k)
              cr.consume(); k += 1
            }
          case _ =>
            var k = 0
            while (k < n) {
              if (cr.getCurrentDefinitionLevel == maxDef) {
                val bs = cr.getBinary.getBytes
                vec.putByteArray(k, bs, 0, bs.length)
              } else vec.putNull(k)
              cr.consume(); k += 1
            }
        }
        dataVecs(j) = vec
        j += 1
      }
    }
    // keep mask: position deletes by absolute ordinal, equality
    // deletes by decoded value (key columns are in the decode set)
    var live = n
    var keep: Array[Boolean] = null
    if (st.hasDeletes || st.eqChecks.nonEmpty) {
      keep = new Array[Boolean](n)
      var k = 0
      while (k < n) {
        val pos = base + k
        var alive = !(st.hasDeletes && pos <= Int.MaxValue &&
          st.deleted.get(pos.toInt))
        if (alive && st.eqChecks.nonEmpty) alive = !eqDeadAt(dataVecs, k)
        keep(k) = alive
        if (!alive) live -= 1
        k += 1
      }
      if (live == n) keep = null
    }
    if (live == 0) {
      var j = 0
      while (j < dataVecs.length) {
        if (dataVecs(j) != null) dataVecs(j).close(); j += 1
      }
      return null
    }
    val out = new Array[ColumnVector](st.srcOf.length)
    val served = new Array[Boolean](st.nCols)
    var c = 0
    while (c < st.srcOf.length) {
      val s = st.srcOf(c)
      out(c) =
        if (s == -1) {
          val v = new ConstantColumnVector(live, StringType)
          v.setUtf8String(st.fileName)
          v
        } else if (s == -2) {
          // evolution-missing: the column's existence default, or NULL
          val v = new ConstantColumnVector(live,
            st.required.fields(c).dataType)
          st.defaultAt(c) match {
            case null => v.setNull()
            case l: java.lang.Long => v.setLong(l.longValue())
            case iv: java.lang.Integer => v.setInt(iv.intValue())
            case dv: java.lang.Double => v.setDouble(dv.doubleValue())
            case b: java.lang.Boolean => v.setBoolean(b.booleanValue())
            case u: UTF8String => v.setUtf8String(u)
            case o => throw new IllegalStateException(
              s"unexpected default value ${o.getClass.getName}")
          }
          v
        } else if (s == -3) {
          // `_pos` carries ORIGINAL absolute ordinals through
          // compaction — merge-on-read semantics stay observable
          val v = new OnHeapColumnVector(live, LongType)
          var k = 0
          var o = 0
          while (k < n) {
            if (keep == null || keep(k)) { v.putLong(o, base + k); o += 1 }
            k += 1
          }
          v
        } else if (keep == null) {
          served(s) = true
          dataVecs(s)
        } else compact(dataVecs(s), st.tag(s),
          st.dataFields(s).dataType, keep, n, live)
      c += 1
    }
    // ownership: the batch's vectors plus decoded originals the batch
    // does NOT serve (eq-key-only columns; compacted-away originals)
    val extras = (0 until st.nCols).filter(j => !served(j)).map(dataVecs)
    owned = out ++ extras
    new ColumnarBatch(out, live)
  }

  /** Survivors-only copy of one decoded vector (typed loops). */
  private def compact(src: OnHeapColumnVector, t: Int, dt: DataType,
      keep: Array[Boolean], n: Int, live: Int): OnHeapColumnVector = {
    val v = new OnHeapColumnVector(live, dt)
    var k = 0
    var o = 0
    while (k < n) {
      if (keep(k)) {
        if (src.isNullAt(k)) v.putNull(o)
        else t match {
          case 0 | 5 => v.putLong(o, src.getLong(k))
          case 1 => v.putInt(o, src.getInt(k))
          case 2 => v.putDouble(o, src.getDouble(k))
          case 3 => v.putBoolean(o, src.getBoolean(k))
          case _ =>
            val u = src.getUTF8String(k)
            val bs = u.getBytes
            v.putByteArray(o, bs, 0, bs.length)
        }
        o += 1
      }
      k += 1
    }
    v
  }

  /** Equality-delete verdict for row k off the decoded vectors. */
  private def eqDeadAt(vecs: Array[OnHeapColumnVector], k: Int): Boolean = {
    var c = 0
    while (c < st.eqChecks.length) {
      if (st.eqChecks(c).deadAt { src =>
        val vec = vecs(src)
        if (vec.isNullAt(k)) null
        else st.tag(src) match {
          case 0 | 5 => java.lang.Long.valueOf(vec.getLong(k))
          case 1 => java.lang.Integer.valueOf(vec.getInt(k))
          case 2 => java.lang.Double.valueOf(vec.getDouble(k))
          case 3 => java.lang.Boolean.valueOf(vec.getBoolean(k))
          case _ => vec.getUTF8String(k)
        }
      }) return true
      c += 1
    }
    false
  }

  override def get(): ColumnarBatch = batch
  override def close(): Unit = {
    release()
    st.close()
  }
}
