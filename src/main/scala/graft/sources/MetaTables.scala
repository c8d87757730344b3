package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** METADATA TABLES — the Iceberg `t.history` / `t.files` / `t.tags` /
  * `t.branches` shape: SELECT-able system views of a table's own log,
  * computed from manifest headers, file entries, and refs — no data
  * file is ever opened. [[GraftCatalog.loadTable]] resolves them when
  * an identifier's namespace tail names a real table and its leaf
  * names a view: `SELECT * FROM graft.db.events.history ORDER BY
  * version` — the ops companion to time travel (history answers "what
  * timestamp do I travel to", files answers "what does the current
  * layout look like", tags/branches answer "what is pinned/staged").
  *
  * Row counts are bounded by metadata, not data: history = retained
  * versions (expiry-capped), files = current snapshot entries, tags/
  * branches = refs. One input partition serves externalized values;
  * the reader rebuilds InternalRows typed by the view schema.
  */
object MetaTables {
  val Names: Set[String] =
    Set("history", "files", "tags", "branches", "partitions", "refs")

  def schemaOf(kind: String): StructType = kind match {
    case "history" => StructType(Seq(
      StructField("version", LongType, nullable = false),
      // null = pre-upgrade manifest (no @ts header)
      StructField("committed_at", TimestampType, nullable = true),
      StructField("maintenance", BooleanType, nullable = false),
      StructField("files", LongType, nullable = false),
      StructField("rows", LongType, nullable = false)))
    case "files" => StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("sidecars", LongType, nullable = false),
      StructField("row_groups", LongType, nullable = false),
      // rendered reserved partition boxes, e.g. "@p.0=19815,@p.1=3";
      // null for files carrying none
      StructField("partition", StringType, nullable = true)))
    case "tags" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("version", LongType, nullable = false)))
    case "branches" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("tip", LongType, nullable = false),
      StructField("base_version", LongType, nullable = false)))
    case "refs" => StructType(Seq(
      // every named pointer into the log in ONE view (the Iceberg
      // `refs` table): tags pin a version, branches carry a tip
      // ordinal over a fork base
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false), // tag|branch
      StructField("version", LongType, nullable = false), // pin / base
      StructField("tip", LongType, nullable = true))) // branches only
    case "partitions" => StructType(Seq(
      // rendered tuple ("@p.0=19815,@p.1=3"); null = files written
      // under no partitioning (or before the table's first spec)
      StructField("partition", StringType, nullable = true),
      // the spec ERA the tuple belongs to (parsed from the reserved
      // key: `@p` = 0, `@p1` = 1, …); -1 for unpartitioned files. An
      // evolved table renders one row per (era, tuple) — each era's
      // files group under the spec that wrote them.
      StructField("spec_id", LongType, nullable = false),
      StructField("file_count", LongType, nullable = false),
      StructField("row_count", LongType, nullable = false),
      StructField("total_bytes", LongType, nullable = false),
      // position-delete sidecar references carried by the partition's
      // files — the signal `coalesce_deletes` / `compact` decisions read
      StructField("delete_file_count", LongType, nullable = false),
      // per-column min/max rollup "col:lo:hi,…" (sorted), restricted
      // to columns boxed in EVERY file of the partition — a sound
      // bound or nothing; null when no column qualifies
      StructField("stats", StringType, nullable = true)))
    case o => throw new IllegalArgumentException(s"no metadata view $o")
  }

  /** Per-partition rollup partial — one per file at the leaves, merged
    * associatively per (tuple, era). `part` "" = no tuple (sentinel;
    * real tuples always start with `@p`).
    */
  private[sources] case class PartAgg(part: String, specId: Long,
      files: Long, rows: Long, bytes: Long, sidecars: Long,
      stats: Map[String, (Long, Long)])

  private val EraRe = raw"@p(\d*)(?:\..*)?".r

  /** One file's [[PartAgg]] partial — runs EXECUTOR-SIDE for
    * segmented tables (the task stats its own files; the driver never
    * sees per-file rows). `idKey`: when the table's CURRENT spec is a
    * single IDENTITY column, its (name, era) — identity layouts box
    * files under the plain column (no reserved `@p` key exists), so a
    * file that is PURE in that column (point box, zero nulls) groups
    * under its value tuple. Value-attribution is sound by
    * construction: a pure file's every row carries that value,
    * whichever era wrote it.
    */
  private[sources] def filePartAgg(dir: String, e: ManifestV2.FileEntry,
      idKey: Option[(String, Long)]): PartAgg = {
    val pKeys = e.stats.filter(_._1.startsWith(PartTransform.PKey))
      .toSeq.sortBy(_._1)
    val (part, specId) =
      if (pKeys.nonEmpty)
        (pKeys.map { case (k, (lo, _)) => s"$k=$lo" }.mkString(","),
          pKeys.head._1 match {
            case EraRe(n) => if (n.isEmpty) 0L else n.toLong
            case _ => -1L
          })
      else idKey match {
        case Some((c, era)) =>
          e.stats.get(c) match {
            case Some((lo, hi))
                if lo == hi && e.nulls.get(c).contains(0L) =>
              (s"$c=$lo", era)
            case _ => ("", -1L)
          }
        case None => ("", -1L)
      }
    val bytes =
      try java.nio.file.Files.size(ManifestV2.rootOf(dir).resolve(e.file))
      catch { case _: java.io.IOException => 0L }
    PartAgg(part, specId, 1L, e.rows, bytes, e.deletes.size.toLong,
      e.stats.filterNot(_._1.startsWith(PartTransform.PKey)))
  }

  private[sources] def mergePartAgg(a: PartAgg, b: PartAgg): PartAgg =
    PartAgg(a.part, a.specId, a.files + b.files, a.rows + b.rows,
      a.bytes + b.bytes, a.sidecars + b.sidecars,
      (a.stats.keySet & b.stats.keySet).map { k =>
        val (al, ah) = a.stats(k); val (bl, bh) = b.stats(k)
        (k, (math.min(al, bl), math.max(ah, bh)))
      }.toMap)

  /** The `partitions` view's rows: per-partition file/row/byte/sidecar
    * rollup with sound min/max stats bounds — what every maintenance
    * decision (which partition to compact / expire / coalesce) reads.
    * Distributed like the `files` view: for a segmented table each
    * TASK parses its own (immutable) metadata segment and stats its
    * files, a `reduceByKey` merges per tuple, and the driver holds
    * only the final rollup — O(distinct partition tuples), the table
    * LAYOUT grain, never O(files). Zero-row entries (delete-only
    * placeholders) are excluded, matching the `history` view's count.
    */
  def partitionRows(dir: String): Seq[Seq[Any]] = {
    // current-spec identity column (if any): lets identity-era files
    // group by value even though no reserved key marks them. Header-
    // only read — a segmented table's manifest holds refs, not rows.
    val idKey: Option[(String, Long)] = {
      val m = ManifestV2.rootOf(dir).resolve("manifest.txt")
      if (!java.nio.file.Files.exists(m)) None
      else {
        var part: Option[String] = None
        var hist = 0
        java.nio.file.Files.readAllLines(m).forEach { l =>
          if (l.startsWith("@part\t"))
            part = Some(l.split("\t", 2)(1)).filter(_.nonEmpty)
          else if (l.startsWith("@parthist\t"))
            hist = l.split("\t", 2)(1).split(";", -1).length
        }
        part.flatMap(r => PartTransform.parseMulti(r) match {
          case Seq(PartTransform.Identity(c)) => Some((c, hist.toLong))
          case _ => None
        })
      }
    }
    val merged: Seq[PartAgg] =
      ManifestV2.manifestStructure(ManifestV2.rootOf(dir)) match {
        case None => Nil
        case Some((segs, inline)) =>
          val inlineAgg = inline.filter(_.rows > 0L)
            .map(filePartAgg(dir, _, idKey))
          val all =
            if (segs.isEmpty) inlineAgg
            else {
              val spark = org.apache.spark.sql.SparkSession.active
              val d = dir
              val ik = idKey
              spark.sparkContext.parallelize(segs, segs.size)
                .flatMap(s =>
                  ManifestV2.readSegEntries(ManifestV2.rootOf(d), s)
                    .filter(_.rows > 0L).map(filePartAgg(d, _, ik)))
                .map(a => ((a.part, a.specId), a))
                .reduceByKey(mergePartAgg)
                .values
                // bounded: distinct (partition tuple, spec era) pairs —
                // the table layout grain, not the file count
                .collect().toSeq ++ inlineAgg
            }
          all.groupBy(a => (a.part, a.specId)).values
            .map(_.reduce(mergePartAgg)).toSeq
      }
    merged.sortBy(a => (a.specId, a.part)).map { a =>
      val st = a.stats.toSeq.sortBy(_._1)
        .map { case (c, (lo, hi)) => s"$c:$lo:$hi" }.mkString(",")
      Seq(if (a.part.isEmpty) null else a.part, a.specId, a.files,
        a.rows, a.bytes, a.sidecars, if (st.isEmpty) null else st)
    }
  }

  /** One `files`-view row from a manifest entry — shared by the
    * driver's inline-entry partition and the executor-side segment
    * parse. External values (String/Long/null); the reader
    * internalizes.
    */
  def fileRow(e: ManifestV2.FileEntry): Seq[Any] = {
    val part = e.stats.filter(_._1.startsWith(PartTransform.PKey))
      .toSeq.sortBy(_._1)
      .map { case (k, (lo, _)) => s"$k=$lo" }.mkString(",")
    Seq(e.file, e.rows, e.deletes.size.toLong,
      e.rgs.size.toLong, if (part.isEmpty) null else part)
  }

  /** One `history`-view row from a version's snapshot — computed
    * executor-side, one task per retained version.
    */
  def historyRow(st: ManifestV2.ManifestState): Seq[Any] =
    Seq(st.version,
      if (st.commitTs == 0L) null else st.commitTs * 1000L,
      st.maint,
      st.files.count(_.rows > 0L).toLong,
      st.files.map(_.rows).sum)

  /** The small views' rows as EXTERNAL values — tags/branches are
    * O(refs), so they ship in the partition directly.
    */
  def rowsOf(kind: String, dir: String): Seq[Seq[Any]] = kind match {
    case "tags" =>
      ManifestV2.listTags(dir).map { case (n, v) => Seq(n, v) }
    case "branches" =>
      ManifestV2.listBranches(dir).map { case (n, k, b) => Seq(n, k, b) }
    case "refs" =>
      ManifestV2.listTags(dir).map { case (n, v) =>
        Seq(n, "tag", v, null)
      } ++ ManifestV2.listBranches(dir).map { case (n, k, b) =>
        Seq(n, "branch", b, k)
      }
    case o => throw new IllegalArgumentException(s"no metadata view $o")
  }
}

private[sources] case class MetaRowsPartition(rows: Seq[Seq[Any]])
    extends InputPartition
/** One metadata SEGMENT of the `files` view: the task parses the
  * (immutable) segment file itself — the driver never materializes
  * its entries.
  */
private[sources] case class MetaSegPartition(dir: String, seg: String)
    extends InputPartition
/** One retained VERSION of the `history` view: the task reads that
  * version's manifest and computes the counts.
  */
private[sources] case class MetaVersionPartition(dir: String,
    version: Long) extends InputPartition

class ManifestMetaTable(dir: String, kind: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft_meta($dir).$kind"
  override def schema(): StructType = MetaTables.schemaOf(kind)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = () =>
    new Scan with Batch {
      override def readSchema(): StructType = MetaTables.schemaOf(kind)
      override def toBatch: Batch = this
      override def description(): String = name()
      override def planInputPartitions(): Array[InputPartition] =
        kind match {
          // DISTRIBUTED views: the driver holds only pointers —
          // segment names (files) or version ordinals (history) —
          // and each task parses its own metadata file. A
          // million-file table plans O(segments) partitions with no
          // driver-side row materialization at all (the Iceberg
          // metadata-table-by-manifest shape).
          case "files" =>
            ManifestV2.manifestStructure(ManifestV2.rootOf(dir)) match {
              case None => Array(MetaRowsPartition(Nil))
              case Some((segs, inline)) =>
                val segParts = segs.map(s =>
                  MetaSegPartition(dir, s): InputPartition)
                val inRows = inline.map(MetaTables.fileRow)
                val inPart =
                  if (inRows.nonEmpty || segParts.isEmpty)
                    Seq(MetaRowsPartition(inRows): InputPartition)
                  else Nil
                (segParts ++ inPart).toArray
            }
          case "history" =>
            val vs = ManifestV2.listVersions(ManifestV2.rootOf(dir))
            if (vs.isEmpty) Array(MetaRowsPartition(Nil))
            else vs.map(v =>
              MetaVersionPartition(dir, v): InputPartition).toArray
          case "partitions" =>
            // the rollup itself runs as a Spark job over segments
            // (executor-side parse + per-tuple reduce); what lands
            // here is the final O(distinct tuples) result
            Array(MetaRowsPartition(MetaTables.partitionRows(dir)))
          case _ =>
            val rows = MetaTables.rowsOf(kind, dir)
            if (rows.isEmpty) Array(MetaRowsPartition(Nil))
            else rows.grouped(8192)
              .map(c => MetaRowsPartition(c): InputPartition).toArray
        }
      override def createReaderFactory(): PartitionReaderFactory =
        new MetaReaderFactory(MetaTables.schemaOf(kind))
    }
}

private[sources] class MetaReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    // executor-side materialization for the distributed views: the
    // task parses its own (immutable) metadata file
    val rows: Seq[Seq[Any]] = partition match {
      case MetaRowsPartition(r) => r
      case MetaSegPartition(dir, seg) =>
        ManifestV2.readSegEntries(ManifestV2.rootOf(dir), seg)
          .map(MetaTables.fileRow)
      case MetaVersionPartition(dir, v) =>
        // expired between plan and read → gracefully empty
        ManifestV2.readManifest(ManifestV2.rootOf(dir), v)
          .toSeq.map(MetaTables.historyRow)
      case o => throw new IllegalArgumentException(
        s"unexpected metadata partition ${o.getClass.getName}")
    }
    new PartitionReader[InternalRow] {
      private val it = rows.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val ext = it.next()
        val vals = new Array[Any](schema.length)
        var i = 0
        while (i < schema.length) {
          vals(i) = (schema.fields(i).dataType, ext(i)) match {
            case (_, null) => null
            case (StringType, s: String) => UTF8String.fromString(s)
            case (_, v) => v
          }
          i += 1
        }
        cur = new GenericInternalRow(vals)
        true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
