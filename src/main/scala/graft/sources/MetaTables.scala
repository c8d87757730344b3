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
  val Names: Set[String] = Set("history", "files", "tags", "branches")

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
    case o => throw new IllegalArgumentException(s"no metadata view $o")
  }

  /** The view's rows as EXTERNAL values (String/Long/Boolean/null) —
    * shippable in the input partition; the reader internalizes.
    */
  def rowsOf(kind: String, dir: String): Seq[Seq[Any]] = {
    val root = ManifestV2.rootOf(dir)
    kind match {
      case "history" =>
        ManifestV2.listVersions(root)
          .flatMap(v => ManifestV2.readManifest(root, v))
          .map { st =>
            Seq(st.version,
              if (st.commitTs == 0L) null else st.commitTs * 1000L,
              st.maint,
              st.files.count(_.rows > 0L).toLong,
              st.files.map(_.rows).sum)
          }
      case "files" =>
        ManifestV2.readManifest(root).map(_.files).getOrElse(Nil)
          .map { e =>
            val part = e.stats.filter(_._1.startsWith(PartTransform.PKey))
              .toSeq.sortBy(_._1)
              .map { case (k, (lo, _)) => s"$k=$lo" }.mkString(",")
            Seq(e.file, e.rows, e.deletes.size.toLong,
              e.rgs.size.toLong, if (part.isEmpty) null else part)
          }
      case "tags" =>
        ManifestV2.listTags(dir).map { case (n, v) => Seq(n, v) }
      case "branches" =>
        ManifestV2.listBranches(dir).map { case (n, k, b) => Seq(n, k, b) }
      case o => throw new IllegalArgumentException(s"no metadata view $o")
    }
  }
}

private[sources] case class MetaRowsPartition(rows: Seq[Seq[Any]])
    extends InputPartition

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
      override def planInputPartitions(): Array[InputPartition] = {
        // chunked: the files view of a million-file table must not
        // ship one task a 100 MB closure
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
    val rows = partition.asInstanceOf[MetaRowsPartition].rows
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
