package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{AggregateFunction, BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource V2 CATALOG PLUGIN — the layer that turns the
  * connector family into SQL-addressable tables and functions (the
  * reference drives everything through hand-held DataFrame calls,
  * spark_kafka.py:21–40; a warehouse engine exposes its tables to
  * plain SQL DDL/DML instead). Registered per session with
  *
  *   spark.sql.catalog.graft           = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = <dir>
  *
  * after which the FULL statement surface works with no DataFrame
  * code anywhere:
  *
  *   CREATE NAMESPACE graft.db;
  *   CREATE TABLE graft.db.t (k BIGINT, s STRING);     -- empty manifest
  *   CREATE TABLE graft.db.t2 AS SELECT ...;           -- CTAS
  *   INSERT INTO graft.db.t SELECT ...;                -- BATCH_WRITE append
  *   INSERT OVERWRITE graft.db.t SELECT ...;           -- truncate + append
  *   SELECT graft.fn.vmod(k) FROM graft.db.t;          -- V2 function
  *   ALTER TABLE graft.db.t RENAME TO graft.db.u;
  *   DROP TABLE graft.db.t;
  *
  * Design:
  *  - every named table IS a [[ManifestV2]] table rooted at
  *    `<warehouse>/<namespace…>/<name>` — the catalog stores NO state
  *    of its own (the manifest is the single source of truth, so a
  *    catalog restart, or a second concurrent session pointed at the
  *    same warehouse, sees exactly the committed snapshots; this is
  *    the Iceberg/Delta "catalog = pointer to metadata" shape);
  *  - the virtual namespace `gen` exposes the [[RangeV2]] generated
  *    tables by name (`graft.gen.range_<rows>_<parts>`) so the pushdown
  *    scan surface is SQL-reachable too;
  *  - the namespace `fn` serves V2 functions: `vmod` (scalar, with the
  *    MAGIC_METHOD codegen path) and `sumsq` (an AggregateFunction
  *    whose state is a BigInteger — exact at any row count, where a
  *    BIGINT accumulator would wrap at ~100 TB scale).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with FunctionCatalog with ProcedureCatalog with StagingTableCatalog
    with ViewCatalog {
  private var catalogName: String = _
  private var warehouse: Path = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val w = options.get("warehouse")
    require(w != null && w.nonEmpty,
      s"catalog $name requires option spark.sql.catalog.$name.warehouse")
    warehouse = Paths.get(w)
    Files.createDirectories(warehouse): Unit
  }
  override def name(): String = catalogName

  // advertises enforced CHECK constraints (ResolveTableConstraints
  // gates both ALTER TABLE ADD CONSTRAINT and write-side enforcement
  // on this catalog capability) and COLUMN DEFAULTS (the analyzer
  // gates `ADD COLUMN ... DEFAULT` on it; INSERTs omitting the column
  // are filled from CURRENT_DEFAULT metadata driver-side, while
  // pre-add files serve the existence default at read)
  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  private def dirOf(ident: Identifier): Path =
    dirOf(ident.namespace :+ ident.name())
  private def dirOf(parts: Array[String]): Path = {
    // quoted identifiers arrive verbatim: a part like `..` or one
    // containing a separator would escape the warehouse root, and
    // dropTable/dropNamespace RECURSIVELY DELETE at the resolved path —
    // reject anything that is not a plain single path element
    parts.foreach { p =>
      require(p.nonEmpty && p != "." && p != ".." &&
          !p.contains('/') && !p.contains('\\'),
        s"illegal identifier part '$p' — names must be plain path " +
          "elements (no separators, no '.'/'..')")
    }
    val d = parts.foldLeft(warehouse)(_.resolve(_)).normalize()
    require(d.startsWith(warehouse.normalize()),
      s"identifier ${parts.mkString(".")} resolves outside the warehouse")
    d
  }
  private def isTableDir(p: Path): Boolean =
    Files.exists(p.resolve("manifest.txt"))
  /** Files.list with a guaranteed close — every directory listing in
    * this catalog goes through here (an unclosed stream leaks the
    * directory file descriptor until GC).
    */
  private def withList[A](d: Path)(f: java.util.stream.Stream[Path] => A): A = {
    val st = Files.list(d)
    try f(st) finally st.close()
  }

  // ---- TableCatalog ----

  private val GenRange = raw"range_(\d+)_(\d+)".r

  override def loadTable(ident: Identifier): Table = ident.namespace match {
    case Array("gen") => ident.name match {
      case GenRange(rows, parts) => new RangeV2Table(rows.toLong, parts.toInt)
      case _ => throw new NoSuchTableException(ident)
    }
    case _ =>
      val d = dirOf(ident)
      if (!isTableDir(d)) {
        // METADATA TABLES: `graft.<ns>.<table>.<view>` — the namespace
        // tail names a real table and the leaf a system view
        // (`history`/`files`/`tags`/`branches`, [[MetaTables]])
        if (ident.namespace.length >= 2 &&
            MetaTables.Names.contains(ident.name)) {
          val pd = dirOf(ident.namespace)
          if (isTableDir(pd))
            return new ManifestMetaTable(pd.toString, ident.name)
        }
        throw new NoSuchTableException(ident)
      }
      // null external schema: the manifest's own DDL line is the schema
      new ManifestTable(d.toString, null)
  }

  /** SQL time travel (`SELECT … FROM graft.db.t VERSION AS OF n` or
    * `VERSION AS OF 'tagname'`): serve the table pinned to that
    * immutable manifest version — numeric, or resolved through a
    * SNAPSHOT TAG (`CALL graft.system.tag`; a tag also pins its
    * snapshot against expiry, so `VERSION AS OF 'audit-2026q3'` keeps
    * working after any retention sweep). Reads plan the historical
    * file list; writes are rejected by the table.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val d = dirOf(ident)
    if (!isTableDir(d)) throw new NoSuchTableException(ident)
    def pinnedMain(v: Long): Table = {
      if (ManifestV2.readManifest(d, v).isEmpty)
        throw new IllegalArgumentException(
          s"table $ident has no snapshot v$v " +
            s"(published: ${ManifestV2.listVersions(d).mkString(", ")})")
      new ManifestTable(d.toString, null, v)
    }
    if (version.nonEmpty && version.forall(_.isDigit))
      return pinnedMain(version.toLong)
    ManifestV2.listTags(d.toString).collectFirst {
      case (n, tv) if n == version => tv
    } match {
      case Some(tv) => pinnedMain(tv)
      case None =>
        // BRANCH ref travel (round 14, the Iceberg ref shape):
        // `VERSION AS OF '<branch>'` reads the branch tip,
        // `'<branch>@<k>'` travels the branch's OWN chain (ordinal 0
        // = the fork-base snapshot). Tags and branches share one
        // namespace, so resolution is unambiguous.
        val (bName, ord) = version.split("@", 2) match {
          case Array(n, k) if k.nonEmpty && k.forall(_.isDigit) =>
            (n, k.toLong)
          case _ => (version, -1L)
        }
        if (ManifestV2.branchHead(d.toString, bName).isDefined)
          new graft.sources.BranchPinnedTable(d.toString, bName, ord)
        else throw new IllegalArgumentException(
          s"'$version' is neither a manifest number, a tag, nor a " +
            s"branch of $ident (tags: " +
            s"${ManifestV2.listTags(d.toString).map(_._1).mkString(", ")}" +
            s"; branches: ${ManifestV2.listBranches(d.toString)
              .map(_._1).mkString(", ")})")
    }
  }

  /** SQL `TIMESTAMP AS OF t` (Spark hands epoch MICROS): resolve to
    * the latest version whose monotone commit stamp is <= t —
    * O(log versions) header reads — and serve that pinned snapshot.
    * A `t` before the earliest retained commit fails loudly (see
    * [[ManifestV2.versionAsOfTimestamp]]).
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val d = dirOf(ident)
    if (!isTableDir(d)) throw new NoSuchTableException(ident)
    val v = ManifestV2.versionAsOfTimestamp(d.toString,
      Math.floorDiv(timestamp, 1000L))
    new ManifestTable(d.toString, null, v)
  }

  override def tableExists(ident: Identifier): Boolean = ident.namespace match {
    case Array("gen") => GenRange.matches(ident.name)
    case _ => isTableDir(dirOf(ident))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = dirOf(namespace)
    if (namespace.sameElements(Array("gen"))) Array.empty // virtual
    else if (!Files.isDirectory(d)) throw new NoSuchNamespaceException(namespace)
    else {
      val b = Array.newBuilder[Identifier]
      withList(d)(_.iterator().forEachRemaining { (p: Path) =>
        if (isTableDir(p)) b += Identifier.of(namespace, p.getFileName.toString)
      })
      b.result()
    }
  }

  /** PARTITIONED BY (col) validation shared by CREATE TABLE and the
    * staged CTAS/RTAS path: exactly one transform — identity on a
    * BIGINT column (the pre-round-12 surface, serialization
    * unchanged), or a HIDDEN transform ([[PartTransform]]):
    * `bucket(N, col)` on BIGINT/STRING, `days/hours/months(col)` on
    * TIMESTAMP (days/months also DATE), `truncate(W, col)` on BIGINT.
    * Writes cluster on the DERIVED value and land partition-pure
    * files; reads report KeyGroupedPartitioning on the transform
    * expression and transpose data predicates into partition pruning —
    * the user never stores or mentions a partition column.
    */
  private def parsePartition(schema: StructType,
      partitions: Array[Transform]): Option[String] =
    if (partitions.isEmpty) None
    else {
      val specs = partitions.toSeq.map(toSpec)
      specs.foreach(PartTransform.validate(_, schema))
      require(specs.map(_.col).distinct.size == specs.size,
        "partition transforms must reference distinct columns, got: " +
          specs.map(_.render).mkString(", "))
      Some(PartTransform.renderMulti(specs))
    }

  /** A Spark DDL transform as a [[PartTransform.Spec]]. Arguments are
    * matched generically (the parser may deliver `bucket` as a
    * BucketTransform or a generic apply), so the match is on name +
    * reference/literal shape.
    */
  private def toSpec(t: Transform): PartTransform.Spec = {
    def oneRef: String = {
      require(t.references.length == 1,
        s"transform ${t.name} must reference exactly one column")
      t.references.head.fieldNames.mkString(".")
    }
    def intArg: Long = t.arguments.collectFirst {
      case l: org.apache.spark.sql.connector.expressions.Literal[_]
        if l.value().isInstanceOf[Number] =>
        l.value().asInstanceOf[Number].longValue()
    }.getOrElse(throw new IllegalArgumentException(
      s"transform ${t.name} needs an integer argument"))
    t.name match {
      case "identity" => PartTransform.Identity(oneRef)
      case "bucket" => PartTransform.Bucket(intArg.toInt, oneRef)
      case "days" | "day" => PartTransform.Days(oneRef)
      case "hours" | "hour" => PartTransform.Hours(oneRef)
      case "months" | "month" => PartTransform.Months(oneRef)
      case "truncate" => PartTransform.Trunc(intArg, oneRef)
      case other => throw new UnsupportedOperationException(
        s"unsupported partition transform: $other")
    }
  }

  /** One name, one object: a table may not shadow a view and vice
    * versa (the table dir `x` and the view file `x.view` are distinct
    * paths, so without this check both CREATEs would succeed and the
    * name would resolve ambiguously).
    */
  private def requireNoView(ident: Identifier): Unit =
    if (Files.isRegularFile(viewFileOf(ident)))
      throw new IllegalArgumentException(
        s"a view named $ident already exists")

  /** Extract column defaults Spark hands in through StructField
    * metadata (`CREATE TABLE (x INT DEFAULT 5)` arrives as the
    * CURRENT_DEFAULT/EXISTS_DEFAULT keys): the SQL-literal text parses
    * into the manifest's stored rendering, or refuses loudly — the
    * catalog advertises SUPPORT_COLUMN_DEFAULT_VALUE, so silently
    * dropping one would break the insert-fill contract.
    */
  /** Parse one default's SQL-literal text into the manifest's stored
    * rendering (raw value string), typed by the column. None = an
    * explicit NULL (no default recorded). Refuses non-literal text.
    */
  private[sources] def parseDefaultSql(name: String, dt: DataType,
      sql: String): Option[String] = {
    val s = sql.trim
    if (s.isEmpty || s.equalsIgnoreCase("NULL")) return None
    Some(dt match {
      case StringType =>
        require(s.length >= 2 && s.head == '\'' && s.last == '\'',
          s"default for STRING column $name must be a plain " +
            s"string literal, got: $s")
        s.substring(1, s.length - 1).replace("''", "'")
      case LongType => s.toLong.toString
      case IntegerType => s.toInt.toString
      case DoubleType => s.toDouble.toString
      case BooleanType => s.toBoolean.toString
      case t => throw new UnsupportedOperationException(
        s"column defaults are supported on BIGINT/INT/DOUBLE/" +
          s"BOOLEAN/STRING columns, not ${t.simpleString}")
    })
  }

  private def defaultsOf(schema: StructType): Map[String, String] =
    schema.fields.flatMap { f =>
      val m = f.metadata
      val sql =
        if (m.contains("CURRENT_DEFAULT")) Some(m.getString("CURRENT_DEFAULT"))
        else if (m.contains("EXISTS_DEFAULT")) Some(m.getString("EXISTS_DEFAULT"))
        else None
      sql.flatMap(parseDefaultSql(f.name, f.dataType, _)).map((f.name, _))
    }.toMap

  /** The STORED schema drops the default-metadata keys: toDDL would
    * render them as a `DEFAULT` clause the manifest's fromDDL parse
    * cannot read back — the defaults live in their own header.
    */
  private def stripDefaultMeta(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      if (f.metadata.contains("CURRENT_DEFAULT") ||
          f.metadata.contains("EXISTS_DEFAULT"))
        f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
          .remove("CURRENT_DEFAULT").remove("EXISTS_DEFAULT").build())
      else f
    })

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val part = parsePartition(schema, partitions)
    requireNoView(ident)
    val d = dirOf(ident)
    if (isTableDir(d))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    // an empty-file-list manifest IS the created table: the schema is
    // durable immediately, and the first INSERT's append commit
    // schema-checks against it. Column DEFAULTs arrive as field
    // metadata and land in the manifest's defaults header; the
    // metadata itself is STRIPPED from the stored schema — toDDL
    // renders it as a `DEFAULT` clause fromDDL cannot parse — and the
    // table re-advertises it from the header for analyzer insert-fill.
    val dfl = defaultsOf(schema)
    ManifestV2.writeManifest(d,
      ManifestV2.ManifestState(stripDefaultMeta(schema), Map.empty,
        Seq.empty, part = part, defaults = dfl, writeDefaults = dfl,
        props = GraftCatalog.userProps(properties)))
    new ManifestTable(d.toString, null)
  }

  /** SCHEMA EVOLUTION, the additive half (`ALTER TABLE … ADD COLUMN`):
    * the manifest's schema line grows, data files are untouched, and
    * the reader null-fills the missing trailing cells of pre-evolution
    * files — the Delta/Iceberg add-column shape, O(1) at any table
    * size because no row is rewritten. Appended columns must be
    * nullable (old rows HAVE no value), top-level, default-free, and
    * land at the end (the row format is positional, so reordering or
    * dropping would re-address every historical file's cells — those
    * evolutions are the rewrite-shaped kind this connector refuses).
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val d = dirOf(ident)
    if (!isTableDir(d)) throw new NoSuchTableException(ident)
    // the whole derivation runs inside the CAS loop: an INSERT that
    // interleaves with the ALTER keeps its files (the re-derivation
    // starts from the succeeding snapshot)
    ManifestV2.commit(d) { cur =>
      val st = cur.getOrElse(throw new NoSuchTableException(ident))
      applyChanges(d, st, changes)
    }: Unit
    new ManifestTable(d.toString, null)
  }

  /** Does a CHECK constraint's predicate SQL reference the column?
    * Exact w.r.t. string literals and comments: both are stripped
    * before the word-boundary test, so a column name appearing only
    * inside a quoted literal (`status = 'amount pending'`) or a
    * comment never false-positively blocks a rename/drop — while any
    * real identifier reference still refuses. (Column names are
    * manifest-safe `[A-Za-z0-9_]`, so the word-boundary test cannot
    * under-match a quoted identifier.)
    */
  private[sources] def checkReferences(sql: String, col: String): Boolean =
    stripSqlLiterals(sql).matches(
      s"(?s).*\\b${java.util.regex.Pattern.quote(col)}\\b.*")

  /** Blank out string literals and comments, preserving everything
    * else — the shared front half of [[checkReferences]] and the
    * ADD CONSTRAINT identifier guard.
    */
  private[graft] def stripSqlLiterals(sql: String): String = {
    val sb = new StringBuilder(sql.length)
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') { // string literal ('' escapes a quote)
        i += 1
        var open = true
        while (i < sql.length && open) {
          if (sql.charAt(i) == '\'') {
            if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') i += 2
            else { open = false; i += 1 }
          } else i += 1
        }
        sb.append(' ')
      } else if (c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') {
        while (i < sql.length && sql.charAt(i) != '\n') i += 1
        sb.append(' ')
      } else if (c == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < sql.length &&
          !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
        i = math.min(i + 2, sql.length)
        sb.append(' ')
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** [[checkReferences]] is a literal/comment-aware SCANNER, exact
    * only while every identifier in constraint SQL is a bare
    * manifest-safe `[A-Za-z0-9_]` name. This guard ENFORCES that
    * assumption at ADD CONSTRAINT time instead of assuming it:
    * backtick-quoted identifiers and dotted references are rejected
    * before a constraint whose references the scanner could
    * mis-judge can ever be stored.
    */
  private[graft] def requireScannableCheckSql(name: String,
      sql: String): Unit = {
    val bare = stripSqlLiterals(sql)
    require(!bare.contains('`'),
      s"CHECK constraint $name: backtick-quoted identifiers are not " +
        "supported in constraint SQL — rename/drop safety analysis " +
        "resolves bare column names only")
    // identifier-dot-identifier (`t.col`) — NOT a decimal literal
    // (`1.5`), which the digit-led left side excludes
    require(!raw"[A-Za-z_][A-Za-z0-9_]*\s*\.\s*[A-Za-z_]".r
        .unanchored.matches(bare),
      s"CHECK constraint $name: dotted identifiers are not supported " +
        "in constraint SQL — reference the table's own columns by " +
        "bare name")
  }

  /** Pure derivation half of [[alterTable]] — re-runnable under the
    * commit CAS loop.
    */
  private def applyChanges(root: Path, st: ManifestV2.ManifestState,
      changes: Seq[TableChange]): ManifestV2.ManifestState = {
    var schema = st.schema
    var checks = st.checks
    var files = st.files
    var part = st.part
    var partHist = st.partHist
    var aliases = st.aliases
    var defaults = st.defaults
    var writeDefaults = st.writeDefaults
    var props = st.props
    // every name that might still live in an OLD parquet footer: a new
    // column must never take one (by-name reads would resurrect the
    // old column's data into it)
    def priorNames: Set[String] = aliases.values.flatten.toSet
    changes.foreach {
      // ENFORCED CHECK constraints (`ALTER TABLE … ADD CONSTRAINT c
      // CHECK (…)`): Spark validates the existing rows first
      // (AddCheckConstraintExec scans for violations), then hands the
      // constraint here; from that point every write plan carries the
      // predicate (ResolveTableConstraints), so violations fail before
      // a row lands
      case a: TableChange.AddConstraint =>
        a.constraint() match {
          case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
            require(!checks.exists(_._1 == c.name),
              s"constraint ${c.name} already exists")
            requireScannableCheckSql(c.name, c.predicateSql())
            checks = checks :+ ((c.name, c.predicateSql()))
          case other => throw new UnsupportedOperationException(
            s"graft tables enforce CHECK constraints only, got: $other")
        }
      case dcon: TableChange.DropConstraint =>
        require(checks.exists(_._1 == dcon.name) || dcon.ifExists(),
          s"no such constraint: ${dcon.name}")
        checks = checks.filterNot(_._1 == dcon.name)
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          s"nested column adds are not supported: ${a.fieldNames.mkString(".")}")
        require(a.isNullable,
          s"added column ${a.fieldNames.head} must be nullable — " +
            "pre-evolution rows have no value for it")
        require(a.position() == null,
          "added columns land at the end (positional row format)")
        require(!schema.fieldNames.contains(a.fieldNames.head),
          s"column ${a.fieldNames.head} already exists")
        require(!priorNames.contains(a.fieldNames.head),
          s"column name ${a.fieldNames.head} was a PRIOR name of a " +
            "renamed column and still lives in old data files — " +
            "by-name reads would resurrect the old values; pick " +
            "another name")
        // ADD COLUMN ... DEFAULT <lit> (round 14, the Iceberg v3
        // initial-default shape): the literal lands in the manifest
        // header with ZERO rewrite — pre-add files serve it at read,
        // Spark fills omitted INSERT columns from the same metadata.
        // Spark's DDL analysis already folded and cast it to the
        // column type; a NULL default is just the null-fill.
        Option(a.defaultValue()).foreach { dv =>
          val lit = dv.getValue
          require(lit != null,
            s"ADD COLUMN default must be a foldable literal")
          if (lit.value != null) {
            val rendered = (a.dataType, lit.value) match {
              case (LongType, v: java.lang.Number) => v.longValue().toString
              case (IntegerType, v: java.lang.Number) => v.intValue().toString
              case (DoubleType, v: java.lang.Number) =>
                v.doubleValue().toString
              case (BooleanType, v: java.lang.Boolean) => v.toString
              case (StringType, v) => v.toString
              case (t, _) => throw new UnsupportedOperationException(
                s"column defaults are supported on BIGINT/INT/DOUBLE/" +
                  s"BOOLEAN/STRING columns, not ${t.simpleString}")
            }
            // both halves of the v3 split: the immutable EXISTENCE
            // default (pre-add rows) and the initial WRITE default
            // (insert fill) — SET/DROP DEFAULT later mutates only the
            // write half
            defaults = defaults + (a.fieldNames.head -> rendered)
            writeDefaults = writeDefaults + (a.fieldNames.head -> rendered)
          }
        }
        schema = schema.add(StructField(a.fieldNames.head, a.dataType,
          nullable = true))
      // RENAME COLUMN (round 13): metadata-only. The schema field,
      // every file entry's stats/nulls keys, and the partition-spec
      // renders (current AND historical eras) rewrite to the new name
      // in this one commit — so manifest-level pruning, SPJ, and
      // hidden-partition transposition never need a mapping. Old
      // parquet FOOTERS keep the old physical name; the read path
      // resolves through the recorded alias chain
      // ([[ManifestV2.ManifestState.aliases]]).
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          s"nested renames are not supported: ${r.fieldNames.mkString(".")}")
        val from = r.fieldNames.head
        val to = r.newName
        require(schema.fieldNames.contains(from), s"no such column: $from")
        require(!schema.fieldNames.contains(to),
          s"column $to already exists")
        require(to.nonEmpty &&
          to.forall(c => c.isLetterOrDigit || c == '_'),
          s"renamed column must be manifest-safe [A-Za-z0-9_]: '$to'")
        require(!priorNames.contains(to),
          s"column name $to was a prior name of a renamed column and " +
            "still lives in old data files — pick another name")
        require(!checks.exists { case (_, sql) =>
          checkReferences(sql, from)
        }, s"a CHECK constraint references $from — drop the " +
          "constraint first, rename, then re-add it under the new name")
        schema = StructType(schema.fields.map(f =>
          if (f.name == from) f.copy(name = to) else f))
        aliases = (aliases - from) +
          (to -> (from +: aliases.getOrElse(from, Nil)))
        // defaults follow their column's current name
        defaults.get(from).foreach { v =>
          defaults = (defaults - from) + (to -> v)
        }
        writeDefaults.get(from).foreach { v =>
          writeDefaults = (writeDefaults - from) + (to -> v)
        }
        files = files.map(e => e.copy(
          stats = e.stats.map { case (k, v) =>
            (if (k == from) to else k, v) },
          nulls = e.nulls.map { case (k, v) =>
            (if (k == from) to else k, v) }))
        def ren(render: String): String =
          if (render.isEmpty) render
          else PartTransform.renderMulti(
            PartTransform.parseMulti(render).map(s =>
              if (s.col == from) PartTransform.withCol(s, to) else s))
        part = part.map(ren)
        partHist = partHist.map(ren)
      // DROP COLUMN (round 13): metadata-only. The column leaves the
      // schema (readers project by schema, so old files' bytes are
      // simply never decoded again) and its stats keys leave every
      // entry; the name — plus any prior names it accumulated through
      // renames — lands in the reserved "@dropped" slot of the name
      // ledger, so no later ADD or RENAME can ever take a name that
      // still lives in old footers (by-name reads would resurrect the
      // dropped bytes). Refused while anything still DEPENDS on the
      // column: the partition spec (any era), a CHECK constraint, or
      // a live equality-delete sidecar naming it (its subtraction
      // needs the values — coalesce/compact first).
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          s"nested drops are not supported: ${d.fieldNames.mkString(".")}")
        val col = d.fieldNames.head
        if (!schema.fieldNames.contains(col)) {
          require(d.ifExists(), s"no such column: $col")
        } else {
          require(schema.length > 1, "cannot drop the only column")
          val specs = (part.toSeq ++ partHist).filter(_.nonEmpty)
            .flatMap(PartTransform.parseMulti)
          require(!specs.exists(_.col == col),
            s"$col is a partition source column (current or historical " +
              "era) — set_partitioning away from it first")
          require(!checks.exists { case (_, sql) =>
            checkReferences(sql, col)
          }, s"a CHECK constraint references $col — drop the " +
            "constraint first")
          // eq-delete sidecars store PHYSICAL key names — possibly a
          // pre-rename alias of this column (sidecar says 'amt' after
          // RENAME amt TO amount). Compare against every name the
          // column ever had, or a stale-named sidecar would slip past
          // the guard and then fail decode at read time (its key maps
          // to @dropped, absent from the schema).
          val dead = col +: aliases.getOrElse(col, Nil)
          val deadSet = dead.toSet
          val liveEq = files.flatMap(_.deletes).distinct
            .filter(ManifestV2.isEqDelete)
          require(!liveEq.exists(r => ManifestV2
            .readEqDeleteTyped(root, r).cols.exists(c =>
              deadSet.contains(c._1))),
            s"a live equality-delete sidecar names $col (possibly by " +
              "a pre-rename alias) — its by-value subtraction needs " +
              "the column; run coalesce_deletes/compact first")
          schema = StructType(schema.fields.filterNot(_.name == col))
          files = files.map(e => e.copy(
            stats = e.stats - col, nulls = e.nulls - col))
          aliases = (aliases - col) + ("@dropped" ->
            (dead ++ aliases.getOrElse("@dropped", Nil)))
          defaults = defaults - col
          writeDefaults = writeDefaults - col
        }
      // ALTER COLUMN TYPE (round 14): the WIDENING half of Iceberg
      // type promotion, metadata-only. Only INT -> BIGINT is
      // promotable in this row format (there is no FLOAT or DECIMAL
      // column type to widen): the schema field re-types, ZERO data
      // files rewrite, and the leaf reader decodes an old footer's
      // INT32 chunks through an up-cast exactly as the alias chain
      // routes old names. Stats boxes need no rewrite — they are
      // stored as longs for every integer-family type. Narrowing and
      // any other re-type is refused: old footers would not survive
      // the new type (BIGINT values overflow INT; strings are not
      // numbers), so those evolutions are the rewrite-shaped kind
      // this connector refuses.
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames.length == 1,
          s"nested type changes are not supported: " +
            s"${u.fieldNames.mkString(".")}")
        val col = u.fieldNames.head
        val f = schema.fields.find(_.name == col).getOrElse(
          throw new IllegalArgumentException(s"no such column: $col"))
        if (f.dataType != u.newDataType) {
          require(f.dataType == IntegerType && u.newDataType == LongType,
            s"cannot alter $col ${f.dataType.simpleString} -> " +
              s"${u.newDataType.simpleString}: only the widening " +
              "promotion INT -> BIGINT is metadata-only; narrowing " +
              "or re-typing would corrupt values already in old " +
              "footers")
          // a partition SOURCE column's transform values were computed
          // under the old type — refuse rather than risk era boxes
          // disagreeing with post-widen transposition
          val specs = (part.toSeq ++ partHist).filter(_.nonEmpty)
            .flatMap(PartTransform.parseMulti)
          require(!specs.exists(_.col == col),
            s"$col is a partition source column (current or " +
              "historical era) — set_partitioning away from it first")
          schema = StructType(schema.fields.map(x =>
            if (x.name == col) x.copy(dataType = u.newDataType) else x))
        }
      // ALTER COLUMN ... SET/DROP DEFAULT (round 14): the MUTABLE half
      // of the v3 default split — changes what the analyzer fills
      // OMITTED insert columns with from now on, and NEVER rewrites
      // history: pre-add files keep serving the immutable existence
      // default fixed at ADD COLUMN time.
      case u: TableChange.UpdateColumnDefaultValue =>
        require(u.fieldNames.length == 1,
          s"nested default changes are not supported: " +
            s"${u.fieldNames.mkString(".")}")
        val col = u.fieldNames.head
        val f = schema.fields.find(_.name == col).getOrElse(
          throw new IllegalArgumentException(s"no such column: $col"))
        val sqlTxt = Option(u.newDefaultValue()).map(_.trim).getOrElse("")
        parseDefaultSql(col, f.dataType, sqlTxt) match {
          case Some(v) => writeDefaults = writeDefaults + (col -> v)
          case None => writeDefaults = writeDefaults - col // DROP DEFAULT
        }
      // ALTER COLUMN ... COMMENT: pure schema metadata — the DDL line
      // round-trips comments (toDDL renders COMMENT '…', fromDDL
      // parses it), but only on ONE LINE: control characters would
      // tear the manifest's line format, so they refuse.
      case c: TableChange.UpdateColumnComment =>
        require(c.fieldNames.length == 1,
          s"nested comments are not supported: ${c.fieldNames.mkString(".")}")
        val col = c.fieldNames.head
        require(schema.fieldNames.contains(col), s"no such column: $col")
        val txt = Option(c.newComment).getOrElse("")
        require(txt.forall(_ >= ' '),
          s"column comments must not contain control characters")
        schema = StructType(schema.fields.map(f =>
          if (f.name == col) f.withComment(txt) else f))
      // ALTER COLUMN ... DROP NOT NULL: RELAXING nullability is
      // metadata-only (every old value satisfies the weaker
      // constraint). SET NOT NULL is the scan-backed converse: the
      // tightened schema commits only once zero NULLs are PROVEN —
      // metadata-only when every live file tracks a zero null count
      // for the column, else a column-pruned `IS NULL` count scan
      // (whose planning already prunes the proven-clean files off
      // their null-count boxes, so the scan reads only the files
      // metadata could not clear). Re-proven on every CAS retry: a
      // concurrent append of a NULL between proof and commit re-runs
      // the derivation and is caught.
      case n: TableChange.UpdateColumnNullability =>
        require(n.fieldNames.length == 1,
          s"nested nullability changes are not supported: " +
            s"${n.fieldNames.mkString(".")}")
        val col = n.fieldNames.head
        val f = schema.fields.find(_.name == col).getOrElse(
          throw new IllegalArgumentException(s"no such column: $col"))
        if (n.nullable != f.nullable) {
          if (!n.nullable) GraftCatalog.proveNoNulls(root, files, col)
          schema = StructType(schema.fields.map(x =>
            if (x.name == col) x.copy(nullable = n.nullable) else x))
        }
      // TBLPROPERTIES: free-form user metadata, versioned with the
      // snapshot like every other definition facet
      case sp: TableChange.SetProperty =>
        GraftCatalog.requirePropKey(sp.property)
        props = props + (sp.property -> sp.value)
      case rp: TableChange.RemoveProperty =>
        props = props - rp.property
      case other => throw new UnsupportedOperationException(
        s"graft tables only evolve by ADD COLUMN, RENAME COLUMN, " +
          s"DROP COLUMN, ALTER COLUMN TYPE widening, SET/DROP " +
          s"DEFAULT, COMMENT, DROP NOT NULL, or SET/UNSET " +
          s"TBLPROPERTIES (got: $other)")
    }
    // .copy from the predecessor, never a field-list rebuild: facets
    // this DDL didn't touch (and any FUTURE ManifestState field)
    // carry by construction
    st.copy(schema = schema, files = files, part = part,
      checks = checks, partHist = partHist, aliases = aliases,
      defaults = defaults, writeDefaults = writeDefaults,
      props = props, maint = false)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val d = dirOf(ident)
    if (!isTableDir(d)) false
    else {
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p))
          withList(p)(_.iterator()
            .forEachRemaining((c: Path) => rm(c)))
        Files.deleteIfExists(p): Unit
      }
      rm(d)
      true
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = dirOf(oldIdent)
    if (!isTableDir(from)) throw new NoSuchTableException(oldIdent)
    val to = dirOf(newIdent)
    if (isTableDir(to))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(newIdent)
    // RENAME TO is catalog-relative in SQL (`RENAME TO spec.u`, not
    // `graft.spec.u` — Spark hands the raw parts through as the new
    // namespace); requiring the target namespace to pre-exist turns a
    // catalog-qualified slip into a loud error instead of silently
    // minting a `graft` namespace inside the warehouse
    if (!namespaceExists(newIdent.namespace))
      throw new NoSuchNamespaceException(newIdent.namespace)
    // "one name, one object" holds on rename too: the create-path check
    // (requireNoView) must also guard the rename target, or RENAME can
    // mint a coexisting table and view that resolve ambiguously
    requireNoView(newIdent)
    Files.move(from, to): Unit
  }

  // ---- StagingTableCatalog: atomic CTAS / REPLACE TABLE AS SELECT ----

  /** Atomic CTAS/RTAS ride the manifest design for free: the staged
    * write lands its files in the TARGET's staging/ directory — where
    * files are invisible until a manifest references them — and
    * `commitStagedChanges` is one atomic manifest swap. A reader never
    * sees a half-written CTAS; a REPLACE keeps serving the old
    * snapshot until the instant the new one is complete, and the
    * replaced version stays time-travelable (RTAS is just another
    * commit in the table's version lineage). Abort deletes the staged
    * files and leaves the previous state untouched.
    */
  private def stage(ident: Identifier, schema: StructType,
      partitions: Array[Transform], mustExist: Option[Boolean],
      properties: util.Map[String, String]): StagedTable = {
    val part = parsePartition(schema, partitions)
    requireNoView(ident)
    val d = dirOf(ident)
    mustExist match {
      case Some(true) if !isTableDir(d) =>
        throw new NoSuchTableException(ident)
      case Some(false) if isTableDir(d) =>
        throw new org.apache.spark.sql.catalyst.analysis
          .TableAlreadyExistsException(ident)
      case _ => ()
    }
    new StagedManifestTable(d.toString, stripDefaultMeta(schema), part,
      defaults = defaultsOf(schema),
      props = GraftCatalog.userProps(properties))
  }

  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stage(ident, schema, partitions, mustExist = Some(false),
      properties = properties)

  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stage(ident, schema, partitions, mustExist = Some(true),
      properties = properties)

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stage(ident, schema, partitions, mustExist = None,
      properties = properties)

  // ---- SupportsNamespaces (directories under the warehouse) ----

  override def listNamespaces(): Array[Array[String]] = {
    val b = Array.newBuilder[Array[String]]
    withList(warehouse)(_.iterator().forEachRemaining { (p: Path) =>
      if (Files.isDirectory(p) && !isTableDir(p))
        b += Array(p.getFileName.toString)
    })
    b += Array("gen")
    b += Array("fn")
    b.result().distinct
  }
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      namespace.sameElements(Array("gen")) ||
      namespace.sameElements(Array("fn")) ||
      Files.isDirectory(dirOf(namespace))

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    Files.createDirectories(dirOf(namespace)): Unit

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val d = dirOf(namespace)
    if (!Files.isDirectory(d)) false
    else {
      if (!cascade && withList(d)(_.findFirst().isPresent))
        throw new IllegalStateException(
          s"namespace ${namespace.mkString(".")} is not empty")
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p))
          withList(p)(_.iterator().forEachRemaining((c: Path) => rm(c)))
        Files.deleteIfExists(p): Unit
      }
      rm(d)
      true
    }
  }

  // ---- ViewCatalog: persisted SQL views in the warehouse ----

  /** Views are single files `<ns>/<name>.view` beside the table
    * directories — the catalog stays stateless (a second instance over
    * the warehouse serves the same views), and a view can never be
    * confused with a table (files vs manifest-bearing directories).
    * The stored text is the view's SQL plus the catalog/namespace
    * resolution context captured at CREATE, per the V2 view contract.
    *
    * NOTE: Spark 4.1 ships the [[ViewCatalog]] API but does not yet
    * route `CREATE VIEW` SQL to non-session catalogs
    * (ResolveSessionCatalog rejects it; verified against the jars —
    * no V2 view resolution rule exists). This implementation is the
    * storage half engines like Iceberg wire through their extensions;
    * CatalogSpec exercises the full API contract directly.
    */
  private def viewFileOf(ident: Identifier): Path =
    dirOf(ident.namespace).resolve(ident.name + ".view")

  override def listViews(namespace: String*): Array[Identifier] = {
    val ns = namespace.toArray
    val d = dirOf(ns)
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    else if (!Files.isDirectory(d)) Array.empty
    else {
      val b = Array.newBuilder[Identifier]
      val st = Files.list(d)
      try st.iterator().forEachRemaining { p =>
        val n = p.getFileName.toString
        if (n.endsWith(".view") && Files.isRegularFile(p))
          b += Identifier.of(ns, n.stripSuffix(".view"))
      } finally st.close()
      b.result()
    }
  }

  override def loadView(ident: Identifier): View = {
    val f = viewFileOf(ident)
    if (!Files.isRegularFile(f))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    val lines = Files.readAllLines(f)
    new View {
      override def name(): String = ident.toString
      override def query(): String = ManifestV2.unesc(lines.get(0))
      override def currentCatalog(): String = lines.get(1)
      override def currentNamespace(): Array[String] =
        lines.get(2).split(",").filter(_.nonEmpty)
      override def schema(): StructType = StructType.fromDDL(lines.get(3))
      override def queryColumnNames(): Array[String] =
        if (lines.get(4).isEmpty) Array.empty
        else lines.get(4).split("\t").map(ManifestV2.unesc)
      override def columnAliases(): Array[String] = Array.empty
      override def columnComments(): Array[String] = Array.empty
      override def properties(): util.Map[String, String] =
        util.Collections.emptyMap()
    }
  }

  override def createView(info: ViewInfo): View = {
    val ident = info.ident()
    if (!namespaceExists(ident.namespace))
      throw new NoSuchNamespaceException(ident.namespace)
    if (isTableDir(dirOf(ident)))
      throw new IllegalArgumentException(
        s"a table named $ident already exists")
    val f = viewFileOf(ident)
    if (Files.isRegularFile(f))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(ident)
    require(info.columnAliases() == null || info.columnAliases().isEmpty,
      "graft views store the query's own column names (no alias list)")
    val body = Seq(
      ManifestV2.esc(info.sql()),
      info.currentCatalog(),
      info.currentNamespace().mkString(","),
      info.schema().toDDL,
      Option(info.queryColumnNames()).getOrElse(Array.empty[String])
        .map(ManifestV2.esc).mkString("\t")
    ).mkString("", "\n", "\n")
    Files.createDirectories(f.getParent)
    Files.write(f, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    loadView(ident)
  }

  override def alterView(ident: Identifier, changes: ViewChange*): View =
    throw new UnsupportedOperationException(
      "graft views are immutable — drop and recreate")

  override def dropView(ident: Identifier): Boolean =
    Files.deleteIfExists(viewFileOf(ident))

  override def renameView(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = viewFileOf(oldIdent)
    if (!Files.isRegularFile(from))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(oldIdent)
    val to = viewFileOf(newIdent)
    if (Files.isRegularFile(to))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(newIdent)
    // mirror of renameTable's guard: the rename target must not collide
    // with a table either
    if (isTableDir(dirOf(newIdent)))
      throw new IllegalArgumentException(
        s"a table named $newIdent already exists")
    Files.move(from, to): Unit
  }

  // ---- FunctionCatalog (namespace `fn`, plus the EMPTY namespace
  // for Spark's transform resolution: V2ExpressionUtils resolves a
  // scan's KeyGroupedPartitioning expressions and a write's clustered
  // distribution by loadFunction(Identifier.of(Array.empty, name)) on
  // the table's catalog — serving bucket/days/hours/months/truncate
  // there is what makes hidden-partition SPJ and write clustering
  // resolve) ----

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("fn")))
      (GraftCatalog.functions.keys.map(Identifier.of(Array("fn"), _)) ++
        GraftCatalog.transformFns.keys.map(Identifier.of(Array("fn"), _)))
        .toArray
    else if (namespace.isEmpty)
      GraftCatalog.transformFns.keys
        .map(Identifier.of(Array.empty[String], _)).toArray
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace.sameElements(Array("fn")))
      GraftCatalog.functions.orElse(GraftCatalog.transformFns)
        .applyOrElse(ident.name, (_: String) =>
          throw new org.apache.spark.sql.catalyst.analysis
            .NoSuchFunctionException(ident))
    else if (ident.namespace.isEmpty)
      GraftCatalog.transformFns.getOrElse(ident.name,
        throw new org.apache.spark.sql.catalyst.analysis
          .NoSuchFunctionException(ident))
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  // ---- ProcedureCatalog (namespace `system`) ----

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      Array(Identifier.of(Array("system"), "expire_snapshots"),
        Identifier.of(Array("system"), "compact"),
        Identifier.of(Array("system"), "cluster_by"),
        Identifier.of(Array("system"), "coalesce_deletes"),
        Identifier.of(Array("system"), "remove_orphans"),
        Identifier.of(Array("system"), "set_partitioning"),
        Identifier.of(Array("system"), "tag"),
        Identifier.of(Array("system"), "drop_tag"),
        Identifier.of(Array("system"), "branch"),
        Identifier.of(Array("system"), "fast_forward"),
        Identifier.of(Array("system"), "cherry_pick"),
        Identifier.of(Array("system"), "rollback"),
        Identifier.of(Array("system"), "rewrite_manifests"),
        Identifier.of(Array("system"), "set_not_null"),
        Identifier.of(Array("system"), "clone"),
        Identifier.of(Array("system"), "drop_branch"))
    else Array.empty

  override def loadProcedure(ident: Identifier): UnboundProcedure =
    if (ident.namespace.sameElements(Array("system")) &&
        ident.name == "expire_snapshots")
      new ExpireSnapshotsProcedure(warehouse)
    else if (ident.namespace.sameElements(Array("system")) &&
        ident.name == "compact")
      new CompactProcedure(warehouse)
    else if (ident.namespace.sameElements(Array("system")) &&
        ident.name == "cluster_by")
      new ClusterByProcedure(warehouse)
    else if (ident.namespace.sameElements(Array("system")) &&
        ident.name == "coalesce_deletes")
      new CoalesceDeletesProcedure(warehouse)
    else if (ident.namespace.sameElements(Array("system")) &&
        ident.name == "remove_orphans")
      new RemoveOrphansProcedure(warehouse)
    else if (ident.namespace.sameElements(Array("system")) &&
        ident.name == "set_partitioning")
      new SetPartitioningProcedure(warehouse)
    else if (ident.namespace.sameElements(Array("system")) &&
        ident.name == "tag")
      new TagProcedure(warehouse)
    else if (ident.namespace.sameElements(Array("system")) &&
        ident.name == "drop_tag")
      new DropTagProcedure(warehouse)
    else if (ident.namespace.sameElements(Array("system")) &&
        ident.name == "branch")
      new BranchProcedure(warehouse)
    else if (ident.namespace.sameElements(Array("system")) &&
        ident.name == "fast_forward")
      new FastForwardProcedure(warehouse)
    else if (ident.namespace.sameElements(Array("system")) &&
        ident.name == "cherry_pick")
      new CherryPickProcedure(warehouse)
    else if (ident.namespace.sameElements(Array("system")) &&
        ident.name == "rollback")
      new RollbackProcedure(warehouse)
    else if (ident.namespace.sameElements(Array("system")) &&
        ident.name == "rewrite_manifests")
      new RewriteManifestsProcedure(warehouse)
    else if (ident.namespace.sameElements(Array("system")) &&
        ident.name == "set_not_null")
      new SetNotNullProcedure(warehouse)
    else if (ident.namespace.sameElements(Array("system")) &&
        ident.name == "clone")
      new CloneProcedure(warehouse)
    else if (ident.namespace.sameElements(Array("system")) &&
        ident.name == "drop_branch")
      new DropBranchProcedure(warehouse)
    else throw new IllegalArgumentException(s"no such procedure: $ident")
}

/** `CALL graft.system.cluster_by(ns => …, tbl => …, col => …,
  * n_files => n)`: the OPTIMIZE … ZORDER maintenance pass
  * (one-dimensional) — range-cluster the table on a BIGINT column so
  * every file's stats box is tight and disjoint
  * ([[ManifestV2.clusterSnapshot]]); range DELETEs become
  * metadata-only and range scans prune whole files afterwards.
  */
class ClusterByProcedure(warehouse: Path) extends UnboundProcedure {
  override def name(): String = "cluster_by"
  override def description(): String =
    "range-cluster a table on a column, one atomic swap"
  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "cluster_by"
    override def description(): String = ClusterByProcedure.this.description()
    override def isDeterministic: Boolean = false // mutates table state
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("ns", StringType).comment("namespace").build(),
      ProcedureParameter.in("tbl", StringType).comment("table name").build(),
      ProcedureParameter.in("col", StringType)
        .comment("BIGINT cluster column").build(),
      ProcedureParameter.in("n_files", IntegerType)
        .comment("target file count").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val dir = warehouse.resolve(input.getString(0)).resolve(input.getString(1))
      require(Files.exists(dir.resolve("manifest.txt")), s"no table at $dir")
      val (filesIn, filesOut, rowsMoved) = ManifestV2.clusterSnapshot(
        org.apache.spark.sql.SparkSession.active, dir.toString,
        input.getString(2), input.getInt(3))
      val res: Scan = new LocalScan {
        override def readSchema(): StructType = StructType(Seq(
          StructField("files_in", LongType, nullable = false),
          StructField("files_out", LongType, nullable = false),
          StructField("rows_clustered", LongType, nullable = false)))
        override def rows(): Array[InternalRow] = Array(
          InternalRow.fromSeq(Seq(filesIn, filesOut, rowsMoved)))
      }
      util.Collections.singletonList(res).iterator()
    }
  }
}

/** `CALL graft.system.coalesce_deletes(ns => …, tbl => …)`: merge
  * every file's accumulated merge-on-read delete sidecars — POSITION
  * sidecars into one, EQUALITY sidecars into one per column
  * ([[ManifestV2.coalesceDeletes]]) — the maintenance pass BETWEEN
  * deletes and compaction: pure metadata, no data file opened, and a
  * many-times-deleted file's reads parse one sidecar per kind
  * instead of N. Returns (files_coalesced, sidecars_before,
  * sidecars_after).
  */
class CoalesceDeletesProcedure(warehouse: Path) extends UnboundProcedure {
  override def name(): String = "coalesce_deletes"
  override def description(): String =
    "merge each file's position-delete sidecars into one and its " +
      "equality-delete sidecars into one per column"
  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "coalesce_deletes"
    override def description(): String =
      CoalesceDeletesProcedure.this.description()
    override def isDeterministic: Boolean = false // mutates table state
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("ns", StringType).comment("namespace").build(),
      ProcedureParameter.in("tbl", StringType).comment("table name").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val dir = warehouse.resolve(input.getString(0)).resolve(input.getString(1))
      require(Files.exists(dir.resolve("manifest.txt")), s"no table at $dir")
      val (files, before, after) =
        ManifestV2.coalesceDeletes(dir.toString)
      val res: Scan = new LocalScan {
        override def readSchema(): StructType = StructType(Seq(
          StructField("files_coalesced", LongType, nullable = false),
          StructField("sidecars_before", LongType, nullable = false),
          StructField("sidecars_after", LongType, nullable = false)))
        override def rows(): Array[InternalRow] = Array(
          InternalRow.fromSeq(Seq(files, before, after)))
      }
      util.Collections.singletonList(res).iterator()
    }
  }
}

/** `CALL graft.system.set_partitioning(ns => …, tbl => …, spec => …)`:
  * PARTITION EVOLUTION — change a table's partition spec WITHOUT
  * rewriting a byte (the Iceberg spec-evolution shape, re-derived for
  * the text manifest). The old spec is appended to the manifest's era
  * history; existing files keep their point boxes under the OLD era's
  * reserved key and keep pruning under the predicates transposed for
  * THAT spec, while new writes derive, cluster, and box under the new
  * one. `spec` is a transform render (`bucket(16, k)`, `days(ts)`,
  * `truncate(1000, k)`, a bare BIGINT column for identity) or '' to
  * stop partitioning. Storage-partitioned-join reporting needs every
  * live file on the CURRENT spec — compaction restores it by
  * rewriting old-era files (their boxes re-derive under the new
  * spec). At 100 TB this is "we outgrew 8 buckets": re-bucketing is a
  * metadata statement plus background compaction, not a table rewrite.
  */
class SetPartitioningProcedure(warehouse: Path) extends UnboundProcedure {
  override def name(): String = "set_partitioning"
  override def description(): String =
    "change the table's partition spec without rewriting data " +
      "(old files keep pruning under the spec that wrote them)"
  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "set_partitioning"
    override def description(): String =
      SetPartitioningProcedure.this.description()
    override def isDeterministic: Boolean = false // mutates table state
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("ns", StringType).comment("namespace").build(),
      ProcedureParameter.in("tbl", StringType).comment("table name").build(),
      ProcedureParameter.in("spec", StringType)
        .comment("transform render, bare column, or '' to unpartition")
        .build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val dir = warehouse.resolve(input.getString(0)).resolve(input.getString(1))
      require(Files.exists(dir.resolve("manifest.txt")), s"no table at $dir")
      val spec = Option(input.getString(2)).map(_.trim).filter(_.nonEmpty)
      val (oldSpec, newId) = ManifestV2.setPartitioning(dir, spec)
      val res: Scan = new LocalScan {
        override def readSchema(): StructType = StructType(Seq(
          StructField("old_spec", StringType, nullable = false),
          StructField("new_spec", StringType, nullable = false),
          StructField("spec_id", LongType, nullable = false)))
        override def rows(): Array[InternalRow] = Array(
          InternalRow.fromSeq(Seq(
            org.apache.spark.unsafe.types.UTF8String.fromString(oldSpec),
            org.apache.spark.unsafe.types.UTF8String.fromString(
              spec.getOrElse("")),
            newId)))
      }
      util.Collections.singletonList(res).iterator()
    }
  }
}

/** `CALL graft.system.tag(ns => …, tbl => …, name => …, version => n)`
  * — SNAPSHOT TAGS (the Iceberg named-ref shape): pin a manifest
  * version under a name. `version => -1` tags the CURRENT snapshot.
  * A tag serves time travel by name (`VERSION AS OF 'audit-2026q3'`)
  * and pins its snapshot — and every file it references — against
  * `expire_snapshots` until dropped: the reproducibility anchor a
  * training-data pipeline needs ("the exact corpus the model saw")
  * without freezing retention for the whole table.
  */
class TagProcedure(warehouse: Path) extends UnboundProcedure {
  override def name(): String = "tag"
  override def description(): String =
    "pin a snapshot version under a name (time travel by name; " +
      "survives expire_snapshots until dropped)"
  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "tag"
    override def description(): String = TagProcedure.this.description()
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("ns", StringType).comment("namespace").build(),
      ProcedureParameter.in("tbl", StringType).comment("table name").build(),
      ProcedureParameter.in("name", StringType).comment("tag name").build(),
      ProcedureParameter.in("version", LongType)
        .comment("snapshot version; -1 = current").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val dir = warehouse.resolve(input.getString(0)).resolve(input.getString(1))
      require(Files.exists(dir.resolve("manifest.txt")), s"no table at $dir")
      val v = input.getLong(3)
      val tagged = ManifestV2.tagSnapshot(dir.toString, input.getString(2),
        if (v < 0) None else Some(v))
      val res: Scan = new LocalScan {
        override def readSchema(): StructType = StructType(Seq(
          StructField("tag", StringType, nullable = false),
          StructField("version", LongType, nullable = false)))
        override def rows(): Array[InternalRow] = Array(
          InternalRow.fromSeq(Seq(
            org.apache.spark.unsafe.types.UTF8String.fromString(
              input.getString(2)), tagged)))
      }
      util.Collections.singletonList(res).iterator()
    }
  }
}

/** `CALL graft.system.drop_tag(ns => …, tbl => …, name => …)` —
  * release a snapshot tag; the snapshot becomes expirable again.
  */
class DropTagProcedure(warehouse: Path) extends UnboundProcedure {
  override def name(): String = "drop_tag"
  override def description(): String = "release a snapshot tag"
  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "drop_tag"
    override def description(): String = DropTagProcedure.this.description()
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("ns", StringType).comment("namespace").build(),
      ProcedureParameter.in("tbl", StringType).comment("table name").build(),
      ProcedureParameter.in("name", StringType).comment("tag name").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val dir = warehouse.resolve(input.getString(0)).resolve(input.getString(1))
      val existed = ManifestV2.dropTag(dir.toString, input.getString(2))
      val res: Scan = new LocalScan {
        override def readSchema(): StructType = StructType(Seq(
          StructField("dropped", BooleanType, nullable = false)))
        override def rows(): Array[InternalRow] = Array(
          InternalRow.fromSeq(Seq(existed)))
      }
      util.Collections.singletonList(res).iterator()
    }
  }
}

/** `CALL graft.system.branch(ns => …, tbl => …, name => …)` — fork a
  * WRITABLE BRANCH at the current version (write-audit-publish's
  * staging ref): writes with the `branch=<name>` option commit onto
  * it invisibly to main; reads with the same option audit it;
  * `fast_forward` publishes it.
  */
class BranchProcedure(warehouse: Path) extends UnboundProcedure {
  override def name(): String = "branch"
  override def description(): String =
    "fork a writable branch at the current (or a retained older) " +
      "version (write-audit-publish staging)"
  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "branch"
    override def description(): String = BranchProcedure.this.description()
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("ns", StringType).comment("namespace").build(),
      ProcedureParameter.in("tbl", StringType).comment("table name").build(),
      ProcedureParameter.in("name", StringType).comment("branch name").build(),
      ProcedureParameter.in("version", LongType).defaultValue("-1")
        .comment("fork base; -1 (default) = current version").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val dir = warehouse.resolve(input.getString(0)).resolve(input.getString(1))
      require(Files.exists(dir.resolve("manifest.txt")), s"no table at $dir")
      val base = ManifestV2.createBranch(dir.toString, input.getString(2),
        atVersion = input.getLong(3))
      val res: Scan = new LocalScan {
        override def readSchema(): StructType = StructType(Seq(
          StructField("branch", StringType, nullable = false),
          StructField("base_version", LongType, nullable = false)))
        override def rows(): Array[InternalRow] = Array(
          InternalRow.fromSeq(Seq(
            org.apache.spark.unsafe.types.UTF8String.fromString(
              input.getString(2)), base)))
      }
      util.Collections.singletonList(res).iterator()
    }
  }
}

/** `CALL graft.system.fast_forward(ns => …, tbl => …, name => …)` —
  * publish a branch: ONE atomic main commit installing the branch tip,
  * refused loudly if main advanced since the fork (divergence).
  */
class FastForwardProcedure(warehouse: Path) extends UnboundProcedure {
  override def name(): String = "fast_forward"
  override def description(): String =
    "publish a branch tip as main's next version (refuses on divergence)"
  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "fast_forward"
    override def description(): String =
      FastForwardProcedure.this.description()
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("ns", StringType).comment("namespace").build(),
      ProcedureParameter.in("tbl", StringType).comment("table name").build(),
      ProcedureParameter.in("name", StringType).comment("branch name").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val dir = warehouse.resolve(input.getString(0)).resolve(input.getString(1))
      val v = ManifestV2.fastForward(dir.toString, input.getString(2))
      val res: Scan = new LocalScan {
        override def readSchema(): StructType = StructType(Seq(
          StructField("published_version", LongType, nullable = false)))
        override def rows(): Array[InternalRow] = Array(
          InternalRow.fromSeq(Seq(v)))
      }
      util.Collections.singletonList(res).iterator()
    }
  }
}

/** `CALL graft.system.cherry_pick(ns => …, tbl => …, name => …)` —
  * publish an APPEND-ONLY branch onto a main that ADVANCED since the
  * fork, the case [[FastForwardProcedure]] refuses: the published
  * state is main's current state plus the branch's staged files
  * ([[ManifestV2.cherryPick]]). Refuses loudly when the branch
  * carries deletes/rewrites/DDL, or main added CHECK constraints
  * since the fork — those are real conflicts, not rebases.
  */
class CherryPickProcedure(warehouse: Path) extends UnboundProcedure {
  override def name(): String = "cherry_pick"
  override def description(): String =
    "replay an append-only branch onto an advanced main (refuses on real conflicts)"
  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "cherry_pick"
    override def description(): String =
      CherryPickProcedure.this.description()
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("ns", StringType).comment("namespace").build(),
      ProcedureParameter.in("tbl", StringType).comment("table name").build(),
      ProcedureParameter.in("name", StringType).comment("branch name").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val dir = warehouse.resolve(input.getString(0)).resolve(input.getString(1))
      val v = ManifestV2.cherryPick(dir.toString, input.getString(2))
      val res: Scan = new LocalScan {
        override def readSchema(): StructType = StructType(Seq(
          StructField("published_version", LongType, nullable = false)))
        override def rows(): Array[InternalRow] = Array(
          InternalRow.fromSeq(Seq(v)))
      }
      util.Collections.singletonList(res).iterator()
    }
  }
}

/** `CALL graft.system.rollback(ns => …, tbl => …, version => v)` (or
  * `timestamp_ms => t`) — make an old snapshot current again after a
  * bad commit ([[ManifestV2.rollbackTo]]): one metadata-only commit
  * whose state IS the old version's, history preserved, the change
  * feed showing the reversal as retractions. Exactly one of
  * `version` / `timestamp_ms` / `tag` must be given.
  */
class RollbackProcedure(warehouse: Path) extends UnboundProcedure {
  override def name(): String = "rollback"
  override def description(): String =
    "restore an old snapshot as a new commit (history preserved)"
  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "rollback"
    override def description(): String =
      RollbackProcedure.this.description()
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("ns", StringType).comment("namespace").build(),
      ProcedureParameter.in("tbl", StringType).comment("table name").build(),
      ProcedureParameter.in("version", LongType).defaultValue("-1")
        .comment("snapshot version to restore").build(),
      ProcedureParameter.in("timestamp_ms", LongType).defaultValue("-1")
        .comment("restore latest snapshot stamped <= this epoch-millis").build(),
      ProcedureParameter.in("tag", StringType).defaultValue("''")
        .comment("restore the version a tag pins").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val dir = warehouse.resolve(input.getString(0)).resolve(input.getString(1))
      require(Files.exists(dir.resolve("manifest.txt")), s"no table at $dir")
      val ver = input.getLong(2)
      val ts = input.getLong(3)
      val tag = input.getString(4)
      require(Seq(ver >= 0L, ts >= 0L, tag.nonEmpty).count(identity) == 1,
        "give exactly one of version => v / timestamp_ms => t / tag => name")
      val target =
        if (ver >= 0L) ver
        else if (tag.nonEmpty)
          ManifestV2.listTags(dir.toString).collectFirst {
            case (n, v) if n == tag => v
          }.getOrElse(throw new IllegalArgumentException(
            s"no tag '$tag' at $dir"))
        else ManifestV2.versionAsOfTimestamp(dir.toString, ts)
      val v = ManifestV2.rollbackTo(dir.toString, target)
      val res: Scan = new LocalScan {
        override def readSchema(): StructType = StructType(Seq(
          StructField("restored_version", LongType, nullable = false),
          StructField("new_version", LongType, nullable = false)))
        override def rows(): Array[InternalRow] = Array(
          InternalRow.fromSeq(Seq(target, v)))
      }
      util.Collections.singletonList(res).iterator()
    }
  }
}

/** `CALL graft.system.clone(ns => …, tbl => …, dst_ns => …,
  * dst_tbl => …)` — zero-copy shallow clone
  * ([[ManifestV2.cloneTable]]): the destination's first commit is the
  * source's current snapshot with every data file hard-linked, so
  * cloning any table costs zero data bytes and the two lifecycles
  * are independent (either side's expiry only unlinks its own name).
  */
class CloneProcedure(warehouse: Path) extends UnboundProcedure {
  override def name(): String = "clone"
  override def description(): String =
    "zero-copy shallow clone of a table's current snapshot"
  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "clone"
    override def description(): String = CloneProcedure.this.description()
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("ns", StringType).comment("source namespace").build(),
      ProcedureParameter.in("tbl", StringType).comment("source table").build(),
      ProcedureParameter.in("dst_ns", StringType)
        .comment("destination namespace (must exist)").build(),
      ProcedureParameter.in("dst_tbl", StringType)
        .comment("destination table (must not exist)").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val src = warehouse.resolve(input.getString(0)).resolve(input.getString(1))
      val dstNs = warehouse.resolve(input.getString(2))
      require(Files.isDirectory(dstNs),
        s"destination namespace ${input.getString(2)} does not exist — " +
          "CREATE NAMESPACE first")
      val dst = dstNs.resolve(input.getString(3))
      val linked = ManifestV2.cloneTable(src.toString, dst.toString)
      val res: Scan = new LocalScan {
        override def readSchema(): StructType = StructType(Seq(
          StructField("files_linked", LongType, nullable = false)))
        override def rows(): Array[InternalRow] = Array(
          InternalRow.fromSeq(Seq(linked)))
      }
      util.Collections.singletonList(res).iterator()
    }
  }
}

/** `CALL graft.system.set_not_null(ns => …, tbl => …, col => …)` —
  * the scan-backed converse of `ALTER COLUMN … DROP NOT NULL`
  * ([[GraftCatalog.setNotNull]]): tighten a column to NOT NULL only
  * after proving zero nulls (metadata fast path via per-file null
  * counts; else a column-pruned scan that plans only the unproven
  * files). A procedure, not ALTER syntax, because Spark's analyzer
  * refuses nullable→non-nullable for every v2 catalog upstream.
  */
class SetNotNullProcedure(warehouse: Path) extends UnboundProcedure {
  override def name(): String = "set_not_null"
  override def description(): String =
    "tighten a column to NOT NULL after proving zero nulls"
  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "set_not_null"
    override def description(): String =
      SetNotNullProcedure.this.description()
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("ns", StringType).comment("namespace").build(),
      ProcedureParameter.in("tbl", StringType).comment("table name").build(),
      ProcedureParameter.in("col", StringType).comment("column").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val dir = warehouse.resolve(input.getString(0)).resolve(input.getString(1))
      require(Files.exists(dir.resolve("manifest.txt")), s"no table at $dir")
      val v = GraftCatalog.setNotNull(dir, input.getString(2))
      val res: Scan = new LocalScan {
        override def readSchema(): StructType = StructType(Seq(
          StructField("new_version", LongType, nullable = false)))
        override def rows(): Array[InternalRow] = Array(
          InternalRow.fromSeq(Seq(v)))
      }
      util.Collections.singletonList(res).iterator()
    }
  }
}

/** `CALL graft.system.rewrite_manifests(ns => …, tbl => …,
  * target_entries => n)` — metadata compaction: coalesce the small
  * segment files that incremental commits accumulate into
  * target-sized ones in one `@maint` commit; data files untouched
  * ([[ManifestV2.rewriteManifests]]).
  */
class RewriteManifestsProcedure(warehouse: Path) extends UnboundProcedure {
  override def name(): String = "rewrite_manifests"
  override def description(): String =
    "coalesce small manifest segments (metadata-only, data untouched)"
  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "rewrite_manifests"
    override def description(): String =
      RewriteManifestsProcedure.this.description()
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("ns", StringType).comment("namespace").build(),
      ProcedureParameter.in("tbl", StringType).comment("table name").build(),
      ProcedureParameter.in("target_entries", IntegerType)
        .defaultValue("1000")
        .comment("file entries per rewritten segment").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val dir = warehouse.resolve(input.getString(0)).resolve(input.getString(1))
      require(Files.exists(dir.resolve("manifest.txt")), s"no table at $dir")
      val (before, after) =
        ManifestV2.rewriteManifests(dir.toString, input.getInt(2))
      val res: Scan = new LocalScan {
        override def readSchema(): StructType = StructType(Seq(
          StructField("segments_before", LongType, nullable = false),
          StructField("segments_after", LongType, nullable = false)))
        override def rows(): Array[InternalRow] = Array(
          InternalRow.fromSeq(Seq(before, after)))
      }
      util.Collections.singletonList(res).iterator()
    }
  }
}

/** `CALL graft.system.drop_branch(ns => …, tbl => …, name => …)` —
  * delete a branch ref and its version files; its unpublished data
  * files become expirable.
  */
class DropBranchProcedure(warehouse: Path) extends UnboundProcedure {
  override def name(): String = "drop_branch"
  override def description(): String = "drop a branch ref"
  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "drop_branch"
    override def description(): String =
      DropBranchProcedure.this.description()
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("ns", StringType).comment("namespace").build(),
      ProcedureParameter.in("tbl", StringType).comment("table name").build(),
      ProcedureParameter.in("name", StringType).comment("branch name").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val dir = warehouse.resolve(input.getString(0)).resolve(input.getString(1))
      val existed = ManifestV2.dropBranch(dir.toString, input.getString(2))
      val res: Scan = new LocalScan {
        override def readSchema(): StructType = StructType(Seq(
          StructField("dropped", BooleanType, nullable = false)))
        override def rows(): Array[InternalRow] = Array(
          InternalRow.fromSeq(Seq(existed)))
      }
      util.Collections.singletonList(res).iterator()
    }
  }
}

/** `CALL graft.system.remove_orphans(ns => …, tbl => …,
  * older_than_ms => n)`: delete files under the table root that NO
  * published snapshot references and that are older than the
  * threshold ([[ManifestV2.removeOrphans]] — the Iceberg
  * remove_orphan_files shape). Crashed jobs' staged files and
  * lost-CAS metadata never make it into a snapshot, so snapshot
  * expiry alone can never reclaim them; the age threshold keeps
  * in-flight jobs' staged-but-uncommitted files safe.
  */
class RemoveOrphansProcedure(warehouse: Path) extends UnboundProcedure {
  override def name(): String = "remove_orphans"
  override def description(): String =
    "reclaim unreferenced files older than a threshold"
  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "remove_orphans"
    override def description(): String =
      RemoveOrphansProcedure.this.description()
    override def isDeterministic: Boolean = false // mutates table state
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("ns", StringType).comment("namespace").build(),
      ProcedureParameter.in("tbl", StringType).comment("table name").build(),
      ProcedureParameter.in("older_than_ms", LongType)
        .comment("only unreferenced files older than this age").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val dir = warehouse.resolve(input.getString(0)).resolve(input.getString(1))
      require(Files.exists(dir.resolve("manifest.txt")), s"no table at $dir")
      val reclaimed =
        ManifestV2.removeOrphans(dir.toString, input.getLong(2))
      val res: Scan = new LocalScan {
        override def readSchema(): StructType = StructType(Seq(
          StructField("orphans_removed", LongType, nullable = false)))
        override def rows(): Array[InternalRow] = Array(
          InternalRow.fromSeq(Seq(reclaimed.size.toLong)))
      }
      util.Collections.singletonList(res).iterator()
    }
  }
}

/** `CALL graft.system.compact(ns => …, tbl => …, max_rows => n)`: the
  * OPTIMIZE maintenance pass as a V2 procedure — merge every file
  * smaller than `max_rows` into ~ceil(rows/max_rows) files via a
  * distributed rewrite committed as ONE atomic manifest swap
  * ([[ManifestV2.compactSnapshot]]). Returns one accounting row
  * (files_in, files_out, rows_rewritten).
  */
class CompactProcedure(warehouse: Path) extends UnboundProcedure {
  override def name(): String = "compact"
  override def description(): String =
    "merge fragment files into max_rows-sized ones, one atomic swap"
  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "compact"
    override def description(): String = CompactProcedure.this.description()
    override def isDeterministic: Boolean = false // mutates table state
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("ns", StringType).comment("namespace").build(),
      ProcedureParameter.in("tbl", StringType).comment("table name").build(),
      ProcedureParameter.in("max_rows", LongType)
        .comment("files below this row count are fragments").build(),
      // SCOPED compaction: only fragments whose stats box on
      // where_col intersects [lo, hi] rewrite (box units — internal
      // micros/days for temporal columns). '' = unscoped.
      ProcedureParameter.in("where_col", StringType).defaultValue("''")
        .comment("stats column bounding the rewrite; '' = whole table")
        .build(),
      ProcedureParameter.in("lo", LongType).defaultValue("0")
        .comment("scope lower bound (box units)").build(),
      ProcedureParameter.in("hi", LongType).defaultValue("0")
        .comment("scope upper bound (box units)").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val dir = warehouse.resolve(input.getString(0)).resolve(input.getString(1))
      require(Files.exists(dir.resolve("manifest.txt")), s"no table at $dir")
      val scope = Option(input.getString(3)).filter(_.nonEmpty)
        .map(c => (c, input.getLong(4), input.getLong(5)))
      val (filesIn, filesOut, rowsRewritten) = ManifestV2.compactSnapshot(
        org.apache.spark.sql.SparkSession.active, dir.toString,
        input.getLong(2), scope)
      val res: Scan = new LocalScan {
        override def readSchema(): StructType = StructType(Seq(
          StructField("files_in", LongType, nullable = false),
          StructField("files_out", LongType, nullable = false),
          StructField("rows_rewritten", LongType, nullable = false)))
        override def rows(): Array[InternalRow] = Array(
          InternalRow.fromSeq(Seq(filesIn, filesOut, rowsRewritten)))
      }
      util.Collections.singletonList(res).iterator()
    }
  }
}

/** `CALL graft.system.expire_snapshots(ns => …, tbl => …, keep => n)`:
  * the maintenance surface of the retention model as a V2 PROCEDURE —
  * the Iceberg expire_snapshots shape. Drops every manifest version
  * older than the newest `keep`, then deletes the data files no
  * surviving snapshot references, and returns one row of accounting
  * (versions expired, files reclaimed) as a driver-local scan.
  */
class ExpireSnapshotsProcedure(warehouse: Path) extends UnboundProcedure {
  override def name(): String = "expire_snapshots"
  override def description(): String =
    "reclaim manifest versions and unreferenced data files"
  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "expire_snapshots"
    override def description(): String = ExpireSnapshotsProcedure.this.description()
    override def isDeterministic: Boolean = false // mutates table state
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("ns", StringType).comment("namespace").build(),
      ProcedureParameter.in("tbl", StringType).comment("table name").build(),
      ProcedureParameter.in("keep", IntegerType)
        .comment("how many newest snapshots survive").build(),
      // the Iceberg `older_than` shape: only versions stamped at or
      // before this (epoch millis) expire; -1 (default) = by count
      // alone. Composes with keep — the newest `keep` survive
      // regardless of age.
      ProcedureParameter.in("older_than_ms", LongType).defaultValue("-1")
        .comment("age bound in epoch millis; -1 = no age bound").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val dir = warehouse.resolve(input.getString(0)).resolve(input.getString(1))
      require(Files.exists(dir.resolve("manifest.txt")),
        s"no table at $dir")
      val ot = input.getLong(3)
      val (expired, reclaimed) =
        ManifestV2.expireSnapshots(dir.toString, input.getInt(2),
          olderThanMs = if (ot < 0L) Long.MaxValue else ot)
      val out: Scan = new LocalScan {
        override def readSchema(): StructType = StructType(Seq(
          StructField("expired_versions", LongType, nullable = false),
          StructField("reclaimed_files", LongType, nullable = false)))
        override def rows(): Array[InternalRow] = Array(
          InternalRow.fromSeq(Seq(expired.size.toLong, reclaimed.size.toLong)))
      }
      util.Collections.singletonList(out).iterator()
    }
  }
}

object GraftCatalog {
  private[sources] val functions: Map[String, UnboundFunction] = Map(
    "vmod" -> VModUnbound,
    "sumsq" -> SumSqUnbound)

  /** The hidden-partition transform functions ([[PartTransform]]) as
    * V2 scalar functions. Bound implementations delegate to the same
    * [[PartTransform]] derivations the writer and the scan
    * transposition use, so the three layers cannot drift; canonical
    * names are what SPJ compares to prove two scans co-partitioned.
    */
  private[sources] val transformFns: Map[String, UnboundFunction] = Map(
    "bucket" -> BucketUnbound,
    "days" -> DaysUnbound,
    "hours" -> HoursUnbound,
    "months" -> MonthsUnbound,
    "truncate" -> TruncateUnbound)

  /** The USER-set table properties out of a CREATE/REPLACE property
    * map: engine-reserved keys (provider, location, owner, external)
    * are Spark bookkeeping, not table metadata — everything else
    * (including `comment`) is stored, versioned with the snapshot.
    * Keys are validated against the manifest line format here, the
    * single entry point for property writes.
    */
  private[graft] def userProps(
      properties: java.util.Map[String, String]): Map[String, String] = {
    val reserved = Set("provider", "location", "owner", "external")
    val b = Map.newBuilder[String, String]
    properties.forEach { (k, v) =>
      if (!reserved.contains(k)) { requirePropKey(k); b += ((k, v)) }
    }
    b.result()
  }

  /** Property keys ride a `k=ESC(v)` manifest header token: `=` would
    * split wrong and tab/newline would break the line — refuse them
    * at set time rather than corrupt the header.
    */
  private[graft] def requirePropKey(k: String): Unit =
    require(k.nonEmpty && !k.exists(c => c == '=' || c == '\t' ||
        c == '\n' || c == '\r'),
      s"table property key '$k' must be non-empty and free of " +
        "'=', tabs, and newlines")

  /** Prove a column holds ZERO nulls, or refuse with the count —
    * the gate in front of SET NOT NULL. Metadata-only when every
    * live file tracks a zero null count for the column; otherwise a
    * column-pruned `IS NULL` count scan whose PLANNING already prunes
    * the proven-clean files off their null-count boxes, so the scan
    * reads only the files metadata could not clear.
    */
  private[graft] def proveNoNulls(root: java.nio.file.Path,
      files: Seq[ManifestV2.FileEntry], col: String): Unit = {
    val live = files.filter(_.rows > 0L)
    val provenClean = live.forall(_.nulls.get(col).contains(0L))
    if (!provenClean) {
      val nullRows = org.apache.spark.sql.SparkSession.active
        .read.format("graft.sources.ManifestV2")
        .option("path", root.toString).load()
        .where(org.apache.spark.sql.functions.col(col).isNull)
        .count()
      require(nullRows == 0L,
        s"cannot SET NOT NULL on $col: $nullRows row(s) are NULL — " +
          "clean them (UPDATE/DELETE) first")
    }
  }

  /** SET NOT NULL as a commit: prove zero nulls (re-proven on every
    * CAS retry — a concurrent NULL append between proof and commit
    * re-derives and is caught), then tighten the schema field.
    * Surfaced as `CALL graft.system.set_not_null` because Spark's
    * analyzer hard-refuses `ALTER COLUMN … SET NOT NULL` for EVERY
    * v2 catalog (CheckAnalysis "Cannot change nullable column to
    * non-nullable") before a catalog could prove cleanliness — the
    * same upstream-gate class as ViewCatalog. The TableChange path
    * through [[GraftCatalog.alterTable]] shares this proof for API
    * callers.
    */
  private[graft] def setNotNull(root: java.nio.file.Path,
      col: String): Long =
    ManifestV2.commit(root) { cur =>
      val st = cur.getOrElse(
        throw new IllegalStateException(s"no manifest at $root"))
      val f = st.schema.fields.find(_.name == col).getOrElse(
        throw new IllegalArgumentException(s"no such column: $col"))
      require(f.nullable, s"$col is already NOT NULL")
      proveNoNulls(root, st.files, col)
      st.copy(schema = org.apache.spark.sql.types.StructType(
        st.schema.fields.map(x =>
          if (x.name == col) x.copy(nullable = false) else x)))
    }.version

  /** Register the catalog on this session (idempotent). Catalog confs
    * are read once at first resolution per session, so setting the
    * same values repeatedly is safe across Verify/Bench re-runs.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse",
      Sources.scratchDir(spark, "graft_warehouse"))
  }

  /** Driver-contract query: the catalog surface end to end in PURE
    * SQL — namespace DDL, CREATE TABLE (schema lands in the manifest),
    * INSERT INTO through the commit protocol with the codegen'd V2
    * scalar function in the projection, then an aggregate read-back
    * through the manifest scan using the exact BigInteger V2
    * aggregate. No DataFrame transform anywhere: every step is a SQL
    * statement resolved by [[GraftCatalog]], which is the point.
    *
    * Finals follow the Fx rule — accumulate exact, convert ONCE at the
    * end, and the converted-to type is BIGINT, never DECIMAL (engines
    * canonicalize decimal finals differently, so a decimal in a FINAL
    * schema is a cross-engine hash hazard; StructuralSpec bans it).
    * Bounds: `key_sum` = Σ o_orderkey fits BIGINT through sf1
    * (≈ 4.5e12 « 2^63); `key_sumsq` = Σ o_orderkey² fits through
    * sf0.1 (≈ 5.4e16), the largest scale any check runs — the sumsq
    * aggregate itself still accumulates in exact BigInteger, only the
    * final value is narrowed.
    */
  def catalogSqlQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_cat_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    // fresh per invocation: the bench re-runs a query in one JVM and
    // an append-onto-last-run's-table would double the rows
    spark.sql("DROP TABLE IF EXISTS graft.db.okeys")
    spark.sql("CREATE TABLE graft.db.okeys (okey BIGINT, m BIGINT)")
    spark.sql("""INSERT INTO graft.db.okeys
      |SELECT o_orderkey, graft.fn.vmod(o_orderkey)
      |FROM graft_cat_orders_src""".stripMargin)
    spark.sql("""SELECT m, COUNT(*) AS n,
      |  CAST(SUM(okey) AS BIGINT) AS key_sum,
      |  CAST(graft.fn.sumsq(okey) AS BIGINT) AS key_sumsq
      |FROM graft.db.okeys GROUP BY m ORDER BY m""".stripMargin)
  }

  /** [[catalogSqlQuery]] oracle: the catalog round-trip must be
    * invisible, so the closed form states the same algebra straight
    * off `orders` — vmod inlined as % 97, sumsq as a HUGEINT product
    * sum (the exactness the BigInteger state guarantees on the Spark
    * side).
    */
  def catalogSqlSql(): String =
    """SELECT o_orderkey % 97 AS m, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
      |  CAST(SUM(CAST(o_orderkey AS HUGEINT) * o_orderkey) AS BIGINT) AS key_sumsq
      |FROM orders GROUP BY 1 ORDER BY m""".stripMargin

  /** Driver-contract query for METADATA-ONLY DELETE: four quartile-
    * bounded INSERTs land files whose in-manifest m-stats are quartile-
    * pure, so `DELETE FROM … WHERE m < 25` is decidable file-by-file —
    * the delete is ONE manifest swap, no data row is read or written
    * (ManifestTable rejects any delete that would need a rewrite, so
    * the statement succeeding IS the proof it ran metadata-only). The
    * read-back aggregate then hashes against the survivors' closed
    * form. At 100 TB, retention deletes against a range-clustered
    * layout are exactly this shape.
    */
  def metadataDeleteQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_del_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.okd")
    spark.sql("CREATE TABLE graft.db.okd (okey BIGINT, m BIGINT)")
    for (q <- 0 until 4)
      spark.sql(s"""INSERT INTO graft.db.okd
        |SELECT o_orderkey, o_orderkey % 97 FROM graft_del_orders_src
        |WHERE o_orderkey % 97 >= ${q * 25}
        |  AND o_orderkey % 97 < ${(q + 1) * 25}""".stripMargin)
    spark.sql("DELETE FROM graft.db.okd WHERE m < 25")
    spark.sql("""SELECT m, COUNT(*) AS n,
      |  CAST(SUM(okey) AS BIGINT) AS key_sum
      |FROM graft.db.okd GROUP BY m ORDER BY m""".stripMargin)
  }

  /** [[metadataDeleteQuery]] oracle: survivors of the quartile delete,
    * stated straight off `orders`.
    */
  def metadataDeleteSql(): String =
    """SELECT o_orderkey % 97 AS m, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      |FROM orders WHERE o_orderkey % 97 >= 25
      |GROUP BY 1 ORDER BY m""".stripMargin

  /** Driver-contract query for SQL TIME TRAVEL: every commit publishes
    * an immutable `manifest.v<N>.txt` before the pointer swap, so
    * `VERSION AS OF` reads any historical snapshot with zero copies —
    * CREATE is v1, the INSERT is v2, and the INSERT OVERWRITE that
    * replaces the whole table is v3. The query reads v2 (the
    * overwritten data, physically still on disk because commits never
    * reclaim) and the live v3 side by side; both halves hash against
    * the closed form, so a version leak in either direction mismatches.
    */
  def timeTravelQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_tt_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.tt")
    spark.sql("CREATE TABLE graft.db.tt (okey BIGINT, m BIGINT)") // v1
    spark.sql("""INSERT INTO graft.db.tt
      |SELECT o_orderkey, o_orderkey % 97 FROM graft_tt_orders_src
      |WHERE o_orderkey % 97 < 50""".stripMargin) // v2
    spark.sql("""INSERT OVERWRITE graft.db.tt
      |SELECT o_orderkey, o_orderkey % 97 FROM graft_tt_orders_src
      |WHERE o_orderkey % 97 >= 50""".stripMargin) // v3 replaces v2
    spark.sql("""SELECT 'current' AS snap, COUNT(*) AS n,
      |  CAST(SUM(okey) AS BIGINT) AS key_sum
      |FROM graft.db.tt
      |UNION ALL
      |SELECT 'v2' AS snap, COUNT(*) AS n,
      |  CAST(SUM(okey) AS BIGINT) AS key_sum
      |FROM graft.db.tt VERSION AS OF 2
      |ORDER BY snap""".stripMargin)
  }

  /** Driver-contract query for row-level MERGE INTO (the upsert every
    * warehouse ingest loop runs): the table is seeded with the
    * `o_orderkey % 3 = 0` third of per-customer order stats, then ONE
    * MERGE statement folds in the other two thirds — exercising all
    * three clause kinds at once (matched+predicate DELETE, matched
    * UPDATE, not-matched INSERT). Every branch is exact BIGINT
    * arithmetic, so the read-back hashes against the closed form. The
    * rewrite is group-based copy-on-write with runtime group
    * filtering: at 100 TB an upsert touching one day's files rewrites
    * one day's files (CatalogSpec pins that pruning; here the hash
    * pins the semantics).
    */
  def mergeUpsertQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_mrg_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.mrg")
    spark.sql("CREATE TABLE graft.db.mrg (ck BIGINT, n BIGINT, ks BIGINT)")
    spark.sql("""INSERT INTO graft.db.mrg
      |SELECT o_custkey, COUNT(*), SUM(o_orderkey)
      |FROM graft_mrg_orders_src WHERE o_orderkey % 3 = 0
      |GROUP BY o_custkey""".stripMargin)
    spark.sql("""MERGE INTO graft.db.mrg t
      |USING (SELECT o_custkey AS ck, COUNT(*) AS n, SUM(o_orderkey) AS ks
      |       FROM graft_mrg_orders_src WHERE o_orderkey % 3 <> 0
      |       GROUP BY o_custkey) s
      |ON t.ck = s.ck
      |WHEN MATCHED AND t.ck % 10 = 0 THEN DELETE
      |WHEN MATCHED THEN UPDATE SET n = t.n + s.n, ks = t.ks + s.ks
      |WHEN NOT MATCHED THEN INSERT (ck, n, ks) VALUES (s.ck, s.n, s.ks)"""
      .stripMargin)
    spark.sql("SELECT ck, n, ks FROM graft.db.mrg ORDER BY ck")
  }

  /** [[mergeUpsertQuery]] oracle: the post-merge table stated as a
    * full outer join of the two thirds — both present merges the
    * stats (unless the delete branch fires), one side passes through.
    */
  def mergeUpsertSql(): String =
    """WITH t AS (SELECT o_custkey AS ck, COUNT(*) AS n,
      |             CAST(SUM(o_orderkey) AS BIGINT) AS ks
      |           FROM orders WHERE o_orderkey % 3 = 0 GROUP BY 1),
      |     s AS (SELECT o_custkey AS ck, COUNT(*) AS n,
      |             CAST(SUM(o_orderkey) AS BIGINT) AS ks
      |           FROM orders WHERE o_orderkey % 3 <> 0 GROUP BY 1)
      |SELECT COALESCE(t.ck, s.ck) AS ck,
      |  CASE WHEN t.ck IS NOT NULL AND s.ck IS NOT NULL THEN t.n + s.n
      |       WHEN t.ck IS NOT NULL THEN t.n ELSE s.n END AS n,
      |  CASE WHEN t.ck IS NOT NULL AND s.ck IS NOT NULL THEN t.ks + s.ks
      |       WHEN t.ck IS NOT NULL THEN t.ks ELSE s.ks END AS ks
      |FROM t FULL OUTER JOIN s ON t.ck = s.ck
      |WHERE NOT (t.ck IS NOT NULL AND s.ck IS NOT NULL AND t.ck % 10 = 0)
      |ORDER BY ck""".stripMargin

  /** Driver-contract query for row-level UPDATE: the same quartile-
    * clustered layout as [[metadataDeleteQuery]], then an UPDATE whose
    * predicate `m = 12` no stats box can decide. On an unpartitioned
    * table this runs MERGE-ON-READ since round 11
    * ([[ManifestV2]]'s delta update): the matched rows' old versions
    * die by position-delete sidecar, the new versions land in fresh
    * files, one atomic swap, NO source file rewritten (CatalogSpec
    * pins the storage shape). The read-back aggregate hashes every
    * row the statement did and did not touch — identical under either
    * execution strategy, which is exactly the point.
    */
  def updateRewriteQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_upd_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.okupd")
    spark.sql("CREATE TABLE graft.db.okupd (okey BIGINT, m BIGINT)")
    for (q <- 0 until 4)
      spark.sql(s"""INSERT INTO graft.db.okupd
        |SELECT o_orderkey, o_orderkey % 97 FROM graft_upd_orders_src
        |WHERE o_orderkey % 97 >= ${q * 25}
        |  AND o_orderkey % 97 < ${(q + 1) * 25}""".stripMargin)
    spark.sql(
      "UPDATE graft.db.okupd SET okey = okey + 100000000 WHERE m = 12")
    spark.sql("""SELECT m, COUNT(*) AS n,
      |  CAST(SUM(okey) AS BIGINT) AS key_sum
      |FROM graft.db.okupd GROUP BY m ORDER BY m""".stripMargin)
  }

  /** [[updateRewriteQuery]] oracle: the shifted m=12 bucket stated
    * straight off `orders`.
    */
  def updateRewriteSql(): String =
    """SELECT o_orderkey % 97 AS m, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey +
      |    CASE WHEN o_orderkey % 97 = 12 THEN 100000000 ELSE 0 END)
      |    AS BIGINT) AS key_sum
      |FROM orders GROUP BY 1 ORDER BY m""".stripMargin

  /** Driver-contract query for the non-aligned DELETE path: a
    * predicate on key parity that NO file's [min,max] box can decide,
    * so the metadata-only manifest swap is impossible and the
    * statement runs MERGE-ON-READ — each touched file gains a
    * position-delete sidecar, NO data file is rewritten, and readers
    * subtract the positions (the complement of [[metadataDeleteQuery]],
    * which proves the aligned fast path; CatalogSpec pins that the
    * data files are byte-identical after this statement). Survivors
    * hash against the closed form.
    */
  def deleteRewriteQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_delrw_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.okdrw")
    spark.sql("CREATE TABLE graft.db.okdrw (okey BIGINT, m BIGINT)")
    spark.sql("""INSERT INTO graft.db.okdrw
      |SELECT o_orderkey, o_orderkey % 97
      |FROM graft_delrw_orders_src""".stripMargin)
    spark.sql("DELETE FROM graft.db.okdrw WHERE okey % 2 = 0")
    spark.sql("""SELECT m, COUNT(*) AS n,
      |  CAST(SUM(okey) AS BIGINT) AS key_sum
      |FROM graft.db.okdrw GROUP BY m ORDER BY m""".stripMargin)
  }

  /** [[deleteRewriteQuery]] oracle: odd-key survivors off `orders`. */
  def deleteRewriteSql(): String =
    """SELECT o_orderkey % 97 AS m, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      |FROM orders WHERE o_orderkey % 2 <> 0
      |GROUP BY 1 ORDER BY m""".stripMargin

  /** Driver-contract query for PARTITIONED TABLES + the storage-
    * partitioned join, in pure SQL: two tables created
    * `PARTITIONED BY (bk)` (bk = custkey % 8, stored explicitly),
    * loaded through the clustered-write path (every staged file lands
    * single-valued on bk, provably via its stats box), then joined on
    * (bk, ck) — the co-partitioned layout means Spark zips the bucket
    * groups directly with NO exchange on either side (CatalogSpec pins
    * the plan; here the hash pins the join's semantics). This is the
    * Iceberg bucketed-join shape as DDL: at 100 TB the eliminated
    * shuffle IS the join cost.
    */
  def bucketedJoinQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    // session-scoped like RangeV2.spjJoinQuery's: both flags are inert
    // for anything but a V2 scan that REPORTS a KeyGroupedPartitioning
    // (i.e. this connector), so later queries in a shared session are
    // unaffected; restoring them before returning would instead
    // un-plan the SPJ, because the returned frame is physically
    // planned at execution time
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_bj_orders_src")
    graft.Tables.customer(spark, dir)
      .createOrReplaceTempView("graft_bj_cust_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.ob")
    spark.sql("DROP TABLE IF EXISTS graft.db.cb")
    spark.sql("""CREATE TABLE graft.db.ob (ck BIGINT, okey BIGINT, bk BIGINT)
      |PARTITIONED BY (bk)""".stripMargin)
    spark.sql("""INSERT INTO graft.db.ob
      |SELECT o_custkey, o_orderkey, o_custkey % 8
      |FROM graft_bj_orders_src""".stripMargin)
    spark.sql("""CREATE TABLE graft.db.cb (ck BIGINT, bk BIGINT)
      |PARTITIONED BY (bk)""".stripMargin)
    spark.sql("""INSERT INTO graft.db.cb
      |SELECT c_custkey, c_custkey % 8 FROM graft_bj_cust_src""".stripMargin)
    spark.sql("""SELECT o.bk AS bk, COUNT(*) AS n,
      |  CAST(SUM(o.okey) AS BIGINT) AS key_sum
      |FROM graft.db.ob o JOIN graft.db.cb c
      |  ON o.bk = c.bk AND o.ck = c.ck
      |GROUP BY o.bk ORDER BY bk""".stripMargin)
  }

  /** [[bucketedJoinQuery]] oracle: the same join stated straight off
    * the base tables.
    */
  def bucketedJoinSql(): String =
    """SELECT o_custkey % 8 AS bk, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY bk""".stripMargin

  /** Driver-contract query for HIDDEN BUCKET PARTITIONING
    * ([[PartTransform]]): the same orders⋈customer join as
    * [[bucketedJoinQuery]], but `PARTITIONED BY (bucket(8, ck))` with
    * NO stored bucket column anywhere — the derived murmur3 bucket
    * exists only as each file's reserved `@p` point box. Writes
    * cluster on the transform (resolved through this catalog's V2
    * `bucket` function), reads report KeyGroupedPartitioning on the
    * transform expression, and the join zips bucket groups on the
    * NATURAL key with zero exchange (HiddenPartitionSpec pins the
    * plan; this hash pins the semantics). A point-lookup subquery on a
    * single custkey rides the SAME table through `@p` transposition —
    * 1-in-8 of the files planned off pure metadata, which a [min,max]
    * box on a hash-scattered key can never prove.
    */
  def hiddenBucketJoinQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_hbj_orders_src")
    graft.Tables.customer(spark, dir)
      .createOrReplaceTempView("graft_hbj_cust_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.hbo")
    spark.sql("DROP TABLE IF EXISTS graft.db.hbc")
    spark.sql("""CREATE TABLE graft.db.hbo (ck BIGINT, okey BIGINT)
      |PARTITIONED BY (bucket(8, ck))""".stripMargin)
    spark.sql("""INSERT INTO graft.db.hbo
      |SELECT o_custkey, o_orderkey FROM graft_hbj_orders_src""".stripMargin)
    spark.sql("""CREATE TABLE graft.db.hbc (ck BIGINT, nk BIGINT)
      |PARTITIONED BY (bucket(8, ck))""".stripMargin)
    spark.sql("""INSERT INTO graft.db.hbc
      |SELECT c_custkey, c_nationkey FROM graft_hbj_cust_src""".stripMargin)
    spark.sql("""SELECT c.nk AS nk, COUNT(*) AS n,
      |  CAST(SUM(o.okey) AS BIGINT) AS key_sum,
      |  (SELECT CAST(SUM(okey) AS BIGINT) FROM graft.db.hbo
      |     WHERE ck = 1) AS probe_sum
      |FROM graft.db.hbo o JOIN graft.db.hbc c ON o.ck = c.ck
      |GROUP BY c.nk ORDER BY nk""".stripMargin)
  }

  /** [[hiddenBucketJoinQuery]] oracle: the join and the point probe
    * straight off the base tables — the hidden layout must be
    * invisible.
    */
  def hiddenBucketJoinSql(): String =
    """SELECT CAST(c_nationkey AS BIGINT) AS nk, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
      |  (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM orders
      |     WHERE o_custkey = 1) AS probe_sum
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY nk""".stripMargin

  /** Driver-contract query for RUNTIME FILE PRUNING on the manifest
    * scan (the DSv2 dynamic-partition-pruning contract, now on the
    * warehouse workhorse): the fact table is hidden-bucketed on
    * custkey; the dimension's selective filter realizes a key list at
    * run time, Spark hands it to the scan as an IN predicate, and
    * file planning shrinks through stats boxes AND the transposed
    * `@p` bucket conjuncts (HiddenPartitionSpec pins the skip counter;
    * this hash pins losslessness). Static pushdown cannot do this —
    * the keys exist only after the build side executes. At 100 TB
    * this is the fact⋈dim query: a 25-nation dimension cut turns a
    * full fact scan into the matching buckets' files.
    */
  def runtimeFilePruneQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    // DPP and SPJ are per-scan alternatives in Spark: runtime
    // filtering is planned only when the scan does not report key
    // groups, so pin the SPJ gate OFF here (its Spark default) — a
    // prior query in a shared session may have turned it on
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_rfp_orders_src")
    graft.Tables.customer(spark, dir)
      .createOrReplaceTempView("graft_rfp_cust_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.rfp")
    spark.sql("""CREATE TABLE graft.db.rfp (ck BIGINT, okey BIGINT)
      |PARTITIONED BY (bucket(16, ck))""".stripMargin)
    spark.sql("""INSERT INTO graft.db.rfp
      |SELECT o_custkey, o_orderkey FROM graft_rfp_orders_src""".stripMargin)
    spark.sql("""SELECT COUNT(*) AS n,
      |  CAST(SUM(f.okey) AS BIGINT) AS key_sum,
      |  CAST(SUM(d.c_custkey) AS BIGINT) AS ck_sum
      |FROM graft.db.rfp f
      |JOIN (SELECT c_custkey FROM graft_rfp_cust_src
      |      WHERE c_nationkey = 7) d
      |  ON f.ck = d.c_custkey""".stripMargin)
  }

  /** [[runtimeFilePruneQuery]] oracle. */
  def runtimeFilePruneSql(): String =
    """SELECT COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
      |  CAST(SUM(c_custkey) AS BIGINT) AS ck_sum
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_nationkey = 7""".stripMargin

  /** Driver-contract query for SNAPSHOT TAGS: the first half of
    * orders lands and is tagged `corpus-v1`; the second half lands;
    * a retention sweep expires everything but the live snapshot — and
    * the tagged snapshot must still serve, files and all, because the
    * tag pins it. The result pairs the LIVE aggregate with the
    * TAGGED-snapshot aggregate read through `VERSION AS OF
    * 'corpus-v1'`: a tag resolving to the wrong version, expiry
    * reclaiming a pinned file, or name resolution drift all mismatch
    * the hash. This is the reproducibility anchor of a training
    * pipeline — "the exact corpus the model saw" survives retention.
    */
  def snapshotTagQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_st_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.stg")
    spark.sql("CREATE TABLE graft.db.stg (ck BIGINT, okey BIGINT)")
    spark.sql("""INSERT INTO graft.db.stg
      |SELECT o_custkey, o_orderkey FROM graft_st_orders_src
      |WHERE o_orderkey % 2 = 0""".stripMargin)
    // bounded: a procedure result is one accounting row
    spark.sql("CALL graft.system.tag(ns => 'db', tbl => 'stg', " +
      "name => 'corpus-v1', version => -1)").collect()
    spark.sql("""INSERT INTO graft.db.stg
      |SELECT o_custkey, o_orderkey FROM graft_st_orders_src
      |WHERE o_orderkey % 2 = 1""".stripMargin)
    // bounded: a procedure result is one accounting row
    spark.sql("CALL graft.system.expire_snapshots(" +
      "ns => 'db', tbl => 'stg', keep => 1)").collect()
    spark.sql("""SELECT live.n AS live_n, live.key_sum AS live_sum,
      |  tagged.n AS tagged_n, tagged.key_sum AS tagged_sum
      |FROM
      |  (SELECT COUNT(*) AS n, CAST(SUM(okey) AS BIGINT) AS key_sum
      |   FROM graft.db.stg) live,
      |  (SELECT COUNT(*) AS n, CAST(SUM(okey) AS BIGINT) AS key_sum
      |   FROM graft.db.stg VERSION AS OF 'corpus-v1') tagged""".stripMargin)
  }

  /** [[snapshotTagQuery]] oracle: live = all orders, tagged = the
    * even-key half.
    */
  def snapshotTagSql(): String =
    """SELECT
      |  (SELECT COUNT(*) FROM orders) AS live_n,
      |  (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM orders) AS live_sum,
      |  (SELECT COUNT(*) FROM orders WHERE o_orderkey % 2 = 0) AS tagged_n,
      |  (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM orders
      |     WHERE o_orderkey % 2 = 0) AS tagged_sum""".stripMargin

  /** Driver-contract query for `TIMESTAMP AS OF` time travel (r12
    * verdict ask #3 — the most common ad-hoc time-travel phrasing):
    * every commit stamps a monotone-clamped wall-clock in its manifest
    * header; `TIMESTAMP AS OF t` binary-searches the latest version
    * stamped <= t off header-only reads. The query ingests the even
    * keys, captures the commit instant, ingests the odd keys, then
    * reads BOTH timestamps of the mutating table side by side — a
    * resolution that drifts one version either way breaks the closed
    * form.
    */
  def timestampTravelQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_ttv_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.ttv")
    spark.sql("CREATE TABLE graft.db.ttv (k BIGINT, m BIGINT)")
    spark.sql("""INSERT INTO graft.db.ttv
      |SELECT o_orderkey, o_orderkey % 97 FROM graft_ttv_orders_src
      |WHERE o_orderkey % 2 = 0""".stripMargin)
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val t1 = ManifestV2.readManifest(
      java.nio.file.Paths.get(wh, "db", "ttv")).get.commitTs
    // stamps are millis: hold the next commit out of t1's millisecond
    // — the ms separation IS the semantics under test here, so wait
    // exactly until the clock passes t1 (≤1 ms) instead of guessing a
    // sleep length
    while (System.currentTimeMillis() <= t1) Thread.onSpinWait()
    spark.sql("""INSERT INTO graft.db.ttv
      |SELECT o_orderkey, o_orderkey % 97 FROM graft_ttv_orders_src
      |WHERE o_orderkey % 2 = 1""".stripMargin)
    val asOf = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(t1))
    spark.sql(s"""SELECT 'evens' AS snap, COUNT(*) AS n,
      |  CAST(SUM(k) AS BIGINT) AS key_sum
      |FROM graft.db.ttv TIMESTAMP AS OF '$asOf'
      |UNION ALL
      |SELECT 'full' AS snap, COUNT(*) AS n,
      |  CAST(SUM(k) AS BIGINT) AS key_sum
      |FROM graft.db.ttv
      |ORDER BY snap""".stripMargin)
  }

  /** [[timestampTravelQuery]] oracle: the first timestamp sees exactly
    * the even keys, the live table everything.
    */
  def timestampTravelSql(): String =
    """SELECT 'evens' AS snap, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      |FROM orders WHERE o_orderkey % 2 = 0
      |UNION ALL
      |SELECT 'full' AS snap, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      |FROM orders
      |ORDER BY snap""".stripMargin

  /** Driver-contract query for RENAME COLUMN (round 13 — the last
    * schema-evolution verb users ask for): metadata-only without
    * field IDs — the rename commit rewrites the schema field, every
    * entry's stats keys, and the partition renders to the new name,
    * and records the old name as an alias the leaf readers resolve
    * old footers through. The query ingests the even keys, renames
    * `amt` to `amount`, ingests the odd keys (new physical name),
    * then aggregates ACROSS both file populations under the new name
    * with a filter that must prune and decode through the alias — a
    * null-filled old file, a missed sidecar, or a stale stats key
    * breaks the closed form.
    */
  def renameColumnQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_rnc_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.rnc")
    spark.sql("CREATE TABLE graft.db.rnc (k BIGINT, amt BIGINT)")
    spark.sql("""INSERT INTO graft.db.rnc
      |SELECT o_orderkey, o_orderkey * 3 FROM graft_rnc_orders_src
      |WHERE o_orderkey % 2 = 0""".stripMargin)
    spark.sql("ALTER TABLE graft.db.rnc RENAME COLUMN amt TO amount")
    spark.sql("""INSERT INTO graft.db.rnc
      |SELECT o_orderkey, o_orderkey * 3 FROM graft_rnc_orders_src
      |WHERE o_orderkey % 2 = 1""".stripMargin)
    spark.sql("""SELECT amount % 10 AS m, COUNT(*) AS n,
      |  CAST(SUM(amount) AS BIGINT) AS amount_sum,
      |  CAST(SUM(CASE WHEN amount >= 30 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS big_n
      |FROM graft.db.rnc GROUP BY 1 ORDER BY m""".stripMargin)
  }

  /** [[renameColumnQuery]] oracle: the renamed column is exactly
    * `o_orderkey * 3` over every row, both file populations.
    */
  def renameColumnSql(): String =
    """SELECT (o_orderkey * 3) % 10 AS m, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey * 3) AS BIGINT) AS amount_sum,
      |  CAST(SUM(CASE WHEN o_orderkey * 3 >= 30 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS big_n
      |FROM orders GROUP BY 1 ORDER BY m""".stripMargin

  /** Driver-contract query for DROP COLUMN (round 13 — completing the
    * ADD/RENAME/DROP evolution triple): metadata-only — the column
    * leaves the schema and every entry's stats keys; old files' bytes
    * for it are simply never decoded again, and the name joins the
    * reserved ledger so it can never be re-taken while it lives in
    * old footers. The query ingests the evens WITH a junk column,
    * drops it, ingests the odds WITHOUT it, and aggregates the
    * surviving columns across both file populations — a junk value
    * leaking into the decode set, a null-filled survivor, or a stale
    * stats key breaks the closed form.
    */
  def dropColumnQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_drc_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.drc")
    spark.sql("CREATE TABLE graft.db.drc " +
      "(k BIGINT, junk BIGINT, amt BIGINT)")
    spark.sql("""INSERT INTO graft.db.drc
      |SELECT o_orderkey, o_orderkey * 7, o_orderkey * 2
      |FROM graft_drc_orders_src WHERE o_orderkey % 2 = 0""".stripMargin)
    spark.sql("ALTER TABLE graft.db.drc DROP COLUMN junk")
    spark.sql("""INSERT INTO graft.db.drc
      |SELECT o_orderkey, o_orderkey * 2
      |FROM graft_drc_orders_src WHERE o_orderkey % 2 = 1""".stripMargin)
    spark.sql("""SELECT amt % 10 AS m, COUNT(*) AS n,
      |  CAST(SUM(k) AS BIGINT) AS key_sum,
      |  CAST(SUM(amt) AS BIGINT) AS amt_sum
      |FROM graft.db.drc GROUP BY 1 ORDER BY m""".stripMargin)
  }

  /** [[dropColumnQuery]] oracle: the surviving columns are pure
    * functions of `orders` over every row, both file populations.
    */
  def dropColumnSql(): String =
    """SELECT (o_orderkey * 2) % 10 AS m, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
      |  CAST(SUM(o_orderkey * 2) AS BIGINT) AS amt_sum
      |FROM orders GROUP BY 1 ORDER BY m""".stripMargin

  /** Driver-contract query for ALTER COLUMN TYPE widening (round 14 —
    * completing type promotion on the evolution ledger): metadata-only
    * INT -> BIGINT. The query ingests the evens as INT, widens, then
    * ingests the odds with values BEYOND the int range — so the
    * aggregate crosses a pre-widen INT32 file population (decoded
    * through the up-cast) and a post-widen INT64 one, and any
    * truncation, misdecode, or null-fill breaks the closed form.
    */
  def widenTypeQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_wt_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.wt")
    spark.sql("CREATE TABLE graft.db.wt (k BIGINT, qty INT)")
    spark.sql("""INSERT INTO graft.db.wt
      |SELECT o_orderkey, CAST(o_orderkey % 100000 AS INT)
      |FROM graft_wt_orders_src WHERE o_orderkey % 2 = 0""".stripMargin)
    spark.sql("ALTER TABLE graft.db.wt ALTER COLUMN qty TYPE BIGINT")
    spark.sql("""INSERT INTO graft.db.wt
      |SELECT o_orderkey, o_orderkey + 4000000000
      |FROM graft_wt_orders_src WHERE o_orderkey % 2 = 1""".stripMargin)
    spark.sql("""SELECT k % 10 AS m, COUNT(*) AS n,
      |  CAST(SUM(qty) AS BIGINT) AS qty_sum,
      |  CAST(SUM(CASE WHEN qty > 3000000000 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS wide_n
      |FROM graft.db.wt GROUP BY 1 ORDER BY m""".stripMargin)
  }

  /** [[widenTypeQuery]] oracle: each parity's contribution is a pure
    * function of `orders`; only post-widen rows exceed the int range.
    */
  def widenTypeSql(): String =
    """SELECT o_orderkey % 10 AS m, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN o_orderkey % 100000
      |    ELSE o_orderkey + 4000000000 END) AS BIGINT) AS qty_sum,
      |  CAST(SUM(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS wide_n
      |FROM orders GROUP BY 1 ORDER BY m""".stripMargin

  /** Driver-contract query for METADATA TABLES (round 13 — the
    * Iceberg `t.history`/`t.files`/`t.tags`/`t.branches` shape): a
    * table's own log SELECT-able through the catalog, computed from
    * manifest headers and refs, no data file opened. The query builds
    * a 3-version history (empty CREATE, evens, odds), pins a tag,
    * forks a branch, then reads all four views into one closed form —
    * a miscounted version, file, or ref breaks the hash.
    */
  def metaTablesQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_mtt_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.mtt")
    spark.sql("CREATE TABLE graft.db.mtt (k BIGINT)")
    spark.sql("""INSERT INTO graft.db.mtt
      |SELECT /*+ REPARTITION(1) */ o_orderkey FROM graft_mtt_orders_src
      |WHERE o_orderkey % 2 = 0""".stripMargin)
    spark.sql("""INSERT INTO graft.db.mtt
      |SELECT /*+ REPARTITION(1) */ o_orderkey FROM graft_mtt_orders_src
      |WHERE o_orderkey % 2 = 1""".stripMargin)
    // bounded: procedure results, one row each
    spark.sql("CALL graft.system.tag(" +
      "ns => 'db', tbl => 'mtt', name => 'pinned', version => -1)")
      .collect()
    spark.sql("CALL graft.system.branch(" +
      "ns => 'db', tbl => 'mtt', name => 'wip')").collect()
    spark.sql("""SELECT concat('v', CAST(version AS STRING)) AS item,
      |  files AS a, rows AS b
      |FROM graft.db.mtt.history
      |UNION ALL
      |SELECT 'files_total' AS item, COUNT(*) AS a,
      |  CAST(SUM(rows) AS BIGINT) AS b
      |FROM graft.db.mtt.files
      |UNION ALL
      |SELECT concat('tag_', name) AS item, version AS a,
      |  CAST(0 AS BIGINT) AS b
      |FROM graft.db.mtt.tags
      |UNION ALL
      |SELECT concat('branch_', name) AS item, tip AS a,
      |  base_version AS b
      |FROM graft.db.mtt.branches
      |ORDER BY item""".stripMargin)
  }

  /** [[metaTablesQuery]] oracle: the log restated as a closed form —
    * v1 empty, v2 = the evens in one file, v3 = everything in two,
    * one tag at v3, one branch forked at v3 with tip 0.
    */
  def metaTablesSql(): String =
    """SELECT 'branch_wip' AS item, CAST(0 AS BIGINT) AS a,
      |  CAST(3 AS BIGINT) AS b
      |UNION ALL
      |SELECT 'files_total', CAST(2 AS BIGINT), (SELECT COUNT(*) FROM orders)
      |UNION ALL
      |SELECT 'tag_pinned', CAST(3 AS BIGINT), CAST(0 AS BIGINT)
      |UNION ALL
      |SELECT 'v1', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      |UNION ALL
      |SELECT 'v2', CAST(1 AS BIGINT),
      |  (SELECT COUNT(*) FROM orders WHERE o_orderkey % 2 = 0)
      |UNION ALL
      |SELECT 'v3', CAST(2 AS BIGINT), (SELECT COUNT(*) FROM orders)
      |ORDER BY item""".stripMargin

  /** Driver-contract query for BRANCHES + WRITE-AUDIT-PUBLISH (r12
    * verdict ask #4): the even keys land on main; a branch forks; the
    * odd keys are STAGED onto the branch (`branch=audit` write option
    * — commits advance the branch ref through its own CAS, never
    * `manifest.txt`); the branch read audits the full staged state;
    * `fast_forward` publishes the tip as ONE atomic main commit. The
    * result reads all three views side by side — main as of
    * pre-publish (via VERSION AS OF: proves staging never touched
    * main), the branch tip, and published main. A staged row leaking
    * to main early, a lost branch commit, or a non-atomic publish all
    * break the closed form.
    */
  def branchWapQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_wap_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.wap")
    spark.sql("CREATE TABLE graft.db.wap (k BIGINT, m BIGINT)")
    spark.sql("""INSERT INTO graft.db.wap
      |SELECT o_orderkey, o_orderkey % 97 FROM graft_wap_orders_src
      |WHERE o_orderkey % 2 = 0""".stripMargin)
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val dirPath = java.nio.file.Paths.get(wh, "db", "wap").toString
    // bounded: procedure result, one row
    spark.sql("CALL graft.system.branch(" +
      "ns => 'db', tbl => 'wap', name => 'audit')").collect()
    // stage the odd keys ONTO THE BRANCH — invisible to main
    spark.sql("""SELECT o_orderkey AS k, o_orderkey % 97 AS m
      |FROM graft_wap_orders_src
      |WHERE o_orderkey % 2 = 1""".stripMargin)
      .write.format("graft.sources.ManifestV2")
      .option("path", dirPath).option("branch", "audit")
      .mode("append").save()
    // pre-publish phase pinned by VERSION, not wall-clock: the
    // version chain is the snapshot's durable identity (`dsv2_time_
    // travel` proves version pins), so the read below cannot flake
    // under clock coarsening the way a millisecond TIMESTAMP AS OF
    // could
    val vBefore = ManifestV2.readManifest(
      java.nio.file.Paths.get(dirPath)).get.version
    // bounded: procedure result, one row
    spark.sql("CALL graft.system.fast_forward(" +
      "ns => 'db', tbl => 'wap', name => 'audit')").collect()
    spark.read.format("graft.sources.ManifestV2")
      .option("path", dirPath).option("branch", "audit").load()
      .createOrReplaceTempView("graft_wap_branch_tip")
    val agg = "COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum"
    spark.sql(s"""SELECT 'branch_tip' AS phase, $agg
      |FROM graft_wap_branch_tip
      |UNION ALL
      |SELECT 'main_before' AS phase, $agg
      |FROM graft.db.wap VERSION AS OF $vBefore
      |UNION ALL
      |SELECT 'published' AS phase, $agg FROM graft.db.wap
      |ORDER BY phase""".stripMargin)
  }

  /** [[branchWapQuery]] oracle: pre-publish main = the even keys; the
    * branch tip and published main = everything.
    */
  def branchWapSql(): String =
    """SELECT 'branch_tip' AS phase, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum FROM orders
      |UNION ALL
      |SELECT 'main_before' AS phase, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum FROM orders
      |WHERE o_orderkey % 2 = 0
      |UNION ALL
      |SELECT 'published' AS phase, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum FROM orders
      |ORDER BY phase""".stripMargin

  /** Driver-contract query for ADD COLUMN ... DEFAULT (round 14 — the
    * Iceberg v3 initial-default shape): the default lands in the
    * manifest header with ZERO rewrite; pre-add files serve it from
    * the leaf (existence default), and an INSERT that OMITS the
    * column is filled from the same metadata by Spark's analyzer
    * (CURRENT_DEFAULT). The aggregate crosses both populations and
    * groups BY the defaulted column, so a null-filled pre-add row or
    * an unfilled insert breaks the closed form.
    */
  def addColumnDefaultQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_acd_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.acd")
    spark.sql("CREATE TABLE graft.db.acd (k BIGINT, amt BIGINT)")
    spark.sql("""INSERT INTO graft.db.acd
      |SELECT o_orderkey, o_orderkey * 2 FROM graft_acd_orders_src
      |WHERE o_orderkey % 2 = 0""".stripMargin)
    spark.sql("ALTER TABLE graft.db.acd " +
      "ADD COLUMN region STRING DEFAULT 'emea'")
    spark.sql("ALTER TABLE graft.db.acd " +
      "ADD COLUMN score BIGINT DEFAULT 7")
    // the odd keys INSERT names region but OMITS score — the analyzer
    // fills it from CURRENT_DEFAULT
    spark.sql("""INSERT INTO graft.db.acd (k, amt, region)
      |SELECT o_orderkey, o_orderkey * 2,
      |  CASE WHEN o_orderkey % 4 = 1 THEN 'amer' ELSE 'apac' END
      |FROM graft_acd_orders_src
      |WHERE o_orderkey % 2 = 1""".stripMargin)
    spark.sql("""SELECT region, COUNT(*) AS n,
      |  CAST(SUM(amt) AS BIGINT) AS amt_sum,
      |  CAST(SUM(score) AS BIGINT) AS score_sum
      |FROM graft.db.acd GROUP BY region ORDER BY region""".stripMargin)
  }

  /** [[addColumnDefaultQuery]] oracle: evens read the existence
    * default ('emea'), odds carry their inserted region; score is 7
    * everywhere (existence default on evens, analyzer fill on odds).
    */
  def addColumnDefaultSql(): String =
    """SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'emea'
      |  WHEN o_orderkey % 4 = 1 THEN 'amer' ELSE 'apac' END AS region,
      |  COUNT(*) AS n,
      |  CAST(SUM(o_orderkey * 2) AS BIGINT) AS amt_sum,
      |  CAST(SUM(7) AS BIGINT) AS score_sum
      |FROM orders GROUP BY 1 ORDER BY region""".stripMargin

  /** Driver-contract query for BRANCH TIME TRAVEL (round 14 — the
    * Iceberg ref-travel shape): `VERSION AS OF '<branch>@<k>'`
    * resolves against the branch's OWN chain — ordinal 0 is the
    * fork-base snapshot, each staged commit advances the ordinal —
    * while `'<branch>'` reads the tip and plain reads stay on main.
    * The query stages two commits and pins all four positions in one
    * closed form; a mis-resolved ordinal breaks its phase's hash.
    */
  def branchTravelQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_btv_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.btv")
    spark.sql("CREATE TABLE graft.db.btv (k BIGINT, amt BIGINT)")
    spark.sql("""INSERT INTO graft.db.btv
      |SELECT o_orderkey, o_orderkey * 2 FROM graft_btv_orders_src
      |WHERE o_orderkey % 2 = 0""".stripMargin)
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val dirPath = java.nio.file.Paths.get(wh, "db", "btv").toString
    // bounded: procedure result, one row
    spark.sql("CALL graft.system.branch(" +
      "ns => 'db', tbl => 'btv', name => 'stage')").collect()
    def stage(m: Int): Unit = spark.sql(
      s"""SELECT o_orderkey AS k, o_orderkey * 2 AS amt
        |FROM graft_btv_orders_src
        |WHERE o_orderkey % 4 = $m""".stripMargin)
      .write.format("graft.sources.ManifestV2")
      .option("path", dirPath).option("branch", "stage")
      .mode("append").save()
    stage(1) // branch ordinal 1
    stage(3) // branch ordinal 2 (tip)
    val agg = "COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum, " +
      "CAST(SUM(amt) AS BIGINT) AS amt_sum"
    spark.sql(s"""SELECT 'b0_fork' AS phase, $agg
      |FROM graft.db.btv VERSION AS OF 'stage@0'
      |UNION ALL
      |SELECT 'b1_mid' AS phase, $agg
      |FROM graft.db.btv VERSION AS OF 'stage@1'
      |UNION ALL
      |SELECT 'b2_tip' AS phase, $agg
      |FROM graft.db.btv VERSION AS OF 'stage'
      |UNION ALL
      |SELECT 'main' AS phase, $agg FROM graft.db.btv
      |ORDER BY phase""".stripMargin)
  }

  /** [[branchTravelQuery]] oracle: the fork base and main hold the
    * even keys; ordinal 1 adds the `%4 = 1` quarter; the tip holds
    * everything.
    */
  def branchTravelSql(): String = {
    def agg(pred: String) =
      s"""SELECT COUNT(*) AS n,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(o_orderkey * 2) AS BIGINT) AS amt_sum
        |FROM orders WHERE $pred""".stripMargin
    s"""SELECT 'b0_fork' AS phase, * FROM (${agg("o_orderkey % 2 = 0")})
      |UNION ALL
      |SELECT 'b1_mid' AS phase, * FROM (
      |  ${agg("o_orderkey % 2 = 0 OR o_orderkey % 4 = 1")})
      |UNION ALL
      |SELECT 'b2_tip' AS phase, * FROM (${agg("TRUE")})
      |UNION ALL
      |SELECT 'main' AS phase, * FROM (${agg("o_orderkey % 2 = 0")})
      |ORDER BY phase""".stripMargin
  }

  /** Driver-contract query for STREAMING WRITE-AUDIT-PUBLISH (round
    * 14 — composing round 13's streaming partitioned ingest with the
    * branch plane, the production CDC pattern branches exist for): a
    * stream lands TWO epochs through one checkpoint onto a BRANCH of
    * a hidden-partitioned table — the epoch replay ledger lives in
    * the branch state, main's pointer never moves — the branch read
    * audits the staged slice, and `fast_forward` publishes it as ONE
    * main commit. The closed form pins all three phases: the branch
    * tip (everything), main pre-publish (the seed only, via
    * TIMESTAMP AS OF), and main post-publish (everything).
    */
  def streamingWapQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_swp_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.swp")
    spark.sql("CREATE TABLE graft.db.swp " +
      "(uid BIGINT, ts TIMESTAMP, amt BIGINT) PARTITIONED BY (days(ts))")
    def slice(pred: String) = spark.sql(
      s"""SELECT o_orderkey % 40 AS uid,
        |  timestampadd(DAY, CAST(o_orderkey % 3 AS INT),
        |    TIMESTAMP '2024-03-01 00:00:00') AS ts,
        |  o_orderkey AS amt
        |FROM graft_swp_orders_src WHERE $pred""".stripMargin)
    slice("o_orderkey % 2 = 0") // seed main with the evens
      .writeTo("graft.db.swp").append()
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val dirPath = java.nio.file.Paths.get(wh, "db", "swp").toString
    // bounded: procedure result, one row
    spark.sql("CALL graft.system.branch(" +
      "ns => 'db', tbl => 'swp', name => 'ingest')").collect()
    // stream the odds ONTO THE BRANCH: two micro-batch epochs through
    // one checkpoint (the restart path included), staged invisibly
    val work = Sources.scratchTempDir("graft_swp")
    val src = work.resolve("src").toString
    val ck = work.resolve("ck").toString
    def push(m: Int): Unit = slice(s"o_orderkey % 4 = $m")
      .write.format("graft.sources.ManifestV2")
      .option("path", src).mode("append").save()
    def pump(): Unit = {
      val q = spark.readStream.format("graft.sources.ManifestV2")
        .option("path", src).load()
        .writeStream.option("checkpointLocation", ck)
        .option("branch", "ingest")
        .toTable("graft.db.swp")
      try q.processAllAvailable() finally q.stop()
    }
    push(1); pump() // epoch 0
    push(3); pump() // epoch 1
    // version pin, not wall-clock (see [[branchWapQuery]])
    val vBefore = ManifestV2.readManifest(
      java.nio.file.Paths.get(dirPath)).get.version
    // bounded: procedure result, one row
    spark.sql("CALL graft.system.fast_forward(" +
      "ns => 'db', tbl => 'swp', name => 'ingest')").collect()
    spark.read.format("graft.sources.ManifestV2")
      .option("path", dirPath).option("branch", "ingest").load()
      .createOrReplaceTempView("graft_swp_branch_tip")
    val agg = "COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS amt_sum, " +
      "CAST(SUM(CAST(unix_micros(ts) DIV 86400000000 AS BIGINT)) " +
      "AS BIGINT) AS day_sum"
    spark.sql(s"""SELECT 'branch_tip' AS phase, $agg
      |FROM graft_swp_branch_tip
      |UNION ALL
      |SELECT 'main_before' AS phase, $agg
      |FROM graft.db.swp VERSION AS OF $vBefore
      |UNION ALL
      |SELECT 'published' AS phase, $agg FROM graft.db.swp
      |ORDER BY phase""".stripMargin)
  }

  /** [[streamingWapQuery]] oracle: day index = 19783 + okey%3; the
    * pre-publish main holds the even keys, the branch tip and the
    * published main hold everything — a lost epoch, a replayed epoch,
    * or a leaked pre-publish row breaks a phase's closed form.
    */
  def streamingWapSql(): String =
    """SELECT 'branch_tip' AS phase, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS amt_sum,
      |  CAST(SUM(19783 + o_orderkey % 3) AS BIGINT) AS day_sum
      |FROM orders
      |UNION ALL
      |SELECT 'main_before' AS phase, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS amt_sum,
      |  CAST(SUM(19783 + o_orderkey % 3) AS BIGINT) AS day_sum
      |FROM orders WHERE o_orderkey % 2 = 0
      |UNION ALL
      |SELECT 'published' AS phase, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS amt_sum,
      |  CAST(SUM(19783 + o_orderkey % 3) AS BIGINT) AS day_sum
      |FROM orders
      |ORDER BY phase""".stripMargin

  /** Driver-contract query for SNAPSHOT ROLLBACK (round 15 — the
    * missing half of the time-travel story): seed, a BAD append,
    * `CALL graft.system.rollback(version => seed)`, then a fresh
    * append on the restored line. The rollback is ONE metadata-only
    * commit whose state is the seed snapshot's; the closed form pins
    * all four faces at once — the post-rollback content (seed ∪ fresh
    * only: a surviving bad row breaks it), the bad snapshot still
    * readable via `VERSION AS OF` (history preserved, not erased),
    * the change feed's reversal step (every bad row retracted as a
    * `delete` at the rollback version), and the history length (the
    * rollback ADDED a version — nothing was rewritten). At 100 TB
    * this is the incident-response primitive: un-publishing a bad
    * batch costs one manifest write, zero data I/O, and downstream
    * feed consumers see clean retractions instead of a broken chain.
    */
  def rollbackQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_rbk_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.rbk")
    spark.sql("CREATE TABLE graft.db.rbk (k BIGINT, m BIGINT)") // v1
    spark.sql("""INSERT INTO graft.db.rbk
      |SELECT o_orderkey, o_orderkey % 97 FROM graft_rbk_orders_src
      |WHERE o_orderkey % 2 = 0""".stripMargin) // v2: the good seed
    spark.sql("""INSERT INTO graft.db.rbk
      |SELECT o_orderkey, o_orderkey % 97 FROM graft_rbk_orders_src
      |WHERE o_orderkey % 2 = 1""".stripMargin) // v3: the bad batch
    // bounded: procedure result, one row
    spark.sql("CALL graft.system.rollback(" +
      "ns => 'db', tbl => 'rbk', version => 2)").collect() // v4
    spark.sql("""INSERT INTO graft.db.rbk
      |SELECT o_orderkey, o_orderkey % 97 FROM graft_rbk_orders_src
      |WHERE o_orderkey % 4 = 3""".stripMargin) // v5: fresh append
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val dirPath = java.nio.file.Paths.get(wh, "db", "rbk").toString
    // the reversal step as the feed serves it: (v3, v4] must retract
    // every bad row
    spark.read.format("graft.sources.ManifestV2")
      .option("path", dirPath).option("changefeed", "true")
      .option("startVersion", "3").option("endVersion", "4").load()
      .createOrReplaceTempView("graft_rbk_reversal")
    val agg = "COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum"
    spark.sql(s"""SELECT 'bad_still_readable' AS phase, $agg
      |FROM graft.db.rbk VERSION AS OF 3
      |UNION ALL
      |SELECT 'current' AS phase, $agg FROM graft.db.rbk
      |UNION ALL
      |SELECT 'feed_reversal' AS phase, $agg FROM graft_rbk_reversal
      |WHERE _change_type = 'delete'
      |UNION ALL
      |SELECT 'history' AS phase, COUNT(*) AS n,
      |  CAST(MAX(version) AS BIGINT) AS key_sum
      |FROM graft.db.rbk.history
      |ORDER BY phase""".stripMargin)
  }

  /** [[rollbackQuery]] oracle: the bad snapshot held everything, the
    * restored line holds seed ∪ fresh, the reversal retracts exactly
    * the odd keys, and history is 5 versions deep ending at v5.
    */
  def rollbackSql(): String =
    """SELECT 'bad_still_readable' AS phase, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum FROM orders
      |UNION ALL
      |SELECT 'current' AS phase, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum FROM orders
      |WHERE o_orderkey % 2 = 0 OR o_orderkey % 4 = 3
      |UNION ALL
      |SELECT 'feed_reversal' AS phase, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum FROM orders
      |WHERE o_orderkey % 2 = 1
      |UNION ALL
      |SELECT 'history' AS phase, CAST(5 AS BIGINT) AS n,
      |  CAST(5 AS BIGINT) AS key_sum
      |ORDER BY phase""".stripMargin

  /** Driver-contract query for BRANCH PUBLISH PAST DIVERGENCE (round
    * 15 — the wall every streaming-WAP deployment hits on day one):
    * main seeds, a branch forks and STAGES an audited slice, then
    * main advances INDEPENDENTLY — `fast_forward` now refuses
    * (histories diverged), and `CALL graft.system.cherry_pick`
    * publishes the safe subset instead: the branch's append-only
    * staged files replay onto the advanced main as one atomic commit
    * (file-set union; deletes/rewrites/DDL on the branch refuse — see
    * CherryPickSpec). Three faces pinned: the diverged main before
    * publish (VERSION AS OF — staging never leaked, main's own append
    * is there), the branch tip (fork state + staged slice, WITHOUT
    * main's divergent append), and the published union.
    */
  def branchRebaseQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_rbs_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.rbs")
    spark.sql("CREATE TABLE graft.db.rbs (k BIGINT, m BIGINT)") // v1
    spark.sql("""INSERT INTO graft.db.rbs
      |SELECT o_orderkey, o_orderkey % 97 FROM graft_rbs_orders_src
      |WHERE o_orderkey % 2 = 0""".stripMargin) // v2: the seed
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val dirPath = java.nio.file.Paths.get(wh, "db", "rbs").toString
    // bounded: procedure result, one row
    spark.sql("CALL graft.system.branch(" +
      "ns => 'db', tbl => 'rbs', name => 'stage')").collect() // fork @ v2
    spark.sql("""SELECT o_orderkey AS k, o_orderkey % 97 AS m
      |FROM graft_rbs_orders_src
      |WHERE o_orderkey % 4 = 1""".stripMargin)
      .write.format("graft.sources.ManifestV2")
      .option("path", dirPath).option("branch", "stage")
      .mode("append").save() // staged, invisible to main
    spark.sql("""INSERT INTO graft.db.rbs
      |SELECT o_orderkey, o_orderkey % 97 FROM graft_rbs_orders_src
      |WHERE o_orderkey % 4 = 3""".stripMargin) // v3: main DIVERGES
    val vBefore = ManifestV2.readManifest(
      java.nio.file.Paths.get(dirPath)).get.version
    // bounded: procedure result, one row
    spark.sql("CALL graft.system.cherry_pick(" +
      "ns => 'db', tbl => 'rbs', name => 'stage')").collect() // v4
    spark.read.format("graft.sources.ManifestV2")
      .option("path", dirPath).option("branch", "stage").load()
      .createOrReplaceTempView("graft_rbs_branch_tip")
    val agg = "COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum"
    spark.sql(s"""SELECT 'branch_tip' AS phase, $agg
      |FROM graft_rbs_branch_tip
      |UNION ALL
      |SELECT 'main_diverged' AS phase, $agg
      |FROM graft.db.rbs VERSION AS OF $vBefore
      |UNION ALL
      |SELECT 'published' AS phase, $agg FROM graft.db.rbs
      |ORDER BY phase""".stripMargin)
  }

  /** [[branchRebaseQuery]] oracle: the branch tip = seed ∪ staged
    * (k%4=1), diverged main = seed ∪ its own append (k%4=3), the
    * published union = everything.
    */
  def branchRebaseSql(): String =
    """SELECT 'branch_tip' AS phase, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum FROM orders
      |WHERE o_orderkey % 2 = 0 OR o_orderkey % 4 = 1
      |UNION ALL
      |SELECT 'main_diverged' AS phase, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum FROM orders
      |WHERE o_orderkey % 2 = 0 OR o_orderkey % 4 = 3
      |UNION ALL
      |SELECT 'published' AS phase, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum FROM orders
      |ORDER BY phase""".stripMargin

  /** Driver-contract query for ZERO-COPY CLONE (round 15): seed a
    * table, `CALL graft.system.clone` it, then DIVERGE both sides —
    * the clone ingests its own slice, the ORIGINAL deletes a band —
    * and read original, clone, and the clone's pre-divergence
    * snapshot side by side. A copied-on-clone row set, a mutation
    * leaking across the hard links (the sidecar lands on the
    * original's manifest only — the shared inode is untouched), or a
    * clone that silently re-used the source's manifest chain all
    * break a phase's closed form. At 100 TB this is the
    * dev/staging-fork primitive: a full-table experiment costs zero
    * data bytes and either side's retention can run without
    * coordination (hard links make reclamation unlink-safe).
    */
  def cloneQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_cln_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.cln")
    spark.sql("DROP TABLE IF EXISTS graft.db.cln2")
    spark.sql("CREATE TABLE graft.db.cln (k BIGINT, m BIGINT)") // v1
    spark.sql("""INSERT INTO graft.db.cln
      |SELECT o_orderkey, o_orderkey % 97 FROM graft_cln_orders_src
      |WHERE o_orderkey % 2 = 0""".stripMargin) // v2: the seed
    // bounded: procedure result, one row
    spark.sql("CALL graft.system.clone(ns => 'db', tbl => 'cln', " +
      "dst_ns => 'db', dst_tbl => 'cln2')").collect()
    // diverge: the clone ingests the odds; the original deletes a band
    spark.sql("""INSERT INTO graft.db.cln2
      |SELECT o_orderkey, o_orderkey % 97 FROM graft_cln_orders_src
      |WHERE o_orderkey % 2 = 1""".stripMargin)
    spark.sql("DELETE FROM graft.db.cln WHERE m < 20")
    val agg = "COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum"
    spark.sql(s"""SELECT 'clone' AS side, $agg FROM graft.db.cln2
      |UNION ALL
      |SELECT 'clone_at_fork' AS side, $agg
      |FROM graft.db.cln2 VERSION AS OF 1
      |UNION ALL
      |SELECT 'original' AS side, $agg FROM graft.db.cln
      |ORDER BY side""".stripMargin)
  }

  /** [[cloneQuery]] oracle: the clone = everything, its v1 = the seed
    * (evens), the original = evens minus the deleted band.
    */
  def cloneSql(): String =
    """SELECT 'clone' AS side, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum FROM orders
      |UNION ALL
      |SELECT 'clone_at_fork' AS side, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum FROM orders
      |WHERE o_orderkey % 2 = 0
      |UNION ALL
      |SELECT 'original' AS side, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum FROM orders
      |WHERE o_orderkey % 2 = 0 AND o_orderkey % 97 >= 20
      |ORDER BY side""".stripMargin

  /** Driver-contract query for TBLPROPERTIES (round 15): properties
    * are VERSIONED DEFINITION STATE in the manifest header — CREATE
    * carries them, ALTER SET/UNSET commit snapshots, and rollback
    * restores the era's own set alongside the data. The query drives
    * the full lifecycle and reads the final SHOW TBLPROPERTIES — a
    * property leaking across a rollback, a lost UNSET, or a default
    * engine key polluting the stored set all break the closed form.
    */
  def tblPropertiesQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.tpr")
    spark.sql("""CREATE TABLE graft.db.tpr (k BIGINT)
      |TBLPROPERTIES ('team' = 'data-eng', 'tier' = 'bronze')"""
      .stripMargin) // v1
    spark.sql("INSERT INTO graft.db.tpr VALUES (1), (2)") // v2
    spark.sql("ALTER TABLE graft.db.tpr SET TBLPROPERTIES " +
      "('tier' = 'gold', 'ttl' = '30d')") // v3
    spark.sql("ALTER TABLE graft.db.tpr UNSET TBLPROPERTIES ('team')") // v4
    // the rollback restores v2's property era WITH its data
    // bounded: procedure result, one row
    spark.sql("CALL graft.system.rollback(" +
      "ns => 'db', tbl => 'tpr', version => 2)").collect() // v5
    spark.sql("ALTER TABLE graft.db.tpr SET TBLPROPERTIES " +
      "('audited' = 'true')") // v6
    spark.sql("SHOW TBLPROPERTIES graft.db.tpr")
      .select("key", "value").orderBy("key")
  }

  /** [[tblPropertiesQuery]] oracle: the rollback revived `team` and
    * bronze `tier`, erased `ttl`, and the post-rollback SET added
    * `audited` — a pure-constants closed form.
    */
  def tblPropertiesSql(): String =
    """SELECT 'audited' AS key, 'true' AS value
      |UNION ALL SELECT 'team', 'data-eng'
      |UNION ALL SELECT 'tier', 'bronze'
      |ORDER BY key""".stripMargin

  /** Driver-contract query for the `refs` METADATA VIEW (round 15):
    * every named pointer — tags and branches — in one SELECT-able
    * table, the first thing an operator lists before a travel or a
    * publish. The closed form pins tag pins, branch fork bases, and
    * tip ordinals after a staged commit.
    */
  def refsViewQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.rfs")
    spark.sql("CREATE TABLE graft.db.rfs (k BIGINT)") // v1
    spark.sql("INSERT INTO graft.db.rfs VALUES (1)") // v2
    // bounded: procedure result, one row
    spark.sql("CALL graft.system.tag(" +
      "ns => 'db', tbl => 'rfs', name => 'rel_a', version => 2)").collect()
    spark.sql("INSERT INTO graft.db.rfs VALUES (2)") // v3
    // bounded: procedure result, one row
    spark.sql("CALL graft.system.branch(" +
      "ns => 'db', tbl => 'rfs', name => 'wip')").collect() // fork @ v3
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val dirPath = java.nio.file.Paths.get(wh, "db", "rfs").toString
    spark.sql("SELECT CAST(3 AS BIGINT) AS k")
      .write.format("graft.sources.ManifestV2")
      .option("path", dirPath).option("branch", "wip")
      .mode("append").save() // tip ordinal 1
    spark.sql("""SELECT name, type, version, tip
      |FROM graft.db.rfs.refs ORDER BY name""".stripMargin)
  }

  /** [[refsViewQuery]] oracle: one tag pinned at v2, one branch
    * forked at v3 with one staged commit.
    */
  def refsViewSql(): String =
    """SELECT 'rel_a' AS name, 'tag' AS type, CAST(2 AS BIGINT) AS version,
      |  CAST(NULL AS BIGINT) AS tip
      |UNION ALL
      |SELECT 'wip', 'branch', CAST(3 AS BIGINT), CAST(1 AS BIGINT)
      |ORDER BY name""".stripMargin

  /** Driver-contract query for the `partitions` METADATA VIEW (round
    * 15 — the rollup every maintenance decision reads): a table lives
    * through TWO partition-spec eras (`truncate(2, uid)`, evolved to
    * `truncate(1, g)` — zero bytes rewritten), and `SELECT … FROM
    * t.partitions` renders one row per (era, tuple) with file/row
    * counts and the per-column min/max stats rollup. Each era's files
    * group under the spec that WROTE them (`@p` vs `@p1` reserved
    * keys), so a maintenance planner can see at a glance which
    * pre-evolution partitions still await background compaction. The
    * oracle restates every cell from raw orders: tuple rendering, the
    * one-file-per-tuple clustered write, and the sound stats bounds
    * must all be exact. (`total_bytes` is real but intentionally not
    * selected — parquet encoding sizes aren't DuckDB-reproducible;
    * MetaTablesSpec pins it against the filesystem instead.)
    */
  def partitionsMetaQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_pme_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.pme")
    spark.sql("""CREATE TABLE graft.db.pme (uid BIGINT, g BIGINT,
      |amt BIGINT) PARTITIONED BY (truncate(2, uid))""".stripMargin)
    spark.sql("""INSERT INTO graft.db.pme
      |SELECT o_orderkey % 4, o_orderkey % 3, o_orderkey
      |FROM graft_pme_orders_src
      |WHERE o_orderkey % 2 = 0""".stripMargin) // era 0: uid ∈ {0, 2}
    // bounded: procedure result, one row
    spark.sql("CALL graft.system.set_partitioning(" +
      "ns => 'db', tbl => 'pme', spec => 'truncate(1, g)')").collect()
    spark.sql("""INSERT INTO graft.db.pme
      |SELECT o_orderkey % 4, o_orderkey % 3, o_orderkey
      |FROM graft_pme_orders_src
      |WHERE o_orderkey % 2 = 1""".stripMargin) // era 1: g ∈ {0, 1, 2}
    spark.sql("""SELECT partition, spec_id, file_count, row_count,
      |  delete_file_count, stats
      |FROM graft.db.pme.partitions
      |ORDER BY spec_id, partition""".stripMargin)
  }

  /** [[partitionsMetaQuery]] oracle: five (era, tuple) rows restated
    * from raw orders — era-0 evens group by `truncate(2, uid)` with
    * `uid = k%4 ∈ {0,2}` (already even, so the tuple IS uid) under
    * `@p`, era-1 odds by `truncate(1, g) = g = k%3` under `@p1`; the
    * clustered insert writes exactly one file per tuple, and each
    * tuple's stats string is the sorted per-column min/max of its
    * rows.
    */
  def partitionsMetaSql(): String =
    """SELECT '@p=' || CAST(o_orderkey % 4 AS VARCHAR) AS partition,
      |  CAST(0 AS BIGINT) AS spec_id,
      |  CAST(1 AS BIGINT) AS file_count,
      |  COUNT(*) AS row_count,
      |  CAST(0 AS BIGINT) AS delete_file_count,
      |  'amt:' || CAST(MIN(o_orderkey) AS VARCHAR) || ':'
      |    || CAST(MAX(o_orderkey) AS VARCHAR)
      |    || ',g:' || CAST(MIN(o_orderkey % 3) AS VARCHAR) || ':'
      |    || CAST(MAX(o_orderkey % 3) AS VARCHAR)
      |    || ',uid:' || CAST(o_orderkey % 4 AS VARCHAR) || ':'
      |    || CAST(o_orderkey % 4 AS VARCHAR) AS stats
      |FROM orders WHERE o_orderkey % 2 = 0
      |GROUP BY o_orderkey % 4
      |UNION ALL
      |SELECT '@p1=' || CAST(o_orderkey % 3 AS VARCHAR) AS partition,
      |  CAST(1 AS BIGINT) AS spec_id,
      |  CAST(1 AS BIGINT) AS file_count,
      |  COUNT(*) AS row_count,
      |  CAST(0 AS BIGINT) AS delete_file_count,
      |  'amt:' || CAST(MIN(o_orderkey) AS VARCHAR) || ':'
      |    || CAST(MAX(o_orderkey) AS VARCHAR)
      |    || ',g:' || CAST(o_orderkey % 3 AS VARCHAR) || ':'
      |    || CAST(o_orderkey % 3 AS VARCHAR)
      |    || ',uid:' || CAST(MIN(o_orderkey % 4) AS VARCHAR) || ':'
      |    || CAST(MAX(o_orderkey % 4) AS VARCHAR) AS stats
      |FROM orders WHERE o_orderkey % 2 = 1
      |GROUP BY o_orderkey % 3
      |ORDER BY spec_id, partition""".stripMargin

  /** Driver-contract query for the MULTI-TRANSFORM spec — the
    * canonical event-table layout `PARTITIONED BY (days(ts),
    * bucket(8, uid))`: ingest clusters each UTC day into 8 user
    * buckets (one file per live (day, bucket) tuple per task, each
    * pure on BOTH components via its `@p.0`/`@p.1` point boxes), and
    * the dashboard query's time-range × user predicate prunes to the
    * INTERSECTION — the day's files in the user's bucket — off pure
    * metadata. The oracle restates it from raw events: layout,
    * two-component transposition, and the micros round-trip must all
    * be invisible.
    */
  def multiPartitionQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.events(spark, dir)
      .createOrReplaceTempView("graft_mp_events_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.mpe")
    spark.sql("""CREATE TABLE graft.db.mpe
      |(eid BIGINT, ts TIMESTAMP, uid BIGINT, etype STRING)
      |PARTITIONED BY (days(ts), bucket(8, uid))""".stripMargin)
    spark.sql("""INSERT INTO graft.db.mpe
      |SELECT event_id, timestamp_micros(ts DIV 1000), user_id, event_type
      |FROM graft_mp_events_src""".stripMargin)
    spark.sql("""SELECT etype, COUNT(*) AS n,
      |  CAST(SUM(eid) AS BIGINT) AS eid_sum,
      |  (SELECT COUNT(*) FROM graft.db.mpe
      |     WHERE uid = 11
      |       AND ts >= TIMESTAMP '2024-01-12 00:00:00'
      |       AND ts < TIMESTAMP '2024-01-15 00:00:00') AS probe_n
      |FROM graft.db.mpe
      |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-20 00:00:00'
      |GROUP BY etype ORDER BY etype""".stripMargin)
  }

  /** [[multiPartitionQuery]] oracle. */
  def multiPartitionSql(): String =
    """SELECT event_type AS etype, COUNT(*) AS n,
      |  CAST(SUM(event_id) AS BIGINT) AS eid_sum,
      |  (SELECT COUNT(*) FROM events
      |     WHERE user_id = 11
      |       AND ts >= TIMESTAMP '2024-01-12 00:00:00'
      |       AND ts < TIMESTAMP '2024-01-15 00:00:00') AS probe_n
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-20 00:00:00'
      |GROUP BY 1 ORDER BY etype""".stripMargin

  /** Driver-contract query for PARTITION EVOLUTION: half of orders
    * lands under `bucket(4, ck)`, the spec evolves to `bucket(16, ck)`
    * in one metadata commit (`CALL graft.system.set_partitioning` —
    * zero bytes rewritten, HiddenPartitionSpec pins file identity),
    * the other half lands under the new spec, and the read back spans
    * BOTH eras: each era's files prune under the spec that wrote them
    * (era-0 via bucket4 on `@p`, era-1 via bucket16 on `@p1`). The
    * point probe subquery exercises exactly that two-era
    * transposition; the full aggregate pins that no row was lost or
    * doubled across the evolution. The 100 TB story: "we outgrew 8
    * buckets" is a statement plus background compaction, not a
    * table rewrite.
    */
  def partitionEvolutionQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_pe_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.pev")
    spark.sql("""CREATE TABLE graft.db.pev (ck BIGINT, okey BIGINT)
      |PARTITIONED BY (bucket(4, ck))""".stripMargin)
    spark.sql("""INSERT INTO graft.db.pev
      |SELECT o_custkey, o_orderkey FROM graft_pe_orders_src
      |WHERE o_orderkey % 2 = 0""".stripMargin)
    // bounded: a procedure result is one accounting row
    spark.sql("CALL graft.system.set_partitioning(" +
      "ns => 'db', tbl => 'pev', spec => 'bucket(16, ck)')").collect()
    spark.sql("""INSERT INTO graft.db.pev
      |SELECT o_custkey, o_orderkey FROM graft_pe_orders_src
      |WHERE o_orderkey % 2 = 1""".stripMargin)
    spark.sql("""SELECT ck % 11 AS band, COUNT(*) AS n,
      |  CAST(SUM(okey) AS BIGINT) AS key_sum,
      |  (SELECT CAST(SUM(okey) AS BIGINT) FROM graft.db.pev
      |     WHERE ck = 19) AS probe_sum
      |FROM graft.db.pev GROUP BY ck % 11 ORDER BY band""".stripMargin)
  }

  /** [[partitionEvolutionQuery]] oracle: the evolution must be
    * invisible — plain orders restates it.
    */
  def partitionEvolutionSql(): String =
    """SELECT o_custkey % 11 AS band, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
      |  (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM orders
      |     WHERE o_custkey = 19) AS probe_sum
      |FROM orders GROUP BY 1 ORDER BY band""".stripMargin

  /** Driver-contract query for DAY-TRANSFORM partitioning: events land
    * in a `PARTITIONED BY (days(ts))` table with their real TIMESTAMP,
    * one file per UTC day; the read's time-range predicate transposes
    * (`ts >= T` ⇒ `@p >= days(T)`) and plans only the covered days'
    * files. The oracle is the same range aggregate off raw events —
    * day boundaries, the micros round-trip, and the pruning must all
    * be invisible. At 100 TB this is the canonical event-table layout:
    * ingest clusters by day, and every dashboard query carries a time
    * range that prunes to its days.
    */
  def daysPartitionQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.events(spark, dir)
      .createOrReplaceTempView("graft_dp_events_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.dpe")
    spark.sql("""CREATE TABLE graft.db.dpe
      |(eid BIGINT, ts TIMESTAMP, uid BIGINT, etype STRING)
      |PARTITIONED BY (days(ts))""".stripMargin)
    // ts arrives as LONG NANOS (the corpus is TIMESTAMP(NANOS));
    // nanos are micros*1000, so the re-typing is exact
    spark.sql("""INSERT INTO graft.db.dpe
      |SELECT event_id, timestamp_micros(ts DIV 1000), user_id, event_type
      |FROM graft_dp_events_src""".stripMargin)
    spark.sql("""SELECT etype, COUNT(*) AS n,
      |  CAST(SUM(uid) AS BIGINT) AS uid_sum,
      |  unix_micros(MIN(ts)) AS min_ts_us,
      |  unix_micros(MAX(ts)) AS max_ts_us
      |FROM graft.db.dpe
      |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-11 00:00:00'
      |GROUP BY etype ORDER BY etype""".stripMargin)
  }

  /** Driver-contract query for OVERWRITE-BY-FILTER: a days(ts) events
    * table gets two days REPLACED by a corrected re-ingest
    * (`writeTo(t).overwrite(cond)` — delete-matching + append, one
    * atomic swap, delete half metadata-only because the day condition
    * is aligned to the hidden day layout). The final aggregate hashes
    * against the oracle's reconstruction (rows outside the window ∪
    * corrected rows inside), so a row leaked from the replaced days, a
    * lost untouched file, or a double-applied append all mismatch.
    * This is the backfill primitive at 100 TB: replacing two days
    * costs two days' I/O and one manifest swap.
    */
  def overwriteWhereQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    install(spark)
    graft.Tables.events(spark, dir)
      .createOrReplaceTempView("graft_ow_events_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.owe")
    spark.sql("""CREATE TABLE graft.db.owe
      |(eid BIGINT, ts TIMESTAMP, uid BIGINT, etype STRING)
      |PARTITIONED BY (days(ts))""".stripMargin)
    spark.sql("""INSERT INTO graft.db.owe
      |SELECT event_id, timestamp_micros(ts DIV 1000), user_id, event_type
      |FROM graft_ow_events_src""".stripMargin)
    // the corrected re-ingest of [01-08, 01-10): uid shifted +5000000
    val lo = lit("2024-01-08 00:00:00").cast("timestamp")
    val hi = lit("2024-01-10 00:00:00").cast("timestamp")
    spark.sql("""SELECT event_id AS eid,
      |  timestamp_micros(ts DIV 1000) AS ts,
      |  user_id + 5000000 AS uid, event_type AS etype
      |FROM graft_ow_events_src""".stripMargin)
      .where(col("ts") >= lo && col("ts") < hi)
      .writeTo("graft.db.owe")
      .overwrite(col("ts") >= lo && col("ts") < hi)
    spark.sql("""SELECT etype, COUNT(*) AS n,
      |  CAST(SUM(uid) AS BIGINT) AS uid_sum,
      |  CAST(SUM(eid) AS BIGINT) AS eid_sum
      |FROM graft.db.owe GROUP BY etype ORDER BY etype""".stripMargin)
  }

  /** [[overwriteWhereQuery]] oracle: outside-window rows ∪ corrected
    * inside-window rows.
    */
  def overwriteWhereSql(): String =
    """WITH final AS (
      |  SELECT event_id, user_id, event_type FROM events
      |  WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
      |     OR ts >= TIMESTAMP '2024-01-10 00:00:00'
      |  UNION ALL
      |  SELECT event_id, user_id + 5000000, event_type FROM events
      |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      |    AND ts < TIMESTAMP '2024-01-10 00:00:00'
      |)
      |SELECT event_type AS etype, COUNT(*) AS n,
      |  CAST(SUM(user_id) AS BIGINT) AS uid_sum,
      |  CAST(SUM(event_id) AS BIGINT) AS eid_sum
      |FROM final GROUP BY 1 ORDER BY etype""".stripMargin

  /** Driver-contract query for DYNAMIC PARTITION OVERWRITE: the
    * incoming frame carries ONLY day 2024-01-05 (uid doubled), and
    * `overwritePartitions()` swaps exactly that day's files — every
    * other day survives by name (OverwriteSpec pins the file
    * identity; this hash pins the semantics). The Iceberg/Hive
    * dynamic-overwrite re-ingest shape with a HIDDEN day partition:
    * the user never names the partition, the data does.
    */
  def dynamicOverwriteQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    install(spark)
    graft.Tables.events(spark, dir)
      .createOrReplaceTempView("graft_dow_events_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.dow")
    spark.sql("""CREATE TABLE graft.db.dow
      |(eid BIGINT, ts TIMESTAMP, uid BIGINT, etype STRING)
      |PARTITIONED BY (days(ts))""".stripMargin)
    spark.sql("""INSERT INTO graft.db.dow
      |SELECT event_id, timestamp_micros(ts DIV 1000), user_id, event_type
      |FROM graft_dow_events_src""".stripMargin)
    spark.sql("""SELECT event_id AS eid,
      |  timestamp_micros(ts DIV 1000) AS ts,
      |  user_id * 2 AS uid, event_type AS etype
      |FROM graft_dow_events_src""".stripMargin)
      .where(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-06 00:00:00").cast("timestamp"))
      .writeTo("graft.db.dow").overwritePartitions()
    spark.sql("""SELECT etype, COUNT(*) AS n,
      |  CAST(SUM(uid) AS BIGINT) AS uid_sum
      |FROM graft.db.dow GROUP BY etype ORDER BY etype""".stripMargin)
  }

  /** [[dynamicOverwriteQuery]] oracle. */
  def dynamicOverwriteSql(): String =
    """WITH final AS (
      |  SELECT user_id, event_type FROM events
      |  WHERE ts < TIMESTAMP '2024-01-05 00:00:00'
      |     OR ts >= TIMESTAMP '2024-01-06 00:00:00'
      |  UNION ALL
      |  SELECT user_id * 2, event_type FROM events
      |  WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      |    AND ts < TIMESTAMP '2024-01-06 00:00:00'
      |)
      |SELECT event_type AS etype, COUNT(*) AS n,
      |  CAST(SUM(user_id) AS BIGINT) AS uid_sum
      |FROM final GROUP BY 1 ORDER BY etype""".stripMargin

  /** [[daysPartitionQuery]] oracle: the range aggregate off raw
    * events.
    */
  def daysPartitionSql(): String =
    """SELECT event_type AS etype, COUNT(*) AS n,
      |  CAST(SUM(user_id) AS BIGINT) AS uid_sum,
      |  CAST(epoch_us(MIN(ts)) AS BIGINT) AS min_ts_us,
      |  CAST(epoch_us(MAX(ts)) AS BIGINT) AS max_ts_us
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-11 00:00:00'
      |GROUP BY 1 ORDER BY etype""".stripMargin

  /** Driver-contract query for `CALL graft.system.compact`: the table
    * is fragmented by four quartile INSERTs, the procedure merges every
    * fragment in one atomic swap, and the read-back carries BOTH the
    * data aggregate and the procedure's accounting columns — so the
    * hash pins that compaction rewrote every row (rows_rewritten =
    * COUNT(orders)), produced exactly one file (files_out = 1 under a
    * huge max_rows), and lost or duplicated nothing (the m-grouped
    * closed form).
    */
  def compactTableQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_cmp_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.okc")
    spark.sql("CREATE TABLE graft.db.okc (okey BIGINT, m BIGINT)")
    for (q <- 0 until 4)
      spark.sql(s"""INSERT INTO graft.db.okc
        |SELECT o_orderkey, o_orderkey % 97 FROM graft_cmp_orders_src
        |WHERE o_orderkey % 97 >= ${q * 25}
        |  AND o_orderkey % 97 < ${(q + 1) * 25}""".stripMargin)
    spark.sql("""CALL graft.system.compact(ns => 'db', tbl => 'okc',
      |  max_rows => CAST(100000000 AS BIGINT))""".stripMargin)
      .select("files_out", "rows_rewritten")
      .createOrReplaceTempView("graft_cmp_acct")
    spark.sql("""SELECT m, COUNT(*) AS n,
      |  CAST(SUM(okey) AS BIGINT) AS key_sum,
      |  files_out, rows_rewritten
      |FROM graft.db.okc CROSS JOIN graft_cmp_acct
      |GROUP BY m, files_out, rows_rewritten ORDER BY m""".stripMargin)
  }

  /** [[compactTableQuery]] oracle: the whole table's closed form with
    * the deterministic accounting constants.
    */
  def compactTableSql(): String =
    """SELECT o_orderkey % 97 AS m, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
      |  CAST(1 AS BIGINT) AS files_out,
      |  (SELECT COUNT(*) FROM orders) AS rows_rewritten
      |FROM orders GROUP BY 1 ORDER BY m""".stripMargin

  /** Driver-contract query for ADDITIVE SCHEMA EVOLUTION: half the
    * orders land under the one-column schema, `ALTER TABLE … ADD
    * COLUMN m` grows the manifest schema without touching a data file,
    * and the other half lands two-columned. The read-back groups by
    * COALESCE(m, -1), so the hash pins BOTH populations: pre-evolution
    * rows must null-fill (bucket -1) and post-evolution rows must
    * carry their real m — a reader off-by-one on the positional cells,
    * or an evolution that rewrote/dropped anything, mismatches.
    */
  def addColumnQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_evo_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.evo")
    spark.sql("CREATE TABLE graft.db.evo (okey BIGINT)")
    spark.sql("""INSERT INTO graft.db.evo
      |SELECT o_orderkey FROM graft_evo_orders_src
      |WHERE o_orderkey % 2 = 0""".stripMargin)
    spark.sql("ALTER TABLE graft.db.evo ADD COLUMN m BIGINT")
    spark.sql("""INSERT INTO graft.db.evo
      |SELECT o_orderkey, o_orderkey % 97 FROM graft_evo_orders_src
      |WHERE o_orderkey % 2 <> 0""".stripMargin)
    spark.sql("""SELECT COALESCE(m, -1) AS m, COUNT(*) AS n,
      |  CAST(SUM(okey) AS BIGINT) AS key_sum
      |FROM graft.db.evo GROUP BY 1 ORDER BY m""".stripMargin)
  }

  /** [[addColumnQuery]] oracle: both populations stated off `orders`. */
  def addColumnSql(): String =
    """SELECT CASE WHEN o_orderkey % 2 = 0 THEN -1
      |    ELSE o_orderkey % 97 END AS m,
      |  COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      |FROM orders GROUP BY 1 ORDER BY m""".stripMargin

  /** Driver-contract query for ATOMIC REPLACE TABLE AS SELECT
    * (StagingTableCatalog): the even half of orders lands as v2, then
    * one RTAS statement atomically replaces the whole table with the
    * odd half — readers see the complete old table or the complete new
    * one, never a mix, and the replaced snapshot stays in the version
    * lineage. The read-back unions the live table with `VERSION AS OF
    * 2`, so the hash pins both sides of the swap (a leak in either
    * direction, or an RTAS that dropped lineage, mismatches).
    */
  def replaceTableQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_rt_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.rt")
    spark.sql("CREATE TABLE graft.db.rt (okey BIGINT, m BIGINT)") // v1
    spark.sql("""INSERT INTO graft.db.rt
      |SELECT o_orderkey, o_orderkey % 97 FROM graft_rt_orders_src
      |WHERE o_orderkey % 2 = 0""".stripMargin) // v2
    spark.sql("""REPLACE TABLE graft.db.rt AS
      |SELECT o_orderkey AS okey, o_orderkey % 97 AS m
      |FROM graft_rt_orders_src
      |WHERE o_orderkey % 2 <> 0""".stripMargin) // v3, one atomic swap
    spark.sql("""SELECT 'current' AS snap, COUNT(*) AS n,
      |  CAST(SUM(okey) AS BIGINT) AS key_sum
      |FROM graft.db.rt
      |UNION ALL
      |SELECT 'v2' AS snap, COUNT(*) AS n,
      |  CAST(SUM(okey) AS BIGINT) AS key_sum
      |FROM graft.db.rt VERSION AS OF 2
      |ORDER BY snap""".stripMargin)
  }

  /** [[replaceTableQuery]] oracle: both halves off `orders`. */
  def replaceTableSql(): String =
    """SELECT 'current' AS snap, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      |FROM orders WHERE o_orderkey % 2 <> 0
      |UNION ALL
      |SELECT 'v2' AS snap, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      |FROM orders WHERE o_orderkey % 2 = 0
      |ORDER BY snap""".stripMargin

  /** Driver-contract query for ENFORCED CHECK CONSTRAINTS: the table
    * is loaded under `CHECK (okey >= 0 AND m BETWEEN 0 AND 96)` — every
    * INSERT plan carries the predicate (ResolveTableConstraints), so
    * the statements succeeding proves validation and write-boundary
    * enforcement accepted exactly the valid corpus, and the read-back
    * hash proves enforcement altered nothing. The rejection half (a
    * violating write fails before any row lands) is pinned by
    * CatalogSpec.
    */
  def checkConstraintQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_ck_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.okck")
    spark.sql("CREATE TABLE graft.db.okck (okey BIGINT, m BIGINT)")
    spark.sql("""ALTER TABLE graft.db.okck ADD CONSTRAINT ok_range
      |CHECK (okey >= 0 AND m BETWEEN 0 AND 96)""".stripMargin)
    spark.sql("""INSERT INTO graft.db.okck
      |SELECT o_orderkey, o_orderkey % 97 FROM graft_ck_orders_src"""
      .stripMargin)
    spark.sql("""SELECT m, COUNT(*) AS n,
      |  CAST(SUM(okey) AS BIGINT) AS key_sum
      |FROM graft.db.okck GROUP BY m ORDER BY m""".stripMargin)
  }

  /** [[checkConstraintQuery]] oracle: the constrained load's closed
    * form.
    */
  def checkConstraintSql(): String =
    """SELECT o_orderkey % 97 AS m, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      |FROM orders GROUP BY 1 ORDER BY m""".stripMargin

  /** Driver-contract query for `CALL graft.system.cluster_by`: the
    * corpus lands in one unsorted insert, the procedure range-clusters
    * it on m into 4 files via a distributed rewrite + atomic swap, and
    * the read-back carries the data aggregate plus the deterministic
    * accounting columns (files_out = n_files, rows_clustered =
    * COUNT(orders)) — so the hash pins that clustering moved every row
    * exactly once and lost nothing. The layout payoff (disjoint stats
    * boxes → metadata-only range deletes, pruned range scans) is
    * pinned by CatalogSpec.
    */
  def clusterByQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_cl_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.okcl")
    spark.sql("CREATE TABLE graft.db.okcl (okey BIGINT, m BIGINT)")
    spark.sql("""INSERT INTO graft.db.okcl
      |SELECT o_orderkey, o_orderkey % 97
      |FROM graft_cl_orders_src""".stripMargin)
    spark.sql("""CALL graft.system.cluster_by(
      |ns => 'db', tbl => 'okcl', col => 'm', n_files => 4)""".stripMargin)
      .select("files_out", "rows_clustered")
      .createOrReplaceTempView("graft_cl_acct")
    spark.sql("""SELECT m, COUNT(*) AS n,
      |  CAST(SUM(okey) AS BIGINT) AS key_sum,
      |  files_out, rows_clustered
      |FROM graft.db.okcl CROSS JOIN graft_cl_acct
      |GROUP BY m, files_out, rows_clustered ORDER BY m""".stripMargin)
  }

  /** [[clusterByQuery]] oracle: the clustered table's closed form with
    * the deterministic accounting constants.
    */
  def clusterBySql(): String =
    """SELECT o_orderkey % 97 AS m, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
      |  CAST(4 AS BIGINT) AS files_out,
      |  (SELECT COUNT(*) FROM orders) AS rows_clustered
      |FROM orders GROUP BY 1 ORDER BY m""".stripMargin

  /** Driver-contract query for `CALL graft.system.expire_snapshots`
    * (the Iceberg retention pass) AND the segmented-manifest read path
    * end to end: the overwrite lands through REPARTITION(20), so the
    * table crosses [[ManifestV2.InlineCap]] and its manifest holds
    * `@seg` references instead of inline file lines — the final
    * aggregate is served THROUGH the manifest-list layout. Versions:
    * v1 CREATE, v2 backfill (m < 50), v3 OVERWRITE (m >= 50, 20
    * files), v4 append (m < 25). Expiry with keep = 2 drops v1 + v2
    * and reclaims the overwritten backfill's files; the read-back
    * carries the deterministic accounting (expired_versions = 2) and
    * the survivors' closed form — an expiry that touched a LIVE file,
    * or retention bookkeeping off by one, mismatches the hash. (That
    * expired versions become unreadable and live time travel survives
    * is pinned by CatalogSpec.)
    */
  def expireSnapshotsQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_exp_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.exp")
    spark.sql("CREATE TABLE graft.db.exp (okey BIGINT, m BIGINT)") // v1
    spark.sql("""INSERT INTO graft.db.exp
      |SELECT o_orderkey, o_orderkey % 97 FROM graft_exp_orders_src
      |WHERE o_orderkey % 97 < 50""".stripMargin) // v2, to be expired
    spark.sql("""INSERT OVERWRITE graft.db.exp
      |SELECT /*+ REPARTITION(20) */ o_orderkey, o_orderkey % 97
      |FROM graft_exp_orders_src
      |WHERE o_orderkey % 97 >= 50""".stripMargin) // v3: 20 files → @seg
    spark.sql("""INSERT INTO graft.db.exp
      |SELECT o_orderkey, o_orderkey % 97 FROM graft_exp_orders_src
      |WHERE o_orderkey % 97 < 25""".stripMargin) // v4 reuses v3's segment
    spark.sql("""CALL graft.system.expire_snapshots(
      |ns => 'db', tbl => 'exp', keep => 2)""".stripMargin)
      .select("expired_versions")
      .createOrReplaceTempView("graft_exp_acct")
    spark.sql("""SELECT m, COUNT(*) AS n,
      |  CAST(SUM(okey) AS BIGINT) AS key_sum, expired_versions
      |FROM graft.db.exp CROSS JOIN graft_exp_acct
      |GROUP BY m, expired_versions ORDER BY m""".stripMargin)
  }

  /** [[expireSnapshotsQuery]] oracle: the surviving populations (the
    * overwrite's upper half plus the appended low quartile) with the
    * deterministic retention accounting.
    */
  def expireSnapshotsSql(): String =
    """SELECT o_orderkey % 97 AS m, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
      |  CAST(2 AS BIGINT) AS expired_versions
      |FROM orders
      |WHERE o_orderkey % 97 >= 50 OR o_orderkey % 97 < 25
      |GROUP BY 1 ORDER BY m""".stripMargin

  /** Driver-contract query for METADATA-SERVED AGGREGATES: COUNT(*) /
    * MIN / MAX over a manifest table answer from the manifest's
    * per-file row counts and [min,max] stats boxes — complete
    * aggregate pushdown, ZERO data files opened (CatalogSpec pins the
    * METADATA-AGG scan in the plan; the hash here pins the values).
    * At 100 TB this is `SELECT COUNT(*), MAX(ts) FROM events` — the
    * monitoring query every pipeline runs — as a metadata read, the
    * Iceberg snapshot-summary optimization.
    */
  def statsAggQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_sa_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.oks")
    spark.sql("CREATE TABLE graft.db.oks (okey BIGINT, m BIGINT)")
    spark.sql("""INSERT INTO graft.db.oks
      |SELECT o_orderkey, o_orderkey % 97 FROM graft_sa_orders_src"""
      .stripMargin)
    spark.sql("""SELECT COUNT(*) AS n, MIN(okey) AS lo, MAX(okey) AS hi,
      |  MIN(m) AS mlo, MAX(m) AS mhi
      |FROM graft.db.oks""".stripMargin)
  }

  /** [[statsAggQuery]] oracle: the same extrema straight off orders. */
  def statsAggSql(): String =
    """SELECT COUNT(*) AS n, MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi,
      |  MIN(o_orderkey % 97) AS mlo, MAX(o_orderkey % 97) AS mhi
      |FROM orders""".stripMargin

  /** Driver-contract query for SCAN-TIME FILE PRUNING: the quartile-
    * clustered layout of [[metadataDeleteQuery]], read back with a
    * predicate only the top quartile's file can satisfy — the pushed
    * filter's stats-box evaluation (the same tri-state the
    * metadata-only DELETE runs) skips the other three files at PLAN
    * time, and the surviving file is additionally row-group- and
    * record-filtered inside parquet. CatalogSpec pins the 1-of-4 plan;
    * the hash pins that pruning lost and invented nothing. This is the
    * Iceberg scan-planning shape: at 100 TB a time-range query plans
    * O(matching files), not O(table).
    */
  def pruneScanQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_pr_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.okpr")
    spark.sql("CREATE TABLE graft.db.okpr (okey BIGINT, m BIGINT)")
    for (q <- 0 until 4)
      spark.sql(s"""INSERT INTO graft.db.okpr
        |SELECT o_orderkey, o_orderkey % 97 FROM graft_pr_orders_src
        |WHERE o_orderkey % 97 >= ${q * 25}
        |  AND o_orderkey % 97 < ${(q + 1) * 25}""".stripMargin)
    spark.sql("""SELECT m, COUNT(*) AS n,
      |  CAST(SUM(okey) AS BIGINT) AS key_sum
      |FROM graft.db.okpr WHERE m >= 80 AND m < 90
      |GROUP BY m ORDER BY m""".stripMargin)
  }

  /** [[pruneScanQuery]] oracle: the filtered band off orders. */
  def pruneScanSql(): String =
    """SELECT o_orderkey % 97 AS m, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      |FROM orders WHERE o_orderkey % 97 >= 80 AND o_orderkey % 97 < 90
      |GROUP BY 1 ORDER BY m""".stripMargin

  /** Driver-contract query for the MERGE-ON-READ lifecycle end to end:
    * the quartile-clustered layout, then a parity DELETE no stats box
    * can decide — which under the delta operation attaches a position-
    * delete sidecar to every file and rewrites NOTHING — then `CALL
    * graft.system.compact`, which is where the deletes get APPLIED
    * (the rewrite reads live rows only) and their references cleared.
    * The read-back carries the survivors' closed form plus the
    * deterministic accounting (files_out = 1, rows_rewritten = the
    * pre-delete manifest row count — delete sidecars don't restate row
    * counts, by design). A sidecar lost, double-applied, or surviving
    * compaction mismatches the hash. At 100 TB this is the production
    * delete story: point deletes cost kilobytes at statement time, and
    * the rewrite batches into maintenance.
    */
  def morCompactQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_mc_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.okmc")
    spark.sql("CREATE TABLE graft.db.okmc (okey BIGINT, m BIGINT)")
    for (q <- 0 until 4)
      spark.sql(s"""INSERT INTO graft.db.okmc
        |SELECT o_orderkey, o_orderkey % 97 FROM graft_mc_orders_src
        |WHERE o_orderkey % 97 >= ${q * 25}
        |  AND o_orderkey % 97 < ${(q + 1) * 25}""".stripMargin)
    spark.sql("DELETE FROM graft.db.okmc WHERE okey % 2 = 0") // merge-on-read
    spark.sql("""CALL graft.system.compact(ns => 'db', tbl => 'okmc',
      |  max_rows => CAST(100000000 AS BIGINT))""".stripMargin)
      .select("files_out", "rows_rewritten")
      .createOrReplaceTempView("graft_mc_acct")
    spark.sql("""SELECT m, COUNT(*) AS n,
      |  CAST(SUM(okey) AS BIGINT) AS key_sum,
      |  files_out, rows_rewritten
      |FROM graft.db.okmc CROSS JOIN graft_mc_acct
      |GROUP BY m, files_out, rows_rewritten ORDER BY m""".stripMargin)
  }

  /** Driver-contract query for SIDECAR COALESCING: the quartile
    * layout pinned to ONE file per quartile (REPARTITION(1) hint), two
    * merge-on-read DELETEs — each attaches exactly one position-delete
    * sidecar per file, since the delta scan plans one task per file —
    * then `CALL graft.system.coalesce_deletes`, which must merge each
    * file's two sidecars into one without touching a data file. The
    * accounting row (4 files, 8 sidecars -> 4) is exact at every scale
    * factor, and the survivors' aggregate hashes that no position was
    * lost or double-applied in the merge. At 100 TB this is what keeps
    * read amplification flat under sustained point-delete traffic:
    * reads parse one sidecar per file, not one per DELETE statement.
    */
  def coalesceDeletesQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_cd_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.okcd")
    spark.sql("CREATE TABLE graft.db.okcd (okey BIGINT, m BIGINT)")
    for (q <- 0 until 4)
      spark.sql(s"""INSERT INTO graft.db.okcd
        |SELECT /*+ REPARTITION(1) */ o_orderkey, o_orderkey % 97
        |FROM graft_cd_orders_src
        |WHERE o_orderkey % 97 >= ${q * 25}
        |  AND o_orderkey % 97 < ${(q + 1) * 25}""".stripMargin)
    spark.sql("DELETE FROM graft.db.okcd WHERE okey % 4 = 1")
    spark.sql("DELETE FROM graft.db.okcd WHERE okey % 4 = 2")
    spark.sql("CALL graft.system.coalesce_deletes(ns => 'db', tbl => 'okcd')")
      .createOrReplaceTempView("graft_cd_acct")
    spark.sql("""SELECT m, COUNT(*) AS n,
      |  CAST(SUM(okey) AS BIGINT) AS key_sum,
      |  files_coalesced, sidecars_before, sidecars_after
      |FROM graft.db.okcd CROSS JOIN graft_cd_acct
      |GROUP BY m, files_coalesced, sidecars_before, sidecars_after
      |ORDER BY m""".stripMargin)
  }

  /** [[coalesceDeletesQuery]] oracle: survivors of both parity deletes
    * with the exact coalescing accounting.
    */
  def coalesceDeletesSql(): String =
    """SELECT o_orderkey % 97 AS m, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
      |  CAST(4 AS BIGINT) AS files_coalesced,
      |  CAST(8 AS BIGINT) AS sidecars_before,
      |  CAST(4 AS BIGINT) AS sidecars_after
      |FROM orders WHERE o_orderkey % 4 <> 1 AND o_orderkey % 4 <> 2
      |GROUP BY 1 ORDER BY m""".stripMargin

  /** Driver-contract query for the APPEND-ONLY CHANGE FEED crossing a
    * merge-on-read delete: two inserts land (v2, v3), a misaligned
    * DELETE attaches position-delete sidecars (v4 — mutating the
    * carried files without renaming them), a third insert lands (v5),
    * and the incremental read over (v3, v5] with
    * `mordeletes=appendonly` must serve EXACTLY the third insert's
    * rows — the default contract would refuse the range (spec-pinned),
    * and serving anything else (the mutation's survivors, a re-served
    * backfill) mismatches the hash. This is the opt-in a downstream
    * incremental consumer takes at 100 TB when it only tracks inserts
    * and handles deletes out of band.
    */
  def appendOnlyFeedQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_af_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.okaf")
    spark.sql("CREATE TABLE graft.db.okaf (okey BIGINT, m BIGINT)") // v1
    for (t <- 0 until 3) {
      spark.sql(s"""INSERT INTO graft.db.okaf
        |SELECT /*+ REPARTITION(1) */ o_orderkey, o_orderkey % 97
        |FROM graft_af_orders_src
        |WHERE o_orderkey % 3 = $t""".stripMargin) // v2..v4... see below
      if (t == 1) // after the second insert: a MoR delete (v4)
        spark.sql("DELETE FROM graft.db.okaf WHERE okey % 2 = 0")
    }
    val path = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.graft.warehouse"), "db", "okaf")
    // versions: v1 create, v2 insert t=0, v3 insert t=1, v4 delete,
    // v5 insert t=2 — the feed consumer was caught up through v3
    spark.read.format("graft.sources.ManifestV2")
      .option("path", path.toString)
      .option("startVersion", "3").option("endVersion", "5")
      .option("mordeletes", "appendonly")
      .load()
      .groupBy(org.apache.spark.sql.functions.col("m"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.expr(
          "CAST(SUM(okey) AS BIGINT)").as("key_sum"))
      .orderBy("m")
  }

  /** [[appendOnlyFeedQuery]] oracle: exactly the third insert. */
  def appendOnlyFeedSql(): String =
    """SELECT o_orderkey % 97 AS m, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      |FROM orders WHERE o_orderkey % 3 = 2
      |GROUP BY 1 ORDER BY m""".stripMargin

  /** Driver-contract query for EQUALITY DELETES (the Iceberg v2
    * equality-delete sidecar, the zero-read DELETE): a key-list DELETE
    * no stats box can decide — `okey IN (…)` — writes ONE kilobyte
    * sidecar naming the dead keys and touches NO data file (the spec
    * pins byte-identity; this query hashes the read): readers subtract
    * by value, and a follow-up misaligned position-delete composes on
    * the same files. At 100 TB this is `DELETE WHERE user_id = X` —
    * the GDPR shape — costing neither a scan nor a rewrite at
    * statement time.
    */
  def eqDeleteQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_eq_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.okeq")
    spark.sql("CREATE TABLE graft.db.okeq (okey BIGINT, m BIGINT)")
    for (q <- 0 until 4)
      spark.sql(s"""INSERT INTO graft.db.okeq
        |SELECT /*+ REPARTITION(1) */ o_orderkey, o_orderkey % 97
        |FROM graft_eq_orders_src
        |WHERE o_orderkey % 97 >= ${q * 25}
        |  AND o_orderkey % 97 < ${(q + 1) * 25}""".stripMargin)
    // equality delete (zero data touched), then a positional one
    // (merge-on-read) on the same files — both kinds subtract together
    spark.sql("DELETE FROM graft.db.okeq WHERE okey IN (1, 2, 3, 1000, 32)")
    spark.sql("DELETE FROM graft.db.okeq WHERE okey % 5 = 4")
    spark.sql("""SELECT m, COUNT(*) AS n,
      |  CAST(SUM(okey) AS BIGINT) AS key_sum
      |FROM graft.db.okeq GROUP BY m ORDER BY m""".stripMargin)
  }

  /** [[eqDeleteQuery]] oracle: survivors of both deletes. */
  def eqDeleteSql(): String =
    """SELECT o_orderkey % 97 AS m, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      |FROM orders
      |WHERE o_orderkey NOT IN (1, 2, 3, 1000, 32)
      |  AND o_orderkey % 5 <> 4
      |GROUP BY 1 ORDER BY m""".stripMargin

  /** Driver-contract query for STRING-keyed equality deletes (r11
    * verdict ask #2, first half): `DELETE WHERE tag = '…'` and
    * `tag IN (…)` on a STRING column — no stats box exists for
    * strings, so every file takes the shared kilobyte sidecar and the
    * statement still touches NO data (the spec pins byte-identity of
    * every pre-existing file). Readers subtract by UTF8 value; rows
    * whose key is NULL never match (SQL equality) and must survive.
    * At 100 TB this is `DELETE WHERE tenant = 'x'` — the multi-tenant
    * GDPR shape the BIGINT-only r11 surface could not serve.
    */
  def eqDeleteStrQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_eqs_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.okeqs")
    spark.sql("CREATE TABLE graft.db.okeqs (okey BIGINT, tag STRING, m BIGINT)")
    // NULL tags on the % 11 == 0 keys: they must survive every
    // equality delete below
    for (q <- 0 until 2)
      spark.sql(s"""INSERT INTO graft.db.okeqs
        |SELECT /*+ REPARTITION(1) */ o_orderkey,
        |  CASE WHEN o_orderkey % 11 = 0 THEN NULL
        |       ELSE concat('t', CAST(o_orderkey % 13 AS STRING)) END,
        |  o_orderkey % 97
        |FROM graft_eqs_orders_src
        |WHERE o_orderkey % 2 = $q""".stripMargin)
    spark.sql("DELETE FROM graft.db.okeqs WHERE tag = 't3'")
    spark.sql("DELETE FROM graft.db.okeqs WHERE tag IN ('t5', 't11')")
    spark.sql("""SELECT m, COUNT(*) AS n,
      |  CAST(SUM(okey) AS BIGINT) AS key_sum, COUNT(tag) AS tagged
      |FROM graft.db.okeqs GROUP BY m ORDER BY m""".stripMargin)
  }

  /** [[eqDeleteStrQuery]] oracle: NULL-tag rows survive; others die on
    * tag ∈ {t3, t5, t11}.
    */
  def eqDeleteStrSql(): String =
    """SELECT o_orderkey % 97 AS m, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
      |  CAST(SUM(CASE WHEN o_orderkey % 11 = 0 THEN 0 ELSE 1 END)
      |    AS BIGINT) AS tagged
      |FROM orders
      |WHERE o_orderkey % 11 = 0
      |   OR ('t' || CAST(o_orderkey % 13 AS VARCHAR))
      |      NOT IN ('t3', 't5', 't11')
      |GROUP BY 1 ORDER BY m""".stripMargin

  /** Driver-contract query for COMPOSITE-KEY equality deletes (r11
    * verdict ask #2, second half — the multi-column CDC key):
    * `DELETE WHERE m = X AND grp = 'Y'` writes ONE typed tuple sidecar
    * (`m:bigint` + `grp:string` header). The BIGINT component still
    * prunes through file stats boxes — a file whose m-box excludes X
    * stays sidecar-free (the spec pins that) — and a follow-up
    * misaligned positional delete composes on the same files.
    */
  def eqDeleteMultiQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_eqm_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.okeqm")
    spark.sql("CREATE TABLE graft.db.okeqm (okey BIGINT, grp STRING, m BIGINT)")
    // two disjoint m-range inserts -> two files with DISJOINT m boxes,
    // so each composite delete's BIGINT component decides one of them
    for ((lo, hi) <- Seq((0, 48), (48, 97)))
      spark.sql(s"""INSERT INTO graft.db.okeqm
        |SELECT /*+ REPARTITION(1) */ o_orderkey,
        |  concat('g', CAST(o_orderkey % 3 AS STRING)), o_orderkey % 97
        |FROM graft_eqm_orders_src
        |WHERE o_orderkey % 97 >= $lo AND o_orderkey % 97 < $hi""".stripMargin)
    spark.sql("DELETE FROM graft.db.okeqm WHERE m = 60 AND grp = 'g1'")
    spark.sql("DELETE FROM graft.db.okeqm WHERE m = 10 AND grp = 'g2'")
    // misaligned positional delete composes with both tuple sidecars
    spark.sql("DELETE FROM graft.db.okeqm WHERE okey % 7 = 6")
    spark.sql("""SELECT m % 10 AS mb, COUNT(*) AS n,
      |  CAST(SUM(okey) AS BIGINT) AS key_sum
      |FROM graft.db.okeqm GROUP BY 1 ORDER BY mb""".stripMargin)
  }

  /** [[eqDeleteMultiQuery]] oracle: survivors of the two composite
    * tuples and the positional delete.
    */
  def eqDeleteMultiSql(): String =
    """SELECT (o_orderkey % 97) % 10 AS mb, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      |FROM orders
      |WHERE NOT (o_orderkey % 97 = 60 AND o_orderkey % 3 = 1)
      |  AND NOT (o_orderkey % 97 = 10 AND o_orderkey % 3 = 2)
      |  AND o_orderkey % 7 <> 6
      |GROUP BY 1 ORDER BY mb""".stripMargin

  /** Driver-contract query for the CHANGE FEED with retractions (r11
    * verdict ask #4): a table history of appends (four quartile
    * inserts), a misaligned positional DELETE (merge-on-read), and a
    * key-list equality DELETE, read back as `changefeed=true` over the
    * full version range. The feed must contain: every appended row as
    * an `insert`; the positionally deleted rows as FULL-ROW `delete`s
    * (values resolved against the files); and the equality delete as
    * per-key `delete` MARKERS (key set, other columns NULL) emitted
    * ONCE despite the sidecar being shared by all four files. The
    * aggregation splits deletes into row-retractions vs markers by the
    * NULL shape, so a duplicated marker, a lost retraction, or a
    * marker-per-file bug all mismatch the closed form.
    */
  def changeFeedQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_cdc_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.okcdc")
    spark.sql("CREATE TABLE graft.db.okcdc (okey BIGINT, m BIGINT)")
    for (q <- 0 until 4)
      spark.sql(s"""INSERT INTO graft.db.okcdc
        |SELECT /*+ REPARTITION(1) */ o_orderkey, o_orderkey % 97
        |FROM graft_cdc_orders_src
        |WHERE o_orderkey % 97 >= ${q * 25}
        |  AND o_orderkey % 97 < ${(q + 1) * 25}""".stripMargin)
    spark.sql("DELETE FROM graft.db.okcdc WHERE okey % 5 = 4") // positional
    spark.sql("DELETE FROM graft.db.okcdc WHERE okey IN (1, 2, 3, 1000, 32)")
    val warehouse = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val dirPath = java.nio.file.Paths.get(warehouse, "db", "okcdc").toString
    spark.read.format("graft.sources.ManifestV2")
      .option("path", dirPath).option("changefeed", "true").load()
      .createOrReplaceTempView("graft_cdc_feed")
    spark.sql("""SELECT _change_type AS change, (m IS NULL) AS marker,
      |  COUNT(*) AS n, CAST(SUM(okey) AS BIGINT) AS key_sum
      |FROM graft_cdc_feed
      |GROUP BY 1, 2 ORDER BY change, marker""".stripMargin)
  }

  /** Driver-contract query for the STREAMING change feed (the
    * Delta-CDF-stream shape): the [[changeFeedQuery]] history replayed
    * through `readStream` — the backfill arrives as one micro-batch of
    * inserts, then each DELETE committed WHILE THE STREAM RUNS arrives
    * as its own micro-batch of retractions (full rows for the
    * positional delete, once-emitted markers for the equality delete).
    * Offsets are versions, so the accumulated memory-sink contents
    * must equal the batch feed's closed form exactly — a dropped
    * batch, a double-served version, or a marker-per-file bug all
    * mismatch. At 100 TB this is a downstream consumer maintaining an
    * incremental mirror of an upsert table without ever rescanning it.
    */
  def streamingChangeFeedQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_scdc_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.okscdc")
    spark.sql("CREATE TABLE graft.db.okscdc (okey BIGINT, m BIGINT)")
    for (q <- 0 until 4)
      spark.sql(s"""INSERT INTO graft.db.okscdc
        |SELECT /*+ REPARTITION(1) */ o_orderkey, o_orderkey % 97
        |FROM graft_scdc_orders_src
        |WHERE o_orderkey % 97 >= ${q * 25}
        |  AND o_orderkey % 97 < ${(q + 1) * 25}""".stripMargin)
    val warehouse = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val dirPath = java.nio.file.Paths.get(warehouse, "db", "okscdc").toString
    val name = s"graft_scdc_${java.util.UUID.randomUUID()
      .toString.replace("-", "")}"
    val ck = Sources.scratchTempDir("graft_scdc_ck")
    val q = spark.readStream.format("graft.sources.ManifestV2")
      .option("path", dirPath).option("changefeed", "true").load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ck.toString)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      q.processAllAvailable() // backfill: the four appends as inserts
      spark.sql("DELETE FROM graft.db.okscdc WHERE okey % 5 = 4")
      q.processAllAvailable() // one micro-batch of full-row retractions
      spark.sql("DELETE FROM graft.db.okscdc WHERE okey IN (1, 2, 3, 1000, 32)")
      q.processAllAvailable() // one micro-batch of per-key markers
    } finally q.stop()
    spark.table(name).createOrReplaceTempView("graft_scdc_feed")
    spark.sql("""SELECT _change_type AS change, (m IS NULL) AS marker,
      |  COUNT(*) AS n, CAST(SUM(okey) AS BIGINT) AS key_sum
      |FROM graft_scdc_feed
      |GROUP BY 1, 2 ORDER BY change, marker""".stripMargin)
  }

  /** [[streamingChangeFeedQuery]] oracle: identical closed form to the
    * batch feed — streaming must not change the answer.
    */
  def streamingChangeFeedSql(): String = changeFeedSql()

  /** Driver-contract query for STREAMING INGEST INTO A PARTITIONED
    * TABLE (r12 verdict ask #1 — the event-table story closed): an
    * order-derived event feed streams through ONE checkpoint into a
    * `(days(ts), bucket(4, uid))` table — the canonical 100 TB
    * event-table layout — in two micro-batch epochs. Spark applies the
    * write's clustered distribution + transform sort to every epoch
    * (V2Writes prepares micro-batch writes like batch ones), the
    * rotating task writer lands each file partition-pure with point
    * boxes, and the per-epoch manifest swap sits behind the replay
    * ledger. The read-back aggregates the streamed table per hidden
    * day partition; a lost epoch, a replayed epoch, or an impure file
    * all break the closed form.
    */
  def streamingPartitionedIngestQuery(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_spi_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.sevt")
    spark.sql("CREATE TABLE graft.db.sevt " +
      "(uid BIGINT, ts TIMESTAMP, amt BIGINT) " +
      "PARTITIONED BY (days(ts), bucket(4, uid))")
    val work = Sources.scratchTempDir("graft_spi")
    val src = work.resolve("src").toString
    val ck = work.resolve("ck").toString
    def push(parity: Int): Unit =
      spark.sql(s"""SELECT o_orderkey % 40 AS uid,
        |  timestampadd(HOUR, CAST(o_orderkey % 24 AS INT),
        |    timestampadd(DAY, CAST(o_orderkey % 3 AS INT),
        |      TIMESTAMP '2024-03-01 00:00:00')) AS ts,
        |  o_orderkey AS amt
        |FROM graft_spi_orders_src
        |WHERE o_orderkey % 2 = $parity""".stripMargin)
        .write.format("graft.sources.ManifestV2")
        .option("path", src).mode("append").save()
    def pump(): Unit = {
      val q = spark.readStream.format("graft.sources.ManifestV2")
        .option("path", src).load()
        .writeStream.option("checkpointLocation", ck)
        .toTable("graft.db.sevt")
      try q.processAllAvailable() finally q.stop()
    }
    push(0); pump() // epoch 0
    push(1); pump() // epoch 1, same checkpoint (restart path included)
    spark.sql("""SELECT
      |  CAST(unix_micros(ts) DIV 86400000000 AS BIGINT) AS day_idx,
      |  COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS amt_sum,
      |  CAST(SUM(uid) AS BIGINT) AS uid_sum
      |FROM graft.db.sevt GROUP BY 1 ORDER BY day_idx""".stripMargin)
  }

  /** [[streamingPartitionedIngestQuery]] oracle: the feed is a pure
    * function of `orders` (day 19783 = 2024-03-01 + okey%3, amt =
    * okey, uid = okey%40), both epochs together cover every row
    * exactly once.
    */
  def streamingPartitionedIngestSql(): String =
    """SELECT CAST(19783 + o_orderkey % 3 AS BIGINT) AS day_idx,
      |  COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS amt_sum,
      |  CAST(SUM(o_orderkey % 40) AS BIGINT) AS uid_sum
      |FROM orders GROUP BY 1 ORDER BY day_idx""".stripMargin

  /** [[changeFeedQuery]] oracle: inserts = the whole table; full-row
    * retractions = the positional delete's rows; markers = the
    * statement's five keys, once.
    */
  def changeFeedSql(): String =
    """SELECT * FROM (
      |  SELECT 'delete' AS change, FALSE AS marker, COUNT(*) AS n,
      |    CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      |  FROM orders WHERE o_orderkey % 5 = 4
      |  UNION ALL
      |  SELECT 'delete', TRUE, CAST(5 AS BIGINT), CAST(1038 AS BIGINT)
      |  UNION ALL
      |  SELECT 'insert', FALSE, COUNT(*),
      |    CAST(SUM(o_orderkey) AS BIGINT)
      |  FROM orders
      |) ORDER BY change, marker""".stripMargin

  /** Driver-contract query for NULL-SOUND metadata deletes: a table
    * whose stats column carries NULLs, under a DELETE whose predicate
    * matches EVERY non-null row — the [min,max] box alone says "drop
    * the whole file", which would silently delete the NULL rows too
    * (NULL >= 0 is not TRUE). The manifest's per-column null counts
    * refuse the all-match decision, the statement falls back to the
    * merge-on-read path, and exactly the null rows survive. The
    * read-back (count, key sum, and a COUNT(v) proving every survivor
    * is NULL) hashes the boundary. This is the classic zone-map
    * soundness trap at any scale — a retention DELETE must never eat
    * rows its predicate didn't match.
    */
  def nullGuardDeleteQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    graft.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_ng_orders_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.okng")
    spark.sql("CREATE TABLE graft.db.okng (k BIGINT, v BIGINT)")
    spark.sql("""INSERT INTO graft.db.okng
      |SELECT /*+ REPARTITION(1) */ o_orderkey,
      |  CASE WHEN o_orderkey % 3 = 0 THEN NULL
      |       ELSE o_orderkey % 50 END
      |FROM graft_ng_orders_src""".stripMargin)
    spark.sql("DELETE FROM graft.db.okng WHERE v >= 0")
    spark.sql("""SELECT COUNT(*) AS n,
      |  CAST(SUM(k) AS BIGINT) AS key_sum,
      |  COUNT(v) AS non_null_survivors
      |FROM graft.db.okng""".stripMargin)
  }

  /** [[nullGuardDeleteQuery]] oracle: exactly the NULL-v rows survive. */
  def nullGuardDeleteSql(): String =
    """SELECT COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
      |  CAST(0 AS BIGINT) AS non_null_survivors
      |FROM orders WHERE o_orderkey % 3 = 0""".stripMargin

  /** [[morCompactQuery]] oracle: odd-key survivors with the
    * deterministic compaction accounting (rows_rewritten counts the
    * PRE-delete manifest rows — the whole table).
    */
  def morCompactSql(): String =
    """SELECT o_orderkey % 97 AS m, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
      |  CAST(1 AS BIGINT) AS files_out,
      |  (SELECT COUNT(*) FROM orders) AS rows_rewritten
      |FROM orders WHERE o_orderkey % 2 <> 0
      |GROUP BY 1 ORDER BY m""".stripMargin

  /** [[timeTravelQuery]] oracle: both snapshots stated straight off
    * `orders`.
    */
  def timeTravelSql(): String =
    """SELECT 'current' AS snap, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      |FROM orders WHERE o_orderkey % 97 >= 50
      |UNION ALL
      |SELECT 'v2' AS snap, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      |FROM orders WHERE o_orderkey % 97 < 50
      |ORDER BY snap""".stripMargin
}

/** `graft.fn.vmod(BIGINT) -> BIGINT`: the RangeV2 row formula id % 97
  * as a V2 catalog function. Carries the MAGIC_METHOD `invoke` so
  * Spark compiles the call to a direct method invocation inside
  * whole-stage codegen instead of the row-boxing produceResult path
  * (both are implemented; the spec pins the plan to the magic path).
  */
/** `bucket(n, col)` — the hidden-partition hash bucket
  * ([[PartTransform.bucketLong]]/[[PartTransform.bucketUtf8]]: murmur3
  * of the value's canonical bytes, non-negative mod n). BIGINT and
  * STRING columns bind to distinct monomorphic implementations under
  * ONE canonical name per type, so storage-partitioned joins match
  * exactly when both sides bucket the same way.
  */
object BucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n INT, col BIGINT|STRING) -> murmur3 bucket in [0, n)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2 &&
      inputType.head.dataType == IntegerType,
      s"bucket expects (INT, BIGINT|STRING), got ${inputType.simpleString}")
    inputType.fields(1).dataType match {
      case LongType => new BucketLongFn
      case StringType => new BucketStrFn
      case o => throw new UnsupportedOperationException(
        s"bucket does not support $o columns")
    }
  }
}

class BucketLongFn extends ScalarFunction[Long] {
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.fn.bucket"
  override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
  override def resultType(): DataType = LongType
  override def isResultNullable: Boolean = false
  def invoke(n: Int, v: Long): Long = PartTransform.bucketLong(n, v)
  override def produceResult(input: InternalRow): Long =
    PartTransform.bucketLong(input.getInt(0), input.getLong(1))
}

class BucketStrFn extends ScalarFunction[Long] {
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.fn.bucket.str"
  override def inputTypes(): Array[DataType] = Array(IntegerType, StringType)
  override def resultType(): DataType = LongType
  override def isResultNullable: Boolean = false
  def invoke(n: Int, v: org.apache.spark.unsafe.types.UTF8String): Long =
    PartTransform.bucketUtf8(n, v)
  override def produceResult(input: InternalRow): Long =
    PartTransform.bucketUtf8(input.getInt(0), input.getUTF8String(1))
}

/** `days(ts)` / `hours(ts)` / `months(ts)` — epoch unit indices off
  * the internal micros (or days, for DATE columns) form.
  */
object DaysUnbound extends UnboundFunction {
  override def name(): String = "days"
  override def description(): String =
    "days(col TIMESTAMP|DATE) -> days since epoch"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1,
      s"days expects one argument, got ${inputType.simpleString}")
    inputType.head.dataType match {
      case TimestampType | TimestampNTZType =>
        new DaysMicrosFn(inputType.head.dataType)
      case DateType => new DaysDateFn
      case o => throw new UnsupportedOperationException(
        s"days does not support $o columns")
    }
  }
}

class DaysMicrosFn(it: DataType) extends ScalarFunction[Long] {
  override def name(): String = "days"
  override def canonicalName(): String = "graft.fn.days"
  override def inputTypes(): Array[DataType] = Array(it)
  override def resultType(): DataType = LongType
  override def isResultNullable: Boolean = false
  def invoke(us: Long): Long = PartTransform.daysOfMicros(us)
  override def produceResult(input: InternalRow): Long =
    PartTransform.daysOfMicros(input.getLong(0))
}

class DaysDateFn extends ScalarFunction[Long] {
  override def name(): String = "days"
  override def canonicalName(): String = "graft.fn.days.date"
  override def inputTypes(): Array[DataType] = Array(DateType)
  override def resultType(): DataType = LongType
  override def isResultNullable: Boolean = false
  def invoke(d: Int): Long = d.toLong
  override def produceResult(input: InternalRow): Long =
    input.getInt(0).toLong
}

object HoursUnbound extends UnboundFunction {
  override def name(): String = "hours"
  override def description(): String =
    "hours(col TIMESTAMP) -> hours since epoch"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1 &&
      (inputType.head.dataType == TimestampType ||
        inputType.head.dataType == TimestampNTZType),
      s"hours expects one TIMESTAMP argument, got ${inputType.simpleString}")
    new HoursFn(inputType.head.dataType)
  }
}

class HoursFn(it: DataType) extends ScalarFunction[Long] {
  override def name(): String = "hours"
  override def canonicalName(): String = "graft.fn.hours"
  override def inputTypes(): Array[DataType] = Array(it)
  override def resultType(): DataType = LongType
  override def isResultNullable: Boolean = false
  def invoke(us: Long): Long = PartTransform.hoursOfMicros(us)
  override def produceResult(input: InternalRow): Long =
    PartTransform.hoursOfMicros(input.getLong(0))
}

object MonthsUnbound extends UnboundFunction {
  override def name(): String = "months"
  override def description(): String =
    "months(col TIMESTAMP|DATE) -> months since epoch"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1,
      s"months expects one argument, got ${inputType.simpleString}")
    inputType.head.dataType match {
      case TimestampType | TimestampNTZType =>
        new MonthsMicrosFn(inputType.head.dataType)
      case DateType => new MonthsDateFn
      case o => throw new UnsupportedOperationException(
        s"months does not support $o columns")
    }
  }
}

class MonthsMicrosFn(it: DataType) extends ScalarFunction[Long] {
  override def name(): String = "months"
  override def canonicalName(): String = "graft.fn.months"
  override def inputTypes(): Array[DataType] = Array(it)
  override def resultType(): DataType = LongType
  override def isResultNullable: Boolean = false
  def invoke(us: Long): Long =
    PartTransform.monthsOfDays(PartTransform.daysOfMicros(us))
  override def produceResult(input: InternalRow): Long =
    PartTransform.monthsOfDays(PartTransform.daysOfMicros(input.getLong(0)))
}

class MonthsDateFn extends ScalarFunction[Long] {
  override def name(): String = "months"
  override def canonicalName(): String = "graft.fn.months.date"
  override def inputTypes(): Array[DataType] = Array(DateType)
  override def resultType(): DataType = LongType
  override def isResultNullable: Boolean = false
  def invoke(d: Int): Long = PartTransform.monthsOfDays(d.toLong)
  override def produceResult(input: InternalRow): Long =
    PartTransform.monthsOfDays(input.getInt(0).toLong)
}

/** `truncate(w, col)` — the floored multiple (width literals arrive as
  * INT from DDL/SQL or LONG from the connector's own transform
  * rendering; both bind).
  */
object TruncateUnbound extends UnboundFunction {
  override def name(): String = "truncate"
  override def description(): String =
    "truncate(w INT|BIGINT, col BIGINT) -> floor(col / w) * w"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2 &&
      inputType.fields(1).dataType == LongType,
      s"truncate expects (INT|BIGINT, BIGINT), got ${inputType.simpleString}")
    inputType.head.dataType match {
      case IntegerType => new TruncIntFn
      case LongType => new TruncLongFn
      case o => throw new UnsupportedOperationException(
        s"truncate does not support $o widths")
    }
  }
}

class TruncIntFn extends ScalarFunction[Long] {
  override def name(): String = "truncate"
  override def canonicalName(): String = "graft.fn.truncate"
  override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
  override def resultType(): DataType = LongType
  override def isResultNullable: Boolean = false
  def invoke(w: Int, v: Long): Long = PartTransform.truncLong(w.toLong, v)
  override def produceResult(input: InternalRow): Long =
    PartTransform.truncLong(input.getInt(0).toLong, input.getLong(1))
}

class TruncLongFn extends ScalarFunction[Long] {
  override def name(): String = "truncate"
  override def canonicalName(): String = "graft.fn.truncate"
  override def inputTypes(): Array[DataType] = Array(LongType, LongType)
  override def resultType(): DataType = LongType
  override def isResultNullable: Boolean = false
  def invoke(w: Long, v: Long): Long = PartTransform.truncLong(w, v)
  override def produceResult(input: InternalRow): Long =
    PartTransform.truncLong(input.getLong(0), input.getLong(1))
}

object VModUnbound extends UnboundFunction {
  override def name(): String = "vmod"
  override def description(): String = "vmod(x BIGINT) -> x % 97"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1 &&
      inputType.head.dataType.isInstanceOf[LongType],
      s"vmod expects one BIGINT argument, got ${inputType.simpleString}")
    new VModScalar
  }
}

class VModScalar extends ScalarFunction[Long] {
  override def name(): String = "vmod"
  override def canonicalName(): String = "graft.fn.vmod"
  override def inputTypes(): Array[DataType] = Array(LongType)
  override def resultType(): DataType = LongType
  override def isResultNullable: Boolean = false
  // codegen path: Invoke on this method, no InternalRow boxing
  def invoke(x: Long): Long = RangeV2.vMod(x)
  // interpreted fallback
  override def produceResult(input: InternalRow): Long =
    RangeV2.vMod(input.getLong(0))
}

/** `graft.fn.sumsq(BIGINT) -> DECIMAL(38,0)`: sum of squares with a
  * BigInteger accumulator. The point is the 100 TB contract: a BIGINT
  * accumulator wraps silently at ~2^63 (reachable at tens of billions
  * of rows of 6-digit keys) while this state is exact at any count —
  * the same wrap-vs-exact divergence class the Benford/ppm audits
  * eliminate (Audit.scala). Partial states merge associatively, so
  * Spark runs it map-side-combined like any built-in aggregate.
  */
object SumSqUnbound extends UnboundFunction {
  override def name(): String = "sumsq"
  override def description(): String =
    "sumsq(x BIGINT) -> DECIMAL(38,0) exact sum of x*x"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1 &&
      inputType.head.dataType.isInstanceOf[LongType],
      s"sumsq expects one BIGINT argument, got ${inputType.simpleString}")
    new SumSqAgg
  }
}

class SumSqAgg extends AggregateFunction[java.math.BigInteger, Decimal] {
  override def name(): String = "sumsq"
  override def canonicalName(): String = "graft.fn.sumsq"
  override def inputTypes(): Array[DataType] = Array(LongType)
  override def resultType(): DataType = DecimalType(38, 0)
  override def isResultNullable: Boolean = false
  override def newAggregationState(): java.math.BigInteger =
    java.math.BigInteger.ZERO
  override def update(state: java.math.BigInteger,
      input: InternalRow): java.math.BigInteger =
    if (input.isNullAt(0)) state
    else {
      val x = java.math.BigInteger.valueOf(input.getLong(0))
      state.add(x.multiply(x))
    }
  override def merge(a: java.math.BigInteger,
      b: java.math.BigInteger): java.math.BigInteger = a.add(b)
  override def produceResult(state: java.math.BigInteger): Decimal =
    Decimal(scala.math.BigDecimal(new java.math.BigDecimal(state)), 38, 0)
}
