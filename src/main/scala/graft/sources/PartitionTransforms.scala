package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HIDDEN PARTITIONING for manifest tables — the Iceberg
  * partition-transform shape (iceberg spec: partition transforms
  * `bucket[N]`, `day`, `hour`, `month`, `truncate[W]`), re-derived for
  * this engine's text manifest:
  *
  *  - the table declares `PARTITIONED BY (bucket(8, key))` /
  *    `days(ts)` / `truncate(1000, k)` — the user never materializes a
  *    partition column;
  *  - every write derives one LONG partition value per row
  *    ([[keyFn]]), clusters rows into one file per value per task, and
  *    records the file's proven value as a POINT stats box under the
  *    reserved name [[PKey]] (`@p`) — invisible to readers, since no
  *    data column may be named `@p`;
  *  - every read TRANSPOSES its data predicates into implied `@p`
  *    conjuncts ([[impliedPartitionConjuncts]]): monotone transforms
  *    (days/hours/months/truncate) transpose ranges, bucket transposes
  *    equality and IN — so a point lookup on a bucketed key plans 1/N
  *    of the files off pure metadata, which a [min,max] box on a
  *    hash-scattered key can never do;
  *  - scans report [[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]]
  *    on the transform expression, and [[GraftCatalog]] serves the
  *    matching V2 functions — two tables bucketed the same way join
  *    with ZERO shuffle (storage-partitioned join on the natural key,
  *    no stored bucket column).
  *
  * Soundness rule: transposed conjuncts are IMPLIED BY the original
  * predicate (`p(col)` ⇒ `p'(f(col))`), so they may only ever be ADDED
  * to a conjunction, never replace it. Adding implied conjuncts keeps
  * both tri-state box decisions sound: "no row matches" from an
  * implied conjunct is true of the original; "every row matches" still
  * requires the original conjuncts themselves to decide true.
  *
  * The partition value domain is Long in every case: bucket is a
  * non-negative murmur3 bucket index, days/hours/months are epoch
  * unit indices, truncate is the floored multiple. All derivations are
  * pure integer arithmetic on the column's INTERNAL form (micros /
  * days / long / UTF-8 bytes), so writer, scan transposition, and the
  * catalog's V2 functions cannot drift — they share these methods.
  */
object PartTransform {

  /** Reserved stats-box key carrying a file's proven partition value.
    * `@` keeps it out of the data-column namespace (the writer only
    * boxes manifest-safe `[A-Za-z0-9_]` column names).
    */
  val PKey = "@p"

  /** The reserved key for partition-spec ordinal `id` — `@p` for the
    * table's first spec, `@p1`, `@p2`, … after PARTITION EVOLUTION
    * (`CALL graft.system.set_partitioning`). Each file's point box
    * lives under ITS writing spec's key, which is what keeps pruning
    * sound across evolution: a transposed conjunct is a row-level
    * fact about the source column (true for every row everywhere),
    * but it is only DECIDABLE against files that carry that spec's
    * box — files of other eras simply stay kept.
    */
  def keyName(id: Int): String = if (id == 0) PKey else s"$PKey$id"

  /** The reserved key of COMPONENT `comp` of a MULTI-TRANSFORM spec
    * (`PARTITIONED BY (days(ts), bucket(8, uid))` — the canonical
    * event-table layout): single-component specs keep the bare era
    * key (byte-compatible with every existing table); a k-component
    * spec boxes each derived value under `<eraKey>.<comp>`.
    */
  def keyName(id: Int, comp: Int, nComps: Int): String =
    if (nComps == 1) keyName(id) else s"${keyName(id)}.$comp"

  /** A multi-transform spec render: components joined by `|` (never
    * part of a single render). Bare single renders parse unchanged.
    */
  def parseMulti(s: String): Seq[Spec] =
    s.split("\\|", -1).toSeq.map(parse)
  def renderMulti(specs: Seq[Spec]): String =
    specs.map(_.render).mkString("|")

  /** The per-row derivation of ALL components, and NULL policy, for
    * the write path.
    */
  def keyFns(specs: Seq[Spec],
      schema: StructType): InternalRow => Seq[Long] = {
    val fns = specs.map(keyFn(_, schema))
    r => fns.map(_(r))
  }

  sealed trait Spec {
    def col: String
    def render: String
  }
  /** Bare column name — the pre-transform identity partitioning,
    * byte-compatible with every existing manifest.
    */
  case class Identity(col: String) extends Spec {
    def render: String = col
  }
  case class Bucket(n: Int, col: String) extends Spec {
    def render: String = s"bucket($n,$col)"
  }
  case class Days(col: String) extends Spec {
    def render: String = s"days($col)"
  }
  case class Hours(col: String) extends Spec {
    def render: String = s"hours($col)"
  }
  case class Months(col: String) extends Spec {
    def render: String = s"months($col)"
  }
  case class Trunc(w: Long, col: String) extends Spec {
    def render: String = s"truncate($w,$col)"
  }

  /** The same spec over a renamed source column (RENAME COLUMN
    * rewrites partition renders to the current name in the same
    * commit).
    */
  def withCol(spec: Spec, col: String): Spec = spec match {
    case Identity(_) => Identity(col)
    case Bucket(n, _) => Bucket(n, col)
    case Days(_) => Days(col)
    case Hours(_) => Hours(col)
    case Months(_) => Months(col)
    case Trunc(w, _) => Trunc(w, col)
  }

  /** Parse a manifest `@part` value. A bare identifier (no `(`) is
    * identity — the historical serialization, so every pre-transform
    * manifest parses unchanged.
    */
  def parse(s: String): Spec =
    if (!s.contains('(')) Identity(s)
    else {
      val open = s.indexOf('(')
      require(s.endsWith(")"), s"malformed partition transform: $s")
      val name = s.substring(0, open)
      val args = s.substring(open + 1, s.length - 1).split(",").map(_.trim)
      (name, args) match {
        case ("bucket", Array(n, c)) => Bucket(n.toInt, c)
        case ("days", Array(c)) => Days(c)
        case ("hours", Array(c)) => Hours(c)
        case ("months", Array(c)) => Months(c)
        case ("truncate", Array(w, c)) => Trunc(w.toLong, c)
        case _ => throw new IllegalArgumentException(
          s"unknown partition transform: $s")
      }
    }

  // ---- value derivations (shared by writer, transposition, V2 fns) ----

  private val MicrosPerHour = 3600L * 1000000L
  private val MicrosPerDay = 24L * MicrosPerHour

  /** Murmur3_x86_32 over a byte array, seed 0 — the public-domain
    * Austin Appleby algorithm, implemented locally so the bucket
    * function is pinned by THIS code, not by a library's version.
    */
  private[graft] def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = 0
    val nBlocks = data.length / 4
    var i = 0
    while (i < nBlocks) {
      val o = i * 4
      var k = (data(o) & 0xff) | ((data(o + 1) & 0xff) << 8) |
        ((data(o + 2) & 0xff) << 16) | ((data(o + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nBlocks * 4
    (data.length & 3) match {
      case 3 =>
        k1 ^= (data(tail + 2) & 0xff) << 16
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 2 =>
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 1 => k1 ^= data(tail) & 0xff
      case _ => ()
    }
    if ((data.length & 3) != 0) {
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2; h ^= k1
    }
    h ^= data.length
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** Bucket of a BIGINT value: murmur3 of its 8 little-endian bytes
    * (the Iceberg hash layout for integral types), folded non-negative
    * mod n.
    */
  def bucketLong(n: Int, v: Long): Long = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    ((murmur3(b) & Int.MaxValue) % n).toLong
  }

  /** Bucket of a STRING value: murmur3 of its UTF-8 bytes. */
  def bucketUtf8(n: Int, v: UTF8String): Long =
    ((murmur3(v.getBytes) & Int.MaxValue) % n).toLong

  def daysOfMicros(us: Long): Long = Math.floorDiv(us, MicrosPerDay)
  def hoursOfMicros(us: Long): Long = Math.floorDiv(us, MicrosPerHour)
  /** Months since epoch of an epoch day — proleptic Gregorian, the
    * same calendar Spark's own date arithmetic uses.
    */
  def monthsOfDays(days: Long): Long = {
    val d = java.time.LocalDate.ofEpochDay(days)
    (d.getYear - 1970L) * 12L + (d.getMonthValue - 1L)
  }
  def truncLong(w: Long, v: Long): Long = Math.floorDiv(v, w) * w

  /** Column types a transform accepts — enforced at DDL time so a
    * write can never face an underivable row.
    */
  def validate(spec: Spec, schema: StructType): Unit = {
    val f = schema.fields.find(_.name == spec.col).getOrElse(
      throw new IllegalArgumentException(
        s"partition column ${spec.col} is not in the schema"))
    def req(ok: Boolean, want: String): Unit =
      require(ok, s"${spec.render}: partition column ${spec.col} must be " +
        s"$want, got ${f.dataType.simpleString}")
    spec match {
      case Identity(_) => req(f.dataType == LongType, "BIGINT")
      case Bucket(n, _) =>
        require(n > 0, s"bucket count must be positive, got $n")
        req(f.dataType == LongType || f.dataType == StringType,
          "BIGINT or STRING")
      case Hours(_) =>
        req(f.dataType == TimestampType || f.dataType == TimestampNTZType,
          "TIMESTAMP")
      case Days(_) | Months(_) =>
        req(f.dataType == TimestampType || f.dataType == TimestampNTZType ||
          f.dataType == DateType, "TIMESTAMP or DATE")
      case Trunc(w, _) =>
        require(w > 0, s"truncate width must be positive, got $w")
        req(f.dataType == LongType, "BIGINT")
    }
  }

  /** The per-row partition value derivation for the write path. NULL
    * source values are rejected (a point `@p` box is the whole SPJ and
    * pruning contract; Iceberg's null partition would forfeit both).
    */
  def keyFn(spec: Spec, schema: StructType): InternalRow => Long = {
    val idx = schema.fieldIndex(spec.col)
    val dt = schema.fields(idx).dataType
    def nonNull(r: InternalRow): Unit =
      if (r.isNullAt(idx)) throw new IllegalArgumentException(
        s"partition column ${spec.col} must not be NULL")
    spec match {
      case Identity(_) =>
        r => { nonNull(r); r.getLong(idx) }
      case Bucket(n, _) if dt == StringType =>
        r => { nonNull(r); bucketUtf8(n, r.getUTF8String(idx)) }
      case Bucket(n, _) =>
        r => { nonNull(r); bucketLong(n, r.getLong(idx)) }
      case Days(_) if dt == DateType =>
        r => { nonNull(r); r.getInt(idx).toLong }
      case Days(_) =>
        r => { nonNull(r); daysOfMicros(r.getLong(idx)) }
      case Hours(_) =>
        r => { nonNull(r); hoursOfMicros(r.getLong(idx)) }
      case Months(_) if dt == DateType =>
        r => { nonNull(r); monthsOfDays(r.getInt(idx).toLong) }
      case Months(_) =>
        r => { nonNull(r); monthsOfDays(daysOfMicros(r.getLong(idx))) }
      case Trunc(w, _) =>
        r => { nonNull(r); truncLong(w, r.getLong(idx)) }
    }
  }

  /** A filter literal as the transform's partition value, when the
    * transform can interpret it. Temporal literals convert through
    * [[ManifestV2.boxLit]] to internal units first; bucket hashes the
    * SOURCE-typed value (long bytes or UTF-8 string bytes).
    */
  private def litKey(spec: Spec, dt: DataType, v: Any): Option[Long] =
    spec match {
      case Identity(_) => None // identity prunes on the column box itself
      case Bucket(n, _) if dt == StringType => v match {
        case s: String => Some(bucketUtf8(n, UTF8String.fromString(s)))
        case u: UTF8String => Some(bucketUtf8(n, u))
        case _ => None
      }
      case Bucket(n, _) => v match {
        case x: java.lang.Number => Some(bucketLong(n, x.longValue()))
        case _ => None
      }
      case Days(_) if dt == DateType => ManifestV2.boxLit(v)
      case Days(_) => ManifestV2.boxLit(v).map(daysOfMicros)
      case Hours(_) => ManifestV2.boxLit(v).map(hoursOfMicros)
      case Months(_) if dt == DateType => ManifestV2.boxLit(v).map(monthsOfDays)
      case Months(_) =>
        ManifestV2.boxLit(v).map(us => monthsOfDays(daysOfMicros(us)))
      case Trunc(w, _) => ManifestV2.boxLit(v).map(truncLong(w, _))
    }

  private def monotone(spec: Spec): Boolean = spec match {
    case Bucket(_, _) | Identity(_) => false
    case _ => true // days/hours/months/truncate are non-decreasing
  }

  /** Transpose data predicates into IMPLIED conjuncts on [[PKey]]:
    * equality/IN always (`col = v` ⇒ `@p = f(v)`), ranges only for
    * monotone transforms (`col > v` ⇒ `@p >= f(v)` — note the bound
    * weakens to inclusive, which keeps the implication exact). AND
    * keeps any transposable side; OR needs both; anything under NOT is
    * dropped (the negation of an implied fact implies nothing).
    * The result must be ADDED to the original conjunction, never
    * substituted for it.
    */
  def impliedPartitionConjuncts(spec: Spec, schema: StructType,
      filters: Array[Filter], pkey: String = PKey): Array[Filter] = {
    if (spec.isInstanceOf[Identity]) return Array.empty
    val dt = schema.fields.find(_.name == spec.col)
      .map(_.dataType).getOrElse(return Array.empty)
    def key(v: Any): Option[Long] = litKey(spec, dt, v)
    def txp(f: Filter): Option[Filter] = f match {
      case And(l, r) => (txp(l), txp(r)) match {
        case (Some(a), Some(b)) => Some(And(a, b))
        case (a @ Some(_), None) => a
        case (None, b) => b
      }
      case Or(l, r) => for { a <- txp(l); b <- txp(r) } yield Or(a, b)
      case EqualTo(c, v) if c == spec.col =>
        key(v).map(k => EqualTo(pkey, k))
      case In(c, vs) if c == spec.col && vs.nonEmpty &&
          vs.forall(key(_).isDefined) =>
        Some(In(pkey, vs.map(v => key(v).get: Any)))
      case GreaterThan(c, v) if c == spec.col && monotone(spec) =>
        key(v).map(k => GreaterThanOrEqual(pkey, k))
      case GreaterThanOrEqual(c, v) if c == spec.col && monotone(spec) =>
        key(v).map(k => GreaterThanOrEqual(pkey, k))
      case LessThan(c, v) if c == spec.col && monotone(spec) =>
        key(v).map(k => LessThanOrEqual(pkey, k))
      case LessThanOrEqual(c, v) if c == spec.col && monotone(spec) =>
        key(v).map(k => LessThanOrEqual(pkey, k))
      case _ => None
    }
    filters.flatMap(txp)
  }

  /** The implied conjuncts of EVERY spec era — current plus history —
    * each COMPONENT targeting its own era+component reserved key.
    * Sound as a set: each conjunct is a row-level fact, and only that
    * era's files carry the box that can decide it.
    */
  def impliedAcrossSpecs(part: Option[String], hist: Seq[String],
      schema: StructType, filters: Array[Filter]): Array[Filter] = {
    val eras = hist.zipWithIndex.collect {
      case (r, i) if r.nonEmpty => (r, i)
    } ++ part.map(r => (r, hist.size)).toSeq
    eras.toArray.flatMap { case (render, id) =>
      val specs = parseMulti(render)
      specs.zipWithIndex.flatMap { case (spec, comp) =>
        impliedPartitionConjuncts(spec, schema, filters,
          keyName(id, comp, specs.size))
      }
    }
  }

  /** [[impliedAcrossSpecs]] with each conjunct PAIRED with the reserved
    * key it references. The flat form is right for pruning (a conjunct
    * on a key a file lacks is simply undecidable and prunes nothing);
    * a decision that needs the ALL-MATCH direction — overwrite-by-
    * filter's metadata-only delete — must instead apply to each file
    * ONLY the conjuncts whose box that file actually carries:
    * otherwise any second era makes every file undecidable (no file
    * carries another era's key), and, worse, a conjunct derived under
    * the CURRENT spec but addressed to the bare legacy key would be
    * compared against boxes derived under the OLD transform — a
    * silent wrong answer. Era × component keys keep the derivation
    * and the box it judges from the same spec.
    */
  def impliedKeyed(part: Option[String], hist: Seq[String],
      schema: StructType,
      filters: Array[Filter]): Seq[(String, Filter)] = {
    val eras = hist.zipWithIndex.collect {
      case (r, i) if r.nonEmpty => (r, i)
    } ++ part.map(r => (r, hist.size)).toSeq
    eras.flatMap { case (render, id) =>
      val specs = parseMulti(render)
      specs.zipWithIndex.flatMap { case (spec, comp) =>
        val k = keyName(id, comp, specs.size)
        impliedPartitionConjuncts(spec, schema, filters, k).map((k, _))
      }
    }
  }

  /** The spec as a Spark V2 transform — what [[ManifestTable]] reports
    * from `partitioning()` and what write distributions / scan
    * partitionings resolve through [[GraftCatalog]]'s V2 functions.
    */
  def v2Transform(spec: Spec): Transform = spec match {
    case Identity(c) => Expressions.identity(c)
    case Bucket(n, c) => Expressions.bucket(n, c)
    case Days(c) => Expressions.days(c)
    case Hours(c) => Expressions.hours(c)
    case Months(c) => Expressions.months(c)
    case Trunc(w, c) => Expressions.apply("truncate",
      Expressions.literal(w), Expressions.column(c))
  }

  /** Inject a file's proven partition value into its commit message as
    * the reserved point box (null-free by the writer's NULL rejection),
    * under its writing spec era's key.
    */
  def withPointBox(m: ManifestCommit, k: Long,
      pkey: String = PKey): ManifestCommit =
    m.copy(stats = m.stats + (pkey -> (k, k)), nulls = m.nulls + (pkey -> 0L))
}
