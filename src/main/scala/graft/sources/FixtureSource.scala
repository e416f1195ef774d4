package graft.sources

import java.util.{Map => JMap}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.catalyst.util.{DateTimeUtils, FailureSafeParser}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, NullOrdering, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 fixture source (`format("graft-fixture")`): JSON-lines
  * payload files with OPTIMIZER-ENFORCED pushdown — the SURVEY §4/§7.3
  * contract that `FixtureConnector` honors only by convention. Catalyst
  * negotiates with the `ScanBuilder`, so a `.filter`/`.limit`/
  * `.orderBy(...).limit(...)` over this source lands IN the scan
  * (`PushedFilters`/`PushedLimit`/`PushedTopN` in explain) and the reader
  * skips/early-exits at the line level — the reference's `since:`/`until:`
  * query params and snscrape's ordered early-exit
  * (scrapers/twitter_scraper.py:27,35, twitter3_scraper.py:65-66), enforced
  * by the engine instead of promised by the connector.
  *
  * Options: `fixture.paths` (comma-separated), `fixture.schema` (schema
  * json), `fixture.pathColumn` ("true" appends a `__src_path` string column
  * filled with the originating file — the batched ingest path joins company
  * attribution on it).
  *
  * Scale: one InputPartition per file (splitting JSON-lines is possible but
  * pointless for ≤ page-sized fixtures); pushdown is the part that matters
  * at 100 TB — filters and TopN caps cut rows BEFORE they reach the
  * exchange, exactly what a lakehouse file-skipping scan would do.
  */
class FixtureSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-fixture"
  override def supportsExternalMetadata(): Boolean = true

  private def baseSchema(options: CaseInsensitiveStringMap): StructType =
    DataType.fromJson(options.get(FixtureSource.SchemaOpt)).asInstanceOf[StructType]

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val s = baseSchema(options)
    if (options.getBoolean(FixtureSource.PathColOpt, false))
      s.add(StructField(FixtureSource.PathCol, StringType, nullable = false))
    else s
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val paths = Option(opts.get(FixtureSource.PathsOpt)).toSeq
      .flatMap(_.split(',').toSeq).filter(_.nonEmpty)
    FixtureTable(schema, paths)
  }
}

object FixtureSource {
  val SchemaOpt = "fixture.schema"
  val PathsOpt = "fixture.paths"
  val PathColOpt = "fixture.pathColumn"
  val PathCol = "__src_path"
}

final case class FixtureTable(tableSchema: StructType, paths: Seq[String])
  extends Table with SupportsRead {
  override def schema(): StructType = tableSchema
  override def name(): String = s"graft-fixture(${paths.size} files)"
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FixtureScanBuilder(tableSchema, paths)
}

/** Pushdown negotiation. Filters: the atomic-comparison subset the reader
  * can evaluate is accepted (and ALSO returned for post-scan re-check —
  * the source skips best-effort, Spark stays authoritative). Limit/TopN:
  * per-partition early exit / bounded heap, partial by contract (Spark
  * applies the global cut). Columns: the reader parses only what's needed.
  */
final class FixtureScanBuilder(fullSchema: StructType, paths: Seq[String])
  extends ScanBuilder
  with SupportsPushDownFilters
  with SupportsPushDownLimit
  with SupportsPushDownTopN
  with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema
  private var limit: Option[Int] = None
  private var topN: Option[(Seq[FixtureSort], Int)] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, _) = filters.partition(FilterEval.supports(_, fullSchema))
    pushed = supported
    filters // everything is re-checked post-scan; the source skip is best-effort
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def isPartiallyPushed(): Boolean = true

  override def pushTopN(orders: Array[SortOrder], l: Int): Boolean = {
    val converted = orders.toSeq.map(FixtureSort.from(_, fullSchema))
    if (converted.forall(_.isDefined)) {
      topN = Some((converted.flatten, l)); limit = None; true
    } else false
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = FixtureScan(fullSchema, required, paths, pushed, limit, topN)
}

/** One sort key the reader can honor: ordinal + type + direction. */
final case class FixtureSort(name: String, direction: SortDirection, nullsFirst: Boolean)

object FixtureSort {
  def from(o: SortOrder, schema: StructType): Option[FixtureSort] = o.expression() match {
    case f: NamedReference if f.fieldNames().length == 1 &&
        schema.fieldNames.contains(f.fieldNames()(0)) &&
        FilterEval.comparable(schema(f.fieldNames()(0)).dataType) =>
      Some(FixtureSort(f.fieldNames()(0), o.direction(),
        o.nullOrdering() == NullOrdering.NULLS_FIRST))
    case _ => None
  }
}

final case class FixtureScan(
    fullSchema: StructType,
    required: StructType,
    paths: Seq[String],
    filters: Array[Filter],
    limit: Option[Int],
    topN: Option[(Seq[FixtureSort], Int)]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val f = filters.map(_.toString).mkString("[", ", ", "]")
    s"graft-fixture PushedFilters: $f, PushedLimit: ${limit.getOrElse("none")}, " +
      s"PushedTopN: ${topN.map { case (s, n) => s"$s LIMIT $n" }.getOrElse("none")}"
  }

  override def planInputPartitions(): Array[InputPartition] =
    paths.map(FixtureInputPartition(_)).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    FixtureReaderFactory(required, filters, limit, topN)
}

final case class FixtureInputPartition(path: String) extends InputPartition

final case class FixtureReaderFactory(
    required: StructType,
    filters: Array[Filter],
    limit: Option[Int],
    topN: Option[(Seq[FixtureSort], Int)]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new FixtureReader(p.asInstanceOf[FixtureInputPartition].path, required, filters, limit, topN)
}

/** Line-level reader: parse with Spark's own JacksonParser on the PRUNED
  * schema, skip rows failing pushed filters, stop after the pushed limit
  * (early exit), or keep a bounded heap for pushed TopN. `__src_path` is
  * filled here, not parsed.
  */
final class FixtureReader(
    path: String,
    required: StructType,
    filters: Array[Filter],
    limit: Option[Int],
    topN: Option[(Seq[FixtureSort], Int)]) extends PartitionReader[InternalRow] {

  private val pathOrdinal = required.fieldNames.indexOf(FixtureSource.PathCol)
  private val parseSchema = StructType(required.filterNot(_.name == FixtureSource.PathCol))

  private val parser = {
    val opts = new JSONOptions(Map.empty[String, String], "UTC")
    val raw = new JacksonParser(parseSchema, opts, allowArrayAsStructs = true)
    new FailureSafeParser[String](
      in => raw.parse(in, CreateJacksonParser.string, UTF8String.fromString),
      opts.parseMode, parseSchema, opts.columnNameOfCorruptRecord)
  }

  private val source = scala.io.Source.fromFile(path, "UTF-8")
  private val base: Iterator[InternalRow] = source.getLines()
    .filter(_.trim.nonEmpty)
    .flatMap(parser.parse)
    .filter(r => filters.forall(FilterEval.eval(_, r, parseSchema)))
    .map(withPath)

  private val rows: Iterator[InternalRow] = topN match {
    case Some((orders, n)) =>
      // bounded selection: keep the n best under the pushed order; Spark
      // re-sorts globally (isPartiallyPushed), so emission order is free
      val ord = FilterEval.rowOrdering(orders, required)
      val heap = mutable.PriorityQueue.empty[InternalRow](ord) // max-heap of worst
      base.foreach { r => heap.enqueue(r); if (heap.size > n) heap.dequeue() }
      heap.toIndexedSeq.iterator
    case None => limit.map(base.take).getOrElse(base)
  }

  private def withPath(r: InternalRow): InternalRow =
    if (pathOrdinal < 0) r.copy()
    else {
      val out = new GenericInternalRow(required.length)
      var i = 0
      var j = 0
      while (i < required.length) {
        if (i == pathOrdinal) out.update(i, UTF8String.fromString(path))
        else { out.update(i, r.get(j, parseSchema(j).dataType)); j += 1 }
        i += 1
      }
      out
    }

  private var current: InternalRow = _
  override def next(): Boolean = { val has = rows.hasNext; if (has) current = rows.next(); has }
  override def get(): InternalRow = current
  override def close(): Unit = source.close()
}

/** Evaluator for the v1-Filter subset the reader pushes: And/Or/Not over
  * null checks and comparisons of top-level atomic columns. Values arrive
  * as external types (java.sql.Timestamp, String, boxed numbers) and are
  * compared against InternalRow storage types (micros, UTF8String).
  */
object FilterEval {

  def comparable(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | DoubleType | FloatType | StringType |
         BooleanType | TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }

  def supports(f: Filter, schema: StructType): Boolean = f match {
    case And(l, r) => supports(l, schema) && supports(r, schema)
    case Or(l, r) => supports(l, schema) && supports(r, schema)
    case Not(c) => supports(c, schema)
    case IsNull(a) => top(a, schema)
    case IsNotNull(a) => top(a, schema)
    case EqualTo(a, _) => top(a, schema)
    case GreaterThan(a, _) => top(a, schema)
    case GreaterThanOrEqual(a, _) => top(a, schema)
    case LessThan(a, _) => top(a, schema)
    case LessThanOrEqual(a, _) => top(a, schema)
    case In(a, _) => top(a, schema)
    case _ => false
  }

  private def top(attr: String, schema: StructType): Boolean =
    !attr.contains('.') && schema.fieldNames.contains(attr) &&
      // __src_path is filled AFTER parsing+filtering (withPath), so the
      // reader cannot evaluate predicates on it — leave them post-scan
      attr != FixtureSource.PathCol &&
      comparable(schema(attr).dataType)

  /** Null-safe tri-state collapse to "keep the row?": unknown keeps (the
    * post-scan filter is authoritative; the push is only a skip).
    */
  def eval(f: Filter, row: InternalRow, schema: StructType): Boolean = f match {
    case And(l, r) => eval(l, row, schema) && eval(r, row, schema)
    case Or(l, r) => eval(l, row, schema) || eval(r, row, schema)
    case Not(c) => !eval(c, row, schema)
    case IsNull(a) => valueOf(a, row, schema).isEmpty
    case IsNotNull(a) => valueOf(a, row, schema).nonEmpty
    case EqualTo(a, v) => cmp(a, v, row, schema).exists(_ == 0)
    case GreaterThan(a, v) => cmp(a, v, row, schema).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(a, v, row, schema).exists(_ >= 0)
    case LessThan(a, v) => cmp(a, v, row, schema).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(a, v, row, schema).exists(_ <= 0)
    case In(a, vs) => vs.exists(v => cmp(a, v, row, schema).exists(_ == 0))
    case _ => true
  }

  private def valueOf(attr: String, row: InternalRow, schema: StructType): Option[Any] = {
    val i = schema.fieldNames.indexOf(attr)
    if (i < 0 || row.isNullAt(i)) None else Some(row.get(i, schema(i).dataType))
  }

  /** Compare stored value vs external literal; None when either is null. */
  private def cmp(attr: String, lit: Any, row: InternalRow, schema: StructType): Option[Int] = {
    val i = schema.fieldNames.indexOf(attr)
    if (i < 0 || row.isNullAt(i) || lit == null) return None
    val dt = schema(i).dataType
    val stored = row.get(i, dt)
    Some(compareValues(stored, toStorage(lit, dt), dt))
  }

  private def toStorage(v: Any, dt: DataType): Any = (v, dt) match {
    case (t: java.sql.Timestamp, TimestampType | TimestampNTZType) =>
      DateTimeUtils.fromJavaTimestamp(t)
    case (t: java.time.Instant, TimestampType) => DateTimeUtils.instantToMicros(t)
    case (t: java.time.LocalDateTime, TimestampNTZType) => DateTimeUtils.localDateTimeToMicros(t)
    case (d: java.sql.Date, DateType) => DateTimeUtils.fromJavaDate(d)
    case (d: java.time.LocalDate, DateType) => DateTimeUtils.localDateToDays(d)
    case (s: String, StringType) => UTF8String.fromString(s)
    case (other, _) => other
  }

  private def compareValues(a: Any, b: Any, dt: DataType): Int = dt match {
    case IntegerType => java.lang.Integer.compare(a.asInstanceOf[Int], numTo(b).intValue())
    case LongType | TimestampType | TimestampNTZType =>
      java.lang.Long.compare(a.asInstanceOf[Long], numTo(b).longValue())
    case DateType => java.lang.Integer.compare(a.asInstanceOf[Int], numTo(b).intValue())
    case DoubleType => java.lang.Double.compare(a.asInstanceOf[Double], numTo(b).doubleValue())
    case FloatType => java.lang.Float.compare(a.asInstanceOf[Float], numTo(b).floatValue())
    case StringType => a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    case BooleanType => java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case _ => 0
  }

  private def numTo(b: Any): Number = b match {
    case n: Number => n
    case other => other.asInstanceOf[Number]
  }

  /** Max-heap ordering over the pushed sort: the queue head is the WORST
    * row under the requested order, so dequeue evicts correctly.
    */
  def rowOrdering(orders: Seq[FixtureSort], schema: StructType): Ordering[InternalRow] =
    new Ordering[InternalRow] {
      override def compare(x: InternalRow, y: InternalRow): Int = {
        orders.foreach { o =>
          val i = schema.fieldNames.indexOf(o.name)
          val dt = schema(i).dataType
          val (xn, yn) = (x.isNullAt(i), y.isNullAt(i))
          var c =
            if (xn && yn) 0
            else if (xn) { if (o.nullsFirst) -1 else 1 }
            else if (yn) { if (o.nullsFirst) 1 else -1 }
            else compareValues(x.get(i, dt), y.get(i, dt), dt)
          if (!xn && !yn && o.direction == SortDirection.DESCENDING) c = -c
          if (c != 0) return c
        }
        0
      }
    }
}
