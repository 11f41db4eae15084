package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The customer-CSV ingest format as a first-class DataSource V2 table
  * (`spark.read.format("graft-customers").load(dir)`) — the reference's
  * csvReader scan (csv-crm-upload cmd/csvreader/csvreader.go:54-85)
  * surfaced to Catalyst as a real connector rather than a pre-built
  * DataFrame, so the optimizer can negotiate with the scan:
  *
  *  - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): a
  *    2-column projection reads a 2-column schema — the reader parses
  *    each line once but materializes only the requested fields.
  *  - FILTER PUSHDOWN (`SupportsPushDownFilters`): comparisons on
  *    `id` and equality/IsNotNull on the string columns evaluate
  *    INSIDE the reader, before row materialization; unsupported
  *    predicates stay residual and Catalyst re-applies them.
  *  - One [[InputPartition]] per file: CSV is line-delimited, so file
  *    granularity is the natural split (the 100 TB layout shards the
  *    corpus into many files; byte-range splitting within a file would
  *    need line-boundary probing, which the single-pass layout makes
  *    unnecessary).
  *
  * Row validity matches [[graft.pipeline.Ingest.validate]] exactly:
  * a row surfaces iff its id parses as a long (P2, csvreader.go:
  * 120-124) and its email is non-empty after trim (P3, csvreader.go:
  * 125-127); offending lines are skipped (the scan is the SELECT side
  * — per-line quarantine with reasons stays the Ingest path's job).
  * Lines with MORE than 5 fields are malformed and skipped; missing
  * trailing fields read as null, and PRESENT-BUT-EMPTY fields also
  * read as null — the same contract as the Spark CSV scan the Ingest
  * path uses (univocity's default emptyValue), so `5,Eve,E,e@x.com,`
  * yields phone = null through both paths and pushed IsNotNull /
  * EqualTo filters see identical values. Quoted fields follow the
  * RFC 4180 subset: `"a,b"` protects the comma, `""` escapes a quote.
  */
class CustomerCsvSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-customers"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CustomerCsvSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "graft-customers requires a path")
    new CustomerCsvTable(path,
      Option(properties.get("header")).forall(_.toBoolean))
  }
}

object CustomerCsvSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("email", StringType, nullable = false),
    StructField("phone", StringType)))

  /** RFC 4180 subset: split one line into fields, commas inside
    * double-quoted fields protected, `""` inside quotes an escaped
    * quote. Returns null for a structurally broken line (unterminated
    * quote).
    */
  private[sources] def splitLine(line: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var i = 0
    var inQuotes = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { cur.append('"'); i += 1 }
          else inQuotes = false
        } else cur.append(c)
      } else c match {
        case '"' => inQuotes = true
        case ',' => out += cur.toString; cur.setLength(0)
        case _   => cur.append(c)
      }
      i += 1
    }
    if (inQuotes) return null
    out += cur.toString
    out.toArray
  }
}

class CustomerCsvTable(path: String, header: Boolean)
    extends Table with SupportsRead {
  override def name(): String = s"graft_customers($path)"
  override def schema(): StructType = CustomerCsvSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CustomerCsvScanBuilder(path, header)
}

class CustomerCsvScanBuilder(path: String, header: Boolean)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = CustomerCsvSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Catalyst hands the pruned schema in table-column order; an empty
    // prune (COUNT(*)) legitimately yields zero columns.
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, rest) = filters.partition(CustomerCsvPartitionReader.supported)
    pushed = sup
    rest // residual — Catalyst keeps evaluating these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new CustomerCsvScan(path, header, required, pushed)
}

class CustomerCsvScan(path: String, header: Boolean, required: StructType,
    filters: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftCustomerCsv path=$path, ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${filters.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val files =
      if (dir.isDirectory)
        dir.listFiles().filter { f =>
          val n = f.getName
          f.isFile && !n.startsWith("_") && !n.startsWith(".") && !n.endsWith(".crc")
        }.map(_.getAbsolutePath).sorted
      else Array(dir.getAbsolutePath)
    files.map(f => CustomerCsvInputPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    CustomerCsvReaderFactory(header, required.fieldNames, filters)
}

case class CustomerCsvInputPartition(file: String) extends InputPartition

case class CustomerCsvReaderFactory(header: Boolean, required: Array[String],
    filters: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new CustomerCsvPartitionReader(
      partition.asInstanceOf[CustomerCsvInputPartition].file,
      header, required, filters)
}

object CustomerCsvPartitionReader {
  /** Predicates the reader evaluates itself: id comparisons and
    * string equality/IsNotNull — the shapes a manifest-pruning layer
    * would also understand. Everything else stays residual.
    */
  def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _: java.lang.Long) => a == "id"
    case EqualTo(a, _: String) => a != "id"
    case GreaterThan(a, _: java.lang.Long) => a == "id"
    case GreaterThanOrEqual(a, _: java.lang.Long) => a == "id"
    case LessThan(a, _: java.lang.Long) => a == "id"
    case LessThanOrEqual(a, _: java.lang.Long) => a == "id"
    case IsNotNull(_) => true
    case _ => false
  }
}

/** Streams one CSV file: parse → validate (Ingest parity) → pushed
  * filters → materialize ONLY the pruned columns. No whole-file
  * buffering; one InternalRow allocated per surviving line.
  */
class CustomerCsvPartitionReader(file: String, header: Boolean,
    required: Array[String], filters: Array[Filter])
    extends PartitionReader[InternalRow] {

  import CustomerCsvSource.splitLine

  private val reader = new java.io.BufferedReader(new java.io.FileReader(file))
  if (header) { reader.readLine(): Unit }

  // Column positions in the full CSV layout.
  private val ColNames = Array("id", "first_name", "last_name", "email", "phone")
  private val requiredIdx = required.map(n => ColNames.indexOf(n))

  private var current: InternalRow = _

  // Missing trailing fields AND present-but-empty fields are both
  // null, matching the Spark-CSV/Ingest read of the same line (see
  // class doc) — without the emptiness check the connector surfaced
  // "" where Ingest surfaced null and pushed filters diverged.
  private def field(fields: Array[String], i: Int): String =
    if (i < fields.length && fields(i).nonEmpty) fields(i) else null

  private def passes(id: Long, fields: Array[String]): Boolean =
    filters.forall {
      case EqualTo("id", v: java.lang.Long) => id == v.longValue()
      case GreaterThan("id", v: java.lang.Long) => id > v.longValue()
      case GreaterThanOrEqual("id", v: java.lang.Long) => id >= v.longValue()
      case LessThan("id", v: java.lang.Long) => id < v.longValue()
      case LessThanOrEqual("id", v: java.lang.Long) => id <= v.longValue()
      case EqualTo(a, v: String) => v == field(fields, ColNames.indexOf(a))
      case IsNotNull("id") | IsNotNull("email") => true // valid rows guarantee both
      case IsNotNull(a) => field(fields, ColNames.indexOf(a)) != null
      case _ => true
    }

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null) {
      val fields = splitLine(line)
      if (fields != null && fields.length <= ColNames.length) {
        val idStr = field(fields, 0)
        val email = field(fields, 3)
        val idOpt =
          try { if (idStr == null) None else Some(idStr.trim.toLong) }
          catch { case _: NumberFormatException => None }
        if (idOpt.isDefined && email != null && email.trim.nonEmpty &&
            passes(idOpt.get, fields)) {
          val values: Array[Any] = requiredIdx.map {
            case 0 => idOpt.get
            case i => field(fields, i) match {
              case null => null
              case s => UTF8String.fromString(s)
            }
          }
          current = InternalRow.fromSeq(values.toIndexedSeq)
          return true
        }
      }
      line = reader.readLine()
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
