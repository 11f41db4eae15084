package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType}
import org.apache.spark.unsafe.types.UTF8String

/** Projected parquet reading for the graft-store DSv2 partition
  * readers. Two decode paths, both opening ONE file with a
  * name-projected schema so column pruning reaches the page level:
  *
  *  - [[VectorizedFileRows]] — Spark's own
  *    `VectorizedParquetRecordReader` (the in-file decode the
  *    table-scale data/snapshot readers use): pages decode into
  *    columnar batches wholesale and rows are served as views over
  *    the batch. This is the 100 TB decode constant; measured vs the
  *    Group path in SCALING.md's r14 row.
  *  - [[readAll]]/[[open]] — the parquet-mr example API's
  *    Group-per-row decode, kept for the METADATA-scale reads
  *    (deletion vectors, feed commits, time-travel deltas) where rows
  *    are few by design and the Group path's zero-setup simplicity
  *    wins.
  *
  * Decode covers exactly the store's physical types: INT64, BINARY
  * (UTF8), BOOLEAN, and timestamps as either INT96 (Spark's default
  * parquet output) or annotated INT64 (MICROS/MILLIS) — both mapped
  * to Catalyst micros-since-epoch.
  */
object ParquetGroups {

  /** Vectorized projected cursor over one parquet file: `advance()`
    * steps to the next row (a VIEW over the current columnar batch —
    * any UTF8String that outlives the row must be `.clone()`d),
    * `value(col)` returns the Catalyst-internal value for a projected
    * column (null when absent in this file's layout or null in the
    * row).
    */
  final class VectorizedFileRows(file: String, columns: Seq[String],
      requestedTypes: Map[String, org.apache.spark.sql.types.DataType] =
        Map.empty)
      extends AutoCloseable {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, VectorizedParquetRecordReader}
    import org.apache.spark.sql.types._

    private val full = fileSchema(file)
    val present: Seq[String] = columns.filter(full.containsField)

    // Catalyst view of the projection: the caller's LOGICAL type when
    // given and servable over this file's physical type (equal, or a
    // lossless widening — Spark's vectorized reader promotes
    // int32→int64 natively), else derived from the store's physical
    // grammar (both timestamp encodings → TimestampType, so the
    // reader serves micros Longs either way). Serving the logical
    // type at the file boundary is what makes type widening and
    // narrow (int) evolved columns exact through the connector: an
    // int32 file under a widened bigint column decodes straight into
    // a Long vector, and an int column stays an Int.
    private val catalystTypes: Array[DataType] = present.map { n =>
      val t = full.getType(full.getFieldIndex(n)).asPrimitiveType()
      val fileType: DataType = t.getPrimitiveTypeName match {
        case PrimitiveType.PrimitiveTypeName.INT96 => TimestampType
        case PrimitiveType.PrimitiveTypeName.INT64 =>
          t.getLogicalTypeAnnotation match {
            case _: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              TimestampType
            case _ => LongType
          }
        case PrimitiveType.PrimitiveTypeName.INT32 => IntegerType
        case PrimitiveType.PrimitiveTypeName.BOOLEAN => BooleanType
        case PrimitiveType.PrimitiveTypeName.BINARY => StringType
        case other => throw new UnsupportedOperationException(
          s"graft-store vectorized reader: unsupported parquet type $other for ${t.getName}")
      }
      requestedTypes.get(n) match {
        case Some(req) if req == fileType => req
        case Some(LongType) if fileType == IntegerType => LongType
        case _ => fileType
      }
    }.toArray

    private val reader = new VectorizedParquetRecordReader(false, 4096)
    locally {
      // The production initialize path (the test-only String/List one
      // hardcodes int96AsTimestamp=false and cannot read Spark's
      // default INT96 output): a one-file split + a task context whose
      // conf carries the requested Catalyst schema and the same
      // parquet-interpretation flags ParquetFileFormat sets.
      val requested = StructType(present.zip(catalystTypes).map {
        case (n, dt) => StructField(n, dt)
      })
      val conf = new Configuration(false)
      conf.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
        classOf[ParquetReadSupport].getName)
      conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, requested.json)
      conf.setBoolean("spark.sql.parquet.binaryAsString", false)
      conf.setBoolean("spark.sql.parquet.int96AsTimestamp", true)
      conf.setBoolean("spark.sql.caseSensitive", false)
      conf.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled", false)
      conf.setBoolean("spark.sql.legacy.parquet.nanosAsLong", false)
      val split = new org.apache.hadoop.mapred.FileSplit(
        new HPath(file), 0, new java.io.File(file).length(), Array.empty[String])
      val attempt = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
        conf, new org.apache.hadoop.mapreduce.TaskAttemptID())
      reader.initialize(split, attempt)
    }

    private val extract: Array[(InternalRow, Int) => Any] = catalystTypes.map {
      case TimestampType | LongType => (r: InternalRow, i: Int) => r.getLong(i)
      // An IntegerType request is exact: the value IS an Int (callers
      // that want Long over an int32 file request LongType and the
      // vectorized reader promotes during decode).
      case IntegerType => (r: InternalRow, i: Int) => r.getInt(i)
      case BooleanType => (r: InternalRow, i: Int) => r.getBoolean(i)
      case StringType => (r: InternalRow, i: Int) => r.getUTF8String(i)
      case other => throw new IllegalStateException(s"unreachable type $other")
    }
    private val idx: Map[String, Int] = present.zipWithIndex.toMap
    private var row: InternalRow = _

    def advance(): Boolean = {
      val has = reader.nextKeyValue()
      if (has) row = reader.getCurrentValue.asInstanceOf[InternalRow]
      has
    }

    def value(col: String): Any = idx.get(col) match {
      case Some(i) => if (row.isNullAt(i)) null else extract(i)(row, i)
      case None => null
    }

    override def close(): Unit = reader.close()
  }

  /** The file's full schema (footer read only). */
  def fileSchema(file: String): MessageType = {
    val conf = new Configuration(false)
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(new HPath(file), conf))
    try r.getFooter.getFileMetaData.getSchema
    finally r.close()
  }

  /** Open `file` projected to `columns` (names present in the file;
    * missing names are ignored so callers can ask for logically-known
    * columns a given layout lacks). Returns (reader, projected schema
    * field order).
    */
  def open(file: String, columns: Seq[String]): (ParquetReader[Group], Seq[String]) = {
    val full = fileSchema(file)
    val present = columns.filter(full.containsField)
    val projected = new MessageType(full.getName,
      present.map(n => full.getType(full.getFieldIndex(n))): _*)
    val conf = new Configuration(false)
    conf.set(ReadSupport.PARQUET_READ_SCHEMA, projected.toString)
    val reader = ParquetReader
      .builder(new GroupReadSupport(), new HPath(file))
      .withConf(conf)
      .build()
    (reader, present)
  }

  /** Julian epoch day of 1970-01-01 (public constant from the parquet
    * INT96 timestamp layout: 8 LE bytes nanos-of-day + 4 LE bytes
    * julian day).
    */
  private val UnixEpochJulianDay = 2440588L

  private def int96ToMicros(bytes: Array[Byte]): Long = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanosOfDay = buf.getLong
    val julianDay = buf.getInt.toLong
    (julianDay - UnixEpochJulianDay) * 86400L * 1000000L + nanosOfDay / 1000L
  }

  /** Decode field `fi` of `g` to the Catalyst-internal value for the
    * store's column types (Long, UTF8String, Boolean, timestamp
    * micros). Null when the field is absent in this row.
    */
  def value(g: Group, fi: Int): Any = {
    if (g.getFieldRepetitionCount(fi) == 0) return null
    val t = g.getType.getType(fi).asPrimitiveType()
    t.getPrimitiveTypeName match {
      case PrimitiveType.PrimitiveTypeName.INT64 =>
        val v = g.getLong(fi, 0)
        t.getLogicalTypeAnnotation match {
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            ts.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MILLIS => v * 1000L
              case LogicalTypeAnnotation.TimeUnit.MICROS => v
              case LogicalTypeAnnotation.TimeUnit.NANOS => v / 1000L
            }
          case _ => v
        }
      case PrimitiveType.PrimitiveTypeName.INT32 => g.getInteger(fi, 0).toLong
      case PrimitiveType.PrimitiveTypeName.BOOLEAN => g.getBoolean(fi, 0)
      case PrimitiveType.PrimitiveTypeName.INT96 =>
        int96ToMicros(g.getInt96(fi, 0).getBytes)
      case PrimitiveType.PrimitiveTypeName.BINARY =>
        UTF8String.fromBytes(g.getBinary(fi, 0).getBytes)
      case other =>
        throw new UnsupportedOperationException(
          s"graft-store reader: unsupported parquet type $other for field ${t.getName}")
    }
  }

  /** Read an entire small parquet file (metadata-scale: deletion
    * vectors, feed commits) as decoded rows of the requested columns.
    *
    * `types` (keyed by the requested column names) declares each
    * column's LOGICAL Catalyst type; [[value]] decodes int32 to Long
    * by default, so an IntegerType column narrows back to its exact
    * Int here — the Group-path twin of the vectorized reader's
    * logical-type service, needed wherever an int evolved column (or
    * a pre-widening narrow file) flows through a feed or delta read.
    */
  def readAll(file: String, columns: Seq[String],
      types: Map[String, org.apache.spark.sql.types.DataType] = Map.empty)
      : Iterator[Array[Any]] = {
    val (reader, present) = open(file, columns)
    val presentIdx = columns.map(present.indexOf)
    val narrowToInt: Array[Boolean] = columns.map(c =>
      types.get(c).contains(org.apache.spark.sql.types.IntegerType)).toArray
    new Iterator[Array[Any]] {
      private var nextGroup: Group = reader.read()
      override def hasNext: Boolean = {
        if (nextGroup == null) reader.close()
        nextGroup != null
      }
      override def next(): Array[Any] = {
        val g = nextGroup
        nextGroup = reader.read()
        if (nextGroup == null) reader.close()
        presentIdx.zipWithIndex.map { case (i, c) =>
          if (i < 0) null
          else value(g, i) match {
            case l: java.lang.Long if narrowToInt(c) =>
              java.lang.Integer.valueOf(l.intValue())
            case v => v
          }
        }.toArray
      }
    }
  }

  /** Data files inside a directory (feed commit dir, snapshot dir). */
  def parquetFilesIn(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq.filter(_.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted
  }
}
