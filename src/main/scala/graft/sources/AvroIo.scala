package graft.sources

import java.io.{InputStream, OutputStream}

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord, GenericRecordBuilder}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._

/**
 * Avro read/write over avro-core — the reference's hive connector reads
 * Avro tables, and this zero-egress image ships Avro's CORE jars
 * (avro-1.12.1 under /opt/spark/jars) but NOT the spark-avro DataSource
 * module, so graft implements the container format directly:
 *
 *  - [[write]]: each partition streams its rows through a
 *    `DataFileWriter` to its own `part-NNNNN.avro`, via the Hadoop
 *    FileSystem API (local/HDFS/S3A alike) — executors write, the
 *    driver never sees a row, the same files-per-partition topology as
 *    a parquet sink. Executor tasks build their FileSystem from the
 *    DRIVER's hadoopConfiguration (shipped via a serializable wrapper),
 *    so spark.hadoop.* settings — S3A credentials, endpoints, custom FS
 *    schemes — reach the tasks (r18 ADVICE: `new Configuration()`
 *    silently dropped them). Commit is temp-dir + rename: parts land in
 *    a hidden sibling directory, the target is swapped in only after
 *    the job succeeds — a mid-write crash leaves the target either
 *    absent/previous or complete, never partial.
 *  - [[read]]: the schema comes off the first container header; files
 *    split at `spark.sql.files.maxPartitionBytes` granularity and each
 *    split scans as its own task, resynchronizing on Avro's 16-byte
 *    block sync markers (`DataFileReader.sync(start)` /
 *    `pastSync(end)`) — the same tiling contract as Avro's own MapReduce
 *    input format, so a single multi-GB container parallelizes across
 *    the cluster instead of serializing on one core (closed the r18
 *    one-task-per-file caveat in r19). Each task registers a completion
 *    listener that closes its container stream however the iterator
 *    terminates (LIMIT/take/abort — r18 ADVICE: the handle used to leak
 *    until full consumption).
 *
 * Type surface (both directions, nullable via union(null, T)): boolean,
 * int, long, float, double, string, binary, date (logical date),
 * timestamp (logical timestamp-micros), decimal(p,s) (logical decimal
 * over bytes), arrays of these, and nested structs. Anything else —
 * maps, nested arrays-of-arrays — is REFUSED loudly at schema
 * conversion, never silently coerced.
 */
/** Ships the driver's Hadoop configuration into task closures (Spark's
  * own `SerializableConfiguration` is spark-private). Hadoop's
  * `Configuration` serializes via its Writable contract. */
private[graft] class SerializableHadoopConf(@transient var value: Configuration)
  extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** Avro `SeekableInput` over Hadoop's `FSDataInputStream` (Hadoop's own
  * `AvroFSInput` binds the SHADED avro `SeekableInput` inside
  * hadoop-client-api, so it cannot satisfy the unshaded interface the
  * image's avro-core jars expose). */
private[graft] class HadoopSeekableInput(
    in: org.apache.hadoop.fs.FSDataInputStream, len: Long)
  extends org.apache.avro.file.SeekableInput {
  override def length(): Long = len
  override def read(b: Array[Byte], off: Int, n: Int): Int = in.read(b, off, n)
  override def seek(p: Long): Unit = in.seek(p)
  override def tell(): Long = in.getPos
  override def close(): Unit = in.close()
}

object AvroIo {

  // ------------------------------------------------------ schema mapping

  private def nullable(s: Schema): Schema =
    Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), s))

  private def avroType(dt: DataType, path: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      org.apache.avro.LogicalTypes.date()
        .addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      org.apache.avro.LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      org.apache.avro.LogicalTypes.localTimestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(elem, containsNull) =>
      elem match {
        case _: ArrayType | _: StructType | _: MapType =>
          throw new IllegalArgumentException(
            s"avro: nested container element at $path is not served " +
              "(arrays of primitives only)")
        case _ =>
          val e = avroType(elem, s"$path[]")
          Schema.createArray(if (containsNull) nullable(e) else e)
      }
    case st: StructType => record(st, path.replace('.', '_'))
    case other => throw new IllegalArgumentException(
      s"avro: unsupported type ${other.simpleString} at $path " +
        "(maps and exotic types are refused, not coerced)")
  }

  private def record(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      val t = avroType(f.dataType, f.name)
      new Schema.Field(f.name, if (f.nullable) nullable(t) else t,
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  /** Spark schema → Avro record schema (exposed for specs). */
  def avroSchema(st: StructType, name: String = "graft_row"): Schema =
    record(st, name)

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def sparkType(s: Schema, path: String): DataType = {
    val t = nonNull(s)
    (t.getType, Option(t.getLogicalType).map(_.getName).orNull) match {
      case (Schema.Type.BOOLEAN, _) => BooleanType
      case (Schema.Type.INT, "date") => DateType
      case (Schema.Type.INT, _) => IntegerType
      case (Schema.Type.LONG, "timestamp-micros") => TimestampType
      case (Schema.Type.LONG, "local-timestamp-micros") => TimestampNTZType
      case (Schema.Type.LONG, _) => LongType
      case (Schema.Type.FLOAT, _) => FloatType
      case (Schema.Type.DOUBLE, _) => DoubleType
      case (Schema.Type.STRING, _) => StringType
      case (Schema.Type.BYTES, "decimal") =>
        val d = t.getLogicalType.asInstanceOf[org.apache.avro.LogicalTypes.Decimal]
        DecimalType(d.getPrecision, d.getScale)
      case (Schema.Type.BYTES, _) => BinaryType
      case (Schema.Type.ARRAY, _) =>
        ArrayType(sparkType(t.getElementType, s"$path[]"),
          t.getElementType.getType == Schema.Type.UNION)
      case (Schema.Type.RECORD, _) => sparkStruct(t)
      case (other, _) => throw new IllegalArgumentException(
        s"avro: unsupported avro type $other at $path")
    }
  }

  private def sparkStruct(s: Schema): StructType =
    StructType(s.getFields.asScala.toSeq.map { f =>
      StructField(f.name, sparkType(f.schema, f.name),
        f.schema.getType == Schema.Type.UNION)
    })

  // --------------------------------------------------- value conversion

  private def toAvro(v: Any, dt: DataType, schema: Schema): Any = v match {
    case null => null
    case _ => dt match {
      case DateType =>
        DateTimeUtils.fromJavaDate(v.asInstanceOf[java.sql.Date])
      case TimestampType =>
        DateTimeUtils.fromJavaTimestamp(v.asInstanceOf[java.sql.Timestamp])
      case TimestampNTZType =>
        DateTimeUtils.localDateTimeToMicros(v.asInstanceOf[java.time.LocalDateTime])
      case d: DecimalType =>
        val bd = v.asInstanceOf[java.math.BigDecimal].setScale(d.scale)
        java.nio.ByteBuffer.wrap(bd.unscaledValue().toByteArray)
      case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case ArrayType(elem, _) =>
        val arrSchema = nonNull(schema)
        // Row array values surface as mutable.ArraySeq — match on the
        // collection root, not immutable.Seq
        val seq = v.asInstanceOf[scala.collection.Seq[_]]
        val out = new GenericData.Array[Any](seq.size, arrSchema)
        seq.foreach(e => out.add(toAvro(e, elem, arrSchema.getElementType)))
        out
      case st: StructType =>
        val recSchema = nonNull(schema)
        val b = new GenericRecordBuilder(recSchema)
        val row = v.asInstanceOf[Row]
        st.fields.zipWithIndex.foreach { case (f, i) =>
          b.set(f.name, toAvro(row.get(i), f.dataType,
            recSchema.getField(f.name).schema))
        }
        b.build()
      case _ => v
    }
  }

  private def fromAvro(v: Any, dt: DataType): Any = v match {
    case null => null
    case _ => dt match {
      case StringType => v.toString
      case DateType => DateTimeUtils.toJavaDate(v.asInstanceOf[Int])
      case TimestampType => DateTimeUtils.toJavaTimestamp(v.asInstanceOf[Long])
      case TimestampNTZType =>
        DateTimeUtils.microsToLocalDateTime(v.asInstanceOf[Long])
      case d: DecimalType =>
        val buf = v.asInstanceOf[java.nio.ByteBuffer]
        val bytes = new Array[Byte](buf.remaining()); buf.duplicate().get(bytes)
        new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
      case BinaryType =>
        val buf = v.asInstanceOf[java.nio.ByteBuffer]
        val bytes = new Array[Byte](buf.remaining()); buf.duplicate().get(bytes)
        bytes
      case ArrayType(elem, _) =>
        v.asInstanceOf[java.util.Collection[_]].asScala.toSeq
          .map(fromAvro(_, elem))
      case st: StructType =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(st.fields.toSeq.map(f => fromAvro(rec.get(f.name), f.dataType)))
      case _ => v
    }
  }

  // ---------------------------------------------------------------- write

  /** Distributed Avro sink: one container file per non-empty partition,
    * written by the executors through the Hadoop FileSystem API (driver
    * conf shipped into the tasks). All-or-nothing visibility: parts land
    * in a hidden temp sibling, which is renamed over the target only
    * after the job succeeds — a crash mid-write leaves the target
    * absent (or its previous content), never partially written. */
  def write(df: DataFrame, path: String, codec: String = "snappy"): Unit = {
    val schema = df.schema
    val schemaJson = avroSchema(schema).toString
    val spark = df.sparkSession
    val hconf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val dirPath = new Path(path)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parent = Option(dirPath.getParent).getOrElse(
      throw new IllegalArgumentException(s"avro: cannot write to a root path: $path"))
    val tmpDir = new Path(parent,
      s".${dirPath.getName}__graft_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    fs.mkdirs(tmpDir)
    val tmpDirStr = tmpDir.toString
    try {
      df.rdd.foreachPartition { rows =>
        if (rows.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val avro = new Schema.Parser().parse(schemaJson)
          val target = new Path(tmpDirStr, f"part-$pid%05d.avro")
          val pfs = target.getFileSystem(hconf.value)
          val out: OutputStream = pfs.create(target)
          val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avro))
            .setCodec(CodecFactory.fromString(codec))
            .create(avro, out)
          try rows.foreach { row =>
            val b = new GenericRecordBuilder(avro)
            schema.fields.zipWithIndex.foreach { case (f, i) =>
              b.set(f.name, toAvro(row.get(i), f.dataType,
                avro.getField(f.name).schema))
            }
            w.append(b.build())
          } finally w.close()
        }
      }
      // an all-empty frame still needs a schema carrier for read()
      if (fs.globStatus(new Path(tmpDir, "*.avro")).isEmpty) {
        val avro = new Schema.Parser().parse(schemaJson)
        val out = fs.create(new Path(tmpDir, "part-empty.avro"))
        new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avro))
          .setCodec(CodecFactory.fromString(codec)).create(avro, out).close()
      }
      // commit: drop any previous target, then one rename — the only
      // moment the target changes, and it changes atomically (per-FS
      // rename semantics: atomic on HDFS/local; S3A callers should
      // layer a committer, as with any rename-based sink)
      if (fs.exists(dirPath)) fs.delete(dirPath, true)
      if (!fs.rename(tmpDir, dirPath)) throw new java.io.IOException(
        s"avro: commit rename failed: $tmpDir -> $dirPath")
    } finally {
      if (fs.exists(tmpDir)) fs.delete(tmpDir, true)
    }
  }

  // ----------------------------------------------- v01: gate-facing entry

  /** v01_avro_roundtrip — the container path inside the driver's
    * correctness gate (not just spec-verified): write a lineitem slice to
    * Avro, read it back through deliberately SMALL sync-marker splits (a
    * session clone caps maxPartitionBytes at 4m so the gate exercises
    * multi-split scans from sf0.1 up), and aggregate with the oracle
    * discipline. The DuckDB oracle computes the same aggregate over the
    * ORIGINAL parquet — any lossiness in the container encode/decode or
    * any duplicated/dropped block at a split boundary forks the hash. */
  def roundtripReport(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val src = Tables.lineitem(spark, dir).select(
      "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag",
      "l_shipdate")
    val out = java.nio.file.Files.createTempDirectory("graft-avro-rt")
      .toString + "/lineitem"
    write(src.repartition(4, col("l_orderkey")), out)
    val rs = spark.newSession()
    rs.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    read(rs, out)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
          .as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double")
          .as("sum_price"),
        date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("min_ship"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("max_ship"))
      .orderBy("l_returnflag")
  }

  // ----------------------------------------------------------------- read

  /** Distributed Avro scan: schema off the first container header; each
    * file tiles into byte-range splits of `spark.sql.files.maxPartitionBytes`
    * and every split is its own task, re-synchronizing on the container's
    * block sync markers — `sync(start)` positions at the first block whose
    * sync precedes no byte of [start, end); `pastSync(end)` stops after the
    * block whose sync crosses `end`, so adjacent splits tile the file with
    * no duplicated or dropped block (Avro's MapReduce split contract).
    * Driver conf ships into the tasks; the container stream closes on task
    * completion however the iterator terminates (full consumption, LIMIT,
    * task abort). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val dirPath = new Path(path)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = (if (fs.isDirectory(dirPath))
        fs.globStatus(new Path(dirPath, "*.avro")) else fs.globStatus(dirPath))
      .sortBy(_.getPath.toString)
    require(statuses.nonEmpty, s"avro: no .avro files under $path")
    val first: InputStream = fs.open(statuses.head.getPath)
    val headStream = new DataFileStream[GenericRecord](first,
      new GenericDatumReader[GenericRecord]())
    val avroJson = try headStream.getSchema.toString finally headStream.close()
    val schema = sparkStruct(new Schema.Parser().parse(avroJson))
    val hconf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val splitBytes = math.max(1L,
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")))
    // (file, fileLen, start, end): every byte of every file is covered by
    // exactly one split — block attribution is decided by sync position
    val splits = statuses.toSeq.flatMap { st =>
      val file = st.getPath.toString
      val len = st.getLen
      if (len == 0) Seq((file, 0L, 0L, 0L))
      else (0L until len by splitBytes).map(s =>
        (file, len, s, math.min(s + splitBytes, len)))
    }
    val rows = spark.sparkContext.parallelize(splits, splits.length)
      .flatMap { case (file, fileLen, start, end) =>
        val p = new Path(file)
        val pfs = p.getFileSystem(hconf.value)
        val reader = new DataFileReader[GenericRecord](
          new HadoopSeekableInput(pfs.open(p), fileLen),
          new GenericDatumReader[GenericRecord]())
        // close on task end regardless of how far the iterator got —
        // a LIMIT/take() that stops early must not leak the handle
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => reader.close()))
        reader.sync(start) // first block at or after `start`
        new Iterator[Row] {
          def hasNext: Boolean = reader.hasNext && !reader.pastSync(end)
          def next(): Row = {
            val rec = reader.next()
            Row.fromSeq(schema.fields.toSeq.map(f =>
              fromAvro(rec.get(f.name), f.dataType)))
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
