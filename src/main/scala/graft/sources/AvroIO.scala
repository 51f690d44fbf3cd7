package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileStream,
  DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro object-container interchange — the commonest streaming-
  * interchange format a training-data pipeline ingests (Kafka dumps,
  * upstream CDC drops), served WITHOUT the optional `spark-avro`
  * module: this environment ships only Avro core (avro-1.12.1), so the
  * bridge is built directly on the public container-file API.
  *
  * Both directions are fully distributed:
  *
  *  - WRITE: one container file per input partition, created through
  *    the Hadoop FileSystem API (the same executor-side create every
  *    Spark sink uses — file://, hdfs://, s3a:// alike). Each task
  *    streams its rows through a [[DataFileWriter]]; nothing funnels
  *    through the driver. Files roll with the upstream partitioning,
  *    so sizing them is the usual `repartition(n)` decision.
  *  - READ: the `binaryFile` source lists and ships each file's bytes
  *    to a task, which decodes the container blocks executor-side.
  *    Parallelism is per FILE — the right grain when the writer rolls
  *    ~128 MB containers (ours does, by partition). A block-splittable
  *    reader (Avro sync markers make containers splittable, the way
  *    Hadoop's AvroInputFormat does) is the refinement for pathological
  *    single-huge-file drops; at that point use spark-avro proper.
  *
  * Type surface: BIGINT/INT/DOUBLE/FLOAT/BOOLEAN/STRING/BINARY, each
  * nullable via the standard `[null, T]` union — the interchange
  * subset every fixture table uses. Anything else refuses loudly
  * rather than guessing a logical-type mapping. Codec: deflate (pure
  * JDK — no native library dependency on either side).
  */
object AvroIO {

  /** Spark schema → Avro record schema: primitives, each nullable as
    * a `[null, T]` union (Spark fields are nullable by default and a
    * reader of foreign Avro must assume the same). */
  def avroSchema(schema: StructType, recordName: String = "row"): Schema = {
    val fields = schema.fields.map { f =>
      val t = f.dataType match {
        case LongType => Schema.Type.LONG
        case IntegerType => Schema.Type.INT
        case DoubleType => Schema.Type.DOUBLE
        case FloatType => Schema.Type.FLOAT
        case BooleanType => Schema.Type.BOOLEAN
        case StringType => Schema.Type.STRING
        case BinaryType => Schema.Type.BYTES
        case other => throw new IllegalArgumentException(
          s"AvroIO: unsupported column type ${other.sql} for " +
            s"'${f.name}' — the interchange subset is " +
            "BIGINT/INT/DOUBLE/FLOAT/BOOLEAN/STRING/BINARY")
      }
      new Schema.Field(f.name,
        Schema.createUnion(Schema.create(Schema.Type.NULL),
          Schema.create(t)),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(recordName, null, "graft", false,
      fields.toSeq.asJava)
  }

  /** Avro record schema → Spark schema (the inverse, for reads of
    * foreign files): unwraps `[null, T]` unions, refuses non-primitive
    * fields. */
  def sparkSchema(schema: Schema): StructType = {
    def unwrap(s: Schema): (Schema, Boolean) =
      if (s.getType == Schema.Type.UNION) {
        val branches = s.getTypes.asScala.toSeq
        val nonNull = branches.filter(_.getType != Schema.Type.NULL)
        require(nonNull.size == 1,
          s"AvroIO: unsupported union ${s} — only [null, T] unions map")
        (nonNull.head, branches.size > nonNull.size)
      } else (s, false)
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (s, nullable) = unwrap(f.schema())
      val dt = s.getType match {
        case Schema.Type.LONG => LongType
        case Schema.Type.INT => IntegerType
        case Schema.Type.DOUBLE => DoubleType
        case Schema.Type.FLOAT => FloatType
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.STRING => StringType
        case Schema.Type.BYTES => BinaryType
        case other => throw new IllegalArgumentException(
          s"AvroIO: unsupported Avro type $other for '${f.name}'")
      }
      StructField(f.name, dt, nullable)
    })
  }

  /** Distributed write: each partition streams to ONE container file
    * under `dir` (empty partitions write nothing). Returns the number
    * of files written. */
  def write(df: DataFrame, dir: String): Long = {
    val avroJson = avroSchema(df.schema).toString
    val names = df.schema.fieldNames
    val written = df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val sch = new Schema.Parser().parse(avroJson)
        val path = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.avro")
        val out = path.getFileSystem(new Configuration()).create(path, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](sch))
        w.setCodec(CodecFactory.deflateCodec(6))
        w.create(sch, out)
        try rows.foreach { r =>
          val rec = new GenericData.Record(sch)
          var i = 0
          while (i < names.length) {
            rec.put(names(i), r.get(i) match {
              case null => null
              case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
              case v => v
            })
            i += 1
          }
          w.append(rec)
        } finally w.close()
        Iterator.single(1L)
      }
    }.fold(0L)(_ + _)
    written
  }

  /** Distributed read of every `*.avro` container under `dir`: schema
    * from ONE header read driver-side (container headers are
    * self-describing), bytes shipped by the `binaryFile` source,
    * blocks decoded executor-side. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val conf = new Configuration()
    val pattern = new org.apache.hadoop.fs.Path(dir, "*.avro")
    val fs = pattern.getFileSystem(conf)
    val files = fs.globStatus(pattern)
    require(files != null && files.nonEmpty,
      s"AvroIO.read: no .avro container files under $dir")
    val header = new DataFileStream[GenericRecord](
      fs.open(files.head.getPath),
      new GenericDatumReader[GenericRecord]())
    val avro = try header.getSchema finally header.close()
    val struct = sparkSchema(avro)
    val names = struct.fieldNames
    val rows = spark.read.format("binaryFile")
      .load(s"$dir/*.avro")
      .select("content").rdd
      .flatMap { fileRow =>
        val bytes = fileRow.getAs[Array[Byte]](0)
        val r = new DataFileReader[GenericRecord](
          new SeekableByteArrayInput(bytes),
          new GenericDatumReader[GenericRecord]())
        // A downstream operator may stop consuming early (limit,
        // take): close on task completion, not only on exhaustion.
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try r.close() catch { case _: Throwable => () }))
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = r.hasNext
            if (!h) r.close()
            h
          }
          override def next(): Row = {
            val rec = r.next()
            Row.fromSeq(names.toIndexedSeq.map { n =>
              rec.get(n) match {
                case null => null
                case u: org.apache.avro.util.Utf8 => u.toString
                case b: java.nio.ByteBuffer =>
                  val a = new Array[Byte](b.remaining()); b.get(a); a
                case v => v
              }
            })
          }
        }
      }
    spark.createDataFrame(rows, struct)
  }
}
