package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema => AvroSchema}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file interchange — the remaining common pipeline wire
  * format (Kafka ecosystems, schema-registry shops) after
  * [[Interchange]]'s JSONL/CSV/ORC. The Spark distribution in this
  * environment ships avro-core but NOT the `spark-avro` data source, so
  * this is a self-contained implementation over the Avro Java API behind
  * the same distributed seams a data source would use: the writer is one
  * `mapPartitions` pass (one container file per partition, snappy codec,
  * written to a hidden `.tmp-` name and renamed — a killed task leaves no
  * visible partial file), the reader fans the file list out one file per
  * task (Avro containers are block-compressed and not splittable without
  * sync-marker seeking; parallelism comes from file count, which the
  * writer keeps equal to the producing frame's partitioning).
  *
  * The [[Interchange]] doctrine carries over:
  *   - **Schema is explicit, never inferred** on read: callers pass the
  *     expected `StructType`, and each file's embedded writer schema must
  *     match it field-for-field (name, Avro type, nullability) or the
  *     read THROWS naming the file and field — a drifted producer is a
  *     loud failure, not silently-coerced columns.
  *   - **FAILFAST by default**: an unreadable container or a mid-file
  *     decode error propagates. [[quarantineAvroFiles]] is the
  *     quarantine flow at the natural Avro granularity (the FILE — a
  *     container with a torn header/sync has no per-line notion of
  *     "record 17 is bad"): it partitions the directory's files into
  *     (readable, quarantined) by decoding each fully, so the good side
  *     is exactly what [[readAvro]] accepts.
  *
  * Type coverage (require-checked loudly at write): BIGINT/INT/DOUBLE/
  * FLOAT/STRING/BOOLEAN/BINARY/TIMESTAMP (micros logical type) and
  * ARRAY of those — the fixture tables' full surface. Nullable columns
  * map to `union(null, T)`.
  */
object Avro {

  private val NullSchema = AvroSchema.create(AvroSchema.Type.NULL)

  private def avroTypeFor(dt: DataType, where: String): AvroSchema = dt match {
    case LongType    => AvroSchema.create(AvroSchema.Type.LONG)
    case IntegerType => AvroSchema.create(AvroSchema.Type.INT)
    case DoubleType  => AvroSchema.create(AvroSchema.Type.DOUBLE)
    case FloatType   => AvroSchema.create(AvroSchema.Type.FLOAT)
    case StringType  => AvroSchema.create(AvroSchema.Type.STRING)
    case BooleanType => AvroSchema.create(AvroSchema.Type.BOOLEAN)
    case BinaryType  => AvroSchema.create(AvroSchema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(AvroSchema.create(AvroSchema.Type.LONG))
    case ArrayType(et, containsNull) =>
      AvroSchema.createArray(nullable(avroTypeFor(et, s"$where element"), containsNull))
    case other =>
      throw new IllegalArgumentException(
        s"Avro interchange: unsupported Spark type $other at $where")
  }

  private def nullable(s: AvroSchema, isNullable: Boolean): AvroSchema =
    if (isNullable) AvroSchema.createUnion(java.util.List.of(NullSchema, s)) else s

  /** The Avro record schema for a Spark schema — field order preserved,
    * nullability as null-unions. Deterministic, so two engines writing
    * the same frame produce byte-compatible schemas. */
  def avroSchemaFor(schema: StructType, recordName: String = "graft_row"): AvroSchema = {
    val fields = schema.fields.map { f =>
      new AvroSchema.Field(
        f.name, nullable(avroTypeFor(f.dataType, s"column ${f.name}"), f.nullable),
        null, if (f.nullable) AvroSchema.Field.NULL_DEFAULT_VALUE else null)
    }
    AvroSchema.createRecord(recordName, null, "graft", false, fields.toList.asJava)
  }

  private def toAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (t: java.sql.Timestamp, TimestampType) =>
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case (i: java.time.Instant, TimestampType) =>
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (s: scala.collection.Seq[_], ArrayType(et, _)) =>
      s.map(x => toAvroValue(x, et)).asJava
    case (x, _) => x
  }

  private def fromAvroValue(v: Any, dt: DataType, where: String): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: CharSequence, StringType) => s.toString
    case (l: java.lang.Long, TimestampType) =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(l.longValue(), 1000000L),
        Math.floorMod(l.longValue(), 1000000L) * 1000L))
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
    case (a: java.util.Collection[_], ArrayType(et, _)) =>
      a.asScala.toSeq.map(x => fromAvroValue(x, et, s"$where element"))
    case (x: java.lang.Number, LongType)    => x.longValue()
    case (x: java.lang.Number, IntegerType) => x.intValue()
    case (x: java.lang.Number, DoubleType)  => x.doubleValue()
    case (x: java.lang.Number, FloatType)   => x.floatValue()
    case (x: java.lang.Boolean, BooleanType) => x
    case (x, _) =>
      throw new IllegalStateException(
        s"Avro interchange: cannot decode ${x.getClass.getName} as $dt at $where")
  }

  /** Write `df` as snappy Avro container files under `path` (overwrite):
    * one file per partition, each written to a hidden `.tmp-` name and
    * renamed on task success. Parallelism and file sizing are the
    * frame's partitioning — repartition before writing to choose.
    * Returns the number of rows written (the write IS the action). */
  def writeAvro(df: DataFrame, path: String): Long = {
    val schema = df.schema
    val avroJson = avroSchemaFor(schema).toString // Schema isn't serializable pre-1.9; ship JSON
    val spark = df.sparkSession
    val getConf = org.apache.spark.sql.graftbridge.DatasetBridge
      .confFactory(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    val dts = schema.fields.map(_.dataType)
    val n = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val conf = getConf()
        val d = new org.apache.hadoop.fs.Path(path)
        val pfs = d.getFileSystem(conf)
        val as = new AvroSchema.Parser().parse(avroJson)
        // The destination name derives from the partition id ONLY: a task
        // retried after its first attempt already renamed (failure or
        // speculation between rename and task commit) re-publishes the
        // SAME name — overwrite, never a silent duplicate on read. The
        // .tmp name is attempt-unique so concurrent attempts can't clobber
        // each other's in-progress stream.
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val fileName = f"part-$pid%05d.avro"
        val tmp = new org.apache.hadoop.fs.Path(d, s".tmp-$attempt-$fileName")
        val dest = new org.apache.hadoop.fs.Path(d, fileName)
        val out = pfs.create(tmp, true)
        val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](as))
        writer.setCodec(CodecFactory.snappyCodec())
        writer.create(as, out)
        var rows = 0L
        try {
          it.foreach { row =>
            val rec = new GenericData.Record(as)
            var i = 0
            while (i < dts.length) {
              rec.put(i, toAvroValue(row.get(i), dts(i)))
              i += 1
            }
            writer.append(rec)
            rows += 1L
          }
        } finally writer.close()
        // A prior attempt's published file (same deterministic name, same
        // rows) is replaced, not joined by a twin.
        if (pfs.exists(dest)) pfs.delete(dest, false)
        if (!pfs.rename(tmp, dest))
          throw new IllegalStateException(s"writeAvro: publish rename failed for $dest")
        Iterator.single(rows)
      }
    }.sum()
    n.toLong
  }

  /** Structural writer-schema check: names, unwrapped Avro types, and
    * nullability must match the expectation field-for-field. */
  private def checkSchema(writerSchema: AvroSchema, expected: StructType, file: String): Unit = {
    val want = avroSchemaFor(expected)
    val got = writerSchema
    require(got.getType == AvroSchema.Type.RECORD,
      s"readAvro: $file is not a record container (got ${got.getType})")
    val wf = want.getFields.asScala
    val gf = got.getFields.asScala
    require(gf.map(_.name()) == wf.map(_.name()),
      s"readAvro: $file writer schema fields ${gf.map(_.name()).mkString(",")} " +
        s"!= expected ${wf.map(_.name()).mkString(",")}")
    wf.zip(gf).foreach { case (w, g) =>
      require(w.schema().toString == g.schema().toString,
        s"readAvro: $file field '${w.name()}' has writer type ${g.schema()} " +
          s"but the expected schema needs ${w.schema()} — a drifted producer " +
          "must fail loudly, not coerce")
    }
  }

  private def listAvroFiles(spark: SparkSession, path: String): Seq[String] = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".avro") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath.toString)
      .sorted
  }

  private def decodeFiles(spark: SparkSession, files: Seq[String],
      schema: StructType): DataFrame = {
    val getConf = org.apache.spark.sql.graftbridge.DatasetBridge
      .confFactory(spark.sparkContext.hadoopConfiguration)
    val dts = schema.fields.map(_.dataType)
    val expectedJson = schema.json
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { file =>
        val conf = getConf()
        val expected = DataType.fromJson(expectedJson).asInstanceOf[StructType]
        val p = new org.apache.hadoop.fs.Path(file)
        val in = p.getFileSystem(conf).open(p)
        val reader = new DataFileStream[GenericRecord](in,
          new GenericDatumReader[GenericRecord]())
        checkSchema(reader.getSchema, expected, file)
        // STREAM the container (a task never materializes a whole file —
        // third-party files aren't bounded by our writer's partitioning);
        // the task-completion listener closes the stream on success,
        // failure, or early abandonment alike. FAILFAST: any decode error
        // propagates through the iterator and fails the task.
        val rows = reader.iterator().asScala.map { rec =>
          Row.fromSeq(dts.indices.map(i =>
            fromAvroValue(rec.get(i), dts(i), s"$file#${expected.fields(i).name}")))
        }
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) {
          tc.addTaskCompletionListener[Unit](_ => reader.close())
          rows
        } else rows ++ { reader.close(); Iterator.empty } // driver-local use
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Read Avro container files under `path` against an EXPLICIT expected
    * schema — FAILFAST: schema drift, torn containers, and decode errors
    * all throw with the offending file named. */
  def readAvro(spark: SparkSession, path: String, schema: StructType): DataFrame =
    decodeFiles(spark, listAvroFiles(spark, path), schema)

  /** The quarantine flow at Avro's natural granularity (the container
    * FILE): split the directory into files [[readAvro]] would accept and
    * files it would reject (torn header, mid-stream corruption, schema
    * drift), by decoding each fully. Returns (readable, quarantined) —
    * feed the readable side to [[readAvro]], alert on the rest. Runs
    * distributed (one file per task); per-file cost is one full decode,
    * the price of promising the good side is ACTUALLY readable rather
    * than merely header-valid. */
  def quarantineAvroFiles(spark: SparkSession, path: String,
      schema: StructType): (Seq[String], Seq[String]) = {
    val files = listAvroFiles(spark, path)
    if (files.isEmpty) return (Nil, Nil)
    val getConf = org.apache.spark.sql.graftbridge.DatasetBridge
      .confFactory(spark.sparkContext.hadoopConfiguration)
    val expectedJson = schema.json
    val verdicts = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .map { file =>
        val ok =
          try {
            val conf = getConf()
            val expected = DataType.fromJson(expectedJson).asInstanceOf[StructType]
            val p = new org.apache.hadoop.fs.Path(file)
            val in = p.getFileSystem(conf).open(p)
            val reader = new DataFileStream[GenericRecord](in,
              new GenericDatumReader[GenericRecord]())
            try {
              checkSchema(reader.getSchema, expected, file)
              val it = reader.iterator()
              while (it.hasNext) it.next()
              true
            } finally reader.close()
          } catch { case _: Exception => false }
        (file, ok)
      }
      .collect() // file-count-sized — request metadata, not data
    val (good, bad) = verdicts.partition(_._2)
    (good.map(_._1).toSeq, bad.map(_._1).toSeq)
  }

  /** [[readAvro]] over an explicit file list — the second half of the
    * quarantine flow. */
  def readAvroFiles(spark: SparkSession, files: Seq[String],
      schema: StructType): DataFrame =
    decodeFiles(spark, files, schema)
}
