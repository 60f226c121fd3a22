package org.apache.spark.sql.graftbridge

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Distributed scan over foreign-written AVRO data files, built directly on
  * avro-core (the classpath has no spark-avro module — only the Avro jars
  * the Iceberg metadata plane already uses). One input partition per file,
  * row-based GenericRecord decode, BY-NAME column resolution against the
  * requested read schema (absent fields read back null, matching the
  * engine's schema-evolution contract for foreign files).
  *
  * This is an interop path, not a hot path: this engine writes parquet, so
  * Avro data files only enter a table via `addFiles` import from an external
  * writer. Filter pushdown is unnecessary — the connector's residual-filter
  * contract re-applies every predicate in Catalyst above the scan. */
object AvroScanBridge {

  def avroBatch(spark: SparkSession, hadoopConf: Configuration,
      files: Seq[(String, Long)], readSchema: StructType): Batch = {
    val conf = new SerializableConfiguration(hadoopConf)
    new Batch {
      override def planInputPartitions(): Array[InputPartition] =
        files.map { case (p, _) => AvroFilePartition(p): InputPartition }.toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new AvroReaderFactory(conf, readSchema)
    }
  }

  private final case class AvroFilePartition(path: String) extends InputPartition

  private final class AvroReaderFactory(
      conf: SerializableConfiguration,
      readSchema: StructType) extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val path = partition.asInstanceOf[AvroFilePartition].path
      new PartitionReader[InternalRow] {
        private val input =
          new org.apache.avro.mapred.FsInput(new Path(path), conf.value)
        private val reader =
          DataFileReader.openReader(input, new GenericDatumReader[GenericRecord]())
        private var row: InternalRow = _
        override def next(): Boolean =
          if (reader.hasNext) { row = convertRecord(reader.next(), readSchema); true }
          else false
        override def get(): InternalRow = row
        override def close(): Unit = reader.close()
      }
    }
  }

  private def convertRecord(rec: GenericRecord, schema: StructType): InternalRow = {
    val out = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema.fields(i)
      val has = rec.getSchema.getField(f.name) != null
      out(i) = if (has) convert(rec.get(f.name), f.dataType) else null
      i += 1
    }
    new GenericInternalRow(out)
  }

  /** Avro runtime value → Catalyst internal value. Timestamps follow the
    * Iceberg Avro spec (timestamp-micros); dates are epoch-day ints — both
    * identical to Catalyst's internal representation, so they pass through
    * as numbers. */
  private def convert(v: Any, dt: DataType): Any = v match {
    case null => null
    case _ => dt match {
      case StringType => UTF8String.fromString(v.toString)
      case IntegerType | DateType => v.asInstanceOf[Number].intValue()
      case LongType | TimestampType | TimestampNTZType =>
        v.asInstanceOf[Number].longValue()
      case FloatType => v.asInstanceOf[Number].floatValue()
      case DoubleType => v.asInstanceOf[Number].doubleValue()
      case BooleanType => v
      case BinaryType => v match {
        case b: java.nio.ByteBuffer =>
          val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
        case f: org.apache.avro.generic.GenericFixed => f.bytes().clone()
        case a: Array[Byte] => a
      }
      case d: DecimalType =>
        val bytes = v match {
          case b: java.nio.ByteBuffer =>
            val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
          case f: org.apache.avro.generic.GenericFixed => f.bytes()
        }
        Decimal(BigDecimal(new java.math.BigInteger(bytes), d.scale), d.precision, d.scale)
      case st: StructType => convertRecord(v.asInstanceOf[GenericRecord], st)
      case ArrayType(et, _) =>
        val it = v.asInstanceOf[java.util.Collection[Any]].iterator()
        val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
        while (it.hasNext) buf += convert(it.next(), et)
        new GenericArrayData(buf.toArray)
      case MapType(kt, vt, _) =>
        val m = v.asInstanceOf[java.util.Map[Any, Any]]
        val keys = scala.collection.mutable.ArrayBuffer.empty[Any]
        val vals = scala.collection.mutable.ArrayBuffer.empty[Any]
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          keys += convert(e.getKey, kt)
          vals += convert(e.getValue, vt)
        }
        ArrayBasedMapData(keys.toArray, vals.toArray)
      case other =>
        throw new UnsupportedOperationException(
          s"unsupported Avro data-file type $other (value class ${v.getClass})")
    }
  }
}
