package org.apache.spark.sql.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types.StructType

/** Bridge to Spark's `private[sql]` parquet WRITE machinery: builds
  * parquet-mr writers that consume Catalyst InternalRows directly via
  * [[ParquetWriteSupport]] — the executor-side engine of the native
  * DataSourceV2 write path (no DataFrame re-dispatch on the driver, one
  * open writer per partition value per task). */
object WriteBridge {

  /** A parquet writer for InternalRows of `schema`. Field ids in the
    * schema's (nested) metadata are stamped into the file; timestamps are
    * written as Iceberg-compatible INT64 micros. */
  def parquetRowWriter(path: Path, schema: StructType,
      conf: Configuration): ParquetWriter[InternalRow] = {
    val c = new Configuration(conf)
    ParquetWriteSupport.setSchema(schema, c)
    // the keys ParquetFileFormat.prepareWrite normally stages for tasks
    c.set("spark.sql.parquet.writeLegacyFormat", "false")
    c.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    c.set("spark.sql.parquet.fieldId.write.enabled", "true")
    c.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    c.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    c.set("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
    c.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    c.set("spark.sql.caseSensitive", "false")
    new RowWriterBuilder(path)
      .withConf(c)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }

  private final class RowWriterBuilder(path: Path)
    extends ParquetWriter.Builder[InternalRow, RowWriterBuilder](path) {
    override def self(): RowWriterBuilder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport().asInstanceOf[WriteSupport[InternalRow]]
  }
}
