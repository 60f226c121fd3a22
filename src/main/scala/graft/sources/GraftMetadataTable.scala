package graft.sources

import java.util

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Read-only DSv2 table serving an Iceberg METADATA relation — the SQL
  * surface of `SELECT * FROM cat.db.tbl.snapshots|files|manifests|
  * partitions|…` (Iceberg's metadata tables).
  *
  * Two planning boundaries, chosen per relation:
  *  - metadata-scale relations (snapshots, files, manifests, …) plan as a
  *    [[LocalScan]]: the rows come from driver-side manifest/metadata
  *    state, which is the right execution boundary for relations bounded
  *    by file/snapshot counts — the same driver-plans/driver-serves split
  *    iceberg-java's metadata tables use.
  *  - DATA-scale relations (`position_deletes`, whose row count is the
  *    table's total deleted-row volume) plan through the [[V1Scan]]
  *    bridge: the backing DataFrame's own distributed plan becomes the
  *    scan's RDD, so not one deleted position ever lands on the driver.
  *
  * The DataFrame is built lazily per scan so every query sees the table's
  * CURRENT state. */
final class GraftMetadataTable(df: () => DataFrame, tableName: String,
    distributed: Boolean = false)
  extends Table with SupportsRead {

  override def name(): String = tableName

  override def schema(): StructType = df().schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = {
        val resolved = df()
        if (distributed) new V1Scan {
          override def readSchema(): StructType = resolved.schema
          override def toV1TableScan[T <: BaseRelation with TableScan](
              context: SQLContext): T =
            new BaseRelation with TableScan {
              override def sqlContext: SQLContext = context
              override def schema: StructType = resolved.schema
              override def buildScan(): RDD[Row] = resolved.rdd
            }.asInstanceOf[T]
        } else new LocalScan {
          override def rows(): Array[InternalRow] =
            resolved.queryExecution.executedPlan.executeCollect()
              .map(_.copy(): InternalRow)
          override def readSchema(): StructType = resolved.schema
        }
      }
    }
}
