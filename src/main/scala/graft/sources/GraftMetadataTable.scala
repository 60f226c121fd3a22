package graft.sources

import java.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Read-only DSv2 table serving an Iceberg METADATA relation — the SQL
  * surface of `SELECT * FROM cat.db.tbl.snapshots|files|manifests|
  * partitions` (Iceberg's metadata tables). Planned as a [[LocalScan]]:
  * the rows come from driver-side manifest/metadata state, which is the
  * right execution boundary for metadata-scale relations — the same
  * driver-plans/driver-serves split iceberg-java's metadata tables use.
  * The DataFrame is built lazily per scan so every query sees the
  * table's CURRENT state. */
final class GraftMetadataTable(df: () => DataFrame, tableName: String)
  extends Table with SupportsRead {

  override def name(): String = tableName

  override def schema(): StructType = df().schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = {
        val resolved = df()
        new LocalScan {
          override def rows(): Array[InternalRow] =
            resolved.queryExecution.executedPlan.executeCollect()
              .map(_.copy(): InternalRow)
          override def readSchema(): StructType = resolved.schema
        }
      }
    }
}
