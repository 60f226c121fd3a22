package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.iceberg.{IcebergTable, Pruning}

/** Spark SQL data source for Iceberg tables:
  *
  * {{{
  *   spark.read.format("graft-iceberg")
  *     .option("original-url", "...")   // path rewrite, ice.py original_url
  *     .option("version", "4")          // time travel by metadata version
  *     .option("snapshot-id", "123")    // … by snapshot id
  *     .option("rel", "-1")             // … relative to latest
  *     .option("as-of-ms", "169…")      // … latest snapshot at/before timestamp
  *     .load("/path/to/table")
  * }}}
  *
  * Implemented against the stable sources API (`PrunedFilteredScan`): Spark
  * pushes required columns and translatable predicates here; the pruning
  * engine drops files/manifests from metadata stats, and the surviving files
  * are scanned by Spark's vectorized parquet reader (row-group pushdown and
  * column pruning still apply inside the scan). Statistics from manifests
  * feed `sizeInBytes` so Catalyst can pick broadcast joins.
  */
class GraftIcebergSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-iceberg"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("path option is required"))
    val spark = sqlContext.sparkSession
    var table = IcebergTable.load(spark, path,
      originalUrl = parameters.get("original-url"),
      version = parameters.get("version").map(_.toInt))
    parameters.get("snapshot-id").foreach(id => table = table.atSnapshot(id.toLong))
    parameters.get("rel").foreach(r => table = table.snapshotRelative(r.toInt))
    parameters.get("as-of-ms").foreach(ts => table = table.asOfTimestamp(ts.toLong))
    GraftIcebergRelation(table, sqlContext)
  }
}

final case class GraftIcebergRelation(table: IcebergTable, sqlContext: SQLContext)
    extends BaseRelation with PrunedFilteredScan {

  override def schema: StructType = table.schema

  /** Manifest-statistics total size → lets Catalyst broadcast small tables. */
  override def sizeInBytes: Long = {
    val s = table.liveFiles().map(_.fileSizeInBytes).sum
    if (s > 0) s else super.sizeInBytes
  }

  /** Filters this relation handles exactly (row-level too, via the residual
    * Column filter applied in readPred) — Spark won't re-evaluate them. */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters.filter(f => Pruning.fromSparkFilter(f).isEmpty)

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val pred = filters.flatMap(Pruning.fromSparkFilter)
      .reduceOption(Pruning.And.apply).getOrElse(Pruning.AlwaysTrue)
    val df = table.readPred(pred, requiredColumns.toSeq, failOnEmpty = false)
    df.rdd
  }
}
