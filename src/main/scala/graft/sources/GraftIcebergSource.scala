package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.graftbridge.ScanBridge
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.iceberg.{IcebergTable, IcebergWriter, Pruning}

/** Spark DataSourceV2 connector for Iceberg tables:
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
  * Architecture (replaces the round-1 V1 `PrunedFilteredScan`, whose
  * `df.rdd` bridge severed whole-stage codegen):
  *
  *  - `TableProvider` → [[GraftIcebergV2Table]] resolves the snapshot once
  *    and memoizes the live-file walk;
  *  - [[GraftIcebergScanBuilder]] receives pushed filters + required columns
  *    from Catalyst, prunes manifests/files from Iceberg statistics, and
  *    plans Spark's native vectorized parquet batch scan over the survivors
  *    (columnar read, whole-stage codegen, row-group/page pushdown intact);
  *  - the scan reports Iceberg-manifest statistics (exact bytes + row
  *    counts) so Catalyst can pick broadcast joins without touching data.
  *
  * All pushed filters are also returned as residuals, so Spark re-applies
  * them row-level after the scan (same contract as Spark's own file
  * sources): metadata pruning only has to be sound, never exact.
  */
class GraftIcebergSource extends TableProvider with CreatableRelationProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-iceberg"

  override def supportsExternalMetadata(): Boolean = true

  /** DataFrame WRITE API (`df.write.format("graft-iceberg").save(path)`):
    * the V2 table exposes no BATCH_WRITE, so Spark falls back here and the
    * whole battle-tested writer (stats, hidden partitioning, optimistic
    * commit) is reused. Append creates the table on first write; Overwrite
    * replaces all rows in one snapshot. Partitioning via
    * `.option("partition-spec", "cat:identity,k:bucket[4]")` (partitionBy
    * columns don't flow through the V1 write API). */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("path option is required"))
    val spark = sqlContext.sparkSession
    val exists = IcebergTable.versionHint(path,
      spark.sessionState.newHadoopConf()) > 0
    def create(): Unit = {
      val partitions = parameters.get("partition-spec").toSeq
        .flatMap(_.split(',')).filter(_.nonEmpty)
        .map { p =>
          val Array(src, tr) = p.split(':')
          (src.trim, tr.trim)
        }
      IcebergWriter.createTable(spark, path, data.schema, partitions)
    }
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalArgumentException(s"table already exists: $path")
      case SaveMode.Ignore if exists => ()
      case SaveMode.Overwrite =>
        if (!exists) create()
        IcebergWriter.overwrite(spark, path, data)
      case _ => // Append / first write
        if (!exists) create()
        IcebergWriter.append(spark, path, data)
    }
    // a relation over the committed table (Spark may introspect its schema)
    val ctx = sqlContext
    new BaseRelation {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = IcebergTable.load(spark, path).schema
    }
  }

  // inferSchema + getTable receive the same options on one provider
  // instance; cache the metadata load so the table JSON is read once.
  @volatile private var cached: (CaseInsensitiveStringMap, IcebergTable) = _

  private def loadTable(options: CaseInsensitiveStringMap): IcebergTable = {
    val c = cached
    if (c != null && c._1 == options) return c._2
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("path option is required"))
    val spark = SparkSession.active
    var table = IcebergTable.load(spark, path,
      originalUrl = Option(options.get("original-url")),
      version = Option(options.get("version")).map(_.toInt))
    Option(options.get("snapshot-id")).foreach(id => table = table.atSnapshot(id.toLong))
    Option(options.get("rel")).foreach(r => table = table.snapshotRelative(r.toInt))
    Option(options.get("as-of-ms")).foreach(ts => table = table.asOfTimestamp(ts.toLong))
    cached = (options, table)
    table
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    loadTable(options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    try new GraftIcebergV2Table(loadTable(new CaseInsensitiveStringMap(properties)))
    catch {
      // the WRITE path probes getTable before the table exists (first
      // append creates it): hand back a capability-less placeholder so
      // Spark falls through to the V1 CreatableRelationProvider write
      case _: java.io.FileNotFoundException => new Table {
        override def name(): String = "graft-iceberg (uncreated)"
        override def schema(): StructType = schema
        override def capabilities(): util.Set[TableCapability] =
          util.Collections.emptySet()
      }
    }
}

final class GraftIcebergV2Table(val table: IcebergTable) extends Table with SupportsRead {

  override def name(): String = s"graft-iceberg ${table.url}"

  override def schema(): StructType = table.schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  /** Memoized unfiltered live-file walk: statistics estimation and
    * unfiltered scans share one manifest pass per table instance. */
  lazy val allLiveFiles: Seq[graft.iceberg.Manifests.DataFileInfo] = table.liveFiles()

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftIcebergScanBuilder(this, options)
}

final class GraftIcebergScanBuilder(tbl: GraftIcebergV2Table,
    options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var requiredSchema: StructType = tbl.schema()

  /** Filters convertible to [[Pruning.IcePredicate]] drive metadata pruning
    * and parquet row-group pushdown; ALL filters are returned as residuals
    * for exact row-level evaluation by Spark (sound-not-exact contract). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => Pruning.fromSparkFilter(f).isDefined)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(required: StructType): Unit = requiredSchema = required

  override def build(): Scan = {
    // a raw batch scan cannot apply v2 merge-on-read; refuse loudly rather
    // than silently resurrecting deleted rows (table API reads handle MOR)
    if (tbl.table.positionDeleteFiles.nonEmpty)
      throw new UnsupportedOperationException(
        "table has v2 position deletes; read it via IcebergTable.read() " +
          "(merge-on-read) — the graft-iceberg batch source serves append-only snapshots")
    val pred = pushed.flatMap(Pruning.fromSparkFilter)
      .reduceOption(Pruning.And.apply).getOrElse(Pruning.AlwaysTrue)
    val files =
      if (pred == Pruning.AlwaysTrue) tbl.allLiveFiles
      else tbl.table.prunedFiles(pred)
    new GraftIcebergScan(tbl.table, files, requiredSchema, pushed, options)
  }
}

/** One Iceberg snapshot scan: delegates execution to Spark's vectorized
  * parquet batch reader over the metadata-pruned file list, and reports
  * exact manifest statistics (rows + bytes) to the optimizer. */
final class GraftIcebergScan(
    table: IcebergTable,
    files: Seq[graft.iceberg.Manifests.DataFileInfo],
    requiredSchema: StructType,
    pushedFilters: Array[Filter],
    options: CaseInsensitiveStringMap)
  extends Scan with Batch with SupportsReportStatistics {

  private lazy val delegate: Batch = {
    val spark = SparkSession.active
    val paths = files.map(f => (table.resolvePath(f.filePath), f.fileSizeInBytes))
    ScanBridge.parquetScan(spark, spark.sessionState.newHadoopConf(), paths,
      table.schema, requiredSchema, pushedFilters, options).toBatch
  }

  override def readSchema(): StructType = requiredSchema

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = delegate.planInputPartitions()

  override def createReaderFactory(): PartitionReaderFactory = delegate.createReaderFactory()

  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = files.map(_.fileSizeInBytes).sum
    private val rows = files.map(_.recordCount).sum
    override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(bytes)
    override def numRows(): util.OptionalLong = util.OptionalLong.of(rows)
  }

  override def description(): String = {
    val filterStr = pushedFilters.mkString(", ")
    s"graft-iceberg ${table.url} snapshot=${table.currentSnapshot.snapshotId} " +
      s"files=${files.size}, PushedFilters: [$filterStr]"
  }
}
