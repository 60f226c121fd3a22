package org.apache.spark.sql.graftbridge

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.execution.datasources.{PartitionSpec, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Bridges to Spark's `private[sql]` scan machinery (same technique as
  * ColumnBridge): lets the graft-iceberg DataSourceV2 connector plan scans
  * over a metadata-known file list and delegate execution to Spark's
  * vectorized, whole-stage-codegen'd parquet batch reader. */
object ScanBridge {

  /** A file index fed straight from Iceberg manifest metadata: paths and
    * sizes are already known, so scan planning performs ZERO filesystem
    * listing or stat calls — the property that makes Iceberg planning O(files
    * in metadata) instead of O(directory tree), essential at 100 TB. */
  final class KnownFilesIndex(
      spark: SparkSession,
      files: Seq[(String, Long)],
      schema: StructType)
    extends PartitioningAwareFileIndex(spark, Map.empty, Some(schema)) {

    // Qualify against the filesystem (file:/…, s3a://…): the parent index
    // looks paths up by their fully-qualified form. One FS handle per
    // distinct scheme — no per-file I/O, makeQualified is pure URI work.
    private val statuses: Seq[FileStatus] = {
      val fsCache = mutable.Map.empty[String, org.apache.hadoop.fs.FileSystem]
      files.map { case (p, len) =>
        val raw = new Path(p)
        val fs = fsCache.getOrElseUpdate(
          Option(raw.toUri.getScheme).getOrElse(""), raw.getFileSystem(hadoopConf))
        new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, fs.makeQualified(raw))
      }
    }

    override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec
    override def rootPaths: Seq[Path] = statuses.map(_.getPath)
    override def leafFiles: mutable.LinkedHashMap[Path, FileStatus] = {
      val m = mutable.LinkedHashMap.empty[Path, FileStatus]
      statuses.foreach(s => m(s.getPath) = s)
      m
    }
    override def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
      statuses.groupBy(_.getPath.getParent).map { case (d, fs) => d -> fs.toArray }
    override def refresh(): Unit = ()
    override def sizeInBytes: Long = files.map(_._2).sum
  }

  /** An input partition pinned to ONE partition-value tuple: all files of
    * that value, plus the key row Spark's key-grouped join machinery reads
    * through [[HasPartitionKey]]. No splitting — storage-partitioned joins
    * need the whole value co-located. */
  final class KeyedFilePartition(
      key: InternalRow,
      private[graftbridge] val underlying: org.apache.spark.sql.execution.datasources.FilePartition)
    extends InputPartition with HasPartitionKey {
    override def partitionKey(): InternalRow = key
    override def preferredLocations(): Array[String] = underlying.preferredLocations()
  }

  /** One [[KeyedFilePartition]] over a known file list (no listing). */
  def keyedPartition(
      spark: SparkSession,
      hadoopConf: Configuration,
      index: Int,
      key: InternalRow,
      files: Seq[(String, Long)]): InputPartition = {
    val fsCache = mutable.Map.empty[String, org.apache.hadoop.fs.FileSystem]
    val parts = files.map { case (p, len) =>
      val raw = new Path(p)
      val fs = fsCache.getOrElseUpdate(
        Option(raw.toUri.getScheme).getOrElse(""), raw.getFileSystem(hadoopConf))
      org.apache.spark.sql.execution.datasources.PartitionedFile(
        InternalRow.empty,
        org.apache.spark.paths.SparkPath.fromPath(fs.makeQualified(raw)),
        0, len, Array.empty, 0L, len)
    }
    new KeyedFilePartition(key,
      org.apache.spark.sql.execution.datasources.FilePartition(index, parts.toArray))
  }

  /** Reader factory that unwraps [[KeyedFilePartition]] before delegating to
    * the vectorized parquet factory (which pattern-matches on FilePartition). */
  def unwrapKeyedFactory(delegate: PartitionReaderFactory): PartitionReaderFactory =
    new UnwrapKeyedReaderFactory(delegate)

  private final class UnwrapKeyedReaderFactory(delegate: PartitionReaderFactory)
    extends PartitionReaderFactory {
    private def u(p: InputPartition): InputPartition = p match {
      case k: KeyedFilePartition => k.underlying
      case other => other
    }
    override def createReader(p: InputPartition): PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
      delegate.createReader(u(p))
    override def createColumnarReader(p: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
      delegate.createColumnarReader(u(p))
    override def supportColumnarReads(p: InputPartition): Boolean =
      delegate.supportColumnarReads(u(p))
  }

  /** One FilePartition per FILE (no grouping, no splits): merge-on-read
    * needs each task to know exactly which data file its rows come from, so
    * it can select that file's deleted positions. */
  def perFilePartitions(
      spark: SparkSession,
      hadoopConf: Configuration,
      files: Seq[(String, Long)]): Array[org.apache.spark.sql.connector.read.InputPartition] = {
    val fsCache = mutable.Map.empty[String, org.apache.hadoop.fs.FileSystem]
    files.zipWithIndex.map { case ((p, len), i) =>
      val raw = new Path(p)
      val fs = fsCache.getOrElseUpdate(
        Option(raw.toUri.getScheme).getOrElse(""), raw.getFileSystem(hadoopConf))
      org.apache.spark.sql.execution.datasources.FilePartition(i, Array(
        org.apache.spark.sql.execution.datasources.PartitionedFile(
          InternalRow.empty,
          org.apache.spark.paths.SparkPath.fromPath(fs.makeQualified(raw)),
          0, len, Array.empty, 0L, len))): org.apache.spark.sql.connector.read.InputPartition
    }.toArray
  }

  /** MERGE-ON-READ reader factory: wraps the parquet factory so each task
    * (one WHOLE data file each, see [[perFilePartitions]]) loads the
    * positions deleted from ITS file out of the snapshot's position-delete
    * parquets and skips those rows by ordinal. The scan feeds the delegate
    * NO parquet-level filters, so rows stream in exact file order and the
    * ordinal IS the Iceberg row position — predicate evaluation happens
    * above the scan via the residual filters (sound-not-exact contract,
    * unchanged). Row-based reads only; same cost shape as Iceberg's own MOR
    * row reader. Delete files are read ONCE PER TASK (executor-side,
    * parquet-mr): fine while delete files are a small fraction of the
    * table — compaction folds them away (Maintenance). */
  def morReaderFactory(
      delegate: PartitionReaderFactory,
      deleteFiles: Seq[String],
      hadoopConf: Configuration): PartitionReaderFactory =
    new MorReaderFactory(delegate, deleteFiles,
      new org.apache.spark.util.SerializableConfiguration(hadoopConf))

  private def morKey(path: String): String = {
    val i = path.lastIndexOf("/data/")
    if (i < 0) "" else path.substring(i + 6)
  }

  private final class MorReaderFactory(
      delegate: PartitionReaderFactory,
      deleteFiles: Seq[String],
      conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {

    override def supportColumnarReads(p: org.apache.spark.sql.connector.read.InputPartition): Boolean = false

    override def createReader(
        p: org.apache.spark.sql.connector.read.InputPartition): org.apache.spark.sql.connector.read.PartitionReader[InternalRow] = {
      val fp = p.asInstanceOf[org.apache.spark.sql.execution.datasources.FilePartition]
      require(fp.files.length == 1, "merge-on-read partitions hold one file")
      val key = morKey(fp.files.head.toPath.toString)
      val deleted = loadPositions(key)
      val inner = delegate.createReader(p)
      new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
        private var pos = -1L // ordinal in file order == Iceberg row position
        override def next(): Boolean = {
          while (inner.next()) {
            pos += 1
            if (deleted.isEmpty || !deleted.contains(pos)) return true
          }
          false
        }
        override def get(): InternalRow = inner.get()
        override def close(): Unit = inner.close()
      }
    }

    /** Positions deleted from the data file `key`, read straight from the
      * snapshot's position-delete parquets with parquet-mr. */
    private def loadPositions(key: String): java.util.HashSet[java.lang.Long] = {
      val set = new java.util.HashSet[java.lang.Long]()
      deleteFiles.foreach { df =>
        val reader = org.apache.parquet.hadoop.ParquetReader
          .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), new Path(df))
          .withConf(conf.value)
          .build()
        try {
          var g = reader.read()
          while (g != null) {
            if (morKey(g.getBinary("file_path", 0).toStringUsingUTF8) == key)
              set.add(g.getLong("pos", 0))
            g = reader.read()
          }
        } finally reader.close()
      }
      set
    }
  }

  /** Build Spark's native parquet DSv2 scan (columnar batch reader, filter
    * pushdown to row groups/pages, vectorized decode) over a known file list.
    * `dataSchema` is the Iceberg snapshot schema: files missing evolved-in
    * columns read back as nulls via parquet schema clipping. */
  def parquetScan(
      spark: SparkSession,
      hadoopConf: Configuration,
      files: Seq[(String, Long)],
      dataSchema: StructType,
      readDataSchema: StructType,
      pushedFilters: Array[Filter],
      options: CaseInsensitiveStringMap): Scan = {
    val index = new KnownFilesIndex(spark, files, dataSchema)
    ParquetScan(spark, hadoopConf, index, dataSchema, readDataSchema,
      new StructType(), pushedFilters, options)
  }
}
