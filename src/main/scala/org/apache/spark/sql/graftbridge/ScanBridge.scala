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
import org.apache.spark.sql.types.{LongType, StructField, StructType}
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

  /** The parquet readers' magic row-index column: when a LongType field
    * with this name appears in the read schema, Spark's parquet readers
    * (vectorized AND parquet-mr, V2 factory included) populate it with the
    * row's position within its FILE, computed from row-group metadata — so
    * it stays correct under predicate pushdown, row-group/page skipping,
    * column pruning, and file splits. This is what makes merge-on-read
    * sound with filters; an ordinal counter is not. */
  val rowIndexField: StructField = StructField(
    org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
      .ROW_INDEX_TEMPORARY_COLUMN_NAME,
    // nullable like Spark's own generated-metadata field: the parquet
    // readers treat the (always-absent) column as missing-nullable, then
    // overwrite the vector with generated row indexes
    LongType, nullable = true)

  /** Data-file identity key used to match position-delete entries: the path
    * suffix after the table's `/data/` dir — unique within a table and
    * stable across relocation (original-url rewrite) and file:/ vs s3a://
    * qualification differences. */
  def morKey(path: String): String = {
    val i = path.lastIndexOf("/data/")
    if (i < 0) "" else path.substring(i + 6)
  }

  /** One EQUALITY-delete file's keys, catalyst-normalized, plus where its
    * key columns sit in the (widened) read schema and the commit sequence
    * that scopes it: rows of data files with `dataSeq < seq` whose key
    * tuple is in `keys` are deleted. Built once on the driver.
    *
    * Keys are stored as [[org.apache.spark.sql.catalyst.expressions.UnsafeRow]]s
    * (Externalizable, so the set ships to executors): UnsafeRow equality and
    * hashCode are byte-based, so BinaryType key components compare by VALUE —
    * a Seq[Array[Byte]] key would compare by reference and silently never
    * match — and the executor-side probe projects each data row into one
    * REUSED buffer, so the per-row hot loop allocates nothing. */
  final case class EqDeleteGroup(
      ordinals: Array[Int],
      types: Array[org.apache.spark.sql.types.DataType],
      seq: Long,
      keys: java.util.HashSet[org.apache.spark.sql.catalyst.expressions.UnsafeRow])
    extends Serializable

  /** Driver-side builder for [[EqDeleteGroup.keys]] entries: projects one
    * catalyst-converted key tuple into a copied UnsafeRow with the same
    * field order/types the executor probe projection uses, so the byte
    * layouts (and therefore hashCode/equals) line up exactly. */
  final class EqKeyBuilder(types: Array[org.apache.spark.sql.types.DataType]) {
    private val proj =
      org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(types)
    private val buf = new Array[Any](types.length)
    def build(values: Int => Any, isNull: Int => Boolean)
        : org.apache.spark.sql.catalyst.expressions.UnsafeRow = {
      var i = 0
      while (i < types.length) {
        buf(i) = if (isNull(i)) null else values(i)
        i += 1
      }
      proj(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(buf))
        .copy()
    }
  }

  /** Catalyst-normalize one EXTERNAL value (String → UTF8String, Timestamp
    * → micros, …) so equality-delete keys compare equal to what the parquet
    * readers produce in InternalRows. */
  def toCatalyst(dataType: org.apache.spark.sql.types.DataType): Any => Any =
    org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(dataType)

  /** MERGE-ON-READ input partition: one data file, the sorted row positions
    * deleted from it, and its commit sequence (for equality-delete
    * scoping). Positions ride in the partition (computed ONCE on the driver
    * by a distributed read of the delete files), so tasks never touch
    * delete files and each task serializes only its own positions. */
  final class MorFilePartition(
      private[graftbridge] val deleted: Array[Long],
      private[graftbridge] val dataSeq: Long,
      /** Requested metadata columns as per-file values, in projection
        * order: `_partition`/`_file` carry the string constant, `_pos` a
        * null (the reader wires it to the materialized row index). */
      private[graftbridge] val metaValues: Seq[(String, String)],
      private[graftbridge] val underlying: org.apache.spark.sql.execution.datasources.FilePartition)
    extends InputPartition {
    override def preferredLocations(): Array[String] = underlying.preferredLocations()
  }

  /** One [[MorFilePartition]] per data file. No splits: position-delete
    * grouping is per file (row index would stay valid under splits, but the
    * per-file delete arrays would be duplicated across split tasks). */
  def morPartitions(
      hadoopConf: Configuration,
      // (path, size, data sequence, metadata column values)
      files: Seq[(String, Long, Long, Seq[(String, String)])],
      deletesByKey: Map[String, Array[Long]]): Array[InputPartition] = {
    val fsCache = mutable.Map.empty[String, org.apache.hadoop.fs.FileSystem]
    files.zipWithIndex.map { case ((p, len, seq, metaValues), i) =>
      val raw = new Path(p)
      val fs = fsCache.getOrElseUpdate(
        Option(raw.toUri.getScheme).getOrElse(""), raw.getFileSystem(hadoopConf))
      val fp = org.apache.spark.sql.execution.datasources.FilePartition(i, Array(
        org.apache.spark.sql.execution.datasources.PartitionedFile(
          InternalRow.empty,
          org.apache.spark.paths.SparkPath.fromPath(fs.makeQualified(raw)),
          0, len, Array.empty, 0L, len)))
      new MorFilePartition(
        deletesByKey.getOrElse(morKey(p), Array.emptyLongArray), seq, metaValues, fp)
        : InputPartition
    }.toArray
  }

  /** MERGE-ON-READ reader factory. The scan appends [[rowIndexField]] to the
    * delegate's read schema; this factory filters each partition's deleted
    * positions against the materialized row index and projects the index
    * column back out, so deleted rows never leave the scan and downstream
    * operators see exactly `requiredSchema`. Partitions with no deletes keep
    * the COLUMNAR batch path (the trailing index vector is dropped from the
    * batch, zero copy); partitions with deletes read row-based — the same
    * cost shape as Iceberg's own MOR row reader. */
  def morReaderFactory(
      delegate: PartitionReaderFactory,
      requiredSchema: StructType,
      readWidth: Int, // total columns the delegate produces (incl. extras)
      allDeleteFree: Boolean,
      eqGroups: Array[EqDeleteGroup] = Array.empty): PartitionReaderFactory =
    new MorReaderFactory(delegate, requiredSchema, readWidth, allDeleteFree, eqGroups)

  private final class MorReaderFactory(
      delegate: PartitionReaderFactory,
      requiredSchema: StructType,
      readWidth: Int,
      allDeleteFree: Boolean,
      eqGroups: Array[EqDeleteGroup])
    extends PartitionReaderFactory {

    private def width = requiredSchema.length

    // Spark rejects scans mixing row-based and columnar partitions, so the
    // columnar path is all-or-nothing: only when NO scanned file has deletes
    // (e.g. pruning dropped every deleted-from file) does the whole scan
    // stay columnar.
    override def supportColumnarReads(p: InputPartition): Boolean = p match {
      case m: MorFilePartition =>
        allDeleteFree && delegate.supportColumnarReads(m.underlying)
      case other => allDeleteFree && delegate.supportColumnarReads(other)
    }

    override def createColumnarReader(
        p: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
      val m = p.asInstanceOf[MorFilePartition]
      require(m.deleted.isEmpty, "columnar merge-on-read requires a delete-free partition")
      val inner = delegate.createColumnarReader(m.underlying)
      new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
        override def next(): Boolean = inner.next()
        override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = {
          val b = inner.get()
          val cols: Array[org.apache.spark.sql.vectorized.ColumnVector] =
            Array.tabulate(width)(b.column)
          new org.apache.spark.sql.vectorized.ColumnarBatch(cols, b.numRows())
        }
        override def close(): Unit = inner.close()
      }
    }

    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val m = p.asInstanceOf[MorFilePartition]
      val deleted = m.deleted // sorted
      // equality deletes apply only to files committed strictly earlier
      val applicable = eqGroups.filter(_.seq > m.dataSeq)
      val inner = delegate.createReader(m.underlying)
      // the delegate row is requiredSchema + eq-key columns + row-index
      // (appended in that order); project the extras out — ordinals
      // 0..n-1 are the required fields. Requested metadata columns append
      // after: string constants per file, `_pos` wired to the row index.
      val idxOrdinal = readWidth - 1
      val exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
        requiredSchema.fields.zipWithIndex.map { case (f, i) =>
          org.apache.spark.sql.catalyst.expressions.BoundReference(
            i, f.dataType, f.nullable)
        }.toSeq ++
          m.metaValues.map {
            case ("_pos", _) =>
              org.apache.spark.sql.catalyst.expressions.BoundReference(
                idxOrdinal, LongType, nullable = true)
            case (_, v) =>
              org.apache.spark.sql.catalyst.expressions.Literal(
                if (v == null) null
                else org.apache.spark.unsafe.types.UTF8String.fromString(v),
                org.apache.spark.sql.types.StringType)
          }
      val project = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(exprs)

      // one probe projection per applicable group: bound to the group's key
      // ordinals in the widened row, writing into a REUSED UnsafeRow buffer —
      // `keys.contains(probe(r))` hashes/compares raw bytes, so the per-row
      // loop allocates nothing and BinaryType keys compare by value
      val probes: Array[org.apache.spark.sql.catalyst.expressions.UnsafeProjection] =
        applicable.map { g =>
          org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
            g.ordinals.zipWithIndex.map { case (o, j) =>
              org.apache.spark.sql.catalyst.expressions.BoundReference(
                o, g.types(j), nullable = true)
            }.toSeq)
        }
      def eqDeleted(r: InternalRow): Boolean = {
        var i = 0
        while (i < applicable.length) {
          if (applicable(i).keys.contains(probes(i)(r))) return true
          i += 1
        }
        false
      }

      new PartitionReader[InternalRow] {
        private var current: InternalRow = _
        override def next(): Boolean = {
          while (inner.next()) {
            val r = inner.get()
            val posLive = deleted.isEmpty ||
              java.util.Arrays.binarySearch(deleted, r.getLong(idxOrdinal)) < 0
            if (posLive && (applicable.isEmpty || !eqDeleted(r))) {
              current = project(r)
              return true
            }
          }
          false
        }
        override def get(): InternalRow = current
        override def close(): Unit = inner.close()
      }
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
