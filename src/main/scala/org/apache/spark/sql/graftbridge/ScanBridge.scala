package org.apache.spark.sql.graftbridge

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.execution.datasources.{PartitionSpec, PartitioningAwareFileIndex}
import org.apache.spark.sql.connector.read.Batch
import org.apache.spark.sql.execution.datasources.v2.orc.OrcScan
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
    * qualification differences. Externally-located files (no `/data/`
    * segment) fall back to their full authority+path — scheme-stripped so
    * `file:///x`, `file:/x` and `/x` agree — instead of collapsing to one
    * shared key, which would cross-match deletes between distinct files. */
  /** Task-side MOR telemetry (per-JVM, cumulative): data-parquet reader
    * opens vs partitions answered EMPTY from delete metadata alone. A
    * fanned-out CDC selection partition whose computed selection is empty
    * must cost one cached delete-file read, never a data-file open —
    * specs pin the skip by watching these counters. */
  val morDataFileOpens = new java.util.concurrent.atomic.AtomicLong(0)
  val morEmptySelectionSkips = new java.util.concurrent.atomic.AtomicLong(0)

  def morKey(path: String): String = {
    val i = path.lastIndexOf("/data/")
    if (i >= 0) path.substring(i + 6)
    else {
      val u = new org.apache.hadoop.fs.Path(path).toUri
      val auth = Option(u.getAuthority).getOrElse("")
      auth + u.getPath
    }
  }

  /** Column form of [[morKey]] for delete-bookkeeping reads. A UDF, so both
    * sides of every key comparison share ONE definition — acceptable here
    * because these scans touch only delete files (bounded by the driver
    * delete cap), never the data plane. */
  def morKeyColumn(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udf((p: String) => morKey(p)).apply(c)

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
    * delete files and each task serializes only its own positions.
    *
    * CDC extensions (all default-off, used by the changelog stream):
    * `selectPositions` INVERTS the position filter — emit ONLY rows at
    * these positions (the rows a position-delete commit removed);
    * `selectEqGroups` emits only rows matching at least one group (the rows
    * an equality-delete commit removed); `ownEqGroups` overrides the
    * factory-level exclusion groups so each partition can carry its own
    * parent-snapshot visibility. */
  final class MorFilePartition(
      private[graftbridge] val deleted: Array[Long],
      private[graftbridge] val dataSeq: Long,
      /** Requested metadata columns as per-file values, in projection
        * order: `_partition`/`_file` carry the string constant, `_pos` a
        * null (the reader wires it to the materialized row index), and
        * `_commit_snapshot_id` a long rendered as a string. */
      private[graftbridge] val metaValues: Seq[(String, String)],
      private[graftbridge] val underlying: org.apache.spark.sql.execution.datasources.FilePartition,
      private[graftbridge] val selectPositions: Array[Long] = null,
      private[graftbridge] val ownEqGroups: Array[EqDeleteGroup] = null,
      private[graftbridge] val selectEqGroups: Array[EqDeleteGroup] = null,
      /** Non-null = DISTRIBUTED delete mode: the position-delete files that
        * may overlap this data file; the TASK loads its own positions via
        * [[DeleteLoader]] and `deleted` is ignored. Engaged above the
        * driver delete cap, where shipping positions from the driver would
        * not fit. */
      private[graftbridge] val posDeleteFiles: Array[String] = null,
      /** Non-null = distributed SELECTION mode (CDC above the driver cap):
        * the task computes `selectPositions` itself as the positions in
        * these delete files minus those in [[selectMinusDeleteFiles]]
        * (the parent-visible ones) — the same subtract the driver would
        * have shipped, without materializing a heavy-churn commit's
        * positions driver-side. */
      private[graftbridge] val selectPosDeleteFiles: Array[String] = null,
      private[graftbridge] val selectMinusDeleteFiles: Array[String] = null,
      /** Non-null = distributed EQUALITY state (CDC above the driver cap):
        * metadata-only specs whose key sets each TASK loads itself via
        * [[DeleteLoader.eqGroupFor]] — exclusion (visibility) and selection
        * counterparts of [[ownEqGroups]] / [[selectEqGroups]]. */
      private[graftbridge] val ownEqSpecs: Array[DeleteLoader.EqDeleteFileSpec] = null,
      private[graftbridge] val selectEqSpecs: Array[DeleteLoader.EqDeleteFileSpec] = null)
    extends InputPartition {
    override def preferredLocations(): Array[String] = underlying.preferredLocations()
  }

  /** One CDC partition over one data file — see [[MorFilePartition]]'s CDC
    * extensions for the semantics of the three optional filters. */
  def cdcPartition(
      hadoopConf: Configuration,
      index: Int,
      path: String,
      len: Long,
      dataSeq: Long,
      metaValues: Seq[(String, String)],
      deleted: Array[Long],
      selectPositions: Array[Long],
      ownEqGroups: Array[EqDeleteGroup],
      selectEqGroups: Array[EqDeleteGroup],
      posDeleteFiles: Array[String] = null,
      selectPosDeleteFiles: Array[String] = null,
      selectMinusDeleteFiles: Array[String] = null,
      ownEqSpecs: Array[DeleteLoader.EqDeleteFileSpec] = null,
      selectEqSpecs: Array[DeleteLoader.EqDeleteFileSpec] = null): InputPartition = {
    val raw = new Path(path)
    val fs = raw.getFileSystem(hadoopConf)
    val fp = org.apache.spark.sql.execution.datasources.FilePartition(index, Array(
      org.apache.spark.sql.execution.datasources.PartitionedFile(
        InternalRow.empty,
        org.apache.spark.paths.SparkPath.fromPath(fs.makeQualified(raw)),
        0, len, Array.empty, 0L, len)))
    new MorFilePartition(deleted, dataSeq, metaValues, fp,
      selectPositions, ownEqGroups, selectEqGroups,
      posDeleteFiles, selectPosDeleteFiles, selectMinusDeleteFiles,
      ownEqSpecs, selectEqSpecs)
  }

  /** One [[MorFilePartition]] per data file. No splits: position-delete
    * grouping is per file (row index would stay valid under splits, but the
    * per-file delete arrays would be duplicated across split tasks). */
  def morPartitions(
      hadoopConf: Configuration,
      // (path, size, data sequence, metadata column values)
      files: Seq[(String, Long, Long, Seq[(String, String)])],
      deletesByKey: Map[String, Array[Long]],
      /** Non-null = distributed delete mode: per data file, the overlapping
        * position-delete files each TASK should read (see
        * [[MorFilePartition.posDeleteFiles]]); `deletesByKey` is unused. */
      perTaskDeleteFiles: Seq[Array[String]] = null): Array[InputPartition] = {
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
        if (perTaskDeleteFiles != null) Array.emptyLongArray
        else deletesByKey.getOrElse(morKey(p), Array.emptyLongArray),
        seq, metaValues, fp,
        posDeleteFiles = if (perTaskDeleteFiles == null) null else perTaskDeleteFiles(i))
        : InputPartition
    }.toArray
  }

  /** MERGE-ON-READ reader factory. The scan appends [[rowIndexField]] to the
    * delegate's read schema; this factory filters each partition's deleted
    * positions against the materialized row index and projects the index
    * column back out, so deleted rows never leave the scan and downstream
    * operators see exactly `requiredSchema`.
    *
    * COLUMNAR under position deletes: delete-free partitions pass batches
    * through (the trailing index vector dropped, zero copy); deleted-from
    * partitions wrap each batch's vectors in a SELECTION view that skips
    * deleted row indexes — the whole scan stays vectorized instead of one
    * deleted file de-vectorizing everything. Only equality deletes (per-row
    * key probing) or requested metadata columns drop the scan to row-based
    * readers (`columnarCapable = false`). */
  def morReaderFactory(
      delegate: PartitionReaderFactory,
      requiredSchema: StructType,
      readWidth: Int, // total columns the delegate produces (incl. extras)
      columnarCapable: Boolean,
      eqGroups: Array[EqDeleteGroup] = Array.empty,
      /** Maps each `requiredSchema` field to its ordinal in the delegate
        * row; null = identity prefix (the batch-scan layout). The CDC
        * stream reads the FULL table schema and projects the requested
        * subset out through this map. */
      ordinalMap: Array[Int] = null,
      /** DISTRIBUTED delete mode (above the driver cap): equality-delete
        * files each task loads itself via [[DeleteLoader]], plus the
        * hadoop conf and cache budget the loads need. */
      eqSpecs: Array[DeleteLoader.EqDeleteFileSpec] = Array.empty,
      conf: org.apache.spark.util.SerializableConfiguration = null,
      deleteCacheBytes: Long = 256L * 1024 * 1024,
      /** Number of MATERIALIZED row-lineage columns the delegate reads
        * (0 or 2), sitting immediately before the trailing row-index
        * column: `_row_id` then `_last_updated_sequence_number`. Readers
        * prefer their (per-row) values over the inherited computation —
        * identity survives compaction. */
      lineageCols: Int = 0): PartitionReaderFactory =
    new MorReaderFactory(delegate, requiredSchema, readWidth, columnarCapable,
      eqGroups, ordinalMap, eqSpecs, conf, deleteCacheBytes, lineageCols)

  private final class MorReaderFactory(
      delegate: PartitionReaderFactory,
      requiredSchema: StructType,
      readWidth: Int,
      columnarCapable: Boolean,
      eqGroups: Array[EqDeleteGroup],
      ordinalMap: Array[Int],
      eqSpecs: Array[DeleteLoader.EqDeleteFileSpec],
      conf: org.apache.spark.util.SerializableConfiguration,
      deleteCacheBytes: Long,
      lineageCols: Int = 0)
    extends PartitionReaderFactory {

    private def width = requiredSchema.length

    /** Task-side deleted positions for one partition: loaded from the
      * partition's overlapping delete files (distributed mode, JVM-cached)
      * or taken from the driver-shipped array. */
    private def deletedOf(m: MorFilePartition): Array[Long] =
      if (m.posDeleteFiles == null) m.deleted
      else DeleteLoader.positionsFor(m.posDeleteFiles,
        morKey(m.underlying.files.head.filePath.toPath.toString),
        conf.value, deleteCacheBytes)

    /** Selection positions for one CDC partition: driver-shipped, or
      * (distributed selection mode) task-computed as new-commit positions
      * minus the parent-visible ones — see
      * [[MorFilePartition.selectPosDeleteFiles]]. */
    private def selectOf(m: MorFilePartition): Array[Long] =
      if (m.selectPosDeleteFiles == null) m.selectPositions
      else {
        val k = morKey(m.underlying.files.head.filePath.toPath.toString)
        val sel = DeleteLoader.positionsFor(m.selectPosDeleteFiles, k,
          conf.value, deleteCacheBytes)
        val minus = if (m.selectMinusDeleteFiles == null) Array.emptyLongArray
          else DeleteLoader.positionsFor(m.selectMinusDeleteFiles, k,
            conf.value, deleteCacheBytes)
        if (minus.isEmpty) sel
        else sel.filter(x => java.util.Arrays.binarySearch(minus, x) < 0)
      }

    /** Exclusion groups for one partition: CDC partitions carry their own;
      * otherwise driver-built groups plus any task-loaded spec files.
      * Specs prune by COMMIT SEQUENCE before loading — an equality-delete
      * file at or below this data file's sequence can never apply, so the
      * task never pays its decode or cache space. */
    private def exclGroupsOf(m: MorFilePartition): Array[EqDeleteGroup] =
      if (m.ownEqGroups != null || m.ownEqSpecs != null) {
        // CDC DELETE partitions carry their OWN visibility: driver-built
        // groups below the cap, task-loaded specs above it. CDC INSERT
        // partitions (both null) DO fall through to the factory branch
        // below — inert today only because the CDC reader factory ships
        // empty eqGroups/eqSpecs; a future CDC factory must keep them
        // empty or inserts would silently inherit batch-scan exclusions.
        val g = if (m.ownEqGroups != null) m.ownEqGroups
          else Array.empty[EqDeleteGroup]
        if (m.ownEqSpecs == null) g
        else g ++ m.ownEqSpecs.filter(_.seq > m.dataSeq).map(s =>
          DeleteLoader.eqGroupFor(s, conf.value, deleteCacheBytes))
      }
      else if (eqSpecs.isEmpty) eqGroups
      else eqGroups ++ eqSpecs.filter(_.seq > m.dataSeq).map(s =>
        DeleteLoader.eqGroupFor(s, conf.value, deleteCacheBytes))

    // one probe projection per group: bound to the group's key ordinals
    // in the widened row, writing into a REUSED UnsafeRow buffer —
    // `keys.contains(probe(r))` hashes/compares raw bytes, so the per-row
    // loop allocates nothing and BinaryType keys compare by value
    private def probesOf(groups: Array[EqDeleteGroup])
        : Array[org.apache.spark.sql.catalyst.expressions.UnsafeProjection] =
      groups.map { g =>
        org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
          g.ordinals.zipWithIndex.map { case (o, j) =>
            org.apache.spark.sql.catalyst.expressions.BoundReference(
              o, g.types(j), nullable = true)
          }.toSeq)
      }

    private def matchesAny(groups: Array[EqDeleteGroup],
        probes: Array[org.apache.spark.sql.catalyst.expressions.UnsafeProjection],
        r: InternalRow): Boolean = {
      var i = 0
      while (i < groups.length) {
        if (groups(i).keys.contains(probes(i)(r))) return true
        i += 1
      }
      false
    }

    // Spark rejects scans mixing row-based and columnar PARTITIONS, so this
    // must not depend on the partition's deletes — the selection wrapper
    // keeps deleted-from partitions on the batch path too.
    override def supportColumnarReads(p: InputPartition): Boolean = p match {
      case m: MorFilePartition =>
        columnarCapable && delegate.supportColumnarReads(m.underlying)
      case other => columnarCapable && delegate.supportColumnarReads(other)
    }

    override def createColumnarReader(
        p: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
      val m = p.asInstanceOf[MorFilePartition]
      val deleted = deletedOf(m) // sorted
      // EQUALITY deletes stay columnar too: the key probe is inherently
      // per-row (a hash-set lookup), but it only computes a SELECTION —
      // the batch's vectors are never copied, and downstream operators
      // keep the vectorized path
      val exclGroups = exclGroupsOf(m)
      val applicable = exclGroups.filter(_.seq > m.dataSeq)
      val probes = probesOf(applicable)
      ScanBridge.morDataFileOpens.incrementAndGet()
      val inner = delegate.createColumnarReader(m.underlying)
      new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
        // deleted positions and batch row indexes are both ascending: one
        // monotone cursor per partition, never a per-row binary search
        private var delCursor = 0
        override def next(): Boolean = inner.next()
        override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = {
          val b = inner.get()
          val n = b.numRows()
          if (deleted.isEmpty && applicable.isEmpty) {
            val cols: Array[org.apache.spark.sql.vectorized.ColumnVector] =
              Array.tabulate(width)(b.column)
            return new org.apache.spark.sql.vectorized.ColumnarBatch(cols, n)
          }
          val idxCol = if (deleted.isEmpty) null else b.column(readWidth - 1)
          val sel = new Array[Int](n)
          var kept = 0
          var i = 0
          while (i < n) {
            var keep = true
            if (idxCol != null) {
              val pos = idxCol.getLong(i)
              while (delCursor < deleted.length && deleted(delCursor) < pos) delCursor += 1
              keep = delCursor >= deleted.length || deleted(delCursor) != pos
            }
            if (keep && applicable.nonEmpty)
              keep = !matchesAny(applicable, probes, b.getRow(i))
            if (keep) { sel(kept) = i; kept += 1 }
            i += 1
          }
          val cols: Array[org.apache.spark.sql.vectorized.ColumnVector] =
            if (kept == n) Array.tabulate(width)(b.column)
            else {
              val s = java.util.Arrays.copyOf(sel, kept)
              Array.tabulate(width)(c => new SelectedColumnVector(b.column(c), s))
            }
          new org.apache.spark.sql.vectorized.ColumnarBatch(cols, kept)
        }
        override def close(): Unit = inner.close()
      }
    }

    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val m = p.asInstanceOf[MorFilePartition]
      val deleted = deletedOf(m) // sorted
      // equality deletes apply only to files committed strictly earlier;
      // CDC partitions may carry their own (parent-visibility) groups
      val exclGroups = exclGroupsOf(m)
      val applicable = exclGroups.filter(_.seq > m.dataSeq)
      val selecting =
        if (m.selectEqSpecs != null)
          m.selectEqSpecs.filter(_.seq > m.dataSeq).map(s =>
            DeleteLoader.eqGroupFor(s, conf.value, deleteCacheBytes))
        else if (m.selectEqGroups != null)
          m.selectEqGroups.filter(_.seq > m.dataSeq)
        else null
      val selectPos = selectOf(m) // sorted, or null
      // a selection partition whose selection resolved EMPTY emits nothing:
      // answer from the (cached) delete-file reads alone and never open the
      // data parquet — the task half of the above-cap fan-out defense
      // (plan-time referenced-file bounds prune what metadata can prove;
      // any partition planned conservatively costs only this)
      if ((selectPos != null && selectPos.isEmpty) ||
          (selecting != null && selecting.forall(_.keys.isEmpty))) {
        ScanBridge.morEmptySelectionSkips.incrementAndGet()
        return new PartitionReader[InternalRow] {
          override def next(): Boolean = false
          override def get(): InternalRow = throw new java.util.NoSuchElementException
          override def close(): Unit = ()
        }
      }
      ScanBridge.morDataFileOpens.incrementAndGet()
      val inner = delegate.createReader(m.underlying)
      // the delegate row is requiredSchema + eq-key columns + row-index
      // (appended in that order); project the extras out — ordinals
      // 0..n-1 are the required fields unless an ordinalMap repositions
      // them. Requested metadata columns append after: string constants
      // per file, `_pos` wired to the row index, `_commit_snapshot_id`
      // as a long.
      val idxOrdinal = readWidth - 1
      val exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
        requiredSchema.fields.zipWithIndex.map { case (f, i) =>
          org.apache.spark.sql.catalyst.expressions.BoundReference(
            if (ordinalMap == null) i else ordinalMap(i), f.dataType, f.nullable)
        }.toSeq ++
          m.metaValues.map {
            case ("_pos", _) =>
              org.apache.spark.sql.catalyst.expressions.BoundReference(
                idxOrdinal, LongType, nullable = true)
            // ROW LINEAGE: prefer the file's MATERIALIZED per-row value
            // (compacted files carry one under the reserved field id);
            // fall back to first_row_id + row index — which ASSIGNS ids to
            // rewritten rows that never had one, the spec's lazy rule.
            // Null constant for pre-lineage files with nothing to inherit.
            case ("_row_id", v) =>
              val inherited: org.apache.spark.sql.catalyst.expressions.Expression =
                if (v == null)
                  org.apache.spark.sql.catalyst.expressions.Literal(null, LongType)
                else org.apache.spark.sql.catalyst.expressions.Add(
                  org.apache.spark.sql.catalyst.expressions.Literal(v.toLong, LongType),
                  org.apache.spark.sql.catalyst.expressions.BoundReference(
                    idxOrdinal, LongType, nullable = true))
              if (lineageCols == 0) inherited
              else org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(
                org.apache.spark.sql.catalyst.expressions.BoundReference(
                  readWidth - 1 - lineageCols, LongType, nullable = true),
                inherited))
            case ("_last_updated_sequence_number", v) =>
              val inherited: org.apache.spark.sql.catalyst.expressions.Expression =
                org.apache.spark.sql.catalyst.expressions.Literal(
                  if (v == null) null else v.toLong, LongType)
              if (lineageCols == 0) inherited
              else org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(
                org.apache.spark.sql.catalyst.expressions.BoundReference(
                  readWidth - lineageCols, LongType, nullable = true),
                inherited))
            case ("_commit_snapshot_id", v) =>
              org.apache.spark.sql.catalyst.expressions.Literal(v.toLong, LongType)
            case ("_commit_timestamp", v) => // micros since epoch
              org.apache.spark.sql.catalyst.expressions.Literal(v.toLong,
                org.apache.spark.sql.types.TimestampType)
            case (_, v) =>
              org.apache.spark.sql.catalyst.expressions.Literal(
                if (v == null) null
                else org.apache.spark.unsafe.types.UTF8String.fromString(v),
                org.apache.spark.sql.types.StringType)
          }
      val project = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(exprs)

      val exclProbes = probesOf(applicable)
      val selProbes = if (selecting == null) null else probesOf(selecting)

      new PartitionReader[InternalRow] {
        private var current: InternalRow = _
        override def next(): Boolean = {
          while (inner.next()) {
            val r = inner.get()
            val pos = if (deleted.isEmpty && selectPos == null) -1L
              else r.getLong(idxOrdinal)
            val posLive = deleted.isEmpty ||
              java.util.Arrays.binarySearch(deleted, pos) < 0
            val posSelected = selectPos == null ||
              java.util.Arrays.binarySearch(selectPos, pos) >= 0
            val eqLive = applicable.isEmpty || !matchesAny(applicable, exclProbes, r)
            val eqSelected = selecting == null || matchesAny(selecting, selProbes, r)
            if (posLive && posSelected && eqLive && eqSelected) {
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

  /** A SELECTION view over a column vector: presents only the rows whose
    * ordinals survive the merge-on-read position filter, without copying
    * any data — `sel(i)` maps the view's row i to the underlying batch row.
    * Struct children wrap lazily with the SAME selection (ColumnarRow reads
    * fields via `getChild(i).getX(rowId)`); array/map contents delegate
    * unmapped because their offsets live in the parent vector's entry. */
  private final class SelectedColumnVector(
      inner: org.apache.spark.sql.vectorized.ColumnVector,
      sel: Array[Int])
    extends org.apache.spark.sql.vectorized.ColumnVector(inner.dataType()) {

    override def close(): Unit = () // the wrapped batch owns the buffers
    override def hasNull: Boolean = inner.hasNull
    override def numNulls(): Int = inner.numNulls() // upper bound; unused by exec
    override def isNullAt(rowId: Int): Boolean = inner.isNullAt(sel(rowId))
    override def getBoolean(rowId: Int): Boolean = inner.getBoolean(sel(rowId))
    override def getByte(rowId: Int): Byte = inner.getByte(sel(rowId))
    override def getShort(rowId: Int): Short = inner.getShort(sel(rowId))
    override def getInt(rowId: Int): Int = inner.getInt(sel(rowId))
    override def getLong(rowId: Int): Long = inner.getLong(sel(rowId))
    override def getFloat(rowId: Int): Float = inner.getFloat(sel(rowId))
    override def getDouble(rowId: Int): Double = inner.getDouble(sel(rowId))
    override def getArray(rowId: Int): org.apache.spark.sql.vectorized.ColumnarArray =
      inner.getArray(sel(rowId))
    override def getMap(rowId: Int): org.apache.spark.sql.vectorized.ColumnarMap =
      inner.getMap(sel(rowId))
    override def getDecimal(rowId: Int, precision: Int, scale: Int): org.apache.spark.sql.types.Decimal =
      inner.getDecimal(sel(rowId), precision, scale)
    override def getUTF8String(rowId: Int): org.apache.spark.unsafe.types.UTF8String =
      inner.getUTF8String(sel(rowId))
    override def getBinary(rowId: Int): Array[Byte] = inner.getBinary(sel(rowId))
    private lazy val children =
      new java.util.concurrent.ConcurrentHashMap[Integer, SelectedColumnVector]()
    override def getChild(ordinal: Int): org.apache.spark.sql.vectorized.ColumnVector =
      children.computeIfAbsent(ordinal,
        o => new SelectedColumnVector(inner.getChild(o), sel))
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

  /** Spark's native ORC DSv2 scan (vectorized, predicate pushdown to
    * stripes) over a known file list — same zero-listing planning as
    * [[parquetScan]]. Missing evolved-in columns read back as nulls via
    * Spark's by-name ORC column resolution. */
  def orcScan(
      spark: SparkSession,
      hadoopConf: Configuration,
      files: Seq[(String, Long)],
      dataSchema: StructType,
      readDataSchema: StructType,
      pushedFilters: Array[Filter],
      options: CaseInsensitiveStringMap): Scan = {
    val index = new KnownFilesIndex(spark, files, dataSchema)
    OrcScan(spark, hadoopConf, index, dataSchema, readDataSchema,
      new StructType(), options, None, pushedFilters)
  }

  /** An input partition of a [[combinedBatch]], remembering which member
    * batch planned it so the combined factory routes it home. */
  final class RoutedPartition(
      private[graftbridge] val which: Int,
      private[graftbridge] val inner: InputPartition) extends InputPartition {
    override def preferredLocations(): Array[String] = inner.preferredLocations()
  }

  private final class RoutedReaderFactory(
      factories: Array[PartitionReaderFactory],
      columnarOK: Boolean) extends PartitionReaderFactory {
    private def r(p: InputPartition) = p.asInstanceOf[RoutedPartition]
    override def createReader(p: InputPartition): PartitionReader[InternalRow] =
      factories(r(p).which).createReader(r(p).inner)
    override def createColumnarReader(p: InputPartition)
        : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
      factories(r(p).which).createColumnarReader(r(p).inner)
    // Spark rejects mixed columnar/row partitions within one scan: report
    // columnar only when EVERY partition of every member batch supports it
    // (precomputed), else force the row path uniformly
    override def supportColumnarReads(p: InputPartition): Boolean =
      columnarOK && factories(r(p).which).supportColumnarReads(r(p).inner)
  }

  /** Concatenate several Batches into one (a mixed parquet+ORC Iceberg
    * table plans one scan per format, presented to Spark as a single
    * Batch). Columnar reads survive only if every member partition
    * supports them — otherwise the whole scan reads row-based, because
    * Spark refuses heterogeneous partition shapes. */
  def combinedBatch(batches: Seq[Batch]): Batch = new Batch {
    private lazy val parts: Array[Array[InputPartition]] =
      batches.map(_.planInputPartitions()).toArray
    override def planInputPartitions(): Array[InputPartition] =
      parts.zipWithIndex.flatMap { case (ps, i) =>
        ps.map(new RoutedPartition(i, _): InputPartition)
      }
    override def createReaderFactory(): PartitionReaderFactory = {
      val fs = batches.map(_.createReaderFactory()).toArray
      val columnarOK = parts.zipWithIndex.forall { case (ps, i) =>
        ps.forall(fs(i).supportColumnarReads)
      }
      new RoutedReaderFactory(fs, columnarOK)
    }
  }
}
