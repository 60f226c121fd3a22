package graft.iceberg

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table maintenance — the operational half every long-lived Iceberg table
  * needs at scale: small-file compaction (the #1 performance killer of
  * streaming-ingested tables) and snapshot expiration with physical cleanup
  * of unreferenced files. Both commit through the optimistic loop. */
object Maintenance {

  /** Rewrite the table's live data as `targetFiles` files (default: sized
    * from total bytes at ~128 MB/file) in ONE `replace` snapshot:
    *  - reads are pinned to the snapshot being compacted, so a concurrent
    *    append's files survive (only the files actually read are DELETED);
    *  - v2 position deletes are APPLIED by the rewrite (merge-on-read fold)
    *    and their manifests dropped — after compaction the table serves
    *    plain batch scans again. A row-level delete committed AFTER the pin
    *    makes the commit refuse (ConcurrentModificationException) instead of
    *    silently resurrecting the concurrently-deleted rows — rerun compact;
    *  - time travel to pre-compaction snapshots still works (old files stay
    *    on disk until expireSnapshots).
    */
  def compact(spark: SparkSession, url: String, targetFiles: Option[Int] = None): Unit = {
    val t0 = IcebergTable.load(spark, url)
    if (t0.metadata.currentSnapshotId < 0) return
    val frozen = t0.atSnapshot(t0.currentSnapshot.snapshotId)
    val pinned = frozen.liveFiles()
    if (pinned.isEmpty) return
    val n = targetFiles.getOrElse(
      math.max(1, (pinned.map(_.fileSizeInBytes).sum / (128L * 1024 * 1024)).toInt))
    // sorted tables: skip the blind round-robin repartition — the write
    // path range-partitions on the sort order with targetPartitions output
    // slices, restoring the disjoint-bounds layout at the requested file
    // count; unsorted tables round-robin to n as before
    val sortedTable = frozen.sortOrderColumns.nonEmpty
    val compacted =
      if (sortedTable) frozen.read()
      else frozen.read().repartition(n)
    IcebergWriter.writeSnapshot(spark, url, compacted,
      deletePred = None, operation = "replace",
      targetPartitions = if (sortedTable) Some(n) else None,
      pinnedDeletes = Some(pinned), dropDeleteManifests = true,
      // deletes applied by this rewrite are exactly those live at PIN time;
      // a delete committed after the pin would be silently lost when the
      // delete manifests drop — the commit detects the mismatch and refuses
      pinnedDeleteFiles = Some(frozen.liveDeleteFiles
        .map(f => frozen.resolvePath(f.filePath)).toSet))
  }

  /** Keep only the last `keepLast` snapshots of the current history chain;
    * older snapshots leave the metadata and their no-longer-referenced data
    * files, manifests, and manifest lists are physically deleted. Time
    * travel to an expired snapshot then fails (by design). */
  def expireSnapshots(spark: SparkSession, url: String, keepLast: Int = 1): Unit = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val conf = spark.sessionState.newHadoopConf()
    val mapper = new ObjectMapper()
    val before = IcebergTable.load(spark, url)
    if (before.metadata.currentSnapshotId < 0) return

    // 1. trim metadata through the optimistic commit loop
    IcebergWriter.commitWithRetry(spark, url, conf) { table =>
      var chain = List(table.latestSnapshot)
      while (chain.size < keepLast && chain.head.parentSnapshotId.exists(table.snapshots.contains))
        chain = table.snapshots(chain.head.parentSnapshotId.get) :: chain
      // snapshots a ref points to (tags especially) survive expiration —
      // a pinned training set must stay reproducible
      val keepIds = chain.map(_.snapshotId).toSet ++
        table.refs.values.map(_.snapshotId).filter(table.snapshots.contains)
      if (keepIds.size == table.snapshots.size) None // nothing to expire
      else {
        val old = mapper.readTree(IcebergTableIo.readString(
          s"$url/metadata/v${table.version}.metadata.json", conf)).asInstanceOf[ObjectNode]
        def filterArray(name: String): Unit = if (old.has(name)) {
          val arr = old.withArray[ArrayNode](name)
          val kept = (0 until arr.size).map(arr.get)
            .filter(n => keepIds.contains(n.get("snapshot-id").asLong))
          arr.removeAll()
          kept.foreach(arr.add)
        }
        filterArray("snapshots")
        filterArray("snapshot-log")
        // oldest kept snapshot becomes the chain root
        val snaps = old.withArray[ArrayNode]("snapshots")
        (0 until snaps.size).map(snaps.get(_).asInstanceOf[ObjectNode])
          .filter(n => n.has("parent-snapshot-id") &&
            !keepIds.contains(n.get("parent-snapshot-id").asLong))
          .foreach(_.remove("parent-snapshot-id"))
        old.put("last-updated-ms", System.currentTimeMillis())
        Some(old.toPrettyString)
      }
    }

    // 2. physical cleanup (best-effort, after the metadata commit is
    // durable). A data file is kept only if some remaining snapshot can
    // still READ it (live data or live position deletes); files referenced
    // solely by DELETED entries are unreachable bytes. Manifests and
    // manifest lists of remaining snapshots are all kept (reconciliation
    // reads them, including pure-DELETED ones).
    val after = IcebergTable.load(spark, url)
    val liveData = scala.collection.mutable.Set.empty[String]
    val liveAvro = scala.collection.mutable.Set.empty[String]
    after.metadata.snapshots.foreach { snap =>
      val view = after.atSnapshot(snap.snapshotId)
      liveAvro += name(view.resolvePath(snap.manifestList))
      view.manifestList.foreach(mf => liveAvro += name(view.resolvePath(mf.path)))
      view.liveFiles().foreach(f => liveData += name(view.resolvePath(f.filePath)))
      view.liveDeleteFiles.foreach(f => liveData += name(view.resolvePath(f.filePath)))
    }
    val fs = new Path(url).getFileSystem(conf)
    def cleanDir(dir: Path, candidate: String => Boolean,
        referenced: String => Boolean): Unit =
      if (fs.exists(dir)) {
        val it = fs.listFiles(dir, true)
        val doomed = scala.collection.mutable.ArrayBuffer.empty[Path]
        while (it.hasNext) {
          val st = it.next()
          val nm = st.getPath.getName
          if (candidate(nm) && !referenced(nm)) doomed += st.getPath
        }
        doomed.foreach(p => fs.delete(p, false))
      }
    cleanDir(new Path(s"$url/data"), _.endsWith(".parquet"), liveData)
    cleanDir(new Path(s"$url/metadata"), _.endsWith(".avro"), liveAvro)
  }

  private def name(p: String): String = p.split('/').last
}

/** Small shared IO (read a metadata file as UTF-8). */
private[iceberg] object IcebergTableIo {
  def readString(path: String, conf: org.apache.hadoop.conf.Configuration): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }
}
