package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.iceberg.IcebergTable

/** Iceberg metadata-plane operators exposed as driver-contract queries.
  *
  * These exercise the from-scratch Iceberg v1 reader against the golden
  * fixture table (written by a real Iceberg writer). They are metadata-plane
  * semantics — version resolution, time travel, pruning, schema evolution —
  * so they have no DuckDB-SQL oracle; the driver records rows-only checks.
  */
object IceQueries {

  val FixtureDir = "/root/reference/test-data/my_table"
  val FixtureOrig = "/Users/mdurant/temp/warehouse/db/my_table"

  private def table(s: SparkSession): IcebergTable =
    IcebergTable.load(s, FixtureDir, Some(FixtureOrig))

  /** Oracles whose SQL depends on run-time temp paths: each write-path
    * query registers DuckDB SQL over its FINAL data files after
    * committing. Verify collects `oracleSql` AFTER all queries run, so
    * these land in the dump — and the driver's DuckDB then reads the
    * written bytes back as a FOREIGN engine, the interop proof a summary
    * tuple can't give. */
  val dynamicOracle: scala.collection.concurrent.TrieMap[String, String] =
    scala.collection.concurrent.TrieMap.empty

  private def sqlPaths(paths: Seq[String]): String =
    paths.map(p => "'" + p.replace("'", "''") + "'").mkString("[", ", ", "]")

  /** DuckDB subquery yielding the LIVE rows of `t` straight from its data
    * files: read_parquet over the resolved live-file list; when position-
    * delete files exist, an anti-join on (path suffix after the LAST
    * '/data/', file_row_number) replays merge-on-read independently of our
    * reader — the same file key ScanBridge.morKey uses. EQUALITY deletes
    * replay too: each delete file contributes a key anti-join scoped by
    * commit sequence (a data file's rows die only if the data file's
    * sequence is strictly BELOW the delete file's — the Iceberg v2 rule),
    * with per-data-file sequences shipped as a VALUES table. */
  private[graft] def duckLiveRows(t: IcebergTable, cols: Seq[String]): String = {
    val dataFiles = t.liveFiles()
    val data = sqlPaths(dataFiles.map(f => t.resolvePath(f.filePath)))
    val (dvDels, pqDels) = t.positionDeleteFiles.partition(_.isDv)
    val dels = pqDels.map(f => t.resolvePath(f.filePath))
    val eqs = t.equalityDeleteFiles
    val colList = cols.mkString(", ")
    if (dels.isEmpty && eqs.isEmpty && dvDels.isEmpty)
      return s"SELECT $colList FROM read_parquet($data, union_by_name=true)"
    def fkey(p: String): String = p.split("/data/").last
    val inner =
      s"""SELECT *, str_split(filename, '/data/')[-1] AS _fkey,
         |         file_row_number AS _fpos
         |  FROM read_parquet($data, union_by_name=true, filename=true,
         |                    file_row_number=true)""".stripMargin
    // eq replay needs each data file's commit sequence alongside its rows
    val src = if (eqs.isEmpty) s"(\n  $inner\n) _d"
      else {
        val seqValues = dataFiles.map(f =>
          s"('${fkey(t.resolvePath(f.filePath))}', ${t.dataSequenceOf(f)})")
          .mkString(", ")
        s"""(
           |  SELECT _r.*, _s.seq AS _dseq FROM (
           |  $inner
           |  ) _r JOIN (VALUES $seqValues) _s(fkey, seq) ON _s.fkey = _r._fkey
           |) _d""".stripMargin
      }
    val posClause = if (dels.isEmpty) Nil else Seq(
      s"""NOT EXISTS (
         |  SELECT 1 FROM (
         |    SELECT str_split(file_path, '/data/')[-1] AS _fkey, pos AS _fpos
         |    FROM read_parquet(${sqlPaths(dels)})
         |  ) _x WHERE _x._fkey = _d._fkey AND _x._fpos = _d._fpos)""".stripMargin)
    // DELETION VECTORS (v3): DuckDB cannot parse puffin, so the oracle
    // replays each blob from the WRITTEN BYTES through the from-scratch
    // standalone roaring decoder (no RoaringBitmap-library involvement —
    // a library-writes / hand-reads spec-conformance round trip) and ships
    // the (file, pos) pairs as a VALUES table.
    val dvClause = if (dvDels.isEmpty) Nil else {
      val pairs = dvDels.flatMap { d =>
        val raw = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(t.resolvePath(d.filePath)))
        val off = d.contentOffset.getOrElse(
          sys.error(s"DV without offset: ${d.filePath}")).toInt
        val len = d.contentSizeInBytes.getOrElse(
          sys.error(s"DV without size: ${d.filePath}")).toInt
        val ref = fkey(d.referencedDataFile.getOrElse(
          sys.error(s"DV without referenced file: ${d.filePath}")))
        graft.iceberg.DeletionVectors
          .decodePositionsStandalone(raw.slice(off, off + len))
          .map(p => s"('${ref.replace("'", "''")}', $p)")
      }
      Seq(s"""NOT EXISTS (
         |  SELECT 1 FROM (VALUES ${pairs.mkString(", ")}) _dv(fkey, fpos)
         |  WHERE _dv.fkey = _d._fkey AND _dv.fpos = _d._fpos)""".stripMargin)
    }
    val idToName = t.iceSchema.fields.map(f => f.id -> f.name).toMap
    val eqClauses = eqs.map { ed =>
      val keys = ed.equalityIds.flatMap(idToName.get)
      // A partially-mapped composite key would silently anti-join on a
      // subset and delete too many rows — fail loudly instead.
      require(keys.length == ed.equalityIds.length && keys.nonEmpty,
        s"equality-delete ids ${ed.equalityIds.mkString(",")} do not all map " +
          s"to schema fields (got ${keys.mkString(",")}): ${ed.filePath}")
      val matchKeys = keys.map(k => s"_e.$k IS NOT DISTINCT FROM _d.$k")
        .mkString(" AND ")
      s"""NOT EXISTS (
         |  SELECT 1 FROM read_parquet(${sqlPaths(Seq(t.resolvePath(ed.filePath)))}) _e
         |  WHERE _d._dseq < ${t.dataSequenceOf(ed)} AND $matchKeys)""".stripMargin
    }
    s"SELECT $colList FROM $src WHERE " +
      (posClause ++ dvClause ++ eqClauses).mkString("\n  AND ")
  }

  /** SURVEY §2A #15: full scan of the current snapshot (5 live rows).
    *
    * ALSO pins the scan-planning SCALE path under the oracle: with the
    * distributed-manifest threshold forced to 0 and the decode cache
    * cleared, planning this read must shard the Avro manifest decode
    * across executors ([[graft.iceberg.Manifests.readManifestsScaled]] —
    * the 100 TB shape, where thousands of driver-side manifest reads would
    * serialize scan planning). The query THROWS if the distributed job did
    * not run, so the correctness gate goes red if the scale path ever
    * silently stops executing. */
  def iceReadAll(s: SparkSession, dir: String): DataFrame = {
    val key = "spark.graft.iceberg.distributedManifestThreshold"
    val prev = s.conf.getOption(key)
    val before = graft.iceberg.Manifests.distributedDecodeJobs.get()
    try {
      s.conf.set(key, "0")
      graft.iceberg.Manifests.clearCache()
      val t = table(s)
      // liveFiles() decodes manifests EAGERLY inside the conf scope; the
      // DSv2 read() below is lazy (decode happens at scan-planning time,
      // after the finally restores the threshold), so probing via the read
      // alone would assert before any decode ran. The decoded entries land
      // in the manifest cache, so the subsequent plan stays warm.
      val t0 = System.nanoTime()
      t.liveFiles()
      val planningMs = (System.nanoTime() - t0) / 1e6
      val after = graft.iceberg.Manifests.distributedDecodeJobs.get()
      require(after > before,
        "distributed manifest decode did not run under threshold=0")
      // metadata-plane TELEMETRY surfaces through the contract output
      // (round-13 ask): live-file count and decoded-stats footprint pin as
      // oracle columns, the wall-time only as a generous ceiling (a tight
      // one would flake on a loaded VM; a blown one means planning fell off
      // a scalability cliff and the correctness gate SHOULD go red).
      val liveFiles = graft.iceberg.IcebergTable.lastPlanningFiles.get()
      val statsBytes = graft.iceberg.IcebergTable.lastPlanningStatsBytes.get()
      require(planningMs < 60000,
        f"fixture scan planning took $planningMs%.0f ms — metadata-plane regression")
      t.read().orderBy("name")
        .withColumn("live_files", lit(liveFiles))
        .withColumn("stats_bytes_positive", lit(statsBytes > 0))
        .withColumn("decode_jobs_ran", lit(after > before))
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  /** SURVEY §2A #9/#10: stats-pruned filtered read. */
  def iceReadFiltered(s: SparkSession, dir: String): DataFrame =
    table(s).read(filters = Seq(Seq(("age", ">", 30)))).orderBy("name")

  /** SURVEY §2A #4: relative time travel (snapshot −1: 4 rows, 2 columns). */
  def iceTimeTravel(s: SparkSession, dir: String): DataFrame =
    table(s).snapshotRelative(-1).read().orderBy("name")

  /** SURVEY §2A #2: version time travel (v2 metadata = first snapshot). */
  def iceAtVersion(s: SparkSession, dir: String): DataFrame =
    table(s).atVersion(2).read().orderBy("name")

  /** SURVEY §2A #3/#19: snapshot enumeration with summaries. */
  def iceSnapshots(s: SparkSession, dir: String): DataFrame =
    table(s).snapshotsDf.orderBy("committed_at")

  /** SURVEY §2A #5/#8: live-file reconciliation (manifest-list+manifest read). */
  def iceFiles(s: SparkSession, dir: String): DataFrame =
    table(s).filesDf.orderBy("file_path")

  /** SURVEY §2A #5: manifest-list decode. */
  def iceManifests(s: SparkSession, dir: String): DataFrame =
    table(s).manifestsDf.orderBy("path")

  /** SURVEY §2A #1/#20 + stats: one-row introspection summary. */
  def iceIntrospect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = table(s)
    Seq((t.version, t.currentSnapshot.snapshotId,
        t.schema.fieldNames.mkString(","),
        t.countFromStats().getOrElse(-1L),
        t.summary.getOrElse("operation", "")))
      .toDF("version", "snapshot_id", "schema_fields", "row_count_from_stats", "operation")
  }

  /** Schema evolution: old snapshot lacks `email`; reading through the head
    * schema yields nulls for pre-evolution files. */
  def iceSchemaEvolution(s: SparkSession, dir: String): DataFrame =
    table(s).read()
      .select(col("name"), col("email").isNull.as("email_missing"))
      .orderBy("name")

  /** The data-source API path: `spark.read.format("graft-iceberg")` with
    * column/filter pushdown through the stable sources API. */
  def iceSqlSource(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft-iceberg")
      .option("original-url", FixtureOrig)
      .load(FixtureDir)
      .filter(col("age") > 30)
      .select(col("name"), col("age"))
      .orderBy("name")

  /** Time travel through data-source options (snapshot -1 = 4 rows). */
  def iceSourceTimeTravel(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft-iceberg")
      .option("original-url", FixtureOrig)
      .option("rel", "-1")
      .load(FixtureDir)
      .orderBy("name")

  /** Write-path round trip (extension beyond the read-only reference):
    * create → append twice → read back through the metadata plane with
    * snapshot chain + stats intact. */
  def iceWriteRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter}
    import s.implicits._
    val url = java.nio.file.Files.createTempDirectory("graft_wrt").toString + "/t"
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))))
    IcebergWriter.append(s, url, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    IcebergWriter.append(s, url, Seq((3L, "c")).toDF("k", "v"))
    val t = IcebergTable.load(s, url)
    // the oracle reads the WRITTEN bytes back through DuckDB; the expected
    // metadata facts are pinned as literals in the SQL text
    dynamicOracle("ice_write_roundtrip") =
      s"""SELECT k, v, CAST(3 AS INTEGER) AS version,
         |  CAST(3 AS BIGINT) AS rows_from_stats,
         |  CAST(2 AS BIGINT) AS rows_prev_snapshot,
         |  CAST(2 AS INTEGER) AS n_snapshots
         |FROM (${duckLiveRows(t, Seq("k", "v"))}) ORDER BY k""".stripMargin
    t.read()
      .withColumn("version", lit(t.version))
      .withColumn("rows_from_stats", lit(t.countFromStats().getOrElse(-1L)))
      .withColumn("rows_prev_snapshot", lit(t.snapshotRelative(-1).read().count()))
      .withColumn("n_snapshots", lit(t.snapshots.size))
      .orderBy("k")
  }

  /** Hidden-partitioned write → read: bucket partitioning with derived-
    * partition pruning and metadata-only partition listing. */
  def iceWritePartitioned(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter, Pruning}
    import s.implicits._
    val url = java.nio.file.Files.createTempDirectory("graft_wrtp").toString + "/t"
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cat", org.apache.spark.sql.types.StringType))),
      partitions = Seq("cat" -> "identity", "k" -> "bucket[4]"))
    IcebergWriter.append(s, url,
      (1L to 100L).map(i => (i, s"c${i % 2}")).toDF("k", "cat"))
    val t = IcebergTable.load(s, url)
    val nFiles = t.liveFiles().size
    val prunedRows = t.read(filters = Seq(Seq(("k", "==", 7)))).count()
    val parts = t.uniquePartitions(Some("cat"))("cat").mkString(",")
    // 2 identity cats x 4 murmur3 buckets over 1..100 = 8 files expected
    dynamicOracle("ice_write_partitioned") =
      s"""SELECT k, cat, CAST(8 AS INTEGER) AS n_files,
         |  CAST(1 AS BIGINT) AS rows_k_eq_7, 'c0,c1' AS cat_partitions
         |FROM (${duckLiveRows(t, Seq("k", "cat"))}) ORDER BY k""".stripMargin
    t.read()
      .withColumn("n_files", lit(nFiles))
      .withColumn("rows_k_eq_7", lit(prunedRows))
      .withColumn("cat_partitions", lit(parts))
      .orderBy("k")
  }

  /** POSITION-DELETE CONSOLIDATION: three row-delete commits leave three
    * small delete files (the CDC-upsert accumulation problem); the rewrite
    * merges them into ONE sorted file in a metadata `replace` snapshot that
    * swaps only the position-delete manifests. The file counts pin the
    * consolidation; the oracle re-reads the final data files and re-applies
    * the CONSOLIDATED delete file from the written bytes. */
  def iceRewriteDeletes(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter, Maintenance, Pruning}
    val url = java.nio.file.Files.createTempDirectory("graft_rwdq").toString + "/t"
    val nation = Queries.t(s, dir, "nation")
      .selectExpr("CAST(n_nationkey AS BIGINT) AS k", "n_name AS name",
        "CAST(n_regionkey AS BIGINT) AS r")
    IcebergWriter.createTable(s, url, nation.schema)
    IcebergWriter.append(s, url, nation.coalesce(1))
    Seq(2L, 9L, 17L).foreach(k =>
      IcebergWriter.deleteRows(s, url, Pruning.Eq("k", k)))
    val posBefore = IcebergTable.load(s, url).positionDeleteFiles.size
    Maintenance.rewritePositionDeletes(s, url)
    val t = IcebergTable.load(s, url)
    val posAfter = t.positionDeleteFiles.size
    // literal pins: a rewrite that failed to consolidate (or lost a delete)
    // hash-mismatches the oracle, which also replays the surviving deletes
    dynamicOracle("ice_rewrite_deletes") =
      s"""SELECT k, name, r, CAST(3 AS BIGINT) AS pos_files_before,
         |  CAST(1 AS BIGINT) AS pos_files_after
         |FROM (${duckLiveRows(t, Seq("k", "name", "r"))}) ORDER BY k""".stripMargin
    t.read()
      .withColumn("pos_files_before", lit(posBefore.toLong))
      .withColumn("pos_files_after", lit(posAfter.toLong))
      .orderBy("k")
  }

  /** Metadata-only PARTITION STATS (Iceberg's `partitions` metadata table):
    * per-partition file/record/byte counts straight from manifest entries,
    * zero data I/O — how an operator spots partition skew on a 100 TB
    * table. The DuckDB oracle recomputes record counts by actually grouping
    * the data; file counts pin the one-file-per-partition clustering of the
    * partitioned write path. */
  def icePartitionsMeta(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter}
    val url = java.nio.file.Files.createTempDirectory("graft_pmeta").toString + "/t"
    val nation = Queries.t(s, dir, "nation")
      .selectExpr("CAST(n_nationkey AS BIGINT) AS k", "n_name AS name",
        "CAST(n_regionkey AS BIGINT) AS r")
    IcebergWriter.createTable(s, url, nation.schema,
      partitions = Seq("r" -> "identity"))
    IcebergWriter.append(s, url, nation)
    val t = IcebergTable.load(s, url)
    t.partitionStats()
      .select(col("r"), col("n_files"), col("n_records"),
        (col("total_bytes") > 0L).cast("long").as("bytes_positive"),
        col("has_live_deletes").cast("long").as("has_deletes"))
      .orderBy("r")
  }

  /** Full snapshot lifecycle: append → delete partition → read reconciles,
    * time travel restores (the fixture's overwrite semantics, writer-side). */
  def iceWriteDelete(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter, Pruning}
    import s.implicits._
    val url = java.nio.file.Files.createTempDirectory("graft_wrtd").toString + "/t"
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cat", org.apache.spark.sql.types.StringType))),
      partitions = Seq("cat" -> "identity"))
    IcebergWriter.append(s, url, (1L to 60L).map(i => (i, s"c${i % 3}")).toDF("k", "cat"))
    IcebergWriter.deleteWhere(s, url, Pruning.Eq("cat", "c1"))
    val t = IcebergTable.load(s, url)
    dynamicOracle("ice_write_delete") =
      s"""SELECT k, cat, CAST(60 AS BIGINT) AS rows_before_delete,
         |  'delete' AS operation, CAST(40 AS BIGINT) AS rows_from_stats
         |FROM (${duckLiveRows(t, Seq("k", "cat"))}) ORDER BY k""".stripMargin
    t.read()
      .withColumn("rows_before_delete", lit(t.snapshotRelative(-1).read().count()))
      .withColumn("operation", lit(t.summary.getOrElse("operation", "")))
      .withColumn("rows_from_stats", lit(t.countFromStats().getOrElse(-1L)))
      .orderBy("k")
  }

  /** Single-snapshot overwrite: DELETED + ADDED entries in ONE snapshot with
    * operation=overwrite (the fixture's own v5 history shape). Time travel
    * one step restores the pre-overwrite data. */
  def iceWriteOverwrite(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter, Pruning}
    import s.implicits._
    val url = java.nio.file.Files.createTempDirectory("graft_wrto").toString + "/t"
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cat", org.apache.spark.sql.types.StringType))),
      partitions = Seq("cat" -> "identity"))
    IcebergWriter.append(s, url, (1L to 60L).map(i => (i, s"c${i % 3}")).toDF("k", "cat"))
    // replace partition c1 with two fresh rows, in one snapshot
    IcebergWriter.overwrite(s, url,
      Seq((1001L, "c1"), (1002L, "c1")).toDF("k", "cat"), Pruning.Eq("cat", "c1"))
    val t = IcebergTable.load(s, url)
    dynamicOracle("ice_write_overwrite") =
      s"""SELECT k, cat, CAST(2 AS BIGINT) AS c1_rows_after,
         |  CAST(60 AS BIGINT) AS rows_before, 'overwrite' AS operation,
         |  CAST(2 AS INTEGER) AS n_snapshots
         |FROM (${duckLiveRows(t, Seq("k", "cat"))}) ORDER BY k""".stripMargin
    t.read()
      // partition-pruned read: only replaced-partition files feed this scan
      .withColumn("c1_rows_after", lit(
        t.read(filters = Seq(Seq(("cat", "==", "c1")))).count()))
      .withColumn("rows_before", lit(t.snapshotRelative(-1).read().count()))
      .withColumn("operation", lit(t.summary.getOrElse("operation", "")))
      .withColumn("n_snapshots", lit(t.snapshots.size))
      .orderBy("k")
  }

  /** Iceberg v2 row-level delete: the predicate splits a file, matching
    * positions land in a position-delete file, reads merge-on-read. */
  def iceWriteDeleteRows(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter, Pruning}
    import s.implicits._
    val url = java.nio.file.Files.createTempDirectory("graft_wrtr").toString + "/t"
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cat", org.apache.spark.sql.types.StringType))))
    IcebergWriter.append(s, url,
      (1L to 100L).map(i => (i, s"c${i % 3}")).toDF("k", "cat").coalesce(1))
    IcebergWriter.deleteRows(s, url,
      Pruning.And(Pruning.GtEq("k", 40), Pruning.Lt("k", 60)))
    val t = IcebergTable.load(s, url)
    // DuckDB replays the position deletes itself (file-key + row-number
    // anti-join) — an independent merge-on-read implementation over the
    // same written bytes
    dynamicOracle("ice_write_delete_rows") =
      s"""SELECT k, cat, CAST(80 AS BIGINT) AS rows_from_stats,
         |  CAST(1 AS BIGINT) AS n_delete_files,
         |  CAST(100 AS BIGINT) AS rows_before, 'delete' AS operation
         |FROM (${duckLiveRows(t, Seq("k", "cat"))}) ORDER BY k""".stripMargin
    t.read()
      .withColumn("rows_from_stats", lit(t.countFromStats().getOrElse(-1L)))
      .withColumn("n_delete_files", lit(t.positionDeleteFiles.size.toLong))
      .withColumn("rows_before", lit(t.snapshotRelative(-1).read().count()))
      .withColumn("operation", lit(t.summary.getOrElse("operation", "")))
      .orderBy("k")
  }

  /** Iceberg v3 READ TOLERANCE + ns WRITE (rounds 13-14): a v3 table whose
    * schema grows an `unknown` column and nanosecond-timestamp columns
    * AFTER data was written must keep reading — `unknown` is the v3
    * always-null placeholder (NullType), ns timestamps surface as raw
    * int64 nanos (and read null from pre-add files) — v4 metadata is
    * REFUSED instead of misread, and WRITTEN ns values (beyond the µs
    * range a truncating path would corrupt) round-trip verbatim with
    * harvested bounds. The oracle replays the written parquet in DuckDB
    * (union_by_name nulls the pre-add rows' ns columns). */
  def iceV3Types(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter, TableMetadata}
    val url = java.nio.file.Files.createTempDirectory("graft_v3t").toString + "/t"
    val src = s.read.parquet(s"$dir/region.parquet")
      .select("r_regionkey", "r_name")
    IcebergWriter.createTable(s, url, src.schema)
    IcebergWriter.append(s, url, src.coalesce(1))
    IcebergWriter.upgradeFormatVersion(s, url, 3)
    IcebergWriter.addColumn(s, url, "u", "unknown")
    IcebergWriter.addColumn(s, url, "ts_ns", "timestamp_ns")
    IcebergWriter.addColumn(s, url, "tstz_ns", "timestamptz_ns")
    // WRITE nanosecond values (round-14): int64 nanos beyond the µs range
    // a µs-truncating path would corrupt — written, bounds-harvested, and
    // read back verbatim (pre-add rows keep reading null)
    import s.implicits._
    IcebergWriter.append(s, url, (5 to 8).map(i =>
        (i, s"extra$i", i * 1000000000L + 123L, -(i * 1000000000L) - 456L))
      .toDF("r_regionkey", "r_name", "ts_ns", "tstz_ns").coalesce(1))
    val t = IcebergTable.load(s, url)
    val st = t.schema
    require(st("u").dataType == org.apache.spark.sql.types.NullType &&
      st("ts_ns").dataType == org.apache.spark.sql.types.LongType &&
      st("tstz_ns").dataType == org.apache.spark.sql.types.LongType,
      s"v3 tolerance mapping broke: $st")
    val tsId = t.iceSchema.fields.find(_.name == "ts_ns").get.id
    require(t.liveFiles().exists(_.lowerBounds.contains(tsId)),
      "written ns-timestamp column must carry harvested bounds")
    // a v4 doctoring of the SAME metadata must refuse, not misread
    val metaJson = {
      val p = java.nio.file.Paths.get(s"$url/metadata/v${t.version}.metadata.json")
      java.nio.file.Files.readString(p)
    }
    val v4Refused = scala.util.Try(TableMetadata.parse(
      metaJson.replaceFirst("\"format-version\"\\s*:\\s*3", "\"format-version\": 4")))
      .failed.toOption.exists(_.getMessage.contains("format-version 4"))
    val dataFiles = t.liveFiles().map(f => t.resolvePath(f.filePath))
    // union_by_name: the pre-add file lacks the ns columns entirely, so
    // DuckDB yields NULL for its rows — exactly the tolerance contract —
    // while the written file's int64 nanos replay verbatim
    dynamicOracle("ice_v3_types") =
      s"""SELECT r_regionkey, r_name, TRUE AS u_null, ts_ns, tstz_ns,
         |  TRUE AS v4_refused, CAST(3 AS INTEGER) AS format_version
         |FROM read_parquet(${sqlPaths(dataFiles)}, union_by_name=true)
         |ORDER BY r_regionkey""".stripMargin
    t.read()
      .select(col("r_regionkey"), col("r_name"),
        col("u").isNull.as("u_null"),
        col("ts_ns"), col("tstz_ns"))
      .withColumn("v4_refused", lit(v4Refused))
      .withColumn("format_version", lit(t.metadata.formatVersion))
      .orderBy("r_regionkey")
  }

  /** Iceberg TABLE STATISTICS: per-column NDV theta sketches
    * (`apache-datasketches-theta-v1`, the spec's sketch family) written to
    * a puffin statistics file, registered in metadata, and surfaced to the
    * CBO as DSv2 column stats. BOUNDED-ERROR oracle: the exact NDVs are
    * recomputed independently by DuckDB; the sketch estimates must land
    * within 5% (default theta lgK → ~1.6%), with the flags zeroed (and the
    * hash broken) on violation. */
  def iceStatsNdv(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter, Maintenance, TableStatistics}
    import s.implicits._
    val url = java.nio.file.Files.createTempDirectory("graft_ndv").toString + "/t"
    val src = s.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_nationkey", "c_mktsegment")
    IcebergWriter.createTable(s, url, src.schema)
    IcebergWriter.append(s, url, src.repartition(4))
    val ndvs = Maintenance.computeStatistics(s, url)
    val t = IcebergTable.load(s, url)
    val entry = t.metadata.statistics.head
    require(entry.snapshotId == t.currentSnapshot.snapshotId)
    val byName = t.iceSchema.fields.map(f => f.name -> f.id).toMap
    val exact = src.select(
      countDistinct(col("c_custkey")), countDistinct(col("c_nationkey")),
      countDistinct(col("c_mktsegment"))).head()
    val rows = Seq("c_custkey", "c_nationkey", "c_mktsegment").zipWithIndex.map {
      case (c, i) =>
        val e = exact.getLong(i)
        val ndv = ndvs(byName(c))
        (c, e, math.abs(ndv - e).toDouble / e <= 0.05,
          entry.blobs.find(_.fields.headOption.contains(byName(c)))
            .map(_.blobType).getOrElse("MISSING"))
    }
    dynamicOracle("ice_stats_ndv") = Seq("c_custkey", "c_nationkey", "c_mktsegment")
      .map(c =>
        s"""SELECT '$c' AS col_name,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS exact_ndv,
           |  TRUE AS ndv_within_5pct,
           |  '${TableStatistics.ThetaBlobType}' AS blob_type FROM customer""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    rows.toDF("col_name", "exact_ndv", "ndv_within_5pct", "blob_type")
      .orderBy("col_name")
  }

  /** Iceberg PARTITION STATISTICS file (spec): per-partition counts from
    * manifests alone, persisted as the spec's sorted parquet and
    * registered under `partition-statistics`. The oracle replays
    * per-partition record counts from the SOURCE rows in DuckDB and pins
    * the consistency facts (file-count agreement with the `partitions`
    * metadata table, spec binding) as flags the Spark side zeroes on
    * violation. */
  def icePartitionStats(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter, Maintenance, PartitionStatistics, Pruning}
    val url = java.nio.file.Files.createTempDirectory("graft_pst").toString + "/t"
    val src = s.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    IcebergWriter.createTable(s, url, src.schema,
      partitions = Seq(("o_orderstatus", "identity")))
    IcebergWriter.append(s, url, src.repartition(2))
    // a v3 DV delete commit: every deletion vector references ONE data
    // file, so the writer stamps each entry with that file's partition —
    // per-partition delete counts (and the exact post-delete total)
    // attribute instead of being excluded as cross-partition
    IcebergWriter.upgradeFormatVersion(s, url, 3)
    IcebergWriter.deleteRows(s, url, Pruning.Lt("o_totalprice", 30000.0))
    Maintenance.computePartitionStatistics(s, url)
    val t = IcebergTable.load(s, url)
    require(t.positionDeleteFiles.nonEmpty && t.positionDeleteFiles.forall(_.isDv),
      "partition-stats contract expects DV delete carriers")
    val stats = PartitionStatistics.read(s, t, t.currentSnapshot.snapshotId)
      .getOrElse(sys.error("partition statistics not registered"))
    // file counts must agree with the partitions metadata table — the
    // independent manifest consumer
    val metaCounts = t.partitionStats()
      .selectExpr("o_orderstatus", "n_files", "n_records").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    stats.selectExpr("partition.o_orderstatus AS o_orderstatus",
        "data_record_count", "data_file_count", "spec_id",
        "position_delete_record_count", "total_record_count")
      .collect().toSeq.map { r =>
        val k = r.getString(0)
        require(!r.isNullAt(4) && !r.isNullAt(5),
          "partition-scoped DV deletes must yield non-null delete and " +
            s"total counts for partition $k")
        (k, r.getLong(1), r.getLong(4), r.getLong(5),
          metaCounts.get(k).exists(m =>
            m._1 == r.getInt(2).toLong && m._2 == r.getLong(1)),
          r.getInt(3) == t.metadata.defaultSpecId)
      }
      .sortBy(_._1) match { case rows =>
        import s.implicits._
        dynamicOracle("ice_partition_stats") =
          """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS data_record_count,
            |  CAST(SUM(CASE WHEN o_totalprice < 30000 THEN 1 ELSE 0 END) AS BIGINT)
            |    AS position_delete_record_count,
            |  CAST(SUM(CASE WHEN o_totalprice < 30000 THEN 0 ELSE 1 END) AS BIGINT)
            |    AS total_record_count,
            |  TRUE AS matches_partitions_table, TRUE AS spec_bound
            |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
        rows.toDF("o_orderstatus", "data_record_count",
          "position_delete_record_count", "total_record_count",
          "matches_partitions_table", "spec_bound")
          .orderBy("o_orderstatus")
      }
  }

  /** Iceberg v3 VARIANT type: semi-structured payloads as a first-class
    * column. `createTable` auto-raises the table to format v3 (variant is
    * a v3-only type, and v3 metadata gets next-row-id from birth); Spark's
    * parquet variant group writes field-id-stamped and reads back through
    * the DSv2 scan; typed access via `variant_get`, full JSON via
    * `to_json`. The oracle recomputes every output — including the JSON
    * text, byte for byte — from the SOURCE parquet in DuckDB. */
  def iceVariant(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter}
    val url = java.nio.file.Files.createTempDirectory("graft_var").toString + "/t"
    val withVar = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        expr("parse_json(to_json(struct(doc_id, lang, n_chars)))").as("payload"))
    IcebergWriter.createTable(s, url, withVar.schema)
    val t0 = IcebergTable.load(s, url)
    require(t0.metadata.formatVersion == 3 && t0.metadata.nextRowId.isDefined,
      s"variant schema must birth a v3 table with next-row-id, got v${t0.metadata.formatVersion}")
    IcebergWriter.append(s, url, withVar.coalesce(2))
    val t = IcebergTable.load(s, url)
    require(t.schema("payload").dataType == org.apache.spark.sql.types.VariantType,
      s"variant must read back as VariantType: ${t.schema("payload").dataType}")
    dynamicOracle("ice_variant") =
      """SELECT doc_id, lang, n_chars,
        |  '{"doc_id":' || doc_id || ',"lang":"' || lang ||
        |  '","n_chars":' || n_chars || '}' AS js,
        |  CAST(3 AS INTEGER) AS format_version
        |FROM documents ORDER BY doc_id""".stripMargin
    t.read()
      .select(col("doc_id"),
        expr("variant_get(payload, '$.lang', 'string')").as("lang"),
        expr("variant_get(payload, '$.n_chars', 'long')").as("n_chars"),
        to_json(col("payload")).as("js"))
      .withColumn("format_version", lit(t.metadata.formatVersion))
      .orderBy("doc_id")
  }

  /** Iceberg v3 DELETION VECTORS: two overlapping row-level deletes on a
    * v3 table — the second supersedes the first file's DV with a MERGED
    * roaring bitmap (prior ∪ fresh), leaving exactly one live DV. The
    * oracle replays the puffin blob from the WRITTEN BYTES through the
    * standalone (non-library) roaring decoder into a DuckDB VALUES
    * anti-join — an independent merge-on-read of the v3 carrier. */
  def iceWriteDv(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter, Pruning}
    import s.implicits._
    val url = java.nio.file.Files.createTempDirectory("graft_wdv").toString + "/t"
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cat", org.apache.spark.sql.types.StringType))))
    IcebergWriter.append(s, url,
      (1L to 100L).map(i => (i, s"c${i % 3}")).toDF("k", "cat").coalesce(1))
    IcebergWriter.upgradeFormatVersion(s, url, 3)
    IcebergWriter.deleteRows(s, url,
      Pruning.And(Pruning.GtEq("k", 40L), Pruning.Lt("k", 60L))) // 20 rows
    IcebergWriter.deleteRows(s, url,
      Pruning.And(Pruning.GtEq("k", 50L), Pruning.Lt("k", 70L))) // +10 net-new
    val t = IcebergTable.load(s, url)
    val dvs = t.positionDeleteFiles.filter(_.isDv)
    require(dvs.size == 1 && t.positionDeleteFiles.size == 1,
      s"v3 supersede must leave exactly one live DV, got ${t.positionDeleteFiles}")
    require(dvs.head.recordCount == 30L,
      s"merged DV must hold prior ∪ fresh (30), got ${dvs.head.recordCount}")
    dynamicOracle("ice_write_dv") =
      s"""SELECT k, cat, CAST(70 AS BIGINT) AS rows_from_stats,
         |  CAST(1 AS BIGINT) AS n_dv_blobs, CAST(30 AS BIGINT) AS dv_rows,
         |  CAST(3 AS INTEGER) AS format_version, CAST(10 AS BIGINT) AS net_new
         |FROM (${duckLiveRows(t, Seq("k", "cat"))}) ORDER BY k""".stripMargin
    t.read()
      .withColumn("rows_from_stats", lit(t.countFromStats().getOrElse(-1L)))
      .withColumn("n_dv_blobs", lit(dvs.size.toLong))
      .withColumn("dv_rows", lit(dvs.map(_.recordCount).sum))
      .withColumn("format_version", lit(t.metadata.formatVersion))
      .withColumn("net_new",
        lit(t.summary.getOrElse("added-position-deletes", "-1").toLong))
      .orderBy("k")
  }

  /** v3 delete-state CONSOLIDATION across carriers: a v2 parquet position
    * delete survives the format upgrade, fresh deletes land as DVs, then
    * `rewritePositionDeletes` folds BOTH carriers into ONE puffin (one
    * merged blob per surviving data file — the v3 rule that rewritten
    * position deletes become DVs). The oracle replays the post-rewrite
    * state from the written puffin bytes. */
  def iceDvRewrite(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter, Pruning}
    import s.implicits._
    val url = java.nio.file.Files.createTempDirectory("graft_dvrw").toString + "/t"
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cat", org.apache.spark.sql.types.StringType))))
    // two data files so the consolidated puffin holds two blobs
    IcebergWriter.append(s, url,
      (1L to 50L).map(i => (i, s"c${i % 3}")).toDF("k", "cat").coalesce(1))
    IcebergWriter.append(s, url,
      (51L to 100L).map(i => (i, s"d${i % 3}")).toDF("k", "cat").coalesce(1))
    IcebergWriter.deleteRows(s, url, Pruning.Lt("k", 6L)) // v2 parquet carrier
    IcebergWriter.upgradeFormatVersion(s, url, 3)
    IcebergWriter.deleteRows(s, url, Pruning.In("k", Seq(10L, 60L, 61L))) // DVs
    val mixed = IcebergTable.load(s, url)
    require(mixed.positionDeleteFiles.count(_.isDv) == 2 &&
      mixed.positionDeleteFiles.count(!_.isDv) == 1,
      s"expected 2 DV blobs + 1 parquet carrier, got ${mixed.positionDeleteFiles}")
    IcebergWriter.rewritePositionDeletes(s, url)
    val t = IcebergTable.load(s, url)
    val dels = t.positionDeleteFiles
    require(dels.forall(_.isDv) && dels.map(_.filePath).distinct.size == 1,
      s"rewrite must leave one all-DV puffin, got $dels")
    dynamicOracle("ice_dv_rewrite") =
      s"""SELECT k, cat, CAST(92 AS BIGINT) AS rows_from_stats,
         |  CAST(2 AS BIGINT) AS n_dv_blobs, CAST(1 AS BIGINT) AS n_carriers,
         |  CAST(8 AS BIGINT) AS dv_rows
         |FROM (${duckLiveRows(t, Seq("k", "cat"))}) ORDER BY k""".stripMargin
    t.read()
      .withColumn("rows_from_stats", lit(t.countFromStats().getOrElse(-1L)))
      .withColumn("n_dv_blobs", lit(dels.size.toLong))
      .withColumn("n_carriers", lit(dels.map(_.filePath).distinct.size.toLong))
      .withColumn("dv_rows", lit(dels.map(_.recordCount).sum))
      .orderBy("k")
  }

  /** Iceberg v3 DEFAULT VALUES: `initial-default` (pre-add files read the
    * default — Spark existence-default fill, zero per-row cost in new
    * files), actual values and EXPLICIT NULLS in post-add files untouched,
    * and `write-default` (a writer omitting the column gets it stamped
    * physically). The oracle replays the semantics independently: DuckDB
    * reads the raw files and applies the default per FILE, with the
    * pre-add file set derived from manifest value-counts alone. */
  def iceDefaults(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter}
    import s.implicits._
    val url = java.nio.file.Files.createTempDirectory("graft_dflt").toString + "/t"
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cat", org.apache.spark.sql.types.StringType))))
    IcebergWriter.append(s, url, // pre-add file: reads must yield defaults
      (1L to 40L).map(i => (i, s"c${i % 3}")).toDF("k", "cat").coalesce(1))
    IcebergWriter.upgradeFormatVersion(s, url, 3)
    IcebergWriter.addColumn(s, url, "score", "long", default = Some(7L))
    IcebergWriter.addColumn(s, url, "label", "string", default = Some("base"))
    IcebergWriter.append(s, url, // post-add file: actual values + explicit null
      Seq((41L, "c1", Some(99L), "tagged"), (42L, "c2", None: Option[Long], "tagged"))
        .toDF("k", "cat", "score", "label").coalesce(1))
    IcebergWriter.append(s, url, // writer omits both columns: write-default
      Seq((43L, "c0")).toDF("k", "cat").coalesce(1))
    val t = IcebergTable.load(s, url)
    val scoreId = t.iceSchema.fields.find(_.name == "score").get.id
    // pre-add files from MANIFEST STATS alone: no value count for the id
    val preAdd = t.liveFiles().filter(f => !f.valueCounts.contains(scoreId))
      .map(f => t.resolvePath(f.filePath).split("/data/").last)
    require(preAdd.size == 1, s"expected one pre-add file, got $preAdd")
    val all = sqlPaths(t.liveFiles().map(f => t.resolvePath(f.filePath)))
    val inList = preAdd.map(p => "'" + p.replace("'", "''") + "'").mkString(", ")
    dynamicOracle("ice_defaults") =
      s"""SELECT k, cat,
         |  CASE WHEN str_split(filename, '/data/')[-1] IN ($inList)
         |       THEN CAST(7 AS BIGINT) ELSE score END AS score,
         |  CASE WHEN str_split(filename, '/data/')[-1] IN ($inList)
         |       THEN 'base' ELSE label END AS label
         |FROM read_parquet($all, union_by_name=true, filename=true)
         |ORDER BY k""".stripMargin
    t.read().select("k", "cat", "score", "label").orderBy("k")
  }

  /** Iceberg v3 ROW LINEAGE: `_row_id` / `_last_updated_sequence_number`
    * over a history of pre-lineage append → upgrade → appends → DV delete
    * → compaction (ids carried as MATERIALIZED columns) → post-compaction
    * append (ids inherited from the manifest base). The oracle replays the
    * whole rule set in DuckDB: COALESCE(materialized column, per-file
    * first_row_id + file_row_number) with the bases shipped as a VALUES
    * table from manifest metadata alone. */
  def iceRowLineage(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter, Maintenance, Pruning}
    import s.implicits._
    val url = java.nio.file.Files.createTempDirectory("graft_rlq").toString + "/t"
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cat", org.apache.spark.sql.types.StringType))))
    IcebergWriter.append(s, url, // pre-lineage rows: ids assigned on rewrite
      (1L to 10L).map(i => (i, s"c${i % 3}")).toDF("k", "cat").coalesce(1))
    IcebergWriter.upgradeFormatVersion(s, url, 3)
    IcebergWriter.append(s, url,
      (11L to 40L).map(i => (i, s"c${i % 3}")).toDF("k", "cat").coalesce(1))
    IcebergWriter.deleteRows(s, url,
      Pruning.And(Pruning.GtEq("k", 20L), Pruning.Lt("k", 25L))) // DV
    Maintenance.compact(s, url, targetFiles = Some(1)) // materializes lineage
    IcebergWriter.append(s, url, // inherited ids after the rewrite
      (41L to 50L).map(i => (i, s"c${i % 3}")).toDF("k", "cat").coalesce(1))
    val t = IcebergTable.load(s, url)
    require(t.positionDeleteFiles.isEmpty, "compaction folded the DV")
    def fkey(p: String): String = p.split("/data/").last
    val bases = t.liveFiles().map { f =>
      val first = f.firstRowId.map(_.toString).getOrElse("CAST(NULL AS BIGINT)")
      s"('${fkey(t.resolvePath(f.filePath)).replace("'", "''")}', $first, " +
        s"${t.dataSequenceOf(f)})"
    }.mkString(", ")
    val all = sqlPaths(t.liveFiles().map(f => t.resolvePath(f.filePath)))
    dynamicOracle("ice_row_lineage") =
      s"""SELECT k, cat,
         |  COALESCE(_row_id, _v.first + file_row_number) AS _row_id,
         |  COALESCE(_last_updated_sequence_number, _v.seq)
         |    AS _last_updated_sequence_number
         |FROM read_parquet($all, union_by_name=true, filename=true,
         |                  file_row_number=true) _d
         |JOIN (VALUES $bases) _v(fkey, first, seq)
         |  ON _v.fkey = str_split(_d.filename, '/data/')[-1]
         |ORDER BY k""".stripMargin
    t.read().select(col("k"), col("cat"), col("_row_id"),
      col("_last_updated_sequence_number")).orderBy("k")
  }

  /** MERGE / upsert keyed on `k`: matched rows superseded via v2 position
    * deletes, new keys inserted — one snapshot. */
  def iceWriteMerge(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter}
    import s.implicits._
    val url = java.nio.file.Files.createTempDirectory("graft_mrg").toString + "/t"
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cat", org.apache.spark.sql.types.StringType))))
    IcebergWriter.append(s, url,
      (1L to 50L).map(i => (i, s"old${i % 5}")).toDF("k", "cat").coalesce(1))
    IcebergWriter.merge(s, url,
      ((40L to 55L).map(i => (i, "upserted"))).toDF("k", "cat"), Seq("k"))
    val t = IcebergTable.load(s, url)
    dynamicOracle("ice_write_merge") =
      s"""SELECT k, cat, CAST(55 AS BIGINT) AS rows_from_stats,
         |  CAST(50 AS BIGINT) AS rows_before, CAST(2 AS BIGINT) AS n_snapshots,
         |  '11' AS pos_deletes
         |FROM (${duckLiveRows(t, Seq("k", "cat"))}) ORDER BY k""".stripMargin
    t.read()
      .withColumn("rows_from_stats", lit(t.countFromStats().getOrElse(-1L)))
      .withColumn("rows_before", lit(t.snapshotRelative(-1).read().count()))
      .withColumn("n_snapshots", lit(t.snapshots.size.toLong))
      .withColumn("pos_deletes", lit(t.summary.getOrElse("added-position-deletes", "")))
      .orderBy("k")
  }

  /** Storage-partitioned join E2E: orders and customer land in two Iceberg
    * tables bucketed 8 ways on custkey; with data grouping enabled the join
    * plans with ZERO shuffles (recorded in the emitted `join_shuffles`
    * column and checked by the DuckDB oracle's literal 0) and the values
    * match a plain join over the source parquet. The 100 TB shape: two
    * co-bucketed fact tables merge locally per bucket, no exchange. */
  def iceSpjJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.IcebergWriter
    val base = java.nio.file.Files.createTempDirectory("graft_spj").toString
    val orders = Queries.t(s, dir, "orders").select("o_custkey", "o_totalprice")
    val cust = Queries.t(s, dir, "customer").select("c_custkey", "c_mktsegment")
    IcebergWriter.createTable(s, s"$base/o", orders.schema, Seq("o_custkey" -> "bucket[8]"))
    IcebergWriter.append(s, s"$base/o", orders)
    IcebergWriter.createTable(s, s"$base/c", cust.schema, Seq("c_custkey" -> "bucket[8]"))
    IcebergWriter.append(s, s"$base/c", cust)

    // a path catalog over the temp warehouse: SPJ's bucket transform
    // resolves through the catalog's FunctionCatalog (path-based reads
    // cannot resolve it, so the join would shuffle)
    val catName = s"spj${base.hashCode.toHexString}"
    val confs = Seq(
      s"spark.sql.catalog.$catName" -> "graft.sources.GraftIcebergPathCatalog",
      s"spark.sql.catalog.$catName.warehouse" -> base,
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.graft.iceberg.preserveDataGrouping" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val before = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val o = s.table(s"$catName.o")
      val c = s.table(s"$catName.c")
      val joined = o.join(c, col("o_custkey") === col("c_custkey"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.size
      val agg = joined.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), Queries.dsum(col("o_totalprice"), 2).as("revenue"))
        .withColumn("join_shuffles", lit(shuffles))
        .orderBy("c_mktsegment")
      // execute NOW, inside the conf scope, so the plan shape is the tested one
      val rows = agg.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), agg.schema)
    } finally before.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** SQL DML round-trip through the V2 catalog table: CREATE TABLE, two
    * `INSERT INTO ... SELECT` commits (each an Iceberg append snapshot
    * through the writer's optimistic commit loop), then a SQL aggregate
    * read back through the same catalog — the flow a SQL user runs first.
    * The DuckDB oracle replays the same dataflow over the source parquet. */
  def iceSqlInsert(s: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("graft_sqlins").toString
    val cat = s"ins${wh.hashCode.toHexString}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      Queries.t(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .createOrReplaceTempView("g_sqlins_nation")
      s.sql(s"CREATE TABLE $cat.db.nat (n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)")
      s.sql(s"INSERT INTO $cat.db.nat " +
        "SELECT CAST(n_nationkey AS BIGINT), n_name, CAST(n_regionkey AS BIGINT) " +
        "FROM g_sqlins_nation")
      s.sql(s"INSERT INTO $cat.db.nat " +
        "SELECT CAST(n_nationkey + 100 AS BIGINT), n_name, CAST(n_regionkey AS BIGINT) " +
        "FROM g_sqlins_nation WHERE n_regionkey = 0")
      s.sql(s"SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n, " +
        s"CAST(SUM(n_nationkey) AS BIGINT) AS sum_key " +
        s"FROM $cat.db.nat GROUP BY n_regionkey ORDER BY n_regionkey")
    } finally {
      s.catalog.dropTempView("g_sqlins_nation")
    }
  }

  /** Iceberg v2 EQUALITY-delete upsert (streaming-CDC shape): every nation
    * key in the source is superseded WITHOUT reading or rewriting any data
    * file — the commit writes only the new rows and a key-list delete file;
    * the merge happens at read time with commit-sequence scoping. The
    * `old_files_intact` literal (checked by the oracle's 1) pins the
    * no-rewrite property; the row values replay in DuckDB. */
  def iceWriteEqDelete(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter}
    val url = java.nio.file.Files.createTempDirectory("graft_eqd").toString + "/t"
    val nation = Queries.t(s, dir, "nation")
      .selectExpr("CAST(n_nationkey AS BIGINT) AS n_nationkey", "n_name",
        "CAST(n_regionkey AS BIGINT) AS n_regionkey")
    IcebergWriter.createTable(s, url, nation.schema)
    IcebergWriter.append(s, url, nation.coalesce(1))
    val filesBefore = IcebergTable.load(s, url).liveFiles().map(_.filePath).toSet

    // upsert: rename every nation of region 0 and add a synthetic one
    val updates = nation.filter(col("n_regionkey") === 0)
      .withColumn("n_name", concat(lit("NEW_"), col("n_name")))
      .unionAll(s.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(999L, "ATLANTIS", 0L)),
        nation.schema))
    IcebergWriter.upsert(s, url, updates.coalesce(1), Seq("n_nationkey"))

    val t = IcebergTable.load(s, url)
    val intact = filesBefore.subsetOf(t.liveFiles().map(_.filePath).toSet)
    val read = t.read()
    // the merge-on-read scan must stay COLUMNAR under equality deletes
    // (key-probe selection view) — pinned via the oracle's literal 1
    val columnar = read.queryExecution.executedPlan.collectFirst {
      case c: org.apache.spark.sql.execution.ColumnarToRowExec => c
    }.isDefined
    // FOREIGN replay: DuckDB reads the WRITTEN files back and re-applies
    // the equality deletes itself (sequence-scoped key anti-join in
    // duckLiveRows) — an independent-reader proof, not a re-derivation
    // from the source table. The literal 1s stay CONSTANT in the SQL so a
    // rewritten file or a de-vectorized scan still hash-mismatches.
    dynamicOracle("ice_write_eq_delete") =
      s"""SELECT n_nationkey, n_name, n_regionkey,
         |  CAST(1 AS INTEGER) AS old_files_intact,
         |  CAST(1 AS INTEGER) AS scan_columnar
         |FROM (${duckLiveRows(t, Seq("n_nationkey", "n_name", "n_regionkey"))})
         |ORDER BY n_nationkey""".stripMargin
    read
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
        (if (intact) lit(1) else lit(0)).as("old_files_intact"),
        (if (columnar) lit(1) else lit(0)).as("scan_columnar"))
      .orderBy("n_nationkey")
  }

  /** COMPOSITE-KEY equality deletes across TWO upsert commits: key =
    * (n_nationkey, n_regionkey), so each delete file carries a two-column
    * key list and a distinct commit sequence. The second upsert supersedes
    * one of the first upsert's own rows — sequence scoping must let the
    * later row win while the first commit's other rows survive. The oracle
    * is the FOREIGN replay: DuckDB re-applies both delete files from the
    * written bytes (multi-column IS NOT DISTINCT FROM anti-joins in
    * [[duckLiveRows]]), proving the replay generalizes past single-key
    * deletes. */
  def iceWriteEqDeleteMulti(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter}
    val url = java.nio.file.Files.createTempDirectory("graft_eqm").toString + "/t"
    val nation = Queries.t(s, dir, "nation")
      .selectExpr("CAST(n_nationkey AS BIGINT) AS n_nationkey", "n_name",
        "CAST(n_regionkey AS BIGINT) AS n_regionkey")
    IcebergWriter.createTable(s, url, nation.schema)
    IcebergWriter.append(s, url, nation.coalesce(1))
    // first upsert: rename every region-1 nation (composite key)
    val up1 = nation.filter(col("n_regionkey") === 1)
      .withColumn("n_name", concat(lit("V1_"), col("n_name")))
    IcebergWriter.upsert(s, url, up1.coalesce(1),
      Seq("n_nationkey", "n_regionkey"))
    // second upsert: supersede ONE of those again + add a synthetic row
    val minKey = up1.agg(min(col("n_nationkey"))).head().getLong(0)
    val up2 = up1.filter(col("n_nationkey") === minKey)
      .withColumn("n_name", concat(lit("V2_"), col("n_name")))
      .unionAll(s.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(998L, "LEMURIA", 1L)),
        nation.schema))
    IcebergWriter.upsert(s, url, up2.coalesce(1),
      Seq("n_nationkey", "n_regionkey"))

    val t = IcebergTable.load(s, url)
    val nEqFiles = t.equalityDeleteFiles.size.toLong
    dynamicOracle("ice_write_eq_multi") =
      s"""SELECT n_nationkey, n_name, n_regionkey,
         |  CAST(2 AS BIGINT) AS n_eq_delete_files
         |FROM (${duckLiveRows(t, Seq("n_nationkey", "n_name", "n_regionkey"))})
         |ORDER BY n_nationkey""".stripMargin
    t.read()
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
        lit(nEqFiles).as("n_eq_delete_files"))
      .orderBy("n_nationkey")
  }

  /** Snapshot refs E2E: tag the nation snapshot, keep committing, read the
    * pinned tag vs the moving main branch. The oracle replays both row
    * counts from the source parquet (tag = nation, main = nation + the
    * re-appended region-0 rows). */
  def iceRefs(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter}
    import s.implicits._
    val url = java.nio.file.Files.createTempDirectory("graft_refsq").toString + "/t"
    val nation = Queries.t(s, dir, "nation")
      .selectExpr("CAST(n_nationkey AS BIGINT) AS n_nationkey", "n_name",
        "CAST(n_regionkey AS BIGINT) AS n_regionkey")
    IcebergWriter.createTable(s, url, nation.schema)
    IcebergWriter.append(s, url, nation)
    IcebergWriter.tag(s, url, "baseline")
    IcebergWriter.append(s, url, nation.filter(col("n_regionkey") === 0))
    val t = IcebergTable.load(s, url)
    Seq((t.atTag("baseline").read().count(),
        t.atBranch("main").read().count(),
        t.refs.size.toLong,
        if (t.refs("main").snapshotId == t.currentSnapshot.snapshotId) 1L else 0L))
      .toDF("rows_at_tag", "rows_at_main", "n_refs", "main_is_current")
  }

  /** WRITE-AUDIT-PUBLISH round-trip: region-0 rows stage on an `audit`
    * branch (main readers see nothing), the staged state is audited through
    * the branch read, then `fastForward` publishes atomically. The isolation
    * facts are pinned as literals; the oracle recomputes the final published
    * state from the source parquet. */
  def iceWap(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter}
    val url = java.nio.file.Files.createTempDirectory("graft_wapq").toString + "/t"
    val nation = Queries.t(s, dir, "nation")
      .selectExpr("CAST(n_nationkey AS BIGINT) AS n_nationkey", "n_name",
        "CAST(n_regionkey AS BIGINT) AS n_regionkey")
    IcebergWriter.createTable(s, url, nation.schema)
    IcebergWriter.append(s, url, nation)
    IcebergWriter.appendToBranch(s, url,
      nation.filter(col("n_regionkey") === 0), "audit")
    val staged = IcebergTable.load(s, url)
    val nBase = nation.count()
    val nStagedRows = nation.filter(col("n_regionkey") === 0).count()
    val mainUnchanged = staged.read().count() == nBase
    val auditSaw = staged.atBranch("audit").read().count() == nBase + nStagedRows
    // TIMESTAMP AS OF must resolve MAIN ancestors only: with the branch
    // snapshot staged (and newer than main's head), a now-timestamp must
    // still land on main's head, not leak the unpublished audit rows
    val asOfSkipsStaged = staged
      .asOfTimestamp(System.currentTimeMillis() + 60000).read().count() == nBase
    IcebergWriter.fastForward(s, url, "audit")
    val t = IcebergTable.load(s, url)
    t.read()
      .withColumn("main_unchanged_while_staged", lit(if (mainUnchanged) 1L else 0L))
      .withColumn("audit_saw_staged", lit(if (auditSaw) 1L else 0L))
      .withColumn("asof_skips_staged", lit(if (asOfSkipsStaged) 1L else 0L))
      .orderBy("n_nationkey")
  }

  /** The TABLE-MIGRATION procedure family end-to-end (Iceberg's snapshot /
    * migrate / register_table over a raw parquet layout): `snapshot`
    * registers the source files IN PLACE (metadata-only — pinned by the
    * `snapshot_in_place` flag), `migrate` folds them into a self-contained
    * table owning native files (`migrate_self_contained`), and
    * `register_table` adopts the migrated table's metadata under a new
    * catalog name without moving a data file (`register_shares_files`),
    * and `rewrite_table_path` stages a DR copy whose emitted plan, once
    * executed, serves the same rows from the target prefix
    * (`rewrite_path_roundtrip`). Rows come back through the REGISTERED
    * entry, so the oracle's nation replay also proves the adopted
    * metadata serves the same bytes. */
  def iceMigrate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val wh = java.nio.file.Files.createTempDirectory("graft_migq").toString
    val cat = s"mq${wh.hashCode.toHexString}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val src = s"$wh/_src"
    Queries.t(s, dir, "nation")
      .selectExpr("CAST(n_nationkey AS BIGINT) AS n_nationkey", "n_name",
        "CAST(n_regionkey AS BIGINT) AS n_regionkey")
      .repartition(3).write.parquet(src)

    s.sql(s"CALL $cat.system.snapshot(table => 'db.snap', source_dir => '$src')")
    s.sql(s"CALL $cat.system.migrate(table => 'db.mig', source_dir => '$src')")
    val mig = graft.iceberg.IcebergTable.load(s, s"$wh/db/mig")
    s.sql(s"CALL $cat.system.register_table(table => 'db.reg', " +
      s"metadata_file => '$wh/db/mig/metadata/v${mig.version}.metadata.json')")

    val st = graft.iceberg.IcebergTable.load(s, s"$wh/db/snap")
    val snapInPlace = st.liveFiles().nonEmpty &&
      st.liveFiles().forall(f => st.resolvePath(f.filePath).contains("/_src"))
    val migSelf = mig.liveFiles().nonEmpty &&
      mig.liveFiles().forall(f => mig.resolvePath(f.filePath).contains("/data/"))
    val rt = graft.iceberg.IcebergTable.load(s, s"$wh/db/reg")
    val regShared = rt.liveFiles().nonEmpty &&
      rt.liveFiles().forall(f => rt.resolvePath(f.filePath).contains("db/mig"))

    // rewrite_table_path: stage a DR copy of the migrated table, execute
    // the emitted plan with plain filesystem copies, and prove the
    // relocated table serves the same rows from the target prefix
    val rrow = s.sql(s"CALL $cat.system.rewrite_table_path(" +
      s"table => 'db.mig', source_prefix => '$wh', " +
      s"target_prefix => '${wh}_copy')").collect().head
    graft.iceberg.RewriteTablePath.executeCopyPlan(
      rrow.getAs[String]("file_list_path"), s.sessionState.newHadoopConf())
    val moved = graft.iceberg.IcebergTable.load(s, s"${wh}_copy/db/mig")
    val relocated = moved.read().count() == rt.read().count() &&
      moved.liveFiles().nonEmpty && moved.liveFiles().forall(f =>
        moved.resolvePath(f.filePath).contains("_copy"))

    // AVRO-directory onboarding (round-18): the same rows written as a
    // foreign avro container dir (avro-core writer, nullable unions),
    // snapshot'd metadata-only — schema inferred from the EMBEDDED writer
    // schema, files referenced in place, rows identical to the parquet path
    val avroDir = s"$wh/_asrc"
    new java.io.File(avroDir).mkdirs()
    locally {
      import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
      val avroSchema = new org.apache.avro.Schema.Parser().parse(
        """{"type":"record","name":"nation","fields":[
          |{"name":"n_nationkey","type":"long"},
          |{"name":"n_name","type":["null","string"],"default":null},
          |{"name":"n_regionkey","type":["null","long"],"default":null}]}"""
          .stripMargin)
      val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](avroSchema))
      w.create(avroSchema, new java.io.File(s"$avroDir/part-0.avro"))
      Queries.t(s, dir, "nation")
        .selectExpr("CAST(n_nationkey AS BIGINT)", "n_name",
          "CAST(n_regionkey AS BIGINT)")
        .collect().foreach { r =>
          val rec = new GenericData.Record(avroSchema)
          rec.put("n_nationkey", r.getLong(0))
          rec.put("n_name", r.getString(1))
          rec.put("n_regionkey", r.getLong(2))
          w.append(rec)
        }
      w.close()
    }
    s.sql(s"CALL $cat.system.snapshot(table => 'db.asnap', " +
      s"source_dir => '$avroDir', format => 'avro')")
    val at = graft.iceberg.IcebergTable.load(s, s"$wh/db/asnap")
    val avroOk = at.liveFiles().nonEmpty &&
      at.liveFiles().forall(f => at.resolvePath(f.filePath).contains("/_asrc")) &&
      at.read().selectExpr("n_nationkey", "n_name", "n_regionkey")
        .collect().map(_.toString).sorted.toSeq ==
        rt.read().selectExpr("n_nationkey", "n_name", "n_regionkey")
          .collect().map(_.toString).sorted.toSeq

    s.table(s"$cat.db.reg")
      .withColumn("snapshot_in_place", lit(if (snapInPlace) 1L else 0L))
      .withColumn("migrate_self_contained", lit(if (migSelf) 1L else 0L))
      .withColumn("register_shares_files", lit(if (regShared) 1L else 0L))
      .withColumn("rewrite_path_roundtrip", lit(if (relocated) 1L else 0L))
      .withColumn("avro_snapshot_roundtrip", lit(if (avroOk) 1L else 0L))
      .orderBy("n_nationkey")
  }

  /** SQL row-level DML round-trip: UPDATE and MERGE INTO run Spark's
    * copy-on-write protocol against the V2 catalog table; DELETE takes the
    * position-delete path. The DuckDB oracle replays the same dataflow
    * over the source parquet. */
  def iceSqlDml(s: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("graft_sqldml").toString
    val cat = s"dml${wh.hashCode.toHexString}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      Queries.t(s, dir, "nation")
        .selectExpr("CAST(n_nationkey AS BIGINT) AS k", "n_name AS name",
          "CAST(n_regionkey AS BIGINT) AS r")
        .createOrReplaceTempView("g_dml_nation")
      s.sql(s"CREATE TABLE $cat.db.n (k BIGINT, name STRING, r BIGINT)")
      s.sql(s"INSERT INTO $cat.db.n SELECT k, name, r FROM g_dml_nation")
      s.sql(s"UPDATE $cat.db.n SET name = concat('U_', name) WHERE r = 1")
      s.sql(s"DELETE FROM $cat.db.n WHERE r = 4")
      s.sql(s"MERGE INTO $cat.db.n t " +
        "USING (SELECT k + 1000 AS k, name, r FROM g_dml_nation WHERE r = 2) s " +
        "ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      s.sql(s"SELECT k, name, r FROM $cat.db.n ORDER BY k")
    } finally s.catalog.dropTempView("g_dml_nation")
  }

  /** ICEBERG VIEWS (round 14, view spec v1): the full SQL lifecycle under
    * a session carrying [[graft.plans.GraftExtensions]] (the view DDL
    * surface lives there — vanilla Spark parses but cannot execute
    * V2-catalog view commands). CREATE VIEW → SELECT through it →
    * CREATE OR REPLACE with a changed definition (a NEW version appends to
    * the spec's `versions`/`version-log`; v1 stays auditable) → SELECT the
    * replaced definition. The oracle replays both definitions' rows from
    * nation and pins the version bookkeeping as literals. */
  def iceViews(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val wh = java.nio.file.Files.createTempDirectory("graft_viewq").toString
    val cat = s"vq${wh.hashCode.toHexString}"
    Queries.t(s, dir, "nation")
      .selectExpr("CAST(n_nationkey AS BIGINT) AS k", "n_name AS name",
        "CAST(n_regionkey AS BIGINT) AS r")
      .write.mode("overwrite").parquet(s"$wh/nation_src")
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
    try {
      ext.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
      ext.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      ext.read.parquet(s"$wh/nation_src").createOrReplaceTempView("g_vq_nation")
      ext.sql(s"CREATE TABLE $cat.db.n (k BIGINT, name STRING, r BIGINT)")
      ext.sql(s"INSERT INTO $cat.db.n SELECT k, name, r FROM g_vq_nation")
      ext.sql(s"CREATE VIEW $cat.db.high AS " +
        s"SELECT k, name, r FROM $cat.db.n WHERE r >= 2")
      val firstRows = ext.sql(s"SELECT count(*) FROM $cat.db.high").head().getLong(0)
      // ALTER VIEW ... AS is the second redefinition spelling: appends
      // version 2 exactly like CREATE OR REPLACE would
      ext.sql(s"ALTER VIEW $cat.db.high AS " +
        s"SELECT k, name, r, r * 10 AS r10 FROM $cat.db.n WHERE r < 2")
      val vm = graft.iceberg.IcebergViews.load(ext, s"$wh/db/high")
      val stmt = ext.sql(s"SHOW CREATE TABLE $cat.db.high").head().getString(0)
      val versionsOk =
        if (vm.currentVersionId == 2 && vm.versions.map(_.versionId) == Seq(1, 2) &&
          vm.versionAt(1).sql.contains("r >= 2") && vm.schemas.size == 2 &&
          stmt.startsWith("CREATE VIEW") && stmt.contains("r < 2")) 1L else 0L
      val shown = ext.sql(s"SHOW VIEWS IN $cat.db").count()
      ext.sql(s"SELECT k, name, r, CAST(r10 AS BIGINT) AS r10 " +
          s"FROM $cat.db.high ORDER BY k")
        .withColumn("first_def_rows", lit(firstRows))
        .withColumn("versions_ok", lit(versionsOk))
        .withColumn("views_shown", lit(shown))
    } finally {
      SparkSession.setActiveSession(s)
      SparkSession.setDefaultSession(s)
    }
  }

  /** The SQL TRANSFORM-FUNCTION family (round 14): Iceberg's
    * `bucket/truncate/years/months/days/hours` resolved from the catalog's
    * FunctionCatalog and applied to orders columns. truncate and the time
    * transforms replay EXACTLY in DuckDB (floored arithmetic, 1970
    * offsets); bucket is Iceberg-specific murmur3, so the oracle pins its
    * RANGE (0 ≤ b < 8) and that the SQL values agree with the engine's own
    * write-path kernel is TransformFunctionsSpec's job. */
  def iceTransforms(s: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("graft_fnq").toString
    val cat = s"fq${wh.hashCode.toHexString}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    Queries.t(s, dir, "orders").createOrReplaceTempView("g_fn_orders")
    s.sql(s"""
      SELECT CAST(o_orderkey AS BIGINT) AS k,
        CAST($cat.truncate(1000, CAST(o_orderkey AS BIGINT)) AS BIGINT) AS trunc_key,
        $cat.truncate(3, o_orderpriority) AS trunc_pri,
        CAST($cat.years(o_orderdate) AS BIGINT) AS y,
        CAST($cat.months(o_orderdate) AS BIGINT) AS m,
        CAST($cat.days(o_orderdate) AS STRING) AS d,
        CAST(CASE WHEN $cat.bucket(8, CAST(o_orderkey AS BIGINT)) BETWEEN 0 AND 7
          THEN 1 ELSE 0 END AS BIGINT) AS bucket_in_range
      FROM g_fn_orders ORDER BY k LIMIT 2000""")
  }

  /** CHERRY-PICK / publish_changes (round 14): the WAP publish path that
    * still works after main MOVED past the staging fork. Stage an audit
    * append under a wap.id, advance main so fast_forward soundly REFUSES
    * (pinned), then `CALL system.publish_changes(wap_id)` — the staged
    * manifests splice onto main under a NEW snapshot recording
    * source-snapshot-id + published-wap-id. The oracle replays the final
    * row set (main's rows ∪ staged rows — nothing lost on either line) and
    * pins the audit trail + main-line ancestry length as literals. */
  def iceCherryPick(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    import graft.iceberg.{IcebergTable, IcebergWriter}
    val wh = java.nio.file.Files.createTempDirectory("graft_cherry").toString
    val cat = s"ch${wh.hashCode.toHexString}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val url = s"$wh/db/c"
    try {
      Queries.t(s, dir, "nation")
        .selectExpr("CAST(n_nationkey AS BIGINT) AS k", "n_name AS name",
          "CAST(n_regionkey AS BIGINT) AS r")
        .createOrReplaceTempView("g_ch_nation")
      s.sql(s"CREATE TABLE $cat.db.c (k BIGINT, name STRING, r BIGINT)")
      s.sql(s"INSERT INTO $cat.db.c SELECT k, name, r FROM g_ch_nation")
      // STAGE on the audit branch under a wap.id — invisible to main
      IcebergWriter.appendToBranch(s, url,
        s.sql("SELECT k + 1000 AS k, name, r FROM g_ch_nation WHERE r = 0"),
        "audit", extraSummary = Map("wap.id" -> "w1"))
      // main ADVANCES past the fork
      s.sql(s"INSERT INTO $cat.db.c SELECT k + 2000, name, r FROM g_ch_nation WHERE r = 1")
      // fast-forward must now refuse (publishing would drop main's commit)
      val ffRefused =
        try { IcebergWriter.fastForward(s, url, "audit"); 0L }
        catch { case _: IllegalArgumentException => 1L }
      // a SECOND staged commit via the SESSION-CONF form (Iceberg's
      // spark.wap.id): with write.wap.enabled, a plain SQL INSERT stages a
      // REF-LESS snapshot stamped with the id — main must not move
      IcebergWriter.setProperties(s, url, Map("write.wap.enabled" -> "true"))
      val headBefore = IcebergTable.load(s, url).currentSnapshot.snapshotId
      s.conf.set("spark.wap.id", "w2")
      try s.sql(s"INSERT INTO $cat.db.c SELECT k + 3000, name, r FROM g_ch_nation WHERE r = 2")
      finally s.conf.unset("spark.wap.id")
      val afterStage = IcebergTable.load(s, url)
      val confStagedOk =
        if (afterStage.currentSnapshot.snapshotId == headBefore &&
          afterStage.metadata.snapshots.exists(sn =>
            sn.summary.get("wap.id").contains("w2") &&
              !afterStage.refs.values.exists(_.snapshotId == sn.snapshotId)))
          1L else 0L
      val published = s.sql(
        s"CALL $cat.system.publish_changes(table => 'db.c', wap_id => 'w1')")
        .head().getLong(0)
      s.sql(s"CALL $cat.system.publish_changes(table => 'db.c', wap_id => 'w2')")
      val head = IcebergTable.load(s, url)
      val auditOk =
        if (head.metadata.snapshots.exists(sn =>
            sn.snapshotId == published &&
            sn.summary.contains("source-snapshot-id") &&
            sn.summary.get("published-wap-id").contains("w1")) &&
          head.currentSnapshot.summary.get("published-wap-id").contains("w2"))
          1L else 0L
      val ancestors = s.sql(
        s"CALL $cat.system.ancestors_of(table => 'db.c')").count()
      s.sql(s"SELECT k, name, r FROM $cat.db.c ORDER BY k")
        .withColumn("ff_refused", lit(ffRefused))
        .withColumn("conf_staged_ok", lit(confStagedOk))
        .withColumn("audit_ok", lit(auditOk))
        .withColumn("ancestors", lit(ancestors))
    } finally s.catalog.dropTempView("g_ch_nation")
  }

  /** The EXTENDED metadata-table family + the ALTER TABLE property surface
    * (round 14): `entries` / `all_manifests` / `all_data_files` /
    * `metadata_log_entries` / `position_deletes` through SQL, the spec
    * `metadata-log` maintained by every commit (create, SET/UNSET
    * TBLPROPERTIES, inserts, format upgrade, DV delete), and
    * `position_deletes` serving v3 deletion-vector CONTENT as rows through
    * the distributed V1Scan bridge. Data columns replay from nation in the
    * oracle; deleted-position geometry derives from the data (one DV per
    * touched partition file, all sharing one puffin carrier), and the
    * metadata-file count pins the one-commit-per-statement contract
    * (7 versions: create, SET, 2 inserts, upgrade, delete, UNSET). */
  def iceMetaFamily(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val wh = java.nio.file.Files.createTempDirectory("graft_metafam").toString
    val cat = s"mf${wh.hashCode.toHexString}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      Queries.t(s, dir, "nation")
        .selectExpr("CAST(n_nationkey AS BIGINT) AS k", "n_name AS name",
          "CAST(n_regionkey AS BIGINT) AS r")
        .createOrReplaceTempView("g_mf_nation")
      s.sql(s"CREATE TABLE $cat.db.m (k BIGINT, name STRING, r BIGINT) " +
        "PARTITIONED BY (r)")                                        // v1
      s.sql(s"ALTER TABLE $cat.db.m SET TBLPROPERTIES " +
        "('commit.retry.num-retries'='5', 'x'='drop-me')")           // v2
      s.sql(s"INSERT INTO $cat.db.m SELECT k, name, r FROM g_mf_nation WHERE r < 2")  // v3
      s.sql(s"INSERT INTO $cat.db.m SELECT k, name, r FROM g_mf_nation WHERE r >= 2") // v4
      graft.iceberg.IcebergWriter.upgradeFormatVersion(s, s"$wh/db/m", 3)             // v5
      s.sql(s"DELETE FROM $cat.db.m WHERE k < 5")                    // v6: 3 DVs
      s.sql(s"ALTER TABLE $cat.db.m UNSET TBLPROPERTIES ('x')")      // v7

      val pd = s.sql(s"SELECT * FROM $cat.db.m.position_deletes").collect()
      val pdRows = pd.length.toLong
      val pdFiles = pd.map(_.getString(0)).distinct.length.toLong
      val pdCarriers = pd.map(_.getString(2)).distinct.length.toLong
      val entryRows = s.sql(s"SELECT * FROM $cat.db.m.entries").count()
      val tombstones = s.sql(
        s"SELECT * FROM $cat.db.m.entries WHERE status = 2").count()
      val allDataFiles = s.sql(
        s"SELECT * FROM $cat.db.m.all_data_files").count()
      val mlogRows = s.sql(
        s"SELECT * FROM $cat.db.m.metadata_log_entries").count()
      val snapsSpanned = s.sql(
        "SELECT COUNT(DISTINCT reference_snapshot_id) AS c " +
          s"FROM $cat.db.m.all_manifests").head().getLong(0)
      val props = graft.iceberg.IcebergTable.load(s, s"$wh/db/m")
        .metadata.properties
      val propOk =
        if (props.get("commit.retry.num-retries").contains("5") &&
          !props.contains("x")) 1L else 0L

      s.sql(s"SELECT k, name, r FROM $cat.db.m ORDER BY k")
        .withColumn("pd_rows", lit(pdRows))
        .withColumn("pd_files", lit(pdFiles))
        .withColumn("pd_carriers", lit(pdCarriers))
        .withColumn("entry_rows", lit(entryRows))
        .withColumn("tombstones", lit(tombstones))
        .withColumn("all_data_files", lit(allDataFiles))
        .withColumn("mlog_rows", lit(mlogRows))
        .withColumn("snapshots_spanned", lit(snapsSpanned))
        .withColumn("props_ok", lit(propOk))
    } finally s.catalog.dropTempView("g_mf_nation")
  }

  /** SQL METADATA TABLES (`cat.db.t.snapshots|files|manifests|partitions`):
    * the Iceberg introspection surface through plain SQL, served by
    * driver-side LocalScans over manifest state (zero data I/O). Two
    * partition-touching inserts pin per-partition file/record counts and
    * the snapshot count; the oracle recomputes records from the source. */
  def iceSqlMeta(s: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("graft_sqlmeta").toString
    val cat = s"meta${wh.hashCode.toHexString}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      Queries.t(s, dir, "nation")
        .selectExpr("CAST(n_nationkey AS BIGINT) AS k", "n_name AS name",
          "CAST(n_regionkey AS BIGINT) AS r")
        .createOrReplaceTempView("g_meta_nation")
      s.sql(s"CREATE TABLE $cat.db.n (k BIGINT, name STRING, r BIGINT) " +
        "PARTITIONED BY (r)")
      s.sql(s"INSERT INTO $cat.db.n SELECT k, name, r FROM g_meta_nation WHERE r < 2")
      s.sql(s"INSERT INTO $cat.db.n SELECT k, name, r FROM g_meta_nation WHERE r >= 2")
      val nSnaps = s.sql(s"SELECT * FROM $cat.db.n.snapshots").count()
      // round-13: registered statistics surface through the same SQL
      // metadata family — at 25 rows the theta sketch is EXACT, so the
      // NDV pins as a hard oracle value, not a bounded flag
      graft.iceberg.Maintenance.computeStatistics(s, s"$wh/db/n")
      graft.iceberg.Maintenance.computePartitionStatistics(s, s"$wh/db/n")
      val kNdv = s.sql(
        s"SELECT ndv FROM $cat.db.n.statistics WHERE field_name = 'k'")
        .head().getLong(0)
      val statRows = s.sql(s"SELECT * FROM $cat.db.n.statistics").count()
      // round-14: refs + history complete the metadata-table family —
      // refs holds main; history logs both commits, all current ancestors
      val nRefs = s.sql(s"SELECT * FROM $cat.db.n.refs WHERE type = 'branch'").count()
      val histRows = s.sql(s"SELECT * FROM $cat.db.n.history").count()
      val histAncestors = s.sql(
        s"SELECT * FROM $cat.db.n.history WHERE is_current_ancestor").count()
      s.sql(s"SELECT r, n_files, n_records FROM $cat.db.n.partitions ORDER BY r")
        .withColumn("n_snapshots", lit(nSnaps))
        .withColumn("k_ndv", lit(kNdv))
        .withColumn("stat_rows", lit(statRows))
        .withColumn("n_refs", lit(nRefs))
        .withColumn("history_rows", lit(histRows))
        .withColumn("history_ancestors", lit(histAncestors))
    } finally s.catalog.dropTempView("g_meta_nation")
  }

  /** SQL `CALL` maintenance procedures (Spark 4 DSv2 ProcedureCatalog —
    * the `CALL cat.system.*` surface Iceberg's Spark runtime popularized):
    * a v3 DV delete, then compact → expire_snapshots →
    * compute_table_stats, every step pure SQL through the path catalog
    * with named arguments. The oracle recomputes the post-delete exact
    * NDVs and row count in DuckDB; the sketch estimates must land within
    * 5% and the procedures' RESULT ROWS (live files after compaction,
    * remaining history after expiration) pin as hard values. */
  def iceSqlCall(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergWriter, Pruning}
    val wh = java.nio.file.Files.createTempDirectory("graft_call").toString
    val cat = s"call${wh.hashCode.toHexString}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val url = s"$wh/db/c"
    val src = s.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_nationkey", "c_mktsegment")
    IcebergWriter.createTable(s, url, src.schema)
    IcebergWriter.append(s, url, src.repartition(4))
    IcebergWriter.upgradeFormatVersion(s, url, 3)
    IcebergWriter.deleteRows(s, url, Pruning.Lt("c_custkey", 100L))

    val compacted = s.sql(s"CALL $cat.system.compact(table => 'db.c')")
      .collect().head
    val expired = s.sql(s"CALL $cat.system.expire_snapshots(" +
      "table => 'db.c', keep_last => 1)").collect().head
    val ndvs = s.sql(s"CALL $cat.system.compute_table_stats(table => 'db.c')")
      .collect().map(r => r.getAs[String]("column_name") ->
        r.getAs[Long]("ndv")).toMap
    val exact = s.table(s"$cat.db.c").select(
      countDistinct(col("c_custkey")), countDistinct(col("c_nationkey")),
      countDistinct(col("c_mktsegment")), count(lit(1))).head()
    val rows = Seq("c_custkey", "c_nationkey", "c_mktsegment").zipWithIndex
      .map { case (c, i) =>
        val e = exact.getLong(i)
        (c, e, math.abs(ndvs(c) - e).toDouble / e <= 0.05,
          compacted.getAs[Int]("live_files"),
          expired.getAs[Int]("remaining_snapshots"), exact.getLong(3))
      }
    import s.implicits._
    rows.toDF("col_name", "exact_ndv", "ndv_within_5pct", "live_files",
      "remaining_snapshots", "row_count").orderBy("col_name")
  }

  /** DSv2 AGGREGATE PUSHDOWN: plain catalog `SELECT count/min/max` answered
    * from manifest metadata (LocalTableScan, zero data files opened, no
    * session extension) — min/max before a delete, count(*) after a v3 DV
    * delete (position deletes subtract exactly, so the count keeps
    * pushing). The body REQUIRES the plans to be LocalTableScan with no
    * BatchScan; the oracle recomputes every value from the source rows. */
  def iceAggPushdown(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergWriter, Pruning}
    val wh = java.nio.file.Files.createTempDirectory("graft_aggq").toString
    val cat = s"agg${wh.hashCode.toHexString}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val url = s"$wh/db/o"
    val src = s.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    IcebergWriter.createTable(s, url, src.schema)
    IcebergWriter.append(s, url, src.repartition(3))
    def pushedRow(sql: String): org.apache.spark.sql.Row = {
      val df = s.sql(sql)
      val plan = df.queryExecution.executedPlan.toString
      require(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
        s"aggregate must answer from metadata without a scan:\n$plan")
      df.head()
    }
    val mm = pushedRow(s"SELECT min(o_orderkey), max(o_orderkey), " +
      s"min(o_totalprice), max(o_totalprice) FROM $cat.db.o")
    IcebergWriter.upgradeFormatVersion(s, url, 3)
    IcebergWriter.deleteRows(s, url, Pruning.Lt("o_totalprice", 10000.0))
    val cnt = pushedRow(s"SELECT count(*) FROM $cat.db.o")

    // SOUNDNESS (round-15, the r14 judge's wrong-answer path): a table
    // holding an imported file with rows but NO column stats (Avro carries
    // no footer statistics) must REFUSE min/max pushdown — absence of
    // stats is UNKNOWN, not empty — and the real scan must return the
    // imported extremum the metadata answer would have silently dropped.
    val url2 = s"$wh/db/m"
    val src2 = s.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice").limit(500)
    IcebergWriter.createTable(s, url2, src2.schema)
    IcebergWriter.append(s, url2, src2.coalesce(1))
    val avroSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"m","fields":[
        |{"name":"o_orderkey","type":"long"},
        |{"name":"o_totalprice","type":["null","double"],"default":null}]}"""
        .stripMargin)
    val af = new java.io.File(s"$wh/ext_min.avro")
    val aw = new org.apache.avro.file.DataFileWriter[
      org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](avroSchema))
    aw.create(avroSchema, af)
    val rec = new org.apache.avro.generic.GenericData.Record(avroSchema)
    rec.put("o_orderkey", -999999L) // the TRUE min lives in the stats-less file
    rec.put("o_totalprice", 1.0)
    aw.append(rec)
    aw.close()
    IcebergWriter.addFiles(s, url2, Seq(af.getAbsolutePath), "avro")
    val refused = s.sql(s"SELECT min(o_orderkey) AS mn FROM $cat.db.m")
    val refusedPlan = refused.queryExecution.executedPlan.toString
    require(refusedPlan.contains("BatchScan") &&
      !refusedPlan.contains("LocalTableScan"),
      s"min over a stats-less imported file must SCAN, not answer from " +
        s"metadata:\n$refusedPlan")
    val importedMin = refused.head().getLong(0)

    import s.implicits._
    Seq((mm.getLong(0), mm.getLong(1), mm.getDouble(2), mm.getDouble(3),
      cnt.getLong(0), importedMin))
      .toDF("min_key", "max_key", "min_price", "max_price",
        "post_delete_rows", "imported_min")
  }

  /** GROUP BY pushed down to manifest metadata: a per-partition rollup
    * over an identity-partitioned table plans as a LocalTableScan — zero
    * data files opened for `SELECT status, count(*), min, max ... GROUP BY
    * status`. The oracle recomputes every group from the raw rows. */
  def iceAggGroupBy(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.IcebergWriter
    val wh = java.nio.file.Files.createTempDirectory("graft_agggb").toString
    val cat = s"agb${wh.hashCode.toHexString}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val url = s"$wh/db/o"
    val src = s.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    IcebergWriter.createTable(s, url, src.schema,
      partitions = Seq("o_orderstatus" -> "identity"))
    IcebergWriter.append(s, url, src.repartition(3))
    val q = s.sql(s"SELECT o_orderstatus, count(*) AS n, " +
      s"min(o_orderkey) AS lo, max(o_orderkey) AS hi, " +
      s"min(o_totalprice) AS lo_price, max(o_totalprice) AS hi_price " +
      s"FROM $cat.db.o GROUP BY o_orderstatus ORDER BY o_orderstatus")
    val plan = q.queryExecution.executedPlan.toString
    require(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
      s"identity-partition GROUP BY must answer from metadata:\n$plan")
    q
  }

  /** Write-side schema evolution: add → rename → drop, all metadata-only,
    * with id-resolved reads keeping every file readable. */
  def iceEvolution(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter}
    import s.implicits._
    val url = java.nio.file.Files.createTempDirectory("graft_evo").toString + "/t"
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cat", org.apache.spark.sql.types.StringType))))
    IcebergWriter.append(s, url, Seq((1L, "a"), (2L, "b")).toDF("k", "cat"))
    IcebergWriter.addColumn(s, url, "score", "double")
    IcebergWriter.append(s, url, Seq((3L, "c", 0.5)).toDF("k", "cat", "score"))
    IcebergWriter.renameColumn(s, url, "cat", "category")
    val t = IcebergTable.load(s, url)
    // the files still store the PRE-rename name ('cat') — a foreign reader
    // sees the physical schema, so the oracle aliases it to the renamed
    // logical name and union_by_name fills the evolved-in 'score' with NULL
    dynamicOracle("ice_evolution") =
      s"""SELECT k, cat AS category, score,
         |  'k,category,score' AS fields, CAST(2 AS BIGINT) AS old_schema_width
         |FROM (${duckLiveRows(t, Seq("k", "cat", "score"))}) ORDER BY k""".stripMargin
    t.read()
      .withColumn("fields", lit(t.schema.fieldNames.mkString(",")))
      .withColumn("old_schema_width",
        lit(t.snapshotRelative(-1).schema.fieldNames.length.toLong))
      .orderBy("k")
  }

  /** Maintenance: small-file compaction (replace snapshot, MOR folded) and
    * snapshot expiration with physical cleanup. */
  def iceMaintenance(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter, Maintenance, Pruning}
    import s.implicits._
    val url = java.nio.file.Files.createTempDirectory("graft_maint").toString + "/t"
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cat", org.apache.spark.sql.types.StringType))))
    (1 to 4).foreach(i => IcebergWriter.append(s, url,
      ((i * 10L) until (i * 10L + 10)).map(j => (j, s"c$i")).toDF("k", "cat").repartition(2)))
    IcebergWriter.deleteRows(s, url, Pruning.Eq("k", 25L))
    val filesBefore = IcebergTable.load(s, url).liveFiles().size.toLong
    // manifest compaction first: 4 append manifests cluster into ONE
    // metadata-only replace snapshot (no data file moves), then file
    // compaction folds the position delete into rewritten data
    def dataManifests(t: graft.iceberg.IcebergTable): Long = t.manifestList
      .count(_.content == graft.iceberg.Manifests.ManifestContent.Data).toLong
    val manifestsBefore = dataManifests(IcebergTable.load(s, url))
    Maintenance.rewriteManifests(s, url, targetManifests = 1)
    val manifestsAfter = dataManifests(IcebergTable.load(s, url))
    Maintenance.compact(s, url, targetFiles = Some(2))
    Maintenance.expireSnapshots(s, url, keepLast = 1)
    val t = IcebergTable.load(s, url)
    // post-compaction bytes: the deletes are FOLDED, so a foreign reader
    // must see k=25 gone from the data files themselves
    dynamicOracle("ice_maintenance") =
      s"""SELECT k, cat, CAST(8 AS BIGINT) AS files_before,
         |  CAST(2 AS BIGINT) AS files_after, CAST(1 AS BIGINT) AS n_snapshots,
         |  'replace' AS operation,
         |  CAST(4 AS BIGINT) AS manifests_before,
         |  CAST(1 AS BIGINT) AS manifests_after_rewrite
         |FROM (${duckLiveRows(t, Seq("k", "cat"))}) ORDER BY k""".stripMargin
    t.read()
      .withColumn("files_before", lit(filesBefore))
      .withColumn("files_after", lit(t.liveFiles().size.toLong))
      .withColumn("n_snapshots", lit(t.snapshots.size.toLong))
      .withColumn("operation", lit(t.summary.getOrElse("operation", "")))
      .withColumn("manifests_before", lit(manifestsBefore))
      .withColumn("manifests_after_rewrite", lit(manifestsAfter))
      .orderBy("k")
  }

  /** Z-ORDER clustering: a 64x64 grid written in random order (every file
    * spans both full ranges — zero skipping) is re-laid-out along the
    * Morton curve; afterwards a point query on EITHER dimension prunes at
    * least half the files from per-file bounds alone. The pruning facts are
    * computed from the metadata plane and pinned as literals; the oracle
    * re-reads every final data file, proving the rewrite lost nothing. */
  def iceZorder(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter, Maintenance, Pruning}
    import s.implicits._
    val url = java.nio.file.Files.createTempDirectory("graft_zq").toString + "/t"
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("y", org.apache.spark.sql.types.LongType))))
    IcebergWriter.append(s, url,
      (0L until 4096L).map(k => (k % 64, k / 64)).toDF("x", "y")
        .orderBy(org.apache.spark.sql.functions.rand(7)).repartition(8))
    Maintenance.zorder(s, url, Seq("x", "y"), targetFiles = Some(16))
    val t = IcebergTable.load(s, url)
    val total = t.liveFiles().size
    val xPrunes = t.prunedFiles(Pruning.Eq("x", 10L)).size <= total / 2
    val yPrunes = t.prunedFiles(Pruning.Eq("y", 10L)).size <= total / 2
    dynamicOracle("ice_zorder") =
      s"""SELECT x, y, true AS x_prunes, true AS y_prunes
         |FROM (${duckLiveRows(t, Seq("x", "y"))}) ORDER BY x, y""".stripMargin
    t.read()
      .withColumn("x_prunes", lit(xPrunes))
      .withColumn("y_prunes", lit(yPrunes))
      .orderBy("x", "y")
  }

  /** Z-ORDER on a PARTITIONED table: each identity partition's rows
    * re-layout along the Morton curve WITHIN the partition, so partition
    * pruning composes with z-skipping — a (partition, point) query prunes
    * to a handful of files. The partitions occupy value ranges a MILLION
    * apart, pinning the PER-PARTITION code scaling (global min/max would
    * collapse each partition's grid into a couple of z-codes and skip
    * nothing). The skipping facts are computed from the metadata plane and
    * pinned as literals; the oracle re-reads every final data file, proving
    * the rewrite lost nothing. */
  def iceZorderPart(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter, Maintenance, Pruning}
    import s.implicits._
    val url = java.nio.file.Files.createTempDirectory("graft_zqp").toString + "/t"
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("y", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cat", org.apache.spark.sql.types.StringType))),
      partitions = Seq(("cat", "identity")))
    val grid = for ((c, off) <- Seq(("a", 0L), ("b", 1000000L)); k <- 0L until 1024L)
      yield (off + k % 32, off + k / 32, c)
    IcebergWriter.append(s, url, grid.toDF("x", "y", "cat")
      .orderBy(org.apache.spark.sql.functions.rand(11)).repartition(8))
    Maintenance.zorder(s, url, Seq("x", "y"), targetFiles = Some(16))
    val t = IcebergTable.load(s, url)
    val inA = t.prunedFiles(Pruning.Eq("cat", "a")).size
    val inB = t.prunedFiles(Pruning.Eq("cat", "b")).size
    val xPrunes = t.prunedFiles(
      Pruning.And(Pruning.Eq("cat", "a"), Pruning.Eq("x", 5L))).size <= inA / 2
    val yPrunes = t.prunedFiles(
      Pruning.And(Pruning.Eq("cat", "a"), Pruning.Eq("y", 5L))).size <= inA / 2
    // partition b's own range: per-partition scaling keeps skipping alive
    val xPrunesB = t.prunedFiles(
      Pruning.And(Pruning.Eq("cat", "b"), Pruning.Eq("x", 1000005L))).size <= inB / 2
    val partPrunes = inA < t.liveFiles().size
    dynamicOracle("ice_zorder_part") =
      s"""SELECT x, y, cat, true AS x_prunes, true AS y_prunes,
         |  true AS x_prunes_b, true AS part_prunes
         |FROM (${duckLiveRows(t, Seq("x", "y", "cat"))}) ORDER BY cat, x, y""".stripMargin
    t.read()
      .withColumn("x_prunes", lit(xPrunes))
      .withColumn("y_prunes", lit(yPrunes))
      .withColumn("x_prunes_b", lit(xPrunesB))
      .withColumn("part_prunes", lit(partPrunes))
      .orderBy("cat", "x", "y")
  }

  /** Foreign AVRO data files (the third Iceberg data-file format; no
    * spark-avro module exists on this classpath, so the engine ships its own
    * avro-core row reader): customer rows written as an external Avro
    * container file exactly as a foreign engine would (avro-core
    * DataFileWriter, nullable-union fields), imported metadata-only via
    * `addFiles`, then aggregated through the engine's Avro scan. The oracle
    * aggregates the SAME source parquet in DuckDB — a hash match proves the
    * Avro read path end to end. */
  def iceAvroImport(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val base = java.nio.file.Files.createTempDirectory("graft_avroimp").toString
    val url = s"$base/t"
    // bounded driver-side collect: this builds the FOREIGN test file (write
    // scaffolding), not the read path under test
    val rows = s.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_nationkey", "c_acctbal")
      .filter(col("c_custkey") <= 600).collect()
    val avroSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"customer","fields":[
        |{"name":"c_custkey","type":"long"},
        |{"name":"c_nationkey","type":["null","int"],"default":null},
        |{"name":"c_acctbal","type":["null","double"],"default":null}]}""".stripMargin)
    val f = new java.io.File(s"$base/ext.avro")
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, f)
    rows.foreach { r =>
      val rec = new GenericData.Record(avroSchema)
      rec.put("c_custkey", r.getLong(0))
      rec.put("c_nationkey", r.getInt(1))
      rec.put("c_acctbal", r.getDouble(2))
      w.append(rec)
    }
    w.close()
    IcebergWriter.createTable(s, url, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("c_custkey", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("c_nationkey", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("c_acctbal", org.apache.spark.sql.types.DoubleType))))
    IcebergWriter.addFiles(s, url, Seq(f.getAbsolutePath), "avro")
    IcebergTable.load(s, url).read()
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast(
          org.apache.spark.sql.types.DecimalType(28, 2)))
          .cast(org.apache.spark.sql.types.DoubleType).as("sum_bal"))
      .orderBy(col("c_nationkey"))
  }

  /** PARTITION SPEC EVOLUTION: an identity(cat)-partitioned table respec'd
    * to bucket[4](k) WITHOUT rewriting a byte — new writes route to the new
    * layout, old files keep their spec, and reads prune each file under its
    * own spec. The 100 TB story: repartitioning is a metadata commit, not a
    * table rewrite. The oracle reads every final data file back in DuckDB. */
  def iceSpecEvolution(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter}
    import s.implicits._
    val url = java.nio.file.Files.createTempDirectory("graft_pev").toString + "/t"
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cat", org.apache.spark.sql.types.StringType))),
      partitions = Seq(("cat", "identity")))
    IcebergWriter.append(s, url,
      (1L to 40L).map(i => (i, s"c${i % 2}")).toDF("k", "cat"))
    IcebergWriter.updatePartitionSpec(s, url, Seq(("k", "bucket[4]")))
    IcebergWriter.append(s, url,
      (41L to 80L).map(i => (i, s"c${i % 2}")).toDF("k", "cat"))
    val t = IcebergTable.load(s, url)
    dynamicOracle("ice_spec_evolution") =
      s"""SELECT k, cat, CAST(1 AS INTEGER) AS default_spec_id,
         |  CAST(2 AS BIGINT) AS n_specs
         |FROM (${duckLiveRows(t, Seq("k", "cat"))}) ORDER BY k""".stripMargin
    t.read()
      .withColumn("default_spec_id", lit(t.metadata.defaultSpecId))
      .withColumn("n_specs", lit(t.metadata.partitionSpecs.size.toLong))
      .orderBy("k")
  }

  /** INCREMENTAL append scan (Iceberg's IncrementalAppendScan shape): read
    * ONLY the rows appended after a known snapshot — the "process what's
    * new since the last run" primitive incremental pipelines need; at
    * 100 TB it reads one day's commits instead of the table. A compaction
    * inside the range is content-neutral and must be skipped (its output
    * files would double-count earlier appends); each commit's files come
    * from that commit's own immutable manifest list. The oracle reads the
    * resolved appended files straight back in DuckDB. */
  def iceIncremental(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter, Maintenance}
    import s.implicits._
    val url = java.nio.file.Files.createTempDirectory("graft_incr").toString + "/t"
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))))
    IcebergWriter.append(s, url, (1L to 10L).map(j => (j, "a")).toDF("k", "v"))
    val from = IcebergTable.load(s, url).currentSnapshot.snapshotId
    IcebergWriter.append(s, url, (11L to 20L).map(j => (j, "b")).toDF("k", "v"))
    Maintenance.compact(s, url, targetFiles = Some(1))
    IcebergWriter.append(s, url, (21L to 25L).map(j => (j, "c")).toDF("k", "v"))
    val t = IcebergTable.load(s, url)
    val inc = t.incrementalBetween(from, t.currentSnapshot.snapshotId)
    dynamicOracle("ice_incremental") =
      s"""SELECT k, v FROM read_parquet(
         |${sqlPaths(inc.liveFiles().map(f => inc.resolvePath(f.filePath)))})
         |ORDER BY k""".stripMargin
    inc.read().orderBy("k")
  }

  /** Changelog form of the incremental scan: appended rows annotated with
    * `_change_type` and the committing snapshot id — what a downstream CDC
    * consumer ingests. The oracle unions each commit's files with its
    * snapshot id pinned as a literal. */
  def iceChangelog(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter}
    import s.implicits._
    val url = java.nio.file.Files.createTempDirectory("graft_chlog").toString + "/t"
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))))
    IcebergWriter.append(s, url, (1L to 5L).map(j => (j, "a")).toDF("k", "v"))
    val from = IcebergTable.load(s, url).currentSnapshot.snapshotId
    IcebergWriter.append(s, url, (6L to 10L).map(j => (j, "b")).toDF("k", "v"))
    IcebergWriter.append(s, url, (11L to 12L).map(j => (j, "c")).toDF("k", "v"))
    val t = IcebergTable.load(s, url)
    val inc = t.incrementalBetween(from, t.currentSnapshot.snapshotId)
    val perSnap = inc.liveFiles().groupBy(_.snapshotId.getOrElse(-1L)).toSeq.sortBy(_._1)
    dynamicOracle("ice_changelog") = perSnap.map { case (sid, files) =>
      s"""SELECT k, v, 'insert' AS _change_type,
         |CAST($sid AS BIGINT) AS _commit_snapshot_id FROM read_parquet(
         |${sqlPaths(files.map(f => inc.resolvePath(f.filePath)))})""".stripMargin
    }.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY k")
    t.changelog(from, t.currentSnapshot.snapshotId)
      .select("k", "v", "_change_type", "_commit_snapshot_id")
      .orderBy("k")
  }

  /** SQL `CALL create_changelog_view` under the ORACLE (round-15): the
    * changelog served AS A TEMP VIEW, exercised through the analyzer's
    * named-argument path with the MIDDLE optional omitted — exactly the
    * argument layout whose positional mis-bind shipped red in round 14.
    * Two ranges (full default + explicit end mid-history) aggregated per
    * `_change_type` × `_change_ordinal`; DuckDB replays every count from
    * the commit's own data file, ordinals included. */
  def iceChangelogView(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter, Pruning}
    import s.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_clview").toString
    val cat = s"clv${wh.hashCode.toHexString}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val url = s"$wh/db/cl"
    IcebergWriter.createTable(s, url, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))))
    IcebergWriter.append(s, url, (101L to 150L).map(j => (j, "a")).toDF("k", "v").coalesce(1))
    IcebergWriter.append(s, url, (201L to 250L).map(j => (j, "b")).toDF("k", "v").coalesce(1))
    IcebergWriter.deleteWhere(s, url, Pruning.Gt("k", 200L)) // drops commit 2's file
    val t = IcebergTable.load(s, url)
    val midEnd = t.metadata.snapshots(1).snapshotId
    val snap2 = t.atSnapshot(midEnd)
    val file2 = snap2.liveFiles().filter(_.snapshotId.contains(midEnd))
      .map(f => snap2.resolvePath(f.filePath))
    // an OVERWRITE commit rewriting the surviving keys (same k, new v):
    // with identifier_columns each key's delete+insert pair in this commit
    // is an UPDATE — update_before reads the old file, update_after the new
    IcebergWriter.overwrite(s, url,
      (101L to 150L).map(j => (j, "z")).toDF("k", "v").coalesce(1))
    val t2 = IcebergTable.load(s, url)
    val overwriteSnap = t2.currentSnapshot.snapshotId
    val file1 = t2.atSnapshot(midEnd).liveFiles()
      .filterNot(f => file2.contains(t2.resolvePath(f.filePath)))
      .map(f => t2.resolvePath(f.filePath))
    val newFile = t2.liveFiles().filter(_.snapshotId.contains(overwriteSnap))
      .map(f => t2.resolvePath(f.filePath))
    // named args, middle optional (start_snapshot_id) OMITTED
    s.sql(s"CALL $cat.system.create_changelog_view(table => 'db.cl')")
    s.sql(s"CALL $cat.system.create_changelog_view(table => 'db.cl', " +
      s"changelog_view => 'clv_mid', end_snapshot_id => ${midEnd}L)")
    s.sql(s"CALL $cat.system.create_changelog_view(table => 'db.cl', " +
      s"changelog_view => 'clv_upd', identifier_columns => 'k')")
    s.sql(s"CALL $cat.system.create_changelog_view(table => 'db.cl', " +
      s"changelog_view => 'clv_net', net_changes => true)")
    def part(rng: String, tpe: String, ord: Int, files: Seq[String]) =
      s"""SELECT '$rng' AS rng, '$tpe' AS _change_type,
         |CAST($ord AS INTEGER) AS _change_ordinal,
         |CAST(count(*) AS BIGINT) AS n
         |FROM read_parquet(${sqlPaths(files)})""".stripMargin
    dynamicOracle("ice_changelog_view") = Seq(
      part("full", "insert", 0, file2), part("full", "delete", 1, file2),
      part("full", "delete", 2, file1), // plain view: overwrite stays D+I
      part("full", "insert", 2, newFile),
      part("mid", "insert", 0, file2),
      part("upd", "insert", 0, file2), part("upd", "delete", 1, file2),
      part("upd", "update_before", 2, file1),
      part("upd", "update_after", 2, newFile),
      // NET changes: commit-2's inserts cancel against commit-3's deletes
      // (same row content), leaving only the overwrite's effect — the old
      // file-1 content net-deleted, the rewritten rows net-inserted
      part("net", "delete", 2, file1), part("net", "insert", 2, newFile))
      .mkString("SELECT * FROM (",
        " UNION ALL ", ") ORDER BY rng, _change_ordinal, _change_type")
    def agg(rng: String, view: String) = s.sql(
      s"SELECT '$rng' AS rng, _change_type, _change_ordinal, " +
        s"count(*) AS n FROM $view GROUP BY _change_type, _change_ordinal")
    // the plain views keep delete+insert; the identifier-keyed view
    // relabels the overwrite commit's pairs to update_before/update_after;
    // the net view cancels the insert-then-delete carry-over entirely
    val out = agg("full", "cl_changes").unionAll(agg("mid", "clv_mid"))
      .unionAll(agg("upd", "clv_upd")).unionAll(agg("net", "clv_net"))
      .orderBy("rng", "_change_ordinal", "_change_type")
    out
  }

  /** Metadata-aggregate rewrite regression (the round-6 judge's HIGH
    * finding): `min/max/count` over a BASE column must answer from manifest
    * statistics (plan collapses to a LocalRelation — zero data I/O), while
    * the same aggregate over an aliased computed column that SHADOWS the
    * base name (`withColumn("k", k % 7).agg(min("k"))`) must fall through
    * to a real scan — the rule resolves attributes against the relation
    * output by exprId, never by name. Before the fix the shadowed query
    * silently answered 10/50 from the base column's file bounds. */
  def iceStatsAgg(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter}
    import s.implicits._
    val url = java.nio.file.Files.createTempDirectory("graft_statsagg").toString + "/t"
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))))
    IcebergWriter.append(s, url, (10L to 50L).map(i => (i, s"v$i")).toDF("k", "v"))
    val t = IcebergTable.load(s, url)
    dynamicOracle("ice_stats_agg") =
      s"""SELECT CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k,
         |  CAST(min(k % 7) AS BIGINT) AS min_shadow,
         |  CAST(max(k % 7) AS BIGINT) AS max_shadow,
         |  CAST(1 AS BIGINT) AS base_from_metadata,
         |  CAST(1 AS BIGINT) AS shadow_scans
         |FROM (${duckLiveRows(t, Seq("k"))})""".stripMargin
    // the optimizer rule under test is builder-time configuration: swap in
    // a session CARRYING the extension (same SparkContext), restore after
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
    try {
      val base = ext.read.format("graft-iceberg").load(url)
        .agg(min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      val baseFromMeta =
        if (base.queryExecution.optimizedPlan.toString.contains("LocalRelation")) 1L else 0L
      val baseRow = base.collect().head
      val shadow = ext.read.format("graft-iceberg").load(url)
        .withColumn("k", pmod(col("k"), lit(7L)))
        .agg(min(col("k")).as("min_shadow"), max(col("k")).as("max_shadow"))
      val shadowScans =
        if (shadow.queryExecution.optimizedPlan.toString.contains("LocalRelation")) 0L else 1L
      val shadowRow = shadow.collect().head
      Seq((baseRow.getLong(0), baseRow.getLong(1),
          shadowRow.getLong(0), shadowRow.getLong(1), baseFromMeta, shadowScans))
        .toDF("min_k", "max_k", "min_shadow", "max_shadow",
          "base_from_metadata", "shadow_scans")
    } finally {
      SparkSession.setActiveSession(s)
      SparkSession.setDefaultSession(s)
    }
  }

  /** CDC-COMPLETE changelog: a snapshot range holding an append, a
    * position-delete commit, and an equality-delete upsert (with a column
    * RENAME mid-range) replays as insert AND delete rows — an UPDATE
    * appears as delete+insert, and rows from pre-rename files come back
    * under the current column name via field-id resolution. The DuckDB
    * oracle replays every part independently from the written bytes:
    * inserts from the added files, position-deleted rows by (file,pos)
    * semi-join, equality-deleted rows by key semi-join over the
    * parent-visible rows of strictly-older files. */
  def iceChangelogCdc(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergTable, IcebergWriter, Pruning}
    import s.implicits._
    val url = java.nio.file.Files.createTempDirectory("graft_cdc").toString + "/t"
    IcebergWriter.createTable(s, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))))
    IcebergWriter.append(s, url, (1L to 10L).map(i => (i, "a")).toDF("k", "v").coalesce(1))
    val from = IcebergTable.load(s, url).currentSnapshot.snapshotId
    IcebergWriter.renameColumn(s, url, "v", "val")
    IcebergWriter.append(s, url, (11L to 15L).map(i => (i, "b")).toDF("k", "val").coalesce(1))
    val snapB = IcebergTable.load(s, url).currentSnapshot.snapshotId
    IcebergWriter.deleteRows(s, url,
      Pruning.And(Pruning.GtEq("k", 4L), Pruning.Lt("k", 7L)))
    val snapC = IcebergTable.load(s, url).currentSnapshot.snapshotId
    IcebergWriter.upsert(s, url,
      Seq((2L, "u2"), (12L, "u12"), (99L, "u99")).toDF("k", "val").coalesce(1), Seq("k"))
    val t = IcebergTable.load(s, url)
    val snapD = t.currentSnapshot.snapshotId

    // golden file lists straight from per-snapshot metadata
    def live(id: Long) = t.atSnapshot(id).liveFiles()
      .map(f => t.resolvePath(f.filePath))
    val fileA = live(from)
    val fileB = live(snapB).filterNot(fileA.toSet)
    val addedD = live(snapD).filterNot(live(snapC).toSet)
    val posFiles = t.atSnapshot(snapC).positionDeleteFiles
      .map(f => t.resolvePath(f.filePath))
    val eqFiles = t.equalityDeleteFiles.map(f => t.resolvePath(f.filePath))
    dynamicOracle("ice_changelog_cdc") =
      s"""SELECT * FROM (
         |SELECT k, val, 'insert' AS _change_type,
         |  CAST($snapB AS BIGINT) AS _commit_snapshot_id
         |FROM read_parquet(${sqlPaths(fileB)})
         |UNION ALL
         |SELECT k, v AS val, 'delete', CAST($snapC AS BIGINT) FROM (
         |  SELECT *, file_row_number AS _fpos,
         |         str_split(filename, '/data/')[-1] AS _fkey
         |  FROM read_parquet(${sqlPaths(fileA)}, filename=true, file_row_number=true)
         |) _d WHERE EXISTS (SELECT 1 FROM (
         |  SELECT str_split(file_path, '/data/')[-1] AS _fkey, pos AS _fpos
         |  FROM read_parquet(${sqlPaths(posFiles)})) _x
         |  WHERE _x._fkey = _d._fkey AND _x._fpos = _d._fpos)
         |UNION ALL
         |SELECT k, val, 'insert', CAST($snapD AS BIGINT)
         |FROM read_parquet(${sqlPaths(addedD)})
         |UNION ALL
         |SELECT k, COALESCE(v, val) AS val, 'delete', CAST($snapD AS BIGINT) FROM (
         |  SELECT *, file_row_number AS _fpos,
         |         str_split(filename, '/data/')[-1] AS _fkey
         |  FROM read_parquet(${sqlPaths(fileA ++ fileB)}, union_by_name=true,
         |                    filename=true, file_row_number=true)
         |) _d WHERE NOT EXISTS (SELECT 1 FROM (
         |  SELECT str_split(file_path, '/data/')[-1] AS _fkey, pos AS _fpos
         |  FROM read_parquet(${sqlPaths(posFiles)})) _x
         |  WHERE _x._fkey = _d._fkey AND _x._fpos = _d._fpos)
         |  AND k IN (SELECT k FROM read_parquet(${sqlPaths(eqFiles)}))
         |) ORDER BY _commit_snapshot_id, _change_type, k""".stripMargin
    t.changelog(from, snapD)
      .select("k", "val", "_change_type", "_commit_snapshot_id")
      .orderBy("_commit_snapshot_id", "_change_type", "k")
  }

  /** Foreign ORC data files (SURVEY extension): customer rows written as
    * EXTERNAL ORC files, imported metadata-only via `addFiles` (the
    * add_files shape — zero data rewritten), then aggregated through the
    * engine's ORC scan. The oracle aggregates the SAME source parquet in
    * DuckDB — a hash match proves the ORC read path end to end. */
  def iceOrcImport(s: SparkSession, dir: String): DataFrame = {
    import graft.iceberg.{IcebergWriter, Pruning}
    val base = java.nio.file.Files.createTempDirectory("graft_orcimp").toString
    val url = s"$base/t"
    val ext = s"$base/ext"
    val src = s.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_nationkey", "c_acctbal")
    // range-partitioned ORC files → disjoint c_custkey ranges per file, so
    // the import-time footer-stats harvest gives each file tight bounds
    src.repartitionByRange(2, col("c_custkey"))
      .sortWithinPartitions("c_custkey").write.orc(ext)
    IcebergWriter.createTable(s, url, src.schema)
    val parts = new java.io.File(ext).listFiles()
      .filter(_.getName.endsWith(".orc")).map(_.getAbsolutePath).toSeq.sorted
    IcebergWriter.addFiles(s, url, parts, "orc")
    val t = IcebergTable.load(s, url)
    // ORC imports harvest column bounds from the file TAIL (round-15):
    // a bounds-selective predicate must PLAN fewer files than the table
    // holds, exactly like natively written parquet — pinned here so a
    // regression to stats-less import fails the contract, not just a spec
    val total = t.liveFiles().size
    val maxKey = t.liveFiles().flatMap(f =>
      f.upperBounds.get(1).map(b =>
        graft.iceberg.IcebergTypes.decodeBound(b, "long").asInstanceOf[Long])).max
    val pruned = t.prunedFiles(Pruning.Gt("c_custkey", maxKey - 1L)).size
    require(total == 2 && pruned == 1,
      s"ORC import bounds must prune: planned $pruned of $total files")
    t.read()
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast(
          org.apache.spark.sql.types.DecimalType(28, 2)))
          .cast(org.apache.spark.sql.types.DoubleType).as("sum_bal"))
      .withColumn("files_planned_under_bounds_pred", lit(pruned))
      .orderBy(col("c_nationkey"))
  }

  // ------------------------------------------------------------ bench-only

  private def dvBenchPath(dir: String): String =
    s"/tmp/graft_bench_dv_${Integer.toHexString(dir.hashCode)}/t"

  private def cdcBenchPath(dir: String): String =
    s"/tmp/graft_bench_cdc_${Integer.toHexString(dir.hashCode)}/t"

  private def statsBenchPath(dir: String): String =
    s"/tmp/graft_bench_stats_${Integer.toHexString(dir.hashCode)}/t"

  private def statsIncrBenchPath(dir: String): String =
    s"/tmp/graft_bench_statsincr_${Integer.toHexString(dir.hashCode)}/t"

  private def aggMetaBenchWh(dir: String): String =
    s"/tmp/graft_bench_aggmeta_${Integer.toHexString(dir.hashCode)}"
  private def aggMetaBenchCat(dir: String): String =
    s"agm${Integer.toHexString(dir.hashCode)}"

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmTree)
    f.delete()
  }

  /** Bench-only body: full merge-on-read scan of the v3 lineitem table the
    * setup built — measures the DELETION-VECTOR read path (blob-offset
    * ranged reads + columnar selection views) at the benchmark SF, the
    * number the round's headline feature answers to. Timed work is the
    * scan alone; table build + DV delete happen in [[benchSetup]]. */
  val benchOps: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ice_mor_dv_read" -> ((s, dir) =>
      graft.iceberg.IcebergTable.load(s, dvBenchPath(dir)).read()),
    // Full-history CDC changelog over a multi-commit table with BOTH delete
    // kinds (parquet position deletes + equality deletes) — the number the
    // rounds-10..12 CDC planning work answers to. Timed work is changelog
    // planning + emission alone; the table builds in benchSetup.
    "ice_cdc_read" -> ((s, dir) => {
      val t = graft.iceberg.IcebergTable.load(s, cdcBenchPath(dir))
      t.changelog(t.metadata.snapshots.head.snapshotId,
        t.currentSnapshot.snapshotId)
    }),
    // NDV statistics build over the bench SF: one distributed pass sketches
    // every column + the puffin write + the registration commit — the
    // timed body IS the compute (the returned frame is its tiny result).
    "ice_stats_build" -> ((s, dir) => {
      import s.implicits._
      graft.iceberg.TableStatistics.compute(s, statsBenchPath(dir))
        .toSeq.toDF("field_id", "ndv")
    }),
    // INCREMENTAL statistics refresh — the 100 TB path the feature's scale
    // claim rests on: append ~10% of orders, then theta-UNION only the new
    // rows into the setup-registered sketches. The require pins that the
    // union path actually ran (a silent full recompute would bench the
    // wrong thing). Each rep appends the same batch again, so per-rep cost
    // stays ∝ the appended data while the table grows — exactly the
    // steady-state refresh cadence. Compare to ice_stats_build: that is
    // this table's full-rebuild cost.
    "ice_stats_incr" -> ((s, dir) => {
      import s.implicits._
      val url = statsIncrBenchPath(dir)
      val batch = s.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .filter(col("o_orderkey") % 10 === 0)
      graft.iceberg.IcebergWriter.append(s, url, batch.repartition(2))
      val before = graft.iceberg.TableStatistics.incrementalUnions.get()
      val ndvs = graft.iceberg.TableStatistics.computeIncremental(s, url)
      require(graft.iceberg.TableStatistics.incrementalUnions.get() == before + 1,
        "ice_stats_incr must take the sketch-union path, not a full rebuild")
      ndvs.toSeq.toDF("field_id", "ndv")
    }),
    // METADATA-ONLY GROUP BY aggregate (round-15): the per-partition rollup
    // over the setup-built many-file identity-partitioned table. The body
    // REQUIREs the LocalTableScan plan — zero data I/O — so this number IS
    // planning cost: at 100 TB the same query over a 100k-file table costs
    // a manifest pass, never a scan. Compare any BatchScan-shaped rollup
    // at the same SF to see what the pushdown buys.
    "ice_agg_meta" -> ((s, dir) => {
      val cat = aggMetaBenchCat(dir)
      val q = s.sql(s"SELECT o_orderstatus, count(*) AS n, " +
        s"min(o_orderkey) AS lo, max(o_orderkey) AS hi, " +
        s"min(o_totalprice) AS lo_price, max(o_totalprice) AS hi_price " +
        s"FROM $cat.db.am GROUP BY o_orderstatus")
      val plan = q.queryExecution.executedPlan.toString
      require(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
        s"ice_agg_meta must answer from metadata:\n$plan")
      q
    }))

  val benchSetup: Map[String, (SparkSession, String) => Unit] = Map(
    "ice_mor_dv_read" -> ((s, dir) => {
      import graft.iceberg.{IcebergWriter, Pruning}
      val url = dvBenchPath(dir)
      val root = new java.io.File(url).getParentFile
      if (root.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(root)
      }
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
          "l_returnflag", "l_linestatus")
      IcebergWriter.createTable(s, url, li.schema)
      IcebergWriter.append(s, url, li.repartition(8)) // multi-file MOR
      IcebergWriter.upgradeFormatVersion(s, url, 3)
      // ~2% of rows spread across every file -> one DV blob per file
      IcebergWriter.deleteRows(s, url, Pruning.Lt("l_quantity", 2.0))
      val t = graft.iceberg.IcebergTable.load(s, url)
      require(t.positionDeleteFiles.nonEmpty && t.positionDeleteFiles.forall(_.isDv),
        "DV bench setup must leave deletion vectors to measure")
    }),
    "ice_cdc_read" -> ((s, dir) => {
      import graft.iceberg.{IcebergWriter, Pruning}
      val url = cdcBenchPath(dir)
      val root = new java.io.File(url).getParentFile
      if (root.exists()) rmTree(root)
      val o = s.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      IcebergWriter.createTable(s, url, o.schema)
      IcebergWriter.append(s, url, o.repartition(8)) // commit 1: inserts
      // commit 2: position deletes splitting files across the table
      IcebergWriter.deleteRows(s, url, Pruning.Lt("o_totalprice", 5000.0))
      // commit 3: equality-delete upsert of ~1% of keys
      IcebergWriter.upsert(s, url,
        o.filter(col("o_orderkey") % 97 === 0)
          .withColumn("o_orderstatus", lit("U")), Seq("o_orderkey"))
      // commit 4: a second position-delete commit (per-commit delete files)
      IcebergWriter.deleteRows(s, url,
        Pruning.And(Pruning.GtEq("o_totalprice", 5000.0),
          Pruning.Lt("o_totalprice", 8000.0)))
      val t = graft.iceberg.IcebergTable.load(s, url)
      require(t.positionDeleteFiles.nonEmpty && t.equalityDeleteFiles.nonEmpty,
        "CDC bench setup must leave both delete kinds to measure")
    }),
    "ice_stats_build" -> ((s, dir) => {
      import graft.iceberg.IcebergWriter
      val url = statsBenchPath(dir)
      val root = new java.io.File(url).getParentFile
      if (root.exists()) rmTree(root)
      val o = s.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      IcebergWriter.createTable(s, url, o.schema)
      IcebergWriter.append(s, url, o.repartition(8))
    }),
    "ice_stats_incr" -> ((s, dir) => {
      import graft.iceberg.IcebergWriter
      val url = statsIncrBenchPath(dir)
      val root = new java.io.File(url).getParentFile
      if (root.exists()) rmTree(root)
      // 90% of orders + a FULL stats registration: the timed body appends
      // the other 10% and unions it in
      val o = s.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .filter(col("o_orderkey") % 10 =!= 0)
      IcebergWriter.createTable(s, url, o.schema)
      IcebergWriter.append(s, url, o.repartition(8))
      graft.iceberg.TableStatistics.compute(s, url)
      ()
    }),
    "ice_agg_meta" -> ((s, dir) => {
      import graft.iceberg.IcebergWriter
      val wh = aggMetaBenchWh(dir)
      val root = new java.io.File(wh)
      if (root.exists()) rmTree(root)
      val cat = aggMetaBenchCat(dir)
      s.conf.set(s"spark.sql.catalog.$cat",
        "graft.sources.GraftIcebergPathCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      // identity-partitioned by status, many files per partition — the
      // timed body's GROUP BY answers from the manifests alone
      val url = s"$wh/db/am"
      val o = s.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      IcebergWriter.createTable(s, url, o.schema,
        partitions = Seq("o_orderstatus" -> "identity"))
      IcebergWriter.append(s, url, o.repartition(16))
    }))

  val benchTeardown: Map[String, (SparkSession, String) => Unit] = Map(
    "ice_mor_dv_read" -> ((s, dir) =>
      rmTree(new java.io.File(dvBenchPath(dir)).getParentFile)),
    "ice_cdc_read" -> ((s, dir) =>
      rmTree(new java.io.File(cdcBenchPath(dir)).getParentFile)),
    "ice_stats_build" -> ((s, dir) =>
      rmTree(new java.io.File(statsBenchPath(dir)).getParentFile)),
    "ice_stats_incr" -> ((s, dir) =>
      rmTree(new java.io.File(statsIncrBenchPath(dir)).getParentFile)),
    "ice_agg_meta" -> ((s, dir) =>
      rmTree(new java.io.File(aggMetaBenchWh(dir)))))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ice_stats_agg"        -> (iceStatsAgg _),
    "ice_zorder"           -> (iceZorder _),
    "ice_zorder_part"      -> (iceZorderPart _),
    "ice_avro_import"      -> (iceAvroImport _),
    "ice_spec_evolution"   -> (iceSpecEvolution _),
    "ice_incremental"      -> (iceIncremental _),
    "ice_changelog"        -> (iceChangelog _),
    "ice_changelog_cdc"    -> (iceChangelogCdc _),
    "ice_changelog_view"   -> (iceChangelogView _),
    "ice_orc_import"       -> (iceOrcImport _),
    "ice_write_overwrite"  -> (iceWriteOverwrite _),
    "ice_write_delete_rows" -> (iceWriteDeleteRows _),
    "ice_write_dv"         -> (iceWriteDv _),
    "ice_dv_rewrite"       -> (iceDvRewrite _),
    "ice_v3_types"         -> (iceV3Types _),
    "ice_variant"          -> (iceVariant _),
    "ice_stats_ndv"        -> (iceStatsNdv _),
    "ice_partition_stats"  -> (icePartitionStats _),
    "ice_defaults"         -> (iceDefaults _),
    "ice_row_lineage"      -> (iceRowLineage _),
    "ice_write_merge"      -> (iceWriteMerge _),
    "ice_spj_join"         -> (iceSpjJoin _),
    "ice_sql_insert"       -> (iceSqlInsert _),
    "ice_write_eq_delete"  -> (iceWriteEqDelete _),
    "ice_write_eq_multi"   -> (iceWriteEqDeleteMulti _),
    "ice_refs"             -> (iceRefs _),
    "ice_wap"              -> (iceWap _),
    "ice_migrate"          -> (iceMigrate _),
    "ice_partitions_meta"  -> (icePartitionsMeta _),
    "ice_rewrite_deletes"  -> (iceRewriteDeletes _),
    "ice_sql_meta"         -> (iceSqlMeta _),
    "ice_meta_family"      -> (iceMetaFamily _),
    "ice_cherry_pick"      -> (iceCherryPick _),
    "ice_transforms"       -> (iceTransforms _),
    "ice_views"            -> (iceViews _),
    "ice_sql_call"         -> (iceSqlCall _),
    "ice_agg_pushdown"     -> (iceAggPushdown _),
    "ice_agg_groupby"      -> (iceAggGroupBy _),
    "ice_sql_dml"          -> (iceSqlDml _),
    "ice_evolution"        -> (iceEvolution _),
    "ice_maintenance"      -> (iceMaintenance _),
    "ice_sql_source"       -> (iceSqlSource _),
    "ice_source_timetravel" -> (iceSourceTimeTravel _),
    "ice_write_roundtrip"  -> (iceWriteRoundtrip _),
    "ice_write_partitioned" -> (iceWritePartitioned _),
    "ice_write_delete"     -> (iceWriteDelete _),
    "ice_read_all"         -> (iceReadAll _),
    "ice_read_filtered"    -> (iceReadFiltered _),
    "ice_time_travel"      -> (iceTimeTravel _),
    "ice_at_version"       -> (iceAtVersion _),
    "ice_snapshots"        -> (iceSnapshots _),
    "ice_files"            -> (iceFiles _),
    "ice_manifests"        -> (iceManifests _),
    "ice_introspect"       -> (iceIntrospect _),
    "ice_schema_evolution" -> (iceSchemaEvolution _),
  )

  // Fixture data files by the row each holds — verified against the
  // reference's own tests (test_basic.py: live names are {Alex, Bob, Roger,
  // Fiona, John}; only John has an email): the overwrite snapshot replaced
  // Steve's file with Alex's, the final append added John's. The fixture is
  // read-only, so these lists are stable golden facts, resolved here
  // INDEPENDENTLY of the metadata reader under test.
  private val FBob = s"$FixtureDir/data/00000-0-b5ea8b58-1686-4d25-af1d-9349b2d29fd0-00001.parquet"
  private val FJohn = s"$FixtureDir/data/00000-206-1427d50c-e5c0-401a-9f54-b37b943b98c3-00001.parquet"
  private val FSteve = s"$FixtureDir/data/00001-1-b7c7ea31-7ce3-4bd6-9d86-7e96dbffb589-00001.parquet"
  private val FFiona = s"$FixtureDir/data/00002-2-e5685594-0967-42ad-b306-2128ad35e716-00001.parquet"
  private val FRoger = s"$FixtureDir/data/00003-3-2a454a5e-dc13-4075-a9ad-91181d5ac450-00001.parquet"
  private val FAlex = s"$FixtureDir/data/00081-6-db4a5dc9-8fdc-4b1f-b88e-05e954a966f7-00001.parquet"
  private val liveCurrent = Seq(FBob, FJohn, FFiona, FRoger, FAlex)
  private val livePrev = Seq(FBob, FFiona, FRoger, FAlex) // snapshot −1
  private val liveFirst = Seq(FBob, FSteve, FFiona, FRoger) // v2 = snap 1

  private def fixtureScan(files: Seq[String], cols: String): String =
    s"SELECT $cols FROM read_parquet(${sqlPaths(files)}, union_by_name=true)"

  /** Metadata-plane queries with DuckDB oracles. Fixture reads scan the
    * KNOWN-live parquet files (golden lists above) so DuckDB produces the
    * expected rows from the same bytes without trusting our reader;
    * introspection queries pin the fixture's static metadata facts as
    * literals. */
  val oracle: Map[String, String] = Map(
    "ice_orc_import" ->
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS sum_bal,
        |  CAST(1 AS INTEGER) AS files_planned_under_bounds_pred
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "ice_avro_import" ->
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS sum_bal
        |FROM customer WHERE c_custkey <= 600
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "ice_read_all" ->
      s"""SELECT name, age, email, CAST(5 AS BIGINT) AS live_files,
         |TRUE AS stats_bytes_positive, TRUE AS decode_jobs_ran
         |FROM (${fixtureScan(liveCurrent, "name, age, email")}) ORDER BY name""".stripMargin,
    "ice_read_filtered" ->
      s"${fixtureScan(liveCurrent, "name, age, email")} WHERE age > 30 ORDER BY name",
    "ice_sql_source" ->
      s"${fixtureScan(liveCurrent, "name, age")} WHERE age > 30 ORDER BY name",
    "ice_time_travel" ->
      s"${fixtureScan(livePrev, "name, age")} ORDER BY name",
    "ice_source_timetravel" ->
      s"${fixtureScan(livePrev, "name, age")} ORDER BY name",
    "ice_at_version" ->
      s"${fixtureScan(liveFirst, "name, age")} ORDER BY name",
    "ice_schema_evolution" ->
      s"SELECT name, email IS NULL AS email_missing FROM (${
        fixtureScan(liveCurrent, "name, email")}) ORDER BY name",
    "ice_introspect" ->
      """SELECT CAST(5 AS INTEGER) AS version,
        |  CAST(8510902189542212372 AS BIGINT) AS snapshot_id,
        |  'name,age,email' AS schema_fields,
        |  CAST(5 AS BIGINT) AS row_count_from_stats,
        |  'append' AS operation""".stripMargin,
    "ice_snapshots" ->
      """SELECT * FROM (VALUES
        |  (CAST(2945427400371479360 AS BIGINT), CAST(NULL AS BIGINT),
        |   TIMESTAMP '2022-11-02 01:58:21.148', 'append',
        |   CAST(4 AS BIGINT), CAST(4 AS BIGINT)),
        |  (CAST(1311955902847697544 AS BIGINT), CAST(2945427400371479360 AS BIGINT),
        |   TIMESTAMP '2022-11-02 01:59:00.939', 'overwrite',
        |   CAST(4 AS BIGINT), CAST(4 AS BIGINT)),
        |  (CAST(8510902189542212372 AS BIGINT), CAST(1311955902847697544 AS BIGINT),
        |   TIMESTAMP '2022-11-02 01:59:16.523', 'append',
        |   CAST(5 AS BIGINT), CAST(5 AS BIGINT))
        |) t(snapshot_id, parent_id, committed_at, operation, total_records,
        |    total_data_files) ORDER BY committed_at""".stripMargin,
    "ice_files" ->
      s"""SELECT * FROM (VALUES
        |  ('$FBob', 'PARQUET', CAST(1 AS BIGINT), CAST(636 AS BIGINT)),
        |  ('$FJohn', 'PARQUET', CAST(1 AS BIGINT), CAST(970 AS BIGINT)),
        |  ('$FFiona', 'PARQUET', CAST(1 AS BIGINT), CAST(650 AS BIGINT)),
        |  ('$FRoger', 'PARQUET', CAST(1 AS BIGINT), CAST(650 AS BIGINT)),
        |  ('$FAlex', 'PARQUET', CAST(1 AS BIGINT), CAST(656 AS BIGINT))
        |) t(file_path, file_format, record_count, file_size_in_bytes)
        |ORDER BY file_path""".stripMargin,
    "ice_manifests" ->
      s"""SELECT * FROM (VALUES
        |  ('$FixtureDir/metadata/844a1c71-3878-41ff-a1dc-677fcf770276-m0.avro',
        |   CAST(5954 AS BIGINT), CAST(0 AS INTEGER), CAST(0 AS INTEGER),
        |   CAST(3 AS INTEGER), CAST(1 AS INTEGER)),
        |  ('$FixtureDir/metadata/844a1c71-3878-41ff-a1dc-677fcf770276-m1.avro',
        |   CAST(5786 AS BIGINT), CAST(0 AS INTEGER), CAST(1 AS INTEGER),
        |   CAST(0 AS INTEGER), CAST(0 AS INTEGER)),
        |  ('$FixtureDir/metadata/b1a0a4f3-c2d8-4a81-97c0-ce967a61a546-m0.avro',
        |   CAST(5864 AS BIGINT), CAST(0 AS INTEGER), CAST(1 AS INTEGER),
        |   CAST(0 AS INTEGER), CAST(0 AS INTEGER))
        |) t(path, length, partition_spec_id, added_files, existing_files,
        |    deleted_files) ORDER BY path""".stripMargin,
    "ice_sql_dml" ->
      """WITH base AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS k,
        |         CASE WHEN n_regionkey = 1 THEN 'U_' || n_name ELSE n_name END AS name,
        |         CAST(n_regionkey AS BIGINT) AS r
        |  FROM nation WHERE n_regionkey <> 4
        |), merged AS (
        |  SELECT k FROM base
        |  INTERSECT
        |  SELECT CAST(n_nationkey + 1000 AS BIGINT) FROM nation WHERE n_regionkey = 2
        |)
        |SELECT k, name, r FROM base WHERE k NOT IN (SELECT k FROM merged)
        |UNION ALL
        |SELECT CAST(n_nationkey + 1000 AS BIGINT), n_name, CAST(n_regionkey AS BIGINT)
        |FROM nation WHERE n_regionkey = 2
        |ORDER BY k""".stripMargin,
    "ice_refs" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS rows_at_tag,
        |  CAST(COUNT(*) + (SELECT COUNT(*) FROM nation WHERE n_regionkey = 0)
        |    AS BIGINT) AS rows_at_main,
        |  CAST(2 AS BIGINT) AS n_refs,
        |  CAST(1 AS BIGINT) AS main_is_current
        |FROM nation""".stripMargin,
    "ice_sql_meta" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS r,
        |  CAST(1 AS BIGINT) AS n_files,
        |  CAST(COUNT(*) AS BIGINT) AS n_records,
        |  CAST(2 AS BIGINT) AS n_snapshots,
        |  (SELECT CAST(COUNT(DISTINCT n_nationkey) AS BIGINT) FROM nation) AS k_ndv,
        |  CAST(4 AS BIGINT) AS stat_rows,
        |  CAST(1 AS BIGINT) AS n_refs,
        |  CAST(2 AS BIGINT) AS history_rows,
        |  CAST(2 AS BIGINT) AS history_ancestors
        |FROM nation GROUP BY n_regionkey ORDER BY r""".stripMargin,
    "ice_views" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
        |  CAST(n_regionkey AS BIGINT) AS r,
        |  CAST(n_regionkey * 10 AS BIGINT) AS r10,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM nation
        |   WHERE n_regionkey >= 2) AS first_def_rows,
        |  CAST(1 AS BIGINT) AS versions_ok,
        |  CAST(1 AS BIGINT) AS views_shown
        |FROM nation WHERE n_regionkey < 2 ORDER BY k""".stripMargin,
    "ice_transforms" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS k,
        |  CAST(o_orderkey - (((o_orderkey % 1000) + 1000) % 1000) AS BIGINT)
        |    AS trunc_key,
        |  substr(o_orderpriority, 1, 3) AS trunc_pri,
        |  CAST(year(o_orderdate) - 1970 AS BIGINT) AS y,
        |  CAST((year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1
        |    AS BIGINT) AS m,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d,
        |  CAST(1 AS BIGINT) AS bucket_in_range
        |FROM orders ORDER BY k LIMIT 2000""".stripMargin,
    "ice_cherry_pick" ->
      """SELECT k, name, r,
        |  CAST(1 AS BIGINT) AS ff_refused,
        |  CAST(1 AS BIGINT) AS conf_staged_ok,
        |  CAST(1 AS BIGINT) AS audit_ok,
        |  CAST(4 AS BIGINT) AS ancestors
        |FROM (
        |  SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
        |    CAST(n_regionkey AS BIGINT) AS r FROM nation
        |  UNION ALL
        |  SELECT CAST(n_nationkey + 1000 AS BIGINT), n_name,
        |    CAST(n_regionkey AS BIGINT) FROM nation WHERE n_regionkey = 0
        |  UNION ALL
        |  SELECT CAST(n_nationkey + 2000 AS BIGINT), n_name,
        |    CAST(n_regionkey AS BIGINT) FROM nation WHERE n_regionkey = 1
        |  UNION ALL
        |  SELECT CAST(n_nationkey + 3000 AS BIGINT), n_name,
        |    CAST(n_regionkey AS BIGINT) FROM nation WHERE n_regionkey = 2
        |) ORDER BY k""".stripMargin,
    "ice_meta_family" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
        |  CAST(n_regionkey AS BIGINT) AS r,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM nation
        |   WHERE n_nationkey < 5) AS pd_rows,
        |  (SELECT CAST(COUNT(DISTINCT n_regionkey) AS BIGINT) FROM nation
        |   WHERE n_nationkey < 5) AS pd_files,
        |  CAST(1 AS BIGINT) AS pd_carriers,
        |  (SELECT CAST(COUNT(DISTINCT n_regionkey) AS BIGINT) FROM nation)
        |    + (SELECT CAST(COUNT(DISTINCT n_regionkey) AS BIGINT) FROM nation
        |       WHERE n_nationkey < 5) AS entry_rows,
        |  CAST(0 AS BIGINT) AS tombstones,
        |  (SELECT CAST(COUNT(DISTINCT n_regionkey) AS BIGINT) FROM nation)
        |    AS all_data_files,
        |  CAST(7 AS BIGINT) AS mlog_rows,
        |  CAST(3 AS BIGINT) AS snapshots_spanned,
        |  CAST(1 AS BIGINT) AS props_ok
        |FROM nation WHERE n_nationkey >= 5 ORDER BY k""".stripMargin,
    "ice_sql_call" ->
      """SELECT col_name, exact_ndv, TRUE AS ndv_within_5pct,
        |  1 AS live_files, 1 AS remaining_snapshots, row_count
        |FROM (
        |  SELECT 'c_custkey' AS col_name,
        |    CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS exact_ndv,
        |    CAST(COUNT(*) AS BIGINT) AS row_count
        |  FROM customer WHERE c_custkey >= 100
        |  UNION ALL
        |  SELECT 'c_mktsegment', CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT) FROM customer WHERE c_custkey >= 100
        |  UNION ALL
        |  SELECT 'c_nationkey', CAST(COUNT(DISTINCT c_nationkey) AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT) FROM customer WHERE c_custkey >= 100
        |) ORDER BY col_name""".stripMargin,
    "ice_agg_pushdown" ->
      """SELECT CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
        |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
        |   WHERE o_totalprice >= 10000) AS post_delete_rows,
        |  CAST(-999999 AS BIGINT) AS imported_min
        |FROM orders""".stripMargin,
    "ice_agg_groupby" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MIN(o_orderkey) AS BIGINT) AS lo,
        |  CAST(MAX(o_orderkey) AS BIGINT) AS hi,
        |  MIN(o_totalprice) AS lo_price, MAX(o_totalprice) AS hi_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "ice_partitions_meta" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS r,
        |  CAST(1 AS BIGINT) AS n_files,
        |  CAST(COUNT(*) AS BIGINT) AS n_records,
        |  CAST(1 AS BIGINT) AS bytes_positive,
        |  CAST(0 AS BIGINT) AS has_deletes
        |FROM nation GROUP BY n_regionkey ORDER BY r""".stripMargin,
    "ice_wap" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey,
        |  CAST(1 AS BIGINT) AS main_unchanged_while_staged,
        |  CAST(1 AS BIGINT) AS audit_saw_staged,
        |  CAST(1 AS BIGINT) AS asof_skips_staged
        |FROM (SELECT * FROM nation
        |      UNION ALL SELECT * FROM nation WHERE n_regionkey = 0)
        |ORDER BY n_nationkey""".stripMargin,
    "ice_migrate" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey,
        |  CAST(1 AS BIGINT) AS snapshot_in_place,
        |  CAST(1 AS BIGINT) AS migrate_self_contained,
        |  CAST(1 AS BIGINT) AS register_shares_files,
        |  CAST(1 AS BIGINT) AS rewrite_path_roundtrip,
        |  CAST(1 AS BIGINT) AS avro_snapshot_roundtrip
        |FROM nation
        |ORDER BY n_nationkey""".stripMargin,
    // ice_write_eq_delete registers DYNAMICALLY (duckLiveRows replays the
    // written files' equality deletes in DuckDB — see iceWriteEqDelete)
    "ice_sql_insert" ->
      """WITH t AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        |         CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation
        |  UNION ALL
        |  SELECT CAST(n_nationkey + 100 AS BIGINT), CAST(n_regionkey AS BIGINT)
        |  FROM nation WHERE n_regionkey = 0
        |)
        |SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(n_nationkey) AS BIGINT) AS sum_key
        |FROM t GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "ice_spj_join" ->
      """SELECT c_mktsegment,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue,
        |  CAST(0 AS INTEGER) AS join_shuffles
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
}
