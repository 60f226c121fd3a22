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

  /** SURVEY §2A #15: full scan of the current snapshot (5 live rows). */
  def iceReadAll(s: SparkSession, dir: String): DataFrame =
    table(s).read().orderBy("name")

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
    Seq((t.version, t.read().count(), t.countFromStats().getOrElse(-1L),
        t.snapshotRelative(-1).read().count(), t.snapshots.size))
      .toDF("version", "rows", "rows_from_stats", "rows_prev_snapshot", "n_snapshots")
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
    Seq((t.read().count(), nFiles, prunedRows, parts))
      .toDF("rows", "n_files", "rows_k_eq_7", "cat_partitions")
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
    Seq((t.read().count(), t.snapshotRelative(-1).read().count(),
        t.summary.getOrElse("operation", ""), t.countFromStats().getOrElse(-1L)))
      .toDF("rows_after_delete", "rows_before_delete", "operation", "rows_from_stats")
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
    Seq((t.read().count(),
        t.read(filters = Seq(Seq(("cat", "==", "c1")))).count(),
        t.snapshotRelative(-1).read().count(),
        t.summary.getOrElse("operation", ""),
        t.snapshots.size))
      .toDF("rows_after", "c1_rows_after", "rows_before", "operation", "n_snapshots")
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
    Seq((t.read().count(), t.countFromStats().getOrElse(-1L),
        t.positionDeleteFiles.size.toLong,
        t.snapshotRelative(-1).read().count(),
        t.summary.getOrElse("operation", "")))
      .toDF("rows_after", "rows_from_stats", "n_delete_files", "rows_before", "operation")
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
    Seq((t.read().count(), t.countFromStats().getOrElse(-1L),
        t.read().filter(col("cat") === "upserted").count(),
        t.snapshotRelative(-1).read().count(),
        t.snapshots.size.toLong,
        t.summary.getOrElse("added-position-deletes", "")))
      .toDF("rows_after", "rows_from_stats", "upserted_rows", "rows_before",
        "n_snapshots", "pos_deletes")
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
    t.read()
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
        (if (intact) lit(1) else lit(0)).as("old_files_intact"))
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
    val nonNullCat = t.read().filter(col("category").isNotNull).count()
    val nullScores = t.read().filter(col("score").isNull).count()
    Seq((t.schema.fieldNames.mkString(","), t.read().count(), nonNullCat, nullScores,
        t.snapshotRelative(-1).schema.fieldNames.length.toLong))
      .toDF("fields", "rows", "category_values", "null_scores", "old_schema_width")
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
    Maintenance.compact(s, url, targetFiles = Some(2))
    Maintenance.expireSnapshots(s, url, keepLast = 1)
    val t = IcebergTable.load(s, url)
    Seq((filesBefore, t.liveFiles().size.toLong, t.read().count(),
        t.snapshots.size.toLong, t.summary.getOrElse("operation", "")))
      .toDF("files_before", "files_after", "rows", "n_snapshots", "operation")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ice_write_overwrite"  -> (iceWriteOverwrite _),
    "ice_write_delete_rows" -> (iceWriteDeleteRows _),
    "ice_write_merge"      -> (iceWriteMerge _),
    "ice_spj_join"         -> (iceSpjJoin _),
    "ice_sql_insert"       -> (iceSqlInsert _),
    "ice_write_eq_delete"  -> (iceWriteEqDelete _),
    "ice_refs"             -> (iceRefs _),
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

  /** The one metadata-plane query with a DuckDB oracle: the SPJ join's
    * VALUES come from relational semantics DuckDB can replay (the literal 0
    * pins the no-shuffle plan shape). */
  val oracle: Map[String, String] = Map(
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
    "ice_write_eq_delete" ->
      """WITH updates AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        |         'NEW_' || n_name AS n_name,
        |         CAST(n_regionkey AS BIGINT) AS n_regionkey
        |  FROM nation WHERE n_regionkey = 0
        |  UNION ALL SELECT 999, 'ATLANTIS', 0
        |)
        |SELECT n_nationkey, n_name, n_regionkey,
        |  CAST(1 AS INTEGER) AS old_files_intact
        |FROM (
        |  SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |         CAST(n_regionkey AS BIGINT) AS n_regionkey
        |  FROM nation
        |  WHERE n_nationkey NOT IN (SELECT n_nationkey FROM updates)
        |  UNION ALL SELECT * FROM updates
        |) ORDER BY n_nationkey""".stripMargin,
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
