package graft.iceberg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg TABLE STATISTICS files: per-column NDV as theta sketches in a
  * puffin statistics file, registered in metadata, surfaced to Spark's CBO
  * through DSv2 column stats, and lifecycle-managed by maintenance. */
class StatisticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def fresh(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/t"

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("cat", StringType),
    StructField("score", DoubleType)))

  /** 1000 rows: k unique, cat has 7 values (50 nulls), score has 100. */
  private def build(url: String): Unit = {
    IcebergWriter.createTable(spark, url, schema)
    val df = (1L to 1000L).map(i =>
      (i, if (i % 20 == 0) null else s"c${i % 7}", (i % 100).toDouble))
      .toDF("k", "cat", "score")
    IcebergWriter.append(spark, url, df.repartition(4))
  }

  test("computed NDVs land within theta error of exact; file round-trips") {
    val url = fresh("graft_stats")
    build(url)
    val ndvs = Maintenance.computeStatistics(spark, url)
    val t = IcebergTable.load(spark, url)
    val byName = t.iceSchema.fields.map(f => f.name -> f.id).toMap
    def ndv(c: String): Long = ndvs(byName(c))
    // default theta lgK=12 → ~1.6% error at these cardinalities
    assert(math.abs(ndv("k") - 1000) <= 50, s"k ndv=${ndv("k")}")
    assert(ndv("cat") == 7, s"cat ndv=${ndv("cat")}")
    assert(ndv("score") == 100, s"score ndv=${ndv("score")}")

    // metadata registration: one entry, bound to the current snapshot,
    // spec blob type, ndv property == decoded sketch estimate
    val entry = t.metadata.statistics match {
      case Seq(e) => e
      case other => fail(s"expected one statistics entry, got $other")
    }
    assert(entry.snapshotId == t.currentSnapshot.snapshotId)
    assert(entry.blobs.forall(_.blobType == TableStatistics.ThetaBlobType))
    val conf = spark.sessionState.newHadoopConf()
    val decoded = TableStatistics.readSketches(t.resolvePath(entry.path), conf)
    assert(decoded.map(b => b.fieldId -> b.ndv).toMap == ndvs,
      "registered ndv properties must equal the decoded sketch estimates")
    // fast path used by the scan
    assert(TableStatistics.ndvFor(t, t.currentSnapshot.snapshotId) == ndvs)
    // stale snapshot -> no stats served
    assert(TableStatistics.ndvFor(t, 12345L).isEmpty)
  }

  test("NDV counts LIVE rows only (merge-on-read applied)") {
    val url = fresh("graft_stats_mor")
    build(url)
    IcebergWriter.upgradeFormatVersion(spark, url, 3)
    IcebergWriter.deleteRows(spark, url, Pruning.GtEq("k", 501L)) // halve
    val ndvs = Maintenance.computeStatistics(spark, url)
    val t = IcebergTable.load(spark, url)
    val kId = t.iceSchema.fields.find(_.name == "k").get.id
    assert(math.abs(ndvs(kId) - 500) <= 25, s"post-delete k ndv=${ndvs(kId)}")
  }

  test("CBO sees distinctCount + nullCount + manifest min/max through the DSv2 scan") {
    val url = fresh("graft_stats_cbo")
    build(url)
    Maintenance.computeStatistics(spark, url)
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val df = spark.read.format("graft-iceberg").load(url)
      val stats = df.queryExecution.optimizedPlan.stats
      val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
      assert(byName.contains("cat"), s"no column stats surfaced: $byName")
      val cat = byName("cat")
      assert(cat.distinctCount.exists(_.toLong == 7L), s"cat: $cat")
      assert(cat.nullCount.exists(_.toLong == 50L), s"cat: $cat")
      val k = byName("k")
      assert(k.distinctCount.exists(dc => math.abs(dc.toLong - 1000L) <= 50), s"k: $k")
      // manifest-bounds min/max reach the CBO in catalyst form, zero I/O
      assert(k.min.contains(1L) && k.max.contains(1000L), s"k: $k")
      val score = byName("score")
      assert(score.min.contains(0.0) && score.max.contains(99.0), s"score: $score")

      // ...and FilterEstimation consumes them: a range predicate covering
      // ~10% of [1,1000] must estimate well under the full row count,
      // an out-of-range predicate near zero — the bounds' reason to exist
      val full = spark.read.format("graft-iceberg").load(url)
        .queryExecution.optimizedPlan.stats.rowCount
      val tenth = spark.read.format("graft-iceberg").load(url)
        .filter("k <= 100").queryExecution.optimizedPlan.stats.rowCount
      val none = spark.read.format("graft-iceberg").load(url)
        .filter("k > 5000").queryExecution.optimizedPlan.stats.rowCount
      assert(full.exists(_ == BigInt(1000)), s"full: $full")
      assert(tenth.exists(t => t >= 50 && t <= 200),
        s"k <= 100 over [1,1000] must estimate ~10%, got $tenth")
      assert(none.exists(_ <= 1), s"out-of-range must estimate ~0, got $none")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("incremental compute unions appended sketches; deletes fall back to full") {
    val url = fresh("graft_stats_inc")
    build(url) // k 1..1000
    Maintenance.computeStatistics(spark, url)
    IcebergWriter.append(spark, url, (1001L to 1500L).map(i =>
      (i, s"c${i % 7}", (i % 100).toDouble)).toDF("k", "cat", "score").coalesce(1))
    val before = TableStatistics.incrementalUnions.get()
    val ndvs = TableStatistics.computeIncremental(spark, url)
    assert(TableStatistics.incrementalUnions.get() == before + 1,
      "appends since the prior entry must take the sketch-union path")
    val t = IcebergTable.load(spark, url)
    val kId = t.iceSchema.fields.find(_.name == "k").get.id
    assert(math.abs(ndvs(kId) - 1500) <= 75, s"k ndv=${ndvs(kId)}")

    // a DELETE in the range cannot be subtracted from a theta sketch:
    // incremental must FALL BACK to the full pass and stay correct
    IcebergWriter.upgradeFormatVersion(spark, url, 3)
    IcebergWriter.deleteRows(spark, url, Pruning.GtEq("k", 1001L))
    val before2 = TableStatistics.incrementalUnions.get()
    val ndvs2 = TableStatistics.computeIncremental(spark, url)
    assert(TableStatistics.incrementalUnions.get() == before2,
      "a delete in the range must not take the union path")
    assert(math.abs(ndvs2(kId) - 1000) <= 50, s"post-delete k ndv=${ndvs2(kId)}")

    // already-registered head snapshot: no-op, serves the registered map
    assert(TableStatistics.computeIncremental(spark, url) == ndvs2)
  }

  test("compaction is content-neutral to incremental stats") {
    val url = fresh("graft_stats_compact")
    IcebergWriter.createTable(spark, url, schema)
    for (_ <- 1 to 3) // small files -> something to compact
      IcebergWriter.append(spark, url,
        (1L to 100L).map(i => (i, s"c${i % 7}", 0.0)).toDF("k", "cat", "score")
          .coalesce(1))
    Maintenance.computeStatistics(spark, url)
    Maintenance.compact(spark, url)
    // the replace snapshot changed no rows: the refresh takes the cheap
    // union path (incremental scan of a replace range is empty) and the
    // estimates stay put
    val before = TableStatistics.incrementalUnions.get()
    val ndvs = TableStatistics.computeIncremental(spark, url)
    assert(TableStatistics.incrementalUnions.get() == before + 1,
      "a replace-only range must take the union path")
    val t = IcebergTable.load(spark, url)
    val kId = t.iceSchema.fields.find(_.name == "k").get.id
    assert(ndvs(kId) == 100L, s"compaction must not change NDV: ${ndvs(kId)}")
    assert(t.metadata.statistics.exists(_.snapshotId == t.currentSnapshot.snapshotId))
  }

  test("partition statistics file: spec schema, counts from manifests, lifecycle") {
    val url = fresh("graft_pstats")
    IcebergWriter.createTable(spark, url, schema,
      partitions = Seq(("cat", "identity")))
    val df = (1L to 300L).map(i => (i, s"c${i % 3}", (i % 10).toDouble))
      .toDF("k", "cat", "score")
    IcebergWriter.append(spark, url, df.repartition(2))
    val path = Maintenance.computePartitionStatistics(spark, url)
    assert(new java.io.File(path).isFile, "registered path must be a FILE")
    val t = IcebergTable.load(spark, url)
    assert(t.metadata.partitionStatistics.size == 1)

    val stats = PartitionStatistics.read(spark, t, t.currentSnapshot.snapshotId).get
    // spec schema: partition struct + counts, spec field names
    assert(stats.schema.fieldNames.toSeq == Seq("partition", "spec_id",
      "data_record_count", "data_file_count", "total_data_file_size_in_bytes",
      "position_delete_record_count", "position_delete_file_count",
      "equality_delete_record_count", "equality_delete_file_count",
      "total_record_count", "last_updated_at", "last_updated_snapshot_id"))
    val counts = stats
      .selectExpr("partition.cat", "data_record_count", "data_file_count")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(counts.keySet == Set("c0", "c1", "c2"))
    assert(counts.values.map(_._1).sum == 300L)
    assert(counts("c0")._1 == 100L)
    // agrees with the partitions metadata table (the other consumer)
    val metaCounts = t.partitionStats().selectExpr("cat", "n_records")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.view.mapValues(_._1).toMap == metaCounts)
    // no deletes: total_record_count is exact and equals data_record_count
    assert(stats.selectExpr("total_record_count", "data_record_count")
      .collect().forall(r => !r.isNullAt(0) && r.getLong(0) == r.getLong(1)))

    // with CROSS-PARTITION delete carriers (this writer's row-level delete
    // files carry a null partition tuple) the accurate post-delete count is
    // not derivable from metadata — the spec-optional field must go NULL,
    // never silently wrong
    IcebergWriter.deleteRows(spark, url, Pruning.Eq("k", 7L))
    Maintenance.computePartitionStatistics(spark, url)
    val t2b = IcebergTable.load(spark, url)
    val stats2 = PartitionStatistics.read(spark, t2b,
      t2b.currentSnapshot.snapshotId).get
    assert(stats2.selectExpr("total_record_count")
      .collect().forall(_.isNullAt(0)),
      "inexact total_record_count must be null, not wrong")

    // new snapshot + recompute -> one entry per computed snapshot (3 now);
    // expire to the head drops every stale one and collects their files
    IcebergWriter.append(spark, url,
      Seq((301L, "c0", 1.0)).toDF("k", "cat", "score"))
    Maintenance.computePartitionStatistics(spark, url)
    val t2 = IcebergTable.load(spark, url)
    assert(t2.metadata.partitionStatistics.size == 3)
    val stale = t2.metadata.partitionStatistics
      .filter(_.snapshotId != t2.currentSnapshot.snapshotId)
      .map(e => t2.resolvePath(e.path))
    Maintenance.expireSnapshots(spark, url, keepLast = 1)
    val t3 = IcebergTable.load(spark, url)
    assert(t3.metadata.partitionStatistics.map(_.snapshotId) ==
      Seq(t3.currentSnapshot.snapshotId))
    val live = t3.resolvePath(t3.metadata.partitionStatistics.head.path)
    stale.foreach(p => assert(!new java.io.File(p).exists,
      "stale partition-stats file must die"))
    assert(new java.io.File(live).exists, "live partition-stats file must survive")
  }

  test("NDVs survive table advancement: nearest-ancestor entry serves the CBO") {
    val url = fresh("graft_stats_anc")
    build(url)
    Maintenance.computeStatistics(spark, url)
    // advance the table WITHOUT recomputing: the scan must serve the
    // ancestor's (bounded-stale) NDVs, not go CBO-blind
    IcebergWriter.append(spark, url,
      Seq((5000L, "c1", 1.0)).toDF("k", "cat", "score").coalesce(1))
    val t = IcebergTable.load(spark, url)
    val head = t.currentSnapshot.snapshotId
    assert(TableStatistics.ndvFor(t, head).isEmpty, "no entry at the head")
    val served = TableStatistics.ndvForNearestAncestor(t, head)
    val catId = t.iceSchema.fields.find(_.name == "cat").get.id
    assert(served(catId) == 7L, s"ancestor NDVs must serve: $served")

    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val stats = spark.read.format("graft-iceberg").load(url)
        .queryExecution.optimizedPlan.stats
      val cat = stats.attributeStats.collectFirst {
        case (a, s) if a.name == "cat" => s
      }
      assert(cat.exists(_.distinctCount.exists(_.toLong == 7L)),
        s"CBO must still see ancestor NDVs after an append: $cat")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("registered NDVs flip a join to broadcast under CBO") {
    val url = fresh("graft_stats_flip")
    build(url)
    val prevCbo = spark.conf.getOption("spark.sql.cbo.enabled")
    val prevThr = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // threshold below the scan size: neither raw side can broadcast, so
      // only a small AGGREGATE-output estimate (which needs the group
      // column's NDV) can flip the build side
      val scanSize = spark.read.format("graft-iceberg").load(url)
        .queryExecution.optimizedPlan.stats.sizeInBytes.toLong
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (scanSize / 2).toString)
      def planned() = {
        val fact = spark.read.format("graft-iceberg").load(url)
        val agg = spark.read.format("graft-iceberg").load(url)
          .groupBy("cat").agg(org.apache.spark.sql.functions.sum("score").as("s"))
        fact.join(agg, "cat").queryExecution.sparkPlan
      }
      def broadcasts(p: org.apache.spark.sql.execution.SparkPlan) = p.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }
      assert(broadcasts(planned()).isEmpty,
        "without NDV stats the aggregate side must not broadcast (size-only " +
          "estimate = the whole scan)")
      Maintenance.computeStatistics(spark, url)
      assert(broadcasts(planned()).nonEmpty,
        "with cat NDV=7 registered, CBO must estimate the aggregate at ~7 " +
          "rows and broadcast it — the stats' reason to exist")
    } finally {
      prevCbo match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
      prevThr match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  test("incremental refresh costs well under the full rebuild (∝ new data)") {
    val url = fresh("graft_stats_speed")
    IcebergWriter.createTable(spark, url, schema)
    // big enough that the full pass dominates fixed job overhead (~0.1s
    // floors BOTH sides at small row counts and the ratio goes noisy)
    val big = spark.range(2000000).selectExpr("id as k",
      "concat('c', id % 1000) as cat", "cast(id % 5000 as double) as score")
    IcebergWriter.append(spark, url, big.repartition(8))
    TableStatistics.compute(spark, url) // warm-up: JIT + classloading
    val t0 = System.nanoTime()
    TableStatistics.compute(spark, url)
    val full = System.nanoTime() - t0
    // append 0.2% and refresh: the union path must run and cost a fraction
    // of the rebuild — the 100 TB claim in miniature
    IcebergWriter.append(spark, url, spark.range(2000000, 2004000).selectExpr(
      "id as k", "concat('c', id % 1000) as cat",
      "cast(id % 5000 as double) as score").coalesce(1))
    val before = TableStatistics.incrementalUnions.get()
    val t1 = System.nanoTime()
    TableStatistics.computeIncremental(spark, url)
    val incr = System.nanoTime() - t1
    assert(TableStatistics.incrementalUnions.get() == before + 1,
      "the refresh must take the sketch-union path")
    // the 0.3s absolute escape keeps the ratio check honest on a machine
    // where suite-wide load squeezes the full pass into the overhead floor
    assert(incr < full * 0.6 || incr < 300000000L,
      f"incremental (${incr / 1e9}%.2fs) must be well under the full " +
        f"rebuild (${full / 1e9}%.2fs)")
  }

  test("corrupt prior puffin THROWS from incremental; expected causes tick fullFallbacks") {
    val url = fresh("graft_stats_hard")
    build(url)
    Maintenance.computeStatistics(spark, url)
    val t = IcebergTable.load(spark, url)
    val puffin = t.resolvePath(t.metadata.statistics.head.path)
    IcebergWriter.append(spark, url,
      Seq((9999L, "c0", 0.0)).toDF("k", "cat", "score").coalesce(1))
    // corrupt the registered puffin: valid envelope shape, garbage payload
    val junk = "PFA1".getBytes ++ "PFA1".getBytes ++ "junk".getBytes ++
      java.nio.ByteBuffer.allocate(12)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(4).putInt(0).put("PFA1".getBytes).array()
    val good = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(puffin))
    java.nio.file.Files.write(java.nio.file.Paths.get(puffin), junk)
    val fb0 = TableStatistics.fullFallbacks.get()
    intercept[Exception] {
      TableStatistics.computeIncremental(spark, url)
    }
    assert(TableStatistics.fullFallbacks.get() == fb0,
      "a corrupt puffin is a FAULT, not a fallback — it must not mask as " +
        "a silent full recompute")
    java.nio.file.Files.write(java.nio.file.Paths.get(puffin), good)

    // schema drift IS an expected fallback: new statable column since the
    // prior entry — full pass runs and the gauge ticks
    IcebergWriter.addColumn(spark, url, "extra", "long")
    IcebergWriter.append(spark, url,
      Seq((10000L, "c0", 0.0, 42L)).toDF("k", "cat", "score", "extra").coalesce(1))
    val fb1 = TableStatistics.fullFallbacks.get()
    val ndvs = TableStatistics.computeIncremental(spark, url)
    assert(TableStatistics.fullFallbacks.get() == fb1 + 1,
      "schema drift must fall back to the full pass and count itself")
    val t2 = IcebergTable.load(spark, url)
    val extraId = t2.iceSchema.fields.find(_.name == "extra").get.id
    assert(ndvs.contains(extraId), "full pass must cover the new column")

    // a delete in the range is the other expected fallback
    IcebergWriter.deleteRows(spark, url, Pruning.Eq("k", 10000L))
    val fb2 = TableStatistics.fullFallbacks.get()
    TableStatistics.computeIncremental(spark, url)
    assert(TableStatistics.fullFallbacks.get() == fb2 + 1,
      "a delete in the range must fall back to the full pass and count itself")
  }

  test("uuid columns sketch via the spec's 16-byte form instead of crashing") {
    val url = fresh("graft_stats_uuid")
    IcebergWriter.createTable(spark, url, StructType(Seq(StructField("k", LongType))))
    IcebergWriter.addColumn(spark, url, "u", "uuid")
    // 200 rows, 100 distinct uuids (spark surfaces uuid as string)
    val df = (1L to 200L).map(i =>
      (i, new java.util.UUID(0L, i % 100).toString)).toDF("k", "u")
    IcebergWriter.append(spark, url, df.repartition(2))
    val ndvs = Maintenance.computeStatistics(spark, url)
    val t = IcebergTable.load(spark, url)
    val uId = t.iceSchema.fields.find(_.name == "u").get.id
    assert(ndvs.contains(uId), "uuid column must be statable")
    assert(math.abs(ndvs(uId) - 100) <= 5, s"u ndv=${ndvs(uId)}")
  }

  test("partition stats attribute old-spec files through their own spec") {
    val url = fresh("graft_pstats_evo")
    IcebergWriter.createTable(spark, url, schema,
      partitions = Seq(("cat", "identity")))
    val a = (1L to 90L).map(i => (i, s"c${i % 3}", 0.0)).toDF("k", "cat", "score")
    IcebergWriter.append(spark, url, a.repartition(2))
    // rename the source column: the NEW default spec derives field name
    // "category", but the field ID is REUSED (same source + transform), so
    // old files' {"cat": ...} values coerce into the unified tuple
    IcebergWriter.renameColumn(spark, url, "cat", "category")
    IcebergWriter.updatePartitionSpec(spark, url, Seq(("category", "identity")))
    val b = (91L to 120L).map(i => (i, "c0", 0.0)).toDF("k", "category", "score")
    IcebergWriter.append(spark, url, b.coalesce(1))

    val t = IcebergTable.load(spark, url)
    val oldFid = t.metadata.specById(0).fields.head.fieldId
    assert(t.partitionSpec.fields.head.fieldId == oldFid,
      "rename must not mint a new partition field id")

    Maintenance.computePartitionStatistics(spark, url)
    val t2 = IcebergTable.load(spark, url)
    val stats = PartitionStatistics.read(spark, t2,
      t2.currentSnapshot.snapshotId).get
    val rows = stats.selectExpr("partition.category", "data_record_count", "spec_id")
      .collect().map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getInt(2))).toMap
    // old-spec files must NOT lump into a null partition row
    assert(!rows.contains(None), s"null-partition row present: $rows")
    assert(rows(Some("c0"))._1 == 60L, s"c0 merges both specs' files: $rows")
    assert(rows(Some("c1"))._1 == 30L && rows(Some("c2"))._1 == 30L)
    // spec_id records the newest spec represented in each partition
    assert(rows(Some("c0"))._2 == t2.metadata.defaultSpecId)
    assert(rows(Some("c1"))._2 == 0 && rows(Some("c2"))._2 == 0)
  }

  test("DV entries carry their referenced file's partition; delete counts attribute") {
    val url = fresh("graft_pstats_dv")
    IcebergWriter.createTable(spark, url, schema,
      partitions = Seq(("cat", "identity")))
    val df = (1L to 300L).map(i => (i, s"c${i % 3}", 0.0)).toDF("k", "cat", "score")
    IcebergWriter.append(spark, url, df.repartition(2))
    IcebergWriter.upgradeFormatVersion(spark, url, 3)
    // delete 10 rows, all in partition c0 (k % 3 == 0 ↔ cat == c0)
    IcebergWriter.deleteRows(spark, url, Pruning.LtEq("k", 30L))
    val t = IcebergTable.load(spark, url)
    val dvs = t.positionDeleteFiles.filter(_.isDv)
    assert(dvs.nonEmpty, "expected DV carriers")
    assert(dvs.forall(d => d.partition.get("cat").exists(_ != null)),
      s"every DV must carry its referenced file's partition tuple: $dvs")

    Maintenance.computePartitionStatistics(spark, url)
    val t2 = IcebergTable.load(spark, url)
    val stats = PartitionStatistics.read(spark, t2,
      t2.currentSnapshot.snapshotId).get
    val rows = stats.selectExpr("partition.cat", "data_record_count",
        "position_delete_record_count", "total_record_count")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // k ≤ 30: 10 rows per cat value — every partition attributes exactly
    rows.foreach { case (cat, (data, del, total)) =>
      assert(data == 100L && del == 10L && total == 90L,
        s"$cat: data=$data del=$del total=$total")
    }
  }

  test("stats commit racing appends: entry binds to the computed snapshot, no commit lost") {
    val url = fresh("graft_stats_race")
    build(url)
    val computedSnap = IcebergTable.load(spark, url).currentSnapshot.snapshotId
    // race: 2 appends and a stats compute land concurrently through the
    // optimistic commit loop; the stats entry must register against the
    // snapshot it was COMPUTED on (not whatever is current when its commit
    // finally lands) and no append snapshot may be lost
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    try {
      val fs = Seq(
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = { Maintenance.computeStatistics(spark, url); () }
        })) ++ (1 to 2).map { i =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = IcebergWriter.append(spark, url,
            Seq((10000L + i, "x", 0.0)).toDF("k", "cat", "score").coalesce(1))
        })
      }
      fs.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    val t = IcebergTable.load(spark, url)
    assert(t.metadata.snapshots.size == 3, "no append snapshot may be lost")
    assert(t.metadata.statistics.map(_.snapshotId) == Seq(computedSnap),
      s"stats must bind to the computed snapshot: ${t.metadata.statistics}")
    assert(t.read().count() == 1002)
  }

  test("recompute replaces the snapshot's entry; expire collects stale files") {
    val url = fresh("graft_stats_life")
    build(url)
    Maintenance.computeStatistics(spark, url)
    Maintenance.computeStatistics(spark, url) // same snapshot: replace
    val t1 = IcebergTable.load(spark, url)
    assert(t1.metadata.statistics.size == 1, "recompute must replace, not stack")
    val stalePath = t1.resolvePath(t1.metadata.statistics.head.path)

    // new snapshot + fresh stats: two entries (one per snapshot)
    IcebergWriter.append(spark, url, Seq((2000L, "z", 1.0)).toDF("k", "cat", "score"))
    Maintenance.computeStatistics(spark, url)
    val t2 = IcebergTable.load(spark, url)
    assert(t2.metadata.statistics.size == 2)
    val livePath = t2.resolvePath(t2.metadata.statistics
      .find(_.snapshotId == t2.currentSnapshot.snapshotId).get.path)

    // expire to head: stale entry AND its puffin die; live one survives
    Maintenance.expireSnapshots(spark, url, keepLast = 1)
    val t3 = IcebergTable.load(spark, url)
    assert(t3.metadata.statistics.map(_.snapshotId) ==
      Seq(t3.currentSnapshot.snapshotId))
    assert(!new java.io.File(stalePath).exists,
      "expired snapshot's statistics file must be collected")
    assert(new java.io.File(livePath).exists,
      "current snapshot's statistics file must survive")

    // a crashed compute's UNREGISTERED stats puffin is an orphan
    val stray = new java.io.File(s"$url/metadata/00000-dead-stats.puffin")
    java.nio.file.Files.write(stray.toPath, Array[Byte](0x50, 0x46, 0x41, 0x31))
    stray.setLastModified(System.currentTimeMillis() - 10L * 24 * 3600 * 1000)
    Maintenance.removeOrphans(spark, url)
    assert(!stray.exists, "unregistered stats puffin must be collected")
    assert(new java.io.File(livePath).exists,
      "registered stats puffin must survive orphan removal")
  }
}
