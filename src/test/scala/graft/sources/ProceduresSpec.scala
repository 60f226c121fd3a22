package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergTable, IcebergWriter, Pruning}

/** SQL `CALL` maintenance procedures (Spark 4 DSv2 ProcedureCatalog):
  * every maintenance operation reachable from pure SQL through both graft
  * catalogs, with named arguments, defaults, and result rows. */
class ProceduresSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // own the session (an earlier suite may have left an extensions-bearing
    // default whose rules change the plans this spec asserts on)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
  import spark.implicits._

  private def withCatalog(f: (String, String) => Unit): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft_proc").toString
    val cat = s"pr${wh.hashCode.toHexString}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftIcebergPathCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    f(cat, wh)
  }

  private def build(url: String, files: Int = 3): Unit = {
    IcebergWriter.createTable(spark, url,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cat",
          org.apache.spark.sql.types.StringType))))
    for (i <- 1 to files)
      IcebergWriter.append(spark, url,
        (1L to 50L).map(j => (i * 100L + j, s"c${j % 5}"))
          .toDF("k", "cat").coalesce(1))
  }

  test("CALL compact folds files; result reports snapshots + live files") {
    withCatalog { (cat, wh) =>
      build(s"$wh/db/t")
      val before = IcebergTable.load(spark, s"$wh/db/t")
      assert(before.liveFiles().size == 3)
      val row = spark.sql(
        s"CALL $cat.system.compact(table => 'db.t')").collect().head
      assert(row.getAs[Long]("previous_snapshot_id") ==
        before.currentSnapshot.snapshotId)
      assert(row.getAs[Int]("live_files") == 1)
      assert(spark.table(s"$cat.db.t").count() == 150)
    }
  }

  test("CALL expire_snapshots with keep_last default and named arg") {
    withCatalog { (cat, wh) =>
      build(s"$wh/db/t")
      val r = spark.sql(
        s"CALL $cat.system.expire_snapshots(table => 'db.t', keep_last => 2)")
        .collect().head
      assert(r.getAs[Int]("expired_snapshots") == 1)
      assert(r.getAs[Int]("remaining_snapshots") == 2)
      // default keep_last = 1
      val r2 = spark.sql(
        s"CALL $cat.system.expire_snapshots('db.t')").collect().head
      assert(r2.getAs[Int]("remaining_snapshots") == 1)
    }
  }

  test("CALL rollback_to_snapshot + create_tag + drop_ref") {
    withCatalog { (cat, wh) =>
      build(s"$wh/db/t")
      val t = IcebergTable.load(spark, s"$wh/db/t")
      val first = t.metadata.snapshots.head.snapshotId
      spark.sql(s"CALL $cat.system.create_tag(table => 'db.t', tag => 'v1')")
      assert(IcebergTable.load(spark, s"$wh/db/t").refs.contains("v1"))
      val r = spark.sql("CALL " + cat +
        s".system.rollback_to_snapshot(table => 'db.t', snapshot_id => $first)")
        .collect().head
      assert(r.getAs[Long]("current_snapshot_id") == first)
      assert(spark.table(s"$cat.db.t").count() == 50)
      val r2 = spark.sql(
        s"CALL $cat.system.drop_ref(table => 'db.t', ref => 'v1')").collect().head
      assert(!IcebergTable.load(spark, s"$wh/db/t").refs.contains("v1"))
    }
  }

  test("CALL rollback_to_timestamp resolves the wall-clock undo target") {
    withCatalog { (cat, wh) =>
      val url = s"$wh/db/rt"
      IcebergWriter.createTable(spark, url,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType))))
      for (i <- 1 to 3) { // distinct commit timestamps
        IcebergWriter.append(spark, url,
          (1L to 10L).map(j => Tuple1(i * 100L + j)).toDF("k").coalesce(1))
        Thread.sleep(5)
      }
      val t = IcebergTable.load(spark, url)
      val mid = t.metadata.snapshots(1)
      val r = spark.sql(s"CALL $cat.system.rollback_to_timestamp(" +
        s"table => 'db.rt', timestamp_ms => ${mid.timestampMs}L)")
        .collect().head
      assert(r.getAs[Long]("current_snapshot_id") == mid.snapshotId)
      assert(spark.table(s"$cat.db.rt").count() == 20)
      // a time before every commit refuses
      intercept[Exception] {
        spark.sql(s"CALL $cat.system.rollback_to_timestamp(" +
          s"table => 'db.rt', timestamp_ms => 1000L)").collect()
      }
    }
  }

  test("CALL compute_table_stats (full + incremental) returns per-column NDVs") {
    withCatalog { (cat, wh) =>
      build(s"$wh/db/t")
      val rows = spark.sql(
        s"CALL $cat.system.compute_table_stats(table => 'db.t')")
        .collect().map(r => r.getAs[String]("column_name") ->
          r.getAs[Long]("ndv")).toMap
      assert(rows("cat") == 5L, s"ndvs: $rows")
      assert(math.abs(rows("k") - 150L) <= 8)
      // incremental after an append takes the union path
      IcebergWriter.append(spark, s"$wh/db/t",
        Seq((9999L, "z")).toDF("k", "cat").coalesce(1))
      val before = graft.iceberg.TableStatistics.incrementalUnions.get()
      val rows2 = spark.sql(s"CALL $cat.system.compute_table_stats(" +
        "table => 'db.t', incremental => true)")
        .collect().map(r => r.getAs[String]("column_name") ->
          r.getAs[Long]("ndv")).toMap
      assert(graft.iceberg.TableStatistics.incrementalUnions.get() == before + 1)
      assert(rows2("cat") == 6L, s"ndvs: $rows2")
    }
  }

  test("CALL rewrite_position_deletes + compute_partition_stats + zorder") {
    withCatalog { (cat, wh) =>
      val url = s"$wh/db/t"
      IcebergWriter.createTable(spark, url,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cat",
            org.apache.spark.sql.types.StringType))),
        partitions = Seq(("cat", "identity")))
      IcebergWriter.append(spark, url,
        (1L to 100L).map(j => (j, j * 7 % 100, s"c${j % 2}"))
          .toDF("k", "v", "cat").repartition(2))
      IcebergWriter.deleteRows(spark, url, Pruning.Eq("k", 3L))
      IcebergWriter.deleteRows(spark, url, Pruning.Eq("k", 7L))
      val r = spark.sql(
        s"CALL $cat.system.rewrite_position_deletes(table => 'db.t')")
        .collect().head
      assert(r.getAs[Int]("position_delete_files") == 1)
      val p = spark.sql(
        s"CALL $cat.system.compute_partition_stats(table => 'db.t')")
        .collect().head.getAs[String]("statistics_path")
      assert(new java.io.File(p).isFile)
      val z = spark.sql(s"CALL $cat.system.zorder(" +
        "table => 'db.t', columns => 'k, v')").collect().head
      assert(z.getAs[Int]("live_files") >= 1)
      assert(spark.table(s"$cat.db.t").count() == 98)
    }
  }

  test("CALL fast_forward publishes a staged branch (WAP via SQL)") {
    withCatalog { (cat, wh) =>
      val url = s"$wh/db/t"
      build(url, files = 1)
      IcebergWriter.appendToBranch(spark, url,
        Seq((777L, "staged")).toDF("k", "cat"), "audit")
      assert(spark.table(s"$cat.db.t").count() == 50, "staged rows invisible")
      spark.sql(s"CALL $cat.system.fast_forward(table => 'db.t', branch => 'audit')")
      assert(spark.table(s"$cat.db.t").count() == 51, "published after CALL")
    }
  }

  test("create_changelog_view: a timestamp bound inside a ROLLED-BACK era " +
      "refuses with the rollback diagnosis, not a bare ancestry error") {
    withCatalog { (cat, wh) =>
      val url = s"$wh/db/rbcl"
      build(url, files = 1)
      Thread.sleep(5)
      IcebergWriter.append(spark, url,
        Seq((999L, "bad")).toDF("k", "cat"))
      val t1 = graft.iceberg.IcebergTable.load(spark, url)
      val badEra = t1.currentSnapshot.timestampMs
      Thread.sleep(5)
      IcebergWriter.rollbackTo(spark, url,
        t1.currentSnapshot.parentSnapshotId.get)
      val e = intercept[Exception] {
        spark.sql(s"CALL $cat.system.create_changelog_view(" +
          s"table => 'db.rbcl', start_timestamp_ms => ${badEra}L)").collect()
      }
      def msgs(t: Throwable): String =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(x => Option(x.getMessage).getOrElse("")).mkString(" ")
      assert(msgs(e).contains("rolled back"),
        s"expected the rollback diagnosis, got: ${msgs(e)}")
    }
  }

  test("CALL create_changelog_view: CDC rows queryable as a temp view") {
    withCatalog { (cat, wh) =>
      val url = s"$wh/db/cl"
      build(url, files = 2) // 2 append commits, 50 rows each
      IcebergWriter.deleteWhere(spark, url, Pruning.Gt("k", 200L)) // drop file 2
      val name = spark.sql(
        s"CALL $cat.system.create_changelog_view(table => 'db.cl')")
        .head().getString(0)
      assert(name == "cl_changes")
      // default range starts EXCLUSIVE at the oldest snapshot: commit 2's
      // 50 inserts and the delete commit's 50 deletes
      assert(spark.sql(
        s"SELECT count(*) FROM $name WHERE _change_type = 'insert'")
        .head().getLong(0) == 50)
      assert(spark.sql(
        s"SELECT count(*) FROM $name WHERE _change_type = 'delete'")
        .head().getLong(0) == 50)
      // _change_ordinal: commit index among the range's change-emitting
      // commits, oldest first — inserts from commit 2 are ordinal 0, the
      // delete commit is ordinal 1 (replay order without a snapshot join)
      assert(spark.sql(s"SELECT DISTINCT _change_type, _change_ordinal " +
        s"FROM $name ORDER BY _change_ordinal").collect().map(r =>
        (r.getString(0), r.getInt(1))).toSeq == Seq(("insert", 0), ("delete", 1)))
      // explicit name + explicit end mid-history: only commit 2's inserts
      val midEnd = IcebergTable.load(spark, url).metadata.snapshots(1).snapshotId
      spark.sql(s"CALL $cat.system.create_changelog_view(table => 'db.cl', " +
        s"changelog_view => 'cl_mid', end_snapshot_id => ${midEnd}L)")
      assert(spark.sql("SELECT count(*) FROM cl_mid").head().getLong(0) == 50)
      spark.catalog.dropTempView(name)
      spark.catalog.dropTempView("cl_mid")
    }
  }

  test("named arguments with omitted middle optionals bind by declared " +
      "name across every multi-optional procedure") {
    withCatalog { (cat, wh) =>
      val url = s"$wh/db/m"
      build(url, files = 2)
      Thread.sleep(5) // distinct commit timestamps for the ts-bound case
      IcebergWriter.deleteWhere(spark, url, Pruning.Gt("k", 200L))
      val t = IcebergTable.load(spark, url)
      val midEnd = t.metadata.snapshots(1).snapshotId
      // create_changelog_view(table, changelog_view, start_snapshot_id,
      // end_snapshot_id): every subset of the three optionals, middle
      // omissions included — each names the view so results are separable
      def count(view: String, tpe: String): Long = spark.sql(
        s"SELECT count(*) FROM $view WHERE _change_type = '$tpe'").head().getLong(0)
      spark.sql(s"CALL $cat.system.create_changelog_view(table => 'db.m', " +
        s"changelog_view => 'm_a', end_snapshot_id => ${midEnd}L)")
      assert(count("m_a", "insert") == 50 && count("m_a", "delete") == 0,
        "explicit end with OMITTED middle start must stop at the mid snapshot")
      spark.sql(s"CALL $cat.system.create_changelog_view(table => 'db.m', " +
        s"end_snapshot_id => ${midEnd}L)")
      assert(count("m_changes", "insert") == 50 && count("m_changes", "delete") == 0,
        "end-only (view name AND start omitted) must still bind end by name")
      spark.sql(s"CALL $cat.system.create_changelog_view(table => 'db.m', " +
        s"changelog_view => 'm_b', start_snapshot_id => ${midEnd}L)")
      assert(count("m_b", "insert") == 0 && count("m_b", "delete") == 50,
        "start-only past the appends must see just the delete commit")
      // expire_snapshots(table, keep_last, older_than_ms): skip the middle
      // keep_last — a cutoff of YESTERDAY retains every snapshot committed
      // today beyond keep_last (time-based retention), so nothing expires.
      // A positional misbind would land the epoch-ms long in keep_last
      // (wrong slot) and the retention conf would read null → expire 2.
      val r = spark.sql(s"CALL $cat.system.expire_snapshots(table => 'db.m', " +
        s"older_than_ms => ${System.currentTimeMillis() - 86400000L}L)")
        .collect().head
      assert(r.getAs[Int]("remaining_snapshots") == 3 &&
        r.getAs[Int]("expired_snapshots") == 0,
        "older_than_ms bound by name must retain all of today's snapshots")
      // timestamp-form range bounds: end at the mid snapshot's commit time
      // must land on the same snapshot the id names; mixing both forms for
      // one bound refuses
      val midTs = t.metadata.snapshots(1).timestampMs
      spark.sql(s"CALL $cat.system.create_changelog_view(table => 'db.m', " +
        s"changelog_view => 'm_ts', end_timestamp_ms => ${midTs}L)")
      assert(count("m_ts", "insert") == 50 && count("m_ts", "delete") == 0,
        "end_timestamp_ms must resolve to the latest snapshot at/before it")
      intercept[Exception] {
        spark.sql(s"CALL $cat.system.create_changelog_view(table => 'db.m', " +
          s"end_snapshot_id => ${midEnd}L, end_timestamp_ms => ${midTs}L)")
          .collect()
      }
      spark.catalog.dropTempView("m_ts")
      // net_changes: commit-2's inserts cancel against the delete commit —
      // the full-range net over this table is EMPTY past commit 1
      spark.sql(s"CALL $cat.system.create_changelog_view(table => 'db.m', " +
        s"changelog_view => 'm_net', net_changes => true)")
      assert(spark.sql("SELECT count(*) FROM m_net").head().getLong(0) == 0,
        "insert-then-delete carry-overs must cancel to an empty net")
      // net_changes and identifier_columns are mutually exclusive
      val e = intercept[Exception] {
        spark.sql(s"CALL $cat.system.create_changelog_view(table => 'db.m', " +
          s"changelog_view => 'm_x', identifier_columns => 'k', " +
          s"net_changes => true)").collect()
      }
      def msgs(t: Throwable): String =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(x => Option(x.getMessage).getOrElse("")).mkString(" ")
      assert(msgs(e).contains("cannot combine"))
      Seq("m_a", "m_changes", "m_b", "m_net").foreach(spark.catalog.dropTempView)
    }
  }

  test("bind(inputType) drives call-row layout: a subset row reads by " +
      "name, never by declared position") {
    // drive the DSv2 surface DIRECTLY: bind with (table, end_snapshot_id)
    // — skipping the two middle optionals — then call with a row in THAT
    // layout. A positional reader would land end_snapshot_id in the
    // changelog_view slot and read end as null (the round-14 failure).
    withCatalog { (cat, wh) =>
      val url = s"$wh/db/b"
      build(url, files = 2)
      val t = IcebergTable.load(spark, url)
      val midEnd = t.metadata.snapshots(1).snapshotId
      val unbound = GraftProcedures.load(
        org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("system"), "create_changelog_view"),
        name => IcebergTable.load(spark, s"$wh/${name.replace('.', '/')}"))
      val inputType = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("table",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("end_snapshot_id",
          org.apache.spark.sql.types.LongType)))
      val bound = unbound.bind(inputType)
      bound.call(org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString("db.b"),
        midEnd))
      assert(spark.sql("SELECT count(*) FROM b_changes").head().getLong(0) == 50,
        "subset-layout row must bind end_snapshot_id by name")
      spark.catalog.dropTempView("b_changes")
    }
  }

  test("scoped compaction: CALL compact(where) rewrites only the matching " +
      "files; remove_orphan_files(dry_run) audits without deleting") {
    withCatalog { (cat, wh) =>
      val url = s"$wh/db/s"
      build(url, files = 3) // 3 single-file appends: k in 1xx / 2xx / 3xx
      val t0 = IcebergTable.load(spark, url)
      assert(t0.liveFiles().size == 3)
      // select the two lower-range files by bounds; the 3xx file survives
      val r = spark.sql(s"CALL $cat.system.compact(table => 'db.s', " +
        "`where` => 'k < 280')").collect().head
      assert(r.getAs[Int]("rewritten_files") == 2)
      assert(r.getAs[Int]("live_files") == 2,
        "two matched files fold to one; the unmatched file survives")
      val t1 = IcebergTable.load(spark, url)
      val untouched = t1.liveFiles().map(_.filePath).toSet
        .intersect(t0.liveFiles().map(_.filePath).toSet)
      assert(untouched.size == 1, "exactly the unmatched file is untouched")
      assert(spark.table(s"$cat.db.s").count() == 150, "rows preserved")

      // an orphan byte in data/: dry_run counts it, the file survives;
      // the real pass then deletes it
      val orphan = new java.io.File(s"$url/data/orphan.parquet")
      java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
      orphan.setLastModified(System.currentTimeMillis() - 10L * 24 * 3600 * 1000)
      val dry = spark.sql(s"CALL $cat.system.remove_orphan_files(" +
        "table => 'db.s', older_than_ms => 1000L, dry_run => true)")
        .head().getAs[Int]("deleted_files")
      assert(dry >= 1 && orphan.isFile, "dry run must count but not delete")
      val real = spark.sql(s"CALL $cat.system.remove_orphan_files(" +
        "table => 'db.s', older_than_ms => 1000L)")
        .head().getAs[Int]("deleted_files")
      assert(real == dry && !orphan.isFile, "the real pass deletes the audit's count")
    }
  }

  test("CALL set_sort_order: future writes sort with disjoint bounds; " +
      "clearing unlocks zorder") {
    withCatalog { (cat, wh) =>
      val url = s"$wh/db/so"
      IcebergWriter.createTable(spark, url,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.LongType))))
      val r = spark.sql(s"CALL $cat.system.set_sort_order(" +
        "table => 'db.so', order => 'k asc')").collect().head
      assert(r.getAs[String]("sort_order") == "k asc")
      // sorted write: files carry DISJOINT k ranges (AQE coalescing off so
      // this tiny append still produces several range slices to compare)
      val rnd = new scala.util.Random(7)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      try IcebergWriter.append(spark, url,
        rnd.shuffle((1L to 400L).toList).map(i => (i, i * 2))
          .toDF("k", "v").repartition(4))
      finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
      val t = IcebergTable.load(spark, url)
      assert(t.liveFiles().size > 1)
      val ranges = t.liveFiles().map { f =>
        (graft.iceberg.IcebergTypes.decodeBound(f.lowerBounds(1), "long")
          .asInstanceOf[Long],
         graft.iceberg.IcebergTypes.decodeBound(f.upperBounds(1), "long")
          .asInstanceOf[Long])
      }.sortBy(_._1)
      assert(ranges.sliding(2).forall {
        case Seq((_, hi), (lo, _)) => hi < lo
        case _ => true
      }, s"sorted write must produce disjoint per-file k ranges: $ranges")
      // an identical re-set is a no-op (order id reused, no new version churn)
      spark.sql(s"CALL $cat.system.set_sort_order(table => 'db.so', " +
        "order => 'k')").collect()
      // clear: zorder refuses sorted tables, so the reset must unlock it
      val r2 = spark.sql(s"CALL $cat.system.set_sort_order(" +
        "table => 'db.so', order => 'none')").collect().head
      assert(r2.getAs[String]("sort_order") == "unsorted")
      spark.sql(s"CALL $cat.system.zorder(table => 'db.so', " +
        "columns => 'k, v')").collect()
      assert(spark.table(s"$cat.db.so").count() == 400)
    }
  }

  test("set_sort_order then compact = sort-rewrite: pre-existing unsorted " +
      "files come out range-sliced on the new order") {
    withCatalog { (cat, wh) =>
      val url = s"$wh/db/sr"
      IcebergWriter.createTable(spark, url,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType))))
      val rnd = new scala.util.Random(11)
      // two unsorted files, each spanning the WHOLE key domain
      for (_ <- 1 to 2) IcebergWriter.append(spark, url,
        rnd.shuffle((1L to 300L).toList).map(Tuple1(_)).toDF("k").coalesce(1))
      spark.sql(s"CALL $cat.system.set_sort_order(table => 'db.sr', " +
        "order => 'k')").collect()
      spark.sql(s"CALL $cat.system.compact(table => 'db.sr', " +
        "target_files => 3)").collect()
      val t = IcebergTable.load(spark, url)
      assert(t.liveFiles().size == 3, "compact honors target on sorted tables")
      val ranges = t.liveFiles().map { f =>
        (graft.iceberg.IcebergTypes.decodeBound(f.lowerBounds(1), "long")
          .asInstanceOf[Long],
         graft.iceberg.IcebergTypes.decodeBound(f.upperBounds(1), "long")
          .asInstanceOf[Long])
      }.sortBy(_._1)
      assert(ranges.sliding(2).forall {
        case Seq((_, hi), (lo, _)) => hi < lo
        case _ => true
      }, s"sort-rewrite must produce disjoint ranges: $ranges")
      assert(spark.table(s"$cat.db.sr").count() == 600)
    }
  }

  test("CALL add_files imports foreign ORC metadata-only; the rows read " +
      "back and count answers from harvested stats") {
    withCatalog { (cat, wh) =>
      val url = s"$wh/db/i"
      IcebergWriter.createTable(spark, url,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cat",
            org.apache.spark.sql.types.StringType))))
      val ext = s"$wh/ext_orc"
      (1L to 120L).map(i => (i, s"c${i % 4}")).toDF("k", "cat")
        .repartition(2).write.orc(ext)
      val r = spark.sql(s"CALL $cat.system.add_files(table => 'db.i', " +
        s"source_dir => '$ext', format => 'orc')").collect().head
      assert(r.getAs[Int]("added_files_count") == 2)
      assert(r.getAs[Long]("total_records") == 120L)
      assert(spark.table(s"$cat.db.i").count() == 120)
      // empty import refuses loudly
      val e = intercept[Exception] {
        spark.sql(s"CALL $cat.system.add_files(table => 'db.i', " +
          s"source_dir => '$wh/nowhere')").collect()
      }
      assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" ")
        .contains("nothing to import"))
    }
  }

  test("subset-layout bind fills a string default as a JVM String " +
      "(add_files with format omitted)") {
    withCatalog { (cat, wh) =>
      val url = s"$wh/db/af"
      IcebergWriter.createTable(spark, url,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType))))
      val ext = java.nio.file.Files.createTempDirectory("graft_af").toString
      (1L to 30L).map(Tuple1(_)).toDF("k").coalesce(1)
        .write.mode("overwrite").parquet(ext)
      // drive the by-name subset-layout fallback DIRECTLY: bind only
      // (table, source_dir) — format must come from its declared
      // 'parquet' default, converted to a JVM String exactly as read()
      // converts row values (a leaked UTF8String CCEs in the handler)
      val d = GraftProcedures.all.find(_.name == "add_files").get
      val proc = new GraftUnboundProcedure(d, GraftProcedures.ProcContext(
        (n: String) => IcebergTable.load(spark, s"$wh/${n.replace('.', '/')}")))
      val bound = proc.bind(new org.apache.spark.sql.types.StructType()
        .add("table", org.apache.spark.sql.types.StringType)
        .add("source_dir", org.apache.spark.sql.types.StringType))
      import org.apache.spark.unsafe.types.UTF8String
      bound.call(org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString("db.af"), UTF8String.fromString(ext)))
      assert(spark.table(s"$cat.db.af").count() == 30)
      // and through SQL with reversed named-argument order
      val ext2 = java.nio.file.Files.createTempDirectory("graft_af2").toString
      (31L to 40L).map(Tuple1(_)).toDF("k").coalesce(1)
        .write.mode("overwrite").parquet(ext2)
      spark.sql(s"CALL $cat.system.add_files(source_dir => '$ext2', " +
        s"table => 'db.af')").collect()
      assert(spark.table(s"$cat.db.af").count() == 40)
    }
  }

  test("rollback_to_timestamp ignores staged non-ancestor snapshots") {
    withCatalog { (cat, wh) =>
      val url = s"$wh/db/wt"
      IcebergWriter.createTable(spark, url,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType))))
      IcebergWriter.append(spark, url, (1L to 10L).map(Tuple1(_)).toDF("k"))
      Thread.sleep(5)
      IcebergWriter.append(spark, url, (11L to 20L).map(Tuple1(_)).toDF("k"))
      val mainB = IcebergTable.load(spark, url).currentSnapshot.snapshotId
      Thread.sleep(5)
      // staged branch snapshot: NEWER than B, but not a main ancestor —
      // the wall-clock resolver must skip it, not refuse on it
      IcebergWriter.appendToBranch(spark, url,
        (100L to 110L).map(Tuple1(_)).toDF("k"), "audit")
      val staged = IcebergTable.load(spark, url).metadata.snapshots
        .maxBy(_.timestampMs)
      Thread.sleep(5)
      IcebergWriter.append(spark, url, (21L to 30L).map(Tuple1(_)).toDF("k"))
      val r = spark.sql(s"CALL $cat.system.rollback_to_timestamp(" +
        s"table => 'db.wt', timestamp_ms => ${staged.timestampMs}L)")
        .collect().head
      assert(r.getAs[Long]("current_snapshot_id") == mainB)
      assert(spark.table(s"$cat.db.wt").count() == 20)
    }
  }

  test("CALL compact on an already-compact table reports 0 rewritten files") {
    withCatalog { (cat, wh) =>
      val url = s"$wh/db/one"
      build(url, files = 1)
      val before = IcebergTable.load(spark, url).currentSnapshot.snapshotId
      val row = spark.sql(
        s"CALL $cat.system.compact(table => 'db.one')").collect().head
      assert(row.getAs[Int]("rewritten_files") == 0)
      // no-op: no snapshot burned either
      assert(row.getAs[Long]("current_snapshot_id") == before)
    }
  }

  test("where-predicate literals containing ' and ' parse (quote-aware split)") {
    import graft.iceberg.Pruning._
    assert(GraftProcedures.parseWhere("cat = 'rock and roll'") ==
      Eq("cat", "rock and roll"))
    assert(GraftProcedures.parseWhere("cat = 'a and b' AND k >= 5") ==
      And(Eq("cat", "a and b"), GtEq("k", 5L)))
    assert(GraftProcedures.parseWhere("k > 1 and cat != 'x AND y'") ==
      And(Gt("k", 1L), NotEq("cat", "x AND y")))
  }

  test("where predicates support OR, parentheses, IN, IS NULL, and " +
      "flipped literal-first comparisons") {
    import graft.iceberg.Pruning._
    assert(GraftProcedures.parseWhere("k = 1 OR k = 2") ==
      Or(Eq("k", 1L), Eq("k", 2L)))
    assert(GraftProcedures.parseWhere("(k < 10 OR k > 20) AND cat = 'x'") ==
      And(Or(Lt("k", 10L), Gt("k", 20L)), Eq("cat", "x")))
    assert(GraftProcedures.parseWhere("k IN (1, 2, 3)") ==
      In("k", Seq(1L, 2L, 3L)))
    assert(GraftProcedures.parseWhere("cat IS NULL OR cat IS NOT NULL") ==
      Or(IsNull("cat"), NotNull("cat")))
    // literal-first comparisons flip to the column-first ADT shape
    assert(GraftProcedures.parseWhere("10 < k") == Gt("k", 10L))
    assert(GraftProcedures.parseWhere("5 >= k") == LtEq("k", 5L))
    // numeric widening: ints → Long, decimals → Double
    assert(GraftProcedures.parseWhere("r <= 1.5") == LtEq("r", 1.5))
    // SQL '' escaping inside strings
    assert(GraftProcedures.parseWhere("cat = 'it''s'") == Eq("cat", "it's"))
    // general NOT pushes through the ADT (De Morgan; NOT IN → AND of !=)
    assert(GraftProcedures.parseWhere("NOT (k < 10 OR cat = 'x')") ==
      And(GtEq("k", 10L), NotEq("cat", "x")))
    assert(GraftProcedures.parseWhere("k NOT IN (1, 2)") ==
      And(NotEq("k", 1L), NotEq("k", 2L)))
    assert(GraftProcedures.parseWhere("cat IS NOT NULL") == NotNull("cat"))
  }

  test("malformed or out-of-grammar where predicates refuse loudly") {
    def refuses(s: String): String =
      intercept[IllegalArgumentException] {
        GraftProcedures.parseWhere(s)
      }.getMessage
    assert(refuses("AND k = 1").contains("cannot parse"))
    assert(refuses("k = 1 AND AND j = 2").contains("cannot parse"))
    assert(refuses("").contains("empty"))
    // parseable SQL but outside the file-selector grammar: loud, never
    // a silent mis-selection of files
    assert(refuses("k + 1 = 2").contains("cannot translate"))
    assert(refuses("k = j").contains("cannot translate"))
    assert(refuses("upper(cat) = 'X'").contains("cannot translate"))
    assert(refuses("k = NULL").contains("IS NULL"))
  }

  test("scoped compaction with an OR predicate rewrites both disjunct " +
      "ranges and leaves the middle file untouched") {
    withCatalog { (cat, wh) =>
      val url = s"$wh/db/orc2"
      build(url, files = 3) // k ranges: 101-150 / 201-250 / 301-350
      val r = spark.sql(s"CALL $cat.system.compact(table => 'db.orc2', " +
        "`where` => 'k < 180 OR k > 280')").collect().head
      assert(r.getAs[Int]("rewritten_files") == 2)
      assert(r.getAs[Int]("live_files") == 2,
        "the two matched files fold to one; the 2xx file survives")
      assert(spark.table(s"$cat.db.orc2").count() == 150, "rows preserved")
    }
  }

  test("CALL compact with explicit target_files SPLITS a single file; " +
      "target_files=1 stays a no-op") {
    withCatalog { (cat, wh) =>
      val url = s"$wh/db/split"
      build(url, files = 1)
      val before = IcebergTable.load(spark, url)
      assert(before.liveFiles().size == 1)
      // explicit 1 → still already-compact: no snapshot burned
      val noop = spark.sql(s"CALL $cat.system.compact(table => 'db.split', " +
        "target_files => 1)").collect().head
      assert(noop.getAs[Int]("rewritten_files") == 0)
      assert(noop.getAs[Long]("current_snapshot_id") ==
        before.currentSnapshot.snapshotId)
      // explicit 4 → the oversized-file remedy: one file splits into 4
      // (at 100 TB a single 10 GB import must not stay one scan task)
      val split = spark.sql(s"CALL $cat.system.compact(table => 'db.split', " +
        "target_files => 4)").collect().head
      assert(split.getAs[Int]("rewritten_files") == 1)
      assert(split.getAs[Int]("live_files") == 4)
      assert(spark.table(s"$cat.db.split").count() == 50, "rows preserved")
    }
  }

  test("declared parameter defaults eval to the declared JVM type for " +
      "every procedure in the registry") {
    for (d <- GraftProcedures.all; p <- d.params; sql <- p.defaultSql
         if !sql.equalsIgnoreCase("NULL")) {
      val v = GraftProcedures.evalDefault(d.name, p)
      val ok = p.dt match {
        case org.apache.spark.sql.types.StringType => v.isInstanceOf[String]
        case org.apache.spark.sql.types.LongType => v.isInstanceOf[java.lang.Long]
        case org.apache.spark.sql.types.IntegerType => v.isInstanceOf[java.lang.Integer]
        case org.apache.spark.sql.types.BooleanType => v.isInstanceOf[java.lang.Boolean]
        case other => fail(s"${d.name}.${p.name}: unexpected default type $other")
      }
      assert(ok, s"${d.name}.${p.name}: default '$sql' evaluated to " +
        s"${v.getClass} but the declared type is ${p.dt} — a handler's " +
        "asInstanceOf would throw when the by-name layout fills this default")
    }
    // the concrete regression: older_than_ms is an int-shaped literal on a
    // LongType param — it must come back Long, not Integer
    val orphans = GraftProcedures.all.find(_.name == "remove_orphan_files").get
    val cutoff = GraftProcedures.evalDefault("remove_orphan_files",
      orphans.params.find(_.name == "older_than_ms").get)
    assert(cutoff == java.lang.Long.valueOf(3L * 24 * 3600 * 1000))
  }

  test("CALL snapshot / migrate / register_table: the migration family — " +
      "in-place snapshot, self-contained migrate, metadata-only adoption") {
    withCatalog { (cat, wh) =>
      // a raw parquet layout (3 files) no Iceberg table knows about
      val src = s"$wh/_src_pq"
      (1 to 3).foreach(i =>
        (i * 100L to i * 100L + 49).map(k => (k, s"v$k")).toDF("k", "v")
          .coalesce(1).write.mode("append").parquet(src))

      // SNAPSHOT: metadata-only — the live files stay INSIDE the source dir
      val snap = spark.sql(s"CALL $cat.system.snapshot(table => 'db.snap', " +
        s"source_dir => '$src')").collect().head
      assert(snap.getAs[Int]("imported_files") == 3)
      assert(snap.getAs[Long]("total_records") == 150L)
      val st = IcebergTable.load(spark, s"$wh/db/snap")
      assert(st.liveFiles().forall(f =>
        st.resolvePath(f.filePath).contains("_src_pq")),
        "snapshot must reference the source files in place")
      assert(spark.table(s"$cat.db.snap").count() == 150)
      intercept[Exception] { // occupied target refuses
        spark.sql(s"CALL $cat.system.snapshot(table => 'db.snap', " +
          s"source_dir => '$src')").collect()
      }

      // SNAPSHOT of an ORC layout: format parameter routes the inference
      val orcSrc = s"$wh/_src_orc"
      (1L to 30L).map(k => (k, k * 2.0)).toDF("a", "b")
        .coalesce(1).write.orc(orcSrc)
      val orcSnap = spark.sql(s"CALL $cat.system.snapshot(" +
        s"table => 'db.osnap', source_dir => '$orcSrc', format => 'orc')")
        .collect().head
      assert(orcSnap.getAs[Long]("total_records") == 30L)
      assert(spark.table(s"$cat.db.osnap").count() == 30)

      // SNAPSHOT of an AVRO layout: schema inferred from the embedded
      // writer schema (avro is self-describing — no connector); stats stay
      // absent (avro carries none) but rows serve through the avro scan
      val avroSrc = s"$wh/_src_avro"
      new java.io.File(avroSrc).mkdirs()
      val avroSchema = new org.apache.avro.Schema.Parser().parse(
        """{"type":"record","name":"r","fields":[
          |{"name":"k","type":"long"},
          |{"name":"v","type":["null","string"],"default":null}]}""".stripMargin)
      def writeAvro(file: String, sch: org.apache.avro.Schema,
          rows: Seq[org.apache.avro.generic.GenericRecord]): Unit = {
        val w = new org.apache.avro.file.DataFileWriter[
          org.apache.avro.generic.GenericRecord](
          new org.apache.avro.generic.GenericDatumWriter[
            org.apache.avro.generic.GenericRecord](sch))
        w.create(sch, new java.io.File(file))
        rows.foreach(w.append); w.close()
      }
      writeAvro(s"$avroSrc/p0.avro", avroSchema, (1L to 20L).map { k =>
        val r = new org.apache.avro.generic.GenericData.Record(avroSchema)
        r.put("k", k); r.put("v", s"a$k"); r
      })
      val avroSnap = spark.sql(s"CALL $cat.system.snapshot(" +
        s"table => 'db.asnap', source_dir => '$avroSrc', format => 'avro')")
        .collect().head
      assert(avroSnap.getAs[Int]("imported_files") == 1)
      assert(spark.table(s"$cat.db.asnap").count() == 20)
      assert(spark.sql(s"SELECT v FROM $cat.db.asnap WHERE k = 7")
        .head.getString(0) == "a7")
      // MIGRATE an avro layout: the fold rewrites rows into table-owned
      // native parquet — full footer stats return after migration
      val avroMig = spark.sql(s"CALL $cat.system.migrate(" +
        s"table => 'db.amig', source_dir => '$avroSrc', format => 'avro')")
        .collect().head
      assert(avroMig.getAs[Long]("total_records") == 20L)
      val amt = IcebergTable.load(spark, s"$wh/db/amig")
      assert(amt.liveFiles().forall(f =>
        amt.resolvePath(f.filePath).contains("/data/")),
        "avro migrate must leave a self-contained native table")
      // DIVERGENT writer schemas under one dir refuse loudly
      val mixed = s"$wh/_src_avro_mixed"
      new java.io.File(mixed).mkdirs()
      writeAvro(s"$mixed/p0.avro", avroSchema, Nil)
      val other = new org.apache.avro.Schema.Parser().parse(
        """{"type":"record","name":"r","fields":[
          |{"name":"k","type":"long"},
          |{"name":"extra","type":"long"}]}""".stripMargin)
      writeAvro(s"$mixed/p1.avro", other, Nil)
      val eMixed = intercept[Exception] {
        spark.sql(s"CALL $cat.system.snapshot(table => 'db.amix', " +
          s"source_dir => '$mixed', format => 'avro')").collect()
      }
      assert(eMixed.getMessage.contains("distinct") ||
        Option(eMixed.getCause).exists(_.getMessage.contains("distinct")),
        s"mixed avro schemas must refuse: ${eMixed.getMessage}")

      // MIGRATE: import + fold — the table owns native files under data/
      val mig = spark.sql(s"CALL $cat.system.migrate(table => 'db.mig', " +
        s"source_dir => '$src')").collect().head
      assert(mig.getAs[Int]("migrated_files") == 3)
      assert(mig.getAs[Long]("total_records") == 150L)
      val mt = IcebergTable.load(spark, s"$wh/db/mig")
      assert(mt.liveFiles().forall(f =>
        mt.resolvePath(f.filePath).contains("/data/")),
        "migrate must leave a self-contained table")
      assert(spark.table(s"$cat.db.mig").count() == 150)
      // self-contained ⇒ rename-safe immediately (id-carrying files)
      IcebergWriter.renameColumn(spark, s"$wh/db/mig", "v", "txt")
      assert(spark.table(s"$cat.db.mig")
        .where("txt IS NOT NULL").count() == 150)

      // REGISTER_TABLE: adopt db.mig's current metadata under a new name —
      // nothing copied but one metadata.json; rows identical; the data
      // files still live under the ORIGINAL root
      val mt2 = IcebergTable.load(spark, s"$wh/db/mig")
      val metaFile = s"$wh/db/mig/metadata/v${mt2.version}.metadata.json"
      val reg = spark.sql(s"CALL $cat.system.register_table(" +
        s"table => 'db.reg', metadata_file => '$metaFile')").collect().head
      assert(reg.getAs[Long]("total_records") == 150L)
      assert(spark.table(s"$cat.db.reg").count() == 150)
      val rt = IcebergTable.load(spark, s"$wh/db/reg")
      assert(rt.liveFiles().forall(f =>
        rt.resolvePath(f.filePath).contains("db/mig")),
        "register_table must not move data files")
      // future commits land under the NEW root; adopted files stay live
      spark.sql(s"INSERT INTO $cat.db.reg VALUES (9999, 'new')")
      assert(spark.table(s"$cat.db.reg").count() == 151)
      val rt2 = IcebergTable.load(spark, s"$wh/db/reg")
      assert(rt2.liveFiles().exists(f =>
        rt2.resolvePath(f.filePath).contains("db/reg")),
        "the new commit's file must live under the registered root")
    }
  }

  test("SHOW PROCEDURES lists the registry; unknown procedure refuses") {
    withCatalog { (cat, _) =>
      val listed = spark.sql(s"SHOW PROCEDURES IN $cat.system")
        .collect().map(_.getAs[String]("procedure_name")).toSet
      assert(listed.contains("compact") && listed.contains("expire_snapshots") &&
        listed.contains("compute_table_stats"), s"listed: $listed")
      val e = intercept[Exception] {
        spark.sql(s"CALL $cat.system.no_such_proc('db.t')").collect()
      }
      assert(e.getMessage.contains("no_such_proc") ||
        e.getMessage.toLowerCase.contains("procedure"))
    }
  }
}
