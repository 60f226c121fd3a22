package graft.iceberg

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** `rewrite_table_path` (DR / table copy): the staged metadata + copy plan
  * must reconstruct a COMPLETE, independently loadable table at the target
  * prefix — rows, history, row-level deletes — while the source table stays
  * untouched. */
class RewriteTablePathSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** Execute the emitted copy plan (the shared dev-scale executor). */
  private def runCopyPlan(fileList: String): Int =
    RewriteTablePath.executeCopyPlan(fileList,
      spark.sessionState.newHadoopConf())

  test("copy plan relocates a multi-commit table with position deletes; " +
      "target loads independently, source untouched") {
    val root = java.nio.file.Files.createTempDirectory("graft_rtp").toString
    val src = s"$root/site_a/db/t"
    IcebergWriter.createTable(spark, src, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    IcebergWriter.append(spark, src,
      (1L to 50L).map(i => (i, s"a$i")).toDF("k", "v").coalesce(1))
    IcebergWriter.append(spark, src,
      (51L to 100L).map(i => (i, s"b$i")).toDF("k", "v").coalesce(1))
    // row-level delete → a delete manifest + parquet carrier in the plan
    IcebergWriter.deleteRows(spark, src, Pruning.LtEq("k", 10L))
    val before = IcebergTable.load(spark, src)
    val beforeRows = before.read().as[(Long, String)].collect().sortBy(_._1)
    assert(beforeRows.length == 90)

    val r = RewriteTablePath.rewrite(spark, src,
      sourcePrefix = s"$root/site_a", targetPrefix = s"$root/site_b")
    assert(r.manifestLists == 3 && r.manifests >= 3 && r.dataFiles >= 3)
    runCopyPlan(r.fileListPath)

    // the target is a complete table: rows, MOR deletes, time travel
    val dst = s"$root/site_b/db/t"
    val t2 = IcebergTable.load(spark, dst)
    assert(t2.read().as[(Long, String)].collect().sortBy(_._1)
      .toSeq == beforeRows.toSeq)
    assert(t2.metadata.snapshots.size == 3, "full history travels")
    val firstSnap = t2.metadata.snapshots.head.snapshotId
    assert(t2.atSnapshot(firstSnap).read().count() == 50)
    // every resolved live path points INSIDE the target prefix
    assert(t2.liveFiles().forall(f =>
      t2.resolvePath(f.filePath).contains("site_b")),
      "rewritten manifests must reference target-prefix paths")
    // the SOURCE is untouched and still serves the same rows
    val again = IcebergTable.load(spark, src)
    assert(again.read().count() == 90)
    assert(again.liveFiles().forall(f =>
      again.resolvePath(f.filePath).contains("site_a")))

    // the target accepts new commits independently of the source
    IcebergWriter.append(spark, dst,
      Seq((999L, "z")).toDF("k", "v").coalesce(1))
    assert(IcebergTable.load(spark, dst).read().count() == 91)
    assert(IcebergTable.load(spark, src).read().count() == 90)

    // CARRIER CONTENT: the copied position-delete parquet's file_path
    // COLUMN must hold target paths — full-path-matching readers (and
    // foreign-file tables, whose MOR key is the full path) depend on it
    val delPaths = t2.positionDeleteFiles
      .map(f => t2.resolvePath(f.filePath)).distinct
    assert(delPaths.nonEmpty)
    val innerPaths = spark.read.parquet(delPaths: _*)
      .select("file_path").as[String].collect()
    assert(innerPaths.nonEmpty && innerPaths.forall(_.contains("site_b")),
      s"delete carrier still references the source: ${innerPaths.take(3).toSeq}")
    // the rewritten carrier carries the spec's reserved field ids, so
    // id-resolving readers (iceberg-java) keep finding its columns
    delPaths.foreach { dp =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(dp),
          spark.sessionState.newHadoopConf()))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        def idOf(col: String): Int = {
          val t = schema.getFields.asScala.find(_.getName == col)
            .getOrElse(fail(s"no $col column in carrier $dp"))
          assert(t.getId != null, s"rewritten carrier lost $col's field id: $dp")
          t.getId.intValue
        }
        assert(idOf("file_path") == Manifests.PosDeletePathFieldId)
        assert(idOf("pos") == Manifests.PosDeletePosFieldId)
      } finally reader.close()
    }
    // the entry's recorded size matches the rewritten carrier's bytes
    t2.positionDeleteFiles.foreach { f =>
      val real = new java.io.File(
        t2.resolvePath(f.filePath).stripPrefix("file:")).length
      assert(f.fileSizeInBytes == real,
        s"stale file_size_in_bytes for ${f.filePath}: " +
          s"manifest says ${f.fileSizeInBytes}, file is $real")
    }
    // the referenced-path BOUNDS (field 2147483546) relocated with it
    t2.positionDeleteFiles.foreach { f =>
      f.lowerBounds.get(Manifests.PosDeletePathFieldId).foreach { b =>
        val s2 = new String(b, java.nio.charset.StandardCharsets.UTF_8)
        assert(s2.contains("site_b"), s"stale path bound: $s2")
      }
    }
    // METADATA LOG: every logged previous metadata version exists at the
    // target (re-prefixed), so rollback/debug tooling can follow the log
    val logged = t2.metadata.metadataLog.map(_._2)
    assert(logged.nonEmpty, "multi-commit table must carry a metadata-log")
    logged.foreach { mf =>
      assert(mf.contains("site_b"), s"metadata-log entry not re-prefixed: $mf")
      assert(new java.io.File(mf.stripPrefix("file:")).exists,
        s"metadata-log names a missing file at the target: $mf")
    }
    // MANIFEST LENGTH: the copied manifest lists record the REWRITTEN
    // manifests' true sizes (prefix length changed, so sizes changed)
    val conf2 = spark.sessionState.newHadoopConf()
    t2.metadata.snapshots.foreach { snap =>
      Manifests.readManifestList(
        s"$dst/metadata/${snap.manifestList.split('/').last}", conf2)
        .foreach { mf =>
          val real = new java.io.File(
            t2.resolvePath(mf.path).stripPrefix("file:")).length
          assert(mf.length == real,
            s"stale manifest_length for ${mf.path}: ${mf.length} vs $real")
        }
    }
  }

  test("foreign-file table: a SPLITTING row-level delete refuses loudly " +
      "(the position scan would crash on id-less footers); whole-file " +
      "drops and post-compaction deletes relocate fine") {
    val root = java.nio.file.Files.createTempDirectory("graft_rtpf").toString
    val ext = s"$root/site_a/external"
    (1L to 30L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1)
      .write.parquet(ext)
    val src = s"$root/site_a/db/f"
    IcebergWriter.createTable(spark, src, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    val parts = new java.io.File(ext).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    IcebergWriter.addFiles(spark, src, parts.toSeq)
    // splitting the imported file needs a position scan over an id-less
    // footer — refused BEFORE any commit, with the compact remediation
    val e = intercept[UnsupportedOperationException] {
      IcebergWriter.deleteRows(spark, src, Pruning.LtEq("k", 10L))
    }
    assert(e.getMessage.contains("compact"))
    assert(IcebergTable.load(spark, src).read().count() == 30,
      "the refused delete must not have committed anything")

    // remediation: compact folds the import into native files; the delete
    // then works, and the relocated copy keeps applying it
    Maintenance.compact(spark, src)
    IcebergWriter.deleteRows(spark, src, Pruning.LtEq("k", 10L))
    assert(IcebergTable.load(spark, src).read().count() == 20)
    val r = RewriteTablePath.rewrite(spark, src,
      sourcePrefix = s"$root/site_a", targetPrefix = s"$root/site_b")
    runCopyPlan(r.fileListPath)
    val t2 = IcebergTable.load(spark, s"$root/site_b/db/f")
    assert(t2.read().count() == 20,
      "deletes must keep applying at the relocated target")
    assert(t2.read().as[(Long, String)].collect().map(_._1).min == 11L)
  }

  test("v3 deletion vectors: referenced_data_file rewrites, DV blobs copy, " +
      "MOR reads work at the target") {
    val root = java.nio.file.Files.createTempDirectory("graft_rtpdv").toString
    val src = s"$root/east/db/d"
    IcebergWriter.createTable(spark, src, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    IcebergWriter.append(spark, src,
      (1L to 40L).map(i => (i, s"x$i")).toDF("k", "v").coalesce(1))
    IcebergWriter.upgradeFormatVersion(spark, src, 3)
    IcebergWriter.deleteRows(spark, src, Pruning.Lt("k", 5L))
    val t0 = IcebergTable.load(spark, src)
    assert(t0.positionDeleteFiles.nonEmpty && t0.positionDeleteFiles.forall(_.isDv),
      "setup must leave DV carriers")

    val r = RewriteTablePath.rewrite(spark, src,
      sourcePrefix = s"$root/east", targetPrefix = s"$root/west")
    runCopyPlan(r.fileListPath)

    val t2 = IcebergTable.load(spark, s"$root/west/db/d")
    assert(t2.read().count() == 36, "DV deletes must apply at the target")
    assert(t2.positionDeleteFiles.forall(f =>
      f.referencedDataFile.exists(_.contains("west"))),
      "referenced_data_file must point at the target prefix")
    // the PUFFIN CONTENT relocated too: blob properties carry the target
    // paths, and the manifests' blob locations match the rewritten file
    val conf2 = spark.sessionState.newHadoopConf()
    val dvs = t2.positionDeleteFiles.filter(_.isDv)
    assert(dvs.nonEmpty)
    dvs.groupBy(f => t2.resolvePath(f.filePath)).foreach { case (pf, entries) =>
      val blobs = DeletionVectors.readPuffin(pf, conf2)
      assert(blobs.forall(_._1.referencedDataFile.contains("west")),
        s"puffin blob property still references the source in $pf")
      entries.foreach { e =>
        val b = blobs.map(_._1).find(b2 =>
          e.referencedDataFile.contains(b2.referencedDataFile))
          .getOrElse(fail(s"no blob for ${e.referencedDataFile} in $pf"))
        assert(e.contentOffset.contains(b.offset) &&
          e.contentSizeInBytes.contains(b.length),
          s"manifest blob location (${e.contentOffset}/${e.contentSizeInBytes}) " +
            s"does not match the rewritten puffin (${b.offset}/${b.length})")
      }
      val real = new java.io.File(pf.stripPrefix("file:")).length
      entries.foreach(e => assert(e.fileSizeInBytes == real,
        s"stale puffin file_size_in_bytes: ${e.fileSizeInBytes} vs $real"))
    }
    // per-blob LINEAGE survives the rewrite: every target blob keeps its
    // own snapshot-id (no head-blob stamping over a mixed puffin)
    val srcBlobIds = IcebergTable.load(spark, src).positionDeleteFiles
      .filter(_.isDv)
      .flatMap(f => DeletionVectors.readPuffin(
        IcebergTable.load(spark, src).resolvePath(f.filePath), conf2))
      .map(_._1.snapshotId).sorted
    val dstBlobIds = dvs
      .flatMap(f => DeletionVectors.readPuffin(t2.resolvePath(f.filePath), conf2))
      .map(_._1.snapshotId).sorted
    assert(srcBlobIds == dstBlobIds, "blob snapshot lineage must survive")
  }

  test("expired tombstone carriers do not crash the rewrite: after a " +
      "superseding delete + expire, the plan skips the collected puffin " +
      "and the target still loads") {
    val root = java.nio.file.Files.createTempDirectory("graft_rtpe").toString
    val src = s"$root/p1/db/e"
    IcebergWriter.createTable(spark, src, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    IcebergWriter.append(spark, src,
      (1L to 30L).map(i => (i, s"x$i")).toDF("k", "v").coalesce(1))
    IcebergWriter.upgradeFormatVersion(spark, src, 3)
    // two deletes on the same file: the second supersedes the first DV,
    // tombstoning it; expire then physically collects the superseded blob
    IcebergWriter.deleteRows(spark, src, Pruning.Lt("k", 3L))
    IcebergWriter.deleteRows(spark, src, Pruning.Lt("k", 6L))
    Maintenance.expireSnapshots(spark, src, keepLast = 1)
    val t0 = IcebergTable.load(spark, src)
    assert(t0.read().count() == 25)

    val r = RewriteTablePath.rewrite(spark, src,
      sourcePrefix = s"$root/p1", targetPrefix = s"$root/p2")
    runCopyPlan(r.fileListPath)
    val t2 = IcebergTable.load(spark, s"$root/p2/db/e")
    assert(t2.read().count() == 25,
      "the live DV must keep applying at the target")
  }

  test("a gzip-named metadata-log version re-compresses at the target " +
      "(name-resolved codecs must match the bytes)") {
    val root = java.nio.file.Files.createTempDirectory("graft_rtpz").toString
    val src = s"$root/g1/db/z"
    IcebergWriter.createTable(spark, src, StructType(Seq(
      StructField("k", LongType))))
    IcebergWriter.append(spark, src, Seq(1L, 2L).map(Tuple1(_)).toDF("k"))
    IcebergWriter.append(spark, src, Seq(3L).map(Tuple1(_)).toDF("k"))
    // simulate a foreign gzip-compressing writer for the logged v2 version:
    // compress the file under the .gzip name and point the log at it
    val meta = new java.io.File(s"$src/metadata")
    val v2 = new java.io.File(meta, "v2.metadata.json")
    val v2gz = new java.io.File(meta, "v2.gzip.metadata.json")
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(v2gz))
    try gz.write(java.nio.file.Files.readAllBytes(v2.toPath)) finally gz.close()
    assert(v2.delete())
    val v3 = new java.io.File(meta, "v3.metadata.json")
    java.nio.file.Files.writeString(v3.toPath,
      java.nio.file.Files.readString(v3.toPath)
        .replace("v2.metadata.json", "v2.gzip.metadata.json"))
    // the hand edits bypass Hadoop's local-FS checksums — drop the stale
    // .crc sidecars or every subsequent read fails ChecksumException
    meta.listFiles().filter(_.getName.endsWith(".crc")).foreach(_.delete())

    val r = RewriteTablePath.rewrite(spark, src,
      sourcePrefix = s"$root/g1", targetPrefix = s"$root/g2")
    runCopyPlan(r.fileListPath)
    val dstGz = new java.io.File(s"$root/g2/db/z/metadata/v2.gzip.metadata.json")
    assert(dstGz.exists, "the logged gzip version must relocate")
    val head = java.nio.file.Files.readAllBytes(dstGz.toPath).take(2)
    assert(head(0) == 0x1f.toByte && head(1) == 0x8b.toByte,
      "a .gzip name must hold gzip bytes (iceberg-java resolves the codec " +
        "from the NAME)")
    // and the re-compressed content is the REWRITTEN metadata
    val inflated = new String(
      new java.util.zip.GZIPInputStream(
        new java.io.FileInputStream(dstGz)).readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(inflated.contains("g2") && !inflated.contains("/g1/"),
      "the relocated log version must carry target-prefixed paths")
    // the target still loads and serves all rows
    assert(IcebergTable.load(spark, s"$root/g2/db/z").read().count() == 3)
  }

  test("paths OUTSIDE source_prefix are shared in place: never planned as " +
      "self-copies (which would truncate them), target reads them where " +
      "they are") {
    val root = java.nio.file.Files.createTempDirectory("graft_rtps").toString
    // external data at a site the prefix does NOT cover
    val ext = s"$root/shared/external"
    (1L to 30L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1)
      .write.parquet(ext)
    val extPart = new java.io.File(ext).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val extLen = extPart.length
    val src = s"$root/site_a/db/s"
    IcebergWriter.createTable(spark, src, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    IcebergWriter.addFiles(spark, src, Seq(extPart.getAbsolutePath))
    IcebergWriter.append(spark, src,
      (31L to 40L).map(i => (i, s"n$i")).toDF("k", "v").coalesce(1))

    val r = RewriteTablePath.rewrite(spark, src,
      sourcePrefix = s"$root/site_a", targetPrefix = s"$root/site_b")
    // the plan NEVER maps a file onto itself
    val lines = scala.io.Source.fromFile(
      r.fileListPath.stripPrefix("file:")).getLines().toSeq
    lines.foreach { l =>
      val Array(s, d) = l.split('\t')
      assert(s != d, s"identity pair in the copy plan: $l")
    }
    assert(!lines.exists(_.contains("shared/external")),
      "uncovered external files must not enter the plan at all")
    runCopyPlan(r.fileListPath)
    // the external file is byte-identical (nothing truncated it)
    assert(extPart.length == extLen,
      "executing the plan must not touch files outside the prefix")
    // the target reads the shared file IN PLACE plus the relocated natives
    val t2 = IcebergTable.load(spark, s"$root/site_b/db/s")
    assert(t2.read().count() == 40)
    assert(t2.liveFiles().exists(f =>
      t2.resolvePath(f.filePath).contains("shared/external")),
      "the staged manifests must keep pointing at the shared site")
    // the SOURCE still reads too
    assert(IcebergTable.load(spark, src).read().count() == 40)
  }

  test("executeCopyPlan refuses a hand-built identity pair instead of " +
      "truncating the file") {
    val root = java.nio.file.Files.createTempDirectory("graft_rtpi").toString
    val victim = new java.io.File(s"$root/victim.bin")
    java.nio.file.Files.write(victim.toPath, Array.fill[Byte](64)(7))
    val plan = new java.io.File(s"$root/file-list.tsv")
    java.nio.file.Files.writeString(plan.toPath,
      s"${victim.getAbsolutePath}\t${victim.getAbsolutePath}\n")
    val e = intercept[IllegalArgumentException] {
      RewriteTablePath.executeCopyPlan(plan.getAbsolutePath,
        spark.sessionState.newHadoopConf())
    }
    assert(e.getMessage.toLowerCase.contains("truncate"))
    assert(victim.length == 64, "the refusal must come before any write")
  }

  test("a source_prefix that does not cover the table location refuses " +
      "up front (staging would otherwise target the live table's own paths)") {
    val root = java.nio.file.Files.createTempDirectory("graft_rtpn").toString
    val src = s"$root/a/db/n"
    IcebergWriter.createTable(spark, src, StructType(Seq(
      StructField("k", LongType))))
    IcebergWriter.append(spark, src, Seq(1L, 2L).map(Tuple1(_)).toDF("k"))
    val e = intercept[IllegalArgumentException] {
      RewriteTablePath.rewrite(spark, src, s"$root/not_the_site", s"$root/b")
    }
    assert(e.getMessage.contains("does not cover"))
  }

  test("a physically MOVED table (original_url ≠ url): plan sources are " +
      "the resolved current paths, staged content matches the plan, the " +
      "target loads") {
    val root = java.nio.file.Files.createTempDirectory("graft_rtpm").toString
    val old = s"$root/old/db/m"
    IcebergWriter.createTable(spark, old, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    IcebergWriter.append(spark, old,
      (1L to 40L).map(i => (i, s"x$i")).toDF("k", "v").coalesce(1))
    // a row-level delete leaves a parquet carrier whose CONTENT records
    // old-site paths — the rewrite must resolve those too
    IcebergWriter.deleteRows(spark, old, Pruning.LtEq("k", 10L))
    // physically move the whole table directory: manifests still record
    // old-site absolute paths, md.location supplies original_url
    val moved = s"$root/moved/db/m"
    new java.io.File(s"$root/moved/db").mkdirs()
    java.nio.file.Files.move(java.nio.file.Paths.get(old),
      java.nio.file.Paths.get(moved))
    val t = IcebergTable.load(spark, moved)
    assert(t.read().count() == 30, "sanity: the moved table serves reads")

    val r = RewriteTablePath.rewriteTable(spark, t,
      sourcePrefix = s"$root/moved", targetPrefix = s"$root/target")
    // every planned source EXISTS (the old-site raw paths do not)
    scala.io.Source.fromFile(r.fileListPath.stripPrefix("file:"))
      .getLines().foreach { l =>
        val Array(s, d) = l.split('\t')
        assert(new java.io.File(s.stripPrefix("file:")).isFile,
          s"plan names a missing source: $s")
        assert(d.contains("/target/"), s"plan target off-prefix: $d")
      }
    runCopyPlan(r.fileListPath)
    val t2 = IcebergTable.load(spark, s"$root/target/db/m")
    assert(t2.read().count() == 30,
      "deletes must keep applying at the relocated target")
    assert(t2.liveFiles().forall(f =>
      t2.resolvePath(f.filePath).contains("/target/")),
      "staged manifests must record resolved-then-reprefixed paths")
    // the carrier CONTENT resolved old-site paths before re-prefixing
    val delPaths = t2.positionDeleteFiles
      .map(f => t2.resolvePath(f.filePath)).distinct
    assert(delPaths.nonEmpty)
    val inner = spark.read.parquet(delPaths: _*)
      .select("file_path").as[String].collect()
    assert(inner.forall(_.contains("/target/")),
      s"carrier still references a pre-move site: ${inner.take(3).toSeq}")
  }

  test("foreign-NAMED current metadata stages under a vN name the hint " +
      "can point at (a '1' hint against a uuid basename would dangle)") {
    val root = java.nio.file.Files.createTempDirectory("graft_rtpu").toString
    val src = s"$root/f1/db/u"
    IcebergWriter.createTable(spark, src, StructType(Seq(
      StructField("k", LongType))))
    IcebergWriter.append(spark, src, (1L to 12L).map(Tuple1(_)).toDF("k"))
    // simulate an iceberg-java-named current metadata file
    val meta = new java.io.File(s"$src/metadata")
    val cur = new java.io.File(meta, "v2.metadata.json")
    val foreign = new java.io.File(meta,
      "00002-deadbeef-cafe-4000-8000-000000000002.metadata.json")
    java.nio.file.Files.copy(cur.toPath, foreign.toPath)
    val t = IcebergTable.load(spark, foreign.getAbsolutePath)

    val r = RewriteTablePath.rewriteTable(spark, t,
      sourcePrefix = s"$root/f1", targetPrefix = s"$root/f2")
    runCopyPlan(r.fileListPath)
    val dstMeta = new java.io.File(s"$root/f2/db/u/metadata")
    val hint = java.nio.file.Files.readString(
      new java.io.File(dstMeta, "version-hint.text").toPath).trim
    assert(hint.forall(_.isDigit), s"hint must be a version number: $hint")
    assert(new java.io.File(dstMeta, s"v$hint.metadata.json").isFile,
      s"the hint points at v$hint.metadata.json, which must exist")
    // and the hinted load serves the CURRENT rows
    assert(IcebergTable.load(spark, s"$root/f2/db/u").read().count() == 12)
  }

  test("distributed manifest rewrite (threshold=0) stages artifacts " +
      "equivalent to the driver-serial path and the target loads") {
    val root = java.nio.file.Files.createTempDirectory("graft_rtpd").toString
    val src = s"$root/s1/db/d"
    IcebergWriter.createTable(spark, src, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    IcebergWriter.append(spark, src,
      (1L to 40L).map(i => (i, s"x$i")).toDF("k", "v").coalesce(1))
    IcebergWriter.append(spark, src,
      (41L to 60L).map(i => (i, s"y$i")).toDF("k", "v").coalesce(1))
    IcebergWriter.deleteRows(spark, src, Pruning.LtEq("k", 5L)) // carrier

    def planLines(fileList: String): Seq[(String, String)] =
      scala.io.Source.fromFile(fileList.stripPrefix("file:")).getLines()
        .map { l => val Array(a, b) = l.split('\t'); (a, b) }.toSeq

    // serial pass (threshold far above the manifest count); the two
    // target prefixes are SAME-LENGTH on purpose — staged manifests embed
    // target paths, so differing prefix lengths would shift every size
    val serial = RewriteTablePath.rewrite(spark, src,
      s"$root/s1", s"$root/t_aaa", Some(s"$root/stage_serial"))
    // distributed pass: threshold=0 forces the sharded path — the spec
    // PROVES it ran via the telemetry counter
    val before = RewriteTablePath.distributedRewriteJobs.get()
    spark.conf.set("spark.graft.iceberg.rewriteManifestThreshold", "0")
    val dist =
      try RewriteTablePath.rewrite(spark, src,
        s"$root/s1", s"$root/t_bbb", Some(s"$root/stage_dist"))
      finally spark.conf.unset("spark.graft.iceberg.rewriteManifestThreshold")
    assert(RewriteTablePath.distributedRewriteJobs.get() > before,
      "threshold=0 must route through the distributed rewrite")

    assert(dist.manifests == serial.manifests && dist.manifests >= 3)
    assert(dist.dataFiles == serial.dataFiles)
    // the staged manifests are the same set with the same byte LENGTHS
    // (full byte identity is impossible — Avro containers embed a random
    // sync marker — but identical records + schema yield identical sizes)
    def stagedManifests(stage: String): Map[String, Long] =
      new java.io.File(stage).listFiles()
        .filter(f => f.getName.endsWith(".avro") && !f.getName.startsWith("snap-"))
        .map(f => f.getName -> f.length).toMap
    val sm = stagedManifests(s"$root/stage_serial")
    val dm = stagedManifests(s"$root/stage_dist")
    assert(dm.keySet == sm.keySet, s"manifest sets diverge: $sm vs $dm")
    assert(dm == sm, "staged manifest lengths diverge between paths")
    // the copy PLANS are identical modulo the staging/target prefixes
    def canonical(r: RewriteTablePath.Result, stage: String, tgt: String) =
      planLines(r.fileListPath)
        .map { case (a, b) => (a.replace(stage, "<S>"), b.replace(tgt, "<T>")) }
        .sorted
    assert(canonical(dist, s"$root/stage_dist", s"$root/t_bbb") ==
      canonical(serial, s"$root/stage_serial", s"$root/t_aaa"))
    // and the distributed copy is a complete, correct table
    runCopyPlan(dist.fileListPath)
    val t2 = IcebergTable.load(spark, s"$root/t_bbb/db/d")
    assert(t2.read().count() == 55,
      "deletes must keep applying at the distributed-path target")
  }

  test("the DISTRIBUTED copy executor lands the same complete table as " +
      "the serial one and refuses identity pairs task-side") {
    val root = java.nio.file.Files.createTempDirectory("graft_rtpx").toString
    val src = s"$root/c1/db/x"
    IcebergWriter.createTable(spark, src, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    IcebergWriter.append(spark, src,
      (1L to 60L).map(i => (i, s"x$i")).toDF("k", "v").repartition(3))
    IcebergWriter.deleteRows(spark, src, Pruning.LtEq("k", 6L))
    val r = RewriteTablePath.rewrite(spark, src, s"$root/c1", s"$root/c2")
    val copied = RewriteTablePath.executeCopyPlanDistributed(
      spark, r.fileListPath, parallelism = 4)
    val planLines = scala.io.Source
      .fromFile(r.fileListPath.stripPrefix("file:")).getLines().count(_.nonEmpty)
    assert(copied == planLines, s"copied $copied of $planLines planned files")
    val t2 = IcebergTable.load(spark, s"$root/c2/db/x")
    assert(t2.read().count() == 54,
      "deletes must apply at the distributed-copy target")
    assert(t2.liveFiles().forall(f =>
      t2.resolvePath(f.filePath).contains("/c2/")))
    // identity pairs refuse INSIDE the task, before any byte moves
    val victim = new java.io.File(s"$root/victim.bin")
    java.nio.file.Files.write(victim.toPath, Array.fill[Byte](32)(3))
    val badPlan = new java.io.File(s"$root/bad.tsv")
    java.nio.file.Files.writeString(badPlan.toPath,
      s"${victim.getAbsolutePath}\t${victim.getAbsolutePath}\n")
    val e = intercept[Exception] {
      RewriteTablePath.executeCopyPlanDistributed(spark, badPlan.getAbsolutePath)
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("TRUNCATE")), chain(e).mkString(" | "))
    assert(victim.length == 32, "the refusal must come before any write")
  }

  test("guards: identical prefixes refuse; staging holds the plan and " +
      "rewritten metadata only") {
    val root = java.nio.file.Files.createTempDirectory("graft_rtpg").toString
    val src = s"$root/a/db/g"
    IcebergWriter.createTable(spark, src, StructType(Seq(
      StructField("k", LongType))))
    IcebergWriter.append(spark, src, Seq(1L, 2L).map(Tuple1(_)).toDF("k"))
    intercept[IllegalArgumentException] {
      RewriteTablePath.rewrite(spark, src, s"$root/a", s"$root/a")
    }
    val stage = s"$root/stage"
    val r = RewriteTablePath.rewrite(spark, src, s"$root/a", s"$root/b",
      stagingLocation = Some(stage))
    assert(r.stagingLocation == stage)
    val staged = new java.io.File(stage).listFiles().map(_.getName).toSet
    assert(staged.contains("file-list.tsv") &&
      staged.contains("version-hint.text") &&
      staged.exists(_.endsWith(".metadata.json")) &&
      staged.exists(_.endsWith(".avro")))
    // no data bytes in staging — metadata + the plan only
    assert(!staged.exists(_.endsWith(".parquet")))
  }
}
