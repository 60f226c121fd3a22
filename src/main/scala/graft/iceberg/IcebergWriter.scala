package graft.iceberg

import java.util.UUID

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Iceberg format-v1 WRITE path — table create + append snapshots.
  *
  * An extension beyond the reference (which is read-only, README.md:94):
  * data files are written by Spark's parquet writer, per-file record counts
  * and column lower/upper bounds are harvested from the parquet footers and
  * encoded as Iceberg single-value bytes, a new manifest (Avro, spec v1
  * layout) plus manifest list are written, and a new `vN.metadata.json` +
  * `version-hint.text` commit the snapshot. Tables written here are readable
  * by [[IcebergTable]] with working stats pruning, and the metadata layout
  * follows the public Iceberg v1 spec.
  *
  * Single-writer semantics (no optimistic-concurrency loop) — commit safety
  * at the catalog level is out of scope, matching the reference's scope.
  */
object IcebergWriter {

  private val mapper = new ObjectMapper()

  def sparkToIcebergType(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case IntegerType | ShortType | ByteType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case DateType => "date"
    case TimestampNTZType => "timestamp"
    case TimestampType => "timestamptz"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case BinaryType => "binary"
    case other => throw new IllegalArgumentException(s"unsupported write type: $other")
  }

  /** Create an empty table (no snapshot; current-snapshot-id = -1). */
  def createTable(spark: SparkSession, url: String, schema: StructType): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = mapper.createObjectNode()
    meta.put("format-version", 1)
    meta.put("table-uuid", UUID.randomUUID().toString)
    meta.put("location", url)
    meta.put("last-updated-ms", System.currentTimeMillis())
    meta.put("last-column-id", schema.fields.length)
    val schemaNode = schemaToNode(schema)
    meta.set[ObjectNode]("schema", schemaNode)
    meta.put("current-schema-id", 0)
    meta.set[ArrayNode]("schemas", mapper.createArrayNode().add(schemaNode))
    meta.set[ArrayNode]("partition-spec", mapper.createArrayNode())
    meta.put("default-spec-id", 0)
    val spec = mapper.createObjectNode()
    spec.put("spec-id", 0)
    spec.set[ArrayNode]("fields", mapper.createArrayNode())
    meta.set[ArrayNode]("partition-specs", mapper.createArrayNode().add(spec))
    meta.put("last-partition-id", 999)
    meta.put("default-sort-order-id", 0)
    val order = mapper.createObjectNode()
    order.put("order-id", 0)
    order.set[ArrayNode]("fields", mapper.createArrayNode())
    meta.set[ArrayNode]("sort-orders", mapper.createArrayNode().add(order))
    meta.set[ObjectNode]("properties", mapper.createObjectNode())
    meta.put("current-snapshot-id", -1L)
    meta.set[ArrayNode]("snapshots", mapper.createArrayNode())
    meta.set[ArrayNode]("snapshot-log", mapper.createArrayNode())
    writeString(s"$url/metadata/v1.metadata.json", meta.toPrettyString, conf)
    writeString(s"$url/metadata/version-hint.text", "1", conf)
  }

  private def schemaToNode(schema: StructType): ObjectNode = {
    val node = mapper.createObjectNode()
    node.put("type", "struct")
    node.put("schema-id", 0)
    val fields = mapper.createArrayNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val fn = mapper.createObjectNode()
      fn.put("id", i + 1)
      fn.put("name", f.name)
      fn.put("required", !f.nullable)
      fn.put("type", sparkToIcebergType(f.dataType))
      fields.add(fn)
    }
    node.set[ArrayNode]("fields", fields)
    node
  }

  /** Append `df` as a new snapshot. The table must exist (see createTable). */
  def append(spark: SparkSession, url: String, df: DataFrame): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val table = IcebergTable.load(spark, url)
    // current schema straight from metadata — an empty table has no snapshot
    // (IcebergTable.iceSchema raises there, reference parity)
    val schema = table.metadata.schemas
      .find(_.schemaId == table.metadata.currentSchemaId)
      .getOrElse(throw new IllegalStateException("no current schema"))
    val commitId = UUID.randomUUID().toString

    // 1. data files (one dir per commit so new files are identifiable)
    val dataDir = s"$url/data/$commitId"
    df.select(schema.fields.map(f => org.apache.spark.sql.functions.col(f.name)): _*)
      .write.parquet(dataDir)
    val fs = new Path(dataDir).getFileSystem(conf)
    val files = fs.listStatus(new Path(dataDir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))

    // 2. per-file stats from parquet footers
    val dataFiles = files.map { st =>
      val stats = footerStats(st.getPath, conf, schema)
      (st.getPath.toUri.getPath, st.getLen, stats)
    }

    // 3. new manifest
    val manifestPath = s"$url/metadata/$commitId-m0.avro"
    val snapshotId = math.abs(UUID.randomUUID().getMostSignificantBits)
    writeManifest(manifestPath, snapshotId, dataFiles, conf)

    // 4. manifest list = prior snapshot's manifests + the new one
    val priorManifests: Seq[Manifests.ManifestFile] =
      if (table.metadata.currentSnapshotId >= 0) table.manifestList else Nil
    val manifestListPath = s"$url/metadata/snap-$snapshotId-1-$commitId.avro"
    val addedRecords = dataFiles.map(_._3.recordCount).sum
    writeManifestList(manifestListPath, snapshotId, manifestPath,
      dataFiles.map(_._2).sum, dataFiles.size, addedRecords, priorManifests, conf)

    // 5. new metadata version
    val old = mapper.readTree(
      readString(s"$url/metadata/v${table.version}.metadata.json", conf))
      .asInstanceOf[ObjectNode]
    val now = System.currentTimeMillis()
    val snap = mapper.createObjectNode()
    snap.put("snapshot-id", snapshotId)
    if (table.metadata.currentSnapshotId >= 0)
      snap.put("parent-snapshot-id", table.metadata.currentSnapshotId)
    snap.put("timestamp-ms", now)
    val summary = mapper.createObjectNode()
    summary.put("operation", "append")
    summary.put("added-data-files", dataFiles.size.toString)
    summary.put("added-records", addedRecords.toString)
    val totalRecords = addedRecords + table.metadata.snapshots
      .find(_.snapshotId == table.metadata.currentSnapshotId)
      .flatMap(_.summary.get("total-records")).map(_.toLong).getOrElse(0L)
    summary.put("total-records", totalRecords.toString)
    summary.put("total-data-files",
      (dataFiles.size + priorManifests.map(m =>
        m.addedFilesCount.getOrElse(0) + m.existingFilesCount.getOrElse(0)).sum).toString)
    snap.set[ObjectNode]("summary", summary)
    snap.put("manifest-list", manifestListPath)
    snap.put("schema-id", schema.schemaId)
    old.withArray[ArrayNode]("snapshots").add(snap)
    old.put("current-snapshot-id", snapshotId)
    old.put("last-updated-ms", now)
    val log = if (old.has("snapshot-log")) old.withArray[ArrayNode]("snapshot-log")
      else { val a = mapper.createArrayNode(); old.set[ArrayNode]("snapshot-log", a); a }
    val logEntry = mapper.createObjectNode()
    logEntry.put("timestamp-ms", now)
    logEntry.put("snapshot-id", snapshotId)
    log.add(logEntry)
    val newVersion = table.version + 1
    writeString(s"$url/metadata/v$newVersion.metadata.json", old.toPrettyString, conf)
    writeString(s"$url/metadata/version-hint.text", newVersion.toString, conf)
  }

  // ------------------------------------------------------------- stats

  final case class FileStats(recordCount: Long,
      lowerBounds: Map[Int, Array[Byte]], upperBounds: Map[Int, Array[Byte]],
      valueCounts: Map[Int, Long], nullCounts: Map[Int, Long])

  /** Harvest record count + per-column min/max from the parquet footer and
    * encode as Iceberg bound bytes. */
  private def footerStats(path: Path, conf: Configuration, schema: IceSchema): FileStats = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      val recordCount = blocks.map(_.getRowCount).sum
      val byName = schema.fields.map(f => f.name -> f).toMap
      var lower = Map.empty[Int, Any]
      var upper = Map.empty[Int, Any]
      var valueCounts = Map.empty[Int, Long]
      var nullCounts = Map.empty[Int, Long]
      for (block <- blocks; col <- block.getColumns.asScala) {
        val name = col.getPath.toDotString
        byName.get(name).foreach { field =>
          val id = field.id
          valueCounts = valueCounts.updated(id, valueCounts.getOrElse(id, 0L) + col.getValueCount)
          val s = col.getStatistics
          if (s != null && !s.isEmpty) {
            nullCounts = nullCounts.updated(id, nullCounts.getOrElse(id, 0L) + s.getNumNulls)
            if (s.hasNonNullValue) {
              val (mn, mx) = normalizedMinMax(s, field.icebergTypeString)
              if (mn != null) {
                lower = lower.updatedWith(id) {
                  case Some(prev) => Some(if (IcebergTypes.compare(mn, prev).exists(_ < 0)) mn else prev)
                  case None => Some(mn)
                }
                upper = upper.updatedWith(id) {
                  case Some(prev) => Some(if (IcebergTypes.compare(mx, prev).exists(_ > 0)) mx else prev)
                  case None => Some(mx)
                }
              }
            }
          }
        }
      }
      FileStats(recordCount,
        lower.map { case (id, v) =>
          id -> IcebergTypes.encodeBound(v, byName.values.find(_.id == id).get.icebergTypeString) },
        upper.map { case (id, v) =>
          id -> IcebergTypes.encodeBound(v, byName.values.find(_.id == id).get.icebergTypeString) },
        valueCounts, nullCounts)
    } finally reader.close()
  }

  /** Parquet footer statistics → the normalized comparable domain. */
  private def normalizedMinMax(s: org.apache.parquet.column.statistics.Statistics[_],
      icebergType: String): (Any, Any) = {
    import org.apache.parquet.column.statistics._
    s match {
      case i: IntStatistics => (i.getMin.toLong, i.getMax.toLong)
      case l: LongStatistics => (l.getMin, l.getMax)
      case f: FloatStatistics => (f.getMin.toDouble, f.getMax.toDouble)
      case d: DoubleStatistics => (d.getMin, d.getMax)
      case b: BooleanStatistics => (b.getMin, b.getMax)
      case b: BinaryStatistics if icebergType == "string" =>
        (b.genericGetMin.toStringUsingUTF8, b.genericGetMax.toStringUsingUTF8)
      case _ => (null, null)
    }
  }

  // ------------------------------------------------------------- avro

  /** Avro schemas per the public Iceberg v1 spec (manifest file / entry). */
  private val ManifestEntrySchema: Schema = new Schema.Parser().parse("""
    {"type": "record", "name": "manifest_entry", "fields": [
      {"name": "status", "type": "int", "field-id": 0},
      {"name": "snapshot_id", "type": ["null", "long"], "default": null, "field-id": 1},
      {"name": "data_file", "type": {"type": "record", "name": "r2", "fields": [
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
        {"name": "partition", "type": {"type": "record", "name": "r102", "fields": []}, "field-id": 102},
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
        {"name": "block_size_in_bytes", "type": "long", "field-id": 105},
        {"name": "value_counts", "type": ["null", {"type": "array", "items":
          {"type": "record", "name": "k119_v120", "fields": [
            {"name": "key", "type": "int", "field-id": 119},
            {"name": "value", "type": "long", "field-id": 120}]},
          "logicalType": "map"}], "default": null, "field-id": 109},
        {"name": "null_value_counts", "type": ["null", {"type": "array", "items":
          {"type": "record", "name": "k121_v122", "fields": [
            {"name": "key", "type": "int", "field-id": 121},
            {"name": "value", "type": "long", "field-id": 122}]},
          "logicalType": "map"}], "default": null, "field-id": 110},
        {"name": "lower_bounds", "type": ["null", {"type": "array", "items":
          {"type": "record", "name": "k126_v127", "fields": [
            {"name": "key", "type": "int", "field-id": 126},
            {"name": "value", "type": "bytes", "field-id": 127}]},
          "logicalType": "map"}], "default": null, "field-id": 125},
        {"name": "upper_bounds", "type": ["null", {"type": "array", "items":
          {"type": "record", "name": "k129_v130", "fields": [
            {"name": "key", "type": "int", "field-id": 129},
            {"name": "value", "type": "bytes", "field-id": 130}]},
          "logicalType": "map"}], "default": null, "field-id": 128}
      ]}, "field-id": 2}
    ]}""")

  private val ManifestFileSchema: Schema = new Schema.Parser().parse("""
    {"type": "record", "name": "manifest_file", "fields": [
      {"name": "manifest_path", "type": "string", "field-id": 500},
      {"name": "manifest_length", "type": "long", "field-id": 501},
      {"name": "partition_spec_id", "type": "int", "field-id": 502},
      {"name": "added_snapshot_id", "type": ["null", "long"], "default": null, "field-id": 503},
      {"name": "added_data_files_count", "type": ["null", "int"], "default": null, "field-id": 504},
      {"name": "existing_data_files_count", "type": ["null", "int"], "default": null, "field-id": 505},
      {"name": "deleted_data_files_count", "type": ["null", "int"], "default": null, "field-id": 506},
      {"name": "added_rows_count", "type": ["null", "long"], "default": null, "field-id": 512},
      {"name": "existing_rows_count", "type": ["null", "long"], "default": null, "field-id": 513},
      {"name": "deleted_rows_count", "type": ["null", "long"], "default": null, "field-id": 514}
    ]}""")

  private def kvArray(schema: Schema, field: String, m: Map[Int, _]): java.util.List[GenericRecord] = {
    val itemSchema = schema.getField(field).schema().getTypes.get(1).getElementType
    m.toSeq.sortBy(_._1).map { case (k, v) =>
      val r = new GenericData.Record(itemSchema)
      r.put("key", k)
      v match {
        case b: Array[Byte] => r.put("value", java.nio.ByteBuffer.wrap(b))
        case l: Long => r.put("value", l)
      }
      r: GenericRecord
    }.asJava
  }

  private def writeManifest(path: String, snapshotId: Long,
      files: Seq[(String, Long, FileStats)], conf: Configuration): Unit = {
    val dataFileSchema = ManifestEntrySchema.getField("data_file").schema()
    writeAvro(path, ManifestEntrySchema, conf) { w =>
      files.foreach { case (filePath, size, stats) =>
        val df = new GenericData.Record(dataFileSchema)
        df.put("file_path", filePath)
        df.put("file_format", "PARQUET")
        df.put("partition", new GenericData.Record(dataFileSchema.getField("partition").schema()))
        df.put("record_count", stats.recordCount)
        df.put("file_size_in_bytes", size)
        df.put("block_size_in_bytes", 67108864L)
        df.put("value_counts", kvArray(dataFileSchema, "value_counts", stats.valueCounts))
        df.put("null_value_counts", kvArray(dataFileSchema, "null_value_counts", stats.nullCounts))
        df.put("lower_bounds", kvArray(dataFileSchema, "lower_bounds", stats.lowerBounds))
        df.put("upper_bounds", kvArray(dataFileSchema, "upper_bounds", stats.upperBounds))
        val entry = new GenericData.Record(ManifestEntrySchema)
        entry.put("status", Manifests.Status.Added)
        entry.put("snapshot_id", snapshotId)
        entry.put("data_file", df)
        w.append(entry)
      }
    }
  }

  private def writeManifestList(path: String, snapshotId: Long, newManifest: String,
      addedBytes: Long, addedFiles: Int, addedRows: Long,
      prior: Seq[Manifests.ManifestFile], conf: Configuration): Unit = {
    val fs = new Path(newManifest).getFileSystem(conf)
    val newLen = fs.getFileStatus(new Path(newManifest)).getLen
    writeAvro(path, ManifestFileSchema, conf) { w =>
      val rec = new GenericData.Record(ManifestFileSchema)
      rec.put("manifest_path", newManifest)
      rec.put("manifest_length", newLen)
      rec.put("partition_spec_id", 0)
      rec.put("added_snapshot_id", snapshotId)
      rec.put("added_data_files_count", addedFiles)
      rec.put("existing_data_files_count", 0)
      rec.put("deleted_data_files_count", 0)
      rec.put("added_rows_count", addedRows)
      rec.put("existing_rows_count", 0L)
      rec.put("deleted_rows_count", 0L)
      w.append(rec)
      prior.foreach { m =>
        val r = new GenericData.Record(ManifestFileSchema)
        r.put("manifest_path", m.path)
        r.put("manifest_length", m.length)
        r.put("partition_spec_id", m.partitionSpecId)
        r.put("added_snapshot_id", m.addedSnapshotId.map(Long.box).orNull)
        r.put("added_data_files_count", m.addedFilesCount.map(Int.box).orNull)
        r.put("existing_data_files_count", m.existingFilesCount.map(Int.box).orNull)
        r.put("deleted_data_files_count", m.deletedFilesCount.map(Int.box).orNull)
        r.put("added_rows_count", m.addedRowsCount.map(Long.box).orNull)
        r.put("existing_rows_count", m.existingRowsCount.map(Long.box).orNull)
        r.put("deleted_rows_count", m.deletedRowsCount.map(Long.box).orNull)
        w.append(r)
      }
    }
  }

  private def writeAvro(path: String, schema: Schema, conf: Configuration)
      (body: DataFileWriter[GenericRecord] => Unit): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    writer.create(schema, out)
    try body(writer) finally writer.close()
  }

  // ------------------------------------------------------------- fs io

  private def writeString(path: String, content: String, conf: Configuration): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readString(path: String, conf: Configuration): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toString("UTF-8")
    } finally in.close()
  }
}
