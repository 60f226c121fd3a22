package graft.iceberg

import java.util.UUID

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.avro.util.Utf8
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** `rewrite_table_path` — the disaster-recovery / table-copy tool
  * (Iceberg's procedure of the same name): prepare a table for relocation
  * from `sourcePrefix` to `targetPrefix` WITHOUT touching the live table.
  * Every metadata artifact that embeds absolute paths is rewritten into a
  * STAGING directory — the current `vN.metadata.json` (location,
  * manifest-list, metadata-log, statistics paths), every snapshot's
  * manifest list (manifest_path entries), and every manifest
  * (`data_file.file_path`, v3 `referenced_data_file`) — via a LOSSLESS
  * generic-Avro round trip: records are read with each file's own embedded
  * schema, only the path fields are mutated, and the writer re-emits the
  * same schema plus the original file metadata (partition-spec, content,
  * …), so v1/v2/v3 manifests survive byte-semantics-identical.
  *
  * The procedure MOVES NOTHING. It emits a copy plan — a tab-separated
  * `file-list.tsv` of (source, target) pairs covering the data/delete/
  * statistics files (copied verbatim from their original site) and the
  * staged rewritten metadata — which the operator feeds to a bulk copier
  * (distcp-shaped tooling). After the copy, the target prefix holds a
  * complete, independently loadable table.
  *
  * Scale posture: the rewrite is driver-side Avro IO over METADATA-scale
  * bytes (same posture as rewriteManifests/expireSnapshots); the file list
  * streams line-by-line, so driver memory stays O(1) in data-file count.
  */
object RewriteTablePath {

  final case class Result(stagingLocation: String, fileListPath: String,
      metadataFiles: Int, manifestLists: Int, manifests: Int, dataFiles: Long)

  def rewrite(spark: SparkSession, url: String, sourcePrefix: String,
      targetPrefix: String, stagingLocation: Option[String] = None): Result =
    rewriteTable(spark, IcebergWriter.resolveCurrent(spark, url),
      sourcePrefix, targetPrefix, stagingLocation)

  /** The table-taking form: catalogs resolve THEIR view of the table (a
    * REST catalog's current metadata can be ahead of the filesystem
    * version hint) and pass it here, so the staged copy reflects exactly
    * what the catalog serves. */
  def rewriteTable(spark: SparkSession, table: IcebergTable,
      sourcePrefix: String, targetPrefix: String,
      stagingLocation: Option[String] = None): Result = {
    require(sourcePrefix.nonEmpty && targetPrefix.nonEmpty,
      "source_prefix and target_prefix must be non-empty")
    require(sourcePrefix != targetPrefix,
      "source_prefix equals target_prefix — nothing to rewrite")
    val conf = spark.sessionState.newHadoopConf()
    val url = table.url

    // metadata stores BOTH path forms — scheme-less (/tmp/…/data/f.parquet)
    // and scheme-qualified (file:/tmp/…, hdfs://nn/…): rewrite the path
    // part wherever the prefix sits right after a scheme[/authority], so a
    // scheme-less source_prefix covers both forms
    def re(p: String): String =
      if (p.startsWith(sourcePrefix))
        targetPrefix + p.substring(sourcePrefix.length)
      else {
        val i = p.indexOf(sourcePrefix)
        if (i > 0 && p.substring(0, i).matches("[A-Za-z][A-Za-z0-9+.-]*:(//[^/]*)?"))
          p.substring(0, i) + targetPrefix + p.substring(i + sourcePrefix.length)
        else p
      }
    val staging = stagingLocation.getOrElse(
      s"$url/metadata/rewrite-staging-${UUID.randomUUID().toString.take(8)}")
    val stagingPath = new Path(staging)
    val fs = stagingPath.getFileSystem(conf)
    fs.mkdirs(stagingPath)

    // the copy plan streams out as it is discovered — O(1) driver memory
    val fileListPath = s"$staging/file-list.tsv"
    val listOut = new java.io.PrintWriter(new java.io.OutputStreamWriter(
      fs.create(new Path(fileListPath), true), java.nio.charset.StandardCharsets.UTF_8))
    var dataFiles = 0L
    val listed = scala.collection.mutable.Set.empty[String]
    def plan(src: String, dst: String): Boolean =
      listed.add(src) && { listOut.println(s"$src\t$dst"); true }

    try {
      var manifestCount = 0
      val rewrittenManifests = scala.collection.mutable.Set.empty[String]
      // 1. every snapshot's manifests, then its manifest list
      table.metadata.snapshots.foreach { snap =>
        val view = table.atSnapshot(snap.snapshotId)
        // manifest lists live under the local metadata dir by basename —
        // the same rule the loader applies (rewriteManifestList)
        val mlSrc = s"$url/metadata/${name(snap.manifestList)}"
        Manifests.readManifestList(mlSrc, conf).foreach { mf =>
          val mSrc = view.resolvePath(mf.path)
          if (rewrittenManifests.add(mSrc)) {
            manifestCount += 1
            copyAvroRewriting(mSrc, s"$staging/${name(mSrc)}", conf) { rec =>
              val df = rec.get("data_file").asInstanceOf[GenericRecord]
              val p = df.get("file_path").toString
              df.put("file_path", new Utf8(re(p)))
              if (plan(p, re(p))) dataFiles += 1
              if (df.getSchema.getField("referenced_data_file") != null) {
                Option(df.get("referenced_data_file")).foreach(r =>
                  df.put("referenced_data_file", new Utf8(re(r.toString))))
              }
            }
            plan(s"$staging/${name(mSrc)}", re(mSrc))
          }
        }
        copyAvroRewriting(mlSrc, s"$staging/${name(mlSrc)}", conf) { rec =>
          rec.put("manifest_path",
            new Utf8(re(rec.get("manifest_path").toString)))
        }
        plan(s"$staging/${name(mlSrc)}", re(mlSrc))
      }
      val manifestListCount = table.metadata.snapshots.size

      // 2. statistics + partition-statistics files copy verbatim
      (table.metadata.statistics.map(_.path) ++
        table.metadata.partitionStatistics.map(_.path)).foreach { p =>
        val abs = table.resolvePath(p)
        plan(abs, re(abs))
      }

      // 3. the current metadata.json, re-prefixed everywhere it names a path
      val mapper = new ObjectMapper()
      val root = mapper.readTree(
        IcebergWriter.metadataBaseJson(table, url, conf)).asInstanceOf[ObjectNode]
      root.put("location", re(root.get("location").asText))
      def reField(n: ObjectNode, f: String): Unit =
        if (n.has(f)) n.put(f, re(n.get(f).asText))
      if (root.has("snapshots"))
        root.withArray[ArrayNode]("snapshots").asScala
          .foreach(s => reField(s.asInstanceOf[ObjectNode], "manifest-list"))
      if (root.has("metadata-log"))
        root.withArray[ArrayNode]("metadata-log").asScala
          .foreach(e => reField(e.asInstanceOf[ObjectNode], "metadata-file"))
      Seq("statistics", "partition-statistics").foreach { sect =>
        if (root.has(sect))
          root.withArray[ArrayNode](sect).asScala
            .foreach(s => reField(s.asInstanceOf[ObjectNode], "statistics-path"))
      }
      // the staged metadata takes the SOURCE file's own name (a
      // metadata-file-resolved table reports version 0; the basename is
      // always right), and the hint mirrors its version number
      // (a gzip-compressed source writes back PLAIN, so the staged name
      // drops the .gzip marker — the loader prefers the plain form)
      val metaName = name(table.loadedFrom)
        .replace(".gzip.metadata.json", ".metadata.json")
      val hintV = "v(\\d+)".r.findFirstMatchIn(metaName)
        .map(_.group(1)).getOrElse("1")
      IcebergWriter.writeString(s"$staging/$metaName", root.toPrettyString, conf)
      plan(s"$staging/$metaName", re(s"$url/metadata/$metaName"))
      IcebergWriter.writeString(s"$staging/version-hint.text", hintV, conf)
      plan(s"$staging/version-hint.text", re(s"$url/metadata/version-hint.text"))

      Result(staging, fileListPath, metadataFiles = 1,
        manifestLists = manifestListCount, manifests = manifestCount,
        dataFiles = dataFiles)
    } finally listOut.close()
  }

  /** Copy an Avro container file record-by-record with `mutate` applied —
    * the file's OWN embedded schema reads and writes the records, and all
    * non-reserved file metadata (schema/partition-spec/content/…) carries
    * over, so nothing but the mutated fields can change. */
  private def copyAvroRewriting(src: String, dst: String, conf: Configuration)(
      mutate: GenericRecord => Unit): Unit = {
    val input = new FsInput(new Path(src), conf)
    val reader = DataFileReader.openReader(
      input, new GenericDatumReader[GenericRecord]())
      .asInstanceOf[DataFileReader[GenericRecord]]
    try {
      val schema = reader.getSchema
      val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      reader.getMetaKeys.asScala.filterNot(_.startsWith("avro.")).foreach(k =>
        writer.setMeta(k, reader.getMeta(k)))
      val out = new Path(dst).getFileSystem(conf).create(new Path(dst), true)
      writer.create(schema, out)
      try reader.iterator().asScala.foreach { r => mutate(r); writer.append(r) }
      finally writer.close()
    } finally reader.close()
  }

  private def name(p: String): String = p.split('/').last
}
