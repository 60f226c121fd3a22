package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession

import graft.iceberg.{IcebergTable, IcebergWriter}

/** Iceberg REST catalog client — namespace/table CRUD against the open REST
  * catalog protocol, mirroring the reference's `rest_client.py:4-95`
  * (unauthenticated, same endpoints) over `java.net.http`.
  *
  * `loadTable` hands the returned `metadata-location` to [[IcebergTable]]
  * exactly as the reference feeds it to `IcebergDataset`
  * (test_rest.py:74-79).
  */
final class IceRestCatalog(endpoint: String, prefix: String = "") {

  private val mapper = new ObjectMapper()
  private val http = HttpClient.newHttpClient()
  private val base = endpoint.stripSuffix("/") + "/v1" +
    (if (prefix.nonEmpty) s"/$prefix" else "")

  private def request(method: String, path: String, body: Option[String] = None): JsonNode = {
    val b = HttpRequest.newBuilder(URI.create(s"$base$path"))
      .header("Content-Type", "application/json")
    val req = (method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(body.getOrElse("{}")))
      case "HEAD" => b.method("HEAD", HttpRequest.BodyPublishers.noBody())
    }).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
    if (resp.statusCode() >= 400)
      throw new RuntimeException(s"$method $path -> HTTP ${resp.statusCode()}: ${resp.body()}")
    if (resp.body() == null || resp.body().isEmpty) mapper.createObjectNode()
    else mapper.readTree(resp.body())
  }

  // ---------------------------------------------------------- namespaces

  /** rest_client.py:27-31 */
  def listNamespaces(): Seq[String] =
    request("GET", "/namespaces").get("namespaces").elements().asScala
      .map(_.elements().asScala.map(_.asText).mkString(".")).toSeq

  /** rest_client.py:33-36 */
  def getNamespace(name: String): JsonNode =
    request("GET", s"/namespaces/$name")

  /** rest_client.py:38-41 */
  def createNamespace(name: String): JsonNode =
    request("POST", "/namespaces",
      Some(s"""{"namespace": ${levels(name)}, "properties": {}}"""))

  /** rest_client.py:43-44 */
  def deleteNamespace(name: String): Unit =
    request("DELETE", s"/namespaces/$name")

  // -------------------------------------------------------------- tables

  /** rest_client.py:46-49 */
  def listTables(namespace: String): Seq[String] =
    request("GET", s"/namespaces/$namespace/tables").get("identifiers")
      .elements().asScala.map(_.get("name").asText).toSeq

  /** Create a table from a {name -> iceberg type} schema — the reference's
    * simplified creation path (rest_client.py:51-82), incl. stage-create. */
  def createTable(namespace: String, name: String, schema: Seq[(String, String)],
      location: Option[String] = None, stageCreate: Boolean = false): JsonNode = {
    val fields = schema.zipWithIndex.map { case ((n, t), i) =>
      s"""{"id": ${i + 1}, "name": "$n", "required": false, "type": "$t"}"""
    }.mkString(",")
    val loc = location.map(l => s""""location": "$l",""").getOrElse("")
    val body = s"""{
      "name": "$name", $loc
      "schema": {"type": "struct", "schema-id": 0, "fields": [$fields]},
      "partition-spec": {"spec-id": 0, "fields": []},
      "write-order": null,
      "stage-create": $stageCreate,
      "properties": {}
    }"""
    request("POST", s"/namespaces/$namespace/tables", Some(body))
  }

  /** rest_client.py:84-88 */
  def getTable(namespace: String, name: String): JsonNode =
    request("GET", s"/namespaces/$namespace/tables/$name")

  /** REST spec `RegisterTableRequest` (POST …/namespaces/{ns}/register):
    * the catalog records an EXISTING table's metadata file as a new entry —
    * nothing copies; the server owns the entry from then on. */
  def registerTable(namespace: String, name: String,
      metadataLocation: String): JsonNode = {
    // serialized by the mapper, not interpolated — names/locations holding
    // quotes or backslashes must arrive escaped, not as malformed JSON
    val body = mapper.createObjectNode()
    body.put("name", name)
    body.put("metadata-location", metadataLocation)
    request("POST", s"/namespaces/$namespace/register",
      Some(mapper.writeValueAsString(body)))
  }

  /** rest_client.py:90-95 — `purge` asks the server to also drop data
    * files, carried as the REST spec's `purgeRequested` query parameter. */
  def deleteTable(namespace: String, name: String, purge: Boolean = false): Unit = {
    val q = if (purge) "?purgeRequested=true" else ""
    request("DELETE", s"/namespaces/$namespace/tables/$name$q")
  }

  /** Open a catalog table as an [[IcebergTable]] via its metadata-location.
    * The returned instance carries a CATALOG COMMIT SCOPE: every write
    * committed against it (DataFrame API, SQL DML through the
    * CatalogPlugin, deleteWhere…) publishes through the REST commit
    * protocol — never the filesystem version-hint swap. */
  def loadTable(spark: SparkSession, namespace: String, name: String): IcebergTable = {
    val meta = getTable(namespace, name)
    val loc = meta.get("metadata-location").asText
    IcebergTable.load(spark, loc)
      .withCommitScope(body => withCatalogAtomicity(spark, namespace, name)(body()))
  }

  // ----------------------------------------------------- commit protocol

  /** The Iceberg REST COMMIT endpoint: POST the table's update list guarded
    * by its requirement list (`CommitTableRequest` in the REST spec). The
    * server applies the updates to ITS copy of the metadata atomically —
    * refusing with 409 when a requirement no longer holds — so commits
    * through a REST catalog get catalog atomicity instead of relying on a
    * filesystem exclusive-create (which object stores cannot provide).
    * `requirements`/`updates` are JSON object strings, e.g.
    * `{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":42}` and
    * `{"action":"add-snapshot","snapshot":{...}}`. */
  def commitTable(namespace: String, name: String,
      requirements: Seq[String], updates: Seq[String]): JsonNode =
    request("POST", s"/namespaces/$namespace/tables/$name", Some(
      s"""{"requirements": [${requirements.mkString(",")}],
           "updates": [${updates.mkString(",")}]}"""))

  /** Run `body` — any single-snapshot write against this table's storage
    * location — with its metadata publish routed through CATALOG ATOMICITY:
    * the locally-built metadata diffs into `add-snapshot` +
    * `set-snapshot-ref main` updates guarded by an `assert-ref-snapshot-id`
    * requirement on main's snapshot at build time. A concurrent committer
    * moves main, the server refuses with 409, and the optimistic loop
    * rebuilds against the catalog's FRESH metadata-location (re-fetched per
    * attempt — the filesystem version-hint is never consulted, so the
    * catalog stays the single source of truth). Covers append / overwrite /
    * row-level DML (snapshot-adding commits), schema and partition-spec
    * evolution (add-schema/set-current-schema, add-spec/set-default-spec),
    * and sort orders; snapshot REMOVAL (expiration) is refused — it needs
    * the remove-snapshots action this client does not send. */
  def withCatalogAtomicity[T](spark: SparkSession, namespace: String,
      name: String)(body: => T): T =
    IcebergWriter.withCatalogCommit(s => loadTableNoScope(s, namespace, name)) {
      (before, json) =>
        val (requirements, updates) = snapshotDiff(before, json)
        try commitTable(namespace, name, requirements, updates)
        catch {
          case e: RuntimeException if e.getMessage.contains("HTTP 409") =>
            throw new IcebergWriter.CommitConflictException(e.getMessage)
        }
    }(body)

  /** [[loadTable]] without the commit scope — the resolve side of
    * [[withCatalogAtomicity]] (a scoped instance there would try to nest
    * scopes on retry). */
  private def loadTableNoScope(spark: SparkSession, namespace: String,
      name: String): IcebergTable =
    IcebergTable.load(spark,
      getTable(namespace, name).get("metadata-location").asText)

  /** APPEND through catalog atomicity (see [[withCatalogAtomicity]]). */
  def commitAppend(spark: SparkSession, namespace: String, name: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val url = loadTableNoScope(spark, namespace, name).url
    withCatalogAtomicity(spark, namespace, name) {
      IcebergWriter.append(spark, url, df)
    }
  }

  /** Translate a locally-built metadata JSON into the REST commit's
    * update/requirement lists by DIFFING it against the state it was built
    * from: every snapshot not present before becomes `add-snapshot`, the
    * new current snapshot becomes `set-snapshot-ref main`, and the
    * requirement pins main to the snapshot the build saw (null = the build
    * saw an empty table, so main must still not exist). */
  private def snapshotDiff(before: IcebergTable, json: String): (Seq[String], Seq[String]) = {
    val newMeta = mapper.readTree(json)
    val oldIds = before.metadata.snapshots.map(_.snapshotId).toSet
    // REFUSE what the REST update vocabulary used here cannot express,
    // rather than silently committing a PARTIAL change: snapshot removal
    // (expiration) needs remove-snapshots, which this client does not send.
    val newIds = newMeta.get("snapshots").elements().asScala
      .map(_.get("snapshot-id").asLong).toSet
    if (!oldIds.subsetOf(newIds))
      throw new UnsupportedOperationException(
        "this commit REMOVES snapshots (expiration?); only snapshot-adding " +
          "commits route through the REST catalog scope")
    val beforeMeta = mapper.readTree(before.rawMetadataJson)
    val updates = Seq.newBuilder[String]
    val requirements = Seq.newBuilder[String]

    // SCHEMA EVOLUTION → add-schema + set-current-schema, guarded by
    // assert-current-schema-id (a concurrent evolution forces a rebuild)
    def idSet(node: JsonNode, arr: String, id: String): Set[Int] =
      Option(node.get(arr)).toSeq.flatMap(_.elements().asScala)
        .map(_.get(id).asInt).toSet
    def intOf(node: JsonNode, f: String, dflt: Int): Int =
      Option(node.get(f)).map(_.asInt).getOrElse(dflt)
    val oldSchemaIds = idSet(beforeMeta, "schemas", "schema-id")
    Option(newMeta.get("schemas")).toSeq.flatMap(_.elements().asScala)
      .filterNot(sc => oldSchemaIds.contains(sc.get("schema-id").asInt))
      .foreach { sc =>
        updates += s"""{"action": "add-schema", "schema": $sc,
          "last-column-id": ${intOf(newMeta, "last-column-id", -1)}}"""
      }
    if (intOf(newMeta, "current-schema-id", -1) != intOf(beforeMeta, "current-schema-id", -1)) {
      updates += s"""{"action": "set-current-schema",
        "schema-id": ${intOf(newMeta, "current-schema-id", -1)}}"""
      requirements += s"""{"type": "assert-current-schema-id",
        "current-schema-id": ${intOf(beforeMeta, "current-schema-id", -1)}}"""
    }

    // PARTITION-SPEC EVOLUTION → add-spec + set-default-spec
    val oldSpecIds = idSet(beforeMeta, "partition-specs", "spec-id")
    Option(newMeta.get("partition-specs")).toSeq.flatMap(_.elements().asScala)
      .filterNot(sp => oldSpecIds.contains(sp.get("spec-id").asInt))
      .foreach(sp => updates += s"""{"action": "add-spec", "spec": $sp}""")
    if (intOf(newMeta, "default-spec-id", 0) != intOf(beforeMeta, "default-spec-id", 0)) {
      updates += s"""{"action": "set-default-spec",
        "spec-id": ${intOf(newMeta, "default-spec-id", 0)}}"""
      requirements += s"""{"type": "assert-default-spec-id",
        "default-spec-id": ${intOf(beforeMeta, "default-spec-id", 0)}}"""
    }

    // SORT-ORDER changes → add-sort-order + set-default-sort-order
    val oldOrderIds = idSet(beforeMeta, "sort-orders", "order-id")
    Option(newMeta.get("sort-orders")).toSeq.flatMap(_.elements().asScala)
      .filterNot(so => oldOrderIds.contains(so.get("order-id").asInt))
      .foreach(so => updates += s"""{"action": "add-sort-order", "sort-order": $so}""")
    if (intOf(newMeta, "default-sort-order-id", 0) != intOf(beforeMeta, "default-sort-order-id", 0))
      updates += s"""{"action": "set-default-sort-order",
        "sort-order-id": ${intOf(newMeta, "default-sort-order-id", 0)}}"""
    // TABLE + PARTITION STATISTICS → set-/remove- updates (the spec's REST
    // update types); a same-snapshot recompute diffs to one full-replace
    // set-statistics. Without this, a stats commit on a catalog-scoped
    // table would silently publish NOTHING.
    def statsBySnap(node: JsonNode, field: String): Map[Long, JsonNode] =
      Option(node.get(field)).toSeq.flatMap(_.elements().asScala)
        .map(e => e.get("snapshot-id").asLong -> e).toMap
    Seq(("statistics", "set-statistics", "remove-statistics"),
      ("partition-statistics", "set-partition-statistics",
        "remove-partition-statistics")).foreach { case (field, setA, removeA) =>
      val oldS = statsBySnap(beforeMeta, field)
      val newS = statsBySnap(newMeta, field)
      newS.foreach { case (sid, e) =>
        if (!oldS.get(sid).contains(e))
          updates += s"""{"action": "$setA", "snapshot-id": $sid, "$field": $e}"""
      }
      oldS.keySet.diff(newS.keySet).foreach(sid =>
        updates += s"""{"action": "$removeA", "snapshot-id": $sid}""")
    }
    // TABLE PROPERTIES → set-properties / remove-properties (REST spec
    // update types). Without this, an ALTER TABLE SET/UNSET TBLPROPERTIES
    // commit in a catalog scope would diff to ZERO updates and silently
    // publish nothing.
    def propsOf(node: JsonNode): Map[String, String] =
      Option(node.get("properties")).toSeq.flatMap(_.properties().asScala)
        .map(e => e.getKey -> e.getValue.asText).toMap
    val oldProps = propsOf(beforeMeta)
    val newProps = propsOf(newMeta)
    val changedProps = newProps.filter { case (k, v) => !oldProps.get(k).contains(v) }
    if (changedProps.nonEmpty) {
      val obj = mapper.createObjectNode()
      changedProps.foreach { case (k, v) => obj.put(k, v) }
      updates += s"""{"action": "set-properties", "updates": $obj}"""
    }
    val removedProps = oldProps.keySet.diff(newProps.keySet)
    if (removedProps.nonEmpty) {
      val arr = mapper.createArrayNode()
      removedProps.toSeq.sorted.foreach(arr.add)
      updates += s"""{"action": "remove-properties", "removals": $arr}"""
    }
    newMeta.get("snapshots").elements().asScala
      .filterNot(s => oldIds.contains(s.get("snapshot-id").asLong))
      .foreach(s => updates += s"""{"action": "add-snapshot", "snapshot": $s}""")
    // EVERY ref the commit creates or moves (main for normal commits, a
    // staging branch for write-audit-publish, tags) becomes its own
    // set-snapshot-ref update, guarded by an assert-ref-snapshot-id pinning
    // the ref where the build saw it (null = ref must not exist yet) — so a
    // concurrent committer moving ANY ref this commit touches forces a
    // rebuild, branch and tag commits included.
    val oldRefs: Map[String, Long] =
      before.metadata.refs.map { case (n, r) => n -> r.snapshotId } ++
        (if (before.metadata.currentSnapshotId >= 0)
           Map("main" -> before.metadata.currentSnapshotId)
         else Map.empty)
    val newRefs: Map[String, (Long, String)] = {
      val fromRefs = Option(newMeta.get("refs")).toSeq
        .flatMap(_.properties().asScala)
        .map(e => e.getKey -> (e.getValue.get("snapshot-id").asLong,
          e.getValue.get("type").asText)).toMap
      val newCur = newMeta.get("current-snapshot-id").asLong
      if (newCur >= 0) fromRefs.updated("main",
        (newCur, "branch")) else fromRefs
    }
    newRefs.foreach { case (name, (id, refType)) =>
      if (!oldRefs.get(name).contains(id)) {
        updates += s"""{"action": "set-snapshot-ref", "ref-name": "$name",
          "type": "$refType", "snapshot-id": $id}"""
        requirements += s"""{"type": "assert-ref-snapshot-id", "ref": "$name",
          "snapshot-id": ${oldRefs.get(name).map(_.toString).getOrElse("null")}}"""
      }
    }
    (requirements.result(), updates.result())
  }

  private def levels(name: String): String =
    name.split('.').map(p => s""""$p"""").mkString("[", ",", "]")
}

/** Dev helpers to examine the published Iceberg REST OpenAPI document —
  * the reference's utility tail (rest_client.py:103-132): parse the spec
  * once, memoize it, and look entity definitions up by their `\$ref`
  * fragment path.
  *
  * The reference downloads
  * `apache/iceberg/open-api/rest-catalog-open-api.yaml` from GitHub at
  * first use; this environment is egress-free, so the document (YAML or
  * JSON — the published spec is YAML) is supplied by the caller as text
  * or a local file. Navigation semantics are identical: strip the `#`,
  * walk each `/`-separated key from the document root.
  */
object IceRestApi {

  private val yaml = new ObjectMapper(
    new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())

  /** Parse an OpenAPI document into the handle [[definition]] resolves
    * against (rest_client.py:103-112's `_get_api`). The parsed node IS the
    * memo — callers hold it; a process-global cell (the reference's
    * `api = [None]`) would let two callers loading different specs race
    * and silently resolve against whichever loaded last. */
  def load(specText: String): JsonNode = yaml.readTree(specText)

  /** [[load]] from a local file path. */
  def loadFile(path: String): JsonNode =
    load(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), StandardCharsets.UTF_8))

  /** Find the definition of a REST API entity by `\$ref` path, e.g.
    * `#/components/schemas/AddSnapshotUpdate` (rest_client.py:119-132's
    * `_get_def`), resolved against the spec handle [[load]] returned. */
  def definition(path: String, spec: JsonNode): JsonNode = {
    val root = Option(spec).getOrElse(
      throw new IllegalStateException("no API spec supplied; pass load()/loadFile()'s result"))
    path.stripPrefix("#").split('/').filter(_.nonEmpty).foldLeft(root) { (node, part) =>
      val next = node.get(part)
      if (next == null)
        throw new NoSuchElementException(s"'$part' not found resolving $path")
      next
    }
  }

  /** All `\$ref` targets reachable under a node — handy for walking a
    * definition's dependencies the way the reference's doctest chains
    * `_get_def` calls. */
  def refsIn(node: JsonNode): Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    def walk(n: JsonNode): Unit = {
      if (n.isObject) {
        val r = n.get("$ref")
        if (r != null && r.isTextual) out += r.asText()
        n.properties().asScala.foreach(e => walk(e.getValue))
      } else if (n.isArray) n.elements().asScala.foreach(walk)
    }
    walk(node)
    out.toSeq
  }
}
