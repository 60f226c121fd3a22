package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{View, ViewInfo}
import org.apache.spark.sql.types.StructType

import graft.iceberg.ViewMetadata

/** A loaded Iceberg view served to Spark's view resolution: the CURRENT
  * version's spark-dialect SQL plus its resolution context
  * (default-catalog / default-namespace, so references inside the view
  * body resolve where the view was DEFINED, not where it is queried —
  * the spec's rule). Spark's round-trip columns metadata (query column
  * names / aliases / comments) rides in view properties under the same
  * keys Iceberg's Spark integration uses. */
final class GraftIcebergView(viewName: String, meta: ViewMetadata)
  extends View {

  private val cur = meta.currentVersion

  override def name(): String = viewName

  override def query(): String = {
    require(cur.sql.nonEmpty,
      s"view $viewName has no SQL representation usable by Spark")
    cur.sql
  }

  override def currentCatalog(): String = cur.defaultCatalog.orNull

  override def currentNamespace(): Array[String] = cur.defaultNamespace.toArray

  override def schema(): StructType = meta.schemaFor(cur).toSpark

  private def propList(key: String): Array[String] =
    meta.properties.get(key).filter(_.nonEmpty)
      .map(_.split(",", -1)).getOrElse(Array.empty)

  override def queryColumnNames(): Array[String] =
    propList(GraftIcebergView.QueryColumnNames)

  override def columnAliases(): Array[String] =
    propList(GraftIcebergView.ColumnAliases)

  override def columnComments(): Array[String] =
    propList(GraftIcebergView.ColumnComments)

  override def properties(): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    meta.properties.foreach { case (k, v) => m.put(k, v) }
    m.put("format-version", meta.formatVersion.toString)
    m.put("view-uuid", meta.viewUuid)
    m.put("current-version-id", meta.currentVersionId.toString)
    m
  }
}

object GraftIcebergView {
  /** Spark round-trip state persisted as view properties (the key names
    * Iceberg's Spark integration uses for the same purpose). */
  val QueryColumnNames = "spark.query-column-names"
  val ColumnAliases = "spark.column-aliases"
  val ColumnComments = "spark.column-comments"

  /** View properties to persist for `info`: the user's map plus the
    * round-trip columns metadata (omitted when empty). */
  def roundTripProps(info: ViewInfo): Map[String, String] = {
    val base = Option(info.properties)
      .map(_.asScala.toMap).getOrElse(Map.empty[String, String])
    def enc(key: String, v: Array[String]): Map[String, String] =
      if (v == null || v.isEmpty) Map.empty else Map(key -> v.mkString(","))
    base ++
      enc(QueryColumnNames, info.queryColumnNames) ++
      enc(ColumnAliases, info.columnAliases) ++
      enc(ColumnComments, Option(info.columnComments)
        .map(_.map(c => if (c == null) "" else c)).orNull)
  }
}
