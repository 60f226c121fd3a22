package graft.iceberg

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ArrayNode

/** Iceberg `schema.name-mapping.default` (spec "Name Mapping Serialization"):
  * a field-id → names table recorded in table properties so data files with
  * NO field ids (foreign parquet/ORC/Avro registered via `addFiles`) keep
  * resolving correctly after schema evolution. Without it, renaming a
  * column whose data lives in imported id-less files silently misresolves —
  * the by-name batch would look for the NEW name in files that carry the
  * OLD one.
  *
  * [[IcebergWriter.addFiles]] records the import-time top-level names; the
  * scan's foreign batches rename their read schemas through the mapping
  * (current name → import-time name, by field id) so imported files resolve
  * under the names they were written with. Fields added AFTER the import
  * (ids absent from the mapping) read as null per the spec — served here by
  * renaming them to a reserved absent name, which also stops a re-added
  * same-named column from resurrecting dropped data. */
object NameMapping {

  val Prop = "schema.name-mapping.default"

  private val mapper = new ObjectMapper()

  /** Parse the spec's JSON list (top-level entries only — this writer
    * imports flat-resolvable files and guards nested renames loudly). */
  def parse(json: String): Map[Int, Seq[String]] =
    mapper.readTree(json).asInstanceOf[ArrayNode].asScala.map { e =>
      e.get("field-id").asInt ->
        e.withArray[ArrayNode]("names").asScala.map(_.asText).toSeq
    }.toMap

  def render(m: Map[Int, Seq[String]]): String = {
    val root = mapper.createArrayNode()
    m.toSeq.sortBy(_._1).foreach { case (id, names) =>
      val e = mapper.createObjectNode()
      e.put("field-id", id)
      val arr = e.withArray[ArrayNode]("names")
      names.foreach(arr.add)
      root.add(e)
    }
    root.toString
  }

  /** The name an id-less file is expected to carry for field `id`: the
    * FIRST mapped name, or a reserved never-present name for unmapped ids
    * (fields added after the import must read null, and must not capture a
    * same-named column the file still carries from before a drop/re-add). */
  def resolvedName(mapping: Map[Int, Seq[String]], id: Int): String =
    mapping.get(id).flatMap(_.headOption).getOrElse(s"__graft_unmapped_$id")
}
