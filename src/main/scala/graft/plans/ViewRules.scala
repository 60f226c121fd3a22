package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.iceberg.IcebergViews
import graft.sources.{GraftIcebergPathCatalog, GraftIcebergView}

/** SQL surface for ICEBERG VIEWS (view spec v1) on graft path catalogs.
  *
  * Vanilla Spark 4.1 parses the view DDL but ships NO execution for
  * V2-catalog views — `ResolveSessionCatalog` raises
  * MISSING_CATALOG_ABILITY for any non-session catalog, and nothing in the
  * analyzer ever calls `ViewCatalog.loadView`. This rule closes the gap
  * the way Iceberg's own Spark extension does: it rewrites the UNRESOLVED
  * view commands that target a [[GraftIcebergPathCatalog]] into driver-side
  * commands BEFORE the session-catalog rule can reject them (within one
  * fixed-point iteration: the reject matches only the RESOLVED identifier
  * form, which never materializes because this rewrite wins first), and it
  * expands `SELECT`s over view identifiers into the view's parsed body —
  * references qualified with the view's stored default catalog/namespace,
  * so the body resolves where the view was DEFINED (the spec's rule),
  * output columns re-aliased to the view schema's names.
  *
  * Indirect view cycles exhaust the analyzer's fixed point and fail loudly
  * (maxIterations); direct self-reference is refused with a clear error. */
case class GraftViewRules(spark: SparkSession) extends Rule[LogicalPlan] {

  /** Resolve `parts` against the session's catalog manager; Some only when
    * the target catalog is a graft path catalog (this rule never touches
    * session-catalog or other-catalog views). */
  private def viewTarget(parts: Seq[String])
      : Option[(GraftIcebergPathCatalog, Identifier)] = {
    if (parts.isEmpty) return None
    val cm = spark.sessionState.catalogManager
    val (catName, rest) =
      if (parts.length > 1 && cm.isCatalogRegistered(parts.head))
        (parts.head, parts.tail)
      else (cm.currentCatalog.name, parts)
    if (rest.isEmpty) return None
    try cm.catalog(catName) match {
      case c: GraftIcebergPathCatalog =>
        Some((c, Identifier.of(rest.init.toArray, rest.last)))
      case _ => None
    } catch { case _: Exception => None }
  }

  private def catalogNameOf(parts: Seq[String]): String = {
    val cm = spark.sessionState.catalogManager
    if (parts.length > 1 && cm.isCatalogRegistered(parts.head)) parts.head
    else cm.currentCatalog.name
  }

  /** DDL rewrite, applied AT PARSE TIME by [[GraftViewSqlParser]]: the
    * session-catalog rule rejects V2-catalog view DDL in the very first
    * resolution iteration (before any injected resolution rule can run),
    * so the unresolved command plans must be replaced before analysis
    * starts. */
  def rewriteDdl(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case c @ CreateView(UnresolvedIdentifier(parts, _), userCols, comment,
          _, props, originalText, query, allowExisting, replace, _) =>
        viewTarget(parts) match {
          case Some((cat, ident)) =>
            GraftCreateViewCommand(cat, ident, catalogNameOf(parts),
              originalText.getOrElse(throw new IllegalArgumentException(
                "CREATE VIEW without SQL text is not supported")),
              query, userCols.map(_._1), comment, props,
              allowExisting = allowExisting, replace = replace)
          case None => c
        }

      case a @ AlterViewAs(v: UnresolvedView, originalText, query) =>
        // ALTER VIEW … AS is CREATE OR REPLACE's second SQL spelling:
        // append a new view version (the old one stays auditable via
        // versionAt), but only for a view that already exists
        viewTarget(v.multipartIdentifier) match {
          case Some((cat, ident)) =>
            GraftCreateViewCommand(cat, ident,
              catalogNameOf(v.multipartIdentifier), originalText,
              query, Nil, None, Map.empty,
              allowExisting = false, replace = true, mustExist = true)
          case None => a
        }

      case d @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
        viewTarget(parts) match {
          case Some((cat, ident)) if cat.viewExists(ident) || !ifExists =>
            GraftDropViewCommand(cat, ident, ifExists)
          case Some(_) => LocalRelation(Nil) // IF EXISTS on a missing view
          case None => d
        }

      case s @ ShowViews(ns: UnresolvedNamespace, pattern, output) =>
        viewTarget(ns.multipartIdentifier :+ "?") match {
          case Some((cat, _)) =>
            // strip the catalog qualifier — listViews wants warehouse-
            // relative namespace parts
            val cm = spark.sessionState.catalogManager
            val nsParts =
              if (ns.multipartIdentifier.nonEmpty &&
                cm.isCatalogRegistered(ns.multipartIdentifier.head))
                ns.multipartIdentifier.tail
              else ns.multipartIdentifier
            GraftShowViewsCommand(cat, nsParts, pattern, output)
          case None => s
        }

      case s @ SetViewProperties(v: UnresolvedView, props) =>
        viewTarget(v.multipartIdentifier) match {
          case Some((cat, ident)) =>
            GraftAlterViewPropsCommand(cat, ident, props, Nil, ifExists = false)
          case None => s
        }

      case u @ UnsetViewProperties(v: UnresolvedView, keys, ifExists) =>
        viewTarget(v.multipartIdentifier) match {
          case Some((cat, ident)) =>
            GraftAlterViewPropsCommand(cat, ident, Map.empty, keys, ifExists)
          case None => u
        }

      case sc @ ShowCreateTable(
          v: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView,
          _, output) =>
        viewTarget(v.multipartIdentifier) match {
          case Some((cat, ident)) if cat.viewExists(ident) =>
            GraftShowCreateViewCommand(cat, ident,
              v.multipartIdentifier, output)
          case _ => sc
        }

      case de @ DescribeRelation(
          v: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView,
          partitionSpec, isExtended, output) =>
        viewTarget(v.multipartIdentifier) match {
          case Some((cat, ident))
              if cat.viewExists(ident) && partitionSpec.isEmpty =>
            GraftDescribeViewCommand(cat, ident, isExtended, output)
          case _ => de
        }

      case r @ RenameTable(child, newName, true) =>
        // ALTER VIEW … RENAME TO parses with an UnresolvedTableOrView child
        val parts = child match {
          case v: UnresolvedView => v.multipartIdentifier
          case v: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
            v.multipartIdentifier
          case _ => Nil
        }
        viewTarget(parts) match {
          case Some((cat, ident)) if cat.viewExists(ident) =>
            GraftRenameViewCommand(cat, ident,
              Identifier.of(newName.init.toArray, newName.last))
          case _ => r
        }
    }

  /** READ PATH (resolution rule): a relation identifier naming one of our
    * views expands into the view's parsed body. Safe in the fixed point —
    * nothing built-in resolves these identifiers first (they are not
    * tables), so there is no ordering race like the DDL one. */
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case rel: UnresolvedRelation if !rel.isStreaming =>
        viewTarget(rel.multipartIdentifier) match {
          case Some((cat, ident)) if cat.viewExists(ident) =>
            expandView(cat, ident, rel.multipartIdentifier)
          case _ => rel
        }
    }

  private def expandView(cat: GraftIcebergPathCatalog, ident: Identifier,
      parts: Seq[String]): LogicalPlan = {
    val view = cat.loadView(ident)
    val body = spark.sessionState.sqlParser.parsePlan(view.query)
    val defCat = Option(view.currentCatalog)
    val defNs = view.currentNamespace.toSeq
    // qualify the body's relation references with the view's DEFINITION
    // context, so they resolve where the view was created — and refuse
    // direct self-reference (indirect cycles abort at the analyzer's
    // fixed-point limit)
    val qualified = body.transformUp {
      case r: UnresolvedRelation if !r.isStreaming =>
        val full: Seq[String] = r.multipartIdentifier match {
          case Seq(one) => (defCat.toSeq ++ defNs) :+ one
          case more if defCat.isDefined &&
              !spark.sessionState.catalogManager.isCatalogRegistered(more.head) =>
            defCat.get +: more
          case more => more
        }
        if (full == parts || r.multipartIdentifier == parts)
          throw new UnsupportedOperationException(
            s"recursive view: ${parts.mkString(".")} references itself")
        r.copy(multipartIdentifier = full)
    }
    val aliased = {
      val names = view.schema().fieldNames.toSeq
      if (names.nonEmpty) UnresolvedSubqueryColumnAliases(names, qualified)
      else qualified
    }
    SubqueryAlias(parts.mkString("."), aliased)
  }
}

/** Parser wrapper applying [[GraftViewRules.rewriteDdl]] straight after the
  * delegate parses — the only interception point that deterministically
  * beats `ResolveSessionCatalog`'s V2-view rejection. Everything else
  * passes through untouched. */
class GraftViewSqlParser(spark: SparkSession,
    delegate: org.apache.spark.sql.catalyst.parser.ParserInterface)
  extends org.apache.spark.sql.catalyst.parser.ParserInterface {

  private lazy val rules = GraftViewRules(spark)

  override def parsePlan(sqlText: String): LogicalPlan =
    rules.rewriteDdl(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String) =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String) =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String) =
    delegate.parseDataType(sqlText)
  override def parseTableSchema(sqlText: String) =
    delegate.parseTableSchema(sqlText)
}

/** CREATE [OR REPLACE] VIEW — analyzes the body ONCE to capture the view's
  * schema (with user column aliases applied), then writes view metadata
  * versions through [[IcebergViews]]. */
final case class GraftCreateViewCommand(cat: GraftIcebergPathCatalog,
    ident: Identifier, catalogName: String, sql: String, query: LogicalPlan,
    userCols: Seq[String], comment: Option[String],
    props: Map[String, String], allowExisting: Boolean, replace: Boolean,
    /** ALTER VIEW … AS: redefinition of an EXISTING view only. */
    mustExist: Boolean = false)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(session: SparkSession): Seq[Row] = {
    val exists = cat.viewExists(ident)
    if (mustExist && !exists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    if (exists && allowExisting) return Nil
    if (exists && !replace)
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(ident)
    val analyzed = session.sessionState.executePlan(query).analyzed
    val bodyNames = analyzed.schema.fieldNames.toSeq
    if (userCols.nonEmpty) require(userCols.size == bodyNames.size,
      s"view column list has ${userCols.size} names for ${bodyNames.size} columns")
    val schema = StructType(analyzed.schema.fields.zipWithIndex.map {
      case (f, i) =>
        StructField(if (userCols.nonEmpty) userCols(i) else f.name,
          f.dataType, f.nullable)
    })
    val cm = session.sessionState.catalogManager
    val url = cat.viewLocation(ident)
    val properties =
      comment.map(org.apache.spark.sql.connector.catalog.ViewCatalog
        .PROP_COMMENT -> _).toMap ++
      props ++
      Map(GraftIcebergView.QueryColumnNames -> bodyNames.mkString(",")) ++
      (if (userCols.nonEmpty)
        Map(GraftIcebergView.ColumnAliases -> userCols.mkString(","))
      else Map.empty)
    // the body resolves under the catalog/namespace CURRENT at creation
    val defNs = cm.currentNamespace.toSeq
    if (exists)
      IcebergViews.replace(session, url, sql, schema,
        Some(catalogName), defNs, properties)
    else
      IcebergViews.create(session, url, sql, schema,
        Some(catalogName), defNs, properties)
    Nil
  }
}

final case class GraftDropViewCommand(cat: GraftIcebergPathCatalog,
    ident: Identifier, ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (!cat.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    Nil
  }
}

final case class GraftShowViewsCommand(cat: GraftIcebergPathCatalog,
    namespace: Seq[String], pattern: Option[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    // Spark's own SHOW-command matcher: '*' wildcards, '|'-separated
    // alternatives, every other character LITERAL (a pattern like 'v[' must
    // not throw or over-match as a regex would)
    val names = cat.listViews(namespace: _*).toSeq.map(_.name)
    val kept = pattern match {
      case Some(p) => org.apache.spark.sql.catalyst.util.StringUtils
        .filterPattern(names, p).toSet
      case None => names.toSet
    }
    names.filter(kept).sorted
      .map(n => Row(namespace.mkString("."), n, false))
  }
}

/** SHOW CREATE TABLE on a view: reconstruct the CREATE VIEW statement
  * from the current version (column list from the stored view schema, the
  * original body SQL, user properties — internal round-trip keys and
  * reserved metadata excluded). */
final case class GraftShowCreateViewCommand(cat: GraftIcebergPathCatalog,
    ident: Identifier, parts: Seq[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val view = cat.loadView(ident)
    val cols = view.schema().fields
      .map(f => s"  ${quote(f.name)} ${f.dataType.sql}").mkString(",\n")
    val hidden = Set(GraftIcebergView.QueryColumnNames,
      GraftIcebergView.ColumnAliases, GraftIcebergView.ColumnComments,
      "format-version", "view-uuid", "current-version-id",
      org.apache.spark.sql.connector.catalog.ViewCatalog.PROP_COMMENT)
    import scala.jdk.CollectionConverters._
    val props = view.properties().asScala.toSeq
      .filterNot { case (k, _) => hidden(k) }.sortBy(_._1)
    val comment = Option(view.properties().get(
      org.apache.spark.sql.connector.catalog.ViewCatalog.PROP_COMMENT))
      .map(c => s"COMMENT '${c.replace("'", "''")}'\n").getOrElse("")
    val tbl = if (props.isEmpty) "" else
      props.map { case (k, v) => s"'$k' = '${v.replace("'", "''")}'" }
        .mkString("TBLPROPERTIES (\n  ", ",\n  ", ")\n")
    val stmt = s"CREATE VIEW ${parts.map(quote).mkString(".")} (\n$cols)\n" +
      comment + tbl + s"AS\n${view.query}\n"
    Seq(Row(stmt))
  }
  private def quote(n: String): String =
    if (n.matches("[a-zA-Z_][a-zA-Z0-9_]*")) n
    else "`" + n.replace("`", "``") + "`"
}

/** DESCRIBE [EXTENDED] on a view: the schema rows, plus the detailed view
  * section (text, definition context, properties) when extended. */
final case class GraftDescribeViewCommand(cat: GraftIcebergPathCatalog,
    ident: Identifier, isExtended: Boolean,
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val view = cat.loadView(ident)
    val schemaRows = view.schema().fields.toSeq
      .map(f => Row(f.name, f.dataType.simpleString, null))
    if (!isExtended) schemaRows
    else {
      import scala.jdk.CollectionConverters._
      val ctx = (Option(view.currentCatalog()).toSeq ++
        view.currentNamespace().toSeq).mkString(".")
      schemaRows ++ Seq(
        Row("", "", ""),
        Row("# Detailed View Information", "", ""),
        Row("Name", view.name(), ""),
        Row("View Text", view.query(), ""),
        Row("View Catalog and Namespace", ctx, ""),
        Row("View Query Output Columns",
          view.queryColumnNames().mkString("[", ", ", "]"), ""),
        Row("View Properties",
          view.properties().asScala.toSeq.sortBy(_._1)
            .map { case (k, v) => s"$k=$v" }.mkString("[", ", ", "]"), ""))
    }
  }
}

final case class GraftAlterViewPropsCommand(cat: GraftIcebergPathCatalog,
    ident: Identifier, set: Map[String, String], unset: Seq[String],
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (!cat.viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    IcebergViews.updateProperties(session, cat.viewLocation(ident), set, unset)
    Nil
  }
}

final case class GraftRenameViewCommand(cat: GraftIcebergPathCatalog,
    from: Identifier, to: Identifier) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    cat.renameView(from, to)
    Nil
  }
}
