package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.IcebergViews

/** Iceberg VIEW spec (v1) through Spark's ViewCatalog: CREATE / SELECT /
  * CREATE OR REPLACE (versions append, history auditable) / ALTER
  * properties / RENAME / DROP / SHOW VIEWS, views and tables coexisting
  * in one warehouse without cross-resolution. */
class IcebergViewsSpec extends AnyFunSuite {

  lazy val (spark: SparkSession, cat: String, wh: String) = {
    // the view SQL surface lives in GraftExtensions — build a session that
    // CARRIES them (shared context; cleared actives so getOrCreate builds
    // fresh instead of reusing an extension-less sibling)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    val w = java.nio.file.Files.createTempDirectory("graft_views").toString
    val c = s"vc${w.hashCode.toHexString}"
    s.conf.set(s"spark.sql.catalog.$c", "graft.sources.GraftIcebergPathCatalog")
    s.conf.set(s"spark.sql.catalog.$c.warehouse", w)
    s.sql(s"CREATE TABLE $c.db.base (k BIGINT, v STRING)")
    s.sql(s"INSERT INTO $c.db.base VALUES (1,'a'), (2,'b'), (3,'c'), (4,'d')")
    (s, c, w)
  }

  test("CREATE VIEW + SELECT resolve through the view catalog") {
    spark.sql(s"CREATE VIEW $cat.db.big AS SELECT k, v FROM $cat.db.base WHERE k > 2")
    assert(spark.sql(s"SELECT * FROM $cat.db.big ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(3L, 4L))
    // the view sees table CHANGES (a view is a definition, not a snapshot)
    spark.sql(s"INSERT INTO $cat.db.base VALUES (9,'z')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.big").head.getLong(0) == 3)

    // spec-conformant metadata on disk: view-uuid, one version, sql rep
    val m = IcebergViews.load(spark, s"$wh/db/big")
    assert(m.formatVersion == 1 && m.versions.size == 1)
    assert(m.currentVersion.sql.toLowerCase.contains("where k > 2"))
    assert(m.currentVersion.dialect == "spark")
  }

  test("CREATE OR REPLACE appends a version; history stays auditable") {
    spark.sql(s"CREATE VIEW $cat.db.r AS SELECT k FROM $cat.db.base WHERE k = 1")
    spark.sql(s"CREATE OR REPLACE VIEW $cat.db.r AS " +
      s"SELECT k, v FROM $cat.db.base WHERE k = 2")
    val got = spark.sql(s"SELECT * FROM $cat.db.r").collect()
    assert(got.length == 1 && got.head.getLong(0) == 2L)

    val m = IcebergViews.load(spark, s"$wh/db/r")
    assert(m.currentVersionId == 2)
    assert(m.versions.map(_.versionId) == Seq(1, 2), "replace must APPEND")
    assert(m.versionAt(1).sql.contains("k = 1"), "v1 stays auditable")
    assert(m.versionLog.map(_._2) == Seq(1, 2))
    // the schema changed (1 col -> 2 cols): a second schema registered
    assert(m.schemas.size == 2)
    assert(m.schemaFor(m.versionAt(1)).fields.map(_.name) == Seq("k"))
  }

  test("ALTER VIEW properties; SHOW VIEWS; rename; drop") {
    spark.sql(s"CREATE VIEW $cat.db.p AS SELECT k FROM $cat.db.base")
    spark.sql(s"ALTER VIEW $cat.db.p SET TBLPROPERTIES ('note'='audit')")
    val m = IcebergViews.load(spark, s"$wh/db/p")
    assert(m.properties.get("note").contains("audit"))
    assert(m.currentVersionId == 1, "property change is NOT a new version")
    spark.sql(s"ALTER VIEW $cat.db.p UNSET TBLPROPERTIES ('note')")
    assert(!IcebergViews.load(spark, s"$wh/db/p").properties.contains("note"))

    assert(spark.sql(s"SHOW VIEWS IN $cat.db").collect()
      .map(_.getString(1)).contains("p"))
    // SHOW TABLES must NOT list views
    assert(!spark.sql(s"SHOW TABLES IN $cat.db").collect()
      .map(_.getString(1)).contains("p"))

    spark.sql(s"ALTER VIEW $cat.db.p RENAME TO db.p2")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.p2").head.getLong(0) == 5)
    spark.sql(s"DROP VIEW $cat.db.p2")
    intercept[Exception] { spark.sql(s"SELECT * FROM $cat.db.p2").collect() }
  }

  test("ALTER VIEW ... AS appends a version like CREATE OR REPLACE; " +
      "refuses a missing view; SHOW VIEWS LIKE treats metachars literally") {
    spark.sql(s"CREATE VIEW $cat.db.av AS SELECT k FROM $cat.db.base WHERE k = 1")
    spark.sql(s"ALTER VIEW $cat.db.av AS SELECT k, v FROM $cat.db.base WHERE k = 3")
    val got = spark.sql(s"SELECT * FROM $cat.db.av").collect()
    assert(got.length == 1 && got.head.getLong(0) == 3L)
    val m = IcebergViews.load(spark, s"$wh/db/av")
    assert(m.currentVersionId == 2)
    assert(m.versions.map(_.versionId) == Seq(1, 2), "ALTER-AS must APPEND")
    assert(m.versionAt(1).sql.contains("k = 1"), "v1 stays auditable")
    // redefining a view that does not exist refuses (ALTER, not CREATE)
    val e = intercept[Exception] {
      spark.sql(s"ALTER VIEW $cat.db.no_such AS SELECT 1 AS one")
    }
    assert(e.getMessage.toLowerCase.contains("view"))
    // SHOW VIEWS LIKE: '*' wildcards; '[' and '.' are literal, not regex
    assert(spark.sql(s"SHOW VIEWS IN $cat.db LIKE 'a*'").collect()
      .map(_.getString(1)).contains("av"))
    assert(spark.sql(s"SHOW VIEWS IN $cat.db LIKE 'v['").collect().isEmpty,
      "a regex metacharacter pattern must not throw or over-match")
  }

  test("DESCRIBE and SHOW CREATE TABLE work on views") {
    spark.sql(s"CREATE VIEW $cat.db.dv AS SELECT k, v FROM $cat.db.base WHERE k > 1")
    spark.sql(s"ALTER VIEW $cat.db.dv SET TBLPROPERTIES ('team'='data')")
    val desc = spark.sql(s"DESCRIBE $cat.db.dv").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(desc.toSeq == Seq(("k", "bigint"), ("v", "string")))
    val ext = spark.sql(s"DESCRIBE EXTENDED $cat.db.dv").collect()
      .map(_.getString(0))
    assert(ext.contains("# Detailed View Information") &&
      ext.contains("View Text"))
    val stmt = spark.sql(s"SHOW CREATE TABLE $cat.db.dv")
      .head().getString(0)
    assert(stmt.startsWith("CREATE VIEW") && stmt.contains("k BIGINT") &&
      stmt.contains("WHERE k > 1") && stmt.contains("'team' = 'data'"),
      s"reconstructed DDL incomplete:\n$stmt")
    spark.sql(s"DROP VIEW $cat.db.dv")
  }

  test("views and tables never cross-resolve") {
    spark.sql(s"CREATE VIEW $cat.db.vx AS SELECT k FROM $cat.db.base")
    // the table path must refuse a view loudly, not read it as empty
    val e = intercept[Exception] {
      graft.iceberg.IcebergTable.load(spark, s"$wh/db/vx")
    }
    assert(e.getMessage.contains("VIEW"))
    // CREATE TABLE over an existing view name refuses
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.db.vx (x BIGINT)")
    }
    // CREATE VIEW over an existing table name refuses
    intercept[Exception] {
      spark.sql(s"CREATE VIEW $cat.db.base AS SELECT 1 AS one")
    }
  }
}
