package graft.iceberg

import org.scalacheck.{Gen, Prop, Properties}

import graft.iceberg.Manifests.{DataFileInfo, ManifestFile, PartitionFieldSummary}
import graft.iceberg.Pruning._

/** SOUNDNESS fuzz for the pruning engine: for random row sets and random
  * predicate trees, a file (or manifest) that CONTAINS a matching row must
  * never be pruned. Files carry exact column bounds plus hidden-partition
  * values (bucket + truncate transforms), manifests carry the derived
  * partition-field summaries — so every evidence tier the pruner reads
  * (bounds, partition values, summaries, null/NaN counts) is exercised
  * against a brute-force row evaluator with Spark/Iceberg comparison
  * semantics (null comparisons never match; NaN sorts above everything
  * and equals itself — `java.lang.Double.compare` exactly).
  *
  * Completeness (pruning as much as possible) is PruningSpec's truth
  * table; this spec pins the one property a wrong answer hides behind. */
object PruningPropSpec extends Properties("PruningSoundness") {

  // ------------------------------------------------------------ data model

  /** x: long (id 1, bucket[4]-partitioned), s: string (id 2,
    * truncate[2]-partitioned), d: double (id 3, unpartitioned, may be
    * NaN), ts: timestamp micros (id 4, day-partitioned — the
    * ORDER-PRESERVING time-transform rewrite, where range predicates DO
    * push through the transform). */
  final case class Row(x: Option[Long], s: Option[String], d: Option[Double],
      ts: Option[Long])

  private val spec = PartitionSpec(0, Seq(
    PartitionField(1, 1000, "x_bucket", "bucket[4]"),
    PartitionField(2, 1001, "s_trunc", "truncate[2]"),
    PartitionField(4, 1002, "ts_day", "day")))

  private val ctx = Context(
    Map("x" -> FieldInfo(1, "x", "long"),
      "s" -> FieldInfo(2, "s", "string"),
      "d" -> FieldInfo(3, "d", "double"),
      "ts" -> FieldInfo(4, "ts", "timestamp")),
    spec)

  private val bucket = Transforms.Bucket(4)
  private val trunc = Transforms.Truncate(2)
  private val day = Transforms.Day

  private def partitionOf(r: Row): Map[String, Any] = Map(
    "x_bucket" -> r.x.flatMap(v => bucket(v, "long")).orNull,
    "s_trunc" -> r.s.flatMap(v => trunc(v, "string")).orNull,
    "ts_day" -> r.ts.flatMap(v => day(v, "timestamp")).orNull)

  private def enc(v: Any, t: String): Array[Byte] =
    IcebergTypes.encodeBound(IcebergTypes.normalizeLiteral(v, t), t)

  /** Exact per-file stats from the rows — what a truthful writer records.
    * Double bounds EXCLUDE NaN (parquet/Iceberg bound semantics); NaN
    * presence lands in nan_value_counts instead. */
  private def fileOf(rows: Seq[Row]): DataFileInfo = {
    val xs = rows.flatMap(_.x)
    val ss = rows.flatMap(_.s)
    val ds = rows.flatMap(_.d).filterNot(_.isNaN)
    val tss = rows.flatMap(_.ts)
    val lower = Map.newBuilder[Int, Array[Byte]]
    val upper = Map.newBuilder[Int, Array[Byte]]
    if (xs.nonEmpty) { lower += 1 -> enc(xs.min, "long"); upper += 1 -> enc(xs.max, "long") }
    if (ss.nonEmpty) { lower += 2 -> enc(ss.min, "string"); upper += 2 -> enc(ss.max, "string") }
    if (ds.nonEmpty) { lower += 3 -> enc(ds.min, "double"); upper += 3 -> enc(ds.max, "double") }
    if (tss.nonEmpty) { lower += 4 -> enc(tss.min, "timestamp"); upper += 4 -> enc(tss.max, "timestamp") }
    DataFileInfo("f.parquet", "PARQUET", partitionOf(rows.head),
      rows.size.toLong, 1000L,
      Map.empty,
      Map(1 -> rows.size.toLong, 2 -> rows.size.toLong, 3 -> rows.size.toLong,
        4 -> rows.size.toLong),
      Map(1 -> rows.count(_.x.isEmpty).toLong,
        2 -> rows.count(_.s.isEmpty).toLong,
        3 -> rows.count(_.d.isEmpty).toLong,
        4 -> rows.count(_.ts.isEmpty).toLong),
      Map(3 -> rows.count(_.d.exists(_.isNaN)).toLong),
      lower.result(), upper.result())
  }

  /** Manifest partition-field summaries over the files' partition tuples —
    * what a truthful manifest writer records (bounds over the TRANSFORMED
    * values, in spec-field order). */
  private def manifestOf(files: Seq[DataFileInfo]): ManifestFile = {
    implicit val anyOrd: Ordering[Any] = new Ordering[Any] {
      def compare(a: Any, b: Any): Int = (a, b) match {
        case (x: Int, y: Int) => Integer.compare(x, y)
        case (x: Long, y: Long) => java.lang.Long.compare(x, y)
        case (x: String, y: String) => x.compareTo(y)
        case _ => throw new IllegalStateException(
          s"unexpected partition types $a/$b")
      }
    }
    def summary(name: String, boundType: String): PartitionFieldSummary = {
      val vs = files.map(_.partition(name)).filter(_ != null)
      PartitionFieldSummary(
        containsNull = files.exists(_.partition(name) == null),
        containsNan = None,
        lowerBound = if (vs.isEmpty) None else Some(enc(vs.min, boundType)),
        upperBound = if (vs.isEmpty) None else Some(enc(vs.max, boundType)))
    }
    ManifestFile("m.avro", 1L, 0, None,
      Seq(summary("x_bucket", "int"), summary("s_trunc", "string"),
        summary("ts_day", "int")),
      Some(files.size), Some(0), Some(0), None, None, None)
  }

  // ---------------------------------------------------- brute-force truth

  private def cmpVals(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: String, y: String) => x.compareTo(y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case _ => throw new IllegalStateException(s"type mix $a/$b")
  }

  private def colOf(r: Row, c: String): Option[Any] = c match {
    case "x" => r.x
    case "s" => r.s
    case "d" => r.d
    case "ts" => r.ts
  }

  /** Row-level truth with SQL null semantics (null operand never matches). */
  def rowMatches(p: IcePredicate, r: Row): Boolean = p match {
    case AlwaysTrue => true
    case And(l, rr) => rowMatches(l, r) && rowMatches(rr, r)
    case Or(l, rr) => rowMatches(l, r) || rowMatches(rr, r)
    case IsNull(c) => colOf(r, c).isEmpty
    case NotNull(c) => colOf(r, c).nonEmpty
    case Eq(c, v) => colOf(r, c).exists(cmpVals(_, v) == 0)
    case NotEq(c, v) => colOf(r, c).exists(cmpVals(_, v) != 0)
    case Lt(c, v) => colOf(r, c).exists(cmpVals(_, v) < 0)
    case LtEq(c, v) => colOf(r, c).exists(cmpVals(_, v) <= 0)
    case Gt(c, v) => colOf(r, c).exists(cmpVals(_, v) > 0)
    case GtEq(c, v) => colOf(r, c).exists(cmpVals(_, v) >= 0)
    case In(c, vs) => colOf(r, c).exists(x => vs.exists(cmpVals(x, _) == 0))
  }

  // ------------------------------------------------------------ generators

  private val genRow: Gen[Row] = for {
    x <- Gen.frequency(9 -> Gen.choose(-50L, 50L).map(Some(_)),
      1 -> Gen.const(None))
    s <- Gen.frequency(9 -> Gen.oneOf("", "a", "ab", "abc", "abd", "b",
      "bc", "z", "zz").map(Some(_)), 1 -> Gen.const(None))
    d <- Gen.frequency(8 -> Gen.choose(-50.0, 50.0).map(Some(_)),
      1 -> Gen.const(Some(Double.NaN)), 1 -> Gen.const(None))
    // +-5 days of epoch micros, clustered so several rows share a day
    // (and some straddle midnight) while negatives exercise floorDiv
    ts <- Gen.frequency(9 -> Gen.choose(-5L * 86400000000L, 5L * 86400000000L)
      .map(v => Some(v - v % 3600000000L)), 1 -> Gen.const(None))
  } yield Row(x, s, d, ts)

  private val genLeaf: Gen[IcePredicate] = {
    val xLit: Gen[Any] = Gen.choose(-55L, 55L).map(identity[Any])
    val sLit: Gen[Any] = Gen.oneOf("", "a", "ab", "abc", "abd", "b", "bc",
      "z", "zz", "aa").map(identity[Any])
    val dLit: Gen[Any] = Gen.frequency(
      9 -> Gen.choose(-55.0, 55.0).map(identity[Any]),
      1 -> Gen.const(Double.NaN: Any))
    val tsLit: Gen[Any] = Gen.choose(-6L * 86400000000L, 6L * 86400000000L)
      .map(v => (v - v % 3600000000L): Any)
    def leafFor(c: String, lit: Gen[Any]): Gen[IcePredicate] = Gen.frequency(
      2 -> lit.map(Eq(c, _)), 2 -> lit.map(NotEq(c, _)),
      2 -> lit.map(Lt(c, _)), 2 -> lit.map(LtEq(c, _)),
      2 -> lit.map(Gt(c, _)), 2 -> lit.map(GtEq(c, _)),
      2 -> Gen.nonEmptyListOf(lit).map(vs => In(c, vs.take(4))),
      1 -> Gen.const(IsNull(c)), 1 -> Gen.const(NotNull(c)))
    Gen.oneOf(leafFor("x", xLit), leafFor("s", sLit), leafFor("d", dLit),
      leafFor("ts", tsLit))
  }

  private def genPred(depth: Int): Gen[IcePredicate] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      5 -> genLeaf,
      2 -> Gen.zip(genPred(depth - 1), genPred(depth - 1))
        .map { case (l, r) => And(l, r) },
      2 -> Gen.zip(genPred(depth - 1), genPred(depth - 1))
        .map { case (l, r) => Or(l, r) })

  private val genCase: Gen[(List[Row], IcePredicate)] =
    Gen.zip(Gen.choose(1, 30).flatMap(Gen.listOfN(_, genRow)), genPred(2))

  // ------------------------------------------------------------ properties

  /** Files are partition-homogeneous (as a real writer lays them out):
    * group rows by partition tuple, one file each. */
  private def filesOf(rows: List[Row]): Seq[(Seq[Row], DataFileInfo)] =
    rows.groupBy(partitionOf).values.map(g => (g: Seq[Row], fileOf(g))).toSeq

  property("a file containing a matching row is never pruned " +
      "(bounds + partition-value tiers)") =
    Prop.forAll(genCase) { case (rows, pred) =>
      filesOf(rows).forall { case (group, file) =>
        val hasMatch = group.exists(rowMatches(pred, _))
        val kept = fileMightMatch(pred, file, ctx)
        val ok = !hasMatch || kept
        if (!ok) println(s"UNSOUND file prune: pred=$pred rows=$group " +
          s"partition=${file.partition}")
        ok
      }
    }

  property("a manifest containing a matching row is never pruned " +
      "(partition-summary tier)") =
    Prop.forAll(genCase) { case (rows, pred) =>
      val files = filesOf(rows)
      val manifest = manifestOf(files.map(_._2))
      val hasMatch = rows.exists(rowMatches(pred, _))
      val kept = manifestMightMatch(pred, manifest, ctx)
      val ok = !hasMatch || kept
      if (!ok) println(s"UNSOUND manifest prune: pred=$pred rows=$rows " +
        s"summaries=${manifest.partitions}")
      ok
    }

  /** Anti-vacuity pin: the day-partition tier PRUNES when it should — a
    * bounds-free file whose rows all live on one day must be dropped by a
    * range predicate on the other side of that day (soundness alone would
    * also pass by never pruning anything). */
  property("day-partition tier prunes a bounds-free file on the wrong day") =
    Prop.forAll(Gen.choose(2L, 5L)) { dayN =>
      val micros = dayN * 86400000000L + 3600000000L // inside day N
      val row = Row(Some(1L), Some("a"), Some(1.0), Some(micros))
      val file = fileOf(Seq(row)).copy(
        lowerBounds = Map.empty, upperBounds = Map.empty)
      !fileMightMatch(Lt("ts", 86400000000L - 1L), file, ctx) && // day 0
        fileMightMatch(GtEq("ts", micros - 1L), file, ctx) &&
        !manifestMightMatch(Lt("ts", 86400000000L - 1L),
          manifestOf(Seq(file)), ctx)
    }

  /** DNF round-trip: building the same predicate through the reference's
    * tuple form (`fromDnf`) changes nothing about soundness decisions. */
  property("fromDnf(tuples) evaluates like the hand-built tree") =
    Prop.forAll(genCase) { case (rows, _) =>
      val dnf = fromDnf(Seq(
        Seq(("x", ">=", -10L), ("s", "!=", "zz")),
        Seq(("d", "<", 0.0))))
      val tree = Or(And(GtEq("x", -10L), NotEq("s", "zz")), Lt("d", 0.0))
      filesOf(rows).forall { case (_, file) =>
        fileMightMatch(dnf, file, ctx) == fileMightMatch(tree, file, ctx)
      }
    }
}
