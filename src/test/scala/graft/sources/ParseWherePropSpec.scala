package graft.sources

import org.scalacheck.{Gen, Prop, Properties}

import graft.iceberg.Pruning._

/** Round-trip fuzz for the `where` file-selector grammar: any predicate
  * tree the [[graft.iceberg.Pruning.IcePredicate]] ADT can express renders
  * to SQL and parses back STRUCTURALLY IDENTICAL through
  * [[GraftProcedures.parseWhere]] — so no corner of the grammar silently
  * drops, flips, or re-associates a condition. Literals are generated
  * decimal-exact (quarters) so the SQL text round-trips bit-for-bit. */
object ParseWherePropSpec extends Properties("ParseWhereRoundTrip") {

  // ------------------------------------------------------------ renderer

  private def sqlLit(v: Any): String = v match {
    case s: String => "'" + s.replace("'", "''") + "'"
    // Locale.ROOT: a comma-decimal default locale must not break the SQL
    case d: Double => if (d == d.floor && !d.isInfinite)
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(d))
    else d.toString
    case b: Boolean => b.toString
    case other => other.toString
  }

  private def render(p: IcePredicate): String = p match {
    case Eq(c, v) => s"$c = ${sqlLit(v)}"
    case NotEq(c, v) => s"$c != ${sqlLit(v)}"
    case Lt(c, v) => s"$c < ${sqlLit(v)}"
    case LtEq(c, v) => s"$c <= ${sqlLit(v)}"
    case Gt(c, v) => s"$c > ${sqlLit(v)}"
    case GtEq(c, v) => s"$c >= ${sqlLit(v)}"
    case In(c, vs) => s"$c IN (${vs.map(sqlLit).mkString(", ")})"
    case IsNull(c) => s"$c IS NULL"
    case NotNull(c) => s"$c IS NOT NULL"
    case And(l, r) => s"(${render(l)} AND ${render(r)})"
    case Or(l, r) => s"(${render(l)} OR ${render(r)})"
    case AlwaysTrue => "true = true" // not renderable as a leaf; unused
  }

  // ------------------------------------------------------------ generator

  private val genCol: Gen[String] = Gen.oneOf("k", "price", "cat", "flag")

  private val genLit: Gen[Any] = Gen.oneOf(
    Gen.choose(-1000L, 1000L).map(identity[Any]),
    // quarters: decimal-exact in both the SQL text and the double
    Gen.choose(-400L, 400L).map(n => (n / 4.0): Any),
    Gen.oneOf("a", "b c", "it's", "", "z'z").map(identity[Any]))

  private val genLeaf: Gen[IcePredicate] = for {
    c <- genCol
    l <- genLit
    p <- Gen.oneOf[IcePredicate](Eq(c, l), NotEq(c, l), Lt(c, l), LtEq(c, l),
      Gt(c, l), GtEq(c, l), IsNull(c), NotNull(c))
    withIn <- Gen.frequency(
      4 -> Gen.const(p),
      1 -> Gen.nonEmptyListOf(genLit).map(vs => In(c, vs.take(4))))
  } yield withIn

  private def genPred(depth: Int): Gen[IcePredicate] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      4 -> genLeaf,
      2 -> Gen.zip(genPred(depth - 1), genPred(depth - 1))
        .map { case (l, r) => And(l, r) },
      2 -> Gen.zip(genPred(depth - 1), genPred(depth - 1))
        .map { case (l, r) => Or(l, r) })

  // ------------------------------------------------------------ properties

  property("render -> parseWhere is the identity on predicate trees") =
    Prop.forAll(genPred(3)) { p =>
      val sql = render(p)
      val back = GraftProcedures.parseWhere(sql)
      if (back != p) println(s"ROUND-TRIP DRIFT:\n  in:   $p\n  sql:  $sql\n  back: $back")
      back == p
    }

  property("literal-first comparisons flip onto the column") =
    Prop.forAll(genCol, Gen.choose(-1000L, 1000L)) { (c, v) =>
      GraftProcedures.parseWhere(s"$v < $c") == Gt(c, v) &&
        GraftProcedures.parseWhere(s"$v >= $c") == LtEq(c, v) &&
        GraftProcedures.parseWhere(s"$v = $c") == Eq(c, v)
    }

  property("out-of-grammar constructs refuse loudly, never mis-select") =
    Prop.forAll(genCol, genCol) { (a, b) =>
      def refuses(s: String): Boolean =
        try { GraftProcedures.parseWhere(s); false }
        catch { case _: IllegalArgumentException => true }
      (a == b) || (refuses(s"$a = $b") && // column-to-column
        refuses(s"$a + 1 = 2") &&         // arithmetic
        refuses(s"upper($a) = 'X'") &&    // functions
        refuses(s"$a = NULL"))            // null comparison literal
    }
}
