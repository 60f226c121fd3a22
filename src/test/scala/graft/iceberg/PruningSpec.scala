package graft.iceberg

import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.Manifests.DataFileInfo
import graft.iceberg.Pruning._

class PruningSpec extends AnyFunSuite {

  private def leLong(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putLong(v).array()

  private def fileWithBounds(id: Int, min: Long, max: Long,
      nulls: Long = 0, total: Long = 10): DataFileInfo =
    DataFileInfo("f.parquet", "PARQUET", Map.empty, total, 1000,
      Map.empty, Map(id -> total), Map(id -> nulls), Map.empty,
      Map(id -> leLong(min)), Map(id -> leLong(max)))

  private val ctx = Context(
    Map("x" -> FieldInfo(1, "x", "long"), "s" -> FieldInfo(2, "s", "string")),
    PartitionSpec(0, Nil))

  test("range truth table for all operators") {
    val f = fileWithBounds(1, 10, 20)
    // (predicate, expected keep)
    val cases: Seq[(IcePredicate, Boolean)] = Seq(
      Eq("x", 15) -> true, Eq("x", 10) -> true, Eq("x", 20) -> true,
      Eq("x", 9) -> false, Eq("x", 21) -> false,
      NotEq("x", 15) -> true, NotEq("x", 10) -> true,
      Lt("x", 10) -> false, Lt("x", 11) -> true, Lt("x", 9) -> false,
      LtEq("x", 10) -> true, LtEq("x", 9) -> false,
      Gt("x", 20) -> false, Gt("x", 19) -> true, Gt("x", 21) -> false,
      GtEq("x", 20) -> true, GtEq("x", 21) -> false,
      In("x", Seq(1, 2, 15)) -> true, In("x", Seq(1, 2, 3)) -> false,
      And(GtEq("x", 10), LtEq("x", 20)) -> true,
      And(Gt("x", 20), Lt("x", 10)) -> false,
      Or(Gt("x", 100), Lt("x", 11)) -> true,
      Or(Gt("x", 100), Lt("x", 5)) -> false,
      AlwaysTrue -> true)
    for ((p, expect) <- cases)
      assert(fileMightMatch(p, f, ctx) == expect, s"pred $p")
  }

  test("notEq prunes only constant files") {
    val const = fileWithBounds(1, 7, 7)
    assert(!fileMightMatch(NotEq("x", 7), const, ctx))
    assert(fileMightMatch(NotEq("x", 8), const, ctx))
  }

  test("null count evidence") {
    val noNulls = fileWithBounds(1, 0, 5, nulls = 0, total = 10)
    val allNulls = fileWithBounds(1, 0, 5, nulls = 10, total = 10)
    assert(!fileMightMatch(IsNull("x"), noNulls, ctx))
    assert(fileMightMatch(IsNull("x"), allNulls, ctx))
    assert(fileMightMatch(NotNull("x"), noNulls, ctx))
    assert(!fileMightMatch(NotNull("x"), allNulls, ctx))
  }

  test("missing stats keep the file (soundness)") {
    val bare = DataFileInfo("f", "PARQUET", Map.empty, 1, 1,
      Map.empty, Map.empty, Map.empty, Map.empty, Map.empty, Map.empty)
    assert(fileMightMatch(Eq("x", 5), bare, ctx))
    assert(fileMightMatch(Eq("unknown_col", 5), bare, ctx))
  }

  test("identity partition value acts as min=max") {
    val specCtx = Context(ctx.fieldsByName,
      PartitionSpec(0, Seq(PartitionField(1, 1000, "x", "identity"))))
    val f = DataFileInfo("f", "PARQUET", Map("x" -> 42L), 1, 1,
      Map.empty, Map.empty, Map.empty, Map.empty, Map.empty, Map.empty)
    assert(fileMightMatch(Eq("x", 42), f, specCtx))
    assert(!fileMightMatch(Eq("x", 41), f, specCtx))
    assert(!fileMightMatch(Gt("x", 42), f, specCtx))
    assert(fileMightMatch(GtEq("x", 42), f, specCtx))
  }

  test("exhaustive soundness sweep: pruning never drops a file with a match") {
    // all ranges [min, min+span] × literals × ops × every value in the range:
    // if any in-range value satisfies the predicate, the file MUST be kept.
    for {
      min <- -5L to 5L
      span <- 0L to 4L
      max = min + span
      op <- Seq("==", "!=", "<", "<=", ">", ">=")
      lit <- -7L to 7L
    } {
      val f = fileWithBounds(1, min, max)
      val pred = fromOp("x", op, lit)
      val anyMatch = (min to max).exists { v =>
        op match {
          case "==" => v == lit
          case "!=" => v != lit
          case "<" => v < lit
          case "<=" => v <= lit
          case ">" => v > lit
          case ">=" => v >= lit
        }
      }
      if (anyMatch)
        assert(fileMightMatch(pred, f, ctx), s"[$min,$max] $op $lit wrongly pruned")
    }
  }

  test("DNF construction: AND list and OR of ANDs") {
    val f = fileWithBounds(1, 10, 20)
    val andPred = fromDnf(Seq(Seq(("x", ">", 5), ("x", "<", 15))))
    assert(fileMightMatch(andPred, f, ctx))
    val orPred = fromDnf(Seq(Seq(("x", ">", 100)), Seq(("x", "<", 15))))
    assert(fileMightMatch(orPred, f, ctx))
    val nonePred = fromDnf(Seq(Seq(("x", ">", 100)), Seq(("x", "<", 5))))
    assert(!fileMightMatch(nonePred, f, ctx))
  }

  test("in filter requires a collection (reference parity)") {
    assertThrows[IllegalArgumentException](fromOp("x", "in", 5))
  }

  test("string bounds") {
    val f = DataFileInfo("f", "PARQUET", Map.empty, 1, 1,
      Map.empty, Map.empty, Map.empty, Map.empty,
      Map(2 -> "apple".getBytes("UTF-8")), Map(2 -> "mango".getBytes("UTF-8")))
    assert(fileMightMatch(Eq("s", "banana"), f, ctx))
    assert(!fileMightMatch(Eq("s", "zebra"), f, ctx))
    assert(fileMightMatch(In("s", Seq("kiwi", "zebra")), f, ctx))
  }

  test("spark Filter translation") {
    import org.apache.spark.sql.sources
    assert(fromSparkFilter(sources.EqualTo("x", 5)).contains(Eq("x", 5)))
    assert(fromSparkFilter(sources.And(sources.GreaterThan("x", 1),
      sources.LessThan("x", 9))).contains(And(Gt("x", 1), Lt("x", 9))))
    assert(fromSparkFilter(sources.Or(sources.GreaterThan("x", 1),
      sources.StringContains("s", "q"))).isEmpty) // untranslatable OR arm drops whole Or
    assert(fromSparkFilter(sources.And(sources.GreaterThan("x", 1),
      sources.StringContains("s", "q"))).contains(Gt("x", 1))) // And keeps sound arm
  }
}
