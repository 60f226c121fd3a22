package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row, attach the most recent right
  * row with the same key whose time is ≤ the left row's time.
  *
  * Spark has no built-in as-of join; rather than a custom physical operator,
  * this composes the classic union + ordered-window formulation:
  * both sides are unioned with a side tag, sorted within key partitions by
  * (time, side), and each left row picks the running `last` non-null right
  * payload. ONE shuffle on the join key, no point-in-time cross products —
  * the standard scalable shape (equivalent plans survive 1000-executor
  * scale-ups because the window is a single sort-merge pass per key).
  *
  * Matches DuckDB `ASOF LEFT JOIN` semantics (greatest right.time ≤
  * left.time; right rows at equal time DO match).
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param key        equi-join key column name (same name both sides)
    * @param leftTime   left ordering column name
    * @param rightTime  right ordering column name
    * @param rightCols  right payload columns to attach (null when no match)
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // unify: (key, t, side, left payload..., right payload...)
    val l = left.select(
      (col(key).as("__k") +: col(leftTime).as("__t") +: lit(0).as("__side") +:
        leftCols.map(col)) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right.select(
      (col(key).as("__k") +: col(rightTime).as("__t") +: lit(1).as("__side") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)
    // right rows sort BEFORE left rows at equal time (side desc) so a right
    // row with time == left time is visible — DuckDB ASOF `>=` semantics.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .select((col("__side") +: leftCols.map(col)) ++
        rightCols.map(c => last(col(s"__r_$c"), ignoreNulls = true).over(w).as(c)): _*)
    filled.filter(col("__side") === 0).drop("__side")
  }
}
