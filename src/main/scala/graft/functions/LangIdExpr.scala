package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass language-ID expression.
  *
  * Semantics identical to the composable form (and the DuckDB oracle):
  * any CJK codepoint → "zh"; else the language whose marker list has the
  * most DISTINCT token hits (ties resolved in declaration order); zero
  * hits → "und". The composable version recomputed `split(lower(text))`
  * once per language through interpreted array intersections — this
  * tokenizes once and counts via hash sets.
  */
case class LangIdExpr(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  @transient private lazy val markers: Array[(UTF8String, java.util.HashSet[String])] =
    TextFunctions.LangMarkers.map { case (lang, words) =>
      val s = new java.util.HashSet[String]()
      words.foreach(s.add)
      (UTF8String.fromString(lang), s)
    }.toArray

  @transient private lazy val und = UTF8String.fromString("und")
  @transient private lazy val zh = UTF8String.fromString("zh")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // CJK first (matches the when(zh).otherwise(...) short-circuit)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c >= 0x4e00 && c <= 0x9fff) return zh
      i += 1
    }
    val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    val seenPerLang = Array.fill(markers.length)(new java.util.HashSet[String]())
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      var l = 0
      while (l < markers.length) {
        if (markers(l)._2.contains(tok)) seenPerLang(l).add(tok)
        l += 1
      }
      t += 1
    }
    val scores = seenPerLang.map(_.size)
    val best = scores.max
    if (best == 0) und
    else markers(scores.indexOf(best))._1 // first language achieving the max
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangId {
  def langId(text: Column): Column =
    ColumnBridge.column(LangIdExpr(ColumnBridge.expression(text)))
}
