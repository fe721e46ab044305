package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scalar text kernels exposed as native Catalyst expressions (static
  * calls from generated code — no UDF ser/de on the hot path).
  */
object TextOps {

  /** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD 2003): rolling Rabin-Karp hashes of k-char grams, keep the
    * minimum in each window of w consecutive hashes, distinct + sorted.
    * Two documents sharing any fingerprint share a k-gram run —
    * a scalable containment/plagiarism signal.
    */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    if (s.length < k) return new GenericArrayData(Array.empty[Long])
    val n = s.length - k + 1
    val hashes = new Array[Long](n)
    val B = 1000000007L
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < k) { h = h * B + s.charAt(i); if (i < k - 1) pow *= B; i += 1 }
    hashes(0) = h
    i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * pow) * B + s.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    val out = scala.collection.mutable.SortedSet[Long]()
    if (n <= w) out += hashes.min
    else {
      var j = 0
      while (j + w <= n) {
        var m = Long.MaxValue
        var x = j
        while (x < j + w) { if (hashes(x) < m) m = hashes(x); x += 1 }
        out += m
        j += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def fingerprint(text: Column, k: Int = 8, w: Int = 4): Column =
    column(Winnow(expression(text), k, w))
}

/** Native expression: winnowing fingerprint set of a string. */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"winnow expects string, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextOps.winnow(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextOps.winnow($s, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

/** Character-n-gram language identification — a self-contained
  * heuristic (no external model): per-language profiles of frequent
  * trigrams/diacritics; CJK scripts short-circuit on Unicode ranges.
  * Not a linguistics claim — a deterministic, testable lang-ID feature
  * for pipeline routing, like the reference's config-declared typing
  * (everything decidable from the value itself).
  */
object LangId {

  private val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng ", " to", "to "),
    "fr" -> Seq(" de", "de ", " le", "le ", "es ", " la", "la ", "ent", " et", "et ", "que", " qu"),
    "es" -> Seq(" de", "de ", " la", "la ", "os ", " el", "el ", " en", "en ", "ción", " qu", "ue "),
    "de" -> Seq(" de", "der", "er ", "ie ", " di", "die", "und", " un", "nd ", "ch ", "ein", "sch"))

  private val diacritics: Map[String, Seq[Char]] = Map(
    "fr" -> Seq('é', 'è', 'ê', 'à', 'ç', 'ù', 'â', 'î', 'ô'),
    "es" -> Seq('ñ', 'á', 'í', 'ó', 'ú', '¿', '¡'),
    "de" -> Seq('ä', 'ö', 'ü', 'ß'))

  def detect(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val cjk = text.codePoints().filter(cp =>
      (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3040 && cp <= 0x30FF)).count()
    if (cjk * 4 >= text.length) return "zh"
    val lower = " " + text.toLowerCase + " "
    val scores = profiles.map { case (lang, grams) =>
      var s = 0.0
      grams.foreach { g =>
        var idx = lower.indexOf(g)
        while (idx >= 0) { s += 1.0; idx = lower.indexOf(g, idx + 1) }
      }
      diacritics.getOrElse(lang, Seq.empty).foreach { d =>
        s += 3.0 * lower.count(_ == d)
      }
      lang -> s / math.max(lower.length / 100.0, 1.0)
    }
    val (best, bestScore) = scores.maxBy { case (l, s) => (s, l) }
    if (bestScore <= 0.0) "und" else best
  }

  /** Column form (UDF — off the hot path; lang-ID runs once per doc). */
  lazy val udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((s: String) => detect(s))
}
