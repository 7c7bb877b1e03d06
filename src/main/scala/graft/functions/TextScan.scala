package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass text-signal counters replacing the regex hot path of the
 * text-analysis family (q28/q29/q30/q54 and everything routed through
 * `TextAnalysis.tokenCount/punctCount/markerScore`).
 *
 * The semantics are EXACTLY the regex formulations the DuckDB oracle
 * still runs — equivalence is load-bearing for the hash gates and is
 * pinned by a ScalaCheck property suite (`TextScanSpec`) comparing
 * against Spark's own `regexp_count` on adversarial inputs (unicode,
 * underscores, supplementary planes, empty/ws-only strings):
 *
 *  - `n_words`    = `regexp_count(text, "\\S+")` — maximal runs of
 *    non-whitespace, Java `\s` = `[ \t\n\x0B\f\r]` (ASCII-only, the
 *    default flags both engines use).
 *  - `n_punct`    = `regexp_count(text, "[^A-Za-z0-9\\s]")` — every
 *    code point that is neither ASCII-alphanumeric nor whitespace
 *    (underscore and all non-ASCII count).
 *  - `bpe_tokens` = `regexp_count(text, "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")`
 *    — greedy letter runs + single digits + single punct.
 *
 * Why an Expression and not the regex: at the 100× octave q29+q30
 * spent ~128 s in `java.util.regex` alone (3-4 full scans per row,
 * each compiling a match state machine per char). One fused scan per
 * row computes all three counters; codegen emits a static call so the
 * operator stays inside WholeStageCodegen, and identical `TextCounts`
 * subtrees in one projection collapse via codegen subexpression
 * elimination (one scan feeds n_words/n_punct/bpe_tokens).
 *
 * NULL in → NULL out, matching `regexp_count`'s null contract.
 */
case class TextCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextCounts.Schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"text_counts expects string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    TextCounts.counts(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextCounts.counts($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextCounts {
  val Schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("bpe_tokens", LongType, nullable = false)))

  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'
  @inline private def isAlpha(cp: Int): Boolean =
    (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')
  @inline private def isDigit(cp: Int): Boolean = cp >= '0' && cp <= '9'

  /** One scan over the code points; see class doc for the exact regex
   *  each counter reproduces. */
  def counts(s: String): InternalRow = {
    var words = 0L; var punct = 0L; var bpe = 0L
    var prevWs = true     // "previous cp was whitespace or start"
    var prevAlpha = false // "previous cp was an ASCII letter"
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      val ws = isWs(cp)
      val alpha = isAlpha(cp)
      if (!ws && prevWs) words += 1
      if (alpha) { if (!prevAlpha) bpe += 1 }
      else if (isDigit(cp)) bpe += 1
      else if (!ws) { punct += 1; bpe += 1 }
      prevWs = ws
      prevAlpha = alpha
      i += Character.charCount(cp)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](words, punct, bpe))
  }

  def text_counts(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_text_counts", c)

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_text_counts", { exprs =>
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"graft_text_counts expects 1 argument, got ${exprs.length}")
        TextCounts(exprs.head)
      }, "built-in")
}

/**
 * Whole-word marker hits in one scan:
 * `regexp_count(text, "\\b(m1|m2|…)\\b")` for markers made entirely of
 * regex word chars `[A-Za-z0-9_]` — under that precondition (enforced
 * at construction) a `\b…\b` match is exactly a MAXIMAL word-char run
 * equal to one of the markers, so the count is "word-char runs whose
 * text is in the marker set". Replaces the alternation regex that was
 * the single hottest scan in q29's quality formula (and the 4-language
 * scoring in q28/q54).
 *
 * The marker list rides in as a foldable comma-joined string literal
 * (markers never contain commas — enforced), the compiled HashSet is
 * shipped to codegen via `addReferenceObj`. NULL text → NULL.
 */
case class WordHits(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"word_hits expects string text, got ${left.dataType}")
    else if (right.dataType != StringType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("word_hits expects a foldable string marker list")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val markerSet: java.util.HashSet[String] = {
    val raw = right.eval().asInstanceOf[UTF8String].toString
    WordHits.compile(raw)
  }

  override protected def nullSafeEval(text: Any, markers: Any): Any =
    WordHits.hits(text.asInstanceOf[UTF8String].toString, markerSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("markerSet", markerSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.WordHits.hits($t.toString(), $setRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordHits {
  @inline private def isWordChar(cp: Int): Boolean =
    (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
      (cp >= '0' && cp <= '9') || cp == '_'

  private[functions] def compile(raw: String): java.util.HashSet[String] = {
    val set = new java.util.HashSet[String]()
    raw.split(',').foreach { m =>
      require(m.nonEmpty && m.forall(c => isWordChar(c)),
        s"word_hits marker '$m' must be non-empty word chars [A-Za-z0-9_]")
      set.add(m)
    }
    set
  }

  /** Count maximal `[A-Za-z0-9_]` runs whose text is in `set`. Word
   *  chars are all BMP so `charAt` indexing is exact here; non-ASCII
   *  (incl. supplementary pairs) only ever TERMINATES a run. */
  def hits(s: String, set: java.util.HashSet[String]): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      if (isWordChar(s.charAt(i))) {
        val start = i
        while (i < n && isWordChar(s.charAt(i))) i += 1
        if (set.contains(s.substring(start, i))) h += 1
      } else i += 1
    }
    h
  }

  def word_hits(c: Column, markers: Seq[String]): Column =
    org.apache.spark.sql.functions.call_function("graft_word_hits", c,
      org.apache.spark.sql.functions.lit(markers.mkString(",")))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_word_hits", { exprs =>
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"graft_word_hits expects 2 arguments, got ${exprs.length}")
        WordHits(exprs.head, exprs(1))
      }, "built-in")
}
