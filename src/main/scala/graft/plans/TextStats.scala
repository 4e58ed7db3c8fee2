package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass quality-score text statistics. Returns
  * struct<toks:bigint, punct:bigint, stops:bigint, chars:bigint>, each
  * field bit-identical to the regex formulation it replaces
  * (TextAnalysis.qualityScore's three `regexp_extract_all` sweeps + one
  * `length`, and the DuckDB oracle that mirrors them):
  *
  *  - `toks`  = size(split(trim(text), "\\s+")) — trim strips U+0020 only
  *    (Spark/DuckDB trim semantics); Java split-with-keep-trailing yields
  *    (number of maximal [ \t\n\f\r]+ runs in the trimmed text) + 1,
  *    including the empty-string → 1 edge.
  *  - `punct` = count of code points outside [a-zA-Z0-9] and the six ASCII
  *    regex-\s whitespace chars (Unicode letters COUNT, matching the
  *    ASCII character class of the original pattern).
  *  - `stops` = maximal \w-runs ([a-zA-Z0-9_]) whose ASCII-lowercased text
  *    equals one of {the, and, of, to, in, is, a} — exactly the matches of
  *    \b(the|and|of|to|in|is|a)\b on lower(text). (Exotic one-to-many
  *    Unicode case folds — İ, the Kelvin sign — could in principle split
  *    or merge runs differently under lower(); the DuckDB oracle gate
  *    verifies equality on the actual corpora.)
  *  - `chars` = code-point count (Spark length()).
  *
  * Why: the quality pre-filter is the operator every raw-corpus row pays
  * FIRST at 100 TB, and three compiled-regex sweeps cost ~60 µs/row on
  * this corpus (regex backtracking + three materialized match arrays) —
  * the fused scan is ~1 µs/row with zero allocation. CodegenFallback like
  * the sibling kernels: the per-row boundary is one virtual call; the
  * character loop below is JIT-compiled either way.
  */
case class TextStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("toks", LongType, nullable = false),
    StructField("punct", LongType, nullable = false),
    StructField("stops", LongType, nullable = false),
    StructField("chars", LongType, nullable = false)))

  override def prettyName: String = "graft_text_stats"

  private def isWs(c: Int): Boolean = // Java regex \s (ASCII-only)
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  private def isWord(c: Int): Boolean = // Java regex \w (ASCII-only)
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  // stopword check on an ASCII-lowercased \w-run of length 1..3 held in
  // (c0, c1, c2); run length > 3 can never match
  private def isStop(len: Int, c0: Int, c1: Int, c2: Int): Boolean = len match {
    case 1 => c0 == 'a'
    case 2 => (c0 == 'o' && c1 == 'f') || (c0 == 't' && c1 == 'o') ||
      (c0 == 'i' && (c1 == 'n' || c1 == 's'))
    case 3 => (c0 == 't' && c1 == 'h' && c2 == 'e') ||
      (c0 == 'a' && c1 == 'n' && c2 == 'd')
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    // trim bounds (U+0020 only, both Spark and DuckDB trim semantics)
    var lo = 0
    while (lo < n && s.charAt(lo) == ' ') lo += 1
    var hi = n
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1

    var chars = 0L
    var punct = 0L
    var stops = 0L
    var wsRuns = 0L // maximal \s+ runs inside [lo, hi)
    var inWs = false
    var wordLen = 0
    var c0, c1, c2 = 0
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      chars += 1
      val ws = cp < 128 && isWs(cp)
      val alnum = cp < 128 && ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
        (cp >= '0' && cp <= '9'))
      if (!ws && !alnum) punct += 1
      // stopword word-run tracking (over the FULL text, like lower(text))
      val w = cp < 128 && isWord(cp)
      if (w) {
        val lc = if (cp >= 'A' && cp <= 'Z') cp + 32 else cp
        wordLen += 1
        if (wordLen == 1) c0 = lc else if (wordLen == 2) c1 = lc
        else if (wordLen == 3) c2 = lc
      } else {
        if (wordLen > 0 && isStop(wordLen, c0, c1, c2)) stops += 1
        wordLen = 0
      }
      // token separator runs, only inside the trimmed window
      if (i >= lo && i < hi) {
        if (ws) { if (!inWs) { wsRuns += 1 }; inWs = true }
        else inWs = false
      }
      i += Character.charCount(cp)
    }
    if (wordLen > 0 && isStop(wordLen, c0, c1, c2)) stops += 1
    val toks = wsRuns + 1L // split keeps bounded empties; "" -> [""] -> 1
    InternalRow(toks, punct, stops, chars)
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}
