package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding subword tokenizer — the real thing, replacing
  * `TextOps.subwordCount`'s stated proxy:
  *
  *  - '''training''' is the distributed part at corpus scale: the word
  *    frequency table comes from one Spark aggregation over the corpus
  *    (that pass is what touches 100 TB); merge learning then runs on the
  *    bounded top-`maxVocabWords` frequency dictionary (the standard BPE
  *    recipe — merges depend only on the weighted pair counts of that
  *    dictionary), deterministically (count desc, pair lexicographic
  *    tie-break).
  *  - '''encoding''' is a custom Catalyst [[BpeTokenize]] expression with
  *    real `doGenCode` (one virtual call per row inside whole-stage
  *    codegen, rank map built once per executor, not per row) — no Scala
  *    UDF, no mapPartitions.
  *
  * Words are lowercased and whitespace-split; each word ends with the
  * `</w>` marker so merges can learn word-final units (GPT-2-style).
  */
object BpeOps {

  val EndOfWord = "</w>"

  /** Escape char for word text that collides with the tokenizer's own
    * alphabet. A word may legitimately CONTAIN the literal `</w>` marker
    * (code/markup corpora) or `\u0001` itself; without escaping, decode
    * cannot tell an interior literal from the appended word-end marker and
    * the losslessness invariant breaks. Scheme (sequential, self-delimiting):
    * `\u0001` → `\u0001e`, `</w>` → `\u0001m` — after escaping, the string
    * `</w>` appears ONLY as the appended marker, and a left-to-right decode
    * scan inverts it exactly. */
  private val Esc = '\u0001'

  private[ops] def escapeWord(w: String): String =
    if (w.indexOf(Esc) < 0 && !w.contains(EndOfWord)) w
    else w.replace(Esc.toString, "\u0001e").replace(EndOfWord, "\u0001m")

  /** Symbol sequence for a word: escaped text split by CODE POINT (a
    * surrogate pair must never split — lone surrogates don't survive the
    * UTF8String round-trip), plus the end-of-word marker. */
  private[ops] def wordSymbols(w: String): Array[String] = {
    val esc = escapeWord(w)
    val out = Array.newBuilder[String]
    var i = 0
    while (i < esc.length) {
      val cp = esc.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out += EndOfWord
    out.result()
  }

  /** Corpus word-frequency table: (word, n) — the only full-corpus pass. */
  def wordFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Learn `numMerges` merges from the corpus. The frequency dictionary is
    * capped at `maxVocabWords` (by count desc, word asc — deterministic);
    * this is the standard practice that bounds driver memory regardless of
    * corpus size.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxVocabWords: Int = 50000): Seq[(String, String)] = {
    val freq: Array[(String, Long)] = wordFrequencies(df, textCol)
      .orderBy(col("n").desc, col("word").asc)
      .limit(maxVocabWords)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    trainFromFrequencies(freq, numMerges)
  }

  /** Merge learning over a (word, count) dictionary — pure, deterministic. */
  def trainFromFrequencies(freq: Seq[(String, Long)],
                           numMerges: Int): Seq[(String, String)] = {
    // each word as its symbol sequence (escaped code points + marker) —
    // the SAME representation the encoder applies merges to
    var words: Array[(Array[String], Long)] = freq.map { case (w, n) =>
      (wordSymbols(w), n)
    }.toArray
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, n) =>
        var j = 0
        while (j < syms.length - 1) {
          val pair = (syms(j), syms(j + 1))
          counts.merge(pair, n, (a, b) => a + b)
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // deterministic argmax: highest count, then lexicographically first
        var best: ((String, String), Long) = null
        counts.forEach { (p, n) =>
          if (best == null || n > best._2 ||
            (n == best._2 && (p._1 < best._1._1 ||
              (p._1 == best._1._1 && p._2 < best._1._2))))
            best = (p, n)
        }
        val (a, b) = best._1
        merges += ((a, b))
        val ab = a + b
        words = words.map { case (syms, n) =>
          if (syms.length < 2) (syms, n)
          else {
            val out = Array.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                out += ab; j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.result(), n)
          }
        }
        i += 1
      }
    }
    merges.result()
  }

  /** Tokenize `textCol` with learned merges → array<string> of subwords. */
  def tokenize(text: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(BpeTokenize(ColumnBridge.expression(text), merges))
  }

  /** Subword count under the learned vocabulary. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(tokenize(text, merges))

  /** Decode a token array back to text: concatenate subwords, then one
    * left-to-right scan turning each `</w>` marker into a space and
    * inverting the [[escapeWord]] escapes (so text that itself contains
    * the literal marker or the escape char round-trips). `decode(tokenize
    * (x)) ≡ normalize(x)` where normalize = lowercase + whitespace-collapse
    * — the losslessness invariant (BpeSpec in-JVM incl. adversarial
    * marker-in-text inputs; `t5_bpe_tokens` proves it cross-engine: DuckDB
    * recomputes `sha256(normalize(text))` from the parquet and equates it
    * with Spark's `sha256(decode(encode(text)))`).
    */
  def decode(tokens: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(BpeDecode(ColumnBridge.expression(tokens)))
  }

  /** Sequential inverse of the encode-side escaping. Pure; shared by the
    * expression and tests. */
  def decodeConcat(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var j = 0
    while (j < s.length) {
      if (s.startsWith(EndOfWord, j)) { out.append(' '); j += EndOfWord.length }
      else if (s.charAt(j) == Esc && j + 1 < s.length && s.charAt(j + 1) == 'e') {
        out.append(Esc); j += 2
      } else if (s.charAt(j) == Esc && j + 1 < s.length && s.charAt(j + 1) == 'm') {
        out.append(EndOfWord); j += 2
      } else { out.append(s.charAt(j)); j += 1 }
    }
    // exactly one trailing space exists (the final word's marker) unless
    // the token stream was empty; Java trim here would also eat boundary
    // control chars that are legitimate text
    val s2 = out.toString
    if (s2.endsWith(" ")) s2.substring(0, s2.length - 1) else s2
  }

  /** Unambiguous (a, b) symbol-pair key: length-prefixed, so symbols that
    * contain any delimiter char can never collide two distinct pairs. */
  private[ops] def pairKey(a: String, b: String): String =
    a.length.toString + ":" + a + b
}

/** Catalyst expression: invert [[BpeTokenize]] — concatenate the subword
  * array and run the sequential unescape scan ([[BpeOps.decodeConcat]]).
  * Codegen emits one call per row via a reference object, same pattern as
  * the encoder — stays inside whole-stage codegen.
  */
case class BpeDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_decode"

  // analysis-time type error beats an executor-side ClassCastException:
  // decode is a public Column API and may be pointed at arbitrary columns
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_decode needs array<string>, got ${other.simpleString}")
    }

  def decodeTokens(arr: ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < arr.numElements()) {
      // null elements (containsNull inputs from storage) decode as absent
      val e = arr.getUTF8String(i)
      if (e != null) sb.append(e.toString)
      i += 1
    }
    UTF8String.fromString(BpeOps.decodeConcat(sb.toString))
  }

  override protected def nullSafeEval(input: Any): Any =
    decodeTokens(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeDec", this, classOf[BpeDecode].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.decodeTokens($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeDecode =
    copy(child = newChild)
}

/** Catalyst expression: BPE-encode a text column (lowercase, whitespace
  * words, `</w>` markers) with a fixed merge list. Codegen emits one call
  * to [[tokenizeText]] per row via a reference object — stays inside
  * whole-stage codegen; the merge-rank map is built once per executor.
  */
case class BpeTokenize(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokenize"

  // same rationale as BpeDecode: tokenize is a public Column API and may
  // be pointed at arbitrary columns — fail at analysis, not with an
  // executor-side ClassCastException mid-job
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_tokenize needs a string column, got ${other.simpleString}")
    }

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(BpeOps.pairKey(a, b), Integer.valueOf(i))
    }
    m
  }

  def tokenizeText(input: UTF8String): ArrayData = {
    // Lowercase through UTF8String.toLowerCase — the SAME code path the
    // Spark `lower()` that trained the vocabulary runs — so encode and
    // training agree byte-for-byte on every JVM. (Locale.ROOT here would
    // DIVERGE on non-ASCII: UTF8String.toLowerCaseSlow delegates to the
    // default-locale String.toLowerCase, so a tr_TR executor lowers 'I'
    // to dotless-ı in training but 'i' under ROOT — vocabulary mismatch.)
    // No Java trim: it strips ALL chars <= U+0020, but only regex \s runs
    // delimit words — a boundary \u0001 must survive into its word (split
    // already yields no boundary empties beyond the leading one, which
    // the nonEmpty guard drops).
    val words = input.toLowerCase.toString.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    words.foreach { w =>
      if (w.nonEmpty) {
        // escaped code-point symbols + marker — same alphabet training used
        val ws = BpeOps.wordSymbols(w)
        var syms = new java.util.ArrayList[String](ws.length)
        ws.foreach(syms.add)
        // repeatedly apply the lowest-rank applicable merge (standard encode)
        var merging = syms.size > 1 && !ranks.isEmpty
        while (merging) {
          var bestRank = Int.MaxValue
          var bestIdx = -1
          var j = 0
          while (j < syms.size - 1) {
            val r = ranks.get(BpeOps.pairKey(syms.get(j), syms.get(j + 1)))
            if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); bestIdx = j }
            j += 1
          }
          if (bestIdx < 0) merging = false
          else {
            val merged = syms.get(bestIdx) + syms.get(bestIdx + 1)
            val next = new java.util.ArrayList[String](syms.size - 1)
            var k = 0
            while (k < syms.size) {
              if (k == bestIdx) { next.add(merged); k += 2 }
              else { next.add(syms.get(k)); k += 1 }
            }
            syms = next
            merging = syms.size > 1
          }
        }
        var k = 0
        while (k < syms.size) { out += UTF8String.fromString(syms.get(k)); k += 1 }
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def nullSafeEval(input: Any): Any =
    tokenizeText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpeTokenize].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.tokenizeText($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenize =
    copy(child = newChild)
}
