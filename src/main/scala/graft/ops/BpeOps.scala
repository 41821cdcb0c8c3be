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
    // each word as its symbol sequence (chars + end-of-word marker)
    var words: Array[(Array[String], Long)] = freq.map { case (w, n) =>
      (w.map(_.toString).toArray :+ EndOfWord, n)
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
            (n == best._2 && (p._1 + "\u0000" + p._2) < (best._1._1 + "\u0000" + best._1._2)))
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

  /** Decode a token array back to text: concatenate subwords, turn each
    * `</w>` marker back into a space, trim. `decode(tokenize(x)) ≡
    * normalize(x)` where normalize = lowercase + whitespace-collapse —
    * the losslessness invariant (BpeSpec in-JVM; `t5_bpe_tokens` proves it
    * cross-engine: DuckDB recomputes `sha256(normalize(text))` from the
    * parquet and equates it with Spark's `sha256(decode(encode(text)))`).
    */
  def decode(tokens: Column): Column =
    trim(regexp_replace(concat_ws("", tokens),
      java.util.regex.Pattern.quote(EndOfWord), " "))
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

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + "\u0000" + b, Integer.valueOf(i))
    }
    m
  }

  def tokenizeText(input: UTF8String): ArrayData = {
    val words = input.toString.toLowerCase.trim.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    words.foreach { w =>
      if (w.nonEmpty) {
        var syms = new java.util.ArrayList[String](w.length + 1)
        w.foreach(c => syms.add(c.toString))
        syms.add(BpeOps.EndOfWord)
        // repeatedly apply the lowest-rank applicable merge (standard encode)
        var merging = syms.size > 1 && !ranks.isEmpty
        while (merging) {
          var bestRank = Int.MaxValue
          var bestIdx = -1
          var j = 0
          while (j < syms.size - 1) {
            val r = ranks.get(syms.get(j) + "\u0000" + syms.get(j + 1))
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
