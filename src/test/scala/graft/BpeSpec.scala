package graft

import graft.ops.BpeOps
import org.apache.spark.sql.functions._

/** BPE subword tokenizer: deterministic merge learning + lossless,
  * codegen'd encoding.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("merge learning on a hand-checkable corpus") {
    // "ab ab ab": pairs (a,b) and (b,</w>) tie at 3 → lexicographic
    // tie-break learns (a,b) first, then (ab,</w>)
    val corpus = Seq("ab ab ab").toDF("text")
    val merges = BpeOps.train(corpus, "text", numMerges = 2)
    assert(merges === Seq(("a", "b"), ("ab", "</w>")))
    val toks = corpus.select(BpeOps.tokenize($"text", merges).as("t"))
      .as[Seq[String]].head()
    assert(toks === Seq("ab</w>", "ab</w>", "ab</w>"))
  }

  test("training is deterministic and encoding is lossless on the corpus") {
    val m1 = BpeOps.train(docs, "text", numMerges = 100, maxVocabWords = 5000)
    val m2 = BpeOps.train(docs, "text", numMerges = 100, maxVocabWords = 5000)
    assert(m1 === m2, "same corpus + params ⇒ same merges")
    assert(m1.size === 100)
    // lossless: decode(tokenize(x)) reconstructs the normalized text,
    // for every document
    val bad = docs.select(
        trim(regexp_replace(lower($"text"), "\\s+", " ")).as("norm"),
        BpeOps.tokenize($"text", m1).as("toks"))
      .select(($"norm" === BpeOps.decode($"toks")).as("ok"))
      .filter(!$"ok").count()
    assert(bad === 0L, "BPE encoding must be lossless")
  }

  test("decode inverts encode on adversarial text: literal </w>, escape char, non-BMP") {
    // text that collides with the tokenizer's own alphabet must still
    // round-trip: literal end-of-word markers, the \u0001 escape char
    // itself, escape-lookalike sequences, and surrogate-pair code points
    // (a per-Java-char split would emit lone surrogates, which do not
    // survive the UTF8String round-trip)
    val adversarial = Seq(
      "a</w>b plain",                  // interior literal marker
      "</w> leading marker",           // word IS the marker
      "tail</w>",                      // word ends with the marker
      "esc\u0001char",                 // the escape char itself
      "fake\u0001m escape lookalike",  // pre-escaped-looking sequence
      "double\u0001\u0001m esc",       // escape-char run before lookalike
      "emoji 😀 pair",       // non-BMP (surrogate pair)
      "mix</w>\u0001😀</w>",    // everything at once
      "\u0001leading escape-char word",   // boundary control char survives
      "trailing escape-char word\u0001",  // Java trim would eat this
      "\ttab-led then spaced  out\n",    // boundary \s: collapse-then-trim
      "INDEX with I and i")                // locale-independent lowercasing
    val df = adversarial.toDF("text")
    val merges = BpeOps.train(df, "text", numMerges = 30, maxVocabWords = 100)
    for (m <- Seq(Seq.empty[(String, String)], merges)) {
      val rows = df.select(
          trim(regexp_replace(lower($"text"), "\\s+", " ")).as("norm"),
          BpeOps.decode(BpeOps.tokenize($"text", m)).as("rt"))
        .as[(String, String)].collect()
      rows.foreach { case (norm, rt) =>
        assert(rt === norm, s"round-trip broke (merges=${m.size})")
      }
    }
  }

  test("more merges ⇒ fewer (or equal) tokens, always ≤ chars+words") {
    val m50 = BpeOps.train(docs, "text", numMerges = 50, maxVocabWords = 5000)
    val m200 = BpeOps.train(docs, "text", numMerges = 200, maxVocabWords = 5000)
    val counts = docs.limit(100).select(
      BpeOps.tokenCount($"text", Seq.empty).as("chars"),
      BpeOps.tokenCount($"text", m50).as("t50"),
      BpeOps.tokenCount($"text", m200).as("t200"))
      .as[(Int, Int, Int)].collect()
    counts.foreach { case (chars, t50, t200) =>
      assert(t200 <= t50 && t50 <= chars, s"($chars, $t50, $t200) not monotone")
    }
    // the vocabulary actually compresses natural text
    assert(counts.map(_._3).sum < counts.map(_._1).sum * 0.7,
      "200 merges should compress the corpus by >30% vs characters")
  }

  test("bpe_tokenize stays inside whole-stage codegen") {
    val m = Seq(("a", "b"))
    val p = docs.select(BpeOps.tokenize($"text", m).as("t"))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), s"expected a codegen span:\n$p")
  }

  test("tokenize lowering matches Spark's lower() on every JVM locale (Turkish-I)") {
    // training lowercases via Spark lower() = UTF8String.toLowerCase,
    // whose slow path delegates to the DEFAULT-locale String.toLowerCase
    // for non-ASCII strings; encode must take the SAME path or the
    // vocabulary and the t5 losslessness invariant break on e.g. tr_TR
    // executors (Locale.ROOT here lowers 'I'→'i'; Spark lowers 'I'→'ı'
    // when the string is non-ASCII under tr). Pure-JVM check: flip the
    // default locale and compare the decode(tokenize(x)) reconstruction
    // against the UTF8String lowering for a mixed ASCII/non-ASCII text.
    import graft.ops.{BpeDecode, BpeTokenize}
    import org.apache.spark.unsafe.types.UTF8String
    val prev = java.util.Locale.getDefault
    try {
      for (loc <- Seq(java.util.Locale.forLanguageTag("tr-TR"), java.util.Locale.ENGLISH)) {
        java.util.Locale.setDefault(loc)
        val dummy = org.apache.spark.sql.catalyst.expressions.Literal
          .create("", org.apache.spark.sql.types.StringType)
        val text = UTF8String.fromString("İSTANBUL IBM CafÉ I")
        val sparkLowered = text.toLowerCase.toString
          .replaceAll("\\s+", " ").trim
        val toks = BpeTokenize(dummy, Nil).tokenizeText(text)
        val decoded = BpeDecode(dummy).decodeTokens(toks).toString
        assert(decoded === sparkLowered,
          s"under $loc: decode(tokenize) '$decoded' != Spark lower '$sparkLowered'")
      }
    } finally java.util.Locale.setDefault(prev)
  }

  test("bpe_tokenize and bpe_decode reject wrong column types at analysis time") {
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      docs.select(BpeOps.tokenize($"text".cast("long"), Nil)).collect()
    }
    assert(e1.getMessage.contains("bpe_tokenize"), e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      docs.select(BpeOps.decode($"text")).collect() // string, not array<string>
    }
    assert(e2.getMessage.contains("bpe_decode"), e2.getMessage)
  }
}
