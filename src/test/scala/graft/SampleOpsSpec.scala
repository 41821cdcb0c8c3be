package graft

import graft.ops.{DedupOps, SampleOps, TextOps}
import org.apache.spark.sql.functions._

/** In-JVM oracles for the sampling / decontamination / repetition ops. */
class SampleOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet").cache()

  test("hashSample is deterministic, id-keyed, and near the nominal fraction") {
    val s1 = SampleOps.hashSample(docs, "doc_id", 1).select("doc_id").as[Long].collect().toSet
    val s2 = SampleOps.hashSample(docs, "doc_id", 1).select("doc_id").as[Long].collect().toSet
    assert(s1 === s2, "same input must yield the identical sample")
    // oracle: exact definition re-derived driver-side
    val expected = docs.select("doc_id").as[Long].collect().filter { id =>
      val hi = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).head
      ((hi >> 4) & 0xf) < 1
    }.toSet
    assert(s1 === expected)
    val n = docs.count().toDouble
    assert(s1.size > 0 && math.abs(s1.size / n - 1.0 / 16) < 0.05,
      s"${s1.size}/$n not near 1/16")
    // keepSixteenths scales monotonically and nests
    val s8 = SampleOps.hashSample(docs, "doc_id", 8).select("doc_id").as[Long].collect().toSet
    assert(s1.subsetOf(s8) && s8.size > s1.size)
  }

  test("hashSample stays shuffle-free (a filter over the scan, no Exchange)") {
    val plan = SampleOps.hashSample(docs, "doc_id", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("stratifiedSample takes exactly ceil(pct·n) per stratum, deterministically") {
    val out = SampleOps.stratifiedSample(docs, "lang", "doc_id", percent = 10)
    val got = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val all = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    all.foreach { case (lang, n) =>
      val want = (n * 10 + 99) / 100
      assert(got.getOrElse(lang, 0L) === want, s"stratum $lang: got ${got.get(lang)}, want $want")
    }
    // and the row SET is stable across runs
    val a = out.select("doc_id").as[Long].collect().toSet
    val b = SampleOps.stratifiedSample(docs, "lang", "doc_id", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
  }

  test("decontaminate flags exactly the docs sharing a 5-gram with the benchmark") {
    val bench = Seq(
      (1000L, "the secret eval answer is forty two exactly")).toDF("doc_id", "text")
    val corpus = Seq(
      // verbatim leak of a benchmark 5-gram
      (1L, "prefix words then the secret eval answer is forty two exactly suffix"),
      // shares only a 4-gram run ("eval answer is forty" is 4 words) — clean at n=5
      (2L, "eval answer is forty but reworded so no five gram is shared"),
      // entirely unrelated
      (3L, "completely unrelated text with nothing in common at all here")
    ).toDF("doc_id", "text")
    val out = DedupOps.decontaminate(corpus, bench, "doc_id", "text", n = 5)
      .select("doc_id", "n_shared").as[(Long, Long)].collect().toMap
    assert(out.keySet === Set(1L), s"only doc 1 leaks a 5-gram: $out")
    // doc 1 contains 4 of the benchmark's 5-grams (a 8-word window over them)
    assert(out(1L) === 4L, s"doc 1 shares 4 distinct benchmark 5-grams: $out")
  }

  test("repetitionRatio: 0 for novel text, high for looped boilerplate") {
    val fix = Seq(
      (1L, "one two three four five six seven eight"),         // all trigrams distinct
      (2L, "spam spam spam spam spam spam spam spam spam"),    // one distinct trigram
      (3L, "ab cd")                                            // < n words → single shingle
    ).toDF("doc_id", "text")
    val got = fix.select(col("doc_id"), TextOps.repetitionRatio(col("text"), 3).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) === 0.0)
    assert(got(2L) === math.round((1.0 - 1.0 / 7) * 1e6) / 1e6) // 7 trigrams, 1 distinct
    assert(got(3L) === 0.0)
  }
}
