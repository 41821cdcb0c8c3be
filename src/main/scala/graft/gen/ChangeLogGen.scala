package graft.gen

import graft.model.Model._
import graft.model.SchemaRegistry
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic change-log generator + last-writer-wins oracle.
  *
  * Every column is a pure function of (seed, seq) so the log bit-reproduces
  * at any parallelism (FIXTURES.md §3). Repo ids are Zipf-distributed to
  * create hot-key skew (the reference's hot loop over one family universe,
  * PantherETLPipeline.java:100-116, made adversarial); ops are I/U/D with
  * the first event of a key always I; schema epochs switch at fixed seq
  * fractions (0–50% epoch 0, 50–80% epoch 1, 80–100% epoch 2).
  *
  * Generation itself is a Spark job (scales to bench sizes): `spark.range`
  * → pure column functions → a single window-free self-join-free pass,
  * except first-occurrence detection which is one `min(seq) over key`
  * aggregation (deterministic).
  */
object ChangeLogGen {

  final case class GenConfig(
      seed: Long = 42L,
      nEvents: Long = 100000L,
      nRepos: Int = 0, // 0 → derived max(64, n/2048)
      pathsPerRepo: Int = 64,
      zipfS: Double = 1.2,
      deletePct: Int = 8, // % of non-first events that are deletes
      minContent: Int = 100,
      maxContent: Int = 2048,
      nFiles: Int = 16 // parquet files (seq-ranged) = stream source chunks
  ) {
    def repos: Int = if (nRepos > 0) nRepos else math.max(64, (nEvents / 2048).toInt)
  }

  // --- deterministic 64-bit mixing (splitmix64 finalizer) ---------------
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d4a9b4e851c4d9L
    z ^ (z >>> 31)
  }
  private def h(seed: Long, seq: Long, tag: Long): Long =
    mix64(mix64(seed ^ tag) ^ seq)
  private def u01(x: Long): Double = ((x >>> 11).toDouble) / (1L << 53).toDouble

  /** Zipf CDF over ranks 1..n with exponent s (driver-computed, broadcast). */
  def zipfCdf(n: Int, s: Double): Array[Double] = {
    val w = Array.tabulate(n)(i => 1.0 / math.pow(i + 1.0, s))
    val total = w.sum
    val cdf = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf(n - 1) = 1.0
    cdf
  }
  private def zipfPick(cdf: Array[Double], u: Double): Int = {
    val i = java.util.Arrays.binarySearch(cdf, u)
    val r = if (i >= 0) i else -i - 1
    math.min(r, cdf.length - 1)
  }

  private val vocab: Array[String] =
    ("def val var class object trait import package return if else match case " +
      "for while yield new extends with override private final lazy implicit " +
      "map filter reduce fold collect struct schema partition shuffle merge " +
      "commit snapshot batch offset seq repo path lang content index key").split(" ")

  /** Deterministic pseudo-source text for (seed, repo, path, seq). */
  def genContent(seed: Long, repo: String, path: String, seq: Long,
                 minLen: Int, maxLen: Int): String = {
    val base = mix64(seed ^ mix64(repo.hashCode.toLong << 32 | (path.hashCode.toLong & 0xffffffffL)) ^ seq)
    val span = math.max(1, maxLen - minLen)
    val target = minLen + (java.lang.Long.remainderUnsigned(base, span)).toInt
    val sb = new java.lang.StringBuilder(target + 16)
    sb.append("// ").append(repo).append('/').append(path).append(" @").append(seq).append('\n')
    var st = base
    while (sb.length < target) {
      st = mix64(st)
      sb.append(vocab(java.lang.Long.remainderUnsigned(st, vocab.length).toInt))
      sb.append(if ((st & 15) == 0) '\n' else ' ')
    }
    sb.toString
  }

  private def jsonEsc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def commitId(seed: Long, repo: String, path: String, seq: Long): String =
    // 16 + 16 hex chars from the two keyed hashes + 8 from the seq mix
    // (take(8) clips the %08x rendering, which widens past 8 chars for
    // values over 32 bits) = the 40-hex git-shaped commit id
    f"${h(seed, seq, repo.hashCode.toLong)}%016x${h(seed, seq, path.hashCode.toLong)}%016x" +
      f"${mix64(seed ^ seq)}%08x".take(8)

  private val langs = Array("scala", "java", "py", "ts", "go", "rs", "md")

  def schemaIdFor(seq: Long, n: Long): Int =
    if (seq < n / 2) 0 else if (seq < (n * 4) / 5) 1 else 2

  /** Build the payload JSON for a non-delete event under its epoch schema. */
  def payloadJson(schemaId: Int, commit: String, lang: String, content: String): String = {
    val sz = content.length
    schemaId match {
      case 0 => s"""{"commit":"$commit","lang":"$lang","content":"${jsonEsc(content)}"}"""
      case 1 => s"""{"commit":"$commit","lang":"$lang","content":"${jsonEsc(content)}","size_bytes":$sz}"""
      case _ => s"""{"commit":"$commit","language":"$lang","content":"${jsonEsc(content)}","size_bytes":$sz}"""
    }
  }

  /** Pure per-seq skeleton: everything except the is-first-occurrence bit. */
  final case class Skeleton(seq: Long, repo: String, path: String, delRoll: Int, schema_id: Int)

  def skeleton(cfg: GenConfig, cdf: Array[Double], seq: Long): Skeleton = {
    val rRank = zipfPick(cdf, u01(h(cfg.seed, seq, 0xA1L)))
    val repo = s"org${rRank % 89}/repo$rRank"
    val pIdx = java.lang.Long.remainderUnsigned(h(cfg.seed, seq, 0xB2L), cfg.pathsPerRepo).toInt
    val path = s"src/d${pIdx % 8}/File$pIdx.${langs(pIdx % langs.length)}"
    val delRoll = java.lang.Long.remainderUnsigned(h(cfg.seed, seq, 0xC3L), 100L).toInt
    Skeleton(seq, repo, path, delRoll, schemaIdFor(seq, cfg.nEvents))
  }

  def eventFor(cfg: GenConfig, sk: Skeleton, isFirst: Boolean): ChangeEvent = {
    val op = if (isFirst) "I" else if (sk.delRoll < cfg.deletePct) "D" else "U"
    val ts = new java.sql.Timestamp(1577836800000L + sk.seq * 1000L) // 2020-01-01 + seq s
    if (op == "D") ChangeEvent(sk.seq, op, sk.repo, sk.path, sk.schema_id, ts, null)
    else {
      val lang = langs(java.lang.Long.remainderUnsigned(h(cfg.seed, sk.seq, 0xD4L), langs.length).toInt)
      val content = genContent(cfg.seed, sk.repo, sk.path, sk.seq, cfg.minContent, cfg.maxContent)
      val commit = commitId(cfg.seed, sk.repo, sk.path, sk.seq)
      ChangeEvent(sk.seq, op, sk.repo, sk.path, sk.schema_id, ts,
        payloadJson(sk.schema_id, commit, lang, content))
    }
  }

  /** Pre-payload skeletons with the isFirst flag: one narrow pass + one
    * keyed agg for first-occurrence (I vs U/D). Deterministic at any
    * parallelism. Payload generation is deliberately NOT here — every
    * downstream shuffle should move these ~60-byte rows, never the
    * 100-2048-byte payloads (at 128M events the payload-bearing shuffle
    * was a ~20× larger spill and OOM-killed the 48g generator JVM).
    */
  private def skeletons(spark: SparkSession, cfg: GenConfig): Dataset[(Long, String, String, Int, Int, Boolean)] = {
    import spark.implicits._
    val cdf = spark.sparkContext.broadcast(zipfCdf(cfg.repos, cfg.zipfS))
    val cfgB = spark.sparkContext.broadcast(cfg)
    val sks = spark.range(0, cfg.nEvents, 1, math.max(4, spark.sparkContext.defaultParallelism))
      .map(seq => skeleton(cfgB.value, cdf.value, seq))
    // first event per key (min seq) — one shuffle, deterministic
    val firsts = sks.groupByKey(s => (s.repo, s.path)).mapValues(_.seq)
      .reduceGroups((a, b) => math.min(a, b))
      .map { case ((r, p), s) => (r, p, s) }.toDF("f_repo", "f_path", "first_seq")
    sks.toDF().join(firsts,
        $"repo" === $"f_repo" && $"path" === $"f_path", "inner")
      .select($"seq", $"repo", $"path", $"delRoll", $"schema_id",
        ($"seq" === $"first_seq").as("isFirst"))
      .as[(Long, String, String, Int, Int, Boolean)]
  }

  private def toEvents(spark: SparkSession, cfg: GenConfig,
                       sks: Dataset[(Long, String, String, Int, Int, Boolean)]): Dataset[ChangeEvent] = {
    import spark.implicits._
    val cfgB = spark.sparkContext.broadcast(cfg)
    sks.map { case (seq, repo, path, delRoll, sid, isFirst) =>
      eventFor(cfgB.value, Skeleton(seq, repo, path, delRoll, sid), isFirst)
    }
  }

  /** Distributed generation, deterministic at any parallelism. */
  def events(spark: SparkSession, cfg: GenConfig): Dataset[ChangeEvent] =
    toEvents(spark, cfg, skeletons(spark, cfg))

  /** Write the log as seq-range-partitioned parquet chunks (the WAL files
    * the tailer streams; reference analog: GAF/TSV dump files,
    * GO_IBA_Pipeline.java:118-168). The range partition moves SKELETONS;
    * payloads are generated post-shuffle in the narrow map feeding the
    * writer (same rows, ~20× less shuffle).
    */
  def write(spark: SparkSession, cfg: GenConfig, dir: String): Unit = {
    toEvents(spark, cfg,
      skeletons(spark, cfg)
        .repartitionByRange(cfg.nFiles, col("seq"))
        .sortWithinPartitions("seq"))
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }

  // --- oracle -----------------------------------------------------------

  /** Single-threaded seq-order fold — the reference's own staging semantics
    * (one file per key, last write wins, delete removes:
    * PantherLocalWrapper.java:211-225, 385-391). Test-scale only.
    */
  def oracle(events: Seq[ChangeEvent]): Map[(String, String), RepoRecord] = {
    val m = scala.collection.mutable.HashMap[(String, String), RepoRecord]()
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    events.sortBy(_.seq).foreach { e =>
      val k = (e.repo, e.path)
      if (e.op == "D") m.remove(k)
      else {
        val node = om.readTree(e.payload)
        val epoch = SchemaRegistry.byId(e.schema_id)
        def get(fieldId: Int): Option[com.fasterxml.jackson.databind.JsonNode] =
          epoch.fields.find(_.id == fieldId).flatMap(f => Option(node.get(f.name)))
        m(k) = RepoRecord(
          repo = e.repo, path = e.path,
          commit = get(1).map(_.asText).orNull,
          language = get(2).map(_.asText).orNull,
          content = get(3).map(_.asText).orNull,
          size_bytes = get(4).map(_.asLong),
          seq = e.seq)
      }
    }
    m.toMap
  }
}
