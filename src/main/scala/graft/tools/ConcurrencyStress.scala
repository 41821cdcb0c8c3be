package graft.tools

import graft.Sessions
import graft.lake.LakeTable
import org.apache.spark.sql.functions._

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import scala.jdk.CollectionConverters._

/** REAL-race multi-writer stress: K writer threads push seq-guarded
  * SQL-merge batches of disjoint key ranges into ONE COW lake table while
  * a compactor thread and a vacuum thread run concurrently — no
  * deterministic hooks, actual CAS contention. (MultiWriterSpec drives
  * each arbitration path one interleaving at a time; this drives all of
  * them at once, repeatedly. The fenced Dataset merge is deliberately NOT
  * used here: the batchId fence models one ordered change stream per
  * table, so independent concurrent writers are the mergeSql contract.)
  *
  * End-state invariants checked:
  *  1. no lost update — final state holds each key's highest-seq payload
  *     (in-JVM LWW model comparison, every key);
  *  2. no committed manifest references a missing file (vacuum safety);
  *  3. every writer batch produced a commit (version count);
  *  4. a final full compact + expire + vacuum(0) leaves state unchanged;
  *  5. a CONTINUOUS graft-cdf follower racing every commit converges to
  *     exact LWW replica parity once the primary quiesces.
  *
  * `mor` mode instead runs the PRODUCTION ingest shape under maintenance
  * contention: one fenced Dataset-merge writer (a change stream applies
  * batches in order — the Tailer's contract) racing the same compactor +
  * vacuum threads; appends always rebase, and the fence must end exactly
  * at the last batch.
  *
  * Usage: ConcurrencyStress [writers] [batchesPerWriter] [rowsPerBatch] [cow|mor]
  */
object ConcurrencyStress {
  def main(args: Array[String]): Unit = {
    val writers = args.headOption.map(_.toInt).getOrElse(4)
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(12)
    val rowsPer = args.drop(2).headOption.map(_.toInt).getOrElse(200)
    val mode = args.drop(3).headOption.getOrElse(LakeTable.Cow)
    require(mode == LakeTable.Cow || mode == LakeTable.Mor, s"mode cow|mor, got $mode")
    // COW: `writers` independent seq-guarded mergeSql writers.
    // MOR: ONE fenced Dataset-merge writer (ordered stream), because the
    // batchId fence models one change stream per table by design.
    val nWriters = if (mode == LakeTable.Mor) 1 else writers
    val spark = Sessions.local(
      sys.env.getOrElse("GRAFT_CORES", "16").toInt, "graft-stress")
    import spark.implicits._
    val cols = Seq("repo", "path", "op", "seq", "commit", "language", "content", "size_bytes")

    val base = java.nio.file.Files.createTempDirectory("stress").toString
    val root = s"$base/t"
    LakeTable(root, numBuckets = 16, mode) // create once

    // Writer w owns repos repo-w-* (disjoint key spaces ⇒ inter-writer
    // arbitration is always a rebase; compaction overlap forces
    // recomputes). Writers use the SQL-merge path (seq-guarded, unfenced):
    // the batchId fence models ONE ordered change stream per table by
    // design, so independent concurrent writers are exactly the mergeSql
    // contract — ad-hoc seq-guarded upserts racing each other and the
    // maintenance threads.
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val done = new CountDownLatch(nWriters + 3)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val pool = Executors.newFixedThreadPool(nWriters + 3)

    for (w <- 0 until nWriters) pool.submit(new Runnable {
      override def run(): Unit = try {
        val table = new LakeTable(root, 16)
        for (b <- 0 until batches) {
          val rows = (0 until rowsPer).map { k =>
            val seq = (b.toLong * rowsPer + k) * writers + w
            (s"repo-$w-${k % 8}", s"path-$k", "U", seq,
              s"c$seq", "scala", s"w$w-b$b-k$k", Option(seq))
          }
          if (mode == LakeTable.Mor) {
            // fenced ordered stream (the Tailer shape); appends rebase
            // through any interleaved compaction/vacuum
            table.merge(spark, rows.toDF(cols: _*), b.toLong,
              updateColumns = None, retries = 50, srcKeyUnique = true)
          } else {
            val src = rows.toDF(cols: _*).drop("op").alias("s")
            // retries absorb CAS storms from `writers` concurrent committers
            table.mergeSql(spark, src, "t", "s",
              "`t`.`repo` = `s`.`repo` AND `t`.`path` = `s`.`path`",
              Map("repo" -> "`s`.`repo`", "path" -> "`s`.`path`"),
              matched = Seq(LakeTable.SqlMergeClause("update",
                Some("`s`.`seq` > `t`.`seq`"), Nil, star = true, starAlias = "s")),
              notMatched = Seq(LakeTable.SqlMergeClause("insert", None, Nil,
                star = true, starAlias = "s")),
              retries = 50)
          }
        }
      } catch { case t: Throwable => errors.add(t) } finally done.countDown()
    })
    // compactor: incremental folds racing the writers (always loses CAS
    // storms gracefully; retries against new heads)
    pool.submit(new Runnable {
      override def run(): Unit = try {
        val table = new LakeTable(root, 16)
        while (!stop.get()) {
          try table.compactBuckets(spark, maxFilesPerBucket = 3, retries = 10,
            targetFileRows = Some(500L))
          catch { case _: LakeTable.ConcurrentCommitException => () }
          Thread.sleep(200)
        }
      } catch { case t: Throwable => errors.add(t) } finally done.countDown()
    })
    // vacuum: grace window high enough to spare in-flight writers' pending
    // files (the documented multi-writer contract), low enough to actually
    // reclaim superseded rewrites during the run
    pool.submit(new Runnable {
      override def run(): Unit = try {
        val table = new LakeTable(root, 16)
        while (!stop.get()) { table.vacuum(olderThanMs = 30000L); Thread.sleep(500) }
      } catch { case t: Throwable => errors.add(t) } finally done.countDown()
    })

    // follower: CONTINUOUS replication through the graft-cdf stream into a
    // derived table, racing every writer + compactor + vacuum commit — the
    // replica must converge to exact LWW parity once the primary quiesces
    // (invariant 5 below). Transient mid-run failures are absorbed by the
    // checkpoint: the final drain re-delivers any window that didn't land.
    val derivedRoot = s"$base/d"
    val derived = LakeTable(derivedRoot, numBuckets = 8)
    pool.submit(new Runnable {
      override def run(): Unit = try {
        val q = graft.stream.Tailer.followContinuously(spark, root, derived,
          s"$base/fckpt", intervalMs = 300L)
        while (!stop.get()) Thread.sleep(200)
        q.stop()
      } catch { case t: Throwable => errors.add(t) } finally done.countDown()
    })

    // writers finish first; then stop the maintenance + follower threads
    while (done.getCount > 3) Thread.sleep(100)
    stop.set(true)
    done.await(120, TimeUnit.SECONDS)
    pool.shutdownNow()

    require(errors.isEmpty, {
      errors.asScala.foreach(_.printStackTrace())
      s"${errors.size} thread(s) failed"
    })

    val table = LakeTable.open(root)
    // invariant 1: exact LWW model parity
    val expect = (for {
      w <- 0 until nWriters; k <- 0 until rowsPer
    } yield {
      val b = batches - 1
      val seq = (b.toLong * rowsPer + k) * writers + w
      (s"repo-$w-${k % 8}", s"path-$k") -> seq
    }).groupBy(_._1).map { case (key, vs) => key -> vs.map(_._2).max }
    val actual = table.read(spark).select("repo", "path", "seq")
      .as[(String, String, Long)].collect()
      .map { case (r, p, s) => (r, p) -> s }.toMap
    require(actual.size == expect.size, s"rows ${actual.size} != ${expect.size}")
    expect.foreach { case (k, s) =>
      require(actual(k) == s, s"key $k: seq ${actual(k)} != $s") }
    // invariant 2: all referenced files exist
    val h = table.head()
    table.filesOf(h).foreach { f =>
      require(java.nio.file.Files.exists(java.nio.file.Paths.get(root, f.path)),
        s"head v${h.version} references missing ${f.path}") }
    // every writer batch produced a commit (plus compactions); in MOR the
    // exactly-once fence must land exactly on the last batch
    require(h.version >= nWriters * batches,
      s"only ${h.version} commits for ${nWriters * batches} writer batches")
    if (mode == LakeTable.Mor)
      require(h.lastBatchId == batches - 1L,
        s"fence ${h.lastBatchId} != last batch ${batches - 1}")
    // invariant 5: the replica converges to EXACT LWW parity — one final
    // drain from the live checkpoint picks up whatever the continuous
    // follower hadn't applied when it was stopped
    graft.stream.Tailer.followInto(spark, root, derived, s"$base/fckpt")
    val replica = derived.read(spark).select("repo", "path", "seq")
      .as[(String, String, Long)].collect()
      .map { case (r, p, s) => (r, p) -> s }.toMap
    require(replica == actual,
      s"follower replica diverged: ${replica.size} rows vs ${actual.size}")

    // invariant 4: final maintenance converges
    val before = actual
    table.compact(spark, gcTombstones = true)
    table.expireSnapshots(keepLast = 1)
    table.vacuum(olderThanMs = 0)
    val after = table.read(spark).select("repo", "path", "seq")
      .as[(String, String, Long)].collect()
      .map { case (r, p, s) => (r, p) -> s }.toMap
    require(after == before, "final compact+vacuum changed state")
    val hf = table.head()
    println(s"""{"metric":"concurrency_stress","mode":"$mode","writers":$nWriters,""" +
      s""""batches":$batches,"rowsPerBatch":$rowsPer,"commits":${hf.version},""" +
      s""""finalRows":${after.size},"filesFinal":${hf.totalFiles},""" +
      s""""followerParity":true,"ok":true}""")
    spark.stop()
  }
}
