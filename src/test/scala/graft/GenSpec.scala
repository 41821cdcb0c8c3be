package graft

import graft.gen.ChangeLogGen
import graft.gen.ChangeLogGen.GenConfig
import graft.model.Model._
import org.apache.spark.sql.functions._

/** Generator invariants (FIXTURES.md §3): bit-reproducible at any
  * parallelism, unique monotone seqs, first-per-key is always I, Zipf
  * hot-key skew present, schema epochs at the fixed seq fractions.
  */
class GenSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = GenConfig(seed = 42L, nEvents = 8000L)

  test("generation is deterministic across parallelism and runs") {
    def gen(parts: Int): Map[Long, ChangeEvent] =
      ChangeLogGen.events(spark, cfg).repartition(parts)
        .as[ChangeEvent].collect().map(e => e.seq -> e).toMap
    val a = gen(2)
    val b = gen(16)
    assert(a.size === cfg.nEvents.toInt)
    assert(a === b)
  }

  test("seqs unique and dense; first event per key is an insert") {
    val evs = ChangeLogGen.events(spark, cfg).as[ChangeEvent].collect()
    assert(evs.map(_.seq).distinct.length === evs.length)
    assert(evs.map(_.seq).min === 0L && evs.map(_.seq).max === cfg.nEvents - 1)
    val firstOps = evs.groupBy(e => (e.repo, e.path)).values
      .map(_.minBy(_.seq).op)
    assert(firstOps.forall(_ == "I"), "first per key must be I")
    // deletes carry null payload; upserts carry JSON
    assert(evs.filter(_.op == "D").forall(_.payload == null))
    assert(evs.filter(_.op != "D").forall(_.payload != null))
  }

  test("Zipf skew: top repo accounts for a disproportionate share") {
    val byRepo = ChangeLogGen.events(spark, cfg).groupBy("repo").count()
      .orderBy(desc("count")).as[(String, Long)].collect()
    val total = byRepo.map(_._2).sum.toDouble
    assert(byRepo.head._2 / total > 0.05, "hot repo ≥5% of all events")
    assert(byRepo.length > 50, "long tail exists")
  }

  test("schema epochs switch at 50% / 80% seq fractions") {
    val evs = ChangeLogGen.events(spark, cfg)
      .select("seq", "schema_id").as[(Long, Int)].collect().toMap
    val n = cfg.nEvents
    assert(evs(0L) === 0)
    assert(evs(n / 2 - 1) === 0)
    assert(evs(n / 2) === 1)
    assert(evs(n * 4 / 5 - 1) === 1)
    assert(evs(n * 4 / 5) === 2)
    assert(evs(n - 1) === 2)
  }
}
