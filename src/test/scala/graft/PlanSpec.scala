package graft

import graft.cdc.{Dedupe, Normalize}
import graft.gen.ChangeLogGen
import graft.gen.ChangeLogGen.GenConfig
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the plans the engine relies on at 100 TB must
  * actually be the plans Catalyst produces — filter/column pushdown to the
  * parquet scan, broadcast for dimension joins, hash (not sort) aggregation
  * for the LWW reduce, whole-stage codegen on the scalar hot paths.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString
  private def optimized(df: DataFrame): String = df.queryExecution.optimizedPlan.toString

  test("filter + projection push down to the parquet scan") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") > 30.0)
      .select("l_orderkey", "l_quantity")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"filter not pushed:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned:\n$p")
  }

  test("dimension joins broadcast (no shuffle of the fact side)") {
    val p = plan(Queries.sparkQueries("j5_chained_broadcast")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected SMJ for dim join:\n$p")
  }

  test("LWW dedupe plans hash aggregation, never sort aggregation") {
    val dir = tmpDir("planlog")
    ChangeLogGen.write(spark, GenConfig(seed = 5L, nEvents = 5000L, nFiles = 2), dir)
    val norm = Normalize(spark.read.schema(graft.model.Model.changeLogSchema).parquet(dir))
      .select(graft.stream.Tailer.mergeCols.map(col): _*)
    val typed = Dedupe.lwwTyped(norm, Seq("repo", "path"), "seq")
    val p = plan(typed)
    assert(p.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate:\n$p")
    assert(!p.contains("SortAggregate"), s"SortAggregate crept back in:\n$p")
    // the max_by baseline really is sort-based (documents why LwwAgg exists)
    val legacy = plan(Dedupe.lww(norm, Seq("repo", "path"), "seq"))
    assert(legacy.contains("SortAggregate"))
  }

  test("scalar hot path stays inside WholeStageCodegen") {
    // "*(n)" prefixes mark WholeStageCodegen stages in executedPlan.toString
    val p = plan(Queries.sparkQueries("c8_sha256")(spark, sf))
    assert(p.contains("*(1) Project"), s"no codegen span:\n$p")
  }

  test("partition-pruning analog: isin filter reaches the scan") {
    val df = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type").isin("click", "view")).select("event_id")
    val p = plan(df)
    assert(p.contains("PushedFilters: [In(event_type, [click,view])]"),
      s"IN filter not pushed:\n$p")
  }

  test("bucketed embedding near-dup plans an equi-join, never a nested-loop product") {
    val p = plan(Queries.sparkQueries("d5_embed_neardup")(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bucketed d5 must not plan a product join:\n$p")
    assert(p.contains("Join") || p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected an equi-join on (table, signature):\n$p")
  }

  test("minhash-LSH candidates come from an equi-join on (band, bucket)") {
    val p = plan(Queries.sparkQueries("d3_minhash_lsh")(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"LSH banding must never plan a product join:\n$p")
  }

  test("jaccard pipelines stay equi-join-shaped with hash aggregation") {
    // d2's candidates are materialized eagerly (localCheckpoint), so its
    // visible plan is the verify join — assert no product there…
    val p = plan(Queries.sparkQueries("d2_ngram_jaccard")(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"verify must stay equi-join-shaped:\n$p")
    // …and assert the aggregation shape on the non-checkpointed exact path
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val q = plan(graft.ops.DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.5))
    assert(q.contains("HashAggregate"), s"pair counting should hash-aggregate:\n$q")
    assert(!q.contains("CartesianProduct") && !q.contains("BroadcastNestedLoopJoin"), q)
  }

  test("ANN plans: LSH and IVF candidates come from broadcast equi-joins") {
    // s2: corpus-side key is (table, signature) — the 100-TB shape is an
    // equi-join against the broadcast query signatures, NEVER a product
    val p2 = plan(Queries.sparkQueries("s2_ann_lsh")(spark, sf))
    assert(!p2.contains("BroadcastNestedLoopJoin") && !p2.contains("CartesianProduct"),
      s"LSH ANN must not plan a product join: $p2")
    assert(p2.contains("BroadcastHashJoin"), s"query side should broadcast: $p2")
    // s3: corpus-side key is the IVF cell id
    val p3 = plan(Queries.sparkQueries("s3_ann_ivf")(spark, sf))
    assert(!p3.contains("BroadcastNestedLoopJoin") && !p3.contains("CartesianProduct"),
      s"IVF ANN must not plan a product join: $p3")
    assert(p3.contains("BroadcastHashJoin"), s"probe side should broadcast: $p3")
    // a (query, neighbor) pair can match on at most ONE cell, so the
    // candidate set needs no distinct() and the rerank is a pure window:
    // the whole s3 plan carries no aggregate (a dedup aggregate here would
    // shuffle rows carrying BOTH embedding vectors)
    assert(!p3.contains("HashAggregate") && !p3.contains("SortAggregate") &&
      !p3.contains("ObjectHashAggregate"),
      s"s3 must stay aggregate-free — join straight into the rerank window: $p3")
    // the vector kernels are native codegen expressions — the HOF
    // formulation they replaced was CodegenFallback (interpreted lambdas).
    // (The executed plans are AQE-wrapped pre-execution, so assert on the
    // analyzed plans + the class property instead of codegen markers.)
    val a1 = Queries.sparkQueries("s1_ann_bruteforce")(spark, sf)
      .queryExecution.analyzed.toString
    assert(a1.contains("vec_dot"), s"expected the native dot kernel: $a1")
    val a3 = Queries.sparkQueries("s3_ann_ivf")(spark, sf)
      .queryExecution.analyzed.toString
    assert(a3.contains("vec_sqdist"), s"expected the native sqdist kernel: $a3")
    // LSH signatures use the single constant-size kernel (not the old
    // unrolled dot chain whose generated code grew with bits × dim)
    val a2 = Queries.sparkQueries("s2_ann_lsh")(spark, sf)
      .queryExecution.analyzed.toString
    assert(a2.contains("vec_hyperplane_sig"),
      s"expected the hyperplane-signature kernel: $a2")
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    assert(!classOf[CodegenFallback].isAssignableFrom(classOf[graft.ops.DotProduct]) &&
      !classOf[CodegenFallback].isAssignableFrom(classOf[graft.ops.SquaredDistance]) &&
      !classOf[CodegenFallback].isAssignableFrom(classOf[graft.ops.HyperplaneSig]),
      "vector kernels must implement doGenCode, not fall back to interpretation")
  }

  test("asof join is a window over a union (NO join node); range join stays equi-shaped") {
    // the non-equi asof predicate would plan as BroadcastNestedLoopJoin —
    // the union+window restatement must contain no join node at all
    val p13 = plan(Queries.sparkQueries("j13_asof_join")(spark, sf))
    assert(!p13.contains("Join"),
      s"asof must be join-free (union + window, one key shuffle):\n$p13")
    assert(p13.contains("Window"), s"expected the fill window:\n$p13")
    // range join: binned equi-join + residual BETWEEN filter, never a product
    val p14 = plan(Queries.sparkQueries("j14_range_join")(spark, sf))
    assert(!p14.contains("BroadcastNestedLoopJoin") && !p14.contains("CartesianProduct"),
      s"interval join must bin to an equi-join, never a product:\n$p14")
  }

  test("heavy hitters: bounded-state sketch agg, broadcast recount; bm25 never a product") {
    // pass 1: the MG sketch must run as ObjectHashAggregate (hash-based,
    // map-side combinable), never a sort-agg over the item column
    val sketch = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id").cast("string").as("item"))
      .agg(graft.ops.MgAgg.mgCandidates(col("item"), 100))
    assert(plan(sketch).contains("ObjectHashAggregate"),
      s"MG sketch must be an ObjectHashAggregate:\n${plan(sketch)}")
    // pass 2 (what the catalog query returns): candidates broadcast back
    val p12 = plan(Queries.sparkQueries("a12_heavy_hitters")(spark, sf))
    assert(p12.contains("BroadcastHashJoin"),
      s"recount must broadcast the candidate set:\n$p12")
    assert(!p12.contains("SortAggregate"), s"recount must hash-agg:\n$p12")
    // bm25: df/stats broadcast onto postings; no unbounded product
    val p9 = plan(Queries.sparkQueries("t9_bm25")(spark, sf))
    assert(p9.contains("BroadcastHashJoin"),
      s"bm25 df join must broadcast:\n$p9")
    assert(!p9.contains("CartesianProduct"),
      s"bm25 must never plan a cartesian product:\n$p9")
  }

  test("semi/anti joins plan as joins, not subquery re-scans") {
    val anti = optimized(Queries.sparkQueries("j11_anti")(spark, sf))
    assert(anti.contains("LeftAnti"), s"expected LeftAnti join:\n$anti")
    val semi = optimized(Queries.sparkQueries("j11_semi")(spark, sf))
    assert(semi.contains("LeftSemi"), s"expected LeftSemi join:\n$semi")
  }

  test("merge plan: source side is hash-partition-bucketed, join is equi on key") {
    val dir = tmpDir("planlog2")
    ChangeLogGen.write(spark, GenConfig(seed = 6L, nEvents = 5000L, nFiles = 2), dir)
    val base = tmpDir("plantable")
    val table = graft.lake.LakeTable(s"$base/t", 8)
    val norm = Normalize(spark.read.schema(graft.model.Model.changeLogSchema).parquet(dir))
      .select(graft.stream.Tailer.mergeCols.map(col): _*)
    table.merge(spark, Dedupe.lwwTyped(norm, Seq("repo", "path"), "seq"), 0L)
    // second merge against non-empty target: full-outer equi join on (repo,path)
    val stats = table.merge(spark, Dedupe.lwwTyped(norm, Seq("repo", "path"), "seq"), 1L)
    assert(stats.applied)
    assert(table.head().summary("touchedBuckets").toInt <= 8)
  }
}
