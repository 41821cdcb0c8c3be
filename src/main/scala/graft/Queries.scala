package graft

import graft.ops.{ChunkOps, DedupOps, MultimodalOps, SimilarityOps, TextOps, TreeOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operator-coverage query catalog: one entry per implemented operator
  * family from SURVEY.md §2 (+ the training-data-pipeline operators), each
  * with a DuckDB-equivalent oracle where SQL-expressible.
  *
  * Conventions for driver parity (the compare sorts columns by name and
  * hashes values):
  *  - every computed column is aliased identically in Spark and SQL;
  *  - double aggregations go through DECIMAL(18,4) and are rounded, so
  *    summation order can't flip low bits between engines;
  *  - outputs avoid raw timestamps (dates/longs/strings instead).
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    round(sum(c.cast("decimal(18,4)")), scale).cast("double")

  // =========================================================================
  // SURVEY §2.4 aggregations
  // =========================================================================

  val sparkQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: distinct-collect into doc lists (13 collect_sets in the reference)
    "a1_collect_distinct" -> ((s, d) =>
      t(s, d, "documents").groupBy("lang").agg(
        array_join(sort_array(collect_set(col("source"))), "|").as("sources"),
        countDistinct("doc_id").as("n_docs"))),

    // A2: first-value semantics (min_by / arg_min). r6: min_by over a
    // string buffer plans as SortAggregate (var-length DeclarativeAggregate
    // buffers are not UnsafeRow-mutable) — the engine's LwwAgg hash-agg
    // kernel computes the identical winner (min_by(x, id) = LWW winner
    // under seq = -id; event_id is unique so ties are impossible) in
    // ObjectHashAggregate with map-side combine.
    "a2_first_by_key" -> ((s, d) =>
      t(s, d, "events").groupBy("user_id").agg(
        graft.cdc.LwwAgg.lww(struct(col("event_type")), -col("event_id")).as("_w"),
        min("event_id").as("first_event"))
        .select(col("user_id"), col("_w.event_type").as("first_type"),
          col("first_event"))),

    // A3: count-by-key
    "a3_count_by_key" -> ((s, d) =>
      t(s, d, "events").groupBy("event_type").agg(count(lit(1)).as("n"))),

    // A4: last-writer-wins by key — THE core CDC reduction, on events.
    // r6: the two max_by calls over a string/double buffer planned as
    // SortAggregate (PlanSweep smell); the engine's LwwAgg kernel — the
    // exact operator this query models — computes the same winner row
    // (event_id unique ⇒ deterministic) as ObjectHashAggregate with
    // map-side combine, one winner struct instead of two sorted aggs.
    "a4_lww" -> ((s, d) =>
      t(s, d, "events").groupBy("user_id").agg(
        graft.cdc.LwwAgg.lww(struct(col("event_type"), col("value")),
          col("event_id")).as("_w"),
        max("event_id").as("last_event"))
        .select(col("user_id"), col("_w.event_type").as("last_type"),
          col("_w.value").cast("decimal(18,4)").cast("double").as("last_value"),
          col("last_event"))),

    // A5: conditional distinct counts
    "a5_conditional_distinct" -> ((s, d) =>
      t(s, d, "events").groupBy("event_type").agg(
        countDistinct(when(col("value") > 5.0, col("user_id"))).as("big_users"),
        countDistinct("user_id").as("all_users"))),

    // A6: paired conditional sums (with/without predicate)
    "a6_sum_pairs" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag").agg(
        dsum(col("l_quantity")).as("qty_all"),
        dsum(when(col("l_discount") > 0.05, col("l_quantity")).otherwise(lit(0))).as("qty_discounted"),
        count(lit(1)).as("n"))),

    // A7: facet max-count (top-1 bucket, deterministic tiebreak)
    "a7_top_bucket" -> ((s, d) =>
      t(s, d, "events").groupBy("user_id").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("user_id").asc).limit(1)),

    // A11: array length as scalar metric
    "a11_sizes" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        length(col("text")).cast("long").as("len_chars"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))),

    // A12: EXACT heavy hitters (users with > 0.08% of all events) via the
    // two-pass plan: one Misra–Gries pass (bounded O(1/phi) state, a
    // guaranteed candidate superset — a plain groupBy would shuffle the
    // whole distinct tail) + one exact recount of the broadcast candidates
    "a12_heavy_hitters" -> ((s, d) =>
      graft.ops.FreqOps.heavyHitters(t(s, d, "events"), "user_id", phi = 0.0008)),

    // =======================================================================
    // SURVEY §2.3 joins
    // =======================================================================

    // J1: enrichment join + group aggregate (orders × customer)
    "j1_enrichment" -> ((s, d) =>
      t(s, d, "orders").join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("revenue"))),

    // J2/J6: broadcast dim lookup with default (coalesce 'Unknown')
    "j2_dim_default" -> ((s, d) =>
      t(s, d, "supplier").join(
          broadcast(t(s, d, "nation").filter(col("n_nationkey") < 15)),
          col("s_nationkey") === col("n_nationkey"), "left")
        .groupBy(coalesce(col("n_name"), lit("Unknown")).as("nation"))
        .agg(count(lit(1)).as("n_supp"),
          dsum(col("s_acctbal")).as("acctbal"))),

    // J4: explode + equi-join (split multi-valued field into rows)
    "j4_explode_join" -> ((s, d) => {
      val words = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      words.filter(col("word").isin("join", "hash", "shuffle", "merge"))
        .groupBy("lang", "word").agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_occurrences"))
    }),

    // J5: chained broadcast joins (customer→nation→region)
    "j5_chained_broadcast" -> ((s, d) =>
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name").agg(
          count(lit(1)).as("n_cust"),
          dsum(col("c_acctbal")).as("acctbal"))),

    // J7: pivot with max precedence (annotation matrix analog)
    "j7_pivot" -> ((s, d) =>
      t(s, d, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(round(max(col("value").cast("decimal(18,4)")), 2).cast("double"))),

    // J9: dim join fixing the reference's accidental nested-loop scan
    "j9_dim_join" -> ((s, d) =>
      t(s, d, "lineitem").join(broadcast(t(s, d, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(
          dsum(col("l_quantity")).as("qty"),
          countDistinct("l_orderkey").as("n_orders"))),

    // J11a: anti join (difference — customers with no orders)
    "j11_anti" -> ((s, d) =>
      t(s, d, "customer").join(t(s, d, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")),

    // J11b: semi join (suppliers having lineitems, counted per nation)
    "j11_semi" -> ((s, d) =>
      t(s, d, "supplier").join(t(s, d, "lineitem"),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .groupBy("s_nationkey").agg(count(lit(1)).as("n_supp"))),

    // J12: row-count reconciliation join (counts of two frames must agree)
    "j12_reconcile" -> ((s, d) => {
      val o = t(s, d, "orders").groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      val c = t(s, d, "customer").select(col("c_custkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
    }),

    // J13: as-of join — for each click, the user's latest view at or
    // before it (point-in-time lookup; union+window, NO join node — the
    // non-equi formulation Spark would otherwise plan is a product).
    // Right side pre-deduped to one row per (user_id, ts) so the asof
    // winner is engine-independent even under timestamp ties.
    "j13_asof_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val views = ev.filter(col("event_type") === "view")
        .withColumn("_rn", row_number().over(
          Window.partitionBy("user_id", "ts").orderBy(col("event_id").desc)))
        .filter(col("_rn") === 1)
        .select(col("user_id"), col("ts"),
          col("event_id").as("view_id"), col("value").as("view_value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      graft.ops.JoinOps.asofJoin(clicks, views, Seq("user_id"), "ts",
          Seq("view_id", "view_value"))
        .select("click_id", "user_id", "view_id", "view_value")
    }),

    // J14: interval (range) join — clicks landing in the 30 minutes after
    // each purchase by the same user, counted per purchase (binned
    // equi-join on (user_id, time-bucket); a pair meets in exactly one
    // bin, so no dedup pass)
    "j14_range_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      // parquet ts is TIMESTAMP_NTZ; the session tz is pinned UTC, so the
      // cast to (LTZ) timestamp is the exact epoch mapping unix_micros needs
      val micros = unix_micros(col("ts").cast("timestamp"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          micros.as("lo"))
        .withColumn("hi", col("lo") + lit(1800000000L)) // +30 min
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), micros.as("v"),
          col("event_id").as("click_id"))
      val hits = graft.ops.JoinOps.rangeJoin(clicks, purchases,
        Seq("user_id"), "v", "lo", "hi", binWidth = 1800000000L)
      purchases.select("purchase_id")
        .join(hits.groupBy("purchase_id").agg(count(lit(1)).as("n_clicks")),
          Seq("purchase_id"), "left")
        .select(col("purchase_id"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
    }),

    // =======================================================================
    // SURVEY §2.2 filters / predicates (validator-style multi-predicate)
    // =======================================================================

    "f1_validator" -> ((s, d) =>
      t(s, d, "events").filter(
          col("event_type").isin("click", "view", "purchase") &&
            col("value") > 1.0 && !col("props").startsWith("{\"k\": 9"))
        .select("event_id", "user_id", "event_type")),

    "f4_exists_array" -> ((s, d) =>
      t(s, d, "documents")
        .filter(exists(split(lower(col("text")), "\\s+"),
          w => w.isin("shuffle", "broadcast")))
        .select("doc_id", "lang")),

    // =======================================================================
    // SURVEY §2.5 windows / ranking
    // =======================================================================

    "w1_topk_per_key" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("value").desc, col("event_id").asc)
      t(s, d, "events").withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("user_id"), col("rnk"), col("event_id"),
          col("value").cast("decimal(18,4)").cast("double").as("value"))
    }),

    "w2_running_sum" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          round(sum(col("value").cast("decimal(18,4)")).over(w), 2)
            .cast("double").as("running_value"))
    }),

    "w3_rank_in_group" -> ((s, d) => {
      val w = Window.partitionBy("s_nationkey").orderBy(col("s_acctbal").desc, col("s_suppkey"))
      t(s, d, "supplier").select(col("s_nationkey"), col("s_suppkey"),
        row_number().over(w).as("rnk")).filter(col("rnk") <= 2)
    }),

    "w4_lag_delta" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      t(s, d, "events").select(col("user_id"), col("event_id"),
          (unix_micros(col("ts").cast("timestamp")) -
            lag(unix_micros(col("ts").cast("timestamp")), 1).over(w))
            .as("gap_micros"))
        .filter(col("gap_micros").isNotNull)
    }),

    // W5: batch sessionization — the classic gaps-and-islands shape (the
    // batch twin of StreamingOps.sessionize): new session when the gap to
    // the previous event exceeds 30 min; session id = cumulative count of
    // session starts; one row per session with its span and event count.
    "w5_sessionize" -> ((s, d) => {
      val byTime = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val ev = t(s, d, "events").select(col("user_id"), col("event_id"),
          col("ts").cast("timestamp").as("ts"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(byTime))
        .withColumn("new_session",
          (col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L)
            .cast("long"))
        .withColumn("session_id", sum(col("new_session")).over(
          byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      ev.groupBy("user_id", "session_id").agg(
        count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("start_us"),
        unix_micros(max(col("ts"))).as("end_us"))
    }),

    // =======================================================================
    // SURVEY §2.6 sorts / limits; §2.7 set ops
    // =======================================================================

    "o1_multisort_limit" -> ((s, d) =>
      t(s, d, "documents")
        .orderBy(lower(col("lang")).asc, col("n_chars").desc, col("doc_id").asc)
        .limit(50).select("doc_id", "lang", "n_chars")),

    // O2: null-aware ordering (reference: paralog sort, null AGIs last)
    "o2_nulls_order" -> ((s, d) => {
      val o = t(s, d, "orders").groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      t(s, d, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("n_orders")) // nulls for order-less customers
        .orderBy(col("n_orders").asc_nulls_last, col("c_custkey").asc)
        .limit(100)
    }),

    "o4_sorted_concat" -> ((s, d) =>
      t(s, d, "documents").groupBy("source").agg(
        array_join(sort_array(collect_set(col("lang"))), "|").as("langs"))),

    "u1_union_distinct" -> ((s, d) => {
      val e = t(s, d, "events")
      e.filter(col("event_type") === "click").select("user_id")
        .union(e.filter(col("event_type") === "purchase").select("user_id"))
        .distinct()
    }),

    "u3_except" -> ((s, d) => {
      val e = t(s, d, "events")
      e.filter(col("event_type") === "click").select("user_id")
        .except(e.filter(col("event_type") === "purchase").select("user_id"))
    }),

    "u4_intersect" -> ((s, d) => {
      val e = t(s, d, "events")
      e.filter(col("event_type") === "signup").select("user_id")
        .intersect(e.filter(col("event_type") === "error").select("user_id"))
    }),

    // =======================================================================
    // SURVEY §2.8 scalar functions
    // =======================================================================

    "c1_json_extract" -> ((s, d) =>
      t(s, d, "events")
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))),

    "c2_string_funcs" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        upper(substring(col("c_name"), 1, 8)).as("prefix"),
        instr(col("c_name"), "1").cast("long").as("pos1"),
        concat_ws("-", col("c_mktsegment"), col("c_custkey")).as("tag"))),

    "c6_regex" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"),
        length(regexp_replace(col("text"), "[aeiou]", "")).cast("long").as("novowel_len"))),

    "c8_sha256" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        sha2(col("text"), 256).as("sha"))),

    "c12_date_trunc" -> ((s, d) =>
      t(s, d, "events").groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))),

    // =======================================================================
    // Training-data ops: text analysis
    // =======================================================================

    "t1_token_stats" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
        size(array_distinct(split(lower(trim(col("text"))), "\\s+")))
          .cast("long").as("n_distinct_tokens"))),

    "t4_fingerprint" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("fingerprint"))),

    // Real BPE subword tokenizer: merges trained on THIS corpus (one Spark
    // word-frequency pass + deterministic local merge learning), encoding
    // via the codegen'd BpeTokenize expression. Encoding itself is not
    // SQL-expressible, so the DRIVER-CHECKED invariant is losslessness
    // cross-engine: sha_roundtrip = sha256(decode(encode(text))) computed
    // by Spark must equal sha_orig = sha256(normalize(text)) — and the
    // DuckDB oracle recomputes BOTH from the raw parquet, so a single
    // corrupted merge/token would hash-mismatch. (BpeSpec holds the
    // in-JVM determinism/compression oracles.)
    "t5_bpe_tokens" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val merges = graft.ops.BpeOps.train(docs, "text", numMerges = 200,
        maxVocabWords = 10000)
      // normalize = lowercase, collapse \s+ runs to one space, then trim
      // the boundary spaces — collapse-BEFORE-trim, because SQL trim
      // strips only spaces: trimming first would leave a leading "\t "
      // as " " while the tokenizer (whitespace-split) never emits it
      docs.select(col("doc_id"),
        sha2(trim(regexp_replace(lower(col("text")), "\\s+", " ")), 256).as("sha_orig"),
        sha2(graft.ops.BpeOps.decode(
          graft.ops.BpeOps.tokenize(col("text"), merges)), 256).as("sha_roundtrip"))
    }),

    // Word-trigram repetition ratio (boilerplate/spam signal)
    "t6_repetition" -> ((s, d) =>
      TextOps.repetition(t(s, d, "documents"), "doc_id", "text", n = 3)),

    // Token-window chunking: long docs → overlapping context windows
    // (stride 24 = 32 − 8). No shuffle — narrow explode, the 100-TB shape.
    "t7_chunk_windows" -> ((s, d) =>
      ChunkOps.chunkByTokens(t(s, d, "documents"), "doc_id", "text",
        maxTokens = 32, overlap = 8)),

    // Sequence packing: offset sharding into ~256-token training packs,
    // grouped by lang (one shuffle on the group key)
    "t8_pack_offsets" -> ((s, d) =>
      ChunkOps.packByTokens(t(s, d, "documents"), "doc_id", "text",
        "lang", targetTokens = 256L)),

    // BM25 relevance score of every document against a bag-of-words query
    // (Robertson ln(1+·) idf, Lucene defaults k1=1.2 b=0.75). Corpus never
    // shuffles wide: term filter BEFORE the tf groupBy, df + stats
    // broadcast back. tf/df/N/dl are exact ints; ln rounds at 1e-10
    // per-term and the sum at 1e-6 (the repo's double-oracle treatment).
    "t9_bm25" -> ((s, d) =>
      graft.ops.RankOps.bm25(t(s, d, "documents"), "doc_id", "text",
        query = "hash join merge stream")),

    // Spark-only (no SQL oracle): heuristic scores
    "t3_langid" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"), col("lang"),
        TextOps.langId(col("text")).as("lang_pred"))),

    "t2_quality" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextOps.qualityScore(col("text")).as("quality"))),

    // =======================================================================
    // Training-data ops: dedup + similarity
    // =======================================================================

    "d1_exact_dedup" -> ((s, d) =>
      DedupOps.exactGroups(t(s, d, "documents"), "doc_id", "text")),

    "d2_ngram_jaccard" -> ((s, d) =>
      DedupOps.jaccardPairsPrefix(t(s, d, "documents"), "doc_id", "text", n = 3, threshold = 0.5)),

    "d3_minhash_lsh" -> ((s, d) =>
      DedupOps.minhashLshPairs(t(s, d, "documents"), "doc_id", "text",
        n = 3, numHashes = 16, bands = 8, threshold = 0.5)),

    "d4_simhash" -> ((s, d) =>
      DedupOps.simhashPairs(t(s, d, "documents"), "doc_id", "text", maxDist = 3)),

    // Bucketed LSH candidates + exact verify (the scale path; the exact
    // O(N²) product exists only as the ground-truth variant in OpsSpec).
    // bits/tables are tuned to the 0.5 threshold — per-plane agreement at
    // cos 0.5 is only 2/3, so recall needs few bits × many tables.
    "d5_embed_neardup" -> ((s, d) =>
      SimilarityOps.cosineNearDupPairs(t(s, d, "embeddings"), "vec_id", "embedding",
        threshold = 0.5, exact = false, bits = 4, tables = 32)),

    // Near-dup GROUPS: connected components over the jaccard pairs →
    // (doc_id, group_id = canonical survivor). What dedup consumers
    // actually need (reference dedupe-on-append analog,
    // PantherBookXmlToJson.java:73-131).
    "d6_dup_groups" -> ((s, d) =>
      DedupOps.connectedComponents(
        DedupOps.jaccardPairsPrefix(t(s, d, "documents"), "doc_id", "text",
          n = 3, threshold = 0.5))),

    // Benchmark decontamination: docs sharing any word-4-gram with the
    // "eval suite" (every 97th doc stands in for it — deterministic, so
    // the oracle reconstructs the same split).
    "d7_decontaminate" -> ((s, d) => {
      val docs = t(s, d, "documents")
      DedupOps.decontaminate(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 4)
        .withColumn("n_sh", col("n_sh").cast("long"))
    }),

    // Deterministic samples: hash-Bernoulli (shuffle-free scale path) and
    // exact per-stratum (window path) — both re-derivable bit-for-bit.
    "x1_hash_sample" -> ((s, d) =>
      graft.ops.SampleOps.hashSample(t(s, d, "documents"), "doc_id", keepSixteenths = 1)
        .select("doc_id", "lang", "source")),

    "x2_stratified_sample" -> ((s, d) =>
      graft.ops.SampleOps.stratifiedSample(t(s, d, "documents"), "lang", "doc_id", percent = 10)
        .select("doc_id", "lang")),

    "s1_ann_bruteforce" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      SimilarityOps.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
    }),

    "s3_ann_ivf" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      // pretrained-codebook IVF: centroids are the 8 smallest-id corpus
      // vectors — deterministic, so the DuckDB oracle reproduces the cell
      // assignment (and thus the candidate set) exactly. The KMeans-trained
      // variant is covered by OpsSpec's recall oracle.
      val codebook = emb.filter(col("vec_id") < 8).orderBy("vec_id")
        .select(col("embedding").cast("array<double>")).collect()
        .map(_.getSeq[Double](0).toArray)
      SimilarityOps.ivfTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nLists = 8, nProbe = 3,
        codebook = Some(codebook))
    }),

    "s2_ann_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      SimilarityOps.lshTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, bits = 4, tables = 16)
    }),

    // Tree-flatten over nested JSON (the reference's core transform): build
    // a depth-3 tree (source → lang → doc) as a REAL JSON string, then
    // flatten it back to node rows with the depth-bounded recursive schema.
    // The oracle computes the expected node set relationally.
    "a1_tree_flatten" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val langNodes = docs.groupBy(col("source"), col("lang"))
        .agg(collect_list(concat(lit("doc-"), col("doc_id"))).as("docNames"))
        .select(col("source"), struct(col("lang").as("name"),
          transform(col("docNames"), x => struct(x.as("name"))).as("children"))
          .as("langNode"))
      val trees = langNodes.groupBy("source")
        .agg(collect_list(col("langNode")).as("children"))
        .select(to_json(struct(col("source").as("name"), col("children"))).as("json"))
      TreeOps.flattenTree(trees, "json", maxDepth = 3)
    }),

    // Multimodal plumbing (STUB decode kernel; real schema/batching)
    "m1_multimodal" -> ((s, d) =>
      MultimodalOps.pipeline(t(s, d, "documents"), "doc_id", "text")
        .select("media_id", "kind", "n_bytes", "checksum")),

    // =======================================================================
    // Grouping sets / rollup / cube; percentiles; TPC-H-style analytics
    // =======================================================================

    "g1_rollup" -> ((s, d) =>
      t(s, d, "lineitem").rollup("l_returnflag", "l_linestatus").agg(
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("qty"),
        grouping_id().cast("long").as("gid"))),

    "g2_cube" -> ((s, d) =>
      t(s, d, "events").cube("event_type", "user_id").agg(
        count(lit(1)).as("n"),
        grouping_id().cast("long").as("gid"))),

    "h2_percentile" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag").agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_quantity, 0.95)"), 4).as("p95"))),

    // approx sketch (HLL) — DRIVER-CHECKED via an error-bound row: the
    // estimate itself is not SQL-reproducible, but |approx − exact| ≤
    // 3·rsd·exact is a deterministic TRUE the DuckDB oracle asserts
    // cell-exactly (exact distinct + literal TRUE). OpsSpec still checks
    // the ≤5% error directly.
    "h1_approx_distinct" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_orderkey"), 0.05).as("_approx"),
        countDistinct("l_orderkey").as("exact_orders"))
        .select(col("l_returnflag"), col("exact_orders"),
          (abs(col("_approx") - col("exact_orders")) <=
            col("exact_orders") * lit(0.15)).as("within_rsd"))),

    // KMV distinct sketch (custom TypedImperativeAggregate): deterministic
    // estimate = (k-1)·2^60 / kth-min of the md5-derived hashes, so the
    // DuckDB oracle reproduces it CELL-EXACTLY — an oracled approx sketch.
    "h3_kmv_distinct" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_returnflag"),
          conv(substring(md5(col("l_orderkey").cast("string")), 1, 15), 16, 10)
            .cast("long").as("h"))
        .groupBy("l_returnflag")
        .agg(graft.ops.KmvAgg.kmvDistinct(col("h"), 256).as("kmv_distinct"))),

    "tpch_q1" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus").agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          count(lit(1)).as("count_order"))),

    "tpch_q3" -> ((s, d) =>
      t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc).limit(10)),

    "tpch_q5" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name").agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))),

    // TPC-H Q6 shape: filter-heavy scan + single-value aggregate
    "tpch_q6" -> ((s, d) =>
      t(s, d, "lineitem").filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
            col("l_discount").between(0.04, 0.07) && col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))),

    // TPC-H Q4 shape: EXISTS subquery (semi join) + count by priority
    "tpch_q4" -> ((s, d) => {
      val late = t(s, d, "lineitem").select(col("l_orderkey")).distinct()
      t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
        .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
    }),

    // TPC-H Q14 shape: conditional-sum ratio over a dim join
    "tpch_q14" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1996-07-01").cast("timestamp_ntz"))
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .agg(
          dsum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(lit(0)))
            .as("promo_revenue"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("total_revenue"))),

    "c10_array_ops" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        array_join(slice(sort_array(array_distinct(
          split(lower(trim(col("text"))), "\\s+"))), 1, 3), ",").as("first3"),
        size(array_distinct(split(lower(trim(col("text"))), "\\s+")))
          .cast("long").as("n_distinct"))),

    "a8_distinct_union" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("lang"), explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .groupBy("lang").agg(countDistinct("w").as("n_words"))),

    // =======================================================================
    // CDC engine end-to-end as a query (generate → replay → final state)
    // =======================================================================

    // The flagship, DRIVER-ORACLED cell-exactly: the change log is derived
    // DETERMINISTICALLY from the `events` sf table (seq = event_id, op from
    // event_type, key from modular hashes, payloads across all THREE schema
    // epochs), written as a real WAL, replayed through the full engine path
    // (Structured Streaming tailer → LWW dedupe → epoch normalize → fenced
    // COW MERGE), and the final table state is compared against a pure-SQL
    // LWW fold + tombstone filter + sha256 the DuckDB oracle computes from
    // the same derivation (reference semantics: last staged doc per key
    // wins, PantherLocalWrapper.java:211-225; delete propagation :385-391).
    "cdc_replay_mini" -> ((s, _d) => {
      val base = java.nio.file.Files.createTempDirectory("cdcq").toString
      def str(c: org.apache.spark.sql.Column) = c.cast("string")
      val contentC = concat(lit("content-"), str(col("event_id")), lit("-"), col("event_type"))
      val sid = pmod(col("event_id"), lit(3))
      // epoch 0: {commit, lang, content}; epoch 1: + size_bytes (int);
      // epoch 2: language (renamed, same field id) + size_bytes (long)
      val payload = concat(
        lit("{\"commit\":\"c"), str(col("event_id")), lit("\",\""),
        when(sid === 2, lit("language")).otherwise(lit("lang")),
        lit("\":\""), col("event_type"),
        lit("\",\"content\":\""), contentC, lit("\""),
        when(sid === 0, lit("}"))
          .otherwise(concat(lit(",\"size_bytes\":"), str(length(contentC)), lit("}"))))
      val isDel = col("event_type") === "error"
      t(s, _d, "events").select(
        col("event_id").cast("long").as("seq"),
        when(isDel, lit("D")).otherwise(lit("U")).as("op"),
        concat(lit("r"), str(pmod(col("user_id"), lit(7)))).as("repo"),
        concat(lit("p"), str(pmod(col("event_id"), lit(211)))).as("path"),
        sid.cast("int").as("schema_id"),
        col("ts").cast("timestamp").as("ts"),
        when(isDel, lit(null).cast("string")).otherwise(payload).as("payload"))
        .write.parquet(s"$base/log")
      graft.stream.Tailer.replay(s, graft.stream.Tailer.TailerConfig(
        logDir = s"$base/log", tableRoot = s"$base/table",
        checkpointDir = s"$base/ckpt", lineageDir = s"$base/lineage",
        metricsDir = s"$base/metrics", numBuckets = 8, saltBuckets = 4))
      graft.lake.LakeTable(s"$base/table", 8).read(s)
        .select(col("repo"), col("path"), col("seq"), col("commit"),
          col("language"), col("size_bytes"), sha2(col("content"), 256).as("sha"))
    })
  )

  // =========================================================================
  // DuckDB oracle SQL — aliases MUST match the Spark column names above.
  // =========================================================================

  val oracle: Map[String, String] = Map(
    "a1_collect_distinct" ->
      """SELECT lang, string_agg(DISTINCT source, '|' ORDER BY source) AS sources,
        |count(DISTINCT doc_id) AS n_docs FROM documents GROUP BY lang""".stripMargin,

    "a2_first_by_key" ->
      """SELECT user_id, arg_min(event_type, event_id) AS first_type,
        |min(event_id) AS first_event FROM events GROUP BY user_id""".stripMargin,

    "a3_count_by_key" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",

    "a4_lww" ->
      """SELECT user_id, arg_max(event_type, event_id) AS last_type,
        |CAST(CAST(arg_max(value, event_id) AS DECIMAL(18,4)) AS DOUBLE) AS last_value,
        |max(event_id) AS last_event FROM events GROUP BY user_id""".stripMargin,

    "a5_conditional_distinct" ->
      """SELECT event_type,
        |count(DISTINCT CASE WHEN value > 5.0 THEN user_id END) AS big_users,
        |count(DISTINCT user_id) AS all_users FROM events GROUP BY event_type""".stripMargin,

    "a6_sum_pairs" ->
      """SELECT l_returnflag,
        |CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS qty_all,
        |CAST(round(sum(CASE WHEN l_discount > 0.05 THEN CAST(l_quantity AS DECIMAL(18,4)) ELSE 0 END), 2) AS DOUBLE) AS qty_discounted,
        |count(*) AS n FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "a7_top_bucket" ->
      """SELECT user_id, count(*) AS n FROM events GROUP BY user_id
        |ORDER BY n DESC, user_id ASC LIMIT 1""".stripMargin,

    "a11_sizes" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS len_chars,
        |CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |FROM documents""".stripMargin,

    // exact heavy hitters: the oracle is the direct declarative statement;
    // the threshold is the same double product (0.0008 · exact bigint n)
    // both engines compute identically
    "a12_heavy_hitters" ->
      """SELECT CAST(user_id AS VARCHAR) AS item, count(*) AS freq
        |FROM events, (SELECT count(*) AS n FROM events) t
        |GROUP BY 1, t.n HAVING count(*) > 0.0008 * t.n""".stripMargin,

    "j1_enrichment" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "j2_dim_default" ->
      """SELECT coalesce(n_name, 'Unknown') AS nation, count(*) AS n_supp,
        |CAST(round(sum(CAST(s_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS acctbal
        |FROM supplier LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 15) n
        |ON s_nationkey = n_nationkey GROUP BY 1""".stripMargin,

    "j4_explode_join" ->
      """SELECT lang, word, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
        |FROM (SELECT doc_id, lang,
        |        unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |      FROM documents)
        |WHERE word IN ('join','hash','shuffle','merge')
        |GROUP BY lang, word""".stripMargin,

    "j5_chained_broadcast" ->
      """SELECT r_name, count(*) AS n_cust,
        |CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey GROUP BY r_name""".stripMargin,

    "j7_pivot" ->
      """SELECT user_id,
        |CAST(round(max(CASE WHEN event_type='click' THEN CAST(value AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS click,
        |CAST(round(max(CASE WHEN event_type='error' THEN CAST(value AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS error,
        |CAST(round(max(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS purchase,
        |CAST(round(max(CASE WHEN event_type='signup' THEN CAST(value AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS signup,
        |CAST(round(max(CASE WHEN event_type='view' THEN CAST(value AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS view
        |FROM events GROUP BY user_id""".stripMargin,

    "j9_dim_join" ->
      """SELECT p_brand,
        |CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS qty,
        |count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand""".stripMargin,

    "j11_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "j11_semi" ->
      """SELECT s_nationkey, count(*) AS n_supp FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
        |GROUP BY s_nationkey""".stripMargin,

    "j12_reconcile" ->
      """SELECT c_custkey, coalesce(o.n_orders, 0) AS n_orders FROM customer
        |LEFT JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
        |ON c_custkey = o_custkey""".stripMargin,

    // DuckDB has native ASOF JOIN — the oracle states the semantics
    // directly; the right side is deduped per (user_id, ts) exactly as in
    // the Spark query so ties cannot make the asof winner engine-specific
    "j13_asof_join" ->
      """WITH v AS (
        |  SELECT user_id, ts, event_id AS view_id, value AS view_value
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |                                     ORDER BY event_id DESC) AS rn
        |        FROM events WHERE event_type = 'view') WHERE rn = 1),
        |c AS (SELECT event_id AS click_id, user_id, ts
        |      FROM events WHERE event_type = 'click')
        |SELECT c.click_id, c.user_id, v.view_id, v.view_value
        |FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts""".stripMargin,

    "j14_range_join" ->
      """SELECT p.event_id AS purchase_id, count(c.event_id) AS n_clicks
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id
        | AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 30 MINUTE
        |GROUP BY 1""".stripMargin,

    "f1_validator" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE event_type IN ('click','view','purchase') AND value > 1.0
        |AND NOT starts_with(props, '{"k": 9')""".stripMargin,

    "f4_exists_array" ->
      """SELECT doc_id, lang FROM documents
        |WHERE len(list_intersect(string_split_regex(lower(text), '\s+'),
        |  ['shuffle','broadcast'])) > 0""".stripMargin,

    "w1_topk_per_key" ->
      """SELECT user_id, rnk, event_id,
        |CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) AS value FROM (
        |  SELECT user_id, event_id, value, row_number() OVER
        |    (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rnk
        |  FROM events) WHERE rnk <= 3""".stripMargin,

    "w2_running_sum" ->
      """SELECT user_id, event_id,
        |CAST(round(sum(CAST(value AS DECIMAL(18,4))) OVER
        |  (PARTITION BY user_id ORDER BY event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_value
        |FROM events""".stripMargin,

    "w3_rank_in_group" ->
      """SELECT s_nationkey, s_suppkey, rnk FROM (
        |  SELECT s_nationkey, s_suppkey, row_number() OVER
        |    (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rnk
        |  FROM supplier) WHERE rnk <= 2""".stripMargin,

    "w4_lag_delta" ->
      """SELECT user_id, event_id, gap_micros FROM (
        |  SELECT user_id, event_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY event_id) AS gap_micros
        |  FROM events) WHERE gap_micros IS NOT NULL""".stripMargin,

    "w5_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    lag(CAST(ts AS TIMESTAMP)) OVER
        |      (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_ts
        |  FROM events
        |), marked AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(CASE WHEN prev_ts IS NULL
        |      OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000 THEN 1 ELSE 0 END AS BIGINT) AS new_session
        |  FROM ev
        |), sess AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM marked)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us
        |FROM sess GROUP BY user_id, session_id""".stripMargin,

    "o1_multisort_limit" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |ORDER BY lower(lang) ASC, n_chars DESC, doc_id ASC LIMIT 50""".stripMargin,

    "o2_nulls_order" ->
      """SELECT c_custkey, n_orders FROM customer
        |LEFT JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
        |ON c_custkey = o_custkey
        |ORDER BY n_orders ASC NULLS LAST, c_custkey ASC LIMIT 100""".stripMargin,

    "o4_sorted_concat" ->
      """SELECT source, string_agg(DISTINCT lang, '|' ORDER BY lang) AS langs
        |FROM documents GROUP BY source""".stripMargin,

    "u1_union_distinct" ->
      """SELECT user_id FROM events WHERE event_type='click'
        |UNION SELECT user_id FROM events WHERE event_type='purchase'""".stripMargin,

    "u3_except" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type='click'
        |EXCEPT SELECT user_id FROM events WHERE event_type='purchase'""".stripMargin,

    "u4_intersect" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type='signup'
        |INTERSECT SELECT user_id FROM events WHERE event_type='error'""".stripMargin,

    "c1_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, count(*) AS n
        |FROM events GROUP BY k""".stripMargin,

    "c2_string_funcs" ->
      """SELECT c_custkey, upper(substr(c_name, 1, 8)) AS prefix,
        |CAST(strpos(c_name, '1') AS BIGINT) AS pos1,
        |concat_ws('-', c_mktsegment, c_custkey) AS tag FROM customer""".stripMargin,

    "c6_regex" ->
      """SELECT doc_id, regexp_extract(text, '([a-z]+)', 1) AS first_word,
        |CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS novowel_len
        |FROM documents""".stripMargin,

    "c8_sha256" ->
      "SELECT doc_id, sha256(text) AS sha FROM documents",

    "c12_date_trunc" ->
      """SELECT CAST(ts AS DATE) AS day, count(*) AS n,
        |CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
        |FROM events GROUP BY 1""".stripMargin,

    "t1_token_stats" ->
      """SELECT doc_id,
        |CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |CAST(len(list_distinct(string_split_regex(lower(trim(text)), '\s+'))) AS BIGINT) AS n_distinct_tokens
        |FROM documents""".stripMargin,

    "t4_fingerprint" ->
      """SELECT doc_id,
        |sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        |FROM documents""".stripMargin,

    // BPE losslessness cross-engine: the oracle recomputes BOTH hashes from
    // the raw text, so Spark's sha_roundtrip (= sha256 of decode(encode(x)))
    // must land exactly on sha256(normalize(x)) for every document — any
    // token lost/garbled by the encoder or merge table breaks the hash.
    "t5_bpe_tokens" ->
      """SELECT doc_id,
        |sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS sha_orig,
        |sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS sha_roundtrip
        |FROM documents""".stripMargin,

    "d1_exact_dedup" ->
      """SELECT sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
        |count(*) AS n_docs, min(doc_id) AS canonical_id
        |FROM documents GROUP BY 1""".stripMargin,

    "d2_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |    ELSE list_transform(range(1, len(ws) - 1),
        |         i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])) END) AS sh
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents)
        |), p AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM sh)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(count(*)::DOUBLE / (any_value(a.n_sh) + any_value(b.n_sh) - count(*)), 6) AS jaccard
        |FROM p a JOIN p b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id
        |HAVING round(count(*)::DOUBLE / (any_value(a.n_sh) + any_value(b.n_sh) - count(*)), 6) >= 0.5""".stripMargin,

    "d5_embed_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 5) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 5) >= 0.5""".stripMargin,

    // MinHash+LSH: the md5-derived double-hash family g_i = h60 + i·h52 is
    // reproduced exactly (h60/h52 = integer value of md5 hex chars 1-15 /
    // 16-28), then banding, bucket join, and exact-Jaccard verification.
    "d3_minhash_lsh" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |    ELSE list_transform(range(1, len(ws) - 1),
        |         i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])) END) AS sh
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents)
        |), p AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
        |ph AS (SELECT doc_id,
        |  list_reduce(list_transform(range(1, 16), i -> CAST(strpos('0123456789abcdef', substring(md5(shingle), CAST(i AS INT), 1)) - 1 AS BIGINT)), (a, b) -> a * 16 + b) AS h1,
        |  list_reduce(list_transform(range(16, 29), i -> CAST(strpos('0123456789abcdef', substring(md5(shingle), CAST(i AS INT), 1)) - 1 AS BIGINT)), (a, b) -> a * 16 + b) AS h2
        |  FROM p),
        |sig AS (SELECT doc_id, i, min(h1 + i * h2) AS h
        |        FROM ph CROSS JOIN (SELECT unnest(range(0, 16)) AS i) GROUP BY doc_id, i),
        |sigarr AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM sig GROUP BY doc_id),
        |banded AS (SELECT doc_id, b, sig[CAST(b*2+1 AS INT):CAST(b*2+2 AS INT)] AS bucket
        |           FROM sigarr CROSS JOIN (SELECT unnest(range(0, 8)) AS b)),
        |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |         FROM banded x JOIN banded y ON x.b = y.b AND x.bucket = y.bucket AND x.doc_id < y.doc_id)
        |SELECT c.id_a, c.id_b,
        |  round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
        |FROM cand c JOIN sh a ON a.doc_id = c.id_a JOIN sh b ON b.doc_id = c.id_b
        |WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= 0.5""".stripMargin,

    // 60-bit md5-derived SimHash, sign-sum per bit, Hamming ≤ 3 pairs.
    "d4_simhash" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok FROM documents),
        |tw AS (SELECT doc_id, tok, count(*)::BIGINT AS w FROM toks GROUP BY doc_id, tok),
        |th AS (SELECT doc_id, w,
        |  list_reduce(list_transform(range(1, 16), i -> CAST(strpos('0123456789abcdef', substring(md5(tok), CAST(i AS INT), 1)) - 1 AS BIGINT)), (a, b) -> a * 16 + b) AS h
        |  FROM tw),
        |bits AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN w ELSE -w END) AS s
        |         FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS b) GROUP BY doc_id, b),
        |sim AS (SELECT doc_id,
        |  sum(CASE WHEN s > 0 THEN (1::BIGINT << CAST(b AS INT)) ELSE 0::BIGINT END)::BIGINT AS simhash
        |  FROM bits GROUP BY doc_id)
        |SELECT x.doc_id AS id_a, y.doc_id AS id_b,
        |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
        |FROM sim x JOIN sim y ON x.doc_id < y.doc_id
        |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3""".stripMargin,

    // Word-4-gram overlap vs the doc_id%97==0 "eval suite"; n-grams are
    // intersected as TRUE strings (Spark joins their 60-bit md5 tokens —
    // a collision would fail this gate loudly).
    "d7_decontaminate" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(ws) < 4 THEN [array_to_string(ws, ' ')]
        |    ELSE list_transform(range(1, len(ws) - 2),
        |         i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3])) END) AS sh
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents)
        |), bench AS (SELECT DISTINCT unnest(sh) AS shingle FROM sh WHERE doc_id % 97 = 0),
        |corp AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM sh WHERE doc_id % 97 <> 0)
        |SELECT c.doc_id, count(*) AS n_shared, any_value(c.n_sh) AS n_sh,
        |  round(count(*)::DOUBLE / any_value(c.n_sh), 6) AS overlap_frac
        |FROM corp c JOIN bench b USING (shingle)
        |GROUP BY c.doc_id""".stripMargin,

    // BM25: every count (tf, df, N, dl) is an exact integer, so the oracle
    // reproduces the identical arithmetic tree; ln rounds per-term at
    // 1e-10 and the document sum at 1e-6 (standard double treatment)
    "t9_bm25" ->
      """WITH base AS (
        |  SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl, ws
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents)),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(dl) AS sumdl FROM base),
        |p AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
        |      FROM (SELECT doc_id, dl, unnest(ws) AS term FROM base)
        |      WHERE term IN ('hash','join','merge','stream') GROUP BY 1, 2, 3),
        |d AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM p GROUP BY 1)
        |SELECT p.doc_id, round(sum(round(
        |    ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * p.tf * (1.2 + 1.0) /
        |    (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * p.dl / (s.sumdl / s.n))), 10)), 6) AS bm25
        |FROM p JOIN d USING (term) CROSS JOIN stats s
        |GROUP BY 1""".stripMargin,

    "t6_repetition" ->
      """SELECT doc_id,
        |  round(1.0 - len(list_distinct(sh))::DOUBLE / len(sh), 6) AS rep_ratio
        |FROM (SELECT doc_id, CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |    ELSE list_transform(range(1, len(ws) - 1),
        |         i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])) END AS sh
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents))""".stripMargin,

    // chunking: 1-based inclusive list slice == Spark slice(toks, s+1, 32)
    "t7_chunk_windows" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '\s+') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(start // 24 AS BIGINT) AS chunk_id,
        |  array_to_string(toks[start+1 : start+32], ' ') AS chunk,
        |  CAST(least(len(toks) - start, 32) AS BIGINT) AS n_tokens
        |FROM tk, LATERAL unnest(generate_series(0, greatest(len(toks) - 32 + 23, 0), 24)) AS g(start)""".stripMargin,

    // packing: same running-offset window rule (exclusive prefix sum)
    "t8_pack_offsets" ->
      """SELECT lang, doc_id, n_tokens,
        |  CAST(COALESCE(SUM(n_tokens) OVER w, 0) AS BIGINT) AS tok_offset,
        |  CAST(COALESCE(SUM(n_tokens) OVER w, 0) // 256 AS BIGINT) AS pack_id
        |FROM (SELECT lang, doc_id,
        |        CAST(len(string_split_regex(trim(coalesce(text, '')), '\s+')) AS BIGINT) AS n_tokens
        |      FROM documents)
        |WINDOW w AS (PARTITION BY lang ORDER BY doc_id, n_tokens
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)""".stripMargin,

    "x1_hash_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '1'""".stripMargin,

    "x2_stratified_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |WHERE rn <= (n * 10 + 99) // 100""".stripMargin,

    // Connected components over the jaccard pairs: recursive transitive
    // closure, component label = min reachable id.
    "d6_dup_groups" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |    ELSE list_transform(range(1, len(ws) - 1),
        |         i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])) END) AS sh
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents)
        |), p AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM p a JOIN p b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |  HAVING round(count(*)::DOUBLE / (any_value(a.n_sh) + any_value(b.n_sh) - count(*)), 6) >= 0.5),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach AS (SELECT a, b FROM edges
        |          UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a)
        |SELECT a AS doc_id, least(a, min(b)) AS group_id FROM reach GROUP BY a""".stripMargin,

    // Tree-flatten: the expected node rows computed relationally (the Spark
    // side must round-trip source→lang→doc through REAL nested JSON).
    "a1_tree_flatten" ->
      """SELECT CAST(0 AS BIGINT) AS depth, source AS name, CAST(NULL AS VARCHAR) AS parent
        |FROM (SELECT DISTINCT source FROM documents)
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), lang, source FROM (SELECT DISTINCT source, lang FROM documents)
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'doc-' || doc_id, lang FROM documents""".stripMargin,

    "g1_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS qty,
        |CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "g2_cube" ->
      """SELECT event_type, user_id, count(*) AS n,
        |CAST(GROUPING(event_type) * 2 + GROUPING(user_id) AS BIGINT) AS gid
        |FROM events GROUP BY CUBE(event_type, user_id)""".stripMargin,

    // HLL error-bound oracle: exact distinct + the bound assertion as a
    // literal TRUE — the Spark side computes within_rsd from its own
    // estimate, so a drifting sketch fails the hash compare
    "h1_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders,
        |TRUE AS within_rsd FROM lineitem GROUP BY l_returnflag""".stripMargin,

    // Flagship CDC replay: the SAME deterministic change-log derivation as
    // the Spark side, folded by pure-SQL last-writer-wins (row_number over
    // seq DESC) + delete filter + sha256 — reference A4 semantics
    // (PantherLocalWrapper.java:211-225, delete propagation :385-391).
    // size_bytes is NULL for epoch-0 payloads (field added in epoch 1).
    "cdc_replay_mini" ->
      """WITH ev AS (
        |  SELECT event_id AS seq,
        |    CASE WHEN event_type='error' THEN 'D' ELSE 'U' END AS op,
        |    'r' || (user_id % 7) AS repo,
        |    'p' || (event_id % 211) AS path,
        |    event_id % 3 AS sid,
        |    'c' || event_id AS commit,
        |    event_type AS language,
        |    'content-' || event_id || '-' || event_type AS content
        |  FROM events),
        |w AS (SELECT * FROM ev
        |      QUALIFY row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) = 1)
        |SELECT repo, path, seq, commit, language,
        |  CASE WHEN sid = 0 THEN NULL ELSE CAST(length(content) AS BIGINT) END AS size_bytes,
        |  sha256(content) AS sha
        |FROM w WHERE op <> 'D'""".stripMargin,

    "h3_kmv_distinct" ->
      """WITH dh AS (
        |  SELECT DISTINCT l_returnflag,
        |    list_reduce(list_transform(range(1, 16), i -> CAST(strpos('0123456789abcdef', substring(md5(CAST(l_orderkey AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT)), (a, b) -> a * 16 + b) AS h
        |  FROM lineitem
        |), ranked AS (
        |  SELECT l_returnflag, h,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM dh)
        |SELECT l_returnflag,
        |  CAST(CASE WHEN max(n) < 256 THEN max(n)
        |    ELSE floor(255.0 * 1152921504606846976.0 /
        |         CAST(greatest(max(CASE WHEN rn = 256 THEN h END), 1) AS DOUBLE)) END AS BIGINT)
        |    AS kmv_distinct
        |FROM ranked GROUP BY l_returnflag""".stripMargin,

    "h2_percentile" ->
      """SELECT l_returnflag,
        |round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |round(quantile_cont(l_quantity, 0.95), 4) AS p95
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
        |CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
        |CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
        |count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "tpch_q3" ->
      """SELECT o_orderkey,
        |CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "tpch_q5" ->
      """SELECT n_name,
        |CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name""".stripMargin,

    "tpch_q6" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
        |count(*) AS n FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |AND l_discount BETWEEN 0.04 AND 0.07 AND l_quantity < 24""".stripMargin,

    "tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |GROUP BY o_orderpriority""".stripMargin,

    "tpch_q14" ->
      """SELECT
        |CAST(round(sum(CASE WHEN p_type = 'PROMO'
        |  THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) ELSE 0 END), 2) AS DOUBLE) AS promo_revenue,
        |CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'""".stripMargin,

    "c10_array_ops" ->
      """SELECT doc_id,
        |array_to_string(list_sort(list_distinct(string_split_regex(lower(trim(text)), '\s+')))[1:3], ',') AS first3,
        |CAST(len(list_distinct(string_split_regex(lower(trim(text)), '\s+'))) AS BIGINT) AS n_distinct
        |FROM documents""".stripMargin,

    "a8_distinct_union" ->
      """SELECT lang, count(DISTINCT w) AS n_words FROM (
        |  SELECT lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |  FROM documents) GROUP BY lang""".stripMargin,

    "t2_quality" ->
      """SELECT doc_id, round(
        |  least(CASE WHEN nw >= 10 AND nw <= 100000 THEN 1.0
        |             WHEN nw > 100000 THEN 100000.0/nw ELSE nw/10.0 END, 1.0)*0.25 +
        |  (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.25 END)*0.25 +
        |  least(ar, 1.0)*0.25 + least(dr*2.0, 1.0)*0.25, 4) AS quality
        |FROM (SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS nw,
        |  CAST(length(text) AS DOUBLE) /
        |    greatest(CAST(len(string_split_regex(trim(text),'\s+')) AS DOUBLE), 1.0) AS mwl,
        |  CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE) /
        |    greatest(CAST(len(string_split_regex(trim(text),'\s+')) AS DOUBLE), 1.0) AS dr,
        |  CAST(length(regexp_replace(text, '[^\p{L}\p{Nd}\s]', '', 'g')) AS DOUBLE) /
        |    greatest(CAST(length(text) AS DOUBLE), 1.0) AS ar
        | FROM documents)""".stripMargin,

    "t3_langid" ->
      """WITH profiles(plang, words) AS (VALUES
        |  ('de', ['der','die','das','und','von','zu','mit','den','ist','nicht']),
        |  ('en', ['the','a','of','and','to','in','is','that','it','for']),
        |  ('es', ['el','la','de','que','y','en','un','los','se','por']),
        |  ('fr', ['le','la','de','et','les','des','un','une','que','dans']),
        |  ('zh', ['的','是','在','了','和','有','我','不','这','他'])
        |), scored AS (
        |  SELECT d.doc_id, d.lang, p.plang,
        |    len(list_intersect(string_split_regex(lower(d.text), '\s+'), p.words))
        |    + CASE WHEN p.plang = 'zh'
        |        THEN len(list_filter(p.words, w -> contains(d.text, w))) ELSE 0 END AS score
        |  FROM documents d CROSS JOIN profiles p
        |), ranked AS (
        |  SELECT doc_id, lang, plang, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang ASC) AS rn
        |  FROM scored)
        |SELECT doc_id, lang, CASE WHEN score > 0 THEN plang ELSE 'und' END AS lang_pred
        |FROM ranked WHERE rn = 1""".stripMargin,

    "m1_multimodal" ->
      """SELECT doc_id AS media_id,
        |CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |sha256(text) AS checksum
        |FROM documents""".stripMargin,

    "s1_ann_bruteforce" ->
      """SELECT query_id, rank, neighbor_id, cos FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 5) AS cos,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 5) DESC,
        |               c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        |  WHERE q.vec_id < 10) WHERE rank <= 5""".stripMargin,

    // Full re-derivation of the hyperplane LSH: planes from the SAME
    // md5("42:t:b:d")-derived family (13 hex digits = exact 52-bit int,
    // /2^52*2-1 is all power-of-two arithmetic, so both engines hold
    // bit-identical doubles), sign-bit signatures per table, candidates
    // share (t, sig), exact cosine rerank — the oracle checks the
    // CANDIDATE SET, not just the scores.
    "s2_ann_lsh" ->
      """WITH planes AS (
        |  SELECT t, b, list(comp ORDER BY d) AS plane FROM (
        |    SELECT t, b, d,
        |      list_reduce(list_transform(range(1, 14), i ->
        |        CAST(strpos('0123456789abcdef',
        |          substring(md5('42:' || t || ':' || b || ':' || d), CAST(i AS INT), 1)) - 1 AS BIGINT)),
        |        (a, x) -> a * 16 + x) / 4503599627370496.0 * 2 - 1 AS comp
        |    FROM (SELECT unnest(range(0, 16)) AS t),
        |         (SELECT unnest(range(0, 4)) AS b),
        |         (SELECT unnest(range(0, 64)) AS d))
        |  GROUP BY t, b),
        |ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |sigs AS (
        |  SELECT e.vec_id, p.t,
        |    CAST(sum(CASE WHEN
        |      list_reduce(list_transform(range(1, 65),
        |        i -> e.v[CAST(i AS INT)] * p.plane[CAST(i AS INT)]), (a, x) -> a + x) > 0
        |      THEN 1 << CAST(p.b AS INT) ELSE 0 END) AS INT) AS sig
        |  FROM ev e CROSS JOIN planes p GROUP BY e.vec_id, p.t),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM sigs q JOIN sigs c ON q.t = c.t AND q.sig = c.sig
        |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |scored AS (
        |  SELECT cd.query_id, cd.neighbor_id,
        |    round(list_cosine_similarity(q.v, n.v), 5) AS cos
        |  FROM cand cd JOIN ev q ON q.vec_id = cd.query_id
        |               JOIN ev n ON n.vec_id = cd.neighbor_id)
        |SELECT query_id, rank, neighbor_id, cos FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM scored) WHERE rank <= 5""".stripMargin,

    // IVF with the deterministic codebook (centroids = corpus vectors
    // 0..7): cell assignment by squared distance re-derived in SQL (same
    // fold order ⇒ bit-identical doubles ⇒ identical argmin / probe
    // sets), nProbe=3 probing, exact cosine rerank.
    "s3_ann_ivf" ->
      """WITH ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |codebook AS (SELECT vec_id AS cell, v AS c FROM ev WHERE vec_id < 8),
        |cd AS (
        |  SELECT e.vec_id, cb.cell,
        |    list_reduce(list_transform(range(1, 65),
        |      i -> (e.v[CAST(i AS INT)] - cb.c[CAST(i AS INT)]) *
        |           (e.v[CAST(i AS INT)] - cb.c[CAST(i AS INT)])), (a, x) -> a + x) AS d
        |  FROM ev e CROSS JOIN codebook cb),
        |assign AS (SELECT vec_id, cell FROM (
        |  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        |  FROM cd) WHERE rn = 1),
        |probes AS (SELECT vec_id AS query_id, cell FROM (
        |  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        |  FROM cd WHERE vec_id < 10) WHERE rn <= 3),
        |cand AS (
        |  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
        |  FROM probes p JOIN assign a ON a.cell = p.cell
        |  WHERE a.vec_id <> p.query_id),
        |scored AS (
        |  SELECT cd2.query_id, cd2.neighbor_id,
        |    round(list_cosine_similarity(q.v, n.v), 5) AS cos
        |  FROM cand cd2 JOIN ev q ON q.vec_id = cd2.query_id
        |                JOIN ev n ON n.vec_id = cd2.neighbor_id)
        |SELECT query_id, rank, neighbor_id, cos FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM scored) WHERE rank <= 5""".stripMargin
  )
}
