package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, scale-first:
  *
  *  - [[exactGroups]] — hash-groupBy; one shuffle on a 64-hex key.
  *  - [[jaccardPairs]] — exact n-gram Jaccard via shingle-inverted-index
  *    self-join (the scalable exact method: pairs only materialize for
  *    docs sharing ≥1 shingle, never O(N²) over the corpus).
  *  - [[minhashLshPairs]] — MinHash signatures + banded LSH: candidate
  *    pairs come from band-bucket joins (sub-linear), then are verified
  *    with exact Jaccard. The 100-TB path.
  *  - [[simhash]] / [[simhashPairs]] — 64-bit SimHash + Hamming ball.
  *
  * All hashing is Spark-built-in (xxhash64 with a per-permutation literal
  * salt) — deterministic across runs and cluster sizes.
  */
object DedupOps {

  /** Exact-duplicate groups by normalized-text fingerprint:
    * (fingerprint, n_dups, canonical_id = min id).
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextOps.fingerprint(col(textCol)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("canonical_id"))

  /** Doc → exploded distinct shingles (the inverted-index postings). */
  private def postings(df: DataFrame, idCol: String, textCol: String, n: Int) =
    df.select(col(idCol).as("id"),
        array_distinct(TextOps.shingles(col(textCol), n)).as("sh"))
      .select(col("id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("shingle"))

  /** Exact n-gram Jaccard ≥ threshold pairs (id_a < id_b), via inverted
    * index: group postings by shingle, emit co-occurring pairs, count
    * intersections, compute |A∩B| / (|A|+|B|-|A∩B|).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val p = postings(df, idCol, textCol, n)
    val a = p.select(col("shingle"), col("id").as("id_a"), col("n_sh").as("n_a"))
    val b = p.select(col("shingle"), col("id").as("id_b"), col("n_sh").as("n_b"))
    a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        round(col("common").cast("double") /
          (col("n_a") + col("n_b") - col("common")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Prefix-filtered exact Jaccard (same output as [[jaccardPairs]], much
    * smaller candidate set): order each doc's shingles by global rarity;
    * two docs with Jaccard ≥ t must share at least one of each other's
    * first ⌊(1-t)·|S|⌋+1 shingles (prefix-filter principle, AllPairs/
    * PPJoin family), so candidates come from joining only the prefixes.
    * Candidates are then verified with the true intersection via
    * array_intersect over the full shingle sets.
    */
  def jaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String,
                         n: Int = 3, threshold: Double = 0.8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // postings feed both the document-frequency pass and the ranking pass
    val p = postings(df, idCol, textCol, n).persist()
    val freq = p.groupBy("shingle").agg(count(lit(1)).as("df"))
    val ranked = p.join(freq, "shingle")
      .withColumn("rnk", row_number().over(
        Window.partitionBy("id").orderBy(col("df"), col("shingle"))))
      .filter(col("rnk") <= floor(lit(1.0 - threshold) * col("n_sh")) + 1)
    val a = ranked.select(col("shingle"), col("id").as("id_a"))
    val b = ranked.select(col("shingle"), col("id").as("id_b"))
    val cand = a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val sets = df.select(col(idCol).as("id"),
      array_distinct(TextOps.shingles(col(textCol), n)).as("sh"))
    cand
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", round(col("common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signature column: array of `numHashes` minima of
    * xxhash64(shingle, perm-salt).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, numHashes: Int = 32): DataFrame = {
    val p = postings(df, idCol, textCol, n)
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(col("shingle"), lit(i))).as(s"h$i"))
    p.groupBy(col("id"), col("n_sh"))
      .agg(mins.head, mins.tail: _*)
      .select(col("id"), col("n_sh"),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** MinHash + banded LSH candidate pairs, verified with exact Jaccard.
    * bands × rowsPerBand = numHashes; a pair is a candidate iff any band's
    * sub-signature matches (bucket equi-join — no cross product).
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 32, bands: Int = 8,
                      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = minhashSignatures(df, idCol, textCol, n, numHashes)
    val banded = sig.select(col("id"), explode(
      array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          hash(slice(col("sig"), b * rows + 1, rows)).as("bucket"))): _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
    val cand = banded.as("x").join(banded.as("y"), Seq("band", "bucket"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    // verify candidates with exact Jaccard (join back through the index)
    val exact = jaccardPairs(df, idCol, textCol, n, threshold)
    cand.join(exact, Seq("id_a", "id_b")) // inner: candidates that verify
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash per doc: sign-sum of token-hash bits weighted by term
    * frequency, computed as 64 conditional sums in one aggregation pass.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = df.select(col(idCol).as("id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("w"))
      .withColumn("th", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("th"), b).bitwiseAND(lit(1L)) === 1L, col("w"))
        .otherwise(-col("w"))).as(s"b$b")
    }
    val agg = tokens.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sh = (0 until 64).map(b =>
        when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    agg.select(col("id"), sh.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist. Blocking: two
    * docs within Hamming k of each other share at least one of k+1 equal
    * 64/(k+1)-bit chunks (pigeonhole) — join on chunks, then verify with
    * bit_count(xor).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    val chunks = maxDist + 1
    val width = 64 / chunks
    val sh = simhash(df, idCol, textCol)
    val blocked = sh.select(col("id"), col("simhash"), explode(
      array((0 until chunks).map(c => struct(lit(c).as("c"),
        shiftrightunsigned(col("simhash"), c * width)
          .bitwiseAND(lit((1L << width) - 1)).as("chunk"))): _*)).as("bc"))
      .select(col("id"), col("simhash"), col("bc.c"), col("bc.chunk"))
    blocked.as("x").join(blocked.as("y"), Seq("c", "chunk"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
