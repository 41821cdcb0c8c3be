package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relevance-ranking operators for retrieval-style corpus queries. */
object RankOps {

  /** BM25 score of every document against a bag-of-words `query` —
    * the standard retrieval/quality-ranking primitive (Robertson–Spärck
    * Jones idf in its non-negative ln(1 + ·) form, the Lucene default):
    *
    *   score(D,Q) = Σ_{t∈Q} ln(1 + (N − df + 0.5)/(df + 0.5))
    *                · tf·(k1+1) / (tf + k1·(1 − b + b·|D|/avgdl))
    *
    * Scale shape — the corpus NEVER shuffles wide:
    *  - corpus stats (N, Σ|D|) are one tiny global aggregate;
    *  - the term filter applies BEFORE the tf groupBy, so the only
    *    corpus-sized shuffle carries just (doc, query-term) hits;
    *  - df and the stats row are single-digit-row broadcasts back onto
    *    the postings.
    *
    * Tokenization is the engine-wide normalization (lower, split on
    * `\s+`) so DuckDB mirrors it exactly; tf/df/N/|D| are all exact
    * integers, so the only cross-engine wiggle is `ln` — per-term scores
    * round at 1e-10 and the final sum at 1e-6, the repo's standard
    * double-oracle treatment. Output: one row per document containing at
    * least one query term — (idCol, bm25 DESC-ranked by the caller).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String, query: String,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = query.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(terms.nonEmpty, "bm25 needs a non-empty query")
    val base = docs.select(col(idCol),
        split(lower(trim(col(textCol))), "\\s+").as("_ws"))
      .select(col(idCol), col("_ws"), size(col("_ws")).cast("double").as("_dl"))
    val stats = base.agg(count(lit(1)).cast("double").as("_n"),
      sum(col("_dl")).as("_sumdl")) // integer-valued doubles: exact sum
    val postings = base
      .select(col(idCol), col("_dl"), explode(col("_ws")).as("_term"))
      .filter(col("_term").isin(terms: _*)) // prune BEFORE the shuffle
      .groupBy(col(idCol), col("_dl"), col("_term"))
      .agg(count(lit(1)).cast("double").as("_tf"))
    val dfreq = postings.groupBy("_term")
      .agg(count(lit(1)).cast("double").as("_df"))
    postings
      .join(broadcast(dfreq), "_term")
      .crossJoin(broadcast(stats))
      // expression trees mirror the SQL oracle token-for-token so every
      // arithmetic step hits the same IEEE operation sequence
      .withColumn("_idf",
        log(lit(1.0) + (col("_n") - col("_df") + lit(0.5)) / (col("_df") + lit(0.5))))
      .withColumn("_s", round(
        col("_idf") * col("_tf") * lit(k1 + 1.0) /
          (col("_tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("_dl") / (col("_sumdl") / col("_n")))),
        10))
      .groupBy(col(idCol))
      .agg(round(sum(col("_s")), 6).as("bm25"))
  }
}
