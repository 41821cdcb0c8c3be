package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data shaping operators: token-window CHUNKING (long documents →
  * overlapping context windows) and sequence PACKING (documents → ~fixed
  * token-budget training shards). The two standard LLM-corpus ops between
  * dedup/quality filtering and tokenized output.
  *
  * Both are pure Catalyst (split/sequence/slice/window — codegen'd, no
  * UDFs) and deterministic, so the DuckDB oracles reproduce them
  * cell-exactly.
  *
  * Scale notes (100 TB): [[chunkByTokens]] is embarrassingly parallel —
  * one narrow projection + generator explode, NO shuffle, output streams
  * through whole-stage codegen. [[packByTokens]] needs a running offset,
  * i.e. ONE shuffle on the group key and a per-group sort — grouping
  * (e.g. by lang, or by a hash-prefix salt for a single logical corpus)
  * bounds each window partition; the offset rule (below) is what makes
  * packing a single window scan instead of a sequential fold.
  */
object ChunkOps {

  // NULL text ≡ empty text (one empty-token window / zero-ish weight) —
  // without the coalesce, Spark's null-skipping greatest/least would
  // fabricate a phantom maxTokens-long window for a NULL document, and
  // packByTokens' running SUM would silently skip its NULL token count
  private def toks(textCol: Column): Column =
    split(trim(coalesce(textCol, lit(""))), "\\s+")

  /** Split each document into windows of `maxTokens` whitespace tokens,
    * consecutive windows sharing `overlap` tokens (stride = maxTokens −
    * overlap). The final window may be shorter; every token appears in at
    * least one window. Output: (id, chunk_id, chunk, n_tokens).
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got overlap=$overlap maxTokens=$maxTokens")
    val step = maxTokens - overlap
    df.select(col(idCol), toks(col(textCol)).as("_toks"))
      .withColumn("_n", size(col("_toks")))
      // window starts 0, step, 2·step …, stopping at the FIRST start whose
      // window reaches the document end (inclusive bound n − maxTokens +
      // step − 1; for overlap = 0 that is n − 1, the old bound). Running
      // past it would emit trailing windows fully CONTAINED in the
      // previous one — duplicated training text that double-weights the
      // document tail. Empty docs still yield one window (split("") is a
      // single empty token in both engines).
      .select(col(idCol), col("_toks"), col("_n"),
        explode(sequence(lit(0),
          greatest(col("_n") - maxTokens + (step - 1), lit(0)), lit(step)))
          .as("_start"))
      .select(
        col(idCol),
        (col("_start") / step).cast("long").as("chunk_id"),
        array_join(slice(col("_toks"), col("_start") + 1, lit(maxTokens)), " ").as("chunk"),
        least(col("_n") - col("_start"), lit(maxTokens)).cast("long").as("n_tokens"))
  }

  /** Assign each document to a training pack by its cumulative token
    * OFFSET within its group: `pack_id = floor(offset / targetTokens)`
    * over documents ordered by `idCol` inside `groupCol`. Packs are
    * contiguous runs of documents; a pack can overflow `targetTokens` by
    * at most its last document (offset sharding — the standard
    * sequence-packing rule, chosen over exact first-fit because it is one
    * window scan, deterministic, and SQL-reproducible; exact first-fit is
    * a sequential fold no engine parallelizes).
    * Output: (group, id, n_tokens, tok_offset, pack_id).
    */
  def packByTokens(df: DataFrame, idCol: String, textCol: String,
                   groupCol: String, targetTokens: Long): DataFrame = {
    require(targetTokens > 0, s"targetTokens must be positive, got $targetTokens")
    // n_tokens joins the sort key: with DUPLICATE ids, ordering by id
    // alone leaves the running sum free to assign tie rows different
    // offsets per run — (id, n_tokens) makes the OUTPUT deterministic
    // (rows tying on both are interchangeable in every output column)
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol), col("n_tokens"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(groupCol), col(idCol),
        size(toks(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("tok_offset", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("pack_id", (col("tok_offset") / targetTokens).cast("long"))
  }
}
