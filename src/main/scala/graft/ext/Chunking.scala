package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the retrieval/indexing prep step
  * (RAG corpora, context-window packing precursors): split every
  * document into `size`-token windows advancing by `stride` tokens
  * (stride < size ⇒ overlap), each chunk carrying its position and a
  * content fingerprint.
  *
  * Pure array-expression plan: tokens once per row, `sequence()` for
  * the start offsets, one `posexplode` — no UDF, no shuffle at all
  * until the caller aggregates (chunking is embarrassingly row-local,
  * and at 100 TB it must stay inside the scan's codegen stage, which
  * this does). Row growth is ~n/stride per document — the caller's
  * budget, made visible by `chunk_ix`.
  *
  * Chunk rule: starts are 0, stride, 2·stride … strictly below the
  * token count (an empty-trimmed document has ONE token by the
  * engine-wide `tokens` convention, hence exactly one chunk); the last
  * chunk truncates at the document end.
  */
object Chunking {

  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1 && stride >= 1,
      s"size/stride must be >= 1: $chunkSize/$stride")
    val toks = TextStats.tokens(col(textCol))
    val starts = sequence(lit(0), size(toks) - 1, lit(stride))
    df.select(col(idCol), toks.as("__toks"), starts.as("__starts"))
      .select(col(idCol), col("__toks"),
        posexplode(col("__starts")).as(Seq("chunk_ix", "start_tok")))
      .select(
        col(idCol),
        col("chunk_ix"),
        col("start_tok"),
        least(size(col("__toks")) - col("start_tok"), lit(chunkSize)).as("n_tok"),
        substring(md5(concat_ws(" ",
          slice(col("__toks"), col("start_tok") + 1, lit(chunkSize)))), 1, 16)
          .as("chunk_fp"))
  }

  /** Per-document chunking budget report: chunk count and the token
    * overlap factor (total chunked tokens / document tokens) — what a
    * corpus build publishes before paying the storage for overlap.
    */
  def chunkBudget(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame =
    chunkTokens(df, idCol, textCol, chunkSize, stride)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_tok")).as("chunked_tokens"))
}
