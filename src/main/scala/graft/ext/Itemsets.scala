package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent co-occurring token pairs — a-priori pruned (Agrawal &
  * Srikant VLDB'94): collocation mining / tag co-occurrence over a
  * corpus, with the candidate explosion killed BEFORE the pair join.
  *
  * The monotonicity lemma does the work: a pair can only reach
  * `minSupport` document frequency if BOTH members do, so the per-doc
  * token sets are filtered to frequent singletons first. That filter
  * bounds everything downstream:
  *   - the frequent-singleton table has ≤ N_docs·L / minSupport rows
  *     (each survivor needs minSupport distinct docs) — broadcastable
  *     by construction at any corpus size for non-trivial support;
  *   - the intra-doc pair join fans out C(f_d, 2) per doc with f_d =
  *     the doc's FREQUENT tokens only, not its length;
  *   - the pair count is one (t1, t2)-keyed partial-agg shuffle.
  *
  * Exactness: document frequencies are distinct-doc integer counts;
  * the gate is hash-exact with no tolerance anywhere.
  */
object Itemsets {

  /** Pairs of tokens co-occurring in ≥ `minSupport` documents:
    * (t1, t2, pair_df), t1 < t2 lexicographically.
    */
  def frequentPairs(df: DataFrame, idCol: String, textCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"support must be >= 1, got $minSupport")
    val toks = df.select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), "[^a-z]+")).as("t"))
      .filter(col("t") =!= "")
      .distinct()
    val frequent = toks.groupBy(col("t"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minSupport)
      .select(col("t"))
    val ft = toks.join(broadcast(frequent), "t")
    ft.select(col("id"), col("t").as("ta"))
      .join(ft.select(col("id"), col("t").as("tb")), "id")
      .filter(col("ta") < col("tb"))
      .groupBy(col("ta").as("t1"), col("tb").as("t2"))
      .agg(count(lit(1)).as("pair_df"))
      .filter(col("pair_df") >= minSupport)
  }

  /** Directed association rules from the frequent pairs: for each
    * frequent pair, both `a → b` rows with
    * confidence = pair_df / df(a) and
    * lift = pair_df · n_docs / (df(a) · df(b)) — "docs tagged A are
    * c% likely to also be tagged B, l× over independence", the
    * actionable form of [[frequentPairs]]'s counts.
    *
    * Output: (antecedent, consequent, pair_df, df_a, df_c,
    * confidence, lift). All counts are exact distinct-doc integers;
    * the singleton-df table is bounded exactly like the frequent set
    * (≤ N·L/minSupport rows) so both direction joins broadcast it;
    * the two final divisions are one fixed IEEE tree.
    */
  def associationRules(df: DataFrame, idCol: String, textCol: String,
      minSupport: Long): DataFrame = {
    val pairs = frequentPairs(df, idCol, textCol, minSupport)
    val toks = df.select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), "[^a-z]+")).as("t"))
      .filter(col("t") =!= "")
      .distinct()
    val dfs = toks.groupBy(col("t")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minSupport)
    val nDocs = df.agg(countDistinct(col(idCol)).as("n_docs"))
    val directed = pairs.select(col("t1").as("antecedent"),
        col("t2").as("consequent"), col("pair_df"))
      .unionByName(pairs.select(col("t2").as("antecedent"),
        col("t1").as("consequent"), col("pair_df")))
    directed
      .join(broadcast(dfs.select(col("t").as("antecedent"),
        col("df").as("df_a"))), "antecedent")
      .join(broadcast(dfs.select(col("t").as("consequent"),
        col("df").as("df_c"))), "consequent")
      .crossJoin(broadcast(nDocs))
      .select(col("antecedent"), col("consequent"), col("pair_df"),
        col("df_a"), col("df_c"),
        round(col("pair_df").cast("double") / col("df_a"), 6)
          .as("confidence"),
        round(col("pair_df").cast("double") * col("n_docs") /
          (col("df_a").cast("double") * col("df_c")), 6).as("lift"))
  }
}
