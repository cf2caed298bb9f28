package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-engineering operators for model-training tables: leakage-
  * proof target encoding and categorical mutual information.
  *
  * Both are one keyed partial-aggregate shuffle (category / cell
  * domain) with exact integer/decimal statistics; the per-row apply is
  * a broadcast join, so the data table never shuffles.
  */
object Encode {

  private def d6(c: Column): Column = round(c, 6)

  /** Leave-one-out target encoding of `catCol` against numeric
    * `targetCol`: each row gets (Σ_cat − own) / (n_cat − 1) — its
    * category's target mean EXCLUDING itself, the standard guard
    * against the encoded feature leaking its own label. Categories
    * with a single row fall back to the global LOO mean. Sums are
    * exact decimals of 6-dp values; one division per row.
    *
    * Output: idCol, catCol, target_r (6 dp), enc.
    */
  def targetEncodeLoo(df: DataFrame, idCol: String, catCol: String,
      targetCol: String): DataFrame = {
    val in = df.select(col(idCol), col(catCol),
      d6(col(targetCol)).cast("decimal(18,6)").as("y"))
    val cat = in.groupBy(col(catCol))
      .agg(count(lit(1)).as("nc"), sum(col("y")).cast("decimal(38,12)").as("sc"))
    val glob = in.agg(count(lit(1)).as("ng"),
      sum(col("y")).cast("decimal(38,12)").as("sg"))
    in.join(broadcast(cat), catCol)
      .crossJoin(broadcast(glob))
      .select(col(idCol), col(catCol), col("y").cast("double").as("target_r"),
        d6(when(col("nc") > 1,
          (col("sc") - col("y")).cast("double") / (col("nc") - lit(1)))
          .otherwise(
            (col("sg") - col("y")).cast("double") / (col("ng") - lit(1))))
          .as("enc"))
  }

  /** Mutual information (nats) between two categorical columns:
    * I = Σ_xy p_xy·ln(p_xy·N² / (n_x·n_y·N)) … computed per cell as
    * ln of an exact-integer rational (c_xy·N)/(c_x·c_y), weighted by
    * c_xy/N, each term rounded at 9 dp and decimal-summed so
    * accumulation order cannot move the 6-dp result (the [[Divergence]]
    * pattern). One cells-bounded shuffle. Output one row:
    * (n, n_cells, mi).
    */
  def mutualInfo(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("cxy"))
    val ma = cells.groupBy("a").agg(sum("cxy").cast("long").as("ca"))
    val mb = cells.groupBy("b").agg(sum("cxy").cast("long").as("cb"))
    val n = cells.agg(sum("cxy").cast("long").as("n"))
    cells.join(broadcast(ma), "a").join(broadcast(mb), "b")
      .crossJoin(broadcast(n))
      .withColumn("term",
        round(col("cxy").cast("double") / col("n") *
          log(col("cxy").cast("double") * col("n") /
            (col("ca").cast("double") * col("cb"))), 9)
          .cast("decimal(28,9)"))
      .agg(max(col("n")).as("n"), count(lit(1)).as("n_cells"),
        d6(sum(col("term")).cast("double")).as("mi"))
  }
}
