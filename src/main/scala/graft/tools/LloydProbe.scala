package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}
import graft.ext.Similarity

/** One-off measurement: IVF recall vs brute force as Lloyd iterations
  * accumulate on the sf0.01 fixture (documents SCALE.md's training
  * payoff claim with numbers instead of hope).
  */
object LloydProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.filter(col("id") % 25 === 0)
    def pairs(df: DataFrame) = df
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(queries, emb, k = 3))
    var cents = emb.filter(col("id") % 50 === 7)
    (0 to 3).foreach { it =>
      val got = pairs(Similarity.ivfTopK(queries, emb, cents, k = 3, nProbe = 4))
      println(f"[lloyd] iters=$it recall=${(brute & got).size.toDouble / brute.size}%.4f")
      cents = Similarity.lloydStep(emb, cents).localCheckpoint(true)
    }
    spark.stop()
  }
}
