package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}

/** One-off measurement for the nearest-centroid ASSIGNMENT plan shape
  * (semDeDup / ivfTopK stage 1): row_number window top-1 (rewritten to
  * the bounded-heap TopKPerKey pair) vs `min(struct)` partial-agg
  * argmin (the Spatial.nearestBroadcast idiom), on a 10x-replicated
  * sf0.1 embedding corpus — the bench's scaled shape. Digests must
  * match (same assignment); wall time and the printed plans decide
  * which form the operators keep.
  */
object AssignProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.register(spark)
    val emb0 = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val emb = (0 until 10)
      .map(r => emb0.select((col("id") + lit(r * 1000000000L)).as("id"), col("vec")))
      .reduce(_ union _)
    val cents = broadcast(emb0.filter(col("id") % 50 === 7)
      .select(col("id").as("cent_id"), col("vec").cast("array<double>").as("cvec")))
    val scored = emb
      .select(col("id").as("vec_id"), col("vec").cast("array<double>").as("v"))
      .crossJoin(cents)
      .withColumn("csim",
        round(graft.functions.VectorExpressions.vecCosine(col("v"), col("cvec")), 4))

    val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cent_id"))
    val winForm = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 1)
      .select(col("vec_id"), col("v"), col("cent_id").as("cell"))
    val aggForm = scored.groupBy("vec_id")
      .agg(min(struct((-col("csim")).as("nsim"), col("cent_id").as("cell"),
        col("v").as("v"))).as("best"))
      .select(col("vec_id"), col("best.v").as("v"), col("best.cell").as("cell"))

    def digest(df: DataFrame): Long =
      df.agg(sum(hash(col("vec_id"), col("cell")).cast("long"))).head().getLong(0)
    def time(tag: String, df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val d = digest(df)
      println(f"[assign] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s digest=$d")
    }
    println("--- window plan (expect TopKPerKey) ---")
    winForm.explain("formatted")
    println("--- min(struct) plan ---")
    aggForm.explain("formatted")
    (1 to 2).foreach { _ => time("window-top1", winForm); time("min-struct", aggForm) }
    spark.stop()
  }
}
