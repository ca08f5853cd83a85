package graft.tools

import graft.pipeline.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: recall@10 of each approximate ANN path vs the exact brute
  * baseline on the embeddings table — for tuning gate floors
  * (`usage: runMain graft.tools.AnnRecall [sfDir]`). Not part of the driver
  * contract.
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-ann-recall")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id").cast("long"), col("cand_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(e, q, 10))
    def report(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = pairs(df)
      println(f"$name%-12s recall=${(brute intersect p).size.toDouble / brute.size}%.3f")
    }
    report("lsh", Similarity.lshTopK(e, q, 10, dim = 64))
    report("ivf", Similarity.ivfTopK(e, q, 10))
    for (nSub <- Seq(4, 8, 16); k <- Seq(16, 32)) {
      val cb = Similarity.pqFit(e, nSub = nSub, k = k)
      report(s"ivfpq_${nSub}x$k",
        Similarity.ivfPqTopK(e, q, 10, cb))
    }
    spark.stop()
  }
}
