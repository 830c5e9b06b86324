package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: materialise a small input_hint page table for spark-submit
  * smoke tests of [[graft.pipeline.Main]]. */
object MkPages {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.pipeline.Corpus.pages(spark, "/root/testdata/sf0.001").limit(100)
      .repartition(4).write.mode("overwrite").parquet(args(0))
    spark.stop()
  }
}
