package graft.tools

import org.apache.spark.sql.SparkSession

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val he = graft.sources.TpchBridge.hashGraphEdges(spark, "/tmp/sf10")
    println("DRIVE hashGraphEdges sf10 count = " + he.count())
    spark.stop()
  }
}
