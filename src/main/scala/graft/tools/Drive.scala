package graft.tools

import org.apache.spark.sql.SparkSession

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("QUERIES", "alg_closeness").split(",")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = graft.Queries.queries(n)(spark, sf)
      if (sys.env.contains("EXPLAIN")) println("PLAN\n" + df.queryExecution.executedPlan.toString.take(12000))
      val c = df.count()
      println(f"DRIVE $n rows=$c sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
  }
}
