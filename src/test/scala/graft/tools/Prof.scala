package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.mutable

/** Throwaway profiling harness (verify-skill recipe): runs named declared
  * queries with the Bench session posture and prints a per-job timing
  * breakdown, so we can tell iteration-floor (many small jobs) from real
  * compute (few big jobs). Not part of the build contract; delete after. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", "256"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .config("spark.sql.codegen.maxFields",
        sys.env.getOrElse("SPARK_GRAFT_MAXFIELDS", "100"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.TpchBridge.graph(spark, sfDir).edges.count()
    graft.sources.TpchBridge.undirectedGraph(spark, sfDir).edges.count()
    graft.sources.TpchBridge.hashGraphEdges(spark, sfDir).count()
    graft.SparkEntry.entry(spark).count()

    val jobStarts = mutable.Map[Int, (Long, String)]()
    val jobs = mutable.ArrayBuffer[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobStarts(js.jobId) = (System.nanoTime(), desc)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        jobStarts.get(je.jobId).foreach { case (t0, desc) =>
          jobs += ((je.jobId, (System.nanoTime() - t0) / 1e9, desc))
        }
      }
    })

    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      for (r <- 1 to runs) {
        jobs.clear()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tPlan = System.nanoTime()
        val n = df.count()
        val tEnd = System.nanoTime()
        Thread.sleep(200) // let listener drain
        val jobSum = jobs.map(_._2).sum
        println(f"PROF $name run=$r rows=$n build=${(tPlan - t0) / 1e9}%.3f exec=${(tEnd - tPlan) / 1e9}%.3f njobs=${jobs.size} jobsum=$jobSum%.3f")
        if (r == runs) {
          jobs.sortBy(-_._2).take(12).foreach { case (id, d, desc) =>
            println(f"PROFJOB $name job=$id dur=$d%.3f desc=${desc.take(90)}")
          }
        }
      }
    }
    spark.stop()
  }
}
