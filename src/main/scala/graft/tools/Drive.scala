package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.count()

    def tme[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"DRIVE $tag ${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }

    def posting = docs.select(col("doc_id").as("id"),
        regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("norm"))
      .where(length(col("norm")) >= 5)
      .select(col("id"), col("norm"),
        explode(sequence(lit(0), length(col("norm")) - 5)).as("pos"))
      .select(col("id"), xxhash64(col("norm").substr(col("pos") + 1, lit(5))).as("shingle"))

    val P = 2147483629L
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val p = posting.select(col("id"), pmod(xxhash64(col("shingle")), lit(P)).as("h"))
      val sigCols = (0 until 64).map(j => min(pmod(lit(j * 2 + 1) * col("h") + lit(j), lit(P))).as(s"s$j"))
      val sigs = tme(s"r$i-sigs-checkpoint") {
        p.groupBy("id").agg(sigCols.head, sigCols.tail: _*).localCheckpoint(true)
      }
      val bucketCols = (0 until 16).map { b =>
        val bandSig = (b * 4 until (b + 1) * 4).map(j => col(s"s$j"))
        struct(lit(b).as("band"), xxhash64(bandSig: _*).as("bucket"))
      }
      val banded = sigs.select(col("id"), explode(array(bucketCols: _*)).as("bb"))
        .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      val l = banded.select(col("band"), col("bucket"), col("id").as("idA"))
      val r = banded.select(col("band"), col("bucket"), col("id").as("idB"))
      val collided = tme(s"r$i-banding-join") {
        l.join(r, Seq("band", "bucket")).where(col("idA") < col("idB"))
          .select(col("idA"), col("idB")).distinct().localCheckpoint(true)
      }
      val aSig = sigs.select(col("id").as("idA") +: (0 until 64).map(j => col(s"s$j").as(s"a$j")): _*)
      val bSig = sigs.select(col("id").as("idB") +: (0 until 64).map(j => col(s"s$j").as(s"b$j")): _*)
      val agree = (0 until 64).map(j => when(col(s"a$j") === col(s"b$j"), 1).otherwise(0)).reduce(_ + _)
      val cand = tme(s"r$i-prefilter") {
        collided.join(aSig, Seq("idA")).join(bSig, Seq("idB"))
          .where(agree >= lit(35)).select(col("idA"), col("idB")).localCheckpoint(true)
      }
      println(s"DRIVE collided=${collided.count()} cand=${cand.count()}")
      println(f"DRIVE r$i-stages-total ${(System.nanoTime() - t0) / 1e9}%.2f")
      tme(s"r$i-minhash-full") {
        Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.8).count()
      }
    }
    spark.stop()
  }
}
