package graft
import org.apache.spark.sql.functions._
object SfxQ152 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        println(f"JOB ${e.jobId}%3d ended at ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.sparkContext.addSparkListener(listener)
    val df = graft.queries.SuffixQueries.q152.fn(spark, "/root/testdata/sf0.1")
    println("ROWS " + df.count() + " total " + (System.nanoTime()-t0)/1e9)
  }
}
