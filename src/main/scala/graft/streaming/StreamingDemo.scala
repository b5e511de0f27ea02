package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** File-source streaming runner: treats a directory of JSON-lines
  * files as the message stream (the dev stand-in for the NATS source,
  * SURVEY.md §2.1 S7) and runs the full enrichment pipeline to a
  * subject-partitioned parquet sink.
  *
  * Usage: StreamingDemo <inputDir> <outDir> <checkpointDir>
  * `maxFilesPerTrigger=4` plays the reference's max_ack_pending
  * backpressure role (T4).
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, ckptDir) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MetricsListener
    spark.streams.addListener(listener)
    val raw = spark.readStream
      .option("maxFilesPerTrigger", 4)
      .text(inDir)
      .withColumnRenamed("value", "value")
    val q = StreamingEnrich.runParquet(spark, raw, ckptDir, outDir, Trigger.AvailableNow())
    q.awaitTermination()
    System.err.println(
      s"[stream] processed=${listener.count("posts_processed_total")} " +
        s"poison=${listener.count("errors_json_parse_total")} " +
        s"batches=${listener.batches}")
    val written = spark.read.parquet(outDir)
    System.err.println(s"[stream] sink rows=${written.count()} " +
      s"partitions=${written.select("sentiment", "top_topic").distinct().count()}")
    spark.stop()
  }
}
