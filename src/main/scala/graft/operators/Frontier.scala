package graft.operators

import org.apache.spark.sql.Dataset

/** Frontier pinning: materialize a multi-consumer (or
  * multi-job-consumed) DataFrame once so every consumer reads the same
  * rows without re-evaluating the upstream lineage.
  *
  * Two durability modes behind one session-conf knob
  * (`graft.pin.reliable`, default false):
  *
  *  - default: `localCheckpoint()` — lineage truncates into
  *    executor-local storage. Fast (no extra I/O beyond the block
  *    write), the right call on local[*] and for short-lived frames,
  *    but on a real cluster the blocks die with their executor: lose
  *    one machine after the pin and the frame is unrecoverable — the
  *    job fails and restarts from the source.
  *  - reliable: `checkpoint()` to the SparkContext checkpoint
  *    directory (fault-tolerant storage — HDFS/S3 on a cluster). An
  *    executor loss re-reads the checkpoint files instead of killing
  *    a 100 TB run. Costs one extra write+read of the frontier, which
  *    is exactly the durability premium a long pipeline wants to pay
  *    at the handful of places a wrong re-evaluation would corrupt
  *    results (range-partition boundaries, detected hot sets,
  *    dedup/decontamination frontiers).
  *
  * Both modes are EAGER (the frame materializes at the call), which is
  * what pinning requires: phase 2 of a two-phase scan must observe the
  * very partitioning phase 3 reads, and a sampled hot set must be
  * drawn once, not once per consumer.
  */
object Frontier {

  /** Session-conf knob: set to "true" for reliable checkpoints. */
  val ReliableConf = "graft.pin.reliable"

  /** Pin `ds` per the session's durability mode (see object doc). In
    * reliable mode a missing checkpoint dir is defaulted to a local
    * temp dir — fine for local[*]; a cluster deployment sets
    * `spark.sparkContext.setCheckpointDir` to shared storage. */
  def pin[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    if (!spark.conf.get(ReliableConf, "false").toBoolean) ds.localCheckpoint()
    else {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty)
        sc.setCheckpointDir(java.nio.file.Files.createTempDirectory(
          "graft-reliable-pin").toString)
      ds.checkpoint()
    }
  }
}
