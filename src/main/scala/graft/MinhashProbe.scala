package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** Dev-only bimodality hunter for dd_minhash_lsh (not a driver gate).
  * Runs the query N times in one Bench-shaped session and, per run, logs
  * every stage's wall duration vs summed executor run/GC time — a slow
  * run with low executorRunTime means tasks were PARKED (scheduler/GC
  * stall), high runTime means the compute itself degraded. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "20").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(name: String, wallMs: Long, runMs: Long, gcMs: Long,
      tasks: Int, shuffleWriteMs: Long, fetchWaitMs: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(-1L)
        val m = si.taskMetrics
        stages.synchronized {
          stages += St(si.name.takeWhile(_ != '\n').take(60), wall,
            m.executorRunTime, m.jvmGCTime, si.numTasks,
            m.shuffleWriteMetrics.writeTime / 1000000,
            m.shuffleReadMetrics.fetchWaitTime)
        }
      }
    })

    val docs = Tables.load(spark, sfDir, "documents")
    docs.count() // warm the scan
    Dedup.minhashNearDups(docs, "doc_id", "text").count() // warm codegen

    (1 to runs).foreach { i =>
      spark.catalog.clearCache()
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      Dedup.minhashNearDups(docs, "doc_id", "text").count()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events are posted async; give the bus a beat
      Thread.sleep(300)
      val snap = stages.synchronized(stages.toVector)
      val slow = dt > 5.0
      println(f"[probe] run $i%2d: $dt%7.3f s  stages=${snap.size}" +
        (if (slow) "  <-- SLOW" else ""))
      if (slow) snap.sortBy(-_.wallMs).take(8).foreach { s =>
        println(f"[probe]   wall=${s.wallMs}%6d ms run=${s.runMs}%6d gc=${s.gcMs}%5d " +
          f"tasks=${s.tasks}%3d shufW=${s.shuffleWriteMs}%5d fetchWait=${s.fetchWaitMs}%5d  ${s.name}")
      }
    }
    spark.stop()
  }
}
