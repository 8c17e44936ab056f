package graft
import org.apache.spark.sql.SparkSession

/** Run a comma-separated list of SparkEntry queries once each and time
  * them — the single-query A/B tool (Bench remains the harness: its
  * min-of-3 is the number that counts; a first run in a fresh JVM pays
  * ~0.3 s codegen/JIT). Usage:
  * `runMain graft.RunOne q_a,q_b [sfDir] [reps]`. */
object RunOne {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same triage signal as Bench's queries_cpu: executor task CPU per
    // rep, so a wall spike on a loaded box is tellable apart from a
    // work regression right in the A/B output
    val meter = CpuMeter.attach(spark.sparkContext)
    args(0).split(",").foreach { name =>
      (1 to reps).foreach { i =>
        val c0 = meter.snapshotNs()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[runone] $name%-28s rep$i $wall%6.2f s  " +
          f"cpu ${(meter.snapshotNs() - c0) / 1e9}%6.2f s  rows=$n")
      }
    }
    spark.stop()
  }
}
