package graft
import java.nio.file.{Files, Paths}

/** Scratch-space selection for the single-node harness mains.
  *
  * The sandbox's `/tmp` lives on the VM disk, which is throttled and
  * shared with other tenants — IO pressure stalls there were measured
  * turning sub-second queries into minute-long ones. `/dev/shm` is a
  * 126 GiB tmpfs: putting Spark's `local.dir` (shuffle files, spills)
  * and the dump-and-verify artifact parquet there keeps the bench and
  * the correctness gate off the contended disk entirely, the same way a
  * real cluster provisions dedicated local SSDs for shuffle. The
  * library itself (GraftEngine) does NOT set `spark.local.dir` — that
  * is a deployment decision; only the harness mains (Bench / Verify /
  * Prof) opt in.
  */
object Scratch {
  /** Fastest writable scratch base: tmpfs when present, else the JVM
    * temp dir (portable fallback for non-Linux dev boxes).
    */
  lazy val base: String = {
    val shm = Paths.get("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm)) "/dev/shm"
    else System.getProperty("java.io.tmpdir")
  }

  /** Per-process-unique scratch dir (pid suffix, same isolation story as
    * SparkEntry.artifactRoot): concurrent runs never share shuffle dirs.
    */
  def localDir(tag: String): String =
    s"$base/graft-$tag-${ProcessHandle.current().pid()}"
}
