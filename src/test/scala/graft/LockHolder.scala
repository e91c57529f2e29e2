package graft

import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Test-only subprocess: acquires a ProductStore ingest file lock
  * (`<root>/_ingest_<client>.lock`), writes a marker file to signal the
  * parent it holds the lock, then HOLDS it until the parent writes the
  * go-file (bounded by maxHoldMs as a crash-safety valve), releases,
  * exits. Spawned by IngestionServiceSpec's cross-process test as a REAL
  * second OS process — in-JVM, a second FileChannel.lock on the same
  * file throws OverlappingFileLockException instead of blocking, so only
  * a genuine child process can prove the lock serializes across
  * processes. The handshake (marker out, go-file in) makes the test
  * deterministic instead of wall-clock-raced.
  */
object LockHolder {
  def main(args: Array[String]): Unit = {
    val Array(root, clientId, marker, goFile, maxHoldMs) = args
    val ch = FileChannel.open(Paths.get(root, s"_ingest_$clientId.lock"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    val lk = ch.lock()
    Files.writeString(Paths.get(marker), "held")
    val deadline = System.nanoTime() + maxHoldMs.toLong * 1000000L
    while (!Files.exists(Paths.get(goFile)) && System.nanoTime() < deadline)
      Thread.sleep(20)
    lk.release()
    ch.close()
  }
}
