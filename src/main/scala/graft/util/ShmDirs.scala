package graft.util

/** tmpfs-first scratch locations shared by the measurement drivers (Bench,
  * Soak): shuffle and warehouse I/O go to /dev/shm so the timed axis is the
  * engine, not the sandbox's throttly block device, with a plain-tmpdir
  * fallback when tmpfs is absent. One definition — the fallback policy must
  * not quietly diverge across drivers.
  */
object ShmDirs {

  /** A fixed-name shuffle dir under /dev/shm (created if needed). */
  def shuffleDir(name: String): String = {
    val d = java.nio.file.Paths.get(s"/dev/shm/$name")
    try { java.nio.file.Files.createDirectories(d); d.toString }
    catch { case scala.util.control.NonFatal(_) => System.getProperty("java.io.tmpdir") }
  }

  /** A fresh temp dir under /dev/shm (plain temp fallback), deleted at JVM
    * exit: tmpfs is shared with the scale fixtures, and leaked per-JVM
    * fixture dirs were found squatting it after repeated runs (the r9 bench
    * hygiene finding, again). Dirs are per-process (createTempDirectory
    * names are unique), so exit-time deletion cannot touch another run's.
    */
  def tempDir(prefix: String): java.nio.file.Path = {
    val d =
      try java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), prefix)
      catch { case scala.util.control.NonFatal(_) =>
        java.nio.file.Files.createTempDirectory(prefix) }
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scala.util.Try(org.apache.commons.io.FileUtils.deleteDirectory(d.toFile))))
    d
  }
}
