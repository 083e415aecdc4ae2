package graft

/** Per-JVM temp directories for side-effecting queries (CSV export,
  * streaming replay drops): one fixed path per purpose so repeated
  * invocations overwrite instead of leaking a new dir per call, all
  * registered for recursive deletion at JVM exit.
  */
object TempDirs {
  def create(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(p.toFile)
    }
    p.toString
  }
}
