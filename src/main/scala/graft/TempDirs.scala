package graft

/** Temp-dir hygiene for the runner mains and the test session. */
object TempDirs {
  /** Create a temp directory and register its recursive deletion at JVM
    * exit (r17 verdict #3): EM-LDA writes a FULL graph checkpoint every
    * `checkpointInterval` (10) iterations into the session's checkpoint
    * dir, and nothing deleted it — harmless on this sandbox's tmpfs,
    * but a many-pass bench day accumulates GBs, and at real scale an
    * uncleaned checkpoint dir is a storage leak. The hook runs after
    * the mains' explicit `spark.stop()`, so no live query can still be
    * reading the checkpointed graph. (Same mechanism as Storage's
    * scratch-dir hook.) */
  def deleteOnExit(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      import java.nio.file.{Files, Path}
      import scala.jdk.CollectionConverters._
      if (Files.exists(p)) {
        val paths = Files.walk(p).iterator().asScala.toSeq
        paths.sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_: Path))
      }
    }
    p.toString
  }
}
