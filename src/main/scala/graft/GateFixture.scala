package graft

/** Shared builder for the store-pipeline gate fixtures (q110/q112/
  * q114/q115/q116 — r17 review: four hand-kept copies of the same
  * tempdir + shutdown-hook + per-(JVM, sfDir) memo block). Each
  * fixture is a pure function of its events fixture, built exactly
  * once per (JVM, name, sfDir) and deleted at JVM exit. */
object GateFixture {

  private val dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def cached(name: String, sfDir: String)(build: java.nio.file.Path => String): String =
    dirs.computeIfAbsent(name + "|" + PathKey(sfDir), { _ =>
      val root = java.nio.file.Files.createTempDirectory(name)
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files, Path => JPath}
        if (Files.exists(root))
          Files.walk(root).sorted(java.util.Comparator.reverseOrder[JPath]())
            .forEach(f => Files.deleteIfExists(f))
      }))
      build(root)
    })
}
