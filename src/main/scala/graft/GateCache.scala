package graft

/** JVM-scoped directory cache for gate fixtures that are BUILT IDENTICALLY
  * by more than one registered query — persisted serving indexes shared by
  * a batch gate and its streaming twin, and staged chronological replay
  * chunks shared by stream gates replaying the same source frame.
  *
  * Why: every serving gate deliberately keeps its index BUILD inside the
  * gate (the build is part of what the oracle certifies), but a sweep that
  * runs `q_jaccard_serve` and `q_jaccard_serve_stream` back-to-back was
  * paying for the same multi-second frozen-order index build twice, and the
  * 30+ stream gates were each re-staging quantile-split parquet chunks of
  * the same fixture. Sharing the artifact changes NOTHING about what each
  * gate computes — the keys encode every build input (scale-factor dir,
  * split, parameters), so a hit returns byte-equivalent inputs.
  *
  * Rules for call sites:
  *  - ONLY read-only consumers may share a key. A gate that mutates its
  *    directory (append / delete / tombstone / forget) must build privately.
  *  - Keys must include the sf dir and every parameter that affects the
  *    build output.
  *
  * Thread safety: `computeIfAbsent` runs one builder per key; concurrent
  * suites block until the artifact exists. Directories live until JVM exit
  * (a shutdown hook reclaims them), so a later gate can always re-read.
  */
object GateCache {

  private val dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_gate_cache")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try rmTree(p)
      catch { case _: Exception => () }
    ))
    p
  }

  private def rmTree(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(rmTree(_))
      finally s.close()
    }
    Files.deleteIfExists(p)
  }

  /** Resolve `key` to a directory, running `build` into a fresh temp dir at
    * most once per JVM. `build` failures propagate and cache nothing.
    */
  def dir(key: String)(build: String => Unit): String =
    dirs.computeIfAbsent(
      key,
      _ => {
        val d = java.nio.file.Files.createTempDirectory(root, "c")
        build(d.toString)
        d.toString
      }
    )

  /** Copy-on-write resolve for gates that MUTATE their artifact (delete /
    * tombstone / forget): the pristine build is shared under `key` exactly
    * like [[dir]], but the caller gets a fresh deep copy it may mutate
    * freely — the pristine directory is never touched, so read-only
    * consumers of the same key stay correct. A parquet-directory copy is
    * milliseconds against the multi-second build it replaces, and the
    * copied artifact is byte-identical to what a private build of the same
    * key would have produced (the key encodes every build input).
    */
  def privateCopy(key: String)(build: String => Unit): String = {
    val pristine = java.nio.file.Paths.get(dir(key)(build))
    val dst = java.nio.file.Files.createTempDirectory(root, "m")
    copyTree(pristine, dst)
    dst.toString
  }

  private def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    val s = Files.walk(src)
    try s.forEach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    } finally s.close()
  }
}
