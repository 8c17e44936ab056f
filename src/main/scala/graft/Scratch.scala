package graft

/**
 * JVM-wide scratch-path lifecycle for SESSION-LIVED at-rest indexes
 * (the trained IVF layout, the cluster-assignment table): one
 * collision-free path per standing structure, all retired by ONE
 * shutdown hook so repeated harness runs never accumulate /tmp state.
 *
 * Production deployments do the opposite — they keep the index
 * (that's the point of an at-rest structure) and key the path by the
 * corpus-snapshot id so a later session can reuse it
 * ([[graft.ann.IvfIndex.snapshotPath]]); the scratch discipline here
 * exists because the harness owns no durable storage contract.
 */
object Scratch {

  /** Collision-free scratch location: the sanitized tag (readability
    * when listing /tmp) plus a process-unique token, so two concurrent
    * sessions over the SAME source — or two sources with colliding
    * names — each write and probe their OWN structure instead of
    * overwriting each other's mid-probe. Callers cache the result per
    * (session, source), so the cost is one UUID per standing index. */
  def path(prefix: String, tag: String): String = {
    val base = sys.props.getOrElse("java.io.tmpdir", "/tmp")
    val safe = tag.replaceAll("[^A-Za-z0-9._-]", "_")
    val token = java.util.UUID.randomUUID().toString.take(8)
    s"$base/${prefix}_${safe}_$token"
  }

  /** Scratch paths awaiting JVM-exit retirement, drained by ONE
    * shutdown hook (registered lazily on first use). Deletion goes
    * through the Hadoop FS API — the same verb as the indexes' own
    * `delete` — resolved against a fresh Configuration because the
    * SparkSession is typically already stopped inside a shutdown
    * hook; if a scratch base ever grows a non-local scheme, this
    * keeps cleaning where a java.io.File delete would silently stop. */
  private val paths = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var p = paths.poll()
      while (p != null) {
        try {
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
            .delete(hp, true)
        } catch { case _: Throwable => () } // best-effort, like deleteQuietly
        p = paths.poll()
      }
    }))

  /** Register a path for JVM-exit deletion. ONE hook for the whole
    * JVM draining a concurrent queue — a hook per registration would
    * accumulate a thread per standing index in a long-lived JVM. */
  def registerCleanup(path: String): Unit = {
    hookInstalled
    paths.add(path)
    ()
  }
}
