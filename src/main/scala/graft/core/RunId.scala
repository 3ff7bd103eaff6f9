package graft.core

/** Per-JVM unique id for operators that materialize scratch tables
  * (partitioned/bucketed write-then-read layout patterns). Keeps two
  * concurrent runs — e.g. Bench and Verify, or parallel test JVMs —
  * from clobbering each other's scratch data mid-read.
  */
object RunId {
  val id: String = java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  private val root = s"${System.getProperty("java.io.tmpdir")}/graft_$id"

  // Scratch holds full table copies (events/orders/... at bench SF);
  // without cleanup every JVM leaks its copy until /tmp fills.
  sys.addShutdownHook {
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(root))
  }

  /** Scratch directory for this JVM, under java.io.tmpdir; deleted on
    * JVM exit. */
  def scratch(name: String): String = s"$root/$name"

  /** Scratch path namespaced by an arbitrary key (usually the source
    * dir): the key is MD5-hexed into the name, so two dirs processed
    * in one JVM can never clobber each other's scratch tables — the
    * convention every per-(JVM, dir) layout cache must follow (an
    * eagerly-rewritten FIXED path under a still-lazy reader from the
    * previous dir silently serves the wrong data). */
  def scratchKeyed(prefix: String, key: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"$root/${prefix}_$h"
  }
}
