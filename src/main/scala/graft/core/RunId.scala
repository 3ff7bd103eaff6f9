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
}
