package graft.core

/** Per-JVM unique id for operators that materialize scratch tables
  * (partitioned/bucketed write-then-read layout patterns). Keeps two
  * concurrent runs — e.g. Bench and Verify, or parallel test JVMs —
  * from clobbering each other's scratch data mid-read.
  */
object RunId {
  val id: String = java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  /** Scratch directory for this JVM, under java.io.tmpdir. */
  def scratch(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_$id/$name"
}
