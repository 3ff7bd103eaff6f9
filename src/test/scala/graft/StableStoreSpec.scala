package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.StableStore

/** The write-once artifact store's key discipline — in particular the
  * ADVICE-r15 codeVersion mechanism: artifacts the DuckDB oracle
  * reads are served to BOTH sides, so a kernel-code change that kept
  * the same key would silently serve stale bytes the hash check is
  * structurally blind to. These tests pin that a version bump re-keys
  * (forces a rebuild) and that version 1 keeps the legacy key (the
  * standing prewarmed store stays valid).
  */
class StableStoreSpec extends AnyFunSuite {

  private def freshKey(): String =
    s"spec|${java.util.UUID.randomUUID()}"

  test("same (prefix, key, version) builds once and returns the same path") {
    val key = freshKey()
    var builds = 0
    def build(tmp: String): Unit = {
      builds += 1
      val d = new java.io.File(tmp); d.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(tmp, "payload"), "v1")
    }
    val p1 = StableStore.getOrBuild("spectest", key, 1)(build)
    val p2 = StableStore.getOrBuild("spectest", key, 1)(build)
    assert(p1 == p2, "same key must resolve to one artifact")
    assert(builds == 1, "second call must serve the published artifact")
  }

  test("a codeVersion bump re-keys: the v2 build cannot be served stale v1 bytes") {
    val key = freshKey()
    def writer(payload: String)(tmp: String): Unit = {
      val d = new java.io.File(tmp); d.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(tmp, "payload"), payload)
    }
    val p1 = StableStore.getOrBuild("spectest", key, 1)(writer("old-kernel"))
    val p2 = StableStore.getOrBuild("spectest", key, 2)(writer("new-kernel"))
    assert(p1 != p2, "version bump must change the artifact path")
    val read = java.nio.file.Files.readString(
      java.nio.file.Paths.get(p2, "payload"))
    assert(read == "new-kernel",
      "bumped kernel must get freshly-built bytes, not the v1 artifact")
    // and the old artifact is untouched (never scratch an oracle-read dir)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(p1, "payload")) == "old-kernel")
  }

  test("version 1 is the legacy unversioned key (standing store stays warm)") {
    val key = freshKey()
    def build(tmp: String): Unit = {
      val d = new java.io.File(tmp); d.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(tmp, "payload"), "x")
    }
    // default-arg call (the pre-r16 signature) and explicit version 1
    // must resolve to the SAME artifact — otherwise every r15 artifact,
    // including the multi-hour ×100 prewarm, would be orphaned
    val pDefault = StableStore.getOrBuild("spectest", key)(build)
    val pV1 = StableStore.getOrBuild("spectest", key, 1)(build)
    assert(pDefault == pV1)
  }
}
