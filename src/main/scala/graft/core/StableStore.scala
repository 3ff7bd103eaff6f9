package graft.core

/** Cross-JVM persisted artifact store — the "nightly index" shape for
  * layouts that must outlive one Spark session: the DuckDB oracle
  * reads these directories (VERDICT r13 next #6: hash-exact faces
  * over persisted index artifacts), so unlike [[RunId]] scratch they
  * are NOT deleted at JVM exit and live at a path derivable from the
  * (prefix, input-fingerprint) key alone.
  *
  * Publication is write-once and atomic: the build writes into a
  * JVM-private temp dir, then a directory rename publishes it; a
  * concurrent builder that loses the race discards its copy. This is
  * only sound because every stored build is DETERMINISTIC in its
  * inputs (fixed seeds/init, quantized sums) — the loser's copy is
  * value-identical to the winner's, so readers never observe a
  * partial or divergent artifact. Keys embed a format version
  * (`prefix` convention: `name_v1`) so a layout change in a later
  * build cannot be poisoned by an old artifact, and the input
  * fingerprint (file names, lengths, mtimes) so regenerated testdata
  * invalidates naturally.
  */
object StableStore {
  private val root =
    s"${System.getProperty("java.io.tmpdir")}/graft_stable"

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def rmRec(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(rmRec)
    f.delete(): Unit
  }

  /** Input fingerprint for a table directory under `dir` — file
    * names, lengths, mtimes — so regenerated testdata invalidates the
    * artifacts keyed on it. Shared by every getOrBuild caller whose
    * artifact derives from one fixture table. */
  def inputKey(s: org.apache.spark.sql.SparkSession, dir: String,
      table: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val stamped = fs.listStatus(p).collect {
      case st if st.isFile && {
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      } => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}"
    }.sorted
    dir + "#" + stamped.mkString("|")
  }

  /** Directory for (prefix, key), building it at most once across
    * JVMs. `build` receives a temp path to write into; the `_DONE`
    * marker is created after the build returns, so the published dir
    * is complete by construction. A failed build's temp dir is
    * removed before the exception propagates (ADVICE r14: otherwise
    * partial `.build_*` dirs accumulate with no sweep); stale temp
    * dirs from JVMs that died mid-build are swept lazily — any
    * `.build_*` entry not owned by this run is fair game, because a
    * LIVE builder's rename either already happened (target exists) or
    * will fail and fall through to the target-exists check.
    *
    * `codeVersion` (ADVICE r15 medium): every kernel passes a
    * bumpable constant declared NEXT TO its build code, folded into
    * the key — so editing a kernel without changing its parameters
    * can never serve a stale artifact that the oracle (which reads
    * the SAME artifact) is structurally blind to: the edit's review
    * checklist is "did the bytes this build writes change? then bump
    * the constant". Version 1 maps to the legacy unversioned key so
    * the standing artifact store — including the multi-hour ×100
    * prewarmed layouts — stays valid; any bump re-keys exactly that
    * kernel's artifacts and nothing else. */
  def getOrBuild(prefix: String, key: String, codeVersion: Int = 1)(
      build: String => Unit): String = {
    require(codeVersion >= 1, s"codeVersion must be >= 1, got $codeVersion")
    val vkey = if (codeVersion == 1) key else s"cv=$codeVersion|$key"
    val target = new java.io.File(s"$root/${prefix}_${md5(vkey)}")
    if (new java.io.File(target, "_DONE").exists()) return target.getPath
    target.getParentFile.mkdirs()
    sweepStale()
    val tmp = new java.io.File(
      s"$root/.build_${target.getName}_${RunId.id}")
    try build(tmp.getPath)
    catch { case e: Throwable => rmRec(tmp); throw e }
    if (!new java.io.File(tmp, "_DONE").createNewFile())
      throw new IllegalStateException(s"cannot mark $tmp complete")
    // atomic publish; losing the race to an equivalent winner is fine
    if (!tmp.renameTo(target)) rmRec(tmp)
    if (!new java.io.File(target, "_DONE").exists())
      throw new IllegalStateException(s"artifact publish failed for $target")
    target.getPath
  }

  /** Remove `.build_*` temp dirs whose NEWEST file is older than a
    * day — long enough that no live builder (bench layouts build in
    * minutes to hours) can still own one; a dead JVM's partials are
    * the only entries that old. Staleness is judged on the newest
    * mtime anywhere under the tree, not the root dir's (ADVICE r15:
    * a directory's mtime only moves when DIRECT children change, so
    * a long build writing deep subtrees — pretrain_shards at ×100 —
    * could present a stale root while actively writing leaves and be
    * deleted mid-build by a concurrent JVM). */
  private def sweepStale(): Unit = {
    val kids = new java.io.File(root).listFiles()
    if (kids == null) return
    val cutoff = System.currentTimeMillis() - 24L * 3600 * 1000
    def newestMtime(f: java.io.File): Long = {
      val sub = f.listFiles()
      if (sub == null || sub.isEmpty) f.lastModified()
      else math.max(f.lastModified(), sub.map(newestMtime).max)
    }
    kids.foreach { f =>
      if (f.getName.startsWith(".build_") && newestMtime(f) < cutoff)
        rmRec(f)
    }
  }
}
