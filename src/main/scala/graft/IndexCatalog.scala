package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** CROSS-SESSION stored-index catalog — the persistence layer
  * [[IndexMemo]] deliberately isn't: the memo amortizes builds
  * within one JVM (temp root, shutdown-hook removal), while a
  * deployment KEEPS its index and reopens it tomorrow, from a
  * different driver, against the same object store. This catalog
  * makes that claim real with no in-memory state at all — every
  * decision reads the filesystem, so a fresh JVM (or a fresh
  * SparkSession in the same JVM) resolves identically:
  *
  *  - `root/<name>/` holds the index exactly as its build function
  *    wrote it (the stored formats already round-trip from path —
  *    `AnnIndex`, `Retrieval` serve from dir alone);
  *  - `root/<name>/_graft_manifest` records the caller's params map
  *    (sorted `key<TAB>value` lines — dependency-free, one file,
  *    written LAST so a half-built index can never validate);
  *  - [[openOrBuild]] validates the stored manifest against the
  *    caller's params: match → serve the existing dir without
  *    touching a row; mismatch / absent / unreadable → rebuild into
  *    a staging sibling and commit with RENAMES ONLY (live set aside
  *    to `._old_<name>`, staging renamed in, sibling dropped) — a
  *    crash at any point leaves at least one complete copy, and the
  *    next call finishes the interrupted commit or restores the
  *    set-aside index, never a half-swapped or empty state.
  *
  * Params must encode everything that makes two indexes different:
  * build parameters AND a corpus vintage (row count, max id, a
  * fingerprint — caller's choice of cheap invariant). Two callers
  * that disagree on any of it rebuild rather than share — the same
  * contract as [[IndexMemo]] keys, persisted. */
object IndexCatalog {

  private val ManifestFile = "_graft_manifest"

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def renderManifest(params: Map[String, String]): String = {
    require(params.forall { case (k, v) =>
      !k.exists(c => c == '\t' || c == '\n') && !v.exists(_ == '\n') },
      "params must be tab/newline-free")
    params.toSeq.sorted.map { case (k, v) => s"$k\t$v" }.mkString("\n")
  }

  /** The stored manifest, or None when absent/unreadable (both mean
    * "rebuild" — an unreadable manifest marks an interrupted commit
    * from a pre-rename crash window, never a servable index). */
  def readManifest(spark: SparkSession,
                   dir: String): Option[Map[String, String]] = {
    val p = new Path(dir, ManifestFile)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else
      try {
        val in = f.open(p)
        val bytes =
          try {
            val buf = new java.io.ByteArrayOutputStream()
            val tmp = new Array[Byte](8192)
            var n = in.read(tmp)
            while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
            buf.toByteArray
          } finally in.close()
        Some(new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").filter(_.nonEmpty)
          .map { line =>
            val i = line.indexOf('\t')
            line.substring(0, i) -> line.substring(i + 1)
          }.toMap)
      } catch { case _: Exception => None }
  }

  /** Open the cataloged index at `root/name` if its manifest matches
    * `params` exactly; otherwise build it fresh (staging + atomic
    * rename) and stamp the manifest. Returns (indexPath, reused).
    * The build function receives the STAGING path and must write a
    * complete index there — it never sees or races the live dir.
    *
    * Commit is rename-only, never delete-then-rename: the live dir
    * moves ASIDE (`._old_<name>`) before staging moves in, so a crash
    * at any point leaves at least one complete copy on disk —
    * recovery on the next call either finishes the interrupted
    * commit (a complete staging dir whose manifest matches `params`
    * is renamed in, no rebuild) or restores the set-aside old index
    * and revalidates it normally. The earlier delete-before-rename
    * shape had a window (post-delete, pre-rename) that left NO
    * servable index and re-deleted the valid staging dir on retry. */
  def openOrBuild(spark: SparkSession, root: String, name: String,
                  params: Map[String, String])
                 (build: String => Unit): (String, Boolean) = {
    require(name.matches("[A-Za-z0-9._-]+"), s"unsafe catalog name: $name")
    val live = new Path(root, name)
    val f = fs(spark, live)
    val staging = new Path(root, s"._staging_$name")
    val old = new Path(root, s"._old_$name")
    // crash recovery BEFORE any delete: if a previous commit died
    // between its two renames, live is absent and the only complete
    // copies are staging (post-build) and/or old (pre-build)
    if (!f.exists(live)) {
      if (readManifest(spark, staging.toString).contains(params)) {
        // the staged build is complete (manifest is written last) and
        // matches — finish the interrupted commit instead of rebuilding
        if (!f.rename(staging, live))
          throw new java.io.IOException(s"catalog commit failed for $live")
        f.delete(old, true)
        return (live.toString, false)
      }
      if (f.exists(old) && !f.rename(old, live))
        throw new java.io.IOException(s"catalog recovery failed for $live")
      // a restored old index revalidates (or rebuilds) below
    }
    if (readManifest(spark, live.toString).contains(params))
      return (live.toString, true)
    f.delete(staging, true) // crashed-build / mismatched leftovers
    f.mkdirs(staging)
    build(staging.toString)
    // manifest LAST: a staging dir without one can never validate
    val out = f.create(new Path(staging, ManifestFile), true)
    try out.write(renderManifest(params)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    f.delete(old, true) // leftovers of a commit that crashed post-swap
    if (f.exists(live) && !f.rename(live, old))
      throw new java.io.IOException(s"catalog set-aside failed for $live")
    if (!f.rename(staging, live))
      throw new java.io.IOException(s"catalog commit failed for $live")
    f.delete(old, true)
    (live.toString, false)
  }
}
