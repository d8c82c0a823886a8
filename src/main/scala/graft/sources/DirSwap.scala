package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe directory swap for bare-parquet table rewrites
  * (compaction): the live root is never deleted before its replacement
  * is fully addressable, so a crash at ANY point leaves a recoverable
  * table — the failure mode the plain delete-then-rename swap could
  * not survive (root gone, data stranded in the tmp sibling).
  *
  * Protocol ([[swap]]): rename `root` → `root__swap_trash`, rename
  * `tmp` → `root`, delete the trash. [[recover]] repairs every
  * interruption window:
  *   - crash during the tmp WRITE: root intact, stale tmp → drop tmp;
  *   - crash between the two renames: root missing, complete tmp +
  *     trash present → roll FORWARD (tmp becomes root);
  *   - crash before the trash delete: root + trash present → finish
  *     the delete.
  * Readers racing the swap can still glimpse a missing root for the
  * instant between the renames — the residual (documented) limit of a
  * pointer-less layout; a transactional format (Delta/Iceberg) is the
  * deployment-scale graduation, and [[graft.streaming.CorpusIngest]]'s
  * versioned state shows the pointer-flip alternative.
  */
private[graft] object DirSwap {

  def tmpDir(root: String): String = root + "__swap_tmp"
  private def trashDir(root: String): String = root + "__swap_trash"

  /** Swap a fully-written `tmpDir(root)` into place of `root`.
    * Call [[recover]] first if the previous swap may have crashed. */
  def swap(f: FileSystem, root: String): Unit = {
    val r = new Path(root)
    val t = new Path(tmpDir(root))
    val tr = new Path(trashDir(root))
    require(f.exists(t), s"no rewrite staged at ${tmpDir(root)}")
    require(!f.exists(tr), s"stale trash at $tr — run recover() first")
    if (f.exists(r))
      require(f.rename(r, tr), s"could not move $root aside for the swap")
    require(f.rename(t, r), s"could not swap ${tmpDir(root)} into $root")
    f.delete(tr, true)
  }

  /** Repair an interrupted [[swap]]. Idempotent; cheap (existence
    * checks only) when there is nothing to repair.
    *
    * Handles BOTH rename disciplines. Under an atomic directory rename
    * (HDFS, a local FS) the only multi-dir states are the three in the
    * class doc. Under RENAME-AS-COPY (object stores: copy every file,
    * then delete the source) a crash mid-rename leaves src and dst
    * BOTH present, one of them partial — and copy-then-delete ordering
    * pins which: **the (relpath, length)-superset side is the complete
    * one** (the copy never writes a file the source lacks; the delete
    * only starts after the copy finished). recover() disambiguates the
    * both-exist states with that rule:
    *   - root ⊆ tmp (with trash present): rename(tmp → root) crashed
    *     mid-copy — the swap had committed to rolling forward, so
    *     finish it (drop the partial root, promote tmp, drop trash);
    *   - root ⊊ trash: rename(root → trash) crashed mid-DELETE — the
    *     trash copy is the complete old root; restore it;
    *   - otherwise root is complete (mid-COPY crash toward trash, or
    *     the normal post-swap trash-delete window): drop the leftovers.
    * The staged rewrite is dropped whenever the OLD root is kept — a
    * compaction is re-runnable; table data is not. */
  def recover(f: FileSystem, root: String): Unit = {
    val r = new Path(root)
    val t = new Path(tmpDir(root))
    val tr = new Path(trashDir(root))
    if (!f.exists(r)) {
      // tmp was fully written before the old root moved aside, so if it
      // exists the rewrite is complete — roll forward; otherwise the
      // crash hit between the renames' precondition and nothing moved,
      // or only the trash rename happened — roll back.
      if (f.exists(t)) require(f.rename(t, r), s"recovery: could not promote $t")
      else if (f.exists(tr)) require(f.rename(tr, r), s"recovery: could not restore $tr")
    } else if (f.exists(tr) && f.exists(t)) {
      // copy-rename crash states only (atomic rename can't leave all
      // three): see the superset rule above
      if (isSubset(f, r, t)) {
        f.delete(r, true)
        require(f.rename(t, r), s"recovery: could not promote $t")
        f.delete(tr, true)
      } else {
        if (isProperSubset(f, r, tr)) {
          f.delete(r, true)
          require(f.rename(tr, r), s"recovery: could not restore $tr")
        } else f.delete(tr, true)
        f.delete(t, true)
      }
    }
    if (f.exists(r)) { // root live again: drop whatever the crash left
      if (f.exists(tr)) f.delete(tr, true)
      if (f.exists(t)) f.delete(t, true)
    }
  }

  /** Recursive (relative path, length) file inventory. */
  private def inventory(f: FileSystem, p: Path): Set[(String, Long)] = {
    val base = f.makeQualified(p).toString
    val out = Set.newBuilder[(String, Long)]
    val it = f.listFiles(p, true)
    while (it.hasNext) {
      val s = it.next()
      out += ((s.getPath.toString.stripPrefix(base), s.getLen))
    }
    out.result()
  }

  private def isSubset(f: FileSystem, a: Path, b: Path): Boolean =
    inventory(f, a).subsetOf(inventory(f, b))

  private def isProperSubset(f: FileSystem, a: Path, b: Path): Boolean = {
    val ia = inventory(f, a); val ib = inventory(f, b)
    ia.subsetOf(ib) && ia != ib
  }
}
