package graft.sources.v2

import java.io.IOException

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable
import org.scalatest.funsuite.AnyFunSuite

/** [[CdxManifest.commit]]'s failure discipline (round-14 verdict
  * "what's wrong" 1): the version-claim loop must treat a create
  * refusal as a RACE only when a winner verifiably holds the slot —
  * a persistent I/O failure (endpoint down, auth revoked) must FAIL
  * the job promptly instead of spinning through version numbers
  * forever. Exercised against a scripted local FS whose create/exists
  * behavior is programmable per call — the only way to pin the
  * "create throws a bare IOException immediately" shape, which real
  * object-store clients produce on connection refusal (the HTTP
  * store's PUT-at-close shape surfaces later, inside the write). */
class CdxManifestRetrySpec extends AnyFunSuite {

  /** RawLocalFileSystem with programmable create/exists faults. */
  private class ScriptedFs extends RawLocalFileSystem {
    @volatile var failCreate: Path => Option[IOException] = _ => None
    @volatile var forceExists: Path => Option[Boolean] = _ => None
    // distinct paths create was attempted on — robust against the
    // FileSystem.create overload chain hitting both hooks per call
    val pathsTried = scala.collection.mutable.LinkedHashSet[String]()
    // RawLocalFileSystem routes FileSystem.create(Path, boolean)
    // through THIS overload (not the FsPermission one), so the fault
    // hook must live here to see the commit's create-no-overwrite
    override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                        replication: Short, blockSize: Long,
                        progress: Progressable): FSDataOutputStream = {
      pathsTried += f.getName
      failCreate(f).foreach(e => throw e)
      super.create(f, overwrite, bufferSize, replication, blockSize, progress)
    }
    override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                        bufferSize: Int, replication: Short, blockSize: Long,
                        progress: Progressable): FSDataOutputStream = {
      pathsTried += f.getName
      failCreate(f).foreach(e => throw e)
      super.create(f, permission, overwrite, bufferSize, replication,
        blockSize, progress)
    }
    override def exists(f: Path): Boolean =
      forceExists(f).getOrElse(super.exists(f))
  }

  private def withFs[T](body: (ScriptedFs, Path) => T): T = {
    val fs = new ScriptedFs
    fs.initialize(java.net.URI.create("file:///"), new Configuration())
    val root = new Path(
      java.nio.file.Files.createTempDirectory("cdx_retry").toString)
    body(fs, root)
  }

  test("persistent create failure fails the commit promptly — no version spin") {
    withFs { (fs, root) =>
      fs.failCreate = p =>
        if (p.getName.endsWith(".list")) Some(new IOException("connection refused"))
        else None
      val e = intercept[IOException] {
        CdxManifest.commit(fs, root, "job1", Seq("part-00000-job1.cdx"),
          truncate = false)
      }
      assert(e.getMessage.contains("manifest commit failed after 1 attempt"))
      // exactly one manifest version was attempted: the loop must not
      // have burned through version numbers before giving up
      assert(fs.pathsTried.count(_.endsWith(".list")) == 1)
    }
  }

  test("a FileAlreadyExistsException is a race: next version claimed, commit lands") {
    withFs { (fs, root) =>
      var thrown = false
      fs.failCreate = p =>
        if (!thrown && p.getName == "m00000001-job1.list") {
          thrown = true
          Some(new org.apache.hadoop.fs.FileAlreadyExistsException(p.toString))
        } else None
      val v = CdxManifest.commit(fs, root, "job1", Seq("part-00000-job1.cdx"),
        truncate = false)
      assert(v == 2L) // slot 1 was "taken", slot 2 claimed
      assert(CdxManifest.visibleFiles(fs, root).contains(Seq("part-00000-job1.cdx")))
    }
  }

  test("a bare IOException with the path verifiably present is a race too") {
    withFs { (fs, root) =>
      // some stores surface the conditional-PUT conflict as a generic
      // IOException; the exists probe then confirms a winner landed
      var thrown = false
      fs.failCreate = p =>
        if (!thrown && p.getName == "m00000001-job1.list") {
          thrown = true
          Some(new IOException("412 precondition failed"))
        } else None
      fs.forceExists = p =>
        if (p.getName == "m00000001-job1.list") Some(true) else None
      val v = CdxManifest.commit(fs, root, "job1", Seq("part-00000-job1.cdx"),
        truncate = false)
      assert(v == 2L)
    }
  }

  test("attempt cap: endless verifiable races still terminate with a failure") {
    withFs { (fs, root) =>
      // pathological store: every probed version "exists" — the cap
      // must end the loop with an error instead of running forever
      fs.failCreate = p =>
        if (p.getName.endsWith(".list"))
          Some(new org.apache.hadoop.fs.FileAlreadyExistsException(p.toString))
        else None
      val e = intercept[IOException] {
        CdxManifest.commit(fs, root, "job1", Seq("part-00000-job1.cdx"),
          truncate = false)
      }
      assert(e.getMessage.contains("manifest commit failed after 1000 attempt"))
    }
  }
}
