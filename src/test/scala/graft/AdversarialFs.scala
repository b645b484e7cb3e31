package graft

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, FileUtil, Path, RawLocalFileSystem}

/** OBJECT-STORE test double (VERDICT r11 #3): a Hadoop FileSystem whose
  * `rename` has S3/GCS semantics — copy-then-delete, never atomic, and an
  * overwrite-rename first DELETES the destination, exposing the window
  * where the target is briefly ABSENT. Registered under the `advfs`
  * scheme (plus the [[AdversarialAbstractFs]] bridge so `FileContext`
  * callers — the manifest commit's rename path — resolve it too, through
  * the same `DelegateToFileSystem` bridge real S3A/GCS connectors ride,
  * whose overwrite-rename is delete-dest-then-rename).
  *
  * The [[AdversarialFileSystem.windowHook]] fires INSIDE the window
  * (destination deleted or absent, content not yet recreated): tests
  * inject a concurrent reader or a crash at the exact instant a
  * rename-based commit protocol is broken on object stores. A protocol
  * that passes its crash/concurrency schedules on this double holds on
  * stores without atomic rename; one that relies on rename atomicity
  * demonstrably fails here — turning the scaladoc claim into a
  * regression test. */
class AdversarialFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "advfs"
  // a constant from the companion, NOT an instance field: the base-class
  // constructor already calls getUri() (working-dir qualification) before
  // subclass fields would initialize
  override def getUri: URI = AdversarialFileSystem.FsUri

  override def rename(src: Path, dst: Path): Boolean = {
    AdversarialFileSystem.renames.incrementAndGet()
    if (exists(dst)) delete(dst, true)
    AdversarialFileSystem.fireWindow(dst)
    // copy-then-delete: the object-store shape — no atomicity anywhere
    FileUtil.copy(this, src, this, dst, true /* deleteSource */, getConf)
  }
}

object AdversarialFileSystem {
  val FsUri: URI = URI.create("advfs:///")

  /** Fired inside every rename's non-atomic window (dst absent). Keyed
    * on the destination so tests can target one path. @volatile: rename
    * runs on Spark task-commit and driver threads alike. */
  @volatile var windowHook: Path => Unit = _ => ()
  val renames = new java.util.concurrent.atomic.AtomicInteger(0)
  private[graft] def fireWindow(dst: Path): Unit = windowHook(dst)
  def reset(): Unit = { windowHook = _ => (); renames.set(0) }

  /** Register the double on a session's Hadoop conf. */
  def install(conf: Configuration): Unit = {
    conf.set("fs.advfs.impl", classOf[AdversarialFileSystem].getName)
    conf.set("fs.AbstractFileSystem.advfs.impl",
      classOf[AdversarialAbstractFs].getName)
    // each test run must see the hooks it just set, not a cached instance
    conf.set("fs.advfs.impl.disable.cache", "true")
  }
}

/** The `FileContext` bridge for [[AdversarialFileSystem]] — the same
  * `DelegateToFileSystem` wrapper the S3A/GCS connectors use, whose
  * `renameInternal(src, dst, overwrite=true)` deletes the destination
  * before delegating: exactly the non-atomic overwrite-rename ADVICE r11
  * flagged for the manifest commit. */
class AdversarialAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new AdversarialFileSystem, conf,
    "advfs", false)
