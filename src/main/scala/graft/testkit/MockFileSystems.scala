package graft.testkit

import java.net.URI
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, FSDataInputStream, FSDataOutputStream, FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Per-operation counters + optional injected latency shared by the mock
  * filesystems. JVM-global on purpose: Hadoop caches FileSystem
  * instances per (scheme, ugi), and the specs assert over whatever
  * instance the cache hands out. */
object FsOpRecorder {
  private val counters = new ConcurrentHashMap[String, AtomicLong]()
  @volatile var latencyMs: Long = 0L

  private[testkit] def record(op: String): Unit = {
    counters.computeIfAbsent(op, _ => new AtomicLong()).incrementAndGet()
    val d = latencyMs
    if (d > 0) Thread.sleep(d)
  }
  def reset(): Unit = { counters.clear(); latencyMs = 0L }
  def count(op: String): Long =
    Option(counters.get(op)).map(_.get()).getOrElse(0L)
  def total: Long = {
    import scala.jdk.CollectionConverters._
    counters.values.asScala.map(_.get()).sum
  }
  def snapshot: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    counters.asScala.map { case (k, v) => k -> v.get() }.toMap
  }
}

/** Local-disk filesystem under a non-`file` scheme, instrumenting every
  * metadata round trip through [[FsOpRecorder]]. Two Hadoop quirks are
  * handled for subclasses: ALL `create` overloads funnel through one
  * seam ([[createSeam]]), and returned statuses are materialized plain
  * (RawLocal's deprecated lazy permission loader does `new File(uri)`
  * and dies on any non-`file` scheme). */
abstract class InstrumentedLocalFileSystem extends RawLocalFileSystem {
  protected def schemeName: String
  override def getScheme: String = schemeName
  override def getUri: URI = URI.create(s"$schemeName:///")

  /** Permission-materialized copy: safe to inspect off-scheme. */
  private def plain(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, 1, st.getBlockSize,
      st.getModificationTime, st.getAccessTime, FsPermission.getDefault,
      null, null, st.getPath)

  /** The single create seam subclasses may re-semantic. */
  protected def createSeam(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long, progress: Progressable): FSDataOutputStream = {
    FsOpRecorder.record("create")
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long, progress: Progressable): FSDataOutputStream =
    createSeam(f, overwrite, bufferSize, replication, blockSize, progress)
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    createSeam(f, overwrite, bufferSize, replication, blockSize, progress)
  override def createNonRecursive(f: Path, permission: FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    createSeam(f, overwrite, bufferSize, replication, blockSize, progress)

  override def open(f: Path, bufferSize: Int) = {
    FsOpRecorder.record("open"); super.open(f, bufferSize)
  }
  override def getFileStatus(f: Path): FileStatus = {
    FsOpRecorder.record("getFileStatus"); plain(super.getFileStatus(f))
  }
  override def listStatus(f: Path): Array[FileStatus] = {
    FsOpRecorder.record("listStatus"); super.listStatus(f).map(plain)
  }
  override def rename(src: Path, dst: Path): Boolean = {
    FsOpRecorder.record("rename"); super.rename(src, dst)
  }
  override def delete(f: Path, recursive: Boolean): Boolean = {
    FsOpRecorder.record("delete"); super.delete(f, recursive)
  }
  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    FsOpRecorder.record("mkdirs"); super.mkdirs(f, permission)
  }
}

/** `countfs://`: faithful local-FS semantics + op counting/latency — the
  * instrument for proving a code path's round-trip complexity (e.g. the
  * delta-load chain is O(anchors + deltas) ops, not O(tracked files)).
  * Register with `fs.countfs.impl`. */
class CountingLocalFileSystem extends InstrumentedLocalFileSystem {
  protected def schemeName: String = "countfs"
}

/** `countfs` binding for the FileContext API (MetaIO's rename paths). */
class CountingLocalAfs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new CountingLocalFileSystem, conf, "countfs", false)

/** S3-SEMANTICS stand-in over local disk (`mocks3://` scheme): the
  * properties that matter for commit safety are stripped exactly the way
  * an object store strips them —
  *
  *  - `create(overwrite = false)` is NOT exclusive: an object PUT always
  *    succeeds, last writer wins (S3 has no create-if-absent);
  *  - `rename` keeps the Hadoop API shape but is only check-then-act:
  *    dest check and move are separate steps with a widenable window
  *    ([[FsOpRecorder.latencyMs]]), like S3A's copy+delete emulation.
  *
  * [[graft.meta.MetaIO.createExclusive]]'s CAS contract cannot hold on
  * such a store — ObjectStoreContractSpec demonstrates the lost update,
  * and [[graft.meta.LocalCatalog]] refuses `mocks3://` warehouses up
  * front (MetaIO.isObjectStore). RestCatalog stays safe: its CAS is
  * server-side; the warehouse only carries data files, for which
  * last-writer-wins PUTs are fine (fresh UUID names). */
class MockS3FileSystem extends InstrumentedLocalFileSystem {
  protected def schemeName: String = "mocks3"

  override protected def createSeam(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long, progress: Progressable): FSDataOutputStream = {
    // the S3 property: the no-overwrite flag is silently meaningless
    super.createSeam(f, true, bufferSize, replication, blockSize, progress)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    FsOpRecorder.record("rename")
    // check-then-act with a widenable window — never an atomic swap with
    // a dest-exists guarantee (S3A: HEAD, then COPY+DELETE)
    val dstExists = try { super.getFileStatus(dst); true }
      catch { case _: java.io.FileNotFoundException => false }
    val d = FsOpRecorder.latencyMs
    if (d > 0) Thread.sleep(d)
    if (dstExists) super.delete(dst, false)
    super.rename(src, dst)
  }
}

/** `mocks3` binding for the FileContext API. FileContext rename with
  * `Options.Rename.NONE` goes through AbstractFileSystem's
  * check-then-renameInternal — itself non-atomic, matching the store. */
class MockS3Afs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new MockS3FileSystem, conf, "mocks3", false)

/** Injected per-`open` latency for [[SlowLocalFileSystem]] — the
  * instrument for proving the REST serve dispatch is CONCURRENT: a
  * commit validating delete-file footers on `slowfs://` paths spends
  * real wall-clock in I/O, and readers must not queue behind it. */
object SlowFsLatency {
  @volatile var openDelayMs: Long = 0L
}

/** `slowfs://`: faithful local-FS semantics with [[SlowFsLatency]] slept
  * before every `open` — a deterministic stand-in for the multi-second
  * object-store reads a real foreign commit's footer validation pays.
  * Register with `fs.slowfs.impl`. */
class SlowLocalFileSystem extends InstrumentedLocalFileSystem {
  protected def schemeName: String = "slowfs"
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val d = SlowFsLatency.openDelayMs
    if (d > 0) Thread.sleep(d)
    super.open(f, bufferSize)
  }
}

/** `slowfs` binding for the FileContext API. */
class SlowLocalAfs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new SlowLocalFileSystem, conf, "slowfs", false)
