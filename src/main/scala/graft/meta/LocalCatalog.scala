package graft.meta

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** Thrown when an optimistic commit loses the race (another writer created
  * the next metadata version first). Mirrors CatalogCommitConflicts in the
  * reference (core/src/compaction/mod.rs:763-782): retriable. */
final class CommitConflictException(msg: String) extends RuntimeException(msg)

/** File-system catalog with compare-and-swap commits.
  *
  * Layout per table: `<warehouse>/<table>/metadata/v{N}.metadata.json` +
  * `version-hint.text`. A commit at version N+1 atomically creates
  * `v{N+1}.metadata.json` (tmp file + ATOMIC_MOVE without replace); if the
  * target already exists, a concurrent writer won and the commit raises
  * [[CommitConflictException]] so callers can reload + retry — the same
  * optimistic-concurrency contract the reference delegates to its Iceberg
  * catalog. A real REST/Hive catalog could slot in behind this trait.
  */
trait Catalog {
  def createTable(meta: TableMetadata): TableMetadata
  def loadTable(name: String): TableMetadata
  def tableExists(name: String): Boolean
  /** CAS: persists `updated` as version `base.version + 1`; throws
    * [[CommitConflictException]] if that version already exists. */
  def commit(base: TableMetadata, updated: TableMetadata): TableMetadata
  def dropTable(name: String): Unit
  /** All table names in the catalog, sorted. */
  def listTables: Seq[String]
  /** Root of the table's storage. Known even before the table exists:
    * writers stage data files first, then register them in a commit
    * (write-then-commit, the Iceberg pattern). */
  def tableLocation(name: String): Path
  /** Where the table's data files live (under [[tableLocation]]). */
  def dataDir(name: String): Path
}

final class LocalCatalog(val warehouse: Path,
    /** Serialized metadata at or above this many bytes is gzip-compressed
      * on disk (file name unchanged — readers sniff the gzip magic, so
      * mixed plain/compressed version chains read transparently and the
      * CAS target stays one name per version). Manifests inline in the
      * metadata make big tables metadata-heavy: at 10^5-10^6 tracked
      * files the JSON runs to hundreds of MB, and gzip buys ~10x less
      * driver I/O per load/commit. Small metadata stays human-readable
      * plain text. `Long.MaxValue` disables; 0 always compresses. */
    val gzipMetadataAtBytes: Long = 1L << 20) extends Catalog {
  Files.createDirectories(warehouse)

  private def metaDir(name: String): Path = warehouse.resolve(name).resolve("metadata")
  private def versionFile(name: String, v: Int): Path = metaDir(name).resolve(s"v$v.metadata.json")
  private def hintFile(name: String): Path = metaDir(name).resolve("version-hint.text")

  def tableLocation(name: String): Path = warehouse.resolve(name)
  def dataDir(name: String): Path = warehouse.resolve(name).resolve("data")

  override def tableExists(name: String): Boolean = Files.exists(hintFile(name))

  override def createTable(meta: TableMetadata): TableMetadata = {
    require(!tableExists(meta.name), s"table ${meta.name} already exists")
    Files.createDirectories(metaDir(meta.name))
    Files.createDirectories(dataDir(meta.name))
    val m = meta.copy(version = 1, location = tableLocation(meta.name).toString)
    writeVersion(m)
    m
  }

  override def loadTable(name: String): TableMetadata = {
    val v = currentVersion(name)
    val p = versionFile(name, v)
    val raw = Files.readAllBytes(p)
    val text =
      if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b)
        new String(new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(raw)).readAllBytes(), StandardCharsets.UTF_8)
      else new String(raw, StandardCharsets.UTF_8)
    MetadataJson.read(text)
  }

  private def currentVersion(name: String): Int = {
    val hint = hintFile(name)
    require(Files.exists(hint), s"table $name does not exist")
    var v = new String(Files.readAllBytes(hint), StandardCharsets.UTF_8).trim.toInt
    // The hint is advisory (written after the CAS); roll forward if a newer
    // committed version exists.
    while (Files.exists(versionFile(name, v + 1))) v += 1
    v
  }

  override def commit(base: TableMetadata, updated: TableMetadata): TableMetadata = {
    val next = updated.copy(version = base.version + 1)
    writeVersion(next)
    next
  }

  private def writeVersion(m: TableMetadata): Unit = {
    val target = versionFile(m.name, m.version)
    val tmp = Files.createTempFile(metaDir(m.name), s".v${m.version}-", ".tmp")
    val plain = MetadataJson.write(m).getBytes(StandardCharsets.UTF_8)
    val bytes =
      if (plain.length >= gzipMetadataAtBytes) {
        val bos = new java.io.ByteArrayOutputStream(plain.length / 4)
        scala.util.Using.resource(new java.util.zip.GZIPOutputStream(bos))(_.write(plain))
        bos.toByteArray
      } else plain
    Files.write(tmp, bytes)
    // createLink is atomic and FAILS if the target exists (unlike
    // ATOMIC_MOVE, which maps to rename(2) and silently replaces) — that
    // failure is the compare-and-swap.
    try Files.createLink(target, tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflictException(
          s"table ${m.name}: version ${m.version} was committed concurrently")
    } finally Files.deleteIfExists(tmp)
    Files.write(hintFile(m.name), m.version.toString.getBytes(StandardCharsets.UTF_8))
  }

  override def listTables: Seq[String] =
    scala.util.Using.resource(Files.list(warehouse)) { s =>
      s.iterator().asScala
        .filter(p => Files.isDirectory(p) && Files.exists(hintFile(p.getFileName.toString)))
        .map(_.getFileName.toString).toSeq.sorted
    }

  override def dropTable(name: String): Unit = {
    val root = warehouse.resolve(name)
    if (Files.exists(root)) {
      scala.util.Using.resource(Files.walk(root))(
        _.iterator().asScala.toSeq).reverse.foreach(Files.deleteIfExists(_))
    }
  }
}

object LocalCatalog {
  def apply(dir: String): LocalCatalog = new LocalCatalog(Paths.get(dir))
}
