package graft.net

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import graft.core.{DoubleLockError, JobResult}

/** Resumable queue of job refs; consume-each stops at the first failure and
  * persists the remaining queue so a restart skips completed jobs
  * (reference: lib/bricolage/taskqueue.rb:13-60 memory, 63-172 file).
  */
trait TaskQueue {
  def enqueue(ref: JobRef): Unit
  def queued: Seq[JobRef]
  def isEmpty: Boolean = queued.isEmpty

  /** Run `f` over each task in order. Stops at the first non-success; the
    * failed task stays at the head of the queue
    * (reference: taskqueue.rb:97-108).
    */
  def consumeEach(f: JobRef => JobResult): JobResult

  def lock(): Unit = ()
  def unlock(): Unit = ()
  def locked: Boolean = false

  /** Reload persisted state (no-op for the in-memory queue). Called once
    * after construction + lock/clear checks; durable queues bind their
    * restored remainder here.
    */
  def restore(): Unit = ()

  /** Operator guidance shown when a run finds the queue still locked
    * (reference: taskqueue.rb unlock_help per queue type).
    */
  def unlockHelp: String = "unlock the queue"

  /** Release backing resources (a DB-backed queue closes its store so an
    * embedded database can be re-opened by a later run in the same JVM;
    * memory/file queues have nothing to release).
    */
  def close(): Unit = ()
}

final class MemoryTaskQueue extends TaskQueue {
  private val q = mutable.Queue.empty[JobRef]
  def enqueue(ref: JobRef): Unit = q.enqueue(ref)
  def queued: Seq[JobRef] = q.toSeq
  def consumeEach(f: JobRef => JobResult): JobResult = {
    while (q.nonEmpty) {
      val r = f(q.head)
      if (!r.success) return r
      q.dequeue()
    }
    JobResult.success
  }
}

/** File-backed queue: one job ref per line, atomic tmp+rename save, `.LOCK`
  * sibling file guards concurrent runners
  * (reference: taskqueue.rb:63-172; save at :117-127, lock at :129-147).
  */
final class FileTaskQueue(path: Path) extends TaskQueue {
  private val q = mutable.Queue.empty[JobRef]

  restore()

  private def lockPath: Path = path.resolveSibling(path.getFileName.toString + ".LOCK")

  // enqueue does NOT save: persistence starts at consume (reference:
  // taskqueue.rb:23-27 vs :35-46), so read-only flows over a fresh queue
  // (--list-jobs, --check-only) leave no state file behind
  def enqueue(ref: JobRef): Unit = q.enqueue(ref)
  def queued: Seq[JobRef] = q.toSeq

  /** Reload persisted queue state (reference: taskqueue.rb:110-115). */
  override def restore(): Unit = {
    q.clear()
    if (Files.exists(path))
      Files.readAllLines(path).asScala.map(_.trim).filter(_.nonEmpty)
        .foreach(l => q.enqueue(JobRef.parse(l)))
  }

  def save(): Unit = {
    if (q.isEmpty) {
      Files.deleteIfExists(path)
    } else {
      if (path.getParent != null) Files.createDirectories(path.getParent)
      val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
      Files.writeString(tmp, q.map(_.toString).mkString("", "\n", "\n"))
      Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    }
  }

  def consumeEach(f: JobRef => JobResult): JobResult = {
    lock()
    try {
      save() // persist the full queue before the first job (taskqueue.rb:37)
      while (q.nonEmpty) {
        val r = f(q.head)
        if (!r.success) { save(); return r }
        q.dequeue()
        save()
      }
      JobResult.success
    } finally unlock()
  }

  override def lock(): Unit = {
    if (locked)
      throw new DoubleLockError(s"queue already locked: $lockPath")
    if (path.getParent != null) Files.createDirectories(path.getParent)
    Files.createFile(lockPath)
  }

  override def unlock(): Unit = { Files.deleteIfExists(lockPath); () }
  override def locked: Boolean = Files.exists(lockPath)
  override def unlockHelp: String = s"remove $lockPath"
}
