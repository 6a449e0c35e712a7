package graft.core

/** Outcome of a job run (reference: lib/bricolage/jobresult.rb:5-73).
  * status ∈ success/failure/error with process exit codes 0/1/2.
  */
final case class JobResult(status: JobResult.Status, message: String = "") {
  def success: Boolean = status == JobResult.Success
  def exitCode: Int = status match {
    case JobResult.Success => 0
    case JobResult.Failure => 1
    case JobResult.Error   => 2
  }
}

object JobResult {
  sealed trait Status
  case object Success extends Status
  case object Failure extends Status
  case object Error extends Status

  val success: JobResult = JobResult(Success)
  def failure(msg: String): JobResult = JobResult(Failure, msg)
  def error(msg: String): JobResult = JobResult(Error, msg)

  /** Map a thrown exception to the reference's exit taxonomy. */
  def forException(e: Throwable): JobResult = e match {
    case _: JobError   => JobResult(Error, e.getMessage)
    case _: JobFailure => JobResult(Failure, e.getMessage)
    case _             => JobResult(Error, String.valueOf(e.getMessage))
  }
}
