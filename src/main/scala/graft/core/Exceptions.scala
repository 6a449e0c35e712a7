package graft.core

/** Error taxonomy mirroring the reference's three-way split
  * (reference: lib/bricolage/exception.rb:101-162): JobFailure for
  * expected production faults (SQL errors, I/O, locks), JobError for
  * user-configuration bugs (bad options/parameters), FatalError for
  * framework bugs. Exit codes 0/1/2 (reference: lib/bricolage/jobresult.rb:26-28).
  */
class JobFailure(msg: String, cause: Throwable = null) extends RuntimeException(msg, cause)

class JobError(msg: String, cause: Throwable = null) extends RuntimeException(msg, cause)

class FatalError(msg: String, cause: Throwable = null) extends RuntimeException(msg, cause)

class ParameterError(msg: String) extends JobError(msg)

class DoubleLockError(msg: String) extends JobFailure(msg)
