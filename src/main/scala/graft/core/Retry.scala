package graft.core

/** Generic bounded retry with fixed sleep — the reference's idiom for
  * connection opens (psqldatasource.rb:120-135, 3 retries × 1 s) and S3
  * listing (s3datasource.rb:127-140, retry_limit 3).
  */
object Retry {

  def withRetry[A](limit: Int = 3, sleepMs: Long = 1000,
      retriable: Throwable => Boolean = _.isInstanceOf[java.io.IOException],
      onRetry: (Throwable, Int) => Unit = (_, _) => ())(f: => A): A = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: Throwable if attempt < limit && retriable(e) =>
          attempt += 1
          onRetry(e, attempt)
          Thread.sleep(sleepMs)
        case e: Throwable => throw e
      }
    }
    sys.error("unreachable")
  }
}
