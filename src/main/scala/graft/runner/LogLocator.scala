package graft.runner

import java.io.{FileOutputStream, PrintStream}
import java.nio.file.{Files, Path}

/** Per-job stdout/stderr redirection to a log file
  * (reference: lib/bricolage/loglocator.rb:21-40 redirect_stdouts —
  * reopen, run, restore, then upload). JVM-level System.out/err swap;
  * also swaps scala.Console so `println` from job code lands in the file.
  */
object LogLocator {

  def redirect[A](path: Path, upload: Option[Path => Unit] = None)(f: => A): A = {
    if (path.getParent != null) Files.createDirectories(path.getParent)
    val out = new PrintStream(new FileOutputStream(path.toFile), true)
    val origOut = System.out
    val origErr = System.err
    System.setOut(out)
    System.setErr(out)
    try Console.withOut(out)(Console.withErr(out)(f))
    finally {
      System.setOut(origOut)
      System.setErr(origErr)
      out.close()
      // post-run log shipping (reference: loglocator.rb:60-76 upload —
      // failures warn, never fail the job)
      upload.foreach { up =>
        try up(path)
        catch { case e: Exception =>
          System.err.println(s"warning: log upload failed: ${e.getMessage}: $path")
        }
      }
    }
  }
}
