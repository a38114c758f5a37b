package graft.engine

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.sys.process._

/** Runs the sandbox `sqlite3` CLI with both ends of the pipe going
  * through temp FILES, for two reasons learned the hard way:
  *
  *  - **argv / ProcessLogger re-encode with the platform charset**
  *    (ASCII in this container), silently mangling non-ASCII SQL or
  *    output before SQLite ever sees it;
  *  - **a stream `#<` pumps stdin on a daemon thread that `.!` does
  *    not reliably join**, so under load sqlite3 can observe early
  *    EOF and exit 0 having executed nothing (observed flake). File
  *    redirects are native `ProcessBuilder` redirects — no pump
  *    thread, no charset hop.
  *
  * Test fixtures and the q53/q56 fixture builders share this so the
  * race is fixed in one place.
  */
object SqliteCli {

  /** Absolute path of the `sqlite3` binary. PATH lookup first, then
    * conventional install locations — test environments don't always
    * export the same PATH to the JVM (a bare-name ProcessBuilder spawn
    * fails with a confusing IOException when they don't). Override
    * with -Dgraft.sqlite3 / GRAFT_SQLITE3. */
  lazy val binary: String = {
    val explicit = sys.props.get("graft.sqlite3")
      .orElse(sys.env.get("GRAFT_SQLITE3"))
    val pathDirs = sys.env.getOrElse("PATH", "")
      .split(java.io.File.pathSeparatorChar).toSeq
    val fallbackDirs = Seq("/usr/bin", "/usr/local/bin", "/opt/sqlite/bin",
      sys.props.getOrElse("user.home", "") + "/miniconda/bin",
      sys.props.getOrElse("user.home", "") + "/.local/bin")
    explicit.orElse {
      (pathDirs ++ fallbackDirs).map(d => new java.io.File(d, "sqlite3"))
        .find(f => f.isFile && f.canExecute).map(_.getAbsolutePath)
    }.getOrElse("sqlite3") // let the spawn error name the real problem
  }

  /** Execute `sql` against `db` (a path, or ":memory:"); returns the
    * exit code. stdout is discarded unless `stdout` is given. */
  def run(db: String, sql: String, stdout: Option[Path] = None): Int = {
    val in = Files.createTempFile("sqlite-cli-in", ".sql")
    try {
      Files.write(in, sql.getBytes(StandardCharsets.UTF_8))
      runFile(db, in, stdout)
    } finally Files.deleteIfExists(in)
  }

  /** Execute an ON-DISK script — for streamed fixture builders whose
    * SQL is bigger than the driver should buffer.
    *
    * Uses `java.lang.ProcessBuilder` redirects directly: scala.sys
    * .process's `#<`/`#>` still pump files through daemon threads (only
    * the operator syntax changes, not the IO model), so the early-EOF
    * flake documented above survived the first rewrite — a parallel
    * test run could still observe sqlite3 exiting with partial input.
    * `redirectInput(File)` is the JDK's native fd-level redirect: the
    * child reads the file itself, no pump thread exists to lose. */
  def runFile(db: String, script: Path, stdout: Option[Path] = None): Int = {
    val pb = new java.lang.ProcessBuilder(binary, db)
    pb.redirectInput(script.toFile)
    stdout match {
      case Some(out) => pb.redirectOutput(out.toFile)
      case None =>
        pb.redirectOutput(java.lang.ProcessBuilder.Redirect.DISCARD)
    }
    pb.redirectError(java.lang.ProcessBuilder.Redirect.INHERIT)
    pb.start().waitFor()
  }

  /** Execute `sql` against `db` and return trimmed stdout decoded as
    * UTF-8; asserts exit code 0. */
  def query(db: String, sql: String): String = {
    val out = Files.createTempFile("sqlite-cli-out", ".txt")
    try {
      val rc = run(db, sql, Some(out))
      require(rc == 0, s"sqlite3 exited $rc for: $sql")
      new String(Files.readAllBytes(out), StandardCharsets.UTF_8).trim
    } finally Files.deleteIfExists(out)
  }
}
