package graft.engine

import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HadoopPath}

/** Positioned-read seam under [[SqliteFile]]: the B-tree page walk needs
  * only `pread`-style access — N bytes at an absolute offset — which
  * both a local [[FileChannel]] and Hadoop's `FSDataInputStream`
  * (`PositionedReadable`) provide. Abstracting exactly that operation
  * lets one reader serve POSIX paths on a single node AND the
  * reference's actual migration universe — HDFS listings of `*.sqlite`
  * (/root/reference/trough/sync.py:365-369), which on a cluster are
  * `hdfs://` URIs executors cannot open through NIO — without the
  * decode kernel knowing where bytes live.
  */
private[engine] trait PageSource extends AutoCloseable {
  /** Read into `dst` starting at absolute `position`. Returns the bytes
    * read (possibly fewer than requested only at end of file), or -1 at
    * EOF — [[FileChannel.read]] semantics. */
  def read(dst: ByteBuffer, position: Long): Int
  def size: Long
}

private[engine] object PageSource {

  /** Local files: a thin adapter over NIO's positioned channel read. */
  final class Channel(path: Path) extends PageSource {
    private val ch = FileChannel.open(path, StandardOpenOption.READ)
    def read(dst: ByteBuffer, position: Long): Int = ch.read(dst, position)
    def size: Long = ch.size()
    override def close(): Unit = ch.close()
  }

  /** Any Hadoop filesystem (HDFS, S3A, ABFS, `file:`). Positioned reads
    * go through `PositionedReadable.read(pos, byte[], off, len)` —
    * stateless with respect to the stream cursor, so one open stream
    * serves the whole page walk; the loop absorbs the short reads that
    * are routine on remote stores. */
  final class Hadoop(fs: FileSystem, p: HadoopPath) extends PageSource {
    private val in = fs.open(p)
    val size: Long = fs.getFileStatus(p).getLen
    def read(dst: ByteBuffer, position: Long): Int = {
      if (position >= size) return -1
      val want = math.min(dst.remaining().toLong, size - position).toInt
      val buf = new Array[Byte](want)
      var done = 0
      while (done < want) {
        val n = in.read(position + done, buf, done, want - done)
        if (n < 0) {
          if (done == 0) return -1
          dst.put(buf, 0, done)
          return done
        }
        done += n
      }
      dst.put(buf, 0, done)
      done
    }
    override def close(): Unit = in.close()
  }
}

/** Factory for one database's page sources — the main file plus its
  * `-wal` / `-journal` sidecars, which must resolve in the same
  * directory through the same access path (a WAL read through a
  * different filesystem than its database would see torn state). */
private[engine] sealed trait SqlitePageStore {
  /** The database's name for error messages. */
  def describe: String
  /** Open the main database file (must exist). */
  def openMain(): PageSource
  /** Open the `<db><suffix>` sidecar if it exists with at least
    * `minBytes` bytes (the overlays' header minimums — anything smaller
    * is definitionally empty/reset and overlays nothing). */
  def openSidecar(suffix: String, minBytes: Long): Option[PageSource]
  def sidecarName(suffix: String): String = describe + suffix
}

private[engine] object SqlitePageStore {

  final case class Local(path: Path) extends SqlitePageStore {
    def describe: String = path.toString
    def openMain(): PageSource = {
      require(Files.isRegularFile(path), s"no such file: $path")
      new PageSource.Channel(path)
    }
    def openSidecar(suffix: String, minBytes: Long): Option[PageSource] = {
      val p = path.resolveSibling(path.getFileName.toString + suffix)
      if (Files.isRegularFile(p) && Files.size(p) >= minBytes)
        Some(new PageSource.Channel(p))
      else None
    }
  }

  final class OnHadoop(uri: String, conf: Configuration) extends SqlitePageStore {
    def describe: String = uri
    private def open(u: String, minBytes: Long): Option[PageSource] = {
      val p = new HadoopPath(u)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) {
        val st = fs.getFileStatus(p)
        if (st.isFile && st.getLen >= minBytes)
          return Some(new PageSource.Hadoop(fs, p))
      }
      None
    }
    def openMain(): PageSource =
      open(uri, 0L).getOrElse(
        throw new IllegalArgumentException(s"no such file: $uri"))
    def openSidecar(suffix: String, minBytes: Long): Option[PageSource] =
      open(uri + suffix, minBytes)
  }

  /** Scheme-aware resolution: `hdfs://…`, `s3a://…`, `file:///…` go
    * through the Hadoop FileSystem API; bare POSIX paths keep the
    * direct NIO channel (no Hadoop dispatch on the common local case).
    * A single-letter "scheme" is a Windows drive spec, not a scheme. */
  def forPath(path: String, conf: => Configuration): SqlitePageStore = {
    val scheme =
      try new java.net.URI(path).getScheme
      catch { case _: java.net.URISyntaxException => null }
    if (scheme == null || scheme.length <= 1) Local(Paths.get(path))
    else new OnHadoop(path, conf)
  }
}
