package graft.etl

import org.apache.hadoop.fs.{Path => HPath, RawLocalFileSystem}

/** Test FileSystem for the `failfs://` scheme: a local FS whose `rename`
  * REFUSES (returns false, Hadoop's non-throwing failure mode) whenever
  * the toggle is set and the destination is the upsert swap's `._old`
  * path — simulating object stores / filesystems where rename fails by
  * boolean. Lets LoadSpec prove the staged swap fails LOUDLY instead of
  * half-completing. */
class RefusingRenameFs extends RawLocalFileSystem {
  override def getScheme: String = "failfs"
  override def getUri: java.net.URI = java.net.URI.create("failfs:///")
  override def rename(src: HPath, dst: HPath): Boolean = {
    if (RefusingRenameFs.refuseOldSwap && dst.getName.endsWith("._old")) false
    else super.rename(src, dst)
  }
}

object RefusingRenameFs {
  @volatile var refuseOldSwap = false
}
