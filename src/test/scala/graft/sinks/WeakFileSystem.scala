package graft.sinks

import java.net.URI

/** Test-only filesystem: local disk under a NON-file scheme, so specs
  * can drive VersionedKeyedTable's weak-scheme fallback paths (the
  * atomic-exclusive-create claim and the bounded torn-claim poll) on
  * a real filesystem. Registered per-spec via
  * `hadoopConfiguration.set("fs.weak.impl", ...)`. createNewFile maps
  * to File.createNewFile — atomically exclusive, like the HDFS
  * overwrite=false create — so exactly one racer can ever win a
  * version name here too. */
class WeakFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: URI = URI.create("weak:///")
  override def getScheme: String = "weak"
}

/** Test-only filesystem with the HDFS rename contract on local disk:
  * rename FAILS when the destination exists (RawLocalFileSystem, like
  * POSIX rename(2), would overwrite it). Registered under scheme
  * `hdfslike` and added to `renameClaimSchemes` by specs, so the
  * RenameClaim backend — temp write + rename-as-CAS, atomic with
  * content — runs against a real filesystem. */
class HdfsLikeFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: URI = URI.create("hdfslike:///")
  override def getScheme: String = "hdfslike"
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean =
    if (exists(dst)) false else super.rename(src, dst)
}
