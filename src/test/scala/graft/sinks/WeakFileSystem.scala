package graft.sinks

import java.net.URI

/** Test-only filesystem: local disk under a NON-file scheme, so specs
  * can drive VersionedKeyedTable's weak-scheme fallback paths (the
  * rename-based claim and the bounded torn-claim poll) on a real
  * filesystem. Registered per-spec via
  * `hadoopConfiguration.set("fs.weak.impl", ...)`. Like HDFS — and
  * unlike raw POSIX rename — a claim rename only lands when the
  * target name is free, which the store's exists-check provides. */
class WeakFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: URI = URI.create("weak:///")
  override def getScheme: String = "weak"
}
