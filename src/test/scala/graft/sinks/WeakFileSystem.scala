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

/** Test-only filesystem with the OBJECT-STORE conditional-write
  * contract on local disk: `create(path, overwrite = false)` buffers
  * the stream and PUBLISHES ATOMICALLY AT close() iff the name is
  * still absent (a hard link of a hidden temp — one atomic syscall),
  * throwing FileAlreadyExistsException on conflict. Until close() the
  * name simply does not exist — the S3 `If-None-Match: *` / GCS
  * `ifGenerationMatch=0` behavior the ConditionalPutClaim backend is
  * written against. Registered under scheme `condput` and added to
  * `condPutClaimSchemes` by specs. */
class CondPutFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: URI = URI.create("condput:///")
  override def getScheme: String = "condput"

  // RawLocalFileSystem routes FileSystem.create(f, overwrite) through
  // its own NON-permission overload, so both must defer visibility
  override def create(f: org.apache.hadoop.fs.Path,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    if (overwrite)
      super.create(f, true, bufferSize, replication, blockSize, progress)
    else condCreate(f)

  override def create(f: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    if (overwrite)
      super.create(f, permission, true, bufferSize, replication,
        blockSize, progress)
    else condCreate(f)

  private def condCreate(f: org.apache.hadoop.fs.Path)
      : org.apache.hadoop.fs.FSDataOutputStream = {
      val buf = new java.io.ByteArrayOutputStream()
      new org.apache.hadoop.fs.FSDataOutputStream(
        new java.io.FilterOutputStream(buf) {
          override def close(): Unit = {
            super.close()
            val local = java.nio.file.Paths.get(
              org.apache.hadoop.fs.Path
                .getPathWithoutSchemeAndAuthority(f).toString)
            java.nio.file.Files.createDirectories(local.getParent)
            val tmp = local.resolveSibling(
              ".put-" + java.util.UUID.randomUUID())
            java.nio.file.Files.write(tmp, buf.toByteArray)
            try java.nio.file.Files.createLink(local, tmp)
            catch {
              case _: java.nio.file.FileAlreadyExistsException =>
                throw new org.apache.hadoop.fs.FileAlreadyExistsException(
                  s"conditional PUT lost: $f exists")
            } finally java.nio.file.Files.deleteIfExists(tmp)
          }
        }, null)
    }
}
