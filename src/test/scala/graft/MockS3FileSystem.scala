package graft

import java.net.URI
import java.util.concurrent.atomic.AtomicInteger
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Test-only Hadoop FileSystem modelling an object store's one defining
  * restriction: there is NO rename. Every other operation (create, open,
  * list, delete, mkdirs, status) delegates to the local filesystem, so a
  * `mocks3:///tmp/...` path is backed by the real local dir — but any
  * code path that tries to rename (FileOutputCommitter-style commits,
  * tmp+move pointer swaps) fails loudly and is counted.
  *
  * Registered per-test via
  * `spark.sparkContext.hadoopConfiguration.set("fs.mocks3.impl", ...)`. */
class MockS3FileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mocks3"
  override def getUri: URI = URI.create("mocks3:///")
  override def rename(src: Path, dst: Path): Boolean = {
    MockS3FileSystem.renameCalls.incrementAndGet()
    throw new UnsupportedOperationException(
      s"mocks3 has no rename: $src -> $dst")
  }
}

object MockS3FileSystem {
  val renameCalls = new AtomicInteger(0)
}
