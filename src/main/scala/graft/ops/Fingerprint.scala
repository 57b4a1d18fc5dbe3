package graft.ops

/** One definition of the source-data fingerprint every driver-side
  * artifact cache keys on (index stores, BPE merge caches, fitted
  * centroids): the recursive (path, length, mtime) walk of one table's
  * parquet directory. Two copies of this logic drifting apart would
  * silently desynchronize cache invalidation between artifacts built
  * from the same source.
  */
object Fingerprint {
  def of(dir: String, srcFile: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).flatMap(walk)
      else Seq(f)
    walk(new java.io.File(s"$dir/$srcFile"))
      .map(f => s"${f.getPath}:${f.length}:${f.lastModified}").mkString("|")
  }
}
