package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Driver-side file listing shared by the bronze DSv2 sources: expands
  * glob patterns via `fs.globStatus` FIRST (Hadoop's `listFiles` does NOT
  * expand globs — a load of a star-pattern path would otherwise throw
  * FileNotFoundException), then recurses into matched directories,
  * keeping files with the given suffix. Deterministic (sorted) so
  * partition planning is stable across runs. */
private[v2] object SourceFiles {
  def list(p: String, suffix: String, conf: Configuration): Seq[String] = {
    val path = new Path(p)
    val fs = path.getFileSystem(conf)
    val matched = Option(fs.globStatus(path)).map(_.toIndexedSeq)
      .getOrElse(IndexedSeq.empty)
    if (matched.isEmpty)
      throw new java.io.FileNotFoundException(
        s"no files match $p (glob patterns and literal dir/file paths are supported)")
    matched.flatMap { st =>
      if (st.isDirectory) {
        val it = fs.listFiles(st.getPath, true)
        val b = Seq.newBuilder[String]
        while (it.hasNext) {
          val f = it.next()
          if (f.isFile && f.getPath.getName.endsWith(suffix))
            b += f.getPath.toString
        }
        b.result()
      } else if (st.getPath.getName.endsWith(suffix)) Seq(st.getPath.toString)
      else Seq.empty
    }.sorted
  }
}
