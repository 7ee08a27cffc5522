package graft.streaming

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.DataFrame

/** Test helper shared by the stream-vs-batch replay specs: write a
  * DataFrame as ONE parquet part file under `dir` with a forced mtime,
  * so `maxFilesPerTrigger=1` file streams replay the staged files as
  * deterministic, mtime-ordered micro-batches. */
object StageFiles {
  def stageFile(df: DataFrame, dir: Path, name: String,
                mtime: Long): Unit = {
    val tmp = Files.createTempDirectory("stage_half")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val listing = Files.list(tmp)
    val src =
      try {
        var found: Path = null
        val it = listing.iterator()
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString.endsWith(".parquet")) found = p
        }
        found
      } finally listing.close()
    val dest = dir.resolve(name)
    Files.copy(src, dest)
    Files.setLastModifiedTime(dest, FileTime.fromMillis(mtime))
  }
}
