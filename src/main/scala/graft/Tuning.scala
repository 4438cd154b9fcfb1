package graft

/** Session-sizing helpers shared by the [[Verify]] and [[Bench]] mains.
  *
  * Shuffle parallelism must track the DATA, not the core count: at the
  * record scale factor one partition per core is right, but the same
  * session config at a 100× rehearsal makes every shuffle partition
  * 100× the intended size and wide-row sorts die acquiring pages (the
  * first 100× sweep's `SparkOutOfMemoryError` class, SURVEY §9.4). The
  * round-11 fix was a manual `SPARK_GRAFT_SHUFFLE_PARTITIONS` knob; the
  * default is now derived from the input directory's on-disk size so no
  * future scale point needs hand-tuning (VERDICT r11 item 3):
  *
  *   partitions = clamp(inputBytes / 3 MiB, cpus, 4096)
  *
  * The 3 MiB-of-parquet-per-partition divisor is calibrated from the
  * measured decades — it reproduces the hand-tuned values that swept
  * clean (sf0.1 at 17 MB → floor ⇒ one per core, unchanged record; 10×
  * at 174 MB → 58 ≈ the hand-picked 64; 100× at 1.7 GB → 579, the same
  * order as the hand-picked 256) and parquet's ~10× decompression-plus-
  * derivation expansion puts the resulting shuffle partitions well under
  * executor task memory. Overcounting is cheap: AQE coalesces small
  * stages back down at runtime; undercounting is what OOMs. The 4096
  * ceiling bounds scheduler overhead on a single machine; the explicit
  * env override still wins everywhere.
  */
object Tuning {

  private val BytesPerPartition: Long = 3L << 20
  private val MaxPartitions: Int = 4096

  /** The default shuffle-partition count for a session reading `sfDir`:
    * the env override if set, else [[partitionsForBytes]] of the
    * directory's total file size. */
  def shufflePartitions(sfDir: String, cpus: Int): Int =
    sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS").map(_.toInt)
      .getOrElse(partitionsForBytes(dirBytes(sfDir), cpus))

  /** clamp(bytes / 3 MiB, cpus, 4096) — pure, spec-pinned. */
  private[graft] def partitionsForBytes(bytes: Long, cpus: Int): Int =
    math.min(MaxPartitions.toLong,
      math.max(cpus.toLong, bytes / BytesPerPartition)).toInt

  /** Total size of all regular files under `dir` (recursive); 0 when the
    * directory is absent or unreadable — the formula then floors to one
    * partition per core, the historic default. */
  private[graft] def dirBytes(dir: String): Long = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(root)) 0L
    else {
      val stream = java.nio.file.Files.walk(root)
      try stream
        .filter(p => java.nio.file.Files.isRegularFile(p))
        .mapToLong(p =>
          try java.nio.file.Files.size(p) catch { case _: Throwable => 0L })
        .sum()
      catch { case _: Throwable => 0L }
      finally stream.close()
    }
  }
}
