package graft

/** Content-keyed fingerprints for the fixture/index caches.
  *
  * Keyed by file NAME + LENGTH + a content sample (md5 of the first and
  * last 64 KB), NOT mtime: regenerated-but-identical source tables (the
  * per-round testdata refresh) keep their fingerprint, so warm caches
  * survive across benchmark rounds instead of rebuilding every fixture
  * for nothing. A collision across genuinely different data would need
  * identical head and tail bytes at identical length — not a realistic
  * failure mode for parquet, whose footer (schema, row-group offsets,
  * column stats) lives in the sampled tail.
  */
object Fingerprint {

  /** md5 over the first and last 64 KB (whole file when smaller). */
  def ofFile(f: java.io.File): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val len = f.length()
    val in = new java.io.RandomAccessFile(f, "r")
    try {
      val head = new Array[Byte](math.min(65536L, len).toInt)
      in.readFully(head)
      md.update(head)
      if (len > 65536L) {
        val start = math.max(65536L, len - 65536L)
        in.seek(start)
        val tail = new Array[Byte]((len - start).toInt)
        in.readFully(tail)
        md.update(tail)
      }
    } finally in.close()
    md.digest().map(b => f"$b%02x").mkString
  }

  /** `name:length:sample|...` over a table's part files (or the single
    * file when the path is not a directory). A missing path contributes
    * a stable `absent` marker instead of throwing — layout planning may
    * fingerprint a source that is only about to exist (the mtime scheme
    * this replaces read 0:0 there). */
  def ofTable(dirOrFile: java.io.File): String = {
    val files = Option(dirOrFile.listFiles()).map(_.toSeq.filter(_.isFile))
      .getOrElse(Seq(dirOrFile))
    files.sortBy(_.getName)
      .map(f =>
        if (f.isFile) s"${f.getName}:${f.length}:${ofFile(f)}"
        else s"${f.getName}:absent")
      .mkString("|")
  }

  /** 128-bit hex digest of an arbitrary cache-key string. */
  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
}
