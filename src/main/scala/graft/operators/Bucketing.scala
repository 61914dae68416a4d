package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the write-once answer to repeated fact-fact
  * joins. A table written `bucketBy(n, key)` is hash-partitioned into n
  * files per partition AND records that layout in the catalog; a join
  * of two tables bucketed on the same key with the same n needs NO
  * exchange on either side (each bucket pair joins locally). At 100 TB
  * this converts every subsequent orders⋈lineitem from two full
  * shuffles into a zero-shuffle zip of pre-matched buckets — the batch
  * analog of the persisted ANN index: pay the layout cost once, join
  * many times.
  *
  * Spark's bucketing metadata lives in the session catalog, not the
  * files, so a fresh session must re-register existing data with a
  * `CREATE TABLE ... CLUSTERED BY ... LOCATION` DDL (cheap — no
  * rewrite) before the scan reports its hash partitioning.
  */
object Bucketing {

  /** Make `table` available bucketed by `key` into `nBuckets` at
    * `path`: reuses existing files when present (DDL-register only),
    * writes them once otherwise. Idempotent per session. */
  def ensureBucketed(
      spark: SparkSession, df: DataFrame, table: String, path: String,
      key: String, nBuckets: Int): Unit = {
    if (spark.catalog.tableExists(table)) {
      // the early return must not hand back a table bucketed some other
      // way — a mismatched layout would silently "co-locate" a wrong join
      val meta = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      val spec = meta.bucketSpec
      require(spec.exists(b => b.numBuckets == nBuckets &&
        b.bucketColumnNames == Seq(key)),
        s"table $table exists with bucketSpec $spec, " +
          s"wanted $nBuckets buckets on $key")
      // ... and must carry the same projection: a fingerprint collision
      // between two projections of one source must fail loudly here,
      // not silently serve the wrong columns
      require(meta.schema.fieldNames.sameElements(df.schema.fieldNames),
        s"table $table exists with columns " +
          s"${meta.schema.fieldNames.mkString(",")}, wanted " +
          df.schema.fieldNames.mkString(","))
      return
    }
    val done = new java.io.File(path, "_SUCCESS")
    if (done.exists()) {
      spark.sql(
        s"""CREATE TABLE $table (${df.schema.toDDL}) USING PARQUET
           |CLUSTERED BY ($key) SORTED BY ($key) INTO $nBuckets BUCKETS
           |LOCATION '$path'""".stripMargin)
    } else {
      // co-partition the write with the bucket function: one file per
      // bucket (instead of one per task per bucket), so bucket scans
      // stay single-file and the sortBy metadata holds
      df.repartition(nBuckets, org.apache.spark.sql.functions.col(key))
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(nBuckets, key)
        .sortBy(key)
        .saveAsTable(table)
    }
  }

  /** Deterministic scratch location + table name for a source dataset,
    * keyed by the source FILES (name+length+content sample — mtime-free,
    * see [[graft.Fingerprint]]) AND the requested layout (bucket key,
    * bucket count, projected columns) so neither regenerated testdata
    * nor a second caller asking for a different layout of the same
    * source can ever hit a stale table — the same fingerprint scheme as
    * the persisted ANN indexes. */
  def layoutFor(dir: String, name: String, key: String, nBuckets: Int,
      columns: Seq[String]): (String, String) = {
    val src = new java.io.File(s"$dir/$name.parquet")
    val srcFp = graft.Fingerprint.ofTable(src)
    // 128-bit md5, not 32-bit String.hashCode: at 2^16 distinct layouts
    // a 32-bit fingerprint has ~40% birthday-collision odds — and a
    // collision here would silently reuse the WRONG table
    val fp = graft.Fingerprint.md5hex(
      s"$dir#$srcFp#$key#$nBuckets#${columns.mkString(",")}")
    val id = fp.take(16)
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-bucketed-$name-$id").toString
    (s"graft_bkt_${name}_$id", path)
  }
}
