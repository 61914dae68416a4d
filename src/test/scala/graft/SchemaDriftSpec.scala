package graft

import org.apache.spark.sql.types._

/** Guard against driver-side testdata regeneration drift.
  *
  * Round 5 lesson: the generator flipped events.ts from parquet
  * TIMESTAMP(NANOS) to TIMESTAMP_NTZ between rounds and 23 catalog
  * queries failed analysis in the official bench/correctness run.
  * [[Tables.load]] now normalizes every table to a canonical logical
  * schema; this spec asserts that contract holds for every table at
  * every generated scale factor, so the next generator change fails
  * ONE loud test here instead of N opaque downstream analysis errors.
  */
class SchemaDriftSpec extends SparkSpec {

  private val sfDirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    .filter(d => new java.io.File(d).isDirectory)

  test("testdata dirs exist") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf* directories found")
  }

  for (dir <- sfDirs; name <- Tables.names)
    test(s"$dir/$name normalizes to the canonical schema") {
      val got = Tables.load(spark, dir, name).schema
      val want = Tables.canonicalSchema(name)
      val gotPairs = got.fields.map(f => f.name -> f.dataType).toSeq
      val wantPairs = want.fields.map(f => f.name -> f.dataType).toSeq
      assert(gotPairs == wantPairs,
        s"schema drift in $name: got $gotPairs want $wantPairs — " +
          "extend Tables.canonical normalization for the new physical type")
    }

  test("every canonical table is non-empty at the smallest sf") {
    for (name <- Tables.names) {
      val n = Tables.load(spark, sfDirs.head, name).count()
      assert(n > 0, s"$name is empty at ${sfDirs.head}")
    }
  }
}
