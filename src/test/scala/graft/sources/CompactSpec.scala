package graft.sources

import graft.SparkSpec

/** Landing-zone compaction: fewer files, identical rows, untouched
  * non-candidate partitions. */
class CompactSpec extends SparkSpec {

  private def landSmallPages(landing: String, loadDate: String, pages: Int): Unit = {
    val api = new ApiSimulator(totalRows = pages * 10, pageSize = 10)
    api.fetchPages(loadDate, loadDate).foreach { case (_, rows) =>
      if (rows.nonEmpty) LandingZone.write(api.toDataFrame(spark, rows), landing, loadDate)
    }
  }

  test("compaction merges small files and preserves every row") {
    val landing = java.nio.file.Files.createTempDirectory("compact").toString + "/raw"
    landSmallPages(landing, "2025-07-01", pages = 8) // 8 tiny files per leaf
    val before = LandingZone.read(spark, landing, Nil).cache()
    val nBefore = before.count()

    val stats = Compact.landingZone(spark, landing, targetBytes = 512L * 1024, minFiles = 2)
    assert(stats.nonEmpty)
    stats.foreach { st =>
      assert(st.filesAfter < st.filesBefore, s"no reduction for ${st.dir}: $st")
      assert(st.filesAfter >= 1)
    }

    val after = LandingZone.read(spark, landing, Nil)
    assert(after.count() === nBefore)
    assert(after.except(before).isEmpty && before.except(after).isEmpty)
    before.unpersist()
    ()
  }

  test("partitions under minFiles are never read or rewritten") {
    val landing = java.nio.file.Files.createTempDirectory("compact2").toString + "/raw"
    landSmallPages(landing, "2025-07-01", pages = 6)
    landSmallPages(landing, "2025-07-02", pages = 6)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    // collapse day 2 to a single file so it is not a candidate
    Compact.landingZone(spark, landing, targetBytes = 64L * 1024 * 1024, minFiles = 2)
    def leafFiles(glob: String) =
      fs.globStatus(new org.apache.hadoop.fs.Path(s"$landing/$glob/part-*")).toSeq
    val day2 = leafFiles("year=*/month=*/load_date=2025-07-02")
    assert(day2.size === 1)
    val mtimes = day2.map(s => s.getPath.toString -> s.getModificationTime).toMap

    // second run: only day 1 could qualify (it is also 1 file now) — so
    // nothing qualifies and day 2's file is bit-identical untouched
    val stats = Compact.landingZone(spark, landing, targetBytes = 64L * 1024 * 1024, minFiles = 2)
    assert(stats.isEmpty)
    val day2After = leafFiles("year=*/month=*/load_date=2025-07-02")
    assert(day2After.map(s => s.getPath.toString -> s.getModificationTime).toMap === mtimes)
  }
}
