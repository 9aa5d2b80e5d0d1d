package graft.sources

import graft.SparkSpec

/** S6 against embedded Derby: the staging + MERGE upsert path with the
  * same keep-latest expectations as the parquet upsert operator. */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("jdbc upsert: staging insert + MERGE updates matched, inserts unmatched") {
    val t1 = Seq(("k1", 1, "a"), ("k2", 1, "b")).toDF("id", "v", "payload")
    Jdbc.upsert(t1, url, "crime_jdbc", Seq("id"))
    val t2 = Seq(("k2", 2, "B2"), ("k3", 1, "c")).toDF("id", "v", "payload")
    Jdbc.upsert(t2, url, "crime_jdbc", Seq("id"))

    val out = Jdbc.read(spark, url, "crime_jdbc")
      .as[(String, Int, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("k1", 1, "a"), ("k2", 2, "B2"), ("k3", 1, "c")))
  }

  test("jdbc upsert dedups a batch with duplicate keys (keep-latest by version)") {
    // a retried load that re-lands pages: same key, two versions
    val dup = Seq(("d1", 1, "old"), ("d1", 2, "new"), ("d2", 1, "z")).toDF("id", "v", "payload")
    Jdbc.upsert(dup, url, "crime_jdbc3", Seq("id"), versionCol = Some("v"))
    val out = Jdbc.read(spark, url, "crime_jdbc3")
      .as[(String, Int, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("d1", 2, "new"), ("d2", 1, "z")))
    // exact duplicate rows without a version also collapse
    val exact = Seq(("d3", 1, "p"), ("d3", 1, "p")).toDF("id", "v", "payload")
    Jdbc.upsert(exact, url, "crime_jdbc3", Seq("id"))
    assert(Jdbc.read(spark, url, "crime_jdbc3").count() == 3)
  }

  test("jdbc upsert is idempotent and drops its staging table") {
    val batch = Seq(("x1", 7, "p")).toDF("id", "v", "payload")
    Jdbc.upsert(batch, url, "crime_jdbc2", Seq("id"))
    Jdbc.upsert(batch, url, "crime_jdbc2", Seq("id"))
    assert(Jdbc.read(spark, url, "crime_jdbc2").count() == 1)
    // staging dropped after merge
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, "STG_CRIME_JDBC2", null)
      assert(!rs.next())
    } finally conn.close()
  }
}
