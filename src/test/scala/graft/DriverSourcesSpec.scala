package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.jobs.LinkExtraction
import graft.sources.DriverSources

class DriverSourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("pagedSource: drains pages until empty, retries transient failures") {
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType)))
    val pages = Map(
      0 -> Seq(Row(1, "a"), Row(2, "b")),
      1 -> Seq(Row(3, "c")))
    var failuresLeft = 2 // page 1 fails twice, then succeeds (3 retries)
    val df = DriverSources.pagedSource(spark, schema) { page =>
      if (page == 1 && failuresLeft > 0) { failuresLeft -= 1; sys.error("transient") }
      pages.getOrElse(page, Seq.empty)
    }
    assert(df.orderBy("id").collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("pagedSource: persistent failure raises after 3 attempts") {
    val schema = StructType(Seq(StructField("id", IntegerType)))
    intercept[RuntimeException] {
      DriverSources.pagedSource(spark, schema)(_ => sys.error("down"))
    }
  }

  test("parseBinaryToc round-trips the pg_dump TOC analog") {
    val entries = Seq((2001, "lineitem"), (2002, "orders"), (2003, "völkerwanderung"))
    val df = DriverSources.parseBinaryToc(spark, DriverSources.encodeToc(entries))
    val got = df.orderBy("table_id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == entries)
  }

  test("link classification + bug-id extraction (etl/bugzilla.py:337-388)") {
    val df = Seq(Tuple1(Seq(
      "https://bugzilla.mozilla.org/show_bug.cgi?id=42",
      "https://webcompat.com/issues/1234",
      "https://github.com/webcompat/web-bugs/issues/99",
      "https://example.com/whatever"))).toDF("see_also")
    val classes = df.select(LinkExtraction.classifiedLinks(col("see_also")).as("links"))
      .select(explode(col("links")).as("l"))
      .select("l.link_class", "l.linked_bug")
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(classes == Seq(("bugzilla", 42L), ("webcompat", -1L),
      ("github-web-bugs", -1L), ("other", -1L)))
    val ids = df.select(LinkExtraction.linkedBugIds(col("see_also")).as("ids"))
      .collect().head.getSeq[Long](0)
    assert(ids == Seq(42L))
  }
}
