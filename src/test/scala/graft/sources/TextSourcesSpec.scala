package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("JSONL round-trips the documents table with an explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val docs = graft.core.Tables(spark, Sf0001).documents
    docs.write.mode("overwrite").json(s"$dir/docs")
    val back = TextSources.readJsonl(spark, s"$dir/docs", docs.schema)
    val split = TextSources.splitCorrupt(back)
    assert(split.quarantined.isEmpty, "clean corpus has no quarantined lines")
    assert(split.valid.count() == docs.count())
    assert(split.valid.select(docs.columns.map(col): _*).except(docs).count() == 0 &&
      docs.except(split.valid.select(docs.columns.map(col): _*)).count() == 0,
      "JSONL round-trip must preserve every row")
    split.release()
  }

  test("malformed JSONL lines are quarantined, not dropped or fatal") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-bad").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/mixed.jsonl"),
      java.util.Arrays.asList(
        """{"doc_id": 1, "text": "ok one"}""",
        """{"doc_id": 2 "text": "missing comma"}""",
        """not json at all""",
        """{"doc_id": 3, "text": "ok two"}"""))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val split = TextSources.splitCorrupt(
      TextSources.readJsonl(spark, s"$dir/mixed.jsonl", schema))
    assert(split.valid.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(split.quarantined.count() == 2, "both malformed lines quarantined with their raw text")
    assert(split.quarantined.as[String].collect().exists(_.contains("not json at all")))
    split.release()
  }

  test("text-line source keeps per-file provenance") {
    val dir = java.nio.file.Files.createTempDirectory("graft-txt").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/a.txt"), java.util.Arrays.asList("line one", "line two"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/b.txt"), java.util.Arrays.asList("other corpus"))
    val lines = TextSources.readTextLines(spark, dir)
    assert(lines.count() == 3)
    val byFile = lines
      .groupBy(regexp_extract(col("source_file"), "([ab]\\.txt)$", 1).as("f"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFile == Map("a.txt" -> 2L, "b.txt" -> 1L))
  }
}
