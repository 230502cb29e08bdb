package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ORC interchange (q155's surface): round-trip fidelity and scan-level
  * filter pushdown — ORC is the non-parquet columnar format the engine
  * certifies for export/import interchange.
  */
class InterchangeSpec extends SparkSpec {
  import spark.implicits._

  private def scratch(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_orc_spec_")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("ORC round-trip preserves schema and values for the interchange types") {
    val df = Seq(
      (1L, 2.5, "R", java.sql.Timestamp.valueOf("2024-03-01 10:30:00")),
      (2L, -0.75, "A", java.sql.Timestamp.valueOf("1997-12-31 23:59:59"))
    ).toDF("k", "x", "flag", "ts")
    val path = s"${scratch()}/t_orc"
    df.write.orc(path)
    val back = spark.read.orc(path)
    // files always read back nullable — names and types are the contract
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)),
      "bigint/double/string/timestamp must survive ORC")
    assert(back.orderBy("k").collect().toSeq == df.orderBy("k").collect().toSeq)
  }

  test("ORC scans push equality filters down to the reader") {
    val path = s"${scratch()}/push_orc"
    Seq((1L, "R"), (2L, "A"), (3L, "R")).toDF("k", "flag").write.orc(path)
    val plan = spark.read.orc(path)
      .where(col("flag") === "R")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Format: ORC"), s"expected an ORC scan:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(flag), EqualTo(flag,R)]"),
      s"the flag filter must reach the ORC reader:\n$plan")
  }
}
