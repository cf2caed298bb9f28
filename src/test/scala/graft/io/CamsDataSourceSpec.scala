package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CamsDataSourceSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val fixture = VerifyFixtures.camsExpertFixture()

  test("format(\"cams\") resolves by short name and matches the csv reader path") {
    val v2 = spark.read.format("cams").load(fixture)
    val v1 = CamsExpertCsv.read(spark, fixture)
    assert(v2.schema === v1.schema)
    val a = v2.orderBy("Observation period").collect().map(_.toSeq)
    val b = v1.orderBy("Observation period").collect().map(_.toSeq)
    assert(a.length === b.length && a.length > 100)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  test("column pruning reaches the reader: projected scan parses only requested fields") {
    val v2 = spark.read.format("cams").load(fixture)
      .select(col("GHI"))
    val scan = v2.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }
    assert(scan.isDefined, v2.queryExecution.executedPlan.toString)
    assert(scan.get.readSchema().fieldNames.toSeq === Seq("GHI"),
      scan.get.description())
    // corrupt GHI line ("abc") comes back null; corrupt-time line still
    // yields a row here (time filtering is the pipeline's job)
    val vals = v2.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(vals.contains(None))
    assert(vals.flatten.nonEmpty)
  }

  test("multi-path load decodes the JSON-encoded paths option") {
    val two = spark.read.format("cams").load(fixture, fixture)
    val one = spark.read.format("cams").load(fixture)
    assert(two.count() === 2 * one.count())
  }

  test("blank lines are skipped, matching the csv reader path") {
    val dir = java.nio.file.Files.createTempDirectory("cams-blank")
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture)), "UTF-8")
    val p = dir.resolve("raw_blank.csv")
    java.nio.file.Files.write(p, (src + "\n\n\n").getBytes("UTF-8"))
    val v2 = spark.read.format("cams").load(p.toString)
    val v1 = CamsExpertCsv.read(spark, p.toString)
    assert(v2.count() === v1.count())
  }

  test("schema inference types the observation period as string, data columns as double") {
    val schema = spark.read.format("cams").load(fixture).schema
    assert(schema.fields.head.name === "Observation period")
    assert(schema.fields.head.dataType.typeName === "string")
    assert(schema.fields.tail.forall(_.dataType.typeName === "double"))
  }
}
