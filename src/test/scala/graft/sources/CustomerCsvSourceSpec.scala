package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The graft-customers DataSource V2 connector: Ingest-parity row
  * validity, RFC 4180-subset quoting, and — the reason it exists —
  * Catalyst negotiating column pruning and filter pushdown with the
  * scan (asserted on the executed plan, not just results).
  */
class CustomerCsvSourceSpec extends SparkSpec {

  private def writeFiles(dir: String, files: (String, Seq[String])*): String = {
    Files.createDirectories(Paths.get(dir)): Unit
    files.foreach { case (name, lines) =>
      Files.write(Paths.get(dir, name),
        lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
    }
    dir
  }

  private def load(dir: String, header: Boolean = false): DataFrame =
    spark.read.format("graft-customers")
      .option("header", header.toString).load(dir)

  private def mkData(): String = writeFiles(tmpDir("dsv2") + "/in",
    "00.csv" -> Seq(
      "1,Ann,A,ann@example.com,555-1",
      "notanint,Bad,B,bad@example.com,555-0", // bad id -> skipped
      "2,\"Quo,ted\",Q,quoted@example.com,555-2", // protected comma
      "3,Cai,C,,555-3"), // empty email -> skipped
    "01.csv" -> Seq(
      "4,Dee,D,dee@example.com,555-4",
      "5,Eve,E,eve@example.com", // missing phone -> null, still valid
      "6,Fay,F,fay@example.com,555-6,EXTRA,FIELDS", // arity>5 -> skipped
      "7,G\"\"s,G,g@example.com,555-7",
      "8,Hal,H,hal@example.com,")) // present-but-empty phone -> null

  test("valid rows surface with Ingest-parity validation; offenders skip") {
    val df = load(mkData())
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L, 5L, 7L, 8L))
    assert(rows(1).getString(1) === "Quo,ted", "quoted comma must be protected")
    assert(rows(3).isNullAt(4), "missing trailing field must read as null")
    assert(rows(5).isNullAt(4),
      "present-but-empty field must read as null (Spark-CSV/univocity parity, " +
        "or pushed IsNotNull/EqualTo filters see divergent values)")
  }

  test("header option skips exactly one line per file") {
    val dir = writeFiles(tmpDir("dsv2h") + "/in",
      "00.csv" -> Seq("id,first_name,last_name,email,phone",
        "1,Ann,A,ann@example.com,555-1"))
    assert(load(dir, header = true).count() === 1)
    assert(load(dir, header = false).count() === 1,
      "headerless read skips the header line only because its id fails to parse")
  }

  test("column pruning reaches the scan: 2-column projection reads 2 columns") {
    val df = load(mkData()).select("id", "email")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftCustomerCsv"), s"DSv2 scan missing from plan:\n$plan")
    assert(plan.contains("struct<id:bigint,email:string>"),
      s"pruned ReadSchema not negotiated down to the scan:\n$plan")
    assert(df.orderBy("id").collect().map(_.getString(1)).head === "ann@example.com")
  }

  test("id filters push into the reader; residuals stay above the scan") {
    val pushedDf = load(mkData()).filter(col("id") > 2L)
    val plan = pushedDf.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(id,2"),
      s"id comparison did not push into the scan:\n$plan")
    assert(pushedDf.orderBy("id").collect().map(_.getLong(0)).toSeq === Seq(4L, 5L, 7L, 8L))

    val residualDf = load(mkData()).filter(col("phone").endsWith("-4"))
    val rplan = residualDf.queryExecution.executedPlan.toString
    assert(rplan.contains("EndsWith") || rplan.contains("ends_with"),
      s"residual predicate vanished (would silently widen results):\n$rplan")
    assert(residualDf.collect().map(_.getLong(0)).toSeq === Seq(4L))
  }

  test("COUNT(*) prunes to zero columns and still counts valid rows only") {
    assert(load(mkData()).count() === 6L)
  }

  test("DSv2 scan agrees with the Ingest path on the same directory") {
    val dir = mkData()
    val viaIngest = graft.pipeline.Ingest.validate(
      graft.pipeline.Ingest.readCsv(spark, dir, header = false))._1
      .select("id", "email")
    // Ingest's Spark-CSV arity contract differs on the >5-field line
    // (univocity drops extra tokens; the connector treats arity>5 as
    // malformed) — align on the common subset.
    val viaDsv2 = load(dir).select("id", "email").filter(col("id") =!= 6L)
    val ing = viaIngest.filter(col("id") =!= 6L)
    assert(viaDsv2.exceptAll(ing).isEmpty && ing.exceptAll(viaDsv2).isEmpty)
  }
}
