package graft

import org.apache.spark.sql.functions._
import graft.operators.Prioritizer
import graft.sources.Readers

class PrioritizerSpec extends SparkSpec {
  import spark.implicits._

  test("F18 ladder: kev→1, cvss+epss→1, cvss→2, epss→3, else→4; null epss = 0") {
    val rows = Seq(
      ("kev-only", "yes", 0.0, null.asInstanceOf[java.lang.Double], 1),
      ("both-high", null, 9.8, java.lang.Double.valueOf(0.97), 1),
      ("cvss-only", null, 7.5, java.lang.Double.valueOf(0.01), 2),
      ("epss-only", null, 3.1, java.lang.Double.valueOf(0.31), 3),
      ("neither", null, 5.9, java.lang.Double.valueOf(0.19), 4),
      ("null-epss-high-cvss", null, 6.0, null.asInstanceOf[java.lang.Double], 2),
      ("boundary", null, 6.0, java.lang.Double.valueOf(0.2), 1)
    ).toDF("name", "kev", "cvss", "epss", "expected")
    val out = rows.withColumn("got",
      Prioritizer.priority(col("kev"), col("cvss"), col("epss")))
    val bad = out.filter(col("got") =!= col("expected")).collect()
    assert(bad.isEmpty, bad.mkString(", "))
  }

  test("F16/F17 coalesce ladder over real NVD metric shapes: v3.1 → v3.0 → v2") {
    val nvd = Readers.nvd(spark, res("nvd_page.json"))
    val scores = nvd.select(col("id"), Prioritizer.cvssBase(col("nvd")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores("CVE-2024-0001") == 9.8) // v3.1
    assert(scores("CVE-2022-0003") == 7.5) // v3.0 fallback
    assert(scores("CVE-2021-0002") == 5.0) // v2 fallback
  }

  test("missing metrics default to 0 (prioritizer_handler.py:31-36 defaults)") {
    import org.apache.spark.sql.types.{ArrayType, StructType}
    val cveType = graft.sources.Schemas.nvdPage("vulnerabilities").dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]("cve").dataType
      .asInstanceOf[StructType]
    val metricsType = cveType("metrics").dataType
    val nvd = Readers.nvd(spark, res("nvd_page.json"))
      .withColumn("nvd", col("nvd").withField("metrics", lit(null).cast(metricsType)))
    val s = nvd.select(Prioritizer.cvssBase(col("nvd")).as("s"))
      .agg(max("s")).head().getDouble(0)
    assert(s == 0.0)
  }

  test("empty metric arrays are safe under ANSI mode (get, not element_at)") {
    import org.apache.spark.sql.types.{ArrayType, StructType}
    val cveType = graft.sources.Schemas.nvdPage("vulnerabilities").dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]("cve").dataType
      .asInstanceOf[StructType]
    val metricsType = cveType("metrics").dataType.asInstanceOf[StructType]
    val v31Type = metricsType("cvssMetricV31").dataType
    val nvd = Readers.nvd(spark, res("nvd_page.json"))
      .withColumn("nvd", col("nvd").withField("metrics.cvssMetricV31",
        array().cast(v31Type)))
    // must not throw; falls through the ladder
    nvd.select(Prioritizer.cvssBase(col("nvd"))).collect()
  }
}
