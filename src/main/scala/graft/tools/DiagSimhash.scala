package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Diagnostic: band-bucket skew + candidate volume for the two SimHash
  * variants — run this when a simhash query's scaling ratio regresses
  * (it found the 40k-doc hot bucket behind q74's 24× sf1 blowup).
  * Usage: runMain graft.tools.DiagSimhash <sfDir> */
object DiagSimhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, dir, "documents")
    for ((label, hash) <- Seq(
        "xxhash64" -> ((c: org.apache.spark.sql.Column) => xxhash64(c)),
        "polyhash" -> Dedup.portableTokenHash _)) {
      val sim = Dedup.simhash(docs, tokHash = hash).localCheckpoint()
      val banded = sim.select(col("doc_id"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
                 shiftrightunsigned(col("simhash"), b * 16)
                   .bitwiseAND(lit(0xFFFFL)).as("bval"))): _*)).as("bs"))
        .select(col("bs.band").as("band"), col("bs.bval").as("bval"))
      val stats = banded.groupBy("band", "bval").agg(count(lit(1)).as("n"))
        .agg(max("n").as("max_bucket"),
             sum(col("n") * (col("n") - 1) / 2).as("cand_pairs"),
             count(lit(1)).as("buckets")).head()
      println(s"[diag] $label max_bucket=${stats.get(0)} cand_pairs=${stats.get(1)} buckets=${stats.get(2)}")
    }
    spark.stop()
  }
}
