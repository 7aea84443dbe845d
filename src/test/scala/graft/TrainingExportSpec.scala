package graft

import org.apache.spark.sql.functions._
import graft.operators.TrainingExport

class TrainingExportSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("deterministic sharded JSONL export with verifiable manifest") {
    val docs = Tables.load(spark, dir, "documents")
    val n = docs.count()
    val work = java.nio.file.Files.createTempDirectory("texport").toString

    val m1 = TrainingExport.exportJsonl(docs, s"$work/a", numShards = 4)
    val m2 = TrainingExport.exportJsonl(docs, s"$work/b", numShards = 4)
    // reproducible shuffle: same input → identical manifests
    assert(m1 == m2)
    // every doc exported exactly once, all shards populated
    assert(m1.map(_._2).sum == n)
    assert(m1.size == 4 && m1.forall(_._2 > 0))

    // downstream verification re-derives the same manifest from the files
    assert(TrainingExport.verify(spark, s"$work/a") == m1)

    // exactly one data file per shard (co-located by the repartition)
    (0 until 4).foreach { s =>
      val files = new java.io.File(s"$work/a/shard=$s")
        .listFiles().filter(_.getName.endsWith(".txt"))
      assert(files.length == 1, s"shard $s has ${files.length} files")
    }

    // the shards are valid JSONL: re-read and compare content
    val back = spark.read.json(s"$work/a/shard=*")
    assert(back.count() == n)
    assert(back.select("doc_id").as[Long].collect().toSet ==
           docs.select("doc_id").as[Long].collect().toSet)

    // byte-identical re-export (same order within shards)
    val bytesOf = (p: String) => {
      val f = new java.io.File(p).listFiles().filter(_.getName.endsWith(".txt")).head
      java.nio.file.Files.readAllBytes(f.toPath).toSeq
    }
    (0 until 4).foreach { s =>
      assert(bytesOf(s"$work/a/shard=$s") == bytesOf(s"$work/b/shard=$s"),
             s"shard $s bytes differ")
    }
  }
}
