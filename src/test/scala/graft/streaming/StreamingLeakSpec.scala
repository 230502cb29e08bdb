package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The per-batch rebuild/persist leak gate (the q249 round-15 defect
  * class): a long-running stream must probe standing indexes built ONCE
  * outside the stream — no foreachBatch body may persist new frames or
  * rebuild corpus-sized state per trigger. Pinned by watching
  * `sparkContext.getPersistentRDDs` across 3+ micro-batches: the
  * persisted-RDD id set after every batch must equal the set right after
  * the standing index was built.
  */
class StreamingLeakSpec extends SparkSpec {
  import spark.implicits._

  private def dropFiles(dir: String, docs: Seq[(Long, String)]): Unit =
    docs.zipWithIndex.foreach { case ((id, text), i) =>
      val staging = java.nio.file.Files
        .createTempDirectory("graft-leak-stage").resolve("out").toString
      Seq((id, text)).toDF("doc_id", "text").coalesce(1).write.parquet(staging)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(staging))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part,
        java.nio.file.Paths.get(s"$dir/docs-$i.parquet"))
    }

  private def streamOver(dir: String, schema: org.apache.spark.sql.types.StructType)(
      body: org.apache.spark.sql.DataFrame => Unit): Seq[Set[Int]] = {
    val observed = scala.collection.mutable.ArrayBuffer.empty[Set[Int]]
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = stream.writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-leak-ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        body(batch.toDF())
        observed.synchronized {
          observed += spark.sparkContext.getPersistentRDDs.keySet.toSet
        }
        ()
      }
      .start()
    q.processAllAvailable(); q.stop()
    observed.toSeq
  }

  test("span-probe stream: the persisted-RDD set does not grow across micro-batches") {
    val corpus = (1L to 40L)
      .map(i => (i, (0 until 20).map(j => s"w${(i * 7 + j) % 13}").mkString(" ")))
      .toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val idx = Dedup.spanGramIndex(corpus, "doc_id", "text",
      minSpanTokens = 3, maxBucketSize = 100)
    val withIndex = spark.sparkContext.getPersistentRDDs.keySet.toSet
    // the index build itself must persist ONLY the index (the uncapped
    // intermediate is released inside the builder)
    assert((withIndex -- before).size <= 2,
      s"index build leaked intermediates: ${withIndex -- before}")
    val dir = java.nio.file.Files.createTempDirectory("graft-leak-span").toString
    dropFiles(dir, (101L to 104L)
      .map(i => (i, (0 until 20).map(j => s"w${(i + j) % 13}").mkString(" "))))
    val schema = corpus.schema
    val perBatch = streamOver(dir, schema) { batch =>
      Dedup.sharedSpansIncrementalFromIndex(idx, batch, "doc_id", "text").count()
      ()
    }
    assert(perBatch.size >= 3, s"expected 3+ micro-batches, got ${perBatch.size}")
    perBatch.zipWithIndex.foreach { case (s, i) =>
      assert(s == withIndex,
        s"micro-batch $i changed the persisted-RDD set: +${s -- withIndex} -${withIndex -- s}")
    }
    idx.unpersist()
  }

  test("near-dup admission stream: probing the standing minhash index persists nothing per batch") {
    val corpus = (1L to 30L)
      .map(i => (i, (0 until 15).map(j => s"c${(i * 3 + j) % 11}").mkString(" ")))
      .toDF("doc_id", "text")
    // cached once outside the stream — the q121 call-site pattern
    val idx = graft.core.Caching.eager(
      DocStream.minhashCorpusIndex(corpus, "doc_id", "text",
        numHashes = 8, numBands = 4, shingleN = 1))
    val withIndex = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-leak-admit").toString
    dropFiles(dir, (201L to 203L)
      .map(i => (i, (0 until 15).map(j => s"c${(i + j) % 11}").mkString(" "))))
    val perBatch = streamOver(dir, corpus.schema) { batch =>
      DocStream.admitNearDups(batch, idx).count()
      ()
    }
    assert(perBatch.size >= 3)
    perBatch.zipWithIndex.foreach { case (s, i) =>
      assert(s == withIndex,
        s"micro-batch $i changed the persisted-RDD set: +${s -- withIndex} -${withIndex -- s}")
    }
  }

  test("sharedSpansIncrementalFromIndex equals the one-shot sharedSpansIncremental") {
    val corpus = (1L to 25L)
      .map(i => (i, (0 until 24).map(j => s"t${(i * 5 + j) % 17}").mkString(" ")))
      .toDF("doc_id", "text")
    val delta = (301L to 306L)
      .map(i => (i, (0 until 24).map(j => s"t${(i + j) % 17}").mkString(" ")))
      .toDF("doc_id", "text")
    val idx = Dedup.spanGramIndex(corpus, "doc_id", "text",
      minSpanTokens = 4, maxBucketSize = 60)
    val fromIdx = Dedup.sharedSpansIncrementalFromIndex(idx, delta, "doc_id", "text")
      .orderBy("delta_id", "corpus_id", "delta_pos", "corpus_pos").collect().toSeq
    val oneShot = Dedup.sharedSpansIncremental(corpus, delta, "doc_id", "text",
        minSpanTokens = 4, maxBucketSize = 60)
      .orderBy("delta_id", "corpus_id", "delta_pos", "corpus_pos").collect().toSeq
    assert(fromIdx.nonEmpty, "fixture must produce spans (vacuous otherwise)")
    assert(fromIdx == oneShot)
    idx.unpersist()
  }

  test("sharedSpansIncrementalFromIndex rejects an index missing the gram-length metadata") {
    val bogus = Seq((1L, 1L, 42L)).toDF("doc_id", "pos", "h")
    val delta = Seq((2L, "a b c d")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.sharedSpansIncrementalFromIndex(bogus, delta, "doc_id", "text")
    }
    assert(e.getMessage.contains("spanGramIndex"))
  }
}
