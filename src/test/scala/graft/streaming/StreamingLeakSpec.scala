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
    // the index build itself must persist EXACTLY one frame — the capped
    // index (the uncapped gram intermediate is released inside the
    // builder; the true-count sidecar belongs to spanIndexState, not this
    // one-frame build). A second persisted RDD here IS a leak.
    assert((withIndex -- before).size == 1,
      s"index build must persist only the capped index: ${withIndex -- before}")
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

  test("span lifecycle stream: the persisted set is EXACTLY the two-generation envelope") {
    // the q257 foreachBatch body — verdict against the standing state,
    // fold the admitted docs, eager-new / release-old — instrumented at
    // the three envelope points: before the fold (one generation), after
    // eager-new before release-old (old ∪ new, nothing else), after the
    // release (the new generation alone). A stray per-batch persist, a
    // leaked uncapped intermediate, or a missed release fails by name.
    val sc = spark.sparkContext
    val baseline = sc.getPersistentRDDs.keySet.toSet
    val corpus = (1L to 40L)
      .map(i => (i, (0 until 20).map(j => s"w${(i * 7 + j) % 13}").mkString(" ")))
      .toDF("doc_id", "text")
    var state = Dedup.spanIndexState(corpus, "doc_id", "text",
      minSpanTokens = 3, maxBucketSize = 100)
    var genIds = sc.getPersistentRDDs.keySet.toSet -- baseline
    // the state build persists exactly the generation pair: index + counts
    assert(genIds.size == 2,
      s"state build must persist exactly (index, counts): $genIds")
    val dir = java.nio.file.Files.createTempDirectory("graft-leak-cycle").toString
    dropFiles(dir, (101L to 104L)
      .map(i => (i, (0 until 20).map(j => s"w${(i + j) % 13}").mkString(" "))))
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val perBatch = streamOver(dir, corpus.schema) { batch =>
      val cur = state
      val beforeFold = sc.getPersistentRDDs.keySet.toSet
      if (beforeFold != baseline ++ genIds)
        failures += s"entered batch with off-envelope persists: ${beforeFold -- baseline -- genIds}"
      val verdicts = graft.streaming.DocStream
        .spanAdmissionVerdicts(batch, cur.index, maxCoveredPct = 50)
      val admitted = batch.join(
        verdicts.where(col("admitted")).select("doc_id"), Seq("doc_id"), "left_semi")
      val next = Dedup.refreshSpanIndex(cur, admitted, "doc_id", "text")
      val folded = Dedup.SpanIndexState(
        graft.core.Caching.eager(next.index),
        graft.core.Caching.eager(next.counts))
      val during = sc.getPersistentRDDs.keySet.toSet
      val newGen = during -- beforeFold
      // during the swap: old ∪ new and NOTHING else — the verdict probe
      // and the fold's delta grams must not persist anything of their own
      if (newGen.size != 2)
        failures += s"fold must add exactly (index, counts), added: $newGen"
      if (during != baseline ++ genIds ++ newGen)
        failures += s"swap persisted beyond the two-generation envelope: ${during -- baseline -- genIds -- newGen}"
      cur.index.unpersist(); cur.counts.unpersist()
      val after = sc.getPersistentRDDs.keySet.toSet
      if (after != baseline ++ newGen)
        failures += s"release left old-generation persists: ${after -- baseline -- newGen}"
      genIds = newGen
      state = folded
      ()
    }
    assert(perBatch.size >= 3, s"expected 3+ micro-batches, got ${perBatch.size}")
    assert(failures.isEmpty, failures.mkString("\n"))
    state.index.unpersist(); state.counts.unpersist()
    assert(sc.getPersistentRDDs.keySet.toSet == baseline)
  }

  test("image admission stream: one decode pass per batch, per-batch persist released") {
    // the q262 foreachBatch body — per-batch hash frame persisted ONCE for
    // its two consumers (index probe + verdict join) and released before
    // the batch returns. Pins BOTH halves of the r17 double-decode fix:
    // (a) decode count per micro-batch == image rows in the batch (each
    // blob decoded exactly once — an uncached hash frame feeding two
    // consumers would decode every blob twice), and (b) the persisted-RDD
    // set returns to exactly {standing index} after every batch (the
    // per-batch persist is a WINDOW, not a leak).
    import graft.multimodal.Multimodal
    val sc = spark.sparkContext
    def media(id: Long, content: Array[Byte]) =
      org.apache.spark.sql.Row(id, "image", content, "image/png", s"synthetic://leak/$id")
    def png(seed: Int): Array[Byte] =
      Multimodal.encodePng(18, 16, (x, y) => {
        val g = 15 + 25 * (((x / 2) + 9 * (y / 2) + seed) % 8)
        (g, g, g)
      })
    val corpusRows = (1L to 6L).map(i => media(i, png(i.toInt)))
    val corpus = spark.createDataFrame(
      sc.parallelize(corpusRows, 2), Multimodal.mediaSchema)
    val index = graft.core.Caching.eager(
      Dedup.fingerprintCorpusIndex(Multimodal.imageDHashes(corpus),
        "media_id", "dhash", maxBucketSize = 200))
    val withIndex = sc.getPersistentRDDs.keySet.toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-leak-img").toString
    val sink = java.nio.file.Files.createTempDirectory("graft-leak-img-sink").toString
    // 3 drops × (one decodable duplicate-of-corpus + one garbage blob)
    (0 until 3).foreach { i =>
      val rows = Seq(
        media(100L + i, png(i + 1)),
        media(200L + i, s"not an image $i".getBytes("UTF-8")))
      val staging = java.nio.file.Files
        .createTempDirectory("graft-leak-img-stage").resolve("out").toString
      spark.createDataFrame(sc.parallelize(rows, 1), Multimodal.mediaSchema)
        .coalesce(1).write.parquet(staging)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(staging))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part,
        java.nio.file.Paths.get(s"$dir/media-$i.parquet"))
    }
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    var batches = 0
    val stream = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = stream.writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-leak-img-ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val rows = batch.count()
        val decodes0 = Multimodal.imageDecodeAttempts.get()
        val hashes = Multimodal.imageDHashes(batch.toDF())
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          hashes.count()
          val dups = Dedup
            .fingerprintsAgainstIndex(index, hashes, "media_id", "dhash", maxHamming = 8)
            .select(col("delta_id").as("media_id")).distinct()
            .withColumn("_dup", lit(true))
          val during = sc.getPersistentRDDs.keySet.toSet
          if ((during -- withIndex).size != 1)
            failures += s"batch $batchId: expected exactly the hash-frame persist, got +${during -- withIndex}"
          hashes.join(dups, Seq("media_id"), "left")
            .select(col("media_id"), col("dhash").isNotNull.as("decodable"),
              when(col("dhash").isNull, lit(null).cast("boolean"))
                .otherwise(coalesce(col("_dup"), lit(false))).as("is_duplicate"))
            .write.mode("overwrite").parquet(s"$sink/batch=$batchId")
        } finally hashes.unpersist()
        val decodes = Multimodal.imageDecodeAttempts.get() - decodes0
        if (decodes != rows)
          failures += s"batch $batchId: $rows blobs but $decodes decode attempts (must be exactly one per blob)"
        val after = sc.getPersistentRDDs.keySet.toSet
        if (after != withIndex)
          failures += s"batch $batchId left persists beyond the standing index: +${after -- withIndex} -${withIndex -- after}"
        batches += 1
        ()
      }
      .start()
    q.processAllAvailable(); q.stop()
    assert(batches >= 3, s"expected 3+ micro-batches, got $batches")
    assert(failures.isEmpty, failures.mkString("\n"))
    val verdicts = spark.read.parquet(sink).drop("batch")
    val byId = verdicts.collect().map(r => r.getLong(0) ->
      (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getBoolean(2)))).toMap
    (0 until 3).foreach { i =>
      assert(byId(100L + i) == ((true, Some(true))), s"dup verdict for ${100 + i}: ${byId(100L + i)}")
      assert(byId(200L + i) == ((false, None)), s"garbage verdict for ${200 + i}: ${byId(200L + i)}")
    }
    index.unpersist()
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
