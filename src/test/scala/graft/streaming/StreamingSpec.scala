package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("readEvents starts on an EMPTY drop directory (nothing to probe yet)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-empty").toString
    val stream = EventStream.readEvents(spark, dir)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType == org.apache.spark.sql.types.TimestampType,
      "the no-files fallback must assume the current microsecond encoding")
  }

  test("windowed streaming counts match the batch equivalent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    // stage the sf0.001 events parquet as a file-stream drop
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf0001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events-0.parquet"))

    val stream = EventStream.windowedCounts(
      EventStream.readEvents(spark, dir), "1 hour", "2 hours")
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("hourly")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish within the timeout")

    val streamed = spark.table("hourly")
    // append mode only emits windows the watermark has passed; every emitted
    // window must agree with the batch aggregation
    val batch = graft.core.Tables(spark, Sf0001).events
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val joined = streamed.alias("s").join(
      batch.alias("b"),
      Seq("window_start", "event_type"))
    val mismatches = joined.where(col("s.n_events") =!= col("b.n_events")).count()
    assert(mismatches == 0, "streamed windows must match batch counts")
    assert(streamed.count() > 0, "watermark should have released some windows")
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    // stage the same file twice under different names → every event_id twice
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf0001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf0001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/b.parquet"))
    val q = EventStream
      .dedupStream(EventStream.readEvents(spark, dir), Seq("event_id"), "10 minutes")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("deduped")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish within the timeout")
    val out = spark.table("deduped")
    assert(out.count() == 1000, s"2000 staged events dedup to 1000, got ${out.count()}")
    assert(out.select("event_id").distinct().count() == 1000)
  }

  test("stateful sessionization closes sessions on the 30-minute gap") {
    val events = Seq(
      EventStream.Event(1, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0),
      EventStream.Event(2, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 1L, "view", 1.0),
      // 40-minute gap → session break
      EventStream.Event(3, java.sql.Timestamp.valueOf("2024-01-01 10:50:00"), 1L, "click", 1.0),
      EventStream.Event(4, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 2L, "view", 1.0)
    ).toDS()
    val closed = EventStream.sessionize(events).collect()
    // only user 1's first session closes within this batch
    assert(closed.length == 1)
    assert(closed.head.user_id == 1L && closed.head.n_events == 2)
    assert(closed.head.duration_sec == 600.0)
  }

  test("streaming document curation equals the batch gate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-docstream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf0001/documents.parquet"),
      java.nio.file.Paths.get(s"$dir/docs-0.parquet"))
    val q = DocStream.curate(DocStream.readDocs(spark, dir))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("curated")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish within the timeout")
    val streamed = spark.table("curated")
    val batch = DocStream.curate(graft.core.Tables(spark, Sf0001).documents)
    assert(streamed.count() > 0, "the gate should pass some documents")
    assert(streamed.count() < graft.core.Tables(spark, Sf0001).documents.count(),
      "the gate should reject some documents")
    assert(streamed.except(batch).count() == 0 && batch.except(streamed).count() == 0,
      "stream and batch curation must produce identical rows")
  }

  test("streaming curation funnel counts match the batch funnel and the gate output") {
    val dir = java.nio.file.Files.createTempDirectory("graft-docfunnel").toString
    // seed the corpus with a doc KNOWN to fail the repetition gate, so the
    // strict-attrition assertion below is a property of the constructed
    // input, not of whatever dirt the generated sf0.001 corpus happens to
    // carry — regenerated clean testdata cannot fail this test spuriously
    val planted = Seq(
      (900001L, ("spam " * 400).trim, "en", "seeded", 2000L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val docs = graft.core.Tables(spark, Sf0001).documents.unionByName(planted)
    // stage as ONE flat parquet file (the stream source lists plain files,
    // not nested write directories)
    val staging = java.nio.file.Files.createTempDirectory("graft-docfunnel-stage").toString
    docs.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(s"$dir/docs-0.parquet"))
    val q = DocStream.curateFunnel(DocStream.readDocs(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("docfunnel")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish within the timeout")
    val streamed = spark.table("docfunnel").collect()
    assert(streamed.length == 1, "complete mode emits one funnel row")
    val batch = DocStream.curateFunnel(docs).collect().head
    val s = streamed.head
    assert(s.getLong(0) == batch.getLong(0) && s.getLong(1) == batch.getLong(1) &&
      s.getLong(2) == batch.getLong(2), "stream and batch funnels must agree")
    // the funnel's terminal count IS the gate's cardinality
    assert(s.getLong(0) == docs.count())
    assert(s.getLong(2) == DocStream.curate(docs).count())
    // monotone stage counts, plus strict end-to-end attrition guaranteed by
    // the planted repetition-gate failure
    assert(s.getLong(0) >= s.getLong(1) && s.getLong(1) >= s.getLong(2))
    assert(s.getLong(2) > 0 && s.getLong(2) < s.getLong(0))
  }

  test("streaming corpus report count statistics equal the batch report") {
    val dir = java.nio.file.Files.createTempDirectory("graft-docreport").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf0001/documents.parquet"),
      java.nio.file.Paths.get(s"$dir/docs-0.parquet"))
    val q = DocStream.corpusReportStream(DocStream.readDocs(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("docreport")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish within the timeout")
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val streamed = keyed(spark.table("docreport")
      .select("source", "n_docs", "total_tokens", "n_quality_pass", "n_empty").collect())
    val batch = keyed(graft.operators.Curation
      .corpusReport(graft.core.Tables(spark, Sf0001).documents, "doc_id", "text", "source")
      .select("source", "n_docs", "total_tokens", "n_quality_pass", "n_empty").collect())
    assert(streamed == batch, "stream and batch per-source count statistics must agree")
    assert(streamed.nonEmpty)
  }

  test("streaming token-budget admission equals the batch operator in one micro-batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-docbudget").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf0001/documents.parquet"),
      java.nio.file.Paths.get(s"$dir/docs-0.parquet"))
    val q = DocStream.tokenBudgetAdmission(DocStream.readDocs(spark, dir), budget = 500L)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("docbudget")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish within the timeout")
    val streamed = spark.table("docbudget")
      .select("doc_id", "source", "n_tokens", "cum_tokens")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val batch = graft.operators.Curation
      .tokenBudgetSample(
        graft.core.Tables(spark, Sf0001).documents, "doc_id", "text", "source", budget = 500L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch, "single-batch admission must equal the batch budget sample")
    assert(streamed.nonEmpty)
  }

  test("streaming token-budget admission carries state across micro-batches") {
    import spark.implicits._
    // one 600-token doc against a 500-token budget: whoever is processed
    // first is admitted (starts at 0), the second arrival must be rejected
    // because the state already carries 600 tokens — regardless of whether
    // the two files land in one micro-batch or two
    val text = (1 to 600).map(i => s"t$i").mkString(" ")
    val staging = java.nio.file.Files.createTempDirectory("graft-budget-stage").toString
    Seq((1L, text, "en", "s0", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$staging/one")
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(s"$staging/one"))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    val dir = java.nio.file.Files.createTempDirectory("graft-budget-stream").toString
    java.nio.file.Files.copy(part, java.nio.file.Paths.get(s"$dir/docs-0.parquet"))
    java.nio.file.Files.copy(part, java.nio.file.Paths.get(s"$dir/docs-1.parquet"))
    val stream = spark.readStream.schema(DocStream.docSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = DocStream.tokenBudgetAdmission(stream, budget = 500L)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("docbudget2")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish within the timeout")
    val rows = spark.table("docbudget2").collect()
    assert(rows.length == 1, s"second arrival must be rejected by carried state: ${rows.toSeq}")
    assert(rows.head.getAs[Long]("cum_tokens") == 600L)
  }

  test("streaming corpus dedup equals the batch incremental dedup") {
    val dir = java.nio.file.Files.createTempDirectory("graft-docdedup").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf0001/documents.parquet"),
      java.nio.file.Paths.get(s"$dir/docs-0.parquet"))
    val all = graft.core.Tables(spark, Sf0001).documents
    val corpus = all.where(col("doc_id") % 2 === 0)
    val q = DocStream
      .dedupAgainstCorpus(DocStream.readDocs(spark, dir), DocStream.corpusIndex(corpus))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("docdedup")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish within the timeout")
    val streamed = spark.table("docdedup").select("doc_id").as[Long].collect().toSet
    val batch = graft.operators.Dedup.exactIncrement(corpus, all, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch, "stream and batch incremental dedup must agree")
    assert(streamed.nonEmpty && streamed.size < all.count(),
      "the corpus index should drop some stream documents")
  }

  test("streaming near-dup admission equals the batch incremental minhash complement") {
    val dir = java.nio.file.Files.createTempDirectory("graft-neardup").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-neardup-ckpt").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf0001/documents.parquet"),
      java.nio.file.Paths.get(s"$dir/docs-0.parquet"))
    val all = graft.core.Tables(spark, Sf0001).documents
    val corpus = all.where(col("doc_id") % 2 === 0)
    val index = DocStream.minhashCorpusIndex(
      corpus, "doc_id", "text", numHashes = 16, numBands = 8, shingleN = 1)
    val admitted = scala.collection.mutable.Set.empty[Long]
    val q = DocStream.nearDupAdmission(
      DocStream.readDocs(spark, dir), index, ckpt, minJaccard = 0.5) { (kept, _) =>
      admitted ++= kept.select("doc_id").as[Long].collect()
    }
    q.processAllAvailable(); q.stop()
    val dupIds = graft.operators.Dedup
      .minhashIncrementalDuplicates(corpus, all, "doc_id", "text",
        numHashes = 16, numBands = 8, shingleN = 1, minJaccard = 0.5)
      .select(col("delta_id")).as[Long].collect().toSet
    val batchSurvivors = all.select("doc_id").as[Long].collect().toSet -- dupIds
    assert(admitted.toSet == batchSurvivors,
      "stream admission and the batch incremental complement must agree")
    assert(admitted.nonEmpty && admitted.size < all.count(),
      "the near-dup index should drop some stream documents")
  }

  test("nearDupAdmission rejects an index without LSH metadata") {
    val bogus = graft.core.Tables(spark, Sf0001).documents
      .select(lit(0).as("band"), lit("x").as("band_hash"),
        col("doc_id").as("corpus_id"), array(col("text")).as("c_set"))
    val err = intercept[IllegalArgumentException] {
      DocStream.nearDupAdmission(
        DocStream.readDocs(spark, java.nio.file.Files.createTempDirectory("graft-nd").toString),
        bogus, java.nio.file.Files.createTempDirectory("graft-nd-ckpt").toString)((_, _) => ())
    }
    assert(err.getMessage.contains("minhashCorpusIndex"))
  }

  test("quantized admission: planted near-dup rejected, orthogonal admitted; codes payload only") {
    import spark.implicits._
    // corpus along +x; calibration over the corpus slice; an arriving copy
    // of the corpus vector maxes the integer dot, an anti-correlated
    // arrival bottoms it — the threshold separates them
    val dim = 8
    val corpus = Seq(
      (2L, Array.tabulate(dim)(i => 1.0f + i)),
      (4L, Array.tabulate(dim)(i => 1.1f + i))
    ).toDF("vec_id", "embedding")
    val arriving = Seq(
      (11L, Array.tabulate(dim)(i => 1.0f + i)),        // copy of 2 -> reject
      (13L, Array.tabulate(dim)(i => -(1.0f + i)))      // opposite -> admit
    ).toDF("vec_id", "embedding")
    val params = graft.operators.Quantize.collectParams(corpus, "embedding")
    val index = DocStream.quantizedCorpusIndex(corpus, "vec_id", "embedding",
      params, nPlanes = 8, maxBucketSize = 200)
    assert(index.columns.toSeq == Seq("_sig", "_c_id", "_c_codes"),
      "probe-side payload is codes, never the float vectors")
    val admitted = DocStream.dedupQuantizedAgainstCorpus(
      arriving, index, "vec_id", "embedding", params, minQDot = 1000L)
      .select("vec_id").as[Long].collect().toSet
    assert(admitted == Set(13L),
      s"copy must be rejected by the integer-dot gate, opposite admitted; got $admitted")
    // index built under DIFFERENT metadata params must be rejected loudly
    val bogus = index.select(col("_sig").cast("long").as("_sig"),
      col("_c_id"), col("_c_codes"))
    val err = intercept[IllegalArgumentException] {
      DocStream.dedupQuantizedAgainstCorpus(
        arriving, bogus, "vec_id", "embedding", params, minQDot = 1000L)
    }
    assert(err.getMessage.contains("quantizedCorpusIndex"))
  }

  test("streaming embedding dedup equals the batch incremental near-dup complement") {
    val dir = java.nio.file.Files.createTempDirectory("graft-embdedup").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf0001/embeddings.parquet"),
      java.nio.file.Paths.get(s"$dir/emb-0.parquet"))
    val all = graft.core.Tables(spark, Sf0001).embeddings
    val corpus = all.where(col("vec_id") % 2 === 0)
    val embSchema = all.schema
    val index = DocStream.embeddingCorpusIndex(corpus, "vec_id", "embedding",
      nPlanes = 8, maxBucketSize = 200)
    val q = DocStream
      .dedupEmbeddingsAgainstCorpus(
        spark.readStream.schema(embSchema).parquet(dir),
        index, "vec_id", "embedding", minCosine = 0.25)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("embdedup")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish within the timeout")
    val streamed = spark.table("embdedup").select("vec_id").as[Long].collect().toSet
    // batch ground truth: survivors = all minus vectors with a corpus
    // near-dup in the same bucket (corpus vectors match themselves)
    val dupIds = graft.operators.Dedup.embeddingIncrementalDuplicates(
      corpus, all, "vec_id", "embedding", minCosine = 0.25, nPlanes = 8)
      .select(col("delta_id")).as[Long].collect().toSet
    val batch = all.select("vec_id").as[Long].collect().toSet -- dupIds
    assert(streamed == batch, "stream and batch embedding dedup must agree")
    assert(streamed.nonEmpty && streamed.size < all.count(),
      "corpus self-matches must be dropped by the stream gate")
  }

  test("embedding corpus index: nPlanes metadata survives a parquet round-trip") {
    val emb = graft.core.Tables(spark, Sf0001).embeddings
    // deterministic split: an unordered limit() re-evaluates differently per
    // action; and the probe set must be DISJOINT from the corpus — a
    // self-probe matches itself at cosine 1.0 and always yields an empty
    // survivor set, making the stored==built assertion vacuous
    val corpus = emb.where(col("vec_id") < 250)
    val probe = emb.where(col("vec_id") >= 250)
    val built = DocStream.embeddingCorpusIndex(corpus, "vec_id", "embedding", nPlanes = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-embidx").toString + "/idx"
    built.write.parquet(dir)
    val reread = spark.read.parquet(dir)
    val meta = reread.schema("_sig").metadata
    assert(meta.contains(DocStream.NPlanesMetaKey),
      "the production contract stores the index as a table; metadata must survive")
    assert(meta.getLong(DocStream.NPlanesMetaKey) == 8L)
    // the re-read index drives dedup identically to the in-memory one, on a
    // probe where some rows survive and some are dropped
    val viaStored = DocStream
      .dedupEmbeddingsAgainstCorpus(probe, reread, "vec_id", "embedding", minCosine = 0.25)
      .select("vec_id").as[Long].collect().toSet
    val viaBuilt = DocStream
      .dedupEmbeddingsAgainstCorpus(probe, built, "vec_id", "embedding", minCosine = 0.25)
      .select("vec_id").as[Long].collect().toSet
    assert(viaStored == viaBuilt)
    val probeCount = probe.count()
    assert(viaStored.size < probeCount, "some probe rows must be dropped as near-dups")
    assert(viaStored.nonEmpty, "some probe rows must survive")
  }

  test("embedding dedup against an EMPTY index keeps every row (late-filled index)") {
    val corpus = graft.core.Tables(spark, Sf0001).embeddings.limit(20)
    val emptyIndex = DocStream.embeddingCorpusIndex(
      corpus.where(col("vec_id") < 0), "vec_id", "embedding", nPlanes = 8)
    val out = DocStream
      .dedupEmbeddingsAgainstCorpus(corpus, emptyIndex, "vec_id", "embedding")
    assert(out.count() == 20, "an unpopulated index must pass everything through")
    intercept[IllegalArgumentException] {
      // a frame that did not come from embeddingCorpusIndex fails fast
      DocStream.dedupEmbeddingsAgainstCorpus(
        corpus, corpus.withColumnRenamed("vec_id", "_sig"), "vec_id", "embedding")
    }
  }

  test("multimodal feature extraction preserves ids and drops blobs") {
    val docs = graft.core.Tables(spark, Sf0001).documents
    val media = graft.multimodal.Multimodal.mediaFromDocuments(docs)
    val feats = graft.multimodal.Multimodal.extractFeatures(media)
    assert(feats.count() == docs.count())
    assert(!feats.columns.contains("content"), "blob column must not survive")
    assert(feats.where(col("content_sha256").isNull).count() == 0)
    val img = feats.where(col("media_type") === "image")
    assert(img.where(col("width").isNull).count() == 0, "images get dimensions")
    assert(feats.where(col("media_type") =!= "image")
      .where(col("width").isNotNull).count() == 0, "non-images do not")
    val vecLens = feats.select(size(col("feature_vec"))).distinct().as[Int].collect()
    assert(vecLens.sameElements(Array(8)), "fixed-width feature vectors")
  }

  test("multimodal resize touches only images and is deterministic") {
    val docs = graft.core.Tables(spark, Sf0001).documents
    val media = graft.multimodal.Multimodal.mediaFromDocuments(docs)
    val resized = graft.multimodal.Multimodal.resizeImages(media, 224, 224)
    assert(resized.count() == media.count(), "resize is 1:1")
    val img = resized.where(col("media_type") === "image")
    assert(img.where(!col("source_uri").endsWith("?resized=224x224")).count() == 0)
    // stub output = sha256 digest (32 bytes) + "224x224" (7 bytes)
    assert(img.where(length(col("content")) =!= 39).count() == 0)
    val others = resized.where(col("media_type") =!= "image")
    val origOthers = media.where(col("media_type") =!= "image")
    assert(others.select("media_id", "source_uri").except(
      origOthers.select("media_id", "source_uri")).count() == 0,
      "non-images pass through untouched")
    val a = resized.where(col("media_type") === "image")
      .select(col("media_id"), sha2(col("content"), 256).as("h"))
    val b = graft.multimodal.Multimodal.resizeImages(media, 224, 224)
      .where(col("media_type") === "image")
      .select(col("media_id"), sha2(col("content"), 256).as("h"))
    assert(a.except(b).count() == 0, "resize output is deterministic")
  }

  test("multimodal frame sampling fans out video blobs deterministically") {
    val docs = graft.core.Tables(spark, Sf0001).documents
    val media = graft.multimodal.Multimodal.mediaFromDocuments(docs)
    val frames = graft.multimodal.Multimodal.sampleFrames(media, maxFrames = 7)
    val nVideos = media.where(col("media_type") === "video").count()
    val perMedia = frames.groupBy("media_id").count()
    assert(perMedia.count() == nVideos, "every video emits at least one frame")
    assert(frames.where(col("frame_index") >= 7).count() == 0, "fan-out is capped")
    // frame count = 1 + byte_length % maxFrames, checked against the source
    val expected = media.where(col("media_type") === "video")
      .select(col("media_id"), (lit(1) + length(col("content")) % 7).cast("long").as("n"))
    assert(perMedia.withColumnRenamed("count", "n").except(expected).count() == 0)
  }

  test("streaming frequent-grams sketch + recount equals the batch answer across micro-batches") {
    import spark.implicits._
    // tight capacity (k=5) on a 5-token-vocab corpus: compaction and the
    // cross-trigger state merge both genuinely run
    // every even doc is the same boilerplate → "hot hot" holds ~half of all
    // bigram instances (far above the 1/5 threshold); odd docs spread a
    // ~46-type tail that overflows the 2k-entry summary
    val docs = (0 until 120).map { i =>
      val t =
        if (i % 2 == 0) "hot hot hot hot hot"
        else s"a${i % 5} b${i % 3} a${i % 5} c${i % 2} b${i % 3}"
      (i.toLong, t, "en", s"s${i % 4}", t.length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-freqgram").toString + "/drops"
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(6).write.parquet(dir)
    val stream = spark.readStream.schema(DocStream.docSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = DocStream.frequentGramsMonitor(stream, "text", n = 2, k = 5)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("freqgrams")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish within the timeout")
    assert(q.lastProgress.batchId >= 2, "test must exercise multiple micro-batches")
    val batchDf = docs.toDF("doc_id", "text", "lang", "source", "n_chars")
    val viaStream = graft.operators.Curation
      .heavyGramRecount(batchDf, "text", n = 2, k = 5, spark.table("freqgrams"))
      .as[(String, Long)].collect().toSet
    val viaBatch = graft.operators.Curation
      .frequentNgrams(batchDf, "text", n = 2, k = 5)
      .as[(String, Long)].collect().toSet
    assert(viaStream.nonEmpty, "threshold must be non-vacuous for this corpus")
    assert(viaStream == viaBatch)
  }

  test("minhash index refresh equals a from-scratch rebuild (tombstoned buckets stay dead)") {
    // cap = 3; three bucket fates under refresh:
    //  - "x": 4 corpus copies → over-cap on day 0 (tombstoned), an admitted
    //    copy must NOT resurrect it (union count 5 > 3)
    //  - "y z": 2 corpus + 1 admitted = 3 ≤ cap → grows in place
    //  - "w": 3 corpus (kept day 0) + 1 admitted = 4 > cap → refresh must
    //    drop the previously-live bucket, old rows included
    def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")
    val corpus = docs(
      1L -> "x", 2L -> "x", 3L -> "x", 4L -> "x",
      5L -> "y z", 6L -> "y z",
      7L -> "w", 8L -> "w", 9L -> "w")
    val admitted = docs(11L -> "x", 12L -> "y z", 13L -> "w")
    def state(df: org.apache.spark.sql.DataFrame) =
      DocStream.minhashIndexState(df, "doc_id", "text",
        numHashes = 16, numBands = 4, shingleN = 1, maxBucketSize = 3)
    def rows(idx: org.apache.spark.sql.DataFrame) = idx
      .select(col("band"), col("band_hash"), col("corpus_id"))
      .as[(Int, String, Long)].collect().toSet
    def counts(c: org.apache.spark.sql.DataFrame) = c
      .select(col("band"), col("band_hash"), col("n"))
      .as[(Int, String, Long)].collect().toSet

    val refreshed = DocStream.refreshMinhashIndex(state(corpus), admitted, "doc_id", "text")
    val rebuilt = state(corpus.unionByName(admitted))
    assert(rows(refreshed.index) == rows(rebuilt.index),
      "refresh must be row-identical to the from-scratch rebuild")
    assert(counts(refreshed.bucketCounts) == counts(rebuilt.bucketCounts),
      "the counts sidecar must track TRUE sizes, tombstoned buckets included")
    assert(!rows(refreshed.index).exists(_._3 == 11L),
      "an admitted doc landing in a tombstoned bucket must not resurrect it")
    assert(rows(refreshed.index).exists(_._3 == 12L) &&
      rows(refreshed.index).exists(_._3 == 5L),
      "a within-cap bucket keeps old rows and gains the admitted row")
    assert(!rows(refreshed.index).exists(r => Set(7L, 8L, 9L, 13L)(r._3)),
      "a bucket pushed over the cap by the refresh loses ALL its rows")

    // metadata survives the refresh, so a second day folds cleanly — and
    // stays rebuild-equivalent
    val admitted2 = docs(21L -> "y z", 22L -> "v")
    val again = DocStream.refreshMinhashIndex(refreshed, admitted2, "doc_id", "text")
    val rebuilt2 = state(corpus.unionByName(admitted).unionByName(admitted2))
    assert(rows(again.index) == rows(rebuilt2.index))
    assert(counts(again.bucketCounts) == counts(rebuilt2.bucketCounts))
  }

  test("minhash index refresh equals rebuild (fuzz: 6 seeded corpora, two folds each)") {
    // small vocab forces shared shingles → real bucket collisions; cap 3
    // guarantees tombstoned, growing, and refresh-killed buckets all occur
    val vocab = Vector("a", "b", "c", "d", "e")
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      def text() = Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val all = (1L to 60L).map(i => (i, text()))
      val Seq(corpus, adm1, adm2) =
        Seq(all.filter(_._1 % 3 == 0), all.filter(_._1 % 3 == 1), all.filter(_._1 % 3 == 2))
          .map(_.toDF("doc_id", "text"))
      def state(df: org.apache.spark.sql.DataFrame) =
        DocStream.minhashIndexState(df, "doc_id", "text",
          numHashes = 8, numBands = 4, shingleN = 1, maxBucketSize = 3)
      def rows(idx: org.apache.spark.sql.DataFrame) = idx
        .select(col("band"), col("band_hash"), col("corpus_id"))
        .as[(Int, String, Long)].collect().toSet
      val once = DocStream.refreshMinhashIndex(state(corpus), adm1, "doc_id", "text")
      val twice = DocStream.refreshMinhashIndex(once, adm2, "doc_id", "text")
      assert(rows(once.index) == rows(state(corpus.unionByName(adm1)).index),
        s"seed $seed: first fold diverged from rebuild")
      assert(rows(twice.index) ==
        rows(state(corpus.unionByName(adm1).unionByName(adm2)).index),
        s"seed $seed: second fold diverged from rebuild")
    }
  }

  test("embedding index refresh equals rebuild (fuzz: 6 seeded corpora, two folds each)") {
    // 2-d vectors from a tiny set of directions → real hyperplane-bucket
    // collisions; cap 3 forces tombstoned / growing / refresh-killed buckets
    val dirs = Vector((1f, 0f), (0f, 1f), (1f, 1f), (-1f, 1f), (1f, -2f))
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(100 + seed)
      def vec() = { val (x, y) = dirs(rnd.nextInt(dirs.size)); Array(x, y) }
      val all = (1L to 60L).map(i => (i, vec()))
      val Seq(corpus, adm1, adm2) =
        Seq(all.filter(_._1 % 3 == 0), all.filter(_._1 % 3 == 1), all.filter(_._1 % 3 == 2))
          .map(_.toDF("vec_id", "embedding"))
      def state(df: org.apache.spark.sql.DataFrame) =
        DocStream.embeddingIndexState(df, "vec_id", "embedding",
          nPlanes = 4, maxBucketSize = 3)
      def rows(idx: org.apache.spark.sql.DataFrame) = idx
        .select(col("_sig"), col("_c_id"))
        .as[(Long, Long)].collect().toSet
      val once = DocStream.refreshEmbeddingIndex(state(corpus), adm1, "vec_id", "embedding")
      val twice = DocStream.refreshEmbeddingIndex(once, adm2, "vec_id", "embedding")
      assert(rows(once.index) == rows(state(corpus.unionByName(adm1)).index),
        s"seed $seed: first fold diverged from rebuild")
      assert(rows(twice.index) ==
        rows(state(corpus.unionByName(adm1).unionByName(adm2)).index),
        s"seed $seed: second fold diverged from rebuild")
    }
  }

  test("attributionJoin: in-window matches, cross-batch matches, null-extension, boundaries") {
    val dir = java.nio.file.Files.createTempDirectory("graft-attr").toString
    val t0 = java.time.Instant.parse("2026-01-01T10:00:00Z")
    def ts(m: Long) = java.sql.Timestamp.from(t0.plusSeconds(m * 60))
    def ev(id: Long, u: Long, tpe: String, m: Long, v: Double) = (id, ts(m), u, tpe, v)
    def df(rows: (Long, java.sql.Timestamp, Long, String, Double)*) =
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value")
    val drop1 = df(
      ev(1, 1, "click", 0, 0), ev(2, 1, "click", 10, 0), ev(3, 1, "purchase", 30, 5.0),
      ev(4, 2, "purchase", 30, 9.0),   // no user-2 click — never surfaces
      ev(5, 3, "click", 0, 0), ev(6, 3, "purchase", 90, 9.0), // outside the hour
      ev(7, 4, "click", 50, 0))
    val drop2 = df(ev(8, 4, "purchase", 80, 7.0)) // cross-batch match for click 7
    def sentinels(m: Long) = df(ev(-1, -1, "click", m, 0), ev(-2, -1, "purchase", m, 0))
    val stream = spark.readStream.schema(drop1.schema).parquet(dir)
    val q = EventStream.attributionJoin(stream)
      .writeStream.outputMode("append").format("memory").queryName("attr")
      .option("checkpointLocation", s"$dir-ck").start()
    try Seq(drop1, drop2, sentinels(20000), sentinels(20060)).foreach { d =>
      d.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("attr").where($"user_id" =!= -1L).collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
    assert(out == Set(
      (1L, Some(3L)), (2L, Some(3L)),  // both clicks match the same purchase
      (5L, None),                      // purchase 90m away → null-extended
      (7L, Some(8L))),                 // matched across micro-batches
      s"got $out")
  }

  test("sessionWindows: cross-batch merge, end-exclusive boundary, exact bounds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toString
    val t0 = java.time.Instant.parse("2026-01-01T10:00:00Z")
    def ts(m: Long) = java.sql.Timestamp.from(t0.plusSeconds(m * 60))
    def df(rows: (Long, java.sql.Timestamp, Long)*) =
      rows.toSeq.toDF("event_id", "ts", "user_id")
    val drop1 = df((1L, ts(0), 1L), (2L, ts(10), 1L), (3L, ts(0), 2L), (4L, ts(30), 2L),
      (6L, ts(0), 3L), (7L, ts(31), 3L))
    val drop2 = df((5L, ts(35), 1L)) // 35 < 10+30 → merges into user 1's open session
    def sentinel(m: Long) = df((-1L, ts(m), -1L))
    val stream = spark.readStream.schema(drop1.schema).parquet(dir)
    val q = EventStream.sessionWindows(stream)
      .writeStream.outputMode("append").format("memory").queryName("sess")
      .option("checkpointLocation", s"$dir-ck").start()
    try Seq(drop1, drop2, sentinel(20000), sentinel(20060)).foreach { d =>
      d.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sess").where($"user_id" =!= -1L).collect()
      .map(r => (r.getLong(2), r.getTimestamp(0), r.getTimestamp(1), r.getLong(3))).toSet
    assert(out == Set(
      (1L, ts(0), ts(65), 3L),   // merged across batches: last event 35m + 30m gap
      (2L, ts(0), ts(60), 2L),   // exactly prev+gap still MERGES (inclusive rule)
      (3L, ts(0), ts(30), 1L),   // one minute past the gap → genuine break
      (3L, ts(31), ts(61), 1L)),
      s"got $out")
  }

  test("slidingCounts: each event lands in window/slide hops; straddling bursts stay whole") {
    val dir = java.nio.file.Files.createTempDirectory("graft-slide").toString
    val t0 = java.time.Instant.parse("2026-01-01T10:07:00Z") // NOT slide-aligned
    def ts(m: Long) = java.sql.Timestamp.from(t0.plusSeconds(m * 60))
    val drop1 = Seq((1L, ts(0), "click"), (2L, ts(1), "click"))
      .toDF("event_id", "ts", "event_type")
    val sentinel = Seq((-1L, ts(20000), "sentinel")).toDF("event_id", "ts", "event_type")
    val stream = spark.readStream.schema(drop1.schema).parquet(dir)
    val q = EventStream.slidingCounts(stream)
      .writeStream.outputMode("append").format("memory").queryName("slide")
      .option("checkpointLocation", s"$dir-ck").start()
    try Seq(drop1, sentinel, sentinel).foreach { d =>
      d.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("slide").where($"event_type" === "click").collect()
      .map(r => r.getTimestamp(0) -> r.getLong(2)).toMap
    // both events sit at 10:07/10:08 → the same 4 hour-long hops starting
    // 09:15, 09:30, 09:45, 10:00 (epoch-aligned 15-minute boundaries)
    val starts = Seq("09:15", "09:30", "09:45", "10:00")
      .map(h => java.sql.Timestamp.from(java.time.Instant.parse(s"2026-01-01T$h:00Z")))
    assert(got.keySet == starts.toSet, s"got ${got.keySet}")
    assert(got.values.forall(_ == 2L), "the burst is whole in every covering hop")
  }

  test("content-hash index refresh equals corpusIndex over the union") {
    val all = graft.core.Tables(spark, Sf0001).documents
    val corpus = all.where(col("doc_id") % 2 === 0)
    val admitted = all.where(col("doc_id") % 2 === 1)
    val refreshed = DocStream.refreshCorpusIndex(DocStream.corpusIndex(corpus), admitted)
      .as[String].collect().toSet
    val rebuilt = DocStream.corpusIndex(all).as[String].collect().toSet
    assert(refreshed == rebuilt)
    assert(refreshed.nonEmpty)
  }

  test("pointInTimeEnrichRefreshing: a mid-stream dimension rebuild lands on the next batch") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft-pit").toString
    val dropDir = s"$base/drops"; new java.io.File(dropDir).mkdirs()
    val dimPath = s"$base/dim"
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def writeDim(state: String): Unit = Seq(
        (7L, 1L, state, ts("2026-01-01 00:00:00"), null.asInstanceOf[java.sql.Timestamp]))
      .toDF("user_id", "version", "state", "effective_from", "effective_to")
      .write.mode("overwrite").parquet(dimPath)
    writeDim("bronze")
    val facts = Seq(
      (1L, 7L, ts("2026-01-02 00:00:00"), 1.0),
      (2L, 7L, ts("2026-01-03 00:00:00"), 2.0))
      .toDF("event_id", "user_id", "ts", "value")
    val stream = spark.readStream.schema(facts.schema).parquet(dropDir)
    val q = EventStream.pointInTimeEnrichRefreshing(
      stream, dimPath, s"$base/out", s"$base/ck")
    facts.where(col("event_id") === 1L).coalesce(1).write.mode("append").parquet(dropDir)
    q.processAllAvailable()
    writeDim("gold") // dimension rebuild BETWEEN micro-batches
    facts.where(col("event_id") === 2L).coalesce(1).write.mode("append").parquet(dropDir)
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$base/out").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("state")).toMap
    assert(out == Map(1L -> "bronze", 2L -> "gold"),
      s"batch 2 must plan against the refreshed dimension, got $out")
  }
}
