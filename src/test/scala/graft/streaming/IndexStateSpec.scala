package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The daily refresh loop's lineage-checkpoint and sidecar-compaction
  * contracts (DocStream.{write,read,compact,expand}*IndexState): the q127
  * driver oracle certifies the loop end to end at sf0.01; these specs pin
  * the state-level invariants the loop relies on — schema-metadata and
  * count survival through parquet, and compaction exactness on a corpus
  * with live, at-cap, tombstoned, and cap-crossing buckets.
  */
class IndexStateSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  // live (C), at-cap (B), over-cap/tombstoned (A) buckets under cap 2;
  // fully disjoint vocabularies so each text's band buckets are its own
  private def corpus = Seq(
    (1L, "alpha bravo charlie"), (2L, "alpha bravo charlie"),
    (3L, "alpha bravo charlie"),
    (4L, "delta echo foxtrot"), (5L, "delta echo foxtrot"),
    (6L, "golf hotel india")).toDF("doc_id", "text")

  // pushes B over the cap (old AND new rows must drop), lands in dead A
  // (must stay dead), and adds a fresh doc D (must appear)
  private def delta = Seq(
    (7L, "alpha bravo charlie"), (8L, "delta echo foxtrot"),
    (9L, "juliet kilo lima")).toDF("doc_id", "text")

  private def state0 = DocStream.minhashIndexState(
    corpus, "doc_id", "text",
    numHashes = 16, numBands = 4, shingleN = 1, maxBucketSize = 2)

  test("MinHash index state survives the parquet lineage checkpoint intact") {
    val st = state0
    val dir = tmpDir("graft-idxstate")
    DocStream.writeMinhashIndexState(st, dir)
    val back = DocStream.readMinhashIndexState(spark, dir)
    val meta = back.index.schema("band").metadata
    for (k <- Seq(DocStream.NumHashesMetaKey, DocStream.NumBandsMetaKey,
        DocStream.ShingleNMetaKey, DocStream.MaxBucketMetaKey))
      assert(meta.getLong(k) == st.index.schema("band").metadata.getLong(k),
        s"schema metadata $k lost or changed in the parquet round-trip")
    assert(rows(back.index) == rows(st.index))
    assert(rows(back.bucketCounts) == rows(st.bucketCounts))
  }

  test("embedding index state survives the parquet lineage checkpoint intact") {
    val e = graft.core.Tables(spark, Sf0001).embeddings
    val st = DocStream.embeddingIndexState(e, "vec_id", "embedding",
      nPlanes = 8, maxBucketSize = 200)
    val dir = tmpDir("graft-embstate")
    DocStream.writeEmbeddingIndexState(st, dir)
    val back = DocStream.readEmbeddingIndexState(spark, dir)
    val meta = back.index.schema("_sig").metadata
    assert(meta.getLong(DocStream.NPlanesMetaKey) == 8L)
    assert(meta.getLong(DocStream.LshMaxBucketMetaKey) == 200L)
    assert(rows(back.index) == rows(st.index))
    assert(rows(back.bucketCounts) == rows(st.bucketCounts))
  }

  test("compaction keeps ONLY tombstones and expand reconstructs the full sidecar") {
    val st = state0
    val compacted = DocStream.compactMinhashIndexState(st)
    // exactly the over-cap buckets survive compaction
    assert(rows(compacted.bucketCounts) ==
      rows(st.bucketCounts.where(col("n") > 2)))
    assert(compacted.bucketCounts.count() > 0,
      "fixture must contain tombstoned buckets or the test is vacuous")
    assert(compacted.bucketCounts.count() < st.bucketCounts.count(),
      "fixture must contain under-cap buckets or compaction is a no-op")
    // expand re-derives every dropped count exactly from the index
    assert(rows(DocStream.expandMinhashIndexState(compacted).bucketCounts) ==
      rows(st.bucketCounts))
    // expand is idempotent on an already-full sidecar
    assert(rows(DocStream.expandMinhashIndexState(st).bucketCounts) ==
      rows(st.bucketCounts))
  }

  test("refresh from the compacted checkpoint == uncompacted == from-scratch rebuild") {
    val st = state0
    val dir = tmpDir("graft-idxstate-c")
    DocStream.writeMinhashIndexState(DocStream.compactMinhashIndexState(st), dir)
    val viaCompacted = DocStream.refreshMinhashIndex(
      DocStream.expandMinhashIndexState(DocStream.readMinhashIndexState(spark, dir)),
      delta, "doc_id", "text")
    val viaFull = DocStream.refreshMinhashIndex(st, delta, "doc_id", "text")
    val rebuild = DocStream.minhashIndexState(
      corpus.unionByName(delta), "doc_id", "text",
      numHashes = 16, numBands = 4, shingleN = 1, maxBucketSize = 2)
    for (refreshed <- Seq(viaCompacted, viaFull)) {
      assert(rows(refreshed.index) == rows(rebuild.index))
      assert(rows(refreshed.bucketCounts) == rows(rebuild.bucketCounts))
    }
    // the fixture's three discriminating fates actually occurred
    val kept = viaCompacted.index.select("corpus_id").as[Long].collect().toSet
    assert(!kept.exists(Set(4L, 5L, 8L)), "cap-crossing bucket must drop old AND new rows")
    assert(!kept.exists(Set(1L, 2L, 3L, 7L)), "tombstoned bucket must stay dead")
    assert(kept.contains(6L) && kept.contains(9L), "live buckets must survive")
  }

  test("embedding-tier compaction round-trip refreshes rebuild-identically") {
    val e = graft.core.Tables(spark, Sf0001).embeddings
    val day0 = e.where(col("vec_id") % 5 =!= 0)
    val d = e.where(col("vec_id") % 5 === 0)
    // cap 1 guarantees tombstones and cap-crossings at this corpus size
    val st = DocStream.embeddingIndexState(day0, "vec_id", "embedding",
      nPlanes = 8, maxBucketSize = 1)
    val compacted = DocStream.compactEmbeddingIndexState(st)
    assert(compacted.bucketCounts.count() > 0 &&
      compacted.bucketCounts.count() < st.bucketCounts.count())
    val viaCompacted = DocStream.refreshEmbeddingIndex(
      DocStream.expandEmbeddingIndexState(compacted), d, "vec_id", "embedding")
    val rebuild = DocStream.embeddingIndexState(e, "vec_id", "embedding",
      nPlanes = 8, maxBucketSize = 1)
    assert(rows(viaCompacted.index) == rows(rebuild.index))
    assert(rows(viaCompacted.bucketCounts) == rows(rebuild.bucketCounts))
  }
}
