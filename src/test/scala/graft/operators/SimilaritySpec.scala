package graft.operators

import graft.SparkSpec
import graft.core.Tables

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables(spark, Sf0001).embeddings
  private lazy val query: Seq[Double] = emb
    .where(org.apache.spark.sql.functions.col("vec_id") === 0)
    .select("embedding").head().getSeq[Float](0).map(_.toDouble).toSeq

  test("brute-force top-k returns k ranked neighbors with sane cosines") {
    val top = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 10, Some(0L))
      .collect()
    assert(top.length == 10)
    val sims = top.map(_.getDouble(1))
    assert(sims.sameElements(sims.sorted.reverse), "descending order")
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
  }

  test("LSH top-k achieves reasonable recall vs the exact baseline") {
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 10, Some(0L))
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.lshTopK(emb, "vec_id", "embedding", query, 10,
      nPlanes = 16, maxBitDiff = 8, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall $recall too low (approx=$approx exact=$exact)")
  }

  test("embedding LSH near-dup finds planted duplicate vectors") {
    import spark.implicits._
    val base = emb.limit(20).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    // plant an exact duplicate of vector 0 under a new id
    val planted = (base :+ ((9999L, base.head._2))).toSeq.toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDuplicates(
      planted, "vec_id", "embedding", minCosine = 0.999, nPlanes = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((base.head._1, 9999L)),
      s"planted duplicate must be found, got $pairs")
  }

  test("semantic dedup keeps one canonical vector per near-dup cluster") {
    import spark.implicits._
    val base = emb.limit(20).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    // plant two exact copies of vector 0: {v0, 9998, 9999} form one cluster
    val planted =
      (base ++ Seq((9998L, base.head._2), (9999L, base.head._2)))
        .toSeq.toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDuplicates(
      planted, "vec_id", "embedding", minCosine = 0.999, nPlanes = 12)
    val kept = Dedup.dedupCorpus(planted, "vec_id", pairs)
      .select("vec_id").as[Long].collect().toSet
    assert(kept.contains(base.head._1), "cluster minimum survives as canonical")
    assert(!kept.contains(9998L) && !kept.contains(9999L), "copies are dropped")
  }

  test("embedding LSH mega-bucket skew: 50k identical vectors are capped ids-first") {
    import spark.implicits._
    // Adversarial corpus for hyperplane LSH: every vector identical → ALL
    // rows land in one signature bucket. The cap must discard the bucket
    // from an ids-only aggregate (bounded per-task input); pre-fix, a
    // window over sig would buffer all 50k full vectors in one task first.
    // Two distinct small-bucket vectors ride along to prove capping a
    // mega-bucket doesn't suppress legitimate pairs elsewhere.
    val dim = 8
    val mega = spark.range(0, 50000)
      .select($"id".as("vec_id"),
        org.apache.spark.sql.functions.array(
          (0 until dim).map(i => org.apache.spark.sql.functions.lit(1.0f + i)): _*
        ).as("embedding"))
    val small = Seq(
      (100001L, Array.tabulate(dim)(i => -(1.0f + i))),
      (100002L, Array.tabulate(dim)(i => -(1.0f + i) * 2.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDuplicates(
      mega.union(small), "vec_id", "embedding",
      minCosine = 0.999, nPlanes = 12, maxBucketSize = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((100001L, 100002L)),
      s"mega-bucket must be capped away, small bucket must pair; got ${pairs.take(5)}")
  }

  test("incremental embedding dedup pairs delta vectors with corpus near-dups only") {
    import spark.implicits._
    val base = emb.limit(30).collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val corpus = base.toSeq.toDF("vec_id", "embedding")
    // delta: one exact copy of a corpus vector + one corpus vector reused
    // under a new id (both must hit), nothing else
    val delta = Seq((9998L, base.head._2), (9999L, base(5)._2))
      .toDF("vec_id", "embedding")
    val out = Dedup.embeddingIncrementalDuplicates(
      corpus, delta, "vec_id", "embedding", minCosine = 0.999, nPlanes = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((9998L, base.head._1)), s"planted copy must match, got $out")
    assert(out.contains((9999L, base(5)._1)))
    assert(out.forall { case (d, c) => d >= 9998L && c < 9998L },
      "only delta-vs-corpus pairs, never corpus-vs-corpus")
  }

  test("knnJoin: planted duplicate is every copy's nearest neighbor; k caps candidates") {
    import spark.implicits._
    val base = emb.limit(30).collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    // two exact copies of vector 0: each copy's rank-1 neighbor is a copy
    val planted = (base ++ Seq((9998L, base.head._2), (9999L, base.head._2)))
      .toSeq.toDF("vec_id", "embedding")
    val out = Similarity.knnJoin(planted, "vec_id", "embedding", k = 3, nPlanes = 8)
      .collect()
      .groupBy(_.getAs[Long]("vec_id"))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getAs[Long]("knn_rank"))
          .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine_sim"))).toSeq
      }
    assert(out.values.forall(_.size <= 3), "per-vector neighbor list capped at k")
    // cosine(copy, copy) = 1.0; ties break by neighbor id ascending
    assert(out(9999L).take(2).map(_._1) == Seq(base.head._1, 9998L),
      s"copies must rank first for 9999, got ${out(9999L)}")
    assert(out(9999L).head._2 > 0.999)
    // symmetry of membership: 9999 appears in 9998's list and vice versa
    assert(out(9998L).exists(_._1 == 9999L))
  }

  test("knnJoin inherits the ids-first mega-bucket cap (all-identical corpus yields nothing)") {
    import spark.implicits._
    val dim = 8
    val mega = spark.range(0, 30000)
      .select($"id".as("vec_id"),
        org.apache.spark.sql.functions.array(
          (0 until dim).map(i => org.apache.spark.sql.functions.lit(0.5f + i)): _*
        ).as("embedding"))
    val out = Similarity.knnJoin(mega, "vec_id", "embedding", k = 3,
      nPlanes = 12, maxBucketSize = 200)
    assert(out.count() == 0, "a single over-cap bucket must be dropped, not paired")
  }

  test("clusterSample caps every cluster at perCluster and is partition-stable") {
    val centroids = emb.orderBy("vec_id").limit(4).collect()
      .zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Float](1).map(_.toDouble).toSeq }
      .toSeq
    def run(parts: Int) =
      Similarity.clusterSample(emb.repartition(parts), "vec_id", "embedding", centroids, 10)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val one = run(1)
    assert(run(6) == one, "hash-rank cut must not depend on physical partitioning")
    val perCluster = one.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perCluster.values.forall(_ <= 10))
    assert(perCluster.values.sum == one.size && one.nonEmpty)
  }

  test("k-means centroids assign all vectors and improve over raw seeds") {
    val centroids = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 8, iterations = 3)
    assert(centroids.length == 8)
    assert(centroids.forall(_._2.length == 64), "centroid dimensionality preserved")
    val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding", centroids)
    val sizes = assigned.groupBy("centroid_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.values.sum == emb.count())
    assert(sizes.keys.forall(_ >= 0), "no unassigned vectors")
    // trained IVF with 3 probes should recover a healthy share of exact top-10
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 10, Some(0L))
      .collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(assigned, "vec_id", "embedding", centroids, query, 10,
      nProbe = 3, excludeId = Some(0L)).collect().map(_.getLong(0)).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.3, s"trained-IVF recall too low: $recall")
  }

  test("IVF probe returns neighbors from the probed lists with recall > 0") {
    val centroids = emb.orderBy("vec_id").limit(4).collect()
      .zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Float](1).map(_.toDouble).toSeq }
      .toSeq
    val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding", centroids)
    val counts = assigned.groupBy("centroid_id").count().collect()
    assert(counts.map(_.getLong(1)).sum == emb.count(), "every vector assigned")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 10, Some(0L))
      .collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(assigned, "vec_id", "embedding", centroids, query, 10,
      nProbe = 2, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSet
    assert(ivf.nonEmpty && (exact & ivf).nonEmpty)
  }

  test("clusterDiversity: collapsed label scores 0, even two-cluster split scores 0.5") {
    import spark.implicits._
    val centroids = Seq(
      1 -> Seq(1.0, 0.0, 0.0, 0.0),
      2 -> Seq(0.0, 1.0, 0.0, 0.0))
    val e = Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (11L, Seq(1.0f, 0.1f, 0.0f, 0.0f), 0), // label 0: both on centroid 1
      (20L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 1),
      (21L, Seq(0.0f, 1.0f, 0.0f, 0.0f), 1) // label 1: split 1/1
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.clusterDiversity(e, "embedding", "label", centroids)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(0) == ((2L, 1L, 1.0, 0.0)), s"collapsed label: $out")
    assert(out(1) == ((2L, 2L, 0.5, 0.5)), s"even split: $out")
  }

  test("embeddingContamination: one best match per eval item, id tie-break, threshold filters") {
    import spark.implicits._
    val evalSet = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)), // duplicated twice in the corpus
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)) // orthogonal to everything in the corpus
    ).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (11L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (12L, Seq(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity
      .embeddingContamination(corpus, evalSet, "vec_id", "embedding", minCosine = 0.9)
      .collect()
    assert(out.length == 1, s"only the duplicated eval item is contaminated: ${out.toSeq}")
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 10L,
      s"equal-cosine tie must break to the lower corpus id: ${out.toSeq}")
    assert(out.head.getDouble(2) == 1.0)
  }

  test("PQ codebooks are partition-invariant and codes stay in range") {
    import org.apache.spark.sql.functions.col
    val books = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      numSub = 8, codesPerSub = 16, iterations = 2)
    assert(books.length == 8 && books.forall(_.length == 16))
    assert(books.forall(_.forall(_.length == 8)), "subDim = 64/8")
    val booksRepart = Similarity.pqCodebooks(emb.repartition(7), "vec_id", "embedding",
      numSub = 8, codesPerSub = 16, iterations = 2)
    assert(books == booksRepart,
      "fixed-point means must make training independent of partitioning")

    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books)
    assert(codes.count() == emb.count())
    val flat = codes.select(org.apache.spark.sql.functions.explode(col("codes"))).collect().map(_.getInt(0))
    assert(flat.forall(c => c >= 0 && c < 16), "every code addresses its codebook")
  }

  test("PQ ADC top-k recovers planted clusters exactly") {
    import spark.implicits._
    // 200 vectors in 4 planted clusters: prototype per id % 4, tiny
    // deterministic per-dim jitter. Each 4-dim subspace sees only 4 distinct
    // regions, so a 4-code codebook can represent the structure — ADC top-k
    // must then rank the query's own cluster first.
    val dim = 16
    val protos: IndexedSeq[IndexedSeq[Double]] = IndexedSeq.tabulate(4, dim) {
      (p, d) => if (d % 4 == p) 10.0 else 0.0
    }
    val vecs = (0L until 200L).map { id =>
      val p = (id % 4).toInt
      id -> protos(p).zipWithIndex
        .map { case (v, d) => (v + ((id * 31 + d * 7) % 5).toDouble * 1e-3).toFloat }
    }
    val df = vecs.toDF("vec_id", "embedding").repartition(5)
    val books = Similarity.pqCodebooks(df, "vec_id", "embedding",
      numSub = 4, codesPerSub = 4, iterations = 3)
    val codes = Similarity.pqEncode(df, "vec_id", "embedding", books)
    // query: cluster-0 prototype, excluding nothing
    val adc = Similarity.pqTopK(codes, "vec_id", books,
      query = protos(0), k = 20, excludeId = None).collect()
    assert(adc.length == 20)
    val dists = adc.map(_.getDouble(1))
    assert(dists.sameElements(dists.sorted), "ascending ADC distance")
    assert(adc.forall(_.getLong(0) % 4 == 0L),
      s"every ADC hit must come from the query's planted cluster: ${adc.map(_.getLong(0)).toSeq}")
  }

  test("MMR re-rank: relevance-first seed, redundancy suppressed, pool-bounded") {
    import spark.implicits._
    // planted geometry: 1 and 2 are near-duplicates of each other (and the
    // two most query-relevant), 3 is less relevant but diverse, 4 is
    // anti-correlated; none coincides with the query direction (a candidate
    // equal to the query degenerates every second-pick score to ~0)
    val planted = Seq(
      (1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, Seq(0.89f, 0.12f, 0.0f)),
      (3L, Seq(0.5f, -0.8f, 0.0f)),
      (4L, Seq(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = Seq(1.0, 0.0, 0.0)
    val mmr = Similarity.mmrTopK(planted, "vec_id", "embedding", q,
      k = 3, poolSize = 4, lambda = 0.5).collect()
    assert(mmr.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L),
      "first pick = most relevant; second pick must SKIP the near-duplicate 2 for the diverse 3")
    assert(mmr.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // plain top-3 would have taken the redundant pair back to back
    val plain = Similarity.bruteForceTopK(planted, "vec_id", "embedding", q, 3)
      .collect().map(_.getLong(0)).toSeq
    assert(plain == Seq(1L, 2L, 3L))
    // k beyond the pool degrades to the pool, no duplicates ever
    val all = Similarity.mmrTopK(planted, "vec_id", "embedding", q,
      k = 10, poolSize = 4, lambda = 0.5).collect().map(_.getLong(1))
    assert(all.length == 4 && all.distinct.length == 4)
    // an array<double> vector column must produce the same selection (the
    // pool read matches on element type instead of assuming float)
    val asDouble = planted.selectExpr("vec_id",
      "transform(embedding, x -> cast(x as double)) as embedding")
    val mmrD = Similarity.mmrTopK(asDouble, "vec_id", "embedding", q,
      k = 3, poolSize = 4, lambda = 0.5).collect()
    assert(mmrD.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L))
  }

  test("semDedup: within-cluster prune, cross-cluster pairs immune, chain rule") {
    import spark.implicits._
    val c15 = (math.cos(math.toRadians(15)).toFloat, math.sin(math.toRadians(15)).toFloat)
    val c30 = (math.cos(math.toRadians(30)).toFloat, math.sin(math.toRadians(30)).toFloat)
    val planted = Seq(
      (10L, Seq(0.9f, 0.1f, 0.0f)),    // cluster 1
      (11L, Seq(0.89f, 0.12f, 0.0f)),  // near-dup of 10, same cluster -> dropped by 10
      (13L, Seq(0.7f, 0.72f, 0.0f)),   // cluster 2 (0.72 > 0.7)
      (14L, Seq(0.72f, 0.7f, 0.0f)),   // cluster 1 — near-dup of 13 ACROSS clusters: immune
      (20L, Seq(0.1f, 0.9f, 0.0f)),    // cluster 2
      (21L, Seq(0.12f, 0.88f, 0.0f)),  // near-dup of 20, same cluster -> dropped by 20
      // chain a<b<c at 0°/15°/30° around the z-axis (an isolated third
      // cluster, so no other member can out-min the intended droppers):
      // cos(a,b), cos(b,c) ≥ τ, cos(a,c) = cos 30° < τ
      (30L, Seq(0.0f, 0.0f, 1.0f)),
      (31L, Seq(0.0f, c15._2, c15._1)),
      (32L, Seq(0.0f, c30._2, c30._1))
    ).toDF("vec_id", "embedding")
    val cents = Seq(1 -> Seq(1.0, 0.0, 0.0), 2 -> Seq(0.0, 1.0, 0.0),
      3 -> Seq(0.0, 0.0, 1.0))
    val out = Similarity.semDedup(planted, "vec_id", "embedding", cents, tau = 0.95)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(11L) == ((1, 0L, 10L)), "same-cluster near-dup dropped by min id")
    assert(out(21L) == ((2, 0L, 20L)))
    assert(out(13L)._2 == 1L && out(14L)._2 == 1L,
      "cross-cluster near-dups are immune — the cluster scoping IS the operator")
    assert(out(13L)._1 == 2 && out(14L)._1 == 1)
    // chain: 31 dropped by 30; 32 dropped by 31 even though 31 is dropped
    // (one-pass pairwise rule, not greedy-sequential)
    assert(out(31L) == ((3, 0L, 30L)))
    assert(out(32L) == ((3, 0L, 31L)))
    assert(out(10L)._2 == 1L && out(20L)._2 == 1L && out(30L)._2 == 1L)
    assert(out.values.forall(v => (v._2 == 1L) == (v._3 == -1L)), "-1 sentinel iff kept")
    // maxClusterSize=2: only the first 2 ids per cluster participate, so
    // 32 (rank 3 in cluster 3 after 30,31) is kept unconditionally
    val capped = Similarity.semDedup(planted, "vec_id", "embedding", cents,
      tau = 0.95, maxClusterSize = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(capped(11L) == 0L, "rank-2 member still pruned against rank-1")
    assert(capped(31L) == 0L, "rank-2 member of cluster 3 still pruned")
    assert(capped(32L) == 1L, "over-cap member is kept unconditionally")
  }

  test("matryoshka refine: coarse prefix prunes, exact re-rank orders") {
    import spark.implicits._
    // planted: B looks better than C on the 2-dim prefix but worse on the
    // full 4 dims — with coarseK=2 the funnel keeps {A,B}; with coarseK=3
    // the exact re-rank recovers the true top-2 {A,C}
    val planted = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // A: perfect everywhere
      (2L, Seq(0.8f, 0.01f, 0.6f, 0.0f)),  // B: coarse ~1.0, full ~0.8
      (3L, Seq(0.6f, 0.25f, 0.0f, 0.0f))   // C: coarse ~0.92, full ~0.92
    ).toDF("vec_id", "embedding")
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val narrow = Similarity.refineTopK(planted, "vec_id", "embedding", q,
      k = 2, coarseDims = 2, coarseK = 2).collect()
    assert(narrow.map(_.getLong(0)).toSeq == Seq(1L, 2L),
      "coarseK=2 must prune C before the re-rank sees it")
    val wide = Similarity.refineTopK(planted, "vec_id", "embedding", q,
      k = 2, coarseDims = 2, coarseK = 3).collect()
    assert(wide.map(_.getLong(0)).toSeq == Seq(1L, 3L),
      "with C in the pool the exact re-rank must prefer it over B")
    // full-dim similarity strictly ordered within the result
    val sims = wide.map(_.getAs[Double]("cosine_sim")).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("hard negatives: never a same-label pair, ranks contiguous and similarity-ordered") {
    val neg = Similarity.hardNegatives(Tables(spark, Sf0001).embeddings,
      "vec_id", "embedding", "label", k = 3).collect()
    assert(neg.nonEmpty)
    assert(neg.forall(r => r.getAs[Int]("anchor_label") != r.getAs[Int]("neighbor_label")),
      "a hard negative must carry a different label")
    val byAnchor = neg.groupBy(_.getLong(0))
    byAnchor.foreach { case (_, rows) =>
      val ranked = rows.sortBy(_.getAs[Long]("neg_rank"))
      assert(ranked.map(_.getAs[Long]("neg_rank")).toSeq == (1L to rows.length).toSeq)
      val sims = ranked.map(_.getAs[Double]("cosine_sim")).toSeq
      assert(sims == sims.sorted.reverse, "negatives ranked by descending similarity")
      assert(rows.length <= 3)
    }
  }
}
