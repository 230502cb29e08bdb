package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity.cosineFast
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *   - [[bruteForceTopK]] — exact cosine top-k: one scan, per-partition
  *     top-k then global merge of k·partitions candidates (Spark's
  *     TakeOrdered). Correct baseline at any scale; cost O(N·d).
  *   - [[lshTopK]] — random-hyperplane LSH: probe only vectors whose
  *     signature is within `maxBitDiff` of the query's. At 100 TB the
  *     signature is precomputed+stored and the probe prunes the scan to the
  *     matching buckets (partition the table by signature prefix).
  *   - [[ivfTopK]] — inverted-file: vectors pre-assigned to their nearest of
  *     `nCentroids` coarse centroids; queries probe `nProbe` nearest lists.
  */
object Similarity {

  /** Exact cosine top-k against a literal query vector. */
  def bruteForceTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      excludeId: Option[Long] = None): DataFrame = {
    val q = array(query.map(lit): _*)
    val base = excludeId.map(e => emb.where(col(idCol) =!= e)).getOrElse(emb)
    base
      .select(col(idCol), cosineFast(col(vecCol), q).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }

  /** Maximal-marginal-relevance (MMR) top-k: the diversity re-rank of
    * [[bruteForceTopK]]'s exact candidate pool. Greedy selection — pick the
    * candidate maximizing `λ·sim(query, c) − (1−λ)·max_{s∈selected}
    * sim(c, s)` (for the first pick the penalty term is 0, so it is the
    * most relevant candidate); ties break by ascending id. The classic
    * redundancy-suppressing retrieval used to diversify few-shot example
    * pools and RAG contexts.
    *
    * Scale shape: the corpus is touched ONCE, by the distributed exact
    * top-`poolSize` scan; only the pool — `poolSize` (id, sim, vector)
    * rows, a documented constant — reaches the driver for the O(k·poolSize)
    * greedy (the bounded-driver-state precedent of the IVF centroids and PQ
    * codebooks; the greedy's result depends on all-pairs state over the
    * pool, which is exactly what bounded driver work is for). Every cosine
    * uses the same sequential-fold arithmetic as the
    * `cosine_similarity` expression, so the selection is bit-reproducible
    * against the DuckDB oracle.
    */
  def mmrTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      poolSize: Int,
      lambda: Double = 0.5,
      excludeId: Option[Long] = None): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // element type read as Number so both array<float> and array<double>
    // vector columns work (a raw getSeq[Float] on a double column compiles
    // but ClassCastExceptions at runtime); float inputs widen exactly, so
    // the arithmetic is unchanged for the certified float path
    val pool = bruteForceTopK(emb, idCol, vecCol, query, poolSize, excludeId)
      .join(emb.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col(idCol).cast("long"), col("cosine_sim"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Number](2).map(_.doubleValue): Seq[Double]))
      .sortBy(_._1)
    // sequential folds in the exact order of the certified cosine HOF
    // formulation (dot, then |a|², then |b|²) — bit-identical across
    // engines
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
      i = 0
      while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
      i = 0
      while (i < b.length) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val remaining = scala.collection.mutable.LinkedHashMap(
      pool.map(c => c._1 -> c).toIndexedSeq: _*)
    val chosen = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val chosenVecs = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
    while (chosen.size < k && remaining.nonEmpty) {
      val best = remaining.values.map { c =>
        val penalty =
          if (chosenVecs.isEmpty) 0.0
          else chosenVecs.iterator.map(v => cos(c._3, v)).max
        (c, lambda * c._2 - (1.0 - lambda) * penalty)
      }.reduceLeft { (x, y) =>
        if (y._2 > x._2 || (y._2 == x._2 && y._1._1 < x._1._1)) y else x
      }._1
      chosen += ((best._1, best._2))
      chosenVecs += best._3
      remaining.remove(best._1)
    }
    chosen.toSeq.zipWithIndex
      .map { case ((id, rel), i) => (i + 1L, id, rel) }
      .toDF("mmr_rank", idCol, "relevance")
  }

  /** Hard-negative mining: for EVERY anchor vector, its top-`k` most
    * similar same-LSH-bucket vectors with a DIFFERENT label — the
    * contrastive-training pairs that are hard precisely because they are
    * close in embedding space but semantically distinct. The
    * [[knnJoin]] bucket pipeline (ids-first capped buckets, Σ bucket²
    * candidate work, never N²) with the label anti-filter applied BEFORE
    * ranking, so `neg_rank` counts negatives only; labels attach by
    * ids-only joins — vectors never move to the label join.
    */
  def hardNegatives(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      nPlanes: Int = Dedup.AutoPlanes,
      maxBucketSize: Int = 200): DataFrame = {
    val pairs = Dedup.embeddingNearDuplicates(
      emb, idCol, vecCol, minCosine = -1.0, nPlanes = nPlanes,
      maxBucketSize = maxBucketSize)
    val sym = pairs
      .select(col("id_a").as("vec_id"), col("id_b").as("neighbor_id"), col("cosine_sim"))
      .unionByName(pairs
        .select(col("id_b").as("vec_id"), col("id_a").as("neighbor_id"), col("cosine_sim")))
    val labels = emb.select(col(idCol).as("_lbl_id"), col(labelCol).as("_lbl"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    sym
      .join(labels.select(col("_lbl_id").as("vec_id"), col("_lbl").as("anchor_label")),
        Seq("vec_id"))
      .join(labels.select(col("_lbl_id").as("neighbor_id"), col("_lbl").as("neighbor_label")),
        Seq("neighbor_id"))
      .where(col("anchor_label") =!= col("neighbor_label"))
      .withColumn("neg_rank", row_number().over(w).cast("long"))
      .where(col("neg_rank") <= k)
      .select(col("vec_id"), col("anchor_label"), col("neg_rank"),
        col("neighbor_id"), col("neighbor_label"), col("cosine_sim"))
  }

  /** Matryoshka-style two-stage retrieval: a COARSE pass scores every
    * vector by the cosine of its first `coarseDims` components against the
    * query prefix and keeps the top `coarseK`; an exact full-dimension
    * re-rank over those candidates returns the final top `k`. The standard
    * cheap-filter-then-refine funnel used with prefix-truncatable
    * (Matryoshka) embeddings — stage 1 reads `coarseDims/d` of the vector
    * bytes per row.
    *
    * One corpus scan total: the candidate vectors ride THROUGH the coarse
    * TakeOrdered (coarseK · d floats of shuffle payload, a constant), so
    * the refine stage never rejoins the corpus. Both cosines use the
    * certified sequential-fold expression — the funnel's selections are
    * bit-reproducible.
    */
  def refineTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      coarseDims: Int,
      coarseK: Int,
      excludeId: Option[Long] = None): DataFrame = {
    val coarseQ = array(query.take(coarseDims).map(lit): _*)
    val fullQ = array(query.map(lit): _*)
    val base = excludeId.map(e => emb.where(col(idCol) =!= e)).getOrElse(emb)
    base
      .select(col(idCol), col(vecCol),
        cosineFast(slice(col(vecCol), 1, coarseDims), coarseQ).as("coarse_sim"))
      .orderBy(col("coarse_sim").desc, col(idCol))
      .limit(coarseK)
      .select(col(idCol), col("coarse_sim"),
        cosineFast(col(vecCol), fullQ).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }

  /** LSH-bucketed ANN: rank candidates whose hyperplane signature differs
    * from the query signature in at most `maxBitDiff` of `nPlanes` bits,
    * then exact-rank the survivors. Returns the same schema as brute force;
    * recall < 1 by construction (tested against the exact baseline).
    */
  def lshTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      nPlanes: Int = 16,
      maxBitDiff: Int = 4,
      excludeId: Option[Long] = None): DataFrame = {
    val q = array(query.map(lit): _*)
    val base = excludeId.map(e => emb.where(col(idCol) =!= e)).getOrElse(emb)
    val withSig = base.withColumn("_sig",
      graft.functions.HyperplaneSignatureExpr.hyperplaneFast(col(vecCol), nPlanes))
    val qSig = graft.functions.HyperplaneSignatureExpr.hyperplaneFast(q, nPlanes)
    withSig
      .where(bit_count(col("_sig").bitwiseXOR(qSig)) <= maxBitDiff)
      .select(col(idCol), cosineFast(col(vecCol), q).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }

  /** Assign every vector to its nearest centroid (by cosine) — the IVF
    * build step. `centroids` must be small (broadcast); at scale they come
    * from a sampled k-means; here any deterministic seed set works.
    * Returns the input plus a `centroid_id` column.
    */
  def ivfAssign(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    // argmax over a literal centroid set, computed as one expression:
    // greatest similarity wins; ties resolve to the lowest centroid id.
    // cosineFast = the native codegen expression, bit-identical to the HOF
    // cosine (parity-tested) — the assignment runs once per row per centroid
    val sims: Seq[(Int, Column)] =
      centroids.map { case (cid, c) => cid -> cosineFast(col(vecCol), array(c.map(lit): _*)) }
    val best = greatest(sims.map(_._2): _*)
    val pick = sims.foldLeft(when(lit(false), -1)) { case (acc, (cid, s)) =>
      acc.when(s === best, cid)
    }
    emb.withColumn("centroid_id", pick.otherwise(-1))
  }

  /** Fixed-point scale for the k-means centroid means: 2³⁰. Each component
    * is scaled, rounded to an integer, and summed as DECIMAL(38,0) — integer
    * addition is exact and order-independent, so the centroid values are
    * bit-identical regardless of partitioning AND replicable by any SQL
    * engine (a raw double `avg` varies with Spark's partition-dependent
    * summation order, which is why the trained path used to be
    * spec-gated-only). One deterministic rounding per component per
    * iteration; the ~2⁻³⁰ quantization is far below any embedding's noise
    * floor and k-means is insensitive to it.
    */
  val MeanScale: Double = 1073741824.0d

  /** Sampled distributed k-means for IVF centroids: deterministic seeding
    * (every step-th vector by id — no global sort/window), then Lloyd
    * iterations as pure DataFrame ops: assign → elementwise means via
    * posexplode + groupBy(centroid, dim). Each iteration is two shuffles
    * regardless of data size; only the k×d centroid matrix ever reaches the
    * driver. Empty clusters keep their previous centroid. Means use the
    * [[MeanScale]] fixed-point sum, so the trained centroids (and anything
    * probed against them) are engine-portable and oracle-certifiable (q94).
    */
  def kmeansCentroids(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iterations: Int = 3): Seq[(Int, Seq[Double])] = {
    val n = emb.count()
    val step = math.max(n / k, 1L)
    var centroids: Seq[(Int, Seq[Double])] = emb
      .where(pmod(col(idCol), lit(step)) === 0)
      .orderBy(col(idCol))
      .limit(k)
      .collect()
      .toIndexedSeq
      .zipWithIndex
      .map { case (r, i) =>
        i -> r.getSeq[Any](r.fieldIndex(vecCol)).map {
          case f: Float => f.toDouble
          case d: Double => d
        }.toSeq
      }
    (0 until iterations).foreach { _ =>
      val assigned = ivfAssign(emb, idCol, vecCol, centroids)
      val means = assigned
        .select(col("centroid_id"), posexplode(col(vecCol)).as(Seq("dim", "x")))
        .groupBy(col("centroid_id"), col("dim"))
        .agg(
          sum(round(col("x").cast("double") * lit(MeanScale)).cast("decimal(38,0)")).as("s"),
          count(lit(1)).as("cnt"))
        .select(
          col("centroid_id"),
          col("dim"),
          (col("s").cast("double") / col("cnt").cast("double") / lit(MeanScale)).as("m"))
        .groupBy(col("centroid_id"))
        .agg(sort_array(collect_list(struct(col("dim"), col("m")))).as("dims"))
        .collect()
        .map(r => r.getInt(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(_.getDouble(1)).toSeq)
        .toMap
      centroids = centroids.map { case (cid, old) => cid -> means.getOrElse(cid, old) }
    }
    centroids
  }

  /** IVF query: probe the `nProbe` centroids nearest to the query, exact-rank
    * only vectors assigned to those lists. `assigned` is the [[ivfAssign]]
    * output (precomputed once, reused across queries).
    */
  /** Driver-side cosine over two small literal vectors. Scala `.sum` is
    * the same left fold as the oracle's `list_reduce`, so anything chosen
    * by this arithmetic (probe sets, tie orders) is engine-portable.
    * Shared by [[ivfTopK]] and [[ivfSq8TopK]] — the probed-list choice is
    * determinism-critical and must not fork.
    */
  private def cosineLocal(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    d / (na * nb)
  }

  /** The `nProbe` centroid ids nearest to `query` (cosine desc, cid asc). */
  private def probeIds(
      centroids: Seq[(Int, Seq[Double])],
      query: Seq[Double],
      nProbe: Int): Seq[Int] =
    centroids
      .map { case (cid, c) => cid -> cosineLocal(query, c) }
      .sortBy { case (cid, s) => (-s, cid) }
      .take(nProbe)
      .map(_._1)

  def ivfTopK(
      assigned: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[(Int, Seq[Double])],
      query: Seq[Double],
      k: Int,
      nProbe: Int = 2,
      excludeId: Option[Long] = None): DataFrame = {
    val probed = probeIds(centroids, query, nProbe)
    val q = array(query.map(lit): _*)
    val base = excludeId.map(e => assigned.where(col(idCol) =!= e)).getOrElse(assigned)
    base
      .where(col("centroid_id").isin(probed: _*))
      .select(col(idCol), cosineFast(col(vecCol), q).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }

  /** Fixed-point mean-pooling of chunk embeddings into group (document)
    * vectors — the RAG/doc-embedding primitive: a document embedded as N
    * chunks gets ONE vector, the per-dimension mean of its chunks'. The
    * mean uses the [[MeanScale]] fixed-point sum (scaled ints summed as
    * DECIMAL(38,0), one exactly-rounded division per component — the
    * certified k-means arithmetic), so pooled vectors are bit-identical
    * across partitionings and engines where a raw double `avg` is not.
    *
    * Returns the LONG format `(groupCol, dim, pooled, n_chunks)` — every
    * pooled component is directly certifiable; reassembly to arrays is a
    * `sort_array(collect_list(...))` away when an API consumer wants it.
    *
    * Shape: one posexplode + ONE groupBy(group, dim) with map-side
    * combine; state per group is d rows. At 100 TB of chunk vectors this
    * is a single shuffle keyed (group, dim), no skew shape (every group
    * has the same d fan-out).
    */
  def meanPool(
      emb: DataFrame,
      groupCol: String,
      vecCol: String): DataFrame =
    emb
      .select(col(groupCol), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col(groupCol), col("dim").cast("long").as("dim"))
      .agg(
        sum(round(col("x").cast("double") * lit(MeanScale)).cast("decimal(38,0)")).as("s"),
        count(lit(1)).as("n_chunks"))
      .select(
        col(groupCol), col("dim"),
        (col("s").cast("double") / col("n_chunks").cast("double") / lit(MeanScale))
          .as("pooled"),
        col("n_chunks"))

  /** IVF-SQ8 query — the FAISS-style composite ANN index: coarse IVF
    * partition pruning ([[ivfAssign]] lists, `nProbe` nearest probed) with
    * the probed lists scored by the EXACT integer dot of int8 codes
    * ([[Quantize.codesCol]] under a fixed calibration, the native
    * [[graft.functions.QuantizedDot]] kernel). The two memory levers
    * compose: IVF prunes which vectors are touched (~nProbe/k_lists of the
    * corpus), SQ8 shrinks the bytes per touched vector 4×; a deployment
    * materializes `(centroid_id, codes)` and the scan reads neither the
    * float vectors nor the unprobed lists. Returns `(sq_rank, idCol,
    * centroid_id, qscore)`; integer scores need no fold-order pinning.
    */
  def ivfSq8TopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[(Int, Seq[Double])],
      params: Seq[(Double, Double)],
      query: Seq[Double],
      k: Int,
      nProbe: Int = 2,
      excludeId: Option[Long] = None): DataFrame = {
    val probed = probeIds(centroids, query, nProbe)
    val qLit = array(Quantize.encodeLocal(query, params).map(lit): _*)
    val assigned = ivfAssign(emb, idCol, vecCol, centroids)
    val base = excludeId.map(e => assigned.where(col(idCol) =!= e)).getOrElse(assigned)
    base
      .where(col("centroid_id").isin(probed: _*))
      .select(col(idCol), col("centroid_id"),
        graft.functions.QuantizedDot.quantizedDotFast(
          Quantize.codesCol(col(vecCol), params), qLit).as("qscore"))
      .orderBy(col("qscore").desc, col(idCol))
      .limit(k)
      .select(
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("qscore").desc, col(idCol))).cast("long").as("sq_rank"),
        col(idCol), col("centroid_id"), col("qscore"))
  }

  /** All-vectors kNN self-join: for EVERY vector, its top-`k` most similar
    * neighbors among same-LSH-bucket candidates — the batch similarity-join
    * primitive behind SemDeDup-style clustering diagnostics, hard-negative
    * mining, and near-neighbor graph construction (vs [[bruteForceTopK]],
    * which answers ONE query vector).
    *
    * Shape: [[Dedup.embeddingNearDuplicates]]'s certified bucket pipeline at
    * threshold −1 (every in-bucket pair survives; ids-first cap, Σ bucket²
    * candidate work, never N²), symmetrized, then a per-vector
    * `row_number ≤ k` that plans as a partial WindowGroupLimit — a vector's
    * candidate list is bounded by its bucket cap, so no task ever sorts more
    * than `maxBucketSize` rows per vector. Ties at equal cosine break by
    * neighbor id (deterministic, engine-portable).
    */
  /** Cluster-balanced corpus subsample: assign every vector to its nearest
    * coarse centroid ([[ivfAssign]]), then keep a deterministic hash-rank
    * top-`perCluster` per cluster — the diversity-preserving subsampling
    * step (each semantic region contributes equally, instead of a uniform
    * sample over-representing dense regions). Composes two already-audited
    * shapes: the argmax assignment is one codegen expression per row, the
    * per-cluster cut is a partial WindowGroupLimit (no cluster ever fully
    * sorts on one task).
    */
  def clusterSample(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[(Int, Seq[Double])],
      perCluster: Int): DataFrame =
    Curation.stratifiedSample(
      ivfAssign(emb, idCol, vecCol, centroids), "centroid_id", idCol, perCluster)
      .select(col("centroid_id"), col("sample_rank"), col(idCol))

  def knnJoin(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int = Dedup.AutoPlanes,
      maxBucketSize: Int = 200): DataFrame = {
    val pairs = Dedup.embeddingNearDuplicates(
      emb, idCol, vecCol, minCosine = -1.0, nPlanes = nPlanes,
      maxBucketSize = maxBucketSize)
    val sym = pairs
      .select(col("id_a").as("vec_id"), col("id_b").as("neighbor_id"), col("cosine_sim"))
      .unionByName(pairs
        .select(col("id_b").as("vec_id"), col("id_a").as("neighbor_id"), col("cosine_sim")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    sym
      .withColumn("knn_rank", row_number().over(w).cast("long"))
      .where(col("knn_rank") <= k)
      .select(col("vec_id"), col("knn_rank"), col("neighbor_id"), col("cosine_sim"))
  }

  /** Per-label cluster-diversity report: assign every vector to its nearest
    * centroid ([[ivfAssign]]), then per label report how spread the class is
    * across semantic regions — vector count, clusters hit, dominant-cluster
    * share, and the Simpson diversity index 1 − Σ pᵢ² (probability two
    * random members share a cluster, inverted). A collapsed label (all
    * vectors in one cluster) scores 0; a uniform spread over k clusters
    * scores 1 − 1/k.
    *
    * Simpson (not Shannon entropy) deliberately: it needs only +,×,/ on
    * doubles, which are IEEE-deterministic across engines, where `log`
    * differs by ulps between libm implementations and would break the
    * exact-hash oracle. The Σ runs as a sequential fold over the
    * centroid-id-sorted share list, so the addition order is pinned.
    *
    * Shape: the assignment is one broadcast-free map pass (centroids are
    * literals); then ONE groupBy(label, cid) count and a label-sized rollup.
    */
  def clusterDiversity(
      emb: DataFrame,
      vecCol: String,
      labelCol: String,
      centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    val counts = ivfAssign(emb, idCol = labelCol, vecCol = vecCol, centroids)
      .groupBy(col(labelCol).as("label"), col("centroid_id"))
      .agg(count(lit(1)).as("n"))
    counts
      .groupBy(col("label"))
      .agg(
        sum(col("n")).as("n_vecs"),
        count(lit(1)).as("n_clusters"),
        max(col("n")).as("_max_n"),
        sort_array(collect_list(struct(col("centroid_id"), col("n")))).as("_dist"))
      .withColumn("top_share", col("_max_n").cast("double") / col("n_vecs").cast("double"))
      .withColumn(
        "simpson",
        lit(1.0) - aggregate(
          col("_dist"),
          lit(0.0),
          (acc, e) => {
            val p = e.getField("n").cast("double") / col("n_vecs").cast("double")
            acc + p * p
          }))
      .select(col("label"), col("n_vecs"), col("n_clusters"), col("top_share"), col("simpson"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster the embedding space, then prune τ-similar pairs WITHIN each
    * cluster only — the clustering is the LSH-bucket philosophy for
    * cosine dedup (bound the quadratic to Σ cluster², never corpus²).
    * Returns every vector as `(vec_id, cluster_id, kept, dropped_by)`:
    * `kept = 0` iff SOME lower-id member of the same cluster is τ-similar,
    * and `dropped_by` is the smallest such keeper id (−1 when kept).
    *
    * Drop semantics are the one-pass pairwise rule: a vector is dropped
    * even if its dropper is itself dropped (chains a<b<c with
    * cos(a,b) ≥ τ ≥ cos(b,c) but cos(a,c) < τ drop both b and c). The
    * greedy sequential variant differs only on such chains and needs an
    * ordered per-cluster scan, which distributes poorly; the pairwise rule
    * is one self-equi-join. Deterministic: min-id keeper, exact cosine.
    *
    * Scale shape: assignment is a map-only pass over centroid literals
    * ([[ivfAssign]]); the prune self-joins each cluster on `centroid_id`
    * with `id_a < id_b` — Σ cluster² candidate work, bounded by
    * `maxClusterSize` (per-cluster membership is capped to the first
    * `maxClusterSize` ids via one window; over-cap members are kept
    * unconditionally and documented as un-pruned — size k so clusters
    * land under the cap, exactly the capped-bucket discipline of
    * [[Dedup.embeddingNearDuplicates]]). Vectors move once into the
    * cluster shuffle; the verdict join back is ids-only.
    */
  def semDedup(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[(Int, Seq[Double])],
      tau: Double,
      maxClusterSize: Int = 1000): DataFrame = {
    val assigned = ivfAssign(emb, idCol, vecCol, centroids)
      .select(col(idCol), col(vecCol), col("centroid_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("centroid_id")).orderBy(col(idCol))
    val inPrune = assigned
      .withColumn("_rank", row_number().over(w))
      .where(col("_rank") <= maxClusterSize)
      .drop("_rank")
    val dropped = inPrune.as("a")
      .join(inPrune.as("b"),
        col("a.centroid_id") === col("b.centroid_id") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .where(cosineFast(col(s"a.$vecCol"), col(s"b.$vecCol")) >= tau)
      .groupBy(col(s"b.$idCol").as("_dup_id"))
      .agg(min(col(s"a.$idCol")).as("_dropped_by"))
    assigned
      .join(dropped, col(idCol) === col("_dup_id"), "left")
      .select(
        col(idCol),
        col("centroid_id").as("cluster_id"),
        when(col("_dropped_by").isNull, 1L).otherwise(0L).as("kept"),
        coalesce(col("_dropped_by"), lit(-1L)).as("dropped_by"))
  }

  /** Eval-set contamination in embedding space: for each eval item, its
    * best (highest-cosine) training-corpus match at or above `minCosine` —
    * the embedding-space analog of the n-gram contamination check, used to
    * decontaminate a corpus against benchmark/eval embeddings where
    * paraphrases defeat exact n-gram overlap.
    *
    * Composes [[Dedup.embeddingIncrementalDuplicates]] (the corpus is never
    * self-joined: eval signatures probe an ids-first capped bucket index,
    * so corpus vectors move only for colliding candidates), then a
    * deterministic per-eval argmax (cosine desc, id asc). Candidates per
    * eval item are bounded by `maxBucketSize`, so the argmax window input
    * is bounded. Returns (eval_id, match_id, max_cosine).
    */
  def embeddingContamination(
      corpus: DataFrame,
      eval: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double = 0.25,
      nPlanes: Int = Dedup.AutoPlanes,
      maxBucketSize: Int = 200): DataFrame = {
    val pairs = Dedup.embeddingIncrementalDuplicates(
      corpus, eval, idCol, vecCol, minCosine, nPlanes, maxBucketSize)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("delta_id"))
      .orderBy(col("cosine_sim").desc, col("corpus_id"))
    pairs
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(
        col("delta_id").as("eval_id"),
        col("corpus_id").as("match_id"),
        col("cosine_sim").as("max_cosine"))
  }

  /** Product-quantization codebooks: the vector is split into `numSub`
    * contiguous subvectors and each subspace gets its own
    * `codesPerSub`-centroid k-means — ALL subspaces train simultaneously in
    * one DataFrame per iteration (assign is map-side against the broadcast
    * codebook literal; means are ONE `(sub, code, dim)` aggregation), so an
    * iteration costs one shuffle regardless of `numSub`, and only the
    * `numSub × codesPerSub × subDim` codebook ever reaches the driver.
    * Seeding and the fixed-point [[MeanScale]] means follow
    * [[kmeansCentroids]], so the trained codebooks are deterministic and
    * engine-portable (oracle-certifiable). Returns (sub → codebook), each
    * codebook `codesPerSub` vectors of `subDim` doubles.
    */
  def pqCodebooks(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      numSub: Int,
      codesPerSub: Int,
      iterations: Int = 2): IndexedSeq[IndexedSeq[Seq[Double]]] = {
    val dim = emb.select(size(col(vecCol))).head.getInt(0)
    require(dim % numSub == 0, s"dim $dim not divisible into $numSub subspaces")
    val subDim = dim / numSub
    val n = emb.count()
    val step = math.max(n / codesPerSub, 1L)
    val seeds: IndexedSeq[Seq[Double]] = emb
      .where(pmod(col(idCol), lit(step)) === 0)
      .orderBy(col(idCol))
      .limit(codesPerSub)
      .select(col(vecCol))
      .collect()
      .toIndexedSeq
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toSeq)
    var books: IndexedSeq[IndexedSeq[Seq[Double]]] =
      (0 until numSub).map(s => seeds.map(_.slice(s * subDim, (s + 1) * subDim)))

    // one subvector frame feeds every iteration's assign+means pass —
    // persist it so the scan+explode+slice runs once, not per iteration
    val subv = subvFrame(emb, idCol, vecCol, numSub, subDim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    (0 until iterations).foreach { _ =>
      val assigned = pqAssignSub(subv, books)
      val means = assigned
        .select(col("_sub"), col("_code"), posexplode(col("_sv")).as(Seq("_dim", "_x")))
        .groupBy(col("_sub"), col("_code"), col("_dim"))
        .agg(
          sum(round(col("_x").cast("double") * lit(MeanScale)).cast("decimal(38,0)")).as("s"),
          count(lit(1)).as("cnt"))
        .select(
          col("_sub"), col("_code"), col("_dim"),
          (col("s").cast("double") / col("cnt").cast("double") / lit(MeanScale)).as("m"))
        .groupBy(col("_sub"), col("_code"))
        .agg(sort_array(collect_list(struct(col("_dim"), col("m")))).as("dims"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          r.getSeq[org.apache.spark.sql.Row](2).map(_.getDouble(1)).toSeq)
        .toMap
      books = books.zipWithIndex.map { case (book, s) =>
        book.zipWithIndex.map { case (old, c) => means.getOrElse((s, c), old) }
      }
    }
    subv.unpersist(blocking = false)
    books
  }

  /** Nearest code per (vector, subspace) row: distances to every code of
    * the row's OWN subspace as an array column, argmin = first position of
    * the minimum (ties → lowest code, same rule as the oracle's
    * `ORDER BY dist, code`). Adds `_code`.
    *
    * The whole codebook rides along as ONE nested array literal indexed by
    * the row's `_sub`, and the per-code distances are a single `transform`
    * of per-pair folds — constant-size generated code regardless of
    * `numSub × codesPerSub` (the first formulation enumerated every
    * (sub, code) fold as its own expression branch: 128 inlined folds whose
    * Janino compilation dominated the whole query at bench scale). The
    * arithmetic per element and the fold order are unchanged, so assigned
    * codes are bit-identical to the unrolled form and the SQL oracle.
    */
  /** (_vid, _sub, _sv) rows: each vector exploded into its `numSub`
    * contiguous `subDim`-element subvectors — the shared slicing convention
    * of [[pqCodebooks]] (training) and [[pqEncode]] (encoding); a drifting
    * copy would make encoded codes silently stop matching the trained
    * codebooks.
    */
  private def subvFrame(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      numSub: Int,
      subDim: Int): DataFrame =
    emb.select(
      col(idCol).as("_vid"),
      explode(sequence(lit(0), lit(numSub - 1))).as("_sub"),
      col(vecCol).as("_v"))
      .withColumn("_sv", expr(s"slice(_v, _sub * $subDim + 1, $subDim)"))
      .drop("_v")

  private def pqAssignSub(
      subv: DataFrame,
      books: IndexedSeq[IndexedSeq[Seq[Double]]]): DataFrame = {
    val bookLit: Column = array(books.map(book =>
      array(book.map(cv => array(cv.map(lit): _*)): _*)): _*)
    val dists = transform(
      element_at(bookLit, col("_sub") + 1),
      cv => aggregate(
        zip_with(col("_sv"), cv, (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
        lit(0.0),
        (acc, d) => acc + d))
    subv
      .withColumn("_dists", dists)
      .withColumn("_code", (array_position(col("_dists"), array_min(col("_dists"))) - 1).cast("int"))
      .drop("_dists")
  }

  /** PQ-encode: each vector becomes `numSub` small-int codes (one byte per
    * subspace at codesPerSub ≤ 256) — the 100 TB ANN memory path: the codes
    * table is `numSub` bytes/vector instead of `dim × 4`, and every
    * downstream scan ranks against codes without touching raw floats.
    * Returns (idCol, codes array<int> ordered by subspace).
    */
  def pqEncode(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      books: IndexedSeq[IndexedSeq[Seq[Double]]]): DataFrame = {
    val numSub = books.length
    val dim = books.length * books.head.head.length
    val subDim = dim / numSub
    pqAssignSub(subvFrame(emb, idCol, vecCol, numSub, subDim), books)
      .groupBy(col("_vid").as(idCol))
      .agg(transform(
        sort_array(collect_list(struct(col("_sub"), col("_code")))),
        x => x.getField("_code")).as("codes"))
  }

  /** Asymmetric-distance (ADC) top-k: the query's per-(sub, code) distance
    * table is computed ONCE driver-side (numSub × codesPerSub doubles) and
    * inlined as literals; each encoded vector's approximate distance is
    * `numSub` array lookups summed in subspace order — a map-only scan of
    * the codes table + TakeOrdered, no shuffle and no raw vectors.
    * Distance table entries and their sum use the same fixed fold orders as
    * training, so results are engine-portable.
    */
  def pqTopK(
      codes: DataFrame,
      idCol: String,
      books: IndexedSeq[IndexedSeq[Seq[Double]]],
      query: Seq[Double],
      k: Int,
      excludeId: Option[Long] = None): DataFrame = {
    val numSub = books.length
    val subDim = query.length / numSub
    def l2sqLocal(a: Seq[Double], b: Seq[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    val dtab: IndexedSeq[IndexedSeq[Double]] = (0 until numSub).map { s =>
      val qs = query.slice(s * subDim, (s + 1) * subDim)
      books(s).map(cv => l2sqLocal(qs, cv))
    }
    val dist = (0 until numSub)
      .map(s => element_at(array(dtab(s).map(lit): _*), col("codes")(s) + 1))
      .reduce(_ + _)
    val base = excludeId.map(e => codes.where(col(idCol) =!= e)).getOrElse(codes)
    base
      .select(col(idCol), dist.as("adc_dist"))
      .orderBy(col("adc_dist").asc, col(idCol))
      .limit(k)
  }
}
