package graft.operators

import graft.functions.Fns.dotExact
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Cosine is computed with per-element double products accumulated in decimal
  * (see Fns.dotExact): exact, associative, and therefore identical under any
  * partitioning — floating-point fold order can never flip a threshold or a
  * rank.
  *
  * Scale paths: the brute-force variants are the small-side / verification
  * baseline; `lshBuckets`+`cosinePairsBucketed` is the 100 TB path — random
  * hyperplane signs bucket the corpus so the pairwise step is per-bucket.
  */
object Similarity {

  /** embedding L2 norm, exact. */
  def normExact(c: String): Column =
    sqrt(dotExact(c, c))

  /** All pairs (a < b) with cosine > threshold — brute force, for corpora
    * small enough to broadcast one side (the verification baseline).
    *
    * Two-phase evaluation: a codegen'd double dot product (graft.plans
    * .ArrayDotProduct) screens the O(n²) pairs with a small safety margin,
    * and only survivors pay the decimal-exact recompute that defines the
    * final value — exactness of the brute-force oracle at ~the cost of the
    * cheap kernel.
    */
  def cosinePairs(embeddings: DataFrame, threshold: Double,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // spread the streamed side: a single-file corpus would otherwise run
    // the O(n²) pair loop on one core
    val spread = embeddings.repartition(
      embeddings.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    val n = spread.select(col(idCol).as("id"), col(vecCol).as("v"), normExact(vecCol).as("nrm"))
    val a = n.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = n.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .where(graft.plans.Exprs.dot(col("va"), col("vb"))
        / nullif(col("na") * col("nb"), lit(0.0)) > threshold - 1e-6)
      .select(col("id_a"), col("id_b"),
        round(dotExact("va", "vb") / nullif(col("na") * col("nb"), lit(0.0)), 6).as("cosine"))
      .where(col("cosine") > threshold)
  }

  /** Brute-force top-k neighbors of one query vector: one scan, one dot
    * product per row, top-k via sort-limit (tiny result).
    */
  def topK(embeddings: DataFrame, query: DataFrame, k: Int,
           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(query.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      normExact(vecCol).as("qn")))
    embeddings
      .select(col(idCol), col(vecCol).as("v"), normExact(vecCol).as("nrm"))
      .crossJoin(q)
      .where(col(idCol) =!= col("qid"))
      .select(col(idCol),
        round(dotExact("v", "qv") / nullif(col("nrm") * col("qn"), lit(0.0)), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Random-hyperplane LSH signature: sign bits of dot products against
    * `planes` pseudo-random hyperplanes derived from xxhash64(dim, plane) —
    * deterministic, no driver-side randomness, one compiled pass per row
    * (graft.plans.HyperplaneLSH).
    */
  def lshSignature(vecCol: String, planes: Int): Column =
    graft.plans.Exprs.hyperplaneLsh(col(vecCol), planes)

  /** Symmetric int8 quantization of an embedding column: per-vector scale =
    * max|x|/127, elements rounded to int8 — 4× smaller storage/shuffle for
    * a ~1e-2 cosine error, the standard trade for 100 TB embedding tables.
    * Pure column expressions (array ops are per-element here, not per-pair:
    * this runs once per row at ingest, so HOF interpretation cost is fine).
    */
  def quantizeInt8(vecCol: String): (Column, Column) = {
    val scale = expr(
      s"aggregate($vecCol, cast(0 as double), (m, x) -> greatest(m, abs(cast(x as double)))) / 127.0")
    val quantized = expr(
      s"transform($vecCol, x -> cast(round(cast(x as double) / (__qscale)) as tinyint))")
    (scale, quantized)
  }

  /** Dequantized vector (array<double>) from int8 codes + scale. */
  def dequantize(codesCol: String, scaleCol: String): Column =
    expr(s"transform($codesCol, c -> cast(c as double) * $scaleCol)")

  /** Quantize an embeddings frame: id, scale, int8 codes. */
  def quantized(embeddings: DataFrame, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val (scale, q) = quantizeInt8(vecCol)
    embeddings
      .select(col(idCol), col(vecCol), nullif(scale, lit(0.0)).as("__qscale"))
      .select(col(idCol), col("__qscale").as("qscale"), q.as("codes"))
  }

  /** IVF (inverted-file) approximate top-k: coarse-quantize every vector to
    * its nearest of `nlist` centroids, then search only the query's
    * `nprobe` nearest lists. Work drops from O(n) dot products per query to
    * O(n/nlist · nprobe) — the standard ANN scale path when the corpus no
    * longer fits one scan per query.
    *
    * Centroids here are the `nlist` lowest-id vectors (deterministic,
    * self-contained); in production they come from a k-means job and the
    * assignment table is precomputed and bucketed on `cent_id`.
    */
  def ivfTopK(embeddings: DataFrame, query: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dot = graft.plans.Exprs.dot _
    val cents = broadcast(
      embeddings.orderBy(col(idCol)).limit(nlist)
        .select(col(idCol).as("cent_id"), col(vecCol).as("cv"),
          normExact(vecCol).as("cn")))
    val vecs = embeddings.select(col(idCol), col(vecCol).as("v"), normExact(vecCol).as("nrm"))
    val assignments = vecs
      .crossJoin(cents)
      .select(col(idCol), col("v"), col("nrm"), col("cent_id"),
        (dot(col("v"), col("cv")) / nullif(col("nrm") * col("cn"), lit(0.0))).as("ccos"))
      .groupBy(col(idCol))
      .agg(first(col("v")).as("v"), first(col("nrm")).as("nrm"),
        max_by(col("cent_id"), col("ccos")).as("cent_id"))
    val q = broadcast(query
      .select(col(idCol).as("qid"), col(vecCol).as("qv"), normExact(vecCol).as("qn")))
    val probeLists = broadcast(q
      .crossJoin(cents)
      .select(col("qid"), col("qv"), col("qn"), col("cent_id"),
        (dot(col("qv"), col("cv")) / nullif(col("qn") * col("cn"), lit(0.0))).as("ccos"))
      .orderBy(col("ccos").desc, col("cent_id"))
      .limit(nprobe))
    assignments
      .join(probeLists, "cent_id")
      .where(col(idCol) =!= col("qid"))
      .select(col(idCol),
        round(dotExact("v", "qv") / nullif(col("nrm") * col("qn"), lit(0.0)), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Bucketed near-neighbor pairs: same LSH signature ⇒ candidate; exact
    * cosine verifies. The groupBy key is the signature — candidate work is
    * Σ bucket², never corpus².
    */
  def cosinePairsBucketed(embeddings: DataFrame, threshold: Double, planes: Int = 12,
                          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sig = embeddings.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      normExact(vecCol).as("nrm"), lshSignature(vecCol, planes).as("sig"))
    val buckets = sig
      .groupBy(col("sig"))
      .agg(collect_list(struct(col("id"), col("v"), col("nrm"))).as("members"))
      .where(size(col("members")) > 1)
    buckets
      .select(explode(col("members")).as("a"), col("members"))
      .select(col("a"), explode(col("members")).as("b"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(dotExact("a.v", "b.v") / nullif(col("a.nrm") * col("b.nrm"), lit(0.0)), 6)
          .as("cosine"))
      .where(col("cosine") > threshold)
  }
}
