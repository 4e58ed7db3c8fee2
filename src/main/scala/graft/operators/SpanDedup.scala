package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level (span) deduplication — remove REPEATED TOKEN RUNS from
  * documents while keeping each run's first corpus occurrence, the
  * suffix-array dedup of Lee et al., "Deduplicating Training Data Makes
  * Language Models Better" (arXiv:2107.06499), approximated with stride-1
  * `k`-gram hashing: any repeated run of ≥ k tokens is a chain of repeated
  * k-grams, so marking every non-first occurrence of a repeated k-gram and
  * merging the marked [pos, pos+k) windows per document erases exactly the
  * repeated runs (up to k−1 boundary tokens), document order intact. This
  * complements document-level dedup ([[Dedup]]): it EDITS documents that
  * share long spans (boilerplate, quotes, licence blocks) instead of
  * dropping whole near-duplicates.
  *
  * Scale shape, stage by stage: gram occurrences are one explode (n − k + 1
  * rows per doc, like the decontamination grams); the repeated-gram
  * aggregation is a partial-aggregated groupBy on an 8-byte hash whose
  * map-side combine collapses the Zipf head; span merging is a per-document
  * window (gaps-and-islands) bounded by that doc's span count; removed
  * positions rejoin by (doc, pos) equi-join. Nothing is quadratic; the
  * whole pipeline is linear in token count — the same budget the corpus
  * already pays for MinHash shingles.
  *
  * Grouping runs on `xxhash64` of the gram text (the shuffle carries 8
  * bytes, not k tokens); a hash collision can only over-merge two span
  * families — at web scale (~10¹¹ grams) expected collisions are a handful
  * of tokens, the right trade for 5–10× less shuffle volume.
  */
object SpanDedup {

  /** Rewrite each document with every non-first occurrence of a repeated
    * `k`-token span removed. Returns (id, n_tokens, n_kept, text_clean);
    * a fully-boilerplate document survives as an empty string (its row is
    * the dedup evidence — dropping is the caller's call).
    */
  def dedupSpans(docs: DataFrame, k: Int = 8,
                 textCol: String = "text", idCol: String = "doc_id",
                 minCount: Long = 2L): DataFrame = {
    require(k >= 2, "span length k must be >= 2")
    val toks = docs.select(col(idCol), Dedup.tokens(textCol).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
    // stride-1 k-gram occurrences, 1-based positions
    val occ = toks.where(col("__n") >= k)
      .select(col(idCol), col("__toks"),
        explode(expr(s"sequence(1L, __n - ${k - 1}L)")).as("__pos"))
      .select(col(idCol), col("__pos"),
        xxhash64(array_join(slice(col("__toks"), col("__pos"), lit(k)), " ")).as("__gh"))
    // first occurrence = lexicographic min (doc, pos) — deterministic in
    // any engine; count and min merge in the same partial aggregate
    val families = occ.groupBy(col("__gh")).agg(
      count(lit(1)).as("__cnt"),
      min(struct(col(idCol).as("d"), col("__pos").as("p"))).as("__first"))
    val spans = occ.join(families.where(col("__cnt") >= minCount), "__gh")
      .where(!(col(idCol) === col("__first.d") && col("__pos") === col("__first.p")))
      .select(col(idCol), col("__pos").as("s"), (col("__pos") + lit(k.toLong)).as("e"))
    // merge overlapping/adjacent [s, e) spans per doc: gaps-and-islands
    // under a per-document window (bounded by that doc's span count)
    val w = Window.partitionBy(col(idCol)).orderBy(col("s"))
    val islands = spans
      .withColumn("__maxe", max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__brk", when(col("__maxe").isNull || col("s") > col("__maxe"), 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
    val removed = islands.select(col(idCol), explode(expr("sequence(s, e - 1)")).as("__pos"))
    // surviving tokens rebuild the document in original order
    val kept = toks
      .select(col(idCol), posexplode(col("__toks")).as(Seq("__p0", "__tok")))
      .select(col(idCol), (col("__p0") + 1).cast("long").as("__pos"), col("__tok"))
      .join(removed, Seq(idCol, "__pos"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("__pos"), col("__tok")))),
          x => x.getField("__tok")), " ").as("text_clean"))
    toks.select(col(idCol), col("__n").as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }
}
