package graft.operators

import graft.util._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** North-star deduplication family (SURVEY.md §2 B.11): the operators a
  * 100 TB training-data pipeline runs over the `documents` table.
  *
  * Scale design:
  *   - exact dedup: single hash-shuffle on md5(text) — the canonical
  *     content-addressed dedup;
  *   - MinHash+LSH: shingle → 16-perm signature → 4 bands → bucket
  *     equi-join. Candidate generation is an EQUI-join on (band, hash), so
  *     it shuffles once and never goes quadratic; signature verification is
  *     a per-pair O(16) array op;
  *   - n-gram Jaccard: inverted-index similarity join with stop-gram
  *     pruning (grams in > maxDf docs dropped) — the standard guard that
  *     bounds per-gram pair fan-out at scale;
  *   - SimHash: 64-bit signature via higher-order expressions (no explode,
  *     no UDF), near-dup candidates by 16-bit chunk collision (Hamming ≤ 3
  *     ⟹ some 16-bit chunk equal, by pigeonhole);
  *   - embedding near-dup: probe-sampled cosine scan (probe side bounded →
  *     broadcast), the exact-check path LSH candidates would feed at scale.
  */
object Dedup {

  /** documents → (doc_id, toks) with word-3-gram shingles */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("grams",
        when(size(col("toks")) >= 3,
          expr("array_distinct(transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"))
          .otherwise(array(concat_ws(" ", col("toks")))))

  // ---- exact ----------------------------------------------------------
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .where(col("n_copies") > 1)
      .orderBy("keep_id")

  val dedupExactSql =
    """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY keep_id""".stripMargin

  // ---- MinHash + LSH --------------------------------------------------
  val MinhashPerms = 16
  val MinhashBands = 4 // 4 rows per band

  /** 16-permutation MinHash signatures via the native MinHashSig
    * expression (seeded murmur3 family, deterministic): a map-side
    * per-row projection — zero shuffles, unlike the explode → wide
    * min-aggregate form this replaces */
  def minhashSignatures(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    shingled(s, dir)
      .select(col("doc_id"),
        graft.functions.VectorExpressions.minhashSig(col("grams"), MinhashPerms).as("sig"))
  }

  /** Near-dup pairs: band buckets → in-bucket pair generation →
    * signature-overlap estimate. Bucket members collect into one list per
    * (band, hash) and pairs generate from it in place, so the signature
    * pipeline (shingle → explode → 16-min agg) runs ONCE — a bucket
    * self-join would recompute that whole subtree per side. Docs sharing a
    * bucket are near-dups by construction, so lists stay small; the
    * equi-grouping shuffles once on (band, hash). */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame = {
    val sigs = minhashSignatures(s, dir)
    val rows = MinhashPerms / MinhashBands
    val banded = sigs.select(col("doc_id"), col("sig"),
        posexplode(expr(s"transform(sequence(0, ${MinhashBands - 1}), b -> hash(slice(sig, b * $rows + 1, $rows)))"))
          .as(Seq("band", "bh")))
    val buckets = banded
      .groupBy("band", "bh")
      .agg(collect_list(struct(col("doc_id"), col("sig"))).as("ds"))
      .where(size(col("ds")) >= 2)
    buckets
      .select(col("ds"), posexplode(col("ds")).as(Seq("i", "a")))
      .select(col("a"), col("i"), posexplode(col("ds")).as(Seq("j", "b")))
      .where(col("j") > col("i"))
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("d1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("d2"),
        (expr("size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y), v -> v))").cast(DoubleType)
          / MinhashPerms).as("est_jaccard"))
      .distinct()
      .where(col("est_jaccard") >= 0.5)
      .orderBy("d1", "d2")
  }

  // ---- exact n-gram Jaccard similarity join ---------------------------
  val JaccardMaxDf = 50   // stop-gram pruning bound
  val JaccardThreshold = 0.5

  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    // inverted-index similarity join: ONE shuffle groups doc ids per gram;
    // stop-gram pruning (df > maxDf dropped) bounds the per-gram doc list,
    // so in-place pair generation is O(maxDf²) worst case per gram — no
    // big×big self-join, no window sort, no skew blowup at scale
    val byGram = shingled(s, dir)
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .groupBy("gram").agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .where(size(col("ds")).between(2, JaccardMaxDf))
    // two chained posexplodes (codegen'd Generate ops) beat a nested
    // higher-order lambda building struct arrays interpretively
    val pairRows = byGram
      .select(col("ds"), posexplode(col("ds")).as(Seq("i", "d1")))
      .select(col("d1"), col("i"), posexplode(col("ds")).as(Seq("j", "d2")))
      .where(col("j") > col("i"))
      .select("d1", "d2")
    val shared = pairRows.groupBy("d1", "d2").agg(count(lit(1)).as("shared"))
    // per-doc gram counts straight off the (un-exploded) shingle arrays
    val docSizes = shingled(s, dir).select(col("doc_id"), size(col("grams")).as("n_grams"))
    shared
      .join(docSizes.select(col("doc_id").as("d1"), col("n_grams").as("n1")), "d1")
      .join(docSizes.select(col("doc_id").as("d2"), col("n_grams").as("n2")), "d2")
      .select(col("d1"), col("d2"),
        r4(col("shared").cast(DoubleType) / (col("n1") + col("n2") - col("shared"))).as("jaccard"))
      .where(col("jaccard") >= JaccardThreshold)
      .orderBy("d1", "d2")
  }

  val dedupNgramJaccardSql =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |grams AS (
       |  SELECT doc_id, gram FROM (
       |    SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS gram
       |    FROM toks JOIN generate_series(1, 100000) g(i) ON i <= len(tk) - 2
       |    WHERE len(tk) >= 3
       |    UNION
       |    SELECT doc_id, array_to_string(tk, ' ') AS gram FROM toks WHERE len(tk) < 3)),
       |sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY 1),
       |pruned AS (SELECT doc_id, gram FROM (
       |  SELECT doc_id, gram, count(*) OVER (PARTITION BY gram) AS df FROM grams) x
       |  WHERE df <= $JaccardMaxDf),
       |shared AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
       |  FROM pruned a JOIN pruned b ON a.gram = b.gram AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT d1, d2, jaccard FROM (
       |  SELECT d1, d2, CAST(round(shared::DOUBLE / (n1.n_grams + n2.n_grams - shared), 4) AS DOUBLE) AS jaccard
       |  FROM shared JOIN sizes n1 ON shared.d1 = n1.doc_id
       |              JOIN sizes n2 ON shared.d2 = n2.doc_id) j
       |WHERE jaccard >= $JaccardThreshold ORDER BY d1, d2""".stripMargin

  // ---- SimHash --------------------------------------------------------
  /** 64-bit SimHash per doc via the native SimHashSig expression: each
    * token hashed once, per-bit ±1 sums in a local array — a map-side
    * projection with ZERO shuffles (the explode + 64-column aggregate form
    * this replaces shuffled every token row) */
  def simhashDocs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.VectorExpressions.simhashSig(split(col("text"), " ")).as("simhash"))
  }

  /** near-dup candidates: equal 16-bit chunk (pigeonhole for Hamming ≤ 3),
    * verified by exact popcount of XOR ≤ 3 */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val docs = simhashDocs(s, dir)
    val chunked = docs.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), c -> shiftright(simhash, c * 16) & 65535)"))
        .as(Seq("chunk", "cv")))
    val l = chunked.select(col("chunk"), col("cv"), col("doc_id").as("d1"), col("simhash").as("h1"))
    val r = chunked.select(col("chunk"), col("cv"), col("doc_id").as("d2"), col("simhash").as("h2"))
    l.join(r, Seq("chunk", "cv")).where(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), bit_count(expr("h1 ^ h2")).as("hamming"))
      .distinct()
      .where(col("hamming") <= 3)
      .orderBy("d1", "d2")
  }

  val queries: Map[String, Q] = Map(
    "q_dedup_exact" -> dedupExact _,
    "q_dedup_minhash" -> dedupMinhash _,
    "q_dedup_ngram_jaccard" -> dedupNgramJaccard _,
    "q_dedup_simhash" -> dedupSimhash _)

  val oracle: Map[String, String] = Map(
    "q_dedup_exact" -> dedupExactSql,
    "q_dedup_ngram_jaccard" -> dedupNgramJaccardSql)
}
