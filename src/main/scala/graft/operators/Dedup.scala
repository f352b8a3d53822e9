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

  /** documents → (doc_id, toks, grams) with word-3-gram shingles via the
    * native WordNgrams expression (the interpreted HOF form profiled at
    * ~5 s of every downstream dedup query's time at sf0.1) */
  private def shingled(s: SparkSession, dir: String): DataFrame = {
    graft.functions.TextExpressions.register(s)
    // NOTE (r21): a fanOut here was tried and reverted — the native
    // word-shingle kernel is cheap per row and its partial aggregates
    // collapse map-side, so the extra exchange was pure overhead
    // (q_dedup_minhash +0.3 s, q_dedup_clusters +0.5 s at sf0.1)
    t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("grams",
        graft.functions.TextExpressions.wordNgrams(col("toks"), 3))
  }

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
  /** hot-bucket guard, mirroring [[SimhashMaxBucket]]: a (band, bh)
    * bucket bigger than this switches from all-pairs to REPRESENTATIVE
    * pairing — every member pairs with the bucket's min-doc_id member
    * only. Boilerplate-heavy corpora pile near-identical signatures into
    * one bucket; all-pairs there goes O(n²), but dropping the bucket
    * outright (the previous guard) silently lost the near-dup signal of
    * boilerplate VARIANTS that the exact-dedup pass can't catch. O(n)
    * rep pairs keep the bucket's members transitively connected — the
    * union-find view of dedup needs no more — at bounded cost. */
  val MinhashMaxBucket = 64

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
    // hot buckets: the pair-generation left side shrinks to the single
    // min-doc_id representative (sort_array — collect_list order is
    // nondeterministic), so the second explode emits n rows, not n²
    buckets
      .withColumn("nb", size(col("ds")))
      .withColumn("lhs", when(col("nb") <= MinhashMaxBucket, col("ds"))
        .otherwise(slice(sort_array(col("ds")), 1, 1)))
      .select(col("ds"), col("nb"), posexplode(col("lhs")).as(Seq("i", "a")))
      .select(col("a"), col("i"), col("nb"), posexplode(col("ds")).as(Seq("j", "b")))
      .where((col("nb") <= MinhashMaxBucket && col("j") > col("i"))
        || (col("nb") > MinhashMaxBucket && col("a.doc_id") < col("b.doc_id")))
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("d1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("d2"),
        (expr("size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y), v -> v))").cast(DoubleType)
          / MinhashPerms).as("est_jaccard"))
      .distinct()
      .where(col("est_jaccard") >= 0.5)
      .orderBy("d1", "d2")
  }

  /** Band/bucket mechanics of the LSH path under a CROSS-ENGINE hash
    * family (md5), so the full shingle → minhash → band → bucket →
    * candidate-count pipeline gets a hard DuckDB oracle — the production
    * path (dedupMinhash) keeps the native murmur3 MinHashSig, which DuckDB
    * cannot compute. Per band: collision buckets (≥ 2 docs) and the
    * candidate-pair total the in-bucket pair generator would emit.
    * Shape: ONE md5 per gram, then the textbook universal-hash family
    * sig_j = min((a_j·h + b_j) mod p) as 16 codegen'd min-aggregates in
    * one map-side-combined groupBy. (16 md5s per gram — HOF or wide-agg —
    * ran 8-9 s at sf0.1; one md5 + linear perms runs well under 1 s.) */
  val MinhashOracleP = 2147483647L // 2^31 - 1: products stay inside int64

  /** deterministic (a_j, b_j) perm constants, identical literals inlined
    * into the Spark plan and the DuckDB SQL */
  private def bandPerm(j: Int): (Long, Long) = {
    val a = (2654435761L * (j + 1)) % MinhashOracleP
    val b = (1779033703L * (j + 1)) % MinhashOracleP
    (if (a == 0) 1L else a, b)
  }

  /** (doc_id, s0..s15) md5 universal-hash MinHash signatures of a
    * (doc_id, gram) frame — the reusable signature kernel behind
    * [[md5Banded]] and the persisted [[writeMinhashIndex]] */
  private def md5SigsOf(g: DataFrame): DataFrame = {
    graft.functions.TextExpressions.register(g.sparkSession)
    val h = g.withColumn("h", graft.functions.TextExpressions
      .md5Prefix64(col("gram"), 15) % MinhashOracleP)
    val aggs = (0 until MinhashPerms).map { j =>
      val (a, b) = bandPerm(j)
      min((col("h") * a + b) % MinhashOracleP).as(s"s$j")
    }
    h.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** (doc_id, band, bh) from a signature frame — band hash = md5 of the
    * band's comma-joined signature rows */
  private def bandsOfSigs(sigs: DataFrame): DataFrame = {
    val rows = MinhashPerms / MinhashBands
    val bandCols = (0 until MinhashBands).map(b =>
      md5(concat_ws(",", (0 until rows).map(r => col(s"s${b * rows + r}").cast(StringType)): _*)))
    sigs.select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band", "bh")))
  }

  /** (doc_id, band, bh) under the cross-engine md5 universal-hash
    * family — the banded-signature frame shared by [[dedupMinhashBands]]
    * and [[dedupEval]] */
  private def md5Banded(s: SparkSession, dir: String): DataFrame =
    bandsOfSigs(md5SigsOf(shingled(s, dir)
      .select(col("doc_id"), explode(col("grams")).as("gram"))))

  def dedupMinhashBands(s: SparkSession, dir: String): DataFrame = {
    md5Banded(s, dir).groupBy("band", "bh").agg(count(lit(1)).as("n"))
      .where(col("n") >= 2)
      .groupBy("band")
      .agg(count(lit(1)).as("n_buckets"),
        sum(expr("(n * (n - 1)) div 2")).cast(LongType).as("n_pairs"))
      .orderBy("band")
  }

  /** CTE chain `hashes → sigs → bands` replaying the md5 universal-hash
    * band signatures in DuckDB — assumes a `grams(doc_id, gram)` CTE is
    * already in scope; shared by dedupMinhashBandsSql and dedupEvalSql */
  private val md5BandsCtes: String = {
    val rows = MinhashPerms / MinhashBands
    val sigCols = (0 until MinhashPerms).map { j =>
      val (a, b) = bandPerm(j)
      s"min((h * $a + $b) % $MinhashOracleP) AS s$j"
    }.mkString(",\n    ")
    val bandRows = (0 until MinhashBands).map { b =>
      val cat = (0 until rows).map(r => s"s${b * rows + r}::VARCHAR")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, md5($cat) AS bh FROM sigs"
    }.mkString("\n  UNION ALL\n  ")
    s"""hashes AS (
       |  SELECT doc_id, ('0x' || substr(md5(gram), 1, 15))::BIGINT % $MinhashOracleP AS h
       |  FROM grams),
       |sigs AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM hashes GROUP BY doc_id),
       |bands AS (
       |  $bandRows)""".stripMargin
  }

  val dedupMinhashBandsSql: String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |grams AS (
       |  SELECT doc_id, gram FROM (
       |    SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS gram
       |    FROM toks JOIN generate_series(1, 100000) g(i) ON i <= len(tk) - 2
       |    WHERE len(tk) >= 3
       |    UNION
       |    SELECT doc_id, array_to_string(tk, ' ') AS gram FROM toks WHERE len(tk) < 3)),
       |$md5BandsCtes,
       |buckets AS (SELECT band, bh, count(*) AS n FROM bands GROUP BY 1, 2)
       |SELECT band, count(*) AS n_buckets, (sum(n * (n - 1)) // 2)::BIGINT AS n_pairs
       |FROM buckets WHERE n >= 2 GROUP BY band ORDER BY band""".stripMargin

  // ---- exact n-gram Jaccard similarity join ---------------------------
  val JaccardMaxDf = 50   // stop-gram pruning bound
  val JaccardThreshold = 0.5
  /** gram-containment threshold on shared/min(n1,n2): a small doc pasted
    * inside a much larger one scores ~1 here while its union-normalized
    * Jaccard can sit below any usable near-dup threshold */
  val ContainmentThreshold = 0.8

  /** Shared front of the exact pairwise scorers ([[dedupNgramJaccard]],
    * [[dedupContainment]]): (d1, d2, shared, n1, n2) — shared distinct
    * 3-gram count per candidate pair plus both docs' distinct-gram sizes.
    *
    * Inverted-index similarity join: ONE shuffle groups doc ids per gram;
    * stop-gram pruning (df > maxDf dropped) bounds the per-gram doc list,
    * so in-place pair generation is O(maxDf²) worst case per gram — no
    * big×big self-join, no window sort, no skew blowup at scale.
    * The gram key that shuffles is the 60-bit md5-prefix BIGINT (the
    * cross-engine family of dedupMinhashBands / commonSpanRatio,
    * mirrored in the oracle CTE) — fixed 8 bytes instead of ~20-byte
    * 3-gram strings, cutting the inverted-index shuffle ~2-3×. A
    * within-doc 60-bit collision could emit a degenerate self-pair;
    * the d1 < d2 guard (also in the oracle's join condition) drops it. */
  private def sharedGramCounts(s: SparkSession, dir: String): DataFrame = {
    val byGram = shingled(s, dir)
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .select(col("doc_id"),
        graft.functions.TextExpressions.md5Prefix64(col("gram"), 15).as("gh"))
      .groupBy("gh").agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .where(size(col("ds")).between(2, JaccardMaxDf))
    // two chained posexplodes (codegen'd Generate ops) beat a nested
    // higher-order lambda building struct arrays interpretively
    val pairRows = byGram
      .select(col("ds"), posexplode(col("ds")).as(Seq("i", "d1")))
      .select(col("d1"), col("i"), posexplode(col("ds")).as(Seq("j", "d2")))
      .where(col("j") > col("i") && col("d1") < col("d2"))
      .select("d1", "d2")
    val shared = pairRows.groupBy("d1", "d2").agg(count(lit(1)).as("shared"))
    // per-doc gram counts straight off the (un-exploded) shingle arrays
    val docSizes = shingled(s, dir).select(col("doc_id"), size(col("grams")).as("n_grams"))
    shared
      .join(docSizes.select(col("doc_id").as("d1"), col("n_grams").as("n1")), "d1")
      .join(docSizes.select(col("doc_id").as("d2"), col("n_grams").as("n2")), "d2")
  }

  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    sharedGramCounts(s, dir)
      .select(col("d1"), col("d2"),
        r4(col("shared").cast(DoubleType) / (col("n1") + col("n2") - col("shared"))).as("jaccard"))
      .where(col("jaccard") >= JaccardThreshold)
      .orderBy("d1", "d2")

  /** Directional containment dedup — the near-dup class Jaccard
    * structurally misses: a quote, a syndicated article, or a whole small
    * doc pasted inside a larger one shares nearly all of the SMALL doc's
    * grams, but the union in Jaccard's denominator is dominated by the
    * large doc, so shared/union never clears the pair threshold. Scoring
    * shared/min(n1,n2) instead makes the score 1.0 for perfect subset
    * pairs regardless of the size ratio (Broder 1997's containment
    * coefficient, the resemblance/containment split). Emits the score
    * plus `contained` — the doc id of the smaller gram set, i.e. which
    * side a keep-the-superset policy would drop.
    *
    * Scale: identical plan shape to [[dedupNgramJaccard]] (the shared
    * inverted-index front is literally shared — [[sharedGramCounts]]),
    * so the same stop-gram-pruned single-shuffle bound applies. */
  def dedupContainment(s: SparkSession, dir: String): DataFrame =
    sharedGramCounts(s, dir)
      .select(col("d1"), col("d2"),
        r4(col("shared").cast(DoubleType) / least(col("n1"), col("n2"))).as("containment"),
        when(col("n1") <= col("n2"), col("d1")).otherwise(col("d2")).as("contained"))
      .where(col("containment") >= ContainmentThreshold)
      .orderBy("d1", "d2")

  /** The keep-the-superset policy APPLIED: the corpus minus every doc
    * flagged as the `contained` side of a ≥-threshold pair — the
    * actionable face of [[dedupContainment]], the way [[dedupApply]]
    * acts on the Jaccard clusters. Chains resolve consistently without
    * label propagation: in a ⊂ b ⊂ c every non-maximal element is the
    * `contained` side of at least one pair, so one anti-join keeps
    * exactly the maximal docs — no connected components needed (the
    * relation is directional, unlike near-dup similarity). Caveat, as
    * for probeGramIndexContainment's scores: the chain guarantee is up
    * to stop-gram pruning — a contained doc whose shared grams are ALL
    * corpus-frequent (df > [[JaccardMaxDf]]) forms no pair and
    * survives. Consistent across engine and oracle (both prune on the
    * same df), but "every non-maximal element drops" holds only for
    * overlap carried by non-stop grams.
    *
    * Scale: the pair frame's cost (bounded by the shared inverted-index
    * front) + ONE left-anti equi-join on doc_id. */
  def dedupContainmentApply(s: SparkSession, dir: String): DataFrame = {
    val drops = dedupContainment(s, dir).select(col("contained").as("doc_id"))
    t(s, dir, "documents")
      .join(drops, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** CTE chain ending in `shared(d1, d2, shared)` + `sizes` — the oracle
    * twin of [[sharedGramCounts]], reused by the Jaccard and containment
    * scorers */
  private val sharedGramCountsCte =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |grams AS (
       |  SELECT doc_id, gram FROM (
       |    SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS gram
       |    FROM toks JOIN generate_series(1, 100000) g(i) ON i <= len(tk) - 2
       |    WHERE len(tk) >= 3
       |    UNION
       |    SELECT doc_id, array_to_string(tk, ' ') AS gram FROM toks WHERE len(tk) < 3)),
       |sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY 1),
       |pruned AS (SELECT doc_id, gh FROM (
       |  SELECT doc_id, gh, count(*) OVER (PARTITION BY gh) AS df FROM (
       |    SELECT doc_id, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh FROM grams) g) x
       |  WHERE df <= $JaccardMaxDf),
       |shared AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
       |  FROM pruned a JOIN pruned b ON a.gh = b.gh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)""".stripMargin

  /** shared CTE chain ending in `pairs(d1, d2, jaccard)` — the oracle
    * core reused by dedupNgramJaccardSql and dedupClustersSql */
  private val jaccardPairsCte =
    s"""$sharedGramCountsCte,
       |pairs AS (SELECT d1, d2, jaccard FROM (
       |  SELECT d1, d2, CAST(round(shared::DOUBLE / (n1.n_grams + n2.n_grams - shared), 4) AS DOUBLE) AS jaccard
       |  FROM shared JOIN sizes n1 ON shared.d1 = n1.doc_id
       |              JOIN sizes n2 ON shared.d2 = n2.doc_id) j
       |  WHERE jaccard >= $JaccardThreshold)""".stripMargin

  val dedupNgramJaccardSql =
    s"""WITH $jaccardPairsCte
       |SELECT d1, d2, jaccard FROM pairs ORDER BY d1, d2""".stripMargin

  /** CTE `cdrops(doc_id)` = docs flagged as the contained side — shared
    * by the containment pair and apply oracles */
  private val containmentDropsCte =
    s"""cpairs AS (
       |  SELECT d1, d2, containment, contained FROM (
       |    SELECT d1, d2,
       |      CAST(round(shared::DOUBLE / least(n1.n_grams, n2.n_grams), 4) AS DOUBLE) AS containment,
       |      CASE WHEN n1.n_grams <= n2.n_grams THEN d1 ELSE d2 END AS contained
       |    FROM shared JOIN sizes n1 ON shared.d1 = n1.doc_id
       |                JOIN sizes n2 ON shared.d2 = n2.doc_id) c
       |  WHERE containment >= $ContainmentThreshold)""".stripMargin

  val dedupContainmentSql =
    s"""WITH $sharedGramCountsCte,
       |$containmentDropsCte
       |SELECT d1, d2, containment, contained FROM cpairs
       |ORDER BY d1, d2""".stripMargin

  val dedupContainmentApplySql =
    s"""WITH $sharedGramCountsCte,
       |$containmentDropsCte
       |SELECT doc_id, lang, source FROM documents
       |WHERE doc_id NOT IN (SELECT contained FROM cpairs)
       |ORDER BY doc_id""".stripMargin

  // ---- LSH candidate-quality evaluation -------------------------------
  /** Recall/precision of the LSH band-collision candidate set against the
    * exact n-gram Jaccard ground truth — the report a dedup rollout reads
    * before trusting MinHash at corpus scale: recall says how much true
    * near-dup mass band collision reaches, precision says how much
    * verification work the candidates waste. Candidates come from the
    * cross-engine md5-band path ([[md5Banded]], [[MinhashMaxBucket]]
    * representative-capped, exactly as production pair generation caps),
    * truth from [[dedupNgramJaccard]] — both sides are pinned by the same
    * DuckDB replay, so this is a hard-oracle query, not a spec estimate.
    *
    * Scale: both pair frames are the OUTPUT of bounded candidate
    * generation (bucketed equi-grouping, never all-pairs); they are
    * `localCheckpoint`ed because each feeds two consumers (its own count
    * and the intersection) and re-running the signature pipelines per
    * consumer is the expensive path. The final report is three 1-row
    * aggregates broadcast-crossed. */
  def dedupEval(s: SparkSession, dir: String): DataFrame = {
    val buckets = md5Banded(s, dir).groupBy("band", "bh")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .where(size(col("ds")) >= 2)
    // hot-bucket representative pairing, mirroring dedupMinhash: list is
    // sorted, so j > i already implies d1 < d2 in the all-pairs branch
    val cand = buckets
      .withColumn("nb", size(col("ds")))
      .withColumn("lhs", when(col("nb") <= MinhashMaxBucket, col("ds"))
        .otherwise(slice(col("ds"), 1, 1)))
      .select(col("ds"), col("nb"), posexplode(col("lhs")).as(Seq("i", "d1")))
      .select(col("d1"), col("i"), col("nb"), posexplode(col("ds")).as(Seq("j", "d2")))
      .where((col("nb") <= MinhashMaxBucket && col("j") > col("i"))
        || (col("nb") > MinhashMaxBucket && col("d1") < col("d2")))
      .select("d1", "d2")
      .distinct()
      .localCheckpoint()
    val truth = dedupNgramJaccard(s, dir).select("d1", "d2").localCheckpoint()
    val hits = cand.join(truth, Seq("d1", "d2"))
    cand.agg(count(lit(1)).as("n_candidates"))
      .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_truth"))))
      .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hits"))))
      .select(col("n_candidates"), col("n_truth"), col("n_hits"),
        when(col("n_truth") > 0,
          r4(col("n_hits").cast(DoubleType) / col("n_truth"))).as("recall"),
        when(col("n_candidates") > 0,
          r4(col("n_hits").cast(DoubleType) / col("n_candidates"))).as("precision"))
  }

  val dedupEvalSql: String =
    s"""WITH $jaccardPairsCte,
       |$md5BandsCtes,
       |bsz AS (SELECT band, bh, count(*) AS n, min(doc_id) AS mn
       |  FROM bands GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM bands a
       |  JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
       |  JOIN bsz s ON a.band = s.band AND a.bh = s.bh
       |  WHERE s.n <= $MinhashMaxBucket
       |  UNION
       |  SELECT s.mn AS d1, b.doc_id AS d2
       |  FROM bands b JOIN bsz s ON b.band = s.band AND b.bh = s.bh
       |  WHERE s.n > $MinhashMaxBucket AND b.doc_id <> s.mn),
       |m AS (SELECT
       |  (SELECT count(*) FROM cand) AS n_candidates,
       |  (SELECT count(*) FROM pairs) AS n_truth,
       |  (SELECT count(*) FROM cand c JOIN pairs p
       |     ON c.d1 = p.d1 AND c.d2 = p.d2) AS n_hits)
       |SELECT n_candidates::BIGINT AS n_candidates, n_truth::BIGINT AS n_truth,
       |  n_hits::BIGINT AS n_hits,
       |  CASE WHEN n_truth > 0
       |    THEN CAST(round(n_hits::DOUBLE / n_truth, 4) AS DOUBLE) END AS recall,
       |  CASE WHEN n_candidates > 0
       |    THEN CAST(round(n_hits::DOUBLE / n_candidates, 4) AS DOUBLE) END AS precision
       |FROM m""".stripMargin

  // ---- dedup clustering (pairs → connected components) ----------------
  /** Safety cap on propagation rounds. Rounds use pointer-doubling
    * (label-of-label alongside the neighbour min), so reach grows as
    * 2^(k+1)−1: the cap covers component diameters past 2 million, and
    * the loop EXITS EARLY the first round no label changes (one scalar
    * count per round) — a larger cap costs converged runs NOTHING.
    * Hitting the cap without converging raises IllegalStateException
    * rather than silently emitting non-minimal labels (the round-6
    * hazard: a fixed 16 plain rounds mislabeled components of diameter
    * > 17 with no error). Raised 16 → 20 in round 19: a 1.5M-node ER
    * scaling experiment produced a REAL (testdata-artifact-induced, but
    * structurally legitimate) near-critical chained component past the
    * old 131k-diameter reach — single-linkage chaining at 100 TB is a
    * data property, not only a malformed-input symptom, so the guard
    * should reject it later than the first plausible giant chain. */
  val ClusterIters = 20

  /** The step the pair generators feed at scale: near-dup PAIRS →
    * duplicate CLUSTERS (connected components), one keeper per cluster.
    * Built on the exact-oracled [[dedupNgramJaccard]] pairs so the whole
    * pipeline — shingle → inverted index → pairs → components — is
    * replayed in DuckDB (recursive CTE) and hash-checked.
    *
    * Scale shape: iterated min-label propagation — per round ONE
    * equi-join of the symmetric edge list against current labels and ONE
    * map-side-combined min-groupBy, both partitioned by doc id (scaling
    * key). Lineage is truncated (lazy localCheckpoint) on the pair list
    * AND on every round's labels: `labels` feeds the next round twice
    * (own label + neighbour lookup), so without truncation the Catalyst
    * tree doubles per round — 2^16 subtree copies by round 16 and the
    * analyzer never terminates. With it, every round plans over a
    * constant-size LogicalRDD leaf, the classic iterative-algorithm
    * shape (GraphX does the same). No driver-side graph state. */
  /** Labels memoized per (session, dir, input fingerprint) — the same
    * pattern as Similarity's trained codebook: `q_dedup_clusters` and
    * `q_dedup_apply` share one propagation run instead of each
    * re-deriving the pair graph, and a rewritten documents input
    * invalidates the entry. The cached frame's rounds are already
    * checkpoint-materialized, so reuse is a cheap scan. */
  private val labelsCache =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), (String, DataFrame, Option[org.apache.spark.rdd.RDD[_]])]()

  private def clusterLabels(s: SparkSession, dir: String): DataFrame =
    labelsCache.synchronized {
      val key = (s, dir)
      val fp = graft.util.inputFingerprint(dir, "documents.parquet")
      val cached = labelsCache.get(key)
      if (cached != null && cached._1 == fp) cached._2
      else {
        // a replaced entry's checkpoint blocks are unpersisted here, and
        // in clearLabelsCache, mirroring Similarity.clearCodebookCache —
        // otherwise the stale MEMORY_AND_DISK blocks linger until
        // ContextCleaner GC
        if (cached != null)
          cached._3.foreach(r => try r.unpersist(false) catch { case _: Throwable => })
        val (labels, ckpt) = propagateMinLabelTracked(
          dedupNgramJaccard(s, dir).select("d1", "d2"))
        labelsCache.put(key, (fp, labels, ckpt))
        labels
      }
    }

  /** the persisted block set behind a localCheckpoint'd frame, so rounds
    * a later round has materialized past can be unpersisted explicitly */
  private def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** Min-label propagation over an undirected pair list (d1, d2) →
    * (doc_id, cluster_id). EXACT for every component: each round takes
    * the min over (own label, neighbour labels, label-of-label), so the
    * pointer-doubling term doubles reach per round and any component of
    * diameter < 2^([[ClusterIters]]+1) converges; the loop stops the
    * first round zero labels change (one scalar count per round — the
    * action an iterative graph algorithm is allowed) and raises if the
    * cap is somehow hit unconverged instead of returning wrong labels.
    * Property-tested against union-find on random graphs plus long-path
    * graphs far past the old fixed-iteration diameter bound. Kept
    * separate from the Jaccard front so the graph algorithm is testable
    * on arbitrary edge sets. */
  private[graft] def propagateMinLabel(pairs: DataFrame): DataFrame =
    propagateMinLabelTracked(pairs)._1

  /** as [[propagateMinLabel]], also returning the final round's
    * checkpoint block set so callers that memoize the frame can
    * unpersist it on invalidation. Superseded rounds are unpersisted
    * inside the loop as soon as the next round materializes — peak
    * storage is two rounds of labels, not [[ClusterIters]]. */
  private[graft] def propagateMinLabelTracked(
      pairs: DataFrame): (DataFrame, Option[org.apache.spark.rdd.RDD[_]]) = {
    // NOTE (r21): running this loop with AQE disabled was tried and
    // REVERTED — static planning loses the runtime SMJ→BHJ conversions
    // the per-round joins and the pair-front materialization depend on
    // (q_entity_golden 3.9 → 19.5 s, q_dedup_clusters 1.4 → 46 s at
    // sf0.1). The per-round stage-job scheduling AQE adds is the cheaper
    // of the two costs; details in OPTIMIZATION_r21.md.
    val p = pairs.localCheckpoint(false)
    val edges = p.union(p.select(col("d2").as("d1"), col("d1").as("d2")))
    var labels = edges.groupBy(col("d1")).agg(min(col("d2")).as("mn"))
      .select(col("d1").as("doc_id"), least(col("d1"), col("mn")).as("cluster_id"))
    var prevCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    var converged = false
    var round = 0
    while (!converged && round < ClusterIters) {
      round += 1
      val viaNbr = edges
        .join(labels.select(col("doc_id").as("d2"), col("cluster_id").as("nbl")), "d2")
        .groupBy(col("d1").as("doc_id")).agg(min(col("nbl")).as("nbl"))
      // pointer doubling: my label's OWN current label — labels only
      // ever hold ids of nodes in the same component, so the lookup is
      // a self equi-join on the label value
      val lookup = labels.select(col("doc_id").as("lk"), col("cluster_id").as("ll"))
      val next = labels.join(viaNbr, Seq("doc_id"), "left")
        .join(lookup, col("cluster_id") === col("lk"), "left")
        .select(col("doc_id"), col("cluster_id").as("prev"),
          least(col("cluster_id"),
            coalesce(col("nbl"), col("cluster_id")),
            coalesce(col("ll"), col("cluster_id"))).as("cluster_id"))
        .localCheckpoint(false)
      // the count materializes this round's checkpoint (constant-size
      // LogicalRDD leaf — `labels` feeds three plan branches per round,
      // so without truncation the Catalyst tree grows geometrically)
      val changed = next.where(col("cluster_id") =!= col("prev")).count()
      prevCkpt.foreach(r => try r.unpersist(false) catch { case _: Throwable => })
      prevCkpt = checkpointRdd(next)
      labels = next.select(col("doc_id"), col("cluster_id"))
      converged = changed == 0L
    }
    if (!converged)
      throw new IllegalStateException(
        s"label propagation did not converge within $ClusterIters pointer-doubling rounds " +
          s"(diameter ≥ 2^${ClusterIters + 1}) — malformed edge list?")
    // the final labels are materialized; the symmetric edge list is dead
    checkpointRdd(p).foreach(r => try r.unpersist(false) catch { case _: Throwable => })
    (labels, prevCkpt)
  }

  /** unpersist and drop every cached label frame (test/teardown hook;
    * Bench calls it before each measured run so propagation cost lands
    * in the query that incurs it, not in whichever cluster-family query
    * happens to run first) */
  def clearLabelsCache(): Unit = labelsCache.synchronized {
    labelsCache.forEach { (_, v) =>
      v._3.foreach(r => try r.unpersist(false) catch { case _: Throwable => })
    }
    labelsCache.clear()
  }

  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    clusterLabels(s, dir).orderBy("doc_id")

  /** Components over the MINHASH pair generator — the production-scale
    * pairing (LSH candidates → verified pairs → clusters) through the
    * same propagation core as [[dedupClusters]], whose recursive-CTE
    * oracle pins the graph mechanics. Oracle-free like its pair source
    * (MinHash candidates are probabilistic); the planted-dup spec pins
    * the components. */
  def dedupMinhashClusters(s: SparkSession, dir: String): DataFrame =
    propagateMinLabel(dedupMinhash(s, dir).select("d1", "d2")).orderBy("doc_id")

  val dedupClustersSql =
    s"""WITH RECURSIVE $jaccardPairsCte,
       |edges AS (SELECT d1, d2 FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
       |reach(v, l) AS (
       |  SELECT DISTINCT d1, d1 FROM edges
       |  UNION
       |  SELECT e.d1, r.l FROM edges e JOIN reach r ON r.v = e.d2)
       |SELECT v AS doc_id, min(l)::BIGINT AS cluster_id
       |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin

  /** The last mile of the dedup pipeline: apply the clusters to the
    * corpus — every doc that is a NON-keeper member of a duplicate
    * cluster (keeper = the cluster's min doc_id, i.e. its label) is
    * dropped; everything else (keepers + never-duplicated docs) stays.
    * One broadcast-size anti-join at this SF; at 100 TB the drop list
    * shuffles on doc_id — the same scaling key as everything upstream.
    * Output keeps (doc_id, lang, source) so the oracle pins that the
    * surviving corpus, not just the drop count, is identical. */
  /** surviving corpus rows (ALL document columns) after cluster-keeper
    * dedup — the frame the composed curation pipeline
    * ([[Curate.curateE2e]]) chains from; [[dedupApply]] is its declared
    * projection. Unordered: intermediate frames don't pay sorts. */
  def dedupSurvivors(s: SparkSession, dir: String): DataFrame = {
    val drops = clusterLabels(s, dir)
      .where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    t(s, dir, "documents").join(drops, Seq("doc_id"), "left_anti")
  }

  def dedupApply(s: SparkSession, dir: String): DataFrame =
    dedupSurvivors(s, dir)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")

  /** WITH-RECURSIVE chain ending in `surv` = the surviving documents
    * (all columns) — shared by dedupApplySql and the composed-pipeline
    * oracle ([[Curate.curateE2eSql]]) */
  private[operators] val survivorsCte =
    s"""WITH RECURSIVE $jaccardPairsCte,
       |edges AS (SELECT d1, d2 FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
       |reach(v, l) AS (
       |  SELECT DISTINCT d1, d1 FROM edges
       |  UNION
       |  SELECT e.d1, r.l FROM edges e JOIN reach r ON r.v = e.d2),
       |clusters AS (SELECT v AS doc_id, min(l) AS cluster_id FROM reach GROUP BY 1),
       |drops AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id),
       |surv AS (SELECT * FROM documents
       |         WHERE doc_id NOT IN (SELECT doc_id FROM drops))""".stripMargin

  val dedupApplySql =
    s"""$survivorsCte
       |SELECT doc_id, lang, source FROM surv ORDER BY doc_id""".stripMargin

  /** Dedup observability — the first thing an operator looks at after a
    * run: the cluster SIZE HISTOGRAM (how many duplicate clusters of 2,
    * of 3, …). A heavy tail here means boilerplate/templating upstream;
    * a sudden shift between ingests means the pair generator's caps are
    * saturating. Rides the memoized labels (clusters/apply/sizes share
    * one propagation per session) + two map-side-combined groupBys on
    * scaling keys (cluster_id, then the tiny size domain). */
  def dedupClusterSizes(s: SparkSession, dir: String): DataFrame =
    clusterLabels(s, dir)
      .groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
      .groupBy("n_members").agg(count(lit(1)).as("n_clusters"))
      .orderBy("n_members")

  val dedupClusterSizesSql =
    s"""WITH RECURSIVE $jaccardPairsCte,
       |edges AS (SELECT d1, d2 FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
       |reach(v, l) AS (
       |  SELECT DISTINCT d1, d1 FROM edges
       |  UNION
       |  SELECT e.d1, r.l FROM edges e JOIN reach r ON r.v = e.d2),
       |clusters AS (SELECT v AS doc_id, min(l) AS cluster_id FROM reach GROUP BY 1),
       |csizes AS (SELECT cluster_id, count(*) AS n_members FROM clusters GROUP BY 1)
       |SELECT n_members, count(*) AS n_clusters FROM csizes
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Quality-aware keeper selection — the production variant of
    * [[dedupApply]]: instead of keeping each duplicate cluster's min
    * doc_id (an arbitrary-but-deterministic policy), keep its
    * HIGHEST-QUALITY member (ties → min doc_id), the policy real
    * curation pipelines use so dedup never discards the best copy of a
    * boilerplate family. Same output contract as `q_dedup_apply`
    * (surviving doc_id/lang/source), so the two keeper policies diff
    * directly.
    *
    * Scale shape: cluster members are a small fraction of the corpus;
    * scoring joins them to `documents` on doc_id (scaling key), keeper
    * election is ONE map-side-combined `max_by` groupBy on cluster_id —
    * no window, no sort — carrying a (quality, -doc_id) struct so the
    * tie-break is total and engine-independent (quality is 4-dp rounded
    * on both sides). Rides the memoized propagation labels like the
    * rest of the cluster family. */
  def dedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val members = clusterLabels(s, dir)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("cluster_id"),
        TextAnalysis.qualityCol(col("text"), split(col("text"), " ")).as("quality"))
    val keepers = members.groupBy("cluster_id")
      .agg(max_by(col("doc_id"),
        struct(col("quality"), (-col("doc_id")).as("nid"))).as("keeper"))
    val drops = members.join(keepers, "cluster_id")
      .where(col("doc_id") =!= col("keeper"))
      .select("doc_id")
    docs.join(drops, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  val dedupKeepBestSql =
    s"""WITH RECURSIVE $jaccardPairsCte,
       |edges AS (SELECT d1, d2 FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
       |reach(v, l) AS (
       |  SELECT DISTINCT d1, d1 FROM edges
       |  UNION
       |  SELECT e.d1, r.l FROM edges e JOIN reach r ON r.v = e.d2),
       |clusters AS (SELECT v AS doc_id, min(l) AS cluster_id FROM reach GROUP BY 1),
       |scored AS (SELECT c.doc_id, c.cluster_id,
       |  CAST(floor((
       |    least(1.0::DOUBLE, len(tk)::DOUBLE / 50.0::DOUBLE) * 0.4::DOUBLE
       |    + (len(list_distinct(tk))::DOUBLE / len(tk)) * 0.3::DOUBLE
       |    + least(1.0::DOUBLE, ((length(text) - (len(tk) - 1))::DOUBLE / len(tk)) / 8.0::DOUBLE) * 0.3::DOUBLE
       |    ) * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE AS DOUBLE) AS quality
       |  FROM clusters c JOIN (
       |    SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents) d
       |  ON c.doc_id = d.doc_id),
       |ranked AS (SELECT doc_id, row_number() OVER (
       |    PARTITION BY cluster_id ORDER BY quality DESC, doc_id) AS rn
       |  FROM scored),
       |bdrops AS (SELECT doc_id FROM ranked WHERE rn > 1)
       |SELECT doc_id, lang, source FROM documents
       |WHERE doc_id NOT IN (SELECT doc_id FROM bdrops) ORDER BY doc_id""".stripMargin

  /** Cross-source duplication matrix — the corpus-observability view of
    * the near-dup graph: how many near-dup pairs land within vs across
    * sources, and how strong they are. The standard question before
    * mixing crawls ("is source B just a mirror of source A?") answered
    * from the SAME pair list the dedup pipeline already computes, so the
    * matrix is consistent with what dedup will actually drop.
    *
    * Scale shape: pairs are a small fraction of the corpus (bounded by
    * the LSH/stop-gram caps upstream); the two source lookups are
    * equi-joins on doc_id (the scaling key), and the matrix aggregate is
    * map-side-combined down to |sources|² rows. The unordered pair key
    * (least, greatest) halves the matrix deterministically. avg strength
    * sums 4-dp-rounded jaccards as exact decimals (d4) — partition-order
    * independent, like every money aggregate here. */
  def dedupCrossSource(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "documents").select(col("doc_id"), col("source"))
    dedupNgramJaccard(s, dir)
      .join(src.select(col("doc_id").as("d1"), col("source").as("s1")), "d1")
      .join(src.select(col("doc_id").as("d2"), col("source").as("s2")), "d2")
      .select(least(col("s1"), col("s2")).as("source_a"),
        greatest(col("s1"), col("s2")).as("source_b"), col("jaccard"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"),
        r4f(sum(d4(col("jaccard"))).cast(DoubleType) / count(lit(1))).as("avg_jaccard"),
        r4(max(col("jaccard"))).as("max_jaccard"))
      .orderBy("source_a", "source_b")
  }

  val dedupCrossSourceSql =
    s"""WITH $jaccardPairsCte,
       |lab AS (SELECT least(a.source, b.source) AS source_a,
       |               greatest(a.source, b.source) AS source_b, jaccard
       |        FROM pairs JOIN documents a ON pairs.d1 = a.doc_id
       |                   JOIN documents b ON pairs.d2 = b.doc_id)
       |SELECT source_a, source_b, count(*) AS n_pairs,
       |  floor(CAST(sum(jaccard::DECIMAL(18,4)) AS DOUBLE) / count(*)
       |        * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE AS avg_jaccard,
       |  CAST(round(max(jaccard), 4) AS DOUBLE) AS max_jaccard
       |FROM lab GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- train/eval decontamination -------------------------------------
  /** benchmark-contamination check, the standard pretraining hygiene op:
    * for every EVAL doc (deterministic 1% slice, doc_id % 97 = 0), the
    * fraction of its word-3-grams that appear anywhere in the TRAIN split
    * (all other docs). Shape at scale: the distinct train-gram inverted
    * index is built once (one shuffle), eval grams left-semi join it (one
    * more shuffle on gram) — never doc×doc. An 8-hash Bloom filter
    * ([[decontaminateBloom]]) replaces the exact index when the gram
    * universe outgrows memory; the exact form here is the
    * oracle-checkable core. */
  val DecontamEvalMod = 97

  def decontaminate(s: SparkSession, dir: String): DataFrame =
    decontaminateMod(s, dir, DecontamEvalMod)

  /** eval split = doc_id % mod == 0 — parameterized so the spec can use a
    * denser eval split than the declared 1% key */
  def decontaminateMod(s: SparkSession, dir: String, mod: Int): DataFrame = {
    // no fanOut: the exact variant's gram semi-join collapses map-side
    // and the shingle shuffle cost a net +0.3 s at sf0.1 (the Bloom twin
    // keeps it — its per-gram k-position fold is the heavy consumer)
    val sh = shingled(s, dir)
    val evalDocs = sh.where(col("doc_id") % mod === 0)
    val evalG = evalDocs.select(col("doc_id"), explode(col("grams")).as("gram"))
    val trainG = sh.where(col("doc_id") % mod =!= 0)
      .select(explode(col("grams")).as("gram")).distinct()
    val hits = evalG.join(trainG, Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    evalDocs.select(col("doc_id"), size(col("grams")).cast(LongType).as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        r4f(coalesce(col("n_hit"), lit(0L)).cast(DoubleType) / col("n_grams")).as("contamination"))
      .orderBy("doc_id")
  }

  val decontaminateSql =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |grams AS (
       |  SELECT doc_id, gram FROM (
       |    SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS gram
       |    FROM toks JOIN generate_series(1, 100000) g(i) ON i <= len(tk) - 2
       |    WHERE len(tk) >= 3
       |    UNION
       |    SELECT doc_id, array_to_string(tk, ' ') AS gram FROM toks WHERE len(tk) < 3)),
       |train AS (SELECT DISTINCT gram FROM grams WHERE doc_id % $DecontamEvalMod <> 0),
       |sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams
       |          WHERE doc_id % $DecontamEvalMod = 0 GROUP BY 1),
       |hits AS (SELECT e.doc_id, count(*) AS n_hit
       |         FROM grams e JOIN train t USING (gram)
       |         WHERE e.doc_id % $DecontamEvalMod = 0 GROUP BY 1)
       |SELECT s.doc_id, s.n_grams, coalesce(h.n_hit, 0) AS n_hit,
       |  floor(coalesce(h.n_hit, 0)::DOUBLE / s.n_grams * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE AS contamination
       |FROM sizes s LEFT JOIN hits h USING (doc_id) ORDER BY s.doc_id""".stripMargin

  // ---- Bloom-filter decontamination ------------------------------------
  /** Bloom twin of [[decontaminate]] for when the distinct train-gram
    * index outgrows memory — at 100 TB that index is the biggest state in
    * the pipeline, while the filter below is a FIXED-size bit array
    * whatever the corpus size. Same output schema; n_hit can only be
    * INFLATED (no false negatives), never deflated, and the spec bounds
    * the inflation.
    *
    * Distributed build, no driver-side sketch: each train gram maps to
    * [[BloomHashes]] bit positions (Kirsch–Mitzenmacher double hashing
    * from two xxhash64 values, reduced mod m BEFORE the i·h2 multiply so
    * ANSI-mode int64 arithmetic cannot overflow), positions fold into
    * 64-bit words via one map-side-combined bit_or groupBy — the shuffle
    * is bounded by partitions × m/64 rows regardless of corpus size. The
    * probe side explodes each eval gram to its k (word, bit) lookups and
    * equi-joins the broadcast word table (m/64 ≤ 128 Ki rows = ~1 MiB). */
  val BloomBits: Long = 1L << 23 // m: 8 Mi bits
  val BloomHashes = 8            // k
  private val BloomSeed = 0x9e3779b9L // second-hash salt (golden ratio)

  /** (…, gram) → (…, i, pos): the k bit positions of `gram` */
  private def explodeBloomPositions(df: DataFrame, keep: Seq[String]): DataFrame =
    df.withColumn("h1", pmod(xxhash64(col("gram")), lit(BloomBits)))
      // 1 .. m-1: a zero stride would degenerate all k probes to h1
      .withColumn("h2", pmod(xxhash64(lit(BloomSeed), col("gram")), lit(BloomBits - 1)) + lit(1L))
      .select(keep.map(col) :+ posexplode(expr(
        s"transform(sequence(0, ${BloomHashes - 1}), i -> pmod(h1 + i * h2, ${BloomBits}L))"))
        .as(Seq("i", "pos")): _*)

  def decontaminateBloom(s: SparkSession, dir: String): DataFrame =
    decontaminateBloomMod(s, dir, DecontamEvalMod)

  /** The frame-parameterized Bloom gate core shared by
    * [[decontaminateBloomMod]] and `CorpusOps.splitLeakageBloom`:
    * `trainGrams` = one `gram` column (duplicates fine — the bit_or
    * absorbs them), `evalDocs` = (doc_id, grams) with per-doc distinct
    * gram arrays. Returns (doc_id, n_grams, n_hit) where n_hit ≥ the
    * exact semi-join count (no false negatives, bounded inflation). */
  private[operators] def bloomGramHits(trainGrams: DataFrame,
      evalDocs: DataFrame): DataFrame =
    // build: train grams → bit positions → 64-bit words (one groupBy,
    // map-side combined; ≤ m/64 result rows by construction)
    bloomProbeHits(bloomWordsOf(trainGrams), evalDocs)

  /** probe half: a gram is (maybe) in train iff ALL k probed bits are
    * set in the (broadcast) word table. Shared by the self-contained
    * gates and the persisted-index probe. */
  private def bloomProbeHits(words: DataFrame, evalDocs: DataFrame): DataFrame = {
    val probed = explodeBloomPositions(
        evalDocs.select(col("doc_id"), explode(col("grams")).as("gram")),
        keep = Seq("doc_id", "gram"))
      .withColumn("widx", expr("pos div 64"))
      .join(broadcast(words), Seq("widx"), "left")
      .withColumn("hit",
        coalesce(expr("(word & shiftleft(1L, cast(pmod(pos, 64) AS INT))) != 0"), lit(false)))
      .groupBy("doc_id", "gram")
      .agg(min(col("hit").cast(IntegerType)).as("all_set"))
    val hits = probed.where(col("all_set") === 1)
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    evalDocs.select(col("doc_id"), size(col("grams")).cast(LongType).as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
  }

  def decontaminateBloomMod(s: SparkSession, dir: String, mod: Int): DataFrame = {
    val sh = fanOut(shingled(s, dir), col("doc_id")) // decontaminateMod discipline
    bloomGramHits(
        sh.where(col("doc_id") % mod =!= 0).select(explode(col("grams")).as("gram")),
        sh.where(col("doc_id") % mod === 0))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        r4f(col("n_hit").cast(DoubleType) / col("n_grams")).as("contamination"))
      .orderBy("doc_id")
  }

  // ---- persisted Bloom index (at-rest decontamination gate) -------------
  /** Persist the train-gram Bloom word table — the LAST gate family to
    * get an at-rest story (gram/SimHash/MinHash/substring/semantic all
    * have one): `words/` is ≤ m/64 (widx, word) rows = ~1 MiB at the
    * shipped m, whatever the corpus size, so the live decontamination
    * gate never re-shingles the train corpus per batch. Appends are the
    * cheapest of any index family: a Bloom filter is a pure OR-monoid,
    * so `append` just writes MORE word rows and every reader bit_or-
    * merges per widx on load — existing bytes never rewrite, no df
    * sidecar, no cap drift. meta/ pins (m_bits, k); a probe against an
    * index built under different dials throws rather than silently
    * hashing into the wrong bit space. */
  def writeBloomIndex(s: SparkSession, dir: String, indexPath: String,
      mod: Int = DecontamEvalMod): Unit = {
    val train = shingled(s, dir)
      .where(col("doc_id") % mod =!= 0).select(explode(col("grams")).as("gram"))
    // meta BEFORE words: a crash mid-build then leaves meta-without-words
    // (probe fails loudly on the missing words/ path) instead of
    // words-without-meta (which requireBloomDials refuses but can't
    // distinguish from a foreign directory)
    writeIndexMetaAll(s, indexPath,
      Seq("m_bits" -> BloomBits, "k" -> BloomHashes.toLong))
    bloomWordsOf(train)
      .write.mode("overwrite").parquet(s"$indexPath/words")
  }

  /** word-table fold shared by build and append */
  private def bloomWordsOf(trainGrams: DataFrame): DataFrame =
    explodeBloomPositions(trainGrams.select(col("gram")), keep = Seq.empty)
      .groupBy(expr("pos div 64").as("widx"))
      .agg(expr("bit_or(shiftleft(1L, cast(pmod(pos, 64) AS INT)))").as("word"))

  /** OR a new batch's grams into the filter: append-only word rows;
    * readers merge per widx. Caller contract matches the other index
    * appends: `docs` = (doc_id, text) rows newly admitted to train.
    * Each append adds files (the logical table stays capped at m/64
    * rows but the PHYSICAL row/file count grows per batch), so a
    * high-frequency ingest loop should run
    * [[IndexMaintenance.compactBloomIndex]] on the same cadence as the
    * other families — it bit_or-folds words/ back to one row per widx,
    * which is exactly the merge every reader performs, so probe bits
    * are identical by construction. */
  def appendBloomIndex(s: SparkSession, indexPath: String,
      docs: DataFrame): Unit = {
    graft.functions.TextExpressions.register(s)
    requireBloomDials(s, indexPath)
    val grams = docs
      .select(split(col("text"), " ").as("toks"))
      .select(explode(graft.functions.TextExpressions.wordNgrams(col("toks"), 3))
        .as("gram"))
    bloomWordsOf(grams).write.mode("append").parquet(s"$indexPath/words")
  }

  /** Unlike the other families' guards, absent meta/ here is an ERROR,
    * not a legacy default: the Bloom family has written meta/ since its
    * first release, so a path without it is a partially written or
    * foreign directory — probing it under assumed dials would hash into
    * an arbitrary bit space and return confident garbage. */
  private def requireBloomDials(s: SparkSession, indexPath: String): Unit = {
    if (!new java.io.File(s"$indexPath/meta").exists)
      throw new IllegalStateException(
        s"bloom index at $indexPath has no meta/ sidecar — every Bloom index " +
          "build writes one, so this path is partially written or not a Bloom " +
          "index; refusing to probe/append under assumed dials")
    val m = readIndexMeta(s, indexPath, "m_bits", BloomBits)
    val k = readIndexMeta(s, indexPath, "k", BloomHashes.toLong)
    if (m != BloomBits || k != BloomHashes.toLong)
      throw new IllegalStateException(
        s"bloom index at $indexPath built with m_bits=$m k=$k; this build " +
          s"hashes with m_bits=$BloomBits k=$BloomHashes — rebuild the index")
  }

  /** Probe ARBITRARY documents (doc_id, text) against the persisted
    * filter — same output schema as [[decontaminateBloom]]; the word
    * table loads with one per-widx bit_or merge (absorbing appends) and
    * broadcasts, so a probe's only corpus-sized work is its OWN batch's
    * shingling. Feeds `Pipeline.streamDecontaminate` per micro-batch. */
  def probeBloomIndex(s: SparkSession, docs: DataFrame,
      indexPath: String): DataFrame = {
    graft.functions.TextExpressions.register(s)
    requireBloomDials(s, indexPath)
    val words = s.read.parquet(s"$indexPath/words")
      .groupBy("widx").agg(expr("bit_or(word)").as("word"))
    val evalDocs = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        graft.functions.TextExpressions.wordNgrams(col("toks"), 3).as("grams"))
    bloomProbeHits(words, evalDocs)
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        r4f(col("n_hit").cast(DoubleType) / col("n_grams")).as("contamination"))
  }

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

  /** hot-bucket guard: a (chunk, cv) bucket bigger than this switches
    * from all-pairs to representative pairing (every member vs the
    * min-doc_id member) — same rationale as [[MinhashMaxBucket]]:
    * degenerate content (boilerplate, near-empty docs) piles signatures
    * into one key; O(n) rep pairs keep the members transitively
    * connected without the O(n²) blowup, and unlike dropping the bucket
    * they preserve the near-dup signal of boilerplate variants.
    *
    * 256, not MinHash's 64: SimHash buckets its 4 signature chunks into
    * only 2^15-2^16 keys (vs MinHash's 16-byte band hashes), so real
    * corpora pack buckets much denser — the round-12 CapSweep measured
    * incremental recall 0.78 at 10× density under 64 and named 256 the
    * sweet spot (+18 pts recall for +8% index rows); at 256 the
    * worst-case in-bucket pair fan-out is still a bounded 32,640. */
  val SimhashMaxBucket = 256

  /** near-dup candidates: equal 16-bit chunk (pigeonhole for Hamming ≤ 3),
    * verified by exact popcount of XOR ≤ 3. Bucket members collect into
    * one list per (chunk, cv) and pairs generate in place — the signature
    * projection runs once (a self-join recomputed it per side), the single
    * shuffle is the (chunk, cv) grouping, and the SimhashMaxBucket guard
    * caps in-bucket pair fan-out so one degenerate key can't go O(n²). */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val docs = simhashDocs(s, dir)
    val chunked = docs.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), c -> shiftright(simhash, c * 16) & 65535)"))
        .as(Seq("chunk", "cv")))
    val buckets = chunked
      .groupBy("chunk", "cv")
      .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("ds"))
      .where(size(col("ds")) >= 2)
    buckets
      .withColumn("nb", size(col("ds")))
      .withColumn("lhs", when(col("nb") <= SimhashMaxBucket, col("ds"))
        .otherwise(slice(sort_array(col("ds")), 1, 1)))
      .select(col("ds"), col("nb"), posexplode(col("lhs")).as(Seq("i", "a")))
      .select(col("a"), col("i"), col("nb"), posexplode(col("ds")).as(Seq("j", "b")))
      .where((col("nb") <= SimhashMaxBucket && col("j") > col("i"))
        || (col("nb") > SimhashMaxBucket && col("a.doc_id") < col("b.doc_id")))
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("d1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("d2"),
        bit_count(expr("a.simhash ^ b.simhash")).as("hamming"))
      .distinct()
      .where(col("hamming") <= 3)
      .orderBy("d1", "d2")
  }

  /** Chunk/bucket mechanics of the SimHash path under a CROSS-ENGINE hash
    * family — the md5 analog of dedupMinhashBands. A 60-bit signature
    * (15 hex digits of md5 per token; per-bit ±1 occurrence sums, bit set
    * when the sum is ≥ 0) splits into four 15-bit chunks; per chunk the
    * oracle checks collision-bucket and candidate-pair counts. The
    * production path keeps the native murmur3 SimHashSig; this twin
    * hard-oracles the pigeonhole bucketing that the planted-dup spec can
    * only sample. */
  /** md5 60-bit SimHash signatures per doc — the cross-engine hash family
    * shared by [[dedupSimhashChunks]] (bucket mechanics),
    * [[dedupSimhashEval]] (candidate quality), and the persisted
    * [[writeSimhashIndex]]/[[probeSimhashIndex]] pair. One map-side
    * native expression per row ([[graft.functions.SimHashSigMd5]]) —
    * numerically identical to the explode → md5-per-token → 60
    * bit-vote sum-aggregates formulation the DuckDB CTEs replay, with
    * zero explode and zero shuffle (every token of a doc is already in
    * the doc's own row). */
  private def md5SimhashSigsOf(docs: DataFrame): DataFrame = {
    graft.functions.VectorExpressions.register(docs.sparkSession)
    docs.select(col("doc_id"), graft.functions.VectorExpressions
      .simhashSigMd5(split(col("text"), " ")).as("sig"))
  }

  private def md5SimhashSigs(s: SparkSession, dir: String): DataFrame =
    md5SimhashSigsOf(t(s, dir, "documents"))

  def dedupSimhashChunks(s: SparkSession, dir: String): DataFrame = {
    val chunked = md5SimhashSigs(s, dir).select(col("doc_id"),
      posexplode(expr(
        "transform(sequence(0, 3), c -> shiftright(sig, c * 15) & 32767)"))
        .as(Seq("chunk", "cv")))
    chunked.groupBy("chunk", "cv").agg(count(lit(1)).as("n"))
      .where(col("n") >= 2)
      .groupBy("chunk")
      .agg(count(lit(1)).as("n_buckets"),
        sum(expr("(n * (n - 1)) div 2")).cast(LongType).as("n_pairs"))
      .orderBy("chunk")
  }

  /** shared DuckDB CTE chain: tok → 60 bit sums → 60-bit md5 sigs →
    * 4×15-bit chunks — the oracle twin of [[md5SimhashSigs]] + chunking */
  private val simhashChunkedCtes: String = {
    val bitCols = (0 until 60)
      .map(b => s"sum((h >> $b) % 2 * 2 - 1) AS s$b").mkString(",\n    ")
    val sigExpr = (0 until 60)
      .map(b => s"(CASE WHEN s$b >= 0 THEN 1::BIGINT ELSE 0::BIGINT END << $b)")
      .mkString(" + ")
    s"""tok AS (
       |  SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::BIGINT AS h
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents) x),
       |bits AS (
       |  SELECT doc_id,
       |    $bitCols
       |  FROM tok GROUP BY doc_id),
       |sigs AS (SELECT doc_id, $sigExpr AS sig FROM bits),
       |chunked AS (
       |  SELECT doc_id, sig, c AS chunk, (sig >> (c * 15)) & 32767 AS cv
       |  FROM sigs CROSS JOIN generate_series(0, 3) g(c))""".stripMargin
  }

  val dedupSimhashChunksSql: String =
    s"""WITH $simhashChunkedCtes,
       |buckets AS (SELECT chunk, cv, count(*) AS n FROM chunked GROUP BY 1, 2)
       |SELECT chunk, count(*) AS n_buckets, (sum(n * (n - 1)) // 2)::BIGINT AS n_pairs
       |FROM buckets WHERE n >= 2 GROUP BY chunk ORDER BY chunk""".stripMargin

  // ---- band-index bucket observability --------------------------------

  /** Bucket-occupancy profile of BOTH band families on the cross-engine
    * md5 hash family — the observability the cap-tuning dial needs
    * (PERF.md's cap sweep showed recall is bought back by raising the
    * cap on the hot tail; this query is how a deployment SEES that tail
    * without running a sweep). One row per family with exact integer
    * stats over its bucket-size distribution: how many buckets exist,
    * how full they are, how many singletons carry no dedup signal, and —
    * the tuning signal — how many buckets exceed the write-time cap and
    * how many entries the truncation would drop. Everything is counts,
    * so the DuckDB replay is float-free.
    *
    * Scale shape: per family ONE (key) groupBy to bucket sizes (map-side
    * combined) then one 2-row aggregate — the same shuffles the band
    * builds themselves pay, no pair generation anywhere.
    *
    * The `cap` column is the REFERENCE constant ([[MinhashMaxBucket]] /
    * [[SimhashMaxBucket]]), a fixed oracle-replayable yardstick — the
    * cap a DEFAULT index build actually applies is density-DERIVED
    * ([[derivedCapOf]]) and persisted in that index's `meta/`; read it
    * there, or run `tools.CapSweep … auto` to price it. */
  def dedupBucketStats(s: SparkSession, dir: String): DataFrame = {
    val mh = md5Banded(s, dir)
      .groupBy("band", "bh").agg(count(lit(1)).as("n"))
      .select(lit("minhash").as("family"), col("n"),
        lit(MinhashMaxBucket.toLong).as("cap"))
    val sh = md5SimhashSigs(s, dir).select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, 3), c -> shiftright(sig, c * 15) & 32767)"))
          .as(Seq("chunk", "cv")))
      .groupBy("chunk", "cv").agg(count(lit(1)).as("n"))
      .select(lit("simhash").as("family"), col("n"),
        lit(SimhashMaxBucket.toLong).as("cap"))
    mh.unionByName(sh)
      .groupBy("family")
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("n")).as("n_entries"),
        max(col("n")).as("max_size"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_singletons"),
        sum(when(col("n") > col("cap"), 1L).otherwise(0L)).as("n_over_cap"),
        sum(when(col("n") > col("cap"), col("n") - col("cap")).otherwise(0L))
          .as("entries_over_cap"))
      .orderBy("family")
  }

  /** both families replayed in scoped sub-WITHs (each chain defines its
    * own `sigs` CTE, so they cannot share one WITH list) */
  val dedupBucketStatsSql: String =
    s"""WITH mh AS (
       |  SELECT 'minhash' AS family, n, ${MinhashMaxBucket}::BIGINT AS cap FROM (
       |    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |    grams AS (
       |      SELECT doc_id, gram FROM (
       |        SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS gram
       |        FROM toks JOIN generate_series(1, 100000) g(i) ON i <= len(tk) - 2
       |        WHERE len(tk) >= 3
       |        UNION
       |        SELECT doc_id, array_to_string(tk, ' ') AS gram FROM toks WHERE len(tk) < 3)),
       |    $md5BandsCtes
       |    SELECT count(*) AS n FROM bands GROUP BY band, bh) x),
       |sh AS (
       |  SELECT 'simhash' AS family, n, ${SimhashMaxBucket}::BIGINT AS cap FROM (
       |    WITH $simhashChunkedCtes
       |    SELECT count(*) AS n FROM chunked GROUP BY chunk, cv) y),
       |u AS (SELECT * FROM mh UNION ALL SELECT * FROM sh)
       |SELECT family, count(*) AS n_buckets, sum(n)::BIGINT AS n_entries,
       |  max(n)::BIGINT AS max_size,
       |  sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_singletons,
       |  sum(CASE WHEN n > cap THEN 1 ELSE 0 END)::BIGINT AS n_over_cap,
       |  sum(CASE WHEN n > cap THEN n - cap ELSE 0 END)::BIGINT AS entries_over_cap
       |FROM u GROUP BY family ORDER BY family""".stripMargin

  // ---- SimHash candidate-quality evaluation ---------------------------
  /** The [[dedupEval]] instrument for the SimHash family: recall/precision
    * of the PRODUCTION candidate set (chunk-collision buckets with the
    * [[SimhashMaxBucket]] representative cap, pre-verification) against
    * the EXACT Hamming ≤ 3 truth. Truth is computed by uncapped pigeonhole
    * decomposition, which is exact by construction — a 60-bit signature in
    * four 15-bit chunks can differ in ≤ 3 bits only if ≥ 1 chunk is
    * identical, so bucket-joining on equal chunks reaches every true pair
    * without an all-pairs scan. The two numbers this buys before a corpus
    * rollout: recall quantifies what the hot-bucket representative cap
    * LOSES (the only approximation in the production path — uncapped,
    * recall is 1.0 by the pigeonhole theorem), precision quantifies the
    * popcount-verification work the candidates waste.
    *
    * Scale: both sides are bucketed equi-joins on (chunk, cv) — never
    * all-pairs; the DECLARED query's truth side forgoes the cap (the
    * instrument's price — quadratic only inside degenerate boilerplate
    * buckets, and an eval runs on a bounded sample in production anyway).
    * Both pair frames are `localCheckpoint`ed: each feeds two consumers
    * (own count + the intersection) and their input is the full
    * signature pipeline. Pointing the instrument at a RAW corpus (no
    * bounded sample) needs the truth side bounded too — pass
    * [[SimhashEvalMaxBucket]] as `truthMaxBucket`: oversized truth
    * buckets switch to the same representative pairing as the candidate
    * side, trading exact-truth recall for O(n) work per hot bucket. */
  def dedupSimhashEval(s: SparkSession, dir: String): DataFrame =
    dedupSimhashEval(s, dir, truthMaxBucket = Int.MaxValue)

  /** Truth-side representative cap for [[dedupSimhashEval]] raw-corpus
    * runs. NOT used by the declared query (whose oracle replays exact
    * uncapped truth); mirrors [[SimhashMaxBucket]] so a capped-truth run
    * measures the candidate policy against a truth set generated under
    * the same hot-bucket economics. */
  val SimhashEvalMaxBucket = 64

  def dedupSimhashEval(s: SparkSession, dir: String, truthMaxBucket: Int): DataFrame = {
    val chunked = md5SimhashSigs(s, dir).select(col("doc_id"), col("sig"),
      posexplode(expr(
        "transform(sequence(0, 3), c -> shiftright(sig, c * 15) & 32767)"))
        .as(Seq("chunk", "cv")))
    // buckets feed BOTH pair generators — checkpoint so the 60-aggregate
    // signature pipeline runs once
    val buckets = chunked.groupBy("chunk", "cv")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sig")))).as("ds"))
      .where(size(col("ds")) >= 2)
      .localCheckpoint()
    // exact truth: in-bucket pairs, popcount-verified (list is
    // doc_id-sorted, so j > i implies d1 < d2). Buckets past
    // truthMaxBucket (declared query: MaxValue = never) fall back to
    // representative pairing — same policy as the candidate side below.
    val truth = buckets
      .withColumn("tnb", size(col("ds")))
      .withColumn("tlhs", when(col("tnb") <= truthMaxBucket, col("ds"))
        .otherwise(slice(col("ds"), 1, 1)))
      .select(col("ds"), col("tnb"), posexplode(col("tlhs")).as(Seq("i", "a")))
      .select(col("a"), col("i"), col("tnb"), posexplode(col("ds")).as(Seq("j", "b")))
      .where((col("tnb") <= truthMaxBucket && col("j") > col("i"))
        || (col("tnb") > truthMaxBucket && col("a.doc_id") < col("b.doc_id")))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        bit_count(expr("a.sig ^ b.sig")).as("hamming"))
      .where(col("hamming") <= 3)
      .select("d1", "d2")
      .distinct()
      .localCheckpoint()
    // production candidates: the dedupSimhash pairing verbatim — rep
    // pairing past the cap, NO popcount filter (that is what precision
    // measures)
    val cand = buckets
      .withColumn("nb", size(col("ds")))
      .withColumn("lhs", when(col("nb") <= SimhashMaxBucket, col("ds"))
        .otherwise(slice(col("ds"), 1, 1)))
      .select(col("ds"), col("nb"), posexplode(col("lhs")).as(Seq("i", "a")))
      .select(col("a"), col("i"), col("nb"), posexplode(col("ds")).as(Seq("j", "b")))
      .where((col("nb") <= SimhashMaxBucket && col("j") > col("i"))
        || (col("nb") > SimhashMaxBucket && col("a.doc_id") < col("b.doc_id")))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
      .localCheckpoint()
    val hits = cand.join(truth, Seq("d1", "d2"))
    cand.agg(count(lit(1)).as("n_candidates"))
      .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_truth"))))
      .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hits"))))
      .select(col("n_candidates"), col("n_truth"), col("n_hits"),
        when(col("n_truth") > 0,
          r4(col("n_hits").cast(DoubleType) / col("n_truth"))).as("recall"),
        when(col("n_candidates") > 0,
          r4(col("n_hits").cast(DoubleType) / col("n_candidates"))).as("precision"))
  }

  val dedupSimhashEvalSql: String =
    s"""WITH $simhashChunkedCtes,
       |bsz AS (SELECT chunk, cv, count(*) AS n, min(doc_id) AS mn
       |  FROM chunked GROUP BY 1, 2),
       |truth AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM chunked a
       |  JOIN chunked b ON a.chunk = b.chunk AND a.cv = b.cv AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.sig, b.sig)) <= 3),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM chunked a
       |  JOIN chunked b ON a.chunk = b.chunk AND a.cv = b.cv AND a.doc_id < b.doc_id
       |  JOIN bsz s ON a.chunk = s.chunk AND a.cv = s.cv
       |  WHERE s.n <= $SimhashMaxBucket
       |  UNION
       |  SELECT s.mn AS d1, b.doc_id AS d2
       |  FROM chunked b JOIN bsz s ON b.chunk = s.chunk AND b.cv = s.cv
       |  WHERE s.n > $SimhashMaxBucket AND b.doc_id <> s.mn),
       |m AS (SELECT
       |  (SELECT count(*) FROM cand) AS n_candidates,
       |  (SELECT count(*) FROM truth) AS n_truth,
       |  (SELECT count(*) FROM cand c JOIN truth t
       |     ON c.d1 = t.d1 AND c.d2 = t.d2) AS n_hits)
       |SELECT n_candidates::BIGINT AS n_candidates, n_truth::BIGINT AS n_truth,
       |  n_hits::BIGINT AS n_hits,
       |  CASE WHEN n_truth > 0
       |    THEN CAST(round(n_hits::DOUBLE / n_truth, 4) AS DOUBLE) END AS recall,
       |  CASE WHEN n_candidates > 0
       |    THEN CAST(round(n_hits::DOUBLE / n_candidates, 4) AS DOUBLE) END AS precision
       |FROM m""".stripMargin

  // ---- incremental SimHash dedup against a persisted band index --------
  /** The SimHash family's at-rest/incremental story — completing the
    * pattern every other dedup family already has (Jaccard:
    * [[writeGramIndex]]; semantic: `Similarity.writeSemanticIndex`):
    * persist the CORPUS split's 4×15-bit chunk buckets ONCE, probe them
    * with arriving batches; work scales with the batch, the corpus is
    * never re-hashed. Signatures use the cross-engine md5 60-bit family
    * (the same one [[dedupSimhashChunks]]/[[dedupSimhashEval]] pin), so
    * the whole build + probe replays in DuckDB — a STRONGER contract
    * than the oracle-free native-murmur3 batch operator.
    *
    * Hot-bucket guard at WRITE time: a (chunk, cv) bucket keeps only
    * its cap-many smallest doc_ids — the cap DERIVED from the corpus's
    * own occupancy profile by default ([[derivedCapOf]]; explicit via
    * `maxBucket`) — bounded probe fan-out by construction (an
    * adversarial boilerplate corpus cannot make an arriving batch join
    * O(corpus) rows, the [[SimhashCapMax]] ceiling holds under any
    * degeneracy); the cost is possible missed matches against truncated
    * members of degenerate buckets, budgeted at
    * [[SimhashCapTargetFrac]] of band entries. */
  /** Index-family constants persisted WITH the index (`meta/`): appends
    * must enforce the cap the index was BUILT with, not whatever constant
    * the appending binary compiled against — the 10× scaling run showed
    * the caps are density-dependent tunables (SimHash incremental recall
    * 1.0 → 0.78 at 10× bucket density under the default 64), so a
    * production deployment tunes them per corpus and the index itself is
    * the source of truth. */
  private def writeIndexMeta(s: SparkSession, indexPath: String,
      key: String, value: Long): Unit =
    writeIndexMetaAll(s, indexPath, Seq(key -> value))

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.operators.Dedup")

  /** over-cap mass fraction past which band-index build/append logs a
    * warning: the density-adaptive dial's tripwire. 2% tracks the
    * round-12 CapSweep finding — under that, truncation cost recall
    * nothing measurable; over it, the cap needs raising for THIS corpus. */
  val BandOverCapWarnFraction = 0.02

  /** appends below this many band entries never warn: a 4-entry
    * micro-batch shedding one row is 25% — statistically meaningless,
    * and the streaming admission loops append tiny batches constantly */
  val BandWarnMinEntries = 1000L

  /** Pre-cap bucket-occupancy profile of a band relation, unpivoted to
    * meta/ (key, value) rows — persisted WITH each band index at write
    * time so a deployment can see (and `append*Index` can warn about)
    * the over-cap mass without re-running a sweep. Computed from the
    * collapsed SIZES frame (one row per bucket) so the heavy entries
    * pass runs once; builds are rare and the profile is the tuning
    * signal a 100 TB corpus needs to pick its cap. `capDf` is a 1-row
    * (cap BIGINT) frame — a literal for fixed caps, [[derivedCapOf]]'s
    * output for auto. */
  private def occupancyProfile(sizes: DataFrame, capDf: DataFrame): DataFrame =
    sizes.crossJoin(broadcast(capDf))
      .agg(count(lit(1)).as("n_buckets"),
        coalesce(sum(col("n")), lit(0L)).as("n_entries"),
        coalesce(max(col("n")), lit(0L)).as("max_bucket_size"),
        coalesce(sum(when(col("n") > col("cap"), 1L).otherwise(0L)), lit(0L))
          .as("n_over_cap"),
        coalesce(sum(when(col("n") > col("cap"), col("n") - col("cap"))
          .otherwise(0L)), lit(0L)).as("entries_over_cap"))
      .select(expr(
        """stack(5,
          |  'n_buckets', n_buckets,
          |  'n_entries', n_entries,
          |  'max_bucket_size', max_bucket_size,
          |  'n_over_cap', n_over_cap,
          |  'entries_over_cap', entries_over_cap) AS (key, value)""".stripMargin))

  /** Sentinel: derive the write-time cap from the corpus itself */
  val SimhashCapAuto = 0
  /** auto-cap target: truncation may shed at most this fraction of all
    * band entries. 0.5%, priced on the 10× corpus: a 1% target derived
    * cap 303 → incremental recall 0.9414; 0.5% derives 421 → ≥ 0.96
    * (CapSweep: 384 → 0.9606), for ~+1% index rows — truncated entries
    * are disproportionately real near-dup mass (hot buckets are hot
    * because content repeats), so the over-mass budget buys recall
    * roughly 6-8× its size and a sub-1% budget is the right default. */
  val SimhashCapTargetFrac = 0.005
  /** hard ceiling on the derived cap — the bounded-fan-out guarantee the
    * cap exists for survives any corpus degeneracy (a corpus of one
    * giant bucket would otherwise derive cap ≈ 0.99·N) */
  val SimhashCapMax = 1024

  /** Density-derived write-time cap, fully in-plan (no driver collect):
    * the smallest OBSERVED bucket size c whose truncation sheds no more
    * than [[SimhashCapTargetFrac]] of all band entries, clamped to
    * [[SimhashCapMax]]. over_mass(c) = Σ_{n>c} (n−c)·cnt_n computed via
    * suffix sums over the distinct-size domain (a few hundred rows —
    * metadata scale, so the single-partition ordered window is fine).
    * Candidates are the observed sizes: over_mass is decreasing in c,
    * so the minimal satisfying size is within one size-step of the
    * true integer optimum — determinism across engines matters more
    * than that sliver. Empty corpus → the [[SimhashMaxBucket]]
    * constant. Returns a 1-row (cap BIGINT) frame. Input: one row per
    * bucket with its size in column `n`. Public as the derivation is a
    * contract (the oracles replay it) and DedupSpec pins it directly. */
  def derivedCapOf(sizes: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("n").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val sz = sizes.groupBy("n").agg(count(lit(1)).as("cnt"))
    val cand = sz
      .withColumn("over_mass",
        coalesce(sum(col("n") * col("cnt")).over(w), lit(0L))
          - col("n") * coalesce(sum(col("cnt")).over(w), lit(0L)))
    val tot = sz.agg(coalesce(sum(col("n") * col("cnt")), lit(0L)).as("entries"))
    cand.crossJoin(broadcast(tot))
      .where(col("over_mass") <=
        ceil(col("entries") * lit(SimhashCapTargetFrac)))
      .agg(least(coalesce(min(col("n")), lit(SimhashMaxBucket.toLong)),
        lit(SimhashCapMax.toLong)).as("cap"))
  }

  /** the cap-derivation chain as oracle SQL: `$rel` must expose one row
    * per (bucket) with a size column `n`; yields a scalar-subquery-able
    * relation `capv(cap)` */
  private def derivedCapSql(rel: String): String =
    s"""sz AS (SELECT n, count(*) AS cnt FROM $rel GROUP BY n),
       |cand AS (
       |  SELECT n,
       |    coalesce(sum(n * cnt) OVER (ORDER BY n DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    - n * coalesce(sum(cnt) OVER (ORDER BY n DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS over_mass
       |  FROM sz),
       |tot AS (SELECT coalesce(sum(n * cnt), 0) AS entries FROM sz),
       |capv AS (
       |  SELECT least(coalesce(min(n), $SimhashMaxBucket), $SimhashCapMax) AS cap
       |  FROM cand, tot
       |  WHERE over_mass <= ceil(entries * $SimhashCapTargetFrac))""".stripMargin

  /** meta/ = build constants + occupancy profile (key, value) rows in
    * one overwrite */
  private def writeIndexMetaWithProfile(s: SparkSession, indexPath: String,
      metaDf: DataFrame): Unit =
    metaDf.coalesce(1).write.mode("overwrite").parquet(s"$indexPath/meta")

  /** build-time tripwire on the just-persisted profile (two O(1) meta
    * readbacks, no data pass) */
  private def warnIfOverCap(s: SparkSession, indexPath: String,
      family: String, cap: Long): Unit = {
    val entries = readIndexMeta(s, indexPath, "n_entries", 0L)
    val over = readIndexMeta(s, indexPath, "entries_over_cap", 0L)
    if (entries > 0 && over.toDouble / entries > BandOverCapWarnFraction)
      log.warn(s"$family index at $indexPath: $over of $entries band entries " +
        f"(${over.toDouble / entries * 100}%.1f%%) exceed the write-time cap $cap " +
        s"and were truncated — recall on dense buckets will suffer; raise the " +
        s"cap for this corpus (see q_dedup_bucket_stats / tools.CapSweep)")
  }

  /** multi-key form: one overwrite of `meta/` with every constant the
    * index was built under — callers that persist more than one tunable
    * must write them in a single call (mode=overwrite replaces the dir) */
  private def writeIndexMetaAll(s: SparkSession, indexPath: String,
      pairs: Seq[(String, Long)]): Unit = {
    import s.implicits._
    pairs.toDF("key", "value")
      .write.mode("overwrite").parquet(s"$indexPath/meta")
  }

  /** Guard for probe/append against an index built under a DIFFERENT
    * constant than the running binary's: a silent mismatch (e.g. winnow
    * w) changes the selection on the probe side relative to the at-rest
    * side and weakens the detection guarantee with no detectable error.
    * Indexes written before the meta key existed pass (default). */
  private def requireIndexMeta(s: SparkSession, indexPath: String,
      key: String, expected: Long): Unit = {
    val have = readIndexMeta(s, indexPath, key, expected)
    require(have == expected,
      s"index at $indexPath was built with $key=$have but this binary " +
        s"uses $key=$expected; rebuild the index or align the constant " +
        s"— probing across a $key mismatch silently changes which grams " +
        s"are selected and voids the detection guarantee")
  }

  /** O(1) metadata readback (driver-side by design, like the IVF
    * codebook probe planning); `default` covers indexes written before
    * the meta sidecar existed. */
  private def readIndexMeta(s: SparkSession, indexPath: String,
      key: String, default: Long): Long =
    if (!new java.io.File(s"$indexPath/meta").exists) default
    else s.read.parquet(s"$indexPath/meta")
      .where(col("key") === key).select("value")
      .collect().headOption.map(_.getLong(0)).getOrElse(default)

  /** maxBucket = [[SimhashCapAuto]] (the default) derives the cap from
    * the corpus's own occupancy profile ([[derivedCapOf]]) — the
    * density-adaptive form; pass an explicit cap to pin it. Either way
    * the APPLIED cap is persisted in meta/ as the index's source of
    * truth for appends. Two heavy passes at build: the collapsed sizes
    * aggregation (localCheckpointed — bucket-count scale, feeds cap +
    * profile) and the bands write itself. */
  def writeSimhashIndex(s: SparkSession, dir: String, indexPath: String,
      maxBucket: Int = SimhashCapAuto): Unit = {
    import s.implicits._
    // the token-hash signature aggregation is the build's expensive
    // stage; checkpoint its O(docs) 2-column output (doc_id, sig — far
    // smaller than the bands/ index being written) so the sizes pass
    // (cap derivation + profile) and the bands pass both read it
    // instead of re-hashing every token
    val sigs = md5SimhashSigsOf(t(s, dir, "documents")
        .where(col("doc_id") % IncrementalMod =!= IncrementalRem))
      .localCheckpoint()
    def chunked = sigs
      .select(col("doc_id"), col("sig"),
        posexplode(expr(
          "transform(sequence(0, 3), c -> shiftright(sig, c * 15) & 32767)"))
          .as(Seq("chunk", "cv")))
    val sizes = chunked.groupBy("chunk", "cv")
      .agg(count(lit(1)).as("n")).select("n").localCheckpoint()
    val capDf =
      if (maxBucket == SimhashCapAuto) derivedCapOf(sizes)
      else Seq(maxBucket.toLong).toDF("cap")
    chunked
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("chunk", "cv").orderBy("doc_id")))
      .crossJoin(broadcast(capDf))
      .where(col("rn") <= col("cap"))
      .select("chunk", "cv", "doc_id", "sig")
      .repartition(col("chunk"), col("cv"))
      .write.mode("overwrite").parquet(s"$indexPath/bands")
    writeIndexMetaWithProfile(s, indexPath,
      capDf.select(lit("max_bucket").as("key"), col("cap").as("value"))
        .unionByName(occupancyProfile(sizes, capDf)))
    warnIfOverCap(s, indexPath, "simhash",
      readIndexMeta(s, indexPath, "max_bucket", SimhashMaxBucket.toLong))
  }

  /** Add-after-build maintenance for the SimHash band index — the band
    * family's twin of `Similarity.appendIvfIndex`: signature the new
    * docs map-side, chunk them, and APPEND into `bands/` without
    * touching any existing file (parquet append adds files; the old
    * ones stay byte-identical). The write-time cap PERSISTED with the
    * index is respected across builds: current bucket occupancy is read from
    * the index (column-pruned to the two bucket keys, map-side-combined
    * count) and new entries only fill the remaining slots, smallest
    * doc_id first — so a hot bucket that was truncated at build time
    * cannot regrow past the cap through appends. Caller contract
    * (same as appendIvfIndex): `docs` doc_ids are new to the index.
    *
    * Returns the number of band entries the cap REJECTED this append —
    * the density tripwire: when the rejected fraction crosses
    * [[BandOverCapWarnFraction]] a warning is logged naming the cap to
    * retune. Counting costs two O(batch) localCheckpoints (batch-sized
    * by the caller contract); the index is still never rewritten. */
  def appendSimhashIndex(s: SparkSession, indexPath: String,
      docs: DataFrame): Long = {
    val maxBucket = readIndexMeta(s, indexPath, "max_bucket", SimhashMaxBucket.toLong)
    val occupancy = s.read.parquet(s"$indexPath/bands")
      .groupBy("chunk", "cv").agg(count(lit(1)).as("n_have"))
    val batchChunks = md5SimhashSigsOf(docs)
      .select(col("doc_id"), col("sig"),
        posexplode(expr(
          "transform(sequence(0, 3), c -> shiftright(sig, c * 15) & 32767)"))
          .as(Seq("chunk", "cv")))
      .localCheckpoint()
    val total = batchChunks.count()
    val admitted = batchChunks
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("chunk", "cv").orderBy("doc_id")))
      .join(occupancy, Seq("chunk", "cv"), "left")
      .where(col("rn") + coalesce(col("n_have"), lit(0L)) <= maxBucket)
      .select("chunk", "cv", "doc_id", "sig")
      .localCheckpoint()
    val kept = admitted.count()
    admitted
      .repartition(col("chunk"), col("cv"))
      .write.mode("append").parquet(s"$indexPath/bands")
    val dropped = total - kept
    if (total >= BandWarnMinEntries &&
        dropped.toDouble / total > BandOverCapWarnFraction)
      log.warn(s"simhash index at $indexPath: append rejected $dropped of " +
        s"$total band entries at cap $maxBucket — the corpus has outgrown " +
        s"the cap this index was built with; rebuild with a higher cap " +
        s"(see q_dedup_bucket_stats / tools.CapSweep)")
    dropped
  }

  /** Probe the persisted band index with ARBITRARY documents (doc_id,
    * text): signature map-side, one (chunk, cv) equi-join, distinct
    * candidate pairs, exact Hamming ≤ 3 verification on the full 60-bit
    * signatures. Emits (new_id, dup_of, hamming) for every verified
    * near-dup. Shared by the declared incremental query and
    * `Pipeline.streamSimhashDedup` (stream ≡ batch). */
  def probeSimhashIndex(s: SparkSession, docs: DataFrame,
      indexPath: String): DataFrame = {
    val batchChunks = md5SimhashSigsOf(docs)
      .select(col("doc_id").as("new_id"), col("sig").as("new_sig"),
        posexplode(expr(
          "transform(sequence(0, 3), c -> shiftright(sig, c * 15) & 32767)"))
          .as(Seq("chunk", "cv")))
    val idx = s.read.parquet(s"$indexPath/bands")
      .select(col("chunk"), col("cv"),
        col("doc_id").as("dup_of"), col("sig").as("old_sig"))
    batchChunks.join(idx, Seq("chunk", "cv"))
      .select(col("new_id"), col("dup_of"),
        bit_count(expr("new_sig ^ old_sig")).as("hamming"))
      .distinct()
      .where(col("hamming") <= 3)
  }

  /** index path memoized per (session, dir, input fingerprint) — the
    * SimHash twin of [[gramIndexPath]] */
  private val simhashIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (String, String)]()

  def ensureSimhashIndex(s: SparkSession, dir: String): String =
    simhashIndexCache.synchronized {
      val key = (s, dir)
      val fp = graft.util.inputFingerprint(dir, "documents.parquet")
      val cached = simhashIndexCache.get(key)
      if (cached != null && cached._1 == fp) cached._2
      else {
        if (cached != null) graft.util.deleteRecursively(cached._2)
        val path = java.nio.file.Files.createTempDirectory("graft_simhash_idx").toString
        writeSimhashIndex(s, dir, path)
        simhashIndexCache.put(key, (fp, path))
        path
      }
    }

  def clearSimhashIndexCache(): Unit =
    simhashIndexCache.synchronized {
      simhashIndexCache.forEach((_, v) => graft.util.deleteRecursively(v._2))
      simhashIndexCache.clear()
    }

  // The declared batch query sorts for a stable oracle compare; the probe
  // itself stays unsorted so the streaming foreachBatch sinks don't pay a
  // per-micro-batch range-partitioning sort no consumer reads.
  def dedupSimhashIncremental(s: SparkSession, dir: String): DataFrame =
    probeSimhashIndex(s,
      t(s, dir, "documents")
        .where(col("doc_id") % IncrementalMod === IncrementalRem)
        .select("doc_id", "text"),
      ensureSimhashIndex(s, dir))
      .orderBy("new_id", "dup_of")

  /** Recall eval for the INCREMENTAL SimHash probe — prices what the
    * write-time [[SimhashMaxBucket]] truncation costs the probe verdicts:
    * truth = the same probe against an UNCAPPED corpus index (every
    * (chunk, cv) collision verified at Hamming ≤ 3), found = the capped
    * form the persisted index serves (identical math to
    * [[writeSimhashIndex]] + [[probeSimhashIndex]], which DedupSpec pins
    * persisted ≡ direct). Found ⊆ truth by construction (a capped bucket
    * only DROPS candidates), so one metrics row
    * (n_truth, n_found, n_missed, recall) is exact, and fully
    * DuckDB-replayable — the oracle breaks if either side drifts. */
  def dedupSimhashIncrRecall(s: SparkSession, dir: String): DataFrame = {
    val chunked = md5SimhashSigs(s, dir).select(col("doc_id"), col("sig"),
      posexplode(expr(
        "transform(sequence(0, 3), c -> shiftright(sig, c * 15) & 32767)"))
        .as(Seq("chunk", "cv")))
    val corpus = chunked.where(col("doc_id") % IncrementalMod =!= IncrementalRem)
    val probe = chunked.where(col("doc_id") % IncrementalMod === IncrementalRem)
      .select(col("chunk"), col("cv"),
        col("doc_id").as("new_id"), col("sig").as("new_sig"))
    def verified(idx: DataFrame): DataFrame =
      probe.join(idx.select(col("chunk"), col("cv"),
          col("doc_id").as("dup_of"), col("sig").as("old_sig")),
          Seq("chunk", "cv"))
        .select(col("new_id"), col("dup_of"),
          bit_count(expr("new_sig ^ old_sig")).as("hamming"))
        .distinct()
        .where(col("hamming") <= 3)
        .select("new_id", "dup_of")
    // capped side mirrors the index build's DERIVED cap (the
    // writeSimhashIndex default), so the instrument prices the cap a
    // default build actually applies on THIS corpus
    val capDf = derivedCapOf(
      corpus.groupBy("chunk", "cv").agg(count(lit(1)).as("n")).select("n"))
    val capped = corpus
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("chunk", "cv").orderBy("doc_id")))
      .crossJoin(broadcast(capDf))
      .where(col("rn") <= col("cap"))
    verified(corpus).agg(count(lit(1)).as("n_truth"))
      .crossJoin(broadcast(verified(capped).agg(count(lit(1)).as("n_found"))))
      .select(col("n_truth"), col("n_found"),
        (col("n_truth") - col("n_found")).as("n_missed"),
        when(col("n_truth") > 0,
          r4(col("n_found").cast(DoubleType) / col("n_truth"))).as("recall"))
  }

  lazy val dedupSimhashIncrRecallSql: String =
    s"""WITH $simhashChunkedCtes,
       |corpus AS (SELECT chunk, cv, doc_id, sig FROM chunked
       |  WHERE doc_id % $IncrementalMod <> $IncrementalRem),
       |bsz AS (SELECT count(*) AS n FROM corpus GROUP BY chunk, cv),
       |${derivedCapSql("bsz")},
       |capped AS (
       |  SELECT chunk, cv, doc_id, sig FROM (
       |    SELECT chunk, cv, doc_id, sig,
       |      row_number() OVER (PARTITION BY chunk, cv ORDER BY doc_id) AS rn
       |    FROM corpus) x
       |  WHERE rn <= (SELECT cap FROM capv)),
       |probe AS (
       |  SELECT chunk, cv, doc_id AS new_id, sig AS new_sig
       |  FROM chunked WHERE doc_id % $IncrementalMod = $IncrementalRem),
       |truth AS (
       |  SELECT new_id, dup_of FROM (
       |    SELECT DISTINCT p.new_id, i.doc_id AS dup_of,
       |      bit_count(xor(p.new_sig, i.sig))::INTEGER AS hamming
       |    FROM probe p JOIN corpus i ON p.chunk = i.chunk AND p.cv = i.cv) v
       |  WHERE hamming <= 3),
       |found AS (
       |  SELECT new_id, dup_of FROM (
       |    SELECT DISTINCT p.new_id, i.doc_id AS dup_of,
       |      bit_count(xor(p.new_sig, i.sig))::INTEGER AS hamming
       |    FROM probe p JOIN capped i ON p.chunk = i.chunk AND p.cv = i.cv) v
       |  WHERE hamming <= 3),
       |m AS (SELECT
       |  (SELECT count(*) FROM truth) AS n_truth,
       |  (SELECT count(*) FROM found) AS n_found)
       |SELECT n_truth::BIGINT AS n_truth, n_found::BIGINT AS n_found,
       |  (n_truth - n_found)::BIGINT AS n_missed,
       |  CASE WHEN n_truth > 0
       |    THEN CAST(round(n_found::DOUBLE / n_truth, 4) AS DOUBLE) END AS recall
       |FROM m""".stripMargin

  // lazy: IncrementalMod/Rem are defined later in the file — an eager val
  // here would interpolate their pre-initialization 0s into the SQL
  lazy val dedupSimhashIncrementalSql: String =
    s"""WITH $simhashChunkedCtes,
       |corpus AS (SELECT chunk, cv, doc_id, sig FROM chunked
       |  WHERE doc_id % $IncrementalMod <> $IncrementalRem),
       |bsz AS (SELECT count(*) AS n FROM corpus GROUP BY chunk, cv),
       |${derivedCapSql("bsz")},
       |idx AS (
       |  SELECT chunk, cv, doc_id, sig FROM (
       |    SELECT chunk, cv, doc_id, sig,
       |      row_number() OVER (PARTITION BY chunk, cv ORDER BY doc_id) AS rn
       |    FROM corpus) x
       |  WHERE rn <= (SELECT cap FROM capv)),
       |probe AS (
       |  SELECT chunk, cv, doc_id AS new_id, sig AS new_sig
       |  FROM chunked WHERE doc_id % $IncrementalMod = $IncrementalRem),
       |pairs AS (
       |  SELECT DISTINCT p.new_id, i.doc_id AS dup_of,
       |    bit_count(xor(p.new_sig, i.sig))::INTEGER AS hamming
       |  FROM probe p JOIN idx i ON p.chunk = i.chunk AND p.cv = i.cv)
       |SELECT new_id, dup_of, hamming FROM pairs
       |WHERE hamming <= 3 ORDER BY new_id, dup_of""".stripMargin

  // ---- incremental dedup against a persisted gram index ----------------
  /** The production ingest pattern at 100 TB: dedup a NEW BATCH against an
    * EXISTING corpus without re-clustering the world. The corpus's pruned
    * inverted gram index is built ONCE and persisted at rest
    * ([[writeGramIndex]]); each arriving batch shingles map-side and
    * equi-joins the index on the gram key — work scales with the BATCH
    * (plus one bounded index probe), not the corpus. The at-rest-layout
    * twin of `Similarity.writeIvfIndex` for the dedup family.
    *
    * Contract mirrors [[dedupNgramJaccard]]: intersection counted on
    * index grams with corpus-df ≤ [[JaccardMaxDf]] (stop-gram pruning —
    * bounds per-gram fan-out at any corpus size), denominator on full
    * per-doc distinct gram counts, threshold [[JaccardThreshold]]. The
    * gram key at rest and in shuffle is the 60-bit md5-prefix BIGINT
    * (the cross-engine family of dedupMinhashBands / commonSpanRatio) —
    * fixed 8 bytes instead of ~20-byte strings.
    *
    * Declared split: batch = doc_id % [[IncrementalMod]] ==
    * [[IncrementalRem]], corpus = the rest — deterministic, so the DuckDB
    * oracle replays index build + probe exactly. */
  val IncrementalMod = 10
  val IncrementalRem = 7

  /** distinct per-doc grams under the portable 60-bit md5-prefix key
    * (native [[graft.functions.TextExpressions.md5Prefix64]] — one
    * codegen'd digest per gram, bit-identical to the interpreted
    * conv(substring(md5)) form per its parity spec) */
  private def ghGrams(s: SparkSession, dir: String): DataFrame = {
    graft.functions.TextExpressions.register(s)
    // NOTE (r21): a fanOut of the shingled frame was tried here too and
    // reverted — shuffling the gram arrays cost more than the spread
    // md5 saved (gram family 19.7 → 20.6 s at sf0.1)
    shingled(s, dir)
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .select(col("doc_id"),
        graft.functions.TextExpressions.md5Prefix64(col("gram"), 15).as("gh"))
  }

  /** Persist the corpus-side index: `grams/` = pruned inverted index
    * (gh, doc_id) clustered by gh so a probe's shuffle lands aligned, and
    * `sizes/` = per-doc distinct gram counts (the Jaccard denominators).
    * Pruning is by CORPUS df: grams in more than [[JaccardMaxDf]] corpus
    * docs carry no dedup signal and would fan out hottest — they are
    * dropped at build time, so probe-time cost is bounded by
    * construction. */
  def writeGramIndex(s: SparkSession, dir: String, indexPath: String,
      maxDf: Int = JaccardMaxDf): Unit = {
    val corpus = ghGrams(s, dir)
      .where(col("doc_id") % IncrementalMod =!= IncrementalRem)
    // materialized once: consumed by both the pruning join and the dfs
    // sidecar write below (re-deriving it would re-explode the corpus)
    val cdf = corpus.groupBy("gh").agg(count(lit(1)).as("df"))
      .localCheckpoint()
    corpus.join(cdf.where(col("df") <= maxDf), "gh")
      .select("gh", "doc_id")
      .repartition(col("gh"))
      .write.mode("overwrite").parquet(s"$indexPath/grams")
    shingled(s, dir)
      .where(col("doc_id") % IncrementalMod =!= IncrementalRem)
      .select(col("doc_id"), size(col("grams")).cast(LongType).as("n_grams"))
      .write.mode("overwrite").parquet(s"$indexPath/sizes")
    // df sidecar for append maintenance: FULL corpus df per gh, including
    // the pruned stop-grams (the inverted index alone can't distinguish
    // "pruned at cap" from "never seen", which appends must). Stored as
    // DELTA rows — readers sum per gh — so appends stay append-only.
    cdf.select(col("gh"), col("df"))
      .write.mode("overwrite").parquet(s"$indexPath/dfs")
    writeIndexMeta(s, indexPath, "max_df", maxDf.toLong)
  }

  /** Add-after-build maintenance for the pruned inverted gram index —
    * completing the add-after-build story for every dedup index family
    * (IVF/IVF+PQ, MinHash bands, SimHash bands, and now Jaccard grams).
    * The [[JaccardMaxDf]] stop-gram pruning is BY GLOBAL df, so append
    * correctness needs the `dfs/` delta sidecar: a batch gram's entries
    * are appended only when its UPDATED total df (existing + batch)
    * stays ≤ the cap — so a gram that was pruned at build time cannot
    * re-enter through batches, and a gram a batch pushes over the cap
    * admits nothing further. One-sided drift vs a full rebuild, shared
    * with the band families: entries already in the index when a gram
    * crosses the cap are retained (≤ cap stale rows per gram, bounded);
    * a rebuild reclaims them. All three directories only gain files —
    * existing bytes never rewrite. Caller contract: `docs` doc_ids are
    * new to the index. */
  def appendGramIndex(s: SparkSession, indexPath: String,
      docs: DataFrame): Unit = {
    graft.functions.TextExpressions.register(s)
    val maxDf = readIndexMeta(s, indexPath, "max_df", JaccardMaxDf.toLong)
    val batchSh = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("grams",
        graft.functions.TextExpressions.wordNgrams(col("toks"), 3))
    batchSh
      .select(col("doc_id"), size(col("grams")).cast(LongType).as("n_grams"))
      .write.mode("append").parquet(s"$indexPath/sizes")
    val batchGh = batchSh
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .select(col("doc_id"),
        graft.functions.TextExpressions.md5Prefix64(col("gram"), 15).as("gh"))
    val batchDf = batchGh.groupBy("gh").agg(count(lit(1)).as("new_df"))
    val oldDf = s.read.parquet(s"$indexPath/dfs")
      .groupBy("gh").agg(sum(col("df")).as("old_df"))
    val admitted = batchDf.join(oldDf, Seq("gh"), "left")
      .where(coalesce(col("old_df"), lit(0L)) + col("new_df") <= maxDf)
      .select("gh")
    batchGh.join(admitted, Seq("gh"), "left_semi")
      .select("gh", "doc_id")
      .repartition(col("gh"))
      .write.mode("append").parquet(s"$indexPath/grams")
    // df deltas recorded for ALL batch grams (admitted or not) so the
    // NEXT append sees true totals
    batchDf.select(col("gh"), col("new_df").as("df"))
      .write.mode("append").parquet(s"$indexPath/dfs")
  }

  /** per-gh occurrence counts of a (doc_id, text) batch under the SAME
    * shingle derivation the build and append use — the frame
    * `IndexMaintenance.deleteFromGramIndex` negates into the `dfs/`
    * delta log so deletion subtracts exactly what build/append added */
  private[graft] def batchGramDf(s: SparkSession, docs: DataFrame): DataFrame = {
    graft.functions.TextExpressions.register(s)
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("grams",
        graft.functions.TextExpressions.wordNgrams(col("toks"), 3))
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .select(graft.functions.TextExpressions.md5Prefix64(col("gram"), 15).as("gh"))
      .groupBy("gh").agg(count(lit(1)).as("df"))
  }

  /** index path memoized per (session, dir, input fingerprint) — same
    * staleness guard as the label cache; the index is files on disk, so
    * invalidation just writes a fresh directory */
  private val gramIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (String, String)]()

  private def gramIndexPath(s: SparkSession, dir: String): String =
    gramIndexCache.synchronized {
      val key = (s, dir)
      val fp = graft.util.inputFingerprint(dir, "documents.parquet")
      val cached = gramIndexCache.get(key)
      if (cached != null && cached._1 == fp) cached._2
      else {
        // drop the superseded directory — a stale index is a full corpus
        // gram copy under /tmp, and the bench invalidates per measured run
        if (cached != null) graft.util.deleteRecursively(cached._2)
        val path = java.nio.file.Files.createTempDirectory("graft_gram_idx").toString
        writeGramIndex(s, dir, path)
        gramIndexCache.put(key, (fp, path))
        path
      }
    }

  def clearGramIndexCache(): Unit =
    gramIndexCache.synchronized {
      gramIndexCache.forEach((_, v) => graft.util.deleteRecursively(v._2))
      gramIndexCache.clear()
    }

  /** Probe a persisted gram index with ARBITRARY documents (doc_id,
    * text) — the reusable core: the declared batch query feeds it the
    * deterministic split, and `Pipeline.streamDedupIncremental` feeds it
    * each streaming micro-batch (stream-static probe, the live-ingest
    * dedup shape). One equi-join on gh + one pair groupBy + two 1:1
    * size joins; everything keys on gh or doc id (scaling keys). */
  def probeGramIndex(s: SparkSession, docs: DataFrame,
      indexPath: String): DataFrame =
    probeGramShared(s, docs, indexPath)
      .select(col("new_id"), col("dup_of"),
        r4(col("shared").cast(DoubleType) / (col("n_new") + col("n_old") - col("shared")))
          .as("jaccard"))
      .where(col("jaccard") >= JaccardThreshold)

  /** the probes' common front: (new_id, dup_of, shared, n_new, n_old)
    * against the persisted index — the at-rest twin of
    * [[sharedGramCounts]], scored by [[probeGramIndex]] (Jaccard) and
    * [[probeGramIndexContainment]] */
  private def probeGramShared(s: SparkSession, docs: DataFrame,
      indexPath: String): DataFrame = {
    graft.functions.TextExpressions.register(s)
    val batchSh = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("grams",
        graft.functions.TextExpressions.wordNgrams(col("toks"), 3))
    val batchG = batchSh
      .select(col("doc_id").as("new_id"), explode(col("grams")).as("gram"))
      .select(col("new_id"),
        graft.functions.TextExpressions.md5Prefix64(col("gram"), 15).as("gh"))
    val idx = s.read.parquet(s"$indexPath/grams")
      .select(col("gh"), col("doc_id").as("dup_of"))
    val sizes = s.read.parquet(s"$indexPath/sizes")
    val shared = batchG.join(idx, "gh")
      .groupBy("new_id", "dup_of").agg(count(lit(1)).as("shared"))
    shared
      .join(batchSh.select(col("doc_id").as("new_id"),
        size(col("grams")).cast(LongType).as("n_new")), "new_id")
      .join(sizes.select(col("doc_id").as("dup_of"), col("n_grams").as("n_old")), "dup_of")
  }

  /** Containment-scored probe of the SAME persisted gram index — the
    * incremental/serving twin of [[dedupContainment]]: an arriving doc
    * that is (mostly) a subset of an indexed doc — or that swallows a
    * small indexed doc whole — scores ~1 on shared/min even when the
    * Jaccard probe's shared/union stays below its threshold. Same single
    * gh equi-join + pair groupBy + two 1:1 size joins; `contained` names
    * the smaller gram set's doc id. One honesty note shared with the
    * Jaccard probe: `shared` counts INDEXED grams only, so corpus-wide
    * stop-grams (df > max_df, pruned at build) don't inflate scores. */
  def probeGramIndexContainment(s: SparkSession, docs: DataFrame,
      indexPath: String): DataFrame =
    probeGramShared(s, docs, indexPath)
      .select(col("new_id"), col("dup_of"),
        r4(col("shared").cast(DoubleType) / least(col("n_new"), col("n_old")))
          .as("containment"),
        when(col("n_new") <= col("n_old"), col("new_id")).otherwise(col("dup_of"))
          .as("contained"))
      .where(col("containment") >= ContainmentThreshold)

  // Sorted here, not in the probe — see dedupSimhashIncremental.
  def dedupIncrementalAgainst(s: SparkSession, dir: String,
      indexPath: String): DataFrame =
    probeGramIndex(s,
      t(s, dir, "documents")
        .where(col("doc_id") % IncrementalMod === IncrementalRem)
        .select("doc_id", "text"),
      indexPath)
      .orderBy("new_id", "dup_of")

  def dedupIncremental(s: SparkSession, dir: String): DataFrame =
    dedupIncrementalAgainst(s, dir, gramIndexPath(s, dir))

  /** public handle for streaming/serving callers that manage their own
    * index location ([[gramIndexPath]] memoizes per input fingerprint) */
  def ensureGramIndex(s: SparkSession, dir: String): String =
    gramIndexPath(s, dir)

  // Sorted here, not in the probe — the dedupSimhashIncremental discipline.
  def dedupContainmentIncremental(s: SparkSession, dir: String): DataFrame =
    probeGramIndexContainment(s,
      t(s, dir, "documents")
        .where(col("doc_id") % IncrementalMod === IncrementalRem)
        .select("doc_id", "text"),
      gramIndexPath(s, dir))
      .orderBy("new_id", "dup_of")

  /** CTE chain ending in `shared(new_id, dup_of, shared)` + `sizes` —
    * the oracle twin of [[probeGramShared]] on the deterministic split,
    * reused by both incremental-probe oracles */
  private val incrementalSharedCte =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |grams AS (
       |  SELECT doc_id, gram FROM (
       |    SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS gram
       |    FROM toks JOIN generate_series(1, 100000) g(i) ON i <= len(tk) - 2
       |    WHERE len(tk) >= 3
       |    UNION
       |    SELECT doc_id, array_to_string(tk, ' ') AS gram FROM toks WHERE len(tk) < 3)),
       |gh AS (SELECT doc_id, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh FROM grams),
       |sizes AS (SELECT doc_id, count(*) AS n FROM gh GROUP BY 1),
       |corpus AS (SELECT * FROM gh WHERE doc_id % $IncrementalMod <> $IncrementalRem),
       |cdf AS (SELECT gh, count(*) AS df FROM corpus GROUP BY 1),
       |idx AS (SELECT c.doc_id, c.gh FROM corpus c JOIN cdf USING (gh)
       |        WHERE df <= $JaccardMaxDf),
       |batch AS (SELECT * FROM gh WHERE doc_id % $IncrementalMod = $IncrementalRem),
       |shared AS (SELECT b.doc_id AS new_id, i.doc_id AS dup_of, count(*) AS shared
       |           FROM batch b JOIN idx i USING (gh) GROUP BY 1, 2)""".stripMargin

  val dedupIncrementalSql =
    s"""WITH $incrementalSharedCte
       |SELECT new_id, dup_of, jaccard FROM (
       |  SELECT new_id, dup_of,
       |    CAST(round(shared::DOUBLE / (ns.n + no.n - shared), 4) AS DOUBLE) AS jaccard
       |  FROM shared JOIN sizes ns ON shared.new_id = ns.doc_id
       |              JOIN sizes no ON shared.dup_of = no.doc_id) j
       |WHERE jaccard >= $JaccardThreshold ORDER BY new_id, dup_of""".stripMargin

  val dedupContainmentIncrementalSql =
    s"""WITH $incrementalSharedCte
       |SELECT new_id, dup_of, containment, contained FROM (
       |  SELECT new_id, dup_of,
       |    CAST(round(shared::DOUBLE / least(ns.n, no.n), 4) AS DOUBLE) AS containment,
       |    CASE WHEN ns.n <= no.n THEN new_id ELSE dup_of END AS contained
       |  FROM shared JOIN sizes ns ON shared.new_id = ns.doc_id
       |              JOIN sizes no ON shared.dup_of = no.doc_id) c
       |WHERE containment >= $ContainmentThreshold ORDER BY new_id, dup_of""".stripMargin

  // ---- incremental MinHash dedup against a persisted band index --------
  /** The MinHash family's at-rest/incremental story — with this, EVERY
    * dedup family has one (exact is trivially incremental; Jaccard:
    * [[writeGramIndex]]; SimHash: [[writeSimhashIndex]]; semantic:
    * `Similarity.writeSemanticIndex`). The corpus split's LSH band
    * buckets AND full 16-perm signatures persist once under the
    * cross-engine md5 universal-hash family ([[md5SigsOf]] — the same
    * arithmetic [[dedupMinhashBands]] hard-oracles), so arriving batches
    * signature map-side, probe `bands/` with one (band, bh) equi-join,
    * and verify candidates by signature overlap against `sigs/` — the
    * [[dedupMinhash]] estimate contract (matching perms / 16 ≥ 0.5,
    * exact k/16 doubles, no rounding needed) with work scaling in the
    * batch. Write-time [[MinhashMaxBucket]] truncation (smallest
    * doc_ids) bounds probe fan-out by construction, the index twin of
    * the batch operator's representative pairing. */
  def writeMinhashIndex(s: SparkSession, dir: String, indexPath: String,
      maxBucket: Int = MinhashMaxBucket): Unit = {
    val corpus = shingled(s, dir)
      .where(col("doc_id") % IncrementalMod =!= IncrementalRem)
    md5SigsOf(corpus.select(col("doc_id"), explode(col("grams")).as("gram")))
      .write.mode("overwrite").parquet(s"$indexPath/sigs")
    // bands derive from the just-written sigs (like the IVF+PQ layout's
    // pq/ readback) so the signature aggregation runs once, not twice
    import s.implicits._
    def bands = bandsOfSigs(s.read.parquet(s"$indexPath/sigs"))
    bands
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("band", "bh").orderBy("doc_id")))
      .where(col("rn") <= maxBucket)
      .select("band", "bh", "doc_id")
      .repartition(col("band"), col("bh"))
      .write.mode("overwrite").parquet(s"$indexPath/bands")
    val capDf = Seq(maxBucket.toLong).toDF("cap")
    writeIndexMetaWithProfile(s, indexPath,
      capDf.select(lit("max_bucket").as("key"), col("cap").as("value"))
        .unionByName(occupancyProfile(
          bands.groupBy("band", "bh").agg(count(lit(1)).as("n")).select("n"),
          capDf)))
    warnIfOverCap(s, indexPath, "minhash", maxBucket.toLong)
  }

  /** Add-after-build maintenance for the MinHash band index — see
    * [[appendSimhashIndex]] for the shared design (append-only files,
    * cap respected across builds, new-doc_id caller contract). Two
    * appends mirror the two-directory layout: ALL new signatures land
    * in `sigs/` (verification reads it by candidate dup_of, so a doc
    * whose band entries were cap-truncated is simply never a
    * candidate, exactly as at build time), while `bands/` takes only
    * the entries that fit under [[MinhashMaxBucket]] given current
    * bucket occupancy. */
  def appendMinhashIndex(s: SparkSession, indexPath: String,
      docs: DataFrame): Long = {
    graft.functions.TextExpressions.register(s)
    val maxBucket = readIndexMeta(s, indexPath, "max_bucket", MinhashMaxBucket.toLong)
    // O(batch) rows, checkpointed: the shingle+signature aggregation is
    // the append's expensive stage and feeds BOTH the sigs/ write and
    // the band derivation — without the pin it would run twice
    val newSigs = md5SigsOf(docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("grams",
        graft.functions.TextExpressions.wordNgrams(col("toks"), 3))
      .select(col("doc_id"), explode(col("grams")).as("gram")))
      .localCheckpoint()
    newSigs.write.mode("append").parquet(s"$indexPath/sigs")
    val occupancy = s.read.parquet(s"$indexPath/bands")
      .groupBy("band", "bh").agg(count(lit(1)).as("n_have"))
    // bands derive from a fresh signature aggregation rather than a
    // sigs/ readback — the build-time readback trick would re-scan the
    // WHOLE corpus's signatures here, not just the batch's
    val batchBands = bandsOfSigs(newSigs).localCheckpoint()
    val total = batchBands.count()
    val admitted = batchBands
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("band", "bh").orderBy("doc_id")))
      .join(occupancy, Seq("band", "bh"), "left")
      .where(col("rn") + coalesce(col("n_have"), lit(0L)) <= maxBucket)
      .select("band", "bh", "doc_id")
      .localCheckpoint()
    val kept = admitted.count()
    admitted
      .repartition(col("band"), col("bh"))
      .write.mode("append").parquet(s"$indexPath/bands")
    val dropped = total - kept
    if (total >= BandWarnMinEntries &&
        dropped.toDouble / total > BandOverCapWarnFraction)
      log.warn(s"minhash index at $indexPath: append rejected $dropped of " +
        s"$total band entries at cap $maxBucket — the corpus has outgrown " +
        s"the cap this index was built with; rebuild with a higher cap " +
        s"(see q_dedup_bucket_stats / tools.CapSweep)")
    dropped
  }

  /** Probe the persisted MinHash index with ARBITRARY documents (doc_id,
    * text): shingle + signature map-side, one (band, bh) equi-join for
    * candidates, overlap verification via two 1:1 signature joins.
    * Shared by the declared incremental query and
    * `Pipeline.streamMinhashDedup` (stream ≡ batch). */
  def probeMinhashIndex(s: SparkSession, docs: DataFrame,
      indexPath: String): DataFrame = {
    graft.functions.TextExpressions.register(s)
    val bsigs = md5SigsOf(docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("grams", graft.functions.TextExpressions.wordNgrams(col("toks"), 3))
      .select(col("doc_id"), explode(col("grams")).as("gram")))
    val nb = bsigs.select(col("doc_id").as("new_id") +:
      (0 until MinhashPerms).map(j => col(s"s$j").as(s"ns$j")): _*)
    val nbands = bandsOfSigs(bsigs)
      .select(col("doc_id").as("new_id"), col("band"), col("bh"))
    val idx = s.read.parquet(s"$indexPath/bands")
      .select(col("band"), col("bh"), col("doc_id").as("dup_of"))
    val osigs = s.read.parquet(s"$indexPath/sigs")
      .select(col("doc_id").as("dup_of") +:
        (0 until MinhashPerms).map(j => col(s"s$j").as(s"os$j")): _*)
    nbands.join(idx, Seq("band", "bh"))
      .select("new_id", "dup_of").distinct()
      .join(nb, "new_id")
      .join(osigs, "dup_of")
      .select(col("new_id"), col("dup_of"),
        ((0 until MinhashPerms)
          .map(j => when(col(s"ns$j") === col(s"os$j"), 1).otherwise(0))
          .reduce(_ + _) / lit(16.0d)).as("est_jaccard"))
      .where(col("est_jaccard") >= 0.5)
  }

  private val minhashIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (String, String)]()

  def ensureMinhashIndex(s: SparkSession, dir: String): String =
    minhashIndexCache.synchronized {
      val key = (s, dir)
      val fp = graft.util.inputFingerprint(dir, "documents.parquet")
      val cached = minhashIndexCache.get(key)
      if (cached != null && cached._1 == fp) cached._2
      else {
        if (cached != null) graft.util.deleteRecursively(cached._2)
        val path = java.nio.file.Files.createTempDirectory("graft_minhash_idx").toString
        writeMinhashIndex(s, dir, path)
        minhashIndexCache.put(key, (fp, path))
        path
      }
    }

  def clearMinhashIndexCache(): Unit =
    minhashIndexCache.synchronized {
      minhashIndexCache.forEach((_, v) => graft.util.deleteRecursively(v._2))
      minhashIndexCache.clear()
    }

  // Sorted here, not in the probe — see dedupSimhashIncremental.
  def dedupMinhashIncremental(s: SparkSession, dir: String): DataFrame =
    probeMinhashIndex(s,
      t(s, dir, "documents")
        .where(col("doc_id") % IncrementalMod === IncrementalRem)
        .select("doc_id", "text"),
      ensureMinhashIndex(s, dir))
      .orderBy("new_id", "dup_of")

  /** Recall eval for the INCREMENTAL MinHash probe — the
    * [[dedupSimhashIncrRecall]] twin for the LSH band family: truth =
    * batch-split probes verified (est_jaccard ≥ 0.5) against an UNCAPPED
    * corpus band index, found = against the [[MinhashMaxBucket]]-capped
    * form the persisted index serves. Same exact-subset structure, same
    * single metrics row, fully oracle-replayed. */
  def dedupMinhashIncrRecall(s: SparkSession, dir: String): DataFrame = {
    val sigs = md5SigsOf(shingled(s, dir)
      .select(col("doc_id"), explode(col("grams")).as("gram")))
      .localCheckpoint()
    val bands = bandsOfSigs(sigs)
    val corpusBands = bands.where(col("doc_id") % IncrementalMod =!= IncrementalRem)
    val probeBands = bands.where(col("doc_id") % IncrementalMod === IncrementalRem)
      .select(col("doc_id").as("new_id"), col("band"), col("bh"))
    val np = sigs.select(col("doc_id").as("new_id") +:
      (0 until MinhashPerms).map(j => col(s"s$j").as(s"ns$j")): _*)
    val os = sigs.select(col("doc_id").as("dup_of") +:
      (0 until MinhashPerms).map(j => col(s"s$j").as(s"os$j")): _*)
    def verified(idx: DataFrame): DataFrame =
      probeBands.join(idx.select(col("band"), col("bh"),
          col("doc_id").as("dup_of")), Seq("band", "bh"))
        .select("new_id", "dup_of").distinct()
        .join(np, "new_id")
        .join(os, "dup_of")
        .select(col("new_id"), col("dup_of"),
          ((0 until MinhashPerms)
            .map(j => when(col(s"ns$j") === col(s"os$j"), 1).otherwise(0))
            .reduce(_ + _) / lit(16.0d)).as("est_jaccard"))
        .where(col("est_jaccard") >= 0.5)
        .select("new_id", "dup_of")
    val capped = corpusBands
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("band", "bh").orderBy("doc_id")))
      .where(col("rn") <= MinhashMaxBucket)
    verified(corpusBands).agg(count(lit(1)).as("n_truth"))
      .crossJoin(broadcast(verified(capped).agg(count(lit(1)).as("n_found"))))
      .select(col("n_truth"), col("n_found"),
        (col("n_truth") - col("n_found")).as("n_missed"),
        when(col("n_truth") > 0,
          r4(col("n_found").cast(DoubleType) / col("n_truth"))).as("recall"))
  }

  val dedupMinhashIncrRecallSql: String = {
    val overlap = (0 until MinhashPerms)
      .map(j => s"CASE WHEN a.s$j = b.s$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |grams AS (
       |  SELECT doc_id, gram FROM (
       |    SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS gram
       |    FROM toks JOIN generate_series(1, 100000) g(i) ON i <= len(tk) - 2
       |    WHERE len(tk) >= 3
       |    UNION
       |    SELECT doc_id, array_to_string(tk, ' ') AS gram FROM toks WHERE len(tk) < 3)),
       |$md5BandsCtes,
       |corpus AS (SELECT band, bh, doc_id FROM bands
       |  WHERE doc_id % $IncrementalMod <> $IncrementalRem),
       |capped AS (
       |  SELECT band, bh, doc_id FROM (
       |    SELECT band, bh, doc_id,
       |      row_number() OVER (PARTITION BY band, bh ORDER BY doc_id) AS rn
       |    FROM corpus) x
       |  WHERE rn <= $MinhashMaxBucket),
       |probe AS (
       |  SELECT band, bh, doc_id AS new_id FROM bands
       |  WHERE doc_id % $IncrementalMod = $IncrementalRem),
       |truth AS (
       |  SELECT c.new_id, c.dup_of FROM (
       |    SELECT DISTINCT p.new_id, i.doc_id AS dup_of
       |    FROM probe p JOIN corpus i ON p.band = i.band AND p.bh = i.bh) c
       |  JOIN sigs a ON a.doc_id = c.new_id
       |  JOIN sigs b ON b.doc_id = c.dup_of
       |  WHERE ($overlap) / 16.0 >= 0.5),
       |found AS (
       |  SELECT c.new_id, c.dup_of FROM (
       |    SELECT DISTINCT p.new_id, i.doc_id AS dup_of
       |    FROM probe p JOIN capped i ON p.band = i.band AND p.bh = i.bh) c
       |  JOIN sigs a ON a.doc_id = c.new_id
       |  JOIN sigs b ON b.doc_id = c.dup_of
       |  WHERE ($overlap) / 16.0 >= 0.5),
       |m AS (SELECT
       |  (SELECT count(*) FROM truth) AS n_truth,
       |  (SELECT count(*) FROM found) AS n_found)
       |SELECT n_truth::BIGINT AS n_truth, n_found::BIGINT AS n_found,
       |  (n_truth - n_found)::BIGINT AS n_missed,
       |  CASE WHEN n_truth > 0
       |    THEN CAST(round(n_found::DOUBLE / n_truth, 4) AS DOUBLE) END AS recall
       |FROM m""".stripMargin
  }

  val dedupMinhashIncrementalSql: String = {
    val overlap = (0 until MinhashPerms)
      .map(j => s"CASE WHEN a.s$j = b.s$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |grams AS (
       |  SELECT doc_id, gram FROM (
       |    SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS gram
       |    FROM toks JOIN generate_series(1, 100000) g(i) ON i <= len(tk) - 2
       |    WHERE len(tk) >= 3
       |    UNION
       |    SELECT doc_id, array_to_string(tk, ' ') AS gram FROM toks WHERE len(tk) < 3)),
       |$md5BandsCtes,
       |idx AS (
       |  SELECT band, bh, doc_id FROM (
       |    SELECT band, bh, doc_id,
       |      row_number() OVER (PARTITION BY band, bh ORDER BY doc_id) AS rn
       |    FROM bands WHERE doc_id % $IncrementalMod <> $IncrementalRem) x
       |  WHERE rn <= $MinhashMaxBucket),
       |probe AS (
       |  SELECT band, bh, doc_id AS new_id FROM bands
       |  WHERE doc_id % $IncrementalMod = $IncrementalRem),
       |cand AS (
       |  SELECT DISTINCT p.new_id, i.doc_id AS dup_of
       |  FROM probe p JOIN idx i ON p.band = i.band AND p.bh = i.bh),
       |est AS (
       |  SELECT c.new_id, c.dup_of, ($overlap) / 16.0 AS est_jaccard
       |  FROM cand c
       |  JOIN sigs a ON a.doc_id = c.new_id
       |  JOIN sigs b ON b.doc_id = c.dup_of)
       |SELECT new_id, dup_of, est_jaccard FROM est
       |WHERE est_jaccard >= 0.5 ORDER BY new_id, dup_of""".stripMargin
  }

  // ---- exact substring dedup (Lee et al. 2022) ------------------------

  /** Minimum duplicated-substring length in characters. Lee et al. 2022
    * ("Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499 §4.1) remove every substring of ≥ 50 BPE tokens
    * that re-occurs anywhere in the corpus, via a suffix array. This
    * engine reaches the same verdict set with corpus-global character
    * L-gram fingerprints instead: every duplicated run of ≥ L characters
    * covers ≥ 1 shared L-gram occurrence at each position of the run, so
    * marking every position whose L-gram re-occurs and unioning the
    * [pos, pos+L) intervals reconstructs the duplicated region EXACTLY
    * (for runs ≥ L; shorter overlaps are below the threshold by
    * definition). A flat gram relation shuffles and scales where a
    * distributed suffix array does not. */
  val SubstrL = 30

  /** One row per character position whose L-gram re-occurs ANYWHERE in
    * the corpus, excluding each gram's first occurrence under the total
    * (doc_id, pos) order — the keep-first exemption that leaves exactly
    * one copy of every duplicated substring in the cleaned corpus.
    *
    * Scale shape: the gram string is hashed to a 16-byte md5 IN THE SCAN
    * STAGE (one explode over a length-L index sequence, substring +
    * md5 + unhex in the same codegen stage — the repetitionRatio
    * discipline), so the single shuffle carries (16 B, doc_id, pos) per
    * position: the known ~const-factor amplification every substring-
    * level dedup pays (a suffix array shuffles the same O(N) rows).
    * First-occurrence detection is ONE row_number window partitioned by
    * the hash — a scaling key with tiny (duplicate-count) partitions —
    * not a groupBy + self-join, which would shuffle the gram table
    * twice. */
  def dupSubstrPositionsOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    substrGramsOf(docs)
      .withColumn("rn", row_number().over(
        Window.partitionBy("h").orderBy("doc_id", "pos")))
      .where(col("rn") >= 2)
      .select("doc_id", "pos")
  }

  /** duplicated positions → merged 1-based [span_start, span_end) char
    * intervals per doc: gaps-and-islands over a doc_id-partitioned
    * window (scaling key; the repetitionGopher interval-union shape) —
    * running max of interval end over preceding rows, island id =
    * running count of gap openings, one groupBy per island */
  def substringSpansOf(positions: DataFrame): DataFrame =
    substringSpansOf(positions, SubstrL)

  /** mergeGap variant: consecutive marked positions ≤ `mergeGap` apart
    * join one island (span_end stays pos + L). The exact pass uses
    * mergeGap = L — the sound union of certainly-duplicated intervals.
    * The WINNOW paths need mergeGap = max(L, w): within a shared run,
    * consecutive selected positions are ≤ w apart (the winnow window
    * guarantee), so at w > L the L-gap merge fragments one long run
    * into islands with spurious ≤ w−L char holes — the round-13
    * long-run sweep measured that as char recall 0.59 at w = 50 where
    * the runs themselves were fully detected. Bridging at w repairs it;
    * the cost is ≤ w−L possibly-non-duplicated chars absorbed between
    * two marked runs closer than w, the standard winnowing
    * over-approximation (Schleimer 2003 §4's t-guarantee trades the
    * same slack). At the shipped w = 5 < L this is exactly the L merge. */
  def substringSpansOf(positions: DataFrame, mergeGap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wd = Window.partitionBy("doc_id").orderBy("pos")
    positions
      .withColumn("pm", max(col("pos") + lit(mergeGap.toLong)).over(
        wd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("isl", sum(when(col("pm").isNull || col("pos") > col("pm"),
        1L).otherwise(0L)).over(wd))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + SubstrL).as("span_end"))
      .select("doc_id", "span_start", "span_end")
  }

  /** the winnow paths' island merge gap — ≡ L at the shipped w */
  def winnowMergeGap: Int = winnowMergeGap(WinnowW)

  /** merge gap for a caller-chosen window ([[writeWinnowIndex]]'s `w`
    * dial): max(L, w), per the fragmentation analysis above */
  def winnowMergeGap(w: Int): Int = math.max(SubstrL, w)

  /** the SQL island chain shared by every substring oracle: positions
    * CTE `d(doc_id, pos)` → merged spans CTE `spans` */
  private def substrSpanCtes: String =
    s"""w AS (
       |  SELECT doc_id, pos, max(pos + $SubstrL) OVER (PARTITION BY doc_id
       |    ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
       |  FROM d),
       |isl AS (
       |  SELECT doc_id, pos, sum(CASE WHEN pm IS NULL OR pos > pm THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY doc_id ORDER BY pos) AS isl
       |  FROM w),
       |spans AS (
       |  SELECT doc_id, min(pos) AS span_start, max(pos) + $SubstrL AS span_end
       |  FROM isl GROUP BY doc_id, isl)""".stripMargin

  private def substrGramCte(pred: String = ""): String =
    s"""g AS (
       |  SELECT doc_id, i AS pos, md5(substr(text, i::INT, $SubstrL)) AS h
       |  FROM documents JOIN generate_series(1, 100000) t(i)
       |    ON i <= length(text) - ${SubstrL - 1}$pred)""".stripMargin

  /** corpus span frame memoized per (session, dir, input fingerprint)
    * with a lazy localCheckpoint — the clusterLabels discipline: four
    * declared queries (spans/stats/apply/residual) share this exact
    * frame, and residual derives it twice in ONE call (orig side + the
    * embedded apply), so even under the bench's per-query cache clear
    * the memo pays. Checkpoint blocks are unpersisted on replace/clear
    * exactly like the labels cache. */
  private val spansCache =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), (String, DataFrame, Option[org.apache.spark.rdd.RDD[_]])]()

  private def corpusSubstringSpans(s: SparkSession, dir: String): DataFrame =
    spansCache.synchronized {
      val key = (s, dir)
      val fp = graft.util.inputFingerprint(dir, "documents.parquet")
      val cached = spansCache.get(key)
      if (cached != null && cached._1 == fp) cached._2
      else {
        if (cached != null)
          cached._3.foreach(r => try r.unpersist(false) catch { case _: Throwable => })
        val spans = substringSpansOf(dupSubstrPositionsOf(
          t(s, dir, "documents").select("doc_id", "text")))
          .localCheckpoint(false)
        spansCache.put(key, (fp, spans, checkpointRdd(spans)))
        spans
      }
    }

  def clearSubstringSpansCache(): Unit = spansCache.synchronized {
    spansCache.forEach { (_, v) =>
      v._3.foreach(r => try r.unpersist(false) catch { case _: Throwable => })
    }
    spansCache.clear()
  }

  /** Declared query: merged duplicated spans (doc_id, span_start,
    * span_end), keep-first exemption applied — the removal plan the
    * apply step executes. */
  def dedupSubstring(s: SparkSession, dir: String): DataFrame =
    corpusSubstringSpans(s, dir)
      .orderBy("doc_id", "span_start")

  val dedupSubstringSql: String =
    s"""WITH ${substrGramCte()},
       |r AS (
       |  SELECT doc_id, pos,
       |    row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
       |  FROM g),
       |d AS (SELECT doc_id, pos FROM r WHERE rn >= 2),
       |$substrSpanCtes
       |SELECT doc_id, span_start, span_end FROM spans
       |ORDER BY doc_id, span_start""".stripMargin

  /** Declared query: per-doc removal pressure — how much of each doc the
    * substring pass deletes (all docs; zeros where nothing matched).
    * The corpus-health dashboard row operators watch while tuning L. */
  def dedupSubstringStats(s: SparkSession, dir: String): DataFrame = {
    val st = corpusSubstringSpans(s, dir)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start")).as("dup_chars"))
    t(s, dir, "documents")
      .select(col("doc_id"), length(col("text")).cast(LongType).as("n_chars"))
      .join(st, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
        r4f(coalesce(col("dup_chars"), lit(0L)).cast(DoubleType) /
          col("n_chars")).as("dup_ratio"))
      .orderBy("doc_id")
  }

  val dedupSubstringStatsSql: String =
    s"""WITH ${substrGramCte()},
       |r AS (
       |  SELECT doc_id, pos,
       |    row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
       |  FROM g),
       |d AS (SELECT doc_id, pos FROM r WHERE rn >= 2),
       |$substrSpanCtes,
       |st AS (
       |  SELECT doc_id, count(*) AS n_spans,
       |    sum(span_end - span_start) AS dup_chars
       |  FROM spans GROUP BY doc_id)
       |SELECT doc.doc_id, length(doc.text) AS n_chars,
       |  coalesce(st.n_spans, 0)::BIGINT AS n_spans,
       |  coalesce(st.dup_chars, 0)::BIGINT AS dup_chars,
       |  CAST(floor(coalesce(st.dup_chars, 0)::DOUBLE / length(doc.text)
       |    * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE AS DOUBLE) AS dup_ratio
       |FROM documents doc LEFT JOIN st ON doc.doc_id = st.doc_id
       |ORDER BY doc.doc_id""".stripMargin

  /** Declared query: the cleaned corpus — duplicated spans cut out, kept
    * segments re-joined in order. Segment extraction is a per-row
    * substring; re-assembly is one groupBy(doc_id) whose per-group state
    * is bounded by the doc's own span count (sort_array over the
    * collected (offset, segment) structs — no ordered string_agg needed,
    * no window over raw text). Docs without spans pass through via the
    * left join. */
  def dedupSubstringApply(s: SparkSession, dir: String): DataFrame =
    cutSpans(t(s, dir, "documents").select(col("doc_id"), col("text")),
        corpusSubstringSpans(s, dir))
      .select(col("doc_id"),
        length(col("text")).cast(LongType).as("orig_len"),
        length(col("ct")).cast(LongType).as("clean_len"),
        col("ct").as("clean_text"))
      .orderBy("doc_id")

  /** the apply CORE over ANY (doc_id, text) frame: cut merged spans out,
    * kept segments re-joined in order, docs without spans pass through —
    * returns (doc_id, text = original, ct = cleaned). Shared by the
    * declared apply and [[dedupSubstringToConvergence]]'s passes. */
  private def cutSpans(docs: DataFrame, sp: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wd = Window.partitionBy("doc_id").orderBy("span_start")
    // kept segments: [prev span_end, span_start) per span (head default
    // 1), plus the tail [max span_end, len + 1)
    val mids = sp
      .withColumn("ks", lag(col("span_end"), 1, 1L).over(wd))
      .select(col("doc_id"), col("ks"), col("span_start").as("ke"))
    val tails = sp.groupBy("doc_id")
      .agg(max(col("span_end")).as("ks"))
      .select(col("doc_id"), col("ks"), lit(null).cast(LongType).as("ke"))
    val segs = mids.unionByName(tails)
      .join(docs, Seq("doc_id"))
      .select(col("doc_id"), col("ks"), expr(
        "substring(text, cast(ks AS INT), cast(coalesce(ke, length(text) + 1) - ks AS INT))")
        .as("seg"))
    val cleaned = segs.groupBy("doc_id")
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("ks"), col("seg")))),
        x => x.getField("seg"))).as("ct"))
    docs.join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"),
        coalesce(col("ct"), col("text")).as("ct"))
  }

  /** Iterate the exact-substring cut to a FIXED POINT. One apply pass
    * removes every non-canonical occurrence of every ORIGINAL duplicated
    * gram (keep-first is exhaustive over the input), but cutting a span
    * makes its flanks adjacent, and the ≤ L−1 JUNCTION grams so created
    * can collide with surviving text — the reason Lee et al. 2022 (§4.1,
    * "we repeat this process") re-run the pass until nothing is removed.
    * `q_dedup_substring_residual` PRICES that leftover; this is the loop
    * that spends it: re-derive duplicated spans on the cleaned text and
    * re-cut until residual duplicated chars ≤ `epsChars` or `maxPasses`
    * passes ran. Convergence argument: each pass strictly removes all
    * currently-duplicated non-canonical mass, and the only new
    * duplicated mass it can mint is junction grams — bounded by
    * (spans cut) × (L−1) chars, a geometric collapse on real text, so
    * two passes settle ordinary corpora (the spec pins a planted
    * junction-collision corpus converging in exactly 2).
    *
    * Scale: each pass is the same bounded pipeline as the declared apply
    * (one gram-hash shuffle + one doc-keyed rebuild); the inter-pass
    * `localCheckpoint` truncates lineage so pass N's plan does not
    * re-derive passes 1..N−1, and the per-pass residual read is ONE
    * 1-row aggregate — the loop keeps no driver state beyond counters.
    * Returns (cleaned (doc_id, text), passes run, residual dup chars). */
  def dedupSubstringToConvergence(docs: DataFrame, maxPasses: Int = 3,
      epsChars: Long = 0L): (DataFrame, Int, Long) =
    dedupSubstringToConvergenceWith(docs,
      d => substringSpansOf(dupSubstrPositionsOf(d)), maxPasses, epsChars)

  /** [[dedupSubstringToConvergence]] under a CALLER-CHOSEN span
    * derivation — the winnow production dial's apply path: pass
    * `d => substringSpansOf(winnowDupPositionsOf(d, w), winnowMergeGap(w))`
    * to iterate the ~2/(w+1)-row winnowed cut to ITS fixed point (the
    * residual then measures what winnow selection can still see, the
    * honest convergence notion for the dial — runs below L+w−1 are
    * out of scope by contract, not leftover). */
  def dedupSubstringToConvergenceWith(docs: DataFrame,
      spansOf: DataFrame => DataFrame, maxPasses: Int = 3,
      epsChars: Long = 0L): (DataFrame, Int, Long) = {
    require(maxPasses >= 1, "need at least one pass")
    var cur = docs.select(col("doc_id"), col("text"))
    var curRdd: Option[org.apache.spark.rdd.RDD[_]] = None
    var passes = 0
    var residual = Long.MaxValue
    def drop(r: Option[org.apache.spark.rdd.RDD[_]]): Unit =
      r.foreach(x => try x.unpersist(false) catch { case _: Throwable => })
    while (passes < maxPasses && residual > epsChars) {
      val spans = spansOf(cur)
        .localCheckpoint(true)
      residual = spans
        .agg(coalesce(sum(col("span_end") - col("span_start")), lit(0L)))
        .first().getLong(0)
      if (residual > epsChars) {
        val next = cutSpans(cur, spans)
          .select(col("doc_id"), col("ct").as("text"))
          .localCheckpoint(true) // eager: safe to release the inputs below
        drop(checkpointRdd(spans))
        drop(curRdd)
        curRdd = checkpointRdd(next)
        cur = next
        passes += 1
      } else drop(checkpointRdd(spans))
    }
    // the post-loop residual of the LAST cut (0 when the loop exited on
    // a clean measure; re-measured when it exited on maxPasses)
    if (residual > epsChars) {
      residual = spansOf(cur)
        .agg(coalesce(sum(col("span_end") - col("span_start")), lit(0L)))
        .first().getLong(0)
    }
    (cur, passes, residual)
  }

  val dedupSubstringApplySql: String =
    s"""WITH ${substrGramCte()},
       |r AS (
       |  SELECT doc_id, pos,
       |    row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
       |  FROM g),
       |d AS (SELECT doc_id, pos FROM r WHERE rn >= 2),
       |$substrSpanCtes,
       |mids AS (
       |  SELECT doc_id,
       |    coalesce(lag(span_end) OVER (PARTITION BY doc_id ORDER BY span_start),
       |      1) AS ks,
       |    span_start AS ke
       |  FROM spans),
       |tails AS (
       |  SELECT doc_id, max(span_end) AS ks, NULL AS ke FROM spans GROUP BY doc_id),
       |segs AS (
       |  SELECT sg.doc_id, sg.ks,
       |    substr(doc.text, sg.ks::INT,
       |      (coalesce(sg.ke, length(doc.text) + 1) - sg.ks)::INT) AS seg
       |  FROM (SELECT * FROM mids UNION ALL SELECT * FROM tails) sg
       |  JOIN documents doc ON doc.doc_id = sg.doc_id),
       |cleaned AS (
       |  SELECT doc_id, string_agg(seg, '' ORDER BY ks) AS ct
       |  FROM segs GROUP BY doc_id)
       |SELECT doc.doc_id, length(doc.text) AS orig_len,
       |  length(coalesce(c.ct, doc.text)) AS clean_len,
       |  coalesce(c.ct, doc.text) AS clean_text
       |FROM documents doc LEFT JOIN cleaned c ON doc.doc_id = c.doc_id
       |ORDER BY doc.doc_id""".stripMargin

  /** Minimum shared L-grams for a doc pair to surface in
    * [[dedupSubstringPairs]] — 5 grams ≈ shared runs ≥ L + 4 chars,
    * filtering isolated single-gram coincidences */
  val SubstrPairMinGrams = 5

  /** Declared query: doc-PAIR shared-substring mass — the bridge from
    * position-level substring dedup into the pair/cluster machinery the
    * other families feed (clusterLabels, keep-best, cross-source): each
    * non-canonical occurrence pairs its doc with the gram's canonical
    * doc (the first_value of the SAME h-window the marking pass uses —
    * no extra shuffle class), one groupBy counts shared grams per
    * (d1, d2). Within-doc repeats are excluded (src = self), so d1 < d2
    * always; fan-out is bounded by the marked-position count, never
    * quadratic in bucket size. */
  def dedupSubstringPairs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents").select("doc_id", "text")
    val wH = Window.partitionBy("h").orderBy("doc_id", "pos")
    substrGramsOf(docs)
      // In-plan shuffle width for the gram-hash sort (r19 finding): the
      // window's partition-local sort mass is ~1 gram row per text char
      // (~80x the compressed scan bytes in shuffle form), so leaving the
      // width to the session default put 12x/decade of pure sort/GC
      // pressure on the committed 32-partition bench config while 64-256
      // partitions sat at the family's 4.5x (tools.SubstrPairsSweep).
      // One partition per 256 KB of scan bytes — a PLAN-TIME statistic,
      // no job — keeps per-partition sorts bounded at any input scale;
      // the session default stays the floor so small inputs are
      // untouched, and the hash distribution (same key) means the window
      // adds no second exchange. Row-identical: width affects only
      // partition-local sort sizes, never the (h)-clustered semantics.
      .repartition(substrPairsWidth(s, docs), col("h"))
      .withColumn("rn", row_number().over(wH))
      .withColumn("src", first(col("doc_id")).over(wH))
      .where(col("rn") >= 2 && col("doc_id") =!= col("src"))
      .groupBy(col("src").as("d1"), col("doc_id").as("d2"))
      .agg(count(lit(1)).as("n_shared_grams"))
      .where(col("n_shared_grams") >= SubstrPairMinGrams)
      .orderBy("d1", "d2")
  }

  /** gram-hash shuffle width from the scan's own plan-time size stat:
    * clamp(scanBytes / 256 KB, session shuffle partitions, 65536) —
    * ~20 MB of gram-row sort mass per partition */
  private def substrPairsWidth(s: SparkSession, docs: DataFrame): Int = {
    val bytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    val session = s.conf.get("spark.sql.shuffle.partitions").toInt
    val target = (bytes / BigInt(256 * 1024)).min(BigInt(65536)).toInt
    math.max(session, target)
  }

  val dedupSubstringPairsSql: String =
    s"""WITH ${substrGramCte()},
       |r AS (
       |  SELECT doc_id, pos,
       |    row_number() OVER w AS rn,
       |    first_value(doc_id) OVER w AS src
       |  FROM g WINDOW w AS (PARTITION BY h ORDER BY doc_id, pos)),
       |pairs AS (
       |  SELECT src AS d1, doc_id AS d2, count(*) AS n_shared_grams
       |  FROM r WHERE rn >= 2 AND doc_id <> src
       |  GROUP BY 1, 2)
       |SELECT d1, d2, n_shared_grams FROM pairs
       |WHERE n_shared_grams >= $SubstrPairMinGrams
       |ORDER BY d1, d2""".stripMargin

  /** Declared query: cross-source substring leakage — the substring
    * family's twin of [[dedupCrossSource]]: which (source_a, source_b)
    * cells the shared-substring mass lands in. The provenance question a
    * corpus owner asks first ("is source X plagiarizing source Y, or is
    * the duplication intra-source boilerplate?"), answered from the same
    * pair frame [[dedupSubstringPairs]] emits — directional (d1 = the
    * canonical/kept doc's source), so the cells also say which source
    * loses text in the cut. */
  def dedupSubstringCrossSource(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "documents").select(col("doc_id"), col("source"))
    dedupSubstringPairs(s, dir)
      .join(src.select(col("doc_id").as("d1"), col("source").as("source_kept")), "d1")
      .join(src.select(col("doc_id").as("d2"), col("source").as("source_cut")), "d2")
      .groupBy("source_kept", "source_cut")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("n_shared_grams")).as("shared_grams"))
      .orderBy("source_kept", "source_cut")
  }

  val dedupSubstringCrossSourceSql: String =
    s"""WITH ${substrGramCte()},
       |r AS (
       |  SELECT doc_id, pos,
       |    row_number() OVER w AS rn,
       |    first_value(doc_id) OVER w AS src
       |  FROM g WINDOW w AS (PARTITION BY h ORDER BY doc_id, pos)),
       |pairs AS (
       |  SELECT src AS d1, doc_id AS d2, count(*) AS n_shared_grams
       |  FROM r WHERE rn >= 2 AND doc_id <> src
       |  GROUP BY 1, 2),
       |kept AS (SELECT * FROM pairs WHERE n_shared_grams >= $SubstrPairMinGrams)
       |SELECT a.source AS source_kept, b.source AS source_cut,
       |  count(*) AS n_pairs, sum(n_shared_grams)::BIGINT AS shared_grams
       |FROM kept JOIN documents a ON kept.d1 = a.doc_id
       |          JOIN documents b ON kept.d2 = b.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Declared query: the convergence audit — re-run the duplicate-span
    * chain on the CLEANED corpus and price what one apply pass leaves
    * behind, in ONE exact row (orig_dup_chars, residual_dup_chars,
    * residual_ratio). The removal itself cannot leave a non-canonical
    * copy of any original gram (keep-first removes them all), but
    * cutting a span makes its flanks adjacent, and the ≤ L−1 junction
    * grams so created can collide with surviving text — the iterative
    * aspect Lee et al. resolve by re-running; this instrument says
    * whether a second pass is worth scheduling on a given corpus. */
  def dedupSubstringResidual(s: SparkSession, dir: String): DataFrame = {
    def dupChars(spans: DataFrame, name: String): DataFrame =
      spans.agg(coalesce(sum(col("span_end") - col("span_start")), lit(0L))
        .as(name))
    val orig = dupChars(corpusSubstringSpans(s, dir), "orig_dup_chars")
    val cleaned = dedupSubstringApply(s, dir)
      .select(col("doc_id"), col("clean_text").as("text"))
    val resid = dupChars(substringSpansOf(dupSubstrPositionsOf(cleaned)),
      "residual_dup_chars")
    orig.crossJoin(resid)
      .select(col("orig_dup_chars"), col("residual_dup_chars"),
        when(col("orig_dup_chars") > 0,
          r4f(col("residual_dup_chars").cast(DoubleType) /
            col("orig_dup_chars"))).as("residual_ratio"))
  }

  val dedupSubstringResidualSql: String =
    s"""WITH ${substrGramCte()},
       |r AS (
       |  SELECT doc_id, pos,
       |    row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
       |  FROM g),
       |d AS (SELECT doc_id, pos FROM r WHERE rn >= 2),
       |$substrSpanCtes,
       |mids AS (
       |  SELECT doc_id,
       |    coalesce(lag(span_end) OVER (PARTITION BY doc_id ORDER BY span_start),
       |      1) AS ks,
       |    span_start AS ke
       |  FROM spans),
       |tails AS (
       |  SELECT doc_id, max(span_end) AS ks, NULL AS ke FROM spans GROUP BY doc_id),
       |segs AS (
       |  SELECT sg.doc_id, sg.ks,
       |    substr(doc.text, sg.ks::INT,
       |      (coalesce(sg.ke, length(doc.text) + 1) - sg.ks)::INT) AS seg
       |  FROM (SELECT * FROM mids UNION ALL SELECT * FROM tails) sg
       |  JOIN documents doc ON doc.doc_id = sg.doc_id),
       |cleaned AS (
       |  SELECT doc_id, string_agg(seg, '' ORDER BY ks) AS ct
       |  FROM segs GROUP BY doc_id),
       |cdocs AS (
       |  SELECT doc.doc_id, coalesce(c.ct, doc.text) AS text
       |  FROM documents doc LEFT JOIN cleaned c ON doc.doc_id = c.doc_id),
       |g2 AS (
       |  SELECT doc_id, i AS pos, md5(substr(text, i::INT, $SubstrL)) AS h
       |  FROM cdocs JOIN generate_series(1, 100000) t2(i)
       |    ON i <= length(text) - ${SubstrL - 1}),
       |r2 AS (
       |  SELECT doc_id, pos,
       |    row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
       |  FROM g2),
       |d2 AS (SELECT doc_id, pos FROM r2 WHERE rn >= 2),
       |w2 AS (
       |  SELECT doc_id, pos, max(pos + $SubstrL) OVER (PARTITION BY doc_id
       |    ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
       |  FROM d2),
       |isl2 AS (
       |  SELECT doc_id, pos, sum(CASE WHEN pm IS NULL OR pos > pm THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY doc_id ORDER BY pos) AS isl
       |  FROM w2),
       |spans2 AS (
       |  SELECT doc_id, min(pos) AS span_start, max(pos) + $SubstrL AS span_end
       |  FROM isl2 GROUP BY doc_id, isl),
       |o AS (SELECT coalesce(sum(span_end - span_start), 0)::BIGINT
       |        AS orig_dup_chars FROM spans),
       |q AS (SELECT coalesce(sum(span_end - span_start), 0)::BIGINT
       |        AS residual_dup_chars FROM spans2)
       |SELECT orig_dup_chars, residual_dup_chars,
       |  CASE WHEN orig_dup_chars > 0 THEN
       |    CAST(floor(residual_dup_chars::DOUBLE / orig_dup_chars
       |      * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE AS DOUBLE) END
       |    AS residual_ratio
       |FROM o, q""".stripMargin

  // -- winnowed variant: the 100 TB scale path --------------------------

  /** Winnowing window in GRAMS (Schleimer, Wilkerson & Aiken 2003,
    * "Winnowing: Local Algorithms for Document Fingerprinting", §4).
    * The exact pass shuffles one row per character position; winnowing
    * selects only each w-window's minimal gram hash, cutting the
    * shuffled rows to ~2/(w+1) of positions at the cost of the
    * guarantee weakening from runs ≥ L to runs ≥ L + w − 1 chars
    * (the paper's t = w + k − 1 noise/guarantee threshold). w = 5 here
    * so the approximation is observable against the exact twin at test
    * scale; a production 100 TB run dials w up (w = 50 → ~25× fewer
    * rows) and prices the recall with [[dedupSubstringWinnowEval]]. */
  val WinnowW = 5

  /** Robust-winnowing selection + dup marks, one row per SELECTED
    * position whose gram re-occurs among selected positions corpus-wide
    * (keep-first exemption as in the exact pass — and winnow marks ⊆
    * exact marks: the exact-canonical occurrence, being the global
    * (doc_id, pos) min, is also first among whatever subset selection
    * keeps).
    *
    * Scale shape: selection is PER-DOC LOCAL math — gram hashes, window
    * minima, and the full md5 at each selected position all happen in
    * ONE JVM pass per row ([[graft.functions.WinnowGrams]]: byte-offset
    * table + sliding-window deque; no position-width limit, so
    * arbitrarily long docs winnow without chunking), and the corpus-wide
    * shuffle only ever sees the selected ~2/(w+1) fraction. Rightmost-
    * min tie-break on the 40-bit selection hash matches the HOF/DuckDB
    * twins' arithmetic encoding. The full 16-byte md5 is emitted ONLY
    * at selected positions, so 40-bit selection collisions cost
    * selection quality, never verdicts. */
  def winnowDupPositionsOf(docs: DataFrame): DataFrame =
    winnowDupPositionsOf(docs, WinnowW)

  /** [[winnowDupPositionsOf]] under an EXPLICIT dial `w` — the form the
    * production apply path (w=50) composes with
    * [[dedupSubstringToConvergenceWith]] */
  def winnowDupPositionsOf(docs: DataFrame, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    winnowGramsOf(docs, w)
      .withColumn("rn", row_number().over(
        Window.partitionBy("h").orderBy("doc_id", "pos")))
      .where(col("rn") >= 2)
      .select("doc_id", "pos")
  }

  /** Declared query: winnowed duplicated spans — same shape as
    * [[dedupSubstring]], computed from the ~2/(w+1) selected positions.
    * Spans under-cover the exact pass (guarantee ≥ L + w − 1); the eval
    * twin prices the gap. */
  def dedupSubstringWinnow(s: SparkSession, dir: String): DataFrame =
    substringSpansOf(winnowDupPositionsOf(
      t(s, dir, "documents").select("doc_id", "text")), winnowMergeGap)
      .orderBy("doc_id", "span_start")

  /** the winnow selection + dup-mark chain as oracle CTEs ending in
    * `d(doc_id, pos)` — window starts are FULL windows only
    * (pos ≤ max(ng − w + 1, 1)), mirroring the slice-overrun semantics
    * of the per-row form */
  private def winnowCtes: String = {
    val P = 1L << 20
    s"""g AS (
       |  SELECT doc_id, i AS pos, text,
       |    ('0x' || substr(md5(substr(text, i::INT, $SubstrL)), 1, 10))::BIGINT
       |      * $P + (${P - 1} - i) AS comb
       |  FROM documents JOIN generate_series(1, 100000) t(i)
       |    ON i <= length(text) - ${SubstrL - 1}),
       |wmin AS (
       |  SELECT doc_id, pos,
       |    min(comb) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS wm,
       |    count(*) OVER (PARTITION BY doc_id) AS ng
       |  FROM g),
       |sel AS (
       |  SELECT DISTINCT doc_id, ${P - 1} - (wm % $P) AS pos
       |  FROM wmin WHERE pos <= greatest(ng - ${WinnowW - 1}, 1)),
       |selh AS (
       |  SELECT s.doc_id, s.pos, md5(substr(doc.text, s.pos::INT, $SubstrL)) AS h
       |  FROM sel s JOIN documents doc ON doc.doc_id = s.doc_id),
       |r AS (
       |  SELECT doc_id, pos,
       |    row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
       |  FROM selh),
       |d AS (SELECT doc_id, pos FROM r WHERE rn >= 2)""".stripMargin
  }

  val dedupSubstringWinnowSql: String =
    s"""WITH $winnowCtes,
       |$substrSpanCtes
       |SELECT doc_id, span_start, span_end FROM spans
       |ORDER BY doc_id, span_start""".stripMargin

  /** Declared query: what winnowing's row reduction costs in coverage —
    * ONE exact metrics row (exact_chars, winnow_chars, char_recall,
    * exact_docs, winnow_docs, sel_positions, exact_positions). Winnow
    * marks ⊆ exact marks, so char_recall ≤ 1 by construction and the
    * row-reduction ratio is read off the same output. The instrument a
    * 100 TB deployment consults before choosing w.
    *
    * Caveat at w > L: the winnow islands then bridge at w
    * ([[winnowMergeGap]]) and can absorb ≤ w−L chars between close
    * marked runs, so winnow spans are no longer a strict subset and
    * this mass ratio stops being a true recall — use `tools.WinnowSweep`
    * there, which scores the clipped per-doc overlap and reports
    * precision alongside (measured 1.0 at w = 50 on the long-run
    * corpus). At the shipped w = 5 the subset property holds exactly. */
  def dedupSubstringWinnowEval(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    def totals(spans: DataFrame, prefix: String): DataFrame =
      spans.agg(
        coalesce(sum(col("span_end") - col("span_start")), lit(0L))
          .as(s"${prefix}_chars"),
        count_distinct(col("doc_id")).as(s"${prefix}_docs"))
    val exactPos = dupSubstrPositionsOf(docs)
    val winnowPos = winnowDupPositionsOf(docs)
    val ex = totals(substringSpansOf(exactPos), "exact")
    val wn = totals(substringSpansOf(winnowPos, winnowMergeGap), "winnow")
    val cnt = exactPos.agg(count(lit(1)).as("exact_positions"))
      .crossJoin(winnowPos.agg(count(lit(1)).as("winnow_positions")))
    ex.crossJoin(wn).crossJoin(cnt)
      .select(col("exact_chars"), col("winnow_chars"),
        when(col("exact_chars") > 0,
          r4f(col("winnow_chars").cast(DoubleType) / col("exact_chars")))
          .as("char_recall"),
        col("exact_docs"), col("winnow_docs"),
        col("exact_positions"), col("winnow_positions"))
  }

  val dedupSubstringWinnowEvalSql: String =
    s"""WITH ${substrGramCte()},
       |r AS (
       |  SELECT doc_id, pos,
       |    row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
       |  FROM g),
       |d AS (SELECT doc_id, pos FROM r WHERE rn >= 2),
       |$substrSpanCtes,
       |wmin AS (
       |  SELECT doc_id, pos,
       |    min(('0x' || substr(h, 1, 10))::BIGINT * ${1L << 20} + (${(1L << 20) - 1} - pos))
       |      OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS wm,
       |    count(*) OVER (PARTITION BY doc_id) AS ng
       |  FROM g),
       |sel AS (
       |  SELECT DISTINCT doc_id, ${(1L << 20) - 1} - (wm % ${1L << 20}) AS pos
       |  FROM wmin WHERE pos <= greatest(ng - ${WinnowW - 1}, 1)),
       |selh AS (
       |  SELECT g.doc_id, g.pos, g.h FROM g JOIN sel USING (doc_id, pos)),
       |r2 AS (
       |  SELECT doc_id, pos,
       |    row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
       |  FROM selh),
       |d2 AS (SELECT doc_id, pos FROM r2 WHERE rn >= 2),
       |w2 AS (
       |  SELECT doc_id, pos, max(pos + $SubstrL) OVER (PARTITION BY doc_id
       |    ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
       |  FROM d2),
       |isl2 AS (
       |  SELECT doc_id, pos, sum(CASE WHEN pm IS NULL OR pos > pm THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY doc_id ORDER BY pos) AS isl
       |  FROM w2),
       |spans2 AS (
       |  SELECT doc_id, min(pos) AS span_start, max(pos) + $SubstrL AS span_end
       |  FROM isl2 GROUP BY doc_id, isl),
       |ex AS (
       |  SELECT coalesce(sum(span_end - span_start), 0)::BIGINT AS exact_chars,
       |    count(DISTINCT doc_id) AS exact_docs FROM spans),
       |wn AS (
       |  SELECT coalesce(sum(span_end - span_start), 0)::BIGINT AS winnow_chars,
       |    count(DISTINCT doc_id) AS winnow_docs FROM spans2),
       |cnt AS (
       |  SELECT (SELECT count(*) FROM d) AS exact_positions,
       |    (SELECT count(*) FROM d2) AS winnow_positions)
       |SELECT exact_chars, winnow_chars,
       |  CASE WHEN exact_chars > 0 THEN
       |    CAST(floor(winnow_chars::DOUBLE / exact_chars * 10000::DOUBLE
       |      + 0.5::DOUBLE) / 10000::DOUBLE AS DOUBLE) END AS char_recall,
       |  exact_docs, winnow_docs, exact_positions, winnow_positions
       |FROM ex, wn, cnt""".stripMargin

  /** (doc_id, pos, full 16-byte md5) at the WINNOW-SELECTED positions
    * only — the scan-stage front of the winnowed index/incremental
    * path. Selection is per-doc local (the native expression); the
    * full hash is computed only at the ~2/(w+1) selected positions. */
  private def winnowGramsOf(docs: DataFrame, w: Int = WinnowW): DataFrame = {
    graft.functions.TextExpressions.register(docs.sparkSession)
    // the shingled() fan-out discipline: the char-gram winnow kernel is
    // byte-linear per row and explodes ~2/(w+1) of positions
    fanOut(docs, col("doc_id"))
      .where(length(col("text")) >= SubstrL)
      .select(col("doc_id"), explode(graft.functions.TextExpressions
        .winnowGrams(col("text"), SubstrL, w)).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.h").as("h"))
  }

  /** The 100 TB at-rest form: persist only the corpus split's
    * WINNOW-SELECTED gram hashes — ~2/(w+1) of the exact index's rows,
    * at a ≥ L+w−1 shared-run guarantee. Same layout and append/compact
    * story as [[writeSubstrIndex]] (left-semi membership probe:
    * duplicate rows are free, no caps needed).
    *
    * `w` is THE scale dial, and it is a build-time property of the
    * index: it is persisted in meta/ and every append/probe replays the
    * build's selection from there (like the SimHash bucket cap), so a
    * binary with a different default cannot silently mix selection
    * regimes. The trade as w grows: index and probe shuffle shrink
    * ~(w+1)/2× (tools.LongDocWinnow measured w=50 at 31× cheaper than
    * exact on 16.8M-char docs at 0.9999 char recall), while (a) only
    * shared runs ≥ L+w−1 chars are guaranteed detected — short
    * duplicates fade below the radar — and (b) spans bridge islands at
    * gap max(L, w) ([[winnowMergeGap]]), absorbing ≤ w−L
    * possibly-clean chars between close runs. The shipped default w=5
    * keeps the batch queries' exact-subset property (w ≤ L); w=50 is
    * the documented production setting for corpus-scale indexes. */
  def writeWinnowIndex(s: SparkSession, dir: String, indexPath: String,
      w: Int = WinnowW): Unit = {
    winnowGramsOf(t(s, dir, "documents")
        .where(col("doc_id") % IncrementalMod =!= IncrementalRem)
        .select("doc_id", "text"), w)
      .select("h").distinct()
      .repartition(col("h"))
      .write.mode("overwrite").parquet(s"$indexPath/hashes")
    // winnow_w is part of the index's identity: the ≥ L+w−1 guarantee
    // only holds when at-rest and probe sides select under the SAME w
    writeIndexMetaAll(s, indexPath,
      Seq("substr_l" -> SubstrL.toLong, "winnow_w" -> w.toLong))
  }

  /** O(batch) append — identical contract to [[appendSubstrIndex]];
    * the batch winnows under the INDEX's persisted w (mixing selection
    * regimes inside one index would void the run guarantee) */
  def appendWinnowIndex(s: SparkSession, indexPath: String,
      docs: DataFrame): Unit = {
    requireIndexMeta(docs.sparkSession, indexPath, "substr_l", SubstrL.toLong)
    val w = readIndexMeta(docs.sparkSession, indexPath,
      "winnow_w", WinnowW.toLong).toInt
    winnowGramsOf(docs, w).select("h").distinct()
      .repartition(col("h"))
      .write.mode("append").parquet(s"$indexPath/hashes")
  }

  /** Probe: the batch winnows ITSELF map-side — under the index's
    * persisted w — then only its selected positions join the
    * selected-hash set, so both sides of the shuffle shrink by
    * ~2/(w+1). A shared run ≥ L+w−1 selects the same minimal gram on
    * both sides (selection depends on the gram hashes of the run's
    * interior, not on absolute position), so the hit survives. */
  def probeWinnowIndex(s: SparkSession, docs: DataFrame,
      indexPath: String): DataFrame = {
    requireIndexMeta(s, indexPath, "substr_l", SubstrL.toLong)
    val w = readIndexMeta(s, indexPath, "winnow_w", WinnowW.toLong).toInt
    substringSpansOf(
      winnowGramsOf(docs, w)
        .join(s.read.parquet(s"$indexPath/hashes"), Seq("h"), "left_semi")
        .select("doc_id", "pos"), winnowMergeGap(w))
  }

  private val winnowIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (String, String)]()

  def ensureWinnowIndex(s: SparkSession, dir: String): String =
    winnowIndexCache.synchronized {
      val key = (s, dir)
      val fp = graft.util.inputFingerprint(dir, "documents.parquet")
      val cached = winnowIndexCache.get(key)
      if (cached != null && cached._1 == fp) cached._2
      else {
        if (cached != null) graft.util.deleteRecursively(cached._2)
        val path = java.nio.file.Files.createTempDirectory("graft_winnow_idx").toString
        writeWinnowIndex(s, dir, path)
        winnowIndexCache.put(key, (fp, path))
        path
      }
    }

  def clearWinnowIndexCache(): Unit =
    winnowIndexCache.synchronized {
      winnowIndexCache.forEach((_, v) => graft.util.deleteRecursively(v._2))
      winnowIndexCache.clear()
    }

  /** Declared query: the winnowed ingest-time form — batch split probes
    * the persisted winnow index; spans under-cover the exact incremental
    * pass by the same ≥ L+w−1 guarantee the batch winnow twin carries. */
  def dedupSubstringWinnowIncremental(s: SparkSession, dir: String): DataFrame =
    probeWinnowIndex(s,
      t(s, dir, "documents")
        .where(col("doc_id") % IncrementalMod === IncrementalRem)
        .select("doc_id", "text"),
      ensureWinnowIndex(s, dir))
      .orderBy("doc_id", "span_start")

  val dedupSubstringWinnowIncrementalSql: String = {
    val P = 1L << 20
    s"""WITH g AS (
       |  SELECT doc_id, i AS pos, text,
       |    md5(substr(text, i::INT, $SubstrL)) AS h,
       |    ('0x' || substr(md5(substr(text, i::INT, $SubstrL)), 1, 10))::BIGINT
       |      * $P + (${P - 1} - i) AS comb
       |  FROM documents JOIN generate_series(1, 100000) t(i)
       |    ON i <= length(text) - ${SubstrL - 1}),
       |wmin AS (
       |  SELECT doc_id, pos,
       |    min(comb) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS wm,
       |    count(*) OVER (PARTITION BY doc_id) AS ng
       |  FROM g),
       |sel AS (
       |  SELECT DISTINCT doc_id, ${P - 1} - (wm % $P) AS pos
       |  FROM wmin WHERE pos <= greatest(ng - ${WinnowW - 1}, 1)),
       |selh AS (
       |  SELECT g.doc_id, g.pos, g.h FROM g JOIN sel USING (doc_id, pos)),
       |d AS (
       |  SELECT DISTINCT b.doc_id, b.pos FROM selh b
       |  WHERE b.doc_id % $IncrementalMod = $IncrementalRem
       |    AND EXISTS (SELECT 1 FROM selh c
       |      WHERE c.h = b.h AND c.doc_id % $IncrementalMod <> $IncrementalRem)),
       |$substrSpanCtes
       |SELECT doc_id, span_start, span_end FROM spans
       |ORDER BY doc_id, span_start""".stripMargin
  }

  /** Declared query: the ingest-time form — positions in the NEW batch
    * (doc_id % [[IncrementalMod]] == [[IncrementalRem]]) whose L-gram
    * already occurs in the existing corpus, merged to spans. The batch
    * side is O(batch); the corpus side contributes only its gram hashes
    * through a left-semi equi-join on h (one shuffle each side, no
    * first-occurrence window needed — ANY corpus hit marks the batch
    * position). */
  /** every (doc_id, pos, 16-byte md5 gram hash) row of a doc frame —
    * the shared scan-stage front of the whole substring family */
  private def substrGramsOf(docs: DataFrame): DataFrame = {
    graft.functions.TextExpressions.register(docs.sparkSession)
    // the shingled() fan-out discipline: ×(len−L+1) position explode
    fanOut(docs, col("doc_id"))
      .where(length(col("text")) >= SubstrL)
      .select(col("doc_id"), posexplode(graft.functions.TextExpressions
        .charGramMd5(col("text"), SubstrL)).as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).cast(LongType).as("pos"), col("h"))
  }

  /** Persist the corpus split's DISTINCT gram-hash set clustered by h —
    * the at-rest form the incremental/streaming substring passes probe.
    * Smallest index of any dedup family: 16 bytes per distinct corpus
    * gram, no positions, no cap machinery — the probe is a LEFT-SEMI
    * set-membership join, so each batch position matches at most once
    * REGARDLESS of how often the gram occurs in the corpus; adversarial
    * boilerplate cannot fan it out by construction. */
  def writeSubstrIndex(s: SparkSession, dir: String, indexPath: String): Unit = {
    substrGramsOf(t(s, dir, "documents")
        .where(col("doc_id") % IncrementalMod =!= IncrementalRem)
        .select("doc_id", "text"))
      .select("h").distinct()
      .repartition(col("h"))
      .write.mode("overwrite").parquet(s"$indexPath/hashes")
    writeIndexMeta(s, indexPath, "substr_l", SubstrL.toLong)
  }

  /** Add-after-build maintenance — the CHEAPEST append of any index
    * family: the batch's distinct gram hashes are appended as-is with
    * NO read of the existing index (O(batch) total). Correct because
    * left-semi probe semantics are idempotent under duplicate hash
    * rows — a hash present twice answers membership exactly like once
    * — so cross-append duplicates cost bytes, never verdicts;
    * `IndexMaintenance.compactSubstrIndex` reclaims the bytes.
    * Caller contract: `docs` doc_ids are new to the index. */
  def appendSubstrIndex(s: SparkSession, indexPath: String,
      docs: DataFrame): Unit = {
    requireIndexMeta(docs.sparkSession, indexPath, "substr_l", SubstrL.toLong)
    substrGramsOf(docs).select("h").distinct()
      .repartition(col("h"))
      .write.mode("append").parquet(s"$indexPath/hashes")
  }

  /** Probe a persisted substring index with ARBITRARY documents: batch
    * grams left-semi join the hash set (one shuffle each side, aligned
    * with the index's at-rest clustering), surviving positions merge to
    * spans per doc. The declared batch query feeds it the deterministic
    * split; `Pipeline.streamSubstringDedup` feeds it micro-batches. */
  def probeSubstrIndex(s: SparkSession, docs: DataFrame,
      indexPath: String): DataFrame = {
    requireIndexMeta(s, indexPath, "substr_l", SubstrL.toLong)
    substringSpansOf(
      substrGramsOf(docs)
        .join(s.read.parquet(s"$indexPath/hashes"), Seq("h"), "left_semi")
        .select("doc_id", "pos"))
  }

  /** index path memoized per (session, dir, input fingerprint) — the
    * substring twin of [[gramIndexPath]] */
  private val substrIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (String, String)]()

  def ensureSubstrIndex(s: SparkSession, dir: String): String =
    substrIndexCache.synchronized {
      val key = (s, dir)
      val fp = graft.util.inputFingerprint(dir, "documents.parquet")
      val cached = substrIndexCache.get(key)
      if (cached != null && cached._1 == fp) cached._2
      else {
        if (cached != null) graft.util.deleteRecursively(cached._2)
        val path = java.nio.file.Files.createTempDirectory("graft_substr_idx").toString
        writeSubstrIndex(s, dir, path)
        substrIndexCache.put(key, (fp, path))
        path
      }
    }

  def clearSubstrIndexCache(): Unit =
    substrIndexCache.synchronized {
      substrIndexCache.forEach((_, v) => graft.util.deleteRecursively(v._2))
      substrIndexCache.clear()
    }

  // The declared batch query sorts for a stable oracle compare; the
  // probe stays unsorted for the streaming sinks (the
  // dedupSimhashIncremental discipline). Index-backed since the 10×
  // measurement showed the self-contained form re-hashing the corpus
  // per call at 3.79× scaling — worst of the suite (PERF.md).
  def dedupSubstringIncremental(s: SparkSession, dir: String): DataFrame =
    probeSubstrIndex(s,
      t(s, dir, "documents")
        .where(col("doc_id") % IncrementalMod === IncrementalRem)
        .select("doc_id", "text"),
      ensureSubstrIndex(s, dir))
      .orderBy("doc_id", "span_start")

  val dedupSubstringIncrementalSql: String =
    s"""WITH ${substrGramCte()},
       |d AS (
       |  SELECT DISTINCT b.doc_id, b.pos FROM g b
       |  WHERE b.doc_id % $IncrementalMod = $IncrementalRem
       |    AND EXISTS (SELECT 1 FROM g c
       |      WHERE c.h = b.h AND c.doc_id % $IncrementalMod <> $IncrementalRem)),
       |$substrSpanCtes
       |SELECT doc_id, span_start, span_end FROM spans
       |ORDER BY doc_id, span_start""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_dedup_exact" -> dedupExact _,
    "q_dedup_minhash" -> dedupMinhash _,
    "q_dedup_minhash_bands" -> dedupMinhashBands _,
    "q_dedup_eval" -> dedupEval _,
    "q_dedup_ngram_jaccard" -> dedupNgramJaccard _,
    "q_dedup_containment" -> dedupContainment _,
    "q_dedup_containment_apply" -> dedupContainmentApply _,
    "q_dedup_clusters" -> dedupClusters _,
    "q_dedup_apply" -> dedupApply _,
    "q_dedup_minhash_clusters" -> dedupMinhashClusters _,
    "q_dedup_simhash" -> dedupSimhash _,
    "q_dedup_simhash_chunks" -> dedupSimhashChunks _,
    "q_dedup_bucket_stats" -> dedupBucketStats _,
    "q_dedup_simhash_eval" -> dedupSimhashEval _,
    "q_decontaminate" -> decontaminate _,
    "q_decontaminate_bloom" -> decontaminateBloom _,
    "q_dedup_incremental" -> dedupIncremental _,
    "q_dedup_containment_incremental" -> dedupContainmentIncremental _,
    "q_dedup_simhash_incremental" -> dedupSimhashIncremental _,
    "q_dedup_minhash_incremental" -> dedupMinhashIncremental _,
    "q_dedup_simhash_incr_recall" -> dedupSimhashIncrRecall _,
    "q_dedup_minhash_incr_recall" -> dedupMinhashIncrRecall _,
    "q_dedup_cluster_sizes" -> dedupClusterSizes _,
    "q_dedup_keep_best" -> dedupKeepBest _,
    "q_dedup_cross_source" -> dedupCrossSource _,
    "q_dedup_substring" -> dedupSubstring _,
    "q_dedup_substring_stats" -> dedupSubstringStats _,
    "q_dedup_substring_apply" -> dedupSubstringApply _,
    "q_dedup_substring_incremental" -> dedupSubstringIncremental _,
    "q_dedup_substring_winnow" -> dedupSubstringWinnow _,
    "q_dedup_substring_winnow_eval" -> dedupSubstringWinnowEval _,
    "q_dedup_substring_winnow_incremental" -> dedupSubstringWinnowIncremental _,
    "q_dedup_substring_pairs" -> dedupSubstringPairs _,
    "q_dedup_substring_cross_source" -> dedupSubstringCrossSource _,
    "q_dedup_substring_residual" -> dedupSubstringResidual _)

  val oracle: Map[String, String] = Map(
    "q_dedup_exact" -> dedupExactSql,
    "q_dedup_minhash_bands" -> dedupMinhashBandsSql,
    "q_dedup_eval" -> dedupEvalSql,
    "q_dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    "q_dedup_containment" -> dedupContainmentSql,
    "q_dedup_containment_apply" -> dedupContainmentApplySql,
    "q_dedup_clusters" -> dedupClustersSql,
    "q_dedup_apply" -> dedupApplySql,
    "q_dedup_simhash_chunks" -> dedupSimhashChunksSql,
    "q_dedup_bucket_stats" -> dedupBucketStatsSql,
    "q_dedup_simhash_eval" -> dedupSimhashEvalSql,
    "q_decontaminate" -> decontaminateSql,
    "q_dedup_incremental" -> dedupIncrementalSql,
    "q_dedup_containment_incremental" -> dedupContainmentIncrementalSql,
    "q_dedup_simhash_incremental" -> dedupSimhashIncrementalSql,
    "q_dedup_minhash_incremental" -> dedupMinhashIncrementalSql,
    "q_dedup_simhash_incr_recall" -> dedupSimhashIncrRecallSql,
    "q_dedup_minhash_incr_recall" -> dedupMinhashIncrRecallSql,
    "q_dedup_cluster_sizes" -> dedupClusterSizesSql,
    "q_dedup_keep_best" -> dedupKeepBestSql,
    "q_dedup_cross_source" -> dedupCrossSourceSql,
    "q_dedup_substring" -> dedupSubstringSql,
    "q_dedup_substring_stats" -> dedupSubstringStatsSql,
    "q_dedup_substring_apply" -> dedupSubstringApplySql,
    "q_dedup_substring_incremental" -> dedupSubstringIncrementalSql,
    "q_dedup_substring_winnow" -> dedupSubstringWinnowSql,
    "q_dedup_substring_winnow_eval" -> dedupSubstringWinnowEvalSql,
    "q_dedup_substring_winnow_incremental" -> dedupSubstringWinnowIncrementalSql,
    "q_dedup_substring_pairs" -> dedupSubstringPairsSql,
    "q_dedup_substring_cross_source" -> dedupSubstringCrossSourceSql,
    "q_dedup_substring_residual" -> dedupSubstringResidualSql)
}
