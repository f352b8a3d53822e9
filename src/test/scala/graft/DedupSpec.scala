package graft

import java.nio.file.Files

import graft.functions.TopK
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Oracle-free north-star operators (SURVEY.md §2 B.4/B.11): planted-dup
  * recall for MinHash/SimHash/LSH, approx-distinct error bound, topK. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** tmp dir with planted documents + embeddings parquet fixtures */
  private lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_fix").toString
    val base = "the quick brown fox jumps over the lazy dog again and again until done"
    val docs = Seq(
      (1L, base, "en", "src0", base.length.toLong),
      (2L, base.replace("done", "finished"), "en", "src0", base.length.toLong), // near-dup of 1
      (3L, base, "en", "src1", base.length.toLong), // exact dup of 1
      (4L, "completely different words about spark query engines and shuffles here now", "en", "src2", 70L),
      (5L, "yet another unrelated document mentioning parquet files and column pruning", "en", "src3", 70L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val v0 = vec()
    val nearV0 = v0.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }
    val embs = Seq(
      (0L, v0, 0), (100L, nearV0, 0), (200L, vec(), 1),
      (1L, vec(), 2), (2L, vec(), 3), (3L, vec(), 4), (4L, v0.map(-_), 5))
    embs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q_dedup_minhash finds the planted near-dup and exact-dup pairs") {
    val pairs = operators.Dedup.dedupMinhash(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pairs.exists { case (a, b, _) => a == 1 && b == 3 }, "exact dup 1-3 missed")
    assert(pairs.collectFirst { case (1, 3, j) => j }.get === 1.0)
    assert(pairs.exists { case (a, b, _) => a == 1 && b == 2 }, "near dup 1-2 missed")
    assert(!pairs.exists { case (a, b, _) => Set(a, b).contains(4L) }, "false positive with doc 4")
  }

  test("q_dedup_simhash: identical docs collide, near-dups within Hamming 3") {
    val pairs = operators.Dedup.dedupSimhash(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs.exists { case (a, b, h) => a == 1 && b == 3 && h == 0 }, "exact dup 1-3 missed")
    assert(!pairs.exists { case (a, b, _) => Set(a, b).contains(4L) }, "false positive with doc 4")
  }

  test("q_dedup_simhash: a degenerate hot bucket collapses to O(n) representative pairs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_hot").toString
    val base = "the quick brown fox jumps over the lazy dog again and again until done"
    // 300 identical degenerate docs: every (chunk, cv) bucket they form has
    // 300 members (> SimhashMaxBucket). The guard must emit only pairs
    // through the min-doc_id representative (299 pairs, keeping the
    // component connected), never the 300*299/2 all-pairs blowup; the
    // planted near-dup pair lives in small buckets and must still come out.
    val degenerate = (100L to 399L).map(i => (i, "x x", "en", "srcd", 3L))
    val docs = Seq(
      (1L, base, "en", "src0", base.length.toLong),
      (2L, base, "en", "src0", base.length.toLong), // exact dup of 1: Hamming 0, small bucket
      (3L, "completely different words about spark query engines and shuffles here now", "en", "src2", 70L)) ++ degenerate
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(operators.Dedup.SimhashMaxBucket < 300)
    val pairs = operators.Dedup.dedupSimhash(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val degen = pairs.filter { case (a, b) => a >= 100L && b >= 100L }
    assert(degen.forall(_._1 == 100L),
      s"hot-bucket pairs must all route through the representative: $degen")
    assert(degen.size === 299, s"expected 299 rep pairs, got ${degen.size}")
    assert(pairs.contains((1L, 2L)), "planted dup pair 1-2 lost to the bucket guard")
  }

  test("q_dedup_minhash: a degenerate hot bucket collapses to O(n) representative pairs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_hot_mh").toString
    val base = "the quick brown fox jumps over the lazy dog again and again until done"
    // 100 identical boilerplate docs share every (band, bh) bucket; the
    // MinhashMaxBucket guard must shrink those buckets to representative
    // pairs (99 through doc 100, not 100*99/2 per band) while the planted
    // dup pair in small buckets survives
    val degenerate = (100L to 199L).map(i => (i, "x x x x x", "en", "srcd", 9L))
    val docs = Seq(
      (1L, base, "en", "src0", base.length.toLong),
      (2L, base, "en", "src0", base.length.toLong), // exact dup of 1: small bucket
      (3L, "completely different words about spark query engines and shuffles here now", "en", "src2", 70L)) ++ degenerate
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(operators.Dedup.MinhashMaxBucket < 100)
    val pairs = operators.Dedup.dedupMinhash(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val degen = pairs.filter { case (a, b) => a >= 100L && b >= 100L }
    assert(degen.forall(_._1 == 100L),
      s"hot-bucket pairs must all route through the representative: $degen")
    assert(degen.size === 99, s"expected 99 rep pairs, got ${degen.size}")
    assert(pairs.contains((1L, 2L)), "planted dup pair 1-2 lost to the bucket guard")
  }

  test("q_dedup_containment: subset doc scores 1.0 where Jaccard misses; direction names the smaller side") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_contain").toString
    // doc 1 = the first 12 words of doc 2 (60 distinct words): every one
    // of doc 1's ten 3-grams is inside doc 2, but the union denominator
    // makes jaccard 10/58 — far below the 0.5 pair threshold
    val words = (1 to 60).map(i => s"w$i")
    val big = words.mkString(" ")
    val small = words.take(12).mkString(" ")
    val far = "completely unrelated terms about shuffle partitions and broadcast joins"
    Seq(
      (1L, small, "en", "src0", small.length.toLong),
      (2L, big, "en", "src1", big.length.toLong),
      (3L, far, "en", "src2", far.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = operators.Dedup.dedupContainment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 2L, 1.0, 1L)),
      "perfect subset pair at containment 1.0, contained = the smaller doc")
    val jac = operators.Dedup.dedupNgramJaccard(spark, dir).collect()
    assert(jac.isEmpty, "jaccard at 0.5 must miss the 10/58 subset pair")
  }

  test("containment covers the LSH blind spot: a subset pair MinHash banding cannot see") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_lsh_blind").toString
    // the same subset geometry as the containment spec: jaccard 10/58 ≈
    // 0.17, so banded MinHash (which estimates RESEMBLANCE — per-band
    // collision probability ≈ j^rows) is structurally blind to it, while
    // the directional containment scorer reads 1.0. This pins WHY the
    // exact containment path exists next to the LSH pipeline rather
    // than being folded into it.
    val words = (1 to 60).map(i => s"w$i")
    Seq(
      (1L, words.take(12).mkString(" "), "en", "src0", 1L),
      (2L, words.mkString(" "), "en", "src1", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val lsh = operators.Dedup.dedupMinhash(spark, dir).collect()
    assert(!lsh.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "banded MinHash must not surface the low-resemblance subset pair")
    val cont = operators.Dedup.dedupContainment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.toSeq === Seq((1L, 2L, 1.0)),
      "the containment scorer must surface it at 1.0")
  }

  test("q_dedup_containment_apply: a subset chain keeps exactly the maximal doc, one anti-join") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_contain_apply").toString
    // 1 ⊂ 2 ⊂ 3: every non-maximal doc is the contained side of ≥1 pair
    val words = (1 to 60).map(i => s"w$i")
    val far = "completely unrelated terms about shuffle partitions and broadcast joins"
    Seq(
      (1L, words.take(12).mkString(" "), "en", "src0", 1L),
      (2L, words.take(30).mkString(" "), "en", "src0", 2L),
      (3L, words.mkString(" "), "en", "src1", 3L),
      (4L, far, "en", "src2", far.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kept = operators.Dedup.dedupContainmentApply(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(3L, 4L), "only the maximal doc and the unrelated doc survive")
  }

  test("q_dedup_containment_incremental: probe flags a batch doc swallowed by an indexed doc") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_contain_incr").toString
    // id 17 ≡ 7 (mod 10) → the probe batch; 2 and 3 build the index.
    // Batch doc 17 = the first 12 words of corpus doc 2 → containment
    // 1.0 against it, while the jaccard probe (shared/union = 10/58)
    // stays silent.
    val words = (1 to 60).map(i => s"w$i")
    val big = words.mkString(" ")
    val small = words.take(12).mkString(" ")
    val far = "completely unrelated terms about shuffle partitions and broadcast joins"
    Seq(
      (17L, small, "en", "src0", small.length.toLong),
      (2L, big, "en", "src1", big.length.toLong),
      (3L, far, "en", "src2", far.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = operators.Dedup.dedupContainmentIncremental(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq === Seq((17L, 2L, 1.0, 17L)),
      "batch doc is a perfect subset of the indexed doc; contained = the batch doc")
    val jac = operators.Dedup.dedupIncremental(spark, dir).collect()
    assert(jac.isEmpty, "the jaccard probe at 0.5 must miss the 10/58 subset pair")
  }

  test("q_dedup_apply: keepers and never-duplicated docs survive, non-keepers drop") {
    val kept = operators.Dedup.dedupApply(spark, fixtureDir)
      .collect().map(_.getLong(0)).toSet
    // 1/2/3 form one duplicate cluster (keeper = 1); 4/5 have no near-dup
    assert(kept === Set(1L, 4L, 5L))
  }

  test("q_dedup_minhash_clusters: planted dup trio collapses to one component, no false merges") {
    val got = operators.Dedup.dedupMinhashClusters(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // docs 1/2/3 are the planted near/exact dups → one cluster labeled 1;
    // unrelated docs 4/5 share no candidate bucket → absent
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("q_dedup_clusters: transitive chain collapses to one component (multi-round propagation)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_clust").toString
    // 20 distinct words → 18 distinct 3-grams/doc. Each hop replaces two
    // far-apart words, killing exactly 6 grams: consecutive docs share 12
    // grams (j = 12/24 = 0.5, at threshold), the chain ends share only 6
    // (j = 6/30 = 0.2, below) — so 1-3 connect ONLY through 2, forcing a
    // propagation round beyond the direct-pair initialisation.
    val w = (1 to 20).map(i => f"w$i%02d").toArray
    def doc(repl: Map[Int, String]): String =
      w.zipWithIndex.map { case (x, i) => repl.getOrElse(i + 1, x) }.mkString(" ")
    val d1 = doc(Map.empty)
    val d2 = doc(Map(5 -> "x05", 11 -> "x11"))
    val d3 = doc(Map(5 -> "x05", 11 -> "x11", 8 -> "x08", 14 -> "x14"))
    val pairTxt = "p01 p02 p03 p04 p05 p06 p07 p08"
    val soloTxt = "s01 s02 s03 s04 s05 s06 s07 s08"
    val docs = Seq(
      (1L, d1), (2L, d2), (3L, d3),       // chain component, min id 1
      (10L, pairTxt), (11L, pairTxt),     // exact-pair component, min id 10
      (20L, soloTxt))                     // no near-dup: absent from output
      .map { case (id, tx) => (id, tx, "en", "src", tx.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val pairs = operators.Dedup.dedupNgramJaccard(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (2L, 3L), (10L, 11L)),
      s"pair graph must be exactly the chain + the exact pair, got $pairs")

    val got = operators.Dedup.dedupClusters(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("q_sim_ann_lsh: the planted near-duplicate vector is the top ANN hit") {
    val top = operators.Similarity.simAnnLsh(spark, fixtureDir).collect()
    assert(top.nonEmpty, "probe bucket empty")
    assert(top.head.getLong(0) === 100L, "near-dup of probe not ranked first")
    assert(top.head.getDouble(1) > 0.999)
  }

  test("q_sim_ann_ivf: the planted near-duplicate vector is the top hit in probed lists") {
    val top = operators.Similarity.simAnnIvf(spark, fixtureDir).collect()
    assert(top.nonEmpty, "probed IVF lists empty")
    assert(top.head.getLong(0) === 100L, "near-dup of probe not ranked first")
    assert(top.head.getDouble(1) > 0.999)
  }

  test("q_sim_ann_pq: the planted near-duplicate vector is the top hit after ADC + re-rank") {
    val top = operators.Similarity.simAnnPq(spark, fixtureDir).collect()
    assert(top.nonEmpty, "PQ candidate set empty")
    assert(top.head.getLong(0) === 100L, "near-dup of probe not ranked first")
    assert(top.head.getDouble(1) > 0.999)
  }

  test("q_sim_ann_pq recall: ADC candidates recover most of the exact top-10 at sf0.001") {
    val pq = operators.Similarity.simAnnPq(spark, TestSpark.sfDir)
      .collect().map(_.getLong(0)).toSet
    val exact = operators.Similarity.simCosine(spark, TestSpark.sfDir)
      .collect().map(_.getLong(0)).toSet
    val recall = (pq & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"PQ recall@10 vs exact: $recall (${pq & exact})")
  }

  test("q_dedup_embedding: probe-sampled scan finds the planted cosine near-dup") {
    val pairs = operators.Similarity.dedupEmbedding(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.contains((0L, 100L)))
  }

  test("propagateMinLabel property: equals union-find components, incl. the diameter boundary") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed

    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      edges.flatMap(e => Seq(e._1, e._2)).distinct.map(v => v -> find(v)).toMap
    }

    def check(edges: Seq[(Long, Long)], label: String): Unit = {
      val got = operators.Dedup.propagateMinLabel(edges.toDF("d1", "d2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === unionFind(edges), s"$label: propagation diverged from union-find")
    }

    // the old fixed-iteration hazard: a path far past ClusterIters + 1
    // hops. Pointer-doubling reach grows 2^(k+1)−1 per round, so a
    // 300-node chain (diameter 299) must converge EXACTLY in ~8 rounds —
    // the pre-round-7 plain propagation silently returned non-minimal
    // labels here
    check((0L until 299L).map(i => (i, i + 1)), "path of 300 nodes")
    // and the boundary the plain form guaranteed, still exact
    val n = operators.Dedup.ClusterIters + 2
    check((0 until n - 1).map(i => (i.toLong, (i + 1).toLong)), s"path of $n nodes")

    val edgeGen = for {
      a <- Gen.choose(0L, 25L); b <- Gen.choose(0L, 25L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    val graphGen = Gen.choose(1, 20).flatMap(m => Gen.listOfN(m, edgeGen))
    (0 until 5).foreach { i =>
      graphGen.apply(Gen.Parameters.default, Seed(23L + i)).foreach(es =>
        check(es.distinct, s"random graph $i"))
    }
  }

  test("q_sim_knn: mutual planted near-dups rank first for each other, k and ordering hold") {
    val rows = operators.Similarity.simKnn(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // 7 vectors < KnnProbes, so every vector is a probe with k=4 hits
    assert(rows.length === 7 * operators.Similarity.KnnK)
    val rank1 = rows.collect { case (pid, 1L, vid, cos) => pid -> ((vid, cos)) }.toMap
    assert(rank1(0L)._1 === 100L, "near-dup 100 must be 0's nearest")
    assert(rank1(100L)._1 === 0L, "near-dup is mutual")
    assert(rank1(0L)._2 > 0.999)
    rows.groupBy(_._1).foreach { case (pid, hs) =>
      val cs = hs.sortBy(_._2).map(_._4)
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, s"probe $pid not cos-desc")
      // the antipodal vector (cos = -1 to v0) can never outrank genuine hits
      assert(!hs.exists { case (_, r, vid, _) => r == 1L && vid == 4L && pid == 0L })
    }
  }

  test("q_agg_approx_distinct is within 5% of exact at sf0.001") {
    val approx = operators.Aggregates.aggApproxDistinct(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = util.events(spark, TestSpark.sfDir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) / ex <= 0.05, s"$k: approx $ap vs exact $ex")
    }
  }

  test("q_agg_hll_union: daily-sketch union estimate within 5% of exact distinct users") {
    val est = operators.Aggregates.aggHllUnion(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    val exact = util.events(spark, TestSpark.sfDir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(est(k).toDouble - ex) / ex <= 0.05, s"$k: union est ${est(k)} vs exact $ex")
    }
    // the union must agree with a single-pass sketch over the same rows:
    // re-aggregation may not cost accuracy (the property that makes
    // persisted daily sketches usable for any later slice)
    val onePass = util.events(spark, TestSpark.sfDir)
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.hll_sketch_estimate(
        org.apache.spark.sql.functions.hll_sketch_agg(col("user_id"), lit(12))).as("e"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(est === onePass, "daily-sketch union diverged from single-pass sketch")
  }

  test("q_agg_quantile_approx stays within 2% of the exact percentile") {
    import org.apache.spark.sql.functions.{col, expr}
    val approx = operators.Aggregates.aggQuantileApprox(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2)))).toMap
    val exact = util.t(spark, TestSpark.sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2)))).toMap
    exact.foreach { case (k, (p50, p90)) =>
      assert(math.abs(approx(k)._1 - p50) / p50 <= 0.02, s"$k p50")
      assert(math.abs(approx(k)._2 - p90) / p90 <= 0.02, s"$k p90")
    }
  }

  test("KnnTopKAggregator property: any reduce/merge split equals global sort-take") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import graft.functions.{KnnHit, KnnTopKAggregator}
    val k = 4
    val agg = new KnnTopKAggregator(k)
    // coarse score grid forces score ties; small id range forces repeats
    val hitGen = for {
      c <- Gen.choose(-100, 100).map(_ / 50.0)
      id <- Gen.choose(0L, 30L)
    } yield KnnHit(c, id)
    val listGen = Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, hitGen))
    (0 until 200).foreach { i =>
      val hits = listGen.apply(Gen.Parameters.default, Seed(3L + i)).getOrElse(Nil)
      val nSplits = 1 + (i % 5) // exercises 1..5-way partial aggregation
      val chunkSize = math.max(1, (hits.size + nSplits - 1) / nSplits)
      val partials = hits.grouped(chunkSize).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
      val merged = if (partials.isEmpty) agg.zero else partials.reduce(agg.merge)
      val expected = hits.sortBy(h => (-h.cos, h.vec_id)).take(k)
      assert(agg.finish(merged) === expected, s"case $i (splits=$nSplits)")
    }
  }

  test("WeightedTopKAggregator property: exact under capacity for any reduce/merge split") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import graft.functions.{TopKBuffer, WeightedTopKAggregator}
    val k = 3
    // ≤8 distinct items, capacity 8 ⇒ space-saving is exact; ties on
    // summed weight are broken by item ASC in both agg and expectation
    val agg = new WeightedTopKAggregator(k, capacity = 8)
    val pairGen = for {
      item <- Gen.oneOf((0 until 8).map(i => s"i$i"))
      w <- Gen.choose(1L, 20L)
    } yield (item, w)
    val listGen = Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, pairGen))
    (0 until 200).foreach { i =>
      val pairs = listGen.apply(Gen.Parameters.default, Seed(17L + i)).getOrElse(Nil)
      val nSplits = 1 + (i % 4)
      val chunkSize = math.max(1, (pairs.size + nSplits - 1) / nSplits)
      val partials = pairs.grouped(chunkSize)
        .map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
      val merged = if (partials.isEmpty) TopKBuffer(Map.empty) else partials.reduce(agg.merge)
      val expected = pairs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
        .sortBy { case (item, w) => (-w, item) }.take(k).map(_._1)
      assert(agg.finish(merged) === expected, s"case $i (splits=$nSplits)")
    }
  }

  test("WeightedTopKAggregator: weight-ranked exact under capacity, heavy item survives eviction") {
    import spark.implicits._
    // "c" has the most ROWS but the least WEIGHT — weighted rank must win
    val data = Seq(("a", 50L), ("a", 50L), ("b", 60L)) ++ Seq.fill(10)(("c", 1L))
    val exact = data.toDF("item", "w")
      .agg(TopK.topkWeighted(col("item"), col("w"), 2, capacity = 1024)).collect()
      .head.getSeq[String](0)
    assert(exact === Seq("a", "b"), s"weighted rank wrong: $exact")
    // capacity 2 forces evictions; the dominant-weight item must survive
    val evicted = data.toDF("item", "w")
      .agg(TopK.topkWeighted(col("item"), col("w"), 1, capacity = 2)).collect()
      .head.getSeq[String](0)
    assert(evicted === Seq("a"), s"heavy item lost to eviction: $evicted")
  }

  test("TopKAggregator is exact under capacity and finds heavy hitters over capacity") {
    import spark.implicits._
    // 100×"a", 50×"b", 10×"c", 1×"d" — capacity 2 forces space-saving evictions
    val data = (Seq.fill(100)("a") ++ Seq.fill(50)("b") ++ Seq.fill(10)("c") ++ Seq("d"))
    val exact = data.toDF("v").agg(TopK.topk(col("v"), 2, capacity = 1024)).collect()
      .head.getSeq[String](0)
    assert(exact === Seq("a", "b"))
    val tight = data.toDF("v").agg(TopK.topk(col("v"), 1, capacity = 2)).collect()
      .head.getSeq[String](0)
    assert(tight.head === "a", s"heavy hitter lost under eviction: $tight")
  }

  test("q_decontaminate_bloom: superset of exact hits, bounded false-positive inflation") {
    // mod=3 makes ~a third of the real sf0.001 docs the eval split — a far
    // denser probe population than the declared 1% key, so the
    // false-positive bound is actually exercised
    def byDoc(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = byDoc(operators.Dedup.decontaminateMod(spark, TestSpark.sfDir, 3))
    val bloom = byDoc(operators.Dedup.decontaminateBloomMod(spark, TestSpark.sfDir, 3))
    assert(bloom.keySet === exact.keySet, "eval split differs")
    exact.foreach { case (id, (nGrams, _)) =>
      assert(bloom(id)._1 === nGrams, s"doc $id: n_grams differs")
    }
    // a Bloom filter has NO false negatives: every exact hit must survive
    exact.foreach { case (id, (_, nHit)) =>
      assert(bloom(id)._2 >= nHit, s"doc $id: bloom lost hits ($nHit -> ${bloom(id)._2})")
    }
    // false positives only inflate: bound the rate over true negatives.
    // m = 8 Mi bits vs ~10^4 train grams at sf0.001 → expected fpp ≪ 1e-9;
    // 1% is a generous ceiling that still catches a broken hash family
    val fps = exact.map { case (id, (_, nHit)) => bloom(id)._2 - nHit }.sum.toDouble
    val negatives = exact.values.map { case (ng, nh) => ng - nh }.sum.toDouble
    assert(negatives == 0 || fps / negatives <= 0.01,
      s"false-positive inflation ${fps / negatives} over $negatives true negatives")
  }

  test("bloom index: persisted probe ≡ self-contained gate; append absorbs; dial guard throws") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = TestSpark.sfDir
    val idx = Files.createTempDirectory("graft_bloom_idx").toString
    operators.Dedup.writeBloomIndex(spark, dir, idx, mod = 3)
    val evalDocs = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 3 === 0).select("doc_id", "text")
    val probed = operators.Dedup.probeBloomIndex(spark, evalDocs, idx)
      .orderBy("doc_id").collect().toSeq
    val direct = operators.Dedup.decontaminateBloomMod(spark, dir, 3)
      .collect().toSeq
    assert(probed === direct, "persisted word table diverged from the self-contained gate")

    // append: a doc whose grams are nowhere in train probes ~0 before
    // and exactly 1.0 after its own text is OR'd in
    val novel = Seq((999983L, "zq1 zq2 zq3 zq4 zq5 zq6")).toDF("doc_id", "text")
    val before = operators.Dedup.probeBloomIndex(spark, novel, idx)
      .collect().head.getDouble(3)
    assert(before <= 0.25, s"novel doc pre-append contamination $before (fp noise bound)")
    operators.Dedup.appendBloomIndex(spark, idx, novel)
    val after = operators.Dedup.probeBloomIndex(spark, novel, idx)
      .collect().head.getDouble(3)
    assert(after === 1.0, "appended doc's own grams must all hit")

    // dial guard: an index recorded under different (m, k) must refuse
    Seq(("m_bits", 1024L), ("k", 8L)).toDF("key", "value")
      .write.mode("overwrite").parquet(s"$idx/meta")
    intercept[IllegalStateException] {
      operators.Dedup.probeBloomIndex(spark, novel, idx)
    }

    // absent meta/ is refused too (not defaulted): the Bloom family has
    // always written a sidecar, so words-without-meta is a partially
    // written or foreign path, not a legacy index
    def rmr(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmr)
      f.delete(); ()
    }
    rmr(new java.io.File(s"$idx/meta"))
    intercept[IllegalStateException] {
      operators.Dedup.probeBloomIndex(spark, novel, idx)
    }
  }

  test("q_dedup_incremental: persisted gram index round-trips — pairs match the direct computation") {
    import org.apache.spark.sql.functions._
    // sf0.01: the declared split has real cross-split near-dup pairs (6 at
    // this SF), so the parity check has signal — sf0.001's 5-doc batch may
    // have none
    val dir = "/root/testdata/sf0.01"
    val viaIndex = operators.Dedup.dedupIncremental(spark, dir).collect().toSeq
    assert(viaIndex.nonEmpty, "expected cross-split near-dup pairs at sf0.01")
    // direct recompute without persistence: same formula straight off the
    // parquet — the persisted index must be a pure materialization
    val docs = util.t(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    graft.functions.TextExpressions.register(spark)
    val grams = docs.select(col("doc_id"),
        explode(graft.functions.TextExpressions.wordNgrams(col("toks"), 3)).as("gram"))
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(gram), 1, 15), 16, 10) AS BIGINT)").as("gh"))
    val corpus = grams.where(col("doc_id") % 10 =!= 7)
    val cdf = corpus.groupBy("gh").agg(count(lit(1)).as("df"))
    val idx = corpus.join(cdf.where(col("df") <= operators.Dedup.JaccardMaxDf), "gh")
      .select(col("gh"), col("doc_id").as("dup_of"))
    val batch = grams.where(col("doc_id") % 10 === 7)
      .select(col("doc_id").as("new_id"), col("gh"))
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val direct = batch.join(idx, "gh")
      .groupBy("new_id", "dup_of").agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("doc_id").as("new_id"), col("n").as("n_new")), "new_id")
      .join(sizes.select(col("doc_id").as("dup_of"), col("n").as("n_old")), "dup_of")
      .select(col("new_id"), col("dup_of"),
        util.r4(col("shared").cast("double") / (col("n_new") + col("n_old") - col("shared")))
          .as("jaccard"))
      .where(col("jaccard") >= operators.Dedup.JaccardThreshold)
      .orderBy("new_id", "dup_of")
      .collect().toSeq
    assert(viaIndex === direct)
    // contract: every pair crosses the split in the declared direction
    viaIndex.foreach { r =>
      assert(r.getLong(0) % 10 == 7L && r.getLong(1) % 10 != 7L)
    }
  }

  /** Shared criterion for the band-index append cases (the band twin of
    * IvfIndexSpec's appendIvfIndex case): the appended near-clone is found
    * by the next probe, every pre-append band file stays byte-identical,
    * and the write-time bucket cap holds ACROSS builds — a hot bucket
    * cannot regrow past the cap through appends. */
  private def bandFiles(path: String): Map[String, Array[Byte]] =
    new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> java.nio.file.Files.readAllBytes(f.toPath))
      .toMap

  test("appendMinhashIndex: probe finds the appended clone, old files untouched, cap holds") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val idx = Files.createTempDirectory("graft_mh_app").toString
    operators.Dedup.writeMinhashIndex(spark, dir, idx)

    val src = util.t(spark, dir, "documents")
      .where(col("doc_id") % 10 =!= 7).orderBy("doc_id")
      .select("doc_id", "text").limit(1).collect().head
    val (srcId, srcText) = (src.getLong(0), src.getString(1))
    val before = bandFiles(s"$idx/bands")
    val sigsBefore = spark.read.parquet(s"$idx/sigs").count()

    operators.Dedup.appendMinhashIndex(spark, idx,
      Seq((900001L, srcText)).toDF("doc_id", "text"))

    // the next probe (same text, fresh id) must verify BOTH the original
    // corpus doc and the appended clone as duplicates (est_jaccard = 1.0)
    val hits = operators.Dedup.probeMinhashIndex(spark,
        Seq((900002L, srcText)).toDF("doc_id", "text"), idx)
      .collect().map(_.getLong(1)).toSet
    assert(hits.contains(900001L), s"appended clone not found by probe: $hits")
    assert(hits.contains(srcId), s"original corpus doc lost from probe: $hits")

    // append-only: every pre-append band file byte-identical
    val after = bandFiles(s"$idx/bands")
    before.foreach { case (name, bytes) =>
      assert(after.contains(name), s"pre-append file $name removed")
      assert(java.util.Arrays.equals(bytes, after(name)), s"pre-append file $name rewritten")
    }
    assert(spark.read.parquet(s"$idx/sigs").count() === sigsBefore + 1)

    // cap ACROSS builds: 70 identical clones share the clone's 4 (band, bh)
    // buckets; occupancy-aware truncation must stop each at MinhashMaxBucket
    operators.Dedup.appendMinhashIndex(spark, idx,
      (910001L to 910070L).map(i => (i, srcText)).toDF("doc_id", "text"))
    val cloneBuckets = spark.read.parquet(s"$idx/bands")
      .where(col("doc_id") === 900001L).select("band", "bh")
    val counts = spark.read.parquet(s"$idx/bands")
      .join(cloneBuckets, Seq("band", "bh"), "left_semi")
      .groupBy("band", "bh").count().collect()
    assert(counts.nonEmpty)
    counts.foreach { r =>
      assert(r.getLong(2) === operators.Dedup.MinhashMaxBucket.toLong,
        s"hot bucket (${r.get(0)},${r.get(1)}) at ${r.getLong(2)}, " +
          s"expected exactly the ${operators.Dedup.MinhashMaxBucket} cap")
    }
  }

  test("appendGramIndex: probe finds the appended clone, old files untouched, df cap holds") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val idx = Files.createTempDirectory("graft_gr_app").toString
    operators.Dedup.writeGramIndex(spark, dir, idx)

    val src = util.t(spark, dir, "documents")
      .where(col("doc_id") % 10 =!= 7).orderBy("doc_id")
      .select("doc_id", "text").limit(1).collect().head
    val (srcId, srcText) = (src.getLong(0), src.getString(1))
    val before = bandFiles(s"$idx/grams")
    val sizesBefore = spark.read.parquet(s"$idx/sizes").count()

    operators.Dedup.appendGramIndex(spark, idx,
      Seq((900001L, srcText)).toDF("doc_id", "text"))

    // the next probe (same text, fresh id) must report BOTH the original
    // corpus doc and the appended clone as verified near-dups (jaccard is
    // computed over the PRUNED index on both sides, so exact 1.0 is only
    // guaranteed when no gram sits at the df cap — presence is the
    // contract, same as at build time)
    val hits = operators.Dedup.probeGramIndex(spark,
        Seq((900002L, srcText)).toDF("doc_id", "text"), idx)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(hits.contains(900001L), s"appended clone not found by probe: $hits")
    assert(hits.contains(srcId), s"original corpus doc lost: $hits")

    // append-only: every pre-append grams file byte-identical
    val after = bandFiles(s"$idx/grams")
    before.foreach { case (name, bytes) =>
      assert(after.contains(name), s"pre-append file $name removed")
      assert(java.util.Arrays.equals(bytes, after(name)), s"pre-append file $name rewritten")
    }
    assert(spark.read.parquet(s"$idx/sizes").count() === sizesBefore + 1)

    // df cap ACROSS builds: 60 more identical clones push every gram of
    // this text past JaccardMaxDf (old + 60 > 50), so NOTHING is admitted
    // to grams/ — but the df deltas are still recorded, and the original
    // entries are retained (documented one-sided drift)
    val gramsBefore = spark.read.parquet(s"$idx/grams").count()
    operators.Dedup.appendGramIndex(spark, idx,
      (910001L to 910060L).map(i => (i, srcText)).toDF("doc_id", "text"))
    assert(spark.read.parquet(s"$idx/grams").count() === gramsBefore,
      "over-cap grams must not be admitted")
    // and a FURTHER single append of the same text is now also blocked
    // (the dfs sidecar saw the batch): probe still finds the original
    operators.Dedup.appendGramIndex(spark, idx,
      Seq((920001L, srcText)).toDF("doc_id", "text"))
    assert(spark.read.parquet(s"$idx/grams").count() === gramsBefore)
    val hits2 = operators.Dedup.probeGramIndex(spark,
        Seq((900003L, srcText)).toDF("doc_id", "text"), idx)
      .collect().map(_.getLong(1)).toSet
    assert(hits2.contains(srcId), "original entries must be retained past the cap")
  }

  test("appendSimhashIndex: probe finds the appended clone, old files untouched, cap holds") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val idx = Files.createTempDirectory("graft_sh_app").toString
    operators.Dedup.writeSimhashIndex(spark, dir, idx)

    val src = util.t(spark, dir, "documents")
      .where(col("doc_id") % 10 =!= 7).orderBy("doc_id")
      .select("doc_id", "text").limit(1).collect().head
    val (srcId, srcText) = (src.getLong(0), src.getString(1))
    val before = bandFiles(s"$idx/bands")

    operators.Dedup.appendSimhashIndex(spark, idx,
      Seq((900001L, srcText)).toDF("doc_id", "text"))

    val hits = operators.Dedup.probeSimhashIndex(spark,
        Seq((900002L, srcText)).toDF("doc_id", "text"), idx)
      .collect().map(_.getLong(1)).toSet
    assert(hits.contains(900001L), s"appended clone not found by probe: $hits")
    assert(hits.contains(srcId), s"original corpus doc lost from probe: $hits")

    val after = bandFiles(s"$idx/bands")
    before.foreach { case (name, bytes) =>
      assert(after.contains(name), s"pre-append file $name removed")
      assert(java.util.Arrays.equals(bytes, after(name)), s"pre-append file $name rewritten")
    }

    // default build = density-DERIVED cap, persisted in meta/ — the
    // appends must top every clone bucket out at exactly that cap
    val derivedCap = spark.read.parquet(s"$idx/meta")
      .where(col("key") === "max_bucket").select("value")
      .collect().head.getLong(0)
    assert(derivedCap >= 1L && derivedCap <= operators.Dedup.SimhashCapMax,
      s"derived cap out of range: $derivedCap")
    // enough clones to overflow any derivable cap on this corpus
    val nClones = derivedCap.toInt + 50
    operators.Dedup.appendSimhashIndex(spark, idx,
      (910001L until (910001L + nClones)).map(i => (i, srcText)).toDF("doc_id", "text"))
    val cloneBuckets = spark.read.parquet(s"$idx/bands")
      .where(col("doc_id") === 900001L).select("chunk", "cv")
    val counts = spark.read.parquet(s"$idx/bands")
      .join(cloneBuckets, Seq("chunk", "cv"), "left_semi")
      .groupBy("chunk", "cv").count().collect()
    assert(counts.nonEmpty)
    counts.foreach { r =>
      assert(r.getLong(2) === derivedCap,
        s"hot bucket (${r.get(0)},${r.get(1)}) at ${r.getLong(2)}, " +
          s"expected exactly the derived cap $derivedCap")
    }
  }

  test("derivedCapOf: minimal size under the over-mass target, hard ceiling, empty fallback") {
    import spark.implicits._
    def cap(sizes: Seq[Long]): Long =
      operators.Dedup.derivedCapOf(sizes.toDF("n")).collect().head.getLong(0)
    // 100 singleton buckets + one bucket of 50: entries 150, target
    // ceil(0.75) = 1; truncating at 1 sheds 49 (> 1), at 50 sheds 0 →
    // the hot bucket is kept whole because it IS the signal
    assert(cap(Seq.fill(100)(1L) :+ 50L) === 50L)
    // heavy head that CAN be truncated within budget: 1000 buckets of 4
    // (4000 entries) + one of 40; target ceil(4040*0.005) = 21;
    // over_mass(4) = 36 > 21, over_mass(40) = 0 → 40 (the minimal
    // observed size under budget — sizes, not arbitrary integers)
    assert(cap(Seq.fill(1000)(4L) :+ 40L) === 40L)
    // a size below the max qualifies when the shed fits the budget:
    // 4000 singletons + one of 21: target ceil(4021*0.005) = 21;
    // over_mass(1) = 20 <= 21 → cap 1 (truncates the hot bucket to 1)
    assert(cap(Seq.fill(4000)(1L) :+ 21L) === 1L)
    // degenerate all-one-bucket corpus: derivation would want ~0.995N,
    // the SimhashCapMax ceiling preserves bounded fan-out
    assert(cap(Seq(5000L)) === operators.Dedup.SimhashCapMax.toLong)
    // empty corpus → the constant fallback
    assert(cap(Seq.empty) === operators.Dedup.SimhashMaxBucket.toLong)
  }

  test("band-index appends enforce the cap PERSISTED with the index, not the compile-time constant") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val srcText = util.t(spark, dir, "documents")
      .where(col("doc_id") % 10 =!= 7).orderBy("doc_id")
      .select("text").limit(1).collect().head.getString(0)
    val hot = (930001L to 930010L).map(i => (i, srcText)).toDF("doc_id", "text")

    // SimHash: built with a deliberately tiny cap — the meta sidecar, not
    // SimhashMaxBucket (256), must bound every bucket after a hot append
    val shIdx = Files.createTempDirectory("graft_sh_meta").toString
    operators.Dedup.writeSimhashIndex(spark, dir, shIdx, maxBucket = 4)
    val shDropped = operators.Dedup.appendSimhashIndex(spark, shIdx, hot)
    val shMax = spark.read.parquet(s"$shIdx/bands")
      .groupBy("chunk", "cv").count().agg(max("count")).collect().head.getLong(0)
    assert(shMax <= 4L, s"simhash bucket grew past the persisted cap: $shMax")
    // 10 clones × 4 chunks against cap 4: the rejected-entry count the
    // over-cap tripwire warns on must surface most of the batch
    assert(shDropped >= 24L,
      s"append must report the cap-rejected entries, got $shDropped")

    // MinHash twin
    val mhIdx = Files.createTempDirectory("graft_mh_meta").toString
    operators.Dedup.writeMinhashIndex(spark, dir, mhIdx, maxBucket = 4)
    val mhDropped = operators.Dedup.appendMinhashIndex(spark, mhIdx, hot)
    val mhMax = spark.read.parquet(s"$mhIdx/bands")
      .groupBy("band", "bh").count().agg(max("count")).collect().head.getLong(0)
    assert(mhMax <= 4L, s"minhash bucket grew past the persisted cap: $mhMax")
    assert(mhDropped > 0L,
      s"append must report the cap-rejected entries, got $mhDropped")

    // gram index: a custom df cap persisted at build prunes appends too —
    // after 3 identical clones no gram may exceed 2 entries
    val grIdx = Files.createTempDirectory("graft_gr_meta").toString
    operators.Dedup.writeGramIndex(spark, dir, grIdx, maxDf = 2)
    operators.Dedup.appendGramIndex(spark, grIdx,
      (940001L to 940003L).map(i => (i, srcText)).toDF("doc_id", "text"))
    val grMax = spark.read.parquet(s"$grIdx/grams")
      .groupBy("gh").count().agg(max("count")).collect().head.getLong(0)
    assert(grMax <= 2L, s"gram entries grew past the persisted df cap: $grMax")
  }

  test("minhash est_jaccard is 1.0 for identical docs and low for disjoint docs") {
    import spark.implicits._
    val sigs = operators.Dedup.minhashSignatures(spark, fixtureDir)
      .as[(Long, Seq[Int])].collect().toMap
    assert(sigs(1L) === sigs(3L), "identical docs must have identical signatures")
    val overlap45 = sigs(4L).zip(sigs(5L)).count { case (a, b) => a == b } / 16.0
    assert(overlap45 < 0.5, s"disjoint docs look similar: $overlap45")
  }

  test("q_dedup_keep_best keeps the highest-quality cluster member, not the min id") {
    // fixture cluster {1,2,3}: 1 and 3 share identical text; 2 swaps
    // "done" for the longer "finished", raising its word-shape term and
    // with it the 4-dp quality — so keep-best must elect 2 where the
    // min-id policy elects 1. Singletons 4, 5 survive either policy.
    val best = operators.Dedup.dedupKeepBest(spark, fixtureDir)
      .collect().map(_.getLong(0)).toSet
    val minId = operators.Dedup.dedupApply(spark, fixtureDir)
      .collect().map(_.getLong(0)).toSet
    assert(best === Set(2L, 4L, 5L), s"keep-best kept $best")
    assert(minId === Set(1L, 4L, 5L), s"min-id kept $minId")
    // policy invariant on the real corpus: both policies drop the same
    // NUMBER of docs (one keeper per cluster), only the identity differs
    val dir = TestSpark.sfDir
    val nBest = operators.Dedup.dedupKeepBest(spark, dir).count()
    val nMin = operators.Dedup.dedupApply(spark, dir).count()
    assert(nBest === nMin, s"keeper-per-cluster broken: $nBest vs $nMin")
  }

  test("q_dedup_cross_source: pair counts land in the right source cells") {
    // fixture near-dup component {1,2,3}: 1,2 ∈ src0, 3 ∈ src1 →
    // within-src0 pair (1,2) and cross pairs (1,3),(2,3); docs 4,5 pair
    // with nothing so src2/src3 never appear
    val m = operators.Dedup.dedupCrossSource(spark, fixtureDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m === Map(("src0", "src0") -> 1L, ("src0", "src1") -> 2L), s"matrix was $m")
  }

  test("q_dedup_eval: metrics are internally consistent and recall is high on the corpus") {
    val r = operators.Dedup.dedupEval(spark, TestSpark.sfDir).collect()
    assert(r.length === 1)
    val (nCand, nTruth, nHits) = (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2))
    assert(nHits <= math.min(nCand, nTruth), s"hits $nHits exceed a side ($nCand, $nTruth)")
    assert(nTruth > 0, "test corpus should contain true near-dup pairs")
    // 16-perm/4-band LSH at the 0.5 jaccard threshold: collision
    // probability 1-(1-s^4)^4 ≥ 0.23 per pair at s=0.5 and ≥ 0.9 by
    // s≈0.85 — the corpus's near-dups are near-identical, so candidate
    // recall must be near-total; a drop means the band mechanics broke
    val recall = r(0).getDouble(3)
    assert(recall >= 0.9, s"LSH candidate recall $recall collapsed")
  }

  test("q_dedup_simhash_eval: SimhashEvalMaxBucket bounds truth pairs on a degenerate bucket") {
    import spark.implicits._
    // 300 identical docs: one signature, every chunk bucket holds all 300
    // (> SimhashMaxBucket = 256)
    val dir = Files.createTempDirectory("graft_simhash_cap").toString
    val tx = "identical boilerplate banner text repeated across the whole crawl"
    (1L to 300L).map(id => (id, tx, "en", "src", tx.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // declared (uncapped) truth is all-pairs: C(300,2); the candidate
    // side is already rep-capped (300 > SimhashMaxBucket) at 299 pairs
    val uncapped = operators.Dedup.dedupSimhashEval(spark, dir).collect()(0)
    assert(uncapped.getLong(1) === 44850L, s"uncapped truth ${uncapped.getLong(1)}")
    assert(uncapped.getLong(0) === 299L, s"capped candidates ${uncapped.getLong(0)}")

    // capped truth switches to representative pairing: min-doc vs rest,
    // O(n) not O(n²) — and then recall reads 1.0 (both sides rep-paired)
    val capped = operators.Dedup.dedupSimhashEval(
      spark, dir, operators.Dedup.SimhashEvalMaxBucket).collect()(0)
    assert(capped.getLong(1) === 299L, s"capped truth ${capped.getLong(1)}")
    assert(capped.getDouble(3) === 1.0, s"capped recall ${capped.getDouble(3)}")
  }
}
