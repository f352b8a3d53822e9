package graft

import java.nio.file.Files
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

/** Semantic fixtures for the round-7 corpus-preparation operators
  * (operators/CorpusOps.scala). The DuckDB oracle pins cross-engine
  * parity on the real tables; these pin the ABSOLUTE behavior —
  * hand-computed splits, rates, coverage fractions, rarity integers, and
  * keep-first block survivorship. */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_corpusops").toString
    rows.map { case (id, tx, lang, src) => (id, tx, lang, src, tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_split_assign: buckets drive labels, splits are a disjoint cover, assignment is deterministic") {
    val dir = TestSpark.sfDir
    val a = operators.CorpusOps.splitAssign(spark, dir).collect()
    val b = operators.CorpusOps.splitAssign(spark, dir).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq, "split must be replayable")
    assert(a.length === 500, "every doc gets exactly one split row")
    a.foreach { r =>
      val (bucket, split) = (r.getLong(2), r.getString(3))
      val expected =
        if (bucket < operators.CorpusOps.SplitTestPerMille) "test"
        else if (bucket < operators.CorpusOps.SplitValPerMille) "val"
        else "train"
      assert(split === expected, s"doc ${r.getLong(0)} bucket $bucket")
      assert(bucket >= 0 && bucket < 1000)
    }
    // per-mille rates hold to within md5-coin noise on 500 docs
    val byName = a.groupBy(_.getString(3)).view.mapValues(_.length).toMap
    assert(byName.getOrElse("test", 0) <= 25, "~1% target")
    assert(byName.getOrElse("val", 0) <= 40, "~2% target")
    assert(byName("train") >= 440)
  }

  test("q_sample_temperature: exact thresholds from the α=1/2 rule; tail source keeps a larger share") {
    // 90/10 source skew: thrA = ⌊min(1, 0.25·sqrt(100/90))·10000⌋,
    // thrB = ⌊min(1, 0.25·sqrt(100/10))·10000⌋ — replay the same IEEE ops
    val docs = (1L to 90L).map(i => (i, s"tok$i word", "en", "srcA")) ++
      (91L to 100L).map(i => (i, s"tok$i word", "en", "srcB"))
    val dir = writeDocs(docs)
    val rows = operators.CorpusOps.sampleTemperature(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    val thrA = math.floor(math.min(1.0, 0.25 * math.sqrt(100.0 / 90L)) * 10000).toLong
    val thrB = math.floor(math.min(1.0, 0.25 * math.sqrt(100.0 / 10L)) * 10000).toLong
    assert(rows("srcA")._1 === 90L && rows("srcB")._1 === 10L)
    assert(rows("srcA")._2 === thrA, "head-source threshold")
    assert(rows("srcB")._2 === thrB, "tail-source threshold")
    assert(thrB > thrA, "flattening: rarer source keeps a larger fraction")
    assert(rows("srcA")._3 <= 90L && rows("srcB")._3 <= 10L)
  }

  test("q_vocab_coverage: Zipf-head shares hand-checked at k=10/100/1000") {
    // 15 types, type wi appears (16-i) times → total 120; top-10 mass
    // 15+14+…+6 = 105 → share 0.875; k=100/1000 cover everything
    val toks = (1 to 15).flatMap(i => Seq.fill(16 - i)(f"w$i%02d"))
    val dir = writeDocs(Seq((1L, toks.mkString(" "), "en", "src")))
    val got = operators.CorpusOps.vocabCoverage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      (10L, 105L, 120L, 15L, 0.875),
      (100L, 120L, 120L, 15L, 1.0),
      (1000L, 120L, 120L, 15L, 1.0)))
  }

  test("q_shuffle_shard: pins a full deterministic permutation of the corpus") {
    val dir = TestSpark.sfDir
    val a = operators.CorpusOps.shuffleShard(spark, dir).collect()
    val b = operators.CorpusOps.shuffleShard(spark, dir).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq, "shuffle must be replayable")
    assert(a.map(_.getLong(1)).sum === 500L, "every doc lands in exactly one shard")
    assert(a.map(_.getLong(0)).distinct.length === a.length)
    assert(a.forall(r => r.getLong(0) >= 0 && r.getLong(0) < operators.CorpusOps.ShuffleShards))
    // the checksum pins ORDER, not just membership: it must differ from
    // the ingest-order checksum (pos by doc_id) for at least one shard —
    // md5 order matching ingest order on every multi-doc shard is ~impossible
    val ingestOrder = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      t(spark, dir, "documents")
        .select(col("doc_id"),
          (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % operators.CorpusOps.ShuffleShards).as("shard"))
        .withColumn("pos", row_number().over(
          Window.partitionBy("shard").orderBy("doc_id")).cast("long"))
        .groupBy("shard").agg(sum(expr("doc_id * pos")).as("order_sum"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val shuffled = a.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(shuffled.exists { case (s, cs) => ingestOrder(s) != cs },
      "shuffled order must not equal ingest order")
  }

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, name: String) =
    s.read.parquet(s"$dir/$name.parquet")

  test("q_quality_unigram: integer surprisal hand-checked; hapax-heavy doc scores rarer") {
    // freq: the=5, rare=1, N=6 → doc1 = 4·⌊6/5⌋ = 4; doc2 = ⌊6/5⌋+⌊6/1⌋ = 7
    val dir = writeDocs(Seq(
      (1L, "the the the the", "en", "src"),
      (2L, "the rare", "en", "src")))
    val got = operators.CorpusOps.qualityUnigram(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      1L -> ((4L, 4L, 1L)),
      2L -> ((2L, 7L, 3L))))
    assert(got(2L)._3 > got(1L)._3, "rare-token doc has higher mean rarity")
  }

  test("q_token_histogram: bit-length buckets hand-checked") {
    // token counts 1,2,3,4,8 → bit-length buckets 1,2,2,3,4
    val dir = writeDocs(Seq(
      (1L, "a", "en", "src"),
      (2L, "a b", "en", "src"),
      (3L, "a b c", "en", "src"),
      (4L, "a b c d", "en", "src"),
      (5L, "a b c d e f g h", "en", "src")))
    val got = operators.CorpusOps.tokenHistogram(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(got.toSeq === Seq(
      1L -> ((1L, 1L, 1L, 1L)),
      2L -> ((2L, 5L, 2L, 3L)),
      3L -> ((1L, 4L, 4L, 4L)),
      4L -> ((1L, 8L, 8L, 8L))))
  }

  test("q_corpus_diff: every status branch exercised on the declared snapshot views") {
    // ids 0..9: v1 = 0-7, v2 = 2-9 with id 3 edited
    val dir = writeDocs((0L to 9L).map(i => (i, s"t$i body", "en", "src")))
    val got = operators.CorpusOps.corpusDiff(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("added" -> 2L, "removed" -> 2L, "changed" -> 1L, "same" -> 5L))
  }

  test("q_source_overlap: hand-computed gram-set resemblance and containment per source pair") {
    val dir = writeDocs(Seq(
      (1L, "a b c d", "en", "src0"),   // grams {abc, bcd}           n=2
      (2L, "a b c d e", "en", "src1"), // grams {abc, bcd, cde}      n=3
      (3L, "x y z w", "en", "src2")))  // grams {xyz, yzw}, disjoint
    val got = operators.CorpusOps.sourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    // only the pair with shared mass appears; src2 shares nothing
    assert(got.toSeq === Seq(("src0", "src1", 2L, 2L, 3L, 0.6667, 1.0)),
      "shared=2 of sizes 2/3: jaccard 2/3, overlap 2/min(2,3)=1")
  }

  test("q_source_overlap_theta: exact-mode equality at sf0.001; estimate agreement at sf0.01") {
    // below the 4096-entry nominal bound the sketches are exact, so the
    // matrix must match the exact query cell for cell
    def cells(df: org.apache.spark.sql.DataFrame): Map[(String, String), (Long, Long, Long, Double, Double)] =
      df.collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    // the theta matrix carries EVERY unordered source pair (zero cells
    // included — estimation mode can estimate a real overlap to 0, and a
    // suppressed cell would be indistinguishable from an absent pair);
    // the exact twin only emits pairs with shared grams, so the equality
    // is on theta's shared_est>0 cells and the zero cells must be
    // exactly the pairs the exact matrix omits
    val exactSmall = cells(operators.CorpusOps.sourceOverlap(spark, TestSpark.sfDir))
    val thetaSmall = cells(operators.CorpusOps.sourceOverlapTheta(spark, TestSpark.sfDir))
    assert(thetaSmall.filter(_._2._1 > 0) === exactSmall,
      "exact-mode sketches must reproduce the exact matrix on nonzero cells")
    assert(thetaSmall.keySet.filterNot(thetaSmall(_)._1 > 0)
        .intersect(exactSmall.keySet).isEmpty,
      "exact-mode zero cells must be pairs the exact matrix omits")

    // sf0.01 pushes per-source gram sets past nominal → estimation mode;
    // theta relative std error at 4096 entries is ~1.6%/sketch, so 0.1
    // absolute on the ratio cells is a generous-but-breakage-catching bound
    val exactBig = cells(operators.CorpusOps.sourceOverlap(spark, "/root/testdata/sf0.01"))
    val thetaBig = cells(operators.CorpusOps.sourceOverlapTheta(spark, "/root/testdata/sf0.01"))
    assert(exactBig.keySet.subsetOf(thetaBig.keySet),
      "estimation mode lost matrix cells")
    val invented = thetaBig.filter(_._2._1 > 0).keySet -- exactBig.keySet
    assert(invented.isEmpty, s"nonzero estimates for pairs with no shared grams: $invented")
    exactBig.foreach { case (k, (_, _, _, jac, ov)) =>
      val (_, _, _, jacE, ovE) = thetaBig(k)
      assert(math.abs(jacE - jac) <= 0.1, s"$k jaccard_est $jacE vs exact $jac")
      assert(math.abs(ovE - ov) <= 0.1, s"$k overlap_est $ovE vs exact $ov")
    }
  }

  test("q_source_overlap_persisted: cell-identical to the in-flight fold; plan scans only the sketch table") {
    // theta state is a deterministic function of the input SET (not fold
    // order), so at-rest and in-flight must agree exactly — in estimation
    // mode too, hence sf0.01
    val dir = "/root/testdata/sf0.01"
    val direct = operators.CorpusOps.sourceOverlapTheta(spark, dir).collect().toSeq
    val persisted = operators.CorpusOps.sourceOverlapPersisted(spark, dir)
    assert(persisted.collect().toSeq === direct,
      "persisted sketch table diverged from the in-flight fold")
    // fixed-state contract: the matrix plan reads the sketch parquet and
    // NEVER rescans the corpus
    val plan = persisted.queryExecution.executedPlan.toString
    assert(plan.contains("graft_src_sketches"),
      s"plan must scan the persisted sketch table:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"matrix plan must not rescan the corpus:\n$plan")
  }

  test("sketch-table appends absorb (exact regime) and compaction folds to one row per source") {
    // theta states are a union monoid: built-in-two-appends must equal
    // the one-pass fold BIT-IDENTICALLY below the nominal bound (sf0.001
    // keeps every per-source gram set exact), so the matrix off the
    // appended table equals the in-flight theta matrix
    import org.apache.spark.sql.functions.col
    val dir = TestSpark.sfDir
    val docs = graft.util.t(spark, dir, "documents").select("source", "text", "doc_id")
    val path = java.nio.file.Files.createTempDirectory("graft_sk_append").toString
    operators.CorpusOps.appendSourceGramSketches(spark, path,
      docs.where(col("doc_id") % 3 =!= 0).select("source", "text"))
    operators.CorpusOps.appendSourceGramSketches(spark, path,
      docs.where(col("doc_id") % 3 === 0).select("source", "text"))
    val direct = operators.CorpusOps.sourceOverlapTheta(spark, dir).collect().toSeq
    val appended = operators.CorpusOps.sourceOverlapFrom(spark, path).collect().toSeq
    assert(appended === direct, "appended table's matrix diverged from the one-pass fold")

    // compaction = the readers' own merge, folded at rest
    val filesBefore = operators.IndexMaintenance.dataFileCount(spark, path)
    operators.IndexMaintenance.compactSketchTable(spark, path)
    assert(operators.IndexMaintenance.dataFileCount(spark, path) < filesBefore,
      "compaction did not shrink the sketch table")
    val perSource = spark.read.parquet(path).groupBy("source").count()
      .where(col("count") > 1).count()
    assert(perSource === 0L, "one merged row per source after compaction")
    assert(operators.CorpusOps.sourceOverlapFrom(spark, path).collect().toSeq === direct,
      "matrix changed across compaction")
  }

  test("url frontier: canonicalization dedups the probe, appends absorb, seen urls stay quiet") {
    import spark.implicits._
    val dir = TestSpark.sfDir
    val path = java.nio.file.Files.createTempDirectory("graft_frontier_t").toString
    operators.CorpusOps.writeUrlFrontier(spark, dir, path)

    // corpus doc 14 (14 % 10 ≠ 7 → corpus split, 14 % 7 = 0 → host
    // www.example.com) put https://www.example.com/p/14 in the frontier;
    // scheme/case/query variants of it must probe as SEEN, while a novel
    // host is NEW with canon collapse inside the batch (min doc wins)
    val batch = Seq(
      (999001L, "x https://new.example.net/a?z=1 y"),
      (999002L, "z https://new.example.net/a#frag w HTTP://www.Example.com/p/14?utm=x v"))
      .toDF("doc_id", "text")
    val out = operators.CorpusOps.probeUrlFrontier(spark, batch, path)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out === Seq(("new.example.net/a", 999001L)),
      s"probe must emit exactly the novel canonical url, got $out")

    // admit the batch; the novel url stops being new
    operators.CorpusOps.appendUrlFrontier(spark, path, batch)
    assert(operators.CorpusOps.probeUrlFrontier(spark, batch, path).count() === 0L,
      "appended urls must stop probing as new")

    // compaction: duplicate hash rows collapse, probe verdicts identical
    operators.CorpusOps.appendUrlFrontier(spark, path, batch) // duplicate generation
    val filesBefore = operators.IndexMaintenance.dataFileCount(spark, s"$path/hashes")
    operators.IndexMaintenance.compactUrlFrontier(spark, path)
    assert(operators.IndexMaintenance.dataFileCount(spark, s"$path/hashes") < filesBefore)
    val h = spark.read.parquet(s"$path/hashes")
    assert(h.count() === h.distinct().count(), "compaction must dedup hash rows")
    assert(operators.CorpusOps.probeUrlFrontier(spark, batch, path).count() === 0L,
      "probe verdicts changed across compaction")
  }

  test("q_corpus_novelty: first carrier gets the credit, copies score zero, partial overlap fractions") {
    val dir = writeDocs(Seq(
      (1L, "a b c d", "en", "src"), // {abc, bcd} both first-seen → 1.0
      (2L, "a b c d", "en", "src"), // exact copy → 0.0
      (3L, "b c d e", "en", "src"))) // {bcd, cde}: bcd seen, cde new → 0.5
    val got = operators.CorpusOps.corpusNovelty(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1L, 2L, 2L, 1.0), (2L, 2L, 0L, 0.0), (3L, 2L, 1L, 0.5)))
  }

  test("q_split_leakage: a held-out doc cloned from train leaks 1.0; unique held-out text 0.0") {
    // pick ids by replaying the split coin locally so the fixture is
    // robust to the per-mille constants
    def bucket(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % 1000
    val held = (1L to 2000L).filter(bucket(_) < operators.CorpusOps.SplitValPerMille)
    val train = (1L to 2000L).filter(bucket(_) >= operators.CorpusOps.SplitValPerMille)
    val (leakyId, cleanId, trainId) = (held(0), held(1), train(0))
    val dir = writeDocs(Seq(
      (trainId, "a b c d e", "en", "src"),   // train content
      (leakyId, "a b c d e", "en", "src"),   // held-out clone of train → 1.0
      (cleanId, "p q r s t", "en", "src")))  // held-out unique → 0.0
    val got = operators.CorpusOps.splitLeakage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
      .sortBy(_._1)
    assert(got === Seq((leakyId, 3L, 3L, 1.0), (cleanId, 3L, 0L, 0.0)).sortBy(_._1),
      "three 3-grams each; the clone hits all of them, the unique doc none")
    // the split labels are the coin's, not positional
    val labels = operators.CorpusOps.splitLeakage(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!labels.contains(trainId), "train docs carry no leakage row")
  }

  test("q_split_leakage_bloom: superset of exact hits, bounded inflation, real-split rows") {
    val dir = TestSpark.sfDir
    def byDoc(df: org.apache.spark.sql.DataFrame): Map[Long, (String, Long, Long)] =
      df.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val exact = byDoc(operators.CorpusOps.splitLeakage(spark, dir))
    val bloom = byDoc(operators.CorpusOps.splitLeakageBloom(spark, dir))
    assert(bloom.keySet === exact.keySet && exact.nonEmpty, "held-out row set differs")
    exact.foreach { case (id, (split, nGrams, nHit)) =>
      assert(bloom(id)._1 === split && bloom(id)._2 === nGrams, s"doc $id label/size differs")
      // no false negatives: every exact train hit survives the filter
      assert(bloom(id)._3 >= nHit, s"doc $id: bloom lost hits ($nHit -> ${bloom(id)._3})")
    }
    val fps = exact.map { case (id, (_, _, nHit)) => bloom(id)._3 - nHit }.sum.toDouble
    val negatives = exact.values.map { case (_, ng, nh) => ng - nh }.sum.toDouble
    assert(negatives == 0 || fps / negatives <= 0.01,
      s"false-positive inflation ${fps / negatives} over $negatives true negatives")
  }

  test("q_quality_bigram: scrambled doc scores high where unigram rarity is blind") {
    // both docs = the SAME token multiset (identical unigram profile);
    // doc 2 is a fixed scramble that lands in rare bigram cells
    val clean = Seq.fill(6)("the cat sat on the mat").mkString(" ")
    val scram = (Seq.fill(3)("cat the mat sat the on") ++
      Seq.fill(3)("on mat the sat cat the")).mkString(" ")
    val dir = writeDocs(Seq(
      (1L, clean, "en", "src"),
      (2L, scram, "en", "src")))
    val got = operators.CorpusOps.qualityBigram(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(got(1L)._1 === 35L && got(2L)._1 === 35L, "same bigram count both docs")
    assert(got(2L)._2 > got(1L)._2,
      s"scramble must out-surprise the clean doc: ${got(2L)._2} vs ${got(1L)._2}")
    // unigram rarity is blind to the scramble: identical token bags
    val uni = operators.CorpusOps.qualityUnigram(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(uni(1L) === uni(2L), "unigram mean_rarity must tie on the same bag")
  }

  test("q_dedup_paragraph: keep-first block survivorship across and within docs") {
    val A = (0 until 32).map(i => s"a$i").mkString(" ")
    val B = (0 until 32).map(i => s"b$i").mkString(" ")
    val C = (0 until 32).map(i => s"c$i").mkString(" ")
    val D = (0 until 32).map(i => s"d$i").mkString(" ")
    val tail = (0 until 8).map(i => s"t$i").mkString(" ") // partial tail block
    val dir = writeDocs(Seq(
      (1L, s"$A $B", "en", "src"),    // first occurrence of A and B
      (2L, s"$A $C", "en", "src"),    // A dup → dropped; C kept
      (3L, B, "en", "src"),           // whole doc duplicates doc1's B → empty
      (4L, s"$D $tail", "en", "src"), // unique, incl. 8-token tail block
      (5L, s"$C $C", "en", "src")))   // C dups doc2's → both copies dropped
    val got = operators.CorpusOps.dedupParagraph(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((2L, 2L, md5hex(s"$A $B"))), "first doc keeps everything")
    assert(got(2L) === ((2L, 1L, md5hex(C))), "duplicate leading block removed")
    assert(got(3L) === ((1L, 0L, md5hex(""))), "fully-duplicate doc empties out")
    assert(got(4L) === ((2L, 2L, md5hex(s"$D $tail"))), "partial tail block round-trips")
    assert(got(5L) === ((2L, 0L, md5hex(""))), "within-doc copies lose to the earlier doc")
  }

  test("q_chunk_overlap: chunk counts, spans, and overlap follow the C=64/S=48 geometry") {
    val tok = (n: Int) => (0 until n).map(i => s"w$i").mkString(" ")
    // n = 10, 64 → one chunk; 65 → two; 160 → three (last exactly full);
    // 161 → four (17-token tail)
    val dir = writeDocs(Seq(
      (1L, tok(10), "en", "src"), (2L, tok(64), "en", "src"),
      (3L, tok(65), "en", "src"), (4L, tok(160), "en", "src"),
      (5L, tok(161), "en", "src")))
    val rows = operators.CorpusOps.chunkOverlap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val byDoc = rows.groupBy(_._1)
    assert(byDoc(1L).length === 1 && byDoc(2L).length === 1)
    assert(byDoc(3L).length === 2 && byDoc(4L).length === 3 && byDoc(5L).length === 4)
    // spans: chunk i starts at i*48; lengths clamp at the doc end
    assert(byDoc(3L).map(c => (c._3, c._4)).toSet === Set((0L, 64L), (48L, 17L)))
    assert(byDoc(4L).map(c => (c._3, c._4)).toSet === Set((0L, 64L), (48L, 64L), (96L, 64L)))
    assert(byDoc(5L).map(c => (c._3, c._4)).toSet ===
      Set((0L, 64L), (48L, 64L), (96L, 64L), (144L, 17L)))
    // consecutive chunks overlap by exactly C − S = 16 tokens, and the
    // union of chunk tokens reconstructs the doc in order
    val c4 = byDoc(4L).sortBy(_._2).map(_._5.split(" ").toSeq)
    assert(c4(0).takeRight(16) === c4(1).take(16), "overlap window mismatch")
    val rebuilt = c4.head ++ c4.tail.flatMap(_.drop(16))
    assert(rebuilt === tok(160).split(" ").toSeq, "chunks must cover the doc exactly")
  }

  // ---- public-suffix catalog (regDomain / PSL artifact) ------------------

  private def regDom(host: String, cat: Seq[String]): String = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    Seq(host).toDF("h")
      .select(operators.CorpusOps.regDomainWith(col("h"), cat).as("d"))
      .collect().head.getString(0)
  }

  test("regDomainWith: longest-suffix-wins over multi-level and private-registry suffixes") {
    val cat = operators.CorpusOps.DefaultPslCatalog
    // plain two-label fallthrough
    assert(regDom("www.example.com", cat) === "example.com")
    assert(regDom("example.org", cat) === "example.org")
    // ccSLD multi-level suffixes: suffix + ONE more label
    assert(regDom("a.b.example.co.uk", cat) === "example.co.uk")
    assert(regDom("shop.example.com.au", cat) === "example.com.au")
    assert(regDom("x.y.z.co.jp", cat) === "z.co.jp")
    // private-registry suffix (the github.io class): each user site is
    // its own registrable domain — the whole point of loading a real PSL
    assert(regDom("user1.github.io", cat) === "user1.github.io")
    assert(regDom("deep.page.user1.github.io", cat) === "user1.github.io")
    // a host that IS a suffix, and dotless hosts, are their own domain
    assert(regDom("co.uk", cat) === "co.uk")
    assert(regDom("localhost", cat) === "localhost")
    // longest match wins when catalogs nest: with both 'uk'-level and
    // 'co.uk' listed, co.uk (3 labels kept? no — suffix+1) dominates
    val nested = Seq("uk", "co.uk")
    assert(regDom("a.example.co.uk", nested) === "example.co.uk")
    assert(regDom("example.ac.uk", nested) === "ac.uk")
  }

  test("regDomainWith: PSL wildcard and exception rules (the publicsuffix.org *.ck/!www.ck carve-out)") {
    val cat = operators.CorpusOps.DefaultPslCatalog // carries *.ck and !www.ck
    // wildcard: ANY label + ck is a public suffix → suffix + 1 label
    assert(regDom("shop.random.ck", cat) === "shop.random.ck")
    assert(regDom("deep.shop.random.ck", cat) === "shop.random.ck")
    // exception: www.ck is NOT a public suffix despite *.ck — it is the
    // registrable domain itself, at any depth
    assert(regDom("www.ck", cat) === "www.ck")
    assert(regDom("foo.www.ck", cat) === "www.ck")
    assert(regDom("a.b.foo.www.ck", cat) === "www.ck")
    // a host that IS a wildcard-matched suffix is its own domain
    assert(regDom("random.ck", cat) === "random.ck")
    // bare ck: dotless → own domain
    assert(regDom("ck", cat) === "ck")
    // plain rules are untouched by the wildcard machinery
    assert(regDom("a.b.example.co.uk", cat) === "example.co.uk")
  }

  test("regDomain at PSL scale: a 10k-suffix catalog stays a zero-shuffle projection") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // a synthetic full-PSL-sized catalog: 9990 plain two-level suffixes,
    // a 3-level slice, wildcards and exceptions — the real list's shape
    val big = (1 to 9990).map(i => s"s$i.tld") ++
      (1 to 50).map(i => s"t$i.s1.tld") ++ Seq("*.wild", "!keep.wild")
    // parquet-backed input: a purely local frame constant-folds into a
    // LocalRelation and there would be no plan left to assert on
    val hostsDir = Files.createTempDirectory("graft_psl_scale").toString
    Seq("a.b.s7.tld", "x.t3.s1.tld", "y.anything.wild", "z.keep.wild")
      .toDF("h").write.mode("overwrite").parquet(hostsDir)
    val df = spark.read.parquet(hostsDir)
      .select(operators.CorpusOps.regDomainWith(col("h"), big).as("d"))
    // semantics at scale (set compare: no presentation sort, so the
    // plan below stays pure projection)
    assert(df.collect().map(_.getString(0)).toSet ===
      Set("b.s7.tld", "x.t3.s1.tld", "y.anything.wild", "keep.wild"))
    // plan shape: one Project over the scan — no Join, no Exchange; the
    // catalog rides as hashed InSet literals, never as a join side
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"a catalog-sized regDomain must stay a projection:\n$plan")
    // and the membership tests actually optimized to InSet (not a
    // 10k-child In chain): the optimized expression prints INSET
    assert(df.queryExecution.optimizedPlan.toString.contains("INSET"),
      "expected the catalog probe to optimize to a hashed InSet")
  }

  test("PSL artifact round-trip: load replays the written catalog; tamper and version drift refuse") {
    val path = Files.createTempDirectory("graft_psl").toString
    val cat = Seq("co.uk", "com.au", "github.io", "co.uk") // dup collapses
    operators.CorpusOps.writePslArtifact(spark, path, cat)
    val loaded = operators.CorpusOps.loadPslArtifact(spark, path)
    assert(loaded === Seq("co.uk", "com.au", "github.io"))

    // the loaded catalog drives the SAME expression the declared queries
    // use — multi-level bucketing works under it
    assert(regDom("shop.example.com.au", loaded) === "example.com.au")
    assert(regDom("user1.github.io", loaded) === "user1.github.io")

    // tamper: rewrite the suffix table in place → manifest digest flips
    import spark.implicits._
    val files = new java.io.File(s"$path/suffixes").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    Seq("co.uk", "com.au", "evil.example").toDF("suffix")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/suffixes_tmp")
    val repl = new java.io.File(s"$path/suffixes_tmp").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(repl.toPath, files.head.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // drop the local-FS checksum sidecar so the read reaches the
    // manifest digest (production object stores have no .crc files)
    new java.io.File(s"$path/suffixes/.${files.head.getName}.crc").delete()
    val e1 = intercept[IllegalArgumentException] {
      operators.CorpusOps.loadPslArtifact(spark, path)
    }
    assert(e1.getMessage.contains("manifest"))

    // version drift: a valid artifact whose meta pins a future version
    val path2 = Files.createTempDirectory("graft_psl_v").toString
    operators.CorpusOps.writePslArtifact(spark, path2, Seq("co.uk"))
    Seq(("version", "999"), ("n_suffixes", "1")).toDF("key", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$path2/meta")
    val e2 = intercept[IllegalArgumentException] {
      operators.CorpusOps.loadPslArtifact(spark, path2)
    }
    assert(e2.getMessage.contains("version"))
  }

  test("q_url_extract under a loaded PSL: com.au/github.io hosts re-bucket; default catalog unchanged") {
    import spark.implicits._
    // q_url_extract's host catalog only exercises co.uk among the
    // multi-level suffixes, so default-catalog results equal the shipped
    // oracle; a corpus carrying com.au/github.io URLs needs the loaded
    // catalog to bucket correctly. Build such a corpus and check both.
    val dir = writeDocs(Seq(
      (1L, "pre https://shop.example.com.au/p/1 post", "en", "src"),
      (2L, "pre https://user1.github.io/p/2 and https://a.b.example.co.uk/q post", "en", "src"),
      (3L, "no urls at all", "en", "src")))
    val path = Files.createTempDirectory("graft_psl_url").toString
    operators.CorpusOps.writePslArtifact(spark, path,
      operators.CorpusOps.DefaultPslCatalog)
    val loaded = operators.CorpusOps.loadPslArtifact(spark, path)
    val got = operators.CorpusOps.urlExtractWith(spark, dir, loaded)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSeq
    // urlified() appends manufactured URLs per doc_id; the PLANTED hosts
    // must still bucket under their multi-level suffixes
    assert(got.find(_._1 == 1L).get._3.contains("example.com.au"))
    assert(got.find(_._1 == 2L).get._3.contains("user1.github.io"))
    assert(got.find(_._1 == 2L).get._3.contains("example.co.uk"))
    // under a BARE two-label catalog the same hosts mis-bucket — the
    // difference the PSL loader exists to remove
    val bare = operators.CorpusOps.urlExtractWith(spark, dir, Seq.empty)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSeq
    assert(bare.find(_._1 == 1L).get._2.contains("com.au"))
    assert(!bare.find(_._1 == 1L).get._2.contains("example.com.au"))
  }
}
