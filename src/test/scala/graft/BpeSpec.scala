package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** bpeTrain: hand-computed merge sequences on fixture corpora (the
  * oracle-free component's pinned spec), plus round-1 ≡ the declared
  * q_bpe_pairs argmax on real data. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.toDF("text")
  }

  test("hand-computed merge sequence: argmax, tie-break, and phrase remerge") {
    // corpus: "a b c a b" + "a b x"
    //   round 1 pairs: (a,b):3  (b,c):1 (c,a):1 (b,x):1 → merge (a,b) cnt 3
    //   after greedy apply: ["a b","c","a b"], ["a b","x"]
    //   round 2 pairs: ("a b",c):1 (c,"a b"):1 ("a b",x):1 — three-way tie
    //     → (cnt DESC, t1 ASC, t2 ASC) picks ("a b","c")
    val m = TextAnalysis.bpeTrain(docs("a b c a b", "a b x"), 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq === Seq((1, "a", "b", 3L), (2, "a b", "c", 1L)))
  }

  test("greedy non-overlap: 'a a a a' yields two merged pairs, then one") {
    // round 1: (a,a):3 → greedy apply merges positions (0,1) and (2,3)
    //   → ["a a","a a"]; round 2: ("a a","a a"):1
    val m = TextAnalysis.bpeTrain(docs("a a a a"), 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq === Seq((1, "a", "a", 3L), (2, "a a", "a a", 1L)))
  }

  test("runs dry: fewer pairs than requested merges terminates early") {
    // single-token docs have no adjacent pairs at all
    val m = TextAnalysis.bpeTrain(docs("solo", "tokens"), 5)
    assert(m.collect().isEmpty)
    // one pair exhausts after merging: 5 merges requested, 1 possible
    val m2 = TextAnalysis.bpeTrain(docs("x y"), 5)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(m2.toSeq === Seq(("x", "y")))
  }

  test("bpeEncode: hand-computed symbol stream under a trained table") {
    import spark.implicits._
    val d = Seq((1L, "a b c a b"), (2L, "a b x")).toDF("doc_id", "text")
    // merges from the hand-computed training above: (a,b) then ("a b",c)
    val enc = TextAnalysis.bpeEncode(d, Seq(("a", "b"), ("a b", "c")))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[String](1), r.getLong(2)))).toMap
    assert(enc(1L) === ((Seq("a b c", "a b"), 5L)))
    assert(enc(2L) === ((Seq("a b", "x"), 3L)))
  }

  test("encoding the training corpus reproduces training's final symbol stream") {
    import spark.implicits._
    val texts = Seq("a b c a b", "a b x", "c a b c a b", "x y x y x y")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrainMerges(d.select("text"), 4)
      .map(m => (m._2, m._3))
    // replay training's per-round greedy apply directly on the driver
    val expected = texts.map { t =>
      merges.foldLeft(t.split(" ").toSeq) { case (syms, (a, b)) =>
        TextAnalysis.applyMerge(syms, a, b, a + " " + b)
      }
    }
    val enc = TextAnalysis.bpeEncode(d, merges).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    texts.indices.foreach { i =>
      assert(enc(i.toLong) === expected(i), s"doc $i diverged from training")
    }
  }

  test("BPE release artifact: train → persist → load → encode ≡ in-session; tamper and contract drift refused") {
    import spark.implicits._
    val dir = TestSpark.sfDir
    val corpus = graft.util.t(spark, dir, "documents").select("doc_id", "text")
    val merges = TextAnalysis.bpeTrainMerges(corpus.select("text"), 8)
      .sortBy(_._1).map(m => (m._2, m._3))
    val path = java.nio.file.Files.createTempDirectory("graft_bpe_art").toString

    TextAnalysis.writeBpeArtifact(spark, path, merges)
    assert(TextAnalysis.loadBpeArtifact(spark, path) === merges,
      "merge table did not round-trip")
    // fleet-side replay: encode under the loaded artifact must be
    // row-identical to the in-session encode
    val direct = TextAnalysis.bpeEncode(corpus, merges)
      .orderBy("doc_id").collect().toSeq
    val viaArtifact = TextAnalysis.bpeEncodeFrom(spark, corpus, path)
      .orderBy("doc_id").collect().toSeq
    assert(viaArtifact === direct, "artifact replay diverged from in-session encode")

    // integrity: any mutation of the merge table flips the manifest digest
    spark.read.parquet(s"$path/merges")
      .withColumn("t2", concat(col("t2"), lit("x")))
      .write.mode("overwrite").parquet(s"$path/merges_tampered")
    val fs = new java.io.File(s"$path/merges_tampered").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val victim = new java.io.File(s"$path/merges").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    java.nio.file.Files.copy(fs.head.toPath, victim.head.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // drop the local-FS CRC sidecar so the byte swap reaches the
    // MANIFEST digest check (an attacker rewrites both; Hadoop's
    // transport checksum is not the integrity gate under test)
    new java.io.File(s"$path/merges/.${victim.head.getName}.crc").delete()
    intercept[IllegalArgumentException] {
      TextAnalysis.loadBpeArtifact(spark, path)
    }

    // contract drift: a rewritten-clean artifact under a foreign
    // tokenizer id is refused even with a valid manifest
    TextAnalysis.writeBpeArtifact(spark, path, merges)
    Seq(("version", "1"), ("tokenizer", "cased_bytes"), ("n_merges", "8"))
      .toDF("key", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    intercept[IllegalArgumentException] {
      TextAnalysis.loadBpeArtifact(spark, path)
    }
  }

  test("q_bpe_encode: flatten-reconstruction and compression bounds on real data") {
    val dir = "/root/testdata/sf0.001"
    val merges = TextAnalysis.ensureBpeMerges(spark, dir)
    assert(merges.nonEmpty, "real corpus must train a non-empty merge table")
    val enc = TextAnalysis.bpeEncode(
      util.t(spark, dir, "documents").select("doc_id", "text"), merges)
      .collect().map(r => (r.getLong(0), r.getSeq[String](1), r.getLong(2)))
    assert(enc.nonEmpty)
    val texts = util.t(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    enc.foreach { case (id, syms, nToks) =>
      // splitting every symbol back on spaces reconstructs the original
      // lowercased token stream — no token is lost or reordered
      assert(syms.flatMap(_.split(" ", -1)) === texts(id).toLowerCase.split(" ", -1).toSeq,
        s"doc $id does not reconstruct")
      assert(syms.length <= nToks, s"doc $id grew under encoding")
    }
    assert(enc.exists { case (_, syms, nToks) => syms.length < nToks },
      "no doc compressed at all — the merge table did nothing")
    // declared form agrees with the raw encode
    val q = operators.TextAnalysis.bpeEncodeQ(spark, dir).collect()
    assert(q.map(_.getLong(0)).toSeq === q.map(_.getLong(0)).toSeq.sorted)
    q.foreach { r =>
      val (id, nToks, nSyms) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val direct = enc.find(_._1 == id).get
      assert(nSyms === direct._2.length.toLong && nToks === direct._3)
    }
  }

  test("incremental trainer ≡ driver-side full-recount reference on randomized corpora") {
    // the distributed trainer maintains its bigram counts INCREMENTALLY
    // (bpe_pair_deltas); this re-derives every round's counts from
    // scratch on the driver with the same universe (empty-token pairs
    // excluded) and the same (cnt DESC, t1, t2) argmax — full merge
    // sequences must agree, including counts
    def referenceTrain(texts: Seq[String], nMerges: Int): Seq[(Int, String, String, Long)] = {
      var corpus = texts.map(_.toLowerCase.split(" ", -1).toSeq)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      var r = 1
      var dry = false
      while (r <= nMerges && !dry) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        corpus.foreach { toks =>
          toks.zip(toks.drop(1)).foreach { case p @ (t1, t2) =>
            if (t1.nonEmpty && t2.nonEmpty) counts(p) = counts.getOrElse(p, 0L) + 1L
          }
        }
        if (counts.isEmpty) dry = true
        else {
          val ((a, b), n) = counts.toSeq.minBy { case ((t1, t2), c) => (-c, t1, t2) }
          out += ((r, a, b, n))
          corpus = corpus.map(t => TextAnalysis.applyMerge(t, a, b, a + " " + b))
        }
        r += 1
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("a", "b", "c")
    (1 to 6).foreach { trial =>
      val texts = (0 until 8).map { _ =>
        (0 until rnd.nextInt(9)).map { _ =>
          // occasional double space ⇒ empty token, exercising the
          // excluded-pair universe
          if (rnd.nextInt(12) == 0) "" else vocab(rnd.nextInt(vocab.size))
        }.mkString(" ")
      }
      val got = TextAnalysis.bpeTrainMerges(docs(texts: _*), 4)
      assert(got === referenceTrain(texts, 4),
        s"trial $trial diverged on corpus ${texts.mkString("|")}")
    }
  }

  test("round-1 merge equals the declared q_bpe_pairs argmax on real data") {
    val dir = "/root/testdata/sf0.001"
    val top = TextAnalysis.bpePairs(spark, dir).collect().head
    val m = TextAnalysis.bpeTrain(spark, dir, 1).collect().head
    assert((m.getString(1), m.getString(2), m.getLong(3))
      === (top.getString(0), top.getString(1), top.getLong(2)))
  }
}
