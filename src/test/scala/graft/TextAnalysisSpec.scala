package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the text-quality operators (the DuckDB
  * oracle pins cross-engine parity; these pin the absolute values). */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("qualityModelWeighted: an explicit table encoding the stand-in function scores identically; a different model diverges") {
    import spark.implicits._
    val dir = TestSpark.sfDir
    val docs = util.t(spark, dir, "documents").select("doc_id", "text")
    val standIn = operators.TextAnalysis.qualityModel(spark, dir).collect().toSeq

    // W[b] = b - 1000 IS the stand-in ((h mod 2001) - 1000) as a table —
    // the declared query and the external-weights path must be
    // row-identical when the table encodes the same function
    val w = (0 until 2001).map(i => i.toLong - 1000L)
    assert(operators.TextAnalysis.qualityModelWeighted(docs, w).collect().toSeq
      === standIn, "vector form diverged from the hash stand-in")

    // the (dim, w_milli) frame form — the shape a trained artifact lands
    // in — routes to the same scoring
    val wf = w.zipWithIndex.map { case (wi, i) => (i, wi) }.toDF("dim", "w_milli")
    assert(operators.TextAnalysis.qualityModelWeighted(docs, wf, 0L).collect().toSeq
      === standIn, "frame form diverged from the vector form")

    // the table is live, not decorative: negating every weight flips sums
    assert(operators.TextAnalysis.qualityModelWeighted(docs, w.map(-_))
      .collect().toSeq !== standIn, "a different model must change scores")

    // non-contiguous dims are refused, not silently misindexed
    intercept[IllegalArgumentException] {
      operators.TextAnalysis.qualityModelWeighted(docs,
        Seq((0, 5L), (2, 7L)).toDF("dim", "w_milli"), 0L)
    }
  }

  test("mixPlanFrom: a frame encoding the md5 coin equals the stand-in; a real table re-plans; unlisted sources drop") {
    import spark.implicits._
    val dir = TestSpark.sfDir
    val sources = util.t(spark, dir, "documents")
      .select("source").distinct().as[String].collect().sorted.toSeq
    assert(sources.size >= 2, "fixture needs ≥ 2 sources for a mix test")

    // the stand-in's own weights as a TABLE — plan and apply must be
    // row-identical (the qualityModelWeighted ≡ contract for the mix)
    def coinW(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 4 + 1
    }
    val coinTable = sources.map(s => (s, coinW(s))).toDF("source", "w")
    assert(operators.TextAnalysis.mixPlanFrom(spark, dir, coinTable)
        .collect().toSeq
      === operators.TextAnalysis.mixPlan(spark, dir).collect().toSeq,
      "coin-encoding frame diverged from the stand-in plan")
    assert(operators.TextAnalysis.mixPlanApplyFrom(spark, dir, coinTable)
        .collect().toSeq
      === operators.TextAnalysis.mixPlanApply(spark, dir).collect().toSeq,
      "coin-encoding frame diverged from the stand-in apply")

    // a REAL mixing table: equal weights → equal target shares, epochs =
    // tot / (nSources * n_tokens) — and it must differ from the stand-in
    // whenever the coin weights aren't all equal
    val flat = sources.map(s => (s, 1L)).toDF("source", "w")
    val plan = operators.TextAnalysis.mixPlanFrom(spark, dir, flat).collect()
    assert(plan.length === sources.size)
    val shares = plan.map(_.getDouble(4)).toSet // target_share, r4-rounded
    assert(shares.size === 1, s"equal weights must mean equal shares: $shares")
    if (sources.map(coinW).toSet.size > 1)
      assert(plan.toSeq !==
        operators.TextAnalysis.mixPlan(spark, dir).collect().toSeq,
        "a different mixing table must change the plan")

    // an unlisted source is OUT of the mix: no plan row, no applied docs
    val partial = sources.tail.map(s => (s, 2L)).toDF("source", "w")
    val pl2 = operators.TextAnalysis.mixPlanFrom(spark, dir, partial)
      .select("source").as[String].collect().toSeq
    assert(pl2 === sources.tail, "plan must cover exactly the listed sources")
    val applied = operators.TextAnalysis.mixPlanApplyFrom(spark, dir, partial)
      .select("source").distinct().as[String].collect().sorted.toSeq
    assert(!applied.contains(sources.head),
      "docs of an unlisted source must draw no copies")
  }

  test("q_repetition_ratio: Gopher 2-4-gram dup fractions and 1-4-gram top shares, hand-checked") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_rep").toString
    val docs = Seq(
      // "a b a b a": unigrams a×3 b×2; bigrams [a b, b a, a b, b a];
      // trigrams [a b a, b a b, a b a]; 4-grams [a b a b, b a b a]
      (1L, "a b a b a"),
      // all-distinct grams at every n it reaches; too short for 4-grams
      (2L, "u v w"),
      // degenerate repetition → top share 1.0 at every n
      (3L, "batch batch batch batch"),
      // single word: only n=1 defined, n=2..4 NULL
      (4L, "solo"))
      .map { case (id, tx) => (id, tx, "en", "src", tx.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = operators.TextAnalysis.repetitionRatio(spark, dir)
    assert(out.columns.toSeq === Seq("doc_id", "top_share_1", "dup_frac_2",
      "top_share_2", "dup_frac_3", "top_share_3", "dup_frac_4", "top_share_4"))
    val got = out.collect().map { r =>
      r.getLong(0) -> (1 to 7).map(i => if (r.isNullAt(i)) None else Some(r.getDouble(i)))
    }.toMap
    def row(vs: Option[Double]*) = vs.toIndexedSeq
    assert(got === Map(
      1L -> row(Some(0.6), Some(0.5), Some(0.5), Some(0.3333), Some(0.6667),
        Some(0.0), Some(0.5)),
      2L -> row(Some(0.3333), Some(0.0), Some(0.5), Some(0.0), Some(1.0),
        None, None),
      3L -> row(Some(1.0), Some(0.6667), Some(1.0), Some(0.5), Some(1.0),
        Some(0.0), Some(1.0)),
      4L -> row(Some(1.0), None, None, None, None, None, None)))
  }

  test("q_repetition_gopher: char-weighted top shares and interval-union dup coverage, hand-checked") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_repg").toString
    val docs = Seq(
      // 10× "x", dl = 19. top n-gram (n=2..4) is all-x with 11−n
      // occurrences of char length 2n−1: top2 = 9·3/19, top3 = 8·5/19,
      // top4 = 7·7/19 (per-occurrence counting CAN exceed 1.0 — the
      // documented reproduction convention). Every 5..9-gram repeats and
      // the occurrence intervals tile the whole doc → dup coverage 1.0;
      // the single 10-gram has no duplicate → explicit 0.0, not NULL.
      (1L, "x x x x x x x x x x"),
      // all-distinct: every top share is one occurrence's chars / dl
      // (dl = 11); 5- and 6-grams exist but nothing repeats → dup 0.0;
      // no 7..10-grams → NULL.
      (2L, "a b c d e f"))
      .map { case (id, tx) => (id, tx, "en", "src", tx.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = operators.TextAnalysis.repetitionGopher(spark, dir)
    assert(out.columns.toSeq === Seq("doc_id", "top_char_frac_2",
      "top_char_frac_3", "top_char_frac_4", "dup_char_frac_5",
      "dup_char_frac_6", "dup_char_frac_7", "dup_char_frac_8",
      "dup_char_frac_9", "dup_char_frac_10"))
    val got = out.collect().map { r =>
      r.getLong(0) -> (1 to 9).map(i => if (r.isNullAt(i)) None else Some(r.getDouble(i)))
    }.toMap
    def row(vs: Option[Double]*) = vs.toIndexedSeq
    assert(got === Map(
      1L -> row(Some(1.4211), Some(2.1053), Some(2.5789), Some(1.0),
        Some(1.0), Some(1.0), Some(1.0), Some(1.0), Some(0.0)),
      2L -> row(Some(0.2727), Some(0.4545), Some(0.6364), Some(0.0),
        Some(0.0), None, None, None, None)))
  }

  /** the window-and-explode Gopher chain the gopher_repetition kernel
    * replaced, verbatim — the parity reference (r14 convention: every
    * fused expression is pinned against the form it replaced) */
  private def legacyGopherOf(documents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.util.r4f
    val toks = split(col("text"), " ")
    val wp = Window.partitionBy("doc_id").orderBy("pos")
    val offs = documents
      .select(col("doc_id"), length(col("text")).as("dl"),
        posexplode(toks).as(Seq("pos", "tok")))
      .withColumn("cs", coalesce(sum(length(col("tok")) + 1)
        .over(wp.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("ce", col("cs") + length(col("tok")))
    val withLeads = (1 to 9).foldLeft(offs) { (df, j) =>
      df.withColumn(s"l$j", lead(col("tok"), j).over(wp))
        .withColumn(s"e${j + 1}", lead(col("ce"), j).over(wp))
    }
    val withGrams = (2 to 10).foldLeft(withLeads) { (df, n) =>
      val parts = Seq(col("tok")) ++ (1 until n).map(j => col(s"l$j"))
      df.withColumn(s"g$n",
        when(col(s"l${n - 1}").isNotNull, concat_ws(" ", parts: _*)))
    }
    val stacked = withGrams
      .select(col("doc_id"), col("dl"), col("pos"), col("cs"),
        explode(array((2 to 10).map(n =>
          struct(lit(n).as("n"), col(s"g$n").as("g"), col(s"e$n").as("ce"))): _*)).as("x"))
      .where(col("x.g").isNotNull)
      .select(col("doc_id"), col("dl"), col("pos"), col("cs"),
        col("x.n").as("n"), col("x.g").as("g"), col("x.ce").as("ce"))
    val top = stacked.where(col("n").between(2, 4))
      .groupBy("doc_id", "n", "g")
      .agg(count(lit(1)).as("cnt"), max(col("dl")).as("dl"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id", "n").orderBy(col("cnt").desc, col("g").asc)))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("n"),
        r4f(col("cnt") * length(col("g")) / col("dl")).as("frac"),
        lit("top").as("kind"))
    val dup = stacked.where(col("n").between(5, 10))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("doc_id", "n", "g")))
      .withColumn("pm", max(when(col("cnt") >= 2, col("ce"))).over(
        Window.partitionBy("doc_id", "n").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("add", when(col("cnt") >= 2, greatest(lit(0L),
        col("ce") - greatest(coalesce(col("pm"), lit(0L)), col("cs"))))
        .otherwise(lit(0L)))
      .groupBy("doc_id", "n")
      .agg(r4f(sum(col("add")) / max(col("dl"))).as("frac"))
      .withColumn("kind", lit("dup"))
      .select("doc_id", "n", "frac", "kind")
    def pick(kind: String, n: Int, name: String) =
      max(when(col("kind") === kind && col("n") === n, col("frac"))).as(name)
    val metrics = top.unionByName(dup).groupBy("doc_id").agg(
      pick("top", 2, "top_char_frac_2"), pick("top", 3, "top_char_frac_3"),
      pick("top", 4, "top_char_frac_4"),
      pick("dup", 5, "dup_char_frac_5"), pick("dup", 6, "dup_char_frac_6"),
      pick("dup", 7, "dup_char_frac_7"), pick("dup", 8, "dup_char_frac_8"),
      pick("dup", 9, "dup_char_frac_9"), pick("dup", 10, "dup_char_frac_10"))
    documents.select(col("doc_id"))
      .join(metrics, Seq("doc_id"), "left")
      .orderBy("doc_id")
  }

  /** the explode-over-4·len repetition-ratio chain the repetition_ratio
    * kernel replaced, verbatim — the parity reference */
  private def legacyRepetitionRatioOf(documents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.util.r4f
    import org.apache.spark.sql.types.DoubleType
    val toks = split(col("text"), " ")
    val perN = documents
      .select(col("doc_id"), toks.as("tk"))
      .where(size(col("tk")) >= 1)
      .select(col("doc_id"), col("tk"),
        explode(expr("sequence(0, 4 * size(tk) - 1)")).as("i"))
      .where(expr("i div 4 + i % 4 + 1 <= size(tk)"))
      .select(col("doc_id"), expr("i % 4 + 1").as("n"),
        expr("concat_ws(' ', slice(tk, i div 4 + 1, i % 4 + 1))").as("g"))
      .groupBy("doc_id", "n", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id", "n")
      .agg(sum(col("cnt")).cast(DoubleType).as("total"),
        count(lit(1)).cast(DoubleType).as("dist"),
        max(col("cnt")).cast(DoubleType).as("topc"))
    def dupFrac(n: Int) =
      max(when(col("n") === n, r4f(lit(1d) - col("dist") / col("total"))))
        .as(s"dup_frac_$n")
    def topShare(n: Int) =
      max(when(col("n") === n, r4f(col("topc") / col("total"))))
        .as(s"top_share_$n")
    perN.groupBy("doc_id")
      .agg(topShare(1), dupFrac(2), topShare(2), dupFrac(3), topShare(3),
        dupFrac(4), topShare(4))
      .orderBy("doc_id")
  }

  test("repetition_ratio kernel: exact parity with the explode chain it replaced") {
    val real = graft.util.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    import spark.implicits._
    val planted = Seq(
      (910001L, "a b a b a b a b"),
      (910002L, "κόσμος λόγος κόσμος λόγος κόσμος"),
      (910003L, ""),
      (910004L, "loner"),
      (910005L, "x  x  x  x"))
      .toDF("doc_id", "text")
    val docs = real.unionByName(planted)
    val kernel = operators.TextAnalysis.repetitionRatioOf(docs).collect()
    val legacy = legacyRepetitionRatioOf(docs).collect()
    assert(kernel.length === legacy.length)
    kernel.zip(legacy).foreach { case (k, l) =>
      assert(k === l, s"kernel row $k != legacy row $l")
    }
  }

  test("gopher_repetition kernel: exact parity with the window-and-explode chain it replaced") {
    // real corpus (every doc at sf0.001) + adversarial shapes: repeated
    // blocks, unicode, empty text, single token, pure separator runs
    val real = graft.util.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    import spark.implicits._
    val planted = Seq(
      (900001L, "a b a b a b a b a b a b"),
      (900002L, "κόσμος λόγος κόσμος λόγος κόσμος λόγος κόσμος"),
      (900003L, ""),
      (900004L, "loner"),
      (900005L, "x  x  x  x  x  x"), // empty tokens between double spaces
      (900006L, ("p q r s t u v w " * 4).trim))
      .toDF("doc_id", "text")
    val docs = real.unionByName(planted)
    val kernel = operators.TextAnalysis.repetitionGopherOf(docs).collect()
    val legacy = legacyGopherOf(docs).collect()
    assert(kernel.length === legacy.length)
    kernel.zip(legacy).foreach { case (k, l) =>
      assert(k === l, s"kernel row $k != legacy row $l")
    }
  }

  test("q_pii_scrub: planted email/IP/phone are redacted and counted; clean text untouched") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pii").toString
    val docs = Seq(
      (1L, "contact alice.b+spam@example.co.uk or bob@host.org today"),
      (2L, "server 10.0.255.7 responded, backup at 192.168.1.1 now"),
      (3L, "call 555-867-5309 re: invoice"),
      (4L, "no pii here, just words and 42 numbers"),
      // boundary: version string 1.2.3 must NOT match the IPv4 pattern
      (5L, "upgraded to spark 1.2.3 yesterday"))
      .map { case (id, tx) => (id, tx, "en", "src", tx.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = operators.TextAnalysis.piiScrub(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(got(1L) === ((2L, 0L, 0L, "contact <EMAIL> or <EMAIL> today")))
    assert(got(2L) === ((0L, 2L, 0L, "server <IP> responded, backup at <IP> now")))
    assert(got(3L) === ((0L, 0L, 1L, "call <PHONE> re: invoice")))
    assert(got(4L) === ((0L, 0L, 0L, "no pii here, just words and 42 numbers")))
    assert(got(5L) === ((0L, 0L, 0L, "upgraded to spark 1.2.3 yesterday")))
  }

  test("q_sample_per_source: over-cap source capped, under-cap source kept whole") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cap").toString
    val cap = operators.TextAnalysis.SampleCap
    // source "big": 3×cap docs; source "small": 5 docs
    val docs = ((1 to cap * 3).map(i => (i.toLong, s"doc $i words", "en", "big")) ++
      (101 to 105).map(i => (i.toLong, s"doc $i words", "en", "small")))
      .map { case (id, tx, l, src) => (id, tx, l, src, tx.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = operators.TextAnalysis.samplePerSource(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySrc = rows.groupBy(_._1)
    assert(bySrc("big").length === cap, "over-cap source must keep exactly cap docs")
    assert(bySrc("small").length === 5, "under-cap source must keep all docs")
    assert(bySrc("small").map(_._3).toSet === (101L to 105L).toSet)
    // ranks are contiguous from 1 and the sample is duplicate-free
    bySrc.foreach { case (src, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1L to rs.length).toSeq, s"$src ranks")
      assert(rs.map(_._3).distinct.length === rs.length, s"$src dup docs")
    }
  }
}
