package graft

import graft.functions.{TextExpressions, VectorExpressions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** native CosineSimilarity expression: bit-parity with the higher-order
  * formulation and proof it stays inside whole-stage codegen */
class VectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cosine_sim matches the zip_with+aggregate formulation bit-for-bit") {
    VectorExpressions.register(spark)
    val e = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    val probe = e.where(col("vec_id") === 0).select(col("embedding").as("pe"))
    val both = e.crossJoin(broadcast(probe)).select(
      col("vec_id"),
      VectorExpressions.cosineSim(col("embedding"), col("pe")).as("native"),
      (expr("aggregate(zip_with(embedding, pe, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (a, v) -> a + v)")
        / (sqrt(expr("aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (a, v) -> a + v)"))
          * sqrt(expr("aggregate(zip_with(pe, pe, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (a, v) -> a + v)"))))
        .as("hof"))
    val rows = both.collect()
    assert(rows.length === e.count())
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1))
        === java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: native ${r.getDouble(1)} != hof ${r.getDouble(2)}")
    }
  }

  test("cosine_sim runs inside whole-stage codegen (no fallback)") {
    VectorExpressions.register(spark)
    val e = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    val probe = e.where(col("vec_id") === 0).select(col("embedding").as("pe"))
    val df = e.crossJoin(broadcast(probe))
      .select(VectorExpressions.cosineSim(col("embedding"), col("pe")).as("c"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(p).isDefined,
      s"projection not codegen'd:\n$p")
  }

  test("sign_lsh_bucket matches the nested-HOF xxhash64 formulation exactly") {
    VectorExpressions.register(spark)
    val planes = operators.Similarity.LshPlanes
    val e = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    val both = e.select(
      col("vec_id"),
      VectorExpressions.signLshBucket(col("embedding"), planes).as("native"),
      expr(
        s"""aggregate(sequence(0, ${planes - 1}), 0, (acc, j) ->
           |  acc + shiftleft(CASE WHEN
           |    aggregate(sequence(0, 63), 0D, (a, d) ->
           |      a + CAST(element_at(embedding, d + 1) AS DOUBLE) *
           |          IF((xxhash64(j, d) & 1) = 1, 1.0D, -1.0D)) >= 0D
           |  THEN 1 ELSE 0 END, j))""".stripMargin).as("hof"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) === r.getInt(2),
        s"vec ${r.getLong(0)}: native bucket ${r.getInt(1)} != hof ${r.getInt(2)}")
    }
    val n = both.select(countDistinct(col("native"))).collect().head.getLong(0)
    assert(n > 1, "degenerate bucketing: every vector landed in one bucket")
  }

  test("sign_lsh_bucket runs inside whole-stage codegen (no fallback)") {
    VectorExpressions.register(spark)
    val e = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    val df = e.select(VectorExpressions.signLshBucket(col("embedding"),
      operators.Similarity.LshPlanes).as("b"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(p).isDefined,
      s"projection not codegen'd:\n$p")
  }

  test("ivf_assign matches the crossJoin+window argmax formulation exactly") {
    VectorExpressions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val e = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    val book = e.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(16).select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val bookArr = book.agg(collect_list(struct(col("cid"), col("ce"))).as("cents"))
    val native = e.crossJoin(broadcast(bookArr))
      .select(col("vec_id"),
        VectorExpressions.ivfAssign(col("embedding"), col("cents")).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaWindow = e.crossJoin(broadcast(book))
      .select(col("vec_id"), col("cid"),
        util.r4f(VectorExpressions.cosineSim(col("embedding"), col("ce"))).as("ac"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("ac").desc, col("cid").asc)))
      .where(col("rn") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native.nonEmpty && native === viaWindow)
    assert(native.values.toSet.size > 1, "degenerate codebook: one list got everything")
  }

  test("ivf_assign runs inside whole-stage codegen (no fallback)") {
    VectorExpressions.register(spark)
    val e = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    val book = e.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(16).select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .agg(collect_list(struct(col("cid"), col("ce"))).as("cents"))
    val df = e.crossJoin(broadcast(book))
      .select(VectorExpressions.ivfAssign(col("embedding"), col("cents")).as("cid"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(p).isDefined,
      s"projection not codegen'd:\n$p")
  }

  test("word_ngrams matches the HOF array_distinct/transform formulation exactly") {
    TextExpressions.register(spark)
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val both = docs.select(
      col("doc_id"),
      TextExpressions.wordNgrams(col("toks"), 3).as("native"),
      when(size(col("toks")) >= 3,
        expr("array_distinct(transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"))
        .otherwise(array(concat_ws(" ", col("toks")))).as("hof"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2), s"doc ${r.get(0)}")
    }
    // short-doc fallback: fewer tokens than n → one gram of all tokens
    import spark.implicits._
    val short = Seq((1L, Seq("a", "b")), (2L, Seq.empty[String]))
      .toDF("id", "toks")
      .select(TextExpressions.wordNgrams(col("toks"), 3).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(short(0) === Seq("a b") && short(1) === Seq(""))
  }

  test("word_ngrams runs inside whole-stage codegen (no fallback)") {
    TextExpressions.register(spark)
    val df = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select(TextExpressions.wordNgrams(split(col("text"), " "), 3).as("g"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(p).isDefined,
      s"projection not codegen'd:\n$p")
  }

  test("unicode_normalize: NFC composes, NFD decomposes, matches java.text.Normalizer") {
    TextExpressions.register(spark)
    import spark.implicits._
    val decomposed = "cafe\u0301 a\u0301 plain"    // combining acutes
    val composed = java.text.Normalizer.normalize(
      decomposed, java.text.Normalizer.Form.NFC)
    assert(composed.length < decomposed.length, "fixture must actually compose")
    val out = Seq((1L, decomposed), (2L, "pure ascii"), (3L, composed))
      .toDF("id", "t")
      .select(col("id"),
        TextExpressions.unicodeNormalize(col("t"), "NFC").as("nfc"),
        TextExpressions.unicodeNormalize(col("t"), "NFD").as("nfd"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(out(1L) === ((composed, decomposed)))
    assert(out(3L) === ((composed, decomposed)), "NFD re-decomposes the composed form")
    assert(out(2L) === (("pure ascii", "pure ascii")), "ASCII is a fixed point")
    // idempotence through the expression itself
    val twice = Seq(decomposed).toDF("t")
      .select(TextExpressions.unicodeNormalize(
        TextExpressions.unicodeNormalize(col("t"), "NFC"), "NFC").as("n"))
      .collect().head.getString(0)
    assert(twice === composed)
    // null propagates
    val n = Seq(Option.empty[String]).toDF("t")
      .select(TextExpressions.unicodeNormalize(col("t"), "NFC").as("n"))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("unicode_normalize runs inside whole-stage codegen (no fallback)") {
    TextExpressions.register(spark)
    val df = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select(TextExpressions.unicodeNormalize(col("text"), "NFKC").as("n"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(p).isDefined,
      s"projection not codegen'd:\n$p")
  }

  test("char_gram_md5 matches the explode/substring/md5 chain exactly") {
    TextExpressions.register(spark)
    val L = operators.Dedup.SubstrL
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .where(length(col("text")) >= L).limit(200)
    val native = docs.select(col("doc_id"),
        posexplode(TextExpressions.charGramMd5(col("text"), L)).as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), hex(col("h")).as("h"))
    val hof = docs.select(col("doc_id"), col("text"),
        explode(expr(s"sequence(1, length(text) - ${L - 1})")).as("p"))
      .select(col("doc_id"), col("p").cast("long").as("pos"),
        upper(md5(expr(s"substring(text, p, $L)"))).as("h"))
    assert(native.count() === hof.count())
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty,
      "gram hash streams differ")
  }

  test("winnow_grams = winnow_positions + full md5 at each selected position") {
    TextExpressions.register(spark)
    val L = operators.Dedup.SubstrL
    val W = operators.Dedup.WinnowW
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .where(length(col("text")) >= L).limit(200)
    val fused = docs.select(col("doc_id"),
        explode(TextExpressions.winnowGrams(col("text"), L, W)).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), hex(col("g.h")).as("h"))
    val composed = docs.select(col("doc_id"), col("text"),
        explode(TextExpressions.winnowPositions(col("text"), L, W)).as("pos"))
      .select(col("doc_id"), col("pos"),
        upper(md5(expr(s"substring(text, cast(pos AS INT), $L)"))).as("h"))
    assert(fused.count() === composed.count())
    assert(fused.exceptAll(composed).isEmpty && composed.exceptAll(fused).isEmpty,
      "fused winnow grams differ from the composed form")
  }

  test("simhash_sig_md5 matches the explode/groupBy bit-vote formulation exactly") {
    TextExpressions.register(spark)
    functions.VectorExpressions.register(spark)
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select(col("doc_id"), col("text")).limit(300)
    val native = docs.select(col("doc_id"),
      functions.VectorExpressions.simhashSigMd5(split(col("text"), " ")).as("sig"))
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tk"))
      .withColumn("h", expr(
        "cast(conv(substring(md5(tk), 1, 15), 16, 10) AS BIGINT)"))
    val bitSums = (0 until 60).map(b =>
      sum(shiftright(col("h"), b) % 2 * 2 - 1).as(s"s$b"))
    val agg = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .withColumn("sig", (0 until 60).map(b =>
        when(col(s"s$b") >= 0, lit(1L)).otherwise(lit(0L)) * (1L << b))
        .reduce(_ + _))
      .select("doc_id", "sig")
    val diff = native.as("n").join(agg.as("a"), "doc_id")
      .where(col("n.sig") =!= col("a.sig"))
    assert(native.count() === agg.count())
    assert(diff.isEmpty, s"signatures differ: ${diff.take(3).toSeq}")
  }

  test("word_ngram_md5p64 matches the positional HOF transform exactly") {
    TextExpressions.register(spark)
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .limit(300)
    Seq(1, 3, 5).foreach { n =>
      val idx = (0 until n).map(k => s"tk[i+$k]").mkString(", ")
      val diff = docs.where(size(col("tk")) >= n).select(
          TextExpressions.wordNgramMd5p64(col("tk"), n, 15).as("native"),
          expr(s"transform(sequence(0, size(tk) - $n), i -> " +
            s"cast(conv(substring(md5(concat_ws(' ', $idx)), 1, 15), 16, 10) AS BIGINT))").as("hof"))
        .where(col("native") =!= col("hof"))
      assert(diff.isEmpty, s"n=$n mismatch: ${diff.take(2).toSeq}")
    }
    // fewer than n tokens → empty array (HOF would error on the negative sequence)
    import spark.implicits._
    val tiny = Seq(Seq("a", "b")).toDF("tk")
      .select(TextExpressions.wordNgramMd5p64(col("tk"), 5, 15).as("g"))
      .collect().head.getSeq[Long](0)
    assert(tiny === Seq.empty)
  }

  test("md5_prefix64 matches the conv/substring/md5 form exactly") {
    TextExpressions.register(spark)
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select(col("text")).limit(500)
    Seq(8, 10, 13, 15).foreach { n =>
      val diff = docs.select(
          TextExpressions.md5Prefix64(col("text"), n).as("native"),
          expr(s"cast(conv(substring(md5(text), 1, $n), 16, 10) AS BIGINT)").as("hof"))
        .where(col("native") =!= col("hof") ||
          col("native").isNull =!= col("hof").isNull)
      assert(diff.isEmpty, s"hexLen=$n mismatch: ${diff.take(3).toSeq}")
    }
    // null propagates
    import spark.implicits._
    val r = Seq(Option.empty[String]).toDF("t")
      .select(TextExpressions.md5Prefix64(col("t"), 15)).collect().head
    assert(r.isNullAt(0))
  }

  test("winnow_positions matches the HOF transform/array_min formulation exactly") {
    TextExpressions.register(spark)
    val L = operators.Dedup.SubstrL
    val W = operators.Dedup.WinnowW
    val P = 1L << 20
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .where(length(col("text")) >= L)
    val both = docs.select(
      col("doc_id"),
      TextExpressions.winnowPositions(col("text"), L, W).as("native"),
      expr(
        s"""transform(array_distinct(transform(
           |    sequence(1, greatest((length(text) - ${L - 1}) - $W + 1, 1)), i ->
           |    array_min(slice(transform(sequence(1, length(text) - ${L - 1}), p ->
           |      CAST(conv(substring(md5(substring(text, p, $L)), 1, 10), 16, 10) AS BIGINT)
           |        * ${P}L + (${P - 1}L - p)), i, $W)))),
           |  wm -> ${P - 1}L - (wm % ${P}L))""".stripMargin).as("hof"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"doc ${r.get(0)}")
    }
    // sub-w-gram doc: one whole-array window, one selected position
    import spark.implicits._
    val tiny = Seq("x" * L).toDF("text")
      .select(TextExpressions.winnowPositions(col("text"), L, W).as("p"))
      .collect().head.getSeq[Long](0)
    assert(tiny === Seq(1L))
  }

  test("winnow_positions runs inside whole-stage codegen (no fallback)") {
    TextExpressions.register(spark)
    val df = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .where(length(col("text")) >= 30)
      .select(TextExpressions.winnowPositions(col("text"), 30, 5).as("p"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(p).isDefined,
      s"projection not codegen'd:\n$p")
  }

  test("word_ngrams property: parity with the HOF form on generated token arrays") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    TextExpressions.register(spark)
    import spark.implicits._
    val tokGen = Gen.oneOf("a", "bb", "", "ünïcode", "x y", "the", "0", "longertoken")
    val arrGen = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, tokGen))
    val cases = (0 until 300).flatMap(i => arrGen.apply(Gen.Parameters.default, Seed(7L + i)))
    val df = cases.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }.toDF("id", "toks")
    val rows = df.select(col("id"),
      TextExpressions.wordNgrams(col("toks"), 3).as("native"),
      when(size(col("toks")) >= 3,
        expr("array_distinct(transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"))
        .otherwise(array(concat_ws(" ", col("toks")))).as("hof"))
      .collect()
    assert(rows.length === cases.length)
    rows.foreach(r => assert(r.getSeq[String](1) === r.getSeq[String](2), s"case ${r.getLong(0)}"))
  }

  test("ivf_assign property: parity with the window argmax on generated vectors") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    VectorExpressions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // zero-norm vectors are out of the expression's contract (NaN cosine:
    // Spark floor, DuckDB floor, and IEEE compare disagree on NaN order)
    val vecGen = Gen.listOfN(8, Gen.choose(-1000, 1000).map(_ / 250.0f))
      .suchThat(v => v.exists(_ != 0f))
    val vecs = (0 until 200).flatMap(i => vecGen.apply(Gen.Parameters.default, Seed(11L + i)))
    val e = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }.toDF("vec_id", "embedding")
    val book = e.limit(8).select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val bookArr = book.agg(collect_list(struct(col("cid"), col("ce"))).as("cents"))
    val native = e.crossJoin(broadcast(bookArr))
      .select(col("vec_id"),
        VectorExpressions.ivfAssign(col("embedding"), col("cents")).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaWindow = e.crossJoin(broadcast(book))
      .select(col("vec_id"), col("cid"),
        util.r4f(VectorExpressions.cosineSim(col("embedding"), col("ce"))).as("ac"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("ac").desc, col("cid").asc)))
      .where(col("rn") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native.size === vecs.length)
    assert(native === viaWindow)
  }

  test("cosine_sim is null-safe and self-similarity is 1.0") {
    VectorExpressions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Some(Array(1f, 2f, 3f)), Some(Array(1f, 2f, 3f))),
      (None, Some(Array(1f, 2f, 3f)))).toDF("a", "b")
      .select(VectorExpressions.cosineSim(col("a"), col("b")).as("c"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
    assert(rows(1).isNullAt(0))
  }
}
