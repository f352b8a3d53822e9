package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Resolve

/** Entity resolution / fuzzy join: the deletion-neighborhood blocking
  * must be LOSSLESS for the dist ≤ 1 predicate (the whole point — a
  * blocked join that silently drops matches is worse than a slow one),
  * and the blocked operators must equal their brute-force cross-join
  * forms exactly. */
class ResolveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir
  import spark.implicits._

  /** random dist ≤ 1 pairs always share a deletion variant (SymSpell
    * property) — exercised through the PRODUCTION Column, not a model */
  test("deletion neighborhoods of any dist<=1 pair intersect") {
    val rnd = new scala.util.Random(42)
    val alpha = "ab01"
    def randStr(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val pairs = (1 to 300).map { _ =>
      val s = randStr(3 + rnd.nextInt(10))
      val i = rnd.nextInt(s.length)
      val t = rnd.nextInt(3) match {
        case 0 => s.updated(i, alpha(rnd.nextInt(alpha.length)))          // substitution
        case 1 => s.substring(0, i) + alpha(rnd.nextInt(alpha.length)) + s.substring(i) // insertion
        case _ => s.substring(0, i) + s.substring(i + 1)                   // deletion
      }
      (s, t)
    }
    val df = pairs.toDF("s", "t").select(
      col("s"), col("t"),
      levenshtein(col("s"), col("t")).as("d"),
      arrays_overlap(Resolve.delNeighborhood(col("s")),
        Resolve.delNeighborhood(col("t"))).as("share"))
    val missed = df.where(col("d") <= 1 && !col("share")).count()
    assert(missed === 0L, "deletion blocking dropped a dist<=1 pair")
    // sanity: the generator actually produced dist<=1 pairs
    assert(df.where(col("d") <= 1).count() >= 250L)
  }

  test("depth-2 deletion neighborhoods of any dist<=2 pair intersect") {
    val rnd = new scala.util.Random(7)
    val alpha = "ab01"
    def randStr(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    def edit(s: String): String = {
      val i = rnd.nextInt(s.length)
      rnd.nextInt(3) match {
        case 0 => s.updated(i, alpha(rnd.nextInt(alpha.length)))
        case 1 => s.substring(0, i) + alpha(rnd.nextInt(alpha.length)) + s.substring(i)
        case _ if s.length > 1 => s.substring(0, i) + s.substring(i + 1)
        case _ => s
      }
    }
    val pairs = (1 to 400).map { _ =>
      val s = randStr(4 + rnd.nextInt(10)); (s, edit(edit(s)))
    }
    val df = pairs.toDF("s", "t").select(
      levenshtein(col("s"), col("t")).as("d"),
      arrays_overlap(Resolve.delNeighborhood2(col("s")),
        Resolve.delNeighborhood2(col("t"))).as("share"))
    assert(df.where(col("d") <= 2 && !col("share")).count() === 0L,
      "depth-2 deletion blocking dropped a dist<=2 pair")
    assert(df.where(col("d") === 2).count() >= 150L, "generator sanity")
  }

  /** the tail-window truncation dial must stay lossless: random 2-edit
    * pairs still collide when only the LAST 4 chars feed the depth-2
    * neighborhoods — the SymSpell window argument, empirically pinned
    * through the production Column */
  test("windowed depth-2 neighborhoods of any dist<=2 pair intersect") {
    val rnd = new scala.util.Random(11)
    val alpha = "ab01"
    def randStr(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    def edit(s: String): String = {
      val i = rnd.nextInt(s.length)
      rnd.nextInt(3) match {
        case 0 => s.updated(i, alpha(rnd.nextInt(alpha.length)))
        case 1 => s.substring(0, i) + alpha(rnd.nextInt(alpha.length)) + s.substring(i)
        case _ if s.length > 1 => s.substring(0, i) + s.substring(i + 1)
        case _ => s
      }
    }
    val pairs = (1 to 400).map { _ =>
      val s = randStr(4 + rnd.nextInt(10)); (s, edit(edit(s)))
    }
    val df = pairs.toDF("s", "t").select(
      levenshtein(col("s"), col("t")).as("d"),
      arrays_overlap(Resolve.delNeighborhood2Window(col("s"), 4),
        Resolve.delNeighborhood2Window(col("t"), 4)).as("share"))
    assert(df.where(col("d") <= 2 && !col("share")).count() === 0L,
      "window-4 depth-2 deletion blocking dropped a dist<=2 pair")
    assert(df.where(col("d") === 2).count() >= 150L, "generator sanity")
  }

  test("q_join_fuzzy2 equals the brute-force cross join at dist<=2") {
    val blocked = operators.Resolve.joinFuzzy2(spark, dir)
    val a = util.t(spark, dir, "customer")
      .select(regexp_extract(col("c_name"), "[0-9]+$", 0).as("name_a")).distinct()
    val b = util.t(spark, dir, "supplier")
      .select(regexp_extract(col("s_name"), "[0-9]+$", 0).as("name_b")).distinct()
    val brute = a.crossJoin(b)
      .where(levenshtein(col("name_a"), col("name_b")) <= 2)
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
    assert(blocked.where(col("dist") === 2).count() > 0L)
    assert(blocked.exceptAll(brute).count() === 0L)
    assert(brute.exceptAll(blocked).count() === 0L)
  }

  test("q_join_fuzzy equals the brute-force cross join") {
    val blocked = operators.Resolve.joinFuzzy(spark, dir)
    val a = util.t(spark, dir, "customer")
      .select(regexp_extract(col("c_name"), "[0-9]+$", 0).as("name_a")).distinct()
    val b = util.t(spark, dir, "supplier")
      .select(regexp_extract(col("s_name"), "[0-9]+$", 0).as("name_b")).distinct()
    val brute = a.crossJoin(b)
      .where(levenshtein(col("name_a"), col("name_b")) <= 1)
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
    assert(blocked.count() > 0L)
    assert(blocked.exceptAll(brute).count() === 0L)
    assert(brute.exceptAll(blocked).count() === 0L)
  }

  test("q_entity_resolve_clusters equals union-find over brute-force edges") {
    val labels = operators.Resolve.entityResolveClusters(spark, dir)
      .as[(Long, Long)].collect().toMap
    // brute-force edge set: same nation, lev<=1, score>=threshold
    val c = util.t(spark, dir, "customer")
    val edges = c.as("a").join(c.as("b"),
        col("a.c_nationkey") === col("b.c_nationkey")
          && col("a.c_custkey") < col("b.c_custkey"))
      .where(levenshtein(col("a.c_name"), col("b.c_name")) <= 1)
      .select(col("a.c_custkey").as("x"), col("b.c_custkey").as("y"),
        (when(levenshtein(col("a.c_name"), col("b.c_name")) === 0, 60).otherwise(30)
          + (col("a.c_mktsegment") === col("b.c_mktsegment")).cast("long") * 25
          + (abs(col("a.c_acctbal") - col("b.c_acctbal")) <= 1000.0).cast("long") * 15
          ).as("score"))
      .where(col("score") >= Resolve.MatchThreshold)
      .select("x", "y").as[(Long, Long)].collect()
    // union-find reference
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (x, y) =>
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
    }
    val keys = c.select("c_custkey").as[Long].collect()
    val expected = keys.map(k => k -> find(k)).toMap
    assert(labels === expected)
    // non-degenerate fixture: at least one real merge happened
    assert(expected.exists { case (k, e) => k != e })
  }

  test("memoized cluster labels equal a fresh uncached derivation (both populations)") {
    // the r20 labelsCache: the four cluster-consuming keys share one
    // propagation per population variant — reuse must be invisible
    Resolve.clearLabelsCache()
    val c = util.t(spark, dir, "customer")
    for ((variant, pop) <- Seq(
        "full" -> identity[org.apache.spark.sql.DataFrame] _,
        "idx8" -> ((d: org.apache.spark.sql.DataFrame) =>
          d.where(col("c_custkey") % 10 < 8)))) {
      val fresh = Resolve.clusterLabelsFrom(pop(c))
        .orderBy("c_custkey").collect().toSeq
      val memo1 = Resolve.clusterLabelsCached(spark, dir, variant, pop)
        .orderBy("c_custkey").collect().toSeq
      val memo2 = Resolve.clusterLabelsCached(spark, dir, variant, pop)
        .orderBy("c_custkey").collect().toSeq
      assert(memo1 === fresh, s"$variant: memoized labels diverged from fresh")
      assert(memo2 === fresh, s"$variant: cache-hit labels diverged from fresh")
    }
    Resolve.clearLabelsCache()
  }

  test("q_entity_golden picks max-balance/min-custkey per entity and exact totals") {
    val golden = operators.Resolve.entityGolden(spark, dir)
      .select("entity_id", "golden_custkey", "n_members")
      .as[(Long, Long, Long)].collect()
    val labels = operators.Resolve.entityResolveClusters(spark, dir)
      .as[(Long, Long)].collect()
    val attrs = util.t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
      .as[(Long, Double)].collect().toMap
    val byEntity = labels.groupBy(_._2)
    assert(golden.length === byEntity.size)
    golden.foreach { case (eid, gk, n) =>
      val members = byEntity(eid).map(_._1)
      assert(n === members.length.toLong)
      val expected = members.minBy(k => (-attrs(k), k))
      assert(gk === expected, s"entity $eid: golden $gk != expected $expected")
    }
  }

  test("q_mv_partial_refresh: untouched groups served from the view, holistic measure exact") {
    val stitched = operators.Relational.mvPartialRefresh(spark, dir)
    val full = {
      val o = util.t(spark, dir, "orders")
        .select(col("o_orderpriority"),
          year(col("o_orderdate")).cast("long").as("o_year"),
          col("o_custkey"), col("o_totalprice"))
      o.groupBy("o_orderpriority", "o_year")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("n_cust"),
          util.r4(sum(util.d2(col("o_totalprice")))).as("total"))
        .select("o_orderpriority", "o_year", "n", "n_cust", "total")
    }
    assert(stitched.count() > 0L)
    assert(stitched.exceptAll(full).count() === 0L)
    assert(full.exceptAll(stitched).count() === 0L)
    // the fixture actually exercises BOTH paths: some groups untouched
    // by the delta (pre-2000 years), some recomputed (2000+)
    val years = stitched.select("o_year").distinct().as[Long].collect()
    assert(years.exists(_ < 2000L) && years.exists(_ >= 2000L))
  }

  test("q_entity_resolve_incremental: every match verdict is the brute-force best") {
    val verdicts = operators.Resolve.entityResolveIncremental(spark, dir)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    val c = util.t(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")
      .as[(Long, String, Int, String, Double)].collect()
    val idx = c.filter(_._1 % 10 < 8)
    val probes = c.filter(_._1 % 10 >= 8)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = probes.map { p =>
      val best = idx.filter(i => i._3 == p._3 && lev(i._2, p._2) <= 1)
        .map { i =>
          val s = (if (lev(i._2, p._2) == 0) 60L else 30L) +
            (if (i._4 == p._4) 25L else 0L) + (if (math.abs(i._5 - p._5) <= 1000.0) 15L else 0L)
          (i._1, s)
        }
        .filter(_._2 >= operators.Resolve.MatchThreshold)
        .sortBy { case (k, s) => (-s, k) }.headOption
      (p._1, best.map(_._1), best.map(_._2))
    }.sortBy(_._1).toSeq
    assert(verdicts === expected)
    assert(expected.exists(_._2.isDefined) && expected.exists(_._2.isEmpty),
      "fixture must exercise both matched and unmatched probes")
  }

  test("persisted entity index: probe == direct form, append == rebuilt index") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_entidx").toString
    val c = util.t(spark, dir, "customer")
    val idxPop = c.where(col("c_custkey") % 10 < 8)
    val probes = c.where(col("c_custkey") % 10 >= 8)
    operators.Resolve.writeEntityIndex(idxPop, tmp)
    val viaIndex = operators.Resolve.probeEntityIndex(spark, probes, tmp)
      .orderBy("probe_key")
    val direct = operators.Resolve.probeMatches(idxPop, probes).orderBy("probe_key")
    assert(viaIndex.collect() === direct.collect())
    // absorb half the probes; the grown index must answer like a rebuild
    val (absorbed, rest) =
      (probes.where(col("c_custkey") % 2 === 0), probes.where(col("c_custkey") % 2 =!= 0))
    operators.Resolve.appendEntityIndex(absorbed, tmp)
    val grown = operators.Resolve.probeEntityIndex(spark, rest, tmp).orderBy("probe_key")
    val rebuilt = operators.Resolve.probeMatches(
      idxPop.unionByName(absorbed), rest).orderBy("probe_key")
    assert(grown.collect() === rebuilt.collect())
  }

  test("q_entity_absorb: probe -> absorb -> re-probe closes the serving loop") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_absorb").toString
    val c = util.t(spark, dir, "customer")
    val idx = c.where(col("c_custkey") % 10 < 8)
    val batch = c.where(col("c_custkey") % 10 >= 8)
    val declared = operators.Resolve.entityAbsorb(spark, dir).collect()
    // mint discipline: matched probes adopt the matched entity, unmatched
    // probes mint under their own key — and the fixture exercises both
    declared.foreach { r =>
      val (pk, eid, minted) = (r.getLong(0), r.getLong(1), r.getLong(2))
      if (minted == 1L) assert(eid === pk, s"minted probe $pk must self-id")
      else assert(eid % 10 < 8, s"matched probe $pk must point at an index key")
      assert(!r.isNullAt(3), s"probe $pk did not re-match after absorb")
      assert(r.getLong(4) >= operators.Resolve.MatchThreshold.toLong)
    }
    assert(declared.exists(_.getLong(2) == 1L), "fixture needs a minted probe")
    assert(declared.exists(_.getLong(2) == 0L), "fixture needs a matched probe")
    // the same loop through the PERSISTED index: probe, absorb the whole
    // batch (matched evidence AND minted entities), re-probe
    operators.Resolve.writeEntityIndex(idx, tmp)
    val v1 = operators.Resolve.probeEntityIndex(spark, batch, tmp)
      .orderBy("probe_key").collect()
    // pre-absorb verdicts agree with the declared assignment
    assert(v1.map(r => (r.getLong(0),
        if (r.isNullAt(1)) r.getLong(0) else r.getLong(1))).toSeq
      === declared.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    operators.Resolve.appendEntityIndex(batch, tmp)
    val v2 = operators.Resolve.probeEntityIndex(spark, batch, tmp)
      .orderBy("probe_key").collect()
    assert(v2.forall(!_.isNullAt(1)), "re-probe after absorb must match 100%")
    // re-probe verdicts equal the declared query's rematch columns
    assert(v2.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      === declared.map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq)
    // idempotence: probing again without new absorbs is a fixed point
    val v3 = operators.Resolve.probeEntityIndex(spark, batch, tmp)
      .orderBy("probe_key").collect()
    assert(v3 === v2)
  }

  test("q_join_fuzzy_tokens equals the unblocked cross-join scoring") {
    val nat = util.t(spark, dir, "nation")
      .select(col("n_nationkey"), lower(col("n_name")).as("nt"))
    val a = util.t(spark, dir, "customer")
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .select(concat_ws(" ", col("nt"), lit("customer"),
        regexp_extract(col("c_name"), "[0-9]+$", 0)).as("name_a")).distinct()
    val b = util.t(spark, dir, "supplier")
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .select(concat_ws(" ", col("nt"), lit("supplier"),
        regexp_extract(col("s_name"), "[0-9]+$", 0)).as("name_b")).distinct()
    val at = a.select(col("name_a"),
      array_distinct(split(col("name_a"), " ")).as("toks_a"))
    val bt = b.select(col("name_b"),
      array_distinct(split(col("name_b"), " ")).as("toks_b"))
    val brute = at.crossJoin(bt)
      .select(col("name_a"), col("name_b"),
        util.r4f((size(filter(col("toks_a"), ta =>
            exists(col("toks_b"), tb => levenshtein(ta, tb) <= 1)))
          + size(filter(col("toks_b"), tb =>
            exists(col("toks_a"), ta => levenshtein(ta, tb) <= 1))))
          .cast("double")
          / (size(col("toks_a")) + size(col("toks_b")))).as("score"))
      .where(col("score") >= 0.6)
    val blocked = operators.Resolve.joinFuzzyTokens(spark, dir)
    assert(blocked.count() > 0L)
    assert(blocked.exceptAll(brute).count() === 0L)
    assert(brute.exceptAll(blocked).count() === 0L)
    // the fixture exercises genuinely FUZZY token links (digit tokens one
    // edit apart), not just exact-token overlap
    val fuzzyLinks = blocked.where(
      element_at(split(col("name_a"), " "), -1)
        =!= element_at(split(col("name_b"), " "), -1)).count()
    assert(fuzzyLinks > 0L, "no dist-1 token links in the fixture")
  }

  test("q_entity_golden_attrs survivorship rules match per-entity brute force") {
    val got = operators.Resolve.entityGoldenAttrs(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4), r.getString(5)))).toMap
    val labels = operators.Resolve.entityResolveClusters(spark, dir)
      .as[(Long, Long)].collect()
    val attrs = util.t(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
      .as[(Long, String, String, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    val byEntity = labels.groupBy(_._2)
    assert(got.size === byEntity.size)
    byEntity.foreach { case (eid, members) =>
      val ks = members.map(_._1)
      val (n, survName, survBalKey, survBal, survSeg) = got(eid)
      assert(n === ks.length.toLong)
      assert(survName === attrs(ks.min)._1, s"entity $eid surv_name")
      assert(survBal === math.round(ks.map(attrs(_)._3).max * 10000) / 10000.0)
      assert(survBalKey === ks.minBy(k => (-attrs(k)._3, k)), s"entity $eid bal key")
      val segCounts = ks.groupBy(attrs(_)._2).map { case (s, g) => (s, g.length) }
      assert(survSeg === segCounts.toSeq.minBy { case (s, c) => (-c, s) }._1,
        s"entity $eid segment mode")
    }
    // multi-member entities exist, so the rules actually arbitrate
    assert(byEntity.values.exists(_.length > 1))
  }

  test("q_entity_golden_incremental: stitched upsert equals the one-pass full recompute") {
    val c = util.t(spark, dir, "customer")
    val idx = c.where(col("c_custkey") % 10 < 8)
    val batch = c.where(col("c_custkey") % 10 >= 8)
    val labels = operators.Resolve.clusterLabelsFrom(idx)
    // one-pass recompute over (labeled index ∪ assigned batch)
    val assigned = operators.Resolve.probeMatches(idx, batch)
      .join(labels.select(col("c_custkey").as("matched_key"),
        col("entity_id").as("matched_entity")), Seq("matched_key"), "left")
      .select(col("probe_key").as("c_custkey"),
        coalesce(col("matched_entity"), col("probe_key")).as("entity_id"),
        lit(1L).as("from_batch"))
      .join(batch.select("c_custkey", "c_name", "c_acctbal"), Seq("c_custkey"))
    val allRows = labels.join(idx.select("c_custkey", "c_name", "c_acctbal"), Seq("c_custkey"))
      .withColumn("from_batch", lit(0L))
      .unionByName(assigned.select("c_custkey", "entity_id", "from_batch", "c_name", "c_acctbal"))
    val full = allRows.groupBy("entity_id").agg(
        count(lit(1)).as("n_members"),
        min_by(col("c_name"), col("c_custkey")).as("surv_name"),
        util.r4(max(col("c_acctbal"))).as("surv_bal"),
        util.r4(sum(util.d2(col("c_acctbal")))).as("total_bal"),
        max(col("from_batch")).as("updated"))
      .select("entity_id", "n_members", "surv_name", "surv_bal", "total_bal", "updated")
    val inc = operators.Resolve.entityGoldenIncremental(spark, dir)
    assert(inc.count() > 0L)
    assert(inc.exceptAll(full).count() === 0L)
    assert(full.exceptAll(inc).count() === 0L)
    // the fixture exercises every path: untouched pass-through, touched
    // merges, and minted entities absent from the stored table
    val byFlag = inc.groupBy("updated").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byFlag.getOrElse(0L, 0L) > 0L, "no untouched golden rows")
    assert(byFlag.getOrElse(1L, 0L) > 0L, "no touched golden rows")
    val storedIds = labels.select("entity_id").distinct()
    assert(inc.join(storedIds, Seq("entity_id"), "left_anti").count() > 0L,
      "no minted entities in the fixture")
  }

  test("golden table at rest: write -> upsert x2 -> read equals the sequential recompute") {
    val c = util.t(spark, dir, "customer")
    val idx = c.where(col("c_custkey") % 10 < 8)
    val b1 = c.where(col("c_custkey") % 10 === 8)
    val b2 = c.where(col("c_custkey") % 10 === 9)
    val ei = java.nio.file.Files.createTempDirectory("graft_gt_ei").toString
    val gt = java.nio.file.Files.createTempDirectory("graft_gt").toString + "/golden"
    operators.Resolve.writeEntityIndex(idx, ei)
    operators.Resolve.writeGoldenTable(idx, gt)
    // the fresh table reads back as the batch golden over the index alone
    val labels0 = operators.Resolve.clusterLabelsFrom(idx)
    def goldenOver(members: org.apache.spark.sql.DataFrame) = {
      val all = members.join(c.select("c_custkey", "c_name", "c_acctbal"), Seq("c_custkey"))
      all.groupBy("entity_id").agg(
          count(lit(1)).as("n_members"),
          min_by(col("c_name"), col("c_custkey")).as("surv_name"),
          util.r4(max(col("c_acctbal"))).as("surv_bal"),
          util.r4(sum(util.d2(col("c_acctbal")))).as("total_bal"))
        .select("entity_id", "n_members", "surv_name", "surv_bal", "total_bal")
        .orderBy("entity_id")
    }
    assert(operators.Resolve.readGoldenTable(spark, gt).collect()
      === goldenOver(labels0).collect())
    // upsert batch 1 (probe precedes absorb), then absorb into the index
    operators.Resolve.upsertGoldenTable(spark, b1, ei, gt, seq = 0L)
    operators.Resolve.appendEntityIndex(b1, ei)
    // sequential twin for batch 1's assignments
    def assignTwin(pop: org.apache.spark.sql.DataFrame,
        batch: org.apache.spark.sql.DataFrame,
        mem: org.apache.spark.sql.DataFrame) =
      operators.Resolve.probeMatches(pop, batch)
        .join(mem.select(col("c_custkey").as("matched_key"),
          col("entity_id").as("matched_entity")), Seq("matched_key"), "left")
        .select(col("probe_key").as("c_custkey"),
          coalesce(col("matched_entity"), col("probe_key")).as("entity_id"))
    val a1 = assignTwin(idx, b1, labels0)
    val mem1 = labels0.unionByName(a1)
    assert(operators.Resolve.readGoldenTable(spark, gt).collect()
      === goldenOver(mem1).collect())
    // upsert batch 2 against the GROWN index — a b2 record matching an
    // absorbed b1 record must resolve b1's assigned entity via members/
    operators.Resolve.upsertGoldenTable(spark, b2, ei, gt, seq = 1L)
    operators.Resolve.appendEntityIndex(b2, ei)
    val a2 = assignTwin(idx.unionByName(b1), b2, mem1)
    val mem2 = mem1.unionByName(a2)
    val expected = goldenOver(mem2).collect()
    assert(operators.Resolve.readGoldenTable(spark, gt).collect() === expected)
    // compaction folds the state log to one row per entity, read identical
    val filesBefore = operators.IndexMaintenance.dataFileCount(spark, s"$gt/states")
    operators.IndexMaintenance.compactGoldenTable(spark, gt)
    assert(operators.Resolve.readGoldenTable(spark, gt).collect() === expected)
    assert(operators.IndexMaintenance.dataFileCount(spark, s"$gt/states") < filesBefore)
    val log = spark.read.parquet(s"$gt/states")
    assert(log.groupBy("entity_id").count().where(col("count") > 1).count() === 0L)

    // ---- retraction: delete records, read equals the recompute over
    // the surviving members with the ORIGINAL (stable) entity ids
    val delKeys = mem2.where(col("c_custkey") % 7 === 3).select("c_custkey")
    assert(delKeys.count() > 0L, "degenerate fixture: nothing to delete")
    operators.Resolve.deleteGoldenRecords(spark, delKeys, gt, seq = 2L)
    val mem3 = mem2.join(delKeys, Seq("c_custkey"), "left_anti")
    val afterDelete = goldenOver(mem3).collect()
    assert(operators.Resolve.readGoldenTable(spark, gt).collect() === afterDelete)
    // the fixture exercises FULL deletion: at least one entity whose every
    // member was deleted left the served table entirely (tombstone path)
    val idsBefore = expected.map(_.getLong(0)).toSet
    val idsAfter = afterDelete.map(_.getLong(0)).toSet
    assert((idsBefore -- idsAfter).nonEmpty, "no entity fully retracted")
    // a REPLAYED delete (same seq) is read-idempotent
    operators.Resolve.deleteGoldenRecords(spark, delKeys, gt, seq = 2L)
    assert(operators.Resolve.readGoldenTable(spark, gt).collect() === afterDelete)
    // a later upsert lands on the post-delete table and still reads exact:
    // re-absorb the deleted records as a fresh batch (they re-probe the
    // index, which still contains them — they match themselves at 100)
    val b3 = c.join(delKeys, Seq("c_custkey"), "left_semi")
    operators.Resolve.upsertGoldenTable(spark, b3, ei, gt, seq = 3L)
    val a3 = assignTwin(idx.unionByName(b1).unionByName(b2), b3,
      mem3.select("c_custkey", "entity_id"))
    val mem4 = mem3.unionByName(a3)
    val afterReabsorb = goldenOver(mem4).collect()
    assert(operators.Resolve.readGoldenTable(spark, gt).collect() === afterReabsorb)
    // a REPLAYED upsert (same seq) is read-idempotent too
    operators.Resolve.upsertGoldenTable(spark, b3, ei, gt, seq = 3L)
    assert(operators.Resolve.readGoldenTable(spark, gt).collect() === afterReabsorb)
    // ABSORB-ONCE: re-upserting already-current records at a NEW seq is a
    // no-op — an at-least-once source (or a CDC update arriving as a bare
    // re-insert) must not double-count members/totals
    operators.Resolve.upsertGoldenTable(spark, b1, ei, gt, seq = 4L)
    assert(operators.Resolve.readGoldenTable(spark, gt).collect() === afterReabsorb,
      "re-upsert of absorbed records double-counted")
    // compaction after deletes still folds to one state row per entity
    operators.IndexMaintenance.compactGoldenTable(spark, gt)
    assert(operators.Resolve.readGoldenTable(spark, gt).collect() === afterReabsorb)
    assert(spark.read.parquet(s"$gt/states")
      .groupBy("entity_id").count().where(col("count") > 1).count() === 0L)
    // and the member fold dropped the netted-out (deleted, un-reabsorbed) facts
    assert(spark.read.parquet(s"$gt/members").where(col("sign") < 0).count() === 0L)
  }

  test("q_entity_blocking_eval: counts match brute force, completeness 1.0") {
    val row = operators.Resolve.entityBlockingEval(spark, dir).collect()(0)
    val c = util.t(spark, dir, "customer")
    val brute = c.as("a").join(c.as("b"),
        col("a.c_nationkey") === col("b.c_nationkey")
          && col("a.c_custkey") < col("b.c_custkey"))
      .where(levenshtein(col("a.c_name"), col("b.c_name")) <= 1)
      .count()
    assert(row.getAs[Long]("n_truth") === brute)
    assert(row.getAs[Long]("n_verified") === brute)
    assert(row.getAs[Double]("pairs_completeness") === 1.0)
    assert(row.getAs[Long]("n_candidates") >= brute)
    assert(row.getAs[Long]("n_cross") > row.getAs[Long]("n_candidates"))
  }

  test("q_mv_incremental equals the single-pass full recompute") {
    val merged = operators.Relational.mvIncremental(spark, dir)
    val full = {
      val o = util.t(spark, dir, "orders")
        .select(col("o_orderpriority"),
          year(col("o_orderdate")).cast("long").as("o_year"), col("o_totalprice"))
      o.groupBy("o_orderpriority", "o_year")
        .agg(count(lit(1)).as("n"),
          sum(util.d2(col("o_totalprice"))).as("total_d"),
          min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
        .select(col("o_orderpriority"), col("o_year"), col("n"),
          util.r4(col("total_d")).as("total"),
          util.r4(col("mn")).as("min_price"), util.r4(col("mx")).as("max_price"),
          util.r4f(col("total_d").cast("double") / col("n")).as("avg_price"))
    }
    assert(merged.count() > 0L)
    assert(merged.exceptAll(full).count() === 0L)
    assert(full.exceptAll(merged).count() === 0L)
  }

  test("q_mv_retract equals the full recompute over base minus deletes plus inserts") {
    val stitched = operators.Relational.mvRetract(spark, dir)
    val o = util.t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderdate"), col("o_orderkey"),
        col("o_totalprice"))
    val cut = lit("2000-01-01").cast("date")
    val hist = o.where(col("o_orderdate") < cut && col("o_orderkey") % 17 =!= 0)
      .unionByName(o.where(col("o_orderdate") >= cut))
      .select(col("o_orderpriority"),
        year(col("o_orderdate")).cast("long").as("o_year"), col("o_totalprice"))
    val full = hist.groupBy("o_orderpriority", "o_year")
      .agg(count(lit(1)).as("n"),
        sum(util.d2(col("o_totalprice"))).as("total_d"),
        min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
      .select(col("o_orderpriority"), col("o_year"), col("n"),
        util.r4(col("total_d")).as("total"),
        util.r4(col("mn")).as("min_price"), util.r4(col("mx")).as("max_price"),
        util.r4f(col("total_d").cast("double") / col("n")).as("avg_price"))
    assert(stitched.count() > 0L)
    assert(stitched.exceptAll(full).count() === 0L)
    assert(full.exceptAll(stitched).count() === 0L)
    // the fixture actually retracts: some base rows are deleted
    assert(o.where(col("o_orderdate") < cut && col("o_orderkey") % 17 === 0)
      .count() > 0L, "degenerate fixture: no deletes")
  }

  test("signed-state merge is exact for the retractable measures (not just end-to-end)") {
    // stored + inserts(+1) + deletes(-1) merged per group must equal the
    // recomputed n/total over surviving history for EVERY group — the
    // CollapsingMergeTree property q_mv_retract's count/sum path rides
    val o = util.t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderdate"), col("o_orderkey"),
        col("o_totalprice"))
    val cut = lit("2000-01-01").cast("date")
    val base = o.where(col("o_orderdate") < cut)
    val inserts = o.where(col("o_orderdate") >= cut)
    val deletes = base.where(col("o_orderkey") % 17 === 0)
    val merged = operators.Relational.mvMergeSigned(
      operators.Relational.mvSignedStates(base, 1)
        .unionByName(operators.Relational.mvSignedStates(inserts, 1))
        .unionByName(operators.Relational.mvSignedStates(deletes, -1)))
      .select(col("o_orderpriority"), col("o_year"), col("n"),
        util.r4(col("total")).as("total"))
    val recomputed = base
      .join(deletes.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
      .unionByName(inserts)
      .select(col("o_orderpriority"),
        year(col("o_orderdate")).cast("long").as("o_year"), col("o_totalprice"))
      .groupBy("o_orderpriority", "o_year")
      .agg(count(lit(1)).as("n"), util.r4(sum(util.d2(col("o_totalprice")))).as("total"))
    assert(merged.exceptAll(recomputed).count() === 0L)
    assert(recomputed.exceptAll(merged).count() === 0L)
  }
}
