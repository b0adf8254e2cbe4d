package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

class CurationSpec extends SparkSpec {

  test("curation decisions partition the corpus and respect stage order") {
    val out = Curation.curate(spark, sf).persist()
    val total = Tables.documents(spark, sf).count()
    assert(out.count() == total)
    assert(out.select(col("doc_id")).distinct().count() == total)
    val byReason = out.groupBy(col("reason")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byReason.keySet.subsetOf(Set("kept", "low_quality", "exact_dup", "near_dup")))
    assert(byReason.getOrElse("kept", 0L) > 0)
    // kept rows are exactly the keep==true rows
    assert(out.filter(col("keep")).count() == byReason.getOrElse("kept", 0L))
  }

  test("P2 hash split: partition-invariant, covers the corpus, ratios sane") {
    val out = Curation.hashSplit(spark, sf).collect()
    val total = out.map(_.getLong(2)).sum
    assert(total == Tables.documents(spark, sf).count())
    val bySplit = out.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum)
    // 12/2/2 hex-digit buckets: train ≈ 75%, val/test ≈ 12.5% each
    assert(bySplit("train").toDouble / total > 0.6)
    assert(bySplit.getOrElse("val", 0L) + bySplit.getOrElse("test", 0L) > 0)
    // determinism: the same assignment regardless of partitioning is the
    // point of hashing the id — the aggregate must be identical when the
    // input order/partitioning changes (md5 is row-local, but this pins
    // the contract vs. a Bernoulli sample() which would differ)
    val again = Curation.hashSplit(spark, sf).collect()
    assert(out.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("P4 shard packing: every doc assigned once, shards near budget, deterministic") {
    val out = Curation.packShards(spark, sf, budget = 2000L).collect()
    val totalDocs = out.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs == Tables.documents(spark, sf).count())
    // every shard except possibly the last crosses the budget boundary
    // only via its final straddling doc: tokens >= budget - (max doc len)
    val tokens = out.map(_.getAs[Long]("shard_tokens"))
    assert(tokens.init.forall(_ >= 1000L), tokens.mkString(","))
    val again = Curation.packShards(spark, sf, budget = 2000L).collect()
    assert(out.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("a planted exact duplicate and near duplicate are both dropped") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = (1 to 60).map(i => if (i == 30) "CHANGED" else s"tok$i").mkString(" ")
    val docs = Seq((1L, base, "en"), (2L, base, "en"), (3L, near, "en"),
      (4L, (100 to 160).map(i => s"z$i").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    docs.createOrReplaceTempView("_cur_docs")
    // run the pipeline stages directly over this tiny frame
    val cand = Curation.lshCandidates(docs.select(col("doc_id"), col("text")))
    val pairs = graft.operators.Dedup.verifyJaccard(
      docs.select(col("doc_id"), col("text")), cand, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((1L, 3L)))
  }

  test("p5 weighted sampling replays the md5 decision rule exactly") {
    val out = Curation.p5WeightedSample(spark, sf).collect()
      .map(_.getLong(0)).toSet
    // independent Scala replay of the documented rule
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect().flatMap { r =>
        val (id, nc) = (r.getLong(0), r.getLong(1))
        val hex = md.digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val thr = math.min(nc, 400L) * 65536L / 400L
        val keep = nc >= 400L || hex.substring(0, 4) < f"$thr%04x"
        if (keep) Some(id) else None
      }.toSet
    assert(out == expected)
    assert(out.nonEmpty && out.size < Tables.documents(spark, sf).count())
    // long documents are certainly kept
    val longIds = Tables.documents(spark, sf)
      .filter(col("n_chars") >= 400).collect().map(_.getAs[Long]("doc_id"))
    assert(longIds.forall(out.contains))
  }

  test("p7 dsir: target-like docs up-weighted, smoothing covers unseen " +
      "grams, gumbel resample deterministic (r15)") {
    import spark.implicits._
    // corpus in two dialects; target = the 'alpha' dialect docs
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha"),
      (2L, "alpha beta beta alpha alpha"),
      (3L, "gamma delta gamma delta gamma"),
      (4L, "gamma delta delta gamma gamma"),
      (5L, "alpha delta gamma beta alpha")).toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") <= 2)
    val w = Curation.dsirLogWeights(docs, target, buckets = 8192)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // alpha-dialect docs must dominate gamma-dialect docs; the mixed
    // doc sits between
    assert(w(1L) > w(5L) && w(2L) > w(5L), s"w=$w")
    assert(w(5L) > w(3L) && w(5L) > w(4L), s"w=$w")
    // smoothing: a doc made ONLY of grams unseen in the target still
    // gets a finite weight (add-alpha never yields ln 0)
    assert(!w(3L).isNaN && !w(3L).isInfinite)
    // resample: k rows, deterministic under rerun, seed changes the draw
    val lw = Curation.dsirLogWeights(docs, target, buckets = 8192)
    val s1 = Curation.dsirResample(lw, k = 3).collect().map(_.getLong(0)).toSeq
    val s2 = Curation.dsirResample(lw, k = 3).collect().map(_.getLong(0)).toSeq
    assert(s1 == s2 && s1.length == 3)
  }

  test("p4 bpe pack: shard totals are the F10 BPE counts, every doc " +
      "packed once, differs from the whitespace budget (r16)") {
    val bpe = Curation.p4ShardsBpe(spark, sf).collect()
    val ws = Curation.packShards(spark, sf).collect()
    val f10Total = graft.operators.TextAnalysis.f10Bpe(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).collect()(0).getLong(0)
    assert(bpe.map(_.getLong(2)).sum == f10Total,
      "packed token mass must equal the BPE gate's total")
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(bpe.map(_.getLong(1)).sum == nDocs, "every doc packed exactly once")
    // BPE counts exceed whitespace counts (subword splits), so the
    // tokenizer-true pack needs more shards on the same corpus
    assert(bpe.map(_.getLong(2)).sum > ws.map(_.getLong(2)).sum)
  }

  test("p9 sequence packing: every token in exactly one span, sequences " +
      "fill to seqLen, docs split across boundaries, deterministic (r16)") {
    val out = Curation.packSequences(spark, sf, seqLen = 512L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    // token-mass conservation: Σ len == Σ per-doc whitespace tokens
    val totalTokens = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.size(
        split(lower(trim(col("text"))), "\\s+")).cast("long").as("n"))
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    assert(out.map(_._5).sum == totalTokens)
    // per-document coverage: spans tile [0, n) contiguously
    out.groupBy(_._1).foreach { case (_, spans) =>
      val sorted = spans.sortBy(_._2)
      assert(sorted.head._3 == 0L, "first span starts at doc_offset 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 + a._5 == b._3, "doc spans contiguous")
          assert(b._2 == a._2 + 1, "split docs touch consecutive sequences")
        case _ => ()
      }
    }
    // per-sequence fill: every sequence except the last holds exactly
    // seqLen tokens, tiled contiguously from offset 0
    val bySeq = out.groupBy(_._2)
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (seq, spans) =>
      val sorted = spans.sortBy(_._4)
      assert(sorted.head._4 == 0L, s"seq $seq starts at offset 0")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + a._5 == b._4, s"seq $seq gap")
        case _ => ()
      }
      val fill = sorted.map(_._5).sum
      if (seq != lastSeq) assert(fill == 512L, s"seq $seq holds $fill")
      else assert(fill > 0 && fill <= 512L)
    }
    // a doc longer than seqLen splits into > 1 span
    assert(out.groupBy(_._1).exists(_._2.length > 1) ||
      totalTokens <= 512L)
    // deterministic rerun
    val out2 = Curation.packSequences(spark, sf, seqLen = 512L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out2.toSeq == out.toSeq)
  }

  test("p8 ccnet composition: buckets are per-language terciles by " +
      "value threshold, reasons compose with precedence, signals match " +
      "the standalone F11/P7 gates (r16)") {
    import spark.implicits._
    val out = Curation.p8Ccnet(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2),
        r.getString(3), r.getDouble(4), r.getInt(5), r.getString(6)))).toMap
    assert(out.nonEmpty)
    // composition contract: ppl column == the standalone f11 gate's
    // ppl, log_weight == the standalone p7 gate's, doc for doc
    val f11 = graft.operators.TextAnalysis.f11Ppl(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val p7 = Curation.p7Dsir(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach { case (id, (_, ppl, _, lw, _, _)) =>
      assert(ppl == f11(id), s"doc $id ppl diverges from f11")
      assert(lw == p7(id), s"doc $id log_weight diverges from p7")
    }
    // bucket semantics: within each predicted language, every head ppl
    // ≤ every middle ppl ≤ every tail ppl, and heads are ≥ 1/3 − ties
    out.values.groupBy(_._1).foreach { case (lang, rows) =>
      val byBucket = rows.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
      val hMax = byBucket.get("head").map(_.max).getOrElse(Double.MinValue)
      val mMax = byBucket.get("middle").map(_.max).getOrElse(hMax)
      byBucket.get("middle").foreach(m => assert(m.min >= hMax || m.min == hMax,
        s"$lang: middle below head max"))
      byBucket.get("middle").foreach(m => assert(m.forall(_ >= hMax - 1e-9)))
      byBucket.get("tail").foreach(t => assert(t.forall(_ >= mMax - 1e-9)))
      // value-threshold rule: equal ppl ⇒ equal bucket
      rows.groupBy(_._2).foreach { case (_, same) =>
        assert(same.map(_._3).toSet.size == 1, s"$lang: tie split buckets")
      }
    }
    // reasons: keep=1 ⟺ kept; tail docs dropped as ppl_tail
    out.values.foreach { case (_, _, bucket, _, keep, reason) =>
      if (reason == "kept") assert(keep == 1 && bucket != "tail")
      if (reason == "ppl_tail") assert(keep == 0 && bucket == "tail")
      if (reason == "lang_unknown") assert(keep == 0)
    }
    // deterministic rerun
    val out2 = Curation.p8Ccnet(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2),
        r.getString(3), r.getDouble(4), r.getInt(5), r.getString(6)))).toMap
    assert(out2 == out)
  }

  test("scaleProperties: every scaler's closed form on a hand-checked column") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    def scaledOf(scaler: String): Seq[Double] =
      Curation.scaleProperties(df, Seq("x"), scaler)
        .orderBy(col("x")).collect().map(_.getAs[Double]("x_scaled")).toSeq
    assert(scaledOf("minMax") == Seq(0.0, 1.0 / 3, 2.0 / 3, 1.0))
    assert(scaledOf("max") == Seq(0.25, 0.5, 0.75, 1.0))
    assert(scaledOf("center") == Seq(-1.5, -0.5, 0.5, 1.5))
    // σ_pop of {1,2,3,4} = sqrt(1.25)
    val sd = math.sqrt(1.25)
    assert(scaledOf("stdScore").zip(Seq(-1.5, -0.5, 0.5, 1.5).map(_ / sd))
      .forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(scaledOf("mean") == Seq(-0.5, -1.0 / 6, 1.0 / 6, 0.5))
    assert(scaledOf("log").zip(Seq(1.0, 2.0, 3.0, 4.0).map(math.log))
      .forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // constant column: minMax/stdScore degrade to 0, never NaN
    val const = Seq(7.0, 7.0).toDF("x")
    assert(Curation.scaleProperties(const, Seq("x"), "minMax")
      .collect().forall(_.getAs[Double]("x_scaled") == 0.0))
    assert(Curation.scaleProperties(const, Seq("x"), "stdScore")
      .collect().forall(_.getAs[Double]("x_scaled") == 0.0))
    // multi-column: one aggregation pass scales both
    val two = Seq((1.0, 10.0), (3.0, 30.0)).toDF("a", "b")
    val got = Curation.scaleProperties(two, Seq("a", "b"), "minMax")
      .orderBy(col("a")).collect()
      .map(r => (r.getAs[Double]("a_scaled"), r.getAs[Double]("b_scaled"))).toSeq
    assert(got == Seq((0.0, 0.0), (1.0, 1.0)))
    // unknown scaler / column are loud
    intercept[IllegalArgumentException](
      Curation.scaleProperties(df, Seq("x"), "robust"))
    intercept[IllegalArgumentException](
      Curation.scaleProperties(df, Seq("nope"), "minMax"))
  }
}
