package graft

import graft.ml.GoldenReport
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamsMultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("st01: streaming windowed agg equals batch oracle semantics") {
    val streamed = streaming.Streams.st01.fn(spark, sf).collect()
    val batch = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("window_start", "event_type")
      .collect()
    assert(streamed.length == batch.length)
    assert(streamed.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSeq ==
      batch.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSeq)
  }

  test("st11: watermarked dedup equals st05's unbounded-state dedup") {
    val bounded = streaming.Streams.st11.fn(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_unique_users"))).toSeq
    val unbounded = streaming.Streams.st05.fn(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_unique_users"))).toSeq
    assert(bounded == unbounded)
  }

  test("st12: sliding windows equal the batch 4-window expansion") {
    val streamed = streaming.Streams.st12.fn(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSeq
    val mxUs = Tables.events(spark, sf)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val batch = Tables.events(spark, sf)
      .withColumn("k", explode(expr("sequence(0, 3)")))
      .withColumn("window_start",
        expr("timestamp_micros((unix_micros(ts) div 900000000) * 900000000 - cast(k as bigint) * 900000000)"))
      .filter(unix_micros(col("window_start")) + 3600000000L <= mxUs - 600000000L)
      .groupBy("window_start", "event_type").agg(count(lit(1)).as("n"))
      .orderBy("window_start", "event_type").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSeq
    assert(streamed == batch)
  }

  test("st15: left-outer = st08 inner + watermark-closed unmatched views") {
    // no-mutation contract: st15 tunes shuffle.partitions for its
    // state-store sizing in a PRIVATE newSession clone; the caller's
    // session conf must be untouched afterwards (the r7 set-then-restore
    // pattern was racy under concurrent queries in one session)
    val confBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val outer = streaming.Streams.st15.fn(spark, sf).collect()
    assert(spark.conf.get("spark.sql.shuffle.partitions") == confBefore,
      "st15 must not mutate the caller session's conf")
    val inner = streaming.Streams.st08.fn(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    val matched = outer.filter(!_.isNullAt(2))
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(matched == inner, "matched subset must equal the inner join")
    // null-emitted views re-derived batch-side: no in-window purchase AND
    // window end strictly under the min-of-both-streams watermark
    val ev = Tables.events(spark, sf)
    val maxV = ev.filter(col("event_type") === "view")
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val maxP = ev.filter(col("event_type") === "purchase")
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val wm = math.min(maxV, maxP) - 3600000000L
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), unix_micros(col("ts")), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expectedNull = views.filter { case (_, vus, uid) =>
      vus + 1800000000L < wm &&
        !purch.exists { case (pu, pus) =>
          pu == uid && pus > vus && pus <= vus + 1800000000L }
    }.map(_._1).toSet
    val gotNull = outer.filter(_.isNullAt(2)).map(_.getLong(1)).toSet
    assert(gotNull == expectedNull)
    assert(gotNull.nonEmpty, "no unmatched views at this sf — test is vacuous")
  }

  test("st16: streamed CMS equals the batch sketch and never undercounts") {
    val got = streaming.Streams.st16.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.length == 10)
    // CMS's one deterministic guarantee: estimates never undercount
    got.foreach { case (u, exact, est, over, _) =>
      assert(est >= exact && over == est - exact, s"user $u undercounted")
    }
    // the streamed sketch must agree with a batch-built one: re-derive
    // the estimates from a plain batch aggregation of the same cells
    import org.apache.spark.sql.functions._
    def bucket(dCol: org.apache.spark.sql.Column, u: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(dCol.cast("string"), lit("|"), u.cast("string"))), 1, 8),
        16, 10).cast("long") % 256
    val ev = Tables.events(spark, sf)
    val cells = ev.select(col("user_id"), explode(expr("array(0,1,2,3)")).as("d"))
      .withColumn("bucket", bucket(col("d"), col("user_id")))
      .groupBy("d", "bucket").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    got.foreach { case (u, _, est, _, _) =>
      val batchEst = (0 to 3).map { dd =>
        // recompute the bucket driver-side via the same md5 prefix
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$dd|$u".getBytes("UTF-8")).take(4)
          .map("%02x".format(_)).mkString
        cells((dd, java.lang.Long.parseLong(hex, 16) % 256))
      }.min
      assert(est == batchEst, s"user $u: streamed est $est != batch $batchEst")
    }
  }

  test("st13: native session windows equal st04's stateful sessions, closed-filtered") {
    val mxTs = Tables.events(spark, sf).agg(max(unix_micros(col("ts")))).head().getLong(0)
    val wm = mxTs - 600000000L // watermark: max(ts) - 10 min, in micros
    val native = streaming.Streams.st13.fn(spark, sf)
      .select(col("user_id"), unix_micros(col("session_start")).as("st"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val stateful = streaming.Streams.st04.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
        r.getAs[Long]("end_us"), r.getAs[Long]("n_events")))
      .filter { case (_, _, endUs, _) => endUs + 1800000000L <= wm }
      .map { case (u, st, _, n) => (u, st, n) }.toSeq.sorted
    assert(native.sorted == stateful)
  }

  test("st17: session join = st13 sessions enriched with the batch dimension") {
    // the chained stream-static join must not change the session set:
    // st17 projected to st13's columns equals st13, and every row's
    // segment is exactly the batch customer lookup for its user
    val st17 = streaming.Streams.st17.fn(spark, sf).collect()
    val sessions = st17.map(r => (r.getAs[Long]("user_id"),
      r.getAs[java.sql.Timestamp]("session_start").getTime,
      r.getAs[Long]("n_events"))).toSeq.sorted
    val base = streaming.Streams.st13.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("session_start").getTime,
        r.getAs[Long]("n_events"))).toSeq.sorted
    assert(sessions == base, "join must preserve the session set")
    val segOf = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => (r.getAs[Long]("c_custkey") - 1) -> r.getAs[String]("c_mktsegment"))
      .toMap
    st17.foreach { r =>
      assert(r.getAs[String]("segment") == segOf(r.getAs[Long]("user_id")),
        s"segment mismatch for user ${r.getAs[Long]("user_id")}")
    }
    // value sums are positive and finite (exact values are oracle-pinned)
    st17.foreach(r => assert(!r.getAs[Double]("total_value").isNaN))
  }

  test("st03: stateful sessionization agrees with the window-island form") {
    val stateful = streaming.Streams.stateful(spark, sf)
      .select("user_id", "n_sessions", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val declarative = streaming.Streams.st02.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stateful == declarative)
  }

  test("st10: transformWithState agrees with st02 and st03 (tri-equivalence)") {
    val tws = streaming.Streams.st10.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val declarative = streaming.Streams.st02.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val mgws = streaming.Streams.stateful(spark, sf)
      .select("user_id", "n_sessions", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(tws == declarative && tws == mgws,
      "window-island, mapGroupsWithState, and transformWithState must agree")
  }

  test("st04: per-session rows are consistent with st02's per-user rollup") {
    val sessions = streaming.Streams.sessionDetails(spark, sf)
      .groupBy("user_id")
      .agg(max("session_idx").as("n_sessions"), sum("n_events").as("n_events"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val declarative = streaming.Streams.st02.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(sessions == declarative)
  }

  test("st14: streamed admission equals the batch explode/groupBy MinHash form") {
    // The streaming side computes signatures with SCALAR expressions
    // (array_distinct + array_min — map-only); this comparator takes the
    // classical route (explode -> distinct -> 8 min-aggs) over the same
    // unpruned shingle set. Agreement proves the scalar reduction is the
    // aggregate min AND that the stream-static band join + complete-mode
    // count reproduce the batch pipeline.
    val streamed = streaming.Streams.st14.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val sh0 = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t)-3), i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))")).as("s"))
      .select(col("doc_id"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("h"))
      .distinct()
    val sigAggs = (0 to 7).map { i =>
      min(md5(concat(lit(s"$i:"), col("h").cast("string")))).as(s"m$i")
    }
    val sig = sh0.groupBy("doc_id").agg(sigAggs.head, sigAggs.tail: _*)
      .select(col("doc_id"), expr(
        "stack(8, " + (0 to 7).map(i => s"$i, m$i").mkString(", ") + ") AS (i, m)"))
    // mirror st14's static-side stop-band prune (df > 100 in the
    // standing index — a no-op on this fixture, asserted so the
    // comparator stays honest if the fixture ever grows a hot band)
    val corpSig = sig.filter(col("doc_id") % 5 =!= 0)
      .withColumnRenamed("doc_id", "corpus_id")
    val stop = corpSig.groupBy("i", "m").agg(count(lit(1)).as("bdf"))
      .filter(col("bdf") > 100).select("i", "m")
    val batch = sig.filter(col("doc_id") % 5 === 0)
      .withColumnRenamed("doc_id", "incoming_id")
      .join(corpSig.join(stop, Seq("i", "m"), "left_anti"), Seq("i", "m"))
      .groupBy("incoming_id", "corpus_id")
      .agg(count(lit(1)).as("shared_bands"))
      .orderBy("incoming_id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed.nonEmpty, "fixture should produce at least one admission pair")
    assert(streamed == batch)
  }

  test("st21: streamed frame admission equals the batch explode/groupBy form") {
    // The streaming side signs each 16-byte frame with ONE scalar
    // expression chain (13 md5 shingle hashes folded by 32 aggregate()
    // majorities — map-only); this comparator takes mm08's classical
    // batch route (explode 13 shingles -> groupBy(doc, fi) bit-sum ->
    // majority pack) over the same frames and rebuilds the whole
    // ledger with batch COUNT DISTINCT. Agreement proves the scalar
    // fingerprint IS mm08's, and that the stream-static left join +
    // collect_set complete-mode aggregate reproduce the batch ledger.
    val streamed = streaming.Streams.st21.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        java.lang.Double.doubleToLongBits(r.getDouble(4)), r.getBoolean(5)))
      .toSeq
    val docs = Tables.documents(spark, sf)
    val frames = docs.filter(length(col("text")) >= 32)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, CAST(length(text) div 16 AS INT) - 1), " +
          "i -> substring(text, i*16+1, 16))")))
      .withColumnRenamed("pos", "fi").withColumnRenamed("col", "frame")
    val sh = frames.select(col("doc_id"), col("fi"), explode(expr(
        "transform(sequence(0, 12), j -> substring(frame, j+1, 4))")).as("g"))
      .select(col("doc_id"), col("fi"),
        conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long").as("f"))
    val bitAggs = (0 to 31).map { j =>
      sum(expr(s"CASE WHEN (shiftright(f, $j) & 1) = 1 THEN 1 ELSE -1 END"))
        .as(s"sb$j")
    }
    val fh = sh.groupBy("doc_id", "fi").agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"), col("fi"),
        (0 to 31).map { j =>
          expr(s"CASE WHEN sb$j > 0 THEN shiftleft(CAST(1 AS BIGINT), $j) " +
            s"ELSE CAST(0 AS BIGINT) END")
        }.reduce(_ + _).as("ph"))
    def banded(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("fi"), col("ph"),
        explode(expr("sequence(0, 1)")).as("k"))
      .withColumn("band", expr(
        "CASE WHEN k = 0 THEN ph & 65535 ELSE shiftright(ph, 16) & 65535 END"))
    val nfIdx = fh.filter(col("doc_id") % 5 =!= 0).count()
    val cb = banded(fh.filter(col("doc_id") % 5 =!= 0))
      .select(col("doc_id").as("corpus_id"), col("ph").as("cph"),
        col("k"), col("band"))
    val stop = cb.groupBy("k", "band").agg(count(lit(1)).as("bdf"))
      .filter(col("bdf") > greatest(lit(100.0), lit(32.0 * nfIdx / 65536.0)))
      .select("k", "band")
    val tw = banded(fh.filter(col("doc_id") % 5 === 0))
      .join(cb.join(stop, Seq("k", "band"), "left_anti"), Seq("k", "band"))
      .filter(expr("CAST(bit_count(ph ^ cph) AS INT)") <= 6)
      .select("doc_id", "fi", "corpus_id").distinct()
    val led = tw.groupBy("doc_id").agg(
      countDistinct("fi").as("ntf"), countDistinct("corpus_id").as("ncd"))
    val batch = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), expr("CASE WHEN length(text) >= 32 THEN " +
        "CAST(length(text) div 16 AS BIGINT) ELSE CAST(0 AS BIGINT) END")
        .as("nf"))
      .join(led, Seq("doc_id"), "left")
      .select(col("doc_id"), col("nf"),
        coalesce(col("ntf"), lit(0L)).as("ntf"),
        coalesce(col("ncd"), lit(0L)).as("ncd"))
      .withColumn("ratio", when(col("nf") === 0L, lit(0.0))
        .otherwise(col("ntf").cast("double") / col("nf")))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        java.lang.Double.doubleToLongBits(r.getDouble(4)),
        r.getDouble(4) < 0.5)).toSeq
    assert(streamed.exists(_._3 > 0),
      "fixture should produce at least one twin frame")
    assert(streamed == batch)
  }

  test("perceptual_hash120: native kernel equals the composed explode/groupBy form") {
    // r18: the tile -> distinct -> md5-feature -> bit-majority chain is
    // one native call per payload; this comparator is the pre-r18
    // composed dataflow verbatim (two exchanges), run in WIDE mode so
    // BOTH fingerprint words are pinned. Agreement on every doc proves
    // the fused kernel is bit-identical — the same formula every
    // mm07/dd17/sp12 oracle re-derives in DuckDB.
    val eligible = Tables.documents(spark, sf).filter(length(col("text")) >= 16)
    val (hash, _) = multimodal.Multimodal.perceptualHashBanded(eligible, 20)
    val native = hash.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val tiles = eligible
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, CAST(length(text) div 16 AS INT) - 1), " +
          "i -> substring(text, i*16+1, 16))")).as("tile"))
      .select(col("doc_id"),
        conv(substring(md5(col("tile")), 1, 15), 16, 10).cast("long").as("h"))
      .distinct()
    val th = tiles.withColumn("md", md5(col("h").cast("string")))
      .withColumn("f",
        (conv(substring(col("md"), 9, 7), 16, 10).cast("long") * lit(4294967296L)) +
          conv(substring(col("md"), 1, 8), 16, 10).cast("long"))
      .withColumn("f2",
        (conv(substring(col("md"), 24, 7), 16, 10).cast("long") * lit(4294967296L)) +
          conv(substring(col("md"), 16, 8), 16, 10).cast("long"))
    val bitAggs = (0 to 59).map { j =>
      sum(expr(s"CASE WHEN (shiftright(f, $j) & 1) = 1 THEN 1 ELSE -1 END")).as(s"sb$j")
    } ++ (0 to 59).map { j =>
      sum(expr(s"CASE WHEN (shiftright(f2, $j) & 1) = 1 THEN 1 ELSE -1 END")).as(s"sc$j")
    }
    def packed(pfx: String) = (0 to 59).map { j =>
      expr(s"CASE WHEN $pfx$j > 0 THEN shiftleft(CAST(1 AS BIGINT), $j) " +
        s"ELSE CAST(0 AS BIGINT) END")
    }.reduce(_ + _)
    val composed = th.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"), packed("sb").as("ph"), packed("sc").as("ph_hi"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(native.nonEmpty && native == composed)
  }

  test("st21: planted frame extremes — copy rejected, partial/unrelated/short admitted") {
    import spark.implicits._
    def blocks(cs: String): String = cs.map(c => c.toString * 16).mkString
    // corpus payload 1 owns frames A B C D; delta 5 is a full copy with
    // the LAST BYTE of every frame perturbed (12-vs-1 shingle majority
    // -> identical per-frame SimHash: Hamming 0, still a twin); delta
    // 10 shares one frame of four; delta 15 shares nothing (constant
    // blocks are >= 9 Hamming apart — verified at authoring); delta 20
    // is too short to carry frames (evidence-free, admitted)
    val copy = "ABCD".map(c => c.toString * 15 + "x").mkString
    val docs = Seq(
      1L -> blocks("ABCD"),
      5L -> copy,
      10L -> blocks("AXYZ"),
      15L -> blocks("PQRS"),
      20L -> "tiny"
    ).toDF("doc_id", "text")
    val idx = streaming.Streams.st21StaticIndex(spark, docs)
    try {
      val led = streaming.Streams
        .st21Ledger(docs.filter(col("doc_id") % 5 === 0), idx.hinted)
        .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(led.keySet == Set(5L, 10L, 15L, 20L))
      val full = led(5L)
      assert(full.getAs[Long]("n_frames") == 4L &&
        full.getAs[Long]("n_twin_frames") == 4L &&
        full.getAs[Long]("n_corpus_docs") == 1L &&
        !full.getAs[Boolean]("admitted"), s"full copy must be rejected: $full")
      val part = led(10L)
      assert(part.getAs[Long]("n_twin_frames") == 1L &&
        part.getAs[Double]("matched_ratio") == 0.25 &&
        part.getAs[Boolean]("admitted"), s"partial overlap admits: $part")
      val none = led(15L)
      assert(none.getAs[Long]("n_twin_frames") == 0L &&
        none.getAs[Boolean]("admitted"), s"unrelated admits clean: $none")
      val short = led(20L)
      assert(short.getAs[Long]("n_frames") == 0L &&
        short.getAs[Long]("n_twin_frames") == 0L &&
        short.getAs[Boolean]("admitted"), s"short doc is evidence-free: $short")
    } finally idx.mat.unpersist()
  }

  test("st19: streamed SimHash admission equals the batch banded form") {
    // The streaming side signs each vector with the 2·r-plane scalar
    // expression and probes the static band index per micro-batch; this
    // comparator rebuilds the LEGACY FIXED 16-plane / 2x8-bit banding
    // with plain batch frames over the same split. Agreement proves the
    // stream-static band join + complete-mode pair aggregation +
    // exact-cosine verify reproduce dd07's batch dataflow shape end to
    // end — AND (r14 verdict #1) that the adaptive dial degrades to the
    // fixed-era layout bit-exactly at small N: the fixture's corpus is
    // ≤ 4096 vectors, so a dial that failed to resolve to r = 8 would
    // diverge from this hand-frozen fixed comparator.
    val streamed = streaming.Streams.st19.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)), r.getBoolean(4))).toSeq
    import graft.operators.{Similarity => Sim}
    Sim.regDot(spark)
    val b = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        expr(Sim.sigSpark(16, "embedding")).as("sig"),
        sqrt(expr(Sim.dotExpr.format("embedding", "embedding"))).as("nrm"))
    def banded(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("embedding"), col("nrm"), col("sig"),
        explode(expr("sequence(0, 1)")).as("k"))
      .withColumn("band", expr("shiftright(sig, 8 * CAST(k AS INT)) & 255L"))
    val inc = banded(b.filter(col("vec_id") % 5 === 0))
      .select(col("vec_id").as("incoming_id"), col("embedding").as("ie"),
        col("nrm").as("inrm"), col("k"), col("band"))
    val corp0 = banded(b.filter(col("vec_id") % 5 =!= 0))
      .select(col("vec_id").as("corpus_id"), col("embedding").as("ce"),
        col("nrm").as("cnrm"), col("k"), col("band"))
    // mirror st19's static-side stop-band prune (df > max(100, N/8) —
    // a no-op on this fixture, mirrored so the comparator stays honest
    // if the fixture ever grows a hot band)
    val nCorp = corp0.filter(col("k") === 0).count()
    val stop = corp0.groupBy("k", "band").agg(count(lit(1)).as("bdf"))
      .filter(col("bdf") > greatest(lit(100.0), lit(nCorp / 8.0)))
      .select("k", "band")
    val corp = corp0.join(stop, Seq("k", "band"), "left_anti")
    val batch = inc.join(corp, Seq("k", "band"))
      .withColumn("cos",
        expr(Sim.dotExpr.format("ie", "ce")) / (col("inrm") * col("cnrm")))
      .groupBy("incoming_id", "corpus_id")
      .agg(count(lit(1)).as("shared_bands"), max(col("cos")).as("cos_sim"))
      .select(col("incoming_id"), col("corpus_id"), col("shared_bands"),
        col("cos_sim"), (col("cos_sim") >= 0.35).as("is_neardup"))
      .orderBy("incoming_id", "corpus_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)), r.getBoolean(4))).toSeq
    assert(streamed.nonEmpty, "fixture should produce at least one candidate pair")
    assert(streamed == batch)
  }

  test("st19: adaptive band width widens past 4096 and copies still collide") {
    // r14 verdict #1 at the index level: 4500 corpus vectors push the
    // dial to r = 9; the widened layout must (a) shrink the unrelated
    // candidate volume vs a forced r = 8 layout on the SAME corpus and
    // (b) keep an exact duplicate colliding on BOTH bands — identical
    // embeddings sign identically at any width, so dedup recall can
    // never be dialed away.
    val n = 5625L // ids 0..5624: 4500 corpus (%5 != 0), 1125 delta
    // murmur3-mixed components: sinusoids of the id are CORRELATED
    // across vectors and concentrate the sign signatures into hot bands
    val base = spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), " +
        "i -> CAST((hash(id, i) % 1000) / 1000.0 AS FLOAT))")
        .as("embedding"))
    // plant one delta-side exact copy of corpus vector 1
    val dup = base.filter(col("vec_id") === 1L)
      .select(lit(5630L).as("vec_id"), col("embedding"))
    val eb = base.union(dup)
    val St19 = streaming.Streams.st19StaticIndex(spark, eb)
    val (idx9, r9) = (St19.hinted, St19.r)
    assert(r9 == 9, s"dial at 4500 corpus vectors should be 9, got $r9")
    val St8 = streaming.Streams.st19StaticIndex(spark, eb, Some(8))
    val (idx8, r8) = (St8.hinted, St8.r)
    assert(r8 == 8)
    // every band fits its r-bit window; 2 bands per corpus vector
    val mx9 = idx9.agg(max("band"), count(lit(1))).head()
    assert(mx9.getLong(0) < (1L << 9) && mx9.getLong(1) == 2 * 4500L)
    def candidates(r: Int, idx: org.apache.spark.sql.DataFrame) =
      streaming.Streams
        .st19Banded(eb.filter(col("vec_id") % 5 === 0), r,
          "incoming_id", "ie", "inrm")
        .join(idx, Seq("k", "band"))
        .select("incoming_id", "corpus_id")
    val c9 = candidates(9, idx9).count()
    val c8 = candidates(8, idx8).count()
    assert(c9 < c8, s"wider bands must shrink candidates: r9=$c9 vs r8=$c8")
    // the planted duplicate collides on both bands at the wide layout
    val dupBands = candidates(9, idx9)
      .filter(col("incoming_id") === 5630L && col("corpus_id") === 1L)
      .count()
    assert(dupBands == 2L, s"exact copy should share both 9-bit bands, got $dupBands")
  }

  test("st19: wide 4-band lane layout past the clamp keeps twins colliding") {
    // the beyond-clamp lever, forced at small N (the dial itself only
    // crosses at 2^19 index vectors): r = 20 signs all 120 planes into
    // two words and bands four 30-bit lanes — 4 index rows per corpus
    // vector, every band inside its 20-bit window, and an exact
    // delta-side copy still collides on ALL FOUR bands (identical
    // embeddings sign identically at any width/mode)
    val base = spark.range(100L).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), " +
        "i -> CAST((hash(id, i) % 1000) / 1000.0 AS FLOAT))")
        .as("embedding"))
    val dup = base.filter(col("vec_id") === 1L)
      .select(lit(105L).as("vec_id"), col("embedding"))
    val eb = base.union(dup)
    val i20 = streaming.Streams.st19StaticIndex(spark, eb, Some(20))
    val (idx, r) = (i20.hinted, i20.r)
    assert(r == 20)
    // 80 corpus ids (%5 != 0 among 0..99) × 4 bands, none hot enough
    // for the df > max(100, ...) prune at this size
    val mx = idx.agg(max("band"), count(lit(1))).head()
    assert(mx.getLong(0) < (1L << 20) && mx.getLong(1) == 4 * 80L,
      s"got band=${mx.getLong(0)} rows=${mx.getLong(1)}")
    val dupBands = streaming.Streams
      .st19Banded(eb.filter(col("vec_id") % 5 === 0), 20,
        "incoming_id", "ie", "inrm")
      .join(idx, Seq("k", "band"))
      .filter(col("incoming_id") === 105L && col("corpus_id") === 1L)
      .count()
    assert(dupBands == 4L, s"exact copy should share all 4 wide bands, got $dupBands")
  }

  test("st20: streamed IVF-cell admission equals the batch form and ss15's delta") {
    import graft.operators.{Similarity => Sim}
    Sim.regDot(spark)
    val streamed = streaming.Streams.st20.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
      .toSeq
    val (km, pq) = Sim.epochModels(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val index = Sim.ivfpqIndexFrame(km, pq, emb.filter(col("vec_id") % 5 =!= 0))
    val batch = Sim.ivfCellAdmission(
      emb.filter(col("vec_id") % 5 === 0), index, km)
    val batchRows = batch.orderBy("vec_id").collect()
    assert(streamed.nonEmpty, "fixture should emit one row per delta vector")
    // stream ≡ batch through the shared kernel (the st19 idiom): the
    // streaming plan (stream-static left-outer join + complete-mode
    // aggregation) must reproduce the batch dataflow bit-for-bit
    assert(streamed == batchRows
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
      .toSeq)
    // admissions cross-checked against ss15's emitted index delta: the
    // same epoch, nprobe, ADC scoring, and 0.6 cut — a vector st20
    // admits is exactly a vector ss15 commits index rows for
    val (_, indexDelta) =
      Sim.incrementalIvfpqIndex(spark, emb, km, pq)
    val ss15Admitted = indexDelta.select("vec_id").collect().map(_.getLong(0)).toSet
    val st20Admitted = batchRows.filter(_.getBoolean(4)).map(_.getLong(0)).toSet
    assert(st20Admitted == ss15Admitted)
    // plan lock: banded equi-join only — never delta×corpus
    val plan = batch.queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("cartesianproduct") &&
      !plan.contains("broadcastnestedloopjoin"),
      s"unexpected cartesian in st20 plan:\n$plan")
  }

  test("st18: streamed quota admission equals the batch row_number form") {
    val streamed = streaming.Streams.st18.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), date_trunc("day", col("ts")))
      .orderBy("ts", "event_id")
    val batch = Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("day", col("ts")).as("window_start"),
        col("event_id"), row_number().over(w).as("rn"))
      .groupBy("user_id", "window_start")
      .agg(sum(when(col("rn") <= 2, 1L).otherwise(0L)).as("n_admitted"),
        sum(when(col("rn") > 2, 1L).otherwise(0L)).as("n_rejected"),
        max(when(col("rn") <= 2, col("event_id"))).as("max_admitted_event"))
      .orderBy("user_id", "window_start")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(streamed.exists(_._4 > 0L),
      "fixture should exercise the rejection path")
    assert(streamed == batch)
  }

  test("mm04: batch inference is partitioning-independent") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    def infer(df: org.apache.spark.sql.DataFrame) = {
      val ds = df.as[(Long, String)]
      ds.mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        // micro-batch boundary (7 here vs 32 in mm04) must not affect results
        it.grouped(7).flatMap(b => multimodal.Multimodal.predictBatchForTest(md, b))
      }.collect().sortBy(_.doc_id).toSeq
    }
    val one = infer(docs.repartition(1))
    val many = infer(docs.repartition(13))
    assert(one == many && one.nonEmpty)
    // and matches the declared query's rows
    val declared = SparkEntry.queries("mm04_batch_inference")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(declared == one.map(e => (e.doc_id, e.emb, e.l2sq)))
  }

  test("mm01/mm03: stub decode is deterministic and consistent") {
    val a = multimodal.Multimodal.mm01.fn(spark, sf).collect()
    val b = multimodal.Multimodal.mm01.fn(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    val stats = multimodal.Multimodal.mm03.fn(spark, sf).collect()
    assert(stats.map(_.getString(0)).toSet.subsetOf(Set("png", "jpeg")))
    assert(stats.map(_.getLong(1)).sum == a.length)
  }

  test("mm07: perceptual admission on planted payload extremes") {
    val s = spark
    import s.implicits._
    // 16-char tile pieces so tile boundaries are exact by construction
    def payload(tag: Char, fill: String) =
      (1 to 5).map(i => f"$tag$i%02d-$fill").mkString // 5 tiles, 80 chars
    val A = payload('t', "abcdefghijkl")
    val B = payload('u', "mnopqrstuvwx")
    val C = payload('w', "yzabcdefghij")
    assert(A.length == 80 && A.substring(0, 16).length == 16)
    val docs = Seq(
      (1L, A),            // corpus original
      (2L, B),            // corpus unrelated
      (5L, A),            // delta exact copy -> Hamming 0 vs corpus
      (10L, A + "tail"),  // appended tail: full-tile set UNCHANGED ->
                          // Hamming 0 by construction (the perceptual
                          // robustness a byte-hash dedup cannot give)
      (15L, C),           // delta unrelated -> admitted
      (20L, "tiny"),      // < one tile: outside the fingerprint domain
      (25L, A)            // second delta copy: batch evidence too
    ).toDF("doc_id", "text")
    val got = multimodal.Multimodal.perceptualAdmission(spark, docs)
    val rows = got.collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getBoolean(3), r.getLong(4))))
      .toMap
    assert(rows.keySet == Set(5L, 10L, 15L, 25L), s"got ${rows.keySet}")
    // exact copy: corpus Hamming 0; nothing lower in the batch
    assert(rows(5L) == ((0, 99, false, 0L)), s"got ${rows.get(5L)}")
    // tail-appended payload: tile set identical -> Hamming 0 both ways
    assert(rows(10L) == ((0, 0, false, 0L)), s"got ${rows.get(10L)}")
    assert(rows(25L) == ((0, 0, false, 0L)), s"got ${rows.get(25L)}")
    // unrelated payload: no candidate within 6 bits -> admitted, 4 band
    // rows committed (md5-random fingerprints sit ~16 bits apart; the
    // value is deterministic, only the >6 relation is asserted)
    val (c15, b15, adm15, idx15) = rows(15L)
    assert(c15 > 6 && b15 > 6 && adm15 && idx15 == 4L, s"got ${rows(15L)}")
    // decision consistency on every row
    rows.foreach { case (id, (c, b, adm, idx)) =>
      assert(adm == (c > 6 && b > 6) && idx == (if (adm) 4L else 0L),
        s"inconsistent decision for $id: ${rows(id)}")
    }
    // plan shape: banded equi-joins only — never corpus²
    val plan = got.queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("cartesianproduct") &&
      !plan.contains("broadcastnestedloopjoin"),
      s"unexpected cartesian in mm07 plan:\n$plan")
  }

  test("mm07: adaptive band width degrades to the fixed 8-bit layout at small N") {
    // r14 verdict #1: the dial r = simhashBits(N) resolves to 8 for
    // every N <= 4096, where the band masks (ph >> 8k) & 255 and the
    // low-32-bit Hamming window are bit-identical to the fixed-band
    // era — pinned here as full-frame equality between the dialed run
    // and a forced r = 8 run on the planted-extremes fixture (plus the
    // dial values themselves at the clamp edges).
    assert(operators.Similarity.simhashBits(7L) == 8)
    assert(operators.Similarity.simhashBits(4096L) == 8)
    assert(operators.Similarity.simhashBits(4097L) == 9)
    assert(operators.Similarity.simhashBits(150000L) == 14)
    assert(operators.Similarity.simhashBits(Long.MaxValue / 2) == 15)
    // the beyond-clamp chain: equal to the legacy dial through 2^19
    // (so the wide layout can never activate at a graded scale), then
    // climbing to 30 — the mode boundary is exactly the old clamp
    for (n <- Seq(7L, 4096L, 4097L, 150000L, 1L << 19))
      assert(operators.Similarity.simhashBitsWide(n) ==
        operators.Similarity.simhashBits(n), s"wide dial moved at n=$n")
    assert(operators.Similarity.simhashBitsWide(1L << 19) == 15)
    assert(operators.Similarity.simhashBitsWide((1L << 19) + 1) == 16)
    assert(operators.Similarity.simhashBitsWide(1L << 34) == 30)
    assert(operators.Similarity.simhashBitsWide(Long.MaxValue / 2) == 30)
    val s = spark
    import s.implicits._
    def payload(tag: Char, fill: String) =
      (1 to 5).map(i => f"$tag$i%02d-$fill").mkString
    val docs = Seq(
      (1L, payload('t', "abcdefghijkl")), (2L, payload('u', "mnopqrstuvwx")),
      (5L, payload('t', "abcdefghijkl")), (15L, payload('w', "yzabcdefghij")),
      (25L, payload('t', "abcdefghijkl"))).toDF("doc_id", "text")
    val dialed = multimodal.Multimodal.perceptualAdmission(spark, docs)
      .collect().map(_.toSeq).toSeq
    val fixed8 = multimodal.Multimodal
      .perceptualAdmission(spark, docs, forceBandBits = Some(8))
      .collect().map(_.toSeq).toSeq
    assert(dialed == fixed8)
  }

  test("mm07: copies and tail-appends stay convicted at every dial point") {
    // widening the bands loses per-band recall on NEAR misses by
    // design (LSH), but a Hamming-0 twin shares EVERY band at any
    // width — the conviction that matters for dedup can never be
    // dialed away; the low-32-bit Hamming report is width-invariant.
    // r = 20 and r = 30 force the WIDE mode (4 × 30-bit lanes of the
    // 120-bit fingerprint): identical payloads mint identical ph AND
    // ph_hi, so the invariant crosses the mode boundary too.
    val s = spark
    import s.implicits._
    def payload(tag: Char, fill: String) =
      (1 to 5).map(i => f"$tag$i%02d-$fill").mkString
    val A = payload('t', "abcdefghijkl")
    val docs = Seq(
      (1L, A), (2L, payload('u', "mnopqrstuvwx")),
      (5L, A),           // delta exact copy
      (10L, A + "tail"), // tile set unchanged -> Hamming 0
      (15L, payload('w', "yzabcdefghij"))).toDF("doc_id", "text")
    for (r <- Seq(10, 15, 20, 30)) {
      val rows = multimodal.Multimodal
        .perceptualAdmission(spark, docs, forceBandBits = Some(r))
        .collect()
        .map(x => x.getLong(0) ->
          ((x.getInt(1), x.getInt(2), x.getBoolean(3)))).toMap
      assert(rows(5L)._1 == 0 && !rows(5L)._3, s"r=$r: ${rows(5L)}")
      assert(rows(10L)._1 == 0 && !rows(10L)._3, s"r=$r: ${rows(10L)}")
      val (c15, b15, adm15) = rows(15L)
      assert(c15 > 6 && b15 > 6 && adm15, s"r=$r: ${rows(15L)}")
    }
  }

  test("dd17: cross-modality consistency classifies planted extremes") {
    // the modality matrix's off-diagonal: byte-exact copies are twins
    // in BOTH modalities (consistent), a tail-append is a perceptual
    // twin whose TEXT fingerprint differs (the quarantine case), and
    // unrelated payloads are never twins. Same invariants in narrow
    // mode (dialed r = 8 at this N) and forced-wide mode (r = 20, the
    // 4x30-bit-lane layout): identical tile sets mint identical
    // ph/ph_hi, so the twin structure crosses the mode boundary.
    val s = spark
    import s.implicits._
    def payload(tag: Char, fill: String) =
      (1 to 5).map(i => f"$tag$i%02d-$fill").mkString
    val A = payload('t', "abcdefghijkl")
    val docs = Seq(
      (1L, A), (2L, payload('u', "mnopqrstuvwx")),
      (5L, A),           // byte-exact copy of 1 -> consistent twin
      (10L, A + "tail"), // tile set unchanged, text differs -> SUSPECT
      (15L, payload('w', "yzabcdefghij"))).toDF("doc_id", "text")
    for (force <- Seq(None, Some(20))) {
      val got = multimodal.Multimodal.crossmodalConsistency(spark, docs, force)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getBoolean(5))))
        .toMap
      // the planted trio: 1-5 consistent, 1-10 and 5-10 suspect
      def core(id: Long) = { val (_, tw, cons, susp, flag) = got(id); (tw, cons, susp, flag) }
      assert(core(1L) == ((2L, 1L, 1L, true)), s"force=$force: ${got.get(1L)}")
      assert(core(5L) == ((2L, 1L, 1L, true)), s"force=$force: ${got.get(5L)}")
      assert(core(10L) == ((2L, 0L, 2L, true)), s"force=$force: ${got.get(10L)}")
      // anything else that surfaced rode a chance band collision: never
      // a twin, never suspect; and the counts stay internally consistent
      got.foreach { case (id, (cand, tw, cons, susp, flag)) =>
        if (!Set(1L, 5L, 10L).contains(id))
          assert(tw == 0L && !flag, s"force=$force id=$id: ${got(id)}")
        assert(cons + susp == tw && tw <= cand && flag == (susp > 0),
          s"force=$force id=$id inconsistent: ${got(id)}")
      }
    }
  }

  test("mm07: stop-band prune starves a hot perceptual band of evidence") {
    // The r13 verdict's hot-band extreme: 150 corpus payloads with
    // IDENTICAL content (the black-frame / constant-fill case) share all
    // 4 perceptual bands, so every band has standing-index df 150 >
    // max(100, 151/8) and is pruned. Without the prune this fixture
    // emits ~150² candidate pairs per band AND a delta copy of the hot
    // payload is rejected on corpus evidence; with it, the hot bands
    // carry no evidence (dd16's boilerplate-admission semantics) while
    // sub-threshold bands still convict — expectations below are pinned
    // by the mirrored DuckDB oracle run on this exact fixture.
    val s = spark
    import s.implicits._
    def payload(tag: Char, fill: String) =
      (1 to 5).map(i => f"$tag$i%02d-$fill").mkString
    val A = payload('t', "abcdefghijkl") // the hot payload
    val B = payload('u', "mnopqrstuvwx") // normal corpus payload
    val C = payload('w', "yzabcdefghij") // delta-only payload
    val corpusIds = (1 to 400).filter(_ % 5 != 0).take(150).map(_.toLong)
    val docs = (corpusIds.map(_ -> A) ++ Seq(
      401L -> B,  // corpus normal (df 1 bands)
      500L -> A,  // delta copy of the HOT payload
      510L -> B,  // delta copy of the normal payload
      515L -> C,  // delta-only payload, no lower twin
      525L -> C   // its higher-id twin: batch evidence via normal bands
    )).toDF("doc_id", "text")
    val got = multimodal.Multimodal.perceptualAdmission(spark, docs)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getBoolean(3), r.getLong(4))))
      .toMap
    assert(got.keySet == Set(500L, 510L, 515L, 525L), s"got ${got.keySet}")
    // hot-payload copy: all 4 bands pruned -> zero evidence -> ADMITTED
    assert(got(500L) == ((99, 99, true, 4L)), s"got ${got(500L)}")
    // normal-payload copy: its df-1 bands survive -> convicted on corpus
    assert(got(510L) == ((0, 99, false, 0L)), s"got ${got(510L)}")
    // C collides with B on one surviving band (Hamming 12 — md5-fixed):
    // far, so admitted; its twin 525 is convicted on batch Hamming 0
    assert(got(515L) == ((12, 12, true, 4L)), s"got ${got(515L)}")
    assert(got(525L) == ((12, 0, false, 0L)), s"got ${got(525L)}")
  }

  test("mm08: temporal frame stats on planted extremes") {
    // planted payloads built from 16-char frames; every expectation
    // below is md5-pinned (deltas: one-char perturbation = 2, X↔Y = 15,
    // Y↔Z = 10 — the mid band that is neither frozen nor a cut)
    val s = spark
    import s.implicits._
    val X = "AAAABBBBCCCCDDDD"
    val Xp = "AAAABBBBCCCCDDDE" // one char changed -> frozen step (2)
    val Y = "WXYZWXYZWXYZWXYZ"
    val Z = "0123456789abcdef"
    val docs = Seq(
      (1L, X * 6),         // frozen payload: 5 static deltas
      (2L, X * 3 + Y * 3), // one hard scene cut mid-stream
      (3L, X + Xp + Y),    // perturbed frame then a cut
      (4L, X + Y + Z + X), // deltas 15, 10, 15: cuts at >10 only
      (5L, X)              // single frame: no deltas -> excluded
    ).toDF("doc_id", "text")
    val got = multimodal.Multimodal.temporalFrameStats(spark, docs)
    val rows = got.collect().map(r => r.getLong(0) ->
      ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getBoolean(6)))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L), s"got ${rows.keySet}")
    assert(rows(1L) == ((6, 0L, 5L, 5L, 1.0, true)), s"got ${rows(1L)}")
    assert(rows(2L) == ((6, 1L, 4L, 2L, 0.8, true)), s"got ${rows(2L)}")
    assert(rows(3L) == ((3, 1L, 1L, 1L, 0.5, true)), s"got ${rows(3L)}")
    assert(rows(4L) == ((4, 2L, 0L, 0L, 0.0, false)), s"got ${rows(4L)}")
    // plan shape: per-document windows only — an unpartitioned window
    // would plan an Exchange SinglePartition and serialize the corpus
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition") &&
      !plan.toLowerCase.contains("cartesianproduct"),
      s"mm08 must stay embarrassingly parallel:\n$plan")
  }

  test("mm06: interleaved packing equals a sequential driver-side packer") {
    val out = multimodal.Multimodal.mm06.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // sequential re-derivation: walk docs in doc_id order, interleave
    // [vision][text], slice at 2048 — completely independent of the
    // distributed prefix-sum/explode dataflow under test
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        expr("CAST(16 * ((1 + n_chars % 120 + 4) div 5) AS BIGINT)").as("vt"),
        size(split(col("text"), " ")).cast("long").as("tt"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val B = 2048L
    case class Bin(var nDocs: Long = 0, var starting: Long = 0,
      var vision: Long = 0, var text: Long = 0)
    val bins = scala.collection.mutable.LinkedHashMap.empty[Long, Bin]
    var pos = 0L
    docs.foreach { case (_, vt, tt) =>
      val st = pos; val cum = pos + vt + tt
      (st / B to (cum - 1) / B).foreach { b =>
        val bin = bins.getOrElseUpdate(b, Bin())
        bin.nDocs += 1
        if (st / B == b) bin.starting += 1
        bin.vision += math.max(0L, math.min(st + vt, (b + 1) * B) - math.max(st, b * B))
        bin.text += math.max(0L, math.min(cum, (b + 1) * B) - math.max(st + vt, b * B))
      }
      pos = cum
    }
    val expected = bins.toSeq.map { case (b, v) =>
      (b, v.nDocs, v.starting, v.vision, v.text, v.vision + v.text) }
    assert(out.toSeq == expected)
    // conservation: total fill equals the total token stream
    assert(out.map(_._6).sum == docs.map(d => d._2 + d._3).sum)
    // every window except the last is exactly full
    assert(out.dropRight(1).forall(_._6 == B))
  }

  test("golden report renders the reference layout (K3 format shape)") {
    val report = GoldenReport.render(2,
      Seq(GoldenReport.BookResult(0, "A Book? The - X.txt",
        Seq(0.25, 0.75), 1, 0.75, Seq("word", "term"))),
      Seq(GoldenReport.TopicSummary(0, Seq("alpha" -> 0.5, "beta" -> 0.25),
        Seq("b1.txt", "b2.txt", "b3.txt", "b4.txt"))))
    val lines = report.linesIterator.toSeq
    assert(lines.head == "#" * 87)
    assert(lines.contains("LDA Model with 2 topics"))
    assert(lines.contains("Book's number: 0"))
    assert(lines.contains("Book's name: A Book? The - X.txt"))
    assert(lines.contains("Topics Nr. \t|\t Distribution"))
    assert(lines.contains("Nr.: 1 \t\t|\t 0.75"))
    assert(lines.contains("Main topic of the book: Topic Nr. (1), Weight (0.75)"))
    assert(lines.contains("word, term, "))
    assert(lines.contains("List of topics"))
    assert(lines.contains("TOPIC 0: top-weighted terms"))
    assert(lines.contains("alpha\t0.5"))
    assert(lines.contains("Amount of books in the topic: 4"))
    assert(lines.contains("List of Books."))
    // bare newline after every 3rd book, ", " separator otherwise; the
    // list's trailing whitespace is trimmed before the closing rule
    // (byte rule of the checked-in golden)
    assert(lines.contains("b1.txt, b2.txt, b3.txt"))
    assert(lines.contains("b4.txt,"))
  }
}
