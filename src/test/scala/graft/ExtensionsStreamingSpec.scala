package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsStreamingSpec extends AnyFunSuite {

  test("GraftExtensions injects poly_hash (builder applied to registry)") {
    // One SparkContext per JVM → can't build an isolated session here;
    // verify the injection wiring (extension populates the builder) and
    // the end-to-end value through the shared session's registry.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val spark = TestSpark.spark
    import spark.implicits._
    functions.PolyHash.register(spark)
    val got = Seq("hello world").toDF("t")
      .selectExpr("poly_hash(t)").head.getLong(0)
    var acc = 0L
    "hello world".foreach(c => acc = (acc * 31 + c) % 2147483647L)
    assert(got == acc)
  }

  test("vec_sq8: bit-identical to the HOF quantizer, null pass-through, both eval paths") {
    val spark = TestSpark.spark
    import spark.implicits._
    functions.FloatSq8.register(spark)
    val rnd = new scala.util.Random(11)
    // mixed magnitudes + sign, incl. ulp-adjacent .5-boundary values
    // where floor(x+0.5) shortcuts diverge from round()'s BigDecimal
    // HALF_UP — the exact corner the expression must reproduce
    val rows = Seq.tabulate(96) { i =>
      (i.toLong, Array.tabulate(16) { j =>
        if (j == 0) 0.49999999999999994f * (i % 3 - 1)
        else (rnd.nextGaussian() * math.pow(10, i % 5 - 2)).toFloat
      })
    } :+ (96L, Array.fill(16)(0.0f)) // all-zero vector → 1e-30 floor
    val df = rows.toDF("id", "v")
    val hof = "transform(v, x -> CAST(round(CAST(x AS DOUBLE) * 127.0D / " +
      "greatest(array_max(transform(v, y -> abs(CAST(y AS DOUBLE)))), 1e-30D)) AS BIGINT))"
    def run() = df.selectExpr("id", "vec_sq8(v) AS nat", s"$hof AS ref")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))
    run().foreach { case (id, nat, ref) =>
      assert(nat == ref, s"codes differ at id=$id: $nat vs $ref")
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try run().foreach { case (id, nat, ref) =>
      assert(nat == ref, s"interpreted codes differ at id=$id")
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // null element passes through as a null code; null array → null;
    // double input accepted; non-array rejected at analysis
    val edge = spark.sql(
      """SELECT
        |  vec_sq8(array(1.0F, CAST(NULL AS FLOAT), -2.0F)) AS with_null,
        |  vec_sq8(CAST(NULL AS ARRAY<FLOAT>)) AS null_arr,
        |  vec_sq8(array(0.5D, -1.0D)) AS dbl""".stripMargin).head
    val wn = edge.getSeq[Any](0)
    assert(wn(1) == null && wn(0) == 64L && wn(2) == -127L)
    assert(edge.isNullAt(1))
    assert(edge.getSeq[Long](2) == Seq(64L, -127L))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_sq8('a')").collect()
    }
    assert(err.getMessage.toLowerCase.contains("vec_sq8"))
  }

  test("vec_sq8 double path: genuine HALF_UP corner + NaN/Inf elements match the HOF") {
    // The float literal 0.49999999999999994f is not representable and
    // rounds to exactly 0.5f, so the float-array test above never truly
    // hits the BigDecimal-HALF_UP vs floor(x+0.5) divergence. Engineer a
    // DOUBLE vector whose SCALED value d = v*127.0/mx lands exactly on
    // the corner: with mx = 63.5 and v = 0.24999999999999997,
    // (v*127.0)/63.5 == 0.49999999999999994 in IEEE double, where
    // floor(d+0.5) = 1 (the tie in d+0.5 resolves to 1.0 by
    // round-to-even) but HALF_UP of the exact value says 0.
    val corner = 0.49999999999999994
    val v = 0.24999999999999997
    assert((v * 127.0) / 63.5 == corner, "premise: d hits the corner exactly")
    assert(math.floor(corner + 0.5) == 1.0 &&
      java.math.BigDecimal.valueOf(corner)
        .setScale(0, java.math.RoundingMode.HALF_UP).intValue() == 0,
      "premise: the two rounding semantics genuinely diverge at d")
    val spark = TestSpark.spark
    import spark.implicits._
    functions.FloatSq8.register(spark)
    val finite = Seq(
      (0L, Array(63.5, v, -v)),                        // engineered corner
      (1L, Array(corner, 0.1, -0.2)))                  // corner as max-magnitude
      .toDF("id", "v")
    // NaN poisons mx → all codes 0; Inf mx → 0s and Inf/Inf=NaN → 0;
    // Double.MaxValue*127.0 overflows to Inf → Long.MaxValue. Under the
    // ANSI default, CAST(NaN AS BIGINT) in the HOF THROWS — vec_sq8
    // deliberately keeps the legacy-cast semantics (NaN→0,
    // ±Inf→Long.Min/MaxValue) so one bad element can't fail the job.
    val nonFinite = Seq(
      (2L, Array(Double.NaN, 1.0, -2.0)),
      (3L, Array(Double.PositiveInfinity, 3.0)),
      (4L, Array(-1.0, Double.NegativeInfinity)),
      (5L, Array(Double.MaxValue, 1.0)))
      .toDF("id", "v")
    val hof = "transform(v, x -> CAST(round(x * 127.0D / " +
      "greatest(array_max(transform(v, y -> abs(y))), 1e-30D)) AS BIGINT))"
    def run(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("id", "vec_sq8(v) AS nat", s"$hof AS ref")
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))
    def check(df: org.apache.spark.sql.DataFrame, tag: String) = {
      val got = run(df)
      got.foreach { case (id, nat, ref) =>
        assert(nat == ref, s"$tag codes differ at id=$id: $nat vs $ref")
      }
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      try run(df).foreach { case (id, nat, ref) =>
        assert(nat == ref, s"interpreted $tag codes differ at id=$id")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
      got
    }
    val gotF = check(finite, "finite")
    // the corner element really took the HALF_UP branch (code 0, not 1)
    assert(gotF.find(_._1 == 0L).get._2(1) == 0L)
    // vec_sq8 survives non-finite elements even under ANSI (the HOF throws)
    val ansiCodes = nonFinite.selectExpr("id", "vec_sq8(v) AS nat").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(ansiCodes(2L) == Seq(0L, 0L, 0L))
    assert(ansiCodes(5L)(0) == Long.MaxValue)
    intercept[Exception] { nonFinite.selectExpr(s"$hof AS ref").collect() }
    // and is bit-identical to the HOF under the legacy cast
    val ansi0 = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try check(nonFinite, "non-finite")
    finally spark.conf.set("spark.sql.ansi.enabled", ansi0)
  }

  test("shingle_hashes: set-identical to the exploded md5 SQL form; sorted_intersect_count = array_intersect") {
    val spark = TestSpark.spark
    import spark.implicits._
    functions.ShingleHashes.register(spark)
    functions.SortedIntersectCount.register(spark)
    val rnd = new scala.util.Random(5)
    val vocab = "batch part spark line column order small sort αβγ 漢字 a".split(" ")
    val edge = Seq("", "one", "one two", "a  b c", " lead", "trail ",
      "a b c", "x y z x y z x y z")              // dup shingles → distinct
    val texts = edge ++ Seq.tabulate(200)(_ =>
      Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // oracle: the exploded form shinglesOf used before the fused kernel
    val sqlForm = df
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(
        expr("transform(sequence(0, size(t)-3), i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))")).as("s"))
      .select(col("doc_id"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("h"))
      .distinct()
      .groupBy("doc_id").agg(sort_array(collect_list("h")).as("hs"))
    val fused = df.selectExpr("doc_id", "sort_array(shingle_hashes(text)) AS hs")
      .filter(size(col("hs")) > 0)
    val joined = fused.as("f").join(sqlForm.as("o"), "doc_id")
      .selectExpr("doc_id", "f.hs = o.hs AS same").collect()
    assert(joined.length == sqlForm.count() && joined.length == fused.count())
    joined.foreach(r => assert(r.getBoolean(1), s"doc ${r.getLong(0)} differs"))
    // the gram-size arg (dd09's 8-gram decontamination path): same
    // set-parity against the exploded form at n = 8
    val sqlForm8 = df
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"), explode(
        expr("transform(sequence(0, size(t)-8), i -> concat_ws(' ', slice(t, i+1, 8)))")).as("s"))
      .select(col("doc_id"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("h"))
      .distinct()
      .groupBy("doc_id").agg(sort_array(collect_list("h")).as("hs"))
    val fused8 = df.selectExpr("doc_id", "sort_array(shingle_hashes(text, 8)) AS hs")
      .filter(size(col("hs")) > 0)
    val joined8 = fused8.as("f").join(sqlForm8.as("o"), "doc_id")
      .selectExpr("doc_id", "f.hs = o.hs AS same").collect()
    assert(joined8.length == sqlForm8.count() && joined8.length == fused8.count())
    joined8.foreach(r => assert(r.getBoolean(1), s"8-gram doc ${r.getLong(0)} differs"))
    // shingle_stats (dd11's per-doc postings kernel): struct-for-struct
    // equal to exploding every span and aggregating GROUP BY (doc, h)
    functions.ShingleStats.register(spark)
    val statsSql = df
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"), col("t"), explode(expr("sequence(0, size(t)-8)")).as("pos"))
      .withColumn("h", conv(substring(md5(
        expr("concat_ws(' ', slice(t, pos+1, 8))")), 1, 15), 16, 10).cast("long"))
      .groupBy("doc_id", "h")
      .agg(count(lit(1)).as("cnt"), min("pos").cast("int").as("pos"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct("h", "cnt", "pos"))).as("gs"))
    val statsFused = df.selectExpr("doc_id",
        "sort_array(shingle_stats(text, 8)) AS gs")
      .filter(size(col("gs")) > 0)
    val js = statsFused.as("f").join(statsSql.as("o"), "doc_id")
      .selectExpr("doc_id", "f.gs = o.gs AS same").collect()
    assert(js.length == statsSql.count() && js.length == statsFused.count())
    js.foreach(r => assert(r.getBoolean(1), s"stats doc ${r.getLong(0)} differs"))
    // minhash_sigs (st14's signature kernel): bit-identical to the
    // scalar HOF chain — per-doc distinct shingle hashes, then per
    // component i the MIN md5('i:' || h) hex string
    functions.MinHashSigs.register(spark)
    val sigSql = df
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .withColumn("shs", expr(
        """array_distinct(transform(sequence(0, size(t)-3),
          |  i -> CAST(conv(substring(md5(concat(t[i], ' ', t[i+1], ' ', t[i+2])), 1, 15), 16, 10) AS BIGINT)))""".stripMargin))
      .select(col("doc_id") +: (0 to 7).map { i =>
        expr(s"array_min(transform(shs, h -> md5(concat('$i:', CAST(h AS STRING)))))").as(s"m$i")
      }: _*)
    val sigFused = df.selectExpr("doc_id", "minhash_sigs(text, 8) AS ms")
      .filter(size(col("ms")) > 0)
    val jm = sigFused.as("f").join(sigSql.as("o"), "doc_id")
      .selectExpr("doc_id",
        (0 to 7).map(i => s"f.ms[$i] = o.m$i").mkString(" AND ") + " AS same")
      .collect()
    assert(jm.length == sigSql.count() && jm.length == sigFused.count())
    jm.foreach(r => assert(r.getBoolean(1), s"minhash doc ${r.getLong(0)} differs"))
    // merge-walk intersection count vs array_intersect on sorted distinct arrays
    val pairs = Seq.tabulate(300) { i =>
      def arr() = rnd.shuffle((0L to 40L).toList).take(rnd.nextInt(12)).sorted.toArray
      (i.toLong, arr(), arr())
    }.toDF("id", "a", "b")
    pairs.selectExpr("id", "sorted_intersect_count(a, b) AS mw",
        "CAST(size(array_intersect(a, b)) AS BIGINT) AS ai")
      .collect().foreach(r =>
        assert(r.getLong(1) == r.getLong(2), s"pair ${r.getLong(0)}: ${r.getLong(1)} vs ${r.getLong(2)}"))
  }

  test("top_k_vals: equals the window form's top-k value slice, partitioning-independent") {
    val spark = TestSpark.spark
    import spark.implicits._
    functions.TopKVals.register(spark)
    val rnd = new scala.util.Random(7)
    // duplicate values force the (value DESC, id ASC) tie-break to matter
    val rows = Seq.tabulate(500)(i =>
      (i % 13, rnd.nextInt(20).toDouble, i.toLong))
    def run(parts: Int) = rows.toDF("k", "v", "id").repartition(parts)
      .groupBy("k").agg(expr("top_k_vals(v, id, 4)").as("ks"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toList).toMap
    val got = run(3)
    // oracle: window rank by (v DESC, id ASC), take first 4 values
    val want = rows.groupBy(_._1).map { case (k, g) =>
      k -> g.sortBy { case (_, v, id) => (-v, id) }.take(4).map(_._2).toList
    }
    assert(got == want)
    assert(run(17) == got, "result must not depend on partitioning")
  }

  test("top_k_ids: widening casts in the builder, analysis-time type check") {
    val spark = TestSpark.spark
    import spark.implicits._
    functions.TopKIds.register(spark)
    val df = Seq((1, 10, 101L), (1, 30, 103L), (1, 20, 102L), (2, 5, 201L))
      .toDF("k", "v", "id")
    // INT value column widens via the builder's implicit cast
    val got = df.groupBy("k").agg(expr("top_k_ids(v, id, 2)").as("top"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toList).toMap
    assert(got == Map(1 -> List(103L, 102L), 2 -> List(201L)))
    // non-numeric value column is rejected during analysis, not mid-job
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("a", 1L)).toDF("s", "id")
        .agg(expr("top_k_ids(s, id, 1)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("top_k_ids"))
  }

  test("top_k_ids/top_k_vals: total order under NaN — NaN-first, partitioning-independent") {
    // A primitive `>` comparator is not total under NaN (NaN never beats
    // and is never beaten), which made the winner insertion-order
    // dependent. java.lang.Double.compare = Spark's sort semantics: NaN
    // is greatest, so under (value DESC, id ASC) a NaN row ranks FIRST —
    // the same order the old row_number window produced.
    val spark = TestSpark.spark
    import spark.implicits._
    functions.TopKIds.register(spark)
    functions.TopKVals.register(spark)
    val rows = Seq(
      (1, 5.0, 10L), (1, Double.NaN, 11L), (1, 7.0, 12L), (1, Double.NaN, 13L),
      (2, Double.NaN, 20L), (2, Double.NaN, 21L),                // all-NaN group
      (3, Double.NegativeInfinity, 30L), (3, 1.0, 31L))
    def run(parts: Int) = rows.toDF("k", "v", "id").repartition(parts)
      .groupBy("k")
      .agg(expr("top_k_ids(v, id, 2)").as("ids"), expr("top_k_vals(v, id, 2)").as("vs"))
      .collect().map(r => r.getInt(0) ->
        // NaN != NaN under Scala ==, so compare values as raw bits
        ((r.getSeq[Long](1).toList,
          r.getSeq[Double](2).toList.map(java.lang.Double.doubleToLongBits)))).toMap
    val got = run(1)
    assert(got(1)._1 == List(11L, 13L))            // NaNs first, id ASC tie-break
    assert(got(1)._2.forall(b => java.lang.Double.longBitsToDouble(b).isNaN))
    assert(got(2)._1 == List(20L, 21L))            // all-NaN group: no null ids
    assert(got(3)._1 == List(31L, 30L))            // -Inf ranks last
    (2 to 5).foreach(p => assert(run(p) == got, s"parts=$p diverged"))
  }

  test("vec_dot: bit-identical to the HOF form, null semantics, both eval paths") {
    val spark = TestSpark.spark
    import spark.implicits._
    functions.FloatDot.register(spark)
    // seeded irregular floats — exercises float→double widening order
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(64) { i =>
      (i.toLong,
        Array.fill(16)((rnd.nextGaussian() * 1e3).toFloat),
        Array.fill(16)((rnd.nextGaussian() * 1e-3).toFloat))
    }
    val df = rows.toDF("id", "a", "b")
    val hof = "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    def run() = df.selectExpr("id", s"vec_dot(a, b) AS nat", s"$hof AS ref")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // codegen path (default) — exact == : same left-to-right IEEE chain
    run().foreach { case (_, nat, ref) =>
      assert(java.lang.Double.doubleToLongBits(nat) == java.lang.Double.doubleToLongBits(ref))
    }
    // interpreted path (nullSafeEval) must agree bit-for-bit too
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try run().foreach { case (_, nat, ref) =>
      assert(java.lang.Double.doubleToLongBits(nat) == java.lang.Double.doubleToLongBits(ref))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // null semantics match the HOF form: length mismatch → NULL (zip_with
    // pads with null), a null element → NULL, empty arrays → 0.0
    val edge = spark.sql(
      """SELECT
        |  vec_dot(array(1.0F, 2.0F), array(1.0F)) AS len_mismatch,
        |  vec_dot(array(1.0F, CAST(NULL AS FLOAT)), array(1.0F, 2.0F)) AS null_elem,
        |  vec_dot(CAST(NULL AS ARRAY<FLOAT>), array(1.0F)) AS null_arr,
        |  vec_dot(CAST(array() AS ARRAY<FLOAT>), CAST(array() AS ARRAY<FLOAT>)) AS empty,
        |  vec_dot(array(1.0D, 0.5D), array(2.0D, 4.0D)) AS dbl""".stripMargin).head
    assert(edge.isNullAt(0) && edge.isNullAt(1) && edge.isNullAt(2))
    assert(edge.getDouble(3) == 0.0 && edge.getDouble(4) == 4.0)
    // non-array args rejected at analysis, named in the message
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dot('a', 'b')").collect()
    }
    assert(err.getMessage.toLowerCase.contains("vec_dot"))
  }

  test("vec_l2sq: bit-identical to the HOF squared-distance form, null semantics, both eval paths") {
    val spark = TestSpark.spark
    import spark.implicits._
    functions.FloatL2.register(spark)
    // float query vs DOUBLE centroid — the exact shape of the IVF probe
    // path (embedding ARRAY<FLOAT> against a literal centroid ARRAY<DOUBLE>)
    val rnd = new scala.util.Random(43)
    val rows = Seq.tabulate(64) { i =>
      (i.toLong,
        Array.fill(16)((rnd.nextGaussian() * 1e3).toFloat),
        Array.fill(16)(rnd.nextGaussian() * 1e-3))
    }
    val df = rows.toDF("id", "a", "b")
    val hof = "aggregate(zip_with(a, b, (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    def run() = df.selectExpr("id", s"vec_l2sq(a, b) AS nat", s"$hof AS ref")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    run().foreach { case (_, nat, ref) =>
      assert(java.lang.Double.doubleToLongBits(nat) == java.lang.Double.doubleToLongBits(ref))
    }
    // interpreted path (nullSafeEval) must agree bit-for-bit too
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try run().foreach { case (_, nat, ref) =>
      assert(java.lang.Double.doubleToLongBits(nat) == java.lang.Double.doubleToLongBits(ref))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // vec_l2sq(a, b) ≡ vec_dot(a−b, a−b): same Σ(x−y)² left-to-right chain
    functions.FloatDot.register(spark)
    df.selectExpr("vec_l2sq(a, b) AS l2",
        "vec_dot(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) - y), zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) - y)) AS dd")
      .collect().foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
      }
    val edge = spark.sql(
      """SELECT
        |  vec_l2sq(array(1.0F, 2.0F), array(1.0F)) AS len_mismatch,
        |  vec_l2sq(array(1.0F, CAST(NULL AS FLOAT)), array(1.0F, 2.0F)) AS null_elem,
        |  vec_l2sq(CAST(NULL AS ARRAY<FLOAT>), array(1.0F)) AS null_arr,
        |  vec_l2sq(CAST(array() AS ARRAY<FLOAT>), CAST(array() AS ARRAY<FLOAT>)) AS empty,
        |  vec_l2sq(array(1.0D, 0.5D), array(2.0D, 4.0D)) AS dbl""".stripMargin).head
    assert(edge.isNullAt(0) && edge.isNullAt(1) && edge.isNullAt(2))
    assert(edge.getDouble(3) == 0.0 && edge.getDouble(4) == 1.0 + 3.5 * 3.5)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_l2sq('a', 'b')").collect()
    }
    assert(err.getMessage.toLowerCase.contains("vec_l2sq"))
  }

  test("watermarked append-mode windowed agg emits only closed windows") {
    val spark = TestSpark.spark
    import spark.implicits._
    // deterministic multi-batch layout: events split into 3 time-ordered
    // chunks written SEQUENTIALLY (file stream source orders by modTime,
    // so the watermark advances monotonically and no event is late —
    // a single repartitionByRange write gives arbitrary modTime order
    // and out-of-order batches silently drop earlier events)
    val tmp = java.nio.file.Files.createTempDirectory("graft_wm").toString
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val tert = ev.withColumn("tert",
      ntile(3).over(org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")))
    (1 to 3).foreach { i =>
      tert.filter(col("tert") === i).drop("tert")
        .coalesce(1).write.mode("append").parquet(tmp)
      Thread.sleep(1200) // separate modTimes (FileStreamSource sort key)
    }

    val schema = spark.read.parquet(tmp).schema
    val name = s"wm_sink_${System.nanoTime()}"
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val emitted = spark.table(name)
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val all = ev
      .groupBy(date_trunc("hour", col("ts")).as("ws"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val maxTs = ev.agg(max("ts")).head.getTimestamp(0).getTime

    assert(emitted.nonEmpty, "append mode should have emitted closed windows")
    assert(emitted.subsetOf(all), "emitted aggregates must match the batch truth")
    // every emitted window closed strictly before the final watermark
    emitted.foreach { case (ws, _, _) =>
      assert(ws.getTime + 3600 * 1000 <= maxTs,
        s"window starting $ws was emitted but cannot have closed")
    }
  }
}
