package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture drift guard. The driver regenerates /root/testdata between
  * rounds and has already changed physical encodings once (events.ts:
  * TIMESTAMP(NANOS) → TIMESTAMP(MICROS), round 6). Every oracle hash is
  * computed against the schema the *loader* produces, so this suite pins
  * that contract for all 10 tables: if a fixture regeneration changes what
  * `Tables.load` emits, the drift fails here in one named test instead of
  * surfacing as 19 opaque bench rows across 4 suites.
  *
  * Deliberately asserts the LOADER output (post-adaptation), not the raw
  * parquet footer — raw encodings are allowed to drift as long as the
  * loader absorbs them.
  */
class FixtureSchemaSpec extends AnyFunSuite {
  import TestSpark._

  private def expect(name: String): Seq[(String, DataType)] = name match {
    case "region" => Seq("r_regionkey" -> IntegerType, "r_name" -> StringType)
    case "nation" => Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType)
    case "customer" => Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType)
    case "supplier" => Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
    case "part" => Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
    case "orders" => Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType)
    case "lineitem" => Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType)
    case "events" => Seq(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType)
    case "documents" => Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
    case "embeddings" => Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType)
  }

  for (name <- Tables.all) {
    test(s"loader schema contract: $name") {
      val df = Tables.load(spark, sf, name)
      val got = df.schema.fields.toSeq.map(f => f.name -> f.dataType)
      assert(got == expect(name),
        s"$name loader schema drifted.\n  got:      $got\n  expected: ${expect(name)}\n" +
          "If the fixture regenerated with a new physical encoding, teach the " +
          "loader in Tables.scala to absorb it (keep this contract stable); " +
          "only update this spec if the LOGICAL contract intentionally changed.")
      assert(df.head(1).nonEmpty, s"$name is empty at $sf")
    }
  }

  test("events loader adapts: ts is a concrete instant, never NTZ or raw long") {
    val ts = Tables.events(spark, sf).schema("ts").dataType
    assert(ts == TimestampType, s"events.ts must load as TimestampType, got $ts")
  }

  test("fileSchema memo: equals fresh inference, and a rewrite invalidates it") {
    // r18 optimization: Tables.load supplies the schema from a memo
    // instead of paying a footer-inference Spark job per construction
    // (measured 130-300 ms/load). The memo must (a) return exactly what
    // inference returns, (b) never serve a stale schema after the file
    // changes — the key carries (mtime, size).
    for (name <- Tables.all) {
      val p = s"$sf/$name.parquet"
      assert(Tables.fileSchema(spark, p) == spark.read.parquet(p).schema,
        s"$name: memoized schema differs from fresh inference")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_schema_memo")
    val p = s"$dir/t.parquet"
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "s").write.mode("overwrite").parquet(p)
    val s1 = Tables.fileSchema(spark, p)
    assert(s1.fieldNames.toSeq == Seq("id", "s"))
    // rewrite with a DIFFERENT schema and a different mtime/size
    Seq((2L, 3.0, true)).toDF("id", "d", "b").write.mode("overwrite").parquet(p)
    // parquet dir mtime may have second granularity on some filesystems;
    // force a distinct stamp
    val f = new java.io.File(p)
    f.setLastModified(f.lastModified() + 2000)
    val s2 = Tables.fileSchema(spark, p)
    assert(s2.fieldNames.toSeq == Seq("id", "d", "b"),
      s"stale schema served after rewrite: $s2")
  }

  test("widened: row-group-aware guard repartitions a single-row-group scan") {
    // r18 optimization: a parquet row group is indivisible, so the
    // widened() guard must key on min(splits, Σ source row groups) —
    // split count alone over-estimates realized scan parallelism
    // (openCost sizing cuts a single-row-group file into N-1 EMPTY
    // splits). The sf fixtures are one row group per file.
    val target = spark.sparkContext.defaultParallelism
    for (name <- Seq("lineitem", "documents")) {
      val p = s"$sf/$name.parquet"
      assert(Tables.fileRowGroups(spark, p) >= 1)
    }
    // single-row-group scan ABOVE the size floor: must widen to target
    val li = Tables.lineitem(spark, sf)
    if (Tables.fileRowGroups(spark, s"$sf/lineitem.parquet") * 2 <= target) {
      val w = Tables.widened(li, 1L)
      assert(w.rdd.getNumPartitions == target,
        s"widened() did not repartition a single-row-group scan " +
          s"(got ${w.rdd.getNumPartitions}, want $target)")
      // and row content is preserved exactly (count + keyed checksum)
      import org.apache.spark.sql.functions._
      val a = li.agg(count(lit(1)), sum(col("l_orderkey"))).head
      val b = w.agg(count(lit(1)), sum(col("l_orderkey"))).head
      assert(a == b, s"widened() changed scan contents: $a vs $b")
    }
    // below the size floor: untouched
    val small = Tables.region(spark, sf)
    assert(Tables.widened(small).rdd.getNumPartitions ==
      small.rdd.getNumPartitions, "widened() touched a sub-floor scan")
    // an already-wide frame (realized parallelism >= target/2): untouched
    val wide = li.repartition(target)
    assert(Tables.widened(wide, 1L).rdd.getNumPartitions == target,
      "widened() must not re-shuffle an already-wide frame")
  }
}
