package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the round tooling itself — the bench-pin generator must
  * refuse to silently absorb a regression into BENCH_EXPECT.json
  * (r8 verdict item #7). Shells out to python3 with stdlib-only deps. */
class ToolsSpec extends AnyFunSuite {

  private def write(dir: Path, name: String, content: String): Path = {
    val p = dir.resolve(name)
    Files.write(p, content.getBytes("UTF-8"))
    p
  }

  private def run(dir: Path, extra: String*): (Int, String) = {
    import scala.sys.process._
    val cmd = Seq("python3", "tools/gen_bench_expect.py",
      dir.resolve("bench.json").toString,
      "--expect", dir.resolve("expect.json").toString,
      "--notes", dir.resolve("NOTES.md").toString) ++ extra
    val err = new StringBuilder
    val code = Process(cmd, new java.io.File("."))
      .!(ProcessLogger(_ => (), l => err.append(l).append('\n')))
    (code, err.toString)
  }

  test("gen_bench_expect refuses a >1.5x pin raise without --allow-raise + NOTES entry") {
    val dir = Files.createTempDirectory("graft_pins")
    write(dir, "bench.json", """{"queries": {"q1": 2.0, "q2": 0.10, "q3": 0.2}}""")
    write(dir, "expect.json", """{"_comment": "x", "q1": 1.0, "q2": 0.09, "q3": 0.1}""")
    write(dir, "NOTES.md", "nothing relevant here")
    // q1 raise 1.0 -> 2.0 (>1.5x AND >+0.5s) must be refused; q2 is
    // within factor; q3 doubles but by only +0.1s absolute — sub-second
    // noise on a tiny pin, allowed (the bench spike rule's two-sided
    // test)
    val (code, err) = run(dir)
    assert(code == 1, s"expected refusal, got exit=$code\n$err")
    assert(err.contains("q1") && !err.contains("q2:") && !err.contains("q3:"), err)
    // --allow-raise alone is not enough: NOTES.md must justify the query
    val (code2, err2) = run(dir, "--allow-raise", "q1")
    assert(code2 == 1 && err2.contains("NOTES"), s"exit=$code2\n$err2")
    // a STALE mention of the name anywhere in NOTES.md is NOT a
    // justification (r10 verdict item #4): only a structured
    // `pin-raise:` line counts
    write(dir, "NOTES.md", "q1 regressed because the fixture doubled; accepted")
    val (code2b, err2b) = run(dir, "--allow-raise", "q1")
    assert(code2b == 1 && err2b.contains("pin-raise"), s"exit=$code2b\n$err2b")
    // ...and a pin-raise line naming a DIFFERENT query doesn't cover q1
    write(dir, "NOTES.md", "- pin-raise: q9 — unrelated\nq1 mentioned in prose")
    val (code2c, err2c) = run(dir, "--allow-raise", "q1")
    assert(code2c == 1 && err2c.contains("q1"), s"exit=$code2c\n$err2c")
    // with both the flag and a structured pin-raise line it goes through
    write(dir, "NOTES.md", "- pin-raise: q1 — fixture doubled; accepted")
    val (code3, err3) = run(dir, "--allow-raise", "q1")
    assert(code3 == 0, s"expected success, got exit=$code3\n$err3")
    val out = new String(Files.readAllBytes(dir.resolve("expect.json")), "UTF-8")
    assert(out.contains("\"q1\": 2.0") && out.contains("\"q2\": 0.1"))
  }

  test("gen_bench_expect lowers pins and adds new queries freely") {
    val dir = Files.createTempDirectory("graft_pins2")
    write(dir, "bench.json", """{"queries": {"q1": 0.5, "q_new": 3.0}}""")
    write(dir, "expect.json", """{"_comment": "x", "q1": 1.0}""")
    val (code, err) = run(dir)
    assert(code == 0, s"exit=$code\n$err")
    val out = new String(Files.readAllBytes(dir.resolve("expect.json")), "UTF-8")
    assert(out.contains("\"q1\": 0.5") && out.contains("\"q_new\": 3.0"))
  }

  test("pin-raise: a name in the REASON text is not a justification") {
    // r11 ADVICE #1: 'pin-raise: q1 — slower than q2' must justify q1
    // only — names after the em-dash/-- separator are prose
    val dir = Files.createTempDirectory("graft_pins3")
    write(dir, "bench.json", """{"queries": {"q1": 2.0, "q2": 3.0}}""")
    write(dir, "expect.json", """{"_comment": "x", "q1": 1.0, "q2": 1.0}""")
    write(dir, "NOTES.md", "- pin-raise: q1 — slower than q2 after the fixture change")
    val (code, err) = run(dir, "--allow-raise", "q1,q2")
    assert(code == 1 && err.contains("q2"), s"exit=$code\n$err")
    // the '--' separator form is parsed the same way
    write(dir, "NOTES.md", "- pin-raise: q1 -- slower than q2")
    val (codeB, errB) = run(dir, "--allow-raise", "q1,q2")
    assert(codeB == 1 && errB.contains("q2"), s"exit=$codeB\n$errB")
    // naming both BEFORE the separator covers both
    write(dir, "NOTES.md", "- pin-raise: q1 q2 — fixture change doubled both")
    val (code2, err2) = run(dir, "--allow-raise", "q1,q2")
    assert(code2 == 0, s"exit=$code2\n$err2")
  }

  test("the real pin file must cover every declared query") {
    // r11 verdict item #1: five post-close queries shipped without pins
    // and were exempt from spike protection — the generator now refuses
    // a BENCH_EXPECT.json that misses any QueryDef declared in source
    val dir = Files.createTempDirectory("graft_pins4")
    val src = dir.resolve("src")
    Files.createDirectories(src)
    write(src, "Qs.scala",
      """val a = QueryDef.sql("q1_agg",
        |  "SELECT 1") { (s, d) => null }
        |val b = QueryDef.rowsOnly("q9_new") { (s, d) => null }""".stripMargin)
    write(dir, "NOTES.md", "")
    def runReal(bench: String): (Int, String) = {
      import scala.sys.process._
      write(dir, "bench.json", bench)
      val cmd = Seq("python3", "tools/gen_bench_expect.py",
        dir.resolve("bench.json").toString,
        "--expect", dir.resolve("BENCH_EXPECT.json").toString,
        "--notes", dir.resolve("NOTES.md").toString,
        "--src", src.toString)
      val err = new StringBuilder
      val code = Process(cmd, new java.io.File("."))
        .!(ProcessLogger(_ => (), l => err.append(l).append('\n')))
      (code, err.toString)
    }
    val (code, err) = runReal("""{"queries": {"q1_agg": 2.0}}""")
    assert(code == 1 && err.contains("q9_new"), s"exit=$code\n$err")
    // full coverage writes; a scratch expect path (other tests above)
    // stays exempt so tooling tests remain self-contained
    val (code2, err2) = runReal("""{"queries": {"q1_agg": 2.0, "q9_new": 0.5}}""")
    assert(code2 == 0, s"exit=$code2\n$err2")
    val out = new String(
      Files.readAllBytes(dir.resolve("BENCH_EXPECT.json")), "UTF-8")
    assert(out.contains("\"q9_new\": 0.5"))
  }

  test("the real pin file refuses when the source dir is missing (wrong cwd)") {
    // r12 ADVICE #3: a wrong-cwd invocation used to SKIP the
    // declared-coverage gate while still writing the real pin file
    val dir = Files.createTempDirectory("graft_pins5")
    write(dir, "bench.json", """{"queries": {"q1": 1.0}}""")
    write(dir, "NOTES.md", "")
    import scala.sys.process._
    val cmd = Seq("python3", "tools/gen_bench_expect.py",
      dir.resolve("bench.json").toString,
      "--expect", dir.resolve("BENCH_EXPECT.json").toString,
      "--notes", dir.resolve("NOTES.md").toString,
      "--src", dir.resolve("no_such_dir").toString)
    val err = new StringBuilder
    val code = Process(cmd, new java.io.File("."))
      .!(ProcessLogger(_ => (), l => err.append(l).append('\n')))
    assert(code == 1 && err.toString.contains("REFUSING"),
      s"exit=$code\n$err")
    assert(!Files.exists(dir.resolve("BENCH_EXPECT.json")),
      "the real pin file must not be written on a wrong-cwd invocation")
  }

  test("iter_times in a bench artifact emits a :iter_median pin") {
    // r12 verdict #3: ml04's spike guard reads median(iter_times), so
    // the generator pins that statistic alongside the wall-time pin
    val dir = Files.createTempDirectory("graft_pins6")
    write(dir, "bench.json",
      """{"queries": {"ml04_lda_em_train": 30.0},
        | "iter_times": {"ml04_lda_em_train": [0.5, 0.9, 0.7, 0.6]}}""".stripMargin)
    write(dir, "expect.json", "{}")
    write(dir, "NOTES.md", "")
    val (code, err) = run(dir)
    assert(code == 0, s"exit=$code\n$err")
    val out = new String(Files.readAllBytes(dir.resolve("expect.json")), "UTF-8")
    // median of [0.5, 0.6, 0.7, 0.9] = 0.65 (even length averages the
    // two middles — the same statistic graft.Bench computes)
    assert(out.contains("\"ml04_lda_em_train:iter_median\": 0.65"), out)
    assert(out.contains("\"ml04_lda_em_train\": 30.0"), out)
  }

  test("a memo-shaped first run emits a :cold pin; a flat one does not") {
    // r13 verdict #3: a query whose cold first run exceeds the spike
    // rule against its own memo-warm pin gets a secondary :cold pin
    // (checked by Bench only while the cold sample is the only one);
    // queries whose first run sits inside the envelope get no :cold key
    val dir = Files.createTempDirectory("graft_pins7")
    write(dir, "bench.json",
      """{"queries": {"dd16_incremental_band_index": 0.46, "q1": 0.5},
        | "first_runs": {"dd16_incremental_band_index": 2.9, "q1": 0.6}}""".stripMargin)
    write(dir, "expect.json", "{}")
    write(dir, "NOTES.md", "")
    val (code, err) = run(dir)
    assert(code == 0, s"exit=$code\n$err")
    val out = new String(Files.readAllBytes(dir.resolve("expect.json")), "UTF-8")
    assert(out.contains("\"dd16_incremental_band_index:cold\": 2.9"), out)
    assert(out.contains("\"dd16_incremental_band_index\": 0.46"), out)
    assert(!out.contains("\"q1:cold\""), out)
  }

  private def runMerge(dir: Path, files: Seq[String], fresh: String): (Int, String) = {
    import scala.sys.process._
    val cmd = Seq("python3", "tools/merge_bench.py") ++
      files.map(f => dir.resolve(f).toString) ++ Seq("--fresh", fresh)
    val err = new StringBuilder
    val code = Process(cmd, new java.io.File("."))
      .!(ProcessLogger(_ => (), l => err.append(l).append('\n')))
    (code, err.toString)
  }

  test("merge_bench refuses a family artifact that contributed nothing") {
    // r13 ADVICE #2: an ONLY=st pass that selected zero queries (env
    // typo, renamed family) must refuse instead of merging into an
    // artifact silently missing the whole family
    val dir = Files.createTempDirectory("graft_merge1")
    val main =
      """{"metric":"total","value":1.0,"unit":"sec","first_run_sum":1.0,
        | "budget_exhausted":false,"queries":{"q1":1.0},
        | "first_runs":{"q1":1.0},"runs":{"q1":1},
        | "sf":"/tmp/sf1","failures":[]}""".stripMargin
    write(dir, "main.json", main)
    write(dir, "empty.json", main.replace("""{"q1":1.0}""", "{}")
      .replace("""{"q1":1}""", "{}").replace(""""value":1.0""", """"value":0.0"""))
    val (code, err) = runMerge(dir, Seq("main.json", "empty.json"), "st")
    assert(code != 0 && err.contains("no queries"), s"exit=$code\n$err")
    // a non-empty family artifact whose queries miss the --fresh prefix
    // refuses too (wrong family selected)
    write(dir, "wrong.json", main.replace("\"q1\"", "\"q2\""))
    val (code2, err2) = runMerge(dir, Seq("main.json", "wrong.json"), "st")
    assert(code2 != 0 && err2.contains("--fresh"), s"exit=$code2\n$err2")
    // and the st-family artifact merges fine
    write(dir, "st.json", main.replace("\"q1\"", "\"st01\""))
    val (code3, err3) = runMerge(dir, Seq("main.json", "st.json"), "st")
    assert(code3 == 0, s"exit=$code3\n$err3")
  }

  test("merge_bench carries load/priced maps and over_pin/contended (r17)") {
    // the family JVM's contention evidence (per-query loadavg/steal,
    // median-iter pricing, the over-pin census) must survive the merge
    // — the first r17 sf1 artifact dropped the st pass's load map and
    // the 230-250 s/query steal evidence lived only in /tmp
    import scala.sys.process._
    val dir = Files.createTempDirectory("graft_merge3")
    val main =
      """{"metric":"total","value":1.0,"unit":"sec","value_wall":1.2,"first_run_sum":1.0,
        | "budget_exhausted":false,"queries":{"q1":1.0},
        | "first_runs":{"q1":1.0},"runs":{"q1":1},
        | "load":{"q1":[1.0,2.0,0.5]},"over_pin":2,"contended":false,
        | "sf":"/tmp/sf1","failures":[]}""".stripMargin
    write(dir, "main.json", main)
    write(dir, "st.json", main.replace("\"q1\"", "\"st01\"")
      .replace(""""value_wall":1.2,""", "") // pre-r17 family artifact: falls back to value
      .replace(""""over_pin":2,"contended":false""",
        """"priced":{"st01":0.9},"over_pin":11,"contended":true"""))
    val cmd = Seq("python3", "tools/merge_bench.py",
      dir.resolve("main.json").toString, dir.resolve("st.json").toString,
      "--fresh", "st")
    val out = new StringBuilder
    val code = Process(cmd, new java.io.File("."))
      .!(ProcessLogger(l => out.append(l), _ => ()))
    assert(code == 0, s"merge failed:\n$out")
    val merged = out.toString
    assert(merged.contains("\"over_pin\": 13"), merged)
    assert(merged.contains("\"contended\": true"), merged)
    // both passes' load triples present in one map
    val loadSec = merged.split("\"load\":")(1)
    assert(loadSec.contains("\"q1\"") && loadSec.contains("\"st01\""), merged)
    assert(merged.contains("\"priced\": {\"st01\": 0.9}"), merged)
    // value_wall is SUMMED like value (r17 ADVICE #1: dict(runs[0]) kept
    // only the main pass's 1.2); the family artifact predates the field,
    // so its side falls back to its value (1.0) → 2.2
    assert(merged.contains("\"value_wall\": 2.2"), merged)
  }

  test("merge_bench refuses when --fresh is omitted (r14 ADVICE #1)") {
    // fresh=[] made the per-artifact prefix check vacuously False, so
    // every merge without the flag failed even on valid disjoint
    // artifacts; the flag is now explicitly required with a clear error
    val dir = Files.createTempDirectory("graft_merge2")
    val main =
      """{"metric":"total","value":1.0,"unit":"sec","first_run_sum":1.0,
        | "budget_exhausted":false,"queries":{"q1":1.0},
        | "first_runs":{"q1":1.0},"runs":{"q1":1},
        | "sf":"/tmp/sf1","failures":[]}""".stripMargin
    write(dir, "main.json", main)
    write(dir, "st.json", main.replace("\"q1\"", "\"st01\""))
    import scala.sys.process._
    val cmd = Seq("python3", "tools/merge_bench.py",
      dir.resolve("main.json").toString, dir.resolve("st.json").toString)
    val err = new StringBuilder
    val code = Process(cmd, new java.io.File("."))
      .!(ProcessLogger(_ => (), l => err.append(l).append('\n')))
    assert(code != 0 && err.toString.contains("pass --fresh"),
      s"exit=$code\n$err")
  }

  test("a suffixed pin key is justifiable via a pin-raise NOTES line (r14 ADVICE #3)") {
    // 'dd16_...:cold' could previously never be unlocked through
    // NOTES.md because ':' was outside the name-token regex
    val dir = Files.createTempDirectory("graft_pins8")
    write(dir, "expect.json", """{"q1_x": 1.0, "q1_x:cold": 2.0}""")
    write(dir, "bench.json",
      """{"queries": {"q1_x": 1.0}, "first_runs": {"q1_x": 9.0}}""")
    write(dir, "NOTES.md", "")
    val (code, err) = run(dir, "--allow-raise", "q1_x:cold")
    assert(code == 1 && err.contains("q1_x:cold"), s"exit=$code\n$err")
    write(dir, "NOTES.md", "- pin-raise: q1_x:cold — fixture grew; cold build cost doubled")
    val (code2, err2) = run(dir, "--allow-raise", "q1_x:cold")
    assert(code2 == 0, s"exit=$code2\n$err2")
  }

  test("the pin file stamps its calibration dir as _pin_dir (r14 verdict #2)") {
    val dir = Files.createTempDirectory("graft_pins9")
    write(dir, "bench.json", """{"queries": {"q1": 1.0}, "sf": "/root/testdata/sf0.1"}""")
    write(dir, "expect.json", "{}")
    write(dir, "NOTES.md", "")
    val (code, err) = run(dir)
    assert(code == 0, s"exit=$code\n$err")
    val out = new String(Files.readAllBytes(dir.resolve("expect.json")), "UTF-8")
    assert(out.contains("\"_pin_dir\": \"/root/testdata/sf0.1\""), out)
  }
}
