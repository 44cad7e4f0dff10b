package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Similarity, TextAnalysis}

/** Behavioral specs for the round-4 additions: multiset set operations,
  * ANSI OFFSET/FETCH, JSON extraction, portability-named string/regexp
  * functions, and the new pipeline operators (duplicate-n-gram stats,
  * cross-source overlap, centroid assignment). */
class DialectR4Spec extends AnyFunSuite {
  private def g = TestSpark.session

  test("EXCEPT ALL keeps multiset counts; INTERSECT ALL bounded by both") {
    // nation: 5 rows per regionkey; region: 1 per key → 4 copies survive
    val ex = g.sql(
      "select n_regionkey as k from nation except all " +
      "select r_regionkey as k from region").collect()
    assert(ex.length == 20)
    assert(ex.groupBy(_.getAs[Number](0).longValue).forall(_._2.length == 4))
    val in = g.sql(
      "select n_regionkey as k from nation where n_nationkey < 7 " +
      "intersect all select n_regionkey as k from nation").collect()
    assert(in.length == 7)
  }

  test("OFFSET n ROWS FETCH FIRST m ROWS ONLY paginates like LIMIT/OFFSET") {
    val ansi = g.sql(
      "select n_nationkey as k from nation order by n_nationkey " +
      "offset 5 rows fetch first 10 rows only").collect().map(_.getAs[Number](0).longValue)
    val classic = g.sql(
      "select n_nationkey as k from nation order by n_nationkey " +
      "limit 10 offset 5").collect().map(_.getAs[Number](0).longValue)
    assert(ansi.toSeq == classic.toSeq && ansi.length == 10 && ansi.head == 5)
  }

  test("bare OFFSET without FETCH drops the first n rows, keeps the rest") {
    val r = g.sql(
      "select n_nationkey as k from nation order by n_nationkey offset 20 rows")
      .collect().map(_.getAs[Number](0).longValue)
    assert(r.toSeq == (20L to 24L).toSeq)
  }

  test("json_extract reads nested paths and arrays as strings") {
    val r = g.sql(
      "select json_extract('{\"a\":{\"b\":7},\"t\":[1,2,3]}', '$.a.b') as b, " +
      "cast(json_array_length(json_extract('{\"t\":[1,2,3]}', '$.t')) as int) as n")
      .collect().head
    assert(r.getString(0) == "7" && r.getInt(1) == 3)
  }

  test("portability names: strpos/starts_with/ends_with/regexp_matches") {
    val r = g.sql(
      "select cast(strpos('hello', 'll') as int) as sp, " +
      "starts_with('hello', 'he') as sw, ends_with('hello', 'lo') as ew, " +
      "regexp_matches('ab12', '[0-9]') as rm, " +
      "cast(regexp_count('banana', 'an') as int) as rc").collect().head
    assert(r.getInt(0) == 3 && r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3))
    assert(r.getInt(4) == 2)
  }

  test("dupNgramStats counts duplicate bigrams exactly") {
    val s = TestSpark.spark
    import s.implicits._
    // "a b a b a" → bigrams [a b, b a, a b, b a]: 4 total, 2 distinct
    val df = Seq((1L, "a b a b a"), (2L, "x y z"), (3L, "solo")).toDF("doc_id", "text")
    val r = TextAnalysis.dupNgramStats(df, "text", "doc_id", n = 2)
      .orderBy("id").collect()
    assert(r(0).getLong(1) == 4 && r(0).getLong(2) == 2 && r(0).getDouble(3) == 0.5)
    assert(r(1).getLong(1) == 2 && r(1).getLong(2) == 2 && r(1).getDouble(3) == 0.0)
    // short doc: one whole-text gram, no duplicates
    assert(r(2).getLong(1) == 1 && r(2).getDouble(3) == 0.0)
  }

  test("crossGroupOverlap counts distinct shared shingles per group pair") {
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps", "sa"),
      (2L, "the quick brown cat sits", "sb"),
      (3L, "unrelated text entirely here", "sc"),
      // duplicate shingles within one source must count ONCE
      (4L, "the quick brown fox runs", "sb")).toDF("doc_id", "text", "source")
    val r = TextAnalysis.crossGroupOverlap(df, "text", "source", n = 3)
      .orderBy("src_a", "src_b").collect()
    // sa∩sb share: "the quick brown" (from doc2) + "quick brown fox" (doc4)
    assert(r.map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq ==
      Seq(("sa", "sb", 2L)))
  }

  test("ILIKE is case-insensitive; LIKE ESCAPE makes wildcards literal") {
    val r = g.sql(
      "select 'ABC' ilike 'ab%' as a, 'ABC' like 'ab%' as b, " +
      "'10%' like '10!%' escape '!' as c, '10x' like '10!%' escape '!' as d, " +
      "'a_c' not ilike 'A!_C' escape '!' as e").collect().head
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2))
    assert(!r.getBoolean(3) && !r.getBoolean(4))
  }

  test("arg_min/arg_max pick the value at the extreme of the order key") {
    val r = g.sql(
      "select arg_min(v, k) as lo, arg_max(v, k) as hi " +
      "from (values (3, 'c'), (1, 'a'), (2, 'b')) as t(k, v)").collect().head
    assert(r.getString(0) == "a" && r.getString(1) == "c")
  }

  test("temperatureMix keeps floor(frac*N*n^T/Z) per group, min 1, smallest keys") {
    val s = TestSpark.spark
    import s.implicits._
    // groups: a×16, b×4, c×1 → T=0.5 weights 4:2:1, frac=0.5, N=21
    // z=7, targets: floor(10.5*4/7)=6, floor(10.5*2/7)=3, max(1, floor(1.5/7))=1
    val df = ((1 to 16).map(i => (i.toLong, "a")) ++
      (17 to 20).map(i => (i.toLong, "b")) ++ Seq((21L, "c")))
      .toDF("doc_id", "grp")
    val kept = graft.operators.Sampling
      .temperatureMix(df, "grp", "doc_id", frac = 0.5, temperature = 0.5)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("doc_id"))).sorted
    assert(kept.count(_._1 == "a") == 6 && kept.count(_._1 == "b") == 3 &&
      kept.count(_._1 == "c") == 1)
    // deterministic: the lowest doc_ids of each group
    assert(kept.filter(_._1 == "a").map(_._2).toSeq == (1L to 6L))
    assert(kept.filter(_._1 == "b").map(_._2).toSeq == (17L to 19L))
  }

  test("cdcChunk covers every token once, ids contiguous, boundary ends chunk") {
    val s = TestSpark.spark
    import s.implicits._
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val df = Seq((1L, text.trim), (2L, "tiny")).toDF("doc_id", "text")
    val chunks = graft.operators.TextAnalysis.cdcChunk(df, "text", "doc_id")
      .orderBy("id", "chunk_id").collect()
    val doc1 = chunks.filter(_.getLong(0) == 1L)
    // full coverage: token counts add to 30, reassembly = original text
    assert(doc1.map(_.getLong(2)).sum == 30)
    assert(doc1.map(_.getString(3)).mkString(" ") == text.trim)
    // contiguous ids from 0
    assert(doc1.map(_.getLong(1)).toSeq == doc1.indices.map(_.toLong))
    // determinism: same text → same chunking (doc 2 vs a re-run)
    val again = graft.operators.TextAnalysis.cdcChunk(df, "text", "doc_id")
      .orderBy("id", "chunk_id").collect()
    assert(chunks.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("ANSI TRIM/POSITION/SUBSTRING keyword forms and :: casts") {
    val r = g.sql(
      "select trim(both 'x' from 'xxaxx') as t1, trim(leading 'x' from 'xxaxx') as t2, " +
      "trim(trailing 'x' from 'xxaxx') as t3, trim(from ' a ') as t4, trim(' b ') as t5, " +
      "position('ll' in 'hello') as p, substring('abcdef' from 2 for 3) as s1, " +
      "substring('abcdef' from 4) as s2, '42'::int + 1 as c1, " +
      "3.9::int as c2, 7::string as c3").collect().head
    assert(r.getString(0) == "a" && r.getString(1) == "axx" && r.getString(2) == "xxa")
    assert(r.getString(3) == "a" && r.getString(4) == "b")
    assert(r.getAs[Number](5).intValue == 3)
    assert(r.getString(6) == "bcd" && r.getString(7) == "def")
    assert(r.getAs[Number](8).intValue == 43 && r.getAs[Number](9).intValue == 3 &&
      r.getString(10) == "7")
  }

  test("IntervalJoin matches the naive key-join + range filter exactly") {
    val s = TestSpark.spark
    val ev = g.catalog.relation("events")
    import org.apache.spark.sql.functions._
    val l = ev.where(col("event_id") % 50 === 0)
      .select(col("event_id").as("l_id"), col("event_type"), col("ts").as("l_ts"))
    val r = ev.where(col("event_id") % 50 =!= 0)
      .select(col("event_id").as("r_id"), col("event_type"), col("ts").as("r_ts"))
    val fast = graft.operators.IntervalJoin
      .join(l, r, Seq("event_type"), "l_ts", "r_ts", 1800000000L, 600000000L)
      .select("l_id", "r_id").orderBy("l_id", "r_id").collect()
    val naive = l.join(r, Seq("event_type"))
      .where(unix_micros(col("r_ts")).between(
        unix_micros(col("l_ts")) - 1800000000L,
        unix_micros(col("l_ts")) + 600000000L))
      .select("l_id", "r_id").orderBy("l_id", "r_id").collect()
    assert(fast.nonEmpty && fast.toSeq == naive.toSeq)
  }

  test("struct field access chains; bare t.c stays a column ref") {
    val r = g.sql(
      "select named_struct('x', 7, 'y', 'v').x as x, " +
      "named_struct('a', named_struct('b', 42)).a.b as ab, " +
      "[named_struct('p', 5)][1].p as arr_field, " +
      "n.n_nationkey as k from nation as n order by k limit 1").collect().head
    assert(r.getAs[Number](0).intValue == 7 && r.getAs[Number](1).intValue == 42)
    assert(r.getAs[Number](2).intValue == 5 && r.getAs[Number](3).intValue == 0)
  }

  test("sharedSubstrings finds copied 30-char spans, zero for unique docs") {
    val s = TestSpark.spark
    import s.implicits._
    val span = "this exact thirty-plus character span is copied verbatim"
    val df = Seq(
      (1L, s"prefix one $span suffix alpha"),
      (2L, s"other intro $span closing words"),
      (3L, "completely unrelated text with no overlap whatsoever here")
    ).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.sharedSubstrings(df, "text", "doc_id", k = 30)
      .orderBy("id").collect()
    assert(r(0).getLong(1) > 0 && r(1).getLong(1) > 0, "copied span must be detected")
    assert(r(2).getLong(1) == 0, "unique doc must have zero shared spans")
  }

  test("removeSharedSubstrings cuts later copies, keeps the first, hand-checked") {
    val s = TestSpark.spark
    import s.implicits._
    // k=5 hand case: doc 2 shares grams abcde/bcdef/cdefg with doc 1 →
    // covered starts p=3..5 merge to interval [3,10) → "xx"+"yy"
    val df = Seq(
      (1L, "abcdefghij"),
      (2L, "xxabcdefgyy"),
      (3L, "zzzzzqqqqq")).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis
      .removeSharedSubstrings(df, "text", "doc_id", k = 5)
      .orderBy("id").collect()
    assert(r(0).getString(1) === "abcdefghij" && r(0).getInt(2) === 0)
    assert(r(1).getString(1) === "xxyy" && r(1).getInt(2) === 7)
    assert(r(2).getString(1) === "zzzzzqqqqq" && r(2).getInt(2) === 0)
    // a full verbatim duplicate loses everything (one merged interval)
    val dup = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val rd = graft.operators.TextAnalysis
      .removeSharedSubstrings(dup, "text", "doc_id", k = 10)
      .orderBy("id").collect()
    assert(rd(0).getString(1).nonEmpty && rd(1).getString(1) === "")
    // removal is idempotent: a second pass removes nothing more
    val once = graft.operators.TextAnalysis
      .removeSharedSubstrings(df, "text", "doc_id", k = 5)
      .select(org.apache.spark.sql.functions.col("id").as("doc_id"),
        org.apache.spark.sql.functions.col("text_clean").as("text"))
    val twice = graft.operators.TextAnalysis
      .removeSharedSubstrings(once, "text", "doc_id", k = 5)
      .orderBy("id").collect()
    assert(twice.forall(_.getInt(2) === 0))
  }

  test("GramOps native kernel ≡ xxhash64(substring) + brute-force winnow reference") {
    val s = TestSpark.spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, length, expr => sqlExpr}
    val texts = Seq(
      (1L, "abcabcabcabcabc"),
      (2L, "héllo wörld ünïcode gräm test — mixed width bytes here"),
      (3L, "aaaaaaaaaaaaaaa"), // all-equal hashes: tie handling
      (4L, "the quick brown fox jumps over the lazy dog"))
    val df = texts.toDF("doc_id", "text")
    val k = 5
    // SQL reference hashes per gram (tiny rows — no collapse hazard here)
    val ref = df.where(length(col("text")) >= k)
      .select(col("doc_id"), sqlExpr(
        s"transform(sequence(1, length(text) - ${k - 1}), " +
          s"p -> xxhash64(substring(text, p, $k)))").as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // native hash-set at w=1 == sorted distinct of the reference
    val nat = df.where(length(col("text")) >= k)
      .select(col("doc_id"),
        graft.expr.GramOps.gramHashSet(col("text"), k, 1).as("ga"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    ref.foreach { case (id, hs) =>
      assert(nat(id) === hs.distinct.sorted,
        s"doc $id: native gram set must equal SQL reference")
    }
    // native winnow at w=3 == brute-force leftmost-min-per-window
    val w = 3
    val win = df.where(length(col("text")) >= k)
      .select(col("doc_id"),
        graft.expr.GramOps.gramWinnow(col("text"), k, w).as("sel"))
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getInt(0), x.getLong(1)))
      }.toMap
    ref.foreach { case (id, hs) =>
      val L = hs.length
      val we = math.min(w, L)
      val expectIdx = (0 to L - we).flatMap { i =>
        val slice = hs.slice(i, i + we)
        Seq(i + slice.indexOf(slice.min)) // leftmost min
      }.distinct.sorted
      val expect = expectIdx.map(i => (i + 1, hs(i)))
      assert(win(id) === expect, s"doc $id: winnow selection must match")
      // contract: selections ⊆ all grams, at least one per window
      assert(expect.nonEmpty)
    }
    // hash-set at w == distinct hashes of the winnow selection
    val natW = df.where(length(col("text")) >= k)
      .select(col("doc_id"),
        graft.expr.GramOps.gramHashSet(col("text"), k, w).as("ga"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    win.foreach { case (id, sel) =>
      assert(natW(id) === sel.map(_._2).distinct.sorted)
    }
  }

  test("sharedSubstrings stride: winnowing recall bound and no false positives") {
    val s = TestSpark.spark
    import s.implicits._
    val k = 10; val stride = 4
    // shared span of EXACTLY k + stride - 1 = 13 chars — the winnowing
    // guarantee's minimum detectable length
    val span = "0123456789abc"
    assert(span.length == k + stride - 1)
    val df = Seq(
      (1L, s"first wrapper text $span more filler words here"),
      (2L, s"entirely different beginning $span and a different tail"),
      (3L, "no overlap with anything else in this tiny corpus at all"),
      (4L, "another fully unique document that shares not one gram")
    ).toDF("doc_id", "text")
    val w = graft.operators.TextAnalysis
      .sharedSubstrings(df, "text", "doc_id", k = k, stride = stride)
      .orderBy("id").collect()
    assert(w(0).getLong(1) > 0 && w(1).getLong(1) > 0,
      "a span of k+stride-1 chars MUST be detected (winnowing theorem)")
    // no false positives: winnowed detections are a subset of exact ones
    val exact = graft.operators.TextAnalysis
      .sharedSubstrings(df, "text", "doc_id", k = k)
      .orderBy("id").collect()
    (0 until 4).foreach { i =>
      assert(w(i).getLong(1) <= exact(i).getLong(1),
        "winnowed count must never exceed the exact count")
      if (w(i).getLong(1) > 0) assert(exact(i).getLong(1) > 0)
    }
    assert(w(2).getLong(1) == 0 && w(3).getLong(1) == 0)
  }

  test("removeSharedSubstrings stride: full duplicate keeps <= 2(stride-1) chars") {
    val s = TestSpark.spark
    import s.implicits._
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis
      .removeSharedSubstrings(df, "text", "doc_id", k = 10, stride = 4)
      .orderBy("id").collect()
    assert(r(0).getString(1) === text, "owner doc must be untouched")
    // first selection <= stride in, last >= L_g - stride + 1 → residue
    // bounded by 2(stride-1) chars
    assert(r(1).getString(1).length <= 2 * (4 - 1),
      s"full duplicate must lose all but the edge residue, kept '${r(1).getString(1)}'")
  }

  test("substring family: buckets > 1 is output-identical to buckets = 1") {
    val s = TestSpark.spark
    import s.implicits._
    val span = "this exact thirty-plus character span is copied verbatim"
    val df = Seq(
      (1L, s"prefix one $span suffix alpha"),
      (2L, s"other intro $span closing words"),
      (3L, s"third copy here $span trailing"),
      (4L, "completely unrelated text with no overlap whatsoever here"),
      (5L, "abcdefghij klmnopqrst uvwxyz0123 456789 distinct tail")
    ).toDF("doc_id", "text")
    val s1 = graft.operators.TextAnalysis
      .sharedSubstrings(df, "text", "doc_id", k = 30)
      .orderBy("id").collect().toSeq
    val s3 = graft.operators.TextAnalysis
      .sharedSubstrings(df, "text", "doc_id", k = 30, buckets = 3)
      .orderBy("id").collect().toSeq
    assert(s1 === s3, "bucketed detection must equal unbucketed")
    val r1 = graft.operators.TextAnalysis
      .removeSharedSubstrings(df, "text", "doc_id", k = 12)
      .orderBy("id").collect().toSeq
    val r3 = graft.operators.TextAnalysis
      .removeSharedSubstrings(df, "text", "doc_id", k = 12, buckets = 3)
      .orderBy("id").collect().toSeq
    assert(r1 === r3, "bucketed removal must equal unbucketed byte-for-byte")
    // winnowed + bucketed compose: still a subset of exact detection
    val wb = graft.operators.TextAnalysis
      .sharedSubstrings(df, "text", "doc_id", k = 30, stride = 3, buckets = 2)
      .orderBy("id").collect()
    (0 until 5).foreach { i =>
      assert(wb(i).getLong(1) <= s1(i).getLong(1))
    }
    assert(wb(0).getLong(1) > 0 && wb(1).getLong(1) > 0 && wb(2).getLong(1) > 0,
      "57-char span >> k+stride-1 must survive winnowing in every copy")
  }

  test("Bloom.prefilter never drops a true match and filters the bulk") {
    val s = TestSpark.spark
    import s.implicits._
    val corpus = (1 to 50).map(i => (i.toLong, s"corpus document number $i")).toDF("id", "text")
    val incoming = ((1 to 10).map(i => (100L + i, s"corpus document number $i")) ++
      (1 to 200).map(i => (300L + i, s"fresh unseen text $i"))).toDF("id", "text")
    val surv = graft.operators.Bloom.prefilter(incoming, corpus, "text")
      .select("id").collect().map(_.getLong(0)).toSet
    // all 10 true matches survive (no false negatives, by construction)
    assert((1 to 10).forall(i => surv.contains(100L + i)))
    // at 20 bits/item almost all of the 200 fresh rows are filtered out
    assert(surv.size < 30, s"expected heavy filtering, got ${surv.size} survivors")
  }

  test("centroidAssign is diagonally dominant on separable labels") {
    val s = TestSpark.spark
    import s.implicits._
    // two well-separated clusters around orthogonal axes
    val rows = (0 until 20).map { i =>
      val lbl = i % 2
      val base = if (lbl == 0) Array(1f, 0f, 0.1f * (i % 3)) else Array(0f, 1f, 0.05f * (i % 3))
      (i.toLong, base, lbl)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidAssign(df, "embedding", "vec_id", "label")
      .orderBy("label", "assigned").collect()
    // every vector lands on its own label's centroid
    assert(r.map(x => (x.getInt(0), x.getInt(1), x.getLong(2))).toSeq ==
      Seq((0, 0, 10L), (1, 1, 10L)))
  }

  test("FETCH WITH TIES keeps boundary peers; ONLY does not; errors without ORDER BY") {
    // nation has 5 rows per regionkey: first 7 by regionkey = 5×key0 + 2×key1,
    // WITH TIES extends to all 10 rows of keys 0 and 1
    val ties = g.sql("select n_regionkey as r from nation " +
      "order by n_regionkey fetch first 7 rows with ties").collect()
    assert(ties.length == 10 && ties.forall(_.getAs[Number](0).longValue <= 1))
    val only = g.sql("select n_regionkey as r from nation " +
      "order by n_regionkey fetch first 7 rows only").collect()
    assert(only.length == 7)
    val e = intercept[Exception](g.sql(
      "select n_regionkey as r from nation fetch first 3 rows with ties").collect())
    assert(e.getMessage.contains("ORDER BY"))
  }

  test("list slicing is 1-based end-inclusive, truncates, open ends work") {
    val r = g.sql(
      "select array_join(transform([1,2,3,4,5][2:4], v -> cast(v as string)), ',') as a, " +
      "array_join(transform([1,2,3][2:9], v -> cast(v as string)), ',') as b, " +
      "array_join(transform([1,2,3][:2], v -> cast(v as string)), ',') as c, " +
      "array_join(transform([1,2,3][2:], v -> cast(v as string)), ',') as d, " +
      "cast([7,8,9][2] as int) as e").collect().head
    assert(r.getString(0) == "2,3,4")
    assert(r.getString(1) == "2,3")   // over-long slice truncates
    assert(r.getString(2) == "1,2")
    assert(r.getString(3) == "2,3")
    assert(r.getInt(4) == 8)          // plain subscript unchanged
  }

  test("positional unnest composes from index-lambda transform + struct access") {
    val r = g.sql(
      "select k, u.i + 1 as pos, u.x as tok from " +
      "(select n_nationkey as k, unnest(transform(split(n_name, '_'), " +
      "(x, i) -> named_struct('i', i, 'x', x))) as u from nation " +
      "where n_nationkey = 3) as q order by pos").collect()
    assert(r.map(x => (x.getAs[Number](1).intValue, x.getString(2))).toSeq ==
      Seq((1, "NATION"), (2, "3")))
  }

  test("UNION BY NAME aligns columns by name, NULL-fills, dedups without ALL") {
    val rows = g.sql(
      "select n_nationkey as k, n_name as nm from nation where n_nationkey < 2 " +
      "union all by name " +
      "select r_name as nm, r_regionkey + 100 as k, r_regionkey as extra from region " +
      "where r_regionkey = 0 " +
      "union by name " +
      "select n_nationkey as k, n_name as nm from nation where n_nationkey < 1 " +
      "order by k").collect()
    // branch 3 duplicates a branch-1 row post-alignment → distinct removes it
    assert(rows.length == 3)
    assert(rows.map(_.schema.fieldNames.toSeq).head == Seq("k", "nm", "extra"))
    assert(rows.take(2).forall(_.isNullAt(2)) &&
      rows.last.getAs[Number](2).longValue == 0L)
  }

  test("BY NAME on EXCEPT/INTERSECT raises a clear error") {
    val e = intercept[Exception] {
      g.sql("select n_nationkey as k from nation except by name " +
        "select r_regionkey as k from region").collect()
    }
    assert(e.getMessage.contains("BY NAME"))
  }

  test("RANGE INTERVAL frame equals the epoch-seconds numeric RANGE frame") {
    val iv = g.sql(
      "select event_id as k, sum(value) over (partition by user_id order by ts " +
      "range between interval 1 hour preceding and current row) as sv " +
      "from events order by k").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val manual = g.sql(
      "select event_id as k, sum(value) over (partition by user_id order by unix_seconds(ts) " +
      "range between 3600 preceding and current row) as sv " +
      "from events order by k").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(iv.toSeq == manual.toSeq)
  }

  test("ROWS with INTERVAL bounds and multi-key RANGE INTERVAL are rejected") {
    val e1 = intercept[Exception] {
      g.sql("select sum(value) over (order by ts " +
        "rows between interval 1 hour preceding and current row) as s from events").collect()
    }
    assert(e1.getMessage.contains("RANGE"))
    val e2 = intercept[Exception] {
      g.sql("select sum(value) over (order by ts, event_id " +
        "range between interval 1 hour preceding and current row) as s from events").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("one order by key"))
  }
}
