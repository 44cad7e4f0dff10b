package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The two canonical published web-corpus quality-filter suites, as
  * engine-exact column pipelines (SURVEY §7.2 M4; beyond the reference
  * surface). Everything is integer counting + one rounded ratio per
  * signal — no randomness, no floats accumulated across rows — so the
  * driver's DuckDB oracle recomputes every flag bit-for-bit.
  *
  * Both are narrow, shuffle-free projections (codegen regexp/split
  * expressions per row): they compose with scan pushdown and cost one
  * pass at any corpus size.
  */
object QualityFilters {

  private def words(text: Column): Column =
    filter(split(trim(text), "\\s+"), w => w =!= "")

  /** Gopher quality rules (Rae et al. 2021, "Scaling Language Models",
    * A1.1 — the subset that is exactly recomputable without a tokenizer):
    *
    *  - `wc_ok`:      50 <= word count <= 100000
    *  - `mwl_ok`:     3 <= mean word length <= 10
    *  - `symbol_ok`:  (# of '#' or '...' occurrences) / words < 0.1
    *  - `bullet_ok`:  <= 90% of lines start with a bullet (-, *, •)
    *  - `ellipsis_ok`: <= 30% of lines end with '...' or '…'
    *  - `alpha_ok`:   >= 80% of words contain an alphabetic char
    *  - `stopword_ok`: >= 2 distinct hits from the 8-stopword probe list
    *    (the, be, to, of, and, that, have, with)
    *
    * Output: per-doc signal columns, the 7 flags, and `keep` = AND of
    * all flags. Single-line docs satisfy the line rules trivially (1
    * non-bullet, non-ellipsis line). */
  /** The 7 Gopher signal expressions for a text column, in output order.
    * Single source of truth for [[gopherFlags]] (which materializes them
    * as columns) and [[gopherFilter]] (which folds them straight into a
    * predicate — same expressions, so the two can never disagree). */
  private def gopherSignals(t: Column): Seq[(String, Column)] = {
    val ws = words(t)
    val lines = filter(split(t, "\n"), l => trim(l) =!= "")
    val nw = size(ws).cast("long")
    val nl = greatest(size(lines).cast("long"), lit(1L))
    Seq(
      "n_words" -> nw,
      // mean word length over the words themselves (exact ints / count)
      "mean_word_len" -> round(
        aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") /
          greatest(nw, lit(1L)), 6),
      // '#' chars + literal '...' runs, counted on the raw text
      "n_symbols" -> (length(regexp_replace(t, "[^#]", "")).cast("long") +
        size(split(t, "\\.\\.\\.", -1)).cast("long") - 1L),
      "n_bullet_lines" -> size(filter(lines, l => trim(l).rlike("^[-*•]"))).cast("long"),
      "n_ellipsis_lines" -> size(filter(lines, l => rtrim(l).rlike("(\\.\\.\\.|…)$"))).cast("long"),
      "n_lines" -> nl,
      "n_alpha_words" -> size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("long"),
      "n_stopword_hits" -> size(filter(
        array(lit("the"), lit("be"), lit("to"), lit("of"),
          lit("and"), lit("that"), lit("have"), lit("with")),
        sw => array_contains(transform(ws, w => lower(w)), sw))).cast("long"))
  }

  /** The 7 Gopher flags as booleans over a signal resolver (column refs
    * in [[gopherFlags]], raw signal expressions in [[gopherFilter]]). */
  private def gopherFlagExprs(sig: String => Column): Seq[(String, Column)] = Seq(
    "wc_ok" -> (sig("n_words") >= 50L && sig("n_words") <= 100000L),
    "mwl_ok" -> (sig("mean_word_len") >= 3.0 && sig("mean_word_len") <= 10.0),
    "symbol_ok" -> (sig("n_symbols") * 10L < sig("n_words")),
    "bullet_ok" -> (sig("n_bullet_lines") * 10L <= sig("n_lines") * 9L),
    "ellipsis_ok" -> (sig("n_ellipsis_lines") * 10L <= sig("n_lines") * 3L),
    "alpha_ok" -> (sig("n_alpha_words") * 10L >= sig("n_words") * 8L),
    "stopword_ok" -> (sig("n_stopword_hits") >= 2L))

  def gopherFlags(df0: DataFrame, textCol: String, idCol: String): DataFrame = {
    // r15 opt (guide §2.5 input skew): the signal expressions are the cost
    // here (a dozen regex/HOF kernels per row). A small corpus arrives as
    // ONE scan split, serializing the whole kernel on one core; widen is a
    // no-op whenever the scan already parallelizes (i.e. at scale).
    val df = Par.widen(df0, idCol)
    val out = df.select(
      (col(idCol).as("id") +:
        gopherSignals(col(textCol)).map { case (n, c) => c.as(n) }): _*)
    val flagged = gopherFlagExprs(col).foldLeft(out.select(col("*"))) {
      case (acc, (n, c)) => acc.withColumn(n, c.cast("int"))
    }
    flagged.withColumn("keep",
      (col("wc_ok") + col("mwl_ok") + col("symbol_ok") + col("bullet_ok") +
        col("ellipsis_ok") + col("alpha_ok") + col("stopword_ok") === 7).cast("int"))
  }

  /** Filter a corpus by a SUBSET of the Gopher flags, keeping the input
    * rows and columns untouched — the shape a curation pipeline wants
    * (the flag report of [[gopherFlags]] is for auditing, not chaining).
    * Stays a narrow codegen predicate: no join back, no shuffle, and
    * Catalyst pushes it against the scan when nothing intervenes. */
  def gopherFilter(df: DataFrame, textCol: String,
                   required: Seq[String]): DataFrame = {
    require(required.nonEmpty, "at least one flag required")
    val sig = gopherSignals(col(textCol)).toMap
    val flags = gopherFlagExprs(sig).toMap
    val unknown = required.filterNot(flags.contains)
    require(unknown.isEmpty,
      s"unknown gopher flags: ${unknown.mkString(", ")} " +
        s"(valid: ${flags.keys.toSeq.sorted.mkString(", ")})")
    df.where(required.map(flags).reduce(_ && _))
  }

  /** Within-document duplicate-line / duplicate-paragraph fractions —
    * the Gopher repetition-filter family members that [[TextAnalysis
    * .repetition]] (token level) and dupNgramStats (n-gram level) don't
    * cover:
    *
    *  - `dup_line_frac`        = 1 − distinct/total over non-blank lines
    *  - `dup_line_char_frac`   = chars in repeat OCCURRENCES / all line chars
    *  - `dup_para_frac`        = same at blank-line-separated paragraphs
    *    (normalized-key matching, as [[Dedup.paragraphDedup]])
    *
    * Entirely array higher-order functions on the row — NO explode, NO
    * shuffle, NO per-doc grouping: each document computes its own
    * fractions inside whole-stage codegen, so the operator is a narrow
    * projection at any corpus size. Ratios round at 6dp. Docs with no
    * non-blank lines (or paragraphs) report NULL fractions. */
  def dupLineStats(df0: DataFrame, textCol: String, idCol: String): DataFrame = {
    val df = Par.widen(df0, idCol) // r15 opt: same single-split story as gopherFlags
    val t = col(textCol)
    def fracs(items: Column, prefix: String): Seq[Column] = {
      val n = size(items).cast("long")
      val nd = size(array_distinct(items)).cast("long")
      val chars = aggregate(items, lit(0L), (a, x) => a + length(x))
      val distinctChars = aggregate(array_distinct(items), lit(0L), (a, x) => a + length(x))
      // `when` guard, not bare 0/0: ANSI mode raises DIVIDE_BY_ZERO.
      // Kept items are non-blank => chars >= n, so n > 0 also guards the
      // char ratio; empty docs report NULL fractions.
      Seq(n.as(s"n_$prefix"),
        when(n > 0, round((n - nd).cast("double") / n, 6))
          .as(s"dup_${prefix}_frac"),
        when(n > 0, round((chars - distinctChars).cast("double") / chars, 6))
          .as(s"dup_${prefix}_char_frac"))
    }
    val lines = filter(split(t, "\n"), l => trim(l) =!= "")
    val paras = filter(
      transform(split(t, "\\n\\s*\\n"),
        p => trim(regexp_replace(lower(p), "[^a-z0-9]+", " "))),
      p => p =!= "")
    df.select((col(idCol).as("id") +: (fracs(lines, "lines") ++ fracs(paras, "paras"))): _*)
  }

  /** C4 line-level cleaning (Raffel et al. 2020, §2.2): keep only lines
    * that end in terminal punctuation (. ! ? or closing quote after
    * one), have >= `minLineWords` words, and do not contain the
    * "lorem ipsum" / "javascript" / '{' tells; the document keeps its
    * surviving lines in order. Output: (id, n_lines, n_kept, cleaned,
    * has_lorem, has_brace, keep) — `keep` = doc retains >= `minKeptLines`
    * lines and has neither tell anywhere. */
  def c4LineFilter(df0: DataFrame, textCol: String, idCol: String,
                   minLineWords: Int = 3, minKeptLines: Int = 1): DataFrame = {
    val df = Par.widen(df0, idCol) // r15 opt: same single-split story as gopherFlags
    val t = col(textCol)
    val lines = split(t, "\n")
    def lineOk(l: Column): Column =
      rtrim(l).rlike("[.!?][\"')\\]]?$") &&
        size(filter(split(trim(l), "\\s+"), w => w =!= "")) >= minLineWords &&
        !lower(l).contains("lorem ipsum") &&
        !lower(l).contains("javascript") &&
        !l.contains("{")
    df.select(
        col(idCol).as("id"),
        size(lines).cast("long").as("n_lines"),
        filter(lines, lineOk _).as("__c4_kept"),
        lower(t).contains("lorem ipsum").cast("int").as("has_lorem"),
        t.contains("{").cast("int").as("has_brace"))
      .withColumn("n_kept", size(col("__c4_kept")).cast("long"))
      .withColumn("cleaned", concat_ws("\n", col("__c4_kept")))
      .withColumn("keep",
        (col("n_kept") >= minKeptLines && col("has_lorem") === 0 &&
          col("has_brace") === 0).cast("int"))
      .drop("__c4_kept")
      .select(col("id"), col("n_lines"), col("n_kept"), col("cleaned"),
        col("has_lorem"), col("has_brace"), col("keep"))
  }
}
