#!/usr/bin/env python3
"""Seeded random-query differential fuzz: generate N SELECTs that are valid
in BOTH the graft dialect and DuckDB (identical text), run them through
`graft.FuzzRun` (dialect -> parquet) and DuckDB, and hash-compare.

Only exact-typed shapes are generated (integer arithmetic, count/min/max,
sum over bigint, string functions with identical semantics, CASE WHEN,
IN-lists, BETWEEN, IS NULL, nested derived tables) so a mismatch is a
translator bug, never float noise.

Usage:
  python3 tools/fuzz_differential.py gen  <n> <seed> <out.json>
  python3 tools/fuzz_differential.py cmp  <out.json> <sparkOutDir> <sfDir>
"""
import json, random, sys, os, glob


INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
STR_COLS = ["l_returnflag", "l_linestatus"]


def gen_scalar(rng, depth=0):
    """Integer-typed scalar only — keeps arithmetic/CASE branches
    type-consistent in both engines."""
    c = rng.choice(INT_COLS)
    kind = rng.randrange(8 if depth < 2 else 5)
    if kind == 0:
        return c
    if kind == 1:
        return f"{c} + {rng.randrange(1, 100)}"
    if kind == 2:
        return f"{c} * {rng.randrange(2, 9)}"
    if kind == 3:
        return f"{c} % {rng.randrange(2, 50)}"
    if kind == 4:
        return f"length({rng.choice(STR_COLS)})"
    if kind == 5:
        return f"case when {gen_pred(rng, depth + 1)} then {gen_scalar(rng, depth + 1)} else {rng.randrange(100)} end"
    if kind == 6:
        # 0 - (…): a bare - prefix can nest into `--` (a comment)
        return f"0 - ({gen_scalar(rng, depth + 1)})"
    return f"({gen_scalar(rng, depth + 1)}) + ({gen_scalar(rng, depth + 1)})"


def gen_str_scalar(rng):
    s = rng.choice(STR_COLS)
    return rng.choice([f"upper({s})", f"lower({s})", f"concat({s}, '_x')"])


def gen_pred(rng, depth=0):
    kind = rng.randrange(7 if depth < 2 else 5)
    c = rng.choice(INT_COLS)
    s = rng.choice(STR_COLS)
    if kind == 0:
        return f"{c} {rng.choice(['<', '<=', '>', '>=', '=', '<>'])} {rng.randrange(1, 2000)}"
    if kind == 1:
        lo = rng.randrange(1, 1000)
        return f"{c} between {lo} and {lo + rng.randrange(1, 1000)}"
    if kind == 2:
        vals = ", ".join(f"'{v}'" for v in rng.sample(["A", "N", "R", "O", "F"], rng.randrange(2, 4)))
        return f"{s} in ({vals})"
    if kind == 3:
        return rng.choice([
            f"{s} is not null",
            f"concat({s}, 'x') like '{rng.choice(['A', 'N', 'R', 'O', 'F'])}%'",
            f"concat({s}, 'Y') ilike '%y'",
            f"{s} is distinct from '{rng.choice(['A', 'N', 'R'])}'",
        ])
    if kind == 4:
        return f"{c} % {rng.randrange(2, 10)} = {rng.randrange(0, 2)}"
    if kind == 5:
        return f"({gen_pred(rng, depth + 1)}) and ({gen_pred(rng, depth + 1)})"
    return f"({gen_pred(rng, depth + 1)}) or ({gen_pred(rng, depth + 1)})"


def gen_ts(rng):
    """Random [t1, t2) window inside the events table's Jan-2024 span."""
    import datetime
    t1 = datetime.datetime(2024, 1, 1) + datetime.timedelta(
        minutes=rng.randrange(0, 28 * 24 * 60))
    t2 = t1 + datetime.timedelta(hours=rng.randrange(4, 96))
    return t1.strftime("%Y-%m-%d %H:%M:%S"), t2.strftime("%Y-%m-%d %H:%M:%S")


EVENT_TYPES = ["signup", "error", "click", "view", "purchase"]


# FSQL window-spec fuzz (round 9): the streaming dialect surface
# (`[size … every … on … partitioned on …]`, `[session …]`) has no
# identical-text DuckDB form, so these shapes return a PAIR
# (graft_sql, duck_sql) — the oracle recomputes the buckets with the
# q24/q25/q32 gate patterns (epoch-µs floor division, offset unnest,
# gaps-and-islands). Executed batch-mode, exact-typed aggregates only.
WINDOW_UNITS = [("min", 60_000_000), ("h", 3_600_000_000)]


def bucket_us(every_us):
    return (f"make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) "
            f"// {every_us}) * {every_us})")


def bucket_end_us(every_us, size_us):
    return (f"make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) "
            f"// {every_us}) * {every_us} + {size_us})")


def gen_window_query(rng, shape):
    if shape == 41:  # count window with every: sliding (s < n) or gap (s > n)
        n = rng.choice([20, 50, 100])
        # overlap (slide < n), degenerate tumbling (slide == n), gap (> n)
        slide = rng.choice([max(1, n // 3), max(1, n // 2), n, n * 2, n * 3])
        if rng.random() < 0.3:  # unkeyed: the pinned zipWithIndex path
            graft = (f"select w_id, cast(count(*) as bigint) as n, "
                     f"min(event_id) as mn, max(event_id) as mx "
                     f"from events [size {n} every {slide} on event_id] "
                     f"group by w_id order by w_id")
            duck = (f"SELECT w_id, COUNT(*) AS n, MIN(event_id) AS mn, "
                    f"MAX(event_id) AS mx FROM ("
                    f"SELECT event_id, "
                    f"UNNEST(generate_series(r // {slide}, (r + {n}) // {slide} - 1)) AS w_id "
                    f"FROM (SELECT event_id, (row_number() OVER "
                    f"(ORDER BY event_id) - 1) AS r FROM events)) "
                    f"GROUP BY 1 ORDER BY 1")
            return graft, duck
        graft = (f"select w_id, event_type as et, "
                 f"cast(count(*) as bigint) as n, max(event_id) as mx "
                 f"from events [size {n} every {slide} on event_id "
                 f"partitioned on event_type] "
                 f"group by event_type order by et, w_id")
        duck = (f"SELECT w_id, et, COUNT(*) AS n, MAX(event_id) AS mx FROM ("
                f"SELECT event_id, event_type AS et, "
                f"UNNEST(generate_series(r // {slide}, (r + {n}) // {slide} - 1)) AS w_id "
                f"FROM (SELECT event_id, event_type, (row_number() OVER "
                f"(PARTITION BY event_type ORDER BY event_id) - 1) AS r FROM events)) "
                f"GROUP BY 1, 2 ORDER BY 2, 1")
        return graft, duck
    if shape == 40:  # GAP window [size s u on ts every e u], e > s (r11):
        # rows with pmod(t, every) >= size are in NO window and drop
        unit, us = rng.choice(WINDOW_UNITS)
        if unit == "min":
            s_n = rng.choice([10, 20, 30])
            e_n = s_n + rng.choice([15, 30, 60])
        else:
            s_n = rng.choice([1, 2, 3])
            e_n = s_n + rng.choice([1, 2, 6])
        size_us, every_us = s_n * us, e_n * us
        part = rng.random() < 0.5
        if part:
            graft = (f"select w_start, w_end, event_type as et, "
                     f"cast(count(*) as bigint) as n, max(event_id) as mx "
                     f"from events [size {s_n} {unit} on ts every {e_n} {unit} "
                     f"partitioned on event_type] "
                     f"group by event_type order by w_start, et")
            duck = (f"SELECT {bucket_us(every_us)} AS w_start, "
                    f"{bucket_end_us(every_us, size_us)} AS w_end, "
                    f"event_type AS et, COUNT(*) AS n, MAX(event_id) AS mx "
                    f"FROM events "
                    f"WHERE epoch_us(CAST(ts AS TIMESTAMP)) % {every_us} < {size_us} "
                    f"GROUP BY 1, 2, 3 ORDER BY 1, 3")
        else:
            graft = (f"select w_start, w_end, cast(count(*) as bigint) as n, "
                     f"cast(sum(user_id) as bigint) as su "
                     f"from events [size {s_n} {unit} on ts every {e_n} {unit}] "
                     f"group by w_start, w_end order by w_start")
            duck = (f"SELECT {bucket_us(every_us)} AS w_start, "
                    f"{bucket_end_us(every_us, size_us)} AS w_end, "
                    f"COUNT(*) AS n, CAST(SUM(user_id) AS BIGINT) AS su "
                    f"FROM events "
                    f"WHERE epoch_us(CAST(ts AS TIMESTAMP)) % {every_us} < {size_us} "
                    f"GROUP BY 1, 2 ORDER BY 1")
        return graft, duck
    if shape == 34:  # tumbling [size N u on ts [partitioned on event_type]]
        unit, us = rng.choice(WINDOW_UNITS)
        n = rng.choice([30, 45, 90] if unit == "min" else [1, 2, 4, 6, 12])
        size_us = n * us
        part = rng.random() < 0.5
        if part:
            graft = (f"select w_start, event_type as et, "
                     f"cast(count(*) as bigint) as n, max(user_id) as mx "
                     f"from events [size {n} {unit} on ts partitioned on event_type] "
                     f"group by event_type order by w_start, et")
            duck = (f"SELECT {bucket_us(size_us)} AS w_start, event_type AS et, "
                    f"COUNT(*) AS n, MAX(user_id) AS mx FROM events "
                    f"GROUP BY 1, 2 ORDER BY 1, 2")
        else:
            graft = (f"select w_start, cast(count(*) as bigint) as n, "
                     f"max(user_id) as mx, cast(sum(user_id) as bigint) as su "
                     f"from events [size {n} {unit} on ts] "
                     f"group by w_start order by w_start")
            duck = (f"SELECT {bucket_us(size_us)} AS w_start, COUNT(*) AS n, "
                    f"MAX(user_id) AS mx, CAST(SUM(user_id) AS BIGINT) AS su "
                    f"FROM events GROUP BY 1 ORDER BY 1")
        return graft, duck
    if shape == 35:  # sliding [size k*e every e]: row lands in k buckets
        unit, us = rng.choice(WINDOW_UNITS)
        e = rng.choice([30, 45] if unit == "min" else [1, 2, 3])
        k = rng.randrange(2, 5)
        every_us = e * us
        graft = (f"select w_start, cast(count(*) as bigint) as n, "
                 f"max(event_id) as mx "
                 f"from events [size {k * e} {unit} on ts every {e} {unit}] "
                 f"group by w_start order by w_start")
        offs = ", ".join(str(i) for i in range(k))
        duck = (f"SELECT make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) "
                f"// {every_us} - o.off) * {every_us}) AS w_start, "
                f"COUNT(*) AS n, MAX(event_id) AS mx "
                f"FROM events, (SELECT UNNEST([{offs}]) AS off) o "
                f"GROUP BY 1 ORDER BY 1")
        return graft, duck
    # shape 36: session windows [session g u on ts partitioned on event_type]
    unit, us = rng.choice(WINDOW_UNITS)
    g = rng.choice([20, 30, 45] if unit == "min" else [1, 2])
    gap_us = g * us
    graft = (f"select w_start, w_end, event_type as et, "
             f"cast(count(*) as bigint) as n "
             f"from events [session {g} {unit} on ts partitioned on event_type] "
             f"group by event_type order by et, w_start")
    duck = (f"WITH x AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events), "
            f"f AS (SELECT *, CASE WHEN LAG(us) OVER (PARTITION BY event_type ORDER BY us) IS NULL "
            f"OR us - LAG(us) OVER (PARTITION BY event_type ORDER BY us) > {gap_us} THEN 1 ELSE 0 END AS nf FROM x), "
            f"s AS (SELECT *, SUM(nf) OVER (PARTITION BY event_type ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid FROM f) "
            f"SELECT make_timestamp(MIN(us)) AS w_start, make_timestamp(MAX(us) + {gap_us}) AS w_end, "
            f"event_type AS et, COUNT(*) AS n FROM s "
            f"GROUP BY event_type, sid ORDER BY et, w_start")
    return graft, duck


# M4 table-function fuzz (round 10): the registered table functions
# (bpe_tokenize, leakage_safe_split, grouped_quantiles, …) have no DuckDB
# form, so these shapes return (graft, duck) PAIRS generalizing the
# q110/q112 gate-oracle patterns — random params, random filters on the
# fn output, and a join back to the source relation.

BPE_PAIR_POOL = [("e", "r"), ("i", "n"), ("o", "w"), ("s", "t"), ("a", "t"),
                 ("c", "h"), ("l", "o"), ("m", "e"), ("d", "a"), ("r", "o"),
                 ("h", "a"), ("s", "c"), ("u", "s"), ("t", "c"), ("a", "n")]


def gen_tablefn_query(rng, shape):
    if shape == 37:  # bpe_tokenize: random merge list + random output filter
        merges = rng.sample(BPE_PAIR_POOL, rng.randrange(2, 6))
        if rng.random() < 0.5:
            # a second-order merge consuming the first merge's output —
            # multi-char symbols keep the replace chain load-bearing
            a0, b0 = merges[0]
            merges.append((a0 + b0, rng.choice("aeiorst")))
        lit = ",".join(f"{a} {b}" for a, b in merges)
        pred = rng.choice([
            f"id % {rng.randrange(2, 7)} = {rng.randrange(0, 2)}",
            f"n_words >= {rng.randrange(30, 60)}",
            f"id % 3 = 0 and n_tokens > {rng.randrange(50, 150)}",
        ])
        graft = (f"select id, n_words, n_tokens from bpe_tokenize(documents, "
                 f"'{lit}') where {pred} order by id")
        chain = "' ' || regexp_replace(w, '(.)', '\\1 ', 'g')"
        for a, b in merges:
            chain = (f"replace(replace({chain}, ' {a} {b} ', ' {a}{b} '), "
                     f"' {a} {b} ', ' {a}{b} ')")
        duck = ("WITH words AS (SELECT doc_id, unnest(regexp_split_to_array("
                "lower(text), '[^a-z]+')) AS w FROM documents), "
                "nz AS (SELECT doc_id, w FROM words WHERE w <> ''), "
                f"tok AS (SELECT doc_id, len(string_split(trim({chain}), ' ')) AS nt FROM nz), "
                "agg AS (SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_words, "
                "CAST(sum(nt) AS BIGINT) AS n_tokens FROM tok GROUP BY doc_id) "
                f"SELECT id, n_words, n_tokens FROM agg WHERE {pred} ORDER BY id")
        return graft, duck
    if shape == 38:  # leakage_safe_split: random pct, joined back + grouped
        p = rng.randrange(1, 51)
        graft = (f"select s.split as split, d.lang as lang, "
                 f"cast(count(*) as bigint) as n, min(s.id) as mn, "
                 f"max(s.rep) as mx "
                 f"from leakage_safe_split(documents, {p}) as s "
                 f"join documents as d on s.id = d.doc_id "
                 f"group by s.split, d.lang order by split, lang")
        duck = ("WITH fam AS (SELECT doc_id AS id, MIN(doc_id) OVER "
                "(PARTITION BY text) AS rep FROM documents), "
                "spl AS (SELECT id, rep, CASE WHEN ((rep % 1000000) * 2654435761) "
                f"% 1000000 < {p * 10000} THEN 'test' ELSE 'train' END AS split FROM fam) "
                "SELECT s.split AS split, d.lang AS lang, COUNT(*) AS n, "
                "MIN(s.id) AS mn, MAX(s.rep) AS mx "
                "FROM spl s JOIN documents d ON s.id = d.doc_id "
                "GROUP BY 1, 2 ORDER BY 1, 2")
        return graft, duck
    # shape 39: grouped_quantiles — random group col, value col, quantile
    g = rng.choice(["source", "lang"])
    c = rng.choice(["n_chars", "doc_id"])
    qv = rng.choice(["0.25", "0.5", "0.75", "0.9"])
    graft = (f"select {g} as grp, round(q, 6) as v, n "
             f"from grouped_quantiles(documents, '{g}', '{c}', {qv}) "
             f"order by grp")
    duck = (f"SELECT {g} AS grp, ROUND(quantile_cont({c}, {qv}), 6) AS v, "
            f"count(*) AS n FROM documents GROUP BY {g} ORDER BY grp")
    return graft, duck


def gen_query(rng, only=None):
    shape = rng.choice(only) if only else rng.randrange(42)
    if shape in (40, 41):  # r11 pair shapes: gap time window / count-every
        return gen_window_query(rng, shape)
    if shape >= 37:  # table-function pair shapes
        return gen_tablefn_query(rng, shape)
    if shape >= 34:  # window-family pair shapes
        return gen_window_query(rng, shape)
    if shape == 30:  # FILTER (WHERE ...) aggregates + GROUP BY ALL
        g = rng.choice(INT_COLS)
        m = rng.randrange(3, 10)
        return (f"select {g} % {m} as g, "
                f"cast(count(*) filter (where {gen_pred(rng)}) as bigint) as cf, "
                f"cast(sum(l_linenumber) filter (where {gen_pred(rng)}) as bigint) as sf, "
                f"cast(count(*) as bigint) as n "
                f"from lineitem where {gen_pred(rng)} group by all order by g")
    if shape == 31:  # VALUES relation in FROM, joined + aggregated
        m = rng.randrange(2, 5)
        rows = ", ".join(f"({i}, '{f}')" for i, f in
                         enumerate(rng.sample(["A", "N", "R"], 2)))
        return (f"select v.tag as tag, cast(count(*) as bigint) as n, "
                f"max(l_linenumber) as mx "
                f"from (values {rows}) as v(tag, f) "
                f"join lineitem on l_returnflag = v.f "
                f"where l_suppkey % {m} = 0 and ({gen_pred(rng)}) "
                f"group by v.tag order by tag")
    if shape == 32:  # EXTRACT field breadth over naive-encoded event timestamps
        t1, t2 = gen_ts(rng)
        flds = rng.sample(["year", "month", "day", "hour", "minute"], 3)
        cols = ", ".join(f"cast(extract({f} from ts) as bigint) as c{i}"
                         for i, f in enumerate(flds))
        return (f"select event_id as k, {cols} "
                f"from events where ts >= timestamp '{t1}' and ts < timestamp '{t2}' "
                f"and user_id % {rng.randrange(2, 6)} = 0 order by k")
    if shape == 33:  # ORDER BY ALL over a grouped projection
        k1 = rng.choice(STR_COLS)
        g = rng.choice(INT_COLS)
        m = rng.randrange(2, 8)
        return (f"select {k1} as a, {g} % {m} as b, "
                f"cast(count(*) as bigint) as n, max(l_orderkey) as mx "
                f"from lineitem where {gen_pred(rng)} "
                f"group by {k1}, {g} % {m} order by all")
    if shape == 22:  # ordered aggregates: ties order by the VALUE => equal
        # strings regardless of which tied row wins, so deterministic
        s = rng.choice(STR_COLS)
        g = rng.choice(INT_COLS)
        m = rng.randrange(3, 12)
        return (f"select {g} % {m} as g, "
                f"string_agg(concat({s}, 'x'), ',' order by concat({s}, 'x')) as sa, "
                f"cast(count(*) as bigint) as n "
                f"from lineitem where {gen_pred(rng)} group by {g} % {m} order by g")
    if shape == 23:  # rank-family breadth (all tie-stable: peers share values)
        part = rng.choice(STR_COLS)
        ok = rng.choice(INT_COLS)
        return (f"select l_orderkey as k, l_linenumber as ln, {part} as p, "
                f"cast(dense_rank() over (partition by {part} order by {ok}) as bigint) as dr, "
                f"round(percent_rank() over (partition by {part} order by {ok}), 6) as pr, "
                f"round(cume_dist() over (partition by {part} order by {ok}), 6) as cd "
                f"from lineitem where {gen_pred(rng)} "
                f"order by k, ln, p, dr limit {rng.randrange(50, 400)}")
    if shape == 24:  # LEFT JOIN … IS NULL (anti-join pattern) + aggregate
        return (f"select l.{rng.choice(STR_COLS)} as g, cast(count(*) as bigint) as n, "
                f"max(l.l_linenumber) as mx "
                f"from lineitem l left join "
                f"(select o_orderkey from orders where o_custkey % {rng.randrange(2, 6)} = 0) o "
                f"on l.l_orderkey = o.o_orderkey "
                f"where o.o_orderkey is null and ({gen_pred(rng).replace('l_', 'l.l_')}) "
                f"group by l.{rng.choice(STR_COLS)}, g order by g, n, mx")
    if shape == 25:  # 3-branch set-op chain (ANSI precedence: INTERSECT
        # binds tighter; UNION/EXCEPT left-assoc — must agree with DuckDB),
        # sometimes with explicit parentheses overriding it
        a, b, c = gen_scalar(rng), gen_scalar(rng), gen_scalar(rng)
        op1 = rng.choice(["union", "union all", "except"])
        op2 = rng.choice(["union", "intersect", "except all"])
        qa = f"select {a} as v from lineitem where {gen_pred(rng)}"
        qb = f"select {b} as v from lineitem where {gen_pred(rng)}"
        qc = f"select {c} as v from lineitem where {gen_pred(rng)}"
        form = rng.randrange(3)
        if form == 1:
            return f"({qa} {op1} {qb}) {op2} {qc} order by v"
        if form == 2:
            return f"{qa} {op1} ({qb} {op2} {qc}) order by v"
        return f"{qa} {op1} {qb} {op2} {qc} order by v"
    if shape == 26:  # HAVING on aggregates NOT in the projection
        key = rng.choice(STR_COLS)
        return (f"select {key} as g, cast(count(*) as bigint) as n "
                f"from lineitem where {gen_pred(rng)} group by {key} "
                f"having max(l_linenumber) >= {rng.randrange(2, 7)} "
                f"and min(l_orderkey) < {rng.randrange(500, 4000)} "
                f"and count(distinct l_suppkey) > {rng.randrange(1, 5)} "
                f"order by g")
    if shape == 27:  # correlated LATERAL derived table (top-n per row)
        return (f"select o.o_orderkey as k, t.mx, t.n from orders o "
                f"join lateral (select max(l.l_linenumber) as mx, "
                f"cast(count(*) as bigint) as n from lineitem l "
                f"where l.l_orderkey = o.o_orderkey) as t on true "
                f"where o.o_custkey % {rng.randrange(2, 7)} = 1 and t.n > 0 "
                f"order by k limit {rng.randrange(50, 300)}")
    if shape == 28:  # NULLIF / COALESCE / GREATEST / LEAST integer chains
        c1, c2 = rng.sample(INT_COLS, 2)
        m = rng.randrange(2, 9)
        return (f"select l_orderkey as k, l_linenumber as ln, "
                f"coalesce(nullif({c1} % {m}, 0), -1) as a, "
                f"greatest({c1} % 100, {c2} % 100, {rng.randrange(1, 50)}) as b, "
                f"least({c1} % 100, {c2} % 100) as c "
                f"from lineitem where nullif({c2} % {rng.randrange(2, 5)}, 0) is "
                f"{rng.choice(['null', 'not null'])} and ({gen_pred(rng)}) "
                f"order by k, ln, a, b, c limit {rng.randrange(50, 400)}")
    if shape == 29:  # grouping() marker in ROLLUP projection + HAVING
        k1, k2 = rng.sample(STR_COLS, 2)
        return (f"select {k1} as a, {k2} as b, "
                f"cast(grouping({k1}) as bigint) as ga, "
                f"cast(grouping({k2}) as bigint) as gb, "
                f"cast(count(*) as bigint) as n "
                f"from lineitem where {gen_pred(rng)} "
                f"group by rollup ({k1}, {k2}) "
                f"having grouping({k2}) = {rng.randrange(0, 2)} "
                f"order by a nulls first, b nulls first, ga, gb, n")
    if shape == 21:  # QUALIFY over rank() (rank is tie-stable => deterministic)
        part = rng.choice(STR_COLS)
        n = rng.randrange(2, 30)
        return (f"select l_orderkey as k, l_linenumber as ln, {part} as p, "
                f"cast(rank() over (partition by {part} order by l_orderkey) as bigint) as r "
                f"from lineitem where {gen_pred(rng)} "
                f"qualify rank() over (partition by {part} order by l_orderkey) <= {n} "
                f"order by p, r, k, ln")
    if shape == 12:  # timestamp-range predicate over naive-encoded events
        t1, t2 = gen_ts(rng)
        ets = ", ".join(f"'{v}'" for v in rng.sample(EVENT_TYPES, rng.randrange(2, 4)))
        return (f"select event_id as k, event_type as et, ts, user_id as u "
                f"from events where ts >= timestamp '{t1}' and ts < timestamp '{t2}' "
                f"and (event_type in ({ets}) or user_id % {rng.randrange(2, 7)} = 0) "
                f"order by k")
    if shape == 13:  # string-function breadth (identical semantics both engines)
        s = rng.choice(STR_COLS)
        fns = rng.sample([
            f"substr({s}, 1, 1)",
            f"replace(concat(l_returnflag, l_linestatus), 'N', 'xx')",
            f"trim(concat(' ', {s}, ' '))",
            f"lower(concat({s}, 'Q'))",
            f"cast(instr(concat(l_returnflag, l_linestatus), 'O') as bigint)",
            f"upper(concat(l_linestatus, '_', l_returnflag))",
        ], 3)
        cols = ", ".join(f"{f} as c{i}" for i, f in enumerate(fns))
        return (f"select l_orderkey as k, l_linenumber as ln, {cols} "
                f"from lineitem where {gen_pred(rng)} "
                f"order by k, ln, c0, c1, c2 limit {rng.randrange(50, 400)}")
    if shape == 14:  # RANGE frame: peers share values, so ties are identical rows
        part = rng.choice(STR_COLS)
        part2 = rng.choice(STR_COLS)
        return (f"select l_orderkey as k, l_linenumber as ln, {part} as p, "
                f"cast(sum(l_linenumber) over (partition by {part} order by l_orderkey "
                f"range between unbounded preceding and current row) as bigint) as rs, "
                f"cast(count(*) over (partition by {part2} order by l_orderkey "
                f"range between unbounded preceding and current row) as bigint) as rc "
                f"from lineitem where {gen_pred(rng)} "
                f"order by k, ln, p, rs, rc limit {rng.randrange(50, 400)}")
    if shape == 15:  # explicit GROUPING SETS incl. the grand-total set
        k1, k2 = rng.sample(STR_COLS, 2)
        return (f"select {k1} as a, {k2} as b, cast(count(*) as bigint) as n, "
                f"cast(sum({rng.choice(INT_COLS)}) as bigint) as sm "
                f"from lineitem where {gen_pred(rng)} "
                f"group by grouping sets (({k1}, {k2}), ({k1}), ()) "
                f"order by a nulls first, b nulls first, n")
    if shape == 16:  # quantified comparison (ANY/ALL; = any ~ IN, <> all ~ NOT IN)
        op = rng.choice(["> all", ">= all", "< any", "<= any", "= any", "<> all"])
        return (f"select l_orderkey as k, l_linenumber as ln from lineitem "
                f"where l_orderkey {op} (select o_orderkey from orders "
                f"where o_custkey % {rng.randrange(2, 9)} = 1 "
                f"and o_orderkey < {rng.randrange(100, 4000)}) "
                f"and ({gen_pred(rng)}) order by k, ln limit {rng.randrange(50, 300)}")
    if shape == 17:  # multiset set ops
        op = rng.choice(["intersect all", "except all"])
        a, b = gen_scalar(rng), gen_scalar(rng)
        return (f"select {a} as v from lineitem where {gen_pred(rng)} "
                f"{op} select {b} as v from lineitem where {gen_pred(rng)} "
                f"order by v")
    if shape == 18:  # correlated scalar COUNT subquery in the projection
        return (f"select l.l_orderkey as k, l.l_linenumber as ln, "
                f"(select cast(count(*) as bigint) from orders o "
                f"where o.o_orderkey = l.l_orderkey "
                f"and o.o_custkey % {rng.randrange(2, 6)} = 0) as c "
                f"from lineitem l where {gen_pred(rng).replace('l_', 'l.l_')} "
                f"order by k, ln, c limit {rng.randrange(50, 300)}")
    if shape == 19:  # GROUP BY <projection alias> (round-8 ergonomics path)
        expr = rng.choice([
            "concat(l_returnflag, l_linestatus)",
            "upper(l_linestatus)",
            f"l_orderkey % {rng.randrange(3, 20)}",
        ])
        having = (f" having count(*) > {rng.randrange(1, 6)}"
                  if rng.random() < 0.5 else "")
        return (f"select {expr} as g, cast(count(*) as bigint) as n, "
                f"max(l_linenumber) as mx from lineitem "
                f"where {gen_pred(rng)} group by g{having} order by g")
    if shape == 20:  # date_trunc bucketing over events
        t1, t2 = gen_ts(rng)
        unit = rng.choice(["day", "hour"])
        return (f"select date_trunc('{unit}', ts) as d, event_type as et, "
                f"cast(count(*) as bigint) as n, "
                f"cast(sum(user_id) as bigint) as su "
                f"from events where ts >= timestamp '{t1}' and ts < timestamp '{t2}' "
                f"group by date_trunc('{unit}', ts), event_type order by d, et")
    if shape == 8:  # LEFT JOIN null semantics + coalesce
        return (f"select l.l_orderkey as k, l.l_linenumber as ln, "
                f"coalesce(o.o_orderpriority, 'NONE') as p, "
                f"case when o.o_orderkey is null then 0 else 1 end as hit "
                f"from lineitem l left join "
                f"(select * from orders where o_custkey % {rng.randrange(2, 6)} = 0) o "
                f"on l.l_orderkey = o.o_orderkey "
                f"where {gen_pred(rng).replace('l_', 'l.l_')} "
                f"order by k, ln, p, hit limit {rng.randrange(50, 400)}")
    if shape == 9:  # ROLLUP with exact aggregates (grouping-null rows)
        k1, k2 = rng.sample(STR_COLS, 2)
        return (f"select {k1} as a, {k2} as b, cast(count(*) as bigint) as n, "
                f"cast(sum({rng.choice(INT_COLS)}) as bigint) as sm "
                f"from lineitem where {gen_pred(rng)} "
                f"group by rollup ({k1}, {k2}) order by a nulls first, b nulls first, n")
    if shape == 10:  # uncorrelated scalar subquery in projection + predicate
        agg = rng.choice(["min", "max"])
        return (f"select l_orderkey as k, l_linenumber as ln, "
                f"(select {agg}(o_orderkey) from orders) as s "
                f"from lineitem where l_orderkey > "
                f"(select min(o_orderkey) + {rng.randrange(5, 500)} from orders) "
                f"and ({gen_pred(rng)}) order by k, ln, s limit {rng.randrange(50, 300)}")
    if shape == 11:  # DISTINCT projection
        a, b = gen_scalar(rng), rng.choice(STR_COLS)
        return (f"select distinct {a} as v, {b} as s from lineitem "
                f"where {gen_pred(rng)} order by v, s")
    if shape == 3:  # join + exact aggregate
        return (f"select o.o_orderpriority as g, cast(count(*) as bigint) as n, "
                f"cast(sum(l.{rng.choice(INT_COLS)}) as bigint) as sm, "
                f"max(l.l_linenumber) as mx "
                f"from lineitem l join orders o on l.l_orderkey = o.o_orderkey "
                f"where {gen_pred(rng).replace('l_', 'l.l_')} "
                f"group by o.o_orderpriority order by g")
    if shape == 4:  # set op of two exact-typed branches
        op = rng.choice(["union", "union all", "intersect", "except"])
        a, b = gen_scalar(rng), gen_scalar(rng)
        return (f"select {a} as v from lineitem where {gen_pred(rng)} "
                f"{op} select {b} as v from lineitem where {gen_pred(rng)} "
                f"order by v")
    if shape == 5:  # window aggregate over a partition (no order: deterministic)
        part = rng.choice(STR_COLS)
        return (f"select l_orderkey as k, l_linenumber as ln, {part} as p, "
                f"cast(count(*) over (partition by {part}) as bigint) as wn, "
                f"cast(sum({rng.choice(INT_COLS)}) over (partition by {part}) as bigint) as ws "
                f"from lineitem where {gen_pred(rng)} order by k, ln, p, wn, ws "
                f"limit {rng.randrange(50, 400)}")
    if shape == 6:  # EXISTS / IN correlated-ish subquery
        form = rng.randrange(3)
        if form == 0:
            sub = f"select 1 from orders o where o.o_orderkey = l.l_orderkey and o.o_custkey % {rng.randrange(2, 9)} = 0"
            return (f"select l.l_orderkey as k, cast(count(*) as bigint) as n from lineitem l "
                    f"where exists ({sub}) group by l.l_orderkey order by k")
        neg = "not " if form == 2 else ""
        # parenthesize the side predicate: the dialect (by documented
        # contract) supports IN-subqueries only as WHERE AND-conjuncts, so
        # `… and a or b` precedence would push the IN under an OR
        return (f"select l_orderkey as k, l_linenumber as ln from lineitem "
                f"where l_orderkey {neg}in (select o_orderkey from orders "
                f"where o_custkey % {rng.randrange(2, 9)} = 1) "
                f"and ({gen_pred(rng)}) order by k, ln limit {rng.randrange(50, 300)}")
    if shape == 7:  # CTE chain
        return (f"with base as (select * from lineitem where {gen_pred(rng)}), "
                f"agg as (select {gen_scalar(rng)} as g, cast(count(*) as bigint) as n "
                f"from base group by 1) "
                f"select g, n from agg where n > {rng.randrange(1, 4)} order by g")
    if shape == 0:  # projection + filter + order/limit
        parts = [gen_scalar(rng) for _ in range(rng.randrange(1, 4))] + [gen_str_scalar(rng)]
        rng.shuffle(parts)
        cols = ", ".join(f"{p} as c{i}" for i, p in enumerate(parts))
        # ORDER BY every projected column: (l_orderkey, l_linenumber) is NOT
        # unique in the driver data (14k dupes at sf0.01), so a partial sort
        # key would make LIMIT ties engine-nondeterministic; with the full
        # column list any remaining ties are identical rows
        order = ", ".join(["k", "ln"] + [f"c{i}" for i in range(len(parts))])
        return (f"select l_orderkey as k, l_linenumber as ln, {cols} from lineitem "
                f"where {gen_pred(rng)} order by {order} limit {rng.randrange(50, 400)}")
    if shape == 1:  # group by + exact aggregates
        key = gen_scalar(rng)
        aggs = ", ".join(rng.sample([
            "cast(count(*) as bigint) as n",
            f"min({rng.choice(INT_COLS)}) as mn",
            f"max({rng.choice(INT_COLS)}) as mx",
            f"cast(sum({rng.choice(INT_COLS)}) as bigint) as sm",
            f"cast(count(distinct {rng.choice(INT_COLS)}) as bigint) as nd",
            f"min({rng.choice(STR_COLS)}) as smn",
        ], rng.randrange(2, 5)))
        having = f" having count(*) > {rng.randrange(1, 5)}" if rng.random() < 0.4 else ""
        # exercise ordinal/alias resolution + sort-direction paths: the
        # key is unique per group, so any direction/null placement is
        # deterministic
        gkey = rng.choice([key, "1", "g"])
        okey = rng.choice(["g", "1", "g desc", "g desc nulls last", "g nulls first"])
        return (f"select {key} as g, {aggs} from lineitem where {gen_pred(rng)} "
                f"group by {gkey}{having} order by {okey}")
    # derived table + outer filter/aggregate
    inner_pred, outer_pred = gen_pred(rng), gen_pred(rng).replace("l_", "t.l_")
    return (f"select t.l_orderkey as k, cast(count(*) as bigint) as n, "
            f"max(t.l_linenumber) as mx from "
            f"(select * from lineitem where {inner_pred}) as t "
            f"where {outer_pred} group by t.l_orderkey order by k")


def cmd_gen(n, seed, out, only=None):
    rng = random.Random(seed)
    qs = {}
    for i in range(n):
        q = gen_query(rng, only)
        if isinstance(q, tuple):  # (graft, duck) pair: oracle sidecar entry
            qs[f"f{i:03d}"] = q[0]
            qs[f"f{i:03d}__oracle"] = q[1]
        else:
            qs[f"f{i:03d}"] = q
    json.dump(qs, open(out, "w"), indent=1)
    print(f"[fuzz] wrote {n} queries (seed={seed}) -> {out}")


def cmd_cmp(qfile, spark_dir, sf_dir):
    import duckdb
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from compare_oracle import norm_cell, table_hash  # reuse normalization
    import pandas as pd
    qs = json.load(open(qfile))
    con = duckdb.connect()
    for t in ("lineitem", "orders", "events", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = {k[:-len("__oracle")]: v for k, v in qs.items()
               if k.endswith("__oracle")}
    qs = {k: v for k, v in qs.items() if not k.endswith("__oracle")}
    n_pass = n_fail = 0
    for name, sql in sorted(qs.items()):
        files = glob.glob(os.path.join(spark_dir, name, "*.parquet"))
        if not files:
            print(f"MISS  {name} (spark produced no output)")
            n_fail += 1
            continue
        # read the spark result through duckdb (like the driver's gate):
        # UTC-adjusted parquet timestamps come back as naive-UTC, matching
        # DuckDB's read of the naive source encoding
        got = duckdb.connect().execute(
            f"SELECT * FROM read_parquet({sorted(files)!r})").fetchdf()
        want = con.execute(oracles.get(name, sql)).df()
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if table_hash(got) == table_hash(want):
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL  {name}: rows spark={len(got)} duck={len(want)}")
            print(f"  sql: {sql[:300]}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    if sys.argv[1] == "gen":
        only = ([int(x) for x in sys.argv[5].split(",")]
                if len(sys.argv) > 5 else None)
        cmd_gen(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], only)
    elif sys.argv[1] == "cmp":
        sys.exit(cmd_cmp(sys.argv[2], sys.argv[3], sys.argv[4]))
