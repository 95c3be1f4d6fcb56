#!/usr/bin/env python3
"""Build the ADVERSARIAL differential tier (round 10).

Usage: python3 tools/make_adversarial.py <outDir> [seed]

The optional integer seed re-rolls the random filler (edge rows and
mutations stay fixed) so repeated fuzz runs explore different
tie/skew/value layouts; default 0 reproduces the canonical tier.

Pass --hot (as the seed slot's successor arg) to ALSO append 1,100
byte-identical documents (doc_id 500..1599) — one more than the
minhash/simhash hot-bucket cap of 1000 — so the production cap and its
oracle HAVING-count mirror both TRIGGER and must drop identical
buckets. No driver fixture has ever exercised the cap through the
oracle compare; DedupScaleSpec pins only the Spark side.

Pass --nulls (round 11) to plant NULLs on deterministic indices in the
nullable-typed payload columns — documents.text (+ n_chars, NULL iff
text NULL), events.value, events.props — while keys/group domains stay
NOT NULL. The base fixtures are NULL-free by declaration, so NULLs
otherwise reach queries only via outer joins/rollups; this tier pushes
them through every expression, aggregate-skip, coalesce/nullif, and
NULLS FIRST/LAST ordering path end-to-end through the oracle compare.

Copies every sf0.001 base table except documents, then generates a
500-doc documents.parquet that keeps the DECLARED fixture invariants —
doc_id unique 0..499 (the embeddings join domain), n_chars =
length(text) in code points, lang/source in the fixture domains, no
NULLs — while filling text with everything the pristine fixture never
contains: empty strings, multi-space runs, leading/trailing spaces,
unicode (accents, CJK, astral emoji, combining marks), CSV/JSON-hostile
bytes (quotes, commas, newlines, tabs, backslashes), regex
metacharacters, \b-boundary edge cases around the scrub token 'dup',
PII-like strings, pathological repetition, and an extreme lang skew
(one lang owns a single doc). Running graft.Verify + diffcheck.py over
this tier differentially fuzzes EVERY documents-consuming oracle pair
on data the driver fixtures cannot exercise; a FAIL here is either a
real cross-engine divergence or an undeclared data assumption to pin.

Deterministic: fixed seed, no wall-clock.
"""
import sys, os, shutil, random
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]
SRC = "/root/testdata/sf0.001"

LANGS = ["de", "en", "es", "fr", "zh"]   # en gets the bulk; zh exactly 1 doc
SOURCES = [f"src{i}" for i in range(20)]

VOCAB = ["the", "data", "spark", "merge", "dup", "window", "scan", "join"]

EDGE_TEXTS = [
    "",                                  # empty doc
    " ",                                 # single space
    "   ",                               # spaces only
    "a",                                 # single char
    "dup",                               # exactly the scrub token
    "dup dup dup dup dup",               # scrub token repetition
    "duplicate induplicate dup-hyphen dup.",  # \b boundary cases
    "  leading and trailing  ",          # edge spaces + double space
    "tab\there and\nnewline and\rcarriage",   # control chars
    'quote " comma , semicolon ; pipe |',     # CSV-hostile
    "backslash \\ and \\n literal and json } ] chars",
    "unicode café straße über naïve",
    "cjk 中文文本处理 mixed ascii",
    "emoji \U0001F600 \U0001F680 astral plane",
    "combining é à marks",
    "regex .* meta [chars] (group) {brace} ^caret$ plus+ question?",
    "email-like a.b@example.com and phone-like 555-867-5309 here",
    "number-looking 3.14159 -42 1e10 NaN null NULL true",
    "a b a b a b a b a b a b a b a b a b a b",   # max repetition
    "supercalifragilisticexpialidociouswordthatneverends " * 3,  # long words
    "x" * 400,                           # one 400-char word
    ("loremipsum " * 40).strip(),        # long doc, one distinct word
    # LONG docs (round-10 continuation): every other tier tops out near
    # 400 chars, so expression loops (BPE count, winnowing, shingling)
    # and regex scans had never run at length cross-engine. ~30 KB with
    # a rotating vocabulary (≈6k shingles/doc) and ~24 KB of one
    # repeated sentence (pathological repetition at length).
    " ".join(f"v{i % 97}q{i % 13}" for i in range(4800)),
    ("the quick brown fox jumps over the lazy dog again and again " * 400
     ).strip(),
]


def make_events(con, outdir, rng, nulls=False):
    """Adversarial events: unique event_id 0..999 and in-domain
    event_type / valid-JSON props (the DECLARED input contracts — a
    malformed props diverges by design: Spark's get_json_object is
    lenient-NULL, DuckDB's json_extract_string errors), but everything
    else hostile: 20 events on ONE identical microsecond + exact
    hour-boundary timestamps (window-assignment and tie-order stress),
    user 0 owning ~70% of events (skew), values negative / zero / 1e-7
    / micro-exactness edges, event_type 'error' appearing exactly
    once. With nulls=True, value (i%17==0) and props (i%13==0) go NULL
    on deterministic indices — NULL json input and NULL aggregation
    inputs, cross-engine (see the --nulls note in main())."""
    rows = []
    base = "2024-01-{d:02d} {h:02d}:{m:02d}:{s:02d}.{us:06d}"
    types = ["click", "view", "purchase", "signup", "error"]
    for i in range(1000):
        if i < 20:       # one shared microsecond: total tie cluster
            ts = "2024-01-05 10:30:00.000000"
        elif i < 40:     # exact hour boundaries: [start, end) edges
            ts = base.format(d=6 + (i - 20) // 4, h=(i - 20) % 24,
                             m=0, s=0, us=0)
        else:
            ts = base.format(d=1 + rng.randrange(28), h=rng.randrange(24),
                             m=rng.randrange(60), s=rng.randrange(60),
                             us=rng.randrange(1000000))
        user = 0 if rng.random() < 0.70 else rng.randrange(1, 15)
        etype = "error" if i == 500 else rng.choice(
            [t for t in types if t != "error"])
        value = rng.choice([
            -123.45, 0.0, 1e-7, 0.01, -0.01, 123456.789012,
            round(rng.uniform(0.01, 500.0), 2)])
        k = rng.choice(['{"k": 0}', '{"k": -5}', '{}', '{"k": null}',
                        '{"k": 9007199254740993}',
                        f'{{"k": {rng.randrange(100)}}}'])
        if nulls and i % 17 == 0:
            value = None
        if nulls and i % 13 == 0:
            k = None
        rows.append((i, ts, user, etype, value, k))
    con.execute("CREATE TABLE ev (event_id BIGINT, ts TIMESTAMP, "
                "user_id BIGINT, event_type VARCHAR, value DOUBLE, "
                "props VARCHAR)")
    con.executemany("INSERT INTO ev VALUES (?, ?, ?, ?, ?, ?)", rows)
    con.execute(f"COPY ev TO '{outdir}/events.parquet' (FORMAT parquet)")
    n = con.execute("SELECT count(*), count(DISTINCT event_id), "
                    "count(*) FILTER (NOT json_valid(props)) FROM ev"
                    ).fetchone()
    print(f"wrote {outdir}/events.parquet: rows={n[0]} unique_ids={n[1]} "
          f"invalid_props={n[2]}")
    assert n[0] == 1000 and n[1] == 1000 and n[2] == 0


def make_embeddings(con, outdir, rng):
    """Adversarial embeddings: unique vec_id 0..499, 64-dim FLOAT
    vectors, finite values within the micros-integerization contract
    (|x| ≲ 1e3 — the IVF/k-means exact-integer recompute rounds x*1e6
    into BIGINT, so magnitudes beyond ~9e12 are OUT of contract, as are
    NaN/Inf), but hostile inside it: an all-zero QUERY vector (vec_id
    3) and two all-zero candidates (cosine undefined → declared NULL,
    both engines rank them last), exact duplicate candidates (rank
    tie → c_id tiebreak), a candidate identical to query 1 (cosine
    exactly 1), ±999.9 extremes and 1e-30 near-denormals."""
    rows = []
    for i in range(500):
        if i in (3, 100, 101):
            v = [0.0] * 64
        elif i == 120:
            rng_q = random.Random(777);  v = [rng_q.uniform(-1, 1) for _ in range(64)]
        elif i == 1:
            rng_q = random.Random(777);  v = [rng_q.uniform(-1, 1) for _ in range(64)]
        elif i in (110, 111):
            rng_d = random.Random(888);  v = [rng_d.uniform(-1, 1) for _ in range(64)]
        elif i == 130:
            v = [999.9 if j % 2 == 0 else -999.9 for j in range(64)]
        elif i == 131:
            v = [1e-30] * 64
        else:
            v = [rng.uniform(-1, 1) for _ in range(64)]
        rows.append((i, v, i % 10))
    con.execute("CREATE TABLE emb (vec_id BIGINT, embedding FLOAT[], "
                "label INTEGER)")
    con.executemany("INSERT INTO emb VALUES (?, ?, ?)", rows)
    con.execute(f"COPY emb TO '{outdir}/embeddings.parquet' (FORMAT parquet)")
    n = con.execute("SELECT count(*), count(DISTINCT vec_id), "
                    "count(*) FILTER (len(embedding) <> 64) FROM emb"
                    ).fetchone()
    print(f"wrote {outdir}/embeddings.parquet: rows={n[0]} "
          f"unique_ids={n[1]} wrong_dim={n[2]}")
    assert n[0] == 500 and n[1] == 500 and n[2] == 0


def mutate_tpch(con, outdir):
    """Adversarial TPC-H mutations over the sf0.001 copies — FKs and
    declared bounds preserved (o_orderkey stays < 1e6 for the argmax
    uniqueness contract; money stays 2-dp for the cents/micros
    exactness contract), but the shapes the generator never makes:
    ORDER-DATE TIES inside one customer's window partition (running
    sums over a tied sort key are layout-dependent unless the sort is
    total), an order with ZERO lineitems (left/anti-join edges), a
    customer with extreme ±acctbal, and zero-discount/zero-tax rows."""
    con.execute(f"CREATE TABLE o AS SELECT * FROM "
                f"read_parquet('{outdir}/orders.parquet')")
    # give one active customer five orders on the SAME date
    ck = con.execute("SELECT o_custkey FROM o GROUP BY 1 "
                     "ORDER BY count(*) DESC, o_custkey LIMIT 1"
                     ).fetchone()[0]
    con.execute(f"""UPDATE o SET o_orderdate = DATE '1995-06-15'
        WHERE o_orderkey IN (SELECT o_orderkey FROM o
          WHERE o_custkey = {ck} ORDER BY o_orderkey LIMIT 5)""")
    # an order with no lineitems, priced at the 2-dp extremes
    # (fixture orders schema: orderkey, custkey, status, totalprice,
    # orderdate, orderpriority — NOT the full TPC-H column set)
    mx = con.execute("SELECT max(o_orderkey) FROM o").fetchone()[0]
    assert mx + 2 < 1000000, "orderkey headroom for the argmax contract"
    con.execute(f"""INSERT INTO o SELECT {mx + 1}, o_custkey, 'O',
        0.01, TIMESTAMP '1992-01-01 00:00:00', o_orderpriority
        FROM o LIMIT 1""")
    con.execute(f"COPY o TO '{outdir}/orders.parquet' (FORMAT parquet)")
    con.execute(f"CREATE TABLE li AS SELECT * FROM "
                f"read_parquet('{outdir}/lineitem.parquet')")
    con.execute("UPDATE li SET l_discount = 0.0, l_tax = 0.0 "
                "WHERE l_linenumber = 1 AND l_orderkey % 7 = 0")
    con.execute(f"COPY li TO '{outdir}/lineitem.parquet' (FORMAT parquet)")
    con.execute(f"CREATE TABLE c AS SELECT * FROM "
                f"read_parquet('{outdir}/customer.parquet')")
    con.execute("UPDATE c SET c_acctbal = -999.99 WHERE c_custkey % 97 = 0")
    con.execute("UPDATE c SET c_acctbal = 9999.99 WHERE c_custkey % 89 = 0")
    con.execute(f"COPY c TO '{outdir}/customer.parquet' (FORMAT parquet)")
    print(f"mutated orders/lineitem/customer in {outdir} "
          f"(date-tie custkey={ck}, empty order={mx + 1})")


def make_sparse(outdir, seed):
    """SPARSE tier (--sparse): the anti-adversarial — drive every
    duplicate-finding family to ZERO output rows. 500 documents whose
    token sets are pairwise disjoint (token j of doc i is the literal
    "w{i}x{j}" — no shingle, line, or URL ever repeats across docs) and
    500 fresh uniform-random embeddings with no planted duplicates or
    zeros. Base TPC-H + events are copied UNMODIFIED from sf0.001.

    Why: the dedup/near-dup/boilerplate/url oracles all end in a
    HAVING/COUNT>1-style gate, so on this tier both engines must emit
    EMPTY results — a class no fixture or prior fuzz tier has ever
    pushed through the full compare. This proves the empty-output path
    end-to-end: Verify's coalesce(1) still writes a schema-bearing
    parquet for 0 rows, DuckDB reads it, columns/types/row-count/hash
    all match on nothing. Invariants preserved: doc_id unique 0..499,
    n_chars = length(text), lang/source in the fixture domains, no
    NULLs; vec_id unique 0..499, 64-dim finite floats in (-1, 1)."""
    os.makedirs(outdir, exist_ok=True)
    for t in TABLES + ["events"]:
        shutil.copy(os.path.join(SRC, f"{t}.parquet"),
                    os.path.join(outdir, f"{t}.parquet"))
    rng = random.Random(20260817 + seed)
    con = duckdb.connect()
    rows = []
    for i in range(500):
        text = " ".join(f"w{i}x{j}" for j in range(3 + i % 40))
        lang = LANGS[i % 4] if i < 499 else "zh"
        rows.append((i, text, lang, SOURCES[i % len(SOURCES)], len(text)))
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
                "source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?, ?, ?)", rows)
    con.execute(f"COPY d TO '{outdir}/documents.parquet' (FORMAT parquet)")
    erows = [(i, [rng.uniform(-1, 1) for _ in range(64)], i % 10)
             for i in range(500)]
    con.execute("CREATE TABLE emb (vec_id BIGINT, embedding FLOAT[], "
                "label INTEGER)")
    con.executemany("INSERT INTO emb VALUES (?, ?, ?)", erows)
    con.execute(f"COPY emb TO '{outdir}/embeddings.parquet' (FORMAT parquet)")
    n = con.execute("SELECT count(*), count(DISTINCT doc_id), "
                    "count(*) FILTER (n_chars <> length(text)) FROM d"
                    ).fetchone()
    print(f"wrote SPARSE {outdir}/documents.parquet: rows={n[0]} "
          f"unique_ids={n[1]} nchars_mismatch={n[2]}")
    assert n[0] == 500 and n[1] == 500 and n[2] == 0


def make_scale(outdir, seed, decade=1):
    """SCALE-DECADE tier (--scale, round 13): a 5-10x sf0.1-equivalent
    built by invariant-preserving replication of /root/testdata/sf0.1 —
    the next decade of the r11 scaling audit (sf0.01 -> sf0.1 -> this).

    Row counts: lineitem 5.4M (9x), orders 900k (6x), events 1M (10x),
    documents 50k (10x), embeddings 20k (10x); dims (region/nation/
    customer/supplier/part) stay at sf0.1 size like real star schemas.

    Replication preserves every declared contract:
      - orders: o_orderkey + r*150000 for 6 replicas -> max 899,999,
        UNDER the o_orderkey < 1e6 argmax-encoding bound; FKs intact.
      - lineitem: 9 replicas, replica r joins order replica r%6 (so
        three order replicas carry doubled lineitems — (orderkey,
        linenumber) is declared NON-unique, and §2.8 total-ordering
        discipline already covers tie clusters).
      - events: event_id + r*100000 stays unique; ts shifts r*97 hours
        (not a day/week multiple — no calendar aliasing) so sessions/
        windows GROW with data instead of piling onto one month.
      - documents: doc_id + r*5000 keeps doc_id%10 bench-split ratios;
        replica r>0 suffixes EVERY token with 'z{r}' so cross-replica
        shingle/line/term spaces are DISJOINT — dedup/decontam pair
        volume scales LINEARLY (replicating texts verbatim would make
        every doc a 10-way exact dup and square the pair work, which is
        the degenerate --hot shape, not the scale shape). n_chars
        recomputed = length(text) in code points.
      - embeddings: replica 0 verbatim (keeps the vec_id<10 query set
        and every planted structure); replicas r>0 are FRESH seeded
        uniform vectors with labels +r*10, so the label-blocked
        brute-force families keep ~200 vectors/block (pair work scales
        linearly — more data means more categories, and past that scale
        the LSH/IVF family is the production path anyway).
    """
    # decade=2 (--scale2, r13 cont.): the THIRD decade of the audit —
    # lineitem x81 (48.6M; joins order replica r%6, so (orderkey,
    # linenumber) tie clusters grow ~13x — declared non-unique, total-
    # ordering discipline already covers it), events/documents/
    # embeddings x100 (10M / 500k / 200k). Orders stays at 6 replicas:
    # the o_orderkey < 1e6 argmax-encoding bound is a hard contract, and
    # real warehouses grow fact tables faster than header tables anyway.
    lrep, orep, erep, drep, brep = (
        (9, 6, 10, 10, 10) if decade == 1 else (81, 6, 100, 100, 100))
    src = "/root/testdata/sf0.1"
    os.makedirs(outdir, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part"]:
        shutil.copy(os.path.join(src, f"{t}.parquet"),
                    os.path.join(outdir, f"{t}.parquet"))
    con = duckdb.connect()
    con.execute(f"""COPY (
        SELECT b.o_orderkey + r.r * 150000 AS o_orderkey,
               b.* EXCLUDE (o_orderkey)
        FROM read_parquet('{src}/orders.parquet') b, range({orep}) r(r)
      ) TO '{outdir}/orders.parquet' (FORMAT parquet)""")
    con.execute(f"""COPY (
        SELECT b.l_orderkey + (r.r % {orep}) * 150000 AS l_orderkey,
               b.* EXCLUDE (l_orderkey)
        FROM read_parquet('{src}/lineitem.parquet') b, range({lrep}) r(r)
      ) TO '{outdir}/lineitem.parquet' (FORMAT parquet)""")
    con.execute(f"""COPY (
        SELECT b.event_id + r.r * 100000 AS event_id,
               b.ts + r.r * INTERVAL 97 HOUR AS ts,
               b.* EXCLUDE (event_id, ts)
        FROM read_parquet('{src}/events.parquet') b, range({erep}) r(r)
      ) TO '{outdir}/events.parquet' (FORMAT parquet)""")
    con.execute(f"""COPY (
        SELECT doc_id, text, lang, source,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM (
          SELECT b.doc_id + r.r * 5000 AS doc_id,
                 CASE WHEN r.r = 0 THEN b.text
                      ELSE array_to_string(list_transform(
                        string_split(b.text, ' '),
                        x -> x || 'z' || CAST(r.r AS VARCHAR)), ' ')
                 END AS text,
                 b.lang, b.source
          FROM read_parquet('{src}/documents.parquet') b, range({drep}) r(r))
      ) TO '{outdir}/documents.parquet' (FORMAT parquet)""")
    rng = random.Random(20260818 + seed)
    erows = [(r * 2000 + i,
              [rng.uniform(-1, 1) for _ in range(64)],
              (i % 10) + r * 10)
             for r in range(1, brep) for i in range(2000)]
    con.execute(f"CREATE TABLE emb AS SELECT * FROM "
                f"read_parquet('{src}/embeddings.parquet')")
    con.executemany("INSERT INTO emb VALUES (?, ?, ?)", erows)
    con.execute(f"COPY emb TO '{outdir}/embeddings.parquet' (FORMAT parquet)")
    chk = con.execute(f"""SELECT
        (SELECT count(*) FROM read_parquet('{outdir}/lineitem.parquet')),
        (SELECT count(*) - count(DISTINCT o_orderkey) FROM read_parquet('{outdir}/orders.parquet')),
        (SELECT max(o_orderkey) FROM read_parquet('{outdir}/orders.parquet')),
        (SELECT count(*) - count(DISTINCT event_id) FROM read_parquet('{outdir}/events.parquet')),
        (SELECT count(*) FILTER (n_chars <> length(text)) FROM read_parquet('{outdir}/documents.parquet')),
        (SELECT count(*) - count(DISTINCT doc_id) FROM read_parquet('{outdir}/documents.parquet')),
        (SELECT count(*) - count(DISTINCT vec_id) FROM read_parquet('{outdir}/embeddings.parquet')),
        (SELECT count(DISTINCT label) FROM read_parquet('{outdir}/embeddings.parquet'))
        """).fetchone()
    print(f"wrote SCALE tier {outdir}: lineitem={chk[0]} "
          f"max_orderkey={chk[2]} labels={chk[7]}")
    assert chk[0] == 600000 * lrep and chk[1] == 0 and chk[2] < 1000000
    assert chk[3] == 0 and chk[4] == 0 and chk[5] == 0 and chk[6] == 0
    assert chk[7] == brep * 10


def make_empty(outdir):
    """EMPTY tier (--empty, round 11): zero-row documents, events AND
    embeddings (schemas preserved), TPC-H copied unmodified — the
    zero-INPUT boundary (--sparse proves zero OUTPUT on populated
    inputs; this proves the engine over inputs with no rows at all:
    empty aggregations, empty streams, empty dedup/text/pack families,
    empty ANN index builds, all through the full oracle compare).
    Found q_stream_upsert's min/max-of-empty ROW_VALUE_IS_NULL crash
    and q_vec_ann_ivf's empty-training-sample crash the day it was
    added."""
    os.makedirs(outdir, exist_ok=True)
    for t in TABLES:
        shutil.copy(os.path.join(SRC, f"{t}.parquet"),
                    os.path.join(outdir, f"{t}.parquet"))
    con = duckdb.connect()
    for t, schema in (
        ("documents", "doc_id BIGINT, text VARCHAR, lang VARCHAR, "
                      "source VARCHAR, n_chars BIGINT"),
        ("events", "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
                   "event_type VARCHAR, value DOUBLE, props VARCHAR"),
        ("embeddings", "vec_id BIGINT, embedding FLOAT[], label INTEGER")):
        con.execute(f"CREATE TABLE {t} ({schema})")
        con.execute(f"COPY {t} TO '{outdir}/{t}.parquet' (FORMAT parquet)")
        n = con.execute(f"SELECT count(*) FROM "
                        f"read_parquet('{outdir}/{t}.parquet')").fetchone()[0]
        print(f"wrote EMPTY {outdir}/{t}.parquet: rows={n}")
        assert n == 0


def make_one(outdir):
    """ONE tier (--one, round 11): exactly ONE row in each payload
    table (documents, events, embeddings — lowest doc_id/event_id/
    vec_id of sf0.001), TPC-H unmodified — the single-row boundary
    between --empty and normal. Windows over one row, quantiles of a
    single value, a 2-member ensemble whose odd-id member is EMPTY
    (found the alignMembers inference-vs-declared-count divergence the
    day it was added), self-joins with no partner rows."""
    os.makedirs(outdir, exist_ok=True)
    for t in TABLES:
        shutil.copy(os.path.join(SRC, f"{t}.parquet"),
                    os.path.join(outdir, f"{t}.parquet"))
    con = duckdb.connect()
    for t, key in (("documents", "doc_id"), ("events", "event_id"),
                   ("embeddings", "vec_id")):
        con.execute(f"CREATE TABLE {t} AS SELECT * FROM read_parquet("
                    f"'{SRC}/{t}.parquet') ORDER BY {key} LIMIT 1")
        con.execute(f"COPY {t} TO '{outdir}/{t}.parquet' (FORMAT parquet)")
        n = con.execute(f"SELECT count(*) FROM read_parquet("
                        f"'{outdir}/{t}.parquet')").fetchone()[0]
        print(f"wrote ONE {outdir}/{t}.parquet: rows={n}")
        assert n == 1


def main(outdir, seed=0, hot=False, nulls=False):
    os.makedirs(outdir, exist_ok=True)
    for t in TABLES:
        shutil.copy(os.path.join(SRC, f"{t}.parquet"),
                    os.path.join(outdir, f"{t}.parquet"))
    rng = random.Random(20260814 + seed)
    rows = []
    for i in range(500):
        if i < len(EDGE_TEXTS):
            text = EDGE_TEXTS[i]
        else:
            # filler in the fixture's own style so aggregates stay busy,
            # with a 10% chance of one embedded edge token
            words = [rng.choice(VOCAB) for _ in range(rng.randint(3, 60))]
            if rng.random() < 0.10:
                words.insert(rng.randrange(len(words)),
                             rng.choice(["café", '"', ",", "\\", "(x)",
                                         "中文", "a@b.co"]))
            text = " ".join(words)
        # extreme skew: doc 499 is the ONLY zh doc; others round-robin
        lang = "zh" if i == 499 else LANGS[i % 4]
        # --nulls (round 11, VERDICT r10 #2): the base fixtures are
        # NULL-free by declaration (FIXTURES.md §2), so NULLs normally
        # enter queries only via outer joins / rollups. This tier relaxes
        # that for the nullable-typed payload columns — documents.text
        # (and its derived n_chars, kept consistent: NULL iff text NULL),
        # events.props, events.value — planting them on deterministic
        # FILLER indices (the curated EDGE_TEXTS rows keep their shapes),
        # so every coalesce/nullif, NULL-propagating expression, and
        # NULLS FIRST/LAST ordering clause is fuzzed cross-engine from
        # the data side. Keys stay NOT NULL: doc_id/lang/source remain
        # join/group domains.
        if nulls and i >= len(EDGE_TEXTS) and i % 11 == 0:
            rows.append((i, None, lang, SOURCES[i % len(SOURCES)], None))
        else:
            rows.append((i, text, lang, SOURCES[i % len(SOURCES)], len(text)))
    if hot:
        # 1,100 byte-identical docs: every (band, bval) LSH bucket they
        # share holds 1,100 > the 1,000 cap, so BOTH engines must drop
        # those buckets entirely — pairs among these docs may only come
        # from the uncapped shingle-Jaccard path
        hot_text = ("hot duplicate corpus body text payload sentence "
                    "repeated identically across many documents")
        for i in range(500, 1600):
            rows.append((i, hot_text, "en", "src0", len(hot_text)))
    con = duckdb.connect()
    mutate_tpch(con, outdir)
    make_events(con, outdir, random.Random(20260815 + seed), nulls=nulls)
    make_embeddings(con, outdir, random.Random(20260816 + seed))
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
                "source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?, ?, ?)", rows)
    con.execute(f"COPY d TO '{outdir}/documents.parquet' (FORMAT parquet)")
    n = con.execute("SELECT count(*), count(DISTINCT doc_id), "
                    "count(*) FILTER (n_chars <> length(text)), "
                    "count(*) FILTER ((text IS NULL) <> (n_chars IS NULL)), "
                    "count(*) FILTER (text IS NULL) FROM d").fetchone()
    total = 1600 if hot else 500
    print(f"wrote {outdir}/documents.parquet: rows={n[0]} "
          f"unique_ids={n[1]} nchars_mismatch={n[2]} null_docs={n[4]}")
    assert n[0] == total and n[1] == total and n[2] == 0 and n[3] == 0
    assert (n[4] > 0) == nulls  # the tier does (and only does) what it says


FLAGS = ("--hot", "--sparse", "--nulls", "--empty", "--one", "--scale", "--scale2")

if __name__ == "__main__":
    # reject any unrecognized -flag up front: a misspelled one used to
    # fall into the positional args and crash as int('--spars') with a
    # raw traceback, or silently shift the seed slot (r11 review advice;
    # single-dash typos like '-hot' covered too — a leading '-' is only
    # legitimate on a [non-negative-by-convention] integer seed)
    def is_int(a):
        try:
            int(a); return True
        except ValueError:
            return False
    bad = [a for a in sys.argv[1:]
           if a.startswith("-") and a not in FLAGS and not is_int(a)]
    if bad:
        sys.exit(f"unrecognized flag(s): {' '.join(bad)}\n"
                 f"usage: make_adversarial.py <outDir> [seed] "
                 f"[--hot | --sparse | --nulls | --empty | --one | --scale]")
    flags = [a for a in sys.argv[1:] if a in FLAGS]
    if len(flags) > 1:
        sys.exit(f"{' and '.join(flags)} are mutually exclusive tiers "
                 "(hot triggers the LSH caps, sparse has no duplicates "
                 "at all, nulls plants NULL payloads, empty has no "
                 "document/event rows) — pick one")
    args = [a for a in sys.argv[1:] if a not in FLAGS]
    if not args:
        sys.exit("usage: make_adversarial.py <outDir> [seed] "
                 "[--hot | --sparse | --nulls | --empty | --one | --scale]")
    if len(args) > 1 and ("--empty" in flags or "--one" in flags):
        # r11 advice: these tiers are fully deterministic (no RNG), so a
        # seed positional would silently have no effect and corrupt
        # tier-reproduction bookkeeping — reject it loudly instead
        sys.exit(f"{flags[0]} takes no seed (the tier is deterministic); "
                 f"got extra positional arg(s): {' '.join(args[1:])}")
    seed = int(args[1]) if len(args) > 1 else 0
    if "--sparse" in flags:
        make_sparse(args[0], seed)
    elif "--empty" in flags:
        make_empty(args[0])
    elif "--one" in flags:
        make_one(args[0])
    elif "--scale" in flags:
        make_scale(args[0], seed)
    elif "--scale2" in flags:
        make_scale(args[0], seed, decade=2)
    else:
        main(args[0], seed, hot="--hot" in flags, nulls="--nulls" in flags)
