#!/usr/bin/env python3
"""Build the ADVERSARIAL differential tier (round 10).

Usage: python3 tools/make_adversarial.py <outDir>

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
          "lineitem", "events", "embeddings"]
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
]


def main(outdir):
    os.makedirs(outdir, exist_ok=True)
    for t in TABLES:
        shutil.copy(os.path.join(SRC, f"{t}.parquet"),
                    os.path.join(outdir, f"{t}.parquet"))
    rng = random.Random(20260814)
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
        rows.append((i, text, lang, SOURCES[i % len(SOURCES)], len(text)))
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
                "source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?, ?, ?)", rows)
    con.execute(f"COPY d TO '{outdir}/documents.parquet' (FORMAT parquet)")
    n = con.execute("SELECT count(*), count(DISTINCT doc_id), "
                    "count(*) FILTER (n_chars <> length(text)) FROM d"
                    ).fetchone()
    print(f"wrote {outdir}/documents.parquet: rows={n[0]} "
          f"unique_ids={n[1]} nchars_mismatch={n[2]}")
    assert n[0] == 500 and n[1] == 500 and n[2] == 0


if __name__ == "__main__":
    main(sys.argv[1])
