#!/usr/bin/env python3
"""Golden end-to-end parity check for the chess pipeline.

Runs our Spark pipeline (graft.pipeline.ChessPipelineMain) on a generated PGN
fixture, then replays the REFERENCE's exact SQL semantics in DuckDB
(find-openings.ts:63-80 lateral top-1 enrichment + export-to-parquet.ts:69-94
projection/filter) over the same parsed games, and diffs the published
dataset.

PGN parsing itself has no DuckDB oracle (the chess extension is not
available), so the DuckDB side starts from our staged parse with ECO/Opening
nulled back out (fixtures carry no ECO/Opening tags, so pre-enrichment state
is exactly NULL). game_id is scoped per source load (like the reference's
per-db rowid), so the replay keys on (DataSource, game_id). Tie-break: the reference's LIMIT 1 is nondeterministic; both
sides use the documented total order (opening_ply, eco, name) DESC.

Usage: python3 tools/chess_golden.py [workdir]
"""
import os, subprocess, sys, tempfile, glob

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import duckdb
import pandas as pd

GAME = """[Event "{event}"]
[Site "S"]
[White "{white}"]
[Black "B"]
[Result "1-0"]
[UTCDate "{date}"]
[UTCTime "10:00:00"]
[TimeControl "{tc}"]
[Termination "Normal"]

{moves} 1-0
"""

OPENINGS = [
    ("B00", "King's Pawn", "1. e4", "e2e4"),
    ("C20", "King's Pawn Game", "1. e4 e5", "e2e4 e7e5"),
    ("C40", "King's Knight Opening", "1. e4 e5 2. Nf3", "e2e4 e7e5 g1f3"),
    ("C60", "Ruy Lopez", "1. e4 e5 2. Nf3 Nc6 3. Bb5", "e2e4 e7e5 g1f3 b8c6 f1b5"),
    ("B20", "Sicilian Defense", "1. e4 c5", "e2e4 c7c5"),
    ("D00", "Queen's Pawn Game", "1. d4 d5", "d2d4 d7d5"),
    ("A10", "English Opening", "1. c4", "c2c4"),
]

FIXTURE = {
    "src_a": [
        ("G1", "P1", "2020.01.15", "300+3", "1. e4 e5 2. Nf3 Nc6 3. Bb5 a6 4. Ba4 Nf6"),
        ("G2", "P2", "2020.02.20", "?", "1. d4 d5 2. c4 e6"),
        ("G3", "P3", "????.??.??", "300+3", "1. e4 c5"),         # dropped by date filter
        ("G4", "P4", "2019.11.02", "40/7200:1800", "1. g3 d5"),  # no opening match
    ],
    "src_b": [
        ("G5", "P5", "2021.03.10", "600", "1. e4 c5 2. Nf3 d6"),
        ("G6", "P6", "1499.01.01", "600", "1. e4 e5"),           # year < 1500 dropped
        ("G7", "P7", "2021.07.04", "-", "1. c4 e5 2. Nc3"),
    ],
}


def main(workdir=None):
    d = workdir or tempfile.mkdtemp(prefix="chess_golden_")
    for src, games in FIXTURE.items():
        os.makedirs(f"{d}/in/{src}", exist_ok=True)
        with open(f"{d}/in/{src}/games.pgn", "w") as f:
            f.write("\n".join(GAME.format(event=e, white=w, date=dt, tc=tc, moves=m)
                              for e, w, dt, tc, m in games))
    con = duckdb.connect()
    con.execute("CREATE TABLE op (eco VARCHAR, name VARCHAR, pgn VARCHAR, uci VARCHAR)")
    con.executemany("INSERT INTO op VALUES (?,?,?,?)", OPENINGS)
    con.execute(f"COPY op TO '{d}/openings.parquet' (FORMAT PARQUET)")

    # --- run our pipeline ---
    r = subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.pipeline.ChessPipelineMain {d}/in {d}/openings.parquet {d}/staging {d}/out"],
        cwd=REPO, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-3000:])
        return 1

    # --- DuckDB replay of the reference SQL ---
    con.execute(f"""
        CREATE TABLE games AS
        SELECT * REPLACE (CAST(NULL AS VARCHAR) AS ECO, CAST(NULL AS VARCHAR) AS Opening)
        FROM read_parquet('{d}/staging/*/*.parquet')
    """)
    # find-openings.ts:63-80 (lateral top-1 match, deterministic order).
    # Match predicate: anchored prefix + word boundary, NOT the reference's
    # raw CONTAINS — deliberate documented divergence (OpeningEnrichment
    # scaladoc / SURVEY §7): CONTAINS also hits interior substrings
    # ("11. e4" contains "1. e4"), mislabeling games; the pipeline's trie
    # form and this oracle share the anchored semantics.
    con.execute("""
        CREATE TABLE openings_with_ply AS
        SELECT *, array_length(string_split(uci, ' ')) AS opening_ply FROM op
    """)
    con.execute("""
        UPDATE games m SET ECO = o.eco, Opening = o.name
        FROM (SELECT t.DataSource, t.game_id, o.eco, o.name
              FROM (SELECT DataSource, game_id, clean_movetext FROM games WHERE Opening IS NULL) t
              JOIN LATERAL (
                  SELECT eco, name FROM openings_with_ply o
                  WHERE starts_with(t.clean_movetext, o.pgn)
                    AND (length(t.clean_movetext) = length(o.pgn)
                         OR substr(t.clean_movetext, length(o.pgn) + 1, 1) = ' ')
                  ORDER BY opening_ply DESC, eco DESC, name DESC LIMIT 1) o ON TRUE
             ) o
        WHERE m.game_id = o.game_id AND m.DataSource = o.DataSource
    """)
    # export-to-parquet.ts:69-94 projection + filter
    duck = con.execute("""
        SELECT Event, Site, White, Black, Result, WhiteTitle, BlackTitle,
               WhiteElo, BlackElo, UTCDate, UTCTime, ECO, Opening, Termination,
               COALESCE(clean_timecontrol, TimeControl) AS TimeControl,
               Source, movetext, DataSource,
               year(UTCDate) AS year, strftime(UTCDate, '%m') AS month
        FROM games
        WHERE UTCDate IS NOT NULL AND year(UTCDate) >= 1500
    """).df()

    ours = con.execute(f"""
        SELECT * FROM read_parquet('{d}/out/**/*.parquet', hive_partitioning=true)
    """).df()

    def canon(df):
        df = df.reindex(sorted(df.columns, key=str.lower), axis=1)
        df.columns = [c.lower() for c in df.columns]
        for c in df.columns:
            df[c] = df[c].astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)

    a, b = canon(ours), canon(duck)
    if list(a.columns) != list(b.columns):
        print("FAIL column mismatch"); print(a.columns); print(b.columns); return 1
    if not a.equals(b):
        print("FAIL value mismatch")
        neq = ~(a.eq(b))
        print(pd.concat([a[neq.any(axis=1)], b[neq.any(axis=1)]], keys=["spark", "duck"]).to_string())
        return 1
    print(f"PASS chess golden: {len(a)} published rows match reference SQL replay exactly")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else None))
