#!/usr/bin/env python3
"""Generate the committed q35 oracle table (DuckDB replay of the reference SQL).

The q35 gate query runs the full chess stack over the bundled PGN fixture.
PGN parsing has no cross-engine oracle (the reference's chess extension is
closed), but everything downstream of the parse does: this tool dumps the
pre-enrichment parse via graft.tools.Q35GoldenDump, replays the REFERENCE's
enrichment + export SQL in DuckDB (find-openings.ts:63-80 lateral top-1 with
the documented anchored-prefix divergence + deterministic tie-break, then
export-to-parquet.ts:69-94 projection/filter), and writes the expected table
to src/test/resources/graft/golden/q35_expected.parquet. That file is the
driver's q35 oracle: SparkEntry.oracleSql reads it with read_parquet(), so
the driver hash-compares Spark's q35 output against an independent DuckDB
execution instead of recording a rows-only check.

Regenerate ONLY when the fixture, the fixture openings, or the export
projection changes: python3 tools/q35_golden.py
"""
import os, subprocess, sys, tempfile
import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "src/test/resources/graft/golden/q35_expected.parquet")


def main():
    d = tempfile.mkdtemp(prefix="q35_golden_")
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.tools.Q35GoldenDump {d}"],
        cwd=REPO, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-3000:])
        return 1

    con = duckdb.connect()
    con.execute(f"""
        CREATE TABLE games AS
        SELECT * REPLACE (CAST(NULL AS VARCHAR) AS ECO, CAST(NULL AS VARCHAR) AS Opening)
        FROM read_parquet('{d}/staged/*.parquet')
    """)
    con.execute(f"""
        CREATE TABLE openings_with_ply AS
        SELECT *, array_length(string_split(uci, ' ')) AS opening_ply
        FROM read_parquet('{d}/openings/*.parquet')
    """)
    # find-openings.ts:63-80 — anchored prefix + word boundary (documented
    # divergence from raw CONTAINS, see SURVEY §7 / OpeningEnrichment), total
    # order (opening_ply, eco, name) DESC replacing the nondeterministic LIMIT 1
    con.execute("""
        UPDATE games m SET ECO = o.eco, Opening = o.name
        FROM (SELECT t.game_id, o.eco, o.name
              FROM (SELECT game_id, clean_movetext FROM games WHERE Opening IS NULL) t
              JOIN LATERAL (
                  SELECT eco, name FROM openings_with_ply o
                  WHERE starts_with(t.clean_movetext, o.pgn)
                    AND (length(t.clean_movetext) = length(o.pgn)
                         OR substr(t.clean_movetext, length(o.pgn) + 1, 1) = ' ')
                  ORDER BY opening_ply DESC, eco DESC, name DESC LIMIT 1) o ON TRUE
             ) o
        WHERE m.game_id = o.game_id
    """)
    # export-to-parquet.ts:69-94 projection + filter; casts pin the parquet
    # schema to Spark's (year INT, Elo INT already from the parse)
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    con.execute(f"""
        COPY (
          SELECT Event, Site, White, Black, Result, WhiteTitle, BlackTitle,
                 WhiteElo, BlackElo, UTCDate, UTCTime, ECO, Opening, Termination,
                 COALESCE(clean_timecontrol, TimeControl) AS TimeControl,
                 Source, movetext, DataSource,
                 year(UTCDate)::INT AS year, strftime(UTCDate, '%m') AS month
          FROM games
          WHERE UTCDate IS NOT NULL AND year(UTCDate) >= 1500
          ORDER BY White
        ) TO '{GOLDEN}' (FORMAT PARQUET)
    """)
    n = con.execute(f"SELECT count(*) FROM read_parquet('{GOLDEN}')").fetchone()[0]
    print(f"wrote {GOLDEN}: {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
