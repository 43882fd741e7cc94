#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
  (after: sbt "runMain graft.Verify <sfDir> <outDir>")

For each <outDir>/<name> parquet dir with an oracle in oracle_sql.json:
run the SQL in DuckDB (views named per table over <sfDir>/*.parquet),
sort columns by name, sort rows, compare values exactly.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out

def norm(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            # driver testdata is one file per table; Spark-written corpora
            # (graft.Inflate) are directories of part files
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # d02 cap/oracle divergence guard: Spark caps shingle document-frequency
    # at 1000 (DedupQueries.DefaultMaxDf) while the DuckDB oracle computes
    # uncapped all-pairs Jaccard. They agree only while no shingle group at
    # this SF exceeds the cap — assert that explicitly so a future testdata
    # change can't silently turn the cap into a wrong-answer bug.
    if os.path.exists(f"{sf_dir}/documents.parquet"):
        max_df = con.execute("""
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            s AS (SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, len(ws) - 1),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS sng
                  FROM w WHERE len(ws) >= 3)
            SELECT COALESCE(MAX(df), 0) FROM
              (SELECT sng, COUNT(*) AS df FROM s GROUP BY sng)""").fetchone()[0]
        if max_df >= 1000:
            print(f"FAIL d02_cap_guard: max shingle df {max_df} >= cap 1000 — "
                  "capped Spark d02 and uncapped oracle would diverge")
            n_fail += 1
        else:
            print(f"PASS d02_cap_guard (max shingle df {max_df} < 1000)")
            n_pass += 1
    # d06 growth guard: d06's all-pairs cosine sweep is the DECLARED
    # definitional baseline (scale paths are s02/s04/s06) and is safe only
    # while the embeddings table stays test-sized. A testdata scale-up must
    # become a loud gate failure here, not a silent quadratic.
    if os.path.exists(f"{sf_dir}/embeddings.parquet"):
        n_emb = con.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
        if n_emb > 10000:
            print(f"FAIL d06_size_guard: embeddings has {n_emb} rows > 10000 — "
                  "d06's definitional all-pairs baseline is quadratic; "
                  "re-scope it to a fixed-size sample before scaling testdata")
            n_fail += 1
        else:
            print(f"PASS d06_size_guard (embeddings rows {n_emb} <= 10000)")
            n_pass += 1
    # d05 candidate-volume guard: d05's banded SimHash segments (6 x 10 bits,
    # the pigeonhole minimum for exact Hamming<=5) emit occ*(occ-1)/2
    # verification pairs per (segment, value). On a corpus with correlated
    # SimHash bits, occupancy is a FRACTION of n, so the candidate set is a
    # constant-factor prune of brute force (measured ~0.15 of all pairs at
    # sf0.01 AND sf0.1) — d05's contract is exactly that: an exact
    # small-corpus pair-verification op with a bounded constant (the
    # corpus-scale near-dup paths are d02/d03, bucketed on content).
    # The guard pins the constant: if segment banding stops pruning (ratio
    # above 0.3 — bit bias worsened or testdata changed shape), d05 needs a
    # wider signature before testdata scales further.
    if os.path.exists(f"{sf_dir}/documents.parquet"):
        cand_ratio = con.execute("""
            WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                         FROM documents),
            h AS (SELECT doc_id,
                    CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS hv
                  FROM tok),
            bits AS (SELECT doc_id, b,
                SUM(CASE WHEN (hv >> CAST(b AS INTEGER)) & 1 = 1
                    THEN 1 ELSE -1 END) AS s
              FROM h, (SELECT unnest(range(0, 60)) AS b) bs GROUP BY doc_id, b),
            sig AS (SELECT doc_id,
                SUM(CASE WHEN s > 0
                    THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER))
                    ELSE 0 END) AS simhash
              FROM bits GROUP BY doc_id),
            seg AS (SELECT seg_idx,
                (CAST(simhash AS BIGINT) >> CAST(seg_idx * 10 AS INTEGER))
                  & 1023 AS seg_val
              FROM sig, (SELECT unnest(range(0, 6)) AS seg_idx) s6),
            occ AS (SELECT seg_idx, seg_val, COUNT(*) AS o
                    FROM seg GROUP BY seg_idx, seg_val)
            SELECT COALESCE(
                     COALESCE(SUM(o * (o - 1) / 2), 0)
                     / NULLIF((SELECT COUNT(*) FROM sig)
                              * ((SELECT COUNT(*) FROM sig) - 1) / 2.0, 0),
                     0)
            FROM occ""").fetchone()[0]
        if cand_ratio > 0.3:
            print(f"FAIL d05_segment_guard: banded candidates are "
                  f"{cand_ratio:.3f} of all pairs > 0.3 — segment banding "
                  "stopped pruning; widen the SimHash signature "
                  "(SimHash.pairsWithin) before scaling testdata")
            n_fail += 1
        else:
            print(f"PASS d05_segment_guard (banded candidate ratio "
                  f"{cand_ratio:.3f} <= 0.3 of brute force)")
            n_pass += 1
    for name in sorted(oracles):
        sql = oracles[name]
        pdir = f"{out_dir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet('{pdir}/*.parquet')")
            gcols = [d[0] for d in got.description]; grows = got.fetchall()
            want = con.execute(sql)
            wcols = [d[0] for d in want.description]; wrows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}"); n_fail += 1; continue
        gc, gr = canon(grows, gcols)
        wc, wr = canon(wrows, wcols)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}"); n_fail += 1; continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rowcount {len(gr)} != {len(wr)}"); n_fail += 1; continue
        bad = [(a, b) for a, b in zip(gr, wr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: spark={bad[0][0]} oracle={bad[0][1]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(gr)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
