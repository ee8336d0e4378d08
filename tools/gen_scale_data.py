#!/usr/bin/env python3
"""Generate an sf1 rehearsal dataset by deterministic 10x inflation
of the driver's read-only sf0.1 tables (r08 verdict item 1: every
100x scale claim was plan-shape-only; nothing had ever executed
above sf0.1).

NOT a replacement for driver testdata — correctness stays pinned to
/root/testdata (TESTDATA.md forbids touching it, so the inflated set
lands in /tmp). The inflation is hash-deterministic (no RNG):

- documents  x10: doc_id += r*10_000_000; replicas r>0 append a
  per-(r, doc_id) suffix token so the distinct-shingle universe
  keeps growing ~linearly (otherwise KMV/dedup distincts collapse
  to the sf0.1 universe and the rehearsal measures nothing).
  n_chars recomputed from the perturbed text.
- embeddings x10: vec_id += r*10_000_000, vector cyclically
  shifted by r positions. Verbatim copies were the first
  rehearsal's lesson: 10 identical replicas x 25 bench-side
  inflations merged every near-dup family 10-fold, so the TRUE
  ε-pair count grew ~100x at 10x data and cluster_lsh looked
  super-linear when it was faithfully verifying a quadratically
  denser answer. A cyclic shift keeps norms and the label
  geometry while making replicas ~orthogonal — pair density then
  scales linearly, which is what a real 10x corpus does.
- lineitem   x10: l_orderkey += r*100_000_000 (order identity),
  l_partkey += r*200_000 (pagerank's co-purchase graph grows to 10
  disjoint copies: 10x nodes AND 10x edges, not 10x multiplicity
  of the same edges).
- orders     x10: o_orderkey += r*100_000_000.
- events     x10: event_id += r*100_000_000 (event_id must STAY a
  key — the r10 sf1 sweep caught range_join diverging 10x because
  duplicate event_ids let the oracle's GROUP BY collapse what the
  Spark query's join re-expands) and ts += r microseconds (keeps
  windows/sessions structurally intact while making replicas
  distinct rows).
- region/nation/customer/supplier/part: copied as-is (dimension
  tables; the rehearsal queries treat them as broadcast sides).

Usage: python tools/gen_scale_data.py [out_dir] [factor]
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT unnest(range({factor})) AS r")

    def emit(name: str, sql: str, multi: bool = True) -> None:
        # fact tables are written as a DIRECTORY of per-thread files:
        # a single-file fixture reaches Spark as ONE scan partition
        # (45 MB < maxPartitionBytes), so every downstream explode ran
        # behind plans/catalog_shared.widen()'s round-robin exchange —
        # at sf10 that fixture artifact (a full-text shuffle) dominated
        # dedup_minhash's measured bytes (r09: 321 MB of 873 MB).
        # Real corpora arrive as many files; the rehearsal fixture now
        # does too, and widen() gates itself off.
        target = f"{out}/{name}.parquet"
        if multi:
            # ~48 similar-size files per table at EVERY scale (file
            # size from source bytes x factor; PER_THREAD_OUTPUT gave
            # one file — the reps CROSS JOIN pipeline is
            # single-threaded), so Spark scans with >= default
            # parallelism at sf0.1 and sf10 alike and the ratios
            # compare identical plans
            # explicit deterministic 48-way slicing (FILE_SIZE_BYTES
            # rotation is defeated by compression on the small
            # scales). Determinism is by CONSTRUCTION, not scan-order
            # luck (r09 second-pass review): rows get an explicit _rn
            # from row_number() over ALL columns (rows are distinct —
            # every inflated table carries a unique id — so the order
            # is total), and each slice is a WHERE range on _rn. The
            # target dir is cleared first so a previous larger-factor
            # run can't leave stale part files behind the glob.
            n_files = 48
            if os.path.isdir(target):
                shutil.rmtree(target)
            elif os.path.exists(target):
                os.remove(target)
            con.execute("DROP TABLE IF EXISTS _emit_tmp")
            cols = [
                r[0]
                for r in con.execute(
                    f"DESCRIBE SELECT * FROM ({sql})"
                ).fetchall()
            ]
            order = ", ".join(f'"{c}"' for c in cols)
            con.execute(
                "CREATE TEMP TABLE _emit_tmp AS "
                f"SELECT row_number() OVER (ORDER BY {order}) AS _rn, * "
                f"FROM ({sql})"
            )
            n_rows = con.execute(
                "SELECT count(*) FROM _emit_tmp"
            ).fetchone()[0]
            per = max(1, -(-n_rows // n_files))
            os.makedirs(target, exist_ok=True)
            for i in range(n_files):
                off = i * per
                if off >= n_rows:
                    break
                con.execute(
                    f"COPY (SELECT * EXCLUDE (_rn) FROM _emit_tmp "
                    f"WHERE _rn > {off} AND _rn <= {off + per} "
                    f"ORDER BY _rn) "
                    f"TO '{target}/part_{i:03d}.parquet' "
                    "(FORMAT PARQUET)"
                )
            con.execute("DROP TABLE _emit_tmp")
            glob_t = f"{target}/*.parquet"
        else:
            con.execute(
                f"COPY ({sql}) TO '{target}' "
                "(FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
            )
            glob_t = target
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{glob_t}')"
        ).fetchone()[0]
        n_src = con.execute(
            f"SELECT count(*) FROM read_parquet('{SRC}/{name}.parquet')"
        ).fetchone()[0]
        want = n_src * (factor if multi else 1)
        assert n == want, (name, n, want)
        print(f"{name:12s} {n:>10,} rows")

    for t in ["region", "nation", "customer", "supplier", "part"]:
        emit(t, f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')",
             multi=False)

    # replicas r>0 INTERLEAVE a (group, doc)-unique marker token
    # after every 2nd token instead of appending one suffix token.
    # Two r09 rehearsal lessons behind this exact design:
    # 1. r08's one-token suffix left the 100 replicas of one doc a
    #    NEAR-DUP CLIQUE (J ~ n/(n+2)): dedup_minhash's TRUE answer
    #    hit 27M pairs at sf10 — quadratic in factor, masquerading
    #    as operator super-linearity (the text analog of the r08
    #    embedding verbatim-copy lesson).
    # 2. A marker every 4 tokens cut cross-replica J to ~0.26 —
    #    below the 0.5 verify threshold, so the ANSWER was linear,
    #    but 4-hash MinHash bands still collide at J=0.26 with
    #    p ~ 4·J^4 ~ 2% per replica pair: the CANDIDATE set stayed
    #    quadratic (shuffle x500 at 100x). The fixture must push
    #    cross-replica J to ~0, not merely below the threshold.
    # A marker every 2 tokens leaves no marker-free 3-shingle (max
    # clean run = 2 < shingle width), so texts with different markers
    # share ZERO shingles: candidates can't leak across groups at
    # all. Replicas are then PAIRED into groups g = (r+1) div 2
    # sharing one marker — pair members are byte-identical texts
    # (J = 1), giving dedup a true answer that grows LINEARLY with
    # the factor (one exact-dup pair per base doc per full group)
    # instead of collapsing to the r=0 pairs. Markers are
    # (g, doc)-unique, so the distinct-shingle universe keeps
    # growing linearly too.
    emit(
        "documents",
        f"""
        SELECT d.doc_id + r.r * 10000000 AS doc_id,
               CASE WHEN r.r = 0 THEN d.text
                    ELSE regexp_replace(d.text,
                        '((\\S+\\s+){{2}})',
                        '\\1z' || ((r.r + 1) // 2) || 'x' || d.doc_id
                          || ' ', 'g')
               END AS text,
               d.lang, d.source,
               CASE WHEN r.r = 0 THEN d.n_chars
                    ELSE length(regexp_replace(d.text,
                        '((\\S+\\s+){{2}})',
                        '\\1z' || ((r.r + 1) // 2) || 'x' || d.doc_id
                          || ' ', 'g'))
               END AS n_chars
        FROM read_parquet('{SRC}/documents.parquet') d CROSS JOIN reps r
        """,
    )
    # cyclic shift by r % dim (r >= dim would wrap to the IDENTITY
    # shift — at factor 100 replica 64 of a 64-dim vector was a
    # verbatim copy of replica 0); replicas past one full cycle are
    # additionally NEGATED (cosine distance 2 from everything near
    # the original — the far side of the sphere), so no two replicas
    # of one vector are ever near-dups at any supported factor < 128.
    emit(
        "embeddings",
        f"""
        SELECT e.vec_id + r.r * 10000000 AS vec_id,
               CASE WHEN r.r = 0 THEN e.embedding
                    WHEN r.r < 64 THEN
                        list_concat(e.embedding[(r.r % 64) + 1:],
                                    e.embedding[:(r.r % 64)])
                    ELSE list_transform(
                        list_concat(e.embedding[(r.r % 64) + 1:],
                                    e.embedding[:(r.r % 64)]),
                        x -> -x)
               END AS embedding,
               e.label
        FROM read_parquet('{SRC}/embeddings.parquet') e CROSS JOIN reps r
        """,
    )
    emit(
        "lineitem",
        f"""
        SELECT l.* REPLACE (
            l.l_orderkey + r.r * 100000000 AS l_orderkey,
            l.l_partkey + r.r * 200000 AS l_partkey)
        FROM read_parquet('{SRC}/lineitem.parquet') l CROSS JOIN reps r
        """,
    )
    emit(
        "orders",
        f"""
        SELECT o.* REPLACE (o.o_orderkey + r.r * 100000000 AS o_orderkey)
        FROM read_parquet('{SRC}/orders.parquet') o CROSS JOIN reps r
        """,
    )
    emit(
        "events",
        f"""
        SELECT e.* REPLACE (
            e.event_id + r.r * 100000000 AS event_id,
            e.ts + to_microseconds(r.r::BIGINT) AS ts)
        FROM read_parquet('{SRC}/events.parquet') e CROSS JOIN reps r
        """,
    )
    print(f"-> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
