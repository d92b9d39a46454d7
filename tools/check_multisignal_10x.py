#!/usr/bin/env python3
"""10x DuckDB compare for q_dedup_multi_signal.

The stored oracle (a recursive-CTE transitive closure over minhash-band,
embedding-LSH and exact-dup edges) is the driver's sf0.01 gate, but at 10x
it is infeasible AS WRITTEN in DuckDB: the embedding candidate stage joins
~1.3e8 vec pairs each dragging two 64-float lists (~150 GB working set),
and a recursive CTE cannot spill — two attempts died at the box's memory
(one on spill disk, one OOM-killed at 115 GB RSS).

This script computes THE SAME answer by equivalence transformations, each
asserted before use, then exact-compares against the Spark parquet dump:

1. The 10x fixture is 10 key-shifted byte-identical copies of sf0.1, and
   at sf0.1 every embedding is distinct with vec_id = doc_id on 0..1999
   (asserted). Band keys, cosines and shingle signatures are functions of
   CONTENT, so every cross-content edge exists between two doc ids iff it
   exists between their content representatives, and every same-content
   pair is already connected through the exact-dup star (em: doc -> min
   doc of its text group; same text => same sig => all 4 bands match, and
   identical non-zero vectors have cos = 1 >= 0.45 — no zero-norm vecs,
   asserted). Hence the component structure over all 10x docs equals the
   expansion of the component structure over content representatives.
2. The closure is computed as an iterative min-label propagation over the
   representative graph (the standard Pregel fixpoint — identical answer
   to the recursive CTE's min(reachable id), linear memory, converges in
   O(component diameter) rounds).

Usage: check_multisignal_10x.py <10x-fixture-dir> <verify-out-dir>
"""
import sys, os
import duckdb
import pyarrow.parquet as pq


def src(d, t):
    p = f"{d}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def main():
    fx, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCK_MEM', '48GB')}'")
    con.execute("SET temp_directory='/tmp/graft_duck_spill'")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{src(fx, 'documents')}'")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{src(fx, 'embeddings')}'")

    # -- preconditions for the content-level equivalence ------------------
    nvec, ndistinct, nzero = con.execute("""
        SELECT count(*), count(DISTINCT embedding::VARCHAR),
               count(*) FILTER (WHERE
                 list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * x)) = 0)
        FROM embeddings""").fetchone()
    # each distinct content must live at exactly one original id, copied
    # an equal number of times with one text per content
    copies_per_content = con.execute("""
        SELECT count(DISTINCT cnt) FROM (
          SELECT embedding::VARCHAR AS ek, count(*) AS cnt
          FROM embeddings GROUP BY 1)""").fetchone()[0]
    texts_per_content = con.execute("""
        SELECT max(nt) FROM (
          SELECT e.embedding::VARCHAR AS ek,
                 count(DISTINCT md5(trim(lower(d.text)))) AS nt
          FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
          GROUP BY 1)""").fetchone()[0]
    orphan_vecs = con.execute("""
        SELECT count(*) FROM embeddings
        WHERE vec_id NOT IN (SELECT doc_id FROM documents)""").fetchone()[0]
    assert nzero == 0, f"{nzero} zero-norm vectors break the same-content edge"
    assert copies_per_content == 1, "unequal copy counts per content"
    assert texts_per_content == 1, "one embedding content spans two texts"
    assert orphan_vecs == 0, "vec ids outside the document id space"
    print(f"[ms10x] preconditions OK: {nvec} vecs, {ndistinct} distinct, "
          f"0 zero-norm, content<->text 1:1")

    # -- exact-dup star (oracle's reph/em, full 10x) ----------------------
    con.execute("""CREATE TABLE d2r AS
        WITH reph AS (SELECT md5(trim(lower(text))) AS k,
                             min(doc_id) AS rep
                      FROM documents GROUP BY 1)
        SELECT d.doc_id, r.rep FROM documents d
        JOIN reph r ON md5(trim(lower(d.text))) = r.k""")

    # -- minhash-band edges on distinct texts (content level) -------------
    con.execute("""CREATE TABLE mp_rep AS
        WITH reps AS (SELECT doc_id, text FROM documents
                      WHERE doc_id IN (SELECT rep FROM d2r)),
        toks AS (SELECT doc_id, string_split(text, ' ') AS tok FROM reps
                 WHERE len(string_split(text, ' ')) >= 3),
        shu AS (SELECT doc_id, unnest(list_transform(range(1, len(tok) - 1),
                  i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]))
                  AS shingle
                FROM toks),
        sh AS (SELECT DISTINCT doc_id, shingle FROM shu),
        h AS (SELECT doc_id,
                     CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT)
                       AS h
              FROM sh),
        sig AS (SELECT doc_id,
                  min((h*2 + 1) % 1000000007) AS m0,
                  min((h*3 + 2) % 1000000007) AS m1,
                  min((h*5 + 3) % 1000000007) AS m2,
                  min((h*7 + 4) % 1000000007) AS m3,
                  min((h*11 + 5) % 1000000007) AS m4,
                  min((h*13 + 6) % 1000000007) AS m5,
                  min((h*17 + 7) % 1000000007) AS m6,
                  min((h*19 + 8) % 1000000007) AS m7
                FROM h GROUP BY doc_id),
        bands AS (
          SELECT doc_id, 0 AS band, m0 * 1000000007 + m1 AS bkey FROM sig
          UNION ALL SELECT doc_id, 1, m2 * 1000000007 + m3 FROM sig
          UNION ALL SELECT doc_id, 2, m4 * 1000000007 + m5 FROM sig
          UNION ALL SELECT doc_id, 3, m6 * 1000000007 + m7 FROM sig)
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) >= 2""")

    # -- embedding edges on distinct contents, mapped to text reps --------
    con.execute("""CREATE TABLE ep_rep AS
        WITH vreps AS (SELECT min(vec_id) AS vec_id
                       FROM embeddings GROUP BY embedding::VARCHAR),
        v AS (SELECT e.vec_id,
                     list_transform(e.embedding, x -> CAST(x AS DOUBLE))
                       AS v
              FROM embeddings e JOIN vreps USING (vec_id)),
        nv AS (SELECT vec_id, v,
                      sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
               FROM v),
        ebands AS (SELECT vec_id, j AS band,
                     array_to_string(list_transform(
                       range(j * 4 + 1, j * 4 + 5),
                       i -> CASE WHEN v[i] > 0 THEN '1' ELSE '0' END), '')
                       AS bkey
                   FROM nv, (SELECT unnest(range(0, 16)) AS j)),
        ecand AS (SELECT DISTINCT a.vec_id AS ca, b.vec_id AS cb
                  FROM ebands a JOIN ebands b
                    ON a.band = b.band AND a.bkey = b.bkey
                       AND a.vec_id < b.vec_id),
        ep AS (SELECT * FROM (
                 SELECT ca, cb,
                        round(list_sum(list_transform(range(1, len(a.v) + 1),
                                i -> a.v[i] * b.v[i]))
                              / nullif(a.nrm * b.nrm, 0), 6) AS cos
                 FROM ecand JOIN nv a ON ca = a.vec_id
                            JOIN nv b ON cb = b.vec_id)
               WHERE cos >= 0.45)
        SELECT DISTINCT ra.rep AS src, rb.rep AS dst
        FROM ep JOIN d2r ra ON ca = ra.doc_id
                JOIN d2r rb ON cb = rb.doc_id
        WHERE ra.rep <> rb.rep""")

    # -- iterative min-label fixpoint over the representative graph -------
    con.execute("""CREATE TABLE e AS
        SELECT src, dst FROM mp_rep UNION SELECT src, dst FROM ep_rep
        UNION SELECT dst, src FROM mp_rep UNION SELECT dst, src FROM ep_rep""")
    con.execute("""CREATE TABLE lab AS
        SELECT DISTINCT rep AS doc_id, rep AS cluster FROM d2r""")
    rounds = 0
    while True:
        rounds += 1
        con.execute("""CREATE TABLE nxt AS
            SELECT l.doc_id,
                   least(l.cluster, coalesce(m.c, l.cluster)) AS cluster
            FROM lab l LEFT JOIN (
              SELECT e.dst AS doc_id, min(l2.cluster) AS c
              FROM e JOIN lab l2 ON e.src = l2.doc_id
              GROUP BY e.dst) m USING (doc_id)""")
        changed = con.execute("""
            SELECT count(*) FROM nxt n JOIN lab l USING (doc_id)
            WHERE n.cluster <> l.cluster""").fetchone()[0]
        con.execute("DROP TABLE lab")
        con.execute("ALTER TABLE nxt RENAME TO lab")
        print(f"[ms10x] fixpoint round {rounds}: changed={changed}")
        if changed == 0:
            break

    # -- expand to every doc, exact-compare with the Spark dump -----------
    duck = con.execute("""
        SELECT d.doc_id, l.cluster,
               CAST(CASE WHEN l.cluster = d.doc_id THEN 1 ELSE 0 END
                    AS BIGINT) AS keep
        FROM d2r d JOIN lab l ON d.rep = l.doc_id
        ORDER BY d.doc_id""").fetchall()
    pdir = os.path.join(out, "q_dedup_multi_signal")
    pfile = [f for f in os.listdir(pdir) if f.endswith(".parquet")][0]
    tbl = pq.read_table(os.path.join(pdir, pfile))
    cols = tbl.column_names
    assert sorted(cols) == ["cluster", "doc_id", "keep"], cols
    spark = [(r["doc_id"], r["cluster"], r["keep"]) for r in tbl.to_pylist()]
    if len(spark) != len(duck):
        print(f"XX q_dedup_multi_signal: ROWCOUNT spark={len(spark)} "
              f"duck={len(duck)}")
        sys.exit(1)
    for i, (srow, drow) in enumerate(zip(spark, duck)):
        if tuple(srow) != tuple(drow):
            print(f"XX q_dedup_multi_signal: VALUE_MISMATCH row={i} "
                  f"spark={srow} duck={drow}")
            sys.exit(1)
    print(f"   q_dedup_multi_signal: OK rows={len(spark)} "
          f"(content-level equivalence + {rounds}-round min-label fixpoint)")
    sys.exit(0)


if __name__ == "__main__":
    main()
