#!/usr/bin/env python3
"""Compares the engine's blocking keys / raw embeddings / pairwise scores
(KeyReplayProbe JSON on stdin) against the DuckDB SQL replay it carries.

Usage: sbt "runMain graft.tools.KeyReplayProbe" 2>/dev/null | grep '"keys"' \
       | python3 tools/check_key_replay.py
"""
import json
import math
import sys

import duckdb


def main():
    data = json.loads(sys.stdin.read())
    con = duckdb.connect()
    fails = 0

    got = {}
    for norm, key in con.execute(data["key_sql"]).fetchall():
        got.setdefault(norm, []).append(int(key))
    for norm, exp in data["keys"].items():
        g = sorted(got.get(norm, []))
        e = sorted(int(x) for x in exp)
        if g != e:
            fails += 1
            print(f"[FAIL] keys {norm!r}: sql={g[:4]}... engine={e[:4]}...")
    print(f"keys: {len(data['keys'])} norms checked")

    # The engine hashes grams of normalize(s); pipeline norms ARE normalize
    # outputs, so the SQL replays grams of the raw norm — equivalence holds
    # exactly on normalized inputs. Zero-weight buckets (SQL emits, engine
    # skips) contribute nothing to any dot product; drop before comparing.
    import re
    gote = {}
    for norm, idx, w in con.execute(data["emb_sql"]).fetchall():
        if int(w) != 0:
            gote.setdefault(norm, {})[int(idx)] = int(w)
    checked = 0
    for norm, exp in data["embs"].items():
        if re.sub(r"[^a-z0-9]+", " ", norm.lower()).strip() != norm:
            continue  # not a normalized-form string; pipeline never emits these
        checked += 1
        e = {int(k): int(v) for k, v in exp.items()}
        g = gote.get(norm, {})
        if g != e:
            fails += 1
            print(f"[FAIL] emb {norm!r}: sql={g} engine={e}")
    print(f"embs: {checked} normalized norms checked")

    for a, b, jw, score in data["scores"]:
        jd = con.execute(
            "SELECT CASE WHEN ? = ? THEN 1.0 ELSE jaro_winkler_similarity(?, ?) END",
            [a, b, a, b]).fetchone()[0]
        if jd != jw and abs(jd - jw) > 5e-16:
            fails += 1
            print(f"[FAIL] jw {a!r} {b!r}: sql={jd!r} engine={jw!r}")
        # fused score: replicate the oracle's arithmetic exactly
        ea = {int(k): v for k, v in data["embs"][a].items()}
        eb = {int(k): v for k, v in data["embs"][b].items()}
        dot = sum(ea[i] * eb[i] for i in ea if i in eb)
        na = sum(v * v for v in ea.values())
        nb = sum(v * v for v in eb.values())
        sd = con.execute(
            """SELECT 1.0 / (1.0 + exp(-12.0 * ((0.3 * jwv + 0.4 *
                 (1.0 - CAST(levenshtein(?, ?) AS DOUBLE) / greatest(length(?), length(?), 1))
                 + 0.3 * cosv) - 0.82)))
               FROM (SELECT CASE WHEN ? = ? THEN 1.0 ELSE jaro_winkler_similarity(?, ?) END AS jwv,
                 CASE WHEN ? = 0 OR ? = 0 THEN 0.0
                      ELSE CAST(? AS DOUBLE) / sqrt(CAST(? AS DOUBLE) * ?) END AS cosv)""",
            [a, b, a, b, a, b, a, b, na, nb, dot, na, nb]).fetchone()[0]
        if sd != score and abs(sd - score) > 5e-16:
            fails += 1
            print(f"[FAIL] score {a!r} {b!r}: sql={sd!r} engine={score!r}")
    print(f"scores: {len(data['scores'])} pairs checked")
    print(f"FAILS: {fails}")
    return 0 if fails == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
