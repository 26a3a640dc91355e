#!/usr/bin/env python
"""Golden-parquet oracle generator for the non-SQL-expressible queries.

DuckDB cannot express DTW/DBA/LSH, so those driver queries were rows-only
checked. This script computes their expected outputs WITHOUT the Spark
operators — pandas/pyarrow for all relational plumbing (rollup, gap-fill,
series assembly, joins, top-k) plus a deliberately NAIVE scalar-Python
oracle (scripts/naive_dtw.py) for the DTW math (the same oracle pattern
the reference uses: golden values produced by a trusted scalar
implementation, test/runtests.jl:491-575) — and writes them to
golden/sf0.01/<query>.parquet. ``oracle_sql()`` then exposes each as
``SELECT * FROM read_parquet(...)`` so the driver's rows+schema+hash
check covers the DTW half of the engine too.

What is independent vs shared:
- rollup/gapfill/assembly/banding/top-k/connected-components: re-derived
  here in pandas/NumPy — fully independent of the Spark operators.
- DTW-family numerics (dtw, dtw_cost, dtw_cost_batch, dtwnn, dba, softdtw,
  fastdtw, gdtw, matrix/distance profile): scripts/naive_dtw.py — a
  straight-line scalar second source sharing NO code with the engine
  kernels, cross-checked against the reference's runtests.jl golden
  vectors and the engine in tests/test_naive_oracle.py.
- xxhash64: reimplemented here in pure Python from the public XXH64 spec
  and asserted against Spark's implementation in tests.

Usage: python scripts/make_goldens.py [sf_dir] [out_dir]
Defaults: /root/testdata/sf0.01 -> <repo>/golden/sf0.01
"""

from __future__ import annotations

import os
import sys

# Golden bytes must not depend on whether the generating machine has a C
# compiler (ADVICE r02): all DTW math below comes from the naive scalar
# oracle (naive_dtw), which never touches the engine kernels, and the
# engine's own NumPy/C paths are pinned bit-identical to it
# (tests/test_native.py::TestCrossPathBitParity). Do NOT set
# SPARK_TSWARP_NO_NATIVE at import time here: pytest imports this module
# at collection (test_golden_freshness) and a mutated os.environ leaks
# into the JVM/worker environment of every later Spark test.

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from naive_dtw import (  # noqa: E402 — the scalar second-source oracle
    dtw, dtw_cost, dtw_cost_batch, dtwnn, dba, dba_iteration,
    soft_dtw_cost, fastdtw, gdtw, distance_profile, matrix_profile,
    lb_endpoints,
)
from dynamicaxiswarping_jl_spark.operators.dedup import _hash_params, _MERSENNE  # noqa: E402
from dynamicaxiswarping_jl_spark.sources.transcripts import generate_transcripts_pandas  # noqa: E402


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def _r(x, d: int = 4):
    """DuckDB-style rounding (same as __spark_entry__._r)."""
    x = np.asarray(x, dtype=np.float64)
    f = 10.0 ** d
    return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f


# --- pure-Python XXH64 (public spec), parity-tested against Spark ---------

_M64 = (1 << 64) - 1
_P1, _P2, _P3, _P4, _P5 = (
    0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
    0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` (unsigned). Spark's xxhash64(col) == this on the
    column's UTF-8 bytes with seed 42 (asserted in tests/test_goldens.py)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            vs = [v1, v2, v3, v4]
            for k in range(4):
                lane = int.from_bytes(data[i + 8 * k:i + 8 * k + 8], "little")
                vs[k] = (_rotl((vs[k] + lane * _P2) & _M64, 31) * _P1) & _M64
            v1, v2, v3, v4 = vs
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((k * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64_signed(s: str, seed: int = 42) -> int:
    h = xxh64(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h


# Java \s is ASCII-only ([ \t\n\x0B\f\r]); Python re \s is unicode-aware —
# mirror Spark's split(text, '\\s+') exactly.
import re  # noqa: E402
_WS = re.compile("[ \t\n\x0b\f\r]+")


def _tokens(text) -> list[str]:
    if text is None or (isinstance(text, float) and np.isnan(text)):
        text = ""
    return [t for t in _WS.split(str(text).lower()) if t != ""]


def _shingle_hashes(text, shingle: int = 3) -> np.ndarray:
    """Mirror operators.dedup._shingle_hashes (JVM expr) in Python."""
    toks = _tokens(text)
    if len(toks) >= shingle:
        sh = [" ".join(toks[i:i + shingle])
              for i in range(len(toks) - shingle + 1)]
    else:
        sh = [" ".join(toks)]  # '' when no tokens
    seen, out = set(), []
    for s in sh:  # array_distinct keeps first occurrence
        if s not in seen:
            seen.add(s)
            out.append(xxh64_signed(s))
    return np.array(out, dtype=np.int64)


# ---------------------------------------------------------------------------
# relational plumbing in pandas (independent of the Spark operators)
# ---------------------------------------------------------------------------

def _load(sf_dir: str, name: str) -> pd.DataFrame:
    return pd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _dense_rate_series(ev: pd.DataFrame, step_s: int,
                       conv_col: str = "conv_id") -> dict[str, np.ndarray]:
    """events → per-conv dense turn_rate series at step_s (rollup →
    zero-gap-fill → assemble), the pandas re-derivation of
    rollup_turns+gapfill+assemble_series."""
    freq = {60: "min", 3600: "h", 86400: "D"}[step_s]
    df = ev.assign(bucket=ev["ts"].dt.floor(freq))
    cnt = (df.groupby([conv_col, "bucket"]).size()
           .rename("n").reset_index())
    out = {}
    for cid, sub in cnt.groupby(conv_col):
        idx = pd.date_range(sub["bucket"].min(), sub["bucket"].max(),
                            freq=freq)
        s = sub.set_index("bucket")["n"].reindex(idx, fill_value=0)
        out[str(cid)] = s.to_numpy(dtype=np.float64) * 60.0 / step_s
    return out


def _events_conv(sf_dir: str) -> pd.DataFrame:
    ev = _load(sf_dir, "events")[["user_id", "ts"]].copy()
    ev["conv_id"] = ev["user_id"].astype(str)
    return ev


def _write(out_dir: str, name: str, df: pd.DataFrame, schema: pa.Schema):
    tbl = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {len(df)} rows")


# ---------------------------------------------------------------------------
# per-query goldens
# ---------------------------------------------------------------------------

def g_drift_1h_1d(sf_dir):
    ev = _events_conv(sf_dir)
    fine = _dense_rate_series(ev, 3600)
    coarse = _dense_rate_series(ev, 86400)
    recs = []
    for cid in sorted(fine, key=lambda c: int(c)):
        a, b = fine[cid], coarse[cid]
        nb = len(b)
        bi = (np.interp(np.linspace(0, 1, len(a)),
                        np.linspace(0, 1, nb), b)
              if nb > 1 else np.full(len(a), b[0]))
        lb = lb_endpoints("sqeuclidean", a, bi)
        if lb == 0.0 and np.array_equal(a, bi):
            cost, pruned = 0.0, 1
        else:
            cost, pruned = dtw_cost(a, bi, "sqeuclidean", 5), 0
        recs.append((cid, float(_r(cost)), len(a), nb, pruned))
    df = pd.DataFrame(recs, columns=["conv_id", "cost", "n_fine",
                                     "n_coarse", "pruned_lb"])
    return df, pa.schema([("conv_id", pa.string()), ("cost", pa.float64()),
                          ("n_fine", pa.int32()), ("n_coarse", pa.int32()),
                          ("pruned_lb", pa.int32())])


def g_dtwnn_series(sf_dir):
    series = _dense_rate_series(_events_conv(sf_dir), 3600)
    first = min(series)  # lexicographically smallest conv_id
    q = series[first][:24]
    # lexicographic (cost, conv_id, loc) min — mirrors dtwnn_search's
    # deterministic struct-min tie rule
    best = None
    for cid, y in series.items():
        if len(y) < len(q):
            continue
        res = dtwnn(q, y, "sqeuclidean", 5)
        if np.isfinite(res.cost):
            cur = (res.cost, cid, int(res.loc))
            if best is None or cur < best:
                best = cur
    df = pd.DataFrame([("q0", float(_r(best[0])), best[1], int(best[2]))],
                      columns=["query_id", "cost", "conv_id", "loc"])
    return df, pa.schema([("query_id", pa.string()), ("cost", pa.float64()),
                          ("conv_id", pa.string()), ("loc", pa.int32())])


def _pair_cost(a: np.ndarray, b: np.ndarray, radius: int) -> float:
    """knn_topk's per-pair cost rule: equal lengths → vectorized batch DP
    (the exact kernel the operator calls); unequal → subsequence NN of the
    shorter within the longer."""
    if len(a) == len(b):
        return float(dtw_cost_batch(a, b[None, :], radius)[0])
    s, l = sorted((a, b), key=len)
    return float(dtwnn(s, l, "sqeuclidean", radius,
                       prune_endpoints=False).cost)


def g_knn_series(sf_dir):
    series = _dense_rate_series(_events_conv(sf_dir), 3600)
    sub = {c: y for c, y in series.items() if int(c) < 40}
    ids = sorted(sub)
    recs = []
    for ia in ids:
        costs = sorted(
            (( _pair_cost(sub[ia], sub[ib], 5), ib) for ib in ids if ib != ia))
        top = costs[:3]
        ranked = sorted(((float(_r(c)), ib) for c, ib in top))
        for rk, (c, ib) in enumerate(ranked, 1):
            recs.append((ia, ib, c, rk))
    df = pd.DataFrame(recs, columns=["id_a", "id_b", "cost", "rk"])
    return df, pa.schema([("id_a", pa.string()), ("id_b", pa.string()),
                          ("cost", pa.float64()), ("rk", pa.int32())])


def _series_pairs(sf_dir, max_conv):
    series = _dense_rate_series(_events_conv(sf_dir), 3600)
    sub = {c: y for c, y in series.items() if int(c) < max_conv}
    ids = sorted(sub)
    return [(a, b, sub[a], sub[b]) for a in ids for b in ids if a < b]


def g_softdtw_pairs(sf_dir):
    recs = [(a, b, float(_r(soft_dtw_cost(ya, yb, "sqeuclidean", gamma=0.1))))
            for a, b, ya, yb in _series_pairs(sf_dir, 12)]
    df = pd.DataFrame(recs, columns=["id_a", "id_b", "cost"])
    return df, pa.schema([("id_a", pa.string()), ("id_b", pa.string()),
                          ("cost", pa.float64())])


def g_fastdtw_pairs(sf_dir):
    recs = [(a, b, float(_r(fastdtw(ya, yb, "sqeuclidean", 10)[0])))
            for a, b, ya, yb in _series_pairs(sf_dir, 12)]
    df = pd.DataFrame(recs, columns=["id_a", "id_b", "cost"])
    return df, pa.schema([("id_a", pa.string()), ("id_b", pa.string()),
                          ("cost", pa.float64())])


def g_gdtw_pairs(sf_dir):
    recs = [(a, b, float(_r(gdtw(ya, yb)[0])))
            for a, b, ya, yb in _series_pairs(sf_dir, 8)]
    df = pd.DataFrame(recs, columns=["id_a", "id_b", "cost"])
    return df, pa.schema([("id_a", pa.string()), ("id_b", pa.string()),
                          ("cost", pa.float64())])


def g_matrix_profile(sf_dir):
    series = _dense_rate_series(_events_conv(sf_dir), 3600)
    m, radius = 24, 5
    frames = []
    for cid in sorted((c for c in series if int(c) < 10), key=int):
        y = series[cid]
        if len(y) < m + radius + 1:
            continue
        P, I = matrix_profile(y, m, radius, "sqeuclidean")
        frames.append(pd.DataFrame({
            "conv_id": cid,
            "loc": np.arange(1, len(P) + 1, dtype=np.int32),
            "nn_dist": _r(P), "nn_loc": I.astype(np.int32)}))
    df = pd.concat(frames, ignore_index=True)
    return df, pa.schema([("conv_id", pa.string()), ("loc", pa.int32()),
                          ("nn_dist", pa.float64()), ("nn_loc", pa.int32())])


def g_distance_profile(sf_dir):
    series = _dense_rate_series(_events_conv(sf_dir), 3600)
    sub = {c: y for c, y in series.items() if int(c) < 10}
    q = sub[min(sub)][:24]
    frames = []
    for cid in sorted(sub):
        y = sub[cid]
        if len(y) < len(q):
            continue
        prof = distance_profile(q, y, "sqeuclidean", 5)
        frames.append(pd.DataFrame({
            "query_id": "q0", "conv_id": cid,
            "loc": np.arange(1, len(prof) + 1, dtype=np.int32),
            "dist": _r(prof)}))
    df = pd.concat(frames, ignore_index=True)
    return df, pa.schema([("query_id", pa.string()), ("conv_id", pa.string()),
                          ("loc", pa.int32()), ("dist", pa.float64())])


def g_align_delays(sf_dir):
    series = _dense_rate_series(_events_conv(sf_dir), 3600)
    master = series[min(series)]
    recs = []
    for cid in sorted(series):
        y = series[cid]
        _, i1, i2 = dtw(y, master, "sqeuclidean")
        delay = int(np.round(np.median(i2 - i1)))
        recs.append((cid, delay, len(y)))
    df = pd.DataFrame(recs, columns=["conv_id", "delay", "n"])
    return df, pa.schema([("conv_id", pa.string()), ("delay", pa.int32()),
                          ("n", pa.int32())])


def g_dba_reps(sf_dir):
    emb = _load(sf_dir, "embeddings")
    emb = emb[emb["vec_id"] < 200]
    recs = []
    for gid, sub in emb.groupby(emb["label"].astype(str)):
        sub = sub.assign(conv_id=sub["vec_id"].astype(str)).sort_values("conv_id")
        seqs = [np.asarray(e, dtype=np.float64) for e in sub["embedding"]]
        avg, res = dba(seqs, "sqeuclidean", init_center=seqs[0],
                       iterations=100, rtol=1e-5)
        for idx, v in enumerate(_r(avg)):
            recs.append((str(gid), float(_r(res.cost)), bool(res.converged),
                         int(res.iterations), len(seqs), idx, float(v)))
    df = pd.DataFrame(recs, columns=["group_id", "cost", "converged",
                                     "iterations", "n_members", "idx", "v"])
    return df, pa.schema([("group_id", pa.string()), ("cost", pa.float64()),
                          ("converged", pa.bool_()),
                          ("iterations", pa.int32()),
                          ("n_members", pa.int32()), ("idx", pa.int32()),
                          ("v", pa.float64())])


def g_dbaclust_assign(sf_dir):
    """Mirror dbaclust_distributed(nclust=4, iterations=3,
    inner_iterations=2, rtol=1e-4) — same init (lex-smallest keys), same
    assignment kernel (full-band dtw_cost_batch), same reseed/update rules."""
    emb = _load(sf_dir, "embeddings")
    emb = emb[emb["vec_id"] < 120]
    series = {str(int(r.vec_id)): np.asarray(r.embedding, dtype=np.float64)
              for r in emb.itertuples(index=False)}
    keys = sorted(series)  # lexicographic, = orderBy(conv_id)
    nclust, iterations, inner_iterations, rtol = 4, 3, 2, 1e-4
    centers = [series[k].copy() for k in keys[:nclust]]
    total_cost, converged, it = np.inf, False, 0
    assign = None
    Y = np.stack([series[k] for k in keys])
    m = Y.shape[1]
    while not converged and it < iterations:
        it += 1
        C = np.stack([dtw_cost_batch(c, Y, r=m - 1) for c in centers])
        cid = C.argmin(axis=0)
        cost = C[cid, np.arange(len(keys))]
        assign = pd.DataFrame({"conv_id": keys, "cluster_id": cid,
                               "cost": cost})
        counts = assign["cluster_id"].value_counts().to_dict()
        empties = [c for c in range(nclust) if counts.get(c, 0) == 0]
        if empties:
            worst = assign.sort_values(["cost", "conv_id"],
                                       ascending=[False, True]).head(len(empties))
            for kk, c in zip(worst["conv_id"], empties):
                centers[c] = series[kk].copy()
            continue
        newcost = 0.0
        for c in sorted(assign["cluster_id"].unique()):
            members = sorted(assign.loc[assign["cluster_id"] == c, "conv_id"])
            seqs = [series[k] for k in members]
            ctr, ccost, icost = centers[c], np.inf, None
            for _ in range(inner_iterations):
                newctr, icost = dba_iteration(ctr, seqs, "sqeuclidean")
                delta = (ccost - icost) / icost if icost > 0 else 0.0
                ctr = newctr
                if delta < rtol:
                    break
                ccost = icost
            centers[c] = np.asarray(ctr, dtype=np.float64)
            newcost += float(icost)
        delta = (total_cost - newcost) / newcost if newcost > 0 else 0.0
        if delta < rtol:
            converged = True
        total_cost = newcost
    df = assign.assign(cluster_id=assign["cluster_id"].astype(np.int32),
                       cost=_r(assign["cost"]))
    return df, pa.schema([("conv_id", pa.string()),
                          ("cluster_id", pa.int32()), ("cost", pa.float64())])


def g_gorilla_roundtrip(sf_dir):
    """Exact round-trip pinned: n_total = gap-filled 1h tier row count,
    0 mismatches, 0 missing."""
    ev = _events_conv(sf_dir)
    hours = ev.assign(b=ev["ts"].dt.floor("h")).groupby("conv_id")["b"]
    span = (hours.max() - hours.min()) // pd.Timedelta(hours=1) + 1
    df = pd.DataFrame([(int(span.sum()), 0, 0)],
                      columns=["n_total", "n_mismatch", "n_missing"])
    return df, pa.schema([("n_total", pa.int64()), ("n_mismatch", pa.int64()),
                          ("n_missing", pa.int64())])


def g_transcripts_rollup(sf_dir):
    turns = generate_transcripts_pandas(50, seed=42, mean_turns=40.0)
    t = turns.assign(minute=turns["ts"].dt.floor("min"),
                     hour=turns["ts"].dt.floor("h"))
    t1m = (t.groupby(["conv_id", "minute"])
           .agg(n_turns=("turn_idx", "size"),
                tool_calls=("tool", lambda s: int(s.notna().sum())))
           .reset_index())
    t1m["hour"] = t1m["minute"].dt.floor("h")
    t1h = (t1m.groupby(["conv_id", "hour"])
           .agg(n_turns=("n_turns", "sum"), tool_calls=("tool_calls", "sum"))
           .reset_index())
    out = (t1h.groupby("conv_id")
           .agg(n_turns=("n_turns", "sum"), tool_calls=("tool_calls", "sum"),
                n_buckets=("hour", "size"))
           .reset_index())
    return out, pa.schema([("conv_id", pa.string()), ("n_turns", pa.int64()),
                           ("tool_calls", pa.int64()),
                           ("n_buckets", pa.int64())])


# ---- text dedup family ----------------------------------------------------

def _minhash_sigs(docs: pd.DataFrame, k: int, shingle: int, seed: int):
    a, b = _hash_params(k, seed)
    sigs = {}
    for r in docs.itertuples(index=False):
        hv = _shingle_hashes(r.text, shingle)
        H = (a[:, None] * hv[None, :] + b[:, None]) % _MERSENNE
        sigs[int(r.doc_id)] = H.min(axis=1)
    return sigs


def _minhash_pairs(docs: pd.DataFrame, k: int, bands: int, threshold: float,
                   seed: int) -> pd.DataFrame:
    sigs = _minhash_sigs(docs, k, 3, seed)
    rows_per_band = k // bands
    buckets: dict = {}
    for did, sig in sigs.items():
        for bnd in range(bands):
            key = (bnd, tuple(sig[bnd * rows_per_band:(bnd + 1) * rows_per_band]))
            buckets.setdefault(key, []).append(did)
    cands = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cands.add((ids[i], ids[j]))
    recs = []
    for ia, ib in sorted(cands):
        sim = float((sigs[ia] == sigs[ib]).sum()) / k
        if sim >= threshold:
            recs.append((ia, ib, sim))
    return pd.DataFrame(recs, columns=["id_a", "id_b", "sim"])


def g_minhash_pairs(sf_dir):
    docs = _load(sf_dir, "documents")
    df = _minhash_pairs(docs, k=64, bands=16, threshold=0.5, seed=42)
    return df, pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                          ("sim", pa.float64())])


def g_neardup_keep(sf_dir):
    docs = _load(sf_dir, "documents")
    pairs = _minhash_pairs(docs, k=64, bands=16, threshold=0.5, seed=1)
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for ia, ib in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(int(ia)), find(int(ib))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    recs = []
    for did in docs["doc_id"].astype(int):
        keep = find(did)
        recs.append((did, keep, did == keep))
    df = pd.DataFrame(recs, columns=["doc_id", "keep_id", "is_kept"])
    return df, pa.schema([("doc_id", pa.int64()), ("keep_id", pa.int64()),
                          ("is_kept", pa.bool_())])


def _simhash_sigs(docs: pd.DataFrame) -> dict[int, int]:
    powers = 1 << np.arange(64, dtype=np.uint64)
    sigs = {}
    for r in docs.itertuples(index=False):
        toks = _tokens(r.text)
        if not toks:
            sigs[int(r.doc_id)] = 0
            continue
        hv = np.array([xxh64_signed(t) for t in toks],
                      dtype=np.int64).view(np.uint64)
        pm = ((hv[:, None] & powers[None, :]) != 0).astype(np.int32) * 2 - 1
        acc = pm.sum(axis=0)
        sig = int(((acc > 0).astype(np.uint64) * powers).sum())
        sigs[int(r.doc_id)] = sig - (1 << 64) if sig >= (1 << 63) else sig
    return sigs


def g_simhash(sf_dir):
    docs = _load(sf_dir, "documents")
    sigs = _simhash_sigs(docs)
    df = pd.DataFrame(sorted(sigs.items()), columns=["doc_id", "simhash"])
    return df, pa.schema([("doc_id", pa.int64()), ("simhash", pa.int64())])


def g_simhash_neardup(sf_dir):
    """Brute-force hamming pairs — valid oracle because the pigeonhole band
    join has EXACT recall for max_hamming <= n_bands - 1 (7 <= 7)."""
    docs = _load(sf_dir, "documents")
    sigs = _simhash_sigs(docs)
    ids = sorted(sigs)
    sv = np.array([sigs[i] for i in ids], dtype=np.int64).view(np.uint64)
    recs = []
    for i in range(len(ids)):
        x = sv[i] ^ sv[i + 1:]
        ham = np.array([bin(int(v)).count("1") for v in x])
        for off in np.flatnonzero(ham <= 7):
            recs.append((ids[i], ids[i + 1 + off], int(ham[off])))
    df = pd.DataFrame(recs, columns=["id_a", "id_b", "hamming"])
    return df, pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                          ("hamming", pa.int32())])


# ---- embedding LSH family -------------------------------------------------

def _sign_sigs(V: np.ndarray, n_planes: int, n_tables: int, seed: int):
    planes = np.random.default_rng(seed).normal(
        size=(n_tables, n_planes, V.shape[1]))
    sigs = np.empty((n_tables, len(V)), dtype=np.int64)
    for t in range(n_tables):
        proj = V @ planes[t].T > 0
        sigs[t] = (proj * (1 << np.arange(n_planes))).sum(axis=1)
    return sigs


def g_embedding_neardup_lsh(sf_dir):
    emb = _load(sf_dir, "embeddings")
    ids = emb["vec_id"].astype(int).to_numpy()
    V = np.stack([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    sigs = _sign_sigs(V, n_planes=4, n_tables=16, seed=42)
    cands = set()
    for t in range(sigs.shape[0]):
        bysig: dict = {}
        for i, s in enumerate(sigs[t]):
            bysig.setdefault(int(s), []).append(i)
        for grp in bysig.values():
            for x in range(len(grp)):
                for y in range(x + 1, len(grp)):
                    i, j = grp[x], grp[y]
                    if ids[i] != ids[j]:
                        cands.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    norm = np.sqrt((V * V).sum(axis=1))
    pos = {int(v): i for i, v in enumerate(ids)}
    recs = []
    for ia, ib in sorted(cands):
        i, j = pos[ia], pos[ib]
        sim = float(V[i] @ V[j]) / (norm[i] * norm[j])
        if sim >= 0.4:
            recs.append((ia, ib, float(_r(sim))))
    df = pd.DataFrame(recs, columns=["id_a", "id_b", "sim"])
    return df, pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                          ("sim", pa.float64())])


def g_lsh_ann_topk(sf_dir):
    emb = _load(sf_dir, "embeddings")
    ids = emb["vec_id"].astype(int).to_numpy()
    V = np.stack([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    qmask = ids < 3
    sigs_e = _sign_sigs(V, n_planes=8, n_tables=8, seed=42)
    norm = np.sqrt((V * V).sum(axis=1))
    recs = []
    for qi in np.flatnonzero(qmask):
        qid = str(ids[qi])
        cand = set()
        for t in range(sigs_e.shape[0]):
            cand.update(ids[sigs_e[t] == sigs_e[t, qi]].tolist())
        scored = []
        for cid_ in sorted(cand):
            j = int(np.flatnonzero(ids == cid_)[0])
            sim = float(V[qi] @ V[j]) / (norm[qi] * norm[j])
            scored.append((sim, cid_))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rk, (sim, cid_) in enumerate(scored[:5], 1):
            recs.append((qid, cid_, float(_r(sim)), rk))
    df = pd.DataFrame(recs, columns=["query_id", "vec_id", "sim", "rk"])
    return df, pa.schema([("query_id", pa.string()), ("vec_id", pa.int64()),
                          ("sim", pa.float64()), ("rk", pa.int32())])


def xxh64_long(v: int, seed: int = 42) -> int:
    """Spark xxhash64 over a BIGINT column (XxHash64Function.hashLong:
    one 8-byte block + avalanche), unsigned."""
    h = (seed + _P5 + 8) & _M64
    k = (_rotl(((v & _M64) * _P2) & _M64, 31) * _P1) & _M64
    h ^= k
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64_long_signed(v: int, seed: int = 42) -> int:
    h = xxh64_long(v, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def g_ivf_ann_topk(sf_dir):
    """Mirror ivf_cosine_topk(k=5, n_centroids=16, nprobe=8,
    train_sample=2048, kmeans_iters=10, seed=42): deterministic top-k-by-
    hash training sample, seeded k-means, nearest-centroid assignment,
    nprobe probing, exact cosine rerank with id tie-break."""
    emb = _load(sf_dir, "embeddings")
    ids = emb["vec_id"].astype(int).to_numpy()
    V = np.stack([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    train_sample, n_centroids, nprobe, kmeans_iters, seed, k = \
        2048, 16, 8, 10, 42, 5
    hv = np.array([xxh64_long_signed(int(v)) for v in ids], dtype=np.int64)
    sel = np.lexsort((ids, hv))[:train_sample]  # global top-k by (hash, id)
    X = V[sel].copy()
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    nc = min(n_centroids, len(X))
    C = X[rng.choice(len(X), size=nc, replace=False)].copy()
    for _ in range(kmeans_iters):
        assign = (X @ C.T).argmax(axis=1)
        for c in range(nc):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    centroid = (Vn @ C.T).argmax(axis=1)
    norm = np.sqrt((V * V).sum(axis=1))
    recs = []
    for qi in np.flatnonzero(ids < 3):
        qid = str(ids[qi])
        qv = V[qi] / max(np.linalg.norm(V[qi]), 1e-12)
        probes = np.argsort(-(C @ qv))[:nprobe]
        cand = np.flatnonzero(np.isin(centroid, probes))
        scored = sorted(
            ((float(V[qi] @ V[j]) / (norm[qi] * norm[j]), int(ids[j]))
             for j in cand), key=lambda t: (-t[0], t[1]))
        for rk, (sim, cid_) in enumerate(scored[:k], 1):
            recs.append((qid, cid_, float(_r(sim)), rk))
    df = pd.DataFrame(recs, columns=["query_id", "vec_id", "sim", "rk"])
    return df, pa.schema([("query_id", pa.string()), ("vec_id", pa.int64()),
                          ("sim", pa.float64()), ("rk", pa.int32())])


def g_media_image_features(sf_dir):
    """Independent re-derivation of q_media_image_features: the sha256
    pixel rule -> per-channel mean/std, WITHOUT the engine's BMP
    encoder/decoder — if either codec half corrupts a pixel, the engine's
    decoded features diverge from these and the hash check fails."""
    import hashlib

    docs = _load(sf_dir, "documents")
    recs = []
    for mid, text in zip(docs["doc_id"].astype(int), docs["text"]):
        d = hashlib.sha256(str(text).encode("utf-8")).digest()
        reps = (8 * 8 * 3) // len(d) + 1
        img = np.frombuffer((d * reps)[: 8 * 8 * 3],
                            np.uint8).reshape(8, 8, 3)
        px = img.astype(np.float64) / 255.0
        feats = np.concatenate([px.mean(axis=(0, 1)), px.std(axis=(0, 1))])
        for j, v in enumerate(feats):
            recs.append((int(mid), j, float(_r(v))))
    df = pd.DataFrame(recs, columns=["media_id", "feat_idx", "v"])
    return df, pa.schema([("media_id", pa.int64()),
                          ("feat_idx", pa.int32()), ("v", pa.float64())])


def g_media_frame_features(sf_dir):
    """Independent re-derivation of q_media_frame_features: the sha256
    per-frame pixel rule + the (doc_id+f) % 3 delay rule + the
    cumulative-delay sampling rule (frame visible at t = last frame with
    start <= t), WITHOUT the engine's GIF encoder/LZW/decoder/compositor
    — if any codec stage corrupts a pixel or a delay, the engine's
    decoded frame features diverge and the hash check fails."""
    import hashlib

    docs = _load(sf_dir, "documents")
    recs = []
    for mid, text in zip(docs["doc_id"].astype(int), docs["text"]):
        mid = int(mid)
        nf = 2 + mid % 3
        frames, delays = [], []
        for fidx in range(nf):
            d = hashlib.sha256(f"{text}@{fidx}".encode("utf-8")).digest()
            reps = (8 * 8 * 3) // len(d) + 1
            img = np.frombuffer((d * reps)[: 8 * 8 * 3],
                                np.uint8).reshape(8, 8, 3)
            frames.append(img.astype(np.float64) / 255.0)
            delays.append(300 + 200 * ((mid + fidx) % 3))
        starts = np.concatenate([[0], np.cumsum(delays)[:-1]])
        total = int(sum(delays))
        for i, t in enumerate(range(0, max(total, 1), 400)):
            fi = int(np.searchsorted(starts, t, side="right") - 1)
            feats = frames[fi].mean(axis=(0, 1))
            for j, v in enumerate(feats):
                recs.append((mid, i, int(t), j, float(_r(v))))
    df = pd.DataFrame(recs, columns=["media_id", "frame_idx", "t_ms",
                                     "feat_idx", "v"])
    return df, pa.schema([("media_id", pa.int64()),
                          ("frame_idx", pa.int32()),
                          ("t_ms", pa.int64()),
                          ("feat_idx", pa.int32()),
                          ("v", pa.float64())])


def g_media_resized_features(sf_dir):
    """Independent re-derivation of q_media_resized_features: the sha256
    pixel rule -> a STRAIGHT-LINE per-output-pixel scalar bilinear loop
    (half-pixel centers, border-clamped, the pinned weight order
    tl(1-fy)(1-fx) + tr(1-fy)fx + bl·fy(1-fx) + br·fy·fx) -> np.round
    uint8 quantization -> per-channel mean/std. No engine resize or
    codec code anywhere in this path."""
    import hashlib
    import math

    oh, ow = 3, 5
    docs = _load(sf_dir, "documents")
    recs = []
    for mid, text in zip(docs["doc_id"].astype(int), docs["text"]):
        d = hashlib.sha256(str(text).encode("utf-8")).digest()
        reps = (8 * 8 * 3) // len(d) + 1
        img = np.frombuffer((d * reps)[: 8 * 8 * 3],
                            np.uint8).reshape(8, 8, 3)
        a = img.astype(np.float64) / 255.0
        h, w = 8, 8
        out = np.empty((oh, ow, 3), dtype=np.float64)
        for i in range(oh):
            y = (i + 0.5) * (h / oh) - 0.5
            y0 = min(max(math.floor(y), 0), h - 1)
            y1 = min(y0 + 1, h - 1)
            fy = min(max(y - y0, 0.0), 1.0)
            for j in range(ow):
                x = (j + 0.5) * (w / ow) - 0.5
                x0 = min(max(math.floor(x), 0), w - 1)
                x1 = min(x0 + 1, w - 1)
                fx = min(max(x - x0, 0.0), 1.0)
                for c in range(3):
                    out[i, j, c] = (a[y0, x0, c] * (1 - fy) * (1 - fx)
                                    + a[y0, x1, c] * (1 - fy) * fx
                                    + a[y1, x0, c] * fy * (1 - fx)
                                    + a[y1, x1, c] * fy * fx)
        q = np.clip(np.round(out * 255.0), 0, 255).astype(np.uint8)
        f = q.astype(np.float64) / 255.0
        feats = np.concatenate([f.mean(axis=(0, 1)), f.std(axis=(0, 1))])
        for j, v in enumerate(feats):
            recs.append((int(mid), j, float(_r(v))))
    df = pd.DataFrame(recs, columns=["media_id", "feat_idx", "v"])
    return df, pa.schema([("media_id", pa.int64()),
                          ("feat_idx", pa.int32()), ("v", pa.float64())])


def g_media_audio_features(sf_dir):
    """Independent re-derivation of q_media_audio_features: spec-level
    pure-Python xxhash64 sample rule + int16 quantization (the lossy
    step of 16-bit PCM), then the same duration/rms/mean/zcr formulas —
    no engine WAV code anywhere in this path."""
    docs = _load(sf_dir, "documents")
    recs = []
    for mid, text in zip(docs["doc_id"].astype(int), docs["text"]):
        t = str(text)
        n = 160 + (xxh64_signed(t) % 41 + 41) % 41
        h = np.array([xxh64_signed(f"{t}#{i}") for i in range(n)],
                     dtype=object)
        v = (np.array([(int(x) % 2001 + 2001) % 2001 for x in h],
                      dtype=np.float64) - 1000.0) / 1024.0
        q = (np.round(np.clip(v * 32768.0, -32768, 32767))
             / 32768.0)[:, None]
        zc = (np.signbit(q[1:]) != np.signbit(q[:-1])).mean() \
            if n > 1 else 0.0
        recs.append((int(mid), int(n),
                     float(_r(np.sqrt((q ** 2).mean()), 6)),
                     float(_r(q.mean(), 6)), float(_r(zc, 6))))
    df = pd.DataFrame(recs, columns=["media_id", "duration_ms", "rms",
                                     "mean_v", "zcr"])
    return df, pa.schema([("media_id", pa.int64()),
                          ("duration_ms", pa.int64()),
                          ("rms", pa.float64()), ("mean_v", pa.float64()),
                          ("zcr", pa.float64())])


def _jpeg_lossy_px(img: np.ndarray, quality: int, chroma_444: bool):
    """The baseline-JPEG lossy pipeline re-implemented from the public
    spec (ITU-T T.81 Annex K tables, IJG quality scaling, JFIF color
    transform) in order-independent integer arithmetic: uint8 (16n,16n,3)
    pixels -> decode(encode(px)) reconstruction as float64 RGB in [0,1].
    No engine codec code anywhere in this path: the DCT basis is
    re-derived from the cosine formula, and only integer matmuls +
    pinned floor-shifts are used, so this matches the engine's
    vectorized codec bitwise iff both implement the pinned numerics
    correctly (the Huffman layer must round-trip losslessly for the
    engine side to agree). Shared by the JPEG and MJPEG-AVI goldens."""
    # DCT-II basis at 2^13 fixed point, from the spec formula
    u = np.arange(8)
    cu = np.where(u == 0, 1.0 / np.sqrt(2.0), 1.0)
    M = np.round((1 << 13) * 0.5 * cu[:, None]
                 * np.cos((2 * np.arange(8)[None, :] + 1)
                          * u[:, None] * np.pi / 16)).astype(np.int64)
    base_l = np.array([
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113,
        92, 49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112,
        100, 103, 99], dtype=np.int64).reshape(8, 8)
    base_c = np.array([
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99], dtype=np.int64).reshape(8, 8)

    def scaled(base, quality):
        s = 5000 // quality if quality < 50 else 200 - 2 * quality
        return np.clip((base * s + 50) // 100, 1, 255)

    half = np.int64(1 << 15)

    def block_pipe(plane, qt):
        h, w = plane.shape
        out = np.empty_like(plane)
        for by in range(h // 8):
            for bx in range(w // 8):
                x = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128
                t = M @ x @ M.T                     # scale 2^26, exact
                d = qt << 26
                q = np.sign(t) * ((2 * np.abs(t) + d) // (2 * d))
                c = q * qt
                s = M.T @ c @ M
                r = ((s + (1 << 25)) >> 26) + 128
                out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                    np.clip(r, 0, 255)
        return out

    img = np.asarray(img).astype(np.int64)
    r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
    y = (19595 * r + 38470 * g + 7471 * b + half) >> 16
    cb = np.clip(((-11058 * r - 21710 * g + 32768 * b + half) >> 16)
                 + 128, 0, 255)
    cr = np.clip(((32768 * r - 27439 * g - 5329 * b + half) >> 16)
                 + 128, 0, 255)
    y = np.clip(y, 0, 255)
    qtl, qtc = scaled(base_l, quality), scaled(base_c, quality)
    yp = block_pipe(y, qtl)
    if chroma_444:                                  # 4:4:4
        cbp, crp = block_pipe(cb, qtc), block_pipe(cr, qtc)
    else:                                           # 4:2:0
        hh, ww = img.shape[0], img.shape[1]

        def down(p):
            s = p.reshape(hh // 2, 2, ww // 2, 2).sum(axis=(1, 3))
            return (s + 2) >> 2

        def up(p):
            return np.repeat(np.repeat(p, 2, axis=0), 2, axis=1)

        cbp = up(block_pipe(down(cb), qtc))
        crp = up(block_pipe(down(cr), qtc))
    yy = yp << 16
    cbd, crd = cbp - 128, crp - 128
    rr = np.clip((yy + 91881 * crd + half) >> 16, 0, 255)
    gg = np.clip((yy - 22553 * cbd - 46802 * crd + half) >> 16, 0, 255)
    bb = np.clip((yy + 116130 * cbd + half) >> 16, 0, 255)
    return np.stack([rr, gg, bb], axis=2).astype(np.float64) / 255.0


def g_media_jpeg_features(sf_dir):
    """Independent re-derivation of q_media_jpeg_features: the sha256
    pixel rule -> the independent integer lossy pipeline
    (_jpeg_lossy_px) -> per-channel mean/std."""
    import hashlib

    docs = _load(sf_dir, "documents")
    recs = []
    for mid, text in zip(docs["doc_id"].astype(int), docs["text"]):
        mid = int(mid)
        d = hashlib.sha256(f"{text}!jpeg".encode("utf-8")).digest()
        reps = (16 * 16 * 3) // len(d) + 1
        img = np.frombuffer((d * reps)[: 16 * 16 * 3],
                            np.uint8).reshape(16, 16, 3)
        px = _jpeg_lossy_px(img, 90 if mid % 2 == 0 else 75,
                            chroma_444=(mid % 2 == 0))
        feats = np.concatenate([px.mean(axis=(0, 1)), px.std(axis=(0, 1))])
        for j, v in enumerate(feats):
            recs.append((mid, j, float(_r(v))))
    df = pd.DataFrame(recs, columns=["media_id", "feat_idx", "v"])
    return df, pa.schema([("media_id", pa.int64()),
                          ("feat_idx", pa.int32()), ("v", pa.float64())])


def g_media_video_features(sf_dir):
    """Independent re-derivation of q_media_video_features: the sha256
    per-frame pixel rule -> the independent integer lossy JPEG pipeline
    (_jpeg_lossy_px — every MJPEG frame is a baseline JPEG) -> the exact
    integer timing rule delay[i] = ((i+1)*1000)//fps - (i*1000)//fps ->
    the cumulative-start sampling rule (frame visible at t = last frame
    with start <= t) -> per-channel frame means. No engine AVI demux,
    JPEG codec, or sampling code anywhere in this path — drift in the
    RIFF layer, the Huffman/DCT stages, dwScale/dwRate timing, or the
    sampler breaks the hash match."""
    import hashlib

    docs = _load(sf_dir, "documents")
    recs = []
    for mid, text in zip(docs["doc_id"].astype(int), docs["text"]):
        mid = int(mid)
        nf = 2 + mid % 3
        quality, c444, fps = ((90, True, 3) if mid % 2 == 0
                              else (75, False, 2))
        frames = []
        for fidx in range(nf):
            d = hashlib.sha256(f"{text}@v{fidx}".encode("utf-8")).digest()
            reps = (16 * 16 * 3) // len(d) + 1
            img = np.frombuffer((d * reps)[: 16 * 16 * 3],
                                np.uint8).reshape(16, 16, 3)
            frames.append(_jpeg_lossy_px(img, quality, chroma_444=c444))
        delays = [((i + 1) * 1000) // fps - (i * 1000) // fps
                  for i in range(nf)]
        starts = np.concatenate([[0], np.cumsum(delays)[:-1]])
        total = int(sum(delays))
        for i, t in enumerate(range(0, max(total, 1), 400)):
            fi = int(np.searchsorted(starts, t, side="right") - 1)
            feats = frames[fi].mean(axis=(0, 1))
            for j, v in enumerate(feats):
                recs.append((mid, i, int(t), j, float(_r(v))))
    df = pd.DataFrame(recs, columns=["media_id", "frame_idx", "t_ms",
                                     "feat_idx", "v"])
    return df, pa.schema([("media_id", pa.int64()),
                          ("frame_idx", pa.int32()),
                          ("t_ms", pa.int64()),
                          ("feat_idx", pa.int32()),
                          ("v", pa.float64())])


def g_lttb_downsample(sf_dir, m: int = 32):
    """Straight-line LTTB re-derivation (shares no code with
    kernels/lttb.py): per-conv gap-filled hourly turn_rate series →
    the m kept points. Pinned semantics mirrored scalar-wise: float
    bucket bounds 1+floor(k*(n-2)/(m-2)), next-bucket centroid via
    np.mean on the contiguous slice, cross product evaluated
    (xa-cx)*(y-ya) - (xa-x)*(cy-ya) per candidate, strict > keeps the
    earliest max."""
    ev = _events_conv(sf_dir)
    freq = "h"
    df = ev.assign(bucket=ev["ts"].dt.floor(freq))
    cnt = (df.groupby(["conv_id", "bucket"]).size().rename("n")
           .reset_index())
    recs = []
    for cid in sorted(cnt["conv_id"].unique(), key=int):
        sub = cnt[cnt["conv_id"] == cid]
        idx = pd.date_range(sub["bucket"].min(), sub["bucket"].max(),
                            freq=freq)
        y = (sub.set_index("bucket")["n"].reindex(idx, fill_value=0)
             .to_numpy(dtype=np.float64)) * 60.0 / 3600
        n = len(y)
        if n <= m:
            keep = list(range(n))
        else:
            keep, a = [0], 0
            every = (n - 2) / (m - 2)
            for k in range(m - 2):
                lo = 1 + int(np.floor(k * every))
                hi = (1 + int(np.floor((k + 1) * every))
                      if k + 1 < m - 2 else n - 1)
                if k + 1 < m - 2:
                    nlo = 1 + int(np.floor((k + 1) * every))
                    nhi = (1 + int(np.floor((k + 2) * every))
                           if k + 2 < m - 2 else n - 1)
                else:
                    nlo, nhi = n - 1, n
                cx = float(np.mean(np.arange(nlo, nhi, dtype=np.float64)))
                cy = float(np.mean(y[nlo:nhi]))
                best, best_area = lo, -1.0
                for i in range(lo, hi):
                    area = abs((a - cx) * (y[i] - y[a])
                               - (a - i) * (cy - y[a]))
                    if area > best_area:
                        best, best_area = i, area
                keep.append(best)
                a = best
            keep.append(n - 1)
        for i in keep:
            recs.append((str(cid), int(i), idx[i].to_pydatetime(),
                         float(_r(y[i]))))
    df = pd.DataFrame(recs, columns=["conv_id", "sel_idx", "bucket", "value"])
    return df, pa.schema([("conv_id", pa.string()), ("sel_idx", pa.int32()),
                          ("bucket", pa.timestamp("us")),
                          ("value", pa.float64())])


def g_ewma_1h(sf_dir, alpha: float = 0.25):
    """Scalar EWMA re-derivation over the gap-filled hourly series —
    the same left-to-right recurrence the engine kernel pins
    (s[0]=y[0]; s[t]=alpha*y[t]+(1-alpha)*s[t-1]); alpha=0.25 is exact
    in binary so both sides produce bitwise-identical doubles."""
    ev = _events_conv(sf_dir)
    df = ev.assign(bucket=ev["ts"].dt.floor("h"))
    cnt = (df.groupby(["conv_id", "bucket"]).size().rename("n")
           .reset_index())
    recs = []
    beta = 1.0 - alpha
    for cid in sorted(cnt["conv_id"].unique(), key=int):
        sub = cnt[cnt["conv_id"] == cid]
        idx = pd.date_range(sub["bucket"].min(), sub["bucket"].max(),
                            freq="h")
        y = (sub.set_index("bucket")["n"].reindex(idx, fill_value=0)
             .to_numpy(dtype=np.float64)) * 60.0 / 3600
        s = y[0] if len(y) else 0.0
        for i in range(len(y)):
            if i:
                s = alpha * y[i] + beta * s
            recs.append((str(cid), int(i), idx[i].to_pydatetime(),
                         float(_r(y[i])), float(_r(s))))
    out = pd.DataFrame(recs, columns=["conv_id", "idx", "bucket",
                                      "raw", "smoothed"])
    return out, pa.schema([("conv_id", pa.string()), ("idx", pa.int32()),
                           ("bucket", pa.timestamp("us")),
                           ("raw", pa.float64()),
                           ("smoothed", pa.float64())])


GOLDENS = {
    "lttb_downsample": g_lttb_downsample,
    "ewma_1h": g_ewma_1h,
    "media_image_features": g_media_image_features,
    "media_audio_features": g_media_audio_features,
    "media_frame_features": g_media_frame_features,
    "media_resized_features": g_media_resized_features,
    "media_jpeg_features": g_media_jpeg_features,
    "media_video_features": g_media_video_features,
    "ivf_ann_topk": g_ivf_ann_topk,
    "drift_1h_1d": g_drift_1h_1d,
    "dtwnn_series": g_dtwnn_series,
    "knn_series": g_knn_series,
    "softdtw_pairs": g_softdtw_pairs,
    "fastdtw_pairs": g_fastdtw_pairs,
    "gdtw_pairs": g_gdtw_pairs,
    "matrix_profile": g_matrix_profile,
    "distance_profile": g_distance_profile,
    "align_delays": g_align_delays,
    "dba_reps": g_dba_reps,
    "dbaclust_assign": g_dbaclust_assign,
    "gorilla_roundtrip": g_gorilla_roundtrip,
    "transcripts_rollup": g_transcripts_rollup,
    "minhash_pairs": g_minhash_pairs,
    "neardup_keep": g_neardup_keep,
    "simhash": g_simhash,
    "simhash_neardup": g_simhash_neardup,
    "embedding_neardup_lsh": g_embedding_neardup_lsh,
    "lsh_ann_topk": g_lsh_ann_topk,
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        _REPO, "golden", os.path.basename(sf_dir.rstrip("/")))
    os.makedirs(out_dir, exist_ok=True)
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    for name, fn in GOLDENS.items():
        if only and name not in only:
            continue
        df, schema = fn(sf_dir)
        _write(out_dir, name, df, schema)


if __name__ == "__main__":
    main()
