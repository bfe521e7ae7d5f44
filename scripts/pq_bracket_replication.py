#!/usr/bin/env python3
"""Offline replication of the q146 IVF-PQ recall bracket (RECALL.md).

Re-implements the EXACT Spark pipeline in numpy — lowid-seeded cosine
Lloyd coarse quantizer, per-subspace Euclidean-Lloyd PQ codebooks
(lowid-distinct seeding), ADC cosine ranking, exact rerank — so the
committed recall numbers can be cross-checked without a JVM, and the
remaining published dials swept at the same 4-byte budget:

  - raw-subspace vs coarse-RESIDUAL encoding (Jegou et al., TPAMI 2011)
  - PQ Lloyd iterations 3 vs 10
  - the ranking estimator: cosine plug-in q.x/|x|, distance form
    q.x - |x|^2/2, pure MIPS q.x
  - an OPQ-style PCA rotation + eigenvalue-balanced dim allocation
    (Ge et al., CVPR 2013)

r16 measured output (sf0.01, nLists=16, m=8, ksub=16, nProbe=4, k=5,
100 queries; matches graft.tools.RecallCheck to the digit):
  raw/cos/3 iters      rf=1 0.2060   (the r15 committed number)
  residual/cos/3 iters rf=1 0.2520, rf=4 0.4780, rf=16 0.5960
  estimator choice     +/- 0.012 (noise)
  10 Lloyd iters       +0.006 (noise)
  OPQ-lite             rf=1 0.2320 (NEGATIVE -- the corpus covariance
                       spectrum is near-flat: no anisotropy to exploit)

Driver-side analysis tool only (duckdb/numpy are the driver's stack,
not the library's). Usage:
  python3 scripts/pq_bracket_replication.py [/root/testdata/sf0.01]
"""
import sys

import duckdb
import numpy as np

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N_LISTS, M, KSUB, N_PROBE, K = 16, 8, 16, 4, 5


def load():
    con = duckdb.connect()
    # the testdata table is a single file; a Spark-written corpus (the
    # StructuredRecall bracket) is a directory of part files
    import os
    pat = f"{SF_DIR}/embeddings.parquet"
    if os.path.isdir(pat):
        pat = f"{pat}/*.parquet"
    rows = con.sql(
        f"select vec_id, embedding from '{pat}' "
        "order by vec_id").fetchall()
    ids = np.array([r[0] for r in rows])
    X = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, X


def coarse_train(X, n_lists=N_LISTS, iters=3):
    """lowid seeds, cosine assignment, centers = mean of unit vectors
    (trainIvfCentroids' exact scheme)."""
    U = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = X[:n_lists].copy()
    for _ in range(iters):
        cos = (X @ C.T) / (np.linalg.norm(X, axis=1, keepdims=True)
                           * np.linalg.norm(C, axis=1))
        a = np.argmax(cos, axis=1)
        for l in range(n_lists):
            m = a == l
            if m.any():
                C[l] = U[m].mean(axis=0)
    cos = (X @ C.T) / (np.linalg.norm(X, axis=1, keepdims=True)
                       * np.linalg.norm(C, axis=1))
    return C, np.argmax(cos, axis=1)


def pq_train(V, m=M, ksub=KSUB, iters=3):
    """Per-subspace Euclidean Lloyd from the first-ksub-distinct
    (lowid) seeds — trainPqCodebooks' exact scheme."""
    dsub = V.shape[1] // m
    cbs = []
    for s in range(m):
        sv = V[:, s * dsub:(s + 1) * dsub]
        seen, keys = [], set()
        for r in sv:
            t = tuple(r)
            if t not in keys:
                seen.append(r)
                keys.add(t)
            if len(seen) == ksub:
                break
        cb = np.array(seen + [seen[-1]] * (ksub - len(seen)))
        for _ in range(iters):
            d = ((sv[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
            a = d.argmin(1)
            for c in range(ksub):
                mk = a == c
                if mk.any():
                    cb[c] = sv[mk].mean(0)
        cbs.append(cb)
    return cbs


def encode(V, cbs):
    m, dsub = len(cbs), V.shape[1] // len(cbs)
    return np.stack([
        ((V[:, s * dsub:(s + 1) * dsub][:, None, :] - cbs[s][None, :, :])
         ** 2).sum(-1).argmin(1) for s in range(m)], 1)


def recon(codes, cbs):
    return np.concatenate([cbs[s][codes[:, s]] for s in range(len(cbs))], 1)


def main():
    ids, X = load()
    n = len(X)
    S = X @ X.T
    np.fill_diagonal(S, -2)
    truth = {ids[q]: set(ids[np.argsort(-S[q])[:K]])
             for q in range(n) if ids[q] < 100}
    C, assign = coarse_train(X)
    cosc = (X @ C.T) / (np.linalg.norm(X, axis=1, keepdims=True)
                        * np.linalg.norm(C, axis=1))
    probes = np.argsort(-cosc, axis=1)[:, :N_PROBE]

    def recall(Xh, est, rf):
        nh = np.linalg.norm(Xh, axis=1)
        hit = tot = 0
        for q in range(n):
            if ids[q] not in truth:
                continue
            cand = np.where(np.isin(assign, probes[q]))[0]
            cand = cand[cand != q]
            dots = Xh[cand] @ X[q]
            if est == "cos":
                score = dots / np.where(nh[cand] == 0, np.nan, nh[cand])
            elif est == "dist":
                score = dots - (nh[cand] ** 2) / 2
            else:
                score = dots
            short = cand[np.argsort(-score)[:K * rf]]
            exact = short[np.argsort(-(X[short] @ X[q]))[:K]]
            hit += len(set(ids[exact]) & truth[ids[q]])
            tot += K
        return hit / tot

    for residual in (False, True):
        V = X - C[assign] if residual else X
        for iters in (3, 10):
            cbs = pq_train(V, iters=iters)
            Xh = recon(encode(V, cbs), cbs) + (C[assign] if residual else 0)
            for est in ("cos", "dist", "mips"):
                tag = "residual" if residual else "raw"
                r = {rf: recall(Xh, est, rf) for rf in (1, 4, 16)}
                print(f"{tag:8s} est={est:4s} iters={iters:2d} "
                      f"rf1={r[1]:.4f} rf4={r[4]:.4f} rf16={r[16]:.4f}")

    # OPQ-lite: PCA rotation + eigenvalue-balanced dim allocation over
    # the residuals (Ge 2013's initialization; the full alternating
    # optimization cannot beat its own init when the spectrum is flat)
    R = X - C[assign]
    Rc = R - R.mean(0)
    w, Vt = np.linalg.eigh(np.cov(Rc.T))
    order = np.argsort(-w)
    w, Vt = w[order], Vt[:, order]
    groups, logprod = [[] for _ in range(M)], [0.0] * M
    dsub = X.shape[1] // M
    for i in range(X.shape[1]):
        j = min((g for g in range(M) if len(groups[g]) < dsub),
                key=lambda g: logprod[g])
        groups[j].append(i)
        logprod[j] += np.log(max(w[i], 1e-12))
    perm = sum(groups, [])
    Rrot = (R @ Vt)[:, perm]
    cbs2 = pq_train(Rrot)
    inv = np.empty(X.shape[1], dtype=int)
    inv[perm] = np.arange(X.shape[1])
    Xh2 = recon(encode(Rrot, cbs2), cbs2)[:, inv] @ Vt.T + C[assign]
    for est in ("cos", "mips"):
        r = {rf: recall(Xh2, est, rf) for rf in (1, 4)}
        print(f"opq-lite est={est:4s} iters= 3 "
              f"rf1={r[1]:.4f} rf4={r[4]:.4f}")
    ev_top = np.round(w[:8], 4).tolist()
    print(f"covariance spectrum top-8 {ev_top} bottom {round(w[-1], 4)} "
          f"(flat => rotation has nothing to exploit)")


if __name__ == "__main__":
    main()
