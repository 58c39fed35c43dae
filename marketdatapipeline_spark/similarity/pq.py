"""Product quantization (PQ) kernels for the IVF index.

PQ splits each d-dim vector into ``m`` contiguous subvectors and
replaces every subvector with the id of its nearest centroid from a
per-subspace codebook of ``k`` entries — ``m`` bytes per vector at
k<=256 (64x smaller than float64 at d=64, m=8), the compression tier
below SQ8. Search scores candidates with ADC (asymmetric distance
computation): per query, one (m, k) lookup table of subspace dot
products; each candidate then costs m table lookups instead of a
d-term fold. Approximation error is bounded by the codebook
resolution; IVFIndex.topk(refine=...) restores exact ranking.

Everything is deterministic: codebooks train with seeded Lloyd
iterations on an id-ordered sample (ties in assignment break to the
smallest centroid id via argmin), so a rebuilt index is bit-identical.

Pure numpy — driver-side training on a bounded sample (the FAISS
convention) and task-side encode/score over Arrow batches.
"""

from __future__ import annotations

import numpy as np

__all__ = ["train_codebooks", "encode", "adc_tables"]


def _lloyd(x: np.ndarray, k: int, seed: int, iters: int = 20) -> np.ndarray:
    """Deterministic Lloyd k-means: seeded sample init, argmin
    assignment (ties to smallest id), empty clusters keep their
    previous centroid. Returns (k_eff, dsub) with k_eff <= k when the
    sample has fewer points than k."""
    n = len(x)
    k_eff = min(k, n)
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(n, size=k_eff, replace=False)].copy()
    for _ in range(iters):
        # ||x - c||^2 = |x|^2 - 2 x.c + |c|^2; |x|^2 constant per row
        d2 = (cents**2).sum(axis=1)[None, :] - 2.0 * (x @ cents.T)
        assign = np.argmin(d2, axis=1)
        for c in range(k_eff):
            mask = assign == c
            if mask.any():
                cents[c] = x[mask].mean(axis=0)
    return cents


def train_codebooks(
    sample: np.ndarray, m: int, k: int, seed: int = 42
) -> np.ndarray:
    """(m, k_eff, d/m) codebooks from a (n, d) training sample, one
    seeded Lloyd run per subspace."""
    n, d = sample.shape
    if d % m != 0:
        raise ValueError(f"dim ({d}) must be divisible by m ({m})")
    dsub = d // m
    books = [
        _lloyd(
            np.ascontiguousarray(sample[:, s * dsub : (s + 1) * dsub]),
            k,
            seed + s,
        )
        for s in range(m)
    ]
    k_eff = min(len(b) for b in books)
    return np.stack([b[:k_eff] for b in books])


def encode(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes: per subspace, the nearest codebook entry
    (argmin — ties to the smallest id)."""
    m, _, dsub = books.shape
    codes = np.empty((len(mat), m), dtype=np.uint8)
    for s in range(m):
        sub = mat[:, s * dsub : (s + 1) * dsub]
        cb = books[s]
        d2 = (cb**2).sum(axis=1)[None, :] - 2.0 * (sub @ cb.T)
        codes[:, s] = np.argmin(d2, axis=1)
    return codes


def adc_tables(q: np.ndarray, books: np.ndarray):
    """Per-query ADC tables: ``lut[s, c] = q_sub(s) . books[s, c]``
    plus the shared ``cn2[s, c] = |books[s, c]|^2`` (reconstruction
    norm pieces). Candidate cosine is then
    ``lut[s, code_s].sum() / (sqrt(cn2[s, code_s].sum()) * |q|)``."""
    m, k, dsub = books.shape
    lut = np.einsum("sd,skd->sk", q.reshape(m, dsub), books)
    cn2 = (books**2).sum(axis=2)
    return lut, cn2
