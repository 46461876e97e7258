"""Vectorized per-pair minimizer-Jaccard bias-correction kernel.

Numpy re-derivation of the reference's correction analytics
(``jaccard_correction_test.py:419-702``): position maps, windowed shared
counts, sparse configuration-count tensor (with the dominant-bucket
subtraction trick), and the scriptD / scriptC / Bias reductions.

This runs per conversation pair inside a grouped Arrow UDF — the distributed
axis is PAIRS (thousands in parallel across executors); each pair's
O(matches * w^2) inner work stays in one vectorized kernel, mirroring the
reference's sparse-enumeration optimization (``configurations()``,
``jaccard_correction_test.py:633-650``) instead of the dense O(L^2) scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# chunk the per-match (w+1)^2 neighborhood expansion to bound memory
_CHUNK_CELLS = 8_000_000


class DuplicateHashError(ValueError):
    """A hash sequence contains duplicates — the correction is undefined
    (reference raises ValueError, ``jaccard_correction_test.py:736-761``)."""


@dataclass
class CorrectionResult:
    script_d: int
    jaccard_from_d: float
    script_c: float
    bias: float
    # sparse config counts: {(s, cal, car, cbl, cbr): count}
    n_configurations: dict[tuple[int, int, int, int, int], int] = field(default_factory=dict)


def position_map(hash_a: np.ndarray, hash_b: np.ndarray) -> np.ndarray:
    """aPosToBPos as an int64 array (−1 where A's hash is absent from B).

    Equivalent of reference ``shared_hash_positions``
    (``jaccard_correction_test.py:736-761``) including its duplicate-free
    requirement on BOTH sides.
    """
    a = np.asarray(hash_a, dtype=np.uint64)
    b = np.asarray(hash_b, dtype=np.uint64)
    for name, h in (("A", a), ("B", b)):
        if h.shape[0] != np.unique(h).shape[0]:
            raise DuplicateHashError(f"hash sequence {name} contains duplicate values")
    order = np.argsort(b, kind="stable")
    b_sorted = b[order]
    idx = np.searchsorted(b_sorted, a)
    idx_c = np.clip(idx, 0, b_sorted.shape[0] - 1)
    hit = b_sorted.shape[0] > 0
    found = (b_sorted[idx_c] == a) if hit else np.zeros(a.shape[0], dtype=bool)
    out = np.full(a.shape[0], -1, dtype=np.int64)
    out[found] = order[idx_c[found]]
    return out


def _neighborhood_counts(
    ap: np.ndarray, bp: np.ndarray, w: int, lo_off: int, i_max: int, j_max: int, width: int
) -> tuple[np.ndarray, np.ndarray]:
    """Unique cell keys (i*width+j) + per-cell multiplicity of the
    (w or w+1)-square neighborhoods around each match (ap, bp).

    ``lo_off`` = w-1 gives the shared-count grid
    (``window_shared_counts``, ``jaccard_correction_test.py:541-555``);
    ``lo_off`` = w gives the config-enumeration grid
    (``configurations``, ``:633-650``).
    """
    span = lo_off + 1
    offs = np.arange(span, dtype=np.int64)
    n = ap.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    per_match = span * span
    step = max(1, _CHUNK_CELLS // per_match)
    uniq_parts: list[np.ndarray] = []
    cnt_parts: list[np.ndarray] = []
    for s0 in range(0, n, step):
        a_chunk = ap[s0:s0 + step]
        b_chunk = bp[s0:s0 + step]
        ii = a_chunk[:, None] - lo_off + offs[None, :]        # (m, span)
        jj = b_chunk[:, None] - lo_off + offs[None, :]
        vi = (ii >= 0) & (ii <= i_max)
        vj = (jj >= 0) & (jj <= j_max)
        keys = (ii[:, :, None] * width + jj[:, None, :]).reshape(-1)
        valid = (vi[:, :, None] & vj[:, None, :]).reshape(-1)
        k = keys[valid]
        if k.size:
            u, c = np.unique(k, return_counts=True)
            uniq_parts.append(u)
            cnt_parts.append(c)
    if not uniq_parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    allk = np.concatenate(uniq_parts)
    allc = np.concatenate(cnt_parts)
    u, inv = np.unique(allk, return_inverse=True)
    c = np.zeros(u.shape[0], dtype=np.int64)
    np.add.at(c, inv, allc)
    return u, c


def _config_codes(
    hash_a: np.ndarray,
    hash_b: np.ndarray,
    a_to_b: np.ndarray,
    b_to_a: np.ndarray,
    w: int,
    i: np.ndarray,
    j: np.ndarray,
) -> np.ndarray:
    """Vectorized ``configuration_matrix`` (``jaccard_correction_test.py:663-702``).

    Returns cal*27 + car*9 + cbl*3 + cbr per (i, j).
    """
    def corner(hx, hy, x_to_y, xi, yj, lo_off, hi_off):
        # 0 if hx[xi]==hy[yj]; 2 if xi unmapped; 1 if yj+lo_off<=map<=yj+hi_off; else 2
        eq = hx[xi] == hy[yj]
        m = x_to_y[xi]
        mapped = m >= 0
        inwin = mapped & (m >= yj + lo_off) & (m <= yj + hi_off)
        return np.where(eq, 0, np.where(inwin, 1, 2)).astype(np.int64)

    # cal: j+1 <= aPosToBPos[i]   <= j+w      (ref :682-685)
    # car: j+1 <= aPosToBPos[i+w] <= j+w-1    (ref :687-690; yj = j+w)
    cal = corner(hash_a, hash_b, a_to_b, i, j, 1, w)
    car = corner(hash_a, hash_b, a_to_b, i + w, j + w, 1 - w, -1)
    cbl = corner(hash_b, hash_a, b_to_a, j, i, 1, w)
    cbr = corner(hash_b, hash_a, b_to_a, j + w, i + w, 1 - w, -1)
    return cal * 27 + car * 9 + cbl * 3 + cbr


def configuration_counts(
    hash_a: np.ndarray,
    hash_b: np.ndarray,
    w: int,
    a_to_b: np.ndarray | None = None,
) -> dict[tuple[int, int, int, int, int], int]:
    """Sparse config-count tensor with dominant-(2,2,2,2;0) subtraction —
    reference ``configuration_counts`` + ``configurations``
    (``jaccard_correction_test.py:580-650``)."""
    a = np.asarray(hash_a, dtype=np.uint64)
    b = np.asarray(hash_b, dtype=np.uint64)
    if a_to_b is None:
        a_to_b = position_map(a, b)
    b_to_a = position_map(b, a)
    la, lb = a.shape[0], b.shape[0]
    if la <= w or lb <= w:
        return {}
    ap = np.nonzero(a_to_b >= 0)[0].astype(np.int64)
    bp = a_to_b[ap]
    width = lb + 2  # key stride; j in [-?, lb] never collides across i

    # shared[(i,j)] over the w-square neighborhoods (valid i<=la-w, j<=lb-w)
    sh_keys, sh_cnts = _neighborhood_counts(ap, bp, w, w - 1, la - w, lb - w, width)

    # candidate (i,j) cells over the (w+1)-square neighborhoods
    # (valid i<=la-(w+1), j<=lb-(w+1))
    cand_keys, _ = _neighborhood_counts(ap, bp, w, w, la - (w + 1), lb - (w + 1), width)

    n_expected = (la - w) * (lb - w)
    counts: dict[tuple[int, int, int, int, int], int] = {}
    if cand_keys.size:
        i = cand_keys // width
        j = cand_keys % width
        # s = shared[(i+1, j+1)] (0 when absent)
        look = (i + 1) * width + (j + 1)
        pos = np.searchsorted(sh_keys, look)
        pos_c = np.clip(pos, 0, max(sh_keys.shape[0] - 1, 0))
        s_vals = np.zeros(i.shape[0], dtype=np.int64)
        if sh_keys.size:
            hit = sh_keys[pos_c] == look
            s_vals[hit] = sh_cnts[pos_c[hit]]
        cfg = _config_codes(a, b, a_to_b, b_to_a, w, i, j)
        combo = s_vals * 81 + cfg
        u, c = np.unique(combo, return_counts=True)
        for key, cnt in zip(u.tolist(), c.tolist()):
            s = key // 81
            rest = key % 81
            cal, rest = divmod(rest, 27)
            car, rest = divmod(rest, 9)
            cbl, cbr = divmod(rest, 3)
            counts[(s, cal, car, cbl, cbr)] = cnt
    reported = sum(counts.values())
    assert reported <= n_expected
    dom = (0, 2, 2, 2, 2)
    counts[dom] = counts.get(dom, 0) + (n_expected - reported)
    return counts


def _t_vals(w: int, s: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """t_i weights — reference ``jaccard_correction_test.py:464-473``."""
    t0 = 1.0 / (2 * w - s)
    t1 = t0 / (2 * w + 1 - s)
    t2 = t1 / (2 * w + 2 - s)
    return t0, t1, t2


def _script_c_weight(w: int, s: np.ndarray, cal, car, cbl, cbr) -> np.ndarray:
    """Per-(s, config) scriptC weight — the 15-term table at reference
    ``jaccard_correction_test.py:499-516``."""
    t0, t1, t2 = _t_vals(w, s)
    cfg = cal * 1000 + car * 100 + cbl * 10 + cbr
    weight = np.zeros(s.shape[0], dtype=np.float64)
    sel = lambda *codes: np.isin(cfg, codes)  # noqa: E731
    weight = np.where(sel(1010, 1020, 2010), t0, weight)
    weight = np.where(sel(2111, 2211, 1121, 1122), t1, weight)
    weight = np.where(sel(0), 2 * w * t1, weight)
    weight = np.where(sel(101, 102, 201, 202), t1 * s, weight)
    weight = np.where(sel(2222), 2 * t2 * s, weight)
    weight = np.where(sel(2121), 4 * t2 * w, weight)
    weight = np.where(sel(2122, 2221), t2 * (s + 2 * w), weight)
    weight = np.where(sel(2020), t2 * (6 * w - s + (2 * w - s) * (2 * w - s)), weight)
    return weight


def _g_func(w: int, s: np.ndarray, alpha: np.ndarray | int, beta: int) -> np.ndarray:
    """Manuscript g(s, alpha, beta) — frozen v0.4 snapshot
    ``jaccard_correction_test_v_0_4.py:679-689``:
    g = (s - alpha) / prod_{i=0..beta} (2w - s + i)."""
    g = np.asarray(s - alpha, dtype=np.float64)
    for i in range(beta + 1):
        g = g / (2 * w - s + i)
    return g


def _script_c_weight_v04(
    w: int, s: np.ndarray, cal, car, cbl, cbr, omit_0_3_0_term: bool = False
) -> np.ndarray:
    """Per-(s, config) scriptC weight for the v0.4 manuscript formulas
    (``jaccard_correction_test_v_0_4.py:447-472``).

    Unlike the v0.6 table, the v0.4 terms OVERLAP — a single configuration
    can be counted by several terms (e.g. (0,0,0,0) receives the
    (cal,0,cbl,0), nOmega[0] terms) — so the weight is a SUM over the
    matching terms.  ``omit_0_3_0_term=True`` reproduces the reference's
    ``--debug=0.3.0`` toggle (the term left out of an earlier manuscript,
    ``:467-470``)."""
    weight = np.zeros(s.shape[0], dtype=np.float64)
    is_ = lambda a, b, c, d: (cal == a) & (car == b) & (cbl == c) & (cbr == d)  # noqa: E731
    weight += np.where(is_(0, 2, 0, 2), _g_func(w, s, 0, 1), 0.0)
    weight += np.where(is_(2, 2, 2, 2), 2 * _g_func(w, s, 0, 2), 0.0)
    weight += np.where(is_(2, 1, 2, 1), 2 * _g_func(w, s, 2, 2), 0.0)
    # sum over (cal,cbl) of N[s][(cal,0,cbl,0)] * g(w,s,s-1,0)
    weight += np.where((car == 0) & (cbr == 0), _g_func(w, s, s - 1, 0), 0.0)
    # sum over cal in {0,2} of N[s][(cal,car,cbl,1)] * g(w,s,s-1,1)
    weight += np.where(((cal == 0) | (cal == 2)) & (cbr == 1), _g_func(w, s, s - 1, 1), 0.0)
    # sum over cbl in {0,2} of N[s][(cal,1,cbl,cbr)] * g(w,s,s-1,1)
    weight += np.where((car == 1) & ((cbl == 0) | (cbl == 2)), _g_func(w, s, s - 1, 1), 0.0)
    if not omit_0_3_0_term:
        weight += np.where(is_(0, 1, 0, 1), _g_func(w, s, 2, 1), 0.0)
    # nOmega[t] = sum over (car,cbr) in {(1,2),(2,1),(0,0)} of N[s][(t,car,t,cbr)]
    omega_rc = ((car == 1) & (cbr == 2)) | ((car == 2) & (cbr == 1)) | ((car == 0) & (cbr == 0))
    weight += np.where(omega_rc & (cal == 0) & (cbl == 0), _g_func(w, s, 1, 1), 0.0)
    weight += np.where(omega_rc & (cal == 2) & (cbl == 2), 2 * _g_func(w, s, 1, 2), 0.0)
    return weight


def jaccard_correction(
    hash_a: np.ndarray,
    hash_b: np.ndarray,
    w: int,
    version: str = "v0.6",
    omit_0_3_0_term: bool = False,
) -> CorrectionResult:
    """scriptD, Jd, scriptC, Bias for one pair — reference
    ``jaccard_correction`` (``jaccard_correction_test.py:426-533``).

    ``version='v0.4'`` switches scriptC to the frozen v0.4 manuscript
    formulas (``jaccard_correction_test_v_0_4.py:447-490``); everything else
    (position maps, config counts, scriptD, Bias shape) is identical between
    the two reference snapshots (verified by diff).  ``omit_0_3_0_term``
    reproduces v0.4's ``--debug=0.3.0`` toggle and is only meaningful there.
    """
    if version not in ("v0.6", "v0.4"):
        raise ValueError(f"unknown correction version {version!r}")
    a = np.asarray(hash_a, dtype=np.uint64)
    b = np.asarray(hash_b, dtype=np.uint64)
    a_to_b = position_map(a, b)  # raises DuplicateHashError like the reference
    counts = configuration_counts(a, b, w, a_to_b=a_to_b)
    L = a.shape[0]
    if L == 0:
        raise ValueError("jaccard_correction needs a non-empty hash sequence (L > 0)")

    keys = np.array(sorted(counts.keys()), dtype=np.int64).reshape(-1, 5)
    vals = np.array([counts[tuple(k)] for k in keys.tolist()], dtype=np.int64)
    s, cal, car, cbl, cbr = (keys[:, c] for c in range(5))

    script_d = int(vals[(car == 0) & (cbr == 0)].sum())
    jaccard_from_d = float(script_d) / (2 * L - script_d)

    # sum per-s in ascending s to mirror the reference's accumulation order
    if version == "v0.4":
        weights = _script_c_weight_v04(w, s, cal, car, cbl, cbr, omit_0_3_0_term)
    else:
        weights = _script_c_weight(w, s, cal, car, cbl, cbr)
    script_c = 0.0
    for s_val in np.unique(s):
        m = s == s_val
        script_c += float((weights[m] * vals[m]).sum())

    bias = (script_c / ((float(4 * L) / (w + 1)) - script_c)) - (float(script_d) / (2 * L - script_d))
    return CorrectionResult(
        script_d=script_d,
        jaccard_from_d=jaccard_from_d,
        script_c=script_c,
        bias=bias,
        n_configurations=counts,
    )
