"""Segmented BATCH-level sketch kernels (text mode).

The per-document Arrow UDF loop in :mod:`.functions.sketch` calls the
vectorized :mod:`.kernels` once per document; for short documents the
per-call Python overhead is the cost floor of the pipeline's dominant stage
(VERDICT r04 #4).  This module computes the full sketch of an ENTIRE Arrow
batch of documents with one set of numpy operations: all texts are
concatenated into a single byte array, shingled/hashes/winnowed/signed as
flat segmented arrays, and only split back into per-document arrays at the
very end.

Bit-parity contract: for every document the outputs equal the per-document
kernels exactly (pinned by tests/test_kernels.py batch-parity tests):

- shingle fingerprints == :func:`.kernels.shingle_fingerprints` (windows
  crossing a document boundary in the concatenation are masked out);
- winnowed minimizers == :func:`.kernels.winnow_minimizers` (leftmost-min
  tie rule and consecutive-position dedup are position-shift-invariant, so
  the flat sliding-window argmin restricted to intra-document windows is
  exact);
- n_dups == :func:`.kernels.count_hash_duplicates` (len - #distinct per
  segment; for invertible hashes #distinct hashes == #distinct
  fingerprints, murmurhash3 pays a hash-keyed sort for exactness);
- OPH signatures == :func:`.kernels.oph_signature`: sort-free slot-min
  scatter via ``np.minimum.at`` (duplicates can't change a min);
  densification is the same nearest-non-empty-to-the-right cyclic borrow,
  run row-wise over the whole batch matrix;
- seeded MinHash == :func:`.kernels.minhash_signature`: per-seed minima over
  each segment's distinct fingerprints via blocked hash matrices +
  ``np.minimum.reduceat`` (blocks may split a segment; the merge is a
  ``np.minimum`` into the output, which is associative);
- SimHash == :func:`.kernels.simhash64`: per-bit majority votes via
  ``np.add.reduceat`` over the unpacked uint8 bit matrix with reduceat
  groups capped at 255 rows (uint8 sums can't wrap), recombined in int64.

DNA mode keeps the per-document path (parity/debug domain, not the scale
path).
"""

from __future__ import annotations

import numpy as np

from . import kernels as K

U64 = np.uint64
_EMPTY_U64 = np.empty(0, dtype=np.uint64)
_EMPTY_I64 = np.empty(0, dtype=np.int64)


def batch_shingle_fingerprints(
    data: np.ndarray, lens: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Segmented k-shingle fingerprints of concatenated documents.

    Returns (fp_all, n_shingles, seg) where ``fp_all`` is every document's
    fingerprint sequence concatenated in document order (bit-identical per
    segment to :func:`.kernels.shingle_fingerprints`), ``n_shingles[d]`` =
    max(0, lens[d]-k+1), and ``seg`` labels each fingerprint with its
    document index.
    """
    n_docs = lens.shape[0]
    n_sh = np.maximum(lens - k + 1, 0)
    seg = np.repeat(np.arange(n_docs, dtype=np.int64), n_sh)
    L = data.shape[0] - k + 1
    if L <= 0 or seg.shape[0] == 0:
        return _EMPTY_U64, n_sh, _EMPTY_I64
    # one rolling-polynomial pass over the whole concatenation; a window
    # starting at byte p is a real shingle iff bytes p and p+k-1 belong to
    # the same document
    fp = np.full(L, K._FNV64_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            fp = (fp ^ data[j:j + L].astype(np.uint64)) * K._FNV64_PRIME
    byte_doc = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    valid = byte_doc[:L] == byte_doc[k - 1:]
    return fp[valid], n_sh, seg


def batch_winnow(
    h_all: np.ndarray, seg: np.ndarray, n_docs: int, w: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Segmented (w)-winnow: (values, doc-local positions, per-doc counts).

    Exact per-segment equivalent of :func:`.kernels.winnow_minimizers`: the
    flat sliding-window argmin keeps only windows fully inside one segment,
    and the consecutive-duplicate-position dedup resets at segment starts.
    """
    M = h_all.shape[0] - w + 1
    if M <= 0:
        return _EMPTY_U64, _EMPTY_I64, np.zeros(n_docs, dtype=np.int64)
    # chunked sliding-window argmin: numpy's strided argmin degrades ~20x
    # when the base array falls out of cache (measured 2.02 s vs 0.10 s at
    # 1.1M x w=20); chunks overlap by w-1 so every window is computed whole
    # and results are exact
    C = 32768
    am = np.empty(M, dtype=np.int64)
    for lo in range(0, M, C):
        hi = min(lo + C, M)
        win = np.lib.stride_tricks.sliding_window_view(h_all[lo:hi + w - 1], w)
        am[lo:hi] = win.argmin(axis=1)
    pos_g = am + np.arange(M, dtype=np.int64)
    valid = seg[:M] == seg[w - 1:]
    pos_g = pos_g[valid]
    seg_w = seg[:M][valid]
    if pos_g.shape[0] == 0:
        return _EMPTY_U64, _EMPTY_I64, np.zeros(n_docs, dtype=np.int64)
    keep = np.empty(pos_g.shape[0], dtype=bool)
    keep[0] = True
    np.not_equal(pos_g[1:], pos_g[:-1], out=keep[1:])
    keep[1:] |= seg_w[1:] != seg_w[:-1]
    p_sel = pos_g[keep]
    seg_sel = seg_w[keep]
    seg_starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(np.bincount(seg, minlength=n_docs), out=seg_starts[1:])
    local = p_sel - seg_starts[seg_sel]
    counts = np.bincount(seg_sel, minlength=n_docs)
    return h_all[p_sel], local, counts


def _seg_value_sort(vals: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    """Copy of ``vals`` with each ``bounds[i]:bounds[i+1]`` segment sorted
    ascending — the segmented equivalent of np.unique's sort step.  In-place
    VALUE sorts on contiguous slices (~10 ns/element, SIMD introsort) beat
    any argsort-based formulation (lexsort gathers through an index array at
    ~10x that); the per-segment Python loop is one cheap call per document.
    """
    out = vals.copy()
    for i in range(bounds.shape[0] - 1):
        out[bounds[i]:bounds[i + 1]].sort()
    return out


def _segment_distinct(
    fp_all: np.ndarray, h_all: np.ndarray, seg: np.ndarray, n_docs: int,
    hash_type: str, n_per_seg: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-segment DISTINCT fingerprints (the np.unique-per-doc domain of the
    seeded MinHash / SimHash kernels) plus the duplicate-hash counts.

    Returns (n_dups, ufp, useg).  For invertible hashes #distinct hashes ==
    #distinct fingerprints so n_dups falls out of the same sorted pass,
    while murmurhash3 (collisions possible) pays a second segmented sort of
    the hashes to count distinct hash values exactly as
    :func:`.kernels.count_hash_duplicates` does.
    """
    if fp_all.shape[0] == 0:
        z = np.zeros(n_docs, dtype=np.int64)
        return z, _EMPTY_U64, _EMPTY_I64
    bounds = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_per_seg, out=bounds[1:])
    fps = _seg_value_sort(fp_all, bounds)
    new = np.empty(fps.shape[0], dtype=bool)
    new[0] = True
    new[1:] = (fps[1:] != fps[:-1]) | (seg[1:] != seg[:-1])
    ufp, useg = fps[new], seg[new]
    if K.hash_is_invertible(hash_type):
        n_dups = n_per_seg - np.bincount(useg, minlength=n_docs)
    else:
        hs = _seg_value_sort(h_all, bounds)
        same = (hs[1:] == hs[:-1]) & (seg[1:] == seg[:-1])
        n_dups = np.bincount(seg[1:][same], minlength=n_docs)
    return n_dups, ufp, useg


def batch_oph(
    h_all: np.ndarray, seg: np.ndarray, n_docs: int, num_perm: int,
    empty_fill: int = 0xFFFFFFFFFFFFFFFF,
) -> np.ndarray:
    """(n_docs, num_perm) OPH signature matrix — bit-identical rows to
    :func:`.kernels.oph_signature`.

    Sort-free: slot minima scatter via ``np.minimum.at`` (numpy >= 1.24 has
    an indexed fast path — measured ~4 ms over 1.1M hashes); duplicate
    hashes are harmless (min over a multiset == min over its set).
    """
    assert num_perm > 0 and (num_perm & (num_perm - 1)) == 0
    out = np.full((n_docs, num_perm), U64(empty_fill), dtype=np.uint64)
    if h_all.shape[0] == 0:
        return out
    bits = num_perm.bit_length() - 1
    if bits == 0:
        flat = seg
    else:
        slots = (h_all >> U64(64 - bits)).astype(np.int64)
        flat = seg * num_perm + slots
    np.minimum.at(out.reshape(-1), flat, h_all)
    # rotation densification, row-wise over the whole batch (same
    # nearest-non-empty-to-the-right cyclic borrow as oph_signature)
    empty = out == U64(empty_fill)
    need = empty.any(axis=1) & ~empty.all(axis=1)
    if need.any():
        P = num_perm
        e2 = np.concatenate([empty[need], empty[need]], axis=1)
        pos = np.where(e2, 2 * P, np.arange(2 * P, dtype=np.int64)[None, :])
        nearest = np.minimum.accumulate(pos[:, ::-1], axis=1)[:, ::-1][:, :P]
        src = (nearest % P).astype(np.int64)
        rows = out[need]
        filled = np.take_along_axis(rows, src, axis=1)
        out[need] = np.where(empty[need], filled, rows)
    return out


def batch_seeded_minhash(
    ufp: np.ndarray, useg: np.ndarray, n_docs: int, seeds: np.ndarray,
    hash_type: str, block: int = 256,
    empty_fill: int = 0xFFFFFFFFFFFFFFFF,
) -> np.ndarray:
    """(n_docs, len(seeds)) seeded-family MinHash matrix over each segment's
    distinct fingerprints — bit-identical rows to
    :func:`.kernels.minhash_signature`.

    Blocked along the fingerprint axis so every (S, block) hash matrix stays
    cache-resident; a block may split a segment, and the per-block
    ``np.minimum.reduceat`` partial minima merge into the output with
    ``np.minimum`` (associative, so the split is exact).
    """
    S = seeds.shape[0]
    out_t = np.full((S, n_docs), U64(empty_fill), dtype=np.uint64)
    N = ufp.shape[0]
    # splitmix64 (the default/scale family): reuse two preallocated (S,block)
    # scratch matrices across blocks instead of the generic matrix kernel's
    # ~11 fresh temporaries per step — same ~2x the per-doc specialized
    # kernel (kernels._minhash_splitmix_blocked) gets, bit-identical results
    splitmix = hash_type == "splitmix64"
    if splitmix:
        seed_u = (seeds ^ U64(0x3243F6A8885A308D)).reshape(-1, 1)
        seed_shift = seed_u >> U64(5)
        u = np.empty((S, block), dtype=np.uint64)
        t = np.empty((S, block), dtype=np.uint64)
        c = np.empty((S, block), dtype=bool)
    for lo in range(0, N, block):
        hi = min(lo + block, N)
        if splitmix:
            blk = ufp[lo:hi].reshape(1, -1)
            n = blk.shape[1]
            with np.errstate(over="ignore"):
                # shared 12-step body (incl. the >2**64 carry quirk) —
                # kernels.splitmix_seeded_block is the single home, so the
                # batch and per-document paths stay bit-identical
                m = K.splitmix_seeded_block(blk, seed_u, seed_shift,
                                            u[:, :n], t[:, :n], c[:, :n])
        else:
            m = K.apply_hash_matrix(hash_type, seeds, ufp[lo:hi], 32)
        sg = useg[lo:hi]
        if sg[0] == sg[-1]:
            # whole block inside one segment (the long-document common case):
            # a contiguous axis-min beats reduceat's grouped path
            d = sg[0]
            np.minimum(out_t[:, d], m.min(axis=1), out=out_t[:, d])
        else:
            starts = np.empty(sg.shape[0], dtype=bool)
            starts[0] = True
            np.not_equal(sg[1:], sg[:-1], out=starts[1:])
            idx = np.nonzero(starts)[0]
            red = np.minimum.reduceat(m, idx, axis=1)
            docs = sg[idx]
            out_t[:, docs] = np.minimum(out_t[:, docs], red)
    return out_t.T


def batch_simhash(uh: np.ndarray, useg: np.ndarray, n_docs: int) -> np.ndarray:
    """int64 SimHash per document from each segment's distinct-fingerprint
    hashes — value-identical to :func:`.kernels.simhash64` (empty docs -> 0).

    Byte-histogram formulation (no N x 64 bit matrix — both the unpacked
    matrix and a wide reduceat over it were measured hot spots): for each of
    the hash's 8 little-endian bytes, a per-segment 256-bin histogram via
    one ``np.bincount`` over ``seg * 256 + byte``, then 8 bits of votes fall
    out of ``hist @ bit_table``.  Eight linear passes over the hashes, all
    cache-resident intermediates.
    """
    votes = np.zeros((n_docs, 64), dtype=np.int64)
    sizes = np.bincount(useg, minlength=n_docs) if useg.shape[0] else np.zeros(
        n_docs, dtype=np.int64)
    N = uh.shape[0]
    if N:
        u8 = uh.astype("<u8", copy=False).view(np.uint8).reshape(-1, 8)
        base = useg * 256
        vals = np.arange(256, dtype=np.int64)
        bit_table = ((vals[:, None] >> np.arange(8)[None, :]) & 1).astype(np.int64)
        for j in range(8):
            hist = np.bincount(
                base + u8[:, j], minlength=n_docs * 256
            ).reshape(n_docs, 256)
            votes[:, 8 * j:8 * j + 8] = hist @ bit_table
    signed = votes * 2 - sizes[:, None]
    weights = (U64(1) << np.arange(64, dtype=np.uint64))[None, :]
    u = (weights * (signed > 0).astype(np.uint64)).sum(axis=1, dtype=np.uint64)
    return u.view(np.int64)


# documents-per-kernel-call cap, in concatenated text BYTES.  The whole-batch
# formulation originally ran each ~10k-doc Arrow batch (tens of MB of text)
# as ONE concatenation — hundreds of MB of fp/h intermediates, so every
# kernel pass STREAMED DRAM.  Single-threaded that measured fast (one core's
# streaming bandwidth is ample), but at 8+ contending executors the pinned
# 2->8 sketch-stage scaling collapsed to ~0.50 (vs 0.94 for the
# cache-resident per-document kernels): the batch kernels' aggregate
# bandwidth demand hit the socket ceiling.  Chunking the batch at ~256 KB of
# text keeps the per-call arrays L2/L3-slice-resident (fp+h ~4 MB) while
# still amortizing the Python call overhead over thousands of short docs —
# both the short-doc throughput win and the multi-core scaling survive.
# Parity is unaffected: every kernel is segment-exact, so grouping docs into
# chunks cannot change any per-document output (pinned by a forced
# multi-chunk parity test).
_CHUNK_TEXT_BYTES = 1 << 18


def batch_full_sketch_text(
    texts,
    k: int,
    w: int,
    hash_type: str,
    hash_seed: int,
    minhash_scheme: str,
    num_perm: int,
    seeds: np.ndarray | None,
    simhash_seed: int,
    simhash_hash_type: str,
    include_positions: bool,
    chunk_bytes: int = _CHUNK_TEXT_BYTES,
) -> dict:
    """Full text-mode sketch of one Arrow batch with no per-document Python.

    Returns a dict of columns matching ``full_sketch_udf``'s schema:
    minimizers / [positions] as lists of per-doc int64 arrays, n_shingles /
    n_dups / simhash as int64 arrays, minhash as a list of per-doc int64
    arrays.  Internally the batch is processed in ~``chunk_bytes``-of-text
    document groups (cache residency — see ``_CHUNK_TEXT_BYTES``).
    """
    bufs = [(t or "").encode("utf-8") for t in texts]
    n_all = len(bufs)
    if n_all == 0:
        out = {"minimizers": []}
        if include_positions:
            out["positions"] = []
        out.update(n_shingles=_EMPTY_I64, n_dups=_EMPTY_I64,
                   minhash=[], simhash=_EMPTY_I64)
        return out
    parts = []
    lo = 0
    while lo < n_all:
        hi, acc = lo, 0
        while hi < n_all and (acc == 0 or acc + len(bufs[hi]) <= chunk_bytes):
            acc += len(bufs[hi])
            hi += 1
        parts.append(_sketch_text_chunk(
            bufs[lo:hi], k, w, hash_type, hash_seed, minhash_scheme,
            num_perm, seeds, simhash_seed, simhash_hash_type,
            include_positions,
        ))
        lo = hi
    if len(parts) == 1:
        return parts[0]
    out = {key: ([] if isinstance(parts[0][key], list) else None)
           for key in parts[0]}
    for key in out:
        if isinstance(parts[0][key], list):
            for p in parts:
                out[key].extend(p[key])
        else:
            out[key] = np.concatenate([p[key] for p in parts])
    return out


def _sketch_text_chunk(
    bufs,
    k: int,
    w: int,
    hash_type: str,
    hash_seed: int,
    minhash_scheme: str,
    num_perm: int,
    seeds: np.ndarray | None,
    simhash_seed: int,
    simhash_hash_type: str,
    include_positions: bool,
) -> dict:
    """One cache-resident document group of :func:`batch_full_sketch_text`
    (``bufs`` are pre-encoded utf-8 byte strings)."""
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
    data = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    n_docs = lens.shape[0]
    fp_all, n_sh, seg = batch_shingle_fingerprints(data, lens, k)
    if fp_all.shape[0]:
        h_all = K.apply_hash(hash_type, hash_seed, fp_all, 32)
    else:
        h_all = _EMPTY_U64
    mini_v, mini_p, mini_counts = batch_winnow(h_all, seg, n_docs, w)
    n_dups, ufp, useg = _segment_distinct(fp_all, h_all, seg, n_docs, hash_type, n_sh)
    if minhash_scheme == "oph":
        sig = batch_oph(h_all, seg, n_docs, num_perm)
    else:
        assert seeds is not None
        sig = batch_seeded_minhash(ufp, useg, n_docs, seeds, hash_type)
    # SimHash uses its own seed over the same distinct fingerprints
    if ufp.shape[0]:
        uh_sim = K.apply_hash(simhash_hash_type, simhash_seed, ufp, 32)
    else:
        uh_sim = _EMPTY_U64
    sims = batch_simhash(uh_sim, useg, n_docs)

    bounds = np.cumsum(mini_counts)[:-1]
    minis = np.split(K.u64_to_i64(mini_v), bounds)
    out = {"minimizers": minis}
    if include_positions:
        out["positions"] = np.split(mini_p.astype(np.int32), bounds)
    out["n_shingles"] = n_sh.astype(np.int64)
    out["n_dups"] = np.asarray(n_dups, dtype=np.int64)
    out["minhash"] = list(K.u64_to_i64(sig.reshape(n_docs, -1)))
    out["simhash"] = sims
    return out


def _chunk_bufs(bufs, chunk_bytes: int):
    """Yield (lo, hi) document ranges of ~chunk_bytes of concatenated text
    (the cache-residency rule of ``_CHUNK_TEXT_BYTES``)."""
    n_all = len(bufs)
    lo = 0
    while lo < n_all:
        hi, acc = lo, 0
        while hi < n_all and (acc == 0 or acc + len(bufs[hi]) <= chunk_bytes):
            acc += len(bufs[hi])
            hi += 1
        yield lo, hi
        lo = hi


def batch_signature_text(
    texts,
    k: int,
    hash_type: str,
    hash_seed: int,
    minhash_scheme: str,
    num_perm: int,
    seeds: np.ndarray | None,
    simhash_seed: int,
    simhash_hash_type: str,
    chunk_bytes: int = _CHUNK_TEXT_BYTES,
) -> dict:
    """Signature-only batch kernel (r06): MinHash + SimHash of one Arrow
    batch with no per-document Python and WITHOUT the winnow/n_dups work the
    full sketch also pays — the signature UDF (``add_signature``) previously
    looped per document (~the r04 cost floor the full sketch already
    escaped).  Same segmented component kernels, so bit-parity with the
    per-document path follows from the pinned batch-parity contract (and is
    pinned again in tests/test_kernels.py)."""
    bufs = [(t or "").encode("utf-8") for t in texts]
    if not bufs:
        return {"minhash": [], "simhash": _EMPTY_I64}
    sigs: list = []
    sims: list = []
    for lo, hi in _chunk_bufs(bufs, chunk_bytes):
        part = bufs[lo:hi]
        lens = np.fromiter((len(b) for b in part), dtype=np.int64, count=len(part))
        data = np.frombuffer(b"".join(part), dtype=np.uint8)
        n_docs = lens.shape[0]
        fp_all, n_sh, seg = batch_shingle_fingerprints(data, lens, k)
        if fp_all.shape[0]:
            h_all = K.apply_hash(hash_type, hash_seed, fp_all, 32)
        else:
            h_all = _EMPTY_U64
        _, ufp, useg = _segment_distinct(fp_all, h_all, seg, n_docs, hash_type, n_sh)
        if minhash_scheme == "oph":
            sig = batch_oph(h_all, seg, n_docs, num_perm)
        else:
            assert seeds is not None
            sig = batch_seeded_minhash(ufp, useg, n_docs, seeds, hash_type)
        if ufp.shape[0]:
            uh_sim = K.apply_hash(simhash_hash_type, simhash_seed, ufp, 32)
        else:
            uh_sim = _EMPTY_U64
        sigs.extend(K.u64_to_i64(sig.reshape(n_docs, -1)))
        sims.append(batch_simhash(uh_sim, useg, n_docs))
    return {"minhash": sigs, "simhash": np.concatenate(sims)}


def batch_sketch_text(
    texts,
    k: int,
    w: int,
    hash_type: str,
    hash_seed: int,
    chunk_bytes: int = _CHUNK_TEXT_BYTES,
) -> dict:
    """Sketch-only batch kernel (r06): winnowed minimizers + positions +
    n_shingles + n_dups of one Arrow batch without the MinHash/SimHash work
    — the ``add_sketch`` twin of :func:`batch_signature_text`."""
    bufs = [(t or "").encode("utf-8") for t in texts]
    if not bufs:
        return {"minimizers": [], "positions": [],
                "n_shingles": _EMPTY_I64, "n_dups": _EMPTY_I64}
    minis: list = []
    poss: list = []
    n_shs: list = []
    n_dups_all: list = []
    for lo, hi in _chunk_bufs(bufs, chunk_bytes):
        part = bufs[lo:hi]
        lens = np.fromiter((len(b) for b in part), dtype=np.int64, count=len(part))
        data = np.frombuffer(b"".join(part), dtype=np.uint8)
        n_docs = lens.shape[0]
        fp_all, n_sh, seg = batch_shingle_fingerprints(data, lens, k)
        if fp_all.shape[0]:
            h_all = K.apply_hash(hash_type, hash_seed, fp_all, 32)
        else:
            h_all = _EMPTY_U64
        mini_v, mini_p, mini_counts = batch_winnow(h_all, seg, n_docs, w)
        n_dups, _, _ = _segment_distinct(fp_all, h_all, seg, n_docs, hash_type, n_sh)
        bounds = np.cumsum(mini_counts)[:-1]
        minis.extend(np.split(K.u64_to_i64(mini_v), bounds))
        poss.extend(np.split(mini_p.astype(np.int32), bounds))
        n_shs.append(n_sh.astype(np.int64))
        n_dups_all.append(np.asarray(n_dups, dtype=np.int64))
    return {"minimizers": minis, "positions": poss,
            "n_shingles": np.concatenate(n_shs),
            "n_dups": np.concatenate(n_dups_all)}
