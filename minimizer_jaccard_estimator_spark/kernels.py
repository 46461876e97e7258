"""Vectorized numpy ``uint64`` sketch kernels.

These are the algorithmic core of the engine: k-shingling, seeded 64-bit
hashing, (w,k) winnowed-minimizer selection, MinHash signatures, and SimHash.
They are pure functions over numpy arrays — no Spark — and are wrapped by
Arrow/pandas UDFs in :mod:`minimizer_jaccard_estimator_spark.functions`.

Parity contract: at the same (k, w, hash type, hash seed) configuration the
DNA-mode kernels reproduce the reference implementation bit-for-bit:

- 2-bit packing          — reference ``jaccard_correction_test.py:708,723-727``
                           and ``sliding_jaccard.py:588,604-611`` (sentinel).
- minimap2 hash          — reference ``minimap2_hash_uncompiled.py:21-31``.
- splitmix64 hash        — reference ``splitmix64_hash_uncompiled.py:39-48``.
- murmurhash3 (64-bit)   — reference ``murmurhash3_uncompiled.py:43-110``.
- winnowed minimizers    — reference ``winnowed_minimizers.py:18-53`` (linear)
                           and ``:56-96`` (circular).
- replicate seed family  — reference ``jaccard_correction_test.py:200-217``.

All hash arithmetic is unsigned 64-bit.  Spark's LongType is signed, so the
UDF layer reinterprets the bits (two's complement) at the column boundary via
:func:`u64_to_i64` / :func:`i64_to_u64`; ordering comparisons (the winnower,
MinHash minima) always happen here in uint64 space.
"""

from __future__ import annotations

import random

import numpy as np

U64 = np.uint64
MASK64 = U64(0xFFFFFFFFFFFFFFFF)
SENTINEL = U64(0xFFFFFFFFFFFFFFFF)

# byte-shingle fingerprint base: FNV-1a 64-bit prime (odd => bijective mult mod 2^64)
_FNV64_PRIME = U64(0x100000001B3)
_FNV64_OFFSET = U64(0xCBF29CE484222325)

HASH_TYPES = ("minimap2", "murmurhash3", "splitmix64")

_EMPTY_U64 = np.empty(0, dtype=np.uint64)
_EMPTY_I64 = np.empty(0, dtype=np.int64)


# ---------------------------------------------------------------------------
# signed/unsigned 64-bit reinterpretation (the single uint64<->LongType seam)
# ---------------------------------------------------------------------------

def u64_to_i64(a: np.ndarray) -> np.ndarray:
    """Reinterpret uint64 bits as int64 (for storage in Spark LongType)."""
    return a.view(np.int64) if a.dtype == np.uint64 else a.astype(np.uint64).view(np.int64)


def i64_to_u64(a: np.ndarray) -> np.ndarray:
    """Reinterpret int64 bits as uint64 (when reading back from LongType)."""
    a = np.asarray(a, dtype=np.int64)
    return a.view(np.uint64)


# ---------------------------------------------------------------------------
# hash kernels (elementwise over uint64 arrays)
# ---------------------------------------------------------------------------

def minimap2_hash(seed: int, v: np.ndarray, mask: int) -> np.ndarray:
    """Seeded minimap2 hash64; invertible over ``mask+1`` when mask=4**k-1.

    Bit-parity with reference ``minimap2_hash_uncompiled.py:21-31`` (every
    intermediate there is masked, so wrapping uint64 arithmetic is exact).
    """
    seed_u = U64(seed & 0xFFFFFFFFFFFFFFFF)
    mask_u = U64(mask)
    v = np.asarray(v, dtype=np.uint64)
    with np.errstate(over="ignore"):
        u = (v + seed_u) & mask_u
        u = (~u + (u << U64(21))) & mask_u
        u = u ^ (u >> U64(24))
        u = (u + (u << U64(3)) + (u << U64(8))) & mask_u
        u = u ^ (u >> U64(14))
        u = (u + (seed_u >> U64(5))) & mask_u
        u = (u + (u << U64(2)) + (u << U64(4))) & mask_u
        u = u ^ (u >> U64(28))
        u = (u + (u << U64(31))) & mask_u
    return u


def splitmix64_hash(seed: int, v: np.ndarray) -> np.ndarray:
    """Seeded Stafford Mix13 (splitmix64 finalizer); invertible over 2**64.

    Bit-parity with reference ``splitmix64_hash_uncompiled.py:39-48``.  That
    code computes ``u = v + seed`` in unbounded Python ints, so when the sum
    carries past 2**64 the subsequent ``u ^= u >> 30`` sees bit 64; we
    replicate that carry explicitly (it lands on bit 34 of the shifted term).
    All later steps only depend on the value mod 2**64, so plain wrapping
    arithmetic is exact for them.
    """
    seed_u = U64((seed ^ 0x3243F6A8885A308D) & 0xFFFFFFFFFFFFFFFF)
    v = np.asarray(v, dtype=np.uint64)
    with np.errstate(over="ignore"):
        u = v + seed_u
        carry = (u < v).astype(np.uint64)
        u = u ^ ((u >> U64(30)) | (carry << U64(34)))
        u = u * U64(0xBF58476D1CE4E5B9)
        u = u ^ (u >> U64(27))
        u = u + (seed_u >> U64(5))
        u = u * U64(0x94D049BB133111EB)
        u = u ^ (u >> U64(31))
    return u


def _fmix64(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> U64(33))
    k = k * U64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> U64(33))
    k = k * U64(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> U64(33))
    return k


def murmurhash3(seed: int, v: np.ndarray, which: str = "xor") -> np.ndarray:
    """64-bit MurmurHash3_x64_128 on a fixed 8-byte input, reduced to 64 bits.

    Bit-parity with reference ``murmurhash3_uncompiled.py:43-110`` (all steps
    there are masked to 64 bits, so wrapping arithmetic is exact).  NOT
    invertible; collisions are possible, which disables the bias-correction
    path exactly as in the reference.
    """
    v = np.asarray(v, dtype=np.uint64)
    seed_u = U64(seed & 0xFFFFFFFFFFFFFFFF)
    c1 = U64(0x87C37B91114253D5)
    c2 = U64(0x4CF5AD432745937F)
    with np.errstate(over="ignore"):
        h1 = np.full(v.shape, seed_u, dtype=np.uint64)
        h2 = h1.copy()
        k1 = v * c1
        k1 = (k1 << U64(31)) | (k1 >> U64(33))
        k1 = k1 * c2
        h1 = h1 ^ k1
        h1 = h1 ^ U64(8)
        h2 = h2 ^ U64(8)
        h1 = h1 + h2
        h2 = h2 + h1
        h1 = _fmix64(h1)
        h2 = _fmix64(h2)
        h1 = h1 + h2
        h2 = h2 + h1
        if which == "h1":
            return h1
        if which == "h2":
            return h2
        if which == "+":
            return h1 + h2
    return h1 ^ h2


def hash_mask(hash_type: str, k: int) -> int:
    """The value-domain mask the given hash uses at shingle size k.

    minimap2 hashes within ``4**k`` (reference ``hash_functions.py:26``);
    the other two use the full 64-bit domain.
    """
    if hash_type == "minimap2":
        return (4 ** k) - 1 if k < 32 else 0xFFFFFFFFFFFFFFFF
    return 0xFFFFFFFFFFFFFFFF


def apply_hash(hash_type: str, seed: int, v: np.ndarray, k: int = 32) -> np.ndarray:
    """Dispatch like reference ``hash_functions.py:17-45``."""
    if hash_type == "minimap2":
        return minimap2_hash(seed, v, hash_mask("minimap2", k))
    if hash_type == "murmurhash3":
        return murmurhash3(seed, v)
    if hash_type == "splitmix64":
        return splitmix64_hash(seed, v)
    raise ValueError(f"unsupported hash type {hash_type!r}; expected one of {HASH_TYPES}")


def apply_hash_matrix(hash_type: str, seeds: np.ndarray, v: np.ndarray, k: int = 32) -> np.ndarray:
    """(len(seeds), len(v)) uint64 matrix: every seed's hash of every value.

    Same bit-exact formulas as the scalar-seed kernels with the seed axis
    broadcast — one SIMD pass instead of len(seeds) kernel calls (the MinHash
    hot path).  Equality with the looped kernels is property-tested.
    """
    seeds = np.asarray(seeds, dtype=np.uint64).reshape(-1, 1)
    v = np.asarray(v, dtype=np.uint64).reshape(1, -1)
    with np.errstate(over="ignore"):
        if hash_type == "minimap2":
            mask_u = U64(hash_mask("minimap2", k))
            u = (v + seeds) & mask_u
            u = (~u + (u << U64(21))) & mask_u
            u = u ^ (u >> U64(24))
            u = (u + (u << U64(3)) + (u << U64(8))) & mask_u
            u = u ^ (u >> U64(14))
            u = (u + (seeds >> U64(5))) & mask_u
            u = (u + (u << U64(2)) + (u << U64(4))) & mask_u
            u = u ^ (u >> U64(28))
            return (u + (u << U64(31))) & mask_u
        if hash_type == "splitmix64":
            seed_u = seeds ^ U64(0x3243F6A8885A308D)
            u = v + seed_u
            carry = (u < v).astype(np.uint64)
            u = u ^ ((u >> U64(30)) | (carry << U64(34)))
            u = u * U64(0xBF58476D1CE4E5B9)
            u = u ^ (u >> U64(27))
            u = u + (seed_u >> U64(5))
            u = u * U64(0x94D049BB133111EB)
            return u ^ (u >> U64(31))
        if hash_type == "murmurhash3":
            c1 = U64(0x87C37B91114253D5)
            c2 = U64(0x4CF5AD432745937F)
            k1 = v * c1
            k1 = (k1 << U64(31)) | (k1 >> U64(33))
            k1 = k1 * c2
            h1 = (seeds ^ k1) ^ U64(8)
            h2 = np.broadcast_to(seeds ^ U64(8), h1.shape)
            h1 = h1 + h2
            h2 = h2 + h1
            h1 = _fmix64(h1)
            h2 = _fmix64(h2)
            h1 = h1 + h2
            h2 = h2 + h1
            return h1 ^ h2
    raise ValueError(f"unsupported hash type {hash_type!r}; expected one of {HASH_TYPES}")


def hash_is_invertible(hash_type: str) -> bool:
    """minimap2/splitmix64 are invertible (duplicate-free hashes from
    duplicate-free shingles); murmurhash3 is not — gates the correction path
    like reference ``jaccard_correction_test.py:429-432``."""
    return hash_type in ("minimap2", "splitmix64")


# ---------------------------------------------------------------------------
# replicate seed family (the MinHash permutation family)
# ---------------------------------------------------------------------------

def seed_family(hash_seed: int, num_replicates: int, prng_seed: str | int | None) -> list[int]:
    """N distinct 64-bit hash seeds, replicating reference
    ``jaccard_correction_test.py:200-217``: seed #0 is the user seed, the
    rest are PRNG draws xor-folded with the user seed.  The same family is
    reused for every pair (it is broadcast to the signature kernel)."""
    if num_replicates == 1:
        return [hash_seed]
    rng = random.Random()
    rng.seed(prng_seed)
    seeds: list[int] = []
    for i in range(num_replicates):
        s = rng.randint(0, (1 << 64) - 1)
        if i == 0:
            seeds.append(hash_seed)
        else:
            seeds.append(s ^ hash_seed)
    return seeds


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------

_NT_LUT = np.full(256, 255, dtype=np.uint8)
for _i, _c in enumerate("ACGT"):
    _NT_LUT[ord(_c)] = _i

_RC_TABLE = bytes.maketrans(b"ACGT", b"TGCA")


def reverse_complement(seq: str) -> str:
    """Reference ``sliding_jaccard.py:692-696``."""
    return seq.upper().encode("ascii").translate(_RC_TABLE)[::-1].decode("ascii")


def pack_kmers_2bit(seq: str, k: int, on_invalid: str = "raise") -> np.ndarray:
    """All k-mer 2-bit packings of a DNA string, MSB-first (A=0 C=1 G=2 T=3).

    Parity with reference ``jaccard_correction_test.py:708,723-727`` (raises
    on non-ACGT, mirroring its KeyError) and ``sliding_jaccard.py:588,604-611``
    (``on_invalid='sentinel'`` → 0xFFFFFFFFFFFFFFFF).
    """
    if not 2 <= k <= 32:
        raise ValueError("k must be in [2, 32]")
    raw = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    n = raw.shape[0]
    L = n - k + 1
    if L <= 0:
        return _EMPTY_U64
    nt = _NT_LUT[raw]
    bad = nt == 255
    kb = np.zeros(L, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            kb = (kb << U64(2)) | nt[j:j + L].astype(np.uint64)
    if bad.any():
        if on_invalid == "raise":
            pos = int(np.nonzero(bad)[0][0])
            raise ValueError(f"non-ACGT character {seq[pos]!r} at position {pos}")
        # windowed OR: kmer window [i, i+k) contains a bad char
        badw = np.convolve(bad.astype(np.int8), np.ones(k, dtype=np.int8), mode="valid") > 0
        kb[badw] = SENTINEL
    return kb


def canonical_kmers_2bit(seq: str, k: int, on_invalid: str = "raise") -> np.ndarray:
    """min(kmer, revcomp kmer) packing — reference
    ``jaccard_correction_test.py:713-721``.  String ``min`` on ACGT k-mers of
    equal length coincides with numeric min of their 2-bit packings because
    the alphabet order A<C<G<T matches the code order 0<1<2<3.

    ``on_invalid='sentinel'`` (reference ``sliding_jaccard.py:589-611``
    canonical path, ADVICE r05): a window containing a non-ACGT character is
    SENTINEL.  This matches the reference exactly: the complement map sends
    every non-ACGT character to another non-ACGT character (IUPAC→IUPAC,
    unknown→itself, lowercase→lowercase), so whichever strand wins the
    string ``min`` still contains the bad character and the reference's
    KeyError → hashOfBadKmer fires for precisely these windows."""
    fwd = pack_kmers_2bit(seq, k, on_invalid=on_invalid)
    rev = pack_kmers_2bit(reverse_complement(seq), k, on_invalid=on_invalid)[::-1]
    out = np.minimum(fwd, rev)
    if on_invalid == "sentinel" and out.size:
        out[(fwd == SENTINEL) | (rev == SENTINEL)] = SENTINEL
    return out


def hash_dna_sequence(
    seq: str,
    k: int,
    hash_type: str = "minimap2",
    seed: int = 0,
    canonical: bool = False,
    on_invalid: str = "raise",
) -> np.ndarray:
    """Positional hash sequence of a DNA string — reference
    ``jaccard_correction_test.py:710-729`` / ``sliding_jaccard.py:591-613``.
    With ``on_invalid='sentinel'`` non-ACGT k-mers keep the raw sentinel and
    are NOT hashed (reference ``sliding_jaccard.py:609-611``)."""
    if canonical:
        kb = canonical_kmers_2bit(seq, k, on_invalid=on_invalid)
    else:
        kb = pack_kmers_2bit(seq, k, on_invalid=on_invalid)
    if kb.size == 0:
        return kb
    if on_invalid == "sentinel":
        out = kb.copy()
        ok = kb != SENTINEL
        out[ok] = apply_hash(hash_type, seed, kb[ok], k)
        return out
    return apply_hash(hash_type, seed, kb, k)


def shingle_fingerprints(text: str, k: int) -> np.ndarray:
    """Positional 64-bit fingerprints of all k-byte shingles of UTF-8 text.

    Transcript-mode analogue of the reference's 2-bit k-mer packing
    (``jaccard_correction_test.py:723-727``) for general text: an FNV-1a-style
    base-256 polynomial mod 2**64 (odd multiplier => each step bijective).
    Fingerprints then feed the same seeded hash kernels as DNA k-mers.
    """
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    n = data.shape[0]
    L = n - k + 1
    if L <= 0:
        return _EMPTY_U64
    fp = np.full(L, _FNV64_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            fp = (fp ^ data[j:j + L].astype(np.uint64)) * _FNV64_PRIME
    return fp


def hash_text_shingles(text: str, k: int, hash_type: str = "splitmix64", seed: int = 0) -> np.ndarray:
    """Positional hash sequence over byte shingles of text (transcript mode)."""
    fp = shingle_fingerprints(text, k)
    if fp.size == 0:
        return fp
    return apply_hash(hash_type, seed, fp, 32)


# ---------------------------------------------------------------------------
# winnowed minimizer selection
# ---------------------------------------------------------------------------

def winnow_minimizers(hashes: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """(values, positions) of the (w)-winnowed minimizers of a hash sequence.

    Vectorized equivalent of reference ``winnowed_minimizers.py:18-53``
    (monotonic deque).  Parity-critical semantics replicated:

    - sequences shorter than w yield nothing (``:21``);
    - ties keep the OLDEST position (deque pops only strictly greater,
      ``:33`` — numpy ``argmin`` picks the leftmost minimum, same rule);
    - each (value, pos) pair is emitted once (``:49-53``); window-min
      positions are non-decreasing, so consecutive-position dedup is exact.

    Returns uint64 values and int64 positions, ordered by position (the
    reference's first-emission order).
    """
    hashes = np.asarray(hashes, dtype=np.uint64)
    L = hashes.shape[0]
    if L < w:
        return _EMPTY_U64, _EMPTY_I64
    windows = np.lib.stride_tricks.sliding_window_view(hashes, w)
    am = windows.argmin(axis=1)
    pos = am + np.arange(L - w + 1, dtype=np.int64)
    keep = np.empty(pos.shape[0], dtype=bool)
    keep[0] = True
    np.not_equal(pos[1:], pos[:-1], out=keep[1:])
    p = pos[keep]
    return hashes[p], p


def winnow_minimizers_circular(hashes: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Circular variant — reference ``winnowed_minimizers.py:56-96``:
    scan ``len+w-1`` with wraparound; a wrapped (value, pos>=L) emission is
    suppressed if (value, pos-L) was already emitted, and reported at its
    un-wrapped position otherwise (the reference keeps the raw extended
    position; we normalize to mod-L like its dedup key)."""
    hashes = np.asarray(hashes, dtype=np.uint64)
    L = hashes.shape[0]
    if L == 0:
        return _EMPTY_U64, _EMPTY_I64
    ext = np.concatenate([hashes, hashes[: w - 1]])
    if ext.shape[0] < w:
        return _EMPTY_U64, _EMPTY_I64
    windows = np.lib.stride_tricks.sliding_window_view(ext, w)
    am = windows.argmin(axis=1)
    pos = am + np.arange(windows.shape[0], dtype=np.int64)
    keep = np.empty(pos.shape[0], dtype=bool)
    keep[0] = True
    np.not_equal(pos[1:], pos[:-1], out=keep[1:])
    p = pos[keep]
    # drop wrapped re-emissions of an already-emitted (value, pos mod L)
    pm = p % L
    first = np.unique(pm, return_index=True)[1]
    p_sel = p[np.sort(first)]
    return hashes[p_sel % L], p_sel % L


def count_hash_duplicates(hashes: np.ndarray) -> int:
    """#positions whose hash appeared earlier — reference
    ``jaccard_correction_test.py:770-778``."""
    if len(hashes) == 0:
        return 0
    return int(hashes.shape[0] - np.unique(np.asarray(hashes, dtype=np.uint64)).shape[0])


# ---------------------------------------------------------------------------
# MinHash / SimHash signature kernels
# ---------------------------------------------------------------------------

def minhash_signature(
    fingerprints: np.ndarray,
    seeds: np.ndarray,
    hash_type: str = "splitmix64",
    empty_fill: int = 0xFFFFFFFFFFFFFFFF,
) -> np.ndarray:
    """len(seeds) MinHash minima over the DISTINCT fingerprints of one doc.

    One seeded hash per replicate = the reference's replicate axis
    (``jaccard_correction_test.py:310-331``) turned into a batched MinHash
    signature.  Returns uint64 array of shape (len(seeds),).
    """
    seeds = np.asarray(seeds, dtype=np.uint64)
    out = np.full(seeds.shape[0], U64(empty_fill), dtype=np.uint64)
    if fingerprints.size == 0:
        return out
    fp = np.unique(np.asarray(fingerprints, dtype=np.uint64))
    if hash_type == "splitmix64":
        return _minhash_splitmix_blocked(fp, seeds, out)
    # block the ELEMENT axis so every (S, block) intermediate stays in cache
    # (the kernel is memory-traffic bound; 256 elements x 128 seeds x 8B =
    # 256 KiB per intermediate, measured ~1.7x faster than one big matrix and
    # flat across core counts)
    block = 256
    for lo in range(0, fp.shape[0], block):
        m = apply_hash_matrix(hash_type, seeds, fp[lo:lo + block], 32).min(axis=1)
        np.minimum(out, m, out=out)
    return out


def _minhash_splitmix_blocked(
    fp: np.ndarray, seeds: np.ndarray, out: np.ndarray, block: int = 256
) -> np.ndarray:
    """splitmix64 MinHash with preallocated in-place (S, block) buffers —
    bit-identical to the generic matrix path (covered by the chunked-vs-loop
    test) at ~2x the throughput: the 11 per-step temporaries of the naive
    broadcast collapse into two reused scratch matrices."""
    seed_u = (seeds ^ U64(0x3243F6A8885A308D)).reshape(-1, 1)
    seed_shift = seed_u >> U64(5)
    S = seeds.shape[0]
    u = np.empty((S, block), dtype=np.uint64)
    t = np.empty((S, block), dtype=np.uint64)
    c = np.empty((S, block), dtype=bool)
    with np.errstate(over="ignore"):
        for lo in range(0, fp.shape[0], block):
            blk = fp[lo:lo + block].reshape(1, -1)
            n = blk.shape[1]
            uu = splitmix_seeded_block(blk, seed_u, seed_shift,
                                       u[:, :n], t[:, :n], c[:, :n])
            np.minimum(out, uu.min(axis=1), out=out)
    return out


def splitmix_seeded_block(
    blk: np.ndarray, seed_u: np.ndarray, seed_shift: np.ndarray,
    uu: np.ndarray, tt: np.ndarray, cc: np.ndarray,
) -> np.ndarray:
    """One (S, n) block of the seeded splitmix64 family, computed in-place
    into ``uu`` with ``tt``/``cc`` as scratch — the SINGLE home of the
    12-step hash body including the >2**64 carry quirk (see
    :func:`splitmix64_hash`).  Both the per-document blocked MinHash above
    and :mod:`.kernels_batch`'s whole-batch kernel call this, so the two
    paths cannot silently diverge bit-for-bit.  Caller wraps in
    ``np.errstate(over="ignore")``.

    ``seed_u`` is ``(seeds ^ 0x3243F6A8885A308D).reshape(-1, 1)``;
    ``seed_shift`` is ``seed_u >> 5``."""
    np.add(blk, seed_u, out=uu)
    np.less(uu, blk, out=cc)  # carry past 2**64 (see splitmix64_hash)
    np.right_shift(uu, U64(30), out=tt)
    tt |= cc.astype(np.uint64) << U64(34)
    uu ^= tt
    uu *= U64(0xBF58476D1CE4E5B9)
    np.right_shift(uu, U64(27), out=tt)
    uu ^= tt
    uu += seed_shift
    uu *= U64(0x94D049BB133111EB)
    np.right_shift(uu, U64(31), out=tt)
    uu ^= tt
    return uu


def oph_signature(
    fingerprints: np.ndarray,
    num_perm: int,
    hash_type: str = "splitmix64",
    seed: int = 0,
    empty_fill: int = 0xFFFFFFFFFFFFFFFF,
) -> np.ndarray:
    """One-permutation MinHash (Li/Owen/Zhang) with rotation densification
    (Shrivastava & Li) — the 100TB-scale signature path.

    ONE seeded hash pass over the distinct fingerprints; slot = top bits of
    the hash, slot value = min hash in the slot; empty slots borrow (value ^
    slot-mixed offset hash is NOT needed — plain rotation borrow keeps the
    collision-probability-=J property per the densified-OPH analysis).  ~100x
    cheaper than the seeded family at num_perm=128, same LSH banding layout.
    Deterministic given (hash_type, seed, num_perm).
    """
    assert num_perm > 0 and (num_perm & (num_perm - 1)) == 0, "num_perm must be a power of 2"
    out = np.full(num_perm, U64(empty_fill), dtype=np.uint64)
    if fingerprints.size == 0:
        return out
    fp = np.unique(np.asarray(fingerprints, dtype=np.uint64))
    h = apply_hash(hash_type, seed, fp, 32)
    bits = num_perm.bit_length() - 1
    if bits == 0:
        # num_perm=1: shift-by-64 is C UB; the single slot takes the min
        return np.array([h.min()], dtype=np.uint64)
    slots = (h >> U64(64 - bits)).astype(np.int64)
    np.minimum.at(out, slots, h)
    empty = out == U64(empty_fill)
    if empty.any() and not empty.all():
        # rotation densification: empty slot i takes the value of the nearest
        # non-empty slot to its right (cyclic).  Vectorized (VERDICT r03 #3):
        # over the doubled index array, "nearest non-empty at or after i" is a
        # reversed cumulative-min of positions with empties pushed to a
        # sentinel — no per-slot Python loop in the hot Arrow UDF.
        ext_empty = np.concatenate([empty, empty])
        pos = np.where(ext_empty, 2 * num_perm, np.arange(2 * num_perm))
        nearest = np.minimum.accumulate(pos[::-1])[::-1][:num_perm]
        out = out.copy()
        out[empty] = out[nearest[empty] % num_perm]
    return out


def simhash64(fingerprints: np.ndarray, seed: int = 0, hash_type: str = "splitmix64") -> int:
    """64-bit SimHash over the distinct fingerprints of one doc: per-bit
    majority vote of the seeded hashes.  Returns a uint64 as Python int."""
    if fingerprints.size == 0:
        return 0
    fp = np.unique(np.asarray(fingerprints, dtype=np.uint64))
    h = apply_hash(hash_type, seed, fp, 32)
    # little-endian unpack: bit j of byte b == bit (8b + j) of the uint64, so
    # column c of `bits` is bit c — identical to ((h >> c) & 1) but ~3x less
    # memory traffic than the shift-matrix form.  The byte view assumes
    # little-endian layout; force it so persisted sketches stay identical on
    # a big-endian host (astype is a no-op copy-free view on LE machines)
    h_le = h.astype("<u8", copy=False)
    bits = np.unpackbits(h_le.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    votes = bits.sum(axis=0, dtype=np.int64) * 2 - h.shape[0]  # +1 set, -1 clear
    weights = U64(1) << np.arange(64, dtype=np.uint64)
    return int((weights * (votes > 0).astype(np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
