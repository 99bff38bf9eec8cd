"""Exact O(1) membership tests for (user, item) interaction pairs.

BPR verifies every sampled negative against the user's liked set — the
reference does a per-sample ``std::binary_search`` over the CSR row
(/root/reference/implicit/cpu/bpr.pyx:63-67). The TPU translation of that
search (a vectorized bisection) costs ~log2(max_row_len) *dependent* gather
rounds per minibatch and measures as ~35% of a BPR epoch at last.fm scale.

This module replaces it with a quotiented bucketized-cuckoo hash table:

- An unbalanced Feistel network permutes the (user, item) pair bijectively
  within [0, 2^a) x [0, 2^b) (a/b = bit widths of the user/item id spaces).
  Feistel networks are invertible for ANY round function, so the permuted
  key ``p`` determines the pair exactly — no fingerprint false positives.
- ``p`` is split into a bucket index (low bits) and a remainder (high
  bits). Only the remainder is stored: bucket + remainder reconstructs
  ``p``, keeping slots at 16 bits for last.fm-sized matrices (the whole
  table stays under the measured TPU gather-latency cliff).
- Each key may live in its primary bucket ``B`` or the alternate
  ``B ^ mix(remainder)`` (flagged by a slot bit, which keeps the scheme
  exact: the flag + bucket + remainder still reconstruct ``p`` uniquely).
- Lookup gathers the two 4-slot buckets — two *independent* 8-byte row
  gathers per sample versus the bisection's ~18 dependent ones.

The table is built once per fit on the host (vectorized two-round
placement, then a bounded cuckoo eviction walk for stragglers) and is
usable whenever ``a + b`` fits the slot budget; callers fall back to the
bisection otherwise.
"""

import numpy as np

# Feistel round constants (odd murmur-style multipliers) and the
# alternate-bucket mixer. Arbitrary but fixed: host build and device
# lookup must agree.
_ROUND_KEYS = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F)
_ALT_MIX = 0x165667B1
_SLOTS = 4  # slots per bucket
_MAX_REM_BITS = 29  # remainder + flag bits must fit an int32 slot


def _mix32(x, c):
    """32-bit avalanche mix (uint32 wraparound on both host and device)."""
    x = x * c
    x = x ^ (x >> 15)
    x = x * 0x2C1B3C6D
    x = x ^ (x >> 12)
    return x


def _feistel(u, i, a_bits, b_bits, xp):
    """Bijective scramble of (u, i) within [0, 2^a) x [0, 2^b).

    Unbalanced Feistel: each round swaps halves and XORs a masked mix of
    one half into the other. Works identically for numpy (host build) and
    jax.numpy (device lookup); all arithmetic is uint32 with wraparound.
    """
    L, R = u, i  # L currently a_bits wide, R b_bits wide
    l_bits, r_bits = a_bits, b_bits
    for rk in _ROUND_KEYS:
        F = _mix32(R + xp.uint32(rk), xp.uint32(0x9E3779B1))
        L, R = R, L ^ (F & xp.uint32((1 << l_bits) - 1))
        l_bits, r_bits = r_bits, l_bits
    # len(_ROUND_KEYS) is even, so (L, R) is (a_bits, b_bits) wide again
    return L, R


def _bucket_rem(u, i, a_bits, b_bits, bucket_bits, xp):
    """(bucket, remainder) of the permuted pair key.

    The permuted key is conceptually p = (L << b_bits) | R, a+b bits wide;
    bucket is its low ``bucket_bits`` bits, remainder the rest — computed
    in 32-bit pieces so no 64-bit arithmetic is needed on device.
    """
    L, R = _feistel(
        xp.asarray(u).astype(xp.uint32), xp.asarray(i).astype(xp.uint32),
        a_bits, b_bits, xp,
    )
    p_lo = ((L << b_bits) | R) & xp.uint32(0xFFFFFFFF)  # low 32 bits of p
    p_hi = L >> (32 - b_bits) if b_bits > 0 else xp.uint32(0) * L
    bucket = p_lo & xp.uint32((1 << bucket_bits) - 1)
    rem = (p_lo >> bucket_bits) | (p_hi << (32 - bucket_bits))
    rem_bits = a_bits + b_bits - bucket_bits
    return bucket, rem & xp.uint32((1 << max(rem_bits, 1)) - 1)


def _alt_bucket(bucket, rem, bucket_bits, xp):
    return bucket ^ (_mix32(rem, xp.uint32(_ALT_MIX)) & xp.uint32((1 << bucket_bits) - 1))


class PairTable:
    """Host-built cuckoo table over a CSR matrix's (row, col) pairs."""

    def __init__(self, table, a_bits, b_bits, bucket_bits):
        self.table = table  # (nbuckets, _SLOTS) uint16 or uint32; 0 = empty
        self.a_bits = a_bits
        self.b_bits = b_bits
        self.bucket_bits = bucket_bits

    def member(self, u, i, xp=np):
        """Vectorized membership test; xp = numpy (host) or jax.numpy."""
        return _member(
            xp.asarray(self.table), u, i,
            self.a_bits, self.b_bits, self.bucket_bits, xp,
        )


def _member(table, u, i, a_bits, b_bits, bucket_bits, xp):
    bucket, rem = _bucket_rem(u, i, a_bits, b_bits, bucket_bits, xp)
    rem = rem.astype(xp.uint32)
    v_primary = ((rem << 2) | xp.uint32(1)).astype(table.dtype)
    v_alt = ((rem << 2) | xp.uint32(3)).astype(table.dtype)
    alt = _alt_bucket(bucket, rem, bucket_bits, xp)
    # two independent 4-slot row gathers
    rows_p = table[bucket.astype(xp.int32)]
    rows_a = table[alt.astype(xp.int32)]
    hit_p = (rows_p == v_primary[..., None]).any(axis=-1)
    hit_a = (rows_a == v_alt[..., None]).any(axis=-1)
    return hit_p | hit_a


def _id_bits(n):
    return max(1, int(np.ceil(np.log2(max(int(n), 2)))))


def build_pair_table(user_items, max_load=0.85, row_ids=None):
    """Builds a PairTable for a CSR matrix, or None if the shape won't fit.

    Sizing: pow2 bucket count targeting ``max_load`` occupancy of the
    4-slot buckets; 16-bit slots when remainder+flags fit (halves the
    table, keeping last.fm-scale tables below the TPU gather cliff).
    ``row_ids`` optionally supplies the per-entry row-id expansion of the
    CSR (callers that already built it skip a second O(nnz) pass).
    """
    users, items = user_items.shape
    nnz = user_items.nnz
    if nnz == 0:
        return None
    a_bits, b_bits = _id_bits(users), _id_bits(items)
    if b_bits >= 32 or a_bits >= 32:
        return None
    # float division: int(_SLOTS * max_load) would truncate the target load
    # (and divide by zero for max_load < 1/_SLOTS)
    bucket_bits = max(3, _id_bits(int(np.ceil(nnz / (_SLOTS * max_load)))))
    rem_bits = a_bits + b_bits - bucket_bits
    if rem_bits > _MAX_REM_BITS:
        return None  # id space too large for 32-bit slots; caller falls back
    dtype = np.uint16 if rem_bits + 2 <= 16 else np.uint32
    nbuckets = 1 << bucket_bits

    if row_ids is not None:
        u = np.asarray(row_ids).astype(np.uint32, copy=False)
    else:
        u = np.repeat(
            np.arange(users, dtype=np.uint32), np.ediff1d(user_items.indptr)
        )
    i = user_items.indices.astype(np.uint32)

    # native placement when the C++ runtime is available (the vectorized
    # numpy build below is the fallback; its straggler eviction walk is a
    # Python loop and dominates at tens of millions of keys)
    from .. import native

    nat = native.cuckoo_build(u, i, a_bits, b_bits, bucket_bits)
    if nat is not None:
        return PairTable(nat.astype(dtype) if dtype != np.uint32 else nat,
                         a_bits, b_bits, bucket_bits)

    bucket, rem = _bucket_rem(u, i, a_bits, b_bits, bucket_bits, np)
    v1 = ((rem.astype(np.uint32) << 2) | 1).astype(dtype)
    v2 = ((rem.astype(np.uint32) << 2) | 3).astype(dtype)
    alt = _alt_bucket(bucket, rem, bucket_bits, np)

    table = np.zeros((nbuckets, _SLOTS), dtype=dtype)
    used = np.zeros(nbuckets, dtype=np.int32)

    pending = np.arange(nnz)
    choice = np.zeros(nnz, dtype=bool)  # False: primary bucket, True: alt
    # vectorized rounds: sort pending by target bucket, place as many per
    # bucket as fit, flip the rest to their other bucket and repeat
    for _ in range(24):
        if not len(pending):
            break
        b = np.where(choice[pending], alt[pending], bucket[pending]).astype(np.int64)
        order = np.argsort(b, kind="stable")
        pending = pending[order]
        b = b[order]
        first = np.searchsorted(b, b, side="left")
        rank = np.arange(len(b)) - first  # rank within its bucket this round
        slot = used[b] + rank
        place = slot < _SLOTS
        pb = b[place]
        ps = slot[place]
        pk = pending[place]
        table[pb, ps] = np.where(choice[pk], v2[pk], v1[pk])
        used_add = np.bincount(pb, minlength=nbuckets)
        used += used_add.astype(np.int32)
        pending = pending[~place]
        choice[pending] = ~choice[pending]

    # stragglers: bounded per-key cuckoo eviction walk (rare at this load)
    for k in pending:
        cur_v, cur_b = v1[k], int(bucket[k])
        placed = False
        for _ in range(512):
            row = table[cur_b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                table[cur_b, empty[0]] = cur_v
                placed = True
                break
            # evict a pseudo-random victim and move it to its other bucket
            # (1-element arrays: numpy warns on scalar uint wraparound)
            s = int(_mix32(np.array([cur_v], np.uint32), np.uint32(0x61C88647))[0]) % _SLOTS
            victim = int(row[s])
            table[cur_b, s] = cur_v
            vrem = np.array([victim >> 2], np.uint32)
            vb_other = int(_alt_bucket(np.array([cur_b], np.uint32), vrem, bucket_bits, np)[0])
            cur_v = (victim ^ 2)  # flip primary/alternate flag
            cur_v = np.asarray(cur_v, dtype=dtype)
            cur_b = vb_other
        if not placed:
            return None  # pathological; caller falls back to bisection

    return PairTable(table, a_bits, b_bits, bucket_bits)
