"""Partitioned cuckoo filter: the deletable alternative to the Bloom
prefilter for the URL-seen set.

The north rule calls for a "partitioned Bloom/cuckoo URL-seen set";
seen.DenseBloom is the Bloom half, this is the cuckoo half. Design follows
Fan, Andersen, Kaminsky & Mitzenmacher, "Cuckoo Filter: Practically Better
Than Bloom" (CoNEXT 2014): 4-slot rows, 16-bit fingerprints, partial-key
cuckoo hashing with the involutory alternate index ``alt(i, f) = i XOR
H(f)``. Properties vs the Bloom backend:

- **deletable**: a fingerprint can be removed in O(1), so the filter can
  track package deletions (periodic J9 reconciliation) without a rebuild —
  a Bloom can only go stale-conservative.
- lookups touch exactly 2 rows (2 cache lines) instead of k scattered bit
  probes; at ≤0.84 load the false-positive rate is ≈ 2·4/2^16 ≈ 0.012 %.
- ~19 bits/key at 0.84 load vs ~9.6 bits/key for a 1 % Bloom — the cost
  of deletability.

Sharding mirrors seen.DenseBloom: one subtable per URL bucket
(``pmod(xxhash64(url), 256)``), all shards in a single contiguous numpy
buffer so a Spark broadcast pickles one zero-copy block. Executor-side
partial builds (CuckooShards) allocate per-bucket subtables lazily and are
driver-merged by fingerprint re-insertion (the alternate-index involution
makes a shard mergeable without the original keys).

All hot paths are numpy-vectorized: batch insert places items with a
sort + within-row ranking scatter (two passes, one per candidate row);
only the residue that finds both rows full — rare below 0.84 load — walks
the classic per-item eviction loop. Membership is one fancy-indexed
gather over the whole Arrow batch.
"""

from __future__ import annotations

import numpy as np

SLOTS = 4
KICK_LIMIT = 500
TARGET_LOAD = 0.84  # max load factor with 4-slot rows (CoNEXT'14 §5.1)

_U64 = np.uint64


def _fingerprints(keys: np.ndarray) -> np.ndarray:
    """Top 16 bits of the 64-bit xxhash key; 0 is reserved for empty slots.

    The seen set derives bucket from the key's low bits and the row index
    from bits 8..; the fingerprint must come from disjoint bits or every
    key in a row would share it."""
    f = (keys.astype(_U64) >> _U64(48)).astype(np.uint16)
    return np.where(f == 0, np.uint16(1), f)


def _fp_hash(f: np.ndarray) -> np.ndarray:
    """Mix the 16-bit fingerprint to full width (murmur3 finalizer step)."""
    h = f.astype(_U64) * _U64(0xFF51AFD7ED558CCD)
    return h ^ (h >> _U64(33))


def _row_index(keys: np.ndarray, mask: int) -> np.ndarray:
    """Primary row index from bits 8.. of the key (bits 0..7 are the
    bucket id — using them would leave all but every 256th row empty)."""
    return ((keys.astype(_U64) >> _U64(8)) & _U64(mask)).astype(np.int64)


def _alt_step(f: np.ndarray, mask: int) -> np.ndarray:
    """XOR displacement between a fingerprint's two candidate rows.
    Zero steps are mapped to 1 (a constant per fingerprint, so the
    i2 = i1 ^ step involution is preserved)."""
    step = (_fp_hash(f) & _U64(mask)).astype(np.int64)
    return np.where(step == 0, np.int64(1), step)


def rows_for(expected_keys: int) -> int:
    """Subtable row count: next power of two fitting expected_keys at the
    target load factor."""
    need = max(1, int(np.ceil(expected_keys / (SLOTS * TARGET_LOAD))))
    return 1 << max(2, int(np.ceil(np.log2(need))))


def _contains_sub(rows1: np.ndarray, rows2: np.ndarray, f: np.ndarray) -> np.ndarray:
    """Membership over gathered candidate rows: (N,4) vs (N,) fingerprints."""
    fcol = f[:, None]
    return np.any(rows1 == fcol, axis=1) | np.any(rows2 == fcol, axis=1)


def _place_batch(sub: np.ndarray, f: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Vectorized placement of fingerprints into free slots of ``sub``
    rows ``idx`` (duplicate idx values allowed). Rows are kept
    left-compacted (occupied slots form a prefix), so the j-th item
    targeting a row lands in slot occupancy+j. Returns the placed mask."""
    if len(f) == 0:
        return np.zeros(0, dtype=bool)
    occ = np.count_nonzero(sub[idx], axis=1)
    order = np.argsort(idx, kind="stable")
    sidx = idx[order]
    first = np.zeros(len(sidx), dtype=np.int64)
    if len(sidx) > 1:
        new_grp = np.empty(len(sidx), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = sidx[1:] != sidx[:-1]
        first = np.maximum.accumulate(np.where(new_grp, np.arange(len(sidx)), 0))
    rank = np.arange(len(sidx)) - first
    slot = occ[order] + rank
    ok = slot < SLOTS
    sub[sidx[ok], slot[ok]] = f[order][ok]
    placed = np.empty(len(idx), dtype=bool)
    placed[order] = ok
    return placed


class _Rng:
    """Deterministic LCG for the eviction slot choice — keeps filter state
    replay-identical across runs (Date-free, seed-free)."""

    def __init__(self, state: int = 0x853C49E6748FEA9B):
        self.state = state

    def next_slot(self) -> int:
        self.state = (self.state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return (self.state >> 33) % SLOTS


def _insert_sub(
    sub: np.ndarray, f: np.ndarray, i1: np.ndarray, i2: np.ndarray, rng: _Rng
) -> list[tuple[int, int]]:
    """Insert (fingerprint, candidate rows) into one subtable. Vectorized
    two-pass placement; residue runs the per-item eviction walk. Returns
    the overflow list [(row, fingerprint)] that exceeded KICK_LIMIT
    (empty below the target load factor)."""
    mask = sub.shape[0] - 1
    placed = _place_batch(sub, f, i1)
    rem = ~placed
    if rem.any():
        placed2 = _place_batch(sub, f[rem], i2[rem])
        rem_idx = np.nonzero(rem)[0][~placed2]
    else:
        rem_idx = np.zeros(0, dtype=np.int64)
    overflow: list[tuple[int, int]] = []
    for j in rem_idx:
        cur_f = int(f[j])
        idx = int(i1[j])
        for _ in range(KICK_LIMIT):
            row = sub[idx]
            free = np.nonzero(row == 0)[0]
            if len(free):
                row[free[0]] = cur_f
                break
            s = rng.next_slot()
            victim = int(row[s])
            row[s] = cur_f
            cur_f = victim
            idx ^= int(_alt_step(np.array([victim], dtype=np.uint16), mask)[0])
        else:
            overflow.append((idx, cur_f))
    return overflow


class DenseCuckoo:
    """All bucket shards in one contiguous (n_buckets, n_rows, 4) uint16
    buffer — same zero-copy-broadcast shape as seen.DenseBloom. The tiny
    ``stash`` holds insert overflow (items whose eviction walk exceeded
    KICK_LIMIT); it stays empty below the target load factor and is
    checked on lookup so there are never false negatives."""

    def __init__(self, n_rows: int, n_buckets: int):
        assert n_rows & (n_rows - 1) == 0, "row count must be a power of two"
        self.n = n_rows
        self.mask = n_rows - 1
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, n_rows, SLOTS), dtype=np.uint16)
        self.stash: set[tuple[int, int, int]] = set()  # (bucket, canon_row, fp)
        self._rng = _Rng()

    # -- derivation ---------------------------------------------------------

    def _derive(self, keys: np.ndarray):
        f = _fingerprints(keys)
        i1 = _row_index(keys, self.mask)
        i2 = i1 ^ _alt_step(f, self.mask)
        return f, i1, i2

    def _stash_key(self, bucket: int, row: int, fp: int) -> tuple[int, int, int]:
        alt = row ^ int(_alt_step(np.array([fp], dtype=np.uint16), self.mask)[0])
        return (bucket, min(row, alt), fp)

    # -- mutation ------------------------------------------------------------

    def add(self, buckets: np.ndarray, keys: np.ndarray) -> int:
        """Insert keys. Standard cuckoo-filter multiset semantics: distinct
        keys that alias to the same (fingerprint, row pair) each store
        their own copy, so a later ``delete`` of one never evicts the
        other (delete is only valid for keys actually added — the CoNEXT'14
        contract). The caller is expected to key-dedup batches (SeenSet.add
        does); same-key duplicates inside one batch store extra copies,
        which is safe but wastes slots. Returns the number of items pushed
        to the overflow stash."""
        if len(keys) == 0:
            return 0
        f, i1, i2 = self._derive(keys)
        stashed = 0
        b_arr = buckets.astype(np.int64)
        for b in np.unique(b_arr):
            m = b_arr == b
            fb, ib1, ib2 = f[m], i1[m], i2[m]
            for row, fp in _insert_sub(self.table[b], fb, ib1, ib2, self._rng):
                self.stash.add(self._stash_key(int(b), row, fp))
                stashed += 1
        return stashed

    def delete(self, buckets: np.ndarray, keys: np.ndarray) -> np.ndarray:
        """Remove one matching fingerprint per key; returns the removed
        mask. Rows stay left-compacted (last occupied slot fills the
        hole). Per-item loop — deletions are reconcile-rate, not
        crawl-rate."""
        f, i1, i2 = self._derive(keys)
        removed = np.zeros(len(keys), dtype=bool)
        for j in range(len(keys)):
            b = int(buckets[j])
            hit = False
            for idx in (int(i1[j]), int(i2[j])):
                row = self.table[b, idx]
                at = np.nonzero(row == f[j])[0]
                if len(at):
                    occ = int(np.count_nonzero(row))
                    row[at[0]] = row[occ - 1]
                    row[occ - 1] = 0
                    hit = True
                    break
            if not hit:
                sk = self._stash_key(b, int(i1[j]), int(f[j]))
                if sk in self.stash:
                    self.stash.discard(sk)
                    hit = True
            removed[j] = hit
        return removed

    def merge_shard(self, bucket: int, shard: np.ndarray | bytes) -> None:
        """Fold an executor-built subtable in by re-inserting its occupied
        fingerprints: a stored (row, fp) pair determines the candidate set
        {row, row^H(fp)} regardless of which of the two it sat in."""
        if isinstance(shard, (bytes, bytearray)):
            shard = np.frombuffer(shard, dtype=np.uint16).reshape(self.n, SLOTS)
        rows, slots = np.nonzero(shard)
        if len(rows) == 0:
            return
        f = shard[rows, slots]
        i1 = rows.astype(np.int64)
        i2 = i1 ^ _alt_step(f, self.mask)
        for row, fp in _insert_sub(self.table[bucket], f, i1, i2, self._rng):
            self.stash.add(self._stash_key(bucket, row, fp))

    def reinsert_pair(self, bucket: int, row: int, fp: int) -> None:
        """Insert a single (candidate row, fingerprint) pair — used to fold
        an executor shard's overflow list into the dense filter."""
        f = np.array([fp], dtype=np.uint16)
        i1 = np.array([row], dtype=np.int64)
        i2 = i1 ^ _alt_step(f, self.mask)
        for r, p in _insert_sub(self.table[bucket], f, i1, i2, self._rng):
            self.stash.add(self._stash_key(bucket, r, p))

    # -- lookup ----------------------------------------------------------------

    def might_contain(self, buckets: np.ndarray, keys: np.ndarray) -> np.ndarray:
        f, i1, i2 = self._derive(keys)
        b = buckets.astype(np.int64)
        hit = _contains_sub(self.table[b, i1], self.table[b, i2], f)
        if self.stash:
            for j in np.nonzero(~hit)[0]:
                if self._stash_key(int(b[j]), int(i1[j]), int(f[j])) in self.stash:
                    hit[j] = True
        return hit

    def load_factor(self) -> float:
        return float(np.count_nonzero(self.table)) / self.table.size


class CuckooShards:
    """Executor-side partial builds: bucket -> lazily-allocated subtable
    (a task only pays for the buckets its partition contains — the seen
    table is (bucket, key)-clustered, so usually a handful)."""

    def __init__(self, n_rows: int):
        self.n = n_rows
        self.mask = n_rows - 1
        self.shards: dict[int, np.ndarray] = {}
        self._rng = _Rng()
        self.overflow: list[tuple[int, int, int]] = []  # (bucket, row, fp)

    def add(self, buckets: np.ndarray, keys: np.ndarray) -> None:
        f = _fingerprints(keys)
        i1 = _row_index(keys, self.mask)
        i2 = i1 ^ _alt_step(f, self.mask)
        b_arr = buckets.astype(np.int64)
        for b in np.unique(b_arr):
            m = b_arr == b
            sub = self.shards.setdefault(
                int(b), np.zeros((self.n, SLOTS), dtype=np.uint16)
            )
            for row, fp in _insert_sub(sub, f[m], i1[m], i2[m], self._rng):
                self.overflow.append((int(b), row, fp))
