"""Per-file bloom-filter data skipping for snaplog tables.

Min/max footer stats prune range predicates well on clustered data, but
an equality probe on a HIGH-CARDINALITY key (``WHERE o_orderkey = 42``
against a table appended in arrival order) survives stats pruning in
every file whose [min, max] envelope happens to straddle the value —
on an unclustered 100k-file table that is every file. A per-file bloom
filter answers "is this key definitely absent from this file?" in O(k)
bit probes, cutting the scan to the one or two files that actually
hold the key (plus an ``fpp`` fraction of false positives, which the
re-applied Spark filter makes row-exact).

This mirrors Delta Lake's bloom filter index option and parquet's
column-level bloom filters (both public formats); the reference
dc43 has no analogue — its locators prune at dataset-version
granularity only (reference: dc43 integrations spark locators).

Design for 100 TB:

- **Build is JVM-vectorized.** Hashes are computed by Spark's built-in
  ``xxhash64`` (whole-stage codegen over the commit's new files only);
  Python touches nothing but the final int64 hash columns, which an
  Arrow-batched ``applyInPandas`` folds into bloom bit arrays with
  numpy. Cost is O(rows added per commit), never O(table).
- **Probe is driver-only, zero Spark jobs.** A pure-Python XXH64
  (public algorithm — Yann Collet's xxHash, BSD; independently
  implemented here from the published spec) reproduces Spark's
  ``xxhash64`` bit-for-bit, so point-lookup planning never launches a
  job to hash the probe value. Parity is pinned by test against
  ``F.xxhash64`` on longs and strings.
- **Storage is sidecar parquet, loaded selectively.** One sidecar per
  commit under ``_index/bloom/`` with small row groups; a probe reads
  the (path, col, m, k) index columns once per sidecar, then decodes
  ONLY the row group holding the surviving file's bits. Checkpoints
  consolidate live blooms into one sidecar so the sidecar count is
  bounded by the checkpoint interval, and ``vacuum`` sweeps the rest.
- **Probing runs after min/max pruning**, so its cost is O(files that
  survived stats), not O(table) — blooms kill the stragglers stats
  cannot, they do not replace stats.
"""

from __future__ import annotations

import bisect
import os
import struct
from typing import Optional, Sequence

MASK64 = (1 << 64) - 1

# xxHash64 primes (public constants from the xxHash specification)
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

#: Spark's XxHash64 expression seed (fixed, not user-settable).
SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & MASK64
    h ^= h >> 29
    h = (h * _P3) & MASK64
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & MASK64
    return (_rotl(acc, 31) * _P1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & MASK64


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of a byte string (public algorithm, implemented from the
    spec). Matches Spark's ``xxhash64`` over a StringType column when
    ``data`` is the UTF-8 encoding of the string."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & MASK64
        v2 = (seed + _P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - _P1) & MASK64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & MASK64
    h = (h + n) & MASK64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & MASK64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & MASK64
        h = (_rotl(h, 23) * _P2 + _P3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & MASK64
        h = (_rotl(h, 11) * _P1) & MASK64
        i += 1
    return _fmix(h)


def xxh64_long(value: int, seed: int = SPARK_SEED) -> int:
    """XXH64 of one 64-bit integer — Spark's ``XXH64.hashLong``, i.e.
    ``xxhash64`` of a LongType column (integral columns are CAST to
    long on the build side so this is the single integer canon)."""
    return xxh64(struct.pack("<q", ((value + (1 << 63)) & MASK64) - (1 << 63)), seed)


def probe_hashes(value) -> Optional[tuple[int, int]]:
    """(h1, h2) for a probe value, mirroring the build-side Spark
    expressions ``xxhash64(cast(col as long))`` / ``xxhash64(col)`` and
    ``xxhash64(<canon col>, cast(1 as long))``. Spark folds multi-arg
    hashes left-to-right (each result seeds the next), so h2 =
    hashLong(1, h1). Returns None for types blooms are not built for
    (the caller then skips the bloom test — conservative)."""
    if isinstance(value, bool) or value is None:
        return None
    if isinstance(value, int):
        if not (-(1 << 63) <= value < (1 << 63)):
            return None
        h1 = xxh64_long(value)
    elif isinstance(value, str):
        h1 = xxh64(value.encode("utf-8"))
    else:
        return None
    h2 = xxh64_long(1, h1) | 1  # |1: never-zero stride for double hashing
    return h1, h2


def bloom_params(n_keys: int, bits_per_key: int) -> tuple[int, int]:
    """(m_bits, k) sized from the (possibly duplicate-counting) key
    count — duplicates only oversize the filter, never break it.
    k = ln(2) * bits_per_key is the standard optimum."""
    m = max(64, n_keys * bits_per_key)
    m = (m + 63) & ~63  # whole 64-bit words
    k = max(1, round(0.6931 * bits_per_key))
    return m, k


def build_bits(h1, h2, m: int, k: int) -> bytes:
    """Fold hash arrays into an m-bit bloom (numpy, vectorized).
    ``h1``/``h2`` are int64 numpy arrays straight from Arrow."""
    import numpy as np

    u1 = h1.astype(np.int64).view(np.uint64)
    u2 = h2.astype(np.int64).view(np.uint64) | np.uint64(1)
    buf = np.zeros(m // 8, dtype=np.uint8)
    for j in range(k):
        pos = (u1 + np.uint64(j) * u2) % np.uint64(m)
        np.bitwise_or.at(
            buf, (pos >> np.uint64(3)).astype(np.int64),
            (np.uint64(1) << (pos & np.uint64(7))).astype(np.uint8),
        )
    return buf.tobytes()


def bits_contain(bits: bytes, m: int, k: int, h1: int, h2: int) -> bool:
    """Membership probe: False = definitely absent."""
    for j in range(k):
        pos = ((h1 + j * h2) & MASK64) % m
        if not (bits[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


def write_sidecar(abs_path: str, rows: Sequence[dict]) -> None:
    """One commit's blooms as a parquet sidecar: columns (path, col, n,
    m, k, bits), sorted by path, SMALL row groups so a probe decodes
    only the group holding its file. ``rows`` is bounded by (files
    changed in the commit) x (bloom columns) — never O(table)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = sorted(rows, key=lambda r: (r["path"], r["col"]))
    tbl = pa.table(
        {
            "path": [r["path"] for r in rows],
            "col": [r["col"] for r in rows],
            "n": pa.array([r["n"] for r in rows], pa.int64()),
            "m": pa.array([r["m"] for r in rows], pa.int64()),
            "k": pa.array([r["k"] for r in rows], pa.int32()),
            "bits": pa.array([r["bits"] for r in rows], pa.binary()),
        }
    )
    os.makedirs(os.path.dirname(abs_path), exist_ok=True)
    tmp = abs_path + ".tmp"
    pq.write_table(tbl, tmp, compression="zstd", row_group_size=512)
    os.replace(tmp, abs_path)


class BloomSidecar:
    """Lazy reader over one sidecar: the (path, col, m, k) index loads
    once (bits column untouched); a hit decodes just the 512-row row
    group containing its bits."""

    def __init__(self, abs_path: str):
        self.abs_path = abs_path
        self._index: Optional[dict] = None
        self._rg_starts: list[int] = []
        self._rg_cache: dict[int, list] = {}

    def _load_index(self) -> dict:
        if self._index is None:
            import pyarrow.parquet as pq

            pf = pq.ParquetFile(self.abs_path)
            starts, total = [], 0
            for g in range(pf.metadata.num_row_groups):
                starts.append(total)
                total += pf.metadata.row_group(g).num_rows
            self._rg_starts = starts
            t = pf.read(columns=["path", "col", "m", "k"])
            self._index = {
                (p, c): (i, m, k)
                for i, (p, c, m, k) in enumerate(
                    zip(
                        t.column("path").to_pylist(),
                        t.column("col").to_pylist(),
                        t.column("m").to_pylist(),
                        t.column("k").to_pylist(),
                    )
                )
            }
        return self._index

    def get(self, path: str, col: str) -> Optional[tuple[int, int, bytes]]:
        """(m, k, bits) for one file's bloom on one column, or None."""
        hit = self._load_index().get((path, col))
        if hit is None:
            return None
        i, m, k = hit
        g = bisect.bisect_right(self._rg_starts, i) - 1
        bits = self._rg_cache.get(g)
        if bits is None:
            import pyarrow.parquet as pq

            pf = pq.ParquetFile(self.abs_path)
            bits = pf.read_row_group(g, columns=["bits"]).column("bits").to_pylist()
            self._rg_cache[g] = bits
        return m, k, bits[i - self._rg_starts[g]]

    def read_all(self):
        """Full sidecar rows (checkpoint consolidation path)."""
        import pyarrow.parquet as pq

        t = pq.read_table(self.abs_path)
        return [
            {
                "path": t.column("path")[i].as_py(),
                "col": t.column("col")[i].as_py(),
                "n": t.column("n")[i].as_py(),
                "m": t.column("m")[i].as_py(),
                "k": t.column("k")[i].as_py(),
                "bits": t.column("bits")[i].as_py(),
            }
            for i in range(t.num_rows)
        ]


#: Spark integral types a bloom column may have (cast to long on build).
INTEGRAL_TYPES = ("byte", "short", "integer", "long")


def bloomable_conditions(groups: list) -> bool:
    """Does the DNF contain at least one condition a bloom can test?"""
    return any(
        op in ("=", "==", "in") for g in groups for _c, op, _v in g
    )


def group_may_match(
    lookup, groups: list, path: str
) -> bool:
    """DNF test for one file: True unless EVERY OR-group contains a
    condition whose bloom proves absence. ``lookup(path, col)`` returns
    (m, k, bits) or None (no bloom -> condition passes)."""
    for g in groups:
        g_ok = True
        for col, op, val in g:
            if op in ("=", "=="):
                vals = [val]
            elif op == "in":
                vals = list(val)
            else:
                continue
            blo = lookup(path, col)
            if blo is None:
                continue
            m, k, bits = blo
            present = False
            for v in vals:
                hs = probe_hashes(v)
                if hs is None or bits_contain(bits, m, k, hs[0], hs[1]):
                    present = True
                    break
            if not present:
                g_ok = False
                break
        if g_ok:
            return True
    return False
