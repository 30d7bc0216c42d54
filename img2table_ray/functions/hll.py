"""HyperLogLog sketch primitives (Flajolet et al. 2007) — pure numpy.

The mergeable-sketch pattern for distributed distinct counting: each
batch reduces to at most ``m`` (register, rank) partial rows, partials
merge by elementwise register MAX (associative + commutative + idempotent,
so retried/duplicated batches cannot corrupt the estimate), and the
estimator runs on the tiny merged register vector.  Complements the
EXACT count-distinct (`relational.distinct_users_daily`) for the scales
where shipping the distinct keys themselves is the bottleneck: the
shuffle moves O(m x batches) int rows regardless of key cardinality.

Hashing is md5-derived like every other hash in the repo (deterministic
across runs/workers, no seed state).  60 hash bits: P index bits + the
remaining bits feed the rank (leading-zero count), so ranks lie in
[1, 61 - P] — far beyond the register width any real cardinality needs.
"""

from __future__ import annotations

import numpy as np

from img2table_ray.functions.hashing import md5_int60_many

HLL_P = 12           # 2^12 = 4096 registers -> ~1.6% standard error
HLL_M = 1 << HLL_P
_VALUE_BITS = 60 - HLL_P


def batch_registers(keys) -> tuple[np.ndarray, np.ndarray]:
    """Sketch one batch of string keys -> (register index, rank) partials,
    deduplicated to the per-batch register max (<= m rows)."""
    h = md5_int60_many([str(k) for k in keys]).astype(np.uint64)
    reg = (h >> np.uint64(_VALUE_BITS)).astype(np.int64)
    val = h & np.uint64((1 << _VALUE_BITS) - 1)
    # rank = leading zeros within the value bits + 1; val==0 -> max rank
    nbits = np.full(len(val), -1, dtype=np.int64)
    nz = val > 0
    # bit_length via float log2 is unsafe near 2^53; use frexp exponent
    _, exp = np.frexp(val[nz].astype(np.float64))
    # frexp is exact for integers < 2^53 = our 48 value bits
    nbits[nz] = exp
    rank = np.where(nz, _VALUE_BITS - nbits + 1, _VALUE_BITS + 1).astype(
        np.int64)
    # per-batch register max
    order = np.lexsort((-rank, reg))
    reg_s, rank_s = reg[order], rank[order]
    first = np.ones(len(reg_s), dtype=bool)
    first[1:] = reg_s[1:] != reg_s[:-1]
    return reg_s[first], rank_s[first]


def estimate(registers: np.ndarray) -> float:
    """HLL estimate from a dense m-vector of register maxes (0 = empty),
    with the standard small-range (linear counting) correction."""
    m = HLL_M
    assert registers.shape == (m,)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.power(2.0, -registers.astype(np.float64)))
    zeros = int(np.count_nonzero(registers == 0))
    if e <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return float(e)
