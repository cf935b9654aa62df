"""Bloom-filter pushdown for hash joins.

Reference: ``cpp/src/arrow/acero/bloom_filter.h:42`` (``BlockedBloomFilter``
built from build-side key hashes) + the pushdown machinery in
``hash_join_node.cc:499`` that filters probe-side rows before they reach
the join.

TPU-native redesign: the filter is a flat **byte-mask bitset** (one bool
byte per slot — TPU vector ops have no cheap in-register bit addressing,
and HBM is the constraint that matters, not the 8x byte-vs-bit blowup; at
8 slots/key a 1M-row build side costs 8 MB). ``k`` hash probes derive from
two lane-mixed 32-bit hashes (Kirsch-Mitzenmacher double hashing), so
insert is ``k`` unique-free scatter-ORs and query is ``k`` vector gathers
— no data-dependent control flow, everything jit-fusable.

Unlike the reference — where the Bloom filter prunes rows inside a
dynamically-sized pipeline — a membership mask alone saves nothing under
XLA's static shapes: the probe sort still runs at full capacity. The win
comes from the HOST-side re-bucket between stages (``maybe_compact``):
mask -> prefix compaction -> smaller capacity bucket -> the probe's
O(cap log cap) sort runs at the shrunken bucket. See
``acero/nodes.py`` HashJoinNode for the wiring + adaptive disable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .hashing import _fmix32, _mix32

__all__ = ["bloom_m_log2", "build_bloom", "query_bloom", "BLOOM_K"]

BLOOM_K = 3          # probes/key; at m/n=8: FPR ~ 3.1%
_SLOTS_PER_KEY = 8
_SEED1 = np.uint32(0x9747B28C)
_SEED2 = np.uint32(0x85EBCA6B)


def bloom_m_log2(max_keys: int) -> int:
    """Bitset size (log2 slots) for an expected key count, clamped to
    [2^13, 2^23] (8 KiB..8 MiB of bool bytes)."""
    m = int(max(max_keys, 1)) * _SLOTS_PER_KEY
    return int(min(23, max(13, int(np.ceil(np.log2(m))))))


def _lane_hashes(lanes: jax.Array):
    """(n, L) uint32 key lanes -> two independent 32-bit hashes (n,).

    Uses the same murmur-style mixers as ``hash32`` so equal keys (equal
    lanes, by the grouper's normalization contract) always collide into
    the same slots."""
    n, L = lanes.shape
    h1 = jnp.full((n,), _SEED1, jnp.uint32)
    h2 = jnp.full((n,), _SEED2, jnp.uint32)
    for j in range(L):
        w = lanes[:, j]
        h1 = _mix32(h1, w)
        h2 = _mix32(h2, w ^ np.uint32(0x6B43A9B5))
    return _fmix32(h1 ^ jnp.uint32(L)), _fmix32(h2 ^ jnp.uint32(L))


def build_bloom(lanes: jax.Array, active: jax.Array,
                m_log2: int, k: int = BLOOM_K) -> jax.Array:
    """Insert active rows' keys; returns (2^m_log2,) bool byte-mask."""
    m = 1 << m_log2
    h1, h2 = _lane_hashes(lanes)
    bits = jnp.zeros((m,), jnp.bool_)
    for i in range(k):
        pos = (h1 + jnp.uint32(i) * h2) & jnp.uint32(m - 1)
        pos = jnp.where(active, pos.astype(jnp.int32), m)
        bits = bits.at[pos].max(True, mode="drop")
    return bits


def query_bloom(bits: jax.Array, lanes: jax.Array,
                active: jax.Array, k: int = BLOOM_K) -> jax.Array:
    """True where the key MAY be present (false positives possible, false
    negatives impossible). Inactive rows (null keys / padding) -> False."""
    m = bits.shape[0]
    h1, h2 = _lane_hashes(lanes)
    hit = active
    for i in range(k):
        pos = ((h1 + jnp.uint32(i) * h2) & jnp.uint32(m - 1)).astype(
            jnp.int32)
        hit = hit & bits[pos]
    return hit
