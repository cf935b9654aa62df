"""Pallas TPU kernels for engine hot spots.

Design note (why Pallas is used *selectively* here): this engine's hot
operators are sort/scan/gather-shaped, where XLA's stock lowerings are
already near roofline; the places Pallas earns its keep are patterns XLA
lowers poorly — **scatter-with-colliding-indices** being the canonical
one (XLA serializes it). The partition histogram below replaces the
shuffle's colliding scatter-add with a single sequential-grid pass that
keeps a (1, P) accumulator in VMEM: one HBM read of the destination
vector, zero scatters.

All kernels run in interpreter mode off-TPU so the CPU test mesh
exercises identical code paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["partition_histogram", "tile_compact_local"]

_LANES = 128
_SUBLANES = 8
_TILE = _LANES * _SUBLANES  # rows per grid step


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _hist_kernel(dest_ref, out_ref, *, P: int):
    """Grid steps run sequentially on TPU; the (1, P) output block maps to
    the same position every step, so it acts as a running accumulator."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    block = dest_ref[:]  # (1, SUBLANES, LANES) int32
    # one VPU reduction per partition (P = mesh size, small by design);
    # the accumulator row is lane-padded to 128 for clean VMEM tiling
    counts = out_ref[:]
    updates = []
    for p in range(_LANES):
        if p < P:
            updates.append(jnp.sum((block == p).astype(jnp.int32)))
        else:
            updates.append(jnp.int32(0))
    out_ref[:] = counts + jnp.stack(updates).reshape((1, _LANES))


@functools.partial(jax.jit, static_argnums=(1,))
def partition_histogram(dest: jax.Array, P: int) -> jax.Array:
    """Counts of dest==p for p in [0, P). `dest` is (n,) int32; values
    outside [0, P) are ignored. One HBM pass, no scatters."""
    n = dest.shape[0]
    pad = (-n) % _TILE
    if pad:
        dest = jnp.concatenate([dest, jnp.full((pad,), -1, jnp.int32)])
    blocks = dest.reshape((-1, _SUBLANES, _LANES))
    nsteps = blocks.shape[0]
    out = pl.pallas_call(
        functools.partial(_hist_kernel, P=P),
        grid=(nsteps,),
        in_specs=[pl.BlockSpec((1, _SUBLANES, _LANES),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, _LANES), jnp.int32),
        interpret=_interpret(),
    )(blocks)
    return out.reshape((_LANES,))[:P]


def _compact_kernel(sel_ref, loc_ref, cnt_ref):
    """Per-tile local compaction via a one-hot MXU matmul.

    A tile is (SUBLANES, LANES) = 1024 rows. For each selected row j
    (row-major order) its within-tile output slot is the exclusive
    prefix count ps[j]; the compacted local iota comes from
    ``local_iota @ onehot(ps)`` — dynamic scatter is vector poison on
    TPU, but a (1,1024)x(1024,1024) one-hot matmul is ~64 MXU cycles.
    Slots past the tile's count read 0 (in-range; the stitch gather
    consumes only the first `count` slots of each tile).
    """
    sel = sel_ref[:].reshape((_SUBLANES, _LANES)).astype(jnp.float32)
    # exclusive prefix count in row-major order: lane cumsum + sublane
    # row-offsets
    lane_cum = jnp.cumsum(sel, axis=1)
    row_tot = lane_cum[:, -1:]
    row_off = jnp.cumsum(row_tot, axis=0) - row_tot
    ps = (lane_cum - sel) + row_off                   # (8,128) exclusive
    flat_ps = ps.reshape((1, _TILE))
    flat_sel = sel.reshape((1, _TILE))
    slots = jax.lax.broadcasted_iota(jnp.float32, (_TILE, _TILE), 1)
    onehot = ((flat_ps.reshape((_TILE, 1)) == slots) *
              flat_sel.reshape((_TILE, 1)))
    local_iota = jax.lax.broadcasted_iota(jnp.float32, (1, _TILE), 1)
    # HIGHEST precision: the TPU default truncates f32 dot inputs to
    # bf16, whose 8-bit mantissa cannot represent iotas > 256 exactly —
    # wrong take indices (preferred_element_type only sets the
    # accumulator)
    out = jax.lax.dot_general(
        local_iota, onehot, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)           # (1, TILE)
    loc_ref[:] = out.reshape((1, _SUBLANES, _LANES)).astype(jnp.int32)
    cnt_ref[0, 0] = jnp.sum(sel).astype(jnp.int32)


@jax.jit
def tile_compact_local(sel: jax.Array):
    """(cap,) bool -> ((cap,) int32 tile-local compacted iotas,
    (cap/1024,) int32 per-tile selected counts). Level 1 of the filter
    compaction (``vector_selection_filter_internal.cc:159`` is the
    reference's bit-block walk); level 2 stitches tiles with
    ``rows_of_positions`` + one gather (ops/selection.py)."""
    n = sel.shape[0]
    assert n % _TILE == 0, n
    blocks = sel.reshape((-1, _SUBLANES, _LANES)).astype(jnp.int32)
    nsteps = blocks.shape[0]
    loc, cnt = pl.pallas_call(
        _compact_kernel,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec((1, _SUBLANES, _LANES),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, _SUBLANES, _LANES),
                                lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1), lambda i: (i, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((nsteps, _SUBLANES, _LANES),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((nsteps, 1), jnp.int32)],
        interpret=_interpret(),
    )(blocks)
    return loc.reshape((n,)), cnt.reshape((nsteps,))
