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

import numpy as _np

def _iz(*vals):
    """Index-map helper: under jax x64 a literal 0 in an index_map traces
    as int64 and Mosaic refuses the mixed (i32, i64, ...) return
    ('failed to legalize func.return') — pin constants to int32."""
    return tuple(v if not isinstance(v, int) else _np.int32(v)
                 for v in vals)


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["partition_histogram", "tile_compact_local",
           "dense_group_reduce", "filter_compact_chunks"]

_LANES = 128
_SUBLANES = 8
_TILE = _LANES * _SUBLANES  # rows per grid step


def _interpret() -> bool:
    # ARROW_TPU_PALLAS_INTERPRET=1 forces interpreter mode for the mixed
    # case where the default backend is the (axon) TPU but the computation
    # is placed on a CPU mesh (e.g. dryrun_multichip with a live tunnel).
    import os
    if os.environ.get("ARROW_TPU_PALLAS_INTERPRET"):
        return True
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
                               lambda i: _iz(i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _LANES), lambda i: _iz(0, 0),
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
    # row-offsets (tri-matmuls; Mosaic has no cumsum primitive)
    lane_cum = _tri_cumsum(sel)
    row_tot = lane_cum[:, -1:]
    row_off = _tri_cumsum(row_tot.reshape((1, _SUBLANES)),
                          exclusive=True).reshape((_SUBLANES, 1))
    ps = (lane_cum - sel) + row_off                   # (8,128) exclusive
    flat_ps = ps.reshape((1, _TILE))
    flat_sel = sel.reshape((1, _TILE))
    slots = jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 1
                                     ).astype(jnp.float32)
    onehot = ((flat_ps.reshape((_TILE, 1)) == slots) *
              flat_sel.reshape((_TILE, 1)))
    local_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _TILE), 1
                                          ).astype(jnp.float32)
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


_DG_LANES = 128      # one dense-slot block = 128 lanes
_DG_CHUNK = 1024     # rows streamed per grid step

_DG_IDENT = {
    "sum": 0.0,
    "min": float("inf"),     # true identity: min({+inf}) must stay +inf
    "max": float("-inf"),
    "imin": (1 << 31) - 1,
    "imax": -(1 << 31),
    "count": 0,
    "sumc": 0,               # 16-bit limb sum w/ u32-wrap + carry
}

# kind -> (#inputs, #outputs). Multi-slot kinds:
#   sumc   : 1 in (i32 limb values 0..65535, premasked) ->
#            (wrap-accumulator i32 [u32 bits], carry-count i32)
#   imin64 : 2 in (hi i32 = v>>32, lo i32 = biased low word) ->
#            lexicographic pair minimum (hi, lo) per slot
_DG_ARITY = {
    "sum": (1, 1), "min": (1, 1), "max": (1, 1), "imin": (1, 1),
    "imax": (1, 1), "count": (1, 1), "sumc": (1, 2),
    "imin64": (2, 2), "imax64": (2, 2),
}

_I32MIN = -(1 << 31)
_I32MAX = (1 << 31) - 1


def _dense_group_kernel(gid_ref, *refs, kinds, G):
    """One streaming pass computing per-dense-slot reductions.

    Sequential grid over 1024-row chunks; accumulators are (1, G) output
    blocks pinned to position 0 (the running-accumulator pattern of
    ``partition_histogram``). Per chunk and per 128-slot block, the slot
    match mask ``eq`` (128, C) is built once and every reduction reuses
    it — the whole kernel is VPU compare/select/reduce work with zero
    scatters; HBM traffic is the streaming read of gid + value columns.

    int64 aggregates run WITHOUT 64-bit arithmetic (Mosaic/v5e has
    none): sums split into 16-bit limbs accumulated as u32-wrap + carry
    counts ("sumc", exact mod 2^64 after host-side recombination), and
    min/max reduce (hi, lo) int32 pairs lexicographically ("imin64").
    """
    n_in = sum(_DG_ARITY[k][0] for k in kinds)
    in_refs = refs[:n_in]
    rows_ref = refs[n_in]
    out_refs = refs[n_in + 1:]
    step = pl.program_id(0)
    S = _DG_CHUNK // _DG_LANES                            # sublane columns

    @pl.when(step == 0)
    def _init():
        rows_ref[:] = jnp.zeros_like(rows_ref)
        oj = 0
        for kind in kinds:
            if kind == "sumc":
                out_refs[oj][:] = jnp.zeros_like(out_refs[oj])
                out_refs[oj + 1][:] = jnp.zeros_like(out_refs[oj + 1])
            elif kind in ("imin64", "imax64"):
                hi_id = _I32MAX if kind == "imin64" else _I32MIN
                out_refs[oj][:] = jnp.full_like(out_refs[oj], hi_id)
                out_refs[oj + 1][:] = jnp.full_like(out_refs[oj + 1],
                                                    hi_id)
            else:
                out_refs[oj][:] = jnp.full_like(out_refs[oj],
                                                _DG_IDENT[kind])
            oj += _DG_ARITY[kind][1]

    # blocks arrive TRANSPOSED (128 elements x S columns) so an element
    # column is a (128, 1) slice — every op below is strictly 2D with
    # (sublane, lane) tiling, which is what Mosaic lowers well; the
    # (elements x slots) mask has elements on sublanes, slots on lanes,
    # so per-slot reductions are lane-preserving axis-0 sums.
    gid = gid_ref[0]                                      # (128, S) int32
    xs = [r[0] for r in in_refs]      # load each block ONCE (hoisting
    #                                   this out of the per-block loops
    #                                   is worth ~2x — round-4 regression)
    slot_row = jax.lax.broadcasted_iota(jnp.int32, (1, _DG_LANES), 1)
    for gb in range(G // _DG_LANES):
        slots = slot_row + gb * _DG_LANES
        blk = slice(gb * _DG_LANES, (gb + 1) * _DG_LANES)
        rows_acc = jnp.zeros((1, _DG_LANES), jnp.int32)
        # chunk-local partials per kind
        parts = []
        ij = 0
        for kind in kinds:
            ni = _DG_ARITY[kind][0]
            if kind in ("imin64", "imax64"):
                hi_id = _I32MAX if kind == "imin64" else _I32MIN
                parts.append([jnp.full((1, _DG_LANES), hi_id, jnp.int32),
                              jnp.full((1, _DG_LANES), hi_id, jnp.int32)])
            elif kind in ("count", "sumc"):
                parts.append([jnp.zeros((1, _DG_LANES), jnp.int32)])
            else:       # sum/min/max/imin/imax: the op identity
                x = xs[ij]
                parts.append([jnp.full((1, _DG_LANES), _DG_IDENT[kind],
                                       dtype=x.dtype)])
            ij += ni
        for s in range(S):
            eq = gid[:, s:s + 1] == slots                 # (128, 128)
            rows_acc += jnp.sum(eq, axis=0, keepdims=True,
                                dtype=jnp.int32)
            ij = 0
            for i, kind in enumerate(kinds):
                ni = _DG_ARITY[kind][0]
                if kind in ("imin64", "imax64"):
                    is_min = kind == "imin64"
                    hi = xs[ij][:, s:s + 1]
                    lo = xs[ij + 1][:, s:s + 1]
                    hi_id = _I32MAX if is_min else _I32MIN
                    hi_m = jnp.where(eq, hi, hi_id)
                    if is_min:
                        m_hi = jnp.min(hi_m, axis=0, keepdims=True)
                    else:
                        m_hi = jnp.max(hi_m, axis=0, keepdims=True)
                    lo_sel = jnp.where((hi_m == m_hi) & eq, lo, hi_id)
                    if is_min:
                        m_lo = jnp.min(lo_sel, axis=0, keepdims=True)
                    else:
                        m_lo = jnp.max(lo_sel, axis=0, keepdims=True)
                    # combine with chunk partial (same lex order)
                    p_hi, p_lo = parts[i]
                    if is_min:
                        take = (m_hi < p_hi) | ((m_hi == p_hi) &
                                                (m_lo < p_lo))
                    else:
                        take = (m_hi > p_hi) | ((m_hi == p_hi) &
                                                (m_lo > p_lo))
                    parts[i][0] = jnp.where(take, m_hi, p_hi)
                    parts[i][1] = jnp.where(take, m_lo, p_lo)
                elif kind == "sumc":
                    xb = jnp.where(eq, xs[ij][:, s:s + 1], 0)
                    parts[i][0] = parts[i][0] + jnp.sum(
                        xb, axis=0, keepdims=True, dtype=jnp.int32)
                else:
                    x = xs[ij]
                    ident = jnp.asarray(_DG_IDENT[kind], dtype=x.dtype)
                    xb = jnp.where(eq, x[:, s:s + 1], ident)
                    if kind == "sum":
                        parts[i][0] = parts[i][0] + jnp.sum(
                            xb, axis=0, keepdims=True, dtype=x.dtype)
                    elif kind == "count":
                        parts[i][0] = parts[i][0] + jnp.sum(
                            xb, axis=0, keepdims=True, dtype=jnp.int32)
                    elif kind in ("min", "imin"):
                        parts[i][0] = jnp.minimum(
                            parts[i][0],
                            jnp.min(xb, axis=0, keepdims=True))
                    else:                                  # max / imax
                        parts[i][0] = jnp.maximum(
                            parts[i][0],
                            jnp.max(xb, axis=0, keepdims=True))
                ij += ni
        rows_ref[:, blk] += rows_acc
        oj = 0
        for i, kind in enumerate(kinds):
            if kind == "sumc":
                # u32-wrap add with carry detection (signed-bias trick:
                # unsigned overflow <=> (new ^ MIN) < (old ^ MIN))
                lo_old = out_refs[oj][:, blk]
                lo_new = lo_old + parts[i][0]   # i32 wraps = u32 wrap
                carry = ((lo_new ^ _I32MIN) <
                         (lo_old ^ _I32MIN)).astype(jnp.int32)
                out_refs[oj][:, blk] = lo_new
                out_refs[oj + 1][:, blk] = out_refs[oj + 1][:, blk] + carry
            elif kind in ("imin64", "imax64"):
                a_hi = out_refs[oj][:, blk]
                a_lo = out_refs[oj + 1][:, blk]
                m_hi, m_lo = parts[i]
                if kind == "imin64":
                    take = (m_hi < a_hi) | ((m_hi == a_hi) &
                                            (m_lo < a_lo))
                else:
                    take = (m_hi > a_hi) | ((m_hi == a_hi) &
                                            (m_lo > a_lo))
                out_refs[oj][:, blk] = jnp.where(take, m_hi, a_hi)
                out_refs[oj + 1][:, blk] = jnp.where(take, m_lo, a_lo)
            elif kind in ("sum", "count"):
                out_refs[oj][:, blk] += parts[i][0]
            elif kind in ("min", "imin"):
                out_refs[oj][:, blk] = jnp.minimum(out_refs[oj][:, blk],
                                                   parts[i][0])
            else:
                out_refs[oj][:, blk] = jnp.maximum(out_refs[oj][:, blk],
                                                   parts[i][0])
            oj += _DG_ARITY[kind][1]


@functools.partial(jax.jit, static_argnames=("kinds", "G"))
def dense_group_reduce(gid: jax.Array, inputs, kinds: tuple, G: int):
    """Dense-domain grouped reduction (the GrouperFastImpl fast path's
    TPU answer for small integer key domains — ``grouper.cc:548`` is the
    analog; here there is NO grouping sort at all).

    gid: (n,) int32 dense slot per row in [0, G); negative = inactive.
    inputs: tuple of (n,) arrays, pre-masked by the caller (inactive rows
      already hold the op identity). float32 for sum/min/max, int32 for
      count/imin/imax.
    kinds: per-input reduction ("sum"|"min"|"max"|"count"|"imin"|"imax").
    G: static dense capacity, multiple of 128 (cap ~4096: VPU work is
      O(n*G), the crossover vs the sort-grouper measured on v5e).

    Returns (rows (G,) int32 active-row count per slot, [per-input (G,)]).
    """
    n = gid.shape[0]
    C = _DG_CHUNK
    assert G % _DG_LANES == 0, G
    assert len(inputs) == sum(_DG_ARITY[k][0] for k in kinds), \
        (len(inputs), kinds)
    pad = (-n) % C
    if pad:
        gid = jnp.concatenate([gid, jnp.full((pad,), -1, jnp.int32)])
        # pad values are never read (gid -1 fails every slot match)
        inputs = tuple(
            jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
            for x in inputs)
    T = (n + pad) // C
    S = C // _DG_LANES

    def to_blocks(x):
        # (T, 128 elements, S columns): element j of chunk t sits at
        # [t, j % 128, j // 128] — the XLA-side transpose runs at HBM
        # bandwidth and buys strictly-2D kernel ops
        return x.reshape((T, S, _DG_LANES)).transpose((0, 2, 1))

    out_shapes = [jax.ShapeDtypeStruct((1, G), jnp.int32)]
    out_specs = [pl.BlockSpec((1, G), lambda i: _iz(0, 0),
                              memory_space=pltpu.VMEM)]
    ij = 0
    for k in kinds:
        ni, no = _DG_ARITY[k]
        if k in ("sumc", "imin64", "imax64"):
            dts = [jnp.int32] * no
        else:
            dts = [inputs[ij].dtype]
        for dt_ in dts:
            out_shapes.append(jax.ShapeDtypeStruct((1, G), dt_))
            out_specs.append(pl.BlockSpec((1, G), lambda i: _iz(0, 0),
                                          memory_space=pltpu.VMEM))
        ij += ni
    in_specs = [pl.BlockSpec((1, _DG_LANES, S), lambda i: _iz(i, 0, 0),
                             memory_space=pltpu.VMEM)] * (1 + len(inputs))
    outs = pl.pallas_call(
        functools.partial(_dense_group_kernel, kinds=kinds, G=G),
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
    )(to_blocks(gid), *[to_blocks(x) for x in inputs])
    return outs[0].reshape((G,)), [o.reshape((G,)) for o in outs[1:]]


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
                               lambda i: _iz(i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, _SUBLANES, _LANES),
                                lambda i: _iz(i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1), lambda i: _iz(i, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((nsteps, _SUBLANES, _LANES),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((nsteps, 1), jnp.int32)],
        interpret=_interpret(),
    )(blocks)
    return loc.reshape((n,)), cnt.reshape((nsteps,))


# ---- single-pass filter compaction ------------------------------------------

_FC_ROWS = 256       # rows per filter-compaction tile


def _tri_cumsum(x, exclusive: bool = False):
    """Inclusive (or exclusive) prefix sum along the LAST axis via a
    triangular-ones matmul — Mosaic has no cumsum lowering, but a
    (w, w) f32 triangular dot is a handful of MXU cycles and exact for
    the small counts involved (<= tile rows < 2^24)."""
    w = x.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    tri = (rows < cols if exclusive else rows <= cols).astype(jnp.float32)
    return jax.lax.dot_general(
        x.astype(jnp.float32), tri, (((x.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _filter_dma_kernel(starts_ref, sel_ref, chunks_ref, out_ref,
                       scratch, sem):
    """Single-pass filter compaction: local one-hot-MXU compact + one
    dynamic-offset DMA per tile.

    The round-2 lesson (ops/selection.py `_compaction_impl`): index-based
    two-level designs lose because the stitch is XLA 1D gathers
    (near-serial on TPU), and the winning global 1-bit sort still moves
    every payload through O(log^2 n) comparator passes. This kernel does
    the whole job in ONE streaming pass: each R-row tile compacts its
    selected rows in VMEM (one-hot matmul — exact in bf16 for u8 chunk
    planes) and DMAs the R-row block to the tile's global start offset
    (scalar-prefetched exclusive counts). TPU grid steps run in order on
    the single v5e core, so the next tile's write lands exactly after
    this tile's `count` kept rows, overwriting the R-count garbage rows —
    the classic count→scan→place compaction with the 'place' done by the
    DMA engine instead of gathers.
    """
    t = pl.program_id(0)
    R = _FC_ROWS
    S = R // _LANES
    sel = sel_ref[0].astype(jnp.float32)               # (S, 128)
    # exclusive prefix count in row-major order (tri-matmul cumsums:
    # Mosaic has no cumsum primitive)
    lane_cum = _tri_cumsum(sel)
    row_tot = lane_cum[:, -1:]
    row_off = _tri_cumsum(row_tot.reshape((1, S)),
                          exclusive=True).reshape((S, 1))
    ps = (lane_cum - sel) + row_off                    # (S, 128) exclusive
    ps_flat = ps.reshape((1, R))
    sel_flat = sel.reshape((1, R))
    # oh[p, i] = selected row i lands in output slot p
    slot = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0).astype(
        jnp.float32)
    oh = ((ps_flat == slot) * sel_flat).astype(jnp.bfloat16)   # (R, R)
    # u8 -> i32 -> bf16: Mosaic has no direct u8->bf16 cast
    chunks = chunks_ref[0].astype(jnp.int32).astype(
        jnp.bfloat16)                                  # (R, C) u8 planes
    compacted = jax.lax.dot_general(
        oh, chunks, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # exact: <=1 term
    # f32 -> i32 -> u8 (no direct f32->u8 cast in Mosaic)
    scratch[:] = compacted.astype(jnp.int32).astype(jnp.uint8)
    start = starts_ref[t]
    copy = pltpu.make_async_copy(
        scratch, out_ref.at[pl.ds(start, R)], sem)
    copy.start()
    copy.wait()


@jax.jit
def filter_compact_chunks(sel: jax.Array, chunks: jax.Array) -> jax.Array:
    """(cap,) bool selection + (cap, C) u8 chunk planes -> (cap, C) u8
    with the selected rows left-packed in order (rows past the selected
    count are zero/garbage padding; callers track out_len separately).

    C is the total byte width of all fixed-width columns side by side
    (bitcast per column, concatenated) — one kernel pass compacts every
    column at once.
    """
    cap, C = chunks.shape
    R = _FC_ROWS
    assert cap % R == 0, cap
    T = cap // R
    counts = jnp.sum(sel.reshape((T, R)), axis=1, dtype=jnp.int32)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(counts, dtype=jnp.int32)[:-1]])
    sel_blocks = sel.reshape((T, R // _LANES, _LANES)).astype(jnp.int32)
    chunk_blocks = chunks.reshape((T, R, C))
    out = pl.pallas_call(
        _filter_dma_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[pl.BlockSpec((1, R // _LANES, _LANES),
                                   lambda i, *_: _iz(i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, R, C), lambda i, *_: _iz(i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.VMEM((R, C), jnp.uint8),
                            pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((cap + R, C), jnp.uint8),
        interpret=_interpret(),
    )(starts, sel_blocks, chunk_blocks)
    return out[:cap]
