"""pivot_wider / hash_pivot_wider: (key, value) pairs -> one struct column
with a field per expected key name.

Reference: ``cpp/src/arrow/compute/kernels/aggregate_pivot.cc`` (scalar
PivotImpl: Consume maps keys through PivotWiderKeyMapper and errors on a
second valid value per key) and ``hash_aggregate_pivot.cc`` (the grouped
variant, one slot per (group, key)). Options:
``api_aggregate.h`` PivotWiderOptions {key_names, unexpected_key_behavior}.

TPU design: key mapping is one vectorized set probe (ops/set_lookup
``_set_probe`` — a sort-distinct over [key_names ++ keys], no hash table),
then a single scatter into a flattened (G*K,) slot grid. Duplicate
detection rides a per-slot counter (count > 1 anywhere == Arrow's
DuplicateValue error), deferred to materialization like the grouper's
overflow flag.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import datatype as dt
from ..core.array import Array
from ..compute.registry import Kind, NullHandling, register_function
from .agg_options import PivotWiderOptions
from .aggregates import GROUPED_AGGREGATORS, GroupedAggregator
from .set_lookup import SetLookupOptions, _set_probe

__all__ = ["GroupedPivotWider", "PivotWiderOptions"]

# error-flag bits (returned by error_flag(state))
ERR_DUPLICATE = 1       # two valid values for one (group, key) slot
ERR_UNEXPECTED_KEY = 2  # key outside key_names with behavior="raise"
ERR_NULL_KEY = 4        # null pivot key (always an error, pivot_internal.cc
#                         NullKeyName)


class GroupedPivotWider(GroupedAggregator):
    """hash_pivot_wider: per group, one struct{key_names...: value_type}."""

    dist_rows = False

    name = "pivot_wider"

    def __init__(self, in_type: Tuple[dt.DataType, dt.DataType], G: int,
                 options: Optional[PivotWiderOptions] = None):
        if options is None or not isinstance(options, PivotWiderOptions):
            raise ValueError("pivot_wider requires PivotWiderOptions")
        super().__init__(in_type, G, options)
        self.key_type, self.value_type = in_type
        if self.value_type.is_varlen:
            raise NotImplementedError(
                "pivot_wider over var-length values: dictionary-encode the "
                "value column first")
        self.K = max(len(options.key_names), 1)
        self.raise_unexpected = \
            options.unexpected_key_behavior == "raise"

    @property
    def out_type(self):
        return dt.struct([(n, self.value_type)
                          for n in self.options.key_names])

    def _value_dtype(self):
        return jnp.dtype(self.value_type.storage_np)

    def init(self):
        GK = self.G * self.K
        return (jnp.zeros((GK,), dtype=self._value_dtype()),   # vals
                jnp.zeros((GK,), dtype=jnp.bool_),             # valid
                jnp.zeros((GK,), dtype=jnp.int32),             # count
                jnp.int32(0))                                  # err

    def _map_keys(self, keys: Array):
        """(kidx int32, matched bool, key_present bool) per row."""
        opts = SetLookupOptions(value_set=list(self.options.key_names))
        kidx, matched, in_valid = _set_probe(keys, opts)
        return kidx, matched, in_valid

    def consume(self, state, values, group_ids):
        vals, valid, cnt, err = state
        keys, v = values
        kidx, matched, key_present = self._map_keys(keys)
        in_group = group_ids >= 0
        if keys.validity is not None:
            null_key = in_group & keys.row_mask() & ~keys.validity
            err = err | jnp.where(null_key.any(), jnp.int32(ERR_NULL_KEY),
                                  jnp.int32(0))
        if self.raise_unexpected:
            unexpected = in_group & key_present & ~matched
            err = err | jnp.where(unexpected.any(),
                                  jnp.int32(ERR_UNEXPECTED_KEY),
                                  jnp.int32(0))
        val_ok = in_group & key_present & matched
        if v.validity is not None:
            val_ok = val_ok & v.validity
        val_ok = val_ok & v.row_mask()
        # dropped rows scatter to G*K — positive OOB (mode="drop" WRAPS
        # negative indices, it only drops past-the-end ones)
        pos = jnp.where(val_ok,
                        group_ids * self.K + jnp.clip(kidx, 0, self.K - 1),
                        self.G * self.K)
        cnt = cnt.at[pos].add(jnp.int32(1), mode="drop")
        vv = v.values.astype(self._value_dtype())
        vals = vals.at[pos].set(vv, mode="drop")
        valid = valid.at[pos].set(True, mode="drop")
        return vals, valid, cnt, err

    def merge(self, state, other, mapping):
        vals, valid, cnt, err = state
        ov, ovalid, ocnt, oerr = other
        G, K = self.G, self.K
        GK = G * K
        gidx = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0).reshape((G,))
        our_g = mapping[jnp.clip(gidx, 0, mapping.shape[0] - 1)]
        # unmapped groups scatter past the end (positive OOB — "drop" wraps
        # negative indices)
        base = jnp.where(our_g >= 0, our_g * K, GK)
        kcol = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
        idx = (base[:, None] + kcol).reshape((GK,))
        cnt = cnt.at[idx].add(ocnt, mode="drop")
        pos = jnp.where(ovalid, idx, GK + K)
        vals = vals.at[pos].set(ov, mode="drop")
        valid = valid.at[pos].set(True, mode="drop")
        return vals, valid, cnt, err | oerr

    def finalize(self, state, num_groups) -> Array:
        vals, valid, cnt, err = state
        G, K = self.G, self.K
        v2 = vals.reshape((G, K))
        ok2 = valid.reshape((G, K))
        store = self._value_dtype()
        children = []
        for k, _name in enumerate(self.options.key_names):
            cv = v2[:, k]
            if store == jnp.bool_:
                cv = cv.astype(jnp.bool_)
            children.append(Array(self.value_type, cv, ok2[:, k],
                                  length=num_groups))
        return Array(self.out_type, jnp.zeros((G,), jnp.uint8), None,
                     length=num_groups, children=children)

    def error_flag(self, state):
        vals, valid, cnt, err = state
        dup = jnp.where((cnt > 1).any(), jnp.int32(ERR_DUPLICATE),
                        jnp.int32(0))
        return err | dup

    @staticmethod
    def error_message(flag: int) -> str:
        msgs = []
        if flag & ERR_DUPLICATE:
            msgs.append("duplicate value for the same pivot key")
        if flag & ERR_UNEXPECTED_KEY:
            msgs.append("unexpected pivot key (behavior='raise')")
        if flag & ERR_NULL_KEY:
            msgs.append("pivot key name cannot be null")
        return "pivot_wider: " + "; ".join(msgs or [f"error {flag}"])


GROUPED_AGGREGATORS["pivot_wider"] = GroupedPivotWider


@register_function("pivot_wider", Kind.SCALAR_AGGREGATE, 2,
                   null_handling=NullHandling.COMPUTED,
                   options_class=PivotWiderOptions)
def _pivot_wider(args, options):
    """Whole-array pivot: the grouped machinery with a single group;
    returns a struct Scalar (reference ``aggregate_pivot.cc`` PivotImpl)."""
    keys, vals = args
    agg = GroupedPivotWider((keys.type, vals.type), 1, options)
    st = agg.consume(agg.init(), (keys, vals),
                     jnp.zeros((keys.capacity,), jnp.int32))
    flag = int(jax.device_get(agg.error_flag(st)))
    if flag:
        raise RuntimeError(agg.error_message(flag))
    out = agg.finalize(st, 1)
    from ..compute.scalar import Scalar
    return Scalar(out.to_pylist()[0], agg.out_type)
