"""Shared helpers for kernel implementations: type promotion, scalar
broadcasting, output construction.

Type promotion matches Arrow's CommonNumeric resolution (verified empirically
against pyarrow 25; reference logic in
``cpp/src/arrow/compute/kernels/codegen_internal.cc`` CommonNumeric):
  * any float present -> widest float among the floats
  * all ints, same signedness -> max width
  * mixed signedness -> signed of width max(signed_w, 2*unsigned_w), cap 64
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core import datatype as dt
from ..core.array import Array
from ..compute.scalar import Scalar

__all__ = [
    "common_numeric_type", "promote_args", "values_of", "output_like",
    "capacity_of", "length_of", "jnp_dtype",
]


def jnp_dtype(t: dt.DataType):
    return jnp.dtype(t.storage_np)


def common_numeric_type(types: Sequence[dt.DataType]) -> dt.DataType:
    floats = [t for t in types if t.is_floating]
    if floats:
        bits = max(t.bits for t in floats)
        return dt.FloatType(bits)
    ints = [t for t in types if t.is_integer]
    if len(ints) != len(types):
        bad = [t for t in types if not t.is_numeric]
        raise TypeError(f"non-numeric types in arithmetic: {bad}")
    signed = [t for t in ints if t.signed]
    unsigned = [t for t in ints if not t.signed]
    if not unsigned:
        return dt.IntegerType(max(t.bits for t in signed), True)
    if not signed:
        return dt.IntegerType(max(t.bits for t in unsigned), False)
    width = max(max(t.bits for t in signed),
                min(64, 2 * max(t.bits for t in unsigned)))
    return dt.IntegerType(min(width, 64), True)


def capacity_of(args: Sequence[Union[Array, Scalar]]) -> int:
    caps = {a.capacity for a in args if isinstance(a, Array)}
    if not caps:
        raise ValueError("at least one Array argument required")
    if len(caps) > 1:
        raise ValueError(f"mismatched array capacities: {caps}")
    return caps.pop()


def length_of(args: Sequence[Union[Array, Scalar]]):
    for a in args:
        if isinstance(a, Array):
            return a.length
    raise ValueError("at least one Array argument required")


def values_of(a: Union[Array, Scalar], out_type: Optional[dt.DataType] = None):
    """Extract the values (array or 0-d), cast to out_type storage if given."""
    if isinstance(a, Array):
        v = a.values
    else:
        v = jnp.asarray(a.storage_value())
    if out_type is not None:
        v = v.astype(jnp_dtype(out_type))
    return v


def promote_args(args: Sequence[Union[Array, Scalar]]
                 ) -> Tuple[List[jax.Array], dt.DataType]:
    """Cast all numeric args to the Arrow common type; return values+type."""
    out_t = common_numeric_type([a.type for a in args])
    return [values_of(a, out_t) for a in args], out_t


def output_like(values: jax.Array, type: dt.DataType,
                args: Sequence[Union[Array, Scalar]],
                validity=None) -> Array:
    """Build an output Array with the shared capacity/length of the args.

    `validity` here is kernel-computed extra validity (COMPUTED kernels);
    INTERSECTION propagation happens centrally in the registry.
    """
    cap = capacity_of(args)
    if values.ndim == 0:
        values = jnp.full((cap,), values)
    return Array(type, values, validity, length=length_of(args))
