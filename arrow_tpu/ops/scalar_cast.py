"""Cast kernels. Reference: ``scalar_cast_*.cc`` + ``cast.cc``.

Round-1 scope: numeric<->numeric, bool<->numeric, temporal<->int,
dictionary decode. Unchecked semantics (Arrow ``safe=False``): overflow
truncates; checked variants come with the deferred-error mechanism.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import datatype as dt
from ..core.array import Array
from ..compute.registry import Kind, NullHandling, register_function
from ..compute.scalar import Scalar
from .kernel_utils import jnp_dtype, values_of

__all__ = ["CastOptions"]


class CastOptions:
    def __init__(self, target_type: dt.DataType, allow_overflow: bool = True):
        self.target_type = target_type
        self.allow_overflow = allow_overflow


def dictionary_decode(a: Array) -> Array:
    """dictionary<T> -> T by gathering dictionary values at indices."""
    t = a.type
    assert isinstance(t, dt.DictionaryType)
    from .selection import take_array
    idx = Array(dt.int32, a.values.astype(jnp.int32), a.validity,
                length=a.length)
    out = take_array(a.dictionary, idx)
    return out


@register_function("cast", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=CastOptions)
def _cast(args, options):
    (a,) = args
    if options is None:
        raise ValueError("cast requires CastOptions(target_type=...)")
    dst = options.target_type

    if isinstance(a, Scalar):
        raise NotImplementedError("cast of scalars: wrap in array")

    src = a.type
    if src == dst:
        return a

    if isinstance(src, dt.DictionaryType):
        decoded = dictionary_decode(a)
        if decoded.type == dst:
            return decoded
        return _cast([decoded], options)

    if isinstance(dst, dt.DictionaryType):
        from .vector_hash import dictionary_encode_array
        enc = a if src == dst.value_type else _cast(
            [a], CastOptions(dst.value_type))
        return dictionary_encode_array(enc, index_type=dst.index_type)

    v = a.values
    if (src.is_numeric or isinstance(src, dt.BoolType) or src.is_temporal) \
            and (dst.is_numeric or isinstance(dst, dt.BoolType)
                 or dst.is_temporal):
        if isinstance(dst, dt.BoolType):
            out = v != 0
        else:
            out = v.astype(jnp_dtype(dst))
        return Array(dst, out, a.validity, length=a.length)

    raise NotImplementedError(f"cast {src} -> {dst}")
