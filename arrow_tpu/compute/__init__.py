"""arrow_tpu.compute — the function registry + kernel API surface.

Plays the role of pyarrow.compute: every registered function is callable as
``compute.call_function(name, args)`` and exposed as a module-level helper.

Import-order note: kernel modules live in ``arrow_tpu.ops`` and import the
registry from here; to stay cycle-safe this module only *imports the ops
modules for registration* and resolves their option classes lazily via
``__getattr__``.
"""

from .registry import (  # noqa: F401
    Function, FunctionRegistry, Kind, NullHandling, call_function, registry,
    register_function,
)
from .scalar import Scalar, scalar  # noqa: F401

# Kernel modules register lazily on first registry access (see
# registry.ensure_kernels_loaded) so importing one ops module directly
# never re-enters a partially initialized sibling.
from .registry import ensure_kernels_loaded  # noqa: E402

_LAZY = {
    "SetLookupOptions": "arrow_tpu.ops.set_lookup",
    "ModeOptions": "arrow_tpu.ops.aggregates_order",
    "QuantileOptions": "arrow_tpu.ops.aggregates_order",
    "TDigestOptions": "arrow_tpu.ops.aggregates_order",
    "IndexOptions": "arrow_tpu.ops.aggregates_order",
    "SkewOptions": "arrow_tpu.ops.aggregates_order",
    "CumulativeOptions": "arrow_tpu.ops.vector_misc",
    "PairwiseOptions": "arrow_tpu.ops.vector_misc",
    "MatchSubstringOptions": "arrow_tpu.ops.strings",
    "SliceOptions": "arrow_tpu.ops.strings",
    "TrimOptions": "arrow_tpu.ops.strings",
    "PadOptions": "arrow_tpu.ops.strings",
    "ReplaceSubstringOptions": "arrow_tpu.ops.strings",
    "JoinOptions": "arrow_tpu.ops.strings",
    "CastOptions": "arrow_tpu.ops.scalar_cast",
    "FilterOptions": "arrow_tpu.ops.selection",
    "TakeOptions": "arrow_tpu.ops.selection",
    "filter_array": "arrow_tpu.ops.selection",
    "filter_batch": "arrow_tpu.ops.selection",
    "take_array": "arrow_tpu.ops.selection",
    "take_batch": "arrow_tpu.ops.selection",
    "get_take_indices": "arrow_tpu.ops.selection",
    "SortKey": "arrow_tpu.ops.sorting",
    "SortOptions": "arrow_tpu.ops.sorting",
    "ArraySortOptions": "arrow_tpu.ops.sorting",
    "SelectKOptions": "arrow_tpu.ops.sorting",
    "RankOptions": "arrow_tpu.ops.sorting",
    "ScalarAggregateOptions": "arrow_tpu.ops.aggregates",
    "CountOptions": "arrow_tpu.ops.aggregates",
    "VarianceOptions": "arrow_tpu.ops.aggregates",
    "PivotWiderOptions": "arrow_tpu.ops.agg_options",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        mod = importlib.import_module(_LAZY[name])
        return getattr(mod, name)
    fn = registry.get(name) if name in registry else None
    if fn is not None:
        def wrapper(*args, options=None, **kwargs):
            return call_function(name, list(args), options=options,
                                 **kwargs)
        wrapper.__name__ = name
        wrapper.__doc__ = fn.doc or f"compute function {name!r}"
        return wrapper
    raise AttributeError(f"module 'arrow_tpu.compute' has no attribute "
                         f"{name!r}")


def cast(arr, target_type, **kwargs):
    from ..ops.scalar_cast import CastOptions
    return call_function("cast", [arr],
                         options=CastOptions(target_type, **kwargs))


def list_functions():
    return registry.list_functions()
