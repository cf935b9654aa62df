"""arrow_tpu.compute — the function registry + kernel API surface.

Plays the role of pyarrow.compute: every registered function is callable as
``compute.call_function(name, args)`` and the common ones are exposed as
module-level helpers.
"""

from .registry import (  # noqa: F401
    Function, FunctionRegistry, Kind, NullHandling, call_function, registry,
    register_function,
)
from .scalar import Scalar, scalar  # noqa: F401

# Import kernel modules for their registration side effects.
from ..ops import scalar_arithmetic  # noqa: F401,E402
from ..ops import scalar_compare  # noqa: F401,E402
from ..ops import scalar_cast  # noqa: F401,E402
from ..ops import selection  # noqa: F401,E402
from ..ops import sorting  # noqa: F401,E402
from ..ops import aggregates  # noqa: F401,E402
from ..ops.scalar_cast import CastOptions  # noqa: F401,E402
from ..ops.selection import (  # noqa: F401,E402
    FilterOptions, TakeOptions, filter_array, filter_batch, take_array,
    take_batch, get_take_indices,
)


def _make_wrapper(name):
    def wrapper(*args, options=None, **kwargs):
        return call_function(name, list(args), options=options, **kwargs)
    wrapper.__name__ = name
    wrapper.__qualname__ = name
    wrapper.__doc__ = registry.get(name).doc or f"compute function {name!r}"
    return wrapper


def _expose_all():
    import sys
    mod = sys.modules[__name__]
    for name in registry.list_functions():
        attr = name
        if not attr.isidentifier():
            continue
        if hasattr(mod, attr) and attr not in ("filter", "take", "cast"):
            continue
        setattr(mod, attr, _make_wrapper(name))


_expose_all()


def cast(arr, target_type, **kwargs):
    return call_function("cast", [arr],
                         options=CastOptions(target_type, **kwargs))
