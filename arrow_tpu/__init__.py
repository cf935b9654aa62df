"""arrow_tpu — a TPU-native vectorized query-execution engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of Apache Arrow's
compute kernels + the Acero streaming engine (reference: Apache Arrow 22.0.0).
See SURVEY.md for the blueprint.
"""

import os

import jax

# Arrow parity requires real int64/float64 arithmetic; JAX defaults to x32.
# Opt out with ARROW_TPU_NO_X64=1 (then int64 columns downcast — not
# bit-exact).
if not os.environ.get("ARROW_TPU_NO_X64"):
    jax.config.update("jax_enable_x64", True)

from .core import datatype as types  # noqa: E402
from .core.datatype import (  # noqa: E402,F401
    DataType, int8, int16, int32, int64, uint8, uint16, uint32, uint64,
    float16, float32, float64, bool_, string, binary, null, date32, date64,
    timestamp, time32, time64, duration, decimal128, dictionary, list_,
    struct, fixed_size_binary,
)
from .core.array import Array, array, nulls, full  # noqa: E402,F401
from .core.schema import Field, Schema, field, schema  # noqa: E402,F401
from .core.batch import Batch, Table, batch, table  # noqa: E402,F401
from .core.json_literals import array_from_json, batch_from_json  # noqa: E402,F401
from .core.tensor import (  # noqa: E402,F401
    Tensor, SparseCOOTensor, SparseCSRMatrix, SparseCSCMatrix)

# Eagerly import every kernel module. Deferred (inside-function) imports
# would otherwise fire during a jit TRACE, and any module-level jnp value
# created under an active trace is a leaked tracer that poisons every
# later jaxpr referencing it ("Execution supplied N buffers but compiled
# program expected M").
from .compute.registry import ensure_kernels_loaded as _ekl  # noqa: E402
_ekl()
del _ekl

__version__ = "0.1.0"
