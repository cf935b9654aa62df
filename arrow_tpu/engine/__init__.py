"""arrow_tpu.engine — plan serialization (Substrait consumer).

Reference: ``cpp/src/arrow/engine/substrait`` (serde.cc plan
deserialization, relation_internal.cc rel -> Declaration).
"""

from .substrait import run_query, substrait_to_declaration  # noqa: F401
