"""arrow_tpu.parallel — multi-chip SPMD execution (mesh + shuffle)."""
from .context import DistContext  # noqa: F401
from .dist_agg import DistGroupBy  # noqa: F401
from .shuffle import shuffle_batch, partition_for_exchange, \
    shuffle_rows  # noqa: F401
