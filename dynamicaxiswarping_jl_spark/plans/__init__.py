"""Physical-plan helpers: session factory, skew handling, checkpoints."""

from .session import get_spark, warm_python_workers
from .skew import salted_repartition, with_salt
from .checkpoints import CheckpointManager

__all__ = ["get_spark", "warm_python_workers", "salted_repartition", "with_salt", "CheckpointManager"]
