r"""zuko-tpu: TPU-native normalizing flows in JAX."""

__version__ = "0.1.0"

from . import core, utils  # noqa: F401
from .core import Module, combine, partition  # noqa: F401
