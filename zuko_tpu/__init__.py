r"""zuko-tpu: TPU-native normalizing flows in JAX.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
PyTorch library probabilists/zuko (mounted read-only at /root/reference):
lazy conditional distributions, a complete transform/distribution stack, the
full flow zoo, GMM mixtures and Bayesian wrappers — redesigned TPU-first.
"""

__version__ = "0.1.0"

from . import (  # noqa: F401
    bayesian,
    core,
    data,
    distributions,
    flows,
    lazy,
    mixtures,
    nn,
    ops,
    parallel,
    profiling,
    serial,
    transforms,
    utils,
)
from .bayesian import BayesianModel  # noqa: F401
from .core import Module, combine, partition  # noqa: F401
from .flows import (  # noqa: F401
    BPF,
    CNF,
    GF,
    MAF,
    NAF,
    NCSF,
    NICE,
    NSF,
    Flow,
    RealNVP,
    SOSPF,
    UNAF,
)
from .mixtures import GMM  # noqa: F401
