r"""Public-API parity with the reference package.

Every name the reference DECLARES public (module ``__all__``) must exist at
the same dotted path here, including the deprecation-shim submodules.
Skipped when the reference checkout is absent (the rest of the battery is
hermetic); the torch-substrate namespace parity is pinned hermetically in
tests/test_distributions.py against torch itself.
"""

import importlib
import os

import pytest

_REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(_REF, "zuko")),
    reason="reference checkout not available",
)

_PAIRS = [
    ("zuko", "zuko_tpu"),
    ("zuko.flows", "zuko_tpu.flows"),
    ("zuko.flows.core", "zuko_tpu.flows.core"),
    ("zuko.flows.mixture", "zuko_tpu.flows.mixture"),
    ("zuko.flows.autoregressive", "zuko_tpu.flows.autoregressive"),
    ("zuko.flows.continuous", "zuko_tpu.flows.continuous"),
    ("zuko.flows.coupling", "zuko_tpu.flows.coupling"),
    ("zuko.flows.gaussianization", "zuko_tpu.flows.gaussianization"),
    ("zuko.flows.neural", "zuko_tpu.flows.neural"),
    ("zuko.flows.polynomial", "zuko_tpu.flows.polynomial"),
    ("zuko.flows.spline", "zuko_tpu.flows.spline"),
    ("zuko.distributions", "zuko_tpu.distributions"),
    ("zuko.transforms", "zuko_tpu.transforms"),
    ("zuko.nn", "zuko_tpu.nn"),
    ("zuko.lazy", "zuko_tpu.lazy"),
    ("zuko.mixtures", "zuko_tpu.mixtures"),
    ("zuko.bayesian", "zuko_tpu.bayesian"),
    ("zuko.utils", "zuko_tpu.utils"),
]


@pytest.mark.parametrize("rname,oname", _PAIRS)
def test_reference_all_is_covered(rname, oname):
    import sys

    if _REF not in sys.path:
        sys.path.append(_REF)  # append: zuko_tpu wins name collisions
    ref = importlib.import_module(rname)
    ours = importlib.import_module(oname)
    declared = getattr(ref, "__all__", None)
    if declared is None:
        pytest.skip(f"{rname} declares no __all__")
    missing = [n for n in declared if not hasattr(ours, n)]
    assert not missing, f"{oname} missing reference API: {missing}"
