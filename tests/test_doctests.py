r"""Executable docstring examples — mirrors the reference's doctest CI gate
(reference: .github/workflows/ci.yaml:41-53 runs ``pytest zuko
--doctest-modules``)."""

import doctest

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zuko_tpu
import zuko_tpu.bayesian
import zuko_tpu.core
import zuko_tpu.data
import zuko_tpu.distributions
import zuko_tpu.flows.autoregressive
import zuko_tpu.flows.continuous
import zuko_tpu.flows.coupling
import zuko_tpu.flows.gaussianization
import zuko_tpu.flows.neural
import zuko_tpu.flows.polynomial
import zuko_tpu.flows.spline
import zuko_tpu.lazy
import zuko_tpu.mixtures
import zuko_tpu.nn
import zuko_tpu.ops.cnf_fused
import zuko_tpu.ops.dispatch
import zuko_tpu.ops.gf_fused
import zuko_tpu.ops.masked_linear
import zuko_tpu.ops.naf_fused
import zuko_tpu.ops.nsf_fused
import zuko_tpu.ops.rqs
import zuko_tpu.parallel.mesh
import zuko_tpu.parallel.train
import zuko_tpu.profiling
import zuko_tpu.serial
import zuko_tpu.transforms
import zuko_tpu.utils

MODULES = [
    zuko_tpu.bayesian,
    zuko_tpu.data,
    zuko_tpu.distributions,
    zuko_tpu.flows.autoregressive,
    zuko_tpu.flows.continuous,
    zuko_tpu.flows.coupling,
    zuko_tpu.flows.gaussianization,
    zuko_tpu.flows.neural,
    zuko_tpu.flows.polynomial,
    zuko_tpu.flows.spline,
    zuko_tpu.lazy,
    zuko_tpu.mixtures,
    zuko_tpu.nn,
    zuko_tpu.ops.cnf_fused,
    zuko_tpu.ops.dispatch,
    zuko_tpu.ops.gf_fused,
    zuko_tpu.ops.masked_linear,
    zuko_tpu.ops.naf_fused,
    zuko_tpu.ops.nsf_fused,
    zuko_tpu.ops.rqs,
    zuko_tpu.parallel.mesh,
    zuko_tpu.parallel.train,
    zuko_tpu.profiling,
    zuko_tpu.serial,
    zuko_tpu.transforms,
    zuko_tpu.utils,
]


@pytest.mark.parametrize("module", MODULES, ids=lambda m: m.__name__)
def test_doctests(module):
    results = doctest.testmod(
        module,
        extraglobs={"jax": jax, "jnp": jnp, "np": np},
        optionflags=doctest.ELLIPSIS | doctest.NORMALIZE_WHITESPACE,
    )
    assert results.failed == 0, f"{results.failed} doctest failures in {module.__name__}"
