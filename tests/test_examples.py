r"""Smoke tests for the examples/ tier — each runs end-to-end with tiny
settings (the reference's tutorial notebooks are CI-executed; this is
the analogous gate)."""

import runpy
import sys

import pytest


def _run(path, argv):
    old = sys.argv
    sys.argv = [path] + argv
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = old


def test_basics_example(capsys):
    _run("examples/basics.py", [])
    out = capsys.readouterr().out
    assert "custom recipe" in out


def test_uci_digits_example(capsys):
    _run("examples/uci_digits.py", ["--epochs", "2"])
    out = capsys.readouterr().out
    assert "test NLL" in out


def test_serving_example(capsys):
    _run("examples/serving.py", ["--epochs", "1", "--score-rows", "4096"])
    out = capsys.readouterr().out
    assert "f32 round-trip" in out


def test_vae_example(capsys):
    _run("examples/vae.py", ["--epochs", "1"])
    out = capsys.readouterr().out
    assert "-ELBO" in out


def test_ensembles_example(capsys):
    _run("examples/ensembles.py",
         ["--members", "3", "--epochs", "3", "--samples", "1024"])
    out = capsys.readouterr().out
    assert "epistemic signal separates" in out
