r"""UCI dataset tier: real-data layouts, POWER preprocessing semantics, and
clearly-separated surrogates."""

import os

import numpy as np
import pytest

from zuko_tpu.data import _power_preprocess, two_moons, uci_dataset


def test_surrogate_dims():
    for name, d in [("power", 6), ("gas", 8), ("hepmass", 21), ("miniboone", 43)]:
        train, val, test = uci_dataset(name, n=4096)
        assert train.shape == (4096, d)
        assert val.shape == test.shape == (512, d)
        # surrogate train is standardized
        assert np.allclose(train.mean(0), 0.0, atol=0.1)
        assert np.allclose(train.std(0), 1.0, atol=0.1)


def test_unknown_dataset():
    with pytest.raises(ValueError, match="unknown UCI dataset"):
        uci_dataset("celeba")


def test_presplit_layout(tmp_path):
    rng = np.random.RandomState(0)
    for s, m in [("train", 100), ("val", 20), ("test", 30)]:
        np.save(tmp_path / f"power_{s}.npy", rng.randn(m, 6).astype(np.float32))
    train, val, test = uci_dataset("power", str(tmp_path))
    assert train.shape == (100, 6) and val.shape == (20, 6) and test.shape == (30, 6)


def test_archive_layout_power(tmp_path):
    rng = np.random.RandomState(0)
    (tmp_path / "power").mkdir()
    raw = rng.rand(1000, 8).astype(np.float64) * 5
    np.save(tmp_path / "power" / "data.npy", raw)
    train, val, test = uci_dataset("power", str(tmp_path))
    # standard split fractions: 10% test, then 10% of the rest validation
    assert test.shape == (100, 6)
    assert val.shape == (90, 6)
    assert train.shape == (810, 6)
    # z-scored with train+val moments
    tv = np.vstack((train, val))
    assert np.allclose(tv.mean(0), 0.0, atol=1e-5)
    assert np.allclose(tv.std(0), 1.0, atol=1e-4)


def test_archive_layout_power_columns():
    # the 8-column archive matrix drops raw columns 3 then 1
    # (global_intensity, global_reactive_power) leaving D=6
    raw = np.tile(np.arange(8, dtype=np.float64), (1000, 1))
    train, _, _ = _power_preprocess(raw.copy())
    assert train.shape[1] == 6


def test_archive_layout_gas(tmp_path):
    # real schema: ethylene_CO.pickle is a DataFrame with Time/Meth/Eth +
    # 16 sensor columns of which 8 are >0.98-correlated duplicates; the
    # published pruning recipe must land on exactly D=8
    import pandas as pd

    rng = np.random.RandomState(0)
    base = rng.randn(500, 8)
    dup = base + 1e-3 * rng.randn(500, 8)  # corr > 0.98 pairs
    cols = {"Time": np.arange(500.0), "Meth": rng.rand(500), "Eth": rng.rand(500)}
    for i in range(8):
        cols[f"S{i}"] = base[:, i]
    for i in range(8):
        cols[f"S{i + 8}"] = dup[:, i]
    (tmp_path / "gas").mkdir()
    pd.DataFrame(cols).to_pickle(tmp_path / "gas" / "ethylene_CO.pickle")

    train, val, test = uci_dataset("gas", str(tmp_path))
    assert train.shape[1] == val.shape[1] == test.shape[1] == 8
    assert test.shape[0] == 50 and val.shape[0] == 45 and train.shape[0] == 405
    # z-scored with whole-data moments (the published recipe)
    alld = np.vstack((train, val, test))
    assert np.allclose(alld.mean(0), 0.0, atol=1e-4)


def test_archive_layout_hepmass(tmp_path):
    # real schema: 1000_{train,test}.csv with a leading class label, 27
    # features of which 6 have a too-frequent smallest value (dropped),
    # and a spurious extra last column in the test file
    import pandas as pd

    rng = np.random.RandomState(0)
    n = 400
    feats = rng.randn(n, 27)
    # 6 "discrete-ish" features: smallest value re-occurs > 5 times
    for j in range(6):
        feats[: n // 2, 3 + 4 * j] = -5.0 - j
    label = np.array([1.0, 0.0] * (n // 2))
    (tmp_path / "hepmass").mkdir()
    dftr = pd.DataFrame(
        np.column_stack([label, feats]),
        columns=["# label"] + [f"f{j}" for j in range(27)],
    )
    dftr.to_csv(tmp_path / "hepmass" / "1000_train.csv", index=False)
    dfte = pd.DataFrame(
        np.column_stack([label, feats + 0.1, np.zeros(n)]),
        columns=["# label"] + [f"f{j}" for j in range(27)] + ["junk"],
    )
    dfte.to_csv(tmp_path / "hepmass" / "1000_test.csv", index=False)

    train, val, test = uci_dataset("hepmass", str(tmp_path))
    assert train.shape[1] == val.shape[1] == test.shape[1] == 21
    # only class-1 rows survive
    assert train.shape[0] + val.shape[0] == n // 2
    assert test.shape[0] == n // 2


def test_archive_layout_miniboone(tmp_path):
    rng = np.random.RandomState(0)
    (tmp_path / "miniboone").mkdir()
    np.save(tmp_path / "miniboone" / "data.npy",
            rng.randn(1000, 43).astype(np.float64))
    train, val, test = uci_dataset("miniboone", str(tmp_path))
    assert test.shape == (100, 43)
    assert val.shape == (90, 43)
    assert train.shape == (810, 43)
    tv = np.vstack((train, val))
    assert np.allclose(tv.mean(0), 0.0, atol=1e-5)
    assert np.allclose(tv.std(0), 1.0, atol=1e-4)


def test_archive_data_subdir_root(tmp_path):
    # the tarball unpacks to data/{name}/... — the loader must find it when
    # pointed at the unpack root
    rng = np.random.RandomState(0)
    (tmp_path / "data" / "miniboone").mkdir(parents=True)
    np.save(tmp_path / "data" / "miniboone" / "data.npy", rng.randn(200, 43))
    train, _, _ = uci_dataset("miniboone", str(tmp_path))
    assert train.shape[1] == 43


def test_archive_schema_mismatch_is_loud(tmp_path):
    # wrong raw column count must raise, not silently return wrong-D splits
    (tmp_path / "miniboone").mkdir()
    np.save(tmp_path / "miniboone" / "data.npy", np.zeros((100, 17)))
    with pytest.raises(AssertionError, match="schema"):
        uci_dataset("miniboone", str(tmp_path))


def test_missing_path_errors(tmp_path):
    with pytest.raises(FileNotFoundError, match="zenodo"):
        uci_dataset("power", str(tmp_path / "nope"))


def test_uci_anchor_one_command(tmp_path):
    r"""The north-star re-measure path (tools/uci_anchor.py) runs end to
    end on a real-schema fixture: archive layout -> standard preprocessing
    -> NSF training -> test NLL + published-anchor delta. Also the refusal
    contract: without data it must NOT print an anchor number."""
    import subprocess
    import sys as _sys

    root = os.path.dirname(os.path.dirname(__file__))
    tool = os.path.join(root, "tools", "uci_anchor.py")

    # refusal without data
    env = {k: v for k, v in os.environ.items() if k != "ZUKO_TPU_DATA_DIR"}
    r = subprocess.run([_sys.executable, tool, "power"],
                       capture_output=True, text=True, env=env)
    assert r.returncode == 2
    assert "zenodo" in r.stderr

    # one command on a real-schema fixture
    rng = np.random.RandomState(0)
    (tmp_path / "power").mkdir()
    np.save(tmp_path / "power" / "data.npy", rng.rand(4000, 8) * 4)
    r = subprocess.run(
        [_sys.executable, tool, "power", "--data-dir", str(tmp_path),
         "--epochs", "1", "--transforms", "2", "--hidden", "16", "16",
         "--batch", "256", "--cpu"],
        capture_output=True, text=True, env=env, timeout=500,
    )
    assert r.returncode == 0, r.stderr[-800:]
    assert "test NLL" in r.stdout
    assert "published NSF anchor" in r.stdout


def test_two_moons_shapes():
    x, y = two_moons(256)
    assert x.shape == (256, 2) and y.shape == (256,)
    assert set(np.unique(y)) <= {0.0, 1.0}


def test_digits_real_data():
    # REAL data (UCI handwritten digits via sklearn) — the offline-available
    # density benchmark; MAF-style treatment mirrors _power_preprocess
    from zuko_tpu.data import digits_dataset

    train, val, test = digits_dataset()
    assert train.shape[1] == val.shape[1] == test.shape[1] == 64
    assert train.shape[0] + val.shape[0] + test.shape[0] == 1797
    assert train.dtype == np.float32
    # z-scored with train+val moments
    tv = np.vstack((train, val))
    assert np.allclose(tv.mean(0), 0.0, atol=1e-5)
    assert np.allclose(tv.std(0), 1.0, atol=1e-4)
    # deterministic
    t2, _, _ = digits_dataset()
    assert np.array_equal(train, t2)
    # dequantization: no two identical rows (raw integer data has dupes)
    assert np.unique(train, axis=0).shape[0] == train.shape[0]
