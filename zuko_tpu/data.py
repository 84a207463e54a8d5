r"""Datasets and target energies for the benchmark/tutorial tasks.

The reference uses ``sklearn.datasets.make_moons`` and a ring energy in its
tutorials (docs/tutorials/forward_kl.ipynb cell 3, reverse_kl.ipynb cell 3);
both are re-implemented here without external dependencies. The UCI loaders
read preprocessed ``.npy`` files when available and otherwise synthesize a
surrogate with matched dimensionality (the real UCI numbers must be measured
with the downloaded datasets — they are not shipped in either repo).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

__all__ = [
    "two_moons",
    "ring_energy",
    "uci_dataset",
    "uci_power",
    "digits_dataset",
    "digits_binary",
    "digits_conditional",
]


def two_moons(n: int, sigma: float = 1e-1, seed: int = 0):
    """Two-moons dataset, exactly the reference tutorial's generator
    (docs/tutorials/forward_kl.ipynb cell 3):

    ``theta ~ U(0, 2pi)``, ``label = theta > pi``,
    ``x = (cos t + label - 1/2, sin t + label/2 - 1/4) + N(0, sigma)``.
    """
    rng = np.random.RandomState(seed)
    theta = 2 * np.pi * rng.rand(n)
    label = (theta > np.pi).astype(np.float64)

    x = np.stack(
        [
            np.cos(theta) + label - 1 / 2,
            np.sin(theta) + label / 2 - 1 / 4,
        ],
        axis=-1,
    )
    x = x + sigma * rng.randn(n, 2)
    return x.astype(np.float32), label.astype(np.float32)


def ring_energy(x):
    r"""The reference reverse-KL tutorial's multi-modal log-energy
    (docs/tutorials/reverse_kl.ipynb cell 3):
    :math:`\log U(x) = \sin(\pi x_1) - 2 (x_1^2 + x_2^2 - 2)^2`."""
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.sin(jnp.pi * x1) - 2 * (x1**2 + x2**2 - 2) ** 2


# UCI tabular-density benchmark suite (the NSF paper's evaluation datasets,
# linked from /root/reference/README.md:88). Feature dimensionalities below
# match the standard MAF-preprocessed versions.
_UCI_DIMS = {"power": 6, "gas": 8, "hepmass": 21, "miniboone": 43}

#: How to obtain the real data (zero-egress here, so it cannot be baked):
#: download the preprocessed MAF datasets archive (``data.tar.gz`` from the
#: "MAF datasets" record on Zenodo, https://zenodo.org/record/1161203 — the
#: same files every flow paper uses), unpack it, and either
#:
#: * point ``ZUKO_TPU_DATA_DIR`` (or the ``path=`` argument) at a directory
#:   containing ``{name}/data.npy`` (the archive layout) — the standard
#:   shuffle/noise/split/normalize preprocessing is applied here, or
#: * drop already-preprocessed ``{name}_{train,val,test}.npy`` files in it.
_UCI_URL = "https://zenodo.org/record/1161203 (MAF datasets, data.tar.gz)"


def _power_preprocess(data: np.ndarray):
    """The standard POWER preprocessing (MAF repo ``datasets/power.py``,
    reused verbatim by the NSF paper): shuffle with seed 42, drop raw columns
    3 then 1 (global_intensity, global_reactive_power) leaving D=6,
    dequantize with uniform noise (gap 1e-3, voltage 1e-2, sub-meters 1.0,
    time 0), split off 10% test then 10% validation, and z-score with
    train+val moments."""
    rng = np.random.RandomState(42)
    rng.shuffle(data)
    n = data.shape[0]
    data = np.delete(data, 3, axis=1)
    data = np.delete(data, 1, axis=1)

    gap_noise = 0.001 * rng.rand(n, 1)
    voltage_noise = 0.01 * rng.rand(n, 1)
    sm_noise = rng.rand(n, 3)
    time_noise = np.zeros((n, 1))
    data = data + np.hstack(
        (gap_noise, voltage_noise, sm_noise, time_noise)
    )

    n_test = int(0.1 * data.shape[0])
    test = data[-n_test:]
    data = data[:-n_test]
    n_val = int(0.1 * data.shape[0])
    val = data[-n_val:]
    train = data[:-n_val]

    mu = np.vstack((train, val)).mean(axis=0)
    sd = np.vstack((train, val)).std(axis=0)
    sd = np.where(sd > 0, sd, 1.0)  # constant columns (tiny test fixtures)
    return tuple(
        ((s - mu) / sd).astype(np.float32) for s in (train, val, test)
    )


def _gas_preprocess(df):
    """The standard GAS preprocessing (MAF repo ``datasets/gas.py``, reused
    verbatim by the NSF paper) on the archive's ``gas/ethylene_CO.pickle``
    DataFrame: drop Meth/Eth/Time, iteratively drop any column whose
    absolute correlation with another exceeds 0.98 (leaving D=8), z-score
    with WHOLE-data moments, then split 10% test and 10% validation (no
    shuffle, no dequantization — the published recipe)."""
    for col in ("Meth", "Eth", "Time"):
        if col in df.columns:
            df = df.drop(col, axis=1)

    def correlation_numbers(d):
        c = d.corr()
        return (c.abs() > 0.98).sum(axis=1).to_numpy()

    b = correlation_numbers(df)
    while np.any(b > 1):
        df = df.drop(df.columns[int(np.where(b > 1)[0][0])], axis=1)
        b = correlation_numbers(df)

    data = (df - df.mean()) / df.std()
    data = data.to_numpy()
    n_test = int(0.1 * data.shape[0])
    test = data[-n_test:]
    data = data[:-n_test]
    n_val = int(0.1 * data.shape[0])
    return (
        data[:-n_val].astype(np.float32),
        data[-n_val:].astype(np.float32),
        test.astype(np.float32),
    )


def _hepmass_preprocess(df_train, df_test):
    """The standard HEPMASS preprocessing (MAF repo ``datasets/hepmass.py``)
    on the archive's ``hepmass/1000_{train,test}.csv`` DataFrames: keep
    class-1 (signal) rows and drop the label column, drop the test file's
    spurious last column, z-score with TRAIN moments, drop features with
    too many re-occurring values (the repo counts occurrences of each
    feature's smallest value and drops it when > 5 — reproduced as-is,
    it is what yields D=21), then split 10% of train as validation."""
    df_train = df_train[df_train[df_train.columns[0]] == 1]
    df_train = df_train.drop(df_train.columns[0], axis=1)
    df_test = df_test[df_test[df_test.columns[0]] == 1]
    df_test = df_test.drop(df_test.columns[0], axis=1)
    if df_test.shape[1] == df_train.shape[1] + 1:
        # "Because the data set is messed up!" — the test csv carries one
        # extra unnamed column
        df_test = df_test.drop(df_test.columns[-1], axis=1)

    mu, sd = df_train.mean(), df_train.std()
    train = ((df_train - mu) / sd).to_numpy()
    test = ((df_test - mu) / sd).to_numpy()

    from collections import Counter

    drop = []
    for i, feature in enumerate(train.T):
        c = Counter(feature)
        min_value_count = np.array([v for k, v in sorted(c.items())])[0]
        if min_value_count > 5:
            drop.append(i)
    keep = np.array([i for i in range(train.shape[1]) if i not in drop])
    train, test = train[:, keep], test[:, keep]

    n_val = int(0.1 * train.shape[0])
    return (
        train[:-n_val].astype(np.float32),
        train[-n_val:].astype(np.float32),
        test.astype(np.float32),
    )


def _miniboone_preprocess(data):
    """The standard MINIBOONE preprocessing (MAF repo
    ``datasets/miniboone.py``) on the archive's ``miniboone/data.npy``
    (already outlier-cleaned, D=43): split 10% test then 10% validation,
    z-score with train+val moments."""
    n_test = int(0.1 * data.shape[0])
    test = data[-n_test:]
    data = data[:-n_test]
    n_val = int(0.1 * data.shape[0])
    val = data[-n_val:]
    train = data[:-n_val]

    tv = np.vstack((train, val))
    mu, sd = tv.mean(axis=0), tv.std(axis=0)
    sd = np.where(sd > 0, sd, 1.0)
    return tuple(
        ((s - mu) / sd).astype(np.float32) for s in (train, val, test)
    )


def _load_archive(name: str, root: str):
    """Load + preprocess dataset ``name`` from the MAF archive layout rooted
    at ``root`` (``{root}/{name}/...``). Returns None when the archive files
    for ``name`` are absent."""
    d = os.path.join(root, name)
    if name == "power":
        f = os.path.join(d, "data.npy")
        return _power_preprocess(np.load(f)) if os.path.exists(f) else None
    if name == "miniboone":
        f = os.path.join(d, "data.npy")
        return _miniboone_preprocess(np.load(f)) if os.path.exists(f) else None
    if name == "gas":
        f = os.path.join(d, "ethylene_CO.pickle")
        if not os.path.exists(f):
            return None
        import pandas as pd

        return _gas_preprocess(pd.read_pickle(f))
    if name == "hepmass":
        ftr = os.path.join(d, "1000_train.csv")
        fte = os.path.join(d, "1000_test.csv")
        if not (os.path.exists(ftr) and os.path.exists(fte)):
            return None
        import pandas as pd

        return _hepmass_preprocess(
            pd.read_csv(ftr, index_col=False), pd.read_csv(fte, index_col=False)
        )
    return None


def _uci_surrogate(name: str, n: int, seed: int):
    """Synthetic surrogate with the real dataset's dimensionality — a
    3-component correlated Gaussian mixture. CLEARLY NOT the real data: use
    it only to exercise/benchmark the pipeline hermetically; real NLL numbers
    require the downloaded datasets (see ``_UCI_URL``)."""
    rng = np.random.RandomState(seed)
    D = _UCI_DIMS[name]

    centers = rng.randn(3, D) * 1.5
    A = rng.randn(D, D) * 0.3 + np.eye(D)

    def make(m):
        z = rng.randn(m, D)
        mix = rng.randint(0, 3, m)
        x = (z * 0.6 + centers[mix]) @ A
        return x.astype(np.float32)

    train = make(n)
    mu, sd = train.mean(0), train.std(0)
    return tuple(
        ((s - mu) / sd).astype(np.float32)
        for s in (train, make(n // 8), make(n // 8))
    )


def uci_dataset(name: str, path: str = None, n: int = 65536, seed: int = 0):
    """Load a UCI tabular-density benchmark split ``(train, val, test)``.

    Arguments:
        name: one of ``power``, ``gas``, ``hepmass``, ``miniboone``.
        path: directory with the real data; defaults to ``$ZUKO_TPU_DATA_DIR``.
            Two layouts are recognized, in order:

            1. ``{path}/{name}_{train,val,test}.npy`` — preprocessed splits,
               returned as-is;
            2. ``{path}/{name}/data.npy`` — the MAF archive layout; for
               ``power`` the standard preprocessing is applied here
               (see ``_power_preprocess``), other datasets must be
               pre-split (their preprocessing involves per-dataset column
               pruning best done with the original scripts).

            With neither present (or ``path=None``) a synthetic surrogate of
            matched dimensionality is returned so the pipeline runs
            hermetically — surrogate NLLs are NOT comparable to published
            numbers. Acquisition: see ``zuko_tpu.data._UCI_URL``.
    """
    name = name.lower()
    if name not in _UCI_DIMS:
        raise ValueError(f"unknown UCI dataset {name!r}; options: {sorted(_UCI_DIMS)}")
    path = path or os.environ.get("ZUKO_TPU_DATA_DIR")

    if path is not None:
        split_files = [
            os.path.join(path, f"{name}_{s}.npy") for s in ("train", "val", "test")
        ]
        if all(os.path.exists(f) for f in split_files):
            return tuple(np.load(f) for f in split_files)
        # the MAF archive layout, rooted at `path` or at `path/data` (the
        # tarball unpacks to a `data/` directory)
        for root in (path, os.path.join(path, "data")):
            splits = _load_archive(name, root)
            if splits is not None:
                D = splits[0].shape[1]
                assert D == _UCI_DIMS[name], (
                    f"{name} preprocessing produced D={D}, expected "
                    f"{_UCI_DIMS[name]} — raw file schema mismatch"
                )
                return splits
        raise FileNotFoundError(
            f"no {name} data under {path!r}; expected {name}_train.npy etc. "
            f"or the MAF archive layout ({name}/data.npy, "
            f"gas/ethylene_CO.pickle, hepmass/1000_{{train,test}}.csv) "
            f"— download from {_UCI_URL}"
        )

    return _uci_surrogate(name, n, seed)


def uci_power(path: str = None, n: int = 65536, seed: int = 0):
    """UCI POWER (D=6) — see :func:`uci_dataset`."""
    return uci_dataset("power", path, n, seed)


def digits_conditional(seed: int = 42):
    """Digits with one-hot class labels for conditional density
    estimation: same treatment as :func:`digits_dataset` but shuffled by
    permutation indexing so features and labels stay aligned (its own
    split — the label-free loader's in-place shuffle order differs).
    Returns ``((x_train, y_train), (x_val, y_val), (x_test, y_test))``
    with x float32 (n, 64) and y one-hot float32 (n, 10)."""
    from sklearn.datasets import load_digits

    d = load_digits()
    data = d.data.astype(np.float64)
    labels = d.target
    rng = np.random.RandomState(seed)
    perm = rng.permutation(data.shape[0])
    data, labels = data[perm], labels[perm]
    data = data + rng.rand(*data.shape)

    n_test = int(0.1 * data.shape[0])
    n_val = int(0.1 * (data.shape[0] - n_test))
    sl = [
        slice(0, -n_test - n_val),
        slice(-n_test - n_val, -n_test),
        slice(-n_test, None),
    ]
    mu = data[: -n_test].mean(axis=0)
    sd = data[: -n_test].std(axis=0)
    onehot = np.eye(10, dtype=np.float32)[labels]
    return tuple(
        (((data[s] - mu) / sd).astype(np.float32), onehot[s]) for s in sl
    )


def digits_binary(seed: int = 42):
    """Binarized UCI digits for the VAE tier (the reference tutorial
    binarizes MNIST by rounding, docs/tutorials/vae.ipynb cell 12): raw
    integer counts in [0, 16] thresholded at > 7.5, shuffled, split
    80/10/10. Returns ``(train, val, test)`` float32 0/1 arrays (n, 64)."""
    from sklearn.datasets import load_digits

    data = load_digits().data.astype(np.float64)
    rng = np.random.RandomState(seed)
    rng.shuffle(data)
    data = (data > 7.5).astype(np.float32)

    n_test = int(0.1 * data.shape[0])
    test = data[-n_test:]
    data = data[:-n_test]
    n_val = int(0.1 * data.shape[0])
    return data[:-n_val], data[-n_val:], test


def digits_dataset(seed: int = 42):
    """UCI Optical Recognition of Handwritten Digits — REAL data, shipped
    inside scikit-learn (the only real density-benchmark data available in a
    zero-egress environment). 1797 scanned 8x8 digit images with integer
    pixel counts in [0, 16].

    MAF-style tabular-density treatment (the same recipe as
    ``_power_preprocess``): shuffle, dequantize the counts with U(0, 1)
    noise, split 80/10/10, z-score with train+val moments. Returns
    ``(train, val, test)`` float32 arrays of shape (n, 64).
    """
    from sklearn.datasets import load_digits

    data = load_digits().data.astype(np.float64)
    rng = np.random.RandomState(seed)
    rng.shuffle(data)
    data = data + rng.rand(*data.shape)

    n_test = int(0.1 * data.shape[0])
    test = data[-n_test:]
    data = data[:-n_test]
    n_val = int(0.1 * data.shape[0])
    val = data[-n_val:]
    train = data[:-n_val]

    mu = np.vstack((train, val)).mean(axis=0)
    sd = np.vstack((train, val)).std(axis=0)
    return tuple(
        ((s - mu) / sd).astype(np.float32) for s in (train, val, test)
    )
