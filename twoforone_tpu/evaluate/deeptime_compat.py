"""Load deeptime/torch objects from golden pickles without those packages.

The golden TICA references (assets/saved_references/saved_TICA_*.pickle,
written by reference evaluate/evaluators.py:417-421) embed fitted
``deeptime.decomposition.TICA`` estimators. This module unpickles them with
duck-typed stand-in classes and extracts the linear transform
(verified: ``transform(x) == (x - cov.mean_0) @ instantaneous_coefficients[:, :dim]``
and the stored whitening transform's matrix equals the stored instantaneous
coefficients).
"""

from __future__ import annotations

import pickle
from typing import Any

import numpy as np

from twoforone_tpu.evaluate.tica import TicaProjection


class _Duck:
    """Attribute bag standing in for any unimportable class."""

    def __init__(self, *args, **kwargs):
        self._init_args = args
        self._init_kwargs = kwargs

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state


class DuckUnpickler(pickle.Unpickler):
    """Unpickler that substitutes attribute bags for missing classes."""

    def find_class(self, module: str, name: str):
        try:
            return super().find_class(module, name)
        except Exception:
            return type(name, (_Duck,), {"_module": module})


def duck_load(path: str) -> Any:
    with open(path, "rb") as f:
        return DuckUnpickler(f).load()


def tica_projection_from_estimator(est: Any) -> TicaProjection:
    """Extract the linear TICA transform from a (duck-loaded) deeptime TICA."""
    model = est._model if hasattr(est, "_model") else est
    cov = model._cov
    mean = np.asarray(cov._mean_0, dtype=np.float64)
    coeffs = np.asarray(model._instantaneous_coefficients, dtype=np.float64)
    svals = np.asarray(model._singular_values, dtype=np.float64)
    dim = int(model._dim)
    return TicaProjection(mean=mean, coefficients=coeffs, singular_values=svals, dim=dim)


def load_tica_reference(path: str):
    """Load a saved_TICA_*.pickle -> (TicaProjection, gt_prob, bin_edges_x, bin_edges_y)."""
    tica_est, gt_prob, bin_edges_x, bin_edges_y = duck_load(path)
    return (
        tica_projection_from_estimator(tica_est),
        np.asarray(gt_prob),
        np.asarray(bin_edges_x),
        np.asarray(bin_edges_y),
    )


def _to_numpy(x):
    """Convert torch tensors (real or duck) inside golden pickles to numpy."""
    if isinstance(x, np.ndarray):
        return x
    if hasattr(x, "numpy"):
        try:
            return x.numpy()
        except Exception:
            pass
    if hasattr(x, "detach"):
        try:
            return x.detach().cpu().numpy()
        except Exception:
            pass
    return np.asarray(x)


def load_pwd_reference(path: str):
    """Load a saved_pwd_*.pickle -> (gt_max (P,), gt_hist list of (bins_i,)).

    These pickles store torch tensors; torch is imported lazily only if
    needed (it is an optional dependency of the loader, not the framework).
    """
    data = duck_load(path)
    gt_max = _to_numpy(data["gt_max"]).astype(np.float64)
    gt_hist = [_to_numpy(h).astype(np.float64) for h in data["gt_hist"]]
    return gt_max, gt_hist
