"""HDF5 checkpoint helpers (port of pyqmc/method/hdftools.py:19-53).

Growable per-key datasets; one row appended per block.
"""

import numpy as np


def setup_hdf(f, data, attr=None):
    for k, v in data.items():
        v = np.asarray(v)
        f.create_dataset(k, (0,) + v.shape, maxshape=(None,) + v.shape, dtype=v.dtype)
    for k, v in (attr or {}).items():
        f.attrs[k] = v


def append_hdf(f, data):
    for k, v in data.items():
        v = np.asarray(v)
        if k not in f:
            f.create_dataset(
                k, (0,) + v.shape, maxshape=(None,) + v.shape, dtype=v.dtype
            )
        ds = f[k]
        n = ds.shape[0]
        ds.resize((n + 1,) + v.shape)
        ds[n] = v
