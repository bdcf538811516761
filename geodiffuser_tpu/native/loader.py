"""ctypes bindings for the native experiment loader (exp_loader.cpp).

Compiled on first use (g++ is in the build image; no pybind11 needed).
Falls back transparently to the pure-Python exp_io reader when compilation
or the native decode fails (e.g. exotic PNG variants).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libexploader.so")
_SRC = os.path.join(_DIR, "exp_loader.cpp")
_lib = None


def ensure_built(force: bool = False) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None and not force:
        return _lib
    if force or not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
            "-o", _SO, "-lz", "-lpthread",
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(_SO)
    lib.gd_load_npy.restype = ctypes.c_int
    lib.gd_load_png.restype = ctypes.c_int
    lib.gd_prefetcher_create.restype = ctypes.c_void_p
    lib.gd_prefetcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.gd_prefetcher_next.restype = ctypes.c_void_p
    lib.gd_prefetcher_next.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.gd_exp_ok.restype = ctypes.c_int
    lib.gd_exp_ok.argtypes = [ctypes.c_void_p]
    lib.gd_exp_path.restype = ctypes.c_char_p
    lib.gd_exp_path.argtypes = [ctypes.c_void_p]
    for name in ("gd_exp_image", "gd_exp_mask"):
        getattr(lib, name).argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
    lib.gd_exp_depth.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
    ]
    lib.gd_exp_transform.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.gd_exp_free.argtypes = [ctypes.c_void_p]
    lib.gd_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def load_npy(path: str) -> np.ndarray:
    lib = ensure_built()
    out = np.empty(1 << 24, np.float64)
    shape = (ctypes.c_int64 * 8)()
    ndim = ctypes.c_int()
    rc = lib.gd_load_npy(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.size, shape, ctypes.byref(ndim),
    )
    if rc != 0:
        raise IOError(f"gd_load_npy({path}) rc={rc}")
    shp = tuple(shape[i] for i in range(ndim.value))
    n = int(np.prod(shp)) if shp else 1
    return out[:n].reshape(shp).copy()


def load_png(path: str) -> np.ndarray:
    lib = ensure_built()
    out = np.empty((4096, 4096, 3), np.uint8)
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    rc = lib.gd_load_png(path.encode(), out.ctypes.data_as(ctypes.c_void_p),
                         out.size, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"gd_load_png({path}) rc={rc}")
    return out.reshape(-1)[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


class NativePrefetcher:
    """Background-threaded experiment loader.

    Usage:
        pf = NativePrefetcher(folders, threads=2)
        for exp in pf:   # yields exp_io.Experiment
            ...
    """

    def __init__(self, folders: List[str], threads: int = 2, max_queue: int = 4):
        self.lib = ensure_built()
        self.folders = list(folders)
        arr = (ctypes.c_char_p * len(folders))(*[f.encode() for f in folders])
        self._handle = self.lib.gd_prefetcher_create(arr, len(folders), threads, max_queue)
        self._served = 0

    def __iter__(self):
        return self

    def __next__(self):
        from geodiffuser_tpu.utils import exp_io

        if self._served >= len(self.folders):
            raise StopIteration
        e = self.lib.gd_prefetcher_next(self._handle, self._served)
        self._served += 1
        if not e:
            raise StopIteration
        try:
            if not self.lib.gd_exp_ok(e):
                # fall back to the Python reader for exotic files
                path = self.lib.gd_exp_path(e).decode()
                return exp_io.read_exp(path)
            h = ctypes.c_int64(); w = ctypes.c_int64()
            self.lib.gd_exp_image(e, None, ctypes.byref(h), ctypes.byref(w))
            img = np.empty((h.value, w.value, 3), np.uint8)
            self.lib.gd_exp_image(e, img.ctypes.data_as(ctypes.c_void_p),
                                  ctypes.byref(h), ctypes.byref(w))
            self.lib.gd_exp_mask(e, None, ctypes.byref(h), ctypes.byref(w))
            mask = np.empty((h.value, w.value, 3), np.uint8)
            self.lib.gd_exp_mask(e, mask.ctypes.data_as(ctypes.c_void_p),
                                 ctypes.byref(h), ctypes.byref(w))
            shape = (ctypes.c_int64 * 8)()
            ndim = ctypes.c_int()
            self.lib.gd_exp_depth(e, None, 0, shape, ctypes.byref(ndim))
            shp = tuple(shape[i] for i in range(ndim.value))
            depth = np.empty(shp, np.float64)
            self.lib.gd_exp_depth(e, depth.ctypes.data_as(ctypes.c_void_p),
                                  depth.size, shape, ctypes.byref(ndim))
            tr = np.empty((4, 4), np.float64)
            self.lib.gd_exp_transform(e, tr.ctypes.data_as(ctypes.c_void_p))
            path = self.lib.gd_exp_path(e).decode()
            return exp_io.Experiment(
                input_image=img,
                input_mask=mask[..., 0].astype(np.float32) / 255.0,
                depth=depth.astype(np.float32),
                transform=tr,
                image_shape=np.array([img.shape[0], img.shape[1]]),
                path=path,
            )
        finally:
            self.lib.gd_exp_free(e)

    def __del__(self):
        if getattr(self, "_handle", None) and self.lib:
            self.lib.gd_prefetcher_destroy(self._handle)
            self._handle = None
