"""ctypes bindings for the native host library (native/smg_host).

Loads `libsmg_host.so` (building it with `make -C native` on first use when
a toolchain is present) and exposes:

- `fit_obj(path)`           — .obj mesh -> fitted primitive + mass/inertia
- `sphere_compound(...)`    — the 9-sphere collision proxy (native impl)
- `AsyncBinaryLog`          — background-thread binary row logger

Everything degrades gracefully: if the shared library is unavailable,
`fit_obj` falls back to a pure-Python parser with identical semantics, so
the framework works on toolchain-less hosts.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from dataclasses import dataclass

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libsmg_host.so")

BOX, CYLINDER, SPHERE = 0, 1, 2


class _FitResult(ctypes.Structure):
    _fields_ = [
        ("shape_type", ctypes.c_int32),
        ("half_extents", ctypes.c_float * 3),
        ("centroid", ctypes.c_float * 3),
        ("mass", ctypes.c_float),
        ("inertia", ctypes.c_float * 3),
        ("n_vertices", ctypes.c_int32),
        ("n_faces", ctypes.c_int32),
    ]


_lib = None


def _try_build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_library(build_if_missing: bool = True):
    """Load (and lazily build) libsmg_host.so; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not (build_if_missing and _try_build()):
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.smg_fit_obj.argtypes = [
        ctypes.c_char_p, ctypes.c_float, ctypes.POINTER(_FitResult)
    ]
    lib.smg_fit_obj.restype = ctypes.c_int
    lib.smg_sphere_compound.argtypes = [
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.smg_sphere_compound.restype = ctypes.c_int
    lib.smg_log_open.argtypes = [ctypes.c_char_p]
    lib.smg_log_open.restype = ctypes.c_void_p
    lib.smg_log_append.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int32
    ]
    lib.smg_log_append.restype = ctypes.c_int
    lib.smg_log_rows_written.argtypes = [ctypes.c_void_p]
    lib.smg_log_rows_written.restype = ctypes.c_uint64
    lib.smg_log_close.argtypes = [ctypes.c_void_p]
    lib.smg_log_close.restype = ctypes.c_int
    lib.smg_host_version.restype = ctypes.c_int
    _lib = lib
    return lib


@dataclass
class ObjFit:
    shape_type: int
    half_extents: np.ndarray  # (3,)
    centroid: np.ndarray      # (3,)
    mass: float
    inertia: np.ndarray       # (3,)
    n_vertices: int
    n_faces: int
    native: bool


def _fit_obj_python(path: str, density: float) -> ObjFit:
    """Pure-Python fallback with identical fitting rules."""
    verts = []
    n_faces = 0
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]),
                              float(parts[3])])
            elif line.startswith("f "):
                n_faces += 1
    v = np.asarray(verts)
    c = v.mean(axis=0)
    he = np.abs(v - c).max(axis=0)
    r_xy = np.linalg.norm(v[:, :2] - c[:2], axis=1)
    r_3d = np.linalg.norm(v - c, axis=1)
    iso = he.min() / max(he.max(), 1e-9)
    xy_iso = min(he[0], he[1]) / max(he[0], he[1])
    ang = np.arctan2(v[:, 1] - c[1], v[:, 0] - c[0])[r_xy > 1e-9]
    n_angle_bins = len(np.unique(((ang + np.pi) / (2 * np.pi) * 16)
                                 .astype(int).clip(0, 15)))
    if iso > 0.9 and r_3d.mean() > 0.8 * r_3d.max():
        st, he = SPHERE, np.full(3, r_3d.max())
    elif (xy_iso > 0.9 and r_xy.mean() > 0.8 * r_xy.max()
          and n_angle_bins >= 6):
        st = CYLINDER
        he = np.array([r_xy.max(), r_xy.max(), he[2]])
    else:
        st = BOX
    hx, hy, hz = he
    if st == BOX:
        m = density * 8 * hx * hy * hz
        inertia = m / 3.0 * np.array(
            [hy * hy + hz * hz, hx * hx + hz * hz, hx * hx + hy * hy]
        )
    elif st == CYLINDER:
        m = density * np.pi * hx * hx * 2 * hz
        ixy = m * (3 * hx * hx + 4 * hz * hz) / 12.0
        inertia = np.array([ixy, ixy, 0.5 * m * hx * hx])
    else:
        m = density * 4 / 3 * np.pi * hx ** 3
        inertia = np.full(3, 0.4 * m * hx * hx)
    return ObjFit(st, he.astype(np.float32), c.astype(np.float32),
                  float(m), inertia.astype(np.float32), len(v), n_faces,
                  native=False)


def fit_obj(path: str, density: float = 300.0) -> ObjFit:
    """Fit a primitive to a .obj mesh (native when available)."""
    lib = load_library()
    if lib is None:
        return _fit_obj_python(path, density)
    res = _FitResult()
    rc = lib.smg_fit_obj(path.encode(), ctypes.c_float(density),
                         ctypes.byref(res))
    if rc != 0:
        raise FileNotFoundError(f"smg_fit_obj failed for {path}")
    return ObjFit(
        shape_type=int(res.shape_type),
        half_extents=np.asarray(res.half_extents, np.float32).copy(),
        centroid=np.asarray(res.centroid, np.float32).copy(),
        mass=float(res.mass),
        inertia=np.asarray(res.inertia, np.float32).copy(),
        n_vertices=int(res.n_vertices),
        n_faces=int(res.n_faces),
        native=True,
    )


def sphere_compound_native(shape_type: int, half_extents: np.ndarray):
    """Native 9-sphere compound; None if the library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    he = np.ascontiguousarray(half_extents, np.float32)
    offs = np.zeros(27, np.float32)
    radii = np.zeros(9, np.float32)
    lib.smg_sphere_compound(
        shape_type,
        he.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        radii.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return offs.reshape(9, 3), radii


class AsyncBinaryLog:
    """Background-thread binary row logger backed by the native library.

    Rows are length-prefixed float32 records; `rows_written` exposes the
    drain progress. Raises if the native library is unavailable (callers
    fall back to smg_tpu.utils.logger's synchronous writer).
    """

    def __init__(self, path: str):
        lib = load_library()
        if lib is None:
            raise RuntimeError("libsmg_host.so unavailable")
        self._lib = lib
        self._handle = lib.smg_log_open(path.encode())
        if not self._handle:
            raise OSError(f"cannot open {path}")

    def append(self, row) -> None:
        arr = np.ascontiguousarray(row, np.float32).ravel()
        self._lib.smg_log_append(
            self._handle,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            arr.size,
        )

    @property
    def rows_written(self) -> int:
        return int(self._lib.smg_log_rows_written(self._handle))

    def close(self) -> None:
        if self._handle:
            self._lib.smg_log_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_binary_log(path: str):
    """Read back an AsyncBinaryLog file as a list of float32 arrays."""
    rows = []
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if len(head) < 4:
                break
            n = int(np.frombuffer(head, np.uint32)[0])
            rows.append(np.frombuffer(f.read(4 * n), np.float32).copy())
    return rows
