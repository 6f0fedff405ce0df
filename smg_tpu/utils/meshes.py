"""Mesh-directory ingestion: the --obj_mesh_dir parity path.

The reference scans datasets/<set>/{enveloping,sucking} for .obj meshes and
spawns them through the scene's Lua importShape (reference robot.py:36-49,
127-143; the dataset blob itself is a missing git-LFS pointer). Here a mesh
directory is ingested once on the host — parsed and fitted to analytic
primitives by the native library (smg_tpu.utils.native) — into the same
catalog arrays the procedural catalogs provide, and the device-side scene
sampler consumes either interchangeably.
"""

from __future__ import annotations

import os

import numpy as np

from smg_tpu.utils import native


def load_catalog(directory: str, density: float = 300.0):
    """Fit every .obj under `directory` -> (types (M,), half_extents (M, 3)).

    Matches the structure of shapes.ENVELOPING_CATALOG / SUCKING_CATALOG.
    """
    files = sorted(
        f for f in os.listdir(directory)
        if os.path.splitext(f)[1] == ".obj"  # robot.py:44-49 filter
    )
    if not files:
        raise FileNotFoundError(f"no .obj meshes under {directory}")
    types, hexts = [], []
    for f in files:
        fit = native.fit_obj(os.path.join(directory, f), density)
        types.append(fit.shape_type)
        hexts.append(fit.half_extents)
    return np.asarray(types, np.int32), np.asarray(hexts, np.float32)


def load_object_sets(obj_mesh_dir: str):
    """Load the enveloping/sucking split like the reference (robot.py:36-37).

    Returns ((types_g, he_g), (types_s, he_s)).
    """
    return (
        load_catalog(os.path.join(obj_mesh_dir, "enveloping")),
        load_catalog(os.path.join(obj_mesh_dir, "sucking")),
    )
