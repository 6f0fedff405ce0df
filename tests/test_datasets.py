"""Object-set split: held-out testing catalogs + --obj_mesh_dir plumbing.

The reference trains on datasets/training and evaluates on a disjoint
datasets/testing mesh set (reference robot.py:36-49; README.md:76-113).
Here the procedural catalogs play both roles and a real mesh directory
routes through the native fitter (utils/meshes.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smg_tpu.envs import smg_env
from smg_tpu.physics import scene as scene_mod
from smg_tpu.physics import shapes
from tests.test_native import write_box_obj, write_cylinder_obj


def _entries(catalog):
    types, hexts = catalog
    return {
        (int(t),) + tuple(np.round(np.asarray(h), 6))
        for t, h in zip(types, hexts)
    }


def test_catalogs_disjoint():
    """No (type, half-extents) entry is shared between train and test."""
    assert not _entries(shapes.ENVELOPING_CATALOG) & _entries(
        shapes.TESTING_ENVELOPING_CATALOG
    )
    assert not _entries(shapes.SUCKING_CATALOG) & _entries(
        shapes.TESTING_SUCKING_CATALOG
    )


@pytest.mark.parametrize("testing", [False, True])
def test_spawn_draws_from_selected_catalog(testing):
    """Every active object's geometry comes from the selected catalog."""
    allowed = _entries(
        shapes.TESTING_ENVELOPING_CATALOG if testing
        else shapes.ENVELOPING_CATALOG
    ) | _entries(
        shapes.TESTING_SUCKING_CATALOG if testing
        else shapes.SUCKING_CATALOG
    )
    for seed in range(4):
        obj = scene_mod.spawn_objects(
            jax.random.PRNGKey(seed), is_testing=testing
        )
        active = np.asarray(obj.active)
        drawn = {
            (int(t),) + tuple(np.round(np.asarray(h), 6))
            for t, h, a in zip(
                np.asarray(obj.shape_type), np.asarray(obj.half_extents),
                active,
            )
            if a
        }
        assert drawn and drawn <= allowed


def test_resolve_catalogs_sentinels():
    train = smg_env.resolve_catalogs(
        smg_env.EnvConfig(obj_mesh_dir="datasets/training")
    )
    test = smg_env.resolve_catalogs(
        smg_env.EnvConfig(obj_mesh_dir="datasets/testing")
    )
    assert _entries(train[0]) == _entries(shapes.ENVELOPING_CATALOG)
    assert _entries(test[0]) == _entries(shapes.TESTING_ENVELOPING_CATALOG)
    # "" defers to is_testing.
    by_flag = smg_env.resolve_catalogs(smg_env.EnvConfig(is_testing=True))
    assert _entries(by_flag[1]) == _entries(shapes.TESTING_SUCKING_CATALOG)


def test_resolve_catalogs_mesh_dir(tmp_path):
    """A real mesh directory is ingested through the native fitter and
    feeds spawn_objects like any catalog."""
    for sub, writer in (("enveloping", write_cylinder_obj),
                        ("sucking", write_box_obj)):
        d = tmp_path / sub
        d.mkdir()
        writer(str(d / "a.obj"))
    cats = smg_env.resolve_catalogs(
        smg_env.EnvConfig(obj_mesh_dir=str(tmp_path))
    )
    (gt, ghe), (st, she) = cats
    assert gt.shape == (1,) and st.shape == (1,)
    assert int(gt[0]) == shapes.CYLINDER and int(st[0]) == shapes.BOX
    obj = scene_mod.spawn_objects(jax.random.PRNGKey(0), catalogs=cats)
    active = np.asarray(obj.active)
    assert active.any()
    he = np.asarray(obj.half_extents)[active]
    allowed = np.concatenate([np.asarray(ghe), np.asarray(she)])
    for row in he:
        assert any(np.allclose(row, a, atol=1e-5) for a in allowed)


def test_resolve_catalogs_bad_dir_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        smg_env.resolve_catalogs(
            smg_env.EnvConfig(obj_mesh_dir=str(tmp_path / "nope"))
        )
