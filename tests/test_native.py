"""Native host library tests: OBJ fitting, sphere compounds, async logger."""

import os
import time

import numpy as np
import pytest

from smg_tpu.utils import meshes, native


def write_box_obj(path, hx=0.03, hy=0.02, hz=0.015, center=(0, 0, 0)):
    cx, cy, cz = center
    with open(path, "w") as f:
        for sx in (-1, 1):
            for sy in (-1, 1):
                for sz in (-1, 1):
                    f.write(
                        f"v {cx + sx * hx} {cy + sy * hy} {cz + sz * hz}\n"
                    )
        f.write("f 1 2 3\nf 4 5 6\n")


def write_cylinder_obj(path, R=0.02, hh=0.035, n=24):
    with open(path, "w") as f:
        for z in (-hh, hh):
            for i in range(n):
                a = 2 * np.pi * i / n
                f.write(f"v {R * np.cos(a)} {R * np.sin(a)} {z}\n")
        f.write("f 1 2 3\n")


def write_sphere_obj(path, R=0.02, n=80):
    rng = np.random.RandomState(0)
    with open(path, "w") as f:
        for _ in range(n):
            v = rng.randn(3)
            v = v / np.linalg.norm(v) * R
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        f.write("f 1 2 3\n")


@pytest.fixture(scope="module")
def lib():
    return native.load_library()


class TestFitObj:
    @pytest.mark.parametrize("use_native", [True, False])
    def test_box_fit(self, tmp_path, lib, use_native):
        if use_native and lib is None:
            pytest.skip("native lib unavailable")
        p = str(tmp_path / "box.obj")
        write_box_obj(p, 0.03, 0.02, 0.015, center=(0.1, 0.0, 0.5))
        fit = (
            native.fit_obj(p) if use_native
            else native._fit_obj_python(p, 300.0)
        )
        assert fit.shape_type == native.BOX
        np.testing.assert_allclose(
            fit.half_extents, [0.03, 0.02, 0.015], atol=1e-5
        )
        np.testing.assert_allclose(fit.centroid, [0.1, 0.0, 0.5], atol=1e-5)
        expected_m = 300.0 * 8 * 0.03 * 0.02 * 0.015
        assert abs(fit.mass - expected_m) < 1e-5
        assert fit.n_vertices == 8

    def test_cylinder_fit(self, tmp_path, lib):
        if lib is None:
            pytest.skip("native lib unavailable")
        p = str(tmp_path / "cyl.obj")
        write_cylinder_obj(p, 0.02, 0.035)
        fit = native.fit_obj(p)
        assert fit.shape_type == native.CYLINDER
        np.testing.assert_allclose(
            fit.half_extents, [0.02, 0.02, 0.035], atol=1e-5
        )

    def test_sphere_fit(self, tmp_path, lib):
        if lib is None:
            pytest.skip("native lib unavailable")
        p = str(tmp_path / "sph.obj")
        write_sphere_obj(p, 0.02)
        fit = native.fit_obj(p)
        assert fit.shape_type == native.SPHERE
        # Empirical centroid of 80 random surface points shifts the
        # fitted radius slightly.
        assert abs(fit.half_extents[0] - 0.02) < 3e-3

    def test_native_matches_python_fallback(self, tmp_path, lib):
        if lib is None:
            pytest.skip("native lib unavailable")
        p = str(tmp_path / "b.obj")
        write_box_obj(p, 0.025, 0.01, 0.02)
        a = native.fit_obj(p)
        b = native._fit_obj_python(p, 300.0)
        assert a.shape_type == b.shape_type
        np.testing.assert_allclose(a.half_extents, b.half_extents, atol=1e-5)
        assert abs(a.mass - b.mass) < 1e-5

    def test_missing_file(self, lib):
        if lib is None:
            pytest.skip("native lib unavailable")
        with pytest.raises(FileNotFoundError):
            native.fit_obj("/nonexistent/mesh.obj")


class TestSphereCompound:
    def test_matches_device_scheme(self, lib):
        """Native compound == smg_tpu.physics.shapes.sphere_compound."""
        if lib is None:
            pytest.skip("native lib unavailable")
        import jax.numpy as jnp
        from smg_tpu.physics import shapes

        for st, he in [
            (native.BOX, np.array([0.03, 0.02, 0.015], np.float32)),
            (native.CYLINDER, np.array([0.02, 0.02, 0.035], np.float32)),
            (native.SPHERE, np.array([0.02, 0.02, 0.02], np.float32)),
        ]:
            offs_n, radii_n = native.sphere_compound_native(st, he)
            offs_j, radii_j = shapes.sphere_compound(
                jnp.asarray(st), jnp.asarray(he)
            )
            np.testing.assert_allclose(offs_n, np.asarray(offs_j), atol=1e-6)
            np.testing.assert_allclose(radii_n, np.asarray(radii_j), atol=1e-6)


class TestAsyncLog:
    def test_roundtrip(self, tmp_path, lib):
        if lib is None:
            pytest.skip("native lib unavailable")
        p = str(tmp_path / "run.bin")
        rows = [np.arange(7, dtype=np.float32) * i for i in range(50)]
        with native.AsyncBinaryLog(p) as log:
            for r in rows:
                log.append(r)
            deadline = time.time() + 5
            while log.rows_written < len(rows) and time.time() < deadline:
                time.sleep(0.01)
            assert log.rows_written == len(rows)
        back = native.read_binary_log(p)
        assert len(back) == len(rows)
        np.testing.assert_allclose(back[17], rows[17])


class TestMeshCatalog:
    def test_load_object_sets(self, tmp_path, lib):
        if lib is None:
            pytest.skip("native lib unavailable")
        for sub in ("enveloping", "sucking"):
            os.makedirs(tmp_path / sub)
        write_box_obj(str(tmp_path / "enveloping" / "bar.obj"), 0.03, 0.015, 0.015)
        write_cylinder_obj(str(tmp_path / "enveloping" / "can.obj"))
        write_box_obj(str(tmp_path / "sucking" / "plate.obj"), 0.025, 0.025, 0.008)
        # Non-obj files are ignored (robot.py:44-49).
        # The square plate must classify BOX, not cylinder (its 8 corner
        # vertices are equidistant in xy like circle samples).
        (tmp_path / "sucking" / "notes.txt").write_text("x")
        (g_types, g_he), (s_types, s_he) = meshes.load_object_sets(str(tmp_path))
        assert g_types.shape == (2,)
        assert g_types.tolist() == [native.BOX, native.CYLINDER]
        assert s_types.tolist() == [native.BOX]
        assert s_he[0, 2] == pytest.approx(0.008, abs=1e-5)
