"""The batched SMG environment: observe -> geometry -> execute -> predicates.

This module is the Robot-API equivalent of the reference's `robot.py` +
the per-step glue in `main.py`, as pure functions over `Scene` pytrees:

- `observe`            camera + segmentation front-end (robot.get_camera_data
                       + utils.get_heightmap + masks.instance_segmentation)
- `compute_geometry`   PE / OO post-processing incl. the ETS re-run that
                       excludes the grasped object (main.py:245-294)
- `execute`            the unified primitive executor (robot.grasp_first /
                       suction_first / grasp_then_suction dispatch,
                       main.py:384-396)
- termination predicates (main.py:106,121) and the check_sim recovery
  semantics (robot.py:207-215)

Everything vmaps over scenes and jits end-to-end.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import struct

from smg_tpu.envs import primitives as prim
from smg_tpu.perception import segment as seg_mod
from smg_tpu.physics import scene as scene_mod
from smg_tpu.physics import stepper
from smg_tpu.physics.state import Scene
from smg_tpu.policy import action_geom as ag
from smg_tpu.policy.arbitrate import (
    ACTION_ETS,
    ACTION_GRASP,
    ACTION_SUCTION,
    ActionChoice,
)
from smg_tpu.render import ortho


@dataclass(frozen=True)
class EnvConfig:
    """Setup + algorithm flags (reference main.py:425-443)."""

    is_cluttered: bool = False
    is_testing: bool = False
    is_ets: bool = False
    is_pe: bool = False
    is_oo: bool = False
    method: str = "reinforcement"
    step_limit: int = 20           # --step (main.py:449)
    max_episode_success: int = 10  # main.py:121
    no_change_limit: int = 3       # main.py:121
    settle_steps: int = 250
    # Segmentation front-end: "exact" uses the renderer's id-buffers;
    # "learned" runs the trained SlotSegmenter on the color+depth
    # heightmaps (the Mask-R-CNN-parity path, reference masks.py:97).
    segmentation: str = "exact"
    # Object set (--obj_mesh_dir, reference robot.py:36-49). A directory
    # with enveloping/ + sucking/ .obj subdirs is ingested through the
    # native mesh fitter; the sentinel names datasets/training and
    # datasets/testing (the reference's own paths, absent here: the
    # dataset blob is a missing LFS pointer) select the matching
    # procedural catalog. "" falls back to is_testing's catalog.
    obj_mesh_dir: str = ""


@functools.lru_cache(maxsize=8)
def resolve_catalogs(cfg: EnvConfig):
    """The --obj_mesh_dir to catalog mapping (host-side, cached)."""
    d = cfg.obj_mesh_dir
    if d and os.path.isdir(os.path.join(d, "enveloping")):
        from smg_tpu.utils import meshes

        return meshes.load_object_sets(d)
    if d and os.path.basename(os.path.normpath(d)) not in (
        "training", "testing"
    ):
        raise FileNotFoundError(
            f"--obj_mesh_dir {d!r}: no enveloping/ + sucking/ .obj dirs, "
            "and not a datasets/{training,testing} sentinel"
        )
    testing = (
        os.path.basename(os.path.normpath(d)) == "testing" if d
        else cfg.is_testing
    )
    return scene_mod.default_catalogs(testing)


@struct.dataclass
class Observation:
    depth_hm: jax.Array    # (224, 224) valid_depth_heightmap
    color_hm: jax.Array    # (224, 224, 3)
    seg: seg_mod.Segmentation


@struct.dataclass
class Geometry:
    grasp_position: jax.Array    # (3,)
    grasp_angle: jax.Array       # ()
    open_distance: jax.Array     # ()
    suction_position: jax.Array  # (3,)
    suction_angle: jax.Array     # ()


@struct.dataclass
class StepOutcome:
    suction_success: jax.Array   # () float 0/1
    grasp_success: jax.Array     # () float 0/1
    gs_success: jax.Array        # () float {0, 0.5, 2.5}
    # Servo divergence: distance between the gripper's pose after the
    # primitive and its final phase target. The analog of the reference's
    # tip-target IK check (main.py:119-121 tt_distance > 0.01 sq-meters
    # ends the episode): a phase budget too short for the commanded
    # travel, or a jam against the pile, shows up here.
    tip_divergence: jax.Array = 0.0   # () float meters

    @property
    def any_success(self) -> jax.Array:
        return (
            (self.suction_success > 0)
            | (self.grasp_success > 0)
            | (self.gs_success > 0)
        )


def reset(key: jax.Array, cfg: EnvConfig) -> Scene:
    """One fresh episode scene (vmap over keys for a batch)."""
    return scene_mod.reset_scene(
        key, cfg.is_cluttered, cfg.is_testing, cfg.settle_steps,
        catalogs=resolve_catalogs(cfg),
    )


def observe(scene: Scene, seg_fn=None) -> Observation:
    """Render + segment. The masked scene depth (valid_depth_heightmap_a,
    main.py:137-151) equals our depth map restricted to object pixels.

    `seg_fn(color_hm, depth_hm) -> Segmentation` replaces the exact
    id-buffer path with a learned front-end (the Mask-R-CNN analog,
    reference main.py:139); None keeps the exact path.
    """
    depth, ids, color = ortho.render_heightmap(scene.objects)
    if seg_fn is None:
        seg = seg_mod.segment(scene.objects, ids)
    else:
        seg = seg_fn(color, depth)
    return Observation(depth_hm=depth, color_hm=color, seg=seg)


def masked_scene_depth(obs: Observation) -> jax.Array:
    """valid_depth_heightmap_a: scene depth zeroed off the object union
    (main.py:145-151)."""
    union = obs.seg.masks.any(axis=0)
    return jnp.where(union, obs.depth_hm, 0.0)


def compute_geometry(
    choice: ActionChoice, obs: Observation, cfg: EnvConfig
) -> Geometry:
    """PE + OO for the selected targets (main.py:245-294)."""
    seg = obs.seg
    depth = obs.depth_hm

    g_pos, g_angle, open_d = ag.pe_grasp_geometry(
        seg.box_corners[choice.grasp_obj], depth, is_pe=cfg.is_pe
    )

    # OO validity: for ETS with > 2 objects the grasped object is excluded
    # from the occlusion map (main.py:277-292); with exactly 2 the angle is
    # forced 0 (main.py:293-294).
    n = seg.number
    is_ets_act = choice.action == ACTION_ETS
    oo_valid = seg.valid & ~(
        is_ets_act & (n > 2)
        & (jnp.arange(seg.valid.shape[0]) == choice.grasp_obj)
    )
    s_pos, s_angle = ag.oo_suction_angle(
        choice.suction_obj, seg.centers, seg.box_corners, oo_valid, depth,
        is_oo=cfg.is_oo,
    )
    s_angle = jnp.where(is_ets_act & (n == 2), 0.0, s_angle)

    return Geometry(
        grasp_position=g_pos,
        grasp_angle=g_angle,
        open_distance=open_d,
        suction_position=s_pos,
        suction_angle=s_angle,
    )


def execute(
    scene: Scene, choice: ActionChoice, geom: Geometry,
    p: prim.PrimitiveParams = prim.DEFAULT,
) -> tuple[Scene, StepOutcome]:
    """Unified primitive executor (main.py:384-396 dispatch).

    One compiled program serves all three primitives: the envelop stage
    runs for grasp/ETS scenes, the suction stage for suction/ETS scenes;
    disabled stages hold the gripper in place (so a vmapped batch with
    mixed actions costs one program, not a 3-way `switch` that triples the
    physics work under vmap).
    """
    is_g = choice.action == ACTION_GRASP
    is_s = choice.action == ACTION_SUCTION
    is_e = choice.action == ACTION_ETS

    scene, g_succ, reached_curl = prim.grasp(
        scene, geom.open_distance, geom.grasp_position, geom.grasp_angle,
        p, enabled=is_g | is_e,
    )
    # Suction finger posture: full close for plain suction; for ETS keep
    # holding on success else the reached angle (robot.py:424-428,517).
    finger_angle = jnp.where(
        is_s, 1.0, jnp.where(g_succ > 0, 0.0, reached_curl)
    )
    scene, s_succ = prim.suction(
        scene, geom.suction_position, geom.suction_angle, finger_angle,
        p, enabled=is_s | is_e,
    )
    scene = prim._teleport_out_lifted(scene, enabled=is_s | is_e)
    scene = prim._finish(scene, p)

    gs_reward = jnp.where(
        (g_succ > 0) & (s_succ > 0), 2.5,
        jnp.where((g_succ > 0) | (s_succ > 0), 0.5, 0.0),
    )
    # Final phase target: the grasp hover point for grasp-only scenes,
    # the suction hover point when the suction stage ran.
    _, _, _, g_above, _ = prim.grasp_stage_params(
        geom.open_distance, geom.grasp_position, geom.grasp_angle
    )
    _, _, _, _, _, s_above = prim.suction_stage_params(
        scene.gripper.curl, geom.suction_position, geom.suction_angle,
        finger_angle,
    )
    expect = jnp.where(is_g, g_above, s_above)
    outcome = StepOutcome(
        suction_success=jnp.where(is_s, s_succ, 0.0),
        grasp_success=jnp.where(is_g, g_succ, 0.0),
        gs_success=jnp.where(is_e, gs_reward, 0.0),
        tip_divergence=jnp.linalg.norm(scene.gripper.pos - expect),
    )
    return scene, outcome


def ik_ok(scene: Scene, tol: float = 0.01) -> jax.Array:
    """Workspace-stability half of the episode health check
    (robot.py:207-215). The tip-target divergence half of the reference's
    check (main.py:119-121 tt_distance) is `StepOutcome.tip_divergence`,
    measured against the executed primitive's final phase target; the
    loop combines both (train/loop.py).
    """
    return stepper.sim_stable(scene.gripper) | jnp.asarray(False)


def episode_done(
    objects_number: jax.Array,
    no_change_count: jax.Array,   # (2,) [grasp-ish, suction]
    sim_ok: jax.Array,
    episode_succ: jax.Array,
    episode_iter: jax.Array,
    cfg: EnvConfig,
) -> jax.Array:
    """Episode termination predicate (main.py:106,121).

    The reference additionally guards the no-change cutoff with "and the
    previous action failed"; the counters here reset to zero on success,
    so no_change.sum() > limit already implies it.
    """
    return (
        (objects_number == 0)
        | (no_change_count.sum() > cfg.no_change_limit)
        | ~sim_ok
        | (episode_succ >= cfg.max_episode_success)
        | (episode_iter >= cfg.step_limit)
    )
