"""Batched primitive execution over the Pallas fast stepper.

`smg_env.execute` runs the unified primitive program per scene under vmap —
readable, but its physics phases then use the layout-poor vmapped stepper.
This module re-orchestrates the SAME program batched-first: the per-scene
stage scalars (targets, curls, captures, rewards) reuse the primitives'
shared helpers under vmap (tiny work), while every physics phase rolls
through `stepper.run_steps_batched` — the scene-minor SoA path whose
pairwise contact sweep is the Pallas kernel. Semantically equivalent to
`vmap(smg_env.execute)` (tested); ~20x faster physics at production batch
sizes.

Requires batch size % 128 == 0 on TPU (the kernel's lane tiling); any
batch works with interpret=True.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from smg_tpu.envs import primitives as prim
from smg_tpu.envs.smg_env import Geometry, StepOutcome
from smg_tpu.physics import stepper
from smg_tpu.physics.state import (
    ATTACHED_GRASP,
    ATTACHED_SUCTION,
    LIFT_SUCCESS_Z,
    Gripper,
    Scene,
)
from smg_tpu.policy.arbitrate import (
    ACTION_ETS,
    ACTION_GRASP,
    ACTION_SUCTION,
    ActionChoice,
)


def _run_phase(scenes: Scene, targets: Gripper, n: int,
               p: prim.PrimitiveParams, interpret: bool) -> Scene:
    return stepper.run_steps_batched(scenes, targets, n, p.stepper,
                                     interpret)


def execute_batched(
    scenes: Scene,
    choice: ActionChoice,
    geom: Geometry,
    p: prim.PrimitiveParams = prim.DEFAULT,
    interpret: bool = False,
) -> tuple[Scene, StepOutcome]:
    """Batched equivalent of vmap(smg_env.execute)."""
    is_g = choice.action == ACTION_GRASP
    is_s = choice.action == ACTION_SUCTION
    is_e = choice.action == ACTION_ETS
    en1 = is_g | is_e   # envelop stage enabled
    en2 = is_s | is_e   # suction stage enabled

    # ---- Envelop stage ----
    hold1 = scenes.gripper
    tool_yaw, pre_curl, final_curl, above, down = jax.vmap(
        prim.grasp_stage_params
    )(geom.open_distance, geom.grasp_position, geom.grasp_angle)
    zero_tilt = jnp.zeros_like(hold1.tilt)

    def gated(pos, yaw, tilt, curl):
        return jax.vmap(prim.gate_target)(
            Gripper(pos=pos, yaw=yaw, tilt=tilt, curl=curl), hold1, en1
        )

    zero_curl = jnp.zeros_like(pre_curl)
    scenes = _run_phase(scenes, gated(above, tool_yaw, zero_tilt, zero_curl),
                        p.steps_move_above, p, interpret)
    scenes = _run_phase(scenes, gated(above, tool_yaw, zero_tilt, pre_curl),
                        p.steps_preclose, p, interpret)
    scenes = _run_phase(scenes, gated(down, tool_yaw, zero_tilt, pre_curl),
                        p.steps_descend, p, interpret)
    scenes = _run_phase(scenes, gated(down, tool_yaw, zero_tilt, final_curl),
                        p.steps_squeeze, p, interpret)

    cap = jax.vmap(prim._envelop_capture_mask)(scenes, pre_curl, final_curl)
    cap = cap & en1[:, None]
    scenes = scenes.replace(
        objects=jax.vmap(stepper.attach, in_axes=(0, 0, 0, None))(
            scenes.objects, scenes.gripper, cap,
            jnp.asarray(ATTACHED_GRASP),
        )
    )
    scenes = _run_phase(scenes, gated(above, tool_yaw, zero_tilt, final_curl),
                        p.steps_lift, p, interpret)
    obj = scenes.objects
    lifted = (
        obj.on_table
        & (obj.attached == ATTACHED_GRASP)
        & (obj.pos[..., 2] > LIFT_SUCCESS_Z)
    )
    g_succ = (lifted.any(axis=1) & en1).astype(jnp.float32)
    scenes = jax.vmap(prim._teleport_out_lifted)(scenes, en1)

    # ---- Suction stage ----
    finger_angle = jnp.where(
        is_s, 1.0, jnp.where(g_succ > 0, 0.0, final_curl)
    )
    hold2 = scenes.gripper
    pad_id, s_yaw, tilt, s_curl, touch, s_above = jax.vmap(
        prim.suction_stage_params
    )(scenes.gripper.curl, geom.suction_position, geom.suction_angle,
      finger_angle)

    def gated2(pos, yaw, tl, curl):
        return jax.vmap(prim.gate_target)(
            Gripper(pos=pos, yaw=yaw, tilt=tl, curl=curl), hold2, en2
        )

    scenes = _run_phase(scenes, gated2(s_above, s_yaw, zero_tilt, s_curl),
                        p.steps_move_above, p, interpret)
    scenes = _run_phase(scenes, gated2(s_above, s_yaw, tilt, s_curl),
                        p.steps_pad_align, p, interpret)
    scenes = _run_phase(scenes, gated2(touch, s_yaw, tilt, s_curl),
                        p.steps_descend, p, interpret)
    cap2 = jax.vmap(prim._suction_capture_mask)(scenes, pad_id)
    cap2 = cap2 & en2[:, None]
    s_succ = cap2.any(axis=1).astype(jnp.float32)
    scenes = scenes.replace(
        objects=jax.vmap(stepper.attach, in_axes=(0, 0, 0, None))(
            scenes.objects, scenes.gripper, cap2,
            jnp.asarray(ATTACHED_SUCTION),
        )
    )
    scenes = _run_phase(scenes, gated2(s_above, s_yaw, zero_tilt, s_curl),
                        p.steps_lift, p, interpret)
    scenes = jax.vmap(prim._teleport_out_lifted)(scenes, en2)

    # ---- Finish: detach, resurrect, open (per-scene epilogue, batched) ----
    objs = jax.vmap(
        lambda o: stepper.resurrect_fallen(stepper.detach_all(o))
    )(scenes.objects)
    scenes = scenes.replace(objects=objs)
    open_tgt = scenes.gripper.replace(curl=jnp.zeros_like(scenes.gripper.curl))
    scenes = _run_phase(scenes, open_tgt, p.steps_finish, p, interpret)

    gs_reward = jnp.where(
        (g_succ > 0) & (s_succ > 0), 2.5,
        jnp.where((g_succ > 0) | (s_succ > 0), 0.5, 0.0),
    )
    expect = jnp.where(is_g[:, None], above, s_above)
    outcome = StepOutcome(
        suction_success=jnp.where(is_s, s_succ, 0.0),
        grasp_success=jnp.where(is_g, g_succ, 0.0),
        gs_success=jnp.where(is_e, gs_reward, 0.0),
        tip_divergence=jnp.linalg.norm(
            scenes.gripper.pos - expect, axis=-1
        ),
    )
    return scenes, outcome
