"""Action scoring aggregation, arbitration and epsilon-greedy exploration.

The batched replacement for the reference's per-step selection block
(reference code/main.py:140-243):

- per-object grasp/suction confidences and per-pair ETS confidences become
  masked dense arrays over the fixed object slots (invalid slots -> -inf,
  invalid pairs -> -100 like gs_conf's fill at main.py:182);
- the arbitration rules are reproduced exactly, including the reactive
  method's 2x ETS bonus (main.py:221-233) and the 'grasp by the better
  enveloping candidate' pair ordering (main.py:196-201);
- exploration: p = max(0.5 * 0.9998^iter, 0.1) with decay, else 0.5
  (main.py:345), uniform over the available primitive set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

ACTION_SUCTION = 0  # executed_action_log code (main.py:368-370)
ACTION_GRASP = 1
ACTION_ETS = 2

NEG = -1e9


@struct.dataclass
class ActionChoice:
    """One scene's selected action (all fields defined even when unused)."""

    action: jax.Array        # () int32 ACTION_*
    grasp_obj: jax.Array     # () int32 slot to envelop
    grasp_rot: jax.Array     # () int32 rotation index
    suction_obj: jax.Array   # () int32 slot to suck
    suction_rot: jax.Array   # () int32 rotation index
    predicted_value: jax.Array  # () float
    explored: jax.Array      # () bool — this step was exploration
    best_pix: jax.Array      # (6,) [g_rot, g_row, g_col, s_rot, s_row, s_col]
    # Best-per-category bookkeeping for the delayed DQN labels
    # (main.py:410-418 prev_* carries).
    bestg_id: jax.Array      # (2,) [obj, rot]
    bests_id: jax.Array      # (2,) [obj, rot]
    bestgs_g_id: jax.Array   # (2,)
    bestgs_s_id: jax.Array   # (2,)
    bestgs_pair: jax.Array   # (2,) raw (i, j) argmax of the pair matrix
    bestg_conf: jax.Array    # ()
    bests_conf: jax.Array    # ()
    bestgs_conf: jax.Array   # ()
    exploit_action: jax.Array  # () int32 — the un-explored choice
    # (getvalue_variables['primitive_action'], main.py:206-233)


def explore_probability(iteration: jax.Array, decay: bool,
                        is_testing: bool) -> jax.Array:
    """Parity: reference main.py:78,345."""
    if is_testing:
        return jnp.asarray(0.0)
    if decay:
        return jnp.maximum(0.5 * jnp.power(0.9998, iteration), 0.1)
    return jnp.asarray(0.5)


def _masked_best(conf: jax.Array, valid: jax.Array):
    """(max, argmax-(obj,rot)) of an (N, R) score array under an (N,) mask."""
    masked = jnp.where(valid[:, None], conf, NEG)
    flat = jnp.argmax(masked)
    obj, rot = jnp.unravel_index(flat, conf.shape)
    return masked.max(), jnp.stack([obj, rot]).astype(jnp.int32)


def select_action(
    key: jax.Array,
    gra_conf: jax.Array,   # (N, R) grasp confidences / Q
    suc_conf: jax.Array,   # (N, R)
    gs_conf: jax.Array,    # (N, N) ETS pair scores (upper triangle used)
    valid: jax.Array,      # (N,) scoreable objects
    centers: jax.Array,    # (N, 2) mask centers (x, y) px for best_pix
    *,
    method: str = "reinforcement",
    is_ets: bool = False,
    is_testing: bool = False,
    explore_prob: jax.Array | float = 0.0,
) -> ActionChoice:
    """Pick the primitive + targets for one scene. vmap over scenes."""
    n = gra_conf.shape[0]
    num = valid.sum()

    bestg_conf, bestg_id = _masked_best(gra_conf, valid)
    bests_conf, bests_id = _masked_best(suc_conf, valid)
    gro_best = jnp.argmax(
        jnp.where(valid[:, None], gra_conf, NEG), axis=1
    ).astype(jnp.int32)
    sro_best = jnp.argmax(
        jnp.where(valid[:, None], suc_conf, NEG), axis=1
    ).astype(jnp.int32)
    gnu_best = jnp.where(valid, gra_conf.max(axis=1), NEG)

    # ETS pair matrix: i < j, both valid (reference fills -100, main.py:182).
    iu = jnp.triu_indices(n, k=1)
    pair_ok = valid[:, None] & valid[None, :] & (
        jnp.arange(n)[:, None] < jnp.arange(n)[None, :]
    )
    gs_masked = jnp.where(pair_ok, gs_conf, -100.0)
    flat = jnp.argmax(gs_masked)
    pi, pj = jnp.unravel_index(flat, gs_masked.shape)
    bestgs_conf = gs_masked.max()
    del iu
    # Grasp the pair member with the better enveloping score
    # (main.py:196-201).
    g_first = gnu_best[pi] > gnu_best[pj]
    gs_g_obj = jnp.where(g_first, pi, pj).astype(jnp.int32)
    gs_s_obj = jnp.where(g_first, pj, pi).astype(jnp.int32)
    bestgs_g_id = jnp.stack([gs_g_obj, gro_best[gs_g_obj]])
    bestgs_s_id = jnp.stack([gs_s_obj, sro_best[gs_s_obj]])

    ets_live = is_ets  # static python bool
    multi = num > 1

    # --- Exploit choice (getvalue_variables), main.py:205-233 ---
    if not ets_live:
        exploit = jnp.where(
            bests_conf > bestg_conf, ACTION_SUCTION, ACTION_GRASP
        )
    else:
        ets_score = 2.0 * bestgs_conf if method == "reactive" else bestgs_conf
        exploit_multi = jnp.where(
            bests_conf > jnp.maximum(bestg_conf, ets_score),
            ACTION_SUCTION,
            jnp.where(
                ets_score > jnp.maximum(bests_conf, bestg_conf),
                ACTION_ETS,
                ACTION_GRASP,
            ),
        )
        exploit_single = jnp.where(
            bests_conf > bestg_conf, ACTION_SUCTION, ACTION_GRASP
        )
        exploit = jnp.where(multi, exploit_multi, exploit_single)
    exploit = exploit.astype(jnp.int32)

    # --- Exploration (main.py:211-241) ---
    k_flip, k_act = jax.random.split(key)
    if is_testing:
        explored = jnp.asarray(False)
        action = exploit
    else:
        explored = jax.random.uniform(k_flip) < explore_prob
        n_choices = 3 if ets_live else 2
        rand_raw = jax.random.randint(k_act, (), 0, n_choices)
        # 0 -> suction, 1 -> grasp, 2 -> ets (main.py:215,238-239).
        rand_action = rand_raw
        if ets_live:
            rand_action = jnp.where(multi, rand_raw, rand_raw % 2)
        action = jnp.where(explored, rand_action.astype(jnp.int32), exploit)

    # --- Selected ids / predicted value / pixel tuple ---
    is_g = action == ACTION_GRASP
    is_s = action == ACTION_SUCTION
    grasp_obj = jnp.where(is_g, bestg_id[0], bestgs_g_id[0])
    grasp_rot = jnp.where(is_g, bestg_id[1], bestgs_g_id[1])
    suction_obj = jnp.where(is_s, bests_id[0], bestgs_s_id[0])
    suction_rot = jnp.where(is_s, bests_id[1], bestgs_s_id[1])
    predicted = jnp.where(
        is_g, bestg_conf, jnp.where(is_s, bests_conf, bestgs_conf)
    )

    cx = centers[:, 0].astype(jnp.int32)
    cy = centers[:, 1].astype(jnp.int32)
    zero = jnp.asarray(0, jnp.int32)
    # [g_rot, g_row, g_col, s_rot, s_row, s_col] (main.py:174-175,202).
    best_pix = jnp.where(
        is_g,
        jnp.stack([grasp_rot, cy[grasp_obj], cx[grasp_obj], zero, zero, zero]),
        jnp.where(
            is_s,
            jnp.stack(
                [zero, zero, zero, suction_rot, cy[suction_obj], cx[suction_obj]]
            ),
            jnp.stack(
                [grasp_rot, cy[grasp_obj], cx[grasp_obj],
                 suction_rot, cy[suction_obj], cx[suction_obj]]
            ),
        ),
    )

    return ActionChoice(
        action=action,
        grasp_obj=grasp_obj.astype(jnp.int32),
        grasp_rot=grasp_rot.astype(jnp.int32),
        suction_obj=suction_obj.astype(jnp.int32),
        suction_rot=suction_rot.astype(jnp.int32),
        predicted_value=predicted,
        explored=explored,
        best_pix=best_pix.astype(jnp.int32),
        bestg_id=bestg_id,
        bests_id=bests_id,
        bestgs_g_id=bestgs_g_id.astype(jnp.int32),
        bestgs_s_id=bestgs_s_id.astype(jnp.int32),
        bestgs_pair=jnp.stack([pi, pj]).astype(jnp.int32),
        bestg_conf=bestg_conf,
        bests_conf=bests_conf,
        bestgs_conf=bestgs_conf,
        exploit_action=exploit,
    )
