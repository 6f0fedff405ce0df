"""Decision-level parity of the fast eval path on rendered scenes.

The trainer scores and computes DQN target values with the fused Pallas
eval trunk (fast_trunk.score_eval, fast_eval='auto') while the update
backprops through the Flax train-mode forward — a train/eval function
split the reference never had (it scores and backprops through the SAME
torch module, reference code/trainer.py:162,278; PARITY.md deviation
15). Tolerance tests on random-normal inputs bound elementwise error
but not what action selection actually consumes: the *ranking* of
per-object values. These tests pin, on real rendered production scenes
(hand-settled cluttered layouts through the production renderer,
segmentation and preprocessing — not random noise):

  (a) per-object value agreement between fast_trunk.score_eval and the
      Flax AffordanceNet.score eval oracle, relative to the oracle's
      own per-scene value spread (the resolution ranking requires), and
  (b) argmax-object agreement (the quantity that picks the action and
      the DQN bootstrap id) on every scene whose top-2 margin exceeds
      the numeric tolerance — i.e. the fast path must never flip a
      decision that is actually decided.

Oracle construction: He-init trunks at full DenseNet-121 depth map
different object masks to nearly identical scalars (measured spread
~1e-3 of a 0.015 output — ties at bf16 resolution), so decision checks
at plain init are vacuous. Conv kernels scaled 1.5x (with the alive
_rand_stats BN) give spread ~0.4 of a ~4.6 output without blowup
(2.0x explodes to 3.7e3, 3.0x to 4e11) — measured on these exact
rendered inputs.

Cost split: the fast-profile test runs backend='xla' (the packed-taps
grouped-prefix lowering — the same folded-BN affines, bf16 dtypes,
grouped dots and tap packing as the Pallas path, minus the kernel
plumbing) at XLA:CPU speed; the slow test runs the production 'xla_fl'
Pallas path in interpret mode; `scripts/decision_parity.py` runs the
compiled kernels at the production 224 shape on the real chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smg_tpu.envs import smg_env
from smg_tpu.models import fast_trunk
from smg_tpu.models.affordance import (
    DEPTH_MEAN, DEPTH_STD, AffordanceNet, ModelConfig,
)

from tests.test_fast_trunk import _rand_stats


def _pool224_to(depth_hm: jax.Array, s: int) -> jax.Array:
    """224 -> s by max-pooling k x k blocks (crop to s * k first).

    Max (not mean) keeps object tops at their true height — the signal
    PE/OO and the nets rank on."""
    k = 224 // s
    crop = depth_hm[: s * k, : s * k]
    return crop.reshape(s, k, s, k).max(axis=(1, 3))


_LAYOUTS = (
    # (shape, half_extents, (x, y), yaw) — hand-settled cluttered piles
    # across the workspace (x [-0.724,-0.276], y [-0.224,0.224]); resting
    # z = half-extent, the settled pose physics reset converges to.
    # Hand placement instead of reset(): identical rendered content, no
    # 250-step settle rollout in a CI test.
    (
        (0, (0.030, 0.018, 0.020), (-0.60, -0.10), 0.4),
        (1, (0.016, 0.016, 0.032), (-0.50, 0.05), 0.0),
        (0, (0.042, 0.014, 0.014), (-0.38, -0.05), 1.2),
        (2, (0.022, 0.022, 0.022), (-0.45, 0.15), 0.0),
        (0, (0.020, 0.020, 0.035), (-0.65, 0.12), 2.1),
    ),
    (
        (1, (0.020, 0.020, 0.025), (-0.42, -0.15), 0.0),
        (0, (0.035, 0.022, 0.016), (-0.55, -0.02), 2.6),
        (0, (0.015, 0.040, 0.018), (-0.33, 0.10), 0.9),
        (2, (0.018, 0.018, 0.018), (-0.62, 0.02), 0.0),
        (0, (0.025, 0.025, 0.028), (-0.48, 0.18), 1.7),
    ),
)


def _make_scene_objects(layout):
    from smg_tpu.core import rotation as rot
    from smg_tpu.physics import shapes
    from smg_tpu.physics.state import Objects

    obj = Objects.empty()
    for i, (st, he, (x, y), yaw) in enumerate(layout):
        he_a = jnp.asarray(he)
        st_a = jnp.asarray(st)
        m, inertia = shapes.mass_properties(st_a, he_a)
        off, rad = shapes.sphere_compound(st_a, he_a)
        obj = obj.replace(
            pos=obj.pos.at[i].set(jnp.asarray([x, y, float(he[2])])),
            quat=obj.quat.at[i].set(rot.quat_from_yaw(jnp.asarray(yaw))),
            shape_type=obj.shape_type.at[i].set(st_a),
            half_extents=obj.half_extents.at[i].set(he_a),
            active=obj.active.at[i].set(True),
            mass=obj.mass.at[i].set(m),
            inertia=obj.inertia.at[i].set(inertia),
            sph_offsets=obj.sph_offsets.at[i].set(off),
            sph_radii=obj.sph_radii.at[i].set(rad),
        )
    return obj


def _rendered_batch(n_scenes: int, s: int, top_k: int):
    """Real rendered scenes -> (cfg, scene_imgs (B,s,s,3), mask_imgs
    (B,K,s,s,3), valid (B,K)) at trunk resolution s, keeping the K
    largest-mask object slots (interpret-mode cost is per-image)."""
    from smg_tpu.physics.state import Scene

    objs = [_make_scene_objects(l) for l in _LAYOUTS[:n_scenes]]
    stack = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *objs)
    scenes = jax.vmap(
        lambda o: Scene.empty().replace(objects=o)
    )(stack)
    obs = jax.vmap(smg_env.observe)(scenes)
    masked = jax.vmap(smg_env.masked_scene_depth)(obs)

    mcfg = ModelConfig(method="reinforcement", input_size=s)
    prep = lambda d: jax.vmap(
        lambda x: jnp.stack([x, x, x], axis=-1)
    )((d - DEPTH_MEAN) / DEPTH_STD)  # preprocess_depth at size s

    scene_small = jax.vmap(_pool224_to, in_axes=(0, None))(masked, s)
    obj_depth = masked[:, None] * obs.seg.masks  # (B, N, 224, 224)
    B, N = obj_depth.shape[:2]
    obj_small = jax.vmap(_pool224_to, in_axes=(0, None))(
        obj_depth.reshape(B * N, 224, 224), s
    ).reshape(B, N, s, s)

    npx = np.asarray(obs.seg.masks.sum(axis=(2, 3)))
    order = np.argsort(-npx, axis=1)[:, :top_k]
    bidx = np.arange(B)[:, None]
    obj_small = obj_small[bidx, order]
    valid = np.asarray(obs.seg.valid)[bidx, order]

    scene_imgs = prep(scene_small)
    mask_imgs = jax.vmap(prep)(obj_small)
    return mcfg, scene_imgs, mask_imgs, valid


def _discriminative_params(mcfg: ModelConfig, seed: int = 33):
    # seed 33: both hand layouts produce decided rankings (top-2 margin
    # 0.094/0.188 >> the xla-backend's 0.038 max value err) — seeds were
    # surveyed because bf16-at-depth ties make some draws undecidable.
    """He-init x1.5 on conv kernels + alive _rand_stats (see module
    docstring for the measured spread justification)."""
    model = AffordanceNet(mcfg)
    variables = model.init(jax.random.PRNGKey(seed),
                           method=AffordanceNet.init_all)
    params = jax.tree_util.tree_map(
        lambda x: x * 1.5 if x.ndim == 4 else x, variables["params"]
    )
    stats = _rand_stats(variables["batch_stats"], jax.random.PRNGKey(seed + 1))
    return model, params, stats


def _check_decisions(ref, got, valid, tol_frac=0.25):
    """(a) value error small vs the oracle's object spread; (b) argmax
    agreement on every scene whose top-2 margin exceeds the error."""
    ref = np.asarray(ref, np.float32)[..., 0]
    got = np.asarray(got, np.float32)[..., 0]
    neg = np.where(valid, 0.0, -1e9)
    rv, gv = ref + neg, got + neg

    spread = rv.max(axis=1) - np.where(valid, ref, 1e9).min(axis=1)
    assert spread.max() > 0.05, f"degenerate oracle: spread {spread}"

    err = float(np.abs((got - ref) * valid).max())
    assert err < tol_frac * spread.max(), (
        f"per-object err {err:.4f} vs spread {spread.max():.4f}"
    )

    top2 = np.sort(rv, axis=1)
    margin = top2[:, -1] - top2[:, -2]
    decided = margin > 2 * err
    assert decided.any(), "no decided scene: test is vacuous"
    am_ref, am_got = np.argmax(rv, 1), np.argmax(gv, 1)
    assert (am_ref[decided] == am_got[decided]).all(), (
        f"argmax flip on decided scenes: ref {am_ref}, got {am_got}, "
        f"margin {margin}, err {err:.4f}"
    )


def test_decision_parity_xla_backend():
    """Fast-profile guard: rendered-scene decision parity of the grouped
    packed-taps lowering (the numerics family of the production path) vs
    the Flax oracle, full DenseNet-121, 64 px."""
    mcfg, scene_imgs, mask_imgs, valid = _rendered_batch(2, 64, top_k=5)
    model, params, stats = _discriminative_params(mcfg)
    ref = model.apply(
        {"params": params, "batch_stats": stats},
        scene_imgs, mask_imgs, 0, False, method=AffordanceNet.score,
    )
    got = fast_trunk.score_eval(
        params, stats, scene_imgs, mask_imgs, mcfg.num_out, backend="xla",
    )
    _check_decisions(ref, got, valid)


@pytest.mark.slow
def test_decision_parity_pallas_path():
    """The production 'xla_fl' Pallas path (interpret mode), same check."""
    mcfg, scene_imgs, mask_imgs, valid = _rendered_batch(1, 64, top_k=4)
    model, params, stats = _discriminative_params(mcfg)
    ref = model.apply(
        {"params": params, "batch_stats": stats},
        scene_imgs, mask_imgs, 0, False, method=AffordanceNet.score,
    )
    got = fast_trunk.score_eval(
        params, stats, scene_imgs, mask_imgs, mcfg.num_out,
        interpret=True, backend="xla_fl",
    )
    _check_decisions(ref, got, valid)
