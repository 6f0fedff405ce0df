"""Parity tests: Pallas dense-block kernel + fast eval trunk vs Flax/XLA.

All run the kernel in interpret mode on CPU (tests/conftest.py). The
oracle is the Flax module applied in eval mode — the exact computation
the trainer's scoring path used before the fast path existed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from smg_tpu.models import fast_trunk
from smg_tpu.models.affordance import AffordanceNet, ModelConfig
from smg_tpu.models.densenet import DenseBlock, DenseNetTrunk, Transition
from smg_tpu.ops import dense_block_pallas as dbp


def _rand_stats(tree, key):
    """Replace init BatchNorm stats with random values that keep the
    relu chain ALIVE at full depth: uniform [0.25, 1.5] for everything
    (the original choice) makes b = bias - mean * a negative enough
    that 58 stacked relus zero all activations, turning full-trunk
    parity into a vacuous compare of the final BN's constant offset.
    Means stay near zero and biases slightly positive instead."""
    keys = jax.random.split(key, len(jax.tree_util.tree_leaves(tree)))
    it = iter(keys)

    def rand(path, leaf):
        k = next(it)
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "mean":
            return jax.random.uniform(k, leaf.shape, jnp.float32, -0.1, 0.1)
        if name == "var":
            return jax.random.uniform(k, leaf.shape, jnp.float32, 0.5, 1.5)
        if name == "scale":
            return jax.random.uniform(k, leaf.shape, jnp.float32, 0.5, 1.5)
        return jax.random.uniform(k, leaf.shape, jnp.float32, 0.05, 0.4)

    return jax.tree_util.tree_map_with_path(rand, tree)


def _depth_input(key, B, S):
    """Production-contract trunk input: a triplicated single channel
    (affordance.preprocess_depth), which the fast stem's gray-tap
    collapse requires for exactness."""
    g = jax.random.normal(key, (B, S, S, 1), jnp.float32)
    return jnp.repeat(g, 3, axis=-1)


class _BlockPlusTransition(nn.Module):
    num_layers: int
    c_out: int

    @nn.compact
    def __call__(self, x, train=False):
        x = DenseBlock(self.num_layers, 32, 4, name="block")(x, train)
        return Transition(self.c_out, name="trans")(x, train)


def _assert_close_l2(got, want, tol=0.02, name=""):
    """Relative L2 — the right metric for train-mode comparisons, where
    data-dependent BN chaotically amplifies bf16 rounding on a few
    elements (max-abs is dominated by relu-boundary outliers; the bulk
    agreement is what training dynamics see)."""
    got = np.asarray(got, np.float32).ravel()
    want = np.asarray(want, np.float32).ravel()
    err = float(np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-6))
    assert err < tol, f"{name}: rel L2 err {err:.4f}"


def _assert_close(got, want, tol=0.05, name=""):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    scale = max(1e-3, float(np.abs(want).max()))
    err = float(np.abs(got - want).max()) / scale
    assert err < tol, f"{name}: rel err {err:.4f} (scale {scale:.3f})"


def _make_block(key, H, W, C0, L, B=2):
    kx, kp, ks = jax.random.split(key, 3)
    x = jax.random.normal(kx, (B, H, W, C0), jnp.float32)
    mod = _BlockPlusTransition(L, (C0 + 32 * L) // 2)
    variables = mod.init(kp, x)
    stats = _rand_stats(variables["batch_stats"], ks)
    ref = mod.apply(
        {"params": variables["params"], "batch_stats": stats}, x
    )
    packed = dbp.pack_dense_block(
        variables["params"]["block"], stats["block"]
    )
    ep = dbp.pack_transition(variables["params"]["trans"], stats["trans"])
    return x, packed, ep, ref, (C0 + 32 * L) // 2


def test_block_kernel_whole_image():
    x, packed, ep, ref, c_out = _make_block(
        jax.random.PRNGKey(0), H=16, W=16, C0=128, L=4
    )
    geom = dbp.choose_geom(16, 16, 128, 4, "transition", c_out, x.shape[0])
    assert geom.TY == 1
    out = dbp.dense_block_apply(
        x.astype(jnp.bfloat16), packed, ep, geom, interpret=True
    )
    _assert_close(out, ref, name="whole-image block")


def test_block_kernel_taps_separate():
    x, packed, ep, ref, c_out = _make_block(
        jax.random.PRNGKey(1), H=8, W=8, C0=64, L=2
    )
    geom = dbp.choose_geom(8, 8, 64, 2, "transition", c_out, x.shape[0])
    out = dbp.dense_block_apply(
        x.astype(jnp.bfloat16), packed, ep, geom,
        taps_packed=False, interpret=True,
    )
    _assert_close(out, ref, name="separate-taps block")


def test_block_kernel_row_bands():
    """The halo path: row bands must equal the whole-image result."""
    x, packed, ep, ref, c_out = _make_block(
        jax.random.PRNGKey(2), H=16, W=8, C0=64, L=2, B=1
    )
    geom = dbp.BlockGeom(
        H=16, W=8, C0=64, L=2, B_tile=1, TY=2, chunk=4,
        epilogue="transition", C_out=c_out,
    )
    out = dbp.dense_block_apply(
        x.astype(jnp.bfloat16), packed, ep, geom, interpret=True
    )
    _assert_close(out, ref, name="row-band block")


def test_block_kernel_unaligned_width():
    """W not a sublane multiple: zero-pad columns + conv edge mask."""
    x, packed, ep, ref, c_out = _make_block(
        jax.random.PRNGKey(5), H=12, W=12, C0=128, L=4
    )
    geom = dbp.choose_geom(12, 12, 128, 4, "transition", c_out, x.shape[0])
    assert geom.W == 16 and geom.Wi == 12
    out = dbp.dense_block_apply(
        x.astype(jnp.bfloat16), packed, ep, geom, interpret=True
    )
    assert out.shape == ref.shape
    _assert_close(out, ref, name="unaligned-width block")


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["pallas", "xla", "xla_conv", "xla_pk", "xla_fl"])
def test_trunk_parity(backend):
    """Full DenseNet-121 trunk: Flax eval apply vs the fast-path forward."""
    key = jax.random.PRNGKey(3)
    kx, kp, ks = jax.random.split(key, 3)
    x = _depth_input(kx, 2, 64)
    trunk = DenseNetTrunk()
    variables = trunk.init(kp, x)
    stats = _rand_stats(variables["batch_stats"], ks)
    ref = trunk.apply({"params": variables["params"], "batch_stats": stats}, x)
    # Non-degenerate oracle: dead relu chains collapse ref to the final
    # BN's constant offset, which would pass parity for any trunk.
    assert float(np.asarray(ref, np.float32).std(axis=(0, 1, 2)).max()) > 1e-2
    got = fast_trunk.trunk_features_eval(
        variables["params"], stats, x, interpret=True, backend=backend
    )
    assert got.shape == ref.shape
    _assert_close(got, ref, name=f"densenet trunk [{backend}]")


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["pallas", "xla", "xla_conv", "xla_pk", "xla_fl"])
def test_score_eval_parity(backend):
    """score_eval == AffordanceNet.score (eval) end to end."""
    cfg = ModelConfig(method="reinforcement", input_size=64)
    model = AffordanceNet(cfg)
    key = jax.random.PRNGKey(4)
    kx, km, kp, ks = jax.random.split(key, 4)
    variables = model.init(kp, method=AffordanceNet.init_all)
    stats = _rand_stats(variables["batch_stats"], ks)
    scene = _depth_input(kx, 2, 64)
    masks = _depth_input(km, 6, 64).reshape(2, 3, 64, 64, 3)
    ref = model.apply(
        {"params": variables["params"], "batch_stats": stats},
        scene, masks, 0, False, method=AffordanceNet.score,
    )
    assert float(np.asarray(ref, np.float32).std()) > 1e-3
    got = fast_trunk.score_eval(
        variables["params"], stats, scene, masks, cfg.num_out,
        interpret=True, backend=backend,
    )
    assert got.shape == ref.shape
    _assert_close(got, ref, name=f"score_eval [{backend}]")


@pytest.mark.slow
@pytest.mark.parametrize("conv2", ["conv", "taps", "vjp", "pk"])
def test_score_train_parity_and_grads(conv2):
    """score_train == the Flax train-mode pipeline: outputs, mutated BN
    statistics, and parameter gradients — for the XLA-conv lowering, the
    packed-taps matmul lowering, and the hand-written custom-VJP layer
    (fast_train; minimal residuals + hand-transposed matmuls).

    Depth note: train-mode BN is data-dependent, so bf16 rounding is
    chaotically amplified with depth — at full DenseNet-121 depth the
    Flax path's OWN output moves by ~27% of scale under a 1e-6 input
    perturbation (below bf16 input resolution), so elementwise parity
    is only meaningful at reduced depth. This runs a (2, 2, 2, 2) trunk
    in float32 (chaos-free) through the exact score structure (two
    sequential trunk passes + head); test_trunk_train_full_depth_stats
    pins the stable observables at full depth and production dtype.
    """
    from smg_tpu.models.affordance import AffordanceHead

    key = jax.random.PRNGKey(6)
    kx, km, kp, kh, ks, ksh = jax.random.split(key, 6)
    scene = _depth_input(kx, 1, 64)
    masks = _depth_input(km, 4, 64).reshape(1, 4, 64, 64, 3)
    mask_flat = masks.reshape(4, 64, 64, 3)
    num_out = 3

    trunkmod = DenseNetTrunk(block_config=(2, 2, 2, 2), dtype=jnp.float32)
    tv = trunkmod.init(kp, scene)
    tp = tv["params"]
    tstats = _rand_stats(tv["batch_stats"], ks)
    feat_hw = 64 // 32
    c_final = tv["params"]["norm5"]["scale"].shape[0]
    headmod = AffordanceHead(num_out, feat_hw, dtype=jnp.float32)
    hv = headmod.init(kh, jnp.zeros((1, feat_hw, feat_hw, 2 * c_final)), True)
    hp = hv["params"]
    hstats = _rand_stats(hv["batch_stats"], ksh)

    def oracle(tp, hp):
        sf, m1 = trunkmod.apply(
            {"params": tp, "batch_stats": tstats}, scene, train=True,
            mutable=["batch_stats"],
        )
        mf, m2 = trunkmod.apply(
            {"params": tp, "batch_stats": m1["batch_stats"]}, mask_flat,
            train=True, mutable=["batch_stats"],
        )
        B, M = 1, 4
        h, w, c = sf.shape[1:]
        rep = jnp.broadcast_to(sf[:, None], (B, M, h, w, c)).reshape(
            B * M, h, w, c
        )
        both = jnp.concatenate([rep, mf.astype(rep.dtype)], axis=-1)
        out, mh = headmod.apply(
            {"params": hp, "batch_stats": hstats}, both, True,
            mutable=["batch_stats"],
        )
        return (
            out.reshape(B, M, num_out),
            m2["batch_stats"], mh["batch_stats"],
        )

    ref_out, ref_ts, ref_hs = oracle(tp, hp)
    assert float(np.asarray(ref_out, np.float32).std()) > 1e-3

    params = {"grasp_trunk": tp, "grasp_head": hp}
    stats = {"grasp_trunk": tstats, "grasp_head": hstats}
    got_out, got_mut = fast_trunk.score_train(
        params, stats, scene, masks, num_out, dtype=jnp.float32,
        conv2=conv2,
    )
    _assert_close_l2(got_out, ref_out, tol=2e-3, name="score_train out")

    for mod, ref_tree in (("grasp_trunk", ref_ts), ("grasp_head", ref_hs)):
        flat_r = {"/".join(str(p) for p in k): v
                  for k, v in
                  jax.tree_util.tree_flatten_with_path(ref_tree)[0]}
        flat_g = {"/".join(str(p) for p in k): v
                  for k, v in
                  jax.tree_util.tree_flatten_with_path(got_mut[mod])[0]}
        assert flat_r.keys() == flat_g.keys(), (
            mod, sorted(flat_r)[:4], sorted(flat_g)[:4])
        for k in flat_r:
            _assert_close(flat_g[k], flat_r[k], name=f"stats {mod}/{k}")

    def loss_ref(p):
        out, _, _ = oracle(p["grasp_trunk"], p["grasp_head"])
        return jnp.sum(out ** 2)

    def loss_fast(p):
        out, _ = fast_trunk.score_train(
            p, stats, scene, masks, num_out, dtype=jnp.float32,
            conv2=conv2,
        )
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_fast = jax.grad(loss_fast)(params)
    for mod in ("grasp_trunk", "grasp_head"):
        flat_r = jax.tree_util.tree_flatten_with_path(g_ref[mod])[0]
        flat_g = {"/".join(str(p) for p in k): v
                  for k, v in
                  jax.tree_util.tree_flatten_with_path(g_fast[mod])[0]}
        # Global scale floor: leaves whose TRUE gradient is ~zero (e.g.
        # norm5/bias — a bias shift is annihilated by the head BN's
        # batch-mean subtraction) otherwise blow up the relative metric
        # on rounding noise.
        gmax = max(
            float(np.linalg.norm(np.asarray(v, np.float32)))
            for _, v in flat_r
        )
        for k, v in flat_r:
            kk = "/".join(str(p) for p in k)
            r = np.asarray(v, np.float32).ravel()
            g = np.asarray(flat_g[kk], np.float32).ravel()
            err = float(
                np.linalg.norm(g - r)
                / max(np.linalg.norm(r), 1e-3 * gmax)
            )
            assert err < 5e-3, f"grad {mod}/{kk}: rel L2 err {err:.4f}"


@pytest.mark.slow
def test_trunk_train_full_depth_stats():
    """Full DenseNet-121 train forward: the mutated BN statistics of the
    stem and every block-1 layer match Flax to float tolerance (the
    stable observables at full depth — see the chaos note above)."""
    key = jax.random.PRNGKey(6)
    kx, kp, ks = jax.random.split(key, 3)
    x = _depth_input(kx, 2, 64)
    trunk = DenseNetTrunk()
    variables = trunk.init(kp, x)
    stats = _rand_stats(variables["batch_stats"], ks)
    ref, mut = trunk.apply(
        {"params": variables["params"], "batch_stats": stats}, x,
        train=True, mutable=["batch_stats"],
    )
    got, new_ts = fast_trunk.trunk_features_train(
        variables["params"], stats, x
    )
    assert got.shape == ref.shape
    rmut = mut["batch_stats"]
    _assert_close(new_ts["norm0"]["mean"], rmut["norm0"]["mean"],
                  tol=0.001, name="norm0 mean")
    _assert_close(new_ts["norm0"]["var"], rmut["norm0"]["var"],
                  tol=0.001, name="norm0 var")
    for n, sub in rmut["denseblock1"].items():
        for nm in ("norm1", "norm2"):
            for st in ("mean", "var"):
                _assert_close(
                    new_ts["denseblock1"][n][nm][st], sub[nm][st],
                    tol=0.005, name=f"db1 {n}/{nm}/{st}",
                )
