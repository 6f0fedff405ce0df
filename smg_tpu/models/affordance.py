"""Two-stream affordance networks: reactive (3-class) and DQN (scalar Q).

Re-design of the reference's `reactive_net` / `reinforcement_net`
(reference code/models.py:15-297, 301-587):

- three trunks, one per action style — suction / grasp (envelop) /
  grasp-then-suction (models.py:22-24);
- two streams per evaluation: the full scene depth-heightmap and the
  object-masked depth-heightmap, trunk features concatenated to 2048
  channels (models.py:97,120,143);
- a head per style: BN -> ReLU -> 1x1 conv(64) -> BN -> ReLU -> global
  spatial conv collapsing to 3 class logits (reactive, models.py:28-55) or
  1 Q value (reinforcement, models.py:316-343).

TPU-first differences (documented, all parity-neutral or parity-fixing):
- the scene-stream trunk features are computed ONCE per (scene, style) and
  broadcast across objects — the reference recomputed the identical scene
  pass for every object (models.py:96 inside the per-object loop);
- object slots are batched dense with validity masks instead of Python
  loops (main.py:158-192);
- the reference's style-2 head reuses `suctionnet_val` weights, leaving
  `gsnet_val` dead (models.py:144,218,293); here `tied_ets_head=True`
  reproduces that behavior and False gives the ETS head its own weights;
- normalization uses a real depth std (the reference divides by
  image_std=[0,0,0], trainer.py:176-185 — a latent div-by-zero).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from flax import linen as nn

from smg_tpu.models.densenet import BN_MOMENTUM, make_trunk

# Depth normalization (reference trainer.py:176-185 intended mean/std; the
# ancestor VPG codebase used std = 0.03 for depth channels).
DEPTH_MEAN = 0.02
DEPTH_STD = 0.03

STYLE_GRASP = 0
STYLE_SUCTION = 1
STYLE_ETS = 2


@dataclass(frozen=True)
class ModelConfig:
    method: str = "reinforcement"  # 'reactive' | 'reinforcement'
    trunk: str = "densenet121"      # 'densenet121' | 'tiny'
    input_size: int = 640           # 224 ->(x2 zoom) 448 ->(rot pad) 640
    num_rotations: int = 1          # reference gnum/snum_rotations = 1
    tied_ets_head: bool = True      # reference models.py:144 quirk
    dtype: str = "bfloat16"

    @property
    def num_out(self) -> int:
        return 3 if self.method == "reactive" else 1

    @property
    def feature_hw(self) -> int:
        return self.input_size // 32

    @property
    def jdtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


class AffordanceHead(nn.Module):
    """BN -> ReLU -> 1x1 conv(64) -> BN -> ReLU -> global conv(num_out).

    Parity: the *net_val Sequentials (reference models.py:28-55,316-343);
    the final 20x20 'VALID' conv over the 20x20 feature map is a global
    spatial collapse.
    """

    num_out: int
    feature_hw: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.BatchNorm(
            momentum=BN_MOMENTUM, use_running_average=not train, dtype=self.dtype, name="norm0"
        )(x)
        h = nn.relu(h)
        h = nn.Conv(
            64, (1, 1), use_bias=False, dtype=self.dtype, name="conv0"
        )(h)
        h = nn.BatchNorm(
            momentum=BN_MOMENTUM, use_running_average=not train, dtype=self.dtype, name="norm1"
        )(h)
        h = nn.relu(h).astype(self.dtype)
        h = nn.Conv(
            self.num_out, (self.feature_hw, self.feature_hw),
            padding="VALID", use_bias=False, dtype=self.dtype, name="conv1",
        )(h)
        return h.reshape(h.shape[0], self.num_out).astype(jnp.float32)


class AffordanceNet(nn.Module):
    """The full three-style two-stream affordance model."""

    cfg: ModelConfig = field(default_factory=ModelConfig)

    def setup(self):
        dt = self.cfg.jdtype
        self.suction_trunk = make_trunk(self.cfg.trunk, dt)
        self.grasp_trunk = make_trunk(self.cfg.trunk, dt)
        self.gs_trunk = make_trunk(self.cfg.trunk, dt)
        self.suction_head = AffordanceHead(
            self.cfg.num_out, self.cfg.feature_hw, dt
        )
        self.grasp_head = AffordanceHead(
            self.cfg.num_out, self.cfg.feature_hw, dt
        )
        # gsnet_val exists either way (checkpoint-compatible); whether it is
        # *used* depends on tied_ets_head.
        self.gs_head = AffordanceHead(
            self.cfg.num_out, self.cfg.feature_hw, dt
        )

    def _trunk(self, style: int):
        return (self.grasp_trunk, self.suction_trunk, self.gs_trunk)[style]

    def _head(self, style: int):
        if style == STYLE_ETS and self.cfg.tied_ets_head:
            return self.suction_head  # reference models.py:144
        return (self.grasp_head, self.suction_head, self.gs_head)[style]

    def score(
        self,
        scene_img: jax.Array,   # (B, S, S, 3) preprocessed scene stream
        mask_imgs: jax.Array,   # (B, M, S, S, 3) preprocessed masked streams
        style: int,
        train: bool = False,
    ) -> jax.Array:
        """Scores (B, M, num_out): scene features shared across M objects."""
        B, M = mask_imgs.shape[0], mask_imgs.shape[1]
        trunk = self._trunk(style)
        mask_flat = mask_imgs.reshape((B * M,) + mask_imgs.shape[2:])
        if train:
            # Train mode keeps the reference's per-stream BN statistics
            # (models.py:96: separate trunk passes per stream).
            scene_feat = trunk(scene_img, train)          # (B, h, w, 1024)
            mask_feat = trunk(mask_flat, train)            # (B*M, h, w, 1024)
        else:
            # Eval mode (running-average BN): one trunk call over both
            # streams — identical math, but B + B*M examples per conv
            # instead of two small launches, so the MXU sees full tiles
            # even at scene-batch 1.
            feats = trunk(
                jnp.concatenate([scene_img, mask_flat], axis=0), train
            )
            scene_feat, mask_feat = feats[:B], feats[B:]
        h, w, c = scene_feat.shape[1:]
        scene_rep = jnp.broadcast_to(
            scene_feat[:, None], (B, M, h, w, c)
        ).reshape(B * M, h, w, c)
        both = jnp.concatenate(
            [scene_rep, mask_feat.astype(scene_rep.dtype)], axis=-1
        )                                                  # (B*M, h, w, 2048)
        out = self._head(style)(both, train)               # (B*M, num_out)
        return out.reshape(B, M, self.cfg.num_out)

    def __call__(self, scene_img, mask_img, style: int = 0, train: bool = False):
        """Single-pair forward (the reference's minibatch-of-1 interface)."""
        return self.score(
            scene_img[None] if scene_img.ndim == 3 else scene_img,
            mask_img[None, None] if mask_img.ndim == 3 else mask_img,
            style,
            train,
        )

    def init_all(self):
        """Create every parameter cheaply.

        Trunk parameters are independent of the input spatial size, so
        trunks initialize on a small 64x64 probe; heads initialize on a
        synthetic feature map at the real feature_hw (their global conv
        kernel depends on it). Keeps init compile seconds instead of
        minutes at 640x640.
        """
        probe = jnp.zeros((1, 64, 64, 3), jnp.float32)
        for trunk in (self.grasp_trunk, self.suction_trunk, self.gs_trunk):
            trunk(probe, False)
        feat = jnp.zeros(
            (1, self.cfg.feature_hw, self.cfg.feature_hw, 2048),
            self.cfg.jdtype,
        )
        for head in (self.grasp_head, self.suction_head, self.gs_head):
            head(feat, False)
        return None


# ---------------------------------------------------------------------------
# Preprocessing (reference trainer.forward, trainer.py:162-191)
# ---------------------------------------------------------------------------


def preprocess_depth(depth_hm: jax.Array, cfg: ModelConfig) -> jax.Array:
    """224 depth heightmap -> (S, S, 3) normalized trunk input.

    input_size >= 448 follows the reference pipeline (trainer.py:165-185):
    2x nearest zoom to 448, zero-pad to `input_size` (the rotation safety
    margin ceil(448*sqrt(2)/32)*32 = 640), channel triplication,
    normalization. input_size == 224 skips the zoom/pad — the nearest zoom
    adds no information, so this is the TPU-fast mode with ~8x fewer
    trunk FLOPs and identical content.
    """
    if cfg.input_size >= 448:
        x = jnp.repeat(jnp.repeat(depth_hm, 2, axis=0), 2, axis=1)  # 448
        pad = (cfg.input_size - x.shape[0]) // 2
        if pad > 0:
            x = jnp.pad(x, ((pad, pad), (pad, pad)))
    else:
        assert cfg.input_size == depth_hm.shape[0], (
            cfg.input_size, depth_hm.shape,
        )
        x = depth_hm
    x = (x - DEPTH_MEAN) / DEPTH_STD
    return jnp.stack([x, x, x], axis=-1)


def rotate_image_nearest(img: jax.Array, theta: jax.Array) -> jax.Array:
    """Rotate (S, S, C) image about its center by theta (nearest sampling).

    The in-network rotation of the reference (affine_grid + grid_sample,
    models.py:85-93); used when cfg.num_rotations > 1.
    """
    S = img.shape[0]
    c = (S - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(S), jnp.arange(S), indexing="ij")
    xs = (xx - c) * jnp.cos(theta) + (yy - c) * jnp.sin(theta) + c
    ys = -(xx - c) * jnp.sin(theta) + (yy - c) * jnp.cos(theta) + c
    xi = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, S - 1)
    yi = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, S - 1)
    out = img[yi, xi]
    valid = (xs >= 0) & (xs <= S - 1) & (ys >= 0) & (ys <= S - 1)
    return jnp.where(valid[..., None] if img.ndim == 3 else valid, out, 0.0)


def init_params(key: jax.Array, cfg: ModelConfig):
    """Initialize (params, batch_stats) for an AffordanceNet (jitted)."""
    model = AffordanceNet(cfg)
    s = cfg.input_size

    del s

    @jax.jit
    def _init(k):
        return model.init(k, method=AffordanceNet.init_all)

    variables = _init(key)
    return variables["params"], variables.get("batch_stats", {})
