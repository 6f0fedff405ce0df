"""Experiment configuration: flag-compatible with the reference CLI.

Every flag of reference code/main.py:425-460 has a counterpart here, plus
the TPU-native knobs (batch size, trunk choice, input resolution, mesh
shape). `parse_args` accepts the reference's exact command lines, e.g.

    --is_sim --method reinforcement --is_ets --is_pe --is_oo
    --is_testing --load_snapshot --snapshot_file X --is_cluttered
"""

from __future__ import annotations

import argparse
from dataclasses import asdict, dataclass, field

from smg_tpu.envs.smg_env import EnvConfig
from smg_tpu.models.affordance import ModelConfig
from smg_tpu.train.loop import LoopConfig
from smg_tpu.train.trainer import TrainConfig


@dataclass(frozen=True)
class ExperimentConfig:
    env: EnvConfig
    train: TrainConfig
    loop: LoopConfig
    # Run control (main.py:446-449).
    training_episode: int = 800
    testing_episode: int = 300
    # Persistence (main.py:453-456).
    load_snapshot: bool = False
    snapshot_file: str = ""
    continue_logging: bool = False
    logging_directory: str = "logs"
    seed: int = 0
    max_iterations: int = 0  # 0 = run until the episode target
    data_parallel: int = 1   # devices on the mesh `data` axis (1 = plain jit)
    segmenter_checkpoint: str = ""  # params for --segmentation learned
    pretrained_trunks: str = ""     # cli.pretrain_trunks checkpoint
    imagery_every: int = 1   # save scene-0 heightmaps/overlays every K
    #                          iterations (reference: every; 0 disables)

    def to_dict(self):
        # Strip the (non-serializable) segmenter bundle before asdict;
        # the checkpoint path field records where it came from.
        import dataclasses as _dc

        me = self
        if self.loop.segmenter is not None:
            me = _dc.replace(
                self, loop=_dc.replace(self.loop, segmenter=None)
            )
        return asdict(me)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native SMG multimodal grasping"
    )
    # --------------- Setup options (main.py:430-435) ---------------
    p.add_argument("--is_sim", action="store_true", default=True,
                   help="run in simulation (always true: the sim is on-device)")
    p.add_argument("--obj_mesh_dir", default="datasets/training",
                   help="object set: a dir with enveloping/ + sucking/ "
                        ".obj subdirs (native mesh-fitter ingest), or the "
                        "reference's datasets/{training,testing} sentinels "
                        "-> the matching procedural catalog (its dataset "
                        "blob is a missing LFS pointer)")
    p.add_argument("--num_obj", type=int, default=10,
                   help="accepted for command-line parity; the reference "
                        "stores but never uses it (robot.py:40 vs "
                        "robot.py:113-117: counts are always the random "
                        "0-5 enveloping + 1-5 sucking draw)")
    p.add_argument("--heightmap_resolution", type=float, default=0.002)
    p.add_argument("--cpu", dest="force_cpu", action="store_true",
                   default=False,
                   help="force the CPU backend (reference --cpu)")
    p.add_argument("--is_cluttered", action="store_true", default=False)
    # ------------- Algorithm options (main.py:438-443) -------------
    p.add_argument("--method", default="reinforcement",
                   choices=["reactive", "reinforcement"])
    p.add_argument("--is_ets", action="store_true", default=False)
    p.add_argument("--is_pe", action="store_true", default=False)
    p.add_argument("--is_oo", action="store_true", default=False)
    p.add_argument("--future_reward_discount", type=float, default=0.5)
    p.add_argument("--explore_rate_decay", action="store_true",
                   default=False)
    # ---------- Training / testing options (main.py:446-450) ----------
    p.add_argument("--is_testing", action="store_true", default=False)
    p.add_argument("--training_episode", type=int, default=800)
    p.add_argument("--testing_episode", type=int, default=300)
    p.add_argument("--step", type=int, default=20)
    p.add_argument("--target_update_freq", type=int, default=10)
    # ------ Pre-loading and logging (main.py:453-456) ------
    p.add_argument("--load_snapshot", action="store_true", default=False)
    p.add_argument("--snapshot_file", default="")
    p.add_argument("--continue_logging", action="store_true", default=False)
    p.add_argument("--logging_directory", default="logs")
    # ---------------- TPU-native knobs ----------------
    p.add_argument("--batch_size", type=int, default=8,
                   help="parallel scenes per step")
    p.add_argument("--trunk", default="densenet121",
                   choices=["densenet121", "tiny"])
    p.add_argument("--input_size", type=int, default=224,
                   help="model input: 224 (fast; same information) or 640 "
                        "(bit-parity with the reference's zoom+pad pipeline)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_iterations", type=int, default=0,
                   help="stop after this many steps (0 = episode-based)")
    p.add_argument("--data_parallel", type=int, default=1,
                   help="shard scenes over this many devices (a "
                        "jax.sharding Mesh data axis; batch_size must "
                        "divide evenly)")
    p.add_argument("--segmentation", default="exact",
                   choices=["exact", "learned"],
                   help="instance-segmentation front-end: the renderer's "
                        "exact id-buffers, or the trained SlotSegmenter "
                        "(the Mask-R-CNN-parity path)")
    p.add_argument("--segmenter_checkpoint", default="",
                   help="orbax params path from cli.train_segmenter "
                        "(required with --segmentation learned)")
    p.add_argument("--pretrained_trunks", default="",
                   help="initialize the three affordance trunks from a "
                        "cli.pretrain_trunks self-supervised checkpoint "
                        "(the ImageNet-pretrained-init substitute)")
    p.add_argument("--imagery_every", type=int, default=1,
                   help="save scene-0 heightmaps + action overlays every "
                        "K iterations (0 = never; reference saves every "
                        "iteration)")
    return p


def config_from_args(args: argparse.Namespace) -> ExperimentConfig:
    if abs(args.heightmap_resolution - 0.002) > 1e-12:
        # The 224 x 0.002 m heightmap grid is baked into the renderer,
        # model and action geometry; fail loudly instead of ignoring.
        raise SystemExit(
            "--heightmap_resolution: only the reference default 0.002 is "
            f"supported (got {args.heightmap_resolution})"
        )
    if args.force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    env = EnvConfig(
        is_cluttered=args.is_cluttered,
        is_testing=args.is_testing,
        is_ets=args.is_ets,
        is_pe=args.is_pe,
        is_oo=args.is_oo,
        method=args.method,
        step_limit=args.step,
        segmentation=args.segmentation,
        obj_mesh_dir=args.obj_mesh_dir,
    )
    model = ModelConfig(
        method=args.method,
        trunk=args.trunk,
        input_size=args.input_size,
    )
    train = TrainConfig(
        model=model,
        method=args.method,
        future_reward_discount=args.future_reward_discount,
        target_update_freq=args.target_update_freq,
        is_ets=args.is_ets,
    )
    loop = LoopConfig(
        env=env,
        batch_size=args.batch_size,
        explore_rate_decay=args.explore_rate_decay,
    )
    return ExperimentConfig(
        env=env, train=train, loop=loop,
        training_episode=args.training_episode,
        testing_episode=args.testing_episode,
        load_snapshot=args.load_snapshot,
        snapshot_file=args.snapshot_file,
        continue_logging=args.continue_logging,
        logging_directory=args.logging_directory,
        seed=args.seed,
        max_iterations=args.max_iterations,
        data_parallel=args.data_parallel,
        segmenter_checkpoint=args.segmenter_checkpoint,
        pretrained_trunks=args.pretrained_trunks,
        imagery_every=args.imagery_every,
    )


def parse_args(argv=None) -> ExperimentConfig:
    return config_from_args(build_parser().parse_args(argv))
