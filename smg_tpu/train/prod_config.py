"""The production training configuration, in ONE place.

bench.py's update/train-step legs and scripts/sharded_prod_check.py must
construct bit-identical configs (trunk, input size, scene_chunk, env
flags): the persistent compile cache keys on the traced program, so any
drift between them silently turns a cache hit back into a multi-minute
cold compile on the 1-CPU bench host (advisor finding, round 4). Both
call these helpers instead of duplicating the literals.

Shapes mirror the reference's flagship run: DenseNet-121 trunks
(reference models.py:22-24), reinforcement/double-DQN method
(trainer.py:238-274), PE+OO geometry on (utils.py:316,370).
"""

from __future__ import annotations


def make_prod_trainer(batch_size: int):
    """Trainer for the production DenseNet-121 @224 DQN configuration."""
    from smg_tpu.models.affordance import ModelConfig
    from smg_tpu.train.trainer import TrainConfig, Trainer

    return Trainer(TrainConfig(
        model=ModelConfig(method="reinforcement", trunk="densenet121",
                          input_size=224),
        method="reinforcement", scene_chunk=min(batch_size, 8),
    ))


def make_prod_loop_cfg(batch_size: int):
    """LoopConfig matching the flagship eses_drl_lc episode loop."""
    from smg_tpu.envs.smg_env import EnvConfig
    from smg_tpu.train.loop import LoopConfig

    return LoopConfig(
        env=EnvConfig(is_pe=True, is_oo=True, method="reinforcement"),
        batch_size=batch_size,
    )
