"""smg_tpu — a TPU-native framework for hybrid multimodal robotic grasping.

This is a ground-up JAX/XLA/Pallas re-design of the capabilities of the
reference system `fukangl/SMG-multimodal-grasping` (IEEE T-RO 2023, arXiv
2202.12796): a soft multimodal gripper (SMG) that can *envelop*, *suck*, or
*envelop-then-suck* objects in a cluttered tabletop scene, trained with a
deep multistage scheme (instance segmentation -> per-object affordance
scoring -> geometric pose refinement -> scripted primitive execution).

Where the reference couples a single CoppeliaSim/Vortex process over blocking
TCP RPC (reference: code/robot.py, code/simulation/vrep.py), this framework
makes *environment = pure function*: a batched rigid-body stepper, an
on-device heightmap rasterizer, Flax affordance networks, and the multistage
trainer all co-reside on the TPU and are `vmap`-ed over thousands of scenes
and `pjit`-sharded over a device mesh.

Subpackages
-----------
core        rotations/quaternions, pinhole camera + homography, tendon model
physics     batched rigid-body contact stepper + kinematic SMG gripper
render      orthographic heightmap/instance rasterizer, perspective parity path
perception  exact instance segmentation, NMS, min-area rects
models      Flax DenseNet-121 two-stream affordance nets (reactive / DQN)
policy      action arbitration, epsilon-greedy, PE / OO action geometry
envs        scripted primitive controllers + the batched SMG environment
train       reactive / double-DQN trainers, losses, orbax checkpoints
parallel    device mesh + sharded training step
ops         Pallas TPU kernels for the hot paths
utils       run logging, configuration
cli         the experiment driver (flag-compatible with reference main.py)
"""

__version__ = "0.1.0"
