"""emloco_tpu — a TPU-native (JAX/XLA/Pallas/pjit) physics-embodied trajectory
prediction framework with the capabilities of ImIntheMiddle/EmLoco (CVPR 2025).

Subpackages
-----------
ops          quaternion / rotation / transform algebra (batched jnp)
kinematics   skeleton tree, forward kinematics, SMPL-style body model, motion library
physics      vmapped articulated rigid-body engine (XPBD/TGS-style positional solver)
envs         vectorized humanoid tasks (pure functions; obs/reward/reset/terrain/traj)
learning     PPO + AMP + LocoVal value-function training (flax/optax)
prediction   Social-Transmotion-style trajectory predictor + EmLoco loss + LocoVal filter
parallel     device-mesh / sharding helpers (pjit, shard_map)
utils        configs, logging, checkpointing
"""

__version__ = "0.1.0"
