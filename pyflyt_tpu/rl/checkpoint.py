"""Orbax checkpointing of the full training state.

The reference only checkpoints SB3 model zips via its eval callback
(/root/reference/PyFlyt/rl_training/custom_eval_callback.py:88-105). Here the
checkpoint covers params + optimizer state + env state + PRNG key
(SURVEY.md §5: "orbax checkpoints of params+opt_state+env_state+PRNG keys"),
so training resumes bit-exactly.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(path: str, runner: Any) -> None:
    """Saves a RunnerState pytree to ``path`` (overwrites)."""
    path = os.path.abspath(path)
    _checkpointer().save(path, runner, force=True)


def restore(path: str, template: Any) -> Any:
    """Restores a RunnerState saved by :func:`save`.

    ``template`` is a matching pytree (e.g. a fresh ``PPO.init`` output) used
    to recover array dtypes/shapes and custom dataclass structure.

    Compatibility note: the ``opt_state`` pytree structure depends on the
    PPOConfig that built the template — ``fused_sgd`` keeps per-tensor Adam
    moments while the default path wraps the chain in ``optax.flatten``
    (introduced round 3; checkpoints written before that, or across a
    ``fused_sgd`` flag change, have a different opt_state tree). A full
    restore against a mismatched template raises; fall back to
    :func:`restore_params` to recover the policy and restart the optimizer.
    """
    path = os.path.abspath(path)
    restored = _checkpointer().restore(path, item=template)
    return restored


def restore_params(path: str, params_template: Any) -> Any:
    """Restores ONLY the ``params`` subtree of a saved RunnerState.

    Used for warm-start fine-tuning across run configs (different num_envs /
    episode horizon / optimizer state), the counterpart of the reference's
    ``PPO.load(path=".../best_model_*.zip")`` curriculum step
    (rl_training/trajectory_following_slow/training.py:206-211). The network
    shapes must match; everything else (env states, optimizer moments, PRNG)
    starts fresh.
    """
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = _checkpointer()
    # restore every leaf as a host numpy array: a checkpoint written from a
    # TPU process carries device shardings that don't resolve when
    # restoring without an item on another backend (CPU eval of a
    # TPU-trained policy)
    tree_meta = ckptr.metadata(path).item_metadata.tree
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree_meta
    )
    raw = ckptr.restore(path, restore_args=restore_args)
    raw_params = raw["params"]
    flat_t, treedef = jax.tree_util.tree_flatten(params_template)
    flat_r = jax.tree_util.tree_leaves(raw_params)
    if len(flat_t) != len(flat_r):
        raise ValueError(
            f"checkpoint params tree ({len(flat_r)} leaves) does not match "
            f"the model ({len(flat_t)} leaves) — warm start needs identical "
            "network architecture"
        )
    for t, r in zip(flat_t, flat_r):
        if tuple(t.shape) != tuple(r.shape):
            raise ValueError(
                f"warm-start shape mismatch: checkpoint {r.shape} vs model "
                f"{t.shape} — observation/action sizes must agree"
            )
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(r, t.dtype) for t, r in zip(flat_t, flat_r)]
    )


def average_params(paths: list[str], params_template: Any) -> Any:
    """Uniform parameter average over several saved checkpoints.

    Classic checkpoint averaging: restore the ``params`` subtree of each
    checkpoint (same architecture required) and return the element-wise
    mean. Used to stabilize the trajectory_following_slow deterministic
    eval, whose per-checkpoint scores are high-variance late in training
    (docs/artifacts/traj_slow_curriculum_tpu.jsonl); pass several
    ``best_model_*`` checkpoints to the eval CLI to combine them.
    """
    import jax.numpy as jnp

    assert paths, "average_params needs at least one checkpoint path"
    trees = [restore_params(p, params_template) for p in paths]
    return jax.tree.map(
        lambda *leaves: jnp.mean(jnp.stack(leaves), axis=0), *trees
    )


def best_model_name(idx: int, mean_len: float, std_len: float,
                    mean_rew: float, std_rew: float) -> str:
    """The reference's best-model naming convention
    (custom_eval_callback.py:88-105)."""
    return (
        f"best_model_{idx}_{mean_len:.0f}_{std_len:.0f}"
        f"_{mean_rew:.0f}_{std_rew:.0f}"
    )
