"""Actor-critic policy networks.

Replaces the reference's SB3 ``MlpPolicy`` + ``CustomFeatureExtractor``
(/root/reference/PyFlyt/rl_training/custom_feature_extractor.py:14-26: a
2×256 tanh MLP) with a flax module: shared feature extractor, separate
policy/value heads (net_arch mirrors the SB3 ``pi``/``vf`` lists — the
trajectory-following recipes use [64, 64, 32, 32],
rl_training/trajectory_following_fast/training.py:112-122), diagonal
Gaussian action head with state-independent log-std (SB3's default for Box
action spaces).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import Array


class MLP(nn.Module):
    sizes: Sequence[int]
    activate_last: bool = True
    dtype: Any = jnp.float32  # computation dtype (params stay float32)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i, size in enumerate(self.sizes):
            x = nn.Dense(
                size,
                kernel_init=nn.initializers.orthogonal(jnp.sqrt(2.0)),
                dtype=self.dtype,
            )(x)
            if self.activate_last or i < len(self.sizes) - 1:
                x = nn.tanh(x)
        return x


class ActorCritic(nn.Module):
    """Separate actor/critic tanh MLPs + diagonal Gaussian policy.

    Separate trunks match SB3's effective default (independent ``pi``/``vf``
    nets inside ``MlpExtractor``) and keep the enormous early value loss
    (±100-scale returns in these envs) from wrecking the policy features.
    ``pi_sizes``/``vf_sizes`` append extra head layers as in SB3's
    ``net_arch`` lists.
    """

    action_dim: int
    feature_sizes: Sequence[int] = (256, 256)
    pi_sizes: Sequence[int] = ()
    vf_sizes: Sequence[int] = ()
    init_log_std: float = 0.0
    # optional (min, max) clamp on the learned log_std. SB3 leaves the
    # parameter free; on raw-actuator envs (QuadX mode 8) the free std
    # inflates mid-training and destroys the policy — a hard range keeps
    # exploration inside the useful action band. None = unclamped.
    log_std_range: tuple[float, float] | None = None
    # MXU computation dtype: bfloat16 doubles the v5e matmul rate; the
    # parameters, gradients and Adam state stay float32 (mixed precision).
    # Outputs are cast back to float32 so the PPO loss math is unchanged.
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: Array) -> tuple[Array, Array, Array]:
        """Returns (action_mean, log_std, value)."""
        pi = MLP(
            (*self.feature_sizes, *self.pi_sizes), name="pi_trunk",
            dtype=self.dtype,
        )(obs)
        mean = nn.Dense(
            self.action_dim,
            kernel_init=nn.initializers.orthogonal(0.01),
            name="pi_head",
            dtype=self.dtype,
        )(pi)
        log_std = self.param(
            "log_std",
            nn.initializers.constant(self.init_log_std),
            (self.action_dim,),
        )
        if self.log_std_range is not None:
            log_std = jnp.clip(log_std, *self.log_std_range)

        vf = MLP(
            (*self.feature_sizes, *self.vf_sizes), name="vf_trunk",
            dtype=self.dtype,
        )(obs)
        value = nn.Dense(
            1, kernel_init=nn.initializers.orthogonal(1.0), name="vf_head",
            dtype=self.dtype,
        )(vf)
        mean = mean.astype(jnp.float32)
        value = value.astype(jnp.float32)
        return mean, jnp.broadcast_to(log_std, mean.shape), value[..., 0]


class VisionActorCritic(nn.Module):
    """Actor-critic for image+vector dict observations (the Gates task).

    Consumes the FLAT observation vector PPO's ``_flat_obs`` builds from a
    dict env (keys sorted, each flattened) and re-slices the image out:
    ``[..., :image_offset)`` and ``[..., image_offset+C·H·W:)`` are vector
    features, the middle is the raw uint8-valued ``rgba_cam`` (4, H, W)
    scaled by 1/255 in here. A shared conv encoder feeds separate pi/vf
    dense trunks — SB3's ``MultiInputPolicy`` layout (CombinedExtractor
    image branch + ``share_features_extractor=True`` default) that the
    reference's vision env would use if it ran
    (/root/reference/PyFlyt/gym_envs/quadx_envs/quadx_gates_env.py:64-79
    declares the dict space; the env itself crashes upstream on a bad
    asset path, :93-94).

    The conv stack is a reduced NatureCNN (stride-2 convs sized for
    32-64 px FPV frames rather than 84 px Atari). All MXU-friendly: convs
    and dense layers lower to matmuls, image scale/transpose fuse into
    the surrounding elementwise graph.
    """

    action_dim: int
    image_offset: int  # flat index where the image block starts
    image_shape: tuple  # (C, H, W) as stored channels-first by the env
    conv_features: Sequence[int] = (16, 32, 32)
    feature_sizes: Sequence[int] = (128,)
    pi_sizes: Sequence[int] = ()
    vf_sizes: Sequence[int] = ()
    init_log_std: float = 0.0
    log_std_range: tuple[float, float] | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: Array) -> tuple[Array, Array, Array]:
        c, h, w = self.image_shape
        img_size = c * h * w
        i0 = self.image_offset
        vec = jnp.concatenate(
            [obs[..., :i0], obs[..., i0 + img_size :]], axis=-1
        )
        img = obs[..., i0 : i0 + img_size].reshape(
            *obs.shape[:-1], c, h, w
        )
        x = (img.astype(self.dtype) / 255.0).transpose(0, 2, 3, 1)  # NHWC
        for f in self.conv_features:
            x = nn.relu(
                nn.Conv(
                    f, kernel_size=(3, 3), strides=(2, 2), dtype=self.dtype
                )(x)
            )
        x = x.reshape(*x.shape[:-3], -1)
        feat = jnp.concatenate([x, vec.astype(self.dtype)], axis=-1)

        pi = MLP(
            (*self.feature_sizes, *self.pi_sizes), name="pi_trunk",
            dtype=self.dtype,
        )(feat)
        mean = nn.Dense(
            self.action_dim,
            kernel_init=nn.initializers.orthogonal(0.01),
            name="pi_head",
            dtype=self.dtype,
        )(pi)
        log_std = self.param(
            "log_std",
            nn.initializers.constant(self.init_log_std),
            (self.action_dim,),
        )
        if self.log_std_range is not None:
            log_std = jnp.clip(log_std, *self.log_std_range)
        vf = MLP(
            (*self.feature_sizes, *self.vf_sizes), name="vf_trunk",
            dtype=self.dtype,
        )(feat)
        value = nn.Dense(
            1, kernel_init=nn.initializers.orthogonal(1.0), name="vf_head",
            dtype=self.dtype,
        )(vf)
        mean = mean.astype(jnp.float32)
        value = value.astype(jnp.float32)
        return mean, jnp.broadcast_to(log_std, mean.shape), value[..., 0]


def gaussian_log_prob(mean: Array, log_std: Array, action: Array) -> Array:
    """Diagonal Gaussian log-density, summed over action dims."""
    var = jnp.exp(2.0 * log_std)
    lp = -0.5 * ((action - mean) ** 2 / var + 2.0 * log_std + jnp.log(2.0 * jnp.pi))
    return jnp.sum(lp, axis=-1)


def gaussian_entropy(log_std: Array) -> Array:
    return jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)
