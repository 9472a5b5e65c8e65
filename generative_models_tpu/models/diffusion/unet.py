"""MNIST-sized UNet (reference: gms/diffusion/simple_unet.py): constant
channel width, sinusoidal logSNR embedding (max_period=256) through a 2-layer
MLP, additive one-hot class guide embedding (zeroed for label -1) and
distilled-guidance-weight embedding (max_period=4), down/turn/up with every
down activation cached as a skip, GN(32)/SiLU ResBlocks with zero-init output
convs.

TPU-native: NHWC layout, bfloat16 compute with float32 params (the TPU
replacement for the reference's fp16 AMP + GradScaler,
gms/diffusion/diffusion_model.py:61-74 — bf16 needs no loss scaling).
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

MAX_TIMESTEPS = 256


def timestep_embedding(timesteps, dim, max_period):
    """Sinusoidal embedding, cos-first (reference simple_unet.py:205-224)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class EmbedMLP(nn.Module):
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_dim, dtype=self.dtype)(x)
        x = nn.silu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype)(x)


class ResBlock(nn.Module):
    """GN32/SiLU/conv + emb add + GN/SiLU/dropout/zero-init conv + skip
    (reference simple_unet.py:155-186)."""

    out_channels: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, train=True):
        from generative_models_tpu.parallel import constrain

        h = nn.GroupNorm(num_groups=min(32, x.shape[-1]), dtype=self.dtype)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding='SAME', dtype=self.dtype)(h)
        # TP: channels shard over the 'model' mesh axis (no-op without one)
        h = constrain(h, 'data', None, None, 'model')
        emb_out = nn.Dense(self.out_channels, dtype=self.dtype)(nn.silu(emb))
        h = h + emb_out[:, None, None, :]
        h = nn.GroupNorm(num_groups=min(32, self.out_channels), dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding='SAME', dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
        return x + h


class Downsample(nn.Module):
    out_channels: int
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb=None, train=True):
        return nn.Conv(
            self.out_channels, (3, 3), strides=(self.stride, self.stride),
            padding='SAME', dtype=self.dtype,
        )(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method='nearest')
        return nn.Conv(self.channels, (3, 3), padding='SAME', dtype=self.dtype)(x)


class SimpleUnet(nn.Module):
    channels: int
    dropout: float = 0.0
    out_channels: int = 1
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # --remat: recompute each ResBlock in the backward
    # (jax.checkpoint) instead of caching its activations; the UNet moves
    # ~1 GB of activations per forward at C=128 (docs/PERF.md), so this is
    # the knob that buys batch/resolution headroom on one chip

    @nn.compact
    def __call__(self, x, logsnr, guide=None, cond_w=None, train=True):
        C = self.channels
        emb_dim = 2 * C
        dt = self.dtype
        in_dtype = x.dtype
        x = x.astype(dt)

        def res_block(h, emb):
            block = ResBlock(C, self.dropout, dtype=dt)
            if not self.remat:
                return block(h, emb, train)
            # lifted-function remat: train stays a closed-over Python bool
            return nn.remat(lambda mdl, h, e: mdl(h, e, train))(block, h, emb)

        emb = EmbedMLP(emb_dim, dtype=dt, name='time_embed')(
            timestep_embedding(logsnr, 64, MAX_TIMESTEPS).astype(dt)
        )
        if guide is not None:
            mask = guide == -1
            safe = jnp.where(mask, 0, guide)
            g = jax.nn.one_hot(safe, 10, dtype=dt)
            guide_emb = EmbedMLP(emb_dim, dtype=dt, name='guide_embed')(g)
            guide_emb = jnp.where(mask[:, None], 0.0, guide_emb)
            emb = emb + guide_emb
        if cond_w is not None:
            emb = emb + EmbedMLP(emb_dim, dtype=dt, name='cond_w_embed')(
                timestep_embedding(cond_w, 64, 4).astype(dt)
            )

        # --- down (cache every activation: simple_unet.py:87-109) ---
        cache = []
        h = Downsample(C, stride=1, dtype=dt)(x)
        cache.append(h)
        for stage in range(2):
            for _ in range(2):
                h = res_block(h, emb)
                cache.append(h)
            h = Downsample(C, dtype=dt)(h)
            cache.append(h)

        h = res_block(h, emb)  # turn

        # --- up: 7 stages, each concats one cached skip (reversed);
        # stages 0 and 3 also upsample (simple_unet.py:125-152) ---
        for i, skip in enumerate(cache[::-1]):
            h = jnp.concatenate([h, skip], axis=-1)
            h = res_block(h, emb)
            if i in (0, 3):
                h = Upsample(C, dtype=dt)(h)

        h = nn.GroupNorm(num_groups=min(32, C), dtype=dt)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding='SAME', dtype=dt)(h)
        return h.astype(in_dtype)
