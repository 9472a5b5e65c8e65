"""Mixture-of-Experts MLP with expert parallelism over an 'expert' mesh
axis — Switch-Transformer-style top-1 routing with per-expert capacity,
GShard's dispatch/combine einsum formulation.

The reference zoo has no MoE model (its largest net is <10 M params), so
this is a framework extension, not a parity item: `--moe_experts=N` swaps
every transformer Block's dense MLP for this layer, completing the
parallelism alphabet (dp/tp/pp/sp/ep) with a REAL implementation. The
TPU-native design choices:

* All routing is static-shape einsum algebra (one-hot dispatch/combine
  tensors, capacity slots) — no gather/scatter, no dynamic shapes, so XLA
  tiles everything onto the MXU and, with the expert-stacked params and
  the (E, B, cap, M) buffers sharded over 'expert', GSPMD inserts the
  routing collectives around the expert FFNs automatically (all_to_all at
  scale; at MNIST shapes its cost model picks gathers — either way the
  expert FFN dots verifiably run at LOCAL E/n_expert_shards width, checked
  in tests/test_moe.py against the compiled HLO).
* Expert params live STACKED along a leading E axis ('moe/wi' etc.), the
  same layout trick the GPipe stack uses for 'pipe' — one rule set shards
  params AND Adam moments ('expert' leading, optionally x 'model' TP on
  the hidden dim: parallel/mesh.py::shard_by_rules).
* Dropped tokens (capacity overflow) contribute zero — the Block's
  residual connection passes them through unchanged, the standard Switch
  behavior.
* The load-balance aux loss (E * sum_e f_e * p_e, Switch eq. 4) is sown
  into the 'intermediates' collection; PixelTransformer.loss adds
  moe_aux * mean(aux) when experts are enabled.

Single-token decode (`step`) computes all E expert FFNs densely on the
(B, C) batch and selects the routed one — at B=25 decode scale that is
cheaper than materializing dispatch tensors, and it is drop-free (exactly
equal to __call__ whenever no token overflowed capacity, which the
equivalence test pins).
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

EXPERT_AXIS = 'expert'


class MoEMLP(nn.Module):
    n_embed: int
    n_experts: int
    capacity_factor: float = 2.0

    def setup(self):
        E, C, H = self.n_experts, self.n_embed, 4 * self.n_embed
        self.router = nn.Dense(self.n_experts, use_bias=False, name='router')
        kinit = nn.initializers.lecun_normal()
        self.wi = self.param('wi', kinit, (E, C, H))
        self.bi = self.param('bi', nn.initializers.zeros, (E, H))
        self.wo = self.param('wo', kinit, (E, H, C))
        self.bo = self.param('bo', nn.initializers.zeros, (E, C))

    def _route(self, x):
        """Top-1 routing: (..., C) -> (gate, idx, probs)."""
        probs = jax.nn.softmax(self.router(x))
        return probs.max(-1), probs.argmax(-1), probs

    def __call__(self, x):
        """x: (B, T, C) -> (B, T, C). Static-shape dispatch/combine."""
        from generative_models_tpu.parallel import constrain

        B, T, C = x.shape
        E = self.n_experts
        cap = max(1, int(math.ceil(T / E * self.capacity_factor)))
        gate, idx, probs = self._route(x)
        onehot = jax.nn.one_hot(idx, E, dtype=x.dtype)  # (B, T, E)

        # Switch load-balance aux: f = fraction of tokens argmax-routed to
        # each expert, p = mean router prob; E*sum(f*p) == 1 at uniform
        f = onehot.mean(axis=(0, 1))
        p = probs.mean(axis=(0, 1))
        self.sow('intermediates', 'moe_aux', E * jnp.sum(f * p))

        # capacity: each token's position within its expert's queue (per
        # batch row); tokens past cap are dropped (residual passes through)
        pos = jnp.cumsum(onehot, axis=1) - onehot  # tokens BEFORE this one
        pos_in_e = jnp.sum(pos * onehot, axis=-1).astype(jnp.int32)  # (B, T)
        kept = onehot * (pos_in_e < cap)[..., None]
        slot = jax.nn.one_hot(pos_in_e, cap, dtype=x.dtype)  # (B, T, cap)
        dispatch = kept[..., None] * slot[:, :, None, :]  # (B, T, E, cap)
        combine = dispatch * gate[..., None, None]

        # (B,T,E,cap) x (B,T,C) -> (E,B,cap,C): with batch over 'data' and
        # the output over 'expert' this contraction IS the all_to_all
        xe = jnp.einsum('btec,btm->ebcm', dispatch, x)
        xe = constrain(xe, EXPERT_AXIS, 'data', None, None)
        h = jax.nn.gelu(
            jnp.einsum('ebcm,emh->ebch', xe, self.wi)
            + self.bi[:, None, None, :]
        )
        h = constrain(h, EXPERT_AXIS, 'data', None, 'model')
        ye = (
            jnp.einsum('ebch,ehm->ebcm', h, self.wo)
            + self.bo[:, None, None, :]
        )
        ye = constrain(ye, EXPERT_AXIS, 'data', None, None)
        return jnp.einsum('ebcm,btec->btm', ye, combine)

    def step(self, x):
        """Single-token decode: x (B, C) -> (B, C), drop-free dense-all-
        experts form (see module docstring)."""
        gate, idx, _ = self._route(x)
        h = jax.nn.gelu(
            jnp.einsum('bm,emh->beh', x, self.wi) + self.bi[None]
        )
        ye = jnp.einsum('beh,ehm->bem', h, self.wo) + self.bo[None]
        sel = jax.nn.one_hot(idx, self.n_experts, dtype=x.dtype)
        return jnp.einsum('bem,be->bm', ye, sel) * gate[:, None]


def moe_rules(with_model=False):
    """Param layout for MoEMLP: expert-stacked leaves shard over 'expert'
    (each device holds only its experts' weights + Adam moments); with a
    'model' axis present the hidden dim composes Megatron TP on top."""
    h = 'model' if with_model else None
    return [
        (r'moe/wi$', (EXPERT_AXIS, None, h)),
        (r'moe/bi$', (EXPERT_AXIS, h)),
        (r'moe/wo$', (EXPERT_AXIS, h, None)),
        (r'moe/bo$', (EXPERT_AXIS, None)),
    ]
