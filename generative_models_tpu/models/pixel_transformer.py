"""PixelTransformer: minGPT-style decoder-only transformer over 784 pixel
tokens (reference: gms/autoregs/pixel_transformer.py) or 49 VQ code tokens
(used as the VQ-VAE prior).

TPU-native: attention is the blockwise-causal flash Pallas kernel
(ops/attention.py) instead of a materialized 784x784 mask; sampling carries a
KV cache through one lax.scan (the reference re-runs the full transformer per
token with no cache, pixel_transformer.py:59-71 — O(T^2) forwards).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from generative_models_tpu.models.base import Autoreg
from generative_models_tpu.models.heads import BinaryHead, CategoricalHead
from generative_models_tpu.ops.attention import causal_attention, decode_step_attention
from generative_models_tpu.utils import dists, register
from generative_models_tpu.utils.config import AttrDict


class CausalSelfAttention(nn.Module):
    n_embed: int
    n_head: int
    use_pallas: bool = True
    use_ring: bool = False  # sequence parallelism over the 'seq' mesh axis

    def setup(self):
        self.query = nn.Dense(self.n_embed)
        self.key = nn.Dense(self.n_embed)
        self.value = nn.Dense(self.n_embed)
        self.proj = nn.Dense(self.n_embed)

    def _heads(self, x):
        from generative_models_tpu.parallel import constrain

        B, T, _ = x.shape
        h = x.reshape(B, T, self.n_head, -1).transpose(0, 2, 1, 3)
        # Megatron-style tensor parallelism: heads shard over the 'model'
        # mesh axis (no-op without one); GSPMD propagates the split into the
        # QKV/proj matmuls and inserts the ICI all-reduce after proj
        return constrain(h, 'data', 'model', None, None)

    def __call__(self, x):
        q = self._heads(self.query(x))
        k = self._heads(self.key(x))
        v = self._heads(self.value(x))
        if self.use_ring:
            from generative_models_tpu.parallel.ring_attention import (
                ring_causal_attention,
            )

            y = ring_causal_attention(q, k, v)
        else:
            y = causal_attention(q, k, v, self.use_pallas)
        B, H, T, D = y.shape
        return self.proj(y.transpose(0, 2, 1, 3).reshape(B, T, H * D))

    def step(self, x_t, kv_cache, t):
        """x_t: (B, C); kv_cache: (T, B, 2, H*D) packed T-major (see
        ops.attention.decode_step_attention for the layout rationale);
        returns (y_t, kv_cache)."""
        from generative_models_tpu.models.base import interception_active

        B = x_t.shape[0]
        if interception_active():
            # a flax method interceptor is rewriting Dense calls (int8
            # serving quantization) — it must see query/key/value
            # individually, so skip the cross-module fusion below
            q = self.query(x_t)
            kv = jnp.stack([self.key(x_t), self.value(x_t)], 1)
        else:
            # one fused (B,C)@(C,3HD) matmul replaces the three Q/K/V
            # matmuls: the concatenated kernel is loop-invariant, so XLA
            # hoists the concat out of the 784-step sampling scan, and the
            # decode chain is dependent-op-latency-bound (docs/PERF.md) —
            # fewer ops, same math
            wq, wk, wv = (
                m.variables['params']['kernel']
                for m in (self.query, self.key, self.value)
            )
            bq, bk, bv = (
                m.variables['params']['bias']
                for m in (self.query, self.key, self.value)
            )
            qkv = x_t @ jnp.concatenate([wq, wk, wv], 1) + jnp.concatenate(
                [bq, bk, bv]
            )
            q, k_t, v_t = jnp.split(qkv, 3, axis=-1)
            kv = jnp.stack([k_t, v_t], 1)  # (B, 2, HD)
        kv_cache = jax.lax.dynamic_update_slice(
            kv_cache, kv.astype(kv_cache.dtype)[None], (t, 0, 0, 0)
        )
        y = decode_step_attention(q, kv_cache, t, self.n_head)
        return self.proj(y.astype(x_t.dtype)), kv_cache


class Block(nn.Module):
    """pre-LN attention + MLP (reference pixel_transformer.py:125-142).
    With n_experts > 0 the dense MLP becomes a top-1-routed MoE layer whose
    expert-stacked params shard over the 'expert' mesh axis (models/moe.py)."""

    n_embed: int
    n_head: int
    use_pallas: bool = True
    use_ring: bool = False
    n_experts: int = 0
    moe_cap: float = 2.0

    def setup(self):
        from generative_models_tpu.models.moe import MoEMLP

        self.ln1 = nn.LayerNorm()
        self.ln2 = nn.LayerNorm()
        self.attn = CausalSelfAttention(
            self.n_embed, self.n_head, self.use_pallas, self.use_ring
        )
        if self.n_experts:
            self.moe = MoEMLP(
                self.n_embed, self.n_experts, self.moe_cap, name='moe'
            )
        else:
            self.fc1 = nn.Dense(4 * self.n_embed)
            self.fc2 = nn.Dense(self.n_embed)

    def _mlp(self, x):
        from generative_models_tpu.parallel import constrain

        if self.n_experts:
            # 3-D = training forward (dispatch/combine einsums); 2-D = one
            # decode step (dense-all-experts select)
            return self.moe(x) if x.ndim == 3 else self.moe.step(x)
        # TP: the 4x hidden shards over 'model' (column-parallel fc1,
        # row-parallel fc2)
        h = constrain(nn.gelu(self.fc1(x)), 'data', None, 'model')
        return self.fc2(h)

    def __call__(self, x):
        x = x + self.attn(self.ln1(x))
        x = x + self._mlp(self.ln2(x))
        return x

    def step(self, x_t, kv_cache, t):
        a, kv_cache = self.attn.step(self.ln1(x_t), kv_cache, t)
        x_t = x_t + a
        x_t = x_t + self._mlp(self.ln2(x_t))
        return x_t, kv_cache

    def fused_layer_params(self):
        """Raw param bundle for the ops/decode_fused kernels (ln_matmul +
        block_tail decode path). The QKV concat is loop-invariant, so XLA
        hoists it out of the sampling scan."""
        ap = self.attn
        wq, wk, wv = (
            m.variables['params']['kernel']
            for m in (ap.query, ap.key, ap.value)
        )
        bq, bk, bv = (
            m.variables['params']['bias']
            for m in (ap.query, ap.key, ap.value)
        )
        return dict(
            ln1_scale=self.ln1.variables['params']['scale'],
            ln1_bias=self.ln1.variables['params']['bias'],
            wqkv=jnp.concatenate([wq, wk, wv], 1),
            bqkv=jnp.concatenate([bq, bk, bv]),
            wproj=ap.proj.variables['params']['kernel'],
            bproj=ap.proj.variables['params']['bias'],
            ln2_scale=self.ln2.variables['params']['scale'],
            ln2_bias=self.ln2.variables['params']['bias'],
            wfc1=self.fc1.variables['params']['kernel'],
            bfc1=self.fc1.variables['params']['bias'],
            wfc2=self.fc2.variables['params']['kernel'],
            bfc2=self.fc2.variables['params']['bias'],
        )


class TransformerNet(nn.Module):
    """Decoder-only transformer with Binary or Categorical head. The input is
    right-shifted INSIDE __call__ (reference pixel_transformer.py:50).

    use_pipe stores the n_layer homogeneous Blocks' params STACKED along a
    leading layer axis (one 'blocks' pytree) — the layout pipeline
    parallelism needs: the layer axis shards over the 'pipe' mesh axis
    (transformer_pipe_rules), so each device holds only its stage's layers
    and optimizer moments, and __call__ runs the GPipe microbatch schedule
    (parallel/pipeline.py) instead of the sequential layer loop."""

    in_size: int
    block_size: int
    n_embed: int
    n_head: int
    n_layer: int
    head: str = 'bin'  # 'bin' | 'cat'
    use_pallas: bool = True
    use_ring: bool = False
    use_pipe: bool = False
    pipe_stages: int = 1
    use_fused_decode: bool = False  # fused dense-chain decode kernels
    # (ops/decode_fused.py: LN1+QKV and proj+LN2+MLP each one pallas_call) —
    # cuts the latency-bound per-step op count; engaged on TPU for the
    # dense-MLP config (not pipe/ring/MoE/TP)
    remat: bool = False  # --remat: recompute each Block in the backward
    # instead of caching its activations (jax.checkpoint) — trades ~1/3 more
    # FLOPs for O(n_layer) less HBM, the standard TPU recipe for long
    # context / deep stacks (measured numbers in docs/PERF.md)
    n_experts: int = 0  # --moe_experts: top-1-routed MoE MLPs whose
    # expert-stacked params shard over the 'expert' mesh axis (models/moe.py)
    moe_cap: float = 2.0

    def _block(self):
        # parent=None: a detached functional template (blk.apply with explicit
        # per-layer params), not a registered submodule
        return Block(
            self.n_embed, self.n_head, self.use_pallas, self.use_ring,
            self.n_experts, self.moe_cap,
            parent=None,
        )

    def setup(self):
        assert not (self.use_pipe and self.n_experts), (
            'MoE blocks inside the GPipe stack are not supported yet: the '
            'sown aux loss cannot cross the pipeline shard_map boundary'
        )
        self.pos_emb = self.param(
            'pos_emb', nn.initializers.zeros, (1, self.block_size, self.n_embed)
        )
        self.embed = nn.Dense(self.n_embed, use_bias=False)
        if self.use_pipe:
            blk = self._block()

            def init_stacked(rng):
                x0 = jnp.zeros((1, 1, self.n_embed), jnp.float32)
                return jax.vmap(lambda r: blk.init(r, x0)['params'])(
                    jax.random.split(rng, self.n_layer)
                )

            self.blocks_stacked = self.param('blocks', init_stacked)
        else:
            self.blocks = [
                Block(
                    self.n_embed, self.n_head, self.use_pallas, self.use_ring,
                    self.n_experts, self.moe_cap,
                    name=f'block{i}',
                )
                for i in range(self.n_layer)
            ]
        self.ln_f = nn.LayerNorm()
        # distribution heads (reference: gms/common.py:211-232)
        head_cls = BinaryHead if self.head == 'bin' else CategoricalHead
        self.head_layer = head_cls(self.in_size)

    def _pipe_forward(self, h):
        """Blocks over the 'pipe' mesh axis: n_layer/S layers per stage, each
        stage scanning its own layers, activations ppermute-ing stage to
        stage under the GPipe microbatch schedule."""
        from generative_models_tpu.parallel import pipeline_apply

        blk = self._block()
        S = self.pipe_stages
        grouped = jax.tree_util.tree_map(
            lambda p: p.reshape(S, self.n_layer // S, *p.shape[1:]),
            self.blocks_stacked,
        )

        def stage_fn(p, h):
            def one(h, pl):
                return blk.apply({'params': pl}, h), None

            if self.remat:
                one = jax.checkpoint(one)
            return jax.lax.scan(one, h, p)[0]

        return pipeline_apply(stage_fn, grouped, h)

    def __call__(self, x):
        """x: (B, T, in_size) UNSHIFTED targets; returns the dist over x."""
        B, T, C = x.shape
        x = jnp.concatenate([jnp.zeros((B, 1, C), x.dtype), x[:, :-1]], axis=1)
        h = self.embed(x) + self.pos_emb[:, :T]
        if self.use_pipe:
            h = self._pipe_forward(h)
        elif self.remat:
            # lifted-function form keeps block.step (the KV-cached decode
            # path) untouched; only the training forward is checkpointed
            run = nn.remat(lambda blk, h: blk(h))
            for block in self.blocks:
                h = run(block, h)
        else:
            for block in self.blocks:
                h = block(h)
        return self.head_layer(self.ln_f(h))

    def init_cache(self, batch):
        from generative_models_tpu.ops.attention import decode_cache_dtype

        shape = (self.block_size, batch, 2, self.n_embed)
        if self.use_pipe:
            return jnp.zeros((self.n_layer, *shape), decode_cache_dtype())
        return [
            jnp.zeros(shape, decode_cache_dtype()) for _ in range(self.n_layer)
        ]

    def decode_step(self, prev_token, caches, t):
        """prev_token: (B, in_size) (zeros at t=0); returns (logits_t, caches)."""
        from generative_models_tpu.models.base import interception_active

        h = self.embed(prev_token) + self.pos_emb[0, t]
        if self.use_fused_decode and not interception_active():
            from generative_models_tpu.ops.decode_fused import (
                block_tail, ln_matmul,
            )

            C = self.n_embed
            new_caches = []
            for block, kv_cache in zip(self.blocks, caches):
                lp = block.fused_layer_params()
                qkv = ln_matmul(
                    h, lp['ln1_scale'], lp['ln1_bias'], lp['wqkv'], lp['bqkv']
                )
                q, k_t, v_t = qkv[:, :C], qkv[:, C : 2 * C], qkv[:, 2 * C :]
                kv = jnp.stack([k_t, v_t], 1)  # (B, 2, C)
                kv_cache = jax.lax.dynamic_update_slice(
                    kv_cache, kv.astype(kv_cache.dtype)[None], (t, 0, 0, 0)
                )
                y = decode_step_attention(q, kv_cache, t, self.n_head)
                h = block_tail(h, y.astype(jnp.float32), lp)
                new_caches.append(kv_cache)
            hp = self.head_layer.variables['params']['Dense_0']
            lf = self.ln_f.variables['params']
            logits = ln_matmul(
                h, lf['scale'], lf['bias'], hp['kernel'], hp['bias']
            )
            return logits, new_caches
        if self.use_pipe:
            blk = self._block()

            def one(h, pkv):
                p, kv = pkv
                h, kv = blk.apply({'params': p}, h, kv, t, method=Block.step)
                return h, kv

            h, new_caches = jax.lax.scan(
                one, h, (self.blocks_stacked, caches)
            )
            return self.head_layer(self.ln_f(h)).logits, new_caches
        new_caches = []
        for block, kv in zip(self.blocks, caches):
            h, kv = block.step(h, kv, t)
            new_caches.append(kv)
        return self.head_layer(self.ln_f(h)).logits, new_caches


def transformer_tp_rules():
    """Megatron-style tensor-parallel param layout for TransformerNet:
    QKV + fc1 column-parallel (output dim over 'model'), proj + fc2
    row-parallel (input dim over 'model'); pairs with the activation
    constraints in CausalSelfAttention._heads / Block._mlp so GSPMD's only
    collective is the all-reduce after each row-parallel matmul."""
    return [
        (r'attn/(query|key|value)/kernel$', (None, 'model')),
        (r'attn/(query|key|value)/bias$', ('model',)),
        (r'attn/proj/kernel$', ('model', None)),
        (r'fc1/kernel$', (None, 'model')),
        (r'fc1/bias$', ('model',)),
        (r'fc2/kernel$', ('model', None)),
    ]


def transformer_pipe_rules(with_model=False):
    """Param layout for the pipelined (stacked-blocks) TransformerNet: every
    'blocks/...' leaf has a leading layer axis sharded over 'pipe' (each
    stage holds only its own layers + their Adam moments). With a 'model'
    axis also present, the trailing dims compose Megatron TP on top
    (pipe x tensor parallelism from one rule set)."""
    if with_model:
        return [
            (r'blocks/attn/(query|key|value)/kernel$', ('pipe', None, 'model')),
            (r'blocks/attn/(query|key|value)/bias$', ('pipe', 'model')),
            (r'blocks/attn/proj/kernel$', ('pipe', 'model', None)),
            (r'blocks/fc1/kernel$', ('pipe', None, 'model')),
            (r'blocks/fc1/bias$', ('pipe', 'model')),
            (r'blocks/fc2/kernel$', ('pipe', 'model', None)),
            (r'blocks/.*/kernel$', ('pipe', None, None)),
            (r'blocks/.*/(bias|scale)$', ('pipe', None)),
        ]
    return [
        (r'blocks/.*/kernel$', ('pipe', None, None)),
        (r'blocks/.*/(bias|scale)$', ('pipe', None)),
    ]


def transformer_sample_scan(net, params, n, rng, sample_token, unroll=1,
                            segments=1):
    """Generic KV-cached AR sampling scan shared by PixelTransformer and the
    VQ-VAE prior. sample_token(logits, key) -> (B, in_size) token.

    unroll amortizes the scan's per-iteration bookkeeping; segments > 1
    splits the T-step scan into S sequential sub-scans where sub-scan k
    carries only the first (k+1)*T/S cache rows — the attention read per
    step shrinks from a constant T rows to a triangular average of ~T/2,
    which is the decode chain's dominant HBM traffic (the (T, B, 2, C)
    cache is re-read every step; at the reference config that is ~10 MB per
    layer per step). Each segment compiles its own body (static shapes)."""

    def body(carry, inp):
        prev, caches = carry
        t, key = inp
        logits, caches = net.apply(
            {'params': params}, prev, caches, t, method=TransformerNet.decode_step
        )
        tok = sample_token(logits, key)
        return (tok, caches), tok

    T = net.block_size
    caches = net.init_cache(n)
    prev = jnp.zeros((n, net.in_size))
    keys = jax.random.split(rng, T)
    if segments <= 1 or T % segments != 0 or net.use_pipe:
        _, tokens = jax.lax.scan(
            body, (prev, caches), (jnp.arange(T), keys), unroll=unroll,
        )
        return tokens  # (T, B, in_size)

    seg = T // segments
    token_parts = []
    for k in range(segments):
        limit = seg * (k + 1)
        caches_k = [c[:limit] for c in caches]
        (prev, caches_k), toks = jax.lax.scan(
            body, (prev, caches_k),
            (jnp.arange(seg * k, limit), keys[seg * k : limit]),
            unroll=unroll,
        )
        if k + 1 < segments:
            caches = [
                jax.lax.dynamic_update_slice(c, ck, (0,) * c.ndim)
                for c, ck in zip(caches, caches_k)
            ]
        token_parts.append(toks)
    return jnp.concatenate(token_parts, axis=0)


@register
class PixelTransformer(Autoreg):
    DG = AttrDict()
    DG.n_layer = 2
    DG.n_head = 4
    DG.n_embed = 128
    DG.lr = 1e-3
    DG.fused_decode = 1  # fused dense-chain decode kernels
    # (ops/decode_fused.py; TPU only); 0 = the per-op XLA chain (A/B, debug)
    DG.decode_unroll = 1  # lax.scan unroll factor for the sampling scan
    DG.decode_segments = -1  # sampling-scan segmentation (triangular cache
    # reads, see transformer_sample_scan); -1 = auto (4 on TPU, 1 off)
    # --- MoE extension (models/moe.py; 0 = the reference's dense MLP) ---
    DG.moe_experts = 0
    DG.moe_cap = 2.0   # per-expert capacity factor (cap = T/E * this)
    DG.moe_aux = 0.01  # Switch load-balance aux loss weight

    def __init__(self, G):
        self.side = 32 if G.get('pad32', 0) else 28
        self.block_size = self.side * self.side
        super().__init__(G)
        self._jit_sample = jax.jit(self.sample_fn, static_argnums=(1, 3))

    def build(self):
        from generative_models_tpu.ops import on_tpu
        from generative_models_tpu.parallel import (
            MODEL_AXIS, PIPE_AXIS, SEQ_AXIS, get_mesh,
        )

        # sequence parallelism: --mesh=seq:N routes attention through the
        # ring kernel (parallel/ring_attention.py) with T sharded over 'seq'
        mesh = get_mesh()
        use_ring = (
            SEQ_AXIS in mesh.axis_names
            and mesh.shape[SEQ_AXIS] > 1
            and self.block_size % mesh.shape[SEQ_AXIS] == 0
        )
        # pipeline parallelism: --mesh=pipe:N stacks the Block params along
        # a leading layer axis sharded over 'pipe' and runs the GPipe
        # microbatch schedule (parallel/pipeline.py); pipe:1 exercises the
        # full machinery on one device (the overhead-measurement path)
        use_pipe = (
            PIPE_AXIS in mesh.axis_names
            and self.G.n_layer % mesh.shape[PIPE_AXIS] == 0
        )
        n_experts = int(self.G.get('moe_experts', 0))
        return TransformerNet(
            in_size=1,
            block_size=self.block_size,
            n_embed=self.G.n_embed,
            n_head=self.G.n_head,
            n_layer=self.G.n_layer,
            head='bin',
            use_pallas=on_tpu() and not use_ring,
            use_ring=use_ring,
            use_pipe=use_pipe,
            pipe_stages=mesh.shape[PIPE_AXIS] if use_pipe else 1,
            use_fused_decode=(
                on_tpu()
                and bool(self.G.get('fused_decode', 1))
                and not (use_ring or use_pipe or n_experts)
                # TP-sharded params would all-gather through the kernel at
                # every decode step; keep the per-op chain there
                and (
                    MODEL_AXIS not in mesh.axis_names
                    or mesh.shape[MODEL_AXIS] == 1
                )
            ),
            remat=bool(self.G.get('remat', 0)),
            n_experts=n_experts,
            moe_cap=float(self.G.get('moe_cap', 2.0)),
        )

    def example_input(self):
        return jnp.zeros((1, self.block_size, 1), jnp.float32)

    def param_sharding_rules(self):
        from generative_models_tpu.parallel import MODEL_AXIS, get_mesh

        mesh = get_mesh()
        if getattr(self.net, 'use_pipe', False):
            return transformer_pipe_rules(
                with_model=MODEL_AXIS in mesh.axis_names
            )
        rules = transformer_tp_rules()
        if self.net.n_experts:
            from generative_models_tpu.models.moe import moe_rules

            rules = moe_rules(
                with_model=MODEL_AXIS in mesh.axis_names
            ) + rules
        return rules

    def loss(self, params, x, y=None, rng=None, train=True):
        x = x.reshape(x.shape[0], self.block_size, 1)
        if self.net.n_experts:
            dist, inter = self.net.apply(
                {'params': params}, x, mutable=['intermediates']
            )
            nlogp = -dist.log_prob(x).mean()
            # every MoEMLP sows one scalar; average them (Switch eq. 6 is
            # per-layer, weighted by moe_aux)
            auxes = [
                v
                for leaf in jax.tree_util.tree_leaves(inter['intermediates'])
                for v in (leaf if isinstance(leaf, tuple) else (leaf,))
            ]
            aux = sum(auxes) / len(auxes)
            loss = nlogp + float(self.G.get('moe_aux', 0.01)) * aux
            return loss, {'nlogp': nlogp, 'moe_aux': aux}
        dist = self.net.apply({'params': params}, x)
        loss = -dist.log_prob(x).mean()
        return loss, {'nlogp': loss}

    def sample_fn(self, state, n, rng, with_frames=True):
        from generative_models_tpu.ops import on_tpu

        sample_token = lambda logits, key: dists.Bernoulli(logits=logits).sample(key)
        segments = int(self.G.get('decode_segments', -1))
        if segments < 0:  # auto: triangular cache reads on TPU
            segments = 4 if on_tpu() else 1
        tokens = transformer_sample_scan(
            self.net, state.params, n, rng, sample_token,
            unroll=int(self.G.get('decode_unroll', 1)),
            segments=segments,
        )
        samples = tokens.transpose(1, 0, 2).reshape(n, self.side, self.side, 1)
        if not with_frames:
            return samples
        T = self.block_size
        tri = jnp.tril(jnp.ones((T, T), tokens.dtype))
        frames = (tri[:, :, None] * tokens[None, :, :, 0]).transpose(0, 2, 1)
        frames = frames.reshape(T, n, self.side, self.side, 1)
        return samples, frames

    def sample(self, n):
        return self._jit_sample(self.state, n, self.next_rng())
