"""MoE MLP + expert parallelism (models/moe.py, --moe_experts=N).

The reference has no MoE (its largest net is <10 M params); this is the
framework's EP layer. Tests pin: routing/capacity math against hand
calculations, decode==forward equivalence, expert-mesh numerics against
single-device, and that the compiled expert FFN really runs at LOCAL
expert width (the compute is sharded, not replicated).
"""

import jax
import jax.numpy as jnp
import numpy as np

from generative_models_tpu.models.moe import MoEMLP
from generative_models_tpu.parallel import make_mesh, set_mesh
from generative_models_tpu.utils import discover_models
from generative_models_tpu.utils.config import parse_args

C, E = 16, 4


def _layer(rng=0):
    m = MoEMLP(n_embed=C, n_experts=E, capacity_factor=2.0)
    x = jnp.asarray(np.random.RandomState(rng).randn(2, 12, C), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)['params']
    return m, params, x


def _force_expert_0(params):
    """Zero router kernel: uniform probs, so argmax tie-breaks every token
    to expert 0 (gate = 1/E) — a deterministic all-to-one routing."""
    return {**params, 'router': {'kernel': jnp.zeros((C, E))}}


def test_aux_loss_hand_math():
    """Sown aux must equal the Switch eq. 4 value E * sum_e(f_e * p_e)
    recomputed by hand (numpy) from the router's own logits: f = argmax
    dispatch fractions, p = mean router probs."""
    m, params, x = _layer()
    _, inter = m.apply({'params': params}, x, mutable=['intermediates'])
    aux = float(jax.tree_util.tree_leaves(inter['intermediates'])[0])
    logits = np.asarray(x @ params['router']['kernel'], np.float64)
    z = np.exp(logits - logits.max(-1, keepdims=True))
    probs = z / z.sum(-1, keepdims=True)
    f = np.bincount(probs.argmax(-1).ravel(), minlength=E) / probs[..., 0].size
    p = probs.mean(axis=(0, 1))
    np.testing.assert_allclose(aux, E * np.sum(f * p), rtol=1e-5)


def test_capacity_drops_overflow_tokens():
    """cap = T/E * factor; with every token routed to one expert only the
    first cap tokens (per batch row) produce output — the rest are dropped
    (zero output; the Block residual passes them through)."""
    m = MoEMLP(n_embed=C, n_experts=E, capacity_factor=1.0)  # cap = 12/4 = 3
    x = jnp.asarray(np.random.RandomState(1).randn(2, 12, C), jnp.float32)
    params = _force_expert_0(m.init(jax.random.PRNGKey(0), x)['params'])
    y = m.apply({'params': params}, x)
    assert np.abs(np.asarray(y[:, :3])).sum() > 0
    np.testing.assert_array_equal(np.asarray(y[:, 3:]), 0.0)


def test_decode_step_matches_forward():
    """MoE is per-token (no cross-token mixing), so with no capacity drops
    the dense-all-experts decode step must equal the dispatch/combine
    forward at every position."""
    m, params, x = _layer(rng=2)
    y_fwd = m.apply({'params': params}, x)
    B, T, _ = x.shape
    y_step = m.apply(
        {'params': params}, x.reshape(B * T, C), method=MoEMLP.step
    ).reshape(B, T, C)
    np.testing.assert_allclose(
        np.asarray(y_fwd), np.asarray(y_step), rtol=1e-5, atol=1e-6
    )


def _build(mesh_spec, ndev, extra=()):
    set_mesh(make_mesh(mesh_spec, jax.devices()[:ndev]))
    G, Model = parse_args(
        [
            '--model=pixel_transformer', '--bs=8', '--logdir=/tmp/test_moe',
            '--n_layer=2', '--n_embed=32', '--n_head=2', '--moe_experts=4',
            *extra,
        ],
        discover_models=discover_models,
    )
    return Model(G=G)


def test_expert_parallel_matches_single_device():
    """data:4,expert:2 — each device holds 2 of 4 experts' params + Adam
    moments; two train steps and sampling must match the single-device run."""
    x = jnp.asarray(
        (np.random.RandomState(0).rand(8, 28, 28, 1) > 0.5).astype(np.float32)
    )
    try:
        m = _build('data:4,expert:2', 8)
        specs = [
            getattr(l.sharding, 'spec', None)
            for l in jax.tree_util.tree_leaves(m.state.params)
        ]
        n_exp = sum(1 for s in specs if s is not None and 'expert' in tuple(s))
        assert n_exp == 8, f'expected 8 expert-sharded leaves, got {n_exp}'
        le = [float(m.train_step(x, None)['nlogp']) for _ in range(2)]
        se = np.asarray(m.sample_images(4))

        m1 = _build('', 1)
        l1 = [float(m1.train_step(x, None)['nlogp']) for _ in range(2)]
        s1 = np.asarray(m1.sample_images(4))
    finally:
        set_mesh(make_mesh('', jax.devices()))
    np.testing.assert_allclose(le, l1, rtol=1e-4)
    np.testing.assert_allclose(se, s1, atol=1e-5)


def test_expert_ffn_compute_is_local():
    """The compiled train step on the expert:2 mesh must run the expert FFN
    dots at LOCAL width E/2 — proof the EP sharding shards the compute, not
    just the param storage."""
    try:
        m = _build('data:4,expert:2', 8)
        x = jnp.zeros((8, 28, 28, 1), jnp.float32)
        hlo = jax.jit(m.train_step_fn).lower(m.state, x, None).compile().as_text()
    finally:
        set_mesh(make_mesh('', jax.devices()))
    # wi is (4, 32, 128); expert-local batch dim 2 on a 2-way expert axis
    local_ffn_dots = [
        ln for ln in hlo.splitlines()
        if 'dot(' in ln and 'f32[2,' in ln and '128]' in ln
        and 'lhs_batch_dims={0}' in ln
    ]
    assert local_ffn_dots, 'no expert-local (E=2) FFN dot found in the HLO'


def test_moe_composes_with_remat():
    """--remat wraps Blocks in nn.remat; flax's lifted remat must thread the
    sown moe_aux through — loss AND aux identical with remat on/off."""
    try:
        m0 = _build('', 1)
        m1 = _build('', 1, ('--remat=1',))
        x = jnp.asarray(
            (np.random.RandomState(3).rand(8, 28, 28, 1) > 0.5).astype(np.float32)
        )
        r0, r1 = m0.train_step(x, None), m1.train_step(x, None)
    finally:
        set_mesh(make_mesh('', jax.devices()))
    np.testing.assert_allclose(float(r0['nlogp']), float(r1['nlogp']), rtol=1e-6)
    np.testing.assert_allclose(float(r0['moe_aux']), float(r1['moe_aux']), rtol=1e-6)
