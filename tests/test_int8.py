"""Int8 quantized serving (ops/int8.py + serve.py --quantize).

Kernel math runs in Pallas interpret mode on CPU (tests/conftest.py forces
JAX_PLATFORMS=cpu), same policy as test_masked_dense/test_attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_models_tpu.ops.int8 import (
    int8_matmul,
    make_dense_interceptor,
    quantize_dense_tree,
    quantize_int8,
)


def test_quantize_int8_roundtrip_bound():
    w = jax.random.normal(jax.random.key(0), (96, 160)) * 3.0
    q, scale = quantize_int8(w)
    assert q.dtype == jnp.int8 and scale.shape == (160,)
    # symmetric absmax: per-element error <= scale/2 (round-to-nearest)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(scale) - np.asarray(w))
    assert (err <= np.asarray(scale)[None, :] / 2 + 1e-6).all()
    # all-zero columns don't divide by zero
    q0, s0 = quantize_int8(jnp.zeros((8, 4)))
    assert np.asarray(q0).max() == 0 and np.isfinite(np.asarray(s0)).all()


@pytest.mark.parametrize('use_pallas', [False, True])
def test_w8a8_matches_integer_reference(use_pallas):
    """The dynamic-quant path equals the explicit (xq @ q) * sx * sw formula
    computed in numpy int32 — the Pallas grid and the XLA fallback implement
    the same integer GEMM."""
    kx, kw = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (10, 72))
    w = jax.random.normal(kw, (72, 136))
    q, scale = quantize_int8(w)
    y = int8_matmul(x, q, scale, act_quant=True, use_pallas=use_pallas)
    xn = np.asarray(x, np.float32)
    sx = np.maximum(np.abs(xn).max(1, keepdims=True), 1e-12) / 127.0
    xq = np.clip(np.round(xn / sx), -127, 127).astype(np.int32)
    ref = (xq @ np.asarray(q, np.int32)) * sx * np.asarray(scale)[None, :]
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('use_pallas', [False, True])
def test_w8a16_matches_dequant_matmul(use_pallas):
    kx, kw = jax.random.split(jax.random.key(2))
    x = jax.random.normal(kx, (6, 130))
    w = jax.random.normal(kw, (130, 70))
    q, scale = quantize_int8(w)
    y = int8_matmul(x, q, scale, act_quant=False, use_pallas=use_pallas)
    ref = np.asarray(x) @ (np.asarray(q, np.float32) * np.asarray(scale))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_w8a8_relative_error_small():
    """End-to-end quantization error vs the f32 matmul on Gaussian data —
    the accuracy contract --quantize relies on."""
    kx, kw = jax.random.split(jax.random.key(3))
    x = jax.random.normal(kx, (64, 256))
    w = jax.random.normal(kw, (256, 256)) / np.sqrt(256)
    q, scale = quantize_int8(w)
    exact = np.asarray(x @ w)
    y = np.asarray(int8_matmul(x, q, scale, act_quant=True, use_pallas=False))
    rel = np.linalg.norm(y - exact) / np.linalg.norm(exact)
    assert rel < 0.02, rel
    y16 = np.asarray(int8_matmul(x, q, scale, act_quant=False, use_pallas=False))
    rel16 = np.linalg.norm(y16 - exact) / np.linalg.norm(exact)
    assert rel16 <= rel + 1e-6  # weight-only is at least as accurate


def test_quantize_dense_tree_thresholds():
    params = {
        'attn': {'query': {'kernel': jnp.ones((128, 128)), 'bias': jnp.ones(128)}},
        'embed': {'kernel': jnp.ones((1, 128))},          # min_dim fail
        'head': {'kernel': jnp.ones((128, 1))},           # min_dim fail
        'small': {'kernel': jnp.ones((64, 64))},          # min_size fail
        'conv': {'kernel': jnp.ones((3, 3, 8, 8))},       # not 2-D
    }
    table = quantize_dense_tree(params)
    assert set(table) == {('attn', 'query')}
    q, scale = table[('attn', 'query')]
    assert q.dtype == jnp.int8 and scale.shape == (128,)


@pytest.mark.parametrize('mode', ['w8a8', 'w8a16'])
def test_interceptor_swaps_dense(mode):
    """A two-layer Dense net under interception matches the quantized math
    layer-by-layer (and stays close to the f32 forward)."""
    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.relu(nn.Dense(128, name='a')(x))
            return nn.Dense(64, name='b')(x)

    net = Net()
    x = jax.random.normal(jax.random.key(4), (4, 128))
    params = net.init(jax.random.key(5), x)['params']
    table = quantize_dense_tree(params, min_size=8192)  # cover 128x64 'b' too
    assert set(table) == {('a',), ('b',)}
    interceptor = make_dense_interceptor(table, mode, use_pallas=False)

    def f(x):
        with nn.intercept_methods(interceptor):
            return net.apply({'params': params}, x)

    got = np.asarray(jax.jit(f)(x))
    # manual quantized reference
    h = int8_matmul(
        x, *table[('a',)], act_quant=mode == 'w8a8', use_pallas=False
    ) + params['a']['bias']
    h = jax.nn.relu(h)
    ref = int8_matmul(
        h, *table[('b',)], act_quant=mode == 'w8a8', use_pallas=False
    ) + params['b']['bias']
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-5)
    exact = np.asarray(net.apply({'params': params}, x))
    rel = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    assert rel < 0.05, rel


def test_quantized_rnn_server():
    """serve-path integration: SampleServer(--quantize=int8) on the RNN
    (wh: 64x256 clears the thresholds) produces valid samples and reports
    the quantized-kernel count; the exported artifact reproduces the live
    quantized server bit-for-bit."""
    from generative_models_tpu.models.rnn import RNN
    from generative_models_tpu.serve import SampleServer
    from generative_models_tpu.utils.config import global_defaults

    G = global_defaults()
    G.model = 'rnn'
    G.hidden_size = 64
    G.append_loc = 1
    srv = SampleServer(RNN(G), serve_bs=2, quantize='int8')
    assert srv.quant_mode == 'w8a8' and srv.quant_kernels == 1
    out = srv.sample(2)
    assert out.shape == (2, 28, 28, 1)
    assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}
    assert srv.stats()['quantize'] == 'w8a8'


def test_quantized_export_matches_live(tmp_path):
    """--export with --quantize bakes the int8 graph: artifact == live
    quantized server at the same key, != the unquantized server."""
    from generative_models_tpu.models.rnn import RNN
    from generative_models_tpu.serve import ExportedServer, SampleServer
    from generative_models_tpu.utils.config import global_defaults

    G = global_defaults()
    G.model = 'rnn'
    G.hidden_size = 64
    G.append_loc = 1
    model = RNN(G)
    srv_q = SampleServer(model, serve_bs=2, quantize='w8a16')
    p = tmp_path / 'rnn_int8.stablehlo'
    srv_q.export_serving(p)
    raw = jax.random.key_data(jax.random.key(11))
    live = np.asarray(srv_q._call(raw))
    via = np.asarray(ExportedServer(p).exp.call(raw))
    np.testing.assert_array_equal(via, live)


def test_quantized_made_mask_fold():
    """MADE: w*mask is constant at serving time, so the mask folds into the
    int8 weights and the intercepted forward (1) matches the plain forward
    within quantization error and (2) preserves autoregressive causality
    (the folded weights inherit the mask's zeros exactly: 0/scale rounds
    to 0)."""
    import flax.linen as nn

    from generative_models_tpu.models.made import MADE
    from generative_models_tpu.ops.int8 import build_quant_interceptor
    from generative_models_tpu.utils.config import global_defaults

    G = global_defaults()
    G.model = 'made'
    G.hidden_size = 128
    model = MADE(G)
    interceptor, n = build_quant_interceptor(model, 'w8a16', use_pallas=False)
    assert n == 4  # 3 hidden + output, every mask folded
    x = (jax.random.uniform(jax.random.key(6), (4, 784)) > 0.5).astype(
        jnp.float32
    )
    exact = np.asarray(model.net.apply({'params': model.state.params}, x))

    def f(x):
        with nn.intercept_methods(interceptor):
            return model.net.apply({'params': model.state.params}, x)

    got = np.asarray(jax.jit(f)(x))
    rel = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    assert rel < 0.05, rel
    # causality through the quantized path: output i must ignore inputs >= i
    x2 = x.at[:, 500].set(1.0 - x[:, 500])
    got2 = np.asarray(jax.jit(f)(x2))
    np.testing.assert_array_equal(got[:, :501], got2[:, :501])


def test_quantized_made_server():
    from generative_models_tpu.models.made import MADE
    from generative_models_tpu.serve import SampleServer
    from generative_models_tpu.utils.config import global_defaults

    G = global_defaults()
    G.model = 'made'
    G.hidden_size = 128
    srv = SampleServer(MADE(G), serve_bs=2, quantize='w8a16')
    assert srv.quant_kernels == 4
    out = srv.sample(2)
    assert out.shape == (2, 28, 28, 1)
    assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}


def test_serve_cli_rejects_bad_quantize():
    from generative_models_tpu.models.rnn import RNN
    from generative_models_tpu.serve import SampleServer
    from generative_models_tpu.utils.config import global_defaults

    G = global_defaults()
    G.model = 'rnn'
    G.hidden_size = 64
    G.append_loc = 1
    with pytest.raises(SystemExit, match='int8'):
        SampleServer(RNN(G), serve_bs=2, quantize='fp4')


def test_quantize_refuses_model_sharded_mesh():
    """--quantize under a model-sharded mesh is refused: the int8 Pallas
    GEMM would consume TP-sharded weights inside a custom call GSPMD cannot
    partition (compile error or silent full replication on chip)."""
    import jax as _jax

    from generative_models_tpu.models.rnn import RNN
    from generative_models_tpu.parallel import make_mesh, set_mesh
    from generative_models_tpu.serve import SampleServer
    from generative_models_tpu.utils.config import global_defaults

    G = global_defaults()
    G.model = 'rnn'
    G.hidden_size = 64
    G.append_loc = 1
    try:
        set_mesh(make_mesh('data:4,model:2', _jax.devices()))
        with pytest.raises(SystemExit, match='does not compose'):
            SampleServer(RNN(G), serve_bs=2, quantize='int8')
        # data-only meshes replicate params: quantization stays allowed
        set_mesh(make_mesh('', _jax.devices()))
        srv = SampleServer(RNN(G), serve_bs=2, quantize='int8')
        assert srv.quant_kernels == 1
    finally:
        set_mesh(make_mesh('', _jax.devices()))


def test_transformer_decode_respects_interceptor():
    """Regression: the decode step's fused QKV matmul reads raw kernels,
    which would bypass a quantization interceptor entirely — under
    intercept_ctx the step must route through the individual
    query/key/value Dense calls so --quantize serving really quantizes
    them (and the fused fast path must stay numerically identical)."""
    import jax.numpy as jnp

    from generative_models_tpu.models.base import intercept_ctx
    from generative_models_tpu.models.pixel_transformer import TransformerNet

    net = TransformerNet(
        in_size=1, block_size=8, n_embed=32, n_head=2, n_layer=2,
        use_pallas=False,
    )
    x = jax.random.normal(jax.random.key(0), (3, 8, 1))
    params = net.init(jax.random.key(1), x)['params']
    caches = net.init_cache(3)
    tok = jnp.zeros((3, 1))

    def step(ic):
        seen = []

        def spy(next_fun, args, kwargs, context):
            seen.append('/'.join(map(str, context.module.path or ())))
            return next_fun(*args, **kwargs)

        with intercept_ctx(spy if ic else None):
            logits, _ = net.apply(
                {'params': params}, tok, caches, 0,
                method=TransformerNet.decode_step,
            )
        return np.asarray(logits), seen

    fused, seen0 = step(False)
    routed, seen1 = step(True)
    assert not seen0
    for layer in (0, 1):
        for name in ('query', 'key', 'value', 'proj'):
            assert f'block{layer}/attn/{name}' in seen1, (name, seen1)
    np.testing.assert_allclose(fused, routed, rtol=1e-5, atol=1e-6)
