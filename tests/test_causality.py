"""Causality unit tests for every masked architecture (SURVEY.md §4: perturb
pixel j, assert outputs at raster positions i <= j unchanged — the class of
bug the reference never tests for)."""

import jax
import jax.numpy as jnp
import numpy as np

from generative_models_tpu.models.gated_pixel_cnn import GatedPixelCNNNet
from generative_models_tpu.models.pixel_cnn import PixelCNNNet
from generative_models_tpu.models.rnn import LSTMPixelNet
from generative_models_tpu.models.wavenet import WavenetNet

SIDE = 10  # small canvas keeps jacobians cheap


def raster_causal_check(logits_fn, x0, j, side):
    """Perturb raster position j; positions <= j must be unchanged.
    (Type-A masked stacks: output i depends only on inputs < i, so output j
    itself must also be unchanged.)"""
    out0 = np.asarray(logits_fn(x0)).reshape(-1)
    x1 = x0.reshape(-1).at[j].add(10.0).reshape(x0.shape)
    out1 = np.asarray(logits_fn(x1)).reshape(-1)
    np.testing.assert_allclose(out0[: j + 1], out1[: j + 1], atol=1e-4)


def test_pixelcnn_causal():
    net = PixelCNNNet(n_filters=8, n_layers=2, kernel_size=5, use_resblock=False)
    x0 = jnp.zeros((1, SIDE, SIDE, 1)) + 0.5
    params = net.init(jax.random.key(0), x0)['params']
    fn = lambda x: net.apply({'params': params}, x)
    for j in [0, 1, SIDE + 3, SIDE * SIDE - 1]:
        raster_causal_check(fn, x0, j, SIDE)


def test_pixelcnn_resblock_causal():
    net = PixelCNNNet(n_filters=8, n_layers=2, kernel_size=5, use_resblock=True)
    x0 = jnp.zeros((1, SIDE, SIDE, 1)) + 0.5
    params = net.init(jax.random.key(0), x0)['params']
    fn = lambda x: net.apply({'params': params}, x)
    for j in [0, SIDE * 2 + 5, SIDE * SIDE - 1]:
        raster_causal_check(fn, x0, j, SIDE)


def test_gated_pixelcnn_causal():
    net = GatedPixelCNNNet(n_filters=8, n_layers=4, kernel_size=5)
    x0 = jnp.zeros((1, SIDE, SIDE, 1)) + 0.5
    params = net.init(jax.random.key(0), x0)['params']
    fn = lambda x: net.apply({'params': params}, x)
    for j in [0, 1, SIDE + 1, 5 * SIDE + 4, SIDE * SIDE - 1]:
        raster_causal_check(fn, x0, j, SIDE)


def test_gated_pixelcnn_no_blind_spot():
    """The pixel directly above-right must be visible (PixelCNN's blind spot,
    fixed by the vertical stack)."""
    net = GatedPixelCNNNet(n_filters=8, n_layers=4, kernel_size=5)
    x0 = jnp.zeros((1, SIDE, SIDE, 1)) + 0.5
    params = net.init(jax.random.key(1), x0)['params']
    fn = lambda x: np.asarray(net.apply({'params': params}, x)).reshape(-1)
    # target pixel (5, 2); perturb (4, 4): above and to the right
    tgt = 5 * SIDE + 2
    src = 4 * SIDE + 4
    out0 = fn(x0)
    x1 = x0.reshape(-1).at[src].add(10.0).reshape(x0.shape)
    out1 = fn(x1)
    assert abs(out0[tgt] - out1[tgt]) > 1e-6, 'blind spot: vstack not linked'


def test_wavenet_causal():
    net = WavenetNet(res_channels=8, use_resblock=True, layer_size=5)
    T = 64
    x0 = jnp.zeros((1, T, 3)) + 0.3
    params = net.init(jax.random.key(0), x0)['params']
    fn = lambda x: net.apply({'params': params}, x)
    out0 = np.asarray(fn(x0))[0]
    # perturb only the pixel channel (channel 0) at position j
    for j in [0, 7, 40, T - 1]:
        x1 = x0.at[0, j, 0].add(10.0)
        out1 = np.asarray(fn(x1))[0]
        np.testing.assert_allclose(out0[: j + 1], out1[: j + 1], atol=1e-4)
        if j < T - 1:
            assert np.any(np.abs(out0[j + 1 :] - out1[j + 1 :]) > 1e-6)


def test_lstm_shifted_input_causality():
    """The loss path right-shifts, so logits at t see inputs < t only."""
    net = LSTMPixelNet(hidden=16, in_channels=1)
    T = 12
    x0 = jnp.zeros((1, T, 1)) + 0.5
    params = net.init(jax.random.key(0), x0)['params']
    shift = lambda x: jnp.concatenate([jnp.zeros((1, 1, 1)), x[:, :-1]], axis=1)
    fn = lambda x: np.asarray(net.apply({'params': params}, shift(x)))[0]
    out0 = fn(x0)
    j = 6
    x1 = x0.at[0, j, 0].add(5.0)
    out1 = fn(x1)
    np.testing.assert_allclose(out0[: j + 1], out1[: j + 1], atol=1e-5)


def test_transformer_causal():
    from generative_models_tpu.models.pixel_transformer import TransformerNet

    net = TransformerNet(
        in_size=1, block_size=16, n_embed=16, n_head=2, n_layer=2, head='bin',
        use_pallas=False,
    )
    x0 = jnp.zeros((1, 16, 1)) + 0.5
    params = net.init(jax.random.key(0), x0)['params']
    fn = lambda x: np.asarray(net.apply({'params': params}, x).logits)[0, :, 0]
    out0 = fn(x0)
    j = 9
    x1 = x0.at[0, j, 0].add(5.0)
    out1 = fn(x1)
    # forward right-shifts internally: logits at positions <= j unchanged
    np.testing.assert_allclose(out0[: j + 1], out1[: j + 1], atol=1e-5)
    assert np.any(np.abs(out0[j + 1 :] - out1[j + 1 :]) > 1e-7)


def test_made_uses_pallas_mask_correctly():
    from generative_models_tpu.models.made import MaskedMLP, create_made_masks

    nin = 16
    masks = tuple(create_made_masks(nin, (8,), seed=0))
    net = MaskedMLP(hidden_sizes=(8,), nout=nin, masks=masks, use_pallas=False)
    x0 = jnp.zeros((1, nin)) + 0.5
    params = net.init(jax.random.key(0), x0)['params']
    out0 = np.asarray(net.apply({'params': params}, x0))[0]
    j = 7
    out1 = np.asarray(net.apply({'params': params}, x0.at[0, j].add(5.0)))[0]
    np.testing.assert_allclose(out0[: j + 1], out1[: j + 1], atol=1e-5)


def test_pixelcnn_incremental_decode_matches_full_forward():
    """The wavefront decode (one position per layer per step against cached
    canvases) must reproduce the full conv forward's logits on a
    teacher-forced cursor walk. Tolerance covers conv-vs-einsum reduction
    order only (an im2col full forward matches the decode bit-for-bit)."""
    import jax
    import numpy as np

    from generative_models_tpu.models.pixel_cnn import PixelCNNNet

    side = 8
    # (7, True) is the reference default; (5, True) exercises the
    # kernel_size != conv_mid-kernel (7) decoupling of the layer canvases
    for ksize, use_res in ((7, False), (7, True), (5, True)):
        net = PixelCNNNet(
            n_filters=16, n_layers=2, kernel_size=ksize, use_resblock=use_res
        )
        rng = np.random.RandomState(1)
        x = jnp.asarray((rng.rand(3, side, side, 1) > 0.5), jnp.float32)
        params = net.init(jax.random.key(0), x)['params']
        full_logits = net.apply({'params': params}, x)

        p = ksize // 2
        c0, layers = net.apply(
            {'params': params}, 3, side, method=PixelCNNNet.init_canvases
        )
        step = jax.jit(
            lambda cs, r, c: net.apply(
                {'params': params}, cs, r, c, method=PixelCNNNet.decode_step
            )
        )
        worst = 0.0
        for i in range(side * side):
            r, c = i // side, i % side
            logit, (c0, layers) = step((c0, layers), jnp.int32(r), jnp.int32(c))
            worst = max(
                worst, float(jnp.abs(logit - full_logits[:, r, c, 0]).max())
            )
            c0 = jax.lax.dynamic_update_slice(
                c0, x[:, r : r + 1, c : c + 1, :], (0, r + p, c + p, 0)
            )
        assert worst < 2e-2, f'k={ksize} use_resblock={use_res}: {worst}'


def test_gated_pixelcnn_incremental_decode_matches_full_forward():
    """The hybrid wavefront decode (per-pixel h-chain + per-row v-stack
    batch) must reproduce the full dual-stack forward's logits on a
    teacher-forced cursor walk."""
    import jax
    import numpy as np

    from generative_models_tpu.models.gated_pixel_cnn import GatedPixelCNNNet

    side = 8
    net = GatedPixelCNNNet(n_filters=16, n_layers=5, kernel_size=7)
    rng = np.random.RandomState(1)
    x = jnp.asarray((rng.rand(3, side, side, 1) > 0.5), jnp.float32)
    params = net.init(jax.random.key(0), x)['params']
    full_logits = net.apply({'params': params}, x)

    p = 3
    cv = net.apply({'params': params}, 3, side, method=GatedPixelCNNNet.init_canvases)
    step = jax.jit(
        lambda cv, r, c: net.apply(
            {'params': params}, cv, r, c,
            method=GatedPixelCNNNet.decode_step,
        )
    )
    worst = 0.0
    for i in range(side * side):
        r, c = i // side, i % side
        logit, cv = step(cv, jnp.int32(r), jnp.int32(c))
        worst = max(worst, float(jnp.abs(logit - full_logits[:, r, c, 0]).max()))
        c0 = jax.lax.dynamic_update_slice(
            cv['c0'], x[:, r : r + 1, c : c + 1, :], (0, r + p, c + p, 0)
        )
        cv = dict(cv, c0=c0)
    assert worst < 2e-2, worst
