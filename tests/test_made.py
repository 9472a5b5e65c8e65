import jax
import jax.numpy as jnp
import numpy as np

from generative_models_tpu.models.made import MADE, MaskedMLP, create_made_masks
from generative_models_tpu.utils.config import global_defaults


def small_G(**kw):
    G = global_defaults()
    G.bs = 16
    G.hidden_size = 64
    G.data_source = 'synthetic'
    for k, v in kw.items():
        G[k] = v
    return G


def test_mask_causality_jacobian():
    """Output i must depend only on inputs with rank < i (SURVEY.md §4)."""
    nin = 12
    masks = tuple(create_made_masks(nin, (24, 24), seed=3))
    net = MaskedMLP(hidden_sizes=(24, 24), nout=nin, masks=masks, use_pallas=False)
    params = net.init(jax.random.key(0), jnp.zeros((1, nin)))['params']
    jac = jax.jacobian(lambda x: net.apply({'params': params}, x[None])[0])(
        jnp.ones(nin) * 0.5
    )
    for i in range(nin):
        # strictly autoregressive: d out_i / d in_j == 0 for all j >= i
        assert np.allclose(np.asarray(jac[i, i:]), 0.0), f'output {i} sees future'


def test_loss_decreases():
    G = small_G()
    model = MADE(G)
    x = jnp.asarray(
        (np.random.RandomState(0).rand(16, 28, 28, 1) > 0.5).astype(np.float32)
    )
    first = None
    for _ in range(20):
        metrics = model.train_step(x, None)
        if first is None:
            first = float(metrics['nlogp'])
    assert float(metrics['nlogp']) < first


def test_train_epoch_scan_matches_stepwise():
    G = small_G()
    m1, m2 = MADE(G), MADE(G)
    rng = np.random.RandomState(0)
    bx = jnp.asarray((rng.rand(3, 16, 28, 28, 1) > 0.5).astype(np.float32))
    by = jnp.zeros((3, 16), jnp.int32)
    m1.train_epoch(bx, by)
    for i in range(3):
        m2.train_step(bx[i], by[i])
    leaves1 = jax.tree_util.tree_leaves(m1.params)
    leaves2 = jax.tree_util.tree_leaves(m2.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sample_shapes():
    G = small_G()
    model = MADE(G)
    samples, frames = model.sample(25)
    assert samples.shape == (25, 28, 28, 1)
    assert frames.shape == (784, 25, 28, 28, 1)
    vals = np.unique(np.asarray(samples))
    assert set(vals.tolist()) <= {0.0, 1.0}


def test_sample_images_matches_frames_path():
    """sample_images (eval_heavy's bulk path) must draw the exact same
    samples as the video-producing sample(), just without stacking the
    (T, n, H, W, 1) frames."""
    G = small_G()
    model = MADE(G)
    rng = jax.random.key(7)
    full, frames = model.sample_fn(model.state, 4, rng, True)
    only = model.sample_fn(model.state, 4, rng, False)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(only))
    np.testing.assert_array_equal(np.asarray(frames[-1]), np.asarray(full))
    assert model.sample_images(4).shape == (4, 28, 28, 1)


def test_save_load_roundtrip(tmp_path):
    G = small_G()
    model = MADE(G)
    x = jnp.asarray(
        (np.random.RandomState(0).rand(16, 28, 28, 1) > 0.5).astype(np.float32)
    )
    model.train_step(x, None)
    model.save(tmp_path)
    model2 = MADE(small_G())
    model2.load_weights(tmp_path / 'model.pt')
    for a, b in zip(
        jax.tree_util.tree_leaves(model.params),
        jax.tree_util.tree_leaves(model2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(model2.state.step) == 1  # full train state restored


def test_all_autoregs_sample_images_matches_frames_path():
    """Every Autoreg's no-frames sampling path (the eval_heavy bulk
    contract) must draw identical samples to its video-producing path under
    the same rng — the canvas/cache machinery differs per model."""
    from generative_models_tpu.utils import discover_models
    from generative_models_tpu.utils.config import parse_args

    small = {
        'rnn': ['--hidden_size=16'],
        'wavenet': ['--hidden_size=8'],
        'pixel_cnn': ['--n_filters=8', '--n_layers=1'],
        'gated_pixel_cnn': ['--n_filters=8', '--n_layers=1'],
        'pixel_transformer': ['--n_layer=1', '--n_head=2', '--n_embed=16'],
    }
    for name, flags in small.items():
        G, Model = parse_args(
            [f'--model={name}', '--bs=4', '--data_source=synthetic',
             '--logdir=/tmp/t_sample_images'] + flags,
            discover_models=discover_models,
        )
        model = Model(G=G)
        rng = jax.random.key(11)
        full, _frames = model.sample_fn(model.state, 2, rng, True)
        only = model.sample_fn(model.state, 2, rng, False)
        np.testing.assert_array_equal(
            np.asarray(full), np.asarray(only), err_msg=name
        )
