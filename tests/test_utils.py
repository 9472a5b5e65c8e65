"""Coverage for utils: distributions, viz tiling, logger flush."""

import jax
import jax.numpy as jnp
import numpy as np

from generative_models_tpu.utils import combine_imgs, dists, grid_image, make_logger
from generative_models_tpu.utils.dists import normal_kl


def test_bernoulli_log_prob_matches_formula():
    logits = jnp.asarray([-3.0, -0.5, 0.0, 2.0])
    x = jnp.asarray([0.0, 1.0, 1.0, 0.0])
    p = jax.nn.sigmoid(logits)
    expect = x * jnp.log(p) + (1 - x) * jnp.log1p(-p)
    got = dists.Bernoulli(logits=logits).log_prob(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-5)


def test_bernoulli_extreme_logits_stable():
    logits = jnp.asarray([-100.0, 100.0])
    lp = dists.Bernoulli(logits=logits).log_prob(jnp.asarray([1.0, 0.0]))
    assert np.all(np.isfinite(np.asarray(lp)))


def test_normal_log_prob_matches_scipy():
    from scipy.stats import norm

    x = jnp.asarray([-1.0, 0.3, 2.0])
    d = dists.Normal(jnp.asarray(0.5), jnp.asarray(1.7))
    np.testing.assert_allclose(
        np.asarray(d.log_prob(x)), norm.logpdf(np.asarray(x), 0.5, 1.7), rtol=1e-5
    )


def test_normal_kl_zero_for_identical():
    kl = normal_kl(jnp.asarray(0.3), jnp.asarray(1.2), 0.3, 1.2)
    np.testing.assert_allclose(float(kl), 0.0, atol=1e-6)


def test_categorical_one_hot_log_prob():
    logits = jnp.asarray([[1.0, 2.0, 0.0]])
    one_hot = jnp.asarray([[0.0, 1.0, 0.0]])
    expect = jax.nn.log_softmax(logits)[0, 1]
    got = dists.Categorical(logits=logits).log_prob(one_hot)[0]
    np.testing.assert_allclose(float(got), float(expect), rtol=1e-6)


def test_bernoulli_sample_statistics():
    logits = jnp.zeros((10000,))
    s = dists.Bernoulli(logits=logits).sample(jax.random.key(0))
    assert 0.45 < float(s.mean()) < 0.55


def test_grid_image_tiling():
    imgs = np.arange(25 * 4 * 4 * 1, dtype=np.float32).reshape(25, 4, 4, 1)
    g = grid_image(imgs, 5, 5)
    assert g.shape == (20, 20, 1)
    # top-left tile is image 0, next tile to the right is image 1
    np.testing.assert_array_equal(g[:4, :4, 0], imgs[0, :, :, 0])
    np.testing.assert_array_equal(g[:4, 4:8, 0], imgs[1, :, :, 0])


def test_combine_imgs_video():
    vids = np.random.rand(4, 3, 28, 28, 1).astype(np.float32)
    out = combine_imgs(vids, 2, 2)
    assert out.shape == (3, 56, 56, 1)
    np.testing.assert_array_equal(out[1, :28, :28, 0], vids[0, 1, :, :, 0])


def test_logger_flush_means(tmp_path):
    from generative_models_tpu.utils import dump_logger
    from generative_models_tpu.utils.config import global_defaults

    logger = make_logger()
    logger['a/b'].append(jnp.asarray(1.0))
    logger['a/b'].append(jnp.asarray(3.0))
    G = global_defaults()
    G.logdir = tmp_path
    fresh = dump_logger(logger, None, 0, G)
    assert len(fresh) == 0
    assert (tmp_path / 'hps.yaml').exists()


def test_gridvid_tb_native_animated_gif(tmp_path):
    """write_gridvid embeds the animated GIF as a TB-native image summary
    (the same wire format torch's add_video produces) AND writes the GIF
    file next to the logs."""
    import glob

    from torch.utils.tensorboard import SummaryWriter

    from generative_models_tpu.utils.logger import write_gridvid

    w = SummaryWriter(str(tmp_path))
    x = np.random.rand(6, 25, 28, 28, 1).astype(np.float32)
    write_gridvid(w, 'test/vid', x, 0, logdir=str(tmp_path))
    w.flush()
    w.close()
    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader,
    )

    found = False
    for f in glob.glob(str(tmp_path / 'events*')):
        for ev in EventFileLoader(f).Load():
            if not ev.HasField('summary'):
                continue
            for v in ev.summary.value:
                if v.tag == 'test/vid' and v.HasField('tensor'):
                    enc = v.tensor.string_val[2]
                    assert enc[:6] in (b'GIF89a', b'GIF87a')
                    assert v.metadata.plugin_data.plugin_name == 'images'
                    found = True
    assert found, 'no TB-native animated image summary written'
    assert (tmp_path / 'test_vid_0.gif').exists()
