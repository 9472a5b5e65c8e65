"""Checkpoint backends: flax-bytes (default) and orbax full-train-state."""

import jax
import jax.numpy as jnp
import numpy as np

from generative_models_tpu.models.made import MADE
from generative_models_tpu.utils.config import global_defaults


def small_G(tmp_path, **kw):
    G = global_defaults()
    G.bs = 16
    G.hidden_size = 32
    G.logdir = tmp_path
    G.data_source = 'synthetic'
    for k, v in kw.items():
        G[k] = v
    return G


def _params_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_orbax_roundtrip(tmp_path):
    G = small_G(tmp_path, ckpt='orbax')
    m = MADE(G)
    x = jnp.asarray(
        (np.random.RandomState(0).rand(16, 28, 28, 1) > 0.5).astype(np.float32)
    )
    m.train_step(x, None)
    m.save(tmp_path)
    assert (tmp_path / 'orbax_state').exists()

    m2 = MADE(small_G(tmp_path, ckpt='orbax'))
    m2.load_weights(tmp_path)
    _params_equal(m.params, m2.params)
    assert int(m2.state.step) == 1  # optimizer/step restored too


def test_orbax_weights_from_model_pt_path(tmp_path):
    """--weights_from logdir/model.pt must find a sibling orbax checkpoint."""
    G = small_G(tmp_path, ckpt='orbax')
    m = MADE(G)
    m.save(tmp_path)
    m2 = MADE(small_G(tmp_path, ckpt='orbax'))
    m2.load_weights(tmp_path / 'model.pt')
    _params_equal(m.params, m2.params)


def test_orbax_fsdp_roundtrip_and_retopology(tmp_path):
    """Sharded-state checkpointing: an FSDP (ZeRO-3) model saves through the
    host-gather path, and the checkpoint restores (1) into a fresh FSDP
    model — params equal, Adam moments + step restored, leaves re-sharded
    over 'data' — and (2) into a single-device replicated model (elastic
    re-topology: the checkpoint is topology-free)."""
    import jax as _jax

    from generative_models_tpu.parallel import make_mesh, set_mesh

    set_mesh(make_mesh('', _jax.devices()))  # data:8
    try:
        G = small_G(tmp_path, ckpt='orbax', hidden_size=128, fsdp=1)
        m = MADE(G)
        x = jnp.asarray(
            (np.random.RandomState(1).rand(16, 28, 28, 1) > 0.5).astype(
                np.float32
            )
        )
        m.train_step(x, None)
        m.save(tmp_path)
        saved_params = jax.device_get(m.params)

        m2 = MADE(small_G(tmp_path, ckpt='orbax', hidden_size=128, fsdp=1))
        m2.load_weights(tmp_path)
        _params_equal(m.params, m2.params)
        _params_equal(m.state.opt_state, m2.state.opt_state)
        assert int(m2.state.step) == 1
        n_sharded = sum(
            1
            for leaf in jax.tree_util.tree_leaves(m2.state.params)
            if 'data' in tuple(getattr(leaf.sharding, 'spec', ()))
        )
        assert n_sharded > 0, 'restored params lost their FSDP placement'
        # training continues bit-for-bit from the restored state
        a = m.train_step(x, None)
        b = m2.train_step(x, None)
        np.testing.assert_allclose(float(a['nlogp']), float(b['nlogp']), rtol=1e-6)

        set_mesh(make_mesh('', _jax.devices()[:1]))
        m1 = MADE(small_G(tmp_path, ckpt='orbax', hidden_size=128, fsdp=0))
        m1.load_weights(tmp_path)
        _params_equal(saved_params, m1.params)
        assert int(m1.state.step) == 1
    finally:
        set_mesh(make_mesh('', _jax.devices()))


def test_auto_resume_continues_epoch_loop(tmp_path, monkeypatch, capsys):
    """--resume=1: rerunning the SAME command after an interruption reloads
    the logdir checkpoint (full train state) and continues the epoch loop
    where it stopped — epochs already trained are not repeated. First run
    is a fresh start (no checkpoint yet)."""
    import generative_models_tpu.data.mnist as mdata
    from generative_models_tpu.main import main

    monkeypatch.setattr(mdata, 'TRAIN_N', 64)  # 4 steps/epoch at bs=16
    monkeypatch.setattr(mdata, 'TEST_N', 32)
    args = [
        '--model=made',
        f'--logdir={tmp_path}',
        '--bs=16',
        '--hidden_size=32',
        '--data_source=synthetic',
        '--save_n=1',
        '--eval_heavy=0',
        '--resume=1',
    ]
    main(args + ['--epochs=1'])
    out1 = capsys.readouterr().out
    assert 'RESUMED' not in out1  # nothing to resume on the first run

    main(args + ['--epochs=3'])
    out2 = capsys.readouterr().out
    assert 'RESUMED' in out2 and 'at step 4' in out2
    assert 'RESUMING at epoch 1' in out2

    m = MADE(small_G(tmp_path, hidden_size=32, bs=16))
    m.load_weights(tmp_path / 'model.pt')
    # 1 epoch from run one + 2 more (epochs 1, 2) from the resumed run
    assert int(m.state.step) == 12

    # --grad_accum does NOT change the step-per-epoch accounting: state.step
    # increments per train_step call (per micro-batch; optax.MultiSteps only
    # gates the optimizer update), so resume must not divide by accum
    ga = ['--grad_accum=2']
    d2 = tmp_path / 'ga'
    main(args[:1] + [f'--logdir={d2}'] + args[2:] + ga + ['--epochs=1'])
    main(args[:1] + [f'--logdir={d2}'] + args[2:] + ga + ['--epochs=2'])
    out3 = capsys.readouterr().out
    assert 'RESUMING at epoch 1' in out3  # step 4 / 4 steps-per-epoch = 1


def test_keep_best_checkpoint(tmp_path, monkeypatch, capsys):
    """--keep_best=nlogp: the harness saves model_best.pt + best.json
    whenever eval/nlogp improves, and the best checkpoint is loadable via
    --weights_from logdir/model_best.pt (the serving round-trip entry).
    Motivated by round-4 RESULTS rows where the best epoch a run visited
    (wavenet 0.108@1, gan 0.081@10) was not a reproducible artifact."""
    import json

    import generative_models_tpu.data.mnist as mdata
    from generative_models_tpu.main import main

    monkeypatch.setattr(mdata, 'TRAIN_N', 64)
    monkeypatch.setattr(mdata, 'TEST_N', 32)
    args = [
        '--model=made',
        f'--logdir={tmp_path}',
        '--bs=16',
        '--hidden_size=32',
        '--data_source=synthetic',
        '--save_n=5',
        '--eval_heavy=0',
        '--keep_best=nlogp',
        '--epochs=3',
    ]
    main(args)
    out = capsys.readouterr().out
    assert 'SAVED BEST' in out
    assert (tmp_path / 'model_best.pt').exists()
    best = json.loads((tmp_path / 'best.json').read_text())
    assert best['metric'] == 'eval/nlogp'
    assert np.isfinite(best['value']) and best['epoch'] >= 0

    # the best checkpoint round-trips through the normal weights path
    m = MADE(small_G(tmp_path, hidden_size=32, bs=16))
    m.load_weights(tmp_path / 'model_best.pt')
    assert int(m.state.step) == 4 * best['epoch']


def test_keep_best_orbax_backend(tmp_path, monkeypatch):
    """--keep_best under --ckpt=orbax writes orbax_state_best, and
    --weights_from logdir/model_best.pt maps onto it (the same filename
    contract the flax backend serves)."""
    import generative_models_tpu.data.mnist as mdata
    from generative_models_tpu.main import main

    monkeypatch.setattr(mdata, 'TRAIN_N', 64)
    monkeypatch.setattr(mdata, 'TEST_N', 32)
    main([
        '--model=made', f'--logdir={tmp_path}', '--bs=16',
        '--hidden_size=32', '--data_source=synthetic', '--save_n=5',
        '--eval_heavy=0', '--keep_best=nlogp', '--ckpt=orbax', '--epochs=2',
    ])
    assert (tmp_path / 'orbax_state_best').is_dir()
    m = MADE(small_G(tmp_path, hidden_size=32, bs=16, ckpt='orbax'))
    m.load_weights(tmp_path / 'model_best.pt')
    assert int(m.state.step) > 0
