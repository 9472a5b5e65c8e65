"""Training harness / CLI.

API-compatible with the reference entry point (gms/main.py):

    python -m generative_models_tpu.main --model=<name> [--flag=val ...]

Same two-phase flag parsing, same epoch structure (eval FIRST, then train,
final eval after the last epoch), same TB key conventions
(<model>/train/<k>, <model>/test/<k>, nlogp promoted to train/ & eval/),
same artifacts (model checkpoint + hps.yaml + sample grids + sampling-process
animations).

TPU-native differences:
  * the whole train epoch runs as one jitted lax.scan over on-device data
    (--jit_epoch=1, default) — no per-step H2D batch copies or D2H metric
    pulls (the reference does both every step, gms/main.py:208,215);
  * eval_heavy (FID / precision / recall) runs on device (utils/metrics.py);
  * checkpoints store the full train state (params + optimizer + step + rng),
    not weights-only.
"""

import time
from itertools import count
from pathlib import Path

import jax
import numpy as np

from generative_models_tpu import data as data_lib
from generative_models_tpu.parallel import (
    make_mesh, maybe_initialize_distributed, set_mesh,
)
from generative_models_tpu.utils import (
    count_vars,
    discover_models,
    dump_logger,
    make_logger,
    prefix_dict,
    to_numpy,
)
from generative_models_tpu.utils.config import (
    maybe_enable_compile_cache, parse_args,
)

TOTAL_HEAVY_SAMPLES = 500  # reference: gms/main.py:101


def make_writer(logdir):
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(str(logdir))
    except ImportError:
        print('[logger] tensorboard unavailable; scalar logs go to stdout only')
        return None


def load_model_and_data(argv=None):
    """Two-phase parse, model + data construction (reference: gms/main.py:43-92)."""
    maybe_initialize_distributed()
    G, Model = parse_args(argv, discover_models=discover_models)
    if G.get('device'):
        # reference --device parity (gms/main.py:24): pick the JAX platform
        # ('cpu', 'tpu', or a priority list like 'tpu,cpu') before the first
        # backend use; '' (default) keeps the environment's platform.
        import os

        prev_env = os.environ.get('JAX_PLATFORMS')
        prev_cfg = jax.config.jax_platforms
        os.environ['JAX_PLATFORMS'] = G.device
        jax.config.update('jax_platforms', G.device)
        # the update is a silent no-op once a backend is initialized (e.g.
        # in-process callers / tests); verify the effective platform rather
        # than silently training on the wrong one
        if jax.default_backend() not in G.device.split(','):
            # roll back so the rejected platform doesn't leak into this
            # process's env (and from there into any subprocess it spawns)
            if prev_env is None:
                os.environ.pop('JAX_PLATFORMS', None)
            else:
                os.environ['JAX_PLATFORMS'] = prev_env
            jax.config.update('jax_platforms', prev_cfg)
            raise ValueError(
                f'--device={G.device} requested but this process is using '
                f'the {jax.default_backend()} backend'
            )
    maybe_enable_compile_cache(G)
    set_mesh(make_mesh(G.get('mesh', '')))
    G.logdir = Path(G.logdir)
    model = Model(G=G)
    if G.weights_from != Path('.'):
        model.load_weights(G.weights_from)
    elif int(G.get('resume', 0)):
        # auto-resume: pick up the logdir's own checkpoint (if any) and
        # continue — train() derives the epoch to restart from off the
        # restored step counter. Safe to run as the FIRST invocation too
        # (no checkpoint yet -> fresh start).
        ckpt = Path(G.logdir) / 'model.pt'
        if ckpt.exists() or (Path(G.logdir) / 'orbax_state').exists():
            model.load_weights(ckpt)
            print(f'RESUMED {G.logdir} at step {int(model.state.step)}')
    dataset = data_lib.load_mnist(G)
    print('num_vars', count_vars(model.params))

    autoencoder = classifier = None
    if G.eval_heavy:
        from generative_models_tpu.models.arbiters import load_arbiter

        autoencoder = load_arbiter(G.autoencoder)
        if G.class_cond:
            classifier = load_arbiter(G.classifier)
    return model, dataset, autoencoder, classifier, G


def eval_heavy(logger, model, dataset, autoencoder, classifier, G):
    """Draw >=500 samples, score FID + precision/recall (+ conditional
    metrics) in the arbiter's latent space — reference: gms/main.py:95-149,
    rebuilt fully on-device."""
    from generative_models_tpu.utils import metrics as M

    sample_ct = 0
    all_z_sample, all_z_real, all_z_cond = [], [], []
    cls_losses = []  # device scalars; synced to host ONCE at the end
    bs = G.bs
    n_test = dataset.test_x.shape[0]
    offset = 0
    while sample_ct < TOTAL_HEAVY_SAMPLES:
        test_x = dataset.test_x[offset : offset + bs]
        test_y = dataset.test_y[offset : offset + bs]
        offset += bs
        if test_x.shape[0] < bs or offset > n_test:
            break
        if G.class_cond:
            cond_samp = model.sample_images(bs, y=test_y)
            logits = classifier.apply(cond_samp)
            cls_losses.append(M.cross_entropy(logits, test_y))
            all_z_cond.append(autoencoder.apply(cond_samp))
        # unconditional draw: only CF-guided models take a label argument
        # (y=-1 is their unconditional branch, reference gms/main.py:125).
        # sample_images is the zoo-wide samples-only contract (no
        # sampling-video frames); the reference's eval_heavy assumes the
        # diffusion signature and crashes for every other model
        # (gms/main.py:125-126), so it only ever ran for diffusion.
        if G.class_cond:
            samp = model.sample_images(bs, y=-np.ones(bs, np.int32))
        else:
            samp = model.sample_images(bs)
        all_z_real.append(autoencoder.apply(test_x))
        all_z_sample.append(autoencoder.apply(samp))
        sample_ct += bs

    import jax.numpy as jnp

    z_samp = jnp.concatenate(all_z_sample)
    z_real = jnp.concatenate(all_z_real)
    results = {}
    # 'ignite_fid' in the reference is standard-formula FID over the same
    # autoencoder features (gms/main.py:108,134)
    results['ignite_fid'] = M.frechet_distance(z_samp, z_real, mean_of_sq=False)
    results['fid'] = M.compute_fid(z_samp, z_real)
    results.update(M.precision_recall_f1(real=z_real, gen=z_samp))
    if G.class_cond:
        results['classifier_loss'] = jnp.stack(cls_losses).mean()
        z_cond = jnp.concatenate(all_z_cond)
        cond = M.precision_recall_f1(real=z_real, gen=z_cond)
        cond['fid'] = M.compute_fid(z_cond, z_real)
        results.update(prefix_dict('cond_', cond))
    for key, val in results.items():
        logger[f'eval/{key}'].append(float(np.mean(to_numpy(val))))


def train(model, dataset, autoencoder, classifier, G):
    writer = make_writer(G.logdir)
    logger = dump_logger(make_logger(), writer, 0, G)
    eval_key = jax.random.key(G.get('seed', 0) + 1000)
    data_key = jax.random.key(G.get('seed', 0) + 2000)

    if G.get('profile', 0):
        try:
            jax.profiler.start_trace(str(Path(G.logdir) / 'profile'))
        except Exception as e:  # remote platforms may not support tracing
            print(f'[profiler] trace unavailable: {e}')
            G.profile = 0

    # --keep_best=<metric>: track an eval metric (lower is better) and save
    # model_best.pt whenever it improves, so the best epoch a run visits is
    # a servable artifact, not just a row in RESULTS.json. Shorthands map to
    # the harness's own logger keys; any full key works too.
    best_metric = {'nlogp': 'eval/nlogp', 'fid': 'eval/fid'}.get(
        str(G.get('keep_best', '')), str(G.get('keep_best', ''))
    )
    best_path = Path(G.logdir) / 'best.json'
    best = {'metric': best_metric, 'value': float('inf'), 'epoch': -1}
    if best_metric and int(G.get('resume', 0)) and best_path.exists():
        import json

        prev = json.loads(best_path.read_text())
        if prev.get('metric') == best_metric:
            best = prev  # don't regress the best checkpoint across resumes

    start_epoch = 0
    if int(G.get('resume', 0)) and int(model.state.step) > 0:
        # the step counter is part of the checkpointed train state and
        # increments once per train_step CALL — i.e. per micro-batch even
        # under --grad_accum (optax.MultiSteps only gates the optimizer
        # update, models/base.py train_step) — so epochs trained is simply
        # step / steps_per_epoch
        start_epoch = int(model.state.step) // max(1, dataset.steps_per_epoch)
        print(f'RESUMING at epoch {start_epoch}')

    for epoch in count(start_epoch):
        # ---- TEST (eval first: reference gms/main.py:157-183) ----
        if model.has_loss():
            ek = jax.random.fold_in(eval_key, epoch)
            bx, by = dataset.epoch_batches(ek, train=False)
            test_metrics = jax.device_get(model.eval_epoch(bx, by))
            for key, val in test_metrics.items():
                prefix_key = (
                    f'{G.model}/test/{key}' if key != 'nlogp' else 'eval/nlogp'
                )
                logger[prefix_key].append(float(val))
            if getattr(model, 'is_autoreg', False) and 'nlogp' in test_metrics:
                # test-set bits/dim for autoregressive likelihood models: the
                # AR losses are mean per-pixel Bernoulli NLL in nats, so
                # bits/dim = nlogp / ln 2. (The reference lists this as a
                # TODO, reference README.md:145-148; implemented here.)
                logger['eval/bits_per_dim'].append(
                    float(test_metrics['nlogp']) / float(np.log(2.0))
                )
        test_x, test_y = dataset.first_test_batch(epoch)
        eval_time = time.time()
        model.evaluate(writer, test_x, test_y, epoch)
        logger['dt/eval'] = [time.time() - eval_time]

        # ---- LOGGING / SAVE / HEAVY EVAL ----
        logger['num_vars'] = [count_vars(model.params)]
        if epoch % G.save_n == 0:
            model.save(G.logdir, test_x, test_y)
            print('SAVED MODEL', G.logdir)
            if G.eval_heavy:
                print('RUNNING HEAVY EVAL...')
                t0 = time.time()
                eval_heavy(logger, model, dataset, autoencoder, classifier, G)
                logger['dt/eval_heavy'] = [time.time() - t0]
                print('DONE HEAVY EVAL')
        if best_metric and logger.get(best_metric):
            val = float(np.mean(logger[best_metric]))
            if val < float(best['value']):
                best = {'metric': best_metric, 'value': val, 'epoch': epoch}
                model.save(G.logdir, test_x, test_y, tag='best')
                import json

                best_path.write_text(json.dumps(best))
                print(f'SAVED BEST ({best_metric}={val:.4f} @ epoch {epoch})')
        logger = dump_logger(logger, writer, epoch, G)

        if epoch >= G.epochs:
            break

        # ---- TRAIN ----
        train_time = time.time()
        if not G.skip_training:
            dk = jax.random.fold_in(data_key, epoch)
            step_metrics = None
            if getattr(dataset, 'is_streaming', False):
                # host-streaming path (data/stream.py): batches arrive from
                # the prefetch thread already device-placed; every step
                # dispatches async and metrics sync to host once at epoch
                # end. --stream_chunk=k>1 stages stacked blocks and runs the
                # jitted k-step scan per block (k-fold fewer dispatches).
                chunk = int(G.get('stream_chunk', 1))
                with dataset.stream_epoch(dk, chunk=chunk) as batches:
                    if chunk > 1:
                        step_metrics = [
                            model.train_epoch(cx, cy) for cx, cy in batches
                        ]
                    else:
                        step_metrics = [
                            model.train_step(x, y) for x, y in batches
                        ]
            elif G.get('jit_epoch', 1):
                bx, by = dataset.epoch_batches(dk, train=True)
                metrics = model.train_epoch(bx, by)
                metrics = jax.device_get(jax.block_until_ready(metrics))
                for key, val in metrics.items():
                    prefix_key = (
                        f'{G.model}/train/{key}' if key != 'nlogp' else 'train/nlogp'
                    )
                    logger[prefix_key].append(float(val))
            else:
                # per-step debug path: dispatch every step async, sync to
                # host ONCE at epoch end (device scalars stay on device
                # during the loop)
                bx, by = dataset.epoch_batches(dk, train=True)
                step_metrics = [
                    model.train_step(bx[i], by[i]) for i in range(bx.shape[0])
                ]
            if step_metrics is not None:
                for metrics in jax.device_get(step_metrics):
                    for key in metrics:
                        prefix_key = (
                            f'{G.model}/train/{key}'
                            if key != 'nlogp'
                            else 'train/nlogp'
                        )
                        logger[prefix_key].append(float(metrics[key]))
        logger['dt/train'] = [time.time() - train_time]

        if int(G.get('nan_guard', 1)):
            # fail fast on a blown-up run: a non-finite train metric means
            # every later epoch is wasted chip time (and a checkpointed NaN
            # state would poison --resume). The reference trains on
            # obliviously (gms/main.py:205-217).
            bad = {
                k: v
                for k, v in logger.items()
                if k.split('/')[-2:-1] == ['train']
                and v
                and not np.all(np.isfinite(v))
            }
            if bad:
                raise FloatingPointError(
                    f'non-finite train metrics at epoch {epoch}: '
                    f'{sorted(bad)} (set --nan_guard=0 to train through)'
                )

    if G.get('profile', 0):
        jax.profiler.stop_trace()


def main(argv=None):
    model, dataset, autoencoder, classifier, G = load_model_and_data(argv)
    train(model, dataset, autoencoder, classifier, G)


if __name__ == '__main__':
    main()
