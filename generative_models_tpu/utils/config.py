"""Config system: AttrDict + per-model DG defaults + two-phase argparse +
hps.yaml round-trip.

API-compatible with the reference config UX (reference: gms/common.py:24-26,
gms/common.py:85-92, gms/main.py:20-77): `--model=<name>` selects the model,
whose class-level `DG` dict contributes additional flags; `--weights_from`
reloads the full config from the run's sibling hps.yaml.
"""

import argparse
import sys
from pathlib import Path

import yaml


class AttrDict(dict):
    """dict with attribute access (reference: gms/common.py:24-26)."""

    __setattr__ = dict.__setitem__
    __getattr__ = dict.__getitem__


def prefix_dict(name, d):
    return {name + key: d[key] for key in d}


def args_type(default):
    """Coerce CLI strings the same way the reference does
    (reference: gms/common.py:85-92): bools parse 'False'/'True', ints
    promote to float when the string looks float-y, Paths expanduser."""
    if isinstance(default, bool):
        return lambda x: bool(['False', 'True'].index(x))
    if isinstance(default, int):
        return lambda x: float(x) if ('e' in x or '.' in x) else int(x)
    if isinstance(default, Path):
        return lambda x: Path(x).expanduser()
    return type(default)


def global_defaults():
    """Global default config (reference: gms/main.py:20-40), plus TPU-native
    additions: seed (explicit RNG threading), jit_epoch (scan the whole epoch
    inside one jit), num_devices/mesh_axes (parallelism layer)."""
    DG = AttrDict()
    DG.model = 'vae'
    DG.bs = 64
    DG.hidden_size = 256
    # jax platform override ('cpu', 'tpu', or a 'tpu,cpu' priority list);
    # '' = the environment's default platform. Reference default was 'cuda'.
    DG.device = ''
    DG.epochs = 50
    DG.save_n = 5
    DG.logdir = Path('./logs/')
    DG.lr = 3e-4
    DG.class_cond = 0
    DG.binarize = 1
    DG.pad32 = 0
    DG.mode = 'train'
    DG.weights_from = Path('.')
    DG.autoencoder = Path('./weights/autoencoder.pt')
    DG.classifier = Path('./weights/classifier.pt')
    DG.eval_heavy = 0
    DG.skip_training = 0
    # --- TPU-native extensions (not in the reference) ---
    DG.seed = 0
    DG.jit_epoch = 1          # scan all steps of an epoch inside one jit
    DG.data_source = 'auto'   # 'auto' | 'mnist' | 'digits' | 'synthetic'
    DG.data_dir = Path('./data/')
    DG.mesh = ''              # e.g. 'data:8' or 'data:4,model:2'; '' = all-data
    DG.profile = 0            # emit jax.profiler traces into logdir
    DG.lr_scheduler = 'none'  # 'none' | 'cosine' (the reference declares
    # this flag on its diffusion model but never reads it; here it is real)
    DG.grad_clip = 0.0        # >0: clip grads to this global norm
    DG.grad_accum = 1         # >1: accumulate k micro-batch grads per update
    DG.warmup_steps = 0       # linear 0->lr warmup steps
    DG.lr_decay_steps = 0     # cosine decay horizon (with --lr_scheduler)
    DG.fsdp = 0               # ZeRO-3: shard params + Adam moments over the
    # 'data' mesh axis (parallel/mesh.py::fsdp_place); composes with TP rules
    DG.remat = 0              # rematerialize blocks in the backward
    # (jax.checkpoint): ~1/3 more FLOPs for O(depth) less activation HBM;
    # honored by pixel_transformer (incl. pipe/ring paths) + diffusion UNet
    DG.stream_data = 0        # host-streaming data path (data/stream.py):
    # keep the training split host-resident and double-buffer shuffled
    # batches to device via a background prefetch thread — the pipeline
    # shape for datasets beyond HBM (np.memmap-backed splits work)
    DG.prefetch_depth = 2     # staged-batch queue depth for --stream_data
    DG.stream_chunk = 1       # --stream_data with chunk k>1: stage stacked
    # (k, bs, ...) blocks and run the jitted k-step epoch scan per block —
    # k-fold fewer dispatch round-trips (the measured streaming overhead on
    # fast-step models, docs/PERF.md) with device memory bounded by k
    # batches; batch order is identical to k=1
    DG.ckpt = 'flax'          # checkpoint backend: 'flax' bytes | 'orbax'
    DG.compile_cache = ''     # persistent XLA compile-cache dir ('' = off):
    # re-runs reload compiled executables from disk instead of recompiling
    DG.nan_guard = 1          # abort on non-finite train metrics (a blown-up
    # run wastes every later epoch and poisons --resume checkpoints)
    DG.keep_best = ''         # metric to track for a best-checkpoint
    # ('nlogp' -> eval/nlogp, 'fid' -> eval/fid, or any full logger key):
    # whenever the tracked metric improves (lower is better), the harness
    # saves model_best.pt (or orbax_state_best) + best.json next to the
    # cadence saves, so best-epoch rows in RESULTS.json are servable
    # artifacts (--weights_from logdir/model_best.pt). '' = off.
    DG.resume = 0             # auto-resume: reload logdir's checkpoint (full
    # train state: params + optimizer + step) and continue the epoch loop
    # where it stopped — rerun the SAME command after a preemption/crash.
    # The reference's closest feature is the manual weights-only
    # --weights_from warm start (gms/main.py:55-64, no optimizer/epoch).
    return DG


def maybe_enable_compile_cache(G):
    """--compile_cache=DIR: persistent XLA compilation cache. The first jit
    of each model costs 20-40s on TPU; later runs/restarts reload the
    compiled executable from disk (keyed on HLO + compiler version).
    Measured win in docs/PERF.md. Used by both the training CLI (main.py)
    and the serving path (serve.py)."""
    if str(G.get('compile_cache', '')):
        import jax

        jax.config.update('jax_compilation_cache_dir', str(G.compile_cache))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def parse_args(argv=None, discover_models=None, DG=None):
    """Two-phase CLI parse (reference: gms/main.py:43-77).

    Phase 1 parses the global defaults to learn --model / --weights_from.
    Phase 2 adds the model's DG (or the hps.yaml of the weights_from run)
    and re-parses everything.
    Returns (G, Model).
    """
    if argv is None:
        argv = sys.argv[1:]
    if DG is None:
        DG = global_defaults()
    parser = argparse.ArgumentParser()
    for key, value in DG.items():
        parser.add_argument(f'--{key}', type=args_type(value), default=value)
    tempG, _ = parser.parse_known_args(argv)

    defaults = {}
    if tempG.weights_from != Path('.'):
        loaded_hp_file = Path(tempG.weights_from).parent / 'hps.yaml'
        with open(loaded_hp_file) as f:
            loadedG = AttrDict(yaml.load(f, Loader=yaml.Loader))
        for key, value in loadedG.items():
            defaults[key] = value
            if key not in tempG:
                parser.add_argument(f'--{key}', type=args_type(value), default=value)
        Model = discover_models()[loadedG.model]
        # forward compatibility: DG keys the model gained AFTER this
        # checkpoint was trained are absent from its hps.yaml — register
        # them at the model's current defaults so new flags (e.g.
        # --sample_steps) work on old checkpoints instead of dying with
        # 'unrecognized arguments'
        for key, value in Model.DG.items():
            if key not in loadedG and key not in tempG:
                defaults[key] = value
                parser.add_argument(f'--{key}', type=args_type(value), default=value)
    else:
        Model = discover_models()[tempG.model]
        for key, value in Model.DG.items():
            defaults[key] = value
            if key not in tempG:
                parser.add_argument(f'--{key}', type=args_type(value), default=value)
        defaults['logdir'] = Path(tempG.logdir) / tempG.model

    defaults.pop('full_cmd', None)
    defaults.pop('commit_hash', None)
    parser.set_defaults(**defaults)
    G = AttrDict(parser.parse_args(argv).__dict__)
    return G, Model


def dump_hps(G, logdir=None):
    """Write hps.yaml so runs can be resumed with --weights_from
    (reference: gms/common.py:73-79)."""
    logdir = Path(logdir or G.logdir)
    logdir.mkdir(parents=True, exist_ok=True)
    dumpable = {}
    for k, v in G.items():
        dumpable[k] = str(v) if isinstance(v, Path) else v
    with open(logdir / 'hps.yaml', 'w') as f:
        yaml.dump(dumpable, f, width=float('inf'))
