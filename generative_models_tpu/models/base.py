"""GM base class: the functional-core/imperative-shell translation of the
reference's GM (reference: gms/common.py:138-208).

Design: every model owns
  * a flax module (self.net) — pure apply;
  * a TrainState pytree (params + optimizer state + step + rng key),
    replicated over the mesh;
  * pure step functions (loss_fn / train_step_fn / sample_fn) that are jitted
    once and reused — the host-level methods (train_step, sample, ...) keep
    the reference's imperative API while everything hot stays on device.

The default train_step is a single Adam step on self.loss, matching the
reference's lazy-Adam default (gms/common.py:158-169). The default
train_epoch scans ALL steps of an epoch inside one jit — the TPU-native
replacement for the reference's host-driven per-step loop with D2H metric
pulls (gms/main.py:205-215).
"""

from pathlib import Path
from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax
from flax import serialization

from generative_models_tpu.parallel import constrain_batch, replicate
from generative_models_tpu.utils import write_grid, write_gridvid
from generative_models_tpu.utils.config import AttrDict


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.int32
    rng: jax.Array
    extra: Any = None  # model-specific mutable state (batch_stats, 2nd optim, ...)


def merge_pytree(target, loaded):
    """strict=False state restore: copy leaves from `loaded` into `target`
    where the path exists and the shape matches (reference parity with
    load_state_dict(strict=False), gms/main.py:79-82)."""
    from flax.traverse_util import empty_node, flatten_dict, unflatten_dict

    # keep_empty_nodes: optimizer states contain empty containers (e.g.
    # optax EmptyState -> {}), which plain flatten would drop and then
    # from_state_dict would report list-length mismatches
    flat_t = flatten_dict(
        serialization.to_state_dict(target), sep='/', keep_empty_nodes=True
    )
    flat_l = flatten_dict(
        serialization.to_state_dict(loaded), sep='/', keep_empty_nodes=True
    )
    def _shape(leaf):
        # jnp.shape(None) is deprecated (future hard error); None leaves can
        # appear in optional state slots (e.g. TrainState.extra)
        return None if leaf is None else jnp.shape(leaf)

    for k, v in flat_l.items():
        if v is empty_node or v is None:
            continue
        if (
            k in flat_t
            and flat_t[k] is not empty_node
            and _shape(flat_t[k]) == _shape(v)
        ):
            flat_t[k] = v
    return serialization.from_state_dict(
        target, unflatten_dict(flat_t, sep='/')
    )


_INTERCEPT_ACTIVE = __import__('contextvars').ContextVar(
    'gmt_intercept_active', default=False
)


def interception_active():
    """True while tracing under an intercept_ctx with a real interceptor.
    Model code that fuses across submodule calls (e.g. the decode step's
    one-matmul QKV) must check this and take the per-module path instead,
    so the interceptor still sees every nn.Dense.__call__ — otherwise
    --quantize serving would silently run those matmuls unquantized."""
    return _INTERCEPT_ACTIVE.get()


def intercept_ctx(interceptor):
    """Context manager applying a flax method interceptor (or nothing).
    Used by the serving paths to swap quantized kernels in at trace time
    (ops/int8.py) without touching model code."""
    import contextlib

    import flax.linen as nn

    if not interceptor:
        return contextlib.nullcontext()

    @contextlib.contextmanager
    def ctx():
        tok = _INTERCEPT_ACTIVE.set(True)
        try:
            with nn.intercept_methods(interceptor):
                yield
        finally:
            _INTERCEPT_ACTIVE.reset(tok)

    return ctx()


class GM:
    """GenerativeModel base."""

    DG = AttrDict()  # model-specific config defaults

    # native range of sample()/sample_fn outputs. Models trained on [-1,1]
    # data (GAN's tanh generator, diffusion's clip-to-[-1,1] x-prediction)
    # override this so the SERVING surface (pure_serving_fn -> serve.py /
    # jax.export artifacts) can normalize to the [0,1] display contract;
    # training/eval paths keep the native range (eval_heavy compares
    # samples against data in the same domain).
    SAMPLE_RANGE = (0.0, 1.0)

    def __init__(self, G):
        self.G = G
        self._init_key = jax.random.key(G.get('seed', 0))
        self.net = self.build()
        self.state = self.place_state(self.init_state(self._init_key))
        # cached jitted functions
        self._jit_train_step = jax.jit(self.train_step_fn, donate_argnums=0)
        self._jit_train_epoch = jax.jit(self._train_epoch_fn, donate_argnums=0)
        self._jit_eval_loss = jax.jit(self.loss_metrics_fn)
        self._jit_eval_epoch = jax.jit(self._eval_epoch_fn)

    # ------------------------------------------------------------------ #
    # to implement per model
    # ------------------------------------------------------------------ #
    def build(self):
        """Return the flax module."""
        raise NotImplementedError

    def loss(self, params, x, y, rng, train=True):
        """Pure loss: (params, batch, rng) -> (loss, metrics dict)."""
        raise NotImplementedError

    def evaluate(self, writer, x, y, epoch):
        raise NotImplementedError(
            'you need to implement the evaluate method. make some samples or something.'
        )

    # ------------------------------------------------------------------ #
    # state construction
    # ------------------------------------------------------------------ #
    def make_optimizer(self):
        """Adam on self.G.lr, extended by the trainer knobs:
        --lr_scheduler=cosine (+ --warmup_steps/--lr_decay_steps) makes the
        reference's dead lr_scheduler flag real (ref diffusion_model.py:29
        declares it but never reads it); --grad_clip adds global-norm
        clipping; --grad_accum=k accumulates k micro-batch grads per
        optimizer update (optax.MultiSteps) — the single-chip stand-in for
        a bigger data axis. Models that override this for reference-parity
        betas (gan, the vqvae prior) keep their own optimizers."""
        tx = optax.adam(self.lr_schedule())
        clip = float(self.G.get('grad_clip', 0) or 0)
        if clip > 0:
            tx = optax.chain(optax.clip_by_global_norm(clip), tx)
        accum = int(self.G.get('grad_accum', 1) or 1)
        if accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        return tx

    def lr_schedule(self):
        """Scalar lr, or an optax schedule when --lr_scheduler/--warmup_steps
        ask for one: linear 0->lr warmup, then (cosine) decay to 0 over
        --lr_decay_steps or (none) constant."""
        G = self.G
        base = float(G.lr)
        sched = str(G.get('lr_scheduler', 'none') or 'none')
        warm = int(G.get('warmup_steps', 0) or 0)
        if sched == 'none' and warm == 0:
            return base
        if sched == 'cosine':
            decay = int(G.get('lr_decay_steps', 0) or 0)
            assert decay > 0, '--lr_scheduler=cosine needs --lr_decay_steps'
            return optax.warmup_cosine_decay_schedule(
                init_value=0.0, peak_value=base, warmup_steps=warm,
                decay_steps=warm + decay, end_value=0.0,
            )
        assert sched == 'none', f'unknown --lr_scheduler={sched}'
        return optax.linear_schedule(0.0, base, warm)  # warmup, then constant

    def param_sharding_rules(self):
        """[(path_regex, per-dim mesh-axis tuple)] tensor-parallel placements
        for this model's big matrices; empty = fully replicated params. The
        rules also hit the optimizer moments (they mirror param paths)."""
        return []

    def place_state(self, state):
        """Lay the train state out on the mesh: TP-ruled leaves sharded over
        'model', everything else replicated."""
        rules = self.param_sharding_rules()
        if int(self.G.get('fsdp', 0)):
            from generative_models_tpu.parallel import fsdp_place

            return fsdp_place(state, rules)
        if not rules:
            return replicate(state)
        from generative_models_tpu.parallel import shard_by_rules

        return shard_by_rules(state, rules)

    def example_input(self):
        size = 32 if self.G.get('pad32', 0) else 28
        return jnp.zeros((1, size, size, 1), jnp.float32)

    def init_params(self, rng):
        # one jitted SPMD program, not eager op-by-op: under a multi-axis
        # mesh (e.g. tp x seq) eager init executes each op as its own tiny
        # partitioned module, and at sharding boundaries (ring attention's
        # seq-sharded output entering a TP model-sharded MLP) GSPMD's
        # last-resort eager reshard is an involuntary full rematerialization
        # (replicate + repartition). Inside one jit the partitioner plans
        # that reshard as a collective, so composed meshes init warning-free.
        return jax.jit(
            lambda r: self.net.init(r, self.example_input())['params']
        )(rng)

    def init_state(self, rng):
        p_rng, s_rng = jax.random.split(rng)
        params = self.init_params(p_rng)
        opt_state = self.make_optimizer().init(params)
        return TrainState(
            params=params, opt_state=opt_state, step=jnp.int32(0), rng=s_rng
        )

    # ------------------------------------------------------------------ #
    # pure step functions (jitted once in __init__)
    # ------------------------------------------------------------------ #
    def transform_grads(self, grads):
        """Hook between autodiff and the optimizer (default: identity).
        MADE masks its weight grads here so the params can stay pre-masked
        at rest (ops/masked_dense.py premasked mode)."""
        return grads

    def train_step_fn(self, state, x, y):
        """Default single-optimizer step (reference: gms/common.py:158-169)."""
        x = constrain_batch(x)
        rng = jax.random.fold_in(state.rng, state.step)
        (_, metrics), grads = jax.value_and_grad(self.loss, has_aux=True)(
            state.params, x, y, rng, True
        )
        updates, opt_state = self.make_optimizer().update(
            self.transform_grads(grads), state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    def sample_images(self, n, y=None):
        """Uniform samples-only entry point for bulk eval (eval_heavy):
        always returns just the (n, H, W, 1) samples, never per-step video
        frames, regardless of the model's native sample() signature. The
        reference has no such contract — its eval_heavy assumes the
        diffusion signature and crashes for every other model
        (gms/main.py:125-126)."""
        samp = self.sample(n) if y is None else self.sample(n, y=y)
        return samp[0] if isinstance(samp, tuple) else samp

    def pure_serving_fn(self, n, interceptor=None):
        """jitted (raw_key) -> (n, H, W, 1) samples, closed over the CURRENT
        state — the jax.export target for `serve.py --export` (the
        TPU-native analog of the reference's TorchScript deployment,
        gms/common.py:204-208, applied to the zoo itself: the serialized
        StableHLO artifact runs without any model code). raw_key is
        jax.random.key_data(key), so the artifact's input signature is a
        plain uint32 array rather than an opaque typed key. An optional
        flax interceptor (serve.py --quantize, ops/int8.py) rewrites module
        calls at trace time — it applies identically to the live server and
        the exported artifact. Output is normalized to [0, 1] regardless of
        the model's native SAMPLE_RANGE, so servers and exported artifacts
        are display-ready by construction."""
        state = self.state

        def fn(raw_key):
            rng = jax.random.wrap_key_data(raw_key)
            with intercept_ctx(interceptor):
                out = self.sample_fn(state, n, rng)
            out = out[0] if isinstance(out, tuple) else out
            return self._serving_unit_range(out)

        return jax.jit(fn)

    def _serving_unit_range(self, x):
        """Map a sample batch from SAMPLE_RANGE to the serving [0,1]
        contract (identity for models already in [0,1])."""
        lo, hi = self.SAMPLE_RANGE
        if (lo, hi) == (0.0, 1.0):
            return x
        return (x - lo) / (hi - lo)

    EVAL_RNG_TAG = 0x7FFFFFFF  # fold_in tag reserved for eval passes

    def loss_metrics_fn(self, state, x, y):
        rng = jax.random.fold_in(state.rng, self.EVAL_RNG_TAG)
        _, metrics = self.loss(state.params, x, y, rng, False)
        return metrics

    def _train_epoch_fn(self, state, bx, by):
        def body(s, batch):
            s, metrics = self.train_step_fn(s, *batch)
            return s, metrics

        state, metrics = jax.lax.scan(body, state, (bx, by))
        return state, jax.tree_util.tree_map(jnp.mean, metrics)

    def _eval_epoch_fn(self, state, bx, by):
        def body(_, batch):
            return None, self.loss_metrics_fn(state, *batch)

        _, metrics = jax.lax.scan(body, None, (bx, by))
        return jax.tree_util.tree_map(jnp.mean, metrics)

    # ------------------------------------------------------------------ #
    # host-level API (reference parity)
    # ------------------------------------------------------------------ #
    @property
    def params(self):
        return self.state.params

    def next_rng(self):
        """Host-side key splitting for sampling/eval calls."""
        self._init_key, sub = jax.random.split(self._init_key)
        return sub

    def train_step(self, x, y=None):
        self.state, metrics = self._jit_train_step(self.state, x, y)
        return metrics

    def train_epoch(self, bx, by):
        """(steps, bs, ...) batched epoch -> mean metrics, one jit call."""
        self.state, metrics = self._jit_train_epoch(self.state, bx, by)
        return metrics

    def eval_loss(self, x, y=None):
        return self._jit_eval_loss(self.state, x, y)

    def eval_epoch(self, bx, by):
        return self._jit_eval_epoch(self.state, bx, by)

    def has_loss(self):
        """Whether the harness should run the test-set loss sweep (the
        reference checks hasattr(model, 'loss'), gms/main.py:163)."""
        return type(self).loss is not GM.loss

    # --- checkpointing: full train state, not weights-only (the reference
    # loses optimizer state + step on resume, gms/common.py:154-156) ---
    def _host_state_raw_rng(self):
        """Host copy of the state with the typed PRNG key unwrapped to its
        uint32 data (msgpack can't serialize typed keys)."""
        state = jax.device_get(self.state)
        return state.replace(rng=jax.random.key_data(state.rng))

    def save(self, path, test_x=None, test_y=None, tag=''):
        """tag='best' writes model_best.pt / orbax_state_best alongside the
        cadence checkpoint (--keep_best harness path)."""
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        suffix = f'_{tag}' if tag else ''
        if self.G.get('ckpt', 'flax') == 'orbax':
            # Orbax full-train-state checkpoint (SURVEY.md §5): async-capable
            # production path; layout is a directory instead of one file
            import shutil

            import orbax.checkpoint as ocp

            target = (path / f'orbax_state{suffix}').resolve()
            if target.exists():
                shutil.rmtree(target)
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(
                str(target), serialization.to_state_dict(self._host_state_raw_rng())
            )
            if hasattr(ckptr, 'wait_until_finished'):
                ckptr.wait_until_finished()  # save finalizes asynchronously
            return
        with open(path / f'model{suffix}.pt', 'wb') as f:
            f.write(serialization.to_bytes(self._host_state_raw_rng()))

    def load_weights(self, path):
        path = Path(path)
        template = self._host_state_raw_rng()
        orbax_dir = None
        if path.is_dir() and (path / 'orbax_state').exists():
            orbax_dir = path / 'orbax_state'
        elif path.name == 'orbax_state' and path.is_dir():
            orbax_dir = path
        elif not path.exists():
            # --weights_from dir/model.pt (or dir/model_best.pt) under the
            # orbax backend: map the filename onto its directory layout
            alt_name = path.name.replace('model', 'orbax_state')
            alt = path.parent / alt_name.removesuffix('.pt')
            if alt.is_dir():
                orbax_dir = alt
        if orbax_dir is not None:
            import orbax.checkpoint as ocp

            restored = ocp.StandardCheckpointer().restore(str(orbax_dir.resolve()))
            loaded = merge_pytree(template, restored)
        else:
            with open(path, 'rb') as f:
                data = f.read()
            try:
                loaded = serialization.from_bytes(template, data)
            except (ValueError, KeyError):
                # structure mismatch -> strict=False merge of matching leaves
                state_dict = serialization.msgpack_restore(data)
                loaded = merge_pytree(template, state_dict)
        loaded = loaded.replace(rng=jax.random.wrap_key_data(loaded.rng))
        self.state = self.place_state(loaded)


class Autoreg(GM):
    """Shared evaluate for autoregressive models (reference:
    gms/common.py:196-201): 25 samples -> 5x5 grid + sampling-process video."""

    is_autoreg = True  # enables eval/bits_per_dim logging in the harness

    def evaluate(self, writer, x, y, epoch):
        samples, gen = self.sample(25)
        write_grid(writer, 'samples', samples, epoch)
        write_gridvid(writer, 'sampling_process', gen, epoch, logdir=self.G.logdir)

    def sample_images(self, n, y=None):
        if y is not None:
            # none of the autoregs is class-conditional; erroring beats
            # silently mislabelling conditional eval metrics
            raise TypeError(f'{type(self).__name__}.sample takes no labels')
        # with_frames=False skips the (T, n, H, W, 1) sampling-video stack
        # (~150 MB HBM at T=784, n=64) that bulk eval would discard unseen
        return self._jit_sample(self.state, n, self.next_rng(), False)

    def pure_serving_fn(self, n, interceptor=None):
        """Autoreg sample_fn takes (state, n, rng, with_frames); serve the
        frameless path (see GM.pure_serving_fn for the export contract)."""
        state = self.state

        def fn(raw_key):
            rng = jax.random.wrap_key_data(raw_key)
            with intercept_ctx(interceptor):
                out = self.sample_fn(state, n, rng, False)
            return self._serving_unit_range(out)

        return jax.jit(fn)


class Arbiter(GM):
    """Eval models (autoencoder/classifier). The reference saves these as
    TorchScript so the harness can reload them without class code
    (gms/common.py:204-208); here we save the params pytree plus a spec
    (class name + config) and reload via arbiters.load_arbiter."""

    is_arbiter = True

    def save(self, path, test_x=None, test_y=None):
        import pickle

        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        payload = {
            'class_name': type(self).__name__,
            'G': {k: str(v) if isinstance(v, Path) else v for k, v in self.G.items()},
            'params': serialization.to_bytes(jax.device_get(self.state.params)),
        }
        with open(path / 'model.jit.pt', 'wb') as f:
            pickle.dump(payload, f)
