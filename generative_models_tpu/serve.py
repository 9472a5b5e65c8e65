"""Serving path: load a trained checkpoint and serve samples.

The reference stops at training (its only "serving" is evaluate() writing
TensorBoard images); this module is the deployment story the framework adds:

  python -m generative_models_tpu.serve --model=diffusion_model \
      --weights_from=logs/model.pt --n=25 --out=grid.png      # one-shot
  python -m generative_models_tpu.serve --model=diffusion_model \
      --weights_from=logs/model.pt --port=8000                # HTTP server

TPU-native serving shape:
  * ONE compiled executable: requests are padded up to a fixed --serve_bs
    and sliced back down, so every request hits the same jitted
    sample_images graph — no shape-polymorphic recompiles at request time
    (XLA compiles per static shape; an unpadded server would recompile for
    every distinct n).
  * the executable is warmed at startup (compile + one run), so first
    request latency == steady-state latency.
  * requests are serialized through a lock (one chip, one stream); the
    HTTP layer is stdlib ThreadingHTTPServer — no web-framework deps.
  * `--coalesce_ms=W`: concurrent requests are micro-batched — a
    dispatcher thread collects queued requests for up to W ms (or until
    the compiled batch is full) and runs them as ONE padded batch, so k
    concurrent small requests cost one sampling pass instead of k. Each
    request gets its own disjoint slice of the batch. Seeded requests
    bypass coalescing (reproducibility is per-batch: the same seed must
    mean the same batch layout), as does n == serve_bs.
  * /healthz reports rolling latency stats; /sample?n=16&y=3 returns a PNG
    grid (pure-stdlib zlib PNG encoder — the env ships no image library
    guaranteed to exist at serve time).

Checkpoint format is the training artifact (model.pt flax bytes or an
orbax_state dir) plus its sibling hps.yaml — the same --weights_from
round-trip the training CLI uses (reference: gms/main.py:55-64).

Post-training quantization: `--quantize=int8` (= w8a8; also w8a16 for
weight-only) swaps every large Dense matmul in the serving graph for the
int8 Pallas GEMM in ops/int8.py via flax method interception — no model
code changes, and `--export` bakes the int8 weights into the artifact.
Small-batch AR decode re-reads every weight per token, so int8 weights
halve the HBM traffic that bounds serving latency; w8a8 additionally runs
the v5e MXU's 2x-peak int8 path.

Deployment artifacts: `--export=path` serializes the warmed serving graph
to a standalone StableHLO artifact via jax.export (params baked in;
input = raw uint32 PRNG key [+ labels]); `--from_export=path` serves that
artifact with NO model code — the TPU-native analog of the reference's
TorchScript `model.jit.pt` flow (gms/common.py:204-208), extended from
its two arbiters to the whole zoo. Artifacts are lowered for the platform
that exported them (TPU artifacts serve on TPU, CPU on CPU) — jax.export
records the lowering platform and refuses mismatched execution.
"""

import json
import struct
import threading
import time
import zlib
from pathlib import Path

import numpy as np


def png_encode(img):
    """uint8 (H, W), (H, W, 1) or (H, W, 3) -> PNG bytes (stdlib only)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError(f'png_encode wants uint8, got {img.dtype}')
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[..., 0]
    if img.ndim == 2:
        color = 0  # grayscale
    elif img.ndim == 3 and img.shape[2] == 3:
        color = 2  # truecolor
    else:
        raise ValueError(f'png_encode wants (H,W[,1|3]), got {img.shape}')
    h, w = img.shape[:2]
    raw = b''.join(b'\x00' + img[i].tobytes() for i in range(h))

    def chunk(tag, data):
        body = tag + data
        return struct.pack('>I', len(data)) + body + struct.pack(
            '>I', zlib.crc32(body)
        )

    ihdr = struct.pack('>IIBBBBB', w, h, 8, color, 0, 0, 0)
    return (
        b'\x89PNG\r\n\x1a\n'
        + chunk(b'IHDR', ihdr)
        + chunk(b'IDAT', zlib.compress(raw, 6))
        + chunk(b'IEND', b'')
    )


def tile_grid(x, cols=None):
    """(n, H, W, C) float [0,1] -> uint8 (rows*H, cols*W, C) grid, zero-
    padding the last row (tiling and the float->uint8 conversion both
    delegated to utils/logger.py so the PNG path and the TensorBoard grids
    can never diverge)."""
    from generative_models_tpu.utils.logger import _to_hwc_uint8, grid_image

    x = np.asarray(x, np.float32)
    n, h, w, c = x.shape
    cols = cols or int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    canvas = np.zeros((rows * cols, h, w, c), np.float32)
    canvas[:n] = x
    return _to_hwc_uint8(grid_image(canvas, rows, cols), expand=False)


class _ServerBase:
    """Shared serving mechanics: pad-to-serve_bs label handling, the
    request lock (the chip is a single stream), rolling latency stats.
    Subclasses set .serve_bs/.class_cond and implement _run(seed, y_full)
    plus the 'model' field of stats()."""

    def _init_serving(self, serve_bs, class_cond, n_classes=10):
        import os

        self.serve_bs = int(serve_bs)
        self.class_cond = bool(class_cond)
        self.n_classes = int(n_classes)  # valid labels: -1 (uncond) .. n-1
        self.quant_mode = ''   # '' | 'w8a8' | 'w8a16' (ops/int8.py)
        self.quant_kernels = 0
        self._lock = threading.Lock()
        self._requests = 0
        # unseeded requests draw from a urandom-salted stream so restarts
        # and replicas never replay the same samples
        self._salt = int.from_bytes(os.urandom(4), 'little')
        self.latencies = []
        self.warm_sec = None
        # request coalescing (enable_coalescing): dispatcher micro-batches
        # queued requests into one padded sampling pass
        self.coalesce_ms = 0.0
        # backstop so a dispatcher death can never hang requests forever
        self.coalesce_timeout_sec = 120.0
        self.coalesced_batches = 0
        self.coalesced_requests = 0
        self._queue = []
        self._queue_cv = threading.Condition()
        self._dispatcher = None

    def warm(self):
        """Compile/load + run the serving graph once so request #1 is
        fast."""
        t0 = time.time()
        np.asarray(self._run(0, self._pad_y(None, self.serve_bs)))
        self.warm_sec = time.time() - t0
        return self.warm_sec

    def _validate_y(self, y, n):
        """Broadcast one request's labels to exactly n and range-check
        them. A single label broadcasts to n; otherwise len(y) must equal
        n — silent partial conditioning is refused. Values must sit in
        [-1, n_classes): jax.nn.one_hot maps out-of-range labels to an
        ALL-ZERO vector (unet.py one-hots against 10 classes), which would
        silently degrade conditioning instead of erroring."""
        y = np.asarray(y, np.int32).reshape(-1)
        if len(y) == 1:
            y = np.repeat(y, n)
        if len(y) != n:
            raise ValueError(f'len(y)={len(y)} must be 1 or n={n}')
        if ((y < -1) | (y >= self.n_classes)).any():
            raise ValueError(
                f'labels must be in [-1, {self.n_classes}) '
                '(-1 = unconditional); got '
                f'{int(y.min())}..{int(y.max())}'
            )
        return y

    def _pad_y(self, y, n):
        """Labels for the full compiled batch: -1 (= unconditional) padding
        beyond the request's n."""
        if not self.class_cond:
            if y is not None:
                raise ValueError('this server is unconditional; got y')
            return None
        full = -np.ones((self.serve_bs,), np.int32)
        if y is not None:
            full[:n] = self._validate_y(y, n)
        return full

    def sample(self, n, y=None, seed=None):
        """n samples (optional labels y: one value broadcast to n, or
        exactly n values) -> (n, H, W, 1) float array in [0, 1]. With an
        explicit seed the request is REPRODUCIBLE (same seed, same labels
        -> bitwise-same batch, live or exported); without one, requests
        draw from a urandom-salted stream that never replays across
        restarts or replicas.

        When coalescing is on, unseeded sub-batch requests are queued and
        the dispatcher thread packs concurrent ones into a single padded
        sampling pass; seeded requests always run solo (the seed pins the
        WHOLE batch, so a reproducible request cannot share it).

        n must fit the compiled batch: 1 <= n <= serve_bs. Oversized
        requests are refused rather than silently truncated (the old clamp
        returned fewer samples than asked, and rejected self-consistent
        n>serve_bs requests with a misleading label-length error)."""
        n = int(n)
        if not 1 <= n <= self.serve_bs:
            raise ValueError(
                f'n={n} out of range [1, serve_bs={self.serve_bs}]; '
                'restart with a larger --serve_bs for bigger batches'
            )
        if self.coalesce_ms > 0 and seed is None and n < self.serve_bs:
            return self._sample_coalesced(n, y)
        y_full = self._pad_y(y, n)
        with self._lock:
            self._requests += 1
            s = int(seed) if seed is not None else self._salt + self._requests
            t0 = time.time()
            out = np.asarray(self._run(s, y_full))
            self._record_latency(time.time() - t0)
        return out[:n]

    def _record_latency(self, dt):
        self.latencies.append(dt)
        if len(self.latencies) > 1000:
            del self.latencies[:-1000]

    # ------------------------- request coalescing ------------------------ #
    def enable_coalescing(self, window_ms):
        """Start the micro-batching dispatcher: concurrent unseeded
        requests queued within `window_ms` of each other (and fitting in
        one serve_bs batch) run as ONE sampling pass, each request taking
        a disjoint slice. k concurrent small requests -> 1 chip pass
        instead of k."""
        self.coalesce_ms = float(window_ms)
        if self.coalesce_ms > 0 and self._dispatcher is None:
            self._dispatcher = threading.Thread(
                target=self._dispatch_loop, daemon=True
            )
            self._dispatcher.start()

    def _sample_coalesced(self, n, y):
        req = {
            'n': n,
            'y': self._request_y(y, n),
            'done': threading.Event(),
            't0': time.time(),
            'out': None,
            'err': None,
        }
        with self._queue_cv:
            self._queue.append(req)
            self._queue_cv.notify_all()
        # bounded wait: if the dispatcher thread ever died, fail loudly
        # instead of hanging this request (and the HTTP worker serving it)
        # forever
        if not req['done'].wait(timeout=self.coalesce_timeout_sec):
            with self._queue_cv:
                if req in self._queue:
                    self._queue.remove(req)
            raise RuntimeError(
                f'coalesced request timed out after '
                f'{self.coalesce_timeout_sec:.0f}s (dispatcher dead?)'
            )
        if req['err'] is not None:
            raise req['err']
        return req['out']

    def _request_y(self, y, n):
        """Per-request labels for the coalescing path (or None). Same
        rules as _pad_y, but per-slice: the dispatcher packs these at each
        request's offset in the shared batch."""
        if not self.class_cond:
            if y is not None:
                raise ValueError('this server is unconditional; got y')
            return None
        if y is None:
            return None
        return self._validate_y(y, n)

    def _take_batch(self):
        """Under the queue cv: block for the first request, then keep
        collecting until the compiled batch is full or the window closes.
        Returns the packed request list (in arrival order, total n <=
        serve_bs)."""
        with self._queue_cv:
            while not self._queue:
                self._queue_cv.wait()
            # anchor the window at the OLDEST queued request's arrival, not
            # at dispatcher pickup: requests that already waited through a
            # previous sampling pass shouldn't pay a second full window
            deadline = self._queue[0]['t0'] + self.coalesce_ms / 1e3

            def packable():
                used, take = 0, []
                for r in self._queue:
                    if used + r['n'] <= self.serve_bs:
                        used += r['n']
                        take.append(r)
                return used, take

            used, take = packable()
            while used < self.serve_bs:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                self._queue_cv.wait(timeout=remaining)
                used, take = packable()
            for r in take:
                self._queue.remove(r)
            return take

    def _dispatch_loop(self):
        # EVERY step after _take_batch sits inside the try: an exception
        # anywhere (label packing included) is delivered to the batch's
        # waiters instead of silently killing the dispatcher thread
        while True:
            batch = self._take_batch()
            try:
                y_full = None
                if self.class_cond:
                    y_full = -np.ones((self.serve_bs,), np.int32)
                    off = 0
                    for r in batch:
                        if r['y'] is not None:
                            y_full[off:off + r['n']] = r['y']
                        off += r['n']
                with self._lock:
                    # count every request (stats parity with the solo path);
                    # the sum stays monotonic, so the salted seed stream
                    # still never repeats
                    self._requests += len(batch)
                    s = self._salt + self._requests
                    out = np.asarray(self._run(s, y_full))
                    self.coalesced_batches += 1
                    self.coalesced_requests += len(batch)
                    now = time.time()
                    for r in batch:
                        self._record_latency(now - r['t0'])
                off = 0
                for r in batch:
                    r['out'] = out[off:off + r['n']]
                    off += r['n']
            except Exception as e:  # deliver, don't kill the dispatcher
                for r in batch:
                    r['err'] = e
            finally:
                for r in batch:
                    r['done'].set()

    def _model_name(self):
        raise NotImplementedError

    def _run(self, seed, y_full):
        """Call the pure serving fn at jax.random.key(seed)."""
        import jax

        raw = jax.random.key_data(jax.random.key(seed))
        if y_full is None:
            return self._call(raw)
        import jax.numpy as jnp

        return self._call(raw, jnp.asarray(y_full))

    def stats(self):
        lat = sorted(self.latencies)
        pick = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))] if lat else None
        return {
            'model': self._model_name(),
            'serve_bs': self.serve_bs,
            'class_cond': self.class_cond,
            'requests': self._requests,
            'warm_sec': self.warm_sec,
            'latency_p50_sec': pick(0.50),
            'latency_p90_sec': pick(0.90),
            'quantize': self.quant_mode or None,
            'quantized_kernels': self.quant_kernels,
            'coalesce_ms': self.coalesce_ms or None,
            'coalesced_batches': self.coalesced_batches,
            'coalesced_requests': self.coalesced_requests,
        }


class SampleServer(_ServerBase):
    """Owns the model + the one compiled sampling executable.

    Every request pads to serve_bs, runs the SAME jitted graph, slices to
    n. The graph is the model's pure_serving_fn — the very fn --export
    serializes — so a live server and its exported artifact produce
    bitwise-identical batches at the same seed. Thread-safe: the chip is a
    single stream, so requests serialize through a lock; latency stats
    accumulate under the same lock."""

    def __init__(self, model, serve_bs=64, quantize=''):
        self.model = model
        self._init_serving(serve_bs, model.G.get('class_cond', 0))
        # 'int8' is shorthand for the dynamic-activation w8a8 path
        self.quant_mode = {'int8': 'w8a8'}.get(str(quantize or ''), str(quantize or ''))
        if self.quant_mode not in ('', 'w8a8', 'w8a16'):
            raise SystemExit(
                f'--quantize={quantize}: choose int8|w8a8|w8a16'
            )
        self._interceptor = None
        if self.quant_mode:
            from generative_models_tpu.ops.int8 import build_quant_interceptor
            from generative_models_tpu.parallel import get_mesh

            mesh = get_mesh()
            non_data = {
                ax: n
                for ax, n in (mesh.shape.items() if mesh else ())
                if ax != 'data' and n > 1
            }
            if non_data:
                # the int8 Pallas GEMM consumes the quantized weights inside
                # a pallas_call GSPMD cannot partition; under a model/seq/
                # pipe-sharded mesh that either fails to compile or silently
                # replicates the weights (defeating the HBM win). Refuse
                # rather than mislead; data-only meshes replicate params and
                # are fine.
                raise SystemExit(
                    f'--quantize does not compose with a {dict(non_data)}-'
                    'sharded mesh; serve quantized models on a single chip '
                    'or a data-only mesh'
                )

            self._interceptor, self.quant_kernels = build_quant_interceptor(
                model, self.quant_mode
            )
            if self._interceptor is None:
                raise SystemExit(
                    f'--quantize: {model.G.model} has no Dense/masked kernels '
                    'large enough to quantize (ops/int8.py thresholds)'
                )
        self._call = model.pure_serving_fn(
            self.serve_bs, interceptor=self._interceptor
        )

    def _model_name(self):
        return self.model.G.model

    def export_serving(self, path):
        """Serialize the serving graph to a standalone StableHLO artifact
        (jax.export): params baked in as constants, input = a raw uint32
        PRNG key (+ labels for conditional models), output = the sample
        batch. The artifact reloads and runs WITHOUT any model code
        (ExportedServer) — the TPU-native analog of the reference's
        TorchScript `model.jit.pt` deployment (gms/common.py:204-208)."""
        import jax
        from jax import export as jexport

        raw = jax.random.key_data(jax.random.key(0))
        if self.class_cond:
            import jax.numpy as jnp

            args = (raw, -jnp.ones((self.serve_bs,), jnp.int32))
        else:
            args = (raw,)
        # export the LIVE server's compiled fn (self._call), not a rebuilt
        # one: no duplicate trace, and "the exported graph IS the served
        # graph" holds by construction rather than by coincidence
        data = jexport.export(self._call)(*args).serialize()
        Path(path).write_bytes(data)
        return len(data)


class ExportedServer(_ServerBase):
    """Serve a jax.export artifact written by SampleServer.export_serving —
    no model class, no params file, no config: the artifact is the model.
    Same sample()/stats()/warm() surface as SampleServer, so the HTTP front
    and the one-shot path work unchanged."""

    def __init__(self, path):
        from jax import export as jexport

        self.path = str(path)
        self.exp = jexport.deserialize(Path(path).read_bytes())
        self._init_serving(
            int(self.exp.out_avals[0].shape[0]), len(self.exp.in_avals) > 1
        )
        self._call = self.exp.call

    def _model_name(self):
        return f'exported:{self.path}'


def _http_serve(server, port, host='127.0.0.1'):
    """stdlib HTTP front: GET /healthz (JSON), GET /sample?n=16&y=3 (PNG).
    Binds localhost by default (there is no auth; each request holds the
    chip for a full sampling pass) — pass --host=0.0.0.0 to expose."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, ctype, body):
            self.send_response(code)
            self.send_header('Content-Type', ctype)
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == '/healthz':
                body = json.dumps(server.stats()).encode()
                return self._send(200, 'application/json', body)
            if url.path == '/sample':
                q = parse_qs(url.query)
                try:
                    # default n never exceeds the compiled batch
                    n_default = str(min(25, server.serve_bs))
                    n = int(q.get('n', [n_default])[0])
                    seed = int(q['seed'][0]) if 'seed' in q else None
                    y = (
                        [int(v) for v in q['y'][0].split(',')]
                        if 'y' in q
                        else None
                    )
                except ValueError:
                    return self._send(400, 'text/plain', b'bad n/y/seed')
                try:
                    imgs = server.sample(n, y=y, seed=seed)
                except ValueError as e:
                    return self._send(400, 'text/plain', str(e).encode())
                except Exception as e:  # noqa: broad, last HTTP hop
                    # a failed sampling pass (e.g. a coalesced batch's
                    # delivered RuntimeError) must surface as a 500, not
                    # as a torn connection from BaseHTTPRequestHandler
                    return self._send(
                        500, 'text/plain',
                        f'sampling failed: {e}'.encode(),
                    )
                png = png_encode(tile_grid(imgs))
                return self._send(200, 'image/png', png)
            return self._send(404, 'text/plain', b'try /healthz or /sample')

    httpd = ThreadingHTTPServer((host, port), Handler)
    return httpd


def load_server(argv=None):
    """Parse serve flags (the training CLI's two-phase parse plus
    --serve_bs/--port/--n/--out), build the model, load weights, warm."""
    from generative_models_tpu.parallel import make_mesh, set_mesh
    from generative_models_tpu.utils import discover_models
    from generative_models_tpu.utils.config import (
        global_defaults, maybe_enable_compile_cache, parse_args,
    )

    DG = global_defaults()
    DG.serve_bs = 64
    DG.port = 0       # >0: run the HTTP server
    DG.host = '127.0.0.1'  # HTTP bind address (0.0.0.0 to expose; no auth)
    DG.n = 25         # one-shot sample count
    DG.out = Path('samples.png')
    DG.export = ''       # write a jax.export artifact here and exit
    DG.from_export = ''  # serve a jax.export artifact (no model build)
    DG.quantize = ''     # int8 post-training quant: int8|w8a8|w8a16 (ops/int8.py)
    DG.coalesce_ms = 0.0  # >0: micro-batch concurrent requests (window, ms)
    G, Model = parse_args(argv, discover_models=discover_models, DG=DG)
    maybe_enable_compile_cache(G)
    if str(G.from_export):
        if str(G.get('export', '')):
            raise SystemExit(
                '--from_export serves an existing artifact; it cannot be '
                'combined with --export (which needs a model to trace)'
            )
        if str(G.get('quantize', '')):
            raise SystemExit(
                '--quantize applies when the serving graph is traced; an '
                'exported artifact is already baked (re-export with '
                '--quantize to get a quantized artifact)'
            )
        return ExportedServer(G.from_export), G
    set_mesh(make_mesh(G.get('mesh', '')))
    model = Model(G=G)
    if G.weights_from != Path('.'):
        model.load_weights(G.weights_from)
    server = SampleServer(
        model, serve_bs=G.serve_bs, quantize=str(G.get('quantize', ''))
    )
    return server, G


def main(argv=None):
    server, G = load_server(argv)
    if str(G.get('export', '')):
        nbytes = server.export_serving(G.export)
        print(f'exported serving artifact: {G.export} ({nbytes} bytes)')
        return
    print(f'warming {G.model} serve_bs={server.serve_bs} ...', flush=True)
    warm = server.warm()
    print(f'warm in {warm:.2f}s', flush=True)
    if float(G.get('coalesce_ms', 0)) > 0:
        server.enable_coalescing(float(G.coalesce_ms))
    if int(G.port) > 0:
        httpd = _http_serve(server, int(G.port), host=str(G.get('host', '127.0.0.1')))
        print(f'serving on {G.host}:{G.port} (/healthz, /sample?n=16&y=3)', flush=True)
        httpd.serve_forever()
        return
    n = int(G.n)
    if n > server.serve_bs:
        print(f'--n={n} exceeds --serve_bs={server.serve_bs}; clamping')
        n = server.serve_bs
    imgs = server.sample(n)
    png = png_encode(tile_grid(imgs))
    Path(G.out).write_bytes(png)
    print(json.dumps(server.stats()))
    print(f'wrote {G.out}')


if __name__ == '__main__':
    main()
