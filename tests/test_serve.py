"""Serving path (generative_models_tpu/serve.py): stdlib PNG encoder, grid
tiler, padded static-batch SampleServer, and the HTTP front end."""

import json
import struct
import threading
import time
import urllib.request
import zlib

import numpy as np
import pytest

from generative_models_tpu.serve import (
    SampleServer,
    _http_serve,
    png_encode,
    tile_grid,
)


def _decode_png_gray(data):
    assert data[:8] == b'\x89PNG\r\n\x1a\n'
    w, h = struct.unpack('>II', data[16:24])
    bitdepth, color = data[24], data[25]
    assert (bitdepth, color) == (8, 0)
    # concatenate IDAT chunks
    idat, pos = b'', 8
    while pos < len(data):
        (ln,) = struct.unpack('>I', data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if tag == b'IDAT':
            idat += data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(idat)
    rows = []
    stride = w + 1
    for r in range(h):
        line = raw[r * stride : (r + 1) * stride]
        assert line[0] == 0  # filter: None
        rows.append(np.frombuffer(line[1:], np.uint8))
    return np.stack(rows)


def test_png_encode_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (13, 17), np.uint8)
    assert np.array_equal(_decode_png_gray(png_encode(img)), img)
    # (H, W, 1) squeezes to grayscale
    assert np.array_equal(_decode_png_gray(png_encode(img[..., None])), img)
    with pytest.raises(ValueError):
        png_encode(img.astype(np.float32))


def test_tile_grid_pads_last_row():
    x = np.ones((5, 4, 4, 1), np.float32)
    g = tile_grid(x)  # 5 -> 3x2 grid
    assert g.shape == (8, 12, 1) and g.dtype == np.uint8
    assert g[:4, :4, 0].min() == 255  # first tile filled
    assert g[4:, 8:, 0].max() == 0  # padded sixth slot is black


@pytest.fixture(scope='module')
def made_server():
    from generative_models_tpu.models.made import MADE
    from generative_models_tpu.utils.config import global_defaults

    G = global_defaults()
    G.model = 'made'
    G.bs = 8
    G.hidden_size = 32
    srv = SampleServer(MADE(G), serve_bs=4)
    srv.warm()
    return srv


def test_sample_server_pads_and_slices(made_server):
    assert made_server.warm_sec is not None
    out = made_server.sample(3)
    assert out.shape == (3, 28, 28, 1)
    assert 0.0 <= out.min() and out.max() <= 1.0
    # n outside [1, serve_bs] is refused, not silently truncated
    with pytest.raises(ValueError, match='out of range'):
        made_server.sample(99)
    with pytest.raises(ValueError, match='out of range'):
        made_server.sample(0)
    st = made_server.stats()
    assert st['requests'] == 1 and st['latency_p50_sec'] > 0


def test_http_endpoints(made_server):
    httpd = _http_serve(made_server, 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # each endpoint asserted independently: a blanket try/except around
        # all three would let a server that 404s everything pass
        with urllib.request.urlopen(f'http://127.0.0.1:{port}/healthz') as r:
            health = json.loads(r.read())
        assert health['model'] == 'made' and health['serve_bs'] == 4
        with urllib.request.urlopen(
            f'http://127.0.0.1:{port}/sample?n=4'
        ) as r:
            png = r.read()
        img = _decode_png_gray(png)
        assert img.shape == (2 * 28, 2 * 28)
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(f'http://127.0.0.1:{port}/nope')
        assert exc_info.value.code == 404
    finally:
        httpd.shutdown()


def test_export_artifact_roundtrip(made_server, tmp_path):
    """--export writes a standalone StableHLO artifact; ExportedServer
    reloads it with no model code and reproduces the live path's samples
    bit-for-bit at the same raw PRNG key."""
    import jax

    from generative_models_tpu.serve import ExportedServer

    p = tmp_path / 'made_serving.stablehlo'
    nbytes = made_server.export_serving(p)
    assert nbytes > 0 and p.stat().st_size == nbytes

    exp = ExportedServer(p)
    assert not exp.class_cond and exp.serve_bs == made_server.serve_bs
    assert exp.warm() > 0
    out = exp.sample(3)
    assert out.shape == (3, 28, 28, 1)
    assert 0.0 <= out.min() and out.max() <= 1.0

    raw = jax.random.key_data(jax.random.key(7))
    direct = np.asarray(made_server.model.pure_serving_fn(4)(raw))
    via_artifact = np.asarray(exp.exp.call(raw))
    np.testing.assert_array_equal(via_artifact, direct)


def test_export_conditional_diffusion(tmp_path):
    """Conditional export: the artifact takes (raw_key, y), the padded
    label path works through ExportedServer.sample, and the served range
    is the [0,1] display contract (diffusion natively samples in [-1,1] —
    SAMPLE_RANGE normalization must be baked into the artifact)."""
    from generative_models_tpu.models.diffusion.model import DiffusionModel
    from generative_models_tpu.serve import ExportedServer, SampleServer
    from generative_models_tpu.utils.config import global_defaults

    G = global_defaults()
    G.model = 'diffusion_model'
    for k, v in DiffusionModel.DG.items():
        G[k] = v
    G.bs = 4
    G.hidden_size = 16
    G.timesteps = 4
    G.bf16 = 0
    G.class_cond = 1
    srv = SampleServer(DiffusionModel(G), serve_bs=4)
    p = tmp_path / 'diff_serving.stablehlo'
    srv.export_serving(p)

    exp = ExportedServer(p)
    assert exp.class_cond and exp.serve_bs == 4
    out = exp.sample(2, y=[3])
    assert out.shape == (2, 28, 28, 1)
    # [-1,1]-native samples arrive rescaled to [0,1]: nothing below 0 and
    # a mid-gray mean, NOT half the range crushed to black
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert 0.2 < out.mean() < 0.8


def test_serve_cli_one_shot(tmp_path):
    """The real serve CLI end-to-end (main(argv)): one-shot PNG grid from
    an untrained tiny model."""
    from generative_models_tpu.serve import main

    out = tmp_path / 'grid.png'
    main(
        [
            '--model=made',
            '--hidden_size=32',
            '--serve_bs=4',
            '--n=4',
            f'--out={out}',
        ]
    )
    data = out.read_bytes()
    assert data[:8] == b'\x89PNG\r\n\x1a\n'
    assert _decode_png_gray(data).shape == (2 * 28, 2 * 28)


def test_partial_labels_refused(made_server):
    """1 < len(y) < n is refused (silent partial conditioning would return
    half-unconditional grids), and unconditional servers refuse y."""
    with pytest.raises(ValueError):
        made_server.sample(4, y=[1, 2])  # made is unconditional: refuses y
    from generative_models_tpu.serve import _ServerBase

    class Fake(_ServerBase):
        def __init__(self):
            self._init_serving(8, True)

    with pytest.raises(ValueError, match='must be 1 or n'):
        Fake()._pad_y([1, 2, 3], 5)
    # broadcast and exact-length forms are fine
    assert list(Fake()._pad_y([7], 3)[:3]) == [7, 7, 7]
    assert list(Fake()._pad_y([1, 2, 3], 3)[:3]) == [1, 2, 3]


def test_unconditional_diffusion_export(tmp_path):
    """--class_cond=0 diffusion exports with a (raw_key)-only signature
    (regression: it used to crash with a missing-y TypeError)."""
    from generative_models_tpu.models.diffusion.model import DiffusionModel
    from generative_models_tpu.serve import ExportedServer, SampleServer
    from generative_models_tpu.utils.config import global_defaults

    G = global_defaults()
    G.model = 'diffusion_model'
    for k, v in DiffusionModel.DG.items():
        G[k] = v
    G.bs = 4
    G.hidden_size = 16
    G.timesteps = 4
    G.bf16 = 0
    G.class_cond = 0
    srv = SampleServer(DiffusionModel(G), serve_bs=4)
    p = tmp_path / 'diff_uncond.stablehlo'
    srv.export_serving(p)
    exp = ExportedServer(p)
    assert not exp.class_cond
    assert exp.sample(2).shape == (2, 28, 28, 1)


def test_from_export_plus_export_is_refused(tmp_path):
    from generative_models_tpu.serve import load_server

    with pytest.raises(SystemExit, match='cannot be combined'):
        load_server(
            ['--from_export=/nonexistent.hlo', '--export=/tmp/x.hlo']
        )


def test_seeded_requests_reproduce_live_equals_exported(made_server, tmp_path):
    """?seed= requests are reproducible, and the live server and its
    exported artifact return bitwise-identical batches at the same seed
    (both run the same pure_serving_fn)."""
    from generative_models_tpu.serve import ExportedServer

    a = made_server.sample(4, seed=123)
    b = made_server.sample(4, seed=123)
    np.testing.assert_array_equal(a, b)
    c = made_server.sample(4, seed=124)
    assert not np.array_equal(a, c)
    # unseeded requests differ (urandom-salted stream)
    d = made_server.sample(4)
    e = made_server.sample(4)
    assert not np.array_equal(d, e)

    p = tmp_path / 'made.stablehlo'
    made_server.export_serving(p)
    exp = ExportedServer(p)
    np.testing.assert_array_equal(exp.sample(4, seed=123), a)


def _stub_server(serve_bs, class_cond):
    """_ServerBase with a deterministic _run: sample i of the batch is the
    constant i, so request slices are identifiable."""
    from generative_models_tpu.serve import _ServerBase

    class Stub(_ServerBase):
        def __init__(self):
            self._init_serving(serve_bs, class_cond)
            self.run_calls = []
            self.fail = False

        def _model_name(self):
            return 'stub'

        def _run(self, seed, y_full):
            self.run_calls.append(
                (seed, None if y_full is None else y_full.copy())
            )
            if self.fail:
                raise RuntimeError('chip exploded')
            return np.arange(self.serve_bs, dtype=np.float32).reshape(
                -1, 1, 1, 1
            )

    return Stub()


def test_coalescing_packs_concurrent_requests():
    """Three concurrent requests that exactly fill the batch run as ONE
    sampling pass; each gets its own disjoint slice and the packed label
    vector honors per-request y at each request's offset."""
    srv = _stub_server(7, True)
    srv.coalesce_ms = 2000.0  # queue requests; dispatcher started below
    results = {}

    def ask(tag, n, y):
        results[tag] = srv.sample(n, y=y)

    threads = [
        threading.Thread(target=ask, args=('a', 2, [5, 6])),
        threading.Thread(target=ask, args=('b', 3, [7])),
        threading.Thread(target=ask, args=('c', 2, None)),
    ]
    for t in threads:
        t.start()
    while True:  # all three queued before the dispatcher exists
        with srv._queue_cv:
            if len(srv._queue) == 3:
                arrival = [(r['n'], r['y']) for r in srv._queue]
                break
    srv.enable_coalescing(2000.0)
    for t in threads:
        t.join(timeout=30)
    assert srv.coalesced_batches == 1 and srv.coalesced_requests == 3
    assert len(srv.run_calls) == 1
    _, y_full = srv.run_calls[0]
    # label layout follows arrival order; unlabeled slices stay -1
    off, expect = 0, -np.ones(7, np.int32)
    for n, y in arrival:
        if y is not None:
            expect[off:off + n] = y
        off += n
    assert off == 7
    np.testing.assert_array_equal(y_full, expect)
    # each request's slice is the right size; together they tile the batch
    assert sorted(v.shape[0] for v in results.values()) == [2, 2, 3]
    got = np.concatenate([v.reshape(-1) for v in results.values()])
    np.testing.assert_array_equal(np.sort(got), np.arange(7, dtype=np.float32))


def test_coalescing_propagates_errors_and_survives():
    """A failing batch delivers the exception to every waiting request and
    the dispatcher keeps serving afterwards."""
    srv = _stub_server(4, False)
    srv.enable_coalescing(50.0)
    srv.fail = True
    errs = []

    def ask():
        try:
            srv.sample(2)
        except RuntimeError as e:
            errs.append(str(e))

    threads = [threading.Thread(target=ask) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert errs == ['chip exploded', 'chip exploded']
    srv.fail = False
    assert srv.sample(2).shape == (2, 1, 1, 1)  # dispatcher alive


def test_coalescing_seeded_and_full_batches_bypass():
    """Seeded requests and full-batch requests run solo even with
    coalescing on (a seed pins the whole batch layout)."""
    srv = _stub_server(4, False)
    srv.enable_coalescing(1000.0)
    out = srv.sample(2, seed=42)  # returns without any peer request
    assert out.shape == (2, 1, 1, 1)
    assert srv.sample(4).shape == (4, 1, 1, 1)  # n == serve_bs: solo
    assert srv.coalesced_batches == 0 and len(srv.run_calls) == 2
    assert srv.run_calls[0][0] == 42  # the seed reached the graph


def test_coalescing_end_to_end_real_model():
    """Live-model integration: 4 concurrent n=1 requests on a serve_bs=4
    MADE server coalesce into fewer sampling passes (normally one)."""
    from generative_models_tpu.models.made import MADE
    from generative_models_tpu.utils.config import global_defaults

    G = global_defaults()
    G.model = 'made'
    G.bs = 8
    G.hidden_size = 32
    srv = SampleServer(MADE(G), serve_bs=4)
    srv.warm()
    srv.enable_coalescing(1500.0)
    barrier = threading.Barrier(4)
    outs = []

    def ask():
        barrier.wait()
        outs.append(srv.sample(1))

    threads = [threading.Thread(target=ask) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert len(outs) == 4
    for o in outs:
        assert o.shape == (1, 28, 28, 1)
    st = srv.stats()
    assert st['coalesced_requests'] >= 3  # at least one real coalesce
    assert st['coalesced_batches'] < 4


def test_gan_serving_range_rescaled():
    """GAN's tanh generator samples in [-1,1]; the serving surface must
    deliver [0,1] (regression: tile_grid's clip(0,1) used to crush every
    pixel <= 0 to black for GAN/diffusion)."""
    from generative_models_tpu.models.gan import GAN
    from generative_models_tpu.utils.config import global_defaults

    G = global_defaults()
    G.model = 'gan'
    for k, v in GAN.DG.items():
        G[k] = v
    G.bs = 4
    G.hidden_size = 16
    srv = SampleServer(GAN(G), serve_bs=4)
    out = srv.sample(4, seed=0)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # untrained tanh outputs are centered near 0 -> mid-gray after rescale;
    # the old crushed path would give mean ~= half the positive mass only
    assert 0.2 < out.mean() < 0.8


def test_labels_range_validated():
    """Out-of-range labels are a 400-class error, not silent all-zero
    one-hot conditioning (unet.py one-hots against 10 classes)."""
    from generative_models_tpu.serve import _ServerBase

    class Fake(_ServerBase):
        def __init__(self):
            self._init_serving(8, True)

    f = Fake()
    for bad in ([10], [-2], [3, 10, 4]):
        with pytest.raises(ValueError, match='labels must be in'):
            f._pad_y(bad, len(bad))
    # boundary values are fine: -1 (unconditional) and n_classes-1
    assert list(f._pad_y([-1, 9], 2)[:2]) == [-1, 9]


def test_coalesced_wait_times_out_when_dispatcher_dead():
    """A queued request whose dispatcher never answers fails loudly after
    coalesce_timeout_sec instead of hanging its thread forever."""
    srv = _stub_server(4, False)
    srv.coalesce_ms = 50.0  # coalescing "on" but NO dispatcher thread
    srv.coalesce_timeout_sec = 0.2
    with pytest.raises(RuntimeError, match='timed out'):
        srv.sample(2)
    assert not srv._queue  # the dead request was dequeued


def test_coalescing_window_anchored_at_enqueue_time():
    """The batching window starts at the oldest request's arrival: a
    request that already out-waited the window dispatches immediately at
    dispatcher pickup (pickup-anchored code would stall one more full
    window)."""
    srv = _stub_server(4, False)
    srv.coalesce_ms = 3000.0  # queue the request; dispatcher started below
    out = {}
    t = threading.Thread(target=lambda: out.setdefault('v', srv.sample(2)))
    t.start()
    while True:
        with srv._queue_cv:
            if srv._queue:
                break
    time.sleep(3.5)  # the request has now waited longer than the window
    t0 = time.time()
    srv.enable_coalescing(3000.0)
    t.join(timeout=30)
    assert out['v'].shape == (2, 1, 1, 1)
    assert time.time() - t0 < 1.5  # no second full window


def test_http_500_on_sampling_failure():
    """A non-ValueError sampling failure surfaces as an HTTP 500, not a
    torn connection."""
    srv = _stub_server(4, False)
    srv.fail = True
    httpd = _http_serve(srv, 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(f'http://127.0.0.1:{port}/sample?n=2')
        assert exc_info.value.code == 500
        assert b'chip exploded' in exc_info.value.read()
    finally:
        httpd.shutdown()


def test_serving_under_tp_mesh_matches_single_device():
    """Serving composes with tensor parallelism: a SampleServer built under
    a data:4,model:2 mesh (pixel_transformer TP rules shard the QKV/MLP
    matrices over 'model') serves the same seeded batch as a single-device
    server — multi-chip serving is the same pure_serving_fn, just sharded."""
    import jax

    from generative_models_tpu.models.pixel_transformer import (
        PixelTransformer,
    )
    from generative_models_tpu.parallel import make_mesh, set_mesh
    from generative_models_tpu.utils.config import global_defaults

    def build():
        G = global_defaults()
        G.model = 'pixel_transformer'
        for k, v in PixelTransformer.DG.items():
            G[k] = v
        G.bs = 8
        G.n_layer = 1
        G.n_head = 2
        G.n_embed = 64
        return PixelTransformer(G)

    try:
        set_mesh(make_mesh('data:4,model:2', jax.devices()))
        srv_tp = SampleServer(build(), serve_bs=2)
        n_sharded = sum(
            1
            for leaf in jax.tree_util.tree_leaves(srv_tp.model.state.params)
            if 'model' in tuple(getattr(leaf.sharding, 'spec', ()))
        )
        assert n_sharded > 0, 'no param sharded over model axis'
        tp = srv_tp.sample(2, seed=5)

        set_mesh(make_mesh('', jax.devices()[:1]))
        srv_1 = SampleServer(build(), serve_bs=2)
        one = srv_1.sample(2, seed=5)
    finally:
        set_mesh(make_mesh('', jax.devices()))
    assert tp.shape == one.shape == (2, 28, 28, 1)
    np.testing.assert_allclose(tp, one, atol=1e-5)
