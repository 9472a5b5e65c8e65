"""Metrics logging + visualization sink.

Same conventions as the reference (gms/common.py:65-82, 177-193, 246-264):
buffered per-epoch scalar lists flushed by dump_logger (mean -> TensorBoard +
stdout + hps.yaml dump), 5x5 sample grids, sampling-process videos, recon
strips. TPU-native differences:
  * metrics stay on device until the per-epoch flush (the reference pulls
    every step, gms/main.py:215 — a throughput killer);
  * videos are written as GIF files via imageio (plus a TB filmstrip image),
    since moviepy (the TB add_video backend) is not available;
  * images are NHWC (TPU-native layout); converted at the TB boundary.
"""

import subprocess
import sys
from collections import defaultdict
from pathlib import Path

import jax
import numpy as np

try:
    import imageio.v2 as imageio
except ImportError:  # pragma: no cover
    imageio = None


def make_logger():
    return defaultdict(list)


def to_numpy(x):
    if isinstance(x, jax.Array):
        return np.asarray(jax.device_get(x))
    return np.asarray(x)


def dump_logger(logger, writer, i, G):
    """Flush buffered metrics: mean each list -> TB scalar + stdout, record
    full_cmd + commit_hash, dump hps.yaml (reference: gms/common.py:65-82)."""
    print('=' * 30)
    print(i)
    # one host sync for everything buffered this epoch
    host_logger = jax.device_get({k: v for k, v in logger.items()})
    for key, val in host_logger.items():
        if isinstance(val, list):
            mean_val = float(np.mean([np.mean(np.asarray(v)) for v in val]))
        else:
            mean_val = float(np.mean(val))
        if writer is not None:
            writer.add_scalar(key, mean_val, i)
        print(key, mean_val)
    G.full_cmd = 'python ' + ' '.join(sys.argv)
    # provenance: which backend produced this run's artifacts (hps.yaml is
    # the run's record of record; measured-results collectors read this)
    G.jax_backend = jax.default_backend()
    try:
        G.commit_hash = (
            subprocess.check_output(
                ['git', 'rev-parse', 'HEAD'], cwd=Path(__file__).parent
            )
            .decode('ascii')
            .strip()
        )
    except Exception:
        G.commit_hash = 'unknown'
    from generative_models_tpu.utils.config import dump_hps

    dump_hps(G)
    print(G.full_cmd)
    print('=' * 30)
    if writer is not None:
        writer.flush()
    return make_logger()


def _to_hwc_uint8(x, expand=True):
    """(H, W, C) float in [0,1] or uint8 -> uint8 HWC; expand=True repeats
    single channels to 3 (viewer-friendly), expand=False keeps C=1 so the
    native grayscale GIF encoder can be used."""
    x = to_numpy(x)
    if x.dtype != np.uint8:
        x = (np.clip(x, 0.0, 1.0) * 255).astype(np.uint8)
    if expand and x.shape[-1] == 1:
        x = np.repeat(x, 3, axis=-1)
    return x


def grid_image(x, n1=5, n2=5):
    """(n1*n2, H, W, C) -> (n1*H, n2*W, C) tiled image."""
    x = to_numpy(x)
    n, h, w, c = x.shape
    assert n == n1 * n2, (n, n1, n2)
    return x.reshape(n1, n2, h, w, c).transpose(0, 2, 1, 3, 4).reshape(n1 * h, n2 * w, c)


def write_grid(writer, tag, x, epoch):
    """5x5 grid of 25 (28,28,1) samples (reference: gms/common.py:177-180;
    NHWC here instead of NCHW)."""
    assert tuple(x.shape) == (25, 28, 28, 1) or tuple(x.shape) == (25, 32, 32, 1), x.shape
    img = _to_hwc_uint8(grid_image(x))
    if writer is not None:
        writer.add_image(tag, img, epoch, dataformats='HWC')


def _tb_animated_gif(writer, tag, gif_bytes, h, w, epoch):
    """Write an already-encoded animated GIF as a TB image summary — the
    same wire format torch's add_video produces (it renders animated in the
    TensorBoard images tab), but without the moviepy dependency it requires.
    Returns True on success."""
    try:
        from tensorboard.compat.proto.summary_pb2 import Summary

        img = Summary.Image(
            encoded_image_string=gif_bytes, height=h, width=w, colorspace=3
        )
        summary = Summary(value=[Summary.Value(tag=tag, image=img)])
        writer._get_file_writer().add_summary(summary, epoch)
        return True
    except Exception:  # non-torch writer / proto mismatch: caller falls back
        return False


def write_gridvid(writer, tag, x, epoch, logdir=None):
    """(T, 25, H, W, C) sampling-process video (reference:
    gms/common.py:183-193). Encoded once as an animated GIF, which is both
    saved next to the TB logs and embedded in TensorBoard as a NATIVE
    animated video summary (reference uses writer.add_video; same proto,
    built here from the imageio-encoded bytes since moviepy — torch's
    add_video backend — is not in the env). Falls back to a subsampled
    filmstrip image if the writer has no proto access. The per-frame
    tiling+u8 conversion runs through the native C++ runtime when available
    (784-frame stacks are the host-side viz hot path)."""
    from generative_models_tpu import native

    x = to_numpy(x)
    T = x.shape[0]
    if x.dtype != np.uint8 and x.shape[1] == 25:
        frames = [
            native.tile_grid_u8(x[t].astype(np.float32), 5, 5) for t in range(T)
        ]
    else:
        frames = [
            _to_hwc_uint8(grid_image(x[t]), expand=False) for t in range(T)
        ]
    fps = max(1, min(T // 3, 60))
    gif_bytes = None
    if frames[0].shape[-1] == 1:
        # grayscale stack: native C++ GIF89a encoder (LZW, 256-gray
        # palette) — ~20x faster than imageio on the 1-core host
        gif_bytes = native.gif_encode_gray(
            np.stack(frames)[..., 0], fps=fps
        )
    frames = [np.repeat(f, 3, axis=-1) if f.shape[-1] == 1 else f
              for f in frames]
    if gif_bytes is None and imageio is not None:
        import io

        buf = io.BytesIO()
        imageio.mimsave(
            buf, frames, format='GIF', duration=1000.0 / fps, loop=0
        )
        gif_bytes = buf.getvalue()
    if logdir is not None and gif_bytes is not None:
        gif_dir = Path(logdir)
        gif_dir.mkdir(parents=True, exist_ok=True)
        safe_tag = tag.replace('/', '_')
        (gif_dir / f'{safe_tag}_{epoch}.gif').write_bytes(gif_bytes)
    if writer is not None:
        h, w = frames[0].shape[:2]
        ok = gif_bytes is not None and _tb_animated_gif(
            writer, tag, gif_bytes, h, w, epoch
        )
        if not ok:
            # filmstrip: 8 evenly spaced frames side by side
            idxs = np.linspace(0, T - 1, num=min(8, T)).astype(int)
            strip = np.concatenate([frames[i] for i in idxs], axis=1)
            writer.add_image(tag, strip, epoch, dataformats='HWC')


def combine_imgs(arr, row=5, col=5):
    """Batch of images (B,H,W,C) or videos (B,T,H,W,C) -> tiled 2-D canvas
    (reference: gms/common.py:246-264)."""
    arr = to_numpy(arr)
    if arr.ndim == 4:
        bs, h, w, _ = arr.shape
        assert bs == row * col, (bs, row, col)
        arr = arr.reshape(row, col, h, w, -1).transpose(0, 2, 1, 3, 4)
        return arr.reshape(row * h, col * w, -1)
    elif arr.ndim == 5:
        bs, t, h, w, _ = arr.shape
        assert bs == row * col, (bs, row, col)
        x = arr.reshape(row, col, t, h, w, -1)
        x = x.transpose(2, 0, 3, 1, 4, 5)  # t, row, h, col, w, c
        return x.reshape(t, row * h, col * w, -1)
    raise NotImplementedError(arr.shape)


def write_image(writer, tag, img_hw_or_hwc, epoch):
    img = img_hw_or_hwc if img_hw_or_hwc.ndim == 3 else img_hw_or_hwc[..., None]
    img = _to_hwc_uint8(img)
    if writer is not None:
        writer.add_image(tag, img, epoch, dataformats='HWC')


def count_vars(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
