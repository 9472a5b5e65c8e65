"""ctypes bindings for the native host runtime (gmt_native.cpp).

The shared library is built on first import if g++ is available; every
function has a numpy fallback so the framework works without a toolchain.
"""

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / 'libgmt_native.so'
_SRC = _DIR / 'gmt_native.cpp'
_LIB = None


def _stale():
    if not _SO.exists():
        return True
    return _SRC.exists() and _SRC.stat().st_mtime > _SO.stat().st_mtime


def _build():
    # Serialize concurrent builders (e.g. parallel pytest / CLI starts right
    # after a source change) with an exclusive lock: g++ writes the .so in
    # place, and a second process must neither race the compiler nor CDLL a
    # half-written file. Losers of the race block here, then see a fresh .so.
    import fcntl

    with open(_DIR / '.build.lock', 'w') as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        if _stale():
            subprocess.run(
                ['make', '-C', str(_DIR), '-s'], check=True,
                capture_output=True,
            )


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    try:
        # staleness is (re)checked under the lock inside _build: an unlocked
        # fast path could see a fresh-looking mtime while another process's
        # g++ is mid-write. The .so is also published by atomic rename
        # (native/Makefile), so even lockless readers never dlopen a torso.
        _build()
    except Exception:
        if not _SO.exists():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.gmt_idx_header.restype = ctypes.c_longlong
    lib.gmt_idx_header.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    for name in ['gmt_u8_to_f32', 'gmt_u8_binarize']:
        getattr(lib, name).restype = None
        getattr(lib, name).argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_float
        ]
    lib.gmt_u8_to_pm1.restype = None
    lib.gmt_u8_to_pm1.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
    for name in ['gmt_tile_grid', 'gmt_tile_grid_u8']:
        getattr(lib, name).restype = None
        getattr(lib, name).argtypes = [ctypes.c_void_p, ctypes.c_void_p] + [
            ctypes.c_int64
        ] * 5
    if hasattr(lib, 'gmt_gif_encode_gray'):  # absent in pre-v2 stale builds
        lib.gmt_gif_encode_gray.restype = ctypes.c_int64
        lib.gmt_gif_encode_gray.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_int64,
        ]
    _LIB = lib
    return lib


def available():
    return _load() is not None


_IDX_DTYPES = {0x08: np.uint8, 0x09: np.int8, 0x0B: np.int16, 0x0C: np.int32,
               0x0D: np.float32, 0x0E: np.float64}


def idx_parse(buf):
    """Parse IDX bytes -> numpy array (native header parse + zero-copy view
    for uint8; numpy fallback otherwise)."""
    lib = _load()
    raw = bytes(buf)
    if lib is not None:
        dims = (ctypes.c_int64 * 8)()
        ndim = ctypes.c_int()
        dtype_code = ctypes.c_int()
        off = lib.gmt_idx_header(raw, len(raw), dims, ctypes.byref(ndim),
                                 ctypes.byref(dtype_code))
        if off < 0:
            raise ValueError('malformed idx header')
        shape = tuple(dims[i] for i in range(ndim.value))
        np_dtype = _IDX_DTYPES[dtype_code.value]
        arr = np.frombuffer(
            raw, dtype=np.dtype(np_dtype).newbyteorder('>'), offset=int(off)
        )
        return arr.reshape(shape).astype(np_dtype)
    # numpy fallback
    import struct

    zero, dtype_code, ndim = struct.unpack('>HBB', raw[:4])
    assert zero == 0, 'bad idx magic'
    shape = struct.unpack('>' + 'I' * ndim, raw[4:4 + 4 * ndim])
    np_dtype = _IDX_DTYPES[dtype_code]
    arr = np.frombuffer(
        raw, dtype=np.dtype(np_dtype).newbyteorder('>'), offset=4 + 4 * ndim
    )
    return arr.reshape(shape).astype(np_dtype)


def u8_transform(imgs_u8, binarize, thresh=0.5):
    """(N, H, W[, C]) uint8 -> float32 binarized {0,1} or scaled [-1,1]."""
    imgs_u8 = np.ascontiguousarray(imgs_u8, np.uint8)
    lib = _load()
    out = np.empty(imgs_u8.shape, np.float32)
    if lib is not None:
        n = imgs_u8.size
        if binarize:
            lib.gmt_u8_binarize(
                imgs_u8.ctypes.data, out.ctypes.data, n, ctypes.c_float(thresh)
            )
        else:
            lib.gmt_u8_to_pm1(imgs_u8.ctypes.data, out.ctypes.data, n)
        return out
    if binarize:
        return (imgs_u8.astype(np.float32) / 255.0 > thresh).astype(np.float32)
    return 2.0 * imgs_u8.astype(np.float32) / 255.0 - 1.0


def tile_grid_u8(imgs, n1, n2):
    """(n1*n2, h, w, c) float [0,1] -> (n1*h, n2*w, c) uint8 canvas."""
    imgs = np.ascontiguousarray(imgs, np.float32)
    _, h, w, c = imgs.shape
    lib = _load()
    if lib is not None:
        out = np.empty((n1 * h, n2 * w, c), np.uint8)
        lib.gmt_tile_grid_u8(imgs.ctypes.data, out.ctypes.data, n1, n2, h, w, c)
        return out
    canvas = imgs.reshape(n1, n2, h, w, c).transpose(0, 2, 1, 3, 4)
    canvas = canvas.reshape(n1 * h, n2 * w, c)
    return (np.clip(canvas, 0, 1) * 255).astype(np.uint8)


def gif_encode_gray(frames_u8, fps, loop=0):
    """(T, H, W) uint8 grayscale frames -> animated GIF89a bytes via the
    native LZW encoder, or None if the native library is unavailable
    (callers fall back to imageio). ~20x faster than imageio's
    quantize+encode path on the 1-core host — the sampling-process videos
    (3 x ~T-frame stacks per diffusion evaluate) are the host-side viz
    bottleneck."""
    lib = _load()
    if lib is None or not hasattr(lib, 'gmt_gif_encode_gray'):
        return None
    frames_u8 = np.ascontiguousarray(frames_u8, np.uint8)
    t, h, w = frames_u8.shape
    delay_cs = max(1, int(round(100.0 / max(fps, 1e-6))))
    # LZW worst case ~12 bits/pixel plus per-frame headers and palette
    cap = t * h * w * 2 + t * 64 + 4096
    out = np.empty(cap, np.uint8)
    n = lib.gmt_gif_encode_gray(
        frames_u8.ctypes.data, t, h, w, delay_cs, int(loop),
        out.ctypes.data, cap,
    )
    if n < 0:
        return None
    return out[:n].tobytes()
