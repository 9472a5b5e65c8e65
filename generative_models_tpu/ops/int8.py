"""Int8 quantized GEMM for serving.

The reference has no quantized inference path at all (its deployment story
stops at TorchScript tracing of the two arbiters, gms/common.py:204-208).
This module is the TPU-native post-training quantization layer the
framework adds for serving:

  * weights are quantized ONCE, per output channel, symmetric absmax
    (`quantize_int8`) — int8 weight tensors halve the HBM weight traffic
    of bf16 (4x vs f32), which is the binding constraint of small-batch
    autoregressive decode (every step re-reads every weight);
  * because the scale is per OUTPUT channel, it commutes out of the
    matmul:  x @ (q * s) == (x @ q) * s.  The Pallas kernel is therefore a
    pure quantized GEMM and the dequant epilogue is a rank-1 elementwise
    multiply that XLA fuses into the consumer (bias add / activation);
  * two modes:
      - w8a16 (weight-only): int8 weight tiles are dequantized to bf16 in
        VMEM and ride the bf16 MXU — HBM win, bitwise-tame accuracy;
      - w8a8 (dynamic): activations are ALSO absmax-quantized per row
        (scale computed in XLA, fused), and the MXU runs int8 x int8 ->
        int32 — on v5e the int8 systolic path is 2x bf16 peak FLOPs.

Kernel structure mirrors ops/masked_dense.py (3-D blocked grid, K
innermost, f32/i32 accumulation in the revisited output tile); interpret
mode runs the same block algorithm on CPU for tests.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from generative_models_tpu.ops.common import on_tpu as _on_tpu
from generative_models_tpu.ops.common import round_up as _round_up


def quantize_int8(w):
    """(K, N) float weights -> (q int8 (K, N), scale f32 (N,)) per-output-
    channel symmetric absmax: w ~= q * scale."""
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)  # all-zero columns
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _gemm_kernel(x_ref, w_ref, o_ref, *, acc_dtype):
    """o += x @ w, one (bm, bn, bk) tile; K innermost, accumulated into the
    revisited output tile. int8 inputs accumulate i32 (exact); bf16 inputs
    accumulate f32."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jnp.dot(x_ref[:], w_ref[:], preferred_element_type=acc_dtype)


def _dequant_gemm_kernel(x_ref, w_ref, o_ref):
    """o += x @ bf16(w): weight tiles arrive int8 from HBM (half the
    bandwidth) and are widened in VMEM for the bf16 MXU."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    w = w_ref[:].astype(jnp.bfloat16)
    o_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)


def _pallas_gemm(x, w, *, dequant_w=False, interpret=None):
    """Blocked GEMM: x (B, K) @ w (K, N). int8 x int8 -> i32 when both are
    int8; otherwise bf16 x (bf16|dequantized-int8) -> f32."""
    B, K = x.shape
    K2, N = w.shape
    assert K == K2
    if interpret is None:
        interpret = not _on_tpu()
    int_path = x.dtype == jnp.int8 and w.dtype == jnp.int8 and not dequant_w
    # int8 VMEM tiles are (32, 128)-granular; f32/bf16 are (8, 128)
    bm = min(_round_up(B, 32 if int_path else 8), 256)
    bn = min(_round_up(N, 128), 512)
    bk = min(_round_up(K, 128), 512)
    Bp, Kp, Np = _round_up(B, bm), _round_up(K, bk), _round_up(N, bn)
    xp = jnp.pad(x, ((0, Bp - B), (0, Kp - K)))
    wp = jnp.pad(w, ((0, Kp - K), (0, Np - N)))
    if int_path:
        acc = jnp.int32
        kernel = functools.partial(_gemm_kernel, acc_dtype=jnp.int32)
    elif dequant_w:
        assert w.dtype == jnp.int8
        acc = jnp.float32
        kernel = _dequant_gemm_kernel
        dt = jnp.bfloat16 if _on_tpu() else jnp.float32
        xp = xp.astype(dt)
    else:
        acc = jnp.float32
        kernel = functools.partial(_gemm_kernel, acc_dtype=jnp.float32)
        dt = jnp.bfloat16 if _on_tpu() else jnp.float32
        xp, wp = xp.astype(dt), wp.astype(dt)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // bm, Np // bn, Kp // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, Np), acc),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Kp * Np,
            bytes_accessed=xp.dtype.itemsize * Bp * Kp
            + wp.dtype.itemsize * Kp * Np
            + jnp.dtype(acc).itemsize * Bp * Np,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wp)
    return out[:B, :N]


def int8_matmul(x, q, scale, act_quant=True, use_pallas=True, interpret=None):
    """y = x @ dequant(q)  with q int8 (K, N), scale f32 (N,).

    act_quant=True (w8a8): x is dynamically absmax-quantized per row in XLA
    (cheap, fused) and the GEMM runs int8 x int8 -> i32 on the MXU; the
    row/column scales multiply back in the epilogue.
    act_quant=False (w8a16): x stays bf16; weight tiles are dequantized in
    VMEM, so HBM still only carries int8 weights.

    x: (..., K); returns (..., N) f32.
    """
    batch_shape = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    if act_quant:
        sx = jnp.maximum(jnp.max(jnp.abs(x2d), axis=1, keepdims=True), 1e-12) / 127.0
        xq = jnp.clip(jnp.round(x2d / sx), -127, 127).astype(jnp.int8)
        if use_pallas:
            acc = _pallas_gemm(xq, q, interpret=interpret).astype(jnp.float32)
        else:
            acc = jax.lax.dot(
                xq, q, preferred_element_type=jnp.int32
            ).astype(jnp.float32)
        y = acc * sx * scale[None, :]
    else:
        if use_pallas:
            y = _pallas_gemm(x2d, q, dequant_w=True, interpret=interpret)
        else:
            y = x2d @ q.astype(x2d.dtype)
        y = y * scale[None, :]
    return y.reshape(*batch_shape, q.shape[-1])


# ---------------------------------------------------------------------- #
# serving-side param quantization + flax interception
# ---------------------------------------------------------------------- #
def quantize_dense_tree(params, min_dim=64, min_size=16384):
    """Walk a flax param tree; for every Dense-style 2-D 'kernel' leaf with
    both dims >= min_dim and >= min_size elements, record (q, scale) keyed
    by the OWNING MODULE's path tuple. Returns the table; the original tree
    is untouched (unread f32 kernels are dead-code-eliminated from the
    compiled serving executable)."""
    from flax.traverse_util import flatten_dict

    table = {}
    for path, leaf in flatten_dict(params).items():
        if path[-1] != 'kernel' or getattr(leaf, 'ndim', 0) != 2:
            continue
        K, N = leaf.shape
        if min(K, N) < min_dim or K * N < min_size:
            continue
        table[tuple(path[:-1])] = quantize_int8(leaf)
    return table


def quantize_masked_mlp(model, min_size=16384):
    """MADE-style masked layers: at serving time w*mask is a CONSTANT, so
    the mask folds into the quantized weight and the int8 GEMM needs no
    mask logic at all (training keeps ops/masked_dense.py). Returns
    {module_path: ((q, scale) per layer)} for every MaskedMLP in the model
    (MADE's net IS one; empty dict otherwise)."""
    from generative_models_tpu.models.made import MaskedMLP

    net = getattr(model, 'net', None)
    if not isinstance(net, MaskedMLP):
        return {}
    params = model.state.params
    layers = []
    for i, mask in enumerate(net.masks):
        w = params[f'w{i}']
        if w.size < min_size:
            return {}  # all-or-nothing: a partial swap wouldn't simplify
        layers.append(quantize_int8(w * mask))
    return {(): tuple(layers)}


def build_quant_interceptor(model, mode='w8a8', use_pallas=None):
    """One interceptor covering both quantization surfaces: nn.Dense
    modules (per-module table) and MADE's MaskedMLP (mask folded into the
    int8 weights). Returns (interceptor, n_quantized_kernels) — interceptor
    is None when nothing clears the size thresholds."""
    dense_table = quantize_dense_tree(model.state.params)
    masked_table = quantize_masked_mlp(model)
    n = len(dense_table) + sum(len(v) for v in masked_table.values())
    if n == 0:
        return None, 0
    interceptor = make_dense_interceptor(
        dense_table, mode, use_pallas, masked_table=masked_table
    )
    return interceptor, n


def make_dense_interceptor(table, mode='w8a8', use_pallas=None, masked_table=None):
    """flax intercept_methods hook replacing nn.Dense.__call__ with the
    quantized GEMM for every module whose path is in `table`. Applies at
    trace time, so it works identically under jit and jax.export."""
    import flax.linen as nn

    if use_pallas is None:
        use_pallas = _on_tpu()
    act_quant = mode == 'w8a8'
    assert mode in ('w8a8', 'w8a16'), f'unknown quant mode {mode}'
    masked_table = masked_table or {}

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name != '__call__':
            return next_fun(*args, **kwargs)
        if isinstance(mod, nn.Dense) and mod.path in table:
            q, scale = table[mod.path]
            x = args[0]
            y = int8_matmul(
                x, q, scale, act_quant=act_quant, use_pallas=use_pallas
            )
            if mod.use_bias:
                y = y + mod.variables['params']['bias']
            return y.astype(jnp.result_type(x.dtype, jnp.float32))
        if masked_table and mod.path in masked_table:
            from generative_models_tpu.models.made import MaskedMLP

            if isinstance(mod, MaskedMLP):
                layers = masked_table[mod.path]
                p = mod.variables['params']
                x = args[0]
                for i, (q, scale) in enumerate(layers):
                    x = int8_matmul(
                        x, q, scale, act_quant=act_quant, use_pallas=use_pallas
                    ) + p[f'b{i}']
                    if i < len(layers) - 1:
                        x = nn.relu(x)
                return x
        return next_fun(*args, **kwargs)

    return interceptor
