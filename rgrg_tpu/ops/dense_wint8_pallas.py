"""Pallas TPU kernel: dense matmul that CONSUMES weight-only int8 kernels.

MEASURED NEGATIVE on v5e — 0.962x of bf16 (3.19 vs 3.07 ms/step, greedy
192 rows, docs/artifacts/weights_int8_pallas_ab.json) — kept as an
opt-in (`weights_int8="pallas"` serving knob); bf16 kernels stay the
default. The byte accounting was right but the launch accounting wins:
replacing 96 dense ops per decode step (4 per layer x 24 layers) with 96
pallas_calls serializes the step at kernel boundaries — XLA compiles the
whole step as ONE program with cross-op HBM prefetch overlap, while each
pallas_call pays its own setup and pipeline ramp (~7 us apiece here,
~0.7 ms/step) — more than the ~0.6 ms the halved weight stream saves at
488 GB/s. Same lesson as the beam-attention kernel
(ops/beam_attn_pallas.py): at this model's decode shapes the XLA floor
is held up by scheduling, not bytes, and a per-op Pallas swap only adds
boundaries. A win would need whole-layer mega-kernels with in-kernel
double-buffered DMA — out of proportion to the <=1.26x byte-model
ceiling.

Why it was tried (docs/artifacts/weights_int8_ab.json, gpt2.py
quantize_decoder_weights docstring): weight-only int8 via XLA measured
NEUTRAL on decode because the kernels are while_loop INVARIANTS — XLA
hoists the int8->bf16 dequant out of the decode loop and materializes
bf16 copies once per call, so every step still reads bf16 bytes from HBM.
A pallas_call that takes the int8 buffer as its operand has nothing to
hoist: the dequant happens INSIDE the kernel, in VMEM, after the int8
bytes crossed HBM. Per decode step the weight traffic genuinely halves
(~590 MB bf16 -> ~295 MB int8 for GPT-2 Medium's per-layer kernels at
the product shape) — unlike the XLA layout, this knob halves the in-loop
traffic too, which still makes it the better co-residency option when
decoder HBM matters more than the last 4% of throughput.

Kernel shape contract (the decode/prefill dense ops):
  x      [M, K]   bf16/f32 activations — M = decode row budget (e.g. 384),
                  K in {1024, 4096}; the full x block stays VMEM-resident
                  across the N-grid (its index map ignores j).
  q      [K, N]   int8 weights, N in {1024, 3072, 4096} (all multiples of
                  the 512 column block).
  scale  [1, N]   f32 per-output-channel dequant scales (2-D row vector —
                  TPU vectors want >=2-D).
  bias   [1, N]   same dtype as the original bias (optional, static).

Per grid step j the kernel reads the int8 column block [K, BN], casts it
to x.dtype IN VMEM (per CLAUDE.md: keep MXU dots in the input dtype with
preferred_element_type=f32 — f32-cast operands force multi-pass f32 MXU
matmuls), does one plain 2-D matmul (the Mosaic-safe formulation: no
batched dims, single contracting dim), then applies scale and bias on the
f32 accumulator: (x @ q) * s == x @ (q * s) exactly.

Callers go through `dense_wint8` which falls back to the XLA dequant path
whenever the shapes don't tile (rows not a multiple of 8, N not a
multiple of the block) — correctness never depends on the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 512    # output-column block: int8 w block [4096, 512] = 2 MB +
                 # its in-VMEM bf16 copy 4 MB + x [384, 4096] bf16 3 MB +
                 # f32 acc [384, 512] 0.75 MB — inside the 16 MB budget
                 # with double-buffered w fetches. Every decoder N
                 # (1024/3072/4096) divides by 512.


def _kernel_bias(x_ref, q_ref, s_ref, b_ref, o_ref):
    acc = jnp.dot(x_ref[:, :], q_ref[:, :].astype(x_ref.dtype),
                  preferred_element_type=jnp.float32)
    y = acc * s_ref[0, :][None, :] + b_ref[0, :][None, :].astype(jnp.float32)
    o_ref[:, :] = y.astype(o_ref.dtype)


def _kernel_nobias(x_ref, q_ref, s_ref, o_ref):
    acc = jnp.dot(x_ref[:, :], q_ref[:, :].astype(x_ref.dtype),
                  preferred_element_type=jnp.float32)
    o_ref[:, :] = (acc * s_ref[0, :][None, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _dense_wint8_pallas(x, q, scale, bias, *, block_n, interpret):
    m, k = x.shape
    n = q.shape[1]
    has_bias = bias is not None
    kernel = _kernel_bias if has_bias else _kernel_nobias
    in_specs = [
        pl.BlockSpec((m, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, block_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_n), lambda j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [x, q, scale]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, block_n), lambda j: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(bias)
    return pl.pallas_call(
        kernel,
        grid=(n // block_n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, block_n), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=interpret,
    )(*args)


def dense_wint8(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray,
                bias: jnp.ndarray | None = None,
                block_n: int = BLOCK_N,
                precision=None) -> jnp.ndarray:
    """y = (x @ q) * scale (+ bias), q int8 [K, N], scale [1, N] f32.

    x may carry leading batch dims ([..., K]); they are flattened for the
    kernel (lane-preserving reshape, free) and restored on the output.
    Shapes that don't tile fall back to the XLA dequant formulation
    (numerically equivalent: scale applied on the f32 accumulator either
    way); `precision` is honored there (the Pallas kernel always
    accumulates f32 via preferred_element_type, so HIGHEST-precision
    parity callers get f32 accumulation on both paths).
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = q.shape[1]
    scale = scale.reshape(1, n)
    if bias is not None:
        bias = bias.reshape(1, n)
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    # the full x block stays VMEM-resident across the N grid; cap it at
    # 6 MB so block-level w double-buffering + the f32 accumulator fit
    # the ~16 MB per-kernel budget (oversize callers — e.g. beam's
    # 1024-row x over the 4096-wide mlp input — take the XLA fallback)
    if (m % 8 == 0 and k % 128 == 0 and n % block_n == 0
            and m * k * x2.dtype.itemsize <= 6 * 2 ** 20):
        out = _dense_wint8_pallas(
            x2, q, scale, bias, block_n=block_n,
            interpret=jax.default_backend() == "cpu")
    else:
        acc = jnp.dot(x2, q.astype(x2.dtype),
                      preferred_element_type=jnp.float32,
                      precision=precision)
        acc = acc * scale[0][None, :]
        if bias is not None:
            acc = acc + bias[0][None, :].astype(jnp.float32)
        out = acc.astype(x.dtype)
    return out.reshape(lead + (n,))
