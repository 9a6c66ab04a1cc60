"""Fused GAPT generator forward — the whole SAB stack in one Pallas program.

**Measured verdict: the probe LOSES — this kernel is opt-in only**
(``GAPTConfig(use_pallas=True)``), kept as the runnable evidence for the
GAPT ceiling claim (VERDICT r3 item 7, PERF.md round 4). On v5e it runs
376-386k jets/s flat across B=512..4096 vs the XLA path's ~1.35M at its
optimal batch: the per-(group, head) attention units — a 16-contraction
[GN, GN] matmul plus a ~6-pass softmax — execute serially on the single
TensorCore with no MXU/VPU overlap and full matmul pipeline latency per
unit (128 units per 32-jet block), while XLA's batched einsums vectorize
the same math across B*H problems with overlapped scheduling. At GAPT's
tiny shapes (5.9 MFLOP/jet), batched-XLA is the right strategy; residency
was not the wall.

Original motivation (kept for the record): the component ablation
(scripts/gapt_gen_ablation.py) prices the attention block at 85% of the
XLA step — head-split transposes, packed-mask construction and the
HBM-materialized intermediates between the 14 ops of each SAB — so this
kernel runs the ENTIRE generator (mask bias -> L x [in-proj, packed
attention, out-proj, residual, FF, residual] -> final FC -> tanh -> mask
concat) over a block of jets without leaving VMEM.

Reference semantics: GAPT_G forward (gapt/model.py:251-274) with MABs
(gapt/model.py:93-139); math identical to models/gapt.gapt_g_apply's jnp
path (which remains the autodiff/training path), modulo float associativity.

Design notes:
- Jet-head packing like ops/attention.mha_apply, but in-kernel: G = 128//N
  jets ride one [G*N, G*N] block-diagonal attention per head. Q/K/V are
  STATIC column slices of the fused qkv matmul output — the [B,N,H,hd]
  transposes of the XLA path do not exist here.
- The cross-jet block mask is built once per program; the per-sender padding
  bias (0 real / -1e30 padded) is precomputed outside as one row per packed
  group and added to the scores together with the block mask. exp(-1e30 -
  max) underflows to exactly 0.0, matching the jnp path's exp(-inf) = 0
  (every diagonal block has >= 1 real sender: counts_from_labels >= 1).
- Group/head/SAB loops are statically unrolled so every slice is static
  (no alignment constraints); groups-per-block is an env-tunable
  (MPGAN_TPU_GAPT_GROUPS, default 8).
- Forward/eval only: training keeps the jnp path (autodiff), as do ISAB,
  layer-norm, dropout>0-in-train, spectral/batch-norm and multi-layer
  FF/head configs (`fused_gapt_eligible`). Eval-mode state is passed
  through unchanged (nothing mutable updates on this path).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """Pallas compiles only on TPU; tests on CPU run the interpreter."""
    return jax.default_backend() != "tpu"


_DEFAULT_GROUPS = int(os.environ.get("MPGAN_TPU_GAPT_GROUPS", "8"))

_NEG = -1e30


def fused_gapt_eligible(cfg, train: bool, batch: int) -> bool:
    """Whether ``gapt_g_fused`` supports this config/shape.

    The fused path is the serving/eval forward; anything that needs mutable
    state (SN power iteration, BN stats), autodiff-visible dropout, or an
    architecture knob the kernel does not implement falls back to the jnp
    path in models/gapt.py.
    """
    la = dict(cfg.linear_args)
    if not cfg.is_generator or train:
        return False
    if cfg.use_isab or cfg.layer_norm:
        return False
    if len(cfg.sab_fc_layers) != 0 or len(cfg.final_fc_layers) != 0:
        return False
    if la.get("batch_norm") or la.get("spectral_norm"):
        return False
    if cfg.embed_dim % cfg.num_heads != 0:
        return False
    if cfg.num_particles > 512:  # [GN, GN] scores must stay VMEM-friendly
        return False
    return _pick_block(batch, max(1, 128 // cfg.num_particles)) is not None


def _pick_block(batch: int, g: int) -> int | None:
    """Jets per grid block: g (packing group) x groups-per-block, the
    largest power-of-two groups count <= the env default that divides."""
    gpb = _DEFAULT_GROUPS
    while gpb >= 1:
        if batch % (g * gpb) == 0:
            return g * gpb
        gpb //= 2
    return None


def _kernel(
    n: int,
    e: int,
    heads: int,
    layers: int,
    feat: int,
    g: int,
    gpb: int,
    alpha: float,
    masked: bool,
    x_ref,
    *refs,
):
    """One block of J = g*gpb jets, rows = [J*n, e] jet-major particles."""
    hd = e // heads
    gn = g * n
    idx = 0
    if masked:
        bias_ref, maskcol_ref = refs[0], refs[1]
        idx = 2
    lw = refs[idx : idx + 6 * layers]
    fc_w, fc_b = refs[idx + 6 * layers], refs[idx + 6 * layers + 1]
    out_ref = refs[-4]
    xbuf, qkv, attn = refs[-3], refs[-2], refs[-1]

    f32 = jnp.float32
    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=f32
    )

    # cross-jet block mask for the packed attention, built once per program
    if g > 1:
        rowg = jax.lax.broadcasted_iota(jnp.int32, (gn, gn), 0) // n
        colg = jax.lax.broadcasted_iota(jnp.int32, (gn, gn), 1) // n
        blockmask = jnp.where(rowg == colg, 0.0, _NEG).astype(f32)
    else:
        blockmask = jnp.zeros((gn, gn), f32)

    xbuf[:] = x_ref[:]
    inv_sqrt_hd = 1.0 / math.sqrt(hd)

    for s in range(layers):
        in_w, in_b, out_w, out_b, ff_w, ff_b = lw[6 * s : 6 * s + 6]
        # fused qkv projection: [J*n, e] x [3e, e]^T -> [J*n, 3e]
        qkv[:] = dot(xbuf[:], in_w[:], (((1,), (1,)), ((), ()))) + in_b[:]
        for gi in range(gpb):
            rows = slice(gi * gn, (gi + 1) * gn)
            base = blockmask
            if masked:
                base = base + bias_ref[gi : gi + 1, :]
            q_rows = qkv[rows, :]
            for h in range(heads):
                qh = q_rows[:, h * hd : (h + 1) * hd]
                kh = q_rows[:, e + h * hd : e + (h + 1) * hd]
                vh = q_rows[:, 2 * e + h * hd : 2 * e + (h + 1) * hd]
                sc = dot(qh, kh, (((1,), (1,)), ((), ()))) * inv_sqrt_hd + base
                sc = sc - jnp.max(sc, axis=-1, keepdims=True)
                w = jnp.exp(sc)
                w = w / jnp.sum(w, axis=-1, keepdims=True)
                attn[rows, h * hd : (h + 1) * hd] = dot(
                    w, vh, (((1,), (0,)), ((), ()))
                )
        # out projection + residual; FF + residual
        xbuf[:] = xbuf[:] + dot(attn[:], out_w[:], (((1,), (1,)), ((), ()))) + out_b[:]
        ff = dot(xbuf[:], ff_w[:], (((1,), (1,)), ((), ()))) + ff_b[:]
        xbuf[:] = xbuf[:] + jnp.where(ff >= 0, ff, alpha * ff)

    y = jnp.tanh(dot(xbuf[:], fc_w[:], (((1,), (1,)), ((), ()))) + fc_b[:])
    out_ref[:, :feat] = y
    if masked:
        out_ref[:, feat : feat + 1] = maskcol_ref[:] - 0.5


def gapt_g_fused(cfg, params: dict, x: jax.Array, mask: jax.Array | None) -> jax.Array:
    """Fused eval-mode GAPT generator forward.

    ``x: [B, N, E]`` noise, ``mask: [B, N, 1]`` (1 real / 0 padded, from
    ops/masking.mask_from_counts) or None. Returns ``[B, N, feat(+1)]``
    matching gapt_g_apply's output (tanh features, ``mask - 0.5`` appended
    when masked). Caller guarantees ``fused_gapt_eligible``.
    """
    b, n, e = x.shape
    heads, layers = cfg.num_heads, cfg.sab_layers
    feat = cfg.feat_size
    g = max(1, 128 // n)
    j = _pick_block(b, g)
    if j is None:  # caller should have checked eligibility
        raise ValueError(f"batch {b} not blockable for packing group {g}")
    gpb = j // g
    gn = g * n
    masked = mask is not None
    fdim = feat + 1 if masked else feat

    x2d = x.reshape(b * n, e).astype(jnp.float32)
    inputs = [x2d]
    in_specs = [
        pl.BlockSpec((j * n, e), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    if masked:
        bias = ((mask[:, :, 0] - 1.0) * -_NEG).reshape(b // g, gn)
        maskcol = mask.reshape(b * n, 1)
        inputs += [bias.astype(jnp.float32), maskcol.astype(jnp.float32)]
        in_specs += [
            pl.BlockSpec((gpb, gn), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((j * n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]

    def _const(a):
        a = jnp.asarray(a, jnp.float32)
        if a.ndim == 1:
            a = a[None, :]
        inputs.append(a)
        in_specs.append(
            pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )

    for s in range(layers):
        sab = params["sabs"][s]["mab"]
        att = sab["attention"]
        _const(att["in_proj_w"])
        _const(att["in_proj_b"])
        _const(att["out_w"])
        _const(att["out_b"])
        lyr = sab["ff"]["layers"][0]
        _const(lyr["w"])
        _const(lyr["b"])
    fc = params["final_fc"]["layers"][0]
    _const(fc["w"])
    _const(fc["b"])

    la = dict(cfg.linear_args)
    alpha = float(la.get("leaky_relu_alpha", 0.2))

    out = pl.pallas_call(
        functools.partial(
            _kernel, n, e, heads, layers, feat, g, gpb, alpha, masked
        ),
        grid=(b // j,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((j * n, fdim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * n, fdim), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((j * n, e), jnp.float32),
            pltpu.VMEM((j * n, 3 * e), jnp.float32),
            pltpu.VMEM((j * n, e), jnp.float32),
        ],
        interpret=_interpret(),
    )(*inputs)
    return out.reshape(b, n, fdim).astype(x.dtype)
