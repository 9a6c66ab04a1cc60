"""Dense message passing over particle clouds.

Re-implements the reference ``MPLayer`` (mpgan/model.py:91-384) functionally:
one message-passing iteration builds the pairwise tensor
``A[b, i, j] = [x_i  (+)  x_j  (+) optional edge features]``, runs the edge MLP
``fe``, masks out padded senders, aggregates over senders (sum or mean),
concatenates the aggregate with the node features and runs the node MLP ``fn``.

TPU-first design notes:

- the pairwise tensor is built by broadcasting (``[B, N, 1, F]`` against
  ``[B, 1, N, F]``) — no ``repeat``/``view`` reshuffles; XLA fuses the
  concatenation into the first ``fe`` matmul,
- knn sparsification uses a static top-k over the dense distance matrix
  (argsort + take_along_axis), mirroring the reference's sort-and-gather
  (mpgan/model.py:347-372) in static shapes,
- a fused Pallas kernel path (mpgan_tpu/ops/mp_pallas.py) avoids
  materializing the ``[B, N, N, fe_out]`` activation in HBM.

Known reference defect deliberately fixed here: the reference tiles
conditioning labels with ``Tensor.repeat`` into a batch-major flattened pairwise
tensor (mpgan/model.py:249-253, 272-276), which cycles labels *tile-major* and
scrambles them across the batch whenever ``clabels`` or ``mask_fne_np`` are
used with batch size > 1. We broadcast the labels per batch element instead.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import threading
from typing import Any

import jax
import jax.numpy as jnp

from .gather import one_hot_gather
from .linear import MLPConfig, mlp_apply, mlp_init
from .spectral_norm import spectral_normalize

_SKIP_WGRADS = threading.local()


@contextlib.contextmanager
def skip_weight_grads():
    """Trace-time hint: fused MP kernels traced inside this context build a
    backward that SKIPS the edge-MLP weight-gradient contractions (returning
    zeros for those cotangents).

    Use it around applies whose weight cotangents are discarded — the G step
    differentiates through D w.r.t. D's *input* only (train_step.py g_step;
    train.py:479-523 has the same structure), but the fused backward is one
    opaque Pallas kernel XLA cannot dead-code-eliminate into, so without the
    hint it computes ``acts^T @ dz`` for every layer (one of the three
    matmuls per layer) for nothing. Purely an optimization: input gradients
    are bit-identical with or without it. Wrong use (consuming weight grads
    traced under the context) yields exact zeros, not noise."""
    prev = getattr(_SKIP_WGRADS, "v", False)
    _SKIP_WGRADS.v = True
    try:
        yield
    finally:
        _SKIP_WGRADS.v = prev


def _need_wgrads() -> bool:
    return not getattr(_SKIP_WGRADS, "v", False)


@dataclasses.dataclass(frozen=True)
class MPLayerConfig:
    """Static config for one message-passing iteration.

    Mirrors the reference ``MPLayer.__init__`` arguments
    (mpgan/model.py:129-204)."""

    input_node_size: int
    output_node_size: int
    fe: MLPConfig
    fn: MLPConfig
    pos_diffs: bool = False
    all_ef: bool = True
    coords: str = "polarrel"
    delta_coords: bool = False
    delta_r: bool = True
    clabels: int = 0
    mask_fne_np: bool = False
    fully_connected: bool = True
    num_knn: int = 20
    self_loops: bool = True
    sum_agg: bool = True

    @property
    def num_coords(self) -> int:
        return 3 if self.coords == "cartesian" else 2

    @property
    def num_ef(self) -> int:
        n = 0
        if self.pos_diffs:
            if self.delta_coords:
                n += self.num_coords
            if self.delta_r or self.all_ef:
                n += 1
        return n

    @staticmethod
    def build(
        input_node_size: int,
        fe_layers: list[int],
        fn_layers: list[int],
        output_node_size: int,
        linear_args: dict[str, Any] | None = None,
        **mp_args: Any,
    ) -> "MPLayerConfig":
        """Assemble fe/fn MLP configs the way the reference does
        (mpgan/model.py:183-204): fe input is
        ``2 * node + num_ef + clabels + mask_fne_np``; fn input is
        ``fe_out + node + clabels + mask_fne_np`` with a linear final layer."""
        linear_args = dict(linear_args or {})
        cfg = MPLayerConfig(
            input_node_size=input_node_size,
            output_node_size=output_node_size,
            fe=MLPConfig(sizes=()),
            fn=MLPConfig(sizes=()),
            **mp_args,
        )
        fe_in = 2 * input_node_size + cfg.num_ef + cfg.clabels + int(cfg.mask_fne_np)
        fe = MLPConfig.build(fe_layers, input_size=fe_in, final_linear=False, **linear_args)
        fn_in = fe_layers[-1] + input_node_size + cfg.clabels + int(cfg.mask_fne_np)
        fn = MLPConfig.build(
            fn_layers, input_size=fn_in, output_size=output_node_size,
            final_linear=True, **linear_args,
        )
        return dataclasses.replace(cfg, fe=fe, fn=fn)


def mp_layer_init(rng: jax.Array, cfg: MPLayerConfig, dtype=jnp.float32):
    fe_key, fn_key = jax.random.split(rng)
    fe_params, fe_state = mlp_init(fe_key, cfg.fe, dtype)
    fn_params, fn_state = mlp_init(fn_key, cfg.fn, dtype)
    return {"fe": fe_params, "fn": fn_params}, {"fe": fe_state, "fn": fn_state}


def _pairwise_fully_connected(cfg: MPLayerConfig, x: jax.Array) -> jax.Array:
    """``A[b, i, j] = [x_i, x_j (, dist features)]`` (mpgan/model.py:284-317)."""
    n = x.shape[1]
    x1 = jnp.broadcast_to(x[:, :, None, :], x.shape[:1] + (n, n, x.shape[-1]))
    x2 = jnp.broadcast_to(x[:, None, :, :], x.shape[:1] + (n, n, x.shape[-1]))
    parts = [x1, x2]
    if cfg.pos_diffs:
        if cfg.all_ef:
            diffs = x2 - x1
        else:
            diffs = x2[..., : cfg.num_coords] - x1[..., : cfg.num_coords]
        # the reference adds 1e-12 to each diff component before the norm
        # (mpgan/model.py:304) — reproduced for bit-parity
        dists = jnp.linalg.norm(diffs + 1e-12, axis=-1, keepdims=True)
        if cfg.delta_r and cfg.delta_coords:
            parts = [x1, x2, diffs, dists]
        elif cfg.delta_r or cfg.all_ef:
            parts = [x1, x2, dists]
        elif cfg.delta_coords:
            parts = [x1, x2, diffs]
    return jnp.concatenate(parts, axis=-1)


def _knn_search(
    cfg: MPLayerConfig, x: jax.Array, mask: jax.Array | None
) -> tuple[jax.Array, jax.Array]:
    """Neighbour indices + distances (mpgan/model.py:339-359).

    Masked particles are pushed far away with the reference's ``mul = 1e4``
    trick (mpgan/model.py:332-334) so they are never selected as neighbours.
    Returns ``(idx [B, N, k] int32, dists [B, N, k, 1])``.
    """
    if mask is not None:
        mul = 1e4
        x_far = ((1 - mul) * mask + mul) * x
    else:
        x_far = x
    x1 = x[:, :, None, :]
    x2 = x_far[:, None, :, :]
    if cfg.all_ef or not cfg.pos_diffs:
        diffs = x2 - x1
    else:
        diffs = x2[..., : cfg.num_coords] - x1[..., : cfg.num_coords]
    dists = jnp.linalg.norm(diffs + 1e-12, axis=-1)  # [B, N, N]

    start = 0 if cfg.self_loops else 1
    # approx_max_k at recall 1.0 selects the exact k-smallest set (the
    # reference's ascending sort-and-slice, mpgan/model.py:347-359) via the
    # TPU-optimized partial-reduction path (~1.4x faster than lax.top_k);
    # only the tie order within the k set can differ, which is irrelevant
    # under the layer's sum/mean aggregation
    neg_top, order = jax.lax.approx_max_k(
        -dists, cfg.num_knn + start, recall_target=1.0, aggregate_to_topk=True
    )
    idx = order[:, :, start:]  # [B, N, k]
    knn_dists = -neg_top[:, :, start:, None]
    return idx, knn_dists


def _pairwise_knn(
    cfg: MPLayerConfig, x: jax.Array, mask: jax.Array | None
) -> tuple[jax.Array, jax.Array | None]:
    """Static-shape k-nearest-neighbour edge tensor (mpgan/model.py:319-381).

    Returns ``(A, A_mask)`` with ``A: [B, N, k, fe_base]`` and ``A_mask`` the
    gathered sender masks ``[B, N, k, 1]`` (None if ``mask`` is None).
    """
    b, n, ns = x.shape
    idx, knn_dists = _knn_search(cfg, x, mask)

    # gather neighbour features directly along the particle axis — never
    # materialize the [B, N, N, F] repeat; one-hot matmul gathers are
    # bit-identical to take_along_axis and ~11x faster on TPU (ops/gather.py)
    x2_knn = one_hot_gather(x, idx)
    a_mask = None
    if mask is not None:
        a_mask = one_hot_gather(mask, idx)
    x1_knn = jnp.broadcast_to(x[:, :, None, :], (b, n, cfg.num_knn, ns))

    if cfg.pos_diffs:
        a = jnp.concatenate([x1_knn, x2_knn, knn_dists], axis=-1)
    else:
        a = jnp.concatenate([x1_knn, x2_knn], axis=-1)
    return a, a_mask


def _append_cond(cfg: MPLayerConfig, t: jax.Array, labels, num_jet_particles) -> jax.Array:
    """Broadcast conditioning labels / particle counts onto the trailing axis."""
    parts = [t]
    extra_dims = t.ndim - 2
    if cfg.clabels:
        lab = labels[:, : cfg.clabels].astype(t.dtype)
        lab = lab.reshape(lab.shape[:1] + (1,) * extra_dims + lab.shape[1:])
        parts.append(jnp.broadcast_to(lab, t.shape[:-1] + (cfg.clabels,)))
    if cfg.mask_fne_np:
        njp = num_jet_particles.astype(t.dtype).reshape((-1,) + (1,) * (t.ndim - 1))
        parts.append(jnp.broadcast_to(njp, t.shape[:-1] + (1,)))
    return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else t


def fused_eligible(cfg: MPLayerConfig, train: bool) -> bool:
    """The Pallas fused paths cover the dense fully-connected layer without
    pairwise-distance edge features, and the knn layer with any edge
    features (the gather happens outside the kernel). fe dropout runs
    in-kernel via a stateless hash; fe-internal batch-norm needs the jnp
    path (it reduces over the whole batch, which the per-jet grid can't
    see)."""
    if cfg.fe.batch_norm:
        return False
    if cfg.fully_connected:
        return not cfg.pos_diffs
    return True


def _fe_weights_sn(cfg: MPLayerConfig, params, state, update_sn):
    """Resolve fe-layer weights, applying + advancing spectral norm."""
    fe_cfg = cfg.fe
    new_fe_state: dict = {}
    if fe_cfg.spectral_norm:
        new_fe_state["sn_u"] = []
    weights = []
    for i, layer in enumerate(params["fe"]["layers"]):
        w, b = layer["w"], layer["b"]
        if fe_cfg.layer_has_sn(i):
            u = state["fe"]["sn_u"][i]
            w, u_new, _ = spectral_normalize(w, u)
            new_fe_state["sn_u"].append(u_new if update_sn else u)
        elif fe_cfg.spectral_norm:
            new_fe_state["sn_u"].append(None)
        weights.append((w, b))
    return weights, new_fe_state


def _decompose_first_layer(
    cfg: MPLayerConfig, weights, x, labels, num_jet_particles, extract_wd: bool = False
):
    """Split fe layer 1 into receiver/sender embeddings for the fused kernels.

    W1 columns follow the pair-row layout ``[x_recv | x_send | dists? |
    clabels | njp]`` (mpgan/model.py:372-376 plus the conditioning appends);
    the bias and every per-jet conditioning term fold into the sender
    embedding. Returns ``(u1, u2, w_d)``: receiver embeddings ``[B, N, H1]``,
    sender embeddings ``[B, N, H1]`` (bias + conditioning folded), and the
    dists weight column ``[H1]`` when ``extract_wd`` (else None)."""
    f = cfg.input_node_size
    w1, b1 = weights[0]
    u1 = x @ w1[:, :f].T
    bias = jnp.broadcast_to(b1, (x.shape[0], b1.shape[0]))
    col = 2 * f
    w_d = None
    if extract_wd:
        w_d = w1[:, col]
        col += 1
    if cfg.clabels:
        bias = bias + labels[:, : cfg.clabels].astype(x.dtype) @ w1[:, col : col + cfg.clabels].T
        col += cfg.clabels
    if cfg.mask_fne_np:
        njp = num_jet_particles.astype(x.dtype).reshape(-1, 1)
        bias = bias + njp @ w1[:, col : col + 1].T
    u2 = x @ w1[:, f : 2 * f].T + bias[:, None, :]
    return u1, u2, w_d


def _mp_layer_apply_fused(
    cfg: MPLayerConfig,
    params: dict,
    state: dict,
    x: jax.Array,
    mask: jax.Array | None,
    labels: jax.Array | None,
    num_jet_particles: jax.Array | None,
    train: bool,
    rng: jax.Array | None,
    update_sn: bool,
    block_receivers: int | None = None,
) -> tuple[jax.Array, dict]:
    """Fused edge path: decompose fe layer 1 into receiver/sender embeddings
    (+ per-jet conditioning folded into the sender term) and run the
    VMEM-resident Pallas kernel for the N^2 MLP + masked aggregation."""
    from .mp_pallas import edge_aggregate

    if block_receivers is None:
        # read at trace time (not import time) so sweep drivers that set the
        # env var after importing this module are honored — same contract as
        # knn_pallas._pick_jb / mp_pallas._block_receivers
        block_receivers = int(os.environ.get("MPGAN_TPU_BLOCK_RECEIVERS", "32"))

    weights, fe_state = _fe_weights_sn(cfg, params, state, update_sn)
    u1, u2, _ = _decompose_first_layer(cfg, weights, x, labels, num_jet_particles)
    hidden_flat = tuple(p for w, b in weights[1:] for p in (w.T, b))
    m = mask if mask is not None else jnp.ones(x.shape[:2] + (1,), x.dtype)

    # eval-path fusion of the fn MLP into the edge kernel (VERDICT r4
    # item 3): legal only when fn is a plain LeakyReLU/linear chain with no
    # per-jet conditioning columns (the bench/generation configs). Default
    # ON in jets-mode (N <= 64), where the extra in-program MXU work hides
    # under the VPU skeleton: 30p generation 338k -> 384k jets/s (+13.5%).
    # Default OFF in receiver-mode (150p measured -3%: per-block fn matmuls
    # are too small to pay for their VMEM pressure). MPGAN_TPU_FUSE_FN=0/1
    # forces either way. Train mode keeps the custom-VJP edge kernel + XLA
    # fn.
    fuse_env = os.environ.get("MPGAN_TPU_FUSE_FN")
    if (
        not train
        and (fuse_env == "1" or (fuse_env is None and x.shape[1] <= 64))
        and not cfg.fn.batch_norm
        and not cfg.fn.spectral_norm
        and cfg.clabels == 0
        and not cfg.mask_fne_np
    ):
        from .mp_pallas import edge_aggregate_fn

        fe_out = cfg.fe.sizes[-1]
        fn_layers = params["fn"]["layers"]
        w1t = fn_layers[0]["w"].T  # [fn_in, out]; rows = [agg | x]
        fn_flat = [w1t[:fe_out], w1t[fe_out:], fn_layers[0]["b"]]
        for lay in fn_layers[1:]:
            fn_flat.extend([lay["w"].T, lay["b"]])
        y = edge_aggregate_fn(
            u1, u2, m, hidden_flat, x, tuple(fn_flat),
            cfg.fe.leaky_relu_alpha, cfg.sum_agg, block_receivers,
            cfg.fn.leaky_relu_alpha, cfg.fn.final_linear,
        )
        return y, {"fe": fe_state, "fn": state["fn"]}

    dropout_p = cfg.fe.dropout_p if train else 0.0
    seed = None
    if dropout_p > 0:
        if rng is None:
            raise ValueError("fe dropout in train mode needs an rng")
        seed = jax.random.randint(
            jax.random.fold_in(rng, 1), (), 0, 2**30, dtype=jnp.int32
        ).astype(jnp.float32)
    agg = edge_aggregate(
        u1, u2, m, hidden_flat, seed, cfg.fe.leaky_relu_alpha, cfg.sum_agg,
        block_receivers, dropout_p, _need_wgrads(),
    )

    h = jnp.concatenate([agg, x], axis=-1)
    h = _append_cond(cfg, h, labels, num_jet_particles)
    y, fn_state = mlp_apply(
        cfg.fn, params["fn"], state["fn"], h, train=train, rng=rng, update_sn=update_sn
    )
    return y, {"fe": fe_state, "fn": fn_state}


def _mp_layer_apply_fused_knn(
    cfg: MPLayerConfig,
    params: dict,
    state: dict,
    x: jax.Array,
    mask: jax.Array | None,
    labels: jax.Array | None,
    num_jet_particles: jax.Array | None,
    train: bool,
    rng: jax.Array | None,
    update_sn: bool,
) -> tuple[jax.Array, dict]:
    """Fused knn path: the Pallas select kernel finds the neighbours
    (in-VMEM matmul distances + k min-extractions — replaces the round-2
    ``lax.approx_max_k`` over an HBM [B,N,N] matrix, measured 1.49 ms ->
    in-kernel at B=512/N=150, scripts/knn_ablation.py); the gather kernel
    then pulls them via an in-VMEM one-hot matmul and fuses the full
    edge-MLP chain + masked k-aggregation (7.5x less matmul work than dense
    at N=150, k=20, and no HBM gather). ``MPGAN_TPU_KNN_SELECT=0`` falls
    back to the XLA search for ablations.

    Three gather-kernel generations exist, selected by
    ``MPGAN_TPU_KNN_KERNEL`` (read at trace time; default ``"3"``):

    - ``"3"`` (default): first fe layer decomposed like the dense path
      (u1/u2 embeddings computed here, bias + per-jet conditioning folded
      into u2) on neighbour-major pair rows — receiver broadcast and
      k-aggregation are aligned VPU copies/adds that overlap the hidden
      chain's MXU passes; only the sender gather (and backward scatter)
      is a one-hot MXU matmul. Measured at B=512/N=150/k=20: forward
      kernel 3.62 ms vs v2's 4.79, generation 39.5k vs 32.8k jets/s
      (+20%), train step 37.8 vs 45.4 ms (PERF.md round 3);
    - ``"2"``: same decomposition, receiver-major rows, with the
      broadcast and aggregation as one-hot MXU matmuls too (they compete
      with the hidden chain for the MXU — v3's win);
    - ``"1"``: the round-2 kernel (raw ``[x_i, x_j, dists, cond]`` pair
      rows assembled in-kernel), kept for ablations."""
    from .knn_pallas import (
        knn_edge_aggregate,
        knn_edge_aggregate_v2,
        knn_edge_aggregate_v3,
        knn_fused_layer,
        knn_select,
        knn_select_nm,
    )

    weights, fe_state = _fe_weights_sn(cfg, params, state, update_sn)
    version = os.environ.get("MPGAN_TPU_KNN_KERNEL", "4")
    use_select_kernel = os.environ.get("MPGAN_TPU_KNN_SELECT", "1") != "0"
    if not use_select_kernel and version == "4":
        version = "3"  # the fully fused kernel IS the select kernel

    dropout_p = cfg.fe.dropout_p if train else 0.0
    seed = None
    if dropout_p > 0:
        if rng is None:
            raise ValueError("fe dropout in train mode needs an rng")
        seed = jax.random.randint(
            jax.random.fold_in(rng, 1), (), 0, 2**30, dtype=jnp.int32
        ).astype(jnp.float32)

    if version == "4":
        # round 5: select + gather + edge MLP + aggregation in ONE kernel —
        # the extraction passes' equality masks double as the gather one-hots
        # (no iota-compare rebuild, no idx HBM round-trip) and the per-pass
        # gather matmuls overlap the remaining extraction passes
        sel_cols = slice(None) if (cfg.all_ef or not cfg.pos_diffs) else slice(0, cfg.num_coords)
        x_far = ((1 - 1e4) * mask + 1e4) * x if mask is not None else x
        m = mask if mask is not None else jnp.ones(x.shape[:2] + (1,), x.dtype)
        u1, u2, w_d = _decompose_first_layer(
            cfg, weights, x, labels, num_jet_particles, extract_wd=cfg.pos_diffs
        )
        u2m = jnp.concatenate([u2, m.astype(x.dtype)], axis=-1)
        hidden_flat = tuple(p for w, bb in weights[1:] for p in (w.T, bb))
        agg = knn_fused_layer(
            x[..., sel_cols], x_far[..., sel_cols], u1, u2m, w_d, hidden_flat,
            seed, cfg.num_knn, cfg.self_loops, cfg.pos_diffs,
            cfg.fe.leaky_relu_alpha, cfg.sum_agg, dropout_p, _need_wgrads(),
        )
        h = jnp.concatenate([agg, x], axis=-1)
        h = _append_cond(cfg, h, labels, num_jet_particles)
        y, fn_state = mlp_apply(
            cfg.fn, params["fn"], state["fn"], h, train=train, rng=rng,
            update_sn=update_sn,
        )
        return y, {"fe": fe_state, "fn": fn_state}

    premajor = False
    if use_select_kernel and version == "3":
        # fused select: search + exact edge distances in ONE kernel, emitted
        # neighbour-major — no idx/dists HBM transposes, no XLA one-hot
        # gather + norm glue (knn_pallas.knn_select_nm)
        sel_cols = slice(None) if (cfg.all_ef or not cfg.pos_diffs) else slice(0, cfg.num_coords)
        x_far = ((1 - 1e4) * mask + 1e4) * x if mask is not None else x
        idx, dists = knn_select_nm(
            x[..., sel_cols], x_far[..., sel_cols], cfg.num_knn, cfg.self_loops,
            cfg.pos_diffs,
        )
        premajor = True
    elif use_select_kernel:
        sel_cols = slice(None) if (cfg.all_ef or not cfg.pos_diffs) else slice(0, cfg.num_coords)
        x_far = ((1 - 1e4) * mask + 1e4) * x if mask is not None else x
        idx = knn_select(
            x[..., sel_cols], x_far[..., sel_cols], cfg.num_knn, cfg.self_loops
        )
        dists = None
        if cfg.pos_diffs:
            # exact reference dist values for the selected edges only
            # (mpgan/model.py:347-359): gather then norm(x2 - x1 + 1e-12);
            # the gather is a one-hot matmul (bit-identical, 11.6x faster
            # than take_along_axis on TPU — ops/gather.py)
            x2g = one_hot_gather(x_far[..., sel_cols], idx)
            diffs = x2g - x[..., sel_cols][:, :, None, :]
            dists = jnp.linalg.norm(diffs + 1e-12, axis=-1)
    else:
        idx, knn_dists = _knn_search(cfg, x, mask)
        dists = knn_dists[..., 0] if cfg.pos_diffs else None

    m = mask if mask is not None else jnp.ones(x.shape[:2] + (1,), x.dtype)

    if version != "1":
        # v2/v3: first-layer decomposition (dense-kernel style); v3 further
        # reorders pair rows neighbour-major so the receiver broadcast and
        # k-aggregation run as aligned VPU copies/adds (knn_pallas.py)
        u1, u2, w_d = _decompose_first_layer(
            cfg, weights, x, labels, num_jet_particles, extract_wd=cfg.pos_diffs
        )
        u2m = jnp.concatenate([u2, m.astype(x.dtype)], axis=-1)
        hidden_flat = tuple(p for w, bb in weights[1:] for p in (w.T, bb))
        if version == "3":
            agg = knn_edge_aggregate_v3(
                u1, u2m, idx, dists, w_d, hidden_flat, seed,
                cfg.fe.leaky_relu_alpha, cfg.sum_agg, dropout_p, _need_wgrads(),
                premajor,
            )
        else:
            agg = knn_edge_aggregate_v2(
                u1, u2m, idx, dists, w_d, hidden_flat, seed,
                cfg.fe.leaky_relu_alpha, cfg.sum_agg, dropout_p, _need_wgrads(),
            )
    else:
        cond = None
        if cfg.clabels or cfg.mask_fne_np:
            parts = []
            if cfg.clabels:
                parts.append(labels[:, : cfg.clabels].astype(x.dtype))
            if cfg.mask_fne_np:
                parts.append(num_jet_particles.astype(x.dtype).reshape(-1, 1))
            cond = jnp.concatenate(parts, axis=-1)
        weights_t = tuple(p for w, bb in weights for p in (w.T, bb))
        agg = knn_edge_aggregate(
            x, m, idx, dists, cond, weights_t, seed,
            cfg.fe.leaky_relu_alpha, cfg.sum_agg, dropout_p,
        )

    h = jnp.concatenate([agg, x], axis=-1)
    h = _append_cond(cfg, h, labels, num_jet_particles)
    y, fn_state = mlp_apply(
        cfg.fn, params["fn"], state["fn"], h, train=train, rng=rng, update_sn=update_sn
    )
    return y, {"fe": fe_state, "fn": fn_state}


def mp_layer_apply(
    cfg: MPLayerConfig,
    params: dict,
    state: dict,
    x: jax.Array,
    *,
    mask: jax.Array | None = None,
    labels: jax.Array | None = None,
    num_jet_particles: jax.Array | None = None,
    train: bool = False,
    rng: jax.Array | None = None,
    update_sn: bool = True,
    use_pallas: bool | None = None,
) -> tuple[jax.Array, dict]:
    """One message-passing iteration (mpgan/model.py:206-282).

    ``x: [B, N, input_node_size]`` -> ``[B, N, output_node_size]``.
    ``use_pallas=None`` auto-selects: the fused kernel on TPU, the jnp path
    elsewhere (the kernel only runs interpreted off-TPU).
    """
    if not cfg.fully_connected and cfg.pos_diffs and cfg.num_ef != 1:
        # knn pair rows carry exactly one [dists] column whenever pos_diffs
        # is on (mpgan/model.py:372-381 — the knn getA has no delta_coords
        # variant, and it appends dists unconditionally under pos_diffs), so
        # fe's declared input size matches only when num_ef == 1.
        # num_ef > 1 (delta_coords) or num_ef == 0 (pos_diffs without
        # delta_r/all_ef) would make the jnp/v1 paths fail with an opaque
        # dot shape error, and the v2/v3 kernels' W1 column decomposition
        # would silently read wrong slices — num_ef == 0 in particular makes
        # ``w1[:, 2f]`` an out-of-range index that jnp CLAMPS to the last
        # real column instead of raising; fail loudly up front instead.
        raise ValueError(
            f"knn MP layers with pos_diffs carry exactly the [dists] edge "
            f"feature (num_ef == 1); got num_ef={cfg.num_ef} "
            f"(delta_r={cfg.delta_r}, all_ef={cfg.all_ef}, "
            f"delta_coords={cfg.delta_coords})"
        )
    if cfg.fully_connected and cfg.pos_diffs:
        # the dense pairwise builder (_pairwise_fully_connected, mirroring
        # mpgan/model.py:297-311) and the declared num_ef (model.py:173-181)
        # disagree for some edge-feature combinations — e.g. all_ef +
        # delta_coords declares num_coords + 1 columns but builds either
        # [dists] alone (no delta_r) or a full-width diff block (all_ef
        # diffs span every node feature, not just coords). The reference
        # crashes on exactly these combos too (the getA ``view(...,
        # out_size)`` at model.py:309 fails); reject them loudly instead of
        # an opaque dot shape error downstream.
        diff_w = cfg.input_node_size if cfg.all_ef else cfg.num_coords
        if cfg.delta_r and cfg.delta_coords:
            built = diff_w + 1
        elif cfg.delta_r or cfg.all_ef:
            built = 1
        elif cfg.delta_coords:
            built = diff_w
        else:
            built = 0
        if built != cfg.num_ef:
            raise ValueError(
                f"inconsistent dense MP edge-feature combination: pairwise "
                f"rows carry {built} edge columns but num_ef declares "
                f"{cfg.num_ef} (all_ef={cfg.all_ef}, delta_r={cfg.delta_r}, "
                f"delta_coords={cfg.delta_coords}, coords={cfg.coords!r}, "
                f"input_node_size={cfg.input_node_size}); the reference "
                f"crashes on these combinations too (mpgan/model.py:309)"
            )
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and fused_eligible(cfg, train):
        fn_rng = jax.random.split(rng)[1] if rng is not None else None
        fused = _mp_layer_apply_fused if cfg.fully_connected else _mp_layer_apply_fused_knn
        return fused(
            cfg, params, state, x, mask, labels, num_jet_particles,
            train, fn_rng, update_sn,
        )
    fe_rng = fn_rng = None
    if rng is not None:
        fe_rng, fn_rng = jax.random.split(rng)

    if cfg.fully_connected:
        a = _pairwise_fully_connected(cfg, x)  # [B, N, N, fe_base]
        a_mask = None
    else:
        a, a_mask = _pairwise_knn(cfg, x, mask)  # [B, N, k, fe_base]

    a = _append_cond(cfg, a, labels, num_jet_particles)

    a, fe_state = mlp_apply(
        cfg.fe, params["fe"], state["fe"], a, train=train, rng=fe_rng, update_sn=update_sn
    )

    if mask is not None:
        if cfg.fully_connected:
            a = a * mask[:, None, :, :]  # mask senders (mpgan/model.py:262)
        else:
            a = a * a_mask

    agg = jnp.sum(a, axis=2) if cfg.sum_agg else jnp.mean(a, axis=2)

    h = jnp.concatenate([agg, x], axis=-1)
    h = _append_cond(cfg, h, labels, num_jet_particles)
    y, fn_state = mlp_apply(
        cfg.fn, params["fn"], state["fn"], h, train=train, rng=fn_rng, update_sn=update_sn
    )
    return y, {"fe": fe_state, "fn": fn_state}
